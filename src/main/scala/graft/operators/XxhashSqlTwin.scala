package graft.operators

/** DuckDB single-statement twin of Spark's XxHash64 (VERDICT r8 #5 — the
  * feasibility audit, resolved POSITIVE for bounded seed counts): every
  * step of xxHash64 is integer math mod 2^64, expressible in HUGEINT SQL
  * once two pitfalls are engineered around:
  *
  *  - 64×64-bit products overflow SIGNED int128, so every multiply runs
  *    in the split form `(a_lo·b + ((a_hi·b) mod 2^32)·2^32) mod 2^64`
  *    (max operand magnitude 2^97 < 2^127);
  *  - XOR has no HUGEINT overload, so words xor as two 32-bit halves
  *    through native BIGINT xor (measured 3.8× faster than the
  *    sign-branching CASE form).
  *
  * Sequential steps (merge rounds, tails, avalanche) chain through named
  * CTE columns — referencing a column twice is free, inlining a
  * subexpression twice doubles the SQL text — and the variable-length
  * loops (32-byte lanes, 8-byte tail, byte tail) run as `list_reduce`
  * folds whose lambda text is written once. Byte access reads codepoints
  * (`unicode(substr(...))`) under the fixture-wide ASCII caveat every
  * text oracle here shares (1 char = 1 byte; q_text_stats' established
  * pairing).
  *
  * Proven exact: the generated SQL reproduces
  * `XXH64.hashUnsafeBytes(utf8, seed)` bit-for-bit on all regimes (≥32 B
  * lane loop, 8/4/1-byte tails, empty tail) — the q_minhash_signatures
  * oracle hash-compares 500 docs × 4 seeds of real minimum chasing.
  *
  * Cost model (why only the 4-seed query is promoted): ~3.2k hashes/s in
  * DuckDB (16,245 distinct shingles × 4 seeds ≈ 20 s at sf0.01). The full
  * q_minhash_dedup pipeline needs all 32 seeds (×8) plus the band-hash
  * chain and candidate verify — ~8-25× the promoted query's wall, which
  * blows the gate's DuckDB budget at sf1. That is a BUDGET block, not an
  * expressibility block; COVERAGE.md records the analysis. */
private[operators] object XxhashSqlTwin {

  private val M64 = "18446744073709551616::HUGEINT" // 2^64
  private val H63 = "9223372036854775808::HUGEINT"  // 2^63
  private val P1 = "11400714785074694791::HUGEINT"
  private val P2 = "14029467366897019727::HUGEINT"
  private val P3 = "1609587929392839161::HUGEINT"
  private val P4 = "9650029242287828579::HUGEINT"
  private val P5 = "2870177450012600261::HUGEINT"

  private def mul(a: String, b: String): String =
    s"((($a) % 4294967296) * ($b) + " +
      s"(((($a) // 4294967296) * ($b)) % 4294967296) * 4294967296) % $M64"

  private def add(a: String, b: String): String = s"(($a) + ($b)) % $M64"

  private def rot(x: String, r: Int): String = {
    val lo = BigInt(2).pow(64 - r)
    val hi = BigInt(2).pow(r)
    s"((($x) % $lo::HUGEINT) * $hi::HUGEINT + ($x) // $lo::HUGEINT)"
  }

  private def shr(x: String, r: Int): String =
    s"(($x) // ${BigInt(2).pow(r)}::HUGEINT)"

  private def xor64(a: String, b: String): String =
    s"(xor((($a) // 4294967296)::BIGINT, (($b) // 4294967296)::BIGINT)::HUGEINT * 4294967296 + " +
      s"xor((($a) % 4294967296)::BIGINT, (($b) % 4294967296)::BIGINT)::HUGEINT)"

  private def toSigned(x: String): String =
    s"(CASE WHEN ($x) >= $H63 THEN (($x) - $M64)::BIGINT ELSE ($x)::BIGINT END)"

  /** round(acc, input) = rot31(acc + input·P2)·P1 */
  private def rnd(acc: String, inp: String): String =
    mul(rot(add(acc, mul(inp, P2)), 31), P1)

  private def read8(base: String): String =
    (0 until 8).map(k =>
      s"(cp)[($base)+$k]::HUGEINT * ${BigInt(256).pow(k)}::HUGEINT")
      .mkString("(", " + ", ")")

  private def read4(base: String): String =
    (0 until 4).map(k =>
      s"(cp)[($base)+$k]::HUGEINT * ${BigInt(256).pow(k)}::HUGEINT")
      .mkString("(", " + ", ")")

  /** CTE chain hashing every row of `src`, which must carry `n` (byte
    * length), `cp` (codepoint list) and `seed` (HUGEINT in [0, 2^64)).
    * The final CTE `xf` carries all src columns + `hash` (signed
    * BIGINT = Spark's xxhash64 value). */
  def ctes(src: String): String = {
    val lanesInit =
      s"[(sd + $P1 + $P2) % $M64, (sd + $P2) % $M64, sd, (sd + $M64 - $P1) % $M64]"
    val laneStep = Seq((1, 1), (2, 9), (3, 17), (4, 25)).map { case (v, off) =>
      rnd(s"st[$v]", read8(s"32*CAST(c[1] AS BIGINT)+$off"))
    }.mkString("[", ", ", "]")
    val mergeH0 = add(add(rot("vv[1]", 1), rot("vv[2]", 7)),
      add(rot("vv[3]", 12), rot("vv[4]", 18)))
    def merge1(h: String, v: String) =
      add(mul(xor64(h, rnd("0::HUGEINT", v)), P1), P4)
    s"""xb AS (SELECT *, seed AS sd FROM $src),
       xl AS (SELECT *, CASE WHEN n >= 32 THEN
                list_reduce(list_prepend($lanesInit,
                  [[CAST(c AS HUGEINT)] FOR c IN range(0, n // 32)]),
                  (st, c) -> $laneStep)
              ELSE NULL END AS vv FROM xb),
       xm0 AS (SELECT *, CASE WHEN n >= 32 THEN $mergeH0
                              ELSE (sd + $P5) % $M64 END AS h0 FROM xl),
       xm1 AS (SELECT *, CASE WHEN n >= 32 THEN ${merge1("h0", "vv[1]")} ELSE h0 END AS h1 FROM xm0),
       xm2 AS (SELECT *, CASE WHEN n >= 32 THEN ${merge1("h1", "vv[2]")} ELSE h1 END AS h2 FROM xm1),
       xm3 AS (SELECT *, CASE WHEN n >= 32 THEN ${merge1("h2", "vv[3]")} ELSE h2 END AS h3 FROM xm2),
       xm4 AS (SELECT *, ${add("CASE WHEN n >= 32 THEN " + merge1("h3", "vv[4]") + " ELSE h3 END", "n::HUGEINT")} AS h4,
                      (n // 32) * 32 AS base FROM xm3),
       xt8 AS (SELECT *, list_reduce(list_prepend(h4,
                 [CAST(k AS HUGEINT) FOR k IN range(0, (n - base) // 8)]),
                 (h, k) -> ${add(mul(rot(xor64("h", rnd("0::HUGEINT", read8("base+8*CAST(k AS BIGINT)+1"))), 27), P1), P4)}) AS h5,
               base + ((n - base) // 8) * 8 AS base4 FROM xm4),
       xt4 AS (SELECT *, CASE WHEN n - base4 >= 4 THEN
                 ${add(mul(rot(xor64("h5", mul(read4("base4+1"), P1)), 23), P2), P3)}
               ELSE h5 END AS h6,
               base4 + CASE WHEN n - base4 >= 4 THEN 4 ELSE 0 END AS base1 FROM xt8),
       xt1 AS (SELECT *, list_reduce(list_prepend(h6,
                 [CAST(k AS HUGEINT) FOR k IN range(0, n - base1)]),
                 (h, k) -> ${mul(rot(xor64("h", mul("cp[base1+CAST(k AS BIGINT)+1]::HUGEINT", P5)), 11), P1)}) AS h7 FROM xt4),
       xa0 AS (SELECT *, ${mul(xor64("h7", shr("h7", 33)), P2)} AS h8 FROM xt1),
       xa1 AS (SELECT *, ${mul(xor64("h8", shr("h8", 29)), P3)} AS h9 FROM xa0),
       xf AS (SELECT *, ${toSigned(xor64("h9", shr("h9", 32)))} AS hash FROM xa1)"""
  }

  /** Signed BIGINT column → unsigned HUGEINT in [0, 2^64). */
  private def toUnsigned(c: String): String =
    s"(CASE WHEN ($c) < 0 THEN ($c)::HUGEINT + $M64 ELSE ($c)::HUGEINT END)"

  /** CTE chain computing Spark's `XXH64.hashLong(v, sd)` for every row of
    * `src` — the LONG-input sibling of [[ctes]]'s byte-string path, used
    * by the band-hash twins (`xxhash64(mh_a, mh_b)` hashes each 8-byte
    * long through hashLong with the carried seed). `v` and `sd` are
    * unsigned-HUGEINT column/expression texts; the final CTE `<p>f`
    * carries all src columns + `out` (unsigned HUGEINT, chainable as the
    * next call's seed). Validated bit-for-bit against XXH64.hashLong on
    * sign/extreme regimes (MinhashSmallSpec). */
  private def hashLongCtes(src: String, v: String, sd: String,
      p: String, out: String): String = {
    val h0 = add(add(sd, P5), "8::HUGEINT")
    val k1 = mul(rot(mul(v, P2), 31), P1)
    s"""${p}0 AS (SELECT *, $h0 AS ${p}_h0, $k1 AS ${p}_k1 FROM $src),
       ${p}1 AS (SELECT *, ${add(mul(rot(xor64(s"${p}_h0", s"${p}_k1"), 27), P1), P4)} AS ${p}_h2 FROM ${p}0),
       ${p}2 AS (SELECT *, ${mul(xor64(s"${p}_h2", shr(s"${p}_h2", 33)), P2)} AS ${p}_h3 FROM ${p}1),
       ${p}3 AS (SELECT *, ${mul(xor64(s"${p}_h3", shr(s"${p}_h3", 29)), P3)} AS ${p}_h4 FROM ${p}2),
       ${p}f AS (SELECT *, ${xor64(s"${p}_h4", shr(s"${p}_h4", 32))} AS $out FROM ${p}3)"""
  }

  /** CTE chain for the BUDGET-SIZED minhash pipeline twins (VERDICT r9
    * #3): from a `(doc_id, text)` source CTE, compute each document's
    * 4-seed MinHash signature and its 2 LSH band hashes exactly as the
    * engine does (band b = xxhash64(mh_{2b}, mh_{2b+1}), seed 42 — two
    * chained hashLongs). Leaves these CTEs for downstream consumers:
    *  - `sh (doc_id, shingle)`: per-doc DISTINCT word-3-gram shingles;
    *  - `msigs (doc_id, mh0..mh3)`: signed signature minima;
    *  - `bands (doc_id, band_idx, band_hash)`: signed band hashes.
    * 4-seed hash volume is exactly the promoted q_minhash_signatures
    * twin's — the budget the 32-seed full pipeline blows. */
  def smallSigBandCtes(docsSrc: String): String = {
    val seeds = (0 until 4).map(i => s"($i, ${seedLiteral(i)})").mkString(", ")
    val mins = (0 until 4)
      .map(i => s"min(hash) FILTER (WHERE si = $i) AS mh$i").mkString(",\n       ")
    s"""toks AS (
         SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
         FROM $docsSrc WHERE text IS NOT NULL),
       sh AS MATERIALIZED (
         SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
         FROM toks, unnest(range(1, greatest(len(tk) - 1, 1))) AS t(i)
         WHERE len(tk) >= 3),
       shu AS (SELECT shingle, strlen(shingle) AS n,
                      [unicode(substr(shingle, CAST(i AS INTEGER), 1))
                       FOR i IN range(1, strlen(shingle)+1)] AS cp
               FROM (SELECT DISTINCT shingle FROM sh)),
       seeds(si, seed) AS (VALUES $seeds),
       inp AS (SELECT * FROM shu CROSS JOIN seeds),
       ${ctes("inp")},
       hashes AS (SELECT shingle, si, hash FROM xf),
       msigs AS MATERIALIZED (SELECT sh.doc_id,
         $mins
         FROM sh JOIN hashes USING (shingle) GROUP BY sh.doc_id),
       bandin AS (
         SELECT doc_id, 0 AS band_idx, ${toUnsigned("mh0")} AS bv1,
                ${toUnsigned("mh1")} AS bv2 FROM msigs
         UNION ALL
         SELECT doc_id, 1 AS band_idx, ${toUnsigned("mh2")} AS bv1,
                ${toUnsigned("mh3")} AS bv2 FROM msigs),
       ${hashLongCtes("bandin", "bv1", "42::HUGEINT", "ba", "bh1")},
       ${hashLongCtes("baf", "bv2", "bh1", "bb", "bh2")},
       bands AS MATERIALIZED (SELECT doc_id, band_idx,
                 ${toSigned("bh2")} AS band_hash FROM bbf)"""
  }

  /** Full budget-sized MinHash+LSH dedup-GROUPS oracle (VERDICT r9 #3 —
    * the end-to-end twin the 32-seed pipeline's gate budget forbids):
    * band → candidate → exact-Jaccard verify → connected-component
    * collapse, at 4 seeds / 2 bands over all documents. The verify
    * replicates the engine's rounded-intRatio threshold exactly:
    * `round_half_up(i·10^4/u) ≥ 0.5 ⟺ 20000·i ≥ 19999·u` — pure integer
    * on both engines. Candidates between exact-duplicate copies verify at
    * J = 1, so the doc-level graph here equals the engine's rep-level
    * graph expanded over its dup classes (the pre-collapse argument in
    * Dedup.qMinhashDedup). */
  def minhashDedupSmallOracle: String =
    s"""WITH RECURSIVE
       ${smallSigBandCtes("documents")},
       mcand AS MATERIALIZED (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
                 FROM bands x JOIN bands y
                   ON x.band_idx = y.band_idx AND x.band_hash = y.band_hash
                  AND x.doc_id < y.doc_id),
       msz AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       mint AS MATERIALIZED (SELECT id_a, id_b, count(*) AS i
                FROM mcand c
                JOIN sh x ON x.doc_id = c.id_a
                JOIN sh y ON y.doc_id = c.id_b AND y.shingle = x.shingle
                GROUP BY 1, 2),
       mpairs AS MATERIALIZED (SELECT id_a, id_b FROM mint
                  JOIN msz sa ON sa.doc_id = id_a
                  JOIN msz sb ON sb.doc_id = id_b
                  WHERE 20000 * i >= 9999 * (sa.n + sb.n - i)),
       medges AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM mpairs
                  UNION ALL SELECT id_b, id_a FROM mpairs),
       mreach(id, root) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, r.root FROM mreach r JOIN medges e ON e.src = r.id)
       SELECT id AS doc_id, min(root) AS group_id
       FROM mreach GROUP BY id ORDER BY doc_id"""

  /** Spark's per-seed prefix: `xxhash64(lit(i), s)` = hash of s's bytes
    * seeded with `XXH64.hashInt(i, 42)` — the unsigned HUGEINT literal. */
  def seedLiteral(i: Int): String = {
    val s = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)
    val u = if (s < 0) BigInt(s) + BigInt(2).pow(64) else BigInt(s)
    s"$u::HUGEINT"
  }

  /** Full q_minhash_signatures oracle: per-doc minimum of the signed
    * xxhash64 over DISTINCT word 3-gram shingles, seeds 0..3. */
  def minhashSignaturesOracle: String = {
    val seeds = (0 until 4).map(i => s"($i, ${seedLiteral(i)})").mkString(", ")
    val mins = (0 until 4)
      .map(i => s"min(hash) FILTER (WHERE si = $i) AS mh_$i").mkString(",\n       ")
    s"""WITH toks AS (
         SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk
         FROM documents WHERE text IS NOT NULL),
       sh AS (
         SELECT DISTINCT doc_id, tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
         FROM toks, unnest(range(1, greatest(len(tk) - 1, 1))) AS t(i)
         WHERE len(tk) >= 3),
       shu AS (SELECT shingle, strlen(shingle) AS n,
                      [unicode(substr(shingle, CAST(i AS INTEGER), 1))
                       FOR i IN range(1, strlen(shingle)+1)] AS cp
               FROM (SELECT DISTINCT shingle FROM sh)),
       seeds(si, seed) AS (VALUES $seeds),
       inp AS (SELECT * FROM shu CROSS JOIN seeds),
       ${ctes("inp")},
       hashes AS (SELECT shingle, si, hash FROM xf)
       SELECT sh.doc_id,
       $mins
       FROM sh JOIN hashes USING (shingle)
       GROUP BY sh.doc_id ORDER BY doc_id"""
  }
}
