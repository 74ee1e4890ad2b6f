package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of lowercased, trimmed text — the shingle
  * generator of the MinHash/Jaccard dedup pipeline (SURVEY.md §2.9 N2).
  *
  * Replaces the declarative formulation
  * `array_distinct(transform(sequence(...), i -> concat_ws(...)))`:
  * higher-order functions evaluate an interpreted lambda per ELEMENT with
  * allocation per step, which made shingle generation ~8× slower than the
  * whole 32-hash MinHash aggregation it feeds. This expression does one
  * Scala call per ROW with a single hash-set pass. Semantics match the
  * DuckDB oracle exactly: tokens = regexp-split of trim(lower(text)) on
  * `\s+`, shingles = space-joined n-grams, de-duplicated keeping first
  * occurrence. Lowercasing uses UTF8String.toLowerCase — the same
  * implementation as Spark's `lower()`.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.LinkedHashSet[String](toks.length * 2)
      var i = 0
      val last = toks.length - n
      val sb = new java.lang.StringBuilder(64)
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Full MinHash signature in ONE per-row pass: word n-gram shingles of the
  * normalized text (same tokenization as [[WordShingles]]) hashed with
  * `numHashes` xxhash64 seeds, keeping the minimum per seed. Returns
  * array<long> of length numHashes, or NULL when the text has no shingles
  * (mirrors the explode+groupBy formulation, where such docs simply
  * produce no row).
  *
  * Hash-compatible BY CONSTRUCTION with `min(xxhash64(lit(i), shingle))`:
  * Spark's xxhash64 folds its arguments left-to-right starting at seed 42,
  * so `xxhash64(lit(i), s) == XXH64.hashUnsafeBytes(s, XXH64.hashInt(i, 42))`
  * — the per-seed prefix is precomputed once. This replaces an
  * explode(shingles) → groupBy(doc_id).agg(32 × min) pipeline: same hash
  * count, but zero explode rows, zero aggregation hash table, zero
  * shuffle — the signature stage becomes embarrassingly parallel, which is
  * the property that matters at 1000 executors.
  */
case class MinHashSignatures(child: Expression, n: Int, numHashes: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1 && numHashes >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  // xxhash64(lit(i), shingle) = hash(shingle bytes, seed = hash(i, 42))
  private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(i =>
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L))

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    if (toks.length < n) return null
    val seen = new java.util.HashSet[String](toks.length * 2)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) { // distinct shingles only, like WordShingles
        val u = UTF8String.fromString(s)
        var k = 0
        while (k < numHashes) {
          val h = org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seeds(k))
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    var k = 0
    while (k < numHashes) { out(k) = mins(k); k += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * a ROLLING polynomial hash over character k-grams of the normalized
  * text, keeping the minimum hash of every w-gram window (rightmost on
  * ties). Guarantees: any shared substring of length ≥ w + k - 1 between
  * two documents yields at least one shared fingerprint — the
  * plagiarism/near-dup detection primitive that survives insertions and
  * deletions (which shift everything and break fixed-position hashing).
  * Single pass per row; output is the distinct sorted fingerprint set, so
  * overlap is a plain array_intersect downstream.
  */
case class WinnowFingerprints(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && window >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  private val Base = 1000003L

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toLowerCase.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(c)
      i += 1
    }
    val s = sb.toString
    if (s.length < k) return new GenericArrayData(Array.empty[Any])
    // rolling hashes of all k-grams
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L // Base^(k-1)
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); if (i < k - 1) pow *= Base; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // winnow: min per window of `window` consecutive hashes, rightmost tie
    val seen = new java.util.TreeSet[java.lang.Long]()
    var start = 0
    while (start < n) {
      val end = math.min(start + window, n)
      var minIdx = start
      var j = start + 1
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      seen.add(hashes(minIdx))
      start += window
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All per-document text-analysis counters in ONE per-row pass — the
  * backing kernel of q_text_stats / q_text_quality / q_lang_guess, which
  * previously evaluated ~10 separate regex scans and interpreted
  * higher-order `filter(toks, isin)` lambdas per row (HOFs are
  * CodegenFallback: one interpreted eval per element).
  *
  * Field semantics replicate the declarative plan (and the DuckDB oracle)
  * exactly:
  *  - n_tokens   = len of `split(trim(text), "\s+")` — trim strips ' '
  *    only; Spark's split (limit -1) keeps leading AND trailing ""
  *    tokens for non-space whitespace at the edges, and yields [""]
  *    (count 1) for an empty string
  *  - n_nonspace = count of codepoints != ' ' (the
  *    `length(replace(trim(text),' ',''))` numerator of avg_token_len)
  *  - n_bpe      = matches of `[a-z]+|[0-9]+|[^a-z0-9\s]` on lower(text):
  *    letter runs + digit runs + single other-non-space codepoints
  *  - n_punct    = codepoints matching `[^a-zA-Z0-9\s]` on the RAW text
  *    (Java \s is ASCII-only; any non-ASCII codepoint counts, like the
  *    regex it replaces)
  *  - n_digit    = codepoints in [0-9]
  *  - n_cjk      = codepoints in [一-鿿]
  *  - s_en/de/es/fr = stopword hits over tokens of trim+split on
  *    lower(text) (UTF8String.toLowerCase — same as Spark's lower())
  */
/** Tokenization helpers shared by the per-row text kernels. The contract
  * ("matches the DuckDB oracle's trim + \s+ split of the lowered text")
  * must live in ONE place — TextProfile and RepetitionProfile previously
  * carried byte-identical private copies that could drift independently. */
private[functions] object TextKernels {
  /** Spark/DuckDB `trim` strips the SPACE character only. */
  def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    if (a == 0 && b == s.length) s else s.substring(a, b)
  }

  /** Whitespace tokens of trim(lower(text)) with Spark's keep-empty split
    * semantics — the tokenization every oracle twin reproduces. */
  def lowerTokens(u: UTF8String): Array[String] =
    trimSpaces(u.toLowerCase.toString).split("\\s+", -1)
}

case class TextProfile(child: Expression)
  extends UnaryExpression with CodegenFallback {

  import TextProfile._

  override def dataType: DataType = Schema

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[UTF8String]
    val raw = u.toString
    val lowered = u.toLowerCase.toString

    // raw-text codepoint classes
    var punct = 0; var digit = 0; var cjk = 0; var nonspace = 0
    var i = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      if (cp != ' ') nonspace += 1
      if (cp >= '0' && cp <= '9') digit += 1
      else if (!((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
                 isAsciiSpace(cp))) punct += 1
      if (cp >= 0x4e00 && cp <= 0x9fff) cjk += 1
      i += Character.charCount(cp)
    }

    // BPE-ish pre-tokenization on the lowered text: count run starts
    var bpe = 0
    var prev = 0 // 0 = other/space, 1 = letter run, 2 = digit run
    i = 0
    while (i < lowered.length) {
      val cp = lowered.codePointAt(i)
      if (cp >= 'a' && cp <= 'z') { if (prev != 1) bpe += 1; prev = 1 }
      else if (cp >= '0' && cp <= '9') { if (prev != 2) bpe += 1; prev = 2 }
      else if (isAsciiSpace(cp)) prev = 0
      else { bpe += 1; prev = 0 }
      i += Character.charCount(cp)
    }

    // tokens of trim(' ') + split("\s+") on the lowered text; token count
    // is whitespace-determined, so it equals the raw-text token count.
    // limit -1: Spark's split KEEPS trailing empty tokens (Java drops them)
    val toks = TextKernels.trimSpaces(lowered).split("\\s+", -1)
    var sEn = 0; var sDe = 0; var sEs = 0; var sFr = 0
    i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (StopEn.contains(t)) sEn += 1
      if (StopDe.contains(t)) sDe += 1
      if (StopEs.contains(t)) sEs += 1
      if (StopFr.contains(t)) sFr += 1
      i += 1
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, nonspace, bpe, punct, digit, cjk,
        sEn, sDe, sEs, sFr))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextProfile {
  val Schema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("n_tokens", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_nonspace", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_bpe", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_punct", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_digit", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_cjk", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("s_en", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("s_de", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("s_es", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("s_fr", org.apache.spark.sql.types.IntegerType, nullable = false)

  private def isAsciiSpace(cp: Int): Boolean = // Java regex \s
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def set(ws: String*): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    ws.foreach(s.add); s
  }
  private val StopEn = set("the", "a", "and", "of", "to")
  private val StopDe = set("der", "die", "das", "und", "zu")
  private val StopEs = set("el", "la", "de", "y", "que")
  private val StopFr = set("le", "la", "et", "les", "des")
}

/** 64-bit SimHash of whitespace-tokenized, lowercased text — computed in a
  * single per-row pass (SimHash is a per-document signature; the previous
  * formulation exploded tokens into rows and re-aggregated with 64
  * conditional sums, paying a shuffle plus a very wide codegen unit for
  * what is a map-side loop). Token hashing is FNV-1a 64 — self-contained,
  * deterministic across JVMs/runs/cluster sizes.
  *
  * Near-duplicate documents differ in few tokens → their bit-majority
  * votes agree on most bits → small Hamming distance between signatures.
  */
case class SimHash64(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.LongType

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def fnv1a(s: String): Long = {
    var h = FnvOffset
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= FnvPrime
      i += 1
    }
    h
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = fnv1a(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sim |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(sim)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Shannon character entropy in ONE per-row pass — replaces an
  * explode-every-character pipeline (regexp_extract_all + two hash
  * aggregations + a join) whose shuffle carries one row per CHARACTER of
  * the corpus. Counts Unicode code points (what `[\s\S]` extraction
  * yields in both Spark and DuckDB for any text), then sums
  * -(k/n)·log2(k/n) over codepoints in ascending order — a canonical
  * order, so results are bit-stable across partitionings and runs.
  * NULL for the empty string, mirroring the explode formulation where an
  * empty document contributes no rows and thus no output group.
  */
case class CharEntropy(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullable: Boolean = true

  private val Log2 = math.log(2.0)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (s.isEmpty) return null
    val counts = new java.util.TreeMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < s.length) {
      val cp = s.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
      n += 1
    }
    // ExactSum-style quantized accumulation: each term p·log2(p) is
    // floored to integer 2^-30 units and the LONGS are summed, so the
    // result is independent of histogram iteration order and equal to the
    // oracle's literal integer-sum form (ln(p)/ln(2), not a libm log2 —
    // both engines take the same ln then divide by the same constant).
    // 2^30, not 1e9: a power-of-ten scale parked the sum on exact decimal
    // round(·, 6) ties (~1/1000 docs at sf1), which Spark (decimal
    // half-up) and DuckDB (binary) resolve differently; a power-of-two
    // denominator cannot form such a tie (see ExactSum.Scale).
    var acc = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc += math.floor(p * (math.log(p) / Log2) * 1073741824e0 + 0.5).toLong
    }
    java.lang.Double.valueOf(-(acc.toDouble / 1073741824e0))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Email + long-number PII scan in ONE combined regex pass — the kernel of
  * q_pii_redact, which previously ran FOUR full regex scans per document
  * (two `regexp_extract_all`, which also materialize an array of every
  * match just to take its size, and two chained `regexp_replace`, which
  * materialize the intermediate email-redacted string).
  *
  * Returns struct(n_emails, n_nums, redacted) with the exact semantics of
  * the sequential form
  * `replace(replace(text, EMAIL, '<EMAIL>'), NUM, '<NUM>')`:
  *  - the combined alternation `(EMAIL)|(NUM)` visits the same match
  *    spans, because a digit run adjacent to an email's local part is
  *    absorbed into the email's leftmost match (digits are local-part
  *    chars), and a digit run separated from any email cannot overlap
  *    one — so alternative order decides exactly the ties the sequential
  *    form decides in favor of EMAIL;
  *  - `<EMAIL>`/`<NUM>` contain no digits and cannot merge or create
  *    digit runs, so second-pass NUM matches equal first-pass group-2
  *    matches (pinned adversarially by PiiScanPropertySpec);
  *  - counts are over the RAW text (oracle: `regexp_extract_all` on
  *    `text`), so digits inside an email count toward n_nums even though
  *    the email's replacement swallows them — that needs the separate
  *    count-only NUM pass (no match array is ever built).
  */
case class PiiScan(child: Expression)
  extends UnaryExpression with CodegenFallback {

  import PiiScan._

  override def dataType: DataType = Schema

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    val m = Combined.matcher(s)
    val sb = new java.lang.StringBuilder(s.length)
    var emails = 0
    var last = 0
    while (m.find()) {
      sb.append(s, last, m.start())
      if (m.start(1) >= 0) { emails += 1; sb.append("<EMAIL>") }
      else sb.append("<NUM>")
      last = m.end()
    }
    sb.append(s, last, s.length)
    var nums = 0
    val nm = Num.matcher(s)
    while (nm.find()) nums += 1
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](emails, nums, UTF8String.fromString(sb.toString)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScan {
  val EmailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val NumRegex = "[0-9]{3,}"

  private val Combined =
    java.util.regex.Pattern.compile(s"($EmailRegex)|($NumRegex)")
  private val Num = java.util.regex.Pattern.compile(NumRegex)

  val Schema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("n_emails", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_nums", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("redacted", StringType, nullable = false)
}

/** Repetition counters of whitespace-tokenized, lowercased text — the
  * kernel of q_repetition_profile, the Gopher/FineWeb-style repetition
  * quality gate (duplicate-token fraction, most-common-token coverage,
  * most-common-bigram coverage) a pretraining pipeline runs before
  * anything expensive touches a document.
  *
  * One pass builds the token-count and adjacent-bigram-count maps per row;
  * the declarative twin (two explode→groupBy→max round-trips per metric)
  * would shuffle every token and bigram of the corpus twice for what is a
  * per-document map-side loop. Only COUNTS leave the expression — the
  * argmax token itself never materializes, so mode ties (two tokens with
  * the same max count) cannot make the result nondeterministic.
  *
  * Tokenization matches the rest of the text pack (and the DuckDB oracle):
  * `trim(lower(text))` split on `\s+` with Spark's keep-empty semantics.
  * Bigrams are the n_tokens-1 adjacent pairs; n_bigrams is 0 for
  * single-token documents and the bigram count columns are then 0 (the
  * query layer turns 0/0 into NULL to match the oracle's CASE).
  */
case class RepetitionProfile(child: Expression)
  extends UnaryExpression with CodegenFallback {

  import RepetitionProfile._

  override def dataType: DataType = Schema

  override def nullSafeEval(v: Any): Any = {
    val toks = TextKernels.lowerTokens(v.asInstanceOf[UTF8String])
    val tokCounts = new java.util.HashMap[String, Int](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      tokCounts.merge(toks(i), 1, (a, b) => a + b)
      i += 1
    }
    var topTok = 0
    val it = tokCounts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > topTok) topTok = c }

    val nBigrams = math.max(0, toks.length - 1)
    var topBigram = 0
    if (nBigrams > 0) {
      val bigramCounts = new java.util.HashMap[String, Int](nBigrams * 2)
      i = 0
      while (i < nBigrams) {
        bigramCounts.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        i += 1
      }
      val bit = bigramCounts.values().iterator()
      while (bit.hasNext) { val c = bit.next(); if (c > topBigram) topBigram = c }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](toks.length, tokCounts.size(), topTok, nBigrams, topBigram))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionProfile {
  val Schema: org.apache.spark.sql.types.StructType =
    new org.apache.spark.sql.types.StructType()
      .add("n_tokens", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_distinct", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("top_token", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("n_bigrams", org.apache.spark.sql.types.IntegerType, nullable = false)
      .add("top_bigram", org.apache.spark.sql.types.IntegerType, nullable = false)
}

/** Sorted distinct 64-bit hashes of the word n-gram shingles — the
  * verification-side twin of [[WordShingles]] for the prefix-filtered
  * Jaccard machinery (Dedup.prefixRepJaccardPairs). Same normalization and
  * shingling as WordShingles; each distinct shingle is hashed with
  * xxhash64 (seed 42, byte-compatible with Spark's `xxhash64`) and the
  * result is returned ASCENDING-SORTED so candidate verification can be a
  * linear two-pointer merge ([[SortedLongIntersectSize]]) instead of a
  * per-row hash-set build over string arrays — the allocation/hash cost
  * that dominated the sf10 adversarial probe (6.4M candidate pairs × two
  * ~100-string arrays).
  *
  * Jaccard over these hashes equals Jaccard over the string shingles
  * unless two distinct shingles of the SAME candidate pair collide in 64
  * bits (p ≈ m²/2⁶⁵ per pair, m = union size; ~3·10⁻¹⁵ at m = 250) —
  * quantitatively negligible next to the 1-in-10⁴ output quantization,
  * and the oracle gate re-checks the string form on every run. */
case class WordShingleHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.trimAll().toString
    val toks = text.split("\\s+")
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.HashSet[String](toks.length * 2)
      val hs = new java.util.ArrayList[Long](toks.length)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        val s = sb.toString
        if (seen.add(s)) {
          val u = UTF8String.fromString(s)
          hs.add(org.apache.spark.sql.catalyst.expressions.XXH64
            .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
        }
        i += 1
      }
      val arr = new Array[Long](hs.size)
      var k = 0
      while (k < arr.length) { arr(k) = hs.get(k); k += 1 }
      java.util.Arrays.sort(arr)
      // distinct strings can still collide to one hash: drop duplicates so
      // the array is strictly increasing (set semantics for the merge)
      var w = 0
      var r = 0
      while (r < arr.length) {
        if (w == 0 || arr(r) != arr(w - 1)) { arr(w) = arr(r); w += 1 }
        r += 1
      }
      val out = new Array[Any](w)
      var q = 0
      while (q < w) { out(q) = arr(q); q += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two ASCENDING-SORTED array<long> columns as one
  * codegen'd two-pointer merge — O(|x|+|y|) long comparisons, zero
  * allocation, zero hashing. The verification kernel of the prefix-filtered
  * Jaccard join: `array_intersect` builds an OpenHashSet of boxed/hashed
  * elements per ROW, which the sf10 adversarial probe measured as the
  * dominant cost across all 32 cores. Inputs MUST be sorted strictly
  * ascending ([[WordShingleHashes]] guarantees it). */
case class SortedLongIntersectSize(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val y = b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val vx = x.getLong(i)
      val vy = y.getLong(j)
      if (vx == vy) { c += 1; i += 1; j += 1 }
      else if (vx < vy) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val vx = ctx.freshName("vx")
      val vy = ctx.freshName("vy")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $vx = $a.getLong($i);
         |  long $vy = $b.getLong($j);
         |  if ($vx == $vy) { $c++; $i++; $j++; }
         |  else if ($vx < $vy) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Positioned winnowing fingerprints — the span-emitting sibling of
  * [[WinnowFingerprints]] behind q_retained_spans (Lee et al. 2022 style
  * exact-substring dedup): the SAME rolling polynomial hash over
  * character k-grams of the normalized text and the SAME strided
  * window-minimum selection (rightmost on ties), but each selected
  * fingerprint is emitted WITH its 1-based gram start position in the
  * normalized string, one struct per window, ordered by position.
  * Occurrences are deliberately NOT de-duplicated: a fingerprint selected
  * in several windows marks several drop extents downstream. Hash values
  * are bit-identical to [[WinnowFingerprints]] (and to the HUGEINT
  * mod-2^64 DuckDB twin the oracle runs), so fingerprint ownership
  * composes across both kernels. */
case class WinnowFingerprintSpans(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 2 && window >= 1)

  override def dataType: DataType = ArrayType(
    new org.apache.spark.sql.types.StructType()
      .add("fp", org.apache.spark.sql.types.LongType, nullable = false)
      .add("start", org.apache.spark.sql.types.IntegerType, nullable = false),
    containsNull = false)

  private val Base = 1000003L

  override def nullSafeEval(v: Any): Any = {
    val raw = v.asInstanceOf[UTF8String].toLowerCase.toString
    val sb = new java.lang.StringBuilder(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (Character.isLetterOrDigit(c)) sb.append(c)
      i += 1
    }
    val s = sb.toString
    if (s.length < k) return new GenericArrayData(Array.empty[Any])
    val n = s.length - k + 1
    val hashes = new Array[Long](n)
    var h = 0L
    var pow = 1L // Base^(k-1)
    i = 0
    while (i < k) { h = h * Base + s.charAt(i); if (i < k - 1) pow *= Base; i += 1 }
    hashes(0) = h
    i = 1
    while (i < n) {
      h = (h - s.charAt(i - 1) * pow) * Base + s.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    val out = new java.util.ArrayList[Any](n / window + 1)
    var start = 0
    while (start < n) {
      val end = math.min(start + window, n)
      var minIdx = start
      var j = start + 1
      while (j < end) { if (hashes(j) <= hashes(minIdx)) minIdx = j; j += 1 }
      out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hashes(minIdx), minIdx + 1)))
      start += window
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
