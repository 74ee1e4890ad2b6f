package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Vectors._
import graft.{Q, Tables}

/** Embedding similarity search over `embeddings.embedding` (SURVEY.md §2.9
  * N3): brute-force cosine top-k as the exact baseline, plus a
  * random-hyperplane LSH-bucketed approximate variant as the scale path.
  *
  * Scale design (100 TB / billions of vectors):
  *  - Brute force is an O(n·q) block: fine when the query side is small and
  *    broadcast (as here — queries broadcast against the corpus, corpus
  *    never shuffles); unusable for all-pairs at scale.
  *  - LSH buckets each vector once (8 deterministic hyperplanes → 256
  *    buckets). Candidate generation is an equi-join on the bucket id —
  *    shuffle keyed by bucket, each bucket processed independently. For
  *    higher recall, probe multiple buckets (here: exact bucket + all
  *    1-bit-flip neighbors = 9 probes) — the standard multi-probe LSH
  *    trade-off of recall vs fan-out.
  *  - Top-k per query uses a row_number window partitioned by query id —
  *    one shuffle on the query key; at k≪bucket size a per-partition
  *    TakeOrdered would also work, the window form keeps it declarative.
  *  - Ties at the k boundary are broken on (rounded sim, neighbor id) on
  *    BOTH engine and oracle so the result is deterministic.
  */
object Similarity {

  private val Dim = 64
  private val NumPlanes = 8

  /** Deterministic pseudo-random hyperplanes (fixed seed — identical on
    * every executor and run). */
  private[graft] lazy val planes: Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPlanes)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** Query vector ids: one per label's centroid region. */
  private val queryIds = Seq(0L, 100L, 200L, 300L, 400L)

  /** Embeddings with the vector cast to double ONCE and its L2 norm
    * precomputed ONCE per vector — every pair then costs a single
    * codegen'd dot product instead of dot + 2 norms (3× the flops).
    * Zero-norm vectors are excluded: their cosine is undefined, and under
    * ANSI Spark the division THROWS instead of yielding NaN — a corpus
    * with one corrupt all-zeros embedding would kill every similarity
    * query. The oracles carry the same `list_dot_product(v, v) > 0`
    * guard, so parity holds by construction, not by fixture luck. */
  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
      .filter(col("nv") > 0)

  /** Exact top-50 most-similar pairs (brute force over the i<j triangle)
    * on a DETERMINISTIC CAPPED SAMPLE of the corpus: vectors with
    * `vec_id % stride = 0`, stride = ceil(n / 2000) — at most ~2000
    * vectors / ~4M pairs regardless of corpus size. This query is a
    * calibration REFEREE for the ANN family, not a production operator:
    * an exact pair baseline only needs a representative sample, and the
    * id-modulus sample is reproducible on any engine (no RNG). Below
    * 2000 vectors stride = 1, so verification scale (sf0.01 = 500
    * vectors) is the full uncapped triangle.
    *
    * VERDICT r5 #3: uncapped, this one query was 152 s = 43% of the sf1
    * bench — a declared quadratic drowning the gate's signal. The cap
    * bounds it at O(cap²) forever; the linear production paths (LSH /
    * IVF / SemDeDup / embedding near-dup) are unchanged and still pinned
    * by recall specs against the exact kNN referee. */
  val qCosineTopPairs: Q = Q(
    "q_cosine_top_pairs",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])) > 0),
       st AS (SELECT greatest(1, CAST(ceil(count(*) / 2000.0) AS BIGINT)) AS stride
              FROM e),
       es AS (SELECT e.* FROM e CROSS JOIN st WHERE vec_id % stride = 0),
       p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                    round(list_cosine_similarity(a.v, b.v), 6) AS sim
             FROM es a JOIN es b ON a.vec_id < b.vec_id)
       SELECT id_a, id_b, sim FROM p
       ORDER BY sim DESC, id_a, id_b
       LIMIT 50""") { (s, d) =>
    val e = emb(s, d)
    val stride = e.agg(greatest(lit(1L),
      ceil(count(lit(1)) / lit(2000.0)).cast("long")).as("stride"))
    val es = e.crossJoin(broadcast(stride))
      .filter(col("vec_id") % col("stride") === 0)
    // the O(cap²) dot-product triangle is the whole cost: spread the
    // streamed side of the nested-loop join across cores (a single-row-
    // group embeddings file otherwise runs the entire triangle in ONE
    // task); no-op at scale (Tables.spread)
    val a = graft.Tables.spread(
      es.select(col("vec_id").as("id_a"), col("v").as("va"), col("nv").as("na")))
    val b = es.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nv").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("sim"))
      .orderBy(col("sim").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  /** Exact k-NN: top-10 neighbors for 5 query vectors. Query side broadcast;
    * corpus side streams — the shape that scales to a huge corpus. */
  val qKnnExact: Q = Q(
    "q_knn_exact",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])) > 0),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e
              WHERE vec_id IN (${queryIds.mkString(", ")})),
        s AS (SELECT query_id, vec_id AS neighbor_id,
                     round(list_cosine_similarity(qv, v), 6) AS sim,
                     row_number() OVER (PARTITION BY query_id
                        ORDER BY round(list_cosine_similarity(qv, v), 6) DESC,
                                 vec_id) AS rn
              FROM q JOIN e ON vec_id <> query_id)
        SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rn
        FROM s WHERE rn <= 10
        ORDER BY query_id, rn""") { (s, d) =>
    val e = emb(s, d)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("qn"))
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  private val NumTables = 8   // independent LSH tables
  private val BitsPerTable = 4 // 16 buckets/table; P(collide) = (1-θ/π)^4

  /** The 8×4 LSH hyperplanes: fixed-seed JVM Gaussians, identical on every
    * executor and run. Shared by the engine query (as array literals in
    * [[tableBuckets]]) and its DuckDB oracle (as decimal literals in
    * [[lshOracleSql]] — `Double.toString` is shortest-round-trip, so the
    * oracle parses back the BIT-IDENTICAL doubles). */
  private[graft] lazy val tablePlanes: Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(1234)
    Seq.fill(NumTables, BitsPerTable)(Array.fill(Dim)(rnd.nextGaussian()))
  }

  /** Per-table LSH bucket ids: for each of the L tables, the sign bits of
    * its 4 private hyperplanes packed into an int. Returns array<int> of
    * length L. Collision prob for angle θ is (1-θ/π)^4 per table; a vector
    * is a candidate if it collides in ANY table — the standard
    * recall-amplifying OR-construction. */
  private[graft] def tableBuckets(v: org.apache.spark.sql.Column) =
    array(tablePlanes.map { ps =>
      ps.zipWithIndex.map { case (p, i) =>
        when(dot(v, typedlit(p.toSeq)) > 0, shiftleft(lit(1), i)).otherwise(lit(0))
      }.reduce(_.bitwiseOR(_))
    }: _*)

  /** DuckDB twin of the full multi-probe LSH pipeline, with the hyperplanes
    * embedded as literals. Cross-engine exactness rests on two facts:
    * both engines' dot products are plain in-order double accumulation
    * ([[graft.functions.DotProduct]]'s codegen loop; DuckDB's
    * `list_dot_product` — verified term-identical against a sequential
    * sum), so given bit-identical inputs every `dot > 0` sign bit and
    * every bucket id agrees exactly; and the sign MARGINS are enormous
    * relative to any accumulation-order noise anyway (measured min
    * |dot(v, plane)| ≈ 1.8e-5 at sf0.1 over all 32 planes vs a worst-case
    * reorder error ~1e-13 — 8 orders of magnitude; SimilaritySpec pins the
    * floor). */
  private[graft] lazy val lshOracleSql: String = {
    def planeLit(p: Array[Double]): String =
      p.map(java.lang.Double.toString).mkString("[", ", ", "]::DOUBLE[]")
    val bucketArms = tablePlanes.zipWithIndex.map { case (ps, t) =>
      val bits = ps.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN list_dot_product(v, ${planeLit(p)}) > 0 THEN ${1 << i} ELSE 0 END)"
      }.mkString("\n                 + ")
      s"SELECT vec_id, $t AS tbl, $bits AS bucket FROM e"
    }.mkString("\n          UNION ALL\n          ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                   WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])) > 0),
       b AS ($bucketArms),
       q AS (SELECT vec_id AS query_id, v AS qv FROM e
             WHERE vec_id IN (${queryIds.mkString(", ")})),
       qb AS (SELECT vec_id AS query_id, tbl, bucket FROM b
              WHERE vec_id IN (${queryIds.mkString(", ")})),
       qp AS (SELECT query_id, tbl, xor(bucket, f.flip) AS bucket
              FROM qb CROSS JOIN (VALUES (0), (1), (2), (4), (8)) f(flip)),
       cand AS (SELECT DISTINCT qp.query_id, b.vec_id
                FROM b JOIN qp ON b.tbl = qp.tbl AND b.bucket = qp.bucket
                WHERE b.vec_id <> qp.query_id),
       s AS (SELECT cand.query_id, cand.vec_id AS neighbor_id,
                    round(list_cosine_similarity(q.qv, e.v), 6) AS sim
             FROM cand JOIN q ON cand.query_id = q.query_id
                       JOIN e ON cand.vec_id = e.vec_id),
       r AS (SELECT query_id, neighbor_id, sim,
                    row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, neighbor_id) AS rn
             FROM s)
       SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rn
       FROM r WHERE rn <= 10 ORDER BY query_id, rn"""
  }

  /** Approximate k-NN via multi-table random-hyperplane LSH with
    * QUERY-SIDE MULTI-PROBE: each vector is bucketed once per table (L=8
    * tables × 4 bits); each query probes, per table, its own bucket plus
    * every 1-bit-flip neighbor (Hamming ≤ 1 → 5 probes/table). A corpus
    * vector is a candidate iff it lands in any probed bucket of any
    * table; exact cosine runs only on candidates. Multi-probe is the
    * right recall lever at scale because it multiplies the QUERY side
    * (tiny, broadcast) — per-table candidate probability rises from p^4
    * to p^4 + 4p^3(1-p) with zero extra corpus explode or shuffle.
    *
    * ORACLE-PROMOTED (r8): "approximate" never meant nondeterministic —
    * the hyperplanes are fixed constants, so the full pipeline (bucket
    * sign bits → multi-probe expansion → candidate join → exact rerank)
    * is DuckDB-expressible by embedding the planes as literals
    * ([[lshOracleSql]]). The driver now hash-compares the LSH output
    * END-TO-END cross-engine; SimilaritySpec additionally keeps the
    * recall ≥ 0.9 pin against q_knn_exact (the oracle proves the engine
    * computes THIS approximation exactly; the recall pin proves the
    * approximation is a good one).
    *
    * Scale shape: corpus explodes ×L on (table_idx, bucket) — the join key
    * is the shuffle key, buckets are processed independently, and the query
    * side stays broadcast. At 100 TB the corpus-side explode is avoided by
    * storing the L bucket ids as columns at ingest (computed once). */
  val qKnnLsh: Q = Q("q_knn_lsh", lshOracleSql) { (s, d) =>
    val e = emb(s, d).withColumn("buckets", tableBuckets(col("v")))
    val corpus = e.select(col("vec_id"), col("v"), col("nv"),
      posexplode(col("buckets")).as(Seq("tbl", "bucket")))
    val probeVariants = array((0 to BitsPerTable).map {
      case 0 => col("qbucket0")
      case i => col("qbucket0").bitwiseXOR(lit(1 << (i - 1)))
    }: _*)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nv").as("qn"),
        posexplode(col("buckets")).as(Seq("qtbl", "qbucket0")))
      .select(col("query_id"), col("qv"), col("qn"), col("qtbl"),
        explode(probeVariants).as("qbucket"))
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    corpus.join(broadcast(q),
        col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("qv"), col("qn"), col("v"), col("nv"))
      .distinct() // a pair colliding in >1 table counts once
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  private val NProbe = 24
  private val NLists = 32
  private val LloydIters = 3
  private val SampleCap = 8192

  /** Deterministic Lloyd k-means over pre-normalized vectors, run on the
    * driver over a bounded sample (≤ SampleCap rows — see qKnnIvf step 1).
    * Assignment = argmax cosine with first-max-wins tie-break (the same
    * semantics as `array_position(sims, array_max(sims))`); update =
    * spherical mean of the normalized members; empty clusters drop out
    * (k shrinks, argmax stays well-defined). */
  private def localKMeans(xs: Array[Array[Double]]): Seq[Array[Double]] = {
    require(xs.nonEmpty, "k-means needs a non-empty training sample")
    val dim = xs.head.length
    val initStride = math.max(1, xs.length / NLists)
    var cents: Array[Array[Double]] =
      xs.indices.collect { case i if i % initStride == 0 => xs(i) }
        .take(NLists).toArray
    for (_ <- 1 to LloydIters) {
      val cnorm = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0
        var bestSim = Double.NegativeInfinity
        var j = 0
        while (j < cents.length) {
          var s = 0.0
          var k = 0
          while (k < dim) { s += x(k) * cents(j)(k); k += 1 }
          val sim = s / cnorm(j)
          if (sim > bestSim) { bestSim = sim; best = j }
          j += 1
        }
        var k = 0
        while (k < dim) { sums(best)(k) += x(k); k += 1 }
        counts(best) += 1
      }
      cents = sums.indices.collect { case j if counts(j) > 0 =>
        sums(j).map(_ / counts(j))
      }.toArray
    }
    cents.toIndexedSeq
  }

  /** Approximate k-NN via an IVF (inverted-file) index — the structure
    * FAISS-style ANN uses, re-expressed in Spark:
    *
    *  1. TRAIN: K=32 coarse centroids by deterministic k-means over a
    *     BOUNDED sample, on the driver — the FAISS recipe. The trainer
    *     sees at most SampleCap=8192 vectors (stride-selected in vec_id
    *     order: spread, reproducible), so driver memory is
    *     O(SampleCap·Dim) ≈ 4 MB REGARDLESS of corpus size; at test SFs
    *     the sample is the whole corpus. Local Lloyd rounds replace
    *     3×(assign + explode + two shuffled aggregations + collect)
    *     Spark jobs with zero cluster work; the resulting model is the
    *     same K×Dim ≈ 16 KB centroid array either way, and only the
    *     assignment below ever touches the full corpus. A finer
    *     quantizer than the 10 label means: shorter lists, so the same
    *     scan fraction buys more recall.
    *  2. ASSIGN: each corpus vector's inverted-list id = argmax cosine
    *     against the centroid literals — a map-only projection (no shuffle,
    *     no join); at ingest time this would be a stored column.
    *  3. PROBE: each query scores the same K centroids and probes the
    *     `NProbe` best lists (recall/fan-out trade-off — nprobe=K is
    *     exact). nprobe=24/32 (75% scan) is what ≥0.9 recall costs — at sf0.001 AND sf0.1 (RecallProbe: 0.96) — on
    *     THIS corpus, and the cost is the data's fault, not the index's:
    *     the synthetic embeddings are noise-dominated (measured: 44/50
    *     exact top-10 neighbor pairs are CROSS-label), so list membership
    *     correlates only weakly with cosine proximity and the recall/scan
    *     curve flattens — the same behavior FAISS shows on random
    *     vectors. On clusterable real embeddings the identical structure
    *     reaches the same recall at a far smaller nprobe; tune it per
    *     corpus.
    *  4. RE-RANK: exact cosine only for corpus rows in probed lists — an
    *     equi-join on list_id with the tiny probe set broadcast, so the
    *     corpus never shuffles; top-10 per query via the usual window.
    *
    * Approximate → no SQL oracle; SimilaritySpec pins recall@10 ≥ 0.9
    * against q_knn_exact. At 100 TB training runs on a sample; only the
    * assignment touches the full corpus. */
  /** Cosine against each centroid as one literal-array expression over the
    * (v, nv) columns of [[emb]]. */
  private[graft] def centSimsFor(cents: Seq[Array[Double]]): Column =
    array(cents.map { cv =>
      val n = math.sqrt(cv.map(x => x * x).sum)
      dot(col("v"), typedlit(cv.toSeq)) / (col("nv") * lit(n))
    }.toIndexedSeq: _*)

  /** Deterministic driver-side k-means training over a bounded sample of
    * the corpus (see qKnnIvf step-1 scaladoc). The sample is
    * pre-normalized at collect time — SPHERICAL means: averaging
    * normalized vectors gives the cosine-consistent direction mean (an
    * unnormalized mean is dominated by long vectors and misassigns under
    * cosine). */
  private[graft] def trainCentroids(e: DataFrame): Seq[Array[Double]] = {
    val n = e.count()
    val stride = math.max(1L, n / SampleCap)
    val sample: Array[Array[Double]] = e
      .filter(col("vec_id") % stride === 0)
      .orderBy("vec_id")
      .limit(SampleCap)
      .select(col("v"), col("nv"))
      .collect()
      .map { r =>
        val nv = r.getDouble(1)
        r.getSeq[Double](0).toArray.map(_ / nv)
      }
    localKMeans(sample)
  }

  val qKnnIvf: Q = Q.noOracle("q_knn_ivf") { (s, d) =>
    val e = emb(s, d)
    // 1. train: deterministic k-means on a bounded sample, driver-side
    val cents = trainCentroids(e)
    // 2. assign: inverted-list id = argmax centroid sim (map-only)
    val centSims = centSimsFor(cents)
    val corpus = e
      .withColumn("list_id", array_position(centSims, array_max(centSims)))
    // 3. probe: each query's NProbe best lists (query side is 5 rows)
    val wq = Window.partitionBy("query_id")
      .orderBy(col("csim").desc, col("lid"))
    val probes = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nv").as("qn"), posexplode(centSims).as(Seq("lid0", "csim")))
      .withColumn("lid", col("lid0") + 1)
      .withColumn("pr", row_number().over(wq))
      .filter(col("pr") <= NProbe)
      .select(col("query_id"), col("qv"), col("qn"),
        col("lid").cast("long").as("list_id"))
    // 4. re-rank: exact cosine inside probed lists only
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    corpus.join(broadcast(probes),
        corpus("list_id") === probes("list_id") &&
        col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Per-label centroid + distance-to-centroid stats: the IVF coarse
    * quantizer's training step expressed declaratively (mean vector per
    * label via elementwise aggregation). */
  val qCentroids: Q = Q(
    "q_label_centroids",
    """WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       cnt AS (SELECT label, count(*) AS n FROM e GROUP BY label),
       u AS (SELECT label, i, avg(v[i]) AS c
             FROM e, unnest(range(1, 65)) AS t(i)
             GROUP BY label, i),
       sq AS (SELECT label, round(sum(c * c), 6) AS centroid_sqnorm
              FROM u GROUP BY label)
       SELECT cnt.label AS label, cnt.n AS n, sq.centroid_sqnorm AS centroid_sqnorm
       FROM cnt JOIN sq ON cnt.label = sq.label
       ORDER BY label""") { (s, d) =>
    val e = emb(s, d)
    val byDim = e.select(col("label"), posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("label"), col("i"))
      .agg(avg("x").as("c"), count(lit(1)).as("cnt"))
    byDim.groupBy("label")
      .agg((max("cnt")).as("n"),
        round(sum(col("c") * col("c")), 6).as("centroid_sqnorm"))
      .orderBy("label")
  }

  /** k-NN over int8-quantized vectors — the memory-bandwidth scale lever:
    * per-vector symmetric scalar quantization (scale = 127/max|x|) shrinks
    * the corpus 4-8× so far more of it fits in executor memory / cache,
    * at a small recall cost. All arithmetic after quantization is exact
    * integer math (held in doubles well under 2^53), so unlike float
    * kNN the scores are bit-identical across engines and an ANSI oracle
    * CAN check this approximate method. Quantization uses floor(x+0.5)
    * rather than round() — identical half-up semantics on both engines. */
  val qKnnQuantized: Q = Q(
    "q_knn_quantized",
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (SELECT vec_id, v,
                     127.0 / greatest(list_aggregate(list_transform(v, x -> abs(x)), 'max'), 1e-30) AS sc
              FROM e),
        qz AS (SELECT vec_id, list_transform(v, x -> floor(x * sc + 0.5)) AS q FROM s),
        n AS (SELECT vec_id, q, sqrt(list_dot_product(q, q)) AS nq FROM qz
              WHERE list_dot_product(q, q) > 0),
        qr AS (SELECT vec_id AS query_id, q AS qq, nq AS qn FROM n
               WHERE vec_id IN (${queryIds.mkString(", ")})),
        sc2 AS (SELECT query_id, vec_id AS neighbor_id,
                       round(list_dot_product(qq, q) / (qn * nq), 6) AS sim,
                       row_number() OVER (PARTITION BY query_id
                          ORDER BY round(list_dot_product(qq, q) / (qn * nq), 6) DESC,
                                   vec_id) AS rn
                FROM qr JOIN n ON vec_id <> query_id)
        SELECT query_id, neighbor_id, sim, CAST(rn AS INTEGER) AS rn
        FROM sc2 WHERE rn <= 10
        ORDER BY query_id, rn""") { (s, d) =>
    // one-pass quantize kernel (q + its norm) — the declarative
    // transform/array_max chain collapsed the scale factor into the
    // per-element lambda, re-evaluating the max per element: 35× slower
    // at sf10 (see Int8Quantize's scaladoc for the measurement)
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
        int8Quantize(toDouble(col("embedding"))).as("qz"))
      .select(col("vec_id"), col("qz.q").as("q"), col("qz.nq").as("nq"))
      // zero-norm guard, same contract as [[emb]] (oracle has the twin)
      .filter(col("nq") > 0)
    val q = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("q").as("qq"), col("nq").as("qn"))
    val sim = round(dot(col("qq"), col("q")) / (col("qn") * col("nq")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  /** Unsupervised corpus clustering: assign every embedding to one of the
    * K=32 k-means clusters and report per-cluster size, cohesion (mean
    * cosine to the centroid) and label purity — the semantic-dedup /
    * domain-discovery step of an embedding pipeline (cluster then sample
    * per cluster, or route clusters to different mixture weights).
    *
    * Same scale shape as the IVF index it shares its trainer with:
    * training reads a bounded SampleCap sample on the driver, assignment
    * is a map-only argmax against centroid literals (zero shuffle, zero
    * join — at ingest this is a stored column), and the only shuffled work
    * is two aggregations keyed by the K-valued cluster id whose partials
    * collapse map-side. Purity's argmax label breaks ties (count desc,
    * label asc) so the output is deterministic. Approximate → no SQL
    * oracle; SimilaritySpec pins determinism, the partition law and
    * cohesion bounds. */
  val qEmbeddingClusters: Q = Q.noOracle("q_embedding_clusters") { (s, d) =>
    val e = emb(s, d)
    val centSims = centSimsFor(trainCentroids(e))
    // materialize the assignment once: both aggregations below consume it,
    // and without the cut Spark recomputes the 32-centroid cosine array
    // per row for each (the repeated-scan shape q_source_divergence fixed
    // the same way). The checkpointed frame is 3 narrow columns per row.
    val corpus = e
      .select(col("label"),
        array_position(centSims, array_max(centSims)).as("cluster_id"),
        array_max(centSims).as("csim"))
      .localCheckpoint()
    val stats = corpus.groupBy("cluster_id").agg(
      count(lit(1)).as("n_vectors"),
      round(avg(col("csim")), 6).as("avg_sim"))
    val wl = Window.partitionBy("cluster_id")
      .orderBy(col("cnt").desc, col("label").asc)
    val topLabel = corpus.groupBy("cluster_id", "label")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wl))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("label").as("top_label"), col("cnt"))
    stats.join(topLabel, "cluster_id")
      .select(col("cluster_id"), col("n_vectors"), col("avg_sim"),
        col("top_label"),
        round(col("cnt") / col("n_vectors"), 4).as("top_label_share"))
      .orderBy("cluster_id")
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023): cluster the
    * embedding corpus with the shared k-means quantizer, then drop, WITHIN
    * each cluster, every vector that has a lower-id cluster-mate with
    * cosine ≥ 0.35 (the q_embedding_neardup threshold). The kept set is,
    * per cluster, a deterministic independent set under the threshold —
    * no two kept vectors in a cluster are near-dups of each other
    * (SimilaritySpec pins this and the brute-force witness law).
    *
    * This is the scale answer to q_embedding_neardup's all-pairs join:
    * pair work is confined to clusters (Σ|cluster|² ≪ n² for balanced
    * clusters — the SemDeDup trick), the join key IS the cluster id, and
    * like the paper's recipe it deliberately accepts missing cross-cluster
    * near-dups in exchange for never comparing across clusters. The
    * assignment is the same map-only argmax as q_embedding_clusters;
    * training reads a bounded driver-side sample. */
  val qSemanticDedup: Q = Q.noOracle("q_semantic_dedup") { (s, d) =>
    semanticDedup(emb(s, d)).orderBy("vec_id")
  }

  /** The engine behind q_semantic_dedup, factored over the prepared
    * embedding frame (`vec_id`, `v`, `nv`) so SimilaritySpec can feed it
    * synthetic duplicate-heavy corpora.
    *
    * EXACT-duplicate pre-collapse (the same scale guard every pair-graph
    * operator here carries): identical vectors land in the same cluster
    * and witness each other at sim 1.0, so the pair join runs on one
    * REPRESENTATIVE per distinct vector — a duplicate-heavy corpus
    * shrinks the quadratic intra-cluster work by the copy count instead
    * of exploding with it. Member decisions reconstruct exactly:
    * a non-rep copy of a nonzero vector is always dropped (its rep is a
    * lower-id witness at self-sim 1.0); a rep keeps iff no lower-id rep
    * in its cluster is a near-dup (a member witness c of class W implies
    * the rep witness min(W) ≤ c, so rep-level witnessing is equivalent);
    * and a zero vector's cosine is UNDEFINED — under ANSI Spark the
    * division would even throw — so zero vectors bypass training,
    * assignment and pairing entirely and report kept with a NULL cluster
    * (the semantics a NaN-propagating engine's threshold filter would
    * produce: they can neither witness nor be witnessed). */
  private[graft] def semanticDedup(e: org.apache.spark.sql.DataFrame) = {
    val nonzero = e.filter(col("nv") > 0)
    val zeros = e.filter(!(col("nv") > 0))
      .select(col("vec_id"), lit(null).cast("long").as("cluster_id"),
        lit(true).as("keep"))
    val repIds = nonzero.groupBy("v").agg(min("vec_id").as("__rep"))
    val members = nonzero.select(col("vec_id"), col("v")).join(repIds, "v")
    val centSims = centSimsFor(trainCentroids(nonzero))
    // rep-level assignment pass, cut eagerly: both pair-join sides and
    // the member reconstruction consume it
    val repC = members.filter(col("vec_id") === col("__rep"))
      .join(nonzero.select(col("vec_id"), col("nv")), "vec_id")
      .select(col("vec_id"),
        array_position(centSims, array_max(centSims)).as("cluster_id"),
        col("v"), col("nv"))
      .localCheckpoint()
    val a = repC.select(col("cluster_id"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nv").as("na"))
    val b = repC.select(col("cluster_id"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nv").as("nb"))
    val droppedReps = a.join(b, Seq("cluster_id"))
      .filter(col("id_a") < col("id_b") &&
        dot(col("va"), col("vb")) / (col("na") * col("nb")) >= 0.35)
      .select(col("id_b").as("__droppedrep")).distinct()
    members
      .join(repC.select(col("vec_id").as("__rep"), col("cluster_id")), "__rep")
      .join(droppedReps, // rep-count-bounded; AQE broadcasts when it fits
        col("__rep") === col("__droppedrep"), "left")
      .select(col("vec_id"), col("cluster_id"),
        // nonzero self-sim is identically 1 ≥ τ: every non-rep copy has
        // its rep as a lower-id witness, so only an undropped rep keeps
        (col("__droppedrep").isNull && col("vec_id") === col("__rep"))
          .as("keep"))
      .unionByName(zeros)
  }

  /** Cluster-balanced diversity sampling: keep at most 8 vectors per
    * k-means cluster, preferring those closest to their centroid (highest
    * assignment cosine; vec_id tie-break on the ROUNDED similarity so the
    * output is self-consistent). The corpus-diversification step of
    * embedding-curated pipelines — cap each semantic region instead of
    * sampling uniformly, so rare regions survive and dominant ones stop
    * swamping the mix. Every vector is reported with its keep decision;
    * kept rows carry their within-cluster rank.
    *
    * Scale design: top-M per cluster is computed in TWO window stages —
    * first per (cluster, 64-way id-hash salt), which shuffles the corpus
    * once on a well-spread composite key and bounds every reducer-side
    * sort to its salt slice, then a final window over the ≤ M×64 per-
    * cluster survivors. A single window per cluster would funnel each
    * cluster's full population (billions of rows at 100 TB for K=32)
    * through one reducer sort; the salted pre-prune is the standard
    * top-K-per-group fix and is exactly equivalent (each global top-M row
    * is in its salt slice's top-M). */
  val qClusterSample: Q = Q.noOracle("q_cluster_sample") { (s, d) =>
    val e = emb(s, d)
    val centSims = centSimsFor(trainCentroids(e))
    // assignment pass, cut eagerly: the pre-prune and the final keep join
    // both consume it
    val corpus = e
      .select(col("vec_id"),
        array_position(centSims, array_max(centSims)).as("cluster_id"),
        round(array_max(centSims), 6).as("csim"))
      .localCheckpoint()
    val order = Seq(col("csim").desc, col("vec_id"))
    val pre = corpus
      .withColumn("__salt", pmod(hash(col("vec_id")), lit(64)))
      .withColumn("__prn", row_number().over(
        Window.partitionBy(col("cluster_id"), col("__salt")).orderBy(order: _*)))
      .filter(col("__prn") <= 8)
    val topM = pre
      .withColumn("rn", row_number().over(
        Window.partitionBy("cluster_id").orderBy(order: _*)))
      .filter(col("rn") <= 8)
      .select(col("vec_id"), col("rn"))
    corpus.join(topM, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster_id"), col("csim"),
        col("rn").cast("int").as("rank_in_cluster"),
        col("rn").isNotNull.as("kept"))
      .orderBy("vec_id")
  }

  /** Embedding-space decontamination (N24): the semantic twin of
    * q_decontaminate's n-gram check — for every corpus vector, the nearest
    * EVAL-set vector and its cosine; a paraphrased benchmark item that
    * shares no 8-gram still lands near its source in embedding space.
    * Emits the nearest eval id + similarity per vector and the drop
    * verdict at τ = 0.45. The eval suite is `vec_id % 20 = 0 AND
    * vec_id < 5000`: the %-20 part is the fixture-wide eval convention,
    * the cap encodes that a benchmark suite is FIXED-size — growing the
    * corpus 10× must not grow the per-vector candidate work (the sf1
    * probe measured 26× growth without the cap: the pair frame was
    * O(corpus²/20)).
    *
    * Scale design (100 TB): the eval side is small BY DEFINITION (it is a
    * benchmark suite) — broadcast it; the corpus streams map-only through
    * a codegen dot product. The argmax is `max(struct(sim, -eval_id))`,
    * not a window: partial aggregation collapses each vector's |eval|
    * candidate rows to one BEFORE the exchange, so only |corpus| rows ever
    * shuffle (a window over the pair frame would shuffle |corpus|·|eval|).
    * At extreme eval sizes the candidate generator flips to the IVF/LSH
    * index (q_knn_ivf) exactly as the kNN family documents; the verdict
    * logic is unchanged. Zero-norm vectors are excluded on both sides
    * (cosine undefined; ANSI division would throw) — emb()'s standing
    * guard. */
  val qSemanticDecontaminate: Q = Q(
    "q_semantic_decontaminate",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
                  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])) > 0),
       q AS (SELECT vec_id AS eval_id, v AS qv FROM e
             WHERE vec_id % 20 = 0 AND vec_id < 5000),
       s AS (SELECT e.vec_id, q.eval_id,
                    round(list_cosine_similarity(q.qv, e.v), 6) AS sim
             FROM e JOIN q ON (e.vec_id % 20 <> 0 OR e.vec_id >= 5000)),
       r AS (SELECT vec_id, eval_id, sim,
                    row_number() OVER (PARTITION BY vec_id
                                       ORDER BY sim DESC, eval_id) AS rn
             FROM s)
       SELECT vec_id, eval_id AS nearest_eval_id, sim AS max_sim,
              (sim >= 0.45) AS contaminated
       FROM r WHERE rn = 1 ORDER BY vec_id""") { (s, d) =>
    val e = emb(s, d)
    val isEval = col("vec_id") % 20 === 0 && col("vec_id") < 5000
    val q = e.filter(isEval)
      .select(col("vec_id").as("eval_id"), col("v").as("qv"),
        col("nv").as("qn"))
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6)
    // argmax as a plain aggregate: struct compares (sim, -eval_id)
    // lexicographically, so max == highest sim, ties to the LOWEST eval id
    // — the oracle's (sim DESC, eval_id) order — and partial aggregation
    // keeps the |corpus|·|eval| pair frame out of the exchange
    e.filter(!isEval)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("eval_id"), sim.as("sim"))
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("eval_id")).as("neg_id"))).as("top"))
      .select(col("vec_id"), (-col("top.neg_id")).as("nearest_eval_id"),
        col("top.sim").as("max_sim"),
        (col("top.sim") >= 0.45).as("contaminated"))
      .orderBy("vec_id")
  }

  // ---- product quantization (N37) ----

  private val PqM = 16           // subspaces
  private val PqSub = Dim / PqM  // dims per subspace
  private val PqK = 16           // codewords per subspace
  private val PqRefine = 100     // ADC candidate depth (10×k oversampling)

  /** Deterministic Lloyd k-means under plain L2 — the PQ codebook
    * objective (subvectors are NOT directions, so the spherical trainer
    * above would be wrong here). Same determinism recipe: stride init,
    * fixed iteration count, first-min-wins assignment, empty clusters
    * drop. */
  private def localKMeansL2(xs: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(xs.nonEmpty, "k-means needs a non-empty training sample")
    val dim = xs.head.length
    val initStride = math.max(1, xs.length / k)
    var cents: Array[Array[Double]] =
      xs.indices.collect { case i if i % initStride == 0 => xs(i) }
        .take(k).toArray
    for (_ <- 1 to iters) {
      val sums = Array.fill(cents.length)(new Array[Double](dim))
      val counts = new Array[Long](cents.length)
      xs.foreach { x =>
        var best = 0
        var bestD = Double.PositiveInfinity
        var j = 0
        while (j < cents.length) {
          var s = 0.0
          var t = 0
          while (t < dim) { val d = x(t) - cents(j)(t); s += d * d; t += 1 }
          if (s < bestD) { bestD = s; best = j }
          j += 1
        }
        var t = 0
        while (t < dim) { sums(best)(t) += x(t); t += 1 }
        counts(best) += 1
      }
      cents = sums.indices.collect { case j if counts(j) > 0 =>
        sums(j).map(_ / counts(j))
      }.toArray
    }
    cents
  }

  /** PQ codebooks: for each of the M=16 subspaces, K=16 L2 centroids of
    * the normalized training sample's 4-dim slice — trained driver-side
    * over the same bounded stride sample as the IVF coarse quantizer
    * (O(SampleCap·Dim) memory regardless of corpus size). */
  private def trainPqCodebooks(e: DataFrame): Seq[Array[Array[Double]]] = {
    val n = e.count()
    val stride = math.max(1L, n / SampleCap)
    val sample: Array[Array[Double]] = e
      .filter(col("vec_id") % stride === 0)
      .orderBy("vec_id")
      .limit(SampleCap)
      .select(col("v"), col("nv"))
      .collect()
      .map { r =>
        val nv = r.getDouble(1)
        r.getSeq[Double](0).toArray.map(_ / nv)
      }
    (0 until PqM).map { m =>
      localKMeansL2(sample.map(_.slice(m * PqSub, (m + 1) * PqSub)),
        PqK, LloydIters)
    }
  }

  /** Codes come from the one-pass [[graft.functions.PqEncode]] kernel
    * (r12): 1-based argmin_k ‖x_m − c_k‖² per subspace, computed as
    * argmin(‖c_k‖² − 2⟨x_m, c_k⟩) with first-min-wins — PqEncodeSpec pins
    * it code-for-code against the declarative slice + array_position
    * (array_min) form it replaced. */

  /** Approximate k-NN via product quantization (Jégou et al. 2011) — the
    * compression side of a FAISS-style IVFPQ index, complementing
    * qKnnIvf's routing side:
    *
    *  1. TRAIN: M=16 codebooks of K=16 codewords each, L2 k-means per
    *     4-dim subspace over the bounded driver sample (same recipe and
    *     cost bound as the IVF trainer).
    *  2. ENCODE: each corpus vector (normalized, so inner product =
    *     cosine) maps to M 4-bit codes — a map-only projection, no
    *     shuffle; at ingest this is a stored 8-byte column replacing the
    *     256-byte vector, the 32× memory lever that lets a 100 TB corpus'
    *     index live in RAM.
    *  3. ADC SCORE: each query precomputes the M×K table of
    *     ⟨q_m, c_{m,k}⟩ once (driver-trivial), then every corpus row
    *     scores with M table lookups — no float dot products against the
    *     corpus at all. cos(q, x) ≈ Σ_m table[m][code_m] because the
    *     normalized vector is approximated by its codeword concatenation.
    *  4. REFINE: exact cosine re-rank of the ADC top-100 only (10×k
    *     oversampling) — the standard accuracy-recovery step; the full
    *     vectors are touched for 100 rows per query, not the corpus.
    *
    * Approximate → no SQL oracle (float k-means training); SimilaritySpec
    * pins recall vs q_knn_exact, encoding laws, and determinism. */
  val qKnnPq: Q = Q.noOracle("q_knn_pq") { (s, d) =>
    val e = emb(s, d)
    val books = trainPqCodebooks(e)
    // 2. encode: all M codes in ONE codegen'd per-row pass (r12 — the
    // declarative slice+argmin tree was M·K interpreted array builds per
    // row; PqEncode is arithmetic-identical, spec-pinned vs pqCodeFor)
    val corpus = e
      .withColumn("codes", pqEncode(col("v"), col("nv"), books.toArray))
    // 3. query-side ADC tables (5 queries × 16×16 doubles — driver-tiny)
    val qRows = corpus.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("v"), col("nv")).collect()
      .map { r =>
        val nv = r.getDouble(2)
        val q = r.getSeq[Double](1).toArray.map(_ / nv)
        val tabs: Seq[Seq[Double]] = (0 until PqM).map { m =>
          books(m).toIndexedSeq.map { c =>
            var sum = 0.0
            var t = 0
            while (t < PqSub) { sum += q(m * PqSub + t) * c(t); t += 1 }
            sum
          }
        }
        (r.getLong(0), q.toSeq, tabs)
      }
    import s.implicits._
    val qdf = qRows.toSeq.toDF("query_id", "qv", "tabs")
      .withColumn("qn", norm(col("qv")))
    // ADC score = M table lookups, codegen'd (r12): same ascending-m
    // double fold as the interpreted aggregate() it replaces
    val adc = pqAdcScore(col("codes"), col("tabs"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("vec_id"))
    val cand = corpus.crossJoin(broadcast(qdf))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("nv"),
        col("qv"), col("qn"), adc.as("adc"))
      .withColumn("pr", row_number().over(wAdc))
      .filter(col("pr") <= PqRefine)
    // 4. exact re-rank of the bounded candidate set
    val sim = round(dot(col("qv"), col("v")) / (col("qn") * col("nv")), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cand.select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  /** IVF-PQ k-NN — the two halves composed into the index shape production
    * vector search actually deploys (FAISS IVFPQ): qKnnIvf's coarse
    * routing bounds WHICH rows are scored, qKnnPq's ADC bounds WHAT
    * scoring a row costs.
    *
    *  1. TRAIN both quantizers on the same bounded driver sample (coarse:
    *     32 spherical centroids; fine: 16×16 L2 codebooks).
    *  2. ENCODE the corpus map-only: list_id (argmax centroid sim) + M=16
    *     4-bit codes — together ~9 bytes of index state per vector, the
    *     representation that lets a 100 TB corpus' index live in memory.
    *  3. QUERY prep is driver-side and tiny: each query's NProbe=24 probe
    *     lists (same (−sim, list) order as qKnnIvf) and its M×K ADC table.
    *  4. SCORE: corpus ⋈ broadcast(probes) on list_id — only probed-list
    *     rows are touched — and each candidate costs M table LOOKUPS, no
    *     dot product. Top-100 ADC per query, then exact cosine re-rank of
    *     those 100 — full vectors touched for 100 rows per query.
    *
    * The cost model vs the parents: qKnnIvf pays an exact dot product per
    * probed row; qKnnPq pays ADC per CORPUS row. IVFPQ pays ADC per probed
    * row — strictly the cheapest of the family on both axes, which is why
    * it is the default at billion-vector scale. Approximate → no SQL
    * oracle; SimilaritySpec pins recall@10 vs q_knn_exact, the full-top-10
    * shape, and end-to-end determinism (fixed sample, first-win argmins,
    * (adc, vec_id) and (sim, vec_id) total orders). */
  val qKnnIvfPq: Q = Q.noOracle("q_knn_ivfpq") { (s, d) =>
    val e = emb(s, d)
    val cents = trainCentroids(e)
    val books = trainPqCodebooks(e)
    // 2. encode: coarse list + PQ codes, one map-only pass
    val centSims = centSimsFor(cents)
    val corpus = e
      .withColumn("list_id", array_position(centSims, array_max(centSims)))
      .withColumn("codes", pqEncode(col("v"), col("nv"), books.toArray))
    // 3. query prep (driver-tiny): normalized q, probe lists, ADC table
    val qRows = e.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("v"), col("nv")).collect()
      .map { r =>
        val nv = r.getDouble(2)
        val q = r.getSeq[Double](1).toArray.map(_ / nv)
        val sims = cents.toIndexedSeq.zipWithIndex.map { case (cv, i) =>
          val cn = math.sqrt(cv.map(x => x * x).sum)
          var sum = 0.0
          var t = 0
          while (t < q.length) { sum += q(t) * cv(t); t += 1 }
          (sum / cn, (i + 1).toLong)
        }
        val probes = sims.sortBy { case (sim, lid) => (-sim, lid) }
          .take(NProbe).map(_._2)
        val tabs: Seq[Seq[Double]] = (0 until PqM).map { m =>
          books(m).toIndexedSeq.map { c =>
            var sum = 0.0
            var t = 0
            while (t < PqSub) { sum += q(m * PqSub + t) * c(t); t += 1 }
            sum
          }
        }
        (r.getLong(0), q.toSeq, probes, tabs)
      }
    import s.implicits._
    val qdf = qRows.toSeq.toDF("query_id", "qv", "probe", "tabs")
      .select(col("query_id"), col("qv"), col("tabs"),
        explode(col("probe")).as("list_id"))
    // 4. ADC inside probed lists only (codegen'd lookup fold — r12),
    // then exact re-rank of the top-100
    val adc = pqAdcScore(col("codes"), col("tabs"))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc").desc, col("vec_id"))
    val cand = corpus.join(broadcast(qdf),
        corpus("list_id") === qdf("list_id") &&
          col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("v"), col("nv"),
        col("qv"), adc.as("adc"))
      .withColumn("pr", row_number().over(wAdc))
      .filter(col("pr") <= PqRefine)
    val sim = round(dot(col("qv"), col("v")) / col("nv"), 6)
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cand.select(col("query_id"), col("vec_id"), sim.as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("sim"),
        col("rn"))
      .orderBy("query_id", "rn")
  }

  // ---------- integer k-means budget twin (VERDICT r10 #3) ----------

  /** The xxhash playbook applied to clustering: the production k-means
    * queries can't be oracled because Lloyd iterations on doubles are
    * float-order-sensitive, so this budget-sized twin runs the SAME
    * algorithm — stride sample, fixed init, assign-argmin, mean update,
    * empty clusters keep their centroid — entirely in INTEGER arithmetic,
    * where a DuckDB CTE chain can replay every iteration bit-exactly:
    *  - quantize dims 1..8 as floor(v*32 + 0.5) (scale 2^5 ⇒ v*32 is
    *    EXACT in double, so both engines see identical integers),
    *  - train on the ≤64-row `vec_id % 7 = 0` stride sample (bounded
    *    driver work — the exact SampleCap discipline of the float path),
    *  - K=4 centroids init from sample rows 1/17/33/49, two Lloyd
    *    iterations with floor-division means (floorDiv ≡ floor(sum/cnt):
    *    sums ≤ 2^15, exact in double on the oracle side),
    *  - assignment = argmin of integer L2, ties to the lowest cluster
    *    (row_number ORDER BY dist, k on the oracle).
    * The distributed part keeps the production plan shape: a map-only
    * projection of the corpus against centroid literals — no shuffle, no
    * join. This witnesses the full train→assign structure; the float
    * production rows stay no-oracle on float math alone. */
  private val IkDim = 8
  private val IkK = 4
  private val IkIters = 2
  private val IkInitRns = Seq(1, 17, 33, 49)

  private def ikTrain(sample: Array[Array[Long]]): Array[Array[Long]] = {
    require(sample.length >= IkInitRns.max,
      s"integer k-means twin needs >= ${IkInitRns.max} sample rows")
    var cents: Array[Array[Long]] = IkInitRns.map(rn => sample(rn - 1)).toArray
    for (_ <- 1 to IkIters) {
      val sums = Array.fill(IkK)(new Array[Long](IkDim))
      val counts = new Array[Long](IkK)
      sample.foreach { x =>
        var best = 0
        var bestD = Long.MaxValue
        var k = 0
        while (k < IkK) {
          var d = 0L
          var i = 0
          while (i < IkDim) {
            val t = x(i) - cents(k)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = k }
          k += 1
        }
        var i = 0
        while (i < IkDim) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cents = cents.indices.map { k =>
        if (counts(k) > 0)
          Array.tabulate(IkDim)(i => Math.floorDiv(sums(k)(i), counts(k)))
        else cents(k)
      }.toArray
    }
    cents
  }

  /** Quantize → train (driver, bounded sample) → assign (map-only against
    * centroid literals): the shared engine half of both integer twins. */
  private def ikAssigned(s: SparkSession, d: String): DataFrame = {
    val quant = Tables.embeddings(s, d)
      .select(col("vec_id") +: (0 until IkDim).map(i =>
        floor(element_at(toDouble(col("embedding")), i + 1) * 32.0 + lit(0.5))
          .cast("long").as(s"x$i")): _*)
    val sample = quant.filter(col("vec_id") % 7 === 0)
      .orderBy("vec_id").limit(64).collect()
      .map(r => Array.tabulate(IkDim)(i => r.getLong(i + 1)))
    val cents = ikTrain(sample)
    val dists = cents.map { c =>
      (0 until IkDim).map { i =>
        val t = col(s"x$i") - lit(c(i)); t * t
      }.reduce(_ + _)
    }
    val m = least(dists: _*)
    // first-match CASE in ascending k = the oracle's ORDER BY dist, k
    val cluster = dists.zipWithIndex.tail.foldLeft(
        when(dists.head === m, lit(0))) { case (acc, (dk, k)) =>
      acc.when(dk === m, lit(k))
    }
    quant.select(col("vec_id"), cluster.as("cluster_id"), m.as("dist2"))
  }

  val qEmbeddingClustersSmall: Q = Q("q_embedding_clusters_small",
    ikOracleSql) { (s, d) => ikAssigned(s, d).orderBy("vec_id") }

  /** N21's structure — top-M per cluster by distance-to-centroid — on the
    * integer pipeline, so the SAMPLING step of the float-blocked family
    * has an exact oracle too (the float q_cluster_sample stays law-pinned).
    * M=8 mirrors production; ties break on vec_id, all-integer ordering. */
  val qClusterSampleSmall: Q = Q("q_cluster_sample_small",
    ikSampleOracleSql) { (s, d) =>
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("dist2").asc, col("vec_id").asc)
    ikAssigned(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .orderBy("cluster_id", "rn")
  }

  /** The DuckDB twin: the whole train loop unrolled as CTEs — one
    * assign+update pair per Lloyd iteration — then the final corpus-wide
    * assignment. Generated, not hand-written, so dims/K/iters stay in
    * lockstep with the engine constants. */
  /** Shared WITH-prefix through `fin` (per-vector best cluster) — both
    * integer-twin oracles append their own final SELECT. */
  private def ikPrefixSql: String = {
    val dims = 0 until IkDim
    val quantCols = dims.map(i =>
      s"CAST(floor(v[${i + 1}] * 32.0 + 0.5) AS BIGINT) AS x$i").mkString(", ")
    def distExpr(sa: String, ca: String) = dims.map(i =>
      s"($sa.x$i - $ca.c$i) * ($sa.x$i - $ca.c$i)").mkString(" + ")
    val init = IkInitRns.zipWithIndex.map { case (rn, k) =>
      s"SELECT $k AS k, ${dims.map(i => s"x$i AS c$i").mkString(", ")} " +
        s"FROM samp WHERE rn = $rn"
    }.mkString(" UNION ALL ")
    val iters = (1 to IkIters).map { t =>
      val prev = s"cent${t - 1}"
      s"""asg$t AS (
         SELECT vec_id, k, dist,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rnn
         FROM (SELECT s.vec_id, c.k, ${distExpr("s", "c")} AS dist
               FROM samp s CROSS JOIN $prev c)),
       cent$t AS (
         SELECT p.k, ${dims.map(i =>
           s"CASE WHEN g.cnt > 0 THEN CAST(floor(g.sx$i * 1.0 / g.cnt) AS BIGINT) ELSE p.c$i END AS c$i")
           .mkString(", ")}
         FROM $prev p LEFT JOIN (
           SELECT a.k, count(*) AS cnt,
                  ${dims.map(i => s"CAST(sum(s.x$i) AS BIGINT) AS sx$i").mkString(", ")}
           FROM asg$t a JOIN samp s ON a.vec_id = s.vec_id
           WHERE a.rnn = 1 GROUP BY a.k) g ON p.k = g.k)"""
    }.mkString(",\n")
    s"""WITH q AS (
         SELECT vec_id, $quantCols
         FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)),
       samp AS (
         SELECT *, row_number() OVER (ORDER BY vec_id) AS rn
         FROM (SELECT * FROM q WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 64)),
       cent0 AS ($init),
       $iters,
       fin AS (
         SELECT vec_id, k, dist,
                row_number() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rnn
         FROM (SELECT q.vec_id, c.k, ${distExpr("q", "c")} AS dist
               FROM q CROSS JOIN cent$IkIters c))"""
  }

  private def ikOracleSql: String =
    s"""$ikPrefixSql
       SELECT vec_id, k AS cluster_id, dist AS dist2
       FROM fin WHERE rnn = 1 ORDER BY vec_id"""

  private def ikSampleOracleSql: String =
    s"""$ikPrefixSql,
       ranked AS (
         SELECT vec_id, k, dist,
                row_number() OVER (PARTITION BY k ORDER BY dist, vec_id) AS rn
         FROM fin WHERE rnn = 1)
       SELECT vec_id, k AS cluster_id, dist AS dist2, CAST(rn AS INTEGER) AS rn
       FROM ranked WHERE rn <= 8 ORDER BY cluster_id, rn"""

  val all: Seq[Q] = Seq(qCosineTopPairs, qKnnExact, qKnnLsh, qKnnIvf, qCentroids,
    qKnnQuantized, qEmbeddingClusters, qEmbeddingClustersSmall, qSemanticDedup,
    qClusterSample, qClusterSampleSmall, qSemanticDecontaminate, qKnnPq,
    qKnnIvfPq)
}
