package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing sf1-gate probe for the incremental NEAR-dup ingest
  * (Ingest.ingestBatchNearDup): ingest the adversarial corpus in four
  * sequential batches (doc_id % 4 — every batch mixes bases, so most
  * near-dup detections must cross batches through the lake-resident band
  * index) and measure
  *
  *  - RECALL of online dup rejection against ground truth: a gated doc
  *    with a same-base (make_sf1.py stride) exact-Jaccard ≥ 0.8 partner
  *    of smaller doc_id must end up rejected (its group's earlier member
  *    was admitted, or transitively rejected against it). Chains can
  *    lower this below the offline LSH recall, so the floor (0.9) sits
  *    under the measured adversarial value.
  *  - candidate volume per batch doc from the band index (≤ 20, the
  *    q_minhash_dedup bound — candidate explosion is the failure mode of
  *    a band index on a duplication-heavy corpus).
  *  - per-batch wall seconds (equal-size batches; growth across batches
  *    would flag corpus-side work leaking into the per-batch cost).
  *
  * Prints ONE JSON line; exit 2 on floor violation. */
object NearDupIngestProbe {

  private val Stride = 1000000000L // make_sf1.py replica key stride
  private val Cat = "ndprobecat"

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
      java.nio.file.Files.createTempDirectory("graft-wh-ndprobe").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.p")
    val (c, b) = (s"$Cat.p.corpus", s"$Cat.p.bands")
    spark.sql(s"CREATE TABLE $c (doc_id BIGINT, text STRING) USING graft")
    spark.sql(
      s"CREATE TABLE $b (band_idx INT, band_hash BIGINT, doc_id BIGINT) USING graft")

    val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")

    // candidate volume of the LAST batch against the fullest index state:
    // measured inside the loop below via corpusBandCandidates
    var candPerDoc = 0.0
    val times = (0 until 4).map { k =>
      val batch = docs.filter(col("doc_id") % 4 === k)
      if (k == 3) {
        val sigs = Dedup.minhashSignatures(batch)
        val bands = Dedup.minhashBands(sigs)
        val nCand = Ingest.corpusBandCandidates(spark.table(b), bands).count()
        val nDocs = math.max(1L, sigs.count())
        candPerDoc = nCand.toDouble / nDocs
      }
      val t0 = System.nanoTime()
      Ingest.ingestBatchNearDup(spark, batch, c, b)
      (System.nanoTime() - t0) / 1e9
    }

    // ground truth: gated docs with a smaller-id same-base J >= 0.8
    // gated partner (the quality gate is the ingest's own first stage)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val prof = ColumnBridge.column(
      graft.functions.TextProfile(ColumnBridge.expression(col("text"))))
    val gated = docs.withColumn("__p", prof)
      .filter(col("__p.n_tokens").between(10, 100000) &&
        TextOps.perCharRatio(col("__p.n_punct")) < 0.1)
      .drop("__p").localCheckpoint()
    val base = gated.select(col("doc_id"), (col("doc_id") % Stride).as("b"))
    val truthPairs = base.as("a")
      .join(base.as("b"),
        col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truthDocs = Dedup.exactJaccard(gated, truthPairs)
      .filter(col("jaccard") >= 0.8)
      .select(col("id_b").as("doc_id")).distinct().localCheckpoint()
    val nTruth = truthDocs.count()
    val rejected = gated.select("doc_id")
      .join(spark.table(c).select("doc_id"), Seq("doc_id"), "left_anti")
    val nHit = truthDocs.join(rejected, Seq("doc_id"), "left_semi").count()
    val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth

    val ok = recall >= 0.9 && candPerDoc <= 20.0
    def f(v: Double) = f"$v%.4f"
    println(s"""{"probe":"neardup_ingest","truth_dup_docs":$nTruth,""" +
      s""""rejected_truth":$nHit,"recall":${f(recall)},""" +
      s""""cand_per_doc":${f(candPerDoc)},""" +
      s""""batch_secs":[${times.map(t => f"$t%.1f").mkString(",")}],""" +
      s""""pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
