package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing sf1-gate probe for the incremental EMBEDDING-space ingest
  * (SemanticIngest.ingestBatchSemantic): ingest the sf1 embedding corpus
  * (10 verbatim replicas per base vector — make_sf1.py) in four
  * sequential batches keyed by REPLICA index ((vec_id / stride) % 4, so
  * copies of one base spread across batches and most dup detections must
  * cross batches through the lake-resident cluster index) and measure
  *
  *  - DROP RECALL vs the corpus-global SemDeDup ([[Similarity
  *    .semanticDedup]] over the full corpus in one run): of the vectors
  *    the global form drops, the fraction the online form also rejected.
  *    The two train k-means on DIFFERENT samples (full corpus vs first
  *    batch), so borderline near-dup drops can diverge with the
  *    clustering; exact replicas (the bulk of the drop set) co-cluster
  *    under ANY centroids and must never diverge. Floor 0.9.
  *  - candidate volume: cluster-candidate pairs of the LAST batch against
  *    the fullest index, as a share of the all-pairs frame |batch|·|index|
  *    — the SemDeDup point is Σ|cluster|² ≪ n², so balanced K=32 clusters
  *    give ~1/32 = 0.031; ceiling 0.25 (8× imbalance slack).
  *  - per-batch wall seconds (equal-size batches; growth across batches
  *    would flag corpus-side work leaking into the per-batch cost).
  *
  * Prints ONE JSON line; exit 2 on floor violation. */
object SemanticIngestProbe {

  private val Stride = 1000000000L // make_sf1.py replica key stride
  private val Cat = "semprobecat"

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
      java.nio.file.Files.createTempDirectory("graft-wh-semprobe").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.p")
    val (c, k, x) = (s"$Cat.p.corpus", s"$Cat.p.centroids", s"$Cat.p.index")
    spark.sql(s"CREATE TABLE $c (vec_id BIGINT, embedding ARRAY<FLOAT>) USING graft")
    spark.sql(s"CREATE TABLE $k (cluster_id BIGINT, centroid ARRAY<DOUBLE>) USING graft")
    spark.sql(
      s"CREATE TABLE $x (cluster_id BIGINT, vec_id BIGINT, v ARRAY<DOUBLE>, nv DOUBLE) USING graft")

    val vecs = graft.Tables.embeddings(spark, dir).select("vec_id", "embedding")

    // candidate share of the LAST batch vs the fullest index state
    var candShare = 0.0
    val times = (0 until 4).map { r =>
      val batch = vecs.filter((col("vec_id") / Stride).cast("long") % 4 === r)
      if (r == 3) {
        val cents = SemanticIngest.loadCentroids(spark, k).get
        val centSims = Similarity.centSimsFor(cents)
        val assigned = batch
          .select(col("vec_id"),
            graft.functions.Vectors.toDouble(col("embedding")).as("v"))
          .withColumn("nv", graft.functions.Vectors.norm(col("v")))
          .filter(col("nv") > 0)
          .withColumn("cluster_id",
            array_position(centSims, array_max(centSims)))
        val nCand = SemanticIngest
          .clusterCandidates(spark.table(x), assigned).count()
        val allPairs = math.max(1L, assigned.count()) *
          math.max(1L, spark.table(x).count())
        candShare = nCand.toDouble / allPairs
      }
      val t0 = System.nanoTime()
      SemanticIngest.ingestBatchSemantic(spark, batch, c, k, x)
      (System.nanoTime() - t0) / 1e9
    }

    // global reference on the same corpus
    val e = vecs
      .select(col("vec_id"),
        graft.functions.Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nv", graft.functions.Vectors.norm(col("v")))
    val globalDropped = Similarity.semanticDedup(e)
      .filter(!col("keep")).select("vec_id").localCheckpoint()
    val nDropped = globalDropped.count()
    val rejected = vecs.select("vec_id")
      .join(spark.table(c).select("vec_id"), Seq("vec_id"), "left_anti")
    val nHit = globalDropped.join(rejected, Seq("vec_id"), "left_semi").count()
    val recall = if (nDropped == 0) 1.0 else nHit.toDouble / nDropped

    val ok = recall >= 0.9 && candShare <= 0.25
    def f(v: Double) = f"$v%.4f"
    println(s"""{"probe":"semantic_ingest","global_dropped":$nDropped,""" +
      s""""rejected_dropped":$nHit,"drop_recall":${f(recall)},""" +
      s""""cand_share":${f(candShare)},""" +
      s""""batch_secs":[${times.map(t => f"$t%.1f").mkString(",")}],""" +
      s""""pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
