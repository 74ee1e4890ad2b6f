package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Measures ANN recall@10 vs the exact baseline at an arbitrary SF dir
  * (the SimilaritySpec pins run at sf0.001 only; this probe keeps the
  * recall claims honest at bench scale):
  *
  *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.1"
  *
  * As a STANDING sf1 gate (VERDICT r5 #4 — the sf10 IVF probe-depth fix
  * showed recall moves with scale, so spec-scale pins alone are not
  * enough), tools/sf1_gate.sh runs it at sf1 and the probe EXITS 2 when
  * any family drops below its pinned floor (the same floors
  * SimilaritySpec pins at spec scale: LSH/IVF ≥ 0.9, int8-quantized
  * ≥ 0.8, and — VERDICT r6 #6 — the lossy PQ code paths at honest
  * floors: PQ ≥ 0.7, IVF-PQ ≥ 0.7). */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(q: Q): Set[(Long, Long)] = q.fn(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.qKnnExact)
    var allOk = true
    val parts = for ((name, q, floor) <- Seq(
        ("lsh", Similarity.qKnnLsh, 0.9),
        ("ivf", Similarity.qKnnIvf, 0.9),
        ("quantized", Similarity.qKnnQuantized, 0.8),
        ("pq", Similarity.qKnnPq, 0.7),
        ("ivfpq", Similarity.qKnnIvfPq, 0.7))) yield {
      val recall = (exact intersect pairs(q)).size.toDouble / exact.size
      val ok = recall >= floor
      allOk &= ok
      println(f"[recall] $name%-9s recall@10 = $recall%.3f floor=$floor ($dir)")
      s""""$name":$recall"""
    }
    println(s"""{"probe":"ann_recall",${parts.mkString(",")},"pass":$allOk}""")
    spark.stop()
    if (!allOk) sys.exit(2)
  }
}
