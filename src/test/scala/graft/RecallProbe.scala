package graft

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Measures ANN recall@10 vs the exact baseline at an arbitrary SF dir
  * (the SimilaritySpec pins run at sf0.001 only; BASELINE.md's recall
  * claims at sf0.1 are kept honest with this probe):
  *
  *   sbt "Test/runMain graft.RecallProbe /root/testdata/sf0.1"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def pairs(q: Q): Set[(Long, Long)] = q.fn(spark, dir)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.qKnnExact)
    for ((name, q) <- Seq("lsh" -> Similarity.qKnnLsh,
        "ivf" -> Similarity.qKnnIvf, "quantized" -> Similarity.qKnnQuantized)) {
      val recall = (exact intersect pairs(q)).size.toDouble / exact.size
      println(f"[recall] $name%-9s recall@10 = $recall%.3f ($dir)")
    }
    spark.stop()
  }
}
