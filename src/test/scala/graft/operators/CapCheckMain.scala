package graft.operators

/** Scratch diagnostic (r9): capped-vs-exact group identity + overflow at
  * a given corpus dir. Kept as a Test/runMain utility like PrefixProbe. */
object CapCheckMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val (g1, _) = Pipeline.dedupGroupsFrameCapped(spark, d, false, Long.MaxValue)
      val (g2, ov) = Pipeline.dedupGroupsFrameCapped(spark, d, false, 64L)
      val diff = g1.exceptAll(g2).count() + g2.exceptAll(g1).count()
      val o = ov.head()
      println(s"DIR $d diff=$diff capped_shingles=${o.getLong(0)} dropped=${o.getLong(1)}")
    }
    spark.stop()
  }
}
