package graft

import org.apache.spark.sql.SparkSession

import graft.lake._

/** Worker process for [[CrossProcessCrashSpec]]: appends fixed-shape
  * batches to one table in a tight loop until the parent kill -9s it.
  * Each batch is one commit of 5 rows `(b*100+k, 'c', b)` — so the parent
  * can assert batch atomicity (a batch is either fully present or fully
  * absent) no matter where the kill landed. */
object XProcCrashWorker {
  def main(args: Array[String]): Unit = {
    val wh = args(0)
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.xc", classOf[GraftCatalog].getName)
      .config("spark.sql.catalog.xc.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var b = 0
    while (true) {
      val values = (0 until 5).map(k => s"(${b * 100 + k}, 'c', $b)").mkString(", ")
      spark.sql(s"INSERT INTO xc.d.ct VALUES $values")
      b += 1
    }
  }
}
