package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.lake._

/** One-off probe of the storage-partitioned-join win at a shape where the
  * shuffle dominates: two co-bucketed lake tables (20M and 4M rows,
  * bucket(32, key)) joined + aggregated, with v2 bucketing off (plain SMJ
  * with two exchanges) vs on (zero-exchange SPJ). Run with
  * `sbt "Test/runMain graft.SpjScaleProbe"`; numbers go to BASELINE.md by
  * hand. Not a spec: wall-clock asserts flake on a loaded host. */
object SpjScaleProbe {

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = Files.createTempDirectory("graft-spj-probe").toString
    spark.conf.set("spark.sql.catalog.spjprobe", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjprobe.warehouse", wh)
    spark.sql("CREATE NAMESPACE spjprobe.db")
    spark.sql("""CREATE TABLE spjprobe.db.facts (k BIGINT, v BIGINT)
                 USING graft PARTITIONED BY (bucket(32, k))
                 TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""")
    spark.sql("""CREATE TABLE spjprobe.db.dims (k BIGINT, w BIGINT)
                 USING graft PARTITIONED BY (bucket(32, k))
                 TBLPROPERTIES ('graft.write.distribution-mode' = 'hash')""")
    timed("write facts (20M rows, 32 buckets)") {
      spark.range(0, 20000000L).selectExpr("id AS k", "id * 3 AS v")
        .writeTo("spjprobe.db.facts").append()
    }
    timed("write dims (4M rows, 32 buckets)") {
      spark.range(0, 4000000L).selectExpr("id * 5 AS k", "id AS w")
        .writeTo("spjprobe.db.dims").append()
    }
    val q = """SELECT count(*) AS n, sum(f.v + d.w) AS s
               FROM spjprobe.db.facts f JOIN spjprobe.db.dims d ON f.k = d.k"""
    // force SMJ both ways so the delta is purely the exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def run(tag: String): Array[org.apache.spark.sql.Row] =
      timed(tag)(spark.sql(q).collect())
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    val warm = run("shuffle join, warm-up pass")
    val off1 = run("shuffle join, pass 2")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    val on1 = run("storage-partitioned join, pass 1")
    val on2 = run("storage-partitioned join, pass 2")
    require(warm.sameElements(off1) && off1.sameElements(on1) &&
      on1.sameElements(on2), "result mismatch between plans")
    println("  rows: " + on1.head.getLong(0) + " sum: " + on1.head.getLong(1))
    spark.stop()
  }
}
