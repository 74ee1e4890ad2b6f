package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Reported sort order (SupportsReportOrdering): tables written under a
  * `graft.sort-order` stamp their files sorted (DataFile.sortedBy), the
  * scan plans one partition per file and reports the order — and a
  * sort-merge join of two co-bucketed sorted tables runs with ZERO
  * shuffles AND ZERO sorts. Claims die with the stamp: a rewrite that
  * does not re-sort produces unstamped files and the sort comes back
  * (correctness never depends on the claim). */
class SortedScanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-sorted").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.sortspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.sortspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val confs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.sorting.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def count(p: SparkPlan)(f: PartialFunction[SparkPlan, Unit]): Int =
    PlanWalk.deepCollect(p)(f).size

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS sortspec.db")
    for (t <- Seq("a", "b")) {
      sql(s"""CREATE TABLE sortspec.db.$t (id BIGINT, v BIGINT)
              USING iceberg PARTITIONED BY (bucket(8, id))
              TBLPROPERTIES ('graft.sort-order' = 'id')""")
      // single append -> one sorted file per bucket
      spark.range(0, 2000).selectExpr("id", s"id * ${t.length + 1} AS v")
        .writeTo(s"sortspec.db.$t").append()
    }
  }

  private val joinSql =
    """SELECT a.id, a.v, b.v AS w FROM sortspec.db.a a
       JOIN sortspec.db.b b ON a.id = b.id"""

  test("sorted co-bucketed join: zero shuffles AND zero sorts") {
    val expected = sql(joinSql).collect().map(_.toString).sorted
    withConf(confs: _*) {
      val df = sql(joinSql)
      val plan = finalPlan(df)
      assert(count(plan) { case _: ShuffleExchangeLike => () } == 0,
        s"expected no exchange:\n$plan")
      assert(count(plan) { case _: SortExec => () } == 0,
        s"expected no sort:\n$plan")
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("an unsorted rewrite kills the claim; results stay correct") {
    sql("""CREATE TABLE sortspec.db.c (id BIGINT, v BIGINT)
           USING iceberg PARTITIONED BY (bucket(8, id))
           TBLPROPERTIES ('graft.sort-order' = 'id')""")
    spark.range(0, 2000).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.c").append()
    // COW rewrite via row-level UPDATE: rewritten files are NOT re-sorted
    // and carry no sortedBy stamp
    sql("UPDATE sortspec.db.c SET v = v + 1 WHERE id % 7 = 0")
    val q = """SELECT a.id, c.v FROM sortspec.db.a a
               JOIN sortspec.db.c c ON a.id = c.id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(confs: _*) {
      val df = sql(q)
      val plan = finalPlan(df)
      assert(count(plan) { case _: SortExec => () } > 0,
        s"unsorted rewrite must bring the sort back:\n$plan")
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("multi-file buckets refuse the ordering claim (Spark-side guard)") {
    sql("""CREATE TABLE sortspec.db.d (id BIGINT, v BIGINT)
           USING iceberg PARTITIONED BY (bucket(8, id))
           TBLPROPERTIES ('graft.sort-order' = 'id')""")
    // two appends -> two sorted files per bucket: each PARTITION is
    // sorted but a merged key group is not; Spark only honors the order
    // when every group has a single partition
    spark.range(0, 1000).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.d").append()
    spark.range(1000, 2000).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.d").append()
    val q = """SELECT a.id, d.v FROM sortspec.db.a a
               JOIN sortspec.db.d d ON a.id = d.id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(confs: _*) {
      val df = sql(q)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("compaction re-sorts through the clustered writer and keeps the stamp") {
    import java.nio.file.Paths
    sql("""CREATE TABLE sortspec.db.e (id BIGINT, v BIGINT)
           USING iceberg TBLPROPERTIES ('graft.sort-order' = 'id')""")
    // two small sorted files, then compact: the rewrite flows through
    // GraftWriter.writeFiles, which re-clusters by the declared order —
    // so the compacted file is sorted AND stamped, restoring claims
    spark.range(0, 300).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.e").append()
    spark.range(300, 600).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.e").append()
    val store = new SnapshotStore(Paths.get(wh, "db", "e"))
    assert(store.head().get.files.forall(_.sortedBy == Seq("id")))
    Maintenance.compact(store = store, spark = spark)
    val after = store.head().get.files
    assert(after.size == 1 && after.forall(_.sortedBy == Seq("id")),
      s"compaction must keep the sort stamp: ${after.map(_.sortedBy)}")
    assert(sql("SELECT count(*) FROM sortspec.db.e").head().getLong(0) == 600)
  }

  test("ORDER BY the sort column needs no SortExec on a single-file scan") {
    sql("""CREATE TABLE sortspec.db.s (id BIGINT, v BIGINT)
           USING iceberg TBLPROPERTIES ('graft.sort-order' = 'id')""")
    spark.range(0, 500).selectExpr("id", "id AS v")
      .writeTo("sortspec.db.s").append()
    val got = sql("SELECT id FROM sortspec.db.s ORDER BY id")
      .collect().map(_.getLong(0))
    assert(got.sameElements(got.sorted))
  }
}
