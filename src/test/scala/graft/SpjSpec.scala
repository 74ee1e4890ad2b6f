package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Storage-partitioned joins (Spj.scala): two graft tables co-partitioned
  * on the same transform join WITHOUT a shuffle when
  * `spark.sql.sources.v2.bucketing.enabled` is on — the layout the scan
  * reports via KeyGroupedPartitioning replaces both exchanges. The suite
  * pins the plan shape (zero ShuffleExchange), result parity against the
  * default shuffle plan, the writer↔function hash agreement the feature's
  * correctness rests on, and the conservative fallbacks. */
class SpjSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-spj").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.spjspec", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.spjspec.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  /** Run `body` under conf overrides, restoring prior values after. */
  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prior = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private val spjOn = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  /** Final (post-AQE) physical plan after executing the frame. */
  private def finalPlan(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  // deep walk: AQE hides executed subtrees inside QueryStageExec leaves
  private def shuffleCount(p: SparkPlan): Int =
    PlanWalk.deepCollect(p) { case e: ShuffleExchangeLike => e }.size

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS spjspec.db")
    sql("""CREATE TABLE spjspec.db.facts (id BIGINT, v BIGINT)
           USING iceberg PARTITIONED BY (bucket(8, id))""")
    sql("""CREATE TABLE spjspec.db.dims (id BIGINT, name STRING)
           USING iceberg PARTITIONED BY (bucket(8, id))""")
    spark.range(0, 1000).selectExpr("id", "id * 7 AS v")
      .writeTo("spjspec.db.facts").append()
    spark.range(0, 500).selectExpr("id", "concat('n', id) AS name")
      .writeTo("spjspec.db.dims").append()
  }

  private val joinSql =
    """SELECT f.id, f.v, d.name FROM spjspec.db.facts f
       JOIN spjspec.db.dims d ON f.id = d.id"""

  test("bucket-bucket equi-join plans with ZERO shuffles") {
    val expected = sql(joinSql).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(joinSql)
      val plan = finalPlan(df)
      assert(shuffleCount(plan) == 0, s"expected no exchange:\n$plan")
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("SPJ survives per-side partial bucket coverage (pushPartValues)") {
    // dims2 only covers the buckets its 20 rows hash into
    sql("""CREATE TABLE spjspec.db.dims2 (id BIGINT, name STRING)
           USING iceberg PARTITIONED BY (bucket(8, id))""")
    spark.range(0, 20).selectExpr("id * 31 AS id", "concat('m', id) AS name")
      .writeTo("spjspec.db.dims2").append()
    val q = """SELECT f.id, d.name FROM spjspec.db.facts f
               JOIN spjspec.db.dims2 d ON f.id = d.id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(shuffleCount(finalPlan(df)) == 0)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("identity-partitioned tables join shuffle-free on the partition column") {
    sql("""CREATE TABLE spjspec.db.left_r (region STRING, x BIGINT)
           USING iceberg PARTITIONED BY (region)""")
    sql("""CREATE TABLE spjspec.db.right_r (region STRING, y BIGINT)
           USING iceberg PARTITIONED BY (region)""")
    val regions = Seq("emea", "apac", "amer")
    import spark.implicits._
    regions.zipWithIndex.flatMap { case (r, i) =>
      (0 until 50).map(j => (r, (i * 50 + j).toLong))
    }.toDF("region", "x").writeTo("spjspec.db.left_r").append()
    regions.zipWithIndex.map { case (r, i) => (r, i.toLong) }
      .toDF("region", "y").writeTo("spjspec.db.right_r").append()
    val q = """SELECT l.region, l.x, r.y FROM spjspec.db.left_r l
               JOIN spjspec.db.right_r r ON l.region = r.region"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(shuffleCount(finalPlan(df)) == 0, finalPlan(df).toString)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("the reported bucket function matches the writer's stored partition values") {
    // stored values come from pmod(hash(col), n) (PartitionTransforms
    // .valueColumn); the V2 function must agree on every row or SPJ key
    // groups are wrong — compare across types, including NULL
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    def bound(dt: DataType): ScalarFunction[Int] =
      PartitionV2Functions.load("bucket").get
        .bind(StructType(Seq(
          StructField("n", IntegerType), StructField("c", dt))))
        .asInstanceOf[ScalarFunction[Int]]
    val rows = spark.sql(
      """SELECT pmod(hash(CAST(id AS BIGINT)), 8),
                pmod(hash(CAST(id AS INT)), 8),
                pmod(hash(concat('k', id)), 8),
                pmod(hash(CAST(NULL AS BIGINT)), 8)
         FROM range(0, 100)""").collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(bound(LongType).produceResult(
        InternalRow(8, i.toLong)) == r.getInt(0))
      assert(bound(IntegerType).produceResult(
        InternalRow(8, i)) == r.getInt(1))
      assert(bound(StringType).produceResult(
        InternalRow(8, UTF8String.fromString(s"k$i"))) == r.getInt(2))
      assert(bound(LongType).produceResult(
        InternalRow(8, null)) == r.getInt(3))
    }
  }

  test("bucketed side joins an in-memory frame via the function-evaluated shuffle") {
    // v2.bucketing.shuffle: Spark EVALUATES graft's bucket function to
    // co-partition the non-bucketed side — exercises produceResult on
    // real rows; a hash mismatch would silently drop matches here
    import spark.implicits._
    val mem = (0L until 1000L by 13L).map(i => (i, s"x$i")).toDF("id", "tag")
    mem.createOrReplaceTempView("spj_mem")
    val q = """SELECT f.id, m.tag FROM spjspec.db.facts f
               JOIN spj_mem m ON f.id = m.id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn :+
        ("spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true"): _*) {
      val df = sql(q)
      val plan = finalPlan(df)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
      assert(shuffleCount(plan) <= 1, s"bucketed side must not shuffle:\n$plan")
    }
  }

  test("projection without the partition column still plans and runs") {
    // key expressions resolve against the scan OUTPUT; Spj must refuse
    // to report when the source column is pruned away, not crash
    withConf(spjOn: _*) {
      assert(sql("SELECT v FROM spjspec.db.facts").count() == 1000)
      assert(sql("SELECT name FROM spjspec.db.dims WHERE name = 'n7'")
        .count() == 1)
    }
  }

  test("join off the partition key still shuffles and stays correct") {
    val q = """SELECT f.id, d.name FROM spjspec.db.facts f
               JOIN spjspec.db.dims d ON f.v = d.id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("NULL identity partition values form their own key group") {
    sql("""CREATE TABLE spjspec.db.nulls_l (k BIGINT, a STRING)
           USING iceberg PARTITIONED BY (k)""")
    sql("""CREATE TABLE spjspec.db.nulls_r (k BIGINT, b STRING)
           USING iceberg PARTITIONED BY (k)""")
    sql("""INSERT INTO spjspec.db.nulls_l VALUES
           (1, 'a1'), (2, 'a2'), (NULL, 'an')""")
    sql("""INSERT INTO spjspec.db.nulls_r VALUES
           (1, 'b1'), (NULL, 'bn'), (3, 'b3')""")
    val q = """SELECT l.k, l.a, r.b FROM spjspec.db.nulls_l l
               JOIN spjspec.db.nulls_r r ON l.k = r.k"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(shuffleCount(finalPlan(df)) == 0)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
      assert(df.count() == 1) // NULL keys never join-match
    }
  }

  test("GROUP BY the bucket column aggregates without a shuffle") {
    // KeyGroupedPartitioning satisfies the aggregation's clustering too:
    // per-key groups are complete, so partial+final collapse in place
    val q = """SELECT id, count(*) AS c, sum(v) AS s
               FROM spjspec.db.facts GROUP BY id"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(shuffleCount(finalPlan(df)) == 0, finalPlan(df).toString)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }

  test("days-partitioned tables join shuffle-free on the timestamp column") {
    sql("""CREATE TABLE spjspec.db.ev_l (ts TIMESTAMP, n BIGINT)
           USING iceberg PARTITIONED BY (days(ts))""")
    sql("""CREATE TABLE spjspec.db.ev_r (ts TIMESTAMP, m BIGINT)
           USING iceberg PARTITIONED BY (days(ts))""")
    sql("""INSERT INTO spjspec.db.ev_l SELECT
           timestamp'2025-03-01 00:00:00' + make_interval(0,0,0,0,id,0,0), id
           FROM range(0, 96)""")
    sql("""INSERT INTO spjspec.db.ev_r SELECT
           timestamp'2025-03-01 00:00:00' + make_interval(0,0,0,0,id,0,0), id*2
           FROM range(0, 96)""")
    val q = """SELECT l.ts, l.n, r.m FROM spjspec.db.ev_l l
               JOIN spjspec.db.ev_r r ON l.ts = r.ts"""
    val expected = sql(q).collect().map(_.toString).sorted
    withConf(spjOn: _*) {
      val df = sql(q)
      assert(shuffleCount(finalPlan(df)) == 0, finalPlan(df).toString)
      assert(df.collect().map(_.toString).sorted.sameElements(expected))
    }
  }
}
