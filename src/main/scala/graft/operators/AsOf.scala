package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** AS-OF join — the canonical "operator Spark lacks" (the time-series
  * point-in-time join): for each left row, the most recent right row at or
  * before its timestamp, per key.
  *
  * Implemented by COMPOSITION (preference order (a) of the build mandate):
  * tag both inputs, union, and run one `last(_, ignoreNulls)` window over
  * (key, time) — a single hash-partitioned shuffle on the key, no
  * range-join explosion, no per-key driver loop. This is the scalable
  * union-window formulation: wall cost is one sort per key partition
  * regardless of how many right rows precede each left row. Ties inside a
  * timestamp resolve deterministically (right rows sort before left rows
  * at the same instant → "at or before" semantics; among tied right rows
  * the max key wins).
  */
object AsOf {

  /** Generic as-of join: left (keyCol, timeCol) picks up `valueCol` of the
    * latest right row with rightTime <= leftTime. */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValue: String): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
      .withColumnRenamed(leftKey, "__k").withColumnRenamed(leftTime, "__t")
      .withColumn("__v", lit(null).cast(right.schema(rightValue).dataType))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      col(rightValue).as("__v"), lit(0).as("__is_left"))
    val lCols = l.columns.filterNot(r.columns.contains).toSeq
    val unioned = l.select((r.columns.map(col) ++ lCols.map(col)).toIndexedSeq: _*)
      .unionByName(r.select(r.columns.map(col).toIndexedSeq: _*)
        .withColumns(lCols.map(c => c -> lit(null).cast(l.schema(c).dataType)).toMap))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_left").asc, col("__v").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__v")
  }

  /** Each event picks up the user's most recent order at or before the
    * event time (orders all precede the events in the fixture, so the
    * as-of row is the user's latest order — the semantics and plan shape
    * are what's exercised). */
  val qAsofJoin: Q = Q(
    "q_asof_join",
    """SELECT e.event_id,
              e.user_id,
              (SELECT max(o.o_orderkey) FROM orders o
               WHERE o.o_custkey = e.user_id
                 AND o.o_orderdate = (SELECT max(o2.o_orderdate) FROM orders o2
                                      WHERE o2.o_custkey = e.user_id
                                        AND o2.o_orderdate <= e.ts)) AS asof_orderkey
       FROM events e
       ORDER BY e.event_id""") { (s, d) =>
    val events = Tables.events(s, d).select("event_id", "user_id", "ts")
    val orders = Tables.orders(s, d)
      .select("o_custkey", "o_orderdate", "o_orderkey")
    asOfJoin(events, orders,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "o_custkey", rightTime = "o_orderdate",
      rightValue = "o_orderkey")
      .select(col("event_id"), col("__k").as("user_id"),
        col("__asof").as("asof_orderkey"))
      .orderBy("event_id")
  }

  /** As-of join WITH TOLERANCE (pandas merge_asof semantics): the latest
    * right row at or before the left time — but only if it falls within
    * the tolerance window, else null. Same union-window composition, with
    * the matched TIME carried alongside the value in a struct so the
    * tolerance check is a post-window per-row predicate, not a second
    * join. */
  def asOfJoinTimed(
      left: DataFrame, right: DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String,
      rightValue: String): DataFrame = {
    val pairType = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("mt", left.schema(leftTime).dataType),
      org.apache.spark.sql.types.StructField("mv", right.schema(rightValue).dataType)))
    val l = left.withColumn("__is_left", lit(1))
      .withColumnRenamed(leftKey, "__k").withColumnRenamed(leftTime, "__t")
      .withColumn("__p", lit(null).cast(pairType))
    val r = right.select(
      col(rightKey).as("__k"), col(rightTime).cast(pairType("mt").dataType).as("__t"),
      struct(col(rightTime).cast(pairType("mt").dataType).as("mt"),
        col(rightValue).as("mv")).as("__p"),
      lit(0).as("__is_left"))
    val lCols = l.columns.filterNot(r.columns.contains).toSeq
    val unioned = l.select((r.columns.map(col) ++ lCols.map(col)).toIndexedSeq: _*)
      .unionByName(r.withColumns(
        lCols.map(c => c -> lit(null).cast(l.schema(c).dataType)).toMap))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__is_left").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__p")
  }

  /** Purchase-to-view attribution: each purchase picks up the same user's
    * most recent view within the preceding 2 hours (outside the window →
    * no attribution). The e-commerce attribution shape of merge_asof. */
  val qAsofTolerance: Q = Q(
    "q_asof_tolerance",
    """SELECT p.event_id, p.user_id,
              (SELECT max(v.event_id) FROM events v
               WHERE v.event_type = 'view' AND v.user_id = p.user_id
                 AND v.ts = (SELECT max(v2.ts) FROM events v2
                             WHERE v2.event_type = 'view'
                               AND v2.user_id = p.user_id
                               AND v2.ts <= p.ts
                               AND v2.ts >= p.ts - INTERVAL 2 HOUR)) AS attributed_view
       FROM events p WHERE p.event_type = 'purchase'
       ORDER BY p.event_id""") { (s, d) =>
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
    asOfJoinTimed(purchases, views,
      leftKey = "user_id", leftTime = "ts",
      rightKey = "v_user", rightTime = "v_ts", rightValue = "v_id")
      .select(col("event_id"), col("__k").as("user_id"),
        when(col("__m.mt") >= col("__t") - expr("INTERVAL 2 HOURS"),
          col("__m.mv")).as("attributed_view"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(qAsofJoin, qAsofTolerance)
}
