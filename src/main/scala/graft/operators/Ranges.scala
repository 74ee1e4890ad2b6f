package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Range (interval) join — with as-of, the second canonical "operator
  * Spark lacks": match right rows whose timestamp falls in a window
  * anchored at each left row.
  *
  * Naive formulation is a per-key cross join with an inequality filter —
  * Catalyst plans it as BroadcastNestedLoop/cartesian, quadratic per key.
  * The scalable composition BUCKETS time into window-sized chunks: a right
  * row in (t, t+W] must live in the left row's bucket or the next one, so
  * the join becomes an EQUI-join on (key, bucket) with a 2× fan-out on
  * the left side, followed by the exact range filter. Shuffle is keyed by
  * (key, bucket): bounded fan-out, hash-partitioned, skew-splittable by
  * AQE — the standard chunked range-join of the time-series engines.
  */
object Ranges {

  /** For each left row: count of right rows with the same key and
    * rightTime ∈ (leftTime, leftTime + windowMicros]. */
  def rangeJoinCount(
      left: DataFrame, right: DataFrame,
      key: String, time: String,
      idCol: String, windowMicros: Long): DataFrame = {
    val bucket = (c: org.apache.spark.sql.Column) =>
      floor(unix_micros(c) / windowMicros)
    val l = left.select(col(idCol).as("__lid"), col(key).as("__k"),
        col(time).as("__lt"),
        explode(array(bucket(col(time)), bucket(col(time)) + 1)).as("__bkt"))
    val r = right.select(col(key).as("__rk"), col(time).as("__rt"),
      bucket(col(time)).as("__rbkt"))
    val matched = l.join(r,
        col("__k") === col("__rk") && col("__bkt") === col("__rbkt") &&
        col("__rt") > col("__lt") &&
        unix_micros(col("__rt")) <= unix_micros(col("__lt")) + windowMicros)
      .groupBy("__lid").agg(count(lit(1)).as("__n"))
    left.select(col(idCol).as("__lid"))
      .join(matched, Seq("__lid"), "left")
      .select(col("__lid").as(idCol),
        coalesce(col("__n"), lit(0L)).as("n_in_window"))
  }

  /** Events followed by other events of the same user within 24 hours —
    * the temporal-neighborhood count of a sessionization/abuse pipeline. */
  val qRangeJoin: Q = Q(
    "q_range_join",
    """SELECT a.event_id, count(b.event_id) AS n_in_window
       FROM events a LEFT JOIN events b
         ON a.user_id = b.user_id
        AND b.ts > a.ts
        AND b.ts <= a.ts + INTERVAL 24 HOUR
       GROUP BY a.event_id
       ORDER BY a.event_id""") { (s, d) =>
    val ev = Tables.events(s, d)
    rangeJoinCount(ev, ev, key = "user_id", time = "ts",
      idCol = "event_id", windowMicros = 24L * 3600 * 1000000)
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(qRangeJoin)
}
