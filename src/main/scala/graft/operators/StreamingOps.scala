package graft.operators

import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.{Q, Tables}

/** Streaming queries for the driver gate: each runs a real Structured
  * Streaming query (file source → watermark → windowed agg → memory sink)
  * to completion with Trigger.AvailableNow, then returns the sink table.
  * The oracle is the equivalent BATCH SQL over the same events — Spark's
  * unified-semantics claim, checked. */
object StreamingOps {

  /** Tumbling 1h windowed counts, streamed, vs batch oracle. */
  val qStreamWindow: Q = Q(
    "q_stream_window",
    """SELECT CAST(ts AS DATE) AS day,
              CAST(extract(hour FROM ts) AS INTEGER) AS hr,
              event_type, count(*) AS n, round(sum(value), 2) AS total_value
       FROM events
       GROUP BY 1, 2, 3
       ORDER BY day, hr, event_type""") { (s, d) =>
    val result = Streams.runToMemory(
      s, Streams.windowedCounts(Streams.eventsStream(s, d)),
      s"win_${System.nanoTime()}")
    result.orderBy("day", "hr", "event_type")
  }

  /** Sliding-window rates (1h / 30m), streamed, vs batch oracle computed as
    * the union of the two half-hour-aligned window families. */
  val qStreamSliding: Q = Q(
    "q_stream_sliding",
    """WITH w AS (
         SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP) AS slide_start
         FROM events)
       , fams AS (
         SELECT slide_start AS win_start FROM w
         UNION ALL
         SELECT slide_start - INTERVAL 30 MINUTE AS win_start FROM w)
       SELECT win_start, count(*) AS n
       FROM fams
       GROUP BY win_start
       ORDER BY win_start""") { (s, d) =>
    val result = Streams.runToMemory(
      s, Streams.slidingRates(Streams.eventsStream(s, d)),
      s"slide_${System.nanoTime()}")
    result.orderBy("win_start")
  }

  val all: Seq[Q] = Seq(qStreamWindow, qStreamSliding)
}
