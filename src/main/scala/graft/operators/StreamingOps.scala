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
              event_type, count(*) AS n, CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_value
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

  /** Gap-based session windows (30 min), streamed, vs a batch
    * gaps-and-islands oracle: a session break is a >= 30 min silence per
    * user (Spark session windows are end-exclusive, hence >=). */
  val qStreamSession: Q = Q(
    "q_stream_session",
    """WITH m AS (
         SELECT user_id, ts, value,
                CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS new_sess
         FROM events),
       g AS (
         SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS sid
         FROM m)
       SELECT user_id,
              epoch_us(min(ts)) AS sess_start_us,
              epoch_us(max(ts)) + 1800000000 AS sess_end_us,
              CAST(count(*) AS BIGINT) AS n,
              CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_value
       FROM g GROUP BY user_id, sid
       ORDER BY user_id, sess_start_us""") { (s, d) =>
    val result = Streams.runToMemory(
      s, Streams.sessionWindows(Streams.eventsStream(s, d)),
      s"sess_${System.nanoTime()}")
    result.orderBy("user_id", "sess_start_us")
  }

  /** Streaming dedup at ingest: the same events directory is attached as
    * TWO file sources and unioned — every event arrives twice — then
    * dropDuplicatesWithinWatermark(event_id) must emit each exactly once.
    * State is bounded by the watermark (an id is forgettable once no
    * duplicate can still arrive), unlike unbounded dropDuplicates — the
    * property that makes streaming dedup viable at 100 TB/day ingest.
    * Oracle: the events table itself, each row once. */
  val qStreamDedup: Q = Q(
    "q_stream_dedup",
    """SELECT event_id, event_type, round(value, 2) AS v
       FROM events ORDER BY event_id""") { (s, d) =>
    val doubled = Streams.eventsStream(s, d).union(Streams.eventsStream(s, d))
    val deduped = doubled
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val result = Streams.runToMemory(s,
      deduped.select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("v")),
      s"dedup_${System.nanoTime()}", mode = "append")
    result.orderBy("event_id")
  }

  /** Stream-static join: the events stream enriched per micro-batch with
    * the (broadcast) customer dimension, then hourly counts per market
    * segment. Oracle = the equivalent batch join+agg. */
  val qStreamEnrich: Q = Q(
    "q_stream_enrich",
    """SELECT CAST(ts AS DATE) AS day,
              CAST(extract(hour FROM ts) AS INTEGER) AS hr,
              c_mktsegment AS segment, count(*) AS n,
              CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_value
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY 1, 2, 3
       ORDER BY day, hr, segment""") { (s, d) =>
    val dim = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    val result = Streams.runToMemory(
      s, Streams.enrichedSegmentCounts(Streams.eventsStream(s, d), dim),
      s"enrich_${System.nanoTime()}")
    result.orderBy("day", "hr", "segment")
  }

  /** Stream-stream interval join: views matched to the same user's
    * purchases within 6 hours, both sides watermarked so join state is
    * evictable. Oracle = the equivalent batch interval join. */
  val qStreamJoin: Q = Q(
    "q_stream_join",
    """SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
       FROM events v JOIN events p
         ON v.user_id = p.user_id
        AND v.event_type = 'view' AND p.event_type = 'purchase'
        AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 6 HOUR
       ORDER BY view_id, purchase_id""") { (s, d) =>
    val result = Streams.runToMemory(
      s, Streams.viewToPurchase(Streams.eventsStream(s, d)),
      s"ssj_${System.nanoTime()}", mode = "append")
    result.orderBy("view_id", "purchase_id")
  }

  val all: Seq[Q] = Seq(qStreamWindow, qStreamSliding, qStreamSession,
    qStreamDedup, qStreamEnrich, qStreamJoin)
}
