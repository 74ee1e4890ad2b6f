package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lake.SnapshotStore
import graft.streaming.Streams
import graft.streaming.Streams.{Evt, Session}

/** Streaming semantics tests (SURVEY.md §2.8, §5.2.2): MemoryStream-driven
  * sessionization, batch/stream parity of the windowed agg, and streaming
  * appends into a Graft lake table (one snapshot per micro-batch). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def micros(minute: Int): Long = minute * 60L * 1000000L

  test("sessionization splits on gap and accumulates within gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Evt]
    val sessions = Streams.sessionize(input.toDS(), gapMinutes = 30)
    val ck = Files.createTempDirectory("ck-sess").toString
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", ck).start()
    // batch 1: two events 10min apart (same session)
    input.addData(Evt(1, micros(0), 1.0), Evt(1, micros(10), 2.0))
    q.processAllAvailable()
    // batch 2: event 60min later → closes session 1, opens session 2
    input.addData(Evt(1, micros(70), 5.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Session].collect()
    q.stop()
    assert(closed.length == 1)
    assert(closed.head.n_events == 2)
    assert(closed.head.total_value == 3.0)
    assert(closed.head.end_micros == micros(10))
  }

  test("windowed aggregation: stream result equals batch result") {
    val streamed = StreamingOpsAccess.runWindow(spark, sf)
    val batch = Tables.events(spark, sf)
      .groupBy(col("ts").cast("date").as("day"), hour(col("ts")).as("hr"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("streaming appends into a lake table create one snapshot per batch") {
    val dir = Files.createTempDirectory("graft-stream-lake")
    val store = new SnapshotStore(dir.resolve("t"))
    store.init()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    store.commit(_ => graft.lake.Snapshot(1, None, 1L, "create",
      schema.json, Nil, Map.empty, Nil, Map.empty))

    implicit val sqlCtx = spark.sqlContext
    val ck = Files.createTempDirectory("graft-ck-lake").toString
    val input = MemoryStream[(Long, Double)]
    input.addData((1L, 1.0), (2L, 2.0))
    val stream = input.toDF().toDF("user_id", "value")
    Streams.streamIntoLakeTable(spark, stream, store, ck)
    assert(store.head().get.totalRows == 2)
    assert(store.head().get.operation == "append")
    // second batch, SAME checkpoint → resumes, appends only the new data
    input.addData((3L, 3.0))
    Streams.streamIntoLakeTable(spark, stream, store, ck)
    assert(store.head().get.totalRows == 3)
    assert(store.listVersions().size >= 3)
  }
}

/** Small accessor so the spec reuses the exact driver-facing query. */
object StreamingOpsAccess {
  def runWindow(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.operators.StreamingOps.qStreamWindow.fn(s, d)
}
