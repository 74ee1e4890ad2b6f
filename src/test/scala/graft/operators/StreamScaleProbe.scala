package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** One-off scale attribution for the streaming tier (r8 sf10 sweep:
  * q_stream_session 61×, q_stream_dedup 12× for 10× data): splits each
  * query's wall time into the STATEFUL OPERATOR (stream to a noop sink)
  * vs the memory-sink collection the oracle harness needs (driver-side
  * by definition — a test construct, not the production path). Also A/Bs
  * the RocksDB state store provider against the default in-heap one.
  *
  * Usage: StreamScaleProbe <sfDir> [rocksdb]
  */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val rocks = args.length > 1 && args(1) == "rocksdb"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (rocks) b.config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    import graft.streaming.Streams
    timed(s"session noop rocks=$rocks") {
      val q = Streams.sessionWindows(Streams.eventsStream(spark, sfDir))
        .writeStream.format("noop").trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("probe-ckpt").toString)
        .start()
      q.awaitTermination(); q.stop()
    }
    timed(s"session memory rocks=$rocks") {
      Streams.runToMemory(spark,
        Streams.sessionWindows(Streams.eventsStream(spark, sfDir)),
        s"probe_sess_${System.nanoTime()}")
    }
    timed(s"dedup noop rocks=$rocks") {
      val doubled = Streams.eventsStream(spark, sfDir)
        .union(Streams.eventsStream(spark, sfDir))
      val q = doubled.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark("event_id")
        .writeStream.format("noop").outputMode("append")
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("probe-ckpt").toString)
        .start()
      q.awaitTermination(); q.stop()
    }
    spark.stop()
  }
}
