package graft

import java.nio.file.Paths

import org.apache.spark.sql.SparkSession

import graft.lake._

/** Worker JVM for [[ChaosGate]]: a mixed append / upsert / compact session
  * against ONE object-store-semantics lake table shared with sibling
  * worker processes (each JVM gets its own ObjectStoreMetaIO; the kernel
  * hard-link in createExclusive is the cross-process conditional-PUT
  * arbiter). Rows come from the REAL sf corpus (lineitem slices), not toy
  * literals — each acknowledged batch is reported on stdout as
  * `ACK <wid> <batch> <rows>` ONLY after the commit call returned, so the
  * gate can assert zero acknowledged-then-lost commits even when this JVM
  * is later SIGKILLed mid-flight.
  */
object XProcChaosWorker {

  private def retrying[T](what: String, attempts: Int = 60)(op: => T): T = {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return op
      catch {
        case e: Throwable if msgs(e).exists(m =>
            m.contains("concurrent commit") || m.contains("lost") ||
              m.contains("concurrent insert")) =>
          last = e; i += 1
      }
    }
    throw new IllegalStateException(s"$what never committed in $attempts attempts", last)
  }

  def main(args: Array[String]): Unit = {
    val Array(wh, widS, sfDir, batchesS) = args
    val wid = widS.toInt
    val batches = batchesS.toInt
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.og", classOf[ObjectStoreCatalog].getName)
      .config("spark.sql.catalog.og.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code =
      try { run(spark, wh, wid, sfDir, batches); println(s"WORKER $wid OK"); 0 }
      catch { case t: Throwable => t.printStackTrace(); 1 }
      finally { try spark.stop() catch { case _: Throwable => () } }
    sys.exit(code)
  }

  def run(spark: SparkSession, wh: String, wid: Int, sfDir: String,
      batches: Int): Unit = {
    val store = new SnapshotStore(Paths.get(wh, "d", "ct"),
      io = ObjectStoreTestBackend.io)
    // real corpus rows, sliced into disjoint per-(worker, batch) id bands:
    // id = l_orderkey * 10 + l_linenumber is unique per lineitem row
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey * 10 + l_linenumber AS id",
        "l_returnflag AS w", "CAST(l_quantity AS INT) AS v")
      .createOrReplaceTempView("src")
    (0 until batches).foreach { b =>
      val band = wid * batches + b // disjoint across workers
      val rows = retrying(s"append w$wid b$b") {
        spark.sql(
          s"""INSERT INTO og.d.ct
              SELECT id, w, $band AS v FROM src
              WHERE id % 64 = $band AND id % 3 = 0""")
        spark.sql(s"SELECT count(*) FROM og.d.ct WHERE v = $band")
          .collect().head.getLong(0)
      }
      // ACK only after the commit returned: the zero-lost-commit contract
      println(s"ACK $wid $band $rows")
      Console.flush()
      // upsert: rewrite a slice of this worker's own band via the O(batch)
      // equality-delete path (the contended two-table commit shape)
      retrying(s"upsert w$wid b$b") {
        Upsert.into(spark, store,
          spark.sql(s"SELECT id, w, ${band + 10000} AS v FROM src " +
            s"WHERE id % 64 = $band AND id % 6 = 0"),
          Seq("id"))
      }
      println(s"UPS $wid $band")
      Console.flush()
      // worker 2 doubles as the maintenance process
      if (wid == 2 && b % 2 == 1) retrying(s"compact w$wid b$b") {
        Maintenance.compact(spark, store)
      }
    }
  }
}
