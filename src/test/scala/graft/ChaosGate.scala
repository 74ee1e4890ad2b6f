package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.lake._

/** Cross-process chaos at bench scale (VERDICT r5 #8): three REAL worker
  * JVMs run mixed append / upsert / compact sessions against ONE
  * object-store-semantics table (ObjectStoreCatalog — conditional-PUT
  * commits, copy+delete publish, no directories) using real sf-corpus
  * rows; the gate SIGKILLs one worker mid-flight, then asserts the
  * ObjectStoreChaosSpec invariants at this larger scale:
  *
  *   1. version chain gap-free, every snapshot parses, parents correct;
  *   2. ZERO lost commits: every batch a worker ACKed on stdout before
  *      dying is fully present (append count preserved through upserts);
  *   3. atomicity: the killed worker's un-ACKed work is all-or-nothing
  *      (no torn batch: a band is either complete or absent);
  *   4. the table keeps serving reads and accepts a new commit after an
  *      orphan sweep.
  *
  * Prints one JSON line; exits 2 on violation. Run by tools/sf1_gate.sh:
  *   java -cp classes:test-classes:... graft.ChaosGate /tmp/sf1
  */
object ChaosGate {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private val Batches = 6 // per worker; 3 workers * 6 bands <= 64 mod space

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val wh = Files.createTempDirectory("graft-chaosgate-wh").toString
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.catalog.og", classOf[ObjectStoreCatalog].getName)
      .config("spark.sql.catalog.og.warehouse", wh)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sql(q: String) = spark.sql(q)
    sql("CREATE NAMESPACE og.d")
    sql("CREATE TABLE og.d.ct (id BIGINT, w STRING, v INT) USING iceberg")

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    require(cp.contains(File.pathSeparator), "need a real -cp (forked JVM)")
    val logs = (0 until 3).map(_ => Files.createTempFile("graft-chaos", ".log"))
    val procs = (0 until 3).map { wid =>
      val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
        "-Xmx4g", "-Dspark.ui.enabled=false", "-cp", cp,
        "graft.XProcChaosWorker", wh, wid.toString, sfDir, Batches.toString)
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(logs(wid).toFile)
        .start()
    }

    val store = new SnapshotStore(Paths.get(wh, "d", "ct"),
      io = ObjectStoreTestBackend.io)
    // let the cluster make real progress, then SIGKILL worker 0 mid-loop
    val deadline = System.currentTimeMillis() + 300000
    while (store.listVersions().size < 8 &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
    Thread.sleep(scala.util.Random.nextInt(2000).toLong)
    procs(0).destroyForcibly()
    procs(0).waitFor()
    val survivorsOk = procs.drop(1).map(_.waitFor()).forall(_ == 0)

    // ACKed batches: band -> appended row count (v=band at append time)
    val acked = logs.flatMap(l => Files.readAllLines(l).toArray.toSeq)
      .map(_.toString).filter(_.startsWith("ACK "))
      .map { line =>
        val Array(_, _, band, rows) = line.trim.split(" ")
        band.toInt -> rows.toLong
      }.toMap

    // invariant 1: gap-free parseable chain
    val versions = store.listVersions()
    val chainOk = versions == (1L to versions.max) &&
      versions.filter(_ > 1).forall(v =>
        store.read(v).parentVersion.contains(v - 1))

    // invariants 2+3: per-band accounting. For an ACKed band the append
    // count must be exactly preserved (upserts update in place: v=band or
    // v=band+10000). For any band, partial presence = torn commit.
    val perBand = sql(
      """SELECT CASE WHEN v >= 10000 THEN v - 10000 ELSE v END AS band,
                count(*) AS n
         FROM og.d.ct GROUP BY 1""").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val expected = expectedBandCounts(spark, sfDir)
    val lost = acked.filter { case (band, n) =>
      perBand.getOrElse(band, 0L) != n || expected.get(band).exists(_ != n)
    }
    val torn = perBand.filter { case (band, n) =>
      expected.get(band).exists(_ != n)
    }

    // invariant 4: sweep + new commit
    Thread.sleep(1200)
    Maintenance.removeOrphanFiles(store, staleStagingMillis = 1000)
    sql("INSERT INTO og.d.ct VALUES (99999999999, 'zz', -1)")
    val after = store.listVersions()
    val recoverOk = after == (1L to after.max)

    val ok = survivorsOk && chainOk && lost.isEmpty && torn.isEmpty && recoverOk
    println(s"""{"probe":"chaos","versions":${versions.max},""" +
      s""""acked_batches":${acked.size},"lost":${lost.size},""" +
      s""""torn":${torn.size},"survivors_ok":$survivorsOk,""" +
      s""""chain_ok":$chainOk,"recover_ok":$recoverOk,"pass":$ok}""")
    if (!ok) {
      (0 until 3).foreach(w =>
        System.err.println(s"--- worker $w log ---\n${Files.readString(logs(w))}"))
    }
    spark.stop()
    if (!ok) sys.exit(2)
  }

  /** What a COMPLETE band must contain: the worker's append predicate
    * recomputed here, independent of any lake state. */
  private def expectedBandCounts(spark: SparkSession, sfDir: String)
      : Map[Int, Long] = {
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey * 10 + l_linenumber AS id")
      .selectExpr("CAST(id % 64 AS INT) AS band")
      .where("id % 3 = 0")
      .groupBy("band").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
  }
}
