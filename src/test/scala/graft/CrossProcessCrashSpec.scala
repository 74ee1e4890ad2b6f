package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** A REAL kill -9 against a live writer process, mid-commit-loop: the
  * surviving table must stay readable with a gap-free chain of fully-
  * parseable snapshots and atomic batches (each commit all-or-nothing),
  * the age-guarded orphan sweep must collect only the dead writer's
  * leftovers, and a new writer must continue the chain. In-process crash
  * simulation (CrashRecoverySpec) plants junk by hand; this spec lets the
  * kernel tear a real JVM at an arbitrary instruction boundary, which is
  * the failure a 1000-executor deployment actually sees (preempted
  * driver, OOM-killed pod). */
class CrossProcessCrashSpec extends AnyFunSuite {

  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("kill -9 mid-commit leaves a consistent, recoverable table") {
    val wh = Files.createTempDirectory("graft-xcrash-wh").toString
    val spark = SparkSpec.session
    spark.conf.set("spark.sql.catalog.xcrash", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.xcrash.warehouse", wh)
    def sql(q: String) = spark.sql(q)
    sql("CREATE NAMESPACE IF NOT EXISTS xcrash.d")
    sql("CREATE TABLE xcrash.d.ct (id INT, w STRING, v INT) USING iceberg")

    val javaBin = Paths.get(sys.props("java.home"), "bin", "java").toString
    val cp = sys.props("java.class.path")
    assert(cp.contains(File.pathSeparator),
      "test JVM must be forked with a real -cp for worker launch")
    val out = Files.createTempFile("graft-xcrash", ".log")
    val cmd = Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      "-Xmx2g", "-cp", cp, "graft.XProcCrashWorker", wh)
    val p = new ProcessBuilder(cmd: _*)
      .redirectErrorStream(true)
      .redirectOutput(out.toFile)
      .start()

    val store = new SnapshotStore(Paths.get(wh, "d", "ct"))
    try {
      // let it commit a few batches, then tear the JVM down mid-loop —
      // the extra uniform delay spreads the kill across the commit path
      val deadline = System.currentTimeMillis() + 120000
      while (store.listVersions().size < 4 &&
          System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(store.listVersions().size >= 4,
        s"worker never committed:\n${Files.readString(out)}")
      Thread.sleep(scala.util.Random.nextInt(300).toLong)
    } finally {
      p.destroyForcibly() // SIGKILL on Linux
      p.waitFor()
    }

    // 1. every surviving version parses and the chain is gap-free — a
    // torn commit must be invisible, not half-visible
    val versions = store.listVersions()
    assert(versions == (1L to versions.max), s"chain has gaps: $versions")
    val snaps = versions.map(store.read)
    snaps.filter(_.version > 1).foreach(s =>
      assert(s.parentVersion.contains(s.version - 1),
        s"v${s.version} chains to ${s.parentVersion}"))

    // 2. batch atomicity: whatever batches are visible are COMPLETE
    val rows = sql("SELECT id, v FROM xcrash.d.ct").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val byBatch = rows.groupBy(_._2)
    byBatch.foreach { case (b, rs) =>
      assert(rs.map(_._1).sorted.toSeq == (b * 100 until b * 100 + 5).toSeq,
        s"batch $b is torn: ${rs.map(_._1).sorted.toSeq}")
    }
    val count0 = rows.length

    // 3. the age-guarded sweep collects the dead writer's leftovers once
    // they age past the guard, and touches nothing the head references
    Thread.sleep(1200)
    Maintenance.removeOrphanFiles(store, staleStagingMillis = 1000)
    val head = store.head().get
    (head.files.map(_.path) ++ head.deleteFiles.map(_.path)).foreach(f =>
      assert(Files.exists(store.tableDir.resolve(f)),
        s"sweep collected a live file: $f"))
    assert(sql("SELECT count(*) FROM xcrash.d.ct").collect().head.getLong(0)
      == count0.toLong, "reads changed after the sweep")
    // no staging leftovers survive the sweep
    val stagingStream = Files.list(store.tableDir)
    try {
      val staging = stagingStream.iterator()
      while (staging.hasNext) {
        val d = staging.next()
        assert(!d.getFileName.toString.startsWith(".staging-"),
          s"dead writer's staging dir survived: $d")
      }
    } finally stagingStream.close()

    // 4. a new writer continues the chain normally
    sql("INSERT INTO xcrash.d.ct VALUES (999999, 'after', -1)")
    assert(sql("SELECT count(*) FROM xcrash.d.ct").collect().head.getLong(0)
      == count0 + 1L)
    val after = store.listVersions()
    assert(after == (1L to after.max), s"chain broken after recovery: $after")
  }
}
