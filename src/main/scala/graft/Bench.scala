package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"queries":{…}}.
  *
  * Each query is forced through the `noop` DSv2 sink rather than `count()`:
  * count() lets Catalyst prune the whole projection (a parquet scan can
  * answer it from row-group metadata), which would benchmark nothing. The
  * noop sink executes the full physical plan and discards rows. One warmup
  * run (q1) amortizes JVM/codegen startup out of the per-query numbers.
  */
object Bench {

  /** (steal, idle, total) jiffies from the aggregate /proc/stat cpu line —
    * the contention self-annotation of VERDICT r8 #7: a pass measured
    * while the host steals 20% of its cycles is flagged by its own JSON
    * instead of costing a day of re-measurement. Returns zeros when
    * /proc/stat is unreadable (non-Linux), keeping the bench portable. */
  private def cpuJiffies(): (Long, Long, Long) =
    try {
      val line = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).getOrElse("")
      // cpu user nice system idle iowait irq softirq steal guest gnice
      val f = line.trim.split("\\s+").drop(1).map(_.toLong)
      val idle = if (f.length > 3) f(3) else 0L
      val steal = if (f.length > 7) f(7) else 0L
      (steal, idle, f.sum)
    } catch { case _: Exception => (0L, 0L, 0L) }

  /** Format one pass's /proc/stat delta as a JSON fragment: raw steal and
    * idle seconds (USER_HZ = 100) plus steal as a share of total cpu time
    * elapsed — > ~0.05 means the host was visibly contended this pass.
    * Locale.ROOT like the timing formatter (a comma decimal separator
    * would corrupt the JSON). */
  private def stealJson(before: (Long, Long, Long),
      after: (Long, Long, Long)): String = {
    val (s, i, t) = (after._1 - before._1, after._2 - before._2,
      after._3 - before._3)
    val share = if (t > 0) s.toDouble / t else 0.0
    String.format(java.util.Locale.ROOT,
      """{"steal_sec":%.1f,"idle_sec":%.1f,"steal_share":%.4f}""",
      Double.box(s / 100.0), Double.box(i / 100.0), Double.box(share))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.lake.GraftSqlExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      val t = (System.nanoTime() - t0) / 1e9
      // progress line per query (stderr, not the JSON result line): lets a
      // stalled run name its slow query instead of going dark for minutes
      System.err.println(f"[bench] $name%-28s $t%8.2fs")
      // between-queries block sweep (VERDICT r9 #1): the query's plan is
      // fully consumed by the noop write, so any localCheckpoint blocks a
      // pipeline pinned are dead weight — left alone they accumulate
      // across 2×147 queries into block-manager/GC pressure that inflated
      // later queries 4-18× on pass2. Single-threaded driver → safe.
      org.apache.spark.sql.graftbridge.CheckpointBridge.sweep(spark)
      t
    }

    run("q1_pricing_summary") // warmup: JVM + codegen + parquet footer cache
    // optional regex filter (SPARK_GRAFT_BENCH_FILTER) for targeted probes
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER").map(_.r)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.findFirstIn(n).isDefined))
    // Two full passes, report the per-query MIN: this host is shared and
    // ambient contention swings single measurements 5-10× (documented in
    // BASELINE.md); the minimum is the least-contended estimate of the
    // engine's own cost. SPARK_GRAFT_BENCH_RUNS=1 skips the second pass
    // for ten-minute-per-query probe scales (sf10), where a repeat costs
    // more wall-clock than the contention it would filter.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val steal0 = cpuJiffies()
    val pass1 = names.map(n => n -> run(n)).toMap
    val steal1 = cpuJiffies()
    val pass2 =
      if (runs < 2) Map.empty[String, Double]
      else names.map(n => n -> run(n)).toMap
    val steal2 = cpuJiffies()
    val results = names.map { n =>
      val t1 = pass1(n)
      val t2 = pass2.getOrElse(n, -1.0)
      n -> (if (t1 < 0) t2 else if (t2 < 0) t1 else math.min(t1, t2))
    }
    // 2-decimal seconds keep the whole line ≈3.3 KB at 124 queries: the
    // harness that records this output keeps only a ~4 KB tail, and
    // nanosecond-precision doubles pushed the r5 line past it (recorded
    // as unparseable).
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"agg":"min"}"""
    // the ~4 KB stdout tail clips ~40% of per-query timings at 138
    // queries (VERDICT r6 #7) — ALSO write the complete line (plus both
    // raw passes, for contention analysis) to a file the driver and the
    // round notes can pick up whole
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    def passJson(m: Map[String, Double]) = names
      .map(n => "\"" + n + "\":" + fmt(m.getOrElse(n, -1.0)))
      .mkString("{", ",", "}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath),
      s"""{"result":$line,"pass1":${passJson(pass1)},"pass2":${passJson(pass2)},""" +
        s""""cpu_pass1":${stealJson(steal0, steal1)},""" +
        s""""cpu_pass2":${stealJson(steal1, steal2)}}\n""")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(line)
    // LAST line is a compact summary that always fits the driver's ~4 KB
    // stdout tail (VERDICT r9 #5: the full per-query line outgrew it at
    // 147 queries → "parsed": null). The complete per-query map lives in
    // the full line above and in SPARK_GRAFT_BENCH_OUT.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"agg":"min","n_queries":${results.size},"queries_out":"$outPath"}""")
    spark.stop()
  }
}
