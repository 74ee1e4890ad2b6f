package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (plans/rNN/<query>_<tag>.txt).
  *
  * Usage: DumpPlans <outDir> <tag> [queryRegex]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  *
  * Only the logical→physical plan is compiled (no execution), so queries
  * with imperative drivers (ingest pipelines, multi-action queries) run
  * their side effects as part of plan construction; that is the same
  * contract the bench has.
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val filter = args.lift(2).map(_.r)
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
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.forall(_.findFirstIn(n).isDefined))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"${n}_$tag.txt"), txt)
        System.err.println(s"[plans] $n ok (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
