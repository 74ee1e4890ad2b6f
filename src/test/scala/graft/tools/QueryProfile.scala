package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Profile declared queries: wall seconds, Spark job count, stage count,
  * total task time, shuffle bytes, and per-job descriptions — the
  * where-does-the-time-go attribution the bench's one number hides.
  *
  * Usage: QueryProfile <queryRegex> [runs]
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32).
  */
object QueryProfile {
  final class Acc extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var gcTimeMs = 0L
    var shuffleReadB = 0L
    var shuffleWriteB = 0L
    val jobWall = mutable.ArrayBuffer.empty[(Int, Long)]
    val groupWall = mutable.Map.empty[String, (Int, Long)]
    private val jobStart = mutable.Map.empty[Int, (Long, String)]
    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobs += 1
      val desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .getOrElse("")
      jobStart(j.jobId) = (j.time, desc)
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(j.jobId).foreach { case (t0, desc) =>
        jobWall += ((j.jobId, j.time - t0))
        val (n, t) = groupWall.getOrElse(desc, (0, 0L))
        groupWall(desc) = (n + 1, t + (j.time - t0))
      }
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
      synchronized { stages += 1 }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcTimeMs += m.jvmGCTime
        shuffleReadB += m.shuffleReadMetrics.totalBytesRead
        shuffleWriteB += m.shuffleWriteMetrics.bytesWritten
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val filter = args(0).r
    val runs = args.lift(1).map(_.toInt).getOrElse(2)
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
    // warmup, as Bench
    graft.SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => filter.findFirstIn(n).isDefined)
    names.foreach { n =>
      (1 to runs).foreach { r =>
        val acc = new Acc
        spark.sparkContext.addSparkListener(acc)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain listener-bus events before reading the counters
        Thread.sleep(300)
        spark.sparkContext.removeSparkListener(acc)
        org.apache.spark.sql.graftbridge.CheckpointBridge.sweep(spark)
        println(f"$n%-32s run$r wall=$wall%7.2fs jobs=${acc.jobs}%4d " +
          f"stages=${acc.stages}%4d tasks=${acc.tasks}%6d " +
          f"taskTime=${acc.taskTimeMs / 1000.0}%8.1fs gc=${acc.gcTimeMs / 1000.0}%6.1fs " +
          f"shufR=${acc.shuffleReadB / 1e6}%8.1fMB shufW=${acc.shuffleWriteB / 1e6}%8.1fMB")
        val slow = acc.jobWall.sortBy(-_._2).take(8)
        println("  slowest jobs (id,ms): " + slow.map { case (id, ms) =>
          s"$id:$ms" }.mkString(" "))
        acc.groupWall.toSeq.sortBy(-_._2._2).take(14).foreach {
          case (desc, (cnt, ms)) =>
            println(f"    [$ms%6dms jobs=$cnt%3d] ${desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
