package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BPE training at real tokenizer merge counts (VERDICT r8 #4): the r8
  * trainer ran one vocab-sized Spark job per merge — k = 32768 merges
  * meant 32768 jobs, a driver-loop scale wall. The r9 trainer collects
  * the vocab histogram once and trains the full merge table driver-side
  * with incremental pair-count maintenance, so this probe measures
  * k = 1024 wall-clock directly (seconds, not hours) and pins
  *
  *  - PREFIX CONSISTENCY: the k = 32 merge sequence IS the first 32
  *    merges of the k = 1024 run (greedy BPE is prefix-stable; any
  *    bookkeeping bug in the incremental counts shows up here);
  *  - merge-count monotonicity and a generous absolute wall ceiling
  *    (120 s — the measured value is ~seconds; the ceiling only trips on
  *    a true complexity regression, not host contention);
  *  - flat driver heap beyond the collected histogram (< 512 MB growth).
  *
  *   Test/runMain graft.BpeScaleProbe /tmp/sf1
  *
  * Prints one JSON line; exits 2 on violation. */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val wordHist = Tables.documents(spark, dir)
      .select(explode(TextOps.tokens(lower(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val vsize = wordHist.count()

    def heapMb(): Long = {
      System.gc()
      val rt = Runtime.getRuntime
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    }
    def run(k: Int): (Double, Seq[(String, String)], Long) = {
      val t0 = System.nanoTime()
      val (merges, _) = TextOps.trainBpe(wordHist, k)
      ((System.nanoTime() - t0) / 1e9, merges, heapMb())
    }

    val h0 = heapMb()
    val (s32, m32, h32) = run(32)
    val (s1024, m1024, h1024) = run(1024)
    val prefixOk = m1024.take(m32.size) == m32

    // the fixture corpus's vocabulary is tiny (it EXHAUSTS well under
    // 1024 merges — itself a pinned behavior: training stops cleanly),
    // so the 1024-real-merges claim trains on a synthetic 50k-word
    // syllable-structured Zipf histogram — deterministic, no RNG, with
    // enough shared substructure that 1024 merges genuinely exist
    val syl = Array("ka", "to", "ri", "na", "se", "mu", "lo", "vi",
      "ta", "be", "du", "go", "pi", "ze", "fa", "ne")
    import spark.implicits._
    val synth = (0 until 50000).map { i =>
      val len = 2 + (i % 4)
      val w = (0 until len).map(d => syl((i >> (4 * d)) & 15)).mkString
      (w + java.lang.Integer.toString(i % 97, 36), 1L + 1000000L / (i + 1))
    }.toDF("tok", "c").groupBy("tok").agg(sum("c").as("c"))
      .localCheckpoint()
    val synthSize = synth.count()
    val t0 = System.nanoTime()
    val (mSynth, _) = TextOps.trainBpe(synth, 1024)
    val sSynth = (System.nanoTime() - t0) / 1e9
    val hSynth = heapMb()

    val ok = prefixOk && m1024.size >= m32.size &&
      mSynth.size == 1024 && sSynth <= 120.0 &&
      (h1024 - h0) < 512 && (hSynth - h0) < 512
    println(f"""{"probe":"bpe_scale","vocab":$vsize,"sec_k32":$s32%.1f,""" +
      f""""sec_k1024":$s1024%.1f,"merges_k32":${m32.size},""" +
      f""""merges_k1024":${m1024.size},"prefix_consistent":$prefixOk,""" +
      f""""synth_vocab":$synthSize,"synth_merges":${mSynth.size},""" +
      f""""synth_sec_k1024":$sSynth%.1f,""" +
      f""""heap_mb":[$h0,$h32,$h1024,$hSynth],"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
