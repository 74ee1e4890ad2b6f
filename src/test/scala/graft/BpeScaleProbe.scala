package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BPE training at realistic merge counts (VERDICT r5 #7): trainBpe was
  * proven at k = 8/16; a real tokenizer needs hundreds of merges. Each
  * merge round is one vocab-histogram-sized Spark job whose driver state
  * is just the learned (a, b) pairs, so wall time should be ~LINEAR in k
  * with FLAT driver memory — this probe measures both at k = 32 and
  * k = 256 on the given corpus, plus the localCheckpoint residue (the
  * superseded per-round generations the ContextCleaner reclaims on GC).
  *
  *   Test/runMain graft.BpeScaleProbe /tmp/sf1
  *
  * Prints one JSON line; exits 2 if scaling is super-linear beyond slack
  * (sec(256)/sec(32) > 12 vs the ideal 8) — the loud check that merge
  * rounds stay O(vocab) each and don't replay lineage.
  */
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
    def run(k: Int): (Double, Int, Long) = {
      val t0 = System.nanoTime()
      val (merges, _) = TextOps.trainBpe(wordHist, k)
      ((System.nanoTime() - t0) / 1e9, merges.size, heapMb())
    }

    val h0 = heapMb()
    val (s32, m32, h32) = run(32)
    val (s256, m256, h256) = run(256)
    val residueMb = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / (1024 * 1024)
    val ratio = s256 / s32
    // flat driver memory: the k=256 run may keep GC-pinned block refs, but
    // the driver's own state is k pairs — anything beyond 512 MB growth
    // means the driver is accumulating per-round data it shouldn't
    val ok = m256 >= m32 && ratio <= 12.0 && (h256 - h0) < 512
    println(f"""{"probe":"bpe_scale","vocab":$vsize,"sec_k32":$s32%.1f,""" +
      f""""sec_k256":$s256%.1f,"ratio":$ratio%.2f,"merges_k32":$m32,""" +
      f""""merges_k256":$m256,"heap_mb":[$h0,$h32,$h256],""" +
      s""""checkpoint_residue_mb":$residueMb,"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
