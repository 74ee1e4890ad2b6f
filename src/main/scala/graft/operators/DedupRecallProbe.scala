package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** MinHash/LSH recall + candidate-volume gate on the ADVERSARIAL corpus
  * (VERDICT r5 #5): tools/make_sf1.py builds the second half of its
  * document replicas as 1-4%-token-mutated variants, so the near-dup
  * pairs are PERTURBED, not verbatim — exactly the pairs the exact-dup
  * pre-collapse cannot eat and the banded LSH join must catch.
  *
  * Ground truth is free by construction: every variant of base document b
  * has doc_id ≡ b (mod 1e9), so the truth set is all same-base pairs
  * whose EXACT shingle Jaccard ≥ 0.8 — at J ≥ 0.8 the 8-band × 4-row LSH
  * construction catches a pair with p = 1-(1-J⁴)⁸ ≥ 0.985, so recall ≥
  * 0.9 is a sound standing pin, not fixture luck.
  *
  * Also pins candidate VOLUME: candidates ≤ 20 × rep docs. A quadratic
  * candidate blowup (the failure mode banding exists to prevent) trips
  * this long before it trips a wall-clock budget.
  *
  * Prints one JSON line; exits 2 if a pin fails. Run by tools/sf1_gate.sh:
  *   java -cp target/scala-2.13/classes:... graft.operators.DedupRecallProbe /tmp/sf1
  */
object DedupRecallProbe {

  private val Stride = 1000000000L // make_sf1.py replica key stride

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

    val docs = graft.Tables.documents(spark, dir)
    // the pipeline's own candidate stage (post exact-dup pre-collapse)
    val members = Dedup.dupClasses(docs)
    val repDocs = Dedup.repDocsOf(docs, members)
    val sigs = Dedup.minhashSignatures(repDocs).localCheckpoint()
    val nReps = sigs.count()
    val nCands = Dedup.lshCandidates(sigs).count()

    // ground truth: same-base pairs at exact Jaccard >= 0.8
    val base = docs.select(col("doc_id"), (col("doc_id") % Stride).as("b"))
    val truthPairs = base.as("a")
      .join(base.as("b"),
        col("a.b") === col("b.b") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val truth = Dedup.exactJaccard(docs, truthPairs)
      .filter(col("jaccard") >= 0.8)
      .select("id_a", "id_b")
      .localCheckpoint()
    val nTruth = truth.count()

    // the full pipeline's detected pairs (drop the count summary row)
    val detected = Dedup.qMinhashDedup.fn(spark, dir)
      .filter(col("id_a") =!= -1L)
      .select("id_a", "id_b")
    val nHit = truth.join(detected, Seq("id_a", "id_b"), "left_semi").count()
    val recall = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth

    val candPerRep = if (nReps == 0) 0.0 else nCands.toDouble / nReps
    val ok = recall >= 0.9 && candPerRep <= 20.0
    println(s"""{"probe":"minhash_adversarial","reps":$nReps,""" +
      s""""candidates":$nCands,"cand_per_rep":$candPerRep,""" +
      s""""truth_pairs":$nTruth,"detected_truth":$nHit,"recall":$recall,""" +
      s""""pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
