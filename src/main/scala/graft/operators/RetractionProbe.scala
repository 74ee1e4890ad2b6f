package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Standing sf1-gate probe for FRAME-SIZED retraction (VERDICT r8 #3):
  * build a 2M-doc corpus + 16M-row band index by direct appends (the
  * retraction path under test is table-content-agnostic — synthesizing
  * rows instead of MinHash-ingesting them keeps the probe about the
  * DELETE, not the ingest), retract a MILLION-key manifest through
  * `Ingest.retractBatch(keys: DataFrame)`, and assert
  *
  *  - the accounting: exactly 1M corpus docs and 8M band rows removed;
  *  - the commit shape: ONE equality-delete commit per table (O(keys),
  *    no data-file rewrite — `added-delete-files` = 1, kind equality);
  *  - post-state: reads see the surviving 1M docs; an idempotent rerun
  *    reports 0/0 and commits NOTHING;
  *  - wall seconds for the retraction (reported, not asserted — the
  *    structural pins above are the scale argument).
  *
  * Prints ONE JSON line; exit 2 on violation. */
object RetractionProbe {

  private val Cat = "retractprobecat"
  private val Docs = 2000000L

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    spark.conf.set(s"spark.sql.catalog.$Cat",
      classOf[graft.lake.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
      java.nio.file.Files.createTempDirectory("graft-wh-retract").toString)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.p")
    val (c, b) = (s"$Cat.p.corpus", s"$Cat.p.bands")
    spark.sql(s"CREATE TABLE $c (doc_id BIGINT, text STRING) USING graft")
    spark.sql(
      s"CREATE TABLE $b (band_idx INT, band_hash BIGINT, doc_id BIGINT) USING graft")

    spark.range(Docs).select(col("id").as("doc_id"),
        concat(lit("synthetic document "), col("id")).as("text"))
      .writeTo(c).append()
    spark.range(Docs).select(col("id").as("doc_id"),
        explode(sequence(lit(0), lit(7))).as("band_idx"))
      .select(col("band_idx").cast("int"),
        xxhash64(col("doc_id"), col("band_idx")).as("band_hash"),
        col("doc_id"))
      .writeTo(b).append()

    // million-key manifest: every even doc_id
    val keys = spark.range(Docs).select((col("id") * 2).as("doc_id"))
      .filter(col("doc_id") < Docs)
    val t0 = System.nanoTime()
    val rr = Ingest.retractBatch(spark, keys, c, b)
    val wall = (System.nanoTime() - t0) / 1e9

    val survivors = spark.table(c).count()
    val bandRows = spark.table(b).count()
    def lastCommit(t: String) = spark.table(s"$t.snapshots")
      .orderBy(col("snapshot_id").desc).limit(1)
      .select("operation", "summary").collect()(0)
    val (cOp, cSum) = { val r = lastCommit(c)
      (r.getString(0), r.getMap[String, String](1)) }
    val (bOp, bSum) = { val r = lastCommit(b)
      (r.getString(0), r.getMap[String, String](1)) }

    val headBefore = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$b.history").agg(max("snapshot_id")).head().getLong(0))
    val rr2 = Ingest.retractBatch(spark, keys, c, b)
    val headAfter = (
      spark.table(s"$c.history").agg(max("snapshot_id")).head().getLong(0),
      spark.table(s"$b.history").agg(max("snapshot_id")).head().getLong(0))

    val ok =
      rr.corpusDocsRemoved == Docs / 2 &&
      rr.bandRowsRemoved == Docs / 2 * 8 &&
      survivors == Docs / 2 && bandRows == Docs / 2 * 8 &&
      cOp == "delete" && bOp == "delete" &&
      cSum.get("delete-kind").contains("equality") &&
      bSum.get("delete-kind").contains("equality") &&
      cSum.get("added-delete-files").contains("1") &&
      bSum.get("added-delete-files").contains("1") &&
      rr2.corpusDocsRemoved == 0 && rr2.bandRowsRemoved == 0 &&
      headBefore == headAfter
    def f(v: Double) = f"$v%.1f"
    println(s"""{"probe":"frame_retraction","keys":${Docs / 2},""" +
      s""""corpus_removed":${rr.corpusDocsRemoved},""" +
      s""""band_rows_removed":${rr.bandRowsRemoved},""" +
      s""""survivors":$survivors,"retract_secs":${f(wall)},""" +
      s""""rerun_noop":${rr2.corpusDocsRemoved == 0 && headBefore == headAfter},""" +
      s""""pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(2)
  }
}
