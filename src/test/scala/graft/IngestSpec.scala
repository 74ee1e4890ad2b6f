package graft

import org.apache.spark.sql.functions._
import graft.operators.Ingest

/** End-to-end contract of the one-call corpus-ingest step: per-stage
  * accounting, cross-batch dedup through the lake index, idempotent
  * re-ingest, and the rebuild-after-crash recovery path. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val Cat = "ingestcat"

  private def setup(): Unit = {
    if (spark.conf.getOption(s"spark.sql.catalog.$Cat").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$Cat",
        classOf[graft.lake.GraftCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$Cat.warehouse",
        java.nio.file.Files.createTempDirectory("graft-wh-ingest").toString)
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $Cat.ing")
    spark.sql(s"DROP TABLE IF EXISTS $Cat.ing.corpus")
    spark.sql(s"DROP TABLE IF EXISTS $Cat.ing.fp_index")
    spark.sql(s"CREATE TABLE $Cat.ing.corpus (doc_id BIGINT, text STRING) USING graft")
    spark.sql(s"CREATE TABLE $Cat.ing.fp_index (fp STRING, doc_id BIGINT) USING graft")
  }

  private val corpusT = s"$Cat.ing.corpus"
  private val indexT = s"$Cat.ing.fp_index"

  private val textA = "the quick brown fox jumps over the lazy dog every single day"
  private val textB = "completely different words appear in this entirely separate document today again"
  private val textC = "a third unique document with more than ten whitespace tokens in it"
  private val textD = "yet another brand new document that has never been seen before anywhere"

  test("two-batch ingest: accounting, cross-batch dedup, idempotent re-ingest") {
    setup()
    val batch1 = Seq(
      1L -> textA,
      2L -> ("  THE quick   brown fox jumps over the lazy dog every single day "), // = A normalized
      3L -> textB,
      4L -> "too short", // quality reject: < 10 tokens
      5L -> (null: String) // quality reject: NULL text
    ).toDF("doc_id", "text")
    val r1 = Ingest.ingestBatch(spark, batch1, corpusT, indexT)
    assert(r1.copy(corpusVersion = 0) ==
      Ingest.IngestReport(5, 2, 1, 0, 2, 0), s"got $r1")
    assert(spark.table(corpusT).select("doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 3L)))
    assert(spark.table(indexT).count() == 2)

    val batch2 = Seq(6L -> textA, 7L -> textC).toDF("doc_id", "text")
    val r2 = Ingest.ingestBatch(spark, batch2, corpusT, indexT)
    assert(r2.copy(corpusVersion = 0) ==
      Ingest.IngestReport(2, 0, 0, 1, 1, 0), s"got $r2")
    assert(spark.table(corpusT).select("doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 3L, 7L)))
    // reproducibility pin: the version r1 reported still reads EXACTLY
    // batch1's corpus, even though batch2 has since committed
    assert(r2.corpusVersion > r1.corpusVersion)
    val pinned = spark.sql(
      s"SELECT doc_id FROM $corpusT VERSION AS OF ${r1.corpusVersion}")
      .as[Long].collect().sorted
    assert(pinned.sameElements(Array(1L, 3L)),
      s"VERSION AS OF ${r1.corpusVersion} read ${pinned.mkString(",")}")

    // idempotence: replaying a batch admits nothing and commits no rows
    val vBefore = spark.table(corpusT).count()
    val r1again = Ingest.ingestBatch(spark, batch1, corpusT, indexT)
    assert(r1again.admitted == 0 && r1again.alreadyIndexed == 2, s"got $r1again")
    assert(spark.table(corpusT).count() == vBefore)
    // accounting identity on every report
    Seq(r1, r2, r1again).foreach { r =>
      assert(r.batchRows ==
        r.qualityRejected + r.intraBatchDups + r.alreadyIndexed + r.admitted, r)
    }
  }

  test("concurrent ingests of disjoint batches both land — no lost commits") {
    setup()
    val b1 = Seq(1L -> textA, 2L -> textB).toDF("doc_id", "text")
    val b2 = Seq(11L -> textC, 12L -> textD).toDF("doc_id", "text")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(Ingest.ingestBatch(spark, b1, corpusT, indexT))
    val f2 = Future(Ingest.ingestBatch(spark, b2, corpusT, indexT))
    val (r1, r2) = (Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    // disjoint texts: the optimistic-commit retries must land all four
    // docs in both tables regardless of interleaving
    assert(r1.admitted == 2 && r2.admitted == 2, s"$r1 / $r2")
    assert(spark.table(corpusT).select("doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 11L, 12L)))
    assert(spark.table(indexT).select("doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 11L, 12L)))
  }

  test("rebuildIndex recovers from a crash between the two appends") {
    setup()
    Ingest.ingestBatch(spark, Seq(1L -> textA, 2L -> textB).toDF("doc_id", "text"),
      corpusT, indexT)
    Ingest.ingestBatch(spark, Seq(3L -> textC).toDF("doc_id", "text"),
      corpusT, indexT)
    // simulate the crash: corpus has all three docs, but the index lost
    // the second ingest's append (fp of C missing)
    spark.table(indexT).filter(col("doc_id") =!= 3L)
      .writeTo(indexT).overwrite(lit(true))
    assert(spark.table(indexT).count() == 2)
    // the documented hazard while unrecovered: an identical text would
    // be re-admitted — rebuild first
    val n = Ingest.rebuildIndex(spark, corpusT, indexT)
    assert(n == 3, s"rebuilt index rows: $n")
    // after recovery, a dup of C is rejected again and a new doc admits
    val r = Ingest.ingestBatch(spark,
      Seq(4L -> textC, 5L -> textD).toDF("doc_id", "text"), corpusT, indexT)
    assert(r.alreadyIndexed == 1 && r.admitted == 1, s"got $r")
    assert(spark.table(corpusT).select("doc_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L, 5L)))
    // rebuild is idempotent: a second run converges to the same state
    val n2 = Ingest.rebuildIndex(spark, corpusT, indexT)
    assert(n2 == 4)
  }
}
