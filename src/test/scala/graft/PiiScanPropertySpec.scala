package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** PiiScan (one combined regex pass + one count pass) must be value-equal
  * to the 4-scan declarative formulation it replaced — two
  * `regexp_extract_all` sizes over the raw text plus the chained
  * email-then-number `regexp_replace`. The generator is adversarial on the
  * exact boundary the rewrite reasons about: digit runs touching email
  * local parts, near-emails, placeholder literals already in the text. */
class PiiScanPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  test("PiiScan equals the sequential extract/replace formulation") {
    val frag = Gen.oneOf(
      Gen.const("user.name+tag@example.com"),
      Gen.const("a@b.co"), Gen.const("a@b.c"), Gen.const("@x.com"),
      Gen.const("x@.com"), Gen.const("a@@b.com"),
      Gen.const("123abc@x.de"), Gen.const("12a@b.co34"),
      Gen.const("999@x.com"), Gen.const("a.b-c_d%e@f-g.h.ij"),
      Gen.const("a@b.co999"), Gen.const("12@34.com56"),
      Gen.chooseNum(1, 7).map(n => "9" * n),
      Gen.chooseNum(1, 9).map(n => "120" * n),
      Gen.const("word"), Gen.const(" "), Gen.const("\t\n"),
      Gen.const("<EMAIL>"), Gen.const("<NUM>"),
      Gen.const("."), Gen.const("-"), Gen.const("%"), Gen.const("+"),
      Gen.alphaNumStr.map(_.take(8)))
    val doc = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, frag)).map(_.mkString)
    val docs: Seq[String] = (0 until 400).flatMap { i =>
      doc.apply(Gen.Parameters.default, Seed(90210L + i))
    } :+ "" :+ null

    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

    val email = graft.functions.PiiScan.EmailRegex
    val nums = graft.functions.PiiScan.NumRegex
    val oldForm = df.select(col("id"),
        size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(nums), lit(0))).as("n_nums"),
        regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
          nums, "<NUM>").as("redacted"))
      .orderBy("id").collect()

    import org.apache.spark.sql.graftbridge.ColumnBridge
    val scan = ColumnBridge.column(
      graft.functions.PiiScan(ColumnBridge.expression(col("text"))))
    val newForm = df.select(col("id"), scan.as("p"))
      .select(col("id"), col("p.n_emails").as("n_emails"),
        col("p.n_nums").as("n_nums"), col("p.redacted").as("redacted"))
      .orderBy("id").collect()

    assert(oldForm.length == newForm.length)
    oldForm.zip(newForm).foreach { case (o, n) =>
      assert(o == n, s"diverged on text=${docs(o.getLong(0).toInt)}")
    }
  }
}
