package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** RepetitionProfile (one per-row pass over token and adjacent-bigram count
  * maps) must equal a naive Scala reference computed over the SAME
  * tokenization contract (trim spaces only, lower, split "\s+" keeping
  * empties). The generator is adversarial on the tokenizer's edges: runs
  * of every whitespace class, leading/trailing pads, case flips of the
  * same word, single tokens, empty and null text, and high-repetition
  * streams where the top token/bigram counts are contested. */
class RepetitionPropertySpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.session

  private def reference(text: String): (Int, Int, Int, Int, Int) = {
    var a = 0; var b = text.length
    while (a < b && text.charAt(a) == ' ') a += 1
    while (b > a && text.charAt(b - 1) == ' ') b -= 1
    val toks = text.substring(a, b).toLowerCase.split("\\s+", -1)
    val tokCounts = toks.groupBy(identity).map { case (_, v) => v.length }
    val bigrams = toks.sliding(2).filter(_.length == 2)
      .map(p => p(0) + " " + p(1)).toSeq
    val bigramCounts = bigrams.groupBy(identity).map { case (_, v) => v.length }
    (toks.length, tokCounts.size, tokCounts.max,
      bigrams.length, if (bigrams.isEmpty) 0 else bigramCounts.max)
  }

  test("RepetitionProfile equals the naive token/bigram count reference") {
    val word = Gen.oneOf("the", "The", "THE", "cat", "dog", "a", "ab",
      "x", "y", "Ü", "统一", "<s>", "1", "42")
    val sep = Gen.oneOf(" ", "  ", "\t", "\n", " \t ", "\r\n")
    val piece = Gen.oneOf(word, sep, Gen.const(""))
    val doc = Gen.chooseNum(0, 24)
      .flatMap(n => Gen.listOfN(n, piece)).map(_.mkString(" "))
    val docs: Seq[String] = (0 until 400).flatMap { i =>
      doc.apply(Gen.Parameters.default, Seed(1337L + i))
    } ++ Seq("", " ", "\t", "x", "x x x x x x x x", "  padded  ")

    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rep = ColumnBridge.column(
      graft.functions.RepetitionProfile(ColumnBridge.expression(col("text"))))
    val got = df.select(col("id"), rep.as("r")).orderBy("id")
      .select("r.n_tokens", "r.n_distinct", "r.top_token", "r.n_bigrams",
        "r.top_bigram")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    docs.zip(got).foreach { case (text, actual) =>
      assert(actual == reference(text), s"text: ${text.replace("\n", "\\n")}")
    }
  }
}
