package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Pins the r12 PQ kernels against the declarative forms they replaced in
  * q_knn_pq / q_knn_ivfpq (VERDICT r11 #4): [[graft.functions.PqEncode]]
  * must reproduce the slice + cost-array + array_position(array_min) tree
  * code-for-code (including first-min-wins under Spark's TOTAL double
  * order), and [[graft.functions.PqAdcScore]] the interpreted
  * aggregate(sequence) lookup fold value-for-value (same ascending-m
  * double sum). The kernels exist purely for codegen speed — any
  * divergence here is a correctness regression, not a trade-off. */
class PqEncodeSpec extends SparkSpec {

  private val M = 4    // subspaces
  private val Sub = 4  // dims per subspace
  private val K = 5    // codewords

  // deterministic synthetic codebooks, including two IDENTICAL codewords
  // (indices 1 and 3) so the first-min-wins tie rule is actually exercised
  private val books: Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Array.tabulate(M) { _ =>
      val ws = Array.fill(K)(Array.fill(Sub)(rnd.nextGaussian()))
      ws(3) = ws(1).clone() // exact tie: argmin must pick index 1 (first)
      ws
    }
  }

  /** The declarative encoder exactly as Similarity.pqCodeFor composed it
    * before r12. */
  private def declarativeCodes = {
    val vn = transform(col("v"), _ / col("nv"))
    array((0 until M).map { m =>
      val sub = slice(vn, m * Sub + 1, Sub)
      val costs = array(books(m).toIndexedSeq.map { c =>
        lit(c.map(x => x * x).sum) -
          lit(2.0) * graft.functions.Vectors.dot(sub, typedlit(c.toSeq))
      }: _*)
      array_position(costs, array_min(costs)).cast("int")
    }: _*)
  }

  /** The declarative ADC fold exactly as q_knn_pq computed it before r12. */
  private def declarativeAdc = aggregate(sequence(lit(0), lit(M - 1)), lit(0.0),
    (acc, m) => acc +
      element_at(element_at(col("tabs"), m + 1),
        element_at(col("codes"), m + 1)))

  private def vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (0 until 200).map { i =>
      (i.toLong, Seq.fill(M * Sub)(rnd.nextGaussian()))
    }.toDF("vec_id", "v")
      .withColumn("v", transform(col("v"), _.cast("double")))
      .withColumn("nv", graft.functions.Vectors.norm(col("v")))
      .filter(col("nv") > 0)
  }

  test("PqEncode reproduces the declarative slice+argmin codes exactly") {
    val df = vecs
      .withColumn("kernel",
        graft.functions.Vectors.pqEncode(col("v"), col("nv"), books))
      .withColumn("decl", declarativeCodes)
    val diff = df.filter(col("kernel") =!= col("decl"))
    assert(diff.isEmpty, s"codes diverge:\n${diff.limit(5).collect().mkString("\n")}")
    // the planted tie must resolve to the FIRST of the equal codewords
    val codes = df.select(explode(col("kernel"))).collect().map(_.getInt(0))
    assert(!codes.contains(4), "tie broke toward the later duplicate codeword")
  }

  test("PqAdcScore reproduces the interpreted aggregate() fold bit-for-bit") {
    val rnd = new scala.util.Random(13)
    val tabs = Seq.fill(M)(Seq.fill(K)(rnd.nextGaussian()))
    val df = vecs
      .withColumn("codes",
        graft.functions.Vectors.pqEncode(col("v"), col("nv"), books))
      .withColumn("tabs", typedlit(tabs))
      .withColumn("kernel",
        graft.functions.Vectors.pqAdcScore(col("codes"), col("tabs")))
      .withColumn("decl", declarativeAdc)
    // bit-identical, not approximately equal: same fold order is the claim
    val diff = df.filter(col("kernel") =!= col("decl"))
    assert(diff.isEmpty,
      s"ADC scores diverge:\n${diff.limit(5).collect().mkString("\n")}")
  }
}
