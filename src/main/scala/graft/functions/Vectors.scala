package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * higher-order array functions (zip_with / aggregate / transform). No UDFs:
  * these stay Catalyst expressions, so they serialize into any plan,
  * survive AQE re-planning, and avoid the UDF serialization wall. All math
  * is done in double after an explicit cast so results match a
  * double-precision oracle (DuckDB `list_cosine_similarity` on DOUBLE[]).
  */
object Vectors {

  /** Cast an array<float> column to array<double> for stable math. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Codegen'd dot product (custom Catalyst expression — see
    * VectorExpressions). Replaces the interpreted higher-order form on the
    * all-pairs path. */
  def dot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Codegen'd L2 norm. */
  def norm(a: Column): Column = column(VecNorm(expression(a)))

  /** One-pass symmetric int8 quantization → struct<q, nq> (see
    * [[Int8Quantize]] for why this is an expression, not HOFs). */
  def int8Quantize(a: Column): Column = column(Int8Quantize(expression(a)))

  /** All M product-quantization codes of a vector in one per-row pass
    * (see [[PqEncode]] for why this is an expression, not slice+argmin
    * HOF trees). */
  def pqEncode(v: Column, nv: Column,
      books: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(v), expression(nv), books))

  /** Codegen'd ADC lookup-table score Σ_m tabs[m][codes[m]] (see
    * [[PqAdcScore]]). */
  def pqAdcScore(codes: Column, tabs: Column): Column =
    column(PqAdcScore(expression(codes), expression(tabs)))

  /** Cosine similarity of two array<double> columns. Prefer
    * `dot(a,b) / (normA * normB)` with norms precomputed per side when the
    * same vector participates in many pairs. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Interpreted reference implementations (higher-order functions) — kept
    * for cross-checking the codegen'd kernels in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normHof(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))
}
