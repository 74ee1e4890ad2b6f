package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd vector kernels for embedding math (SURVEY.md §2.9 N3).
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is
  * evaluated interpreted, one lambda call per element, with boxing — fine
  * for small data, a bottleneck for all-pairs similarity (2M pairs × 64
  * dims at sf0.1). These expressions generate a tight primitive loop inside
  * WholeStageCodegen: no boxing, no virtual dispatch, auto-vectorizable by
  * the JIT. Inputs must be array<double> (callers cast once at scan).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an array<double> column, codegen'd. */
case class VecNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Symmetric int8 quantization of an array<double> vector in ONE per-row
  * pass: scale = 127 / max(|x|, floored at 1e-30), q_i = floor(x_i·scale
  * + 0.5) (kept as double so integer dot products stay oracle-checkable),
  * plus the quantized vector's L2 norm. Returns
  * struct<q: array<double>, nq: double>.
  *
  * Exists because the declarative formulation — `transform(v, x ->
  * floor(x * sc + 0.5))` with `sc = 127 / array_max(transform(v, abs))` —
  * gets projection-collapsed so that the single-use alias `sc` lands
  * INSIDE the per-element lambda, re-evaluating the array_max subtree
  * once per element: an O(dim²) blowup per row that the sf10 probe
  * measured as 35× over the identically-shaped exact kNN (75 s vs 2.2 s
  * at 200k × 64-dim). One expression, one pass, no collapse hazard.
  * CodegenFallback: one interpreted eval per ROW (not per element) —
  * the same trade the text kernels make. */
case class Int8Quantize(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

  // ADVICE r5: fail at ANALYSIS time on a wrong-typed child (e.g. a raw
  // array<float> that skipped toDouble) instead of a runtime
  // ClassCastException deep in an executor. checkInputDataTypes rather
  // than ExpectsInputTypes: AbstractDataType is private[sql], so the
  // trait's signature can't be written outside Spark's package.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"Int8Quantize requires array<double>, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("q", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("nq", DoubleType, nullable = false)))

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var absMax = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i))
      if (v > absMax) absMax = v
      i += 1
    }
    // identical arithmetic to the DuckDB twin:
    // sc = 127 / greatest(absmax, 1e-30); q_i = floor(x_i * sc + 0.5)
    val sc = 127.0 / math.max(absMax, 1e-30)
    val q = new Array[Any](n)
    var s = 0.0
    i = 0
    while (i < n) {
      val v = math.floor(x.getDouble(i) * sc + 0.5)
      q(i) = v
      s += v * v
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new org.apache.spark.sql.catalyst.util.GenericArrayData(q),
        math.sqrt(s)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
