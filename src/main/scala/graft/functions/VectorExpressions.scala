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

/** Product-quantization encoder: all M subspace codes of one vector in ONE
  * per-row pass. `vec` is the raw array<double> vector, `norm` its L2 norm
  * (normalization happens inline: x_i = v_i / nv), `books` the M driver-
  * trained codebooks of K codewords × sub dims each. Code m is the 1-based
  * argmin_k of (‖c_k‖² − 2·⟨x_m, c_k⟩) under first-min-wins on Spark's
  * TOTAL double order (java.lang.Double.compare — the array_min /
  * array_position semantics of the declarative form this replaces, which
  * differ from IEEE `<` only on ±0.0/NaN ties).
  *
  * Exists because the declarative form — `transform(v, _/nv)` then, per
  * subspace, `slice` + an `array(K costs)` + `array_position(costs,
  * array_min(costs))` — is an interpreted higher-order/array-builder tree
  * re-evaluated per row: M·K boxed array constructions and lambda calls
  * per vector (the Int8Quantize projection-collapse class of problem, r5's
  * 31× lesson). Arithmetic is bit-identical: same ‖c‖² fold order, same
  * ascending-t dot loops, same (v_i / nv)·c_t per-element ops.
  * CodegenFallback: one interpreted eval per ROW with tight primitive
  * loops inside — the same trade the text kernels make. */
case class PqEncode(vec: Expression, norm: Expression,
    books: Array[Array[Array[Double]]])
  extends BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def left: Expression = vec
  override def right: Expression = norm

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, norm.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, n) => TypeCheckResult.TypeCheckFailure(
        s"PqEncode requires (array<double>, double), got " +
          s"(${v.simpleString}, ${n.simpleString})")
    }

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  // ‖c_k‖² with the SAME left-to-right fold the declarative form's
  // lit(c.map(x => x*x).sum) used — precomputed once per plan, not per row
  @transient private lazy val cnorm: Array[Array[Double]] =
    books.map(_.map(c => c.map(x => x * x).sum))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val nv = b.asInstanceOf[Double]
    val m = books.length
    val codes = new Array[Int](m)
    var mi = 0
    var off = 0
    while (mi < m) {
      val book = books(mi)
      val cn = cnorm(mi)
      val sub = book(0).length
      var best = 0
      var bestCost = Double.NaN
      var k = 0
      while (k < book.length) {
        val c = book(k)
        var dotv = 0.0
        var t = 0
        while (t < sub) { dotv += (x.getDouble(off + t) / nv) * c(t); t += 1 }
        val cost = cn(k) - 2.0 * dotv
        // total-order strict less-than (array_min + first array_position)
        if (k == 0 || java.lang.Double.compare(cost, bestCost) < 0) {
          bestCost = cost
          best = k
        }
        k += 1
      }
      codes(mi) = best + 1 // 1-based, as array_position
      mi += 1
      off += sub
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(vec = newLeft, norm = newRight)
}

/** Asymmetric-distance (ADC) score: Σ_m tabs[m][codes[m]] with 1-based
  * codes — M array lookups per row, codegen'd. Replaces the interpreted
  * `aggregate(sequence(0, M−1), 0.0, (acc, m) → acc + element_at(
  * element_at(tabs, m+1), element_at(codes, m+1)))` fold, which built a
  * fresh sequence array and made 2·M boxed element_at calls per scored
  * row. Fold order is the same ascending-m double sum → identical
  * result. */
case class PqAdcScore(codes: Expression, tabs: Expression)
  extends BinaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, IntegerType}

  override def left: Expression = codes
  override def right: Expression = tabs

  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, tabs.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (c, t) => TypeCheckResult.TypeCheckFailure(
        s"PqAdcScore requires (array<int>, array<array<double>>), got " +
          s"(${c.simpleString}, ${t.simpleString})")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[ArrayData]
    val ts = b.asInstanceOf[ArrayData]
    val m = cs.numElements()
    var s = 0.0
    var i = 0
    while (i < m) { s += ts.getArray(i).getDouble(cs.getInt(i) - 1); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, t) => {
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      s"""
         |int $m = $c.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $m; $i++) {
         |  $s += $t.getArray($i).getDouble($c.getInt($i) - 1);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, tabs = newRight)
}
