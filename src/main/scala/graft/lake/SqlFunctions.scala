package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** SQL-callable engine kernels (SURVEY.md §2.10): the custom Catalyst
  * expressions behind the dedup/similarity packs, exposed through the
  * DSv2 FunctionCatalog so plain SQL users get them too:
  *
  * {{{
  *   SELECT graft.system.cosine(a, b)            -- array<double> x2 → double
  *   SELECT graft.system.simhash64(text)         -- string → 64-bit signature
  *   SELECT graft.system.word_shingles(text)     -- string → array<string> 3-grams
  *   SELECT graft.system.minhash(text)           -- string → array<long> (32 hashes)
  *   SELECT graft.system.zorder_key(x, y, ...)   -- 1..8 atomic cols → morton long
  * }}}
  *
  * Each bound function evaluates the SAME expression instance the
  * DataFrame packs use (over a BoundReference into the argument row), so
  * SQL and DataFrame results are identical by construction.
  */
object SqlFunctions {

  val names: Seq[String] =
    Seq("cosine", "simhash64", "word_shingles", "minhash", "zorder_key")

  def load(ident: Identifier): UnboundFunction = {
    // Empty namespace: the partition-transform functions Spark's
    // V2ExpressionUtils resolves when a scan reports bucket/days/...
    // partitioning for storage-partitioned joins. Unknown names must
    // throw NoSuchFunctionException — the resolver treats exactly that
    // (plus UnsupportedOperationException) as "fall back quietly".
    if (ident.namespace().isEmpty)
      return PartitionV2Functions.load(ident.name()).getOrElse(
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchFunctionException(ident))
    if (!ident.namespace().sameElements(Procedures.Namespace))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    ident.name() match {
      case "cosine" => Cosine
      case "simhash64" =>
        exprFn("simhash64", Seq(StringType), LongType,
          args => graft.functions.SimHash64(BoundReference(0, StringType, true)))
      case "word_shingles" =>
        exprFn("word_shingles", Seq(StringType), ArrayType(StringType),
          args => graft.functions.WordShingles(
            BoundReference(0, StringType, true), 3))
      case "minhash" =>
        exprFn("minhash", Seq(StringType), ArrayType(LongType),
          args => graft.functions.MinHashSignatures(
            BoundReference(0, StringType, true), 3, 32))
      case "zorder_key" => ZOrderFn
      case _ =>
        throw new org.apache.spark.sql.catalyst.analysis
          .NoSuchFunctionException(ident)
    }
  }

  /** An UnboundFunction backed by a catalyst expression over the bound
    * argument row. */
  private def exprFn(
      fnName: String,
      argTypes: Seq[DataType],
      resType: DataType,
      build: StructType => org.apache.spark.sql.catalyst.expressions.Expression)
      : UnboundFunction =
    new UnboundFunction {
      override def name(): String = fnName
      override def description(): String = fnName
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.fields.length == argTypes.length,
          s"$fnName takes ${argTypes.length} argument(s)")
        inputType.fields.zip(argTypes).foreach { case (f, want) =>
          require(f.dataType == want,
            s"$fnName argument ${f.name}: want ${want.simpleString}, " +
              s"got ${f.dataType.simpleString}")
        }
        val expr = build(inputType)
        new ScalarFunction[Any] {
          override def inputTypes(): Array[DataType] = argTypes.toArray
          override def resultType(): DataType = resType
          override def name(): String = fnName
          override def canonicalName(): String = s"graft.system.$fnName"
          override def isResultNullable: Boolean = true
          override def isDeterministic: Boolean = true
          override def produceResult(input: InternalRow): Any = expr.eval(input)
        }
      }
    }

  /** cosine needs its own bind: both arguments must be array<double>
    * (callers cast; Spark inserts the cast for array<float> inputs). */
  private object Cosine extends UnboundFunction {
    override def name(): String = "cosine"
    override def description(): String =
      "cosine similarity of two array<double> vectors"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "cosine takes 2 arguments")
      inputType.fields.foreach { f =>
        require(f.dataType == ArrayType(DoubleType) ||
            f.dataType == ArrayType(DoubleType, containsNull = false),
          s"cosine argument ${f.name}: want array<double>, " +
            s"got ${f.dataType.simpleString}")
      }
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          Array(ArrayType(DoubleType), ArrayType(DoubleType))
        override def resultType(): DataType = DoubleType
        override def name(): String = "cosine"
        override def canonicalName(): String = "graft.system.cosine"
        override def isResultNullable: Boolean = true
        override def isDeterministic: Boolean = true
        override def produceResult(input: InternalRow): Any = {
          if (input.isNullAt(0) || input.isNullAt(1)) return null
          val a = input.getArray(0)
          val b = input.getArray(1)
          val n = math.min(a.numElements(), b.numElements())
          var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < n) {
            val x = a.getDouble(i); val y = b.getDouble(i)
            dot += x * y; na += x * x; nb += y * y; i += 1
          }
          if (na == 0.0 || nb == 0.0) null
          else dot / (math.sqrt(na) * math.sqrt(nb))
        }
      }
    }
  }

  /** zorder_key binds to whatever atomic columns it gets (1..8). */
  private object ZOrderFn extends UnboundFunction {
    override def name(): String = "zorder_key"
    override def description(): String =
      "Morton (z-order) key interleaving 1..8 atomic columns"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.nonEmpty && inputType.fields.length <= 8,
        "zorder_key takes 1..8 arguments")
      inputType.fields.foreach { f =>
        val ok = f.dataType match {
          case ByteType | ShortType | IntegerType | LongType | FloatType |
               DoubleType | StringType | DateType | TimestampType |
               TimestampNTZType | _: DecimalType => true
          case _ => false
        }
        require(ok, s"zorder_key argument ${f.name}: " +
          s"unsupported type ${f.dataType.simpleString}")
      }
      val expr = graft.functions.ZOrderKey(
        inputType.fields.toSeq.zipWithIndex.map { case (f, i) =>
          BoundReference(i, f.dataType, f.nullable)
        })
      new ScalarFunction[Any] {
        override def inputTypes(): Array[DataType] =
          inputType.fields.map(_.dataType)
        override def resultType(): DataType = LongType
        override def name(): String = "zorder_key"
        override def canonicalName(): String = "graft.system.zorder_key"
        override def isResultNullable: Boolean = false
        override def isDeterministic: Boolean = true
        override def produceResult(input: InternalRow): Any = expr.eval(input)
      }
    }
  }
}
