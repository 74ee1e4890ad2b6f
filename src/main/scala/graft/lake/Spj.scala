package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Expression => V2Expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned joins (SPJ): the scan reports its partition layout
  * as a `KeyGroupedPartitioning` so Spark's planner can join two tables
  * co-partitioned on the same transform WITHOUT a shuffle — the 100 TB
  * join between two `bucket(N, key)` tables moves zero bytes between
  * executors (the same design Iceberg ships for its DSv2 scans; enabled
  * by `spark.sql.sources.v2.bucketing.enabled`, which Spark gates
  * centrally in `DataSourceV2ScanExecBase.groupPartitions`).
  *
  * This object derives the per-file partition KEY rows from the string
  * partition values the writer stored (`PartitionTransforms.valueColumn`)
  * and the V2 key expressions Spark resolves against the scan output.
  * Derivation is all-or-nothing per field and conservative: any file
  * missing a value, any unparseable value, or any unsupported
  * source-column type drops the field (and if none survive, the scan
  * reports `UnknownPartitioning` and planning proceeds exactly as
  * before). Reporting a SUBSET of the spec is sound — files agreeing on
  * the reported fields but differing on a dropped one simply land in the
  * same key group.
  */
object Spj {

  /** Sentinel the writer stores for a NULL partition value
    * (GraftBatchWrite.RowPartitionEval). */
  private[lake] val NullSentinel = "__null__"

  final case class Keyed(
      keys: Array[V2Expression],
      groups: Seq[(InternalRow, Seq[DataFile])])

  /** Key rows + V2 key expressions for `files`, or None when the layout
    * can't be reported soundly. `required` is the scan's output schema:
    * a key expression referencing a column the scan does not produce
    * would make Spark's resolution THROW (V2ExpressionUtils.resolveRef),
    * so fields whose source is pruned away are dropped here. */
  def keyed(
      snapshot: Snapshot,
      files: Seq[DataFile],
      required: StructType): Option[Keyed] = {
    val spec = snapshot.partitionSpec
    if (spec.isEmpty || files.isEmpty) return None
    val schema = snapshot.schema

    val fields: Seq[(PartitionField, V2Expression, String => Any)] =
      spec.flatMap { f =>
        if (!required.fieldNames.contains(f.source)) None
        else schema.fields.find(_.name == f.source).flatMap { col =>
          parserFor(f, col.dataType).map { parse =>
            (f, v2Key(f), parse)
          }
        }
      }
    if (fields.isEmpty) return None

    // one parsed key tuple per file; any failure anywhere → no SPJ
    val grouped = scala.collection.mutable.LinkedHashMap
      .empty[Seq[Any], scala.collection.mutable.ArrayBuffer[DataFile]]
    files.foreach { df =>
      val key = fields.map { case (f, _, parse) =>
        df.partitionValues.get(f.name) match {
          case Some(NullSentinel) => null
          case Some(v) =>
            try parse(v) catch { case scala.util.control.NonFatal(_) => return None }
          case None => return None // pre-evolution file: no value recorded
        }
      }
      grouped.getOrElseUpdate(key,
        scala.collection.mutable.ArrayBuffer.empty[DataFile]) += df
    }
    Some(Keyed(
      fields.map(_._2).toArray,
      grouped.iterator.map { case (key, fs) =>
        (new GenericInternalRow(key.toArray): InternalRow) -> fs.toSeq
      }.toSeq))
  }

  private def v2Key(f: PartitionField): V2Expression = f.transform match {
    case "identity" => Expressions.identity(f.source)
    case "days"     => Expressions.days(f.source)
    case "months"   => Expressions.months(f.source)
    case "years"    => Expressions.years(f.source)
    case b if b.startsWith("bucket[") =>
      Expressions.bucket(PartitionTransforms.bucketN(b), f.source)
  }

  /** Parse a stored partition-value string into the catalyst-internal key
    * value. Must invert `PartitionTransforms.valueColumn` EXACTLY — a
    * divergent parse puts a file in the wrong key group and the join
    * silently drops rows — so each case below names the writer rendering
    * it inverts. None = not invertible for this transform/type. */
  /** Parser for IDENTITY partition values, string → catalyst-internal —
    * shared with the metadata-only GROUP BY pushdown (GraftScanBuilder),
    * which groups files by exactly these keys. */
  private[lake] def identityParser(src: DataType): Option[String => Any] =
    src match {
      case ByteType    => Some(_.toByte)
      case ShortType   => Some(_.toShort)
      case IntegerType => Some(_.toInt)
      case LongType    => Some(_.toLong)
      case BooleanType => Some(_.toBoolean)
      // cast(string) is the identity rendering; refuse if any real value
      // collides with the null sentinel (checked per-file in keyed())
      case StringType  => Some(v =>
        if (v == NullSentinel) throw new IllegalArgumentException(
          "string partition value collides with the null sentinel")
        else UTF8String.fromString(v))
      // cast(date as string) = ISO yyyy-MM-dd
      case DateType => Some(v =>
        java.time.LocalDate.parse(v).toEpochDay.toInt)
      // timestamps: cast-to-string rendering is timezone/format
      // sensitive (see PartitionTransforms.identityLiteral); floats,
      // decimals, nested: not invertible — skip the field
      case _ => None
    }

  private def parserFor(
      f: PartitionField, src: DataType): Option[String => Any] =
    f.transform match {
      case "identity" => identityParser(src)
      case b if b.startsWith("bucket[") =>
        // pmod(hash(col), n) rendered via cast(int as string)
        Some(_.toInt)
      // date_format renderings, parsed to the same ints
      // PartitionV2Functions computes from raw rows
      case "days" => Some(v =>
        java.time.LocalDate.parse(v).toEpochDay.toInt) // DateType key
      case "months" => Some { v =>
        val Array(y, m) = v.split("-", 2)
        y.toInt * 12 + (m.toInt - 1)
      }
      case "years" => Some(_.toInt)
      case _ => None
    }
}

/** DSv2 functions backing the partition transforms, served by
  * [[GraftCatalog.loadFunction]] at the EMPTY namespace — that is where
  * Spark's `V2ExpressionUtils.loadV2FunctionOpt` looks when it converts a
  * reported `bucket(N, col)` / `days(col)` transform into a catalyst
  * `TransformExpression`. Two scans are SPJ-compatible iff their
  * transforms resolve to bound functions with equal `canonicalName`s, and
  * `spark.sql.sources.v2.bucketing.shuffle.enabled` may EVALUATE the
  * function to co-partition a non-bucketed join side — so `produceResult`
  * must compute exactly what the writer's `valueColumn` stored:
  *  - bucket: `pmod(hash(col), n)` — catalyst Murmur3 with seed 42;
  *  - days/months/years: the session-timezone calendar field encoded as
  *    DateType epoch days / months-since-year-0 / calendar year, matching
  *    [[Spj.parserFor]]'s parse of the stored `date_format` strings.
  */
object PartitionV2Functions {

  val names: Seq[String] = Seq("bucket", "days", "months", "years")

  def load(name: String): Option[UnboundFunction] = name match {
    case "bucket" => Some(Bucket)
    case "days"   => Some(timeFn("days", DateType,
      ld => ld.toEpochDay.toInt))
    case "months" => Some(timeFn("months", IntegerType,
      ld => ld.getYear * 12 + (ld.getMonthValue - 1)))
    case "years"  => Some(timeFn("years", IntegerType, _.getYear))
    case _ => None
  }

  private object Bucket extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(hash(col), n), the graft bucket partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2, "bucket takes (numBuckets, col)")
      require(inputType.fields(0).dataType == IntegerType,
        s"bucket numBuckets must be INT, got ${inputType.fields(0).dataType}")
      val valueType = inputType.fields(1).dataType
      require(hashable(valueType), s"bucket over ${valueType.simpleString}")
      new ScalarFunction[Int] {
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, valueType)
        override def resultType(): DataType = IntegerType
        override def name(): String = "bucket"
        override def canonicalName(): String = "graft.bucket"
        override def isResultNullable: Boolean = false
        override def isDeterministic: Boolean = true
        override def produceResult(input: InternalRow): Int = {
          val n = input.getInt(0)
          // Murmur3 seed 42, null folds to the seed — both exactly
          // catalyst `hash()`, which valueColumn stores
          val h =
            if (input.isNullAt(1)) 42
            else org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
              .hash(input.get(1, valueType), valueType, 42L).toInt
          val r = h % n
          if (r < 0) r + n else r
        }
      }
    }
  }

  private def hashable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | BinaryType | BooleanType | DateType |
         TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  /** days/months/years over TIMESTAMP (session tz) or DATE. */
  private def timeFn(
      fnName: String,
      resType: DataType,
      ofDate: java.time.LocalDate => Int): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fnName
      override def description(): String =
        s"$fnName(ts): the graft $fnName partition transform"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.fields.length == 1, s"$fnName takes one argument")
        val valueType = inputType.fields(0).dataType
        require(valueType == TimestampType || valueType == DateType,
          s"$fnName over ${valueType.simpleString}")
        val zone = java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        new ScalarFunction[Int] {
          override def inputTypes(): Array[DataType] = Array(valueType)
          override def resultType(): DataType = resType
          override def name(): String = fnName
          override def canonicalName(): String = s"graft.$fnName"
          override def isResultNullable: Boolean = true
          override def isDeterministic: Boolean = true
          override def produceResult(input: InternalRow): Int = {
            val ld = valueType match {
              case DateType => java.time.LocalDate.ofEpochDay(input.getInt(0))
              case _ => // TimestampType: micros since epoch, session tz
                java.time.Instant
                  .ofEpochSecond(
                    Math.floorDiv(input.getLong(0), 1000000L),
                    Math.floorMod(input.getLong(0), 1000000L) * 1000L)
                  .atZone(zone).toLocalDate
            }
            ofDate(ld)
          }
        }
      }
    }
}
