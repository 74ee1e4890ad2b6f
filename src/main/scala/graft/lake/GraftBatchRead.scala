package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.SupportsReportStatistics
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native executor-side batch read path (DSv2 `Batch` +
  * `PartitionReaderFactory`), used by the row-level operation rewrites
  * (MERGE / UPDATE): Spark's ReplaceData planning calls `Scan.toBatch`
  * directly and does not route through the V1 fallback, so the COW scan
  * must produce InternalRows on executors itself.
  *
  * Row-based parquet-mr reader over the snapshot's (pruned) file list —
  * one InputPartition per data file, readers run fully distributed. The
  * hot SELECT path stays on the V1 bridge (vectorized, codegen); this
  * reader only feeds rewrites, whose cost is dominated by the write side.
  * Null-fills columns missing from old files (schema evolution) like the
  * main read path.
  */
/** @param deletedPositions sorted 0-based row indexes (merge-on-read
  *                         position deletes) the reader must skip */
final case class GraftInputPartition(
    filePath: String,
    deletedPositions: Array[Long] = Array.empty) extends InputPartition

final class GraftBatchScan(
    snapshot: Snapshot,
    store: SnapshotStore,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    onRuntimePrune: Seq[DataFile] => Unit = _ => ())
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  private[lake] lazy val prunedFiles: Seq[DataFile] =
    StatsPruner.prune(snapshot.files, filters.toIndexedSeq,
      snapshot.partitionSpec, SchemaNames.renameMap(snapshot.schema))

  /** File set after runtime (dynamic) filtering — starts at the statically
    * pruned set; `filter()` narrows it before planInputPartitions. */
  @volatile private var runtimeFiles: Seq[DataFile] = null
  private def currentFiles: Seq[DataFile] =
    if (runtimeFiles ne null) runtimeFiles else prunedFiles

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Runtime group filtering at FILE granularity: `filterAttributes` is
    * the `_file` metadata column, so Spark's
    * RowLevelOperationRuntimeGroupFiltering rule builds an IN-subquery
    * collecting the distinct `_file` values of rows that actually match
    * the MERGE/UPDATE/DELETE condition, and at runtime hands this scan
    * exactly the set of files containing matches — the COW rewrite then
    * reads and replaces only those, regardless of how weak the static
    * predicates were. This is the 100 TB MERGE optimization (same design
    * as Iceberg's copy-on-write scan).
    *
    * Returning a SINGLE attribute matters: multiple filter attributes make
    * Spark build one `named_struct(...) IN subquery` filter, which cannot
    * be translated to a connector Predicate and is silently dropped —
    * that, not a planner limitation, is why runtime group filtering
    * appeared "never injected" with an all-columns filterAttributes. */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("_file"))

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Unit = {
    val v1 = org.apache.spark.sql.graftbridge.ColumnBridge.predicatesToV1(predicates)
    val (fileIn, rest) = v1.partition {
      case org.apache.spark.sql.sources.In("_file", _) => true
      case _ => false
    }
    // `_file` values may arrive in URI form ("file:///x/y", from
    // input_file_name on the V1 bridge) or raw ("/x/y", from the COW
    // reader) — normalize BOTH sides before matching. Narrowing to the
    // wrong set here loses writes, so if any wanted path fails to resolve
    // to a known snapshot file (a form this normalization doesn't cover),
    // refuse to narrow on that filter and keep the conservative set.
    def canon(p: String): String =
      if (p.startsWith("file:"))
        scala.util.Try(new java.net.URI(p).getPath).toOption.filter(_ != null)
          .getOrElse(p.stripPrefix("file://").stripPrefix("file:"))
      else p
    lazy val knownPaths: Set[String] =
      snapshot.files.map(f => store.tableDir.resolve(f.path).toString).toSet
    val afterFile = fileIn.foldLeft(currentFiles) { (fs, flt) =>
      val wanted = flt.asInstanceOf[org.apache.spark.sql.sources.In]
        .values.map(v => canon(String.valueOf(v))).toSet
      if (wanted.exists(w => !knownPaths.contains(w))) fs // unknown form → keep all
      else fs.filter(f => wanted.contains(store.tableDir.resolve(f.path).toString))
    }
    val narrowed = StatsPruner.prune(afterFile, rest.toIndexedSeq,
      snapshot.partitionSpec, SchemaNames.renameMap(snapshot.schema))
    runtimeFiles = narrowed
    onRuntimePrune(narrowed)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // merge-on-read: hand each reader the sorted deleted positions of its
    // file so COW rewrites never resurrect deleted rows
    val posByName: Map[String, Array[Long]] =
      PositionDeletes.allPositionsByFileName(
        org.apache.spark.sql.SparkSession.active, store,
        snapshot, currentFiles)
    currentFiles.map { f =>
      GraftInputPartition(
        store.tableDir.resolve(f.path).toString,
        posByName.getOrElse(PositionDeletes.fileName(f.path), Array.empty))
        : InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required.json, snapshot.schema.json)

  override def estimateStatistics() = new org.apache.spark.sql.connector.read.Statistics {
    override def sizeInBytes() =
      java.util.OptionalLong.of(math.max(prunedFiles.map(_.sizeBytes).sum, 1L))
    override def numRows() =
      java.util.OptionalLong.of(prunedFiles.map(_.rowCount).sum)
  }

  override def description(): String =
    s"GraftBatchScan[v${snapshot.version}, files=${prunedFiles.size}/${snapshot.files.size}]"
}

final class GraftReaderFactory(requiredJson: String, tableSchemaJson: String)
  extends PartitionReaderFactory {
  // parsed once per (deserialized) factory instance, not once per file —
  // a rewrite over thousands of files calls createReader per partition
  @transient private lazy val required: StructType =
    DataType.fromJson(requiredJson).asInstanceOf[StructType]
  // files store PHYSICAL column names; the projection uses logical ones
  @transient private lazy val rename: Map[String, String] =
    SchemaNames.renameMap(
      DataType.fromJson(tableSchemaJson).asInstanceOf[StructType])

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    new GraftPartitionReader(p.filePath, required, rename, p.deletedPositions)
  }
}

/** Reads one parquet file as InternalRows of `required` (missing fields →
  * null). Handles the physical types our writer produces: int32 (int,
  * date, small decimal), int64 (long, timestamp micros/millis, decimal),
  * int96 (legacy Spark timestamps), float/double/boolean, binary (string,
  * decimal), plus nested arrays/structs/maps in the standard 3-level
  * encodings (the only forms our writers — Spark datasource and
  * GraftBatchWrite — produce). */
final class GraftPartitionReader(filePath: String, required: StructType,
    rename: Map[String, String] = Map.empty,
    deletedPositions: Array[Long] = Array.empty)
  extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(filePath))
      .withConf(new Configuration(false))
      .build()

  private var current: Group = _

  /** `_file` metadata column: provenance of every row, served from the
    * reader itself — also the join key of runtime group filtering. */
  private val fileName = UTF8String.fromString(filePath)

  // merge-on-read skip cursor: rows arrive in file order, so one pointer
  // into the SORTED deleted-position array replaces any per-row lookup
  private var rowIdx: Long = -1L
  private var delIdx: Int = 0

  // EXISTS_DEFAULT fill for columns ABSENT from this file (added later
  // with a DEFAULT): internal-format values, aligned to `required`; null
  // where no default — matching Spark's own file-source behavior
  private val existsDefaults: Array[Any] =
    org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .existenceDefaultValues(required)

  override def next(): Boolean = {
    while (true) {
      current = reader.read()
      if (current == null) return false
      rowIdx += 1
      while (delIdx < deletedPositions.length &&
          deletedPositions(delIdx) < rowIdx) delIdx += 1
      if (delIdx >= deletedPositions.length ||
          deletedPositions(delIdx) != rowIdx) return true
      // else: position is deleted — skip this row
    }
    false // unreachable
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    val schema: MessageType = current.getType.asInstanceOf[MessageType]
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      val fileField = rename.getOrElse(f.name, f.name)
      if (f.name == "_file") row.update(i, fileName)
      else if (!schema.containsField(fileField)) row.update(i, existsDefaults(i))
      else {
        val idx = schema.getFieldIndex(fileField)
        if (current.getFieldRepetitionCount(idx) == 0) row.update(i, null)
        else row.update(i, convert(current, idx, 0, f.dataType))
      }
      i += 1
    }
    row
  }

  /** Value of field `idx`, repetition `rep`, inside group `g`, as the Spark
    * internal representation of `dt`. Recurses through LIST/MAP/group
    * nesting; index-addressed, so the standard `list`/`element` and
    * `key_value` wrapper names are irrelevant. */
  private def convert(g: Group, idx: Int, rep: Int, dt: DataType): Any = {
    val ptype = g.getType.getType(idx)
    dt match {
      case IntegerType | ShortType | ByteType => g.getInteger(idx, rep)
      case LongType =>
        // files written before an int->bigint widening hold INT32
        ptype.asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.INT32 =>
            g.getInteger(idx, rep).toLong
          case _ => g.getLong(idx, rep)
        }
      case DoubleType =>
        // files written before a float->double widening hold FLOAT
        ptype.asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.FLOAT =>
            g.getFloat(idx, rep).toDouble
          case _ => g.getDouble(idx, rep)
        }
      case FloatType => g.getFloat(idx, rep)
      case BooleanType => g.getBoolean(idx, rep)
      case StringType =>
        UTF8String.fromBytes(g.getBinary(idx, rep).getBytes)
      case BinaryType => g.getBinary(idx, rep).getBytes
      case DateType => g.getInteger(idx, rep)
      case TimestampType | TimestampNTZType =>
        ptype.asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.INT96 =>
            int96ToMicros(g.getInt96(idx, rep).getBytes)
          case _ =>
            val v = g.getLong(idx, rep)
            ptype.getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS => v * 1000L
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS => v / 1000L
              case _ => v // micros
            }
        }
      case d: DecimalType =>
        ptype.asPrimitiveType().getPrimitiveTypeName match {
          case PrimitiveType.PrimitiveTypeName.INT32 =>
            Decimal(g.getInteger(idx, rep).toLong, d.precision, d.scale)
          case PrimitiveType.PrimitiveTypeName.INT64 =>
            Decimal(g.getLong(idx, rep), d.precision, d.scale)
          case _ =>
            val bytes = g.getBinary(idx, rep).getBytes
            Decimal(BigDecimal(BigInt(bytes), d.scale), d.precision, d.scale)
        }
      case ArrayType(et, _) =>
        // 3-level LIST: this group holds one repeated wrapper (field 0),
        // each wrapper holds one optional element (field 0).
        val listG = g.getGroup(idx, rep)
        val n = listG.getFieldRepetitionCount(0)
        val out = new Array[Any](n)
        var k = 0
        while (k < n) {
          val entry = listG.getGroup(0, k)
          out(k) =
            if (entry.getFieldRepetitionCount(0) == 0) null
            else convert(entry, 0, 0, et)
          k += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case st: StructType =>
        val sg = g.getGroup(idx, rep)
        val gt = sg.getType
        val out = new GenericInternalRow(st.length)
        var k = 0
        while (k < st.length) {
          val fn = st.fields(k).name
          if (!gt.containsField(fn)) out.update(k, null)
          else {
            val fi = gt.getFieldIndex(fn)
            if (sg.getFieldRepetitionCount(fi) == 0) out.update(k, null)
            else out.update(k, convert(sg, fi, 0, st.fields(k).dataType))
          }
          k += 1
        }
        out
      case MapType(kt, vt, _) =>
        // MAP: repeated key_value wrapper (field 0) with required key
        // (field 0) and optional value (field 1).
        val mapG = g.getGroup(idx, rep)
        val n = mapG.getFieldRepetitionCount(0)
        val keys = new Array[Any](n)
        val vals = new Array[Any](n)
        var k = 0
        while (k < n) {
          val kv = mapG.getGroup(0, k)
          keys(k) = convert(kv, 0, 0, kt)
          vals(k) =
            if (kv.getFieldRepetitionCount(1) == 0) null
            else convert(kv, 1, 0, vt)
          k += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
          new org.apache.spark.sql.catalyst.util.GenericArrayData(vals))
      case other =>
        throw new UnsupportedOperationException(
          s"row-level operations on column type $other are not supported yet")
    }
  }

  /** INT96 legacy timestamp: 8 bytes nanos-of-day (LE) + 4 bytes julian
    * day (LE) → micros since epoch. */
  private def int96ToMicros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    val epochDay = julianDay - 2440588L
    epochDay * 86400L * 1000000L + nanosOfDay / 1000L
  }

  override def close(): Unit = reader.close()
}
