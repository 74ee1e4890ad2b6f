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
/** One equality-delete file a reader must apply: tuples at `path` hold key
  * VALUES over `cols` (physical names); rows of data files with commit
  * sequence < `seq` die on key match. Resolved to concrete types by the
  * reader factory executor-side. */
final case class EqDeleteRef(path: String, seq: Long, cols: Seq[String])

/** @param deletedPositions sorted 0-based row indexes (merge-on-read
  *                         position deletes) the reader must skip — the
  *                         small-backlog fast path (driver-built index)
  * @param posDeleteFiles   position-delete files whose tuple range covers
  *                         this data file — the large-backlog path: the
  *                         reader loads its OWN positions from these with
  *                         an exact `file_path` parquet filter (row-group +
  *                         page pruning on the sorted column), so no tuple
  *                         ever materializes on the driver
  * @param eqDeletes        equality-delete files applying to this data file
  *                         (already filtered to fileSeq < delete.seq);
  *                         applied by per-row key probing against an
  *                         executor-cached tuple set — never converted to
  *                         positions on the driver, because one key may
  *                         match an unbounded number of rows */
final case class GraftInputPartition(
    filePath: String,
    deletedPositions: Array[Long] = Array.empty,
    posDeleteFiles: Seq[String] = Seq.empty,
    eqDeletes: Seq[EqDeleteRef] = Seq.empty) extends InputPartition

final class GraftBatchScan(
    snapshot: Snapshot,
    store: SnapshotStore,
    required: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter],
    onRuntimePrune: Seq[DataFile] => Unit = _ => ())
  extends Scan with Batch with SupportsReportStatistics
  with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {

  // chunk-level (manifest-list) pruning first, then per-file
  private[lake] lazy val prunedFiles: Seq[DataFile] = {
    val phys = filters.toIndexedSeq.map(
      SchemaNames.renameFilter(_, SchemaNames.renameMap(snapshot.schema)))
    StatsPruner.prune(store.filesForScan(snapshot, phys), phys,
      snapshot.partitionSpec)
  }

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
    // merge-on-read: each reader must skip its file's deleted rows so COW
    // rewrites never resurrect them. Position deletes ride in the
    // partitions as concrete index arrays while the backlog is small
    // (driver cost capped by graft.cow.driver-tuple-cap); above the cap
    // the readers load their own positions executor-side, pruned by each
    // delete file's footer name-range. Equality deletes ALWAYS apply
    // executor-side (per-row key probe): their tuple files are small, but
    // the rows they match are unbounded, so a driver-side conversion to
    // positions cannot be capped.
    val spark = org.apache.spark.sql.SparkSession.active
    val files = currentFiles
    val pos = snapshot.deleteFiles.filter(_.kind == "position")
    val eq = snapshot.deleteFiles.filter(_.kind == "equality")
    val eqRefs = eq.map(e => EqDeleteRef(
      store.tableDir.resolve(e.path).toString, e.seq, e.equalityColumns))
    def eqFor(f: DataFile): Seq[EqDeleteRef] = eqRefs.filter(f.seq < _.seq)

    val posTuples = pos.map(_.rowCount).sum
    if (posTuples <= PositionDeletes.driverTupleCap(spark)) {
      val posByName: Map[String, Array[Long]] =
        PositionDeletes.positionsByFileName(spark, store, pos, files)
      files.map { f =>
        GraftInputPartition(
          store.tableDir.resolve(f.path).toString,
          posByName.getOrElse(PositionDeletes.fileName(f.path), Array.empty),
          Seq.empty, eqFor(f)): InputPartition
      }.toArray
    } else {
      // O(#delete files) footer reads on the driver, zero tuples
      val ranged = pos.map(d =>
        (PositionDeletes.nameRange(store, d),
          store.tableDir.resolve(d.path).toString))
      files.map { f =>
        val name = PositionDeletes.fileName(f.path)
        val covering = ranged.collect {
          case ((lo, hi), p) if lo <= name && name <= hi => p
        }
        GraftInputPartition(store.tableDir.resolve(f.path).toString,
          Array.empty, covering, eqFor(f)): InputPartition
      }.toArray
    }
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
    s"GraftBatchScan[v${snapshot.version}, files=${prunedFiles.size}/${snapshot.fileCount}]"
}

/** One resolved equality-delete probe: tuple file + key columns (physical
  * names, as stored in both the tuple file and the data files) + the
  * CURRENT Spark types to convert both sides into (so files written before
  * a type widening still compare in one domain). */
final case class EqProbeSpec(path: String, cols: Seq[String], types: Seq[DataType])

final class GraftReaderFactory(requiredJson: String, tableSchemaJson: String)
  extends PartitionReaderFactory {
  // parsed once per (deserialized) factory instance, not once per file —
  // a rewrite over thousands of files calls createReader per partition
  @transient private lazy val required: StructType =
    DataType.fromJson(requiredJson).asInstanceOf[StructType]
  @transient private lazy val tableSchema: StructType =
    DataType.fromJson(tableSchemaJson).asInstanceOf[StructType]
  // files store PHYSICAL column names; the projection uses logical ones
  @transient private lazy val rename: Map[String, String] =
    SchemaNames.renameMap(tableSchema)
  @transient private lazy val physTypes: Map[String, DataType] =
    tableSchema.fields.map(f => SchemaNames.physicalName(f) -> f.dataType).toMap

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftInputPartition]
    val eqSpecs = p.eqDeletes.map { r =>
      val types = r.cols.map(c => physTypes.getOrElse(c,
        throw new IllegalStateException(
          s"equality-delete column '$c' no longer exists in the table " +
            "schema; run rewrite_deletes before dropping delete-key columns")))
      EqProbeSpec(r.path, r.cols, types)
    }
    new GraftPartitionReader(p.filePath, required, rename, p.deletedPositions,
      p.posDeleteFiles, eqSpecs)
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
    deletedPositions: Array[Long] = Array.empty,
    posDeleteFiles: Seq[String] = Seq.empty,
    eqSpecs: Seq[EqProbeSpec] = Seq.empty)
  extends PartitionReader[InternalRow] {

  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new HPath(filePath))
      .withConf(new Configuration(false))
      .build()

  private var current: Group = _

  /** `_file` metadata column: provenance of every row, served from the
    * reader itself — also the join key of runtime group filtering. */
  private val fileName = UTF8String.fromString(filePath)

  /** Large-backlog path: load THIS file's deleted positions from the
    * covering delete files, executor-side. The exact-path predicate rides
    * into parquet-mr's row-group/page pruning — tuple files are sorted by
    * the canonical `data/<name>` path, so only the few pages naming this
    * file are read, and the driver never holds a tuple. */
  private def loadOwnPositions(): Array[Long] = {
    import org.apache.parquet.filter2.compat.FilterCompat
    import org.apache.parquet.filter2.predicate.FilterApi
    import org.apache.parquet.io.api.Binary
    val mine = "data/" + PositionDeletes.fileName(filePath)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    posDeleteFiles.foreach { p =>
      val r = ParquetReader.builder(new GroupReadSupport(), new HPath(p))
        .withConf(new Configuration(false))
        .withFilter(FilterCompat.get(FilterApi.eq(
          FilterApi.binaryColumn(PositionDeletes.FilePathCol),
          Binary.fromString(mine))))
        .build()
      try {
        var g = r.read()
        while (g != null) {
          buf += g.getLong(PositionDeletes.PosCol, 0)
          g = r.read()
        }
      } finally r.close()
    }
    val arr = buf.distinct.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  // merge-on-read skip cursor: rows arrive in file order, so one pointer
  // into the SORTED deleted-position array replaces any per-row lookup
  private val deleted: Array[Long] =
    if (posDeleteFiles.isEmpty) deletedPositions else loadOwnPositions()
  private var rowIdx: Long = -1L
  private var delIdx: Int = 0

  // EXISTS_DEFAULT fill for columns ABSENT from this file (added later
  // with a DEFAULT): internal-format values, aligned to `required`; null
  // where no default — matching Spark's own file-source behavior
  private val existsDefaults: Array[Any] =
    org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
      .existenceDefaultValues(required)

  /** Equality-delete probes, resolved against THIS file's schema on the
    * first row: key field indexes + target types + the executor-cached
    * tuple set. A file lacking a key column predates the column — its key
    * value is NULL, which never equals anything in SQL, so the whole group
    * is dropped for this file. */
  private var eqProbes: Array[(Array[Int], Array[DataType], java.util.HashSet[Seq[Any]])] = null
  private def resolveEqProbes(schema: MessageType): Unit = {
    eqProbes = eqSpecs.iterator.flatMap { s =>
      if (s.cols.exists(c => !schema.containsField(c))) None
      else Some((s.cols.map(schema.getFieldIndex).toArray, s.types.toArray,
        EqDeleteTupleCache.get(s.path, s.cols, s.types)))
    }.toArray
  }

  /** True iff the current row's key matches a live equality-delete tuple
    * (NULL key components never match, per SQL equality). */
  private def eqMatched(): Boolean = {
    var gi = 0
    while (gi < eqProbes.length) {
      val (idxs, types, set) = eqProbes(gi)
      val key = new Array[Any](idxs.length)
      var i = 0
      var ok = true
      while (ok && i < idxs.length) {
        if (current.getFieldRepetitionCount(idxs(i)) == 0) ok = false
        else key(i) = GroupReadValues.normKey(
          GroupReadValues.convert(current, idxs(i), 0, types(i)))
        i += 1
      }
      if (ok && set.contains(
          scala.collection.immutable.ArraySeq.unsafeWrapArray(key)))
        return true
      gi += 1
    }
    false
  }

  override def next(): Boolean = {
    while (true) {
      current = reader.read()
      if (current == null) return false
      rowIdx += 1
      while (delIdx < deleted.length && deleted(delIdx) < rowIdx) delIdx += 1
      val posDeleted = delIdx < deleted.length && deleted(delIdx) == rowIdx
      if (!posDeleted) {
        if (eqProbes == null && eqSpecs.nonEmpty)
          resolveEqProbes(current.getType.asInstanceOf[MessageType])
        if (eqSpecs.isEmpty || !eqMatched()) return true
      }
      // else: row is deleted — skip it
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
        else row.update(i, GroupReadValues.convert(current, idx, 0, f.dataType))
      }
      i += 1
    }
    row
  }

  override def close(): Unit = reader.close()
}

/** Parquet-mr `Group` → Spark internal value conversion, shared by the COW
  * data reader and the equality-delete tuple loader (both must land in the
  * same value domain for key probing to be exact). */
private[lake] object GroupReadValues {

  /** Normalize a converted value for use inside a hash key: byte arrays
    * use reference equality, so wrap them; -0.0 folds to 0.0 so the probe
    * matches Spark's join semantics (NormalizeFloatingNumbers treats them
    * equal, boxed equality does not — a -0.0-keyed row must still die to
    * a 0.0 delete tuple exactly like on the anti-join read path); NaN is
    * already self-equal for boxed Double/Float. Everything else the
    * internal representations (UTF8String, boxed primitives, Decimal)
    * define value equality for. */
  def normKey(v: Any): Any = v match {
    case b: Array[Byte] => scala.collection.immutable.ArraySeq.unsafeWrapArray(b)
    case d: java.lang.Double if d.doubleValue() == 0.0 => java.lang.Double.valueOf(0.0)
    case f: java.lang.Float if f.floatValue() == 0.0f => java.lang.Float.valueOf(0.0f)
    case other => other
  }

  /** Value of field `idx`, repetition `rep`, inside group `g`, as the Spark
    * internal representation of `dt`. Recurses through LIST/MAP/group
    * nesting; index-addressed, so the standard `list`/`element` and
    * `key_value` wrapper names are irrelevant. */
  def convert(g: Group, idx: Int, rep: Int, dt: DataType): Any = {
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
}

/** Executor-local cache of equality-delete tuple sets. Delete files are
  * immutable and UUID-named, so an entry never goes stale; the cap only
  * bounds memory in long-lived executors. One load per executor instead of
  * one per task — O(executors × tuple bytes) IO, not O(tasks × …).
  * Access-ordered LRU (like BloomProbe): more live tuple files than the
  * cap must evict the coldest entries, not clear the world while
  * concurrent tasks are mid-probe. */
private[lake] object EqDeleteTupleCache {
  private val MaxEntries = 64
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, java.util.HashSet[Seq[Any]]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.HashSet[Seq[Any]]])
          : Boolean = size() > MaxEntries
    })

  def get(path: String, cols: Seq[String],
      types: Seq[DataType]): java.util.HashSet[Seq[Any]] = {
    // key includes the types: the same tuple file probed after a type
    // widening must convert into the NEW domain, not hit the old entry
    val key = path + "|" + types.map(_.catalogString).mkString(",")
    val hit = cache.get(key)
    if (hit != null) return hit
    // racing loaders are idempotent — last put wins, both correct
    val loaded = load(path, cols, types)
    cache.put(key, loaded)
    loaded
  }

  private def load(path: String, cols: Seq[String],
      types: Seq[DataType]): java.util.HashSet[Seq[Any]] = {
    val set = new java.util.HashSet[Seq[Any]]()
    val reader = ParquetReader.builder(new GroupReadSupport(), new HPath(path))
      .withConf(new Configuration(false))
      .build()
    try {
      var idxs: Array[Int] = null
      var g = reader.read()
      while (g != null) {
        if (idxs == null) {
          val schema = g.getType.asInstanceOf[MessageType]
          idxs = cols.map(schema.getFieldIndex).toArray
        }
        val key = new Array[Any](idxs.length)
        var i = 0
        var ok = true
        while (ok && i < idxs.length) {
          // a NULL key component can never equal anything (SQL) — the
          // tuple is dead weight, skip it
          if (g.getFieldRepetitionCount(idxs(i)) == 0) ok = false
          else key(i) = GroupReadValues.normKey(
            GroupReadValues.convert(g, idxs(i), 0, types(i)))
          i += 1
        }
        if (ok) set.add(scala.collection.immutable.ArraySeq.unsafeWrapArray(key))
        g = reader.read()
      }
    } finally reader.close()
    set
  }
}
