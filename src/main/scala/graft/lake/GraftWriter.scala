package graft.lake

import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical write path: stage parquet → collect per-file stats → move into
  * `data/` → atomic snapshot commit (SURVEY.md §3.3).
  *
  * Partitioned tables: the partition VALUE is computed into synthetic
  * `__gp<i>` columns and the staging write uses `partitionBy(__gp*)`, so
  * every staged file belongs to exactly one partition tuple (read back from
  * its directory path). The synthetic columns are dropped by partitionBy;
  * all ORIGINAL columns (including the transform's source column) stay in
  * the data file, so reads need no partition-value reconstruction.
  *
  * Stats are collected with one Spark aggregation over the staged data
  * grouped by `input_file_name()` — at 100 TB you would read parquet
  * footers instead (constant work per file, no data re-read); the snapshot
  * format is identical either way.
  */
object GraftWriter {

  private val PartColPrefix = "__gp"

  /** Columns eligible for min/max stats (atomic comparable types). */
  private def statFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => f.dataType match {
      case _: NumericType | StringType | DateType | TimestampType => true
      case _ => false
    })

  private def normalizeStat(v: Any): Option[String] = v match {
    case null => None
    case t: java.sql.Timestamp =>
      // floorDiv, not /: truncation mis-rounds pre-1970 timestamps (must
      // match StatsPruner.normalize exactly or stats and literals disagree)
      Some((Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000).toString)
    case i: java.time.Instant =>
      Some((i.getEpochSecond * 1000000L + i.getNano / 1000).toString)
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toString)
    case d: java.time.LocalDate => Some(d.toEpochDay.toString)
    case other => Some(String.valueOf(other))
  }

  /** Write `df` as new data files of the table; returns the DataFile
    * entries (paths relative to the table dir). */
  def writeFiles(
      spark: SparkSession,
      store: SnapshotStore,
      schema: StructType,
      spec: Seq[PartitionField],
      df: DataFrame): Seq[DataFile] = {

    val staging = store.tableDir.resolve(s".staging-${UUID.randomUUID()}")
    try {
      // Align to table schema by name (Spark has already resolved/ordered
      // for SQL inserts; this also covers direct API writes) + cast.
      val aligned = df.select(schema.fields.map(f =>
        col(f.name).cast(f.dataType)).toIndexedSeq: _*)

      val partCols = spec.zipWithIndex.map { case (f, i) => s"$PartColPrefix$i" }
      val withParts = spec.zipWithIndex.foldLeft(aligned) { case (d, (f, i)) =>
        d.withColumn(s"$PartColPrefix$i",
          coalesce(PartitionTransforms.valueColumn(f), lit("__null__")))
      }
      if (spec.nonEmpty)
        withParts.write.partitionBy(partCols: _*).parquet(staging.toString)
      else withParts.write.parquet(staging.toString)

      // One aggregation pass for per-file row counts + column stats.
      val sf = statFields(schema)
      val aggs =
        count(lit(1)).as("__cnt") +:
          sf.flatMap(f => Seq(
            min(col(f.name)).as(s"__min_${f.name}"),
            max(col(f.name)).as(s"__max_${f.name}"),
            sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"__nc_${f.name}")))
      val statRows = spark.read.schema(addPartCols(schema, partCols))
        .parquet(staging.toString)
        .groupBy(input_file_name().as("__file"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()

      val statsByPath: Map[String, (Long, Map[String, ColumnStats])] =
        statRows.map { r =>
          val stats = sf.map { f =>
            f.name -> ColumnStats(
              normalizeStat(r.getAs[Any](s"__min_${f.name}")),
              normalizeStat(r.getAs[Any](s"__max_${f.name}")),
              Option(r.getAs[Long](s"__nc_${f.name}")))
          }.toMap
          fileKey(r.getAs[String]("__file")) ->
            (r.getAs[Long]("__cnt"), stats)
        }.toMap

      // Move staged files into data/, deriving partition values from the
      // hive-style staging layout.
      val staged = Files.walk(staging).iterator().asScala
        .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
        .toSeq
      staged.map { p =>
        val rel = staging.relativize(p).toString
        val pvs: Map[String, String] = rel.split('/').dropRight(1)
          .flatMap { seg =>
            seg.split("=", 2) match {
              case Array(k, v) if k.startsWith(PartColPrefix) =>
                val idx = k.stripPrefix(PartColPrefix).toInt
                val dec = unescapePathName(v)
                Some(spec(idx).name -> dec)
              case _ => None
            }
          }.toMap
        val newName = s"${UUID.randomUUID()}.parquet"
        val target = store.dataDir.resolve(newName)
        val size = Files.size(p)
        val (cnt, stats) = statsByPath.getOrElse(p.toString,
          (countRowsFallback(spark, p), Map.empty[String, ColumnStats]))
        Files.move(p, target, StandardCopyOption.ATOMIC_MOVE)
        DataFile(s"data/$newName", cnt, size, pvs, stats)
      }
    } finally {
      if (Files.exists(staging)) {
        Files.walk(staging).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
      }
    }
  }

  /** Inverse of Hive/Spark `escapePathName`: decode ONLY %XX escapes.
    * URLDecoder is wrong here — it maps a literal '+' to a space, but Hive
    * path escaping never encodes '+', so a partition value containing '+'
    * would be recorded wrong and equality pruning would skip its file. */
  private[lake] def unescapePathName(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val code =
          try Integer.parseInt(s.substring(i + 1, i + 3), 16)
          catch { case _: NumberFormatException => -1 }
        if (code >= 0) { sb.append(code.toChar); i += 3 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def addPartCols(schema: StructType, partCols: Seq[String]): StructType =
    partCols.foldLeft(schema)((s, c) => s.add(c, StringType, nullable = true))

  /** `input_file_name()` returns a URI (spaces → %20, '%' → %25 …); the
    * staged-file walk sees raw filesystem paths. Decode through URI.getPath
    * so the stats join doesn't silently miss files whose partition value
    * contains URL-encodable characters (the miss cost stats + an extra
    * count() pass per file, and unpruned scans downstream). */
  private def fileKey(s: String): String =
    scala.util.Try(new java.net.URI(s).getPath).toOption.filter(_ != null)
      .getOrElse(s.stripPrefix("file://").stripPrefix("file:"))

  private def countRowsFallback(spark: SparkSession, p: Path): Long =
    spark.read.parquet(p.toString).count()

  /** Append or replace the table content with `df`. */
  def insert(
      spark: SparkSession,
      store: SnapshotStore,
      df: DataFrame,
      overwrite: Boolean): Snapshot = {
    val head = store.head().getOrElse(
      throw new IllegalStateException(s"table not initialized: ${store.tableDir}"))
    val newFiles = writeFiles(spark, store, head.schema, head.partitionSpec, df)
    store.commit { prev =>
      val p = prev.getOrElse(head)
      val base = if (overwrite) Seq.empty else p.files
      p.copy(
        timestampMs = System.currentTimeMillis(),
        operation = if (overwrite) "overwrite" else "append",
        files = base ++ newFiles,
        summary = Map(
          "added-files" -> newFiles.size.toString,
          "added-records" -> newFiles.map(_.rowCount).sum.toString,
          "total-files" -> (base.size + newFiles.size).toString,
          "total-records" -> (base ++ newFiles).map(_.rowCount).sum.toString))
    }
  }
}
