package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}

/** Hidden-partitioning transforms (SURVEY.md §1.3, §2.11.2): the reference
  * declares identity partitions (`iceberg_queries.ipynb:100`) and intends a
  * day-granularity derived partition (`warehouse_helpers.py:48`,
  * `PARTITIONED BY (CAST(created_at AS DATE))` — the author's spelling of
  * `days(created_at)`). We support identity / days / months / years /
  * bucket[N].
  *
  * A transform maps a source column to a STRING partition value (stored
  * per-file in the snapshot); queries never mention the partition value —
  * `StatsPruner` maps source-column predicates through the transform to
  * file pruning decisions.
  */
object PartitionTransforms {

  /** Parse Spark connector Transform[] into our spec. */
  def fromTransforms(transforms: Array[Transform]): Seq[PartitionField] =
    transforms.toSeq.map { t =>
      val src = t.references().head.fieldNames().mkString(".")
      t.name() match {
        case "identity" => PartitionField(src, "identity", src)
        case "days" | "day"     => PartitionField(s"days($src)", "days", src)
        case "months" | "month" => PartitionField(s"months($src)", "months", src)
        case "years" | "year"   => PartitionField(s"years($src)", "years", src)
        case "bucket" =>
          val n = t.arguments().collectFirst {
            case lit: org.apache.spark.sql.connector.expressions.Literal[_] =>
              lit.value().toString.toInt
          }.getOrElse(throw new IllegalArgumentException(s"bucket needs N: $t"))
          PartitionField(s"bucket_$n($src)", s"bucket[$n]", src)
        case other =>
          throw new UnsupportedOperationException(s"transform $other")
      }
    }

  def toTransforms(spec: Seq[PartitionField]): Array[Transform] =
    spec.map { f =>
      f.transform match {
        case "identity" => Expressions.identity(f.source)
        case "days"     => Expressions.days(f.source)
        case "months"   => Expressions.months(f.source)
        case "years"    => Expressions.years(f.source)
        case b if b.startsWith("bucket[") =>
          Expressions.bucket(bucketN(b), f.source)
      }
    }.toArray

  def bucketN(transform: String): Int =
    transform.stripPrefix("bucket[").stripSuffix("]").toInt

  /** Column computing the string partition value of a row. */
  def valueColumn(f: PartitionField): Column = f.transform match {
    case "identity" => col(f.source).cast("string")
    case "days"     => date_format(col(f.source), "yyyy-MM-dd")
    case "months"   => date_format(col(f.source), "yyyy-MM")
    case "years"    => date_format(col(f.source), "yyyy")
    case b if b.startsWith("bucket[") =>
      pmod(hash(col(f.source)), lit(bucketN(b))).cast("string")
  }

  /** Map a literal comparison value on the source column to the partition
    * value domain. Returns None when the transform can't translate the
    * literal (→ no pruning on that predicate). */
  def literalToPartitionValue(f: PartitionField, value: Any): Option[String] = {
    def toLocalDateTime(v: Any): Option[java.time.LocalDateTime] = v match {
      case t: java.sql.Timestamp => Some(t.toLocalDateTime)
      case d: java.sql.Date => Some(d.toLocalDate.atStartOfDay)
      case d: java.time.LocalDate => Some(d.atStartOfDay)
      case i: java.time.Instant =>
        Some(java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC))
      case _ => None
    }
    f.transform match {
      case "identity" => identityLiteral(value)
      case "days" => toLocalDateTime(value)
        .map(_.toLocalDate.toString) // yyyy-MM-dd, ISO
      case "months" => toLocalDateTime(value)
        .map(dt => f"${dt.getYear}%04d-${dt.getMonthValue}%02d")
      case "years" => toLocalDateTime(value)
        .map(dt => f"${dt.getYear}%04d")
      case _ => None // bucket: only equality handled separately
    }
  }

  /** Render an identity-partition literal in EXACTLY the representation the
    * writer stored (`cast(col, "string")`, valueColumn above). The two must
    * agree or equality pruning silently drops matching files:
    * `java.sql.Timestamp.toString` yields "…00:00:00.0" while Spark's cast
    * yields "…00:00:00", so timestamp-typed literals return None here and
    * pruning falls back to min/max stats — which are normalized to epoch
    * micros on both sides and lose nothing for identity partitions (every
    * file is constant in the column, so min==max carries the same
    * information). Dates are safe: `java.sql.Date.toString` is the ISO form
    * Spark's cast produces. */
  private def identityLiteral(value: Any): Option[String] = value match {
    case null => None
    case _: java.sql.Timestamp | _: java.time.Instant |
         _: java.time.LocalDateTime => None
    case d: java.sql.Date => Some(d.toLocalDate.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case other => Some(String.valueOf(other))
  }
}
