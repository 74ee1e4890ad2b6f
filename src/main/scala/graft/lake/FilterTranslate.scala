package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, lit, not => fnot}
import org.apache.spark.sql.sources._

/** V1 source Filter → Column translation, used to (a) re-apply pushed
  * filters inside the delegated parquet read so row-group/page pruning
  * still happens there, and (b) build copy-on-write DELETE conditions. */
object FilterTranslate {

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, p)   => Some(col(a).startsWith(p))
    case StringEndsWith(a, p)     => Some(col(a).endsWith(p))
    case StringContains(a, p)     => Some(col(a).contains(p))
    case AlwaysTrue()             => Some(lit(true))
    case AlwaysFalse()            => Some(lit(false))
    case And(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(fnot)
    case _      => None
  }

  /** AND of all translatable filters (untranslatable ones are dropped —
    * callers must only use this where that is conservative). */
  def conjunction(filters: Seq[Filter]): Option[Column] =
    filters.flatMap(toColumn(_)).reduceOption(_ && _)
}
