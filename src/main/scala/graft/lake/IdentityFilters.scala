package graft.lake

import org.apache.spark.sql.sources._

/** EXACT per-file evaluation of predicates over identity partition
  * columns. An identity-partitioned column is CONSTANT within each data
  * file, so a predicate over it is decidable per file from the stored
  * partition value alone — not "might match" (StatsPruner's contract) but
  * "matches / doesn't". That exactness lets [[GraftScanBuilder]] claim
  * such filters as FULLY pushed: Spark drops its re-apply Filter node,
  * and — because no residual filter remains in the plan — the aggregate
  * pushdown can answer `SELECT count(*) FROM t WHERE day = X` (and its
  * GROUP BY variant) from metadata with zero data files opened.
  *
  * Exactness is only claimed when it is airtight:
  *  - column types whose stored string rendering is unambiguous:
  *    integrals, boolean, date. STRING columns are excluded — a genuine
  *    "__null__" string is indistinguishable from the writer's NULL
  *    sentinel — as are timestamp/float/decimal (rendering pitfalls,
  *    see PartitionTransforms.identityLiteral).
  *  - every live file carries a value for the referenced field: checked
  *    per file on inline snapshots, and via the [[ManifestRef.partFields]]
  *    rollup (intersection of the chunk's partition-value keys) on
  *    sharded ones — a file written before a partition-spec evolution
  *    lacks the new field and silently breaks exactness otherwise. Refs
  *    written before the rollup existed have an empty partFields and
  *    refuse, which only costs the optimization.
  *  - predicate shapes with exact Kleene (three-valued) semantics:
  *    comparisons, In, IsNull/IsNotNull, And/Or/Not. NULL file values
  *    evaluate to SQL NULL, so `NOT(day = 5)` correctly excludes a
  *    NULL-day file.
  */
object IdentityFilters {

  /** Indices into `physFilters` (PHYSICAL names) that are exactly
    * decidable per file for this snapshot. */
  def exactIndices(physFilters: Seq[Filter], snapshot: Snapshot): Set[Int] = {
    if (physFilters.isEmpty) return Set.empty
    val parsers = domainParsers(snapshot)
    val candidate = physFilters.zipWithIndex.flatMap { case (f, i) =>
      referencedIfSupported(f, parsers).map(cols => i -> cols)
    }
    if (candidate.isEmpty) return Set.empty
    val allCols = candidate.flatMap(_._2).toSet
    val carried = // fields every live file is known to carry a value for
      if (snapshot.manifests.nonEmpty)
        allCols.filter(c =>
          snapshot.manifests.forall(_.partFields.contains(c)))
      else
        allCols.filter(c =>
          snapshot.files.forall(_.partitionValues.contains(c)))
    candidate.filter(_._2.subsetOf(carried)).map(_._1).toSet
  }

  /** True iff `file` definitely satisfies every filter (callers pass only
    * filters vetted by [[exactIndices]]). A file missing a vetted value
    * (possible only if a carrier rollup lies) is KEPT — extra rows are
    * the not-wrong direction when the claim already dropped the residual
    * filter. */
  def matchesAll(file: DataFile, exact: Seq[Filter], snapshot: Snapshot)
      : Boolean = {
    if (exact.isEmpty) return true
    val parsers = domainParsers(snapshot)
    exact.forall(f =>
      try eval(file, f, parsers).contains(true)
      catch { case MissingValue => true })
  }

  private object MissingValue extends RuntimeException {
    override def fillInStackTrace(): Throwable = this
  }

  // ---------- typed domain ----------
  //
  // Values compare as Long (integrals, dates-as-epoch-days) or Boolean.
  // A parser returns None for the writer's NULL sentinel (SQL NULL).

  private def domainParsers(snapshot: Snapshot)
      : Map[String, (String => Any, Any => Option[Any])] = {
    import org.apache.spark.sql.types._
    val phys = SchemaNames.toPhysical(snapshot.schema)
    snapshot.partitionSpec.iterator
      .filter(_.transform == "identity")
      .flatMap { pf =>
        phys.fields.find(_.name == pf.source).flatMap { col =>
          val pair: Option[(String => Any, Any => Option[Any])] =
            col.dataType match {
              case ByteType | ShortType | IntegerType | LongType =>
                Some(((v: String) => v.toLong, integralLit _))
              case BooleanType =>
                Some(((v: String) => v.toBoolean, booleanLit _))
              case DateType =>
                Some(((v: String) =>
                  java.time.LocalDate.parse(v).toEpochDay, dateLit _))
              case _ => None
            }
          pair.map(pf.source -> _)
        }
      }.toMap
  }

  private def integralLit(v: Any): Option[Any] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }
  private def booleanLit(v: Any): Option[Any] = v match {
    case b: Boolean => Some(b)
    case _ => None
  }
  private def dateLit(v: Any): Option[Any] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Some(d.toEpochDay)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case _ => throw new IllegalStateException(s"domain mismatch: $a vs $b")
  }

  // ---------- static supportability ----------

  /** Columns referenced, iff the whole predicate tree is exactly
    * evaluable over identity partition values. */
  private def referencedIfSupported(
      f: Filter,
      parsers: Map[String, (String => Any, Any => Option[Any])])
      : Option[Set[String]] = {
    def lit(attr: String, v: Any): Option[Any] =
      parsers.get(attr).flatMap { case (_, toLit) =>
        if (v == null) None else toLit(v)
      }
    f match {
      case EqualTo(a, v) => lit(a, v).map(_ => Set(a))
      case EqualNullSafe(a, v) =>
        if (v == null) parsers.get(a).map(_ => Set(a))
        else lit(a, v).map(_ => Set(a))
      case GreaterThan(a, v) => lit(a, v).map(_ => Set(a))
      case GreaterThanOrEqual(a, v) => lit(a, v).map(_ => Set(a))
      case LessThan(a, v) => lit(a, v).map(_ => Set(a))
      case LessThanOrEqual(a, v) => lit(a, v).map(_ => Set(a))
      case In(a, vs) =>
        // null elements are fine (Kleene handles them); every non-null
        // element must convert
        if (parsers.contains(a) && vs.forall(v => v == null || lit(a, v).isDefined))
          Some(Set(a))
        else None
      case IsNull(a) => parsers.get(a).map(_ => Set(a))
      case IsNotNull(a) => parsers.get(a).map(_ => Set(a))
      case And(l, r) => for {
        a <- referencedIfSupported(l, parsers)
        b <- referencedIfSupported(r, parsers)
      } yield a ++ b
      case Or(l, r) => for {
        a <- referencedIfSupported(l, parsers)
        b <- referencedIfSupported(r, parsers)
      } yield a ++ b
      case Not(c) => referencedIfSupported(c, parsers)
      case _ => None
    }
  }

  // ---------- Kleene evaluation ----------

  /** Three-valued evaluation against the file's partition value:
    * Some(true/false) definite, None = SQL NULL. */
  private def eval(
      file: DataFile, f: Filter,
      parsers: Map[String, (String => Any, Any => Option[Any])])
      : Option[Boolean] = {
    def value(attr: String): Option[Any] = {
      val (parse, _) = parsers(attr)
      file.partitionValues.get(attr) match {
        case Some(Spj.NullSentinel) => None
        case Some(v) => Some(parse(v))
        // vetted fields always carry a value; if one slips through,
        // abort this filter's evaluation — matchesAll keeps the file
        case None => throw MissingValue
      }
    }
    def liftCmp(attr: String, v: Any, keep: Int => Boolean): Option[Boolean] = {
      val (_, toLit) = parsers(attr)
      value(attr).map(fv => keep(cmp(fv, toLit(v).get)))
    }
    f match {
      case EqualTo(a, v) => liftCmp(a, v, _ == 0)
      case EqualNullSafe(a, v) =>
        val (_, toLit) = parsers(a)
        val fv = value(a)
        val lv = if (v == null) None else toLit(v)
        Some((fv, lv) match {
          case (None, None) => true
          case (Some(x), Some(y)) => cmp(x, y) == 0
          case _ => false
        })
      case GreaterThan(a, v) => liftCmp(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => liftCmp(a, v, _ >= 0)
      case LessThan(a, v) => liftCmp(a, v, _ < 0)
      case LessThanOrEqual(a, v) => liftCmp(a, v, _ <= 0)
      case In(a, vs) =>
        val (_, toLit) = parsers(a)
        value(a) match {
          case None => None
          case Some(fv) =>
            val hasNull = vs.contains(null)
            val hit = vs.exists(v => v != null && cmp(fv, toLit(v).get) == 0)
            if (hit) Some(true) else if (hasNull) None else Some(false)
        }
      case IsNull(a) => Some(value(a).isEmpty)
      case IsNotNull(a) => Some(value(a).nonEmpty)
      case And(l, r) => (eval(file, l, parsers), eval(file, r, parsers)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (eval(file, l, parsers), eval(file, r, parsers)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(c) => eval(file, c, parsers).map(!_)
      case _ => throw new IllegalStateException(s"unvetted filter $f")
    }
  }
}
