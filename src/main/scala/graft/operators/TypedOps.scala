package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Typed Dataset API coverage (SURVEY.md design principle: `Dataset[T]`
  * with case-class Encoders where type safety helps). The aggregation uses
  * custom `Aggregator`s — which run as proper partial+final aggregates
  * (map-side combine, mergeable buffers), unlike `mapGroups` which ships
  * whole rows — so the typed form keeps the scalable plan shape of the
  * untyped `groupBy(...).agg(...)`. */
object TypedOps {

  case class LineItem(
      l_returnflag: String, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double)

  private def sumOf(f: LineItem => Double): Aggregator[LineItem, Double, Double] =
    new Aggregator[LineItem, Double, Double] {
      override def zero: Double = 0.0
      override def reduce(b: Double, a: LineItem): Double = b + f(a)
      override def merge(x: Double, y: Double): Double = x + y
      override def finish(r: Double): Double = r
      override def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  /** Typed grouped aggregation with custom Aggregators. */
  val qTypedAgg: Q = Q(
    "q_typed_agg",
    """SELECT l_returnflag,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    import s.implicits._
    val ds = Tables.lineitem(s, d)
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .as[LineItem]
    ds.groupByKey(_.l_returnflag)
      .agg(
        sumOf(_.l_quantity).toColumn.name("raw_qty"),
        sumOf(li => li.l_extendedprice * (1 - li.l_discount)).toColumn.name("raw_rev"))
      .toDF("l_returnflag", "raw_qty", "raw_rev")
      .select(col("l_returnflag"),
        round(col("raw_qty"), 2).as("sum_qty"),
        round(col("raw_rev"), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** approx_count_distinct (HLL++): the constant-memory distinct count for
    * 100 TB cardinalities. The estimate differs from DuckDB's HLL, so the
    * oracle checks the EXACT counts alongside and ScalaTest bounds the
    * estimate's relative error instead. */
  val qApproxDistinct: Q = Q.noOracle("q_approx_distinct") { (s, d) =>
    // pre-dedupe (group, key) instead of countDistinct: HLL insertion is
    // idempotent, so the sketch over the distinct pairs is IDENTICAL to
    // the sketch over the raw multiset — but the plan loses the Expand
    // (which doubles scanned rows for mixed distinct/non-distinct aggs)
    // and the shuffle carries map-side-deduped pairs, not every row
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_partkey")
      .distinct()
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
        count(lit(1)).as("exact_parts"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(qTypedAgg, qApproxDistinct)
}
