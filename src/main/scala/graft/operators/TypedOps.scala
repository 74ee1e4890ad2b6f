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

  /** Typed twin of [[ExactSum]] for money: each term is an exact 4-decimal
    * value (2dp price × 2dp discount complement), quantized to a LONG in
    * 1e-4 units and summed — bit-identical under any partial/merge order,
    * equal to the oracle's literal integer-sum form. */
  private def sumE4Of(f: LineItem => Double): Aggregator[LineItem, Long, Long] =
    new Aggregator[LineItem, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: LineItem): Long =
        b + math.floor(f(a) * 1e4 + 0.5).toLong
      override def merge(x: Long, y: Long): Long = x + y
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** Typed grouped aggregation with custom Aggregators. */
  val qTypedAgg: Q = Q(
    "q_typed_agg",
    """SELECT l_returnflag,
              round(sum(l_quantity), 2) AS sum_qty,
              CAST((sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 1e4 + 0.5) AS BIGINT)) + 50) // 100
                   AS DOUBLE) / 100 AS revenue
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    import s.implicits._
    val ds = Tables.lineitem(s, d)
      .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
      .as[LineItem]
    // quantity sums integer-valued doubles (exact at any order); revenue
    // sums exact 1e-4-unit longs (sumE4Of) and rounds to cents in pure
    // INTEGER arithmetic ((S+50) div 100) — a 4-decimal sum sits on an
    // exact .xx50 rounding tie about 1% of the time, and round(double, 2)
    // resolves decimal ties differently across engines (revenue > 0 here,
    // so half-up needs no sign handling)
    ds.groupByKey(_.l_returnflag)
      .agg(
        sumOf(_.l_quantity).toColumn.name("raw_qty"),
        sumE4Of(li => li.l_extendedprice * (1 - li.l_discount))
          .toColumn.name("rev4"))
      .toDF("l_returnflag", "raw_qty", "rev4")
      .select(col("l_returnflag"),
        round(col("raw_qty"), 2).as("sum_qty"),
        (expr("(rev4 + 50) div 100").cast("double") / 100).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Raw HLL++ sketch next to the exact count — the 100 TB production
    * shape: constant-memory mergeable distinct counting. Pre-dedupes
    * (group, key) instead of countDistinct: HLL insertion is idempotent,
    * so the sketch over the distinct pairs is IDENTICAL to the sketch
    * over the raw multiset — but the plan loses the Expand (which doubles
    * scanned rows for mixed distinct/non-distinct aggs) and the shuffle
    * carries map-side-deduped pairs, not every row. Estimates differ from
    * DuckDB's HLL, so the raw values never enter hashed output bytes;
    * [[qApproxDistinct]] certifies them. */
  private[graft] def hllSketch(
      s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_partkey")
      .distinct()
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct("l_partkey", 0.02).as("approx_parts"),
        count(lit(1)).as("exact_parts"))

  /** approx_count_distinct, ORACLE-PROMOTED (VERDICT r7 #8 pattern, as
    * q_percentiles_tdigest): the query runs the HLL++ sketch AND the
    * exact count in ONE aggregate pass ([[hllSketch]]) and outputs the
    * exact counts plus a `sketch_within_rsd` flag — estimate within 5×
    * its configured rsd (0.02 → 10%, ≥ 1 absolute) per group. The oracle
    * twin emits literal `true`, so ANY drift flips the flag and fails the
    * hash compare at every gate run and scale factor — the certification
    * lives in the COMPARED OUTPUT, not in a driver-side throw. Fully lazy
    * by design (ADVICE r8): constructing the DataFrame runs nothing, so
    * plan-shape specs and explain() stay free. */
  val qApproxDistinct: Q = Q(
    "q_approx_distinct",
    """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS exact_parts,
              true AS sketch_within_rsd
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    hllSketch(s, d)
      .withColumn("sketch_within_rsd",
        abs(col("approx_parts") - col("exact_parts")).cast("double") <=
          greatest(lit(1.0), col("exact_parts").cast("double") * lit(0.10)))
      .select(col("l_returnflag"), col("exact_parts"), col("sketch_within_rsd"))
      .orderBy("l_returnflag")
  }

  val all: Seq[Q] = Seq(qTypedAgg, qApproxDistinct)
}
