package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent summation of floating-point terms (VERDICT r5 #1).
  *
  * A plain `sum(doubleExpr)` merges partial aggregates in task-completion
  * order, and shuffle-fetch order is nondeterministic — so the low bits of
  * the result differ run to run, and a `round(...)` sitting on a rounding
  * boundary flips its last digit (the r5 `q_importance_weights` driver
  * flake). The fix used across the curation oracles: quantize each term to
  * an integer number of 1e-9 units with `floor(term * 1e9 + 0.5)` and sum
  * the resulting longs. Integer addition is associative and commutative,
  * so the sum is bit-identical under ANY partitioning, merge order, or
  * engine — the DuckDB oracles use the literal same form
  * (`CAST(floor(term * 1e9 + 0.5) AS BIGINT)`), which makes the two
  * engines agree exactly, not just to a tolerance.
  *
  * `floor(x + 0.5)` rather than `round(x)`: floor is exact on doubles and
  * has no tie-break mode, so cross-engine agreement needs nothing beyond
  * IEEE 754 (verified: DuckDB and the JVM produce the same double for the
  * same expression tree over the same inputs).
  *
  * Bounds: quantization is exact while |term| * 1e9 stays inside double's
  * integer range (|term| < 9e6 — log-ratio / probability terms here are
  * O(10-1e4)); the long sum is exact while |Σ| < 2^63 (callers sum at most
  * ~1e6 terms of ≤ ~1e13 — 1e19 headroom is never approached per GROUP,
  * and every use here is per-document / per-source, not corpus-global).
  * Quantization error is ≤ 5e-10 per term — far below every oracle's
  * 2-to-6-decimal display rounding for the group sizes involved (≤ ~1e4
  * terms → ≤ 5e-6 absolute).
  *
  * 100 TB note: this is a plain long-sum hash aggregate — map-side
  * combinable, mergeable in any order, no collected lists, no per-group
  * sort. Determinism costs nothing at scale.
  */
object ExactSum {

  /** 1e-9-unit quantization scale shared with every oracle twin. */
  final val Scale = 1e9

  /** Quantize one double term to long 1e-9 units: floor(term*1e9 + 0.5).
    * Spark's `floor` on a double column already yields LongType. */
  def quantize(term: Column): Column =
    floor(term * lit(Scale) + lit(0.5))

  /** Aggregate: order-independent exact sum of the quantized terms. */
  def qsum(term: Column): Column = sum(quantize(term))

  /** De-quantize an aggregated sum back to double units — `CAST(s AS
    * DOUBLE) / 1e9`, the literal form the oracle twins use, so any
    * further shared arithmetic stays bit-identical across engines. */
  def value(s: Column): Column = s.cast("double") / lit(Scale)
}
