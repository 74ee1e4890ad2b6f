package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * One parquet file per table under the scale-factor dir. Scans go through
  * `spark.read.parquet` so Catalyst's DSv2 parquet source gives us
  * vectorized reads, filter pushdown and column pruning for free — at
  * 100 TB these would be directory-partitioned datasets and the same call
  * sites keep working (partition pruning replaces file pruning).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Ensure at least the session's default parallelism ahead of CPU-heavy
    * per-row kernel passes when the source collapsed to fewer input
    * splits (guide §2.5 "input skew — one huge unsplittable file"): a
    * single-row-group parquet file scans as ONE task no matter how many
    * cores the executor has, serializing every shingle/minhash/profile
    * kernel that runs before the first exchange. Scale-adaptive by
    * construction — a real multi-file/multi-row-group dataset already
    * scans at ≥ defaultParallelism splits and this is a no-op, so no
    * exchange is ever added at 100 TB. Round-robin repartition is
    * deterministic (local sort-before-repartition is Spark's default).
    * Applied SURGICALLY at kernel-dominant call sites only: an A/B over
    * the text pack showed blanket application on `documents` is a net
    * loss (the exchange + 32-way partials cost more than light kernels
    * save — q_word_freq 1.77×, q_dedup_exact 1.92×) while
    * kernel-dominant passes win big (q_minhash_signatures 0.64×). */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // ADVICE r11: the probe below EXECUTES upstream exchanges under AQE
    // (toRdd materializes shuffle stages), and `df.repartition(target)`
    // was a NEW QueryExecution that re-executed them — double work
    // exactly in the collapsed-input case this helper targets.
    //
    // Two widening paths (r12):
    //  - scan-only plans (leaf + Project/Filter — the common call shape):
    //    the probe materializes NOTHING, so `df.repartition` replans the
    //    scan once, codegen-fused into the exchange — reusing the probed
    //    RDD here was MEASURED SLOWER (per-row defensive copy + an unfused
    //    scan stage: q_minhash_signatures +21%).
    //  - exchange-bearing plans (e.g. the ingest window frames): build the
    //    repartition ON the probed RDD via LogicalRDD.fromDataset (stats
    //    preserved — see RddFrameBridge) — same RDD identity → the probe's
    //    materialized shuffle stages are skipped, not re-executed.
    // Caveat (ADVICE): keyless repartition sorts its input rows first,
    // which rejects MapType columns — no spread call site carries maps.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}
    val rdd = df.queryExecution.toRdd
    if (rdd.getNumPartitions >= target) df
    else {
      val scanOnly = df.queryExecution.optimizedPlan.collectFirst {
        case n if n.children.nonEmpty &&
          !n.isInstanceOf[Project] && !n.isInstanceOf[Filter] => n
      }.isEmpty
      if (scanOnly) df.repartition(target)
      else org.apache.spark.sql.graftbridge.RddFrameBridge.wrap(df, rdd)
        .repartition(target)
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) — which
    * Spark's vectorized reader rejects ([PARQUET_TYPE_ILLEGAL]) unless read
    * as raw int64 nanos (legacy.parquet.nanosAsLong) — and as plain
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ). Normalize
    * both to a session-zone TIMESTAMP column so every downstream query and
    * its DuckDB oracle see one type. ns→µs truncation is harmless for the
    * declared queries (hour/day bucketing). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      // integer DIV: `/` is double division and drifts ±1us at e18 nanos
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => raw
      // TIMESTAMP_NTZ → TIMESTAMP: sessions run UTC, so the instant is
      // unchanged and pre-existing comparisons/literals keep their meaning
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** A declared engine query: name, the Spark implementation, and (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle twin that the
  * correctness harness runs on the same parquet files.
  *
  * Column names are aliased identically on both sides (the harness sorts
  * columns by name before hashing); every query ends in a deterministic
  * total order, and floating aggregates are rounded on both sides so the
  * hash survives summation-order differences between engines.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  /** Non-SQL-expressible op → driver records a weaker rows-only check. */
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
