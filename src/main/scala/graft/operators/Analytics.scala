package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Sorts, limits, top-k, windows, set ops, scalar/date/JSON functions
  * (SURVEY.md §2.6-2.7). The reference exercises ORDER BY
  * (`iceberg_queries.ipynb:296`) and show(n) truncation
  * (`getting_started.ipynb:163`); windows/set-ops complete the declared
  * analytics surface.
  *
  * Scale notes:
  *  - Global ORDER BY uses range partitioning (sampled bounds) — scales to
  *    any size; top-k uses TakeOrderedAndProject which keeps only k rows
  *    per partition and never materializes a global sort.
  *  - Window functions shuffle once on partitionBy keys; running-sum frames
  *    are streaming (no buffering of the whole partition for sum/row_number).
  */
object Analytics {

  /** Global sort + limit (ORDER BY of `iceberg_queries.ipynb:296` + show(n)
    * truncation as an explicit LIMIT). */
  val qOrderByLimit: Q = Q(
    "q_orderby_limit",
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       FROM orders
       ORDER BY price DESC, o_orderkey
       LIMIT 100""") { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Top-k by aggregate: top 20 customers by spend. */
  val qTopkCustomers: Q = Q(
    "q_topk_customers",
    """SELECT o_custkey,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS spend,
              count(*) AS n
       FROM orders
       GROUP BY o_custkey
       ORDER BY spend DESC, o_custkey
       LIMIT 20""") { (s, d) =>
    // money accumulates in DECIMAL (exact, order-independent) — the q1
    // treatment, applied suite-wide in r6 so no rounded money hash can sit
    // on a merge-order-dependent boundary at any scale factor
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double").as("spend"), count(lit(1)).as("n"))
      .orderBy(col("spend").desc, col("o_custkey"))
      .limit(20)
  }

  /** Ranking window: top-3 orders by price within each priority class.
    * Deterministic tie-break on o_orderkey. */
  val qWindowRank: Q = Q(
    "q_window_rank",
    """SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price, rn
       FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_orderpriority
                                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
             FROM orders)
       WHERE rn <= 3
       ORDER BY o_orderpriority, rn""") { (s, d) =>
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"), col("rn"))
      .orderBy("o_orderpriority", "rn")
  }

  /** Running-sum window: cumulative spend per customer over time. Streaming
    * frame (unboundedPreceding..currentRow) — constant memory per key. */
  val qWindowRunning: Q = Q(
    "q_window_running",
    """SELECT o_custkey, o_orderkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
       FROM orders
       ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Lag/lead window: gap in days between a customer's consecutive orders. */
  val qWindowLag: Q = Q(
    "q_window_lag",
    """SELECT o_custkey, o_orderkey,
              CAST(date_diff('day',
                lag(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey),
                CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_prev
       FROM orders
       ORDER BY o_custkey, o_orderkey""") { (s, d) =>
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(col("o_orderdate").cast("date"),
          lag(col("o_orderdate").cast("date"), 1).over(w))
          .as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Set ops: UNION / INTERSECT / EXCEPT over customer-key sets. */
  val qSetOps: Q = Q(
    "q_set_ops",
    """WITH building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
            rich     AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
            with_ord AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
       SELECT 'union' AS op, count(*) AS n FROM (SELECT * FROM building UNION SELECT * FROM rich)
       UNION ALL
       SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM building INTERSECT SELECT * FROM with_ord)
       UNION ALL
       SELECT 'except' AS op, count(*) AS n FROM (SELECT * FROM rich EXCEPT SELECT * FROM with_ord)
       ORDER BY op""") { (s, d) =>
    val c = Tables.customer(s, d)
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val withOrd = Tables.orders(s, d).select(col("o_custkey").as("c_custkey")).distinct()
    val u = building.union(rich).distinct().agg(count(lit(1)).as("n"))
      .select(lit("union").as("op"), col("n"))
    val i = building.intersect(withOrd).agg(count(lit(1)).as("n"))
      .select(lit("intersect").as("op"), col("n"))
    val e = rich.except(withOrd).agg(count(lit(1)).as("n"))
      .select(lit("except").as("op"), col("n"))
    u.unionAll(i).unionAll(e).orderBy("op")
  }

  /** ROLLUP grouping sets (subtotals + grand total). NULLS FIRST pinned on
    * both sides because DuckDB defaults to NULLS LAST. */
  val qRollup: Q = Q(
    "q_rollup",
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
              round(sum(l_quantity), 2) AS qty
       FROM lineitem
       GROUP BY ROLLUP (l_returnflag, l_linestatus)
       ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""") { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** Scalar string/math functions over part (§2.7 declared set). */
  val qScalarFns: Q = Q(
    "q_scalar_fns",
    """SELECT p_partkey,
              lower(p_brand) AS brand_lc,
              upper(substring(p_name, 1, 8)) AS name_prefix,
              concat(p_brand, '/', p_type) AS brand_type,
              round(p_retailprice * 1.1, 2) AS marked_up,
              CAST(length(p_name) AS INTEGER) AS name_len,
              CAST(abs(p_size - 25) AS INTEGER) AS size_dist
       FROM part
       WHERE p_size BETWEEN 10 AND 40
       ORDER BY p_partkey""") { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_size").between(10, 40))
      .select(col("p_partkey"),
        lower(col("p_brand")).as("brand_lc"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
        round(col("p_retailprice") * 1.1, 2).as("marked_up"),
        length(col("p_name")).as("name_len"),
        abs(col("p_size") - 25).as("size_dist"))
      .orderBy("p_partkey")
  }

  /** Date functions: month truncation, year/month extraction, grouped
    * revenue by month (P7 CAST + §2.7 date fns). */
  val qDateFns: Q = Q(
    "q_date_fns",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
              CAST(year(o_orderdate) AS INTEGER) AS yr,
              CAST(month(o_orderdate) AS INTEGER) AS mo,
              count(*) AS n_orders,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS revenue
       FROM orders
       GROUP BY 1, 2, 3
       ORDER BY month""") { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(12,2)")), 2)
          .cast("double").as("revenue"))
      .orderBy("month")
  }

  /** JSON extraction from the events.props payload + time bucketing of the
    * ns-precision event timestamps (cast to date + hour for cross-engine
    * stability). */
  val qJsonEvents: Q = Q(
    "q_json_events",
    """SELECT event_type,
              CAST(ts AS DATE) AS day,
              CAST(extract(hour FROM ts) AS INTEGER) AS hr,
              count(*) AS n,
              CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_value,
              CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
       FROM events
       GROUP BY 1, 2, 3
       ORDER BY event_type, day, hr""") { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"),
        hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(12,2)")), 2)
          .cast("double").as("total_value"),
        sum(get_json_object(col("props"), "$.k").cast("int")).as("sum_k"))
      .orderBy("event_type", "day", "hr")
  }

  /** Exact percentiles (median/p90) per group — quantile_cont's linear
    * interpolation computed by RANK rather than by materializing each
    * group's values: `percentile()` holds every value of a group in one
    * aggregation buffer (OOM at 100 TB); here the heavy pass is a
    * map-side-combinable count per (group, value), the ordered
    * cumulative-rank window runs over DISTINCT values only (externally
    * sorted, spillable), and the interpolation endpoints fall out of a
    * rank-range test.
    *
    * Determinism (ADVICE r5 #4 — one sf0.001 p50 sat on a .005 rounding
    * boundary and the float `lo + frac·(hi-lo)` form disagreed across
    * engines by an ulp): prices are 2-decimal money, so both sides now
    * recover exact integer CENTS with floor(x·100 + 0.5) and interpolate
    * as integers — p50 in half-cents (lo+hi, round-half-up = +1 div 2),
    * p90 in deci-cents (frac = (9n+1) mod 10 exactly; round-half-up = +5
    * div 10). No floating arithmetic touches the value until one final
    * identical CAST/100, so the result is bit-equal on any engine at any
    * scale factor. Agrees with round(quantile_cont(·), 2) except exactly
    * on those ambiguous half-ulp boundaries, where float evaluation order
    * is undefined anyway. */
  val qPercentiles: Q = Q(
    "q_percentiles",
    """WITH v AS (SELECT l_returnflag AS flag,
                         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
                  FROM lineitem),
       b AS (SELECT flag, c, count(*) AS cnt FROM v GROUP BY 1, 2),
       r AS (SELECT flag, c, cnt,
                    sum(cnt) OVER (PARTITION BY flag ORDER BY c) AS hi_rk
             FROM b),
       r2 AS (SELECT flag, c, hi_rk, hi_rk - cnt + 1 AS lo_rk FROM r),
       t AS (SELECT flag, sum(cnt) AS n FROM b GROUP BY flag),
       e AS (SELECT r2.flag,
                    sum(CASE WHEN lo_rk <= (t.n + 1) // 2
                              AND (t.n + 1) // 2 <= hi_rk THEN c ELSE 0 END) AS lo50,
                    sum(CASE WHEN lo_rk <= (t.n + 2) // 2
                              AND (t.n + 2) // 2 <= hi_rk THEN c ELSE 0 END) AS hi50,
                    sum(CASE WHEN lo_rk <= (9 * t.n + 1) // 10
                              AND (9 * t.n + 1) // 10 <= hi_rk THEN c ELSE 0 END) AS lo90,
                    sum(CASE WHEN lo_rk <= (9 * t.n + 10) // 10
                              AND (9 * t.n + 10) // 10 <= hi_rk THEN c ELSE 0 END) AS hi90,
                    max(t.n) AS n
             FROM r2 JOIN t USING (flag)
             GROUP BY r2.flag)
       SELECT flag AS l_returnflag,
              CAST((lo50 + hi50 + 1) // 2 AS DOUBLE) / 100 AS p50,
              CAST((10 * lo90 + ((9 * n + 1) % 10) * (hi90 - lo90) + 5) // 10
                   AS DOUBLE) / 100 AS p90
       FROM e ORDER BY l_returnflag""") { (s, d) =>
    val byVal = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5)).as("c"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("l_returnflag").orderBy("c")
    val ranked = byVal
      .withColumn("hi_rk", sum("cnt").over(w))
      .withColumn("lo_rk", col("hi_rk") - col("cnt") + 1)
    val totals = byVal.groupBy("l_returnflag").agg(sum("cnt").as("n"))
    // quantile_cont endpoints as exact integer ranks: p50 at 1-based ranks
    // floor/ceil of (n+1)/2, p90 at floor/ceil of (9n+1)/10
    def endpoint(rk: Column, name: String) =
      sum(when(col("lo_rk") <= rk && rk <= col("hi_rk"), col("c"))
        .otherwise(lit(0L))).as(name)
    ranked.join(broadcast(totals), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(endpoint(expr("(n + 1) div 2"), "lo50"),
        endpoint(expr("(n + 2) div 2"), "hi50"),
        endpoint(expr("(9 * n + 1) div 10"), "lo90"),
        endpoint(expr("(9 * n + 10) div 10"), "hi90"),
        max("n").as("n"))
      .select(col("l_returnflag"),
        (expr("(lo50 + hi50 + 1) div 2").cast("double") / 100).as("p50"),
        (expr("(10 * lo90 + ((9 * n + 1) % 10) * (hi90 - lo90) + 5) div 10")
          .cast("double") / 100).as("p90"))
      .orderBy("l_returnflag")
  }

  /** Raw mergeable quantile sketch — the 100 TB production shape:
    * `approx_percentile` builds partial sketches map-side and MERGES
    * them, one pass + tiny combiner state instead of a per-group sort.
    * Merge order varies with partitioning, so the raw values never enter
    * hashed output bytes; [[qPercentilesTdigest]] certifies them. */
  private[graft] def tdigestSketch(
      s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(expr("approx_percentile(l_extendedprice, 0.5, 10000)"), 2).as("s50"),
        round(expr("approx_percentile(l_extendedprice, 0.9, 10000)"), 2).as("s90"))

  /** Mergeable percentiles, ORACLE-PROMOTED (VERDICT r7 #8): the query
    * runs the t-digest sketch ([[tdigestSketch]]) AND the exact integer
    * form ([[qPercentiles]]) and outputs the exact values plus a
    * `sketch_within_eps` flag — sketch within ε = max(1 cent, 0.5%) per
    * group. The oracle twin emits literal `true`, so ANY drift flips the
    * flag and fails the hash compare at every gate run and scale factor —
    * the certification lives in the COMPARED OUTPUT, not in a driver-side
    * throw. Fully lazy by design (ADVICE r8, same class as
    * q_approx_distinct): constructing the DataFrame runs nothing. */
  val qPercentilesTdigest: Q = Q(
    "q_percentiles_tdigest",
    """WITH v AS (SELECT l_returnflag AS flag,
                         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
                  FROM lineitem),
       b AS (SELECT flag, c, count(*) AS cnt FROM v GROUP BY 1, 2),
       r AS (SELECT flag, c, cnt,
                    sum(cnt) OVER (PARTITION BY flag ORDER BY c) AS hi_rk
             FROM b),
       r2 AS (SELECT flag, c, hi_rk, hi_rk - cnt + 1 AS lo_rk FROM r),
       t AS (SELECT flag, sum(cnt) AS n FROM b GROUP BY flag),
       e AS (SELECT r2.flag,
                    sum(CASE WHEN lo_rk <= (t.n + 1) // 2
                              AND (t.n + 1) // 2 <= hi_rk THEN c ELSE 0 END) AS lo50,
                    sum(CASE WHEN lo_rk <= (t.n + 2) // 2
                              AND (t.n + 2) // 2 <= hi_rk THEN c ELSE 0 END) AS hi50,
                    sum(CASE WHEN lo_rk <= (9 * t.n + 1) // 10
                              AND (9 * t.n + 1) // 10 <= hi_rk THEN c ELSE 0 END) AS lo90,
                    sum(CASE WHEN lo_rk <= (9 * t.n + 10) // 10
                              AND (9 * t.n + 10) // 10 <= hi_rk THEN c ELSE 0 END) AS hi90,
                    max(t.n) AS n
             FROM r2 JOIN t USING (flag)
             GROUP BY r2.flag)
       SELECT flag AS l_returnflag,
              CAST((lo50 + hi50 + 1) // 2 AS DOUBLE) / 100 AS p50,
              CAST((10 * lo90 + ((9 * n + 1) % 10) * (hi90 - lo90) + 5) // 10
                   AS DOUBLE) / 100 AS p90,
              true AS sketch_within_eps
       FROM e ORDER BY l_returnflag""") { (s, d) =>
    val eps50 = greatest(lit(0.01), col("p50") * lit(0.005))
    val eps90 = greatest(lit(0.01), col("p90") * lit(0.005))
    qPercentiles.fn(s, d)
      .join(tdigestSketch(s, d), "l_returnflag")
      .withColumn("sketch_within_eps",
        abs(col("s50") - col("p50")) <= eps50 &&
          abs(col("s90") - col("p90")) <= eps90)
      .select(col("l_returnflag"), col("p50"), col("p90"),
        col("sketch_within_eps")).orderBy("l_returnflag")
  }

  /** Pivot: order counts per priority × status matrix (groupBy.pivot —
    * conditional aggregation under the hood, one shuffle). */
  val qPivot: Q = Q(
    "q_pivot",
    """SELECT o_orderpriority,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
              CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")
  }

  /** Scalar-total share: each segment's fraction of global revenue via an
    * empty-frame window over the aggregate — no second scan, no driver
    * collect. */
  val qRevenueShare: Q = Q(
    "q_revenue_share",
    """WITH seg AS (SELECT c_mktsegment,
                           sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
                    FROM orders JOIN customer ON o_custkey = c_custkey
                    GROUP BY c_mktsegment)
       SELECT c_mktsegment, CAST(round(rev, 2) AS DOUBLE) AS revenue,
              round(CAST(rev AS DOUBLE)
                    / CAST(sum(rev) OVER () AS DOUBLE), 4) AS share
       FROM seg ORDER BY c_mktsegment""") { (s, d) =>
    // rev and its grand total accumulate in DECIMAL (exact); only the
    // final share division happens in double, identically on both engines
    val seg = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
    val wAll = Window.partitionBy()
    seg.select(col("c_mktsegment"),
        round(col("rev"), 2).cast("double").as("revenue"),
        round(col("rev").cast("double") /
          sum("rev").over(wAll).cast("double"), 4).as("share"))
      .orderBy("c_mktsegment")
  }

  /** Distribution window functions: ntile / percent_rank / cume_dist over
    * customer balances per nation — one shuffle on the partition key, all
    * three functions share the same sorted window pass. Ordering includes
    * the unique c_custkey so ranks are deterministic. */
  val qWindowDistribution: Q = Q(
    "q_window_distribution",
    // percent_rank/cume_dist are exact rationals k/(n-1), k/n; emitting
    // them as 6dp doubles flakes when a value lands on a rounding
    // boundary and the two engines' doubles sit on opposite sides (seen
    // at sf0.1: 1e-06 diffs). Multiplying back by the denominator
    // recovers the exact integer numerator — hash-stable at ANY scale
    // while still exercising both window functions.
    """SELECT c_custkey, c_nationkey,
              CAST(ntile(4) OVER w AS INTEGER) AS quartile,
              CAST(round(percent_rank() OVER w *
                   (count(*) OVER p - 1)) AS BIGINT) AS pr_num,
              CAST(round(cume_dist() OVER w *
                   count(*) OVER p) AS BIGINT) AS cume_num,
              count(*) OVER p AS part_n
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey),
              p AS (PARTITION BY c_nationkey)
       ORDER BY c_custkey""") { (s, d) =>
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    val p = Window.partitionBy("c_nationkey")
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w) * (count(lit(1)).over(p) - 1))
          .cast("long").as("pr_num"),
        round(cume_dist().over(w) * count(lit(1)).over(p))
          .cast("long").as("cume_num"),
        count(lit(1)).over(p).as("part_n"))
      .orderBy("c_custkey")
  }

  /** Funnel analysis over the events stream-table: per user, the first
    * view, the first click AFTER that view, and the first purchase AFTER
    * that click — the ordered-sequence detection of product analytics.
    * Three aggregations, each joined to the previous stage's (small)
    * per-user frontier — never an events-to-events self-join. */
  val qFunnel: Q = Q(
    "q_funnel",
    """WITH u AS (SELECT DISTINCT user_id FROM events),
       v AS (SELECT user_id, min(ts) AS t FROM events
             WHERE event_type = 'view' GROUP BY 1),
       c AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             JOIN v ON v.user_id = e.user_id AND e.ts > v.t
             WHERE e.event_type = 'click' GROUP BY 1),
       p AS (SELECT e.user_id, min(e.ts) AS t FROM events e
             JOIN c ON c.user_id = e.user_id AND e.ts > c.t
             WHERE e.event_type = 'purchase' GROUP BY 1)
       SELECT u.user_id,
              epoch_us(v.t) AS first_view_us,
              epoch_us(c.t) AS first_click_us,
              epoch_us(p.t) AS first_purchase_us
       FROM u
       LEFT JOIN v ON v.user_id = u.user_id
       LEFT JOIN c ON c.user_id = u.user_id
       LEFT JOIN p ON p.user_id = u.user_id
       ORDER BY u.user_id""") { (s, d) =>
    val ev = Tables.events(s, d)
    val u = ev.select(col("user_id")).distinct()
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("vt"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("vt"))
      .groupBy("user_id").agg(min("ts").as("ct"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("ct"))
      .groupBy("user_id").agg(min("ts").as("pt"))
    u.join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(col("user_id"),
        unix_micros(col("vt")).as("first_view_us"),
        unix_micros(col("ct")).as("first_click_us"),
        unix_micros(col("pt")).as("first_purchase_us"))
      .orderBy("user_id")
  }

  /** UNPIVOT (melt): wide measure columns to (measure, value) rows —
    * the inverse of pivot, a per-row expand with no shuffle until the
    * summarizing aggregation. Sums go through DECIMAL for exactness. */
  val qUnpivot: Q = Q(
    "q_unpivot",
    """SELECT measure, CAST(count(*) AS BIGINT) AS n,
              CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total
       FROM (UNPIVOT (SELECT l_quantity, l_extendedprice, l_discount FROM lineitem)
             ON l_quantity, l_extendedprice, l_discount
             INTO NAME measure VALUE val)
       GROUP BY measure ORDER BY measure""") { (s, d) =>
    Tables.lineitem(s, d)
      .select("l_quantity", "l_extendedprice", "l_discount")
      .unpivot(Array.empty[org.apache.spark.sql.Column],
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "measure", "val")
      .groupBy("measure")
      .agg(count(lit(1)).as("n"),
        sum(col("val").cast("decimal(18,4)")).cast("double").as("total"))
      .orderBy("measure")
  }

  /** Multiset set ops: UNION ALL keeps duplicates, EXCEPT ALL removes one
    * occurrence per match — the overlap region survives exactly once,
    * which distinct set ops would erase entirely. */
  val qSetOpsAll: Q = Q(
    "q_set_ops_all",
    """SELECT n_nationkey, n_name FROM
       ((SELECT n_nationkey, n_name FROM nation WHERE n_regionkey <= 2
         UNION ALL
         SELECT n_nationkey, n_name FROM nation WHERE n_regionkey >= 2)
        EXCEPT ALL
        SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 2)
       ORDER BY n_nationkey""") { (s, d) =>
    val n = Tables.nation(s, d)
    val a = n.filter(col("n_regionkey") <= 2).select("n_nationkey", "n_name")
    val b = n.filter(col("n_regionkey") >= 2).select("n_nationkey", "n_name")
    val c = n.filter(col("n_regionkey") === 2).select("n_nationkey", "n_name")
    a.unionAll(b).exceptAll(c).orderBy("n_nationkey")
  }

  /** Time-RANGE window frame: each event's trailing-1-hour activity for
    * its user — `RANGE BETWEEN 3600000000 µs PRECEDING AND CURRENT ROW`
    * over integer epoch-micros, the sliding-window analytic ROWS frames
    * can't express (the frame is defined by VALUE distance, not row
    * count, so bursts widen it and gaps shrink it).
    *
    * Determinism: the frame key is exact integer micros on both engines
    * (unix_micros ≡ epoch_us — Tables.events normalizes ns payloads the
    * same way); RANGE includes all value-peers, so tie order within a
    * timestamp cannot change the frame; and the framed sum is an
    * ExactSum-quantized integer sum — order-independent inside the frame
    * exactly as it is inside a groupBy.
    *
    * Scale design (100 TB): one hash exchange on user_id + a per-user
    * spillable sort — the identical shape as every ROWS window here;
    * Spark evaluates a trailing RANGE frame with two cursors over the
    * sorted run (O(n) amortized, no per-row rescan). Skewed users would
    * take the qSourceCap salting treatment; event time is naturally
    * bounded per user so frames stay small. */
  val qWindowRange: Q = Q(
    "q_window_range",
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
              CAST(count(*) OVER w AS BIGINT) AS n_hour,
              round(CAST(sum(CAST(floor(value * 1073741824 + 0.5) AS BIGINT))
                         OVER w AS DOUBLE) / 1073741824, 2) AS hour_sum
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
       ORDER BY user_id, ts_us, event_id""") { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_hour"),
        round(ExactSum.value(sum(ExactSum.quantize(col("value"))).over(w)), 2)
          .as("hour_sum"))
      .orderBy("user_id", "ts_us", "event_id")
  }

  val all: Seq[Q] = Seq(
    qOrderByLimit, qTopkCustomers, qWindowRank, qWindowRunning, qWindowLag,
    qSetOps, qRollup, qScalarFns, qDateFns, qJsonEvents, qPercentiles,
    qPercentilesTdigest, qPivot, qRevenueShare, qWindowDistribution, qFunnel,
    qUnpivot, qSetOpsAll, qWindowRange)
}
