package graft.operators

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Relational query pack: scans, projections, filters, joins, aggregations
  * (SURVEY.md §2.1, §2.3-2.5).
  *
  * Shapes mirror the reference's exercised surface — the inner equi-join of
  * `iceberg_queries.ipynb:291-296`, the filtered scans of
  * `iceberg_queries.ipynb:171`/`:233-234`, COUNT(*) of
  * `getting_started.ipynb:160` — scaled from 4-row demo tables to the
  * TPC-H-ish corpus so the plans are real (partial+final hash aggregation,
  * broadcast vs shuffle join selection, pushed filters).
  *
  * Scale notes (100 TB design):
  *  - Aggregations run as partial (map-side) + final hash aggregates; the
  *    group-by keys here are low-cardinality, so the shuffle carries only
  *    the partial states, not rows.
  *  - Dimension tables (region/nation/customer/supplier/part) are broadcast
  *    explicitly where they are guaranteed small relative to the fact side;
  *    fact-fact joins (orders⋈lineitem) are left to Catalyst/AQE which
  *    picks sort-merge with both sides hash-partitioned on the join key.
  *  - Every filter is a plain column predicate so it reaches the parquet
  *    scan (`PushedFilters`), and projections are explicit so `ReadSchema`
  *    only lists needed columns.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: full-scan grouped aggregation with
    * sum/avg/count over ~4 years of lineitem. */
  val q1PricingSummary: Q = Q(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                    AS sum_qty,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                                                                    AS sum_base_price,
       CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - l_discount AS DECIMAL(8,6))), 2) AS DOUBLE)
                                                                    AS sum_disc_price,
       CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(1 - l_discount AS DECIMAL(8,6))
                           AS DECIMAL(14,4))
                      * CAST(1 + l_tax AS DECIMAL(8,6))), 2) AS DOUBLE)
                                                                    AS sum_charge,
       CAST((20000 * sum(CAST(l_quantity AS BIGINT)) + count(*))
            // (2 * count(*)) AS DOUBLE) / 1e4                      AS avg_qty,
       CAST((200 * sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             + count(*)) // (2 * count(*)) AS DOUBLE) / 1e4         AS avg_price,
       CAST((200 * sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
             + count(*)) // (2 * count(*)) AS DOUBLE) / 1e4         AS avg_disc,
       count(*)                                                     AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
    // money sums accumulate in DECIMAL, not DOUBLE: a double sum's FP
    // error grows with row count and its order differs between engines,
    // so at sf1 (6M rows) the rounded-to-2dp hash can land on opposite
    // sides of a .xx5 boundary. Decimal summation is exact and
    // order-independent — identical at every scale factor. (TPC-H
    // defines these columns as DECIMAL in the first place.) The stepped
    // casts mirror the oracle SQL EXACTLY — each narrows precision so
    // DuckDB's p1+p2 multiply typing never overflows, and every rounding
    // point is explicit and shared by both engines.
    val price = col("l_extendedprice").cast("decimal(12,2)")
    val disc1 = (lit(1) - col("l_discount")).cast("decimal(8,6)")
    val tax1 = (lit(1) + col("l_tax")).cast("decimal(8,6)")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum(price), 2).cast("double").as("sum_base_price"),
        round(sum(price * disc1), 2).cast("double")
          .as("sum_disc_price"),
        round(sum((price * disc1).cast("decimal(14,4)") * tax1), 2)
          .cast("double").as("sum_charge"),
        // means round half-up at 4dp in PURE INTEGER arithmetic
        // ((2e4·S·k + n) div 2n): an integer-ratio mean can land exactly
        // on a decimal rounding tie, and round(double, ·) resolves decimal
        // ties differently across engines (Spark: shortest-repr half-up;
        // DuckDB: binary). Quantity is integer-valued; money is exact
        // cents via floor(x·100 + 0.5). All values positive.
        (expr("(20000 * sum(CAST(l_quantity AS BIGINT)) + count(1)) div " +
          "(2 * count(1))").cast("double") / lit(1e4)).as("avg_qty"),
        (expr("(200 * sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))" +
          " + count(1)) div (2 * count(1))").cast("double") / lit(1e4))
          .as("avg_price"),
        (expr("(200 * sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT))" +
          " + count(1)) div (2 * count(1))").cast("double") / lit(1e4))
          .as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-shaped shipping priority: 3-way join (dim broadcast + fact
    * SMJ), date filters on both sides pushed to the scans, grouped revenue,
    * top-10. The flagship `SparkEntry.entry` query. */
  val q3ShippingPriority: Q = Q(
    "q3_shipping_priority",
    """SELECT l_orderkey,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                             * CAST(1 - l_discount AS DECIMAL(8,6))), 2)
                   AS DOUBLE) AS revenue,
              CAST(o_orderdate AS DATE) AS orderdate, o_orderpriority
       FROM customer JOIN orders ON c_custkey = o_custkey
                     JOIN lineitem ON l_orderkey = o_orderkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
       GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
       ORDER BY revenue DESC, l_orderkey
       LIMIT 10""") { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-03-15 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1996-03-15 00:00:00").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
        col("o_orderpriority"))
      // revenue accumulates in DECIMAL (exact, order-independent) — the
      // q1 money treatment, suite-wide since r6
      .agg(round(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount")).cast("decimal(8,6)")), 2)
        .cast("double").as("revenue"))
      .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier volume: 6-table snowflake join with the
    * whole dimension chain broadcast, grouped by nation. */
  val q5LocalSupplier: Q = Q(
    "q5_local_supplier_volume",
    """SELECT n_name,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                             * CAST(1 - l_discount AS DECIMAL(8,6))), 2)
                   AS DOUBLE) AS revenue
       FROM customer
       JOIN orders   ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY n_name
       ORDER BY revenue DESC, n_name""") { (s, d) =>
    val ord = Tables.orders(s, d).filter(
      col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
      col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val dims = broadcast(
      Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
        .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA"))
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(dims, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1) - col("l_discount")).cast("decimal(8,6)")), 2)
        .cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Filtered projection — the `WHERE id > 2` / `.select(...).filter(...)`
    * pattern of `iceberg_queries.ipynb:171,233-234`. Predicate and column
    * pruning both reach the parquet scan. */
  val qFilterProject: Q = Q(
    "q_filter_project",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem
       WHERE l_quantity > 45 AND l_returnflag = 'R'
       ORDER BY l_orderkey, l_linenumber""") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Broadcast-hash inner equi-join (the reference's only join shape,
    * `iceberg_queries.ipynb:291-296`): fact ⋈ broadcast(dim). */
  val qJoinBroadcast: Q = Q(
    "q_join_broadcast",
    """SELECT c_mktsegment, count(*) AS n_orders,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_spend
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment
       ORDER BY c_mktsegment""") { (s, d) =>
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(12,2)")), 2)
          .cast("double").as("total_spend"))
      .orderBy("c_mktsegment")
  }

  /** Shuffle (sort-merge) join variant: both sides repartitioned on the key.
    * At 100 TB a customer table is no longer broadcastable — this pins the
    * SMJ path so its plan is exercised and benchmarked. */
  val qJoinSortMerge: Q = Q(
    "q_join_sortmerge",
    """SELECT o_orderpriority, count(*) AS n_lines,
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total_price
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority""") { (s, d) =>
    Tables.lineitem(s, d).hint("merge")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice").cast("decimal(12,2)")), 2)
          .cast("double").as("total_price"))
      .orderBy("o_orderpriority")
  }

  /** Left-semi join (EXISTS): customers that placed at least one urgent
    * order. Semi joins only ship the key column — at scale this is the
    * cheap way to express EXISTS without materializing the right side. */
  val qSemiJoin: Q = Q(
    "q_semi_join",
    """SELECT c_nationkey, count(*) AS n_customers
       FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       GROUP BY c_nationkey
       ORDER BY c_nationkey""") { (s, d) =>
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_nationkey")
  }

  /** Left-anti join (NOT EXISTS): customers with no urgent orders. */
  val qAntiJoin: Q = Q(
    "q_anti_join",
    """SELECT c_custkey, c_name
       FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       ORDER BY c_custkey""") { (s, d) =>
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    Tables.customer(s, d)
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left outer join with null-producing side aggregated. */
  val qOuterJoin: Q = Q(
    "q_outer_join",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
              CAST(round(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0), 2)
                   AS DOUBLE) AS spend
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey
       ORDER BY c_custkey""") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice").cast("decimal(12,2)")), lit(0)), 2)
          .cast("double").as("spend"))
      .orderBy("c_custkey")
  }

  /** Scalar aggregate COUNT(*) with alias — `getting_started.ipynb:160`,
    * `warehouse_helpers.py:85` (table stats). */
  val qCountStar: Q = Q(
    "q_count_star",
    "SELECT count(*) AS row_count FROM lineitem") { (s, d) =>
    Tables.lineitem(s, d).agg(count(lit(1)).as("row_count"))
  }

  /** Exact + approximate distinct counts. At 100 TB `count(distinct)` is a
    * full shuffle of the distinct keys; `approx_count_distinct` (HLL++) is
    * the constant-memory alternative — both declared, the exact one is the
    * oracle-checked query. */
  val qDistinctCount: Q = Q(
    "q_distinct_count",
    """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_suppkey").as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** Conditional aggregation (CASE WHEN pivot): order counts by status. */
  val qCaseAgg: Q = Q(
    "q_case_agg",
    """SELECT o_orderpriority,
              CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
              CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
              CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy("o_orderpriority")
  }

  /** Multi-way grouped agg with HAVING. */
  val qHaving: Q = Q(
    "q_having",
    """SELECT l_suppkey, round(sum(l_quantity), 2) AS total_qty
       FROM lineitem
       GROUP BY l_suppkey
       HAVING sum(l_quantity) > 1000
       ORDER BY l_suppkey""") { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_suppkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"),
        sum("l_quantity").as("raw_qty"))
      .filter(col("raw_qty") > 1000)
      .select("l_suppkey", "total_qty")
      .orderBy("l_suppkey")
  }

  /** Correlated scalar subqueries: orders priced above 1.5× their
    * customer's average, written as two correlated aggregates that
    * Catalyst decorrelates into joins (RewriteCorrelatedScalarSubquery) —
    * no per-row re-execution, one aggregation over the inner side. The
    * boundary predicate is pure DECIMAL arithmetic (2·price·count > 3·sum)
    * so both engines evaluate it exactly — a float `> 1.5*avg` could
    * disagree in the last ulp right at the boundary. */
  val qCorrelatedSubquery: Q = Q(
    "q_correlated_subquery",
    """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
       FROM orders o
       WHERE CAST(o_totalprice AS DECIMAL(18,2))
             * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey) * 2
           > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i
              WHERE i.o_custkey = o.o_custkey) * 3
       ORDER BY o_orderkey""") { (s, d) =>
    val v = s"orders_subq_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    Tables.orders(s, d).createOrReplaceTempView(v)
    s.sql(s"""SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
              FROM $v o
              WHERE CAST(o_totalprice AS DECIMAL(18,2))
                    * (SELECT count(*) FROM $v i WHERE i.o_custkey = o.o_custkey) * 2
                  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM $v i
                     WHERE i.o_custkey = o.o_custkey) * 3
              ORDER BY o_orderkey""")
  }

  val all: Seq[Q] = Seq(
    q1PricingSummary, q3ShippingPriority, q5LocalSupplier, qFilterProject,
    qJoinBroadcast, qJoinSortMerge, qSemiJoin, qAntiJoin, qOuterJoin,
    qCountStar, qDistinctCount, qCaseAgg, qHaving, qCorrelatedSubquery)
}
