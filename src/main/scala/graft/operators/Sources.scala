package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Q, Tables}

/** CSV / JSON sources (SURVEY.md §2.1 S9 — promised by the reference:
  * "Load real data: CSV, JSON, Parquet" `SETUP_GUIDE_WIN.md:471`).
  *
  * Each query round-trips a fixture table through the format (write the
  * format once per sfDir into a temp dir, read it back with an EXPLICIT
  * schema — schema inference over 100 TB means reading everything twice)
  * and must hash-match the DuckDB oracle over the original parquet: any
  * serialization asymmetry (quoting, null encoding, type coercion) breaks
  * the gate. */
object Sources {

  private val dirs = scala.collection.concurrent.TrieMap.empty[(String, String), String]

  private def materialize(s: SparkSession, d: String, fmt: String,
      table: String, df: => DataFrame): String =
    dirs.getOrElseUpdate((d, s"$fmt-$table"), {
      val out = Files.createTempDirectory(s"graft-$fmt-$table").toString
      val w = df.coalesce(2).write.mode("overwrite")
      (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(out)
      out
    })

  private val nationSchema = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  /** CSV source with header + explicit schema. */
  val qCsvSource: Q = Q(
    "q_csv_source",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
       ORDER BY n_nationkey""") { (s, d) =>
    val dir = materialize(s, d, "csv", "nation", Tables.nation(s, d))
    s.read.option("header", "true").schema(nationSchema).csv(dir)
      .orderBy("n_nationkey")
  }

  /** JSON-lines source with explicit schema. */
  val qJsonSource: Q = Q(
    "q_json_source",
    """SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS bal
       FROM supplier ORDER BY s_suppkey""") { (s, d) =>
    val schema = StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType)))
    val dir = materialize(s, d, "json", "supplier", Tables.supplier(s, d))
    s.read.schema(schema).json(dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        round(col("s_acctbal"), 2).as("bal"))
      .orderBy("s_suppkey")
  }

  /** ORC source/sink roundtrip (Spark's other native columnar format —
    * same vectorized reader architecture as parquet). */
  val qOrcSource: Q = Q(
    "q_orc_source",
    """SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal,
              c_mktsegment
       FROM customer ORDER BY c_custkey""") { (s, d) =>
    val dir = materialize(s, d, "orc", "customer", Tables.customer(s, d))
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType)))
    s.read.schema(schema).orc(dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        round(col("c_acctbal"), 2).as("bal"), col("c_mktsegment"))
      .orderBy("c_custkey")
  }

  val all: Seq[Q] = Seq(qCsvSource, qJsonSource, qOrcSource)
}

/** Skew-handling operators (the "salting for skew" scale tool): two-phase
  * salted aggregation — partial agg on (key, salt) spreads a hot key over
  * N reducers, final agg on key recombines. Result is provably identical
  * to the direct groupBy (the oracle checks it); the win is that no single
  * reducer ever sees all rows of a hot key. `orders.o_orderpriority` has
  * only 5 values over 15k+ rows — exactly the hot-key shape. */
object Skew {

  private val SaltBuckets = 16

  val qSaltedAgg: Q = Q(
    "q_salted_agg",
    """SELECT o_orderpriority, count(*) AS n,
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
                AS total
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    // partial (salted) money sums accumulate in DECIMAL: exact at both
    // levels, so the two-stage reduction is order-independent
    val salted = Tables.orders(s, d)
      .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(SaltBuckets)))
      .groupBy(col("o_orderpriority"), col("__salt"))
      .agg(count(lit(1)).as("pn"),
        sum(col("o_totalprice").cast("decimal(12,2)")).as("pt"))
    salted.groupBy("o_orderpriority")
      .agg(sum("pn").as("n"),
        round(sum("pt"), 2).cast("double").as("total"))
      .orderBy("o_orderpriority")
  }

  /** Skewed join via key salting: replicate the small side N ways, salt the
    * big side's hot keys — each (key, salt) pair lands on its own reducer.
    * Equivalent to the plain join (oracle-checked). */
  val qSaltedJoin: Q = Q(
    "q_salted_join",
    """SELECT o_orderpriority, count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY o_orderpriority ORDER BY o_orderpriority""") { (s, d) =>
    val salts = s.range(SaltBuckets).select(col("id").cast("int").as("__salt"))
    val bigSalted = Tables.orders(s, d)
      .withColumn("__salt", pmod(xxhash64(col("o_orderkey")), lit(SaltBuckets)).cast("int"))
    val smallReplicated = Tables.customer(s, d).select("c_custkey").crossJoin(salts)
    bigSalted.join(smallReplicated,
        bigSalted("o_custkey") === smallReplicated("c_custkey") &&
        bigSalted("__salt") === smallReplicated("__salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct("o_custkey").as("n_custs"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[Q] = Seq(qSaltedAgg, qSaltedJoin)
}
