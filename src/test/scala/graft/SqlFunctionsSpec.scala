package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** SQL-callable kernels via the DSv2 FunctionCatalog: the same catalyst
  * expressions the DataFrame packs use, reachable from plain SQL. */
class SqlFunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.fns", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.fns.warehouse",
      Files.createTempDirectory("graft-fns-wh").toString)
    s
  }

  test("cosine: identical → 1, orthogonal → 0, zero vector → null") {
    val r = spark.sql(
      """SELECT round(fns.system.cosine(array(1D, 0D, 2D), array(1D, 0D, 2D)), 9),
                round(fns.system.cosine(array(1D, 0D), array(0D, 1D)), 9),
                fns.system.cosine(array(0D, 0D), array(1D, 1D))""").head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.isNullAt(2))
  }

  test("simhash64 / word_shingles / minhash match the DataFrame kernels") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val df = spark.createDataFrame(
      Seq(Tuple1("the quick brown fox jumps over the lazy dog"))).toDF("t")
    df.createOrReplaceTempView("fn_probe")

    val viaSql = spark.sql(
      """SELECT fns.system.simhash64(t), fns.system.word_shingles(t),
                fns.system.minhash(t)
         FROM fn_probe""").head()
    val viaExpr = df.select(
      ColumnBridge.column(graft.functions.SimHash64(
        ColumnBridge.expression(col("t")))),
      ColumnBridge.column(graft.functions.WordShingles(
        ColumnBridge.expression(col("t")), 3)),
      ColumnBridge.column(graft.functions.MinHashSignatures(
        ColumnBridge.expression(col("t")), 3, 32))).head()

    assert(viaSql.getLong(0) == viaExpr.getLong(0))
    assert(viaSql.getSeq[String](1) == viaExpr.getSeq[String](1))
    assert(viaSql.getSeq[Long](2) == viaExpr.getSeq[Long](2))
  }

  test("zorder_key from SQL is order-preserving per column") {
    val rows = spark.sql(
      """SELECT x, y, fns.system.zorder_key(x, y) AS z
         FROM (SELECT CAST(id % 8 AS INT) AS x, CAST(id DIV 8 AS INT) AS y
               FROM range(0, 64))""")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    for (y <- 0 until 8; x <- 1 until 8)
      assert(rows((x, y)) > rows((x - 1, y)))
    for (x <- 0 until 8; y <- 1 until 8)
      assert(rows((x, y)) > rows((x, y - 1)))
  }

  test("wrong arity or argument type fails analysis, not execution") {
    intercept[Exception] {
      spark.sql("SELECT fns.system.cosine(array(1D))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT fns.system.simhash64(42)").collect()
    }
  }
}
