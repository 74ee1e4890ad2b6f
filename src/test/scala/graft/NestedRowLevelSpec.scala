package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Row-level operations (MERGE / UPDATE / DELETE) on tables with nested
  * columns — arrays, structs, maps. The COW rewrite path round-trips rows
  * through GraftBatchRead (parquet-mr Group reader) and GraftBatchWrite
  * (parquet-mr Group writer); both must handle the standard 3-level
  * LIST/MAP encodings that Spark's own datasource writer produces, or
  * tables like `embeddings` (embedding ARRAY<FLOAT>) can never be
  * maintained in place.
  */
class NestedRowLevelSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-nested-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.nst", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.nst.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS nst.t")
    s
  }

  test("UPDATE and DELETE on a table with an ARRAY<FLOAT> column") {
    spark.sql("""CREATE TABLE nst.t.vecs (id INT, label STRING,
                 emb ARRAY<FLOAT>) USING iceberg""")
    spark.sql("""INSERT INTO nst.t.vecs VALUES
                 (1, 'a', array(cast(1.0 as float), cast(2.0 as float))),
                 (2, 'b', array(cast(3.0 as float))),
                 (3, 'c', array()),
                 (4, 'd', null)""")

    // UPDATE touching a non-array column must round-trip the array intact
    spark.sql("UPDATE nst.t.vecs SET label = 'B' WHERE id = 2")
    // UPDATE writing the array column itself
    spark.sql("""UPDATE nst.t.vecs
                 SET emb = array(cast(9.5 as float), null) WHERE id = 1""")
    spark.sql("DELETE FROM nst.t.vecs WHERE id = 3")

    val rows = spark.sql(
      "SELECT id, label, emb FROM nst.t.vecs ORDER BY id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    assert(rows(0).getString(1) == "a")
    assert(rows(0).getSeq[Any](2) == Seq(9.5f, null))
    assert(rows(1).getString(1) == "B")
    assert(rows(1).getSeq[Float](2) == Seq(3.0f))
    assert(rows(2).isNullAt(2))
  }

  test("MERGE on a table with struct and map columns") {
    spark.sql("""CREATE TABLE nst.t.docs (id INT,
                 meta STRUCT<src: STRING, n: INT>,
                 attrs MAP<STRING, INT>) USING iceberg""")
    spark.sql("""INSERT INTO nst.t.docs VALUES
                 (1, named_struct('src', 'web', 'n', 10), map('a', 1)),
                 (2, named_struct('src', 'pdf', 'n', 20), map('b', 2, 'c', 3)),
                 (3, null, map())""")
    spark.sql("CREATE TABLE nst.t.upd (id INT, n INT) USING iceberg")
    spark.sql("INSERT INTO nst.t.upd VALUES (2, 99), (4, 44)")

    spark.sql("""MERGE INTO nst.t.docs t USING nst.t.upd s ON t.id = s.id
                 WHEN MATCHED THEN
                   UPDATE SET t.meta = named_struct('src', t.meta.src, 'n', s.n)
                 WHEN NOT MATCHED THEN
                   INSERT (id, meta, attrs)
                   VALUES (s.id, named_struct('src', 'new', 'n', s.n), null)""")

    val rows = spark.sql("""SELECT id, meta.src, meta.n, attrs
                            FROM nst.t.docs ORDER BY id""").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(rows(0).getString(1) == "web" && rows(0).getInt(2) == 10)
    assert(rows(0).getMap[String, Int](3) == Map("a" -> 1))
    assert(rows(1).getString(1) == "pdf" && rows(1).getInt(2) == 99)
    assert(rows(1).getMap[String, Int](3) == Map("b" -> 2, "c" -> 3))
    assert(rows(2).isNullAt(1)) // null struct survived the rewrite
    assert(rows(2).getMap[String, Int](3) == Map.empty)
    assert(rows(3).getString(1) == "new" && rows(3).getInt(2) == 44)
  }

  test("nested column evolution: add/drop a struct subfield, null-fill old rows") {
    spark.sql("""CREATE TABLE nst.t.evo (id INT,
                 meta STRUCT<src: STRING>) USING iceberg""")
    spark.sql("INSERT INTO nst.t.evo VALUES (1, named_struct('src', 'web'))")
    spark.sql("ALTER TABLE nst.t.evo ADD COLUMN meta.score INT")
    spark.sql("""INSERT INTO nst.t.evo VALUES
                 (2, named_struct('src', 'pdf', 'score', 7))""")

    val rows = spark.sql(
      "SELECT id, meta.src, meta.score FROM nst.t.evo ORDER BY id").collect()
    assert(rows(0).getString(1) == "web" && rows(0).isNullAt(2)) // null-fill
    assert(rows(1).getString(1) == "pdf" && rows(1).getInt(2) == 7)

    // row-level rewrite must round-trip the evolved nested schema too
    spark.sql("UPDATE nst.t.evo SET id = id + 10")
    val upd = spark.sql(
      "SELECT id, meta.src, meta.score FROM nst.t.evo ORDER BY id").collect()
    assert(upd.map(_.getInt(0)).toSeq == Seq(11, 12))
    assert(upd(0).isNullAt(2) && upd(1).getInt(2) == 7)

    spark.sql("ALTER TABLE nst.t.evo DROP COLUMN meta.score")
    val dropped = spark.sql("SELECT meta FROM nst.t.evo").schema
      .fields(0).dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(dropped.fieldNames.toSeq == Seq("src"))
  }

  test("nested evolution reaches struct fields inside arrays") {
    spark.sql("""CREATE TABLE nst.t.evarr (id INT,
                 chunks ARRAY<STRUCT<tag: STRING>>) USING iceberg""")
    spark.sql("""INSERT INTO nst.t.evarr VALUES
                 (1, array(named_struct('tag', 'x')))""")
    spark.sql("ALTER TABLE nst.t.evarr ADD COLUMN chunks.element.w DOUBLE")
    spark.sql("""INSERT INTO nst.t.evarr VALUES
                 (2, array(named_struct('tag', 'y', 'w', 0.5)))""")
    val rows = spark.sql("""SELECT id, chunks[0].tag, chunks[0].w
                            FROM nst.t.evarr ORDER BY id""").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).getString(1) == "y" && rows(1).getDouble(2) == 0.5)
  }

  test("nested arrays round-trip (array of struct with inner array)") {
    spark.sql("""CREATE TABLE nst.t.deep (id INT,
                 chunks ARRAY<STRUCT<tag: STRING, scores: ARRAY<DOUBLE>>>)
                 USING iceberg""")
    spark.sql("""INSERT INTO nst.t.deep VALUES
                 (1, array(named_struct('tag', 'x', 'scores', array(0.5, 1.5)),
                           named_struct('tag', 'y', 'scores', array()))),
                 (2, array())""")
    spark.sql("UPDATE nst.t.deep SET id = id + 10 WHERE id >= 0")

    val rows = spark.sql("""SELECT id, chunks FROM nst.t.deep
                            ORDER BY id""").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(11, 12))
    val chunks = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(chunks.map(_.getString(0)) == Seq("x", "y"))
    assert(chunks(0).getSeq[Double](1) == Seq(0.5, 1.5))
    assert(chunks(1).getSeq[Double](1) == Seq.empty)
    assert(rows(1).getSeq[Any](1) == Seq.empty)
  }
}
