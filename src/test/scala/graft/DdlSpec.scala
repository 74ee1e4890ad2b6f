package graft
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._

/** CTAS and widening column-type evolution (int->bigint, float->double):
  * metadata-only commits; files written before the widening are served by
  * physical-type up-conversion on both read paths, including through a
  * COW rewrite. */
class DdlSpec extends AnyFunSuite {
  private val wh = Files.createTempDirectory("graft-ddl").toString
  private lazy val s = {
    val x = SparkSpec.session
    x.conf.set("spark.sql.catalog.ddlp", classOf[GraftCatalog].getName)
    x.conf.set("spark.sql.catalog.ddlp.warehouse", wh)
    x.sql("CREATE NAMESPACE IF NOT EXISTS ddlp.t")
    x
  }

  test("CREATE TABLE AS SELECT") {
    s.sql("CREATE TABLE ddlp.t.ct USING iceberg AS SELECT 1 AS id, 'a' AS v")
    assert(s.sql("SELECT * FROM ddlp.t.ct").count() == 1)
  }

  test("widen int->bigint and float->double; old files up-convert") {
    s.sql("CREATE TABLE ddlp.t.w (id INT, x FLOAT) USING iceberg")
    s.sql("INSERT INTO ddlp.t.w VALUES (7, CAST(1.5 AS FLOAT))")
    s.sql("ALTER TABLE ddlp.t.w ALTER COLUMN id TYPE BIGINT")
    s.sql("ALTER TABLE ddlp.t.w ALTER COLUMN x TYPE DOUBLE")
    s.sql("INSERT INTO ddlp.t.w VALUES (8000000000, 2.5)")
    val rows = s.sql("SELECT id, x FROM ddlp.t.w ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows == Seq((7L, 1.5), (8000000000L, 2.5)))

    // COW rewrite reads the pre-widening INT32/FLOAT file via the
    // row-level reader and writes the widened schema back
    s.sql("UPDATE ddlp.t.w SET x = x + 1.0 WHERE id = 7")
    val upd = s.sql("SELECT id, x FROM ddlp.t.w ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(upd == Seq((7L, 2.5), (8000000000L, 2.5)))
  }

  test("narrowing and partition-source retypes are rejected") {
    s.sql("""CREATE TABLE ddlp.t.nr (id BIGINT, day STRING)
             USING iceberg PARTITIONED BY (day)""")
    intercept[Exception] {
      s.sql("ALTER TABLE ddlp.t.nr ALTER COLUMN id TYPE INT")
    }
    intercept[Exception] {
      s.sql("ALTER TABLE ddlp.t.nr ALTER COLUMN day TYPE VARCHAR(10)")
    }
  }
}
