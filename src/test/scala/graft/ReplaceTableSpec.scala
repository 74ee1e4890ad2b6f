package graft
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
class ReplaceTableSpec extends AnyFunSuite {
  private val wh = Files.createTempDirectory("graft-rp").toString
  private lazy val s = {
    val x = SparkSpec.session
    x.conf.set("spark.sql.catalog.rp", classOf[GraftCatalog].getName)
    x.conf.set("spark.sql.catalog.rp.warehouse", wh)
    x.sql("CREATE NAMESPACE IF NOT EXISTS rp.t")
    x
  }
  test("REPLACE TABLE AS SELECT") {
    s.sql("CREATE TABLE rp.t.r USING iceberg AS SELECT 1 AS id")
    s.sql("REPLACE TABLE rp.t.r USING iceberg AS SELECT 'x' AS v, 2 AS id")
    val df = s.sql("SELECT * FROM rp.t.r")
    assert(df.columns.toSeq == Seq("v", "id") && df.count() == 1)
  }
  test("SET NOT NULL is rejected") {
    s.sql("CREATE TABLE rp.t.sn (id INT, v STRING) USING iceberg")
    intercept[Exception] {
      s.sql("ALTER TABLE rp.t.sn ALTER COLUMN id SET NOT NULL")
    }
  }

  test("DROP NOT NULL") {
    s.sql("CREATE TABLE rp.t.nn (id INT NOT NULL, v STRING) USING iceberg")
    s.sql("ALTER TABLE rp.t.nn ALTER COLUMN id DROP NOT NULL")
    s.sql("INSERT INTO rp.t.nn VALUES (NULL, 'a')")
    assert(s.sql("SELECT v FROM rp.t.nn WHERE id IS NULL").count() == 1)
  }
}
