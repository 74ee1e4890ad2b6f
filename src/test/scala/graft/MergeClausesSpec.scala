package graft
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.lake._
class MergeClausesSpec extends AnyFunSuite {
  test("MERGE with NOT MATCHED BY SOURCE deletes rows absent from source") {
    val wh = Files.createTempDirectory("graft-nmbs").toString
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.nmbs", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.nmbs.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS nmbs.t")
    s.sql("CREATE TABLE nmbs.t.tgt (id INT, v STRING) USING iceberg")
    s.sql("INSERT INTO nmbs.t.tgt VALUES (1,'a'),(2,'b'),(3,'c')")
    s.sql("CREATE TABLE nmbs.t.src (id INT, v STRING) USING iceberg")
    s.sql("INSERT INTO nmbs.t.src VALUES (2,'B'),(4,'D')")
    s.sql("""MERGE INTO nmbs.t.tgt t USING nmbs.t.src s ON t.id = s.id
             WHEN MATCHED THEN UPDATE SET t.v = s.v
             WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
             WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    val rows = s.sql("SELECT id, v FROM nmbs.t.tgt ORDER BY id").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((2,"B"),(4,"D")), s"got $rows")
  }
}
