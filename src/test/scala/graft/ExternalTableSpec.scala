package graft

import java.nio.file.{Files, Paths}

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Path-addressed external tables (SURVEY §2.11.4): `LOCATION '...'`
  * puts data+metadata at the given directory; the warehouse home keeps a
  * pointer file so listing/rename/procedures still resolve the table.
  * DROP unregisters and leaves the external tree (EXTERNAL semantics). */
class ExternalTableSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val wh = Files.createTempDirectory("graft-ext-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.ext", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.ext.warehouse", wh)
    s
  }

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    sql("CREATE NAMESPACE IF NOT EXISTS ext.t")
  }

  test("LOCATION table stores data and metadata at the external path") {
    val loc = Files.createTempDirectory("graft-ext-loc").toString
    sql(s"""CREATE TABLE ext.t.pings (id INT, v STRING)
            USING iceberg LOCATION '$loc'""")
    sql("INSERT INTO ext.t.pings VALUES (1,'a'),(2,'b')")
    // the table's tree lives at the external dir, not under the warehouse
    assert(Files.isDirectory(Paths.get(loc, "metadata")))
    assert(Files.isDirectory(Paths.get(loc, "data")))
    assert(!Files.isDirectory(Paths.get(wh, "t", "pings", "metadata")))
    assert(Files.isRegularFile(
      Paths.get(wh, "t", "pings", SnapshotStore.ExternalPointer)))
    // reads resolve through the pointer
    val rows = sql("SELECT id, v FROM ext.t.pings ORDER BY id")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(rows == Seq((1, "a"), (2, "b")))
    // catalog surfaces: listed, described with its location
    assert(sql("SHOW TABLES IN ext.t").collect().map(_.getString(1))
      .contains("pings"))
    // `location` is a Spark-reserved property (hidden from SHOW
    // TBLPROPERTIES) — assert on the committed snapshot instead
    val snapProps = new SnapshotStore(Paths.get(loc)).head().get.properties
    assert(snapProps.get("location").exists(_.contains(loc)), snapProps)
  }

  test("non-local LOCATION schemes are rejected loudly") {
    // Paths.get("s3a://b/t") would silently become a LOCAL "s3a:" dir —
    // the catalog must refuse what its storage backend can't serve
    val e = intercept[Exception] {
      sql("CREATE TABLE ext.t.s3 (id INT) USING iceberg LOCATION 's3a://bucket/t'")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("not supported")), msgs(e).mkString(" | "))
    assert(!Files.exists(Paths.get(wh, "t", "s3a:")))
  }

  test("maintenance procedures follow the pointer") {
    val loc = Files.createTempDirectory("graft-ext-proc").toString
    sql(s"""CREATE TABLE ext.t.mproc (id INT, v STRING)
            USING iceberg LOCATION '$loc'""")
    sql("INSERT INTO ext.t.mproc VALUES (1,'a')")
    sql("INSERT INTO ext.t.mproc VALUES (2,'b')")
    sql("CALL ext.system.compact(`table` => 't.mproc')")
    val st = new SnapshotStore(Paths.get(loc))
    assert(st.head().get.files.size == 1, "compaction did not reach the external store")
    assert(sql("SELECT count(*) FROM ext.t.mproc").collect()(0).getLong(0) == 2L)
  }

  test("DROP unregisters but leaves the external tree; relocation is guarded") {
    val loc = Files.createTempDirectory("graft-ext-drop").toString
    sql(s"""CREATE TABLE ext.t.keep (id INT) USING iceberg LOCATION '$loc'""")
    sql("INSERT INTO ext.t.keep VALUES (7)")
    // a second table cannot claim a location that already holds one
    val e = intercept[Exception] {
      sql(s"CREATE TABLE ext.t.clash (id INT) USING iceberg LOCATION '$loc'")
    }
    assert(e.getMessage.contains("already holds"), e.getMessage)
    sql("DROP TABLE ext.t.keep")
    assert(sql("SHOW TABLES IN ext.t").collect().map(_.getString(1))
      .forall(_ != "keep"))
    // the external tree survives the drop — user-managed data
    assert(Files.isDirectory(Paths.get(loc, "metadata")))
    val dataList = Files.list(Paths.get(loc, "data"))
    try assert(dataList.count() > 0) finally dataList.close()

    // ...and register_table re-attaches it under a new name with its
    // full history intact
    sql(s"CALL ext.system.register_table(`table` => 't.adopted', location => '$loc')")
    val rows = sql("SELECT id FROM ext.t.adopted").collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(7), s"adopted table lost its data: $rows")
    // double-registration of the same name is refused
    val e2 = intercept[Exception] {
      sql(s"CALL ext.system.register_table(`table` => 't.adopted', location => '$loc')")
    }
    assert(e2.getMessage.contains("already exists"), e2.getMessage)
  }
}
