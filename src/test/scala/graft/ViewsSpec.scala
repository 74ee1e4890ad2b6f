package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Persistent SQL views through the DSv2 ViewCatalog implementation.
  *
  * NOTE: Spark 4.1.2 ships the ViewCatalog API but its analyzer does not
  * yet route `CREATE VIEW` / view resolution through V2 catalogs (no
  * engine class references the interface — verified against the local
  * jars), so coverage here drives the catalog API directly and executes
  * a view by running its stored query text. When Spark wires V2 view
  * resolution, the SQL surface lights up on this same implementation. */
class ViewsSpec extends AnyFunSuite {

  private val wh = Files.createTempDirectory("graft-views-wh").toString

  private lazy val spark = {
    val s = SparkSpec.session
    s.conf.set("spark.sql.catalog.vw", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.vw.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS vw.t")
    s
  }

  private def catalog: GraftCatalog = {
    import org.apache.spark.sql.connector.catalog.CatalogPlugin
    spark.sessionState.catalogManager.catalog("vw")
      .asInstanceOf[GraftCatalog]
  }

  private def ident(name: String) = Identifier.of(Array("t"), name)

  private def info(name: String, sql: String, schema: StructType) =
    new ViewInfo(ident(name), sql, "vw", Array("t"), schema,
      schema.fieldNames, Array.empty, Array.empty,
      java.util.Collections.emptyMap[String, String]())

  test("create, load, run, replace, rename, and drop a view") {
    spark.sql("CREATE TABLE vw.t.base (id INT, v STRING) USING iceberg")
    spark.sql("INSERT INTO vw.t.base VALUES (1, 'a'), (2, 'b'), (3, 'c')")

    val sql = "SELECT id, v FROM vw.t.base WHERE id > 1"
    val schema = spark.sql(sql).schema
    catalog.createView(info("big", sql, schema))

    val loaded = catalog.loadView(ident("big"))
    assert(loaded.query() == sql)
    assert(loaded.currentCatalog() == "vw")
    assert(spark.sql(loaded.query()).count() == 2)
    // the view tracks base-table changes (stored as text, not a snapshot)
    spark.sql("INSERT INTO vw.t.base VALUES (4, 'd')")
    assert(spark.sql(loaded.query()).count() == 3)

    assert(catalog.listViews("t").map(_.name()).contains("big"))
    intercept[Exception] { catalog.createView(info("big", sql, schema)) }

    catalog.replaceView(
      info("big", "SELECT id FROM vw.t.base WHERE id > 3", schema), false)
    assert(spark.sql(catalog.loadView(ident("big")).query())
      .collect().map(_.getInt(0)).toSeq == Seq(4))

    catalog.renameView(ident("big"), ident("bigger"))
    assert(!catalog.viewExists(ident("big")))
    assert(catalog.dropView(ident("bigger")))
    assert(catalog.listViews("t").isEmpty)
  }

  test("views persist across catalog instances") {
    catalog.createView(info("persisted", "SELECT 42 AS x",
      spark.sql("SELECT 42 AS x").schema))
    val fresh = new GraftCatalog
    fresh.initialize("vw2",
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", wh)))
    assert(fresh.loadView(ident("persisted")).query() == "SELECT 42 AS x")
  }

  test("name collisions between views and tables are rejected") {
    spark.sql("CREATE TABLE vw.t.claimed (id INT) USING iceberg")
    intercept[Exception] {
      catalog.createView(info("claimed", "SELECT 1 AS one",
        spark.sql("SELECT 1 AS one").schema))
    }
    catalog.createView(info("vclaimed", "SELECT 1 AS one",
      spark.sql("SELECT 1 AS one").schema))
    intercept[Exception] {
      spark.sql("CREATE TABLE vw.t.vclaimed (id INT) USING iceberg")
    }
  }

  test("non-cascade namespace drop refuses when only views remain") {
    spark.sql("CREATE NAMESPACE vw.only_views")
    catalog.createView(new ViewInfo(
      Identifier.of(Array("only_views"), "v"), "SELECT 1 AS one",
      "vw", Array("only_views"), spark.sql("SELECT 1 AS one").schema,
      Array("one"), Array.empty, Array.empty,
      java.util.Collections.emptyMap[String, String]()))
    intercept[Exception] { spark.sql("DROP NAMESPACE vw.only_views") }
    spark.sql("DROP NAMESPACE vw.only_views CASCADE")
  }

  test("UPSTREAM WATCH: SQL CREATE VIEW still bypasses V2 view catalogs") {
    // Spark 4.1.2 ships the org.apache.spark.sql.connector.catalog
    // .ViewCatalog interface but NO analyzer rule resolves views through
    // it: spark-catalyst has only the session-catalog view paths
    // (ResolvedPersistentView et al reference V1 metadata), and
    // ResolveSessionCatalog rejects CREATE VIEW against any non-session
    // catalog. This test pins that behavior. THE DAY IT FAILS, Spark has
    // wired V2 view resolution — delete this test and light up the SQL
    // surface on GraftCatalog's existing create/load/replace/drop
    // implementation (Views.scala), which already stores query text +
    // resolution context in the layout the API mandates.
    spark.sql("CREATE TABLE IF NOT EXISTS vw.t.watchbase (id INT) USING iceberg")
    val e = intercept[Exception] {
      spark.sql("CREATE VIEW vw.t.sql_view AS SELECT id FROM vw.t.watchbase")
    }
    assert(e.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"unexpected failure class: ${e.getClass} — did V2 view DDL land?")
  }
}
