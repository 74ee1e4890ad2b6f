package graft.lake

import java.nio.file.{Files, Path}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.connector.catalog.View
import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** Persistent SQL views (the Polaris/Iceberg view-catalog capability):
  * a view is the stored QUERY TEXT plus the name-resolution context it
  * was created under — one JSON file per view
  * (`<warehouse>/<ns>/<name>.view.json`), written with the same tmp +
  * atomic-move protocol as snapshot refs. Views are files, table dirs
  * are dirs, so the two namespaces can't collide. */
final case class ViewDef(
    sql: String,
    currentCatalog: String,
    currentNamespace: Seq[String],
    schemaJson: String,
    queryColumnNames: Seq[String],
    columnAliases: Seq[String],
    columnComments: Seq[String],
    properties: Map[String, String])

object Views {
  implicit val formats: Formats = DefaultFormats

  val Suffix = ".view.json"

  def path(nsDir: Path, name: String): Path = nsDir.resolve(name + Suffix)

  def exists(nsDir: Path, name: String): Boolean =
    Files.isRegularFile(path(nsDir, name))

  def list(nsDir: Path): Seq[String] = {
    if (!Files.isDirectory(nsDir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    // close the stream: it holds an open directory fd (r12 fd fix)
    val s = Files.list(nsDir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(Suffix))
      .map(_.stripSuffix(Suffix))
      .toSeq.sorted
    finally s.close()
  }

  def write(nsDir: Path, name: String, d: ViewDef, replace: Boolean): Unit = {
    val target = path(nsDir, name)
    val tmp = Files.createTempFile(nsDir, ".view", ".tmp")
    Files.writeString(tmp, Serialization.writePretty(d), UTF_8)
    if (replace)
      Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    else {
      // atomic create-if-absent, same as the snapshot commit protocol
      try { Files.createLink(target, tmp); Files.deleteIfExists(tmp) }
      catch { case e: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp); throw e }
    }
  }

  def read(nsDir: Path, name: String): ViewDef =
    Serialization.read[ViewDef](Files.readString(path(nsDir, name), UTF_8))

  def drop(nsDir: Path, name: String): Boolean =
    Files.deleteIfExists(path(nsDir, name))

  def toView(viewName: String, d: ViewDef): View = new View {
    override def name(): String = viewName
    override def query(): String = d.sql
    override def currentCatalog(): String = d.currentCatalog
    override def currentNamespace(): Array[String] = d.currentNamespace.toArray
    override def schema(): StructType =
      DataType.fromJson(d.schemaJson).asInstanceOf[StructType]
    override def queryColumnNames(): Array[String] = d.queryColumnNames.toArray
    override def columnAliases(): Array[String] = d.columnAliases.toArray
    override def columnComments(): Array[String] = d.columnComments.toArray
    override def properties(): java.util.Map[String, String] = {
      import scala.jdk.CollectionConverters._
      d.properties.asJava
    }
  }
}
