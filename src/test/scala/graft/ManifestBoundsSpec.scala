package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.sources.{EqualTo, GreaterThan, IsNull, LessThan}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.lake._

/** Manifest-list pruning (round-3): every chunk ref carries per-column
  * bounds merged over its files, a filtered scan consults the bounds
  * BEFORE loading any chunk, and a read snapshot materializes its file
  * list lazily — so plan-time metadata IO and driver memory scale with
  * the data a query touches, not with the table. */
class ManifestBoundsSpec extends AnyFunSuite {

  private def cs(mn: String, mx: String, nulls: Long = 0): ColumnStats =
    ColumnStats(Some(mn), Some(mx), Some(nulls))

  private def file(i: Long, stats: Map[String, ColumnStats]): DataFile =
    DataFile(s"data/f$i.parquet", rowCount = 10, sizeBytes = 100,
      partitionValues = Map.empty, stats = stats,
      seq = Snapshot.UnassignedSeq)

  // ---------- mergeBounds: conservative dual-ordering merge ----------

  test("numeric stats merge to the widest range; null counts sum") {
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("id" -> cs("5", "20", 1))),
      file(2, Map("id" -> cs("30", "40", 2)))))
    assert(merged("id") == ColumnStats(Some("5"), Some("40"), Some(3)))
  }

  test("pure-string stats merge lexicographically") {
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("s" -> cs("apple", "pear"))),
      file(2, Map("s" -> cs("fig", "zucchini")))))
    assert(merged("s") == ColumnStats(Some("apple"), Some("zucchini"), Some(0)))
  }

  test("numeric-looking bounds never answer string-literal comparisons") {
    // a STRING column holding '9' and '10' orders lexicographically in
    // Spark ('10' < '9'), but the merged bound is the numeric extreme —
    // the domain guard must refuse the comparison and keep the chunk
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("v" -> cs("9", "9"))),
      file(2, Map("v" -> cs("10", "10")))))
    assert(merged("v") == ColumnStats(Some("9"), Some("10"), Some(0)))
    val r = ManifestRef("m", 1, 2, 20, 200, merged)
    // lex: '5' > '9' > '10', so files DO match — a numeric read of the
    // bounds ([9,10] ∌ 5) would wrongly prune
    assert(StatsPruner.chunkMightMatch(r, Seq(EqualTo("v", "5"))))
    assert(StatsPruner.chunkMightMatch(r, Seq(GreaterThan("v", "5"))))
    // numeric literals compare numerically as usual
    assert(!StatsPruner.chunkMightMatch(r, Seq(EqualTo("v", 50L))))
  }

  test("mixed numeric/non-numeric values yield no bound") {
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("v" -> cs("9", "9"))),
      file(2, Map("v" -> cs("apple", "apple")))))
    assert(merged.get("v").forall(st => st.min.isEmpty && st.max.isEmpty))
  }

  test("a column absent from any file contributes no chunk bound") {
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("a" -> cs("1", "2"), "b" -> cs("1", "2"))),
      file(2, Map("a" -> cs("3", "4")))))
    assert(merged.contains("a"))
    assert(!merged.contains("b"))
  }

  test("missing min/max/nullCount in one file drops that component only") {
    val merged = StatsPruner.mergeBounds(Seq(
      file(1, Map("a" -> ColumnStats(Some("1"), None, Some(0)))),
      file(2, Map("a" -> ColumnStats(Some("3"), Some("9"), None)))))
    assert(merged("a") == ColumnStats(Some("1"), None, None))
  }

  // ---------- chunkMightMatch ----------

  private def ref(bounds: Map[String, ColumnStats]): ManifestRef =
    ManifestRef("metadata/manifests/m-1-x.json", 1, 10, 100, 1000, bounds)

  test("chunkMightMatch prunes on bounds, keeps on overlap or no info") {
    val r = ref(Map("id" -> cs("100", "199")))
    assert(!StatsPruner.chunkMightMatch(r, Seq(EqualTo("id", 50L))))
    assert(StatsPruner.chunkMightMatch(r, Seq(EqualTo("id", 150L))))
    assert(!StatsPruner.chunkMightMatch(r, Seq(GreaterThan("id", 500L))))
    assert(StatsPruner.chunkMightMatch(r, Seq(LessThan("id", 101L))))
    assert(!StatsPruner.chunkMightMatch(r, Seq(IsNull("id"))))
    // unbounded column / legacy ref with no bounds: always load
    assert(StatsPruner.chunkMightMatch(r, Seq(EqualTo("other", 1L))))
    assert(StatsPruner.chunkMightMatch(ref(Map.empty), Seq(EqualTo("id", 1L))))
  }

  // ---------- store level: lazy materialization + chunk skipping ----------

  /** MetaIO wrapper counting manifest-chunk reads (the IO the bounds are
    * meant to avoid). */
  private final class CountingIO extends MetaIO {
    val chunkReads = new java.util.concurrent.atomic.AtomicInteger
    private val inner = LocalMetaIO
    override def readString(p: Path): String = {
      if (p.toString.contains("metadata/manifests/")) chunkReads.incrementAndGet()
      inner.readString(p)
    }
    override def createExclusive(p: Path, content: String): Unit = inner.createExclusive(p, content)
    override def replaceAtomic(p: Path, content: String): Unit = inner.replaceAtomic(p, content)
    override def write(p: Path, content: String): Unit = inner.write(p, content)
    override def writeBytes(p: Path, bytes: Array[Byte]): Unit = inner.writeBytes(p, bytes)
    override def publish(src: Path, dst: Path): Unit = inner.publish(src, dst)
    override def list(dir: Path): Seq[Path] = inner.list(dir)
    override def listTree(root: Path): Seq[Path] = inner.listTree(root)
    override def isDirectory(p: Path): Boolean = inner.isDirectory(p)
    override def isFile(p: Path): Boolean = inner.isFile(p)
    override def exists(p: Path): Boolean = inner.exists(p)
    override def mkdirs(p: Path): Unit = inner.mkdirs(p)
    override def size(p: Path): Long = inner.size(p)
    override def delete(p: Path): Boolean = inner.delete(p)
    override def deleteTree(root: Path): Unit = inner.deleteTree(root)
  }

  private val schemaJson =
    StructType(Seq(StructField("id", LongType))).json

  /** Three commits of 100 synthetic files each with disjoint id ranges
    * ([0,999], [1000,1999], [2000,2999]) → three chunks, one per commit
    * sequence. Returns a store over a COLD COPY of the table dir: the
    * process-wide chunk cache is keyed by absolute path, so the copy's
    * chunks have never been loaded and every read is observable. */
  private def buildStore(io: CountingIO): SnapshotStore = {
    val dir = Files.createTempDirectory("graft-bounds")
    val store = new SnapshotStore(dir)
    store.init()
    (0 until 3).foreach { c =>
      val batch = (0 until 100).map { i =>
        val id = c * 1000 + i * 10
        file(c * 100L + i, Map("id" -> cs(id.toString, (id + 9).toString)))
      }
      store.commit { prev =>
        Snapshot(0, None, timestampMs = c, operation = "append",
          schemaJson = schemaJson, partitionSpec = Seq.empty,
          properties = Map.empty,
          files = prev.map(_.files).getOrElse(Seq.empty) ++ batch,
          summary = Map.empty)
      }
    }
    val cold = Files.createTempDirectory("graft-bounds-cold")
    copyTree(dir, cold)
    new SnapshotStore(cold, io = io)
  }

  private def copyTree(src: Path, dst: Path): Unit = {
    import scala.jdk.CollectionConverters._
    val st = Files.walk(src)
    val all = try st.iterator().asScala.toSeq finally st.close()
    all.foreach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  test("metadata answers and bounds-pruned scans avoid chunk loads; lazy files force on demand") {
    val io = new CountingIO
    val store = buildStore(io)
    io.chunkReads.set(0)

    // head() + count/size metadata: zero chunk reads (ref rollups)
    val head = store.head().get
    assert(head.manifests.size == 3)
    assert(head.manifests.forall(_.bounds.get("id").exists(st =>
      st.min.isDefined && st.max.isDefined)))
    assert(head.fileCount == 300L)
    assert(head.totalRows == 3000L)
    assert(head.totalBytes == 30000L)
    assert(io.chunkReads.get == 0, "pure metadata access read a chunk")

    // a selective filter loads ONLY the one chunk whose bounds overlap
    val hit = store.filesForScan(head, Seq(EqualTo("id", 1500L)))
    assert(io.chunkReads.get == 1,
      s"expected 1 chunk read, got ${io.chunkReads.get}")
    assert(hit.size == 100)
    val pruned = StatsPruner.prune(hit, Seq(EqualTo("id", 1500L)), Seq.empty)
    assert(pruned.size == 1 && pruned.head.stats("id").min.contains("1500"))

    // chunk-pruned + per-file == naive full-list prune
    val naive = StatsPruner.prune(head.files, Seq(EqualTo("id", 1500L)), Seq.empty)
    assert(pruned == naive)

    // forcing the lazy list loaded the remaining chunks exactly once
    assert(head.files.size == 300)
    assert(io.chunkReads.get == 3)
    assert(head.files.size == 300) // memoized: no further reads
    assert(io.chunkReads.get == 3)
  }

  test("filesForScan falls back to the full list when nothing can be skipped") {
    val io = new CountingIO
    val store = buildStore(io)
    val head = store.head().get
    // matches every chunk's range → no skipping, full (lazy) list
    val all = store.filesForScan(head, Seq(GreaterThan("id", -1L)))
    assert(all.size == 300)
    // no filters → the lazy seq itself
    assert(store.filesForScan(head, Seq.empty).size == 300)
  }

  test("appends and metadata-only commits never materialize the parent list") {
    val io = new CountingIO
    val store = buildStore(io)
    io.chunkReads.set(0)

    // delta append: parent chunks reused by reference, zero chunks READ
    val added = (0 until 10).map(i =>
      file(900 + i, Map("id" -> cs((9000 + i).toString, (9000 + i).toString))))
    val before = store.head().get.manifests.map(_.path).toSet
    val snap = store.commitAppend(added) { (p, stamped) =>
      p.copy(timestampMs = 99, operation = "append",
        summary = Map("added-files" -> stamped.size.toString))
    }
    assert(io.chunkReads.get == 0, "append materialized the parent file list")
    assert(before.subsetOf(snap.manifests.map(_.path).toSet))
    assert(snap.manifests.size == 4) // 3 reused + 1 new seq group
    assert(snap.manifests.exists(r => r.seq == snap.version &&
      r.bounds.get("id").exists(_.min.contains("9000"))))
    assert(snap.fileCount == 310 && snap.totalRows == 3100)

    // metadata-only commit through the GENERIC path (files passed by
    // reference): refs reused wholesale, still zero chunk reads
    store.commit { prev =>
      val p = prev.get
      p.copy(timestampMs = 100, operation = "evolve",
        properties = p.properties + ("k" -> "v"), summary = Map.empty)
    }
    assert(io.chunkReads.get == 0, "metadata-only commit touched chunks")
    val head = store.head().get
    assert(head.properties("k") == "v")
    assert(head.fileCount == 310)

    // everything is still fully readable once something forces
    assert(head.files.size == 310)
    assert(head.files.count(_.stats("id").min.exists(_.toLong >= 9000L)) == 10)
  }

  test("a LIMIT prefix loads only the chunks its row rollups require") {
    val io = new CountingIO
    val store = buildStore(io)
    io.chunkReads.set(0)
    val head = store.head().get
    // 10 rows need one file; the first chunk's 1000-row rollup covers it
    val prefix = store.filesForLimit(head, 10L)
    assert(io.chunkReads.get == 1,
      s"expected 1 chunk read, got ${io.chunkReads.get}")
    assert(prefix.size == 100 && prefix.map(_.rowCount).sum >= 10L)
    // asking beyond the table loads everything, exactly once
    assert(store.filesForLimit(head, 10000L).size == 300)
    assert(io.chunkReads.get == 3)
  }

  test("a stream window containing an expired version fails loudly, incl. at the window end") {
    val io = new CountingIO
    val store = buildStore(io) // versions 1..3, all appends
    val stream = new GraftMicroBatchStream(store, StructType(Seq(
      StructField("id", LongType))), "unused-ck")
    def plan(from: Long, to: Long) =
      stream.planInputPartitions(GraftOffset(from), GraftOffset(to))
    assert(plan(0, 3).length == 300)
    // expire v2 out from under a pending window
    assert(io.delete(store.tableDir.resolve("metadata").resolve("v2.json")))
    intercept[IllegalStateException](plan(0, 3)) // hole inside the window
    intercept[IllegalStateException](plan(1, 2)) // hole AT the window end
    assert(plan(2, 3).length == 100) // consumed-and-expired prefix is fine
  }

  test("a reused parent chunk keeps its bounds across commits") {
    val io = new CountingIO
    val store = buildStore(io)
    val v1Refs = store.read(1).manifests
    val headRefs = store.head().get.manifests
    val reused = headRefs.filter(r => v1Refs.exists(_.path == r.path))
    assert(reused.nonEmpty)
    assert(reused.forall(_.bounds.nonEmpty))
  }
}
