package graft

import java.nio.file.Files

import org.apache.spark.sql.sources.EqualTo
import org.apache.spark.sql.types._

import graft.lake._

/** One-off probe of the metadata plane at a 200k-file shape (200 commits
  * × 1000 synthetic files — no parquet, pure metadata): measures what the
  * manifest-list design claims. Run with
  * `sbt "Test/runMain graft.MetadataScaleProbe"`; numbers go to
  * BASELINE.md by hand. Not a spec: wall-clock asserts would flake on a
  * loaded host. */
object MetadataScaleProbe {

  private def timed[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $label%-46s ${(System.nanoTime() - t0) / 1e6}%10.1f ms")
    r
  }

  def main(args: Array[String]): Unit = {
    val commits = 200
    val filesPer = 1000
    val dir = Files.createTempDirectory("graft-scale-probe")
    val store = new SnapshotStore(dir)
    store.init()
    val schemaJson = StructType(Seq(StructField("id", LongType))).json

    def mkFiles(c: Int): Seq[DataFile] = (0 until filesPer).map { i =>
      val id = c.toLong * 1000000 + i * 100
      DataFile(s"data/f-$c-$i.parquet", rowCount = 1000, sizeBytes = 1 << 20,
        partitionValues = Map.empty,
        stats = Map("id" -> ColumnStats(
          Some(id.toString), Some((id + 99).toString), Some(0))),
        seq = Snapshot.UnassignedSeq)
    }

    println(s"building: $commits commits x $filesPer files")
    val t0 = System.nanoTime()
    store.commit(_ => Snapshot(0, None, 0, "create", schemaJson,
      Seq.empty, Map.empty, Seq.empty, Map.empty))
    (0 until commits).foreach { c =>
      store.commitAppend(mkFiles(c)) { (p, st) =>
        p.copy(timestampMs = c, operation = "append",
          summary = Map("added-files" -> st.size.toString))
      }
    }
    val buildMs = (System.nanoTime() - t0) / 1e6
    println(f"  total build: $buildMs%.0f ms (${buildMs / commits}%.1f ms/append commit)")

    // cold store on a copy: the chunk cache is keyed by absolute path
    val cold = Files.createTempDirectory("graft-scale-probe-cold")
    import scala.jdk.CollectionConverters._
    val walkStream = Files.walk(dir)
    val walked = try walkStream.iterator().asScala.toSeq
      finally walkStream.close()
    walked.foreach { p =>
      val t = cold.resolve(dir.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
    val coldStore = new SnapshotStore(cold)

    println(s"probing (cold): ${commits * filesPer} files, $commits chunks")
    val head = timed("head() (snapshot load, no chunks)")(coldStore.head().get)
    timed("fileCount + totalRows from rollups") {
      assert(head.fileCount == commits.toLong * filesPer)
      assert(head.totalRows == commits.toLong * filesPer * 1000)
    }
    val hit = timed("filesForScan, point filter (1 chunk)") {
      coldStore.filesForScan(head, Seq(EqualTo("id", 42L * 1000000 + 500)))
    }
    assert(hit.size == filesPer, s"got ${hit.size}")
    val pruned = timed("  + per-file prune of that chunk") {
      StatsPruner.prune(hit, Seq(EqualTo("id", 42L * 1000000 + 500)), Seq.empty)
    }
    assert(pruned.size == 1)
    timed("full materialization (all chunks, parallel)") {
      assert(head.files.size == commits * filesPer)
    }
    timed("full per-file prune (driver, parallel)") {
      StatsPruner.prune(head.files, Seq(EqualTo("id", 7L)), Seq.empty)
    }
    timed("metadata-only commit (property change)") {
      coldStore.commit { prev =>
        val p = prev.get
        p.copy(timestampMs = 1, operation = "evolve",
          properties = p.properties + ("k" -> "v"), summary = Map.empty)
      }
    }
    timed("commitAppend at 200k files") {
      coldStore.commitAppend(mkFiles(commits + 1)) { (p, st) =>
        p.copy(timestampMs = 2, operation = "append",
          summary = Map("added-files" -> st.size.toString))
      }
    }
    LocalMetaIO.deleteTree(dir)
    LocalMetaIO.deleteTree(cold)
    println("done")
  }
}
