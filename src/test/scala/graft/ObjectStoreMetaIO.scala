package graft

import java.io.IOException
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import graft.lake.MetaIO

/** MetaIO double with OBJECT-STORE semantics instead of POSIX ones —
  * validates the 100 TB story's central claim (SURVEY.md §3.3: commit ≈
  * conditional PUT) by running the lake through a backend that behaves
  * like S3, not like a local filesystem:
  *
  *  - `createExclusive` = conditional PUT (`If-None-Match: *`): an atomic
  *    server-side existence-check-and-put — emulated with a store-wide
  *    lock around check+write, NOT the hard-link trick LocalMetaIO uses.
  *  - `replaceAtomic` = plain PUT of the whole object: readers see old or
  *    new, never a torn write (tmp + move is only the local emulation of
  *    PUT's all-or-nothing visibility).
  *  - `publish` = server-side COPY then DELETE — **two separate
  *    operations**, not an atomic rename. The window where source and
  *    destination both exist is widened by injected latency so code that
  *    accidentally relies on rename atomicity for STAGED files fails here.
  *  - `mkdirs` is a NO-OP: object stores have no directories. Every put
  *    creates the parent directories of the underlying local file on
  *    demand (a PUT to any key just works), so code that relies on a
  *    prior `mkdirs` for its metadata files would break on S3 and breaks
  *    here.
  *  - `delete` is idempotent (S3 DELETE of a missing key succeeds).
  *  - reads are strongly consistent (as modern S3 is, read-after-write).
  *
  * Injectable per-op latency and a transient-fault queue let specs model
  * slow/503-ing storage; counters expose how many of each op ran.
  */
final class ObjectStoreMetaIO(latencyMs: Long = 0L) extends MetaIO {

  /** Transient faults: the next op whose name matches `op` and whose path
    * contains `pathContains` throws (once). Models S3 503 SlowDown /
    * transient 500s. `afterEffect = true` performs the operation and THEN
    * throws — the lost-response case where a conditional PUT landed but
    * the client never learned it. */
  final case class Fault(op: String, pathContains: String, afterEffect: Boolean)
  val faults = new ConcurrentLinkedQueue[Fault]()
  def injectFault(op: String, pathContains: String = "",
      afterEffect: Boolean = false): Unit =
    faults.add(Fault(op, pathContains, afterEffect))

  val opCounts = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()

  // one lock emulates the store's server-side serialization of
  // conditional PUTs; fine at test scale
  private val condLock = new Object

  private def takeFault(name: String, p: Path, after: Boolean): Boolean = {
    val it = faults.iterator()
    while (it.hasNext) {
      val f = it.next()
      if (f.op == name && f.afterEffect == after &&
          p.toString.contains(f.pathContains)) {
        it.remove()
        return true
      }
    }
    false
  }

  /** Entry bookkeeping for every op: count, latency, before-faults. */
  private def op(name: String, p: Path): Unit = {
    opCounts.computeIfAbsent(name, _ => new AtomicLong()).incrementAndGet()
    if (latencyMs > 0) Thread.sleep(latencyMs)
    if (takeFault(name, p, after = false))
      throw new IOException(
        s"injected transient object-store failure: 503 SlowDown on $name $p")
  }

  /** Lost-response emulation: the effect has been applied; now the
    * "network" eats the 200. */
  private def afterOp(name: String, p: Path): Unit =
    if (takeFault(name, p, after = true))
      throw new IOException(
        s"injected lost response after effect applied: $name $p")

  /** PUT = write complete content, then make it visible all-or-nothing. */
  private def put(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, ".put", ".tmp")
    try {
      Files.writeString(tmp, content, UTF_8)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  override def readString(p: Path): String = {
    op("GET", p)
    Files.readString(p, UTF_8)
  }

  override def createExclusive(p: Path, content: String): Unit = {
    op("PUT-if-none-match", p)
    // The store serializes conditional PUTs SERVER-side; locally the
    // kernel plays the server. An in-process lock only emulates that for
    // one JVM — the cross-process chaos gate (ChaosGate) races separate
    // JVMs against one table, so the claim must be kernel-atomic: write
    // the full content to a temp object, then hard-link it to the key
    // (atomic create-exclusive WITH content; EEXIST = precondition
    // failed). This is the local stand-in for the server's atomicity of
    // `If-None-Match: *`, not a protocol reliance on rename — the commit
    // protocol still sees exactly conditional-PUT semantics.
    condLock.synchronized {
      Files.createDirectories(p.getParent)
      val tmp = Files.createTempFile(p.getParent, ".cput", ".tmp")
      try {
        Files.writeString(tmp, content, UTF_8)
        Files.createLink(p, tmp) // FileAlreadyExistsException = 412
      } finally Files.deleteIfExists(tmp)
    }
    afterOp("PUT-if-none-match", p)
  }

  override def replaceAtomic(p: Path, content: String): Unit = {
    op("PUT", p)
    put(p, content)
  }

  override def write(p: Path, content: String): Unit = {
    op("PUT", p)
    put(p, content)
  }

  override def writeBytes(p: Path, bytes: Array[Byte]): Unit = {
    op("PUT", p)
    Files.createDirectories(p.getParent)
    val tmp = Files.createTempFile(p.getParent, ".put", ".tmp")
    try {
      Files.write(tmp, bytes)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }

  override def publish(src: Path, dst: Path): Unit = {
    // server-side COPY ...
    op("COPY", dst)
    Files.createDirectories(dst.getParent)
    Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING)
    // ... then a separate DELETE: no rename atomicity, and the in-between
    // state (both objects visible) lasts at least `latencyMs`
    op("DELETE", src)
    Files.deleteIfExists(src)
  }

  // streams closed via try/finally — unclosed Files.list/walk holds a
  // directory fd each (the r12 suite fd-exhaustion fix, as LocalMetaIO)
  override def list(dir: Path): Seq[Path] = {
    op("LIST", dir)
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }
  }

  override def listTree(root: Path): Seq[Path] = {
    op("LIST", root)
    if (!Files.exists(root)) Seq.empty
    else {
      val s = Files.walk(root)
      try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      finally s.close()
    }
  }

  override def isDirectory(p: Path): Boolean = Files.isDirectory(p)
  override def isFile(p: Path): Boolean = Files.isRegularFile(p)
  override def exists(p: Path): Boolean = Files.exists(p)

  /** Object stores have no directories — creation must be implicit in PUT. */
  override def mkdirs(p: Path): Unit =
    opCounts.computeIfAbsent("MKDIR-noop", _ => new AtomicLong()).incrementAndGet()

  override def size(p: Path): Long = Files.size(p)

  override def delete(p: Path): Boolean = {
    op("DELETE", p)
    Files.deleteIfExists(p)
  }

  override def deleteTree(root: Path): Unit = {
    op("DELETE", root)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      val all = try s.iterator().asScala.toSeq finally s.close()
      all.reverse.foreach(Files.deleteIfExists(_))
    }
  }
}

/** Catalog wired to the shared object-store fake — registered by class
  * name in specs, so every catalog-driven path (DDL, scans, writes,
  * procedures, row-level ops) runs against object-store semantics. */
object ObjectStoreTestBackend {
  // 2ms widens the publish copy→delete window without slowing suites much
  val io = new ObjectStoreMetaIO(latencyMs = 2L)
}

class ObjectStoreCatalog extends graft.lake.GraftCatalog {
  override protected val io: MetaIO = ObjectStoreTestBackend.io
}
