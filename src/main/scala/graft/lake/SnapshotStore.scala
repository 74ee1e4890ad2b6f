package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption, FileAlreadyExistsException}
import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** Filesystem snapshot store with the reference's commit semantics
  * (`README.md:124`: "atomic pointer swaps" + optimistic concurrency;
  * layout `README.md:169-176`).
  *
  * Layout per table:
  * {{{
  *   <tableDir>/data/<uuid>.parquet
  *   <tableDir>/metadata/v<N>.json          // immutable snapshot
  *   <tableDir>/metadata/version-hint.text  // current version pointer
  * }}}
  *
  * Commit protocol (§3.3 of SURVEY.md): write `v<N+1>.json` with
  * CREATE_NEW (fails if a concurrent committer won the race), then swap the
  * hint with an atomic move. A reader that catches the store between the
  * two steps still resolves the head by scanning for max N — the hint is a
  * hint, not the source of truth. Losing a race retries the commit function
  * on the new head (optimistic concurrency). On object stores this maps to
  * conditional PUT (if-none-match) — same protocol, different primitive.
  */
/** @param branch None = the main snapshot chain; Some(name) = the chain
  *               under `metadata/branches/<name>` (same layout, same
  *               shared `data/` dir — a branch commits metadata only).
  *               Created by `create_branch`, published by `fast_forward`,
  *               removed by `drop_branch` (Procedures). */
final class SnapshotStore(val tableDir: Path,
    val branch: Option[String] = None) {

  private def metaDir: Path = branch match {
    case None => tableDir.resolve("metadata")
    case Some(b) => tableDir.resolve("metadata").resolve("branches").resolve(b)
  }
  def dataDir: Path = tableDir.resolve("data")

  /** Names of existing branches (main store only). */
  def listBranches(): Seq[String] = {
    val dir = tableDir.resolve("metadata").resolve("branches")
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
  }

  def branchStore(name: String): SnapshotStore = {
    require(branch.isEmpty, "branches fork from the main chain only")
    new SnapshotStore(tableDir, Some(name))
  }

  /** Seed a NEW branch chain with an existing snapshot (kept at its
    * original version so the fork point is recorded as the chain's first
    * version). Fails if the branch already has that version. */
  def seed(snapshot: Snapshot): Unit = {
    Files.createDirectories(metaDir)
    val target = versionFile(snapshot.version)
    val tmp = Files.createTempFile(metaDir, ".seed", ".tmp")
    Files.writeString(tmp, Snapshot.toJson(snapshot), UTF_8)
    Files.createLink(target, tmp)
    Files.deleteIfExists(tmp)
    swapHint(snapshot.version)
  }
  private def hintFile: Path = metaDir.resolve("version-hint.text")
  private def versionFile(v: Long): Path = metaDir.resolve(s"v$v.json")

  def exists: Boolean = Files.isDirectory(metaDir)

  def init(): Unit = {
    Files.createDirectories(metaDir)
    Files.createDirectories(dataDir)
  }

  /** Head version by hint, verified/corrected by directory listing. */
  def currentVersion(): Option[Long] = {
    val hinted =
      if (Files.exists(hintFile))
        scala.util.Try(Files.readString(hintFile).trim.toLong).toOption
      else None
    // Trust the hint only if that snapshot exists; otherwise (or if newer
    // snapshots exist past the hint — a crash between steps) scan.
    val scanned = listVersions().maxOption
    (hinted, scanned) match {
      case (Some(h), Some(s)) => Some(math.max(h, s))
      case (_, s)             => s
    }
  }

  def listVersions(): Seq[Long] =
    if (!Files.isDirectory(metaDir)) Seq.empty
    else Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json")
      }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .toSeq.sorted

  def read(version: Long): Snapshot =
    Snapshot.fromJson(Files.readString(versionFile(version)))

  def head(): Option[Snapshot] = currentVersion().map(read)

  /** Latest snapshot with commit timestamp <= tsMillis. */
  def asOfTimestamp(tsMillis: Long): Option[Snapshot] =
    listVersions().map(read).filter(_.timestampMs <= tsMillis)
      .sortBy(_.version).lastOption

  /** Optimistic-concurrency commit: builds the next snapshot from the
    * current head, retries on lost races. Returns the committed snapshot. */
  def commit(build: Option[Snapshot] => Snapshot, maxRetries: Int = 10): Snapshot = {
    var attempt = 0
    while (true) {
      val head0 = head()
      val next0 = build(head0)
      val v = head0.map(_.version + 1).getOrElse(1L)
      // stamp commit sequences: files added by THIS commit carry the
      // UnassignedSeq placeholder (one central site — no builder can
      // forget, and retries restamp against the new head's version)
      val next = next0.copy(
        version = v,
        parentVersion = head0.map(_.version),
        files = next0.files.map(f =>
          if (f.seq == Snapshot.UnassignedSeq) f.copy(seq = v) else f),
        deleteFiles = next0.deleteFiles.map(d =>
          if (d.seq == Snapshot.UnassignedSeq) d.copy(seq = v) else d))
      val target = versionFile(next.version)
      val tmp = Files.createTempFile(metaDir, ".commit", ".tmp")
      try {
        Files.writeString(tmp, Snapshot.toJson(next), UTF_8)
        // Hard-link creation is atomic and fails if the target exists —
        // no TOCTOU window (Files.move without REPLACE_EXISTING stats the
        // target first, which races). A lost race → retry on the new head.
        Files.createLink(target, tmp)
        Files.deleteIfExists(tmp)
        swapHint(next.version)
        return next
      } catch {
        case _: FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          attempt += 1
          if (attempt > maxRetries)
            throw new IllegalStateException(
              s"commit lost $maxRetries races on $tableDir")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---------- named refs (tags): name → pinned snapshot version ----------

  private def refsDir: Path = metaDir.resolve("refs")

  /** Tag names double as file names — restrict to a safe charset (also
    * keeps `VERSION AS OF '<name>'` unambiguous vs numeric versions). */
  private def validateRefName(name: String): Unit =
    require(name.matches("[A-Za-z][A-Za-z0-9._-]*"),
      s"invalid tag name '$name' (want letter first, then [A-Za-z0-9._-])")

  /** Named snapshot refs — `VERSION AS OF 'name'` resolves through this.
    * One small file PER ref (`metadata/refs/<name>`), each updated with
    * its own tmp+atomic-move: concurrent create/drop of DIFFERENT tags
    * can't lose each other's update (a shared map file would). */
  def refs(): Map[String, Long] =
    if (!Files.isDirectory(refsDir)) Map.empty
    else Files.list(refsDir).iterator().asScala.flatMap { p =>
      scala.util.Try(
        p.getFileName.toString -> Files.readString(p, UTF_8).trim.toLong).toOption
    }.toMap

  def setRef(name: String, version: Long): Unit = {
    validateRefName(name)
    require(listVersions().contains(version),
      s"no snapshot v$version to tag as '$name'")
    Files.createDirectories(refsDir)
    val tmp = Files.createTempFile(refsDir, ".ref", ".tmp")
    Files.writeString(tmp, version.toString, UTF_8)
    Files.move(tmp, refsDir.resolve(name), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def dropRef(name: String): Unit = {
    validateRefName(name)
    Files.deleteIfExists(refsDir.resolve(name))
  }

  private def swapHint(v: Long): Unit = {
    val tmp = Files.createTempFile(metaDir, ".hint", ".tmp")
    Files.writeString(tmp, v.toString, UTF_8)
    Files.move(tmp, hintFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Delete the whole table directory tree — or, on a branch store, just
    * the branch's metadata chain (shared data files stay; orphan cleanup
    * reclaims any the main chain never referenced). */
  def drop(): Unit = {
    val root = branch match {
      case Some(_) => metaDir
      case None => tableDir
    }
    if (Files.exists(root)) {
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
