package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** Atomic snapshot manifests — the commit protocol behind
  * [[Catalog.commitAppend]] / [[Catalog.commitOverwrite]].
  *
  * A manifest-committed table keeps its data files in the normal (optionally
  * Hive-partitioned) layout under the table root, plus a `_manifests/`
  * directory of versioned snapshot files. Each snapshot lists EXACTLY the
  * data files that make up the table at that version (paths relative to the
  * table root), the partition columns, and the last committed streaming
  * batch id. The single-file rename that publishes `vNNN.manifest` is the
  * commit point:
  *
  *  - a reader resolves the latest committed snapshot and reads only its
  *    files — data staged or moved by an in-flight (or crashed) append is
  *    invisible until its manifest lands, so a torn append can never expose
  *    partial rows;
  *  - an overwrite (schema migration, [[Catalog.save]]) publishes a snapshot
  *    listing only the new files — readers switch atomically from the old
  *    file set to the new with no window where the table is missing
  *    (the delete+rename swap this replaces had one);
  *  - a replayed streaming batch (`batchId <= lastBatchId`) is skipped
  *    before any data is written, making append-path ingest exactly-once
  *    WITHOUT per-table `__batch_id` partitions and anti-join probes.
  *
  * The reference relies on idempotent re-runs for its retry semantics
  * (`dag/financial_monitoring_dag.py:45-50` retries,
  * `scripts/transform_script:17-24` WRITE_TRUNCATE); a torn append violates
  * that. This is the append-path equivalent: every commit is all-or-nothing.
  *
  * Scale notes. The snapshot doubles as the file listing, so a 100 TB read
  * plans from one small file instead of a recursive directory listing over
  * ~10^5 objects (the object-store listing is usually the slowest part of
  * query planning at that size). Each commit rewrites the full list —
  * O(files) metadata per commit, the same trade the table-format systems
  * make; compact data files (or the manifest itself) when file count, not
  * data size, dominates. Concurrent publishers of the same version are
  * serialized by an atomic create-if-absent `.lock` marker (see
  * [[publish]]): exactly one wins, the loser reliably throws, and a lock
  * orphaned by a crashed writer is broken after [[LockStaleMs]]. The
  * intended deployment model is still one LIVE writer per table (the
  * streaming model used throughout) — the lock turns a violated assumption
  * into a loud error instead of a silent lost commit; on object stores,
  * back the exclusive create with a conditional put.
  */
private[core] object Manifest {

  /** One committed table version: the file set is exact and exhaustive. */
  final case class Snapshot(version: Long, partitions: Seq[String],
      lastBatchId: Option[Long], files: Seq[String])

  /** Marker directory; underscore-prefixed so Spark's own directory
    * listings ignore it. Its presence is what makes a table
    * manifest-committed. */
  val DirName = "_manifests"
  private val Header = "graft-manifest-v1"

  def dir(table: Path): Path = new Path(table, DirName)

  private def fileName(version: Long) = f"v$version%020d.manifest"

  /** All committed snapshot versions, ascending. In-flight `.tmp-*` files
    * are not commits and are ignored. */
  def versions(fs: FileSystem, table: Path): Seq[Long] = {
    val d = dir(table)
    if (!fs.exists(d)) return Nil
    fs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      .sorted.toSeq
  }

  /** Latest committed snapshot, if any. */
  def latest(fs: FileSystem, table: Path): Option[Snapshot] =
    versions(fs, table).lastOption.map(read(fs, table, _))

  private def crc(files: Seq[String]): String = {
    val c = new java.util.zip.CRC32()
    c.update(files.mkString("\n").getBytes("UTF-8"))
    java.lang.Long.toHexString(c.getValue)
  }

  def read(fs: FileSystem, table: Path, version: Long): Snapshot = {
    val in = fs.open(new Path(dir(table), fileName(version)))
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    require(lines.headOption.contains(Header),
      s"unrecognized manifest header in $table v$version")
    val partitions = lines(1).stripPrefix("partitions=") match {
      case "" => Nil
      case s => s.split(",").toSeq
    }
    val lastBatch = lines(2).stripPrefix("lastBatchId=") match {
      case "-" => None
      case s => Some(s.toLong)
    }
    val files = lines.drop(4)
    // the rename publish is atomic, but storage can still rot: a snapshot
    // whose file list no longer matches its checksum must fail the read,
    // not silently drop table content
    val expected = lines(3).stripPrefix("checksum=")
    if (crc(files) != expected)
      throw new java.io.IOException(
        s"corrupt manifest $table v$version: file-list checksum mismatch " +
          s"(expected $expected, computed ${crc(files)})")
    Snapshot(version, partitions, lastBatch, files)
  }

  /** A lock older than this with no published manifest belongs to a writer
    * that died between acquire and publish; the next writer may break it.
    * Generous on purpose — a live writer holds the lock only for one small
    * file write + rename, never minutes. */
  private[core] val LockStaleMs: Long = 10 * 60 * 1000L

  private def lockName(version: Long) = f"v$version%020d.lock"

  /** Atomic create-if-absent. Local paths go through NIO `createFile`
    * (O_CREAT|O_EXCL — truly atomic); other stores use the Hadoop
    * `createNewFile` contract (atomic on HDFS; object stores should back
    * this with a conditional put). */
  private def tryExclusiveCreate(fs: FileSystem, p: Path): Boolean =
    if (fs.getUri.getScheme == "file") {
      try { java.nio.file.Files.createFile(java.nio.file.Paths.get(p.toUri.getPath)); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try fs.createNewFile(p)
      catch { case _: java.io.IOException => false }
    }

  /** Write the next snapshot aside and atomically publish it via a
    * single-file rename — the commit point. Returns the published snapshot.
    *
    * Multi-writer safety is two checks:
    *
    *  - the version's `.lock` marker is acquired with an atomic
    *    create-if-absent BEFORE the rename, so of two concurrent
    *    publishers targeting the same next version exactly one proceeds
    *    and the loser reliably throws (it either fails the lock acquire,
    *    or wins a recycled lock and finds the manifest already published);
    *  - `expectedVersion` makes a READ-MODIFY-WRITE commit optimistic-CAS:
    *    a publisher whose file list was derived from snapshot vE passes
    *    `expectedVersion = E` (0 for "no snapshot existed") and fails if
    *    the table advanced past vE meanwhile — without this, a slower
    *    appender that computes its version AFTER a faster one published
    *    would commit a file list missing the faster one's files, a SILENT
    *    lost update the same-version lock cannot see. Pass the default -1
    *    only for blind last-writer-wins overwrites, whose file list does
    *    not depend on the prior snapshot.
    *
    * A lock left by a crashed writer (no manifest behind it) is broken
    * after [[LockStaleMs]]; a live writer holds it only for a single small
    * write + rename. */
  def publish(fs: FileSystem, table: Path, partitions: Seq[String],
      lastBatchId: Option[Long], files: Seq[String],
      expectedVersion: Long = -1L): Snapshot = {
    val d = dir(table)
    fs.mkdirs(d)
    val version = latest(fs, table).map(_.version + 1).getOrElse(1L)
    if (expectedVersion >= 0 && version != expectedVersion + 1)
      throw new java.io.IOException(
        s"manifest publish lost a race for $table: derived from v$expectedVersion " +
          s"but the table advanced to v${version - 1} — re-read and retry")
    val dest = new Path(d, fileName(version))
    val lock = new Path(d, lockName(version))
    def lost(why: String) = throw new java.io.IOException(
      s"manifest publish lost a race for $dest ($why) — one writer per table")
    if (!tryExclusiveCreate(fs, lock)) {
      if (fs.exists(dest)) lost("version already published")
      val age = System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
      if (age < LockStaleMs) lost("another writer holds the version lock")
      // crashed writer: acquired the lock, died before the rename
      fs.delete(lock, false)
      if (!tryExclusiveCreate(fs, lock)) lost("version lock re-acquired while breaking stale lock")
    }
    try {
      // the lock serializes publishers of THIS version; a publisher that
      // computed the same version before we landed finds the manifest here
      if (fs.exists(dest)) lost("version already published")
      val tmp = new Path(d, s".tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try {
        val body = (Header +:
          s"partitions=${partitions.mkString(",")}" +:
          s"lastBatchId=${lastBatchId.map(_.toString).getOrElse("-")}" +:
          s"checksum=${crc(files)}" +:
          files).mkString("\n")
        out.write(body.getBytes("UTF-8"))
      } finally out.close()
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false)
        lost("rename refused")
      }
    } finally fs.delete(lock, false)
    Snapshot(version, partitions, lastBatchId, files)
  }
}
