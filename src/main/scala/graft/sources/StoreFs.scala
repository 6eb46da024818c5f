package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem access for generational stores, resolved through the
  * Hadoop [[FileSystem]] API from the STORE PATH — never `java.io.File`.
  *
  * Why this exists: the generational stores ([[graft.streaming
  * .EventStreams.materializedAggStore]], the IVF/two-tier ANN stores,
  * the dedup signature stores) write their parquet data through Spark's
  * Hadoop FS but originally tracked commit markers with `java.io.File`.
  * On any non-local store (HDFS, S3A) that split is silently wrong: the
  * data lands on the cluster store while the marker lands on the
  * driver's local disk, so generation listing returns nothing and every
  * batch quietly degrades to its own partial state. Routing ALL marker
  * and listing traffic through the scheme-resolved FileSystem makes the
  * store location-transparent — `file:`, `hdfs:` and `s3a:` paths all
  * behave identically.
  *
  * The Hadoop conf comes from the active Spark session when one exists
  * (so `fs.*` overrides like S3 credentials apply) and falls back to a
  * bare [[Configuration]] for session-less callers (vacuum jobs). */
object StoreFs {

  private def conf(): Configuration = SparkSession.getActiveSession
    .orElse(SparkSession.getDefaultSession)
    .map(_.sessionState.newHadoopConf())
    .getOrElse(new Configuration())

  /** The (filesystem, path) pair governing `store`, scheme-resolved. */
  def of(store: String): (FileSystem, Path) = {
    val p = new Path(store)
    (p.getFileSystem(conf()), p)
  }

  /** Create (or replay-recreate) a zero-byte marker file under `store`. */
  def touchMarker(store: String, name: String): Unit = {
    val (fs, p) = of(store)
    fs.mkdirs(p)
    // overwrite=true: marker recreation on batch replay is harmless by
    // contract, and create-then-close is atomic-enough for a 0-byte file
    fs.create(new Path(p, name), true).close()
  }

  /** Names of the direct children of `store`; empty if it is absent. */
  def childNames(store: String): Seq[String] = {
    val (fs, p) = of(store)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }

  /** Delete a direct child of `store` (file or dir), recursively. */
  def deleteChild(store: String, name: String): Unit = {
    val (fs, p) = of(store)
    fs.delete(new Path(p, name), true): Unit
  }

  /** Read a generation manifest: the file at `path` holding one long
    * (UTF-8 digits). Absent file = no committed generation. Shared by
    * the generational stores (dedup signature store, two-tier ANN
    * store) as their single commit point. */
  def readManifest(path: String): Option[Long] = {
    val (fs, p) = of(path)
    def once(): Option[Long] =
      if (!fs.exists(p)) None
      else {
        val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      }
    // One short retry on absence. Pay the 50 ms sleep ONLY when the
    // fallback (non-FileContext) commit path's rename-aside window is
    // plausibly open — i.e. a `__tmp` or `__old` sibling exists. Even
    // when it isn't, re-probe once without sleeping: the swap may have
    // completed between the failed first read and the sibling checks,
    // in which case the manifest now exists and a bare None would
    // misreport a committed store as absent. A legitimately absent
    // manifest (first build, vacuum early-return, tombstone probe)
    // costs one extra exists() and still returns None immediately.
    once().orElse {
      val inFlight =
        try fs.exists(new Path(path + "__tmp")) || fs.exists(new Path(path + "__old"))
        catch { case _: java.io.IOException => false }
      if (inFlight) Thread.sleep(50)
      once()
    }
  }

  /** Read a small UTF-8 file at `path`; None when absent. The
    * string-typed sibling of [[readManifest]] for marker files whose
    * content is richer than one long (e.g. the NSW pending-maintenance
    * cell list). */
  def readSmallFile(path: String): Option[String] = {
    val (fs, p) = of(path)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
  }

  /** Delete the file at `path` (non-recursive); absent is fine. */
  def deleteFile(path: String): Unit = {
    val (fs, p) = of(path)
    fs.delete(p, false): Unit
  }

  /** COMMIT a generation: write `gen` to `path__tmp`, then swap it in
    * with an atomic overwrite rename ([[FileContext]] with
    * `Options.Rename.OVERWRITE` — atomic on HDFS and the local FS), so
    * readers racing a refresh resolve the old complete generation or
    * the new one, never a torn or absent manifest. On stores whose
    * scheme lacks a FileContext implementation (some object stores) it
    * falls back to a CHECKED rename-aside: the old manifest is moved
    * aside (not deleted), the new one renamed in, and on failure the
    * old manifest is restored — paired with [[readManifest]]'s
    * retry-on-absent, the brief window is covered and a failed swap
    * never loses the committed-generation pointer. */
  def commitManifest(path: String, gen: Long): Unit =
    writeFileAtomic(path, gen.toString)

  /** Atomically replace the file at `path` with `content` — the
    * [[commitManifest]] swap generalized to arbitrary small UTF-8
    * content (tmp write + atomic overwrite rename, checked
    * rename-aside fallback). Readers racing the swap see the old
    * complete content or the new, never a torn file. */
  def writeFileAtomic(path: String, content: String): Unit = {
    val (fs, p) = of(path)
    val tmp = new Path(path + "__tmp")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    try {
      val fc = FileContext.getFileContext(p.toUri, conf())
      fc.rename(tmp, p, Options.Rename.OVERWRITE)
    } catch {
      // UnsupportedFileSystemException: a scheme with no AbstractFileSystem
      // makes FileContext.getFileContext itself throw (it is an IOException
      // subclass, NOT an UnsupportedOperationException) — object stores
      // like s3a land here, which is exactly the case the fallback exists
      // for.
      case _: UnsupportedOperationException | _: java.io.FileNotFoundException |
          _: org.apache.hadoop.fs.UnsupportedFileSystemException
          if fs.exists(tmp) =>
        val old = new Path(path + "__old")
        val hadOld = fs.exists(p)
        if (hadOld) {
          fs.delete(old, false): Unit
          require(fs.rename(p, old), s"commitManifest: failed to move aside $p")
        }
        if (!fs.rename(tmp, p)) {
          // restore the prior pointer before failing — never lose it
          if (hadOld) fs.rename(old, p): Unit
          sys.error(s"commitManifest: rename $tmp -> $p failed; prior manifest restored=$hadOld")
        }
        if (hadOld) fs.delete(old, false): Unit
    }
  }
}
