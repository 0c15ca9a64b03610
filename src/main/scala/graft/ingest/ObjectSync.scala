package graft.ingest

import java.security.MessageDigest
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Checksummed, skip-existing object sync (reference upload_to_s3.py,
  * SURVEY §2.1 K7 — an ingest utility, not an engine operator).
  *
  * Re-expressed on the Hadoop FileSystem API so the same code drives
  * file://, hdfs://, or s3a:// targets: recursive collect with
  * include/exclude filters and hidden-file skip, streaming digest
  * (sha256 by default, exactly the reference's manifest algorithm —
  * upload_to_s3.py:30-36 — so manifests are interchangeable; md5
  * selectable), skip when the target already has the same length +
  * digest, post-copy verify, and a digest manifest. Per-file work runs on
  * a bounded thread pool (8 workers by default, the reference's
  * max_workers at upload_to_s3.py:126,161); the report keeps listing
  * order regardless of completion order. The engine-relevant bulk path
  * at 100 TB is `df.write.parquet("s3a://...")` with committer configs.
  */
object ObjectSync {

  final case class SyncReport(
      copied: Seq[String], skipped: Seq[String], verifiedOk: Boolean,
      manifest: Map[String, String])

  private def digestOf(fs: FileSystem, p: Path, algorithm: String): String = {
    val md = MessageDigest.getInstance(algorithm)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](8 << 20) // 8 MB chunks (upload_to_s3.py:27)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  private def listFiles(fs: FileSystem, root: Path,
      include: String => Boolean): Seq[Path] = {
    val out = Seq.newBuilder[Path]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith(".") && !name.startsWith("_") &&
        include(name)) out += f.getPath
    }
    out.result()
  }

  /** Sync `srcDir` into `dstDir`; returns what was copied vs skipped plus
    * the digest manifest (`algorithm` defaults to SHA-256, matching the
    * reference's `compute_sha256` manifests; pass "MD5" for the cheaper
    * legacy digest). `dryRun` reports without copying.
    */
  def sync(conf: Configuration, srcDir: String, dstDir: String,
      include: String => Boolean = _ => true,
      dryRun: Boolean = false,
      algorithm: String = "SHA-256",
      workers: Int = 8): SyncReport = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    val src = new Path(srcDir); val dst = new Path(dstDir)
    val sfs = src.getFileSystem(conf); val dfs = dst.getFileSystem(conf)
    dfs.mkdirs(dst)
    val files = listFiles(sfs, src, include)
    // Qualify before relativizing: a scheme-less source URI makes
    // relativize a no-op, which would resolve the "target" to the source
    // itself and silently skip every file.
    val srcUri = sfs.makeQualified(src).toUri

    final case class FileResult(rel: String, digest: String,
        wasSkipped: Boolean, ok: Boolean)
    def oneFile(f: Path): FileResult = {
      val rel = srcUri.relativize(sfs.makeQualified(f).toUri).getPath
      require(!rel.startsWith("/"), s"failed to relativize $f against $src")
      val target = new Path(dst, rel)
      val srcSum = digestOf(sfs, f, algorithm)
      val canSkip = dfs.exists(target) &&
        dfs.getFileStatus(target).getLen == sfs.getFileStatus(f).getLen &&
        digestOf(dfs, target, algorithm) == srcSum // skip-existing (upload_to_s3.py:184-191)
      if (canSkip) FileResult(rel, srcSum, wasSkipped = true, ok = true)
      else if (!dryRun) {
        org.apache.hadoop.fs.FileUtil.copy(sfs, f, dfs, target,
          false, true, conf)
        // post-copy verify (upload_to_s3.py:197-200)
        FileResult(rel, srcSum, wasSkipped = false,
          ok = digestOf(dfs, target, algorithm) == srcSum)
      } else FileResult(rel, srcSum, wasSkipped = false, ok = true)
    }

    // Bounded pool; invokeAll returns futures in submission (= listing)
    // order, so the report is deterministic however the copies interleave.
    // Each task touches a distinct target path, so tasks never race.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(workers, math.max(1, files.size)))
    val results =
      try {
        import scala.jdk.CollectionConverters._
        pool.invokeAll(files.map(f =>
          new java.util.concurrent.Callable[FileResult] {
            override def call(): FileResult = oneFile(f)
          }).asJava).asScala.map(_.get()).toSeq
      } finally pool.shutdown()
    SyncReport(
      results.filterNot(_.wasSkipped).map(_.rel),
      results.filter(_.wasSkipped).map(_.rel),
      results.forall(_.ok),
      results.map(r => r.rel -> r.digest).toMap)
  }
}
