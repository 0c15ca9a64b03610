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
  * digest, post-copy verify, and a digest manifest. Single-process by
  * design (it is I/O-bound setup tooling); the engine-relevant bulk path
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
      algorithm: String = "SHA-256"): SyncReport = {
    val src = new Path(srcDir); val dst = new Path(dstDir)
    val sfs = src.getFileSystem(conf); val dfs = dst.getFileSystem(conf)
    dfs.mkdirs(dst)
    val files = listFiles(sfs, src, include)
    val copied = Seq.newBuilder[String]; val skipped = Seq.newBuilder[String]
    val manifest = Map.newBuilder[String, String]
    var allOk = true
    // Qualify before relativizing: a scheme-less source URI makes
    // relativize a no-op, which would resolve the "target" to the source
    // itself and silently skip every file.
    val srcUri = sfs.makeQualified(src).toUri
    files.foreach { f =>
      val rel = srcUri.relativize(sfs.makeQualified(f).toUri).getPath
      require(!rel.startsWith("/"), s"failed to relativize $f against $src")
      val target = new Path(dst, rel)
      val srcSum = digestOf(sfs, f, algorithm)
      manifest += rel -> srcSum
      val canSkip = dfs.exists(target) &&
        dfs.getFileStatus(target).getLen == sfs.getFileStatus(f).getLen &&
        digestOf(dfs, target, algorithm) == srcSum // skip-existing (upload_to_s3.py:184-191)
      if (canSkip) skipped += rel
      else if (!dryRun) {
        org.apache.hadoop.fs.FileUtil.copy(sfs, f, dfs, target,
          false, true, conf)
        // post-copy verify (upload_to_s3.py:197-200)
        if (digestOf(dfs, target, algorithm) != srcSum) allOk = false
        copied += rel
      } else copied += rel
    }
    SyncReport(copied.result(), skipped.result(), allOk, manifest.result())
  }
}
