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
  * order regardless of completion order. Multipart-threshold semantics
  * (upload_to_s3.py:160-164: boto3 TransferConfig, 8 MB default) are
  * re-expressed as part-level checksums — files at/over the threshold
  * get the S3 composite etag (md5-of-part-md5s`-nParts`), under it the
  * plain content md5 — so manifests compare against real object-store
  * etags without re-reading the object; `--max-size-mb`
  * (upload_to_s3.py:134) maps to `maxSizeMb` with excluded files
  * reported, never silently dropped. The engine-relevant bulk path at
  * 100 TB is `df.write.parquet("s3a://...")` with committer configs
  * (the s3a client performs true concurrent multipart under block
  * upload).
  */
object ObjectSync {

  final case class SyncReport(
      copied: Seq[String], skipped: Seq[String], verifiedOk: Boolean,
      manifest: Map[String, String],
      etags: Map[String, String] = Map.empty,
      excluded: Seq[String] = Seq.empty)

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

  /** Part-level digest plan for a file, S3 etag convention (public:
    * AWS documents the multipart etag as md5-of-concatenated-part-md5s
    * suffixed `-<nParts>`; single-part etag is the plain content md5).
    * The reference delegates this split to boto3's `TransferConfig`
    * (upload_to_s3.py:160-164, `multipart_threshold` = 8 MB default);
    * here the same threshold decides between one whole-object digest
    * and per-part digests, so a sync against a real object store can
    * compare its etags without re-reading the object. Parts are read
    * in `partSize` chunks while the copy streams — one pass computes
    * the content digest, the part md5s, and writes the target.
    */
  private def copyChunked(sfs: FileSystem, f: Path, dfs: FileSystem,
      target: Path, algorithm: String, partSize: Long,
      multipart: Boolean, write: Boolean): (String, String) = {
    val md = MessageDigest.getInstance(algorithm)
    val partMd5s = Seq.newBuilder[Array[Byte]]
    var part = MessageDigest.getInstance("MD5")
    var inPart = 0L
    val in = sfs.open(f)
    val out = if (write) dfs.create(target, true) else null
    try {
      val buf = new Array[Byte](8 << 20) // 8 MB chunks (upload_to_s3.py:27)
      var n = in.read(buf)
      while (n > 0) {
        var off = 0
        while (off < n) {
          // split the read at part boundaries so part md5s are exact
          // (room-in-part is compared in Long space first: a >=2 GiB
          // partSize would wrap a bare .toInt negative and corrupt take)
          val take = math.min((n - off).toLong, partSize - inPart).toInt
          md.update(buf, off, take)
          part.update(buf, off, take)
          if (out != null) out.write(buf, off, take)
          inPart += take
          off += take
          if (multipart && inPart == partSize) {
            partMd5s += part.digest()
            part = MessageDigest.getInstance("MD5")
            inPart = 0L
          }
        }
        n = in.read(buf)
      }
    } finally {
      in.close()
      if (out != null) out.close()
    }
    if (inPart > 0 || !multipart) partMd5s += part.digest()
    val parts = partMd5s.result()
    val etag =
      if (!multipart) parts.head.map("%02x".format(_)).mkString
      else {
        val outer = MessageDigest.getInstance("MD5")
        parts.foreach(outer.update)
        outer.digest().map("%02x".format(_)).mkString + "-" + parts.size
      }
    (md.digest().map("%02x".format(_)).mkString, etag)
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
      workers: Int = 8,
      multipartThresholdMb: Int = 8,
      maxSizeMb: Option[Int] = None): SyncReport = {
    require(workers >= 1, s"workers must be >= 1, got $workers")
    require(multipartThresholdMb >= 1,
      s"multipartThresholdMb must be >= 1, got $multipartThresholdMb")
    val src = new Path(srcDir); val dst = new Path(dstDir)
    val sfs = src.getFileSystem(conf); val dfs = dst.getFileSystem(conf)
    dfs.mkdirs(dst)
    // --max-size-mb (upload_to_s3.py:134): oversized files are EXCLUDED
    // and reported, never silently dropped (the no-silent-caps contract).
    val thresholdB = multipartThresholdMb.toLong << 20
    val maxB = maxSizeMb.map(_.toLong << 20)
    val all = listFiles(sfs, src, include)
    val (files, oversized) = maxB match {
      case Some(m) => all.partition(f => sfs.getFileStatus(f).getLen <= m)
      case None => (all, Seq.empty[Path])
    }
    // Qualify before relativizing: a scheme-less source URI makes
    // relativize a no-op, which would resolve the "target" to the source
    // itself and silently skip every file.
    val srcUri = sfs.makeQualified(src).toUri

    final case class FileResult(rel: String, digest: String, etag: String,
        wasSkipped: Boolean, ok: Boolean)
    def oneFile(f: Path): FileResult = {
      val rel = srcUri.relativize(sfs.makeQualified(f).toUri).getPath
      require(!rel.startsWith("/"), s"failed to relativize $f against $src")
      val target = new Path(dst, rel)
      // multipart threshold (upload_to_s3.py:160-164, TransferConfig
      // default 8 MB): at/over it the etag is the composite
      // md5-of-part-md5s-<nParts>, under it the plain content md5.
      // Part size = the threshold, boto3's matching chunksize default.
      val mp = sfs.getFileStatus(f).getLen >= thresholdB
      val (srcSum, etag) = copyChunked(sfs, f, dfs, target, algorithm,
        thresholdB, mp, write = false)
      val canSkip = dfs.exists(target) &&
        dfs.getFileStatus(target).getLen == sfs.getFileStatus(f).getLen &&
        digestOf(dfs, target, algorithm) == srcSum // skip-existing (upload_to_s3.py:184-191)
      if (canSkip) FileResult(rel, srcSum, etag, wasSkipped = true, ok = true)
      else if (!dryRun) {
        val (copiedSum, _) = copyChunked(sfs, f, dfs, target, algorithm,
          thresholdB, mp, write = true)
        // post-copy verify (upload_to_s3.py:197-200)
        FileResult(rel, srcSum, etag, wasSkipped = false,
          ok = copiedSum == srcSum &&
            digestOf(dfs, target, algorithm) == srcSum)
      } else FileResult(rel, srcSum, etag, wasSkipped = false, ok = true)
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
      results.map(r => r.rel -> r.digest).toMap,
      results.map(r => r.rel -> r.etag).toMap,
      oversized.map(f =>
        srcUri.relativize(sfs.makeQualified(f).toUri).getPath))
  }
}
