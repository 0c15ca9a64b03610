package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, per the north-star extension spec.
  *
  * Image decode ([[decodeImage]]) is REAL for PNG/JPEG/GIF/BMP via the
  * JDK's `javax.imageio` (zero external dependencies); bytes no reader
  * claims fall back to a deterministic length-derived shape so synthetic
  * or corrupt payloads flow through the same plumbing instead of erroring.
  * The Spark-side plumbing is what matters at 100 TB:
  *  - media rides as `binary` + a metadata struct (schema below), so parquet
  *    stores it row-group-columnar and metadata-only queries never read bytes
  *    (column pruning).
  *  - per-item work runs through `mapPartitions` over an iterator (the Scala
  *    analogue of `mapInPandas` batch processing): constant memory per task,
  *    no driver collection.
  *  - partitioning: media tables should be written bucketed/partitioned by
  *    content digest prefix so dedup/join work is co-located.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType, nullable = false),
      StructField("digest", StringType, nullable = false),
      StructField("format", StringType, nullable = true)
    )), nullable = true)
  ))

  /** Build a deterministic fake media table from the documents table: each
    * doc's text bytes stand in for an encoded payload. Lets every downstream
    * operator (digest, dedup, metadata extraction, "decode") be exercised
    * with real Spark plumbing and reproducible content.
    */
  def syntheticMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      // deterministic kind assignment
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("bytes"))

  /** Ingest real media files from a directory tree via Spark's native
    * `binaryFile` source: one row per file with (path, modificationTime,
    * length, content), glob-filtered at the SOURCE (non-matching files are
    * never opened — at 100 TB the listing prunes before any read).
    * `media_id` is a stable 60-bit hash of the path, `kind` comes from the
    * extension, and the result plugs straight into [[withMeta]] /
    * [[decodeImage]]. `binaryFile` caps single files at
    * `spark.sql.sources.binaryFile.maxLength` (2 GB default) — larger blobs
    * belong in chunked object storage, not a DataFrame row.
    */
  def readMediaDir(spark: SparkSession, dir: String,
      glob: String = "*.{png,jpg,jpeg,gif,bmp,wav,mp4}"): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(
        graft.functions.StableHash.hash60(col("path")).as("media_id"),
        col("path"),
        when(ext.isin("png", "jpg", "jpeg", "gif", "bmp"), "image")
          .when(ext.isin("wav", "mp3", "flac"), "audio")
          .otherwise("video").as("kind"),
        col("content").as("bytes"))
  }

  /** Metadata extraction — pure Catalyst, never decodes the payload. */
  def withMeta(media: DataFrame): DataFrame =
    media.withColumn("meta", struct(
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("digest"),
      upper(substring(base64(col("bytes")), 1, 4)).as("format")))

  /** Image decode: real PNG/JPEG/GIF/BMP header+pixel decode via the JDK's
    * `javax.imageio` (no external codec dependency) inside a mapPartitions
    * (constant-memory iterator, codec state per task, no driver
    * collection). Bytes no ImageIO reader can decode fall back to
    * DETERMINISTIC length-derived dimensions — the round-1 stub behavior —
    * so synthetic/corrupt payloads still flow through the same plumbing
    * reproducibly instead of erroring (the engine's coerce-don't-error
    * rule, reference build.py:29-37).
    *
    * `ImageIO.read` is invoked only when a registered reader claims the
    * byte stream; `n_frames` is the reader's image count when cheaply
    * known (multi-frame GIFs), else 1.
    */
  def decodeImage(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val in = media.select("media_id", "bytes")
    val rdd = in.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory, no /tmp spill
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeOne(bytes) match {
          case Some((w, h, f)) => Row(id, w, h, f)
          case None =>
            // deterministic fallback for non-decodable payloads
            val n = bytes.length
            Row(id, 64 + (n % 512), 64 + ((n / 7) % 512), 1 + (n % 30))
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** (width, height, frames) for decodable image bytes; None otherwise. */
  private def decodeOne(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.isEmpty) return None
    var stream: javax.imageio.stream.ImageInputStream = null
    try {
      stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(stream)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(stream, /*seekForwardOnly=*/ false)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        // allowSearch=false: O(1) metadata peek; -1 (unknown) maps to 1
        val frames = math.max(reader.getNumImages(false), 1)
        // decode the first frame's pixels — header-only peeks would accept
        // files whose pixel data is truncated/corrupt
        reader.read(0)
        Some((w, h, frames))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (stream != null) stream.close()
  }

  /** Frame sampling plumbing: every `stride`-th frame index per video row,
    * exploded to one row per sampled frame (generator, no shuffle).
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx")

  /** Real bilinear resize to `outW`x`outH`, re-encoded as PNG (JDK
    * `Graphics2D` + `ImageIO`, zero external deps), inside mapPartitions.
    * Non-decodable payloads pass through with NULL resized bytes — the
    * coerce-don't-error rule; callers filter or route them.
    */
  def resizeImages(spark: SparkSession, media: DataFrame,
      outW: Int, outH: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("resized", BinaryType, nullable = true),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val png = readImage(bytes).map { img =>
          val scaled = new java.awt.image.BufferedImage(outW, outH,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = scaled.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, outW, outH, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          bos.toByteArray
        }
        Row(id, png.orNull, outW, outH)
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Pixel feature extraction: per-channel means and luma from the decoded
    * first frame. Non-decodable payloads get NULL features. The per-pixel
    * loop runs task-local over the raster — map-side, constant memory.
    */
  def imageFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("mean_r", DoubleType, nullable = true),
      StructField("mean_g", DoubleType, nullable = true),
      StructField("mean_b", DoubleType, nullable = true),
      StructField("luma", DoubleType, nullable = true)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        readImage(bytes) match {
          case Some(img) =>
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val p = img.getRGB(x, y)
                sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                x += 1
              }
              y += 1
            }
            val n = img.getWidth.toDouble * img.getHeight
            val (mr, mg, mb) = (sr / n, sg / n, sb / n)
            Row(id, mr, mg, mb, 0.2126 * mr + 0.7152 * mg + 0.0722 * mb)
          case None => Row(id, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Full decode to a BufferedImage; None for bytes no reader accepts. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes.isEmpty) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---- audio (WAV/PCM via the JDK's javax.sound.sampled — no external
  //      codec dependency, mirroring the imageio image path) ---------------

  /** Deterministic synthesized 16-bit PCM WAV per document: sample rate,
    * channel count, frame count and every sample value are pure integer
    * functions of `doc_id`, so the DuckDB oracle can recompute the decoded
    * features from first principles while the ENGINE path decodes the real
    * RIFF bytes. Stereo every 4th id exercises channel interleaving.
    */
  def synthesizeWav(docs: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id").cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val sr = (8000 + (id % 3) * 4000).toInt
        val ch = if (id % 4 == 0) 2 else 1
        val nf = (400 + id % 256).toInt
        val data = new Array[Byte](nf * ch * 2)
        var i = 0
        while (i < nf) {
          var c = 0
          while (c < ch) {
            val s = (((id * 31 + i.toLong * 17 + c * 7919) % 65536) - 32768).toInt
            val off = (i * ch + c) * 2
            data(off) = (s & 0xff).toByte // little-endian PCM
            data(off + 1) = ((s >> 8) & 0xff).toByte
            c += 1
          }
          i += 1
        }
        Row(id, wavBytes(sr, ch, data))
      }
    }
    docs.sparkSession.createDataFrame(rdd, out)
  }

  /** Canonical 44-byte RIFF/WAVE header + PCM payload (16-bit LE). */
  private def wavBytes(sampleRate: Int, channels: Int,
      pcm: Array[Byte]): Array[Byte] =
    wavBytesFmt(1, sampleRate, channels, 16, pcm)

  /** 44-byte RIFF/WAVE header for any fixed-width format code (1 = PCM,
    * 6 = G.711 a-law, 7 = G.711 mu-law) + sample payload.
    */
  private def wavBytesFmt(code: Int, sampleRate: Int, channels: Int,
      bitsPerSample: Int, data: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(code.toShort)
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign) // byte rate
      .putShort(blockAlign.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Deterministic G.711 telephony corpus: 8 kHz mu-law (format 7) or
    * a-law (format 6) RIFF bytes, one clip per doc — sample byte
    * (i, c) = (id*131 + i*29 + c*97) mod 256, stereo every 3rd id,
    * 300 + id mod 200 frames. The compressed-codec twin of
    * [[synthesizeWav]]: the oracle replays the JDK's G.711 expansion
    * (verified table-exact against `javax.sound.sampled` for all 256
    * code points, both laws — OpsSpec pins it) from this formula.
    */
  def synthesizeLawWav(docs: DataFrame, alaw: Boolean): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val code = if (alaw) 6 else 7
    val rdd = docs.select(col("doc_id").cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val ch = if (id % 3 == 0) 2 else 1
        val nf = (300 + id % 200).toInt
        val data = new Array[Byte](nf * ch)
        var i = 0
        while (i < nf) {
          var c = 0
          while (c < ch) {
            data(i * ch + c) =
              (((id * 131 + i.toLong * 29 + c * 97) % 256).toInt & 0xff).toByte
            c += 1
          }
          i += 1
        }
        Row(id, wavBytesFmt(code, 8000, ch, 8, data))
      }
    }
    docs.sparkSession.createDataFrame(rdd, out)
  }

  /** Audio decode: real WAV/PCM header+sample decode via the JDK's
    * `javax.sound.sampled.AudioSystem` inside mapPartitions (constant
    * memory per task, no driver collection — the image-path discipline).
    * Emits format metadata plus exact-integer sample statistics (sum of
    * squared samples across all channels, peak magnitude) and the derived
    * RMS; non-decodable or non-16-bit-PCM payloads get NULL features (the
    * coerce-don't-error rule — callers filter or route them). Integer
    * stats make the features oracle-replayable bit-for-bit; `duration_ms`
    * is exact long division, RMS one IEEE divide + sqrt on both engines.
    */
  def decodeAudio(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", LongType, nullable = true),
      StructField("channels", LongType, nullable = true),
      StructField("bits", LongType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sum_sq", LongType, nullable = true),
      StructField("peak", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        decodeWavOne(bytes) match {
          case Some((sr, ch, nf, sumSq, peak)) =>
            val n = nf * ch
            val rms = if (n > 0) math.sqrt(sumSq.toDouble / n) else 0.0
            Row(id, sr, ch, 16L, nf, nf * 1000L / sr, sumSq, peak, rms)
          case None => Row(id, null, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** (sampleRate, channels, frames, sumSq, peak) for 16-bit PCM WAV bytes
    * — or G.711 mu-law/a-law payloads, expanded to 16-bit PCM through the
    * JDK's own codec (no new dependency; the expansion is the standard
    * G.711 table, pinned code-point-exact by OpsSpec so oracles replay it
    * as a formula). None for anything else the JDK can't parse.
    *
    * Degenerate-but-parseable headers fold to None, not an executor
    * throw (the coerce-don't-error contract): sample rate <= 0 (or NaN)
    * would divide-by-zero the duration, and channels <= 0 the RMS.
    * Frame count is derived from the DECODED payload length, never from
    * `getFrameLength` — the header's claim can be NOT_SPECIFIED (-1) or
    * a lie; the bytes can't.
    */
  private def decodeWavOne(
      bytes: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    if (bytes.isEmpty) return None
    try {
      val ais0 = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f0 = ais0.getFormat
        val law = f0.getEncoding == AudioFormat.Encoding.ULAW ||
          f0.getEncoding == AudioFormat.Encoding.ALAW
        if (law && !(f0.getSampleRate > 0 && f0.getChannels > 0)) return None
        val ais =
          if (law) AudioSystem.getAudioInputStream(
            new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
              f0.getSampleRate, 16, f0.getChannels, f0.getChannels * 2,
              f0.getSampleRate, false), ais0)
          else ais0
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) return None
          val sr = fmt.getSampleRate
          val ch = fmt.getChannels
          if (!(sr > 0) || ch <= 0) return None
          val data = ais.readAllBytes()
          val n = data.length / 2
          var sumSq = 0L
          var peak = 0L
          var i = 0
          while (i < n) {
            val s =
              if (fmt.isBigEndian) (data(2 * i).toInt << 8) | (data(2 * i + 1) & 0xff)
              else (data(2 * i + 1).toInt << 8) | (data(2 * i) & 0xff)
            sumSq += s.toLong * s
            val a = math.abs(s.toLong)
            if (a > peak) peak = a
            i += 1
          }
          Some((sr.toLong, ch.toLong, (n / ch).toLong, sumSq, peak))
        } finally ais.close()
      } finally ais0.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  // ---------------------------------------------------------------- video

  /** Deterministic video-container corpus: minimal well-formed MP4
    * (`ftyp` + `moov[mvhd + n x trak[tkhd]]`, big-endian ISO-BMFF boxes)
    * for two of three ids, a Matroska/WebM EBML header for the third,
    * and a truncated junk payload every 97th id. Every container
    * parameter (brand, movie timescale/duration, track count, track
    * dims, EBML DocType) is a closed-form function of the id, so the
    * `mm_video_meta` oracle replays the FORMULA while the engine must
    * parse the real boxes back out of the bytes —
    * [[synthesizeLawWav]]'s synthesis-replay discipline for the video
    * column type.
    */
  def synthesizeVideo(docs: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("bytes", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id").cast("long")).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, videoBytes(id))
      }
    }
    docs.sparkSession.createDataFrame(rdd, out)
  }

  /** The per-id container bytes behind [[synthesizeVideo]]. */
  private[graft] def videoBytes(id: Long): Array[Byte] =
    if (id % 97 == 0) {
      // truncated junk: the ftyp box header claims 1024 bytes, EOF at 10
      val bb = java.nio.ByteBuffer.allocate(10)
      bb.putInt(1024).put("ftyp".getBytes("US-ASCII")).putShort(0)
      bb.array()
    } else if (id % 3 == 0)
      ebmlBytes(if (id % 2 == 0) "matroska" else "webm")
    else
      mp4Bytes(
        brand = if (id % 2 == 0) "isom" else "mp42",
        timescale = (600 + (id % 5) * 100).toInt,
        duration = ((id % 1000) + 1) * 60,
        nTracks = (1 + id % 3).toInt,
        width = (160 + (id % 8) * 80).toInt,
        height = (120 + (id % 6) * 60).toInt)

  private def putIdentityMatrix(bb: java.nio.ByteBuffer): Unit = {
    bb.putInt(0x00010000).putInt(0).putInt(0)
    bb.putInt(0).putInt(0x00010000).putInt(0)
    bb.putInt(0).putInt(0).putInt(0x40000000)
  }

  /** ftyp(20) + moov(8 + mvhd 108 + n x trak(8 + tkhd 92)) — version-0
    * boxes, identity matrices, track dims as 16.16 fixed point.
    */
  private def mp4Bytes(brand: String, timescale: Int, duration: Long,
      nTracks: Int, width: Int, height: Int): Array[Byte] = {
    val a = "US-ASCII"
    val trakSize = 8 + 92
    val moovSize = 8 + 108 + nTracks * trakSize
    val bb = java.nio.ByteBuffer.allocate(20 + moovSize) // BE by default
    bb.putInt(20).put("ftyp".getBytes(a)).put(brand.getBytes(a))
      .putInt(0x200).put(brand.getBytes(a))
    bb.putInt(moovSize).put("moov".getBytes(a))
    bb.putInt(108).put("mvhd".getBytes(a))
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // creation, modification
      .putInt(timescale).putInt(duration.toInt)
      .putInt(0x00010000) // rate 1.0
      .putShort(0x0100.toShort).putShort(0) // volume, reserved
      .putLong(0L) // reserved
    putIdentityMatrix(bb)
    (0 until 6).foreach(_ => bb.putInt(0)) // pre_defined
    bb.putInt(nTracks + 1) // next_track_ID
    var t = 0
    while (t < nTracks) {
      bb.putInt(trakSize).put("trak".getBytes(a))
      bb.putInt(92).put("tkhd".getBytes(a))
        .putInt(7) // version 0 + flags (enabled | in_movie | in_preview)
        .putInt(0).putInt(0) // creation, modification
        .putInt(t + 1).putInt(0) // track_ID, reserved
        .putInt(duration.toInt)
        .putLong(0L) // reserved
        .putShort(0).putShort(0).putShort(0).putShort(0) // layer/alt/vol/res
      putIdentityMatrix(bb)
      bb.putInt(width << 16).putInt(height << 16)
      t += 1
    }
    bb.array()
  }

  /** A complete EBML header (the Matroska/WebM magic + DocType battery)
    * with 1-byte size varints — the headers-only face of an MKV file.
    */
  private def ebmlBytes(docType: String): Array[Byte] = {
    val dt = docType.getBytes("US-ASCII")
    val bodyLen = 4 + 4 + 4 + 4 + (3 + dt.length) + 4 + 4
    val bb = java.nio.ByteBuffer.allocate(5 + bodyLen)
    bb.put(Array(0x1A, 0x45, 0xDF, 0xA3).map(_.toByte)) // EBML magic
    bb.put((0x80 | bodyLen).toByte)
    def u1(id: Int, v: Int): Unit = {
      bb.putShort(id.toShort); bb.put(0x81.toByte); bb.put(v.toByte)
    }
    u1(0x4286, 1) // EBMLVersion
    u1(0x42F7, 1) // EBMLReadVersion
    u1(0x42F2, 4) // EBMLMaxIDLength
    u1(0x42F3, 8) // EBMLMaxSizeLength
    bb.putShort(0x4282.toShort).put((0x80 | dt.length).toByte).put(dt)
    u1(0x4287, 4) // DocTypeVersion
    u1(0x4285, 2) // DocTypeReadVersion
    bb.array()
  }

  /** Headers-only video container probe: walks ISO-BMFF boxes (`ftyp`
    * brand; `moov/mvhd` movie timescale + duration, v0 AND v1 layouts;
    * `trak` count; first `tkhd`'s 16.16 track dims) or an EBML header
    * (Matroska/WebM DocType) — NOTHING decodes: the probe reads a few
    * hundred header bytes per item, so at 100 TB it is listing-bound,
    * not data-bound, and runs in the same constant-memory mapPartitions
    * discipline as [[decodeImage]]. Payloads that parse as neither
    * (truncated boxes, box sizes past EOF, junk) fold to a NULL metadata
    * row — the coerce-don't-error rule. All-long metadata columns keep
    * the frame oracle-replayable.
    */
  def probeVideoMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("container", StringType, nullable = true),
      StructField("format", StringType, nullable = true),
      StructField("timescale", LongType, nullable = true),
      StructField("duration", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("n_tracks", LongType, nullable = true),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true)))
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        probeVideoOne(bytes) match {
          case Some((cont, fmt, Some((ts, dur, nt, w, h)))) =>
            val ms = if (ts > 0) dur * 1000L / ts else null
            Row(id, cont, fmt, ts, dur, ms, nt,
              if (w >= 0) w else null, if (h >= 0) h else null)
          case Some((cont, fmt, None)) =>
            Row(id, cont, fmt, null, null, null, null, null, null)
          case None =>
            Row(id, null, null, null, null, null, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** (container, format, Some((timescale, duration, nTracks, width,
    * height)) for MP4) — None when the bytes parse as neither container.
    */
  private[graft] def probeVideoOne(
      b: Array[Byte]): Option[(String, String, Option[(Long, Long, Long, Long, Long)])] = {
    try {
      if (b.length >= 5 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
          (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3)
        parseEbml(b).map(dt => ("mkv", dt, None))
      else parseMp4(b)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)

  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  private def parseMp4(b: Array[Byte])
      : Option[(String, String, Option[(Long, Long, Long, Long, Long)])] = {
    if (b.length < 8 || fourcc(b, 4) != "ftyp") return None
    var brand: String = null
    var ts = -1L; var dur = -1L; var nTracks = 0L
    var w = -1L; var h = -1L
    var off = 0
    while (off + 8 <= b.length) {
      val size = be32(b, off)
      val typ = fourcc(b, off + 4)
      if (size < 8 || off + size > b.length) return None // box past EOF
      typ match {
        case "ftyp" =>
          if (size < 16) return None
          brand = fourcc(b, off + 8)
        case "moov" =>
          var c = off + 8
          val end = off + size.toInt
          while (c + 8 <= end) {
            val cs = be32(b, c)
            val ct = fourcc(b, c + 4)
            if (cs < 8 || c + cs > end) return None
            ct match {
              case "mvhd" =>
                val v = b(c + 8) & 0xff
                if (v == 1 && cs >= 8 + 4 + 8 + 8 + 4 + 8) {
                  ts = be32(b, c + 28); dur = be64(b, c + 32)
                } else if (v == 0 && cs >= 8 + 4 + 4 + 4 + 4 + 4) {
                  ts = be32(b, c + 20); dur = be32(b, c + 24)
                } else return None
              case "trak" =>
                nTracks += 1
                // first child box is tkhd in any sane layout; scan anyway
                var g = c + 8
                val gEnd = c + cs.toInt
                while (g + 8 <= gEnd) {
                  val gs = be32(b, g)
                  if (gs < 8 || g + gs > gEnd) return None
                  if (fourcc(b, g + 4) == "tkhd" && w < 0) {
                    val v = b(g + 8) & 0xff
                    val base = if (v == 1) g + 8 + 4 + 8 + 8 + 4 + 4 + 8
                      else g + 8 + 4 + 4 + 4 + 4 + 4 + 4
                    // + reserved(8) + layer/alt/vol/res(8) + matrix(36)
                    val dimsAt = base + 8 + 8 + 36
                    if (dimsAt + 8 > g + gs) return None
                    w = be32(b, dimsAt) >> 16
                    h = be32(b, dimsAt + 4) >> 16
                  }
                  g += gs.toInt
                }
              case _ => ()
            }
            c += cs.toInt
          }
        case _ => ()
      }
      off += size.toInt
    }
    if (brand == null || ts < 0) None
    else Some(("mp4", brand, Some((ts, dur, nTracks, w, h))))
  }

  /** DocType from an EBML header: walks the header's child elements with
    * general varint ids/sizes (leading-zero-count length encoding).
    */
  private def parseEbml(b: Array[Byte]): Option[String] = {
    // varint at `o`: (value, widthBytes); `keepMarker` for element IDs
    def varint(o: Int, keepMarker: Boolean): (Long, Int) = {
      val first = b(o) & 0xff
      if (first == 0) throw new IllegalArgumentException("bad varint")
      val n = Integer.numberOfLeadingZeros(first) - 24 + 1 // 1..8
      var v: Long = if (keepMarker) first else first & ((1 << (8 - n)) - 1)
      var i = 1
      while (i < n) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
      (v, n)
    }
    val (_, idW) = varint(0, keepMarker = true) // 0x1A45DFA3
    val (bodyLen, szW) = varint(idW, keepMarker = false)
    var o = idW + szW
    val end = math.min(o + bodyLen, b.length.toLong).toInt
    while (o < end) {
      val (id, iw) = varint(o, keepMarker = true)
      val (len, lw) = varint(o + iw, keepMarker = false)
      val payload = o + iw + lw
      if (payload + len > end) return None
      if (id == 0x4282L)
        return Some(new String(b, payload, len.toInt, "US-ASCII"))
      o = payload + len.toInt
    }
    None
  }
}
