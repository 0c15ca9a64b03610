package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata, per the north-star extension spec.
  *
  * Real codec libraries are absent in this environment, so the DECODE step is
  * a clearly-marked deterministic stub ([[fakeDecodeImage]]) — but the
  * Spark-side plumbing is real and is what matters at 100 TB:
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

  /** Metadata extraction — pure Catalyst, never decodes the payload. */
  def withMeta(media: DataFrame): DataFrame =
    media.withColumn("meta", struct(
      octet_length(col("bytes")).cast("long").as("n_bytes"),
      md5(col("bytes")).as("digest"),
      upper(substring(base64(col("bytes")), 1, 4)).as("format")))

  /** STUB decode: a real deployment would decode image bytes with a codec
    * library inside this mapPartitions (constant-memory iterator, one codec
    * context per task). Here it derives deterministic fake dimensions from
    * the digest so tests are reproducible. The batch shape, schema, and
    * partition behavior are the real thing; ONLY the pixel math is fake.
    */
  def fakeDecodeImage(spark: SparkSession, media: DataFrame): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false)))
    val in = media.select("media_id", "bytes")
    val rdd = in.rdd.mapPartitions { it =>
      // >>> STUB: replace with a real codec (e.g. ImageIO) when available <<<
      it.map { r =>
        val id = r.getLong(0)
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val n = bytes.length
        Row(id, 64 + (n % 512), 64 + ((n / 7) % 512), 1 + (n % 30))
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** Frame sampling plumbing: every `stride`-th frame index per video row,
    * exploded to one row per sampled frame (generator, no shuffle).
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))))
      .select("media_id", "frame_idx")
}
