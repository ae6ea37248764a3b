package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north star: treat image/audio/video as opaque
  * binary columns with typed metadata; decode/feature-extract as batch
  * functions over partitions).
  *
  * The decode step itself is STUBBED — no image/audio codecs exist in this
  * container — with a deterministic fake (`fakeDecodeFeatures`) so the
  * Spark-side plumbing (schema, partitioning, batch iterator shape, typed
  * output) is real and tested. Swap `decodePartition`'s body for a real
  * codec (JNI/FFmpeg/JPEG) without touching the dataflow.
  */
object Multimodal {

  /** Typed metadata carried next to every media blob. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  final case class MediaRow(media_id: Long, media: Array[Byte], mime: String,
      width: Int, height: Int, n_bytes: Long)

  final case class MediaFeatures(media_id: Long, mime: String,
      n_bytes: Long, checksum: Long, features: Array[Float])

  /** Build a media table from any (id, payload-bytes) source — here the
    * documents table stands in, its UTF-8 bytes playing the role of an
    * encoded image. Pure column ops; stays in codegen.
    */
  def mediaTableFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("application/octet-stream").as("mime"),
      lit(0).as("width"), lit(0).as("height"),
      length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decode: deterministic per-blob features — 8 chunked byte-average
    * buckets plus a rolling checksum. Stands in for pixel/sample decoding;
    * same signature a real decoder would have (bytes in → fixed-width
    * feature vector out).
    */
  def fakeDecodeFeatures(bytes: Array[Byte], dims: Int = 8): (Long, Array[Float]) = {
    if (bytes == null || bytes.isEmpty) (0L, Array.fill(dims)(0f))
    else {
      var checksum = 1469598103934665603L // FNV-1a offset basis
      var i = 0
      while (i < bytes.length) {
        checksum ^= (bytes(i) & 0xffL); checksum *= 1099511628211L; i += 1
      }
      val out = new Array[Float](dims)
      val chunk = math.max(bytes.length / dims, 1)
      var d = 0
      while (d < dims) {
        var s = 0L; var n = 0
        var j = d * chunk
        while (j < math.min((d + 1) * chunk, bytes.length)) {
          s += (bytes(j) & 0xff); n += 1; j += 1
        }
        out(d) = if (n == 0) 0f else s.toFloat / n
        d += 1
      }
      (checksum, out)
    }
  }

  /** Batch decode over partitions: the Scala analogue of `mapInPandas` —
    * one iterator per partition, so a real decoder amortizes codec init
    * across the partition (the batch shape that matters at 100 TB), and
    * decode parallelism == partition count.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      dims: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("media_id", "media", "mime", "n_bytes")
      .as[(Long, Array[Byte], String, Long)]
      .mapPartitions { it =>
        // per-partition init site for a real codec
        it.map { case (id, bytes, mime, nb) =>
          val (checksum, feats) = fakeDecodeFeatures(bytes, dims)
          MediaFeatures(id, mime, nb, checksum, feats)
        }
      }
  }

  /** Frame-sample stub: pick every `stride`-th byte-window as a "frame" —
    * the dataflow shape of video frame sampling (one row in, N frame rows
    * out) with a deterministic fake extractor.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int,
      stride: Int): DataFrame = {
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else (0 until bytes.length by math.max(stride, 1)).iterator.map { off =>
          (id, off, bytes.slice(off, math.min(off + frameBytes, bytes.length)))
        }
      }
      .toDF("media_id", "frame_offset", "frame")
  }
}
