package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch decode shape, determinism, frame
  * sampling fan-out. The decode itself is a documented stub.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.mediaTableFromDocuments(
    spark.read.parquet(s"$sf0001/documents.parquet")).cache()

  test("media table carries binary payload + typed metadata") {
    val row = media.limit(1).collect()(0)
    assert(row.getAs[Array[Byte]]("media").nonEmpty)
    assert(media.schema("media").dataType.typeName == "binary")
    assert(media.schema("n_bytes").dataType.typeName == "long")
  }

  test("decodeFeatures yields fixed-width vectors, deterministic across runs") {
    val f1 = Multimodal.decodeFeatures(spark, media, dims = 8)
      .collect().map(f => f.media_id -> (f.checksum, f.features.toSeq)).toMap
    val f2 = Multimodal.decodeFeatures(spark, media.repartition(5), dims = 8)
      .collect().map(f => f.media_id -> (f.checksum, f.features.toSeq)).toMap
    assert(f1.size == media.count())
    assert(f1.values.forall(_._2.size == 8))
    assert(f1 == f2, "decode must not depend on partitioning")
  }

  test("distinct payloads get distinct checksums (stub is content-sensitive)") {
    val n = Multimodal.decodeFeatures(spark, media)
      .select("checksum").distinct().count()
    assert(n > media.count() * 9 / 10)
  }

  test("frame sampling fans one blob into many frames") {
    val frames = Multimodal.sampleFrames(spark, media.limit(10),
      frameBytes = 16, stride = 32)
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 >= 2))
    val f = frames.limit(1).collect()(0)
    assert(f.getAs[Array[Byte]]("frame").length <= 16)
  }
}
