package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal plumbing: schema, batch decode shape, determinism, frame
  * sampling fan-out — plus the REAL javax.imageio decode path (PNG exact
  * round trip, JPEG lossy round trip, corrupt-blob fallback).
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

  test("PNG decode recovers exact width/height and channel means from pixels") {
    val id = 42L
    val bytes = Multimodal.encodeTestPng(id)
    // PNG magic: the fixture is a genuine encoded image, not raw pixels
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte)
    val Some((w, h, feats)) = Multimodal.decodeImage(bytes)
    assert(w == 4 + (id % 13).toInt && h == 3 + (id % 7).toInt)
    val expected = (for { y <- 0 until h; x <- 0 until w }
      yield Multimodal.pngTestPixel(id, x, y))
    def mean(f: ((Int, Int, Int)) => Int): Float =
      (expected.map(f).map(_.toLong).sum.toDouble / (w * h)).toFloat
    assert(feats.toSeq == Seq(mean(_._1), mean(_._2), mean(_._3)),
      "lossless codec must round-trip channel means exactly")
  }

  test("JPEG decode recovers exact dimensions and approximate means") {
    // uniform mid-gray: JPEG is lossy but DC-only content survives closely
    val img = new java.awt.image.BufferedImage(20, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 20) img.setRGB(x, y, 0x808080)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", baos)
    val Some((w, h, feats)) = Multimodal.decodeImage(baos.toByteArray)
    assert(w == 20 && h == 12 && feats.length == 3)
    assert(feats.forall(f => math.abs(f - 128f) < 4f),
      s"uniform gray must decode near 128, got ${feats.toSeq}")
  }

  test("decodeMedia dispatches on mime and falls back on corrupt blobs") {
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.encodeTestPng(1L), "image/png", 0, 0, 0L),
      // image mime but garbage bytes: must fall back, not throw
      Multimodal.MediaRow(2L, Array[Byte](1, 2, 3, 4), "image/png", 0, 0, 4L),
      Multimodal.MediaRow(3L, "plain bytes".getBytes, "application/octet-stream", 0, 0, 11L))
    val out = Multimodal.decodeMedia(spark, spark.createDataFrame(rows))
      .collect().map(d => d.media_id -> d).toMap
    assert(out(1L).width == 4 + 1 && out(1L).height == 3 + 1)
    assert(out(1L).features.length == 3)
    assert(out(2L).width == 0 && out(2L).features.length == 8,
      "corrupt image blob degrades to the byte-feature fallback")
    assert(out(3L).width == 0 && out(3L).checksum != 0L)
  }

  test("WAV decode recovers format, frame count, and exact sample energy") {
    // container round trip: REAL AudioSystem encode -> decode
    val bytes = Multimodal.encodeTestWav(3L)
    val Some((sr, nf, nc, sumAbs)) = Multimodal.decodeAudio(bytes)
    assert(sr == 8000 && nc == 1)
    assert(nf == (3L % 5 + 1) * 400)
    val expected = (0L until nf).map(i =>
      math.abs(Multimodal.wavTestSample(3L, i)).toLong).sum
    assert(sumAbs == expected, "decoded PCM energy must equal authored energy")
    // corrupt blob: decode degrades to None, the table op to a zero row
    assert(Multimodal.decodeAudio(Array[Byte](9, 9, 9)).isEmpty)
    val rows = Seq(
      Multimodal.MediaRow(1L, bytes, "audio/wav", 0, 0, bytes.length.toLong),
      Multimodal.MediaRow(2L, Array[Byte](9, 9), "audio/wav", 0, 0, 2L))
    val out = Multimodal.decodeAudioTable(spark, spark.createDataFrame(rows))
      .collect().map(a => a.media_id -> a).toMap
    assert(out(1L).sum_abs == expected && out(2L).sample_rate == 0)
  }

  test("nearest-neighbor resize picks the exact fixture pixels") {
    val id = 5L
    val (w, h) = (4 + (id % 13).toInt, 3 + (id % 7).toInt)
    val Some((gotW, gotH, px)) =
      Multimodal.resizeImage(Multimodal.encodeTestPng(id), 3, 2)
    assert(gotW == w && gotH == h && px.length == 18)
    // out pixel (ox, oy) = source pixel (floor(ox*w/3), floor(oy*h/2))
    for (oy <- 0 until 2; ox <- 0 until 3) {
      val (sx, sy) = (ox * w / 3, oy * h / 2)
      val (r, g, b) = Multimodal.pngTestPixel(id, sx, sy)
      val base = (oy * 3 + ox) * 3
      assert((px(base), px(base + 1), px(base + 2)) == ((r, g, b)),
        s"out pixel ($ox,$oy) != source ($sx,$sy)")
    }
    // corrupt blob degrades to the all-zero row, not a stage failure
    assert(Multimodal.resizeImage(Array[Byte](1, 2, 3), 3, 2).isEmpty)
  }

  test("frame sampling fans one blob into many frames") {
    val frames = Multimodal.sampleFrames(spark, media.limit(10),
      frameBytes = 16, stride = 32)
    val counts = frames.groupBy("media_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 >= 2))
    val f = frames.limit(1).collect()(0)
    assert(f.getAs[Array[Byte]]("frame").length <= 16)
  }

  test("dHash matches a direct per-pixel recompute of the fixture formula") {
    for (id <- Seq(0L, 3L, 7L, 12L, 19L)) {
      val w = 4 + (id % 13).toInt; val h = 3 + (id % 7).toInt
      def luma(sx: Int, sy: Int): Int = {
        val (r, g, b) = Multimodal.pngTestPixel(id, sx, sy)
        (299 * r + 587 * g + 114 * b) / 1000
      }
      var want = 0L
      for (y <- 0 until 8; x <- 0 until 8) {
        val sy = y * h / 8
        if (luma((x + 1) * w / 9, sy) > luma(x * w / 9, sy))
          want |= 1L << (y * 8 + x)
      }
      val got = Multimodal.dHash(Multimodal.encodeTestPng(id))
      assert(got.contains(want), s"id $id: got $got want $want")
    }
    // identical bytes → identical hash; corrupt blob drops, not throws
    assert(Multimodal.dHash(Multimodal.encodeTestPng(5L)) ==
      Multimodal.dHash(Multimodal.encodeTestPng(5L)))
    assert(Multimodal.dHash(Array[Byte](9, 9, 9)).isEmpty)
    assert(Multimodal.dHash(Array.emptyByteArray).isEmpty)
  }

  test("banded near-dup pairs equal the exact all-pairs Hamming join") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.pngNearDupTableFromDocuments(spark, docs, 10)
    val banded = Multimodal.imageNearDupPairs(spark, media, maxDist = 3)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    val h = Multimodal.dhashTable(spark, media)
    val exact = h.as("a").join(h.as("b"),
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("CAST(bit_count(a.dhash ^ b.dhash) AS BIGINT)").as("dist"))
      .where(col("dist") <= 3)
      .as[(Long, Long, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(banded == exact, "pigeonhole banding must be lossless for d <= 3")
    assert(banded.nonEmpty && banded.exists(_._3 > 0),
      "fixture must plant pairs at distance > 0")
    intercept[IllegalArgumentException] {
      Multimodal.imageNearDupPairs(spark, media, maxDist = 4) }
  }

  test("audioHash matches a direct recompute from the shaped-sample formula") {
    for (fid <- Seq(0L, 4L, 9L, 17L)) {
      val n = ((fid % 5) + 1).toInt * 400
      val abs = (0 until n).map(i =>
        math.abs(Multimodal.wavShapedSample(fid, i).toLong))
      val e = (0 until 65).map(k =>
        abs.slice(k * n / 65, (k + 1) * n / 65).sum)
      var want = 0L
      for (b <- 0 until 64) if (e(b + 1) > e(b)) want |= 1L << b
      // round-trip through the REAL WAV container via the dup fixture
      val docs = Seq(fid).toDF("doc_id")
      val bytes = Multimodal.wavDupTableFromDocuments(spark, docs, 20)
        .select("media").collect()(0).getAs[Array[Byte]](0)
      assert(Multimodal.audioHash(bytes).contains(want), s"fid $fid")
    }
    assert(Multimodal.audioHash(Array[Byte](1, 2)).isEmpty)
    assert(Multimodal.audioHash(Array.emptyByteArray).isEmpty)
  }

  test("perceptual audio dedup groups planted duplicates") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nDocs = docs.count()
    val dup = Multimodal.wavDupTableFromDocuments(spark, docs, nDistinct = 10)
    val groups = Multimodal.perceptualAudioDedup(spark, dup)
      .as[(Long, Long, Long)].collect()
    assert(groups.map(_._2).sum == nDocs)
    assert(groups.length <= 10)
    assert(groups.map(_._3).forall(_ < 10))
  }

  test("perceptual dedup groups planted duplicates under one fingerprint") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val nDocs = docs.count()
    val dup = Multimodal.pngDupTableFromDocuments(spark, docs, nDistinct = 10)
    val groups = Multimodal.perceptualImageDedup(spark, dup)
      .as[(Long, Long, Long)].collect()
    // every doc lands in exactly one group; ≤10 distinct fingerprints
    assert(groups.map(_._2).sum == nDocs)
    assert(groups.length <= 10)
    // keepers are group minima, so all keepers are among the first 10 ids
    assert(groups.map(_._3).forall(_ < 10))
    // re-running is deterministic
    val again = Multimodal.perceptualImageDedup(spark, dup)
      .as[(Long, Long, Long)].collect()
    assert(groups.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("video container round-trips: splitFrames inverts encodeTestVideo") {
    val fids = Seq(3L, 17L, 130L)
    val video = Multimodal.encodeTestVideo(fids)
    val frames = Multimodal.splitFrames(video).toSeq
    assert(frames.length == 3)
    assert(frames.zip(fids).forall { case (f, id) =>
      java.util.Arrays.equals(f, Multimodal.encodeTestPng(id)) })
    // truncated container: the short trailing frame drops, no throw
    val cut = java.util.Arrays.copyOfRange(video, 0, video.length - 5)
    assert(Multimodal.splitFrames(cut).length == 2)
    assert(Multimodal.splitFrames(Array.emptyByteArray).isEmpty)
    // corrupt header near Int.MaxValue: Int arithmetic would wrap
    // off+4+len negative and crash copyOfRange — must drop defensively
    val corrupt = Array[Byte](0x7f, -1, -1, -1, 1, 2, 3)
    assert(Multimodal.splitFrames(corrupt).isEmpty)
    // corrupt header mid-stream after one good frame: good frame kept
    val good = Multimodal.encodeTestVideo(Seq(5L))
    assert(Multimodal.splitFrames(good ++ corrupt).length == 1)
  }

  test("video near-dup mine: exact Jaccard on emitted pairs, subset of " +
      "the exact baseline, planted variants caught") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val media = Multimodal.videoNearDupTableFromDocuments(spark, docs,
      nDistinct = 10, nFrames = 8)
    val found = Multimodal.videoNearDupPairs(spark, media, threshold = 0.7)
      .as[(Long, Long, Double)].collect()
    // exact baseline recomputed independently from the fixture formula
    val nDocs = docs.count()
    def hashes(id: Long): Set[Long] = {
      val vid = id % 10
      val v = ((id / 10) % 2).toInt
      Multimodal.videoFrameIds(vid, v, 8)
        .flatMap(f => Multimodal.dHash(Multimodal.encodeTestPng(f))).toSet
    }
    val hs = (0L until nDocs).map(id => id -> hashes(id)).toMap
    val exact = (for {
      a <- 0L until nDocs; b <- (a + 1) until nDocs
      inter = (hs(a) & hs(b)).size
      j = inter.toDouble / (hs(a).size + hs(b).size - inter)
      if math.rint(j * 1e6) / 1e6 >= 0.7
    } yield (a, b)).toSet
    val foundSet = found.map(p => (p._1, p._2)).toSet
    assert(foundSet.subsetOf(exact), "mined a pair below the threshold")
    assert(exact.nonEmpty && foundSet.size >= (exact.size * 0.9).toInt,
      s"recall ${foundSet.size}/${exact.size}")
    // emitted Jaccards are the TRUE set Jaccards (verify is exact)
    found.foreach { case (a, b, j) =>
      val inter = (hs(a) & hs(b)).size
      val tj = inter.toDouble / (hs(a).size + hs(b).size - inter)
      assert(math.abs(j - math.rint(tj * 1e6) / 1e6) < 1e-9, s"($a,$b)")
    }
    // base<->variant one-frame-edit pairs are present (Jaccard 7/9)
    assert(found.exists { case (_, _, j) => j < 0.999 && j >= 0.7 })
  }
}
