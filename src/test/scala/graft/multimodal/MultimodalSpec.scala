package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.SharedSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("feature extraction: deterministic, content-sensitive, right shape") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 30, dupEvery = 10)
    val f1 = Multimodal.extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    val f2 = Multimodal.extractFeatures(assets, dim = 16).collect().sortBy(_.asset_id)
    assert(f1.length === 30)
    assert(f1.forall(_.features.length === 16))
    // deterministic across runs
    assert(f1.map(_.content_hash).toSeq === f2.map(_.content_hash).toSeq)
    // planted duplicates (ids 0,10,20 share content) agree; others differ
    assert(f1(0).content_hash === f1(10).content_hash)
    assert(f1(0).features.toSeq === f1(20).features.toSeq)
    assert(f1(1).content_hash !== f1(2).content_hash)
  }

  test("resize: images get new payload + consistent metadata, others untouched") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 12, dupEvery = 0)
    val before = assets.collect().map(a => a.asset_id -> a).toMap
    val resized = Multimodal.resize(assets, 32, 32).collect()
    assert(resized.length === 12)
    for (a <- resized) {
      if (a.media_type == "image") {
        assert(a.width === Some(32) && a.height === Some(32))
        assert(!java.util.Arrays.equals(a.payload, before(a.asset_id).payload))
        assert(a.payload.length === 32 * 32 / 64)
      } else {
        assert(java.util.Arrays.equals(a.payload, before(a.asset_id).payload))
        assert(a.width === before(a.asset_id).width)
      }
    }
    // deterministic: same input → byte-identical output
    val again = Multimodal.resize(assets, 32, 32).collect()
      .map(a => a.asset_id -> a.payload).toMap
    assert(resized.forall(a => java.util.Arrays.equals(a.payload, again(a.asset_id))))
  }

  test("sampleFrames: one row per interval per video, deterministic, only videos") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 12, dupEvery = 0)
    val videos = assets.collect().filter(_.media_type == "video")
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000).collect()
    // every frame belongs to a video; counts follow duration DIV interval + 1
    val perAsset = frames.groupBy(_.asset_id)
    assert(perAsset.keySet === videos.map(_.asset_id).toSet)
    for (v <- videos) {
      val fs = perAsset(v.asset_id).sortBy(_.frame_idx)
      assert(fs.length === (v.duration_ms.get / 1000).toInt + 1)
      assert(fs.map(_.ts_ms).toSeq === fs.indices.map(_ * 1000L))
      // timestamp-sensitive: consecutive frames differ
      assert(!java.util.Arrays.equals(fs(0).payload, fs(1).payload))
    }
    val again = Multimodal.sampleFrames(assets, everyMs = 1000).collect()
      .map(f => (f.asset_id, f.frame_idx) -> f.payload).toMap
    assert(frames.forall(f => java.util.Arrays.equals(f.payload, again((f.asset_id, f.frame_idx)))))
  }

  test("sampleFrames: REAL decode end-to-end on an animated GIF — " +
      "payloads are PNGs of the right frame at each tick") {
    implicit val s = spark
    import java.awt.image.BufferedImage
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val imgs = colors.map { c =>
      val img = new BufferedImage(5, 3, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, c)
      img
    }
    // 100 cs = 1 s per frame → timeline 0/1000/2000, duration 3000 ms
    val gif = Codecs.encodeAnimatedGif(imgs, delayCs = 100)
    import spark.implicits._
    val assets = spark.createDataset(Seq(
      Multimodal.Asset(7L, Codecs.sniffMediaType(gif).get, gif,
        None, None, None)))
    val frames = Multimodal.sampleFrames(assets, everyMs = 500)
      .collect().sortBy(_.frame_idx)
    // duration from the GIF's own timeline (no metadata): 3000/500 + 1
    assert(frames.length === 7)
    assert(frames.map(_.ts_ms).toSeq === (0 until 7).map(_ * 500L))
    // each payload is a REAL PNG of the frame showing at that tick
    frames.foreach { f =>
      val img = Codecs.decodeImage(f.payload).get
      assert(img.getWidth === 5 && img.getHeight === 3)
      val expect = colors(math.min(2, (f.ts_ms / 1000L).toInt))
      assert((img.getRGB(2, 1) & 0xffffff) === expect,
        s"tick ${f.ts_ms} shows the wrong frame")
    }
  }

  test("fromBinaryFiles loads a directory of media as typed Asset rows") {
    implicit val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft_binfiles")
    def put(name: String, bytes: Array[Byte]): Unit =
      java.nio.file.Files.write(dir.resolve(name), bytes)
    put("photo.JPG", Array[Byte](1, 2, 3, 4))
    put("clip.mp4", Array[Byte](5, 6))
    put("notes.bin", Array[Byte](7))

    val assets = Multimodal.fromBinaryFiles(spark, dir.toString).collect()
    assert(assets.length === 3)
    val byType = assets.map(a => a.media_type).sorted.toSeq
    assert(byType === Seq("binary", "image", "video"))
    assert(assets.map(_.asset_id).distinct.length === 3)
    val img = assets.find(_.media_type == "image").get
    assert(img.payload.toSeq === Seq[Byte](1, 2, 3, 4)) // bytes verbatim
    // ids are stable across reloads
    val again = Multimodal.fromBinaryFiles(spark, dir.toString).collect()
    assert(assets.map(_.asset_id).sorted.toSeq === again.map(_.asset_id).sorted.toSeq)
    // and the loaded assets flow through the feature pipeline unchanged
    import spark.implicits._
    val feats = Multimodal.extractFeatures(
      Multimodal.fromBinaryFiles(spark, dir.toString)).collect()
    assert(feats.length === 3 && feats.forall(_.features.length === 16))
  }

  test("sampleFrames clamps corrupt durations instead of overflowing") {
    implicit val s = spark
    import spark.implicits._
    val corrupt = Seq(
      Multimodal.Asset(1L, "video", Array[Byte](1, 2, 3), None, None,
        Some(3000000000000L))). // ~95 years of "video": Int-overflow bait
      toDS()
    val frames = Multimodal.sampleFrames(corrupt, everyMs = 1000, maxFramesPerAsset = 50)
      .collect()
    assert(frames.length === 50) // capped, not zero (wrap) and not 3e9
    assert(frames.map(_.frame_idx).max === 49)
    intercept[IllegalArgumentException](Multimodal.resize(corrupt, 0, 5))
    intercept[IllegalArgumentException](Multimodal.resize(corrupt, 65536, 65536))
  }

  test("content dedup groups identical payloads") {
    implicit val s = spark
    val assets = Multimodal.syntheticAssets(spark, 30, dupEvery = 10)
    val d = Multimodal.dedupByContent(Multimodal.extractFeatures(assets))
    val dupGroup = d.filter(col("n_copies") > 1).collect()
    assert(dupGroup.length === 1)
    assert(dupGroup.head.getAs[Long]("n_copies") === 3L) // ids 0, 10, 20
    assert(dupGroup.head.getAs[Long]("keep_id") === 0L)
  }

  test("audioLevels: exact q15 metering through the real WAV codec") {
    implicit val s = spark
    import spark.implicits._
    val shorts = Array[Short](0, 100, -200, 32767, -32768)
    val payload = Codecs.encodeWav16(shorts, 8000f)
    val assets = Seq(
      Multimodal.Asset(1L, "audio", payload, None, None, None),
      Multimodal.Asset(2L, "audio", Array[Byte](1, 2, 3), None, None, None))
      .toDS()
    val got = Multimodal.audioLevels(assets).collect().sortBy(_.asset_id)
    val a = got(0)
    assert(a.decoded && a.n_samples === 5L)
    assert(a.peak_q15 === 32768L)
    val ss = shorts.map(v => v.toLong * v).sum
    assert(a.sum_sq === ss)
    assert(a.rms_q15 === Multimodal.isqrt(ss / 5))
    // undecodable payload quarantines, never throws
    assert(!got(1).decoded && got(1).n_samples === 0L)
  }

  test("isqrt: exact on perfect squares and boundaries") {
    val cases = Seq(0L, 1L, 3L, 4L, 8L, 9L, 999999L, 1000000L,
      (1L << 30) - 1, 1L << 30, 429493622L)
    cases.foreach { m =>
      val r = Multimodal.isqrt(m)
      assert(r * r <= m && (r + 1) * (r + 1) > m, s"m=$m r=$r")
    }
  }
}
