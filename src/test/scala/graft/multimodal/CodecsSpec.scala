package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Real-codec tests: fixtures are genuine PNG and WAV byte streams built
  * through the same JDK encoders a production corpus would have used, so
  * decode is exercised against the actual formats, not hand-rolled bytes. */
class CodecsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] =
    Codecs.solidPng(w, h, rgb)

  private def sineWav(n: Int, rate: Float, amp: Float, freq: Float): Array[Byte] =
    Codecs.sineWav(n, rate, amp, freq)

  test("sniffMediaType: magic bytes beat extensions") {
    assert(Codecs.sniffMediaType(solidPng(2, 2, 0)) === Some("image"))
    assert(Codecs.sniffMediaType(sineWav(64, 8000f, 0.5f, 440f)) === Some("audio"))
    assert(Codecs.sniffMediaType(Array[Byte](1, 2, 3)) === None)
    assert(Codecs.sniffMediaType(Array.emptyByteArray) === None)
  }

  test("GIF sniffing walks block structure: comment-text decoys and " +
      "late second frames both route correctly") {
    import java.awt.image.BufferedImage
    def frame(w: Int, h: Int, seed: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var s = seed
      for (y <- 0 until h; x <- 0 until w) {
        s = s * 1103515245 + 12345 // noisy pixels defeat LZW: big frames
        img.setRGB(x, y, s & 0xffffff)
      }
      img
    }
    // (a) a STILL GIF carrying the literal text "NETSCAPE2.0" in a
    // comment extension — a substring scan calls it animated, the block
    // walk must not
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frame(4, 4, 1), "gif", bos)
    val still = bos.toByteArray
    val packed = still(10) & 0xff
    val gctLen = if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0
    val insertAt = 13 + gctLen
    val decoy = "NETSCAPE2.0".getBytes("US-ASCII")
    val comment = Array[Byte](0x21, 0xfe.toByte, decoy.length.toByte) ++
      decoy :+ 0x00.toByte
    val spliced = still.take(insertAt) ++ comment ++ still.drop(insertAt)
    assert(Codecs.sniffMediaType(spliced) === Some("image"),
      "comment-text decoy must not reroute a still GIF")
    assert(Codecs.decodeImage(spliced).isDefined,
      "the spliced fixture must remain a valid GIF")
    // (b) an animation whose loop block is STRIPPED and whose first
    // frame alone exceeds any fixed header-scan cap — the second image
    // descriptor is the truth
    val big = Codecs.encodeAnimatedGif(
      Seq(frame(96, 96, 2), frame(96, 96, 3)), delayCs = 25)
    val loop = Array[Byte](0x21, 0xff.toByte, 0x0b) ++
      "NETSCAPE2.0".getBytes("US-ASCII")
    val at = big.indices.find(i =>
      loop.indices.forall(j => i + j < big.length && big(i + j) == loop(j)))
    assert(at.isDefined, "encoder fixture must carry the loop block")
    // app extension: introducer+label+11-byte id, 3-byte sub-block, term
    val stripped = big.take(at.get) ++ big.drop(at.get + 19)
    assert(stripped.length > 4096 + 1024,
      "fixture must outgrow a fixed scan cap")
    assert(Codecs.sniffMediaType(stripped) === Some("video"),
      "loopless multi-frame GIF must still sniff as video")
  }

  test("animated GIF: encode -> sniff as video -> decode frames with " +
      "timestamps and composed pixels") {
    import java.awt.image.BufferedImage
    // three solid frames R, G, B at 6x4, 25 cs (250 ms) apart
    val colors = Seq(0xff0000, 0x00ff00, 0x0000ff)
    val frames = colors.map { c =>
      val img = new BufferedImage(6, 4, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 4; x <- 0 until 6) img.setRGB(x, y, c)
      img
    }
    val gif = Codecs.encodeAnimatedGif(frames, delayCs = 25)
    assert(Codecs.sniffMediaType(gif) === Some("video"),
      "animated GIF (NETSCAPE loop) must sniff as video")
    // single-frame GIF (no animation) stays an image
    val still = Codecs.encodeAnimatedGif(frames.take(1), delayCs = 25)
    // (our encoder always writes the loop block; build a plain GIF via
    // ImageIO.write for the still case)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(frames.head, "gif", bos)
    assert(Codecs.sniffMediaType(bos.toByteArray) === Some("image"))

    val decoded = Codecs.decodeGifFrames(gif).get
    assert(decoded.length === 3)
    assert(decoded.map(_.tsMs) === Vector(0L, 250L, 500L))
    assert(decoded.forall(_.delayMs == 250L))
    assert(decoded.forall(f =>
      f.image.getWidth == 6 && f.image.getHeight == 4))
    // composed pixel content: each canvas is its solid color
    decoded.zip(colors).foreach { case (f, c) =>
      assert((f.image.getRGB(3, 2) & 0xffffff) === c)
    }
    // non-GIF payloads refuse politely
    assert(Codecs.decodeGifFrames(solidPng(2, 2, 0)) === None)
    assert(Codecs.decodeGifFrames(Array[Byte](1, 2, 3)) === None)
    assert(still.nonEmpty) // the loop-block still frame decodes too
    assert(Codecs.decodeGifFrames(still).get.length === 1)
  }

  test("decodeImage + imageFeatures: dimensions and histogram mass") {
    val png = solidPng(8, 6, 0x00808080) // mid-gray
    val img = Codecs.decodeImage(png).get
    assert(img.getWidth === 8 && img.getHeight === 6)
    val f = Codecs.imageFeatures(img, 16)
    assert(f.length === 16)
    // histogram is a probability mass: sums to 1, all of it in the
    // single bin holding luma 128 → bin 128*16/256 = 8
    assert(math.abs(f.sum - 1.0f) < 1e-6)
    assert(f(8) === 1.0f)
    // undecodable bytes → None, never throw
    assert(Codecs.decodeImage(Array[Byte](1, 2, 3, 4)) === None)
    assert(Codecs.decodeImage(Array.emptyByteArray) === None)
  }

  test("resizeImage: real scale, roundtrips through decode") {
    val png = solidPng(16, 16, 0x00ff0000) // solid red
    val out = Codecs.resizeImage(png, 4, 4).get
    val back = Codecs.decodeImage(out).get
    assert(back.getWidth === 4 && back.getHeight === 4)
    // solid color survives bilinear scaling exactly
    assert((back.getRGB(2, 2) & 0xffffff) === 0xff0000)
    assert(Codecs.resizeImage(Array[Byte](9, 9, 9), 4, 4) === None)
  }

  test("decodePcm: WAV roundtrip recovers samples, rate, duration") {
    val rate = 8000f
    val wav = sineWav(4000, rate, 0.5f, 440f)
    val pcm = Codecs.decodePcm(wav).get
    assert(pcm.sampleRate === rate)
    assert(pcm.samples.length === 4000)
    assert(pcm.durationMs === 500L)
    // sine RMS = amp/sqrt(2); int16 quantization keeps it within 1e-3
    val rms = math.sqrt(pcm.samples.map(s => s.toDouble * s).sum / pcm.samples.length)
    assert(math.abs(rms - 0.5 / math.sqrt(2)) < 1e-3)
    assert(Codecs.decodePcm(Array[Byte](0, 1, 2)) === None)
  }

  test("audioFeatures: RMS envelope tracks a half-silent signal") {
    val rate = 8000f
    val loud = Array.tabulate(2000)(i =>
      (0.8f * math.sin(2 * math.Pi * 440 * i / rate)).toFloat)
    val pcm = Codecs.decodePcm(Codecs.encodeWav(loud ++ Array.fill(2000)(0.0f), rate)).get
    val f = Codecs.audioFeatures(pcm, 4)
    assert(f.length === 4)
    // first half loud, second half silent
    assert(f(0) > 0.4f && f(1) > 0.4f)
    assert(f(2) < 1e-3f && f(3) < 1e-3f)
  }

  test("decodeAndExtract: real decode on real payloads, stub fallback on junk") {
    implicit val s = spark
    import s.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "image", solidPng(10, 7, 0x00404040), None, None, None),
      Multimodal.Asset(2L, "audio", sineWav(1600, 8000f, 0.3f, 220f), None, None, None),
      // labeled image but actually junk → stub fallback
      Multimodal.Asset(3L, "image", Array[Byte](1, 2, 3, 4, 5), None, None, None),
      // extension-lied: labeled binary but really a PNG → sniffing fixes it
      Multimodal.Asset(4L, "binary", solidPng(3, 3, 0x00ffffff), None, None, None)
    ).toDS()
    val out = Multimodal.decodeAndExtract(assets, dim = 8).collect()
      .map(f => f.asset_id -> f).toMap
    assert(out(1L).decoded && out(1L).width === Some(10) && out(1L).height === Some(7))
    assert(math.abs(out(1L).features.sum - 1.0f) < 1e-6)
    assert(out(2L).decoded && out(2L).duration_ms === Some(200L))
    assert(!out(3L).decoded && out(3L).features.length === 8)
    assert(out(4L).decoded && out(4L).media_type === "image" &&
      out(4L).width === Some(3))
  }

  test("resize Dataset path: real images really scale; junk keeps stub contract") {
    implicit val s = spark
    import s.implicits._
    val assets = Seq(
      Multimodal.Asset(1L, "image", solidPng(12, 12, 0x000000ff), Some(12), Some(12), None),
      Multimodal.Asset(2L, "image", Array[Byte](7, 7, 7), Some(1), Some(1), None)
    ).toDS()
    val out = Multimodal.resize(assets, 5, 5).collect().map(a => a.asset_id -> a).toMap
    val real = Codecs.decodeImage(out(1L).payload).get
    assert(real.getWidth === 5 && real.getHeight === 5)
    assert((real.getRGB(2, 2) & 0xffffff) === 0x0000ff)
    // junk payload takes the stub path: max(1, 5*5/64) = 1 fake byte
    assert(out(2L).width === Some(5) && out(2L).payload.length === 1)
  }
}
