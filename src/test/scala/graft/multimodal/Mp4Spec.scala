package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** ISO BMFF demux (Codecs.parseMp4 / encodeMp4) and the MP4 path of
  * Multimodal.sampleFrames: real sample tables in, real byte extents,
  * timestamps and keyframe structure out. */
class Mp4Spec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private def frameBytes(i: Int, size: Int): Array[Byte] =
    Array.tabulate(size)(b => ((i * 31 + b * 7) % 251).toByte)

  test("mux → demux round-trip: dims, duration, per-sample ts/size/offset/keyframe") {
    val frames = (0 until 5).map(i => frameBytes(i, 10 + i))
    val mp4 = Codecs.encodeMp4(frames, frameDurMs = 500L, w = 320, h = 180,
      keyEvery = 2)
    val v = Codecs.parseMp4(mp4).get
    assert(v.width === 320 && v.height === 180)
    assert(v.timescale === 1000L)
    assert(v.durationMs === 2500L)
    assert(v.codec === "mp4v")
    assert(v.samples.length === 5)
    v.samples.zipWithIndex.foreach { case (s, i) =>
      assert(s.tsMs === i * 500L)
      assert(s.size === 10 + i)
      assert(s.keyframe === (i % 2 == 0)) // stss every 2nd sample, 1-based
      // the byte extent slices back to EXACTLY the muxed frame
      val got = java.util.Arrays.copyOfRange(mp4, s.offset.toInt,
        (s.offset + s.size).toInt)
      assert(got.sameElements(frames(i)), s"sample $i bytes")
    }
  }

  test("absent stss → every sample is a sync sample (spec default)") {
    val mp4 = Codecs.encodeMp4((0 until 3).map(i => frameBytes(i, 8)),
      frameDurMs = 100L, w = 4, h = 4, writeStss = false)
    val v = Codecs.parseMp4(mp4).get
    assert(v.samples.forall(_.keyframe))
  }

  test("corrupt containers return None, never throw") {
    val good = Codecs.encodeMp4(Seq(frameBytes(0, 64)), 100L, 8, 8)
    assert(Codecs.parseMp4(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    assert(Codecs.parseMp4(Array.tabulate(200)(_.toByte)).isEmpty)
    assert(Codecs.parseMp4(Array.emptyByteArray).isEmpty)
    // moov present but a sample extent runs past the payload: clamp test
    // by chopping ONLY trailing mdat bytes is impossible (moov trails),
    // so corrupt the stsz size field instead
    val idx = indexOfAscii(good, "stsz")
    val bad = good.clone()
    bad(idx + 12) = 0x7f.toByte // first sample size becomes huge
    assert(Codecs.parseMp4(bad).isEmpty)
  }

  test("sniffMediaType recognizes the muxed MP4 as video") {
    val mp4 = Codecs.encodeMp4(Seq(frameBytes(1, 16)), 100L, 8, 8)
    assert(Codecs.sniffMediaType(mp4) === Some("video"))
  }

  test("sampleFrames MP4 path: keyframe-snapped ticks with real sample bytes") {
    import spark.implicits._
    val frames = (0 until 4).map(i => frameBytes(i, 12 + i))
    val mp4 = Codecs.encodeMp4(frames, frameDurMs = 500L, w = 16, h = 9,
      keyEvery = 2) // keyframes: samples 0, 2
    val assets = Seq(
      Multimodal.Asset(7L, "video", mp4, None, None, None)).toDS()
    val out = Multimodal.sampleFrames(assets, everyMs = 500L)
      .collect().sortBy(_.frame_idx)
    // duration 2000ms → ticks 0..4 (5 frames)
    assert(out.map(_.ts_ms).toSeq === Seq(0L, 500L, 1000L, 1500L, 2000L))
    // showing keyframe at each tick: sample 0 for ts<1000, sample 2 after
    val expect = Seq(0, 0, 2, 2, 2)
    out.zip(expect).foreach { case (f, ei) =>
      assert(f.payload.sameElements(frames(ei)), s"tick ${f.frame_idx}")
    }
  }

  test("sampleFrames MP4 path: metadata duration overrides; cap bounds fan-out") {
    import spark.implicits._
    val mp4 = Codecs.encodeMp4((0 until 2).map(i => frameBytes(i, 10)),
      frameDurMs = 500L, w = 8, h = 8)
    val assets = Seq(
      Multimodal.Asset(1L, "video", mp4, None, None, Some(3000L)),
      Multimodal.Asset(2L, "video", mp4, None, None, Some(Long.MaxValue / 2))).toDS()
    val byAsset = Multimodal.sampleFrames(assets, everyMs = 500L,
      maxFramesPerAsset = 4).collect().groupBy(_.asset_id)
    assert(byAsset(1L).length === 4) // 3000/500+1=7, capped at 4
    assert(byAsset(2L).length === 4) // huge duration: cap, not overflow
  }

  private def indexOfAscii(hay: Array[Byte], needle: String): Int = {
    val n = needle.getBytes("US-ASCII")
    hay.indices.find(i => i + n.length <= hay.length &&
      n.indices.forall(j => hay(i + j) == n(j))).get
  }
}
