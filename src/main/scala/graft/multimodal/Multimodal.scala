package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads ride through the
  * pipeline as opaque BinaryType columns with typed metadata; decode /
  * feature-extract runs as partition-local batch transforms.
  *
  * The Spark-side architecture — schema, typed Dataset shape,
  * per-partition batching, deterministic partitioning — is real and
  * tested, and so are the image and audio codecs: [[decodeAndExtract]]
  * and [[resize]] run the JDK's own `javax.imageio` (PNG/JPEG/GIF/BMP)
  * and `javax.sound.sampled` (WAV/AIFF/AU) decoders. Only VIDEO decode
  * is stubbed (the JDK has no video demuxer and this container has no
  * native codec libraries): `decodeStub` produces a deterministic fake
  * feature vector from the payload bytes, and undecodable/corrupt
  * payloads of any type fall back to it rather than failing the stage.
  * [[extractFeatures]] keeps the pure-stub path for tests that need
  * bit-deterministic features regardless of payload content.
  *
  * Scala mapPartitions is the JVM analogue of the Python mapInPandas
  * pattern: one iterator per partition, so a real decoder can amortize
  * model/codec initialization per partition instead of per row.
  */
object Multimodal {

  /** Asset row: opaque payload + typed metadata. */
  final case class Asset(
      asset_id: Long,
      media_type: String,        // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long])

  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      content_hash: Long,
      features: Array[Float])

  val assetSchema: StructType = Encoders.product[Asset].schema

  /** STUB decoder — deterministic fake: a real implementation would
    * decode the payload (JPEG/PCM/...) and run a feature extractor. The
    * fake derives `dim` floats from a rolling hash of the bytes so tests
    * have stable, content-sensitive values. */
  private[multimodal] def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    var h = 1125899906842597L
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    var j = 0
    while (j < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 40).toInt / 8388608.0f) - 1.0f // [-1, 1)
      j += 1
    }
    out
  }

  private def contentHash(payload: Array[Byte]): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    h
  }

  /** Deterministic LCG byte stream from a seed — the one fake-codec
    * generator shared by every stub (decode, resize, frame extraction),
    * so the PRNG lives in exactly one place. */
  private def lcgBytes(seed: Long, n: Int): Array[Byte] = {
    var h = seed
    Array.tabulate[Byte](n) { _ =>
      h = h * 6364136223846793005L + 1442695040888963407L
      (h >>> 56).toByte
    }
  }

  /** Partition-local feature extraction: iterator-in/iterator-out so a
    * real codec initializes once per partition (the mapInPandas batch
    * shape). The input is repartitioned by asset_id for even work
    * distribution regardless of upstream layout. */
  def extractFeatures(assets: Dataset[Asset], dim: Int = 16)
                     (implicit spark: SparkSession): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        // real impl: val codec = Codec.open() — once per partition
        it.map { a =>
          AssetFeatures(
            a.asset_id, a.media_type, a.payload.length.toLong,
            contentHash(a.payload), decodeStub(a.payload, dim))
        }
      }
  }

  /** [[decodeAndExtract]] row: features plus the intrinsic metadata the
    * real decode recovered. `decoded=false` marks the stub-fallback path
    * (undecodable/corrupt payloads, and video — no JDK video codec). */
  final case class DecodedFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      content_hash: Long,
      decoded: Boolean,
      width: Option[Int],
      height: Option[Int],
      duration_ms: Option[Long],
      features: Array[Float])

  /** REAL decode + feature extraction using the JDK's own codecs
    * ([[Codecs]]): images (PNG/JPEG/GIF/BMP) decode via `javax.imageio`
    * into a `dim`-bin luminance histogram and recover width/height;
    * WAV/AIFF/AU audio decodes via `javax.sound.sampled` into `dim`
    * short-time-RMS windows and recovers duration. Media type is
    * re-sniffed from magic bytes (crawled extensions lie); anything that
    * fails to decode — including all video, which the JDK cannot demux —
    * falls back to the deterministic stub with `decoded=false`, so one
    * corrupt payload degrades one row instead of failing the stage.
    * Same mapPartitions batch shape as [[extractFeatures]]. */
  def decodeAndExtract(assets: Dataset[Asset], dim: Int = 16)
                      (implicit spark: SparkSession): Dataset[DecodedFeatures] = {
    implicit val enc = Encoders.product[DecodedFeatures]
    assets
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          val mt = Codecs.sniffMediaType(a.payload).getOrElse(a.media_type)
          def fallback = DecodedFeatures(
            a.asset_id, mt, a.payload.length.toLong, contentHash(a.payload),
            decoded = false, a.width, a.height, a.duration_ms,
            decodeStub(a.payload, dim))
          mt match {
            case "image" =>
              Codecs.decodeImage(a.payload).map { img =>
                DecodedFeatures(
                  a.asset_id, mt, a.payload.length.toLong, contentHash(a.payload),
                  decoded = true, Some(img.getWidth), Some(img.getHeight),
                  a.duration_ms, Codecs.imageFeatures(img, dim))
              }.getOrElse(fallback)
            case "audio" =>
              Codecs.decodePcm(a.payload).map { pcm =>
                DecodedFeatures(
                  a.asset_id, mt, a.payload.length.toLong, contentHash(a.payload),
                  decoded = true, a.width, a.height, Some(pcm.durationMs),
                  Codecs.audioFeatures(pcm, dim))
              }.getOrElse(fallback)
            case _ => fallback
          }
        }
      }
  }

  /** One sampled video frame: generator output of [[sampleFrames]]. */
  final case class Frame(
      asset_id: Long,
      frame_idx: Int,
      ts_ms: Long,
      payload: Array[Byte])

  /** STUB resize kernel — a real implementation decodes the image,
    * scales, re-encodes. The fake derives a (w·h/64)-byte payload from
    * the source bytes so it stays content-sensitive and deterministic. */
  private[multimodal] def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    lcgBytes(contentHash(payload) ^ (w.toLong << 32) ^ h.toLong,
      math.max(1, w * h / 64))

  /** Image resize as a narrow per-row binary transform: payload replaced,
    * width/height metadata updated IN THE SAME ROW (metadata and bytes
    * can never drift apart); non-image rows pass through untouched. No
    * shuffle — this pipelines inside the enclosing stage.
    *
    * Payloads that decode as real images go through the REAL scaler
    * ([[Codecs.resizeImage]]: ImageIO decode → bilinear Graphics2D →
    * PNG re-encode); undecodable "image" payloads keep the deterministic
    * stub so corrupt files degrade, not fail. */
  def resize(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"resize dimensions must be positive and w*h must fit an Int, got ${w}x$h")
    implicit val enc = Encoders.product[Asset]
    assets.mapPartitions { it =>
      it.map { a =>
        if (a.media_type == "image") {
          val bytes = Codecs.resizeImage(a.payload, w, h)
            .getOrElse(resizeStub(a.payload, w, h))
          a.copy(payload = bytes, width = Some(w), height = Some(h))
        } else a
      }
    }
  }

  /** Video frame sampling — the one-to-many GENERATOR shape for binary
    * columns: each video row yields one Frame row per `everyMs` of
    * duration, streamed through an iterator flatMap so the demuxer
    * opens once per row and frames never all materialize at once.
    * Non-video rows yield nothing.
    *
    * REAL decode path: payloads the JDK can demux (animated GIF —
    * [[Codecs.decodeGifFrames]]) emit genuinely decoded frames: each
    * `everyMs` tick carries the PNG of the composed canvas showing at
    * that instant on the animation's own timeline, and the sampling
    * duration comes from the timeline itself when the metadata carries
    * none. MP4/MOV containers are REALLY demuxed ([[Codecs.parseMp4]]):
    * each tick emits the raw bytes of the latest sync sample at or
    * before it, with the container's own timestamps/duration — only
    * pixel decode of the codec bitstream stays out of reach (no JVM
    * H.26x decoder). Containers with no parsable sample tables fall
    * back to the deterministic STUB payload and need `duration_ms`
    * metadata — the documented residual stub.
    *
    * `maxFramesPerAsset` bounds the fan-out of one row: corrupt metadata
    * (a duration in the billions) must not turn a single asset into a
    * billion-row explosion or an Int overflow — assets at the cap emit
    * exactly `maxFramesPerAsset` frames (truncation is visible as
    * frame_idx reaching the cap, not silent emptiness). */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L,
                   maxFramesPerAsset: Int = 100000): Dataset[Frame] = {
    require(everyMs > 0, "everyMs must be positive")
    require(maxFramesPerAsset > 0, "maxFramesPerAsset must be positive")
    implicit val enc = Encoders.product[Frame]
    assets.mapPartitions { it =>
      it.flatMap { a =>
        if (a.media_type != "video") Iterator.empty
        else Codecs.decodeGifFrames(a.payload, maxFramesPerAsset) match {
          case Some(frames) if frames.nonEmpty =>
            val timeline = frames.last.tsMs + frames.last.delayMs
            val dur = a.duration_ms.filter(_ > 0).getOrElse(timeline)
            val n = math.min(dur / everyMs + 1, maxFramesPerAsset.toLong).toInt
            // tick timestamps are monotone, so the showing-frame cursor
            // only ever advances — O(nTicks + nFrames), and each canvas
            // encodes at most once (consecutive ticks reuse the PNG)
            var fi = 0
            var lastIdx = -1
            var lastPng: Array[Byte] = null
            Iterator.range(0, n).map { idx =>
              val ts = idx * everyMs
              while (fi < frames.length - 1 && frames(fi + 1).tsMs <= ts)
                fi += 1
              if (fi != lastIdx) {
                lastIdx = fi
                lastPng = Codecs.encodePng(frames(fi).image)
              }
              Frame(a.asset_id, idx, ts, lastPng)
            }
          case _ => Codecs.parseMp4(a.payload) match {
            // REAL MP4 demux (Codecs.parseMp4: the stbl sample tables):
            // each tick emits the bytes of the latest SYNC sample at or
            // before it — the standard keyframe-thumbnail sampling that
            // needs no pixel decode — with the container's own
            // timestamps and duration. The cursor is monotone like the
            // GIF path: O(nTicks + nSamples) per asset.
            case Some(v) if v.samples.nonEmpty =>
              val keys = v.samples.filter(_.keyframe)
              val sync = if (keys.nonEmpty) keys else v.samples
              val dur = a.duration_ms.filter(_ > 0).getOrElse(v.durationMs)
              val n = math.min(dur / everyMs + 1, maxFramesPerAsset.toLong).toInt
              var ki = 0
              var lastKi = -1
              var lastBytes: Array[Byte] = null
              Iterator.range(0, n).map { idx =>
                val ts = idx * everyMs
                while (ki < sync.length - 1 && sync(ki + 1).tsMs <= ts)
                  ki += 1
                if (ki != lastKi) {
                  lastKi = ki
                  val sm = sync(ki)
                  lastBytes = java.util.Arrays.copyOfRange(
                    a.payload, sm.offset.toInt, (sm.offset + sm.size).toInt)
                }
                Frame(a.asset_id, idx, ts, lastBytes)
              }
            case _ => a.duration_ms match {
              case Some(dur) if dur > 0 =>
                // residual STUB (containers with no parsable sample
                // tables): Long arithmetic first, THEN clamp —
                // (dur/everyMs).toInt on a huge duration would wrap
                // negative and silently emit nothing
                val n = math.min(dur / everyMs + 1, maxFramesPerAsset.toLong).toInt
                val base = contentHash(a.payload) // one payload scan per asset
                Iterator.range(0, n).map { idx =>
                  val ts = idx * everyMs
                  Frame(a.asset_id, idx, ts, lcgBytes(base ^ ts, 32))
                }
              case _ => Iterator.empty
            }
          }
        }
      }
    }
  }

  final case class AudioLevels(
      asset_id: Long,
      decoded: Boolean,
      n_samples: Long,
      peak_q15: Long,
      sum_sq: Long,
      rms_q15: Long,
      duration_ms: Option[Long])

  /** Floor square root with boundary correction — exact for m < 2⁵²
    * and written so an oracle engine computing
    * floor(sqrt(CAST(m AS DOUBLE))) + the SAME two-branch correction
    * lands on identical values (raw double sqrt can round across a
    * perfect-square boundary; the correction undoes exactly that). */
  private[multimodal] def isqrt(m: Long): Long = {
    val r = math.floor(math.sqrt(m.toDouble)).toLong
    if ((r + 1) * (r + 1) <= m) r + 1
    else if (r * r > m) r - 1
    else r
  }

  /** REAL audio level metering through the JDK codec ([[Codecs
    * .decodePcm]]): per-asset peak and RMS on the 16-bit (q15) integer
    * scale — the loudness/clipping screen an audio-corpus intake runs
    * (silent files, clipped takes, dead channels) before any model
    * sees a sample. Exact integer surface: samples reconstruct to
    * their q15 values losslessly (decode divides by 2¹⁵; round(s·2¹⁵)
    * inverts it), `sum_sq` is the exact Σv², and `rms_q15` is the
    * corrected integer sqrt of the truncated mean square — every
    * output replayable from a generative sample formula without
    * touching WAV bytes, which is what makes this a true end-to-end
    * codec gate.
    *
    * Scale posture: one `asset_id` repartition, then a per-row decode
    * + O(samples) loop inside mapPartitions — embarrassingly parallel,
    * payloads never shuffle twice, no driver state. Undecodable
    * payloads report decoded=false with zeroed levels (the quarantine
    * row, not an exception). */
  def audioLevels(assets: Dataset[Asset])
                 (implicit spark: SparkSession): Dataset[AudioLevels] = {
    implicit val enc: org.apache.spark.sql.Encoder[AudioLevels] =
      Encoders.product[AudioLevels]
    assets
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        it.map { a =>
          Codecs.decodePcm(a.payload) match {
            case Some(p) if p.samples.nonEmpty =>
              var i = 0
              var peak = 0L
              var ss = 0L
              while (i < p.samples.length) {
                val v = math.round(p.samples(i) * 32768.0f).toLong
                val av = math.abs(v)
                if (av > peak) peak = av
                ss += v * v
                i += 1
              }
              val n = p.samples.length.toLong
              AudioLevels(a.asset_id, decoded = true, n, peak, ss,
                isqrt(ss / n), Some(p.durationMs))
            case _ =>
              AudioLevels(a.asset_id, decoded = false, 0L, 0L, 0L, 0L,
                None)
          }
        }
      }
  }

  /** Exact payload dedup on the 64-bit content hash (binary columns never
    * shuffle whole payloads — only the hash + id move). */
  def dedupByContent(features: Dataset[AssetFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("content_hash"))
      .agg(min(col("asset_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Load on-disk media files as Asset rows through Spark's built-in
    * `binaryFile` source — the production ingestion path for multimodal
    * data: each file becomes one row (path, length, content) read
    * split-free by executors, so a directory tree of millions of images
    * fans out across the cluster with no driver involvement. Media type
    * is inferred from the extension; intrinsic metadata (width,
    * duration) stays unset until decode fills it. Asset ids are the
    * path hash — stable across reloads, independent of listing order.
    * `recursive` (default true) descends non-partition subdirectories —
    * media trees are rarely flat; pass false to read only `dir` itself. */
  def fromBinaryFiles(spark: SparkSession, dir: String,
                      glob: String = "*", recursive: Boolean = true): Dataset[Asset] = {
    implicit val enc = Encoders.product[Asset]
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    val mediaType = when(ext.isin("jpg", "jpeg", "png", "gif", "bmp", "webp"), "image")
      .when(ext.isin("wav", "mp3", "flac", "ogg", "m4a"), "audio")
      .when(ext.isin("mp4", "avi", "mkv", "webm", "mov"), "video")
      .otherwise("binary")
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        mediaType.as("media_type"),
        col("content").as("payload"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"))
      .as[Asset]
  }

  /** Deterministic synthetic asset table for tests/bench — payload bytes
    * derived from the id (same content ⇒ same features ⇒ dedup works). */
  def syntheticAssets(spark: SparkSession, n: Int, dupEvery: Int = 10): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n.toLong).map { i0 =>
      val i: Long = i0
      val src: Long = if (dupEvery > 0 && i % dupEvery == 0) 0L else i
      // LCG stream seeded by src: distinct ids get distinct payloads (a
      // modular formula here silently collides at its period — src and
      // src+251 would alias, planting duplicates the tests didn't ask for)
      val payload = lcgBytes(src * 1000003L + 17L, 64)
      val mt = if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video"
      // videos carry a duration so the frame-sampling generator has a
      // real fan-out to exercise
      val dur = if (mt == "video") Some(2000L + (i % 4) * 1000L) else None
      Asset(i, mt, payload, Some(64), Some(64), dur)
    }
  }
}
