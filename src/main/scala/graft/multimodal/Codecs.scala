package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

import scala.util.Try

/** Real, pure-JDK media codecs for the multimodal pipeline.
  *
  * The container has no native image/audio libraries, but the JDK itself
  * ships two: `javax.imageio` (PNG/JPEG/GIF/BMP/WBMP) and
  * `javax.sound.sampled` (WAV/AIFF/AU PCM). These cover the two most
  * common training-corpus media types for real; only video decode remains
  * genuinely stubbed (the JDK has no video demuxer).
  *
  * Every function here is partition-local, allocation-bounded, and total:
  * undecodable or truncated payloads return `None`, never throw — a 100 TB
  * crawl corpus always contains corrupt files, and one bad payload must
  * not kill a 4-hour stage (the caller routes `None` to the stub/quarantine
  * path instead). Decoders are stateless, so one instance serves a whole
  * `mapPartitions` iterator without per-row init cost.
  */
object Codecs {

  // ImageIO pulls in java.awt; without headless mode a worker without a
  // display server would die in static init of the toolkit.
  System.setProperty("java.awt.headless", "true")
  // Disk caching writes ImageIO temp files per decode — pure-memory
  // streams are both faster and safe on read-only executor sandboxes.
  ImageIO.setUseCache(false)

  /** Magic-byte media sniffing — extension-independent type detection
    * (crawled files lie about extensions constantly). Returns
    * "image" | "audio" | "video" | None for unknown. */
  def sniffMediaType(payload: Array[Byte]): Option[String] = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xff else -1
    def ascii(from: Int, s: String): Boolean =
      s.indices.forall(i => at(from + i) == s.charAt(i).toInt)
    if (at(0) == 0x89 && ascii(1, "PNG")) Some("image")                 // PNG
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) Some("image") // JPEG
    // an ANIMATED GIF is a video container the JDK can actually demux —
    // route it to the frame-sampling path. The discriminator is the
    // REAL one: more than one image descriptor in the file's block
    // structure (gifFrameCount walks blocks by their declared lengths,
    // never scanning pixel bytes — a NETSCAPE2.0 substring match would
    // false-positive on LZW data in small stills and miss animations
    // whose loop block sits past any fixed scan cap).
    else if (ascii(0, "GIF8"))
      Some(if (gifFrameCount(payload, maxFrames = 2) >= 2) "video" else "image")
    else if (ascii(0, "BM")) Some("image")                              // BMP
    else if (ascii(0, "RIFF") && ascii(8, "WAVE")) Some("audio")        // WAV
    else if (ascii(0, ".snd")) Some("audio")                            // AU
    else if (ascii(4, "ftyp")) Some("video")                            // MP4 family
    else if (at(0) == 0x1a && at(1) == 0x45 && at(2) == 0xdf && at(3) == 0xa3)
      Some("video")                                                     // Matroska/WebM
    else None
  }

  /** Count image descriptors in a GIF by walking its block structure —
    * header, logical screen descriptor (+ global color table), then a
    * sequence of extension blocks (0x21: label + length-prefixed
    * sub-blocks), image descriptors (0x2C: 9-byte descriptor + optional
    * local color table + LZW code size + length-prefixed data
    * sub-blocks), and the 0x3B trailer. Every hop is a declared length,
    * so the walk SEEKS through pixel data without reading it — O(#blocks)
    * byte probes, and it stops as soon as `maxFrames` descriptors are
    * seen (an animation is recognized at its second frame header, not
    * after walking the whole file). Truncated or corrupt structure stops
    * the walk and classifies on the frames seen so far — sniffing must
    * be total on crawl garbage. */
  private[multimodal] def gifFrameCount(payload: Array[Byte],
                                        maxFrames: Int = 2): Int = {
    val n = payload.length
    def u8(i: Int): Int = payload(i) & 0xff
    if (n < 13) return 0
    var pos = 6 // past "GIF87a"/"GIF89a"
    val packed = u8(pos + 4)
    pos += 7 // logical screen descriptor
    if ((packed & 0x80) != 0) pos += 3 * (1 << ((packed & 7) + 1))
    var frames = 0
    // length-prefixed sub-blocks, 0x00-terminated; false = truncated
    def skipSubBlocks(): Boolean = {
      while (pos < n && u8(pos) != 0) pos += 1 + u8(pos)
      if (pos < n) { pos += 1; true } else false
    }
    while (pos < n && frames < maxFrames) {
      u8(pos) match {
        case 0x3b => return frames // trailer
        case 0x21 => // extension: introducer + label, then sub-blocks
          pos += 2
          if (!skipSubBlocks()) return frames
        case 0x2c => // image descriptor — one frame
          frames += 1
          if (frames >= maxFrames || pos + 10 > n) return frames
          val p = u8(pos + 9)
          pos += 10
          if ((p & 0x80) != 0) pos += 3 * (1 << ((p & 7) + 1))
          pos += 1 // LZW minimum code size
          if (!skipSubBlocks()) return frames
        case _ => return frames // corrupt: classify on what was seen
      }
    }
    frames
  }


  // ------------------------------------------------------------------
  // Images (javax.imageio)
  // ------------------------------------------------------------------

  /** Decode an image payload. None ⇔ the bytes are not a decodable
    * image in any registered ImageIO format. */
  def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    Try(Option(ImageIO.read(new ByteArrayInputStream(payload)))).toOption.flatten

  /** Fixed-dim feature vector from a decoded image: a normalized
    * luminance histogram with `dim` bins (sums to 1 for any non-empty
    * image). Histogram features are resolution-independent, so the same
    * image at two sizes lands near the same point — exactly what the
    * downstream dedup/ANN operators want from a cheap visual signature. */
  def imageFeatures(img: BufferedImage, dim: Int): Array[Float] = {
    require(dim > 0, "feature dim must be positive")
    val w = img.getWidth; val h = img.getHeight
    val counts = new Array[Long](dim)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        // integer Rec.601 luma in [0, 255]
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        counts(math.min(dim - 1, lum * dim / 256)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) { out(i) = if (n == 0) 0f else counts(i).toFloat / n; i += 1 }
    out
  }

  /** Real resize: decode, high-quality bilinear scale, re-encode as PNG
    * (lossless, universally decodable — re-encoding as JPEG would stack
    * generation loss on every pipeline pass). None ⇔ payload didn't
    * decode as an image. */
  def resizeImage(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, "resize dimensions must be positive")
    decodeImage(payload).flatMap { src =>
      Try {
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
            RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        encodePng(dst)
      }.toOption
    }
  }

  /** Encode a BufferedImage as PNG bytes (also used by tests to build
    * real fixtures without any filesystem round-trip). */
  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Video (animated GIF — the one animated container the JDK demuxes)
  // ------------------------------------------------------------------

  /** One decoded, fully-COMPOSED video frame: `tsMs` its start on the
    * animation timeline, `delayMs` how long it shows, `image` the whole
    * canvas (GIF frames are patches over the previous state — raw
    * sub-images are not what a feature extractor wants). */
  final case class VideoFrame(tsMs: Long, delayMs: Long, image: BufferedImage)

  /** Demux + compose an animated GIF into canvas frames with
    * timestamps. The composition loop handles the two disposal modes
    * real encoders emit (`none`/`doNotDispose` accumulate,
    * `restoreToBackgroundColor` clears the patch region); zero frame
    * delays render as the conventional 10 ms minimum. None ⇔ the
    * payload is not a decodable GIF — the caller's cue to fall back to
    * the stub (MP4/MKV land here: the JDK has no demuxer for them). */
  def decodeGifFrames(payload: Array[Byte],
                      maxFrames: Int = 100000): Option[Vector[VideoFrame]] = {
    val isGif = payload.length > 6 && payload(0) == 'G' &&
      payload(1) == 'I' && payload(2) == 'F'
    if (!isGif) None
    else Try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      try {
        val readers = ImageIO.getImageReaders(iis)
        require(readers.hasNext, "no GIF reader registered")
        val reader = readers.next()
        reader.setInput(iis, false, false)
        try {
        // logical screen = the composition canvas
        val (cw, ch) = {
          val st = reader.getStreamMetadata
          val tree = st.getAsTree("javax_imageio_gif_stream_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          val lsd = tree.getElementsByTagName("LogicalScreenDescriptor")
          if (lsd.getLength > 0) {
            val e = lsd.item(0).asInstanceOf[org.w3c.dom.Element]
            (e.getAttribute("logicalScreenWidth").toInt,
              e.getAttribute("logicalScreenHeight").toInt)
          } else (reader.getWidth(0), reader.getHeight(0))
        }
        // corrupt-input guards BEFORE any allocation: the logical
        // screen is two unvalidated header bytes each way, and the
        // composed frames all materialize (a Vector of full canvases)
        // — a 65535x65535 declaration or a deep frame stack on a big
        // canvas must degrade to the stub, never OOM the executor.
        // Budget: canvas <= 2^24 px (~64 MB ARGB int raster) and
        // total retained pixels across frames <= 2^28 (~1 GB of
        // canvases) — crawl-corpus GIFs sit orders of magnitude below.
        require(cw > 0 && ch > 0 && cw.toLong * ch <= (1L << 24),
          s"GIF canvas ${cw}x$ch exceeds the composition budget")
        val n0 = math.min(reader.getNumImages(true), maxFrames)
        val n = math.min(n0.toLong,
          (1L << 28) / math.max(1L, cw.toLong * ch)).toInt
        require(n >= 1, "GIF frame budget exhausted before the first frame")
        val canvas = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
        var ts = 0L
        val out = Vector.newBuilder[VideoFrame]
        var i = 0
        while (i < n) {
          val patch = reader.read(i)
          val tree = reader.getImageMetadata(i)
            .getAsTree("javax_imageio_gif_image_1.0")
            .asInstanceOf[org.w3c.dom.Element]
          def attr(tag: String, name: String): Option[String] = {
            val nodes = tree.getElementsByTagName(tag)
            if (nodes.getLength > 0)
              Some(nodes.item(0).asInstanceOf[org.w3c.dom.Element]
                .getAttribute(name))
            else None
          }
          val delayMs = math.max(1L,
            attr("GraphicControlExtension", "delayTime")
              .flatMap(s => Try(s.toLong).toOption).getOrElse(0L)) * 10L
          val x = attr("ImageDescriptor", "imageLeftPosition")
            .flatMap(s => Try(s.toInt).toOption).getOrElse(0)
          val y = attr("ImageDescriptor", "imageTopPosition")
            .flatMap(s => Try(s.toInt).toOption).getOrElse(0)
          val g = canvas.createGraphics()
          try g.drawImage(patch, x, y, null) finally g.dispose()
          val snap = new BufferedImage(cw, ch, BufferedImage.TYPE_INT_RGB)
          val g2 = snap.createGraphics()
          try g2.drawImage(canvas, 0, 0, null) finally g2.dispose()
          out += VideoFrame(ts, delayMs, snap)
          ts += delayMs
          if (attr("GraphicControlExtension", "disposalMethod")
              .contains("restoreToBackgroundColor")) {
            val gc = canvas.createGraphics()
            try {
              gc.setColor(java.awt.Color.BLACK)
              gc.fillRect(x, y, patch.getWidth, patch.getHeight)
            } finally gc.dispose()
          }
          i += 1
        }
        out.result()
        } finally reader.dispose()
      } finally iis.close()
    }.toOption
  }

  /** Encode frames as an animated GIF (test-fixture generator, and the
    * proof the sandbox really round-trips an animated container): one
    * shared `delayCs` (centiseconds — GIF's native unit) per frame plus
    * the NETSCAPE2.0 loop extension, which is also what
    * [[sniffMediaType]] keys on to call the payload a video. */
  def encodeAnimatedGif(frames: Seq[BufferedImage], delayCs: Int): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(delayCs >= 1, "delayCs must be >= 1")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    val typeSpec = javax.imageio.ImageTypeSpecifier
      .createFromBufferedImageType(BufferedImage.TYPE_INT_RGB)
    writer.prepareWriteSequence(null)
    frames.foreach { f =>
      val meta = writer.getDefaultImageMetadata(typeSpec,
        writer.getDefaultWriteParam)
      val fmt = meta.getNativeMetadataFormatName
      val root = new javax.imageio.metadata.IIOMetadataNode(fmt)
      val gce = new javax.imageio.metadata.IIOMetadataNode(
        "GraphicControlExtension")
      gce.setAttribute("disposalMethod", "none")
      gce.setAttribute("userInputFlag", "FALSE")
      gce.setAttribute("transparentColorFlag", "FALSE")
      gce.setAttribute("delayTime", delayCs.toString)
      gce.setAttribute("transparentColorIndex", "0")
      root.appendChild(gce)
      val apps = new javax.imageio.metadata.IIOMetadataNode(
        "ApplicationExtensions")
      val app = new javax.imageio.metadata.IIOMetadataNode(
        "ApplicationExtension")
      app.setAttribute("applicationID", "NETSCAPE")
      app.setAttribute("authenticationCode", "2.0")
      app.setUserObject(Array[Byte](1, 0, 0)) // loop forever
      apps.appendChild(app)
      root.appendChild(apps)
      meta.mergeTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, meta),
        writer.getDefaultWriteParam)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  // ------------------------------------------------------------------
  // Audio (javax.sound.sampled — WAV/AIFF/AU PCM)
  // ------------------------------------------------------------------

  /** Decoded PCM audio: mono-mixed samples normalized to [-1, 1]. */
  final case class PcmAudio(samples: Array[Float], sampleRate: Float) {
    def durationMs: Long =
      if (sampleRate <= 0) 0L else (samples.length * 1000.0 / sampleRate).toLong
  }

  /** Decode a WAV/AIFF/AU payload to normalized mono PCM. None ⇔ not a
    * decodable PCM audio stream. Frames are mixed down to mono by
    * channel-averaging; 8/16/24/32-bit signed and 8-bit unsigned PCM
    * are handled. */
  def decodePcm(payload: Array[Byte]): Option[PcmAudio] =
    Try {
      val in: AudioInputStream =
        AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        val enc = fmt.getEncoding
        val ok = enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED
        if (!ok || in.getFrameLength > Int.MaxValue / 4) None
        else {
          val frameSize = fmt.getFrameSize
          val bytes = in.readAllBytes()
          // trust the bytes actually read over the declared frame count —
          // truncated payloads must decode their valid prefix, not throw
          val frames = (bytes.length / frameSize).toInt
          val channels = fmt.getChannels
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val big = fmt.isBigEndian
          val unsigned = enc == AudioFormat.Encoding.PCM_UNSIGNED
          val full = (1L << (fmt.getSampleSizeInBits - 1)).toFloat
          val out = new Array[Float](frames)
          var f = 0
          while (f < frames) {
            var acc = 0.0f
            var c = 0
            while (c < channels) {
              val off = f * frameSize + c * bytesPerSample
              var v = 0L
              var b = 0
              while (b < bytesPerSample) {
                val idx = off + (if (big) b else bytesPerSample - 1 - b)
                v = (v << 8) | (bytes(idx) & 0xffL)
                b += 1
              }
              // sign-extend / recenter
              val signed =
                if (unsigned) v - full.toLong
                else {
                  val shift = 64 - fmt.getSampleSizeInBits
                  (v << shift) >> shift
                }
              acc += signed / full
              c += 1
            }
            out(f) = acc / channels
            f += 1
          }
          Some(PcmAudio(out, fmt.getSampleRate))
        }
      } finally in.close()
    }.toOption.flatten

  /** Fixed-dim feature vector from PCM audio: `dim` windows of
    * short-time RMS energy over the sample stream — the classic cheap
    * audio envelope, length-independent like the image histogram. */
  def audioFeatures(pcm: PcmAudio, dim: Int): Array[Float] = {
    require(dim > 0, "feature dim must be positive")
    val n = pcm.samples.length
    val out = new Array[Float](dim)
    if (n == 0) return out
    var w = 0
    while (w < dim) {
      val from = (w.toLong * n / dim).toInt
      val until = math.max(from + 1, ((w + 1).toLong * n / dim).toInt)
      var acc = 0.0
      var i = from
      while (i < until && i < n) { acc += pcm.samples(i).toDouble * pcm.samples(i); i += 1 }
      val cnt = math.max(1, math.min(until, n) - from)
      out(w) = math.sqrt(acc / cnt).toFloat
      w += 1
    }
    out
  }

  /** Deterministic solid-color PNG fixture: a real PNG byte stream
    * through the real encoder. Solid fill makes every decoded property
    * (dimensions, single-bin luminance histogram, post-resize pixels)
    * predictable by plain arithmetic — which is what lets the q57 gate
    * probe cross-check a REAL codec roundtrip against DuckDB. */
  def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic sine WAV fixture through the real encoder: constant
    * amplitude ⇒ every short-time RMS window ≈ amp/√2 by arithmetic. */
  def sineWav(n: Int, rate: Float, amp: Float, freq: Float): Array[Byte] = {
    val s = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / rate)).toFloat)
    encodeWav(s, rate)
  }

  /** Build a PCM_SIGNED 16-bit mono WAV payload from float samples in
    * [-1, 1] (test-fixture generator — real corpora arrive as bytes). */
  def encodeWav(samples: Array[Float], sampleRate: Float): Array[Byte] =
    encodeWav16(samples.map(s => math.max(-32768,
      math.min(32767, math.round(s * 32767.0f))).toShort), sampleRate)

  /** Build a PCM_SIGNED 16-bit mono WAV payload DIRECTLY from 16-bit
    * samples — the bit-exact fixture path: what goes in is exactly what
    * [[decodePcm]] recovers (÷2¹⁵ on decode is lossless for shorts), so
    * integer-level audio gates can replay the generative formula. */
  def encodeWav16(samples: Array[Short], sampleRate: Float): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate, 16, 1, 2,
      sampleRate, false)
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val v = samples(i)
      bytes(2 * i) = (v & 0xff).toByte
      bytes(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // ------------------------------------------------------------- MP4 demux

  /** One demuxed MP4 video sample: decode timestamp on the track's own
    * timeline, byte extent within the container, sync-sample flag. */
  final case class Mp4Sample(idx: Int, tsMs: Long, offset: Long,
                             size: Long, keyframe: Boolean)

  /** Demuxed MP4 video track: presentation metadata + the full sample
    * map. `samples` carries REAL byte offsets/sizes/timestamps out of
    * the container's `stbl` tables — everything a frame sampler needs
    * short of pixel decode (which needs a codec the JVM lacks). */
  final case class Mp4Video(width: Int, height: Int, timescale: Long,
                            durationMs: Long, codec: String,
                            samples: Vector[Mp4Sample])

  /** ISO BMFF (MP4/MOV) box-tree demuxer, pure JVM from the PUBLIC spec
    * (ISO/IEC 14496-12): walks `moov → trak(vide) → mdia → minf → stbl`
    * and cross-joins the five sample tables —
    *   `stts` (decode deltas) × `stsz` (sizes) × `stsc` (sample→chunk)
    *   × `stco`/`co64` (chunk offsets) × `stss` (sync samples)
    * — into one per-sample map. This closes the "video container is
    * opaque" gap REALLY (timestamps, keyframe structure, byte extents
    * all genuine); only pixel decode of the codec bitstream remains
    * stubbed, the JDK ships no H.26x/VPx decoder.
    *
    * Total like every codec here: truncated boxes, absent tables, or
    * sample extents outside the payload return None — one corrupt
    * container in a 100 TB crawl must quarantine, not kill the stage. */
  def parseMp4(payload: Array[Byte]): Option[Mp4Video] = Try {
    val buf = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def u32(at: Int): Long = buf.getInt(at) & 0xffffffffL
    def u16(at: Int): Int = buf.getShort(at) & 0xffff
    def fourcc(at: Int): String =
      new String(payload, at, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Child boxes of [from, to): (type, payloadFrom, payloadTo). */
    def children(from: Int, to: Int): Vector[(String, Int, Int)] = {
      val out = Vector.newBuilder[(String, Int, Int)]
      var p = from
      while (p + 8 <= to) {
        val size0 = u32(p)
        val tpe = fourcc(p + 4)
        val (bodyFrom, size) =
          if (size0 == 1L) (p + 16, buf.getLong(p + 8)) // 64-bit largesize
          else if (size0 == 0L) (p + 8, (to - p).toLong) // extends to end
          else (p + 8, size0)
        val end = p + size
        if (size < 8 || end > to) return out.result() // torn tail: stop
        out += ((tpe, bodyFrom, end.toInt))
        p = end.toInt
      }
      out.result()
    }
    def child(boxes: Vector[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
      boxes.find(_._1 == tpe).map(b => (b._2, b._3))

    val top = children(0, payload.length)
    require(top.exists(t => t._1 == "ftyp" || t._1 == "moov"), "not ISO BMFF")
    val (moovF, moovT) = child(top, "moov").getOrElse(sys.error("no moov"))
    val moov = children(moovF, moovT)

    // the first video track (hdlr handler_type == 'vide')
    val trak = moov.filter(_._1 == "trak").flatMap { case (_, f, t) =>
      val tk = children(f, t)
      for {
        (mdF, mdT) <- child(tk, "mdia")
        md = children(mdF, mdT)
        (hdF, _) <- child(md, "hdlr")
        if fourcc(hdF + 8) == "vide"
      } yield (tk, md)
    }.headOption.getOrElse(sys.error("no video track"))
    val (tk, md) = trak

    // tkhd: width/height as 16.16 fixed point at a version-dependent offset
    val (tkF, _) = child(tk, "tkhd").getOrElse(sys.error("no tkhd"))
    val tkVer = payload(tkF) & 0xff
    // ver/flags(4) + ctime/mtime/duration(12 or 24) + ids/reserved(12) +
    // layer/group/volume/reserved(8) + matrix(36)
    val dimAt = tkF + (if (tkVer == 1) 88 else 76)
    val width = (u32(dimAt) >> 16).toInt
    val height = (u32(dimAt + 4) >> 16).toInt

    // mdhd: the track's OWN timescale (authoritative for sample times)
    val (mhF, _) = child(md, "mdhd").getOrElse(sys.error("no mdhd"))
    val mhVer = payload(mhF) & 0xff
    val (timescale, durationUnits) =
      if (mhVer == 1) (u32(mhF + 20), buf.getLong(mhF + 24))
      else (u32(mhF + 12), u32(mhF + 16))
    require(timescale > 0, "mdhd timescale 0")

    val (mfF, mfT) = child(md, "minf").getOrElse(sys.error("no minf"))
    val (sbF, sbT) = child(children(mfF, mfT), "stbl").getOrElse(sys.error("no stbl"))
    val stbl = children(sbF, sbT)

    // stsd body: ver/flags(4) + entry_count(4) + first entry's size(4)
    // then its fourcc
    val codec = child(stbl, "stsd").map { case (f, _) => fourcc(f + 12) }
      .getOrElse("????")

    // stts: (count, delta) runs → cumulative decode time per sample
    val (ttF, _) = child(stbl, "stts").getOrElse(sys.error("no stts"))
    val nRuns = u32(ttF + 4).toInt
    val tsUnits = Vector.newBuilder[Long]
    var t = 0L
    var r = 0
    while (r < nRuns) {
      val cnt = u32(ttF + 8 + r * 8).toInt
      val delta = u32(ttF + 12 + r * 8)
      var k = 0
      while (k < cnt) { tsUnits += t; t += delta; k += 1 }
      r += 1
    }
    val times = tsUnits.result()
    val n = times.length
    require(n > 0, "empty stts")

    // stsz: uniform size or per-sample table
    val (szF, _) = child(stbl, "stsz").getOrElse(sys.error("no stsz"))
    val uniform = u32(szF + 4)
    val nSz = u32(szF + 8).toInt
    require(nSz == n, s"stsz count $nSz != stts count $n")
    val sizes: Int => Long =
      if (uniform != 0) _ => uniform else i => u32(szF + 12 + i * 4)

    // stco/co64 chunk offsets
    val chunkOffsets: IndexedSeq[Long] = child(stbl, "stco") match {
      case Some((cF, _)) =>
        val c = u32(cF + 4).toInt
        (0 until c).map(i => u32(cF + 8 + i * 4))
      case None =>
        val (cF, _) = child(stbl, "co64").getOrElse(sys.error("no stco/co64"))
        val c = u32(cF + 4).toInt
        (0 until c).map(i => buf.getLong(cF + 8 + i * 8))
    }

    // stsc runs expanded against the chunk count → per-sample chunk id
    val (scF, _) = child(stbl, "stsc").getOrElse(sys.error("no stsc"))
    val nSc = u32(scF + 4).toInt
    val runs = (0 until nSc).map { i =>
      (u32(scF + 8 + i * 12).toInt, u32(scF + 12 + i * 12).toInt)
    } // (firstChunk 1-based, samplesPerChunk)
    val offsets = new Array[Long](n)
    var si = 0
    var ci = 0
    while (ci < chunkOffsets.length && si < n) {
      val ri = runs.lastIndexWhere(_._1 <= ci + 1)
      val perChunk = if (ri >= 0) runs(ri)._2 else 1
      var off = chunkOffsets(ci)
      var k = 0
      while (k < perChunk && si < n) {
        offsets(si) = off
        off += sizes(si)
        si += 1; k += 1
      }
      ci += 1
    }
    require(si == n, s"chunk map covers $si of $n samples")

    // stss: sync (key) samples, 1-based; absent → every sample is sync
    val keyframes: Int => Boolean = child(stbl, "stss") match {
      case Some((ssF, _)) =>
        val c = u32(ssF + 4).toInt
        val set = (0 until c).map(i => u32(ssF + 8 + i * 4).toInt).toSet
        i => set.contains(i + 1)
      case None => _ => true
    }

    val samples = Vector.tabulate(n) { i =>
      val sz = sizes(i)
      require(offsets(i) >= 0 && offsets(i) + sz <= payload.length,
        s"sample $i extent [${offsets(i)}, ${offsets(i) + sz}) outside payload")
      Mp4Sample(i, times(i) * 1000L / timescale, offsets(i), sz, keyframes(i))
    }
    val durMs =
      if (durationUnits > 0) durationUnits * 1000L / timescale
      else if (n > 0) samples.last.tsMs + (t - times.last) * 1000L / timescale
      else 0L
    Mp4Video(width, height, timescale, durMs, codec, samples)
  }.toOption

  /** Minimal spec-conformant MP4 muxer for fixtures and tests: one video
    * track, `timescale` 1000, each frame its own chunk, sync samples
    * every `keyEvery` frames. Frame payloads are arbitrary bytes (the
    * demux layer under test never decodes pixels). Layout is
    * `ftyp | mdat | moov` with absolute `stco` offsets into mdat. */
  def encodeMp4(frames: Seq[Array[Byte]], frameDurMs: Long,
                w: Int, h: Int, keyEvery: Int = 1,
                writeStss: Boolean = true): Array[Byte] = {
    require(frames.nonEmpty && frameDurMs > 0 && keyEvery > 0)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def ascii(s: String): Array[Byte] =
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    def box(tpe: String, body: Array[Byte]*): Array[Byte] = {
      val len = 8 + body.map(_.length).sum
      (be32(len) ++ ascii(tpe) ++ body.flatten).toArray
    }
    val n = frames.length
    val durMs = n * frameDurMs

    val ftyp = box("ftyp", ascii("isom"), be32(0x200), ascii("isom"), ascii("iso2"))
    val mdatBody = frames.flatten.toArray
    val mdat = box("mdat", mdatBody)
    // absolute sample offsets: ftyp + mdat header precede the payloads
    val base = ftyp.length + 8
    val offs = frames.scanLeft(base.toLong)(_ + _.length).init

    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(durMs),
      be32(0x00010000), be16(0x0100), be16(0), be32(0), be32(0),
      // identity matrix
      be32(0x00010000), be32(0), be32(0), be32(0), be32(0x00010000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      Array.fill(24)(0.toByte), be32(2))
    val tkhd = box("tkhd", be32(3 /* ver 0, flags: enabled|in-movie */),
      be32(0), be32(0), be32(1), be32(0), be32(durMs), be32(0), be32(0),
      be16(0), be16(0), be16(0), be16(0),
      be32(0x00010000), be32(0), be32(0), be32(0), be32(0x00010000), be32(0),
      be32(0), be32(0), be32(0x40000000),
      be32(w.toLong << 16), be32(h.toLong << 16))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(1000), be32(durMs),
      be16(0x55c4 /* 'und' */), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), ascii("vide"),
      be32(0), be32(0), be32(0), ascii("GraftVideo"), Array(0.toByte))
    val vmhd = box("vmhd", be32(1), be16(0), be16(0), be16(0), be16(0))
    val dref = box("dref", be32(0), be32(1), box("url ", be32(1)))
    val dinf = box("dinf", dref)
    // VisualSampleEntry 'mp4v' (no codec config — demux-only fixture)
    val sampleEntry = box("mp4v",
      Array.fill(6)(0.toByte), be16(1), // reserved + data_reference_index
      be16(0), be16(0), be32(0), be32(0), be32(0), // predefined/reserved
      be16(w), be16(h), be32(0x00480000), be32(0x00480000), // dims + 72 dpi
      be32(0), be16(1), // reserved + frame_count
      Array.fill(32)(0.toByte), // compressorname
      be16(24), be16(0xffff)) // depth, pre_defined -1
    val stsd = box("stsd", be32(0), be32(1), sampleEntry)
    val stts = box("stts", be32(0), be32(1), be32(n), be32(frameDurMs))
    val keyIds = (1 to n).filter(s => (s - 1) % keyEvery == 0)
    val stss = box("stss", be32(0), be32(keyIds.length),
      keyIds.flatMap(be32(_)).toArray)
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(n),
      frames.flatMap(fr => be32(fr.length)).toArray)
    val stco = box("stco", be32(0), be32(n), offs.flatMap(be32).toArray)
    val stbl =
      if (writeStss) box("stbl", stsd, stts, stss, stsc, stsz, stco)
      else box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    (ftyp ++ mdat ++ moov).toArray
  }
}
