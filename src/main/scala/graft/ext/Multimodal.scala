package graft.ext

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §7.4): media as opaque `binary`
  * columns with typed metadata, processed by partition-batched kernels.
  *
  * The image path is REAL: `syntheticMedia` emits genuine PNG files for
  * image rows (encoded with `javax.imageio`, deterministic pixels derived
  * from the seed), and [[MediaKernels.decode]] decodes any PNG/BMP/GIF
  * payload back to pixels and computes the 8-dim feature vector from the
  * decoded raster (channel means, luma moments/extrema, bright-pixel
  * fraction). Width/height in the output are the DECODED dimensions, not
  * the metadata's claim.
  *
  * The audio path is REAL too: `syntheticMedia` emits genuine RIFF/WAVE
  * files for audio rows (16-bit mono PCM, deterministic sine derived from
  * the seed), and [[MediaKernels.decode]] decodes any WAV payload via
  * `javax.sound.sampled` (pure JVM) and computes the 8-dim feature vector
  * from the decoded samples (DC mean, RMS, min/max, zero-crossing rate,
  * mean |x|, loud fraction, duration). `n_frames` in audio output is the
  * DECODED sample count, not the metadata's claim.
  *
  * The video path is REAL as well: `syntheticMedia` emits genuine
  * animated GIFs (multi-frame, via the JDK imageio GIF writer), and
  * [[MediaKernels.decode]] reads every frame back and computes spatial +
  * temporal features (per-frame mean-luma variation and activity). No
  * codec remains stubbed; undecodable/unknown payloads fall back to
  * payload-byte statistics so the pipeline stays total. A production
  * swap to e.g. MP4 means replacing only the GIF branch of
  * [[MediaKernels.decode]]; every plan stays identical.
  *
  */
object Multimodal {

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true))), nullable = true)))

  /** splitmix64 — deterministic pixel stream independent of JVM hashing. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Encode a real PNG whose pixels derive deterministically from `seed`.
    * Runs on executors (one small image per row); ImageIO's PNG writer is
    * pure-JVM and headless-safe. */
  private[graft] def makePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = mix64(seed ^ (x.toLong << 32) ^ y.toLong)
        img.setRGB(x, y, (m & 0xFFFFFFL).toInt)
        x += 1
      }
      y += 1
    }
    pngBytesOf(img)
  }

  /** PNG-encode an existing raster. Explicit memory-cache stream:
    * ImageIO's default wraps a FILE-cache temp file per image, which
    * dominates small-image encode time. */
  private[graft] def pngBytesOf(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    val writer = pngSpi.createWriterInstance()
    try {
      writer.setOutput(ios)
      writer.write(img)
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private val pngUdf = udf((seed: Long, w: Int, h: Int) => makePng(seed, w, h))

  /** Closed-form gradient PNG: pixel (x,y) of image `id` has channels
    * R = (7x + 3y + id) mod 256, G = (5x + 13·id) mod 256,
    * B = (11y + 7·id) mod 256 — small-integer arithmetic a SQL oracle can
    * regenerate exactly, encoded through the same PNG writer as every
    * other synthetic image. PNG is lossless, so the production decode
    * recovers these exact channels: the whole decode → luma → embedding →
    * ANN pipeline becomes replayable cross-engine. */
  private[graft] def makeGradientPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((7 * x + 3 * y + id) % 256).toInt
        val g = ((5 * x + 13 * id) % 256).toInt
        val b = ((11 * y + 7 * id) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    pngBytesOf(img)
  }

  /** A media frame ([[MediaSchema]] shape) of [[makeGradientPng]] images,
    * one per id row — the replayable-twin input for the multimodal
    * pipeline oracle. */
  def gradientMedia(ids: DataFrame, idCol: String, w: Int, h: Int): DataFrame = {
    val u = udf((id: Long) => makeGradientPng(id, w, h))
    ids.select(col(idCol).cast("long").as("media_id"))
      .withColumn("media", u(col("media_id")))
      .withColumn("meta", struct(
        lit("img").as("format"), lit(w).as("width"),
        lit(h).as("height"), lit(1).as("n_frames")))
  }

  /** Writer SPIs cached once per JVM — `getImageWritersByFormatName`
    * scans the IIORegistry, which is measurable when called per row. An
    * ImageWriter itself is not thread-safe, so each call still creates a
    * fresh instance from the cached provider. */
  private lazy val pngSpi = {
    val w = ImageIO.getImageWritersByFormatName("png").next()
    val spi = w.getOriginatingProvider; w.dispose(); spi
  }
  private lazy val gifSpi = {
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    val spi = w.getOriginatingProvider; w.dispose(); spi
  }

  /** Deterministic 8·8·4-level RGB palette for generated video frames:
    * pre-indexed frames skip the GIF writer's per-frame color
    * quantization, the dominant cost of encoding noisy RGB frames. */
  private lazy val gifPalette: java.awt.image.IndexColorModel = {
    val r = new Array[Byte](256); val g = new Array[Byte](256); val b = new Array[Byte](256)
    var i = 0
    while (i < 256) {
      r(i) = (((i >> 5) & 7) * 255 / 7).toByte
      g(i) = (((i >> 2) & 7) * 255 / 7).toByte
      b(i) = ((i & 3) * 255 / 3).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, 256, r, g, b)
  }

  /** Serialize 16-bit mono PCM samples as a RIFF/WAVE file (the 44-byte
    * canonical header; little-endian throughout, as WAV requires). */
  private[graft] def wavBytes(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
    buf.array()
  }

  /** A real WAV whose samples derive deterministically from `seed`: a
    * seed-pitched sine (freq 100–999 Hz, amplitude 0.30–0.69) at 8 kHz. */
  private[graft] def makeWav(seed: Long, nSamples: Int): Array[Byte] = {
    val rate = 8000
    val freq = 100 + java.lang.Long.remainderUnsigned(mix64(seed), 900L).toInt
    val amp = 0.30 + java.lang.Long.remainderUnsigned(mix64(seed + 1), 40L) / 100.0
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      val v = amp * math.sin(2.0 * math.Pi * freq * i / rate)
      samples(i) = math.round(v * 32767.0).toShort
      i += 1
    }
    wavBytes(samples, rate)
  }

  private val wavUdf = udf((seed: Long, n: Int) => makeWav(seed, n))

  /** Serialize frames as an animated GIF via the JDK's imageio GIF writer
    * (`writeToSequence`); all frames full-size, default per-frame
    * metadata. GIF quantizes to a 256-color palette, so pixel statistics
    * downstream are of the DECODED palettized frames — exactly what a
    * real pipeline sees. */
  private[graft] def gifBytes(frames: Array[BufferedImage]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos) // not ImageIO's file cache
    val writer = gifSpi.createWriterInstance()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** A real animated GIF whose frame pixels derive deterministically from
    * `seed` (frame index mixed into the hash). */
  private[graft] def makeGif(seed: Long, w: Int, h: Int, nFrames: Int): Array[Byte] = {
    val frames = Array.tabulate(nFrames) { fidx =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, gifPalette)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val m = mix64(seed ^ (fidx.toLong << 48) ^ (x.toLong << 24) ^ y.toLong)
          raster.setSample(x, y, 0, (m & 0xFFL).toInt)
          x += 1
        }
        y += 1
      }
      img
    }
    gifBytes(frames)
  }

  private val gifUdf = udf((seed: Long, w: Int, h: Int, nf: Int) => makeGif(seed, w, h, nf))

  /** Deterministic synthetic media column from any table (for tests and
    * the rows-only driver query): ALL THREE modalities carry REAL files —
    * image rows PNG, audio rows RIFF/WAVE PCM, video rows animated GIF —
    * each decoded for real downstream. Dimensions are kept small
    * (images ≤127×97, audio ≤2047 samples, video ≤31×25×11 frames) so
    * corpus-wide generation stays cheap; video metadata carries the
    * actual GIF dimensions. */
  def syntheticMedia(df: DataFrame, idCol: String, seedCol: String): DataFrame = {
    val h = xxhash64(col(seedCol))
    val fmt = pmod(h, lit(3)).cast("int")
    val w = (pmod(h, lit(120)) + 8).cast("int")
    val ht = (pmod(h, lit(90)) + 8).cast("int")
    val nSamp = (pmod(h, lit(1536)) + 512).cast("int")
    val vw = (pmod(h, lit(24)) + 8).cast("int")
    val vh = (pmod(h, lit(18)) + 8).cast("int")
    val vf = (pmod(h, lit(6)) + 2).cast("int")
    val isVideo = fmt === 2
    df.select(
      col(idCol).cast("long").as("media_id"),
      when(fmt === 0, pngUdf(h, w, ht))
        .when(fmt === 1, wavUdf(h, nSamp))
        .otherwise(gifUdf(h, vw, vh, vf))
        .as("media"),
      struct(
        element_at(array(lit("img"), lit("audio"), lit("video")), fmt + 1).as("format"),
        when(isVideo, vw).otherwise(w).as("width"),
        when(isVideo, vh).otherwise(ht).as("height"),
        when(isVideo, vf).otherwise(lit(1)).as("n_frames")).as("meta"))
  }

  case class MediaFeatures(
      media_id: Long, format: String, width: Int, height: Int,
      n_frames: Int, payload_bytes: Int, features: Array[Double])

  object MediaKernels {
    private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

    private def looksLikeImage(b: Array[Byte]): Boolean =
      b.length >= 4 && (
        b.startsWith(PngMagic) ||                        // PNG
        (b(0) == 'B' && b(1) == 'M') ||                  // BMP
        (b(0) == 'G' && b(1) == 'I' && b(2) == 'F'))     // GIF

    private def looksLikeWav(b: Array[Byte]): Boolean =
      b.length >= 12 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    /** Real audio decode: WAV via `javax.sound.sampled` (pure-JVM WAVE
      * reader), normalized to [-1,1] doubles (channel-averaged if
      * multi-channel). Features: f0 DC mean, f1 RMS, f2 min, f3 max,
      * f4 zero-crossing rate, f5 mean |x|, f6 fraction |x| > 0.5,
      * f7 duration in seconds. Returns None for non-WAV / unsupported
      * encodings so the caller can fall back. */
    private def decodeWav(b: Array[Byte]): Option[(Array[Double], Float)] = {
      import javax.sound.sampled.AudioSystem
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(b))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16 || f.isBigEndian) None
          else {
            val ch = f.getChannels
            val raw = in.readAllBytes()
            val n = raw.length / (2 * ch)
            val out = new Array[Double](n)
            var i = 0
            while (i < n) {
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = (i * ch + c) * 2
                val v = ((raw(off) & 0xFF) | (raw(off + 1) << 8)).toShort
                acc += v / 32768.0
                c += 1
              }
              out(i) = acc / ch
              i += 1
            }
            Some((out, f.getSampleRate))
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }

    /** One-pass raster accumulator shared by the image and video paths.
      * Luma is BT.601. */
    private final case class RasterSums(
        sr: Double, sg: Double, sb: Double, sl: Double, sl2: Double,
        minL: Double, maxL: Double, bright: Long, nPix: Long)

    private def rasterSums(im: BufferedImage): RasterSums = {
      val w = im.getWidth; val h = im.getHeight
      var sr, sg, sb, sl, sl2 = 0.0
      var minL = Double.MaxValue; var maxL = Double.MinValue
      var bright = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = im.getRGB(x, y)
          val r = ((rgb >> 16) & 0xFF) / 255.0
          val g = ((rgb >> 8) & 0xFF) / 255.0
          val b = (rgb & 0xFF) / 255.0
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          if (l < minL) minL = l
          if (l > maxL) maxL = l
          if (l > 0.5) bright += 1
          x += 1
        }
        y += 1
      }
      RasterSums(sr, sg, sb, sl, sl2, minL, maxL, bright, w.toLong * h)
    }

    /** All frames of a (possibly animated) GIF via the imageio reader's
      * sequence API. None for non-GIF or decode failure. Our generator
      * writes full-size frames, so no disposal compositing is needed. */
    private def decodeGifFrames(b: Array[Byte]): Option[Array[BufferedImage]] = {
      try {
        val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(b))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val n = r.getNumImages(true)
              Some(Array.tabulate(n)(r.read))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Decode an image payload, scale to (outW, outH) with bilinear
      * Graphics2D interpolation, re-encode as PNG. None when the payload
      * isn't a decodable single image. */
    def resizeImage(b: Array[Byte], outW: Int, outH: Int): Option[Array[Byte]] = {
      if (b == null || !looksLikeImage(b)) return None
      resizeRaster(b, outW, outH).map(Multimodal.pngBytesOf)
    }

    /** Fixed-dimension luminance embedding of a still image: decode →
      * bilinear scale to grid×grid → row-major BT.601 luma vector in
      * [0,1]. None for non-image / undecodable payloads. */
    def imageEmbedding(b: Array[Byte], grid: Int): Option[Array[Float]] = {
      if (b == null || !looksLikeImage(b)) return None
      resizeRaster(b, grid, grid).map { im =>
        val out = new Array[Float](grid * grid)
        var y = 0
        while (y < grid) {
          var x = 0
          while (x < grid) {
            val rgb = im.getRGB(x, y)
            val r = ((rgb >> 16) & 0xFF) / 255.0
            val g = ((rgb >> 8) & 0xFF) / 255.0
            val bl = (rgb & 0xFF) / 255.0
            out(y * grid + x) = (0.299 * r + 0.587 * g + 0.114 * bl).toFloat
            x += 1
          }
          y += 1
        }
        out
      }
    }

    private def resizeRaster(b: Array[Byte], outW: Int, outH: Int): Option[BufferedImage] = {
      val src =
        try {
          val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(b))
          val im = ImageIO.read(iis)
          if (im == null) { try iis.close() catch { case _: java.io.IOException => () } }
          Option(im)
        } catch { case _: java.io.IOException => None }
      src.map { im =>
        val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(im, 0, 0, outW, outH, null)
        } finally g.dispose()
        out
      }
    }

    /** Keep every `stride`-th frame of an animated GIF (frame 0 always
      * kept) and re-encode. None when the payload isn't a multi-frame
      * GIF. The executed form of [[Multimodal.frameSamplePlan]]. */
    def sampleGifFrames(b: Array[Byte], stride: Int): Option[Array[Byte]] = {
      require(stride >= 1, s"stride must be >= 1, got $stride")
      if (b == null || b.length < 4 || b(0) != 'G' || b(1) != 'I' || b(2) != 'F')
        return None
      decodeGifFrames(b).collect {
        case frames if frames.length > 1 =>
          gifBytes(frames.indices.by(stride).map(frames(_)).toArray)
      }
    }

    /** Real image decode: PNG/BMP/GIF via `javax.imageio`, features from
      * the decoded raster —
      * f0..f2 mean R/G/B, f3 mean luma (BT.601), f4 population std of
      * luma, f5/f6 min/max luma, f7 fraction of pixels with luma > 0.5;
      * all in [0,1].
      *
      * Real video decode: a multi-frame GIF is treated as video —
      * f0..f2 mean R/G/B over all frames, f3 mean luma, f4 population
      * std of PER-FRAME mean luma (temporal variation), f5/f6 min/max
      * per-frame mean luma, f7 mean |Δ| of consecutive per-frame mean
      * lumas (temporal activity); `n_frames`/dims are the DECODED counts.
      *
      * Unknown payloads fall back to payload-byte statistics. */
    def decode(mediaId: Long, media: Array[Byte], format: String,
        width: Int, height: Int, nFrames: Int): MediaFeatures = {
      if (media != null && looksLikeWav(media)) {
        decodeWav(media) match {
          case Some((x, rate)) =>
            val n = x.length
            var s0 = 0.0; var s2 = 0.0; var sa = 0.0
            var mn = Double.MaxValue; var mx = Double.MinValue
            var loud = 0L; var zc = 0L
            var i = 0
            while (i < n) {
              val v = x(i)
              s0 += v; s2 += v * v; sa += math.abs(v)
              if (v < mn) mn = v
              if (v > mx) mx = v
              if (math.abs(v) > 0.5) loud += 1
              if (i > 0 && x(i - 1) * v < 0) zc += 1
              i += 1
            }
            val nd = math.max(n, 1).toDouble
            return MediaFeatures(mediaId, format, width, height, n,
              media.length,
              Array(s0 / nd, math.sqrt(s2 / nd),
                if (n == 0) 0.0 else mn, if (n == 0) 0.0 else mx,
                if (n > 1) zc.toDouble / (n - 1) else 0.0,
                sa / nd, loud / nd, n / rate.toDouble))
          case None => // fall through to image probe / stub
        }
      }
      // multi-frame GIF ⇒ video; single-frame GIF falls through to the
      // plain image path below (same arithmetic either way)
      if (media != null && media.length >= 4 &&
          media(0) == 'G' && media(1) == 'I' && media(2) == 'F') {
        decodeGifFrames(media) match {
          case Some(frames) if frames.length > 1 =>
            var sr, sg, sb, sl = 0.0
            var nPix = 0L
            val frameMeans = frames.map { f =>
              val rs = rasterSums(f)
              sr += rs.sr; sg += rs.sg; sb += rs.sb; sl += rs.sl; nPix += rs.nPix
              rs.sl / rs.nPix
            }
            val nf = frames.length
            val fmMean = frameMeans.sum / nf
            val fmVar = math.max(
              frameMeans.map(m => (m - fmMean) * (m - fmMean)).sum / nf, 0.0)
            var dAbs = 0.0
            var i = 1
            while (i < nf) { dAbs += math.abs(frameMeans(i) - frameMeans(i - 1)); i += 1 }
            val n = nPix.toDouble
            return MediaFeatures(mediaId, format,
              frames(0).getWidth, frames(0).getHeight, nf, media.length,
              Array(sr / n, sg / n, sb / n, sl / n, math.sqrt(fmVar),
                frameMeans.min, frameMeans.max,
                if (nf > 1) dAbs / (nf - 1) else 0.0))
          case _ => // single frame or unreadable: fall through
        }
      }
      val img = if (media != null && looksLikeImage(media)) {
        try {
          val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(media))
          // ImageIO.read(ImageInputStream) closes the stream itself on a
          // successful read — closing again throws; only reap on null
          val im = ImageIO.read(iis)
          if (im == null) { try iis.close() catch { case _: java.io.IOException => () } }
          Option(im)
        } catch { case _: java.io.IOException => None }
      } else None
      img match {
        case Some(im) =>
          val rs = rasterSums(im)
          val n = rs.nPix.toDouble
          val meanL = rs.sl / n
          val varL = math.max(rs.sl2 / n - meanL * meanL, 0.0)
          MediaFeatures(mediaId, format, im.getWidth, im.getHeight, nFrames,
            media.length,
            Array(rs.sr / n, rs.sg / n, rs.sb / n, meanL, math.sqrt(varL),
              rs.minL, rs.maxL, rs.bright / n))
        case None =>
          // Fallback for unknown/undecodable payloads: payload-byte stats.
          val bytes = if (media == null) Array.empty[Byte] else media
          val payload = if (bytes.length > 16) bytes.drop(16) else Array.empty[Byte]
          val feats = new Array[Double](8)
          var i = 0
          while (i < payload.length) { feats(i % 8) += (payload(i) & 0xFF) / 255.0; i += 1 }
          val n = math.max(payload.length / 8.0, 1.0)
          MediaFeatures(mediaId, format, width, height, nFrames,
            payload.length, feats.map(_ / n))
      }
    }
  }

  /** Partition-batched decode + feature extraction: one kernel invocation
    * per row, batched per partition (the Scala analogue of mapInPandas
    * batches — no per-row JVM/py crossing to model here, but the iterator
    * shape is the same). Resize/frame-sample parameters travel with the
    * metadata so the kernel sees everything in one call. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val ss = media.sparkSession
    import ss.implicits._
    media
      .select(col("media_id"), col("media"),
        col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.n_frames").as("n_frames"))
      .as[(Long, Array[Byte], String, Int, Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, fmt, w, h, nf) =>
          MediaKernels.decode(id, bytes, fmt, w, h, nf)
        }
      }
  }

  /** Resize every image row to (outW, outH) — real decode → bilinear
    * scale → PNG re-encode via [[MediaKernels.resizeImage]]; non-image
    * rows pass through untouched with their metadata intact. Image
    * metadata is rewritten to the actual output dimensions. Partition-
    * parallel, one small raster in flight per row. */
  def resizeImages(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val kernel = udf { (bytes: Array[Byte]) =>
      MediaKernels.resizeImage(bytes, outW, outH)
    }
    val isImg = col("meta.format") === "img"
    media.select(
      col("media_id"),
      when(isImg, coalesce(kernel(col("media")), col("media")))
        .otherwise(col("media")).as("media"),
      struct(
        col("meta.format").as("format"),
        when(isImg, lit(outW)).otherwise(col("meta.width")).as("width"),
        when(isImg, lit(outH)).otherwise(col("meta.height")).as("height"),
        col("meta.n_frames").as("n_frames")).as("meta"))
  }

  /** Keep every `stride`-th frame of video rows — the EXECUTED form of
    * [[frameSamplePlan]]: decode the GIF, slice the frame sequence,
    * re-encode. Non-video rows pass through untouched; metadata frame
    * counts are rewritten to the sampled count. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val kernel = udf { (bytes: Array[Byte]) =>
      MediaKernels.sampleGifFrames(bytes, stride)
    }
    val isVid = col("meta.format") === "video"
    media.select(
      col("media_id"),
      when(isVid, coalesce(kernel(col("media")), col("media")))
        .otherwise(col("media")).as("media"),
      struct(
        col("meta.format").as("format"),
        col("meta.width").as("width"),
        col("meta.height").as("height"),
        when(isVid,
          ceil(col("meta.n_frames").cast("double") / stride).cast("int"))
          .otherwise(col("meta.n_frames")).as("n_frames")).as("meta"))
  }

  /** Fixed-dimension luminance embeddings for image rows: real decode →
    * bilinear scale to grid×grid → row-major luma vector in [0,1],
    * emitted as `embedding: array<float>` so the column plugs straight
    * into [[Similarity.bruteForceTopK]]/[[Similarity.lshTopK]]/
    * [[Similarity.ivfTopK]] — image near-dup search over the same ANN
    * operators as text embeddings. Non-image / undecodable rows are
    * dropped (an all-null embedding has no cosine). Partition-parallel,
    * one grid×grid raster in flight per row. */
  def imageEmbeddings(media: DataFrame, grid: Int = 8): DataFrame = {
    require(grid >= 1 && grid <= 64, s"grid must be in [1,64], got $grid")
    val kernel = udf { (bytes: Array[Byte]) =>
      MediaKernels.imageEmbedding(bytes, grid)
    }
    media
      .filter(col("meta.format") === "img")
      .select(col("media_id").as("vec_id"), kernel(col("media")).as("embedding"))
      .filter(col("embedding").isNotNull)
  }

  /** Deterministic frame sampling plan for video rows: every `stride`-th
    * frame index — pure expression, no decode needed to plan the work. */
  def frameSamplePlan(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("meta.format") === "video")
      .select(col("media_id"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(stride)).as("frame_indices"))
}
