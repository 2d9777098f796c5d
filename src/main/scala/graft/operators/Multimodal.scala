package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque BINARY columns with typed metadata, processed in batched
  * `mapPartitions` kernels (the Scala analogue of `mapInPandas` batch
  * processing — one buffer allocation per partition, columnar-in,
  * columnar-out).
  *
  * DECODE IS REAL for the formats the JDK ships codecs for:
  * [[JdkCodec]] sniffs magic bytes and decodes PNG/JPEG/GIF/BMP via
  * `javax.imageio` and WAV/PCM via `javax.sound.sampled` — zero
  * external dependencies, verified against an ANALYTIC DuckDB oracle
  * (mm_decode_png / mm_decode_wav: channel/sample sums of
  * deterministically synthesized payloads, proving the full
  * encode→decode round trip). Payloads in formats the JDK cannot
  * decode (webp, video, arbitrary bytes) fall back to [[StubCodec]]'s
  * deterministic byte statistics — that residual capability gap is the
  * honest JNI/javacv swap-in point, now confined to exotic codecs.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, ok: Boolean)
  final case class MediaRow(id: Long, meta: MediaMeta, features: Array[Float])

  /** REAL decode for JDK-supported formats (headless-safe). */
  object JdkCodec {
    // ImageIO's default ImageInputStream cache is a TEMP FILE per
    // stream — for in-memory byte-array payloads that is pure disk
    // overhead (create+write+delete a file per image, ~2000/query).
    // The memory cache decodes identical pixels. Executor-side static
    // init: runs once per JVM when the codec class loads.
    javax.imageio.ImageIO.setUseCache(false)
    /** Magic-byte container sniff; "unknown" → stub path. */
    def sniff(p: Array[Byte]): String = {
      if (p == null || p.length < 12) return "unknown"
      if ((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') "png"
      else if ((p(0) & 0xff) == 0xFF && (p(1) & 0xff) == 0xD8) "jpeg"
      else if (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') "gif"
      else if (p(0) == 'B' && p(1) == 'M') "bmp"
      else if (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
               p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') "wav"
      else "unknown"
    }

    def isImage(fmt: String): Boolean =
      fmt == "png" || fmt == "jpeg" || fmt == "gif" || fmt == "bmp"

    /** Dimension cap: a decompression-bomb payload (a few KB declaring
      * 65500² pixels) would otherwise allocate a multi-GB raster —
      * OutOfMemoryError, which no Exception handler catches — or
      * overflow Int in w*h indexing. 64 Mpx ≈ 256 MB INT_RGB. */
    val MaxPixels = 64L * 1024 * 1024

    def decodeImage(p: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try {
        // read declared dimensions from the header FIRST (no pixel
        // decode), reject bombs before any allocation happens
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(p))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val w = reader.getWidth(0).toLong
          val h = reader.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxPixels) None
          else Option(reader.read(0))
        } finally { reader.dispose(); iis.close() }
      } catch { case _: Exception => None }

    /** Exact per-channel pixel sums (the oracle-checked quantity).
      * Bulk getRGB: the per-pixel getRGB(x, y) path goes through the
      * ColorModel once per pixel (~3M slow calls per 2000-image query);
      * the bulk overload converts whole rows and returns the IDENTICAL
      * packed-ARGB values. */
    def channelSums(img: java.awt.image.BufferedImage): (Long, Long, Long) = {
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < px.length) {
        val p = px(i)
        r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
        i += 1
      }
      (r, g, b)
    }

    /** 8-float feature vector: w, h, mean R/G/B, luma mean/std, 0.
      * One bulk getRGB + one pass — this runs per image in the
      * per-partition kernel, so pixels are fetched exactly once. */
    def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
      val w = img.getWidth; val h = img.getHeight
      val n = w.toLong * h
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var r = 0L; var g = 0L; var b = 0L
      var lsum = 0.0; var lsum2 = 0.0
      var i = 0
      while (i < px.length) {
        val p = px(i)
        val pr = (p >> 16) & 0xff; val pg = (p >> 8) & 0xff; val pb = p & 0xff
        r += pr; g += pg; b += pb
        val l = (pr * 299 + pg * 587 + pb * 114) / 1000.0
        lsum += l; lsum2 += l * l
        i += 1
      }
      val lm = lsum / n
      Array(w.toFloat, h.toFloat,
        (r.toDouble / n).toFloat, (g.toDouble / n).toFloat, (b.toDouble / n).toFloat,
        lm.toFloat, math.sqrt(math.max(0, lsum2 / n - lm * lm)).toFloat, 0f)
    }

    /** Integer-exact grayscale (luma ×1000 rounded down) byte plane —
      * deterministic input to the engine's own resample kernel. */
    def grayPlane(img: java.awt.image.BufferedImage): Array[Byte] = {
      // bulk getRGB (identical packed-ARGB values, see channelSums)
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      val out = new Array[Byte](px.length)
      var i = 0
      while (i < px.length) {
        val p = px(i)
        out(i) =
          ((((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000).toByte
        i += 1
      }
      out
    }

    /** WAV decode via javax.sound to SIGNED 16-bit PCM samples:
      * non-PCM16 encodings (8-bit, mu-law/a-law, float) are CONVERTED
      * through AudioSystem's codec chain rather than reinterpreted as
      * shorts; streams whose format the JDK cannot convert (or with an
      * unspecified channel count) return None → stub path. */
    def decodeWav(p: Array[Byte]): Option[(Int, Int, Array[Short])] =
      try {
        val raw = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(p))
        val f0 = raw.getFormat
        if (f0.getChannels <= 0 || f0.getSampleRate <= 0) return None
        val pcm16 = new javax.sound.sampled.AudioFormat(
          javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          f0.getSampleRate, 16, f0.getChannels, 2 * f0.getChannels,
          f0.getSampleRate, false)
        val in =
          if (f0.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f0.getSampleSizeInBits == 16) raw
          else javax.sound.sampled.AudioSystem.getAudioInputStream(pcm16, raw)
        val fmt = in.getFormat
        val bytes = in.readAllBytes()
        val n = bytes.length / 2 // trailing odd byte (malformed) dropped
        val samples = new Array[Short](n)
        val bb = java.nio.ByteBuffer.wrap(bytes).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var k = 0
        while (k < n) { samples(k) = bb.getShort(2 * k); k += 1 }
        Some((fmt.getSampleRate.toInt, fmt.getChannels, samples))
      } catch { case _: Exception => None }
  }

  /** STUB codec for formats the JDK cannot decode (webp, video,
    * arbitrary bytes): deterministic fake meta + real byte statistics.
    * The JNI/javacv swap-in point. */
  object StubCodec {
    val Formats = Array("jpeg", "png", "webp")
    def decodeMeta(payload: Array[Byte]): MediaMeta = {
      if (payload == null || payload.isEmpty) return MediaMeta(0, 0, "empty", ok = false)
      val h = CrownOps.mix64(payload.length.toLong ^ (payload(0) & 0xffL) << 32)
      MediaMeta(
        width = 64 + Math.floorMod(h, 1920L).toInt,
        height = 64 + Math.floorMod(h >>> 16, 1080L).toInt,
        format = Formats(Math.floorMod(h >>> 32, Formats.length.toLong).toInt),
        ok = true)
    }

    /** Real byte statistics (not stubbed): length, mean, variance, and a
      * 5-bucket histogram — an honest feature vector over the payload. */
    def featurize(payload: Array[Byte]): Array[Float] = {
      if (payload == null || payload.isEmpty) return new Array[Float](8)
      var sum = 0.0; var sum2 = 0.0
      val hist = new Array[Int](5)
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        sum += b; sum2 += b.toDouble * b
        hist(b * 5 / 256) += 1
        i += 1
      }
      val n = payload.length.toDouble
      val mean = sum / n
      Array(payload.length.toFloat, mean.toFloat,
        math.sqrt(math.max(0, sum2 / n - mean * mean)).toFloat,
        hist(0) / n.toFloat, hist(1) / n.toFloat, hist(2) / n.toFloat,
        hist(3) / n.toFloat, hist(4) / n.toFloat)
    }
  }

  /** Batched decode + featurize over (id BIGINT, payload BINARY).
    * One kernel invocation per partition — mapInPandas batch shape.
    * JDK-decodable payloads (PNG/JPEG/GIF/BMP images, WAV audio) take
    * the REAL codec path: meta carries true (width, height) — for
    * audio, (n_samples, channels) — and features are real pixel/sample
    * statistics. Everything else falls back to the stub. */
  def processMedia(spark: SparkSession, df: DataFrame,
                   idCol: String = "i", payloadCol: String = "html"): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          // NOT-decodable payloads — including false sniffs like text
          // that happens to start with "BM"/"GIF"/"RIFF" — fall back to
          // the FULL stub row (deterministic meta + byte stats), so the
          // stub path's behavior is independent of what the first bytes
          // look like
          val fmt = JdkCodec.sniff(payload)
          if (JdkCodec.isImage(fmt)) JdkCodec.decodeImage(payload) match {
            case Some(img) => MediaRow(id,
              MediaMeta(img.getWidth, img.getHeight, fmt, ok = true),
              JdkCodec.imageFeatures(img))
            case None => MediaRow(id, StubCodec.decodeMeta(payload),
              StubCodec.featurize(payload))
          } else if (fmt == "wav") JdkCodec.decodeWav(payload) match {
            case Some((rate, ch, samples)) =>
              var sumAbs = if (samples.isEmpty) 0.0 else math.abs(samples(0).toDouble)
              var zc = 0
              var k = 1
              while (k < samples.length) {
                sumAbs += math.abs(samples(k).toDouble)
                if ((samples(k) >= 0) != (samples(k - 1) >= 0)) zc += 1
                k += 1
              }
              MediaRow(id, MediaMeta(samples.length / ch, ch, fmt, ok = true),
                Array(rate.toFloat, ch.toFloat, samples.length.toFloat,
                  (sumAbs / math.max(1, samples.length)).toFloat, zc.toFloat, 0f, 0f, 0f))
            case None => MediaRow(id, StubCodec.decodeMeta(payload),
              StubCodec.featurize(payload))
          } else MediaRow(id, StubCodec.decodeMeta(payload), StubCodec.featurize(payload))
        }
      }
  }

  /** REAL image decode with exact integer channel sums — the
    * oracle-checked decode query shape: (id, width, height, format,
    * sum_r, sum_g, sum_b). */
  def decodeImageSums(spark: SparkSession, df: DataFrame,
                      idCol: String = "id", payloadCol: String = "png"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          JdkCodec.decodeImage(payload).map { img =>
            val (r, g, b) = JdkCodec.channelSums(img)
            (id, img.getWidth.toLong, img.getHeight.toLong, JdkCodec.sniff(payload), r, g, b)
          }
        }
      }.toDF(idCol, "width", "height", "format", "sum_r", "sum_g", "sum_b")
  }

  /** REAL WAV decode with exact integer sample sums: (id, sample_rate,
    * channels, n_samples, sum_samples). */
  def decodeWavSums(spark: SparkSession, df: DataFrame,
                    idCol: String = "id", payloadCol: String = "wav"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          JdkCodec.decodeWav(payload).map { case (rate, ch, samples) =>
            var s = 0L
            var k = 0
            while (k < samples.length) { s += samples(k); k += 1 }
            (id, rate.toLong, ch.toLong, samples.length.toLong, s)
          }
        }
      }.toDF(idCol, "sample_rate", "channels", "n_samples", "sum_samples")
  }

  /** Resize: JDK-decodable images take the REAL path — decode, exact
    * integer luma plane, then the engine's own bilinear resample kernel
    * (deterministic double math, no Graphics2D rendering variance).
    * Non-image payloads keep the stub byte-grid path. Binary in,
    * fixed-size (outH × outW) binary out, batched per partition. */
  def resizeMedia(spark: SparkSession, df: DataFrame, outW: Int, outH: Int,
                  idCol: String = "i", payloadCol: String = "html"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          val img = if (JdkCodec.isImage(JdkCodec.sniff(payload)))
            JdkCodec.decodeImage(payload) else None
          img match {
            case Some(im) =>
              (id, graft.geom.Raster.resampleBilinear(
                JdkCodec.grayPlane(im), im.getHeight, im.getWidth, outH, outW))
            case None =>
              if (payload == null || payload.length < 4) (id, new Array[Byte](outW * outH))
              else {
                val cols = math.max(1, math.min(64, math.sqrt(payload.length).toInt))
                val rws = payload.length / cols
                val grid = java.util.Arrays.copyOf(payload, rws * cols)
                (id, graft.geom.Raster.resampleBilinear(grid, rws, cols, outH, outW))
              }
          }
        }
      }.toDF(idCol, "resized")
  }

  /** Frame-sampling plumbing for video-like payloads: split the payload
    * into `frames` equal byte windows ("frames" under the stub codec)
    * and featurize each — exercises the exploded one-to-many shape real
    * frame samplers produce. */
  def sampleFrames(spark: SparkSession, df: DataFrame, frames: Int,
                   idCol: String = "i", payloadCol: String = "html"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          if (payload == null || payload.isEmpty) Iterator.empty
          else {
            val step = math.max(1, payload.length / frames)
            (0 until math.min(frames, payload.length)).iterator.map { f =>
              val lo = f * step
              val hi = math.min(payload.length, lo + step)
              (id, f, StubCodec.featurize(java.util.Arrays.copyOfRange(payload, lo, hi)))
            }
          }
        }
      }.toDF(idCol, "frame", "features")
  }
}
