package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as
  * opaque BINARY columns with typed metadata, processed in batched
  * `mapPartitions` kernels (the Scala analogue of `mapInPandas` batch
  * processing — one buffer allocation per partition, columnar-in,
  * columnar-out).
  *
  * The DECODE STEP IS A DETERMINISTIC STUB: no image/audio codecs exist
  * in this container, so `decodeMeta` derives (width, height, format)
  * from the payload bytes deterministically and `featurize` computes
  * real byte-level statistics (length, entropy buckets, byte histogram
  * moments). The Spark-side contract — schema, batching, partitioning,
  * null handling — is real and tested; swap `StubCodec` for a JNI/javacv
  * codec to productionize.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, format: String, ok: Boolean)
  final case class MediaRow(id: Long, meta: MediaMeta, features: Array[Float])

  /** STUB codec — deterministic fake decode (see object doc). */
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
    * One kernel invocation per partition — mapInPandas batch shape. */
  def processMedia(spark: SparkSession, df: DataFrame,
                   idCol: String = "i", payloadCol: String = "html"): Dataset[MediaRow] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          MediaRow(id, StubCodec.decodeMeta(payload), StubCodec.featurize(payload))
        }
      }
  }

  /** Resize plumbing: treat the payload as a (len/width × width) byte
    * grid (STUB — a real codec would decode pixels) and bilinearly
    * resample it to (outH × outW). The Spark-side shape — binary in,
    * fixed-size binary out, batched per partition — is the real
    * contract a production resize kernel drops into. */
  def resizeMedia(spark: SparkSession, df: DataFrame, outW: Int, outH: Int,
                  idCol: String = "i", payloadCol: String = "html"): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, payload) =>
          if (payload == null || payload.length < 4) (id, new Array[Byte](outW * outH))
          else {
            val cols = math.max(1, math.min(64, math.sqrt(payload.length).toInt))
            val rws = payload.length / cols
            val grid = java.util.Arrays.copyOf(payload, rws * cols)
            (id, graft.geom.Raster.resampleBilinear(grid, rws, cols, outH, outW))
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
