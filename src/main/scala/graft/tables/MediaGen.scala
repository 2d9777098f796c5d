package graft.tables

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic in-memory media synthesis for the multimodal path —
  * REAL encoded payloads (PNG via the JDK's ImageIO, WAV via a
  * hand-rolled canonical 44-byte PCM header) generated from closed-form
  * per-pixel / per-sample formulas, so the decoded content is
  * analytically computable in the DuckDB oracle: the decode queries get
  * a REAL hash-compared oracle (sum of channel values over the pixel
  * grid as integers), proving the full encode→decode round trip, not
  * just plumbing. No external data, no codec libraries beyond the JDK.
  */
object MediaGen {

  val ImgW = 48
  val ImgH = 32

  /** Closed-form channel values — mirrored EXACTLY in the oracle SQL. */
  @inline def red(id: Long, x: Int, y: Int): Int = (((id * 31 + x * 7 + y * 13) % 256) + 256).toInt % 256
  @inline def green(id: Long, x: Int, y: Int): Int = (((id * 17 + x * 11 + y * 5) % 256) + 256).toInt % 256
  @inline def blue(id: Long, x: Int, y: Int): Int = (((id * 13 + x * 3 + y * 29) % 256) + 256).toInt % 256

  /** One deterministic RGB image, PNG-encoded (lossless → decode
    * recovers the formula exactly). */
  def pngFor(id: Long): Array[Byte] = {
    val img = new BufferedImage(ImgW, ImgH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        img.setRGB(x, y, (red(id, x, y) << 16) | (green(id, x, y) << 8) | blue(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (id, png BINARY) table of `n` deterministic images. */
  def images(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map(id => (id, pngFor(id))))
      .toDF("id", "png")
  }

  val WavSampleRate = 8000
  val WavSamples = 2048

  /** Closed-form PCM16 sample — mirrored in the oracle SQL. */
  @inline def sample(id: Long, k: Int): Short =
    ((((id * 31 + k.toLong * 17) % 4096) + 4096) % 4096 - 2048).toShort

  /** One deterministic mono PCM16 WAV (canonical 44-byte header). */
  def wavFor(id: Long): Array[Byte] = {
    val dataLen = WavSamples * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
    b.put("fmt ".getBytes); b.putInt(16); b.putShort(1) // PCM
    b.putShort(1); b.putInt(WavSampleRate) // mono
    b.putInt(WavSampleRate * 2); b.putShort(2); b.putShort(16)
    b.put("data".getBytes); b.putInt(dataLen)
    var k = 0
    while (k < WavSamples) { b.putShort(sample(id, k)); k += 1 }
    b.array()
  }

  /** (id, wav BINARY) table of `n` deterministic WAV clips. */
  def wavs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map(id => (id, wavFor(id))))
      .toDF("id", "wav")
  }

  /** One deterministic RGB image, JPEG-encoded (ImageIO default
    * quality). Lossy, so no closed-form oracle — but deterministic
    * given the container JDK's codec, so decode queries over it pin to
    * a committed output hash instead. */
  def jpegFor(id: Long): Array[Byte] = {
    val img = new BufferedImage(ImgW, ImgH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        img.setRGB(x, y, (red(id, x, y) << 16) | (green(id, x, y) << 8) | blue(id, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** (id, jpeg BINARY) table of `n` deterministic JPEG images. */
  def jpegs(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map(id => (id, jpegFor(id))))
      .toDF("id", "jpeg")
  }

  /** Mixed-modality (id, payload BINARY) table: id%4 → PNG / WAV /
    * JPEG / deterministic html-ish text bytes. The real-codec branches
    * (PNG, WAV, JPEG) dominate while the text rows keep the stub
    * fallback covered — the corpus shape a real multimodal crawl has. */
  def mixed(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
      .as[Long].mapPartitions(_.map { id =>
        val payload = (id % 4) match {
          case 0 => pngFor(id)
          case 1 => wavFor(id)
          case 2 => jpegFor(id)
          case _ =>
            (s"<html><body>doc $id " + ("lorem ipsum " * (1 + (id % 7)).toInt) +
              "</body></html>").getBytes("UTF-8")
        }
        (id, payload)
      })
      .toDF("id", "payload")
  }
}
