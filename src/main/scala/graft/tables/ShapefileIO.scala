package graft.tables

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary ESRI shapefile source/sink (S5) — the reference loads crown
  * shapefiles through fiona (result/instancesegmentationresult.py:
  * 143-190 `load_shapefile`); this is a from-scratch reader/writer of
  * the PUBLIC shapefile spec (ESRI Shapefile Technical Description,
  * 1998): 100-byte header (file code 9994 big-endian, version 1000 +
  * shape type little-endian, bbox doubles), then per-record big-endian
  * (number, content length in 16-bit words) headers and little-endian
  * Polygon (type 5) payloads — bbox, numParts, numPoints, ring part
  * offsets, xy points. Rings follow shapefile convention: outer rings
  * clockwise, holes counter-clockwise.
  *
  * Scale shape: one .shp is a driver-side artifact (the reference's
  * per-image output). The Spark path parallelizes ACROSS files —
  * `readTable` lists a directory and parses each file inside
  * mapPartitions, so a million shapefiles fan out as a normal
  * distributed scan; a single shapefile is not splittable (records are
  * variable-length back-to-back), which is inherent to the format.
  */
object ShapefileIO {

  final case class ShpRecord(recordNum: Int, rings: Seq[Array[Double]])

  private val FileCode = 9994
  private val Version = 1000
  private val PolygonType = 5

  /** Parse a polygon shapefile from bytes. */
  def parse(bytes: Array[Byte]): Seq[ShpRecord] = {
    val buf = ByteBuffer.wrap(bytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    require(buf.getInt(0) == FileCode, s"not a shapefile (file code ${buf.getInt(0)})")
    val fileWords = buf.getInt(24) // length in 16-bit words, header included
    buf.order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getInt(28) == Version, "unsupported shapefile version")
    val shapeType = buf.getInt(32)
    require(shapeType == PolygonType || shapeType == 0,
      s"only Polygon (5) shapefiles supported, got type $shapeType")

    val out = Seq.newBuilder[ShpRecord]
    var pos = 100
    // length math in Long: fileWords * 2 overflows Int past 1 GiB
    val end = math.min(bytes.length.toLong, fileWords.toLong * 2).toInt
    while (pos + 8 <= end) {
      buf.order(ByteOrder.BIG_ENDIAN)
      val recNum = buf.getInt(pos)
      val contentWords = buf.getInt(pos + 4)
      val content = pos + 8
      // malformed header guard: content length below the 4-byte shape
      // type, or running past the buffer, would stall or overrun the
      // scan — stop parsing rather than spin
      if (contentWords < 2 || content.toLong + contentWords.toLong * 2 > end)
        return out.result()
      buf.order(ByteOrder.LITTLE_ENDIAN)
      val recType = buf.getInt(content)
      if (recType == PolygonType) {
        val numParts = buf.getInt(content + 36)
        val numPoints = buf.getInt(content + 40)
        // body-level guard: corrupt part/point counts would otherwise
        // allocate huge arrays or read the NEXT record's bytes as
        // coordinates — stop cleanly like the header guard
        if (numParts < 0 || numPoints < 0 ||
            4L + 40L + 4L * numParts + 16L * numPoints > contentWords.toLong * 2)
          return out.result()
        val partsOff = content + 44
        val pointsOff = partsOff + 4 * numParts
        val starts = Array.tabulate(numParts)(p => buf.getInt(partsOff + 4 * p))
        // part offsets must be a non-decreasing sequence inside
        // [0, numPoints] — anything else reads header/neighbor bytes
        // as coordinates or throws on a negative ring size
        var prev = 0
        var pi = 0
        var startsOk = true
        while (pi < numParts) {
          val s0 = starts(pi)
          if (s0 < prev || s0 > numPoints) startsOk = false
          prev = math.max(prev, s0)
          pi += 1
        }
        if (!startsOk) return out.result()
        val rings = (0 until numParts).map { p =>
          val from = starts(p)
          val until = if (p + 1 < numParts) starts(p + 1) else numPoints
          // shapefile rings repeat the first point at the end; the
          // engine's flat-ring convention does not
          val n = until - from
          val m = if (n > 1) n - 1 else n
          val ring = new Array[Double](2 * m)
          var k = 0
          while (k < m) {
            ring(2 * k) = buf.getDouble(pointsOff + 16 * (from + k))
            ring(2 * k + 1) = buf.getDouble(pointsOff + 16 * (from + k) + 8)
            k += 1
          }
          ring
        }
        out += ShpRecord(recNum, rings)
      }
      pos = content + contentWords * 2
    }
    out.result()
  }

  def read(path: String): Seq[ShpRecord] = parse(Files.readAllBytes(Paths.get(path)))

  /** Serialize polygon records to shapefile bytes (round-trip tested).
    * Rings are written as given; callers follow the CW-outer/CCW-hole
    * convention for interoperability. Degenerate rings (< 3 vertices)
    * are dropped; a record left ringless — e.g. a MergedCrown produced
    * with emitGeom = false — becomes a spec-legal Null Shape (type 0)
    * record instead of crashing the writer. */
  def write(records: Seq[ShpRecord]): Array[Byte] = {
    val bodies = records.map { r0 =>
      val rings = r0.rings.filter(_.length >= 6)
      if (rings.isEmpty) {
        val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(0) // Null Shape
        (r0.recordNum, b.array())
      } else {
        val numPoints = rings.map(_.length / 2 + 1).sum // +1: close each ring
        val contentBytes = 4 + 32 + 4 + 4 + 4 * rings.size + 16 * numPoints
        val b = ByteBuffer.allocate(contentBytes).order(ByteOrder.LITTLE_ENDIAN)
        b.putInt(PolygonType)
        val xs = rings.flatMap(_.grouped(2).map(_(0)))
        val ys = rings.flatMap(_.grouped(2).map(_(1)))
        b.putDouble(xs.min); b.putDouble(ys.min); b.putDouble(xs.max); b.putDouble(ys.max)
        b.putInt(rings.size); b.putInt(numPoints)
        var start = 0
        rings.foreach { ring => b.putInt(start); start += ring.length / 2 + 1 }
        rings.foreach { ring =>
          var k = 0
          while (k < ring.length / 2) {
            b.putDouble(ring(2 * k)); b.putDouble(ring(2 * k + 1)); k += 1
          }
          b.putDouble(ring(0)); b.putDouble(ring(1)) // close the ring
        }
        (r0.recordNum, b.array())
      }
    }
    val totalBytes = 100 + bodies.map(8 + _._2.length).sum
    val buf = ByteBuffer.allocate(totalBytes)
    buf.order(ByteOrder.BIG_ENDIAN)
    buf.putInt(FileCode); buf.position(24); buf.putInt(totalBytes / 2)
    buf.order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Version); buf.putInt(PolygonType)
    val written = records.flatMap(_.rings.filter(_.length >= 6))
    val allX = written.flatMap(_.grouped(2).map(_(0)))
    val allY = written.flatMap(_.grouped(2).map(_(1)))
    if (allX.nonEmpty) {
      buf.putDouble(allX.min); buf.putDouble(allY.min)
      buf.putDouble(allX.max); buf.putDouble(allY.max)
    } else buf.position(buf.position() + 32)
    buf.position(100)
    bodies.foreach { case (num, body) =>
      buf.order(ByteOrder.BIG_ENDIAN)
      buf.putInt(num); buf.putInt(body.length / 2)
      buf.put(body)
    }
    buf.array()
  }

  def writeFile(path: String, records: Seq[ShpRecord]): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, write(records))
  }

  /** Distributed scan over a directory of .shp files: Spark's binaryFile
    * source lists + distributes the files; each file parses inside the
    * scan. Output (path, record_num, rings ARRAY<ARRAY<DOUBLE>>). */
  def readTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").option("pathGlobFilter", "*.shp").load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parse(bytes).map(r => (path, r.recordNum, r.rings))
      }
      .toDF("path", "record_num", "rings")
  }
}
