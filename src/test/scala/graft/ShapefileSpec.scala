package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Geom
import graft.tables.ShapefileIO
import graft.tables.ShapefileIO.ShpRecord

/** Binary ESRI shapefile source/sink (S5): spec-conformant header and
  * record layout, write→read round trip (coordinates bit-identical),
  * multi-ring (donut) records, and the distributed directory scan. */
class ShapefileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val square = Array(0.5, 0.5, 0.5, 10.5, 10.5, 10.5, 10.5, 0.5) // CW outer
  private val hole = Array(3.25, 3.25, 6.75, 3.25, 6.75, 6.75, 3.25, 6.75) // CCW hole

  test("write/parse round trip preserves record numbers, ring structure, exact coords") {
    val recs = Seq(
      ShpRecord(1, Seq(square)),
      ShpRecord(2, Seq(square.map(_ + 100.0), hole.map(_ + 100.0))),
      ShpRecord(3, Seq(Array(-5.75, -3.5, -5.75, 2.25, 1.5, 2.25))))
    val back = ShapefileIO.parse(ShapefileIO.write(recs))
    assert(back.map(_.recordNum) === Seq(1, 2, 3))
    assert(back.map(_.rings.size) === Seq(1, 2, 1))
    recs.zip(back).foreach { case (w, r) =>
      w.rings.zip(r.rings).foreach { case (a, b) => assert(a sameElements b) }
    }
  }

  test("header fields follow the spec (file code 9994 BE, version 1000 LE, type 5)") {
    val bytes = ShapefileIO.write(Seq(ShpRecord(1, Seq(square))))
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    assert(bb.getInt(0) === 9994)
    assert(bb.getInt(24) * 2 === bytes.length) // length in 16-bit words
    bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(28) === 1000 && bb.getInt(32) === 5)
    // header bbox
    assert(bb.getDouble(36) === 0.5 && bb.getDouble(52) === 10.5)
    // first record header: number 1 (BE) at offset 100
    bb.order(java.nio.ByteOrder.BIG_ENDIAN)
    assert(bb.getInt(100) === 1)
  }

  test("robustness: empty-ring records become Null Shapes; malformed bytes don't hang") {
    // ringless record (e.g. MergedCrown with emitGeom=false) → Null Shape
    val bytes = ShapefileIO.write(Seq(
      ShpRecord(1, Seq.empty), ShpRecord(2, Seq(square)), ShpRecord(3, Seq(Array(1.0, 2.0)))))
    val back = ShapefileIO.parse(bytes)
    assert(back.map(_.recordNum) === Seq(2)) // null shapes skipped on read
    // corrupt record header (negative content length) stops cleanly
    // instead of spinning or OOMing
    val good = ShapefileIO.write(Seq(ShpRecord(1, Seq(square)), ShpRecord(2, Seq(square))))
    val corrupt = good.clone()
    val firstLen = java.nio.ByteBuffer.wrap(good).getInt(104) // record 1 content words
    val rec2 = 100 + 8 + firstLen * 2
    java.nio.ByteBuffer.wrap(corrupt).putInt(rec2 + 4, -4)
    assert(ShapefileIO.parse(corrupt).map(_.recordNum) === Seq(1))
    // truncated file parses the complete prefix
    assert(ShapefileIO.parse(good.take(good.length - 10)).map(_.recordNum) === Seq(1))
    // corrupt polygon BODY (numPoints huge / negative): clean stop, no
    // giant allocation, no reading the next record's bytes as coords
    val bodyCorrupt = good.clone()
    val bb2 = java.nio.ByteBuffer.wrap(bodyCorrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb2.putInt(100 + 8 + 40, 1 << 30) // record 1 numPoints
    assert(ShapefileIO.parse(bodyCorrupt).isEmpty)
    bb2.putInt(100 + 8 + 40, -7)
    assert(ShapefileIO.parse(bodyCorrupt).isEmpty)
    // corrupt ring part OFFSET (negative / past numPoints): clean stop
    // instead of reading header bytes as coordinates
    val startsCorrupt = good.clone()
    val bb3 = java.nio.ByteBuffer.wrap(startsCorrupt).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb3.putInt(100 + 8 + 44, -5) // record 1 parts[0]
    assert(ShapefileIO.parse(startsCorrupt).isEmpty)
    bb3.putInt(100 + 8 + 44, 1 << 28)
    assert(ShapefileIO.parse(startsCorrupt).isEmpty)
  }

  test("pipeline geoms round trip through a shapefile (exact vertices)") {
    import spark.implicits._
    val crowns = graft.operators.CrownOps.synthesize(spark,
      graft.operators.GeoOps.assignTiles(graft.tables.PagesGen.pages(spark, 500)),
      graft.operators.GeoOps.TileGrid.Default)
    val merged = graft.operators.CrownOps.nmsMerge(spark, crowns, 0.7, 0.3, 0.5)
      .collect().take(50)
    // shapefile convention: outer rings CW — reverse the engine's CCW
    val recs = merged.zipWithIndex.map { case (m, i) =>
      ShpRecord(i + 1, m.geom.toSeq.map(r =>
        if (Geom.signedArea(r) > 0) Geom.reverseRing(r) else r))
    }.filter(_.rings.nonEmpty).toSeq
    val dir = java.nio.file.Files.createTempDirectory("shp").toString
    ShapefileIO.writeFile(s"$dir/crowns.shp", recs)
    val back = ShapefileIO.read(s"$dir/crowns.shp")
    assert(back.size === recs.size)
    recs.zip(back).foreach { case (w, r) =>
      w.rings.zip(r.rings).foreach { case (a, b) => assert(a sameElements b) }
    }
    // distributed scan over the directory
    val df = ShapefileIO.readTable(spark, dir)
    assert(df.count() === recs.size.toLong)
    val total = df.select("rings").collect().map(_.getSeq[scala.collection.Seq[Double]](0)
      .map(r => Geom.area(r.toArray)).sum).sum
    val expect = recs.flatMap(_.rings).map(Geom.area).sum
    assert(math.abs(total - expect) < 1e-6)
  }
}
