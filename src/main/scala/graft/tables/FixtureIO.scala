package graft.tables

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.geom.{Geom, Raster}
import graft.operators.CrownOps.{Crown, MergedCrown}

/** Canonical serialized-geometry fixtures (JSON lines, fixed field
  * order, deterministic float formatting) — the engine's analogue of
  * the reference's COCO golden file
  * (/root/reference/tests/unit/5c15321f63d9810007f8b06f_10_00000.json,
  * written by postprocess/processedinstance.py:339-428): id, class,
  * scores, bbox, canonical polygon WKT, and the COCO-style column-major
  * RLE of the polygon's local mask. Writer output is byte-stable: any
  * semantic drift in the pipeline breaks the committed goldens.
  */
object FixtureIO {

  /** Deterministic double rendering: up to 6 significant decimals,
    * trailing zeros trimmed (locale-free). */
  def fmt(d: Double): String = {
    if (d == d.toLong.toDouble) d.toLong.toString
    else {
      val s = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .stripTrailingZeros().toPlainString
      s
    }
  }

  def polyToWkt(coords: Array[Double]): String =
    coords.grouped(2).map(p => s"${fmt(p(0))} ${fmt(p(1))}")
      .mkString("POLYGON ((", ", ", "))")

  def wktToPoly(wkt: String): Array[Double] = {
    val inner = wkt.stripPrefix("POLYGON ((").stripSuffix("))")
    inner.split(", ").flatMap { p =>
      val Array(x, y) = p.split(" ")
      Array(x.toDouble, y.toDouble)
    }
  }

  /** RLE of the polygon's mask over its integer-snapped bbox. */
  def polyRle(poly: Array[Double]): (Int, Int, Array[Int]) = {
    val bb = Geom.BBox.ofPolygon(poly)
    val rows = math.max(1, math.ceil(bb.maxY - math.floor(bb.minY)).toInt)
    val cols = math.max(1, math.ceil(bb.maxX - math.floor(bb.minX)).toInt)
    val local = Geom.translate(poly, -math.floor(bb.minX), -math.floor(bb.minY))
    val mask = Raster.rasterize(local, rows, cols)
    (rows, cols, Raster.rleEncode(mask, rows, cols))
  }

  /** One merged crown → canonical JSON (fixed field order). */
  def mergedToJson(m: MergedCrown): String = {
    val parts = m.parts.map(polyToWkt).map(w => "\"" + w + "\"").mkString("[", ",", "]")
    val (rows, cols, rle) = polyRle(m.parts.head)
    s"""{"region":${m.region},"class_idx":${m.classIdx},""" +
      s""""member_ids":${m.memberIds.mkString("[", ",", "]")},""" +
      s""""score":${fmt(m.score)},"scores":${m.scores.map(fmt).mkString("[", ",", "]")},""" +
      s""""bbox":[${fmt(m.minX)},${fmt(m.minY)},${fmt(m.maxX)},${fmt(m.maxY)}],""" +
      s""""area":${fmt(m.area)},"geoms":$parts,""" +
      s""""rle":{"size":[$rows,$cols],"counts":${rle.mkString("[", ",", "]")}}}"""
  }

  /** Canonical fixture file: one JSON line per merged crown, sorted by
    * (region, class, first member id) — parallelism-independent bytes. */
  def writeMergedFixture(path: String, crowns: Seq[MergedCrown]): Unit = {
    val lines = crowns.sortBy(m => (m.region, m.classIdx, m.memberIds.min))
      .map(mergedToJson)
    Files.createDirectories(Paths.get(path).getParent)
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))
  }

  def readFixtureLines(path: String): Seq[String] = {
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
      .split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Parse a COCO-flavored record back (S4 source path,
    * processedinstance.py:246-322 `from_coco_dict`): id, category,
    * score, bbox, and the RLE mask decoded to local-mask bytes. */
  final case class CocoRecord(id: Long, imageId: Long, categoryId: Int,
                              score: Double, bbox: Array[Double],
                              maskRows: Int, maskCols: Int, mask: Array[Byte])

  def cocoFromJson(line: String): CocoRecord = {
    def grab(key: String): String = {
      val i = line.indexOf("\"" + key + "\":")
      require(i >= 0, s"missing $key")
      val start = i + key.length + 3
      var depth = 0
      var j = start
      while (j < line.length && (depth > 0 ||
          (line(j) != ',' && line(j) != '}'))) {
        if (line(j) == '[' || line(j) == '{') depth += 1
        if (line(j) == ']' || line(j) == '}') depth -= 1
        j += 1
      }
      line.substring(start, j)
    }
    def nums(s: String): Array[Double] =
      s.stripPrefix("[").stripSuffix("]").split(",").filter(_.nonEmpty).map(_.toDouble)
    val seg = grab("segmentation")
    val size = nums(seg.substring(seg.indexOf("[") , seg.indexOf("]") + 1))
    val countsStr = seg.substring(seg.indexOf("counts\":[") + 8)
    val counts = nums(countsStr.substring(0, countsStr.indexOf("]") + 1)).map(_.toInt)
    val rows = size(0).toInt; val cols = size(1).toInt
    CocoRecord(grab("id").toLong, grab("image_id").toLong,
      grab("category_id").toInt, grab("score").toDouble, nums(grab("bbox")),
      rows, cols, Raster.rleDecode(counts, rows, cols))
  }

  /** Raw crown → COCO-flavored JSON record (reference field order:
    * processedinstance.py:446-520). */
  def crownToCocoJson(c: Crown): String = {
    val (rows, cols, rle) = polyRle(c.poly)
    s"""{"id":${c.crownId},"image_id":${c.region},"category_id":${c.classIdx},""" +
      s""""score":${fmt(c.score)},"bbox":[${fmt(c.minX)},${fmt(c.minY)},""" +
      s"""${fmt(c.maxX - c.minX)},${fmt(c.maxY - c.minY)}],""" +
      s""""area":${fmt(Geom.area(c.poly))},""" +
      s""""segmentation":{"size":[$rows,$cols],"counts":${rle.mkString("[", ",", "]")}},""" +
      s""""iscrowd":0,"global":true}"""
  }
}
