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

  /** One merged crown → canonical JSON (fixed field order). `geom` is
    * the dissolved union's ring set (even-odd; holes included),
    * `perimeter` its total ring length — merge.py:196-205 writes the
    * merged geometry with area/perimeter properties the same way. */
  def mergedToJson(m: MergedCrown): String = {
    val parts = m.parts.map(polyToWkt).map(w => "\"" + w + "\"").mkString("[", ",", "]")
    val geom = m.geom.map(polyToWkt).map(w => "\"" + w + "\"").mkString("[", ",", "]")
    val (rows, cols, rle) = polyRle(m.parts.head)
    s"""{"region":${m.region},"class_idx":${m.classIdx},""" +
      s""""member_ids":${m.memberIds.mkString("[", ",", "]")},""" +
      s""""score":${fmt(m.score)},"scores":${m.scores.map(fmt).mkString("[", ",", "]")},""" +
      s""""bbox":[${fmt(m.minX)},${fmt(m.minY)},${fmt(m.maxX)},${fmt(m.maxY)}],""" +
      s""""area":${fmt(m.area)},"perimeter":${fmt(m.perimeter)},""" +
      s""""geom":$geom,"geoms":$parts,""" +
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
    * processedinstance.py:246-322 `from_coco_dict`): BOTH segmentation
    * branches — `{"size":[r,c],"counts":<list|compressed-string>}` (RLE,
    * iscrowd=1) and flat/nested polygon coordinate lists (iscrowd=0,
    * from_coco_dict:303-310) — plus the optional `class_scores` vector
    * (score := max(class_scores), processedinstance.py:80-87) and
    * `label`. `mask` is always populated (polygon branch rasterizes
    * even-odd over the bbox-snapped grid); `segPolys` holds the raw
    * polygon rings when the record was polygon-encoded. */
  final case class CocoRecord(id: Long, imageId: Long, categoryId: Int,
                              score: Double, classScores: Array[Double],
                              label: Option[Long], bbox: Array[Double],
                              area: Double, iscrowd: Int, isGlobal: Boolean,
                              maskRows: Int, maskCols: Int, mask: Array[Byte],
                              segPolys: Seq[Array[Double]])

  /** Quote-aware raw-value scan: from `start`, consume one JSON value
    * (string / object / array / scalar) and return its raw text. The
    * depth counter ignores brackets inside strings — compressed RLE
    * counts strings legitimately contain `]` (alphabet 48..111). */
  private def scanValue(line: String, start: Int): String = {
    var j = start
    var depth = 0
    var inStr = false
    var done = false
    while (j < line.length && !done) {
      val ch = line(j)
      if (inStr) {
        if (ch == '\\') j += 1 // skip escaped char
        else if (ch == '"') inStr = false
      } else ch match {
        case '"' => inStr = true
        case '[' | '{' => depth += 1
        case ']' | '}' =>
          if (depth == 0) done = true else depth -= 1
        case ',' if depth == 0 => done = true
        case _ =>
      }
      if (!done) j += 1
    }
    line.substring(start, j)
  }

  private def jsonUnescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(s.charAt(i + 1)); i += 2 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def cocoFromJson(line: String): CocoRecord = {
    def grabOpt(key: String): Option[String] = {
      val i = line.indexOf("\"" + key + "\":")
      if (i < 0) None else Some(scanValue(line, i + key.length + 3).trim)
    }
    def grab(key: String): String =
      grabOpt(key).getOrElse(sys.error(s"missing $key"))
    def nums(s: String): Array[Double] =
      s.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim).filter(_.nonEmpty).map(_.toDouble)
    val bbox = nums(grab("bbox"))
    val classScores = grabOpt("class_scores").map(nums).getOrElse(Array.emptyDoubleArray)
    val rawScore = grabOpt("score").map(_.toDouble).getOrElse(1.0)
    val score = if (classScores.nonEmpty) classScores.max else rawScore
    val label = grabOpt("label").filter(_.matches("-?\\d+")).map(_.toLong)
    val iscrowd = grabOpt("iscrowd").map(_.toInt).getOrElse(0)
    val isGlobal = grabOpt("global").forall(v => v == "true" || v == "1")
    val area = grabOpt("area").map(_.toDouble).getOrElse(0.0)
    val seg = grab("segmentation")

    val (rows, cols, mask, segPolys) =
      if (seg.startsWith("{")) { // RLE branch
        val size = nums(scanValue(seg, seg.indexOf("\"size\":") + 7))
        val rows = size(0).toInt; val cols = size(1).toInt
        val countsRaw = scanValue(seg, seg.indexOf("\"counts\":") + 9).trim
        val counts =
          if (countsRaw.startsWith("\"")) // compressed string (pycocotools)
            Raster.rleFromCocoString(jsonUnescape(countsRaw.stripPrefix("\"").stripSuffix("\"")))
          else nums(countsRaw).map(_.toInt)
        (rows, cols, Raster.rleDecode(counts, rows, cols), Seq.empty[Array[Double]])
      } else { // polygon branch: flat [x,y,...] or nested [[x,y,...],...]
        val inner = seg.stripPrefix("[").stripSuffix("]").trim
        val rings: Seq[Array[Double]] =
          if (inner.startsWith("[")) // nested rings
            inner.split("\\]\\s*,\\s*\\[").toSeq.map(nums)
          else Seq(nums(seg))
        // local mask over the bbox-snapped grid (same snap as polyRle)
        val minX = bbox(0); val minY = bbox(1)
        val rows = math.max(1, math.ceil(minY + bbox(3) - math.floor(minY)).toInt)
        val cols = math.max(1, math.ceil(minX + bbox(2) - math.floor(minX)).toInt)
        val local = rings.map(Geom.translate(_, -math.floor(minX), -math.floor(minY)))
        (rows, cols, Raster.rasterizeRings(local, rows, cols), rings)
      }

    CocoRecord(grab("id").toLong, grab("image_id").toLong,
      grab("category_id").toInt, score, classScores, label, bbox,
      area, iscrowd, isGlobal, rows, cols, mask, segPolys)
  }

  /** Canonical writer for a [[CocoRecord]] (reference field order,
    * to_coco_dict processedinstance.py:446-520): polygon records emit
    * the polygon branch (flat coords for one ring, nested for many);
    * mask records emit compressed-string RLE. [[cocoFromJson]] of the
    * output reproduces the input record; re-serializing reproduces the
    * bytes (round-trip tested). */
  def cocoToJson(rec: CocoRecord): String = {
    val sb = new StringBuilder
    sb.append(s"""{"id":${rec.id},"image_id":${rec.imageId},""")
    sb.append(s""""category_id":${rec.categoryId},"score":${fmt(rec.score)},""")
    if (rec.classScores.nonEmpty)
      sb.append(s""""class_scores":${rec.classScores.map(fmt).mkString("[", ",", "]")},""")
    rec.label.foreach(l => sb.append(s""""label":$l,"""))
    sb.append(s""""bbox":${rec.bbox.map(fmt).mkString("[", ",", "]")},""")
    sb.append(s""""area":${fmt(rec.area)},""")
    if (rec.segPolys.nonEmpty) {
      val seg =
        if (rec.segPolys.size == 1) rec.segPolys.head.map(fmt).mkString("[", ",", "]")
        else rec.segPolys.map(_.map(fmt).mkString("[", ",", "]")).mkString("[", ",", "]")
      sb.append(s""""segmentation":$seg,""")
    } else {
      val counts = Raster.rleToCocoString(
        Raster.rleEncode(rec.mask, rec.maskRows, rec.maskCols))
      val esc = counts.replace("\\", "\\\\").replace("\"", "\\\"")
      sb.append(s""""segmentation":{"size":[${rec.maskRows},${rec.maskCols}],"counts":"$esc"},""")
    }
    // iscrowd/global come from the RECORD (COCO allows e.g. iscrowd=0
    // with RLE) — round-trip fidelity beats branch defaults
    sb.append(s""""iscrowd":${rec.iscrowd},"global":${rec.isGlobal}}""")
    sb.toString
  }

  /** Raw crown → COCO-flavored JSON record (reference field order:
    * processedinstance.py:446-520; class_scores emitted when the crown
    * carries a per-class vector, :369-370). */
  def crownToCocoJson(c: Crown): String = {
    val (rows, cols, rle) = polyRle(c.poly)
    val cs = if (c.classScores.isEmpty) ""
      else s""""class_scores":${c.classScores.map(fmt).mkString("[", ",", "]")},"""
    s"""{"id":${c.crownId},"image_id":${c.region},"category_id":${c.classIdx},""" +
      s""""score":${fmt(c.score)},$cs"bbox":[${fmt(c.minX)},${fmt(c.minY)},""" +
      s"""${fmt(c.maxX - c.minX)},${fmt(c.maxY - c.minY)}],""" +
      s""""area":${fmt(Geom.area(c.poly))},""" +
      s""""segmentation":{"size":[$rows,$cols],"counts":${rle.mkString("[", ",", "]")}},""" +
      s""""iscrowd":1,"global":false}""" // RLE = iscrowd 1, local mask = global 0
  }
}
