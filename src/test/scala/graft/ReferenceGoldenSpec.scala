package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.{Geom, Raster}

/** Parity against the REFERENCE's own golden serialized-geometry
  * fixture — the 387-instance COCO file from
  * /root/reference/tests/unit/5c15321f63d9810007f8b06f_10_00000.json
  * (ported as test data per SURVEY.md §5; written by the reference's
  * postprocess/processedinstance.py:339-428). Our compressed-RLE codec
  * must decode every annotation, the decoded masks must be
  * self-consistent with the fixture's own bbox/size fields, and
  * re-encoding must reproduce the reference's counts strings
  * byte-for-byte. */
class ReferenceGoldenSpec extends AnyFunSuite {

  // minimal JSON walking (the file is well-formed, flat-ish)
  private lazy val raw = new String(java.nio.file.Files.readAllBytes(
    java.nio.file.Paths.get("src/test/resources/reference_golden_coco.json")),
    java.nio.charset.StandardCharsets.UTF_8)

  private case class Ann(id: Long, categoryId: Int, score: Double,
                         bbox: Array[Double], area: Double,
                         rows: Int, cols: Int, counts: String)

  private lazy val annotations: Seq[Ann] = {
    val body = raw.substring(raw.indexOf("\"annotations\""))
    // the reference writes json.dump(indent=1) — whitespace-tolerant
    val recRe = ("""(?s)\{\s*"id":\s*(\d+),\s*"image_id":\s*\d+,\s*""" +
      """"category_id":\s*(\d+),\s*"score":\s*([0-9.eE+-]+),\s*""" +
      """"label":\s*[^,]+,\s*"bbox":\s*\[([^\]]*)\],\s*""" +
      """"area":\s*([0-9.eE+-]+),\s*"segmentation":\s*\{\s*""" +
      """"size":\s*\[\s*(\d+),\s*(\d+)\s*\],\s*"counts":\s*"([^"]*)"""").r
    val out = recRe.findAllMatchIn(body).map { m =>
      Ann(m.group(1).toLong, m.group(2).toInt, m.group(3).toDouble,
        m.group(4).split(",").map(_.trim.toDouble), m.group(5).toDouble,
        m.group(6).toInt, m.group(7).toInt,
        // RLE chars span ASCII 48..111 which includes backslash (92) —
        // JSON-escaped in the raw text
        m.group(8).replace("\\\\", "\\"))
    }.toSeq
    require(out.nonEmpty, "fixture parse produced no annotations")
    out
  }

  test("all 387 reference annotations parse") {
    assert(annotations.size === 387)
    assert(annotations.map(_.categoryId).toSet === Set(0, 1))
  }

  test("compressed RLE decodes: counts sum to size, mask area ≈ bbox-bounded") {
    annotations.foreach { a =>
      val counts = Raster.rleFromCocoString(a.counts)
      assert(counts.sum === a.rows * a.cols,
        s"ann ${a.id}: counts sum ${counts.sum} != ${a.rows * a.cols}")
      val mask = Raster.rleDecode(counts, a.rows, a.cols)
      val nz = mask.count(_ != 0)
      assert(nz > 0 && nz <= a.rows * a.cols)
      // size == bbox h/w (the local mask covers the instance bbox)
      assert(a.rows === a.bbox(3).toInt && a.cols === a.bbox(2).toInt)
    }
  }

  test("re-encoding reproduces the reference counts strings byte-for-byte") {
    annotations.foreach { a =>
      val counts = Raster.rleFromCocoString(a.counts)
      assert(Raster.rleToCocoString(counts) === a.counts, s"ann ${a.id}")
    }
  }

  test("our merge pipeline runs end-to-end ON the reference's instances") {
    // reference instances → our Crown model (polygon = traced dominant
    // component in global coords) → NMS + dissolve/split merge with the
    // reference CLI defaults (merge.py:235: conf 0.35, iou 0.1; NMS 0.7)
    val crowns = annotations.flatMap { a =>
      val counts = Raster.rleFromCocoString(a.counts)
      val mask = Raster.rleDecode(counts, a.rows, a.cols)
      Raster.vectorize(mask, a.rows, a.cols).sortBy(-Geom.area(_)).headOption.map { local =>
        val poly = Geom.translate(local, a.bbox(0), a.bbox(1))
        val bb = Geom.BBox.ofPolygon(poly)
        graft.operators.CrownOps.Crown(0L, a.id, a.id, 0L, a.categoryId,
          a.score, bb.minX, bb.minY, bb.maxX, bb.maxY, poly)
      }
    }.toIndexedSeq
    assert(crowns.size === 387)
    val merged = Seq(0, 1).flatMap { cls =>
      val kept = graft.operators.CrownOps.nmsLocal(
        crowns.filter(_.classIdx == cls), 0.7)
      graft.operators.CrownOps.mergeLocal(kept, cls, confThr = 0.35, iouThr = 0.1)
    }
    assert(merged.nonEmpty && merged.size < 387) // NMS/conf/merge reduce
    // deterministic: same counts on re-run (regression anchor)
    val again = Seq(0, 1).flatMap { cls =>
      graft.operators.CrownOps.mergeLocal(graft.operators.CrownOps.nmsLocal(
        crowns.filter(_.classIdx == cls), 0.7), cls, 0.35, 0.1)
    }
    assert(merged.map(_.ids.sorted).toSet === again.map(_.ids.sorted).toSet)
    // every merged instance's members come from the fixture's id space
    merged.foreach(_.ids.foreach(id => assert(id >= 0 && id < 387)))
  }

  test("decoded masks round-trip EXACTLY through hole-aware vectorize") {
    annotations.foreach { a =>
      val counts = Raster.rleFromCocoString(a.counts)
      val mask = Raster.rleDecode(counts, a.rows, a.cols)
      val comps = Raster.vectorizeWithHoles(mask, a.rows, a.cols)
      assert(comps.nonEmpty, s"ann ${a.id} vectorizes to nothing")
      // even-odd re-rasterization of ALL rings (outers + holes) must
      // reproduce the decoded mask pixel-for-pixel
      val rt = Raster.rasterizeRings(comps.flatten, a.rows, a.cols)
      val nzOrig = mask.count(_ != 0)
      val nzRt = rt.count(_ != 0)
      assert(nzRt === nzOrig, s"ann ${a.id}: traced $nzRt != original $nzOrig")
      assert(java.util.Arrays.equals(rt, mask), s"ann ${a.id}: pixel mismatch")
    }
  }
}
