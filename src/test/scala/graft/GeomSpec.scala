package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.geom.{Geom, Raster}
import graft.geom.Geom.BBox

/** Pure-kernel goldens + properties. Mirrors the reference's geometry
  * round-trip strategy (tests/unit/util.py:16-76 `random_polygon` =
  * convex hull of random points; test_cache.py IoU>0.99 round-trips). */
class GeomSpec extends AnyFunSuite {

  // scalatestplus isn't in the offline cache; sample seeded ScalaCheck
  // generators directly for deterministic property-style checks.
  private def forSamples[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
      i += 1
    }
  }

  private val unitSquare = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)

  test("shoelace area and centroid of a square") {
    assert(Geom.area(unitSquare) === 100.0)
    val (cx, cy) = Geom.centroid(unitSquare)
    assert(math.abs(cx - 5.0) < 1e-12 && math.abs(cy - 5.0) < 1e-12)
  }

  test("ray-casting point-in-polygon") {
    assert(Geom.containsPoint(unitSquare, 5.0, 5.0))
    assert(!Geom.containsPoint(unitSquare, 15.0, 5.0))
    assert(!Geom.containsPoint(unitSquare, -1.0, 5.0))
    // concave L-shape
    val ell = Array(0.0, 0.0, 10.0, 0.0, 10.0, 4.0, 4.0, 4.0, 4.0, 10.0, 0.0, 10.0)
    assert(Geom.containsPoint(ell, 2.0, 8.0))
    assert(!Geom.containsPoint(ell, 8.0, 8.0))
  }

  test("intersects is touch-inclusive (shapely semantics): collinear edge contact counts") {
    // ROI mostly inside the instance, but its first vertex sits ON the
    // instance boundary and all edge contact is collinear/endpoint —
    // a strict-crossing test returns false and drops a genuinely
    // overlapping instance
    val inst = unitSquare // [0,10]²
    val roi = Array(10.0, 2.0, 10.0, 8.0, 5.0, 8.0, 5.0, 2.0)
    assert(Geom.intersects(inst, roi) && Geom.intersects(roi, inst))
    // edge-adjacent squares touch (shapely intersects=true for touching)
    val right = Array(10.0, 0.0, 20.0, 0.0, 20.0, 10.0, 10.0, 10.0)
    assert(Geom.intersects(inst, right))
    // corner-touching squares touch
    val corner = Array(10.0, 10.0, 20.0, 10.0, 20.0, 20.0, 10.0, 20.0)
    assert(Geom.intersects(inst, corner))
    // fully disjoint stays false
    val far = Array(30.0, 30.0, 40.0, 30.0, 40.0, 40.0, 30.0, 40.0)
    assert(!Geom.intersects(inst, far))
  }

  test("convex hull of points inside a square is the square") {
    val pts = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0, 5.0, 5.0, 3.0, 7.0)
    val hull = Geom.convexHull(pts)
    assert(hull.length === 8)
    assert(Geom.area(hull) === 100.0)
  }

  test("convex clip: overlapping squares") {
    val a = unitSquare
    val b = Array(5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0)
    val inter = Geom.clipConvex(a, Geom.ccw(b))
    assert(math.abs(Geom.area(inter) - 25.0) < 1e-9)
    val iou = Geom.iouConvex(a, b)
    assert(math.abs(iou - 25.0 / 175.0) < 1e-9)
  }

  test("bbox IoU matches polygon IoU for axis-aligned boxes") {
    val bA = BBox(0, 0, 10, 10)
    val bB = BBox(5, 5, 15, 15)
    assert(math.abs(bA.iou(bB) - 25.0 / 175.0) < 1e-12)
    assert(bA.iou(BBox(20, 20, 30, 30)) === 0.0)
  }

  test("intersects: disjoint, overlapping, contained") {
    val a = unitSquare
    assert(Geom.intersects(a, Array(5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0)))
    assert(!Geom.intersects(a, Array(20.0, 20.0, 30.0, 20.0, 30.0, 30.0, 20.0, 30.0)))
    assert(Geom.intersects(a, Array(2.0, 2.0, 3.0, 2.0, 3.0, 3.0, 2.0, 3.0))) // contained
  }

  test("simplify keeps endpoints and drops collinear points") {
    val line = Array(0.0, 0.0, 5.0, 0.1, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)
    val simp = Geom.simplify(line, 1.0)
    assert(simp.length < line.length)
  }

  test("affine round trip") {
    val (a, b, d, e, xo, yo) = (0.1, 0.0, 0.0, -0.1, 100.0, 200.0)
    val world = Geom.affine(unitSquare, a, b, d, e, xo, yo)
    val (ia, ib, id_, ie, ixo, iyo) = Geom.affineInverse(a, b, d, e, xo, yo)
    val back = Geom.affine(world, ia, ib, id_, ie, ixo, iyo)
    unitSquare.zip(back).foreach { case (u, v) => assert(math.abs(u - v) < 1e-9) }
  }

  // --- property tests over random convex polygons (reference util.py style)
  private val genConvex: Gen[Array[Double]] = for {
    n <- Gen.choose(3, 10)
    cx <- Gen.choose(200.0, 1800.0)
    cy <- Gen.choose(200.0, 1800.0)
    pts <- Gen.listOfN(2 * n, Gen.choose(-100.0, 100.0))
  } yield Geom.convexHull(
    pts.grouped(2).flatMap { case List(dx, dy) => List(cx + dx, cy + dy) }.toArray)

  test("property: IoU(a,a) == 1, symmetric, in [0,1]") {
    forSamples(Gen.zip(genConvex, genConvex)) { case (a, b) =>
      if (a.length >= 6 && b.length >= 6) {
        assert(math.abs(Geom.iouConvex(a, a) - 1.0) < 1e-9)
        val ab = Geom.iouConvex(a, b)
        val ba = Geom.iouConvex(b, a)
        assert(math.abs(ab - ba) < 1e-9)
        assert(ab >= 0.0 && ab <= 1.0 + 1e-12)
      }
    }
  }

  test("property: centroid inside convex polygon") {
    forSamples(genConvex) { a =>
      if (a.length >= 6 && Geom.area(a) > 1.0) {
        val (cx, cy) = Geom.centroid(a)
        assert(Geom.containsPoint(a, cx, cy))
      }
    }
  }

  test("property: exact convex IoU agrees with independent rasterized IoU") {
    // two independent implementations (clipping + inclusion-exclusion
    // vs supersampled masks) must agree — cross-validates both kernels
    forSamples(Gen.zip(genConvex, genConvex), n = 120) { case (a0, b0) =>
      if (a0.length >= 6 && b0.length >= 6) {
        // supersample 4x for mask accuracy
        val a = Geom.affine(a0, 4, 0, 0, 4, 0, 0)
        val b = Geom.affine(b0, 4, 0, 0, 4, 0, 0)
        val exact = Geom.iouConvex(a, b)
        val bb = BBox.ofPolygon(a).union(BBox.ofPolygon(b))
        val rows = math.ceil(bb.maxY - bb.minY).toInt + 2
        val cols = math.ceil(bb.maxX - bb.minX).toInt + 2
        val ma = Raster.rasterize(Geom.translate(a, -bb.minX, -bb.minY), rows, cols)
        val mb = Raster.rasterize(Geom.translate(b, -bb.minX, -bb.minY), rows, cols)
        var inter = 0; var union = 0
        var i = 0
        while (i < ma.length) {
          if (ma(i) != 0 && mb(i) != 0) inter += 1
          if (ma(i) != 0 || mb(i) != 0) union += 1
          i += 1
        }
        val approx = if (union == 0) 0.0 else inter.toDouble / union
        assert(math.abs(exact - approx) < 0.05,
          s"exact $exact vs rasterized $approx")
      }
    }
  }

  test("property: point in clipConvex(a,b) iff in both a and b") {
    forSamples(Gen.zip(genConvex, genConvex, Gen.choose(100.0, 1900.0),
      Gen.choose(100.0, 1900.0)), n = 200) { case (a, b, px, py) =>
      if (a.length >= 6 && b.length >= 6) {
        val inter = Geom.clipConvex(a, Geom.ccw(b))
        if (inter.length >= 6) {
          val inBoth = Geom.containsPoint(a, px, py) && Geom.containsPoint(b, px, py)
          val inClip = Geom.containsPoint(inter, px, py)
          // allow boundary fuzz: only assert when the point is clearly
          // inside/outside (distance to any edge > 0.01 not computed —
          // mismatches at exact boundaries are acceptable; assert the
          // strong direction)
          if (inClip) assert(inBoth || {
            // point may sit within 1e-9 of a boundary; re-check with jitter
            Geom.containsPoint(a, px + 1e-7, py + 1e-7) &&
            Geom.containsPoint(b, px + 1e-7, py + 1e-7)
          })
        }
      }
    }
  }

  // --- raster kernels
  test("rasterize square: area matches") {
    val mask = Raster.rasterize(unitSquare, 12, 12)
    assert(mask.map(_.toInt).sum === 100)
  }

  test("RLE round trip (COCO column-major)") {
    val mask = Raster.rasterize(Array(2.0, 3.0, 9.0, 3.0, 9.0, 8.0, 2.0, 8.0), 10, 12)
    val counts = Raster.rleEncode(mask, 10, 12)
    val back = Raster.rleDecode(counts, 10, 12)
    assert(mask.sameElements(back))
    assert(counts.sum === 120)
  }

  test("property: rasterize→RLE→decode round trip on random convex polys") {
    forSamples(genConvex) { a =>
      if (a.length >= 6) {
        val bb = BBox.ofPolygon(a)
        val local = Geom.translate(a, -bb.minX, -bb.minY)
        val rows = math.ceil(bb.height).toInt + 1
        val cols = math.ceil(bb.width).toInt + 1
        val mask = Raster.rasterize(local, rows, cols)
        val rt = Raster.rleDecode(Raster.rleEncode(mask, rows, cols), rows, cols)
        assert(mask.sameElements(rt))
      }
    }
  }

  test("union area: disjoint adds, identical dedups") {
    val a = unitSquare
    val b = Geom.translate(unitSquare, 20.0, 0.0)
    val bb = BBox.ofPolygon(a).union(BBox.ofPolygon(b))
    assert(math.abs(Raster.unionArea(Seq(a, b), bb) - 200.0) < 1e-9)
    assert(math.abs(Raster.unionArea(Seq(a, a), BBox.ofPolygon(a)) - 100.0) < 1e-9)
  }

  test("paste max merge") {
    val dst = new Array[Byte](25)
    val src = Array.fill[Byte](4)(3)
    Raster.paste(dst, 5, 5, src, 2, 2, 1, 1, 1)
    assert(dst(6) === 3 && dst(7) === 3 && dst(11) === 3 && dst(12) === 3)
    val src2 = Array.fill[Byte](4)(2)
    Raster.paste(dst, 5, 5, src2, 2, 2, 1, 1, 1) // max keeps 3
    assert(dst(6) === 3)
  }

  test("connected components + vectorize round trip") {
    // two disjoint squares in one mask
    val mask = new Array[Byte](100)
    for (r <- 1 to 3; c <- 1 to 3) mask(r * 10 + c) = 1
    for (r <- 6 to 8; c <- 6 to 8) mask(r * 10 + c) = 1
    val labels = Raster.connectedComponents(mask, 10, 10)
    assert(labels.max === 2)
    val polys = Raster.vectorize(mask, 10, 10)
    assert(polys.size === 2)
    assert(math.abs(Geom.area(polys.head) - 9.0) < 1e-9)
    // re-rasterizing the traced boundary reproduces the component
    val rt = Raster.rasterize(polys.head, 10, 10)
    val expected = mask.zipWithIndex.count { case (v, i) => v == 1 && labels(i) == 1 }
    assert(rt.map(_.toInt).sum === expected)
  }

  test("vectorizeWithHoles: donut round-trips exactly; hole area carved out") {
    // 8×8 ring: filled 1..6 square with a 3..4 hole (donut)
    val mask = new Array[Byte](100)
    for (r <- 1 to 6; c <- 1 to 6) mask(r * 10 + c) = 1
    for (r <- 3 to 4; c <- 3 to 4) mask(r * 10 + c) = 0
    val comps = Raster.vectorizeWithHoles(mask, 10, 10)
    assert(comps.size === 1)
    assert(comps.head.size === 2, "one outer + one hole ring")
    val rt = Raster.rasterizeRings(comps.head, 10, 10)
    assert(java.util.Arrays.equals(rt, mask))
    // ring-traced areas are pixel-exact: outer 36, hole 4
    assert(math.abs(Geom.area(comps.head.head) - 36.0) < 1e-9)
    assert(math.abs(Geom.area(comps.head(1)) - 4.0) < 1e-9)
  }

  test("makeValid: bowtie resolves to its even-odd interior (buffer(0) analogue)") {
    // self-intersecting bowtie: (0,0)-(20,20)-(20,0)-(0,20) crosses at (10,10)
    val bowtie = Array(0.0, 0.0, 20.0, 20.0, 20.0, 0.0, 0.0, 20.0)
    val fixed = Raster.makeValid(Seq(bowtie))
    // lobes touch pixel-diagonally at the crossing, so the component
    // count is resolution-dependent — the CONTRACT is that the even-odd
    // interior is preserved and the output rings are pixel-boundary
    // traces (valid by construction)
    assert(fixed.nonEmpty)
    val raw = Raster.rasterize(bowtie, 20, 20)
    val rt = Raster.rasterizeRings(fixed.flatten, 20, 20)
    assert(java.util.Arrays.equals(rt, raw))
    // a valid convex ring passes through area-preserved (one component)
    val sq = Array(2.0, 2.0, 12.0, 2.0, 12.0, 12.0, 2.0, 12.0)
    val ok = Raster.makeValid(Seq(sq))
    assert(ok.size === 1 && ok.head.size === 1)
    assert(math.abs(Geom.area(ok.head.head) - 100.0) < 1e-9)
  }

  test("vectorizeWithHoles: diagonal-gap pocket is NOT a hole (bg 8-conn duality)") {
    // plus-shaped background around a center pixel: [[0,1,0],[1,0,1],[0,1,0]]
    // — the center bg pixel reaches the border through diagonal gaps, so
    // with the correct 8-connected background labeling it is NOT a hole
    val mask = new Array[Byte](9)
    mask(1) = 1; mask(3) = 1; mask(5) = 1; mask(7) = 1
    val comps = Raster.vectorizeWithHoles(mask, 3, 3)
    assert(comps.size === 4, "four separate 4-connected fg pixels")
    assert(comps.forall(_.size === 1), "no component has a hole")
    val rt = Raster.rasterizeRings(comps.flatten, 3, 3)
    assert(java.util.Arrays.equals(rt, mask))
  }

  test("vectorizeWithHoles: island inside a hole round-trips exactly") {
    // donut with a 1-px island in the middle of its hole
    val mask = new Array[Byte](121)
    for (r <- 0 to 8; c <- 0 to 8) mask(r * 11 + c) = 1
    for (r <- 2 to 6; c <- 2 to 6) mask(r * 11 + c) = 0
    mask(4 * 11 + 4) = 1 // island
    val comps = Raster.vectorizeWithHoles(mask, 11, 11)
    assert(comps.size === 2, "donut + island are separate components")
    val rt = Raster.rasterizeRings(comps.flatten, 11, 11)
    assert(java.util.Arrays.equals(rt, mask))
    // the island is hole-free; the donut has exactly one hole
    assert(comps.map(_.size).sorted === Seq(1, 2))
  }
}
