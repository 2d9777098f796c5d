package graft.geom

import scala.collection.mutable

/** Exact vector boolean operations on polygons (U2: geometric ∩/∪/−)
  * — the engine's counterpart of shapely's `unary_union`/`intersection`
  * /`difference` (reference scripts/merge.py:92, util.py:99-104),
  * re-created from the standard planar-overlay construction:
  *
  *   1. fragment every input edge at its intersections with every
  *      other edge (proper crossings, T-junctions, collinear overlaps);
  *   2. classify each undirected fragment by sampling the combined
  *      even-odd coverage of the input ring groups just left and just
  *      right of its midpoint — a fragment is on the result boundary
  *      iff `keep(coverage)` differs across it;
  *   3. orient boundary fragments interior-on-the-LEFT and re-trace
  *      closed rings (sharpest-left-turn walk at multi-degree
  *      vertices), so outer rings come out CCW and holes CW.
  *
  * Output vertices are EXACT: original input vertices pass through
  * bit-identical, and crossing vertices are the double-precision
  * line-line intersection points (no grid quantization — the vector
  * complement of Raster.makeValid's mask-space resolution).
  *
  * Semantics are even-odd throughout, matching the engine's rasterizer
  * (Raster.rasterizeRings) and ray-cast (Geom.containsPoint): a ring
  * group (`Seq[Array[Double]]`) is a polygon-with-holes under even-odd
  * parity of its rings, and a self-intersecting ring denotes its
  * even-odd interior.
  *
  * Scale notes: the overlay is near-linear for spread-out geometry —
  * intersection finding runs on a uniform bbox grid (O(E + K) for K
  * candidate pairs; degenerates to the exact O(E²) all-pairs scan only
  * when everything shares a cell) and boundary classification uses a
  * y-bucketed crossing index per group instead of a full ring scan per
  * sample. Both accelerations are bit-identical to the naive loops
  * (same pair arithmetic in the same order; same crossing test, which
  * is XOR-commutative). It remains a per-group LOCAL kernel (run
  * inside flatMapGroups on bounded region×class groups, like every
  * geometry kernel here), not a distributed operator. Classification
  * resolution is ~1e-8 of the coordinate magnitude; geometry thinner
  * than that is beyond a double overlay.
  */
object Overlay {

  /** n-ary union of independent polygons (each ring = one even-odd
    * polygon): shapely `unary_union` analogue. Returns traced rings,
    * outer CCW / holes CW; total area = Σ signedArea. */
  def union(polys: Seq[Array[Double]]): Seq[Array[Double]] =
    unionGroups(polys.map(Seq(_)).toIndexedSeq)

  /** n-ary union of polygon-with-holes groups (any-coverage keep) —
    * shared by [[union]] and the `st_union_agg` Aggregator. */
  def unionGroups(groups: IndexedSeq[Seq[Array[Double]]]): Seq[Array[Double]] =
    overlay(groups, cov => {
      var i = 0; var any = false
      while (!any && i < cov.length) { any = cov(i); i += 1 }
      any
    })

  /** Union of two polygons-with-holes. */
  def unionOf(a: Seq[Array[Double]], b: Seq[Array[Double]]): Seq[Array[Double]] =
    overlay(IndexedSeq(a, b), cov => cov(0) || cov(1))

  /** Intersection of two polygons-with-holes. */
  def intersection(a: Seq[Array[Double]], b: Seq[Array[Double]]): Seq[Array[Double]] =
    overlay(IndexedSeq(a, b), cov => cov(0) && cov(1))

  /** Difference a − b of two polygons-with-holes. */
  def difference(a: Seq[Array[Double]], b: Seq[Array[Double]]): Seq[Array[Double]] =
    overlay(IndexedSeq(a, b), cov => cov(0) && !cov(1))

  /** Even-odd resolution of one ring set (buffer(0) analogue for a
    * self-intersecting / pinched ring): re-traces the parity interior
    * with exact coordinates. */
  def resolve(rings: Seq[Array[Double]]): Seq[Array[Double]] =
    overlay(IndexedSeq(rings), cov => cov(0))

  /** Signed area of a traced result (outer CCW +, holes CW −). */
  def areaOf(rings: Seq[Array[Double]]): Double =
    rings.iterator.map(Geom.signedArea).sum

  /** Even-odd parity of `pt` across a ring group (polygon-with-holes
    * membership: inside an odd number of rings). */
  def parityInside(group: Seq[Array[Double]], px: Double, py: Double): Boolean = {
    var odd = false
    group.foreach(r => if (r.length >= 6 && Geom.containsPoint(r, px, py)) odd = !odd)
    odd
  }

  // -------------------------------------------------------------------

  /** y-bucketed crossing index over one even-odd ring group:
    * `parity(px, py)` reproduces [[parityInside]] bit-exactly. Group
    * parity = XOR over rings of [[Geom.containsPoint]] = XOR over ALL
    * the group's edges of the ray-crossing test, which is order-free,
    * so only the edges that can straddle the query's y (from a bucket
    * over the edge y-intervals) need evaluating — with the EXACT
    * current-vertex/previous-vertex operand roles of containsPoint so
    * the float arithmetic matches. Horizontal edges (yi == yj) never
    * pass the straddle test and are not indexed; rings under 3
    * vertices are skipped like parityInside does. */
  private final class GroupIndex(group: Seq[Array[Double]]) {
    // primitive arrays, not ArrayBuffer[Double] — parity() reads every
    // bucketed edge twice per fragment, and boxed access there costs an
    // unbox per coordinate on exactly the loop this index accelerates
    private val (xiA, yiA, xjA, yjA) = {
      val xiB = mutable.ArrayBuilder.make[Double]
      val yiB = mutable.ArrayBuilder.make[Double]
      val xjB = mutable.ArrayBuilder.make[Double]
      val yjB = mutable.ArrayBuilder.make[Double]
      group.foreach { r =>
        if (r.length >= 6) {
          val n = r.length / 2
          var i = 0
          var j = n - 1
          while (i < n) {
            val yi = r(2 * i + 1); val yj = r(2 * j + 1)
            if (yi != yj) {
              xiB += r(2 * i); yiB += yi
              xjB += r(2 * j); yjB += yj
            }
            j = i
            i += 1
          }
        }
      }
      (xiB.result(), yiB.result(), xjB.result(), yjB.result())
    }
    private val m = xiA.length
    private val (yMin, yMax) = {
      var lo = Double.PositiveInfinity; var hi = Double.NegativeInfinity
      var e = 0
      while (e < m) {
        lo = math.min(lo, math.min(yiA(e), yjA(e)))
        hi = math.max(hi, math.max(yiA(e), yjA(e)))
        e += 1
      }
      (lo, hi)
    }
    private val nb = math.max(1, math.min(m, 256))
    private val bh = if (yMax > yMin) (yMax - yMin) / nb else 1.0
    private def bucketOf(y: Double): Int =
      math.min(nb - 1, math.max(0, ((y - yMin) / bh).toInt))
    private val buckets: Array[Array[Int]] = {
      val bs = Array.fill(nb)(mutable.ArrayBuffer.empty[Int])
      var e = 0
      while (e < m) {
        var b = bucketOf(math.min(yiA(e), yjA(e)))
        val b1 = bucketOf(math.max(yiA(e), yjA(e)))
        while (b <= b1) { bs(b) += e; b += 1 }
        e += 1
      }
      bs.map(_.toArray)
    }

    def parity(px: Double, py: Double): Boolean = {
      if (m == 0 || py < yMin || py > yMax) return false
      var odd = false
      val ids = buckets(bucketOf(py))
      var k = 0
      while (k < ids.length) {
        val e = ids(k)
        val xi = xiA(e); val yi = yiA(e)
        val xj = xjA(e); val yj = yjA(e)
        if (((yi > py) != (yj > py)) &&
            (px < (xj - xi) * (py - yi) / (yj - yi) + xi)) odd = !odd
        k += 1
      }
      odd
    }
  }

  /** The overlay core. `groups(i)` is one even-odd ring group;
    * `keep(cov)` decides membership of a point covered by the groups
    * flagged in `cov`. Returns the traced boundary rings of the kept
    * region (interior-on-left orientation). */
  def overlay(groups: IndexedSeq[Seq[Array[Double]]],
              keep: Array[Boolean] => Boolean): Seq[Array[Double]] = {
    // ---- 1. collect edges
    val ax = mutable.ArrayBuffer.empty[Double]
    val ay = mutable.ArrayBuffer.empty[Double]
    val bx = mutable.ArrayBuffer.empty[Double]
    val by = mutable.ArrayBuffer.empty[Double]
    var scale = 1.0
    groups.foreach(_.foreach { r =>
      val n = r.length / 2
      if (n >= 3) {
        var i = 0
        while (i < n) {
          val j = if (i + 1 == n) 0 else i + 1
          val x1 = r(2 * i); val y1 = r(2 * i + 1)
          val x2 = r(2 * j); val y2 = r(2 * j + 1)
          scale = math.max(scale, math.max(math.abs(x1), math.abs(y1)))
          if (x1 != x2 || y1 != y2) { ax += x1; ay += y1; bx += x2; by += y2 }
          i += 1
        }
      }
    })
    val nE = ax.length
    if (nE == 0) return Seq.empty
    val weldEps = 1e-9 * scale

    // ---- 2. pairwise intersections → split params per edge.
    // Candidate pruning: a pair can only contribute a split when their
    // weldEps-expanded bboxes overlap — every split point the branches
    // below emit lies within weldEps of BOTH segments (non-parallel:
    // t,u inside [-tol, 1+tol] puts the shared point that close to
    // each span; collinear: each emitted point is an endpoint of one
    // edge projected inside the other's span). A uniform grid over the
    // expanded bboxes therefore enumerates a superset of contributing
    // pairs, and the surviving (i, j) pairs run the EXACT original
    // pair arithmetic in the exact original ascending order, so the
    // split sets — and every downstream weld id and traced ring — are
    // bit-identical to the all-pairs loop (OverlaySpec asserts this
    // on randomized inputs). All-in-one-cell degenerates back to the
    // old O(E²) scan, never worse.
    val margin = 2 * weldEps
    val eMinX = new Array[Double](nE); val eMaxX = new Array[Double](nE)
    val eMinY = new Array[Double](nE); val eMaxY = new Array[Double](nE)
    var sumW = 0.0; var sumH = 0.0
    var k0 = 0
    while (k0 < nE) {
      eMinX(k0) = math.min(ax(k0), bx(k0)) - margin
      eMaxX(k0) = math.max(ax(k0), bx(k0)) + margin
      eMinY(k0) = math.min(ay(k0), by(k0)) - margin
      eMaxY(k0) = math.max(ay(k0), by(k0)) + margin
      sumW += eMaxX(k0) - eMinX(k0); sumH += eMaxY(k0) - eMinY(k0)
      k0 += 1
    }
    // cell ~ the mean expanded-bbox extent: an average edge covers
    // O(1) cells, and a cell's occupancy tracks local edge density
    val cellSz = math.max(math.max(sumW, sumH) / nE, 16 * weldEps)
    // memory guard: one edge spanning the domain among many short ones
    // would otherwise register in O((w/cell)·(h/cell)) cells — up to
    // O(E²) map entries for O(E) input. Edges covering more than
    // MaxCells cells skip the grid entirely and go on an `outliers`
    // list that is bbox-checked against EVERY i (they are few by
    // construction, so this stays O(E·|outliers|) time and O(E) space);
    // candidate SETS are unchanged, only where a pair is discovered.
    val MaxCells = 64L
    val grid = new mutable.HashMap[(Long, Long), mutable.ArrayBuffer[Int]]()
    val outliers = mutable.ArrayBuffer.empty[Int]
    val isOutlier = new Array[Boolean](nE)
    k0 = 0
    while (k0 < nE) {
      val cx0 = math.floor(eMinX(k0) / cellSz).toLong
      val cxMax = math.floor(eMaxX(k0) / cellSz).toLong
      val cy0 = math.floor(eMinY(k0) / cellSz).toLong
      val cyMax = math.floor(eMaxY(k0) / cellSz).toLong
      if ((cxMax - cx0 + 1) * (cyMax - cy0 + 1) > MaxCells) {
        outliers += k0
        isOutlier(k0) = true
      } else {
        var cx = cx0
        while (cx <= cxMax) {
          var cy = cy0
          while (cy <= cyMax) {
            grid.getOrElseUpdate((cx, cy), mutable.ArrayBuffer.empty) += k0
            cy += 1
          }
          cx += 1
        }
      }
      k0 += 1
    }
    val stamp = Array.fill(nE)(-1) // per-i dedupe of multi-cell candidates
    val cand = mutable.ArrayBuffer.empty[Int]
    val splits = Array.fill(nE)(mutable.ArrayBuffer.empty[(Double, Double, Double)])
    var i = 0
    while (i < nE) {
      val rX = bx(i) - ax(i); val rY = by(i) - ay(i)
      cand.clear()
      def consider(j: Int): Unit =
        if (j > i && stamp(j) != i) {
          stamp(j) = i
          if (eMinX(i) <= eMaxX(j) && eMinX(j) <= eMaxX(i) &&
              eMinY(i) <= eMaxY(j) && eMinY(j) <= eMaxY(i)) cand += j
        }
      if (isOutlier(i)) {
        // an outlier's own cell range is the thing we refused to walk —
        // scan everything once instead (outliers are few)
        var j = i + 1
        while (j < nE) { consider(j); j += 1 }
      } else {
        var cx = math.floor(eMinX(i) / cellSz).toLong
        val cxMax = math.floor(eMaxX(i) / cellSz).toLong
        while (cx <= cxMax) {
          var cy = math.floor(eMinY(i) / cellSz).toLong
          val cyMax = math.floor(eMaxY(i) / cellSz).toLong
          while (cy <= cyMax) {
            grid.get((cx, cy)).foreach { ids =>
              var k = 0
              while (k < ids.length) { consider(ids(k)); k += 1 }
            }
            cy += 1
          }
          cx += 1
        }
        // gridless outliers are candidates of every edge
        var oi = 0
        while (oi < outliers.length) { consider(outliers(oi)); oi += 1 }
      }
      val candArr = cand.toArray
      java.util.Arrays.sort(candArr) // original ascending-j visit order
      var ci = 0
      while (ci < candArr.length) {
        val j = candArr(ci)
        val sX = bx(j) - ax(j); val sY = by(j) - ay(j)
        val qpX = ax(j) - ax(i); val qpY = ay(j) - ay(i)
        val d = rX * sY - rY * sX
        val lenR = math.sqrt(rX * rX + rY * rY)
        val lenS = math.sqrt(sX * sX + sY * sY)
        if (math.abs(d) > 1e-12 * lenR * lenS) {
          val t = (qpX * sY - qpY * sX) / d
          val u = (qpX * rY - qpY * rX) / d
          val tolT = weldEps / lenR; val tolU = weldEps / lenS
          if (t > -tolT && t < 1 + tolT && u > -tolU && u < 1 + tolU) {
            // ONE shared point for both edges, snapped to endpoints so
            // T-junction vertices weld bit-exactly with originals
            var px = ax(i) + t * rX; var py = ay(i) + t * rY
            if (t < tolT) { px = ax(i); py = ay(i) }
            else if (t > 1 - tolT) { px = bx(i); py = by(i) }
            if (u < tolU) { px = ax(j); py = ay(j) }
            else if (u > 1 - tolU) { px = bx(j); py = by(j) }
            if (t > tolT && t < 1 - tolT) splits(i) += ((t, px, py))
            if (u > tolU && u < 1 - tolU) splits(j) += ((u, px, py))
          }
        } else if (math.abs(qpX * rY - qpY * rX) <= weldEps * lenR) {
          // collinear: split each at the other's interior endpoints
          val rr = rX * rX + rY * rY
          val ss = sX * sX + sY * sY
          def onI(px: Double, py: Double): Unit = {
            val t = ((px - ax(i)) * rX + (py - ay(i)) * rY) / rr
            if (t > weldEps / lenR && t < 1 - weldEps / lenR) splits(i) += ((t, px, py))
          }
          def onJ(px: Double, py: Double): Unit = {
            val u = ((px - ax(j)) * sX + (py - ay(j)) * sY) / ss
            if (u > weldEps / lenS && u < 1 - weldEps / lenS) splits(j) += ((u, px, py))
          }
          onI(ax(j), ay(j)); onI(bx(j), by(j))
          onJ(ax(i), ay(i)); onJ(bx(i), by(i))
        }
        ci += 1
      }
      i += 1
    }

    // ---- 3. weld vertices (spatial hash, neighbor cells) → ids
    val cell = new mutable.HashMap[(Long, Long), mutable.ArrayBuffer[Int]]()
    val vx = mutable.ArrayBuffer.empty[Double]
    val vy = mutable.ArrayBuffer.empty[Double]
    def weld(px: Double, py: Double): Int = {
      val cx = math.floor(px / (4 * weldEps)).toLong
      val cy = math.floor(py / (4 * weldEps)).toLong
      var dx = -1L
      while (dx <= 1) {
        var dy = -1L
        while (dy <= 1) {
          cell.get((cx + dx, cy + dy)).foreach { ids =>
            var k = 0
            while (k < ids.length) {
              val id = ids(k)
              if (math.abs(vx(id) - px) <= weldEps && math.abs(vy(id) - py) <= weldEps)
                return id
              k += 1
            }
          }
          dy += 1
        }
        dx += 1
      }
      val id = vx.length
      vx += px; vy += py
      cell.getOrElseUpdate((cx, cy), mutable.ArrayBuffer.empty) += id
      id
    }

    // ---- 4. fragments (undirected, deduped across coincident edges)
    val fragSet = new mutable.HashSet[(Int, Int)]()
    i = 0
    while (i < nE) {
      val parts = ((0.0, ax(i), ay(i)) +: splits(i).sortBy(_._1) :+ ((1.0, bx(i), by(i)))).toIndexedSeq
      var k = 0
      while (k + 1 < parts.length) {
        val p = weld(parts(k)._2, parts(k)._3)
        val q = weld(parts(k + 1)._2, parts(k + 1)._3)
        if (p != q) fragSet += (if (p < q) (p, q) else (q, p))
        k += 1
      }
      i += 1
    }

    // ---- 5. classify: sample coverage just left/right of midpoints.
    // Indexed parity: one GroupIndex per group replaces the
    // parityInside full-ring scan per sample — O(bucket) instead of
    // O(group edges) per query, bit-identical result (the index XORs
    // the SAME per-edge crossing test over a superset of the edges
    // that can straddle the query's y; non-straddling extras
    // contribute nothing, and XOR is order-free).
    val delta = 1e-8 * scale
    val gIdx = groups.map(new GroupIndex(_))
    val cov = new Array[Boolean](groups.length)
    def keptAt(px: Double, py: Double): Boolean = {
      var g = 0
      while (g < groups.length) { cov(g) = gIdx(g).parity(px, py); g += 1 }
      keep(cov)
    }
    // directed boundary fragments, interior on the left
    val outgoing = new mutable.HashMap[Int, mutable.ArrayBuffer[Int]]()
    val frTo = mutable.ArrayBuffer.empty[Int]
    val frFrom = mutable.ArrayBuffer.empty[Int]
    fragSet.foreach { case (p, q) =>
      val mx = (vx(p) + vx(q)) / 2; val my = (vy(p) + vy(q)) / 2
      val dx = vx(q) - vx(p); val dy = vy(q) - vy(p)
      val len = math.sqrt(dx * dx + dy * dy)
      val nx = -dy / len; val ny = dx / len // left normal of p→q
      val inL = keptAt(mx + delta * nx, my + delta * ny)
      val inR = keptAt(mx - delta * nx, my - delta * ny)
      if (inL != inR) {
        val (from, to) = if (inL) (p, q) else (q, p)
        val idx = frFrom.length
        frFrom += from; frTo += to
        outgoing.getOrElseUpdate(from, mutable.ArrayBuffer.empty) += idx
      }
    }

    // ---- 6. trace rings: sharpest-left-turn walk keeps each face's
    // interior on the left through pinch vertices
    val used = new Array[Boolean](frFrom.length)
    val rings = mutable.ArrayBuffer.empty[Array[Double]]
    var f0 = 0
    while (f0 < frFrom.length) {
      if (!used(f0)) {
        val start = frFrom(f0)
        val pts = mutable.ArrayBuffer.empty[Double]
        var cur = f0
        var guard = 0
        var closed = false
        var broken = false
        while (!closed && guard <= frFrom.length) {
          used(cur) = true
          pts += vx(frFrom(cur)); pts += vy(frFrom(cur))
          val v = frTo(cur)
          if (v == start) closed = true
          else {
            val inDx = vx(v) - vx(frFrom(cur)); val inDy = vy(v) - vy(frFrom(cur))
            var best = -1; var bestAng = -4.0 // turn angle in (-π, π]
            outgoing.get(v).foreach(_.foreach { cand =>
              if (!used(cand)) {
                val oDx = vx(frTo(cand)) - vx(v); val oDy = vy(frTo(cand)) - vy(v)
                val ang = math.atan2(inDx * oDy - inDy * oDx, inDx * oDx + inDy * oDy)
                if (ang > bestAng) { bestAng = ang; best = cand }
              }
            })
            if (best < 0) { closed = true; broken = true } // open chain
            else cur = best
          }
          guard += 1
        }
        if (!broken && pts.length >= 6) {
          val ring = pts.toArray
          if (math.abs(Geom.signedArea(ring)) > weldEps * weldEps) rings += ring
        }
      }
      f0 += 1
    }
    rings.toSeq
  }
}
