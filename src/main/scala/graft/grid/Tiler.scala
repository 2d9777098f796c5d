package graft.grid

/** Overlapping / non-overlapping tile-grid generation (pure Scala).
  *
  * Integer-exact re-creation of the reference tiler semantics
  * (/root/reference/src/tcd_pipeline/data/tiling.py:47-173):
  *  - per axis, n = 1 if extent <= tile else 1 + ceil((extent-tile)/(tile-overlap))
  *  - edges = numpy `linspace(0, extent-tile, n).astype(int)`
  *    (float64 step, truncation toward zero)
  *  - overlap forced to 0 when the image fits in one tile on BOTH axes
  *  - tiles yielded y-major, each exactly tile_size (may over-extend the
  *    image; readers pad — tiling.py:206-240)
  * Golden contract: tests/unit/test_tiling.py:15-77 (2048² @1024/256 →
  * 9 tiles, all 1024²; @1024/0 → 4; @2048/256 → 1; @4096/256 → 1).
  */
object Tiler {

  final case class Tile(tileId: Long, minX: Long, minY: Long, maxX: Long, maxY: Long)

  /** numpy linspace(0, stop, n).astype(int): i * (stop/(n-1)) truncated. */
  def linspaceInt(stop: Long, n: Int): Array[Long] = {
    if (n == 1) return Array(0L)
    val step = stop.toDouble / (n - 1)
    Array.tabulate(n)(i => (i * step).toLong)
  }

  def nTiles(extent: Long, tileSize: Long, overlap: Long): Int = {
    if (extent <= tileSize) 1
    else 1 + math.ceil((extent - tileSize).toDouble / (tileSize - overlap)).toInt
  }

  /** Overlapping grid with align_edges=True semantics. tileId is the
    * y-major index (row * nX + col), matching reference yield order. */
  def overlappingGrid(width: Long, height: Long, tileSize: Long, minOverlap: Long): Array[Tile] = {
    // strictly less: overlap == tileSize gives stride 0, which the
    // reference also cannot process (ZeroDivisionError in _n_tiles)
    require(minOverlap < tileSize, "Overlap must be less than tile size.")
    val overlap =
      if (width - tileSize <= 0 && height - tileSize <= 0) 0L else minOverlap
    val nx = nTiles(width, tileSize, overlap)
    val ny = nTiles(height, tileSize, overlap)
    val xs = linspaceInt(width - tileSize, nx)
    val ys = linspaceInt(height - tileSize, ny)
    val out = new Array[Tile](nx * ny)
    var id = 0
    var yi = 0
    while (yi < ny) {
      var xi = 0
      while (xi < nx) {
        out(id) = Tile(id.toLong, xs(xi), ys(yi), xs(xi) + tileSize, ys(yi) + tileSize)
        id += 1
        xi += 1
      }
      yi += 1
    }
    out
  }

  /** Python `round` (banker's / half-even) to Long. */
  @inline private def pyRound(x: Double): Long = math.rint(x).toLong

  /** Resolution guard + GSD-aware tile grid (P13 — TiledGeoImage,
    * data/tiling.py:345-411 with imagedataset.py:100-118's fallback):
    * with a known source GSD, source-resolution tile windows are sized
    * `round(tileSize * scale)` / `round(overlap * scale)` where
    * `scale = round(targetGsd / srcGsd, 6)` (Python half-even rounding
    * in both places), so the T4 rescale path (blur + bilinear,
    * tiling.py:425-436) lands exactly back on `tileSize`. An UNKNOWN
    * resolution (srcGsd <= 0, reference `res[0] == 0`) degrades to the
    * plain image grid at scale 1 — the reference's warn-and-continue
    * behavior rather than a hard `require`. Returns (grid in SOURCE
    * pixels, scale factor). */
  def geoGrid(width: Long, height: Long, tileSize: Long, minOverlap: Long,
              srcGsd: Double, targetGsd: Double): (Array[Tile], Double) = {
    val (srcTile, srcOverlap, scale) = geoScale(tileSize, minOverlap, srcGsd, targetGsd)
    (overlappingGrid(width, height, srcTile, srcOverlap), scale)
  }

  /** The GSD scaling numbers alone: (source tile, source overlap,
    * scale) — shared by [[geoGrid]] and `TileGridSpec.atGsd`. Either
    * GSD being unknown/invalid (≤ 0) degrades to scale 1
    * (warn-and-continue), and the rounded overlap is clamped into
    * [0, srcTile) so extreme downscales keep a VALID grid (overlap ≥
    * tile would either crash the spec or, if negative, stride past
    * tileSize and silently leave uncovered gaps). */
  def geoScale(tileSize: Long, minOverlap: Long,
               srcGsd: Double, targetGsd: Double): (Long, Long, Double) = {
    if (srcGsd <= 0 || targetGsd <= 0) return (tileSize, minOverlap, 1.0)
    val scale = BigDecimal(targetGsd / srcGsd)
      .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble
    val srcTile = math.max(1L, pyRound(tileSize * scale))
    val srcOverlap = math.min(srcTile - 1, math.max(0L, pyRound(minOverlap * scale)))
    (srcTile, srcOverlap, scale)
  }

  /** Non-overlapping clamped grid (tiling.py:17-44; x-major order like
    * the reference's `for tx: for ty:` loop). Used for the output /
    * cache partitioning grid. */
  def nonOverlappingGrid(width: Long, height: Long, tileSize: Long): Array[Tile] = {
    val nx = math.ceil(width.toDouble / tileSize).toInt
    val ny = math.ceil(height.toDouble / tileSize).toInt
    val out = new Array[Tile](nx * ny)
    var id = 0
    var tx = 0
    while (tx < nx) {
      var ty = 0
      while (ty < ny) {
        val minx = tx.toLong * tileSize
        val miny = ty.toLong * tileSize
        out(id) = Tile(id.toLong, minx, miny,
          math.min(minx + tileSize, width), math.min(miny + tileSize, height))
        id += 1
        ty += 1
      }
      tx += 1
    }
    out
  }

  /** Closed-form inverse: the ids of overlapping-grid tiles whose box
    * contains point (x, y). Because edges come from linspace, a point
    * can belong to at most ceil(tile/stride)² tiles; we compute the
    * candidate edge-index range arithmetically instead of scanning —
    * this is what turns the page⨝tile spatial join into pure arithmetic
    * (no index, codegen-friendly). */
  def coveringTiles(width: Long, height: Long, tileSize: Long, minOverlap: Long,
                    x: Double, y: Double): Array[Long] = {
    val overlap =
      if (width - tileSize <= 0 && height - tileSize <= 0) 0L else minOverlap
    val nx = nTiles(width, tileSize, overlap)
    val ny = nTiles(height, tileSize, overlap)
    val xs = linspaceInt(width - tileSize, nx)
    val ys = linspaceInt(height - tileSize, ny)
    val xIdx = coveringEdges(xs, tileSize, x)
    val yIdx = coveringEdges(ys, tileSize, y)
    val out = new Array[Long](xIdx.length * yIdx.length)
    var k = 0
    var j = 0
    while (j < yIdx.length) {
      var i = 0
      while (i < xIdx.length) {
        out(k) = yIdx(j).toLong * nx + xIdx(i)
        k += 1
        i += 1
      }
      j += 1
    }
    out
  }

  /** Largest index i with edges(i) <= v, or -1. Closed-form candidate
    * from the linspace stride, then an O(1) ±verify walk — the edges
    * are floor(i*step), so the arithmetic candidate is off by at most
    * the truncation error. Constant time per row even on a grid with
    * 10^5 edges per axis (a per-row linear scan there would be the
    * projection's bottleneck). */
  def lastEdgeLE(edges: Array[Long], v: Double): Int = {
    val n = edges.length
    val step = if (n > 1) edges(n - 1).toDouble / (n - 1) else 0.0
    var c = if (step <= 0) n - 1
            else math.min((n - 1).toLong, math.max(0L, (v / step).toLong)).toInt
    while (c + 1 < n && edges(c + 1) <= v) c += 1
    while (c >= 0 && edges(c) > v) c -= 1
    c
  }

  /** Smallest index i with edges(i) + tileSize > v, or edges.length. */
  def firstEdgeGT(edges: Array[Long], tileSize: Long, v: Double): Int = {
    val n = edges.length
    val w = v - tileSize
    val step = if (n > 1) edges(n - 1).toDouble / (n - 1) else 0.0
    var c = if (step <= 0) 0
            else math.min((n - 1).toLong, math.max(0L, math.ceil(w / step).toLong)).toInt
    while (c > 0 && edges(c - 1) > w) c -= 1
    while (c < n && edges(c) <= w) c += 1
    c
  }

  /** Edge indices e with edge <= v < edge + tileSize. Containment is
    * half-open [min, max) so a point maps to a deterministic tile set.
    * The edges are non-decreasing, so the hit set is the contiguous
    * index range [firstEdgeGT, lastEdgeLE] — computed in O(1) via the
    * closed-form candidates above, not a per-row edge scan. */
  private def coveringEdges(edges: Array[Long], tileSize: Long, v: Double): Array[Int] = {
    val hi = lastEdgeLE(edges, v)
    val lo = firstEdgeGT(edges, tileSize, v)
    if (lo > hi) Array.emptyIntArray
    else Array.range(lo, hi + 1)
  }
}
