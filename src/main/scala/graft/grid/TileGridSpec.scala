package graft.grid

/** Immutable, serializable description of one overlapping tile grid with
  * precomputed edge arrays — broadcast-friendly (a few hundred bytes) and
  * shared by the covering-tiles expression so the per-row work is two
  * small scans over cached edges, no allocation beyond the result.
  *
  * Mirrors the reference grid contract (data/tiling.py:47-173); see
  * [[Tiler]] for the integer-exact linspace semantics.
  */
object TileGridSpec {
  /** GSD-aware grid spec (P13, TiledGeoImage): tile windows in SOURCE
    * pixels sized by `Tiler.geoScale`, so a downstream T4 rescale
    * (`RasterOps.resampleTiles` blur+bilinear) lands back on
    * `tileSize`. Unknown source resolution (srcGsd <= 0) degrades to
    * the plain grid at scale 1 (the reference's warn-and-continue).
    * Returns (spec, scale). */
  def atGsd(width: Long, height: Long, tileSize: Long, minOverlap: Long,
            srcGsd: Double, targetGsd: Double): (TileGridSpec, Double) = {
    val (srcTile, srcOverlap, scale) = Tiler.geoScale(tileSize, minOverlap, srcGsd, targetGsd)
    (TileGridSpec(width, height, srcTile, srcOverlap), scale)
  }
}

final case class TileGridSpec(width: Long, height: Long, tileSize: Long, minOverlap: Long)
    extends Serializable {
  require(minOverlap < tileSize, "Overlap must be less than tile size.")
  val overlap: Long =
    if (width - tileSize <= 0 && height - tileSize <= 0) 0L else minOverlap
  val nx: Int = Tiler.nTiles(width, tileSize, overlap)
  val ny: Int = Tiler.nTiles(height, tileSize, overlap)
  val xEdges: Array[Long] = Tiler.linspaceInt(width - tileSize, nx)
  val yEdges: Array[Long] = Tiler.linspaceInt(height - tileSize, ny)
  def nTiles: Int = nx * ny

  def tile(id: Long): Tiler.Tile = {
    val xi = (id % nx).toInt
    val yi = (id / nx).toInt
    Tiler.Tile(id, xEdges(xi), yEdges(yi), xEdges(xi) + tileSize, yEdges(yi) + tileSize)
  }

  def tiles: Array[Tiler.Tile] = Array.tabulate(nTiles)(i => tile(i.toLong))

  /** Ids of tiles whose half-open box [min, min+tile) contains (x, y).
    * Hot-path: called once per input row in the page⨝tile join. */
  def covering(x: Double, y: Double): Array[Long] = {
    // the edges are non-decreasing (linspace), so per axis the hit set
    // is a contiguous index range found in O(1) from the closed-form
    // stride candidate (± truncation verify) — constant per row even
    // on one huge grid instead of many small regions
    val xi0 = Tiler.firstEdgeGT(xEdges, tileSize, x)
    val xi1 = Tiler.lastEdgeLE(xEdges, x)
    val yi0 = Tiler.firstEdgeGT(yEdges, tileSize, y)
    val yi1 = Tiler.lastEdgeLE(yEdges, y)
    if (xi0 > xi1 || yi0 > yi1) return Array.emptyLongArray
    val out = new Array[Long]((xi1 - xi0 + 1) * (yi1 - yi0 + 1))
    var k = 0
    var yi = yi0
    while (yi <= yi1) {
      var xi = xi0
      while (xi <= xi1) { out(k) = yi.toLong * nx + xi; k += 1; xi += 1 }
      yi += 1
    }
    out
  }
}
