package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CrownOps, GeoOps}
import graft.tables.{FixtureIO, PagesGen}

/** Byte-exact golden fixture for the full merge pipeline — the engine's
  * analogue of the reference's committed 387-instance COCO file
  * (tests/unit/5c15321f63d9810007f8b06f_10_00000.json): any semantic
  * drift in synthesis, NMS, dissolve, split, or serialization breaks
  * this test. The golden bootstraps itself on first run (then gets
  * committed); afterwards the comparison is bytes-identical. */
class GoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val goldenPath = "src/test/resources/golden_merged_3000.jsonl"

  test("merge pipeline reproduces the committed golden fixture byte-for-byte") {
    val pages = PagesGen.pages(spark, 3000)
    val crowns = CrownOps.synthesize(spark, GeoOps.assignTiles(pages), GeoOps.TileGrid.Default)
    val merged = CrownOps.nmsMerge(spark, crowns, 0.7, 0.3, 0.5).collect().toSeq

    val tmp = java.nio.file.Files.createTempFile("golden", ".jsonl").toString
    FixtureIO.writeMergedFixture(tmp, merged)
    val got = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmp))

    val goldenFile = java.nio.file.Paths.get(goldenPath)
    if (!java.nio.file.Files.exists(goldenFile)) {
      java.nio.file.Files.createDirectories(goldenFile.getParent)
      java.nio.file.Files.write(goldenFile, got)
      cancel(s"golden bootstrapped at $goldenPath — commit it and rerun")
    }
    val want = java.nio.file.Files.readAllBytes(goldenFile)
    assert(got.length === want.length, "golden fixture size drifted")
    assert(java.util.Arrays.equals(got, want), "golden fixture bytes drifted")
  }

  test("crown synthesis matches its committed content hash") {
    // cheap committed-golden for the synthesis stage itself (the merged
    // fixture covers the full pipeline; this pins the pre-merge stage so
    // a synthesis drift is attributed to the right operator)
    val pages = PagesGen.pages(spark, 3000)
    val crowns = CrownOps.synthesize(spark, GeoOps.assignTiles(pages), GeoOps.TileGrid.Default)
      .collect().sortBy(_.crownId)
    val canon = crowns.map(c => FixtureIO.crownToCocoJson(c)).mkString("\n")
    val hash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val goldenFile = java.nio.file.Paths.get("src/test/resources/golden_synth_3000.sha256")
    if (!java.nio.file.Files.exists(goldenFile)) {
      java.nio.file.Files.write(goldenFile, hash.getBytes("UTF-8"))
      cancel(s"synth golden bootstrapped ($hash) — commit it and rerun")
    }
    val want = new String(java.nio.file.Files.readAllBytes(goldenFile), "UTF-8").trim
    assert(hash === want, "crown synthesis content hash drifted")
  }

  test("golden fixture parses back: every line is valid canonical JSON") {
    val goldenFile = java.nio.file.Paths.get(goldenPath)
    assume(java.nio.file.Files.exists(goldenFile), "golden not yet bootstrapped")
    val lines = FixtureIO.readFixtureLines(goldenPath)
    assert(lines.nonEmpty)
    lines.foreach { l =>
      assert(l.startsWith("{\"region\":") && l.endsWith("}"))
      // WKT geoms parse
      val gi = l.indexOf("\"geoms\":[\"")
      assert(gi > 0)
      val wkt = l.substring(gi + 10, l.indexOf("\"", gi + 10))
      assert(FixtureIO.wktToPoly(wkt).length >= 6)
    }
  }
}
