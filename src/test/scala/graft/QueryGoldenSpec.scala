package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hard verification for the queries WITHOUT a DuckDB oracle: each one
  * is pinned to a committed xor-of-xxhash64-over-all-columns output
  * hash at the driver's verify scale (sf0.01) — the exact checksum
  * Bench computes per query ([[Bench.outputHash]]), so "benchmarked"
  * and "verified" are the same artifact. Together with the driver's
  * oracle rows this makes every `SparkEntry.queries` entry
  * hash-checked: SQL-expressible ones against DuckDB, the rest against
  * these goldens (whose semantics are themselves covered by kernel
  * goldens, recall tests, and the reference's 387-annotation fixture).
  *
  * The golden bootstraps on first run (then gets committed) — an
  * INTENTIONAL semantics change regenerates by deleting the file;
  * accidental drift fails with the per-query name.
  */
class QueryGoldenSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val sfDir = "/root/testdata/sf0.01"
  private val goldenPath = "src/test/resources/query_hashes.json"

  /** Queries with a DuckDB oracle are driver-verified; pin the rest. */
  private def rowsOnly: Seq[String] =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted

  private def parseGolden(s: String): Map[String, Long] =
    """"([a-z0-9_]+)"\s*:\s*(-?\d+)""".r.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap

  test("every no-oracle query reproduces its committed sf0.01 output hash") {
    val computed = rowsOnly.map { name =>
      name -> Bench.outputHash(SparkEntry.queries(name)(spark, sfDir))
    }
    val goldenFile = java.nio.file.Paths.get(goldenPath)
    if (!java.nio.file.Files.exists(goldenFile)) {
      val json = computed.map { case (k, v) => s"""  "$k": $v""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.createDirectories(goldenFile.getParent)
      java.nio.file.Files.write(goldenFile, json.getBytes("UTF-8"))
      cancel(s"golden bootstrapped at $goldenPath — commit it and rerun")
    }
    val want = parseGolden(new String(
      java.nio.file.Files.readAllBytes(goldenFile), "UTF-8"))
    // name sets stay in sync both ways: a new no-oracle query must get
    // a golden (delete the file to regenerate), a renamed one must not
    // leave a stale entry behind
    assert(want.keySet === computed.map(_._1).toSet,
      "query set drifted vs committed golden — regenerate query_hashes.json")
    computed.foreach { case (name, h) =>
      assert(want(name) === h, s"$name: output hash drifted")
    }
  }
}
