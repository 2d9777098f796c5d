package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators.GeoOps
import graft.tables.PagesGen

/** Physical-plan assertions (SURVEY.md §4): the declarative operators
  * must keep Catalyst's free optimizations — column pruning, predicate
  * pushdown, whole-stage codegen around the custom expressions,
  * broadcast for small join sides — and the salted two-phase aggregate
  * must equal the plain one. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("parquet scan prunes columns and pushes filters") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning missing:\n$plan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)"),
      s"filter pushdown missing:\n$plan")
  }

  test("cell_encode + covering_tiles stay inside one WholeStageCodegen span") {
    val pages = PagesGen.pages(spark, 100)
    val assigned = GeoOps.assignTiles(pages)
    val plan = planOf(assigned)
    assert(plan.contains("cell_encode") || plan.contains("covering_tiles")
      || plan.contains("Generate explode"), s"expressions missing:\n$plan")
    // the projection feeding the generator is codegen'd ("*(1)" = span 1)
    assert(plan.contains("*(1) Generate"), s"generator not in codegen span:\n$plan")
    // there is NO join node: tile assignment is a generator
    assert(!plan.contains("Join"), s"unexpected join:\n$plan")
  }

  test("pipJoin broadcasts the polygon side") {
    val pts = GeoOps.withRegion(PagesGen.pages(spark, 100))
      .select(col("i"), col("region"), col("x"), col("y"))
    val polys = spark.range(3).toDF("poly_id")
      .withColumn("poly", typedlit(Array(0.0, 0.0, 50.5, 0.0, 25.0, 40.5)))
      .withColumn("poly_min_x", lit(0.0)).withColumn("poly_max_x", lit(50.5))
      .withColumn("poly_min_y", lit(0.0)).withColumn("poly_max_y", lit(40.5))
    val plan = planOf(GeoOps.pipJoin(pts, polys))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"no broadcast join:\n$plan")
  }

  test("salted two-phase cell counts equal the plain aggregation") {
    val pages = GeoOps.withRegion(PagesGen.pages(spark, 5000))
    val salted = GeoOps.saltedCellCounts(pages, level = 8, salt = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = pages
      .withColumn("cell", cell_encode(col("x"), col("y"), 8, 2048.0, 2048.0))
      .groupBy("cell").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === plain)
    // the hot cluster (i % 41 == 0 → 13x11 px spot) shows up as hot cells
    val hot = plain.values.max
    assert(hot > 10 * plain.values.sum / plain.size, "hot cell not planted?")
  }

  test("q1 aggregate uses partial aggregation (two HashAggregate phases)") {
    val df = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
    val plan = planOf(df)
    assert("HashAggregate".r.findAllMatchIn(plan).size >= 2, s"no partial agg:\n$plan")
  }
}
