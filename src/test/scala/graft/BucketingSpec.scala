package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.tables.Bucketing

/** Bucketed co-located join: both sides bucketed by the join key →
  * the physical plan contains no shuffle Exchange (the "pre-shuffled
  * storage" pattern for repeated big joins at scale). */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("join of two tables bucketed on the key has no Exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS bucketed_a")
    spark.sql("DROP TABLE IF EXISTS bucketed_b")
    // a prior crashed run can leave the managed location behind
    Seq("bucketed_a", "bucketed_b").foreach { t =>
      val dir = new java.io.File(s"spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    val a = (0L until 6400L).map(i => (i % 64, i, i * 2)).toDF("region", "id", "v")
    val b = (0L until 3200L).map(i => (i % 64, i, i * 3)).toDF("region", "id2", "w")
    Bucketing.writeBucketed(a, "bucketed_a", "region", 8, Some("region"))
    Bucketing.writeBucketed(b, "bucketed_b", "region", 8, Some("region"))
    val joined = Bucketing.bucketedJoin(spark, "bucketed_a", "bucketed_b", "region")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    // and it computes the right thing
    assert(joined.count() === 64L * 100 * 50) // 100 x 50 matches per region
  }
}
