package scratch

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .appName("drive").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    def time(name: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"[$name] ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("[rows] " + li.count())
    time("scan-count")(li.selectExpr("l_returnflag", "l_extendedprice").agg(count("*")).collect())
    time("sum-agg")(li.groupBy("l_returnflag").agg(sum("l_extendedprice")).collect())
    time("exact-percentile")(
      li.groupBy("l_returnflag")
        .agg(expr("percentile(round(l_extendedprice * 100), 0.5)"),
             expr("percentile(round(l_extendedprice * 100), 0.9)")).collect())
    time("full-query")(graft.Bench.outputHash(
      graft.SparkEntry.queries("q_percentile")(spark, dir)))
    spark.stop()
  }
}
