package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support for shuffle-free co-located joins (SURVEY.md
  * §0 "bucketing for co-located joins"): write both sides bucketed by
  * the join key into the session catalog; Spark then plans the join
  * with NO Exchange on either side — at 100 TB this converts the
  * biggest repeated shuffle (crowns ⨝ assignments by region, pages ⨝
  * anything by cell) into local joins.
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket column — shuffle-free
    * when both sides share bucket count and key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   on: String): DataFrame =
    // merge hint: sort-merge join — with matching bucketing on both
    // sides it needs neither Exchange nor (with sortBy) a Sort; without
    // the hint Spark may pick broadcast for a small side, which is fine
    // in production but defeats the co-location demonstration
    spark.table(left).hint("merge").join(spark.table(right).hint("merge"), Seq(on))
}
