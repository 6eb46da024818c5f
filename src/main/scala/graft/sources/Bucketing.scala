package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table once at write time
  * so every later equi-join / aggregation on the bucket key runs
  * shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and paying the exchange once at ingest: two tables
  * bucketed into the same bucket count on the join key sort-merge-join
  * with NO Exchange on either side (verified by BucketingSpec via plan
  * inspection). The same layout serves repeated groupBy(key)
  * aggregations.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides with the
    * catalog entry, so joins on the bucket column skip the exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
