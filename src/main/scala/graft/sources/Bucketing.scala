package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle facts ONCE at write time so that
  * every subsequent equi-join/aggregation on the bucket key runs with
  * no exchange at all (SURVEY.md §4 / builder mandate: "co-locate joins
  * via bucketing").
  *
  * At 100 TB this is the difference between re-shuffling the fact table
  * per query and paying the shuffle once at ingest: a join of two
  * tables bucketed on the same key by the same bucket count is planned
  * as a zip of co-located buckets (SortMergeJoin with both exchanges
  * elided — asserted in BucketingSpec).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key: no exchange on either
    * side when bucket specs line up. */
  def cogroupJoin(spark: SparkSession, left: String, right: String,
                  key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
