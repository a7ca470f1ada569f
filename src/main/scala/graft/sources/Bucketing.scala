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

  /** Range-sorted layout: repartitionByRange + sortWithinPartitions on
    * `sortCols` before writing, so each parquet file covers a DISJOINT
    * range of the sort key and its footer min/max stats let readers
    * skip whole files/row-groups for range predicates (the time-range
    * scan pattern: at 100 TB, an hour-window query over a ts-sorted
    * event lake touches a handful of files instead of all of them).
    * Complements [[writeBucketed]]: bucket for equi-joins, range-sort
    * for range scans. BucketingSpec asserts the per-file ranges are
    * genuinely disjoint. */
  def writeRangeSorted(df: DataFrame, path: String, sortCol: String,
                       files: Int = 8): Unit =
    df.repartitionByRange(files, df.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite)
      .parquet(path)
}
