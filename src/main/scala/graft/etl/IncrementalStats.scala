package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** INCREMENTAL AGGREGATE MAINTENANCE over snapshot tables — the
  * composition the CDC read path exists for: a downstream stats table
  * kept current by folding in ONLY the rows appended since the last
  * run, never rescanning the source. At lake scale this is the
  * difference between a daily delta job (O(|delta|)) and a daily
  * full-table pass (O(|table|)).
  *
  * Mechanics per update:
  *   1. the high-water mark is DATA, not side state: every stats row
  *      carries `thru_version`, the source snapshot it reflects — so
  *      the mark travels inside the same atomic commit as the stats
  *      themselves (a separate marker file could tear);
  *   2. `readChanges(mark, head)` scans only the appended files
  *      (file-listing diff, PlanSpec-verified pushdown through the
  *      DSv2 scan);
  *   3. the delta aggregate merges into the previous stats by
  *      re-aggregation of MERGEABLE measures (counts and sums add;
  *      min/max combine) — the same partial/final algebra as Spark's
  *      own two-phase aggregation;
  *   4. the merged table replace-commits under an idempotency tag
  *      `thru_<head>`: a crashed-and-replayed run appends nothing
  *      twice (`commitOnce`), and concurrent racers serialize through
  *      the manifest publish.
  *
  * A compaction/replace on the source makes the file diff undefined
  * (readChanges refuses); recover by rebuilding once from the head —
  * `rebuild` — which re-baselines the mark. */
object IncrementalStats {

  private def aggOf(delta: DataFrame): DataFrame =
    delta.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_chars")).cast("long").as("n_chars"),
      min(col("doc_id")).as("min_doc"),
      max(col("doc_id")).as("max_doc"))

  /** Fold the source's unprocessed delta into `stats`. Returns the
    * committed stats version, or None when already current (or the
    * tag proves this head was already folded by a racing replay). */
  def update(spark: SparkSession, docs: SnapshotTable,
             stats: SnapshotTable): Option[Long] = {
    val head = docs.currentVersion()
    if (head < 0) return None
    val cur = stats.read(spark)
    val mark =
      if (!cur.columns.contains("thru_version")) -1L
      else cur.agg(max(col("thru_version"))).head() match {
        case r if r.isNullAt(0) => -1L
        case r => r.getLong(0)
      }
    if (mark >= head) return None
    val deltaAgg = aggOf(docs.readChanges(spark, mark, head))
    val merged =
      (if (mark < 0) deltaAgg
       else cur.drop("thru_version").unionByName(deltaAgg)
         .groupBy("source").agg(
           sum(col("n_docs")).cast("long").as("n_docs"),
           sum(col("n_chars")).cast("long").as("n_chars"),
           min(col("min_doc")).as("min_doc"),
           max(col("max_doc")).as("max_doc")))
        .withColumn("thru_version", lit(head))
    stats.commitOnce(s"thru_$head", merged, replace = true)
  }

  /** Full recompute from the source head — the recovery path after a
    * source compaction/replace breaks the incremental lineage. */
  def rebuild(spark: SparkSession, docs: SnapshotTable,
              stats: SnapshotTable): Long = {
    val head = docs.currentVersion()
    stats.commit(
      aggOf(docs.readAt(spark, head)).withColumn("thru_version", lit(head)),
      replace = true)
  }
}
