package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{RefQueries, RelQueries}
import graft.operators.{BloomOps, CorpusOps, EventOps, GraphOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (SURVEY.md §2 + §2.12), one
  * entry per operator, each reading the driver testdata at `sfDir`.
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare
  * gate; the only entries absent there are q_approx_distinct (built-in
  * HLL++ internals) and q_kll_quantiles (arrival-order-dependent
  * compaction) — inherently un-oracle-able values that get the
  * driver's rows-only check, with correctness asserted in ScalaTest
  * specs. (graft's own HLL and the multimodal stub use portable
  * md5-derived values precisely so THEIR queries stay in the gate.)
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q_tpch_q3")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ RelQueries.queries ++ EventOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ GraphOps.queries ++
      BloomOps.queries ++ CorpusOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ RelQueries.oracle ++ EventOps.oracle ++
      TextOps.oracle ++ VectorOps.oracle ++ GraphOps.oracle ++
      BloomOps.oracle ++ CorpusOps.oracle
}
