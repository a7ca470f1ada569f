package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{RefQueries, RelQueries}
import graft.operators.{BloomOps, EventOps, GraphOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (SURVEY.md §2 + §2.12), one
  * entry per operator, each reading the driver testdata at `sfDir`.
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare
  * gate; entries absent there (q_approx_distinct, q_hll_distinct,
  * q_multimodal_meta) are implementation-specific (sketch values /
  * stubbed decode) and get the driver's rows-only check, with
  * correctness asserted in ScalaTest specs.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelQueries.queries("q_tpch_q3")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queries ++ RelQueries.queries ++ EventOps.queries ++
      TextOps.queries ++ VectorOps.queries ++ GraphOps.queries ++
      BloomOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracle ++ RelQueries.oracle ++ EventOps.oracle ++
      TextOps.oracle ++ VectorOps.oracle ++ GraphOps.oracle ++
      BloomOps.oracle
}
