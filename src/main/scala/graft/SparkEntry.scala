package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{RefQueries, RelQueries}
import graft.operators.{BloomOps, CorpusOps, EventOps, GraphOps, TextOps, VectorOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator catalog (SURVEY.md §2 + §2.12), one
  * entry per operator, each reading the driver testdata at `sfDir`.
  * `oracleSql` carries the DuckDB-equivalent SQL for the hash-compare
  * gate — since round 9 for EVERY entry: the two sketch rows whose raw
  * estimates are engine-internal (q_approx_distinct: built-in HLL++
  * registers; q_kll_quantiles: arrival-order-dependent compaction)
  * emit derived invariants instead — exact side + error bound +
  * within-bound booleans computed from the real estimate — so the
  * DuckDB compare gates them too, and their quantitative error bounds
  * stay proven in RandomizedPropertySpec/KllSketchSpec. (graft's own
  * HLL and the multimodal stub use portable md5-derived values
  * precisely so THEIR queries hash-compare directly.)
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
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Every oracle is mapped through [[OracleSql.materializeCtes]]: the
    * unrolled iterative oracles chain CTEs referenced many times and
    * DuckDB re-inlines non-materialized CTEs, which made the compare
    * stage exponential in unroll depth (20+ min catalog, one oracle
    * alone >12 min) and zeroed the round-8/9 driver correctness files.
    * With the mechanical `AS MATERIALIZED` fence the full catalog runs
    * in seconds with identical results. */
  def oracleSql: Map[String, String] =
    (RefQueries.oracle ++ RelQueries.oracle ++ EventOps.oracle ++
      TextOps.oracle ++ VectorOps.oracle ++ GraphOps.oracle ++
      BloomOps.oracle ++ CorpusOps.oracle)
      .map { case (k, v) => k -> OracleSql.materializeCtes(v) }
}
