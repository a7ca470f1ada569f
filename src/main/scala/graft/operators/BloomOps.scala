package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables._

/** Bloom-filter semi-join pre-filtering (the explicit form of Spark's
  * own runtime row-level filtering, exposed as library surface via the
  * `graft_bloom_agg` / `graft_might_contain` SQL functions that
  * GraftExtensions registers over Catalyst's internal
  * BloomFilterAggregate / BloomFilterMightContain).
  *
  * The 100 TB shape: the build side (keys that survive a selective
  * filter) is aggregated into a few-KB bloom bitmap — ONE scalar, not a
  * broadcast hash table — and the huge probe side is pre-filtered AT
  * THE SCAN with `might_contain` before it ever reaches the join
  * shuffle. Rows that can't match never get serialized, shuffled, or
  * sorted. The exact equi-join above it then removes the bloom's false
  * positives, so results are identical to the plain semi-join (which is
  * exactly what the DuckDB oracle runs) — only the shuffle volume
  * changes. Bloom insertion is an OR of hash bits, so the bitmap is
  * order-independent and mergeable: partial filters combine map-side
  * like any aggregate.
  */
object BloomOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // customers holding at least one order above the price cutoff,
    // computed as bloom-prefilter + exact re-join (see object doc)
    "q_bloom_semi_join" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("graft_bloom_orders")
      customer(s, d).createOrReplaceTempView("graft_bloom_customer")
      s.sql(
        """WITH hot AS (
          |  SELECT o_custkey FROM graft_bloom_orders
          |  WHERE o_totalprice > 450000),
          |b AS (SELECT graft_bloom_agg(xxhash64(o_custkey)) AS bf FROM hot)
          |SELECT c.c_custkey, c.c_mktsegment
          |FROM graft_bloom_customer c
          |JOIN (SELECT DISTINCT o_custkey FROM hot) h
          |  ON c.c_custkey = h.o_custkey
          |WHERE graft_might_contain((SELECT bf FROM b), xxhash64(c.c_custkey))
          |ORDER BY c.c_custkey""".stripMargin)
    }))

  val oracle: Map[String, String] = Map(
    // the bloom is a no-false-negative prefilter and the exact join
    // removes false positives, so the oracle is the plain semi-join
    "q_bloom_semi_join" ->
      """SELECT c.c_custkey, c.c_mktsegment
        |FROM customer c
        |WHERE c.c_custkey IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
        |ORDER BY c.c_custkey""".stripMargin)
}
