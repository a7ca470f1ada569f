package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomOps

/** The bloom semi-join's oracle is the exact semi-join; these pin the
  * PLAN properties the oracle can't see. */
class BloomOpsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bloom prefilter result == exact semi-join result") {
    val got = BloomOps.queries("q_bloom_semi_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val exact = graft.sources.Tables.customer(spark, sf).as("c")
      .join(graft.sources.Tables.orders(spark, sf)
          .filter(col("o_totalprice") > 450000).as("o"),
        col("c.c_custkey") === col("o.o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("plan probes the bloom below the exact join (prefilter at the scan side)") {
    val df = BloomOps.queries("q_bloom_semi_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the plan:\n$plan")
    // the probe must sit in a Filter, not be evaluated post-join: find
    // the optimized plan's Filter containing might_contain and check it
    // has no Join below it
    val optimized = df.queryExecution.optimizedPlan
    val bloomFilters = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString().contains("might_contain") => f
    }
    assert(bloomFilters.nonEmpty, "no Filter with might_contain in optimized plan")
    bloomFilters.foreach { f =>
      val joinsBelow = f.child.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      assert(joinsBelow.isEmpty,
        "bloom probe should be pushed below the join, not evaluated above it")
    }
  }

  test("graft_bloom_agg over empty build side yields empty result (null bloom)") {
    graft.sources.Tables.orders(spark, sf)
      .createOrReplaceTempView("graft_bloom_orders_empty")
    val n = spark.sql(
      """WITH hot AS (
        |  SELECT o_custkey FROM graft_bloom_orders_empty WHERE o_totalprice > 1e12),
        |b AS (SELECT graft_bloom_agg(xxhash64(o_custkey)) AS bf FROM hot)
        |SELECT o_custkey FROM graft_bloom_orders_empty
        |WHERE graft_might_contain((SELECT bf FROM b), xxhash64(o_custkey))""".stripMargin)
      .count()
    assert(n === 0L)
  }
}
