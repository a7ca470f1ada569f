package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.TopKPerGroup

/** Specs for the native top-k-per-group whole-operator: exact
  * row_number() semantics, partition invariance, physical plan shape. */
class TopKPerGroupSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def windowForm(k: Int) = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    graft.sources.Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_custkey", "rn").collect().map(_.toSeq).toSeq

  test("equals the row_number window form, including groups smaller than k") {
    val orders = graft.sources.Tables.orders(spark, sf)
    Seq(1, 3, 7).foreach { k =>
      val native = TopKPerGroup(orders, Seq(col("o_custkey")),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc), k)
      assert(canon(native) === canon(windowForm(k)), s"k=$k")
    }
  }

  test("partition-invariant: same result whatever the input partitioning") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val base = canon(TopKPerGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_orderdate").asc, col("o_orderkey").asc), 2))
    Seq(1, 13).foreach { n =>
      val again = canon(TopKPerGroup(orders.repartition(n), Seq(col("o_custkey")),
        Seq(col("o_orderdate").asc, col("o_orderkey").asc), 2))
      assert(again === base, s"repartition($n)")
    }
  }

  test("descending order and expression keys work; empty input yields empty output") {
    val df = Seq((1L, "a", 10.0), (1L, "b", 30.0), (1L, "c", 20.0), (2L, "d", 5.0))
      .toDF("k", "name", "v")
    val top = TopKPerGroup(df, Seq(pmod(col("k"), lit(10))),
      Seq(col("v").desc, col("name").asc), 2, rankName = "r")
    val got = top.select("k", "name", "r").orderBy("k", "r")
      .as[(Long, String, Int)].collect().toSeq
    assert(got === Seq((1L, "b", 1), (1L, "c", 2), (2L, "d", 1)))

    val empty = TopKPerGroup(df.filter(col("k") > 99), Seq(col("k")),
      Seq(col("v").asc), 3)
    assert(empty.count() === 0)
  }

  test("plan: partial below the exchange, final above, no Sort/Window anywhere") {
    val orders = graft.sources.Tables.orders(spark, sf)
    val df = TopKPerGroup(orders, Seq(col("o_custkey")),
      Seq(col("o_orderdate").asc, col("o_orderkey").asc), 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroupPartial"))
    assert(p.contains("Exchange"))
    assert(!p.toLowerCase.contains("sortexec") && !p.contains("WindowExec"))
    // partial must run BELOW the exchange (map-side)
    val partialIdx = p.indexOf("TopKPerGroupPartial")
    val exchangeIdx = p.indexOf("Exchange")
    assert(exchangeIdx < partialIdx, "exchange should sit above the partial in the tree")
  }

  test("map-side partial bounds shuffle volume to k rows per group per partition") {
    // 1000 rows, one group, k=1 over 4 input partitions → the partial
    // emits at most 4 rows (one survivor per partition) into the
    // exchange, not 1000 (AQE off so the static plan is inspectable)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.range(1000).select(lit(1L).as("k"), col("id").as("v"))
        .repartition(4)
      val top = TopKPerGroup(df, Seq(col("k")), Seq(col("v").asc), 1)
      // collect on `top` itself so the metric below belongs to this exact
      // query execution
      assert(top.collect().map(_.getAs[Long]("v")).toSeq === Seq(0L))
      val partialRows = top.queryExecution.executedPlan.collect {
        case e: graft.plans.TopKPerGroupExec if e.rankAttr.isEmpty =>
          e.metrics("numOutputRows").value
      }
      assert(partialRows.nonEmpty, "partial operator not found in executed plan")
      assert(partialRows.head <= 4,
        s"partial emitted ${partialRows.head} rows into the shuffle, expected <= 4")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
