package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Scalars.cents
import graft.sources.Tables._
import java.time.LocalDateTime

/** Relational completeness suite (SURVEY.md §2.12 E9): TPC-H-shaped
  * aggregation/join/top-k/set-op/rollup queries over the driver testdata.
  *
  * Scale notes (the shapes that must survive 100 TB):
  * - Q1: single hash-aggregate after a pushed-down scan filter — partial
  *   (map-side) aggregation means shuffle size = O(groups), not O(rows).
  * - Q3: two shuffles max; AQE picks broadcast for the filtered customer
  *   side when it fits. All money math is integer-cents (exact, order-
  *   independent — see Scalars.cents).
  * - top-k: TakeOrderedAndProject (per-partition heap + driver merge of
  *   k rows), never a global sort.
  */
object RelQueries {
  type Q = (SparkSession, String) => DataFrame

  private val q1Cutoff = LocalDateTime.of(1998, 9, 2, 0, 0)
  private val q3Date   = LocalDateTime.of(1998, 1, 1, 0, 0)

  val queries: Map[String, Q] = Map(
    "q_tpch_q1" -> ((s, d) => {
      val li = lineitem(s, d).filter(col("l_shipdate") <= lit(q1Cutoff))
        .select(col("l_returnflag"), col("l_linestatus"),
          cents(col("l_quantity")).as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          cents(col("l_discount")).as("disc_pct"),
          cents(col("l_tax")).as("tax_pct"))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(col("qty_c")).cast("double") / 100).as("sum_qty"),
          (sum(col("price_c")).cast("double") / 100).as("sum_base_price"),
          (sum(col("price_c") * (lit(100L) - col("disc_pct"))).cast("double") / 10000)
            .as("sum_disc_price"),
          (sum(col("price_c") * (lit(100L) - col("disc_pct")) * (lit(100L) + col("tax_pct")))
            .cast("double") / 1000000).as("sum_charge"),
          (sum(col("qty_c")).cast("double") / (count(lit(1)) * 100)).as("avg_qty"),
          (sum(col("price_c")).cast("double") / (count(lit(1)) * 100)).as("avg_price"),
          (sum(col("disc_pct")).cast("double") / (count(lit(1)) * 100)).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q_tpch_q3" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = orders(s, d).filter(col("o_orderdate") < lit(q3Date))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = lineitem(s, d).filter(col("l_shipdate") > lit(q3Date))
        .select(col("l_orderkey"),
          (cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .as("rev_c"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .withColumn("order_date", date_format(col("o_orderdate"), "yyyy-MM-dd"))
        .groupBy("l_orderkey", "order_date", "o_orderpriority")
        .agg((sum(col("rev_c")).cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // sort + limit top-k: TakeOrderedAndProject, not a global sort
    "q_topk_orders" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)),

    "q_intersect" -> ((s, d) => {
      val a = orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val b = customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      a.intersect(b).orderBy("custkey")
    }),

    "q_except" -> ((s, d) => {
      val a = customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey").as("custkey"))
      val b = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey").as("custkey"))
      a.except(b).orderBy("custkey")
    }),

    "q_rollup" -> ((s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("l_quantity"))).cast("double") / 100).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    "q_groupby_agg" -> ((s, d) =>
      documents(s, d).groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("lang")))

  val oracle: Map[String, String] = Map(
    "q_tpch_q1" ->
      """WITH t AS (
        |  SELECT l_returnflag, l_linestatus,
        |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c,
        |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
        |    CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_pct,
        |    CAST(ROUND(l_tax * 100) AS BIGINT) AS tax_pct
        |  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
        |SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(SUM(qty_c) AS BIGINT) AS DOUBLE) / 100 AS sum_qty,
        |  CAST(CAST(SUM(price_c) AS BIGINT) AS DOUBLE) / 100 AS sum_base_price,
        |  CAST(CAST(SUM(price_c * (100 - disc_pct)) AS BIGINT) AS DOUBLE) / 10000 AS sum_disc_price,
        |  CAST(CAST(SUM(price_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS DOUBLE) / 1000000 AS sum_charge,
        |  CAST(CAST(SUM(qty_c) AS BIGINT) AS DOUBLE) / (COUNT(*) * 100) AS avg_qty,
        |  CAST(CAST(SUM(price_c) AS BIGINT) AS DOUBLE) / (COUNT(*) * 100) AS avg_price,
        |  CAST(CAST(SUM(disc_pct) AS BIGINT) AS DOUBLE) / (COUNT(*) * 100) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM t GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q3" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority,
        |  CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
        |       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS DOUBLE) / 10000 AS revenue
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |ORDER BY custkey""".stripMargin,

    "q_except" ->
      """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY custkey""".stripMargin,

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100 AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q_groupby_agg" ->
      """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
        |  COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
}
