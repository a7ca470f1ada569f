package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("salted join equals the plain join on a skewed key; salt is in the shuffle key") {
    // skew: collapse all lineitems onto 3 hot keys
    val li = Tables.lineitem(spark, sf)
      .select((col("l_orderkey") % 3).as("hot_key"), col("l_linenumber"),
        col("l_orderkey"), col("l_quantity"))
    val dim = spark.range(3).select(col("id").as("hot_key"),
      concat(lit("bucket_"), col("id")).as("label"))

    val plain = li.join(dim, "hot_key")
    val salted = Skew.saltedJoin(li, dim, "hot_key",
      spread = col("l_orderkey") * 10 + col("l_linenumber"), nSalts = 8)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("hot_key", "l_orderkey", "l_linenumber", "label")
        .orderBy("hot_key", "l_orderkey", "l_linenumber")
        .collect().map(_.toSeq).toSeq
    assert(canon(salted) === canon(plain))
    assert(salted.count() === li.count())
    // the physical join key must include the salt column
    assert(salted.queryExecution.executedPlan.toString.contains("__salt"))
  }

  test("salted aggregation equals the plain aggregation") {
    val li = Tables.lineitem(spark, sf)
      .select((col("l_orderkey") % 3).as("hot_key"),
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val plain = li.groupBy("hot_key")
      .agg(count(lit(1)).as("n"), sum(graft.functions.Scalars.cents(col("l_quantity"))).as("qty_c"))
      .orderBy("hot_key").collect().map(_.toSeq).toSeq
    val salted = Skew.saltedAgg(li, "hot_key",
        spread = col("l_orderkey") * 10 + col("l_linenumber"), nSalts = 8)(
        ("n", count(lit(1)), (c: String) => sum(col(c))),
        ("qty_c", sum(graft.functions.Scalars.cents(col("l_quantity"))), (c: String) => sum(col(c))))
      .orderBy("hot_key").collect().map(_.toSeq).toSeq
    assert(salted === plain)
  }
}
