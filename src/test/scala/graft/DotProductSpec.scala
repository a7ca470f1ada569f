package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.DotProduct.dotFast
import graft.operators.VectorOps

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  private val pairs = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(0.1, -0.2), Array(-0.3, 0.7)),
    (Array.empty[Double], Array.empty[Double]))

  test("bit-identical to the HOF fold on random vectors") {
    val rnd = new scala.util.Random(7)
    val vs = (1 to 50).map(_ =>
      (Array.fill(64)(rnd.nextDouble() * 2 - 1), Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = (pairs ++ vs).toDF("a", "b")
      .select(dotFast(col("a"), col("b")).as("fast"),
        VectorOps.dot(col("a"), col("b")).as("hof"))
    df.collect().foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("null semantics: null array, null element, length mismatch") {
    val df = Seq(
      (Some(Seq(1.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0)), Some(Seq(1.0))),
      (Some(Seq(1.0)), Some(Seq(1.0)))).toDF("a", "b")
      .select(dotFast(col("a").cast("array<double>"), col("b").cast("array<double>")).as("d"))
    val rows = df.collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))  // mismatched lengths → null (zip_with pads null)
    assert(rows(2).getDouble(0) === 1.0)
    // null element
    val df2 = spark.sql("SELECT cast(array(1.0, null) as array<double>) a, cast(array(1.0, 2.0) as array<double>) b")
      .select(dotFast(col("a"), col("b")).as("d"))
    assert(df2.collect()(0).isNullAt(0))
  }

  test("optimizer rule rewrites the HOF dot idiom into graft_dot") {
    // parquet-backed input: literal inputs would constant-fold away
    // before the rewritten expression is observable
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val df = emb.select(col("vec_id"), VectorOps.dot(col("v"), col("v")).as("d"))
    assert(df.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      df.queryExecution.optimizedPlan.toString.take(600))
    // rewritten result == direct codegen'd result, bit for bit
    val direct = emb.select(col("vec_id"), dotFast(col("v"), col("v")).as("d"))
    assert(df.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq ===
      direct.orderBy("vec_id").collect().map(_.getDouble(1)).toSeq)
    // SQL form of the idiom rewrites too
    emb.createOrReplaceTempView("emb_rewrite_v")
    val sqlDf = spark.sql(
      """SELECT aggregate(zip_with(v, v, (x, y) -> x * y),
        |                 cast(0.0 as double), (acc, z) -> acc + z) AS d
        |FROM emb_rewrite_v""".stripMargin)
    assert(sqlDf.queryExecution.optimizedPlan.toString.contains("graft_dot"))
  }

  test("graft_dot registered for SQL via GraftExtensions") {
    // SparkTestBase creates the shared session with
    // spark.sql.extensions=graft.plans.GraftExtensions
    val r = spark.sql(
      "SELECT graft_dot(cast(array(1.0,2.0) as array<double>), cast(array(3.0,4.0) as array<double>)) AS d")
      .collect()(0).getDouble(0)
    assert(r === 11.0)
  }
}
