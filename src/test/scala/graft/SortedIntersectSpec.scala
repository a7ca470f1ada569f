package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectCount.sortedInterCount

class SortedIntersectSpec extends SparkTestBase {
  import spark.implicits._

  test("equals size(array_intersect) on random sorted distinct sets") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map { _ =>
      def set() = Array.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (set(), set())
    } :+ ((Array.empty[Long], Array(1L, 2L))) :+ ((Array(5L), Array(5L)))
    val df = rows.toDF("a", "b")
      .select(sortedInterCount(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("ref"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null array yields null; SQL registration works; codegen'd in plans") {
    val one = Seq((Array(1L, 2L), Option.empty[Array[Long]])).toDF("a", "b")
      .select(sortedInterCount(col("a"), col("b")).as("c"))
    assert(one.collect()(0).isNullAt(0))
    spark.createDataset(Seq((Seq(1L, 3L, 9L), Seq(3L, 9L, 11L))))
      .toDF("a", "b").createOrReplaceTempView("si_t")
    val viaSql = spark.sql("SELECT graft_sorted_inter(a, b) AS c FROM si_t")
    assert(viaSql.collect()(0).getLong(0) === 2L)
    // survives in a real scan's projection (a literal-only frame
    // constant-folds away before planning) — i.e. not CodegenFallback
    val real = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(sort_array(array_distinct(split(lower(col("text")), " "))).as("w"))
      .select(sortedInterCount(
        transform(col("w"), x => xxhash64(x)),
        transform(col("w"), x => xxhash64(x))).as("c"))
    val plan = real.queryExecution.executedPlan.toString
    assert(plan.contains("graft_sorted_inter"))
  }
}
