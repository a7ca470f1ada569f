package graft

import org.apache.spark.sql.functions._
import graft.functions.NGrams.ngrams

/** NGrams: equivalence with the interpreted HOF chain it replaces,
  * edge cases, codegen participation, and the SQL registration. */
class NGramsSpec extends SparkTestBase {
  import spark.implicits._

  private def hofTrigrams(words: org.apache.spark.sql.Column) = {
    val g2 = zip_with(words, slice(words, lit(2), size(words)),
      (x, y) => concat_ws(" ", x, y))
    val g3 = zip_with(g2, slice(words, lit(3), size(words)),
      (xy, z) => concat_ws(" ", xy, z))
    slice(g3, lit(1), greatest(size(words) - 2, lit(0)))
  }

  test("matches the zip_with/slice HOF chain on real corpus text") {
    val words = filter(split(lower(col("text")), " "), t => t =!= "")
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        ngrams(words, 3).as("fast"), hofTrigrams(words).as("ref"))
    assert(df.filter(not(col("fast") === col("ref"))).count() === 0)
    assert(df.filter(size(col("fast")) > 0).count() > 0)
  }

  test("edge cases: short arrays, empty array, n=1, null input") {
    val rows = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b")),   // shorter than n=3
      (3L, Seq.empty[String]))
    val out = rows.toDF("id", "ws")
      .select(col("id"), ngrams(col("ws"), 3).as("g3"), ngrams(col("ws"), 1).as("g1"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getSeq[String](2)))
      .sortBy(_._1)
    assert(out(0)._2 === Seq("a b c", "b c d") && out(0)._3 === Seq("a", "b", "c", "d"))
    assert(out(1)._2 === Seq.empty && out(1)._3 === Seq("a", "b"))
    assert(out(2)._2 === Seq.empty && out(2)._3 === Seq.empty)
    val withNull = Seq((1L, Option.empty[Seq[String]])).toDF("id", "ws")
      .select(ngrams(col("ws"), 2)).collect()
    assert(withNull(0).isNullAt(0), "null array must stay null")
  }

  test("participates in whole-stage codegen and is SQL-callable") {
    // literal inputs constant-fold to a LocalTableScan, so prove
    // codegen on a file-backed scan: the Project evaluating
    // graft_ngrams must carry the whole-stage star marker. Words must
    // come from array_remove, not a filter() lambda — HOFs are
    // CodegenFallback and would evict the whole Project from codegen.
    val words = array_remove(split(lower(col("text")), " "), "")
    val df = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(ngrams(words, 3).as("g"))
    df.collect() // must not fail codegen compilation at execution time
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("graft_ngrams"))
    assert(projLine.exists(_.contains("*(")),
      s"graft_ngrams must sit inside a WholeStageCodegen span:\n$plan")
    val viaSql = spark.sql("SELECT graft_ngrams(array('p', 'q', 'r'), 2) AS g")
      .head.getSeq[String](0)
    assert(viaSql === Seq("p q", "q r"))
  }
}
