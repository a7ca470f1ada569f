package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.plans.{AsOfForward, AsOfJoin}

/** Specs for the native as-of join: window-model equality, left-outer
  * semantics, partition invariance, and physical plan shape. */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def sides() = {
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("cuser"), col("ts").as("cts"))
    (ev, purchases, clicks)
  }

  private def run(purchases: org.apache.spark.sql.DataFrame,
                  clicks: org.apache.spark.sql.DataFrame) =
    AsOfJoin(purchases, clicks,
      Seq(col("user_id")), Seq(col("cuser")),
      Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")))

  test("matches the union+window as-of model, including unmatched lefts as nulls") {
    val (ev, purchases, clicks) = sides()
    val got = run(purchases, clicks)
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq

    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = ev.filter(col("event_type").isin("click", "purchase"))
      .withColumn("cid", last(when(col("event_type") === "click", col("event_id")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), coalesce(col("cid"), lit(-1L)))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(got === ref)
    assert(got.nonEmpty)
    assert(got.exists(_._2 == -1L), "expected at least one purchase with no prior click")
  }

  test("partition-invariant under AQE: any input partitioning, same result") {
    val (_, purchases, clicks) = sides()
    val base = run(purchases, clicks)
      .select("purchase_id", "click_id").orderBy("purchase_id")
      .collect().map(_.toSeq).toSeq
    Seq(1, 7).foreach { n =>
      val again = run(purchases.repartition(n), clicks.repartition(n + 2))
        .select("purchase_id", "click_id").orderBy("purchase_id")
        .collect().map(_.toSeq).toSeq
      assert(again === base, s"repartition($n)")
    }
  }

  test("plan: sort-merge shape — one exchange+sort per side, single merge node") {
    val (_, purchases, clicks) = sides()
    val df = run(purchases, clicks)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "as-of must not plan a pair blowup")
    assert(p.contains("Sort") && p.contains("Exchange"))
  }

  test("forward direction matches the lead-window model") {
    val (ev, purchases, clicks) = sides()
    val got = AsOfJoin(purchases, clicks,
        Seq(col("user_id")), Seq(col("cuser")),
        Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")),
        direction = AsOfForward)
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq

    // reference: union trick with a FOLLOWING window — first click
    // strictly after the purchase in (ts, event_id) order
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(1, Window.unboundedFollowing)
    val ref = ev.filter(col("event_type").isin("click", "purchase"))
      .withColumn("cid", first(when(col("event_type") === "click", col("event_id")),
        ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), coalesce(col("cid"), lit(-1L)))
      .orderBy("event_id").as[(Long, Long)].collect().toSeq
    assert(got === ref)
    assert(got.exists(_._2 == -1L), "expected at least one purchase with no later click")
    assert(got.exists(_._2 != -1L))
  }

  test("inner semantics drop unmatched lefts and preserve right-side nullability") {
    val (_, purchases, clicks) = sides()
    val outer = run(purchases, clicks)
    val inner = AsOfJoin(purchases, clicks,
      Seq(col("user_id")), Seq(col("cuser")),
      Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")),
      inner = true)
    val outerMatched = outer.filter(col("click_id").isNotNull)
      .select("purchase_id", "click_id").orderBy("purchase_id")
      .collect().map(_.toSeq).toSeq
    val innerRows = inner.select("purchase_id", "click_id").orderBy("purchase_id")
      .collect().map(_.toSeq).toSeq
    assert(innerRows === outerMatched)
    assert(innerRows.size < outer.count(), "some purchases must be unattributed")
    // inner emits right rows unchanged, so nullability must MATCH the
    // right input (outer mode forces nullable for the null-fill)
    assert(inner.schema("click_id").nullable === clicks.schema("click_id").nullable,
      "inner as-of must preserve the right side's nullability")
    assert(outer.schema("click_id").nullable,
      "outer as-of must force the right side nullable")
  }

  test("hand-built edge cases: ties, equal timestamps, empty right") {
    val l = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 10L, 102L))
      .toDF("k", "t", "lid")
    val r = Seq((1L, 10L, 900L), (1L, 10L, 901L), (1L, 15L, 902L))
      .toDF("k", "t", "rid")
    val out = AsOfJoin(l, r, Seq(col("k")), Seq(col("k")),
        Seq(col("t"), col("lid")), Seq(col("t"), col("rid")))
      .select(col("lid"), col("rid"))
      .orderBy("lid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1))).toSeq
    // lid=100 at t=10: clicks at t=10 have rid 900/901 — (10,900)<(10,100)? order
    // compares (t, id) lexicographically: (10,900) >= (10,100) → no match.
    // lid=101 at t=20: last right before = (15,902). k=2 has no right rows.
    assert(out === Seq((100L, -1L), (101L, 902L), (102L, -1L)))

    val empty = AsOfJoin(l, r.filter(col("k") > 99), Seq(col("k")), Seq(col("k")),
      Seq(col("t"), col("lid")), Seq(col("t"), col("rid")))
    assert(empty.count() === 3 &&
      empty.filter(col("rid").isNotNull).count() === 0)
  }
}
