package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingJobs
import java.nio.file.Files

/** Streaming pipeline specs: file-source clean stage and the foreachBatch
  * SCD upsert, driven end-to-end with AvailableNow triggers; windowed/
  * session aggregations checked against their batch equivalents. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def writeRawBatch(dir: String, name: String, rows: Seq[String]): Unit =
    Files.writeString(java.nio.file.Paths.get(dir, name),
      rows.mkString("", "\n", "\n"))

  private def rawLine(name: String, price: Double, day: String, data: Double): String =
    s"""{"product_name": "$name", "competitor_name": "mobileviking",
       | "product_category": "mobile_prepaid", "product_url": "https://mv/$name",
       | "price": $price, "scraped_at": "$day", "data": $data, "minutes": -1.0,
       | "sms": -1, "upload_speed": "20mbps", "download_speed": "1gbps"}"""
      .stripMargin.replaceAll("\n", "")

  test("streaming clean + SCD upsert: incremental drops accumulate versioned warehouse") {
    val rawDir = Files.createTempDirectory("graft_stream_raw").toFile.getAbsolutePath
    val whDir = Files.createTempDirectory("graft_stream_wh").toFile.getAbsolutePath
    val ckDir = Files.createTempDirectory("graft_stream_ck").toFile.getAbsolutePath

    // drop 1: two products
    writeRawBatch(rawDir, "batch1.ndjson", Seq(
      rawLine("mobile_a", 15.0, "2023-10-05", 15.0),
      rawLine("mobile_b", 20.0, "2023-10-05", 30.0)))
    def runOnce(): Unit = {
      val q = StreamingJobs.scdUpsertWriter(
          StreamingJobs.cleanStream(spark, rawDir), whDir)
        .option("checkpointLocation", ckDir)
        .start()
      q.awaitTermination()
    }
    runOnce()
    val st1 = StreamingJobs.loadState(spark, whDir)
    assert(st1.competitors.count() === 1)
    assert(st1.products.count() === 2)
    assert(st1.features.count() === 2)
    // speeds parsed by the streaming clean stage
    assert(st1.features.select("download_speed").as[Double].collect().toSet === Set(1000.0))

    // drop 2: identical product (no-op) + price change on mobile_b
    writeRawBatch(rawDir, "batch2.ndjson", Seq(
      rawLine("mobile_a", 15.0, "2023-10-06", 15.0),
      rawLine("mobile_b", 25.0, "2023-10-06", 30.0)))
    runOnce()
    val st2 = StreamingJobs.loadState(spark, whDir)
    assert(st2.products.count() === 2)      // no new products
    assert(st2.features.count() === 2)      // no feature change
    assert(st2.prices.count() === 3)        // one new price version
    assert(st2.prices.filter(col("price") === 25.0).count() === 1)

    // restart from the same checkpoint with no new files: the source
    // replays nothing, the warehouse is unchanged
    runOnce()
    val st3 = StreamingJobs.loadState(spark, whDir)
    assert(st3.products.count() === 2 && st3.prices.count() === 3)
  }

  test("SCD upsert replays are exactly-once: a re-delivered micro-batch appends nothing") {
    val rawDir = Files.createTempDirectory("graft_replay_raw").toFile.getAbsolutePath
    val whDir = Files.createTempDirectory("graft_replay_wh").toFile.getAbsolutePath
    val ckDir = Files.createTempDirectory("graft_replay_ck").toFile.getAbsolutePath

    writeRawBatch(rawDir, "b1.ndjson", Seq(rawLine("mobile_a", 15.0, "2023-10-05", 15.0)))
    val q = StreamingJobs.scdUpsertWriter(
        StreamingJobs.cleanStream(spark, rawDir), whDir)
      .option("checkpointLocation", ckDir)
      .start()
    q.awaitTermination()
    // a price change ran as batch 1, so two price versions exist — the
    // state in which a naive replay WOULD duplicate (the ASC probe
    // compares against the oldest version)
    writeRawBatch(rawDir, "b2.ndjson", Seq(rawLine("mobile_a", 25.0, "2023-10-06", 15.0)))
    val q2 = StreamingJobs.scdUpsertWriter(
        StreamingJobs.cleanStream(spark, rawDir), whDir)
      .option("checkpointLocation", ckDir)
      .start()
    q2.awaitTermination()
    val before = StreamingJobs.loadState(spark, whDir)
    assert(before.prices.count() === 2)
    // batch 1's tag rides inside each table's committed manifest
    assert(graft.sources.SnapshotTable(s"$whDir/product_prices").tagCommitted("1"))

    // simulate the crash-replay: Structured Streaming re-delivers batch 1
    // (side effects done, checkpoint commit lost) — the tag in snapshot
    // history must short-circuit it
    val replayed = graft.etl.CleanJob.cleanProducts(
        spark.read.schema(graft.schema.Schemas.rawProduct).json(s"$rawDir/b2.ndjson"))
      .withColumn("scraped_at", to_date(col("scraped_at")))
    StreamingJobs.upsertBatch(replayed, batchId = 1L, whDir)
    val after = StreamingJobs.loadState(spark, whDir)
    assert(after.prices.count() === 2, "replayed batch must not re-append its delta")
    assert(after.features.count() === before.features.count())
    assert(after.products.count() === before.products.count())

    // the same data under a NEW batchId is a genuine new batch: the
    // faithful ASC probe sees price 25 != oldest 15 and stages again —
    // proving the tag (not accidental no-op staging) is what made the
    // replay safe
    StreamingJobs.upsertBatch(replayed, batchId = 2L, whDir)
    assert(StreamingJobs.loadState(spark, whDir).prices.count() === 3)
  }

  test("flatMapGroupsWithState sessionizer: closes on gap across micro-batches, state per active user") {
    import graft.streaming.StreamingJobs.{SessionEvent, ClosedSession}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[SessionEvent]
    val q = StreamingJobs.sessionizeWithState(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_sessions")
      .start()
    try {
      val t0 = 1700000000L
      // batch 1: user 1 two events 10 min apart (one open session),
      // user 2 one event
      input.addData(SessionEvent(1L, t0, 2.0), SessionEvent(1L, t0 + 600, 3.0),
        SessionEvent(2L, t0, 7.0))
      q.processAllAvailable()
      assert(spark.table("state_sessions").count() === 0,
        "open sessions must not be emitted")
      // batch 2: user 1 returns after a 40-min gap → session 1 closes,
      // a new one opens; user 2 stays open
      input.addData(SessionEvent(1L, t0 + 3000, 1.0))
      q.processAllAvailable()
      val closed = spark.table("state_sessions").as[ClosedSession].collect().toSeq
      assert(closed === Seq(ClosedSession(1L, t0, t0 + 600, 2L, 5.0)))
      // batch 3: an in-gap event extends the CURRENT session, closes nothing
      input.addData(SessionEvent(1L, t0 + 3300, 4.0))
      q.processAllAvailable()
      assert(spark.table("state_sessions").count() === 1)
      // batch 4: a LATE event (before lastSeen=t0+3300, within gap)
      // joins the session but must not drag the horizon backwards...
      input.addData(SessionEvent(1L, t0 + 2000, 1.0))
      q.processAllAvailable()
      // ...probe at t0+4950: within gap of the TRUE horizon (4950-3300
      // = 1650 < 1800) but beyond the stale one (4950-2000 = 2950) —
      // a horizon regression would spuriously close here
      input.addData(SessionEvent(1L, t0 + 4950, 1.0))
      q.processAllAvailable()
      assert(spark.table("state_sessions").count() === 1,
        "late event must not regress the session horizon")
      // an event a full gap OLDER than the open session belongs to an
      // earlier, already-over session: emitted as its own closed
      // singleton, open session untouched
      input.addData(SessionEvent(1L, t0 - 5000, 9.0))
      q.processAllAvailable()
      val all = spark.table("state_sessions").as[ClosedSession].collect()
      assert(all.length === 2)
      assert(all.exists(c => c.session_start == t0 - 5000 && c.n_events == 1L))
    } finally q.stop()
  }

  test("stream-stream interval join: purchases attribute to clicks within the hour") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val clicksIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val purchasesIn = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, Long)]
    val clicks = clicksIn.toDF()
      .select(col("_1").as("click_id"), col("_2").as("cuser"),
        timestamp_seconds(col("_3")).as("cts"))
    val purchases = purchasesIn.toDF()
      .select(col("_1").as("purchase_id"), col("_2").as("user_id"),
        timestamp_seconds(col("_3")).as("pts"))
    val q = StreamingJobs.attributionStream(purchases, clicks)
      .select("purchase_id", "click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out")
      .start()
    try {
      val t0 = 1700000000L
      // user 7: click 10 min before the purchase → attributed.
      // user 8: click 3 hours before → outside the interval, no row.
      clicksIn.addData((100L, 7L, t0), (200L, 8L, t0 - 10800))
      purchasesIn.addData((900L, 7L, t0 + 600), (901L, 8L, t0 + 600))
      q.processAllAvailable()
      val got = spark.table("attrib_out").as[(Long, Long)].collect().toSet
      assert(got === Set((900L, 100L)))
      // a later click lands inside a later purchase's window, across batches
      clicksIn.addData((101L, 7L, t0 + 1200))
      purchasesIn.addData((902L, 7L, t0 + 1800))
      q.processAllAvailable()
      val got2 = spark.table("attrib_out").as[(Long, Long)].collect().toSet
      // purchase 902 (t0+1800) matches clicks at t0 (30 min prior) AND
      // t0+1200 (10 min prior) — both within the hour
      assert(got2 === Set((900L, 100L), (902L, 100L), (902L, 101L)))
    } finally q.stop()
  }

  test("streaming dedup: duplicates within the watermark are dropped across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val events = input.toDF()
      .select(col("_1").as("event_id"), timestamp_seconds(col("_2")).as("ts"))
    val q = StreamingJobs.dedupStream(events, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      val t0 = 1700000000L
      // batch 1: id 1 twice (in-batch dup) + id 2
      input.addData((1L, t0), (1L, t0 + 5), (2L, t0 + 10))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted
        === Array(1L, 2L))
      // batch 2: id 1 again within the watermark → dropped; id 3 is new
      input.addData((1L, t0 + 60), (3L, t0 + 70))
      q.processAllAvailable()
      assert(spark.table("dedup_out").select("event_id").as[Long].collect().sorted
        === Array(1L, 2L, 3L))
    } finally q.stop()
  }

  test("streaming sketch profile equals the batch sketch over the union of micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)]
    val tokens = input.toDF().select(col("_1").as("source"), col("_2").as("token"))
    val q = StreamingJobs.sketchProfileStream(tokens)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sketch_out")
      .start()
    try {
      val b1 = Seq.tabulate(40)(i => ("s1", s"w${i % 7}")) ++
        Seq.tabulate(10)(i => ("s2", s"x$i"))
      val b2 = Seq.tabulate(35)(i => ("s1", s"w${i % 11}")) ++
        Seq.tabulate(10)(i => ("s2", s"x${i + 5}"))
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val streamed = spark.table("sketch_out")
        .select("source", "distinct_est", "cms")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .sortBy(_._1).toSeq
      // batch sketch over the union, shuffled to scramble arrival order
      val batch = scala.util.Random.shuffle(b1 ++ b2).toDF("source", "token")
        .groupBy("source")
        .agg(graft.functions.HllSketch.hllDistinct(col("token")).as("d"),
          graft.functions.CmsSketch.cms(col("token")).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2)))
        .sortBy(_._1).toSeq
      assert(streamed === batch,
        "incremental sketch state must equal the batch sketch bit-for-bit")
      // and the HLL estimate is sane at these cardinalities (exact range)
      val bySource = streamed.map(t => t._1 -> t._2).toMap
      assert(bySource("s1") === 11L && bySource("s2") === 15L)
    } finally q.stop()
  }

  test("append-mode windows emit exactly when the watermark closes them") {
    val dir = Files.createTempDirectory("graft_wm_in").toFile.getAbsolutePath
    val ck = Files.createTempDirectory("graft_wm_ck").toFile.getAbsolutePath
    val schema = "user_id LONG, ts TIMESTAMP, value DOUBLE, event_type STRING"
    def runOnce(name: String): Seq[(String, Long)] = {
      // memory sink can't resume from a checkpoint; collect emitted rows
      // via foreachBatch (which can)
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      val q = StreamingJobs.eventWindowStream(spark.readStream.schema(schema).json(dir))
        .writeStream
        .outputMode("append").option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted ++= batch
            .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"))
            .as[(String, Long)](org.apache.spark.sql.Encoders.tuple(
              org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong))
            .collect()
          ()
        }
        .start()
      q.awaitTermination()
      emitted.toSeq.sorted
    }
    // batch 1: events at 00:10 and 01:10 → no window is older than
    // watermark (max 01:10 - 2h) → nothing emitted yet
    Files.writeString(java.nio.file.Paths.get(dir, "b1.ndjson"),
      """{"user_id": 1, "ts": "2024-01-01T00:10:00.000Z", "value": 1.0, "event_type": "click"}
        |{"user_id": 1, "ts": "2024-01-01T01:10:00.000Z", "value": 1.0, "event_type": "click"}"""
        .stripMargin)
    assert(runOnce("wm_run1") === Seq())
    // batch 2: an event at 06:00 advances the watermark to 04:00 →
    // the 00:00 and 01:00 windows close and are emitted exactly once
    Files.writeString(java.nio.file.Paths.get(dir, "b2.ndjson"),
      """{"user_id": 1, "ts": "2024-01-01T06:00:00.000Z", "value": 1.0, "event_type": "click"}""")
    assert(runOnce("wm_run2") === Seq(("00:00", 1L), ("01:00", 1L)))
  }

  test("windowed + session streaming aggregations match their batch forms") {
    val dir = Files.createTempDirectory("graft_stream_ev").toFile.getAbsolutePath
    val rows = Seq(
      """{"user_id": 1, "ts": "2024-01-01T00:05:00.000Z", "value": 10.0, "event_type": "click"}""",
      """{"user_id": 1, "ts": "2024-01-01T00:20:00.000Z", "value": 5.0, "event_type": "click"}""",
      """{"user_id": 1, "ts": "2024-01-01T02:00:00.000Z", "value": 2.0, "event_type": "click"}""",
      """{"user_id": 2, "ts": "2024-01-01T00:45:00.000Z", "value": 1.0, "event_type": "buy"}""")
    Files.writeString(java.nio.file.Paths.get(dir, "ev.ndjson"), rows.mkString("\n"))
    val schema = "user_id LONG, ts TIMESTAMP, value DOUBLE, event_type STRING"

    val stream = spark.readStream.schema(schema).json(dir)
    val windowed = StreamingJobs.eventWindowStream(stream)
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    windowed.awaitTermination()
    // append mode emits only watermark-closed windows; re-derive from the
    // batch form for the full picture
    val batchWin = StreamingJobs.eventWindowStream(spark.read.schema(schema).json(dir))
    assert(batchWin.isStreaming === false)
    val w = batchWin.orderBy("window_start", "event_type").collect()
    assert(w.map(r => (r.getAs[Long]("n"), r.getAs[Double]("total_value"))).toSeq ===
      Seq((1L, 1.0), (2L, 15.0), (1L, 2.0)))

    val sess = StreamingJobs.sessionStream(spark.read.schema(schema).json(dir))
      .orderBy("user_id", "session_start").collect()
    // user 1: events at 00:05 + 00:20 merge (gap 15m < 30m), 02:00 is new
    assert(sess.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).toSeq ===
      Seq((1L, 2L), (1L, 1L), (2L, 1L)))
  }
  test("streaming LSH near-dup: a duplicate arriving batches later is still caught") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingJobs
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val pairs = StreamingJobs.streamingNearDupPairs(
      input.toDF().toDF("doc_id", "text"))
    val ck = Files.createTempDirectory("graft_lshck").toString
    val q = pairs.writeStream.format("memory").queryName("lsh_pairs")
      .outputMode("append").option("checkpointLocation", ck).start()

    // batch 1: one base doc + one unrelated doc — no pairs yet; the
    // tokenless doc (the poison row that would NULL its signature) must
    // be dropped, not crash-loop the query
    input.addData((1L, "alpha beta gamma delta epsilon zeta"),
      (50L, "one two three four five six seven"),
      (99L, "   "))
    q.processAllAvailable()
    assert(spark.table("lsh_pairs").count() === 0)

    // batch 2 (a LATER micro-batch): an exact dup of doc 1 and a
    // near-dup of doc 50 — both must pair against state from batch 1
    input.addData((2L, "alpha beta gamma delta epsilon zeta"),
      (51L, "one two three four five six eight"))
    q.processAllAvailable()
    val found = spark.table("lsh_pairs")
      .select("d1", "d2").distinct().as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)), s"cross-batch exact dup missed: $found")
    // the near-dup shares 6/7 tokens — most minhashes agree
    assert(found.contains((50L, 51L)), s"cross-batch near dup missed: $found")
    // unrelated docs never pair
    assert(!found.exists { case (a, b) => (a <= 2) != (b <= 2) })

    // batch 3: another copy — pairs with BOTH earlier copies
    input.addData((3L, "alpha beta gamma delta epsilon zeta"))
    q.processAllAvailable()
    val f3 = spark.table("lsh_pairs")
      .select("d1", "d2").distinct().as[(Long, Long)].collect().toSet
    assert(f3.contains((1L, 3L)) && f3.contains((2L, 3L)))
    q.stop()
  }
  test("streaming LSH state survives restart: cross-restart dups caught, nothing re-emitted") {
    import graft.streaming.StreamingJobs
    val src = Files.createTempDirectory("graft_lshr_src").toString
    val out = Files.createTempDirectory("graft_lshr_out").toString
    val ck = Files.createTempDirectory("graft_lshr_ck").toString
    def drop(name: String, docs: Seq[(Long, String)]): Unit =
      Files.writeString(java.nio.file.Paths.get(src, name),
        docs.map { case (id, t) => s"""{"doc_id": $id, "text": "$t"}""" }.mkString("\n"))
    // every call is a FRESH query recovering from the same checkpoint —
    // a kill/restart at each step. The parquet file sink is
    // fault-tolerant (its _spark_metadata log admits exactly the
    // committed files), so re-emitted pairs would be visible as
    // duplicate rows.
    def runOnce(): Unit = {
      val q = StreamingJobs.streamingNearDupPairs(
          spark.readStream.schema("doc_id LONG, text STRING").json(src))
        .toDF().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drop("d1.json", Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (50L, "one two three four five six seven")))
    runOnce() // run 1: base docs into state, no pairs
    // run 2 (restart): an exact dup of doc 1 must pair against state
    // REBUILT FROM THE CHECKPOINT, not the live process
    drop("d2.json", Seq((2L, "alpha beta gamma delta epsilon zeta")))
    runOnce()
    import spark.implicits._
    val afterRestart = spark.read.parquet(out)
      .select("d1", "d2").as[(Long, Long)].collect().toSeq
    assert(afterRestart.toSet === Set((1L, 2L)),
      s"cross-restart dup must be caught exactly: $afterRestart")
    // run 3 (restart, nothing new): the replayed recovery must not
    // re-emit any pair
    val nBefore = spark.read.parquet(out).count()
    runOnce()
    assert(spark.read.parquet(out).count() === nBefore,
      "restart with no new data re-emitted pairs")
    // run 4 (restart): a third copy pairs with BOTH earlier copies,
    // one of which predates two restarts; per-(band, pair) rows stay
    // unique — nothing across the whole history was delivered twice
    drop("d3.json", Seq((3L, "alpha beta gamma delta epsilon zeta")))
    runOnce()
    val all = spark.read.parquet(out)
    val pairSet = all.select("d1", "d2").distinct().as[(Long, Long)].collect().toSet
    assert(pairSet === Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairSet")
    assert(all.count() === all.distinct().count(),
      "duplicate (band, pair) rows across restart boundaries")
  }

  test("streaming funnel: ordered stages across batches, late view retroactively validates") {
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.{FunnelIn, FunnelHit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelIn]
    val ck = Files.createTempDirectory("graft_funck").toString
    val q = StreamingJobs.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_hits")
      .outputMode("append").option("checkpointLocation", ck).start()
    def hits(): Set[(Long, String)] =
      spark.table("funnel_hits").as[FunnelHit].collect()
        .map(h => (h.user_id, h.stage)).toSet

    // batch 1: user 1 views at t=10 but their only click (t=5) PRECEDES
    // it — view reached, click not; user 2 clicks with no view at all
    input.addData(FunnelIn(1L, "view", 10L), FunnelIn(1L, "click", 5L),
      FunnelIn(2L, "click", 7L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view")))

    // batch 2: a later click qualifies (20 > 10); a purchase at t=15
    // does NOT (15 < first qualifying click 20)
    input.addData(FunnelIn(1L, "click", 20L), FunnelIn(1L, "purchase", 15L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click")))

    // batch 3: a LATE view at t=1 lowers first-view; click t=5 becomes
    // the first qualifying click, which retroactively validates the
    // t=15 purchase — full funnel, each stage emitted exactly once
    input.addData(FunnelIn(1L, "view", 1L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click"), (1L, "3_purchase")))
    val all = spark.table("funnel_hits").as[FunnelHit].collect()
    assert(all.length === 3, s"stages must emit exactly once, got ${all.toSeq}")
    q.stop()

    // the state machine agrees with the batch funnel's grouped-min
    // logic on the same event multiset (view 1, first click after = 5,
    // first purchase after 5 = 15) — semantics, not coincidence
  }

  test("streaming funnel: a just-arrived qualifying event survives a full pending list") {
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.{FunnelIn, FunnelHit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelIn]
    val ck = Files.createTempDirectory("graft_funck2").toString
    val q = StreamingJobs.funnelStream(input.toDS(), maxPending = 2)
      .writeStream.format("memory").queryName("funnel_hits2")
      .outputMode("append").option("checkpointLocation", ck).start()
    def hits(): Set[(Long, String)] =
      spark.table("funnel_hits2").as[FunnelHit].collect()
        .map(h => (h.user_id, h.stage)).toSet

    // batch 1: view at t=100; TWO not-yet-valid clicks (t=10, 20) fill
    // the pending list to maxPending
    input.addData(FunnelIn(1L, "view", 100L), FunnelIn(1L, "click", 10L),
      FunnelIn(1L, "click", 20L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view")))

    // batch 2: a click at t=200 qualifies THE MOMENT it arrives — the
    // full keep-smallest list must not swallow it (qualification runs
    // before truncation)
    input.addData(FunnelIn(1L, "click", 200L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click")),
      "immediately-valid click was dropped by maxPending truncation")

    // batch 3: the purchase after it must still find the qualifying
    // click — the pin must have survived truncation across batches
    input.addData(FunnelIn(1L, "purchase", 300L))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click"), (1L, "3_purchase")),
      "the pinned qualifying click must persist for purchase attribution")
    q.stop()
  }

  test("streaming funnel: event-time TTL evicts idle users, bounding the key count") {
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.{FunnelIn, FunnelHit}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    def T(s: Long): Long = s * 1000000L // seconds → micros
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[FunnelIn]
    val ck = Files.createTempDirectory("graft_funck3").toString
    val q = StreamingJobs.funnelStream(input.toDS(),
        evictAfterSec = 10L, lateSec = 25L)
      .writeStream.format("memory").queryName("funnel_hits3")
      .outputMode("append").option("checkpointLocation", ck).start()
    def stateRows(): Long =
      q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    def hits(): Set[(Long, String)] =
      spark.table("funnel_hits3").as[FunnelHit].collect()
        .map(h => (h.user_id, h.stage)).toSet

    // batch 1: user 1 completes the funnel (last event t=120); user 2
    // only views (last event t=100). TTLs: u1 → 130, u2 → 110; the
    // watermark after the batch is 120−25 = 95, under both — both stay.
    input.addData(FunnelIn(1L, "view", T(100)), FunnelIn(1L, "click", T(110)),
      FunnelIn(1L, "purchase", T(120)), FunnelIn(2L, "view", T(100)))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click"), (1L, "3_purchase"),
      (2L, "1_view")))
    assert(stateRows() === 2L, s"both users in state, got ${stateRows()}")

    // batch 2: user 3 at t=300 pushes the watermark to 275 — past BOTH
    // TTLs; users 1 and 2 evict, user 3 remains
    input.addData(FunnelIn(3L, "view", T(300)))
    q.processAllAvailable()
    assert(hits().contains((3L, "1_view")))
    assert(stateRows() === 1L,
      s"idle users past the TTL must leave the store, got ${stateRows()}")

    // an event OLDER than the watermark (t=200 < 275) is dropped by the
    // engine before the state function — the documented trade-off; no
    // stage re-emission for the evicted user
    input.addData(FunnelIn(2L, "click", T(200)))
    q.processAllAvailable()
    assert(hits() === Set((1L, "1_view"), (1L, "2_click"), (1L, "3_purchase"),
      (2L, "1_view"), (3L, "1_view")),
      "late event for an evicted user must be watermark-dropped")
    q.stop()
  }

  test("stream-static enrichment re-resolves the snapshot dim per micro-batch") {
    import graft.streaming.StreamingJobs
    import graft.sources.SnapshotTable
    import spark.implicits._
    val src = Files.createTempDirectory("graft_enr_src").toString
    val ck = Files.createTempDirectory("graft_enr_ck").toString
    val dim = SnapshotTable(Files.createTempDirectory("graft_enr_dim").toString)
    val out = SnapshotTable(Files.createTempDirectory("graft_enr_out").toString)
    def drop(name: String, ids: Seq[Long]): Unit =
      Files.writeString(java.nio.file.Paths.get(src, name),
        ids.map(i => s"""{"k": $i}""").mkString("\n"))
    def runOnce(): Unit = {
      val q = StreamingJobs.enrichedSinkWriter(
          spark.readStream.schema("k LONG").json(src),
          dim, out, joinKeys = Seq("k"), runId = "enr1")
        .option("checkpointLocation", ck)
        .start()
      q.awaitTermination()
    }
    dim.commit(Seq((1L, "one"), (2L, "two")).toDF("k", "name"))
    drop("b1.json", Seq(1L, 2L, 3L))
    runOnce()
    val r1 = out.read(spark).select("k", "name").as[(Long, Option[String])]
      .collect().toMap
    assert(r1 === Map(1L -> Some("one"), 2L -> Some("two"), 3L -> None),
      "batch 1 must join dim snapshot v0, unmatched keys kept (left)")
    // dim grows BETWEEN batches: the next batch must see the new commit
    dim.commit(Seq((3L, "three")).toDF("k", "name"))
    drop("b2.json", Seq(3L, 4L))
    runOnce()
    val r2 = out.read(spark).groupBy("k")
      .agg(collect_list("name").as("ns")).as[(Long, Seq[String])].collect().toMap
    assert(r2(3L).contains("three"), "batch 2 must see the dim commit between batches")
    assert(r2(4L).isEmpty)
    // replayed restart with nothing new appends nothing
    val v = out.currentVersion()
    runOnce()
    assert(out.currentVersion() === v)
  }

  test("trending terms: closed windows rank top-k exactly-once into a snapshot table") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingJobs
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val docs = input.toDF()
      .select(col("_1").cast("timestamp").as("ts"), col("_2").as("text"))
    val table = graft.sources.SnapshotTable(
      Files.createTempDirectory("graft_trend").toString)
    val ck = Files.createTempDirectory("graft_trendck").toString
    val q = StreamingJobs.trendingTermsWriter(docs, table, runId = "trend1",
        windowSec = 60, k = 2, lateSec = 10)
      .option("checkpointLocation", ck)
      .start()

    // window [0, 60): spark x3, flink x2, beam x1 — nothing closed yet
    input.addData((5L, "spark spark flink"), (20L, "spark flink beam"))
    q.processAllAvailable()
    assert(table.read(spark).count() === 0, "open windows must not emit")

    // an event at t=120 pushes the watermark past 60 → window closes,
    // its FINAL counts rank and commit
    input.addData((120L, "late window event"))
    q.processAllAvailable()
    val rows = table.read(spark)
      .select("rk", "token", "n").as[(Long, String, Long)].collect().sortBy(_._1)
    assert(rows.toSeq === Seq((1L, "spark", 3L), (2L, "flink", 2L)))
    q.stop()
  }

  test("drift monitor: per-batch KS vs a static reference, exactly-once snapshot rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingJobs
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val docs = input.toDF().select(col("_1").as("source"), col("_2").as("len"))
    // reference: 10 docs at each of lengths 10/20/30/40
    val ref = Seq.tabulate(40)(i => ("s", (i % 4 + 1) * 10L)).toDF("source", "len")
    val table = graft.sources.SnapshotTable(
      Files.createTempDirectory("graft_drift").toString)
    val ck = Files.createTempDirectory("graft_driftck").toString
    val q = StreamingJobs.driftMonitorWriter(docs, ref, table, runId = "drift1")
      .option("checkpointLocation", ck)
      .start()
    // batch 0 matches the reference shape exactly → zero drift
    input.addData(("s", 10L), ("s", 20L), ("s", 30L), ("s", 40L))
    q.processAllAvailable()
    // batch 1 ships a disjoint length distribution → full drift
    input.addData(("s", 100L), ("s", 100L))
    q.processAllAvailable()
    val rows = table.read(spark)
      .select("batch_id", "source", "n_batch", "n_ref", "ks_ppm")
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._3, r._5)).toSeq ===
      Seq((0L, 4L, 0L), (1L, 2L, 1000000L)),
      "identical shape must score 0; disjoint support must score 1e6 ppm")
    assert(rows.forall(_._4 === 40L))
    q.stop()
  }

  test("bucketed streaming sink: micro-batches keep the layout, joins stay storage-partitioned") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_spj_stream").toString
    spark.conf.set("spark.sql.catalog.spjs",
      classOf[graft.sources.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjs.warehouse", wh)
    val facts = graft.sources.SnapshotTable(s"$wh/db/facts")
    val dim = graft.sources.SnapshotTable(s"$wh/db/dim")
    dim.commitBucketed(
      spark.range(0, 100).selectExpr("id AS k", "id * 7 AS dv"), "k", 4)

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val ck = Files.createTempDirectory("graft_spjs_ck").toString
    val q = input.toDF().select(col("_1").as("k"), col("_2").as("v"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        facts.commitBucketedOnce(s"spjs/batch=$id", batch, "k", 4); ()
      }
      .option("checkpointLocation", ck)
      .start()
    input.addData((1L, 10L), (2L, 20L))
    q.processAllAvailable()
    input.addData((3L, 30L), (1L, 11L))
    q.processAllAvailable()
    q.stop()

    // the whole multi-batch lineage is still one bucketed layout...
    assert(facts.bucketingOf(facts.currentVersion()) === Some(("k", 4)))
    // ...so the stream-accumulated table joins the dim shuffle-free
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.sql(
        "SELECT f.k, f.v, d.dv FROM spjs.db.facts f JOIN spjs.db.dim d ON f.k = d.k")
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        j.queryExecution.executedPlan.toString)
      assert(j.count() === 4)
      // a replayed batch tag appends nothing (exactly-once holds for
      // the bucketed variant too)
      val before = facts.currentVersion()
      assert(facts.commitBucketedOnce("spjs/batch=1",
        Seq((9L, 99L)).toDF("k", "v"), "k", 4).isEmpty)
      assert(facts.currentVersion() === before)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("streaming heavy hitters: MG bounds hold across batches, state stays capped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import graft.streaming.StreamingJobs
    import graft.streaming.StreamingJobs.{MgOut, TokIn}
    val cap = 8
    val nBuckets = 4
    // real corpus tokens, routed to buckets exactly as a caller would
    val toks = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(lower(col("text")), " ")).as("token"))
      .filter(col("token") =!= "").as[String].collect()
      .map(t => TokIn((t.hashCode & Int.MaxValue) % nBuckets, t))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[TokIn]
    val out = StreamingJobs.heavyHittersStream(input.toDS(), cap = cap)
    val q = out.writeStream.format("memory").outputMode("update")
      .queryName("mg_hh").start()
    // three uneven batches — the summary must survive the batch cuts
    val cuts = Seq(toks.length / 5, toks.length / 2, toks.length)
    var from = 0
    cuts.foreach { to =>
      input.addData(toks.slice(from, to).toIndexedSeq); from = to
      q.processAllAvailable()
    }
    val rows = spark.table("mg_hh").as[MgOut].collect()
    q.stop()
    // final summary per bucket = the rows from its last (largest-seen) emission
    val finalSeen = rows.groupBy(_.bucket).map { case (b, rs) =>
      b -> rs.map(_.bucketSeen).max }
    val fin = rows.filter(r => r.bucketSeen == finalSeen(r.bucket))
    val exact = toks.groupBy(t => (t.bucket, t.token))
      .map { case (k, xs) => k -> xs.length.toLong }
    val bucketTotals = toks.groupBy(_.bucket).map { case (b, xs) => b -> xs.length.toLong }
    fin.groupBy(_.bucket).foreach { case (b, rs) =>
      assert(rs.length <= cap, s"bucket $b summary exceeds cap: ${rs.length}")
      assert(rs.head.bucketSeen === bucketTotals(b))
    }
    // deficiency bound: mgCount <= true <= mgCount + seen/(cap+1)
    fin.foreach { r =>
      val truth = exact((r.bucket, r.token))
      assert(r.mgCount <= truth, s"${r.token}: mg=${r.mgCount} > true=$truth")
      assert(truth <= r.mgCount + r.bucketSeen / (cap + 1),
        s"${r.token}: deficiency bound violated")
    }
    // completeness: every token above its bucket's 1/(cap+1) share survives
    val finToks = fin.map(r => (r.bucket, r.token)).toSet
    exact.foreach { case ((b, t), c) =>
      if (c > bucketTotals(b) / (cap + 1))
        assert(finToks.contains((b, t)), s"true heavy hitter '$t' lost by the screen")
    }
  }
}
