package graft

import org.apache.spark.sql.functions._
import graft.etl.Pipeline
import java.nio.file.Files

/** D1–D6 orchestration: staged clean→load run with per-competitor
  * failure isolation and audit logging. */
class PipelineSpec extends SparkTestBase {

  test("full pipeline run: clean + load + audit logs; bad competitor isolated") {
    val raw = Files.createTempDirectory("graft_pl_raw").toFile.getAbsolutePath
    val clean = Files.createTempDirectory("graft_pl_clean").toFile.getAbsolutePath
    val wh = Files.createTempDirectory("graft_pl_wh").toFile.getAbsolutePath

    Files.writeString(java.nio.file.Paths.get(raw, "mobileviking_products.json"),
      """{"products": [
        |  {"product_name": "mobile_a", "competitor_name": "mobileviking",
        |   "product_category": "mobile_prepaid", "product_url": "https://mv/a",
        |   "price": 15.0, "scraped_at": "2023-10-05", "data": 15.0, "minutes": -1.0,
        |   "sms": -1, "upload_speed": "20mbps", "download_speed": "1gbps"}
        |]}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(raw, "mobileviking_packs.json"),
      """{"packs": [
        |  {"competitor_name": "mobileviking", "pack_name": "combo_a",
        |   "pack_url": "https://mv/combo", "pack_description": null,
        |   "price": 55.0, "scraped_at": "2023-10-05"}
        |]}""".stripMargin)
    // scarlet raw file is INVALID json → its clean stage fails, run continues
    Files.writeString(java.nio.file.Paths.get(raw, "scarlet_products.json"), "{not json")

    val results = Pipeline.run(spark, raw, clean, wh)
    val byKey = results.map(r => (r.competitor, r.stage) -> r.ok).toMap
    assert(byKey(("mobileviking", "clean")))
    assert(byKey(("mobileviking", "load")))
    // D3: scarlet failure recorded, didn't abort the run
    assert(!byKey(("scarlet", "clean")))

    val st = graft.streaming.StreamingJobs.loadState(spark, wh)
    assert(st.competitors.count() === 1)
    assert(st.products.count() === 1)
    assert(st.features.count() === 1)
    assert(st.packs.count() === 1)

    // V2 audit rows: one per (competitor, stage), failed stage marked
    val logs = graft.sources.SnapshotTable(s"$wh/logs").read(spark)
    assert(logs.count() === 4)
    assert(logs.filter(col("status") === "failed").count() >= 1)

    // re-run over the same inputs: SCD makes it a no-op (idempotence)
    Pipeline.run(spark, raw, clean, wh)
    val st2 = graft.streaming.StreamingJobs.loadState(spark, wh)
    assert(st2.products.count() === 1)
    assert(st2.features.count() === 1)
    assert(st2.packs.count() === 1)

    // retry re-entry of the load alone (what withRetry does after a
    // transient failure): the commit marker makes the SCD append a
    // no-op even though version-append staging against the faithful
    // oldest-version probe would otherwise re-stage
    Pipeline.loadCompetitor(spark, clean, wh, "mobileviking")
    Pipeline.loadCompetitor(spark, clean, wh, "mobileviking")
    val st3 = graft.streaming.StreamingJobs.loadState(spark, wh)
    assert(st3.features.count() === 1 && st3.prices.count() === 1,
      "retried load must not append duplicate versions")
  }

  test("a load crashing mid-write leaves previous versions readable; the retry completes exactly once") {
    import graft.streaming.StreamingJobs
    import graft.sources.SnapshotTable
    val raw = Files.createTempDirectory("graft_crash_raw").toFile.getAbsolutePath
    val wh = Files.createTempDirectory("graft_crash_wh").toFile.getAbsolutePath
    def cleanedBatch(price: Double, day: String) = {
      val f = java.nio.file.Paths.get(raw, s"drop_$day.ndjson")
      Files.writeString(f,
        s"""{"product_name": "mobile_a", "competitor_name": "mobileviking",
           | "product_category": "mobile_prepaid", "product_url": "https://mv/a",
           | "price": $price, "scraped_at": "$day", "data": 15.0, "minutes": -1.0,
           | "sms": -1, "upload_speed": "20mbps", "download_speed": "1gbps"}"""
          .stripMargin.replaceAll("\n", ""))
      graft.etl.CleanJob.cleanProducts(
          spark.read.schema(graft.schema.Schemas.rawProduct).json(f.toString))
        .withColumn("scraped_at", to_date(col("scraped_at")))
    }
    StreamingJobs.upsertOnce(cleanedBatch(15.0, "2023-10-05"), "k1", wh)
    val pricesTable = SnapshotTable(s"$wh/product_prices")
    val vPinned = pricesTable.currentVersion()
    assert(StreamingJobs.loadState(spark, wh).prices.count() === 1)

    // day 2 is a PRICE change — the exact batch whose replay the ASC
    // current-version probe would re-stage. Simulate a loader that
    // crashed after committing ONLY product_prices.
    val b2 = cleanedBatch(25.0, "2023-10-06")
    val delta2 = graft.etl.WarehouseLoad.stageProducts(
      StreamingJobs.loadState(spark, wh), b2)
    assert(pricesTable.commitOnce("k2", delta2.prices).nonEmpty)
    // the crash tore nothing: the pinned pre-load version reads intact
    assert(pricesTable.readAt(spark, vPinned).count() === 1)

    // retry of the whole load: prices (tag present) must not
    // double-append even though the recomputed delta stages the price
    // again; the other tables complete under the same tag
    StreamingJobs.upsertOnce(b2, "k2", wh)
    val st = StreamingJobs.loadState(spark, wh)
    assert(st.prices.count() === 2, "retried load double-appended the price delta")
    assert(st.features.count() === 1 && st.products.count() === 1)

    // a retry after full success plans nothing and changes nothing
    val vAfter = pricesTable.currentVersion()
    StreamingJobs.upsertOnce(b2, "k2", wh)
    assert(pricesTable.currentVersion() === vAfter)
    assert(StreamingJobs.loadState(spark, wh).prices.count() === 2)
  }
}
