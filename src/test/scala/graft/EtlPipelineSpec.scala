package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.etl.{CleanJob, PackGen}
import graft.schema.Schemas
import graft.sources.Tables
import java.nio.file.Files

/** End-to-end clean + pack-gen over FIXTURES.md A1-shaped raw payloads:
  * wrapped JSON → clean NDJSON (speeds numeric) → cross-join packs. */
class EtlPipelineSpec extends SparkTestBase {

  private val rawProducts =
    """{"products": [
      |  {"product_name": "mobile_prepaid_data_15_gb", "competitor_name": "mobileviking",
      |   "product_category": "mobile_prepaid", "product_url": "https://mv/prepaid",
      |   "price": 15.0, "scraped_at": "2023-10-05", "data": 15.0, "minutes": -1.0,
      |   "sms": -1, "upload_speed": null, "download_speed": null},
      |  {"product_name": "fast_internet", "competitor_name": "mobileviking",
      |   "product_category": "internet_subscription", "product_url": "https://mv/internet",
      |   "price": 45.0, "scraped_at": "2023-10-05", "data": -1.0, "minutes": null,
      |   "sms": null, "upload_speed": "20mbps", "download_speed": "1gbps"}
      |]}""".stripMargin

  test("clean stage: unwrap + convert_speed, NDJSON round-trip") {
    val dir = Files.createTempDirectory("graft_raw").toFile.getAbsolutePath
    val cleanDir = Files.createTempDirectory("graft_clean").toFile.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(dir, "mobileviking_products.json"), rawProducts)

    val cleaned = CleanJob.run(spark, dir, cleanDir, Seq("mobileviking", "scarlet"))
    // scarlet raw file absent → skipped (F3), only one pair cleaned
    assert(cleaned === Seq(("mobileviking", "products")))

    val byName = Tables.ndjson(spark, Schemas.cleanProduct,
      s"$cleanDir/mobileviking_products.ndjson")
    val internet = byName.filter(col("product_name") === "fast_internet").collect()(0)
    assert(internet.getAs[Double]("upload_speed") === 20.0)
    assert(internet.getAs[Double]("download_speed") === 1000.0)
    val mobile = byName.filter(col("product_name") === "mobile_prepaid_data_15_gb").collect()(0)
    assert(mobile.isNullAt(mobile.fieldIndex("upload_speed")))
  }

  test("ndjsonAudited: malformed lines quarantined, clean rows typed, none lost") {
    val dir = Files.createTempDirectory("graft_audit").toString
    val f = java.nio.file.Paths.get(dir, "drop.ndjson")
    Files.writeString(f,
      Seq(
        """{"product_name": "a", "competitor_name": "mv", "price": 1.5}""",
        """{broken json""",
        """{"product_name": "b", "competitor_name": "mv", "price": 2.5}""",
        """also not json at all""",
        """{"product_name": "c", "competitor_name": "mv", "price": 3.5}"""
      ).mkString("\n"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "product_name STRING, competitor_name STRING, price DOUBLE")
    val (clean, quarantine) = Tables.ndjsonAudited(spark, schema, f.toString)
    assert(clean.count() === 3)
    assert(clean.schema.fieldNames.toSeq ===
      Seq("product_name", "competitor_name", "price"))
    import spark.implicits._
    assert(clean.select("product_name").as[String].collect().sorted.toSeq
      === Seq("a", "b", "c"))
    val bad = quarantine.as[String].collect()
    assert(bad.length === 2)
    assert(bad.exists(_.contains("broken json")), "audit must carry the raw line")
    // reserved-name collision fails fast instead of silently shadowing
    intercept[IllegalArgumentException] {
      Tables.ndjsonAudited(spark,
        org.apache.spark.sql.types.StructType.fromDDL("_graft_corrupt STRING"), f.toString)
    }
  }

  test("options raw table: incompatible shapes union-by-name with nulls (A4, dead-end)") {
    val dir = Files.createTempDirectory("graft_opts").toFile.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(dir, "a.json"),
      """{"options": [
        |  {"product_category": "mobile_subscription", "option_name": "extra_internet",
        |   "option_details": "option: 5 extra internet", "option_url": "https://x",
        |   "price": 5.0, "scraped_at": "2023-10-05", "pack_name": null}
        |]}""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(dir, "b.json"),
      """{"options": [
        |  {"options_name": "netflix", "options_details": "streaming option",
        |   "price": 8.99, "scraped_at": "2023-10-05", "pack_name": "trio_pack"}
        |]}""".stripMargin)
    val raw = graft.etl.CleanJob.optionsRaw(spark,
      Seq(s"$dir/a.json", s"$dir/b.json"))
    assert(raw.count() === 2)
    // both shapes' columns coexist; the missing side is null
    val cols = raw.columns.toSet
    assert(Set("option_name", "options_name", "option_url").subsetOf(cols))
    assert(raw.filter(col("option_name").isNotNull).count() === 1)
    assert(raw.filter(col("options_name").isNotNull).count() === 1)
    assert(raw.filter(col("options_name") === "netflix")
      .collect()(0).isNullAt(raw.columns.indexOf("option_url")))
  }

  test("pack generation: internet × mobile with discount (J1/X9/X11)") {
    val products = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row("mobile_prepaid_data_15_gb", "mobileviking", "mobile_prepaid",
        "https://mv/prepaid", 15.0, "2023-10-05", 15.0, -1.0, -1L, null, null),
      Row("mobile_sub_30_gb", "mobileviking", "mobile_subscription",
        "https://mv/sub", 20.0, "2023-10-05", 30.0, -1.0, -1L, null, null),
      Row("fast_internet_subscription", "mobileviking", "internet_subscription",
        "https://mv/internet", 45.0, "2023-10-05", -1.0, null, null, "20mbps", "1gbps"))),
      Schemas.rawProduct)
    val packs = PackGen.generatePacks(products, discount = 5.0, packUrl = "https://mv/combo")
    val rows = packs.orderBy("pack_name").collect()
    assert(rows.length === 2) // 1 internet × 2 mobile
    assert(rows.map(_.getAs[String]("pack_name")).toSeq === Seq(
      "mobile_prepaid_data_15_gb_fast_internet_subscription",
      "mobile_sub_30_gb_fast_internet_subscription"))
    assert(rows.map(_.getAs[Double]("price")).toSeq === Seq(55.0, 60.0))
    assert(rows.forall(_.getAs[String]("competitor_name") === "mobileviking"))
  }
}
