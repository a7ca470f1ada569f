package graft

import graft.etl.Warehouse
import graft.sources.Tables
import java.nio.file.Files

class WarehouseDdlSpec extends SparkTestBase {

  test("K4/K5: database + tables created if absent, idempotent, schemas declared") {
    val t1 = Warehouse.ensureSchema(spark, "graft_test")
    assert(t1.size === 6)
    val t2 = Warehouse.ensureSchema(spark, "graft_test") // idempotent
    assert(t2 === t1)
    // listTables includes session temp views — only count real tables
    val cat = spark.catalog.listTables("graft_test").collect()
      .filter(!_.isTemporary).map(_.name).toSet
    assert(cat === Warehouse.tableSchemas.keySet)
    val features = spark.table("graft_test.features")
    assert(features.schema.fieldNames.toSeq === graft.schema.Schemas.features.fieldNames.toSeq)
    assert(features.count() === 0)
  }

  import spark.implicits._

  test("typed Dataset[Product] contract over cleaned NDJSON") {
    val dir = Files.createTempDirectory("graft_typed").toFile.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(dir, "p.ndjson"),
      """{"product_name": "mobile_a", "competitor_name": "mobileviking", "product_category": "mobile_prepaid", "product_url": "https://mv/a", "price": 15.0, "scraped_at": "2023-10-05", "data": 15.0, "minutes": -1.0, "sms": -1, "upload_speed": "20mbps", "download_speed": "1gbps"}""")
    val ds = Tables.typedProducts(spark, s"$dir/p.ndjson")
    val p = ds.collect()(0)
    assert(p.product_name === "mobile_a")
    assert(p.upload_speed === Some("20mbps"))  // string pre-clean, per contract
    assert(p.minutes === Some(-1.0))
    // typed transformations compose
    assert(ds.filter(_.price > 10.0).map(_.competitor_name).collect().toSeq === Seq("mobileviking"))
  }
}
