package graft

import org.apache.spark.sql.Row
import graft.operators.Validation
import graft.schema.Schemas

class ValidationSpec extends SparkTestBase {

  // validation runs against schema-on-read input (nothing enforced yet),
  // so the test frame must be all-nullable
  private val readSchema = org.apache.spark.sql.types.StructType(
    Schemas.rawProduct.fields.map(_.copy(nullable = true)))

  private def products(rows: Row*) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), readSchema)

  private def ok(name: String) = Row(name, "mobileviking", "mobile_prepaid",
    s"https://mv/$name", 15.0, "2023-10-05", 15.0, -1.0, -1L, null, null)

  test("clean batch passes; violations counted per rule in one pass") {
    Validation.assertValid(products(ok("a"), ok("b")))

    val bad = products(
      ok("a"),
      Row(null, "mobileviking", "mobile_prepaid", "https://mv/x", -2.0,
        "not-a-date", -5.0, null, null, null, null))
    val report = Validation.check(bad).map(v => v.rule -> v.n).toMap
    assert(report === Map(
      "product_name_null" -> 1L,
      "price_negative" -> 1L,
      "data_negative" -> 1L,
      "scraped_at_malformed" -> 1L))
    val e = intercept[IllegalStateException] { Validation.assertValid(bad) }
    assert(e.getMessage.contains("price_negative=1"))
  }

  test("unlimited sentinel -1 is not flagged as negative") {
    Validation.assertValid(products(ok("sentinel"))) // data = -1.0 passes
  }
}
