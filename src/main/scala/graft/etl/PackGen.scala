package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pack generation (SURVEY.md §7.3 minimum slice): the reference's only
  * in-memory relational computation.
  *
  * Reference: Scraper.generate_packs (dags/viking_class_scraper.py:389-431)
  * — substring-filter products into mobile/internet sets (F1), nested
  * loop over internet × mobile (J1), pack_name = f"{mobile}_{internet}"
  * (X9), price = mobile.price + internet.price − discount (X11),
  * competitor taken from the internet product, url/date literals.
  *
  * Spark shape: two pushed-down contains-filters off one scan, then a
  * broadcast nested-loop cross join. Both sides are small by
  * construction (per-competitor product sets), so the cross join stays
  * bounded regardless of total data size; the discount is a folded
  * scalar literal exactly like the reference's driver-side
  * `_extract_discount` (H5).
  */
object PackGen {

  def generatePacks(products: DataFrame, discount: Double, packUrl: String): DataFrame = {
    val mobile = products
      .filter(col("product_name").contains("mobile"))
      .select(col("product_name").as("m_name"), col("price").as("m_price"))
    val internet = products
      .filter(col("product_name").contains("internet"))
      .select(col("product_name").as("i_name"), col("price").as("i_price"),
        col("competitor_name"), col("scraped_at"))
    internet.crossJoin(broadcast(mobile))
      .select(
        col("competitor_name"),
        concat(col("m_name"), lit("_"), col("i_name")).as("pack_name"),
        lit(packUrl).as("pack_url"),
        lit(null).cast("string").as("pack_description"),
        (col("m_price") + col("i_price") - lit(discount)).as("price"),
        col("scraped_at"))
  }
}
