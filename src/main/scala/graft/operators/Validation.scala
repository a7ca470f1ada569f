package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch validation (SURVEY.md §2.10 V1): the reference's scrape-time
  * pydantic gate (`validate_products`, dags/data_model.py:27-37 — any
  * bad record fails the task) as a single-pass Spark aggregation.
  *
  * All rule counters evaluate in ONE job over the batch (one partial +
  * final aggregate — no per-rule scans), so the gate costs a single
  * pass at any scale. Fail-fast semantics preserved: `assertValid`
  * throws on the first report with any violation.
  */
object Validation {

  final case class RuleViolations(rule: String, n: Long)

  /** Required-non-null + domain rules for the cleaned product schema. */
  val productRules: Seq[(String, Column)] = Seq(
    "product_name_null" -> col("product_name").isNull,
    "competitor_name_null" -> col("competitor_name").isNull,
    "product_category_null" -> col("product_category").isNull,
    "product_url_null" -> col("product_url").isNull,
    "price_null" -> col("price").isNull,
    "scraped_at_null" -> col("scraped_at").isNull,
    "data_null" -> col("data").isNull,
    // sentinel domain: -1 means unlimited; anything else must be >= 0
    "data_negative" -> (col("data") < 0 && col("data") =!= -1.0),
    "price_negative" -> (col("price") < 0),
    "scraped_at_malformed" ->
      (col("scraped_at").isNotNull && to_date(col("scraped_at").cast("string")).isNull))

  /** One aggregation pass → per-rule violation counts (zero rows OK). */
  def check(df: DataFrame, rules: Seq[(String, Column)] = productRules): Seq[RuleViolations] = {
    val counters = rules.map { case (name, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(counters.head, counters.tail: _*).collect()(0)
    rules.zipWithIndex.map { case ((name, _), i) =>
      RuleViolations(name, if (row.isNullAt(i)) 0L else row.getLong(i))
    }.filter(_.n > 0)
  }

  /** Fail-fast gate (AirflowException analogue). */
  def assertValid(df: DataFrame, rules: Seq[(String, Column)] = productRules): Unit = {
    val bad = check(df, rules)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "validation failed: " + bad.map(v => s"${v.rule}=${v.n}").mkString(", "))
  }
}
