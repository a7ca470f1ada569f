package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar transform library — SURVEY.md §2.5 (X1–X15).
  *
  * Every operator here is a pure `Column => Column` built from Spark
  * built-in expressions (whole-stage-codegen friendly; no UDFs), so
  * Catalyst can constant-fold / push down around them. Reference
  * semantics are cited per function (paths relative to /root/reference).
  */
object Scalars {

  private val SpeedRe = "^(\\d+)((?i:mbps|gbps))"

  /** X1 `convert_speed` — dags/transform.py:8-29.
    * Anchored-at-start regex `(\d+)(mbps|gbps)` (case-insensitive);
    * mbps → value, gbps → value×1000; no match / null → null.
    * (The reference's numeric-typed passthrough `int(v)` does not arise
    * on a string column; see [[speedOrNumeric]] for that variant.)
    */
  def parseSpeed(c: Column): Column = {
    val num  = regexp_extract(c, SpeedRe, 1)
    val unit = lower(regexp_extract(c, SpeedRe, 2))
    when(num =!= "",
      num.cast("double") * when(unit === "gbps", 1000.0).otherwise(1.0))
  }

  /** X1 numeric-input branch: `int(value)` truncation toward zero for
    * int/float inputs — dags/transform.py:19-20. */
  def speedOrNumeric(c: Column): Column =
    coalesce(parseSpeed(c),
      when(c.rlike("^-?\\d+(\\.\\d+)?$"), c.cast("double").cast("long").cast("double")))

  /** Regex-guarded numeric cast: null on non-numeric input instead of an
    * ANSI cast error (Spark 4 defaults ANSI on; the guard keeps the
    * library safe under either setting and mirrors DuckDB TRY_CAST). */
  private def numOrNull(c: Column): Column =
    when(c.rlike("^-?\\d+(\\.\\d+)?$"), c.cast("double"))

  /** X2 `unlimited_check_to_float` — dags/utils.py:31-32:
    * -1.0 if lower(s)=='unlimited' else float(s). (The reference raises
    * on unparseable input; strict-null deviation per SURVEY §7.6.) */
  def unlimitedToDouble(c: Column): Column =
    when(lower(c) === "unlimited", lit(-1.0)).otherwise(numOrNull(c))

  /** X3 regex group extract with -1 default on miss —
    * dags/viking_class_scraper.py:204-208. */
  def regexExtractOrMinus1(c: Column, pattern: String): Column =
    coalesce(nullif(regexp_extract(c, pattern, 1), lit("")).cast("double"), lit(-1.0))

  /** X4 first-number extract — dags/viking_class_scraper.py:377-379,
    * dags/scarlet_scraper.py:128. Empty/no-digit input → null. */
  def firstNumber(c: Column): Column =
    nullif(regexp_extract(c, "(\\d+)", 1), lit("")).cast("long")

  /** X5 digit-filter `''.join(filter(str.isdigit, s))` → int —
    * dags/scarlet_scraper.py:238-244. No digits → null (the reference
    * would raise on int(''); strict mode deviation per SURVEY §2.8). */
  def digitFilter(c: Column): Column =
    nullif(regexp_replace(c, "[^0-9]", ""), lit("")).cast("long")

  /** X6 ASCII scrub `.encode('ascii','ignore')` —
    * dags/viking_scraper.py:164-165. */
  def asciiScrub(c: Column): Column =
    regexp_replace(c, "[^\\x00-\\x7F]", "")

  /** X7 price normalize: strip + drop ',-' + float —
    * dags/viking_class_scraper.py:201. */
  def priceNormalize(c: Column): Column =
    numOrNull(regexp_replace(trim(c), ",-", ""))

  /** X7b scarlet decimal-concat price: `float(unit + decimal)` string
    * concat — dags/scarlet_scraper.py:352. Faithfully "15"+"99" → 1599.0. */
  def decimalConcatPrice(unit: Column, dec: Column): Column =
    numOrNull(concat(unit.cast("string"), dec.cast("string")))

  /** X12 conditional run status — dags/utils.py:56. */
  def statusOf(errorDetails: Column): Column =
    when(errorDetails === "no error", lit("success")).otherwise(lit("failed"))

  /** X13 replacement: deterministic surrogate key (SURVEY §7.6) —
    * sha2 over natural keys instead of uuid4 (dags/bigquery.py:186-188)
    * so outputs are oracle-comparable and re-runs idempotent. */
  def surrogateKey(cols: Column*): Column =
    sha2(concat_ws("|", cols: _*), 256)

  /** Exact money arithmetic for oracle-comparable aggregates: doubles →
    * integer cents. ROUND is half-away-from-zero in both Spark
    * (BigDecimal HALF_UP) and DuckDB (C round) so the result is
    * bit-identical across engines, and integer sums are order-independent
    * (double sums are not, at any scale). */
  def cents(c: Column): Column = round(c * 100, 0).cast("long")
}
