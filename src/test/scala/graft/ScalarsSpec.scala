package graft

import org.apache.spark.sql.functions._
import graft.functions.Scalars._

/** Unit + property coverage for SURVEY.md §2.5 scalars, including the
  * documented edge semantics (§5.2 items 1-2). */
class ScalarsSpec extends SparkTestBase {
  import spark.implicits._

  private def evalD(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    input: String): Option[Double] =
    Seq(Option(input)).toDF("v").select(c(col("v"))).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getDouble(0))
    }

  private def evalL(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    input: String): Option[Long] =
    Seq(Option(input)).toDF("v").select(c(col("v"))).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getLong(0))
    }

  private def evalS(c: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                    input: String): Option[String] =
    Seq(Option(input)).toDF("v").select(c(col("v"))).collect()(0) match {
      case r if r.isNullAt(0) => None
      case r => Some(r.getString(0))
    }

  // X1 — dags/transform.py:8-29
  test("parseSpeed: mbps/gbps/case/no-match/null") {
    assert(evalD(parseSpeed, "100mbps") === Some(100.0))
    assert(evalD(parseSpeed, "1gbps") === Some(1000.0))
    assert(evalD(parseSpeed, "20MBPS") === Some(20.0))
    assert(evalD(parseSpeed, "2Gbps") === Some(2000.0))
    assert(evalD(parseSpeed, "fiber") === None)
    assert(evalD(parseSpeed, "mbps100") === None)   // re.match anchors at start
    assert(evalD(parseSpeed, null) === None)
    assert(evalD(parseSpeed, "100") === None)       // bare number: no unit → None (string branch)
    assert(evalD(speedOrNumeric, "100") === Some(100.0)) // numeric branch: int(v)
    assert(evalD(speedOrNumeric, "12.9") === Some(12.0)) // int() truncation
  }

  test("parseSpeed property: matches a model implementation over generated inputs") {
    val rnd = new scala.util.Random(42)
    val units = Seq("mbps", "gbps", "Mbps", "GBPS", "kbps", "", "x")
    val cases = (1 to 200).map(_ => (rnd.nextInt(5000), units(rnd.nextInt(units.size))))
    // batch-evaluate: one Spark job for all generated inputs
    val df = cases.map { case (n, u) => s"$n$u" }.toDF("v")
      .select(col("v"), parseSpeed(col("v")).as("p")).collect()
    cases.zip(df).foreach { case ((n, unit), row) =>
      val expected = unit.toLowerCase match {
        case "mbps" => Some(n.toDouble)
        case "gbps" => Some(n.toDouble * 1000)
        case _ => None
      }
      val got = if (row.isNullAt(1)) None else Some(row.getDouble(1))
      assert(got === expected, s"input=${row.getString(0)}")
    }
  }

  // X2 — dags/utils.py:31-32
  test("unlimitedToDouble sentinel") {
    assert(evalD(unlimitedToDouble, "unlimited") === Some(-1.0))
    assert(evalD(unlimitedToDouble, "UNLIMITED") === Some(-1.0))
    assert(evalD(unlimitedToDouble, "42") === Some(42.0))
    assert(evalD(unlimitedToDouble, "42.5") === Some(42.5))
    assert(evalD(unlimitedToDouble, "junk") === None) // strict-null deviation
  }

  // X3 — dags/viking_class_scraper.py:204-208
  test("regexExtractOrMinus1 default") {
    assert(evalD(regexExtractOrMinus1(_, "(\\d+) minutes"), "300 minutes + 20 texts") === Some(300.0))
    assert(evalD(regexExtractOrMinus1(_, "(\\d+) minutes"), "Unlimited calls") === Some(-1.0))
  }

  // X4/X5
  test("firstNumber / digitFilter") {
    assert(evalL(firstNumber, """{"k": 87}""") === Some(87L))
    assert(evalL(firstNumber, "no digits") === None)
    assert(evalL(digitFilter, "a1b2c3") === Some(123L))
    assert(evalL(digitFilter, "abc") === None)
  }

  // X6 — € and nbsp dropped
  test("asciiScrub drops non-ASCII") {
    assert(evalS(asciiScrub, "€15 pm") === Some("15pm"))
    assert(evalS(asciiScrub, "plain") === Some("plain"))
  }

  // X7 — ',-' strip + decimal concat faithful "15"+"99" → 1599.0
  test("priceNormalize and decimalConcatPrice") {
    assert(evalD(priceNormalize, " 45,- ") === Some(45.0))
    assert(evalD(priceNormalize, "45.5") === Some(45.5))
    val df = Seq(("15", "99")).toDF("u", "d")
      .select(decimalConcatPrice(col("u"), col("d")).as("p"))
    assert(df.collect()(0).getDouble(0) === 1599.0)
  }

  // X12
  test("statusOf") {
    assert(evalS(statusOf, "no error") === Some("success"))
    assert(evalS(statusOf, "timeout") === Some("failed"))
  }

  test("surrogateKey deterministic and distinct") {
    val df = Seq(("a", "b"), ("a", "b"), ("a", "c")).toDF("x", "y")
      .select(surrogateKey(col("x"), col("y")).as("k"))
    val ks = df.collect().map(_.getString(0))
    assert(ks(0) === ks(1))
    assert(ks(0) !== ks(2))
    assert(ks(0).matches("[0-9a-f]{64}"))
  }

  test("cents exact money arithmetic incl. negatives") {
    val df = Seq(12345.67, -0.125, 0.005, 994.28).toDF("v")
      .select(cents(col("v")).as("c"))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(1234567L, -13L, 1L, 99428L))
  }

  test("graft_nfc: composes canonical sequences, leaves compatibility forms, null-safe") {
    import graft.functions.Nfc
    // decomposed e + U+0301 -> U+00E9; U+212B ANGSTROM -> U+00C5;
    // fullwidth A (U+FF21) is compatibility-only: NFC must keep it
    val rows = Seq(Option("cafe\u0301"), Option("\u212B x \uFF21"),
        Option("plain ascii"), None)
      .toDF("v").select(Nfc.nfc(col("v")).as("n")).collect()
    assert(rows(0).getString(0) === "caf\u00E9")
    assert(rows(1).getString(0) === "\u00C5 x \uFF21")
    assert(rows(2).getString(0) === "plain ascii")
    assert(rows(3).isNullAt(0))
    // idempotent, and registered for SQL via GraftExtensions
    val sql = spark.sql("SELECT graft_nfc(graft_nfc('cafe\u0301'))").head.getString(0)
    assert(sql === "caf\u00E9")
  }
}
