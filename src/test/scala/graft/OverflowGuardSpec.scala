package graft

/** Int64-overflow regression gates (round-8 ADVICE): the catalog's
  * integral statistics must stay exact — not silently wrapped — on
  * corpora 10–100× the driver testdata, where the PRE-round-9 formulas
  * provably exceeded 2⁶³ (Spark non-ANSI wraps silently; DuckDB raises;
  * the engines would diverge exactly when it matters). Each test builds
  * a synthetic fixture big enough that the OLD formula wrapped, runs
  * the real CATALOG entry, and checks the result against an exact
  * double-precision reference computed from the same aggregates.
  *
  * Magnitude receipts (old formulas, on these fixtures):
  *  - q_granger: suu ≈ 2×10¹¹ ⇒ suw²·svv ≈ 10³³ ≫ 2⁶³ (wrapped);
  *    new path scales the six sums to ≤10⁶ before the degree-3 mix.
  *  - q_mahalanobis: n·sxx·10⁶ ≈ 1.4×10¹⁹ > 2⁶³ (wrapped); new
  *    two-pass Σdx² ≈ 10¹³ — linear in users, not quadratic (its own
  *    fixture: big means wrap the old form, small deviations honor the
  *    query's documented range⁴ det contract).
  *  - q_bh_fdr: n1 > 10⁶ ⇒ old 10⁶ div n1 = 0 ⇒ z² NULL for every
  *    source (floor degeneracy, not overflow); new b×h split keeps
  *    the statistic defined and bounded at any corpus size.
  */
class OverflowGuardSpec extends SparkTestBase {

  /** ~3.6M events: user x-counts up to ~3.5k (wraps old n·sxx·1e6),
    * triangular day weights (wraps old degree-6 granger numerator). */
  private lazy val bigEventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_overflow").toString
    spark.range(3600000L).selectExpr(
      "id AS event_id",
      // triangular day weights: day k ∈ [0,9] gets (k+1)/55 of rows
      """timestamp'2024-01-01 00:00:00'
        |  + make_interval(0, 0, 0,
        |      cast(floor((sqrt(8 * (id % 55) + 1) - 1) / 2) as int),
        |      0, 0, 0) AS ts""".stripMargin,
      // user u gets ~2u+1 rows → x spans 1..~3578 (huge variance)
      "cast(floor(sqrt(cast(id AS double))) AS long) AS user_id",
      // purchase RATE varies with the day coordinate (id % 55 maps to
      // the day): a flat `id % 13` rate would make daily purchases
      // exactly proportional to daily clicks — collinear deviation
      // series, det ≈ 0, and the regression reference itself becomes
      // ill-conditioned noise
      "CASE WHEN id % (2 + (id % 55) % 7) = 0 THEN 'purchase' ELSE 'click' END AS event_type",
      "cast(1.0 AS double) AS value",
      "'{}' AS props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q_granger: degree-3 SSR mix survives sums that wrapped the unscaled form") {
    val row = SparkEntry.queries("q_granger")(spark, bigEventsDir).head()
    val imp = row.getAs[Long]("improvement_ppm")
    // exact double reference from the same daily series + floored means
    val daily = graft.sources.Tables.events(spark, bigEventsDir)
      .filter("event_type IN ('click', 'purchase')")
      .groupBy(org.apache.spark.sql.functions.expr(
        "cast(datediff(cast(ts as date), date'1970-01-01') as long)").as("day"))
      .agg(org.apache.spark.sql.functions.expr(
          "sum(cast(event_type = 'click' as long))").as("x"),
        org.apache.spark.sql.functions.expr(
          "sum(cast(event_type = 'purchase' as long))").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mx = daily.map(_._2).sum / daily.length // floored, like the query
    val my = daily.map(_._3).sum / daily.length
    val dev = daily.map { case (d, x, y) => (d, (x - mx).toDouble, (y - my).toDouble) }
    val byDay = dev.map(t => t._1 -> t).toMap
    val tri = dev.flatMap { case (d, dx, dy) =>
      byDay.get(d - 1).map { case (_, pdx, pdy) => (dy, pdy, pdx) } } // (w, u, v)
    val sww = tri.map(t => t._1 * t._1).sum; val suu = tri.map(t => t._2 * t._2).sum
    val svv = tri.map(t => t._3 * t._3).sum; val suw = tri.map(t => t._2 * t._1).sum
    val svw = tri.map(t => t._3 * t._1).sum; val suv = tri.map(t => t._2 * t._3).sum
    // the degree-3 terms the OLD form computed raw: suw²·svv etc. —
    // svv (click-side, 12/13 of the volume) dominates; purchases (suu)
    // are 13× smaller. Past 2⁶³ means the unscaled mix wrapped here.
    assert(math.abs(suw * suw * svv) > math.pow(2, 63),
      s"fixture too small to have wrapped the old form: suw²·svv=${suw * suw * svv}")
    val ssrR = sww - suw * suw / suu
    val det = suu * svv - suv * suv
    val ssrF = sww - (suw * suw * svv + svw * svw * suu - 2 * suw * svw * suv) / det
    val expected = (ssrR - ssrF) / ssrR * 1e6
    assert(imp >= 0 && imp <= 1000000, s"improvement_ppm out of range: $imp")
    assert(math.abs(imp - expected) <= 5000,
      s"improvement_ppm $imp vs double reference $expected")
  }

  /** Mahalanobis needs a DIFFERENT shape than granger: the old
    * formula's n·sxx·1e6 wraps on large MEANS (n·x̄ > 3×10⁶), while the
    * query's own documented range⁴ contract caps the DEVIATION spread
    * (σx·σy ≲ 2600 raw — det = cxx·cyy − cxy² must fit int64). So:
    * 1200 users × ~3.4k events each (big means, wraps the old form),
    * per-user totals and purchase counts drawn from two small
    * independent lattices (u·53 mod 67 dropped rows, u·37 mod 61
    * purchases) — deviations ≤ ~70, det > 0 and comfortably in range. */
  private lazy val mahalanobisDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_mahal").toString
    spark.range(4200000L).selectExpr(
      "id AS event_id",
      "timestamp'2024-01-01 00:00:00' AS ts",
      "id % 1200 AS user_id",
      "id div 1200 AS seq",
      """CASE WHEN id div 1200 < 300 + (id % 1200) * 37 % 61
        |  THEN 'purchase' ELSE 'click' END AS event_type""".stripMargin,
      "cast(1.0 AS double) AS value",
      "'{}' AS props")
      .filter("seq < 3500 - (id % 1200) * 53 % 67")
      .drop("seq")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q_mahalanobis: two-pass covariance survives corpora that wrapped n·sxx·1e6") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_mahalanobis")(spark, mahalanobisDir).collect()
    assert(rows.length == 20)
    // exact double reference over the same user aggregate
    val users = graft.sources.Tables.events(spark, mahalanobisDir)
      .groupBy("user_id")
      .agg(sum(expr("cast(event_type <> 'purchase' as long)")).as("x"),
        sum(expr("cast(event_type = 'purchase' as long)")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = users.length.toDouble
    val sxx = users.map(u => u._2.toDouble * u._2).sum
    assert(n * sxx * 1e6 > Long.MaxValue.toDouble,
      s"fixture too small to have wrapped the old form: n*sxx*1e6 = ${n * sxx * 1e6}")
    val mx = users.map(_._2).sum * 1000L / users.length // floored milli, like the query
    val my = users.map(_._3).sum * 1000L / users.length
    val ds = users.map(u => (u._1, u._2 * 1000.0 - mx, u._3 * 1000.0 - my))
    val cxx = ds.map(t => t._2 * t._2).sum / n
    val cyy = ds.map(t => t._3 * t._3).sum / n
    val cxy = ds.map(t => t._2 * t._3).sum / n
    val det = cxx * cyy - cxy * cxy
    assert(det > 0, s"fixture must have a nonsingular covariance, det=$det")
    val ref = ds.map { case (uid, dx, dy) =>
      uid -> (cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy) / (det / 1000.0) }
      .toMap
    rows.foreach { r =>
      val uid = r.getAs[Long]("user_id")
      val got = r.getAs[Long]("d2_milli").toDouble
      val want = ref(uid)
      assert(math.abs(got - want) <= math.max(want * 0.02, 50.0),
        s"user $uid d2_milli $got vs double reference $want")
    }
  }

  test("q_bh_fdr: z² stays defined for sources past 1e6 docs (old reciprocals floored to 0)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val d = java.nio.file.Files.createTempDirectory("graft_bhfdr").toString
    // two sources, 1.1M docs each — the OLD (1e6 div n1 + 1e6 div n2)
    // term floors to 0 here, nulling z² for every source. Source s_hi
    // keeps ~all docs, s_lo keeps none (text too short) — a maximal,
    // unambiguous split the new statistic must flag.
    val keepText = ("the quick brown fox jumps over a lazy dog and then " * 3).trim
    spark.range(2200000L).selectExpr(
      "id AS doc_id",
      s"CASE WHEN id % 2 = 0 THEN '$keepText' ELSE 'tiny of text' END AS text",
      "'en' AS lang",
      "CASE WHEN id % 2 = 0 THEN 's_hi' ELSE 's_lo' END AS source",
      s"CASE WHEN id % 2 = 0 THEN ${keepText.length}L ELSE 12L END AS n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q_bh_fdr")(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val hi = rows("s_hi"); val lo = rows("s_lo")
    assert(hi.getAs[Long]("n1") > 1000000L, "fixture must exceed the 1e6 floor")
    Seq(hi, lo).foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("z2_milli")),
        s"${r.getAs[String]("source")}: z2 must be defined past 1e6 docs")
    }
    // p1 = 1e6 vs 0 ppm, pooled p = 5e5 ⇒ v = 25e4; b = diff²·1000/v
    // = 4e9 ⇒ capped at 1e9; h = n1n2/(n1+n2) = 55e4 ⇒ b·h/1e6 = 5.5e8
    // milli hits the 1e7 output cap — maximally significant, exactly
    // representable
    assert(hi.getAs[Long]("z2_milli") == 10000000L,
      s"saturated split must hit the z² cap, got ${hi.getAs[Long]("z2_milli")}")
    assert(hi.getAs[Long]("significant") == 1L)
    assert(lo.getAs[Long]("significant") == 1L)
  }

  test("q_bh_fdr: moderate effect matches a double-precision z² (round-9 ADVICE: old milli was 1000x inflated)") {
    // Two 5000-doc sources with ~52% vs ~48% keep rates ⇒ true
    // two-proportion z ≈ 4, z² ≈ 16 — far from both the b cap and the
    // 1e7 output cap, so the integral pipeline's value must track the
    // real statistic, not just the saturated case. The OLD formula
    // (b·h div 1000) returned ~16,000,000 here (capped), marking both
    // sources significant at rank-1 ties; the fixed nano→milli scale
    // returns ~16,000.
    val d = java.nio.file.Files.createTempDirectory("graft_bhfdr_mod").toString
    val keepText = ("the quick brown fox jumps over a lazy dog and then " * 3).trim
    spark.range(10000L).selectExpr(
      "id AS doc_id",
      // source A (even ids): keep when id%100 < 52; B: keep when < 48
      s"""CASE WHEN (id % 2 = 0 AND (id div 2) % 100 < 52)
         |     OR (id % 2 = 1 AND (id div 2) % 100 < 48)
         |THEN '$keepText' ELSE 'tiny of text' END AS text""".stripMargin,
      "'en' AS lang",
      "CASE WHEN id % 2 = 0 THEN 's_a' ELSE 's_b' END AS source",
      s"""CASE WHEN (id % 2 = 0 AND (id div 2) % 100 < 52)
         |     OR (id % 2 = 1 AND (id div 2) % 100 < 48)
         |THEN ${keepText.length}L ELSE 12L END AS n_chars""".stripMargin)
      .write.parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("q_bh_fdr")(spark, d).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = rows("s_a"); val b = rows("s_b")
    // double-precision reference from the query's own counts
    val (n1, k1) = (a.getAs[Long]("n1").toDouble, a.getAs[Long]("k1").toDouble)
    val (n2, k2) = (b.getAs[Long]("n1").toDouble, b.getAs[Long]("k1").toDouble)
    val pp = (k1 + k2) / (n1 + n2)
    val z2ref = {
      val diff = k1 / n1 - k2 / n2
      diff * diff / (pp * (1 - pp) * (1 / n1 + 1 / n2))
    }
    assert(z2ref > 5 && z2ref < 100, s"fixture must be moderate, z²=$z2ref")
    Seq(a, b).foreach { r =>
      val got = r.getAs[Long]("z2_milli").toDouble / 1000.0
      assert(math.abs(got - z2ref) <= math.max(z2ref * 0.02, 0.2),
        s"${r.getAs[String]("source")}: z² $got vs double reference $z2ref")
    }
  }

  test("q_bradley_terry: pi clamp keeps every rating >= 1 (degenerate-safe denominators)") {
    val rows = SparkEntry.queries("q_bradley_terry")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("pi_micro") >= 1L,
        s"${r.getAs[String]("event_type")} pi must be clamped >= 1")
    }
  }
}
