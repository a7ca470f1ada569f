package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Scalars.cents
import graft.sources.Tables._

/** Event-stream analytics in batch form (SURVEY.md §2.12 E7/E8).
  *
  * The same plans are Structured-Streaming-ready: the tumbling-window agg
  * maps to `window(ts, '1 hour')` + watermark, sessionization to
  * `session_window` / `flatMapGroupsWithState` (see graft.streaming).
  * Batch form is what the DuckDB oracle can verify.
  */
object EventOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // E7 JSON scalar extraction over events.props
    "q_json_extract" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"), col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // E8 tumbling-window aggregation (hourly): partial agg map-side, one
    // shuffle keyed on (hour, type) — O(windows) shuffle volume at scale.
    "q_event_window" -> ((s, d) =>
      events(s, d)
        // string-typed window label: keeps the output schema identical
        // across engines (NTZ vs instant timestamp encodings differ)
        .withColumn("hour", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type")
        .agg(count(lit(1)).as("n"),
          (sum(cents(col("value"))).cast("double") / 100).as("total_value"))
        .orderBy("hour", "event_type")),

    // E8 SEASONAL DECOMPOSITION (classical means method): per
    // (event_type, hour-of-day), the seasonal baseline = mean value
    // over the 30-day window, plus residual magnitude stats against
    // it — the decomposition an on-call anomaly rule consumes
    // ("is tonight's error rate abnormal FOR 3 AM?"; complements
    // q_window_anomaly, which scores against a rolling window rather
    // than the seasonal profile). Integral micro-units end-to-end.
    // Scale: one hash-agg to the 24×|types| baseline, broadcast back,
    // one second hash-agg for the residuals — two map-side-combined
    // shuffles of O(groups), no windows, no sort.
    "q_seasonal_decompose" -> ((s, d) => {
      val ev = events(s, d).select(col("event_type"),
        hour(col("ts")).cast("long").as("hr"),
        round(col("value") * 1000000).cast("long").as("v"))
      val base = ev.groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"), expr("sum(v) div count(1)").as("baseline_micro"))
      ev.join(broadcast(base), Seq("event_type", "hr"))
        .withColumn("resid", abs(col("v") - col("baseline_micro")))
        .groupBy(col("event_type"), col("hr"), col("n"), col("baseline_micro"))
        .agg(max(col("resid")).as("max_resid_micro"),
          expr("sum(resid) div count(1)").as("mad_micro"))
        .orderBy("event_type", "hr")
    }),

    // E7 JSON SCHEMA PROFILE — key-presence discovery over a
    // semi-structured column: explode each record's key set
    // (json_object_keys / json_keys — no schema assumed, the real
    // schema-drift primitive for feeds whose payload evolves) and
    // report per-key presence in integral ppm. The testdata's props
    // is single-key, so a richer payload is DERIVED deterministically
    // from row values first (the q_pii_scrub convention: both engines
    // construct the identical string, so the optional-key share is
    // genuine). One explode → one key-keyed hash-agg → broadcast
    // 1-row total.
    "q_json_profile" -> ((s, d) => {
      val js = concat(lit("{\"k\": "), get_json_object(col("props"), "$.k"),
        lit(", \"ev\": \""), col("event_type"), lit("\""),
        when(col("value") > 50,
          concat(lit(", \"v\": "), cents(col("value")).cast("string")))
          .otherwise(lit("")),
        lit("}"))
      val ev = events(s, d).select(js.as("js"))
      val tot = broadcast(ev.agg(count(lit(1)).as("n_events")))
      ev.select(explode(expr("json_object_keys(js)")).as("json_key"))
        .groupBy("json_key").agg(count(lit(1)).as("n_present"))
        .crossJoin(tot)
        .withColumn("presence_ppm", expr("n_present * 1000000 div n_events"))
        .select("json_key", "n_present", "presence_ppm")
        .orderBy("json_key")
    }),

    // E8 HALF-LIFE DECAYED COUNTS — recency-weighted per-user
    // engagement: an event aged `a` whole weeks (against the corpus
    // max day) weighs 2^−a, held EXACTLY in binary micro-units (2²⁰ =
    // full weight, floor 2⁰ at 20+ weeks), so the decayed total is a
    // right-shift plus an integral SUM — order-independent, no float
    // pow(), bit-identical cross-engine. One broadcast 1-row max-date,
    // one user-keyed hash-agg with map-side partials; shape-invariant
    // at any scale.
    "q_decayed_counts" -> ((s, d) => {
      val maxd = broadcast(events(s, d).agg(max(to_date(col("ts"))).as("maxd")))
      events(s, d).select(col("user_id"), col("ts"))
        .crossJoin(maxd)
        .withColumn("w_u", expr(
          "shiftright(1048576L, cast(least(datediff(maxd, to_date(ts)) div 7, 20) as int))"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("w_u").as("decayed_u"))
        .orderBy("user_id")
    }),

    // E8 ENGAGEMENT CONCENTRATION (Gini) — how unevenly activity
    // spreads over users, by the exact rank formula G = (2·Σ rk·n −
    // (N+1)·Σn) / (N·Σn) in integral ppm: rank users by event count
    // ascending (total order, user_id tie-break) with the two-phase
    // distributed row number — the single-key global ranking that
    // would otherwise be one task's sort — then three sums. The whole
    // statistic is one aggregate over the user table; nothing rescans
    // events after the first groupBy.
    "q_engagement_gini" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
      val gb = broadcast(users.agg(min("n").as("glo"), max("n").as("ghi")))
      val ranked = graft.operators.PrefixSum.rowNumber(
        users.crossJoin(gb), Seq.empty,
        Seq(col("n"), col("user_id")),
        graft.operators.PrefixSum.rangeBucket(col("n"), col("glo"), col("ghi"), 32),
        "rk")
      ranked.agg(count(lit(1)).as("n_users"), sum("n").as("total"),
          sum(col("rk") * col("n")).as("rk_weighted"))
        .withColumn("gini_ppm", expr(
          "(2 * rk_weighted - (n_users + 1) * total) * 1000000 div (n_users * total)"))
        .select("n_users", "total", "gini_ppm")
    }),

    // E8 TEMPORAL TRAIN/TEST SPLIT + LEAKAGE AUDIT — the eval-hygiene
    // cut for sequence models: train = strictly before the corpus's
    // 80%-point day (exact distributed rank over DAYS, not a
    // wall-clock guess), test = after; the audit reports the user
    // overlap between splits — the population a user-level holdout
    // would have to drop, and the first number a reviewer asks for.
    // Day ranking runs over the per-day aggregate (bounded by the
    // calendar); the overlap is a semi-join of two user sets.
    "q_temporal_split" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), to_date(col("ts")).as("day"))
      val days = ev.groupBy("day").agg(count(lit(1)).as("n"))
      val wd = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cut = days
        .withColumn("cum", sum("n").over(wd))
        .crossJoin(broadcast(days.agg(sum("n").as("tot"))))
        .filter(col("cum") * 100 >= col("tot") * 80)
        .agg(min("day").as("cut_day"))
      val tagged = ev.crossJoin(broadcast(cut))
        .withColumn("split", when(col("day") < col("cut_day"), "train")
          .otherwise("test"))
      val trainU = tagged.filter(col("split") === "train")
        .select("user_id").distinct()
      val testU = tagged.filter(col("split") === "test")
        .select("user_id").distinct()
      val overlap = trainU.join(testU, Seq("user_id"), "left_semi")
        .agg(count(lit(1)).as("leak_users"))
      tagged.groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          min("day").cast("string").as("from_day"),
          max("day").cast("string").as("to_day"))
        .crossJoin(broadcast(overlap))
        .orderBy("split")
    }),

    // E8 HOPPING (sliding) window aggregation: 2-hour windows sliding
    // every hour via Spark's native `window()` — Catalyst's
    // TimeWindowing rule expands each event into its size/slide = 2
    // covering windows as a projection (no join, no UDF), then one
    // hash-agg shuffled on (window, type). Shuffle volume is
    // O(rows · overlap) before the map-side partial agg, O(windows)
    // after — the overlap factor is chosen, not emergent, so the
    // shape holds at 100 TB. String window labels per the
    // q_event_window cross-engine convention.
    "q_hopping_window" -> ((s, d) =>
      events(s, d)
        .select(window(col("ts"), "2 hours", "1 hour").as("w"),
          col("event_type"), cents(col("value")).as("v_c"))
        .groupBy(col("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(col("v_c")).cast("double") / 100).as("total_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
          col("event_type"), col("n"), col("total_value"))
        .orderBy("w_start", "event_type")),

    // E8/E9 per-key LINEAR TREND: OLS slope/intercept of the daily
    // event-count series per event type, from the closed-form normal
    // equations over EXACT integer moment sums (n, Σx, Σy, Σxy, Σx²;
    // x = epoch day, y = daily count). Integer moments make the
    // aggregation order-independent and cross-engine exact; the only
    // float op is the final division (identical long numerator /
    // denominator in both engines → IEEE-identical, then round 6).
    // Two cascaded hash-aggs, partial map-side — never a per-key sort,
    // state O(keys): the streaming-friendly regression shape.
    "q_regr_trend" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"),
          datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
            .cast("long").as("day"))
        .agg(count(lit(1)).as("y"))
      val den = col("n") * col("sxx") - col("sx") * col("sx")
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("day")).as("sx"),
          sum(col("y")).as("sy"), sum(col("day") * col("y")).as("sxy"),
          sum(col("day") * col("day")).as("sxx"))
        .withColumn("slope",
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / den, 6))
        .withColumn("intercept",
          round((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") / den, 6))
        .select("event_type", "n", "slope", "intercept")
        .orderBy("event_type")
    }),

    // E8/E10 TRAINING-SEQUENCE construction: per-user chronological
    // event-type sequences truncated to the LAST 8 events — the input
    // shape sequence models (next-event prediction, session
    // embeddings) train on. One user-keyed shuffle; per-user state is
    // bounded by the truncation, so the collect_list never holds an
    // unbounded history (and at lake scale the same shape runs
    // incrementally as flatMapGroupsWithState). event_id tiebreak
    // makes the order total, hence cross-engine exact.
    "q_user_sequences" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sort_array(collect_list(struct(col("ts"), col("event_id"),
            col("event_type")))).as("evs"))
        .select(col("user_id"), col("n_events"),
          concat_ws(">", expr(
            "transform(slice(evs, greatest(1, size(evs) - 7), 8), e -> e.event_type)"))
            .as("seq"))
        .orderBy("user_id")),

    // ORDERED FUNNEL analysis: users progressing view → click →
    // purchase, each stage strictly AFTER the previous stage's first
    // event for that user — the classic product-analytics query, which
    // a naive per-type count gets wrong (a purchase before the first
    // view must not count). Decorrelated to one grouped-min per stage
    // with a time-ordered join back — each stage is one shuffle on
    // user_id, no per-user iteration.
    "q_event_funnel" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_type"), col("ts"))
      val viewT = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t_view"))
      val clickT = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("ub"), col("ts").as("tsb"))
        .join(viewT, col("ub") === col("user_id") && col("tsb") > col("t_view"))
        .groupBy(col("ub").as("user_id")).agg(min(col("tsb")).as("t_click"))
      val buyT = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("uc"), col("ts").as("tsc"))
        .join(clickT, col("uc") === col("user_id") && col("tsc") > col("t_click"))
        .groupBy(col("uc").as("user_id")).agg(min(col("tsc")).as("t_purchase"))
      def stage(df: DataFrame, tag: String): DataFrame =
        df.agg(count(lit(1)).as("n_users")).select(lit(tag).as("stage"), col("n_users"))
      stage(viewT, "1_view")
        .unionByName(stage(clickT, "2_click"))
        .unionByName(stage(buyT, "3_purchase"))
        .orderBy("stage")
    }),

    // COHORT RETENTION: users grouped by first-seen ISO week, counted
    // per week-offset of later activity — the retention triangle. Two
    // aggregations (first-seen; distinct active weeks) joined on the
    // user, offsets as integral day-diffs div 7, so the triangle is
    // bit-identical cross-engine.
    "q_cohort_retention" -> ((s, d) => {
      val ev = events(s, d)
      val firstSeen = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_w"))
      val active = ev
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      active.join(firstSeen, "user_id")
        .groupBy(date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(w, cohort_w) div 7").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Volume-anomaly detection: hours whose event count exceeds 1.5×
    // the trailing-24-observed-hours average per type — the monitoring
    // pass a pipeline runs over its own ingest rates. One hourly
    // rollup (shuffle on (type, hour)), then a ROWS-frame trailing
    // window on the AGGREGATED table — rows-based so silent hours
    // don't dilute the baseline. The 1.5× rule and the reported ratio
    // are integral (n·cnt·2 > trail·3; micro-units), so both engines
    // flag the identical hour set.
    "q_window_anomaly" -> ((s, d) => {
      val hourly = events(s, d)
        .withColumn("hr", date_trunc("hour", col("ts")))
        .groupBy("event_type", "hr")
        .agg(count(lit(1)).as("n"))
      val trail = Window.partitionBy("event_type").orderBy(col("hr"))
        .rowsBetween(-24, -1)
      hourly
        .withColumn("trail_n", sum(col("n")).over(trail))
        .withColumn("trail_cnt", count(col("n")).over(trail))
        .filter(col("trail_cnt") >= 12) // baseline warm-up
        .filter(col("n") * col("trail_cnt") * 2 > col("trail_n") * 3)
        .select(col("event_type"),
          date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("n"), col("trail_n"), col("trail_cnt"),
          expr("n * trail_cnt * 1000000 div trail_n").as("ratio_micro"))
        .orderBy("event_type", "hour")
    }),

    // Time-grid gap filling: a generated hourly spine (sequence +
    // explode — narrow, no data shuffle) left-joined with observed
    // hourly counts so silent hours appear as zeros. The spine is the
    // dimension side; at scale it stays tiny (hours × types).
    "q_gap_fill" -> ((s, d) => {
      val ev = events(s, d)
      val types = ev.select("event_type").distinct()
      // Jan 2024 hourly spine (the testdata window): 31 × 24 slots
      val spine = s.range(1)
        .select(explode(sequence(lit(0), lit(743))).as("h"))
        .select(date_format(
          expr("timestampadd(HOUR, h, TIMESTAMP_NTZ '2024-01-01 00:00:00')"),
          "yyyy-MM-dd HH:mm:ss").as("hour"))
        .crossJoin(broadcast(types))
      val observed = ev
        .withColumn("hour", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
        .groupBy("hour", "event_type").agg(count(lit(1)).as("n_obs"))
      spine.join(observed, Seq("hour", "event_type"), "left")
        .select(col("hour"), col("event_type"),
          coalesce(col("n_obs"), lit(0L)).as("n"))
        .orderBy("hour", "event_type")
    }),

    // Pivot: per-user event-type counts as columns (explicit value list
    // so the output schema is static and cross-engine comparable)
    "q_pivot" -> ((s, d) =>
      events(s, d)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "purchase", "signup", "error", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")),

    // As-of join composed from a union + ordered window (the operator
    // Spark lacks natively — SURVEY §2.6 J5 is its point-lookup cousin):
    // each purchase matches the user's latest strictly-prior click.
    // One shuffle on user_id; the window is narrow after that. At
    // cluster scale this beats a range-join (no O(n·m) interval probe).
    "q_asof_join" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ep = floor(unix_timestamp(col("ts").cast("timestamp")))
      events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .withColumn("click_ev",
          last(when(col("event_type") === "click",
            struct(col("ts").as("cts"), col("event_id").as("cid"))), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase" && col("click_ev").isNotNull)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_ev.cid").as("click_id"),
          date_format(col("click_ev.cts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
          (ep - floor(unix_timestamp(col("click_ev.cts").cast("timestamp"))))
            .cast("long").as("gap_seconds"))
        .orderBy("purchase_id")
    }),

    // The same attribution as a TWO-TABLE as-of join through the NATIVE
    // operator (graft.plans.AsOfJoin): purchases stream left, clicks
    // stream right, match = last click strictly before the purchase in
    // ((ts, event_id)) order within the user. Sort-merge shape: both
    // sides shuffle once on user_id, one O(|L|+|R|) merge pass with
    // O(1) state per partition — no union trick, no range-join blowup.
    "q_asof_join_native" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cts"))
      graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")))
        .select(col("purchase_id"), col("user_id"),
          date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id"),
          date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
        .orderBy("purchase_id")
    }),

    // Tolerance-windowed as-of through the native operator: the match
    // is still "last click strictly before", but attributions older
    // than 1 hour are nulled out (composition beats building tolerance
    // into the operator: the merge pass stays O(1)-state and the
    // window is a plain projection on top).
    "q_asof_within" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cts"))
      val gap = floor(unix_timestamp(col("pts").cast("timestamp"))).cast("long") -
        floor(unix_timestamp(col("cts").cast("timestamp"))).cast("long")
      graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")))
        .withColumn("in_window", col("cts").isNotNull && gap <= 3600L)
        .select(col("purchase_id"), col("user_id"),
          when(col("in_window"), col("click_id")).as("click_id"),
          when(col("in_window"), gap).as("gap_seconds"))
        .orderBy("purchase_id")
    }),

    // MULTI-TOUCH (LINEAR) ATTRIBUTION — the q_attribution
    // counterpart that splits each conversion's credit EVENLY across
    // every click in the 7-day lookback instead of crediting only the
    // last: credits in integral ppm (1e6 div n_touches — truncating
    // div, deterministic cross-engine). The touch set is one equi join
    // on user_id + a window filter — per-purchase fan-out is the
    // user's week of clicks, bounded per user at any corpus size —
    // then a per-purchase count window and one campaign-keyed agg.
    "q_multitouch_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("cts"),
          pmod(get_json_object(col("props"), "$.k").cast("long"), lit(8L))
            .as("campaign"))
      val gap = floor(unix_timestamp(col("pts").cast("timestamp"))).cast("long") -
        floor(unix_timestamp(col("cts").cast("timestamp"))).cast("long")
      purchases.join(clicks, "user_id")
        .filter(col("cts") < col("pts") && gap <= 7L * 86400L)
        .withColumn("n_touch",
          count(lit(1)).over(Window.partitionBy("purchase_id")))
        .groupBy("campaign")
        .agg(sum(expr("1000000 div n_touch")).as("credit_ppm"),
          count(lit(1)).as("n_touches"))
        .orderBy("campaign")
    }),

    // CHURN LABELING — the label-engineering pass of a retention
    // model: per-user activity features (event/purchase counts,
    // recency vs the dataset horizon) + a 7-day-inactivity churn flag.
    // One user-keyed aggregation + a 1-row broadcast horizon — the
    // per-user feature-table shape that stays one shuffle at any
    // event volume.
    "q_churn_label" -> ((s, d) => {
      val ev = events(s, d)
      val mx = broadcast(ev.agg(max(col("ts")).as("tmax")))
      ev.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n_purchases"),
          max(col("ts")).as("last_ts"))
        .join(mx)
        .select(col("user_id"), col("n_events"), col("n_purchases"),
          (floor(unix_timestamp(col("tmax").cast("timestamp"))).cast("long") -
            floor(unix_timestamp(col("last_ts").cast("timestamp"))).cast("long"))
            .as("recency_s"))
        .withColumn("churned", col("recency_s") > 7L * 86400L)
        .orderBy("user_id")
    }),

    // TWO-PROPORTION Z-TEST (A/B readout) — did cohort A convert
    // better than cohort B? Deterministic assignment (user_id parity),
    // conversion = user has ≥1 purchase, pooled-variance z statistic.
    // Everything up to the final 1-row expression is integral counts
    // (one user-keyed agg + one 4-value conditional pivot); the z
    // itself is a single deterministic FP expression over those
    // integers, rounded to 6 — the statistical-rigor family's
    // (bootstrap/conformal) hypothesis-test sibling.
    "q_ab_ztest" -> ((s, d) => {
      val users = events(s, d)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      val p0 = col("c0").cast("double") / col("n0")
      val p1 = col("c1").cast("double") / col("n1")
      val pp = (col("c0") + col("c1")).cast("double") / (col("n0") + col("n1"))
      users.groupBy("cohort")
        .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
        .agg(max(when(col("cohort") === 0, col("n"))).as("n0"),
          max(when(col("cohort") === 0, col("conv"))).as("c0"),
          max(when(col("cohort") === 1, col("n"))).as("n1"),
          max(when(col("cohort") === 1, col("conv"))).as("c1"))
        .select(col("n0"), col("c0"), col("n1"), col("c1"),
          round(p0, 6).as("p0"), round(p1, 6).as("p1"),
          round((p0 - p1) /
            sqrt(pp * (lit(1.0) - pp) *
              (lit(1.0) / col("n0") + lit(1.0) / col("n1"))), 6).as("z"))
    }),

    // LAST-TOUCH MARKETING ATTRIBUTION — the composed business query
    // the as-of machinery exists for: every purchase is credited to
    // the user's latest click within a 7-day lookback (clicks carry a
    // campaign id derived from their props JSON); purchases with no
    // in-window click report as campaign -1 ("organic"). One native
    // sort-merge as-of join (both sides shuffle once on user_id) +
    // one campaign-keyed aggregation — at scale this is the shape
    // that replaces the classic O(clicks × purchases) range self-join.
    // Revenue in integer cents (the money convention).
    "q_attribution" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts").as("pts"),
          expr("cast(round(value * 100) as bigint)").as("rev_c"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cts"),
          pmod(get_json_object(col("props"), "$.k").cast("long"), lit(8L))
            .as("campaign"))
      val gap = floor(unix_timestamp(col("pts").cast("timestamp"))).cast("long") -
        floor(unix_timestamp(col("cts").cast("timestamp"))).cast("long")
      graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")))
        .withColumn("credit",
          when(col("cts").isNotNull && gap <= 7L * 86400L, col("campaign"))
            .otherwise(lit(-1L)))
        .groupBy(col("credit").as("campaign"))
        .agg(count(lit(1)).as("n_conversions"), sum("rev_c").as("revenue_cents"))
        .orderBy("campaign")
    }),

    // FORWARD as-of through the native operator: for each purchase the
    // FIRST click strictly AFTER it (post-purchase engagement). Same
    // sort-merge shape as backward — the cursor consumes rows
    // at-or-before the left row and peeks the next instead of
    // buffering the last.
    "q_asof_forward" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cts"))
      graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")),
          direction = graft.plans.AsOfForward)
        .select(col("purchase_id"), col("user_id"),
          date_format(col("pts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id"),
          date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
        .orderBy("purchase_id")
    }),

    // INNER as-of: attributed purchases only — unmatched left rows are
    // dropped inside the merge pass (no null-fill, no post-filter), so
    // the operator's output is exactly the attribution fact table.
    "q_asof_inner" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("cuser"),
          col("ts").as("cts"))
      graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("purchase_id")), Seq(col("cts"), col("click_id")),
          inner = true)
        .select(col("purchase_id"), col("user_id"), col("click_id"),
          (floor(unix_timestamp(col("pts").cast("timestamp"))).cast("long") -
            floor(unix_timestamp(col("cts").cast("timestamp"))).cast("long"))
            .as("gap_seconds"))
        .orderBy("purchase_id")
    }),

    // E8 sessionization: 30-min-gap sessions via lag + running sum —
    // one shuffle on user_id, then narrow window ops within partitions.
    "q_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
      val epoch = floor(unix_timestamp(col("ts").cast("timestamp")))
      events(s, d)
        .withColumn("prev_epoch", lag(epoch, 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_epoch").isNull || (epoch - col("prev_epoch")) >= 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          (sum(cents(col("value"))).cast("double") / 100).as("session_value"))
        .orderBy("user_id", "session_id")
    }),

    // E8 SESSION GAP TUNING — the design table behind q_sessionize's
    // 30-minute constant: sessionize at gap ∈ {10, 30, 60} minutes
    // and report session count, events/session, mean duration, and
    // the single-event-session share per gap — the curve that says
    // whether the gap is fragmenting real visits (high singleton
    // share) or gluing separate ones (durations jump). ONE shuffle on
    // (gap, user_id) over the ×3-exploded stream, then narrow window
    // ops within partitions — the q_sessionize shape paid three times
    // in one pass, never three passes.
    "q_session_gap_sweep" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"), col("ts"))
        .select(explode(array(lit(600L), lit(1800L), lit(3600L))).as("gap_s"),
          col("user_id"), col("event_id"), col("ts"))
      val byUser = Window.partitionBy("gap_s", "user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val epoch = floor(unix_timestamp(col("ts").cast("timestamp"))).cast("long")
      ev.withColumn("ep", epoch)
        .withColumn("prev", lag(col("ep"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev").isNull || col("ep") - col("prev") >= col("gap_s"), 1L)
            .otherwise(0L))
        .withColumn("session_id", sum("new_session").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("gap_s", "user_id", "session_id")
        .agg(count(lit(1)).as("n_ev"), (max("ep") - min("ep")).as("dur_s"))
        .groupBy("gap_s")
        .agg(count(lit(1)).as("n_sessions"),
          sum("n_ev").as("n_events"),
          sum("dur_s").as("total_dur_s"),
          sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_singletons"))
        .withColumn("events_per_session_ppm",
          expr("n_events * 1000000 div n_sessions"))
        .withColumn("mean_dur_s", expr("total_dur_s div n_sessions"))
        .withColumn("singleton_ppm", expr("n_singletons * 1000000 div n_sessions"))
        .select("gap_s", "n_sessions", "n_events", "events_per_session_ppm",
          "mean_dur_s", "n_singletons", "singleton_ppm")
        .orderBy("gap_s")
    }),

    // E8 SESSION PATH MINING: the top entry paths (first ≤3 event
    // types per 30-min-gap session) — the path-analysis complement to
    // the funnel. Same per-user sessionization as q_sessionize, then a
    // bounded per-session prefix: row_number ≤ 3 keeps state O(1) per
    // session, the path assembly is sort_array over ≤3 structs (the
    // deterministic collect_list ordering trick), and the final count
    // is a hash-agg on the path string — O(distinct paths) shuffle.
    "q_session_path" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val epoch = floor(unix_timestamp(col("ts").cast("timestamp")))
      val sess = events(s, d)
        .withColumn("prev_epoch", lag(epoch, 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_epoch").isNull || (epoch - col("prev_epoch")) >= 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bySess = Window.partitionBy("user_id", "session_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      sess.withColumn("rn", row_number().over(bySess))
        .filter(col("rn") <= 3)
        .groupBy("user_id", "session_id")
        .agg(array_join(
          transform(array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
    }),

    // E8 MARKOV TRANSITION MATRIX: per-user next-event pairs (lead over
    // a per-user window — bounded partitions, fine at scale), then a
    // hash-agg to (src, dst) counts with a row-normalized share in
    // integral ppm. The share window runs over the aggregate (≤
    // |event_types|² rows), not the data. The behavioral-analytics
    // complement to the funnel: where does each event type LEAD.
    "q_event_transitions" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("dst", lead(col("event_type"), 1).over(byUser))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy("src")))
        .withColumn("share_ppm", expr("n * 1000000 DIV tot"))
        .drop("tot")
        .orderBy("src", "dst")
    }),

    // E8 TRIGRAM BEHAVIOR PATTERNS — the order-3 extension of the
    // transition matrix: the top-20 consecutive event-type trigrams by
    // global support. 2-grams see A→B; trigrams are the shortest
    // window that distinguishes browse→cart→purchase from
    // browse→cart→abandon — the pattern a funnel design starts from.
    // Two leads over the per-user ordered window, one hash-agg over a
    // |types|³-bounded key space, global top-20 via TakeOrdered.
    "q_event_trigrams" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .withColumn("e2", lead(col("event_type"), 1).over(byUser))
        .withColumn("e3", lead(col("event_type"), 2).over(byUser))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("trigram"))
        .groupBy("trigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("trigram").asc)
        .limit(20)
    }),

    // E8 INTER-EVENT GAP HISTOGRAM — the distribution that JUSTIFIES a
    // sessionization timeout instead of assuming one: consecutive
    // same-user gaps in seconds, bucketed on a fixed log-ish ladder,
    // with each bucket's share. A session cut belongs in the valley
    // between the within-session mass and the between-visit mass —
    // this is how you find it. One lead + one 7-bucket hash-agg;
    // epoch seconds are exact integers in both engines (UTC session).
    "q_event_gap_hist" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val gaps = events(s, d)
        // exact integral microseconds (unix_micros ↔ epoch_us) — an
        // epoch-SECONDS cast would truncate sub-second components with
        // engine-specific rounding
        .withColumn("t1", unix_micros(col("ts").cast("timestamp")))
        .withColumn("t2", lead(col("t1"), 1).over(byUser))
        .filter(col("t2").isNotNull)
        .select((col("t2") - col("t1")).as("gap_us"))
      val bucketCase =
        """case when gap_us <= 10000000L then 10L
          |when gap_us <= 60000000L then 60L
          |when gap_us <= 600000000L then 600L
          |when gap_us <= 1800000000L then 1800L
          |when gap_us <= 3600000000L then 3600L
          |when gap_us <= 86400000000L then 86400L
          |else 999999999L end""".stripMargin
      val hist = gaps.withColumn("bucket_s", expr(bucketCase))
        .groupBy("bucket_s").agg(count(lit(1)).as("n_gaps"))
      hist.crossJoin(broadcast(hist.agg(sum("n_gaps").as("n_total"))))
        .withColumn("share_ppm", expr("n_gaps * 1000000 div n_total"))
        .select("bucket_s", "n_gaps", "share_ppm")
        .orderBy("bucket_s")
    }),

    // E8 AUTOCORRELATION FUNCTION — serial correlation of the daily
    // event-count series at lags 1..7, the first diagnostic before
    // fitting any forecaster ("is there weekly structure?"). Centered
    // on the integral floor-mean (deterministic both engines), ACF_k =
    // Σ dev_t·dev_{t+k} · 1e6 div Σ dev² in ppm. The only scan-sized
    // work is the first hash-agg to the daily series; the series is
    // bounded by the CALENDAR (O(days) rows regardless of corpus
    // size), so the lag self-join and the moment sums all run on
    // broadcastable inputs. At planet-scale daily counts (~1e9/day),
    // pre-scale v before squaring to keep dev² sums inside long range.
    "q_acf" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(count(lit(1)).as("v"))
      val m = broadcast(daily.agg(expr("sum(v) div count(1)").as("m")))
      val dev = daily.crossJoin(m).select(col("day"), (col("v") - col("m")).as("dev"))
      val den = broadcast(dev.agg(sum(col("dev") * col("dev")).as("den")))
      val devB = dev.select(col("day").as("bday"), col("dev").as("bdev"))
      val lags = broadcast(s.range(1, 8).select(col("id").as("lag_d")))
      dev.crossJoin(lags)
        .join(devB, col("bday") === col("day") + col("lag_d"))
        .groupBy("lag_d")
        .agg(count(lit(1)).as("n_pairs"), sum(col("dev") * col("bdev")).as("num"))
        .crossJoin(den)
        .withColumn("acf_ppm", expr("num * 1000000 div den"))
        .select("lag_d", "n_pairs", "acf_ppm")
        .orderBy("lag_d")
    }),

    // E8 CUSUM CHANGEPOINT SCAN — cumulative sum of deviations from
    // the integral mean over the daily count series; the |S| peak is
    // the classic single-changepoint estimate (where the level shift
    // happened), flagged per-row so the output is self-describing.
    // The running sum orders DAYS — bounded by the calendar like
    // q_temporal_split's cut, so the unpartitioned window never holds
    // more than O(days) rows no matter the corpus size; events are
    // touched exactly once by the leading hash-agg.
    "q_cusum" -> ((s, d) => {
      // localCheckpoint the O(days) series: mean, cusum and peak all
      // reuse it — without it the events scan ran four times
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("v"))
        .localCheckpoint()
      val m = broadcast(daily.agg(expr("sum(v) div count(1)").as("m")))
      val wd = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cu = daily.crossJoin(m)
        .withColumn("cusum", sum(col("v") - col("m")).over(wd))
      val peak = broadcast(cu.agg(max(abs(col("cusum"))).as("peak")))
      cu.crossJoin(peak)
        .withColumn("is_peak", (abs(col("cusum")) === col("peak")).cast("int"))
        .select(col("day").cast("string").as("day"), col("v"), col("cusum"),
          col("is_peak"))
        .orderBy("day")
    }),

    // E8 SEASONAL-NAIVE FORECAST BACKTEST — forecast each day's count
    // with the value 7 days prior (the baseline every real forecaster
    // must beat) and report per-day absolute error and APE in ppm.
    // One events hash-agg → O(days) series → a self-equi-join on the
    // shifted day key; nothing downstream scales with the corpus.
    "q_forecast_backtest" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("v"))
      val fc = daily.select(date_add(col("day"), lit(7)).as("day"),
        col("v").as("forecast"))
      daily.join(fc, Seq("day"))
        .withColumn("abs_err", abs(col("v") - col("forecast")))
        .withColumn("ape_ppm", expr("abs_err * 1000000 div v"))
        .select(col("day").cast("string").as("day"), col("v").as("actual"),
          col("forecast"), col("abs_err"), col("ape_ppm"))
        .orderBy("day")
    }),

    // E8 TRUNCATED EMA — exponentially-weighted moving average of the
    // daily series with binary half-life weights (128 >> k over the
    // trailing 8 days), held EXACTLY in integers: num = Σ v_{t-k}·
    // (128>>k), den = Σ weights actually present (so the series head
    // self-normalizes). The weight spinner fans each daily row out 8×
    // — O(days·8), not O(events) — then one tiny hash-agg re-keys on
    // the target day; the recursion-free formulation is what makes
    // EMA distributable (and cross-engine exact, unlike float α-decay).
    "q_ema" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("v"))
      val ks = broadcast(s.range(0, 8).select(col("id").cast("int").as("k")))
      val contrib = daily.crossJoin(ks)
        .select(date_add(col("day"), col("k")).as("day"),
          expr("v * shiftright(128L, k)").as("wv"),
          expr("shiftright(128L, k)").as("w"))
      daily.join(contrib.groupBy("day")
          .agg(sum("wv").as("num"), sum("w").as("den")), Seq("day"))
        .withColumn("ema", expr("num div den"))
        .select(col("day").cast("string").as("day"), col("v"), col("ema"))
        .orderBy("day")
    }),

    // E8 KAPLAN-MEIER SURVIVAL — time from a user's first event to
    // first purchase, right-censored at the corpus horizon: per event
    // day t, at-risk n_t (users whose observed time ≥ t), events d_t,
    // and the product-limit survival S(t) = Π_{u≤t}(1 − d_u/n_u),
    // realized as exp(Σ ln((n−d)/n)) over the calendar-bounded day
    // grid (the ln-sum precedent; round 6). The at-risk counts come
    // from ONE cumulative window over the per-day observation counts
    // (at_risk = N − removed-before-t) — never a per-user scan per
    // day. Corpus-sized work = two user-keyed hash-aggs; everything
    // after is O(days).
    "q_survival" -> ((s, d) => {
      val ev = events(s, d)
      val maxd = broadcast(ev.agg(max(to_date(col("ts"))).as("maxd")))
      val users = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("entry"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("first_p"))
        .crossJoin(maxd)
        .select(col("user_id"),
          coalesce(datediff(col("first_p"), col("entry")),
            datediff(col("maxd"), col("entry"))).cast("long").as("obs"),
          col("first_p").isNotNull.cast("long").as("ev"))
      val n = broadcast(users.agg(count(lit(1)).as("big_n")))
      val byDay = users.groupBy("obs")
        .agg(count(lit(1)).as("removed"), sum("ev").as("d"))
      val wAsc = Window.orderBy("obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
      val grid = byDay.crossJoin(n)
        .withColumn("at_risk",
          col("big_n") - coalesce(sum(col("removed")).over(wAsc), lit(0L)))
        .filter(col("d") > 0)
      val wCum = Window.orderBy("obs")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // at_risk == d can only happen on the terminal step (someone must
      // remain at risk for any later step to exist): S hits exactly 0
      // there, which ln cannot express — flag it instead of ln(0)
      grid
        .withColumn("ln_term", when(col("at_risk") > col("d"),
          log((col("at_risk") - col("d")).cast("double") /
            col("at_risk").cast("double"))))
        .withColumn("hit_zero",
          max((col("at_risk") === col("d")).cast("int")).over(wCum))
        .withColumn("surv", when(col("hit_zero") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("ln_term")).over(wCum)), 6)))
        .select(col("obs").as("day"), col("at_risk"), col("d").as("events"),
          col("surv"))
        .orderBy("day")
    }),

    // E8 MAX DRAWDOWN — peak-to-current decline of the daily revenue
    // series in exact cents, with the worst day flagged: the
    // degradation scalar ops reviews ask for ("how far below the best
    // day are we, and when was it worst"). Running max over the
    // calendar-bounded daily aggregate (the q_cusum argument), one
    // corpus-sized hash-agg total.
    "q_drawdown" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("rev_c"))
      val wd = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("peak_c", max(col("rev_c")).over(wd))
        .withColumn("drawdown_c", col("peak_c") - col("rev_c"))
      val mx = broadcast(dd.agg(max(col("drawdown_c")).as("mdd")))
      dd.crossJoin(mx)
        .withColumn("is_max_dd", (col("drawdown_c") === col("mdd")).cast("int"))
        .select(col("day").cast("string").as("day"), col("rev_c"),
          col("peak_c"), col("drawdown_c"), col("is_max_dd"))
        .orderBy("day")
    }),

    // E8 EMPIRICAL-BAYES SMOOTHED CTR — per-user click-through rate
    // shrunk toward the global rate with prior strength m=10 (the
    // q_target_encoding formula applied to behavioral rates): naive
    // per-user CTRs rank a 1-view-1-click user above a 99/100 power
    // user; the shrinkage fixes exactly that. smoothed_ppm =
    // (clicks·1e6 + 10·global_ppm) div (views + 10), every term
    // integral. One user-keyed hash-agg + a broadcast 1-row global.
    "q_ctr_smoothed" -> ((s, d) => {
      val uv = events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .groupBy("user_id")
        .agg(sum((col("event_type") === "view").cast("long")).as("views"),
          sum((col("event_type") === "click").cast("long")).as("clicks"))
        .filter(col("views") > 0)
      val g = broadcast(uv.agg(
        expr("sum(clicks) * 1000000 div sum(views)").as("global_ppm")))
      uv.crossJoin(g)
        .withColumn("raw_ppm", expr("clicks * 1000000 div views"))
        .withColumn("smoothed_ppm",
          expr("(clicks * 1000000 + 10 * global_ppm) div (views + 10)"))
        .select("user_id", "views", "clicks", "raw_ppm", "smoothed_ppm")
        .orderBy("user_id")
    }),

    // E8 NEW-USER RATE — per day, the share of active users seen for
    // the FIRST time (the growth-analytics novelty curve; a cliff
    // here is an acquisition outage long before totals move). First-
    // seen day is one user-keyed min; the day join is O(days). Both
    // aggregates are map-side-combined single shuffles.
    "q_new_user_rate" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
      val dau = ev.distinct().groupBy("day").agg(count(lit(1)).as("dau"))
      val first = ev.groupBy("user_id").agg(min(col("day")).as("day"))
        .groupBy("day").agg(count(lit(1)).as("new_users"))
      dau.join(first, Seq("day"), "left")
        .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
        .withColumn("novelty_ppm", expr("new_users * 1000000 div dau"))
        .select(col("day").cast("string").as("day"), col("dau"),
          col("new_users"), col("novelty_ppm"))
        .orderBy("day")
    }),

    // E8 PARETO SHARE — how much of all activity the top decile of
    // users generates (the "80/20" concentration scalar; q_engagement
    // _gini's decision-ready sibling). Users are ranked by event count
    // DESC through the two-phase distributed row number (never one
    // task's sort), the decile cut is an exact integral rank bound,
    // and the shares are two sums. Output is one row.
    "q_pareto_share" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id").agg(count(lit(1)).as("n"))
      val gb = broadcast(users.agg(min("n").as("glo"), max("n").as("ghi"),
        count(lit(1)).as("n_users"), sum("n").as("total")))
      val ranked = graft.operators.PrefixSum.rowNumber(
        users.crossJoin(gb), Seq.empty,
        Seq(col("n").desc, col("user_id").asc),
        graft.operators.PrefixSum.rangeBucket(-col("n"), -col("ghi"),
          -col("glo"), 32), "rk")
      ranked
        .withColumn("in_top", (col("rk") * 10 <= col("n_users")).cast("long"))
        .agg(max(col("n_users")).as("n_users"), max(col("total")).as("total"),
          sum(col("in_top")).as("top_users"),
          sum(col("in_top") * col("n")).as("top_events"))
        .withColumn("pareto_ppm", expr("top_events * 1000000 div total"))
        .select("n_users", "top_users", "total", "top_events", "pareto_ppm")
    }),

    // E8 FANO FACTOR — per-type overdispersion of the daily count
    // series: var/mean in milli (population variance, so the whole
    // statistic is the exact integral (n·Σx²−(Σx)²) div (n·Σx) — no
    // float moment in sight). 1000 = Poisson-consistent arrivals;
    // materially above = bursty (incident retries, scraper storms);
    // below = rate-limited. Two cascaded hash-aggs, the q_regr_trend
    // streaming-moment shape.
    "q_fano" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum("x").as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("mean_milli", expr("sx * 1000 div n_days"))
        .withColumn("fano_milli",
          expr("(n_days * sxx - sx * sx) * 1000 div (n_days * sx)"))
        .select("event_type", "n_days", "mean_milli", "fano_milli")
        .orderBy("event_type")
    }),

    // E8/E10 INVERSE-PROPENSITY ESTIMATE — off-policy evaluation over
    // the event log treated as logged bandit feedback: each event
    // type's logging propensity p = n/N in ppm, and its contribution
    // to the IPS value of a uniform target policy over the 5 actions,
    // Σ r/(5p) = sum_value·N div (5n), in exact cents (sums grouped
    // per action BEFORE the reweighting division, so the estimate is
    // order-independent and hash-exact — the per-event r/p fold would
    // not be). One hash-agg to 5 rows + a broadcast 1-row total: the
    // estimator's cost is the scan, at any scale.
    "q_propensity" -> ((s, d) => {
      val byType = events(s, d)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_vc"))
      val tot = broadcast(byType.agg(sum("n").as("big_n")))
      byType.crossJoin(tot)
        .withColumn("propensity_ppm", expr("n * 1000000 div big_n"))
        .withColumn("ips_contrib_c", expr("sum_vc * big_n div (5 * n)"))
        .select("event_type", "n", "propensity_ppm", "sum_vc", "ips_contrib_c")
        .orderBy("event_type")
    }),

    // E8 CROSS-CORRELATION of two event series — does clicking LEAD
    // purchasing, and by how many days? Cross-covariance of the daily
    // click and purchase counts at lags −3..+3 (positive lag =
    // purchases shifted later), each series centered on its integral
    // floor-mean; the peak-|xcov| lag is flagged. Unnormalized on
    // purpose: the lags share one scale, so the argmax — the decision
    // output — is unaffected, and the statistic stays exactly integral
    // (a cross-engine sqrt of the two variances would not be). Same
    // scale shape as q_acf: one conditional hash-agg to the calendar-
    // bounded series, everything after is O(days·7) on broadcasts.
    "q_xcorr" -> ((s, d) => {
      val daily = events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(sum((col("event_type") === "click").cast("long")).as("a"),
          sum((col("event_type") === "purchase").cast("long")).as("b"))
      val m = broadcast(daily.agg(expr("sum(a) div count(1)").as("ma"),
        expr("sum(b) div count(1)").as("mb")))
      val dev = daily.crossJoin(m)
        .select(col("day"), (col("a") - col("ma")).as("da"),
          (col("b") - col("mb")).as("db"))
      val devB = dev.select(col("day").as("bday"), col("db").as("bdb"))
      val lags = broadcast(s.range(-3, 4).select(col("id").as("lag_d")))
      val xc = dev.crossJoin(lags)
        .join(devB, col("bday") === col("day") + col("lag_d"))
        .groupBy("lag_d")
        .agg(count(lit(1)).as("n_pairs"), sum(col("da") * col("bdb")).as("xcov"))
      val peak = broadcast(xc.agg(max(abs(col("xcov"))).as("peak")))
      xc.crossJoin(peak)
        .withColumn("is_peak", (abs(col("xcov")) === col("peak")).cast("int"))
        .select("lag_d", "n_pairs", "xcov", "is_peak")
        .orderBy("lag_d")
    }),

    // BEHAVIORAL ENTROPY — per-user event-type Shannon entropy (how
    // varied is each user's behavior), aggregated to the A/B cohorts
    // as a mean. The per-user H comes from integral counts via the
    // count-only form and is QUANTIZED to micro-nats (bigint) before
    // the cohort mean — so the mean is an exact integral sum/div, not
    // an order-sensitive double fold (the q_naive_bayes quantize-
    // before-sum rule applied to an aggregate of aggregates). Two
    // hash-aggs on (user, type) and (user); O(cohorts) output.
    "q_behavior_entropy" -> ((s, d) => {
      val perType = events(s, d)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val perUser = perType.groupBy("user_id")
        .agg(sum("c").as("n"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("s_clnc"))
        .withColumn("h_unats",
          round((log(col("n").cast("double")) - col("s_clnc") / col("n")) * 1000000)
            .cast("long"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      perUser.groupBy("cohort")
        .agg(count(lit(1)).as("n_users"),
          expr("sum(h_unats) div count(1)").as("mean_h_unats"),
          max("h_unats").as("max_h_unats"))
        .orderBy("cohort")
    }),

    // SHIPPING-DELAY PROFILE — days between order placement and line
    // shipment, profiled per order priority in integral buckets (≤7 /
    // ≤30 days ppm) plus mean/max: the ops-SLA readout. One broadcast-
    // dim-free equi join orders⋈lineitem shuffling on the order key,
    // then an O(priorities) aggregate.
    "q_ship_delay" -> ((s, d) => {
      val oj = lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("delay_d",
          datediff(col("l_shipdate"), col("o_orderdate")).cast("long"))
      oj.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          expr("sum(delay_d) div count(1)").as("mean_days"),
          max("delay_d").as("max_days"),
          expr("sum(case when delay_d <= 7 then 1 else 0 end) * 1000000 div count(1)")
            .as("le_7d_ppm"),
          expr("sum(case when delay_d <= 30 then 1 else 0 end) * 1000000 div count(1)")
            .as("le_30d_ppm"))
        .orderBy("o_orderpriority")
    }),

    // MARKOV STEADY-STATE PROBE — two power-iteration steps of the
    // event-type transition chain from the uniform start: where user
    // behavior concentrates after a couple of moves (the numerical
    // companion to q_event_transitions' raw probabilities, and the
    // 2-step view of what q_pagerank does on the doc graph). Each step
    // is π(j) ← Σᵢ π(i)·p_ppm(i→j) div 1e6 — pure bigint on the
    // O(types²) aggregated matrix, so the iteration costs nothing at
    // any corpus scale; mass lost to truncation/absorbing rows stays
    // visible in the reported sums rather than being renormalized
    // away. Heavy work = the one per-user lead() shuffle both
    // transition queries share.
    "q_markov_stationary" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = events(s, d)
        .withColumn("dst", lead(col("event_type"), 1).over(byUser))
        .filter(col("dst").isNotNull)
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy("src")))
        .withColumn("p_ppm", expr("n * 1000000 div tot"))
        .select("src", "dst", "p_ppm")
        .localCheckpoint() // O(types²) rows; feeds both iteration steps
      val states = trans.select(col("src").as("state"))
        .union(trans.select(col("dst"))).distinct()
      val pi0 = states
        .crossJoin(broadcast(states.agg(count(lit(1)).as("k"))))
        .select(col("state"), expr("1000000 div k").as("p0_ppm"))
      def step(pi: DataFrame, pcol: String, out: String): DataFrame =
        pi.join(trans, pi("state") === trans("src"))
          .groupBy(col("dst"))
          .agg(expr(s"sum($pcol * p_ppm) div 1000000").as(out))
          .select(col("dst").as("state"), col(out))
      val pi1 = step(pi0, "p0_ppm", "p1_ppm")
      val pi2 = step(pi1, "p1_ppm", "p2_ppm")
      pi0.join(pi1, Seq("state"), "left").join(pi2, Seq("state"), "left")
        .select(col("state"), col("p0_ppm"),
          coalesce(col("p1_ppm"), lit(0L)).as("p1_ppm"),
          coalesce(col("p2_ppm"), lit(0L)).as("p2_ppm"))
        .orderBy("state")
    }),

    // COHORT LTV CURVE — cumulative revenue per user by signup cohort
    // and week offset: the revenue companion of q_cohort_retention's
    // activity triangle (the curve a growth team reads payback periods
    // off). Integer cents end to end; the running sum is a window over
    // the (cohort, offset) AGGREGATE — O(weeks²) rows regardless of
    // event volume — and cohort sizes broadcast.
    "q_cohort_ltv" -> ((s, d) => {
      val ev = events(s, d)
      val firstSeen = ev.groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).as("cohort_w"))
      val rev = ev.select(col("user_id"), date_trunc("week", col("ts")).as("w"),
          expr("cast(round(value * 100) as bigint)").as("rev_c"))
        .join(firstSeen, "user_id")
        .groupBy(date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"),
          expr("datediff(w, cohort_w) div 7").as("week_offset"))
        .agg(sum("rev_c").as("rev_c"))
      val sizes = firstSeen
        .groupBy(date_format(col("cohort_w"), "yyyy-MM-dd").as("cohort_week"))
        .agg(count(lit(1)).as("cohort_n"))
      val wc = Window.partitionBy("cohort_week").orderBy("week_offset")
      rev.withColumn("cum_rev_c", sum("rev_c").over(wc))
        .join(broadcast(sizes), "cohort_week")
        .withColumn("ltv_c_per_user", expr("cum_rev_c div cohort_n"))
        .select("cohort_week", "week_offset", "rev_c", "cum_rev_c",
          "cohort_n", "ltv_c_per_user")
        .orderBy("cohort_week", "week_offset")
    }),

    // POWER ANALYSIS — required sample size per arm to detect a 10%
    // relative lift on the measured conversion rate at α=5%/power=80%:
    // n = (z_{α/2}+z_β)²·p(1−p)/(0.1p)² = 784·(1−p)/p, evaluated in
    // integral ppm from the measured base rate (the constants are the
    // standard normal quantiles, folded to 784 — no distribution math
    // at runtime). The planning companion to q_ab_ztest/q_ab_srm; one
    // user-keyed aggregate, O(1) output.
    "q_power_analysis" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
      users.agg(count(lit(1)).as("n_users"), sum("conv").as("n_conv"))
        .withColumn("p_ppm", expr("n_conv * 1000000 div n_users"))
        .withColumn("mde_rel_ppm", lit(100000L))
        // zero purchases ⇒ p_ppm = 0: Spark's div yields NULL but
        // DuckDB's // RAISES — the kappa_milli convention: explicit
        // NULL on both engines (round-7 ADVICE)
        .withColumn("n_per_arm", expr(
          "case when p_ppm = 0 then null " +
            "else 784 * (1000000 - p_ppm) div p_ppm end"))
        .select("n_users", "n_conv", "p_ppm", "mde_rel_ppm", "n_per_arm")
    }),

    // QUANTILE TREATMENT EFFECT — the distributional readout a mean
    // lift hides: per-cohort exact p50/p90 of per-user revenue and
    // their differences (a treatment moving only the tail shows a
    // zero median QTE and a large p90 QTE). Revenue in integer cents;
    // quantiles via the exact per-group percentile over the per-USER
    // aggregate (O(users) rows, cohort-keyed — never a global sort of
    // raw events), rounded 4 like the q_percentiles precedent.
    "q_qte" -> ((s, d) => {
      val rev = events(s, d)
        .groupBy("user_id")
        .agg(sum(expr("cast(round(value * 100) as bigint)")).as("rev_c"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      rev.groupBy("cohort").agg(
          expr("percentile(rev_c, 0.5)").as("p50"),
          expr("percentile(rev_c, 0.9)").as("p90"))
        .agg(
          max(when(col("cohort") === 0, col("p50"))).as("p50_a"),
          max(when(col("cohort") === 1, col("p50"))).as("p50_b"),
          max(when(col("cohort") === 0, col("p90"))).as("p90_a"),
          max(when(col("cohort") === 1, col("p90"))).as("p90_b"))
        .select(round(col("p50_a"), 4).as("p50_a"),
          round(col("p50_b"), 4).as("p50_b"),
          round(col("p50_b") - col("p50_a"), 4).as("qte_p50"),
          round(col("p90_a"), 4).as("p90_a"),
          round(col("p90_b"), 4).as("p90_b"),
          round(col("p90_b") - col("p90_a"), 4).as("qte_p90"))
    }),

    // STRATIFIED SRM — the assignment-balance audit per first-seen-day
    // stratum: a day-localized randomization bug (one day's traffic
    // routed 70/30) can pool to a healthy-looking global ratio, so the
    // per-stratum χ² contributions AND their pooled sum (df = #strata)
    // are both reported, all in the same exact integral milli as
    // q_ab_srm. One user-keyed agg + one O(days) aggregate.
    "q_stratified_srm" -> ((s, d) => {
      val u = events(s, d).groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("fs"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      val strata = u.groupBy("fs").agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
          count(lit(1)).as("n"))
        .withColumn("chi2_milli",
          expr("((2 * n_a - n) * (2 * n_a - n) * 1000) div n"))
      val tot = broadcast(strata.agg(
        sum("chi2_milli").as("chi2_total_milli"), count(lit(1)).as("df")))
      strata.crossJoin(tot)
        .select(col("fs").as("stratum_day"), col("n_a"),
          (col("n") - col("n_a")).as("n_b"), col("chi2_milli"),
          col("chi2_total_milli"), col("df"))
        .orderBy("stratum_day")
    }),

    // SEQUENTIAL A/B MONITOR — the daily peeking view of the parity
    // experiment: cumulative users and converters per cohort by day,
    // the two-proportion z² at each peek (exact cross-multiplied
    // integral milli — z² = (ca·nb − cb·na)²·n / (na·nb·c·(n−c))),
    // and a crossed flag against the 9.0 boundary (±3σ, the classic
    // conservative always-peek threshold — naive daily peeking at
    // 3.84 is exactly the error the sequential boundary exists to
    // prevent). Cumulative counts run as windows over the DAY GRID
    // (O(days·cohorts) rows built from per-user first-event
    // aggregates), so the peek table costs two user-keyed aggs no
    // matter the event volume; degenerate peeks (no conversions yet,
    // or all) report NULL rather than a fake statistic.
    "q_sequential_test" -> ((s, d) => {
      val ev = events(s, d)
      val firstSeen = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("fs"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      val firstPur = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(to_date(col("ts"))).as("fp"))
      val u = firstSeen.join(firstPur, Seq("user_id"), "left")
        .localCheckpoint() // feeds both histograms
      val days = ev.select(to_date(col("ts")).as("day")).distinct()
      val grid = days.crossJoin(broadcast(u.select("cohort").distinct()))
      val seenH = u.groupBy(col("fs").as("day"), col("cohort"))
        .agg(count(lit(1)).as("ns"))
      val purH = u.filter(col("fp").isNotNull)
        .groupBy(col("fp").as("day"), col("cohort"))
        .agg(count(lit(1)).as("np"))
      val w = Window.partitionBy("cohort").orderBy("day")
      val cum = grid
        .join(seenH, Seq("day", "cohort"), "left")
        .join(purH, Seq("day", "cohort"), "left")
        .withColumn("n", sum(coalesce(col("ns"), lit(0L))).over(w))
        .withColumn("c", sum(coalesce(col("np"), lit(0L))).over(w))
        .select("day", "cohort", "n", "c")
      cum.groupBy("day").agg(
          max(when(col("cohort") === 0, col("n"))).as("na"),
          max(when(col("cohort") === 0, col("c"))).as("ca"),
          max(when(col("cohort") === 1, col("n"))).as("nb"),
          max(when(col("cohort") === 1, col("c"))).as("cb"))
        .withColumn("z2_milli", expr(
          """case when na > 0 and nb > 0 and (ca + cb) > 0
            |      and (ca + cb) < (na + nb)
            |then ((ca * nb - cb * na) * (ca * nb - cb * na) * (na + nb) * 1000)
            |     div (na * nb * (ca + cb) * (na + nb - ca - cb))
            |else null end""".stripMargin))
        .withColumn("crossed",
          (coalesce(col("z2_milli"), lit(0L)) > 9000L).cast("int"))
        .select("day", "na", "ca", "nb", "cb", "z2_milli", "crossed")
        .orderBy("day")
    }),

    // SAMPLE-RATIO MISMATCH — the experiment-hygiene gate run before
    // ANY A/B readout: a 1-df χ² of the realized 50/50 assignment
    // counts, in exact integral milli via the closed form
    // (2·n_a − n)²/n, flagged against the 5% critical value 3.841.
    // An SRM flag means the assignment (q_ab_ztest's parity cohorts)
    // is biased and every downstream lift number is garbage — the
    // cheapest, highest-value check in the experimentation family.
    // One distinct + one aggregate; O(1) output.
    "q_ab_srm" -> ((s, d) => {
      val users = events(s, d).select(col("user_id")).distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      users.agg(
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("n_a"),
          sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("n_b"),
          count(lit(1)).as("n"))
        .withColumn("chi2_milli",
          expr("((2 * n_a - n) * (2 * n_a - n) * 1000) div n"))
        .withColumn("srm_flag", (col("chi2_milli") > 3841L).cast("int"))
        .select("n_a", "n_b", "n", "chi2_milli", "srm_flag")
    }),

    // CUPED VARIANCE REDUCTION — the pre-experiment-covariate
    // adjustment every mature experimentation platform applies:
    // θ = cov(pre, post)/var(pre) over per-user revenue split at the
    // series midpoint, and ρ² (the variance fraction CUPED removes).
    // All five moments are EXACT bigint sums of integer cents; the
    // two ratios are single deterministic IEEE expressions over those
    // exact moments, rounded 6 (the q_regr_trend convention — the
    // only floats are final divisions). One user-keyed aggregate +
    // one O(1) moment row; nothing rescans events.
    // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental readout when
    // assignment isn't randomized at treatment start: per-user mean
    // purchase revenue (integer cents, fixed per-group user
    // denominator) in the pre/post windows (the q_cuped day-15 split
    // from the first observed day) for the treated (user_id % 3 = 0,
    // the randomized_response convention) vs control group; DiD =
    // (T_post − T_pre) − (C_post − C_pre). All integral cents and
    // counts — one user-distinct aggregate + one 4-cell aggregate,
    // O(1) output.
    "q_diff_in_diff" -> ((s, d) => {
      val ev = events(s, d)
      val m0 = broadcast(ev.agg(min(to_date(col("ts"))).as("d0")))
      val base = ev.crossJoin(m0)
        .select(col("user_id"),
          (col("user_id") % 3 === 0).as("treat"),
          (datediff(to_date(col("ts")), col("d0")) < 15).as("pre"),
          when(col("event_type") === "purchase", cents(col("value")))
            .otherwise(0L).as("rev_c"))
      val users = base.select("user_id", "treat").distinct()
        .groupBy("treat").agg(count(lit(1)).as("n_users"))
      val cell = base.groupBy("treat", "pre").agg(sum("rev_c").as("rev_c"))
        .join(broadcast(users), "treat")
        .withColumn("mean_c", expr("rev_c div n_users"))
      val m = cell.agg(
        coalesce(sum(when(col("treat") && col("pre"), col("mean_c"))), lit(0L))
          .as("t_pre_c"),
        coalesce(sum(when(col("treat") && !col("pre"), col("mean_c"))), lit(0L))
          .as("t_post_c"),
        coalesce(sum(when(!col("treat") && col("pre"), col("mean_c"))), lit(0L))
          .as("c_pre_c"),
        coalesce(sum(when(!col("treat") && !col("pre"), col("mean_c"))), lit(0L))
          .as("c_post_c"))
      val u2 = users.agg(
        coalesce(sum(when(col("treat"), col("n_users"))), lit(0L)).as("n_treat"),
        coalesce(sum(when(!col("treat"), col("n_users"))), lit(0L)).as("n_ctrl"))
      m.crossJoin(broadcast(u2))
        .withColumn("did_c",
          expr("(t_post_c - t_pre_c) - (c_post_c - c_pre_c)"))
        .select("n_treat", "n_ctrl", "t_pre_c", "t_post_c",
          "c_pre_c", "c_post_c", "did_c")
    }),

    "q_cuped" -> ((s, d) => {
      val ev = events(s, d)
      val m0 = broadcast(ev.agg(min(to_date(col("ts"))).as("d0")))
      val ux = ev.crossJoin(m0)
        .select(col("user_id"),
          when(datediff(to_date(col("ts")), col("d0")) < 15,
            expr("cast(round(value * 100) as bigint)")).otherwise(0L).as("xc"),
          when(datediff(to_date(col("ts")), col("d0")) >= 15,
            expr("cast(round(value * 100) as bigint)")).otherwise(0L).as("yc"))
        .groupBy("user_id").agg(sum("xc").as("x"), sum("yc").as("y"))
      ux.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .withColumn("cov_n", col("n") * col("sxy") - col("sx") * col("sy"))
        .withColumn("var_x", col("n") * col("sxx") - col("sx") * col("sx"))
        .withColumn("var_y", col("n") * col("syy") - col("sy") * col("sy"))
        .select(col("n"), col("cov_n"), col("var_x"), col("var_y"),
          round(col("cov_n").cast("double") / col("var_x"), 6).as("theta"),
          round((col("cov_n").cast("double") * col("cov_n").cast("double")) /
            (col("var_x").cast("double") * col("var_y").cast("double")), 6)
            .as("rho2"))
    }),

    // FUNNEL STAGE LATENCY — how long users take between funnel
    // stages: per purchase the last same-user click at-or-before it,
    // per click the last view, both through the NATIVE sort-merge
    // as-of join (the q_attribution shape — one merge pass, never the
    // O(a·b) range self-join), with the latency profile reported as
    // integral threshold buckets (<1 min / <1 h / <1 d in ppm) plus
    // min/max/mean seconds — bucket counts give the latency shape
    // without any global percentile sort. Two as-of joins + one
    // O(stages) aggregate.
    "q_funnel_latency" -> ((s, d) => {
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id"), col("ts").as("pts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("user_id").as("cuser"),
          col("ts").as("cts"))
      val clicksL = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("cid2"), col("user_id").as("cuser2"),
          col("ts").as("cts2"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("vid"), col("user_id").as("vuser"),
          col("ts").as("vts"))
      def secs(a: Column, b: Column): Column =
        floor(unix_timestamp(a.cast("timestamp"))).cast("long") -
          floor(unix_timestamp(b.cast("timestamp"))).cast("long")
      val pc = graft.plans.AsOfJoin(purchases, clicks,
          Seq(col("user_id")), Seq(col("cuser")),
          Seq(col("pts"), col("pid")), Seq(col("cts"), col("cid")))
        .filter(col("cts").isNotNull)
        .select(lit("click_to_purchase").as("stage"),
          secs(col("pts"), col("cts")).as("lat_s"))
      val cv = graft.plans.AsOfJoin(clicksL, views,
          Seq(col("cuser2")), Seq(col("vuser")),
          Seq(col("cts2"), col("cid2")), Seq(col("vts"), col("vid")))
        .filter(col("vts").isNotNull)
        .select(lit("view_to_click").as("stage"),
          secs(col("cts2"), col("vts")).as("lat_s"))
      pc.unionByName(cv)
        .groupBy("stage")
        .agg(count(lit(1)).as("n"), min("lat_s").as("min_s"),
          max("lat_s").as("max_s"),
          expr("sum(lat_s) div count(1)").as("mean_s"),
          expr("sum(case when lat_s < 60 then 1 else 0 end) * 1000000 div count(1)")
            .as("lt_1m_ppm"),
          expr("sum(case when lat_s < 3600 then 1 else 0 end) * 1000000 div count(1)")
            .as("lt_1h_ppm"),
          expr("sum(case when lat_s < 86400 then 1 else 0 end) * 1000000 div count(1)")
            .as("lt_1d_ppm"))
        .orderBy("stage")
    }),

    // BINARY-SEGMENTATION CHANGEPOINT — the single best level-shift
    // split of the daily event series: argmax over split s of
    // (Σx_l)²/n_l + (Σx_r)²/n_r (equivalent to minimizing total SSE
    // for a two-segment piecewise-constant fit). The statistic is
    // carried in integral milli (cross-multiplied bigint, truncating
    // div — identical in both engines), and every candidate split is
    // reported with its score plus the is_best flag, so the argmax is
    // auditable. All heavy work is the daily rollup (one shuffle of
    // events onto the calendar); the scan/window runs over the
    // O(days) aggregate — the q_cusum precedent. At planetary counts
    // pre-scale x before squaring (the q_acf caveat).
    "q_changepoint" -> ((s, d) => {
      val daily = events(s, d).groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.orderBy("day") // calendar-bounded aggregate
      val n = broadcast(daily.agg(count(lit(1)).as("n_days"), sum("x").as("tot")))
      val g = daily
        .withColumn("i", row_number().over(w).cast("long"))
        .withColumn("cum", sum("x").over(w))
        .crossJoin(n)
        .filter(col("i") <= col("n_days") - 1)
        .withColumn("g_milli", expr(
          """(cum * cum * 1000) div i +
            |((tot - cum) * (tot - cum) * 1000) div (n_days - i)""".stripMargin))
      val best = broadcast(g.agg(max("g_milli").as("gbest")))
      g.crossJoin(best)
        .select(col("day").as("split_after"), col("i").as("n_left"),
          col("cum").as("sum_left"), col("g_milli"),
          (col("g_milli") === col("gbest")).cast("int").as("is_best"))
        .orderBy("split_after")
    }),

    // DAU/WAU STICKINESS — the product-health ratio (what share of the
    // week's active users showed up each day), integral ppm. Two
    // distinct-user rollups (day- and week-grained) that shuffle on
    // (period, user); the per-period outputs are calendar-bounded
    // (O(days), O(weeks)), so the week side broadcasts into the day
    // table no matter how large the event volume — the classic
    // aggregate-then-join shape that never re-shuffles raw events.
    "q_stickiness" -> ((s, d) => {
      val ev = events(s, d).select(col("user_id"),
        to_date(col("ts")).as("day"),
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("week"))
      val dau = ev.distinct()
        .groupBy("day", "week").agg(count(lit(1)).as("dau"))
      val wau = ev.select("week", "user_id").distinct()
        .groupBy("week").agg(count(lit(1)).as("wau"))
      dau.join(broadcast(wau), "week")
        .withColumn("stickiness_ppm", expr("dau * 1000000 div wau"))
        .select("day", "week", "dau", "wau", "stickiness_ppm")
        .orderBy("day")
    }),

    // THEIL–SEN ROBUST TREND — the median of all pairwise slopes of
    // the daily purchase-count series: the robust alternative to
    // q_regr_trend's OLS line (a single outlier day moves OLS but not
    // the pairwise median; breakdown point 29%). Slopes in integral
    // micro-units/day (truncating div — Spark `div` and DuckDB `//`
    // both truncate toward zero, verified on negative slopes); the
    // median is the exact rank-selected element (odd n) or the floor
    // mean of the two middle elements (even n), never a double
    // percentile. Scale: the pair set is O(days²) of the CALENDAR —
    // bounded by the observation window, not the event volume (the
    // q_markov_stationary convention) — so the single-partition rank
    // window holds a few thousand rows at any SF; raw events fold to
    // O(days) in one map-side-combined hash-agg first.
    "q_theil_sen" -> ((s, d) => {
      val daily = events(s, d).filter(col("event_type") === "purchase")
        .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint() // O(days) rows; feeds the self-join twice
      val later = daily.select(col("day").as("d2"), col("y").as("y2"))
      val slopes = daily.join(later, col("d2") > col("day"))
        .select(col("day").as("d1"), col("d2"),
          expr("(y2 - y) * 1000000 div (d2 - d1)").as("slope_micro"))
      val ranked = slopes.withColumn("rk", row_number().over(
        Window.orderBy(col("slope_micro"), col("d1"), col("d2"))))
      val stats = broadcast(slopes.agg(count(lit(1)).as("n_pairs"),
        min(col("slope_micro")).as("min_slope_micro"),
        max(col("slope_micro")).as("max_slope_micro")))
      ranked.crossJoin(stats)
        .filter(expr("rk = (n_pairs + 1) div 2 or rk = n_pairs div 2 + 1"))
        .groupBy("n_pairs", "min_slope_micro", "max_slope_micro")
        .agg(expr("sum(slope_micro) div count(1)").as("median_slope_micro"))
        .select("n_pairs", "median_slope_micro", "min_slope_micro",
          "max_slope_micro")
    }),

    // BRADLEY–TERRY PREFERENCE STRENGTHS — the model behind every
    // RLHF preference dataset and ranked-eval leaderboard: pairwise
    // comparisons (event types competing on same-user-same-day spend)
    // fold to a win matrix, then 3 fixed MM rounds
    // π_i ← W_i / Σ_j n_ij/(π_i+π_j) solve for latent strengths.
    // Entirely integral: strengths live in micro-units, each MM term
    // n_ij·10¹² div (π_i+π_j) is floored identically on both engines
    // before the sum (the quantize-before-sum rule), so the fixed-
    // round values are bit-identical. Scale: raw events fold once to
    // O(users·days·types) daily spend, the comparison join is keyed
    // on (user, day) — co-partitioned, never a cross — and everything
    // after lives on the O(types²) win matrix (≤ tens of rows, the
    // q_pagerank iterate shape with broadcast-sized state).
    "q_bradley_terry" -> ((s, d) => {
      val dayv = events(s, d).filter(col("value").isNotNull)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
        .agg(sum(cents(col("value"))).as("v"))
      val rhs = dayv.select(col("user_id"), col("day"),
        col("event_type").as("tb"), col("v").as("vb"))
      val comp = dayv.select(col("user_id"), col("day"),
          col("event_type").as("ta"), col("v").as("va"))
        .join(rhs, Seq("user_id", "day"))
        .filter(col("ta") < col("tb") && col("va") =!= col("vb"))
        .groupBy("ta", "tb")
        .agg(sum(when(col("va") > col("vb"), 1L).otherwise(0L)).as("wa"),
          sum(when(col("vb") > col("va"), 1L).otherwise(0L)).as("wb"))
        .localCheckpoint() // O(types²) rows; feeds wins + 3 MM rounds
      val edges = comp.select(col("ta").as("i"), col("tb").as("j"),
          (col("wa") + col("wb")).as("nij"))
        .union(comp.select(col("tb").as("i"), col("ta").as("j"),
          (col("wa") + col("wb")).as("nij")))
      val wins = comp.select(col("ta").as("i"), col("wa").as("w"))
        .union(comp.select(col("tb").as("i"), col("wb").as("w")))
        .groupBy("i").agg(sum("w").as("w"))
      var pi = wins.select(col("i"), lit(1000000L).as("pi"))
      for (_ <- 1 to 3) {
        val pj = pi.select(col("i").as("j"), col("pi").as("pj"))
        val den = edges.join(pi, "i").join(pj, "j")
          .select(col("i"),
            expr("nij * 1000000000000 div (pi + pj)").as("term"))
          .groupBy("i").agg(sum("term").as("den"))
        pi = wins.join(den, "i")
          // greatest(den,1): a type with zero wins drives π toward 0;
          // the guard keeps the degenerate fixpoint division-safe.
          // greatest(π,1) (round-8 ADVICE): clamp π itself to ≥ 1 so
          // two zero-π types sharing an edge can never make the next
          // round's per-term pi+pj denominator 0 — without it, parity
          // held only because Spark's div-by-zero NULL is skipped by
          // sum and DuckDB happens to agree; the clamp makes the
          // degenerate path explicit instead of semantics-dependent.
          .select(col("i"),
            expr("greatest(w * 1000000000000 div greatest(den, 1), 1)")
              .as("pi"))
      }
      wins.join(pi, "i")
        .withColumn("rank", row_number().over(
          Window.orderBy(col("pi").desc, col("i"))).cast("long"))
        .select(col("i").as("event_type"), col("w").as("wins"),
          col("pi").as("pi_micro"), col("rank"))
        .orderBy("rank")
    }),

    // UCB1 BANDIT SCOREBOARD — the explore/exploit readout an
    // experimentation platform serves next-allocation decisions from:
    // four policy arms (user_id mod 4), reward = purchase, score =
    // empirical mean + sqrt(2·ln N / n_i) exploration bonus. The mean
    // is exact integral milli; the bonus is the one sanctioned double
    // (sqrt∘ln, rounded to milli — the q_naive_bayes quantize-at-the-
    // boundary rule; IEEE sqrt is exact and the ln quantization is the
    // proven-green convention). One map-side-combined hash-agg to
    // O(arms) rows; everything after is broadcast arithmetic.
    "q_ucb_arms" -> ((s, d) => {
      val arms = events(s, d)
        .groupBy(pmod(col("user_id"), lit(4L)).as("arm"))
        .agg(count(lit(1)).as("n_pulls"),
          sum((col("event_type") === "purchase").cast("long")).as("n_rewards"))
      val tot = broadcast(arms.agg(sum("n_pulls").as("big_n")))
      arms.crossJoin(tot)
        .withColumn("mean_milli", expr("n_rewards * 1000 div n_pulls"))
        .withColumn("bonus_milli", expr(
          "cast(round(sqrt(2 * ln(cast(big_n as double)) / n_pulls) * 1000) as bigint)"))
        .withColumn("ucb_milli", col("mean_milli") + col("bonus_milli"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("ucb_milli").desc, col("arm").asc)).cast("long"))
        .select("arm", "n_pulls", "n_rewards", "mean_milli", "bonus_milli",
          "ucb_milli", "rank")
        .orderBy("arm")
    }),

    // PROPENSITY-SCORE MATCHING — the ATT estimator q_propensity's
    // weighting view doesn't give: each treated user (odd user_id)
    // matched to its nearest control by purchase-rate score within a
    // ±25-milli caliper, then the average treated-minus-control spend
    // gap over matched pairs. Scale: the nearest pick is min by
    // (gap, uid_c), so only the min-uid control AT EACH SCORE can ever
    // win — controls first fold to one representative per score point
    // (the score lattice is ≤1001 integral milli values by
    // construction), and the caliper join probes that BROADCAST
    // lattice with ±1-bucket fan-out. Cost is two user-keyed
    // hash-aggs + a broadcast probe: linear in users, never
    // treated×control (a direct caliper join would be quadratic —
    // every control shares one bounded score axis).
    "q_psm_match" -> ((s, d) => {
      val users = events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_ev"),
          sum((col("event_type") === "purchase").cast("long")).as("n_buy"),
          sum(when(col("event_type") === "purchase", cents(col("value")))
            .otherwise(0L)).as("spend_c"))
        .withColumn("score_milli", expr("n_buy * 1000 div n_ev"))
        .localCheckpoint() // feeds both sides of the match + the count
      val treated = users.filter(pmod(col("user_id"), lit(2L)) === 1)
        .select(col("user_id").as("uid_t"), col("score_milli").as("score_t"),
          col("spend_c").as("spend_t"), expr("score_milli div 25").as("bucket"))
      // dominant representative per control score: min uid wins every
      // (gap, uid) tie-break among equals, so the fold is lossless
      val control = users.filter(pmod(col("user_id"), lit(2L)) === 0)
        .groupBy(col("score_milli").as("score_c"))
        .agg(min("user_id").as("uid_c"),
          expr("min_by(spend_c, user_id)").as("spend_ctl"))
        .withColumn("bucket_c", expr("score_c div 25"))
      val nt = broadcast(treated.agg(count(lit(1)).as("n_treated")))
      val best = treated
        .withColumn("nb", explode(array(col("bucket") - 1, col("bucket"),
          col("bucket") + 1)))
        .join(broadcast(control), col("nb") === col("bucket_c"))
        .withColumn("gap", abs(col("score_t") - col("score_c")))
        .filter(col("gap") <= 25)
        .withColumn("rn", row_number().over(Window.partitionBy("uid_t")
          .orderBy(col("gap").asc, col("uid_c").asc)))
        .filter(col("rn") === 1)
      best.agg(count(lit(1)).as("n_matched"),
          sum(col("spend_t") - col("spend_ctl")).as("sum_diff_c"),
          sum("gap").as("sum_gap"))
        .crossJoin(nt)
        .select(col("n_treated"), col("n_matched"),
          expr("case when n_matched = 0 then null else sum_diff_c div n_matched end")
            .as("att_cents"),
          expr("case when n_matched = 0 then null else sum_gap div n_matched end")
            .as("mean_gap_milli"))
    }),

    // GRANGER-STYLE LEAD TEST — does yesterday's CLICK series improve
    // the prediction of today's PURCHASES beyond purchases' own
    // history? SSR of the restricted AR(1) fit vs the full lag-1
    // bivariate fit, both in closed form over centered integral sums
    // (deviations from the floor-mean, the q_xcorr convention), the
    // single division per SSR floored identically on both engines.
    // The directional companion to q_xcorr's symmetric lag scan.
    // Scale: one hash-agg to the calendar-bounded daily series, one
    // day-keyed lag join, one 7-sum aggregate — O(days) everything;
    // the moment sums are uniformly down-scaled by a data-derived
    // factor before the degree-3 SSR combination, so no corpus size
    // can push the products past 2⁶³ (ssr_restricted/ssr_full are
    // reported in those sc-scaled units; improvement_ppm, the
    // statistic, is scale-invariant).
    "q_granger" -> ((s, d) => {
      val daily = events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
        .agg(sum((col("event_type") === "click").cast("long")).as("x"),
          sum((col("event_type") === "purchase").cast("long")).as("y"))
      val m = broadcast(daily.agg(expr("sum(x) div count(1)").as("mx"),
        expr("sum(y) div count(1)").as("my")))
      val dev = daily.crossJoin(m)
        .select(col("day"), (col("x") - col("mx")).as("dx"),
          (col("y") - col("my")).as("dy"))
      val prev = dev.select((col("day") + 1).as("day"),
        col("dx").as("v"), col("dy").as("u"))
      dev.select(col("day"), col("dy").as("w")).join(prev, "day")
        .agg(count(lit(1)).as("n_pairs"),
          sum(expr("w * w")).as("sww"), sum(expr("u * u")).as("suu"),
          sum(expr("v * v")).as("svv"), sum(expr("u * w")).as("suw"),
          sum(expr("v * w")).as("svw"), sum(expr("u * v")).as("suv"))
        // OVERFLOW PRE-SCALE (round-8 ADVICE): the ssr_full numerator
        // is degree-3 in the moment sums, so raw sums past ~2×10⁶
        // would silently wrap on Spark (non-ANSI) while DuckDB raises
        // — the engines would diverge exactly when the corpus grows.
        // improvement_ppm is a ratio of quantities HOMOGENEOUS degree
        // 1 in the sums, so uniformly down-scaling all six sums by a
        // data-derived sc leaves it invariant (up to the truncation
        // noise both engines share: div and // both truncate toward
        // zero, including for negatives). sc = maxabs div 5·10⁵ caps
        // every scaled sum at 10⁶ → each triple product ≤ 10¹⁸ and
        // the 3-term numerator ≤ 4×10¹⁸ < 2⁶³ at ANY corpus size.
        .withColumn("sc", expr(
          """greatest(1, greatest(abs(sww), abs(suu), abs(svv), abs(suw),
            |                     abs(svw), abs(suv)) div 500000)""".stripMargin))
        .withColumn("sww", expr("sww div sc"))
        .withColumn("suu", expr("suu div sc"))
        .withColumn("svv", expr("svv div sc"))
        .withColumn("suw", expr("suw div sc"))
        .withColumn("svw", expr("svw div sc"))
        .withColumn("suv", expr("suv div sc"))
        .withColumn("ssr_restricted", expr(
          "case when suu = 0 then null else sww - suw * suw div suu end"))
        .withColumn("det", expr("suu * svv - suv * suv"))
        .withColumn("ssr_full", expr(
          """case when det = 0 then null
            |else sww - (suw * suw * svv + svw * svw * suu
            |            - 2 * suw * svw * suv) div det end""".stripMargin))
        .withColumn("improvement_ppm", expr(
          """case when ssr_restricted is null or ssr_full is null
            |       or ssr_restricted <= 0 then null
            |else (ssr_restricted - ssr_full) * 1000000 div ssr_restricted
            |end""".stripMargin))
        .select("n_pairs", "ssr_restricted", "ssr_full", "improvement_ppm")
    }),

    // E8 HOLT LINEAR-TREND SMOOTHING — the double-exponential
    // counterpart to q_ema: level and trend update jointly
    // (α = β = 1/2 via truncating halving, held EXACTLY in integral
    // micro-units), so the one-step-ahead forecast l+b tracks a
    // drifting series where the flat EMA lags. The recursion is
    // inherently sequential, but only over the CALENDAR-BOUNDED daily
    // aggregate: one events hash-agg collapses the corpus to O(days)
    // rows, a single `aggregate()` fold replays the recursion over the
    // sorted series (≤ a few thousand structs even at decade spans —
    // driver-free, one task), and the forecast lag is an O(days)
    // window. Corpus-sized work = exactly one scan.
    "q_holt" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg((count(lit(1)) * 1000000L).as("v"))
      val folded = daily
        .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("vs"))
        .filter(size(col("vs")) > 0)
        .select(explode(expr(
          """aggregate(
            |  slice(vs, 2, greatest(size(vs) - 1, 0)),
            |  named_struct('l', vs[0].v, 'b', cast(0 as bigint),
            |    'out', array(named_struct('day', vs[0].day, 'v', vs[0].v,
            |      'l', vs[0].v, 'b', cast(0 as bigint)))),
            |  (acc, x) -> named_struct(
            |    'l', (x.v + acc.l + acc.b) div 2,
            |    'b', ((x.v + acc.l + acc.b) div 2 - acc.l + acc.b) div 2,
            |    'out', array_append(acc.out, named_struct(
            |      'day', x.day, 'v', x.v,
            |      'l', (x.v + acc.l + acc.b) div 2,
            |      'b', ((x.v + acc.l + acc.b) div 2 - acc.l + acc.b) div 2))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
      folded.select(col("r.day").as("d"), col("r.v").as("v_micro"),
          col("r.l").as("level_micro"), col("r.b").as("trend_micro"))
        .withColumn("forecast_micro",
          lag(col("level_micro") + col("trend_micro"), 1)
            .over(Window.orderBy("d")))
        .select(col("d").cast("string").as("day"),
          expr("v_micro div 1000000").as("v"),
          col("level_micro"), col("trend_micro"), col("forecast_micro"))
        .orderBy("day")
    }),

    // E8 WALD–WOLFOWITZ RUNS TEST — is the daily series random noise
    // around its median, or trending/oscillating? Days are signed
    // above/below the exact lower median (ties at the median dropped,
    // the classical convention), runs counted by one lag over the day
    // order, and the normal approximation reported as z² in integral
    // milli (μ and σ² are rational in n₀/n₁ — no float anywhere).
    // Everything after the first hash-agg is O(days): the median rank,
    // the sign sequence, and the one-row moment arithmetic.
    "q_runs_test" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("v"))
        .localCheckpoint() // median rank + sign sequence reuse it
      val nd = broadcast(daily.agg(count(lit(1)).as("nd")))
      val med = broadcast(daily
        .withColumn("rn", row_number().over(Window.orderBy(col("v"), col("day"))))
        .crossJoin(nd).filter(col("rn") === expr("(nd + 1) div 2"))
        .select(col("v").as("med")))
      val signed = daily.crossJoin(med).filter(col("v") =!= col("med"))
        .withColumn("s", (col("v") > col("med")).cast("long"))
      val lagS = lag(col("s"), 1).over(Window.orderBy("day"))
      signed
        .withColumn("chg",
          when(lagS.isNull || lagS =!= col("s"), 1L).otherwise(0L))
        .agg(count(lit(1)).as("m"),
          coalesce(sum("s"), lit(0L)).as("n1"),
          coalesce(sum("chg"), lit(0L)).as("runs"))
        .withColumn("n0", col("m") - col("n1"))
        .withColumn("mu_milli",
          expr("case when m = 0 then null else 1000 + 2000 * n1 * n0 div m end"))
        .withColumn("var_micro", expr(
          """case when m <= 1 then null
            |else 2 * n1 * n0 * (2 * n1 * n0 - m) * 1000000
            |     div (m * m * (m - 1)) end""".stripMargin))
        .withColumn("z2_milli", expr(
          """case when var_micro is null or var_micro <= 0 then null
            |else (1000 * runs - mu_milli) * (1000 * runs - mu_milli) * 1000
            |     div var_micro end""".stripMargin))
        .select(col("m").as("n_days"), col("n1").as("n_above"),
          col("n0").as("n_below"), col("runs"), col("mu_milli"),
          col("var_micro"), col("z2_milli"))
    }),

    // QINI / UPLIFT CURVE — the causal counterpart to q_auc_eval: rank
    // the population by a targeting score (pre-conversion activity, the
    // proxy an uplift model would emit), split into deciles, and report
    // the CUMULATIVE treated-vs-control conversion gap per decile —
    // uplift_ppm (rate gap) and the Qini increment ct − cc·Nt/Nc in
    // milli, whose terminal row is the overall incremental-conversions
    // estimate. The global score ranking uses the two-phase distributed
    // PrefixSum row number (never one task's sort); everything after is
    // a 10-row window. Treatment = the q_ab_ztest cohort hash.
    "q_qini" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      val gb = broadcast(users.agg(count(lit(1)).as("n_users"),
        min("score").as("glo"), max("score").as("ghi")))
      val ranked = graft.operators.PrefixSum.rowNumber(
        users.crossJoin(gb), Seq.empty,
        Seq(col("score"), col("user_id")),
        graft.operators.PrefixSum.rangeBucket(col("score"), col("glo"),
          col("ghi"), 32),
        "rk")
      val dec = ranked
        .withColumn("decile", expr("(n_users - rk) * 10 div n_users"))
        .groupBy("decile")
        .agg(sum(when(col("cohort") === 1, 1L).otherwise(0L)).as("nt"),
          sum(when(col("cohort") === 0, 1L).otherwise(0L)).as("nc"),
          sum(when(col("cohort") === 1, col("converted")).otherwise(0L))
            .as("ct"),
          sum(when(col("cohort") === 0, col("converted")).otherwise(0L))
            .as("cc"))
      val wd = Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dec.withColumn("nt_cum", sum("nt").over(wd))
        .withColumn("nc_cum", sum("nc").over(wd))
        .withColumn("ct_cum", sum("ct").over(wd))
        .withColumn("cc_cum", sum("cc").over(wd))
        .withColumn("uplift_ppm", expr(
          """case when nt_cum = 0 or nc_cum = 0 then null
            |else ct_cum * 1000000 div nt_cum - cc_cum * 1000000 div nc_cum
            |end""".stripMargin))
        .withColumn("qini_milli", expr(
          """case when nc_cum = 0 then null
            |else ct_cum * 1000 - cc_cum * 1000 * nt_cum div nc_cum
            |end""".stripMargin))
        .select("decile", "nt_cum", "nc_cum", "ct_cum", "cc_cum",
          "uplift_ppm", "qini_milli")
        .orderBy("decile")
    }),

    // ISOTONIC CALIBRATION (min-max formulation) — fit the monotone
    // step function that PAVA would produce over 20 equal-width score
    // bins, via the closed form iso(i) = max_{j≤i} min_{k≥i} of the
    // POOLED rate over bins [j,k] (weighted by bin mass — equivalent
    // to pool-adjacent-violators, but expressible as pure joins with
    // no sequential pooling stack, so the oracle is plain SQL). The
    // corpus collapses to ≤20 (bin, n, conv) rows in one hash-agg;
    // the O(bins³) interval grid that follows is a few thousand
    // broadcast-joined rows regardless of corpus size.
    "q_isotonic" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("score"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val gb = broadcast(users.agg(min("score").as("slo"),
        max("score").as("shi")))
      val bins = users.crossJoin(gb)
        .withColumn("bin", expr("(score - slo) * 20 div (shi - slo + 1)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n"), sum("y").as("conv"))
        .localCheckpoint() // feeds the interval grid 3×, all tiny
      val iv = bins.select(col("bin").as("j"))
        .join(bins.select(col("bin").as("k")), col("j") <= col("k"))
        .join(bins.select(col("bin").as("m"), col("n"), col("conv")),
          col("m") >= col("j") && col("m") <= col("k"))
        .groupBy("j", "k")
        .agg(expr("sum(conv) * 1000000 div sum(n)").as("rate_ppm"))
      val mn = iv.join(bins.select(col("bin").as("i")),
          col("j") <= col("i") && col("k") >= col("i"))
        .groupBy("j", "i").agg(min("rate_ppm").as("mn"))
      val iso = mn.groupBy("i").agg(max("mn").as("iso_ppm"))
      bins.join(iso, col("bin") === col("i"))
        .select(col("bin"), col("n"), col("conv"),
          expr("conv * 1000000 div n").as("raw_ppm"), col("iso_ppm"))
        .orderBy("bin")
    }),

    // SHAPLEY CHANNEL ATTRIBUTION — the game-theoretic upgrade to
    // q_multitouch_attribution's linear split: coalition value v(S) =
    // conversion rate among users exposed ONLY to channels in S
    // (subset cumulation over exposure bitmasks), and each channel's
    // Shapley value φ_c = Σ_S w(|S|)·(v(S∪c) − v(S)) with the exact
    // 4-player weights held as 24ths (6,2,2,6 — rational, no float).
    // The corpus collapses to ≤16 (mask, n, conv) rows in one
    // user-keyed hash-agg; the 16-coalition × 4-channel grid after it
    // is constant-size broadcast arithmetic at any corpus scale.
    "q_shapley_attribution" -> ((s, d) => {
      val users = events(s, d).groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("conv"),
          expr("""cast(
              max(case when event_type = 'click'  then 1 else 0 end)
            + 2 * max(case when event_type = 'error'  then 1 else 0 end)
            + 4 * max(case when event_type = 'signup' then 1 else 0 end)
            + 8 * max(case when event_type = 'view'   then 1 else 0 end)
            as bigint)""").as("mask"))
      val coal = users.groupBy("mask")
        .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      val vS = s.range(16).select(col("id").as("smask"))
        .join(broadcast(coal), expr("(mask | smask) = smask"), "left")
        .groupBy("smask")
        .agg(coalesce(sum("n"), lit(0L)).as("ns"),
          coalesce(sum("c"), lit(0L)).as("cs"))
        .withColumn("v_ppm",
          expr("case when ns = 0 then 0 else cs * 1000000 div ns end"))
        .select("smask", "v_ppm")
      val chans = s.createDataFrame(Seq(
          ("click", 1L), ("error", 2L), ("signup", 4L), ("view", 8L)))
        .toDF("channel", "bit")
      chans.join(broadcast(vS).withColumnRenamed("smask", "s0")
            .withColumnRenamed("v_ppm", "v0"),
          expr("(s0 & bit) = 0"))
        .join(broadcast(vS).withColumnRenamed("smask", "s1")
            .withColumnRenamed("v_ppm", "v1"),
          expr("s1 = (s0 | bit)"))
        .withColumn("sz", expr(
          """(s0 & 1) + (shiftright(s0, 1) & 1)
            |+ (shiftright(s0, 2) & 1) + (shiftright(s0, 3) & 1)""".stripMargin))
        .withColumn("w24", expr(
          "case sz when 0 then 6 when 1 then 2 when 2 then 2 else 6 end"))
        .groupBy("channel")
        .agg(sum(expr("w24 * (v1 - v0)")).as("phi24"))
        .withColumn("phi_ppm", expr("phi24 div 24"))
        .select("channel", "phi_ppm")
        .orderBy("channel")
    }),

    // BOT / AUTOMATION DETECTION — the traffic-hygiene gate run before
    // any engagement analytics: per user, event rate (events per
    // active day, milli) and inter-event gap REGULARITY (population
    // variance of gap seconds — machines are fast AND metronomic,
    // humans are slow and bursty). Flags are RELATIVE to the corpus
    // (above-mean rate AND below-mean gap variance — on production
    // traffic tighten the multipliers; the report shape is the
    // deliverable), so the rule ports across scale factors without
    // retuning. One
    // user-keyed window for the gaps (per-user sequences, the
    // sessionize shape), two hash-aggs, a broadcast 1-row corpus
    // profile — and a 2-row verdict rollup, never a per-user output.
    "q_bot_detect" -> ((s, d) => {
      val ep = floor(unix_timestamp(col("ts").cast("timestamp"))).cast("long")
      val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val gaps = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), ep.as("ep"))
        .withColumn("gap", col("ep") - lag(col("ep"), 1).over(wu))
      val users = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(to_date(col("ts"))).as("active_days"),
          count(col("gap")).as("n_gaps"),
          coalesce(sum("gap"), lit(0L)).as("sg"),
          coalesce(sum(expr("gap * gap")), lit(0L)).as("sgg"))
        .withColumn("rate_milli", expr("n_events * 1000 div active_days"))
        .withColumn("gap_var", expr(
          "case when n_gaps = 0 then null " +
            "else (n_gaps * sgg - sg * sg) div (n_gaps * n_gaps) end"))
      val prof = broadcast(users.agg(
        expr("sum(rate_milli) div count(1)").as("mean_rate_milli"),
        expr("sum(coalesce(gap_var, CAST(0 AS BIGINT))) div count(1)")
          .as("mean_gap_var")))
      users.crossJoin(prof)
        .withColumn("is_bot",
          when(col("rate_milli") > col("mean_rate_milli") &&
            col("gap_var").isNotNull &&
            col("gap_var") < col("mean_gap_var"), 1L).otherwise(0L))
        .groupBy("is_bot")
        .agg(count(lit(1)).as("n_users"),
          expr("sum(rate_milli) div count(1)").as("avg_rate_milli"),
          expr("sum(coalesce(gap_var, CAST(0 AS BIGINT))) div count(1)")
            .as("avg_gap_var"))
        .orderBy("is_bot")
    }),

    // SIMPSON'S PARADOX CHECK — does the activity→conversion
    // association FLIP SIGN when stratified by cohort? The aggregate
    // and the per-stratum 2×2 tables come out of ONE rollup (cohort →
    // null = 'all'): high = user activity ≥ the global mean, and each
    // stratum reports its high/low conversion rates and gap in ppm
    // with an explicit sign column, so the paradox is a 3-row visual
    // diff. Everything reduces to a user hash-agg + a broadcast 1-row
    // mean + a 3-group rollup — O(users) once, O(1) after.
    "q_simpson" -> ((s, d) => {
      // conv = ABOVE-MEAN purchase count, not any-purchase: nearly every
      // synthetic user purchases at least once, so the binary-outcome
      // form saturates at 1.0 and the detector reads nothing.
      val users = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("score"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .withColumn("cohort", pmod(col("user_id"), lit(2L)))
      // the mean probe is an independent two-level aggregate (its own
      // events scan) — a users.agg self-join would trip Spark's
      // ambiguous-self-join detection at the rollup below
      val m = broadcast(events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("s2"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("n2"))
        .agg(expr("sum(s2) div count(1)").as("mean_score"),
          expr("sum(n2) div count(1)").as("mean_np")))
      users.crossJoin(m)
        .withColumn("conv", when(col("np") > col("mean_np"), 1L).otherwise(0L))
        .withColumn("high",
          when(col("score") >= col("mean_score"), 1L).otherwise(0L))
        // rollup(col(...)), not rollup("cohort"): the String overload
        // resolves against the Dataset and tags the attribute with a
        // dataset id, which trips DetectAmbiguousSelfJoin above the
        // crossJoin of this table with its own aggregate
        .rollup(col("cohort"))
        .agg(sum(when(col("high") === 1, 1L).otherwise(0L)).as("n_high"),
          sum(when(col("high") === 0, 1L).otherwise(0L)).as("n_low"),
          sum(when(col("high") === 1, col("conv")).otherwise(0L))
            .as("conv_high"),
          sum(when(col("high") === 0, col("conv")).otherwise(0L))
            .as("conv_low"))
        .withColumn("stratum",
          when(col("cohort").isNull, "all")
            .otherwise(concat(lit("cohort_"), col("cohort").cast("string"))))
        .withColumn("rate_high_ppm", expr(
          "case when n_high = 0 then null " +
            "else conv_high * 1000000 div n_high end"))
        .withColumn("rate_low_ppm", expr(
          "case when n_low = 0 then null " +
            "else conv_low * 1000000 div n_low end"))
        .withColumn("gap_ppm", expr(
          "case when n_high = 0 or n_low = 0 then null " +
            "else conv_high * 1000000 div n_high " +
            "   - conv_low * 1000000 div n_low end"))
        .withColumn("sign", expr(
          "case when gap_ppm is null then null when gap_ppm > 0 then 1 " +
            "when gap_ppm < 0 then -1 else 0 end"))
        .select("stratum", "n_high", "n_low", "conv_high", "conv_low",
          "rate_high_ppm", "rate_low_ppm", "gap_ppm", "sign")
        .orderBy("stratum")
    }),

    // MEDIATION ANALYSIS (product-of-coefficients) — decompose the
    // cohort's total effect on conversion into the path THROUGH click
    // activity (indirect = a·b) and the remainder (direct = c − a·b):
    // a = T→M slope, b = M→Y slope CONTROLLING T (the partial
    // regression via the 2-var normal equations, the q_granger det
    // shape), c = the total T→Y slope. All moments are one user-keyed
    // hash-agg + one 1-row fold; the ratios follow the q_ab_ztest
    // float convention (identical operand order both engines,
    // ROUND 6). Zero-variance determinants return null, not NaN.
    "q_mediation" -> ((s, d) => {
      // y = purchase COUNT (the binary any-purchase outcome saturates
      // at 1 on the synthetic corpus and zeroes every slope)
      val users = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("m"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
        .withColumn("t", pmod(col("user_id"), lit(2L)))
      users.agg(count(lit(1)).as("n"),
          sum("t").as("st"), sum("m").as("sm"), sum("y").as("sy"),
          sum(expr("t * t")).as("stt"), sum(expr("m * m")).as("smm"),
          sum(expr("t * m")).as("stm"), sum(expr("t * y")).as("sty"),
          sum(expr("m * y")).as("smy"))
        .withColumn("ctt", expr("n * stt - st * st"))
        .withColumn("cmm", expr("n * smm - sm * sm"))
        .withColumn("ctm", expr("n * stm - st * sm"))
        .withColumn("cty", expr("n * sty - st * sy"))
        .withColumn("cmy", expr("n * smy - sm * sy"))
        .withColumn("a", expr(
          "case when ctt = 0 then null " +
            "else round(cast(ctm as double) / ctt, 6) end"))
        .withColumn("b", expr(
          """case when cast(ctt as double) * cmm - cast(ctm as double) * ctm = 0
            |  then null
            |  else round((cast(ctt as double) * cmy - cast(ctm as double) * cty)
            |    / (cast(ctt as double) * cmm - cast(ctm as double) * ctm), 6)
            |end""".stripMargin))
        .withColumn("c", expr(
          "case when ctt = 0 then null " +
            "else round(cast(cty as double) / ctt, 6) end"))
        .withColumn("indirect", expr(
          "case when a is null or b is null then null else round(a * b, 6) end"))
        .withColumn("direct", expr(
          "case when c is null or a is null or b is null then null " +
            "else round(c - a * b, 6) end"))
        .select("n", "a", "b", "c", "indirect", "direct")
    }),

    // GRADIENT-BOOSTED STUMPS (3 rounds, squared loss, lr = ½) — the
    // ensemble upgrade to q_decision_stump: predict per-user purchase
    // count from the 4 activity features, each round fitting the best
    // (feature, threshold) stump to the CURRENT residuals and adding
    // half its leaf means to the prediction. Everything is integral
    // milli: init = the global mean, leaf means are truncating divs,
    // lr = ½ is one more truncating div — both engines replay the
    // identical arithmetic, so round summaries sit in the oracle gate.
    // Split gain = Σ_l r·m̄_l + Σ_r r·m̄_r computed as (s div n)·s —
    // mean-first, so no s² overflow at any user count. Per round: one
    // 28-candidate spinner (4 features × 7 thresholds) collapsed
    // map-side into 28 groups, a 1-row deterministic argmax
    // ((gain desc, f, t) total order), and a broadcast update joined
    // back — O(users) work per round, 3 rounds, lineage cut by one
    // checkpoint per round (the PCA-iterate precedent).
    "q_gbm_stumps" -> ((s, d) => {
      val base = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("f0"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("f1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("f2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .as("f3"),
          (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            * 1000L).as("y_milli"))
        .localCheckpoint()
      val m0 = broadcast(base.agg(
        expr("sum(y_milli) div count(1)").as("p0")))
      var users = base.crossJoin(m0)
        .withColumn("pred", col("p0"))
        .withColumn("r", col("y_milli") - col("pred"))
        .select("user_id", "f0", "f1", "f2", "f3", "y_milli", "pred", "r")
      val comboLits = (for { f <- 0 until 4; t <- Seq(1, 2, 3, 5, 8, 13, 21) }
        yield s"struct(${f}L as f, ${t}L as t)").mkString(",")
      val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      for (k <- 1 to 3) {
        val cand = users
          .select(expr(s"explode(array($comboLits))").as("p"),
            col("f0"), col("f1"), col("f2"), col("f3"), col("r"))
          .withColumn("v", expr(
            "case p.f when 0 then f0 when 1 then f1 when 2 then f2 " +
              "else f3 end"))
          .withColumn("in_l", (col("v") <= col("p.t")).cast("long"))
          .groupBy(col("p.f").as("f"), col("p.t").as("t"))
          .agg(count(lit(1)).as("n"), sum("in_l").as("nl"),
            sum(expr("in_l * r")).as("sl"), sum("r").as("stot"))
          .withColumn("nr", col("n") - col("nl"))
          .withColumn("sr", col("stot") - col("sl"))
          .withColumn("ml", expr("case when nl = 0 then 0 else sl div nl end"))
          .withColumn("mr", expr("case when nr = 0 then 0 else sr div nr end"))
          .withColumn("gain", expr("ml * sl + mr * sr"))
        val best = broadcast(cand
          .agg(min(struct((-col("gain")).as("ng"), col("f").as("f"),
            col("t").as("t"), col("nl").as("nl"), col("nr").as("nr"),
            col("ml").as("ml"), col("mr").as("mr"))).as("b"))
          .select(col("b.f").as("bf"), col("b.t").as("bt"),
            col("b.nl").as("bnl"), col("b.nr").as("bnr"),
            col("b.ml").as("bml"), col("b.mr").as("bmr"),
            (-col("b.ng")).as("bgain")))
        rounds += best.withColumn("round", lit(k.toLong))
        users = users.crossJoin(best)
          .withColumn("v", expr(
            "case bf when 0 then f0 when 1 then f1 when 2 then f2 " +
              "else f3 end"))
          .withColumn("pred", expr(
            "pred + (case when v <= bt then bml else bmr end) div 2"))
          .withColumn("r", col("y_milli") - col("pred"))
          .select("user_id", "f0", "f1", "f2", "f3", "y_milli", "pred", "r")
          .localCheckpoint()
      }
      rounds.reduce(_ unionByName _)
        .select(col("round"), col("bf").as("feature"),
          col("bt").as("threshold"), col("bnl").as("n_left"),
          col("bnr").as("n_right"), col("bml").as("mean_left_milli"),
          col("bmr").as("mean_right_milli"), col("bgain").as("gain"))
        .orderBy("round")
    }),

    // E8 PAGE–HINKLEY DRIFT DETECTOR — the sequential upward-drift
    // test that complements q_cusum (two-sided peak) and
    // q_changepoint (retrospective split): PH_t = cum_t − min_{i≤t}
    // cum_i over the mean-centered daily series, alarm when the
    // excursion exceeds λ = one mean day of volume. Recursion-free —
    // a cumulative sum plus a RUNNING MIN are both one O(days)
    // window over the calendar-bounded daily aggregate, so the
    // sequential test distributes trivially.
    "q_page_hinkley" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("v"))
      val m = broadcast(daily.agg(expr("sum(v) div count(1)").as("m")))
      val wd = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.crossJoin(m)
        .withColumn("cum", sum(col("v") - col("m")).over(wd))
        .withColumn("ph", col("cum") - min(col("cum")).over(wd))
        .withColumn("alarm", (col("ph") > col("m")).cast("long"))
        .select(col("day").cast("string").as("day"), col("v"), col("cum"),
          col("ph"), col("alarm"))
        .orderBy("day")
    }),

    // COEC POSITION-BIAS CORRECTION — clicks-over-expected-clicks, the
    // standard de-biasing for ranked impressions: a campaign shown
    // mostly at position 0 earns raw CTR it does not deserve. Views
    // carry a deterministic display position (props k mod 4) and
    // campaign (k mod 8); the 4-row global position-CTR curve is the
    // expectation model, and each campaign's expected clicks =
    // Σ_pos views·ctr_pos. COEC > 1000 milli = better than its
    // positions predict. Two event scans collapse to a campaign×
    // position grid (≤32 rows); the curve broadcasts — shape-invariant
    // at any event volume.
    "q_coec" -> ((s, d) => {
      def tagged(t: String) = events(s, d)
        .filter(col("event_type") === t)
        .select(pmod(get_json_object(col("props"), "$.k").cast("long"),
            lit(4L)).as("pos"),
          pmod(get_json_object(col("props"), "$.k").cast("long"), lit(8L))
            .as("campaign"))
      val views = tagged("view").groupBy("campaign", "pos")
        .agg(count(lit(1)).as("nv"))
      val clicks = tagged("click").groupBy("campaign", "pos")
        .agg(count(lit(1)).as("nc"))
      val grid = views.join(clicks, Seq("campaign", "pos"), "left")
        .withColumn("nc", coalesce(col("nc"), lit(0L)))
      val curve = broadcast(grid.groupBy("pos")
        .agg(expr("sum(nc) * 1000000 div sum(nv)").as("ctr_pos_ppm")))
      grid.join(curve, "pos")
        .groupBy("campaign")
        .agg(sum("nv").as("n_views"), sum("nc").as("n_clicks"),
          sum(expr("nv * ctr_pos_ppm")).as("expected_micro"))
        .withColumn("ctr_ppm", expr("n_clicks * 1000000 div n_views"))
        .withColumn("expected_clicks_milli", expr("expected_micro div 1000"))
        .withColumn("coec_milli", expr(
          "case when expected_micro = 0 then null " +
            "else n_clicks * 1000000000 div expected_micro end"))
        .select("campaign", "n_views", "n_clicks", "ctr_ppm",
          "expected_clicks_milli", "coec_milli")
        .orderBy("campaign")
    }),

    // ABSORBING-CHAIN TIME-TO-CONVERSION — the fundamental-matrix
    // readout q_markov_stationary's long-run view cannot give: with
    // 'purchase' absorbing, per start state report the probability of
    // converting within 8 steps and the (truncated) expected journey
    // length E[T] = Σ_k P(T > k), via 8 unrolled survival-vector
    // multiplications s_{k+1} = Q·s_k in integral ppm (the
    // p1/p2_ppm convention). The transition table is O(types²) and
    // checkpointed once; each multiplication is a ≤types²-row join —
    // constant work after the one corpus-sized window.
    "q_absorbing_chain" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val trans = events(s, d)
        .withColumn("dst", lead(col("event_type"), 1).over(byUser))
        .filter(col("dst").isNotNull)
        .filter(col("event_type") =!= "purchase")
        .groupBy(col("event_type").as("src"), col("dst"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy("src")))
        .withColumn("p_ppm", expr("n * 1000000 div tot"))
        .localCheckpoint() // O(types²); feeds all 8 iteration joins
      val q = trans.filter(col("dst") =!= "purchase")
        .select("src", "dst", "p_ppm")
      // all non-absorbing sources — from trans, not q: a state whose
      // every transition absorbs must still report (t = 1 step)
      val states = trans.select(col("src").as("state")).distinct()
      val direct = trans.filter(col("dst") === "purchase")
        .select(col("src").as("state"), col("p_ppm").as("p_direct_ppm"))
      var sv = states.withColumn("s", lit(1000000L))
      var acc = states.withColumn("t_micro", lit(1000000L)) // s_0 term
      for (k <- 1 to 8) {
        sv = q.join(sv.select(col("state").as("dst"), col("s")), "dst")
          .groupBy(col("src").as("state"))
          .agg(expr("sum(p_ppm * s) div 1000000").as("s"))
        if (k < 8)
          acc = acc.join(sv.select(col("state"), col("s").as("sk")),
              Seq("state"), "left")
            .withColumn("t_micro",
              col("t_micro") + coalesce(col("sk"), lit(0L)))
            .select("state", "t_micro")
      }
      acc.join(sv.select(col("state"), col("s").as("s8")), Seq("state"), "left")
        .join(direct, Seq("state"), "left")
        .select(col("state"),
          coalesce(col("p_direct_ppm"), lit(0L)).as("p_direct_ppm"),
          (lit(1000000L) - coalesce(col("s8"), lit(0L))).as("absorb8_ppm"),
          col("t_micro").as("t_micro_trunc"))
        .orderBy("state")
    }),

    // mRMR FEATURE SELECTION (3 greedy rounds) — pick the activity
    // features that are maximally informative about conversion while
    // minimally redundant with each other: relevance = MI(feature
    // bins; above-mean-purchase label), redundancy = pairwise MI
    // between feature bins, greedy argmax of relevance − mean
    // redundancy to the already-selected set (the classic Peng/Ding
    // criterion). MI follows the q_mutual_info float convention
    // (identical operand order, ROUND 6); argmaxes are 1-row
    // deterministic struct-mins ((score desc, feature) order). The
    // corpus collapses to one user hash-agg; every MI table after it
    // is a ≤(4·4·2 ∪ 6·16)-cell grid — constant-size arithmetic at
    // any event volume.
    "q_mrmr" -> ((s, d) => {
      val meanNp = broadcast(events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("np2"))
        .agg(expr("sum(np2) div count(1)").as("mnp")))
      val users = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("f0"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("f1"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("f2"),
          sum(when(col("event_type") === "signup", 1L).otherwise(0L))
            .as("f3"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("np"))
        .crossJoin(meanNp)
        .withColumn("y", (col("np") > col("mnp")).cast("long"))
        .selectExpr("y", "least(f0 div 8, 3) as b0", "least(f1 div 8, 3) as b1",
          "least(f2 div 8, 3) as b2", "least(f3 div 8, 3) as b3")
        .localCheckpoint() // feeds the relevance AND redundancy grids
      val nRow = broadcast(users.select(lit(1L).as("one"))
        .agg(count(lit(1)).as("n")))
      // relevance: MI(bin_f; y) per feature over the 4×4×2 cell grid
      val longF = users.selectExpr("y",
        "stack(4, 0L, b0, 1L, b1, 2L, b2, 3L, b3) as (f, b)")
      val cells = longF.groupBy("f", "b", "y").agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤32 rows; feeds 2 marginals + the term sum
      val margB = cells.groupBy("f", "b").agg(sum("c").as("cb"))
      val margY = cells.groupBy("f", "y").agg(sum("c").as("cy"))
      val rel = cells.join(margB, Seq("f", "b")).join(margY, Seq("f", "y"))
        .crossJoin(nRow)
        .withColumn("term",
          (col("c").cast("double") / col("n")) *
            log(col("c").cast("double") * col("n") /
              (col("cb").cast("double") * col("cy"))))
        .groupBy("f").agg(round(sum("term"), 6).as("rel"))
        .localCheckpoint() // 4 rows; reused by all three rounds
      // redundancy: MI(bin_i; bin_j) per unordered pair, symmetrized
      val pairLits = (for { i <- 0 until 4; j <- 0 until 4 if i < j }
        yield s"struct(${i}L as i, ${j}L as j)").mkString(",")
      val longP = users
        .select(expr(s"explode(array($pairLits))").as("p"),
          col("b0"), col("b1"), col("b2"), col("b3"))
        .select(col("p.i").as("i"), col("p.j").as("j"),
          expr("case p.i when 0 then b0 when 1 then b1 when 2 then b2 " +
            "else b3 end").as("bi"),
          expr("case p.j when 0 then b0 when 1 then b1 when 2 then b2 " +
            "else b3 end").as("bj"))
      val pc = longP.groupBy("i", "j", "bi", "bj").agg(count(lit(1)).as("c"))
        .localCheckpoint() // ≤96 rows
      val mi = pc.groupBy("i", "j", "bi").agg(sum("c").as("ci"))
      val mj = pc.groupBy("i", "j", "bj").agg(sum("c").as("cj"))
      val redPair = pc.join(mi, Seq("i", "j", "bi"))
        .join(mj, Seq("i", "j", "bj")).crossJoin(nRow)
        .withColumn("term",
          (col("c").cast("double") / col("n")) *
            log(col("c").cast("double") * col("n") /
              (col("ci").cast("double") * col("cj"))))
        .groupBy("i", "j").agg(round(sum("term"), 6).as("red"))
      val red = redPair.select(col("i").as("fa"), col("j").as("fb"),
          col("red"))
        .unionByName(redPair.select(col("j").as("fa"), col("i").as("fb"),
          col("red")))
        .localCheckpoint() // 12 rows; joined by rounds 2 and 3
      val b1 = broadcast(rel
        .agg(min(struct((-col("rel")).as("ns"), col("f").as("f"),
          col("rel").as("rel"))).as("x"))
        .select(col("x.f").as("s1"), col("x.rel").as("rel1")))
      val r2 = rel.crossJoin(b1).filter(col("f") =!= col("s1"))
        .join(red, col("fa") === col("f") && col("fb") === col("s1"))
        .withColumn("score", round(col("rel") - col("red"), 6))
      val b2 = broadcast(r2
        .agg(min(struct((-col("score")).as("ns"), col("f").as("f"),
          col("rel").as("rel"), col("red").as("red"),
          col("score").as("score"))).as("x"))
        .select(col("x.f").as("s2"), col("x.rel").as("rel2"),
          col("x.red").as("red2"), col("x.score").as("score2")))
      val redA = red.select(col("fa").as("fA1"), col("fb").as("t1"),
        col("red").as("redb1"))
      val redB = red.select(col("fa").as("fA2"), col("fb").as("t2"),
        col("red").as("redb2"))
      val r3 = rel.crossJoin(b1).crossJoin(b2)
        .filter(col("f") =!= col("s1") && col("f") =!= col("s2"))
        .join(redA, col("f") === col("fA1") && col("t1") === col("s1"))
        .join(redB, col("f") === col("fA2") && col("t2") === col("s2"))
        .withColumn("redm", round((col("redb1") + col("redb2")) / 2, 6))
        .withColumn("score", round(col("rel") - col("redm"), 6))
      val b3 = broadcast(r3
        .agg(min(struct((-col("score")).as("ns"), col("f").as("f"),
          col("rel").as("rel"), col("redm").as("redm"),
          col("score").as("score"))).as("x"))
        .select(col("x.f").as("s3"), col("x.rel").as("rel3"),
          col("x.redm").as("red3"), col("x.score").as("score3")))
      b1.crossJoin(b2).crossJoin(b3).selectExpr(
        """stack(3,
          1L, s1, rel1, cast(0.0 as double), rel1,
          2L, s2, rel2, red2, score2,
          3L, s3, rel3, red3, score3)
          as (rank, feature, rel_nats, red_nats, score_nats)""")
        .orderBy("rank")
    }),

    // E8 HOLT–WINTERS (additive, period 7) — the seasonal upgrade to
    // q_holt: level, trend AND a 7-slot weekly seasonal vector update
    // jointly (α=β=γ=½ as truncating halvings, exact integral micro),
    // initialized from the first week (l₀ = week-1 mean, s₀ = week-1
    // deviations). The one-step forecast l+b+s[next] is what a weekly-
    // seasonal series needs where q_holt's flat trend aliases the
    // cycle. Same scale shape as q_holt: the corpus collapses to the
    // calendar-bounded daily series, one `aggregate()` fold carries
    // the (l, b, seas[7]) state — the oracle carries the identical
    // state through a recursive CTE with a LIST column.
    "q_holt_winters" -> ((s, d) => {
      val daily = events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg((count(lit(1)) * 1000000L).as("v"))
      val folded = daily
        .agg(sort_array(collect_list(struct(col("day"), col("v")))).as("vs"))
        .filter(size(col("vs")) >= 8)
        .withColumn("l0", expr(
          "aggregate(slice(vs, 1, 7), cast(0 as bigint), (a, x) -> a + x.v) div 7"))
        .withColumn("seas0", expr("transform(slice(vs, 1, 7), x -> x.v - l0)"))
        .select(explode(expr(
          """aggregate(
            |  slice(vs, 8, greatest(size(vs) - 7, 0)),
            |  named_struct('l', l0, 'b', cast(0 as bigint), 'seas', seas0,
            |    'out', cast(array() as array<struct<day:date, v:bigint,
            |      l:bigint, b:bigint, su:bigint, f:bigint>>)),
            |  (acc, x) -> named_struct(
            |    'l', (x.v - element_at(acc.seas, 1) + acc.l + acc.b) div 2,
            |    'b', (((x.v - element_at(acc.seas, 1) + acc.l + acc.b) div 2)
            |      - acc.l + acc.b) div 2,
            |    'seas', concat(slice(acc.seas, 2, 6), array(
            |      (x.v - ((x.v - element_at(acc.seas, 1) + acc.l + acc.b)
            |        div 2) + element_at(acc.seas, 1)) div 2)),
            |    'out', array_append(acc.out, named_struct(
            |      'day', x.day, 'v', x.v,
            |      'l', (x.v - element_at(acc.seas, 1) + acc.l + acc.b) div 2,
            |      'b', (((x.v - element_at(acc.seas, 1) + acc.l + acc.b)
            |        div 2) - acc.l + acc.b) div 2,
            |      'su', element_at(acc.seas, 1),
            |      'f', acc.l + acc.b + element_at(acc.seas, 1)))),
            |  acc -> acc.out)""".stripMargin)).as("r"))
      folded.select(col("r.day").cast("string").as("day"),
          expr("r.v div 1000000").as("v"),
          col("r.l").as("level_micro"), col("r.b").as("trend_micro"),
          col("r.su").as("season_micro"), col("r.f").as("forecast_micro"))
        .orderBy("day")
    }),

    // IPS OFF-POLICY EVALUATION — score a NEW serving policy from
    // logged bandit feedback without deploying it: impressions are
    // view/click events on campaign k%8 (click = reward 1), the
    // logging propensity is each campaign's empirical traffic share,
    // the target policy is rank-weighted toward historically better
    // campaigns (w = (9−rank)/36 — deterministic, no softmax float),
    // and each campaign's IPS term is clicks·w·1e6/(36·share) in exact
    // integral ppm. Σ ips_term_ppm = the estimated reward rate under
    // the new policy. Everything collapses to an 8-row campaign table
    // in one hash-agg; the ranking is an 8-row window.
    "q_ips_eval" -> ((s, d) => {
      val impr = events(s, d)
        .filter(col("event_type").isin("view", "click"))
        .select(pmod(get_json_object(col("props"), "$.k").cast("long"),
            lit(8L)).as("campaign"),
          (col("event_type") === "click").cast("long").as("r"))
      val camp = impr.groupBy("campaign")
        .agg(count(lit(1)).as("n_impr"), sum("r").as("clicks"))
        .withColumn("rate_ppm", expr("clicks * 1000000 div n_impr"))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("rate_ppm").desc, col("campaign").asc))
          .cast("long"))
        .withColumn("w36", lit(9L) - col("rank"))
      val tot = broadcast(camp.agg(sum("n_impr").as("n")))
      camp.crossJoin(tot)
        .withColumn("p_log_ppm", expr("n_impr * 1000000 div n"))
        // the traffic share cancels: (1/n)·Σ r·π/p with p = n_impr/n
        // reduces to clicks·w/(36·n_impr) — no n in the product, so no
        // overflow at any impression volume
        .withColumn("ips_term_ppm", expr(
          "clicks * w36 * 1000000 div (36 * n_impr)"))
        .select("campaign", "n_impr", "clicks", "rate_ppm", "rank", "w36",
          "p_log_ppm", "ips_term_ppm")
        .orderBy("campaign")
    }),

    // MAHALANOBIS OUTLIERS — the bivariate upgrade to q_outlier_mad:
    // users scored by the exact covariance-aware distance over
    // (activity, purchases), so a user who is unremarkable on each
    // axis but OFF THE CORRELATION LINE surfaces. 2×2 inverse via the
    // adjugate — d² ∝ c_yy·dx² − 2·c_xy·dx·dy + c_xx·dy², all held in
    // integral milli (deviations vs the floored milli mean, covariance
    // in milli² — products bounded by the feature range⁴, not the
    // corpus). The covariance is TWO-PASS centered (round-8 ADVICE):
    // the one-pass n·sxx − sx² form is quadratic in corpus size and
    // silently wraps on Spark past ~10–100× the tested corpus while
    // DuckDB raises; Σdx² over milli deviations is linear in users
    // (the floored-milli mean costs ≤ 1 milli² of bias — the mean is
    // exact to 10⁻³ raw). Two user hash-aggs + a broadcast 1-row
    // moment table + TakeOrdered(20) — never a global sort.
    "q_mahalanobis" -> ((s, d) => {
      def userAgg = events(s, d).groupBy("user_id")
        .agg(sum(when(col("event_type") =!= "purchase", 1L).otherwise(0L))
            .as("x"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("y"))
      val means = broadcast(userAgg
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
        .withColumn("mx_milli", expr("sx * 1000 div n"))
        .withColumn("my_milli", expr("sy * 1000 div n"))
        .select("n", "mx_milli", "my_milli"))
      val stats = broadcast(userAgg.crossJoin(means)
        .select(col("n"), col("mx_milli"), col("my_milli"),
          (col("x") * 1000 - col("mx_milli")).as("cdx"),
          (col("y") * 1000 - col("my_milli")).as("cdy"))
        .groupBy("n", "mx_milli", "my_milli")
        .agg(sum(expr("cdx * cdx")).as("sdxx"),
          sum(expr("cdy * cdy")).as("sdyy"),
          sum(expr("cdx * cdy")).as("sdxy"))
        .withColumn("cxx", expr("sdxx div n"))
        .withColumn("cyy", expr("sdyy div n"))
        .withColumn("cxy", expr("sdxy div n"))
        .withColumn("det", expr("cxx * cyy - cxy * cxy"))
        .select("mx_milli", "my_milli", "cxx", "cyy", "cxy", "det"))
      userAgg.crossJoin(stats)
        .withColumn("dx", col("x") * 1000 - col("mx_milli"))
        .withColumn("dy", col("y") * 1000 - col("my_milli"))
        .withColumn("d2_milli", expr(
          """case when det <= 0 then null
            |else (cyy * dx * dx - 2 * cxy * dx * dy + cxx * dy * dy)
            |     div greatest(det div 1000, 1) end""".stripMargin))
        .select("user_id", "x", "y", "dx", "dy", "d2_milli")
        .orderBy(col("d2_milli").desc_nulls_last, col("user_id").asc)
        .limit(20)
    }))

  val oracle: Map[String, String] = Map(
    "q_session_path" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
        |    lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w AS prev_epoch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_epoch IS NULL OR ep - prev_epoch >= 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, session_id
        |    ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM sess),
        |paths AS (
        |  SELECT user_id, session_id,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM ranked WHERE rn <= 3 GROUP BY 1, 2)
        |SELECT path, count(*) AS n_sessions FROM paths
        |GROUP BY 1 ORDER BY n_sessions DESC, path""".stripMargin,

    "q_event_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS dst
        |  FROM events),
        |t AS (SELECT src, dst, count(*) AS n FROM seq
        |      WHERE dst IS NOT NULL GROUP BY 1, 2)
        |SELECT src, dst, n,
        |  CAST(n * 1000000 // SUM(n) OVER (PARTITION BY src) AS BIGINT) AS share_ppm
        |FROM t ORDER BY src, dst""".stripMargin,

    "q_event_trigrams" ->
      """WITH seq AS (
        |  SELECT event_type AS e1,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |tg AS (
        |  SELECT e1 || '>' || e2 || '>' || e3 AS trigram FROM seq
        |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL)
        |SELECT trigram, COUNT(*) AS n FROM tg GROUP BY trigram
        |ORDER BY n DESC, trigram ASC LIMIT 20""".stripMargin,

    "q_event_gap_hist" ->
      """WITH g AS (
        |  SELECT CAST(epoch_us(ts) AS BIGINT) AS t1,
        |    lead(CAST(epoch_us(ts) AS BIGINT), 1) OVER (
        |      PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS t2
        |  FROM events),
        |gaps AS (SELECT t2 - t1 AS gap_us FROM g WHERE t2 IS NOT NULL),
        |hist AS (
        |  SELECT CAST(CASE WHEN gap_us <= 10000000 THEN 10
        |    WHEN gap_us <= 60000000 THEN 60
        |    WHEN gap_us <= 600000000 THEN 600
        |    WHEN gap_us <= 1800000000 THEN 1800
        |    WHEN gap_us <= 3600000000 THEN 3600
        |    WHEN gap_us <= 86400000000 THEN 86400
        |    ELSE 999999999 END AS BIGINT) AS bucket_s,
        |    COUNT(*) AS n_gaps
        |  FROM gaps GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_gaps) AS BIGINT) AS n_total FROM hist)
        |SELECT h.bucket_s, h.n_gaps,
        |  h.n_gaps * 1000000 // t.n_total AS share_ppm
        |FROM hist h, t ORDER BY h.bucket_s""".stripMargin,

    "q_json_extract" ->
      """SELECT event_id, event_type,
        |  TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin,

    "q_event_window" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS total_value
        |FROM events GROUP BY 1, event_type
        |ORDER BY hour, event_type""".stripMargin,

    "q_seasonal_decompose" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
        |    CAST(ROUND(value * 1000000) AS BIGINT) AS v
        |  FROM events),
        |base AS (
        |  SELECT event_type, hr, COUNT(*) AS n,
        |    CAST(SUM(v) AS BIGINT) // COUNT(*) AS baseline_micro
        |  FROM ev GROUP BY 1, 2)
        |SELECT e.event_type, e.hr, b.n, b.baseline_micro,
        |  CAST(MAX(ABS(e.v - b.baseline_micro)) AS BIGINT) AS max_resid_micro,
        |  CAST(SUM(ABS(e.v - b.baseline_micro)) // COUNT(*) AS BIGINT) AS mad_micro
        |FROM ev e JOIN base b ON e.event_type = b.event_type AND e.hr = b.hr
        |GROUP BY 1, 2, 3, 4
        |ORDER BY e.event_type, e.hr""".stripMargin,

    "q_json_profile" ->
      """WITH ev AS (
        |  SELECT '{"k": ' || json_extract_string(props, '$.k')
        |    || ', "ev": "' || event_type || '"'
        |    || CASE WHEN value > 50
        |         THEN ', "v": ' || CAST(CAST(ROUND(value * 100) AS BIGINT) AS VARCHAR)
        |         ELSE '' END
        |    || '}' AS js
        |  FROM events),
        |tot AS (SELECT COUNT(*) AS n_events FROM ev),
        |keys AS (SELECT unnest(json_keys(js)) AS json_key FROM ev)
        |SELECT json_key, COUNT(*) AS n_present,
        |  COUNT(*) * 1000000 // (SELECT n_events FROM tot) AS presence_ppm
        |FROM keys GROUP BY json_key
        |ORDER BY json_key""".stripMargin,

    "q_engagement_gini" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n, user_id) AS rk FROM u)
        |SELECT COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS total,
        |  (2 * CAST(SUM(rk * n) AS BIGINT) - (COUNT(*) + 1) * CAST(SUM(n) AS BIGINT))
        |    * 1000000 // (COUNT(*) * CAST(SUM(n) AS BIGINT)) AS gini_ppm
        |FROM r""".stripMargin,

    "q_temporal_split" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |days AS (SELECT day, COUNT(*) AS n FROM ev GROUP BY 1),
        |cum AS (
        |  SELECT day, SUM(n) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM days),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM days),
        |cut AS (SELECT MIN(day) AS cut_day FROM cum, tot WHERE cum * 100 >= tot * 80),
        |tagged AS (
        |  SELECT user_id, day,
        |    CASE WHEN day < (SELECT cut_day FROM cut) THEN 'train' ELSE 'test' END AS split
        |  FROM ev),
        |leak AS (
        |  SELECT COUNT(*) AS leak_users FROM (
        |    SELECT DISTINCT user_id FROM tagged WHERE split = 'train'
        |    INTERSECT
        |    SELECT DISTINCT user_id FROM tagged WHERE split = 'test'))
        |SELECT split, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(MIN(day) AS VARCHAR) AS from_day, CAST(MAX(day) AS VARCHAR) AS to_day,
        |  (SELECT leak_users FROM leak) AS leak_users
        |FROM tagged GROUP BY split ORDER BY split""".stripMargin,

    "q_decayed_counts" ->
      """WITH base AS (
        |  SELECT user_id,
        |    1048576 >> LEAST(
        |      date_diff('day', CAST(ts AS DATE),
        |        (SELECT MAX(CAST(ts AS DATE)) FROM events)) // 7, 20) AS w_u
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(w_u) AS BIGINT) AS decayed_u
        |FROM base GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q_hopping_window" ->
      """WITH ev AS (
        |  SELECT date_trunc('hour', ts) - k.k * INTERVAL 1 HOUR AS ws,
        |    event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c
        |  FROM events, (SELECT unnest([0, 1]) AS k) k)
        |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
        |  COUNT(*) AS n, CAST(SUM(v_c) AS DOUBLE) / 100 AS total_value
        |FROM ev GROUP BY ws, event_type
        |ORDER BY w_start, event_type""".stripMargin,

    "q_regr_trend" ->
      """WITH daily AS (
        |  SELECT event_type,
        |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    COUNT(*) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(day) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(day * y) AS BIGINT) AS sxy,
        |    CAST(SUM(day * day) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6) AS slope,
        |  ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE) / (n * sxx - sx * sx), 6) AS intercept
        |FROM m ORDER BY event_type""".stripMargin,

    "q_user_sequences" ->
      """WITH seqs AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    list(event_type ORDER BY ts, event_id) AS evs
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  array_to_string(list_slice(evs, GREATEST(1, len(evs) - 7), len(evs)), '>') AS seq
        |FROM seqs ORDER BY user_id""".stripMargin,

    "q_event_funnel" ->
      """WITH ta AS (
        |  SELECT user_id, MIN(ts) AS t_view FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |tb AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_click
        |  FROM events e JOIN ta ON e.user_id = ta.user_id
        |  WHERE e.event_type = 'click' AND e.ts > ta.t_view
        |  GROUP BY e.user_id),
        |tc AS (
        |  SELECT e.user_id, MIN(e.ts) AS t_purchase
        |  FROM events e JOIN tb ON e.user_id = tb.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > tb.t_click
        |  GROUP BY e.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM ta
        |UNION ALL SELECT '2_click', COUNT(*) FROM tb
        |UNION ALL SELECT '3_purchase', COUNT(*) FROM tc
        |ORDER BY stage""".stripMargin,

    "q_cohort_retention" ->
      """WITH fs AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
        |  FROM events GROUP BY user_id),
        |act AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
        |SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
        |  date_diff('day', cohort_w, w) // 7 AS week_offset,
        |  COUNT(DISTINCT act.user_id) AS n_active
        |FROM act JOIN fs ON act.user_id = fs.user_id
        |GROUP BY 1, 2 ORDER BY cohort_week, week_offset""".stripMargin,

    "q_window_anomaly" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (
        |  SELECT event_type, hr, n,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT) AS trail_n,
        |    COUNT(n) OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS trail_cnt
        |  FROM hourly)
        |SELECT event_type, strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
        |  n, trail_n, trail_cnt,
        |  n * trail_cnt * 1000000 // trail_n AS ratio_micro
        |FROM t
        |WHERE trail_cnt >= 12 AND n * trail_cnt * 2 > trail_n * 3
        |ORDER BY event_type, hour""".stripMargin,

    "q_gap_fill" ->
      """WITH spine AS (
        |  SELECT strftime(TIMESTAMP '2024-01-01 00:00:00' + g.i * INTERVAL 1 HOUR,
        |                  '%Y-%m-%d %H:%M:%S') AS hour
        |  FROM generate_series(0, 743) g(i)),
        |types AS (SELECT DISTINCT event_type FROM events),
        |grid AS (SELECT hour, event_type FROM spine CROSS JOIN types),
        |observed AS (
        |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
        |         event_type, COUNT(*) AS n_obs
        |  FROM events GROUP BY 1, 2)
        |SELECT g.hour, g.event_type, COALESCE(o.n_obs, 0) AS n
        |FROM grid g LEFT JOIN observed o ON g.hour = o.hour AND g.event_type = o.event_type
        |ORDER BY g.hour, g.event_type""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
        |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
        |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
        |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_asof_join" ->
      """WITH ce AS (
        |  SELECT event_id, user_id, ts, event_type,
        |    last(CASE WHEN event_type = 'click' THEN struct_pack(cts := ts, cid := event_id) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ev
        |  FROM events WHERE event_type IN ('click', 'purchase'))
        |SELECT event_id AS purchase_id, user_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  click_ev.cid AS click_id,
        |  strftime(click_ev.cts, '%Y-%m-%d %H:%M:%S') AS click_ts,
        |  CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(click_ev.cts)) AS BIGINT) AS gap_seconds
        |FROM ce
        |WHERE event_type = 'purchase' AND click_ev IS NOT NULL
        |ORDER BY purchase_id""".stripMargin,

    "q_multitouch_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id AS cuser, ts AS cts,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 8 AS campaign
        |  FROM events WHERE event_type = 'click'),
        |t AS (
        |  SELECT p.purchase_id, c.campaign
        |  FROM p JOIN c ON c.cuser = p.user_id
        |  WHERE c.cts < p.pts
        |    AND CAST(FLOOR(epoch(p.pts)) AS BIGINT) -
        |        CAST(FLOOR(epoch(c.cts)) AS BIGINT) <= 7 * 86400),
        |n AS (SELECT purchase_id, COUNT(*) AS n_touch FROM t GROUP BY purchase_id)
        |SELECT t.campaign,
        |  CAST(SUM(1000000 // n.n_touch) AS BIGINT) AS credit_ppm,
        |  COUNT(*) AS n_touches
        |FROM t JOIN n USING (purchase_id)
        |GROUP BY t.campaign ORDER BY t.campaign""".stripMargin,

    "q_churn_label" ->
      """WITH mx AS (SELECT MAX(ts) AS tmax FROM events),
        |u AS (
        |  SELECT user_id, COUNT(*) AS n_events,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_purchases,
        |    MAX(ts) AS last_ts
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events, n_purchases,
        |  CAST(FLOOR(epoch((SELECT tmax FROM mx))) AS BIGINT) -
        |    CAST(FLOOR(epoch(last_ts)) AS BIGINT) AS recency_s,
        |  (CAST(FLOOR(epoch((SELECT tmax FROM mx))) AS BIGINT) -
        |    CAST(FLOOR(epoch(last_ts)) AS BIGINT)) > 7 * 86400 AS churned
        |FROM u ORDER BY user_id""".stripMargin,

    "q_ab_ztest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
        |    user_id % 2 AS cohort
        |  FROM events GROUP BY user_id),
        |s AS (SELECT cohort, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS conv
        |      FROM u GROUP BY cohort),
        |w AS (
        |  SELECT MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
        |    MAX(CASE WHEN cohort = 0 THEN conv END) AS c0,
        |    MAX(CASE WHEN cohort = 1 THEN n END) AS n1,
        |    MAX(CASE WHEN cohort = 1 THEN conv END) AS c1
        |  FROM s)
        |SELECT n0, c0, n1, c1,
        |  ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS p0,
        |  ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS p1,
        |  ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
        |    sqrt((CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |         (1.0 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1)) *
        |         (1.0 / n0 + 1.0 / n1)), 6) AS z
        |FROM w""".stripMargin,

    "q_attribution" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts,
        |    CAST(ROUND(value * 100) AS BIGINT) AS rev_c
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS cuser, ts AS cts,
        |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 8 AS campaign
        |  FROM events WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.purchase_id, p.rev_c,
        |    CASE WHEN l.cts IS NOT NULL
        |          AND CAST(FLOOR(epoch(p.pts)) AS BIGINT) -
        |              CAST(FLOOR(epoch(l.cts)) AS BIGINT) <= 7 * 86400
        |         THEN l.campaign ELSE -1 END AS campaign
        |  FROM p LEFT JOIN LATERAL (
        |    SELECT campaign, cts FROM c
        |    WHERE c.cuser = p.user_id
        |      AND (c.cts < p.pts OR (c.cts = p.pts AND c.click_id < p.purchase_id))
        |    ORDER BY c.cts DESC, c.click_id DESC LIMIT 1) l ON TRUE)
        |SELECT campaign, COUNT(*) AS n_conversions,
        |  CAST(SUM(rev_c) AS BIGINT) AS revenue_cents
        |FROM m GROUP BY campaign ORDER BY campaign""".stripMargin,

    "q_asof_within" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS cuser, ts AS cts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id,
        |  CASE WHEN l.cts IS NOT NULL
        |        AND CAST(FLOOR(epoch(p.pts)) AS BIGINT) - CAST(FLOOR(epoch(l.cts)) AS BIGINT) <= 3600
        |       THEN l.click_id END AS click_id,
        |  CASE WHEN l.cts IS NOT NULL
        |        AND CAST(FLOOR(epoch(p.pts)) AS BIGINT) - CAST(FLOOR(epoch(l.cts)) AS BIGINT) <= 3600
        |       THEN CAST(FLOOR(epoch(p.pts)) AS BIGINT) - CAST(FLOOR(epoch(l.cts)) AS BIGINT)
        |  END AS gap_seconds
        |FROM p LEFT JOIN LATERAL (
        |  SELECT click_id, cts FROM c
        |  WHERE c.cuser = p.user_id
        |    AND (c.cts < p.pts OR (c.cts = p.pts AND c.click_id < p.purchase_id))
        |  ORDER BY c.cts DESC, c.click_id DESC LIMIT 1) l ON TRUE
        |ORDER BY p.purchase_id""".stripMargin,

    "q_asof_join_native" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS cuser, ts AS cts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id,
        |  strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  l.click_id,
        |  strftime(l.cts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM p LEFT JOIN LATERAL (
        |  SELECT click_id, cts FROM c
        |  WHERE c.cuser = p.user_id
        |    AND (c.cts < p.pts OR (c.cts = p.pts AND c.click_id < p.purchase_id))
        |  ORDER BY c.cts DESC, c.click_id DESC LIMIT 1) l ON TRUE
        |ORDER BY p.purchase_id""".stripMargin,

    "q_asof_forward" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS cuser, ts AS cts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id,
        |  strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  l.click_id,
        |  strftime(l.cts, '%Y-%m-%d %H:%M:%S') AS click_ts
        |FROM p LEFT JOIN LATERAL (
        |  SELECT click_id, cts FROM c
        |  WHERE c.cuser = p.user_id
        |    AND (c.cts > p.pts OR (c.cts = p.pts AND c.click_id > p.purchase_id))
        |  ORDER BY c.cts ASC, c.click_id ASC LIMIT 1) l ON TRUE
        |ORDER BY p.purchase_id""".stripMargin,

    "q_asof_inner" ->
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id AS cuser, ts AS cts FROM events
        |  WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id, l.click_id,
        |  CAST(FLOOR(epoch(p.pts)) AS BIGINT) - CAST(FLOOR(epoch(l.cts)) AS BIGINT) AS gap_seconds
        |FROM p JOIN LATERAL (
        |  SELECT click_id, cts FROM c
        |  WHERE c.cuser = p.user_id
        |    AND (c.cts < p.pts OR (c.cts = p.pts AND c.click_id < p.purchase_id))
        |  ORDER BY c.cts DESC, c.click_id DESC LIMIT 1) l ON TRUE
        |ORDER BY p.purchase_id""".stripMargin,

    "q_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep,
        |    lag(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w AS prev_epoch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_epoch IS NULL OR ep - prev_epoch >= 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM e),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS session_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,

    "q_session_gap_sweep" ->
      """WITH ex AS (
        |  SELECT g.gap_s, user_id, event_id, ts,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT) AS ep
        |  FROM events
        |  CROSS JOIN (SELECT CAST(unnest([600, 1800, 3600]) AS BIGINT) AS gap_s) g),
        |lagged AS (
        |  SELECT *, lag(ep) OVER (PARTITION BY gap_s, user_id
        |                          ORDER BY ts ASC, event_id ASC) AS prev
        |  FROM ex),
        |flagged AS (
        |  SELECT *, CASE WHEN prev IS NULL OR ep - prev >= gap_s
        |                 THEN 1 ELSE 0 END AS new_session
        |  FROM lagged),
        |sess AS (
        |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY gap_s, user_id
        |    ORDER BY ts ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_id
        |  FROM flagged),
        |per AS (
        |  SELECT gap_s, user_id, session_id, COUNT(*) AS n_ev,
        |    MAX(ep) - MIN(ep) AS dur_s
        |  FROM sess GROUP BY 1, 2, 3),
        |agg AS (
        |  SELECT gap_s, COUNT(*) AS n_sessions,
        |    CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |    CAST(SUM(dur_s) AS BIGINT) AS total_dur_s,
        |    CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_singletons
        |  FROM per GROUP BY gap_s)
        |SELECT gap_s, n_sessions, n_events,
        |  n_events * 1000000 // n_sessions AS events_per_session_ppm,
        |  total_dur_s // n_sessions AS mean_dur_s,
        |  n_singletons, n_singletons * 1000000 // n_sessions AS singleton_ppm
        |FROM agg ORDER BY gap_s""".stripMargin,

    "q_acf" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    COUNT(*) AS v
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(SUM(v) AS BIGINT) // COUNT(*) AS m FROM daily),
        |dev AS (SELECT day, v - (SELECT m FROM m) AS dev FROM daily),
        |den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM dev)
        |SELECT CAST(k.lag_d AS BIGINT) AS lag_d, COUNT(*) AS n_pairs,
        |  CAST(SUM(a.dev * b.dev) AS BIGINT) * 1000000
        |    // (SELECT den FROM den) AS acf_ppm
        |FROM (SELECT unnest([1, 2, 3, 4, 5, 6, 7]) AS lag_d) k
        |CROSS JOIN dev a
        |JOIN dev b ON b.day = a.day + k.lag_d
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_cusum" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS v FROM events GROUP BY 1),
        |m AS (SELECT CAST(SUM(v) AS BIGINT) // COUNT(*) AS m FROM daily),
        |cu AS (
        |  SELECT day, v,
        |    CAST(SUM(v - (SELECT m FROM m)) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cusum
        |  FROM daily),
        |pk AS (SELECT MAX(ABS(cusum)) AS peak FROM cu)
        |SELECT CAST(day AS VARCHAR) AS day, v, cusum,
        |  CAST(CASE WHEN ABS(cusum) = (SELECT peak FROM pk)
        |    THEN 1 ELSE 0 END AS INTEGER) AS is_peak
        |FROM cu ORDER BY day""".stripMargin,

    "q_forecast_backtest" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS v FROM events GROUP BY 1)
        |SELECT CAST(a.day AS VARCHAR) AS day, a.v AS actual, b.v AS forecast,
        |  ABS(a.v - b.v) AS abs_err,
        |  ABS(a.v - b.v) * 1000000 // a.v AS ape_ppm
        |FROM daily a JOIN daily b ON a.day = b.day + 7
        |ORDER BY day""".stripMargin,

    "q_ema" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS v FROM events GROUP BY 1),
        |c AS (
        |  SELECT b.day + k.k AS day, b.v * (128 >> k.k) AS wv, 128 >> k.k AS w
        |  FROM daily b CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS k) k),
        |agg AS (
        |  SELECT day, CAST(SUM(wv) AS BIGINT) AS num, CAST(SUM(w) AS BIGINT) AS den
        |  FROM c GROUP BY 1)
        |SELECT CAST(a.day AS VARCHAR) AS day, a.v, num // den AS ema
        |FROM daily a JOIN agg USING (day)
        |ORDER BY day""".stripMargin,

    "q_survival" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events),
        |maxd AS (SELECT MAX(day) AS maxd FROM ev),
        |users AS (
        |  SELECT user_id,
        |    CAST(COALESCE(
        |      date_diff('day', MIN(day),
        |        MIN(CASE WHEN event_type = 'purchase' THEN day END)),
        |      date_diff('day', MIN(day), (SELECT maxd FROM maxd))) AS BIGINT) AS obs,
        |    CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN day END) IS NULL
        |      THEN 0 ELSE 1 END AS ev
        |  FROM ev GROUP BY user_id),
        |n AS (SELECT COUNT(*) AS big_n FROM users),
        |byday AS (
        |  SELECT obs, COUNT(*) AS removed, CAST(SUM(ev) AS BIGINT) AS d
        |  FROM users GROUP BY 1),
        |grid AS (
        |  SELECT obs, d,
        |    (SELECT big_n FROM n) - CAST(COALESCE(SUM(removed) OVER (ORDER BY obs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS at_risk
        |  FROM byday),
        |g2 AS (SELECT obs, at_risk, d FROM grid WHERE d > 0),
        |g3 AS (
        |  SELECT obs, at_risk, d,
        |    CASE WHEN at_risk > d
        |      THEN LN(CAST(at_risk - d AS DOUBLE) / CAST(at_risk AS DOUBLE))
        |    END AS ln_term,
        |    MAX(CASE WHEN at_risk = d THEN 1 ELSE 0 END) OVER (ORDER BY obs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero
        |  FROM g2)
        |SELECT obs AS day, at_risk, d AS events,
        |  CASE WHEN hit_zero = 1 THEN 0.0
        |    ELSE ROUND(EXP(SUM(ln_term) OVER (ORDER BY obs
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |  END AS surv
        |FROM g3 ORDER BY day""".stripMargin,

    "q_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM events GROUP BY 1),
        |dd AS (
        |  SELECT day, rev_c,
        |    CAST(MAX(rev_c) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak_c
        |  FROM daily),
        |d2 AS (SELECT day, rev_c, peak_c, peak_c - rev_c AS drawdown_c FROM dd),
        |mx AS (SELECT MAX(drawdown_c) AS mdd FROM d2)
        |SELECT CAST(day AS VARCHAR) AS day, rev_c, peak_c, drawdown_c,
        |  CAST(CASE WHEN drawdown_c = (SELECT mdd FROM mx)
        |    THEN 1 ELSE 0 END AS INTEGER) AS is_max_dd
        |FROM d2 ORDER BY day""".stripMargin,

    "q_ctr_smoothed" ->
      """WITH uv AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks
        |  FROM events WHERE event_type IN ('view', 'click') GROUP BY 1),
        |u2 AS (SELECT * FROM uv WHERE views > 0),
        |g AS (SELECT CAST(SUM(clicks) AS BIGINT) * 1000000
        |        // CAST(SUM(views) AS BIGINT) AS global_ppm FROM u2)
        |SELECT user_id, views, clicks,
        |  clicks * 1000000 // views AS raw_ppm,
        |  (clicks * 1000000 + 10 * (SELECT global_ppm FROM g))
        |    // (views + 10) AS smoothed_ppm
        |FROM u2 ORDER BY user_id""".stripMargin,

    "q_new_user_rate" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, COUNT(*) AS dau FROM ev GROUP BY 1),
        |f AS (SELECT user_id, MIN(day) AS day FROM ev GROUP BY 1),
        |nu AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
        |SELECT CAST(d.day AS VARCHAR) AS day, d.dau,
        |  CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
        |  CAST(COALESCE(nu.new_users, 0) AS BIGINT) * 1000000 // d.dau AS novelty_ppm
        |FROM dau d LEFT JOIN nu ON nu.day = d.day
        |ORDER BY day""".stripMargin,

    "q_pareto_share" ->
      """WITH u AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id ASC) AS rk
        |      FROM u),
        |tot AS (SELECT COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS total FROM u)
        |SELECT (SELECT n_users FROM tot) AS n_users,
        |  CAST(SUM(CASE WHEN rk * 10 <= (SELECT n_users FROM tot)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS top_users,
        |  (SELECT total FROM tot) AS total,
        |  CAST(SUM(CASE WHEN rk * 10 <= (SELECT n_users FROM tot)
        |    THEN n ELSE 0 END) AS BIGINT) AS top_events,
        |  CAST(SUM(CASE WHEN rk * 10 <= (SELECT n_users FROM tot)
        |    THEN n ELSE 0 END) AS BIGINT) * 1000000
        |    // (SELECT total FROM tot) AS pareto_ppm
        |FROM r""".stripMargin,

    "q_fano" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx
        |  FROM daily GROUP BY 1)
        |SELECT event_type, n_days, sx * 1000 // n_days AS mean_milli,
        |  (n_days * sxx - sx * sx) * 1000 // (n_days * sx) AS fano_milli
        |FROM m ORDER BY event_type""".stripMargin,

    "q_propensity" ->
      """WITH t AS (
        |  SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_vc
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM t)
        |SELECT event_type, n,
        |  n * 1000000 // (SELECT big_n FROM tot) AS propensity_ppm,
        |  sum_vc,
        |  sum_vc * (SELECT big_n FROM tot) // (5 * n) AS ips_contrib_c
        |FROM t ORDER BY event_type""".stripMargin,

    "q_xcorr" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS b
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |m AS (SELECT CAST(SUM(a) AS BIGINT) // COUNT(*) AS ma,
        |             CAST(SUM(b) AS BIGINT) // COUNT(*) AS mb FROM daily),
        |dev AS (SELECT day, a - (SELECT ma FROM m) AS da,
        |               b - (SELECT mb FROM m) AS db FROM daily),
        |xc AS (
        |  SELECT CAST(k.lag_d AS BIGINT) AS lag_d, COUNT(*) AS n_pairs,
        |    CAST(SUM(p.da * q.db) AS BIGINT) AS xcov
        |  FROM (SELECT unnest([-3, -2, -1, 0, 1, 2, 3]) AS lag_d) k
        |  CROSS JOIN dev p
        |  JOIN dev q ON q.day = p.day + k.lag_d
        |  GROUP BY 1),
        |pk AS (SELECT MAX(ABS(xcov)) AS peak FROM xc)
        |SELECT lag_d, n_pairs, xcov,
        |  CAST(CASE WHEN ABS(xcov) = (SELECT peak FROM pk)
        |    THEN 1 ELSE 0 END AS INTEGER) AS is_peak
        |FROM xc ORDER BY lag_d""".stripMargin,

    "q_behavior_entropy" ->
      """WITH pt AS (
        |  SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2),
        |pu AS (
        |  SELECT user_id,
        |    CAST(ROUND((ln(CAST(SUM(c) AS DOUBLE)) -
        |                SUM(c * ln(CAST(c AS DOUBLE))) / SUM(c)) * 1000000)
        |      AS BIGINT) AS h_unats
        |  FROM pt GROUP BY 1)
        |SELECT user_id % 2 AS cohort, COUNT(*) AS n_users,
        |  CAST(SUM(h_unats) AS BIGINT) // COUNT(*) AS mean_h_unats,
        |  MAX(h_unats) AS max_h_unats
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_ship_delay" ->
      """SELECT o.o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
        |    // COUNT(*) AS mean_days,
        |  CAST(MAX(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT)
        |    AS max_days,
        |  CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 7
        |    THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS le_7d_ppm,
        |  CAST(SUM(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
        |    THEN 1 ELSE 0 END) AS BIGINT) * 1000000 // COUNT(*) AS le_30d_ppm
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_markov_stationary" ->
      """WITH seq AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS dst
        |  FROM events),
        |tr AS (
        |  SELECT src, dst, COUNT(*) AS n FROM seq
        |  WHERE dst IS NOT NULL GROUP BY 1, 2),
        |trp AS (
        |  SELECT src, dst,
        |    n * 1000000 // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT)
        |      AS p_ppm
        |  FROM tr),
        |states AS (
        |  SELECT DISTINCT state FROM (
        |    SELECT src AS state FROM trp UNION SELECT dst FROM trp)),
        |k AS (SELECT COUNT(*) AS k FROM states),
        |pi0 AS (SELECT state, 1000000 // (SELECT k FROM k) AS p0_ppm FROM states),
        |pi1 AS (
        |  SELECT t.dst AS state,
        |    CAST(SUM(p.p0_ppm * t.p_ppm) AS BIGINT) // 1000000 AS p1_ppm
        |  FROM pi0 p JOIN trp t ON t.src = p.state GROUP BY 1),
        |pi2 AS (
        |  SELECT t.dst AS state,
        |    CAST(SUM(p.p1_ppm * t.p_ppm) AS BIGINT) // 1000000 AS p2_ppm
        |  FROM pi1 p JOIN trp t ON t.src = p.state GROUP BY 1)
        |SELECT s.state, p0.p0_ppm,
        |  COALESCE(p1.p1_ppm, 0) AS p1_ppm, COALESCE(p2.p2_ppm, 0) AS p2_ppm
        |FROM states s
        |JOIN pi0 p0 ON p0.state = s.state
        |LEFT JOIN pi1 p1 ON p1.state = s.state
        |LEFT JOIN pi2 p2 ON p2.state = s.state
        |ORDER BY s.state""".stripMargin,

    "q_cohort_ltv" ->
      """WITH fs AS (
        |  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_w
        |  FROM events GROUP BY 1),
        |rev AS (
        |  SELECT strftime(f.cohort_w, '%Y-%m-%d') AS cohort_week,
        |    date_diff('day', f.cohort_w, date_trunc('week', e.ts)) // 7
        |      AS week_offset,
        |    CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM events e JOIN fs f ON e.user_id = f.user_id
        |  GROUP BY 1, 2),
        |sizes AS (
        |  SELECT strftime(cohort_w, '%Y-%m-%d') AS cohort_week,
        |    COUNT(*) AS cohort_n
        |  FROM fs GROUP BY 1)
        |SELECT r.cohort_week, r.week_offset, r.rev_c,
        |  CAST(SUM(r.rev_c) OVER (PARTITION BY r.cohort_week
        |                          ORDER BY r.week_offset) AS BIGINT) AS cum_rev_c,
        |  s.cohort_n,
        |  CAST(SUM(r.rev_c) OVER (PARTITION BY r.cohort_week
        |                          ORDER BY r.week_offset) AS BIGINT)
        |    // s.cohort_n AS ltv_c_per_user
        |FROM rev r JOIN sizes s ON s.cohort_week = r.cohort_week
        |ORDER BY r.cohort_week, r.week_offset""".stripMargin,

    "q_power_analysis" ->
      """WITH u AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT COUNT(*) AS n_users, CAST(SUM(conv) AS BIGINT) AS n_conv FROM u)
        |SELECT n_users, n_conv, n_conv * 1000000 // n_users AS p_ppm,
        |  CAST(100000 AS BIGINT) AS mde_rel_ppm,
        |  CASE WHEN n_conv * 1000000 // n_users = 0 THEN NULL
        |    ELSE 784 * (1000000 - n_conv * 1000000 // n_users)
        |      // (n_conv * 1000000 // n_users) END AS n_per_arm
        |FROM a""".stripMargin,

    "q_qte" ->
      """WITH rev AS (
        |  SELECT user_id, user_id % 2 AS cohort,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM events GROUP BY 1, 2),
        |q AS (
        |  SELECT cohort, quantile_cont(rev_c, 0.5) AS p50,
        |    quantile_cont(rev_c, 0.9) AS p90
        |  FROM rev GROUP BY 1),
        |w AS (
        |  SELECT MAX(CASE WHEN cohort = 0 THEN p50 END) AS p50_a,
        |    MAX(CASE WHEN cohort = 1 THEN p50 END) AS p50_b,
        |    MAX(CASE WHEN cohort = 0 THEN p90 END) AS p90_a,
        |    MAX(CASE WHEN cohort = 1 THEN p90 END) AS p90_b
        |  FROM q)
        |SELECT ROUND(p50_a, 4) AS p50_a, ROUND(p50_b, 4) AS p50_b,
        |  ROUND(p50_b - p50_a, 4) AS qte_p50,
        |  ROUND(p90_a, 4) AS p90_a, ROUND(p90_b, 4) AS p90_b,
        |  ROUND(p90_b - p90_a, 4) AS qte_p90
        |FROM w""".stripMargin,

    "q_stratified_srm" ->
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS cohort, MIN(CAST(ts AS DATE)) AS fs
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT fs,
        |    CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    COUNT(*) AS n
        |  FROM u GROUP BY 1),
        |c AS (
        |  SELECT fs, n_a, n - n_a AS n_b,
        |    ((2 * n_a - n) * (2 * n_a - n) * 1000) // n AS chi2_milli
        |  FROM s),
        |t AS (SELECT CAST(SUM(chi2_milli) AS BIGINT) AS chi2_total_milli,
        |        COUNT(*) AS df FROM c)
        |SELECT c.fs AS stratum_day, c.n_a, c.n_b, c.chi2_milli,
        |  t.chi2_total_milli, t.df
        |FROM c, t ORDER BY stratum_day""".stripMargin,

    "q_sequential_test" ->
      """WITH fs AS (
        |  SELECT user_id, user_id % 2 AS cohort, MIN(CAST(ts AS DATE)) AS fsd
        |  FROM events GROUP BY 1, 2),
        |fp AS (
        |  SELECT user_id, MIN(CAST(ts AS DATE)) AS fpd
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |u AS (SELECT fs.user_id, fs.cohort, fs.fsd, fp.fpd
        |      FROM fs LEFT JOIN fp ON fs.user_id = fp.user_id),
        |days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
        |grid AS (SELECT d.day, c.cohort
        |         FROM days d CROSS JOIN (SELECT DISTINCT cohort FROM u) c),
        |sh AS (SELECT fsd AS day, cohort, COUNT(*) AS ns FROM u GROUP BY 1, 2),
        |ph AS (SELECT fpd AS day, cohort, COUNT(*) AS np FROM u
        |       WHERE fpd IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        |  SELECT g.day, g.cohort,
        |    CAST(SUM(COALESCE(sh.ns, 0)) OVER (PARTITION BY g.cohort
        |      ORDER BY g.day) AS BIGINT) AS n,
        |    CAST(SUM(COALESCE(ph.np, 0)) OVER (PARTITION BY g.cohort
        |      ORDER BY g.day) AS BIGINT) AS c
        |  FROM grid g
        |  LEFT JOIN sh ON sh.day = g.day AND sh.cohort = g.cohort
        |  LEFT JOIN ph ON ph.day = g.day AND ph.cohort = g.cohort),
        |wide AS (
        |  SELECT day,
        |    MAX(CASE WHEN cohort = 0 THEN n END) AS na,
        |    MAX(CASE WHEN cohort = 0 THEN c END) AS ca,
        |    MAX(CASE WHEN cohort = 1 THEN n END) AS nb,
        |    MAX(CASE WHEN cohort = 1 THEN c END) AS cb
        |  FROM cum GROUP BY day),
        |z AS (
        |  SELECT day, na, ca, nb, cb,
        |    CASE WHEN na > 0 AND nb > 0 AND (ca + cb) > 0
        |          AND (ca + cb) < (na + nb)
        |    THEN ((ca * nb - cb * na) * (ca * nb - cb * na) * (na + nb) * 1000)
        |         // (na * nb * (ca + cb) * (na + nb - ca - cb))
        |    ELSE NULL END AS z2_milli
        |  FROM wide)
        |SELECT day, na, ca, nb, cb, z2_milli,
        |  CAST(CASE WHEN COALESCE(z2_milli, 0) > 9000 THEN 1 ELSE 0 END
        |    AS INTEGER) AS crossed
        |FROM z ORDER BY day""".stripMargin,

    "q_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    COUNT(*) AS n
        |  FROM u)
        |SELECT n_a, n_b, n,
        |  ((2 * n_a - n) * (2 * n_a - n) * 1000) // n AS chi2_milli,
        |  CAST(CASE WHEN ((2 * n_a - n) * (2 * n_a - n) * 1000) // n > 3841
        |    THEN 1 ELSE 0 END AS INTEGER) AS srm_flag
        |FROM a""".stripMargin,

    "q_diff_in_diff" ->
      """WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |base AS (
        |  SELECT user_id, user_id % 3 = 0 AS treat,
        |    date_diff('day', (SELECT d0 FROM d0), CAST(ts AS DATE)) < 15 AS pre,
        |    CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END AS rev_c
        |  FROM events),
        |users AS (
        |  SELECT treat, COUNT(*) AS n_users FROM (
        |    SELECT DISTINCT user_id, treat FROM base) GROUP BY treat),
        |cell AS (
        |  SELECT b.treat, b.pre,
        |    CAST(SUM(b.rev_c) AS BIGINT) // u.n_users AS mean_c
        |  FROM base b JOIN users u ON b.treat = u.treat
        |  GROUP BY b.treat, b.pre, u.n_users),
        |m AS (
        |  SELECT
        |    CAST(COALESCE(SUM(CASE WHEN treat AND pre THEN mean_c END), 0)
        |      AS BIGINT) AS t_pre_c,
        |    CAST(COALESCE(SUM(CASE WHEN treat AND NOT pre THEN mean_c END), 0)
        |      AS BIGINT) AS t_post_c,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treat AND pre THEN mean_c END), 0)
        |      AS BIGINT) AS c_pre_c,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treat AND NOT pre THEN mean_c END), 0)
        |      AS BIGINT) AS c_post_c
        |  FROM cell),
        |u2 AS (
        |  SELECT
        |    CAST(COALESCE(SUM(CASE WHEN treat THEN n_users END), 0) AS BIGINT)
        |      AS n_treat,
        |    CAST(COALESCE(SUM(CASE WHEN NOT treat THEN n_users END), 0) AS BIGINT)
        |      AS n_ctrl
        |  FROM users)
        |SELECT u2.n_treat, u2.n_ctrl, m.t_pre_c, m.t_post_c,
        |  m.c_pre_c, m.c_post_c,
        |  (m.t_post_c - m.t_pre_c) - (m.c_post_c - m.c_pre_c) AS did_c
        |FROM m, u2""".stripMargin,

    "q_cuped" ->
      """WITH d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
        |ux AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN date_diff('day', (SELECT d0 FROM d0),
        |                                 CAST(ts AS DATE)) < 15
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN date_diff('day', (SELECT d0 FROM d0),
        |                                 CAST(ts AS DATE)) >= 15
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |m AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        |    CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
        |  FROM ux)
        |SELECT n, n * sxy - sx * sy AS cov_n, n * sxx - sx * sx AS var_x,
        |  n * syy - sy * sy AS var_y,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx), 6)
        |    AS theta,
        |  ROUND((CAST(n * sxy - sx * sy AS DOUBLE) *
        |         CAST(n * sxy - sx * sy AS DOUBLE)) /
        |        (CAST(n * sxx - sx * sx AS DOUBLE) *
        |         CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho2
        |FROM m""".stripMargin,

    "q_funnel_latency" ->
      """WITH p AS (
        |  SELECT event_id AS pid, user_id, ts AS pts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS cid, user_id AS cuser, ts AS cts FROM events
        |  WHERE event_type = 'click'),
        |v AS (
        |  SELECT event_id AS vid, user_id AS vuser, ts AS vts FROM events
        |  WHERE event_type = 'view'),
        |pc AS (
        |  SELECT 'click_to_purchase' AS stage,
        |    CAST(FLOOR(epoch(p.pts)) AS BIGINT) -
        |    CAST(FLOOR(epoch(l.cts)) AS BIGINT) AS lat_s
        |  FROM p JOIN LATERAL (
        |    SELECT cts FROM c
        |    WHERE c.cuser = p.user_id
        |      AND (c.cts < p.pts OR (c.cts = p.pts AND c.cid < p.pid))
        |    ORDER BY c.cts DESC, c.cid DESC LIMIT 1) l ON TRUE),
        |cv AS (
        |  SELECT 'view_to_click' AS stage,
        |    CAST(FLOOR(epoch(c.cts)) AS BIGINT) -
        |    CAST(FLOOR(epoch(l.vts)) AS BIGINT) AS lat_s
        |  FROM c JOIN LATERAL (
        |    SELECT vts FROM v
        |    WHERE v.vuser = c.cuser
        |      AND (v.vts < c.cts OR (v.vts = c.cts AND v.vid < c.cid))
        |    ORDER BY v.vts DESC, v.vid DESC LIMIT 1) l ON TRUE),
        |u AS (SELECT * FROM pc UNION ALL SELECT * FROM cv)
        |SELECT stage, COUNT(*) AS n, MIN(lat_s) AS min_s, MAX(lat_s) AS max_s,
        |  CAST(SUM(lat_s) AS BIGINT) // COUNT(*) AS mean_s,
        |  CAST(SUM(CASE WHEN lat_s < 60 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS lt_1m_ppm,
        |  CAST(SUM(CASE WHEN lat_s < 3600 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS lt_1h_ppm,
        |  CAST(SUM(CASE WHEN lat_s < 86400 THEN 1 ELSE 0 END) AS BIGINT)
        |    * 1000000 // COUNT(*) AS lt_1d_ppm
        |FROM u GROUP BY stage ORDER BY stage""".stripMargin,

    "q_changepoint" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS x FROM events GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_days, CAST(SUM(x) AS BIGINT) AS tot FROM daily),
        |c AS (
        |  SELECT day, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(SUM(x) OVER (ORDER BY day) AS BIGINT) AS cum
        |  FROM daily),
        |g AS (
        |  SELECT c.day, c.i, c.cum,
        |    (c.cum * c.cum * 1000) // c.i +
        |    ((n.tot - c.cum) * (n.tot - c.cum) * 1000) // (n.n_days - c.i)
        |      AS g_milli
        |  FROM c, n WHERE c.i <= n.n_days - 1),
        |b AS (SELECT MAX(g_milli) AS gbest FROM g)
        |SELECT g.day AS split_after, g.i AS n_left, g.cum AS sum_left, g.g_milli,
        |  CAST(CASE WHEN g.g_milli = b.gbest THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_best
        |FROM g, b ORDER BY split_after""".stripMargin,

    "q_stickiness" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day,
        |    strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
        |  FROM events),
        |dau AS (SELECT day, week, COUNT(*) AS dau FROM e GROUP BY 1, 2),
        |wau AS (
        |  SELECT week, COUNT(DISTINCT user_id) AS wau FROM e GROUP BY 1)
        |SELECT d.day, d.week, d.dau, w.wau,
        |  d.dau * 1000000 // w.wau AS stickiness_ppm
        |FROM dau d JOIN wau w ON d.week = w.week ORDER BY d.day""".stripMargin,

    "q_theil_sen" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    COUNT(*) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |p AS (
        |  SELECT a.day AS d1, b.day AS d2,
        |    (b.y - a.y) * 1000000 // (b.day - a.day) AS slope_micro
        |  FROM daily a JOIN daily b ON b.day > a.day),
        |r AS (
        |  SELECT slope_micro,
        |    ROW_NUMBER() OVER (ORDER BY slope_micro, d1, d2) AS rk
        |  FROM p),
        |n AS (SELECT COUNT(*) AS n_pairs,
        |        CAST(MIN(slope_micro) AS BIGINT) AS min_slope_micro,
        |        CAST(MAX(slope_micro) AS BIGINT) AS max_slope_micro
        |      FROM p)
        |SELECT n.n_pairs,
        |  CAST(SUM(r.slope_micro) // COUNT(*) AS BIGINT) AS median_slope_micro,
        |  n.min_slope_micro, n.max_slope_micro
        |FROM r, n
        |WHERE r.rk = (n.n_pairs + 1) // 2 OR r.rk = n.n_pairs // 2 + 1
        |GROUP BY n.n_pairs, n.min_slope_micro, n.max_slope_micro""".stripMargin,

    "q_bradley_terry" -> bradleyTerryOracle,

    "q_ucb_arms" ->
      """WITH arms AS (
        |  SELECT user_id % 4 AS arm, COUNT(*) AS n_pulls,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_rewards
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS big_n FROM arms),
        |sc AS (
        |  SELECT a.arm, a.n_pulls, a.n_rewards,
        |    a.n_rewards * 1000 // a.n_pulls AS mean_milli,
        |    CAST(ROUND(sqrt(2 * ln(CAST(t.big_n AS DOUBLE)) / a.n_pulls) * 1000)
        |      AS BIGINT) AS bonus_milli
        |  FROM arms a, tot t)
        |SELECT arm, n_pulls, n_rewards, mean_milli, bonus_milli,
        |  mean_milli + bonus_milli AS ucb_milli,
        |  ROW_NUMBER() OVER (ORDER BY mean_milli + bonus_milli DESC, arm ASC)
        |    AS rank
        |FROM sc ORDER BY arm""".stripMargin,

    "q_psm_match" ->
      """WITH users AS (
        |  SELECT user_id, COUNT(*) AS n_ev,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_buy,
        |    CAST(SUM(CASE WHEN event_type = 'purchase'
        |      THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS spend_c
        |  FROM events GROUP BY user_id),
        |scored AS (
        |  SELECT user_id, spend_c,
        |    n_buy * 1000 // n_ev AS score_milli,
        |    (n_buy * 1000 // n_ev) // 25 AS bucket
        |  FROM users),
        |t AS (SELECT user_id AS uid_t, score_milli AS score_t,
        |        spend_c AS spend_t, bucket
        |      FROM scored WHERE user_id % 2 = 1),
        |c AS (SELECT score_milli AS score_c,
        |        CAST(MIN(user_id) AS BIGINT) AS uid_c,
        |        CAST(arg_min(spend_c, user_id) AS BIGINT) AS spend_ctl,
        |        score_milli // 25 AS bucket_c
        |      FROM scored WHERE user_id % 2 = 0
        |      GROUP BY score_milli),
        |nt AS (SELECT COUNT(*) AS n_treated FROM t),
        |cand AS (
        |  SELECT t.uid_t, t.spend_t, c.uid_c, c.spend_ctl,
        |    abs(t.score_t - c.score_c) AS gap
        |  FROM t CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o) o
        |  JOIN c ON c.bucket_c = t.bucket + o.o
        |  WHERE abs(t.score_t - c.score_c) <= 25),
        |best AS (
        |  SELECT uid_t, spend_t, uid_c, spend_ctl, gap FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY uid_t
        |                ORDER BY gap ASC, uid_c ASC) AS rn
        |    FROM cand) WHERE rn = 1),
        |agg AS (
        |  SELECT COUNT(*) AS n_matched,
        |    CAST(SUM(spend_t - spend_ctl) AS BIGINT) AS sum_diff_c,
        |    CAST(SUM(gap) AS BIGINT) AS sum_gap
        |  FROM best)
        |SELECT nt.n_treated, a.n_matched,
        |  CASE WHEN a.n_matched = 0 THEN NULL
        |       ELSE a.sum_diff_c // a.n_matched END AS att_cents,
        |  CASE WHEN a.n_matched = 0 THEN NULL
        |       ELSE a.sum_gap // a.n_matched END AS mean_gap_milli
        |FROM agg a, nt""".stripMargin,

    "q_granger" ->
      """WITH daily AS (
        |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY 1),
        |m AS (SELECT CAST(SUM(x) AS BIGINT) // COUNT(*) AS mx,
        |        CAST(SUM(y) AS BIGINT) // COUNT(*) AS my FROM daily),
        |dev AS (SELECT day, x - m.mx AS dx, y - m.my AS dy FROM daily, m),
        |tri AS (
        |  SELECT a.dy AS w, b.dy AS u, b.dx AS v
        |  FROM dev a JOIN dev b ON a.day = b.day + 1),
        |s0 AS (
        |  SELECT COUNT(*) AS n_pairs,
        |    CAST(SUM(w * w) AS BIGINT) AS sww, CAST(SUM(u * u) AS BIGINT) AS suu,
        |    CAST(SUM(v * v) AS BIGINT) AS svv, CAST(SUM(u * w) AS BIGINT) AS suw,
        |    CAST(SUM(v * w) AS BIGINT) AS svw, CAST(SUM(u * v) AS BIGINT) AS suv
        |  FROM tri),
        |s AS (
        |  SELECT n_pairs,
        |    sww // sc AS sww, suu // sc AS suu, svv // sc AS svv,
        |    suw // sc AS suw, svw // sc AS svw, suv // sc AS suv
        |  FROM (SELECT *, GREATEST(CAST(1 AS BIGINT),
        |      GREATEST(ABS(sww), ABS(suu), ABS(svv), ABS(suw),
        |               ABS(svw), ABS(suv)) // 500000) AS sc FROM s0)),
        |f AS (
        |  SELECT n_pairs,
        |    CASE WHEN suu = 0 THEN NULL
        |         ELSE sww - suw * suw // suu END AS ssr_restricted,
        |    CASE WHEN suu * svv - suv * suv = 0 THEN NULL
        |         ELSE sww - (suw * suw * svv + svw * svw * suu
        |                     - 2 * suw * svw * suv)
        |           // (suu * svv - suv * suv) END AS ssr_full
        |  FROM s)
        |SELECT n_pairs, ssr_restricted, ssr_full,
        |  CASE WHEN ssr_restricted IS NULL OR ssr_full IS NULL
        |         OR ssr_restricted <= 0 THEN NULL
        |       ELSE (ssr_restricted - ssr_full) * 1000000 // ssr_restricted
        |  END AS improvement_ppm
        |FROM f""".stripMargin) ++ batch12Oracle

  /** 3 unrolled Bradley–Terry MM rounds — lockstep with the Spark
    * loop above (same micro-unit init, same per-term floor before the
    * sum, same greatest(den,1) zero-win guard, same greatest(π,1)
    * clamp that keeps pi+pj nonzero in the zero-win degenerate case). */
  private lazy val bradleyTerryOracle: String = {
    val rounds = (1 to 3).map { k =>
      s"""d$k AS (
         |  SELECT e.i,
         |    CAST(SUM(e.nij * 1000000000000 // (pa.pi + pb.pi)) AS BIGINT) AS den
         |  FROM edges e JOIN p${k - 1} pa ON pa.i = e.i
         |    JOIN p${k - 1} pb ON pb.i = e.j
         |  GROUP BY e.i),
         |p$k AS (
         |  SELECT w.i,
         |    GREATEST(CAST(w.w * 1000000000000 // GREATEST(d.den, 1)
         |      AS BIGINT), 1) AS pi
         |  FROM wins w JOIN d$k d ON d.i = w.i)""".stripMargin
    }.mkString(",\n")
    s"""WITH dayv AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, event_type,
       |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS v
       |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3),
       |comp AS (
       |  SELECT a.event_type AS ta, b.event_type AS tb,
       |    CAST(SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS BIGINT) AS wa,
       |    CAST(SUM(CASE WHEN b.v > a.v THEN 1 ELSE 0 END) AS BIGINT) AS wb
       |  FROM dayv a JOIN dayv b
       |    ON a.user_id = b.user_id AND a.day = b.day
       |    AND a.event_type < b.event_type
       |  WHERE a.v <> b.v
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT ta AS i, tb AS j, wa + wb AS nij FROM comp
       |  UNION ALL SELECT tb, ta, wa + wb FROM comp),
       |wins AS (
       |  SELECT i, CAST(SUM(w) AS BIGINT) AS w FROM (
       |    SELECT ta AS i, wa AS w FROM comp
       |    UNION ALL SELECT tb, wb FROM comp) u GROUP BY i),
       |p0 AS (SELECT i, CAST(1000000 AS BIGINT) AS pi FROM wins),
       |$rounds
       |SELECT w.i AS event_type, w.w AS wins, p.pi AS pi_micro,
       |  ROW_NUMBER() OVER (ORDER BY p.pi DESC, w.i) AS rank
       |FROM wins w JOIN p3 p ON p.i = w.i
       |ORDER BY rank""".stripMargin
  }

  /** 3 unrolled boosting rounds — lockstep with the Spark loop above
    * (same milli residuals, same mean-first gain, same truncating
    * lr = ½ div, same (gain desc, f, t) argmax order). */
  private lazy val gbmOracle: String = {
    def vOf(a: String, f: String) =
      s"(CASE $f WHEN 0 THEN $a.f0 WHEN 1 THEN $a.f1 " +
        s"WHEN 2 THEN $a.f2 ELSE $a.f3 END)"
    val rounds = (1 to 3).map { k =>
      val p = k - 1
      s"""cand$k AS (
         |  SELECT c.f, c.t, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN ${vOf("u", "c.f")} <= c.t
         |      THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         |    CAST(SUM(CASE WHEN ${vOf("u", "c.f")} <= c.t
         |      THEN u.r ELSE 0 END) AS BIGINT) AS sl,
         |    CAST(SUM(u.r) AS BIGINT) AS stot
         |  FROM u$p u CROSS JOIN cands c GROUP BY c.f, c.t),
         |g$k AS (
         |  SELECT f, t, nl, n - nl AS nr, sl, stot - sl AS sr,
         |    CASE WHEN nl = 0 THEN 0 ELSE sl // nl END AS ml,
         |    CASE WHEN n - nl = 0 THEN 0
         |      ELSE (stot - sl) // (n - nl) END AS mr
         |  FROM cand$k),
         |b$k AS (
         |  SELECT f, t, nl, nr, ml, mr, ml * sl + mr * sr AS gain
         |  FROM g$k ORDER BY gain DESC, f, t LIMIT 1),
         |u$k AS (
         |  SELECT u.user_id, u.f0, u.f1, u.f2, u.f3, u.y_milli,
         |    u.pred + (CASE WHEN ${vOf("u", "b.f")} <= b.t
         |      THEN b.ml ELSE b.mr END) // 2 AS pred,
         |    u.y_milli - (u.pred + (CASE WHEN ${vOf("u", "b.f")} <= b.t
         |      THEN b.ml ELSE b.mr END) // 2) AS r
         |  FROM u$p u CROSS JOIN b$k b)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 3).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS round, f AS feature, t AS threshold,
         |  nl AS n_left, nr AS n_right, ml AS mean_left_milli,
         |  mr AS mean_right_milli, gain FROM b$k""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH base AS (
       |  SELECT user_id,
       |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS f0,
       |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS f1,
       |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS f2,
       |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS f3,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      * 1000 AS BIGINT) AS y_milli
       |  FROM events GROUP BY user_id),
       |m AS (SELECT CAST(SUM(y_milli) AS BIGINT) // COUNT(*) AS p0 FROM base),
       |cands AS (
       |  SELECT CAST(f.f AS BIGINT) AS f, CAST(t.t AS BIGINT) AS t
       |  FROM (SELECT unnest([0, 1, 2, 3]) AS f) f
       |  CROSS JOIN (SELECT unnest([1, 2, 3, 5, 8, 13, 21]) AS t) t),
       |u0 AS (
       |  SELECT user_id, f0, f1, f2, f3, y_milli,
       |    (SELECT p0 FROM m) AS pred,
       |    y_milli - (SELECT p0 FROM m) AS r
       |  FROM base),
       |$rounds
       |$out
       |ORDER BY round""".stripMargin
  }

  /** 8 unrolled survival-vector multiplications — lockstep with the
    * q_absorbing_chain Spark loop (same ppm floors, same missing-state
    * = 0 convention). */
  private lazy val absorbingOracle: String = {
    val steps = (1 to 8).map { k =>
      s"""s$k AS (
         |  SELECT q.src AS state,
         |    CAST(SUM(q.p_ppm * s.s) AS BIGINT) // 1000000 AS s
         |  FROM q JOIN s${k - 1} s ON s.state = q.dst
         |  GROUP BY q.src)""".stripMargin
    }.mkString(",\n")
    val accJoins = (1 to 7).map(k =>
      s"LEFT JOIN s$k ON s$k.state = st.state").mkString("\n")
    val accSum = (1 to 7).map(k => s"COALESCE(s$k.s, 0)").mkString(" + ")
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS dst
       |  FROM events),
       |tr AS (
       |  SELECT src, dst, COUNT(*) AS n FROM seq
       |  WHERE dst IS NOT NULL AND src <> 'purchase' GROUP BY 1, 2),
       |tr2 AS (
       |  SELECT src, dst,
       |    CAST(n * 1000000 AS BIGINT)
       |      // CAST(SUM(n) OVER (PARTITION BY src) AS BIGINT) AS p_ppm
       |  FROM tr),
       |q AS (SELECT src, dst, p_ppm FROM tr2 WHERE dst <> 'purchase'),
       |states AS (SELECT DISTINCT src AS state FROM tr2),
       |direct AS (SELECT src AS state, p_ppm AS p_direct_ppm
       |           FROM tr2 WHERE dst = 'purchase'),
       |s0 AS (SELECT state, CAST(1000000 AS BIGINT) AS s FROM states),
       |$steps
       |SELECT st.state,
       |  CAST(COALESCE(d.p_direct_ppm, 0) AS BIGINT) AS p_direct_ppm,
       |  1000000 - CAST(COALESCE(s8.s, 0) AS BIGINT) AS absorb8_ppm,
       |  1000000 + CAST($accSum AS BIGINT) AS t_micro_trunc
       |FROM states st
       |LEFT JOIN direct d ON d.state = st.state
       |LEFT JOIN s8 ON s8.state = st.state
       |$accJoins
       |ORDER BY st.state""".stripMargin
  }

  private lazy val batch12Oracle: Map[String, String] = Map(
    "q_gbm_stumps" -> gbmOracle,
    "q_absorbing_chain" -> absorbingOracle,

    "q_mahalanobis" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |mm AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |      AS mx_milli,
        |    CAST(SUM(y) AS BIGINT) * 1000 // CAST(COUNT(*) AS BIGINT)
        |      AS my_milli
        |  FROM u),
        |c0 AS (
        |  SELECT mm.n, mm.mx_milli, mm.my_milli,
        |    CAST(SUM((u.x * 1000 - mm.mx_milli) * (u.x * 1000 - mm.mx_milli))
        |      AS BIGINT) AS sdxx,
        |    CAST(SUM((u.y * 1000 - mm.my_milli) * (u.y * 1000 - mm.my_milli))
        |      AS BIGINT) AS sdyy,
        |    CAST(SUM((u.x * 1000 - mm.mx_milli) * (u.y * 1000 - mm.my_milli))
        |      AS BIGINT) AS sdxy
        |  FROM u CROSS JOIN mm GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT mx_milli, my_milli,
        |    sdxx // n AS cxx, sdyy // n AS cyy, sdxy // n AS cxy
        |  FROM c0),
        |m2 AS (SELECT *, cxx * cyy - cxy * cxy AS det FROM m),
        |sc AS (
        |  SELECT u.user_id, u.x, u.y,
        |    u.x * 1000 - m2.mx_milli AS dx,
        |    u.y * 1000 - m2.my_milli AS dy,
        |    CASE WHEN m2.det <= 0 THEN NULL
        |      ELSE (m2.cyy * (u.x * 1000 - m2.mx_milli)
        |              * (u.x * 1000 - m2.mx_milli)
        |          - 2 * m2.cxy * (u.x * 1000 - m2.mx_milli)
        |              * (u.y * 1000 - m2.my_milli)
        |          + m2.cxx * (u.y * 1000 - m2.my_milli)
        |              * (u.y * 1000 - m2.my_milli))
        |        // GREATEST(m2.det // 1000, 1) END AS d2_milli
        |  FROM u CROSS JOIN m2)
        |SELECT user_id, x, y, dx, dy, d2_milli FROM sc
        |ORDER BY d2_milli DESC NULLS LAST, user_id LIMIT 20""".stripMargin,

    "q_ips_eval" ->
      """WITH impr AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 8
        |      AS campaign,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS r
        |  FROM events WHERE event_type IN ('view', 'click')),
        |camp AS (
        |  SELECT campaign, CAST(COUNT(*) AS BIGINT) AS n_impr,
        |    CAST(SUM(r) AS BIGINT) AS clicks
        |  FROM impr GROUP BY campaign),
        |rk AS (
        |  SELECT *, clicks * 1000000 // n_impr AS rate_ppm,
        |    ROW_NUMBER() OVER (ORDER BY clicks * 1000000 // n_impr DESC,
        |      campaign) AS rank
        |  FROM camp),
        |tot AS (SELECT CAST(SUM(n_impr) AS BIGINT) AS n FROM camp)
        |SELECT campaign, n_impr, clicks, rate_ppm,
        |  CAST(rank AS BIGINT) AS rank,
        |  CAST(9 - rank AS BIGINT) AS w36,
        |  n_impr * 1000000 // (SELECT n FROM tot) AS p_log_ppm,
        |  clicks * (9 - rank) * 1000000 // (36 * n_impr) AS ips_term_ppm
        |FROM rk ORDER BY campaign""".stripMargin,

    "q_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) * 1000000 AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |idx AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS i
        |        FROM daily),
        |l0t AS (SELECT CAST(SUM(v) AS BIGINT) // 7 AS l0 FROM idx
        |        WHERE i <= 7),
        |init AS (
        |  SELECT (SELECT l0 FROM l0t) AS l0,
        |    list(v - (SELECT l0 FROM l0t) ORDER BY i) AS seas0
        |  FROM idx WHERE i <= 7),
        |h AS (
        |  SELECT CAST(7 AS BIGINT) AS i, CAST(NULL AS DATE) AS day,
        |    CAST(0 AS BIGINT) AS v, (SELECT l0 FROM init) AS l,
        |    CAST(0 AS BIGINT) AS b, (SELECT seas0 FROM init) AS seas,
        |    CAST(NULL AS BIGINT) AS su, CAST(NULL AS BIGINT) AS f
        |  UNION ALL
        |  SELECT d.i, d.day, d.v,
        |    (d.v - h.seas[1] + h.l + h.b) // 2 AS l,
        |    (((d.v - h.seas[1] + h.l + h.b) // 2) - h.l + h.b) // 2 AS b,
        |    list_append(h.seas[2:7],
        |      (d.v - ((d.v - h.seas[1] + h.l + h.b) // 2) + h.seas[1]) // 2)
        |      AS seas,
        |    h.seas[1] AS su,
        |    h.l + h.b + h.seas[1] AS f
        |  FROM h JOIN idx d ON d.i = h.i + 1)
        |SELECT CAST(day AS VARCHAR) AS day, v // 1000000 AS v,
        |  l AS level_micro, b AS trend_micro,
        |  su AS season_micro, f AS forecast_micro
        |FROM h WHERE i > 7 ORDER BY day""".stripMargin,

    "q_mrmr" ->
      """WITH uf AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f0,
        |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f1,
        |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f2,
        |    CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS f3,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np
        |  FROM events GROUP BY user_id),
        |mnp AS (SELECT CAST(SUM(np) AS BIGINT) // COUNT(*) AS mnp FROM uf),
        |users AS (
        |  SELECT CAST(CASE WHEN np > (SELECT mnp FROM mnp)
        |      THEN 1 ELSE 0 END AS BIGINT) AS y,
        |    LEAST(f0 // 8, 3) AS b0, LEAST(f1 // 8, 3) AS b1,
        |    LEAST(f2 // 8, 3) AS b2, LEAST(f3 // 8, 3) AS b3
        |  FROM uf),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM users),
        |longf AS (
        |  SELECT y, CAST(0 AS BIGINT) AS f, b0 AS b FROM users
        |  UNION ALL SELECT y, CAST(1 AS BIGINT), b1 FROM users
        |  UNION ALL SELECT y, CAST(2 AS BIGINT), b2 FROM users
        |  UNION ALL SELECT y, CAST(3 AS BIGINT), b3 FROM users),
        |cells AS (SELECT f, b, y, CAST(COUNT(*) AS BIGINT) AS c
        |          FROM longf GROUP BY 1, 2, 3),
        |margb AS (SELECT f, b, CAST(SUM(c) AS BIGINT) AS cb
        |          FROM cells GROUP BY 1, 2),
        |margy AS (SELECT f, y, CAST(SUM(c) AS BIGINT) AS cy
        |          FROM cells GROUP BY 1, 2),
        |rel AS (
        |  SELECT c.f,
        |    ROUND(SUM((CAST(c.c AS DOUBLE) / n.n)
        |      * ln(CAST(c.c AS DOUBLE) * n.n
        |        / (CAST(cb AS DOUBLE) * cy))), 6) AS rel
        |  FROM cells c JOIN margb USING (f, b) JOIN margy USING (f, y)
        |  CROSS JOIN n GROUP BY c.f),
        |longp AS (
        |  SELECT CAST(0 AS BIGINT) AS i, CAST(1 AS BIGINT) AS j,
        |    b0 AS bi, b1 AS bj FROM users
        |  UNION ALL SELECT 0, 2, b0, b2 FROM users
        |  UNION ALL SELECT 0, 3, b0, b3 FROM users
        |  UNION ALL SELECT 1, 2, b1, b2 FROM users
        |  UNION ALL SELECT 1, 3, b1, b3 FROM users
        |  UNION ALL SELECT 2, 3, b2, b3 FROM users),
        |pc AS (SELECT i, j, bi, bj, CAST(COUNT(*) AS BIGINT) AS c
        |       FROM longp GROUP BY 1, 2, 3, 4),
        |mi AS (SELECT i, j, bi, CAST(SUM(c) AS BIGINT) AS ci
        |       FROM pc GROUP BY 1, 2, 3),
        |mj AS (SELECT i, j, bj, CAST(SUM(c) AS BIGINT) AS cj
        |       FROM pc GROUP BY 1, 2, 3),
        |redp AS (
        |  SELECT p.i, p.j,
        |    ROUND(SUM((CAST(p.c AS DOUBLE) / n.n)
        |      * ln(CAST(p.c AS DOUBLE) * n.n
        |        / (CAST(ci AS DOUBLE) * cj))), 6) AS red
        |  FROM pc p JOIN mi USING (i, j, bi) JOIN mj USING (i, j, bj)
        |  CROSS JOIN n GROUP BY p.i, p.j),
        |red AS (SELECT i AS fa, j AS fb, red FROM redp
        |        UNION ALL SELECT j, i, red FROM redp),
        |b1 AS (SELECT f AS s1, rel AS rel1 FROM rel
        |       ORDER BY rel DESC, f LIMIT 1),
        |r2 AS (
        |  SELECT r.f, r.rel, rd.red, ROUND(r.rel - rd.red, 6) AS score
        |  FROM rel r CROSS JOIN b1
        |  JOIN red rd ON rd.fa = r.f AND rd.fb = b1.s1
        |  WHERE r.f <> b1.s1),
        |b2 AS (SELECT f AS s2, rel AS rel2, red AS red2, score AS score2
        |       FROM r2 ORDER BY score DESC, f LIMIT 1),
        |r3a AS (
        |  SELECT r.f, r.rel, ROUND((ra.red + rb.red) / 2, 6) AS redm
        |  FROM rel r CROSS JOIN b1 CROSS JOIN b2
        |  JOIN red ra ON ra.fa = r.f AND ra.fb = b1.s1
        |  JOIN red rb ON rb.fa = r.f AND rb.fb = b2.s2
        |  WHERE r.f <> b1.s1 AND r.f <> b2.s2),
        |r3 AS (SELECT f, rel, redm, ROUND(rel - redm, 6) AS score FROM r3a),
        |b3 AS (SELECT f AS s3, rel AS rel3, redm AS red3, score AS score3
        |       FROM r3 ORDER BY score DESC, f LIMIT 1)
        |SELECT * FROM (
        |  SELECT CAST(1 AS BIGINT) AS rank, s1 AS feature,
        |    rel1 AS rel_nats, CAST(0.0 AS DOUBLE) AS red_nats,
        |    rel1 AS score_nats FROM b1
        |  UNION ALL SELECT CAST(2 AS BIGINT), s2, rel2, red2, score2 FROM b2
        |  UNION ALL SELECT CAST(3 AS BIGINT), s3, rel3, red3, score3 FROM b3)
        |ORDER BY rank""".stripMargin,

    "q_page_hinkley" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS v
        |  FROM events GROUP BY 1),
        |m AS (SELECT CAST(SUM(v) AS BIGINT) // COUNT(*) AS m FROM daily),
        |c AS (
        |  SELECT day, v,
        |    CAST(SUM(v - (SELECT m FROM m)) OVER w AS BIGINT) AS cum
        |  FROM daily
        |  WINDOW w AS (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (
        |  SELECT day, v, cum,
        |    cum - CAST(MIN(cum) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS ph
        |  FROM c)
        |SELECT CAST(day AS VARCHAR) AS day, v, cum, ph,
        |  CAST(CASE WHEN ph > (SELECT m FROM m) THEN 1 ELSE 0 END AS BIGINT)
        |    AS alarm
        |FROM p ORDER BY day""".stripMargin,

    "q_coec" ->
      """WITH tagged AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 4 AS pos,
        |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 8
        |      AS campaign
        |  FROM events WHERE event_type IN ('view', 'click')),
        |v AS (SELECT campaign, pos, CAST(COUNT(*) AS BIGINT) AS nv
        |      FROM tagged WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT campaign, pos, CAST(COUNT(*) AS BIGINT) AS nc
        |      FROM tagged WHERE event_type = 'click' GROUP BY 1, 2),
        |grid AS (
        |  SELECT v.campaign, v.pos, v.nv, COALESCE(c.nc, 0) AS nc
        |  FROM v LEFT JOIN c ON c.campaign = v.campaign AND c.pos = v.pos),
        |curve AS (
        |  SELECT pos, CAST(SUM(nc) AS BIGINT) * 1000000
        |      // CAST(SUM(nv) AS BIGINT) AS ctr_pos_ppm
        |  FROM grid GROUP BY pos),
        |agg AS (
        |  SELECT g.campaign, CAST(SUM(g.nv) AS BIGINT) AS n_views,
        |    CAST(SUM(g.nc) AS BIGINT) AS n_clicks,
        |    CAST(SUM(g.nv * cu.ctr_pos_ppm) AS BIGINT) AS expected_micro
        |  FROM grid g JOIN curve cu ON cu.pos = g.pos
        |  GROUP BY g.campaign)
        |SELECT campaign, n_views, n_clicks,
        |  n_clicks * 1000000 // n_views AS ctr_ppm,
        |  expected_micro // 1000 AS expected_clicks_milli,
        |  CASE WHEN expected_micro = 0 THEN NULL
        |    ELSE n_clicks * 1000000000 // expected_micro END AS coec_milli
        |FROM agg ORDER BY campaign""".stripMargin,
    "q_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(COUNT(*) * 1000000 AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |idx AS (SELECT day, v, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
        |h AS (
        |  SELECT i, day, v, v AS l, CAST(0 AS BIGINT) AS b FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT d.i, d.day, d.v,
        |    (d.v + h.l + h.b) // 2 AS l,
        |    ((d.v + h.l + h.b) // 2 - h.l + h.b) // 2 AS b
        |  FROM h JOIN idx d ON d.i = h.i + 1)
        |SELECT CAST(day AS VARCHAR) AS day, v // 1000000 AS v,
        |  l AS level_micro, b AS trend_micro,
        |  lag(l + b) OVER (ORDER BY day) AS forecast_micro
        |FROM h ORDER BY day""".stripMargin,

    "q_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS v FROM events GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS nd FROM daily),
        |med AS (
        |  SELECT v AS med FROM (
        |    SELECT v, ROW_NUMBER() OVER (ORDER BY v, day) AS rn FROM daily)
        |  WHERE rn = ((SELECT nd FROM nd) + 1) // 2),
        |sgn AS (
        |  SELECT day, CASE WHEN v > (SELECT med FROM med) THEN 1 ELSE 0 END AS s
        |  FROM daily WHERE v <> (SELECT med FROM med)),
        |ch AS (
        |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
        |    OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS chg
        |  FROM sgn),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(COALESCE(SUM(s), 0) AS BIGINT) AS n1,
        |    CAST(COALESCE(SUM(chg), 0) AS BIGINT) AS runs
        |  FROM ch),
        |mo AS (
        |  SELECT m, n1, m - n1 AS n0, runs,
        |    CASE WHEN m = 0 THEN NULL
        |      ELSE 1000 + 2000 * n1 * (m - n1) // m END AS mu_milli,
        |    CASE WHEN m <= 1 THEN NULL
        |      ELSE 2 * n1 * (m - n1) * (2 * n1 * (m - n1) - m) * 1000000
        |        // (m * m * (m - 1)) END AS var_micro
        |  FROM agg)
        |SELECT m AS n_days, n1 AS n_above, n0 AS n_below, runs,
        |  mu_milli, var_micro,
        |  CASE WHEN var_micro IS NULL OR var_micro <= 0 THEN NULL
        |    ELSE (1000 * runs - mu_milli) * (1000 * runs - mu_milli) * 1000
        |      // var_micro END AS z2_milli
        |FROM mo""".stripMargin,

    "q_qini" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS converted,
        |    user_id % 2 AS cohort
        |  FROM events GROUP BY user_id),
        |nu AS (SELECT COUNT(*) AS n_users FROM users),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (ORDER BY score, user_id) AS rk
        |  FROM users),
        |dec AS (
        |  SELECT ((SELECT n_users FROM nu) - rk) * 10
        |      // (SELECT n_users FROM nu) AS decile,
        |    CAST(SUM(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
        |    CAST(SUM(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nc,
        |    CAST(SUM(CASE WHEN cohort = 1 THEN converted ELSE 0 END)
        |      AS BIGINT) AS ct,
        |    CAST(SUM(CASE WHEN cohort = 0 THEN converted ELSE 0 END)
        |      AS BIGINT) AS cc
        |  FROM ranked GROUP BY 1),
        |cum AS (
        |  SELECT decile,
        |    CAST(SUM(nt) OVER w AS BIGINT) AS nt_cum,
        |    CAST(SUM(nc) OVER w AS BIGINT) AS nc_cum,
        |    CAST(SUM(ct) OVER w AS BIGINT) AS ct_cum,
        |    CAST(SUM(cc) OVER w AS BIGINT) AS cc_cum
        |  FROM dec
        |  WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, nt_cum, nc_cum, ct_cum, cc_cum,
        |  CASE WHEN nt_cum = 0 OR nc_cum = 0 THEN NULL
        |    ELSE ct_cum * 1000000 // nt_cum - cc_cum * 1000000 // nc_cum
        |  END AS uplift_ppm,
        |  CASE WHEN nc_cum = 0 THEN NULL
        |    ELSE ct_cum * 1000 - cc_cum * 1000 * nt_cum // nc_cum
        |  END AS qini_milli
        |FROM cum ORDER BY decile""".stripMargin,

    "q_isotonic" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events GROUP BY user_id),
        |bins AS (
        |  SELECT (score - (SELECT MIN(score) FROM users)) * 20
        |      // ((SELECT MAX(score) FROM users)
        |         - (SELECT MIN(score) FROM users) + 1) AS bin,
        |    CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS conv
        |  FROM users GROUP BY 1),
        |iv AS (
        |  SELECT j.bin AS j, k.bin AS k,
        |    CAST(SUM(m.conv) AS BIGINT) * 1000000
        |      // CAST(SUM(m.n) AS BIGINT) AS rate_ppm
        |  FROM bins j JOIN bins k ON j.bin <= k.bin
        |  JOIN bins m ON m.bin >= j.bin AND m.bin <= k.bin
        |  GROUP BY 1, 2),
        |mn AS (
        |  SELECT iv.j, i.bin AS i, MIN(iv.rate_ppm) AS mn
        |  FROM iv JOIN bins i ON iv.j <= i.bin AND iv.k >= i.bin
        |  GROUP BY 1, 2),
        |iso AS (SELECT i, MAX(mn) AS iso_ppm FROM mn GROUP BY i)
        |SELECT b.bin, b.n, b.conv, b.conv * 1000000 // b.n AS raw_ppm,
        |  iso.iso_ppm
        |FROM bins b JOIN iso ON iso.i = b.bin
        |ORDER BY b.bin""".stripMargin,

    "q_shapley_attribution" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS conv,
        |    CAST(MAX(CASE WHEN event_type = 'click'  THEN 1 ELSE 0 END)
        |     + 2 * MAX(CASE WHEN event_type = 'error'  THEN 1 ELSE 0 END)
        |     + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
        |     + 8 * MAX(CASE WHEN event_type = 'view'   THEN 1 ELSE 0 END)
        |      AS BIGINT) AS mask
        |  FROM events GROUP BY user_id),
        |coal AS (
        |  SELECT mask, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(conv) AS BIGINT) AS c
        |  FROM users GROUP BY mask),
        |masks AS (SELECT CAST(unnest(generate_series(0, 15)) AS BIGINT)
        |  AS smask),
        |vs AS (
        |  SELECT m.smask,
        |    CASE WHEN COALESCE(SUM(t.n), 0) = 0 THEN 0
        |      ELSE CAST(COALESCE(SUM(t.c), 0) AS BIGINT) * 1000000
        |        // CAST(SUM(t.n) AS BIGINT) END AS v_ppm
        |  FROM masks m LEFT JOIN coal t ON (t.mask | m.smask) = m.smask
        |  GROUP BY m.smask),
        |chans AS (
        |  SELECT * FROM (VALUES ('click', CAST(1 AS BIGINT)),
        |    ('error', CAST(2 AS BIGINT)), ('signup', CAST(4 AS BIGINT)),
        |    ('view', CAST(8 AS BIGINT))) AS t(channel, bit)),
        |marg AS (
        |  SELECT ch.channel,
        |    CASE ((v0.smask & 1) + ((v0.smask >> 1) & 1)
        |        + ((v0.smask >> 2) & 1) + ((v0.smask >> 3) & 1))
        |      WHEN 0 THEN 6 WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END
        |      * (v1.v_ppm - v0.v_ppm) AS wd
        |  FROM chans ch
        |  JOIN vs v0 ON (v0.smask & ch.bit) = 0
        |  JOIN vs v1 ON v1.smask = (v0.smask | ch.bit))
        |SELECT channel, CAST(SUM(wd) AS BIGINT) // 24 AS phi_ppm
        |FROM marg GROUP BY channel ORDER BY channel""".stripMargin,

    "q_bot_detect" ->
      """WITH g AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(FLOOR(epoch(ts)) AS BIGINT)
        |      - lag(CAST(FLOOR(epoch(ts)) AS BIGINT))
        |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events),
        |users AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
        |    CAST(COUNT(gap) AS BIGINT) AS n_gaps,
        |    CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sg,
        |    CAST(COALESCE(SUM(gap * gap), 0) AS BIGINT) AS sgg
        |  FROM g GROUP BY user_id),
        |u2 AS (
        |  SELECT *, n_events * 1000 // active_days AS rate_milli,
        |    CASE WHEN n_gaps = 0 THEN NULL
        |      ELSE (n_gaps * sgg - sg * sg) // (n_gaps * n_gaps)
        |    END AS gap_var
        |  FROM users),
        |prof AS (
        |  SELECT CAST(SUM(rate_milli) AS BIGINT) // COUNT(*)
        |      AS mean_rate_milli,
        |    CAST(SUM(COALESCE(gap_var, 0)) AS BIGINT) // COUNT(*)
        |      AS mean_gap_var
        |  FROM u2),
        |v AS (
        |  SELECT u2.*,
        |    CASE WHEN u2.rate_milli > p.mean_rate_milli
        |      AND u2.gap_var IS NOT NULL
        |      AND u2.gap_var < p.mean_gap_var
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS is_bot
        |  FROM u2 CROSS JOIN prof p)
        |SELECT is_bot, COUNT(*) AS n_users,
        |  CAST(SUM(rate_milli) AS BIGINT) // COUNT(*) AS avg_rate_milli,
        |  CAST(SUM(COALESCE(gap_var, 0)) AS BIGINT) // COUNT(*) AS avg_gap_var
        |FROM v GROUP BY is_bot ORDER BY is_bot""".stripMargin,

    "q_simpson" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS score,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS np,
        |    user_id % 2 AS cohort
        |  FROM events GROUP BY user_id),
        |m AS (SELECT CAST(SUM(score) AS BIGINT) // COUNT(*) AS mean_score,
        |        CAST(SUM(np) AS BIGINT) // COUNT(*) AS mean_np
        |      FROM users),
        |h AS (
        |  SELECT cohort,
        |    CASE WHEN np > (SELECT mean_np FROM m)
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS conv,
        |    CASE WHEN score >= (SELECT mean_score FROM m)
        |      THEN 1 ELSE 0 END AS high
        |  FROM users),
        |r AS (
        |  SELECT cohort,
        |    CAST(SUM(CASE WHEN high = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_high,
        |    CAST(SUM(CASE WHEN high = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_low,
        |    CAST(SUM(CASE WHEN high = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_high,
        |    CAST(SUM(CASE WHEN high = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_low
        |  FROM h GROUP BY ROLLUP (cohort)),
        |s AS (
        |  SELECT CASE WHEN cohort IS NULL THEN 'all'
        |      ELSE 'cohort_' || CAST(cohort AS VARCHAR) END AS stratum,
        |    n_high, n_low, conv_high, conv_low,
        |    CASE WHEN n_high = 0 THEN NULL
        |      ELSE conv_high * 1000000 // n_high END AS rate_high_ppm,
        |    CASE WHEN n_low = 0 THEN NULL
        |      ELSE conv_low * 1000000 // n_low END AS rate_low_ppm,
        |    CASE WHEN n_high = 0 OR n_low = 0 THEN NULL
        |      ELSE conv_high * 1000000 // n_high
        |         - conv_low * 1000000 // n_low END AS gap_ppm
        |  FROM r)
        |SELECT stratum, n_high, n_low, conv_high, conv_low,
        |  rate_high_ppm, rate_low_ppm, gap_ppm,
        |  CASE WHEN gap_ppm IS NULL THEN NULL WHEN gap_ppm > 0 THEN 1
        |    WHEN gap_ppm < 0 THEN -1 ELSE 0 END AS sign
        |FROM s ORDER BY stratum""".stripMargin,

    "q_mediation" ->
      """WITH users AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS m,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS y,
        |    user_id % 2 AS t
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(m) AS BIGINT) AS sm,
        |    CAST(SUM(y) AS BIGINT) AS sy,
        |    CAST(SUM(t * t) AS BIGINT) AS stt,
        |    CAST(SUM(m * m) AS BIGINT) AS smm,
        |    CAST(SUM(t * m) AS BIGINT) AS stm,
        |    CAST(SUM(t * y) AS BIGINT) AS sty,
        |    CAST(SUM(m * y) AS BIGINT) AS smy
        |  FROM users),
        |c AS (
        |  SELECT n, n * stt - st * st AS ctt, n * smm - sm * sm AS cmm,
        |    n * stm - st * sm AS ctm, n * sty - st * sy AS cty,
        |    n * smy - sm * sy AS cmy
        |  FROM s),
        |k AS (
        |  SELECT n,
        |    CASE WHEN ctt = 0 THEN NULL
        |      ELSE ROUND(CAST(ctm AS DOUBLE) / ctt, 6) END AS a,
        |    CASE WHEN CAST(ctt AS DOUBLE) * cmm
        |        - CAST(ctm AS DOUBLE) * ctm = 0 THEN NULL
        |      ELSE ROUND((CAST(ctt AS DOUBLE) * cmy
        |          - CAST(ctm AS DOUBLE) * cty)
        |        / (CAST(ctt AS DOUBLE) * cmm - CAST(ctm AS DOUBLE) * ctm), 6)
        |    END AS b,
        |    CASE WHEN ctt = 0 THEN NULL
        |      ELSE ROUND(CAST(cty AS DOUBLE) / ctt, 6) END AS c
        |  FROM c)
        |SELECT n, a, b, c,
        |  CASE WHEN a IS NULL OR b IS NULL THEN NULL
        |    ELSE ROUND(a * b, 6) END AS indirect,
        |  CASE WHEN c IS NULL OR a IS NULL OR b IS NULL THEN NULL
        |    ELSE ROUND(c - a * b, 6) END AS direct
        |FROM k""".stripMargin)
}
