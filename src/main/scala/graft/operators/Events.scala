package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}

/** Event-time operators over the `events` table — the "continuously
  * arriving postings" extension (SURVEY §2.10: streaming absent from the
  * reference; these are the batch-equivalent plans, and
  * graft.streaming.StreamingJobs runs the same logic as a Structured
  * Streaming query with watermarks — equivalence is asserted by
  * StreamingSpec).
  *
  * `ts` normalizes to TimestampType via Tables.eventsWithTs whichever
  * way the testdata generation stores it (epoch-nanos INT64 or
  * timestamp[us] NTZ). Window starts group cleanly at scale: the
  * tumbling-window agg is a single hash aggregate on (bucket, type) —
  * partial map-side combine, no row explosion. */
object Events {

  /** q70: tumbling 1-hour event-time window aggregation (the Structured
    * Streaming windowed-agg shape, run as batch). */
  val q70EventWindow = GraftQuery(
    "q70_event_window",
    "streaming ext: tumbling window agg; A1,A3,F14",
    (s, d) =>
      Tables.eventsWithTs(s, d)
        .groupBy(
          window(col("ts"), "1 hour").getField("start").as("win_start"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("win_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS win_start, event_type,
        count(*) AS n, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q71: sessionization — gaps-and-islands with a 24-hour idle gap per
    * user (the synthetic per-user event cadence is ~11h, so a sub-hour gap
    * would make every event its own session) (lag + cumulative-sum window functions; the batch equivalent of
    * session_window / flatMapGroupsWithState custom state). */
  val q71Sessionize = GraftQuery(
    "q71_sessionize",
    "streaming ext: sessionization; T3 windows",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val ev = Tables.eventsWithTs(s, d)
        .select(col("user_id"), col("ts"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 86400, 1)
            .otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      ev.groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
            .as("duration_s"))
        .groupBy(col("user_id"))
        .agg(
          max(col("session_id")).as("n_sessions"),
          sum(col("n_events")).as("n_events"),
          round(avg(col("duration_s")), 2).as("avg_session_s"))
        .orderBy(col("user_id"))
    },
    Some("""WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch(ts) - epoch(lag(ts) OVER w) > 86400
               THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
          sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      per AS (
        SELECT user_id, session_id, count(*) AS n_events,
          CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sess GROUP BY 1, 2)
      SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
        CAST(sum(n_events) AS BIGINT) AS n_events,
        round(avg(duration_s), 2) AS avg_session_s
      FROM per GROUP BY 1 ORDER BY 1"""))

  /** q72: streaming-style exact dedup — first event per (user_id,
    * event_type) in event-time order (the dropDuplicates-with-watermark
    * semantic, run as batch with an explicit window). */
  val q72StreamDedup = GraftQuery(
    "q72_stream_dedup",
    "streaming ext: dropDuplicates semantics; D1",
    (s, d) =>
      Tables.eventsWithTs(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("event_type"))
            .orderBy(col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id"))
        .orderBy(col("user_id"), col("event_type")),
    Some("""SELECT user_id, event_type, event_id FROM (
        SELECT user_id, event_type, event_id,
          row_number() OVER (PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type"""))

  /** q73: nested-JSON column parsing (F15 made real — the reference only
    * ever *dropped* its stringified-list columns;
    * app/preprocess_data.py:108-117): events.props is a JSON object;
    * parse with an explicit schema, extract, aggregate. */
  val q73JsonProps = GraftQuery(
    "q73_json_props",
    "F15,from_json; nested column parse + agg",
    (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType)))).getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("k")).as("sum_k"),
          round(avg(col("k")), 4).as("avg_k"),
          countDistinct(col("k")).as("distinct_k"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, count(*) AS n,
        CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
        round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
        CAST(count(DISTINCT CAST(props->>'k' AS BIGINT)) AS BIGINT) AS distinct_k
      FROM events GROUP BY 1 ORDER BY 1"""))

  /** q74: multi-dimensional aggregate lattice — CUBE over (event_type,
    * hour-of-day) (SURVEY §2.5 note: cube/rollup declared in scope; q19
    * covers rollup, this covers the full lattice incl. cross-slices). */
  val q74Cube = GraftQuery(
    "q74_cube",
    "A-lattice: cube/grouping sets",
    (s, d) =>
      Tables.eventsWithTs(s, d)
        .select(col("event_type"), hour(col("ts")).as("hr"), col("value"))
        .cube(col("event_type"), col("hr"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("event_type").asc_nulls_first, col("hr").asc_nulls_first),
    Some("""SELECT event_type, hr, count(*) AS n, round(sum(value), 2) AS total
      FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hr, value FROM events)
      GROUP BY CUBE (event_type, hr)
      ORDER BY event_type ASC NULLS FIRST, hr ASC NULLS FIRST"""))

  /** q75: as-of join — each purchase matched to the user's most recent
    * view at-or-before it (left semantics: no prior view -> nulls).
    *
    * Spark has no ASOF JOIN operator; the naive encoding is a range
    * join (`p.user = v.user AND v.ts <= p.ts` + per-row max), which
    * Catalyst plans as an inner join exploding to all (purchase, earlier
    * view) pairs — quadratic per user. This plan is the scalable
    * union-tag + running-last window form: one shuffle on user_id, one
    * ordered pass, O(events) total. View side is pre-deduped to one row
    * per (user, ts) (keep max event_id) so ties are deterministic on
    * both engines; DuckDB's native ASOF LEFT JOIN is the oracle. */
  val q75AsofJoin = GraftQuery(
    "q75_asof_join",
    "as-of join (engine extension; union+window linear plan)",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("event_id"))
        .select(col("user_id"), col("ts"), col("event_id"), lit(0).as("tag"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionByName(purchases)
        .withColumn("view_id",
          last(when(col("tag") === 0, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("view_ts",
          last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("view_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("view_ts"))).as("gap_s"))
        .orderBy(col("purchase_id"))
    },
    Some("""WITH views AS (
        SELECT user_id, ts, max(event_id) AS event_id
        FROM events WHERE event_type = 'view' GROUP BY 1, 2),
      purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id,
        CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
      FROM purchases p ASOF LEFT JOIN views v
        ON p.user_id = v.user_id AND p.ts >= v.ts
      ORDER BY purchase_id"""))

  /** q79: ordered funnel — users progressing view -> click -> purchase,
    * each step strictly after the previous one (first qualifying event
    * per step). Three keyed min-aggregates chained by a per-user join:
    * one shuffle per step on user_id, no per-user event explosion — the
    * scalable form of the sequential-pattern question (a self-join on
    * all event pairs would be quadratic per user). */
  val q79Funnel = GraftQuery(
    "q79_funnel",
    "event-time funnel (sequential steps); A1,J-ext",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
        .select(col("user_id"), col("event_type"), col("ts"))
      val t1 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "click")
        .join(t1, Seq("user_id")).filter(col("ts") > col("t1"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, Seq("user_id")).filter(col("ts") > col("t2"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
      // total-user count rides along as a broadcast scalar row (no eager
      // driver-side count at plan build)
      val tot = ev.agg(countDistinct(col("user_id")).cast("double").as("tot"))
      def step(n: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .crossJoin(broadcast(tot))
          .select(lit(n).as("step"), lit(name).as("event_type"),
            col("n_users"), round(col("n_users") / col("tot"), 4).as("pct_of_users"))
      step(1, "view", t1)
        .unionByName(step(2, "click", t2))
        .unionByName(step(3, "purchase", t3))
        .orderBy(col("step"))
    },
    Some("""WITH t1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1),
      t2 AS (
        SELECT e.user_id, min(e.ts) AS t2 FROM events e
        JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        WHERE e.event_type = 'click' GROUP BY 1),
      t3 AS (
        SELECT e.user_id, min(e.ts) AS t3 FROM events e
        JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        WHERE e.event_type = 'purchase' GROUP BY 1),
      tot AS (SELECT count(DISTINCT user_id)::DOUBLE AS n FROM events)
      SELECT 1 AS step, 'view' AS event_type, CAST(count(*) AS BIGINT) AS n_users,
        round(count(*) / (SELECT n FROM tot), 4) AS pct_of_users FROM t1
      UNION ALL
      SELECT 2, 'click', CAST(count(*) AS BIGINT),
        round(count(*) / (SELECT n FROM tot), 4) FROM t2
      UNION ALL
      SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
        round(count(*) / (SELECT n FROM tot), 4) FROM t3
      ORDER BY step"""))

  /** q89: rolling statistics — per-user moving average/count of event
    * value over the trailing 5 events (ROWS frame, deterministic
    * (ts, event_id) order). One shuffle on user_id, then a bounded-frame
    * sliding aggregate per partition — state is 5 rows regardless of
    * history length, so the plan is identical at 10^10 events (the
    * streaming twin is a sliding window agg). */
  val q89RollingStats = GraftQuery(
    "q89_rolling_stats",
    "T-ext: bounded-frame sliding window; A5",
    (s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, 0)
      Tables.eventsWithTs(s, d)
        .select(
          col("user_id"), col("event_id"),
          round(avg(col("value")).over(w), 4).as("roll_avg"),
          count(lit(1)).over(w).as("roll_n"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS roll_avg,
      count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_n
      FROM events ORDER BY user_id, event_id"""))

  /** q94: cohort retention — users grouped by first-activity week, active
    * users per (cohort_week, weeks-since-cohort) cell. Two hash
    * aggregates (per-user min, then per-cell distinct count) — both
    * partial-aggregatable, output bounded by weeks², independent of event
    * count. Week trunc starts Monday in both engines; the week offset is
    * day-difference/7 so it doesn't depend on either engine's
    * week-boundary arithmetic. */
  val q94CohortRetention = GraftQuery(
    "q94_cohort_retention",
    "A-ext: cohort/retention matrix; F14",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(to_date(date_trunc("week", min(col("day")))).as("cohort_week"))
      ev.join(cohort, Seq("user_id"))
        .select(col("user_id"), col("cohort_week"),
          floor(datediff(col("day"), col("cohort_week")) / 7).as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""WITH ev AS (
        SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      cohort AS (
        SELECT user_id, CAST(date_trunc('week', min(day)) AS DATE) AS cohort_week
        FROM ev GROUP BY 1)
      SELECT cohort_week,
        CAST(floor(date_diff('day', cohort_week, day) / 7.0) AS BIGINT) AS week_offset,
        count(DISTINCT ev.user_id) AS n_active
      FROM ev JOIN cohort ON ev.user_id = cohort.user_id
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q96: interval join — purchases attributed to every view by the same
    * user in the preceding 24 h (the attribution-window shape). Batch
    * twin of the STREAM-STREAM interval join
    * (StreamingJobs.runStreamingIntervalJoin; equivalence asserted by
    * StreamingSpec). The plan is an equi-join on user_id with the time
    * bound as a post-filter — per-user fan-out is bounded by activity in
    * the window, and in the streaming form the same bound is what lets
    * the watermark expire join state. */
  val q96IntervalJoin = GraftQuery(
    "q96_interval_join",
    "streaming ext: stream-stream interval join (batch twin); J-ext",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      views.join(buys, Seq("user_id"))
        .filter(col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts")))
            .as("gap_s"))
        .orderBy(col("view_id"), col("purchase_id"))
    },
    Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
      FROM events v JOIN events p
        ON v.user_id = p.user_id
        AND v.event_type = 'view' AND p.event_type = 'purchase'
        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
      ORDER BY view_id, purchase_id"""))

  /** q123: LEFT OUTER interval join — every view with its attributed
    * purchases, or NULL purchase columns when none followed within 24 h
    * (the "unconverted views" report the inner q96 cannot express).
    * Batch twin of StreamingJobs.runStreamingIntervalJoinLeftOuter;
    * StreamingSpec asserts the streamed result equals this plan after
    * the watermark closes. The join key is still user equality — the
    * time bound rides in the join condition (NOT a post-filter, which
    * would silently turn left-outer back into inner for late windows). */
  val q123LeftOuterAttrib = GraftQuery(
    "q123_leftouter_attrib",
    "streaming ext: LEFT-OUTER stream-stream interval join (batch twin); J-ext",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      views.join(buys,
          col("user_id") === col("p_user") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"),
          "left_outer")
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts")))
            .as("gap_s"))
        .orderBy(col("view_id"), col("purchase_id"))
    },
    Some("""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
      CAST(floor(epoch(p.ts)) AS BIGINT) - CAST(floor(epoch(v.ts)) AS BIGINT) AS gap_s
      FROM events v LEFT JOIN events p
        ON v.user_id = p.user_id
        AND p.event_type = 'purchase'
        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
      WHERE v.event_type = 'view'
      ORDER BY view_id, purchase_id"""))

  /** q125: FULL OUTER interval join — q123's unconverted views AND the
    * orphan purchases no same-user view preceded within 24 h, in one
    * relation (the complete attribution audit: every view and every
    * purchase accounted for exactly once, matched or null-extended).
    * Batch twin of StreamingJobs.runStreamingIntervalJoinFullOuter;
    * with q96/q123 this completes the stream-stream join-mode matrix.
    * user_id is coalesced across the two sides so no row loses its key
    * to null extension. */
  val q125FullOuterAttrib = GraftQuery(
    "q125_fullouter_attrib",
    "streaming ext: FULL-OUTER stream-stream interval join (batch twin); J-ext",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      views.join(buys,
          col("user_id") === col("p_user") &&
          col("purchase_ts") > col("view_ts") &&
          col("purchase_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"),
          "full_outer")
        .select(coalesce(col("user_id"), col("p_user")).as("user_id"),
          col("view_id"), col("purchase_id"),
          (unix_timestamp(col("purchase_ts")) - unix_timestamp(col("view_ts")))
            .as("gap_s"))
        .orderBy(col("view_id"), col("purchase_id"))
    },
    Some("""WITH v AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase')
      SELECT coalesce(v.user_id, p.p_user) AS user_id,
        v.view_id, p.purchase_id,
        CAST(floor(epoch(p.purchase_ts)) AS BIGINT)
          - CAST(floor(epoch(v.view_ts)) AS BIGINT) AS gap_s
      FROM v FULL JOIN p
        ON v.user_id = p.p_user
        AND p.purchase_ts > v.view_ts
        AND p.purchase_ts <= v.view_ts + INTERVAL 24 HOUR
      ORDER BY view_id, purchase_id"""))

  /** q137: first-order event-transition matrix — for each ordered pair
    * (from_type, to_type) of CONSECUTIVE events by the same user, the
    * transition count and mean gap: the Markov-chain counts behind
    * next-action models and session anomaly detection. One shuffle
    * total: both window expressions (lead of type, lead of ts) share the
    * (user_id; ts, event_id) partitioning+sort, and the downstream
    * aggregate's state is O(|event types|²), map-side combined. The tie
    * break on event_id makes lead() deterministic under equal
    * timestamps — without it the oracle comparison would be flaky by
    * construction. Mean gap is spelled sum/count over exact BIGINT
    * second-gaps (not avg()) so both engines divide the same two exact
    * integers — no accumulation-order drift. */
  val q137EventTransitions = GraftQuery(
    "q137_event_transitions",
    "streaming ext: first-order transition matrix (lead window + agg)",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.eventsWithTs(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .withColumn("gap_s",
          unix_timestamp(lead(col("ts"), 1).over(byUser)) - unix_timestamp(col("ts")))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("gap_s")).cast("double") / count(lit(1)), 2)
            .as("mean_gap_s"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH seq AS (
        SELECT event_type AS from_type,
          lead(event_type) OVER w AS to_type,
          CAST(floor(epoch(lead(ts) OVER w)) AS BIGINT)
            - CAST(floor(epoch(ts)) AS BIGINT) AS gap_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT from_type, to_type, count(*) AS n,
        round(CAST(sum(gap_s) AS DOUBLE) / count(*), 2) AS mean_gap_s
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** q146: time-series resample + forward fill — the gap-repair shape
    * every downstream rolling/as-of computation assumes: a dense hourly
    * spine (distinct types × generated hour range, both tiny relations
    * built from one bounds aggregate — never a driver-side loop) LEFT
    * joins the hourly sums, and missing hours inherit the last observed
    * value via last(_, ignoreNulls) over a per-type ordered window,
    * flagged `was_gap` so imputation stays auditable. Hours before a
    * type's first observation remain NULL — forward fill only, no
    * invented history. The per-type window is the honest small-N form;
    * at 100 TB cardinalities the partition becomes (type, day) with a
    * per-day carry-in merged exactly like q144's bucketed prefix-max
    * (same decomposition, max → last-non-null). */
  val q146ResampleFfill = GraftQuery(
    "q146_resample_ffill",
    "timeseries ext: dense resample + audited forward fill",
    (s, d) => {
      val ev = Tables.eventsWithTs(s, d)
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
          col("value"))
      val hours = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("h"))
      val types = ev.select(col("event_type")).distinct()
      val hourly = ev.groupBy(col("h"), col("event_type"))
        .agg(round(sum(col("value")), 2).as("v"))
      val byType = Window.partitionBy(col("event_type")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hours.crossJoin(types)
        .join(hourly, Seq("h", "event_type"), "left")
        .select(col("event_type"), col("h"),
          last(col("v"), ignoreNulls = true).over(byType).as("filled"),
          col("v").isNull.cast("int").as("was_gap"))
        .orderBy(col("event_type"), col("h"))
    },
    Some("""WITH b AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
          date_trunc('hour', max(ts)) AS hi FROM events),
      hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM b),
      types AS (SELECT DISTINCT event_type FROM events),
      a AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
          round(sum(value), 2) AS v
        FROM events GROUP BY 1, 2)
      SELECT s.event_type, s.h,
        last_value(a.v IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        CAST(a.v IS NULL AS INT) AS was_gap
      FROM (SELECT h, event_type FROM hours CROSS JOIN types) s
      LEFT JOIN a ON s.h = a.h AND s.event_type = a.event_type
      ORDER BY 1, 2"""))

  /** q152: interval union ("gaps and islands") — each event opens a
    * 30-minute activity interval; per user, merge every overlapping
    * interval chain into islands and report island count + total covered
    * seconds. The classic span-coverage operator (ad attribution windows,
    * crawler politeness windows, GPU-occupancy accounting) that naive
    * summing double-counts. One pass: a running max(end) over preceding
    * rows marks island starts (strictly-after ⇒ new island), a running
    * sum of the marks numbers islands, then two bounded aggregates.
    * Shuffle = one window per user (parallel across users, the q71/q89
    * shape); all arithmetic is integer epoch-seconds, so the oracle
    * replays it exactly. */
  val q152IntervalUnion = GraftQuery(
    "q152_interval_union",
    "Event-time ext: gaps-and-islands interval union / coverage",
    (s, d) => {
      val sess = 1800L
      val ev = Tables.eventsWithTs(s, d)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("st"))
        .withColumn("en", col("st") + sess)
      val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
      val prevMaxEnd = max(col("en"))
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
      ev
        .withColumn("ni",
          when(prevMaxEnd.isNull || col("st") > prevMaxEnd, 1L).otherwise(0L))
        .withColumn("island",
          sum(col("ni")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ien") - col("ist")).as("covered_s"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ev AS (
        SELECT user_id, event_id,
          CAST(floor(epoch(ts)) AS BIGINT) AS st,
          CAST(floor(epoch(ts)) AS BIGINT) + 1800 AS en
        FROM events),
      m AS (
        SELECT user_id, event_id, st, en,
          CASE WHEN max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
            OR st > max(en) OVER (PARTITION BY user_id ORDER BY st, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          THEN 1 ELSE 0 END AS ni
        FROM ev),
      isl AS (
        SELECT user_id, st, en,
          sum(ni) OVER (PARTITION BY user_id ORDER BY st, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM m),
      per_island AS (
        SELECT user_id, island, min(st) AS ist, max(en) AS ien
        FROM isl GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_islands,
        CAST(sum(ien - ist) AS BIGINT) AS covered_s
      FROM per_island GROUP BY user_id ORDER BY user_id"""))

  def queries: Seq[GraftQuery] = Seq(
    q70EventWindow, q71Sessionize, q72StreamDedup, q73JsonProps, q74Cube,
    q75AsofJoin, q79Funnel, q89RollingStats, q94CohortRetention,
    q96IntervalJoin, q123LeftOuterAttrib, q125FullOuterAttrib,
    q137EventTransitions, q146ResampleFfill, q152IntervalUnion)
}
