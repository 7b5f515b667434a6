package graft.operators

import graft.core.Materialize.MatOps
import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over the `events` table (batch form; the same
  * plans run under Structured Streaming — see graft.streaming).
  *
  * The reference has no time/stream concept at all (SURVEY §2.9), so this
  * whole family is extension surface. Timestamps arrive canonicalized to
  * TimestampType by Tables.canonicalTs whatever the parquet encoding; every
  * output renders times as strings so the oracle compare is
  * timezone-representation-proof.
  *
  * Scale notes: e01/e03 are single-shuffle hash aggregates on bounded
  * keys. e02's sessionization is the standard lag→flag→running-sum, all
  * inside one window partition per user — the shuffle is by user_id, and
  * skewed power-users are exactly what AQE skew-join/partition-split
  * handles.
  */
object EventOps {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "events")

  // ---------------------------------------------------------------- e01
  /** Hourly tumbling aggregate per event type. */
  val e01 = Q("e01_hourly_agg",
    (s, dir) =>
      ev(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_s"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
        .orderBy("hour_s", "event_type"),
    Some("""
      SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS hour_s,
             event_type, count(*) AS n, round(sum(value), 2) AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_s, event_type"""))

  // ---------------------------------------------------------------- e02
  /** Gap-based sessionization (new session after > 30 min idle):
    * lag → boundary flag → running sum = session index → per-session agg. */
  val e02 = Q("e02_sessionize",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, dir)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_idx", sum("new_sess").over(runSum))
        .groupBy("user_id", "session_idx")
        .agg(
          count(lit(1)).as("n_events"),
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))).as("duration_us"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("start_s"))
        // sampling-pass guard (see d02): there is NO exchange between the
        // window chain and the final sort — the groupBy reuses the
        // window's user_id partitioning — so the RangePartitioning
        // sampling pass re-ran the lag→flag→running-sum chain a second
        // time. Parking the session aggregate in cheap blocks makes the
        // sample a re-read (r17; the same guard every heavy pair query
        // carries).
        .materialize
        .orderBy("user_id", "session_idx")
    },
    Some("""
      WITH t AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               lag(CAST(ts AS TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM t),
      sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM f)
      SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
             count(*) AS n_events,
             CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS duration_us,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_s
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""),
    headline = true)

  // ---------------------------------------------------------------- e03
  /** Semi-structured extraction: pull the numeric `k` out of the JSON
    * props string with a regex (codegen-friendly; no JSON parser UDF). */
  val e03 = Q("e03_props_extract",
    (s, dir) =>
      ev(s, dir)
        .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
        .groupBy("event_type")
        // avg of a BIGINT is an integer rational Σk/n — exact integer
        // round-half-up at 4 digits (the q33/t04 knife-edge class, r14)
        .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sk"))
        .withColumn("avg_k",
          when(col("n_with_k") === 0L, lit(null).cast("double"))
            .otherwise(expr(ExactRound.spark("sk", "n_with_k", 4))))
        .select(col("event_type"), col("n_with_k"), col("avg_k"))
        .orderBy("event_type"),
    Some(s"""
      WITH t AS (
        SELECT event_type,
               count(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS n_with_k,
               sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS sk
        FROM events
        GROUP BY event_type)
      SELECT event_type, n_with_k,
             CASE WHEN n_with_k = 0 THEN NULL
                  ELSE ${ExactRound.duck("sk", "n_with_k", 4)}
             END AS avg_k
      FROM t
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- e04
  /** Conversion funnel: users whose first purchase follows their first
    * signup, with median-free time-to-convert stats (avg, for oracle
    * stability). */
  val e04 = Q("e04_funnel",
    (s, dir) => {
      val e = ev(s, dir)
      val firstByType = (t: String, name: String) =>
        e.filter(col("event_type") === t)
          .groupBy("user_id").agg(min(unix_micros(col("ts"))).as(name))
      val su = firstByType("signup", "su_us")
      val pu = firstByType("purchase", "pu_us")
      // the converted-delta average is Σµs/(10⁶·n) — an integer
      // rational that can land exactly on a hundredth-and-a-half —
      // exact integer round-half-up (the q33/t04 knife-edge class, r14)
      su.join(pu, Seq("user_id"), "left_outer")
        .agg(
          count(lit(1)).as("n_signup_users"),
          count(when(col("pu_us") > col("su_us"), 1)).as("n_converted"),
          sum(when(col("pu_us") > col("su_us"),
            col("pu_us") - col("su_us"))).as("sum_us"))
        .withColumn("avg_convert_sec",
          when(col("n_converted") === 0L, lit(null).cast("double"))
            .otherwise(expr(
              ExactRound.spark("sum_us", "n_converted*1000000", 2))))
        .select(col("n_signup_users"), col("n_converted"),
          col("avg_convert_sec"))
    },
    Some(s"""
      WITH su AS (
        SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS su_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
      pu AS (
        SELECT user_id, min(epoch_us(CAST(ts AS TIMESTAMP))) AS pu_us
        FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      SELECT count(*) AS n_signup_users,
             count(CASE WHEN pu_us > su_us THEN 1 END) AS n_converted,
             CASE WHEN count(CASE WHEN pu_us > su_us THEN 1 END) = 0
                  THEN NULL
                  ELSE ${ExactRound.duck(
                    "sum(CASE WHEN pu_us > su_us THEN pu_us - su_us END)",
                    "count(CASE WHEN pu_us > su_us THEN 1 END)*1000000", 2)}
             END AS avg_convert_sec
      FROM su LEFT JOIN pu USING (user_id)"""))

  // ---------------------------------------------------------------- e05
  /** As-of join: each purchase matched to the user's most recent click at
    * or before it. Composed from built-ins (SURVEY §7.3 preference (a)):
    * union both sides, one pass of `last(_, ignoreNulls)` over a
    * (user, time) window — a single shuffle by user, no range-join
    * explosion, which is exactly how it scales. Oracle: DuckDB's native
    * ASOF JOIN. Clicks are deduped to one per (user, ts) so tie semantics
    * are well-defined in both engines. */
  val e05 = Q("e05_asof_join",
    (s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
        .select(col("user_id"), col("ts"), col("click_id"), lit(0).as("kind"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          lit(1).as("kind"))
      // kind orders click before purchase at equal ts → ts >= semantics
      val w = Window.partitionBy("user_id").orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(purchases)
        .withColumn("matched_click",
          last(when(col("kind") === 0, col("click_id")), ignoreNulls = true).over(w))
        .filter(col("kind") === 1 && col("matched_click").isNotNull)
        .select(col("click_id").as("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("matched_click"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             c.click_id AS matched_click
      FROM purchases p
      ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- e06
  /** The same as-of join as e05, through the NATIVE operator
    * (graft.plans.AsOfJoin → AsOfJoinStrategy → AsOfJoinExec): custom
    * LogicalPlan planned by an injected SparkStrategy into a co-partitioned
    * (key, time)-sorted one-pass merge. Same DuckDB ASOF oracle as e05, so
    * the driver gate checks the custom physical operator end to end. */
  val e06 = Q("e06_asof_native",
    (s, dir) => {
      val (purchases, clicks) = asofFrames(s, dir)
      graft.plans.AsOf.join(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user_id",
          leftTime = "ts", rightTime = "c_ts")
        .filter(col("click_id").isNotNull)
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id").as("matched_click"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             c.click_id AS matched_click
      FROM purchases p
      ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- e25
  /** Tolerance-bounded as-of: each purchase matched to the latest click
    * at or before it ONLY if that click is within 30 minutes — pandas
    * merge_asof's `tolerance`, the attribution-window variant of e06. A
    * stale match is worse than no match for attribution, which is why
    * the contract nulls it rather than keeping it. Runs on the same
    * native one-pass merge (AsOfJoinExec): the bound is applied after
    * direction resolution, so it adds zero cost and no plan change.
    * Oracle = DuckDB ASOF LEFT JOIN with the same window applied as a
    * post-condition (provably identical: backward-with-tolerance is
    * exactly "backward, then null if too far"). */
  val e25 = Q("e25_asof_tolerance",
    (s, dir) => {
      val (purchases, clicks) = asofFrames(s, dir)
      graft.plans.AsOf.join(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user_id",
          leftTime = "ts", rightTime = "c_ts",
          direction = "backward", tolerance = Some(30 * 60 * 1e6))
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id").as("matched_click"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 30 MINUTE
                  THEN c.click_id END AS matched_click
      FROM purchases p
      ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- e07
  /** Time-series gap filling (resample-to-hourly with zero-fill): the
    * dense hour × event_type grid left-joined to the observed hourly
    * counts — the "regularize before feature extraction" step of any
    * time-series pipeline.
    *
    * The dense axis is generated with `sequence()` from a broadcast 1-row
    * (min, max) aggregate — executor-side fan-out, no driver loop, no
    * collect. Grid size = hours × types is bounded (time-range × small
    * key set), so the left join broadcasts the grid at any corpus scale
    * where the grid itself stays small; flip to a shuffle join when the
    * key set is unbounded. */
  val e07 = Q("e07_gap_fill",
    (s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val bounds = ev(s, dir)
        .agg(date_trunc("hour", min("ts")).as("lo"), date_trunc("hour", max("ts")).as("hi"))
      val grid = broadcast(bounds)
        .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
        .crossJoin(ev(s, dir).select("event_type").distinct())
      grid.join(hourly, Seq("hour", "event_type"), "left")
        .select(date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour_s"),
          col("event_type"), coalesce(col("n"), lit(0L)).as("n"))
        .orderBy("hour_s", "event_type")
    },
    Some("""
      WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      bounds AS (
        SELECT date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS lo,
               date_trunc('hour', max(CAST(ts AS TIMESTAMP))) AS hi
        FROM events),
      grid AS (
        SELECT g.hour, t.event_type
        FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM bounds) g,
             (SELECT DISTINCT event_type FROM events) t)
      SELECT strftime(grid.hour, '%Y-%m-%d %H:%M') AS hour_s,
             grid.event_type AS event_type, coalesce(hourly.n, 0) AS n
      FROM grid LEFT JOIN hourly
        ON grid.hour = hourly.hour AND grid.event_type = hourly.event_type
      ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- e08
  /** Cohort retention: users grouped by first-seen day, counted on each
    * later activity day — the classic retention triangle. Two bounded
    * aggregates (first-seen per user, then distinct users per
    * (cohort, offset) cell); the user-day dedup is the only wide state
    * and it shuffles pre-aggregated (user, day) pairs, not raw events. */
  val e08 = Q("e08_cohort_retention",
    (s, dir) => {
      val byUser = ev(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = byUser.groupBy("user_id")
        .agg(min("day").as("cohort_day"))
      byUser.distinct()
        .join(firstSeen, "user_id")
        .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort", "day_offset")
    },
    Some("""
      WITH by_user AS (
        SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events),
      first_seen AS (
        SELECT user_id, min(day) AS cohort_day FROM by_user GROUP BY user_id)
      SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
             CAST(day - cohort_day AS BIGINT) AS day_offset,
             count(DISTINCT b.user_id) AS n_users
      FROM by_user b JOIN first_seen USING (user_id)
      GROUP BY 1, 2
      ORDER BY cohort, day_offset"""))

  // ---------------------------------------------------------------- e09
  /** Sessionization via Spark's NATIVE `session_window` aggregate — the
    * operator-level twin of e02's hand-rolled gaps-and-islands window.
    * One hash aggregate with in-memory session merging per group, no
    * lag/running-sum window pair, and the identical formulation carries
    * to Structured Streaming unchanged (EventStreams sessionizes the
    * same way with watermarks). Window end = last event + gap, and an
    * event EXACTLY 30:00 after its predecessor still merges into the
    * session (a new one starts only when the gap is strictly exceeded —
    * pinned against constructed boundary data in EventOpsSpec, since
    * the real corpus never lands on the exact boundary and the oracle
    * alone cannot see the convention). */
  val e09 = Q("e09_session_window_native",
    (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("sw.start"), "yyyy-MM-dd HH:mm:ss").as("sess_start"),
          date_format(col("sw.end"), "yyyy-MM-dd HH:mm:ss").as("sess_end"),
          col("n_events"))
        .orderBy("user_id", "sess_start"),
    Some("""
      WITH t AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               lag(CAST(ts AS TIMESTAMP)) OVER
                 (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        FROM events),
      f AS (
        SELECT user_id, ts,
               CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM t),
      sess AS (
        SELECT user_id, ts,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM f)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
             strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS sess_end,
             count(*) AS n_events
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, sess_start"""))

  // ---------------------------------------------------------------- e10
  /** Structured JSON parsing with `from_json` — the schema-full parser
    * (codegen'd Jackson, one parse per row, all fields in one pass)
    * where e03's regex extraction is the schema-free probe. At 100 TB
    * the difference matters: from_json amortizes one parse across every
    * extracted field and fails typed (null on malformed) instead of
    * silently matching garbage. */
  val e10 = Q("e10_json_parse_native",
    (s, dir) =>
      ev(s, dir)
        .select(expr("from_json(props, 'k INT').k").as("k"))
        .groupBy(pmod(col("k"), lit(10)).cast("long").as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
        .orderBy("k_bucket"),
    Some("""
      WITH t AS (
        SELECT CAST(json_extract(props, '$.k') AS INT) AS k FROM events)
      SELECT CAST(k % 10 AS BIGINT) AS k_bucket,
             count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
      FROM t
      GROUP BY k_bucket
      ORDER BY k_bucket"""))

  // ---------------------------------------------------------------- e11
  /** Hourly volume anomaly detection: flag (event_type, hour) cells
    * whose count is ≥ 2 sample standard deviations from that type's
    * hourly mean — the monitoring primitive run over ingest telemetry
    * (traffic spikes, dead sources) before a batch is trusted.
    *
    * The variance is computed from exact integer power sums
    * (Σn, Σn²) rather than a stddev aggregate: Spark and DuckDB
    * implement stddev with different update algorithms whose last-ulp
    * outputs differ, which would make a knife-edge |z| ≥ 2 flip between
    * engines — power sums of BIGINTs are exact, so every double below
    * derives from identical integers through identical IEEE ops and
    * the threshold comparison cannot flake.
    *
    * Scale shape: two partial-agg shuffles, both on bounded key spaces
    * ((type, hour), then type); the stats side is #types rows and
    * broadcasts back onto the hourly frame. */
  val e11 = Q("e11_hourly_anomaly",
    (s, dir) => {
      // bounded at #types × #hours; materialized once so the event scan
      // behind it runs once for its two consumers (stats + the join)
      val hourly = ev(s, dir)
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm")
            .as("hour_s"))
        .agg(count(lit(1)).as("n"))
        .materialize
      val stats = hourly.groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("n").as("s1"),
          sum(col("n") * col("n")).as("s2"))
      val cntD = col("cnt").cast("double")
      val s1D = col("s1").cast("double")
      val s2D = col("s2").cast("double")
      hourly.join(broadcast(stats), "event_type")
        // cnt > 1 BEFORE the variance: a type with one hourly bucket
        // yields 0.0/0.0 = NaN, and Spark's NaN ordering makes both
        // `variance > 0` and `|z| >= 2` true while DuckDB's handling
        // differs — the exact cross-engine flake the power-sum design
        // exists to prevent
        .filter(col("cnt") > 1)
        .withColumn("mean", s1D / cntD)
        .withColumn("variance", (s2D - s1D * s1D / cntD) / (cntD - 1.0))
        .filter(col("variance") > 0.0)
        .withColumn("z", (col("n").cast("double") - col("mean")) /
          sqrt(col("variance")))
        .filter(abs(col("z")) >= 2.0)
        .select(col("event_type"), col("hour_s"), col("n"),
          round(col("z"), 4).as("z"))
        .orderBy("event_type", "hour_s")
    },
    Some("""
      WITH hourly AS (
        SELECT event_type,
               strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                 '%Y-%m-%d %H:%M') AS hour_s,
               count(*) AS n
        FROM events
        GROUP BY 1, 2),
      stats AS (
        SELECT event_type, count(*) AS cnt,
               CAST(sum(n) AS BIGINT) AS s1,
               CAST(sum(n * n) AS BIGINT) AS s2
        FROM hourly
        GROUP BY event_type),
      z AS (
        SELECT h.event_type, h.hour_s, h.n,
               (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1.0)
                 AS variance,
               CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE) AS mean
        FROM hourly h JOIN stats s ON h.event_type = s.event_type
        WHERE cnt > 1)
      SELECT event_type, hour_s, n,
             round((CAST(n AS DOUBLE) - mean) / sqrt(variance), 4) AS z
      FROM z
      WHERE variance > 0.0
        AND abs((CAST(n AS DOUBLE) - mean) / sqrt(variance)) >= 2.0
      ORDER BY event_type, hour_s"""))

  // ---------------------------------------------------------------- e12
  /** Multi-touch attribution: credit each purchase to the user's FIRST
    * and LAST non-purchase touchpoint at-or-before it, then roll revenue
    * up by (first_touch, last_touch) — both classic attribution models
    * from one pass. Purchases with no prior touch credit 'direct'.
    *
    * Scale shape: ONE window shuffle partitioned by user (running
    * ignore-nulls first/last over the per-user timeline — bounded by a
    * user's event count, embarrassingly parallel across users), then a
    * #types² partial agg. Ties at equal micros break by event_id in
    * both engines. */
  val e12 = Q("e12_attribution",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touch = when(col("event_type") =!= "purchase", col("event_type"))
      ev(s, dir)
        .withColumn("ft", first(touch, ignoreNulls = true).over(w))
        .withColumn("lt", last(touch, ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(coalesce(col("ft"), lit("direct")).as("first_touch"),
          coalesce(col("lt"), lit("direct")).as("last_touch"), col("value"))
        .groupBy("first_touch", "last_touch")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 2).as("revenue"))
        .orderBy("first_touch", "last_touch")
    },
    Some("""
      WITH e AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
               event_type, value
        FROM events),
      t AS (
        SELECT event_type, value,
               first_value(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                 OVER w AS ft,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                 OVER w AS lt
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT coalesce(ft, 'direct') AS first_touch,
             coalesce(lt, 'direct') AS last_touch,
             count(*) AS n_purchases, round(sum(value), 2) AS revenue
      FROM t
      WHERE event_type = 'purchase'
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- e13
  /** Rolling 7-day distinct active users per day — the sliding-distinct
    * aggregate that is notoriously expensive at scale because DISTINCT
    * does not decompose across overlapping windows.
    *
    * Scale shape, no range join and no per-window re-scan: dedup to
    * (day, user) once (key space = days × active users, combiner-
    * friendly), EXPLODE each such row into the ≤7 window-end days it
    * contributes to (a constant ×7 map-side expansion — sequence +
    * explode in expression space), and count distinct users per end
    * day. The trailing semi-join against observed days just drops
    * phantom window-ends past the data's horizon (broadcast, #days
    * rows). Every shuffle is keyed by day; nothing is quadratic. */
  val e13 = Q("e13_rolling_active",
    (s, dir) => {
      val du = ev(s, dir)
        .select(to_date(col("ts")).as("eday"), col("user_id"))
        .distinct()
        .materialize // feeds the explode AND the day list
      val days = du.select(col("eday").as("day")).distinct()
      du.select(explode(expr("sequence(eday, date_add(eday, 6))")).as("day"),
          col("user_id"))
        .join(broadcast(days), Seq("day"))
        .groupBy("day")
        .agg(countDistinct("user_id").as("active_users_7d"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("active_users_7d"))
        .orderBy("day")
    },
    Some("""
      WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS eday, user_id FROM events),
      days AS (SELECT DISTINCT eday AS day FROM du)
      SELECT strftime(d.day, '%Y-%m-%d') AS day,
             count(DISTINCT u.user_id) AS active_users_7d
      FROM days d JOIN du u ON u.eday BETWEEN d.day - 6 AND d.day
      GROUP BY d.day
      ORDER BY day"""))

  // ---------------------------------------------------------------- e14
  /** N-step strictly-ordered conversion funnel (signup → view → click →
    * purchase) with a 24 h per-step conversion window: step k counts only
    * events strictly after the event that satisfied step k-1 AND within
    * 24 h of it — the standard product-analytics greedy semantics (each
    * step binds to the EARLIEST qualifying event; the funnel never
    * backtracks). The one-pass fold and the chained-min formulation
    * compute the same greedy recurrence, so they agree exactly; the spec
    * pins that equivalence on generated data, and the oracle uses the
    * chained form because DuckDB lacks the fold.
    *
    * Scale shape: ONE shuffle keyed by user_id; the per-user event list
    * folds through `aggregate` entirely in expression space (state =
    * struct(deepest step, micros of the event that reached it)). The
    * naive formulation is k chained self-join+agg passes over the events
    * table — k shuffles of the full fact — which this collapses into
    * one. Per-user event lists are bounded by session volume; a
    * pathological power-user is a skewed group, not a skewed join, so
    * AQE partition-split covers it. Ties in `ts` are broken by event_id
    * in both engines (sort_array on the (us, eid, type) struct vs
    * ORDER BY ts, event_id). */
  val e14 = Q("e14_strict_funnel",
    (s, dir) => {
      val steps = Seq("signup", "view", "click", "purchase")
      val windowUs = 24L * 3600 * 1000000
      val stepsArr = array(steps.map(lit): _*)
      val zero = struct(lit(0).as("d"), lit(0L).as("us"))
      val depth = ev(s, dir)
        .filter(col("event_type").isin(steps: _*))
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("us"), col("event_id").as("eid"),
            col("event_type").as("et")).as("e"))
        .groupBy("user_id")
        .agg(aggregate(sort_array(collect_list(col("e"))), zero,
          (st, e) => {
            val d = st.getField("d")
            val advance = d < lit(steps.length) &&
              e.getField("et") === element_at(stepsArr, d + 1) &&
              (d === 0 || e.getField("us") - st.getField("us") <= windowUs)
            when(advance,
              struct((d + 1).as("d"), e.getField("us").as("us")))
              .otherwise(struct(d.as("d"), st.getField("us").as("us")))
          },
          st => st.getField("d")).as("depth"))
      depth.agg(
          count(when(col("depth") >= 1, 1)).as("n1"),
          count(when(col("depth") >= 2, 1)).as("n2"),
          count(when(col("depth") >= 3, 1)).as("n3"),
          count(when(col("depth") >= 4, 1)).as("n4"))
        .select(expr(
          """stack(4, 1, 'signup', n1, 2, 'view', n2,
                      3, 'click', n3, 4, 'purchase', n4)
             AS (step_idx, step, n_users)"""))
        .orderBy("step_idx")
    },
    Some("""
      WITH f AS (
        SELECT user_id, event_type AS et,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id) AS ord
        FROM events
        WHERE event_type IN ('signup', 'view', 'click', 'purchase')),
      s1 AS (SELECT user_id, min(ord) AS o FROM f
             WHERE et = 'signup' GROUP BY user_id),
      s1u AS (SELECT f.user_id, f.us AS pus, f.ord AS pord
              FROM f JOIN s1 ON f.user_id = s1.user_id AND f.ord = s1.o),
      s2 AS (SELECT f.user_id, min(f.ord) AS o FROM f JOIN s1u USING (user_id)
             WHERE et = 'view' AND f.ord > pord
               AND f.us - pus <= 86400000000 GROUP BY f.user_id),
      s2u AS (SELECT f.user_id, f.us AS pus, f.ord AS pord
              FROM f JOIN s2 ON f.user_id = s2.user_id AND f.ord = s2.o),
      s3 AS (SELECT f.user_id, min(f.ord) AS o FROM f JOIN s2u USING (user_id)
             WHERE et = 'click' AND f.ord > pord
               AND f.us - pus <= 86400000000 GROUP BY f.user_id),
      s3u AS (SELECT f.user_id, f.us AS pus, f.ord AS pord
              FROM f JOIN s3 ON f.user_id = s3.user_id AND f.ord = s3.o),
      s4 AS (SELECT f.user_id, min(f.ord) AS o FROM f JOIN s3u USING (user_id)
             WHERE et = 'purchase' AND f.ord > pord
               AND f.us - pus <= 86400000000 GROUP BY f.user_id)
      SELECT step_idx, step, n_users FROM (
        SELECT 1 AS step_idx, 'signup' AS step, (SELECT count(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
        UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
        UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
      ORDER BY step_idx"""))

  // ---------------------------------------------------------------- e15
  /** First-order Markov transition matrix over per-user event sequences
    * — the "what do users do next" model behind next-action prediction
    * and anomaly scoring on behavior streams. P(next | prev) estimated
    * from every consecutive event pair within a user's timeline.
    *
    * Scale shape: ONE user-keyed window shuffle produces the lag pairs;
    * the count/probability aggregation is over a BOUNDED key space
    * (|event types|² = 25 cells), so the second shuffle carries partial
    * counts only. The per-prev normalizer is a window over ≤5 rows of
    * the 25-row result, not the data. Ties in ts broken by event_id in
    * both engines. */
  val e15 = Q("e15_markov_transitions",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val perPrev = Window.partitionBy("prev_type")
      ev(s, dir)
        .withColumn("prev_type", lag("event_type", 1).over(byUser))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("next_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") / sum("n").over(perPrev), 6))
        .orderBy("prev_type", "next_type")
    },
    Some("""
      WITH pairs AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev_type,
               event_type AS next_type
        FROM events),
      c AS (
        SELECT prev_type, next_type, count(*) AS n
        FROM pairs WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type)
      SELECT prev_type, next_type, n,
             round(n / (sum(n) OVER (PARTITION BY prev_type)), 6) AS p
      FROM c
      ORDER BY prev_type, next_type"""))

  // ---------------------------------------------------------------- e16
  /** Gaps-and-islands: maximal runs of consecutive active DAYS per user
    * (the streak/retention primitive). The classic rewrite — distinct
    * active days, then `day_number − row_number` is constant exactly
    * within a consecutive run — turns a sequential-looking scan into two
    * shuffles on user_id (distinct + window) followed by a bounded
    * aggregate; no self-join, no iteration. The island key is an integer
    * day offset from epoch so the grouping column is type-stable across
    * engines. Per-user partitions are at most a few thousand days even
    * over a decade of data, so the window never spills at 100 TB. */
  val e16 = Q("e16_activity_islands",
    (s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("day_no")
      ev(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("day_no"))
        .distinct()
        .withColumn("grp", col("day_no") - row_number().over(byUser))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"),
          date_format(date_add(lit("1970-01-01"), min("day_no").cast("int")), "yyyy-MM-dd").as("start_day"),
          date_format(date_add(lit("1970-01-01"), max("day_no").cast("int")), "yyyy-MM-dd").as("end_day"))
        .select("user_id", "start_day", "end_day", "len")
        .orderBy("user_id", "start_day")
    },
    Some("""
      WITH days AS (
        SELECT DISTINCT user_id,
               date_diff('day', DATE '1970-01-01',
                         CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day_no
        FROM events),
      grps AS (
        SELECT user_id, day_no,
               day_no - row_number() OVER (PARTITION BY user_id
                                           ORDER BY day_no) AS grp
        FROM days)
      SELECT user_id,
             strftime(DATE '1970-01-01' + to_days(CAST(min(day_no) AS INT)), '%Y-%m-%d') AS start_day,
             strftime(DATE '1970-01-01' + to_days(CAST(max(day_no) AS INT)), '%Y-%m-%d') AS end_day,
             count(*) AS len
      FROM grps
      GROUP BY user_id, grp
      ORDER BY user_id, start_day"""))

  // ---------------------------------------------------------------- e17
  /** Mergeable distinct-count sketches (Datasketches HLL) — the rollup
    * primitive a 100 TB lake lives on: per-day sketches persist once,
    * any coarser rollup is a register-max union of the small binary
    * sketches, never a re-scan of the raw data. The invariant that makes
    * that sound is pinned IN the result: HLL union is register-wise max,
    * so estimate(union(daily sketches)) must equal estimate(direct
    * sketch over all days) BIT-EXACTLY (`merge_exact`), and the estimate
    * must sit within 5% of the exact distinct (`est_ok`; lgK=12 ⇒ ~0.8%
    * rse, so 5% is a loose deterministic gate at these cardinalities).
    * The oracle states both booleans as TRUE plus the exact count — the
    * driver's hash compare turns sketch-accuracy into a hard gate. */
  val e17 = Q("e17_sketch_distinct",
    (s, dir) => {
      val base = ev(s, dir).select(col("event_type"), col("user_id"),
        to_date(col("ts")).as("day"))
      val daily = base.groupBy("event_type", "day")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_merged"))
      val direct = base.groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_users"),
          expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("est_direct"))
      // merge gate is TOLERANCE-based, not bit-equality: a Datasketches
      // HLL union is NOT guaranteed register-identical to the single-pass
      // sketch — small per-day sketches live in exact list/set mode, and
      // the promotion path to HLL mode differs between "union many small
      // exacts" and "aggregate everything directly" (observed at sf0.1,
      // where daily cardinalities cross the promotion boundary; sf0.01
      // happened to agree bit-for-bit — the r11 sf0.1 sweep's catch).
      // The honest mergeability claim is that the unioned estimate ALSO
      // lands within the published error envelope of the exact count.
      direct.join(merged, "event_type")
        .select(col("event_type"), col("exact_users"),
          (abs(col("est_direct") - col("exact_users")) / col("exact_users") <= 0.05)
            .as("est_ok"),
          (abs(col("est_merged") - col("exact_users")) / col("exact_users") <= 0.05)
            .as("merge_ok"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             TRUE AS est_ok, TRUE AS merge_ok
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Shared shape for the directional as-of joins (e06/e18/e19):
    * purchases (left) matched against the deduped click timeline. */
  private def asofFrames(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = ev(s, dir)
    val clicks = e.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
      .select(col("user_id").as("c_user_id"), col("ts").as("c_ts"),
        col("click_id"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    (purchases, clicks)
  }

  // ---------------------------------------------------------------- e18
  /** Forward as-of: each purchase matched to the EARLIEST click at or
    * after it (post-purchase engagement). Same native one-pass merge as
    * e06 — the consumption frontier is direction-independent, so forward
    * costs exactly what backward does: one co-partitioning shuffle per
    * side, O(1) merge state. Oracle: DuckDB ASOF with the inequality
    * flipped. */
  val e18 = Q("e18_asof_forward",
    (s, dir) => {
      val (purchases, clicks) = asofFrames(s, dir)
      graft.plans.AsOf.join(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user_id",
          leftTime = "ts", rightTime = "c_ts", direction = "forward")
        .filter(col("click_id").isNotNull)
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id").as("next_click"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase')
      SELECT p.purchase_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             c.click_id AS next_click
      FROM purchases p
      ASOF JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.ts
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- e19
  /** Nearest as-of: each purchase matched to the click CLOSEST in time,
    * ties to the earlier click (pandas merge_asof direction='nearest').
    * The right side is unique per (user, ts) — e06's dedup — so backward
    * and forward each contribute at most one candidate and the tie rule
    * is total. Oracle: join + row_number over (|Δt|, backward-first) —
    * quadratic per user in DuckDB, one-pass in the native operator. */
  val e19 = Q("e19_asof_nearest",
    (s, dir) => {
      val (purchases, clicks) = asofFrames(s, dir)
      graft.plans.AsOf.join(purchases, clicks,
          leftKey = "user_id", rightKey = "c_user_id",
          leftTime = "ts", rightTime = "c_ts", direction = "nearest")
        .filter(col("click_id").isNotNull)
        .select(col("purchase_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
          col("click_id").as("nearest_click"))
        .orderBy("purchase_id")
    },
    Some("""
      WITH clicks AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      purchases AS (
        SELECT event_id AS purchase_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        FROM events WHERE event_type = 'purchase'),
      ranked AS (
        SELECT p.purchase_id, p.user_id, p.ts, c.click_id,
               row_number() OVER (PARTITION BY p.purchase_id ORDER BY
                 abs(epoch_us(p.ts) - epoch_us(c.ts)),
                 CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END) AS rn
        FROM purchases p JOIN clicks c ON p.user_id = c.user_id)
      SELECT purchase_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             click_id AS nearest_click
      FROM ranked WHERE rn = 1
      ORDER BY purchase_id"""))

  // ---------------------------------------------------------------- e20
  /** Retention via dense audience bitmaps — the EXACT sibling of e17's
    * sketches: one bitmap per day (64 KB for this 1500-user domain;
    * nBits/8 bytes in general) built in ONE partial-merge aggregate pass,
    * then the whole retention curve is bit-AND arithmetic between
    * kilobyte blobs — the raw event log is never re-shuffled per cohort
    * question. e08 computes the same curve with per-day joins; this is
    * the audience-store formulation that scales to thousands of stored
    * segments. Oracle: exact distinct-join replay. */
  val e20 = Q("e20_bitmap_retention",
    (s, dir) => {
      val bms = ev(s, dir)
        .select(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day_s"),
          col("user_id"))
        .groupBy("day_s")
        .agg(expr("dense_bitmap_agg(user_id, 2097152)").as("bm"))
      val day0 = bms.orderBy("day_s").limit(1)
        .select(col("bm").as("bm0"))
      bms.crossJoin(broadcast(day0))
        .select(col("day_s"),
          expr("bitmap_and_cardinality(bm, bm0)").as("retained"),
          expr("bitmap_cardinality(bm0)").as("cohort_size"))
        // retained/cohort_size is an INTEGER rational — a true
        // millionth-and-a-half tie makes round(double, 6)
        // engine-dependent (the q33/t04 class, r14): exact integer
        // round-half-up instead
        .withColumn("rate",
          expr(ExactRound.spark("retained", "cohort_size", 6)))
        .orderBy("day_s")
    },
    Some(s"""
      WITH days AS (
        SELECT DISTINCT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE),
                                 '%Y-%m-%d') AS day_s, user_id
        FROM events),
      d0 AS (SELECT min(day_s) AS first_day FROM days),
      cohort AS (
        SELECT user_id FROM days, d0 WHERE day_s = first_day),
      counts AS (
        SELECT d.day_s,
               count(c.user_id) AS retained,
               (SELECT count(*) FROM cohort) AS cohort_size
        FROM days d LEFT JOIN cohort c ON d.user_id = c.user_id
        GROUP BY d.day_s)
      SELECT day_s, retained, cohort_size,
             ${ExactRound.duck("retained", "cohort_size", 6)} AS rate
      FROM counts
      ORDER BY day_s"""))

  // ---------------------------------------------------------------- e21
  /** EWMA smoothing of the hourly volume series (α = 0.3) — a sequential
    * recurrence (s_t = αx_t + (1−α)s_{t−1}) that looks iterative but runs
    * as ONE `aggregate` fold over each type's sorted hourly array (the
    * s10/e14 fold pattern): the series per key is bounded (hours in the
    * window), the corpus-sized work is the e01-shaped count aggregate
    * before it. Both engines execute the identical IEEE double sequence —
    * Spark's fold and DuckDB's recursive CTE (literals forced to DOUBLE:
    * DuckDB would otherwise do DECIMAL arithmetic and diverge in the last
    * ulps) — so the hash gate holds at 6 digits without slack. */
  val e21 = Q("e21_hourly_ewma",
    (s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(col("event_type"),
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm").as("hour_s"))
        .agg(count(lit(1)).as("n"))
      hourly.groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("hour_s"), col("n")))).as("xs"))
        .select(col("event_type"), explode(expr("""
          aggregate(xs,
            cast(array() as array<struct<hour_s:string, ewma:double>>),
            (acc, x) -> array_append(acc, named_struct('hour_s', x.hour_s,
              'ewma',
              CASE WHEN size(acc) = 0 THEN cast(x.n AS double)
                   ELSE 0.3d * x.n + 0.7d * element_at(acc, -1).ewma END)))
          """)).as("e"))
        .select(col("event_type"), col("e.hour_s").as("hour_s"),
          round(col("e.ewma"), 6).as("ewma"))
        .orderBy("event_type", "hour_s")
    },
    Some("""
      WITH RECURSIVE hourly AS (
        SELECT event_type,
               strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M') AS hour_s,
               count(*) AS n
        FROM events GROUP BY 1, 2),
      seq AS (
        SELECT event_type, hour_s, n,
               row_number() OVER (PARTITION BY event_type ORDER BY hour_s) AS rn
        FROM hourly),
      ew AS (
        SELECT event_type, hour_s, rn, CAST(n AS DOUBLE) AS ewma
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.event_type, s.hour_s, s.rn,
               0.3::DOUBLE * s.n + 0.7::DOUBLE * e.ewma
        FROM seq s JOIN ew e
          ON s.event_type = e.event_type AND s.rn = e.rn + 1)
      SELECT event_type, hour_s, round(ewma, 6) AS ewma
      FROM ew
      ORDER BY event_type, hour_s"""))

  // ---------------------------------------------------------------- e22
  /** Incremental materialized-view maintenance: a per-(event_type, day)
    * rollup kept as MERGEABLE state — count, sum, min, max, and an HLL
    * user sketch — so when tonight's delta lands, the view updates by
    * merging the delta's partial states into the stored ones instead of
    * rescanning the 100 TB base. Count/sum merge by +, min/max by
    * min/max, distinct by register-max sketch union (e17's primitive);
    * avg would ride as (sum, count). The query splits the fixture by
    * event_id parity into a "stored" half and a "delta" half, maintains
    * the view incrementally, and proves merge ≡ full recompute per group:
    * exact equality for the arithmetic state, bit-equality for the
    * sketch union (associativity of register max), boolean-gated so the
    * DuckDB full-recompute oracle hash-enforces it. Sums compare with an
    * ABSOLUTE 1e-6 tolerance (|merged − direct| ≤ 1e-6, the boolean is
    * the output): partial-sum merge order differs from the direct scan's,
    * and IEEE addition is not associative — exactly the tolerance a real
    * incremental pipeline must declare. (Comparing independently ROUNDED
    * values would be boundary-flaky: two sums within tolerance can still
    * round to different 6-dp values.) Only the display column `total` is
    * rounded, identically in both engines.
    *
    * Scale shape: each state() is one partial-agg pass over its input;
    * the merge is a union of two bounded (type × day) state tables
    * re-aggregated on the same key — the stored side's size is the VIEW's
    * cardinality, not the fact table's. */
  val e22 = Q("e22_incremental_rollup",
    (s, dir) => {
      val base = ev(s, dir).select(col("event_type"), col("user_id"),
        col("value"), to_date(col("ts")).as("day"), col("event_id"))
      def state(df: DataFrame): DataFrame = df.groupBy("event_type", "day")
        .agg(count(lit(1)).as("cnt"), sum("value").as("total"),
          min("value").as("lo"), max("value").as("hi"),
          expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val stored = state(base.filter(col("event_id") % 2 === 0))
      val delta = state(base.filter(col("event_id") % 2 === 1))
      val view = stored.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(sum("cnt").as("m_cnt"), sum("total").as("m_total"),
          min("lo").as("m_lo"), max("hi").as("m_hi"),
          expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("m_est"))
      val direct = state(base)
        .select(col("event_type"), col("day"), col("cnt"), col("total"),
          col("lo"), col("hi"),
          expr("hll_sketch_estimate(sk)").as("d_est"))
      direct.join(view, Seq("event_type", "day"))
        .select(col("event_type"), col("day"), col("cnt"),
          round(col("total"), 6).as("total"), col("lo"), col("hi"),
          (col("m_cnt") === col("cnt") && col("m_lo") === col("lo")
            && col("m_hi") === col("hi")
            && abs(col("m_total") - col("total")) <= 1e-6)
            .as("arith_merge_exact"),
          // HLL union is not register-identical to the single-pass
          // sketch across the list/set→HLL promotion boundary (see e17)
          // — the mergeability claim for the sketch column is that both
          // estimates agree within the HLL error envelope (lgK=12 rse
          // ≈1.6%; 5% ≈ 3σ, load-bearing but not flaky), while the four
          // ARITHMETIC columns stay bit-exact as before.
          (abs(col("m_est") - col("d_est")) / col("d_est") <= 0.05)
            .as("sketch_merge_ok"))
        .orderBy("event_type", "day")
    },
    Some("""
      SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt,
             round(sum(value), 6) AS total, min(value) AS lo, max(value) AS hi,
             TRUE AS arith_merge_exact, TRUE AS sketch_merge_ok
      FROM events
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  // ---------------------------------------------------------------- e23
  /** Mergeable KLL quantile-sketch rollup — the distribution sibling of
    * e17's HLL: per-(type, day) sketches built in one partial-merge pass,
    * the per-type view derived by UNIONING the daily kilobyte blobs
    * (never re-scanning values), p50/p95 read from the blobs. Exact
    * percentiles at 100 TB cost a sort per question; the sketch holds
    * state logarithmic in n with a proven normalized-rank-error bound.
    *
    * Verification is honest about KLL's randomized compaction (no
    * bit-equality across partition splits, unlike HLL register-max):
    * each estimate's EXACT rank is measured by one more scan-riding agg
    * (rank = mean(value ≤ est)), and the booleans assert it lands within
    * ±3.5% of the target rank — double the published k=200 bound, so the
    * gate is load-bearing but not flaky — for both the unioned and the
    * directly-built sketch. The DuckDB oracle states the booleans and
    * pins n exactly. */
  val e23 = Q("e23_quantile_sketch",
    (s, dir) => {
      import graft.functions.KllAgg._
      val base = ev(s, dir).select(col("event_type"), col("value"),
        to_date(col("ts")).as("day"))
      val daily = base.groupBy("event_type", "day")
        .agg(kll_agg(col("value")).as("sk"))
      val rolled = daily.groupBy("event_type")
        .agg(kll_union_agg(col("sk")).as("sk"))
        .select(col("event_type"),
          kll_quantile(col("sk"), lit(0.5)).as("u50"),
          kll_quantile(col("sk"), lit(0.95)).as("u95"))
      val direct = base.groupBy("event_type")
        .agg(kll_agg(col("value")).as("sk"))
        .select(col("event_type"), kll_quantile(col("sk"), lit(0.5)).as("d50"))
      val est = rolled.join(direct, "event_type")
      base.join(broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          avg((col("value") <= col("u50")).cast("double")).as("r50"),
          avg((col("value") <= col("u95")).cast("double")).as("r95"),
          avg((col("value") <= col("d50")).cast("double")).as("rd50"))
        .select(col("event_type"), col("n"),
          (abs(col("r50") - 0.5) <= 0.035).as("p50_in_bound"),
          (abs(col("r95") - 0.95) <= 0.035).as("p95_in_bound"),
          (abs(col("rd50") - 0.5) <= 0.035).as("direct_p50_in_bound"))
        .orderBy("event_type")
    },
    Some("""
      SELECT event_type, count(*) AS n,
             TRUE AS p50_in_bound, TRUE AS p95_in_bound,
             TRUE AS direct_p50_in_bound
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  // ---------------------------------------------------------------- e24
  /** Audience-overlap ESTIMATES from HLL sketches via inclusion–
    * exclusion — |A∩B| ≈ |A| + |B| − |A∪B| — completing the sketch
    * algebra next to e20's exact bitmaps: bitmaps need the id domain
    * dense and owned; sketches work on any ids at a fixed few KB, the
    * trade being intersection error that grows as the overlap shrinks
    * relative to the union (the standard HLL-intersection caveat, why
    * e20 exists). Per event-type pair: estimate vs the exact distinct
    * join, gated at ±5% of the UNION size (the error's natural scale —
    * each of the three estimates it differences carries union-
    * proportional error; an overlap-relative gate would be the wrong
    * contract and flaky by construction). One sketch per type built
    * once; all pairwise questions are then blob arithmetic. */
  val e24 = Q("e24_overlap_sketch",
    (s, dir) => {
      val base = ev(s, dir).select(col("event_type"), col("user_id"))
      val sks = base.groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      val pairs = sks.toDF("ta", "ska")
        .join(sks.toDF("tb", "skb"), col("ta") < col("tb"))
        .select(col("ta"), col("tb"),
          expr("hll_sketch_estimate(ska)").as("est_a"),
          expr("hll_sketch_estimate(skb)").as("est_b"),
          expr("hll_sketch_estimate(hll_union(ska, skb))").as("est_u"))
        .withColumn("est_overlap", col("est_a") + col("est_b") - col("est_u"))
      val dedup = base.distinct() // (type, user) pairs: join stays |types|²×users
      val exact = dedup.toDF("ta", "user_id")
        .join(dedup.toDF("tb", "user_id"), Seq("user_id"))
        .where(col("ta") < col("tb"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("exact_overlap"))
      pairs.join(exact, Seq("ta", "tb"))
        .select(col("ta"), col("tb"), col("exact_overlap"),
          (abs(col("est_overlap") - col("exact_overlap"))
            <= col("est_u") * 0.05).as("within_bound"))
        .orderBy("ta", "tb")
    },
    Some("""
      WITH b AS (SELECT DISTINCT event_type, user_id FROM events),
      p AS (
        SELECT a.event_type AS ta, b2.event_type AS tb,
               count(*) AS exact_overlap
        FROM b a JOIN b b2 ON a.user_id = b2.user_id
        WHERE a.event_type < b2.event_type
        GROUP BY 1, 2)
      SELECT ta, tb, exact_overlap, TRUE AS within_bound
      FROM p
      ORDER BY ta, tb"""))

  // ---------------------------------------------------------------- e26
  /** Per-day activity leaderboard through the bounded top-K heap
    * aggregate — the straggler-free replacement for the
    * `row_number().over(partitionBy(day))` formulation: a window sorts
    * every day's ENTIRE user set in one task to keep 3 rows, so a hot
    * day becomes a single straggler, while the heap keeps ≤ K candidates
    * per task with partial/merge support (TopKAgg scaladoc). Sort key is
    * the negated count (the heap keeps smallest), payload the user id —
    * unique per group, so ties are total-order deterministic in both
    * engines. The oracle IS the window formulation, so the gate also
    * proves heap ≡ window. */
  val e26 = Q("e26_daily_leaderboard",
    (s, dir) => {
      val counts = ev(s, dir)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day_s"),
          col("user_id"))
        .agg(count(lit(1)).as("n"))
      val top = counts.groupBy("day_s")
        .agg(graft.functions.TopKAgg.topk_agg(
          -col("n"), col("user_id"), 3).as("users"))
        .select(col("day_s"), posexplode(col("users")).as(Seq("pos", "user_id")))
        .withColumn("rn", col("pos") + 1)
      top.join(counts, Seq("day_s", "user_id"))
        .select(col("day_s"), col("rn").cast("long").as("rn"),
          col("user_id"), col("n"))
        .orderBy("day_s", "rn")
    },
    Some("""
      WITH counts AS (
        SELECT strftime(CAST(CAST(ts AS TIMESTAMP) AS DATE), '%Y-%m-%d') AS day_s,
               user_id, count(*) AS n
        FROM events
        GROUP BY 1, 2),
      ranked AS (
        SELECT day_s, user_id, n,
               row_number() OVER (PARTITION BY day_s
                                  ORDER BY n DESC, user_id) AS rn
        FROM counts)
      SELECT day_s, rn, user_id, n
      FROM ranked
      WHERE rn <= 3
      ORDER BY day_s, rn"""))

  val queries: Seq[Q] = Seq(e01, e02, e03, e04, e05, e06, e07, e08, e09, e10,
    e11, e12, e13, e14, e15, e16, e17, e18, e19, e20, e21, e22, e23, e24, e25,
    e26)
}
