package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Time-series / streaming-shaped operators over `events` (SURVEY.md §2.8):
  * tumbling and sliding window aggregates, gap-based sessionization, and
  * JSON property extraction (reference T7, `/root/reference/task.ts:172`).
  * These are the batch twins of the Structured Streaming pipeline in
  * `graft.streaming` — same window semantics, verifiable against DuckDB.
  */
object EventsPack extends QueryPack {

  override def queries: Seq[Q] = Seq(
    // ---------------------------------------------------------------- tumbling
    Q(
      "e1_tumbling_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(
            fts(col("w.start")).as("window_start"),
            col("event_type"),
            col("n"),
            col("sum_value")
          )
          .orderBy(col("window_start"), col("event_type")),
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
             |  event_type, COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events
             |GROUP BY 1, 2
             |ORDER BY window_start, event_type""".stripMargin),
      doc = "tumbling 1-day window agg — batch twin of streaming window(ts, '1 day')"
    ),
    // ---------------------------------------------------------------- sliding
    Q(
      "e2_sliding_window",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
          .select(fts(col("w.start")).as("window_start"), col("n"), col("sum_value"))
          .orderBy(col("window_start")),
      Some("""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM (
             |  SELECT unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
             |                 date_trunc('hour', ts)]) AS ws, value
             |  FROM events)
             |GROUP BY ws
             |ORDER BY window_start""".stripMargin),
      doc = "sliding 2h/1h windows: each event lands in 2 overlapping windows"
    ),
    // ---------------------------------------------------------------- sessionize
    Q(
      "e3_sessionize",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn(
            "new_session",
            when(
              col("prev_ts").isNull ||
                unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
              1L
            ).otherwise(0L)
          )
          .withColumn(
            "session_seq",
            sum(col("new_session")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
          )
          .groupBy(col("user_id"), col("session_seq"))
          .agg(
            count(lit(1)).as("n_events"),
            fts(min(col("ts"))).as("session_start"),
            (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
              .as("duration_sec")
          )
          .orderBy(col("user_id"), col("session_seq"))
      },
      Some("""SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
             |  strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             |  CAST(floor(epoch(MAX(ts))) AS BIGINT) - CAST(floor(epoch(MIN(ts))) AS BIGINT) AS duration_sec
             |FROM (
             |  SELECT user_id, ts,
             |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
             |  FROM (
             |    SELECT user_id, ts, event_id,
             |      CASE WHEN prev_ts IS NULL
             |             OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
             |           THEN 1 ELSE 0 END AS new_session
             |    FROM (
             |      SELECT user_id, ts, event_id,
             |        LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |      FROM events) a) b) c
             |GROUP BY user_id, session_seq
             |ORDER BY user_id, session_seq""".stripMargin),
      doc = "30-min-gap sessionization: lag + running sum = session ids; batch twin of " +
        "session_window / flatMapGroupsWithState"
    ),
    // ---------------------------------------------------------------- json
    Q(
      "e4_json_extract",
      (s, d) =>
        Tables.events(s, d)
          .select(
            col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k")
          )
          .groupBy(col("event_type"))
          .agg(
            sum(col("k")).as("sum_k"),
            max(col("k")).as("max_k"),
            count(lit(1)).as("n")
          )
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
             |  COUNT(*) AS n
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin),
      doc = "JSON property parse (reference T7 from_json path) + agg"
    ),
    // ---------------------------------------------------------------- top users
    Q(
      "e5_top_users_by_day",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(
            date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
            col("user_id")
          )
          .agg(count(lit(1)).as("n_events"))
        val w = Window.partitionBy(col("day")).orderBy(col("n_events").desc, col("user_id"))
        daily
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 3)
          .orderBy(col("day"), col("rnk"))
      },
      Some("""SELECT day, user_id, n_events, rnk FROM (
             |  SELECT day, user_id, n_events,
             |    ROW_NUMBER() OVER (PARTITION BY day ORDER BY n_events DESC, user_id) AS rnk
             |  FROM (
             |    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, user_id,
             |      COUNT(*) AS n_events
             |    FROM events GROUP BY 1, 2) a) b
             |WHERE rnk <= 3
             |ORDER BY day, rnk""".stripMargin),
      doc = "daily top-3 active users: agg then per-day top-k window"
    ),
    // ---------------------------------------------------------------- asof
    Q(
      "e6_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        graft.ops.AsOfJoin
          .backward(purchases, views, "user_id", "ts",
            Seq("event_id" -> "view_event_id", "value" -> "view_value"))
          .select(col("event_id"), col("user_id"), col("view_event_id"), col("view_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, p.user_id, v.event_id AS view_event_id, v.value AS view_value
             |FROM (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase') p
             |ASOF LEFT JOIN (SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'view') v
             |  ON p.user_id = v.user_id AND p.ts >= v.ts
             |ORDER BY p.event_id""".stripMargin),
      doc = "backward as-of join (operator Spark lacks) composed as tag-union + " +
        "forward-fill window: one key shuffle, no range-join explosion; oracle = " +
        "DuckDB's native ASOF JOIN"
    ),
    // ---------------------------------------------------------------- pivot
    Q(
      "e7_pivot",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("user_id")),
      Some("""SELECT user_id,
             |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
             |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
             |FROM events
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      doc = "pivot with explicit value list (no extra distinct-values scan) = " +
        "conditional aggregation"
    ),
    // ---------------------------------------------------------------- retention
    Q(
      "e8_retention",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("user_id"), date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
          .distinct()
        val a = daily.select(col("user_id"), col("day").as("d0"))
        val b = daily.select(col("user_id"), col("day").as("d1"))
        a.join(b, Seq("user_id"))
          .filter(date_add(to_date(col("d0")), 1) === to_date(col("d1")))
          .groupBy(col("d0"))
          .agg(countDistinct(col("user_id")).as("retained_users"))
          .orderBy(col("d0"))
      },
      Some("""WITH daily AS (
             |  SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day
             |  FROM events)
             |SELECT a.day AS d0, COUNT(DISTINCT a.user_id) AS retained_users
             |FROM daily a JOIN daily b
             |  ON a.user_id = b.user_id
             | AND CAST(a.day AS DATE) + INTERVAL 1 DAY = CAST(b.day AS DATE)
             |GROUP BY a.day
             |ORDER BY d0""".stripMargin),
      doc = "next-day retention cohort: distinct user-days self-joined on day+1 " +
        "(the activity-overlap join shape)"
    ),
    // ---------------------------------------------------------------- interarrival
    Q(
      "e9_interarrival",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .filter(col("prev_ts").isNotNull)
          .withColumn("gap_sec", unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_gaps"),
            (sum(col("gap_sec")).cast("double") / count(lit(1))).as("avg_gap_sec"),
            max(col("gap_sec")).as("max_gap_sec")
          )
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_gaps,
             |  CAST(SUM(gap_sec) AS DOUBLE) / COUNT(*) AS avg_gap_sec,
             |  MAX(gap_sec) AS max_gap_sec
             |FROM (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) AS gap_sec
             |  FROM (
             |    SELECT user_id, ts,
             |      LAG(ts, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
             |    FROM events) t
             |  WHERE prev_ts IS NOT NULL) g
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      doc = "inter-arrival gap statistics per user: lag + floored epoch diff + exact " +
        "integer sums"
    ),
    // ---------------------------------------------------------------- range join
    Q(
      "e10_temporal_self_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts").as("p_ts"))
        val c = ev.filter(col("event_type") === "click")
          .select(col("user_id").as("c_uid"), col("ts").as("c_ts"))
        p.join(
            c,
            col("user_id") === col("c_uid") &&
              col("c_ts") > col("p_ts") - expr("INTERVAL 1 HOUR") &&
              col("c_ts") < col("p_ts"),
            "left_outer"
          )
          .groupBy(col("event_id"))
          .agg(count(col("c_ts")).as("n_clicks_1h"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT p.event_id, COUNT(c.ts) AS n_clicks_1h
             |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
             |  ON c.user_id = p.user_id
             |  AND c.ts > p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
             |GROUP BY p.event_id
             |ORDER BY p.event_id""".stripMargin),
      doc = "interval/range join: clicks within the hour before each purchase. The " +
        "equi-key (user_id) carries the shuffle — the range predicate is a residual " +
        "on co-partitioned rows, so no quadratic blowup; keyless time-range joins " +
        "would instead band ts into overlapping buckets as the equi-key"
    ),
    // ---------------------------------------------------------------- islands
    Q(
      "e11_streaks",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val days = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        days
          .withColumn("rn", row_number().over(byUser))
          .withColumn("island", date_sub(col("day"), col("rn")))
          .groupBy(col("user_id"), col("island"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("max_streak"), sum(col("len")).cast("long").as("n_active_days"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
             |isl AS (
             |  SELECT user_id, day,
             |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS island
             |  FROM days)
             |SELECT user_id, MAX(len) AS max_streak, CAST(SUM(len) AS BIGINT) AS n_active_days
             |FROM (SELECT user_id, island, COUNT(*) AS len FROM isl GROUP BY user_id, island) g
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      doc = "gaps-and-islands: longest consecutive-day activity streak per user via " +
        "the date-minus-row_number island key — two partial-agg shuffles, no self-join"
    ),
    // ---------------------------------------------------------------- resample
    Q(
      "e12_resample_gapfill",
      (s, d) => {
        // fixed hourly spine over the corpus window; sparse buckets (errors
        // are rare) appear with zero counts instead of vanishing
        val spine = s.sql(
          """SELECT explode(sequence(TIMESTAMP '2024-01-01 00:00:00',
            |                        TIMESTAMP '2024-01-30 23:00:00',
            |                        INTERVAL 1 HOUR)) AS bucket""".stripMargin)
        val hourly = Tables.events(s, d)
          .filter(col("event_type") === "error")
          .groupBy(date_trunc("hour", col("ts")).as("bucket"))
          .agg(
            count(lit(1)).as("cnt"),
            min(col("value")).as("min_v"),
            max(col("value")).as("max_v")
          )
        spine.join(hourly, Seq("bucket"), "left_outer")
          .select(
            fts(col("bucket")).as("bucket"),
            coalesce(col("cnt"), lit(0L)).as("n_errors"),
            col("min_v"),
            col("max_v")
          )
          .orderBy(col("bucket"))
      },
      Some("""WITH spine AS (
             |  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
             |                                TIMESTAMP '2024-01-30 23:00:00',
             |                                INTERVAL 1 HOUR)) AS bucket),
             |hourly AS (
             |  SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS cnt,
             |    MIN(value) AS min_v, MAX(value) AS max_v
             |  FROM events WHERE event_type = 'error'
             |  GROUP BY 1)
             |SELECT strftime(spine.bucket, '%Y-%m-%d %H:%M:%S') AS bucket,
             |  COALESCE(cnt, 0) AS n_errors, min_v, max_v
             |FROM spine LEFT JOIN hourly ON spine.bucket = hourly.bucket
             |ORDER BY bucket""".stripMargin),
      doc = "time-series resample with gap filling: generated hourly spine " +
        "left-joined to sparse per-hour aggregates — empty buckets survive with " +
        "zero counts (min/max stay NULL), the densification step before charting " +
        "or windowed models"
    ),
    // ---------------------------------------------------------------- range frame
    Q(
      "e13_range_frame",
      (s, d) => {
        // trailing 1-hour window per user: RANGE frame over epoch seconds —
        // a set-based frame (tie-safe, unlike ROWS) computed in one
        // partition-sorted pass per user
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(unix_timestamp(col("ts")))
          .rangeBetween(-3600, 0)
        Tables.events(s, d)
          .select(
            col("event_id"),
            col("user_id"),
            count(lit(1)).over(w).as("n_last_hour"),
            sum(dec(col("value"))).over(w).cast("double").as("v_last_hour")
          )
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |  COUNT(*) OVER w AS n_last_hour,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_last_hour
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             |             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
             |ORDER BY event_id""".stripMargin),
      doc = "trailing 1-hour RANGE window frame per user (exact decimal sums inside " +
        "the frame) — the moving-aggregate shape for rate limiting / rolling features"
    ),
    // ---------------------------------------------------------------- interval union
    Q(
      "e14_interval_union",
      (s, d) => {
        // interval-union coverage: each event opens a 5-minute activity
        // interval [ts, ts+300); overlapping/touching intervals per user are
        // merged (gaps-and-islands over a running max of interval ends) and
        // the TOTAL covered time is the sum of merged-island lengths —
        // double-counting from overlaps eliminated exactly. All integer
        // epoch-second math; one window pass + one aggregate.
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
        val prior = byUser.rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("es"))
          .withColumn("en", col("es") + 300L)
          .withColumn("prev_max_end", max(col("en")).over(prior))
          .withColumn(
            "new_island",
            when(col("prev_max_end").isNull || col("es") > col("prev_max_end"), 1L)
              .otherwise(0L)
          )
          .withColumn(
            "island",
            sum(col("new_island")).over(
              byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
          )
          .groupBy(col("user_id"), col("island"))
          .agg((max(col("en")) - min(col("es"))).as("len"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_intervals"),
            sum(col("len")).as("covered_seconds")
          )
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (
             |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |         CAST(floor(epoch(ts)) AS BIGINT) + 300 AS en
             |  FROM events),
             |mk AS (
             |  SELECT user_id, es, en,
             |    CASE WHEN MAX(en) OVER (PARTITION BY user_id ORDER BY es, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             |           OR es > MAX(en) OVER (PARTITION BY user_id ORDER BY es, event_id
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      THEN 1 ELSE 0 END AS new_island,
             |    event_id
             |  FROM iv),
             |isl AS (
             |  SELECT user_id, es, en,
             |    SUM(new_island) OVER (PARTITION BY user_id ORDER BY es, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
             |  FROM mk)
             |SELECT user_id, COUNT(*) AS n_intervals, CAST(SUM(len) AS BIGINT) AS covered_seconds
             |FROM (SELECT user_id, island, MAX(en) - MIN(es) AS len
             |      FROM isl GROUP BY user_id, island) t
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      doc = "interval-union coverage (merge overlapping activity intervals, total " +
        "covered time per user) — gaps-and-islands over a running max of ends"
    ),
    // ---------------------------------------------------------------- markov
    Q(
      "e15_markov_transitions",
      (s, d) => {
        // first-order Markov transition matrix over per-user event streams:
        // P(next_type | prev_type) estimated from ordered (prev, next)
        // bigrams. The lag window partitions by user_id (cardinality grows
        // with the data — parallelism scales, unlike a global window); the
        // transition-count aggregate collapses to |types|² rows, so the
        // per-prev totals join back as a broadcast. Probability is one IEEE
        // division of two exact BIGINTs — deterministic across engines.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val bi = Tables.events(s, d)
          .select(
            col("user_id"),
            lag(col("event_type"), 1).over(w).as("prev_type"),
            col("event_type").as("next_type"))
          .filter(col("prev_type").isNotNull)
        val counts = bi.groupBy(col("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val totals = counts.groupBy(col("prev_type")).agg(sum(col("n")).as("n_prev"))
        counts
          .join(broadcast(totals), Seq("prev_type"))
          .select(
            col("prev_type"), col("next_type"), col("n"),
            (col("n").cast("double") / col("n_prev")).as("p"))
          .orderBy(col("prev_type"), col("next_type"))
      },
      Some("""WITH bi AS (
             |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             |    event_type AS next_type
             |  FROM events),
             |c AS (SELECT prev_type, next_type, COUNT(*) AS n FROM bi
             |      WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type),
             |t AS (SELECT prev_type, CAST(SUM(n) AS BIGINT) AS n_prev FROM c GROUP BY prev_type)
             |SELECT prev_type, next_type, n, CAST(n AS DOUBLE) / n_prev AS p
             |FROM c JOIN t USING (prev_type)
             |ORDER BY prev_type, next_type""".stripMargin),
      doc = "first-order Markov transition matrix P(next|prev) over per-user event " +
        "streams — scaling lag window (per-user partitions) + broadcast row totals"
    ),
    // ---------------------------------------------------------------- attribution
    Q(
      "e16_attribution",
      (s, d) => {
        // last-touch revenue attribution: each purchase credits the user's
        // most recent preceding click (the as-of join e6 certified), rolled
        // up by the click's campaign bucket; purchases with no prior click
        // land in 'none'. One key shuffle total — the as-of composition
        // carries the campaign through the forward-fill, so attribution
        // never re-joins history.
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"), col("value"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(
            col("user_id"), col("ts"),
            (get_json_object(col("props"), "$.k").cast("long") % 5).as("campaign"))
        graft.ops.AsOfJoin
          .backward(purchases, clicks, "user_id", "ts", Seq("campaign" -> "campaign"))
          .withColumn("bucket",
            coalesce(col("campaign").cast("string"), lit("none")))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("attributed_value"))
          .orderBy(col("bucket"))
      },
      Some("""WITH p AS (
             |  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'),
             |c AS (
             |  SELECT user_id, ts,
             |    CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 AS campaign
             |  FROM events WHERE event_type = 'click')
             |SELECT COALESCE(CAST(c.campaign AS VARCHAR), 'none') AS bucket,
             |  COUNT(*) AS n_purchases,
             |  CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
             |GROUP BY bucket
             |ORDER BY bucket""".stripMargin),
      doc = "last-touch attribution: purchases credit the latest preceding click's " +
        "campaign via the as-of composition (one key shuffle), rollup per bucket"
    ),
    // ---------------------------------------------------------------- bursts
    Q(
      "e17_burst_detect",
      (s, d) => {
        // burst detection: hours where an event type's volume exceeds 2× its
        // trailing-24h average. The scale pattern is PRE-AGGREGATE, THEN
        // WINDOW: the raw stream collapses to an (hour, type) series first,
        // so the low-cardinality per-type window runs over an already
        // aggregate-sized frame — the window input shrinks with time
        // granularity, not with event volume. The burst test is
        // n * trail_n > 2 * trail_sum: exact integer arithmetic, no
        // mean division, no stddev parity risk.
        import org.apache.spark.sql.expressions.Window
        val hourly = Tables.events(s, d)
          .groupBy(
            date_trunc("hour", col("ts")).as("hr"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
          .rowsBetween(-24, -1)
        hourly
          .withColumn("trail_sum", sum(col("n")).over(w))
          .withColumn("trail_n", count(col("n")).over(w))
          .filter(col("trail_n") >= 12 && col("n") * col("trail_n") > col("trail_sum") * 2)
          .select(
            fts(col("hr")).as("hour"),
            col("event_type"), col("n"), col("trail_sum"), col("trail_n"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""WITH hourly AS (
             |  SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (
             |  SELECT hr, event_type, n,
             |    SUM(n) OVER w AS trail_sum,
             |    COUNT(n) OVER w AS trail_n
             |  FROM hourly
             |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
             |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
             |SELECT strftime(hr, '%Y-%m-%d %H:%M:%S') AS hour,
             |  event_type, n, CAST(trail_sum AS BIGINT) AS trail_sum, trail_n
             |FROM t
             |WHERE trail_n >= 12 AND n * trail_n > trail_sum * 2
             |ORDER BY hour, event_type""".stripMargin),
      doc = "burst detection (hour > 2× trailing-24h average per type) — " +
        "pre-aggregate-then-window: the low-cardinality window runs over the " +
        "hourly series, never the raw stream; exact integer burst test"
    ),
    // ---------------------------------------------------------------- cumulative users
    Q(
      "e18_cumulative_users",
      (s, d) => {
        // cumulative distinct users by day. COUNT(DISTINCT) OVER a running
        // frame doesn't exist (and a naive re-count per day is quadratic);
        // the scalable identity is: a user contributes exactly once, on
        // their FIRST day — so min(day) per user (one hash aggregate), count
        // per first day (second aggregate, day-sized), and a running sum
        // over the tiny day-count series. Data-sized shuffles: exactly one,
        // keyed by user.
        import org.apache.spark.sql.expressions.Window
        val first = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(min(date_trunc("hour", col("ts"))).as("first_hr"))
        val perHr = first.groupBy(col("event_type"), col("first_hr"))
          .agg(count(lit(1)).as("n_new"))
        // the running frame covers (types × hours) rows — aggregate-sized,
        // bounded by the calendar, not by event volume
        val w = Window.partitionBy(col("event_type")).orderBy(col("first_hr"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        perHr
          .withColumn("cum_users", sum(col("n_new")).over(w))
          .select(fts(col("first_hr")).as("hour"), col("event_type"),
            col("n_new"), col("cum_users"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""WITH fd AS (
             |  SELECT user_id, event_type, MIN(date_trunc('hour', ts)) AS first_hr
             |  FROM events GROUP BY user_id, event_type),
             |pd AS (SELECT event_type, first_hr, COUNT(*) AS n_new
             |       FROM fd GROUP BY event_type, first_hr)
             |SELECT strftime(first_hr, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n_new,
             |  CAST(SUM(n_new) OVER (PARTITION BY event_type ORDER BY first_hr
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
             |FROM pd
             |ORDER BY hour, event_type""".stripMargin),
      doc = "cumulative distinct users per event type via the first-seen identity: " +
        "one (user, type)-keyed aggregate + a running sum over the calendar-sized " +
        "series — never a per-period distinct re-count"
    ),
    // ---------------------------------------------------------------- lateness
    Q(
      "e19_late_arrival_audit",
      (s, d) => {
        // Out-of-order arrival audit — the batch measurement behind choosing
        // a streaming watermark delay: within each user's stream, arrival
        // order is event_id (the ingest sequence) and the per-user watermark
        // is the running max event time over PRIOR arrivals; an event is
        // "late" when it lands more than 120 s behind that high-water mark
        // (it would be dropped by withWatermark("2 minutes")). Per-user
        // window = hash-partitioned, scale-clean; all epoch-second integer
        // math.
        val byArrival = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("es"))
          .withColumn("wm", max(col("es")).over(byArrival))
          .select(
            col("user_id"),
            when(col("wm").isNotNull && col("es") < col("wm") - 120, 1L)
              .otherwise(0L).as("late"),
            when(col("wm").isNotNull && col("es") < col("wm"), col("wm") - col("es"))
              .otherwise(0L).as("lateness"))
          .groupBy(col("user_id"))
          .agg(
            count(lit(1)).as("n_events"),
            sum(col("late")).as("n_late"),
            max(col("lateness")).as("max_lateness_sec"))
          .orderBy(col("user_id"))
      },
      Some("""WITH t AS (
             |  SELECT user_id,
             |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
             |    MAX(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
             |      PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
             |  FROM events)
             |SELECT user_id, COUNT(*) AS n_events,
             |  CAST(SUM(CASE WHEN wm IS NOT NULL AND es < wm - 120 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_late,
             |  CAST(MAX(CASE WHEN wm IS NOT NULL AND es < wm THEN wm - es ELSE 0 END)
             |    AS BIGINT) AS max_lateness_sec
             |FROM t
             |GROUP BY user_id
             |ORDER BY user_id""".stripMargin),
      doc = "out-of-order arrival audit per user (running event-time high-water mark " +
        "over arrival order, 120 s tolerance) — the batch evidence for choosing a " +
        "streaming watermark delay; hash-partitioned windows, integer epoch math"
    ),
    // ---------------------------------------------------------------- survival
    Q(
      "e20_kaplan_meier",
      (s, d) => {
        // Kaplan-Meier time-to-conversion per signup cohort: duration =
        // days from a user's first event to their first purchase, right-
        // censored at their last observed day. One user-keyed aggregate
        // collapses the stream (the only data-sized shuffle); everything
        // after runs on the (cohort × duration-day) grid, bounded by the
        // calendar. The survival curve is the running product
        // Π(1 − d_t/n_t) — carried as an INTEGER micro-nat log sum
        // (each factor floor-quantized before the cumulative sum), so the
        // output is exact on both engines with no exp/product rounding.
        // Risk sets derive from cohort totals minus a prefix sum — never a
        // per-t re-count. Rows where n_t = d_t (curve hits zero) terminate
        // the log-domain curve and are excluded by construction.
        val byUser = Tables.events(s, d)
          .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
          .groupBy(col("user_id"))
          .agg(
            min(col("day")).as("d0"),
            max(col("day")).as("dl"),
            min(when(col("event_type") === "purchase", col("day"))).as("dp"))
        val spans = byUser.select(
          date_format(date_trunc("month", col("d0")), "yyyy-MM").as("cohort"),
          when(col("dp").isNotNull, datediff(col("dp"), col("d0")))
            .otherwise(datediff(col("dl"), col("d0"))).cast("long").as("t"),
          when(col("dp").isNotNull, 1L).otherwise(0L).as("ev"))
        val grid = spans.groupBy(col("cohort"), col("t"))
          .agg(sum(col("ev")).as("d_t"), sum(lit(1L) - col("ev")).as("c_t"))
        val wc = Window.partitionBy(col("cohort"))
        val prior = Window.partitionBy(col("cohort")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val risk = grid.withColumn(
          "n_t",
          sum(col("d_t") + col("c_t")).over(wc) -
            coalesce(sum(col("d_t") + col("c_t")).over(prior), lit(0L)))
        val run = Window.partitionBy(col("cohort")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        risk
          .filter(col("d_t") > 0 && col("n_t") > col("d_t"))
          .withColumn("q",
            floor(log((col("n_t") - col("d_t")).cast("double") / col("n_t").cast("double"))
              * 1e6).cast("long"))
          .withColumn("surv_mlog", -sum(col("q")).over(run))
          .select(col("cohort"), col("t"), col("d_t"), col("c_t"), col("n_t"),
            col("surv_mlog"))
          .orderBy(col("cohort"), col("t"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, MIN(day) AS d0, MAX(day) AS dl,
             |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS dp
             |  FROM (SELECT user_id, event_type, CAST(ts AS DATE) AS day FROM events) e
             |  GROUP BY user_id),
             |sp AS (
             |  SELECT strftime(date_trunc('month', d0), '%Y-%m') AS cohort,
             |    CAST(CASE WHEN dp IS NOT NULL THEN datediff('day', d0, dp)
             |         ELSE datediff('day', d0, dl) END AS BIGINT) AS t,
             |    CASE WHEN dp IS NOT NULL THEN 1 ELSE 0 END AS ev
             |  FROM u),
             |g AS (
             |  SELECT cohort, t, CAST(SUM(ev) AS BIGINT) AS d_t,
             |    CAST(SUM(1 - ev) AS BIGINT) AS c_t
             |  FROM sp GROUP BY cohort, t),
             |r AS (
             |  SELECT cohort, t, d_t, c_t,
             |    CAST(SUM(d_t + c_t) OVER (PARTITION BY cohort) -
             |      COALESCE(SUM(d_t + c_t) OVER (PARTITION BY cohort ORDER BY t
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n_t
             |  FROM g),
             |k AS (
             |  SELECT cohort, t, d_t, c_t, n_t,
             |    CAST(floor(ln(CAST(n_t - d_t AS DOUBLE) / CAST(n_t AS DOUBLE))
             |      * 1000000) AS BIGINT) AS q
             |  FROM r WHERE d_t > 0 AND n_t > d_t)
             |SELECT cohort, t, d_t, c_t, n_t,
             |  CAST(-SUM(q) OVER (PARTITION BY cohort ORDER BY t
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS surv_mlog
             |FROM k
             |ORDER BY cohort, t""".stripMargin),
      doc = "Kaplan-Meier time-to-conversion per cohort (right-censored at last " +
        "observation): one user-keyed aggregate, calendar-bounded grid windows, " +
        "risk sets from prefix sums, survival as exact integer micro-nat log sums"
    ),
    // ---------------------------------------------------------------- e21
    Q(
      "e21_windowed_quantiles",
      (s, d) => {
        // Per-(1-day tumbling window, event_type) p50/p90/p99 of the event
        // value — the canonical observability query ("p99 latency per
        // window"), priced the only way that scales: the HDR log-bucket
        // sketch (ops/HdrSketch, <=3.1% relative bucket width) instead of a
        // per-window sort. Values ride as integer cents so the whole plan
        // is integer-exact and hash-certified; the sketch is ONE
        // map-side-combined count shuffle of O(windows x types x 2k) rows,
        // and the same plan shape runs unchanged as the watermark-append
        // streaming twin (StreamingHdrQuantiles.windowedSketchCounts).
        import graft.ops.HdrSketch
        val base = Tables.events(s, d).select(
          window(col("ts"), "1 day").as("w"),
          col("event_type"),
          (dec(col("value")) * 100).cast("long").as("vc"))
        val sk = HdrSketch.counts(
          HdrSketch.bucketize(base, col("vc"), col("w"), col("event_type")),
          col("w"), col("event_type"))
        HdrSketch.estimates(sk, col("w"), col("event_type"))
          .select(
            fts(col("w.start")).as("window_start"),
            col("event_type"), col("q_label"),
            col("est_lo").as("est_lo_c"), col("est_hi").as("est_hi_c"),
            col("n_group"))
          .orderBy(col("window_start"), col("event_type"), col("q_label"))
      },
      Some("""WITH base AS (
             |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
             |    event_type,
             |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
             |  FROM events),
             |bk AS (
             |  SELECT ws, event_type, c,
             |    CAST(length(bin(c)) AS BIGINT) AS msb,
             |    CAST(greatest(length(bin(c)) - 6, 0) AS INT) AS shift
             |  FROM base),
             |sk AS (
             |  SELECT ws, event_type,
             |    msb * 32 + ((c >> shift) & 31) AS bucket,
             |    CASE WHEN msb >= 6 THEN (32 + ((c >> shift) & 31)) << shift
             |         ELSE (c >> shift) & 31 END AS lo,
             |    (CASE WHEN msb >= 6 THEN (32 + ((c >> shift) & 31)) << shift
             |          ELSE (c >> shift) & 31 END) + (CAST(1 AS BIGINT) << shift) - 1 AS hi,
             |    COUNT(*) AS cnt
             |  FROM bk GROUP BY 1, 2, 3, 4, 5),
             |cum AS (
             |  SELECT ws, event_type, bucket, lo, hi, cnt,
             |    SUM(cnt) OVER (PARTITION BY ws, event_type ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |    SUM(cnt) OVER (PARTITION BY ws, event_type) AS n_group
             |  FROM sk),
             |spec(q_label, num, den) AS (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100))
             |SELECT ws AS window_start, event_type, q_label,
             |  MIN(lo) AS est_lo_c, MIN(hi) AS est_hi_c,
             |  CAST(n_group AS BIGINT) AS n_group
             |FROM cum CROSS JOIN spec
             |WHERE cum * den >= n_group * num
             |GROUP BY ws, event_type, q_label, n_group
             |ORDER BY window_start, event_type, q_label""".stripMargin),
      doc = "per-(1-day window, event_type) p50/p90/p99 via the HDR log-bucket " +
        "sketch — windowed observability quantiles with ONE bounded " +
        "map-side-combined shuffle, no per-window sort; integer-exact, " +
        "hash-certified; plan shape shared with the watermark streaming twin"
    ),
    // ---------------------------------------------------------------- e22
    Q(
      "e22_windowed_user_freq",
      (s, d) => {
        // Per-(1-day tumbling window) approximate per-user event counts
        // from the Count-Min sketch — the rate-limit/abuse-monitor query
        // ("how many events did each watched user fire this window"),
        // priced the only way that scales: the per-window CMS holds
        // <= 4x512 cells per window HOWEVER many distinct users appear
        // (exact per-(window, user) counts shuffle one row per pair), and
        // the watchlist probe broadcasts the single-row collected user
        // set (the bounded-by-construction crossJoin spelling). Same
        // column pipeline runs as the watermark-append streaming twin
        // (StreamingCmsFrequency.windowedSketchCells). All integer,
        // hash-certified cell-for-cell.
        import graft.ops.CmsSketch
        val P = CmsSketch.P
        val ev = Tables.events(s, d)
        val base = ev.select(
          window(col("ts"), "1 day").as("w"),
          ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
        val sk = CmsSketch.counts(CmsSketch.bucketize(base, col("h"), col("w")), col("w"))
        val watch = ev.filter(col("user_id") < 10)
          .agg(sort_array(collect_set(col("user_id"))).as("us"))
        val probe = sk.select(col("w")).distinct()
          .crossJoin(broadcast(watch))
          .select(col("w"), explode(col("us")).as("user_id"))
          .select(col("w"), col("user_id"),
            ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
        CmsSketch.bucketize(probe, col("h"), col("w"), col("user_id"))
          .join(sk, Seq("w", "row_i", "bucket"), "left_outer")
          .groupBy(col("w"), col("user_id"))
          .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
          .select(fts(col("w.start")).as("window_start"), col("user_id"), col("est"))
          .orderBy(col("window_start"), col("user_id"))
      },
      Some(s"""WITH v(row_i, m, c) AS (VALUES ${graft.ops.CmsSketch.rowSpecSql()}),
              |base AS (
              |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
              |    (2654435761 * user_id + 12345) % 1000000007 AS h
              |  FROM events),
              |cells AS (
              |  SELECT ws, row_i, ((m * h + c) % 1000000007) % 512 AS bucket, COUNT(*) AS cnt
              |  FROM base CROSS JOIN v GROUP BY 1, 2, 3),
              |wins AS (SELECT DISTINCT ws FROM base),
              |watch AS (SELECT DISTINCT user_id,
              |    (2654435761 * user_id + 12345) % 1000000007 AS h
              |  FROM events WHERE user_id < 10),
              |pc AS (
              |  SELECT ws, user_id, row_i, ((m * h + c) % 1000000007) % 512 AS bucket
              |  FROM wins CROSS JOIN watch CROSS JOIN v)
              |SELECT ws AS window_start, user_id, MIN(COALESCE(cnt, 0)) AS est
              |FROM pc LEFT JOIN cells USING (ws, row_i, bucket)
              |GROUP BY 1, 2
              |ORDER BY window_start, user_id""".stripMargin),
      doc = "per-(1-day window) approximate per-user event counts via the " +
        "Count-Min sketch: <= 4x512 cells per window regardless of user " +
        "cardinality, broadcast watchlist probe (unseen users read 0) — " +
        "the rate-limit monitor shape; integer-exact, hash-certified; " +
        "plan shape shared with the watermark streaming twin"
    ),
    // ---------------------------------------------------------------- e23
    Q(
      "e23_windowed_skew",
      (s, d) => {
        // Per-(1-day tumbling window) AMS F2 of the user-activity vector —
        // the windowed form of x38, watching "how concentrated was today's
        // traffic" (the abuse/bot-detection signal, and the windowed feed
        // of x39's salt-width rule): 16 sign-sum longs PER WINDOW however
        // many users fire, beside the exact per-(window, user) count F2
        // (the certify side, which shuffles one row per pair by
        // construction). Per-window estimates share ONE fixed hash draw —
        // windows re-see the same user set, which is exactly why
        // AmsSketch premixes the key hash (kernel scaladoc) — and
        // per-window n is small here, so the measured per-window band is
        // wider than x38's whole-corpus one (0.36-1.9x across SFs,
        // 28-30/30 windows within 2x): est and exact ride side by side
        // and the error is the reader's to see. Same column pipeline as
        // the watermark streaming twin. Integer-exact, hash-certified.
        import graft.ops.AmsSketch
        val ev = Tables.events(s, d)
        val base = ev.select(
          window(col("ts"), "1 day").as("w"),
          col("user_id"),
          ((lit(2654435761L) * col("user_id") + lit(12345L)) % AmsSketch.P).as("h"))
        val z = AmsSketch.sums(
          AmsSketch.bucketize(base.select(col("w"), col("h")), col("h"), col("w")),
          col("w"))
        val est = AmsSketch.estimate(z, col("w"))
        val exact = base.groupBy(col("w"), col("user_id")).agg(count(lit(1)).as("c"))
          .groupBy(col("w")).agg(sum(col("c") * col("c")).cast("long").as("exact_f2"))
        est.join(exact, Seq("w"))
          .select(fts(col("w.start")).as("window_start"),
            col("est_mean"), col("est_mom"), col("exact_f2"))
          .orderBy(col("window_start"))
      },
      Some(s"""WITH v(row_i, a, b, c, d) AS (VALUES ${graft.ops.AmsSketch.rowSpecSql()}),
              |base AS (
              |  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws, user_id,
              |    (2654435761 * user_id + 12345) % 1000000007 AS t
              |  FROM events),
              |mx AS (SELECT ws, ${graft.ops.AmsSketch.mixSql("t")} AS h FROM base),
              |hp AS (SELECT ws, h, (h * h) % 1000000007 AS h2,
              |    (((h * h) % 1000000007) * h) % 1000000007 AS h3 FROM mx),
              |z AS (SELECT ws, row_i, CAST(SUM(1 - 2 * (((a * h3 + b * h2 + c * h + d) % 1000000007) % 2)) AS BIGINT) AS z
              |  FROM hp CROSS JOIN v GROUP BY 1, 2),
              |g AS (SELECT ws, row_i // 4 AS grp, CAST(SUM(z * z) AS BIGINT) AS gs FROM z GROUP BY 1, 2),
              |ag AS (SELECT ws, CAST(SUM(gs) AS BIGINT) AS ss, list_sort(list(gs)) AS gl FROM g GROUP BY 1),
              |ex AS (SELECT ws, CAST(SUM(c * c) AS BIGINT) AS exact_f2
              |  FROM (SELECT ws, user_id, COUNT(*) AS c FROM base GROUP BY 1, 2) GROUP BY 1)
              |SELECT ag.ws AS window_start,
              |  CAST(ss AS DOUBLE) / 16 AS est_mean,
              |  CAST(gl[2] + gl[3] AS DOUBLE) / 8 AS est_mom,
              |  exact_f2
              |FROM ag JOIN ex ON ag.ws = ex.ws
              |ORDER BY window_start""".stripMargin),
      doc = "per-(1-day window) AMS F2 of the user-activity vector (the " +
        "windowed x38: traffic-concentration / bot-burst signal, the " +
        "windowed feed of x39's salt rule): 16 sign-sums per window at any " +
        "user cardinality, est beside the exact per-pair-count truth; " +
        "integer-exact, hash-certified; plan shape shared with the " +
        "watermark streaming twin"
    ),
    // ---------------------------------------------------------------- e24
    Q(
      "e24_windowed_uniques",
      (s, d) => {
        // Per-(1-day tumbling window) KMV distinct-user estimate — "daily
        // uniques" priced the way 100 TB needs: the per-window state is
        // k=64 longs HOWEVER many distinct users appear (exact distinct
        // shuffles every distinct pair; COUNT(DISTINCT) here is the
        // certify side, carried to measure the estimator), estimate
        // (k-1)*P DIV kth stays integral so both engines agree bit-for-bit
        // (measured 0.92-1.11x of exact across SFs once k fills; EXACT
        // below k). Same aggregation runs as the watermark streaming twin.
        import org.apache.spark.sql.Encoders
        val P = 1000000007L
        val kK = 64
        val kmv = udaf(new graft.functions.Aggregates.KmvSketch(kK), Encoders.scalaLong)
        val ev = Tables.events(s, d)
        ev.select(
            window(col("ts"), "1 day").as("w"),
            col("user_id"),
            ((lit(2654435761L) * col("user_id") + lit(12345L)) % P).as("h"))
          .groupBy(col("w"))
          .agg(kmv(col("h")).as("ret"),
            countDistinct(col("user_id")).as("exact_distinct"))
          .select(
            fts(col("w.start")).as("window_start"),
            element_at(col("ret"), size(col("ret"))).as("kmv_kth"),
            expr(s"CASE WHEN size(ret) < $kK THEN CAST(size(ret) AS BIGINT) " +
              s"ELSE ${(kK - 1).toLong * P} DIV element_at(ret, size(ret)) END")
              .as("kmv_est"),
            col("exact_distinct"))
          .orderBy(col("window_start"))
      },
      Some("""WITH h AS (
             |  SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
             |    (2654435761 * user_id + 12345) % 1000000007 AS h
             |  FROM events),
             |r AS (SELECT ws, h, ROW_NUMBER() OVER (PARTITION BY ws ORDER BY h) AS rn FROM h),
             |k AS (SELECT ws, CAST(MAX(h) AS BIGINT) AS kmv_kth, COUNT(*) AS m
             |  FROM r WHERE rn <= 64 GROUP BY 1),
             |ex AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS ws,
             |    COUNT(DISTINCT user_id) AS exact_distinct
             |  FROM events GROUP BY 1)
             |SELECT k.ws AS window_start, kmv_kth,
             |  CAST(CASE WHEN m < 64 THEN m
             |    ELSE (CAST(63 AS BIGINT) * 1000000007) // kmv_kth END AS BIGINT) AS kmv_est,
             |  exact_distinct
             |FROM k JOIN ex ON k.ws = ex.ws
             |ORDER BY window_start""".stripMargin),
      doc = "per-(1-day window) KMV distinct-user estimate (daily uniques): " +
        "k=64 longs per window at any user cardinality, integral estimate " +
        "(k-1)*P DIV kth (0.92-1.11x of the carried exact count once k " +
        "fills, exact below k) — the bounded-state uniques counter; " +
        "hash-certified; same aggregation as the watermark streaming twin"
    )
  )
}
