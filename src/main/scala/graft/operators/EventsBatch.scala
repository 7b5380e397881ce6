package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2i — batch twins of the streaming window aggregations. The
  * streaming variants (same expressions behind readStream) are verified by
  * ScalaTest stream==batch equivalence; these batch twins carry the DuckDB
  * oracles. Window starts are epoch-aligned in both engines (Spark
  * `window()` and DuckDB `time_bucket`), verified at build time. */
object EventsBatch {

  val qs: Seq[(String, Q)] = Seq(

    // 1 h tumbling count/sum by event_type.
    "q_events_tumbling" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), H.dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("wstart"), col("event_type"),
                col("n"), col("sum_value"))
        .orderBy(col("wstart"), col("event_type")),
      Some(s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS wstart, event_type,
                      COUNT(*) AS n, ${H.oSum("value")} AS sum_value
               FROM events
               GROUP BY wstart, event_type
               ORDER BY wstart, event_type""")),

    // 1 h window sliding every 15 min: each event lands in 4 windows whose
    // starts are the four 15-min-aligned instants in (ts-1h, ts]. The
    // oracle reproduces exactly that with shifted time_buckets.
    "q_events_sliding" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("wstart"), col("n"))
        .orderBy(col("wstart")),
      Some("""SELECT time_bucket(INTERVAL '15 minutes', ts)
                       - k * INTERVAL '15 minutes' AS wstart,
                     COUNT(*) AS n
              FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) shifts
              GROUP BY wstart
              ORDER BY wstart""")),

    // Batch twin of st_stream_stream_join (same predicate as
    // streaming.Streams.streamStreamJoin): clicks attributed to a same-
    // user purchase within the preceding hour. Equi-key first — the
    // shuffle is on user_id, the time band is a local predicate.
    "q_events_attribution" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val buys = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("buy_id"), col("user_id"),
                  col("ts").as("buy_ts"))
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
        buys.join(clicks,
            col("user_id") === col("c_user") &&
            col("click_ts") >= col("buy_ts") - expr("INTERVAL 1 HOUR") &&
            col("click_ts") <= col("buy_ts"))
          .groupBy(col("buy_id"))
          .agg(count(lit(1)).as("n_clicks"), max(col("click_ts")).as("last_click"))
          .orderBy(col("buy_id"))
      },
      Some("""SELECT b.event_id AS buy_id, COUNT(*) AS n_clicks,
                     MAX(c.ts) AS last_click
              FROM events b JOIN events c
                ON b.user_id = c.user_id
               AND c.event_type = 'click'
               AND c.ts BETWEEN b.ts - INTERVAL '1 hour' AND b.ts
              WHERE b.event_type = 'purchase'
              GROUP BY buy_id
              ORDER BY buy_id""")),

    // Gap-filling time spine: hourly calendar across the events span LEFT
    // JOINed to hourly counts, zero-filled — the "no silent missing
    // hours" report shape. The spine generates from the data's own
    // min/max (one tiny agg broadcast).
    "q_date_spine" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir)
        val spine = e.agg(date_trunc("hour", min(col("ts"))).as("lo"),
                          date_trunc("hour", max(col("ts"))).as("hi"))
          .select(explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
        val counts = e.groupBy(date_trunc("hour", col("ts")).as("h"))
          .agg(count(lit(1)).as("n"))
        spine.join(counts, Seq("h"), "left")
          .select(col("h"), coalesce(col("n"), lit(0L)).as("n"))
          .orderBy(col("h"))
      },
      Some("""WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo,
                                date_trunc('hour', MAX(ts)) AS hi FROM events),
              spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS h
                        FROM b),
              c AS (SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
                    FROM events GROUP BY 1)
              SELECT spine.h AS h, COALESCE(c.n, 0) AS n
              FROM spine LEFT JOIN c ON spine.h = c.h
              ORDER BY h""")),

    // Session windows, 30 min gap, per user — the classic lag/flag/cumsum
    // pattern, expressed identically in both engines so rows hash-match.
    // (The streaming variant uses session_window; ScalaTest asserts it
    // agrees with this batch result.)
    "q_events_session" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
                 unix_micros(col("ts").cast("timestamp")) -
                 unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
               count(lit(1)).as("n_events"))
          .orderBy(col("user_id"), col("sess_id"))
      },
      Some("""WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sessions AS (
                SELECT user_id, ts,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS BIGINT) AS sess_id
                FROM flagged)
              SELECT user_id, sess_id, MIN(ts) AS sess_start, MAX(ts) AS sess_end,
                     COUNT(*) AS n_events
              FROM sessions
              GROUP BY user_id, sess_id
              ORDER BY user_id, sess_id""")),

    // Native session_window() in BATCH — the single-shuffle engine
    // operator behind what q_events_session spells as lag/flag/cumsum
    // (three window passes). Two boundary semantics differ from the
    // manual pattern and the oracle encodes BOTH: (1) a gap of exactly
    // 30:00 closes the native session (intervals [ts, ts+gap) merge only
    // when they OVERLAP, so the oracle flags diff >= gap, not >); (2) the
    // native session end is last_event + gap, not last_event. At scale
    // this form wins: one exchange on user_id with the merge done inside
    // the aggregation operator, vs the manual pattern's full-partition
    // sort plus two window passes before the groupBy even starts.
    "q_session_window_native" -> Q(
      (s, dir) => Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("sess_start"),
                col("sw.end").as("sess_end"), col("n_events"))
        .orderBy(col("user_id"), col("sess_start")),
      Some("""WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w >= INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              sessions AS (
                SELECT user_id, ts,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS sid
                FROM flagged)
              SELECT user_id, MIN(ts) AS sess_start,
                     MAX(ts) + INTERVAL '30 minutes' AS sess_end,
                     COUNT(*) AS n_events
              FROM sessions
              GROUP BY user_id, sid
              ORDER BY user_id, sess_start""")),

    // Gaps-and-islands: per-user runs of consecutive active calendar days.
    // The classic day - row_number() anchor groups a run into one key; all
    // the work rides a single user_id-partitioned sort (distinct + window
    // + groupBy share the exchange). Dates leave as strings — DATE columns
    // hash-compare unreliably across pandas/duckdb readers (FIXTURES.md).
    "q_gaps_islands" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        Tables.events(s, dir)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
          .withColumn("rn", row_number().over(w))
          .withColumn("anchor", date_sub(col("day"), col("rn")))
          .groupBy(col("user_id"), col("anchor"))
          .agg(min(col("day")).cast("string").as("streak_start"),
               max(col("day")).cast("string").as("streak_end"),
               count(lit(1)).as("n_days"))
          .drop("anchor")
          .orderBy(col("user_id"), col("streak_start"))
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
                            FROM events),
              seq AS (SELECT user_id, day,
                             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                                           ORDER BY day) AS INT) AS anchor
                      FROM days)
              SELECT user_id, CAST(MIN(day) AS VARCHAR) AS streak_start,
                     CAST(MAX(day) AS VARCHAR) AS streak_end,
                     COUNT(*) AS n_days
              FROM seq
              GROUP BY user_id, anchor
              ORDER BY user_id, streak_start""")),

    // Ordered conversion funnel view -> click -> purchase: each stage is
    // min(ts) strictly after the previous stage's instant. Three
    // aggregations, all keyed on user_id — one shuffle partitioning reused
    // end-to-end (the dimension side is ~|users| rows and broadcasts).
    // Elapsed time emitted as epoch-microsecond difference: engine-neutral
    // arithmetic, unlike second-granularity datediff (Spark truncates
    // elapsed time, DuckDB counts boundary crossings).
    "q_funnel" -> Q(
      (s, dir) => {
        val e = Tables.events(s, dir).select(col("user_id"), col("event_type"), col("ts"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("v_ts"))
        val c = e.filter(col("event_type") === "click").join(v, "user_id")
          .filter(col("ts") > col("v_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("c_ts"))
        val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
          .filter(col("ts") > col("c_ts"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("p_ts"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("p_ts").isNotNull, lit(3L))
              .when(col("c_ts").isNotNull, lit(2L)).otherwise(lit(1L)).as("stage"),
            coalesce(unix_micros(col("p_ts").cast("timestamp")) -
                     unix_micros(col("v_ts").cast("timestamp")), lit(-1L))
              .as("usecs_to_purchase"))
          .orderBy(col("user_id"))
      },
      Some("""WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
                         WHERE event_type = 'view' GROUP BY 1),
              c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
                    FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.v_ts
                    WHERE e.event_type = 'click' GROUP BY 1),
              p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
                    FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
                    WHERE e.event_type = 'purchase' GROUP BY 1)
              SELECT v.user_id AS user_id,
                     CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                               WHEN c.c_ts IS NOT NULL THEN 2
                               ELSE 1 END AS BIGINT) AS stage,
                     COALESCE(epoch_us(p.p_ts) - epoch_us(v.v_ts), -1)
                       AS usecs_to_purchase
              FROM v LEFT JOIN c ON v.user_id = c.user_id
                     LEFT JOIN p ON v.user_id = p.user_id
              ORDER BY v.user_id""")),

    // Weekly cohort retention: cohort = week of first activity, one output
    // row per (cohort_week, week_offset) with distinct active users. The
    // distinct (user, week) grid and the per-user min share one user_id
    // exchange; integer week arithmetic (DIV) is trunc-vs-floor-safe here
    // because all day offsets are non-negative.
    "q_retention" -> Q(
      (s, dir) => {
        val weeks = Tables.events(s, dir)
          .select(col("user_id"),
            expr("CAST(datediff(to_date(ts), DATE'2024-01-01') DIV 7 AS BIGINT)").as("week"))
          .distinct()
        val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
        weeks.join(cohorts, "user_id")
          .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH weeks AS (SELECT DISTINCT user_id,
                                    date_diff('day', DATE '2024-01-01',
                                              CAST(ts AS DATE)) // 7 AS week
                             FROM events),
              coh AS (SELECT user_id, MIN(week) AS cohort_week
                      FROM weeks GROUP BY 1)
              SELECT coh.cohort_week, weeks.week - coh.cohort_week AS week_offset,
                     COUNT(*) AS n_users
              FROM weeks JOIN coh ON weeks.user_id = coh.user_id
              GROUP BY 1, 2
              ORDER BY 1, 2""")),

    // Cohort lifetime value — the monetary companion of q_retention's
    // activity matrix: customers group by first-order month, and each
    // (cohort, months-since) cell reports cumulative revenue and LTV per
    // cohort customer — the payback-curve table. The corpus reduces to
    // the cohort×offset grid before the cumulative window (grid-sized,
    // ~84² cells max); cohort sizes broadcast back; revenue lanes stay
    // exact decimal until emit.
    "q_cohort_ltv" -> Q(
      (s, dir) => {
        val om = Tables.orders(s, dir)
          .select(col("o_custkey"),
                  (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
                    .cast("long").as("m"),
                  col("o_totalprice"))
        // coh feeds the grid join AND the cohort-size table — PlanCut
        // shares its reduce exchange between the two consumers (r15)
        val coh = org.apache.spark.sql.graft.PlanCut.once(
          om.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort_m")))
        val grid = om.join(coh, Seq("o_custkey"))
          .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("month_offset"))
          .agg(sum(col("o_totalprice").cast(graft.H.D)).as("rev"))
        val sizes = coh.groupBy(col("cohort_m")).agg(count(lit(1)).as("n_customers"))
        val wc = Window.partitionBy(col("cohort_m")).orderBy(col("month_offset"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        grid.withColumn("cum", sum(col("rev")).over(wc))
          .join(broadcast(sizes), Seq("cohort_m"))
          // LTV divides in DOUBLE on purpose: decimal division here would
          // round HALF_UP at Spark's derived scale while DuckDB routes
          // decimal/bigint through DOUBLE — a measured half-ulp tie
          // hazard (13 rows at sf0.01). One IEEE division of the same
          // two exact inputs is bit-identical on both engines.
          .select(col("cohort_m"), col("month_offset"), col("n_customers"),
                  col("cum").cast("double").as("cum_rev"),
                  (col("cum").cast("double") / col("n_customers"))
                    .as("ltv_per_customer"))
          .orderBy(col("cohort_m"), col("month_offset"))
      },
      Some("""WITH om AS (SELECT o_custkey,
                                 year(o_orderdate) * 12 + month(o_orderdate) AS m,
                                 o_totalprice
                          FROM orders),
                   coh AS (SELECT o_custkey, MIN(m) AS cohort_m FROM om GROUP BY 1),
                   grid AS (SELECT cohort_m, om.m - cohort_m AS month_offset,
                                   SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
                            FROM om JOIN coh USING (o_custkey) GROUP BY 1, 2),
                   sz AS (SELECT cohort_m, COUNT(*) AS n_customers FROM coh GROUP BY 1)
              SELECT CAST(cohort_m AS BIGINT) AS cohort_m,
                     CAST(month_offset AS BIGINT) AS month_offset, n_customers,
                     CAST(cum AS DOUBLE) AS cum_rev,
                     CAST(cum AS DOUBLE) / n_customers AS ltv_per_customer
              FROM (SELECT g.cohort_m, g.month_offset, n_customers,
                           SUM(rev) OVER (PARTITION BY g.cohort_m
                             ORDER BY g.month_offset ROWS BETWEEN UNBOUNDED
                             PRECEDING AND CURRENT ROW) AS cum
                    FROM grid g JOIN sz USING (cohort_m)) z
              ORDER BY cohort_m, month_offset""")),

    // Peak session concurrency per hour — interval overlap WITHOUT an
    // interval self-join (which is quadratic in the overlap degree). The
    // sweep-line shape: each session [start, end] becomes a +1 and a −1
    // marker, concurrency is the running sum of markers in time order,
    // and the report takes the max per hour. Distributed as a TWO-LEVEL
    // prefix scan: (a) running sum WITHIN each hour partition (scales —
    // ~one hour of markers per task), (b) carry-in offsets from the
    // per-hour marker totals, a tiny aggregate whose own prefix sum runs
    // on one partition of |hours| rows and broadcasts back. No global
    // sort of the markers anywhere. Ties: +1 sorts before −1 at the same
    // instant (touching sessions count as concurrent); permutations
    // within equal (ts, delta) can't change the per-hour max, so the
    // result is deterministic without a unique tiebreaker.
    "q_concurrent_sessions" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        // ONE materialized session table (r15): sess feeds FOUR plan
        // paths (two marker union legs x the offsets and sweep branches)
        // — left declarative, the events scan + sessionization windows
        // ran four times (8 parquet scans in the r14 plan, zero
        // ReusedExchange). Memo.cut (reliable checkpoint on a cluster,
        // localCheckpoint locally), not PlanCut: the frame's tail AFTER
        // its last exchange is the sort + two windows + aggregate, which
        // a shuffle-sharing rebase would still re-run once per consumer.
        val sess = graft.llm.Memo.cut(s)(
          Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
                 unix_micros(col("ts").cast("timestamp")) -
                 unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end")))
        val markers = sess.select(col("sess_start").as("ts"), lit(1L).as("delta"))
          .unionAll(sess.select(col("sess_end").as("ts"), lit(-1L).as("delta")))
          .withColumn("hour", date_trunc("hour", col("ts")))
        val wIn = Window.partitionBy(col("hour"))
          .orderBy(col("ts"), col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val offsets = markers.groupBy(col("hour")).agg(sum(col("delta")).as("d"))
          .withColumn("carry_in", coalesce(
            sum(col("d")).over(Window.orderBy(col("hour"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("hour"), col("carry_in"))
        markers
          .withColumn("run", sum(col("delta")).over(wIn))
          .join(broadcast(offsets), "hour")
          .groupBy(col("hour"))
          .agg(max(col("run") + col("carry_in")).as("max_concurrent"),
               sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_starts"))
          .orderBy(col("hour"))
      },
      Some("""WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              numbered AS (
                SELECT user_id, ts,
                       SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND CURRENT ROW) AS sess_id
                FROM flagged),
              sess AS (
                SELECT user_id, sess_id, MIN(ts) AS sess_start, MAX(ts) AS sess_end
                FROM numbered GROUP BY user_id, sess_id),
              markers AS (
                SELECT sess_start AS ts, CAST(1 AS BIGINT) AS delta FROM sess
                UNION ALL
                SELECT sess_end AS ts, CAST(-1 AS BIGINT) AS delta FROM sess),
              swept AS (
                SELECT date_trunc('hour', ts) AS hour, delta,
                       SUM(delta) OVER (ORDER BY ts, delta DESC
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS run
                FROM markers)
              SELECT hour, CAST(MAX(run) AS BIGINT) AS max_concurrent,
                     CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_starts
              FROM swept
              GROUP BY hour
              ORDER BY hour""")),

    // Interval-overlap JOIN, bucket-blocked: user sessions (30-min-gap
    // sessionization, the q_concurrent_sessions grain) joined to
    // "incident windows" (hours with >= 5 error events) they overlap.
    // The naive plan is a theta-join (sess_start < win_end AND sess_end
    // > win_start) — a cartesian at scale. Instead each session explodes
    // into the hour buckets it spans (sessions are 30-min-gap-bounded, so
    // the fan-out is small) and the join is an EQUI-join on the bucket
    // key: sessions shuffle-partition by hour, incidents are a reduced
    // hour-level table (broadcastable at any scale — there are only
    // 8760 hours/year). Exactness: a window is exactly one bucket, so an
    // overlapping pair meets in precisely that bucket (no dup pairs, no
    // distinct needed), and the exact theta predicate re-checks on the
    // candidates to drop same-bucket non-overlaps (the zero-length point
    // touch). Overlap length in integer microseconds — no double leaves
    // the plan. Oracle: DuckDB keeps the dense theta-join.
    "q_join_interval" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val sess = Tables.events(s, dir)
          .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
          .withColumn("new_sess",
            when(col("prev_ts").isNull ||
                 unix_micros(col("ts").cast("timestamp")) -
                 unix_micros(col("prev_ts").cast("timestamp")) > 1800000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"))
        val inc = Tables.events(s, dir)
          .filter(col("event_type") === "error")
          .groupBy(date_trunc("hour", col("ts")).as("win_start"))
          .agg(count(lit(1)).as("n_err"))
          .filter(col("n_err") >= 5)
          .withColumn("win_end", col("win_start") + expr("INTERVAL 1 HOUR"))
        sess
          .withColumn("hour", explode(expr(
            """sequence(date_trunc('hour', sess_start),
                        date_trunc('hour', sess_end), interval 1 hour)""")))
          .join(broadcast(inc), col("hour") === col("win_start"))
          .filter(col("sess_start") < col("win_end") &&
                  col("sess_end") > col("win_start"))
          .select(col("win_start"), col("user_id"), col("sess_id"),
                  (least(unix_micros(col("sess_end").cast("timestamp")),
                         unix_micros(col("win_end").cast("timestamp"))) -
                   greatest(unix_micros(col("sess_start").cast("timestamp")),
                            unix_micros(col("win_start").cast("timestamp"))))
                    .as("overlap_us"),
                  col("n_err"))
          .orderBy(col("win_start"), col("user_id"), col("sess_id"))
      },
      Some("""WITH flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                            THEN 1 ELSE 0 END AS new_sess
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
              numbered AS (
                SELECT user_id, ts,
                       CAST(SUM(new_sess) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id
                                                ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS BIGINT) AS sess_id
                FROM flagged),
              sess AS (
                SELECT user_id, sess_id, MIN(ts) AS sess_start, MAX(ts) AS sess_end
                FROM numbered GROUP BY user_id, sess_id),
              inc AS (
                SELECT win_start, win_start + INTERVAL '1 hour' AS win_end, n_err
                FROM (SELECT date_trunc('hour', ts) AS win_start,
                             COUNT(*) AS n_err
                      FROM events WHERE event_type = 'error'
                      GROUP BY 1 HAVING COUNT(*) >= 5))
              SELECT i.win_start, s.user_id, s.sess_id,
                     epoch_us(least(s.sess_end, i.win_end))
                       - epoch_us(greatest(s.sess_start, i.win_start)) AS overlap_us,
                     i.n_err
              FROM sess s JOIN inc i
                ON s.sess_start < i.win_end AND s.sess_end > i.win_start
              ORDER BY i.win_start, s.user_id, s.sess_id""")),

    // Clamped running balance — bal_i = max(0, bal_{i-1} + delta_i),
    // the inventory / prepaid-credit / rate-limit-bucket fold. The
    // clamp makes this genuinely NON-LINEAR: no window sum expresses it
    // (a floor hit erases history), so it rides the per-key in-row left
    // fold (the q_ewma machinery) — one user_id shuffle, a bounded
    // sorted array, and a sequential fold both engines execute in the
    // same order over the same doubles. Deposits are purchase/signup
    // values, everything else draws down. DuckDB's list_reduce has no
    // init accumulator, so the oracle prepends the 0 seed (first fold
    // step is then greatest(0, 0 + d1), identical to Spark's init).
    "q_capped_running_sum" -> Q(
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(array_sort(collect_list(struct(
            col("ts"), col("event_id"), col("event_type"), col("value")))).as("a"))
          .select(col("user_id"),
                  size(col("a")).cast("bigint").as("n_events"),
                  round(expr(
                    """aggregate(
                         transform(a, x -> CASE WHEN x.event_type IN
                             ('purchase', 'signup') THEN x.value
                           ELSE -x.value END),
                         CAST(0.0 AS DOUBLE),
                         (acc, d) -> greatest(CAST(0.0 AS DOUBLE), acc + d))"""),
                        6).as("balance"))
          .orderBy(col("user_id"))
      },
      Some("""WITH d AS (SELECT user_id,
                     list(CASE WHEN event_type IN ('purchase', 'signup')
                               THEN value ELSE -value END
                          ORDER BY ts, event_id) AS deltas
                   FROM events GROUP BY 1)
              SELECT user_id, CAST(len(deltas) AS BIGINT) AS n_events,
                     round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), deltas),
                                       (acc, x) -> greatest(0.0, acc + x)), 6)
                       AS balance
              FROM d ORDER BY user_id""")),

    // Path analysis — the top converting paths: for each purchase, the
    // ordered types of the user's up-to-3 immediately preceding events,
    // rendered as a path string and counted corpus-wide. One per-user
    // window (shared exchange with every other user-keyed op) builds
    // the trailing context in-frame — bounded 3-element state per row,
    // never a per-user history array — then a plain count/top-10. The
    // product-analytics complement to q_markov's one-step transition
    // matrix: paths keep ORDER over multiple steps.
    "q_funnel_paths" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-3, -1)
        Tables.events(s, dir)
          .withColumn("path_arr", collect_list(col("event_type")).over(w))
          .filter(col("event_type") === "purchase")
          .select(concat_ws(">", col("path_arr")).as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(10)
      },
      Some("""WITH p AS (
                SELECT event_type,
                       COALESCE(array_to_string(list(event_type) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), '>'), '')
                         AS path
                FROM events)
              SELECT path, COUNT(*) AS n
              FROM p WHERE event_type = 'purchase'
              GROUP BY 1 ORDER BY n DESC, path LIMIT 10""")),

    // Inter-arrival gap profile — the measurement that SIZES the 30-min
    // session gap and the streaming watermark instead of guessing them:
    // per user, the distribution of gaps between consecutive events
    // (p50/p95/p99/max, integer microseconds) plus how many gaps a
    // 30-min threshold would split into new sessions (each such gap IS
    // one session boundary in q_events_session — the spec pins that
    // identity). One lag on the user_id exchange, one global reduce;
    // the percentile uses the exact percentile/quantile_cont parity
    // (q_agg_percentile spelling — integer inputs interpolate exactly).
    "q_gap_profile" -> Q(
      (s, dir) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("tu"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
                  unix_micros(col("ts").cast("timestamp")).as("tu"))
          .withColumn("gap_us", col("tu") - lag(col("tu"), 1).over(byUser))
          .filter(col("gap_us").isNotNull)
          .agg(count(lit(1)).as("n_gaps"),
               expr("round(percentile(gap_us, 0.5), 6)").as("p50_us"),
               expr("round(percentile(gap_us, 0.95), 6)").as("p95_us"),
               expr("round(percentile(gap_us, 0.99), 6)").as("p99_us"),
               max(col("gap_us")).as("max_us"),
               sum(when(col("gap_us") > 1800000000L, 1L).otherwise(0L))
                 .as("n_session_breaks"))
      },
      Some("""WITH g AS (
                SELECT user_id,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY ts, event_id)
                         AS gap_us
                FROM events)
              SELECT COUNT(*) AS n_gaps,
                     round(quantile_cont(gap_us, 0.5), 6) AS p50_us,
                     round(quantile_cont(gap_us, 0.95), 6) AS p95_us,
                     round(quantile_cont(gap_us, 0.99), 6) AS p99_us,
                     CAST(MAX(gap_us) AS BIGINT) AS max_us,
                     CAST(SUM(CASE WHEN gap_us > 1800000000
                              THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_session_breaks
              FROM g WHERE gap_us IS NOT NULL""")),

    // Interval-union coverage per user: each event opens a 5-minute
    // activity interval; overlaps must count once (uptime/SLA math, where
    // naive n_events x 5min double-bills bursts). The one-sweep island
    // method: running ROWS-framed max of interval ends spots each gap
    // (start strictly past everything open so far), a running flag sum
    // numbers the islands, and coverage is the exact sum of island
    // extents. Everything is integer epoch-microseconds — no doubles
    // anywhere — and BOTH windows plus both groupBys ride the single
    // user_id exchange (same partition key, same sort), so the fact table
    // shuffles exactly once regardless of scale.
    "q_interval_union" -> Q(
      (s, dir) => {
        val ord = Window.partitionBy(col("user_id"))
          .orderBy(col("st"), col("event_id"))
        val iv = Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
                  unix_micros(col("ts").cast("timestamp")).as("st"))
          .withColumn("en", col("st") + 300000000L)
        iv.withColumn("pm", max(col("en")).over(
              ord.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("ni", when(col("pm").isNull || col("st") > col("pm"), 1L)
                              .otherwise(0L))
          .withColumn("island", sum(col("ni")).over(
              ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("island"))
          .agg(min(col("st")).as("ist"), max(col("en")).as("ien"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_islands"),
               sum(col("ien") - col("ist")).as("covered_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS st,
                                 epoch_us(ts) + 300000000 AS en
                          FROM events),
                   f AS (SELECT user_id, event_id, st, en,
                                MAX(en) OVER (PARTITION BY user_id
                                  ORDER BY st, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS pm
                         FROM iv),
                   h AS (SELECT user_id, st, en,
                                SUM(CASE WHEN pm IS NULL OR st > pm
                                         THEN 1 ELSE 0 END) OVER (
                                  PARTITION BY user_id
                                  ORDER BY st, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS island
                         FROM f),
                   i AS (SELECT user_id, island,
                                MIN(st) AS ist, MAX(en) AS ien
                         FROM h GROUP BY 1, 2)
              SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
                     CAST(SUM(ien - ist) AS BIGINT) AS covered_us
              FROM i GROUP BY 1 ORDER BY 1"""))
  )
}
