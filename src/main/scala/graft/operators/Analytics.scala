package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-5 analytics additions: cumulative-distinct growth, robust
  * (MAD) outlier detection, a Welch two-sample test computed from one
  * aggregation pass, and the incremental partial-aggregate merge that
  * backs warehouse-style "yesterday's state + today's delta" rollups.
  *
  * Scale notes are per-operator; the common theme is REDUCE FIRST:
  * every global window / driver-visible structure here operates on a
  * group-reduced table (days, event types, priorities), never on the
  * raw fact table, so the only full-corpus costs are map-side-combined
  * aggregations and broadcast joins against tiny reduced tables. */
object Analytics {

  /** Undirected co-supply edges (u < v): suppliers linked when they share
    * a (nation, part) block. JOIN-FREE (r6 rewrite): the former
    * ps.as("a") ⋈ ps.as("b") self-join on (nk, p) emitted Σ group² probe
    * pairs — one hot part with k suppliers in a nation costs k² through
    * the join even though only C(k,2) pairs survive. Instead reduce to
    * ONE sorted supplier set per (nation, part) (collect_set
    * partial-merges map-side) and explode the C(k,2) in-row pairs
    * (H.pairsE — the q_basket_pairs pattern): two linear shuffles, same
    * edge set. array_sort gives a < b in-row; the trailing distinct()
    * still collapses pairs that co-occur under several (nation, part)
    * blocks. Shared by q_graph_triangles and q_pagerank_iter; both
    * oracles keep the self-join SQL — the hash gate proves equivalence. */
  private[graft] def coSupplyEdgesPlan(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir)
      .select(col("s_suppkey").as("sk"), col("s_nationkey").as("nk"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
      .join(broadcast(sup), Seq("sk"))
      .groupBy(col("nk"), col("p"))
      .agg(array_sort(collect_set(col("sk"))).as("ss"))
      .select(explode(expr(H.pairsE("ss"))).as("pr"))
      .select(col("pr.a").as("u"), col("pr.b").as("v"))
      .distinct()
  }

  /** The edge table as a memoized write-once stage (graft.llm.Memo —
    * same checkpoint discipline as the shingle/near-pair stages, keyed
    * on max(mtime) over BOTH inputs, lineitem and supplier, so
    * regenerating either alone invalidates the cached edge table):
    * triangles, pagerank, and assortativity are a
    * pipeline DAG off ONE materialized edge list, and Bench charges the
    * build to its own stage:co_supply_edges line item instead of
    * whichever graph key runs first. [[coSupplyEdgesPlan]] stays
    * un-memoized for PlanAuditSpec to audit the builder's plan. */
  private[graft] def coSupplyEdges(s: SparkSession, dir: String): DataFrame =
    graft.llm.Memo.stage(s, dir, "co_supply_edges",
                         Seq("lineitem.parquet", "supplier.parquet")) {
      graft.llm.Memo.cut(s)(coSupplyEdgesPlan(s, dir))
    }

  val qs: Seq[(String, Q)] = Seq(

    // Cumulative distinct users by hour. The naive shape (COUNT(DISTINCT
    // user) OVER (ORDER BY day)) re-scans the user set per day; the
    // scalable identity is first-appearance day: a user contributes to
    // the cumulative count from min(day) onward, so one per-user reduce
    // (map-side combined) + a day-level running sum over the ~hundreds-
    // row day table gives the same numbers with one corpus shuffle on
    // user_id and a single-partition window over days only.
    "q_running_distinct" -> Q(
      (s, dir) => {
        val first = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(min(date_trunc("hour", col("ts"))).as("day"))
        val daily = first.groupBy(col("day"))
          .agg(count(lit(1)).as("new_users"))
        daily
          .select(col("day"), col("new_users"),
                  sum(col("new_users")).over(Window.orderBy(col("day")))
                    .as("cum_users"))
          .orderBy(col("day"))
      },
      Some("""WITH f AS (SELECT user_id, MIN(date_trunc('hour', ts)) AS day
                         FROM events GROUP BY 1),
                   d AS (SELECT day, COUNT(*) AS new_users FROM f GROUP BY 1)
              SELECT day, new_users,
                     CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
              FROM d ORDER BY day""")),

    // Robust outlier report: median + MAD (median absolute deviation)
    // per event_type, flagging |v - med| > 3 * 1.4826 * MAD (the normal-
    // consistency constant). Exact medians need two passes by nature
    // (med, then deviations) — both are group-reduced aggregations with
    // the 5-row med/mad tables broadcast back, so the corpus is scanned
    // but never shuffled on anything wider than event_type. Medians and
    // deviations round at 6 so Spark percentile == DuckDB quantile_cont
    // bit-for-bit (the documented libm-parity grain).
    "q_anomaly_mad" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.5)"), 6).as("med"))
        val dev = ev.join(broadcast(med), Seq("event_type"))
          .withColumn("dev", round(abs(col("value") - col("med")), 6))
        val mad = dev.groupBy(col("event_type"))
          .agg(round(expr("percentile(dev, 0.5)"), 6).as("mad"),
               min(col("med")).as("med"))
        dev.drop("med").join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
               min(col("med")).as("med"),
               min(col("mad")).as("mad"),
               sum(when(col("dev") > round(lit(4.4478) * col("mad"), 6), 1L)
                     .otherwise(0L)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH med AS (SELECT event_type,
                                  round(quantile_cont(value, 0.5), 6) AS med
                           FROM events GROUP BY 1),
                   dev AS (SELECT e.event_type,
                                  round(abs(e.value - m.med), 6) AS dev, m.med
                           FROM events e JOIN med m USING (event_type)),
                   mad AS (SELECT event_type,
                                  round(quantile_cont(dev, 0.5), 6) AS mad,
                                  MIN(med) AS med
                           FROM dev GROUP BY 1)
              SELECT d.event_type AS event_type, COUNT(*) AS n,
                     MIN(m.med) AS med, MIN(m.mad) AS mad,
                     CAST(SUM(CASE WHEN d.dev > round(4.4478 * m.mad, 6)
                                   THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
              FROM dev d JOIN mad m USING (event_type)
              GROUP BY 1 ORDER BY 1""")),

    // Welch's unequal-variance t between purchase and signup amounts,
    // computed from ONE map-side-combined aggregation pass: conditional
    // exact-decimal power sums (the q_outliers spelling), then mean /
    // variance / t / Welch-Satterthwaite df derived with identical
    // double expression trees on both engines. At 100 TB this is the
    // cheapest possible shape — a single scan reducing to one row.
    "q_ab_test" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val d = col("value").cast("decimal(18,4)")
        val isA = col("event_type") === "purchase"
        val isB = col("event_type") === "signup"
        val agg = ev.agg(
          sum(when(isA, 1L).otherwise(0L)).as("na"),
          sum(when(isB, 1L).otherwise(0L)).as("nb"),
          sum(when(isA, d)).cast("double").as("sa"),
          sum(when(isB, d)).cast("double").as("sb"),
          sum(when(isA, d * d)).cast("double").as("qa"),
          sum(when(isB, d * d)).cast("double").as("qb"))
        val ma = col("sa") / col("na"); val mb = col("sb") / col("nb")
        val va = (col("qa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
        val vb = (col("qb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
        val sea = va / col("na"); val seb = vb / col("nb")
        agg.select(
          col("na"), col("nb"),
          round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
          round((ma - mb) / sqrt(sea + seb), 6).as("t_stat"),
          round((sea + seb) * (sea + seb) /
                  (sea * sea / (col("na") - 1) + seb * seb / (col("nb") - 1)),
                6).as("df_welch"))
      },
      Some("""WITH a AS (
                SELECT CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS na,
                       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS nb,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS sa,
                       CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS sb,
                       CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'purchase') AS DOUBLE) AS qa,
                       CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) FILTER (WHERE event_type = 'signup') AS DOUBLE) AS qb
                FROM events)
              SELECT na, nb,
                     round(sa / na, 6) AS mean_a, round(sb / nb, 6) AS mean_b,
                     round((sa / na - sb / nb)
                           / sqrt(((qa - sa * sa / na) / (na - 1)) / na
                                  + ((qb - sb * sb / nb) / (nb - 1)) / nb), 6) AS t_stat,
                     round((((qa - sa * sa / na) / (na - 1)) / na
                            + ((qb - sb * sb / nb) / (nb - 1)) / nb)
                           * (((qa - sa * sa / na) / (na - 1)) / na
                              + ((qb - sb * sb / nb) / (nb - 1)) / nb)
                           / ((((qa - sa * sa / na) / (na - 1)) / na)
                              * (((qa - sa * sa / na) / (na - 1)) / na) / (na - 1)
                              + (((qb - sb * sb / nb) / (nb - 1)) / nb)
                                * (((qb - sb * sb / nb) / (nb - 1)) / nb) / (nb - 1)),
                           6) AS df_welch
              FROM a""")),

    // Incremental aggregation: the partial-aggregate merge that turns a
    // full-history rollup into O(delta) work. "State" (orders before the
    // cutoff) and "delta" (after) are each reduced to per-priority
    // (n, sum) partials — the mergeable form — and the final rollup is
    // an agg over their union: 2 rows per group, never a re-scan of
    // history. avg derives from the merged sums. The two partial sums
    // are exact decimals emitted as doubles; their 2-term re-sum is
    // order-insensitive (IEEE addition is commutative).
    "q_incremental_agg" -> Q(
      (s, dir) => {
        val cutoff = lit("2001-01-01").cast("timestamp_ntz")
        val o = Tables.orders(s, dir)
        def partial(f: org.apache.spark.sql.Column) =
          o.filter(f).groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n"),
                 sum(col("o_totalprice").cast("decimal(38,4)")).cast("double").as("sd"))
        partial(col("o_orderdate") < cutoff)
          .unionByName(partial(col("o_orderdate") >= cutoff))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("n")).as("n_orders"),
               sum(col("sd")).as("total"))
          .select(col("o_orderpriority"), col("n_orders"), col("total"),
                  round(col("total") / col("n_orders"), 6).as("avg_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH part AS (
                SELECT o_orderpriority, o_orderdate < TIMESTAMP '2001-01-01' AS is_state,
                       COUNT(*) AS n,
                       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS sd
                FROM orders GROUP BY 1, 2)
              SELECT o_orderpriority,
                     CAST(SUM(n) AS BIGINT) AS n_orders,
                     CAST(SUM(sd) AS DOUBLE) AS total,
                     round(CAST(SUM(sd) AS DOUBLE) / CAST(SUM(n) AS BIGINT), 6) AS avg_price
              FROM part GROUP BY 1 ORDER BY 1""")),

    // Correlated LATERAL subquery join — top-2 customers by balance per
    // nation, written as the SQL-standard lateral (the shape BI tools
    // emit). Catalyst decorrelates the ORDER BY/LIMIT subquery into a
    // ranked window join rather than executing it per outer row, so the
    // plan is one customer shuffle — per-row re-execution would be the
    // classic 100 TB killer.
    "q_join_lateral" -> Q(
      (s, dir) => {
        Tables.nation(s, dir).createOrReplaceTempView("graft_lat_nation")
        Tables.customer(s, dir).createOrReplaceTempView("graft_lat_customer")
        s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
                 FROM graft_lat_nation n
                 JOIN LATERAL (SELECT c_name, c_acctbal
                               FROM graft_lat_customer c
                               WHERE c.c_nationkey = n.n_nationkey
                               ORDER BY c_acctbal DESC, c_name LIMIT 2) t
                 ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
      },
      Some("""SELECT n.n_name AS n_name, t.c_name AS c_name,
                     t.c_acctbal AS c_acctbal
              FROM nation n,
                   LATERAL (SELECT c_name, c_acctbal FROM customer c
                            WHERE c.c_nationkey = n.n_nationkey
                            ORDER BY c_acctbal DESC, c_name LIMIT 2) t
              ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")),

    // Triangle census of the within-nation co-supply graph: suppliers
    // are linked when they sit in the same nation AND supply the same
    // part. The nation block is load-bearing twice over — semantically
    // (regional supplier clustering is the question triangle density
    // answers) and mechanically (the unblocked co-supply graph is near-
    // COMPLETE on this data, so global triangle counting degenerates to
    // n³/6 wedges — measured 141 s at sf0.1 before blocking, ~1 s
    // after). Edges come from the join-free per-(nation, part) supplier-
    // set explosion (coSupplyEdges above); triangles close oriented
    // wedges (u<v<w), counting each once. At real scale the orientation
    // key becomes (degree, id) — capping oriented out-degree at
    // O(sqrt(|E|)) on skewed graphs — with the id fallback kept as the
    // tiebreaker; the plan shape (two hash joins on oriented edges) is
    // unchanged.
    "q_graph_triangles" -> Q(
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val nodes = e.select(col("u").as("x"))
          .unionByName(e.select(col("v").as("x")))
          .agg(countDistinct(col("x")).as("n_nodes"))
        val edges = e.agg(count(lit(1)).as("n_edges"))
        val tris = e.as("e1")
          .join(e.as("e2"), col("e1.v") === col("e2.u"))
          .join(e.as("e3"),
            col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
          .agg(count(lit(1)).as("n_triangles"))
        nodes.crossJoin(edges).crossJoin(tris)
      },
      Some("""WITH ps AS (SELECT DISTINCT s.s_nationkey AS nk,
                                          l.l_partkey AS p, l.l_suppkey AS s
                          FROM lineitem l
                          JOIN supplier s ON l.l_suppkey = s.s_suppkey),
                   e AS (SELECT DISTINCT a.s AS u, b.s AS v
                         FROM ps a JOIN ps b
                           ON a.nk = b.nk AND a.p = b.p AND a.s < b.s),
                   n AS (SELECT COUNT(DISTINCT x) AS n_nodes
                         FROM (SELECT u AS x FROM e
                               UNION ALL SELECT v AS x FROM e)),
                   m AS (SELECT COUNT(*) AS n_edges FROM e),
                   t AS (SELECT COUNT(*) AS n_triangles
                         FROM e e1
                         JOIN e e2 ON e1.v = e2.u
                         JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
              SELECT n.n_nodes, m.n_edges, t.n_triangles FROM n, m, t""")),

    // Exponentially weighted moving average per user (alpha = 0.5, an
    // exact binary fraction — no accumulation-order float drift): the
    // inherently sequential per-key recurrence s_i = a·v_i + (1-a)·s_{i-1},
    // expressed as one shuffle on user_id + an in-row left fold over the
    // (ts, event_id)-sorted value array. Both engines fold left in the
    // same order with the same double ops, so results are bit-identical.
    // STATE BOUND (r6): per-key state is explicitly capped at the first
    // STATE_CAP events per user — the row_number prefix filter runs
    // BEFORE collect_list (sharing the groupBy's user_id exchange), so a
    // hot key at 100 TB folds its first STATE_CAP events instead of
    // OOMing one task on an unbounded array. The cap is part of the
    // declared semantics (both engines apply the identical prefix
    // filter) and sits far above the fixture max (99 events/user at
    // sf0.1), so oracle values are unchanged. The SAME cap now bounds
    // the streaming twin's fold (Streams.EWMA_STATE_CAP — one shared
    // constant), so batch == streaming on ANY input, not just fixtures
    // under the cap; StreamingSpec pins the boundary with a 5000-event
    // hot key. The cap's prefix ordering tiebreaks through `value`
    // (r7): (ts, event_id) uniqueness is a fixture fact, not a schema
    // guarantee, and without the full-row tiebreak WHICH duplicates
    // survive the cap would be engine-nondeterministic.
    "q_ewma" -> Q(
      (s, dir) => {
        val STATE_CAP = graft.streaming.Streams.EWMA_STATE_CAP
        val wu = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"), col("value"))
        Tables.events(s, dir)
          .withColumn("rn", row_number().over(wu))
          .filter(col("rn") <= STATE_CAP)
          .groupBy(col("user_id"))
          .agg(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("a"))
          .select(col("user_id"), size(col("a")).cast("bigint").as("n_events"),
                  round(expr(
                    """aggregate(slice(a, 2, size(a) - 1),
                                 CAST(element_at(a, 1).value AS DOUBLE),
                                 (acc, x) -> acc * 0.5 + x.value * 0.5)"""),
                        6).as("ewma"))
          .orderBy(col("user_id"))
      },
      Some(s"""WITH capped AS (SELECT user_id, ts, event_id, value FROM events
                              QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id, value)
                                <= ${graft.streaming.Streams.EWMA_STATE_CAP}),
                   u AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                         FROM capped GROUP BY 1)
              SELECT user_id, CAST(len(vals) AS BIGINT) AS n_events,
                     round(CASE WHEN len(vals) = 1 THEN vals[1]
                           ELSE list_reduce(vals, (acc, x) -> acc * 0.5 + x * 0.5)
                           END, 6) AS ewma
              FROM u ORDER BY user_id""")),

    // Exact mergeable distinct-count via bitmap words — the bitmap-index
    // pattern for DENSE bounded id domains: pack presence into 32-bit
    // words keyed by id DIV 32 (32 not 64: both engines' checked shifts
    // overflow at bit 63), OR-combine per word (associative/commutative
    // like the HLL registers, but EXACT), then sum popcounts. The
    // shuffle carries one word per (group, id-block) — for a 10^9-user
    // id space that is ~31M words per group vs shipping every raw id to
    // a distinct; and stored word tables re-roll to any coarser grouping
    // by the same bit_or. The oracle pins bitmap == COUNT(DISTINCT).
    "q_bitmap_distinct" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val words = ev.groupBy(col("event_type"), (col("user_id") / 32).cast("bigint").as("blk"))
          .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT)))").as("w"))
        val viaBitmap = words.groupBy(col("event_type"))
          .agg(sum(expr("bit_count(w)")).cast("bigint").as("n_bitmap"))
        val exact = ev.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        viaBitmap.join(exact, Seq("event_type"))
          .select(col("event_type"), col("n_bitmap"), col("n_exact"),
                  (col("n_bitmap") === col("n_exact")).as("bitmap_eq_exact"))
          .orderBy(col("event_type"))
      },
      Some("""WITH words AS (
                SELECT event_type, user_id // 32 AS blk,
                       bit_or(CAST(1 AS BIGINT) << CAST(user_id % 32 AS INT)) AS w
                FROM events GROUP BY 1, 2),
                   b AS (SELECT event_type,
                                CAST(SUM(bit_count(w)) AS BIGINT) AS n_bitmap
                         FROM words GROUP BY 1),
                   x AS (SELECT event_type,
                                COUNT(DISTINCT user_id) AS n_exact
                         FROM events GROUP BY 1)
              SELECT event_type, n_bitmap, n_exact,
                     n_bitmap = n_exact AS bitmap_eq_exact
              FROM b JOIN x USING (event_type)
              ORDER BY event_type""")),

    // One PageRank power iteration over the (undirected, nation-blocked)
    // co-supply graph from uniform start: p1(v) = 0.15/N + 0.85/N ·
    // Σ_{u~v} 1/deg(u). The message-passing shape — join contributions
    // to the edge list, aggregate per destination — is exactly one
    // edge-partitioned shuffle per iteration at any scale; degrees and
    // N are node-table-sized. Per-edge 1/deg rounds at 6 and the
    // contribution sum runs exact-decimal, so both engines agree
    // bit-for-bit. Top-20 by rank.
    "q_pagerank_iter" -> Q(
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val dirE = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
        val deg = dirE.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val n = deg.agg(count(lit(1)).as("nn"))
        val contrib = dirE.join(deg, Seq("u"))
          .groupBy(col("v"))
          .agg(sum(round(lit(1.0) / col("deg"), 6).cast("decimal(38,6)")).as("sc"))
        contrib.join(deg.select(col("u").as("v"), col("deg")), Seq("v"))
          .crossJoin(broadcast(n))
          .select(col("v").as("s_suppkey"), col("deg"),
                  round(lit(0.15) / col("nn") +
                        lit(0.85) * (col("sc").cast("double") / col("nn")), 6)
                    .as("rank1"))
          .orderBy(col("rank1").desc, col("s_suppkey"))
          .limit(20)
      },
      Some("""WITH ps AS (SELECT DISTINCT s.s_nationkey AS nk,
                                          l.l_partkey AS p, l.l_suppkey AS s
                          FROM lineitem l
                          JOIN supplier s ON l.l_suppkey = s.s_suppkey),
                   e AS (SELECT DISTINCT a.s AS u, b.s AS v
                         FROM ps a JOIN ps b
                           ON a.nk = b.nk AND a.p = b.p AND a.s < b.s),
                   de AS (SELECT u, v FROM e
                          UNION ALL SELECT v AS u, u AS v FROM e),
                   deg AS (SELECT u, COUNT(*) AS deg FROM de GROUP BY 1),
                   n AS (SELECT COUNT(*) AS nn FROM deg),
                   c AS (SELECT de.v,
                                SUM(CAST(round(1.0 / deg.deg, 6)
                                         AS DECIMAL(38,6))) AS sc
                         FROM de JOIN deg ON de.u = deg.u GROUP BY 1)
              SELECT c.v AS s_suppkey, d.deg,
                     round(0.15 / n.nn
                           + 0.85 * (CAST(c.sc AS DOUBLE) / n.nn), 6) AS rank1
              FROM c JOIN deg d ON c.v = d.u, n
              ORDER BY rank1 DESC, s_suppkey LIMIT 20""")),

    // Rolling 50-row correlation of quantity vs extended price per
    // return flag — windowed second-moment statistics: six frame-bounded
    // exact-decimal power sums share ONE partition sort, and the
    // Pearson r derives in identical double trees on both engines. The
    // frame bounds the state (50 rows) regardless of partition length —
    // the property that keeps windowed stats viable on unbounded keys.
    "q_rolling_corr" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Linear sums ride the exact decimal(38,4) path; PRODUCT terms
        // multiply in double (bit-identical across engines) and round at
        // 6 before the exact-decimal sum — DuckDB's window-sum path
        // refuses to widen a decimal×decimal beyond int64, so a decimal
        // product overflows there on price-sized values.
        val x = col("l_quantity"); val y = col("l_extendedprice")
        // scale 2, precision 28: a 50-row product sum's unscaled value
        // stays far below 2^53, so decimal→double conversion is a single
        // exact rounding in BOTH engines (scale-6 sums crossed 2^53 and
        // double-rounded differently — 2 rows diverged at sf0.01).
        def psum(c: org.apache.spark.sql.Column) =
          round(c, 2).cast("decimal(28,2)")
        // The fixture's (l_orderkey, l_linenumber) is NOT unique (11785
        // dup pairs at sf0.01, 3 of them tied through shipdate too), so
        // the sort key extends through the measure columns: any rows
        // still tied are value-identical and the frame sums don't care
        // which order they land in.
        // PERFORMANCE, two generations (see BASELINE minima): the naive
        // sliding frame re-evaluated the 50-row buffer per row — 18.9 s;
        // the r5 prefix-sum identity frame[-49,0] = cum[rn] − cum[rn−50]
        // made it O(n) — 2.45 s — but kept Window.partitionBy(returnflag):
        // CARDINALITY 3, so the whole corpus sorted and scanned on 3
        // tasks no matter the cluster size (the r5 verdict's scale-killer
        // #1). r6 DE-SKEWS it with the two-level sweep-line pattern
        // (q_concurrent_sessions): partition by (returnflag, ship MONTH) —
        // the month is a monotone coarsening of the leading sort key, so
        // bucket order IS sort order — compute in-bucket prefix sums on
        // ~250 parallel tasks, then add per-bucket carry-in offsets from
        // an exclusive prefix over the TINY (flag, month) totals table
        // (the only single-partition window left runs on ~250 rows,
        // broadcast back). The 50-row-back lookup that was lag(50) over
        // the flag partition becomes a (flag, rn) equi-join against the
        // rn+50 shifted projection — hash-distributed on a dense unique
        // key, no skew possible. All arithmetic stays exact decimal, so
        // every double — and the oracle hash — is bit-identical to the
        // direct ROWS BETWEEN spelling the oracle keeps.
        val srt = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
                      col("l_quantity"), col("l_extendedprice"),
                      col("l_partkey"), col("l_suppkey"))
        val wLoc = Window.partitionBy(col("l_returnflag"), col("bkt"))
          .orderBy(srt: _*)
        val cumF = wLoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        // ONE evaluated cumsum frame (r15): local feeds THREE plan paths
        // (the offsets totals, the cum probe, and its rn+50 shifted
        // projection) — left declarative the lineitem scan + month
        // windows ran repeatedly (8 parquet scans in the r14 plan, zero
        // ReusedExchange; the offsets branch even re-scanned lineitem
        // for totals its own comment admitted equal the last local cum).
        // Memo.cut materializes it once (reliable checkpoint on a
        // cluster, localCheckpoint locally — PlanCut would share only the
        // shuffle and re-run the in-partition sort + six window sums per
        // consumer), and the totals become last-row picks of the
        // materialized cumulatives: tn = max(lrn) (row_number,
        // sign-free), t* = max_by(lc*, lrn) — the bucket's full in-order
        // decimal sum, bit-identical to the independent re-aggregation
        // by decimal exactness.
        val local = graft.llm.Memo.cut(s)(
          Tables.lineitem(s, dir)
          .withColumn("bkt", date_trunc("month", col("l_shipdate")))
          .withColumn("lrn", row_number().over(wLoc).cast("long"))
          .withColumn("lcx", sum(x.cast("decimal(38,4)")).over(cumF))
          .withColumn("lcy", sum(y.cast("decimal(38,4)")).over(cumF))
          .withColumn("lcxy", sum(psum(x * y)).over(cumF))
          .withColumn("lcxx", sum(psum(x * x)).over(cumF))
          .withColumn("lcyy", sum(psum(y * y)).over(cumF)))
        // Exclusive prefix over per-bucket totals → carry-in offsets.
        val wCar = Window.partitionBy(col("l_returnflag")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = local
          .groupBy(col("l_returnflag"), col("bkt"))
          .agg(max(col("lrn")).as("tn"),
               max_by(col("lcx"), col("lrn")).as("tx"),
               max_by(col("lcy"), col("lrn")).as("ty"),
               max_by(col("lcxy"), col("lrn")).as("txy"),
               max_by(col("lcxx"), col("lrn")).as("txx"),
               max_by(col("lcyy"), col("lrn")).as("tyy"))
          .select(col("l_returnflag"), col("bkt"),
                  coalesce(sum(col("tn")).over(wCar), lit(0L)).as("on"),
                  coalesce(sum(col("tx")).over(wCar), lit(0).cast("decimal(38,4)")).as("ox"),
                  coalesce(sum(col("ty")).over(wCar), lit(0).cast("decimal(38,4)")).as("oy"),
                  coalesce(sum(col("txy")).over(wCar), lit(0).cast("decimal(38,2)")).as("oxy"),
                  coalesce(sum(col("txx")).over(wCar), lit(0).cast("decimal(38,2)")).as("oxx"),
                  coalesce(sum(col("tyy")).over(wCar), lit(0).cast("decimal(38,2)")).as("oyy"))
        val cum = local.join(broadcast(offs), Seq("l_returnflag", "bkt"))
          .withColumn("rn", col("on") + col("lrn"))
          .withColumn("cx", col("ox") + col("lcx"))
          .withColumn("cy", col("oy") + col("lcy"))
          .withColumn("cxy", col("oxy") + col("lcxy"))
          .withColumn("cxx", col("oxx") + col("lcxx"))
          .withColumn("cyy", col("oyy") + col("lcyy"))
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                  col("rn"), col("cx"), col("cy"), col("cxy"), col("cxx"),
                  col("cyy"))
        // cum[rn − 50] by equi-join (left: rn ≤ 50 has no frame start,
        // exactly lag(50)'s null → coalesce 0).
        val prev = cum.select(col("l_returnflag"), (col("rn") + 50).as("rn"),
          col("cx").as("pcx"), col("cy").as("pcy"), col("cxy").as("pcxy"),
          col("cxx").as("pcxx"), col("cyy").as("pcyy"))
        def frame(c: String) =
          (col(c) - coalesce(col("p" + c),
                             lit(0).cast(if (c == "cx" || c == "cy") "decimal(38,4)"
                                         else "decimal(38,2)")))
            .cast("double")
        val d = cum.join(prev, Seq("l_returnflag", "rn"), "left")
          .withColumn("n", least(col("rn"), lit(50)).cast("long"))
          .withColumn("sx", frame("cx"))
          .withColumn("sy", frame("cy"))
          .withColumn("sxy", frame("cxy"))
          .withColumn("sxx", frame("cxx"))
          .withColumn("syy", frame("cyy"))
        val cov = col("n") * col("sxy") - col("sx") * col("sy")
        val vx = col("n") * col("sxx") - col("sx") * col("sx")
        val vy = col("n") * col("syy") - col("sy") * col("sy")
        d.filter(col("n") === 50)
          .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                  when(vx > 0 && vy > 0,
                       round(cov / (sqrt(vx) * sqrt(vy)), 6)).otherwise(0.0)
                    .as("r50"))
          .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                   col("r50"))
      },
      Some("""WITH d AS (
                SELECT l_returnflag, l_orderkey, l_linenumber,
                       COUNT(*) OVER w AS n,
                       CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sx,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) OVER w AS DOUBLE) AS sy,
                       CAST(SUM(CAST(round(l_quantity * l_extendedprice, 2)
                                     AS DECIMAL(28,2))) OVER w AS DOUBLE) AS sxy,
                       CAST(SUM(CAST(round(l_quantity * l_quantity, 2)
                                     AS DECIMAL(28,2))) OVER w AS DOUBLE) AS sxx,
                       CAST(SUM(CAST(round(l_extendedprice * l_extendedprice, 2)
                                     AS DECIMAL(28,2))) OVER w AS DOUBLE) AS syy
                FROM lineitem
                WINDOW w AS (PARTITION BY l_returnflag
                             ORDER BY l_shipdate, l_orderkey, l_linenumber,
                                      l_quantity, l_extendedprice,
                                      l_partkey, l_suppkey
                             ROWS BETWEEN 49 PRECEDING AND CURRENT ROW))
              SELECT l_returnflag, l_orderkey, l_linenumber,
                     CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
                          THEN round((n * sxy - sx * sy)
                                     / (sqrt(n * sxx - sx * sx)
                                        * sqrt(n * syy - sy * sy)), 6)
                          ELSE 0.0 END AS r50
              FROM d WHERE n = 50
              ORDER BY l_returnflag, l_orderkey, l_linenumber, r50""")),

    // Transitive closure over a part hierarchy (BOM-style root/depth
    // resolution) by POINTER DOUBLING: the synthetic forest parent(k) =
    // k div 7 (roots k < 7) stands in for the reference's category
    // hierarchies. Each round joins the state table to itself on the
    // current-ancestor key, doubling every node's jump distance
    // (1, 2, 4, ... hops), so a depth-d hierarchy resolves in
    // O(log d) shuffles — the scale-critical difference from naive BFS
    // chaining (O(d) shuffles; a retail taxonomy is shallow but a
    // thread/reply or org graph is not). The self-join keys on node id
    // (full hierarchy cardinality, no skew: each node has exactly one
    // outgoing pointer and converged rows stop probing). Convergence is
    // a driver-side count per round — O(log d) tiny jobs, the same
    // memoized-iteration contract as llm_dedup_cluster. Oracle: DuckDB
    // WITH RECURSIVE descends the same forest.
    "q_transitive_closure" -> Q(
      (s, dir) => {
        // Per-round materialization is Memo.cut (reliable checkpoint on
        // a real cluster, localCheckpoint locally), NOT .cache(): the
        // checkpoint cuts the doubling lineage (cache would let it
        // grow to the full O(log d) join tree on recompute), never
        // registers in CacheManager (a cached part subtree would
        // sameResult-substitute into sibling queries' audited plans
        // with no unpersist point — the r6-s4 hazard class), and
        // superseded rounds are reclaimed by ContextCleaner when the
        // loop drops the reference.
        val cut = graft.llm.Memo.cut(s) _
        val nodes = Tables.part(s, dir).select(col("p_partkey").as("id"))
        var state = cut(nodes.select(
            col("id"),
            when(col("id") >= 7, expr("id div 7")).otherwise(col("id")).as("anc"),
            when(col("id") >= 7, lit(1)).otherwise(lit(0)).cast("int").as("depth"),
            (col("id") < 7).as("done")))
        var pending = state.filter(!col("done")).count()
        while (pending > 0) {
          val j = state.select(col("id").as("jid"), col("anc").as("janc"),
                               col("depth").as("jdepth"), col("done").as("jdone"))
          val next = cut(state.join(j, col("anc") === col("jid"), "left")
            .select(
              col("id"),
              when(col("done"), col("anc")).otherwise(col("janc")).as("anc"),
              when(col("done"), col("depth"))
                .otherwise(col("depth") + col("jdepth")).cast("int").as("depth"),
              when(col("done"), lit(true)).otherwise(col("jdone")).as("done")))
          pending = next.filter(!col("done")).count()
          state = next
        }
        state.select(col("id"), col("anc").as("root"), col("depth"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE anc AS (
                SELECT p_partkey AS id, p_partkey AS root, 0 AS depth
                FROM part WHERE p_partkey < 7
                UNION ALL
                SELECT p.p_partkey, a.root, a.depth + 1
                FROM part p JOIN anc a ON p.p_partkey // 7 = a.id
                WHERE p.p_partkey >= 7)
              SELECT id, root, CAST(depth AS INTEGER) AS depth
              FROM anc ORDER BY id""")),

    // Native recursive CTE — Spark 4.1's WITH RECURSIVE, the declarative
    // twin of q_transitive_closure's hand-rolled pointer-doubling loop
    // (kept: doubling is O(log d) rounds where the CTE iterates O(d);
    // at BOM depths both are single-digit rounds and the CTE wins on
    // clarity + optimizer visibility — each iteration is a planned
    // equi-join against the frontier, not driver-assembled lineage).
    // Output is the materialized ancestor PATH per node over the same
    // id div 7 part hierarchy, which the closure key deliberately does
    // not produce, so the two stay non-duplicative.
    "q_recursive_cte" -> Q(
      (s, dir) => {
        Tables.part(s, dir).createOrReplaceTempView("part_rec")
        s.sql("""WITH RECURSIVE anc AS (
                   SELECT p_partkey AS id,
                          CAST(p_partkey AS STRING) AS path,
                          0 AS depth
                   FROM part_rec WHERE p_partkey < 7
                   UNION ALL
                   SELECT p.p_partkey,
                          CONCAT(a.path, '/', CAST(p.p_partkey AS STRING)),
                          a.depth + 1
                   FROM part_rec p JOIN anc a ON p.p_partkey div 7 = a.id
                   WHERE p.p_partkey >= 7)
                 SELECT id, path, CAST(depth AS INT) AS depth
                 FROM anc ORDER BY id""")
      },
      Some("""WITH RECURSIVE anc AS (
                SELECT p_partkey AS id,
                       CAST(p_partkey AS VARCHAR) AS path,
                       0 AS depth
                FROM part WHERE p_partkey < 7
                UNION ALL
                SELECT p.p_partkey,
                       a.path || '/' || CAST(p.p_partkey AS VARCHAR),
                       a.depth + 1
                FROM part p JOIN anc a ON p.p_partkey // 7 = a.id
                WHERE p.p_partkey >= 7)
              SELECT id, path, CAST(depth AS INTEGER) AS depth
              FROM anc ORDER BY id""")),

    // Subtree rollup along the same part hierarchy: for every node, the
    // count and total retail price of its DESCENDANT-OR-SELF set — the
    // classic BOM / category-tree aggregation. Needs the full closure
    // PAIRS (node, ancestor), not just roots, so the loop here is
    // level-by-level BFS chaining: the frontier (node, cur) advances one
    // hop per round and emits a pair row per hop — O(d) tiny shuffles
    // over frontier-sized tables (d ~ log7 |part|; pointer doubling
    // would halve the rounds but materializes the same Σ depth pairs —
    // the pair OUTPUT, not the rounds, is the asymptotic cost here).
    // The rollup is then one hash agg keyed on ancestor — map-side
    // combined, corpus-cardinality key. Money stays DECIMAL(38,4) until
    // the final cast (H.dsum discipline). Oracle: WITH RECURSIVE closure
    // + join-aggregate.
    "q_hierarchy_rollup" -> Q(
      (s, dir) => {
        // Memo.cut (reliable checkpoint on a cluster), not .cache(), for
        // the same three reasons as q_transitive_closure above (lineage
        // cut, no CacheManager sibling-plan substitution, ContextCleaner
        // reclamation).
        val cut = graft.llm.Memo.cut(s) _
        val p = cut(Tables.part(s, dir)
          .select(col("p_partkey").as("id"),
                  col("p_retailprice").cast(H.D).as("price")))
        // closure pairs (node, anc): every proper ancestor of every node
        var frontier = cut(p.select(col("id"),
            when(col("id") >= 7, expr("id div 7")).as("cur"))
          .filter(col("cur").isNotNull))
        var pairs = frontier
        var n = frontier.count()
        while (n > 0) {
          val next = cut(frontier
            .filter(col("cur") >= 7)
            .select(col("id"), expr("cur div 7").as("cur")))
          n = next.count()
          if (n > 0) pairs = pairs.unionByName(next)
          frontier = next
        }
        val descOrSelf = pairs.select(col("cur").as("anc"), col("id"))
          .unionByName(p.select(col("id").as("anc"), col("id")))
        descOrSelf
          .join(p.select(col("id"), col("price")), Seq("id"))
          .groupBy(col("anc"))
          .agg(count(lit(1)).as("n_desc"), sum(col("price")).as("subtotal"))
          .select(col("anc").as("id"), col("n_desc"),
                  col("subtotal").cast("double").as("subtree_price"))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE cl AS (
                SELECT p_partkey AS id, p_partkey AS anc FROM part
                UNION ALL
                SELECT cl.id, cl.anc // 7 AS anc FROM cl WHERE cl.anc >= 7)
              SELECT cl.anc AS id, COUNT(*) AS n_desc,
                     CAST(SUM(CAST(p.p_retailprice AS DECIMAL(38,4)))
                          AS DOUBLE) AS subtree_price
              FROM cl JOIN part p ON p.p_partkey = cl.id
              GROUP BY cl.anc
              ORDER BY id""")),

    // Equal-frequency binning (decile report over order amounts) with
    // EXACT NTILE semantics — but computed DISTRIBUTED: a bare
    // `ntile(10) OVER (ORDER BY ...)` plans a SinglePartition window,
    // i.e. the whole fact table through one task — the classic
    // 100 TB cliff. Instead: range-repartition on the sort key (the
    // engine's distributed sort machinery), rank WITHIN each range
    // partition, broadcast the 32-row per-partition count table back as
    // cumulative offsets, and reconstruct the global 0-based rank as
    // offset + local_rank − 1. The NTILE bucket is then pure integer
    // arithmetic on that rank (first N%k buckets get one extra row) —
    // bit-identical to the oracle's NTILE, no single-task sort anywhere.
    // Two linear shuffles total (range + pid hash for the local window).
    "q_ntile_binning" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        // PlanCut.once (r14): the pid-stamped frame feeds BOTH the offset
        // aggregation and the probe join — same double-consumption hazard
        // H.prefixSums carries (range boundaries re-sampled per exchange if
        // the optimizer diverges the branches; observed live on
        // q_mannwhitney). One evaluated RDD, shared by construction.
        val parted = org.apache.spark.sql.graft.PlanCut.once(
          o.repartitionByRange(
            s.conf.get("spark.sql.shuffle.partitions").toInt,
            col("o_totalprice"), col("o_orderkey"))
            .withColumn("pid", spark_partition_id()))
        val localW = Window.partitionBy(col("pid"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val ranked = parted.withColumn("lrk", row_number().over(localW))
        val w0 = Window.orderBy(col("pid"))
        val offsets = ranked.groupBy(col("pid")).agg(count(lit(1)).as("pn"))
          .withColumn("off", coalesce(sum(col("pn")).over(
            w0.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("ntot", sum(col("pn")).over(
            w0.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          .select(col("pid"), col("off"), col("ntot"))
        ranked.join(broadcast(offsets), Seq("pid"))
          .withColumn("r0", col("off") + col("lrk") - 1)
          .withColumn("bin", expr(
            """CASE WHEN r0 < (ntot % 10) * (ntot DIV 10 + 1)
                    THEN r0 DIV (ntot DIV 10 + 1)
                    ELSE (ntot % 10) + (r0 - (ntot % 10) * (ntot DIV 10 + 1))
                         DIV (ntot DIV 10)
               END + 1"""))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"),
               format_string("%.2f", min(col("o_totalprice"))).as("lo"),
               format_string("%.2f", max(col("o_totalprice"))).as("hi"),
               H.davg(col("o_totalprice")).as("avg_price"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH b AS (SELECT o_totalprice,
                                 NTILE(10) OVER (ORDER BY o_totalprice,
                                                 o_orderkey) AS bin
                          FROM orders)
               SELECT bin, COUNT(*) AS n,
                      printf('%.2f', MIN(o_totalprice)) AS lo,
                      printf('%.2f', MAX(o_totalprice)) AS hi,
                      ${H.oAvg("o_totalprice")} AS avg_price
               FROM b GROUP BY bin ORDER BY bin""")),

    // Bounded-hop shortest paths (BFS) over the supply-chain bipartite
    // graph — customers and suppliers linked whenever a lineitem of the
    // customer's order was filled by the supplier — from customer 0:
    // min #hops to every reachable entity ("how far does a recall at
    // this account propagate"). Suppliers are encoded as −(sk+1) so
    // both sides live in one node-id space. Frontier expansion, one
    // round per hop: frontier ⋈ edges (equi-join on the node key),
    // minus already-settled nodes (left-anti on the distance table) —
    // each round shuffles only frontier-sized data and settled nodes
    // never re-probe, so total work is O(E) across all rounds, the
    // textbook distributed-BFS bound. Per-round Memo.cut (reliable
    // checkpoint on a cluster) for the same three reasons as
    // q_transitive_closure (lineage cut, no CacheManager sibling
    // substitution, ContextCleaner reclamation).
    // The hop cap is part of the declared semantics (both engines stop
    // at MAX_HOPS) and sits above the graph's diameter at every fixture
    // sf (bipartite small-world: everything reachable settles in ≤ 4);
    // at deploy scale it is the runaway-frontier guard every production
    // BFS carries. Oracle: DuckDB WITH RECURSIVE over the same edge
    // derivation, min-dist folded after the bounded recursion.
    "q_shortest_path" -> Q(
      (s, dir) => {
        val cut = graft.llm.Memo.cut(s) _
        val MAX_HOPS = 6
        val e0 = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, dir)
                  .select(col("o_orderkey"), col("o_custkey")),
                col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("c"),
                  (-col("l_suppkey") - 1L).as("sN"))
          .distinct()
        // NOT pre-partitioned by u (r16 A/B): hash-partitioning und
        // before the checkpoint to feed the per-hop joins measured
        // STRICTLY WORSE at sf1 (53.3M -> 65.2M shuffle records,
        // 471 -> 600 MB) — AQE broadcasts the frontier side on most
        // hops, so und is scanned, never shuffled, and the upfront
        // repartition is a pure extra corpus shuffle.
        val und = cut(e0.select(col("c").as("u"), col("sN").as("v"))
          .unionByName(e0.select(col("sN").as("u"), col("c").as("v"))))
        var dist = cut(Tables.customer(s, dir)
          .filter(col("c_custkey") === 0)
          .select(col("c_custkey").as("node"))
          .withColumn("dist", lit(0)))
        var frontier = dist
        var hop = 0
        var n = frontier.count()
        while (hop < MAX_HOPS && n > 0) {
          hop += 1
          val next = cut(frontier.join(und, col("node") === col("u"))
            .select(col("v").as("node")).distinct()
            .join(dist, Seq("node"), "left_anti")
            .withColumn("dist", lit(hop)))
          n = next.count()
          // dist stays a LAZY union of the already-checkpointed per-hop
          // frontiers (r15): the old per-hop cut(dist ∪ next) re-wrote the
          // ENTIRE settled set every round — O(V·hops) checkpoint bytes vs
          // O(V) now — and bought nothing, since every union leg is its
          // own materialized RDD already (nothing to recompute, no lineage
          // growth beyond one Union node per hop).
          if (n > 0) dist = dist.unionByName(next)
          frontier = next
        }
        dist.select(col("node"), col("dist").cast("int").as("dist"))
          .orderBy(col("node"))
      },
      Some("""WITH RECURSIVE
                e0 AS (SELECT DISTINCT o.o_custkey AS c,
                                       -l.l_suppkey - 1 AS sn
                       FROM lineitem l
                       JOIN orders o ON l.l_orderkey = o.o_orderkey),
                e AS (SELECT c AS u, sn AS v FROM e0
                      UNION ALL SELECT sn AS u, c AS v FROM e0),
                bfs AS (
                  SELECT c_custkey AS node, 0 AS dist
                  FROM customer WHERE c_custkey = 0
                  UNION
                  SELECT e.v AS node, b.dist + 1 AS dist
                  FROM bfs b JOIN e ON e.u = b.node
                  WHERE b.dist < 6)
              SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
              FROM bfs GROUP BY node ORDER BY node""")),

    // Largest-remainder (Hamilton) apportionment: allocate exactly 1000
    // budget units across nations proportional to supplied revenue.
    // Pure-integer formulation — no decimal division anywhere, so the
    // hash gate is exact by construction: revenue reduces to its
    // scale-4 unscaled BIGINT u (per-nation, map-side combined), base_i
    // = (1000·u_i) div U floors the quota via integer division (both
    // engines floor non-negative integer div identically), and the
    // remainder comparison uses the exact integer 1000·u_i − base_i·U.
    // The leftover seats go to the largest remainders (nationkey
    // tiebreak). 100 TB shape: one map-combined agg on the fact stream
    // (supplier dim broadcast) reduces the corpus to 25 rows; the
    // total, the rank window, and the seat assignment all run on that
    // reduced table — the global window never sees corpus-sized data.
    "q_alloc_largest_remainder" -> Q(
      (s, dir) => {
        val SEATS = 1000L
        val sup = Tables.supplier(s, dir)
          .select(col("s_suppkey"), col("s_nationkey").as("nk"))
        val rev = Tables.lineitem(s, dir)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("nk"))
          .agg(sum(col("l_extendedprice").cast(H.D)).as("rev"))
          .withColumn("u", (col("rev") * 10000L).cast("long"))
        val tot = rev.agg(sum(col("u")).as("tot_u"))
        val quota = rev.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"($SEATS * u) div tot_u"))
          .withColumn("rem", lit(SEATS) * col("u") - col("base") * col("tot_u"))
        val w = Window.orderBy(col("rem").desc, col("nk"))
        quota
          .withColumn("leftover",
            lit(SEATS) - sum(col("base")).over(
              Window.rowsBetween(Window.unboundedPreceding,
                                 Window.unboundedFollowing)))
          .withColumn("rk", row_number().over(w))
          .select(col("nk"),
                  col("rev").cast("double").as("revenue"),
                  (col("base") +
                   when(col("rk") <= col("leftover"), 1L).otherwise(0L))
                    .as("alloc"))
          .orderBy(col("nk"))
      },
      Some("""WITH rev AS (
                SELECT s_nationkey AS nk,
                       SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS rev,
                       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4)))
                            * 10000 AS BIGINT) AS u
                FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                GROUP BY 1),
              t AS (SELECT SUM(u) AS tot_u FROM rev),
              q AS (SELECT nk, rev, u, tot_u,
                           (1000 * u) // tot_u AS base,
                           1000 * u - ((1000 * u) // tot_u) * tot_u AS rem
                    FROM rev, t)
              SELECT nk, CAST(rev AS DOUBLE) AS revenue,
                     CAST(base + CASE WHEN ROW_NUMBER() OVER
                         (ORDER BY rem DESC, nk)
                       <= 1000 - (SELECT SUM(base) FROM q)
                       THEN 1 ELSE 0 END AS BIGINT) AS alloc
              FROM q ORDER BY nk""")),

    // Summary-table (materialized-view) REWRITE: a day×priority MV is
    // materialized once, and the DECLARED month-grain query reads ONLY
    // the MV — the aggregate-navigability contract every lakehouse
    // rollup stack (dbt marts, Druid/Pinot rollups, BI extracts) rests
    // on. The oracle aggregates the RAW fact table, so the hash gate is
    // the proof that answering from the summary is lossless: counts
    // re-sum exactly and money stays DECIMAL(38,4) INSIDE the MV
    // parquet (an MV that stored doubles would re-introduce
    // accumulation-order drift at re-agg time — the exact mistake the
    // decimal lane exists to prevent), cast to double only at the final
    // month emission. Scale shape: the fact table is touched once at MV
    // build; every month/quarter/year query after that scans O(days ×
    // priorities) rows. Plan-audited: the declared query's scan reads
    // the MV path, never the fact table.
    "q_mv_rewrite" -> Q(
      (s, dir) => {
        val mvPath = s"${graft.Fixtures.dir}/orders_mv_daily"
        Tables.orders(s, dir)
          .groupBy(date_trunc("day", col("o_orderdate")).as("day"),
                   col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
               sum(col("o_totalprice").cast(H.D)).as("sd"))
          .write.mode("overwrite").parquet(mvPath)
        s.read.parquet(mvPath)
          .groupBy(date_trunc("month", col("day")).as("month"),
                   col("o_orderpriority"))
          .agg(sum(col("n")).as("n_orders"),
               sum(col("sd")).cast("double").as("total"))
          .orderBy(col("month"), col("o_orderpriority"))
      },
      Some(s"""SELECT date_trunc('month', o_orderdate) AS month,
                      o_orderpriority,
                      COUNT(*) AS n_orders,
                      ${H.oSum("o_totalprice")} AS total
               FROM orders
               GROUP BY 1, 2 ORDER BY month, o_orderpriority""")),

    // Winsorization — clip each group's values at its exact p05/p95 and
    // report the robust vs raw means: the de-fanging transform applied
    // before any mean-based KPI when heavy tails would let a few rows
    // own the average (q_anomaly_mad FLAGS outliers; this key is the
    // complementary treatment that keeps the rows). Same scale shape as
    // the MAD key: exact percentiles need a per-group reduce by nature,
    // the 5-row bounds table broadcasts back onto the stream, and the
    // clip itself is scan-pipelined — one corpus shuffle on event_type
    // total. Percentiles and clipped values round at 6 (the documented
    // Spark-percentile == DuckDB-quantile_cont libm parity grain);
    // means ride the decimal lanes.
    "q_winsorize" -> Q(
      (s, dir) => {
        val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
        val bounds = ev.groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.05)"), 6).as("lo"),
               round(expr("percentile(value, 0.95)"), 6).as("hi"))
        ev.join(broadcast(bounds), Seq("event_type"))
          .withColumn("wv", round(least(greatest(col("value"), col("lo")),
                                        col("hi")), 6))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
               min(col("lo")).as("lo"), min(col("hi")).as("hi"),
               sum(when(col("value") < col("lo"), 1L)
                     .when(col("value") > col("hi"), 1L)
                     .otherwise(0L)).as("n_clipped"),
               H.davg(col("value")).as("mean_raw"),
               (sum(col("wv").cast("decimal(38,6)")) / count(lit(1)))
                 .cast("decimal(38,6)").cast("double").as("mean_wins"))
          .orderBy(col("event_type"))
      },
      Some(s"""WITH b AS (SELECT event_type,
                                 round(quantile_cont(value, 0.05), 6) AS lo,
                                 round(quantile_cont(value, 0.95), 6) AS hi
                          FROM events GROUP BY 1)
               SELECT e.event_type AS event_type, COUNT(*) AS n,
                      MIN(b.lo) AS lo, MIN(b.hi) AS hi,
                      CAST(SUM(CASE WHEN e.value < b.lo THEN 1
                                    WHEN e.value > b.hi THEN 1
                                    ELSE 0 END) AS BIGINT) AS n_clipped,
                      ${H.oAvg("e.value")} AS mean_raw,
                      CAST(CAST(SUM(CAST(round(least(greatest(e.value, b.lo),
                                                     b.hi), 6)
                                         AS DECIMAL(38,6))) / COUNT(*)
                                AS DECIMAL(38,6)) AS DOUBLE) AS mean_wins
               FROM events e JOIN b USING (event_type)
               GROUP BY 1 ORDER BY 1""")),

    // Mann-Whitney U (Wilcoxon rank-sum) between purchase and signup
    // amounts — the nonparametric sibling of q_ab_test for when the
    // normality assumption behind Welch's t is off the table. Ranks are
    // computed REDUCE-FIRST: group to one row per distinct value (the
    // value-domain table, bounded by the 2-decimal amount domain, not by
    // row count), then one global running sum over that reduced table
    // gives every tie block's average rank. All rank arithmetic stays in
    // INTEGERS by carrying doubled ranks (ar2 = 2*rank_before + t + 1, so
    // tie-averaged .5s never leave the bigint lane): ra2 = 2*R_a and
    // u2 = 2*U_a are exact bigints on both engines, and the only doubles
    // are the final tie-corrected normal approximation (identical
    // expression trees, rounded at 6). One scan, one shuffle to the
    // value-domain table, one single-partition window over it.
    "q_mannwhitney" -> Q(
      (s, dir) => {
        val byV = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "signup"))
          .groupBy(col("value"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ta"),
               sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("tb"))
          .withColumn("t", col("ta") + col("tb"))
        // the value domain is ~rows/3 on this fixture, NOT bounded: a bare
        // ORDER BY value window is a SinglePartition sort of ~|corpus|
        // distinct doubles (r13 audit) — two-pass H.prefixSums instead
        // (long sums, associative, bit-identical)
        val a = graft.H.prefixSums(byV, Seq(col("value")),
                                   Seq("t" -> col("t")))
          .withColumn("ar2", lit(2L) * col("t_before") + col("t") + 1L)
          .agg(sum(col("ta")).as("na"), sum(col("tb")).as("nb"),
               sum(col("ta") * col("ar2")).as("ra2"),
               // The t³ tie-correction term accumulates in DECIMAL(38,0),
               // not the bigint lane: a tie block of t ~ 1e7 puts t³ at
               // 1e21 > 2^63, where non-ANSI bigint wraps SILENTLY while
               // DuckDB's BIGINT errors — the q_spearman/q_assortativity
               // wide-lane discipline (oracle mirrors with HUGEINT).
               sum((col("t") * col("t")).cast("decimal(38,0)") * col("t")
                     - col("t")).as("ties"))
        val n = col("na") + col("nb")
        val u2 = col("ra2") - col("na") * (col("na") + 1L)
        val varU = (col("na") * col("nb")).cast("double") / 12.0 *
          ((n + 1L).cast("double")
             - col("ties").cast("double") / (n * (n - 1L)).cast("double"))
        a.select(col("na"), col("nb"),
                 (u2.cast("double") / 2.0).as("u_stat"),
                 round((u2 - col("na") * col("nb")).cast("double")
                         / (lit(2.0) * sqrt(varU)), 6).as("z_stat"))
      },
      Some("""WITH g AS (
                SELECT value,
                       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                            AS BIGINT) AS ta,
                       CAST(COUNT(*) FILTER (WHERE event_type = 'signup')
                            AS BIGINT) AS tb,
                       CAST(COUNT(*) AS BIGINT) AS t
                FROM events WHERE event_type IN ('purchase', 'signup')
                GROUP BY 1),
              r AS (SELECT ta, tb, t,
                           2 * COALESCE(SUM(t) OVER (ORDER BY value
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0) + t + 1 AS ar2
                    FROM g),
              a AS (SELECT CAST(SUM(ta) AS BIGINT) AS na,
                           CAST(SUM(tb) AS BIGINT) AS nb,
                           CAST(SUM(ta * ar2) AS BIGINT) AS ra2,
                           SUM(CAST(t AS HUGEINT) * t * t - t) AS ties
                    FROM r)
              SELECT na, nb,
                     CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0 AS u_stat,
                     round(CAST(ra2 - na * (na + 1) - na * nb AS DOUBLE)
                           / (2.0 * sqrt(CAST(na * nb AS DOUBLE) / 12.0
                               * (CAST(na + nb + 1 AS DOUBLE)
                                  - CAST(ties AS DOUBLE)
                                    / CAST((na + nb) * (na + nb - 1)
                                           AS DOUBLE)))), 6) AS z_stat
              FROM a""")),

    // Two-sample Kolmogorov-Smirnov between the same two amount
    // distributions: D = max |F_a - F_b| over the pooled support. The
    // scale-critical move is keeping the max EXACT: instead of maxing a
    // double |ca/na - cb/nb| (whose rounding could flip argmax ties
    // between engines), max the integer-scaled |ca*nb - cb*na| and divide
    // ONCE at the end — bigint max is total-order deterministic, and at
    // 1M rows/side the scaled diff tops out near 1e12, far inside bigint.
    // Same reduce-first shape as q_mannwhitney: the window runs over the
    // distinct-value table only.
    "q_ks_test" -> Q(
      (s, dir) => {
        val byV = Tables.events(s, dir)
          .filter(col("event_type").isin("purchase", "signup"))
          .groupBy(col("value"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("ta"),
               sum(when(col("event_type") === "signup", 1L).otherwise(0L)).as("tb"))
        // same r13 two-pass rewrite as q_mannwhitney: the value domain is
        // corpus-sized, so the cum/full windows ride H.prefixSums
        // (inclusive cum = _before + value; totals come along free)
        val a = graft.H.prefixSums(byV, Seq(col("value")),
                                   Seq("ta" -> col("ta"), "tb" -> col("tb")))
          .select((col("ta_before") + col("ta")).as("ca"),
                  (col("tb_before") + col("tb")).as("cb"),
                  col("ta_tot").as("na"), col("tb_tot").as("nb"))
          .groupBy(col("na"), col("nb"))
          .agg(max(abs(col("ca") * col("nb") - col("cb") * col("na")))
                 .as("dmax"))
        val nn = (col("na") * col("nb")).cast("double")
        a.select(col("na"), col("nb"),
                 round(col("dmax").cast("double") / nn, 6).as("d_stat"),
                 round(col("dmax").cast("double") / nn
                         * sqrt(nn / (col("na") + col("nb")).cast("double")),
                       6).as("ks_stat"))
      },
      Some("""WITH g AS (
                SELECT value,
                       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                            AS BIGINT) AS ta,
                       CAST(COUNT(*) FILTER (WHERE event_type = 'signup')
                            AS BIGINT) AS tb
                FROM events WHERE event_type IN ('purchase', 'signup')
                GROUP BY 1),
              r AS (SELECT SUM(ta) OVER (ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS ca,
                           SUM(tb) OVER (ORDER BY value
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cb,
                           CAST(SUM(ta) OVER () AS BIGINT) AS na,
                           CAST(SUM(tb) OVER () AS BIGINT) AS nb
                    FROM g),
              a AS (SELECT na, nb,
                           CAST(MAX(ABS(ca * nb - cb * na)) AS BIGINT) AS dmax
                    FROM r GROUP BY na, nb)
              SELECT na, nb,
                     round(CAST(dmax AS DOUBLE)
                           / CAST(na * nb AS DOUBLE), 6) AS d_stat,
                     round(CAST(dmax AS DOUBLE) / CAST(na * nb AS DOUBLE)
                           * sqrt(CAST(na * nb AS DOUBLE)
                                  / CAST(na + nb AS DOUBLE)), 6) AS ks_stat
              FROM a""")),

    // Herfindahl-Hirschman revenue concentration per nation: how
    // monopolized each nation's customer revenue is (HHI = sum of squared
    // revenue shares; 1/n_cust = perfectly even, 1.0 = single customer).
    // Shares never materialize: HHI = sum(rev^2) / total^2, with rev kept
    // in the exact DECIMAL(18,4) lane (per-customer order sums of
    // 2-decimal amounts) and rev*rev widened losslessly to DECIMAL(38,8)
    // — (18,4)x(18,4) fits exactly in both engines, so the only doubles
    // are the final two divisions of identically-derived exact values.
    // Shape: one fact-table reduce to |customers| rows, one broadcast of
    // the customer->nation dim map, one tiny groupBy over 25 nations.
    "q_hhi" -> Q(
      (s, dir) => {
        val dim = Tables.customer(s, dir)
          .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
          .join(broadcast(Tables.nation(s, dir)),
                col("c_nationkey") === col("n_nationkey"))
          .select(col("o_custkey"), col("n_name"))
        val rev = Tables.orders(s, dir)
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,4)")).as("rev"))
        rev.join(broadcast(dim), Seq("o_custkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_cust"),
               sum(col("rev")).as("st"),
               sum((col("rev") * col("rev")).cast("decimal(38,8)")).as("s2"),
               max(col("rev")).as("mx"))
          .select(col("n_name"), col("n_cust"),
                  col("st").cast("double").as("revenue"),
                  round(col("s2").cast("double")
                          / (col("st").cast("double") * col("st").cast("double")),
                        6).as("hhi"),
                  round(col("mx").cast("double") / col("st").cast("double"),
                        6).as("top_share"))
          .orderBy(col("n_name"))
      },
      Some("""WITH rev AS (
                SELECT o_custkey,
                       SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
                FROM orders GROUP BY 1),
              j AS (SELECT n.n_name, r.rev
                    FROM rev r
                    JOIN customer c ON r.o_custkey = c.c_custkey
                    JOIN nation n ON c.c_nationkey = n.n_nationkey),
              a AS (SELECT n_name, COUNT(*) AS n_cust, SUM(rev) AS st,
                           SUM(CAST(rev * rev AS DECIMAL(38,8))) AS s2,
                           MAX(rev) AS mx
                    FROM j GROUP BY 1)
              SELECT n_name, n_cust, CAST(st AS DOUBLE) AS revenue,
                     round(CAST(s2 AS DOUBLE)
                           / (CAST(st AS DOUBLE) * CAST(st AS DOUBLE)),
                           6) AS hhi,
                     round(CAST(mx AS DOUBLE) / CAST(st AS DOUBLE),
                           6) AS top_share
              FROM a ORDER BY n_name""")),

    // Degree assortativity of the co-supply graph: Pearson correlation
    // of endpoint degrees over every directed edge — positive means
    // hubs prefer hubs (a core-periphery warning for partitioning:
    // assortative hubs concentrate shuffle volume). Rides the SAME
    // reduced edge table as triangles/pagerank; the degree table is
    // |nodes| rows and broadcasts back onto the edge list, and all six
    // accumulators are exact integers (DECIMAL(38,0) here, HUGEINT in
    // the oracle — m2·sxy tops 2^63 at sf1, which is why the long lane
    // is not enough) with one terminal double division.
    "q_assortativity" -> Q(
      (s, dir) => {
        val e = coSupplyEdges(s, dir)
        val sym = e.select(explode(array(
            struct(col("u").as("src"), col("v").as("dst")),
            struct(col("v").as("src"), col("u").as("dst")))).as("d"))
          .select(col("d.src").as("src"), col("d.dst").as("dst"))
        val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        val d = "decimal(38,0)"
        val a = sym
          .join(broadcast(deg), Seq("src"))
          .withColumnRenamed("deg", "du")
          .join(broadcast(deg.select(col("src").as("dst"),
                                     col("deg").as("dv"))), Seq("dst"))
          .agg(count(lit(1)).as("m2"),
               sum(col("du").cast(d)).as("sx"),
               sum(col("dv").cast(d)).as("sy"),
               sum(col("du").cast(d) * col("du")).as("sxx"),
               sum(col("dv").cast(d) * col("dv")).as("syy"),
               sum(col("du").cast(d) * col("dv")).as("sxy"))
        val vx = col("m2").cast(d) * col("sxx") - col("sx") * col("sx")
        val vy = col("m2").cast(d) * col("syy") - col("sy") * col("sy")
        // a degree-regular graph has zero endpoint-degree variance; the
        // correlation is undefined there and reports 0 by convention
        a.select(col("m2").as("n_directed_edges"),
                 when(vx > 0 && vy > 0,
                      round((col("m2").cast(d) * col("sxy")
                               - col("sx") * col("sy")).cast("double")
                            / sqrt(vx.cast("double") * vy.cast("double")), 6))
                   .otherwise(lit(0.0)).as("assortativity"))
      },
      Some("""WITH ps AS (SELECT DISTINCT s.s_nationkey AS nk,
                                          l.l_partkey AS p, l.l_suppkey AS s
                          FROM lineitem l
                          JOIN supplier s ON l.l_suppkey = s.s_suppkey),
                   e AS (SELECT DISTINCT a.s AS u, b.s AS v
                         FROM ps a JOIN ps b
                           ON a.nk = b.nk AND a.p = b.p AND a.s < b.s),
                   sym AS (SELECT u AS src, v AS dst FROM e
                           UNION ALL SELECT v AS src, u AS dst FROM e),
                   deg AS (SELECT src, COUNT(*) AS deg FROM sym GROUP BY 1),
                   j AS (SELECT a.deg AS du, b.deg AS dv
                         FROM sym JOIN deg a ON sym.src = a.src
                                  JOIN deg b ON sym.dst = b.src),
                   agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2,
                                  CAST(SUM(CAST(du AS HUGEINT)) AS HUGEINT) AS sx,
                                  CAST(SUM(CAST(dv AS HUGEINT)) AS HUGEINT) AS sy,
                                  CAST(SUM(CAST(du AS HUGEINT) * du) AS HUGEINT) AS sxx,
                                  CAST(SUM(CAST(dv AS HUGEINT) * dv) AS HUGEINT) AS syy,
                                  CAST(SUM(CAST(du AS HUGEINT) * dv) AS HUGEINT) AS sxy
                           FROM j)
              SELECT m2 AS n_directed_edges,
                     CASE WHEN CAST(m2 AS HUGEINT) * sxx - sx * sx > 0
                           AND CAST(m2 AS HUGEINT) * syy - sy * sy > 0
                          THEN round(CAST(CAST(m2 AS HUGEINT) * sxy - sx * sy
                                          AS DOUBLE)
                                     / sqrt(CAST(CAST(m2 AS HUGEINT) * sxx
                                                 - sx * sx AS DOUBLE)
                                            * CAST(CAST(m2 AS HUGEINT) * syy
                                                   - sy * sy AS DOUBLE)), 6)
                          ELSE CAST(0.0 AS DOUBLE) END AS assortativity
              FROM agg""")),

    // Incremental JOIN-view maintenance: the delta algebra
    // Δ(A ⋈ B) = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, with A = orders split at
    // a load cutoff and B = customers with a simulated late-arriving
    // cohort (custkey % 10). The declared result is the maintained
    // per-nation rollup assembled from the four decomposed joins; the
    // oracle recomputes the join DIRECTLY from the full tables, so the
    // hash gate proves the IVM identity — the algebra warehouses rely on
    // to avoid full-join recompute on every load. At scale only the
    // three delta terms are new work (each O(|Δ|) broadcast probes);
    // A_old⋈B_old stands in for the already-materialized view.
    "q_incremental_join_mv" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
        val aOld = o.filter(col("o_orderdate") < lit("1996-01-01"))
        val aNew = o.filter(col("o_orderdate") >= lit("1996-01-01"))
        val c = Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_nationkey"))
        val bOld = c.filter(col("c_custkey") % 10 =!= 0)
        val bNew = c.filter(col("c_custkey") % 10 === 0)
        def j(a: DataFrame, b: DataFrame) =
          a.join(broadcast(b), col("o_custkey") === col("c_custkey"))
        j(aOld, bOld).unionAll(j(aNew, bOld))
          .unionAll(j(aOld, bNew)).unionAll(j(aNew, bNew))
          .join(broadcast(Tables.nation(s, dir)),
                col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
               H.dsum(col("o_totalprice")).as("revenue"))
          .orderBy(col("n_name"))
      },
      Some(s"""SELECT n_name, COUNT(*) AS n_orders,
                      ${H.oSum("o_totalprice")} AS revenue
               FROM orders
               JOIN customer ON o_custkey = c_custkey
               JOIN nation ON c_nationkey = n_nationkey
               GROUP BY 1 ORDER BY 1""")),

    // Spearman rank correlation between quantity and discount — the
    // monotone-association sibling of q_agg_corr's Pearson, computed
    // WITHOUT ever ranking the fact table: the joint (x, y) histogram
    // reduces map-side to |x-domain| x |y-domain| cells, tie-averaged
    // ranks come from running sums over the two tiny marginal tables
    // (the q_mannwhitney doubled-rank bigint lane, so .5 ranks stay
    // integers), and rho is Pearson over the weighted doubled ranks —
    // affine-invariant, so the doubling cancels. Every sum is exact:
    // LONG per-cell products, DECIMAL(38,0) accumulators (the oracle
    // uses HUGEINT — both are exact integers, so the one terminal cast
    // to DOUBLE agrees bit-for-bit). Nothing in the plan grows with the
    // corpus except the first map-combined reduce.
    "q_spearman" -> Q(
      (s, dir) => {
        val hist = Tables.lineitem(s, dir)
          .groupBy(col("l_quantity").as("x"), col("l_discount").as("y"))
          .agg(count(lit(1)).as("n"))
        def ranks(key: String, r2: String) = {
          val before = Window.orderBy(col(key))
            .rowsBetween(Window.unboundedPreceding, -1)
          hist.groupBy(col(key)).agg(sum(col("n")).as("t"))
            .withColumn("b", coalesce(sum(col("t")).over(before), lit(0L)))
            .select(col(key), (lit(2L) * col("b") + col("t") + 1L).as(r2))
        }
        val d = "decimal(38,0)"
        val a = hist
          .join(broadcast(ranks("x", "rx2")), Seq("x"))
          .join(broadcast(ranks("y", "ry2")), Seq("y"))
          .agg(sum(col("n")).as("nn"),
               sum((col("n") * col("rx2")).cast(d)).as("sx"),
               sum((col("n") * col("ry2")).cast(d)).as("sy"),
               sum(col("n").cast(d) * col("rx2") * col("rx2")).as("sxx"),
               sum(col("n").cast(d) * col("ry2") * col("ry2")).as("syy"),
               sum(col("n").cast(d) * col("rx2") * col("ry2")).as("sxy"))
        a.select(col("nn").as("n_rows"),
                 round((col("nn").cast(d) * col("sxy") - col("sx") * col("sy"))
                         .cast("double")
                       / sqrt((col("nn").cast(d) * col("sxx")
                                 - col("sx") * col("sx")).cast("double")
                              * (col("nn").cast(d) * col("syy")
                                   - col("sy") * col("sy")).cast("double")),
                       6).as("rho_spearman"))
      },
      Some("""WITH hist AS (SELECT l_quantity AS x, l_discount AS y,
                                   COUNT(*) AS n
                            FROM lineitem GROUP BY 1, 2),
                   mx AS (SELECT x, 2 * COALESCE(SUM(t) OVER (ORDER BY x
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) + t + 1 AS rx2
                          FROM (SELECT x, SUM(n) AS t FROM hist GROUP BY 1)),
                   my AS (SELECT y, 2 * COALESCE(SUM(t) OVER (ORDER BY y
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) + t + 1 AS ry2
                          FROM (SELECT y, SUM(n) AS t FROM hist GROUP BY 1)),
                   a AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
                                CAST(SUM(CAST(n AS HUGEINT) * rx2)
                                     AS HUGEINT) AS sx,
                                CAST(SUM(CAST(n AS HUGEINT) * ry2)
                                     AS HUGEINT) AS sy,
                                CAST(SUM(CAST(n AS HUGEINT) * rx2 * rx2)
                                     AS HUGEINT) AS sxx,
                                CAST(SUM(CAST(n AS HUGEINT) * ry2 * ry2)
                                     AS HUGEINT) AS syy,
                                CAST(SUM(CAST(n AS HUGEINT) * rx2 * ry2)
                                     AS HUGEINT) AS sxy
                         FROM hist JOIN mx USING (x) JOIN my USING (y))
              SELECT nn AS n_rows,
                     round(CAST(CAST(nn AS HUGEINT) * sxy - sx * sy
                                AS DOUBLE)
                           / sqrt(CAST(CAST(nn AS HUGEINT) * sxx - sx * sx
                                       AS DOUBLE)
                                  * CAST(CAST(nn AS HUGEINT) * syy - sy * sy
                                         AS DOUBLE)), 6) AS rho_spearman
              FROM a""")),

    // Adamic-Adar link prediction on the customer-part bipartite graph:
    // score(c1,c2) = sum over shared parts of 1/ln(df(part)), the classic
    // "who should be connected next" signal (here: customers with
    // overlapping rare-part baskets). Declared semantics are RARE-part
    // Adamic-Adar — parts with 2..25 buyers; hyper-common parts both
    // carry ~zero AA weight (1/ln saturates) and dominate candidate
    // volume, so excluding them from pair generation entirely is the
    // frequent-neighbor pruning that keeps this linear: candidate volume
    // is sum of C(df,2) over CAPPED dfs, never a customers x customers
    // blowup (the coSupplyEdges / q_basket_pairs discipline, in-row
    // H.pairsE off one sorted buyer set per part). The cap sits below the
    // fixture's ~30-buyer median ON PURPOSE — measured at sf0.1 it cuts
    // the candidate stream 9x (8.97M -> 1.03M pairs) while keeping every
    // high-signal rare part; the floor dropped 16.1 s -> ~4 s with it.
    // Each pair's AA summand is rounded to 6 then summed in
    // DECIMAL(38,6), so the score sum is order-independent; the oracle
    // keeps the equi-self-join SQL and the hash gate proves equivalence.
    "q_link_predict" -> Q(
      (s, dir) => {
        val cp = Tables.lineitem(s, dir)
          .select(col("l_orderkey").as("o_orderkey"), col("l_partkey").as("p"))
          .join(Tables.orders(s, dir).select(col("o_orderkey"),
                                             col("o_custkey").as("c")),
                Seq("o_orderkey"))
          .select(col("c"), col("p"))
        // no distinct() before the reduce: collect_set dedups repeat
        // buyers inside the ONE p-keyed shuffle (partial sets merge
        // map-side), so df = buyer-set size with one exchange fewer
        cp.groupBy(col("p"))
          .agg(array_sort(collect_set(col("c"))).as("cs"))
          .withColumn("df", size(col("cs")).cast("bigint"))
          .filter(col("df").between(2, 25))
          .select(round(lit(1.0) / log(col("df")), 6)
                    .cast("decimal(38,6)").as("w"),
                  explode(expr(H.pairsE("cs"))).as("pr"))
          .groupBy(col("pr.a").as("ca"), col("pr.b").as("cb"))
          .agg(count(lit(1)).as("common_parts"),
               sum(col("w")).cast("double").as("aa_score"))
          .filter(col("common_parts") >= 2)
          .orderBy(col("aa_score").desc, col("ca"), col("cb"))
          .limit(100)
      },
      Some("""WITH cp AS (SELECT DISTINCT o_custkey AS c, l_partkey AS p
                          FROM lineitem
                          JOIN orders ON l_orderkey = o_orderkey),
                   d AS (SELECT p, COUNT(*) AS df FROM cp GROUP BY 1
                         HAVING COUNT(*) BETWEEN 2 AND 25),
                   e AS (SELECT cp.c, cp.p, d.df FROM cp JOIN d USING (p)),
                   pr AS (SELECT a.c AS ca, b.c AS cb,
                                 CAST(round(1.0 / ln(a.df), 6)
                                      AS DECIMAL(38,6)) AS w
                          FROM e a JOIN e b
                            ON a.p = b.p AND a.c < b.c)
              SELECT ca, cb, CAST(COUNT(*) AS BIGINT) AS common_parts,
                     CAST(SUM(w) AS DOUBLE) AS aa_score
              FROM pr GROUP BY 1, 2
              HAVING COUNT(*) >= 2
              ORDER BY aa_score DESC, ca, cb LIMIT 100"""))
  )
}
