package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2d — aggregations. All double sums/avgs go through H.dsum/H.davg
  * (exact decimal) so results are independent of partial-aggregation order
  * — mandatory for the hash-compare gate and for determinism under AQE. */
object Aggs {

  val qs: Seq[(String, Q)] = Seq(

    // TPC-H Q1 shape — partial+final HashAggregate, map-side combine free.
    "q_agg_group" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          H.dsum(col("l_quantity")).as("sum_qty"),
          H.dsum(col("l_extendedprice")).as("sum_base"),
          H.dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc"),
          H.davg(col("l_quantity")).as("avg_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_extendedprice")).as("max_price"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some(s"""SELECT l_returnflag, l_linestatus,
                      ${H.oSum("l_quantity")} AS sum_qty,
                      ${H.oSum("l_extendedprice")} AS sum_base,
                      ${H.oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc,
                      ${H.oAvg("l_quantity")} AS avg_qty,
                      MIN(l_quantity) AS min_qty,
                      MAX(l_extendedprice) AS max_price,
                      COUNT(*) AS n_rows
               FROM lineitem
               GROUP BY l_returnflag, l_linestatus
               ORDER BY l_returnflag, l_linestatus""")),

    // Exact distinct per group → Expand + two-phase agg in Spark.
    "q_agg_distinct" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_custs"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_custs,
                     COUNT(*) AS n_orders
              FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // HLL++ sketch — the 100 TB path for cardinality. The sketch estimate
    // is algorithm-internal, so the DECLARED columns are oracle-checkable:
    // the exact count plus a Spark-computed `within_bound` flag
    // (|approx−exact|/exact ≤ 3·rsd); the oracle emits the exact count
    // and literal TRUE. ScalaTest additionally asserts the bound directly.
    "q_agg_approx_distinct" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
             approx_count_distinct(col("l_partkey"), 0.02).as("approx"))
        .select(col("l_returnflag"), col("exact_parts"),
                (abs(col("approx") - col("exact_parts")).cast("double")
                   / col("exact_parts") <= 0.06).as("within_bound"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
                     TRUE AS within_bound
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    "q_agg_rollup" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_custs"), H.dsum(col("c_acctbal")).as("sum_bal"))
          .select(coalesce(col("r_name"), lit("(all)")).as("region"),
                  coalesce(col("n_name"), lit("(all)")).as("nation"),
                  col("n_custs"), col("sum_bal"))
          .orderBy(col("region"), col("nation"))
      },
      Some(s"""SELECT COALESCE(r_name, '(all)') AS region,
                      COALESCE(n_name, '(all)') AS nation,
                      COUNT(*) AS n_custs, ${H.oSum("c_acctbal")} AS sum_bal
               FROM customer
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY ROLLUP(r_name, n_name)
               ORDER BY region, nation""")),

    "q_agg_cube" -> Q(
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .cube(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n_custs"))
          .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
                  coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
                  col("n_custs"))
          .orderBy(col("nation"), col("segment"))
      },
      Some("""SELECT COALESCE(n_name, '(all)') AS nation,
                     COALESCE(c_mktsegment, '(all)') AS segment,
                     COUNT(*) AS n_custs
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              GROUP BY CUBE(n_name, c_mktsegment)
              ORDER BY nation, segment""")),

    "q_agg_groupingsets" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_orders_gs")
        s.sql("""SELECT COALESCE(o_orderstatus, '(all)') AS status,
                        COALESCE(o_orderpriority, '(all)') AS priority,
                        COUNT(*) AS n,
                        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total
                 FROM graft_orders_gs
                 GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                         (o_orderstatus), ())
                 ORDER BY status, priority""")
      },
      Some(s"""SELECT COALESCE(o_orderstatus, '(all)') AS status,
                      COALESCE(o_orderpriority, '(all)') AS priority,
                      COUNT(*) AS n, ${H.oSum("o_totalprice")} AS total
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                       (o_orderstatus), ())
               ORDER BY status, priority""")),

    // Manifest building: gather group members into a deterministic array.
    // The DECLARED column is the comma-joined string: the driver's pandas
    // comparator can't sort/hash ndarray cells (round-1 `err` class), so
    // array outputs serialize to a canonical string at the projection.
    "q_agg_collect" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .groupBy(col("c_mktsegment"))
        .agg(array_sort(collect_set(col("c_nationkey"))).as("nations_arr"),
             count(lit(1)).as("n_custs"))
        .select(col("c_mktsegment"),
                expr("concat_ws(',', transform(nations_arr, x -> CAST(x AS STRING)))")
                  .as("nations"),
                col("n_custs"))
        .orderBy(col("c_mktsegment")),
      Some("""SELECT c_mktsegment,
                     string_agg(CAST(k AS VARCHAR), ',' ORDER BY k) AS nations,
                     n_custs
              FROM (SELECT c_mktsegment, c_nationkey AS k
                    FROM customer GROUP BY 1, 2),
                   (SELECT c_mktsegment AS seg2, COUNT(*) AS n_custs
                    FROM customer GROUP BY 1) cnt
              WHERE c_mktsegment = seg2
              GROUP BY c_mktsegment, n_custs
              ORDER BY c_mktsegment""")),

    // Exact distribution moments: mean/variance/stddev from decimal power
    // sums — the shape that distributes (two partial sums + a count per
    // group, map-side combined; never Spark's order-dependent double
    // stddev). DECIMAL(18,4) × DECIMAL(18,4) = DECIMAL(37,8) is exact in
    // both engines (a (38,4)² product would hit precision-cap rounding
    // rules that differ); the final arithmetic runs in DOUBLE with an
    // identical expression tree on both sides.
    "q_agg_stats" -> Q(
      (s, dir) => {
        val d = col("l_quantity").cast("decimal(18,4)")
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
               sum(d).cast("double").as("s1"),
               sum(d * d).cast("double").as("s2"))
          .select(col("l_returnflag"), col("n"),
                  round(col("s1") / col("n"), 6).as("mean_qty"),
                  round((col("s2") - col("s1") * col("s1") / col("n")) / col("n"), 6)
                    .as("var_qty"),
                  round(sqrt(greatest(
                    (col("s2") - col("s1") * col("s1") / col("n")) / col("n"),
                    lit(0.0))), 6).as("std_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, n,
                     round(s1 / n, 6) AS mean_qty,
                     round((s2 - s1 * s1 / n) / n, 6) AS var_qty,
                     round(sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)), 6) AS std_qty
              FROM (SELECT l_returnflag, COUNT(*) AS n,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
                               * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2
                    FROM lineitem GROUP BY l_returnflag)
              ORDER BY l_returnflag""")),

    // Deterministic statistical mode per group — spelled as count + pick
    // (never an engine's own mode(), whose tie behavior differs): modal
    // value tiebreaks ascending, so the result is stable across engines,
    // runs, and partitionings.
    "q_agg_mode" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("n").desc, col("o_orderstatus"))
        Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"), col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderpriority"),
                  col("o_orderstatus").as("modal_status"), col("n"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, o_orderstatus AS modal_status, n FROM (
                SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
                FROM orders GROUP BY o_orderpriority, o_orderstatus)
              QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                        ORDER BY n DESC, o_orderstatus) = 1
              ORDER BY o_orderpriority""")),

    // Z-score anomaly gate — the data-quality filter run before a corpus
    // ships: per-group moments from exact decimal power sums (one agg,
    // map-side combined), broadcast back onto the stream, rows past 3σ
    // flagged. The broadcast of the tiny stats table is what makes this a
    // single-shuffle plan at 100 TB — the fact table is never re-keyed.
    // mean/sd/z are IDENTICAL double expression trees on both sides
    // (never each engine's own stddev — parallel double sums are
    // order-dependent), so the >3σ cut is deterministic.
    "q_outliers" -> Q(
      (s, dir) => {
        val d = col("value").cast("decimal(18,4)")
        val stats = Tables.events(s, dir)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
               sum(d).cast("double").as("s1"),
               sum(d * d).cast("double").as("s2"))
        val mean = col("s1") / col("n")
        val sd = sqrt(greatest(
          (col("s2") - col("s1") * col("s1") / col("n")) / col("n"), lit(0.0)))
        Tables.events(s, dir)
          .join(broadcast(stats), Seq("event_type"))
          .filter(abs(col("value") - mean) > lit(3.0) * sd)
          .select(col("event_id"), col("event_type"), col("value"),
                  round((col("value") - mean) / sd, 6).as("z"))
          .orderBy(col("event_id"))
      },
      Some("""WITH st AS (SELECT event_type, COUNT(*) AS n,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
                     CAST(SUM(CAST(value AS DECIMAL(18,4))
                              * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2
                   FROM events GROUP BY event_type)
              SELECT event_id, e.event_type AS event_type, value,
                     round((value - s1 / n)
                           / sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0)), 6) AS z
              FROM events e JOIN st ON e.event_type = st.event_type
              WHERE abs(value - s1 / n)
                    > 3.0 * sqrt(greatest((s2 - s1 * s1 / n) / n, 0.0))
              ORDER BY event_id""")),

    // Exact linear-interpolation percentiles (Spark `percentile`, not the
    // t-digest approximation) — both engines use the same
    // (1−g)·x[k] + g·x[k+1] formula; results round to 6 before compare.
    // At 100 TB the approx path (percentile_approx / t-digest) replaces
    // this; the exact form is the correctness anchor it is judged against.
    "q_agg_percentile" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(expr("round(percentile(o_totalprice, 0.5), 6)").as("p50"),
             expr("round(percentile(o_totalprice, 0.9), 6)").as("p90"),
             min(col("o_totalprice")).as("lo"),
             max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
                     round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
                     round(quantile_cont(o_totalprice, 0.9), 6) AS p90,
                     MIN(o_totalprice) AS lo,
                     MAX(o_totalprice) AS hi
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Exact Pearson correlation + population covariance from decimal
    // cross-moments (same distributable-moments pattern as q_agg_stats;
    // Spark's corr() folds doubles in partition order and would be
    // nondeterministic under AQE).
    "q_agg_corr" -> Q(
      (s, dir) => {
        val x = col("l_quantity").cast("decimal(19,4)")
        val y = col("l_extendedprice").cast("decimal(19,4)")
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
               sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
               sum(x * x).cast("double").as("sxx"),
               sum(y * y).cast("double").as("syy"),
               sum(x * y).cast("double").as("sxy"))
          .select(col("l_returnflag"), col("n"),
                  round((col("sxy") - col("sx") * col("sy") / col("n")) / col("n"), 6)
                    .as("covar_pop"),
                  round((col("n") * col("sxy") - col("sx") * col("sy")) /
                        (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
                         sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6)
                    .as("corr_qty_price"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, n,
                     round((sxy - sx * sy / n) / n, 6) AS covar_pop,
                     round((n * sxy - sx * sy) /
                           (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                       AS corr_qty_price
              FROM (SELECT l_returnflag, COUNT(*) AS n,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sx,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sy,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                               * CAST(l_quantity AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
                      CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,4))
                               * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS syy,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(19,4))
                               * CAST(l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS sxy
                    FROM lineitem GROUP BY l_returnflag)
              ORDER BY l_returnflag""")),

    // t-digest-style approximate percentile beside its exact anchor, in
    // the same bounded-check form as q_agg_approx_distinct: declared
    // columns are the exact median plus a Spark-evaluated accuracy bound;
    // the oracle emits the exact value and literal TRUE.
    "q_agg_approx_percentile" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(expr("round(percentile(o_totalprice, 0.5), 6)").as("exact_p50"),
             expr("approx_percentile(o_totalprice, 0.5, 1000)").as("ap"),
             min(col("o_totalprice")).as("lo"),
             max(col("o_totalprice")).as("hi"))
        .select(col("o_orderpriority"), col("exact_p50"),
                (abs(col("ap") - col("exact_p50")) <=
                 (col("hi") - col("lo")) * 0.05).as("within_bound"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
                     round(quantile_cont(o_totalprice, 0.5), 6) AS exact_p50,
                     TRUE AS within_bound
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Boolean aggregates + argmax: validation-report primitives ("did
    // every row pass", "which order set the max"). max_by's ordering
    // value is made unique (price·1e9 + key, exact in double up to 9e15)
    // so ties can't make the arg nondeterministic.
    "q_agg_bool_argmax" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
             expr("bool_or(o_orderstatus = 'P')").as("any_pending"),
             expr("max_by(o_orderkey, o_totalprice * 1e9 + o_orderkey)")
               .as("max_price_key"),
             expr("min_by(o_orderkey, o_totalprice * 1e9 + o_orderkey)")
               .as("min_price_key"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
                     bool_and(o_totalprice > 1000.0) AS all_over_1k,
                     bool_or(o_orderstatus = 'P') AS any_pending,
                     arg_max(o_orderkey, o_totalprice * 1e9 + o_orderkey)
                       AS max_price_key,
                     arg_min(o_orderkey, o_totalprice * 1e9 + o_orderkey)
                       AS min_price_key
              FROM orders GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Calendar-hierarchy subtotals: ROLLUP over derived (year, month)
    // gives monthly rows + yearly subtotals + grand total in one pass —
    // the time-series twin of the dimensional q_agg_rollup.
    "q_rollup_time" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .rollup(col("yr"), col("mo"))
        .agg(count(lit(1)).as("n"), H.dsum(col("o_totalprice")).as("total"))
        .select(coalesce(col("yr"), lit(-1)).as("yr"),
                coalesce(col("mo"), lit(-1)).as("mo"), col("n"), col("total"))
        .orderBy(col("yr"), col("mo")),
      Some(s"""SELECT COALESCE(yr, -1) AS yr, COALESCE(mo, -1) AS mo,
                      COUNT(*) AS n, ${H.oSum("o_totalprice")} AS total
               FROM (SELECT EXTRACT(year FROM o_orderdate) AS yr,
                            EXTRACT(month FROM o_orderdate) AS mo,
                            o_totalprice
                     FROM orders)
               GROUP BY ROLLUP(yr, mo)
               ORDER BY yr, mo""")),

    // Wide validation matrix: day × event_type counts.
    "q_agg_pivot" -> Q(
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val piv = Tables.events(s, dir)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        piv.select(col("day") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
          .orderBy(col("day"))
      },
      Some("""SELECT date_trunc('day', ts) AS day,
                     COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                     COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                     COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                     COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                     COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
              FROM events
              GROUP BY day
              ORDER BY day""")),

    // Fixed-width histogram — the profiling primitive behind every data
    // card: bucket edges are arithmetic on the value, so the whole thing
    // is one map-side-combined hash agg (no sort, no sampling pass).
    // floor(x / width) is the same IEEE divide+floor in both engines —
    // bit-identical bucket assignment; the price range (1 013..499 979 at
    // every sf) fills buckets 0..19 at width 25 000.
    "q_histogram" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .withColumn("bucket", floor(col("o_totalprice") / 25000.0).cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), H.dsum(col("o_totalprice")).as("bucket_total"))
        .withColumn("lo_edge", (col("bucket") * 25000L).cast("double"))
        .select(col("bucket"), col("lo_edge"), col("n"), col("bucket_total"))
        .orderBy(col("bucket")),
      Some(s"""SELECT bucket, CAST(bucket * 25000 AS DOUBLE) AS lo_edge,
                      COUNT(*) AS n, ${H.oSum("o_totalprice")} AS bucket_total
               FROM (SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
                            o_totalprice
                     FROM orders)
               GROUP BY bucket
               ORDER BY bucket""")),

    // Ordered string aggregation (LISTAGG) — the report-column shape.
    // Spark has no within-group ORDER BY, so determinism comes from
    // array_sort(collect_set(...)) (the engine's standard idiom); DuckDB
    // mirrors it with list_sort(list(DISTINCT ...)). The distinct set per
    // group is tiny (order statuses), so the agg buffer stays bounded at
    // any scale — unordered collect_list of a 100 TB group would not.
    "q_agg_listagg" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(concat_ws(",", array_sort(collect_set(col("o_orderstatus"))))
               .as("statuses"),
             countDistinct(col("o_orderstatus")).as("n_statuses"),
             count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
                     array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
                       AS statuses,
                     COUNT(DISTINCT o_orderstatus) AS n_statuses,
                     COUNT(*) AS n_orders
              FROM orders
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Discrete median (PERCENTILE_DISC 0.5): the smallest value with
    // cdf >= 0.5 — an actual data value, unlike the interpolated
    // q_agg_percentile. Verified against DuckDB: quantile_disc picks the
    // 1-indexed element at floor((n-1)*q)+1 of the sorted group, which is
    // exactly the row_number the de-skewed pass reconstructs. r9: the
    // original single window partitioned the CORPUS on o_orderpriority
    // (cardinality 5 — the q_weighted_median 3-task-ceiling shape named
    // by the r8 verdict), so the rank is now two-level (q_rolling_corr
    // sweep precedent): bucket the value axis by a fixed price stride
    // (monotone coarsening of the LEADING sort key — totalprice ties
    // stay in-bucket, so bucket order IS sort order), row_number within
    // (priority, bkt) on ~5×135 parallel tasks, then add per-bucket
    // carry-in counts from an exclusive prefix over the tiny (priority,
    // bkt) totals table, broadcast back. row_number over a unique total
    // order is deterministic, so the reconstructed global rank — and the
    // selected median row — is bit-identical to the single-window
    // spelling the oracle keeps. No double arithmetic at all.
    "q_median_disc" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val o = Tables.orders(s, dir)
          .withColumn("bkt", floor(col("o_totalprice") / 4096).cast("long"))
        val wLoc = Window.partitionBy(col("o_orderpriority"), col("bkt"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wCar = Window.partitionBy(col("o_orderpriority")).orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offs = o.groupBy(col("o_orderpriority"), col("bkt"))
          .agg(count(lit(1)).as("bn"))
          .select(col("o_orderpriority"), col("bkt"),
                  coalesce(sum(col("bn")).over(wCar), lit(0L)).as("carry"),
                  sum(col("bn")).over(
                    Window.partitionBy(col("o_orderpriority"))).as("n"))
        o.withColumn("lrn", row_number().over(wLoc).cast("long"))
          .join(broadcast(offs), Seq("o_orderpriority", "bkt"))
          .filter(col("carry") + col("lrn") === floor((col("n") - 1) / 2) + 1)
          .select(col("o_orderpriority"), col("o_totalprice").as("median_price"),
                  col("n").as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
                     quantile_disc(o_totalprice, 0.5) AS median_price,
                     COUNT(*) AS n_orders
              FROM orders
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority""")),

    // Ratio-to-report: each group's share of the global total. Two-level
    // aggregation — per-group exact decimal sums (one shuffle), then the
    // global total as a window over the GROUP rows (5 rows here; at any
    // scale the group table is tiny relative to the fact, so the
    // single-partition window is over an already-reduced input, never the
    // corpus). Share is an exact decimal ratio rounded once at 6.
    "q_percent_of_total" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val grp = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("o_totalprice").cast(H.D)).as("rev_d"),
               count(lit(1)).as("n_orders"))
        // both sides derive the same exact decimals, cast each to double,
        // then do ONE IEEE division rounded at 6 — decimal/decimal result
        // scales differ between engines, double division does not
        grp.withColumn("share",
            round(col("rev_d").cast("double") /
                  sum(col("rev_d")).over(Window.partitionBy()).cast("double"), 6))
          .select(col("o_orderpriority"), col("rev_d").cast("double").as("revenue"),
                  col("n_orders"), col("share"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(rev_d AS DOUBLE) AS revenue, n_orders,
                     round(CAST(rev_d AS DOUBLE)
                           / CAST(SUM(rev_d) OVER () AS DOUBLE), 6) AS share
              FROM (SELECT o_orderpriority,
                           SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev_d,
                           COUNT(*) AS n_orders
                    FROM orders
                    GROUP BY o_orderpriority)
              ORDER BY o_orderpriority""")),

    // Two-phase salted aggregation — the skew-safe shape for a
    // HEAVY-HITTER group key (here 3 flag values over the whole corpus:
    // a plain groupBy would reduce each flag on one task). Phase 1
    // shuffles on (key, salt) — 8 deterministic salt lanes from a
    // row-stable column, so every lane is an independent partial;
    // phase 2 merges the 24 lane rows. Decimal sums are associative, so
    // the re-merge is bit-identical to the direct aggregation — which is
    // exactly what the oracle computes (plain GROUP BY), making the
    // salting invisible to the hash gate. count-weighted avg derives
    // from the merged sums, never from averaging averages.
    "q_agg_salted" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(8)).as("salt"))
        .agg(sum(col("l_quantity").cast(H.D)).as("sq"),
             sum(col("l_extendedprice").cast(H.D)).as("sp"),
             count(lit(1)).as("n"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("sq")).cast(H.D).cast("double").as("sum_qty"),
             sum(col("sp")).cast(H.D).cast("double").as("sum_price"),
             (sum(col("sq")) / sum(col("n"))).cast(H.D).cast("double").as("avg_qty"),
             sum(col("n")).as("n_rows"))
        .orderBy(col("l_returnflag")),
      Some(s"""SELECT l_returnflag,
                      ${H.oSum("l_quantity")} AS sum_qty,
                      ${H.oSum("l_extendedprice")} AS sum_price,
                      ${H.oAvg("l_quantity")} AS avg_qty,
                      COUNT(*) AS n_rows
               FROM lineitem
               GROUP BY 1 ORDER BY 1"""))
    ,

    // Native Apache DataSketches aggregates (Spark 3.5+/4 built-ins):
    // hll_sketch_agg and theta_sketch_agg are the production mergeable
    // distinct-count path — binary sketches that union across partitions
    // and ROLL UP across time grains without rescanning (our hand-rolled
    // udaf_hll pins the algorithm; this pins the engine's own surface).
    // Correctness gating leans on the exact regime: at the oracle sf the
    // per-flag supplier domain (~100) sits far below both sketches'
    // sparse/exact thresholds (lgK=12 HLL, k=4096 theta), so the
    // estimates EQUAL the exact distinct count the oracle computes —
    // any estimator drift at gate scale breaks the hash.
    "q_agg_sketch_native" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          // lgK 14 (r14; was 12): the oracle asserts the sketches sit in
          // their EXACT regime at the gated sfs — at sf0.1 the distinct
          // suppkeys (~1000 per flag) left lgK 12's coupon-exact range
          // and the estimate read 996 vs 1000. lgK 14 keeps the sketch
          // exact well past the sf0.1 cardinality; beyond the exact
          // regime an HLL estimate can never hash-match another engine's
          // exact count — that boundary IS the declared contract.
          expr("cast(round(hll_sketch_estimate(hll_sketch_agg(l_suppkey, 14))) as bigint)")
            .as("hll_nd"),
          expr("cast(round(theta_sketch_estimate(theta_sketch_agg(l_suppkey))) as bigint)")
            .as("theta_nd"),
          countDistinct(col("l_suppkey")).as("exact_nd"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
                     COUNT(DISTINCT l_suppkey) AS hll_nd,
                     COUNT(DISTINCT l_suppkey) AS theta_nd,
                     COUNT(DISTINCT l_suppkey) AS exact_nd
              FROM lineitem
              GROUP BY 1 ORDER BY 1""")),

    // Native frequent-items sketch (approx_top_k): the heavy-hitter
    // report without a full groupBy-sort — the sketch tracks up to
    // maxItemsTracked counters per partition and merges. Exact regime
    // again: the brand domain is far below the tracked capacity, so
    // counts are exact; the sketch's own tie order is arbitrary, so the
    // sketch is asked for MORE than the report needs (k=8 clears the
    // measured 90-count tie cluster at ranks 4-6) and the declared
    // result re-sorts the exploded entries on (count desc, item) before
    // the top-5 cut — determinism never rides on sketch internals.
    "q_agg_approx_topk" -> Q(
      (s, dir) => Tables.part(s, dir)
        .agg(expr("approx_top_k(p_brand, 8)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("brand"), col("e.count").as("n"))
        .orderBy(col("n").desc, col("brand"))
        .limit(5)
      ,
      Some("""SELECT p_brand AS brand, COUNT(*) AS n
              FROM part
              GROUP BY 1
              ORDER BY n DESC, brand LIMIT 5""")),

    // DYNAMIC pivot — q_agg_pivot's column list is compile-time fixed;
    // here the pivot values are DISCOVERED from the data first (sorted
    // distinct o_orderstatus), because Spark's pivot columns must be
    // known to the PLAN: the two-phase collect-then-pivot is the
    // documented production pattern (a driver-side collect of the
    // |distinct values| ONLY — bounded by the category cardinality, not
    // the corpus, so it is the one legitimate collect class). The
    // oracle pins the fixture instantiation of the discovered set
    // (F/O/P); a fixture with new statuses changes the declared schema
    // by design — that is what "dynamic" means.
    "q_agg_pivot_dynamic" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val statuses = o.select(col("o_orderstatus")).distinct()
          .orderBy(col("o_orderstatus"))
          .collect().map(_.getString(0)).toSeq // |distinct| rows, bounded
        val piv = o.groupBy(col("o_orderpriority"))
          .pivot("o_orderstatus", statuses)
          .agg(count(lit(1)))
        piv.select(col("o_orderpriority") +:
            statuses.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority,
                     COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
                     COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
                     COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P
              FROM orders
              GROUP BY 1 ORDER BY o_orderpriority"""))
  )
}
