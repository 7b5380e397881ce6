package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** SURVEY §2f — sorts / limits / top-k / set operations. `q_topk` must plan
  * as TakeOrderedAndProject (per-partition heaps, no global sort) — checked
  * in the plan-audit spec. */
object SetOps {

  val qs: Seq[(String, Q)] = Seq(

    "q_sort_global" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
        .orderBy(col("o_orderstatus").asc_nulls_last, col("o_totalprice").desc,
                 col("o_orderkey")),
      Some("""SELECT o_orderstatus, o_totalprice, o_orderkey
              FROM orders
              ORDER BY o_orderstatus ASC NULLS LAST, o_totalprice DESC, o_orderkey""")),

    "q_topk" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    "q_limit_offset" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .offset(100).limit(50),
      Some("""SELECT o_orderkey, o_totalprice
              FROM orders ORDER BY o_totalprice DESC, o_orderkey
              LIMIT 50 OFFSET 100""")),

    // Multi-spreadsheet concat: two period slices stacked by column name.
    "q_union" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
        val a = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp_ntz"))
        val b = o.filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp_ntz"))
        a.unionByName(b).orderBy(col("o_orderkey"))
      },
      Some("""SELECT * FROM (
                SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
                WHERE o_orderdate < TIMESTAMP '1996-01-01'
                UNION ALL
                SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
                WHERE o_orderdate >= TIMESTAMP '2000-01-01')
              ORDER BY o_orderkey""")),

    // Wide→long reshape (melt/unpivot): four measure columns become
    // (metric, value) rows — the normalization step feature pipelines run
    // before per-metric aggregation. Pure row-local projection (each input
    // row emits 4, no shuffle).
    "q_unpivot" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"), col("l_discount"), col("l_tax"))
        .unpivot(
          ids = Array(col("l_orderkey"), col("l_linenumber")),
          values = Array(col("l_quantity"), col("l_extendedprice"),
                         col("l_discount"), col("l_tax")),
          variableColumnName = "metric",
          valueColumnName = "value")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric")),
      Some("""SELECT l_orderkey, l_linenumber, metric, value
              FROM (SELECT l_orderkey, l_linenumber, l_quantity,
                           l_extendedprice, l_discount, l_tax FROM lineitem)
                   UNPIVOT (value FOR metric IN
                            (l_quantity, l_extendedprice, l_discount, l_tax))
              ORDER BY l_orderkey, l_linenumber, metric""")),

    // Schema-evolution union: a v2 slice carries an extra column the v1
    // slice lacks — unionByName(allowMissingColumns) null-fills v1, the
    // ingest-era "new spreadsheet gained a column" case.
    "q_union_evolved" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val v1 = o.filter(col("o_orderkey") % 3 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
        val v2 = o.filter(col("o_orderkey") % 3 === 1)
          .select(col("o_orderkey"), col("o_totalprice"),
                  col("o_orderpriority").as("priority"))
        v1.unionByName(v2, allowMissingColumns = true)
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT * FROM (
                SELECT o_orderkey, o_totalprice, NULL AS priority FROM orders
                WHERE o_orderkey % 3 = 0
                UNION ALL
                SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
                WHERE o_orderkey % 3 = 1)
              ORDER BY o_orderkey""")),

    // Customers active in both halves of the data (INTERSECT dedups —
    // same semantics both engines).
    "q_intersect" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        early.intersect(late).orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
              INTERSECT
              SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
              ORDER BY o_custkey""")),

    // The NOT IN / NULL three-valued-logic trap, pinned: when the
    // subquery column contains a NULL, `x NOT IN (sub)` is never TRUE
    // (x <> NULL is UNKNOWN), so the NOT IN count DROPS TO ZERO while
    // the NULL-ignoring anti-join keeps matching — the single most
    // common silent-wrong-answer in migrated SQL. One row pins all
    // three counts (not_in with nulls, not_in null-filtered, anti-join)
    // so an engine change that "fixes" the semantics breaks the hash.
    "q_not_in_null" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        // every 10th orderkey goes NULL — a guaranteed-nonempty NULL
        // source regardless of fixture key layout
        val subNull = Tables.lineitem(s, dir)
          .select(expr("CASE WHEN l_orderkey % 10 = 0 THEN NULL ELSE l_orderkey END")
            .as("k"))
        val subClean = subNull.filter(col("k").isNotNull)
        // spelled via SQL so the planner sees the genuine NOT IN predicate
        subNull.createOrReplaceTempView("__sub_null")
        subClean.createOrReplaceTempView("__sub_clean")
        o.createOrReplaceTempView("__orders_nin")
        s.sql("""
          SELECT
            (SELECT COUNT(*) FROM __orders_nin
             WHERE o_orderkey NOT IN (SELECT k FROM __sub_null)) AS n_not_in_with_null,
            (SELECT COUNT(*) FROM __orders_nin
             WHERE o_orderkey NOT IN (SELECT k FROM __sub_clean)) AS n_not_in_clean,
            (SELECT COUNT(*) FROM __orders_nin o
             WHERE NOT EXISTS (SELECT 1 FROM __sub_null s WHERE s.k = o.o_orderkey))
              AS n_anti_join
        """)
      },
      Some("""WITH sub_null AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN NULL
                                           ELSE l_orderkey END AS k FROM lineitem),
                   sub_clean AS (SELECT k FROM sub_null WHERE k IS NOT NULL)
              SELECT
                (SELECT COUNT(*) FROM orders
                 WHERE o_orderkey NOT IN (SELECT k FROM sub_null)) AS n_not_in_with_null,
                (SELECT COUNT(*) FROM orders
                 WHERE o_orderkey NOT IN (SELECT k FROM sub_clean)) AS n_not_in_clean,
                (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM sub_null s
                                   WHERE s.k = o.o_orderkey)) AS n_anti_join""")),

    // Relational division — "customers who ordered in EVERY priority
    // class": the universal-quantifier join SQL has no operator for,
    // expressed as the count-distinct-equals-universe reduction (one
    // corpus groupBy + a 1-row universe broadcast). The alternative
    // double-NOT-EXISTS spelling is quadratic in subquery hops; this is
    // the shape that scales.
    "q_division" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val universe = o.agg(count_distinct(col("o_orderpriority")).as("n_univ"))
        o.groupBy(col("o_custkey"))
          .agg(count_distinct(col("o_orderpriority")).as("n_prios"),
               count(lit(1)).as("n_orders"))
          .crossJoin(broadcast(universe))
          .filter(col("n_prios") === col("n_univ"))
          .select(col("o_custkey"), col("n_orders"))
          .orderBy(col("o_custkey"))
      },
      Some("""WITH u AS (SELECT COUNT(DISTINCT o_orderpriority) AS n_univ FROM orders)
              SELECT o_custkey, COUNT(*) AS n_orders
              FROM orders, u
              GROUP BY o_custkey, n_univ
              HAVING COUNT(DISTINCT o_orderpriority) = n_univ
              ORDER BY o_custkey""")),

    // Several COUNT(DISTINCT ...) over DIFFERENT columns in one
    // aggregation — Catalyst plans this via the Expand operator (one
    // input row fans to one row per distinct-aggregate, each keeping
    // only its own column, then a two-level agg dedups per gid). The
    // shape matters at scale because the naive alternative is N
    // separate jobs over the corpus; Expand keeps it one scan + one
    // grouped shuffle. Plan-audited below.
    "q_multi_distinct" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .groupBy(col("o_orderstatus"))
        .agg(count_distinct(col("o_custkey")).as("n_custs"),
             count_distinct(col("o_orderpriority")).as("n_prios"),
             count_distinct(trunc(to_date(col("o_orderdate")), "month"))
               .as("n_months"),
             count(lit(1)).as("n_rows"))
        .orderBy(col("o_orderstatus")),
      Some("""SELECT o_orderstatus,
                     COUNT(DISTINCT o_custkey) AS n_custs,
                     COUNT(DISTINCT o_orderpriority) AS n_prios,
                     COUNT(DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)))
                       AS n_months,
                     COUNT(*) AS n_rows
              FROM orders GROUP BY 1 ORDER BY 1""")),

    // Null-key aggregation semantics: SQL groups NULL keys into ONE
    // group (unlike joins, where NULL never equals NULL — q_join_nullsafe
    // covers that side). The nullable key is derived via NULLIF so the
    // fixture exercises a real NULL group (~2.9k zero-discount rows at
    // sf0.01); identical single-group behavior on both engines is the
    // pinned contract.
    "q_null_group" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .withColumn("k", expr("nullif(l_discount, 0.0)"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"),
             graft.H.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("k").asc_nulls_last),
      Some(s"""SELECT NULLIF(l_discount, 0.0) AS k, COUNT(*) AS n,
                      ${graft.H.oSum("l_quantity")} AS sum_qty
               FROM lineitem GROUP BY 1 ORDER BY k ASC NULLS LAST""")),

    // Bag-semantics set ops — EXCEPT ALL / INTERSECT ALL keep
    // multiplicities (except_all n = max(0, early_cnt − late_cnt);
    // intersect_all n = min(early_cnt, late_cnt)), which the distinct
    // variants below erase. Reported as per-key multiplicity counts
    // under an op tag, so the oracle pins the bag arithmetic itself.
    // Physically each ALL op is one shuffle on the compare key with
    // map-combined pre-counts — no corpus-wide distinct.
    "q_setops_all" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        val ea = early.exceptAll(late).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
        val ia = early.intersectAll(late).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
        ea.unionByName(ia)
          .select(col("op"), col("o_custkey"), col("n"))
          .orderBy(col("op"), col("o_custkey"))
      },
      Some("""WITH early AS (SELECT o_custkey FROM orders
                             WHERE o_orderdate < TIMESTAMP '1998-01-01'),
                   late AS (SELECT o_custkey FROM orders
                            WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
                   ea AS (SELECT 'except_all' AS op, o_custkey, COUNT(*) AS n
                          FROM (SELECT * FROM early EXCEPT ALL SELECT * FROM late)
                          GROUP BY 2),
                   ia AS (SELECT 'intersect_all' AS op, o_custkey, COUNT(*) AS n
                          FROM (SELECT * FROM early INTERSECT ALL SELECT * FROM late)
                          GROUP BY 2)
              SELECT op, o_custkey, n FROM ea
              UNION ALL SELECT op, o_custkey, n FROM ia
              ORDER BY op, o_custkey""")),

    // Diff report old-vs-new: customers who ordered early but not late.
    "q_except" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val early = o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        val late = o.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp_ntz"))
          .select(col("o_custkey"))
        early.except(late).orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
              EXCEPT
              SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
              ORDER BY o_custkey""")),

    // Whole-row dedup on a key projection (dropDuplicates(keys) picks a
    // nondeterministic survivor — SURVEY §7.4.6 — so dedup the projection).
    "q_distinct_rows" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"), col("l_shipdate")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
              FROM lineitem
              ORDER BY l_returnflag, l_linestatus, l_shipdate""")),

    // Snapshot diff — the DETECT side of CDC (q_merge_upsert is the
    // APPLY side): full-outer join two table versions on the key, emit
    // only added/removed/changed rows. Version B is derived
    // deterministically from A (every 13th key deleted, every 7th price
    // doubled) so the report is oracle-checkable. One shuffle on the key;
    // at 100 TB both snapshots would be bucketed on it and the join is
    // co-located.
    "q_snapshot_diff" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_totalprice"))
        val a = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("price_a"))
        val b = o.filter(col("o_orderkey") % 13 =!= 0)
          .select(col("o_orderkey").as("kb"),
                  when(col("o_orderkey") % 7 === 0, col("o_totalprice") * 2)
                    .otherwise(col("o_totalprice")).as("price_b"))
        a.join(b, col("k") === col("kb"), "full")
          .withColumn("status",
            when(col("kb").isNull, "removed")
              .when(col("k").isNull, "added")
              .when(col("price_a") =!= col("price_b"), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select(coalesce(col("k"), col("kb")).as("o_orderkey"),
                  col("status"), col("price_a"), col("price_b"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, status, price_a, price_b FROM (
                SELECT COALESCE(k, kb) AS o_orderkey,
                       CASE WHEN kb IS NULL THEN 'removed'
                            WHEN k IS NULL THEN 'added'
                            WHEN price_a <> price_b THEN 'changed'
                            ELSE 'unchanged' END AS status,
                       price_a, price_b
                FROM (SELECT o_orderkey AS k, o_totalprice AS price_a
                      FROM orders) a
                FULL JOIN (SELECT o_orderkey AS kb,
                             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                                  ELSE o_totalprice END AS price_b
                           FROM orders WHERE o_orderkey % 13 <> 0) b
                  ON k = kb)
              WHERE status <> 'unchanged'
              ORDER BY o_orderkey"""))
  )
}
