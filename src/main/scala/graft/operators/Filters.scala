package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2b — projections / filters / predicates. Reference capability:
  * spreadsheet column mapping, row validation, malformed-row handling
  * (imperative pandas in the reference; declarative Catalyst here so
  * pushdown/pruning come free at scale). */
object Filters {

  val qs: Seq[(String, Q)] = Seq(

    "q_project_rename_cast" -> Q(
      (s, dir) => Tables.lineitem(s, dir)
        .select(
          col("l_orderkey").as("order_id"),
          col("l_linenumber").cast(LongType).as("line_no"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          // round-to-cents via the decimal cast, DECLARED as double (the
          // driver's comparator hash-splits on decimal representation)
          col("l_extendedprice").cast(DecimalType(18, 2)).cast(DoubleType)
            .as("price_dec"),
          upper(col("l_returnflag")).as("flag"))
        .orderBy(col("order_id"), col("line_no")),
      Some("""SELECT l_orderkey AS order_id,
                     CAST(l_linenumber AS BIGINT) AS line_no,
                     CAST(l_quantity AS INT) AS qty_int,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
                     UPPER(l_returnflag) AS flag
              FROM lineitem
              ORDER BY order_id, line_no""")),

    "q_filter_pred" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .filter(
          col("o_orderstatus").isin("F", "O") &&
          col("o_totalprice").between(1000.0, 200000.0) &&
          (col("o_orderpriority").like("1%") || col("o_orderpriority").like("2%")) &&
          !col("o_orderpriority").like("%LOW%") &&
          col("o_orderdate").isNotNull)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
                col("o_orderpriority"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
              FROM orders
              WHERE o_orderstatus IN ('F','O')
                AND o_totalprice BETWEEN 1000.0 AND 200000.0
                AND (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%')
                AND NOT (o_orderpriority LIKE '%LOW%')
                AND o_orderdate IS NOT NULL
              ORDER BY o_orderkey""")),

    // Fixtures carry no nulls, so nulls are manufactured deterministically
    // with NULLIF, then cleaned: drop null keys, default-fill optionals.
    "q_null_clean" -> Q(
      (s, dir) => Tables.customer(s, dir)
        .withColumn("seg", when(col("c_mktsegment") === "BUILDING", lit(null: String))
          .otherwise(col("c_mktsegment")))
        .withColumn("bal", when(col("c_acctbal") < 0, lit(null: java.lang.Double))
          .otherwise(col("c_acctbal")))
        .na.fill(Map("seg" -> "UNKNOWN"))
        .withColumn("bal", coalesce(col("bal"), lit(0.0)))
        .filter(col("c_custkey").isNotNull)
        .select(col("c_custkey"), col("seg"), col("bal"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
                     COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'UNKNOWN') AS seg,
                     COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal
              FROM customer
              WHERE c_custkey IS NOT NULL
              ORDER BY c_custkey""")),

    // Subquery surface: uncorrelated IN + scalar subquery. Catalyst
    // rewrites IN to a left-semi join and the scalar to a one-row
    // broadcast — declared here as SQL because subqueries ARE the user
    // surface being exercised. The scalar is the exact-decimal average
    // (a raw AVG(double) is partial-sum-order-dependent in Spark and
    // would make the predicate boundary nondeterministic).
    "q_subquery_in" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_sq_orders")
        Tables.customer(s, dir).createOrReplaceTempView("graft_sq_customer")
        s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
                 FROM graft_sq_orders
                 WHERE o_custkey IN (SELECT c_custkey FROM graft_sq_customer
                                     WHERE c_acctbal > 9000.0)
                   AND o_totalprice >
                       (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                                         / COUNT(*) AS DECIMAL(38,4)) AS DOUBLE)
                        FROM graft_sq_orders)
                 ORDER BY o_orderkey""")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice
              FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM customer
                                  WHERE c_acctbal > 9000.0)
                AND o_totalprice >
                    (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                                      / COUNT(*) AS DECIMAL(38,4)) AS DOUBLE)
                     FROM orders)
              ORDER BY o_orderkey""")),

    // Correlated SCALAR subquery — one value per outer row; Catalyst
    // de-correlates it into an aggregate + left outer join (never a
    // per-row re-execution, which is what makes the spelling safe at
    // 100 TB). MAX is order-free so the double is hash-stable.
    "q_subquery_scalar" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_sq_orders")
        Tables.customer(s, dir).createOrReplaceTempView("graft_sq_customer")
        s.sql("""SELECT c_custkey, c_name,
                        (SELECT MAX(o_totalprice) FROM graft_sq_orders o
                         WHERE o.o_custkey = c.c_custkey) AS max_order
                 FROM graft_sq_customer c
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name,
                     (SELECT MAX(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey) AS max_order
              FROM customer c
              ORDER BY c_custkey""")),

    // Correlated NOT EXISTS — planned as a left-anti join (same result as
    // q_join_anti by construction; this declares the subquery SPELLING).
    "q_subquery_exists" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_sq_orders")
        Tables.customer(s, dir).createOrReplaceTempView("graft_sq_customer")
        s.sql("""SELECT c_custkey, c_name
                 FROM graft_sq_customer c
                 WHERE NOT EXISTS (SELECT 1 FROM graft_sq_orders o
                                   WHERE o.o_custkey = c.c_custkey
                                     AND o.o_orderstatus = 'P')
                 ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_name
              FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = c.c_custkey
                                  AND o.o_orderstatus = 'P')
              ORDER BY c_custkey""")),

    // Constraint validation report — the ingest gate's PK/FK/domain
    // checks as one single-row result: orphaned foreign keys, duplicate
    // primary keys, domain violations. Each check is a distributed
    // aggregate; the report row is their conjunction.
    "q_check_constraints" -> Q(
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val orphans = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_orphan_fk"))
        val dupPk = o.groupBy(col("o_orderkey")).agg(count(lit(1)).as("k"))
          .filter(col("k") > 1).agg(count(lit(1)).as("n_dup_pk"))
        val domain = o.filter(!col("o_orderstatus").isin("F", "O", "P") ||
                              col("o_totalprice") <= 0.0)
          .agg(count(lit(1)).as("n_domain_bad"))
        orphans.crossJoin(dupPk).crossJoin(domain)
          .withColumn("all_valid",
            col("n_orphan_fk") === 0 && col("n_dup_pk") === 0 &&
            col("n_domain_bad") === 0)
      },
      Some("""SELECT
                (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS n_orphan_fk,
                (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                       GROUP BY 1 HAVING COUNT(*) > 1)) AS n_dup_pk,
                (SELECT COUNT(*) FROM orders
                 WHERE o_orderstatus NOT IN ('F','O','P')
                    OR o_totalprice <= 0.0) AS n_domain_bad,
                (SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) = 0
                AND (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                           GROUP BY 1 HAVING COUNT(*) > 1)) = 0
                AND (SELECT COUNT(*) FROM orders
                     WHERE o_orderstatus NOT IN ('F','O','P')
                        OR o_totalprice <= 0.0) = 0 AS all_valid""")),

    "q_conditional" -> Q(
      (s, dir) => Tables.orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 150000.0, "large")
            .when(col("o_totalprice") > 50000.0, "medium")
            .when(col("o_orderstatus") === "F", "small_done")
            .otherwise("small_open").as("bucket"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice > 150000.0 THEN 'large'
                          WHEN o_totalprice > 50000.0 THEN 'medium'
                          WHEN o_orderstatus = 'F' THEN 'small_done'
                          ELSE 'small_open' END AS bucket
              FROM orders
              ORDER BY o_orderkey""")),

    // Spark 4 SQL pipe syntax (|>): the linear query-authoring surface —
    // each |> stage consumes the previous table, so filter → aggregate →
    // having → order reads top-to-bottom instead of inside-out. Catalyst
    // resolves pipes to the identical logical plan as the nested form
    // (the oracle IS that nested ANSI form), so pushdown / partial agg /
    // TakeOrdered all fire unchanged — the pipe surface is free at any
    // scale. Aggregates ride the exact-decimal lane as everywhere.
    "q_sql_pipe" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("graft_pipe_lineitem")
        s.sql("""FROM graft_pipe_lineitem
                 |> WHERE l_quantity >= 30.0
                 |> AGGREGATE COUNT(*) AS n,
                      CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                        AS sum_qty
                    GROUP BY l_returnflag, l_linestatus
                 |> WHERE n > 100
                 |> ORDER BY l_returnflag, l_linestatus""")
      },
      Some(s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
                      ${H.oSum("l_quantity")} AS sum_qty
               FROM lineitem
               WHERE l_quantity >= 30.0
               GROUP BY 1, 2
               HAVING COUNT(*) > 100
               ORDER BY 1, 2""")),

    // Named-parameter SQL binding (spark.sql(text, args)): how
    // application code should inject user values — parameter markers
    // bind as literals in the ANALYZED plan, so there is no string
    // splicing (injection-safe) and Catalyst still constant-folds and
    // pushes the bound predicate to the scan like any literal. The
    // oracle is the same query with the values spelled inline, pinning
    // that binding changes nothing semantically.
    "q_sql_params" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_par_orders")
        s.sql(
          """SELECT o_orderkey, o_orderstatus, o_totalprice
             FROM graft_par_orders
             WHERE o_totalprice > :minTotal AND o_orderstatus = :status
             ORDER BY o_orderkey""",
          Map("minTotal" -> 300000.0, "status" -> "O"))
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
              FROM orders
              WHERE o_totalprice > 300000.0 AND o_orderstatus = 'O'
              ORDER BY o_orderkey""")),

    // SQL session VARIABLES + the IDENTIFIER clause — the other half of
    // the parameterized-SQL surface (q_sql_params binds per-call args;
    // variables persist across statements in the session, and
    // IDENTIFIER() lets the TABLE NAME itself come from a variable
    // without string splicing — the injection-safe form of dynamic SQL
    // that scripted ELT (dbt-style loops over table lists) needs).
    // DECLARE OR REPLACE keeps the key idempotent across reruns in one
    // session. The bound values still constant-fold and push to the
    // scan; the oracle spells everything inline.
    "q_sql_variables" -> Q(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("graft_var_lineitem")
        s.sql("DECLARE OR REPLACE VARIABLE graft_min_qty DOUBLE DEFAULT 0.0")
        s.sql("DECLARE OR REPLACE VARIABLE graft_src STRING DEFAULT ''")
        s.sql("SET VAR graft_min_qty = 47.0")
        s.sql("SET VAR graft_src = 'graft_var_lineitem'")
        s.sql(
          """SELECT l_returnflag, COUNT(*) AS n,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                      AS sum_qty
             FROM IDENTIFIER(graft_src)
             WHERE l_quantity >= graft_min_qty
             GROUP BY l_returnflag
             ORDER BY l_returnflag""")
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n,
                      ${H.oSum("l_quantity")} AS sum_qty
               FROM lineitem
               WHERE l_quantity >= 47.0
               GROUP BY 1 ORDER BY 1""")),

    // EXECUTE IMMEDIATE — the last piece of the dynamic-SQL triad
    // (params bind per-call, variables persist, EXECUTE IMMEDIATE runs a
    // statement whose TEXT is itself session state). The statement string
    // lives in a variable and its positional ? markers bind through
    // USING, so generated ELT (a driver table of statements) runs with no
    // string splicing anywhere. The bound literal still reaches the scan:
    // the inner statement is analyzed like any other query, so pushdown
    // and partial aggregation are unchanged — dynamic text costs nothing
    // at plan time. Oracle spells the statement inline with the value.
    "q_exec_immediate" -> Q(
      (s, dir) => {
        Tables.orders(s, dir).createOrReplaceTempView("graft_ei_orders")
        s.sql("DECLARE OR REPLACE VARIABLE graft_stmt STRING DEFAULT ''")
        s.sql("""SET VAR graft_stmt =
                   'SELECT o_orderpriority, COUNT(*) AS n,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4)))
                                AS DOUBLE) AS sum_total
                    FROM graft_ei_orders
                    WHERE o_totalprice > ? AND o_orderstatus = ?
                    GROUP BY o_orderpriority
                    ORDER BY o_orderpriority'""")
        s.sql("EXECUTE IMMEDIATE graft_stmt USING 250000.0, 'F'")
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n,
                      ${H.oSum("o_totalprice")} AS sum_total
               FROM orders
               WHERE o_totalprice > 250000.0 AND o_orderstatus = 'F'
               GROUP BY 1 ORDER BY 1"""))
  )
}
