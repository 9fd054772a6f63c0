package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** ANSI-SQL front-end coverage: correlated and uncorrelated subqueries run
  * through `spark.sql` over temp views of the same parquet tables. Each
  * query here is ONE SQL string executed verbatim by both engines (Spark
  * and the DuckDB oracle), so this pack is a direct differential test of
  * Catalyst's subquery machinery: scalar-subquery decorrelation
  * (RewriteCorrelatedScalarSubquery), EXISTS/IN → semi join, NOT IN → anti
  * join (RewritePredicateSubquery), and lateral join.
  *
  * The reference's only subquery-shaped operation is the per-key existence
  * probe of the upsert (J1, `/root/reference/task.ts:267-284` — `where
  * cotuid='<id>'` deciding insert vs update); b3/b4 are exactly that
  * decision expressed as EXISTS / NOT IN over a whole table instead of one
  * HTTP probe per row.
  *
  * Scale notes (100 TB): every subquery here decorrelates to a join — no
  * per-row re-execution anywhere. Correlated aggregates (b2, b5, b6) become
  * one grouped aggregation on the correlation key + an equi-join, i.e. two
  * shuffles independent of row count; EXISTS/IN (b1, b3, b8) become
  * left-semi hash joins on the key; NOT IN (b4, null-free keys by schema)
  * becomes a left-anti join. The scalar-subquery thresholds (b7) broadcast
  * a single row. Catalyst plans all of this from the SQL text — the same
  * text a reference user would migrate unchanged.
  */
object SubqueryPack extends QueryPack {

  /** Register temp views for the shared-SQL queries. Idempotent per session. */
  private def viewed(tables: String*)(sql: String): (String, (SparkSession, String) => DataFrame) =
    (sql, (s: SparkSession, d: String) => {
      tables.foreach {
        case "events" => Tables.events(s, d).createOrReplaceTempView("events")
        case t        => Tables.table(s, d, t).createOrReplaceTempView(t)
      }
      s.sql(sql)
    })

  private def sharedSql(
      name: String,
      tables: Seq[String],
      sql: String,
      doc: String
  ): Q = {
    val (text, run) = viewed(tables: _*)(sql)
    Q(name, run, Some(text), doc)
  }

  override def queries: Seq[Q] = Seq(
    // ------------------------------------------------------------ b1 IN+HAVING
    sharedSql(
      "b1_in_agg_subquery",
      Seq("orders", "lineitem"),
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND o_orderkey IN (SELECT l_orderkey FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 190)
        |GROUP BY o_custkey, o_orderkey
        |ORDER BY o_orderkey""".stripMargin,
      doc = "TPC-H Q18 shape: IN over an agg-HAVING subquery → semi join on l_orderkey " +
        "against a pre-aggregated (shuffled-once) subquery, never re-evaluated per row"
    ),
    // ------------------------------------------------------------ b2 corr scalar
    sharedSql(
      "b2_correlated_scalar_avg",
      Seq("customer"),
      """SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,
      doc = "correlated scalar subquery (per-nation average threshold): Catalyst " +
        "decorrelates to one groupBy(nationkey) agg + equi-join — not N sub-executions"
    ),
    // ------------------------------------------------------------ b3 EXISTS
    sharedSql(
      "b3_exists_returns",
      Seq("orders", "lineitem"),
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
      doc = "TPC-H Q4 shape: correlated EXISTS → left-semi hash join (the J1 'update' " +
        "branch probe, task.ts:267-284, done as one join instead of per-row HTTP)"
    ),
    // ------------------------------------------------------------ b4 NOT IN
    sharedSql(
      "b4_not_in_subquery",
      Seq("part", "lineitem"),
      """SELECT p_partkey, p_brand
        |FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 48)
        |ORDER BY p_partkey""".stripMargin,
      doc = "NOT IN over a null-free key → left-anti join (the J1 'insert' branch); " +
        "null-safety is static here (l_partkey is non-nullable by schema)"
    ),
    // ------------------------------------------------------------ b5 corr max
    sharedSql(
      "b5_correlated_max",
      Seq("supplier"),
      """SELECT s_suppkey, CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
        |FROM supplier s
        |WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
        |                   WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s_suppkey""".stripMargin,
      doc = "TPC-H Q2 shape: correlated MAX equality — per-group argmax via " +
        "decorrelated aggregate join"
    ),
    // ------------------------------------------------------------ b6 lateral
    sharedSql(
      "b6_lateral_agg",
      Seq("customer", "orders"),
      """SELECT c.c_custkey, t.max_price, t.n_orders
        |FROM customer c, LATERAL (
        |  SELECT MAX(o_totalprice) AS max_price, COUNT(*) AS n_orders
        |  FROM orders WHERE o_custkey = c.c_custkey) t
        |WHERE c.c_custkey <= 200
        |ORDER BY c.c_custkey""".stripMargin,
      doc = "lateral correlated aggregate: empty-group semantics preserved " +
        "(customers with no orders get NULL max / 0 count) through decorrelation"
    ),
    // ------------------------------------------------------------ b7 CTE + scalar max
    sharedSql(
      "b7_top_supplier",
      Seq("supplier", "lineitem"),
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,
      doc = "TPC-H Q15 shape: CTE reused twice + uncorrelated scalar MAX broadcast " +
        "as a single-row filter; revenue sums are exact decimals so the double " +
        "equality is deterministic cross-engine"
    ),
    // ------------------------------------------------------------ b8 nested IN
    sharedSql(
      "b8_nested_in",
      Seq("supplier", "lineitem", "part"),
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type LIKE 'PROMO%')
        |  GROUP BY l_suppkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 50)
        |ORDER BY s_suppkey""".stripMargin,
      doc = "TPC-H Q20 shape: two nesting levels of IN — inner semi join prunes " +
        "lineitem to promo parts before the per-supplier aggregate gate"
    ),
    // ------------------------------------------------------------ b9 EXISTS+NOT EXISTS
    sharedSql(
      "b9_multi_exists",
      Seq("supplier", "lineitem", "orders"),
      """SELECT s.s_suppkey, COUNT(*) AS numwait
        |FROM supplier s, lineitem l1, orders o
        |WHERE s.s_suppkey = l1.l_suppkey
        |  AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_suppkey
        |ORDER BY s.s_suppkey""".stripMargin,
      doc = "TPC-H Q21 shape: simultaneous correlated EXISTS and NOT EXISTS against " +
        "the fact table itself — the hardest decorrelation in the TPC-H suite " +
        "(semi + anti join on the same key, non-equi correlation residue)"
    ),
    // ------------------------------------------------------------ b10 scalar in SELECT
    sharedSql(
      "b10_scalar_in_select",
      Seq("nation", "customer", "supplier"),
      """SELECT n.n_nationkey, n.n_name,
        |  (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_cust,
        |  (SELECT COUNT(*) FROM supplier s WHERE s.s_nationkey = n.n_nationkey) AS n_supp
        |FROM nation n
        |ORDER BY n.n_nationkey""".stripMargin,
      doc = "correlated scalar subqueries in the SELECT list (two different tables): " +
        "each decorrelates to a grouped count + left join that preserves " +
        "zero-count nations — never a per-row re-execution"
    ),
    // ------------------------------------------------------------ b11 disjunctive EXISTS
    sharedSql(
      "b11_disjunctive_exists",
      Seq("customer", "orders"),
      """SELECT c.c_custkey
        |FROM customer c
        |WHERE c.c_acctbal > 9900.0
        |   OR EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 450000.0)
        |ORDER BY c.c_custkey""".stripMargin,
      doc = "EXISTS under OR (disjunctive predicate subquery): cannot rewrite to a " +
        "plain semi join on its own — Catalyst plans an existence join that " +
        "surfaces the match flag into the disjunction"
    ),
    // ------------------------------------------------------------ b12 non-equi NOT EXISTS
    sharedSql(
      "b12_argmax_not_exists",
      Seq("orders"),
      """SELECT o.o_custkey, o.o_orderkey, o.o_totalprice
        |FROM orders o
        |WHERE o.o_custkey < 200
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = o.o_custkey
        |      AND (o2.o_orderdate > o.o_orderdate
        |           OR (o2.o_orderdate = o.o_orderdate AND o2.o_orderkey > o.o_orderkey)))
        |ORDER BY o.o_custkey""".stripMargin,
      doc = "argmax-per-group via correlated NOT EXISTS with an INEQUALITY " +
        "correlation (\"no later order by the same customer\"): decorrelates to a " +
        "left-anti join with an equi key plus non-equi residual — the hardest " +
        "predicate-subquery shape, tie-broken to one row per group"
    )
  )
}
