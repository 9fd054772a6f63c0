package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator coverage: scan→filter→project (reference S1/S3,
  * `/root/reference/task.ts:398-418`), aggregation, joins incl. the
  * semi/anti forms underlying the upsert split (J1, `task.ts:235-350`),
  * per-group top-k (the QueryTopFeatures strategy S2, `task.ts:16-19,400`),
  * sort/limit, set ops, rollup, scalar function inventory (§2.7).
  *
  * Scale notes (100 TB): all plans are shuffle-planar — filters and column
  * pruning reach the parquet scan; aggregations are partial (map-side
  * combine) before the key shuffle; no driver-side collection anywhere.
  * Broadcast hints appear ONLY on fixed-cardinality dims (region=5,
  * nation=25). SF-scaled tables (customer, supplier, per-part aggregates)
  * carry no hint: statistics/AQE pick broadcast at small SF and switch to
  * shuffle joins when the side outgrows the threshold — forcing broadcast
  * there would OOM a 100 TB run.
  */
object RelationalPack extends QueryPack {

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  override def queries: Seq[Q] = Seq(
    // ---------------------------------------------------------------- q1
    Q(
      "q1_pricing_summary",
      (s, d) => {
        li(s, d)
          .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            davg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order")
          )
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "TPC-H Q1-style full-scan aggregate; partial agg before 6-group shuffle"
    ),
    // ---------------------------------------------------------------- q2
    Q(
      "q2_filter_project",
      (s, d) =>
        li(s, d)
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-04-01").cast("timestamp") &&
              col("l_quantity") < 10
          )
          .select(
            col("l_orderkey"),
            col("l_linenumber"),
            col("l_partkey"),
            col("l_quantity"),
            col("l_extendedprice")
          )
          .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_partkey, l_quantity, l_extendedprice
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
             |  AND l_quantity < 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      doc = "predicate+projection pushdown to parquet (reference S3 server-side where)"
    ),
    // ---------------------------------------------------------------- q3
    Q(
      "q3_shipping_priority",
      (s, d) => {
        val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = li(s, d).filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("revenue")
          )
          .select(
            col("l_orderkey"),
            col("revenue"),
            fts(col("o_orderdate")).as("o_orderdate"),
            col("o_orderpriority")
          )
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
             |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
             |  o_orderpriority
             |FROM customer, orders, lineitem
             |WHERE c_mktsegment = 'BUILDING'
             |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY l_orderkey, o_orderdate, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin),
      doc = "3-way join, agg, top-10; no hints — stats/AQE choose broadcast at small SF, " +
        "shuffle join once customer outgrows the threshold"
    ),
    // ---------------------------------------------------------------- q5
    Q(
      "q5_local_supplier_volume",
      (s, d) => {
        val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val n = Tables.nation(s, d)
        val sup = Tables.supplier(s, d)
        val c = cust(s, d)
        val o = ord(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")
        )
        li(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(
            sup,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey")
          )
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("revenue")
          )
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, supplier, nation, region
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin),
      doc = "TPC-H Q5: 6-way star join; all dims broadcast, one fact shuffle"
    ),
    // ---------------------------------------------------------------- q6
    Q(
      "q6_forecast_revenue",
      (s, d) =>
        li(s, d)
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24
          )
          .agg(
            sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
              .cast("double").as("revenue")
          ),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount >= 0.05 AND l_discount <= 0.07
             |  AND l_quantity < 24""".stripMargin),
      doc = "TPC-H Q6: selective scan, scalar aggregate, no shuffle beyond final reduce"
    ),
    // ---------------------------------------------------------------- q7 semi
    Q(
      "q7_semi_join",
      (s, d) => {
        val open = ord(s, d).filter(col("o_orderstatus") === "P")
        cust(s, d)
          .join(open.select(col("o_custkey")), col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment
             |FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin),
      doc = "EXISTS as left_semi — the 'update' branch of the upsert split (J1)"
    ),
    // ---------------------------------------------------------------- q8 anti
    Q(
      "q8_anti_join",
      (s, d) =>
        cust(s, d)
          .join(
            ord(s, d).filter(col("o_orderstatus") === "P").select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_name, c_acctbal
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
             |ORDER BY c_custkey""".stripMargin),
      doc = "NOT EXISTS as left_anti — the 'insert' branch of the upsert split (J1)"
    ),
    // ---------------------------------------------------------------- q9 topk/group
    Q(
      "q9_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        ord(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_custkey"), col("rn"))
      },
      Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
             |  FROM orders) t
             |WHERE rn <= 2
             |ORDER BY o_custkey, rn""".stripMargin),
      doc = "per-group top-k — reference S2 QueryTopFeatures (`task.ts:16-19,400`) done engine-side"
    ),
    // ---------------------------------------------------------------- q10 distinct
    Q(
      "q10_distinct",
      (s, d) =>
        li(s, d)
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      doc = "distinct = partial-agg shuffle on the pair key"
    ),
    // ---------------------------------------------------------------- q11 set ops
    Q(
      "q11_union_distinct",
      (s, d) => {
        val p = Tables.part(s, d)
        val big = p.filter(col("p_size") >= 48).select(col("p_partkey"))
        val costly = p.filter(col("p_retailprice") > 1900.0).select(col("p_partkey"))
        big.union(costly).distinct().orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey FROM part WHERE p_size >= 48
             |UNION
             |SELECT p_partkey FROM part WHERE p_retailprice > 1900.0
             |ORDER BY p_partkey""".stripMargin),
      doc = "UNION (distinct) of two filtered scans"
    ),
    // ---------------------------------------------------------------- q12 rollup
    Q(
      "q12_rollup",
      (s, d) =>
        li(s, d)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n"),
            grouping(col("l_returnflag")).as("g_rf"),
            grouping(col("l_linestatus")).as("g_ls")
          )
          .select(
            when(col("g_rf") === 1, lit("ALL")).otherwise(col("l_returnflag")).as("returnflag"),
            when(col("g_ls") === 1, lit("ALL")).otherwise(col("l_linestatus")).as("linestatus"),
            col("sum_qty"),
            col("n")
          )
          .orderBy(col("returnflag"), col("linestatus")),
      Some("""SELECT
             |  CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS returnflag,
             |  CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY returnflag, linestatus""".stripMargin),
      doc = "rollup grouping sets; grouping() disambiguates the ALL rows"
    ),
    // ---------------------------------------------------------------- q13 case agg
    Q(
      "q13_conditional_agg",
      (s, d) =>
        li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(
            sum(
              when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
            ).as("high_line_count"),
            sum(
              when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)
            ).as("low_line_count")
          )
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem, orders
             |WHERE l_orderkey = o_orderkey
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      doc = "TPC-H Q12-style conditional aggregation over a fact-fact join"
    ),
    // ---------------------------------------------------------------- q14 scalars
    Q(
      "q14_scalar_functions",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            concat(lit("layer-7-"), col("p_partkey").cast("string")).as("namespaced_id"),
            regexp_replace(col("p_brand"), "^Brand#", "").as("brand_num"),
            col("p_type").startsWith("PROMO").as("is_promo"),
            upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
            length(col("p_name")).as("name_len"),
            coalesce(nullif(col("p_brand"), lit("Brand#1")), lit("Unknown")).as("brand_or_default")
          )
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  'layer-7-' || CAST(p_partkey AS VARCHAR) AS namespaced_id,
             |  regexp_replace(p_brand, '^Brand#', '') AS brand_num,
             |  starts_with(p_type, 'PROMO') AS is_promo,
             |  upper(substring(p_name, 1, 8)) AS name_prefix,
             |  length(p_name) AS name_len,
             |  coalesce(nullif(p_brand, 'Brand#1'), 'Unknown') AS brand_or_default
             |FROM part
             |ORDER BY p_partkey""".stripMargin),
      doc = "scalar inventory §2.7: concat (T1 id namespacing), regexp_replace " +
        "('Multi' strip, task.ts:440), startsWith (task.ts:433), coalesce defaults (P2)"
    ),
    // ---------------------------------------------------------------- q15 having
    Q(
      "q15_having",
      (s, d) =>
        ord(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 20)
          .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |FROM orders
             |GROUP BY o_custkey
             |HAVING COUNT(*) >= 20
             |ORDER BY o_custkey""".stripMargin),
      doc = "group-agg + post-aggregate filter (HAVING)"
    ),
    // ---------------------------------------------------------------- q16 minmax
    Q(
      "q16_minmax_per_nation",
      (s, d) =>
        cust(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"),
            count(lit(1)).as("n_cust"),
            countDistinct(col("c_mktsegment")).as("n_segments")
          )
          .orderBy(col("n_name")),
      Some("""SELECT n_name, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
             |  COUNT(*) AS n_cust, COUNT(DISTINCT c_mktsegment) AS n_segments
             |FROM customer, nation
             |WHERE c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin),
      doc = "min/max/count-distinct over broadcast-joined dim"
    ),
    // ---------------------------------------------------------------- q17 corr subquery
    Q(
      "q17_small_qty_revenue",
      (s, d) => {
        val l = li(s, d)
        val avgQty = l.groupBy(col("l_partkey").as("ap_partkey"))
          .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"))
        l.join(avgQty, col("l_partkey") === col("ap_partkey"))
          .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
          .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
      },
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
             |FROM lineitem l
             |JOIN (SELECT l_partkey AS ap_partkey,
             |        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
             |      FROM lineitem GROUP BY l_partkey) a
             |  ON l.l_partkey = a.ap_partkey
             |WHERE l.l_quantity < 0.5 * a.avg_qty""".stripMargin),
      doc = "TPC-H Q17-style decorrelated scalar subquery; per-part avg broadcast back onto the fact"
    ),
    // ---------------------------------------------------------------- q18 running window
    Q(
      "q18_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord(s, d)
          .filter(col("o_custkey") < 100)
          .select(
            col("o_custkey"),
            col("o_orderkey"),
            sum(dec(col("o_totalprice"))).over(w).cast("double").as("running_spend")
          )
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
             |FROM orders
             |WHERE o_custkey < 100
             |ORDER BY o_custkey, o_orderkey""".stripMargin),
      doc = "running-total window; decimal accumulator keeps the prefix sums exact cross-engine"
    ),
    // ---------------------------------------------------------------- q20 (TPC-H Q7 shape)
    Q(
      "q20_nation_volume",
      (s, d) => {
        val n1 = Tables.nation(s, d).select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d).select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
        li(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
          .filter(
            (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
          )
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("revenue")
          )
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |    CAST(year(l_shipdate) AS BIGINT) AS l_year, l_extendedprice, l_discount
             |  FROM lineitem, supplier, orders, customer, nation n1, nation n2
             |  WHERE l_suppkey = s_suppkey AND l_orderkey = o_orderkey
             |    AND o_custkey = c_custkey AND s_nationkey = n1.n_nationkey
             |    AND c_nationkey = n2.n_nationkey
             |    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) t
             |GROUP BY supp_nation, cust_nation, l_year
             |ORDER BY supp_nation, cust_nation, l_year""".stripMargin),
      doc = "TPC-H Q7 shape: nation-pair volume by year; self-joined broadcast dim, " +
        "OR-of-ANDs pair filter"
    ),
    // ---------------------------------------------------------------- q21 (TPC-H Q14 shape)
    Q(
      "q21_promo_ratio",
      (s, d) =>
        li(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .filter(
            col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-07-01").cast("timestamp")
          )
          .agg(
            (lit(100.0) * sum(
              when(col("p_type").startsWith("PROMO"),
                dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
                .otherwise(lit(0).cast("decimal(18,4)"))
            ).cast("double") /
              sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
                .cast("double")).as("promo_revenue_pct")
          ),
      Some("""SELECT 100.0 * CAST(SUM(CASE WHEN starts_with(p_type, 'PROMO')
             |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |  AS promo_revenue_pct
             |FROM lineitem, part
             |WHERE l_partkey = p_partkey
             |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'""".stripMargin),
      doc = "TPC-H Q14 shape: conditional revenue ratio; both sums exact-decimal, one " +
        "double division"
    ),
    // ---------------------------------------------------------------- q22 (TPC-H Q19 shape)
    Q(
      "q22_complex_or_filter",
      (s, d) =>
        li(s, d)
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
                col("l_quantity").between(20, 30))
          )
          .agg(
            dsum(col("l_extendedprice")).as("revenue"),
            count(lit(1)).as("n")
          ),
      Some("""SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             |  COUNT(*) AS n
             |FROM lineitem, part
             |WHERE l_partkey = p_partkey
             |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
             |    OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
             |    OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin),
      doc = "TPC-H Q19 shape: disjunction of conjunctive range predicates across both " +
        "join sides (exercises CNF conversion / partial pushdown)"
    ),
    // ---------------------------------------------------------------- q23 (TPC-H Q22 shape)
    Q(
      "q23_dormant_customers",
      (s, d) => {
        val c = cust(s, d)
        val avgBal = c.filter(col("c_acctbal") > 0.0)
          .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
        c.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(
            ord(s, d).filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey")),
            col("c_custkey") === col("o_custkey"),
            "left_anti"
          )
          .groupBy(substring(col("c_name"), 1, 9).as("name_prefix"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
          .orderBy(col("name_prefix"))
      },
      Some("""WITH avg_bal AS (
             |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
             |  FROM customer WHERE c_acctbal > 0.0)
             |SELECT substring(c_name, 1, 9) AS name_prefix, COUNT(*) AS n_cust,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
             |FROM customer, avg_bal
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
             |GROUP BY 1
             |ORDER BY name_prefix""".stripMargin),
      doc = "TPC-H Q22 shape: scalar-subquery threshold (broadcast single row) + " +
        "anti join + substring grouping"
    ),
    // ---------------------------------------------------------------- q24 (TPC-H Q8 shape)
    Q(
      "q24_market_share",
      (s, d) => {
        val nS = Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val nC = Tables.nation(s, d)
          .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cr_key"))
        val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
        val o = ord(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp")
        )
        val rev = dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount")))
        li(s, d)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nC), col("c_nationkey") === col("cn_key"))
          .join(broadcast(r), col("cr_key") === col("r_regionkey"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nS), col("s_nationkey") === col("sn_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_5", rev).otherwise(lit(0).cast("decimal(18,4)")))
              .cast("double") /
              sum(rev).cast("double")).as("mkt_share")
          )
          .orderBy(col("o_year"))
      },
      Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
             |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             |    ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |  AS mkt_share
             |FROM lineitem, orders, customer, nation n1, region, supplier, nation n2
             |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
             |  AND r_name = 'ASIA'
             |  AND l_suppkey = s_suppkey AND s_nationkey = n2.n_nationkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
             |GROUP BY 1
             |ORDER BY o_year""".stripMargin),
      doc = "TPC-H Q8 shape: one nation's share of a region's yearly revenue — " +
        "double-role nation dim (customer-side region filter, supplier-side share), " +
        "conditional/total decimal sums, one double division"
    ),
    // ---------------------------------------------------------------- q25 (TPC-H Q13 shape)
    Q(
      "q25_cust_distribution",
      (s, d) =>
        cust(s, d)
          .join(
            ord(s, d).filter(col("o_orderpriority") =!= "1-URGENT"),
            col("c_custkey") === col("o_custkey"),
            "left_outer"
          )
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
             |  FROM customer LEFT OUTER JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey) c_orders
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin),
      doc = "TPC-H Q13 shape: customer order-count distribution — left-outer join " +
        "with an ON-clause filter (kept pre-join, not WHERE), null-skipping count, " +
        "double aggregation"
    ),
    // ---------------------------------------------------------------- q26 (TPC-H Q10 shape)
    Q(
      "q26_returned_items",
      (s, d) =>
        li(s, d)
          .filter(col("l_returnflag") === "R")
          .join(
            ord(s, d).filter(
              col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
                col("o_orderdate") < lit("1997-10-01").cast("timestamp")
            ),
            col("l_orderkey") === col("o_orderkey")
          )
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("revenue")
          )
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
             |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
             |  AND l_returnflag = 'R'
             |  AND c_nationkey = n_nationkey
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey
             |LIMIT 20""".stripMargin),
      doc = "TPC-H Q10 shape: returned-item revenue per customer, top 20 — selective " +
        "fact filter first, broadcast nation, TakeOrdered top-k"
    ),
    // ---------------------------------------------------------------- q27 (TPC-H Q9 shape)
    Q(
      "q27_profit_by_nation_year",
      (s, d) =>
        li(s, d)
          .join(
            Tables.part(s, d).filter(col("p_name").contains("widget")),
            col("l_partkey") === col("p_partkey")
          )
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("profit")
          )
          .orderBy(col("nation"), col("l_year").desc),
      Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS profit
             |FROM lineitem, part, supplier, nation
             |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
             |  AND s_nationkey = n_nationkey AND p_name LIKE '%widget%'
             |GROUP BY 1, 2
             |ORDER BY nation, l_year DESC""".stripMargin),
      doc = "TPC-H Q9 shape: product-line profit per (nation, year) — selective part " +
        "filter pushed below the fact joins, nation broadcast, two-key grouped agg"
    ),
    // ---------------------------------------------------------------- q28 (TPC-H Q11 shape)
    Q(
      "q28_important_nations",
      (s, d) => {
        val sup = Tables.supplier(s, d)
        // global threshold = one single-row aggregate, broadcast into the
        // HAVING comparison (never re-evaluated per group)
        val total = sup.agg(sum(dec(col("s_acctbal"))).cast("double").as("t"))
        sup
          .groupBy(col("s_nationkey").cast("long").as("s_nationkey"))
          .agg(sum(dec(col("s_acctbal"))).cast("double").as("value"))
          .crossJoin(broadcast(total))
          .filter(col("value") > col("t") * 0.05)
          .select(col("s_nationkey"), col("value"))
          .orderBy(col("value").desc, col("s_nationkey"))
      },
      Some("""SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey,
             |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS value
             |FROM supplier
             |GROUP BY s_nationkey
             |HAVING CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) >
             |  (SELECT CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) FROM supplier) * 0.05
             |ORDER BY value DESC, s_nationkey""".stripMargin),
      doc = "TPC-H Q11 shape: group value vs a global-fraction scalar subquery — " +
        "single-row broadcast threshold, exact decimal sums on both sides"
    ),
    // ---------------------------------------------------------------- q29 (TPC-H Q16 shape)
    Q(
      "q29_supplier_cnt",
      (s, d) => {
        val bad = Tables.supplier(s, d)
          .filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        li(s, d)
          .join(
            Tables.part(s, d).filter(col("p_brand") =!= "Brand#1"),
            col("l_partkey") === col("p_partkey")
          )
          .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .groupBy(col("p_brand"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"))
      },
      Some("""SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem, part
             |WHERE l_partkey = p_partkey AND p_brand <> 'Brand#1'
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY p_brand
             |ORDER BY supplier_cnt DESC, p_brand""".stripMargin),
      doc = "TPC-H Q16 shape: distinct-supplier counts with a NOT IN exclusion list — " +
        "broadcast anti join + two-level distinct aggregation"
    ),
    // ---------------------------------------------------------------- q30 strings
    Q(
      "q30_string_suite",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            expr("translate(p_name, 'aeiou', 'AEIOU')").as("translated"),
            lpad(col("p_brand"), 10, "0").as("padded_brand"),
            rpad(col("p_type"), 12, ".").as("padded_type"),
            reverse(col("p_name")).as("reversed"),
            expr("repeat(p_brand, 2)").as("doubled"),
            instr(col("p_name"), "a").cast("long").as("a_pos"),
            expr("split_part(p_name, ' ', 1)").as("first_word"),
            concat(upper(expr("left(p_name, 1)")), expr("substr(p_name, 2)")).as("initcapped")
          )
          .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |  translate(p_name, 'aeiou', 'AEIOU') AS translated,
             |  lpad(p_brand, 10, '0') AS padded_brand,
             |  rpad(p_type, 12, '.') AS padded_type,
             |  reverse(p_name) AS reversed,
             |  repeat(p_brand, 2) AS doubled,
             |  CAST(strpos(p_name, 'a') AS BIGINT) AS a_pos,
             |  split_part(p_name, ' ', 1) AS first_word,
             |  upper(left(p_name, 1)) || substr(p_name, 2) AS initcapped
             |FROM part
             |ORDER BY p_partkey""".stripMargin),
      doc = "string-function inventory beyond q14: translate/pad/reverse/repeat/" +
        "strpos/split_part + composed initcap — per-row, codegen'd, no shuffle"
    ),
    // ---------------------------------------------------------------- q31 full outer
    Q(
      "q31_full_outer",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_clicks"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(count(lit(1)).as("n_purchases"))
        clicks.join(purchases, Seq("user_id"), "full_outer")
          .select(
            col("user_id"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            coalesce(col("n_purchases"), lit(0L)).as("n_purchases")
          )
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (
             |  SELECT user_id, COUNT(*) AS n_clicks FROM events
             |  WHERE event_type = 'click' GROUP BY user_id),
             |p AS (
             |  SELECT user_id, COUNT(*) AS n_purchases FROM events
             |  WHERE event_type = 'purchase' GROUP BY user_id)
             |SELECT user_id, COALESCE(n_clicks, 0) AS n_clicks,
             |  COALESCE(n_purchases, 0) AS n_purchases
             |FROM c FULL JOIN p USING (user_id)
             |ORDER BY user_id""".stripMargin),
      doc = "FULL OUTER join of two per-user aggregates with coalesced key and " +
        "zero-filled measures — users present on either side survive"
    ),
    // ---------------------------------------------------------------- q32 division
    Q(
      "q32_relational_division",
      (s, d) => {
        // relational division: users who triggered EVERY event type — per-user
        // distinct count equals the global distinct count (one single-row
        // broadcast), never a nested NOT EXISTS double negation
        val ev = Tables.events(s, d)
        val total = ev.agg(countDistinct(col("event_type")).as("n_types"))
        ev.groupBy(col("user_id"))
          .agg(countDistinct(col("event_type")).as("u_types"), count(lit(1)).as("n_events"))
          .crossJoin(broadcast(total))
          .filter(col("u_types") === col("n_types"))
          .select(col("user_id"), col("n_events"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, COUNT(*) AS n_events
             |FROM events
             |GROUP BY user_id
             |HAVING COUNT(DISTINCT event_type) =
             |  (SELECT COUNT(DISTINCT event_type) FROM events)
             |ORDER BY user_id""".stripMargin),
      doc = "relational division (FORALL): users covering every event type via " +
        "distinct-count equality against a broadcast global — no NOT EXISTS " +
        "double negation, two shuffles total"
    ),
    // ---------------------------------------------------------------- q33 datetime
    Q(
      "q33_datetime_suite",
      (s, d) =>
        // the temporal scalar inventory (the reference's data plane is
        // ISO-8601 timestamps throughout — §2.7): extraction, truncation,
        // day arithmetic, day differences, epoch conversion. Picks are the
        // cross-engine-stable subset (week-of-year and months_between
        // semantics diverge between engines and stay out). Per-row,
        // codegen'd, no shuffle.
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("dom"),
            dayofyear(col("o_orderdate")).cast("long").as("doy"),
            hour(col("o_orderdate")).cast("long").as("hr"),
            fts(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus_30d"),
            fts(date_trunc("month", col("o_orderdate"))).as("month_start"),
            datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
              .cast("long").as("days_to_98"),
            unix_timestamp(col("o_orderdate")).as("epoch_s")
          )
          .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS BIGINT) AS y,
             |  CAST(month(o_orderdate) AS BIGINT) AS m,
             |  CAST(day(o_orderdate) AS BIGINT) AS dom,
             |  CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
             |  CAST(hour(o_orderdate) AS BIGINT) AS hr,
             |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS plus_30d,
             |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
             |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98,
             |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin),
      doc = "datetime scalar inventory: extract/trunc/interval-add/datediff/epoch " +
        "over the cross-engine-stable subset — per-row, codegen'd, no shuffle"
    ),
    // ---------------------------------------------------------------- q34 nulls
    Q(
      "q34_null_semantics",
      (s, d) =>
        // NULL-semantics differential: the corpus has no nulls, so NULLIF
        // synthesizes them (every 'N' returnflag quantity), then the suite
        // exercises the aggregate/predicate rules engines most often
        // disagree on: COUNT(col) skips nulls while COUNT(*) doesn't, SUM
        // over an all-null slice is NULL (not 0), AVG ignores nulls in the
        // denominator, null-safe equality (<=>) vs = on null operands, and
        // COALESCE fallback chains.
        Tables.lineitem(s, d)
          .select(
            col("l_returnflag"),
            expr("NULLIF(l_returnflag, 'N')").as("flag_or_null"),
            when(col("l_returnflag") === "N", lit(null).cast(MoneyDec))
              .otherwise(dec(col("l_quantity"))).as("q_or_null"))
          .groupBy(col("l_returnflag"))
          .agg(
            count(lit(1)).as("n_rows"),
            count(col("q_or_null")).as("n_nonnull"),
            sum(col("q_or_null")).cast("double").as("sum_nullable"),
            (sum(col("q_or_null")).cast("double") / count(col("q_or_null"))).as("avg_nullable"),
            sum(when(col("flag_or_null") <=> lit(null), 1L).otherwise(0L)).as("n_nullsafe_eq"),
            sum(when(col("flag_or_null") === lit(null), 1L).otherwise(0L)).as("n_plain_eq"),
            max(coalesce(col("flag_or_null"), lit("fallback"))).as("coalesced"))
          .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
             |  COUNT(*) AS n_rows,
             |  COUNT(q_or_null) AS n_nonnull,
             |  CAST(SUM(q_or_null) AS DOUBLE) AS sum_nullable,
             |  CAST(SUM(q_or_null) AS DOUBLE) / COUNT(q_or_null) AS avg_nullable,
             |  CAST(SUM(CASE WHEN flag_or_null IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
             |  CAST(SUM(CASE WHEN flag_or_null = NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq,
             |  MAX(COALESCE(flag_or_null, 'fallback')) AS coalesced
             |FROM (
             |  SELECT l_returnflag,
             |    NULLIF(l_returnflag, 'N') AS flag_or_null,
             |    CASE WHEN l_returnflag = 'N' THEN NULL
             |         ELSE CAST(l_quantity AS DECIMAL(18,2)) END AS q_or_null
             |  FROM lineitem)
             |GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin),
      doc = "NULL-semantics differential: COUNT(col) vs COUNT(*), all-null SUM is " +
        "NULL, AVG denominators, null-safe <=> vs plain =, COALESCE chains — the " +
        "rules engines most often disagree on, hash-matched cell-exact"
    )
  )
}
