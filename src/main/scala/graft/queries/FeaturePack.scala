package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{FeatureOps, Merge}
import graft.functions.WebMercator

/** Reference-parity feature operators (SURVEY.md §2.2-2.4) exercised through
  * the `graft.ops` library against the driver corpus: id namespacing (T1),
  * Multi-geometry explode (T3), Web-Mercator reprojection (T5),
  * geometry-type routing (P3), coalesce-default asymmetry (P2), and the
  * upsert/MERGE (J1). Geometry inputs are synthesized deterministically from
  * integer keys so DuckDB can reproduce them exactly.
  */
object FeaturePack extends QueryPack {

  override def queries: Seq[Q] = Seq(
    // ---------------------------------------------------------------- T1
    Q(
      "f1_id_namespace",
      (s, d) => {
        val feats = Tables.events(s, d)
          .select(col("event_id"), col("event_id").cast("string").as("id"), col("event_type"))
        FeatureOps.idNamespace("7")(feats)
          .select(col("event_id"), col("id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, 'layer-7-' || CAST(event_id AS VARCHAR) AS id, event_type
             |FROM events
             |ORDER BY event_id""".stripMargin),
      doc = "T1 id rewrite (task.ts:427) via FeatureOps.idNamespace"
    ),
    // ---------------------------------------------------------------- T3
    Q(
      "f2_multi_explode",
      (s, d) => {
        def xy(k: org.apache.spark.sql.Column) = array(
          (k % 360 - 180).cast("double"),
          (k % 170 - 85).cast("double")
        )
        val feats = Tables.orders(s, d).select(
          col("o_orderkey").cast("string").as("id"),
          map(lit("src"), lit("orders")).as("properties"),
          struct(
            lit("MultiPoint").as("gtype"),
            lit(null).cast("array<double>").as("point"),
            array(xy(col("o_orderkey")), xy(col("o_orderkey") + 1), xy(col("o_orderkey") + 2))
              .as("lines"),
            lit(null).cast("array<array<array<double>>>").as("rings"),
            lit(null).cast("array<array<array<array<double>>>>").as("polys")
          ).as("geometry")
        )
        FeatureOps.explodeMulti(feats)
          .select(
            col("id"),
            col("geometry.gtype").as("gtype"),
            col("geometry.point").getItem(0).as("x"),
            col("geometry.point").getItem(1).as("y")
          )
          .orderBy(col("id"))
      },
      Some("""SELECT CAST(o_orderkey AS VARCHAR) || '-' || CAST(u.pos AS VARCHAR) AS id,
             |  'Point' AS gtype, u.pt[1] AS x, u.pt[2] AS y
             |FROM (
             |  SELECT o_orderkey,
             |    unnest(list_transform(
             |      [[CAST(o_orderkey % 360 - 180 AS DOUBLE), CAST(o_orderkey % 170 - 85 AS DOUBLE)],
             |       [CAST((o_orderkey+1) % 360 - 180 AS DOUBLE), CAST((o_orderkey+1) % 170 - 85 AS DOUBLE)],
             |       [CAST((o_orderkey+2) % 360 - 180 AS DOUBLE), CAST((o_orderkey+2) % 170 - 85 AS DOUBLE)]],
             |      (p, i) -> {'pos': i - 1, 'pt': p})) AS u
             |  FROM orders)
             |ORDER BY id""".stripMargin),
      doc = "T3 UnMulti explode (task.ts:433-447): child id '<id>-<idx>', Multi prefix " +
        "stripped, properties duplicated; posexplode generator, no shuffle"
    ),
    // ---------------------------------------------------------------- T5
    Q(
      "f3_webmercator",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            (col("c_custkey") % 360 - 180).cast("double").as("lon"),
            (col("c_custkey") % 170 - 85).cast("double").as("lat")
          )
          .select(
            col("c_custkey"),
            quant(WebMercator.mercatorX(col("lon")), 100).as("merc_x"),
            quant(WebMercator.mercatorY(col("lat")), 100).as("merc_y")
          )
          .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey,
             |  floor(6378137.0 * (lon * 0.017453292519943295) * 100) / 100 AS merc_x,
             |  floor(6378137.0 * ln(tan(0.7853981633974483 + (lat * 0.017453292519943295) / 2.0)) * 100) / 100 AS merc_y
             |FROM (SELECT c_custkey,
             |        CAST(c_custkey % 360 - 180 AS DOUBLE) AS lon,
             |        CAST(c_custkey % 170 - 85 AS DOUBLE) AS lat
             |      FROM customer)
             |ORDER BY c_custkey""".stripMargin),
      doc = "T5 EPSG:4326->3857 via the codegen'd MercatorX/Y Catalyst expressions " +
        "(task.ts:192-219 proj4 equivalent); cm-quantized for cross-libm parity"
    ),
    // ---------------------------------------------------------------- T5 inverse
    Q(
      "f7_reproject_roundtrip",
      (s, d) => {
        import graft.functions.WebMercator.{DegToRad, QuarterPi, R}
        // forward → inverse → compare against the source coordinates.
        // Row-level inverse values can't be floor-quantized (integral
        // inputs sit exactly ON every decimal grid), so the oracle contract
        // is the certification aggregate: |roundtrip − source| < 1e-6 deg is
        // boundary-safe because the true error is ~1e-10.
        val src = Tables.customer(s, d)
          .select(
            col("c_custkey"),
            (col("c_custkey") % 360 - 180).cast("double").as("lon"),
            (col("c_custkey") % 170 - 85).cast("double").as("lat")
          )
        val rt = src
          .withColumn("mx", graft.functions.WebMercator.mercatorX(col("lon")))
          .withColumn("my", graft.functions.WebMercator.mercatorY(col("lat")))
          .withColumn("inv_lon", col("mx") / R / DegToRad)
          .withColumn(
            "inv_lat",
            (lit(2.0) * atan(exp(col("my") / R)) - lit(2.0) * QuarterPi) / DegToRad
          )
        rt.agg(
          count(lit(1)).as("n"),
          sum(
            when(
              abs(col("inv_lon") - col("lon")) < 1e-6 &&
                abs(col("inv_lat") - col("lat")) < 1e-6,
              1L
            ).otherwise(0L)
          ).as("n_roundtrip_ok")
        )
      },
      Some("""SELECT COUNT(*) AS n,
             |  CAST(SUM(CASE WHEN ABS(mx / 6378137.0 / 0.017453292519943295 - lon) < 0.000001
             |             AND ABS((2.0 * atan(exp(my / 6378137.0)) - 2.0 * 0.7853981633974483) / 0.017453292519943295 - lat) < 0.000001
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip_ok
             |FROM (
             |  SELECT lon, lat,
             |    6378137.0 * (lon * 0.017453292519943295) AS mx,
             |    6378137.0 * ln(tan(0.7853981633974483 + (lat * 0.017453292519943295) / 2.0)) AS my
             |  FROM (SELECT CAST(c_custkey % 360 - 180 AS DOUBLE) AS lon,
             |               CAST(c_custkey % 170 - 85 AS DOUBLE) AS lat
             |        FROM customer))""".stripMargin),
      doc = "T5 inverse reprojection (3857->4326) certified by round-trip: every " +
        "coordinate returns to its source within 1e-6 deg on BOTH engines"
    ),
    // ---------------------------------------------------------------- P3
    Q(
      "f4_route_by_geom_type",
      (s, d) => {
        val typed = Tables.events(s, d).select(
          col("event_id").cast("string").as("id"),
          expr("map()").cast("map<string,string>").as("properties"),
          struct(
            when(col("event_type") === "click", "Point")
              .when(col("event_type") === "view", "LineString")
              .when(col("event_type") === "purchase", "Polygon")
              .when(col("event_type") === "error", "MultiPoint")
              .otherwise("MultiLineString").as("gtype"),
            lit(null).cast("array<double>").as("point"),
            lit(null).cast("array<array<double>>").as("lines"),
            lit(null).cast("array<array<array<double>>>").as("rings"),
            lit(null).cast("array<array<array<array<double>>>>").as("polys")
          ).as("geometry")
        )
        val routed = FeatureOps.routeByGeomType(typed, Seq("Point", "LineString", "Polygon"))
        routed
          .map { case (t, df) => df.agg(count(lit(1)).as("n")).select(lit(t).as("gtype"), col("n")) }
          .reduce(_ unionByName _)
          .orderBy(col("gtype"))
      },
      Some("""SELECT gtype, COUNT(*) AS n FROM (
             |  SELECT CASE event_type
             |    WHEN 'click' THEN 'Point'
             |    WHEN 'view' THEN 'LineString'
             |    WHEN 'purchase' THEN 'Polygon'
             |    WHEN 'error' THEN 'MultiPoint'
             |    ELSE 'MultiLineString' END AS gtype
             |  FROM events) t
             |WHERE gtype IN ('Point', 'LineString', 'Polygon')
             |GROUP BY gtype
             |ORDER BY gtype""".stripMargin),
      doc = "P3 geometry-type routing (task.ts:177-187): configured sinks get their " +
        "split, unconfigured types skipped"
    ),
    // ---------------------------------------------------------------- P2
    Q(
      "f6_coalesce_asymmetry",
      (s, d) => {
        val cot = Tables.events(s, d).select(
          col("event_id"),
          when(col("user_id") % 7 =!= 0, concat(lit("u"), col("user_id"))).as("callsign"),
          when(col("user_id") % 3 =!= 0, col("props")).as("remarks")
        )
        val ins = FeatureOps.insertDefaults(cot).select(
          col("event_id"),
          col("callsign").as("ins_callsign"),
          col("remarks").as("ins_remarks")
        )
        val upd = FeatureOps.updateDefaults(cot).select(
          col("event_id"),
          col("callsign").as("upd_callsign"),
          col("remarks").as("upd_remarks")
        )
        ins.join(upd, Seq("event_id")).orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  coalesce(callsign, 'Unknown') AS ins_callsign,
             |  coalesce(remarks, '') AS ins_remarks,
             |  callsign AS upd_callsign,
             |  coalesce(remarks, '') AS upd_remarks
             |FROM (
             |  SELECT event_id,
             |    CASE WHEN user_id % 7 <> 0 THEN 'u' || CAST(user_id AS VARCHAR) END AS callsign,
             |    CASE WHEN user_id % 3 <> 0 THEN props END AS remarks
             |  FROM events)
             |ORDER BY event_id""".stripMargin),
      doc = "P2 default asymmetry (task.ts:244-245 vs :327-328): insert defaults " +
        "callsign+remarks, update defaults only remarks — replicated exactly"
    ),
    // ---------------------------------------------------------------- J1
    Q(
      "f5_upsert_merge",
      (s, d) => {
        val target = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val source = Tables.orders(s, d)
          .groupBy(
            when(col("o_custkey") % 10 === 0, col("o_custkey") + 100000)
              .otherwise(col("o_custkey")).as("c_custkey")
          )
          .agg(dsum(col("o_totalprice")).as("c_acctbal"))
        Merge.upsert(target, source, "c_custkey")
          .select(
            col("c_custkey"),
            coalesce(col("c_name"), lit("Unknown")).as("name"),
            col("c_acctbal").as("acctbal"),
            col("merge_action")
          )
          .orderBy(col("c_custkey"))
      },
      Some("""WITH src AS (
             |  SELECT CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 100000 ELSE o_custkey END AS k,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bal
             |  FROM orders GROUP BY 1)
             |SELECT c_custkey, name, acctbal, merge_action FROM (
             |  SELECT c.c_custkey, c.c_name AS name, s.bal AS acctbal, 'updated' AS merge_action
             |  FROM customer c JOIN src s ON c.c_custkey = s.k
             |  UNION ALL
             |  SELECT c_custkey, c_name, c_acctbal, 'kept'
             |  FROM customer WHERE NOT EXISTS (SELECT 1 FROM src WHERE k = c_custkey)
             |  UNION ALL
             |  SELECT s.k, 'Unknown', s.bal, 'inserted'
             |  FROM src s WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = s.k)) m
             |ORDER BY c_custkey""".stripMargin),
      doc = "J1 upsert/MERGE (task.ts:235-350) via Merge.upsert: one join split into " +
        "updated/kept/inserted, P2 'Unknown' default on inserts"
    ),
    // ---------------------------------------------------------------- f8 extent
    Q(
      "f8_layer_extent",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_nationkey").cast("long").as("layer"),
            (col("c_custkey") % 360 - 180).cast("double").as("lon"),
            (col("c_custkey") % 170 - 85).cast("double").as("lat")
          )
          .select(
            col("layer"),
            quant(graft.functions.WebMercator.mercatorX(col("lon")), 100).as("mx"),
            quant(graft.functions.WebMercator.mercatorY(col("lat")), 100).as("my")
          )
          .groupBy(col("layer"))
          .agg(
            count(lit(1)).as("n_features"),
            min(col("mx")).as("xmin"), min(col("my")).as("ymin"),
            max(col("mx")).as("xmax"), max(col("my")).as("ymax")
          )
          .orderBy(col("layer")),
      Some("""SELECT CAST(c_nationkey AS BIGINT) AS layer, COUNT(*) AS n_features,
             |  MIN(mx) AS xmin, MIN(my) AS ymin, MAX(mx) AS xmax, MAX(my) AS ymax
             |FROM (SELECT c_nationkey,
             |        floor(6378137.0 * ((CAST(c_custkey % 360 - 180 AS DOUBLE)) * 0.017453292519943295) * 100) / 100 AS mx,
             |        floor(6378137.0 * ln(tan(0.7853981633974483 + ((CAST(c_custkey % 170 - 85 AS DOUBLE)) * 0.017453292519943295) / 2.0)) * 100) / 100 AS my
             |      FROM customer) t
             |GROUP BY c_nationkey
             |ORDER BY layer""".stripMargin),
      doc = "layer extent metadata (the ArcGIS layer 'extent' envelope the reference's " +
        "schema introspection reads): per-layer bounding box as a min/max aggregate " +
        "over reprojected coordinates — partial-aggregated, one shuffle of 4 doubles " +
        "per layer"
    ),
    // ---------------------------------------------------------------- f9 scd2
    Q(
      "f9_scd2",
      (s, d) => {
        // SCD Type-2 dimension-history build from a change log: each
        // customer's order stream is an attribute feed (o_orderpriority);
        // consecutive orders with the SAME priority collapse into one
        // validity interval, a priority change opens a new version. The
        // companion to f5's Type-1 upsert — history preserved, not
        // overwritten. One window pass (lag → change flag → running version
        // count), one aggregate, one lead for the interval close.
        scd2Versions(s, d)
          .select(
            col("o_custkey"),
            col("version"),
            col("priority"),
            fts(col("vf")).as("valid_from"),
            coalesce(fts(col("valid_to_ts")), lit("9999-12-31 00:00:00")).as("valid_to"),
            col("n_orders")
          )
          .orderBy(col("o_custkey"), col("version"))
      },
      Some("""SELECT o_custkey, CAST(version AS BIGINT) AS version, priority,
             |  strftime(vf, '%Y-%m-%d %H:%M:%S') AS valid_from,
             |  COALESCE(strftime(LEAD(vf, 1) OVER (PARTITION BY o_custkey ORDER BY version),
             |                    '%Y-%m-%d %H:%M:%S'), '9999-12-31 00:00:00') AS valid_to,
             |  n_orders
             |FROM (
             |  SELECT o_custkey, version,
             |    MIN(o_orderpriority) AS priority, MIN(o_orderdate) AS vf,
             |    COUNT(*) AS n_orders
             |  FROM (
             |    SELECT o_custkey, o_orderdate, o_orderpriority,
             |      SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
             |    FROM (
             |      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             |        CASE WHEN LAG(o_orderpriority, 1) OVER (PARTITION BY o_custkey
             |               ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM o_orderpriority
             |             THEN 1 ELSE 0 END AS chg
             |      FROM orders WHERE o_custkey < 100) c) v
             |  GROUP BY o_custkey, version) g
             |ORDER BY o_custkey, version""".stripMargin),
      doc = "SCD Type-2 dimension history: change-log stream collapsed into " +
        "[valid_from, valid_to) attribute versions per entity — the " +
        "history-preserving companion to f5's Type-1 upsert"
    ),
    // ---------------------------------------------------------------- f10
    Q(
      "f10_pointintime_join",
      (s, d) => {
        // Point-in-time (temporal) join against the f9 SCD2 dimension: each
        // shipment is attributed to the priority REGIME in force at its
        // l_shipdate — the warehouse lookup every time-travel-correct
        // feature pipeline needs (training-data leakage prevention: join
        // facts to dimension-as-of-event-time, never dimension-as-of-now).
        // Scale shape: equi-shuffle both sides on the entity key, the
        // [valid_from, valid_to) range predicate stays a residual on the
        // equi-join — versions per entity are bounded, so per-key fan-out
        // is, too (same pattern as e10's interval self-join).
        // the dim key is RENAMED before the join: facts and dim share the
        // orders lineage, and a facts("o_custkey") === dim("o_custkey")
        // condition relies on Spark's ambiguous-self-join fallback (it
        // logs "trivially true equals predicate" and rewrites) — an
        // explicit distinct name keeps the equi-join unambiguous
        val dim = scd2Versions(s, d)
          .select(col("o_custkey").as("d_custkey"), col("priority"), col("vf"), col("valid_to_ts"))
        val facts = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount"))
          .join(
            Tables.orders(s, d)
              .filter(col("o_custkey") < 100)
              .select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
            Seq("l_orderkey"))
        facts
          .join(dim,
            col("o_custkey") === col("d_custkey") &&
              col("l_shipdate") >= col("vf") &&
              (col("valid_to_ts").isNull || col("l_shipdate") < col("valid_to_ts")))
          .groupBy(col("priority"))
          .agg(
            count(lit(1)).as("n_items"),
            sum(dec(col("l_extendedprice")) * (lit(1).cast(MoneyDec) - dec(col("l_discount"))))
              .cast("double").as("revenue"))
          .orderBy(col("priority"))
      },
      Some(s"""WITH $Scd2VersionsSql,
             |f AS (
             |  SELECT o_custkey, l_shipdate, l_extendedprice, l_discount
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_custkey < 100)
             |SELECT priority, COUNT(*) AS n_items,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |       (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             |    AS revenue
             |FROM f JOIN g ON f.o_custkey = g.o_custkey
             |  AND f.l_shipdate >= g.vf
             |  AND (g.vt IS NULL OR f.l_shipdate < g.vt)
             |GROUP BY priority
             |ORDER BY priority""".stripMargin),
      doc = "point-in-time join: facts attributed to the SCD2 attribute version " +
        "valid at their event time (equi-shuffle on the entity key, interval " +
        "residual) — the leakage-free dimension lookup for training pipelines"
    )
  )

  /** f9/f10's shared SCD2 version build: per (o_custkey < 100) the
    * priority-change log collapsed to [vf, valid_to_ts) intervals
    * (valid_to_ts null = current version). One lag window, one running-sum
    * window (both partitioned per entity), one aggregate, one lead.
    */
  private def scd2Versions(
      s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byVersion = Window.partitionBy(col("o_custkey")).orderBy(col("version"))
    Tables.orders(s, d)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("prev_prio", lag(col("o_orderpriority"), 1).over(byCust))
      .withColumn(
        "chg",
        when(col("prev_prio").isNull || col("prev_prio") =!= col("o_orderpriority"), 1L)
          .otherwise(0L)
      )
      .withColumn(
        "version",
        sum(col("chg")).over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      )
      .groupBy(col("o_custkey"), col("version"))
      .agg(
        // min, not first: first() is merge-order-dependent (nondeterministic
        // across retries/shuffle order even when constant within the group);
        // the oracle uses MIN, and the priority is constant per version group.
        min(col("o_orderpriority")).as("priority"),
        min(col("o_orderdate")).as("vf"),
        count(lit(1)).as("n_orders")
      )
      .withColumn("valid_to_ts", lead(col("vf"), 1).over(byVersion))
  }

  /** The same version build as DuckDB CTE text (binds `g`). */
  private val Scd2VersionsSql: String =
    """g AS (
      |  SELECT o_custkey, version,
      |    MIN(o_orderpriority) AS priority, MIN(o_orderdate) AS vf,
      |    LEAD(MIN(o_orderdate), 1) OVER (PARTITION BY o_custkey ORDER BY version) AS vt
      |  FROM (
      |    SELECT o_custkey, o_orderdate, o_orderpriority, o_orderkey,
      |      SUM(chg) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |    FROM (
      |      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |        CASE WHEN LAG(o_orderpriority, 1) OVER (PARTITION BY o_custkey
      |               ORDER BY o_orderdate, o_orderkey) IS DISTINCT FROM o_orderpriority
      |             THEN 1 ELSE 0 END AS chg
      |      FROM orders WHERE o_custkey < 100) c) v
      |  GROUP BY o_custkey, version)""".stripMargin
}
