package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import Tables._

/** TPC-DS-shaped corpus, round 3 final batch (q276-q300) — the last 25 of
  * the reference's 99-query DS suite (ibis/backends/tests/tpc/ds/
  * test_queries.py; SQL in tpc/queries/duckdb/ds/), adapted to the trimmed
  * star schema like TpcdsQueries/TpcdsQueries2/TpcdsQueries3. With this
  * batch every one of the 99 DS shapes has a corpus twin.
  *
  * Shapes covered here: ds6's distinct-scalar month gate + correlated
  * per-category average price cap, ds7/ds26's demographic/promo mean
  * profiles, ds8's substring-IN-list INTERSECT popular-prefix set, the
  * ds12/ds20 revenue-share-within-class window family, ds18's
  * ROLLUP-of-decimal-cast means, ds19's buyer-vs-supplier nation mismatch,
  * ds21's before/after pivot-date inventory ratio band, ds22's 3-level
  * quantity-on-hand rollup, ds29's three-slice three-date quantity matrix,
  * ds55's brand monthly flat agg, ds56's color-item IN-subquery repeated
  * across three channel CTEs, ds63's monthly-vs-partition-average deviation
  * gate, ds68's per-ticket city-pair mismatch, ds69's
  * EXISTS + double-NOT-EXISTS demographic counts, ds72's
  * inventory-shortfall week-aligned multi-join with two LEFT OUTERs,
  * ds80's per-channel sales/returns LEFT OUTER rollup, ds81's reused-CTE
  * per-state above-average returns, ds82's inventory band item listing,
  * ds83's nested week-of-date IN chain across three return channels,
  * ds86's rollup rank-within-parent, ds92's per-item 1.3x-average excess
  * discount, ds96's hour/minute time-dim count, and ds99's ship-delay
  * day-band pivot.
  *
  * Channel mapping follows TpcdsQueries2: one fact table, so channels are
  * disjoint slices (l_linestatus F/O; l_returnflag R — or A/N/R where
  * three disjoint return channels are needed). Money math follows the
  * decimal(38,4) policy (Tables.dsum/dmean, decimal-cast window sums) so
  * every aggregate is order-independent and hash-stable vs DuckDB.
  */
object TpcdsQueries4 {

  private val rev = () => col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val REV_SQL = "l_extendedprice * (1 - l_discount)"
  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(38,4))) AS DOUBLE)"
  private def dmeanSql(x: String) = s"ROUND(${dsumSql(x)} / COUNT($x), 6)"

  val defs: Seq[QueryDef] = Seq(

    // DS Q6 shape: customer-state counts for items priced above 1.2x their
    // category average, with the reporting month pinned by a
    // SELECT-DISTINCT scalar subquery (d_month_seq gate) and HAVING >= 10.
    // The correlated per-category average decorrelates to a group-avg join
    // — the plan Spark produces for the reference form anyway.
    QueryDef("q276_ds6_nation_above_avg_type_price", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val moScalar = Table(o)
        .filter(col("o_orderdate") >= lit("1995-03-01"), col("o_orderdate") < lit("1995-04-01"))
        .select(month(col("o_orderdate")).as("gate_mo")).distinct
      val typeCap = Table(p).groupBy(col("p_type"))
        .aggregate((dsum(col("p_retailprice")) / count(col("p_retailprice")) * lit(1.002)).as("price_cap"))
        .rename("p_type" -> "cap_type")
      Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .join(Table(c), col("o_custkey") === col("c_custkey"))
        .join(Table(n), col("c_nationkey") === col("n_nationkey"))
        .join(Table(region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .crossJoin(moScalar)
        .filter(year(col("l_shipdate")).between(1995, 1997), month(col("l_shipdate")) === col("gate_mo"))
        .join(typeCap, col("p_type") === col("cap_type"))
        .filter(col("p_retailprice") > col("price_cap"))
        .groupBy(col("r_name"))
        .aggregate(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 10)
        .sort(SortKey.asc(col("cnt")), SortKey.asc(col("r_name")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT r_name, COUNT(*) AS cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      JOIN (SELECT p_type AS cap_type,
              ${dsumSql("p_retailprice")} / COUNT(p_retailprice) * 1.002 AS price_cap
            FROM part GROUP BY 1) ta ON p_type = cap_type
      WHERE YEAR(l_shipdate) BETWEEN 1995 AND 1997
        AND MONTH(l_shipdate) = (SELECT DISTINCT MONTH(o_orderdate) FROM orders
              WHERE o_orderdate >= TIMESTAMP '1995-03-01'
                AND o_orderdate < TIMESTAMP '1995-04-01')
        AND p_retailprice > price_cap
      GROUP BY r_name
      HAVING COUNT(*) >= 10
      ORDER BY cnt, r_name
      LIMIT 100""")),

    // DS Q7 shape: 4-dim star filter (demographics, promotion OR-pair,
    // year) with four mean profiles per item.
    QueryDef("q277_ds7_demo_promo_means", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .join(Table(c), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING",
          col("o_orderpriority") === "1-URGENT" || col("o_orderstatus") === "F",
          year(col("o_orderdate")) === 1996)
        .groupBy(col("p_brand"))
        .aggregate(dmean(col("l_quantity")).as("agg1"),
          dmean(col("l_extendedprice")).as("agg2"),
          dmean(col("l_discount")).as("agg3"),
          dmean(col("l_tax")).as("agg4"))
        .sort(SortKey.asc(col("p_brand")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_brand, ${dmeanSql("l_quantity")} AS agg1,
        ${dmeanSql("l_extendedprice")} AS agg2,
        ${dmeanSql("l_discount")} AS agg3, ${dmeanSql("l_tax")} AS agg4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND (o_orderpriority = '1-URGENT' OR o_orderstatus = 'F')
        AND YEAR(o_orderdate) = 1996
      GROUP BY p_brand
      ORDER BY p_brand
      LIMIT 100""")),

    // DS Q8 shape: store profit restricted to a name-prefix set built as
    // (literal IN-list) INTERSECT (prefixes popular among parts,
    // HAVING count > 10) — ds8's zip-substring machinery on p_name.
    QueryDef("q278_ds8_prefix_intersect_profit", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val su = supplier(s, dir)
      val prefixes = Seq("smal", "red ", "blue", "hot ", "cold", "new ", "old ", "larg")
      val listed = Table(p)
        .filter(substring(col("p_name"), 1, 4).isin(prefixes: _*))
        .select(substring(col("p_name"), 1, 4).as("pref"))
      val popular = Table(p)
        .groupBy(substring(col("p_name"), 1, 4).as("pref2"))
        .aggregate(count(lit(1)).as("c"))
        .filter(col("c") > 10)
        .select(col("pref2"))
      val prefs = listed.intersect(popular)
      Table(l)
        .filter(col("l_linestatus") === "F",
          col("l_shipdate") >= lit("1996-01-01"), col("l_shipdate") < lit("1996-04-01"))
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(su), col("l_suppkey") === col("s_suppkey"))
        .inSubquery(substring(col("p_name"), 1, 4), prefs.df)
        .groupBy(col("s_name"))
        .aggregate(dsum(rev()).as("net_profit"))
        .sort(SortKey.asc(col("s_name")))
        .limit(100)
        .df
    }, Some(s"""
      WITH prefs AS (
        SELECT SUBSTRING(p_name, 1, 4) AS pref FROM part
        WHERE SUBSTRING(p_name, 1, 4) IN ('smal','red ','blue','hot ','cold','new ','old ','larg')
        INTERSECT
        SELECT pref2 FROM (
          SELECT SUBSTRING(p_name, 1, 4) AS pref2, COUNT(*) AS c
          FROM part GROUP BY 1 HAVING COUNT(*) > 10) t)
      SELECT s_name, ${dsumSql(REV_SQL)} AS net_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_linestatus = 'F'
        AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        AND SUBSTRING(p_name, 1, 4) IN (SELECT pref FROM prefs)
      GROUP BY s_name
      ORDER BY s_name
      LIMIT 100""")),

    // DS Q12 shape (web channel): item revenue plus its share of the
    // class total via a windowed sum over the aggregate. The window sum
    // runs over decimal(38,4) so the share is order-independent.
    QueryDef("q279_ds12_web_revenue_share", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val agg = Table(l)
        .filter(col("l_linestatus") === "O",
          col("l_shipdate") >= lit("1996-02-22"), col("l_shipdate") <= lit("1996-03-24"))
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_type").isin("PROMO", "STANDARD", "ECONOMY"))
        .groupBy(col("p_name"), col("p_brand"), col("p_type"), col("p_retailprice"))
        .aggregate(dsum(rev()).as("itemrevenue"))
      val w = Window.partitionBy(col("p_type"))
      agg.mutate("revenueratio" -> round(col("itemrevenue") * lit(100.0) /
          sum(col("itemrevenue").cast("decimal(38,4)")).over(w).cast("double"), 6))
        .sort(SortKey.asc(col("p_type")), SortKey.asc(col("p_brand")),
          SortKey.asc(col("p_name")), SortKey.asc(col("p_retailprice")),
          SortKey.asc(col("revenueratio")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, p_brand, p_type, p_retailprice, itemrevenue,
        ROUND(itemrevenue * 100.0 /
          CAST(SUM(CAST(itemrevenue AS DECIMAL(38,4))) OVER (PARTITION BY p_type) AS DOUBLE), 6)
          AS revenueratio
      FROM (
        SELECT p_name, p_brand, p_type, p_retailprice, ${dsumSql(REV_SQL)} AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O'
          AND l_shipdate BETWEEN TIMESTAMP '1996-02-22' AND TIMESTAMP '1996-03-24'
          AND p_type IN ('PROMO','STANDARD','ECONOMY')
        GROUP BY 1, 2, 3, 4) t
      ORDER BY p_type, p_brand, p_name, p_retailprice, revenueratio
      LIMIT 100""")),

    // DS Q18 shape: seven decimal-cast means over a 4-level ROLLUP
    // (item, country, state, county → brand, nation, segment, priority).
    QueryDef("q280_ds18_rollup_mean_casts", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val base = Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .join(Table(c), col("o_custkey") === col("c_custkey"))
        .join(Table(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY", "HOUSEHOLD"),
          col("o_orderstatus") === "F",
          year(col("o_orderdate")) === 1996,
          col("n_name").isin("NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9"))
      Table(base.df.rollup(col("p_brand"), col("n_name"), col("c_mktsegment"), col("o_orderpriority"))
          .agg(dmean(col("l_quantity")).as("agg1"),
            dmean(col("l_extendedprice")).as("agg2"),
            dmean(col("l_discount")).as("agg3"),
            dmean(col("l_tax")).as("agg4"),
            dmean(col("o_totalprice")).as("agg5"),
            dmean(col("c_acctbal")).as("agg6"),
            dmean(col("p_retailprice")).as("agg7")))
        .sort(SortKey(col("n_name"), ascending = true, nullsFirst = true),
          SortKey(col("c_mktsegment"), ascending = true, nullsFirst = true),
          SortKey(col("o_orderpriority"), ascending = true, nullsFirst = true),
          SortKey(col("p_brand"), ascending = true, nullsFirst = true))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_brand, n_name, c_mktsegment, o_orderpriority,
        ${dmeanSql("l_quantity")} AS agg1, ${dmeanSql("l_extendedprice")} AS agg2,
        ${dmeanSql("l_discount")} AS agg3, ${dmeanSql("l_tax")} AS agg4,
        ${dmeanSql("o_totalprice")} AS agg5, ${dmeanSql("c_acctbal")} AS agg6,
        ${dmeanSql("p_retailprice")} AS agg7
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE c_mktsegment IN ('BUILDING','MACHINERY','HOUSEHOLD')
        AND o_orderstatus = 'F' AND YEAR(o_orderdate) = 1996
        AND n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9')
      GROUP BY ROLLUP (p_brand, n_name, c_mktsegment, o_orderpriority)
      ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST,
        o_orderpriority NULLS FIRST, p_brand NULLS FIRST
      LIMIT 100""")),

    // DS Q19 shape: brand/manufacturer revenue where the buyer's and the
    // seller's geography differ (ds19's zip-prefix mismatch → nationkey
    // mismatch), manager + month + year gates.
    QueryDef("q281_ds19_brand_nation_mismatch", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val su = supplier(s, dir)
      Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .join(Table(c), col("o_custkey") === col("c_custkey"))
        .join(Table(su), col("l_suppkey") === col("s_suppkey"))
        .filter(col("p_size") === 8,
          month(col("l_shipdate")) === 11, year(col("l_shipdate")) === 1996,
          col("c_nationkey") =!= col("s_nationkey"))
        .groupBy(col("p_brand"), col("p_type"))
        .aggregate(dsum(rev()).as("ext_price"))
        .sort(SortKey.desc(col("ext_price")), SortKey.asc(col("p_brand")),
          SortKey.asc(col("p_type")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_brand, p_type, ${dsumSql(REV_SQL)} AS ext_price
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE p_size = 8 AND MONTH(l_shipdate) = 11 AND YEAR(l_shipdate) = 1996
        AND c_nationkey <> s_nationkey
      GROUP BY p_brand, p_type
      ORDER BY ext_price DESC, p_brand, p_type
      LIMIT 100""")),

    // DS Q20 shape: the catalog-channel twin of ds12's revenue share —
    // different slice, window, and category list.
    QueryDef("q282_ds20_catalog_revenue_share", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val agg = Table(l)
        .filter(col("l_returnflag") === "R",
          col("l_shipdate") >= lit("1997-02-22"), col("l_shipdate") <= lit("1997-03-24"))
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_type").isin("SMALL", "MEDIUM", "LARGE"))
        .groupBy(col("p_name"), col("p_brand"), col("p_type"), col("p_retailprice"))
        .aggregate(dsum(rev()).as("itemrevenue"))
      val w = Window.partitionBy(col("p_type"))
      agg.mutate("revenueratio" -> round(col("itemrevenue") * lit(100.0) /
          sum(col("itemrevenue").cast("decimal(38,4)")).over(w).cast("double"), 6))
        .sort(SortKey(col("p_type"), ascending = true, nullsFirst = true),
          SortKey(col("p_brand"), ascending = true, nullsFirst = true),
          SortKey(col("p_name"), ascending = true, nullsFirst = true),
          SortKey.asc(col("p_retailprice")), SortKey.asc(col("revenueratio")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, p_brand, p_type, p_retailprice, itemrevenue,
        ROUND(itemrevenue * 100.0 /
          CAST(SUM(CAST(itemrevenue AS DECIMAL(38,4))) OVER (PARTITION BY p_type) AS DOUBLE), 6)
          AS revenueratio
      FROM (
        SELECT p_name, p_brand, p_type, p_retailprice, ${dsumSql(REV_SQL)} AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
          AND l_shipdate BETWEEN TIMESTAMP '1997-02-22' AND TIMESTAMP '1997-03-24'
          AND p_type IN ('SMALL','MEDIUM','LARGE')
        GROUP BY 1, 2, 3, 4) t
      ORDER BY p_type NULLS FIRST, p_brand NULLS FIRST, p_name NULLS FIRST,
        p_retailprice, revenueratio
      LIMIT 100""")),

    // DS Q21 shape: quantity shipped before vs after a pivot date within a
    // +/-45-day window, keeping groups whose after/before ratio lies in
    // [2/3, 3/2] — conditional sums + a guarded ratio band.
    QueryDef("q283_ds21_before_after_ratio", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val su = supplier(s, dir)
      Table(l)
        .filter(col("l_shipdate") >= lit("1998-05-01"), col("l_shipdate") <= lit("1998-07-31"))
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_retailprice").between(900, 1100))
        .join(Table(su), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"), col("p_brand"))
        .aggregate(
          dsum(when(col("l_shipdate") < lit("1998-06-15"), col("l_quantity")).otherwise(lit(0.0))).as("inv_before"),
          dsum(when(col("l_shipdate") >= lit("1998-06-15"), col("l_quantity")).otherwise(lit(0.0))).as("inv_after"))
        .filter(when(col("inv_before") > 0, col("inv_after") / col("inv_before"))
          .between(lit(2.0) / lit(3.0), lit(3.0) / lit(2.0)))
        .sort(SortKey.asc(col("s_name")), SortKey.asc(col("p_brand")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT * FROM (
        SELECT s_name, p_brand,
          ${dsumSql("CASE WHEN l_shipdate < TIMESTAMP '1998-06-15' THEN l_quantity ELSE 0 END")} AS inv_before,
          ${dsumSql("CASE WHEN l_shipdate >= TIMESTAMP '1998-06-15' THEN l_quantity ELSE 0 END")} AS inv_after
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        WHERE l_shipdate BETWEEN TIMESTAMP '1998-05-01' AND TIMESTAMP '1998-07-31'
          AND p_retailprice BETWEEN 900 AND 1100
        GROUP BY s_name, p_brand) x
      WHERE (CASE WHEN inv_before > 0 THEN inv_after / inv_before END)
        BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
      ORDER BY s_name, p_brand
      LIMIT 100""")),

    // DS Q22 shape: average quantity-on-hand over a 3-level rollup
    // (product, brand, class) across a 12-month window, ordered by the
    // mean first (NULLS FIRST) like the reference.
    QueryDef("q284_ds22_qoh_rollup", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      Table(Table(l)
          .filter(col("l_shipdate") >= lit("1996-01-01"), col("l_shipdate") < lit("1997-01-01"))
          .join(Table(p), col("l_partkey") === col("p_partkey"))
          .df.rollup(col("p_name"), col("p_brand"), col("p_type"))
          .agg(dmean(col("l_quantity")).as("qoh")))
        .sort(SortKey(col("qoh"), ascending = true, nullsFirst = true),
          SortKey(col("p_name"), ascending = true, nullsFirst = true),
          SortKey(col("p_brand"), ascending = true, nullsFirst = true),
          SortKey(col("p_type"), ascending = true, nullsFirst = true))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, p_brand, p_type, ${dmeanSql("l_quantity")} AS qoh
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY ROLLUP (p_name, p_brand, p_type)
      ORDER BY qoh NULLS FIRST, p_name NULLS FIRST, p_brand NULLS FIRST, p_type NULLS FIRST
      LIMIT 100""")),

    // DS Q26 shape: the catalog twin of ds7 — different slice, segment,
    // promo OR-pair, and year.
    QueryDef("q285_ds26_catalog_demo_means", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .filter(col("l_returnflag") === "R")
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .join(Table(c), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "MACHINERY",
          col("o_orderpriority") === "2-HIGH" || col("o_orderstatus") === "O",
          year(col("o_orderdate")) === 1997)
        .groupBy(col("p_brand"))
        .aggregate(dmean(col("l_quantity")).as("agg1"),
          dmean(col("l_extendedprice")).as("agg2"),
          dmean(col("l_discount")).as("agg3"),
          dmean(col("l_tax")).as("agg4"))
        .sort(SortKey.asc(col("p_brand")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_brand, ${dmeanSql("l_quantity")} AS agg1,
        ${dmeanSql("l_extendedprice")} AS agg2,
        ${dmeanSql("l_discount")} AS agg3, ${dmeanSql("l_tax")} AS agg4
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R' AND c_mktsegment = 'MACHINERY'
        AND (o_orderpriority = '2-HIGH' OR o_orderstatus = 'O')
        AND YEAR(o_orderdate) = 1997
      GROUP BY p_brand
      ORDER BY p_brand
      LIMIT 100""")),

    // DS Q29 shape: sales / returns / catalog quantity matrix — three
    // slices of the fact chained through shared keys, each under a
    // different date constraint (month, month+3 window, 3-year span).
    QueryDef("q286_ds29_quantity_matrix", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val su = supplier(s, dir)
      val s1 = Table(l)
        .filter(col("l_linestatus") === "F",
          year(col("l_shipdate")) === 1996, month(col("l_shipdate")) === 3)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .join(Table(su), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey").as("ok1"), col("l_partkey").as("pk1"),
          col("p_name"), col("s_name"), col("l_quantity").as("q1"))
      val s2 = Table(lineitem(s, dir))
        .filter(col("l_returnflag") === "R",
          col("l_shipdate") >= lit("1996-03-01"), col("l_shipdate") < lit("1996-07-01"))
        .select(col("l_orderkey").as("ok2"), col("l_partkey").as("pk2"),
          col("l_suppkey").as("sk2"), col("l_quantity").as("q2"))
      val s3 = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "O", year(col("l_shipdate")).between(1996, 1998))
        .select(col("l_partkey").as("pk3"), col("l_suppkey").as("sk3"),
          col("l_quantity").as("q3"))
      s1.join(s2, col("ok1") === col("ok2") && col("pk1") === col("pk2"))
        .join(s3, col("pk2") === col("pk3") && col("sk2") === col("sk3"))
        .groupBy(col("p_name"), col("s_name"))
        .aggregate(dsum(col("q1")).as("store_sales_quantity"),
          dsum(col("q2")).as("store_returns_quantity"),
          dsum(col("q3")).as("catalog_sales_quantity"))
        .sort(SortKey.asc(col("p_name")), SortKey.asc(col("s_name")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, s_name,
        ${dsumSql("q1")} AS store_sales_quantity,
        ${dsumSql("q2")} AS store_returns_quantity,
        ${dsumSql("q3")} AS catalog_sales_quantity
      FROM (
        SELECT s1.p_name, s1.s_name, s1.q1, s2.q2, s3.q3
        FROM (
          SELECT l_orderkey AS ok1, l_partkey AS pk1, p_name, s_name, l_quantity AS q1
          FROM lineitem JOIN part ON l_partkey = p_partkey JOIN supplier ON l_suppkey = s_suppkey
          WHERE l_linestatus = 'F' AND YEAR(l_shipdate) = 1996 AND MONTH(l_shipdate) = 3) s1
        JOIN (
          SELECT l_orderkey AS ok2, l_partkey AS pk2, l_suppkey AS sk2, l_quantity AS q2
          FROM lineitem
          WHERE l_returnflag = 'R'
            AND l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-07-01') s2
          ON ok1 = ok2 AND pk1 = pk2
        JOIN (
          SELECT l_partkey AS pk3, l_suppkey AS sk3, l_quantity AS q3
          FROM lineitem
          WHERE l_linestatus = 'O' AND YEAR(l_shipdate) BETWEEN 1996 AND 1998) s3
          ON pk2 = pk3 AND sk2 = sk3) m
      GROUP BY p_name, s_name
      ORDER BY p_name, s_name
      LIMIT 100""")),

    // DS Q55 shape: flat brand revenue for one manager + month.
    QueryDef("q287_ds55_brand_monthly", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .filter(col("p_size").between(20, 40),
          month(col("l_shipdate")) === 11, year(col("l_shipdate")).isin(1996, 1997))
        .groupBy(col("p_brand"))
        .aggregate(dsum(rev()).as("ext_price"))
        .sort(SortKey.desc(col("ext_price")), SortKey.asc(col("p_brand")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_brand, ${dsumSql(REV_SQL)} AS ext_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size BETWEEN 20 AND 40 AND MONTH(l_shipdate) = 11 AND YEAR(l_shipdate) IN (1996, 1997)
      GROUP BY p_brand
      ORDER BY ext_price DESC, p_brand
      LIMIT 100""")),

    // DS Q56 shape: the color-item IN-subquery repeated inside each of
    // three channel CTEs (store/web/catalog slices), UNION ALL'd and
    // re-aggregated per item.
    QueryDef("q288_ds56_color_three_channel", (s, dir) => {
      val colorIds = Table(part(s, dir))
        .filter(expr("split_part(p_name, ' ', 1)").isin("red", "blue", "hot"))
        .df.select(col("p_partkey").as("cid"))
      def chan(pred: org.apache.spark.sql.Column) = Table(lineitem(s, dir))
        .filter(pred, year(col("l_shipdate")) === 1997, month(col("l_shipdate")) === 2)
        .inSubquery(col("l_partkey"), colorIds)
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .join(Table(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(Table(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_regionkey") === 1)
        .groupBy(col("p_name"))
        .aggregate(dsum(rev()).as("total_sales"))
      chan(col("l_linestatus") === "F")
        .union(chan(col("l_linestatus") === "O"))
        .union(chan(col("l_returnflag") === "R"))
        .groupBy(col("p_name"))
        .aggregate(dsum(col("total_sales")).as("total_sales"))
        .sort(SortKey.asc(col("total_sales")), SortKey.asc(col("p_name")))
        .limit(100)
        .df
    }, Some(s"""
      WITH ids AS (
        SELECT p_partkey AS cid FROM part
        WHERE SPLIT_PART(p_name, ' ', 1) IN ('red','blue','hot')),
      chan AS (
        SELECT p_name, l_linestatus, l_returnflag, ${REV_SQL} AS r
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE YEAR(l_shipdate) = 1997 AND MONTH(l_shipdate) = 2
          AND n_regionkey = 1
          AND l_partkey IN (SELECT cid FROM ids)),
      per AS (
        SELECT p_name, ${dsumSql("r")} AS total_sales FROM chan WHERE l_linestatus = 'F' GROUP BY 1
        UNION ALL
        SELECT p_name, ${dsumSql("r")} AS total_sales FROM chan WHERE l_linestatus = 'O' GROUP BY 1
        UNION ALL
        SELECT p_name, ${dsumSql("r")} AS total_sales FROM chan WHERE l_returnflag = 'R' GROUP BY 1)
      SELECT p_name, ${dsumSql("total_sales")} AS total_sales
      FROM per GROUP BY p_name
      ORDER BY total_sales, p_name
      LIMIT 100""")),

    // DS Q63 shape: monthly manager sales vs the manager's cross-month
    // average (avg-of-sums window), keeping months deviating > 10%. The
    // window mean runs over decimal so it is order-independent.
    QueryDef("q289_ds63_monthly_vs_avg", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val base = Table(l)
        .join(Table(p), col("l_partkey") === col("p_partkey"))
        .filter(year(col("l_shipdate")) === 1996,
          (col("p_type").isin("PROMO", "STANDARD") &&
            col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")) ||
          (col("p_type").isin("ECONOMY", "LARGE") &&
            col("p_brand").isin("Brand#4", "Brand#5", "Brand#6")))
        .mutate("mo" -> month(col("l_shipdate")))
        .groupBy(col("p_size"), col("mo"))
        .aggregate(dsum(rev()).as("sum_sales"))
      val w = Window.partitionBy(col("p_size"))
      base.mutate("avg_monthly_sales" ->
          round(sum(col("sum_sales").cast("decimal(38,4)")).over(w).cast("double") /
            count(col("sum_sales")).over(w), 6))
        .filter(when(col("avg_monthly_sales") > 0,
          abs(col("sum_sales") - col("avg_monthly_sales")) / col("avg_monthly_sales")) > 0.1)
        .select(col("p_size").as("i_manager_id"), col("sum_sales"), col("avg_monthly_sales"))
        .sort(SortKey.asc(col("i_manager_id")), SortKey.asc(col("avg_monthly_sales")),
          SortKey.asc(col("sum_sales")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT i_manager_id, sum_sales, avg_monthly_sales FROM (
        SELECT p_size AS i_manager_id, sum_sales,
          ROUND(CAST(SUM(CAST(sum_sales AS DECIMAL(38,4))) OVER (PARTITION BY p_size) AS DOUBLE)
            / COUNT(sum_sales) OVER (PARTITION BY p_size), 6) AS avg_monthly_sales
        FROM (
          SELECT p_size, MONTH(l_shipdate) AS mo, ${dsumSql(REV_SQL)} AS sum_sales
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE YEAR(l_shipdate) = 1996
            AND ((p_type IN ('PROMO','STANDARD') AND p_brand IN ('Brand#1','Brand#2','Brand#3'))
              OR (p_type IN ('ECONOMY','LARGE') AND p_brand IN ('Brand#4','Brand#5','Brand#6')))
          GROUP BY 1, 2) t1) t2
      WHERE (CASE WHEN avg_monthly_sales > 0
          THEN ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales END) > 0.1
      ORDER BY i_manager_id, avg_monthly_sales, sum_sales
      LIMIT 100""")),

    // DS Q68 shape: per-ticket (order) extended sums tagged with the city
    // where the purchase happened (supplier nation), joined to the
    // customer's current city and kept only when they differ.
    QueryDef("q290_ds68_city_pair_tickets", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val su = supplier(s, dir)
      val c = customer(s, dir)
      val dn = Table(l)
        .filter(col("l_linestatus") === "F")
        .join(Table(o), col("l_orderkey") === col("o_orderkey"))
        .filter(dayofmonth(col("o_orderdate")).between(1, 2),
          year(col("o_orderdate")).between(1996, 1998),
          col("o_orderpriority") === "1-URGENT" || col("o_orderstatus") === "F")
        .join(Table(su), col("l_suppkey") === col("s_suppkey"))
        .join(Table(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_2", "NATION_4", "NATION_6", "NATION_8"))
        .groupBy(col("l_orderkey"), col("o_custkey"), col("n_name"))
        .aggregate(dsum(col("l_extendedprice")).as("extended_price"),
          dsum(rev()).as("list_price"),
          dsum(col("l_extendedprice") * col("l_tax")).as("extended_tax"))
        .rename("n_name" -> "bought_city")
      dn.join(Table(c), col("o_custkey") === col("c_custkey"))
        .join(Table(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name") =!= col("bought_city"))
        .select(col("c_name"), col("n_name").as("current_city"), col("bought_city"),
          col("l_orderkey").as("ticket_number"),
          col("extended_price"), col("extended_tax"), col("list_price"))
        .sort(SortKey.asc(col("c_name")), SortKey.asc(col("ticket_number")),
          SortKey.asc(col("bought_city")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT c_name, n2.n_name AS current_city, bought_city,
        l_orderkey AS ticket_number, extended_price, extended_tax, list_price
      FROM (
        SELECT l_orderkey, o_custkey, n_name AS bought_city,
          ${dsumSql("l_extendedprice")} AS extended_price,
          ${dsumSql(REV_SQL)} AS list_price,
          ${dsumSql("l_extendedprice * l_tax")} AS extended_tax
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE l_linestatus = 'F'
          AND DAY(o_orderdate) BETWEEN 1 AND 2
          AND YEAR(o_orderdate) BETWEEN 1996 AND 1998
          AND (o_orderpriority = '1-URGENT' OR o_orderstatus = 'F')
          AND n_name IN ('NATION_2','NATION_4','NATION_6','NATION_8')
        GROUP BY 1, 2, 3) dn
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n2.n_name <> bought_city
      ORDER BY c_name, ticket_number, bought_city
      LIMIT 100""")),

    // DS Q69 shape: demographic counts for customers with a store purchase
    // in the window but no web and no catalog purchase — one EXISTS plus
    // two NOT EXISTS, all as semi/anti joins (no collects).
    QueryDef("q291_ds69_exists_not_exists", (s, dir) => {
      val c = customer(s, dir); val n = nation(s, dir)
      def buyers(status: String) = Table(orders(s, dir))
        .filter(col("o_orderstatus") === status,
          col("o_orderdate") >= lit("1996-04-01"), col("o_orderdate") < lit("1996-07-01"))
        .df.select(col("o_custkey").as("bk"))
      Table(c)
        .join(Table(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_1", "NATION_5", "NATION_9", "NATION_13"))
        .inSubquery(col("c_custkey"), buyers("F"))
        .joinOn(Table(buyers("O")), Seq("c_custkey" -> "bk"), how = "anti")
        .joinOn(Table(buyers("P")), Seq("c_custkey" -> "bk"), how = "anti")
        .groupBy(col("c_mktsegment"), col("n_name"))
        .aggregate(count(lit(1)).as("cnt1"), count(lit(1)).as("cnt2"), count(lit(1)).as("cnt3"))
        .sort(SortKey.asc(col("c_mktsegment")), SortKey.asc(col("n_name")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT c_mktsegment, n_name, COUNT(*) AS cnt1, COUNT(*) AS cnt2, COUNT(*) AS cnt3
      FROM customer c
      JOIN nation ON c_nationkey = n_nationkey
      WHERE n_name IN ('NATION_1','NATION_5','NATION_9','NATION_13')
        AND EXISTS (
          SELECT * FROM orders
          WHERE o_custkey = c.c_custkey AND o_orderstatus = 'F'
            AND o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1996-07-01')
        AND NOT EXISTS (
          SELECT * FROM orders
          WHERE o_custkey = c.c_custkey AND o_orderstatus = 'O'
            AND o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1996-07-01')
        AND NOT EXISTS (
          SELECT * FROM orders
          WHERE o_custkey = c.c_custkey AND o_orderstatus = 'P'
            AND o_orderdate >= TIMESTAMP '1996-04-01' AND o_orderdate < TIMESTAMP '1996-07-01')
      GROUP BY c_mktsegment, n_name
      ORDER BY c_mktsegment, n_name
      LIMIT 100""")),

    // DS Q72 shape: inventory-shortfall — catalog lines matched to an
    // inventory slice in the SAME week (date-role equality across two
    // date dims), ship-after-5-days gate, LEFT OUTER promotion dim and
    // LEFT OUTER returns, promo/no-promo conditional counts.
    QueryDef("q292_ds72_inventory_shortfall", (s, dir) => {
      val cs = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "O")
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .join(Table(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "HOUSEHOLD",
          year(col("o_orderdate")).between(1995, 1997),
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 5 DAY"))
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("cs_ok"), col("l_partkey").as("cs_pk"),
          col("l_suppkey").as("cs_sk"), col("l_quantity").as("cs_qty"),
          col("p_name"), date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("wk"))
      val inv = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "F")
        .select(col("l_partkey").as("inv_pk"), col("l_quantity").as("inv_qty"),
          date_trunc("month", col("l_shipdate")).cast("timestamp_ntz").as("inv_wk"))
      val promo = Table(supplier(s, dir))
        .filter(col("s_acctbal") > 5000)
        .select(col("s_suppkey").as("promo_sk"))
      val rets = Table(lineitem(s, dir))
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
        .aggregate(count(lit(1)).as("r_cnt"))
      cs.join(inv, col("cs_pk") === col("inv_pk") && col("wk") === col("inv_wk") &&
          col("inv_qty") < col("cs_qty"))
        .join(promo, col("cs_sk") === col("promo_sk"), how = "left")
        .join(rets, col("cs_ok") === col("r_ok") && col("cs_pk") === col("r_pk"), how = "left")
        .groupBy(col("p_name"), col("wk"))
        .aggregate(count(when(col("promo_sk").isNull, lit(1))).as("no_promo"),
          count(when(col("promo_sk").isNotNull, lit(1))).as("promo"),
          count(lit(1)).as("total_cnt"))
        .sort(SortKey.desc(col("total_cnt")), SortKey.asc(col("p_name")), SortKey.asc(col("wk")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, wk,
        COUNT(CASE WHEN promo_sk IS NULL THEN 1 END) AS no_promo,
        COUNT(CASE WHEN promo_sk IS NOT NULL THEN 1 END) AS promo,
        COUNT(*) AS total_cnt
      FROM (
        SELECT l_orderkey AS cs_ok, l_partkey AS cs_pk, l_suppkey AS cs_sk,
          l_quantity AS cs_qty, p_name, DATE_TRUNC('month', o_orderdate) AS wk
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND c_mktsegment = 'HOUSEHOLD'
          AND YEAR(o_orderdate) BETWEEN 1995 AND 1997
          AND l_shipdate > o_orderdate + INTERVAL 5 DAY) cs
      JOIN (
        SELECT l_partkey AS inv_pk, l_quantity AS inv_qty,
          DATE_TRUNC('month', l_shipdate) AS inv_wk
        FROM lineitem WHERE l_linestatus = 'F') inv
        ON cs_pk = inv_pk AND wk = inv_wk AND inv_qty < cs_qty
      LEFT JOIN (
        SELECT s_suppkey AS promo_sk FROM supplier WHERE s_acctbal > 5000) pr
        ON cs_sk = promo_sk
      LEFT JOIN (
        SELECT l_orderkey AS r_ok, l_partkey AS r_pk, COUNT(*) AS r_cnt
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2) rt
        ON cs_ok = r_ok AND cs_pk = r_pk
      GROUP BY p_name, wk
      ORDER BY total_cnt DESC, p_name, wk
      LIMIT 100""")),

    // DS Q80 shape: per-channel sales vs returns with a row-level LEFT
    // OUTER returns link (item+ticket), UNION ALL'd and re-aggregated
    // under ROLLUP(channel, id).
    QueryDef("q293_ds80_channel_returns_rollup", (s, dir) => {
      def chan(status: String, tag: String) = {
        val sales = Table(lineitem(s, dir))
          .filter(col("l_linestatus") === status, col("l_returnflag") =!= "R",
            col("l_shipdate") >= lit("1996-06-01"), col("l_shipdate") <= lit("1996-11-30"))
          .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderpriority") =!= "5-LOW")
          .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
          .filter(col("p_retailprice") > 905)
          .join(Table(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        val rets = Table(lineitem(s, dir))
          .filter(col("l_linestatus") === status, col("l_returnflag") === "R")
          .groupBy(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
          .aggregate(dsum(rev()).as("ret_amt"),
            dsum(col("l_extendedprice") * col("l_tax")).as("ret_loss"))
        sales.join(rets, col("l_orderkey") === col("r_ok") && col("l_partkey") === col("r_pk"),
            how = "left")
          .groupBy(col("s_name"))
          .aggregate(dsum(rev()).as("sales"),
            dsum(coalesce(col("ret_amt"), lit(0.0))).as("returns_"),
            dsum(coalesce(col("ret_loss"), lit(0.0))).as("loss"))
          .mutate("profit" -> round(col("sales") - col("returns_") - col("loss"), 4))
          .select(lit(tag).as("channel"), col("s_name").as("id"),
            col("sales"), col("returns_"), col("profit"))
      }
      Table(chan("F", "store channel").union(chan("O", "web channel"))
          .df.rollup(col("channel"), col("id"))
          .agg(dsum(col("sales")).as("sales"), dsum(col("returns_")).as("returns_"),
            dsum(col("profit")).as("profit")))
        .sort(SortKey(col("channel"), ascending = true, nullsFirst = true),
          SortKey(col("id"), ascending = true, nullsFirst = true))
        .limit(100)
        .df
    }, Some(s"""
      WITH rets AS (
        SELECT l_linestatus AS st, l_orderkey AS r_ok, l_partkey AS r_pk,
          ${dsumSql(REV_SQL)} AS ret_amt, ${dsumSql("l_extendedprice * l_tax")} AS ret_loss
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1, 2, 3),
      base AS (
        SELECT CASE WHEN l_linestatus = 'F' THEN 'store channel' ELSE 'web channel' END AS channel,
          s_name AS id, ${REV_SQL} AS r, l_tax, ret_amt, ret_loss
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        LEFT JOIN rets ON l_orderkey = r_ok AND l_partkey = r_pk AND l_linestatus = st
        WHERE l_returnflag <> 'R'
          AND l_shipdate BETWEEN TIMESTAMP '1996-06-01' AND TIMESTAMP '1996-11-30'
          AND o_orderpriority <> '5-LOW' AND p_retailprice > 905),
      per AS (
        SELECT channel, id, sales, returns_,
          ROUND(sales - returns_ - loss, 4) AS profit
        FROM (
          SELECT channel, id, ${dsumSql("r")} AS sales,
            ${dsumSql("COALESCE(ret_amt, 0)")} AS returns_,
            ${dsumSql("COALESCE(ret_loss, 0)")} AS loss
          FROM base GROUP BY 1, 2) g)
      SELECT channel, id, ${dsumSql("sales")} AS sales,
        ${dsumSql("returns_")} AS returns_, ${dsumSql("profit")} AS profit
      FROM per
      GROUP BY ROLLUP (channel, id)
      ORDER BY channel NULLS FIRST, id NULLS FIRST
      LIMIT 100""")),

    // DS Q81 shape: reused returns CTE — per-(customer, state) total
    // returns filtered above 1.2x the state average (the CTE appears both
    // as the driving relation and inside the average), then customer
    // detail for one state.
    QueryDef("q294_ds81_state_return_above_avg", (s, dir) => {
      val ctr = Table(lineitem(s, dir))
        .filter(col("l_returnflag") === "R")
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .filter(year(col("o_orderdate")) === 1996)
        .join(Table(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .join(Table(nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("o_custkey"), col("n_name"))
        .aggregate(dsum(rev()).as("ctr_total_return"))
      val thr = ctr.groupBy(col("n_name").as("avg_nation"))
        .aggregate((dsum(col("ctr_total_return")) / count(col("ctr_total_return")) * lit(1.2)).as("thr"))
      ctr.join(thr, col("n_name") === col("avg_nation"))
        .filter(col("ctr_total_return") > col("thr"), col("n_name") === "NATION_3")
        .join(Table(customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_mktsegment"), col("n_name").as("ca_state"),
          col("ctr_total_return"))
        .sort(SortKey.asc(col("c_name")), SortKey.asc(col("ctr_total_return")))
        .limit(100)
        .df
    }, Some(s"""
      WITH ctr AS (
        SELECT o_custkey, n_name, ${dsumSql(REV_SQL)} AS ctr_total_return
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R' AND YEAR(o_orderdate) = 1996
        GROUP BY 1, 2)
      SELECT c_name, c_mktsegment, ctr.n_name AS ca_state, ctr_total_return
      FROM ctr
      JOIN (SELECT n_name AS avg_nation,
              ${dsumSql("ctr_total_return")} / COUNT(ctr_total_return) * 1.2 AS thr
            FROM ctr GROUP BY 1) a ON ctr.n_name = avg_nation
      JOIN customer ON o_custkey = c_custkey
      WHERE ctr_total_return > thr AND ctr.n_name = 'NATION_3'
      ORDER BY c_name, ctr_total_return
      LIMIT 100""")),

    // DS Q82 shape: item listing — price band + manufacturer IN-list +
    // inventory-quantity band in a date window + existence in the store
    // channel (semi join), GROUP BY as dedup.
    QueryDef("q295_ds82_inventory_band_items", (s, dir) => {
      val storeSold = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "F")
        .df.select(col("l_partkey").as("sold_pk"))
      Table(part(s, dir))
        .filter(col("p_retailprice").between(903, 917), col("p_size").between(1, 25))
        .join(Table(lineitem(s, dir))
            .filter(col("l_linestatus") === "O",
              col("l_shipdate") >= lit("1996-03-01"), col("l_shipdate") <= lit("1996-09-30"),
              col("l_quantity").between(5, 45)),
          col("p_partkey") === col("l_partkey"))
        .inSubquery(col("p_partkey"), storeSold)
        .groupBy(col("p_name"), col("p_retailprice"))
        .aggregate(count(lit(1)).as("cnt"))
        .dropColumns("cnt")
        .sort(SortKey.asc(col("p_name")), SortKey.asc(col("p_retailprice")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_name, p_retailprice
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      WHERE p_retailprice BETWEEN 903 AND 917 AND p_size BETWEEN 1 AND 25
        AND l_linestatus = 'O'
        AND l_shipdate BETWEEN TIMESTAMP '1996-03-01' AND TIMESTAMP '1996-09-30'
        AND l_quantity BETWEEN 5 AND 45
        AND p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_linestatus = 'F')
      GROUP BY p_name, p_retailprice
      ORDER BY p_name, p_retailprice
      LIMIT 100""")),

    // DS Q83 shape: three return channels (disjoint returnflag slices)
    // each restricted to the WEEKS containing three pinned dates — the
    // nested date-in-week-in-date IN chain — inner-joined per item with
    // each channel's share-of-average deviation.
    QueryDef("q296_ds83_return_fraction_triple", (s, dir) => {
      val pinned = Seq("1996-06-30", "1996-09-27", "1996-11-17").map(java.sql.Date.valueOf)
      val weekSet = Table(lineitem(s, dir))
        .filter(to_date(col("l_shipdate")).isin(pinned: _*))
        .df.select(date_trunc("week", col("l_shipdate")).as("wk")).distinct()
      val validDates = Table(lineitem(s, dir))
        .inSubquery(date_trunc("week", col("l_shipdate")), weekSet)
        .df.select(to_date(col("l_shipdate")).as("vd")).distinct()
      def items(flag: String, qtyName: String) = Table(lineitem(s, dir))
        .filter(col("l_returnflag") === flag)
        .inSubquery(to_date(col("l_shipdate")), validDates)
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .aggregate(dsum(col("l_quantity")).as(qtyName))
      val sr = items("R", "sr_item_qty").rename("p_brand" -> "item_id")
      val cr = items("A", "cr_item_qty").rename("p_brand" -> "cr_brand")
      val wr = items("N", "wr_item_qty").rename("p_brand" -> "wr_brand")
      val tot = col("sr_item_qty") + col("cr_item_qty") + col("wr_item_qty")
      sr.join(cr, col("item_id") === col("cr_brand"))
        .join(wr, col("item_id") === col("wr_brand"))
        .mutate(
          "sr_dev" -> round(col("sr_item_qty") / tot / lit(3.0) * lit(100.0), 6),
          "cr_dev" -> round(col("cr_item_qty") / tot / lit(3.0) * lit(100.0), 6),
          "wr_dev" -> round(col("wr_item_qty") / tot / lit(3.0) * lit(100.0), 6),
          "average" -> round(tot / lit(3.0), 6))
        .dropColumns("cr_brand", "wr_brand")
        .sort(SortKey.asc(col("item_id")), SortKey.asc(col("sr_item_qty")))
        .limit(100)
        .df
    }, Some(s"""
      WITH wks AS (
        SELECT DISTINCT DATE_TRUNC('week', l_shipdate) AS wk FROM lineitem
        WHERE CAST(l_shipdate AS DATE) IN (DATE '1996-06-30', DATE '1996-09-27', DATE '1996-11-17')),
      vd AS (
        SELECT DISTINCT CAST(l_shipdate AS DATE) AS vd FROM lineitem
        WHERE DATE_TRUNC('week', l_shipdate) IN (SELECT wk FROM wks)),
      sr AS (
        SELECT p_brand AS item_id, ${dsumSql("l_quantity")} AS sr_item_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R' AND CAST(l_shipdate AS DATE) IN (SELECT vd FROM vd)
        GROUP BY 1),
      cr AS (
        SELECT p_brand AS cr_brand, ${dsumSql("l_quantity")} AS cr_item_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'A' AND CAST(l_shipdate AS DATE) IN (SELECT vd FROM vd)
        GROUP BY 1),
      wr AS (
        SELECT p_brand AS wr_brand, ${dsumSql("l_quantity")} AS wr_item_qty
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'N' AND CAST(l_shipdate AS DATE) IN (SELECT vd FROM vd)
        GROUP BY 1)
      SELECT item_id, sr_item_qty,
        ROUND(sr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100.0, 6) AS sr_dev,
        cr_item_qty,
        ROUND(cr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100.0, 6) AS cr_dev,
        wr_item_qty,
        ROUND(wr_item_qty / (sr_item_qty + cr_item_qty + wr_item_qty) / 3.0 * 100.0, 6) AS wr_dev,
        ROUND((sr_item_qty + cr_item_qty + wr_item_qty) / 3.0, 6) AS average
      FROM sr JOIN cr ON item_id = cr_brand JOIN wr ON item_id = wr_brand
      ORDER BY item_id, sr_item_qty
      LIMIT 100""")),

    // DS Q86 shape: rollup rank-within-parent over the web slice — the
    // grouping()-driven hierarchy rank (ds70's twin at a different
    // hierarchy and channel).
    QueryDef("q297_ds86_web_rollup_rank", (s, dir) => {
      val rolled = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "O", year(col("l_shipdate")) === 1996)
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .df.rollup(col("p_type"), col("p_brand"))
        .agg(dsum(rev()).as("total_sum"),
          (grouping(col("p_type")) + grouping(col("p_brand"))).cast("int").as("lochierarchy"))
      Table(rolled)
        .mutate("rank_within_parent" -> rank().over(
          Window.partitionBy(col("lochierarchy"),
              when(col("lochierarchy") === 0, col("p_type")))
            .orderBy(col("total_sum").desc)).cast("int"))
        .sort(SortKey.desc(col("lochierarchy")),
          SortKey(when(col("lochierarchy") === 0, col("p_type")), ascending = true, nullsFirst = true),
          SortKey.asc(col("rank_within_parent")),
          SortKey(col("p_type"), ascending = true, nullsFirst = true),
          SortKey(col("p_brand"), ascending = true, nullsFirst = true))
        .limit(100)
        .df
    }, Some(s"""
      SELECT p_type, p_brand, total_sum, lochierarchy,
        CAST(RANK() OVER (PARTITION BY lochierarchy,
            CASE WHEN lochierarchy = 0 THEN p_type END
          ORDER BY total_sum DESC) AS INT) AS rank_within_parent
      FROM (
        SELECT p_type, p_brand, ${dsumSql(REV_SQL)} AS total_sum,
          CAST(GROUPING(p_type) + GROUPING(p_brand) AS INT) AS lochierarchy
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND YEAR(l_shipdate) = 1996
        GROUP BY ROLLUP (p_type, p_brand)) rolled
      ORDER BY lochierarchy DESC,
        CASE WHEN lochierarchy = 0 THEN p_type END NULLS FIRST,
        rank_within_parent, p_type NULLS FIRST, p_brand NULLS FIRST
      LIMIT 100""")),

    // DS Q92 shape: excess discount — lines whose discount amount exceeds
    // 1.3x the per-item average over the same window (correlated average
    // decorrelated to a group-avg join), single-row total.
    QueryDef("q298_ds92_excess_discount", (s, dir) => {
      val disc = col("l_extendedprice") * col("l_discount")
      def windowed = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "O",
          col("l_shipdate") >= lit("1996-01-27"), col("l_shipdate") <= lit("1996-04-26"))
      val thr = windowed
        .groupBy(col("l_partkey").as("ap"))
        .aggregate((dsum(disc) / count(lit(1)) * lit(1.3)).as("thr"))
      windowed
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(col("p_size") === 35)
        .join(thr, col("l_partkey") === col("ap"))
        .filter(disc > col("thr"))
        .aggregate(dsum(disc).as("excess_discount_amount"))
        .df
    }, Some(s"""
      SELECT ${dsumSql("l_extendedprice * l_discount")} AS excess_discount_amount
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS ap,
              ${dsumSql("l_extendedprice * l_discount")} / COUNT(*) * 1.3 AS thr
            FROM lineitem
            WHERE l_linestatus = 'O'
              AND l_shipdate BETWEEN TIMESTAMP '1996-01-27' AND TIMESTAMP '1996-04-26'
            GROUP BY 1) a ON l_partkey = ap
      WHERE l_linestatus = 'O'
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-27' AND TIMESTAMP '1996-04-26'
        AND p_size = 35
        AND l_extendedprice * l_discount > thr""")),

    // DS Q96 shape: time-dim count — hour/minute gates on the event
    // stream plus a demographic filter through the customer dim.
    QueryDef("q299_ds96_hour_window_count", (s, dir) => {
      Table(events(s, dir))
        .filter(hour(col("ts")) === 20, minute(col("ts")) >= 30,
          col("event_type") === "purchase")
        .join(Table(customer(s, dir)), col("user_id") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .aggregate(count(lit(1)).as("cnt"))
        .df
    }, Some("""
      SELECT COUNT(*) AS cnt
      FROM events
      JOIN customer ON user_id = c_custkey
      WHERE HOUR(ts) = 20 AND MINUTE(ts) >= 30 AND event_type = 'purchase'
        AND c_mktsegment = 'BUILDING'""")),

    // DS Q99 shape: ship-delay day-band pivot — days between order and
    // ship bucketed into five conditional counts per (warehouse prefix,
    // ship mode, lowercased call center).
    QueryDef("q300_ds99_ship_delay_bands", (s, dir) => {
      val lag = col("lag_days")
      Table(lineitem(s, dir))
        .filter(col("l_linestatus") === "O", year(col("l_shipdate")).between(1996, 1997))
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .join(Table(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(Table(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .mutate("lag_days" -> datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))),
          "w_substr" -> substring(col("s_name"), 1, 12),
          "sm_type" -> col("o_orderpriority"),
          "cc_name_lower" -> lower(col("n_name")))
        .groupBy(col("w_substr"), col("sm_type"), col("cc_name_lower"))
        .aggregate(
          count(when(lag <= 30, lit(1))).as("d30"),
          count(when(lag > 30 && lag <= 60, lit(1))).as("d31_60"),
          count(when(lag > 60 && lag <= 90, lit(1))).as("d61_90"),
          count(when(lag > 90 && lag <= 120, lit(1))).as("d91_120"),
          count(when(lag > 120, lit(1))).as("d120_plus"))
        .sort(SortKey.asc(col("w_substr")), SortKey.asc(col("sm_type")),
          SortKey.asc(col("cc_name_lower")))
        .limit(100)
        .df
    }, Some("""
      SELECT SUBSTRING(s_name, 1, 12) AS w_substr, o_orderpriority AS sm_type,
        LOWER(n_name) AS cc_name_lower,
        COUNT(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 30 THEN 1 END) AS d30,
        COUNT(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 30
          AND DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 60 THEN 1 END) AS d31_60,
        COUNT(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
          AND DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 90 THEN 1 END) AS d61_90,
        COUNT(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
          AND DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) <= 120 THEN 1 END) AS d91_120,
        COUNT(CASE WHEN DATE_DIFF('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 120 THEN 1 END) AS d120_plus
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE l_linestatus = 'O' AND YEAR(l_shipdate) BETWEEN 1996 AND 1997
      GROUP BY 1, 2, 3
      ORDER BY w_substr, sm_type, cc_name_lower
      LIMIT 100"""))
  )
}
