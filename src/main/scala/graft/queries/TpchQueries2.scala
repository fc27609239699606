package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import Tables._

/** The remaining TPC-H shapes (Q2, Q8, Q9, Q10, Q11, Q14, Q16, Q18, Q20,
  * Q21), completing the reference's primary correctness suite
  * (ibis/backends/tests/tpc/h/test_queries.py — all 22 queries vs
  * DuckDB-executed oracle SQL) adapted to the driver's trimmed schema.
  *
  * The trimmed schema has no `partsupp` table, so the (part, supplier)
  * inventory relation is DERIVED deterministically from lineitem — see
  * [[TpchQueries2.partsupp]] — and the identical CTE heads every oracle.
  * These ten exercise what the first twelve didn't: min-per-group
  * decorrelation (Q2), share-of-total conditional aggregation (Q8, Q14),
  * derived-cost joins (Q9, Q11), NOT IN over a subquery (Q16), IN over a
  * grouped HAVING subquery (Q18), nested IN chains with a correlated
  * scalar (Q20), and the EXISTS / NOT EXISTS chain (Q21).
  */
object TpchQueries2 {

  /** Derived partsupp: ps_availqty = exact decimal sum of lineitem
    * quantity, ps_supplycost = 1% of the cheapest observed line price, per
    * (partkey, suppkey). One hash aggregation over lineitem — at 100 TB
    * this shuffles once on the composite key with map-side partial
    * aggregation.
    *
    * The cost formula is min(price)*0.01 rather than min(price/quantity)
    * deliberately: prices are 2-decimal and quantities integral, so every
    * downstream product (cost*qty, cost*availqty) stays on the 4-decimal
    * grid and the DECIMAL(38,4) money casts round identically in Spark
    * (BigDecimal HALF_UP on the shortest repr) and DuckDB (scaled-double
    * rounding). A division-derived cost has an unbounded decimal tail whose
    * grid-midpoint values round differently per engine (observed: 7 rows of
    * ±0.0001 in the Q9 profit sum at sf0.01). */
  private def partsupp(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir)
    l.groupBy(l("l_partkey"), l("l_suppkey"))
      .agg(
        dsum(l("l_quantity")).as("ps_availqty"),
        (min(l("l_extendedprice")) * 0.01).as("ps_supplycost"))
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"),
        col("ps_availqty"), col("ps_supplycost"))
  }

  /** The DuckDB mirror of [[partsupp]] — prepended to every oracle. */
  private val PsCte: String = """partsupp AS (
      |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS ps_availqty,
      |    MIN(l_extendedprice) * 0.01 AS ps_supplycost
      |  FROM lineitem GROUP BY 1, 2)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Q2 shape: cheapest European supplier per qualifying part. The spec's
    // correlated MIN subquery is decorrelated into an aggregate + self-join
    // on the candidate set; the part filter is applied BEFORE the partsupp
    // join so the per-part MIN only aggregates qualifying parts (a
    // semantics-preserving pushdown the correlated form gets for free).
    QueryDef("q114_tpch2_min_cost_supplier", (s, dir) => {
      val ps = partsupp(s, dir)
      val su = supplier(s, dir); val n = nation(s, dir); val r = region(s, dir)
      val p = part(s, dir)
      val cand = Table(ps)
        .join(Table(p).filter(p("p_size") === 15 && p("p_type") === "STANDARD"),
          ps("ps_partkey") === p("p_partkey"))
        .join(Table(su), ps("ps_suppkey") === su("s_suppkey"))
        .join(Table(n), su("s_nationkey") === n("n_nationkey"))
        .join(Table(r).filter(r("r_name") === "EUROPE"), n("n_regionkey") === r("r_regionkey"))
      val minCost = cand.groupBy(ps("ps_partkey"))
        .aggregate(min(ps("ps_supplycost")).as("min_cost"))
        .rename("ps_partkey" -> "mc_partkey")
      val mc = minCost.df
      cand
        .join(minCost, ps("ps_partkey") === mc("mc_partkey") &&
          ps("ps_supplycost") === mc("min_cost"))
        .select(su("s_acctbal"), su("s_name"), n("n_name"), p("p_partkey"), p("p_name"))
        .sort(SortKey.desc(col("s_acctbal")), SortKey.asc(col("n_name")),
          SortKey.asc(col("s_name")), SortKey.asc(col("p_partkey")))
        .limit(100)
        .df
    }, Some(s"""
      WITH $PsCte,
      cand AS (
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name, ps_supplycost
        FROM partsupp
        JOIN part ON ps_partkey = p_partkey
        JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE')
      SELECT s_acctbal, s_name, n_name, p_partkey, p_name
      FROM cand
      WHERE ps_supplycost = (SELECT MIN(c2.ps_supplycost) FROM cand c2
                             WHERE c2.p_partkey = cand.p_partkey)
      ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""")),

    // Q8 shape: a nation's market share inside a region = conditional sum /
    // total sum per order-year. Two nation dimension copies (customer-side
    // for the region gate, supplier-side for the share nation).
    QueryDef("q115_tpch8_market_share", (s, dir) => {
      val p = part(s, dir); val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val su = supplier(s, dir); val r = region(s, dir)
      val n1 = nation(s, dir) // customer nation → region gate
      val n2 = nation(s, dir) // supplier nation → market share split
      Table(p).filter(p("p_type") === "ECONOMY")
        .join(Table(l), p("p_partkey") === l("l_partkey"))
        .join(Table(o).filter(o("o_orderdate").between("1995-01-01", "1996-12-31")),
          l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n1), c("c_nationkey") === n1("n_nationkey"))
        .join(Table(r).filter(r("r_name") === "AMERICA"), n1("n_regionkey") === r("r_regionkey"))
        .join(Table(su), l("l_suppkey") === su("s_suppkey"))
        .join(Table(n2), su("s_nationkey") === n2("n_nationkey"))
        .mutate(
          "o_year" -> year(o("o_orderdate")),
          "volume" -> l("l_extendedprice") * (lit(1) - l("l_discount")))
        .groupBy(col("o_year"))
        .aggregate(round(
          sum(when(n2("n_name") === "NATION_3", col("volume")).otherwise(lit(0.0))
            .cast("decimal(38,4)")).cast("double") /
            sum(col("volume").cast("decimal(38,4)")).cast("double"), 6).as("mkt_share"))
        .sort(SortKey.asc(col("o_year")))
        .df
    }, Some("""
      SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
        ROUND(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_3'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 6) AS mkt_share
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
      GROUP BY 1 ORDER BY 1""")),

    // Q9 shape: profit (revenue minus derived supply cost) by supplier
    // nation and order year, parts matched by substring.
    QueryDef("q116_tpch9_profit", (s, dir) => {
      val ps = partsupp(s, dir)
      val l = lineitem(s, dir); val p = part(s, dir); val su = supplier(s, dir)
      val n = nation(s, dir); val o = orders(s, dir)
      Table(l)
        .join(Table(p).filter(p("p_name").contains("red")), l("l_partkey") === p("p_partkey"))
        .join(Table(ps), l("l_partkey") === ps("ps_partkey") &&
          l("l_suppkey") === ps("ps_suppkey"))
        .join(Table(su), l("l_suppkey") === su("s_suppkey"))
        .join(Table(n), su("s_nationkey") === n("n_nationkey"))
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .mutate(
          "nation" -> n("n_name"),
          "o_year" -> year(o("o_orderdate")),
          "amount" -> (l("l_extendedprice") * (lit(1) - l("l_discount")) -
            ps("ps_supplycost") * l("l_quantity")))
        .groupBy(col("nation"), col("o_year"))
        .aggregate(dsum(col("amount")).as("sum_profit"))
        .sort(SortKey.asc(col("nation")), SortKey.desc(col("o_year")))
        .df
    }, Some(s"""
      WITH $PsCte
      SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
          AS DECIMAL(38,4))) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE '%red%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC""")),

    // Q10 shape: top returned-item customers in a quarter.
    QueryDef("q117_tpch10_returned_items", (s, dir) => {
      val c = customer(s, dir); val o = orders(s, dir)
      val l = lineitem(s, dir); val n = nation(s, dir)
      Table(c)
        .join(Table(o).filter(o("o_orderdate") >= lit("1995-10-01") &&
          o("o_orderdate") < lit("1996-01-01")), c("c_custkey") === o("o_custkey"))
        .join(Table(l).filter(l("l_returnflag") === "R"), o("o_orderkey") === l("l_orderkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), c("c_acctbal"), n("n_name"))
        .aggregate(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
        .selectNames("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .sort(SortKey.desc(col("revenue")), SortKey.asc(col("c_custkey")))
        .limit(20)
        .df
    }, Some("""
      SELECT c_custkey, c_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        c_acctbal, n_name
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderdate >= TIMESTAMP '1995-10-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // Q11 shape: important stock — per-part inventory value above a
    // fraction-of-total threshold (uncorrelated scalar via broadcast cross
    // join; the nation-filtered partsupp is built once and reused by both
    // the per-part aggregation and the total).
    QueryDef("q118_tpch11_important_stock", (s, dir) => {
      val ps = partsupp(s, dir)
      val su = supplier(s, dir); val n = nation(s, dir)
      val natPs = Table(ps)
        .join(Table(su), ps("ps_suppkey") === su("s_suppkey"))
        .join(Table(n).filter(n("n_name") === "NATION_15"), su("s_nationkey") === n("n_nationkey"))
        .mutate("value" -> ps("ps_supplycost") * ps("ps_availqty"))
      val grouped = natPs.groupBy(ps("ps_partkey")).aggregate(dsum(col("value")).as("value"))
      val threshold = natPs.aggregate((dsum(col("value")) * lit(0.001)).as("threshold"))
      grouped.crossJoin(threshold)
        .filter(col("value") > col("threshold"))
        .selectNames("ps_partkey", "value")
        .sort(SortKey.desc(col("value")), SortKey.asc(col("ps_partkey")))
        .df
    }, Some(s"""
      WITH $PsCte,
      natps AS (
        SELECT ps_partkey, ps_supplycost * ps_availqty AS value
        FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_15')
      SELECT ps_partkey, CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS value
      FROM natps GROUP BY ps_partkey
      HAVING CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) >
        (SELECT CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) * 0.001 FROM natps)
      ORDER BY value DESC, ps_partkey""")),

    // Q14 shape: promo revenue share in a month — conditional aggregation
    // over a part-type split.
    QueryDef("q119_tpch14_promo_revenue", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      Table(l)
        .filter(l("l_shipdate") >= lit("1996-03-01"), l("l_shipdate") < lit("1996-04-01"))
        .join(Table(p), l("l_partkey") === p("p_partkey"))
        .mutate("volume" -> l("l_extendedprice") * (lit(1) - l("l_discount")))
        .aggregate(round(lit(100.0) *
          sum(when(p("p_type") === "PROMO", col("volume")).otherwise(lit(0.0))
            .cast("decimal(38,4)")).cast("double") /
          sum(col("volume").cast("decimal(38,4)")).cast("double"), 6).as("promo_revenue"))
        .df
    }, Some("""
      SELECT ROUND(100.0 *
        CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE), 6) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""")),

    // Q16 shape: distinct supplier counts per (brand, type, size) with a
    // two-sided substring exclusion and a NOT IN subquery (planned as a
    // broadcast null-aware anti join — asserted for the same shape in
    // PlanQualitySpec).
    QueryDef("q120_tpch16_supplier_cnt", (s, dir) => {
      val ps = partsupp(s, dir)
      val p = part(s, dir); val su = supplier(s, dir)
      Table(ps)
        .join(Table(p).filter(p("p_brand") =!= "Brand#5" &&
          !p("p_name").like("%l%e%") &&
          p("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
          ps("ps_partkey") === p("p_partkey"))
        .notInSubquery(ps("ps_suppkey"),
          su.filter(su("s_acctbal") < 0.0).select(su("s_suppkey")))
        .groupBy(p("p_brand"), p("p_type"), p("p_size"))
        .aggregate(countDistinct(ps("ps_suppkey")).as("supplier_cnt"))
        .sort(SortKey.desc(col("supplier_cnt")), SortKey.asc(col("p_brand")),
          SortKey.asc(col("p_type")), SortKey.asc(col("p_size")))
        .df
    }, Some(s"""
      WITH $PsCte
      SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
      FROM partsupp JOIN part ON p_partkey = ps_partkey
      WHERE p_brand <> 'Brand#5' AND p_name NOT LIKE '%l%e%'
        AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // Q18 shape: large-volume orders — IN over a grouped HAVING subquery
    // (left-semi join against the re-aggregated key set).
    QueryDef("q121_tpch18_large_volume", (s, dir) => {
      val c = customer(s, dir); val o = orders(s, dir); val l = lineitem(s, dir)
      val big = lineitem(s, dir)
      val bigOrders = Table(big).groupBy(big("l_orderkey"))
        .aggregate(dsum(big("l_quantity")).as("tq"))
        .filter(col("tq") > 300.0)
        .df.select("l_orderkey")
      Table(o)
        .inSubquery(o("o_orderkey"), bigOrders)
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(l), o("o_orderkey") === l("l_orderkey"))
        .groupBy(c("c_name"), c("c_custkey"), o("o_orderkey"), o("o_orderdate"), o("o_totalprice"))
        .aggregate(dsum(l("l_quantity")).as("total_qty"))
        .sort(SortKey.desc(col("o_totalprice")), SortKey.asc(col("o_orderdate")),
          SortKey.asc(col("o_orderkey")))
        .limit(100)
        .df
    }, Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) > 300.0)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""")),

    // Q20 shape: suppliers of promoted parts with surplus stock — nested IN
    // chains with a correlated scalar subquery, decorrelated into a
    // grouped aggregate + inner join (null comparison → row drops, same as
    // the spec's NULL-fails-comparison semantics).
    QueryDef("q122_tpch20_part_promotion", (s, dir) => {
      val ps = partsupp(s, dir)
      val p = part(s, dir); val su = supplier(s, dir); val n = nation(s, dir)
      val l = lineitem(s, dir)
      val shipped = Table(l)
        .filter(l("l_shipdate") >= lit("1996-01-01"), l("l_shipdate") < lit("1997-01-01"))
        .groupBy(l("l_partkey"), l("l_suppkey"))
        .aggregate((dsum(l("l_quantity")) * lit(0.5)).as("half_qty"))
        .df
      val qualifying = Table(ps)
        .inSubquery(ps("ps_partkey"), p.filter(p("p_name").like("red%")).select(p("p_partkey")))
        .join(Table(shipped), ps("ps_partkey") === shipped("l_partkey") &&
          ps("ps_suppkey") === shipped("l_suppkey"))
        .filter(ps("ps_availqty") > shipped("half_qty"))
        .df.select(ps("ps_suppkey"))
      Table(su)
        .join(Table(n).filter(n("n_name") === "NATION_19"), su("s_nationkey") === n("n_nationkey"))
        .inSubquery(su("s_suppkey"), qualifying)
        .selectNames("s_name", "s_acctbal")
        .sort(SortKey.asc(col("s_name")))
        .df
    }, Some(s"""
      WITH $PsCte
      SELECT s_name, s_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_19' AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND ps_availqty > (
            SELECT CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,4))) AS DOUBLE) * 0.5
            FROM lineitem l
            WHERE l.l_partkey = ps_partkey AND l.l_suppkey = ps_suppkey
              AND l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'))
      ORDER BY s_name""")),

    // Q21 shape: suppliers who kept finished orders waiting. The trimmed
    // schema has no commit/receipt dates, so "late" is shipped more than 90
    // days after the order date — preserving the spec's EXISTS (another
    // supplier on the order) AND NOT EXISTS (another LATE supplier on the
    // order) chain: a left-semi then a left-anti join on the order key with
    // non-equi residuals.
    QueryDef("q123_tpch21_waiting_suppliers", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val su = supplier(s, dir); val n = nation(s, dir)
      val l2 = lineitem(s, dir)
      val l3 = lineitem(s, dir)
      Table(l)
        .join(Table(o).filter(o("o_orderstatus") === "F"), l("l_orderkey") === o("o_orderkey"))
        .filter(l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .join(Table(su), l("l_suppkey") === su("s_suppkey"))
        .join(Table(n).filter(n("n_name") === "NATION_19"), su("s_nationkey") === n("n_nationkey"))
        .join(Table(l2), l("l_orderkey") === l2("l_orderkey") &&
          l2("l_suppkey") =!= l("l_suppkey"), how = "semi")
        .join(Table(l3), l("l_orderkey") === l3("l_orderkey") &&
          l3("l_suppkey") =!= l("l_suppkey") &&
          l3("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAYS"), how = "anti")
        .groupBy(su("s_name"))
        .count("numwait")
        .sort(SortKey.desc(col("numwait")), SortKey.asc(col("s_name")))
        .limit(100)
        .df
    }, Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM lineitem l1
      JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_19'
      WHERE l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""))
  )
}
