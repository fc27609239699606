package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import Tables._

/** TPC-DS-shaped corpus, round 3 second batch (q251-q275) — 25 more of the
  * reference's 99-query DS suite (ibis/backends/tests/tpc/ds/
  * test_queries.py; SQL in tpc/queries/duckdb/ds/), adapted to the trimmed
  * star schema like TpcdsQueries/TpcdsQueries2.
  *
  * This batch covers the shapes the first 50 didn't: the ds14 three-channel
  * INTERSECT + scalar-average gate, ds24's reused-CTE HAVING-over-scalar,
  * the correlated per-group-average family (ds30/ds32 as group-avg joins —
  * the decorrelated plan Spark would produce anyway), ds44's twin
  * asc/desc rank join, ds39's coefficient-of-variation period pairs,
  * ds57's lag/lead neighbors over a windowed monthly aggregate, ds64's
  * HAVING-gated CTE into a two-year self-join, ds66's 12-month conditional
  * pivot, ds70's rank-within-rollup-parent with an IN-subquery top-k
  * pre-filter, ds75's UNION-DISTINCT year-over-year decline, ds77's
  * per-channel FULL OUTER sales/returns matrix, and ds94's
  * multi-supplier-no-returns order profile.
  *
  * Channel mapping follows TpcdsQueries2: one fact table, so "store vs web
  * vs catalog" become disjoint slices (l_linestatus F/O, l_returnflag R)
  * that exercise the same plan shapes. Money math follows the
  * decimal(38,4) policy (Tables.dsum/dmean, decimal window sums); every
  * query is DuckDB-oracle-checked.
  */
object TpcdsQueries3 {

  private val rev = () => col("l_extendedprice") * (lit(1) - col("l_discount"))
  private val REV_SQL = "l_extendedprice * (1 - l_discount)"
  private def dsumSql(x: String) = s"CAST(SUM(CAST($x AS DECIMAL(38,4))) AS DOUBLE)"
  private def dmeanSql(x: String) = s"ROUND(${dsumSql(x)} / COUNT($x), 6)"

  /** Decimal-exact windowed mean (same policy as TpcdsQueries2.wmean). */
  private def wmean(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    round(sum(c.cast("decimal(38,4)")).over(w).cast("double") / count(c).over(w), 6)

  val defs: Seq[QueryDef] = Seq(

    // DS Q14 shape: cross_items = the (brand, type) pairs present in ALL
    // three channels (two INTERSECTs over distinct projections), avg_sales
    // = a scalar average over the UNION ALL of the channels, final agg
    // gated per-group on that scalar (HAVING sales > avg_sales).
    QueryDef("q251_ds14_cross_channel_intersect", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val pl = Table(l)
        .filter(year(col("l_shipdate")).between(1996, 1998))
        .join(Table(p), col("l_partkey") === p("p_partkey"))
      def slice(pred: org.apache.spark.sql.Column) = pl.filter(pred)
      val chF = slice(col("l_linestatus") === "F")
      val chO = slice(col("l_linestatus") === "O")
      val chR = slice(col("l_returnflag") === "R")
      val cross = chF.select(col("p_brand"), col("p_type"))
        .intersect(chO.select(col("p_brand"), col("p_type")))
        .intersect(chR.select(col("p_brand"), col("p_type")))
      val avgSales = chF.select((col("l_quantity") * col("p_retailprice")).as("v"))
        .union(chO.select((col("l_quantity") * col("p_retailprice")).as("v")))
        .union(chR.select((col("l_quantity") * col("p_retailprice")).as("v")))
        .aggregate(dmean(col("v")).as("average_sales"))
      chF.joinOn(cross, Seq("p_brand" -> "p_brand", "p_type" -> "p_type"), how = "semi")
        .groupBy(col("p_brand"), col("p_type"))
        .aggregate(dsum(col("l_quantity") * col("p_retailprice")).as("sales"),
          count(lit(1)).as("cnt"))
        .crossJoin(avgSales)
        .filter(col("sales") > col("average_sales"))
        .dropColumns("average_sales")
        .sort(SortKey.asc(col("p_brand")), SortKey.asc(col("p_type")))
        .limit(100)
        .df
    }, Some(s"""
      WITH pl AS (
        SELECT p_brand, p_type, l_linestatus, l_returnflag, l_quantity, p_retailprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE YEAR(l_shipdate) BETWEEN 1996 AND 1998),
      cross_items AS (
        SELECT p_brand, p_type FROM pl WHERE l_linestatus = 'F'
        INTERSECT SELECT p_brand, p_type FROM pl WHERE l_linestatus = 'O'
        INTERSECT SELECT p_brand, p_type FROM pl WHERE l_returnflag = 'R'),
      avg_sales AS (
        SELECT ${dmeanSql("v")} AS average_sales FROM (
          SELECT l_quantity * p_retailprice AS v FROM pl WHERE l_linestatus = 'F'
          UNION ALL SELECT l_quantity * p_retailprice FROM pl WHERE l_linestatus = 'O'
          UNION ALL SELECT l_quantity * p_retailprice FROM pl WHERE l_returnflag = 'R'))
      SELECT p_brand, p_type, sales, cnt FROM (
        SELECT pl.p_brand, pl.p_type,
          ${dsumSql("l_quantity * p_retailprice")} AS sales, COUNT(*) AS cnt
        FROM pl JOIN cross_items ci ON pl.p_brand = ci.p_brand AND pl.p_type = ci.p_type
        WHERE l_linestatus = 'F' GROUP BY 1, 2)
      WHERE sales > (SELECT average_sales FROM avg_sales)
      ORDER BY p_brand, p_type LIMIT 100""")),

    // DS Q24 shape: a reused aggregate CTE (cached once, read twice) with
    // the outer HAVING gated on a scalar fraction of the CTE's own average.
    QueryDef("q252_ds24_paid_above_share", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir); val p = part(s, dir)
      val ssales = Table(l)
        .filter(col("l_returnflag") === "R")
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .join(Table(n), col("c_nationkey") === n("n_nationkey"))
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .mutate("color" -> substring_index(col("p_name"), " ", 1))
        .groupBy(col("c_name"), col("n_name"), col("color"))
        .aggregate(dsum(rev()).as("netpaid"))
        .cache()
      val thr = ssales.aggregate((lit(0.05) * dmean(col("netpaid"))).as("thr"))
      ssales.filter(col("color") === "red")
        .groupBy(col("c_name"), col("n_name"))
        .aggregate(dsum(col("netpaid")).as("paid"))
        .crossJoin(thr)
        .filter(col("paid") > col("thr"))
        .dropColumns("thr")
        .sort(SortKey.asc(col("c_name")), SortKey.asc(col("n_name")))
        .df
    }, Some(s"""
      WITH ssales AS (
        SELECT c_name, n_name, SPLIT_PART(p_name, ' ', 1) AS color,
          ${dsumSql(REV_SQL)} AS netpaid
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3)
      SELECT c_name, n_name, ${dsumSql("netpaid")} AS paid
      FROM ssales WHERE color = 'red'
      GROUP BY c_name, n_name
      HAVING ${dsumSql("netpaid")} > (SELECT 0.05 * ${dmeanSql("netpaid")} FROM ssales)
      ORDER BY c_name, n_name""")),

    // DS Q30 shape: customers whose returned value exceeds 1.2x their
    // nation's average return — the correlated per-group-average subquery,
    // expressed as the decorrelated group-avg join Spark would plan.
    QueryDef("q253_ds30_above_nation_avg_returns", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val ctr = Table(l)
        .filter(col("l_returnflag") === "R")
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_nationkey"))
        .aggregate(dsum(rev()).as("ctr_total_return"))
      val avgByNation = ctr.groupBy(col("c_nationkey"))
        .aggregate((lit(1.2) * dmean(col("ctr_total_return"))).as("thr"))
        .rename("c_nationkey" -> "nk")
      ctr.join(avgByNation, col("c_nationkey") === col("nk"))
        .filter(col("ctr_total_return") > col("thr"))
        .join(Table(n).filter(n("n_name") === "NATION_7"),
          col("c_nationkey") === n("n_nationkey"))
        .join(Table(customer(s, dir)).rename("c_custkey" -> "ck",
          "c_nationkey" -> "cnk2"), col("c_custkey") === col("ck"))
        .selectNames("c_custkey", "c_name", "c_acctbal", "ctr_total_return")
        .sort(SortKey.asc(col("c_custkey")))
        .limit(100)
        .df
    }, Some(s"""
      WITH ctr AS (
        SELECT c_custkey, c_nationkey, ${dsumSql(REV_SQL)} AS ctr_total_return
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2),
      nav AS (
        SELECT c_nationkey AS nk, 1.2 * ${dmeanSql("ctr_total_return")} AS thr
        FROM ctr GROUP BY 1)
      SELECT ctr.c_custkey, cu.c_name, cu.c_acctbal, ctr_total_return
      FROM ctr
      JOIN nav ON ctr.c_nationkey = nav.nk
      JOIN nation ON ctr.c_nationkey = n_nationkey AND n_name = 'NATION_7'
      JOIN customer cu ON ctr.c_custkey = cu.c_custkey
      WHERE ctr_total_return > thr
      ORDER BY ctr.c_custkey LIMIT 100""")),

    // DS Q32 shape: "excess discount amount" — rows whose discount amount
    // beats 1.3x the per-part average inside a date window, summed to one
    // scalar (group-avg join against the same windowed slice).
    QueryDef("q254_ds32_excess_discount", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val win = Table(l)
        .filter(col("l_shipdate") >= lit("1996-01-01"),
          col("l_shipdate") < lit("1996-04-01"))
        .join(Table(p).filter(p("p_size") === 7), col("l_partkey") === p("p_partkey"),
          how = "semi")
        .mutate("damt" -> col("l_extendedprice") * col("l_discount"))
      val avgByPart = win.groupBy(col("l_partkey"))
        .aggregate((lit(1.3) * dmean(col("damt"))).as("thr"))
        .rename("l_partkey" -> "pk")
      win.join(avgByPart, col("l_partkey") === col("pk"))
        .filter(col("damt") > col("thr"))
        .aggregate(dsum(col("damt")).as("excess_discount"))
        .df
    }, Some(s"""
      WITH win AS (
        SELECT l_partkey, l_extendedprice * l_discount AS damt
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 7)),
      pav AS (SELECT l_partkey AS pk, 1.3 * ${dmeanSql("damt")} AS thr
              FROM win GROUP BY 1)
      SELECT ${dsumSql("damt")} AS excess_discount
      FROM win JOIN pav ON l_partkey = pk
      WHERE damt > thr""")),

    // DS Q34 shape: "frequent buyer trips" — orders with a line count in a
    // band, joined back to the customer for display.
    QueryDef("q255_ds34_frequent_trips", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .join(Table(o).filter(o("o_orderstatus") === "F"),
          col("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_custkey"))
        .aggregate(count(lit(1)).as("cnt"))
        .filter(col("cnt").between(5, 7))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .selectNames("c_name", "c_custkey", "o_orderkey", "cnt")
        .sort(SortKey.desc(col("cnt")), SortKey.asc(col("c_custkey")),
          SortKey.asc(col("o_orderkey")))
        .limit(100)
        .df
    }, Some("""
      SELECT c_name, c_custkey, o_orderkey, cnt FROM (
        SELECT o_orderkey, o_custkey, COUNT(*) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1, 2) t
      JOIN customer ON o_custkey = c_custkey
      WHERE cnt BETWEEN 5 AND 7
      ORDER BY cnt DESC, c_custkey, o_orderkey LIMIT 100""")),

    // DS Q37 shape: "low-stock items" — parts in a price/size band whose
    // windowed demand lands inside a quantity band (HAVING BETWEEN).
    QueryDef("q256_ds37_demand_band", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      Table(p)
        .filter(p("p_retailprice").between(902, 918),
          p("p_size").isin(10, 11, 12, 13, 14))
        .join(Table(l)
          .filter(col("l_shipdate") >= lit("1996-01-01"),
            col("l_shipdate") < lit("1996-07-01")),
          p("p_partkey") === col("l_partkey"))
        .groupBy(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .aggregate(sum(col("l_quantity")).as("qty"))
        .filter(col("qty").between(1, 500))
        .selectNames("p_partkey", "p_name", "p_retailprice")
        .sort(SortKey.asc(col("p_partkey")))
        .limit(100)
        .df
    }, Some("""
      SELECT p_partkey, p_name, p_retailprice FROM (
        SELECT p_partkey, p_name, p_retailprice, SUM(l_quantity) AS qty
        FROM part JOIN lineitem ON p_partkey = l_partkey
        WHERE p_retailprice BETWEEN 902 AND 918
          AND p_size IN (10, 11, 12, 13, 14)
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-07-01'
        GROUP BY 1, 2, 3) t
      WHERE qty BETWEEN 1 AND 500
      ORDER BY p_partkey LIMIT 100""")),

    // DS Q39 shape: coefficient-of-variation pairs — per (part, month)
    // mean/stdev of quantity, kept where cov passes a bar, self-joined
    // month-to-next-month so both periods are "volatile".
    QueryDef("q257_ds39_cov_pairs", (s, dir) => {
      val l = lineitem(s, dir)
      val stats = Table(l)
        .filter(year(col("l_shipdate")) === 1996,
          month(col("l_shipdate")).isin(1, 2))
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), month(col("l_shipdate")).cast("int").as("mo"))
        .aggregate(avg(col("l_quantity")).as("mean"),
          stddev_samp(col("l_quantity")).as("sd"))
        .filter(col("sd").isNotNull, col("sd") / col("mean") >= 0.5)
        .mutate("cov" -> round(col("sd") / col("mean"), 4))
      val m1 = stats.filter(col("mo") === 1)
        .select(col("p_brand").as("pk1"), col("cov").as("cov1"))
      val m2 = stats.filter(col("mo") === 2)
        .select(col("p_brand").as("pk2"), col("cov").as("cov2"))
      m1.join(m2, col("pk1") === col("pk2"))
        .selectNames("pk1", "cov1", "cov2")
        .sort(SortKey.asc(col("pk1")))
        .limit(100)
        .df
    }, Some("""
      WITH stats AS (
        SELECT p_brand, CAST(MONTH(l_shipdate) AS INT) AS mo,
          AVG(l_quantity) AS mean, STDDEV_SAMP(l_quantity) AS sd
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE YEAR(l_shipdate) = 1996 AND MONTH(l_shipdate) IN (1, 2)
        GROUP BY 1, 2),
      v AS (
        SELECT p_brand, mo, ROUND(sd / mean, 4) AS cov FROM stats
        WHERE sd IS NOT NULL AND sd / mean >= 0.5)
      SELECT m1.p_brand AS pk1, m1.cov AS cov1, m2.cov AS cov2
      FROM v m1 JOIN v m2 ON m1.p_brand = m2.p_brand
      WHERE m1.mo = 1 AND m2.mo = 2
      ORDER BY pk1 LIMIT 100""")),

    // DS Q44 shape: best/worst performers — the same HAVING-gated per-part
    // average ranked ascending AND descending, the two rank lists joined on
    // rank position, each side resolving its part name.
    QueryDef("q258_ds44_best_worst", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val slice = Table(l).filter(col("l_returnflag") === "A")
      val perPart = slice.groupBy(col("l_partkey"))
        .aggregate(dmean(rev()).as("rank_col"))
      val bar = slice.aggregate((lit(0.9) * dmean(rev())).as("bar"))
      val gated = perPart.crossJoin(bar).filter(col("rank_col") > col("bar"))
      val asc = gated
        .mutate("rnk" -> rank().over(Window.orderBy(col("rank_col").asc, col("l_partkey").asc)))
        .filter(col("rnk") < 11)
        .select(col("rnk"), col("l_partkey").as("best_pk"))
      val desc = gated
        .mutate("rnk" -> rank().over(Window.orderBy(col("rank_col").desc, col("l_partkey").desc)))
        .filter(col("rnk") < 11)
        .select(col("rnk").as("rnk2"), col("l_partkey").as("worst_pk"))
      asc.join(desc, col("rnk") === col("rnk2"))
        .join(Table(p).select(p("p_partkey").as("pk1"), p("p_name").as("best_performing")),
          col("best_pk") === col("pk1"))
        .join(Table(part(s, dir)).select(col("p_partkey").as("pk2"), col("p_name").as("worst_performing")),
          col("worst_pk") === col("pk2"))
        .selectNames("rnk", "best_performing", "worst_performing")
        .sort(SortKey.asc(col("rnk")), SortKey.asc(col("best_performing")),
          SortKey.asc(col("worst_performing")))
        .limit(100)
        .df
    }, Some(s"""
      WITH gated AS (
        SELECT l_partkey, ${dmeanSql(REV_SQL)} AS rank_col
        FROM lineitem WHERE l_returnflag = 'A'
        GROUP BY 1
        HAVING ${dmeanSql(REV_SQL)} >
          (SELECT 0.9 * ${dmeanSql(REV_SQL)} FROM lineitem WHERE l_returnflag = 'A')),
      a AS (SELECT * FROM (
        SELECT CAST(RANK() OVER (ORDER BY rank_col ASC, l_partkey ASC) AS INT) AS rnk,
          l_partkey FROM gated) WHERE rnk < 11),
      d AS (SELECT * FROM (
        SELECT CAST(RANK() OVER (ORDER BY rank_col DESC, l_partkey DESC) AS INT) AS rnk,
          l_partkey FROM gated) WHERE rnk < 11)
      SELECT a.rnk, p1.p_name AS best_performing, p2.p_name AS worst_performing
      FROM a JOIN d ON a.rnk = d.rnk
      JOIN part p1 ON a.l_partkey = p1.p_partkey
      JOIN part p2 ON d.l_partkey = p2.p_partkey
      ORDER BY a.rnk, best_performing, worst_performing LIMIT 100""")),

    // DS Q48 shape: one scalar quantity sum under an OR-of-ANDs predicate
    // spanning three tables (segment x order-value band x quantity band).
    QueryDef("q259_ds48_ored_bands_qty", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .filter(
          (col("c_mktsegment") === "BUILDING" &&
            col("o_totalprice").between(1000, 150000) &&
            col("l_quantity").between(1, 20)) ||
          (col("c_mktsegment") === "MACHINERY" &&
            col("o_totalprice").between(50000, 300000) &&
            col("l_quantity").between(10, 30)) ||
          (col("c_mktsegment") === "FURNITURE" &&
            col("o_totalprice").between(100000, 500000) &&
            col("l_quantity").between(20, 50)))
        .aggregate(sum(col("l_quantity")).as("qty"))
        .df
    }, Some("""
      SELECT SUM(l_quantity) AS qty
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE (c_mktsegment = 'BUILDING' AND o_totalprice BETWEEN 1000 AND 150000
             AND l_quantity BETWEEN 1 AND 20)
         OR (c_mktsegment = 'MACHINERY' AND o_totalprice BETWEEN 50000 AND 300000
             AND l_quantity BETWEEN 10 AND 30)
         OR (c_mktsegment = 'FURNITURE' AND o_totalprice BETWEEN 100000 AND 500000
             AND l_quantity BETWEEN 20 AND 50)""")),

    // DS Q50 shape: order-to-ship latency histogram per supplier nation —
    // five conditional counts over a datediff bucket.
    QueryDef("q260_ds50_latency_histogram", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val su = supplier(s, dir); val n = nation(s, dir)
      val days = datediff(col("l_shipdate"), col("o_orderdate"))
      def bucket(pred: org.apache.spark.sql.Column) =
        sum(when(pred, 1).otherwise(0))
      Table(l)
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(su), col("l_suppkey") === su("s_suppkey"))
        .join(Table(n), su("s_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .aggregate(
          bucket(days <= 30).as("d30"),
          bucket(days > 30 && days <= 60).as("d60"),
          bucket(days > 60 && days <= 90).as("d90"),
          bucket(days > 90 && days <= 120).as("d120"),
          bucket(days > 120).as("dmore"))
        .sort(SortKey.asc(col("n_name")))
        .df
    }, Some("""
      SELECT n_name,
        CAST(SUM(CASE WHEN dd <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        CAST(SUM(CASE WHEN dd > 30 AND dd <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        CAST(SUM(CASE WHEN dd > 60 AND dd <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
        CAST(SUM(CASE WHEN dd > 90 AND dd <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
        CAST(SUM(CASE WHEN dd > 120 THEN 1 ELSE 0 END) AS BIGINT) AS dmore
      FROM (
        SELECT n_name, DATE_DIFF('day', o_orderdate, l_shipdate) AS dd
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey) t
      GROUP BY n_name ORDER BY n_name""")),

    // DS Q52/Q55 shape: brand monthly revenue — the light star-join
    // aggregate ordered by revenue.
    QueryDef("q261_ds52_brand_monthly_rev", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      Table(l)
        .filter(year(col("l_shipdate")) === 1996)
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .groupBy(month(col("l_shipdate")).cast("int").as("mo"), col("p_brand"))
        .aggregate(dsum(rev()).as("ext_price"))
        .sort(SortKey.desc(col("ext_price")), SortKey.asc(col("mo")),
          SortKey.asc(col("p_brand")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT CAST(MONTH(l_shipdate) AS INT) AS mo, p_brand,
        ${dsumSql(REV_SQL)} AS ext_price
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE YEAR(l_shipdate) = 1996
      GROUP BY 1, 2
      ORDER BY ext_price DESC, mo, p_brand LIMIT 100""")),

    // DS Q53/Q63 shape: quarterly revenue per brand vs the brand's yearly
    // average (decimal-exact window mean), keeping quarters that deviate
    // more than 10%.
    QueryDef("q262_ds53_quarterly_deviation", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val q = Table(l)
        .filter(year(col("l_shipdate")) === 1996)
        .join(Table(p).filter(p("p_type").isin("PROMO", "STANDARD", "ECONOMY")),
          col("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), quarter(col("l_shipdate")).cast("int").as("qtr"))
        .aggregate(dsum(rev()).as("sum_sales"))
      val w = Window.partitionBy(col("p_brand"))
      q.mutate("avg_quarterly" -> wmean(col("sum_sales"), w))
        .filter(col("avg_quarterly") > 0,
          abs(col("sum_sales") - col("avg_quarterly")) / col("avg_quarterly") > lit(0.1))
        .sort(SortKey.asc(col("p_brand")), SortKey.asc(col("qtr")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT * FROM (
        SELECT p_brand, qtr, sum_sales,
          ROUND(CAST(SUM(CAST(sum_sales AS DECIMAL(38,4))) OVER (PARTITION BY p_brand) AS DOUBLE)
            / COUNT(sum_sales) OVER (PARTITION BY p_brand), 6) AS avg_quarterly
        FROM (
          SELECT p_brand, CAST(QUARTER(l_shipdate) AS INT) AS qtr,
            ${dsumSql(REV_SQL)} AS sum_sales
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE YEAR(l_shipdate) = 1996
            AND p_type IN ('PROMO', 'STANDARD', 'ECONOMY')
          GROUP BY 1, 2) q) v
      WHERE avg_quarterly > 0
        AND ABS(sum_sales - avg_quarterly) / avg_quarterly > 0.1
      ORDER BY p_brand, qtr LIMIT 100""")),

    // DS Q57 shape: monthly sums with the yearly window average AND the
    // lag/lead month neighbors (the reference SQL self-joins v1 three ways
    // on rn; lag/lead over the same window is the idiomatic Spark plan —
    // one shuffle instead of three).
    QueryDef("q263_ds57_monthly_dev_neighbors", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val inWin = (year(col("l_shipdate")) === 1996) ||
        (year(col("l_shipdate")) === 1995 && month(col("l_shipdate")) === 12) ||
        (year(col("l_shipdate")) === 1997 && month(col("l_shipdate")) === 1)
      val v1 = Table(l)
        .filter(inWin)
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .groupBy(col("p_type"), year(col("l_shipdate")).cast("int").as("yr"),
          month(col("l_shipdate")).cast("int").as("mo"))
        .aggregate(dsum(rev()).as("sum_sales"))
      val wAvg = Window.partitionBy(col("p_type"), col("yr"))
      val wSeq = Window.partitionBy(col("p_type")).orderBy(col("yr"), col("mo"))
      v1.mutate(
          "avg_monthly" -> wmean(col("sum_sales"), wAvg),
          "psum" -> lag(col("sum_sales"), 1).over(wSeq),
          "nsum" -> lead(col("sum_sales"), 1).over(wSeq))
        .filter(col("yr") === 1996, col("avg_monthly") > 0,
          abs(col("sum_sales") - col("avg_monthly")) / col("avg_monthly") > lit(0.1))
        .sort(SortKey.asc(round(col("sum_sales") - col("avg_monthly"), 4)),
          SortKey.asc(col("p_type")), SortKey.asc(col("mo")))
        .limit(100)
        .df
    }, Some(s"""
      WITH v1 AS (
        SELECT p_type, CAST(YEAR(l_shipdate) AS INT) AS yr,
          CAST(MONTH(l_shipdate) AS INT) AS mo, ${dsumSql(REV_SQL)} AS sum_sales
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE YEAR(l_shipdate) = 1996
           OR (YEAR(l_shipdate) = 1995 AND MONTH(l_shipdate) = 12)
           OR (YEAR(l_shipdate) = 1997 AND MONTH(l_shipdate) = 1)
        GROUP BY 1, 2, 3),
      v2 AS (
        SELECT p_type, yr, mo, sum_sales,
          ROUND(CAST(SUM(CAST(sum_sales AS DECIMAL(38,4))) OVER (PARTITION BY p_type, yr) AS DOUBLE)
            / COUNT(sum_sales) OVER (PARTITION BY p_type, yr), 6) AS avg_monthly,
          LAG(sum_sales) OVER (PARTITION BY p_type ORDER BY yr, mo) AS psum,
          LEAD(sum_sales) OVER (PARTITION BY p_type ORDER BY yr, mo) AS nsum
        FROM v1)
      SELECT * FROM v2
      WHERE yr = 1996 AND avg_monthly > 0
        AND ABS(sum_sales - avg_monthly) / avg_monthly > 0.1
      ORDER BY ROUND(sum_sales - avg_monthly, 4), p_type, mo LIMIT 100""")),

    // DS Q60 shape: an IN-subquery item list feeding three channel slices,
    // UNION ALL'd and re-aggregated per item.
    QueryDef("q264_ds60_itemlist_channels", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val promo = Table(p).filter(p("p_type") === "PROMO").df.select(col("p_partkey"))
      def chan(pred: org.apache.spark.sql.Column) = Table(lineitem(s, dir))
        .filter(pred)
        .inSubquery(col("l_partkey"), promo)
        .groupBy(col("l_partkey"))
        .aggregate(dsum(rev()).as("total"))
      chan(col("l_linestatus") === "F")
        .union(chan(col("l_linestatus") === "O"))
        .union(chan(col("l_returnflag") === "R"))
        .groupBy(col("l_partkey"))
        .aggregate(dsum(col("total")).as("total_sales"))
        .sort(SortKey.desc(col("total_sales")), SortKey.asc(col("l_partkey")))
        .limit(100)
        .df
    }, Some(s"""
      WITH promo AS (SELECT p_partkey FROM part WHERE p_type = 'PROMO'),
      ch AS (
        SELECT l_partkey, ${dsumSql(REV_SQL)} AS total FROM lineitem
        WHERE l_linestatus = 'F' AND l_partkey IN (SELECT p_partkey FROM promo)
        GROUP BY 1
        UNION ALL
        SELECT l_partkey, ${dsumSql(REV_SQL)} FROM lineitem
        WHERE l_linestatus = 'O' AND l_partkey IN (SELECT p_partkey FROM promo)
        GROUP BY 1
        UNION ALL
        SELECT l_partkey, ${dsumSql(REV_SQL)} FROM lineitem
        WHERE l_returnflag = 'R' AND l_partkey IN (SELECT p_partkey FROM promo)
        GROUP BY 1)
      SELECT l_partkey, ${dsumSql("total")} AS total_sales
      FROM ch GROUP BY 1
      ORDER BY total_sales DESC, l_partkey LIMIT 100""")),

    // DS Q61 shape: promotional-to-total ratio — two independent one-row
    // aggregates over the same slice, cross-joined into a percentage.
    QueryDef("q265_ds61_promo_ratio", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val p = part(s, dir)
      def slice() = Table(lineitem(s, dir))
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .join(Table(customer(s, dir)).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .join(Table(part(s, dir)).filter(col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
        .filter(year(col("o_orderdate")) === 1996)
      val promo = slice().filter(col("o_orderpriority") === "1-URGENT")
        .aggregate(dsum(rev()).as("promotions"))
      val total = slice().aggregate(dsum(rev()).as("total"))
      promo.crossJoin(total)
        .mutate("perc_promotions" -> round(col("promotions") / col("total") * 100, 6))
        .df
    }, Some(s"""
      WITH sl AS (
        SELECT ${REV_SQL} AS r, o_orderpriority
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN part ON l_partkey = p_partkey
        WHERE c_mktsegment = 'BUILDING' AND p_type = 'STANDARD'
          AND YEAR(o_orderdate) = 1996)
      SELECT promotions, total, ROUND(promotions / total * 100, 6) AS perc_promotions
      FROM (SELECT ${dsumSql("r")} AS promotions FROM sl
            WHERE o_orderpriority = '1-URGENT') p,
           (SELECT ${dsumSql("r")} AS total FROM sl) t""")),

    // DS Q64 shape: a HAVING-gated CTE (parts whose returned revenue is
    // small vs sales) joined into per-(part, year) stats, self-joined
    // across consecutive years keeping pairs where activity didn't grow.
    QueryDef("q266_ds64_repeat_purchase_years", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val p = part(s, dir)
      val csUi = Table(l)
        .groupBy(col("l_partkey"))
        .aggregate(dsum(col("l_extendedprice")).as("sale"),
          dsum(when(col("l_returnflag") === "R",
            col("l_extendedprice") * col("l_discount"))).as("refund"))
        .filter(col("refund").isNotNull, col("sale") > col("refund") * 15)
        .select(col("l_partkey").as("ui_pk"))
      val cs = Table(lineitem(s, dir))
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .joinOn(csUi.rename("ui_pk" -> "l_partkey"), Seq("l_partkey" -> "l_partkey"),
          how = "semi")
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .groupBy(col("p_name"), col("l_partkey"),
          year(col("o_orderdate")).cast("int").as("syear"))
        .aggregate(count(lit(1)).as("cnt"),
          dsum(col("l_extendedprice")).as("s1"),
          dsum(rev()).as("s2"))
      val y96 = cs.filter(col("syear") === 1996)
        .select(col("p_name"), col("l_partkey").as("pk"), col("cnt").as("cnt96"),
          col("s1").as("s1_96"), col("s2").as("s2_96"))
      val y97 = cs.filter(col("syear") === 1997)
        .select(col("l_partkey").as("pk2"), col("cnt").as("cnt97"),
          col("s1").as("s1_97"), col("s2").as("s2_97"))
      y96.join(y97, col("pk") === col("pk2"))
        .filter(col("cnt97") <= col("cnt96"))
        .selectNames("p_name", "pk", "cnt96", "s1_96", "s2_96", "cnt97", "s1_97", "s2_97")
        .sort(SortKey.asc(col("p_name")), SortKey.asc(col("pk")))
        .limit(100)
        .df
    }, Some(s"""
      WITH cs_ui AS (
        SELECT l_partkey FROM lineitem
        GROUP BY 1
        HAVING ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * l_discount END")}
                 IS NOT NULL
           AND ${dsumSql("l_extendedprice")} >
               ${dsumSql("CASE WHEN l_returnflag = 'R' THEN l_extendedprice * l_discount END")} * 15),
      cs AS (
        SELECT p_name, l_partkey, CAST(YEAR(o_orderdate) AS INT) AS syear,
          COUNT(*) AS cnt, ${dsumSql("l_extendedprice")} AS s1, ${dsumSql(REV_SQL)} AS s2
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_partkey IN (SELECT l_partkey FROM cs_ui)
          AND YEAR(o_orderdate) IN (1996, 1997)
        GROUP BY 1, 2, 3)
      SELECT a.p_name, a.l_partkey AS pk, a.cnt AS cnt96, a.s1 AS s1_96, a.s2 AS s2_96,
             b.cnt AS cnt97, b.s1 AS s1_97, b.s2 AS s2_97
      FROM cs a JOIN cs b ON a.l_partkey = b.l_partkey
      WHERE a.syear = 1996 AND b.syear = 1997 AND b.cnt <= a.cnt
      ORDER BY a.p_name, pk LIMIT 100""")),

    // DS Q66 shape: the 12-month conditional pivot — per (supplier nation,
    // year) one dsum per month for revenue and one per month for quantity,
    // under a two-carrier filter (o_orderpriority as the carrier analog).
    QueryDef("q267_ds66_monthly_pivot", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val su = supplier(s, dir); val n = nation(s, dir)
      val base = Table(l)
        .join(Table(o).filter(o("o_orderpriority").isin("1-URGENT", "2-HIGH")),
          col("l_orderkey") === o("o_orderkey"))
        .join(Table(su), col("l_suppkey") === su("s_suppkey"))
        .join(Table(n), su("s_nationkey") === n("n_nationkey"))
        .filter(year(col("l_shipdate")) === 1996)
        .mutate("mo" -> month(col("l_shipdate")))
      val sales = (1 to 12).map(m =>
        dsum(when(col("mo") === m, rev())).as(f"sales_$m%02d"))
      val nets = (1 to 12).map(m =>
        sum(when(col("mo") === m, col("l_quantity"))).as(f"net_$m%02d"))
      base.groupBy(col("n_name"))
        .aggregate((Seq(lit("URGENT,HIGH").as("ship_carriers"), lit(1996).as("yr"))
          ++ sales ++ nets): _*)
        .sort(SortKey.asc(col("n_name")))
        .df
    }, Some {
      val sales = (1 to 12).map(m =>
        s"${dsumSql(s"CASE WHEN MONTH(l_shipdate) = $m THEN $REV_SQL END")} AS " +
          f"sales_$m%02d").mkString(", ")
      val nets = (1 to 12).map(m =>
        f"SUM(CASE WHEN MONTH(l_shipdate) = $m THEN l_quantity END) AS net_$m%02d")
        .mkString(", ")
      s"""
      SELECT n_name, 'URGENT,HIGH' AS ship_carriers, 1996 AS yr, $sales, $nets
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH') AND YEAR(l_shipdate) = 1996
      GROUP BY n_name ORDER BY n_name"""
    }),

    // DS Q70 shape: rank-within-rollup-parent — revenue rollup over
    // (region, nation), rank partitioned by grouping level and parent,
    // nations pre-filtered to the top-3 per region by an IN-subquery
    // window rank.
    QueryDef("q268_ds70_rank_within_rollup", (s, dir) => {
      val l = lineitem(s, dir); val su = supplier(s, dir)
      val n = nation(s, dir); val r = region(s, dir)
      val base = Table(l)
        .join(Table(su), col("l_suppkey") === su("s_suppkey"))
        .join(Table(n), su("s_nationkey") === n("n_nationkey"))
        .join(Table(r), n("n_regionkey") === r("r_regionkey"))
      val topNations = base.groupBy(col("r_name"), col("n_name"))
        .aggregate(dsum(rev()).as("t"))
        .mutate("ranking" -> rank().over(
          Window.partitionBy(col("r_name")).orderBy(col("t").desc, col("n_name"))))
        .filter(col("ranking") <= 3)
        .df.select(col("n_name").as("top_n"))
      val rolled = base
        .inSubquery(col("n_name"), topNations)
        .df.rollup(col("r_name"), col("n_name"))
        .agg(dsum(rev()).as("total_sum"),
          (grouping(col("r_name")) + grouping(col("n_name"))).cast("int").as("lochierarchy"))
      Table(rolled)
        .mutate("rank_within_parent" -> rank().over(
          Window.partitionBy(col("lochierarchy"),
              when(col("lochierarchy") === 0, col("r_name")))
            .orderBy(col("total_sum").desc)).cast("int"))
        .sort(SortKey.desc(col("lochierarchy")),
          SortKey(when(col("lochierarchy") === 0, col("r_name")), ascending = true, nullsFirst = true),
          SortKey.asc(col("rank_within_parent")))
        .limit(100)
        .df
    }, Some(s"""
      WITH base AS (
        SELECT r_name, n_name, ${REV_SQL} AS r
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey),
      top_n AS (
        SELECT n_name FROM (
          SELECT r_name, n_name,
            RANK() OVER (PARTITION BY r_name
              ORDER BY ${dsumSql("r")} DESC, n_name) AS ranking
          FROM base GROUP BY r_name, n_name)
        WHERE ranking <= 3),
      rolled AS (
        SELECT r_name, n_name, ${dsumSql("r")} AS total_sum,
          CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lochierarchy
        FROM base WHERE n_name IN (SELECT n_name FROM top_n)
        GROUP BY ROLLUP (r_name, n_name))
      SELECT r_name, n_name, total_sum, lochierarchy,
        CAST(RANK() OVER (PARTITION BY lochierarchy,
            CASE WHEN lochierarchy = 0 THEN r_name END
          ORDER BY total_sum DESC) AS INT) AS rank_within_parent
      FROM rolled
      ORDER BY lochierarchy DESC,
        CASE WHEN lochierarchy = 0 THEN r_name END NULLS FIRST,
        rank_within_parent
      LIMIT 100""")),

    // DS Q75 shape: year-over-year decline — UNION DISTINCT of two channel
    // row-sets (each with returns netted out via conditional coalesce),
    // aggregated per (year, brand, type) and self-joined 1996 vs 1997
    // keeping declines.
    QueryDef("q269_ds75_yoy_decline", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val p = part(s, dir)
      def chan(status: String) = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === status)
        .join(Table(orders(s, dir)), col("l_orderkey") === col("o_orderkey"))
        .join(Table(part(s, dir)), col("l_partkey") === col("p_partkey"))
        .filter(year(col("o_orderdate")).isin(1996, 1997))
        .select(year(col("o_orderdate")).cast("int").as("yr"),
          col("p_brand"), col("p_type"),
          (col("l_quantity") - when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(lit(0))).as("sales_cnt"),
          (col("l_extendedprice") - when(col("l_returnflag") === "R",
            col("l_extendedprice") * col("l_discount")).otherwise(lit(0))).as("sales_amt"))
      val all = chan("F").union(chan("O"), distinct = true)
        .groupBy(col("yr"), col("p_brand"), col("p_type"))
        .aggregate(sum(col("sales_cnt")).as("cnt"), dsum(col("sales_amt")).as("amt"))
      val prev = all.filter(col("yr") === 1996)
        .select(col("p_brand").as("b"), col("p_type").as("t"),
          col("cnt").as("prev_cnt"), col("amt").as("prev_amt"))
      val curr = all.filter(col("yr") === 1997)
        .select(col("p_brand").as("b2"), col("p_type").as("t2"),
          col("cnt").as("curr_cnt"), col("amt").as("curr_amt"))
      prev.join(curr, col("b") === col("b2") && col("t") === col("t2"))
        .filter(col("curr_cnt") < col("prev_cnt"))
        .mutate("cnt_diff" -> (col("curr_cnt") - col("prev_cnt")),
          "amt_diff" -> round(col("curr_amt") - col("prev_amt"), 4))
        .selectNames("b", "t", "prev_cnt", "curr_cnt", "cnt_diff", "amt_diff")
        .sort(SortKey.asc(col("cnt_diff")), SortKey.asc(col("b")), SortKey.asc(col("t")))
        .limit(100)
        .df
    }, Some(s"""
      WITH rows_ AS (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS yr, p_brand, p_type,
          l_quantity - CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END AS sales_cnt,
          l_extendedprice - CASE WHEN l_returnflag = 'R'
            THEN l_extendedprice * l_discount ELSE 0 END AS sales_amt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'F' AND YEAR(o_orderdate) IN (1996, 1997)
        UNION
        SELECT CAST(YEAR(o_orderdate) AS INT), p_brand, p_type,
          l_quantity - CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END,
          l_extendedprice - CASE WHEN l_returnflag = 'R'
            THEN l_extendedprice * l_discount ELSE 0 END
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        WHERE l_linestatus = 'O' AND YEAR(o_orderdate) IN (1996, 1997)),
      allsales AS (
        SELECT yr, p_brand, p_type, SUM(sales_cnt) AS cnt, ${dsumSql("sales_amt")} AS amt
        FROM rows_ GROUP BY 1, 2, 3)
      SELECT a.p_brand AS b, a.p_type AS t, a.cnt AS prev_cnt, b.cnt AS curr_cnt,
        b.cnt - a.cnt AS cnt_diff, ROUND(b.amt - a.amt, 4) AS amt_diff
      FROM allsales a JOIN allsales b
        ON a.p_brand = b.p_brand AND a.p_type = b.p_type
      WHERE a.yr = 1996 AND b.yr = 1997 AND b.cnt < a.cnt
      ORDER BY cnt_diff, b, t LIMIT 100""")),

    // DS Q77 shape: per-channel sales/returns FULL OUTER matrix per nation,
    // channels UNION ALL'd, then a rollup grand total.
    QueryDef("q270_ds77_channel_profit", (s, dir) => {
      val su = supplier(s, dir); val n = nation(s, dir)
      def base(status: String) = Table(lineitem(s, dir))
        .filter(col("l_linestatus") === status)
        .join(Table(supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
        .join(Table(nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      def chan(status: String, tag: String) = {
        val sales = base(status).filter(col("l_returnflag") =!= "R")
          .groupBy(col("n_name"))
          .aggregate(dsum(rev()).as("sales"))
          .rename("n_name" -> "sn")
        val rets = base(status).filter(col("l_returnflag") === "R")
          .groupBy(col("n_name"))
          .aggregate(dsum(rev()).as("returns"))
          .rename("n_name" -> "rn")
        sales.join(rets, col("sn") === col("rn"), how = "outer")
          .select(lit(tag).as("channel"), coalesce(col("sn"), col("rn")).as("n_name"),
            coalesce(col("sales"), lit(0.0)).as("sales"),
            coalesce(col("returns"), lit(0.0)).as("returns"))
          .mutate("profit" -> round(col("sales") - col("returns"), 4))
      }
      val unioned = chan("F", "store").union(chan("O", "web"))
      Table(unioned.df.rollup(col("channel"), col("n_name"))
          .agg(dsum(col("sales")).as("sales"), dsum(col("returns")).as("returns"),
            dsum(col("profit")).as("profit")))
        .sort(SortKey(col("channel"), ascending = true, nullsFirst = true),
          SortKey(col("n_name"), ascending = true, nullsFirst = true))
        .limit(200)
        .df
    }, Some(s"""
      WITH chan AS (
        SELECT ch AS channel, COALESCE(sn, rn) AS n_name,
          COALESCE(sales, 0) AS sales, COALESCE(returns, 0) AS returns,
          ROUND(COALESCE(sales, 0) - COALESCE(returns, 0), 4) AS profit
        FROM (
          SELECT 'store' AS ch, s.n_name AS sn, r.n_name AS rn, sales, returns
          FROM (SELECT n_name, ${dsumSql(REV_SQL)} AS sales FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE l_linestatus = 'F' AND l_returnflag <> 'R' GROUP BY 1) s
          FULL OUTER JOIN (SELECT n_name, ${dsumSql(REV_SQL)} AS returns FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE l_linestatus = 'F' AND l_returnflag = 'R' GROUP BY 1) r
            ON s.n_name = r.n_name
          UNION ALL
          SELECT 'web', s.n_name, r.n_name, sales, returns
          FROM (SELECT n_name, ${dsumSql(REV_SQL)} AS sales FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE l_linestatus = 'O' AND l_returnflag <> 'R' GROUP BY 1) s
          FULL OUTER JOIN (SELECT n_name, ${dsumSql(REV_SQL)} AS returns FROM lineitem
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
                WHERE l_linestatus = 'O' AND l_returnflag = 'R' GROUP BY 1) r
            ON s.n_name = r.n_name))
      SELECT channel, n_name, ${dsumSql("sales")} AS sales,
        ${dsumSql("returns")} AS returns, ${dsumSql("profit")} AS profit
      FROM chan GROUP BY ROLLUP (channel, n_name)
      ORDER BY channel NULLS FIRST, n_name NULLS FIRST LIMIT 200""")),

    // DS Q78 shape: per-customer cross-channel loyalty ratio on
    // return-free lines — both channels must be active, ratio ordered.
    QueryDef("q271_ds78_loyalty_ratio", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      Table(l)
        .filter(col("l_returnflag") =!= "R")
        .join(Table(o).filter(year(o("o_orderdate")) === 1996),
          col("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_custkey"))
        .aggregate(
          sum(when(col("l_linestatus") === "F", col("l_quantity"))).as("f_qty"),
          sum(when(col("l_linestatus") === "O", col("l_quantity"))).as("o_qty"))
        .filter(col("f_qty") > 0, col("o_qty") > 0)
        .mutate("ratio" -> round(col("f_qty") / col("o_qty"), 6))
        .selectNames("o_custkey", "ratio", "f_qty", "o_qty")
        .sort(SortKey.desc(col("ratio")), SortKey.asc(col("o_custkey")))
        .limit(100)
        .df
    }, Some("""
      SELECT o_custkey, ROUND(f_qty / o_qty, 6) AS ratio, f_qty, o_qty FROM (
        SELECT o_custkey,
          SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS f_qty,
          SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS o_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag <> 'R' AND YEAR(o_orderdate) = 1996
        GROUP BY 1) t
      WHERE f_qty > 0 AND o_qty > 0
      ORDER BY ratio DESC, o_custkey LIMIT 100""")),

    // DS Q85 shape: returned lines classified by OR-band (account-balance
    // band x quantity band) pairs, three averages per "reason"
    // (o_orderpriority as the return-reason analog).
    QueryDef("q272_ds85_reason_bands", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .filter(col("l_returnflag") === "R")
        .join(Table(o), col("l_orderkey") === o("o_orderkey"))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .filter(
          (col("c_acctbal").between(0, 2500) && col("l_quantity").between(1, 20)) ||
          (col("c_acctbal").between(2500, 5000) && col("l_quantity").between(21, 35)) ||
          (col("c_acctbal").between(5000, 10000) && col("l_quantity").between(36, 50)))
        .groupBy(substring(col("o_orderpriority"), 1, 20).as("reason"))
        .aggregate(round(avg(col("l_quantity")), 6).as("avg_qty"),
          dmean(col("l_extendedprice") * col("l_discount")).as("avg_refunded"),
          dmean(col("l_extendedprice") * col("l_tax")).as("avg_fee"))
        .sort(SortKey.asc(col("reason")))
        .limit(100)
        .df
    }, Some(s"""
      SELECT SUBSTRING(o_orderpriority, 1, 20) AS reason,
        ROUND(AVG(l_quantity), 6) AS avg_qty,
        ${dmeanSql("l_extendedprice * l_discount")} AS avg_refunded,
        ${dmeanSql("l_extendedprice * l_tax")} AS avg_fee
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE l_returnflag = 'R'
        AND ((c_acctbal BETWEEN 0 AND 2500 AND l_quantity BETWEEN 1 AND 20)
          OR (c_acctbal BETWEEN 2500 AND 5000 AND l_quantity BETWEEN 21 AND 35)
          OR (c_acctbal BETWEEN 5000 AND 10000 AND l_quantity BETWEEN 36 AND 50))
      GROUP BY 1 ORDER BY reason LIMIT 100""")),

    // DS Q98 shape: revenue share-of-class — per-part revenue with its
    // percentage of the part-type total via a decimal-exact window sum.
    QueryDef("q273_ds98_class_share", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val agg = Table(l)
        .filter(col("l_shipdate") >= lit("1996-01-01"),
          col("l_shipdate") < lit("1996-01-31"))
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .groupBy(col("p_name"), col("p_type"), col("p_retailprice"))
        .aggregate(dsum(rev()).as("itemrevenue"))
      val w = Window.partitionBy(col("p_type"))
      agg.mutate("revenueratio" -> round(col("itemrevenue") * 100 /
          sum(col("itemrevenue").cast("decimal(38,4)")).over(w).cast("double"), 6))
        .sort(SortKey.asc(col("p_type")), SortKey.desc(col("revenueratio")),
          SortKey.asc(col("p_name")), SortKey.asc(col("p_retailprice")))
        .limit(200)
        .df
    }, Some(s"""
      SELECT p_name, p_type, p_retailprice, itemrevenue,
        ROUND(itemrevenue * 100 /
          CAST(SUM(CAST(itemrevenue AS DECIMAL(38,4))) OVER (PARTITION BY p_type) AS DOUBLE),
          6) AS revenueratio
      FROM (
        SELECT p_name, p_type, p_retailprice, ${dsumSql(REV_SQL)} AS itemrevenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-31'
        GROUP BY 1, 2, 3) t
      ORDER BY p_type, revenueratio DESC, p_name, p_retailprice LIMIT 200""")),

    // DS Q91 shape: month-over-month returns loss per nation — two
    // conditional month sums compared as a ratio with a HAVING bar.
    QueryDef("q274_ds91_monthly_loss_delta", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      Table(l)
        .filter(col("l_returnflag") === "R")
        .join(Table(o).filter(year(o("o_orderdate")) === 1996,
          month(o("o_orderdate")).isin(10, 11)),
          col("l_orderkey") === o("o_orderkey"))
        .join(Table(c), col("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .aggregate(
          dsum(when(month(col("o_orderdate")) === 10, rev())).as("oct_loss"),
          dsum(when(month(col("o_orderdate")) === 11, rev())).as("nov_loss"))
        .filter(col("oct_loss").isNotNull, col("oct_loss") > 0,
          col("nov_loss").isNotNull)
        .mutate("delta" -> round(col("nov_loss") / col("oct_loss"), 6))
        .filter(col("delta") > 1)
        .sort(SortKey.desc(col("delta")), SortKey.asc(col("n_name")))
        .df
    }, Some(s"""
      SELECT n_name, oct_loss, nov_loss, ROUND(nov_loss / oct_loss, 6) AS delta
      FROM (
        SELECT n_name,
          ${dsumSql(s"CASE WHEN MONTH(o_orderdate) = 10 THEN $REV_SQL END")} AS oct_loss,
          ${dsumSql(s"CASE WHEN MONTH(o_orderdate) = 11 THEN $REV_SQL END")} AS nov_loss
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R' AND YEAR(o_orderdate) = 1996
          AND MONTH(o_orderdate) IN (10, 11)
        GROUP BY 1) t
      WHERE oct_loss IS NOT NULL AND oct_loss > 0 AND nov_loss IS NOT NULL
        AND ROUND(nov_loss / oct_loss, 6) > 1
      ORDER BY delta DESC, n_name""")),

    // DS Q94 shape: orders shipping from at least two supplier nations
    // with NO returned line — HAVING countDistinct + anti join, final
    // one-row profile.
    QueryDef("q275_ds94_multi_nation_clean", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val su = supplier(s, dir)
      val returned = Table(lineitem(s, dir))
        .filter(col("l_returnflag") === "R")
        .df.select(col("l_orderkey").as("ret_ok"))
      val eligible = Table(l)
        .join(Table(su), col("l_suppkey") === su("s_suppkey"))
        .groupBy(col("l_orderkey"))
        .aggregate(countDistinct(col("s_nationkey")).as("n_nations"))
        .filter(col("n_nations") >= 2)
      Table(o)
        .filter(o("o_orderstatus") === "F",
          o("o_orderdate") >= lit("1996-01-01"), o("o_orderdate") < lit("1996-07-01"))
        .joinOn(eligible, Seq("o_orderkey" -> "l_orderkey"), how = "semi")
        .notInSubquery(col("o_orderkey"), returned)
        .aggregate(count(lit(1)).as("order_count"),
          dsum(col("o_totalprice")).as("total_price"))
        .df
    }, Some(s"""
      SELECT COUNT(*) AS order_count, ${dsumSql("o_totalprice")} AS total_price
      FROM orders
      WHERE o_orderstatus = 'F'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
        AND o_orderkey IN (
          SELECT l_orderkey FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1 HAVING COUNT(DISTINCT s_nationkey) >= 2)
        AND o_orderkey NOT IN (
          SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')"""))
  )
}
