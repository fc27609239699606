package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import org.apache.spark.sql.GraftSqlBridge
import Tables._

/** TPC-DS-shaped corpus (q201-q220), adapted to the driver's star schema.
  *
  * The reference's second correctness suite is the 99 TPC-DS queries
  * (ibis/backends/tests/tpc/ds/test_queries.py, oracle SQL in
  * tpc/queries/duckdb/ds/). The DS tables (store_sales, item, date_dim, …)
  * don't exist in the trimmed testdata, so these adapt the SHAPES that
  * distinguish DS from H — ROLLUP/CUBE hierarchies with GROUPING ids,
  * window-over-join year-over-year analytics, channel INTERSECTs,
  * per-group top-N over rollups, band-bucket single-pass counts,
  * avg-comparison correlations, and frequent-item ∩ best-customer
  * semi-join chains — onto orders/lineitem/customer/nation/events. Every
  * query is oracle-checked against DuckDB; thresholds are density-based so
  * results are non-empty at every SF.
  */
object TpcdsQueries {

  private val rev = () => col("l_extendedprice") * (lit(1) - col("l_discount"))

  /** Decimal-exact windowed mean: sum(decimal)/count in double (window
    * AVG over doubles is accumulation-order-dependent across engines). */
  private def wmean(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    round(sum(c.cast("decimal(38,4)")).over(w).cast("double") / count(c).over(w), 6)


  /** q202's computation over given orders/lineitem frames (parquet or the
    * bucketed warehouse layout — the q202b twin). See the cents note
    * inside for the exactness argument. */
  private def ds27Body(s: org.apache.spark.sql.SparkSession, dir: String,
      o: org.apache.spark.sql.DataFrame,
      l: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val c = customer(s, dir); val n = nation(s, dir)
      // exact long-cents partials (round 13, A/B 1.46x at SF10): the
      // row-level scale-4 rounding matches the oracle's DECIMAL(38,4)
      // cast; x10000-to-long makes the two hot aggregate levels plain
      // codegen long sums. Round 15: the rounding runs in pure double
      // (Tables.cents4, the q101 units pattern) — value-identical on
      // money-grid inputs, no per-row Decimal128 multiply. Overflow-safe
      // at any SF: per-order (<=7 lines) and per-customer (SF-invariant
      // order count) sums are bounded; the unbounded rollup level sums as
      // decimal(38,0) over only |customers| rows.
      def cents(x: org.apache.spark.sql.Column) = cents4(x)
      val perOrder = l.select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .groupBy(col("l_orderkey"))
        .agg(
          sum(cents(col("l_quantity"))).as("oq"),
          count(col("l_quantity")).as("onq"),
          sum(cents(col("l_extendedprice"))).as("op"),
          count(col("l_extendedprice")).as("onp"),
          sum(cents(col("l_discount"))).as("od"),
          count(col("l_discount")).as("ond"))
      val perCust = Table(perOrder)
        .join(Table(o.select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .df.groupBy(col("o_custkey"))
        .agg(
          sum(col("oq")).as("sq"), sum(col("onq")).as("cq"),
          sum(col("op")).as("sp"), sum(col("onp")).as("cp"),
          sum(col("od")).as("sd"), sum(col("ond")).as("cd"))
      val j = Table(perCust)
        .join(Table(c.select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .join(Table(n), col("c_nationkey") === col("n_nationkey")).df
      def avgOf(cs: String, cc: String) =
        round((sum(col(cs).cast("decimal(38,0)")) / 10000)
          .cast("double") / sum(col(cc)), 6)
      Table(j.rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          avgOf("sq", "cq").as("agg1"),
          avgOf("sp", "cp").as("agg2"),
          avgOf("sd", "cd").as("agg3"),
          (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment"))).cast("int").as("lvl")))
        // rollup output is bounded by the (nation × segment) domain
        // (~176 rows at any SF): single-partition sort, no range exchange
        // + sampling pass (r15)
        .sortBounded(SortKey.asc(col("lvl")), SortKey.asc(col("n_name")), SortKey.asc(col("c_mktsegment")))
        .df
  }

  val defs: Seq[QueryDef] = Seq(

    // DS Q3 shape: brand revenue by year for one part type.
    QueryDef("q201_ds3_brand_by_year", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val o = orders(s, dir)
      Table(l)
        .join(Table(p).filter(p("p_type") === "PROMO"), l("l_partkey") === p("p_partkey"))
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .mutate("d_year" -> year(o("o_orderdate")))
        .groupBy(col("d_year"), p("p_brand"))
        .aggregate(dsum(rev()).as("sum_agg"))
        .sort(SortKey.asc(col("d_year")), SortKey.desc(col("sum_agg")), SortKey.asc(col("p_brand")))
        .df
    }, Some("""
      SELECT CAST(YEAR(o_orderdate) AS INT) AS d_year, p_brand,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_agg
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_type = 'PROMO'
      GROUP BY 1, 2 ORDER BY d_year, sum_agg DESC, p_brand""")),

    // DS Q27 shape: ROLLUP averages over a (nation, segment) hierarchy.
    // Plan: the rollup keys (n_name, c_mktsegment) are functionally
    // dependent on c_custkey, and every aggregate is a decomposable
    // sum/count — so collapse the fact side to per-customer partial sums
    // FIRST (decimal sums are exact, so two-level summation is
    // bit-identical to the single-pass oracle), then join the 100×
    // smaller per-customer frame to customer + broadcast nation and
    // expand ×3 over THAT. The naive join-then-rollup shape expands the
    // full lineitem join output 3× before aggregating (measured 7.7× of
    // DuckDB at SF10; this shape ~2×); at 100 TB the Expand over the
    // fact table is the difference between shuffling 3× the corpus and
    // shuffling |customers|.
    QueryDef("q202_ds27_rollup_avgs", (s, dir) =>
      ds27Body(s, dir, orders(s, dir), lineitem(s, dir)), Some("""
      SELECT n_name, c_mktsegment,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_quantity), 6) AS agg1,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS agg2,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_discount), 6) AS agg3,
        CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lvl
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY lvl, n_name NULLS LAST, c_mktsegment NULLS LAST""")),

    // Layout-assisted twin (the q101b/q103b story, extended to the DS
    // rollup): both fact sides pre-bucketed AND pre-sorted by orderkey
    // remove the backbone's one wide exchange pair — the per-order
    // aggregate runs bucket-local and the orders join arrives
    // co-partitioned. Shares the q101b warehouse tables (same key, same
    // bucket count); same oracle as q202. Excluded from the geomean.
    QueryDef("q202b_ds27_bucketed", (s0, dir) => {
      // conf override on a CLONED session only: the flag must be live at
      // execution time (planning is lazy, so set-then-restore here would
      // undo it before it's read), and setting it on the shared session
      // would leak a plan-shape conf into every later query (ADVICE r13)
      val s = GraftSqlBridge.cloneSession(s0)
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // the bench session's final-agg fast map (partialOnly=false +
      // capacityBit=20) destabilizes the BUCKET-LOCAL aggregate: 64
      // bucket tasks × ~1M keys/task overflow the fast map and the dual
      // structure thrashes memory (measured 7.7s steady with defaults vs
      // 85-200s swings with the fast map at SF10) — restore the defaults
      // on this query's isolated session
      s.conf.set("spark.sql.codegen.aggregate.map.twolevel.partialOnly", "true")
      s.conf.set("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "16")
      val (ot, lt) = BucketedLayout.orderkeyTables(s, dir)
      ds27Body(s, dir, s.table(ot), s.table(lt))
    }, Some("""
      SELECT n_name, c_mktsegment,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_quantity), 6) AS agg1,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS agg2,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_discount), 6) AS agg3,
        CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lvl
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY lvl, n_name NULLS LAST, c_mktsegment NULLS LAST""")),


    // Floor control for q202 (round-12 verdict #2): the eager-aggregation
    // BACKBONE alone — per-order partial sums below the orderkey exchange,
    // the orders join, and the per-customer re-aggregation — with none of
    // the customer/nation dimension joins and no rollup Expand, collapsed
    // to one grand-total row (= q202's lvl=3 row plus a customer count).
    // The delta between this and q202 is the dimension-join + Expand
    // machinery; the delta between this and DuckDB's flat join-then-agg
    // SQL is the exchange-pair floor (the same attribution q101_control
    // gives q101). Excluded from the bench ratio geomean.
    QueryDef("q202_control", (s, dir) => {
      val o = orders(s, dir); val l = lineitem(s, dir)
      def cents(x: org.apache.spark.sql.Column) = cents4(x) // r15: see ds27Body
      val perOrder = l.select(col("l_orderkey"), col("l_quantity"),
          col("l_extendedprice"), col("l_discount"))
        .groupBy(col("l_orderkey"))
        .agg(
          sum(cents(col("l_quantity"))).as("oq"),
          count(col("l_quantity")).as("onq"),
          sum(cents(col("l_extendedprice"))).as("op"),
          count(col("l_extendedprice")).as("onp"),
          sum(cents(col("l_discount"))).as("od"),
          count(col("l_discount")).as("ond"))
      val perCust = Table(perOrder)
        .join(Table(o.select(col("o_orderkey"), col("o_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .df.groupBy(col("o_custkey"))
        .agg(
          sum(col("oq")).as("sq"), sum(col("onq")).as("cq"),
          sum(col("op")).as("sp"), sum(col("onp")).as("cp"),
          sum(col("od")).as("sd"), sum(col("ond")).as("cd"))
      def avgOf(cs: String, cc: String) =
        round((sum(col(cs).cast("decimal(38,0)")) / 10000)
          .cast("double") / sum(col(cc)), 6)
      perCust.agg(
        count(lit(1)).as("n_cust"),
        avgOf("sq", "cq").as("agg1"),
        avgOf("sp", "cp").as("agg2"),
        avgOf("sd", "cd").as("agg3"))
    }, Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_cust,
        ROUND(CAST(SUM(sq) AS DOUBLE) / SUM(cq), 6) AS agg1,
        ROUND(CAST(SUM(sp) AS DOUBLE) / SUM(cp), 6) AS agg2,
        ROUND(CAST(SUM(sd) AS DOUBLE) / SUM(cd), 6) AS agg3
      FROM (
        SELECT o_custkey,
          SUM(CAST(l_quantity AS DECIMAL(38,4))) AS sq, COUNT(l_quantity) AS cq,
          SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS sp, COUNT(l_extendedprice) AS cp,
          SUM(CAST(l_discount AS DECIMAL(38,4))) AS sd, COUNT(l_discount) AS cd
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_custkey)""")),

    // DS Q36 shape: gross-margin ratio over the same hierarchy (ratio of
    // two decimal-exact sums per rollup group).
    QueryDef("q203_ds36_margin_rollup", (s, dir) => {
      val c = customer(s, dir); val o = orders(s, dir)
      val l = lineitem(s, dir); val n = nation(s, dir)
      val j = Table(c)
        .join(Table(o), c("c_custkey") === o("o_custkey"))
        .join(Table(l), o("o_orderkey") === l("l_orderkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey")).df
      Table(j.rollup(col("n_name"), col("c_mktsegment"))
        .agg(
          round(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(38,4)")).cast("double") /
            sum(col("l_extendedprice").cast("decimal(38,4)")).cast("double"), 6)
            .as("margin"),
          (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment"))).cast("int").as("lvl")))
        .sort(SortKey.asc(col("lvl")), SortKey.asc(col("n_name")), SortKey.asc(col("c_mktsegment")))
        .df
    }, Some("""
      SELECT n_name, c_mktsegment,
        ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE)
          / CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE), 6) AS margin,
        CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lvl
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY lvl, n_name NULLS LAST, c_mktsegment NULLS LAST""")),

    // DS Q47/Q57 shape: monthly revenue per nation with lag-1, lag-12, and
    // a decimal-exact windowed yearly mean (window-over-join analytics).
    // Plan: revenue is a decimal sum, so collapse lineitem to one exact
    // per-order revenue BELOW the orderkey exchange (map-side combine
    // shrinks the fact shuffle ~4×, and the orders join arrives
    // co-partitioned on the agg's own hash layout); the monthly group-by
    // then runs over |orders| rows, not |lineitem|, and the window ranks
    // 25 nations × months — driver-trivial at any scale.
    QueryDef("q204_ds47_yoy_monthly", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      // exact long-cents revenue partials (round 13, A/B 1.72x at SF10 —
      // see q202's cents note): integer sums through the per-order and
      // monthly aggregates, decimal only for the final /10000 rescale
      val perOrder = l
        .select(col("l_orderkey"),
          cents4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("lrev_c"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("lrev_c")).as("orev_c"))
      val monthly = Table(perOrder)
        .join(Table(o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Table(c.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(Table(n), col("c_nationkey") === col("n_nationkey"))
        .mutate("yr" -> year(col("o_orderdate")), "mo" -> month(col("o_orderdate")))
        .groupBy(col("n_name"), col("yr"), col("mo"))
        .aggregate((sum(col("orev_c").cast("decimal(38,0)")) / 10000)
          .cast("double").as("r"))
      val wSeq = Window.partitionBy(col("n_name")).orderBy(col("yr"), col("mo"))
      val wYear = Window.partitionBy(col("n_name"), col("yr"))
      // the monthly frame is bounded by the (nation × year × month)
      // domain (~2100 rows at any SF): merge the final-agg stage to one
      // partition so BOTH window specs, the year filter and the final
      // sort run in a single exchange-free stage (r15; was a window hash
      // exchange + a range exchange + its sampling pass — three scheduler
      // round-trips moving <2100 rows). The per-order/monthly partial
      // aggregation above stays fully parallel.
      Table(monthly.df.coalesce(1))
        .mutate(
          "prev_m" -> lag(col("r"), 1).over(wSeq),
          "prev_y" -> lag(col("r"), 12).over(wSeq),
          "year_avg" -> wmean(col("r"), wYear))
        .filter(col("yr") === 1997)
        .sort(SortKey.asc(col("n_name")), SortKey.asc(col("yr")), SortKey.asc(col("mo")))
        .df
    }, Some("""
      WITH monthly AS (
        SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2, 3)
      SELECT * FROM (
        SELECT n_name, yr, mo, r,
          LAG(r, 1) OVER (PARTITION BY n_name ORDER BY yr, mo) AS prev_m,
          LAG(r, 12) OVER (PARTITION BY n_name ORDER BY yr, mo) AS prev_y,
          ROUND(CAST(SUM(CAST(r AS DECIMAL(38,4))) OVER (PARTITION BY n_name, yr) AS DOUBLE)
            / COUNT(r) OVER (PARTITION BY n_name, yr), 6) AS year_avg
        FROM monthly)
      WHERE yr = 1997 ORDER BY n_name, yr, mo""")),

    // Floor control for q204 (round-12 verdict #2): the monthly aggregate
    // alone — per-order revenue collapsed below the orderkey exchange,
    // the orders/customer/nation joins, and the (nation, year, month)
    // group-by — WITHOUT the window pass (lag-1 / lag-12 / yearly mean)
    // and without the final year filter, so every window input row is
    // produced. The delta between this and q204 is the window machinery
    // (25 nations × ~84 months — driver-trivial); the delta between this
    // and DuckDB's flat SQL is the join + exchange floor. Excluded from
    // the bench ratio geomean.
    QueryDef("q204_control", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val perOrder = l
        .select(col("l_orderkey"),
          cents4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("lrev_c"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("lrev_c")).as("orev_c"))
      Table(perOrder)
        .join(Table(o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Table(c.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(Table(n), col("c_nationkey") === col("n_nationkey"))
        .mutate("yr" -> year(col("o_orderdate")), "mo" -> month(col("o_orderdate")))
        .groupBy(col("n_name"), col("yr"), col("mo"))
        .aggregate((sum(col("orev_c").cast("decimal(38,0)")) / 10000)
          .cast("double").as("r"))
        .sort(SortKey.asc(col("n_name")), SortKey.asc(col("yr")), SortKey.asc(col("mo")))
        .df
    }, Some("""
      SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS yr, CAST(MONTH(o_orderdate) AS INT) AS mo,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2, 3 ORDER BY n_name, yr, mo""")),

    // DS Q1/Q30 shape: customers whose returned value exceeds 1.2× their
    // nation's average returned value (decorrelated avg + join).
    QueryDef("q205_ds1_heavy_returners", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val perCust = Table(l).filter(l("l_returnflag") === "R")
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(c("c_custkey"), c("c_name"), n("n_name"))
        .aggregate(dsum(rev()).as("ret"))
      val natAvg = perCust.groupByNames("n_name")
        .aggregate((sum(col("ret").cast("decimal(38,4)")).cast("double") /
          count(col("ret"))).as("nat_avg"))
        .rename("n_name" -> "an_name")
      val av = natAvg.df
      perCust
        .join(natAvg, col("n_name") === av("an_name"))
        .filter(col("ret") > av("nat_avg") * 1.2)
        .selectNames("c_custkey", "c_name", "n_name", "ret")
        .sort(SortKey.desc(col("ret")), SortKey.asc(col("c_custkey")))
        .limit(50)
        .df
    }, Some("""
      WITH per_cust AS (
        SELECT c_custkey, c_name, n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS ret
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3),
      nat_avg AS (
        SELECT n_name AS an_name,
          CAST(SUM(CAST(ret AS DECIMAL(38,4))) AS DOUBLE) / COUNT(ret) AS nat_avg
        FROM per_cust GROUP BY 1)
      SELECT c_custkey, c_name, n_name, ret
      FROM per_cust JOIN nat_avg ON n_name = an_name
      WHERE ret > nat_avg * 1.2
      ORDER BY ret DESC, c_custkey LIMIT 50""")),

    // DS Q38/Q97 shape: three-channel customer INTERSECT.
    QueryDef("q206_ds38_channel_intersect", (s, dir) => {
      val o = orders(s, dir); val l = lineitem(s, dir)
      val o2 = orders(s, dir); val c = customer(s, dir)
      val urgent = Table(o).filter(o("o_orderpriority") === "1-URGENT")
        .select(o("o_custkey").as("k")).distinct()
      val returned = Table(l).filter(l("l_returnflag") === "R")
        .join(Table(o2), l("l_orderkey") === o2("o_orderkey"))
        .select(o2("o_custkey").as("k")).distinct()
      val funded = Table(c).filter(c("c_acctbal") > 0.0)
        .select(c("c_custkey").as("k")).distinct()
      urgent.intersect(returned).intersect(funded)
        .aggregate(count(lit(1)).as("n_customers"))
        .df
    }, Some("""
      SELECT COUNT(*) AS n_customers FROM (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT DISTINCT o_custkey AS k FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'R'
        INTERSECT
        SELECT DISTINCT c_custkey AS k FROM customer WHERE c_acctbal > 0.0)""")),

    // DS Q2 shape: week-over-week ratio across two consecutive years.
    QueryDef("q207_ds2_wow_ratio", (s, dir) => {
      val l = lineitem(s, dir)
      val weekly = Table(l)
        .mutate("yr" -> year(col("l_shipdate")), "wk" -> weekofyear(col("l_shipdate")))
        .filter(col("yr").isin(1996, 1997))
        .groupBy(col("yr"), col("wk"))
        .aggregate(dsum(rev()).as("r"))
      val a = weekly.filter(col("yr") === 1996).rename("r" -> "r96").selectNames("wk", "r96")
      val b = weekly.filter(col("yr") === 1997).rename("r" -> "r97", "wk" -> "wk2")
        .selectNames("wk2", "r97")
      a.join(b, a.df("wk") === b.df("wk2"))
        .mutate("ratio" -> round(col("r97") / col("r96"), 6))
        .selectNames("wk", "r96", "r97", "ratio")
        .sort(SortKey.asc(col("wk")))
        .df
    }, Some("""
      WITH weekly AS (
        SELECT CAST(YEAR(l_shipdate) AS INT) AS yr, CAST(WEEKOFYEAR(l_shipdate) AS INT) AS wk,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem WHERE YEAR(l_shipdate) IN (1996, 1997) GROUP BY 1, 2)
      SELECT a.wk, a.r AS r96, b.r AS r97, ROUND(b.r / a.r, 6) AS ratio
      FROM weekly a JOIN weekly b ON a.wk = b.wk AND a.yr = 1996 AND b.yr = 1997
      ORDER BY a.wk""")),

    // DS Q73 shape: mid-size orders (4..7 lines) with their customers.
    QueryDef("q208_ds73_order_buckets", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      val cnt = Table(l).groupBy(l("l_orderkey")).count("cnt")
        .filter(col("cnt").between(4, 7))
      Table(o)
        .join(cnt, o("o_orderkey") === cnt.df("l_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .selectNames("c_name", "c_custkey", "o_orderkey", "cnt")
        .sort(SortKey.desc(col("cnt")), SortKey.asc(col("o_orderkey")))
        .limit(100)
        .df
    }, Some("""
      SELECT c_name, c_custkey, o_orderkey, cnt
      FROM (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1) t
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE cnt BETWEEN 4 AND 7
      ORDER BY cnt DESC, o_orderkey LIMIT 100""")),

    // DS Q67 shape: top-5 revenue rows per rollup level (window over a
    // grouping-sets aggregate).
    QueryDef("q209_ds67_topn_over_rollup", (s, dir) => {
      val c = customer(s, dir); val o = orders(s, dir)
      val l = lineitem(s, dir); val n = nation(s, dir)
      val j = Table(c)
        .join(Table(o), c("c_custkey") === o("o_custkey"))
        .join(Table(l), o("o_orderkey") === l("l_orderkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey")).df
      val rolled = j.rollup(col("n_name"), col("c_mktsegment"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("r"),
          (grouping(col("n_name")) * 2 + grouping(col("c_mktsegment"))).cast("int").as("lvl"))
      val w = Window.partitionBy(col("lvl"))
        .orderBy(col("r").desc, col("n_name").asc_nulls_last, col("c_mktsegment").asc_nulls_last)
      Table(rolled)
        .mutate("rn" -> row_number().over(w))
        .filter(col("rn") <= 5)
        .sort(SortKey.asc(col("lvl")), SortKey.asc(col("rn")))
        .df
    }, Some("""
      WITH rolled AS (
        SELECT n_name, c_mktsegment,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r,
          CAST(GROUPING(n_name) * 2 + GROUPING(c_mktsegment) AS INT) AS lvl
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, c_mktsegment))
      SELECT * FROM (
        SELECT n_name, c_mktsegment, r, lvl,
          CAST(ROW_NUMBER() OVER (PARTITION BY lvl
            ORDER BY r DESC, n_name NULLS LAST, c_mktsegment NULLS LAST) AS INT) AS rn
        FROM rolled)
      WHERE rn <= 5 ORDER BY lvl, rn""")),

    // DS Q10 shape: customers present in BOTH order channels, counted per
    // nation (two EXISTS → two semi-joins).
    QueryDef("q210_ds10_exists_both", (s, dir) => {
      val c = customer(s, dir); val n = nation(s, dir)
      val o1 = orders(s, dir); val o2 = orders(s, dir)
      Table(c)
        .join(Table(o1).filter(o1("o_orderpriority") === "1-URGENT"),
          c("c_custkey") === o1("o_custkey"), how = "semi")
        .join(Table(o2).filter(o2("o_orderstatus") === "F"),
          c("c_custkey") === o2("o_custkey"), how = "semi")
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name"))
        .count("cnt")
        .sort(SortKey.asc(col("n_name")))
        .df
    }, Some("""
      SELECT n_name, COUNT(*) AS cnt
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
        AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                    AND o_orderstatus = 'F')
      GROUP BY n_name ORDER BY n_name""")),

    // DS Q93 shape: net sales per customer after subtracting returns.
    QueryDef("q211_ds93_net_after_returns", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_custkey"), c("c_name"))
        .aggregate(
          dsum(when(l("l_returnflag") =!= "R", rev()).otherwise(lit(0.0))).as("kept"),
          dsum(when(l("l_returnflag") === "R", rev()).otherwise(lit(0.0))).as("returned"))
        .mutate("net" -> (col("kept") - col("returned")))
        .sort(SortKey.desc(col("net")), SortKey.asc(col("c_custkey")))
        .limit(20)
        .df
    }, Some("""
      SELECT c_custkey, c_name,
        CAST(SUM(CAST(CASE WHEN l_returnflag <> 'R'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE) AS kept,
        CAST(SUM(CAST(CASE WHEN l_returnflag = 'R'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE) AS returned,
        CAST(SUM(CAST(CASE WHEN l_returnflag <> 'R'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE)
        - CAST(SUM(CAST(CASE WHEN l_returnflag = 'R'
          THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(38,4))) AS DOUBLE) AS net
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name
      ORDER BY net DESC, c_custkey LIMIT 20""")),

    // DS Q59 shape: month-over-month revenue ratio per nation.
    QueryDef("q212_ds59_mom_ratio", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val monthly = Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .mutate("ym" -> (year(o("o_orderdate")) * 12 + month(o("o_orderdate")) - 1))
        .groupBy(n("n_name"), col("ym"))
        .aggregate(dsum(rev()).as("r"))
      val nxt = monthly.rename("n_name" -> "n2", "ym" -> "ym2", "r" -> "r2")
      val nx = nxt.df
      monthly
        .join(nxt, col("n_name") === nx("n2") && nx("ym2") === col("ym") + 1)
        .mutate("ratio" -> round(nx("r2") / col("r"), 6))
        .selectNames("n_name", "ym", "r", "r2", "ratio")
        .filter(col("ym") % 12 === 0) // january rows only — keeps output stable
        .sort(SortKey.asc(col("n_name")), SortKey.asc(col("ym")))
        .df
    }, Some("""
      WITH monthly AS (
        SELECT n_name, CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS INT) AS ym,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT a.n_name, a.ym, a.r, b.r AS r2, ROUND(b.r / a.r, 6) AS ratio
      FROM monthly a JOIN monthly b ON a.n_name = b.n_name AND b.ym = a.ym + 1
      WHERE a.ym % 12 = 0
      ORDER BY a.n_name, a.ym""")),

    // DS Q42/Q52 shape: top revenue (year, brand) pairs.
    QueryDef("q213_ds42_brand_leaders", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir); val o = orders(s, dir)
      Table(l)
        .join(Table(p), l("l_partkey") === p("p_partkey"))
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .mutate("d_year" -> year(o("o_orderdate")))
        .groupBy(col("d_year"), p("p_brand"))
        .aggregate(dsum(rev()).as("r"))
        .sort(SortKey.desc(col("r")), SortKey.asc(col("d_year")), SortKey.asc(col("p_brand")))
        .limit(10)
        .df
    }, Some("""
      SELECT CAST(YEAR(o_orderdate) AS INT) AS d_year, p_brand,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2 ORDER BY r DESC, d_year, p_brand LIMIT 10""")),

    // DS Q88 shape: one-pass band-bucket counts (8 conditional counts in a
    // single aggregate instead of 8 scans).
    QueryDef("q214_ds88_band_counts", (s, dir) => {
      val o = orders(s, dir)
      def band(lo: Double, hi: Double) =
        count(when(o("o_totalprice") >= lo && o("o_totalprice") < hi, lit(1)))
      Table(o).aggregate(
        band(0, 50000).as("b1"), band(50000, 100000).as("b2"),
        band(100000, 150000).as("b3"), band(150000, 200000).as("b4"),
        band(200000, 250000).as("b5"), band(250000, 300000).as("b6"),
        band(300000, 400000).as("b7"), band(400000, 1e9).as("b8"))
        .df
    }, Some("""
      SELECT
        COUNT(CASE WHEN o_totalprice >= 0 AND o_totalprice < 50000 THEN 1 END) AS b1,
        COUNT(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 100000 THEN 1 END) AS b2,
        COUNT(CASE WHEN o_totalprice >= 100000 AND o_totalprice < 150000 THEN 1 END) AS b3,
        COUNT(CASE WHEN o_totalprice >= 150000 AND o_totalprice < 200000 THEN 1 END) AS b4,
        COUNT(CASE WHEN o_totalprice >= 200000 AND o_totalprice < 250000 THEN 1 END) AS b5,
        COUNT(CASE WHEN o_totalprice >= 250000 AND o_totalprice < 300000 THEN 1 END) AS b6,
        COUNT(CASE WHEN o_totalprice >= 300000 AND o_totalprice < 400000 THEN 1 END) AS b7,
        COUNT(CASE WHEN o_totalprice >= 400000 AND o_totalprice < 1000000000 THEN 1 END) AS b8
      FROM orders""")),

    // DS Q15 shape: nation revenue from high-value orders above a relative
    // threshold (scalar subquery broadcast).
    QueryDef("q215_ds15_high_value_nations", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val base = Table(l)
        .join(Table(o).filter(o("o_totalprice") > 100000.0), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name"))
        .aggregate(dsum(rev()).as("r"))
      val thresh = base.aggregate((dsum(col("r")) * lit(0.02)).as("t"))
      base.crossJoin(thresh)
        .filter(col("r") > col("t"))
        .selectNames("n_name", "r")
        .sort(SortKey.desc(col("r")), SortKey.asc(col("n_name")))
        .df
    }, Some("""
      WITH base AS (
        SELECT n_name,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_totalprice > 100000.0
        GROUP BY n_name)
      SELECT n_name, r FROM base
      WHERE r > (SELECT CAST(SUM(CAST(r AS DECIMAL(38,4))) AS DOUBLE) * 0.02 FROM base)
      ORDER BY r DESC, n_name""")),

    // DS Q79 shape: per-(customer, order) line stats filtered on the
    // aggregate, joined back to the customer dimension.
    QueryDef("q216_ds79_order_stats", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir); val c = customer(s, dir)
      Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .groupBy(c("c_custkey"), c("c_name"), o("o_orderkey"))
        .aggregate(
          dsum(rev()).as("r"),
          max(l("l_extendedprice")).as("max_line"),
          count(lit(1)).as("n_lines"))
        .filter(col("n_lines") >= 5)
        .sort(SortKey.desc(col("r")), SortKey.asc(col("o_orderkey")))
        .limit(50)
        .df
    }, Some("""
      SELECT c_custkey, c_name, o_orderkey,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r,
        MAX(l_extendedprice) AS max_line,
        COUNT(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name, o_orderkey
      HAVING COUNT(*) >= 5
      ORDER BY r DESC, o_orderkey LIMIT 50""")),

    // DS Q23 shape: frequent parts ∩ best customers — two semi-join gates
    // feeding one revenue sum.
    QueryDef("q217_ds23_frequent_best", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val l2 = lineitem(s, dir); val o2 = orders(s, dir)
      val freqParts = Table(l2).groupBy(l2("l_partkey"))
        .aggregate(countDistinct(l2("l_orderkey")).as("n_ord"))
        .filter(col("n_ord") > 25)
        .df.select(l2("l_partkey").as("fp"))
      val bestCust = Table(o2).groupBy(o2("o_custkey"))
        .aggregate(dsum(o2("o_totalprice")).as("spend"))
        .sort(SortKey.desc(col("spend")), SortKey.asc(o2("o_custkey")))
        .limit(100)
        .df.select(o2("o_custkey").as("bc"))
      Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .inSubquery(l("l_partkey"), freqParts)
        .inSubquery(o("o_custkey"), bestCust)
        .aggregate(dsum(rev()).as("revenue"))
        .df
    }, Some("""
      WITH freq AS (
        SELECT l_partkey FROM lineitem GROUP BY 1 HAVING COUNT(DISTINCT l_orderkey) > 25),
      best AS (
        SELECT o_custkey FROM orders GROUP BY 1
        ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) DESC, o_custkey
        LIMIT 100)
      SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_partkey IN (SELECT l_partkey FROM freq)
        AND o_custkey IN (SELECT o_custkey FROM best)""")),

    // DS Q31 shape: quarter-over-quarter growth per nation.
    QueryDef("q218_ds31_qoq_growth", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val q = Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .mutate("yq" -> (year(o("o_orderdate")) * 4 + quarter(o("o_orderdate")) - 1))
        .groupBy(n("n_name"), col("yq"))
        .aggregate(dsum(rev()).as("r"))
      val nxt = q.rename("n_name" -> "n2", "yq" -> "yq2", "r" -> "r2")
      val nx = nxt.df
      q.join(nxt, col("n_name") === nx("n2") && nx("yq2") === col("yq") + 1)
        .mutate("growth" -> round(nx("r2") / col("r"), 6))
        .filter(col("growth") > 1.1)
        .selectNames("n_name", "yq", "growth")
        .sort(SortKey.asc(col("n_name")), SortKey.asc(col("yq")))
        .df
    }, Some("""
      WITH q AS (
        SELECT n_name, CAST(YEAR(o_orderdate) * 4 + QUARTER(o_orderdate) - 1 AS INT) AS yq,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT a.n_name, a.yq, ROUND(b.r / a.r, 6) AS growth
      FROM q a JOIN q b ON a.n_name = b.n_name AND b.yq = a.yq + 1
      WHERE b.r / a.r > 1.1
      ORDER BY a.n_name, a.yq""")),

    // DS Q65 shape: under-performing parts (revenue ≤ half the mean part
    // revenue), joined back to the part dimension.
    QueryDef("q219_ds65_low_rev_parts", (s, dir) => {
      val l = lineitem(s, dir); val p = part(s, dir)
      val perPart = Table(l).groupBy(l("l_partkey"))
        .aggregate(dsum(rev()).as("r"))
      val avgR = perPart.aggregate(
        (sum(col("r").cast("decimal(38,4)")).cast("double") / count(col("r"))).as("a"))
      perPart.crossJoin(avgR)
        .filter(col("r") <= col("a") * 0.7)
        .join(Table(p), col("l_partkey") === p("p_partkey"))
        .selectNames("p_partkey", "p_name", "r")
        .sort(SortKey.asc(col("p_partkey")))
        .limit(100)
        .df
    }, Some("""
      WITH per_part AS (
        SELECT l_partkey,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem GROUP BY 1)
      SELECT p_partkey, p_name, r
      FROM per_part JOIN part ON l_partkey = p_partkey
      WHERE r <= (SELECT CAST(SUM(CAST(r AS DECIMAL(38,4))) AS DOUBLE) / COUNT(r) FROM per_part) * 0.7
      ORDER BY p_partkey LIMIT 100""")),

    // DS Q87 shape: customers in channel A but NOT channel B (EXCEPT).
    QueryDef("q221_ds87_channel_except", (s, dir) => {
      val o = orders(s, dir); val l = lineitem(s, dir); val o2 = orders(s, dir)
      val urgent = Table(o).filter(o("o_orderpriority") === "1-URGENT")
        .select(o("o_custkey").as("k")).distinct()
      val returned = Table(l).filter(l("l_returnflag") === "R")
        .join(Table(o2), l("l_orderkey") === o2("o_orderkey"))
        .select(o2("o_custkey").as("k")).distinct()
      urgent.difference(returned)
        .aggregate(count(lit(1)).as("n_only_urgent"))
        .df
    }, Some("""
      SELECT COUNT(*) AS n_only_urgent FROM (
        SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT DISTINCT o_custkey AS k FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'R')""")),

    // DS Q71 shape: channel consolidation — UNION ALL with a channel tag,
    // then one aggregation over the union.
    QueryDef("q222_ds71_channel_union", (s, dir) => {
      val l1 = lineitem(s, dir); val o1 = orders(s, dir)
      val l2 = lineitem(s, dir); val o2 = orders(s, dir)
      val hi = Table(l1)
        .join(Table(o1).filter(o1("o_orderpriority").isin("1-URGENT", "2-HIGH")),
          l1("l_orderkey") === o1("o_orderkey"))
        .mutate("channel" -> lit("priority"),
          "volume" -> l1("l_extendedprice") * (lit(1) - l1("l_discount")))
        .selectNames("channel", "l_returnflag", "volume")
      val lo = Table(l2)
        .join(Table(o2).filter(!o2("o_orderpriority").isin("1-URGENT", "2-HIGH")),
          l2("l_orderkey") === o2("o_orderkey"))
        .mutate("channel" -> lit("standard"),
          "volume" -> l2("l_extendedprice") * (lit(1) - l2("l_discount")))
        .selectNames("channel", "l_returnflag", "volume")
      hi.union(lo)
        .groupByNames("channel", "l_returnflag")
        .aggregate(dsum(col("volume")).as("rev"), count(lit(1)).as("n"))
        .sort(SortKey.asc(col("channel")), SortKey.asc(col("l_returnflag")))
        .df
    }, Some("""
      WITH u AS (
        SELECT 'priority' AS channel, l_returnflag,
          l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION ALL
        SELECT 'standard', l_returnflag, l_extendedprice * (1 - l_discount)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
      SELECT channel, l_returnflag,
        CAST(SUM(CAST(volume AS DECIMAL(38,4))) AS DOUBLE) AS rev, COUNT(*) AS n
      FROM u GROUP BY 1, 2 ORDER BY channel, l_returnflag""")),

    // DS grouping-sets via CUBE: every subset of (orderstatus, priority)
    // with the 4-way grouping id.
    QueryDef("q223_ds_cube", (s, dir) => {
      val o = orders(s, dir)
      Table(o.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"),
          (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
            .cast("int").as("lvl")))
        .sort(SortKey.asc(col("lvl")), SortKey.asc(col("o_orderstatus")),
          SortKey.asc(col("o_orderpriority")))
        .df
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS total,
        CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS lvl
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY lvl, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""")),

    // DS Q97 shape: channel overlap matrix via FULL OUTER join of the two
    // distinct customer sets.
    QueryDef("q224_ds97_full_outer", (s, dir) => {
      val o = orders(s, dir); val l = lineitem(s, dir); val o2 = orders(s, dir)
      val a = Table(o).filter(o("o_orderpriority") === "1-URGENT")
        .select(o("o_custkey").as("ka")).distinct()
      val b = Table(l).filter(l("l_returnflag") === "R")
        .join(Table(o2), l("l_orderkey") === o2("o_orderkey"))
        .select(o2("o_custkey").as("kb")).distinct()
      a.join(b, a.df("ka") === b.df("kb"), how = "full_outer")
        .aggregate(
          count(when(col("ka").isNotNull && col("kb").isNotNull, lit(1))).as("both_channels"),
          count(when(col("kb").isNull, lit(1))).as("urgent_only"),
          count(when(col("ka").isNull, lit(1))).as("returns_only"))
        .df
    }, Some("""
      WITH a AS (SELECT DISTINCT o_custkey AS ka FROM orders WHERE o_orderpriority = '1-URGENT'),
      b AS (SELECT DISTINCT o_custkey AS kb FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'R')
      SELECT
        COUNT(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 1 END) AS both_channels,
        COUNT(CASE WHEN kb IS NULL THEN 1 END) AS urgent_only,
        COUNT(CASE WHEN ka IS NULL THEN 1 END) AS returns_only
      FROM a FULL OUTER JOIN b ON ka = kb""")),

    // DS Q51 shape: cumulative monthly revenue per nation, flagging months
    // that beat the running average (window-over-aggregate, decimal-exact
    // running sums).
    QueryDef("q225_ds51_cumulative", (s, dir) => {
      val l = lineitem(s, dir); val o = orders(s, dir)
      val c = customer(s, dir); val n = nation(s, dir)
      val monthly = Table(l)
        .join(Table(o), l("l_orderkey") === o("o_orderkey"))
        .join(Table(c), o("o_custkey") === c("c_custkey"))
        .join(Table(n), c("c_nationkey") === n("n_nationkey"))
        .mutate("ym" -> (year(o("o_orderdate")) * 12 + month(o("o_orderdate")) - 1))
        .groupBy(n("n_name"), col("ym"))
        .aggregate(dsum(rev()).as("r"))
      val w = Window.partitionBy(col("n_name")).orderBy(col("ym"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .mutate(
          "cum_r" -> sum(col("r").cast("decimal(38,4)")).over(w).cast("double"),
          "run_avg" -> round(sum(col("r").cast("decimal(38,4)")).over(w).cast("double") /
            count(col("r")).over(w), 6))
        .filter(col("r") > col("run_avg") * 1.2)
        .selectNames("n_name", "ym", "r", "cum_r", "run_avg")
        .sort(SortKey.asc(col("n_name")), SortKey.asc(col("ym")))
        .df
    }, Some("""
      WITH monthly AS (
        SELECT n_name, CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS INT) AS ym,
          CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS r
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2),
      cum AS (
        SELECT n_name, ym, r,
          CAST(SUM(CAST(r AS DECIMAL(38,4))) OVER (PARTITION BY n_name ORDER BY ym
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_r,
          ROUND(CAST(SUM(CAST(r AS DECIMAL(38,4))) OVER (PARTITION BY n_name ORDER BY ym
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            / COUNT(r) OVER (PARTITION BY n_name ORDER BY ym
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS run_avg
        FROM monthly)
      SELECT n_name, ym, r, cum_r, run_avg FROM cum
      WHERE r > run_avg * 1.2
      ORDER BY n_name, ym""")),

    // DS Q90 shape: am/pm event-count ratio per event type.
    QueryDef("q220_ds90_ampm_ratio", (s, dir) => {
      val e = events(s, dir)
      Table(e)
        .groupBy(e("event_type"))
        .aggregate(
          count(when(hour(e("ts")) < 12, lit(1))).as("am_cnt"),
          count(when(hour(e("ts")) >= 12, lit(1))).as("pm_cnt"))
        .mutate("ratio" -> round(col("am_cnt").cast("double") / col("pm_cnt"), 6))
        .sort(SortKey.asc(col("event_type")))
        .df
    }, Some("""
      SELECT event_type,
        COUNT(CASE WHEN HOUR(ts::TIMESTAMP) < 12 THEN 1 END) AS am_cnt,
        COUNT(CASE WHEN HOUR(ts::TIMESTAMP) >= 12 THEN 1 END) AS pm_cnt,
        ROUND(COUNT(CASE WHEN HOUR(ts::TIMESTAMP) < 12 THEN 1 END)
          / CAST(COUNT(CASE WHEN HOUR(ts::TIMESTAMP) >= 12 THEN 1 END) AS DOUBLE), 6) AS ratio
      FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
