package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import graft.functions.ibisfn
import Tables._

/** Reduction corpus (SURVEY.md §2.2): plain/filtered/ordered reductions,
  * distinct counts, statistical moments, quantiles, argmin/argmax,
  * collect/group_concat, deterministic mode. */
object AggregationQueries {

  val defs: Seq[QueryDef] = Seq(

    // The basic reduction battery, grouped.
    QueryDef("q30_reductions", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .groupBy(col("l_returnflag"))
        .aggregate(
          count(lit(1)).as("n"),
          count(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("first_ship"),
          date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("last_ship"),
          sum(col("l_linenumber").cast("long")).as("sum_line"),
          bool_and(col("l_quantity") > 0).as("all_pos"),
          bool_or(col("l_discount") > 0.09).as("any_big_disc"))
        .sort(SortKey.asc(col("l_returnflag")))
        .df
    }, Some("""
      SELECT l_returnflag, COUNT(*) AS n, COUNT(l_suppkey) AS n_supp,
        COUNT(DISTINCT l_suppkey) AS nd_supp,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
        STRFTIME(MIN(l_shipdate), '%Y-%m-%d') AS first_ship, STRFTIME(MAX(l_shipdate), '%Y-%m-%d') AS last_ship,
        CAST(SUM(l_linenumber) AS BIGINT) AS sum_line,
        BOOL_AND(l_quantity > 0) AS all_pos,
        BOOL_OR(l_discount > 0.09) AS any_big_disc
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Filtered reductions (ibis `where=` on every reduction,
    // reductions.py:28-29): agg(when(p, x)) ≡ FILTER (WHERE p).
    QueryDef("q31_filtered_agg", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .groupBy(col("l_linestatus"))
        .aggregate(
          ibisfn.aggFiltered(sum(_: org.apache.spark.sql.Column),
            col("l_quantity").cast("decimal(38,4)"), col("l_discount") > 0.05)
            .cast("double").as("qty_highdisc"),
          count(when(col("l_returnflag") === "R", lit(1))).as("n_returned"),
          countDistinct(when(col("l_returnflag") === "R", col("l_partkey"))).as("nd_part_returned"),
          ibisfn.aggFiltered(avg, col("l_tax"), col("l_tax") > 0).as("avg_pos_tax"))
        .mutate("avg_pos_tax" -> round(col("avg_pos_tax"), 6))
        .sort(SortKey.asc(col("l_linestatus")))
        .df
    }, Some("""
      SELECT l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_highdisc,
        COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
        COUNT(DISTINCT l_partkey) FILTER (WHERE l_returnflag = 'R') AS nd_part_returned,
        ROUND(AVG(l_tax) FILTER (WHERE l_tax > 0), 6) AS avg_pos_tax
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ArgMax/ArgMin → max_by/min_by with a composite (value, tiebreak) key
    // so the pick is deterministic cross-engine.
    QueryDef("q32_argminmax", (s, dir) => {
      val o = orders(s, dir)
      Table(o)
        .groupBy(col("o_orderstatus"))
        .aggregate(
          max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_order"),
          min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
          max_by(col("o_orderpriority"), struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_prio"))
        .sort(SortKey.asc(col("o_orderstatus")))
        .df
    }, Some("""
      SELECT o_orderstatus,
        MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS priciest_order,
        MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS cheapest_order,
        MAX(CASE WHEN rmax = 1 THEN o_orderpriority END) AS priciest_prio
      FROM (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
          ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Statistical moments incl. SAMPLE skew/kurtosis (the op the reference's
    // own pyspark backend rejects — ibisfn.kurtosisSample composes it from
    // Spark's single-pass population moments).
    QueryDef("q33_stats", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .groupBy(col("l_returnflag"))
        .aggregate(
          round(stddev_samp(col("l_extendedprice")), 4).as("sd_samp"),
          round(stddev_pop(col("l_extendedprice")), 4).as("sd_pop"),
          round(var_samp(col("l_quantity")), 6).as("var_samp"),
          round(var_pop(col("l_quantity")), 6).as("var_pop"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("covar_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("covar_p"),
          round(ibisfn.skewnessSample(col("l_extendedprice")), 6).as("skew"),
          round(ibisfn.kurtosisSample(col("l_extendedprice")), 6).as("kurt"),
          // Correlation(how="sample") via the mergeable-moments Aggregator
          // (graft.functions.Udfs.corrSample) — the reference's pyspark
          // backend raises on this; numerically ≡ CORR (the n-1 cancels).
          round(udaf(graft.functions.Udfs.corrSample)
            .apply(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp2"))
        .sort(SortKey.asc(col("l_returnflag")))
        .df
    }, Some("""
      SELECT l_returnflag,
        ROUND(STDDEV_SAMP(l_extendedprice), 4) AS sd_samp,
        ROUND(STDDEV_POP(l_extendedprice), 4) AS sd_pop,
        ROUND(VAR_SAMP(l_quantity), 6) AS var_samp,
        ROUND(VAR_POP(l_quantity), 6) AS var_pop,
        ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp,
        ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_s,
        ROUND(COVAR_POP(l_quantity, l_extendedprice), 4) AS covar_p,
        ROUND(SKEWNESS(l_extendedprice), 6) AS skew,
        ROUND(KURTOSIS(l_extendedprice), 6) AS kurt,
        ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qp2
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Exact quantiles: Median / Quantile / MultiQuantile (linear interp —
    // Spark `percentile` ≡ DuckDB `quantile_cont`).
    QueryDef("q34_quantiles", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .groupBy(col("l_linestatus"))
        .aggregate(
          round(median(col("l_quantity")), 4).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.25)), 4).as("p25_price"),
          round(percentile(col("l_extendedprice"), lit(0.9)), 4).as("p90_price"),
          round(element_at(percentile(col("l_quantity"), array(lit(0.1), lit(0.5), lit(0.99))), 2), 4).as("p50_qty"))
        .sort(SortKey.asc(col("l_linestatus")))
        .df
    }, Some("""
      SELECT l_linestatus,
        ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS med_qty,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price,
        ROUND(QUANTILE_CONT(l_extendedprice, 0.9), 4) AS p90_price,
        ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Approx sketches (HLL++, t-digest): engine-specific internals → no SQL
    // oracle; driver records rows-only. Sanity ranges asserted in ScalaTest.
    QueryDef("q35_approx", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .groupBy(col("l_returnflag"))
        .aggregate(
          approx_count_distinct(col("l_partkey")).as("approx_nd_part"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx_med_price"))
        .sort(SortKey.asc(col("l_returnflag")))
        .df
    }, None),

    // ArrayCollect (ordered, distinct) + GroupConcat with order_by
    // (reductions.py:59,82).
    QueryDef("q36_collect_concat", (s, dir) => {
      val o = orders(s, dir)
      Table(o)
        .filter(col("o_custkey") < 10)
        .groupBy(col("o_custkey"))
        .aggregate(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          array_join(array_sort(collect_list(col("o_orderpriority"))), "|").as("prios"),
          size(collect_list(col("o_orderkey"))).as("n_orders"))
        .sort(SortKey.asc(col("o_custkey")))
        .df
    }, Some("""
      SELECT o_custkey,
        ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT o_orderstatus)), ',') AS statuses,
        ARRAY_TO_STRING(LIST_SORT(LIST(o_orderpriority)), '|') AS prios,
        CAST(COUNT(*) AS INT) AS n_orders
      FROM orders WHERE o_custkey < 10 GROUP BY o_custkey ORDER BY o_custkey""")),

    // ibis Mode (reductions.py:354) with a DETERMINISTIC tie-break
    // (smallest value wins) — engine-native `mode` is tie-arbitrary, so the
    // engine lowers mode to count+rank, which also distributes better than
    // a single-reducer mode at scale.
    QueryDef("q37_mode", (s, dir) => {
      val l = lineitem(s, dir)
      val counted = Table(l)
        .mutate("qty_bucket" -> col("l_quantity").cast("int"))
        .groupBy(col("l_returnflag"), col("qty_bucket"))
        .count("cnt")
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("cnt").desc, col("qty_bucket").asc)
      // the counted frame is bounded by the (returnflag × qty-bucket)
      // domain (~150 rows at any SF): merge the final-agg stage to one
      // partition so the rank window and final sort run exchange-free
      // (r15; the map-side partial aggregation above stays parallel)
      Table(counted.df.coalesce(1))
        .mutate("rn" -> row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("qty_bucket").as("mode_qty"), col("cnt").as("mode_n"))
        .sort(SortKey.asc(col("l_returnflag")))
        .df
    }, Some("""
      SELECT l_returnflag, qty_bucket AS mode_qty, cnt AS mode_n FROM (
        SELECT l_returnflag, qty_bucket, cnt,
          ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cnt DESC, qty_bucket) AS rn
        FROM (SELECT l_returnflag, CAST(l_quantity AS INT) AS qty_bucket, COUNT(*) AS cnt
              FROM lineitem GROUP BY 1, 2))
      WHERE rn = 1 ORDER BY l_returnflag""")),

    // First/Last as ordered reductions (reductions.py:39-49): first by time
    // ≡ min_by(x, time); plus window first_value/last_value/nth_value (0-idx).
    QueryDef("q38_first_last", (s, dir) => {
      val o = orders(s, dir)
      Table(o)
        .filter(col("o_custkey") < 20)
        .groupBy(col("o_custkey"))
        .aggregate(
          min_by(col("o_orderpriority"), struct(col("o_orderdate"), col("o_orderkey"))).as("first_prio"),
          max_by(col("o_orderpriority"), struct(col("o_orderdate"), col("o_orderkey"))).as("last_prio"),
          min_by(col("o_totalprice"), struct(col("o_orderdate"), col("o_orderkey"))).as("first_price"))
        .sort(SortKey.asc(col("o_custkey")))
        .df
    }, Some("""
      SELECT o_custkey,
        MAX(CASE WHEN rfirst = 1 THEN o_orderpriority END) AS first_prio,
        MAX(CASE WHEN rlast = 1 THEN o_orderpriority END) AS last_prio,
        MAX(CASE WHEN rfirst = 1 THEN o_totalprice END) AS first_price
      FROM (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rfirst,
          ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rlast
        FROM orders WHERE o_custkey < 20)
      GROUP BY o_custkey ORDER BY o_custkey""")),

    // CountStar vs Count(col) null-skipping, CountDistinctStar, bool sums.
    QueryDef("q39_count_semantics", (s, dir) => {
      val c = customer(s, dir)
      val t = Table(c).mutate(
        "seg_n" -> nullif(col("c_mktsegment"), lit("MACHINERY")),
        "is_rich" -> (col("c_acctbal") > 5000.0))
      t.aggregate(
          count(lit(1)).as("n_star"),
          count(col("seg_n")).as("n_seg"),
          countDistinct(struct(col("c_nationkey"), col("c_mktsegment"))).as("nd_rows"),
          sum(col("is_rich").cast("long")).as("n_rich"))
        .df
    }, Some("""
      SELECT COUNT(*) AS n_star,
        COUNT(NULLIF(c_mktsegment, 'MACHINERY')) AS n_seg,
        COUNT(DISTINCT ROW(c_nationkey, c_mktsegment)) AS nd_rows,
        CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS n_rich
      FROM customer"""))
  )
}
