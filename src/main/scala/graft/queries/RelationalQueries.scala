package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.api.{SortKey, Table}
import graft.functions.ibisfn
import graft.operators.AsofJoin
import Tables._

/** Relational-operator corpus (SURVEY.md §2.1): project/filter/agg/sort/
  * limit/distinct, all join kinds, set ops, pivot, unnest, as-of.
  * Each query is written against the graft.api façade and has a DuckDB
  * oracle (SQL kept column-name-identical for the driver's hash compare). */
object RelationalQueries {

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q1 shape: scan → filter → hash agg (partial+final) → sort.
    // Money sums in DECIMAL(38,4) for order-independent exactness at any
    // partition count (see Tables.dsum).
    QueryDef("q01_agg", (s, dir) => {
      val l = lineitem(s, dir)
      Table(l)
        .filter(col("l_shipdate") <= lit("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .aggregate(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          dmean(col("l_quantity")).as("avg_qty"),
          dmean(col("l_extendedprice")).as("avg_price"),
          dmean(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        // bounded output (returnflag × linestatus domains): single-
        // partition sort skips the range exchange + sampling pass (r15)
        .sortBounded(SortKey.asc(col("l_returnflag")), SortKey.asc(col("l_linestatus")))
        .df
    }, Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
        ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
        ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
        ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(38,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // Project + mutate + filter: derived-column arithmetic stays in one
    // codegen stage over the scan, filter pushed to parquet.
    QueryDef("q02_project_mutate", (s, dir) => {
      Table(part(s, dir))
        .filter(col("p_size") >= 20, col("p_retailprice") > 905.0)
        .mutate(
          "price_tier" -> (col("p_retailprice") / 500).cast("long"),
          "brand_upper" -> upper(col("p_brand")),
          "name_len" -> length(col("p_name")),
          "half_size" -> ibisfn.floorDiv(col("p_size"), lit(2)))
        .selectNames("p_partkey", "p_name", "price_tier", "brand_upper", "name_len", "half_size")
        .sort(SortKey.asc(col("p_partkey")))
        .df
    }, Some("""
      SELECT p_partkey, p_name,
        CAST(FLOOR(p_retailprice / 500) AS BIGINT) AS price_tier,
        UPPER(p_brand) AS brand_upper,
        CAST(LENGTH(p_name) AS INT) AS name_len,
        CAST(FLOOR(p_size / 2.0) AS BIGINT) AS half_size
      FROM part WHERE p_size >= 20 AND p_retailprice > 905
      ORDER BY p_partkey""")),

    // 3-way join → agg → order/limit (TPC-H Q10 shape). EAGER AGGREGATION:
    // lineitem collapses to one exact per-order revenue row BEFORE any join
    // (map-side partial combine, fact table never enters a join at line
    // granularity — the difference between shuffling 600B rows and 150B at
    // the 100 TB target), the count-distinct becomes a plain count, and the
    // per-order 4-decimal-exact revenues re-sum exactly per customer.
    QueryDef("q03_join_agg_top", (s, dir) => {
      val c = customer(s, dir); val o = orders(s, dir); val l = lineitem(s, dir)
      val perOrder = Table(l)
        .groupBy(l("l_orderkey"))
        .aggregate(dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("rev"))
      // c_name is functionally dependent on c_custkey: aggregate on the
      // bare int key and broadcast-attach the name to the |customers|
      // result AFTER the reduction (r15) — the agg exchange carries no
      // strings and the customer probe touches pre-reduced rows, the same
      // strings-leave-the-plan shape q101 uses. Value-identical: the
      // custkey↔name mapping is 1:1 and the join is on the agg's own key.
      Table(o)
        .join(perOrder, o("o_orderkey") === perOrder.df("l_orderkey"))
        .groupBy(o("o_custkey"))
        .aggregate(
          dsum(col("rev")).as("revenue"),
          count(lit(1)).as("n_orders"))
        .join(Table(c).selectNames("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .selectNames("c_custkey", "c_name", "revenue", "n_orders")
        .sort(SortKey.desc(col("revenue")), SortKey.asc(col("c_custkey")))
        .limit(10)
        .df
    }, Some("""
      SELECT c.c_custkey, c.c_name,
        CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        COUNT(DISTINCT o.o_orderkey) AS n_orders
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY c.c_custkey, c.c_name
      ORDER BY revenue DESC, c.c_custkey LIMIT 10""")),

    // Left join preserving unmatched dimension rows + null-safe agg.
    QueryDef("q04_left_join", (s, dir) => {
      val n = nation(s, dir); val c = customer(s, dir)
      Table(n)
        .join(Table(c), n("n_nationkey") === c("c_nationkey"), "left")
        .groupBy(n("n_name"))
        .aggregate(
          count(c("c_custkey")).as("n_customers"),
          coalesce(dsum(c("c_acctbal")), lit(0.0)).as("total_acctbal"))
        .sort(SortKey.asc(col("n_name")))
        .df
    }, Some("""
      SELECT n.n_name, COUNT(c.c_custkey) AS n_customers,
        CAST(COALESCE(SUM(CAST(c.c_acctbal AS DECIMAL(38,4))), 0) AS DOUBLE) AS total_acctbal
      FROM nation n LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name ORDER BY n.n_name""")),

    // Every join kind in one scalar row: inner/left/right/full/semi/anti/cross.
    QueryDef("q05_join_kinds", (s, dir) => {
      val c = Table(customer(s, dir)).filter(col("c_custkey") < 500)
      val o = Table(orders(s, dir))
      def cnt(t: Table, name: String): DataFrame =
        t.aggregate(count(lit(1)).as(name)).df
      val on = c.df("c_custkey") === o.df("o_custkey")
      val inner = cnt(c.join(o, on, "inner"), "inner_cnt")
      val left = cnt(c.join(o, on, "left"), "left_cnt")
      val right = cnt(c.join(o, on, "right"), "right_cnt")
      val full = cnt(c.join(o, on, "full"), "full_cnt")
      val semi = cnt(c.join(o, on, "semi"), "semi_cnt")
      val anti = cnt(c.join(o, on, "anti"), "anti_cnt")
      val cross = cnt(Table(region(s, dir)).crossJoin(Table(nation(s, dir))), "cross_cnt")
      Seq(left, right, full, semi, anti, cross).foldLeft(inner)(_ crossJoin _)
    }, Some("""
      SELECT
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c JOIN orders o ON c.c_custkey = o.o_custkey) AS inner_cnt,
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c LEFT JOIN orders o ON c.c_custkey = o.o_custkey) AS left_cnt,
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c RIGHT JOIN orders o ON c.c_custkey = o.o_custkey) AS right_cnt,
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c FULL JOIN orders o ON c.c_custkey = o.o_custkey) AS full_cnt,
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c WHERE EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)) AS semi_cnt,
        (SELECT COUNT(*) FROM (SELECT * FROM customer WHERE c_custkey < 500) c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE c.c_custkey = o.o_custkey)) AS anti_cnt,
        (SELECT COUNT(*) FROM region r CROSS JOIN nation n) AS cross_cnt""")),

    // Semi join (ibis ExistsSubquery lowering — SURVEY.md §2.4 subqueries).
    QueryDef("q06_semi_join", (s, dir) => {
      val c = Table(customer(s, dir))
      val big = Table(orders(s, dir)).filter(col("o_totalprice") > 150000.0, col("o_orderstatus") === "F")
      c.join(big, c.df("c_custkey") === big.df("o_custkey"), "semi")
        .selectNames("c_custkey", "c_name", "c_mktsegment")
        .sort(SortKey.asc(col("c_custkey")))
        .limit(15)
        .df
    }, Some("""
      SELECT c_custkey, c_name, c_mktsegment FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 150000 AND o.o_orderstatus = 'F')
      ORDER BY c_custkey LIMIT 15""")),

    // Anti join (NOT EXISTS).
    QueryDef("q07_anti_join", (s, dir) => {
      val c = Table(customer(s, dir))
      val o = Table(orders(s, dir)).filter(col("o_orderstatus") === "P")
      c.join(o, c.df("c_custkey") === o.df("o_custkey"), "anti")
        .selectNames("c_custkey", "c_name")
        .sort(SortKey.asc(col("c_custkey")))
        .df
    }, Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
      ORDER BY c_custkey""")),

    // Set ops: union all / union distinct counts.
    QueryDef("q08_union", (s, dir) => {
      val ck = Table(customer(s, dir)).select(col("c_nationkey").as("k"))
      val sk = Table(supplier(s, dir)).select(col("s_nationkey").as("k"))
      val all = ck.union(sk).aggregate(count(lit(1)).as("union_all_cnt")).df
      val dist = ck.union(sk, distinct = true).aggregate(count(lit(1)).as("union_distinct_cnt")).df
      all.crossJoin(dist)
    }, Some("""
      SELECT
        (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)) AS union_all_cnt,
        (SELECT COUNT(*) FROM (SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)) AS union_distinct_cnt""")),

    // Intersect + difference, tagged.
    QueryDef("q09_intersect_except", (s, dir) => {
      val ck = Table(customer(s, dir)).filter(col("c_custkey") < 80).select(col("c_custkey").as("k"))
      val ok = Table(orders(s, dir)).select(col("o_custkey").as("k"))
      val both = ck.intersect(ok).mutate("tag" -> lit("both"))
      val onlyC = ck.difference(ok).mutate("tag" -> lit("cust_only"))
      both.union(onlyC).sort(SortKey.asc(col("tag")), SortKey.asc(col("k"))).df
    }, Some("""
      SELECT k, 'both' AS tag FROM (SELECT c_custkey AS k FROM customer WHERE c_custkey < 80 INTERSECT SELECT o_custkey FROM orders)
      UNION ALL
      SELECT k, 'cust_only' AS tag FROM (SELECT c_custkey AS k FROM customer WHERE c_custkey < 80 EXCEPT SELECT o_custkey FROM orders)
      ORDER BY tag, k""")),

    // distinct → sort → offset/limit (ibis Limit with offset).
    QueryDef("q10_distinct_limit_offset", (s, dir) => {
      Table(orders(s, dir))
        .select(col("o_orderpriority"))
        .distinct()
        .sort(SortKey.asc(col("o_orderpriority")))
        .limit(3, offset = 1)
        .df
    }, Some("""
      SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority LIMIT 3 OFFSET 1""")),

    // group-by + having (post-agg filter, ibis GroupedTable.having).
    QueryDef("q11_having", (s, dir) => {
      Table(orders(s, dir))
        .groupBy(col("o_custkey"))
        .having(Seq(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend")),
          col("n_orders") >= 8)
        .sort(SortKey.desc(col("n_orders")), SortKey.asc(col("o_custkey")))
        .limit(20)
        .df
    }, Some("""
      SELECT o_custkey, COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS DOUBLE) AS spend
      FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 8
      ORDER BY n_orders DESC, o_custkey LIMIT 20""")),

    // ibis ranking-function semantics: 0-indexed rank/dense_rank/row_number/
    // ntile (rewrites.py:490-498), default cumulative frame for running sum.
    QueryDef("q12_window_rank", (s, dir) => {
      // the o_custkey < 30 cut bounds the frame at ~300 rows at ANY SF
      // (orders-per-customer is SF-invariant): ship the filtered rows to
      // ONE partition up front — the scan stays parallel (repartition,
      // not coalesce), SinglePartition satisfies every window spec and
      // the final sort, so the whole tail is one exchange-free stage
      // (r15; was hash exchange + range exchange + range-sampling pass)
      val o = Table(orders(s, dir).filter(col("o_custkey") < 30).repartition(1))
      val wPrice = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      val wTier = Window.partitionBy(col("o_custkey"))
        .orderBy((col("o_totalprice") / 50000).cast("long").desc)
      val wDate = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      o.mutate(
          "rn0" -> ibisfn.rowNumber0(wPrice),
          "rank0" -> (rank().over(wTier) - 1),
          "dense0" -> (dense_rank().over(wTier) - 1),
          "ntile0" -> ibisfn.ntile0(4, wPrice),
          "pct_rank" -> round(percent_rank().over(wPrice), 6),
          "cume" -> round(cume_dist().over(wPrice), 6),
          "prev_price" -> lag(col("o_totalprice"), 1).over(wDate),
          "next_price" -> lead(col("o_totalprice"), 1).over(wDate),
          "running_spend" -> sum(col("o_totalprice").cast("decimal(38,4)"))
            .over(wDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("double"))
        .selectNames("o_custkey", "o_orderkey", "rn0", "rank0", "dense0", "ntile0",
          "pct_rank", "cume", "prev_price", "next_price", "running_spend")
        .sort(SortKey.asc(col("o_custkey")), SortKey.asc(col("o_orderkey")))
        .df
    }, Some("""
      SELECT o_custkey, o_orderkey,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) - 1 AS INT) AS rn0,
        CAST(RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(FLOOR(o_totalprice / 50000) AS BIGINT) DESC) - 1 AS INT) AS rank0,
        CAST(DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY CAST(FLOOR(o_totalprice / 50000) AS BIGINT) DESC) - 1 AS INT) AS dense0,
        CAST(NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) - 1 AS INT) AS ntile0,
        ROUND(PERCENT_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey), 6) AS pct_rank,
        ROUND(CUME_DIST() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey), 6) AS cume,
        LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders WHERE o_custkey < 30
      ORDER BY o_custkey, o_orderkey""")),

    // Event-sequence analytics: per-user gaps via lag over event time.
    QueryDef("q13_event_gaps", (s, dir) => {
      val e = Table(events(s, dir)).filter(col("user_id") < 5)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      e.mutate(
          "prev_type" -> lag(col("event_type"), 1).over(w),
          "gap_us" -> (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)))
        .selectNames("event_id", "user_id", "event_type", "prev_type", "gap_us")
        .sort(SortKey.asc(col("user_id")), SortKey.asc(col("event_id")))
        .df
    }, Some("""
      SELECT event_id, user_id, event_type,
        LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS prev_type,
        epoch_us(ts::TIMESTAMP) - LAG(epoch_us(ts::TIMESTAMP), 1) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS gap_us
      FROM events WHERE user_id < 5
      ORDER BY user_id, event_id""")),

    // ibis topk (relations.py:5320): group-count-sort-limit, distributed.
    QueryDef("q14_topk", (s, dir) => {
      Table(orders(s, dir)).topk(col("o_orderpriority"), 3, "count").df
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS count FROM orders
      GROUP BY o_orderpriority ORDER BY count DESC, o_orderpriority LIMIT 3""")),

    // ibis value_counts.
    QueryDef("q15_value_counts", (s, dir) => {
      Table(orders(s, dir))
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .count("cnt")
        .sort(SortKey.asc(col("o_orderstatus")), SortKey.asc(col("o_orderpriority")))
        .df
    }, Some("""
      SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt FROM orders
      GROUP BY 1, 2 ORDER BY 1, 2""")),

    // pivot_wider → groupBy().pivot().agg() with explicit value list.
    QueryDef("q16_pivot_wider", (s, dir) => {
      Table(orders(s, dir))
        .pivotWider(Seq("o_orderstatus"), "o_orderpriority", col("o_orderkey"), c => count(c),
          values = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .sort(SortKey.asc(col("o_orderstatus")))
        .df
    }, Some("""
      SELECT o_orderstatus,
        NULLIF(COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN o_orderkey END), 0) AS "1-URGENT",
        NULLIF(COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN o_orderkey END), 0) AS "2-HIGH",
        NULLIF(COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN o_orderkey END), 0) AS "3-MEDIUM",
        NULLIF(COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN o_orderkey END), 0) AS "4-NOT SPECIFIED",
        NULLIF(COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN o_orderkey END), 0) AS "5-LOW"
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // pivot_longer via stack (unnest-of-struct-array lowering).
    QueryDef("q17_pivot_longer", (s, dir) => {
      Table(customer(s, dir))
        .filter(col("c_custkey") < 10)
        .mutate("acctbal" -> col("c_acctbal"), "nationkey" -> col("c_nationkey").cast("double"))
        .selectNames("c_custkey", "acctbal", "nationkey")
        .pivotLonger(Seq("c_custkey"), Seq("acctbal", "nationkey"), "metric", "value")
        .sort(SortKey.asc(col("c_custkey")), SortKey.asc(col("metric")))
        .df
    }, Some("""
      SELECT c_custkey, metric, value FROM (
        SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS value FROM customer WHERE c_custkey < 10
        UNION ALL
        SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS value FROM customer WHERE c_custkey < 10)
      ORDER BY c_custkey, metric""")),

    // TableUnnest with position column (relations.py:499-520).
    QueryDef("q18_unnest", (s, dir) => {
      Table(documents(s, dir))
        .filter(col("doc_id") < 5)
        .mutate("words" -> split(col("text"), " "))
        .unnest("words", offset = Some("pos"))
        .select(col("doc_id"), col("pos"), col("words").as("word"))
        .sort(SortKey.asc(col("doc_id")), SortKey.asc(col("pos")))
        .df
    }, Some("""
      SELECT doc_id, CAST(generate_subscripts(w, 1) - 1 AS INT) AS pos, unnest(w) AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id < 5)
      ORDER BY doc_id, pos""")),

    // As-of join (no Spark primitive — union+window impl, AsofJoin.scala).
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    QueryDef("q19_asof_join", (s, dir) => {
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("value").as("click_value"))
      val joined = AsofJoin(purchases, clicks, col("ts"), col("cts"),
        by = Seq("user_id" -> "cu"))
      joined.select(
          col("event_id"), col("user_id"),
          col("click_value"),
          (unix_micros(col("ts")) - unix_micros(col("cts"))).as("us_since_click"))
        .orderBy(col("event_id").asc)
    }, Some("""
      SELECT a.event_id, a.user_id, b.value AS click_value,
        epoch_us(a.ts::TIMESTAMP) - epoch_us(b.ts::TIMESTAMP) AS us_since_click
      FROM (SELECT * FROM events WHERE event_type = 'purchase') a
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.ts::TIMESTAMP >= b.ts::TIMESTAMP
      ORDER BY a.event_id""")),

    // As-of join with tolerance: matches older than 1h are nulled.
    QueryDef("q20_asof_tolerance", (s, dir) => {
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("value").as("click_value"))
      AsofJoin(purchases, clicks, col("ts"), col("cts"),
          by = Seq("user_id" -> "cu"), tolerance = Some("INTERVAL 1 HOUR"))
        .select(col("event_id"), col("user_id"), col("click_value"))
        .orderBy(col("event_id").asc)
    }, Some("""
      SELECT a.event_id, a.user_id,
        CASE WHEN a.ts::TIMESTAMP - b.ts::TIMESTAMP <= INTERVAL 1 HOUR THEN b.value END AS click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') a
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.ts::TIMESTAMP >= b.ts::TIMESTAMP
      ORDER BY a.event_id""")),

    // Forward as-of: the next click at-or-after each purchase within the
    // tolerance (ibis spells this by passing `left <= right` as the asof
    // `on` predicate; DuckDB ASOF flips the same way).
    QueryDef("q20b_asof_forward", (s, dir) => {
      val e = events(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("value").as("click_value"))
      AsofJoin(purchases, clicks, col("ts"), col("cts"),
          by = Seq("user_id" -> "cu"), tolerance = Some("INTERVAL 1 HOUR"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("click_value"))
        .orderBy(col("event_id").asc)
    }, Some("""
      SELECT a.event_id, a.user_id,
        CASE WHEN b.ts::TIMESTAMP - a.ts::TIMESTAMP <= INTERVAL 1 HOUR THEN b.value END AS click_value
      FROM (SELECT * FROM events WHERE event_type = 'purchase') a
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        ON a.user_id = b.user_id AND a.ts::TIMESTAMP <= b.ts::TIMESTAMP
      ORDER BY a.event_id""")),

    // Positional join of two independently sorted projections.
    QueryDef("q21_positional_join", (s, dir) => {
      val byKey = Table(nation(s, dir)).sort(SortKey.asc(col("n_nationkey")))
        .select(col("n_nationkey"))
      val byName = Table(nation(s, dir)).sort(SortKey.asc(col("n_name")))
        .select(col("n_name"))
      byKey.positionalJoin(byName)
        .sort(SortKey.asc(col("n_nationkey")))
        .df
    }, Some("""
      SELECT a.n_nationkey, b.n_name
      FROM (SELECT n_nationkey, ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rn FROM nation) a
      JOIN (SELECT n_name, ROW_NUMBER() OVER (ORDER BY n_name) AS rn FROM nation) b USING (rn)
      ORDER BY a.n_nationkey""")),

    // ClickHouse-style any_left join: at most one right match.
    QueryDef("q22_any_join", (s, dir) => {
      val n = Table(nation(s, dir))
      val c = Table(customer(s, dir))
      // deterministic "any": right side reduced to min c_custkey per nation
      n.anyJoin(c, Seq("n_nationkey"), Seq("c_nationkey"), "any_left", orderCols = Seq("c_custkey"))
        .selectNames("n_nationkey", "n_name", "c_custkey")
        .sort(SortKey.asc(col("n_nationkey")))
        .df
    }, Some("""
      SELECT n.n_nationkey, n.n_name, c.c_custkey
      FROM nation n LEFT JOIN (
        SELECT c_nationkey, c_custkey FROM (
          SELECT c_nationkey, c_custkey,
            ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
          FROM customer) WHERE rn = 1) c
        ON n.n_nationkey = c.c_nationkey
      ORDER BY n.n_nationkey""")),

    // FillNull / DropNull (nulls manufactured via NULLIF).
    QueryDef("q23_fill_drop_null", (s, dir) => {
      val c = Table(customer(s, dir))
        .mutate("seg" -> nullif(col("c_mktsegment"), lit("BUILDING")),
          "bal" -> when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .selectNames("c_custkey", "seg", "bal")
      val filled = c.fillNull(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
      val dropped = c.dropNull("any")
      filled.aggregate(
          count(lit(1)).as("filled_rows"),
          count(when(col("seg") === "UNKNOWN", lit(1))).as("filled_seg"),
          dsum(col("bal")).as("filled_bal_sum")).df
        .crossJoin(dropped.aggregate(count(lit(1)).as("dropped_rows")).df)
    }, Some("""
      WITH c AS (SELECT c_custkey, NULLIF(c_mktsegment, 'BUILDING') AS seg,
                   CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal FROM customer)
      SELECT
        (SELECT COUNT(*) FROM c) AS filled_rows,
        (SELECT COUNT(*) FROM c WHERE COALESCE(seg, 'UNKNOWN') = 'UNKNOWN') AS filled_seg,
        CAST((SELECT SUM(CAST(COALESCE(bal, 0.0) AS DECIMAL(38,4))) FROM c) AS DOUBLE) AS filled_bal_sum,
        (SELECT COUNT(*) FROM c WHERE seg IS NOT NULL AND bal IS NOT NULL) AS dropped_rows"""))
  )
}
