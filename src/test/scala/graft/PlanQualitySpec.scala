package graft

/** Plan-quality regressions: the optimizations we rely on at 100 TB must be
  * visible in the physical plan — filters reaching the parquet scan, column
  * pruning, broadcast strategies for dimension sides, TakeOrderedAndProject
  * for order+limit, null-aware anti join for NOT IN, whole-stage codegen on
  * the hot path, and no accidental cartesian products. A change that
  * silently degrades one of these passes correctness but fails here.
  *
  * Plans are rendered with AQE off: the adaptive wrapper hides the concrete
  * operators (and codegen markers) until runtime, while the statically
  * planned tree shows exactly what AQE starts from. */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  /** Column list of the first FileScan over the named table. */
  private def scanColumns(p: String, table: String): Seq[String] = {
    val line = p.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains(s"$table.parquet"))
      .getOrElse(fail(s"no FileScan for $table in:\n$p"))
    val cols = line.substring(line.indexOf('[') + 1, line.indexOf(']'))
    cols.split(",").toSeq
  }

  test("q01 scan: filter pushed down and schema pruned to the used columns") {
    val p = plan("q01_agg")
    assert(p.contains("PushedFilters: [IsNotNull"), "no pushed filters on the lineitem scan")
    val cols = scanColumns(p, "lineitem")
    assert(cols.size <= 7, s"lineitem has 11 columns; q01 should read <=7, got $cols")
  }

  test("q03 three-way join broadcasts the dimension sides") {
    val p = plan("q03_join_agg_top")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast joins for customer/orders")
    assert(!p.contains("CartesianProduct"), "cartesian product in a key equi-join")
  }

  test("q14 topk compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q14_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q101 pre-cuts both fact sides below the orderkey exchange") {
    // The SF100 gate depends on both 1/5 region cuts happening BEFORE the
    // only wide shuffle: lineitem and orders must each hit their broadcast
    // dimension-map join (supplier keys / customer keys) below the
    // o_orderkey exchange, and the plan must carry exactly one exchange
    // pair for the fact join (plus agg + sort exchanges). Force BT=-1 so
    // tiny sf0.001 sides can't accidentally broadcast the fact join itself
    // — the broadcast() hints on the dimension maps override it.
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = try plan("q101_tpch5_local_volume")
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    val lines = p.linesIterator.toSeq
    for (fact <- Seq("lineitem", "orders")) {
      val scanIdx = lines.indexWhere(l =>
        l.contains("FileScan parquet") && l.contains(s"$fact.parquet"))
      assert(scanIdx >= 0, s"no $fact scan:\n$p")
      val above = lines.take(scanIdx).reverse
      val bhj = above.indexWhere(_.contains("BroadcastHashJoin"))
      val ex = above.indexWhere(_.contains("Exchange hashpartitioning"))
      assert(bhj >= 0 && ex >= 0 && bhj < ex,
        s"$fact side not cut by a broadcast join below its exchange:\n$p")
    }
    // exactly one wide exchange per fact side, keyed on the orderkey join
    // (the BT=-1 override also de-broadcasts the tiny dimension-map builds
    // into SMJs — those exchanges live inside BroadcastExchange subtrees
    // and are irrelevant at scale, so count only the fact-key exchanges)
    for (key <- Seq("l_orderkey", "o_orderkey")) {
      val n = lines.count(l => l.contains("Exchange hashpartitioning(" + key))
      assert(n == 1, s"expected exactly one $key exchange, got $n:\n$p")
    }
  }

  test("q101 six-way TPC-H join: all equi-joins, no cartesian") {
    val p = plan("q101_tpch5_local_volume")
    assert(!p.contains("CartesianProduct"), "cartesian product in TPC-H Q5 shape")
    assert(p.contains("BroadcastHashJoin"), "region/nation should broadcast")
  }

  test("q26 NOT IN plans as a broadcast null-aware anti join, not a nested loop") {
    val p = plan("q26_in_subquery")
    // BroadcastHashJoinExec prints `..., LeftAnti, BuildRight, true` when
    // isNullAwareAntiJoin is set
    assert(p.contains("LeftAnti, BuildRight, true"),
      s"null-aware anti join shape not found:\n$p")
  }

  test("whole-stage codegen covers the scan+filter+agg pipeline of q01") {
    val p = plan("q01_agg")
    assert(p.contains("*("), "q01 lost whole-stage codegen (no *(n) stages in plan)")
  }

  test("q03 aggregates the fact table BELOW the joins (eager aggregation)") {
    val p = plan("q03_join_agg_top")
    // the lineitem branch must hit a HashAggregate before any join operator:
    // find the FileScan line for lineitem and walk up — in the rendered tree
    // the per-order aggregate prints between the scan and the first join
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.indexWhere(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(scanIdx >= 0, "no lineitem scan")
    val above = lines.take(scanIdx).reverse
    val aggIdx = above.indexWhere(_.contains("HashAggregate"))
    val joinIdx = above.indexWhere(_.contains("Join"))
    assert(aggIdx >= 0 && (joinIdx < 0 || aggIdx < joinIdx),
      s"lineitem joins before aggregating:\n$p")
  }

  test("q101 pre-aggregates lineitem per (order, nation) below its exchange") {
    val p = plan("q101_tpch5_local_volume")
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.indexWhere(l => l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(scanIdx >= 0, "no lineitem scan")
    // walking up from the scan, the per-(order, nation) partial aggregate
    // must come before the shuffle — the exchange pair ships pre-summed
    // rows (~4x fewer), and its partitioning doubles as the join's
    val above = lines.take(scanIdx).reverse
    val aggIdx = above.indexWhere(_.contains("HashAggregate"))
    val exIdx = above.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(aggIdx >= 0 && exIdx >= 0 && aggIdx < exIdx,
      s"lineitem ships un-aggregated rows into the exchange:\n$p")
  }

  test("q65e repeated-span removal: keyed exchanges only, no cartesian, no corpus window") {
    val p = plan("q65e_repeated_spans")
    assert(!p.contains("CartesianProduct"), s"cartesian in span dedup:\n$p")
    // the only Windows are the test-harness corpus construction (lead
    // over doc_id, one per derived branch); the operator itself must not
    // add any
    assert(p.linesIterator.filter(_.contains("Window ")).forall(_.contains("lead(")),
      s"span-merge regressed to a window plan:\n$p")
    // (no exchange assertion: the lead-window corpus construction makes
    // the whole test plan SinglePartition, which satisfies every
    // distribution — the operator's exchanges only materialize on
    // multi-partition input)
  }

  test("q87d DSIR scoring is map-side: no exchange in the scoring plan") {
    // dsirLogWeights trains via one collected aggregation, then scoring is
    // a pure projection — the scored frame's plan must not shuffle
    val df = graft.operators.Splits.dsirLogWeights(
      graft.queries.Tables.documents(spark, sfDir), "text",
      org.apache.spark.sql.functions.col("source") === "src0", buckets = 16)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try df.queryExecution.executedPlan.toString
            finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(!p.contains("Exchange"), s"DSIR scoring should be map-side:\n$p")
    assert(p.contains("FileScan"), "expected a single scan")
  }

  test("q63 keep-first dedup is an aggregation with map-side partials, not a window") {
    val p = plan("q63_dedup_keep_first")
    // min_by with a struct buffer plans as SortAggregate (immutable buffer
    // type) — still partial-aggregated before the exchange, which is the
    // property that matters at scale; a Window operator would mean the
    // full-sort-per-group plan crept back in
    assert(p.contains("Aggregate"), s"expected an aggregation:\n$p")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      s"window operator left in the dedup plan:\n$p")
    val lines = p.linesIterator.toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(exIdx >= 0 && lines.drop(exIdx).exists(_.contains("Aggregate")),
      s"no partial aggregate below the shuffle:\n$p")
  }

  test("batch tumble groups on a primitive bucket (no window struct)") {
    val p = plan("q80_tumble")
    assert(!p.toLowerCase.contains("timewindow"),
      s"batch tumble still materializes the window struct:\n$p")
  }

  test("packByBudget never plans an unpartitioned window — global path included") {
    // The shard-less path must be the distributed prefix sum (range
    // exchange + per-partition local pass + broadcast shift), never a
    // Window.partitionBy() that funnels the corpus through one task; the
    // sharded path must keep its partition spec. Checked on the physical
    // plans via WindowExec partitionSpec.
    import org.apache.spark.sql.functions._
    import graft.operators.TextAnalysis
    def windowSpecs(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec
      }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = spark.range(100).select(col("id"),
        (col("id") % 7 + 1).as("toks"), (col("id") % 3).cast("string").as("lang"))
      val global = TextAnalysis.packByBudget(d.toDF, col("toks"), 16L, Seq(col("id")))
      assert(windowSpecs(global).isEmpty,
        "global packByBudget must not plan any WindowExec")
      val sharded = TextAnalysis.packByBudget(d.toDF, col("toks"), 16L,
        Seq(col("id")), shard = Seq(col("lang")))
      val specs = windowSpecs(sharded)
      assert(specs.nonEmpty && specs.forall(_.nonEmpty),
        s"sharded packByBudget must partition its window, got $specs")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("describe() default plans without an Expand over every column") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = graft.api.Table(graft.queries.Tables.customer(spark, sfDir)).describe()
      val p = d.df.queryExecution.executedPlan.toString
      assert(!p.contains("Expand"), s"approx describe should not Expand:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q202 expands over the per-customer aggregate, not the fact join") {
    // The SF100 ratio rests on the eager-aggregation decomposition: the
    // rollup's Expand (×3 row multiplier) must consume the per-customer
    // aggregate (|customers| rows), never the raw lineitem join output
    // (3× the fact table at 100 TB). A refactor that re-inlines the join
    // under the rollup would stay value-correct (decimal sums are exact
    // across levels) and only surface as a 2.2× bench regression — this
    // pins the shape (round-12 verdict #2).
    val p = plan("q202_ds27_rollup_avgs")
    val lines = p.linesIterator.toSeq
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, s"no Expand (rollup) in plan:\n$p")
    // below the Expand, an aggregate must appear before the lineitem scan:
    // the rollup's input is already collapsed to per-customer rows
    val below = lines.drop(expandIdx + 1)
    val aggIdx = below.indexWhere(_.contains("HashAggregate"))
    val liIdx = below.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(liIdx >= 0, s"no lineitem scan below the Expand:\n$p")
    assert(aggIdx >= 0 && aggIdx < liIdx,
      s"rollup Expand consumes un-aggregated fact rows (join re-inlined):\n$p")
    // and the lineitem branch itself aggregates (per-order) before any join
    val scanIdx = lines.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    val above = lines.take(scanIdx).reverse
    val a = above.indexWhere(_.contains("HashAggregate"))
    val j = above.indexWhere(_.contains("Join"))
    assert(a >= 0 && (j < 0 || a < j),
      s"lineitem joins before its per-order aggregate:\n$p")
  }

  test("q204 ships pre-aggregated order revenue through one orderkey exchange") {
    // Same guard for the YoY window query: lineitem must collapse to one
    // exact per-order revenue BELOW its exchange (map-side combine), the
    // plan must carry exactly one l_orderkey exchange, and the Window must
    // rank the monthly aggregate (25 nations × months), not fact rows.
    val p = plan("q204_ds47_yoy_monthly")
    val lines = p.linesIterator.toSeq
    val scanIdx = lines.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(scanIdx >= 0, s"no lineitem scan:\n$p")
    val above = lines.take(scanIdx).reverse
    val aggIdx = above.indexWhere(_.contains("HashAggregate"))
    val exIdx = above.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(aggIdx >= 0 && exIdx >= 0 && aggIdx < exIdx,
      s"lineitem ships un-aggregated rows into its exchange:\n$p")
    val n = lines.count(_.contains("Exchange hashpartitioning(l_orderkey"))
    assert(n == 1, s"expected exactly one l_orderkey exchange, got $n:\n$p")
    val winIdx = lines.indexWhere(_.contains("Window"))
    assert(winIdx >= 0, s"no Window node:\n$p")
    val belowWin = lines.drop(winIdx + 1)
    val a2 = belowWin.indexWhere(_.contains("HashAggregate"))
    val s2 = belowWin.indexWhere(l =>
      l.contains("FileScan parquet") && l.contains("lineitem.parquet"))
    assert(a2 >= 0 && s2 >= 0 && a2 < s2,
      s"Window consumes un-aggregated fact rows:\n$p")
  }
}
