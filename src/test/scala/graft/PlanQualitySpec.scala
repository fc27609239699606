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

  test("q101 runtime bloom filter injects under the bench session confs") {
    // The SF100 gate depends on the semi-join reduction: orders (1/5
    // selective) must prune the lineitem scan→shuffle BEFORE the exchange.
    // Spark's defaults block it (creation side <10MB, app side >10GB scan);
    // the bench session raises/clears them — assert the rule actually
    // fires on the q101 shape so a conf or plan change can't silently
    // drop it. Thresholds relaxed here because sf0.001 is tiny.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // bloom filters only inject ahead of SHUFFLE joins; at sf0.001 every
      // side broadcasts, so force the shuffle shape the SF100 run has
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val p = SparkEntry.queries("q101_tpch5_local_volume")(spark, sfDir)
        .queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter") || p.contains("BloomFilter"),
        s"runtime bloom filter not injected into the Q5 shape:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
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

  test("describe() default plans without an Expand over every column") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val d = graft.api.Table(graft.queries.Tables.customer(spark, sfDir)).describe()
      val p = d.df.queryExecution.executedPlan.toString
      assert(!p.contains("Expand"), s"approx describe should not Expand:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
