package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of join: for each left row, the right row with the greatest
  * `rightOn <= leftOn` within the same `by` partition, left-outer semantics
  * (every left row kept). Matches ibis `Table.asof_join`
  * (/root/reference/ibis/expr/types/relations.py:3736-3866) and DuckDB's
  * `ASOF LEFT JOIN` used as the oracle. `direction = "forward"` flips the
  * inequality (smallest `rightOn >= leftOn` — ibis expresses this by
  * passing `left <= right` as the `on` predicate); internally forward is
  * backward on negated times, so both physical plans below serve both
  * directions unchanged.
  *
  * Spark has no asof primitive (SURVEY.md §2.1). Two physical strategies:
  *
  * == "compact" (default when `by` keys exist) ==
  *
  *   1. group the RIGHT side by its `by` keys and collect each group's rows
  *      into ONE time-sorted run: a primitive sorted `times` array (epoch
  *      µs / long / double) plus a parallel payload-struct array,
  *   2. equi-join the left side to the runs on the `by` keys (plain
  *      hash join — broadcastable when the right side is small, AQE-planned
  *      otherwise),
  *   3. per left row, ONE O(log n) binary-search probe
  *      (`exts.AsofSearch`, whole-stage codegen) + `element_at` picks the
  *      matched payload struct AS ONE UNIT; the tolerance post-filter nulls
  *      the whole struct when the matched right time is out of range.
  *
  *   Cost: one shuffle of the slim right side into runs, one equi-join —
  *   the big left side is NEVER sorted (vs the union+window plan, which
  *   sorts left+right together). At 100 TB this is the winning shape when
  *   per-key right-row counts are bounded (telemetry, quotes, dimension
  *   history): the runs stay small, the probe is logarithmic, and the
  *   sorted-run build parallelizes per key. A pathological key with tens of
  *   millions of right rows materializes one giant array row — for that
  *   shape force `strategy = "window"`, which spills through the external
  *   sorter instead.
  *
  * == "window" (forced, or when `by` is empty) ==
  *
  *   1. tag both inputs and union them on (by-keys, time),
  *   2. one window sort per by-partition, ordered by (time, side) with the
  *      right side first at equal timestamps (inclusive match),
  *   3. `last(struct(right_cols), ignoreNulls=true)` over (unbounded
  *      preceding → current row) propagates the most recent right row
  *      forward as one unit,
  *   4. keep only left rows; same tolerance handling.
  *
  *   ONE shuffle but a full sort of left+right; robust to unbounded per-key
  *   cardinality (external sort spills). With no `by` keys the window
  *   degenerates to a single partition — correct but serial; callers at
  *   scale should always pass partition keys.
  *
  * Semantics note: the compact plan's equi-join gives SQL key semantics —
  * null `by` keys and null times never match (DuckDB/oracle behavior). The
  * window plan groups null keys together like any window partition; data
  * with null keys should use the default compact plan.
  */
object AsofJoin {

  def apply(
      left: DataFrame,
      right: DataFrame,
      leftOn: Column,
      rightOn: Column,
      by: Seq[(String, String)] = Seq.empty,
      tolerance: Option[String] = None,
      lname: String = "",
      rname: String = "{name}_right",
      strategy: String = "auto",
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val fwd = direction == "forward"
    val nearest = direction == "nearest"
    val useCompact = strategy match {
      case "compact" => require(by.nonEmpty, "compact asof requires by keys"); true
      case "window"  => false
      case _         => by.nonEmpty
    }
    // nearest = compare the backward hit with its successor in the sorted
    // run — only the compact plan has the run at hand
    require(!nearest || (useCompact && by.nonEmpty),
      "direction=nearest requires by keys (compact plan)")
    if (useCompact) compactPlan(left, right, leftOn, rightOn, by, tolerance, lname, rname, fwd, nearest)
    else windowPlan(left, right, leftOn, rightOn, by, tolerance, lname, rname, fwd)
  }

  /** Output-column collision policy shared with Table.joinOn
    * (ibis/expr/types/joins.py:34-111, asof at relations.py:3736-3746). */
  private def outputNames(
      lCols: Seq[String], rOut: Seq[String], lname: String, rname: String)
      : (Seq[(String, String)], Seq[(String, String)]) = {
    def fmt(t: String, c: String) = if (t.isEmpty) c else t.replace("{name}", c)
    val leftNames = lCols.toSet
    val rightNames = rOut.toSet
    val lNamed = lCols.map(c => c -> (if (rightNames(c)) fmt(lname, c) else c))
    val rNamed = rOut.map(c => c -> (if (leftNames(c)) fmt(rname, c) else c))
    val outNames = lNamed.map(_._2) ++ rNamed.map(_._2)
    require(outNames.distinct.size == outNames.size,
      s"asof join output would duplicate columns ${outNames.diff(outNames.distinct).distinct.mkString(", ")}")
    (lNamed, rNamed)
  }

  /** Time normalized to a binary-searchable primitive; both sides must end
    * on the same element type. */
  private def normTime(c: Column, dt: DataType, target: DataType): Column = dt match {
    case TimestampType    => unix_micros(c)
    case TimestampNTZType => unix_micros(c.cast("timestamp"))
    case DateType         => unix_micros(c.cast("timestamp"))
    case _                => c.cast(if (target == DoubleType) "double" else "long")
  }

  private def compactPlan(
      left: DataFrame,
      right: DataFrame,
      leftOn: Column,
      rightOn: Column,
      by: Seq[(String, String)],
      tolerance: Option[String],
      lname: String,
      rname: String,
      fwd: Boolean,
      nearest: Boolean): DataFrame = {

    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rOut = rCols.filterNot(c => by.exists(_._2 == c)) // by-cols dedup like ibis joins.py:34-111

    val lDt = left.select(leftOn).schema.head.dataType
    val rDt = right.select(rightOn).schema.head.dataType
    val fractional = Seq(lDt, rDt).exists {
      case DoubleType | FloatType => true
      case _: DecimalType         => true
      case _                      => false
    }
    val target = if (fractional) DoubleType else LongType

    // One sorted run per by-key. sort_array orders the payload structs by
    // (__tk, then remaining fields) — ties at equal time resolve by payload
    // value, making the picked match DETERMINISTIC (the window plan breaks
    // time-ties by arbitrary input order). __rt keeps the original-typed
    // right time for the tolerance check.
    // forward asof = backward asof on NEGATED times: runs sort descending,
    // the probe's greatest(-t_r <= -t_l) is the smallest t_r >= t_l
    def sgn(c: Column): Column = if (fwd) -c else c
    val payload = struct(
      (sgn(normTime(rightOn, rDt, target)).as("__tk") +:
        rightOn.as("__rt") +:
        rOut.map(col)): _*)
    val byProbe = by.zipWithIndex.map { case ((_, rk), i) => col(rk).as(s"__abk_$i") }
    val rRuns = right
      .filter(rightOn.isNotNull)
      .groupBy(byProbe: _*)
      .agg(sort_array(collect_list(payload)).as("__runs"))
      // parallel primitive times array: the probe binary-searches this flat
      // long[]/double[] instead of re-reading struct field 0 per step
      .withColumn("__tks", transform(col("__runs"), e => e.getField("__tk")))

    val cond = by.zipWithIndex
      .map { case ((lk, _), i) => left(lk) === rRuns(s"__abk_$i") }
      .reduce(_ && _)
    val joined = left.join(rRuns, cond, "left")

    val idx = graft.exts.exprs.asofSearch(col("__tks"), sgn(normTime(leftOn, lDt, target)))
    val mBack = element_at(col("__runs"), idx)
    // nearest: the forward candidate is the backward hit's successor in the
    // sorted run (or the first element when nothing is <= left); pick the
    // smaller absolute delta, ties to the backward side (pandas rule)
    val m0 = if (!nearest) mBack else {
      val mFwd = try_element_at(col("__runs"), coalesce(idx, lit(0)) + 1)
      val tl = normTime(leftOn, lDt, target)
      when(mBack.isNull, mFwd)
        .when(mFwd.isNull, mBack)
        .when(tl - mBack.getField("__tk") <= mFwd.getField("__tk") - tl, mBack)
        .otherwise(mFwd)
    }
    val matched = tolerance match {
      // match only if leftOn - rightOn <= tolerance; an out-of-range match
      // nulls the WHOLE struct, so every right column drops together
      case Some(tol) if nearest =>
        when(m0.isNotNull && m0.getField("__rt") <= leftOn + expr(tol) &&
          leftOn <= m0.getField("__rt") + expr(tol), m0)
      case Some(tol) if fwd =>
        when(m0.isNotNull && m0.getField("__rt") <= leftOn + expr(tol), m0)
      case Some(tol) => when(m0.isNotNull && leftOn <= m0.getField("__rt") + expr(tol), m0)
      case None      => m0
    }

    val (lNamed, rNamed) = outputNames(lCols, rOut, lname, rname)
    joined.select(
      (lNamed.map { case (c, n) => left(c).as(n) } ++
        rNamed.map { case (c, n) => matched.getField(c).as(n) }): _*)
  }

  private def windowPlan(
      left: DataFrame,
      right: DataFrame,
      leftOn: Column,
      rightOn: Column,
      by: Seq[(String, String)],
      tolerance: Option[String],
      lname: String,
      rname: String,
      fwd: Boolean): DataFrame = {

    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rOut = rCols.filterNot(c => by.exists(_._2 == c))

    // Common layout: __t, __side (0=right, 1=left), by-keys, left cols, right cols
    val lTagged = left
      .withColumn("__t", leftOn)
      .withColumn("__side", lit(1))
      .select(
        (Seq(col("__t"), col("__side")) ++
          by.map { case (lk, _) => col(lk).as(s"__by_$lk") } ++
          lCols.map(col) ++
          rOut.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c"))): _*)

    val rTagged = right
      .withColumn("__t", rightOn)
      .withColumn("__side", lit(0))
      .select(
        (Seq(col("__t"), col("__side")) ++
          by.map { case (lk, rk) => col(rk).as(s"__by_$lk") } ++
          lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          rOut.map(c => col(c).as(s"__r_$c"))): _*)

    val unioned = lTagged.unionByName(rTagged)

    val byCols = by.map { case (lk, _) => col(s"__by_$lk") }
    // Right rows sort before left rows at the same timestamp → inclusive
    // (l.t >= r.t) matching, like DuckDB ASOF and pandas merge_asof default.
    // forward: scan times DESCENDING — "preceding" rows then have t >= the
    // current left row, and last(right) is the nearest future right row.
    // Right still sorts before left at equal t → inclusive both ways.
    val tOrder = if (fwd) col("__t").desc_nulls_last else col("__t").asc_nulls_last
    val w = Window
      .partitionBy(byCols: _*)
      .orderBy(tOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // One struct per right row (struct itself is never null for a right row,
    // even if every field is null) → last(ignoreNulls) lands on exactly one
    // right row; its time rides along for the tolerance check.
    val rowStruct = when(col("__side") === 0,
      struct((col("__t").as("__rt") +: rOut.map(c => col(s"__r_$c").as(c))): _*))
    val matched = last(rowStruct, ignoreNulls = true).over(w).as("__m")

    val propagated = unioned
      .select((unioned.columns.map(col).toSeq :+ matched): _*)
      .filter(col("__side") === 1)

    val withTol = tolerance match {
      case Some(tol) if fwd =>
        val rt = col("__m").getField("__rt")
        propagated.withColumn("__m",
          when(rt.isNotNull && rt <= col("__t") + expr(tol), col("__m")))
      case Some(tol) =>
        val rt = col("__m").getField("__rt")
        propagated.withColumn("__m",
          when(rt.isNotNull && col("__t") <= rt + expr(tol), col("__m")))
      case None => propagated
    }

    val (lNamed, rNamed) = outputNames(lCols, rOut, lname, rname)
    withTol.select(
      (lNamed.map { case (c, n) => col(c).as(n) } ++
        rNamed.map { case (c, n) => col("__m").getField(c).as(n) }): _*)
  }
}
