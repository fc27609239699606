package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the right row with the greatest
  * `rightOn <= leftOn` within the same `by` partition, left-outer semantics
  * (every left row kept). Matches ibis `Table.asof_join`
  * (/root/reference/ibis/expr/types/relations.py:3736-3866) and DuckDB's
  * `ASOF LEFT JOIN` used as the oracle.
  *
  * Spark has no asof primitive (SURVEY.md §2.1). Implementation is the
  * sort-merge-by-union strategy (SURVEY.md §7.3):
  *
  *   1. tag both inputs and union them on (by-keys, time),
  *   2. one window sort per by-partition, ordered by (time, side) with the
  *      right side first at equal timestamps (inclusive match),
  *   3. `last(struct(right_cols), ignoreNulls=true)` over (unbounded
  *      preceding → current row) propagates the most recent right row
  *      forward AS ONE UNIT — a single struct per right row, so the output
  *      never mixes column values from different right rows even when the
  *      matched row holds NULLs (per-column `last(ignoreNulls)` would skip
  *      back to an older row for just that column),
  *   4. keep only left rows; the tolerance post-filter nulls the WHOLE
  *      struct when the matched right time is out of range.
  *
  * Scale: ONE shuffle (the window's hash partition by `by`), no broadcast,
  * no driver materialization, no range cross-product — at 100 TB this
  * behaves like a single sort-merge pass, which is the asymptotically
  * optimal distributed asof plan. Skew on a hot `by` key is bounded by that
  * key's row count, the same bound a native asof merge would have.
  * (With no `by` keys the window degenerates to a single partition — correct
  * but serial; callers at scale should always pass partition keys.)
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
      rname: String = "{name}_right"): DataFrame = {

    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    val rOut = rCols.filterNot(c => by.exists(_._2 == c)) // by-cols dedup like ibis joins.py:34-111

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
    val w = Window
      .partitionBy(byCols: _*)
      .orderBy(col("__t").asc_nulls_last, col("__side").asc)
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

    // Tolerance: match only if leftOn - rightOn <= tolerance (an interval
    // literal, e.g. "INTERVAL 1 HOUR"); an out-of-range match nulls the
    // whole struct, so every right column of that row drops together.
    val withTol = tolerance match {
      case Some(tol) =>
        val rt = col("__m").getField("__rt")
        propagated.withColumn("__m",
          when(rt.isNotNull && col("__t") <= rt + expr(tol), col("__m")))
      case None => propagated
    }

    // Output-column collision policy shared with Table.joinOn
    // (ibis/expr/types/joins.py:34-111, asof at relations.py:3736-3746).
    def fmt(t: String, c: String) = if (t.isEmpty) c else t.replace("{name}", c)
    val leftNames = lCols.toSet
    val rightNames = rOut.toSet
    val lNamed = lCols.map(c => c -> (if (rightNames(c)) fmt(lname, c) else c))
    val rNamed = rOut.map(c => c -> (if (leftNames(c)) fmt(rname, c) else c))
    val outNames = lNamed.map(_._2) ++ rNamed.map(_._2)
    require(outNames.distinct.size == outNames.size,
      s"asof join output would duplicate columns ${outNames.diff(outNames.distinct).distinct.mkString(", ")}")

    withTol.select(
      (lNamed.map { case (c, n) => col(c).as(n) } ++
        rNamed.map { case (c, n) => col("__m").getField(c).as(n) }): _*)
  }
}
