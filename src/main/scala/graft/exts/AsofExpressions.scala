package graft.exts

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Binary search for the as-of join's compact plan (operators/AsofJoin.scala).
  *
  * `asof_search(sortedArr, key)` returns the 1-BASED index of the greatest
  * element `<= key` in an ascending-sorted array<long|double>, or null when
  * no element qualifies — shaped for direct use as `element_at(payload,
  * asof_search(times, t))` over the per-key parallel arrays the compact asof
  * plan builds. One O(log n) probe per left row, fully inside whole-stage
  * codegen; the HOF alternative (`element_at(filter(...), -1)`) allocates an
  * intermediate array per row and is interpreted.
  *
  * Inputs are built by the operator itself and are null-element-free by
  * construction (right rows with null timestamps can never match and are
  * filtered before the sort); element nullness is therefore not re-checked
  * in the search loop. Null array or null key → null (no match), matching
  * SQL comparison semantics (NULL >= x is never true).
  */
case class AsofSearch(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "asof_search"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  private def elemType: DataType = left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(et, _), kt) if et == kt && (et == LongType || et == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<long|double>, matching key), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val arr = l.asInstanceOf[ArrayData]
    var lo = 0; var hi = arr.numElements() - 1; var ans = -1
    if (elemType == LongType) {
      val k = r.asInstanceOf[Long]
      while (lo <= hi) {
        val m = (lo + hi) >>> 1
        if (arr.getLong(m) <= k) { ans = m; lo = m + 1 } else hi = m - 1
      }
    } else {
      val k = r.asInstanceOf[Double]
      while (lo <= hi) {
        val m = (lo + hi) >>> 1
        if (arr.getDouble(m) <= k) { ans = m; lo = m + 1 } else hi = m - 1
      }
    }
    if (ans < 0) null else ans + 1
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, k) => {
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val m = ctx.freshName("m"); val ans = ctx.freshName("ans")
      s"""
        int $lo = 0; int $hi = $a.numElements() - 1; int $ans = -1;
        while ($lo <= $hi) {
          int $m = ($lo + $hi) >>> 1;
          if (${CodeGenerator.getValue(a, elemType, m)} <= $k) {
            $ans = $m; $lo = $m + 1;
          } else { $hi = $m - 1; }
        }
        if ($ans < 0) { ${ev.isNull} = true; } else { ${ev.value} = $ans + 1; }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
