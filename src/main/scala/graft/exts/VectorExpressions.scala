package graft.exts

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for embedding math (SURVEY.md §7.1 `exts/`;
  * preference order (b): a native `Expression` with `doGenCode` beats
  * composing higher-order functions when the HOF form needs multiple array
  * scans and per-element lambda dispatch).
  *
  * `CosineSimilarity` computes dot(a,b), |a|² and |b|² in ONE fused loop of
  * generated Java — the `zip_with`+`aggregate` formulation scans the arrays
  * three times through interpreted lambda calls. On a 100 TB ANN sweep this
  * is the inner loop of the whole job.
  *
  * Semantics: null array → null; length mismatch or null element → null;
  * zero-norm input → null (the HOF form yields NaN/±Inf there — null is the
  * ibis-style "undefined" answer and safer to filter on).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  // fused float/double loops only; anything else should cast first
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemAsDouble(arr: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
}

case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAsDouble(a, i, lt); val y = elemAsDouble(b, i, rt)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elemType(left); val rt = elemType(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        boolean $bad = ($n != $b.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; !$bad && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          double $x = (double) ${CodeGenerator.getValue(a, lt, i)};
          double $y = (double) ${CodeGenerator.getValue(b, rt, i)};
          $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        }
        if ($bad || $na == 0.0 || $nb == 0.0) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
        }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val lt = elemType(left); val rt = elemType(right)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += elemAsDouble(a, i, lt) * elemAsDouble(b, i, rt)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val lt = elemType(left); val rt = elemType(right)
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val bad = ctx.freshName("bad")
      s"""
        int $n = $a.numElements();
        boolean $bad = ($n != $b.numElements());
        double $dot = 0.0;
        for (int $i = 0; !$bad && $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
          $dot += (double) ${CodeGenerator.getValue(a, lt, i)}
                * (double) ${CodeGenerator.getValue(b, rt, i)};
        }
        if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $dot; }
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
