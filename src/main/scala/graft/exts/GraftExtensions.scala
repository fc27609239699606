package graft.exts

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}

/** Session extension wiring for graft's custom Catalyst expressions
  * (SURVEY.md §7.1 `exts/`). Activate with
  * `.config("spark.sql.extensions", "graft.exts.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — then `cosine_sim`/`dot_product`
  * are callable from SQL text as well as the Column API below. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("money_sum4"),
      new ExpressionInfo(classOf[MoneySum4].getName, "money_sum4"),
      (children: Seq[Expression]) =>
        // analysis-time cast mirrors the Scala-API path (exprs.moneySum4):
        // MoneySum4's update expressions multiply by a double literal, so a
        // decimal/int column via SQL would otherwise fail at execution
        // instead of being coerced (AbstractDataType is private[sql], so the
        // ImplicitCastInputTypes route isn't open to external packages)
        MoneySum4(Cast(children.head, org.apache.spark.sql.types.DoubleType))
          .toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("geo_point"),
      new ExpressionInfo(classOf[GeoPointWkb].getName, "geo_point"),
      (children: Seq[Expression]) => GeoPointWkb(
        Cast(children(0), org.apache.spark.sql.types.DoubleType),
        Cast(children(1), org.apache.spark.sql.types.DoubleType))))
    ext.injectFunction((
      FunctionIdentifier("geo_x"),
      new ExpressionInfo(classOf[GeoCoord].getName, "geo_x"),
      (children: Seq[Expression]) => GeoCoord(children.head, 0)))
    ext.injectFunction((
      FunctionIdentifier("geo_y"),
      new ExpressionInfo(classOf[GeoCoord].getName, "geo_y"),
      (children: Seq[Expression]) => GeoCoord(children.head, 1)))
    ext.injectOptimizerRule(_ => AnchoredRegexSimplification)
  }
}

/** Column-API access to the custom expressions — no registration needed. */
object exprs {
  private def ex(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)
  private def co(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)

  def cosineSim(a: Column, b: Column): Column = co(CosineSimilarity(ex(a), ex(b)))
  def dotProduct(a: Column, b: Column): Column = co(DotProduct(ex(a), ex(b)))

  /** 1-based index of the greatest element <= key in a sorted array (see
    * [[AsofSearch]]) — the probe step of the compact as-of join plan. */
  def asofSearch(sortedArr: Column, key: Column): Column =
    co(AsofSearch(ex(sortedArr), ex(key)))

  /** Exact 4-decimal fixed-point money sum (see [[MoneySum4]]) — the fast
    * equivalent of `sum(x.cast("decimal(38,4)")).cast("double")`. */
  def moneySum4(x: Column): Column =
    co(MoneySum4(Cast(ex(x), org.apache.spark.sql.types.DoubleType)).toAggregateExpression())
}
