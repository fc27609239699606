package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Column selectors (ibis/selectors.py): predicates over the schema that
  * expand to column lists / projections — `numeric()` :107, `of_type` :137,
  * `startswith/endswith` :219/252, `matches` :337, `across` :469,
  * `if_any/if_all` :546/595. Pure schema combinators — they compile away
  * before the plan is built. */
object Selectors {

  type Selector = StructType => Seq[String]

  val numeric: Selector = st =>
    st.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq

  val string: Selector = st =>
    st.fields.collect { case f if f.dataType == StringType => f.name }.toSeq

  val temporal: Selector = st =>
    st.fields.collect {
      case f if f.dataType == DateType || f.dataType.isInstanceOf[TimestampType] ||
        f.dataType.isInstanceOf[TimestampNTZType] => f.name
    }.toSeq

  def ofType(dt: DataType): Selector = st =>
    st.fields.collect { case f if f.dataType == dt => f.name }.toSeq

  def startsWith(prefix: String): Selector = st =>
    st.fieldNames.filter(_.startsWith(prefix)).toSeq

  def endsWith(suffix: String): Selector = st =>
    st.fieldNames.filter(_.endsWith(suffix)).toSeq

  def contains(sub: String): Selector = st =>
    st.fieldNames.filter(_.contains(sub)).toSeq

  /** ibis selectors.matches uses re.search (unanchored substring search,
    * selectors.py:337 — its own docstring example `matches(r"ab+")` selects
    * both "abc" and "acb"-like names), so use find(), not full-match. */
  def matches(regex: String): Selector = { st =>
    val p = java.util.regex.Pattern.compile(regex)
    st.fieldNames.filter(n => p.matcher(n).find()).toSeq
  }

  def all: Selector = st => st.fieldNames.toSeq

  /** Combinators. */
  def and(a: Selector, b: Selector): Selector = st => a(st).intersect(b(st))
  def or(a: Selector, b: Selector): Selector = st => (a(st) ++ b(st)).distinct
  def not(a: Selector): Selector = st => st.fieldNames.toSeq.diff(a(st))

  /** ibis across: apply fn to every selected column (keeps names). */
  def across(df: DataFrame, sel: Selector, fn: Column => Column): Seq[Column] =
    sel(df.schema).map(n => fn(col(n)).as(n))

  /** ibis if_any / if_all: OR/AND of a predicate across selected columns. */
  def ifAny(df: DataFrame, sel: Selector, pred: Column => Column): Column =
    sel(df.schema).map(n => pred(col(n))).reduce(_ || _)

  def ifAll(df: DataFrame, sel: Selector, pred: Column => Column): Column =
    sel(df.schema).map(n => pred(col(n))).reduce(_ && _)
}
