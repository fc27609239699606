package graft.exts

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (SURVEY.md §7.3: `Rule[LogicalPlan]` escalation path):
  * rewrite `RLIKE` against a metacharacter-free literal pattern into the
  * equivalent plain string predicate —
  *
  *   col RLIKE '^abc$'  →  col = 'abc'
  *   col RLIKE '^abc'   →  startswith(col, 'abc')
  *   col RLIKE 'abc$'   →  endswith(col, 'abc')
  *   col RLIKE 'abc'    →  contains(col, 'abc')
  *
  * Catalyst's own LikeSimplification does this for LIKE but not RLIKE; the
  * reference's RegexSearch op compiles to RLIKE (SURVEY.md §2.4), so text
  * pipelines full of "is this literally-X" regexes pay regex-engine cost
  * per row at 100 TB. All rewrites preserve RLIKE's unanchored
  * `Matcher.find` semantics and three-valued null handling — including the
  * subtlety that `'$'` (without MULTILINE) also matches just before a FINAL
  * line terminator, so `"abc\n" RLIKE 'abc$'` is true: the `$`-anchored
  * forms expand to an OR over the body plus body+terminator variants. */
object AnchoredRegexSimplification extends Rule[LogicalPlan] {

  // any of these makes a pattern non-literal (leave escapes to the regex engine)
  private val meta = Set('.', '[', ']', '{', '}', '(', ')', '*', '+', '?', '|', '\\', '^', '$')

  // Java Matcher default line terminators ('\r\n' as a unit, then singles).
  private val lineTerms = Seq("\n", "\r\n", "\r", "\u0085", "\u2028", "\u2029")

  private def literalBody(s: String): Option[String] =
    if (s.exists(meta.contains)) None else Some(s)

  private def lit(s: String): Expression = Literal(UTF8String.fromString(s), StringType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case r @ RLike(l, Literal(p: UTF8String, StringType)) if p != null =>
      val s = p.toString
      val rewritten: Option[Expression] =
        if (s.startsWith("^") && s.endsWith("$") && s.length >= 2)
          literalBody(s.substring(1, s.length - 1)).map { b =>
            lineTerms.map(t => EqualTo(l, lit(b + t)): Expression).foldLeft(EqualTo(l, lit(b)): Expression)(Or(_, _))
          }
        else if (s.startsWith("^"))
          literalBody(s.substring(1)).map(b => StartsWith(l, lit(b)))
        else if (s.endsWith("$") && s.nonEmpty)
          literalBody(s.substring(0, s.length - 1)).map { b =>
            lineTerms.map(t => EndsWith(l, lit(b + t)): Expression).foldLeft(EndsWith(l, lit(b)): Expression)(Or(_, _))
          }
        else
          literalBody(s).map(b => Contains(l, lit(b)))
      rewritten.getOrElse(r)
  }
}
