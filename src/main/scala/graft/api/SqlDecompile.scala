package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedHaving, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Descending, Expression, Literal, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}

/** ibis `parse_sql` (expr/sql.py:402-428): SQL text → a COMPOSABLE,
  * WALKABLE operation tree — the introspection intermediate the plain
  * `Table.parseSql` plan-wrap lacks (DIVERGENCES §7). The reference uses
  * sqlglot for this; here Spark's own SQL parser produces the unresolved
  * LogicalPlan and [[SqlDecompile.decompile]] rebuilds it as a small ADT
  * a user can inspect, transform (`SqlOp.rewrite`) and turn back into a
  * live [[Table]] (`SqlOp.table`) that composes with every other verb.
  *
  * Coverage: the relational core SQL users actually introspect —
  * project/filter/aggregate/having/join/sort/limit/offset/distinct,
  * set ops, CTEs (held as scope, resolved at rebuild), subquery aliases,
  * and OVER-clause windows ([[SqlWindow]], round 9 — rendered back via
  * the DataFrame window API since catalyst `.sql` can't).
  * Anything beyond it degrades to [[SqlOpaque]], which still REBUILDS
  * correctly (the raw plan executes as-is) — capability is never lost,
  * only walkability, and `isFullyDecompiled` tells the user which. */
sealed trait SqlOp {
  /** Children in the op tree (inputs only — CTE bodies ride on SqlWith). */
  def children: Seq[SqlOp]

  /** Bottom-up structural rewrite — the "transform the decompiled
    * expression graph" step of the reference surface. */
  def rewrite(f: PartialFunction[SqlOp, SqlOp]): SqlOp = {
    val withChildren = mapChildren(_.rewrite(f))
    f.applyOrElse(withChildren, identity[SqlOp])
  }

  def mapChildren(f: SqlOp => SqlOp): SqlOp = this match {
    case SqlProject(in, es) => SqlProject(f(in), es)
    case SqlFilter(in, p) => SqlFilter(f(in), p)
    case SqlHaving(in, p) => SqlHaving(f(in), p)
    case SqlAggregate(in, ks, as) => SqlAggregate(f(in), ks, as)
    case SqlJoin(l, r, how, cond) => SqlJoin(f(l), f(r), how, cond)
    case SqlSort(in, ks) => SqlSort(f(in), ks)
    case SqlLimit(in, n, off) => SqlLimit(f(in), n, off)
    case SqlDistinct(in) => SqlDistinct(f(in))
    case SqlSetOp(l, r, op, all) => SqlSetOp(f(l), f(r), op, all)
    case SqlAlias(in, n) => SqlAlias(f(in), n)
    case SqlWith(in, ctes) => SqlWith(f(in), ctes.map { case (n, b) => (n, f(b)) })
    case SqlWindow(in, ds) => SqlWindow(f(in), ds)
    case g: SqlGenerate => g.copy(input = f(g.input))
    case gs: SqlGroupingSets => gs.copy(input = f(gs.input))
    case leaf => leaf
  }

  def exists(p: SqlOp => Boolean): Boolean =
    p(this) || children.exists(_.exists(p)) ||
      (this match { case SqlWith(_, ctes) => ctes.exists(c => c._2.exists(p)); case _ => false })

  def isFullyDecompiled: Boolean = !exists(_.isInstanceOf[SqlOpaque])

  /** Expression-granular rewrite (round 9): parse every expression
    * string this tree holds into its [[SqlExpr]] tree, apply `f`
    * bottom-up, re-render. Lets a user rename a column everywhere, swap
    * a function, or edit a literal across project/filter/agg/join/sort/
    * window keys in one pass — the per-expression transform the
    * reference's sqlglot tree offers. */
  def rewriteExprs(f: PartialFunction[SqlExpr, SqlExpr]): SqlOp = {
    def rw(s: String): String =
      if (s == "*" || s.endsWith(".*")) s
      else SqlDecompile.parseExpr(s).rewrite(f).render
    def rwOp(op: SqlOp): SqlOp = op match {
      case SqlProject(in, es) => SqlProject(rwOp(in), es.map { case (n, e) => (n, rw(e)) })
      case SqlFilter(in, p) => SqlFilter(rwOp(in), rw(p))
      case SqlHaving(in, p) => SqlHaving(rwOp(in), rw(p))
      case SqlAggregate(in, ks, as) =>
        SqlAggregate(rwOp(in), ks.map(rw), as.map { case (n, e) => (n, rw(e)) })
      case SqlJoin(l, r, how, cond) => SqlJoin(rwOp(l), rwOp(r), how, cond.map(rw))
      case SqlSort(in, ks) =>
        SqlSort(rwOp(in), ks.map { case (e, a, n) => (rw(e), a, n) })
      case SqlWindow(in, ds) => SqlWindow(rwOp(in), ds.map(d => d.copy(
        func = rw(d.func), partitionBy = d.partitionBy.map(rw),
        orderBy = d.orderBy.map { case (e, a, n) => (rw(e), a, n) })))
      case SqlWith(in, ctes) =>
        SqlWith(rwOp(in), ctes.map { case (n, b) => (n, rwOp(b)) })
      case other => other.mapChildren(rwOp)
    }
    rwOp(this)
  }

  /** Rebuild as a live Table over `spark`'s catalog (CTE names resolve to
    * their decompiled bodies; everything else through the catalog). */
  def table(spark: SparkSession): Table =
    new Table(SqlDecompile.rebuild(spark, this, Map.empty))

  /** Render this tree back to SQL text — the `ibis.to_sql` role
    * (reference `ibis/expr/sql.py` / `ibis.to_sql`): hand a composed
    * query to another engine or debug it as text. `dialect` is "spark"
    * (default — output re-parses through `spark.sql`) or "duckdb"
    * (portable ANSI: double-quoted identifiers, infix BETWEEN,
    * `SEMI/ANTI JOIN` spellings, literal suffixes stripped). Throws on
    * trees that are not fully decompiled ([[SqlOpaque]]) — check
    * [[isFullyDecompiled]] first. */
  def renderSql(dialect: String = "spark"): String =
    SqlDecompile.renderSql(this, dialect)
}

final case class SqlRelation(name: String) extends SqlOp {
  def children = Nil
  /** The exact identifier parts when decompiled from a plan — `name` is
    * their '.'-joined form, which is LOSSY for a single identifier
    * containing a literal dot; the renderer prefers these. Not part of
    * the case-class shape (equality/patterns unchanged). */
  private[api] var nameParts: Seq[String] = Nil
}
final case class SqlProject(input: SqlOp, exprs: Seq[(String, String)]) extends SqlOp {
  def children = Seq(input)
}
final case class SqlFilter(input: SqlOp, predicate: String) extends SqlOp {
  def children = Seq(input)
}
/** HAVING differs from WHERE: the predicate may contain aggregate calls
  * over the input's grouping, not just output columns. */
final case class SqlHaving(input: SqlOp, predicate: String) extends SqlOp {
  def children = Seq(input)
}
final case class SqlAggregate(input: SqlOp, keys: Seq[String],
    aggs: Seq[(String, String)]) extends SqlOp { def children = Seq(input) }
final case class SqlJoin(left: SqlOp, right: SqlOp, how: String,
    condition: Option[String]) extends SqlOp { def children = Seq(left, right) }
final case class SqlSort(input: SqlOp,
    keys: Seq[(String, Boolean, Boolean)]) extends SqlOp { def children = Seq(input) }
final case class SqlLimit(input: SqlOp, n: Option[Long], offset: Option[Long]) extends SqlOp {
  def children = Seq(input)
}
final case class SqlDistinct(input: SqlOp) extends SqlOp { def children = Seq(input) }
final case class SqlSetOp(left: SqlOp, right: SqlOp, op: String, all: Boolean) extends SqlOp {
  def children = Seq(left, right)
}
final case class SqlAlias(input: SqlOp, name: String) extends SqlOp {
  def children = Seq(input)
}
final case class SqlWith(input: SqlOp, ctes: Seq[(String, SqlOp)]) extends SqlOp {
  def children = Seq(input)
}
/** One OVER-clause column added below a [[SqlProject]]: `func` is the
  * window function call text (`rank()`, `lag(v, 1)`, `sum(v)`), keys are
  * expression strings, and `frame` — when the SQL spells one — is
  * ("rows"|"range", lower, upper) in the DataFrame API's Long sentinels
  * (`Window.unboundedPreceding`/`currentRow`/`unboundedFollowing`).
  * None = the SQL default frame, which the DataFrame API also applies. */
final case class SqlWindowDef(name: String, func: String,
    partitionBy: Seq[String], orderBy: Seq[(String, Boolean, Boolean)],
    frame: Option[(String, Long, Long)])
/** Window-bearing SELECT support: computes each [[SqlWindowDef]] column
  * over the input via the DataFrame window API (catalyst's `.sql` cannot
  * render an OVER clause back through the parser — DIVERGENCES §7), with
  * the enclosing [[SqlProject]] referencing the computed columns. */
final case class SqlWindow(input: SqlOp, defs: Seq[SqlWindowDef]) extends SqlOp {
  def children = Seq(input)
}
/** Inline VALUES relation (round 11): literal rows under column names —
  * the memtable/`ibis.memtable` rendering (the reference's to_sql inlines
  * memtables the same way). Each cell is a TYPED literal's SQL text
  * (`1L`, `DATE '2024-01-01'`), so the re-parsed relation keeps the
  * source's types; the duckdb dialect strips the spark type suffixes. */
final case class SqlValues(names: Seq[String], rows: Seq[Seq[String]]) extends SqlOp {
  def children = Nil
}

/** GROUPING SETS aggregate (round 11): `keys` are the distinct grouping
  * expressions, `sets` the per-set inclusion (each a subset of keys, in
  * key order) — rollup/cube decompile to their expanded sets, which
  * re-analyze to the identical Expand plan. `aggs` may reference
  * `grouping_id()` / `grouping(...)`. */
final case class SqlGroupingSets(input: SqlOp, keys: Seq[String],
    sets: Seq[Seq[String]], aggs: Seq[(String, String)]) extends SqlOp {
  def children = Seq(input)
}

/** Generator over the input (round 11): Spark's LATERAL VIEW — `func` is
  * the generator call text (`explode(xs)`, `posexplode(xs)`,
  * `stack(2, 'a', a, 'b', b)`), `cols` the generated column names,
  * `alias` the LATERAL VIEW's table alias (generated columns are
  * referenced `alias.col` above), `outer` keeps empty/null input rows.
  * `explodeArg` carries the bare argument text when the generator is a
  * plain non-outer explode — the one shape the duckdb dialect can spell
  * (`CROSS JOIN UNNEST(arg) AS alias(col)`); other generators refuse in
  * duckdb rather than mistranslate. */
final case class SqlGenerate(input: SqlOp, func: String, cols: Seq[String],
    alias: String, outer: Boolean, explodeArg: Option[String]) extends SqlOp {
  def children = Seq(input)
}

/** Fallback for plan shapes outside the walkable core: carries the raw
  * parsed subtree, which still executes verbatim on rebuild. */
final case class SqlOpaque(plan: LogicalPlan) extends SqlOp { def children = Nil }

/** Expression-granular decompile (round 9): the reference's sqlglot tree
  * is walkable per-EXPRESSION (expr/sql.py), not just per relational op
  * — so every expression string a [[SqlOp]] holds parses into this ADT
  * via [[SqlDecompile.parseExpr]], and [[SqlOp.rewriteExprs]] maps a
  * transform over every expression tree in the whole op tree and
  * re-renders. Node shapes outside the core ride as [[SqlExprRaw]]
  * leaves rendering verbatim — the same never-lose-capability contract
  * as SqlOpaque, and `isFullyParsed` reports which. */
sealed trait SqlExpr {
  def children: Seq[SqlExpr]
  def mapChildren(f: SqlExpr => SqlExpr): SqlExpr
  def rewrite(f: PartialFunction[SqlExpr, SqlExpr]): SqlExpr = {
    val w = mapChildren(_.rewrite(f))
    f.applyOrElse(w, identity[SqlExpr])
  }
  def exists(p: SqlExpr => Boolean): Boolean =
    p(this) || children.exists(_.exists(p))
  def isFullyParsed: Boolean = !exists {
    case r: SqlExprRaw => r.sql != "*" && !r.sql.endsWith(".*")
    case _ => false
  }
  /** SQL text that parses back through Spark's expression parser. */
  def render: String
}
final case class SqlExprCol(parts: Seq[String]) extends SqlExpr {
  def children = Nil
  def mapChildren(f: SqlExpr => SqlExpr) = this
  def render = parts.map(SqlDecompile.quoteIdent(_)).mkString(".")
}
final case class SqlExprLit(sql: String) extends SqlExpr {
  def children = Nil
  def mapChildren(f: SqlExpr => SqlExpr) = this
  def render = sql
}
final case class SqlExprFunc(name: String, args: Seq[SqlExpr],
    distinct: Boolean = false) extends SqlExpr {
  def children = args
  def mapChildren(f: SqlExpr => SqlExpr) = copy(args = args.map(f))
  def render =
    s"$name(${if (distinct) "DISTINCT " else ""}${args.map(_.render).mkString(", ")})"
}
/** `f(args) IGNORE NULLS` — spark's null-skipping modifier for
  * first/last/lead/lag/nth_value/any_value. No duckdb spelling exists
  * (probed: both `f(x) IGNORE NULLS` and `f(x IGNORE NULLS)` fail its
  * parser) — the duckdb renderer refuses loudly. */
final case class SqlExprIgnoreNulls(func: SqlExpr) extends SqlExpr {
  def children = Seq(func)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(func = f(func))
  def render = s"${func.render} IGNORE NULLS"
}
/** `f(args) WITHIN GROUP (ORDER BY …)` — ordered-set aggregates
  * (percentile_cont / percentile_disc / mode / listagg). DuckDB shares
  * the spelling for the percentile pair (probed, incl. ASC/DESC and
  * NULLS FIRST/LAST and FILTER composition); the others refuse there. */
final case class SqlExprWithinGroup(func: SqlExpr,
    keys: Seq[(SqlExpr, Boolean, Boolean)]) extends SqlExpr {
  def children = func +: keys.map(_._1)
  def mapChildren(f: SqlExpr => SqlExpr) =
    copy(func = f(func), keys = keys.map { case (e, a, n) => (f(e), a, n) })
  def render = s"${func.render} WITHIN GROUP (ORDER BY " + keys.map {
    case (e, a, n) =>
      s"${e.render} ${if (a) "ASC" else "DESC"} NULLS ${if (n) "FIRST" else "LAST"}"
  }.mkString(", ") + ")"
}
/** `agg(args) FILTER (WHERE cond)` — the ANSI aggregate filter clause
  * (the reference's `where=` reduction argument, reference
  * ibis/expr/operations/reductions.py:28-29 `Filterable`; every backend
  * golden under ibis/backends/tests/sql/snapshots renders it as FILTER).
  * Spark and DuckDB share the spelling verbatim. */
final case class SqlExprAggFilter(func: SqlExpr, cond: SqlExpr) extends SqlExpr {
  def children = Seq(func, cond)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(func = f(func), cond = f(cond))
  def render = s"${func.render} FILTER (WHERE ${cond.render})"
}
final case class SqlExprBin(op: String, left: SqlExpr, right: SqlExpr) extends SqlExpr {
  def children = Seq(left, right)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(left = f(left), right = f(right))
  def render = s"(${left.render} $op ${right.render})"
}
final case class SqlExprUnary(op: String, child: SqlExpr) extends SqlExpr {
  def children = Seq(child)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(child = f(child))
  def render = s"($op ${child.render})"
}
final case class SqlExprIn(value: SqlExpr, list: Seq[SqlExpr],
    negated: Boolean = false) extends SqlExpr {
  def children = value +: list
  def mapChildren(f: SqlExpr => SqlExpr) = copy(value = f(value), list = list.map(f))
  def render = s"(${value.render} ${if (negated) "NOT IN" else "IN"} " +
    s"(${list.map(_.render).mkString(", ")}))"
}
final case class SqlExprCast(child: SqlExpr, to: String, isTry: Boolean = false)
    extends SqlExpr {
  def children = Seq(child)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(child = f(child))
  def render = s"${if (isTry) "TRY_CAST" else "CAST"}(${child.render} AS $to)"
}
final case class SqlExprCase(branches: Seq[(SqlExpr, SqlExpr)],
    orElse: Option[SqlExpr]) extends SqlExpr {
  def children = branches.flatMap(b => Seq(b._1, b._2)) ++ orElse.toSeq
  def mapChildren(f: SqlExpr => SqlExpr) =
    SqlExprCase(branches.map { case (c, v) => (f(c), f(v)) }, orElse.map(f))
  def render = "CASE" +
    branches.map { case (c, v) => s" WHEN ${c.render} THEN ${v.render}" }.mkString +
    orElse.fold("")(e => s" ELSE ${e.render}") + " END"
}
/** LIKE / ILIKE / RLIKE (round 10 — previously raw leaves). */
final case class SqlExprLike(kind: String, value: SqlExpr, pattern: SqlExpr)
    extends SqlExpr {
  def children = Seq(value, pattern)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(value = f(value), pattern = f(pattern))
  def render = s"(${value.render} $kind ${pattern.render})"
}
/** IS [NOT] NULL (round 10 — previously a raw leaf). */
final case class SqlExprIsNull(child: SqlExpr, negated: Boolean = false) extends SqlExpr {
  def children = Seq(child)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(child = f(child))
  def render = s"(${child.render} IS ${if (negated) "NOT " else ""}NULL)"
}
/** [NOT] BETWEEN (round 10): Spark's parser rewrites the infix form to a
  * `between(v, lo, hi)` call — modeled explicitly so the bounds are
  * walkable and dialect renderers can restore the portable infix. */
final case class SqlExprBetween(value: SqlExpr, lower: SqlExpr, upper: SqlExpr,
    negated: Boolean = false) extends SqlExpr {
  def children = Seq(value, lower, upper)
  def mapChildren(f: SqlExpr => SqlExpr) =
    copy(value = f(value), lower = f(lower), upper = f(upper))
  def render = s"(${value.render} ${if (negated) "NOT " else ""}BETWEEN " +
    s"${lower.render} AND ${upper.render})"
}
/** [NOT] EXISTS (subquery) (round 10): catalyst renders the node as the
  * pseudo-call `exists()` which PARSES but never resolves — the subquery
  * plan decompiles into a walkable [[SqlOp]] instead and renders through
  * [[SqlDecompile.renderSql]]. Construction fails (→ whole-expression raw
  * fallback) when the subquery isn't fully renderable. */
final case class SqlExprExists(sub: SqlOp, negated: Boolean = false) extends SqlExpr {
  def children = Nil // the subquery is an op tree, not an expression child
  def mapChildren(f: SqlExpr => SqlExpr) = this
  def render = {
    val e = s"EXISTS (${SqlDecompile.renderSql(sub)})"
    if (negated) s"(NOT $e)" else e
  }
}
/** value [NOT] IN (subquery) (round 10) — same contract as
  * [[SqlExprExists]]. */
final case class SqlExprInSubquery(value: SqlExpr, sub: SqlOp,
    negated: Boolean = false) extends SqlExpr {
  def children = Seq(value)
  def mapChildren(f: SqlExpr => SqlExpr) = copy(value = f(value))
  def render = s"(${value.render} ${if (negated) "NOT IN" else "IN"} " +
    s"(${SqlDecompile.renderSql(sub)}))"
}
/** Scalar subquery as an expression (round 10) — same contract as
  * [[SqlExprExists]]. */
final case class SqlExprScalarSubquery(sub: SqlOp) extends SqlExpr {
  def children = Nil
  def mapChildren(f: SqlExpr => SqlExpr) = this
  def render = s"(${SqlDecompile.renderSql(sub)})"
}
/** Leaf for shapes outside the walkable expression core — renders its
  * original (parse-checked) text verbatim. `*` / `t.*` ride here too. */
final case class SqlExprRaw(sql: String) extends SqlExpr {
  def children = Nil
  def mapChildren(f: SqlExpr => SqlExpr) = this
  def render = sql
}

object SqlDecompile {

  /** Parse `sql` with Spark's parser and decompile the unresolved plan. */
  def decompile(spark: SparkSession, sql: String): SqlOp =
    fromPlan(spark.sessionState.sqlParser.parsePlan(sql))

  /** `ibis.parse_sql(sql, dialect=...)` (reference ibis/expr/sql.py:402-428
    * accepts any sqlglot input dialect): decompile SQL written in another
    * engine's spelling. `dialect` is "spark" (no-op) or "duckdb" (round
    * 11): double-quoted identifiers, `regexp_matches`/`len`/`list`/
    * `list_value` function spellings and a QUALIFY clause map onto
    * Spark's grammar before parsing ([[DuckInput]]); `IS [NOT] DISTINCT
    * FROM` and unaliased derived tables Spark's parser accepts natively.
    * Unmapped DuckDB-only constructs fail loudly at parse or rebuild —
    * never a silent mistranslation. */
  def decompile(spark: SparkSession, sql: String, dialect: String): SqlOp = {
    require(dialect == "spark" || dialect == "duckdb",
      s"unknown input dialect '$dialect' (spark | duckdb)")
    decompile(spark, if (dialect == "duckdb") DuckInput.toSparkSql(sql) else sql)
  }

  /** DuckDB → Spark SQL text mapping for [[decompile]]'s input-dialect
    * role. String-literal content is never touched (a tokenizer splits
    * code from '…' literals first); only spellings with IDENTICAL
    * semantics map ("len" = length, DuckDB's LIST() aggregate =
    * collect_list, regexp_matches = partial-match RLIKE, list_value =
    * array); QUALIFY rewrites structurally into a derived table with the
    * predicate as a computed column. Anything else passes through and
    * fails loudly at parse/analysis if Spark doesn't speak it. */
  private[api] object DuckInput {

    def toSparkSql(sql: String): String =
      rewriteQualify(rewriteUnnest(mapTokens(sql)))

    /** Split into (code, string-literal) segments; map double-quoted
      * identifiers to backticks and function spellings in CODE segments
      * only. */
    private[api] def mapTokens(sql: String): String = {
      val out = new StringBuilder
      val code = new StringBuilder
      def flushCode(): Unit = { out ++= mapCode(code.toString()); code.clear() }
      var i = 0
      while (i < sql.length) {
        sql.charAt(i) match {
          case '\'' =>
            flushCode()
            val j = closingQuote(sql, i, '\'')
            out ++= sql.substring(i, j + 1); i = j + 1
          case '"' =>
            flushCode()
            val j = closingQuote(sql, i, '"')
            val ident = sql.substring(i + 1, j).replace("\"\"", "\"")
            out ++= "`" + ident.replace("`", "``") + "`"; i = j + 1
          case '`' =>
            // an already-backticked identifier is code to Spark but must
            // not hit the spelling regexes — `len(` is a NAME, not a call
            flushCode()
            val j = closingQuote(sql, i, '`')
            out ++= sql.substring(i, j + 1); i = j + 1
          case c => code += c; i += 1
        }
      }
      flushCode()
      out.toString()
    }

    /** Index of the closing quote, honoring the doubled-quote escape. */
    private def closingQuote(s: String, open: Int, q: Char): Int = {
      var i = open + 1
      while (i < s.length) {
        if (s.charAt(i) == q) {
          if (i + 1 < s.length && s.charAt(i + 1) == q) i += 2
          else return i
        } else i += 1
      }
      throw new IllegalArgumentException(s"unterminated $q-quoted token in: $s")
    }

    private def mapCode(code: String): String = {
      // (?<![.\w]) — never rewrite a dot-qualified call (t.list(...)) or a
      // name that merely ENDS with a mapped spelling (my_len(...)
      var s = code
      s = "(?i)(?<![.\\w])regexp_matches\\s*\\(".r.replaceAllIn(s, "rlike(")
      s = "(?i)(?<![.\\w])len\\s*\\(".r.replaceAllIn(s, "length(")
      s = "(?i)(?<![.\\w])list_value\\s*\\(".r.replaceAllIn(s, "array(")
      s = "(?i)(?<![.\\w])list\\s*\\(".r.replaceAllIn(s, "collect_list(")
      s = "(?i)(?<![.\\w])string_split_regex\\s*\\(".r.replaceAllIn(s, "split(")
      s
    }

    /** Rewrite DuckDB's lateral-unnest FROM item — `CROSS JOIN
      * UNNEST(<arg>) AS <alias>(<col>)` — into Spark's `LATERAL VIEW
      * explode(<arg>) <alias> AS <col>` (the exact inverse of the duckdb
      * renderer's one supported generator spelling). Non-matching shapes
      * pass through untouched and fail loudly at parse. */
    private[api] def rewriteUnnest(sql: String): String = {
      def matchWord(i: Int, w: String): Int =
        if (i + w.length <= sql.length && sql.regionMatches(true, i, w, 0, w.length) &&
            (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
            (i + w.length == sql.length || !isWordChar(sql.charAt(i + w.length))))
          i + w.length
        else -1
      def skipWs(i0: Int): Int = {
        var i = i0
        while (i < sql.length && Character.isWhitespace(sql.charAt(i))) i += 1
        i
      }
      /** (identifier text verbatim, index after) or null. */
      def ident(i: Int): (String, Int) =
        if (i < sql.length && sql.charAt(i) == '`') {
          val j = closingQuote(sql, i, '`')
          (sql.substring(i, j + 1), j + 1)
        } else {
          var j = i
          while (j < sql.length && isWordChar(sql.charAt(j))) j += 1
          if (j == i) null else (sql.substring(i, j), j)
        }
      /** Balanced-paren argument starting at '(' — honors quotes. */
      def balanced(open: Int): Int = {
        var i = open; var depth = 0
        while (i < sql.length) {
          sql.charAt(i) match {
            case '\'' | '`' => i = closingQuote(sql, i, sql.charAt(i)) + 1
            case '(' => depth += 1; i += 1
            case ')' => depth -= 1; i += 1; if (depth == 0) return i
            case _ => i += 1
          }
        }
        -1
      }
      val out = new StringBuilder
      var i = 0
      while (i < sql.length) {
        sql.charAt(i) match {
          case '\'' | '`' =>
            val j = closingQuote(sql, i, sql.charAt(i))
            out ++= sql.substring(i, j + 1); i = j + 1
          case c if (c == 'c' || c == 'C') && matchWord(i, "CROSS") > 0 =>
            // attempt the full CROSS JOIN UNNEST(arg) AS a(col) shape;
            // bail to verbatim copy at the first mismatch
            val attempt: Option[(String, Int)] = for {
              afterCross <- Some(matchWord(i, "CROSS"))
              afterJoin <- Some(matchWord(skipWs(afterCross), "JOIN")).filter(_ > 0)
              afterUnnest <- Some(matchWord(skipWs(afterJoin), "UNNEST")).filter(_ > 0)
              po = skipWs(afterUnnest)
              if po < sql.length && sql.charAt(po) == '('
              pc = balanced(po)
              if pc > 0
              afterAs <- Some(matchWord(skipWs(pc), "AS")).filter(_ > 0)
              a <- Option(ident(skipWs(afterAs)))
              co = skipWs(a._2)
              if co < sql.length && sql.charAt(co) == '('
              col <- Option(ident(skipWs(co + 1)))
              cc = skipWs(col._2)
              if cc < sql.length && sql.charAt(cc) == ')'
            } yield {
              val arg = sql.substring(po + 1, pc - 1)
              (s"LATERAL VIEW explode(${rewriteUnnest(arg)}) ${a._1} AS ${col._1}",
                cc + 1)
            }
            attempt match {
              case Some((text, next)) => out ++= text; i = next
              case None => out += sql.charAt(i); i += 1
            }
          case c => out += c; i += 1
        }
      }
      out.toString()
    }

    /** Rewrite `SELECT <items> FROM <rest> QUALIFY <pred> [<tail>]` into
      * a derived table computing the predicate as a column — Spark has no
      * QUALIFY clause. Supported when every select item is a plain
      * (possibly qualified) identifier or carries an `AS alias` (the
      * outer SELECT needs the output names), and the QUALIFY sits at the
      * top level. Unsupported shapes throw — never a wrong rewrite. */
    private[api] def rewriteQualify(sql0: String): String = {
      val sql = sql0.trim
      val qIdx = topLevelKeyword(sql, "QUALIFY")
      if (qIdx < 0) return sql
      val selIdx = topLevelKeyword(sql, "SELECT")
      val fromIdx = topLevelKeyword(sql, "FROM")
      require(selIdx == 0 && fromIdx > selIdx && fromIdx < qIdx,
        s"unsupported QUALIFY shape (need a top-level SELECT … FROM … QUALIFY …): $sql")
      val items = splitTopLevel(sql.substring(selIdx + "SELECT".length, fromIdx), ',')
      val outNames = items.map { it =>
        val t = it.trim
        val asM = "(?i)\\s+AS\\s+(`(?:[^`]|``)+`|[A-Za-z_][A-Za-z0-9_]*)\\s*$".r
          .findFirstMatchIn(t)
        asM.map(_.group(1)).getOrElse {
          require(t.matches("[A-Za-z_][A-Za-z0-9_]*(\\.[A-Za-z_][A-Za-z0-9_]*)*"),
            s"QUALIFY rewrite needs plain or AS-aliased select items, got: $t")
          t.split('.').last
        }
      }
      // the tail (ORDER BY / LIMIT / OFFSET after the predicate) moves to
      // the outer query
      val after = sql.substring(qIdx + "QUALIFY".length)
      val tailIdx = Seq("ORDER", "LIMIT", "OFFSET")
        .map(k => topLevelKeyword(after, k)).filter(_ >= 0).sorted.headOption
      val (pred, tail) = tailIdx match {
        case Some(t) => (after.substring(0, t), " " + after.substring(t))
        case None => (after, "")
      }
      val itemsText = sql.substring(selIdx + "SELECT".length, fromIdx).trim
      val rest = sql.substring(fromIdx + "FROM".length, qIdx)
      s"SELECT ${outNames.mkString(", ")} FROM " +
        s"(SELECT $itemsText, ($pred) AS __graft_qualify__ FROM $rest) " +
        s"WHERE __graft_qualify__$tail"
    }

    /** An identifier character for keyword-boundary purposes — '_' counts
      * (date_from must not match FROM), unlike isLetterOrDigit alone. */
    private def isWordChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'

    /** First index of keyword `kw` at paren-depth 0 outside quotes, as a
      * whole word; -1 if absent. */
    private def topLevelKeyword(s: String, kw: String): Int = {
      var i = 0; var depth = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' | '`' => i = closingQuote(s, i, s.charAt(i)) + 1
          case '(' => depth += 1; i += 1
          case ')' => depth -= 1; i += 1
          case c if depth == 0 && Character.toUpperCase(c) == kw.charAt(0) &&
              i + kw.length <= s.length &&
              s.substring(i, i + kw.length).equalsIgnoreCase(kw) &&
              (i == 0 || !isWordChar(s.charAt(i - 1))) &&
              (i + kw.length == s.length ||
                !isWordChar(s.charAt(i + kw.length))) =>
            return i
          case _ => i += 1
        }
      }
      -1
    }

    /** Split on `sep` at paren-depth 0 outside quotes. */
    private def splitTopLevel(s: String, sep: Char): Seq[String] = {
      val parts = Seq.newBuilder[String]
      val cur = new StringBuilder
      var i = 0; var depth = 0
      while (i < s.length) {
        s.charAt(i) match {
          case '\'' | '`' =>
            val j = closingQuote(s, i, s.charAt(i))
            cur ++= s.substring(i, j + 1); i = j + 1
          case '(' => depth += 1; cur += '('; i += 1
          case ')' => depth -= 1; cur += ')'; i += 1
          case c if c == sep && depth == 0 =>
            parts += cur.toString(); cur.clear(); i += 1
          case c => cur += c; i += 1
        }
      }
      parts += cur.toString()
      parts.result()
    }
  }

  /** Render an unresolved expression back to SQL text. Catalyst's
    * Expression.sql on unresolved trees round-trips through the parser
    * for the surface this decompiler covers. */
  private def exprSql(e: Expression): String = e match {
    case UnresolvedAlias(child, _) => exprSql(child)
    // alias and attribute names quote when needed (reserved words, odd
    // characters) — bare they would fail the renders-back guard and
    // degrade the whole node to opaque
    case a: Alias => s"${exprSql(a.child)} AS ${quoteIdent(a.name)}"
    case u: UnresolvedAttribute => u.nameParts.map(quoteIdent(_)).mkString(".")
    case s: UnresolvedStar => starSql(s)
    // UnresolvedFunction.sql silently DROPS the DISTINCT flag and every
    // modifier clause (count(x) FILTER (WHERE p) prints as count(x, p) —
    // an extra ARGUMENT) — COUNT(DISTINCT x) would decompile-and-rebuild
    // as count(x). Render all four modifiers faithfully (round 13), in
    // spark's grammar order: WITHIN GROUP, then FILTER, then IGNORE NULLS.
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction =>
      val base = s"${f.nameParts.map(quoteIdent(_)).mkString(".")}(" +
        s"${if (f.isDistinct) "DISTINCT " else ""}" +
        s"${f.arguments.map(exprSql).mkString(", ")})"
      val wg =
        if (f.orderingWithinGroup.isEmpty) ""
        else " WITHIN GROUP (ORDER BY " + f.orderingWithinGroup.map { so =>
          s"${exprSql(so.child)} ${if (so.direction == Ascending) "ASC" else "DESC"} " +
            s"NULLS ${if (so.nullOrdering == NullsFirst) "FIRST" else "LAST"}"
        }.mkString(", ") + ")"
      val flt = f.filter.fold("")(p => s" FILTER (WHERE ${exprSql(p)})")
      val in_ = if (f.ignoreNulls) " IGNORE NULLS" else ""
      s"$base$wg$flt$in_"
    case r: RawSqlLeaf => r.text
    case other =>
      // catalyst's default .sql mishandles modifier-carrying aggregate
      // calls NESTED inside composite expressions too (DISTINCT silently
      // dropped, the FILTER predicate printed as an extra ARGUMENT —
      // `HAVING count(DISTINCT x) > 1` would render as `count(x) > 1`):
      // pre-render those nodes through this function and splice the text
      // in as verbatim leaves before asking .sql for the composite
      try other.transformUp {
        case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
            if f.isDistinct || f.filter.isDefined || f.ignoreNulls ||
              f.orderingWithinGroup.nonEmpty =>
          RawSqlLeaf(exprSql(f))
      }.sql
      catch { case _: Exception => "__GRAFT_UNRENDERABLE__ !" }
  }

  /** Verbatim-SQL leaf spliced into unresolved trees before calling
    * Expression.sql (see [[exprSql]]'s composite case). */
  private final case class RawSqlLeaf(text: String)
      extends org.apache.spark.sql.catalyst.expressions.LeafExpression
      with org.apache.spark.sql.catalyst.expressions.Unevaluable {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.NullType
    override def nullable: Boolean = true
    override def sql: String = text
  }

  private def starSql(s: UnresolvedStar): String =
    s.target.map(_.mkString(".") + ".*").getOrElse("*")

  private def named(e: Expression): (String, String) = e match {
    case UnresolvedAlias(child, _) => named(child)
    case a: Alias => (a.name, exprSql(a.child))
    case u: UnresolvedAttribute => (u.nameParts.last, exprSql(u))
    case s: UnresolvedStar => ("*", starSql(s))
    // exprSql, not .sql, for both halves: a bare modifier-carrying
    // aggregate item (count(DISTINCT x), agg FILTER …) would otherwise
    // lose its modifier in the rebuilt text
    case other => val s = exprSql(other); (s, s)
  }

  /** Does this rendered expression parse back? Catalyst's .sql is not
    * faithful for every unresolved node (window expressions render an
    * unparseable frame, for one) — anything that fails the round trip
    * degrades the containing plan node to [[SqlOpaque]] instead of
    * shipping a string that breaks at rebuild. */
  private[api] def rendersBack(s: String): Boolean =
    s == "*" || s.endsWith(".*") || {
      try {
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(s)
        true
      } catch { case _: Exception => false }
    }

  /** Plan-level renderability: subquery expressions must degrade the
    * containing node to opaque — their .sql is a pseudo-call
    * ("exists()", "listquery()", "scalarsubquery()") that PARSES back
    * (sailing past [[rendersBack]]) but never resolves at rebuild. They
    * stay walkable at the EXPRESSION level ([[parseExpr]], where names
    * resolve against the session catalog), not inside op-tree strings
    * (where a CTE-scoped subquery would lose its scope). */
  private def renderableSql(e: Expression): Option[String] =
    if (e.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression])) None
    else Some(exprSql(e)).filter(rendersBack)

  /** Is this expression a bare integer literal — i.e. an ordinal
    * reference under Spark's (default-on) groupByOrdinal/orderByOrdinal
    * semantics? `GROUP BY 1` parses as `Literal(1)`; the analyzer, not
    * the parser, substitutes the select-list item, so the decompiler
    * must do the same or it would group/sort by a constant. */
  private def ordinalOf(e: Expression): Option[Int] = e match {
    // Spark 4's parser emits UnresolvedOrdinal for GROUP BY 1 / ORDER BY
    // 1 directly; its .sql renders "unresolvedordinal(1)" which PARSES
    // BACK as a function call, sailing past rendersBack and exploding at
    // rebuild — so it must be intercepted here, not by the guard
    case o: org.apache.spark.sql.catalyst.analysis.UnresolvedOrdinal => Some(o.ordinal)
    // IntegerType ONLY: Spark's SubstituteUnresolvedOrdinals converts
    // just integer literals — GROUP BY 2L / ORDER BY 2S mean CONSTANT
    // grouping/sorting, and a Long-to-Int wrap (GROUP BY 4294967297)
    // must not silently alias select item 1
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => Some(v)
    case _ => None
  }

  /** The output column names of a decompiled subtree, for resolving
    * ORDER BY ordinals — walks through nodes that preserve the select
    * list (filter/having/limit/distinct/sort) to the defining
    * Project/Aggregate. None when the output list isn't statically
    * known (relation, star project, opaque, join...). */
  private def outputNames(op: SqlOp): Option[Seq[String]] = op match {
    case SqlProject(_, es) =>
      if (es.exists(e => e._1 == "*" || e._2.endsWith(".*"))) None else Some(es.map(_._1))
    case SqlAggregate(_, _, as) => Some(as.map(_._1))
    case SqlFilter(in, _) => outputNames(in)
    case SqlHaving(in, _) => outputNames(in)
    case SqlLimit(in, _, _) => outputNames(in)
    case SqlDistinct(in) => outputNames(in)
    case SqlSort(in, _) => outputNames(in)
    case SqlAlias(in, _) => outputNames(in)
    case SqlWith(in, _) => outputNames(in)
    case _ => None
  }

  def fromPlan(plan: LogicalPlan): SqlOp = plan match {
    case UnresolvedRelation(nameParts, _, _) =>
      val r = SqlRelation(nameParts.mkString("."))
      r.nameParts = nameParts
      r
    case p @ Project(projectList, child) =>
      if (projectList.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.WindowExpression])))
        fromWindowProject(p, projectList, child)
      else {
        val es = projectList.map(named)
        val noSubquery = projectList.forall(pe => !pe.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
        if (noSubquery && es.forall(e => rendersBack(e._2)))
          SqlProject(fromPlan(child), es)
        else SqlOpaque(p)
      }
    case f @ Filter(cond, child) =>
      renderableSql(cond) match {
        case Some(s) => SqlFilter(fromPlan(child), s)
        case None => SqlOpaque(f)
      }
    case a @ Aggregate(grouping, aggExprs, child, _) =>
      val as = aggExprs.map(named)
      // GROUP BY <int> is an ordinal into the select list (analyzer
      // semantics, groupByOrdinal default-on): substitute the n-th
      // select item's expression; out-of-range → opaque, never a
      // silently-constant grouping
      val ks0 = grouping.map { g =>
        ordinalOf(g) match {
          case Some(n) if n >= 1 && n <= as.size => Some(as(n - 1)._2)
          case Some(_) => None
          case None => Some(exprSql(g))
        }
      }
      val aggNoSubquery = (grouping ++ aggExprs).forall(e => !e.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
      if (aggNoSubquery && ks0.forall(_.isDefined) &&
          ks0.flatten.forall(rendersBack) && as.forall(e => rendersBack(e._2)))
        SqlAggregate(fromPlan(child), ks0.flatten, as)
      else SqlOpaque(a)
    case h @ UnresolvedHaving(cond, child) =>
      renderableSql(cond) match {
        case Some(s) => SqlHaving(fromPlan(child), s)
        case None => SqlOpaque(h)
      }
    case j @ Join(l, r, joinType, cond, _) =>
      val how = joinType match {
        case Inner => "inner"
        case LeftOuter => "left"
        case RightOuter => "right"
        case FullOuter => "outer"
        case LeftSemi => "semi"
        case LeftAnti => "anti"
        case Cross => "cross"
        case other => other.sql.toLowerCase
      }
      val condSql = cond.map(renderableSql)
      if (condSql.forall(_.isDefined))
        SqlJoin(fromPlan(l), fromPlan(r), how, condSql.flatten)
      else SqlOpaque(j)
    case s @ Sort(order, true, child, _) =>
      val in = fromPlan(child)
      // ORDER BY <int> is an ordinal into the select list: resolve it to
      // the output column NAME (the rebuilt frame's alias); unknown
      // output list or out-of-range → opaque
      val names = outputNames(in)
      val ks = order.map {
        case SortOrder(e, dir, nulls, _) =>
          val key = ordinalOf(e) match {
            case Some(n) => names match {
              // duplicate output names make the NAME rewrite ambiguous
              // where the ordinal was exact → opaque; backticks in a
              // name must be doubled per Spark's quoting rules
              case Some(ns) if n >= 1 && n <= ns.size && ns.distinct.size == ns.size =>
                Some(s"`${ns(n - 1).replace("`", "``")}`")
              case _ => None
            }
            case None => renderableSql(e)
          }
          key.map((_, dir == Ascending, nulls == NullsFirst))
      }
      if (ks.forall(_.exists(k => rendersBack(k._1)))) SqlSort(in, ks.flatten)
      else SqlOpaque(s)
    case GlobalLimit(Literal(n: Int, _), LocalLimit(_, child)) =>
      SqlLimit(fromPlan(child), Some(n.toLong), None)
    case Offset(Literal(n: Int, _), child) =>
      fromPlan(child) match {
        case SqlLimit(in, lim, None) => SqlLimit(in, lim, Some(n.toLong))
        case other => SqlLimit(other, None, Some(n.toLong))
      }
    case Distinct(child) => SqlDistinct(fromPlan(child))
    case Union(Seq(l, r), false, false) => SqlSetOp(fromPlan(l), fromPlan(r), "union", all = true)
    case Deduplicate(_, Union(Seq(l, r), false, false)) =>
      SqlSetOp(fromPlan(l), fromPlan(r), "union", all = false)
    case Intersect(l, r, isAll) => SqlSetOp(fromPlan(l), fromPlan(r), "intersect", isAll)
    case Except(l, r, isAll) => SqlSetOp(fromPlan(l), fromPlan(r), "except", isAll)
    case SubqueryAlias(id, child) => SqlAlias(fromPlan(child), id.name)
    case UnresolvedWith(child, cteRelations, _) =>
      SqlWith(fromPlan(child), cteRelations.map { case (name, body, _) =>
        (name, fromPlan(body.child))
      })
    case other => SqlOpaque(other)
  }

  /** A SELECT containing OVER clauses: catalyst's `.sql` renders an
    * unparseable frame for WindowExpression, so instead of the string
    * round-trip each window becomes a [[SqlWindowDef]] (function text,
    * keys, explicit frame in Long sentinels) computed by the DataFrame
    * window API at rebuild, and the project item references the computed
    * column. Windows nested inside larger expressions (`1 + rank()
    * OVER ...`) work — the window sub-tree is substituted with the
    * generated column reference before rendering. Degrades to opaque
    * when: a window item carries no alias (its auto-name is catalyst's
    * unfaithful `.sql` text), a frame boundary isn't a literal
    * (interval frames), or any fragment fails the renders-back guard. */
  private def fromWindowProject(p: Project,
      projectList: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression],
      child: LogicalPlan): SqlOp = {
    import org.apache.spark.sql.catalyst.expressions._
    val defs = scala.collection.mutable.ArrayBuffer[SqlWindowDef]()
    var ok = true

    def bound(e: Expression): Option[Long] = e match {
      case UnboundedPreceding => Some(Long.MinValue)
      case UnboundedFollowing => Some(Long.MaxValue)
      case CurrentRow => Some(0L)
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case UnaryMinus(Literal(v: Int, _), _) => Some(-v.toLong)
      case UnaryMinus(Literal(v: Long, _), _) => Some(-v)
      case _ => None
    }

    def windowOf(w: WindowExpression): Option[SqlWindowDef] = w.windowSpec match {
      case WindowSpecDefinition(parts, orders, frameSpec) =>
        val funcSql = exprSql(w.windowFunction)
        val partSqls = parts.map(exprSql)
        val orderKeys = orders.map { case SortOrder(e, dir, nulls, _) =>
          (exprSql(e), dir == Ascending, nulls == NullsFirst)
        }
        val frame: Option[Option[(String, Long, Long)]] = frameSpec match {
          case UnspecifiedFrame => Some(None)
          case SpecifiedWindowFrame(ft, lo, hi) =>
            val t = ft match { case RowFrame => "rows"; case RangeFrame => "range" }
            (bound(lo), bound(hi)) match {
              case (Some(l), Some(h)) => Some(Some((t, l, h)))
              case _ => None // interval / expression boundary
            }
          case _ => None
        }
        if (frame.isDefined && rendersBack(funcSql) && partSqls.forall(rendersBack) &&
            orderKeys.forall(k => rendersBack(k._1)))
          Some(SqlWindowDef(s"__graft_w${defs.size}__", funcSql, partSqls, orderKeys,
            frame.get))
        else None
      case _ => None // WindowSpecReference (WINDOW clause) — opaque
    }

    // a star item would re-expand over the __graft_wN__ helper columns
    // the rebuild adds below the project — the rebuilt frame would carry
    // extras spark.sql's output doesn't. Opaque, not silently-wider.
    if (projectList.exists(_.exists(_.isInstanceOf[UnresolvedStar])))
      return SqlOpaque(p)
    // same subquery guard as the plain-project path: a subquery anywhere
    // in the list (item OR window keys) renders as a pseudo-call that
    // parses back but never resolves — opaque, never corrupt-walkable
    if (projectList.exists(_.exists(_.isInstanceOf[SubqueryExpression])))
      return SqlOpaque(p)
    val items: Seq[(String, String)] = projectList.map { ne =>
      val inner = ne match { case UnresolvedAlias(c, _) => c; case e => e }
      inner match {
        case a: Alias if a.child.exists(_.isInstanceOf[WindowExpression]) =>
          val replaced = a.child.transform {
            case w: WindowExpression => windowOf(w) match {
              case Some(d) => defs += d; UnresolvedAttribute(Seq(d.name))
              case None => ok = false; w
            }
          }
          val sql = if (ok) exprSql(replaced) else ""
          if (!ok || !rendersBack(sql)) { ok = false; (a.name, "") }
          else (a.name, sql)
        case e if e.exists(_.isInstanceOf[WindowExpression]) =>
          ok = false; ("", "") // unaliased window: auto-name not reproducible
        case e =>
          val n = named(e)
          if (!rendersBack(n._2)) ok = false
          n
      }
    }
    if (ok) SqlProject(SqlWindow(fromPlan(child), defs.toSeq), items)
    else SqlOpaque(p)
  }

  /** Parse one expression's SQL text into a walkable [[SqlExpr]] tree.
    * Anything the core doesn't model (or whose sub-node can't re-render
    * through the parser) stays a [[SqlExprRaw]] leaf — or, if even that
    * is unsafe, the WHOLE input string becomes one raw leaf; either way
    * `render` always parses back. */
  def parseExpr(sql: String): SqlExpr =
    try fromExpression(
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseExpression(sql))
    catch { case _: Exception => SqlExprRaw(sql) }

  private def fromExpression(e: Expression): SqlExpr = {
    import org.apache.spark.sql.catalyst.expressions._
    def bin(op: String, l: Expression, r: Expression) =
      SqlExprBin(op, fromExpression(l), fromExpression(r))
    e match {
      case u: UnresolvedAttribute => SqlExprCol(u.nameParts)
      case l: Literal => SqlExprLit(l.sql)
      // BETWEEN before the generic function case: the parser rewrites the
      // infix form to a `between(v, lo, hi)` call
      case betweenCall(v, lo, hi) =>
        SqlExprBetween(fromExpression(v), fromExpression(lo), fromExpression(hi))
      // catalyst's .sql for RLike is the function spelling RLIKE(x, p),
      // which parses back as a function call — fold the aliases into the
      // same walkable node the infix form gets
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if Seq("rlike", "regexp", "regexp_like")
            .contains(f.nameParts.mkString(".").toLowerCase) &&
            f.arguments.size == 2 && !f.isDistinct && f.filter.isEmpty &&
            !f.ignoreNulls && f.orderingWithinGroup.isEmpty =>
        SqlExprLike("RLIKE", fromExpression(f.arguments(0)),
          fromExpression(f.arguments(1)))
      // Spark's parser (and .sql) spell infix LIKE/ILIKE as the function
      // calls like(x, p) / ilike(x, p) in some positions — DuckDB has no
      // such functions, so they must fold into the walkable infix node
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if Seq("like", "ilike").contains(f.nameParts.mkString(".").toLowerCase) &&
            f.arguments.size == 2 && !f.isDistinct && f.filter.isEmpty &&
            !f.ignoreNulls && f.orderingWithinGroup.isEmpty =>
        SqlExprLike(f.nameParts.mkString(".").toUpperCase,
          fromExpression(f.arguments(0)), fromExpression(f.arguments(1)))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.filter.isEmpty && !f.ignoreNulls && f.orderingWithinGroup.isEmpty =>
        SqlExprFunc(f.nameParts.mkString("."), f.arguments.map(fromExpression),
          f.isDistinct)
      // modifier-carrying calls: strip ONE modifier per recursion (outermost
      // first, matching spark's grammar order IGNORE NULLS > FILTER >
      // WITHIN GROUP) so the wrappers compose and the LIKE/RLIKE foldings
      // and DISTINCT flag stay on the innermost node
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.ignoreNulls =>
        SqlExprIgnoreNulls(fromExpression(f.copy(ignoreNulls = false)))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.filter.isDefined =>
        SqlExprAggFilter(fromExpression(f.copy(filter = None)),
          fromExpression(f.filter.get))
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.orderingWithinGroup.nonEmpty =>
        SqlExprWithinGroup(fromExpression(f.copy(orderingWithinGroup = Nil)),
          f.orderingWithinGroup.map(so => (fromExpression(so.child),
            so.direction == Ascending, so.nullOrdering == NullsFirst)))
      case Add(l, r, _) => bin("+", l, r)
      case Subtract(l, r, _) => bin("-", l, r)
      case Multiply(l, r, _) => bin("*", l, r)
      case Divide(l, r, _) => bin("/", l, r)
      case Remainder(l, r, _) => bin("%", l, r)
      case EqualTo(l, r) => bin("=", l, r)
      case EqualNullSafe(l, r) => bin("<=>", l, r)
      case LessThan(l, r) => bin("<", l, r)
      case LessThanOrEqual(l, r) => bin("<=", l, r)
      case GreaterThan(l, r) => bin(">", l, r)
      case GreaterThanOrEqual(l, r) => bin(">=", l, r)
      case And(l, r) => bin("AND", l, r)
      case Or(l, r) => bin("OR", l, r)
      case Like(l, r, '\\') => SqlExprLike("LIKE", fromExpression(l), fromExpression(r))
      case ILike(l, r, '\\') => SqlExprLike("ILIKE", fromExpression(l), fromExpression(r))
      case RLike(l, r) => SqlExprLike("RLIKE", fromExpression(l), fromExpression(r))
      case IsNull(c) => SqlExprIsNull(fromExpression(c))
      case IsNotNull(c) => SqlExprIsNull(fromExpression(c), negated = true)
      case ex: Exists => subChecked(SqlExprExists(fromPlan(ex.plan)))
      case Not(ex: Exists) => subChecked(SqlExprExists(fromPlan(ex.plan), negated = true))
      case InSubquery(Seq(v), lq: ListQuery) =>
        subChecked(SqlExprInSubquery(fromExpression(v), fromPlan(lq.plan)))
      case Not(InSubquery(Seq(v), lq: ListQuery)) =>
        subChecked(SqlExprInSubquery(fromExpression(v), fromPlan(lq.plan), negated = true))
      case sq: ScalarSubquery => subChecked(SqlExprScalarSubquery(fromPlan(sq.plan)))
      case Not(In(v, list)) =>
        SqlExprIn(fromExpression(v), list.map(fromExpression), negated = true)
      case Not(betweenCall(v, lo, hi)) =>
        SqlExprBetween(fromExpression(v), fromExpression(lo), fromExpression(hi),
          negated = true)
      case Not(c) => SqlExprUnary("NOT", fromExpression(c))
      case UnaryMinus(c, _) => SqlExprUnary("-", fromExpression(c))
      case In(v, list) => SqlExprIn(fromExpression(v), list.map(fromExpression))
      case c: Cast =>
        SqlExprCast(fromExpression(c.child), c.dataType.sql,
          isTry = c.evalMode == EvalMode.TRY)
      case CaseWhen(branches, orElse) =>
        SqlExprCase(branches.map { case (c, v) => (fromExpression(c), fromExpression(v)) },
          orElse.map(fromExpression))
      case other =>
        // outside the modeled core: keep the subtree as one verbatim
        // leaf IF its rendering survives the parser; otherwise abort so
        // parseExpr falls back to the whole original string. Subquery
        // expressions must never reach here: their .sql is a pseudo-call
        // ("exists()", "listquery()") that PARSES but never resolves —
        // verbatim text would be silently corrupt, not merely opaque.
        if (other.exists(_.isInstanceOf[SubqueryExpression]))
          throw new IllegalArgumentException(
            s"unmodeled subquery shape: ${other.getClass}")
        val s = exprSql(other)
        if (rendersBack(s)) SqlExprRaw(s)
        else throw new IllegalArgumentException(s"unrenderable: ${other.getClass}")
    }
  }

  /** Matcher for the `between(v, lo, hi)` call Spark's parser emits for
    * infix BETWEEN. */
  private object betweenCall {
    def unapply(e: Expression): Option[(Expression, Expression, Expression)] = e match {
      case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
          if f.nameParts.map(_.toLowerCase) == Seq("between") &&
            f.arguments.size == 3 && !f.isDistinct && f.filter.isEmpty =>
        Some((f.arguments(0), f.arguments(1), f.arguments(2)))
      case _ => None
    }
  }

  /** Validate a subquery-bearing expression node at construction: its
    * render must already succeed (walkable subquery all the way down), or
    * the whole expression falls back to one raw leaf via the parseExpr
    * catch — never a half-renderable node. */
  private def subChecked[A <: SqlExpr](node: A): A = { node.render; node }

  /** Rebuild a decompiled tree into a DataFrame. `scope` maps CTE names
    * to their decompiled bodies. */
  private[api] def rebuild(spark: SparkSession, op: SqlOp,
      scope: Map[String, SqlOp]): org.apache.spark.sql.DataFrame = op match {
    case SqlRelation(name) =>
      scope.get(name.toLowerCase) match {
        case Some(body) => rebuild(spark, body, scope)
        case None => spark.table(name)
      }
    case SqlProject(in, exprs) =>
      rebuild(spark, in, scope).selectExpr(exprs.map {
        case (n, e) if n == e || n == "*" => e
        case (n, e) => s"$e AS `$n`"
      }: _*)
    case SqlFilter(in, p) => rebuild(spark, in, scope).filter(p)
    case SqlHaving(agg: SqlAggregate, p) =>
      // HAVING over output aliases filters directly; HAVING over raw
      // aggregate calls (count(1) > 1) must be computed WITH the
      // aggregation — analysis is eager, so the failed direct form picks
      // the extra-column strategy deterministically
      try rebuild(spark, agg, scope).filter(p)
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          rebuild(spark, agg.copy(aggs = agg.aggs :+ ("__graft_having__", p)), scope)
            .filter(org.apache.spark.sql.functions.col("`__graft_having__`"))
            .drop("__graft_having__")
      }
    case SqlHaving(in, p) => rebuild(spark, in, scope).filter(p)
    case SqlAggregate(in, keys, aggs) =>
      import org.apache.spark.sql.functions.{col, count, expr, lit}
      val df = rebuild(spark, in, scope)
      if (keys.isEmpty) {
        val aggCols = aggs.map { case (n, e) => expr(e).as(n) }
        df.agg(aggCols.head, aggCols.tail: _*)
      } else {
        // groupBy().agg() auto-prepends the grouping columns; the SQL
        // output order is the SELECT list's — so aggregate only the
        // non-key entries, then reselect in the original order (key
        // references map positionally onto the retained grouping cols)
        val keyIdx = keys.zipWithIndex.toMap
        val pure = aggs.filter { case (_, e) => !keyIdx.contains(e) }
        val aggCols =
          if (pure.isEmpty) Seq(count(lit(1)).as("__graft_dummy__"))
          else pure.map { case (n, e) => expr(e).as(n) }
        val agged = df.groupBy(keys.map(expr): _*).agg(aggCols.head, aggCols.tail: _*)
        agged.select(aggs.map { case (n, e) =>
          keyIdx.get(e) match {
            case Some(i) => col(s"`${agged.columns(i)}`").as(n)
            case None => col(s"`$n`")
          }
        }: _*)
      }
    case SqlJoin(l, r, how, cond) =>
      val lf = rebuild(spark, l, scope); val rf = rebuild(spark, r, scope)
      cond match {
        case Some(c) => lf.join(rf, org.apache.spark.sql.functions.expr(c), how)
        case None => if (how == "cross" || how == "inner") lf.crossJoin(rf)
          else lf.join(rf)
      }
    case SqlSort(in, keys) =>
      rebuild(spark, in, scope).orderBy(keys.map { case (e, asc, nullsFirst) =>
        val c = org.apache.spark.sql.functions.expr(e)
        (asc, nullsFirst) match {
          case (true, true) => c.asc_nulls_first
          case (true, false) => c.asc_nulls_last
          case (false, true) => c.desc_nulls_first
          case (false, false) => c.desc_nulls_last
        }
      }: _*)
    case SqlLimit(in, n, off) =>
      val base = rebuild(spark, in, scope)
      val offset = off.fold(base)(o => base.offset(o.toInt))
      n.fold(offset)(l => offset.limit(l.toInt))
    case SqlDistinct(in) => rebuild(spark, in, scope).distinct()
    case SqlSetOp(l, r, op2, all) =>
      val lf = rebuild(spark, l, scope); val rf = rebuild(spark, r, scope)
      op2 match {
        case "union" => if (all) lf.union(rf) else lf.union(rf).distinct()
        case "intersect" => if (all) lf.intersectAll(rf) else lf.intersect(rf)
        case "except" => if (all) lf.exceptAll(rf) else lf.except(rf)
      }
    case SqlWindow(in, ds) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.expr
      ds.foldLeft(rebuild(spark, in, scope)) { (df, d) =>
        val base = Window.partitionBy(d.partitionBy.map(expr): _*)
        val ordered = if (d.orderBy.isEmpty) base else base.orderBy(d.orderBy.map {
          case (e, asc, nullsFirst) =>
            val c = expr(e)
            (asc, nullsFirst) match {
              case (true, true) => c.asc_nulls_first
              case (true, false) => c.asc_nulls_last
              case (false, true) => c.desc_nulls_first
              case (false, false) => c.desc_nulls_last
            }
        }: _*)
        val framed = d.frame match {
          case Some(("rows", lo, hi)) => ordered.rowsBetween(lo, hi)
          case Some((_, lo, hi)) => ordered.rangeBetween(lo, hi)
          case None => ordered // SQL default frame = DataFrame API default
        }
        df.withColumn(d.name, expr(d.func).over(framed))
      }
    case v: SqlValues =>
      spark.sql(s"SELECT * FROM ${valuesSql(v, "__graft_values__", duck = false)}")
    case SqlGroupingSets(in, keys, sets, aggs) =>
      import org.apache.spark.sql.functions.{col, count, expr, lit}
      // Dataset.groupingSets (Spark 4) takes the sets as Column seqs over
      // the full key list; agg expressions may call grouping_id(). Same
      // key-dedup dance as SqlAggregate: groupingSets().agg() auto-
      // prepends the grouping columns, the SQL select order is the list's
      val df = rebuild(spark, in, scope)
      val keyIdx = keys.zipWithIndex.toMap
      val pure = aggs.filter { case (_, e) => !keyIdx.contains(e) }
      val aggCols =
        if (pure.isEmpty) Seq(count(lit(1)).as("__graft_dummy__"))
        else pure.map { case (n, e) => expr(e).as(n) }
      val agged = df.groupingSets(sets.map(_.map(expr)), keys.map(expr): _*)
        .agg(aggCols.head, aggCols.tail: _*)
      agged.select(aggs.map { case (n, e) =>
        keyIdx.get(e) match {
          case Some(i) => col(s"`${agged.columns(i)}`").as(n)
          case None => col(s"`$n`")
        }
      }: _*)
    case SqlGenerate(in, func, cols, alias, outer, _) =>
      // generator in the select list with a multi-alias — the DataFrame
      // rendering of LATERAL VIEW (an OUTER explode/posexplode maps to
      // its *_outer function; other outer generators have no fn form)
      val fn =
        if (!outer) func
        else if (func.startsWith("explode(")) "explode_outer(" + func.stripPrefix("explode(")
        else if (func.startsWith("posexplode(")) "posexplode_outer(" + func.stripPrefix("posexplode(")
        else throw new UnsupportedOperationException(
          s"rebuild: no function form for OUTER generator $func")
      rebuild(spark, in, scope).alias(alias)
        .selectExpr("*", s"$fn AS (${cols.map(c => s"`${c.replace("`", "``")}`").mkString(", ")})")
    case SqlAlias(in, name) => rebuild(spark, in, scope).alias(name)
    case SqlWith(in, ctes) =>
      // later CTEs may reference earlier ones — extend the scope left to
      // right, lowercased (SQL identifiers are case-insensitive here)
      val extended = ctes.foldLeft(scope) { case (sc, (name, body)) =>
        sc + (name.toLowerCase -> SqlResolved(rebuild(spark, body, sc)))
      }
      rebuild(spark, in, extended)
    case SqlResolved(df) => df
    case SqlOpaque(plan) =>
      // the raw parsed subtree still executes verbatim — capability is
      // never lost, only walkability
      org.apache.spark.sql.GraftSqlBridge.ofPlan(spark, plan)
  }

  /** Internal scope entry: an already-rebuilt CTE body. */
  private[api] final case class SqlResolved(
      df: org.apache.spark.sql.DataFrame) extends SqlOp { def children = Nil }

  // ------------------------------------------------------- SQL rendering

  /** A [[SqlValues]] as a FROM item: spark spells the inline table bare
    * (`VALUES (…) AS t(a, b)`), duckdb parenthesizes (`(VALUES (…)) AS
    * t(a, b)`); cell texts pass through the dialect's expression mapper. */
  private[api] def valuesSql(v: SqlValues, alias: String, duck: Boolean): String = {
    val cell: String => String =
      if (!duck) identity
      else s => new SqlRenderer("duckdb").duckCell(s)
    val rows = v.rows.map(_.map(cell).mkString("(", ", ", ")")).mkString(", ")
    val cols = v.names.map(quoteIdent(_, duck)).mkString(", ")
    if (duck) s"(VALUES $rows) AS ${quoteIdent(alias, duck = true)}($cols)"
    else s"VALUES $rows AS ${quoteIdent(alias)}($cols)"
  }

  /** [[SqlOp.renderSql]]'s engine. */
  def renderSql(op: SqlOp, dialect: String = "spark"): String = {
    require(dialect == "spark" || dialect == "duckdb",
      s"unknown dialect '$dialect' (spark | duckdb)")
    new SqlRenderer(dialect).top(op)
  }

  /** SQL keywords that cannot stand bare as identifiers (the ANSI core
    * plus the dialect words this renderer itself emits) — an alias named
    * `order` or a CTE named `end` must render quoted or the output fails
    * to parse in either dialect. */
  private val ReservedWords = Set(
    "all", "and", "any", "anti", "as", "asc", "between", "both", "by",
    "case", "cast", "create", "cross", "current", "default", "delete",
    "desc", "distinct", "drop", "else", "end", "except", "exists",
    "false", "fetch", "filter", "for", "foreign", "from", "full",
    "group", "having", "ilike", "in", "inner", "insert", "intersect",
    "into", "is", "join", "lateral", "leading", "left", "like", "limit",
    "natural", "not", "null", "offset", "on", "or", "order", "outer",
    "over", "partition", "pivot", "primary", "qualify", "range",
    "references", "right", "rows", "select", "semi", "set", "some",
    "table", "then", "to", "trailing", "true", "union", "unique",
    "update", "using", "values", "when", "where", "window", "with")

  /** Decode catalyst's backslash-escaped string-literal BODY (the text
    * between the quotes of `Literal.sql`) to real characters. Used by the
    * duckdb dialect, whose strings are escape-free. */
  private def unescapeSparkString(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        sb += (s.charAt(i + 1) match {
          case 'n' => '\n'
          case 't' => '\t'
          case 'r' => '\r'
          case 'b' => '\b'
          case 'f' => '\f'
          case '0' => '\u0000'
          case other => other // \' \" \\ and any passthrough
        })
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString()
  }

  /** The ONE identifier-quoting rule (plain non-reserved identifiers
    * pass bare; anything else backtick- or double-quote-escaped by
    * dialect) — shared by [[SqlExprCol.render]] and the renderer so the
    * three quoting sites can't drift. */
  private[api] def quoteIdent(name: String, duck: Boolean = false): String =
    if (name.matches("[A-Za-z_][A-Za-z0-9_]*") &&
        !ReservedWords.contains(name.toLowerCase)) name
    else if (duck) "\"" + name.replace("\"", "\"\"") + "\""
    else "`" + name.replace("`", "``") + "`"

  /** Compositional SQL text builder: folds compatible plan nodes into one
    * SELECT block (FROM → WHERE → GROUP BY → HAVING → SELECT → ORDER BY →
    * LIMIT/OFFSET) and wraps into a derived table only when a clause slot
    * is already taken — so `decompile(sql).renderSql` usually reads like
    * the original query, not a tower of subselects. */
  private final class SqlRenderer(dialect: String) {
    private val duck = dialect == "duckdb"
    // true while rendering the function text of an OVER clause — the
    // IGNORE NULLS in-paren spelling is window-only in DuckDB, and
    // first_value/last_value are ALSO plain aggregate aliases of
    // first/last in Spark, so the name alone can't prove window context
    // (ADVICE r14). Rendering is single-threaded per Renderer instance.
    private var inOver = false
    private var n = 0
    private def freshAlias(): String = { n += 1; s"__g$n" }

    private def qid(name: String): String = quoteIdent(name, duck)

    /** A (possibly multi-part) relation or CTE-reference name, each
      * segment quoted — a bare `FROM odd name` for a CTE declared as
      * `WITH "odd name"` would not parse back. */
    private def relName(r: SqlRelation): String =
      (if (r.nameParts.nonEmpty) r.nameParts
       else r.name.split("\\.", -1).toSeq).map(qid).mkString(".")

    /** Expression text in the output dialect. Spark keeps the stored
      * string verbatim (it parses with Spark's parser by construction);
      * DuckDB re-renders through the walkable expression tree. */
    private def ex(s: String): String =
      if (s == "*" || s.endsWith(".*") || !duck) s
      else duckExpr(parseExpr(s))

    private def duckExpr(e: SqlExpr): String = e match {
      case SqlExprCol(parts) => parts.map(quoteIdent(_, duck = true)).mkString(".")
      case SqlExprLit(sql)
          if sql.length >= 2 && sql.head == '\'' && sql.last == '\'' &&
            sql.contains("\\") =>
        // spark escapes string literals with BACKSLASH sequences ('gam\'ma');
        // duckdb strings are escape-free with doubled quotes — unescape to
        // real characters, re-quote duckdb-style
        val real = unescapeSparkString(sql.substring(1, sql.length - 1))
        "'" + real.replace("'", "''") + "'"
      case SqlExprLit(sql) =>
        // strip Spark's typed-literal suffixes (3L, 2S, 1.5D, 9.99BD)
        val m = "^(-?\\d+)[LS]$".r.findFirstMatchIn(sql)
          .orElse("^(-?\\d*\\.\\d+(?:[eE][+-]?\\d+)?)[DF]$".r.findFirstMatchIn(sql))
          .orElse("^(-?\\d*\\.?\\d+)BD$".r.findFirstMatchIn(sql))
        m.map(_.group(1)).getOrElse(sql)
      // DuckDB function spellings for spark names with identical
      // semantics (value-proven by tools/render_check.py's fuzz corpus):
      // array() = list construction, split(x, re) = regex split
      case SqlExprFunc(name, args, false) if name.equalsIgnoreCase("array") =>
        s"list_value(${args.map(duckExpr).mkString(", ")})"
      case SqlExprFunc(name, args, false)
          if name.equalsIgnoreCase("split") &&
            (args.size == 2 ||
              // the analyzer materializes spark's default limit=-1 third
              // argument — same unlimited-regex-split semantics
              (args.size == 3 && args(2) == SqlExprLit("-1"))) =>
        s"string_split_regex(${args.take(2).map(duckExpr).mkString(", ")})"
      case SqlExprFunc(name, args, d) =>
        s"$name(${if (d) "DISTINCT " else ""}${args.map(duckExpr).mkString(", ")})"
      // ANSI aggregate FILTER clause — DuckDB shares the spelling
      case SqlExprAggFilter(fn, c) =>
        s"${duckExpr(fn)} FILTER (WHERE ${duckExpr(c)})"
      // WITHIN GROUP: DuckDB shares the spelling for the percentile pair
      // (probed incl. sort modifiers + FILTER composition). Ordered
      // LISTAGG-family calls have a different duckdb spelling — the
      // ordering moves INSIDE the call: string_agg(x, sep ORDER BY k)
      // (probed incl. DISTINCT, NULLS modifiers, FILTER composition;
      // verdict r13 #4 — the reference's GroupConcat(order_by=…),
      // ibis/expr/operations/reductions.py:82). mode() WITHIN GROUP
      // stays refused: spark's ordered form breaks frequency ties by the
      // ordering while duckdb's mode(x) tie-break is unspecified — a
      // rendering could evaluate differently, so it must refuse loudly.
      case SqlExprWithinGroup(fn, keys) =>
        def orderByText = "ORDER BY " + keys.map { case (e, a, n) =>
          s"${duckExpr(e)} ${if (a) "ASC" else "DESC"} " +
            s"NULLS ${if (n) "FIRST" else "LAST"}"
        }.mkString(", ")
        fn match {
          case SqlExprFunc(nm, _, _)
              if Seq("percentile_cont", "percentile_disc")
                .contains(nm.toLowerCase) =>
            s"${duckExpr(fn)} WITHIN GROUP ($orderByText)"
          case SqlExprFunc(nm, args, d)
              if Seq("listagg", "string_agg", "group_concat")
                .contains(nm.toLowerCase) && (args.size == 1 || args.size == 2) =>
            // spark's one-arg LISTAGG defaults the separator to '' while
            // duckdb's string_agg defaults to ',' — always render it
            val sep = if (args.size == 2) duckExpr(args(1)) else "''"
            s"string_agg(${if (d) "DISTINCT " else ""}${duckExpr(args(0))}, " +
              s"$sep $orderByText)"
          case _ => throw new UnsupportedOperationException(
            s"duckdb dialect: no WITHIN GROUP spelling for ${fn.render}. " +
              "For mode() WITHIN GROUP: spark breaks frequency ties by the " +
              "ordering while duckdb's mode(x) tie-break is unspecified " +
              "(ibis/expr/operations/reductions.py:354 Mode), so a " +
              "rendering could evaluate differently. Value-safe rewrite: " +
              "count per value and pick with arg_max — e.g. " +
              "arg_max(x, (cnt, tiebreak_key)) over a GROUP BY x subquery " +
              "— which makes the tie-break explicit in both dialects.")
        }
      // IGNORE NULLS: duckdb spells the modifier INSIDE the call parens
      // for the window navigation functions — lag(x, 1 IGNORE NULLS) —
      // (probed; lag/lead/nth_value require OVER in spark, so the window
      // context is implied by the name; first_value/last_value are ALSO
      // plain aggregate aliases of first/last, so they take this branch
      // only under an OVER clause — ADVICE r14), and FIRST-style
      // null-skipping aggregates are its any_value (documented "first
      // non-null" — the same arbitrary-pick contract as spark's
      // non-deterministic first). LAST-style stays refused: duckdb's
      // arbitrary pick is first-ish, and rendering last(x) IGNORE NULLS
      // as any_value could evaluate differently even on single-partition
      // data.
      case SqlExprIgnoreNulls(SqlExprFunc(nm, args, false))
          if args.nonEmpty &&
            (Seq("lag", "lead", "nth_value").contains(nm.toLowerCase) ||
              (inOver &&
                Seq("first_value", "last_value").contains(nm.toLowerCase))) =>
        s"${nm.toLowerCase}(${args.map(duckExpr).mkString(", ")} IGNORE NULLS)"
      case SqlExprIgnoreNulls(SqlExprFunc(nm, Seq(arg), false))
          if Seq("first", "any_value", "first_value").contains(nm.toLowerCase) =>
        s"any_value(${duckExpr(arg)})"
      case SqlExprIgnoreNulls(fn) =>
        throw new UnsupportedOperationException(
          s"duckdb dialect: no IGNORE NULLS spelling for ${fn.render}. " +
            "DuckDB's arbitrary-pick (any_value) contract is first-ish, so " +
            "a LAST-style rendering could evaluate differently " +
            "(ibis/expr/operations/reductions.py:49 Last). Value-safe " +
            "rewrite: reverse the ordering and use FIRST ... IGNORE NULLS " +
            "(rendered as any_value), or use max_by/arg_max against an " +
            "explicit ordering key.")
      // DuckDB has no <=> — the ANSI spelling is the portable form
      case SqlExprBin("<=>", l, r) =>
        s"(${duckExpr(l)} IS NOT DISTINCT FROM ${duckExpr(r)})"
      case SqlExprBin(op, l, r) => s"(${duckExpr(l)} $op ${duckExpr(r)})"
      case SqlExprUnary(op, c) => s"($op ${duckExpr(c)})"
      case SqlExprIn(v, list, neg) =>
        s"(${duckExpr(v)} ${if (neg) "NOT IN" else "IN"} " +
          s"(${list.map(duckExpr).mkString(", ")}))"
      case SqlExprCast(c, to, isTry) =>
        s"${if (isTry) "TRY_CAST" else "CAST"}(${duckExpr(c)} AS $to)"
      case SqlExprCase(branches, orElse) => "CASE" +
        branches.map { case (c, v) =>
          s" WHEN ${duckExpr(c)} THEN ${duckExpr(v)}" }.mkString +
        orElse.fold("")(o => s" ELSE ${duckExpr(o)}") + " END"
      // DuckDB has no RLIKE keyword — regexp_matches is its spelling
      case SqlExprLike("RLIKE", v, p) =>
        s"regexp_matches(${duckExpr(v)}, ${duckExpr(p)})"
      case SqlExprLike(kind, v, p) => s"(${duckExpr(v)} $kind ${duckExpr(p)})"
      case SqlExprIsNull(c, neg) =>
        s"(${duckExpr(c)} IS ${if (neg) "NOT " else ""}NULL)"
      case SqlExprBetween(v, lo, hi, neg) =>
        s"(${duckExpr(v)} ${if (neg) "NOT " else ""}BETWEEN " +
          s"${duckExpr(lo)} AND ${duckExpr(hi)})"
      case SqlExprExists(sub, neg) =>
        val t = s"EXISTS (${renderSql(sub, dialect)})"
        if (neg) s"(NOT $t)" else t
      case SqlExprInSubquery(v, sub, neg) =>
        s"(${duckExpr(v)} ${if (neg) "NOT IN" else "IN"} (${renderSql(sub, dialect)}))"
      case SqlExprScalarSubquery(sub) => s"(${renderSql(sub, dialect)})"
      case SqlExprRaw(sql) =>
        // best-effort identifier-quote swap for verbatim leaves
        "`([^`]|``)*`".r.replaceAllIn(sql, m =>
          java.util.regex.Matcher.quoteReplacement(
            "\"" + m.matched.drop(1).dropRight(1).replace("``", "`")
              .replace("\"", "\"\"") + "\""))
    }

    private case class Block(
        items: Option[Seq[String]] = None,
        distinct: Boolean = false,
        from: String,
        where: Option[String] = None,
        groupBy: Option[Seq[String]] = None,
        having: Option[String] = None,
        orderBy: Option[Seq[String]] = None,
        limit: Option[Long] = None,
        offset: Option[Long] = None,
        // relation names/aliases visible at this block's top-level FROM
        // scope (NOT those inside nested derived-table bodies) — the
        // ordinal-rewrite hazard check binds against these only
        aliases: Set[String] = Set.empty) {
      def sql: String =
        s"SELECT ${if (distinct) "DISTINCT " else ""}" +
          items.getOrElse(Seq("*")).mkString(", ") + s" FROM $from" +
          where.fold("")(w => s" WHERE $w") +
          groupBy.fold("")(g => s" GROUP BY ${g.mkString(", ")}") +
          having.fold("")(h => s" HAVING $h") +
          orderBy.fold("")(o => s" ORDER BY ${o.mkString(", ")}") +
          limit.fold("")(l => s" LIMIT $l") +
          offset.fold("")(o => s" OFFSET $o")
      def hasSelect: Boolean = items.nonEmpty || distinct
      def hasTail: Boolean = orderBy.nonEmpty || limit.nonEmpty || offset.nonEmpty
    }

    private def wrap(b: Block): Block = {
      val a = freshAlias()
      Block(from = s"(${b.sql}) AS $a", aliases = Set(a))
    }

    private def sortKey(k: (String, Boolean, Boolean)): String = {
      val (e, asc, nullsFirst) = k
      s"${ex(e)} ${if (asc) "ASC" else "DESC"} " +
        s"NULLS ${if (nullsFirst) "FIRST" else "LAST"}"
    }

    /** DuckDB binds a bare ORDER BY identifier against the FROM scope
      * when the select item carrying that output name is an implicit
      * (un-aliased) qualified reference — with two join inputs exposing
      * the name the bind is AMBIGUOUS there, while spark resolves against
      * the output list first. Where the hazard is visible (the name
      * appears qualified by ≥2 distinct relations in the rendered FROM
      * text, AND both qualifiers are top-level relation aliases of THIS
      * block — not identifiers inside nested derived-table bodies or
      * string literals, which `Block.aliases` tracks structurally) the
      * key rewrites to the select-list ORDINAL — unambiguous in both
      * dialects; everywhere else keys render unchanged, so existing
      * output text is stable. A hazard this heuristic misses still fails
      * LOUDLY at DuckDB's binder, never silently differently. */
    private def duckSafeSortKeys(b: Block,
        ks: Seq[(String, Boolean, Boolean)]): Seq[String] = {
      val ident = "[A-Za-z_][A-Za-z0-9_]*"
      val qualRefItem = s"^($ident)\\.($ident)$$".r
      lazy val implicitAt: Map[String, Seq[Int]] =
        b.items.getOrElse(Nil).zipWithIndex.collect {
          case (qualRefItem(_, nm), i) => nm -> i
        }.groupBy(_._1).map { case (nm, xs) => nm -> xs.map(_._2) }
      def ambiguousIn(from: String, nm: String): Boolean =
        s"($ident)\\.${java.util.regex.Pattern.quote(nm)}\\b".r
          .findAllMatchIn(from).map(_.group(1))
          .filter(b.aliases).toSet.size >= 2
      ks.map {
        case k @ (e, asc, nf)
            if duck && e.matches(ident) &&
              implicitAt.get(e).exists(_.size == 1) &&
              !b.items.getOrElse(Nil).exists(_.endsWith(s" AS ${qid(e)}")) &&
              ambiguousIn(b.from, e) =>
          sortKey(((implicitAt(e).head + 1).toString, asc, nf))
        case k => sortKey(k)
      }
    }

    /** A plain column reference whose LAST name part already equals the
      * output name needs no `AS` — `SELECT t0.x` names the column `x` in
      * both dialects. Beyond brevity this keeps a re-analysis of the
      * rendered text alias-free exactly where the source plan was, which
      * the plan-decompile faithfulness gate compares. */
    private def bareIdentity(nm: String, e: SqlExpr): Boolean = e match {
      case SqlExprCol(parts) => parts.nonEmpty && parts.last == nm
      case _ => false
    }

    private def items(es: Seq[(String, String)]): Seq[String] = es.map {
      case (nm, e) if nm == e || nm == "*" || e.endsWith(".*") => ex(e)
      case (nm, e) if bareIdentity(nm, parseExpr(e)) => ex(e)
      case (nm, e) => s"${ex(e)} AS ${qid(nm)}"
    }

    private def frameBound(v: Long): String = v match {
      case Long.MinValue => "UNBOUNDED PRECEDING"
      case Long.MaxValue => "UNBOUNDED FOLLOWING"
      case 0L => "CURRENT ROW"
      case x if x < 0 => s"${-x} PRECEDING"
      case x => s"$x FOLLOWING"
    }

    private def overText(d: SqlWindowDef): String = {
      val pb = if (d.partitionBy.isEmpty) ""
        else s"PARTITION BY ${d.partitionBy.map(ex).mkString(", ")}"
      val ob = if (d.orderBy.isEmpty) ""
        else s"ORDER BY ${d.orderBy.map(sortKey).mkString(", ")}"
      val fr = d.frame.fold("") { case (t, lo, hi) =>
        s"${t.toUpperCase} BETWEEN ${frameBound(lo)} AND ${frameBound(hi)}"
      }
      val fn = { // flag window context for duckExpr (ADVICE r14: bare vs
                 // windowed first_value/last_value render differently)
        val prev = inOver; inOver = true
        try ex(d.func) finally inOver = prev
      }
      s"$fn OVER (${Seq(pb, ob, fr).filter(_.nonEmpty).mkString(" ")})"
    }

    /** A VALUES cell in the duckdb dialect (spark literals re-spelled). */
    def duckCell(s: String): String = duckExpr(parseExpr(s))

    /** Renders a FROM item and collects into `acc` the relation names /
      * aliases it exposes at the item's own (top) scope — nothing from
      * inside nested derived-table bodies (the goldens pin the text;
      * `acc` only feeds the sort-key ordinal-rewrite hazard check). */
    private def fromItem(op: SqlOp,
        acc: scala.collection.mutable.Set[String]): String = op match {
      case r: SqlRelation =>
        acc += (if (r.nameParts.nonEmpty) r.nameParts
                else r.name.split("\\.", -1).toSeq).last
        relName(r)
      case SqlAlias(r: SqlRelation, a) => acc += a; s"${relName(r)} AS ${qid(a)}"
      case v: SqlValues =>
        val a = freshAlias(); acc += a; valuesSql(v, a, duck)
      case SqlAlias(v: SqlValues, a) => acc += a; valuesSql(v, a, duck)
      case SqlAlias(in, a) => acc += a; s"(${top(in)}) AS ${qid(a)}"
      case SqlJoin(l, r, how, cond) =>
        val kw = how match {
          case "inner" => "JOIN"
          case "left" => "LEFT JOIN"
          case "right" => "RIGHT JOIN"
          case "outer" | "full" | "full_outer" => "FULL JOIN"
          case "semi" => if (duck) "SEMI JOIN" else "LEFT SEMI JOIN"
          case "anti" => if (duck) "ANTI JOIN" else "LEFT ANTI JOIN"
          case "cross" => "CROSS JOIN"
          case other => throw new UnsupportedOperationException(
            s"renderSql: unknown join type '$other'")
        }
        s"${fromItem(l, acc)} $kw ${fromItem(r, acc)}${cond.fold("")(c => s" ON ${ex(c)}")}"
      case other =>
        val a = freshAlias(); acc += a; s"(${top(other)}) AS $a"
    }

    private def block(op: SqlOp): Block = op match {
      case SqlLimit(in, lim, off) =>
        val b = block(in)
        val b0 = if (b.limit.nonEmpty || b.offset.nonEmpty) wrap(b) else b
        b0.copy(limit = lim, offset = off)
      case SqlSort(in, ks) =>
        val b = block(in)
        val b0 = if (b.hasTail) wrap(b) else b
        b0.copy(orderBy = Some(duckSafeSortKeys(b0, ks)))
      case SqlDistinct(in) =>
        val b = block(in)
        val b0 = if (b.distinct || b.hasTail) wrap(b) else b
        b0.copy(distinct = true)
      case SqlProject(SqlWindow(in, defs), es) =>
        val b = block(in)
        val b0 = if (b.hasSelect || b.hasTail) wrap(b) else b
        val wmap = defs.map(d => d.name -> overText(d)).toMap
        val rendered = es.map { case (nm, e) =>
          val sub = parseExpr(e).rewrite {
            case SqlExprCol(Seq(one)) if wmap.contains(one) => SqlExprRaw(wmap(one))
          }
          val txt = if (duck) duckExpr(sub) else sub.render
          if (nm == e || nm == "*" || bareIdentity(nm, sub)) txt
          else s"$txt AS ${qid(nm)}"
        }
        b0.copy(items = Some(rendered))
      case SqlProject(in, es) =>
        val b = block(in)
        val b0 = if (b.hasSelect || b.hasTail) wrap(b) else b
        b0.copy(items = Some(items(es)))
      case SqlFilter(in, p) =>
        val b = block(in)
        val b0 = if (b.hasSelect || b.hasTail || b.where.nonEmpty ||
          b.groupBy.nonEmpty || b.having.nonEmpty) wrap(b) else b
        b0.copy(where = Some(ex(p)))
      case SqlHaving(in, p) =>
        val b = block(in)
        if (b.items.nonEmpty && b.having.isEmpty && !b.hasTail)
          b.copy(having = Some(ex(p)))
        else wrap(b).copy(where = Some(ex(p)))
      case SqlAggregate(in, ks, as) =>
        val b = block(in)
        val b0 = if (b.hasSelect || b.hasTail || b.groupBy.nonEmpty ||
          b.having.nonEmpty) wrap(b) else b
        b0.copy(items = Some(items(as)),
          groupBy = if (ks.isEmpty) None else Some(ks.map(ex)))
      case SqlGroupingSets(in, _, sets, as) =>
        val b = block(in)
        val b0 = if (b.hasSelect || b.hasTail || b.groupBy.nonEmpty ||
          b.having.nonEmpty) wrap(b) else b
        val setsSql = sets.map(_.map(ex).mkString("(", ", ", ")")).mkString(", ")
        b0.copy(items = Some(items(as)),
          groupBy = Some(Seq(s"GROUPING SETS ($setsSql)")))
      case SqlGenerate(in, func, cols, alias, outer, explodeArg) =>
        val b = block(in)
        // a taken SELECT slot or tail wraps first; an input WHERE folds
        // into the same block — SQL evaluates the lateral view before the
        // WHERE, but a predicate over pre-generate columns keeps the same
        // rows either side of the generator (and the generator's own
        // references stay in scope, which a wrap would break)
        val b0 = if (b.hasSelect || b.hasTail) wrap(b) else b
        val lateral =
          if (!duck)
            s" LATERAL VIEW ${if (outer) "OUTER " else ""}${ex(func)} " +
              s"${qid(alias)} AS ${cols.map(qid).mkString(", ")}"
          else explodeArg match {
            case Some(arg) if !outer && cols.size == 1 =>
              s" CROSS JOIN UNNEST(${ex(arg)}) AS ${qid(alias)}(${qid(cols.head)})"
            case _ => throw new UnsupportedOperationException(
              "renderSql: only a plain explode over an array has a duckdb " +
                s"spelling (got ${func}${if (outer) " OUTER" else ""})")
          }
        b0.copy(from = b0.from + lateral, aliases = b0.aliases + alias)
      case SqlWindow(_, _) =>
        throw new UnsupportedOperationException(
          "renderSql: SqlWindow must sit directly below its SqlProject")
      case SqlOpaque(_) | SqlResolved(_) =>
        throw new UnsupportedOperationException(
          "renderSql: tree is not fully decompiled (SqlOpaque) — " +
            "check isFullyDecompiled first")
      case leafOrFrom =>
        val acc = scala.collection.mutable.Set.empty[String]
        val f = fromItem(leafOrFrom, acc)
        Block(from = f, aliases = acc.toSet)
    }

    def top(op: SqlOp): String = op match {
      case SqlSetOp(l, r, kind, all) =>
        val kw = kind.toUpperCase + (if (all) " ALL" else "")
        s"(${top(l)}) $kw (${top(r)})"
      case SqlWith(in, ctes) =>
        "WITH " + ctes.map { case (nm, b) => s"${qid(nm)} AS (${top(b)})" }
          .mkString(", ") + " " + top(in)
      case SqlOpaque(_) | SqlResolved(_) =>
        throw new UnsupportedOperationException(
          "renderSql: tree is not fully decompiled (SqlOpaque) — " +
            "check isFullyDecompiled first")
      case other => block(other).sql
    }
  }
}
