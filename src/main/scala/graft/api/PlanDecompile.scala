package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, NullType}

/** The other half of `ibis.to_sql` (reference `ibis/expr/sql.py:to_sql`,
  * re-exported at the package top level; golden-SQL snapshots in
  * `ibis/backends/tests/sql/test_select_sql.py`): render a Table COMPOSED
  * THROUGH THE FLUENT API — not just one decompiled from SQL text — back
  * to SQL. [[SqlDecompile]] covers parsed trees; this decompiles the
  * engine's own ANALYZED LogicalPlan into the same walkable [[SqlOp]]
  * ADT, so one renderer (spark + duckdb dialects) serves both origins.
  *
  * Coverage is the relational core a fluent pipeline produces:
  * relation / project / filter / aggregate / join (all types, self-joins
  * via fresh `tN` aliases) / sort / limit+offset / distinct / set ops /
  * window nodes. Attribute references resolve by EXPR ID into the alias
  * scope built bottom-up — name collisions across join sides can never
  * mis-bind. Anything outside the core REFUSES (throws [[Refused]]),
  * never emits wrong SQL; and every successful render is additionally
  * verified: the spark-dialect text is re-parsed, its relations
  * substituted with the original leaf plans, and the OPTIMIZED plan must
  * be semantically identical (`sameResult`) to the input's with matching
  * output names/types — a rendering that analysis would accept but that
  * computes something else is refused, not returned. */
object PlanDecompile {

  /** The refusal contract: unsupported shape or failed faithfulness
    * check. Never emitted SQL is the failure mode — wrong SQL never is. */
  final class Refused(msg: String) extends UnsupportedOperationException(msg)

  private def refuse(msg: String): Nothing =
    throw new Refused(s"renderSql(plan): $msg — refusing rather than emitting wrong SQL")

  /** Decompile `df`'s analyzed plan into a walkable [[SqlOp]] tree
    * (throws [[Refused]] outside the supported core). The tree rebuilds
    * ([[SqlOp.table]]) against relation NAMES, so rebuilding requires
    * the referenced tables in the session catalog; rendering does not. */
  def decompile(df: DataFrame): SqlOp = {
    val run = new Run
    decTop(df.queryExecution.analyzed)(run)
  }

  /** Decompile + render in `dialect` ("spark" | "duckdb"), with the
    * faithfulness gate: the spark-dialect rendering must re-analyze (over
    * the ORIGINAL relation leaves, no catalog needed) to the same output
    * schema and a `sameResult`-identical optimized plan. */
  def renderSql(df: DataFrame, dialect: String = "spark"): String = {
    val run = new Run
    val op = decTop(df.queryExecution.analyzed)(run)
    val sparkSql = SqlDecompile.renderSql(op, "spark")
    verify(df, sparkSql, run)
    if (dialect == "spark") sparkSql else SqlDecompile.renderSql(op, dialect)
  }

  /** Re-parse the spark rendering, splice the original relation leaves in
    * place of the by-name references, and demand semantic equality. */
  private def verify(df: DataFrame, sparkSql: String, run: Run): Unit = {
    val spark = df.sparkSession
    val lower = run.rels.map { case (k, v) => k.toLowerCase -> v }.toMap
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sparkSql)
      catch { case e: Exception => refuse(s"rendered SQL does not re-parse: ${e.getMessage}") }
    val spliced = parsed.transformUp {
      case UnresolvedRelation(parts, _, _)
          if parts.size == 1 && lower.contains(parts.head.toLowerCase) =>
        lower(parts.head.toLowerCase)
    }
    val re =
      try org.apache.spark.sql.GraftSqlBridge.ofPlan(spark, spliced)
      catch { case e: Exception => refuse(s"rendered SQL does not re-analyze: ${e.getMessage}") }
    def shape(d: DataFrame) = d.schema.fields.toSeq.map(f => (f.name, f.dataType))
    if (shape(re) != shape(df))
      refuse(s"rendered SQL re-analyzes to a different schema: " +
        s"${re.schema.simpleString} vs ${df.schema.simpleString}")
    // physical-only nodes (repartition, hints) don't exist in SQL — strip
    // them on both sides before the semantic comparison; they change
    // layout, never values
    def strip(p: LogicalPlan): LogicalPlan = p.transformUp {
      case Repartition(_, _, child) => child
      case RepartitionByExpression(_, child, _, _) => child
      case ResolvedHint(child, _) => child
      case j: Join if j.hint != JoinHint.NONE => j.copy(hint = JoinHint.NONE)
      // the LATERAL VIEW table alias lands as Generate.qualifier — pure
      // name-resolution scaffolding, semantics-free after analysis
      case g: Generate if g.qualifier.isDefined => g.copy(qualifier = None)
      // a small Range leaf rendered as inline VALUES re-analyzes to a
      // LocalRelation of the same rows — normalize the source side to
      // the same literal form
      case r: org.apache.spark.sql.catalyst.plans.logical.Range
          if r.numElements.isValidLong && r.numElements.toLong <= 1000 =>
        LocalRelation(r.output,
          (0L until r.numElements.toLong).map(i =>
            org.apache.spark.sql.catalyst.InternalRow(r.start + i * r.step)))
      // limit/offset chains: LocalLimit inside a GlobalLimit/Offset chain
      // is a derived per-partition bound, and `limit(l).offset(o)` vs
      // `LIMIT l-o OFFSET o` optimize to different-but-equivalent
      // orderings — normalize to GlobalLimit-over-Offset with no
      // LocalLimit before comparing
      case GlobalLimit(l, LocalLimit(_, c)) => GlobalLimit(l, c)
      case Offset(o, LocalLimit(_, c)) => Offset(o, c)
      case Offset(limitLit(o), GlobalLimit(limitLit(l), c)) =>
        GlobalLimit(Literal(math.max(l - o, 0L).toInt),
          Offset(Literal(o.toInt), c))
    }
    // rename-only aliases: a decompile-introduced disambiguation suffix
    // (uniquify) survives optimization as Alias(attr, newName) where the
    // source plan has the bare attribute — names are semantics-free after
    // analysis, so both sides normalize by collapsing attribute-renaming
    // aliases and rewiring references before the comparison
    def dealias(p: LogicalPlan): LogicalPlan = {
      val subst = scala.collection.mutable.HashMap[ExprId, AttributeReference]()
      p.foreach {
        case Project(items, _) => items.foreach {
          case a @ Alias(ar: AttributeReference, _)
              if a.metadata == org.apache.spark.sql.types.Metadata.empty =>
            subst(a.exprId) = ar
          case _ => ()
        }
        case _ => ()
      }
      def resolve(ar: AttributeReference): AttributeReference = {
        var cur = ar; var guard = 0
        while (subst.contains(cur.exprId) && guard < 100) {
          cur = subst(cur.exprId); guard += 1
        }
        cur
      }
      p.transformUp {
        case Project(items, child) =>
          Project(items.map {
            case a @ Alias(ar: AttributeReference, _) if subst.contains(a.exprId) =>
              resolve(ar)
            case o => o
          }, child)
      }.transformAllExpressions {
        case ar: AttributeReference => resolve(ar)
      }
    }
    // optimization EVALUATES foldable expressions — a rendering that
    // analyzed clean can still blow up here (exotic shapes like pivot's
    // synthetic aggregates); any failure is a refusal, never an escape
    val same =
      try dealias(strip(df.queryExecution.optimizedPlan))
        .sameResult(dealias(strip(re.queryExecution.optimizedPlan)))
      catch { case scala.util.control.NonFatal(e) =>
        refuse(s"rendered SQL fails optimization: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    if (!same)
      refuse("rendered SQL re-analyzes to a semantically DIFFERENT plan " +
        "(optimized-plan sameResult check failed)")
  }

  // ----------------------------------------------------------- decompile

  /** Per-decompile state: the fresh-alias counter and the relation-name →
    * original-leaf-plan map the verifier splices back. */
  private final class Run {
    private var n = -1
    private var w = -1
    private var c = -1
    def freshAlias(): String = { n += 1; s"t$n" }
    def freshWin(): String = { w += 1; s"__graft_pw${w}__" }
    def freshCol(base: String): String = { c += 1; s"${base}__g$c" }
    val rels = scala.collection.mutable.LinkedHashMap[String, LogicalPlan]()
  }

  /** Rendered (name, sql, exprId) items with duplicate names resolved:
    * at the ROOT (user-visible output) duplicates refuse; in an
    * intermediate projection the 2nd+ occurrence takes a fresh suffix —
    * every reference binds by exprId, so renaming is invisible. */
  private def uniquify(items: Seq[(String, String, ExprId)], root: Boolean,
      what: String)(implicit run: Run): Seq[(String, String, ExprId)] = {
    val seen = scala.collection.mutable.Set[String]()
    items.map { case (n, e, id) =>
      if (seen.add(n)) (n, e, id)
      else if (root)
        refuse(s"duplicate $what output name '$n' in the final projection " +
          "cannot be rendered")
      else { val n2 = run.freshCol(n); seen.add(n2); (n2, e, id) }
    }
  }

  private type Env = Map[ExprId, Seq[String]]

  private def decTop(plan: LogicalPlan)(implicit run: Run): SqlOp = {
    val (op, env) = dec(plan, root = true)
    materialize(op, plan.output, env)._1
  }

  /** Bottom-up decompile: each subtree returns its op plus the scope
    * mapping every visible attribute's exprId to the name parts that
    * reference it in the rendered SQL at that point. `root` marks the
    * chain whose output names are USER-VISIBLE (propagated through
    * name-preserving nodes): duplicate names there refuse, while an
    * INTERMEDIATE projection's duplicates (self-join column fan-in)
    * uniquify with a fresh suffix — invisible in the final output, and
    * references bind by exprId so nothing can mis-resolve. */
  private def dec(plan: LogicalPlan, root: Boolean = false)(
      implicit run: Run): (SqlOp, Env) = plan match {
    case SubqueryAlias(_, child) =>
      // user/catalog aliases are cosmetic here — scoping is by exprId and
      // every leaf gets its own fresh alias
      dec(child, root)

    case ResolvedHint(child, _) =>
      // join-strategy hints (broadcast(...)) don't change semantics and
      // SQL text can't carry them — render the plan beneath (the
      // faithfulness gate strips hints on both sides before comparing)
      dec(child, root)

    case lr: LocalRelation =>
      // memtable → inline VALUES (the reference's to_sql inlines
      // memtables too); typed literal cells keep the source types on
      // re-parse. Bounded: inlining a big frame as SQL text is a
      // pathology, not a rendering.
      if (lr.data.isEmpty) refuse("an empty memtable has no VALUES form")
      if (lr.data.size > 1000)
        refuse(s"memtable with ${lr.data.size} rows is too large to inline as VALUES")
      requireDistinct(lr.output.map(_.name), "memtable column names")
      val rows = lr.data.map { ir =>
        lr.output.zipWithIndex.map { case (a, i) =>
          val s = Literal(ir.get(i, a.dataType), a.dataType).sql
          if (!SqlDecompile.rendersBack(s))
            refuse(s"memtable cell of type ${a.dataType.simpleString} has no literal SQL form")
          s
        }
      }
      val alias = run.freshAlias()
      (SqlAlias(SqlValues(lr.output.map(_.name), rows), alias),
        lr.output.map(a => a.exprId -> Seq(alias, a.name)).toMap)

    case r: org.apache.spark.sql.catalyst.plans.logical.Range =>
      // spark.range(...) — a literal integer sequence; small ones inline
      // as typed VALUES (both dialects), the same bound as memtables
      val n = r.numElements
      if (n.isValidLong && n.toLong >= 1 && n.toLong <= 1000) {
        val rows = (0L until n.toLong).map(i =>
          Seq(Literal(r.start + i * r.step, org.apache.spark.sql.types.LongType).sql))
        val alias = run.freshAlias()
        val name = r.output.head.name
        (SqlAlias(SqlValues(Seq(name), rows), alias),
          Map(r.output.head.exprId -> Seq(alias, name)))
      } else refuse(s"range of ${r.numElements} rows is too large to inline as VALUES")

    case leaf: LeafNode =>
      val name = leafName(leaf).getOrElse(
        refuse(s"unsupported leaf relation ${leaf.getClass.getSimpleName}"))
      run.rels.get(name) match {
        case Some(prev) if prev.canonicalized != leaf.canonicalized =>
          refuse(s"two different relations would both render as '$name'")
        case None => run.rels(name) = leaf
        case _ => ()
      }
      val alias = run.freshAlias()
      val rel = SqlRelation(name)
      rel.nameParts = Seq(name)
      (SqlAlias(rel, alias), leaf.output.map(a => a.exprId -> Seq(alias, a.name)).toMap)

    case p @ Project(list, child) =>
      // a window child goes behind its pass-through projection so this
      // project's expressions land ABOVE the Window node on re-analysis —
      // mirroring the analyzer's own shape (arithmetic over window
      // columns lives in the project above the Window); the optimizer
      // collapses the adjacent projects identically on both sides
      val (in0, env0) = dec(child)
      val (in, env) = materialize(in0, child.output, env0)
      // the analyzer's window extraction can list the same attribute
      // twice in its helper projection — identical repeats collapse
      // (same exprId, same name: one rendered column serves every ref)
      val deduped = list.foldLeft(Vector.empty[NamedExpression]) { (acc, ne) =>
        ne match {
          case ar: AttributeReference
              if acc.exists { case p: AttributeReference => p.exprId == ar.exprId
                case _ => false } => acc
          case other => acc :+ other
        }
      }
      val rendered = deduped.map {
        case a: Alias => (a.name, rex(a.child, env), a.exprId)
        case ar: AttributeReference => (ar.name, rex(ar, env), ar.exprId)
        case o => refuse(s"project item ${o.getClass.getSimpleName}")
      }
      val items = uniquify(rendered, root, "project")
      (SqlProject(in, items.map(t => (t._1, t._2))),
        items.map(t => t._3 -> Seq(t._1)).toMap)

    case Filter(cond, child) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      (SqlFilter(in, rex(cond, env)), env)

    case a @ Aggregate(grouping, aggExprs, ex: Expand, _)
        if grouping.lastOption.exists {
          case ar: AttributeReference => ar.name == "spark_grouping_id"
          case _ => false
        } =>
      // rollup/cube/groupingSets: the analyzer's shape is
      //   Aggregate(keys' :+ spark_grouping_id,
      //     Expand(rows = [childCols…, keyOrNull…, gidLiteral],
      //       Project(childCols ++ keyAliases, base)))
      // — recover the key expressions from the helper projection's
      // aliases, the per-set inclusion from each Expand row's null mask,
      // and render GROUP BY GROUPING SETS (…); grouping()/grouping_id()
      // in the aggregates reference spark_grouping_id, which maps back to
      // the grouping_id() call the analyzer re-expands identically
      val gidAttr = grouping.last.asInstanceOf[AttributeReference]
      val k = grouping.size - 1
      if (k < 1) refuse("grouping sets without keys")
      val proj = ex.child match {
        case p: Project => p
        case o => refuse(s"grouping sets over ${o.getClass.getSimpleName}")
      }
      if (proj.projectList.size < k) refuse("grouping-sets helper projection too narrow")
      val aliases = proj.projectList.takeRight(k).map {
        case al: Alias => al
        case o => refuse(s"grouping-sets helper item ${o.getClass.getSimpleName}")
      }
      val (cin0, cenv0) = dec(proj.child)
      val (in, cenv) = materialize(cin0, proj.child.output, cenv0)
      val keyTexts = aliases.map(al => rex(al.child, cenv))
      val outTail = ex.output.takeRight(k + 1)
      val outKeyAttrs = outTail.init
      val groupKeyIds = grouping.init.map {
        case ar: AttributeReference => ar.exprId
        case o => refuse(s"grouping-sets key ${o.getClass.getSimpleName}")
      }
      if (groupKeyIds.toSet != outKeyAttrs.map(_.exprId).toSet)
        refuse("grouping-sets key attributes do not line up with the Expand output")
      val raw = outKeyAttrs.map(_.exprId).zip(keyTexts).toMap +
        (gidAttr.exprId -> "grouping_id()")
      val base = ex.output.size - (k + 1)
      val sets = ex.projections.map { row =>
        if (row.size != ex.output.size) refuse("malformed Expand projection row")
        keyTexts.zip(row.slice(base, base + k)).collect {
          case (t, e) if !(e.isInstanceOf[Literal] &&
            e.asInstanceOf[Literal].value == null) => t
        }
      }
      val rendered = aggExprs.map {
        case al: Alias => (al.name, rex(al.child, cenv, raw), al.exprId)
        case ar: AttributeReference => (ar.name, rex(ar, cenv, raw), ar.exprId)
        case o => refuse(s"grouping-sets aggregate item ${o.getClass.getSimpleName}")
      }
      val itemsU = uniquify(rendered, root, "grouping-sets")
      (SqlGroupingSets(in, keyTexts, sets, itemsU.map(t => (t._1, t._2))),
        itemsU.map(t => t._3 -> Seq(t._1)).toMap)

    case a @ Aggregate(grouping, aggExprs, child, _) =>
      val (in0, env0) = dec(child)
      val (in, env) = materialize(in0, child.output, env0)
      val keys = grouping.map(g => rex(g, env))
      val rendered = aggExprs.map {
        case al: Alias => (al.name, rex(al.child, env), al.exprId)
        case ar: AttributeReference => (ar.name, rex(ar, env), ar.exprId)
        case o => refuse(s"aggregate item ${o.getClass.getSimpleName}")
      }
      val aggs = uniquify(rendered, root, "aggregate")
      (SqlAggregate(in, keys, aggs.map(t => (t._1, t._2))),
        aggs.map(t => t._3 -> Seq(t._1)).toMap)

    case s @ Sort(order, true, child, _) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      val keys = order.map { case SortOrder(e, dir, nulls, _) =>
        (rex(e, env), dir == Ascending, nulls == NullsFirst)
      }
      (SqlSort(in, keys), env)

    case GlobalLimit(limitLit(n), LocalLimit(_, child)) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      in match {
        case SqlLimit(i, None, off) => (SqlLimit(i, Some(n), off), env)
        case _ => (SqlLimit(in, Some(n), None), env)
      }

    case Offset(limitLit(o), child) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      in match {
        // LIMIT l already applied below: skipping o of those l rows is
        // LIMIT max(l-o,0) OFFSET (priorOffset + o) in SQL clause order
        // (OFFSET applies before LIMIT)
        case SqlLimit(i, Some(l), prior) =>
          (SqlLimit(i, Some(math.max(l - o, 0L)), Some(prior.getOrElse(0L) + o)), env)
        case SqlLimit(i, None, Some(p)) => (SqlLimit(i, None, Some(p + o)), env)
        case _ => (SqlLimit(in, None, Some(o)), env)
      }

    case d @ Deduplicate(keys, child) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      if (keys.map(_.exprId).toSet != d.output.map(_.exprId).toSet)
        refuse("dropDuplicates on a key subset has no plain-SQL DISTINCT form")
      (SqlDistinct(in), env)

    case Distinct(child) =>
      val (in0, env0) = dec(child, root)
      val (in, env) = materialize(in0, child.output, env0)
      (SqlDistinct(in), env)

    case u @ Union(children, false, false) =>
      val ops = children.map { c =>
        val (o, e) = dec(c); materialize(o, c.output, e)._1
      }
      requireDistinct(u.output.map(_.name), "union output names")
      (ops.reduceLeft(SqlSetOp(_, _, "union", true)), outEnv(u.output))

    case i @ Intersect(l, r, isAll) =>
      val lo = { val (o, e) = dec(l); materialize(o, l.output, e)._1 }
      val ro = { val (o, e) = dec(r); materialize(o, r.output, e)._1 }
      requireDistinct(i.output.map(_.name), "intersect output names")
      (SqlSetOp(lo, ro, "intersect", isAll), outEnv(i.output))

    case x @ Except(l, r, isAll) =>
      val lo = { val (o, e) = dec(l); materialize(o, l.output, e)._1 }
      val ro = { val (o, e) = dec(r); materialize(o, r.output, e)._1 }
      requireDistinct(x.output.map(_.name), "except output names")
      (SqlSetOp(lo, ro, "except", isAll), outEnv(x.output))

    case Join(l, r, joinType, cond, _) =>
      val how = joinType match {
        case Inner => if (cond.isEmpty) "cross" else "inner"
        case LeftOuter => "left"
        case RightOuter => "right"
        case FullOuter => "outer"
        case LeftSemi => "semi"
        case LeftAnti => "anti"
        case Cross => "cross"
        case other => refuse(s"join type ${other.sql}")
      }
      if ((how == "semi" || how == "anti") && cond.isEmpty)
        refuse("semi/anti join without a condition")
      val (lop, lenv) = joinSide(l)
      val (rop, renv) = joinSide(r)
      val env = lenv ++ renv
      (SqlJoin(lop, rop, how, cond.map(rex(_, env))), env)

    case g @ Generate(gen, _, outer, _, genOutput, child) =>
      val (in0, env0) = dec(child)
      val (in, env) = materialize(in0, child.output, env0)
      val func = rex(gen, env)
      // only explode/posexplode have an OUTER function form for rebuild
      // and only a plain explode has a duckdb spelling — record the bare
      // argument when the generator is one
      val explodeArg = gen match {
        case Explode(e) if !outer => Some(rex(e, env))
        case _ => None
      }
      requireDistinct(genOutput.map(_.name), "generator output names")
      val alias = run.freshAlias()
      val env2 = env ++ genOutput.map(a => a.exprId -> Seq(alias, a.name))
      (SqlGenerate(in, func, genOutput.map(_.name), alias, outer, explodeArg), env2)

    case w @ Window(winExprs, _, _, child, _) =>
      val (in0, env0) = dec(child)
      val (in, env) = materialize(in0, child.output, env0)
      val defs = winExprs.map {
        case Alias(we: WindowExpression, _) => windowDef(we, env)
        case o => refuse(s"window item ${o.getClass.getSimpleName}")
      }
      val env2 = env ++ winExprs.zip(defs).map { case (a, d) =>
        a.exprId -> Seq(d.name)
      }
      (SqlWindow(in, defs), env2)

    case other => refuse(s"plan node ${other.getClass.getSimpleName}")
  }

  /** A join side must expose alias-qualified names into the shared FROM
    * scope: leaf aliases and nested joins already do; anything derived
    * wraps under a fresh alias (rendered as `(SELECT …) AS tN`). */
  private def joinSide(plan: LogicalPlan)(implicit run: Run): (SqlOp, Env) = {
    val (op0, env0) = dec(plan)
    val (op, env) = materialize(op0, plan.output, env0)
    op match {
      case SqlAlias(_: SqlRelation, _) | _: SqlJoin => (op, env)
      case derived =>
        requireDistinct(plan.output.map(_.name), "derived join-side output names")
        val a = run.freshAlias()
        (SqlAlias(derived, a), plan.output.map(at => at.exprId -> Seq(a, at.name)).toMap)
    }
  }

  /** A bare [[SqlWindow]] is only legal directly under a [[SqlProject]];
    * any other consumer gets an explicit pass-through projection over the
    * window node's full output (the analyzed Window node's contract:
    * child output ++ window columns). */
  private def materialize(op: SqlOp, outs: Seq[Attribute], env: Env)(
      implicit run: Run): (SqlOp, Env) = op match {
    case w: SqlWindow =>
      requireDistinct(outs.map(_.name), "window output names")
      val items = outs.map { a =>
        val parts = env.getOrElse(a.exprId, refuse(s"window output ${a.name} not in scope"))
        (a.name, SqlExprCol(parts).render)
      }
      (SqlProject(w, items), outEnv(outs))
    case _ => (op, env)
  }

  private def outEnv(outs: Seq[Attribute]): Env = {
    requireDistinct(outs.map(_.name), "output names")
    outs.map(a => a.exprId -> Seq(a.name)).toMap
  }

  private def requireDistinct(names: Seq[String], what: String): Unit = {
    val dup = names.diff(names.distinct).distinct
    if (dup.nonEmpty)
      refuse(s"duplicate $what (${dup.mkString(", ")}) cannot be referenced unambiguously")
  }

  private object limitLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _) => Some(v.toLong)
      case Literal(v: Long, _) => Some(v)
      case _ => None
    }
  }

  // ---------------------------------------------------------- expressions

  /** Placeholder whose `.sql` is the alias-qualified reference — spliced
    * over every [[AttributeReference]] so catalyst's own SQL generation
    * renders the rest of the (resolved) expression around it. */
  private final case class QualifiedRef(parts: Seq[String]) extends LeafExpression
      with Unevaluable {
    override def dataType: DataType = NullType
    override def nullable: Boolean = true
    override def sql: String = parts.map(SqlDecompile.quoteIdent(_)).mkString(".")
  }

  /** Pre-rendered SQL fragment leaf (lambda bodies). */
  private final case class RawSql(text: String) extends LeafExpression with Unevaluable {
    override def dataType: DataType = NullType
    override def nullable: Boolean = true
    override def sql: String = text
  }

  /** Render a RESOLVED expression to SQL text in the given scope: splice
    * qualified references over attributes, let catalyst `.sql` print the
    * tree, and demand the text re-parses. Faithfulness beyond parseability
    * (a `.sql` that parses but means something else) is what the
    * whole-query [[verify]] gate exists for. */
  private def rex(e: Expression, env: Env,
      raw: Map[ExprId, String] = Map.empty): String = {
    if (e.exists(_.isInstanceOf[SubqueryExpression]))
      refuse("subquery expressions are not renderable from an analyzed plan")
    if (e.exists(_.isInstanceOf[WindowExpression]))
      refuse("window expression outside a Window node")
    // the substitution itself can throw: some expression constructors
    // (pivot's synthetic aggregates) evaluate their children on copy —
    // those shapes refuse, same as a failed .sql
    val s =
      try e.transformUp {
        // raw overrides (grouping-sets keys, grouping_id()) come first
        case ar: AttributeReference if raw.contains(ar.exprId) =>
          RawSql(raw(ar.exprId))
        case ar: AttributeReference =>
          QualifiedRef(env.getOrElse(ar.exprId,
            refuse(s"column ${ar.name}#${ar.exprId.id} is not in scope")))
        // catalyst's .sql mangles lambdas into the unresolvable pseudo-call
        // lambdafunction(namedlambdavariable()…) — render `x -> body`
        // (inner lambdas and captured columns are already substituted:
        // transformUp is bottom-up)
        case lf: LambdaFunction =>
          val names = lf.arguments.map {
            case v: NamedLambdaVariable => v.name
            case o => refuse(s"lambda argument ${o.getClass.getSimpleName}")
          }
          val body = lf.function.transformUp {
            case v: NamedLambdaVariable => RawSql(SqlDecompile.quoteIdent(v.name))
          }
          val lhs =
            if (names.size == 1) SqlDecompile.quoteIdent(names.head)
            else names.map(SqlDecompile.quoteIdent(_)).mkString("(", ", ", ")")
          RawSql(s"$lhs -> ${body.sql}")
      }.sql
      catch {
        case r: Refused => throw r
        case ex: Throwable => refuse(s"no SQL text for: ${e.getClass.getSimpleName} (${ex.getClass.getSimpleName})")
      }
    if (!SqlDecompile.rendersBack(s))
      refuse(s"generated text does not re-parse: $s")
    s
  }

  /** One analyzed window expression → [[SqlWindowDef]]. Ranking and
    * offset functions render their canonical zero/explicit-arg SQL forms
    * (their analyzed trees carry internal children `.sql` would leak) and
    * drop the implied frame; aggregate windows keep the analyzer's
    * explicit frame when its bounds are literal. */
  private def windowDef(we: WindowExpression, env: Env)(implicit run: Run): SqlWindowDef = {
    val spec = we.windowSpec match {
      case s: WindowSpecDefinition => s
      case o => refuse(s"window spec ${o.getClass.getSimpleName}")
    }
    def bound(e: Expression): Long = e match {
      case UnboundedPreceding => Long.MinValue
      case UnboundedFollowing => Long.MaxValue
      case CurrentRow => 0L
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case UnaryMinus(Literal(v: Int, _), _) => -v.toLong
      case UnaryMinus(Literal(v: Long, _), _) => -v
      case o => refuse(s"non-literal window frame bound ${o.getClass.getSimpleName}")
    }
    def offsetOf(): Long = spec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, lo, hi) if bound(lo) == bound(hi) => bound(lo)
      case o => refuse(s"offset window function with frame $o")
    }
    val (funcSql, frame): (String, Option[(String, Long, Long)]) = we.windowFunction match {
      case _: RowNumber => ("row_number()", None)
      case _: Rank => ("rank()", None)
      case _: DenseRank => ("dense_rank()", None)
      case _: PercentRank => ("percent_rank()", None)
      case _: CumeDist => ("cume_dist()", None)
      case nt: NTile => (s"ntile(${rex(nt.buckets, env)})", None)
      case Lag(in, _, dflt, ignoreNulls) =>
        if (ignoreNulls) refuse("lag(... ignoreNulls) has no portable SQL form here")
        val k = -offsetOf()
        val d = dflt match { case Literal(null, _) => ""; case o => s", ${rex(o, env)}" }
        (s"lag(${rex(in, env)}, $k$d)", None)
      case Lead(in, _, dflt, ignoreNulls) =>
        if (ignoreNulls) refuse("lead(... ignoreNulls) has no portable SQL form here")
        val k = offsetOf()
        val d = dflt match { case Literal(null, _) => ""; case o => s", ${rex(o, env)}" }
        (s"lead(${rex(in, env)}, $k$d)", None)
      case NthValue(in, off, ignoreNulls) =>
        if (ignoreNulls) refuse("nth_value(... ignoreNulls) has no portable SQL form here")
        (s"nth_value(${rex(in, env)}, ${rex(off, env)})", None)
      case ae: AggregateExpression =>
        val f = spec.frameSpecification match {
          case SpecifiedWindowFrame(ft, lo, hi) =>
            val t = ft match { case RowFrame => "rows"; case RangeFrame => "range" }
            Some((t, bound(lo), bound(hi)))
          case UnspecifiedFrame => None
          case o => refuse(s"window frame ${o.getClass.getSimpleName}")
        }
        (rex(ae, env), f)
      case o => refuse(s"window function ${o.getClass.getSimpleName}")
    }
    val parts = spec.partitionSpec.map(rex(_, env))
    val orders = spec.orderSpec.map { case SortOrder(e, dir, nulls, _) =>
      (rex(e, env), dir == Ascending, nulls == NullsFirst)
    }
    SqlWindowDef(run.freshWin(), funcSql, parts, orders, frame)
  }

  // -------------------------------------------------------------- leaves

  /** The SQL-referenceable name of a leaf relation: catalog identifier
    * when there is one, else the single root path's basename with its
    * format extension stripped (`…/lineitem.parquet` → `lineitem` — the
    * name the engine's own test oracle registers). */
  private def leafName(p: LogicalPlan): Option[String] = p match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).orElse(lr.relation match {
        case hfs: HadoopFsRelation =>
          val roots = hfs.location.rootPaths
          if (roots.size != 1) None
          else {
            val base = roots.head.getName
            val dot = base.lastIndexOf('.')
            Some(if (dot > 0) base.substring(0, dot) else base)
          }
        case _ => None
      })
    case v: View => Some(v.desc.identifier.table)
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      Option(d.table).map(_.name()).filter(_.nonEmpty)
    case _ => None
  }
}
