package graft

import org.apache.spark.sql.functions._

import graft.api._

/** parse_sql decompile (DIVERGENCES §7): SQL text → walkable SqlOp tree
  * → rewrite → rebuilt DataFrame that matches spark.sql on the same
  * text; opaque fallbacks still execute. */
class SqlDecompileSpec extends SparkSpec {
  import spark.implicits._

  private def ensureViews(): Unit = {
    Seq((0L, "a", 0L), (1L, "b", 0L), (2L, "c", 1L), (3L, "d", 1L), (4L, "e", 2L))
      .toDF("id", "name", "grp").createOrReplaceTempView("t1")
    Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (9L, 90.0))
      .toDF("id", "v").createOrReplaceTempView("t2")
  }

  private def roundTrip(sql: String, expectWalkable: Boolean = true): Unit = {
    val op = SqlDecompile.decompile(spark, sql)
    assert(op.isFullyDecompiled == expectWalkable, s"walkability of: $sql\n$op")
    val rebuilt = op.table(spark).df
    val direct = spark.sql(sql)
    assert(rebuilt.columns.toSeq == direct.columns.toSeq, s"columns of: $sql")
    assert(rebuilt.collect().toSeq == direct.collect().toSeq, s"rows of: $sql")
  }

  test("relational core round-trips: project/filter/agg/having/join/sort/limit/offset") {
    ensureViews()
    roundTrip("SELECT id, name FROM t1 WHERE id > 1 ORDER BY id")
    roundTrip("SELECT grp, COUNT(*) AS n, SUM(id) AS s FROM t1 GROUP BY grp " +
      "HAVING COUNT(*) > 1 ORDER BY grp")
    roundTrip("SELECT t1.id, name, v FROM t1 JOIN t2 ON t1.id = t2.id ORDER BY t1.id")
    roundTrip("SELECT t1.id, v FROM t1 LEFT JOIN t2 ON t1.id = t2.id ORDER BY t1.id, v")
    roundTrip("SELECT id FROM t1 ORDER BY id DESC LIMIT 2")
    roundTrip("SELECT id FROM t1 ORDER BY id LIMIT 2 OFFSET 1")
    roundTrip("SELECT DISTINCT grp FROM t1 ORDER BY grp")
    roundTrip("SELECT id FROM t1 UNION SELECT id FROM t2 ORDER BY id")
    roundTrip("SELECT id FROM t1 UNION ALL SELECT id FROM t2 ORDER BY id")
    roundTrip("SELECT id FROM t1 INTERSECT SELECT id FROM t2 ORDER BY id")
    roundTrip("SELECT id FROM t1 EXCEPT SELECT id FROM t2 ORDER BY id")
    roundTrip("SELECT upper(name) AS u, id * 2 AS d FROM t1 WHERE grp <> 2 ORDER BY d")
  }

  test("FILTER-clause aggregates round-trip; DISTINCT survives composite HAVING (round 13)") {
    ensureViews()
    // agg FILTER (WHERE p) — previously poison-degraded to opaque
    roundTrip("SELECT grp, SUM(id) FILTER (WHERE id > 1) AS s FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, COUNT(DISTINCT name) FILTER (WHERE id < 4) AS c " +
      "FROM t1 GROUP BY grp ORDER BY grp")
    // modifier-carrying aggregates NESTED in composites: catalyst's .sql
    // drops DISTINCT and prints FILTER as an extra argument — the
    // decompiler must splice its own faithful rendering (a silent
    // wrong-SQL path before round 13, not merely a refusal)
    roundTrip("SELECT grp, COUNT(DISTINCT name) + 1 AS c1 FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, COUNT(*) AS n FROM t1 GROUP BY grp " +
      "HAVING COUNT(DISTINCT name) > 1 ORDER BY grp")
    roundTrip("SELECT grp, COUNT(*) AS n FROM t1 GROUP BY grp " +
      "HAVING SUM(id) FILTER (WHERE id > 0) >= 3 ORDER BY grp")
    val op = SqlDecompile.decompile(spark,
      "SELECT grp, COUNT(DISTINCT name) > 1 AS flag FROM t1 GROUP BY grp ORDER BY grp")
    assert(op.isFullyDecompiled, s"composite DISTINCT item should stay walkable:\n$op")
    val txt = op.renderSql()
    assert(txt.contains("DISTINCT"), s"DISTINCT dropped from composite rendering: $txt")
  }

  test("WITHIN GROUP / IGNORE NULLS are walkable modifiers (round 13)") {
    ensureViews()
    roundTrip("SELECT grp, percentile_cont(0.5) WITHIN GROUP (ORDER BY id) AS p " +
      "FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, percentile_disc(0.25) WITHIN GROUP (ORDER BY id DESC) " +
      "FILTER (WHERE id > 0) AS p FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, listagg(name, ',') WITHIN GROUP (ORDER BY id) AS s " +
      "FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, mode() WITHIN GROUP (ORDER BY id) AS m " +
      "FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT grp, any_value(name) IGNORE NULLS AS a " +
      "FROM t1 GROUP BY grp ORDER BY grp")
    roundTrip("SELECT id, first_value(name) IGNORE NULLS OVER (ORDER BY id) AS f " +
      "FROM t1 ORDER BY id")
    // duckdb dialect: the percentile pair shares the spelling (probed);
    // ordered LISTAGG-family moves the ordering INSIDE the call
    // (string_agg(x, sep ORDER BY k), round 14) and FIRST-style IGNORE
    // NULLS becomes any_value; mode() WITHIN GROUP and LAST-style IGNORE
    // NULLS have no value-faithful duckdb spelling — refuse LOUDLY
    val ok = SqlDecompile.decompile(spark,
      "SELECT grp, percentile_cont(0.5) WITHIN GROUP (ORDER BY id) AS p " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(ok.renderSql("duckdb").contains("WITHIN GROUP"))
    val la = SqlDecompile.decompile(spark,
      "SELECT grp, listagg(name, ',') WITHIN GROUP (ORDER BY id) AS s " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(la.isFullyDecompiled)
    assert(la.renderSql("duckdb").contains("string_agg(name, ',' ORDER BY id"),
      s"ordered listagg should translate: ${la.renderSql("duckdb")}")
    // one-arg listagg: spark defaults the separator to '' while duckdb's
    // string_agg defaults to ',' — the rendering must pin '' explicitly
    val la1 = SqlDecompile.decompile(spark,
      "SELECT grp, listagg(name) WITHIN GROUP (ORDER BY id) AS s " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(la1.renderSql("duckdb").contains("string_agg(name, '' ORDER BY id"),
      s"one-arg listagg must pin the '' separator: ${la1.renderSql("duckdb")}")
    val ig = SqlDecompile.decompile(spark,
      "SELECT grp, any_value(name) IGNORE NULLS AS a FROM t1 GROUP BY grp ORDER BY grp")
    assert(ig.isFullyDecompiled)
    assert(ig.renderSql("duckdb").contains("any_value(name)"),
      s"FIRST-style IGNORE NULLS should become any_value: ${ig.renderSql("duckdb")}")
    val md = SqlDecompile.decompile(spark,
      "SELECT grp, mode() WITHIN GROUP (ORDER BY id) AS m " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(md.isFullyDecompiled)
    // the refusal must carry the value-safe workaround (verdict r14 #6)
    val mdEx = intercept[UnsupportedOperationException](md.renderSql("duckdb"))
    assert(mdEx.getMessage.contains("arg_max"),
      s"mode() refusal should suggest the arg_max rewrite: ${mdEx.getMessage}")
    val lst = SqlDecompile.decompile(spark,
      "SELECT grp, last(name) IGNORE NULLS AS l FROM t1 GROUP BY grp ORDER BY grp")
    assert(lst.isFullyDecompiled)
    val lstEx = intercept[UnsupportedOperationException](lst.renderSql("duckdb"))
    assert(lstEx.getMessage.contains("reverse the ordering"),
      s"LAST refusal should suggest the reversed-order rewrite: ${lstEx.getMessage}")
    // first_value/last_value are ALSO plain aggregate aliases of
    // first/last in spark — the window-only in-paren IGNORE NULLS
    // spelling must not fire outside an OVER context (ADVICE r14):
    // bare first_value routes to any_value, bare last_value refuses
    val fvAgg = SqlDecompile.decompile(spark,
      "SELECT grp, first_value(name) IGNORE NULLS AS f " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(fvAgg.isFullyDecompiled)
    assert(fvAgg.renderSql("duckdb").contains("any_value(name)"),
      s"bare first_value IGNORE NULLS should become any_value: " +
        s"${fvAgg.renderSql("duckdb")}")
    val lvAgg = SqlDecompile.decompile(spark,
      "SELECT grp, last_value(name) IGNORE NULLS AS l " +
        "FROM t1 GROUP BY grp ORDER BY grp")
    assert(lvAgg.isFullyDecompiled)
    intercept[UnsupportedOperationException](lvAgg.renderSql("duckdb"))
    // under OVER the in-paren spelling still applies to both
    val fvWin = SqlDecompile.decompile(spark,
      "SELECT id, first_value(name) IGNORE NULLS OVER (ORDER BY id) AS f, " +
        "last_value(name) IGNORE NULLS OVER (ORDER BY id) AS l " +
        "FROM t1 ORDER BY id")
    assert(fvWin.isFullyDecompiled)
    val fvTxt = fvWin.renderSql("duckdb")
    assert(fvTxt.contains("first_value(name IGNORE NULLS)") &&
      fvTxt.contains("last_value(name IGNORE NULLS)"),
      s"windowed nav IGNORE NULLS should stay in-paren: $fvTxt")
  }

  test("ordinal GROUP BY / ORDER BY resolve against the select list, not a constant") {
    ensureViews()
    // GROUP BY 1 must group by the first select item (grp), ORDER BY 2
    // must sort by the second output column (n) — the parser leaves both
    // as bare integer Literals, so naive decompile would group/sort by
    // the CONSTANT 1/2
    roundTrip("SELECT grp, COUNT(*) AS n FROM t1 GROUP BY 1 ORDER BY 2 DESC, 1")
    roundTrip("SELECT grp, SUM(id) AS s FROM t1 GROUP BY 1 ORDER BY 1")
    roundTrip("SELECT id + 1 AS k, name FROM t1 ORDER BY 1 DESC")
    // the resolved tree is fully walkable and carries the substituted key
    val op = SqlDecompile.decompile(spark,
      "SELECT grp, COUNT(*) AS n FROM t1 GROUP BY 1")
    assert(op.isFullyDecompiled)
    assert(op.exists { case SqlAggregate(_, Seq("grp"), _) => true; case _ => false })
    // out-of-range ordinal degrades to opaque rather than rebuilding a
    // silently-wrong constant grouping (spark.sql itself raises on it)
    val bad = SqlDecompile.decompile(spark, "SELECT grp FROM t1 GROUP BY 5")
    assert(!bad.isFullyDecompiled)
    // non-IntegerType literals are CONSTANTS in Spark (only integer
    // literals get SubstituteUnresolvedOrdinals), so GROUP BY 2L /
    // ORDER BY 2L must not be rewritten to a column — and a Long whose
    // Int wrap lands in range (4294967297 → 1) must not silently alias
    // the first select item
    roundTrip("SELECT grp, COUNT(*) AS n FROM t1 GROUP BY grp, 2L ORDER BY grp")
    roundTrip("SELECT grp, COUNT(*) AS n FROM t1 GROUP BY grp, 4294967297 ORDER BY grp")
    val longLit = SqlDecompile.decompile(spark,
      "SELECT grp, COUNT(*) AS n FROM t1 GROUP BY grp, 4294967297")
    assert(!longLit.exists {
      case SqlAggregate(_, ks, _) => ks.exists(_.contains("grp, grp") || ks.count(_ == "grp") > 1)
      case _ => false
    })
    // ORDER BY ordinal over DUPLICATE output names is ambiguous as a
    // name rewrite where the ordinal was exact → opaque, still executes
    val dup = SqlDecompile.decompile(spark,
      "SELECT grp AS x, id AS x FROM t1 ORDER BY 2")
    assert(!dup.isFullyDecompiled)
    assert(dup.table(spark).df.collect().toSeq ==
      spark.sql("SELECT grp AS x, id AS x FROM t1 ORDER BY 2").collect().toSeq)
  }

  test("join conditions and sort keys get the renders-back guard") {
    ensureViews()
    // a window expression in ORDER BY / a join condition renders an
    // unparseable frame from catalyst's .sql — the node must degrade to
    // opaque rather than carrying a key string that throws at rebuild
    // (structural check: Spark's own analyzer also rejects these
    // queries, so they can't be executed for a row comparison)
    val sortPlan = spark.sessionState.sqlParser.parsePlan(
      "SELECT id FROM t1 ORDER BY row_number() OVER (PARTITION BY grp ORDER BY id)")
    assert(SqlDecompile.fromPlan(sortPlan).exists(_.isInstanceOf[SqlOpaque]))
    val joinPlan = spark.sessionState.sqlParser.parsePlan(
      "SELECT * FROM t1 JOIN t2 ON t1.id = t2.id AND " +
        "row_number() OVER (ORDER BY t1.id) = 1")
    assert(SqlDecompile.fromPlan(joinPlan).exists(_.isInstanceOf[SqlOpaque]))
  }

  test("CTEs resolve through the decompiled scope, including chained ones") {
    ensureViews()
    roundTrip("""WITH a AS (SELECT id, grp FROM t1 WHERE id > 0),
                      b AS (SELECT grp, COUNT(*) AS n FROM a GROUP BY grp)
                 SELECT * FROM b ORDER BY grp""")
  }

  test("rewrite transforms the tree; rebuilt result composes with Table verbs") {
    ensureViews()
    val op = SqlDecompile.decompile(spark,
      "SELECT grp, COUNT(*) AS n FROM t1 WHERE id < 99 GROUP BY grp")
    // the walkable structure is really there
    assert(op.exists { case SqlRelation("t1") => true; case _ => false })
    assert(op.exists { case SqlAggregate(_, Seq("grp"), _) => true; case _ => false })
    // swap the relation AND tighten the filter, purely in the tree
    val rewritten = op.rewrite {
      case SqlRelation("t1") => SqlRelation("t1")
      case SqlFilter(in, p) => SqlFilter(in, p.replace("99", "3"))
    }
    val out = rewritten.table(spark)
      .filter(col("n") >= 1).sort(api.SortKey.asc(col("grp"))) // composes
      .df.as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (1L, 1L)))
  }

  test("window-bearing SELECTs decompile to SqlWindow and round-trip (round 9)") {
    ensureViews()
    // ranking, offset and aggregate functions; default + explicit frames
    roundTrip("SELECT id, row_number() OVER (ORDER BY id) AS rn FROM t1 ORDER BY id")
    roundTrip("SELECT id, grp, rank() OVER (PARTITION BY grp ORDER BY id DESC) AS r " +
      "FROM t1 ORDER BY grp, id")
    roundTrip("SELECT id, lag(name, 1) OVER (ORDER BY id) AS prev FROM t1 ORDER BY id")
    roundTrip("SELECT id, sum(id) OVER (PARTITION BY grp ORDER BY id " +
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM t1 ORDER BY id")
    roundTrip("SELECT id, sum(id) OVER (ORDER BY id " +
      "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM t1 ORDER BY id")
    roundTrip("SELECT id, count(*) OVER (PARTITION BY grp) AS c FROM t1 ORDER BY id")
    // a window NESTED inside a larger expression substitutes cleanly
    roundTrip("SELECT id, 100 + row_number() OVER (ORDER BY id) AS k FROM t1 ORDER BY id")
    // two windows with different specs in one SELECT
    roundTrip("SELECT id, row_number() OVER (ORDER BY id) AS a, " +
      "sum(id) OVER (PARTITION BY grp) AS b FROM t1 ORDER BY id")
    // the decompiled tree really carries the window structure
    val op = SqlDecompile.decompile(spark,
      "SELECT id, rank() OVER (PARTITION BY grp ORDER BY id) AS r FROM t1")
    assert(op.isFullyDecompiled)
    assert(op.exists {
      case SqlWindow(_, Seq(SqlWindowDef(_, "rank()", Seq("grp"), Seq(("id", true, true)), None))) => true
      case _ => false
    })
    // and rewrites reach through it
    val rw = op.rewrite { case SqlRelation("t1") => SqlRelation("t1") }
    assert(rw.isFullyDecompiled)
    // unaliased windows (irreproducible auto-name) + interval frames
    // still degrade to opaque and still execute
    val unaliased = SqlDecompile.decompile(spark,
      "SELECT id, row_number() OVER (ORDER BY id) FROM t1")
    assert(!unaliased.isFullyDecompiled)
    assert(unaliased.table(spark).df.count() == 5)
    // a star alongside a window would re-expand over the rebuild's
    // helper column → opaque, and the rebuilt output must match exactly
    val starWin = SqlDecompile.decompile(spark,
      "SELECT *, rank() OVER (ORDER BY id) AS r FROM t1")
    assert(!starWin.isFullyDecompiled)
    val direct2 = spark.sql("SELECT *, rank() OVER (ORDER BY id) AS r FROM t1")
    assert(starWin.table(spark).df.columns.toSeq == direct2.columns.toSeq)
    assert(starWin.table(spark).df.collect().toSeq == direct2.collect().toSeq)
  }

  test("expression-granular decompile: parseExpr trees, rewriteExprs across the op tree (round 9)") {
    ensureViews()
    // the per-expression tree really is structural
    val e = SqlDecompile.parseExpr("sum(a.x + 1) > CAST(lo AS INT)")
    assert(e.isFullyParsed, e.toString)
    assert(e == SqlExprBin(">",
      SqlExprFunc("sum", Seq(SqlExprBin("+", SqlExprCol(Seq("a", "x")), SqlExprLit("1")))),
      SqlExprCast(SqlExprCol(Seq("lo")), "INT")))
    // render parses back and means the same thing
    assert(SqlDecompile.parseExpr(e.render).render == e.render)
    assert(SqlDecompile.parseExpr("v IN (1, 2)") ==
      SqlExprIn(SqlExprCol(Seq("v")), Seq(SqlExprLit("1"), SqlExprLit("2"))))
    assert(SqlDecompile.parseExpr(
      "CASE WHEN x = 1 THEN 'a' ELSE 'b' END").isInstanceOf[SqlExprCase])
    // count(*) normalizes to count(1) in Spark's parser itself
    assert(SqlDecompile.parseExpr("count(*)") ==
      SqlExprFunc("count", Seq(SqlExprLit("1"))))
    assert(SqlDecompile.parseExpr("count(*)").isFullyParsed)

    // one rewriteExprs pass renames a column EVERYWHERE (select, where,
    // group key, aggregate arg, sort key) and edits a literal
    val op = SqlDecompile.decompile(spark,
      "SELECT grp AS g, SUM(id) AS s FROM t1 WHERE id < 99 GROUP BY grp ORDER BY grp")
    val rewritten = op.rewriteExprs {
      case SqlExprCol(Seq("grp")) => SqlExprCol(Seq("grp2"))
      case SqlExprLit("99") => SqlExprLit("3")
    }.rewrite { // rename the source too, so grp2 resolves
      case SqlRelation("t1") => SqlRelation("t1b")
    }
    Seq((0L, "a", 0L), (1L, "b", 0L), (2L, "c", 1L), (3L, "d", 1L), (4L, "e", 2L))
      .toDF("id", "name", "grp2").createOrReplaceTempView("t1b")
    val out = rewritten.table(spark).df.as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 1L), (1L, 2L)))

    // function swap through a window definition's expression text
    val wop = SqlDecompile.decompile(spark,
      "SELECT id, sum(id) OVER (PARTITION BY grp) AS s FROM t1 ORDER BY id")
    val swapped = wop.rewriteExprs {
      case SqlExprFunc("sum", args, d) => SqlExprFunc("count", args, d)
    }
    val direct = spark.sql(
      "SELECT id, count(id) OVER (PARTITION BY grp) AS s FROM t1 ORDER BY id")
    assert(swapped.table(spark).df.collect().toSeq == direct.collect().toSeq)
  }

  test("shapes beyond the core degrade to opaque but still execute") {
    ensureViews()
    // LATERAL VIEW is a Generate plan node outside the walkable core →
    // SqlOpaque, but the raw parsed subtree still executes verbatim
    roundTrip("SELECT id, e FROM t1 LATERAL VIEW explode(array(1, 2)) x AS e ORDER BY id, e",
      expectWalkable = false)
  }

  test("subquery expressions in plans degrade to opaque, never to corrupt pseudo-calls") {
    ensureViews()
    // catalyst renders Exists/ListQuery/ScalarSubquery as "exists()" /
    // "listquery()" — text that PARSES but never resolves; before round
    // 10 these sailed past the renders-back guard into walkable nodes
    // that exploded at rebuild. They must be opaque AND still execute.
    roundTrip("SELECT id FROM t1 WHERE EXISTS (SELECT 1 FROM t2 WHERE t2.id = t1.id) ORDER BY id",
      expectWalkable = false)
    roundTrip("SELECT id FROM t1 WHERE id IN (SELECT id FROM t2) ORDER BY id",
      expectWalkable = false)
    roundTrip("SELECT id, (SELECT MAX(id) FROM t2) AS m FROM t1 ORDER BY id",
      expectWalkable = false)
  }

  test("window-bearing SELECT with a subquery item degrades to opaque, not corrupt") {
    ensureViews()
    // the window-project path must apply the same subquery guard as the
    // plain-project path — a 'walkable' tree holding scalarsubquery()
    // pseudo-text would explode at rebuild
    roundTrip("SELECT (SELECT MAX(id) FROM t2) AS m, " +
      "rank() OVER (ORDER BY id) AS r FROM t1 ORDER BY r",
      expectWalkable = false)
  }

  test("reserved-word identifiers stay walkable and render quoted in both dialects") {
    ensureViews()
    val op = SqlDecompile.decompile(spark,
      "SELECT id AS `order` FROM t1 WHERE id > 1 ORDER BY `order`")
    assert(op.isFullyDecompiled, s"$op")
    val r = op.renderSql()
    assert(r.contains("AS `order`") && r.contains("ORDER BY `order`"), r)
    assert(spark.sql(r).columns.toSeq == Seq("order"))
    assert(spark.sql(r).collect().map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
    assert(op.renderSql("duckdb").contains("AS \"order\""), op.renderSql("duckdb"))
  }

  test("renderSql quotes CTE-reference names that need it") {
    ensureViews()
    // catalog/view names can't carry spaces, but CTE names can — a bare
    // `FROM odd name` for a CTE declared `WITH \`odd name\`` would not
    // parse back
    val cte = SqlDecompile.decompile(spark,
      "WITH `odd name` AS (SELECT id FROM t1 WHERE id >= 1) " +
        "SELECT COUNT(*) AS n FROM `odd name`")
    val r2 = cte.renderSql()
    assert(r2.contains("FROM `odd name`"), r2)
    assert(spark.sql(r2).collect().head.getLong(0) == 4L, r2)
  }

  test("round-10 expression nodes: LIKE/ILIKE/RLIKE, IS [NOT] NULL, [NOT] BETWEEN") {
    val like = SqlDecompile.parseExpr("name LIKE 'a%'")
    assert(like == SqlExprLike("LIKE", SqlExprCol(Seq("name")), SqlExprLit("'a%'")))
    assert(SqlDecompile.parseExpr("name ILIKE 'A%'")
      .isInstanceOf[SqlExprLike])
    assert(SqlDecompile.parseExpr("name RLIKE 'a.*'")
      .isInstanceOf[SqlExprLike])
    assert(SqlDecompile.parseExpr("v IS NULL") == SqlExprIsNull(SqlExprCol(Seq("v"))))
    assert(SqlDecompile.parseExpr("v IS NOT NULL") ==
      SqlExprIsNull(SqlExprCol(Seq("v")), negated = true))
    assert(SqlDecompile.parseExpr("v BETWEEN 1 AND 2") ==
      SqlExprBetween(SqlExprCol(Seq("v")), SqlExprLit("1"), SqlExprLit("2")))
    assert(SqlDecompile.parseExpr("v NOT BETWEEN 1 AND 2") ==
      SqlExprBetween(SqlExprCol(Seq("v")), SqlExprLit("1"), SqlExprLit("2"),
        negated = true))
    // every node's rendering parses back and all are fully parsed
    for (s <- Seq("name LIKE 'a%'", "name ILIKE 'A%'", "name RLIKE 'a.*'",
        "v IS NULL", "v IS NOT NULL", "v BETWEEN 1 AND 2", "v NOT BETWEEN 1 AND 2",
        "NOT (name LIKE 'a%')")) {
      val e = SqlDecompile.parseExpr(s)
      assert(e.isFullyParsed, s"$s -> $e")
      assert(SqlDecompile.parseExpr(e.render).render == e.render, s"render of $s")
    }
  }

  test("round-10 subquery expression nodes: EXISTS / IN (subquery) / scalar") {
    ensureViews()
    val ex = SqlDecompile.parseExpr("EXISTS (SELECT 1 FROM t2 WHERE t2.id = 1)")
    assert(ex.isInstanceOf[SqlExprExists] && ex.isFullyParsed, s"$ex")
    val in = SqlDecompile.parseExpr("id IN (SELECT id FROM t2 WHERE v > 15.0)")
    assert(in.isInstanceOf[SqlExprInSubquery], s"$in")
    val nin = SqlDecompile.parseExpr("id NOT IN (SELECT id FROM t2)")
    assert(nin == SqlExprInSubquery(SqlExprCol(Seq("id")),
      SqlProject(SqlRelation("t2"), Seq(("id", "id"))), negated = true))
    val sc = SqlDecompile.parseExpr("(SELECT MAX(id) FROM t2)")
    assert(sc.isInstanceOf[SqlExprScalarSubquery], s"$sc")
    // the rendered text executes: rewrite the subquery's threshold then
    // use the expression as a live filter
    val rewritten = in.rewrite {
      case SqlExprInSubquery(v, sub, neg) => SqlExprInSubquery(v,
        sub match {
          case SqlProject(SqlFilter(r, p), es) =>
            SqlProject(SqlFilter(r, p.replace("15.0", "25.0")), es)
          case o => o
        }, neg)
    }
    val got = spark.table("t1").filter(rewritten.render)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(2L)) // t2 rows with v > 25 have ids {2, 9}; t1 holds only 2
  }

  test("renderSql: decompile → render → spark.sql matches the original") {
    ensureViews()
    def renderTrip(sql: String): Unit = {
      val op = SqlDecompile.decompile(spark, sql)
      assert(op.isFullyDecompiled, s"opaque: $sql\n$op")
      val rendered = op.renderSql()
      val re = spark.sql(rendered)
      val direct = spark.sql(sql)
      assert(re.columns.toSeq == direct.columns.toSeq,
        s"columns of rendered: $rendered")
      assert(re.collect().toSeq == direct.collect().toSeq,
        s"rows differ\noriginal: $sql\nrendered: $rendered")
    }
    renderTrip("SELECT id, name FROM t1 WHERE id > 1 ORDER BY id")
    renderTrip("SELECT grp, COUNT(*) AS n, SUM(id) AS s FROM t1 " +
      "WHERE id BETWEEN 0 AND 3 GROUP BY grp HAVING COUNT(*) > 1 ORDER BY grp")
    renderTrip("SELECT t1.id, name, v FROM t1 JOIN t2 ON t1.id = t2.id ORDER BY t1.id")
    renderTrip("SELECT id FROM t1 ORDER BY id DESC LIMIT 2")
    renderTrip("SELECT id FROM t1 ORDER BY id LIMIT 2 OFFSET 1")
    renderTrip("SELECT DISTINCT grp FROM t1 ORDER BY grp")
    renderTrip("SELECT * FROM (SELECT id FROM t1 UNION ALL SELECT id FROM t2) ORDER BY id")
    renderTrip("WITH big AS (SELECT id, grp FROM t1 WHERE id >= 1) " +
      "SELECT grp, COUNT(*) AS n FROM big GROUP BY grp ORDER BY grp")
    renderTrip("SELECT id, grp, rank() OVER (PARTITION BY grp ORDER BY id DESC) AS r, " +
      "sum(id) OVER (PARTITION BY grp ORDER BY id " +
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS s FROM t1 ORDER BY id")
    renderTrip("SELECT x.id AS a, y.id AS b FROM t1 AS x JOIN t2 AS y ON x.id = y.id " +
      "ORDER BY a")
    renderTrip("SELECT id + 1 AS p, CASE WHEN grp > 0 THEN 'hi' ELSE 'lo' END AS c " +
      "FROM t1 WHERE name LIKE '%a%' OR id IS NOT NULL ORDER BY p, c")
  }

  test("renderSql: duckdb dialect + opaque refusal") {
    ensureViews()
    // duckdb spellings: infix BETWEEN (never the between() call Spark's
    // parser emits), double-quoted weird identifiers, SEMI JOIN
    val op = SqlDecompile.decompile(spark,
      "SELECT id FROM t1 WHERE id BETWEEN 1 AND 3 ORDER BY id")
    val duck = op.renderSql("duckdb")
    assert(duck.contains("BETWEEN 1 AND 3") && !duck.contains("between("), duck)
    val q = SqlDecompile.decompile(spark,
      "SELECT id AS `odd name` FROM t1 ORDER BY 1")
    assert(q.renderSql("duckdb").contains("\"odd name\""))
    assert(q.renderSql().contains("`odd name`"))
    val semi = SqlJoin(SqlRelation("t1"), SqlRelation("t2"), "semi",
      Some("t1.id = t2.id"))
    assert(SqlDecompile.renderSql(semi, "duckdb").contains(" SEMI JOIN "))
    assert(SqlDecompile.renderSql(semi).contains(" LEFT SEMI JOIN "))
    // duck re-spellings for Spark-only operators: RLIKE → regexp_matches,
    // <=> → IS NOT DISTINCT FROM (verified against DuckDB's grammar)
    val rl = SqlDecompile.decompile(spark,
      "SELECT id FROM t1 WHERE name RLIKE '[a-d]' ORDER BY id")
    val rld = rl.renderSql("duckdb")
    assert(rld.contains("regexp_matches(name, '[a-d]')") && !rld.contains("RLIKE"), rld)
    assert(spark.sql(rl.renderSql()).count() ==
      spark.sql("SELECT id FROM t1 WHERE name RLIKE '[a-d]' ORDER BY id").count())
    val ns = SqlDecompile.decompile(spark,
      "SELECT id FROM t1 WHERE id <=> 1 ORDER BY id")
    assert(ns.renderSql("duckdb").contains("IS NOT DISTINCT FROM"),
      ns.renderSql("duckdb"))
    // opaque trees refuse to render
    val opq = SqlDecompile.decompile(spark,
      "SELECT id, e FROM t1 LATERAL VIEW explode(array(1, 2)) x AS e")
    intercept[UnsupportedOperationException] { opq.renderSql() }
  }

  test("q97e oracle IS the duckdb rendering — pinned against drift") {
    ensureViews()
    // the corpus query's DuckDB oracle must be EXACTLY what renderSql
    // emits for its rewritten tree, or the claimed render→DuckDB check
    // silently decays into a hand-written-SQL check
    Seq((1L, "c1", 1)).toDF("c_custkey", "c_name", "c_nationkey")
      .createOrReplaceTempView("customer")
    val op = SqlDecompile.decompile(spark,
      """SELECT c_nationkey, COUNT(*) AS n, CAST(SUM(c_custkey) AS BIGINT) AS s
         FROM customer
         WHERE c_custkey BETWEEN 10 AND 5000 AND c_name LIKE '%1%'
           AND c_name IS NOT NULL
         GROUP BY c_nationkey
         HAVING COUNT(*) >= 1
         ORDER BY c_nationkey""")
    val rewritten = op.rewriteExprs {
      case SqlExprBetween(v, SqlExprLit("10"), hi, neg) =>
        SqlExprBetween(v, SqlExprLit("3"), hi, neg)
      case SqlExprLike("LIKE", v, SqlExprLit("'%1%'")) =>
        SqlExprLike("LIKE", v, SqlExprLit("'%2%'"))
    }
    assert(SparkEntry.oracleSql("q97e_render_sql").trim ==
      rewritten.renderSql("duckdb").trim)
  }
}
