package graft.tools

/** Seeded random SQL generator shared by SqlDecompileFuzzSpec and the
  * duckdb-render round-trip harness ([[RenderDump]] + tools/render_check
  * .py): a grammar spanning projections, arithmetic/string/CASE
  * expressions, WHERE trees (AND/OR/IN/BETWEEN/IS NULL), GROUP BY (names
  * AND ordinals) with HAVING, equi-joins, set-ops, windows, DISTINCT and
  * LIMIT/OFFSET over two small fixture tables `ft1(id,name,grp)` /
  * `ft2(id,v)`. Every query carries a total ORDER BY so row comparison
  * is deterministic. */
final class SqlFuzzGen(seed: Long) {
  val rnd = new scala.util.Random(seed)
  def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.length))

  def scalarExpr(cols: Seq[String]): String = rnd.nextInt(6) match {
    case 0 => pick(cols)
    case 1 => s"${pick(cols)} + ${rnd.nextInt(5)}"
    case 2 => s"${pick(cols)} * 2"
    case 3 => s"CASE WHEN ${pick(cols)} > ${rnd.nextInt(4)} THEN 1 ELSE 0 END"
    case 4 => s"abs(${pick(cols)} - ${rnd.nextInt(3)})"
    case _ => s"${pick(cols)} % ${rnd.nextInt(3) + 2}"
  }

  def predicate(cols: Seq[String]): String = rnd.nextInt(7) match {
    case 0 => s"${pick(cols)} ${pick(Seq(">", "<", ">=", "<=", "=", "<>"))} ${rnd.nextInt(5)}"
    case 1 => s"${pick(cols)} IN (${Seq.fill(rnd.nextInt(3) + 1)(rnd.nextInt(6)).mkString(", ")})"
    case 2 => s"${pick(cols)} BETWEEN ${rnd.nextInt(3)} AND ${rnd.nextInt(4) + 3}"
    case 3 => s"${pick(cols)} ${pick(Seq("IS NOT NULL", "IS NULL"))}"
    case 4 => s"${pick(cols)} NOT BETWEEN ${rnd.nextInt(2)} AND ${rnd.nextInt(3) + 1}"
    case 5 => s"(${predicate(cols)} AND ${predicate(cols)})"
    case _ => s"(${predicate(cols)} OR ${predicate(cols)})"
  }

  /** A full query; returns (sql, output column names). */
  def query(depth: Int): (String, Seq[String]) = {
    val shape = rnd.nextInt(13)
    if (shape == 10) { // string predicates: LIKE / NOT LIKE / IS NULL
      val p = pick(Seq("name LIKE '%a%'", "name LIKE '_'", "name NOT LIKE 'z%'",
        "name ILIKE 'A%'", "name RLIKE '[a-d]'", "name IS NOT NULL"))
      val sql = s"SELECT id, name FROM ft1 WHERE $p AND ${predicate(Seq("id"))} " +
        "ORDER BY id"
      (sql, Seq("id", "name"))
    } else if (shape == 11 && depth < 1) { // correlated/uncorrelated subquery predicate → opaque by contract
      val p = pick(Seq(
        "EXISTS (SELECT 1 FROM ft2 WHERE ft2.id = ft1.id)",
        "NOT EXISTS (SELECT 1 FROM ft2 WHERE ft2.id = ft1.id)",
        s"id IN (SELECT id FROM ft2 WHERE v > ${rnd.nextInt(40)})",
        s"id NOT IN (SELECT id FROM ft2 WHERE v > ${rnd.nextInt(40)})"))
      (s"SELECT id FROM ft1 WHERE $p ORDER BY id", Seq("id"))
    } else if (shape == 12 && depth < 1) { // CTE
      val sql = s"WITH b AS (SELECT id, grp FROM ft1 WHERE ${predicate(Seq("id", "grp"))}) " +
        "SELECT grp, COUNT(*) AS n FROM b GROUP BY grp ORDER BY grp, n"
      (sql, Seq("grp", "n"))
    } else if (shape < 2 && depth < 1) { // set-op of two simple queries
      val op = pick(Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT"))
      val sql = s"SELECT id FROM ft1 WHERE ${predicate(Seq("id", "grp"))} " +
        s"$op SELECT CAST(${scalarExpr(Seq("id"))} AS BIGINT) FROM ft2"
      (s"SELECT * FROM ($sql) ORDER BY id", Seq("id"))
    } else if (shape < 4) { // aggregate (maybe with an ANSI FILTER clause)
      val keyIsOrdinal = rnd.nextBoolean()
      val groupKey = if (keyIsOrdinal) "1" else "grp"
      val agg0 = pick(Seq("COUNT(*)", "SUM(id)", "MIN(id)", "MAX(id)", "AVG(id)"))
      // agg FILTER (WHERE p) — round 13: the reference's `where=` reduction;
      // shared spelling in spark and duckdb, so the round trip value-checks it
      val agg = if (rnd.nextInt(3) == 0)
        s"$agg0 FILTER (WHERE ${predicate(Seq("id"))})" else agg0
      val having = if (rnd.nextBoolean()) s" HAVING $agg >= 0" else ""
      val sql = s"SELECT grp AS k, $agg AS a FROM ft1 " +
        s"WHERE ${predicate(Seq("id", "grp"))} GROUP BY $groupKey$having ORDER BY k, a"
      (sql, Seq("k", "a"))
    } else if (shape < 6) { // join
      val how = pick(Seq("JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"))
      val sql = s"SELECT ft1.id AS i, name, v FROM ft1 $how ft2 ON ft1.id = ft2.id " +
        s"ORDER BY i, name, v"
      (sql, Seq("i", "name", "v"))
    } else if (shape < 7) { // window
      val fn = pick(Seq("row_number()", "rank()", "dense_rank()",
        "sum(id)", "lag(id, 1)"))
      val sql = s"SELECT id, grp, $fn OVER (PARTITION BY grp ORDER BY id) AS w " +
        s"FROM ft1 ORDER BY id"
      (sql, Seq("id", "grp", "w"))
    } else { // project/filter, maybe DISTINCT, maybe nested, maybe LIMIT
      val cols = Seq("id", "grp")
      val e1 = scalarExpr(cols); val e2 = scalarExpr(cols)
      val distinct = if (rnd.nextInt(4) == 0) "DISTINCT " else ""
      val inner =
        if (depth < 2 && rnd.nextInt(3) == 0)
          s"(SELECT ${scalarExpr(cols)} AS x FROM ft1 WHERE ${predicate(cols)})"
        else "ft1"
      val limit = if (rnd.nextInt(3) == 0) s" LIMIT ${rnd.nextInt(5) + 1}" else ""
      val whereCols = if (inner == "ft1") Seq("id", "grp") else Seq("x")
      val (sel, outs) =
        if (inner == "ft1") (s"$e1 AS x, $e2 AS y", Seq("x", "y"))
        else ("x AS x, x + 1 AS y", Seq("x", "y"))
      val sql = s"SELECT $distinct$sel FROM $inner " +
        s"WHERE ${predicate(whereCols)} ORDER BY x, y$limit"
      (sql, outs)
    }
  }
}

object SqlFuzzGen {
  /** The fixture rows behind `ft1` / `ft2`. */
  val ft1Rows: Seq[(Long, String, Long)] = Seq((0L, "a", 0L), (1L, "b", 0L),
    (2L, "c", 1L), (3L, "d", 1L), (4L, "e", 2L), (5L, "f", 2L),
    (6L, "g", 0L), (7L, "h", 3L))
  val ft2Rows: Seq[(Long, Double)] =
    Seq((0L, 10.0), (1L, 20.0), (2L, 30.0), (4L, 40.0), (9L, 90.0))
}
