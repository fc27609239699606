package graft

import graft.api.{PlanDecompile, Table}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed-Table → SQL (`ibis.to_sql` parity, round 11): every fluent
  * pipeline below renders via [[Table.renderSql]] and the SPARK rendering
  * is re-executed (over temp views of the same inputs) and compared
  * VALUE-LEVEL against the original DataFrame. The duckdb rendering is
  * exercised for shape (non-empty, no backticks); its value-level check
  * is the q97f corpus entry, where DuckDB itself executes the rendering
  * as the oracle. Unsupported shapes must REFUSE, never mis-render. */
class PlanDecompileSpec extends SparkSpec {

  private def t(name: String): DataFrame = graft.queries.Tables.t(spark, sfDir, name)

  /** Register the sf tables as temp views so the rendered SQL's by-name
    * relations resolve when re-executed through spark.sql. */
  private def ensureViews(): Unit =
    Seq("nation", "region", "customer", "supplier", "orders", "lineitem", "part",
      "documents").foreach(n => t(n).createOrReplaceTempView(n))

  private def checkSpark(df: DataFrame): String = {
    ensureViews()
    val sql = new Table(df).renderSql()
    val re = spark.sql(sql)
    assert(re.columns.toSeq == df.columns.toSeq, s"column mismatch for:\n$sql")
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = re.collect().map(_.toString).sorted.toSeq
    assert(a == b, s"value mismatch for:\n$sql")
    sql
  }

  private def check(df: DataFrame): String = {
    val sql = checkSpark(df)
    val duck = new Table(df).renderSql("duckdb")
    assert(duck.nonEmpty && !duck.contains("`"), s"duckdb rendering malformed:\n$duck")
    sql
  }

  private def refuses(df: DataFrame): Unit =
    assertThrows[PlanDecompile.Refused] { new Table(df).renderSql() }

  // ------------------------------------------------------------ the core

  test("project + filter folds into one SELECT block") {
    val sql = check(t("nation").filter(col("n_nationkey") > 5)
      .select(col("n_name"), (col("n_regionkey") + 1).as("r1")))
    assert(sql.contains("WHERE"), sql)
    assert(!sql.contains("SELECT *"), sql)
  }

  test("aggregate with grouping keys, HAVING-style filter above") {
    check(t("customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("s"))
      .filter(col("n") > 2)
      .orderBy(col("c_nationkey")))
  }

  test("global aggregate without grouping") {
    check(t("nation").agg(count(lit(1)).as("n"), max(col("n_nationkey")).as("mx")))
  }

  test("inner join with projection and sort") {
    val n = t("nation"); val r = t("region")
    check(n.join(r, n("n_regionkey") === r("r_regionkey"), "inner")
      .select(n("n_name"), r("r_name"))
      .orderBy(col("n_name")))
  }

  test("left/semi/anti/cross joins") {
    val n = t("nation"); val r = t("region")
    check(n.join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .select(n("n_name"), r("r_name")).orderBy(col("n_name")))
    check(n.join(r, n("n_regionkey") === r("r_regionkey"), "left_semi")
      .orderBy(col("n_nationkey")))
    check(n.join(r.filter(col("r_regionkey") < 2),
      n("n_regionkey") === r("r_regionkey"), "left_anti")
      .orderBy(col("n_nationkey")))
    check(n.limit(3).crossJoin(r.select(col("r_name"))))
  }

  test("self-join disambiguates via fresh aliases") {
    val a = t("nation"); val b = t("nation")
    val j = a.join(b, a("n_regionkey") === b("n_regionkey") &&
      a("n_nationkey") < b("n_nationkey"))
      .select(a("n_name").as("x"), b("n_name").as("y"))
      .orderBy(col("x"), col("y"))
    val sql = check(j)
    assert(sql.contains("t0") && sql.contains("t1"), sql)
  }

  test("three-way join folds into one FROM clause") {
    val c = t("customer"); val o = t("orders"); val n = t("nation")
    val sql = check(
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(n, c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_name")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("n_name")))
    // one flat SELECT block — joins fold into a single FROM clause
    assert("SELECT".r.findAllIn(sql).size == 1, s"over-nested rendering:\n$sql")
  }

  test("limit, offset, and their compositions") {
    val base = t("customer").orderBy(col("c_custkey"))
    check(base.limit(7))
    check(base.offset(3))
    check(base.offset(3).limit(7))  // skip 3, take 7
    check(base.limit(7).offset(3))  // take 7, then skip 3 → 4 rows
  }

  test("distinct and set ops") {
    val a = t("nation").select(col("n_regionkey"))
    val b = t("region").select(col("r_regionkey").as("n_regionkey"))
    check(a.distinct().orderBy(col("n_regionkey")))
    check(a.union(b).orderBy(col("n_regionkey")))
    check(a.intersect(b).orderBy(col("n_regionkey")))
    check(a.exceptAll(b).orderBy(col("n_regionkey")))
  }

  test("window functions: rank family, lag/lead, framed aggregate") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
    check(t("customer")
      .withColumn("rnk", rank().over(w))
      .withColumn("prev", lag(col("c_acctbal"), 1).over(w))
      .withColumn("nxt", lead(col("c_custkey"), 2, -1).over(w))
      .withColumn("run", sum(col("c_custkey")).over(w.rowsBetween(-1, 0)))
      .filter(col("rnk") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("rnk"), col("prev"),
        col("nxt"), col("run"))
      .orderBy(col("c_nationkey"), col("c_custkey")))
  }

  test("window consumed by a non-project parent gets a pass-through block") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_regionkey")).orderBy(col("n_nationkey"))
    // filter directly above the window column (QUALIFY shape)
    check(t("nation").withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).orderBy(col("n_regionkey")))
  }

  test("scalar function breadth through catalyst .sql") {
    check(t("customer").select(
      upper(col("c_name")).as("u"),
      substring(col("c_name"), 1, 3).as("s3"),
      coalesce(col("c_mktsegment"), lit("none")).as("cc"),
      when(col("c_acctbal") > 0, "pos").otherwise("neg").as("sign"),
      abs(col("c_acctbal")).as("mag"),
      round(col("c_acctbal") * 2, 1).as("r2"),
      concat_ws("-", col("c_mktsegment"), col("c_name")).as("cw"))
      .filter(length(col("c_name")) > 5 && col("c_custkey").isin(1, 2, 3, 5, 8))
      .orderBy(col("u")))
  }

  test("aggregate breadth: avg/min/max/countDistinct/stddev") {
    check(t("lineitem").groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("aq"),
        min(col("l_discount")).as("mn"),
        max(col("l_tax")).as("mx"),
        countDistinct(col("l_suppkey")).as("cd"),
        stddev_samp(col("l_extendedprice")).as("sd"))
      .orderBy(col("l_returnflag")))
  }

  test("derived join side wraps under its own alias") {
    val agg = t("orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    val c = t("customer")
    check(c.join(agg, c("c_custkey") === agg("o_custkey"), "left")
      .select(col("c_custkey"), col("n_orders"))
      .orderBy(col("c_custkey")))
  }

  test("engine-registered SQL functions round-trip in the spark dialect") {
    ensureViews()
    // money_sum4 is injected by GraftExtensions, so its rendering
    // re-analyzes and the faithfulness gate passes — spark-dialect only
    // (a foreign engine would reject the name loudly, never silently)
    val sql = new Table(t("lineitem").groupBy(col("l_returnflag"))
      .agg(graft.queries.Tables.dsum(col("l_quantity")).as("q"))).renderSql()
    assert(sql.contains("money_sum4("), sql)
  }

  test("the q97e mechanism holds: duckdb text is stable for a fluent plan") {
    ensureViews()
    val df = t("customer")
      .filter(col("c_acctbal") > 100 && col("c_mktsegment") === "BUILDING")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("c_custkey")).cast("bigint").as("s"))
      .orderBy(col("c_nationkey"))
    val duck = new Table(df).renderSql("duckdb")
    // pinned via the ONE shared constant the q97f corpus oracle also uses
    assert(duck == graft.queries.MiscQueries.Q97fDuckGolden, duck)
  }

  // ------------------------------------------------------------ refusals

  test("unsupported shapes refuse instead of mis-rendering") {
    ensureViews()
    // dropDuplicates on a key subset has no plain DISTINCT form
    refuses(t("nation").dropDuplicates("n_regionkey"))
    // TABLESAMPLE has a Sample node outside the core
    refuses(t("nation").sample(0.5))
  }

  test("explode renders as LATERAL VIEW (spark) and CROSS JOIN UNNEST (duckdb)") {
    ensureViews()
    val df = t("documents").filter(col("doc_id") < 5)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_words"))
      .orderBy(col("doc_id"))
    val sql = check(df)
    assert(sql.contains("LATERAL VIEW explode("), sql)
    val duck = new Table(df).renderSql("duckdb")
    assert(duck.contains("CROSS JOIN UNNEST("), duck)
    // posexplode renders in spark; duckdb has no ordinal-unnest spelling
    val pe = t("documents").filter(col("doc_id") < 3)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .orderBy(col("doc_id"), col("pos"))
    val sql2 = checkSpark(pe)
    assert(sql2.contains("LATERAL VIEW posexplode("), sql2)
    assertThrows[UnsupportedOperationException] { new Table(pe).renderSql("duckdb") }
  }

  test("rollup and cube render as GROUP BY GROUPING SETS (round 11)") {
    ensureViews()
    val r = t("orders").rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        (grouping(col("o_orderstatus")) * 2 + grouping(col("o_orderpriority")))
          .cast("int").as("lvl"))
      .orderBy(col("lvl"), col("o_orderstatus"), col("o_orderpriority"))
    val sql = checkSpark(r)
    assert(sql.contains("GROUPING SETS ("), sql)
    // rollup over 2 keys = 3 sets ending with the grand total: (a,b), (a), ()
    assert(sql.contains(", ())"), sql)
    val c = t("orders").cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    val sql2 = checkSpark(c)
    // cube over 2 keys = 4 sets
    assert(sql2.contains("GROUPING SETS ("), sql2)
  }

  test("spark.range inlines as typed VALUES") {
    ensureViews()
    val df = t("nation").join(spark.range(3).select(col("id").as("n_regionkey")),
      "n_regionkey").groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))
    val sql = check(df)
    assert(sql.contains("VALUES"), sql)
  }

  test("memtables render as inline VALUES in both dialects (round 11)") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "s")
      .groupBy(col("s")).agg(sum(col("id")).as("total"))
      .orderBy(col("s"))
    val tbl = new Table(df)
    val sql = tbl.renderSql()
    assert(sql.contains("VALUES"), sql)
    val re = spark.sql(sql)
    assert(re.collect().map(_.toString).toSeq == df.collect().map(_.toString).toSeq)
    // typed literals keep the LONG type through the round trip
    assert(re.schema("total").dataType == org.apache.spark.sql.types.LongType)
    val duck = tbl.renderSql("duckdb")
    assert(duck.contains("(VALUES") && !duck.contains("1L"), duck)
    // memtable joined against a relation renders too
    val n = t("nation").select(col("n_regionkey"), col("n_name"))
    val m = Seq((0L, "zero"), (1L, "one")).toDF("rk", "label")
    val j = n.join(m, n("n_regionkey") === m("rk")).orderBy(col("n_name"))
    val sql2 = new Table(j).renderSql()
    val re2 = spark.sql(sql2)
    assert(re2.collect().map(_.toString).toSeq == j.collect().map(_.toString).toSeq)
  }

  test("corpus sweep: fluent corpus plans render and re-execute equal (>= 50)") {
    // raw-parquet views: rendered SQL references leaf relations by path
    // basename, and the leaves are the RAW reads (any Tables.t transform
    // is part of the decompiled plan, not of the view)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("nation", "region", "customer", "supplier", "orders", "lineitem",
      "part", "events", "documents", "embeddings")
      .foreach(n => spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n))
    val candidates = (graft.queries.RelationalQueries.defs ++
      graft.queries.AggregationQueries.defs ++
      graft.queries.TpchQueries.defs ++ graft.queries.TpchQueries2.defs)
    var ok = 0; var refused = 0
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    for (d <- candidates) {
      val df =
        try d.fn(spark, sfDir)
        catch { case e: Exception => fail(s"${d.name}: corpus fn broke: $e") }
      try {
        val sql = new Table(df).renderSql()
        val re = spark.sql(sql)
        val a = df.collect().map(_.toString).sorted.toSeq
        val b = re.collect().map(_.toString).sorted.toSeq
        if (re.columns.toSeq == df.columns.toSeq && a == b) ok += 1
        else failed += s"${d.name}: rendered SQL executed to DIFFERENT values\n$sql"
      } catch {
        case _: PlanDecompile.Refused => refused += 1
        case e: Exception => failed += s"${d.name}: ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    info(s"corpus sweep: $ok rendered+equal, $refused refused, ${failed.size} broken " +
      s"of ${candidates.size}")
    assert(failed.isEmpty, failed.mkString("\n\n"))
    assert(ok + refused >= 50, s"sweep too small: $ok + $refused")
    // the renderer must cover a real majority, not refuse its way to green
    // (round-11 close: 51 of 58 — hints, lambdas, self-join column
    // fan-in, memtables, ranges and explode/LATERAL VIEW all render; the
    // remaining 7 are engine-custom expressions — asof_search, the
    // co-moment udaf, pivot's synthetic aggregate — and the RDD-backed
    // row-id leaf, all of which no SQL text could reproduce)
    assert(ok >= 48, s"only $ok corpus plans rendered — coverage regressed")
  }

  test("nondeterministic expressions round-trip via their materialized seed") {
    ensureViews()
    // rand()'s analyzed seed is a literal; the rendering carries it, so
    // re-analysis produces the SAME generator and the gate passes
    val sql = new Table(t("nation").select((rand() * 0).as("z"))).renderSql()
    assert(sql.toLowerCase.contains("rand("), sql)
  }

  // ------------------------------------------------- CTE lifting (round 12)

  test("a multi-referenced aggregate lifts into ONE WITH body (extract_ctes)") {
    ensureViews()
    // the reference's year_total shape (TPC-DS q74-style): one aggregate
    // subplan joined to itself — must render with a single CTE body, not
    // the subplan's text duplicated per reference
    val totals = t("orders").groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
    val a = totals.alias("a"); val b = totals.alias("b")
    val j = a.join(b, col("a.o_custkey") === col("b.o_custkey") &&
        col("a.total") >= col("b.total"))
      .select(col("a.o_custkey").as("k"), col("a.total").as("t1"), col("b.n").as("n2"))
      .orderBy(col("k")).limit(10)
    val sql = checkSpark(j)
    assert(sql.startsWith("WITH graft_cte_0 AS ("), sql)
    // exactly one aggregate body: the GROUP BY text appears once
    assert("GROUP BY".r.findAllIn(sql).size == 1, sql)
    assert("FROM orders".r.findAllIn(sql).size == 1, sql)
    val duck = new Table(j).renderSql("duckdb")
    assert(duck.startsWith("WITH graft_cte_0 AS ("), duck)
  }

  test("three-way reuse references the same CTE three times") {
    ensureViews()
    val base = t("nation").filter(col("n_regionkey") < 3)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    val u = base.union(base).union(base)
      .groupBy(col("n_regionkey")).agg(sum(col("n")).as("s"))
      .orderBy(col("n_regionkey"))
    val sql = checkSpark(u)
    assert(sql.startsWith("WITH graft_cte_0"), sql)
    assert("graft_cte_0".r.findAllIn(sql).size == 4, sql) // 1 def + 3 refs
  }

  test("an input plan that already carries a WITH decompiles and re-renders") {
    ensureViews()
    val df = spark.sql(
      """WITH t AS (SELECT o_custkey, sum(o_totalprice) AS tot FROM orders GROUP BY o_custkey)
        |SELECT x.o_custkey AS k, x.tot, y.tot AS tot2 FROM t x JOIN t y ON x.o_custkey = y.o_custkey
        |ORDER BY k LIMIT 10""".stripMargin)
    val sql = checkSpark(df)
    assert(sql.startsWith("WITH graft_cte_0"), sql)
  }

  test("CTE-extracted trees rebuild through SqlOp.table too") {
    ensureViews()
    val base = t("region").select(col("r_regionkey"), col("r_name"))
    val j = base.alias("l").join(base.alias("r"),
        col("l.r_regionkey") === col("r.r_regionkey"))
      .select(col("l.r_name").as("a"), col("r.r_name").as("b"))
      .orderBy(col("a"))
    val op = PlanDecompile.decompile(j)
    assert(op.isInstanceOf[graft.api.SqlWith], op.getClass.getSimpleName)
    val re = op.table(spark).df
    assert(re.collect().map(_.toString).sorted.toSeq ==
      j.collect().map(_.toString).sorted.toSeq)
  }

  // ---------------------------------------- subquery expressions (round 12)

  test("uncorrelated scalar / IN / EXISTS subqueries render") {
    ensureViews()
    val scalar = spark.sql(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        |ORDER BY c_custkey LIMIT 10""".stripMargin)
    val s1 = checkSpark(scalar)
    assert(s1.contains("(SELECT avg("), s1)

    val inq = spark.sql(
      """SELECT c_custkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 1)
        |ORDER BY c_custkey LIMIT 10""".stripMargin)
    val s2 = checkSpark(inq)
    assert(s2.contains(" IN (SELECT"), s2)

    val ex = spark.sql(
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM region WHERE r_regionkey = 0)
        |ORDER BY n_name LIMIT 5""".stripMargin)
    val s3 = checkSpark(ex)
    assert(s3.toLowerCase.contains("exists (select"), s3)

    val notIn = spark.sql(
      """SELECT n_name FROM nation
        |WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region WHERE r_regionkey > 2)
        |ORDER BY n_name""".stripMargin)
    val s4 = checkSpark(notIn)
    assert(s4.contains("NOT"), s4)
  }

  test("correlated EXISTS / IN / scalar subqueries render through the enclosing scope") {
    ensureViews()
    // EXISTS with an equi-correlation (TPC-H Q4 shape)
    val ex = spark.sql(
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = n_nationkey
        |              AND c_acctbal > 9000)
        |ORDER BY n_name""".stripMargin)
    val s1 = checkSpark(ex)
    assert(s1.toLowerCase.contains("exists (select"), s1)

    // NOT EXISTS (TPC-H Q21/Q22 shape)
    checkSpark(spark.sql(
      """SELECT r_name FROM region
        |WHERE NOT EXISTS (SELECT 1 FROM nation WHERE n_regionkey = r_regionkey
        |                  AND n_nationkey > 20)
        |ORDER BY r_name""".stripMargin))

    // correlated IN
    checkSpark(spark.sql(
      """SELECT c_custkey FROM customer
        |WHERE c_nationkey IN (SELECT n_nationkey FROM nation
        |                      WHERE n_regionkey = c_custkey % 5)
        |ORDER BY c_custkey LIMIT 20""".stripMargin))

    // correlated scalar subquery (per-group average, TPC-H Q2/Q17 shape)
    val sc = spark.sql(
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = customer.c_nationkey)
        |ORDER BY c_custkey LIMIT 20""".stripMargin)
    val s2 = checkSpark(sc)
    assert(s2.contains("(SELECT avg("), s2)

    // correlation from a NESTED block two levels up still resolves
    checkSpark(spark.sql(
      """SELECT n_name FROM nation
        |WHERE EXISTS (SELECT 1 FROM customer
        |              WHERE c_nationkey = n_nationkey
        |              AND c_acctbal > (SELECT min(o_totalprice) / 100 FROM orders
        |                               WHERE o_custkey = c_custkey))
        |ORDER BY n_name""".stripMargin))
  }
}
