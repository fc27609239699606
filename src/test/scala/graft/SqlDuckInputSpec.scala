package graft

import graft.api.SqlDecompile

/** parse_sql with `dialect="duckdb"` (round 11 — the reference's
  * `ibis.parse_sql(sql, dialect=...)` role, ibis/expr/sql.py:402-428):
  * the committed DuckDB oracle SQL of the BENCH HEADLINE queries
  * (bench/duckdb_sf*.json's warm_min_of_3 set — the exact text a real
  * DuckDB executes as the correctness oracle) decompiles through the
  * duckdb input dialect, rebuilds on Spark, and matches the ENGINE's own
  * results for the same query. */
class SqlDuckInputSpec extends SparkSpec {

  private def registerViews(): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("nation", "region", "customer", "supplier", "orders", "lineitem",
      "part", "documents")
      .foreach(n => spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n))
  }

  // headline queries whose oracle is plain relational DuckDB SQL (the
  // others — minhash/session/pipeline/asof — oracle sketch internals
  // with multi-hundred-line CTE programs or ASOF JOIN)
  private val headline = Seq("q01_agg", "q03_join_agg_top", "q12_window_rank",
    "q37_mode", "q103_tpch13_custdist", "q63_dedup_keep_first")

  test("bench headline oracle SQL decompiles via dialect=duckdb and matches the engine") {
    registerViews()
    var done = 0
    for (name <- headline) {
      val oracle = SparkEntry.oracleSql(name)
      val op =
        try SqlDecompile.decompile(spark, oracle, dialect = "duckdb")
        catch { case e: Exception => fail(s"$name: duckdb-dialect decompile threw: $e") }
      val rebuilt = op.table(spark).df
      val engine = SparkEntry.queries(name)(spark, sfDir)
      assert(rebuilt.columns.toSeq.map(_.toLowerCase) ==
        engine.columns.toSeq.map(_.toLowerCase),
        s"$name columns: ${rebuilt.columns.toSeq} vs ${engine.columns.toSeq}")
      val a = rebuilt.collect().map(_.toString).sorted.toSeq
      val b = engine.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"$name: rebuilt oracle values differ from the engine")
      done += 1
    }
    info(s"$done/${headline.size} headline oracles decompiled+matched")
  }

  test("duckdb input spellings: quoted idents, regexp_matches, len, list, QUALIFY") {
    registerViews()
    // double-quoted identifiers and function spellings
    val op = SqlDecompile.decompile(spark,
      """SELECT "n_name", len("n_name") AS l FROM nation
         WHERE regexp_matches("n_name", '^[A-C]') ORDER BY "n_name"""",
      dialect = "duckdb")
    assert(op.isFullyDecompiled)
    val got = op.table(spark).df.collect().map(_.getString(0)).toSeq
    val exp = spark.sql(
      "SELECT n_name FROM nation WHERE n_name RLIKE '^[A-C]' ORDER BY n_name")
      .collect().map(_.getString(0)).toSeq
    assert(got == exp)
    // LIST() aggregate = collect_list
    val lst = SqlDecompile.decompile(spark,
      "SELECT n_regionkey, list(n_nationkey) AS ks FROM nation GROUP BY 1 ORDER BY 1",
      dialect = "duckdb").table(spark).df
    assert(lst.schema("ks").dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    // QUALIFY rewrites into a windowed derived table
    val q = SqlDecompile.decompile(spark,
      """SELECT n_regionkey, n_name FROM nation
         QUALIFY ROW_NUMBER() OVER (PARTITION BY n_regionkey ORDER BY n_name) = 1
         ORDER BY n_regionkey""",
      dialect = "duckdb")
    val rows = q.table(spark).df.collect()
    assert(rows.length == 5, rows.mkString(","))
    // string literals are NEVER touched by the mapping
    val lit = SqlDecompile.decompile(spark,
      """SELECT 'len("x") QUALIFY' AS s FROM nation LIMIT 1""", dialect = "duckdb")
    assert(lit.table(spark).df.collect().head.getString(0) == """len("x") QUALIFY""")
  }
}
