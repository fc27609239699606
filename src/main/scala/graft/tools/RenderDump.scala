package graft.tools

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spark half of the DUCKDB-DIALECT render round trip (round 11,
  * VERDICT r10 #3; widened round 12): generate the 300-query fuzz corpus
  * ([[SqlFuzzGen]]), decompile each walkable query, render it in the
  * DUCKDB dialect, and dump (a) the fixture tables as parquet, (b) each
  * walkable query's ENGINE result as parquet, (c) `render_duckdb.json`
  * mapping query name → rendered duckdb SQL. `tools/render_check.py`
  * then executes every rendering in a real DuckDB over the same fixtures
  * and value-compares — proving the duckdb renderer's output is not just
  * well-formed text but executes ELSEWHERE to the engine's own values,
  * at fuzz breadth rather than q97e/q97f/q97g's three shapes.
  *
  * Round 12 adds:
  *  - the REVERSE direction (VERDICT r11 #2, reference role
  *    ibis/expr/sql.py:402-428): every duckdb rendering feeds back
  *    through `parse_sql(_, dialect="duckdb")`, the rebuilt plan
  *    executes in the ENGINE and its result dumps as `<name>_rt` —
  *    render_check.py value-compares it against DuckDB, closing the
  *    dialect loop in both directions;
  *  - FLUENT entries (`fl_*`, via [[graft.api.PlanDecompile]]) covering
  *    the duckdb spellings the fuzz grammar can't reach: CROSS JOIN
  *    UNNEST (explode), inline VALUES (memtable + range), WITH CTEs,
  *    list_value/string_split_regex function mappings.
  *
  * Usage: runMain graft.tools.RenderDump <outDir> */
object RenderDump {
  def main(args: Array[String]): Unit = {
    val out = new File(if (args.nonEmpty) args(0) else "/tmp/render_rt")
    org.apache.commons.io.FileUtils.deleteDirectory(out)
    out.mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-render-dump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ft1 = SqlFuzzGen.ft1Rows.toDF("id", "name", "grp")
    val ft2 = SqlFuzzGen.ft2Rows.toDF("id", "v")
    ft1.coalesce(1).write.parquet(s"$out/_fixtures/ft1")
    ft2.coalesce(1).write.parquet(s"$out/_fixtures/ft2")
    ft1.createOrReplaceTempView("ft1")
    ft2.createOrReplaceTempView("ft2")

    var walkable = 0
    var opaque = 0
    var reverseOk = 0
    val reverseFails = Seq.newBuilder[(String, String)]
    val rendered = Seq.newBuilder[(String, String)]

    /** Reverse: duckdb text → parse_sql(dialect=duckdb) → engine run. */
    def reverse(name: String, duck: String): Unit =
      try {
        val rt = graft.api.SqlDecompile.decompile(spark, duck, "duckdb")
          .table(spark).df
        rt.coalesce(1).write.parquet(s"$out/${name}_rt")
        reverseOk += 1
      } catch {
        case e: Exception =>
          reverseFails += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }

    for (seed <- 1 to 300) {
      val (sql, _) = new SqlFuzzGen(seed.toLong).query(0)
      val op = graft.api.SqlDecompile.decompile(spark, sql)
      if (!op.isFullyDecompiled) opaque += 1
      else {
        walkable += 1
        val name = f"fz$seed%03d"
        val duck = op.renderSql("duckdb")
        rendered += (name -> duck)
        spark.sql(sql).coalesce(1).write.parquet(s"$out/$name")
        reverse(name, duck)
      }
    }

    // fluent entries: composed plans rendered via PlanDecompile — the
    // generator/VALUES/CTE spellings the text-fuzz grammar never emits
    val ft1p = spark.read.parquet(s"$out/_fixtures/ft1")
    val fluent: Seq[(String, DataFrame)] = Seq(
      "fl_explode_array" -> ft1p
        .select(col("id"), explode(array(col("id"), col("id") + 1, lit(7L))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
        .orderBy(col("v")),
      "fl_explode_split" -> ft1p.filter(col("id") < 5)
        .select(col("id"), explode(split(concat(col("name"), lit(",z")), ",")).as("w"))
        .orderBy(col("id"), col("w")),
      "fl_values_memtable" -> Seq(
          (1L, "alpha", java.sql.Date.valueOf("2024-01-02"), 1.5),
          (2L, "beta", java.sql.Date.valueOf("2024-05-06"), -2.25),
          (3L, "gam'ma", java.sql.Date.valueOf("2023-12-31"), 0.0))
        .toDF("id", "tag", "d", "x")
        .filter(col("id") >= 1)
        .select(col("id"), col("tag"), col("d"), (col("x") * 2).as("x2"))
        .orderBy(col("id")),
      "fl_range" -> spark.range(1, 9)
        .select((col("id") * 3).as("v")).orderBy(col("v")),
      "fl_cte_self_join" -> {
        val totals = ft1p.groupBy(col("grp"))
          .agg(count(lit(1)).as("n"), sum(col("id")).as("s"))
        totals.alias("a").join(totals.alias("b"),
            col("a.grp") === col("b.grp") && col("a.s") >= col("b.s"))
          .select(col("a.grp").as("g"), col("a.n").as("n1"), col("b.s").as("s2"))
          .orderBy(col("g"))
      },
      "fl_values_join" -> {
        import spark.implicits._
        val dims = Seq((0L, "zero"), (1L, "one"), (2L, "two")).toDF("k", "word")
        ft1p.join(dims, ft1p("grp") === dims("k"))
          .select(col("id"), col("word")).orderBy(col("id"), col("word"))
      },
      // subquery expressions (round 12): uncorrelated scalar, correlated
      // EXISTS, and correlated scalar — the rendered text embeds nested
      // SELECTs whose duckdb retranslation (and reverse parse) the fuzz
      // grammar never reaches
      "fl_subquery_scalar" -> spark.sql(
        "SELECT id, v FROM ft2 WHERE v > (SELECT avg(v) FROM ft2) ORDER BY id, v"),
      "fl_subquery_exists_corr" -> spark.sql(
        "SELECT t.id, t.name FROM ft1 t WHERE EXISTS " +
          "(SELECT 1 FROM ft2 WHERE ft2.id = t.id AND ft2.v > 0) ORDER BY t.id"),
      "fl_subquery_scalar_corr" -> spark.sql(
        "SELECT id, grp FROM ft1 WHERE id > " +
          "(SELECT min(ft2.id) FROM ft2 WHERE ft2.id > ft1.grp) " +
          "ORDER BY id, grp"),
      // round 13 breadth (VERDICT r12 #7 + #4): FILTER-clause aggregates
      // and more correlated shapes — NOT EXISTS, correlated IN, nested
      // one-level-per-hop correlation, correlated scalar in the SELECT
      // list, correlated EXISTS under a join, FILTER inside a correlated
      // subquery — each value-checked in BOTH directions by render_check
      "fl_agg_filter" -> spark.sql(
        "SELECT grp, count(*) FILTER (WHERE id > 2) AS n_hi, " +
          "CAST(sum(id) FILTER (WHERE name <> 'a') AS BIGINT) AS s " +
          "FROM ft1 GROUP BY grp ORDER BY grp"),
      "fl_corr_not_exists" -> spark.sql(
        "SELECT id FROM ft1 WHERE NOT EXISTS " +
          "(SELECT 1 FROM ft2 WHERE ft2.id = ft1.id AND ft2.v > 25) ORDER BY id"),
      "fl_corr_in" -> spark.sql(
        "SELECT id, name FROM ft1 WHERE grp IN " +
          "(SELECT ft2.id FROM ft2 WHERE ft2.v > ft1.id * 5) ORDER BY id, name"),
      "fl_corr_nested" -> spark.sql(
        "SELECT t.id FROM ft1 t WHERE t.id > " +
          "(SELECT min(a.id) FROM ft1 a WHERE a.grp = t.grp AND a.id > " +
          "(SELECT min(b.id) FROM ft2 b WHERE b.id = a.id)) ORDER BY t.id"),
      "fl_corr_scalar_select" -> spark.sql(
        "SELECT id, (SELECT count(1) FROM ft2 WHERE ft2.id = ft1.id) AS n " +
          "FROM ft1 ORDER BY id"),
      // (ORDER BY a bare name both join inputs carry: the duck renderer
      // must rewrite the key to the select-list ordinal or DuckDB's
      // binder rejects it as ambiguous)
      "fl_corr_exists_join" -> spark.sql(
        "SELECT t.id, t.name, d.v FROM ft1 t JOIN ft2 d ON t.id = d.id " +
          "WHERE EXISTS (SELECT 1 FROM ft2 e WHERE e.id = t.grp) ORDER BY id"),
      "fl_corr_agg_filter" -> spark.sql(
        "SELECT t.id, (SELECT count(1) FILTER (WHERE e.v > 15) FROM ft2 e " +
          "WHERE e.id = t.id) AS n FROM ft1 t ORDER BY t.id"))
    var fluentOk = 0
    val fluentFails = Seq.newBuilder[(String, String)]
    for ((name, df) <- fluent) {
      try {
        val duck = graft.api.PlanDecompile.renderSql(df, "duckdb")
        rendered += (name -> duck)
        df.coalesce(1).write.parquet(s"$out/$name")
        fluentOk += 1
        reverse(name, duck)
      } catch {
        case e: Exception =>
          fluentFails += name -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }

    val entries = rendered.result()
    val json = entries.map { case (n, q) =>
      val esc = q.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""  "$n": "$esc""""
    }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(new File(out, "render_duckdb.json").toPath,
      json.getBytes("UTF-8"))
    val ff = fluentFails.result()
    val rf = reverseFails.result()
    println(s"[render-dump] $walkable walkable rendered, $opaque opaque (of 300); " +
      s"fluent $fluentOk/${fluent.size}; reverse $reverseOk/${entries.size} -> $out")
    ff.foreach { case (n, m) => println(s"[render-dump] FLUENT-FAIL $n: $m") }
    rf.foreach { case (n, m) => println(s"[render-dump] REVERSE-FAIL $n: $m") }
    spark.stop()
  }
}
