package graft.tools

import java.io.File

import org.apache.spark.sql.SparkSession

/** Spark half of the DUCKDB-DIALECT render round trip (round 11,
  * VERDICT r10 #3): generate the 300-query fuzz corpus
  * ([[SqlFuzzGen]]), decompile each walkable query, render it in the
  * DUCKDB dialect, and dump (a) the fixture tables as parquet, (b) each
  * walkable query's ENGINE result as parquet, (c) `render_duckdb.json`
  * mapping query name → rendered duckdb SQL. `tools/render_check.py`
  * then executes every rendering in a real DuckDB over the same fixtures
  * and value-compares — proving the duckdb renderer's output is not just
  * well-formed text but executes ELSEWHERE to the engine's own values,
  * at fuzz breadth rather than q97e/q97f/q97g's three shapes.
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
    val rendered = Seq.newBuilder[(String, String)]
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
      }
    }
    val entries = rendered.result()
    val json = entries.map { case (n, q) =>
      val esc = q.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""  "$n": "$esc""""
    }.mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(new File(out, "render_duckdb.json").toPath,
      json.getBytes("UTF-8"))
    println(s"[render-dump] $walkable walkable rendered, $opaque opaque " +
      s"(of 300) -> $out")
    spark.stop()
  }
}
