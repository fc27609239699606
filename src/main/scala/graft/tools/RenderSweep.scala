package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug: which corpus plans refuse to render (PlanDecompileSpec sweep). */
object RenderSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Seq("nation", "region", "customer", "supplier", "orders", "lineitem",
      "part", "events", "documents", "embeddings")
      .foreach(n => spark.read.parquet(s"$sfDir/$n.parquet").createOrReplaceTempView(n))
    val candidates = (graft.queries.RelationalQueries.defs ++
      graft.queries.AggregationQueries.defs ++
      graft.queries.TpchQueries.defs ++ graft.queries.TpchQueries2.defs)
    for (d <- candidates) {
      val df = d.fn(spark, sfDir)
      try {
        new graft.api.Table(df).renderSql()
        println(s"[render] OK      ${d.name}")
      } catch {
        case r: graft.api.PlanDecompile.Refused =>
          println(s"[render] REFUSED ${d.name}: ${r.getMessage.take(120)}")
        case e: Exception =>
          println(s"[render] BROKEN  ${d.name}: ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
