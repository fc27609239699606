package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-quality inspector: prints the formatted physical plan of selected
  * corpus queries so scan pruning / pushdown / join strategy / codegen
  * spans can be reviewed (the SURVEY.md "explain and iterate" loop). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_agg", "q03_join_agg_top")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
