package graft.tools
import org.apache.spark.sql.SparkSession
/** Debug harness: run one corpus query by name against a SF dir. */
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(args(0))
    val df = fn(spark, args(1))
    df.coalesce(1).write.mode("overwrite").parquet(s"/tmp/runone/${args(0)}")
    println(s"OK rows=${spark.read.parquet(s"/tmp/runone/${args(0)}").count()}")
    spark.stop()
  }
}
