package graft.tools
import org.apache.spark.sql.SparkSession
/** Debug: time one corpus query (noop write) + optional explain. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("MPB", "4m"))
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("BT", "10485760"))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SMJ", "true"))
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        sys.env.getOrElse("BLOOM_CT", "10MB"))
      .config("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        sys.env.getOrElse("BLOOM_AT", "10GB"))
      .config("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("AQE_SHJ", "0"))
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems",
        sys.env.getOrElse("BLOOM_ITEMS", "4000000"))
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        sys.env.getOrElse("BLOOM_BITS", "67108864"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("AQE_BT", sys.env.getOrElse("BT", "10485760")))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ad-hoc conf experiments: EXTRA="k=v;k=v"
    sys.env.get("EXTRA").foreach(_.split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(args(0))
    if (args.length > 2 && args(2) == "explain") fn(spark, args(1)).explain("formatted")
    for (i <- 1 to sys.env.getOrElse("RUNS", "3").toInt) {
      val t0 = System.nanoTime()
      fn(spark, args(1)).write.format("noop").mode("overwrite").save()
      println(f"[time] run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
