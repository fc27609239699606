package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc perf probe: time one named query N times on a dir with the
  * bench's large-SF session settings. Extra `key=value` args become
  * session conf overrides (the A/B experiment lever). Usage:
  *   runMain graft.tools.Probe <dir> <queryName> [passes] [parts] [split] [k=v ...]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val parts = args.lift(3).getOrElse("256")
    val split = args.lift(4).getOrElse("64m")
    val overrides = args.drop(5).toSeq.map { kv =>
      val Array(k, v) = kv.split("=", 2); (k, v)
    }
    val builder0 = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "64000000")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "671088640")
      .config("spark.sql.codegen.aggregate.map.twolevel.partialOnly", "false")
      .config("spark.sql.codegen.aggregate.fastHashMap.capacityBit", "20")
      .config("spark.sql.files.maxPartitionBytes", split)
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.local.dir", "/dev/shm/graft_shuffle")
      .config("spark.ui.enabled", "false")
    val spark = overrides.foldLeft(builder0) {
      case (b, (k, v)) => b.config(k, v)
    }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (overrides.nonEmpty)
      println(s"[probe] overrides: ${overrides.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    for (i <- 1 to passes) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      System.gc()
    }
    spark.stop()
  }
}
