package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark of the local-mode per-job / per-stage floor: times
  * trivial jobs of increasing shape (empty 1-task job, N-task job, scan,
  * scan+exchange, scan+2 exchanges) warm best-of-7, so query-level floor
  * numbers can be decomposed into "jobs × per-job cost" vs real work. */
object MicroFloor {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft_shuffle"
        else System.getProperty("java.io.tmpdir"))
      .config("spark.ui.enabled", "false")
    graft.BenchConfs.planConfs.foreach { case (k, v) => b.config(k, v) }
    sys.env.get("EXTRA").foreach(_.split(";").filter(_.contains("=")).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); b.config(k, v)
    })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def best(n: Int)(f: => Unit): Double = {
      f; f // warm
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }.min
    }

    val l = graft.queries.Tables.lineitem(spark, dir)

    val cases: Seq[(String, () => Unit)] = Seq(
      "empty_1task" -> (() => noop(spark.range(0, 1, 1, 1).toDF())),
      "empty_32task" -> (() => noop(spark.range(0, 32, 1, 32).toDF())),
      "rdd_count_32" -> (() => { spark.sparkContext.parallelize(1 to 32, 32).count(); () }),
      "scan_only" -> (() => noop(l.select(col("l_orderkey")))),
      "scan_full" -> (() => noop(l)),
      "scan_agg0ex" -> (() => noop(l.select(sum(col("l_orderkey"))))),
      "scan_1ex_agg" -> (() => noop(l.groupBy(col("l_suppkey")).agg(sum(col("l_orderkey"))))),
      "scan_2ex" -> (() => noop(l.groupBy(col("l_suppkey")).agg(sum(col("l_orderkey")).as("s"))
        .orderBy(col("s")))),
      "scan_3ex" -> (() => noop(l.groupBy(col("l_suppkey"), col("l_partkey")).agg(sum(col("l_orderkey")).as("s"))
        .groupBy(col("l_suppkey")).agg(max(col("s")).as("m")).orderBy(col("m")))),
      // tail-sort alternatives on a bounded (1k-row) aggregate result:
      // global orderBy (range-sample job + range exchange) vs coalesce(1)
      // + sortWithinPartitions (same total order, zero extra exchange)
      "agg_orderBy" -> (() => noop(l.groupBy(col("l_suppkey")).agg(sum(col("l_orderkey")).as("s"))
        .orderBy(col("s")))),
      "agg_c1_sortWP" -> (() => noop(l.groupBy(col("l_suppkey")).agg(sum(col("l_orderkey")).as("s"))
        .coalesce(1).sortWithinPartitions(col("s"))))
    )
    for ((name, f) <- cases) {
      val ms = best(5)(f())
      println(f"[micro] $name%-14s best ${ms}%7.1f ms")
    }
    spark.stop()
  }
}
