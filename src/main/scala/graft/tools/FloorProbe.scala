package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query floor profile at small SF: splits a warm noop-sink run into
  * DSL-build / plan (analyze+optimize+physical) / execute, and counts the
  * jobs, stages and tasks the execution schedules. The split tells WHICH
  * fixed cost dominates a floor-bound query (driver planning vs AQE stage
  * round-trips vs task count), which the wall clock alone cannot.
  * Usage: runMain graft.tools.FloorProbe [dir] [q1 q2 ...]
  */
object FloorProbe {
  private val headline = Seq(
    "q01_agg", "q03_join_agg_top", "q12_window_rank", "q19_asof_join",
    "q37_mode", "q60b_text_stats_full", "q63_dedup_keep_first", "q65_minhash_pairs",
    "q68_embedding_topk", "q71_quality_pipeline", "q80_tumble", "q82_session",
    "q101_tpch5_local_volume", "q103_tpch13_custdist",
    "q202_ds27_rollup_avgs", "q204_ds47_yoy_monthly")

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else headline
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
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskTimeMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(e.stageInfo.numTasks)
        taskTimeMs.addAndGet(
          e.stageInfo.taskMetrics.executorRunTime)
      }
    })

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // absorb first-scan + codegen startup
    noop(graft.SparkEntry.queries("q01_agg")(spark, dir))

    println(f"${"query"}%-28s ${"dsl"}%6s ${"plan"}%6s ${"exec"}%7s ${"total"}%7s ${"jobs"}%5s ${"stg"}%4s ${"tasks"}%6s ${"taskms"}%7s")
    for (n <- names if graft.SparkEntry.queries.contains(n)) {
      val fn = graft.SparkEntry.queries(n)
      // two warm-up executions (codegen + AQE shapes cached where possible)
      noop(fn(spark, dir)); noop(fn(spark, dir))
      System.gc()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analyze+optimize+physical
      val t2 = System.nanoTime()
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      noop(df)
      val t3 = System.nanoTime()
      Thread.sleep(150) // let async listener events drain
      def ms(a: Long, b: Long) = (b - a) / 1e6
      println(f"$n%-28s ${ms(t0, t1)}%6.0f ${ms(t1, t2)}%6.0f ${ms(t2, t3)}%7.0f " +
        f"${ms(t0, t3)}%7.0f ${jobs.get}%5d ${stages.get}%4d ${tasks.get}%6d ${taskTimeMs.get}%7d")
      System.gc()
    }
    spark.stop()
  }
}
