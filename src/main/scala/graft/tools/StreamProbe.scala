package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming-throughput experiment harness (verdict r13 #5: tumble set a
  * best-ever 13M rows/s in the same window funnel read 5.85M — find what
  * the stateful path saturates on). Measures the funnel rate-source bench
  * under named variants:
  *   runMain graft.tools.StreamProbe <variant> [seconds]
  * variants: tmp (checkpoint on java.io.tmpdir — the Bench default),
  * shm (checkpoint on /dev/shm), rocksdb (shm + RocksDB state store),
  * parts8 (shm + shuffle.partitions=8), tumble-tmp / tumble-shm
  * (the stateless-agg control under the same two checkpoint dirs),
  * tumble-bigagg / shm-bigagg (same as tumble-shm/shm but with the 2^20
  * final-agg fast-map confs the r15 dirBytes("") bug leaked in). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("tmp")
    val shm = variant != "tmp" && variant != "tumble-tmp"
    val parts = if (variant == "parts8") "8" else "32"
    val b0 = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft_shuffle")
      .config("spark.ui.enabled", "false")
    val b1 = if (variant == "rocksdb")
      b0.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else b0
    // *-bigagg: reproduce the r15 dirBytes("") bug — the stream bench
    // session silently ran with the 2^20 final-agg fast-map confs whenever
    // the checkout exceeded 1 GB (ADVICE r15); these variants measure what
    // that conf leak costs each micro-batch so the fix's effect is recorded
    val b2 = if (variant.endsWith("-bigagg"))
      graft.BenchConfs.bigAggConfs.foldLeft(b1) { case (b, (k, v)) => b.config(k, v) }
    else b1
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def ckptDir(name: String): String =
      if (shm) {
        val d = new java.io.File(s"/dev/shm/graft_ckpt/${name}_${System.nanoTime()}")
        d.mkdirs(); d.getPath
      } else java.nio.file.Files.createTempDirectory(s"probe_$name").toString

    def measure(build: DataFrame => DataFrame, mode: String, name: String): Double = {
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", "10000000")
        .option("numPartitions", "8")
        .load()
      val q = build(rate).writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckptDir(name))
        .start()
      try {
        val deadline = System.nanoTime() + 90L * 1000 * 1000 * 1000
        while (q.recentProgress.count(_.numInputRows > 0) < 4 &&
               System.nanoTime() < deadline) Thread.sleep(250)
        val ps = q.recentProgress.filter(_.numInputRows > 0).drop(1)
        val rows = ps.map(_.numInputRows).sum
        val secs = ps.map(p =>
          Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
          .sum / 1000.0
        // per-batch duration breakdown from the engine's own metrics
        ps.foreach { p =>
          val d = p.durationMs
          def g(k: String) = Option(d.get(k)).map(_.toLong).getOrElse(-1L)
          println(s"[stream] $name batch=${p.batchId} rows=${p.numInputRows} " +
            s"trigger=${g("triggerExecution")} addBatch=${g("addBatch")} " +
            s"stateCommit=${g("commitOffsets")} " +
            s"stateOps=${p.stateOperators.map(so =>
              s"commitMs=${so.allUpdatesTimeMs}+${so.commitTimeMs} rows=${so.numRowsTotal} " +
              s"mem=${so.memoryUsedBytes}").mkString(";")}")
        }
        if (secs > 0) rows / secs else 0.0
      } finally q.stop()
    }

    import graft.streaming.{Watermark, Windows, Stateful}
    val rps =
      if (variant.startsWith("tumble")) {
        measure(rate => {
          val ev = rate.select(col("timestamp").as("ts"),
            (col("value") % 7).as("k"), (col("value") % 100).cast("double").as("v"))
          Windows.tumble(Windows.withWatermark(ev, Watermark("ts", "2 seconds")),
            col("ts"), "1 second", Seq(col("k")),
            Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")))
        }, "update", "tumble")
      } else {
        measure(rate => {
          val ev = rate.select(
            (col("value") % 50000).as("user_id"),
            element_at(array(lit("click"), lit("purchase"), lit("view")),
              (col("value") % 3 + 1).cast("int")).as("event_type"),
            col("timestamp").as("ts"))
          Stateful.funnelPairs(Windows.withWatermark(ev, Watermark("ts", "2 seconds")),
            "user_id", "event_type", "ts", "click", "purchase", "10 seconds")
        }, "append", "funnel")
      }
    println(f"[stream] variant=$variant rows_per_sec=$rps%.0f")
    // second run in the SAME JVM: discriminates JIT-cold snowball from
    // steady capacity (round-15 diagnosis)
    sys.env.get("STREAM_TWICE").foreach { _ =>
      val rps2 =
        if (variant.startsWith("tumble")) 0.0
        else {
          measure(rate => {
            val ev = rate.select(
              (col("value") % 50000).as("user_id"),
              element_at(array(lit("click"), lit("purchase"), lit("view")),
                (col("value") % 3 + 1).cast("int")).as("event_type"),
              col("timestamp").as("ts"))
            Stateful.funnelPairs(Windows.withWatermark(ev, Watermark("ts", "2 seconds")),
              "user_id", "event_type", "ts", "click", "purchase", "10 seconds")
          }, "append", "funnel2")
        }
      println(f"[stream] variant=$variant SECOND rows_per_sec=$rps2%.0f")
    }
    spark.stop()
  }
}
