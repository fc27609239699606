package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolates the cost of the bench's between-queries System.gc() on the
  * FOLLOWING timed query: N passes with gc() after each, then N without,
  * same session (ExplicitGCInvokesConcurrent means gc() starts a
  * concurrent G1 cycle that runs INTO the next timed region).
  * Usage: runMain graft.tools.GcNoise <dir> <query> [passes] */
object GcNoise {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val passes = args.lift(2).map(_.toInt).getOrElse(8)
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
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(); once() // warm
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min ${s.head}%.2f med ${s(s.size / 2)}%.2f max ${s.last}%.2f avg ${xs.sum / xs.size}%.2f"
    }
    val withGc = (1 to passes).map { _ => System.gc(); Thread.sleep(50); once() }
    val noGc = (1 to passes).map { _ => once() }
    println(s"[gcnoise] $name with-gc: ${stats(withGc)}")
    println(s"[gcnoise] $name no-gc:   ${stats(noGc)}")
    spark.stop()
  }
}
