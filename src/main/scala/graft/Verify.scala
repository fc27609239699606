package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Conf-regression guard (verdict r14 #3): SPARK_GRAFT_BENCH_CONFS=1
  * applies [[BenchConfs.planConfs]] — the exact plan-shape conf set the
  * bench sessions adopt — to this session, and per-query wall times are
  * always dumped to outDir/timings.json. A sweep is two Verify runs
  * (baseline vs bench-confs) diffed with tools/diff_timings.py: any
  * query whose wall time regresses >2× under the bench confs is exactly
  * the class of interaction the round-14 q202b thrash was (a conf that
  * won its headline A/B while destabilizing a non-headline query). */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional 3rd arg: only run queries whose name matches this regex —
    // local iteration aid; the driver's 2-arg invocation runs everything
    val nameFilter = args.lift(2).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // small test files must still split across cores (a 1.5 MB parquet is
      // 1 partition at the 128 MB default → single-threaded heavy stages)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("SPARK_GRAFT_BENCH_CONFS").contains("1")) {
      System.err.println("[verify] applying BenchConfs.planConfs + bigAggConfs " +
        "(conf-regression sweep arm)")
      // sweep bigAggConfs too: the bench only adopts them at ≥1 GB inputs
      // (BenchConfs.aggConfsFor), but the guard's job is to exercise the
      // FULL adoptable set against the wide corpus
      (BenchConfs.planConfs ++ BenchConfs.bigAggConfs)
        .foreach { case (k, v) => spark.conf.set(k, v) }
    }
    new java.io.File(outDir).mkdirs()
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      timings(name) = (System.nanoTime() - t0) / 1e9
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/timings.json"),
      timings.map { case (k, v) => s"${q(k)}: ${f"$v%.3f"}" }
        .mkString("{", ",", "}"))
    spark.stop()
  }
}
