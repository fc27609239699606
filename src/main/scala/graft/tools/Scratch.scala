package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Disposable floor-probe main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", "512m")
      .config("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", "64000000")
      .config("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", "671088640")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args(0)
    import graft.queries.Tables._
    val l = lineitem(spark, dir)
    val su = supplier(spark, dir); val n = nation(spark, dir); val r = region(spark, dir)
    val asiaSup = broadcast(
      r.filter(col("r_name") === "ASIA")
        .join(n, col("r_regionkey") === col("n_regionkey"))
        .join(su, col("n_nationkey") === col("s_nationkey"))
        .select("s_suppkey"))
    // map-only: scan 4 cols + semi probe, partial agg, no wide exchange
    val probe = l.join(asiaSup, l("l_suppkey") === asiaSup("s_suppkey"), "left_semi")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("x"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      probe.write.format("noop").mode("overwrite").save()
      println(f"[scan+semi] run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    def time(tag: String, df: org.apache.spark.sql.DataFrame, runs: Int = 3): Unit =
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[$tag] run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    // lineitem semi + exchange on l_orderkey (partial agg per orderkey)
    val lAsia = l.join(asiaSup, l("l_suppkey") === asiaSup("s_suppkey"), "left_semi")
    time("l+exchange", lAsia
      .groupBy("l_orderkey").agg(sum(col("l_extendedprice")).as("x"))
      .agg(sum("x")))
    // orders side alone: semi + customer join + orderkey exchange
    val o = orders(spark, dir); val c = customer(spark, dir)
    val n4 = nation(spark, dir); val r4 = region(spark, dir)
    val asiaCust = broadcast(
      r4.filter(col("r_name") === "ASIA")
        .join(n4, col("r_regionkey") === col("n_regionkey"))
        .join(c, col("n_nationkey") === col("c_nationkey"))
        .select("c_custkey"))
    val oAsia = o.join(asiaCust, o("o_custkey") === asiaCust("c_custkey"), "left_semi")
    time("o semi only", oAsia.agg(count(lit(1))))
    val c2 = customer(spark, dir); val n5 = nation(spark, dir); val r5 = region(spark, dir)
    val custSide = r5.filter(col("r_name") === "ASIA")
      .join(n5, col("r_regionkey") === col("n_regionkey"))
      .join(c2, col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_nationkey"))
    val oSide = custSide.join(oAsia, col("c_custkey") === oAsia("o_custkey"))
      .select(col("n_name"), col("c_nationkey"), col("o_orderkey"))
    time("orders side", oSide.groupBy("o_orderkey").agg(count(lit(1))).agg(count(lit(1))))
    // full: orderkey SHJ + supplier broadcast + agg
    val su2 = supplier(spark, dir)
    val full = oSide.join(lAsia, col("o_orderkey") === lAsia("l_orderkey"))
      .join(broadcast(su2), lAsia("l_suppkey") === su2("s_suppkey") &&
        su2("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    time("full", full)
    // V2: zero exchanges except the orderkey pair — customer map and
    // supplier map force-broadcast; colocation as join residual.
    val c5 = customer(spark, dir); val n6 = nation(spark, dir); val r6 = region(spark, dir)
    val asiaCustFull = broadcast(
      r6.filter(col("r_name") === "ASIA")
        .join(n6, col("r_regionkey") === col("n_regionkey"))
        .join(c5, col("n_nationkey") === col("c_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"), col("n_name")))
    val o2 = orders(spark, dir)
    val oAsia2 = o2.join(asiaCustFull, o2("o_custkey") === asiaCustFull("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
      .filter(col("o_orderkey") >= 0)
    val su3 = supplier(spark, dir); val n7 = nation(spark, dir); val r7 = region(spark, dir)
    val asiaSupFull = broadcast(
      r7.filter(col("r_name") === "ASIA")
        .join(n7, col("r_regionkey") === col("n_regionkey"))
        .join(su3, col("n_nationkey") === col("s_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey")))
    val l2 = lineitem(spark, dir)
    val lAsia2 = l2.join(asiaSupFull, l2("l_suppkey") === asiaSupFull("s_suppkey"))
      .select(col("l_orderkey"), col("s_nationkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("amount"))
    val full2 = lAsia2.join(oAsia2, lAsia2("l_orderkey") === oAsia2("o_orderkey") &&
        lAsia2("s_nationkey") === oAsia2("c_nationkey"))
      .groupBy("n_name").agg(sum("amount").as("revenue"))
    time("full v2 bloom", full2, 4)
    val oAsia3 = o2.join(asiaCustFull, o2("o_custkey") === asiaCustFull("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"), col("n_name"))
    val full3 = lAsia2.join(oAsia3, lAsia2("l_orderkey") === oAsia3("o_orderkey") &&
        lAsia2("s_nationkey") === oAsia3("c_nationkey"))
      .groupBy("n_name").agg(sum("amount").as("revenue"))
    time("full v2 nobloom", full3, 4)
    spark.stop()
  }
}
