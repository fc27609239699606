package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-5 verdict experiment 6a: does an o_orderkey-bucketed layout for
  * orders+lineitem remove q101's last exchange pair, and what does that
  * buy on warm local data?
  *
  * Writes both fact tables bucketed (+sorted) by their orderkey into the
  * local warehouse once (skipped when present; BUCKETS env, default 64),
  * then times the identical Q5 body reading the bucketed tables. The join
  * keys are (orderkey, nationkey) — a SUPERSET of the bucket key — so the
  * co-partition needs `spark.sql.requireAllClusterKeysForCoPartition=false`
  * (partitioning on orderkey alone still co-locates every
  * (orderkey, nationkey) group).
  *
  * Usage: BUCKETS=64 RUNS=3 sbt "runMain graft.tools.BucketedTpch5 data/sf100 [explain]"
  */
object BucketedTpch5 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val buckets = sys.env.getOrElse("BUCKETS", "64").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.exts.GraftExtensions)
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("PARTS", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("MPB", "64m"))
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.autoBroadcastJoinThreshold", sys.env.getOrElse("BT", "10485760"))
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold",
        sys.env.getOrElse("AQE_BT", sys.env.getOrElse("BT", "10485760")))
      .config("spark.sql.join.preferSortMergeJoin", sys.env.getOrElse("SMJ", "true"))
      // accept co-partitioning on a subset of the join keys (bucket key
      // orderkey ⊂ join keys (orderkey, nationkey))
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_") + s"_b$buckets"
    val oTbl = s"orders_$suffix"; val lTbl = s"lineitem_$suffix"
    // the default session catalog is in-memory (metadata dies with the
    // JVM) while the bucketed files persist in the warehouse dir — so on
    // re-run, re-register the existing layout as an external bucketed
    // table instead of re-writing 16 GB
    def ensure(tbl: String, key: String, src: => org.apache.spark.sql.DataFrame): Unit =
      if (!spark.catalog.tableExists(tbl)) {
        val loc = new java.io.File(s"spark-warehouse/$tbl")
        if (loc.exists()) {
          val ddl = spark.read.parquet(loc.getAbsolutePath).schema.toDDL
          spark.sql(s"""CREATE TABLE $tbl ($ddl) USING parquet
            CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
            LOCATION '${loc.getAbsolutePath}'""")
        } else {
          println(s"[bucketed] writing $tbl ($buckets buckets)")
          graft.api.Table(src).toBucketedTable(tbl, buckets, key)
        }
      }
    ensure(oTbl, "o_orderkey", graft.queries.Tables.orders(spark, dir))
    ensure(lTbl, "l_orderkey", graft.queries.Tables.lineitem(spark, dir))

    def q = graft.queries.TpchQueries.tpch5Body(spark, dir,
      spark.table(oTbl), spark.table(lTbl))
    if (args.length > 1 && args(1) == "explain") q.explain("formatted")
    for (i <- 1 to sys.env.getOrElse("RUNS", "3").toInt) {
      val t0 = System.nanoTime()
      q.write.format("noop").mode("overwrite").save()
      println(f"[time] run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    // reference: the plain-parquet shape under the same session confs
    def p = graft.queries.TpchQueries.tpch5Body(spark, dir,
      graft.queries.Tables.orders(spark, dir), graft.queries.Tables.lineitem(spark, dir))
    for (i <- 1 to sys.env.getOrElse("RUNS", "3").toInt) {
      val t0 = System.nanoTime()
      p.write.format("noop").mode("overwrite").save()
      println(f"[time] parquet run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val a = q.collect().map(_.toSeq).toSeq
    val b = p.collect().map(_.toSeq).toSeq
    println(s"[check] bucketed == parquet: ${a == b} (${a.size} rows)")
    spark.stop()
  }
}
