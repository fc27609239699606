package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Stateful, Watermark, Windows}

/** Structured Streaming path: the same Windows.tumble plan as the batch
  * corpus, driven through MemoryStream + watermark (ibis read_kafka(
  * watermark=...) → windowed agg shape). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumble over a watermarked stream emits per-window counts") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val src = Windows.withWatermark(
      input.toDF().toDF("ts", "event_type", "value"),
      Watermark("ts", "10 minutes"))
    val agg = Windows.tumble(src, col("ts"), "1 hour",
      keys = Seq(col("event_type")),
      metrics = Seq(count(lit(1)).as("n"), sum(col("value")).as("sv")))

    val query = agg.writeStream
      .format("memory").queryName("tumble_out").outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:55:00"), "click", 2.0),
        (ts("2024-01-01 11:05:00"), "click", 4.0),
        (ts("2024-01-01 10:30:00"), "view", 8.0))
      query.processAllAvailable()
      val out = spark.table("tumble_out")
        .select("event_type", "window_start", "n", "sv")
        .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
        .toSet
      assert(out == Set(
        ("click", "2024-01-01 10:00:00.0", 2L, 3.0),
        ("click", "2024-01-01 11:00:00.0", 1L, 4.0),
        ("view", "2024-01-01 10:00:00.0", 1L, 8.0)))
    } finally query.stop()
  }

  test("flatMapGroupsWithState funnel: batch parity AND state across micro-batches") {
    // batch mode: same call, state lives for the single pass
    val batch = Seq(
      (1L, "click", ts("2024-01-01 10:00:00")),
      (1L, "purchase", ts("2024-01-01 10:20:00")),   // hit (20 min)
      (1L, "purchase", ts("2024-01-01 10:30:00")),   // no pending click left
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "purchase", ts("2024-01-01 11:30:00")),   // outside 1 hour
      (3L, "purchase", ts("2024-01-01 10:00:00"))    // no click at all
    ).toDF("user_id", "event_type", "t")
    val hits = Stateful.funnelPairs(batch, "user_id", "event_type", "t",
      "click", "purchase", "1 hour").collect()
    assert(hits.map(r => (r.getLong(0), r.getLong(3))).toSet == Set((1L, 20L * 60 * 1000000L)))

    // streaming: the pending click arrives in batch 1, the purchase in
    // batch 2 — the pair is only detectable through persisted group state
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Stateful.funnelPairs(input.toDF().toDF("user_id", "event_type", "t"),
      "user_id", "event_type", "t", "click", "purchase", "1 hour")
    val query = out.writeStream
      .format("memory").queryName("funnel_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((7L, "click", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      assert(spark.table("funnel_out").count() == 0)
      input.addData((7L, "purchase", ts("2024-01-01 10:45:00")))
      query.processAllAvailable()
      val rows = spark.table("funnel_out").collect()
      assert(rows.length == 1 && rows.head.getLong(0) == 7L &&
        rows.head.getLong(3) == 45L * 60 * 1000000L)
    } finally query.stop()
  }

  test("funnel with watermark evicts expired pending state (EventTimeTimeout)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val src = Windows.withWatermark(
      input.toDF().toDF("user_id", "event_type", "t"),
      Watermark("t", "10 minutes"))
    val out = Stateful.funnelPairs(src, "user_id", "event_type", "t",
      "click", "purchase", "1 hour")
    val query = out.writeStream
      .format("memory").queryName("funnel_evict").outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: user 8's click opens a pending window [10:00, 11:00]
      input.addData((8L, "click", ts("2024-01-01 10:00:00")))
      query.processAllAvailable()
      assert(query.lastProgress.stateOperators(0).numRowsTotal == 1)
      // batch 2: unrelated user far in the future — after this batch the
      // watermark (13:00 - 10 min) is past user 8's 11:00 expiry
      input.addData((9L, "click", ts("2024-01-01 13:00:00")))
      query.processAllAvailable()
      // batch 3: timeouts fire with the advanced watermark → user 8 evicted;
      // user 9 pairs and consumes its state
      input.addData((9L, "purchase", ts("2024-01-01 13:05:00")))
      query.processAllAvailable()
      val rows = spark.table("funnel_evict").collect()
      assert(rows.map(r => (r.getLong(0), r.getLong(3))).toSet ==
        Set((9L, 5L * 60 * 1000000L)))
      assert(query.lastProgress.stateOperators(0).numRowsTotal == 0)
    } finally query.stop()
  }

  test("streaming directory reader: parquet dir -> transform -> file sink") {
    val base = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v").write.parquet(inDir)
    val schema = spark.read.parquet(inDir).schema

    val src = Windows.readParquetDir(spark, inDir, schema)
    assert(src.isStreaming)
    val query = Windows.toFileDir(
      src.filter(col("v") > 15.0).withColumn("v2", col("v") * 2),
      "parquet", outDir, ckpt).start()
    try query.processAllAvailable() finally query.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 2)
    assert(out.filter(col("id") === 3L).select("v2").head().getDouble(0) == 60.0)
  }

  test("streaming csv directory reader honors header + schema") {
    val base = java.nio.file.Files.createTempDirectory("graft_csv_stream").toString
    val inDir = s"$base/in"
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.option("header", "true").csv(inDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.StringType)))
    val src = Windows.readCsvDir(spark, inDir, schema)
    assert(src.isStreaming)
    val q = src.writeStream.format("memory").queryName("csv_dir_out")
      .outputMode(OutputMode.Append()).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("csv_dir_out").count() == 2)
  }

  test("offset tumble shifts window boundaries by startTime") {
    val batch = Seq(
      (ts("2024-01-01 10:10:00"), 1.0),
      (ts("2024-01-01 10:40:00"), 2.0)).toDF("ts", "v")
    val out = Windows.tumbleOffset(batch, col("ts"), "1 hour", "30 minutes",
      Seq.empty, Seq(sum(col("v")).as("sv")))
      .select("window_start", "sv").collect()
      .map(r => (r.getTimestamp(0).toString, r.getDouble(1))).toSet
    // windows are [09:30,10:30) and [10:30,11:30)
    assert(out == Set(("2024-01-01 09:30:00.0", 1.0), ("2024-01-01 10:30:00.0", 2.0)))
  }

  test("watermark is a no-op on batch frames (mode is a source property)") {
    val batch = Seq((ts("2024-01-01 10:05:00"), "click", 1.0)).toDF("ts", "event_type", "value")
    val out = Windows.tumble(
      Windows.withWatermark(batch, Watermark("ts", "10 minutes")),
      col("ts"), "1 hour", Seq.empty, Seq(count(lit(1)).as("n")))
    assert(out.collect().head.getAs[Long]("n") == 1L)
  }

  test("streaming dedup within watermark suppresses replays; batch dedup plain") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = Windows.dedup(
      input.toDF().toDF("k", "ts"), Seq("k"),
      Some(Watermark("ts", "10 minutes")))
    val query = deduped.writeStream
      .format("memory").queryName("dedup_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:01:00")),
        (2L, ts("2024-01-01 10:02:00")))
      query.processAllAvailable()
      // a replay of key 1 inside the watermark window, in a later batch
      input.addData((1L, ts("2024-01-01 10:03:00")), (3L, ts("2024-01-01 10:04:00")))
      query.processAllAvailable()
      val keys = spark.table("dedup_out").select("k").as[Long].collect().sorted.toSeq
      assert(keys == Seq(1L, 2L, 3L))
    } finally query.stop()
    // batch path: plain dropDuplicates, no watermark needed
    val batch = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    assert(Windows.dedup(batch, Seq("k")).count() == 2L)
  }

  test("stream-static enrichment broadcast-joins dimension rows per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "mobile"), (2L, "desktop")).toDF("user_id", "device").cache()
    val input = MemoryStream[(Long, Double)]
    val enriched = Windows.enrich(
      input.toDF().toDF("user_id", "amount"), dim, Seq("user_id"))
    val query = enriched.writeStream
      .format("memory").queryName("enrich_out").outputMode(OutputMode.Append())
      .start()
    try {
      input.addData((1L, 10.0), (3L, 7.0))
      query.processAllAvailable()
      input.addData((2L, 5.0))
      query.processAllAvailable()
      val out = spark.table("enrich_out")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      // left join: unmatched user 3 survives with null device
      assert(out == Set((1L, 10.0, "mobile"), (3L, 7.0, null), (2L, 5.0, "desktop")))
    } finally query.stop()
    // batch path: identical call
    val b = Windows.enrich(Seq((2L, 1.0)).toDF("user_id", "amount"), dim, Seq("user_id"), "inner")
    assert(b.collect().map(_.getString(2)).toSeq == Seq("desktop"))
    // streaming dimension side is rejected
    intercept[IllegalArgumentException] {
      Windows.enrich(input.toDF().toDF("user_id", "amount"),
        input.toDF().toDF("user_id", "amount"), Seq("user_id"))
    }
  }

  test("kafka value codec e2e: binary wire frame -> parse -> watermarked agg; encode roundtrip") {
    // The connector jar is absent in this environment, so format("kafka")
    // itself can't execute — but everything readKafka/toKafka DO to the
    // data (JSON value codec, schema projection, watermark registration)
    // runs here over a MemoryStream carrying kafka's wire schema
    // (value: binary). Pins the logic, not just the compilation.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val valueSchema = StructType(Seq(
      StructField("ts", TimestampType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val input = MemoryStream[String]
    val wire = input.toDF().select(col("value").cast("binary").as("value"))
    val decoded = Windows.decodeKafkaValue(wire, valueSchema,
      Some(Watermark("ts", "10 minutes")))
    assert(decoded.columns.toSeq == Seq("ts", "event_type", "value"))
    val agg = Windows.tumble(decoded, col("ts"), "1 hour",
      keys = Seq(col("event_type")),
      metrics = Seq(count(lit(1)).as("n"), sum(col("value")).as("sv")))
    val query = agg.writeStream
      .format("memory").queryName("kafka_codec_out").outputMode(OutputMode.Complete())
      .start()
    try {
      input.addData(
        """{"ts":"2024-01-01 10:05:00","event_type":"click","value":1.0}""",
        """{"ts":"2024-01-01 10:55:00","event_type":"click","value":2.0}""",
        """{"ts":"2024-01-01 11:05:00","event_type":"view","value":4.0}""",
        """not json at all""")
      query.processAllAvailable()
      val out = spark.table("kafka_codec_out")
        .select("event_type", "window_start", "n", "sv")
        .collect().map(r => (r.getString(0), Option(r.getTimestamp(1)).map(_.toString).orNull,
          r.getLong(2), r.getDouble(3)))
        .toSet
      // malformed frames parse to all-null structs (kafka's permissive
      // default) and land in a null-keyed group rather than killing the query
      assert(out.filter(_._1 != null) == Set(
        ("click", "2024-01-01 10:00:00.0", 2L, 3.0),
        ("view", "2024-01-01 11:00:00.0", 1L, 4.0)))
    } finally query.stop()
    // encode -> decode roundtrip on a batch frame: toKafka's value codec is
    // the exact inverse of readKafka's
    val batch = Seq((ts("2024-01-01 10:05:00"), "click", 1.5))
      .toDF("ts", "event_type", "value")
    val round = Windows.decodeKafkaValue(
      Windows.encodeKafkaValue(batch).select(col("value").cast("binary").as("value")),
      valueSchema, None)
    assert(round.collect().map(r =>
      (r.getTimestamp(0).toString, r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("2024-01-01 10:05:00.0", "click", 1.5)))
  }

  test("stream-stream interval join pairs events inside the band (round 9)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val l = Windows.withWatermark(
      clicks.toDF().toDF("cu", "cts"), Watermark("cts", "1 minute"))
    val r = Windows.withWatermark(
      purchases.toDF().toDF("pu", "pts", "pval"), Watermark("pts", "1 minute"))
    val joined = Windows.intervalJoin(l, r, Seq("cu" -> "pu"),
      "cts", "pts", before = "0 seconds", after = "10 minutes")
      .select(col("cu"), col("cts"), col("pts"), col("pval"))
    val query = joined.writeStream
      .format("memory").queryName("ivj_out").outputMode(OutputMode.Append())
      .start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      purchases.addData(
        (1L, ts("2024-01-01 10:05:00"), 5.0),  // in band
        (1L, ts("2024-01-01 10:20:00"), 7.0),  // outside band (>10 min)
        (2L, ts("2024-01-01 09:55:00"), 9.0),  // before the click
        (3L, ts("2024-01-01 10:05:00"), 1.0))  // no matching click key
      query.processAllAvailable()
      val out = spark.table("ivj_out").collect()
        .map(x => (x.getLong(0), x.getDouble(3))).toSet
      assert(out == Set((1L, 5.0)))
    } finally query.stop()
  }

  test("stream-stream LEFT OUTER interval join: unmatched rows emit null-padded after the watermark closes the band (round 10)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val purchases = MemoryStream[(Long, Timestamp, Double)]
    val l = Windows.withWatermark(
      clicks.toDF().toDF("cu", "cts"), Watermark("cts", "10 seconds"))
    val r = Windows.withWatermark(
      purchases.toDF().toDF("pu", "pts", "pval"), Watermark("pts", "10 seconds"))
    val joined = Windows.intervalJoin(l, r, Seq("cu" -> "pu"),
      "cts", "pts", before = "0 seconds", after = "1 minute",
      joinType = "left_outer")
      .select(col("cu"), col("pval"))
    val query = joined.writeStream
      .format("memory").queryName("ivj_lo").outputMode(OutputMode.Append())
      .start()
    try {
      clicks.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:00:00")))
      purchases.addData((1L, ts("2024-01-01 10:00:30"), 5.0))
      query.processAllAvailable()
      // click 2 is unmatched but its band is still open — cannot emit yet;
      // advance both watermarks far past the band, with a second tick so
      // the state-eviction output flows through
      for (t <- Seq("2024-01-01 10:10:00", "2024-01-01 10:20:00")) {
        clicks.addData((99L, ts(t)))
        purchases.addData((99L, ts(t), 0.0))
        query.processAllAvailable()
      }
      val out = spark.table("ivj_lo").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) null else x.getDouble(1))).toSet
      assert(out.contains((1L, 5.0)), s"matched pair missing: $out")
      assert(out.exists(p => p._1 == 2L && p._2 == null),
        s"unmatched left row never emitted null-padded: $out")
    } finally query.stop()
  }

  test("interval join on batch frames is the identical range-predicate join") {
    val clicks = Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")))
      .toDF("cu", "cts")
    val purch = Seq(
      (1L, ts("2024-01-01 10:05:00"), 5.0),
      (1L, ts("2024-01-01 10:20:00"), 7.0),
      (2L, ts("2024-01-01 11:09:59"), 3.0)).toDF("pu", "pts", "pval")
    val out = Windows.intervalJoin(clicks, purch, Seq("cu" -> "pu"),
      "cts", "pts", before = "0 seconds", after = "10 minutes")
      .select("cu", "pval").as[(Long, Double)].collect().toSet
    assert(out == Set((1L, 5.0), (2L, 3.0)))
    // left_outer keeps unmatched left rows with nulls
    val lo = Windows.intervalJoin(
      clicks, purch.filter(col("pu") === 1L), Seq("cu" -> "pu"),
      "cts", "pts", "0 seconds", "10 minutes", joinType = "left_outer")
    assert(lo.filter(col("pval").isNull).select("cu").as[Long].collect().toSeq == Seq(2L))
  }
}
