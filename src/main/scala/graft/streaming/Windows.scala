package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming surface: watermark spec + tumble/hop windowed aggregation,
  * mirroring ibis `Table.window_by` → `WindowedTable.tumble/hop`
  * (/root/reference/ibis/expr/types/temporal_windows.py:20-100) and
  * `ibis.watermark` (/root/reference/ibis/expr/api.py:2308-2324).
  *
  * The same plan works in batch (groupBy(window(...))) and streaming
  * (readStream + withWatermark) — like ibis's PySpark backend, where
  * batch/streaming is a connection-mode property, not a different API
  * (/root/reference/ibis/backends/pyspark/__init__.py:161-199).
  */
final case class Watermark(timeCol: String, allowedDelay: String)

object Windows {

  def withWatermark(df: DataFrame, wm: Watermark): DataFrame =
    if (df.isStreaming) df.withWatermark(wm.timeCol, wm.allowedDelay) else df

  /** Microseconds of a day-or-smaller interval string like "6 hours". */
  private[streaming] def intervalMicros(size: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(size))
    require(iv.months == 0, s"calendar-month windows are not fixed-width: $size")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Tumbling window aggregation → window_start/window_end + keys + metrics
    * (pyspark compile path: backends/sql/compilers/pyspark.py:589-648).
    *
    * Streaming uses Spark's `window()` (watermark integration needs the
    * TimeWindow node); batch groups on a PRIMITIVE LONG bucket instead —
    * hashing a long key is measurably cheaper than a struct key in the
    * aggregate map, and the window bounds are reconstructed after the
    * aggregation (identical alignment: floor to a size multiple from the
    * epoch, which is what TimeWindowing lowers to). */
  def tumble(df: DataFrame, timeCol: Column, size: String, keys: Seq[Column], metrics: Seq[Column]): DataFrame =
    if (df.isStreaming)
      df.groupBy((window(timeCol, size) +: keys): _*)
        .agg(metrics.head, metrics.tail: _*)
        .withColumn("window_start", col("window.start"))
        .withColumn("window_end", col("window.end"))
        .drop("window")
    else {
      val us = intervalMicros(size)
      val t = unix_micros(timeCol)
      // window() drops null-timestamp rows (TimeWindowing injects an
      // IsNotNull filter); match it so batch and streaming agree on null
      // input instead of emitting a null-window bucket
      df.filter(timeCol.isNotNull)
        .groupBy(((t - pmod(t, lit(us))).as("__w") +: keys): _*)
        .agg(metrics.head, metrics.tail: _*)
        .withColumn("window_start", timestamp_micros(col("__w")))
        .withColumn("window_end", timestamp_micros(col("__w") + us))
        .drop("__w")
    }

  /** Hopping (sliding) window aggregation. */
  def hop(df: DataFrame, timeCol: Column, size: String, slide: String,
      keys: Seq[Column], metrics: Seq[Column]): DataFrame =
    df.groupBy((window(timeCol, size, slide) +: keys): _*)
      .agg(metrics.head, metrics.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Offset (phase-shifted) tumbling windows — the reference REJECTS
    * window offsets on its spark backend (compilers/pyspark.py:602-605);
    * Spark supports them natively as `window(..., startTime)`, so we expose
    * the capability rather than mirroring the refusal. */
  def tumbleOffset(df: DataFrame, timeCol: Column, size: String, offset: String,
      keys: Seq[Column], metrics: Seq[Column]): DataFrame =
    df.groupBy((window(timeCol, size, size, offset) +: keys): _*)
      .agg(metrics.head, metrics.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")

  /** Session windows — a Spark capability superset (ibis has tumble/hop
    * only, SURVEY.md §2.6); exposed because gap-based sessionization is a
    * core events-pipeline op. */
  def session(df: DataFrame, timeCol: Column, gap: String,
      keys: Seq[Column], metrics: Seq[Column]): DataFrame =
    df.groupBy((session_window(timeCol, gap) +: keys): _*)
      .agg(metrics.head, metrics.tail: _*)
      .withColumn("window_start", col("session_window.start"))
      .withColumn("window_end", col("session_window.end"))
      .drop("session_window")

  /** Key-based dedup that works in both modes (capability superset — the
    * reference's streaming surface has no dedup op): batch is a plain
    * dropDuplicates; streaming uses dropDuplicatesWithinWatermark so the
    * dedup STATE IS BOUNDED — keys older than the event-time watermark are
    * evicted, which is the only way a forever-running 100 TB/day ingest
    * dedup survives (unbounded dropDuplicates state grows with every
    * distinct key ever seen). Requires a watermark in streaming mode;
    * duplicates arriving within `wm.allowedDelay` of the first sighting
    * are suppressed, later ones are the caller's at-least-once residue —
    * the standard watermark-bounded contract. */
  def dedup(df: DataFrame, keys: Seq[String], wm: Option[Watermark] = None): DataFrame =
    if (df.isStreaming) {
      val w = wm.map(m => df.withWatermark(m.timeCol, m.allowedDelay)).getOrElse(df)
      w.dropDuplicatesWithinWatermark(keys)
    } else df.dropDuplicates(keys)

  /** Stream-static enrichment: join a (possibly streaming) event frame
    * against a bounded dimension table, force-broadcast — the standard
    * "attach user/device/document metadata to every event" step. Works
    * identically on batch frames; on a stream Spark re-plans the
    * broadcast per micro-batch, so a cache()'d dimension is read once.
    * Inner or left join only (stream-static right/outer is not defined
    * by Spark's model for the static side). */
  def enrich(
      events: DataFrame,
      dim: DataFrame,
      on: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"stream-static enrichment supports inner/left, got $joinType")
    require(!dim.isStreaming, "dimension side must be a bounded (static) frame")
    events.join(org.apache.spark.sql.functions.broadcast(dim), on, joinType)
  }

  /** Stream-stream INTERVAL JOIN (round 9 — the enrichment step when
    * BOTH sides are unbounded: clicks⋈impressions, request⋈response
    * pairing). The condition is the equi-keys plus an event-time band —
    * right's time within `[leftTime - before, leftTime + after]` — which
    * is exactly the constraint Spark's symmetric state manager needs to
    * bound BOTH buffers and emit/evict as the watermarks advance; apply
    * [[withWatermark]] to each side first (Spark enforces that for outer
    * variants; for inner joins it is what keeps state finite). Works
    * identically on batch frames, where the band is a plain range
    * predicate — batch/streaming stays a source property. */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      on: Seq[(String, String)],
      leftTime: String, rightTime: String,
      before: String, after: String,
      joinType: String = "inner"): DataFrame = {
    require(on.nonEmpty, "interval join needs at least one equi-key")
    val keys = on.map { case (l, r) => left(l) === right(r) }.reduce(_ && _)
    val band =
      right(rightTime) >= left(leftTime) - expr(s"INTERVAL '$before'") &&
      right(rightTime) <= left(leftTime) + expr(s"INTERVAL '$after'")
    left.join(right, keys && band, joinType)
  }

  /** The value codec [[readKafka]] applies to the broker's wire frame
    * (`value: binary` holding JSON): parse against the declared schema,
    * unnest, then register the watermark. Factored out of the source so
    * the parse/watermark logic is executable WITHOUT the connector jar —
    * StreamingSpec drives it end-to-end over a MemoryStream carrying the
    * same wire schema; only the `format("kafka")` wiring itself remains
    * environment-blocked (DIVERGENCES.md §2). */
  private[graft] def decodeKafkaValue(raw: DataFrame,
      valueSchema: org.apache.spark.sql.types.StructType,
      wm: Option[Watermark]): DataFrame = {
    val parsed = raw
      .select(from_json(col("value").cast("string"), valueSchema).as("v"))
      .select("v.*")
    wm.fold(parsed)(w => parsed.withWatermark(w.timeCol, w.allowedDelay))
  }

  /** The value codec [[toKafka]] applies before the broker: every column
    * packed as one JSON `value` — the inverse of [[decodeKafkaValue]]. */
  private[graft] def encodeKafkaValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(col("*"))).as("value"))

  /** Kafka source (ibis read_kafka, backends/pyspark/__init__.py:1080):
    * value parsed against a declared schema, optional watermark. */
  def readKafka(spark: org.apache.spark.sql.SparkSession, bootstrap: String, topic: String,
      valueSchema: org.apache.spark.sql.types.StructType, wm: Option[Watermark]): DataFrame =
    decodeKafkaValue(
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .load(),
      valueSchema, wm)

  /** Kafka sink (ibis to_kafka, backends/pyspark/__init__.py:1144). */
  def toKafka(df: DataFrame, bootstrap: String, topic: String, checkpoint: String) =
    encodeKafkaValue(df)
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  // Streaming directory readers (ibis read_parquet_dir / read_csv_dir /
  // read_json_dir, backends/pyspark/__init__.py:1197-1306): file-watch
  // sources with a declared schema, optional watermark at registration —
  // the same Table surface then works unchanged on the stream.

  private def watermarked(df: DataFrame, wm: Option[Watermark]): DataFrame =
    wm.fold(df)(w => df.withWatermark(w.timeCol, w.allowedDelay))

  def readParquetDir(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType, wm: Option[Watermark] = None): DataFrame =
    watermarked(spark.readStream.schema(schema).parquet(path), wm)

  def readCsvDir(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType, header: Boolean = true,
      wm: Option[Watermark] = None): DataFrame =
    watermarked(spark.readStream.schema(schema).option("header", header.toString).csv(path), wm)

  def readJsonDir(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType, wm: Option[Watermark] = None): DataFrame =
    watermarked(spark.readStream.schema(schema).json(path), wm)

  /** Streaming file sink (ibis to_parquet_dir / to_csv_dir,
    * backends/pyspark/__init__.py:1360-1411). */
  def toFileDir(df: DataFrame, format: String, path: String, checkpoint: String) =
    df.writeStream.format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
}
