package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin
import graft.streaming.Windows
import Tables._

/** Windowed-aggregation corpus (SURVEY.md §2.6): tumble/hop (ibis
  * WindowedTable.tumble/hop) and session windows (Spark superset). The SAME
  * graft.streaming.Windows plans run under readStream + withWatermark —
  * batch/streaming is a source property, as in the reference's pyspark
  * backend (mode="batch"|"streaming"). ScalaTest drives the streaming path
  * with MemoryStream; here the driver verifies the batch semantics. */
object StreamingQueries {

  val defs: Seq[QueryDef] = Seq(

    // Tumbling 1h windows per event_type.
    QueryDef("q80_tumble", (s, dir) => {
      Windows.tumble(events(s, dir), col("ts"), "1 hour",
          keys = Seq(col("event_type")),
          metrics = Seq(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
        .withColumn("window_start", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
        .withColumn("window_end", date_format(col("window_end"), "yyyy-MM-dd HH:mm:ss"))
        // the corpus event span is SF-invariant (70 days), so the output
        // is bounded by hours × event types (~6.7k rows at any SF):
        // single-partition sort, no range exchange + sampling pass (r15)
        .coalesce(1)
        .sortWithinPartitions(col("window_start").asc, col("event_type").asc)
    }, Some("""
      SELECT event_type, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value,
        STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
        STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts::TIMESTAMP) + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end
      FROM events GROUP BY event_type, TIME_BUCKET(INTERVAL '1 hour', ts::TIMESTAMP)
      ORDER BY window_start, event_type""")),

    // Floor control for q80 (round-2 verdict #8): the SAME primitive-bucket
    // grouping with a bare count — no money sum, no timestamp formatting —
    // so the bench record carries data for "q80's residual is the engine's
    // hash-aggregation floor, not a plan defect". Kept out of the ratio
    // geomean (Bench emits it under "controls_*").
    QueryDef("q80_control", (s, dir) => {
      val t = unix_micros(col("ts"))
      events(s, dir)
        .filter(col("ts").isNotNull)
        .groupBy((t - pmod(t, lit(3600000000L))).as("bucket"), col("event_type"))
        .count()
        .withColumnRenamed("count", "n")
    }, Some("""
      SELECT (epoch_us(ts::TIMESTAMP) - epoch_us(ts::TIMESTAMP) % 3600000000) AS bucket,
        event_type, COUNT(*) AS n
      FROM events WHERE ts IS NOT NULL GROUP BY 1, 2""")),

    // Hopping windows: 1h size / 30min slide (each event in 2 windows).
    QueryDef("q81_hop", (s, dir) => {
      Windows.hop(events(s, dir), col("ts"), "1 hour", "30 minutes",
          keys = Seq.empty,
          metrics = Seq(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value")))
        .withColumn("window_start", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
        .select("window_start", "n", "avg_value")
        .orderBy(col("window_start").asc)
    }, Some("""
      WITH expanded AS (
        SELECT value,
          TIME_BUCKET(INTERVAL '30 minutes', ts::TIMESTAMP) - (k * INTERVAL 30 MINUTE) AS window_start
        FROM events, UNNEST([0, 1]) AS t(k))
      SELECT STRFTIME(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
        COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
      FROM expanded GROUP BY window_start ORDER BY window_start""")),

    // Session windows (30min gap) per user: gaps-and-islands oracle.
    QueryDef("q82_session", (s, dir) => {
      Windows.session(events(s, dir), col("ts"), "30 minutes",
          keys = Seq(col("user_id")),
          metrics = Seq(count(lit(1)).as("n_events"), dsum(col("value")).as("session_value")))
        .withColumn("window_start", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
        .select("user_id", "window_start", "n_events", "session_value")
        .orderBy(col("user_id").asc, col("window_start").asc)
    }, Some("""
      WITH marked AS (
        SELECT user_id, ts::TIMESTAMP AS t, value,
          CASE WHEN ts::TIMESTAMP - LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) > INTERVAL 30 MINUTE
               OR LAG(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP) IS NULL
               THEN 1 ELSE 0 END AS new_session
        FROM events),
      sessions AS (
        SELECT user_id, t, value,
          SUM(new_session) OVER (PARTITION BY user_id ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM marked)
      SELECT user_id, STRFTIME(MIN(t), '%Y-%m-%d %H:%M:%S') AS window_start,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS session_value
      FROM sessions GROUP BY user_id, sid ORDER BY user_id, window_start""")),

    // Windowed funnel: tumble + per-window pivot of event types.
    // Stateful funnel detection (flatMapGroupsWithState — per-key state
    // machine, SURVEY §2.6 custom-state path). Batch mode here; the same
    // call carries state across micro-batches on a stream (StreamingSpec).
    // Oracle: consume-semantics as SQL — the latest click at-or-before each
    // purchase, provided no earlier purchase already consumed it.
    QueryDef("q85_funnel_state", (s, dir) => {
      graft.streaming.Stateful.funnelPairs(events(s, dir),
          "user_id", "event_type", "ts", "click", "purchase", "1 hour")
        .withColumnRenamed("k", "user_id")
        // encoder-produced timestamps are LTZ; the corpus convention (and
        // parquet-sourced columns under NTZ inference) is naive timestamps
        .withColumn("from_ts", col("from_ts").cast("timestamp_ntz"))
        .withColumn("to_ts", col("to_ts").cast("timestamp_ntz"))
        .orderBy(col("user_id").asc, col("to_ts").asc)
    }, Some("""
      WITH ev AS (SELECT user_id, event_type, ts::TIMESTAMP AS t FROM events
                  WHERE event_type IN ('click', 'purchase')),
      p AS (SELECT user_id, t AS pt FROM ev WHERE event_type = 'purchase'),
      cand AS (
        SELECT p.user_id, p.pt,
          (SELECT MAX(c.t) FROM ev c
           WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.t <= p.pt) AS ct
        FROM p)
      SELECT cand.user_id, ct AS from_ts, pt AS to_ts,
        CAST(DATE_DIFF('microsecond', ct, pt) AS BIGINT) AS latency_us
      FROM cand
      WHERE ct IS NOT NULL AND pt <= ct + INTERVAL 1 HOUR
        AND NOT EXISTS (SELECT 1 FROM p p2
          WHERE p2.user_id = cand.user_id AND p2.pt >= cand.ct AND p2.pt < cand.pt)
      ORDER BY user_id, to_ts""")),

    QueryDef("q83_windowed_funnel", (s, dir) => {
      Windows.tumble(events(s, dir), col("ts"), "6 hours",
          keys = Seq.empty,
          metrics = Seq(
            count(when(col("event_type") === "view", lit(1))).as("views"),
            count(when(col("event_type") === "click", lit(1))).as("clicks"),
            count(when(col("event_type") === "purchase", lit(1))).as("purchases"),
            round(count(when(col("event_type") === "purchase", lit(1))).cast("double") /
              greatest(count(when(col("event_type") === "view", lit(1))), lit(1L)), 6).as("conv_rate")))
        .withColumn("window_start", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
        .select("window_start", "views", "clicks", "purchases", "conv_rate")
        .orderBy(col("window_start").asc)
    }, Some("""
      SELECT STRFTIME(TIME_BUCKET(INTERVAL '6 hours', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
        COUNT(*) FILTER (WHERE event_type = 'view') AS views,
        COUNT(*) FILTER (WHERE event_type = 'click') AS clicks,
        COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchases,
        ROUND(COUNT(*) FILTER (WHERE event_type = 'purchase')
          / CAST(GREATEST(COUNT(*) FILTER (WHERE event_type = 'view'), 1) AS DOUBLE), 6) AS conv_rate
      FROM events GROUP BY 1 ORDER BY window_start""")),

    // Stream-to-stream enrichment shape: per-user running aggregates via
    // as-of join of purchases onto the running click count (batch twin of a
    // stream-stream join with state).
    QueryDef("q84_enrich_asof", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .withColumn("clicks_so_far",
          count(lit(1)).over(Window.partitionBy(col("user_id"))
            .orderBy(col("ts").asc, col("event_id").asc)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("clicks_so_far"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      AsofJoin(purchases, clicks, col("ts"), col("cts"), by = Seq("user_id" -> "cu"))
        .select(col("event_id"), col("user_id"), coalesce(col("clicks_so_far"), lit(0L)).as("clicks_before"))
        .orderBy(col("event_id").asc)
    }, Some("""
      SELECT p.event_id, p.user_id,
        COALESCE(c.clicks_so_far, 0) AS clicks_before
      FROM (SELECT event_id, user_id, ts::TIMESTAMP AS t FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (
        SELECT user_id, ts::TIMESTAMP AS t,
          COUNT(*) OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS clicks_so_far
        FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id AND p.t >= c.t
      ORDER BY p.event_id""")),

    // Stream-stream INTERVAL join (round 9, Windows.intervalJoin): every
    // purchase within [0, 30min] after a click by the same user — the
    // attribution-pairing shape. StreamingSpec drives the same plan over
    // two watermarked MemoryStreams (incl. outer-emission on watermark
    // advance); here the driver verifies the batch semantics, where the
    // band is a plain range predicate.
    QueryDef("q83b_interval_join", (s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"), col("value").as("pval"))
      Windows.intervalJoin(clicks, purchases, Seq("cu" -> "pu"),
          "cts", "pts", before = "0 seconds", after = "30 minutes")
        .groupBy(col("cu").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"), dsum(col("pval")).as("pval_sum"),
          countDistinct(col("cid")).as("n_clicks_matched"))
        .orderBy(col("user_id"))
    }, Some("""
      SELECT c.user_id, COUNT(*) AS n_pairs,
        CAST(SUM(CAST(p.value AS DECIMAL(38,4))) AS DOUBLE) AS pval_sum,
        COUNT(DISTINCT c.event_id) AS n_clicks_matched
      FROM (SELECT user_id, ts::TIMESTAMP AS t, event_id FROM events WHERE event_type = 'click') c
      JOIN (SELECT user_id, ts::TIMESTAMP AS t, value FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.t >= c.t AND p.t <= c.t + INTERVAL 30 MINUTE
      GROUP BY 1 ORDER BY 1""")),

    // LEFT OUTER stream-stream interval join (round 10): clicks with NO
    // purchase inside the attribution band survive null-padded — the
    // "unconverted clicks" side of attribution, which streaming can only
    // emit after the watermark closes the band (StreamingSpec drives
    // exactly that emission over MemoryStreams); the batch twin here is
    // oracle-checked, counting matched rows, unmatched clicks, and the
    // matched-value total in one pass.
    QueryDef("q83c_interval_join_outer", (s, dir) => {
      val e = events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"), col("event_id").as("cid"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("ts").as("pts"), col("value").as("pval"))
      Windows.intervalJoin(clicks, purchases, Seq("cu" -> "pu"),
          "cts", "pts", before = "0 seconds", after = "30 minutes",
          joinType = "left_outer")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("pval").isNull, lit(1))).as("n_unmatched_rows"),
          countDistinct(when(col("pval").isNull, col("cid"))).as("n_unmatched_clicks"),
          dsum(coalesce(col("pval"), lit(0.0))).as("pval_sum"))
    }, Some("""
      SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN p.value IS NULL THEN 1 END) AS n_unmatched_rows,
        COUNT(DISTINCT CASE WHEN p.value IS NULL THEN c.event_id END) AS n_unmatched_clicks,
        CAST(SUM(CAST(COALESCE(p.value, 0) AS DECIMAL(38,4))) AS DOUBLE) AS pval_sum
      FROM (SELECT user_id, ts::TIMESTAMP AS t, event_id FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT user_id, ts::TIMESTAMP AS t, value FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id AND p.t >= c.t AND p.t <= c.t + INTERVAL 30 MINUTE"""))
  )
}
