package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state — the `flatMapGroupsWithState` surface
  * (SURVEY.md §2.6 escalation path: watermarked windowed aggs cover
  * tumble/hop/session; arbitrary per-key state machines need
  * KeyValueGroupedDataset). The reference has no analogue — its streaming
  * backends stop at windowed aggregation — so this is a capability-superset
  * operator shaped for training-data/event pipelines.
  *
  * [[Stateful.funnelPairs]] detects `fromEvent` → `toEvent` sequences per
  * key within a time bound: state is the latest unconsumed `fromEvent`
  * timestamp; each `toEvent` within `within` of it emits a (user, from_ts,
  * to_ts, latency_ms) row and consumes the state. The SAME call works on a
  * batch frame (state lives for the single pass) and on a stream (state
  * persists across micro-batches in the state store).
  *
  * Bounded state: when the streaming input carries an event-time watermark
  * on `tsCol`, the operator uses `GroupStateTimeout.EventTimeTimeout` and
  * arms a per-key timeout at `pending + within` — a from-event whose window
  * expires without a to-event is EVICTED from the state store once the
  * watermark passes it (an expired pending can never pair again, so output
  * is unchanged; only state size is bounded). Without a watermark
  * (un-watermarked stream, or batch — where Spark never fires timeouts and
  * forbids `setTimeoutTimestamp`) state for abandoned funnels lives until
  * the key's next event; long-running streaming callers should always
  * watermark the time column first.
  */
// Serializable: the step closure references the module's private µs
// helpers, so the module rides inside the serialized task closure
object Stateful extends Serializable {

  /** `p` is the event's funnel role — 0 = from-event, 1 = to-event —
    * resolved map-side BEFORE the shuffle: the state operator then never
    * touches the event-type string (smaller shuffle rows, and the hot
    * per-batch sort runs on one primitive long instead of a boxed
    * (Long, Int) tuple with a string compare behind it — measured ~15%
    * on the rate-source funnel bench at 100M-row batches).
    *
    * Round 15: `us` is the event time as BARE MICROSECONDS, converted
    * map-side in codegen (`unix_micros` — exactly the µs the Timestamp
    * deserializer would have carried, Catalyst timestamps being µs
    * internally). The state path is the hottest per-event code the
    * engine has, and the encoder previously allocated a java.sql
    * Timestamp (plus internal calendar math) PER EVENT just so the step
    * function could immediately flatten it back to µs. Every event is
    * now two primitive longs and an int end to end. */
  final case class FunnelEvent(k: Long, p: Int, us: Long)
  final case class FunnelState(pendingUs: Long)
  final case class FunnelHit(k: Long, from_ts: Timestamp, to_ts: Timestamp, latency_us: Long)

  /** java.sql.Timestamp keeps sub-ms precision in nanos — getTime alone
    * truncates to milliseconds, so state math runs in microseconds
    * (event µs arrive pre-extracted by unix_micros; only output hits
    * rebuild Timestamp objects). */
  private def fromUs(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def funnelPairs(
      df: DataFrame,
      keyCol: String, typeCol: String, tsCol: String,
      fromEvent: String, toEvent: String, within: String): DataFrame = {
    val withinUs = Windows.intervalMicros(within)
    implicit val eEnc = Encoders.product[FunnelEvent]
    implicit val sEnc = Encoders.product[FunnelState]
    implicit val hEnc = Encoders.product[FunnelHit]
    implicit val kEnc = Encoders.scalaLong

    // EventTimeTimeout is only legal when the stream has a watermark
    // (EventTimeWatermark stamps spark.watermarkDelayMs on the column's
    // metadata); batch execution never fires timeouts and throws on
    // setTimeoutTimestamp, so it stays on NoTimeout.
    val watermarked = df.isStreaming &&
      df.schema.fields.exists(_.metadata.contains("spark.watermarkDelayMs"))
    val timeoutConf =
      if (watermarked) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout

    // The µs column must still LOOK watermarked: Spark validates
    // EventTimeTimeout (and builds the late-event filter) from the
    // spark.watermarkDelayMs metadata on a child output column, and a
    // plain Cast/Alias chain drops it. unix_micros(ts) IS the timestamp's
    // internal value — a TimestampType attribute is physically a µs long,
    // and WatermarkSupport's late/eviction predicates compare that long
    // against watermark-µs — so re-attaching the original column's
    // metadata to the µs long preserves the exact late-row and timeout
    // semantics while the shuffle and the state path carry primitives.
    val tsField = df.schema(df.schema.fieldIndex(tsCol))
    val tsTyped =
      if (tsField.dataType == org.apache.spark.sql.types.TimestampType) col(tsCol)
      else col(tsCol).cast("timestamp")
    val usCol = org.apache.spark.sql.GraftSqlBridge.aliasWithMetadata(
      unix_micros(tsTyped), "us", tsField.metadata)
    val events: Dataset[FunnelEvent] = df
      .filter(col(typeCol).isin(fromEvent, toEvent))
      .select(col(keyCol).cast("long").as("k"),
        when(col(typeCol) === fromEvent, 0).otherwise(1).cast("int").as("p"),
        usCol)
      .as[FunnelEvent]

    def step(key: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState])
        : Iterator[FunnelHit] = {
      if (state.hasTimedOut) {
        // the pending from-event's window has fully expired (watermark is
        // past pending + within) — it can never pair; drop the state row
        state.remove()
        return Iterator.empty
      }
      // micro-batches deliver per-key rows unordered — order within the
      // batch; at equal timestamps the from-event sorts first (so a
      // same-instant to-event can consume it), making output
      // deterministic. The sort key packs (timestamp-µs, role) into one
      // long (µs·2 + p; p ∈ {0,1}, from sorts first — overflow at
      // ~year 146k). Round 15: the packed keys ARE the whole event for
      // the replay (Catalyst timestamps are µs-precision, so fromUs
      // round-trips losslessly) — collect them into a bare primitive
      // long[] and Arrays.sort it. The previous shape allocated a boxed
      // (Long, FunnelEvent) tuple per event and sorted through a
      // comparator: at 100M-row batches that is ~3 allocations per event
      // on the hottest path the stream has; this shape allocates one
      // growable long[] per (key, batch).
      var keys = new Array[Long](math.max(16, it.knownSize))
      var n = 0
      it.foreach { ev =>
        if (n == keys.length) keys = java.util.Arrays.copyOf(keys, n * 2)
        keys(n) = ev.us * 2 + ev.p
        n += 1
      }
      java.util.Arrays.sort(keys, 0, n)
      var pending = state.getOption.map(_.pendingUs)
      val hits = Seq.newBuilder[FunnelHit]
      var i = 0
      while (i < n) {
        val sortKey = keys(i)
        val evUs = sortKey >> 1
        if ((sortKey & 1L) == 0L) pending = Some(evUs)
        else pending match {
          case Some(p) if evUs >= p && evUs - p <= withinUs =>
            hits += FunnelHit(key, fromUs(p), fromUs(evUs), evUs - p)
            pending = None
          case _ => ()
        }
        i += 1
      }
      pending match {
        case Some(p) =>
          state.update(FunnelState(p))
          if (watermarked) {
            // evict once the watermark passes the end of the match window;
            // must stay strictly above the current watermark or Spark
            // rejects the timestamp (late-arriving from-events)
            val expiryMs = math.floorDiv(p + withinUs, 1000L) + 1L
            state.setTimeoutTimestamp(math.max(expiryMs, state.getCurrentWatermarkMs() + 1L))
          }
        case None => state.remove()
      }
      hits.result().iterator
    }

    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(step _)
      .toDF()
  }
}
