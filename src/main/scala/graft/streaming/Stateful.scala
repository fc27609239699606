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
  * persists across micro-batches in the state store; pair with a watermark
  * on the time column for bounded state).
  */
object Stateful {

  final case class FunnelEvent(k: Long, e: String, ts: Timestamp)
  final case class FunnelState(pendingUs: Long)
  final case class FunnelHit(k: Long, from_ts: Timestamp, to_ts: Timestamp, latency_us: Long)

  /** java.sql.Timestamp keeps sub-ms precision in nanos — getTime alone
    * truncates to milliseconds, so state math runs in microseconds. */
  private def toUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

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

    val events: Dataset[FunnelEvent] = df
      .filter(col(typeCol).isin(fromEvent, toEvent))
      .select(col(keyCol).cast("long").as("k"), col(typeCol).as("e"),
        col(tsCol).cast("timestamp").as("ts"))
      .as[FunnelEvent]

    def step(key: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState])
        : Iterator[FunnelHit] = {
      // micro-batches deliver per-key rows unordered — order within the
      // batch; at equal timestamps the from-event sorts first (so a
      // same-instant to-event can consume it), making output deterministic
      val sorted = it.toSeq.sortBy(ev => (toUs(ev.ts), if (ev.e == fromEvent) 0 else 1))
      var pending = state.getOption.map(_.pendingUs)
      val hits = Seq.newBuilder[FunnelHit]
      sorted.foreach { ev =>
        val evUs = toUs(ev.ts)
        if (ev.e == fromEvent) pending = Some(evUs)
        else pending match {
          case Some(p) if evUs >= p && evUs - p <= withinUs =>
            hits += FunnelHit(key, fromUs(p), ev.ts, evUs - p)
            pending = None
          case _ => ()
        }
      }
      pending match {
        case Some(p) => state.update(FunnelState(p))
        case None    => state.remove()
      }
      hits.result().iterator
    }

    events
      .groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step _)
      .toDF()
  }
}
