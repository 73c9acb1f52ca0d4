package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** STREAM–STREAM backward as-of join on `transformWithState` — the one
  * operator family round 7 left unclaimed (the native batch/stream-static
  * as-of is [[graft.plans.AsOf]]; this adds cross-batch RIGHT-side state).
  *
  * Semantics (append mode): for every left row, the LATEST right row of
  * the same key with `rightTs <= leftTs`, no matter which micro-batch
  * either side arrives in. A left row is held in state until the event-
  * time watermark passes its timestamp — only then is its match decided
  * and emitted, so a right row arriving AFTER the left it must match
  * (but before the watermark does) still wins.
  *
  * Late-data contract (documented, spec-pinned): rows with an event time
  * behind the current watermark are DROPPED before they reach the
  * processor — Spark's event-time watermark filter applies to every
  * stateful operator, transformWithState included — exactly the contract
  * of Spark's built-in stream–stream interval join. Within the watermark
  * delay, arrival order is free: a right row arriving any number of
  * batches after the left it must match still wins, because lefts are
  * only released once the watermark passes their timestamp. Batch
  * equivalence therefore holds for every row the watermark admitted.
  *
  * The 100 TB story: state per key is BOUNDED — lefts live only until the
  * watermark passes them (watermark delay × arrival rate), and rights are
  * dominance-pruned on every timer sweep (a right row at-or-before the
  * watermark is kept only if it is the LATEST such row: any older one can
  * never again be "latest at-or-before" for a left the watermark has not
  * yet released). The join shuffles once on the key — the same cost class
  * as any stream–stream join — and the per-key merge work is
  * O((|L|+|R|) log |R|) per sweep over only the buffered window.
  */
object StreamAsOf {

  /** Tagged union row for the two inputs (one source type keeps a single
    * watermark column through the union). */
  final case class AsOfStreamEvent(
      userId: Long, isLeft: Boolean, id: Long, ts: Timestamp, value: Double)

  /** Buffered left row awaiting watermark release. */
  final case class BufLeft(tsMs: Long, eventId: Long)

  /** Right-side state: candidate match rows. */
  final case class BufRight(tsMs: Long, errorId: Long, value: Double)

  /** Join output: left columns plus the matched right columns (None when
    * no right row at-or-before the left's time exists). */
  final case class StreamAsOfJoined(
      userId: Long, eventId: Long, ts: Timestamp,
      errorId: Option[Long], errorTs: Option[Timestamp],
      errorValue: Option[Double])

  /** Per-key processor: rights accumulate (dominance-pruned), lefts
    * buffer until the watermark passes their event time, emission happens
    * in `handleExpiredTimer` (each left arms a timer at its own
    * timestamp). */
  class StreamAsOfProcessor
      extends StatefulProcessor[Long, AsOfStreamEvent, StreamAsOfJoined] {
    @transient private var lefts: ListState[BufLeft] = _
    @transient private var rights: ListState[BufRight] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      lefts = getHandle.getListState[BufLeft]("lefts",
        Encoders.product[BufLeft], TTLConfig.NONE)
      rights = getHandle.getListState[BufRight]("rights",
        Encoders.product[BufRight], TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[AsOfStreamEvent],
                                 timers: TimerValues): Iterator[StreamAsOfJoined] = {
      val wm = timers.getCurrentWatermarkInMs()
      rows.foreach { e =>
        if (e.isLeft) {
          lefts.appendValue(BufLeft(e.ts.getTime, e.id))
          // release gate: fire once the watermark passes this left's time
          // (max() guards the ts == wm boundary — rows strictly behind the
          // watermark never reach here, Spark's late-row filter drops them)
          getHandle.registerTimer(math.max(e.ts.getTime, wm + 1L))
        } else {
          rights.appendValue(BufRight(e.ts.getTime, e.id, e.value))
        }
      }
      Iterator.empty // all emission is watermark-gated in the timer
    }

    override def handleExpiredTimer(key: Long, timers: TimerValues,
        expired: ExpiredTimerInfo): Iterator[StreamAsOfJoined] = {
      val wm = timers.getCurrentWatermarkInMs()
      val allRights = rights.get().toArray.sortBy(_.tsMs)
      val allLefts = lefts.get().toArray
      val (ready, pending) = allLefts.partition(_.tsMs <= wm)
      // deterministic emission order; matches stay correct regardless
      val out = ready.sortBy(l => (l.tsMs, l.eventId)).iterator.map { l =>
        // latest right at-or-before the left's time: binary search for the
        // first index whose time exceeds l.tsMs
        var lo = 0; var hi = allRights.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (allRights(mid).tsMs <= l.tsMs) lo = mid + 1 else hi = mid
        }
        val m = if (lo > 0) Some(allRights(lo - 1)) else None
        StreamAsOfJoined(key, l.eventId, new Timestamp(l.tsMs),
          m.map(_.errorId), m.map(r => new Timestamp(r.tsMs)), m.map(_.value))
      }.toArray
      if (ready.nonEmpty) {
        lefts.clear()
        if (pending.nonEmpty) lefts.put(pending)
      }
      // dominance prune: of the rights at-or-before the watermark only the
      // latest can ever match again (every unreleased left is later than
      // the watermark); rights beyond the watermark all stay
      val cut = allRights.lastIndexWhere(_.tsMs <= wm)
      if (cut > 0) { // index 0 with cut==0 is already minimal
        val keep = allRights.drop(cut) // keeps the latest <= wm + all > wm
        rights.clear()
        if (keep.nonEmpty) rights.put(keep)
      }
      out.iterator
    }
  }

  /** Public API: backward as-of enrichment of a purchase stream with the
    * latest error per user — the streaming twin of the batch
    * `asof_last_error` query ([[graft.plans.AsOf.backward]]), so the spec
    * can assert stream ≡ batch on identical data.
    *
    * @param purchases streaming DataFrame with (event_id, user_id, ts)
    * @param errors    streaming DataFrame with (error_id, user_id, ts, value)
    * @param watermark event-time watermark delay for BOTH sides (the union
    *                  takes the min of the two source watermarks)
    */
  def asOfEnrichStreams(purchases: DataFrame, errors: DataFrame,
                        watermark: String = "10 minutes"): Dataset[StreamAsOfJoined] = {
    val spark = purchases.sparkSession
    import spark.implicits._
    val l = purchases.select(
      col("user_id").cast("long").as("userId"), lit(true).as("isLeft"),
      col("event_id").cast("long").as("id"), col("ts"),
      lit(0.0).as("value"))
      .withWatermark("ts", watermark)
    val r = errors.select(
      col("user_id").cast("long").as("userId"), lit(false).as("isLeft"),
      col("error_id").cast("long").as("id"), col("ts"),
      col("value").cast("double").as("value"))
      .withWatermark("ts", watermark)
    l.unionByName(r).as[AsOfStreamEvent]
      .groupByKey(_.userId)
      .transformWithState(new StreamAsOfProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
