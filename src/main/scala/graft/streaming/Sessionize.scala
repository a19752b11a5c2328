package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization + watermarked windowed aggregation over the
  * change stream — the stateful-streaming surface of the engine (the
  * reference has no analog; this is the training-data-pipeline shape for
  * multi-turn transcripts: close a conversation after `gap` of silence and
  * emit one summary row per session).
  *
  * Two implementations with IDENTICAL semantics, each Spark-first for its
  * mode:
  *
  *  - [[sessions]] (batch): pure window functions — `lag` marks session
  *    breaks, a running sum labels sessions, one `groupBy` summarizes. All
  *    codegen'd, one shuffle on the key, no UDFs, no state store; the shape
  *    that scales to a 100 TB backfill.
  *  - [[streamingSessions]] (streaming): `flatMapGroupsWithState` with an
  *    event-time timeout — per-key state is one (start, last, n) triple,
  *    sessions emit exactly once when the watermark passes `last + gap`.
  *    Incremental state is the thing the batch plan cannot express on an
  *    unbounded stream.
  *
  * StreamingExtrasSpec asserts streamed output == batch output == the
  * DuckDB oracle (q36).
  */
object Sessionize extends Serializable {

  /** One emitted session. */
  final case class Session(key: String, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long)

  /** Keyed event for the streaming path. */
  final case class KeyedEvent(key: String, ts: java.sql.Timestamp)

  /** Internal per-key streaming state (public: the state encoder's codegen
    * must reach the constructor).
    */
  final case class SessState(startUs: Long, lastUs: Long, n: Long)

  /** Epoch micros ↔ Timestamp, exact (Timestamp.getTime alone floors to ms). */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000
  private def toTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000L))
    t.setNanos((Math.floorMod(us, 1000000L) * 1000).toInt)
    t
  }

  /** Batch sessionization: rows of `df` keyed by `keyCol`, ordered by
    * `tsCol`; a new session starts when the gap from the previous row
    * exceeds `gapSec`. Ties in `tsCol` are order-independent (break flags
    * derive from values; the running sum uses the default RANGE frame, so
    * equal timestamps share a session label).
    */
  def sessions(df: DataFrame, keyCol: String, tsCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(tsCol)
    // microsecond-exact gap (unix_timestamp would floor to seconds and
    // misclassify gaps straddling the threshold); the cast lets NTZ columns
    // in (sessions run in a UTC session, so the instant is value-preserving)
    val tsc = col(tsCol).cast("timestamp")
    val gap = unix_micros(tsc) - unix_micros(lag(tsc, 1).over(w))
    df.select(col(keyCol), col(tsCol))
      .withColumn("_brk", when(gap.isNull || gap > gapSec * 1000000L, 1L).otherwise(0L))
      .withColumn("_sess", sum("_brk").over(w))
      .groupBy(col(keyCol), col("_sess"))
      .agg(min(tsCol).as("session_start"), max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("_sess")
  }

  /** Streaming sessionization. Input must carry the watermark (the caller
    * sets `withWatermark` on the ts column before `as[KeyedEvent]`); each
    * session emits once, when the watermark passes its end + gap. Events
    * inside one micro-batch are sorted by ts before folding, so in-batch
    * disorder is free; cross-batch disorder is bounded by the watermark
    * delay, as usual.
    */
  def streamingSessions(ds: Dataset[KeyedEvent], gapSec: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val gapUs = gapSec * 1000000L

    def fold(key: String, rows: Iterator[KeyedEvent],
        state: GroupState[SessState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      def emit(s: SessState): Unit =
        out += Session(key, toTs(s.startUs), toTs(s.lastUs), s.n)
      if (state.hasTimedOut) {
        state.getOption.foreach(emit)
        state.remove()
      } else {
        var cur = state.getOption.orNull
        rows.map(e => micros(e.ts)).toArray.sorted.foreach { t =>
          cur match {
            case null => cur = SessState(t, t, 1)
            case s if t - s.lastUs > gapUs => emit(s); cur = SessState(t, t, 1)
            case s => cur = SessState(s.startUs, math.max(s.lastUs, t), s.n + 1)
          }
        }
        if (cur != null) {
          state.update(cur)
          // ms-granular timeout, rounded up so a micro-remainder cannot
          // close the session one watermark tick early; clamped above the
          // current watermark — FMGWS does NOT drop late rows for us, and a
          // session revived by a late event would otherwise set a timeout in
          // the past (an error). Clamping closes it at the next advance.
          state.setTimeoutTimestamp(math.max(
            Math.floorDiv(cur.lastUs + gapUs, 1000L) + 1,
            state.getCurrentWatermarkMs() + 1))
        }
      }
      out.iterator
    }

    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Watermarked per-window throughput over the change stream: events per
    * (`windowDur`, dimension column). Works identically as a batch plan
    * (the watermark is a no-op there) — q35's oracle recomputes it with
    * date_trunc. Partial aggregation is map-side; the single shuffle is on
    * (window, dim).
    */
  def windowedRate(events: DataFrame, tsCol: String, dimCol: String,
      windowDur: String = "1 minute", watermarkDelay: String = "10 minutes"): DataFrame = {
    val isStreaming = events.isStreaming
    val src = if (isStreaming) events.withWatermark(tsCol, watermarkDelay) else events
    src.groupBy(window(col(tsCol), windowDur).as("w"), col(dimCol))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col(dimCol), col("n"))
  }
}
