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
  *    event-time timeout — per-key state is a list of disjoint provisional
  *    sessions (each pair separated by more than the gap), and a session
  *    emits exactly once, only when the WATERMARK passes its end + gap.
  *    Nothing seals on an observed in-stream gap: an out-of-order event
  *    still inside the watermark delay can bridge or extend any provisional
  *    session, exactly as the batch plan would place it. Rows older than
  *    the current watermark are dropped (the same contract as Spark's
  *    windowed aggregations — FMGWS does not drop them for us). Incremental
  *    state is the thing the batch plan cannot express on an unbounded
  *    stream.
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
    * must reach the constructors): disjoint provisional sessions, sorted by
    * start, adjacent pairs separated by more than the gap.
    */
  final case class SessState(startUs: Long, lastUs: Long, n: Long)
  final case class SessList(sessions: Seq[SessState])

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
    * sets `withWatermark` on the ts column before `as[KeyedEvent]`).
    *
    * Correctness contract vs the batch twin: sessions NEVER seal on an
    * observed gap — an event observed 2×gap ahead opens a second
    * provisional session, and a later (but not watermark-late) event can
    * still land between them and merge all three into one, exactly as the
    * batch plan would. A session is emitted only when the watermark passes
    * its end + gap, at which point no acceptable future row can extend it
    * (such a row would be older than the watermark, and those are dropped
    * on entry). So streamed output equals batch output whenever disorder is
    * within the watermark delay — the same guarantee Spark's built-in
    * windowed aggregations give.
    */
  def streamingSessions(ds: Dataset[KeyedEvent], gapSec: Long): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val gapUs = gapSec * 1000000L

    // insert t into the disjoint sorted list: it extends/bridges every
    // session within gap reach (at most two), or opens a new one
    def insert(list: List[SessState], t: Long): List[SessState] = {
      val (left, rest) = list.span(s => s.lastUs + gapUs < t)
      val (touch, right) = rest.span(s => s.startUs - gapUs <= t)
      val merged =
        if (touch.isEmpty) SessState(t, t, 1)
        else SessState(math.min(touch.head.startUs, t),
          math.max(touch.last.lastUs, t), touch.map(_.n).sum + 1)
      left ++ (merged :: right)
    }

    def fold(key: String, rows: Iterator[KeyedEvent],
        state: GroupState[SessList]): Iterator[Session] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      var sess = state.getOption.map(_.sessions.toList).getOrElse(Nil)
      if (!state.hasTimedOut) {
        // drop rows already older than the watermark (they could otherwise
        // resurrect an emitted session — FMGWS leaves late-row policy to us)
        rows.map(e => micros(e.ts)).filter(_ >= wmUs)
          .foreach(t => sess = insert(sess, t))
      }
      // emit every session the watermark has sealed: no future non-late row
      // can reach it (it would need ts <= last + gap < watermark)
      val (closed, open) = sess.partition(s => s.lastUs + gapUs < wmUs)
      if (open.nonEmpty) {
        state.update(SessList(open))
        // ms-granular timeout, rounded up (a µs remainder must not fire a
        // tick early) and clamped above the current watermark (a timeout in
        // the past is an error; clamping re-fires at the next advance)
        state.setTimeoutTimestamp(math.max(
          Math.floorDiv(open.map(_.lastUs).min + gapUs, 1000L) + 1,
          state.getCurrentWatermarkMs() + 1))
      } else state.remove()
      closed.map(s => Session(key, toTs(s.startUs), toTs(s.lastUs), s.n)).iterator
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
