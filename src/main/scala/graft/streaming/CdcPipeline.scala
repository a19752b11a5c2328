package graft.streaming

import graft.changelog.ChangelogCodec
import graft.core.Types
import graft.lake.LakeTable
import graft.merge.{MergeInto, MergeResult}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The incremental-sync run (reference lifecycle §3.1 of SURVEY.md):
  * change-log tail → decode → micro-batch → idempotent MERGE → atomic
  * commit, resumable from checkpoint.
  *
  * Mapping to the reference:
  *  - canal.RunFrom(position) tail (transfer_service.go:106-134)
  *      → `readStream` file source over the changelog dir; offsets live in
  *        the checkpoint, the applied (epoch, pos) fence lives in the table.
  *  - size/time flush (handler.go:135-194, bulk_size/flush_bulk_interval)
  *      → `maxFilesPerTrigger` + processing-time trigger.
  *  - save position after Consume (handler.go:173-191)
  *      → the MERGE commit embeds (epoch, offset); a crash between sink
  *        write and checkpoint save replays the batch, which the fence
  *        no-ops — exactly-once table state instead of at-least-once.
  *  - OnTableChanged schema refresh (handler.go:56-62)
  *      → schema_id watermark per batch drives `evolveSchema` before decode.
  */
object CdcPipeline {

  final case class Config(
      changelogDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Int = 4,
      triggerMs: Long = 200L, // reference default flush_bulk_interval=200ms
      saltedDedup: Int = 0,
      mergeMode: String = "mor", // mor = O(batch) commits; cow = resolved buckets
      // fold deltas into base when deltaRows ≥ ratio × baseRows (and ≥ minRows)
      autoCompactRatio: Double = 4.0,
      autoCompactMinRows: Long = 200000L,
      registry: Map[Int, StructType] = Types.transcriptSchemas)

  /** Apply one micro-batch of wire-form events. Exposed for tests and the
    * batch replayer.
    */
  private val debugTiming = sys.env.contains("GRAFT_TIMING")
  private def timed[T](tag: String)(f: => T): T = {
    if (!debugTiming) f
    else {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[timing] $tag ${(System.nanoTime() - t0) / 1e9}%.3fs " +
        f"(at ${System.currentTimeMillis() % 1000000}ms)")
      r
    }
  }

  def applyBatch(table: LakeTable, wire: DataFrame, epoch: Long,
      cfg: Config): MergeResult = timed(s"applyBatch($epoch)") {
    val m = table.refresh()
    if (epoch <= m.lastEpoch) // fence before doing any work on replay
      return MergeResult(epoch, skipped = true, 0, 0, 0, 0)

    // Decode against the newest registry schema (a superset — older events
    // parse with nulls/wide types); the per-event _schema_id watermark rides
    // into the merge stats and drives in-flight table evolution there
    // (OnTableChanged analog) with no extra scan of the batch.
    val newestSid = cfg.registry.keys.max
    val decoded = ChangelogCodec.decode(wire, cfg.registry(newestSid))
    val res = timed("merge")(
      MergeInto.merge(table, decoded, epoch, cfg.saltedDedup, cfg.mergeMode,
        cfg.registry, batchSchemaId = newestSid))

    // MOR maintenance: async amortized compaction keeps read-side resolve
    // bounded without blocking ingest (rebase-safe vs concurrent merges).
    MergeInto.maybeCompactAsync(table, cfg.autoCompactRatio, cfg.autoCompactMinRows)
    res
  }

  /** Start the continuous streaming query. */
  def start(spark: SparkSession, table: LakeTable, cfg: Config,
      availableNow: Boolean = false): StreamingQuery = {
    val wire = spark.readStream
      .schema(Types.changeEventWireSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.changelogDir)
    val writer = wire.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(table, df, batchId, cfg); ()
      }
    val triggered =
      if (availableNow) writer.trigger(Trigger.AvailableNow())
      else writer.trigger(Trigger.ProcessingTime(cfg.triggerMs))
    triggered.start()
  }

  /** Drain everything currently in the changelog and stop (the test/bench
    * entry): AvailableNow respects maxFilesPerTrigger, so the run still
    * exercises the micro-batch + fence + commit path per chunk.
    */
  def runToCompletion(spark: SparkSession, table: LakeTable, cfg: Config): Unit = {
    val q = start(spark, table, cfg, availableNow = true)
    q.awaitTermination()
  }
}
