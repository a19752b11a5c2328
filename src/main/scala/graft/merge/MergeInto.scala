package graft.merge

import graft.core.Types
import graft.lake.{FileEntry, LakeTable, LineageEntry, CommitInfo}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import java.nio.file.{Files, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

final case class MergeResult(epoch: Long, skipped: Boolean,
    upserted: Long, deleted: Long, replayed: Long, touchedBuckets: Int)

/** Key-partitioned MERGE INTO with last-writer-wins resolution — the
  * canonical apply shape of the reference's sinks (insert→put, update→set,
  * delete→remove, upsert on replay; reference:
  * service/endpoint/mongo.go:144-191, redis.go:225-268,
  * elastic7.go:292-306) expressed as one idempotent copy-on-write merge.
  *
  * Semantics (== the reference's single-threaded in-order apply,
  * service/handler.go:135-194, made explicit for a parallel engine):
  *   - within a batch, for each key only the event with the greatest
  *     (pos, ts, op-rank) survives (LWW; total order per SURVEY.md §7.5);
  *   - vs the existing table, the greater of (existing row's applied pos,
  *     batch event pos) wins — so replayed duplicate spans are no-ops;
  *   - insert and update both UPSERT (reference Lua mongo UPSERT,
  *     mongo.go:144-153); delete removes; delete-of-absent is tolerated
  *     (reference: elastic7.go:230-233 not_found ignored).
  *
  * Scale design (100 TB / 1000 executors):
  *   - the batch side is shuffled ONCE (partial-aggregated `max_by` groupBy:
  *     map-side combine collapses per-key duplicates before the exchange, so
  *     hot-conversation skew cannot overload a reducer; an optional salted
  *     two-phase dedup bounds pathological single-key floods);
  *   - the TABLE side never shuffles: touched buckets are found from the
  *     (small) deduped batch, only those buckets' files are read (partition
  *     pruning via the file manifest), and matched/unmatched splitting uses
  *     broadcast semi/anti hash joins of the batch KEY SET — the scan streams
  *     straight back to parquet with no exchange;
  *   - copy-on-write rewrites only touched buckets; write amplification is
  *     bounded by `numBuckets` (raise it with table size).
  */
object MergeInto {
  import Types._

  /** Broadcast the batch key set below this many deduped rows. */
  val BroadcastKeyLimit = 4000000L

  /** LWW ordering: (pos, event ts with null→epoch-0, op rank). */
  private def ordCol: Column = struct(
    col("_pos"),
    coalesce(col("_event_ts"), lit(0L).cast("timestamp")),
    when(col("_op") === OpDelete, 2).when(col("_op") === OpUpdate, 1).otherwise(0))

  /** Keep exactly one event per key: the LWW winner. `salt` > 1 enables the
    * two-phase salted reduction (phase 1 per (key, salt), phase 2 per key)
    * for pathological single-key floods; with partial aggregation the default
    * single phase already combines map-side (SURVEY.md §7.5 skew note).
    */
  def lwwDedup(df: DataFrame, keyCols: Seq[String], salt: Int = 0): DataFrame = {
    val phase1 =
      if (salt > 1) {
        val salted = df.withColumn("_salt", pmod(xxhash64(col("_pos")), lit(salt)))
        val allS = struct(df.columns.map(col): _*)
        salted.groupBy((keyCols :+ "_salt").map(col): _*)
          .agg(max_by(allS, ordCol).as("_w")).select(col("_w.*"))
      } else df
    val all2 = struct(phase1.columns.filterNot(_ == "_salt").map(col): _*)
    phase1.groupBy(keyCols.map(col): _*)
      .agg(max_by(all2, ordCol).as("_w")).select(col("_w.*"))
  }

  /** Merge one micro-batch (decoded merge-input layout: `_op,_pos,_event_ts`
    * + row columns of the table's CURRENT schema) into `table`, committing
    * `(epoch, maxPos)` atomically with the snapshot. Replayed epochs
    * (epoch <= table.lastEpoch) are fenced to no-ops — exactly-once table
    * state even when Structured Streaming re-runs a batch after a crash.
    */
  def merge(table: LakeTable, batch: DataFrame, epoch: Long, salt: Int = 0): MergeResult = {
    val m = table.refresh()
    if (epoch <= m.lastEpoch)
      return MergeResult(epoch, skipped = true, 0, 0, 0, 0)

    val spark = table.spark
    val keyCols = m.keyCols
    val rowCols = m.schema.fieldNames.toSeq
    val bucket = table.bucketExpr(m.numBuckets, m.bucketCols)

    val dedup = lwwDedup(batch, keyCols, salt)
      .withColumn("_bucket", bucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // Per-bucket batch stats: drives lineage + broadcast decision; tiny
      // (≤ numBuckets rows).
      val stats = dedup.groupBy("_bucket").agg(
        count(lit(1)).as("n"),
        sum(when(col("_op") === OpDelete, 1L).otherwise(0L)).as("dels"),
        max(col("_pos")).as("maxPos"),
        sum(when(col("_pos") <= m.lastOffset, 1L).otherwise(0L)).as("replays")
      ).collect()

      if (stats.isEmpty) { // empty batch: advance the fence only
        table.commitMeta(m.copy(version = m.version + 1, lastEpoch = epoch,
          history = m.history :+ CommitInfo(m.version + 1, epoch, m.lastOffset,
            System.currentTimeMillis(), "merge-empty")))
        return MergeResult(epoch, skipped = false, 0, 0, 0, 0)
      }

      val touched = stats.map(_.getInt(0)).toSet
      val nDedup = stats.map(_.getLong(1)).sum
      val nDeletes = stats.map(_.getLong(2)).sum
      val maxPos = stats.map(_.getLong(3)).max
      val nReplays = stats.map(_.getLong(4)).sum

      val keysOnly = dedup.select(keyCols.map(col): _*)
      val keySet = if (nDedup <= BroadcastKeyLimit) broadcast(keysOnly) else keysOnly

      val existing = table.snapshotForBuckets(touched) // rowCols + PosCol + DelCol
      val unmatched = existing.join(keySet, keyCols, "left_anti")

      // Matched existing rows (live or tombstone) re-enter LWW as events at
      // their applied pos: a replayed (old-pos) batch event loses; a
      // genuinely newer one wins. Tombstones compete as deletes so a replayed
      // old insert cannot resurrect a deleted key.
      val matchedAsEvents = existing.join(keySet, keyCols, "left_semi")
        .withColumn("_op",
          when(col(table.DelCol), lit(OpDelete)).otherwise(lit(OpInsert)))
        .withColumn("_event_ts", lit(null).cast("timestamp"))
        .withColumnRenamed(table.PosCol, "_pos")
        .select((Seq("_op", "_pos", "_event_ts") ++ rowCols).map(col): _*)

      // Delete winners are WRITTEN as tombstone rows (key + pos, payload
      // nulled); snapshot() filters them, compaction may GC them once below
      // the global applied-offset watermark.
      val winners = lwwDedup(
        matchedAsEvents.unionByName(dedup.drop("_bucket")), keyCols)
      val isDel = col("_op") === OpDelete
      val upserts = winners.select(
        (rowCols.map(c =>
          (if (keyCols.contains(c)) col(c) else when(isDel, lit(null)).otherwise(col(c))).as(c))
          :+ col("_pos").as(table.PosCol) :+ isDel.as(table.DelCol)): _*)

      // Partition-dir column deliberately NOT underscore-prefixed: Hadoop
      // path filters treat `_*` entries as hidden.
      val finalRows = unmatched.unionByName(upserts)
        .withColumn("bkt", bucket)

      // Stage the rewritten buckets under a fresh commit dir; one shuffle of
      // the touched buckets only, files split per bucket by partitionBy.
      val commitId = UUID.randomUUID().toString.take(12)
      val commitRel = s"data/$commitId"
      val commitDir = table.root.resolve(commitRel)
      finalRows
        .repartition(math.max(touched.size, 1), col("bkt"))
        .write.partitionBy("bkt").parquet(commitDir.toString)

      val newFiles = listCommitFiles(table, commitRel, m.schemaId)
      val keptFiles = m.files.filterNot(f => touched.contains(f.bucket))
      val rowsPerBucket = newFiles.groupBy(_.bucket).view.mapValues(_.map(_.rows).sum)
      val lineage = stats.map { r =>
        LineageEntry(epoch, r.getInt(0), upserted = r.getLong(1) - r.getLong(2),
          deleted = r.getLong(2), appliedOffset = r.getLong(3), replayed = r.getLong(4))
      }

      table.commitMeta(m.copy(
        version = m.version + 1,
        lastEpoch = epoch,
        lastOffset = math.max(m.lastOffset, maxPos),
        files = (keptFiles ++ newFiles).sortBy(f => (f.bucket, f.path)),
        lineage = (m.lineage ++ lineage).takeRight(100000),
        history = m.history :+ CommitInfo(m.version + 1, epoch, maxPos,
          System.currentTimeMillis(), s"merge:buckets=${touched.size}:rows=$nDedup")))

      MergeResult(epoch, skipped = false,
        upserted = nDedup - nDeletes, deleted = nDeletes,
        replayed = nReplays, touchedBuckets = touched.size)
    } finally dedup.unpersist()
  }

  /** Enumerate staged files with row counts from parquet footers —
    * metadata-only, no data re-scan.
    */
  private def listCommitFiles(table: LakeTable, commitRel: String,
      schemaId: Int): List[FileEntry] = {
    val conf = table.spark.sessionState.newHadoopConf()
    val commitDir = table.root.resolve(commitRel)
    if (!Files.isDirectory(commitDir)) return Nil
    Files.list(commitDir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("bkt="))
      .flatMap { bdir =>
        val b = bdir.getFileName.toString.stripPrefix("bkt=").toInt
        Files.list(bdir).iterator().asScala
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map { f =>
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new HPath(f.toUri), conf))
            val rows = try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
            finally reader.close()
            FileEntry(b, table.root.relativize(f).toString, rows, schemaId)
          }
      }.toList
  }
}
