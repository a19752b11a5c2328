package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

import java.nio.file.{Files, Path, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** One data file of a snapshot; `path` is relative to the table root.
  * `schemaId` records the schema the file was WRITTEN with, so readers can
  * align old (narrower) files to the current schema — the lake-side analog of
  * the reference re-fetching the table schema on DDL and re-projecting
  * (reference: global/rule.go:295-343 AfterUpdateTableInfo).
  *
  * `kind`: "base" (fully resolved rows) or "delta" (merge-on-read row-version
  * file appended by a MERGE commit; the read path resolves LWW across
  * base+delta per key, compaction folds deltas back into base).
  *
  * `del`: file holds only tombstone rows (deletes are written to separate
  * files so live-only reads prune them at the manifest and per-bucket
  * upsert/delete lineage comes from footer row counts, no extra scan).
  * `maxPos`: footer max of the applied-pos column (per-bucket applied-offset
  * watermark, also scan-pruning input).
  */
final case class FileEntry(bucket: Int, path: String, rows: Long, schemaId: Int,
    kind: String = "base", del: Boolean = false, maxPos: Long = -1L)

/** Per-commit, per-bucket lineage record — the analog of the reference's
  * Prometheus insert/update/delete counters and position gauge
  * (reference: metrics/metrics.go:145-223), persisted INSIDE the table
  * metadata so it survives failover and is queryable as a DataFrame.
  * `replayed` (events at-or-below the previous applied offset) is tracked
  * per COMMIT (see [[CommitInfo.replayed]]); per-bucket counters come free
  * from file footers.
  */
final case class LineageEntry(epoch: Long, bucket: Int, upserted: Long,
    deleted: Long, appliedOffset: Long)

final case class CommitInfo(version: Int, epoch: Long, offset: Long,
    tsMillis: Long, operation: String, replayed: Long = 0L)

/** Versioned table metadata. The pair (lastEpoch, lastOffset) is the
  * exactly-once fence: it is committed ATOMICALLY with the snapshot that
  * contains the batch's rows, upgrading the reference's save-position-after-
  * consume at-least-once protocol (reference: service/handler.go:173-191,
  * storage/bolt_position_storage.go:48-57) to exactly-once table state.
  */
final case class TableMeta(
    version: Int,
    schemaId: Int,
    schemas: Map[String, String], // schemaId → StructType.json
    keyCols: List[String],
    bucketCols: List[String],
    numBuckets: Int,
    lastEpoch: Long,
    lastOffset: Long,
    files: List[FileEntry],
    lineage: List[LineageEntry],
    history: List[CommitInfo]) {
  def schema: StructType =
    DataType.fromJson(schemas(schemaId.toString)).asInstanceOf[StructType]
  def schemaFor(id: Int): StructType =
    DataType.fromJson(schemas(id.toString)).asInstanceOf[StructType]
}

/** Minimal snapshot-table format ("LakeTable") with the lake properties the
  * north rule exercises: atomic snapshot commits, epoch/offset fencing,
  * schema evolution (add-column, type-widen), hash-bucketed parquet data
  * files, a time-travelable version list, and embedded per-partition lineage.
  *
  * Layout:
  * {{{
  *   <root>/meta/v00000001.json     — one JSON per version; latest = max N
  *   <root>/data/<commit-uuid>/_bucket=<b>/part-*.parquet
  * }}}
  *
  * Commits stage the JSON to a temp file and atomically rename it into
  * place; the reader takes the highest version present. Same-directory
  * rename is atomic on local/HDFS filesystems (object stores would need a
  * conditional-put — documented caveat, SURVEY.md §7.5).
  */
final class LakeTable private (val root: Path, val spark: SparkSession) {
  @volatile private var metaCache: TableMeta = LakeTable.readLatestMeta(root)

  def meta: TableMeta = metaCache
  def refresh(): TableMeta = { metaCache = LakeTable.readLatestMeta(root); metaCache }

  /** Hidden per-row version column: the change-log position last applied to
    * the row. Drives cross-batch last-writer-wins under replay.
    */
  val PosCol = "_graft_pos"

  /** Hidden tombstone flag: deletes are persisted as tombstone rows (key +
    * pos + del=true) so a replayed OLDER insert of the same key still loses
    * the LWW race after the live row is gone. (The reference never needs
    * this: its replay is always a contiguous suffix from the saved position,
    * service/handler.go:173-191; a parallel engine tolerating arbitrary span
    * replay must keep the high-water mark per deleted key.) Compaction may GC
    * tombstones below the globally-applied offset watermark.
    */
  val DelCol = "_graft_del"

  def bucketExpr(numBuckets: Int, bucketCols: Seq[String]) =
    pmod(abs(xxhash64(bucketCols.map(col): _*)), lit(numBuckets)).cast("int")

  /** Current snapshot as a DataFrame (live rows, row columns only);
    * pure-base tombstone files are pruned at the manifest without a scan.
    */
  def snapshot(): DataFrame =
    snapshotForBuckets(null, includeBaseTombstones = false)
      .where(!col(DelCol)).drop(PosCol, DelCol)

  /** Resolved snapshot including hidden [[PosCol]]/[[DelCol]] and tombstones:
    * merge-on-read resolution — buckets that carry delta files get a per-key
    * LWW reduce (greatest (pos, del-rank) wins); pure-base buckets stream
    * through untouched (no shuffle).
    */
  def snapshotWithMeta(): DataFrame = snapshotForBuckets(null)

  /** Resolved snapshot restricted to the given buckets (null = all) —
    * partition pruning via the file manifest.
    */
  def snapshotForBuckets(buckets: Set[Int],
      includeBaseTombstones: Boolean = true): DataFrame = {
    val m = meta
    val files = if (buckets == null) m.files
      else m.files.filter(f => buckets.contains(f.bucket))
    val deltaBuckets = files.filter(_.kind == "delta").map(_.bucket).toSet
    val (unresolved, pure) = files.partition(f => deltaBuckets.contains(f.bucket))
    // pure-base buckets need no LWW resolve; for LIVE reads their tombstone
    // files can additionally be pruned at the manifest (no scan at all) —
    // merge-side reads must keep them (anti-resurrection)
    val pureDf = readAligned(
      if (includeBaseTombstones) pure else pure.filterNot(_.del))
    if (unresolved.isEmpty) pureDf
    else pureDf.unionAll(resolveLww(readAligned(unresolved)))
  }

  /** Per-key LWW over base+delta rows: winner = greatest (applied pos,
    * tombstone-rank). Same total order as the merge path.
    */
  def resolveLww(df: DataFrame): DataFrame = {
    val all = struct(df.columns.map(col): _*)
    val ord = struct(col(PosCol), col(DelCol).cast("int"))
    df.groupBy(meta.keyCols.map(col): _*)
      .agg(max_by(all, ord).as("_w")).select(col("_w.*"))
  }

  /** Read data files, aligning every historic schemaId to the CURRENT schema:
    * missing columns → null, narrower types → cast (int→long etc.). Grouped
    * by schemaId so each parquet scan uses exactly the schema its footers
    * carry — no reliance on reader-side type promotion.
    */
  private def readAligned(files: Seq[FileEntry]): DataFrame = {
    val m = meta
    val cur = m.schema
    val target = cur.fields.map(f => (f.name, f.dataType))
    if (files.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(cur.fields ++ Seq(StructField(PosCol, LongType),
          StructField(DelCol, BooleanType))))
    }
    // group by (written schema, tombstone flag): each scan uses exactly the
    // schema its footers carry; the del flag re-attaches from the manifest
    files.groupBy(f => (f.schemaId, f.del)).map { case ((sid, del), group) =>
      val stored = StructType(m.schemaFor(sid).fields :+ StructField(PosCol, LongType))
      val storedNames = stored.fieldNames.toSet
      val paths = group.map(f => root.resolve(f.path).toString)
      spark.read.schema(stored).parquet(paths: _*)
        .select((target.map { case (n, dt) =>
          if (storedNames.contains(n)) col(n).cast(dt).as(n)
          else lit(null).cast(dt).as(n)
        } ++ Seq(col(PosCol), lit(del).as(DelCol))): _*)
    }.reduce(_ unionAll _)
  }

  /** Lineage as a queryable DataFrame (C5 analog: the reference's web-admin
    * metrics read path, web/router.go:64-126, as a table instead of gauges).
    */
  def lineage(): DataFrame = {
    import spark.implicits._
    meta.lineage.toDF()
  }

  /** List all snapshot versions currently on disk (time-travel index). */
  def versions(): Seq[Int] = LakeTable.listVersions(root)

  /** Time travel: the live snapshot as of table version `v`. Data files are
    * immutable and only vacuum removes them, so any retained version is
    * reconstructible from its metadata JSON alone.
    */
  def snapshotAt(v: Int): DataFrame = {
    val saved = LakeTable.readMetaVersion(root, v)
    val cur = metaCache
    metaCache = saved
    try snapshot() finally { metaCache = cur }
  }

  /** Vacuum: delete metadata versions older than the newest `keepVersions`
    * and any data file no retained version references. Time travel keeps
    * working for retained versions; this is the maintenance op that bounds
    * storage at a 10^10-event scale (delta/compaction commits strand old
    * files by design — COW semantics never delete eagerly).
    */
  def vacuum(keepVersions: Int = 2): (Int, Int) = synchronized {
    val all = versions()
    val (drop, keep) = all.splitAt(math.max(0, all.size - math.max(1, keepVersions)))
    val referenced = keep.map(v => LakeTable.readMetaVersion(root, v))
      .flatMap(_.files.map(_.path)).toSet
    var removedFiles = 0
    if (Files.isDirectory(dataDir)) {
      val w1 = Files.walk(dataDir)
      try w1.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
        .filterNot(p => referenced.contains(root.relativize(p).toString))
        .foreach { p => Files.deleteIfExists(p); removedFiles += 1 }
      finally w1.close()
      // prune emptied commit directories
      val w2 = Files.walk(dataDir)
      val dirs = try w2.iterator().asScala.toSeq.reverse finally w2.close()
      dirs.filter(p => Files.isDirectory(p) && p != dataDir)
        .foreach { p =>
          val it = Files.list(p)
          val empty = try !it.iterator().hasNext finally it.close()
          if (empty) Files.deleteIfExists(p)
        }
    }
    drop.foreach(v => Files.deleteIfExists(root.resolve("meta").resolve(f"v$v%08d.json")))
    (drop.size, removedFiles)
  }

  /** Evolve the table schema in place (metadata-only commit; no data rewrite —
    * old files are aligned at read time). Only compatible evolutions are
    * allowed: add nullable column, widen int→long / float→double.
    */
  def evolveSchema(newSchemaId: Int, newSchema: StructType): Unit = synchronized {
    if (newSchemaId <= refresh().schemaId) return
    commitAtomic { m =>
      LakeTable.checkCompatible(m.schema, newSchema)
      m.copy(
        version = m.version + 1,
        schemaId = newSchemaId,
        schemas = m.schemas + (newSchemaId.toString -> newSchema.json),
        history = m.history :+ CommitInfo(m.version + 1, m.lastEpoch, m.lastOffset,
          System.currentTimeMillis(), s"evolve-schema:$newSchemaId"))
    }
  }

  /** Build-and-commit against the LATEST snapshot under the table monitor —
    * the in-process half of optimistic concurrency (the ingest thread and
    * the async compactor both commit through here; `build` must rebase its
    * changes onto whatever `latest` holds). Cross-process atomicity comes
    * from the version-named rename in [[commitMeta]].
    */
  def commitAtomic(build: TableMeta => TableMeta): TableMeta = synchronized {
    val latest = refresh()
    val next = build(latest)
    commitMeta(next)
    next
  }

  /** Atomically publish a new snapshot. Caller stages data files first. */
  def commitMeta(next: TableMeta): Unit = synchronized {
    val latest = LakeTable.readLatestMeta(root)
    require(next.version == latest.version + 1,
      s"concurrent commit: expected v${latest.version + 1}, table at v${latest.version}")
    LakeTable.writeMeta(root, next)
    metaCache = next
  }

  def dataDir: Path = root.resolve("data")
}

object LakeTable {
  implicit val fmts: Formats = DefaultFormats

  def create(spark: SparkSession, dir: String, schema: StructType,
      keyCols: Seq[String], bucketCols: Seq[String], numBuckets: Int,
      schemaId: Int = 0): LakeTable = {
    val root = Paths.get(dir)
    Files.createDirectories(root.resolve("meta"))
    Files.createDirectories(root.resolve("data"))
    val meta = TableMeta(
      version = 1, schemaId = schemaId,
      schemas = Map(schemaId.toString -> schema.json),
      keyCols = keyCols.toList, bucketCols = bucketCols.toList,
      numBuckets = numBuckets,
      // MinValue so the bootstrap epoch (-1) and stream epochs (0..) both
      // pass the fence on a fresh table.
      lastEpoch = Long.MinValue, lastOffset = -1L,
      files = Nil, lineage = Nil,
      history = List(CommitInfo(1, Long.MinValue, -1L, System.currentTimeMillis(), "create")))
    writeMeta(root, meta)
    new LakeTable(root, spark)
  }

  def load(spark: SparkSession, dir: String): LakeTable =
    new LakeTable(Paths.get(dir), spark)

  def exists(dir: String): Boolean = {
    val metaDir = Paths.get(dir).resolve("meta")
    if (!Files.isDirectory(metaDir)) return false
    val s = Files.list(metaDir)
    try s.iterator().asScala.exists(_.getFileName.toString.matches("v\\d{8}\\.json"))
    finally s.close()
  }

  private[lake] def listVersions(root: Path): Seq[Int] = {
    val metaDir = root.resolve("meta")
    val s = Files.list(metaDir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .collect { case n if n.matches("v\\d{8}\\.json") => n.stripPrefix("v").stripSuffix(".json").toInt }
      .toSeq.sorted
    finally s.close()
  }

  private[lake] def readMetaVersion(root: Path, v: Int): TableMeta = {
    val json = new String(Files.readAllBytes(
      root.resolve("meta").resolve(f"v$v%08d.json")), "UTF-8")
    Serialization.read[TableMeta](json)
  }

  private[lake] def readLatestMeta(root: Path): TableMeta = {
    val vs = listVersions(root)
    require(vs.nonEmpty, s"no table at $root")
    readMetaVersion(root, vs.last)
  }

  private[lake] def writeMeta(root: Path, meta: TableMeta): Unit = {
    val metaDir = root.resolve("meta")
    val tmp = metaDir.resolve(f".v${meta.version}%08d.json.tmp")
    val dest = metaDir.resolve(f"v${meta.version}%08d.json")
    Files.write(tmp, Serialization.write(meta).getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(s"concurrent commit of v${meta.version}")
    }
  }

  /** Compatible = every existing column survives with the same or a wider
    * type; new columns must be nullable.
    */
  def checkCompatible(oldS: StructType, newS: StructType): Unit = {
    val newFields = newS.fields.map(f => f.name -> f).toMap
    oldS.fields.foreach { of =>
      val nf = newFields.getOrElse(of.name,
        throw new IllegalArgumentException(s"schema evolution drops column ${of.name}"))
      val ok = of.dataType == nf.dataType || ((of.dataType, nf.dataType) match {
        case (IntegerType, LongType) | (FloatType, DoubleType) |
             (ShortType, IntegerType) | (ShortType, LongType) => true
        case _ => false
      })
      require(ok, s"incompatible evolution for ${of.name}: ${of.dataType} → ${nf.dataType}")
    }
    newS.fields.filterNot(f => oldS.fieldNames.contains(f.name)).foreach { f =>
      require(f.nullable, s"new column ${f.name} must be nullable")
    }
  }
}
