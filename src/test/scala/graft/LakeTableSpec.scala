package graft

import graft.core.Types
import graft.lake.LakeTable
import graft.merge.MergeInto
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Paths}

/** Snapshot-table mechanics: versioned commits, time travel, vacuum,
  * wildcard expansion.
  */
class LakeTableSpec extends SparkSpec {
  import Types._

  private val schema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("v", StringType)))

  private def batch(rows: (String, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("_op", "_pos", "k", "v")
      .withColumn("_event_ts", lit(null).cast("timestamp"))
      .select("_op", "_pos", "_event_ts", "k", "v")
  }

  private def state(df: DataFrame): Map[String, String] =
    df.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("spark.read.format(\"graft\") facade: snapshot, time travel, prune+filter") {
    val dir = tmpDir("lt-dsv1").resolve("t").toString
    val t = LakeTable.create(spark, dir, schema, Seq("k"), Seq("k"), 4)
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1"), (OpInsert, 2L, "b", "b1")), 0)
    val v1 = t.meta.version
    MergeInto.merge(t, batch((OpUpdate, 3L, "a", "a2"), (OpDelete, 4L, "b", null)), 1)
    // external-reader surface: no LakeTable API, just the format name
    val df = spark.read.format("graft").load(dir)
    assert(state(df) == Map("a" -> "a2"))
    assert(state(df) == state(t.snapshot()))
    // time travel via option
    assert(state(spark.read.format("graft").option("version", v1.toString).load(dir)) ==
      Map("a" -> "a1", "b" -> "b1"))
    // pruned + filtered scan path (PrunedFilteredScan.buildScan)
    import spark.implicits._
    assert(df.where($"k" === "a").select("v").as[String].collect().toSeq == Seq("a2"))
    assert(df.count() == 1)
    // plain SQL, no Scala API at all
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW graft_ext USING graft OPTIONS (path '$dir')")
    assert(spark.sql("SELECT v FROM graft_ext WHERE k = 'a'").as[String].collect().toSeq
      == Seq("a2"))
    // the cached view stays FRESH: the snapshot resolves at read time, so a
    // merge landing after CREATE VIEW is visible to the next SELECT
    MergeInto.merge(t, batch((OpInsert, 5L, "c", "c1")), 2)
    assert(spark.sql("SELECT count(*) FROM graft_ext").head().getLong(0) == 2)
    intercept[IllegalArgumentException](
      spark.read.format("graft").load())
  }

  test("time travel: every version reconstructs its exact state") {
    val t = LakeTable.create(spark, tmpDir("lt-tt").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 4)
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1")), 0)
    val v1 = t.meta.version
    MergeInto.merge(t, batch((OpUpdate, 2L, "a", "a2"), (OpInsert, 3L, "b", "b1")), 1)
    val v2 = t.meta.version
    MergeInto.merge(t, batch((OpDelete, 4L, "a", null)), 2)

    assert(state(t.snapshotAt(v1)) == Map("a" -> "a1"))
    assert(state(t.snapshotAt(v2)) == Map("a" -> "a2", "b" -> "b1"))
    assert(state(t.snapshot()) == Map("b" -> "b1"))
    assert(t.versions().size >= 4) // create + 3 merges
  }

  test("vacuum drops old versions + unreferenced files; latest state intact") {
    val t = LakeTable.create(spark, tmpDir("lt-vac").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 4)
    (0 until 4).foreach(e => MergeInto.merge(t, batch((OpInsert, e.toLong, s"k$e", s"v$e")), e))
    MergeInto.compact(t) // strands all delta files
    val before = state(t.snapshot())
    val filesOnDisk = Files.walk(Paths.get(t.root.toString, "data"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(filesOnDisk > t.meta.files.size, "compaction should strand old files")

    val (droppedVersions, removedFiles) = t.vacuum(keepVersions = 1)
    assert(droppedVersions > 0 && removedFiles > 0)
    assert(t.versions().size == 1)
    t.refresh()
    assert(state(t.snapshot()) == before)
    val filesAfter = Files.walk(Paths.get(t.root.toString, "data"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    assert(filesAfter == t.meta.files.size.toLong)
  }

  test("set-offset style fence override changes replay admission") {
    val t = LakeTable.create(spark, tmpDir("lt-so").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 4)
    MergeInto.merge(t, batch((OpInsert, 5L, "a", "v5")), 3)
    // rewind the fence (the -position analog): epoch 2 becomes admissible
    t.commitAtomic(m => m.copy(version = m.version + 1, lastEpoch = 1L, lastOffset = -1L))
    val r = MergeInto.merge(t, batch((OpInsert, 6L, "b", "v6")), 2)
    assert(!r.skipped)
    assert(state(t.snapshot()) == Map("a" -> "v5", "b" -> "v6"))
  }

  test("cross-process commit atomicity: exactly one committer of a version wins") {
    val dir = tmpDir("lt-atom").resolve("t").toString
    val t1 = LakeTable.create(spark, dir, schema, Seq("k"), Seq("k"), 4)
    val t2 = LakeTable.load(spark, dir) // a second "process": separate lock + cache
    val stale = t2.meta // both believe v1 is latest
    t1.commitAtomic(m => m.copy(version = m.version + 1, lastEpoch = 0L))
    // t2 races the same version number; the hard-link create must fail it
    // (POSIX rename would have silently clobbered t1's commit — round-1 bug)
    intercept[IllegalStateException] {
      t2.commitMeta(stale, stale.copy(version = stale.version + 1, lastEpoch = 99L))
    }
    assert(t2.refresh().lastEpoch == 0L, "winner's commit must survive")
  }

  test("snapshotAt is pure: concurrent time travel never disturbs live readers") {
    val t = LakeTable.create(spark, tmpDir("lt-pure").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1")), 0)
    val v1 = t.meta.version
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reader = new Thread(() => {
      try {
        while (!stop.get()) {
          val n = t.snapshotAt(v1).count() // historic view, must always be 1 row
          if (n != 1) bad.set(s"snapshotAt($v1) saw $n rows")
        }
      } catch { case e: Throwable => bad.set(s"reader thread died: $e") }
    })
    reader.start()
    (1 to 5).foreach { e =>
      MergeInto.merge(t, batch((OpInsert, e + 1L, s"k$e", s"v$e")), e.toLong)
    }
    MergeInto.compact(t) // uses the live snapshot concurrently with time travel
    stop.set(true); reader.join()
    assert(bad.get() == null, String.valueOf(bad.get()))
    assert(state(t.snapshot()).size == 6)
  }

  test("manifest segments: delta commits are O(batch); snapshot re-anchors the chain") {
    val t = LakeTable.create(spark, tmpDir("lt-seg").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    val n = LakeTable.SnapshotEvery + 3
    (0 until n).foreach(e =>
      MergeInto.merge(t, batch((OpInsert, e.toLong, s"k$e", s"v$e")), e.toLong))
    val m = t.refresh()
    assert(m.version == n + 1)
    // a snapshot segment re-anchored the chain within the cadence
    assert(m.baseVersion > 1 && m.version - m.baseVersion < LakeTable.SnapshotEvery)
    // delta segments never serialize the full file list
    val segJson = new String(java.nio.file.Files.readAllBytes(
      t.root.resolve("meta").resolve(f"v${m.version}%08d.json")), "UTF-8")
    assert(!segJson.contains("filesFull"), "tip delta segment must not embed the manifest")
    // every historic version folds back exactly (across the anchor)
    assert(state(t.snapshotAt(2)) == Map("k0" -> "v0"))
    val mid = LakeTable.SnapshotEvery
    assert(state(t.snapshotAt(mid + 1)) ==
      (0 until mid).map(i => s"k$i" -> s"v$i").toMap)
    assert(state(t.snapshot()) == (0 until n).map(i => s"k$i" -> s"v$i").toMap)
  }

  test("vacuum never touches staged-but-uncommitted files (in-flight commits)") {
    val t = LakeTable.create(spark, tmpDir("lt-vac2").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    (0 until 3).foreach(e =>
      MergeInto.merge(t, batch((OpInsert, e.toLong, s"k$e", s"v$e")), e.toLong))
    // a concurrent merge/compaction staging its output: referenced by nothing
    val staged = t.dataDir.resolve("inflight-commit").resolve("bkt=0").resolve("del=false")
    java.nio.file.Files.createDirectories(staged)
    val f = staged.resolve("part-0.parquet")
    java.nio.file.Files.write(f, Array[Byte](1, 2, 3))
    t.vacuum(keepVersions = 1)
    assert(java.nio.file.Files.exists(f), "vacuum deleted an in-flight staged file")
    // explicit orphan reaping (crash leftovers) is opt-in via a grace window
    Thread.sleep(20)
    t.vacuum(keepVersions = 1, orphanGraceMs = 1L)
    assert(!java.nio.file.Files.exists(f))
  }

  test("orphan grace keys on the commit dir's NEWEST mtime (slow live stage safe)") {
    import java.nio.file.{Files => F}
    val t = LakeTable.create(spark, tmpDir("lt-vac3").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    MergeInto.merge(t, batch((OpInsert, 1L, "k1", "v1")), 0L)
    // a LIVE in-flight stage: its first file started long ago (mtime old),
    // but the stage is still writing (a sibling file is fresh)
    val live = t.dataDir.resolve("live-stage").resolve("bkt=0").resolve("del=false")
    F.createDirectories(live)
    val early = live.resolve("part-0.parquet")
    F.write(early, Array[Byte](1))
    F.setLastModifiedTime(early,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000L))
    val recent = live.resolve("part-1.parquet")
    F.write(recent, Array[Byte](2))
    // a genuinely ABANDONED stage: every file old
    val dead = t.dataDir.resolve("dead-stage").resolve("bkt=0").resolve("del=false")
    F.createDirectories(dead)
    val deadF = dead.resolve("part-0.parquet")
    F.write(deadF, Array[Byte](3))
    F.setLastModifiedTime(deadF,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 3600000L))
    t.vacuum(keepVersions = 1, orphanGraceMs = 60000L)
    assert(F.exists(early), "grace reaped an early file of a live in-flight stage")
    assert(F.exists(recent))
    assert(!F.exists(deadF), "abandoned stage survived the grace window")
  }

  test("refresh survives another process's vacuum cutting its cached history") {
    val dir = tmpDir("lt-xvac").resolve("t").toString
    val t1 = LakeTable.create(spark, dir, schema, Seq("k"), Seq("k"), 2)
    val t2 = LakeTable.load(spark, dir) // second "process", cache pinned at v1
    (0 until 6).foreach(e =>
      MergeInto.merge(t1, batch((OpInsert, e.toLong, s"k$e", s"v$e")), e.toLong))
    t1.vacuum(keepVersions = 1) // drops the segments t2 would fold through
    val m = t2.refresh() // must cold-reload from the new snapshot anchor
    assert(m.version == t1.meta.version)
    assert(state(t2.snapshot()) == (0 until 6).map(i => s"k$i" -> s"v$i").toMap)
  }

  test("pipeline-identity fence: foreign checkpoints cannot be silently fenced") {
    val t = LakeTable.create(spark, tmpDir("lt-pid").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1")), 0, pipelineId = "pipeA")
    MergeInto.merge(t, batch((OpInsert, 2L, "b", "b1")), 1, pipelineId = "pipeA")
    // same pipeline replaying an applied epoch → silent no-op (exactly-once)
    assert(MergeInto.merge(t, batch((OpInsert, 9L, "x", "x1")), 1,
      pipelineId = "pipeA").skipped)
    // a DIFFERENT pipeline restarting at batch 0 against the same table:
    // its events were never applied — fencing them would be data loss
    intercept[IllegalStateException] {
      MergeInto.merge(t, batch((OpInsert, 3L, "c", "c1")), 0, pipelineId = "pipeB")
    }
    // explicit operator takeover rebinds the table to the new pipeline
    val r = MergeInto.merge(t, batch((OpInsert, 3L, "c", "c1")), 0,
      pipelineId = "pipeB", allowTakeover = true)
    assert(!r.skipped)
    assert(state(t.snapshot()) == Map("a" -> "a1", "b" -> "b1", "c" -> "c1"))
    assert(t.meta.lastPipelineId == "pipeB")
    // a foreign pipeline starting PAST the fence adopts silently (the normal
    // bootstrap-then-stream handoff)
    val r2 = MergeInto.merge(t, batch((OpInsert, 4L, "d", "d1")), 5, pipelineId = "pipeC")
    assert(!r2.skipped && t.meta.lastPipelineId == "pipeC")
  }

  test("pipeline-identity fence: pid-less table + fresh pid-ful checkpoint is foreign") {
    // table written WITHOUT a pipeline id (batch CLI / replayer) up to epoch 1
    val t = LakeTable.create(spark, tmpDir("lt-pidless").resolve("t").toString,
      schema, Seq("k"), Seq("k"), 2)
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1")), 0)
    MergeInto.merge(t, batch((OpInsert, 2L, "b", "b1")), 1)
    assert(t.meta.lastPipelineId == "")
    // a NEW pid-ful pipeline with a fresh checkpoint restarts numbering at 0:
    // its batch was never applied — silently fencing it as a replay would be
    // data loss, so the attach must be explicit (takeover) or start above
    intercept[IllegalStateException] {
      MergeInto.merge(t, batch((OpInsert, 3L, "c", "c1")), 0, pipelineId = "pipeNew")
    }
    val r = MergeInto.merge(t, batch((OpInsert, 3L, "c", "c1")), 0,
      pipelineId = "pipeNew", allowTakeover = true)
    assert(!r.skipped && t.meta.lastPipelineId == "pipeNew")
    // pid-less callers keep the legacy epoch-only fence on their own tables
    assert(MergeInto.merge(t, batch((OpInsert, 9L, "x", "x1")), 0).skipped)
  }

  test("wildcard table expansion (S6): regex match, lone-* rejected") {
    import graft.sources.Tables
    val names = Tables.expandDir("/root/testdata/sf0.001", "^(nation|region)$")
    assert(names == Seq("nation", "region"))
    assert(Tables.expandDir("/root/testdata/sf0.001", "l.*").contains("lineitem"))
    intercept[IllegalArgumentException](Tables.expandDir("/x", "*"))
    intercept[IllegalArgumentException](Tables.expandCatalog(spark, ".*"))
  }
}
