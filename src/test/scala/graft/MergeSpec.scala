package graft

import graft.core.Types
import graft.lake.LakeTable
import graft.merge.MergeInto
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit semantics of the MERGE operator (SURVEY.md §2.4/§5.3): every branch
  * of the apply algebra on tiny hand-built batches, in both MOR and COW
  * modes, which must be observationally identical.
  */
class MergeSpec extends SparkSpec {
  import Types._

  private val schema = StructType(Seq(
    StructField("k", StringType, nullable = false),
    StructField("v", StringType)))

  private def mkTable(mode: String) = LakeTable.create(spark,
    tmpDir(s"graft-merge-$mode").resolve("t").toString, schema,
    keyCols = Seq("k"), bucketCols = Seq("k"), numBuckets = 4)

  private def batch(rows: (String, Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("_op", "_pos", "k", "v")
      .withColumn("_event_ts", lit(null).cast("timestamp"))
      .select("_op", "_pos", "_event_ts", "k", "v")
  }

  private def state(t: LakeTable): Map[String, String] =
    t.snapshot().collect().map(r => r.getString(0) -> r.getString(1)).toMap

  for (mode <- Seq("mor", "cow")) {
    test(s"[$mode] insert / update-as-upsert / delete / delete-of-absent") {
      val t = mkTable(mode)
      MergeInto.merge(t, batch(
        (OpInsert, 1L, "a", "a1"),
        (OpInsert, 2L, "b", "b1"),
        (OpUpdate, 3L, "c", "c1"), // update of absent key upserts (Lua-mongo UPSERT)
        (OpDelete, 4L, "zz", null) // delete-of-absent tolerated (elastic7 not_found)
      ), epoch = 0, mode = mode)
      assert(state(t) == Map("a" -> "a1", "b" -> "b1", "c" -> "c1"))

      MergeInto.merge(t, batch(
        (OpUpdate, 5L, "a", "a2"), // genuine update
        (OpDelete, 6L, "b", null)  // genuine delete
      ), epoch = 1, mode = mode)
      assert(state(t) == Map("a" -> "a2", "c" -> "c1"))
    }

    test(s"[$mode] in-batch LWW: greatest pos wins; delete winner removes") {
      val t = mkTable(mode)
      MergeInto.merge(t, batch(
        (OpInsert, 1L, "a", "old"),
        (OpUpdate, 9L, "a", "new"),
        (OpUpdate, 5L, "a", "mid"),
        (OpInsert, 2L, "b", "b1"),
        (OpDelete, 8L, "b", null),
        (OpInsert, 3L, "b", "b2")
      ), epoch = 0, mode = mode)
      assert(state(t) == Map("a" -> "new"))
    }

    test(s"[$mode] cross-batch LWW: replayed older events lose; newer win") {
      val t = mkTable(mode)
      MergeInto.merge(t, batch((OpInsert, 10L, "a", "v10")), 0, mode = mode)
      // replay an OLDER pos in a LATER epoch — must not regress the row
      MergeInto.merge(t, batch((OpUpdate, 5L, "a", "v5")), 1, mode = mode)
      assert(state(t) == Map("a" -> "v10"))
      MergeInto.merge(t, batch((OpUpdate, 11L, "a", "v11")), 2, mode = mode)
      assert(state(t) == Map("a" -> "v11"))
    }

    test(s"[$mode] tombstones defeat replayed-old-insert resurrection") {
      val t = mkTable(mode)
      MergeInto.merge(t, batch((OpInsert, 1L, "a", "v1")), 0, mode = mode)
      MergeInto.merge(t, batch((OpDelete, 9L, "a", null)), 1, mode = mode)
      assert(state(t) == Map.empty[String, String])
      // the original insert replays after the delete was applied
      MergeInto.merge(t, batch((OpInsert, 1L, "a", "v1")), 2, mode = mode)
      assert(state(t) == Map.empty[String, String], "deleted key resurrected!")
    }

    test(s"[$mode] epoch fence: same epoch applied twice is a no-op") {
      val t = mkTable(mode)
      MergeInto.merge(t, batch((OpInsert, 1L, "a", "v1")), 0, mode = mode)
      val r = MergeInto.merge(t, batch((OpInsert, 2L, "a", "OTHER")), 0, mode = mode)
      assert(r.skipped)
      assert(state(t) == Map("a" -> "v1"))
    }
  }

  test("MOR and COW produce identical state on the same event sequence") {
    val batches = Seq(
      batch((OpInsert, 1L, "a", "a1"), (OpInsert, 2L, "b", "b1"), (OpInsert, 3L, "c", "c1")),
      batch((OpUpdate, 4L, "a", "a2"), (OpDelete, 5L, "b", null)),
      batch((OpInsert, 6L, "d", "d1"), (OpUpdate, 7L, "d", "d2"), (OpDelete, 8L, "c", null)))
    val mor = mkTable("mor"); val cow = mkTable("cow2")
    batches.zipWithIndex.foreach { case (b, e) =>
      MergeInto.merge(mor, b, e, mode = "mor")
      MergeInto.merge(cow, b, e, mode = "cow")
    }
    assert(state(mor) == state(cow))
    assert(state(mor) == Map("a" -> "a2", "d" -> "d2"))
  }

  test("compaction folds deltas without changing state; read path prunes deltas") {
    val t = mkTable("compact")
    MergeInto.merge(t, batch((OpInsert, 1L, "a", "a1"), (OpInsert, 2L, "b", "b1")), 0)
    MergeInto.merge(t, batch((OpUpdate, 3L, "a", "a2"), (OpDelete, 4L, "b", null)), 1)
    val before = state(t)
    assert(t.meta.files.exists(_.kind == "delta"))
    MergeInto.compact(t)
    assert(t.refresh().files.forall(_.kind == "base"))
    assert(state(t) == before)
    // tombstone survives compaction (anti-resurrection)
    assert(t.meta.files.exists(_.del))
    MergeInto.merge(t, batch((OpInsert, 2L, "b", "b1")), 2)
    assert(state(t) == before, "replayed insert resurrected a compacted delete")
    // tombstone GC below a safe watermark drops it
    MergeInto.compact(t, gcTombstonesBelowPos = 100L)
    assert(!t.refresh().files.exists(_.del))
  }

  test("selective compaction: only delta-carrying buckets rewrite; others keep their files") {
    val t = mkTable("compact-sel")
    // base layer across several buckets (cow ⇒ resolved base files)
    val seed = (0 until 8).map(i => (OpInsert, i.toLong, s"k$i", s"v$i"))
    MergeInto.merge(t, batch(seed: _*), 0, mode = "cow")
    val baseEntries = t.refresh().files
    assert(baseEntries.map(_.bucket).distinct.size > 1, "seed should span buckets")
    // churn ONE key → delta lands in exactly its bucket
    MergeInto.merge(t, batch((OpUpdate, 100L, "k0", "vX")), 1)
    val hot = t.refresh().files.filter(_.kind == "delta").map(_.bucket).toSet
    assert(hot.size == 1)
    val coldFiles = baseEntries.filterNot(f => hot.contains(f.bucket)).map(_.path).toSet
    assert(coldFiles.nonEmpty, "need untouched buckets for the assertion")
    MergeInto.compact(t)
    val after = t.refresh()
    assert(after.files.forall(_.kind == "base"))
    // cost ∝ churn: cold buckets' files are byte-identical (same paths)
    assert(coldFiles.subsetOf(after.files.map(_.path).toSet),
      "compaction rewrote buckets that carried no deltas")
    assert(state(t) == (0 until 8).map(i =>
      s"k$i" -> (if (i == 0) "vX" else s"v$i")).toMap)
  }

  test("salted two-phase dedup == plain dedup") {
    val b = batch(
      (OpInsert, 1L, "a", "a1"), (OpUpdate, 7L, "a", "a7"), (OpUpdate, 3L, "a", "a3"),
      (OpInsert, 2L, "b", "b1"), (OpDelete, 9L, "b", null))
    val plain = MergeInto.lwwDedup(b, Seq("k")).orderBy("k").collect().toSeq
    val salted = MergeInto.lwwDedup(b, Seq("k"), salt = 4).orderBy("k").collect().toSeq
    assert(plain == salted)
  }

  test("LWW total order: ts breaks pos ties, op-rank breaks (pos, ts) ties") {
    import spark.implicits._
    val df = Seq(
      ("insert", 1L, "2024-01-01 00:00:01", "a", "early"),
      ("update", 1L, "2024-01-01 00:00:05", "a", "late-ts"),
      ("insert", 2L, "2024-01-01 00:00:00", "b", "ins"),
      ("delete", 2L, "2024-01-01 00:00:00", "b", null))
      .toDF("_op", "_pos", "ts", "k", "v")
      .withColumn("_event_ts", col("ts").cast("timestamp")).drop("ts")
      .select("_op", "_pos", "_event_ts", "k", "v")
    val winners = MergeInto.lwwDedup(df, Seq("k")).collect()
      .map(r => r.getAs[String]("k") -> (r.getAs[String]("_op"), r.getAs[String]("v"))).toMap
    assert(winners("a") == ("update", "late-ts"))
    assert(winners("b")._1 == "delete") // delete outranks insert at equal (pos, ts)
  }

  test("bootstrap then stream: changes supersede the snapshot (stock handoff)") {
    import spark.implicits._
    val t = mkTable("boot")
    val snap = Seq(("a", "snap-a"), ("b", "snap-b")).toDF("k", "v")
    graft.streaming.Bootstrap.run(t, snap)
    assert(state(t) == Map("a" -> "snap-a", "b" -> "snap-b"))
    MergeInto.merge(t, batch((OpUpdate, 0L, "a", "live-a"), (OpDelete, 1L, "b", null)), 0)
    assert(state(t) == Map("a" -> "live-a"))
    // bootstrap into a table the stream already wrote would be silently
    // fenced (epoch -1 <= lastEpoch) and drop snapshot-only keys — it must
    // surface as an error instead of reporting upserted=0
    val e = intercept[IllegalStateException](graft.streaming.Bootstrap.run(t, snap))
    assert(e.getMessage.contains("bootstrap fenced"))
  }
}
