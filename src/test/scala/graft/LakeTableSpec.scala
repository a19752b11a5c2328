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

  test("wildcard table expansion (S6): regex match, lone-* rejected") {
    import graft.sources.Tables
    val names = Tables.expandDir("/root/testdata/sf0.001", "^(nation|region)$")
    assert(names == Seq("nation", "region"))
    assert(Tables.expandDir("/root/testdata/sf0.001", "l.*").contains("lineitem"))
    intercept[IllegalArgumentException](Tables.expandDir("/x", "*"))
    intercept[IllegalArgumentException](Tables.expandCatalog(spark, ".*"))
  }
}
