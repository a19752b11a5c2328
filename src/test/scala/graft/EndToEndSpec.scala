package graft

import graft.changelog.{ChangelogCodec, ChangelogGenerator, ChangelogSpec}
import graft.core.Types
import graft.lake.LakeTable
import graft.oracle.ReferenceOracle
import graft.streaming.CdcPipeline

/** The minimum end-to-end slice (SURVEY.md §7.2) plus the replay-correctness
  * gates of §5: streamed changelog → MERGE'd LakeTable must equal the
  * single-threaded reference oracle, including under schema evolution,
  * duplicate replay spans, deletes, hot-key skew, and kill-and-resume.
  */
class EndToEndSpec extends SparkSpec {
  import Types._

  private val keys = Seq("conv_id", "turn_idx")

  private def oracleFor(logDir: String, table: LakeTable) = {
    val wire = spark.read.schema(changeEventWireSchema).parquet(logDir)
    val decoded = ChangelogCodec.decode(wire, table.meta.schema)
    ReferenceOracle.expectedState(decoded, keys)
  }

  private def assertMatchesOracle(logDir: String, table: LakeTable): Unit = {
    val expected = oracleFor(logDir, table)
    val actual = ReferenceOracle.actualState(table.snapshot(), keys)
    val (missing, extra, differing) = ReferenceOracle.diff(expected, actual)
    assert(missing.isEmpty, s"keys missing from table: ${missing.take(5)}")
    assert(extra.isEmpty, s"unexpected keys in table: ${extra.take(5)}")
    assert(differing.isEmpty, s"value mismatches: ${differing.take(5)}")
    assert(expected.nonEmpty, "oracle produced an empty table — fixture broken")
  }

  test("streamed replay == reference oracle (evolution + duplicates + deletes + skew)") {
    val tmp = tmpDir("graft-e2e")
    val log = s"$tmp/log"
    ChangelogGenerator.write(spark,
      ChangelogSpec(nEvents = 20000, nConversations = 300, chunkSize = 2000,
        dupEvery = 5000, dupSpanLen = 250), log)
    val table = LakeTable.create(spark, s"$tmp/table", transcriptSchemaV0,
      keys, Seq("conv_id"), numBuckets = 8)
    CdcPipeline.runToCompletion(spark, table,
      CdcPipeline.Config(log, s"$tmp/cp", maxFilesPerTrigger = 3))

    assert(table.meta.schemaId == 2, "schema evolution should have reached v2")
    assertMatchesOracle(log, table)

    // lineage landed and the applied-offset watermark is the stream max
    assert(table.meta.lastOffset == 19999L)
    assert(table.lineage().count() > 0)
    // duplicate spans were observed as replays somewhere
    assert(table.meta.history.map(_.replayed).sum > 0, "expected replayed rows > 0")
  }

  test("kill-and-resume from checkpoint == uninterrupted run (no dups, no gaps)") {
    val tmp = tmpDir("graft-resume")
    val log = s"$tmp/log"
    ChangelogGenerator.write(spark,
      ChangelogSpec(nEvents = 12000, nConversations = 200, chunkSize = 1500,
        dupEvery = 4000, dupSpanLen = 200), log)
    val table = LakeTable.create(spark, s"$tmp/table", transcriptSchemaV0,
      keys, Seq("conv_id"), numBuckets = 8)
    val cfg = CdcPipeline.Config(log, s"$tmp/cp", maxFilesPerTrigger = 1)

    // run a prefix: start, wait for a few commits, hard-stop mid-stream
    val q = CdcPipeline.start(spark, table, cfg)
    val deadline = System.currentTimeMillis() + 120000
    while (table.refresh().lastEpoch < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q.stop(); q.awaitTermination()
    assert(table.refresh().lastEpoch >= 2, "prefix run applied too few batches")
    val prefixEpoch = table.meta.lastEpoch

    // resume from the same checkpoint; drain the rest
    CdcPipeline.runToCompletion(spark, table, cfg)
    assert(table.refresh().lastEpoch > prefixEpoch)
    assertMatchesOracle(log, table)
  }

  test("B6 auto-recovery: transient sink failures retry in place; a dead query " +
    "restarts from checkpoint; final state matches the oracle") {
    val tmp = tmpDir("graft-b6")
    val log = s"$tmp/log"
    ChangelogGenerator.write(spark,
      ChangelogSpec(nEvents = 8000, nConversations = 150, chunkSize = 1000,
        dupEvery = 0), log)
    val table = LakeTable.create(spark, s"$tmp/table", transcriptSchemaV0,
      keys, Seq("conv_id"), numBuckets = 4)
    // injector: batch 1 fails twice (in-place retry recovers); batch 3 fails
    // 5 consecutive times — beyond maxBatchRetries=3 — killing the query,
    // which the supervisor restarts from the checkpoint
    val counts = new java.util.concurrent.ConcurrentHashMap[Long, Int]()
    val cfg = CdcPipeline.Config(log, s"$tmp/cp", maxFilesPerTrigger = 2,
      maxBatchRetries = 3, retryBackoffMs = 10L, maxRestarts = 2,
      restartBackoffMs = 50L,
      failureInjector = Some { epoch =>
        val n = counts.merge(epoch, 1, Integer.sum)
        if (epoch == 1 && n <= 2) throw new RuntimeException(s"transient sink error #$n")
        if (epoch == 3 && n <= 5) throw new RuntimeException(s"poison sink error #$n")
      })
    CdcPipeline.runSupervised(spark, table, cfg)
    assert(counts.get(1L) >= 3, "batch 1 should have retried in place")
    assert(counts.get(3L) >= 6, "batch 3 should have crossed a query restart")
    assert(table.refresh().lastOffset == 7999L)
    assertMatchesOracle(log, table)
  }

  test("replayed epoch is fenced to a no-op (exactly-once)") {
    val tmp = tmpDir("graft-fence")
    val log = s"$tmp/log"
    ChangelogGenerator.write(spark,
      ChangelogSpec(nEvents = 4000, nConversations = 100, chunkSize = 1000,
        dupEvery = 0, schemaEvolution = false), log)
    val table = LakeTable.create(spark, s"$tmp/table", transcriptSchemaV0,
      keys, Seq("conv_id"), numBuckets = 4)
    val cfg = CdcPipeline.Config(log, s"$tmp/cp", maxFilesPerTrigger = 2)
    CdcPipeline.runToCompletion(spark, table, cfg)
    val versionAfter = table.refresh().version
    val stateAfter = ReferenceOracle.actualState(table.snapshot(), keys)

    // re-apply an already-committed epoch: must skip without touching state
    val wire = spark.read.schema(changeEventWireSchema).parquet(log)
    val res = CdcPipeline.applyBatch(table, wire, epoch = 0, cfg)
    assert(res.skipped)
    assert(table.refresh().version == versionAfter)
    assert(ReferenceOracle.actualState(table.snapshot(), keys) == stateAfter)
  }
}
