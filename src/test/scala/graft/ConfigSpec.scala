package graft

import graft.changelog.{ChangelogCodec, ChangelogGenerator, ChangelogSpec}
import graft.config.GraftConfig
import graft.core.Types
import graft.lake.LakeTable
import graft.oracle.ReferenceOracle
import graft.rules.{ExprOp, ExprTransform}
import graft.streaming.ConfigPipeline
import org.apache.spark.sql.functions._

/** Config-file-driven pipelines (the reference's app.yml UX) + runtime
  * expression transforms (the no-recompile Lua analog).
  */
class ConfigSpec extends SparkSpec {
  import spark.implicits._

  test("YAML → two-route pipeline (lake + changefeed), rules applied, matches oracle") {
    val work = tmpDir("cfg-e2e")
    val log = s"$work/log"
    ChangelogGenerator.write(spark,
      ChangelogSpec(nEvents = 20000, nConversations = 400, chunkSize = 5000), log)
    val yaml =
      s"""changelog_dir: $log
         |checkpoint_dir: $work/cp
         |max_files_per_trigger: 8
         |routes:
         |  - name: transcripts
         |    target: lake
         |    table_dir: $work/t1
         |    key_columns: [conv_id, turn_idx]
         |    bucket_columns: [conv_id]
         |    num_buckets: 8
         |    rule:
         |      exclude_columns: [lang]
         |      column_mappings: {role: speaker}
         |      computed: {text_len: "length(text)"}
         |  - name: feed
         |    target: changefeed
         |    filter: "_op <> 'delete'"
         |    out_dir: $work/feed
         |    key_columns: [conv_id, turn_idx]
         |""".stripMargin
    val cfgFile = work.resolve("app.yml")
    java.nio.file.Files.write(cfgFile, yaml.getBytes("UTF-8"))

    val c = GraftConfig.load(cfgFile.toString)
    ConfigPipeline.runToCompletion(spark, c)

    // oracle: same decode + same rule transform, replayed sequentially
    val wire = spark.read.schema(Types.changeEventWireSchema).parquet(log)
    val decoded = ChangelogCodec.decode(wire,
      Types.transcriptSchemas(Types.transcriptSchemas.keys.max))
    val routed = ConfigPipeline.routeTransform(decoded, c.routes.head)
      .drop("_schema_id")
    val expected = ReferenceOracle.expectedState(routed, Seq("conv_id", "turn_idx"))
    val table = LakeTable.load(spark, s"$work/t1")
    assert(table.meta.schema.fieldNames.toSeq ==
      Seq("conv_id", "turn_idx", "speaker", "text", "tool", "ts", "text_len"))
    val actual = ReferenceOracle.actualState(table.snapshot(), Seq("conv_id", "turn_idx"))
    val (missing, extra, diff) = ReferenceOracle.diff(expected, actual)
    assert(missing.isEmpty && extra.isEmpty && diff.isEmpty,
      s"missing=${missing.take(3)} extra=${extra.take(3)} diff=${diff.take(3)}")

    // changefeed route: one keyed message per non-delete event
    val feed = spark.read.parquet(s"$work/feed")
    val nonDeletes = decoded.where($"_op" =!= "delete").count()
    assert(feed.count() == nonDeletes)
    assert(feed.columns.toSeq == Seq("key", "value"))
  }

  test("config parse: defaults, rules, ops, validation") {
    val c = GraftConfig.parse(
      """changelog_dir: /x/log
        |checkpoint_dir: /x/cp
        |merge_mode: cow
        |routes:
        |  - name: r1
        |    target: lake
        |    table_dir: /x/t
        |    key_columns: [k]
        |    rule:
        |      include_columns: [k, v]
        |      filter: "v IS NOT NULL"
        |  - name: r2
        |    target: changefeed
        |    out_dir: /x/out
        |    ops:
        |      - {target: redis, action: SET, key: "concat('u:', k)", value: v}
        |""".stripMargin)
    assert(c.mergeMode == "cow" && c.maxFilesPerTrigger == 4)
    assert(c.routes.head.rule.filterExpr.contains("v IS NOT NULL"))
    assert(c.routes(1).ops.head.action == "SET")
    intercept[IllegalArgumentException](GraftConfig.parse("routes: []"))
    intercept[IllegalArgumentException](GraftConfig.parse(
      "changelog_dir: /x\ncheckpoint_dir: /y\nroutes:\n  - name: r\n    target: lake\n"))
  }

  test("ExprTransform: 0..n config-string ops per event == compiled script sink (q13 shape)") {
    val df = Seq(
      (1L, "error", 10L, 1.5), (2L, "click", 10L, 2.5), (3L, "buy", 11L, 0.0))
      .toDF("event_id", "event_type", "user_id", "value")
    val ops = Seq(
      ExprOp("redis", "DEL", key = "concat('u:', user_id, ':', event_id)",
        when = "event_type = 'error'"),
      ExprOp("redis", "SET", key = "concat('u:', user_id, ':', event_id)",
        when = "event_type <> 'error'", value = "event_type"),
      ExprOp("redis", "ZADD", key = "concat('rank:', user_id)",
        when = "event_type IN ('click','view')", score = "value",
        value = "cast(event_id as string)"))
    val out = ExprTransform.run(df, ops)
      .select("target", "action", "key", "value").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
    assert(out == Set(
      ("DEL", "u:10:1", null),
      ("SET", "u:10:2", "click"),
      ("SET", "u:11:3", "buy"),
      ("ZADD", "rank:10", "2")))
  }

  test("runtime rule expressions (filter + computed) == compiled column pipeline") {
    val df = Seq(("a", 1, "xx"), ("b", -1, "yyy"), ("c", 2, "zzzz"))
      .toDF("k", "n", "s")
    val viaStrings = graft.rules.RulePipeline(df,
      graft.rules.Rule(filterExpr = Some("n >= 0"),
        computedColumns = Seq("s_len" -> "length(s)")))
    val viaColumns = df.where($"n" >= 0).withColumn("s_len", length($"s"))
    assert(viaStrings.collect().toSeq == viaColumns.collect().toSeq)
  }
}
