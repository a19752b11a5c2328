package graft.streaming

import graft.changelog.ChangelogCodec
import graft.config.{GraftConfig, RouteConf}
import graft.core.Types
import graft.lake.LakeTable
import graft.merge.{MergeInto, MergeResult}
import graft.rules.{ChangefeedOut, ExprTransform, RulePipeline}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Config-file-driven pipeline: `GraftConfig` (one YAML) → running streams —
  * the reference's primary UX (declare rules in app.yml, run the binary;
  * global/config.go:142-196, rule compile global/rule.go:345-407) without
  * writing Scala.
  *
  * Per micro-batch: decode once, cache, then per route filter → rule
  * transform (all Catalyst expressions, including the runtime `filter`/
  * `computed` strings) → apply:
  *   - `lake` routes MERGE into their own LakeTable, each with its own
  *     (epoch, offset, pipelineId) fence ⇒ per-route exactly-once;
  *   - `changefeed` routes append keyed (key, value) JSON messages (or
  *     configured `ops` rows — the script-sink analog) to their out dir;
  *     at-least-once on crash replay, exactly the reference's MQ contract
  *     (service/handler.go:173-191).
  */
object ConfigPipeline {

  final case class Built(conf: RouteConf, table: LakeTable)

  /** Create/load the lake tables the routes target. A new table's schema is
    * the rule's OUTPUT shape (decode schema → rule projection, meta columns
    * dropped) — so renames/defaults/computed columns are first-class.
    */
  def build(spark: SparkSession, c: GraftConfig,
      registry: Map[Int, StructType] = Types.transcriptSchemas): Seq[Built] = {
    val decodedShape = ChangelogCodec.decode(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        Types.changeEventWireSchema), registry(registry.keys.max))
    c.routes.map { r =>
      if (r.target != "lake") Built(r, null)
      else if (LakeTable.exists(r.tableDir)) Built(r, LakeTable.load(spark, r.tableDir))
      else {
        val outShape = StructType(routeTransform(decodedShape, r).schema
          .filterNot(f => ChangelogCodec.MetaCols.contains(f.name)))
        r.keyColumns.foreach(k => require(outShape.fieldNames.contains(k),
          s"route ${r.name}: key column $k missing from rule output " +
            s"(${outShape.fieldNames.mkString(",")})"))
        val bucketCols = if (r.bucketColumns.nonEmpty) r.bucketColumns
          else Seq(r.keyColumns.head)
        Built(r, LakeTable.create(spark, r.tableDir, outShape,
          r.keyColumns, bucketCols, r.numBuckets))
      }
    }
  }

  /** Route predicate + rule over a decoded batch, meta columns preserved. */
  def routeTransform(decoded: DataFrame, r: RouteConf): DataFrame =
    RulePipeline(decoded.where(expr(r.filter)), r.rule,
      preserve = ChangelogCodec.MetaCols)

  def applyBatch(routes: Seq[Built], wire: DataFrame, epoch: Long,
      c: GraftConfig, pipelineId: String,
      registry: Map[Int, StructType] = Types.transcriptSchemas): Map[String, MergeResult] = {
    val decoded = ChangelogCodec.decode(wire, registry(registry.keys.max))
    val cached = decoded.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      routes.map { b =>
        val routed = routeTransform(cached, b.conf)
        val res = b.conf.target match {
          case "lake" =>
            // config tables have a FIXED rule-output schema (registry-driven
            // evolution stays on the code-level API), so no registry here
            MergeInto.merge(b.table, routed.drop("_schema_id"), epoch,
              c.saltedDedup, c.mergeMode,
              pipelineId = pipelineId, allowTakeover = c.allowPipelineTakeover)
          case _ =>
            val out =
              if (b.conf.ops.nonEmpty) ExprTransform.run(routed, b.conf.ops)
              else ChangefeedOut.toMessages(routed.drop("_schema_id"),
                b.conf.keyColumns, b.conf.reserveRawData)
            out.write.mode("append").parquet(b.conf.outDir)
            MergeResult(epoch, skipped = false, 0, 0, 0, 0)
        }
        b.conf.name -> res
      }.toMap
    } finally { cached.unpersist(); () }
  }

  def start(spark: SparkSession, c: GraftConfig,
      availableNow: Boolean = false): StreamingQuery = {
    val routes = build(spark, c)
    val pipelineId = CdcPipeline.resolvePipelineId(c.checkpointDir)
    val wire = spark.readStream
      .schema(Types.changeEventWireSchema)
      .option("maxFilesPerTrigger", c.maxFilesPerTrigger)
      .parquet(c.changelogDir)
    val writer = wire.writeStream
      .option("checkpointLocation", c.checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        applyBatch(routes, df, batchId, c, pipelineId)
        routes.foreach(b => if (b.table != null)
          MergeInto.maybeCompactAsync(b.table, c.autoCompactRatio, c.autoCompactMinRows))
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(c.triggerMs))).start()
  }

  def runToCompletion(spark: SparkSession, c: GraftConfig): Unit = {
    start(spark, c, availableNow = true).awaitTermination()
    MergeInto.awaitCompaction()
  }
}
