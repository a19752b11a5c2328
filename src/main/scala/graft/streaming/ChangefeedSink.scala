package graft.streaming

import graft.changelog.ChangelogCodec
import graft.core.Types
import graft.rules.ChangefeedOut
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** MQ changefeed-out sink (K11-K13): the reference publishes one JSON
  * message per change event to Kafka/RocketMQ/RabbitMQ
  * (reference: service/endpoint/kafka.go:205-230, rocket.go:232-260,
  * rabbit.go:194-223). Here the stream decodes, shapes the (key, value)
  * message — keyed by row key, fixing the reference's random partitioner
  * (kafka.go:51) so per-key order survives — and appends to a partitioned
  * sink directory (swap the format for `kafka` on a cluster with brokers;
  * the message shape is identical).
  */
object ChangefeedSink {

  def start(spark: SparkSession, cfg: CdcPipeline.Config, outDir: String,
      keyCols: Seq[String] = Types.transcriptKey,
      reserveRawData: Boolean = false,
      availableNow: Boolean = false): StreamingQuery = {
    val newest = cfg.registry(cfg.registry.keys.max)
    val wire = spark.readStream
      .schema(Types.changeEventWireSchema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .parquet(cfg.changelogDir)
    val decoded =
      if (reserveRawData) ChangelogCodec.decodeWithBefore(wire, newest)
      else ChangelogCodec.decode(wire, newest)
    val messages = ChangefeedOut.toMessages(decoded, keyCols, reserveRawData)
    val writer = messages.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .format("parquet") // stand-in for format("kafka") — same (key, value) contract
      .option("path", outDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow())
     else writer.trigger(Trigger.ProcessingTime(cfg.triggerMs))).start()
  }

  def runToCompletion(spark: SparkSession, cfg: CdcPipeline.Config, outDir: String,
      keyCols: Seq[String] = Types.transcriptKey,
      reserveRawData: Boolean = false): Unit =
    start(spark, cfg, outDir, keyCols, reserveRawData, availableNow = true)
      .awaitTermination()

  def read(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
}
