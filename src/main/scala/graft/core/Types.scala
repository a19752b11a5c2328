package graft.core

import org.apache.spark.sql.types._

/** Core data model of the graft CDC engine.
  *
  * The unit of data is a row-oriented change event — the typed analog of the
  * reference's `model.RowRequest` (reference: model/request.go:11-17) with the
  * binlog coordinate (`model.PosRequest`, model/request.go:19-23) folded in as
  * one monotone `pos: Long`. Unlike the reference, before/after images are
  * typed nested structs, not positional arrays aligned to a live schema
  * (reference: model/padding.go:5-12).
  */
object Types {

  /** Target-table row: one turn of a multi-turn conversation transcript.
    * Composite primary key (conv_id, turn_idx) — mirrors the reference's
    * composite-PK handling (reference: global/rule.go:127,
    * service/endpoint/endpoint.go:309-322).
    */
  val transcriptKey: Seq[String] = Seq("conv_id", "turn_idx")

  /** schema_id = 0: the base transcript schema. */
  val transcriptSchemaV0: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)
  ))

  /** schema_id = 1: in-flight add-column (`lang: string`) — the analog of the
    * reference picking up an ALTER TABLE via OnTableChanged and re-fetching
    * the schema (reference: service/handler.go:56-62,
    * service/transfer_service.go:298-326).
    */
  val transcriptSchemaV1: StructType =
    transcriptSchemaV0.add(StructField("lang", StringType))

  /** schema_id = 2: in-flight type-widen (turn_idx int → long). */
  val transcriptSchemaV2: StructType = StructType(transcriptSchemaV1.map {
    case StructField("turn_idx", IntegerType, n, m) => StructField("turn_idx", LongType, n, m)
    case f => f
  })

  /** schema registry: schema_id → StructType. In a live deployment this is
    * fed by DDL events on the change stream; in the sandbox the generator
    * emits schema_id bumps (FIXTURES.md §3).
    */
  val transcriptSchemas: Map[Int, StructType] =
    Map(0 -> transcriptSchemaV0, 1 -> transcriptSchemaV1, 2 -> transcriptSchemaV2)

  /** Wire schema of the change log ("binlog"). Before/after images travel as
    * JSON strings + schema_id so the stream has a FIXED physical schema (a
    * requirement of Structured Streaming file sources) while the logical row
    * schema evolves mid-stream — the same way real binlog rows are schemaless
    * bytes decoded against the current table schema
    * (reference: service/endpoint/endpoint.go:90-219).
    */
  val changeEventWireSchema: StructType = StructType(Seq(
    StructField("pos", LongType, nullable = false),       // monotone binlog coordinate
    StructField("epoch_hint", LongType, nullable = false), // chunk/file id
    StructField("op", StringType, nullable = false),       // insert | update | delete
    StructField("ts", TimestampType),                      // binlog header timestamp
    StructField("schema_id", IntegerType, nullable = false),
    StructField("before", StringType),                     // JSON before-image (update/delete)
    StructField("after", StringType)                       // JSON after-image (insert/update)
  ))

  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"

  /** Typed row: one transcript turn (widest schema — `lang` nullable,
    * `turn_idx` long — older events decode with nulls/narrow values).
    */
  final case class Transcript(
      conv_id: String, turn_idx: Long, role: String, text: String,
      tool: String, ts: java.sql.Timestamp, lang: String)

  /** Typed change event — the `Dataset[ChangeEvent]` surface of the engine
    * (`ChangelogCodec.typed`): op + monotone pos + before/after images as
    * options, the typed analog of `model.RowRequest`.
    */
  final case class ChangeEvent(
      pos: Long, epoch_hint: Long, op: String, ts: java.sql.Timestamp,
      schema_id: Int, before: Option[Transcript], after: Option[Transcript]) {
    def key: Option[(String, Long)] =
      (if (op == OpDelete) before else after).map(t => (t.conv_id, t.turn_idx))
    def image: Option[Transcript] = if (op == OpDelete) before else after
  }

  /** Total-order op priority for LWW tie-breaking at equal (pos, ts):
    * delete > update > insert (SURVEY.md §7.5).
    */
  def opRank(op: String): Int = op match {
    case OpDelete => 2
    case OpUpdate => 1
    case _        => 0
  }
}
