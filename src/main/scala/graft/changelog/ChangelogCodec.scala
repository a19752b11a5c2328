package graft.changelog

import graft.core.Types
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Wire → typed decode: the analog of the reference's per-row
  * `convertColumnData` switch (reference: service/endpoint/endpoint.go:90-219)
  * expressed as one Catalyst `from_json` projection — columnar, codegen'd, no
  * per-row reflection.
  *
  * Output layout ("merge input"): metadata columns `_op`, `_pos`, `_event_ts`
  * followed by the row columns of `schema`. For deletes the row columns come
  * from the BEFORE image (only the key matters downstream); for
  * inserts/updates from the AFTER image — mirroring `RowRequest.Old`/`Row`
  * (reference: model/request.go:11-17, service/handler.go:94-107).
  */
object ChangelogCodec {
  import Types._

  /** The canonical meta-column inventory: every non-payload column a decode
    * can attach. Downstream "which columns are the row image?" filters must
    * derive from these two (EventTransform, ConfigPipeline) — a third
    * hand-written list is how a new meta column leaks into a sink payload.
    */
  val BeforeCol = "_before"
  val MetaCols: Seq[String] = Seq("_op", "_pos", "_event_ts", "_schema_id")
  val MetaColsWithBefore: Seq[String] = MetaCols :+ BeforeCol

  /** Decode against the NEWEST known schema (a superset of all older ones —
    * missing columns parse to null, widened types parse wide), carrying the
    * per-event `_schema_id` through so the merge can evolve the table from
    * the observed watermark without a separate scan.
    */
  def decode(wire: DataFrame, schema: StructType): DataFrame = {
    // pick the image string first, parse ONCE (JSON parse dominates decode CPU)
    val img = from_json(
      when(col("op") === OpDelete, col("before")).otherwise(col("after")), schema)
    wire.select(
      col("op").as("_op"),
      col("pos").as("_pos"),
      col("ts").as("_event_ts"),
      col("schema_id").as("_schema_id"),
      img.as("_img")
    ).select(col("_op"), col("_pos"), col("_event_ts"), col("_schema_id"), col("_img.*"))
  }

  /** [[decode]] plus a `_before` struct column carrying the BEFORE image —
    * parsed ONLY for updates (null otherwise), because that is the only op
    * whose old image any consumer reads: the changefeed's `reserve_raw_data`
    * emits `raw` = old row iff action == update (reference:
    * service/endpoint/kafka.go:216-218, endpoint.go:284-306 oldRowMap reads
    * `req.Old`). The merge path stays on [[decode]] — one parse per event.
    */
  def decodeWithBefore(wire: DataFrame, schema: StructType): DataFrame = {
    val img = from_json(
      when(col("op") === OpDelete, col("before")).otherwise(col("after")), schema)
    val old = from_json(when(col("op") === OpUpdate, col("before")), schema)
    wire.select(
      col("op").as("_op"),
      col("pos").as("_pos"),
      col("ts").as("_event_ts"),
      col("schema_id").as("_schema_id"),
      old.as("_before"),
      img.as("_img")
    ).select(col("_op"), col("_pos"), col("_event_ts"), col("_schema_id"),
      col("_before"), col("_img.*"))
  }

  implicit val changeEventEncoder: Encoder[Types.ChangeEvent] =
    Encoders.product[Types.ChangeEvent]

  /** Typed decode: wire → `Dataset[ChangeEvent]` with before/after images as
    * `Option[Transcript]` (widest schema; older events carry nulls). The
    * merge path stays on the columnar [[decode]] layout — this is the
    * user-facing typed surface for `flatMap`/`mapGroups`-style transforms.
    */
  def typed(wire: DataFrame): Dataset[Types.ChangeEvent] = {
    val s = Types.transcriptSchemaV2
    wire.select(
      col("pos"), col("epoch_hint"), col("op"), col("ts"), col("schema_id"),
      from_json(col("before"), s).as("before"),
      from_json(col("after"), s).as("after")
    ).as[Types.ChangeEvent]
  }
}
