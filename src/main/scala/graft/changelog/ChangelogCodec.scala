package graft.changelog

import graft.core.Types
import org.apache.spark.sql.DataFrame
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

  val MetaCols: Seq[String] = Seq("_op", "_pos", "_event_ts")

  def decode(wire: DataFrame, schema: StructType): DataFrame = {
    val img = when(col("op") === OpDelete, from_json(col("before"), schema))
      .otherwise(from_json(col("after"), schema))
    wire.select(
      col("op").as("_op"),
      col("pos").as("_pos"),
      col("ts").as("_event_ts"),
      img.as("_img")
    ).select(col("_op"), col("_pos"), col("_event_ts"), col("_img.*"))
  }
}
