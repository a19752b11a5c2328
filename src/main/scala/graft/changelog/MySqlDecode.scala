package graft.changelog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** MySQL-specific column-value decodes the wire carries as raw numerics —
  * the remaining cases of the reference's `convertColumnData` switch
  * (reference: service/endpoint/endpoint.go:90-130) that plain casts don't
  * cover. All pure `Column` expressions (codegen'd):
  *
  *  - ENUM: binlog sends the 1-based index; decode to the label, out-of-range
  *    (including 0, MySQL's invalid-enum sentinel) → "" (endpoint.go:96-110);
  *  - SET: binlog sends a bitmask; decode to comma-joined labels in
  *    definition order (endpoint.go:111-122);
  *  - BIT: normalize to 0/1 (endpoint.go:123-130 maps "\x01"→1 else 0).
  *
  * The label dictionaries come from the table schema — the reference fetches
  * them from `information_schema` per table (schema.TableColumn.EnumValues/
  * SetValues); here the caller passes them, e.g. from a config rule.
  */
object MySqlDecode {

  /** ENUM index (1-based long) → label; null passes through; invalid → "". */
  def decodeEnum(idx: Column, labels: Seq[String]): Column = {
    val arr = typedLit(labels)
    val i = idx.cast("long")
    when(idx.isNull, lit(null).cast("string"))
      .when(i.between(1, labels.size), element_at(arr, i.cast("int")))
      .otherwise(lit(""))
  }

  /** SET bitmask (long) → comma-joined labels; null passes through.
    * concat_ws drops the NULL branches, so only set bits contribute.
    */
  def decodeSet(mask: Column, labels: Seq[String]): Column = {
    // 1L << i wraps at i = 64 (shift is mod 64), so label 64 would test bit
    // 0 and silently report wrong membership — MySQL itself caps SET at 64
    require(labels.size <= 64, s"SET supports at most 64 labels, got ${labels.size}")
    val m = mask.cast("long")
    val parts = labels.zipWithIndex.map { case (l, i) =>
      // =!= 0, not > 0: bit 63 (MySQL SET's 64-label max) is Long.MinValue
      when(m.bitwiseAND(lit(1L << i)) =!= 0L, lit(l))
    }
    when(mask.isNull, lit(null).cast("string"))
      .otherwise(concat_ws(",", parts: _*))
  }

  /** BIT → 0/1 long: numeric/boolean input nonzero→1; string input follows
    * the reference's byte check ("\u0001" → 1 else 0).
    */
  def decodeBit(c: Column): Column =
    when(c.isNull, lit(null).cast("long"))
      .when(c.cast("string") === "\u0001", 1L)
      // try_cast: non-numeric strings → null → falls to the 0 branch
      // (ANSI cast would throw on the reference's raw byte strings)
      .when(coalesce(c.try_cast("long"), lit(0L)) =!= 0L, 1L)
      .otherwise(0L)
}
