package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence PACKING for pre-training: lay the corpus's token stream out in a
  * stable document order and cut it into fixed-budget training sequences
  * ("concat-and-chunk" sample packing — documents may straddle sequence
  * boundaries). Every document gets the sequence its first token lands in
  * (`seq_id`) and the offset of that token within the sequence
  * (`seq_offset`); a data loader reads sequence S as the documents with
  * `tok_before + n_tokens > S·budget` and `tok_before < (S+1)·budget`.
  *
  * The core is a GLOBAL prefix sum over the corpus. The naive formulation —
  * `sum(len) OVER (ORDER BY id)` with no partition key — collapses to a
  * single task and dies at 10^10 rows, so this is the textbook two-pass
  * distributed scan:
  *
  *   1. shard the id domain ORDER-PRESERVINGLY (uniform range split of
  *      [min, max] — skew in id density only unbalances shard sizes, never
  *      correctness) and aggregate one token sum per shard (map-side
  *      combined; one exchange of `nShards` rows);
  *   2. the driver folds the `nShards` partial sums into per-shard starting
  *      offsets (bounded metadata: nShards longs), which broadcast-join back
  *      so each row's prefix = shard offset + within-shard window sum.
  *
  * Per-shard windows run in parallel (`nShards` independent sorts of
  * |corpus|/nShards rows each); nothing global ever sorts in one place.
  */
object Packing {

  /** Pack `df`'s rows (ordered by `idCol`, numeric) into sequences of
    * `seqTokens` tokens using token counts from `lenCol`. Returns the input
    * id + n_tokens + (tok_before, seq_id, seq_offset).
    */
  def packSequences(df: DataFrame, idCol: String, lenCol: String,
      seqTokens: Long, nShards: Int = 256): DataFrame = {
    require(seqTokens > 0, s"seqTokens must be positive: $seqTokens")
    val bounds = df.agg(min(col(idCol)).cast("long"),
      max(col(idCol)).cast("long")).head()
    if (bounds.isNullAt(0)) // empty corpus
      return df.select(col(idCol), col(lenCol).cast("long").as("n_tokens"),
        lit(0L).as("tok_before"), lit(0L).as("seq_id"), lit(0L).as("seq_offset"))
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // sparse 64-bit id domains (snowflake ids and the like) overflow the
    // Long arithmetic below twice over: hi-lo+1 can wrap here, and
    // (id-lo)·shards can wrap per row. Fail loudly at the driver instead of
    // silently mis-sharding (or dying mid-job under ANSI); densify ids
    // (zipWithIndex) before packing such domains. The formula itself is
    // kept as-is — a divide-first variant rounds differently at shard
    // boundaries, changing the (oracle-pinned) shard assignment.
    def sparseDomain(): Nothing = throw new IllegalArgumentException(
      s"packSequences: id span [$lo, $hi] × $nShards shards overflows " +
        "Long — densify the id domain before packing")
    val span =
      try math.max(math.addExact(math.subtractExact(hi, lo), 1L), 1L)
      catch { case _: ArithmeticException => sparseDomain() }
    val shards = math.max(1, math.min(nShards.toLong, span)).toInt
    if (shards > 1 && span - 1 > Long.MaxValue / shards) sparseDomain()
    // order-preserving uniform split of the id range: id → shard is
    // monotone, so shard-major + within-shard id order == global id order
    val shardOf = ((col(idCol).cast("long") - lo) * shards / span).cast("int")
    val rows = df.select(col(idCol), col(lenCol).cast("long").as("n_tokens"),
      shardOf.as("_shard"))
    // pass 1: one token total per shard → driver-side exclusive prefix
    val totals = rows.groupBy("_shard").agg(sum("n_tokens").as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until shards).scanLeft(0L) {
      case (acc, s) => acc + totals.getOrElse(s, 0L)
    }
    val offsetDf = rows.sparkSession
      .createDataFrame(
        java.util.Arrays.asList((0 until shards).map(s =>
          Row(s, offsets(s))): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("_shard",
            org.apache.spark.sql.types.IntegerType, nullable = false),
          org.apache.spark.sql.types.StructField("_shard_off",
            org.apache.spark.sql.types.LongType, nullable = false))))
    // pass 2: per-shard exclusive running sum + the shard's start offset
    val w = Window.partitionBy("_shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    rows.join(broadcast(offsetDf), "_shard")
      .withColumn("tok_before",
        coalesce(sum("n_tokens").over(w), lit(0L)) + col("_shard_off"))
      .select(col(idCol), col("n_tokens"), col("tok_before"),
        // integral division (not floor-of-double: tok_before can pass 2^53)
        expr(s"tok_before div $seqTokens").as("seq_id"),
        pmod(col("tok_before"), lit(seqTokens)).as("seq_offset"))
  }
}
