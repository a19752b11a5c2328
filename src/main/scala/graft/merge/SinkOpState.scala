package graft.merge

import graft.lake.LakeTable
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structure-level APPLICATION of a [[graft.rules.SinkOp]] stream — the loop
  * that actually executes the reference's keyed-store op algebra instead of
  * only emitting it (reference: service/endpoint/redis.go:225-268):
  *
  *   - String     `SET key val` / `DEL key`                 (redis.go:225-233)
  *   - Hash       `HSET key f val` / `HDEL key f`           (redis.go:233-238)
  *   - List       `RPUSH key val` / `LREM 0 val`            (redis.go:239-247)
  *   - Set        `SADD key val` / `SREM key val`           (redis.go:248-256)
  *   - SortedSet  `ZADD key score val` / `ZREM key val`     (redis.go:257-268)
  *
  * including the reference's VALUE-ADDRESSED retraction semantics: an update
  * against a List/Set is `LREM old + RPUSH new` / `SREM old + SADD new`
  * (redis.go:239-256), and `LREM 0 val` removes ALL occurrences of the value
  * while later re-pushes survive — duplicate-preserving, order-preserving.
  *
  * The state store is a keyed [[LakeTable]] (one row per live entry) rather
  * than a Redis client — so the folded state is queryable, snapshot-versioned
  * and exactly-once under the engine's (pipelineId, epoch) fence, and a
  * DuckDB oracle can recompute it from the op stream (q40).
  *
  * == Fold semantics (total op order `ord`) ==
  * Per identity (target, structure, key, field, elem — elem is the member
  * value for set/zset/list, '' otherwise):
  *   - non-list: the op with the greatest `ord` wins; a winning removal
  *     (DEL/HDEL/SREM/ZREM) leaves no row — LWW, exactly the reference's
  *     in-order single-threaded apply made explicit.
  *   - list: surviving entries = RPUSH ops with `ord` greater than the last
  *     LREM's `ord`; each survivor is its own row (uid = ord) so duplicates
  *     and RPUSH order are preserved.
  * The fold is ASSOCIATIVE over ord-carrying rows: folded state re-expressed
  * as ops (its stored ords) unioned with newer ops folds to the same result
  * as one fold over the full stream — which is what makes the incremental
  * [[applyBatch]] equal to a from-scratch replay.
  *
  * == Scale (100 TB state, 1000 executors) ==
  * [[fold]] is ONE hash aggregation (map-side combined — per-identity op
  * runs collapse before the exchange) plus a per-group array filter; no
  * joins, no windows. [[applyBatch]] touches only the batch's identities:
  * the state scan is restricted by a BROADCAST semi join of the (small,
  * batch-bounded) touched-identity set — the table side never shuffles, and
  * the diff/fold shuffles are O(touched), not O(state).
  */
object SinkOpState {

  /** action → structure (the SinkOp algebra's complete keyed-store surface;
    * MQ `SEND` and script-only ops have no state semantics and are rejected).
    */
  val StructureOf: Map[String, String] = Map(
    "SET" -> "string", "DEL" -> "string",
    "HSET" -> "hash", "HDEL" -> "hash",
    "SADD" -> "set", "SREM" -> "set",
    "ZADD" -> "zset", "ZREM" -> "zset",
    "RPUSH" -> "list", "LREM" -> "list")

  /** Ops that remove state (LREM is value-addressed — see fold semantics). */
  val Removals: Set[String] = Set("DEL", "HDEL", "SREM", "ZREM", "LREM")

  /** Identity columns of a state row; `uid` disambiguates list duplicates
    * ('' for non-list, the creating push's ord for list entries).
    */
  val KeyCols: Seq[String] = Seq("target", "structure", "key", "field", "elem", "uid")

  /** State-table row shape: identity + payload + the creating op's ord. */
  val StateSchema: StructType = StructType(Seq(
    StructField("target", StringType, nullable = false),
    StructField("structure", StringType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("field", StringType, nullable = false),
    StructField("elem", StringType, nullable = false),
    StructField("uid", StringType, nullable = false),
    StructField("value", StringType),
    StructField("score", DoubleType),
    StructField("ord", LongType)))

  private def structureCol(action: Column): Column =
    StructureOf.foldLeft(lit(null).cast("string")) { case (acc, (a, s)) =>
      when(action === a, s).otherwise(acc)
    }

  /** Normalize an op stream (target, action, key, field, score, value, ord)
    * to identity columns. Unknown actions fail loudly — silently dropping an
    * op would corrupt state.
    */
  private def normalize(ops: DataFrame): DataFrame = {
    val st = structureCol(col("action"))
    ops.select(
      col("target"), st.as("structure"), col("action"),
      col("key"),
      when(st === "hash", coalesce(col("field"), lit(""))).otherwise("").as("field"),
      when(st.isin("set", "zset", "list"), coalesce(col("value"), lit("")))
        .otherwise("").as("elem"),
      col("value"), col("score"), col("ord"))
      .withColumn("structure",
        when(col("structure").isNotNull, col("structure"))
          .otherwise(raise_error(concat(lit("SinkOpState: unknown action "),
            col("action")))))
  }

  /** Fold an ord-carrying op stream to final state rows ([[StateSchema]]).
    * One aggregation; see the class doc for semantics.
    */
  def fold(ops: DataFrame): DataFrame = {
    val removalsSeq = Removals.toSeq
    val g = normalize(ops)
      .groupBy("target", "structure", "key", "field", "elem")
      .agg(
        max_by(
          struct(col("ord"), col("action"), col("value"), col("score")),
          col("ord")).as("win"),
        max(when(col("action").isin(removalsSeq: _*), col("ord"))).as("lastRem"),
        collect_list(when(col("action") === "RPUSH", col("ord"))).as("pushes"))
    val others = g.where(col("structure") =!= "list" &&
        !col("win.action").isin(removalsSeq: _*))
      .select(col("target"), col("structure"), col("key"), col("field"),
        col("elem"), lit("").as("uid"),
        col("win.value").as("value"), col("win.score").as("score"),
        col("win.ord").as("ord"))
    val lists = g.where(col("structure") === "list")
      .select(col("target"), col("structure"), col("key"), col("field"),
        col("elem"),
        explode(filter(col("pushes"),
          p => p > coalesce(col("lastRem"), lit(Long.MinValue)))).as("ord"))
      .select(col("target"), col("structure"), col("key"), col("field"),
        col("elem"), col("ord").cast("string").as("uid"),
        col("elem").as("value"), lit(0.0).as("score"), col("ord"))
    others.unionByName(lists)
  }

  /** Create (or load) a state table under `dir`, bucketed by `key` so
    * repeated batches against the same keyspace co-locate.
    */
  def createOrLoad(spark: SparkSession, dir: String, numBuckets: Int = 32): LakeTable =
    if (LakeTable.exists(dir)) LakeTable.load(spark, dir)
    else LakeTable.create(spark, dir, StateSchema, KeyCols, Seq("key"), numBuckets)

  /** Re-express live state rows as the ops that would recreate them (the
    * associativity hinge: fold(stateAsOps ∪ newOps) == fold(allOps)).
    */
  private def stateAsOps(state: DataFrame): DataFrame =
    state.select(
      col("target"),
      when(col("structure") === "string", "SET")
        .when(col("structure") === "hash", "HSET")
        .when(col("structure") === "set", "SADD")
        .when(col("structure") === "zset", "ZADD")
        .otherwise("RPUSH").as("action"),
      col("key"),
      when(col("field") === "", lit(null)).otherwise(col("field")).as("field"),
      col("score"), col("value"), col("ord"))

  /** Apply one micro-batch of ops (target, action, key, field, score, value,
    * ord — ord monotone across batches) to the state table, exactly-once via
    * the engine's (pipelineId, epoch) fence. foreachBatch-ready.
    */
  def applyBatch(table: LakeTable, batchOps: DataFrame, epoch: Long,
      pipelineId: String = "", allowTakeover: Boolean = false): MergeResult = {
    val prepped = normalize(batchOps)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val ident = Seq("target", "structure", "key", "field", "elem")
      val touched = prepped.select(ident.map(col): _*).distinct()
      // batch-bounded set broadcast against the state scan: the table side
      // never shuffles, and parquet row groups outside the touched keyspace
      // are skipped by the join's runtime filter at best, column stats at
      // least. (At 10^10-row state the win is not scanning: state is
      // bucketed by key, and the scan prunes via min/max on `key`.)
      val old = table.snapshot()
        .join(broadcast(touched), ident, "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val folded = fold(stateAsOps(old).unionByName(
          prepped.select("target", "action", "key", "field", "score", "value", "ord")))
        val outCols = StateSchema.fieldNames.toSeq
        // diff old vs folded by FULL row: unchanged entries produce no churn
        val inserts = folded.select(outCols.map(col): _*)
          .exceptAll(old.select(outCols.map(col): _*))
        val deletes = old.select(KeyCols.map(col): _*)
          .except(folded.select(KeyCols.map(col): _*))
          .select(col("target"), col("structure"), col("key"), col("field"),
            col("elem"), col("uid"),
            lit(null).cast("string").as("value"),
            lit(null).cast("double").as("score"),
            lit(null).cast("long").as("ord"))
        val changes = inserts.withColumn("_op", lit("insert"))
          .unionByName(deletes.withColumn("_op", lit("delete")))
          .withColumn("_pos", lit(epoch))
          .withColumn("_event_ts", lit(null).cast("timestamp"))
          .select((Seq("_op", "_pos", "_event_ts") ++ outCols).map(col): _*)
        MergeInto.merge(table, changes, epoch,
          pipelineId = pipelineId, allowTakeover = allowTakeover)
      } finally { old.unpersist(); () }
    } finally { prepped.unpersist(); () }
  }
}
