package graft.sources

import org.apache.spark.sql.{Dataset, Encoder}

/** Executor-side connector for per-row point lookups against a live store —
  * the escape hatch matching the reference's in-script `dbOps.selectOne`
  * (reference: service/luaengine/db_actuator.go:39-124), where a Lua
  * transform queries the source DB per event for dimension enrichment.
  *
  * Broadcast-join enrichment (QueryCatalog.joinEnrich) is ALWAYS the first
  * choice — it batches, prunes and scales. Use this only when the dimension
  * genuinely cannot be snapshotted (hot keyed store mutating mid-stream).
  * One connector per PARTITION: `open()` once, `lookup` per row, `close()`
  * at partition end — the standard mapPartitions-with-connection shape, so
  * a 1000-executor run opens 1000s of connections, not billions.
  */
trait PointLookup[K, V] extends Serializable {
  def open(): Unit = ()
  def lookup(key: K): Option[V]
  def close(): Unit = ()
}

object PointLookup {

  /** Enrich a typed Dataset with per-row lookups. `factory` builds the
    * connector ON THE EXECUTOR (the factory ships, not a live connection);
    * `key` extracts the lookup key; `merge` combines the row with the
    * (optional) hit. The connector closes on task COMPLETION (success,
    * failure, or early stop such as limit()) via the task listener — a
    * drain-only close would leak connections on lookup errors and retries.
    */
  def enrich[T, K, V, R: Encoder](ds: Dataset[T], factory: () => PointLookup[K, V])
      (key: T => K)(merge: (T, Option[V]) => R): Dataset[R] =
    ds.mapPartitions { rows =>
      val conn = factory()
      conn.open()
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null) ctx.addTaskCompletionListener[Unit](_ => conn.close())
      val out = rows.map(t => merge(t, conn.lookup(key(t))))
      if (ctx != null) out
      else out ++ { conn.close(); Iterator.empty } // no task context (local tests)
    }
}
