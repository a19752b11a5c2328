package graft.oracle

import org.apache.spark.sql.{DataFrame, Row}

import scala.collection.mutable

/** Reference-semantics oracle (test-only; SURVEY.md §5.2): a single-threaded
  * in-memory applier that replays decoded change events exactly the way the
  * reference's lone listener goroutine does (reference:
  * service/handler.go:135-194) — strictly in change-log order, one at a time:
  * insert/update upsert the key (Lua-mongo UPSERT semantics,
  * reference: service/endpoint/mongo.go:144-153), delete removes it,
  * delete-of-absent is a no-op (reference: elastic7.go:230-233).
  *
  * Events are ordered by (pos, ts, op-rank) — the engine's total LWW order —
  * which coincides with arrival order for the generator's monotone positions;
  * replayed duplicate spans land on identical positions with identical
  * content, so fold order between duplicates is immaterial.
  *
  * This collects to the driver by design: it must stay trivially,
  * sequentially correct, never fast.
  */
object ReferenceOracle {

  /** Final expected state from a merge-input DataFrame
    * (`_op,_pos,_event_ts` + row columns): map of key values → row values
    * (field name → value), where key = the first `keyCols`.
    */
  def expectedState(decoded: DataFrame, keyCols: Seq[String]): Map[Seq[Any], Map[String, Any]] = {
    val cols = decoded.columns
    val rowCols = cols.filterNot(graft.changelog.ChangelogCodec.MetaCols.toSet)
    val events = decoded.collect()
    val rank = Map("insert" -> 0, "update" -> 1, "delete" -> 2)
    val ordered = events.sortBy { r =>
      val ts = r.getAs[java.sql.Timestamp]("_event_ts")
      (r.getAs[Long]("_pos"), if (ts == null) 0L else ts.getTime,
        rank(r.getAs[String]("_op")))
    }
    val state = mutable.LinkedHashMap.empty[Seq[Any], Map[String, Any]]
    ordered.foreach { r =>
      val key = keyCols.map(k => normalize(r.getAs[Any](k)))
      r.getAs[String]("_op") match {
        case "delete" => state.remove(key)
        case _ =>
          state(key) = rowCols.map(c => c -> normalize(r.getAs[Any](c))).toMap
      }
    }
    state.toMap
  }

  /** Engine output (a snapshot DataFrame) in the same shape for comparison. */
  def actualState(snapshot: DataFrame, keyCols: Seq[String]): Map[Seq[Any], Map[String, Any]] = {
    val rowCols = snapshot.columns
    snapshot.collect().map { r =>
      keyCols.map(k => normalize(r.getAs[Any](k))) ->
        rowCols.map(c => c -> normalize(r.getAs[Any](c))).toMap
    }.toMap
  }

  /** Widen numerics so int-vs-long (type-widen evolution) compares equal. */
  private def normalize(v: Any): Any = v match {
    case i: java.lang.Integer => i.longValue()
    case s: java.lang.Short   => s.longValue()
    case f: java.lang.Float   => f.doubleValue()
    case t: java.sql.Timestamp => t.getTime
    case other => other
  }

  /** Detailed diff for assertion messages: (missingKeys, extraKeys,
    * differingKeys with (field, expected, actual)).
    */
  def diff(expected: Map[Seq[Any], Map[String, Any]],
           actual: Map[Seq[Any], Map[String, Any]])
      : (Set[Seq[Any]], Set[Seq[Any]], Seq[(Seq[Any], String, Any, Any)]) = {
    val missing = expected.keySet -- actual.keySet
    val extra = actual.keySet -- expected.keySet
    val differing = expected.keySet.intersect(actual.keySet).toSeq.flatMap { k =>
      val e = expected(k); val a = actual(k)
      (e.keySet ++ a.keySet).toSeq.flatMap { f =>
        val ev = e.getOrElse(f, null); val av = a.getOrElse(f, null)
        if (ev != av) Some((k, f, ev, av)) else None
      }
    }
    (missing, extra, differing)
  }
}
