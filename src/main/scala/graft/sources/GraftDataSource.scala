package graft.sources

import graft.lake.LakeTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("graft")` facade: external Spark jobs (and plain SQL —
  * `CREATE TABLE t USING graft OPTIONS (path '…')`) read a LakeTable without
  * touching the Scala API.
  *
  * Design note: the MOR resolve (manifest-pruned file set, delta/base LWW
  * fold, tombstone drop) already IS a Catalyst plan — [[LakeTable.snapshot]]
  * builds it. A native DSv2 `PartitionReaderFactory` would have to
  * re-implement that merge inside row readers and would LOSE the vectorized
  * parquet scan underneath. So the facade is the thin `RelationProvider`
  * shim: resolve the table, hand Spark the snapshot plan. Column pruning and
  * (best-effort) filters are applied to that plan, where they reach the
  * parquet scans through the ordinary optimizer.
  *
  * Options: `path` (the table root; positional `.load(dir)` works),
  * `version` (optional time travel to a committed metadata version —
  * pure read, same guarantee as [[LakeTable.snapshotAt]]).
  */
class GraftDataSource extends RelationProvider with DataSourceRegister
    with StreamSourceProvider {
  override def shortName(): String = "graft"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source needs a table dir: .load(dir) or option(\"path\", dir)"))

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    // validate eagerly (a bad path should fail at CREATE, not first SELECT)
    LakeTable.load(ctx.sparkSession, path)
    GraftRelation(ctx, path, parameters.get("version").map(_.toInt))
  }

  // ---- streaming tail: spark.readStream.format("graft").load(dir) ----
  // (see GraftStreamSource for semantics; offsets = table versions)

  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(), GraftStreamSource.changeSchema(
      LakeTable.load(ctx.sparkSession, pathOf(parameters)).meta.schema))

  override def createSource(ctx: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    new GraftStreamSource(ctx.sparkSession, pathOf(parameters), parameters)
}

final case class GraftRelation(ctx: SQLContext, path: String,
    version: Option[Int]) extends BaseRelation with PrunedFilteredScan {
  override def sqlContext: SQLContext = ctx

  /** Resolve the snapshot at READ time, not relation-creation time: a
    * persistent/temp view over the format caches this relation, and a CDC
    * table keeps merging underneath it — each scan must see the latest
    * committed version (time travel pins one explicitly via `version`).
    */
  private def resolve(): DataFrame = {
    val table = LakeTable.load(ctx.sparkSession, path)
    version match {
      case Some(v) => table.snapshotAt(v)
      case None => table.snapshot()
    }
  }

  // the declared shape is pinned at creation (schema evolution needs a view
  // refresh, as with any catalog relation)
  override val schema: StructType = resolve().schema
  // buildScan returns the snapshot plan's InternalRows directly — no
  // external-Row round trip
  override def needConversion: Boolean = false

  /** The delegated plan for one (columns, filters) request — separated from
    * [[buildScan]] so plan-quality tests can assert that pruning and pushed
    * filters reach the parquet scans INSIDE the snapshot resolve (the outer
    * query only shows an opaque row-source scan).
    */
  private[graft] def planFor(requiredColumns: Array[String],
      filters: Array[Filter]): DataFrame = {
    val filtered = filters.flatMap(translate(_).map(_._1)).foldLeft(resolve())(_ where _)
    filtered.select(requiredColumns.toSeq.map(col): _*)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    planFor(requiredColumns, filters).queryExecution.toRdd.asInstanceOf[RDD[Row]]

  /** Best-effort filter translation returning (predicate, exact). DSv1
    * filters are advisory — Spark re-applies every filter above the scan —
    * so a PRUNING predicate only has to be a SUPERSET of the original (keep
    * at least every matching row); dropping an untranslatable filter is
    * always safe. Exactness is tracked because supersets do not survive
    * negation: And may keep one translated conjunct (still a superset) and
    * Or of two supersets is a superset, but Not(superset) would DROP rows
    * the original keeps — e.g. Not(And(untranslatable, p)) must not become
    * NOT(p) — so Not only accepts an EXACT child. (Catalyst usually
    * De-Morgans Not(And) away before pushdown, but the Filter API doesn't
    * guarantee it.)
    */
  private def translate(f: Filter): Option[(Column, Boolean)] = f match {
    case EqualTo(a, v) => Some((col(a) === lit(v), true))
    case GreaterThan(a, v) => Some((col(a) > lit(v), true))
    case GreaterThanOrEqual(a, v) => Some((col(a) >= lit(v), true))
    case LessThan(a, v) => Some((col(a) < lit(v), true))
    case LessThanOrEqual(a, v) => Some((col(a) <= lit(v), true))
    case In(a, vs) => Some((col(a).isin(vs.toSeq: _*), true))
    case IsNull(a) => Some((col(a).isNull, true))
    case IsNotNull(a) => Some((col(a).isNotNull, true))
    case StringStartsWith(a, v) => Some((col(a).startsWith(v), true))
    case StringEndsWith(a, v) => Some((col(a).endsWith(v), true))
    case StringContains(a, v) => Some((col(a).contains(v), true))
    case And(l, r) =>
      (translate(l), translate(r)) match {
        case (Some((lc, le)), Some((rc, re))) => Some((lc && rc, le && re))
        case (one, other) => // partial conjunct: superset, not exact
          one.orElse(other).map { case (c, _) => (c, false) }
      }
    case Or(l, r) => for {
      (lc, le) <- translate(l); (rc, re) <- translate(r)
    } yield (lc || rc, le && re)
    case Not(c) => translate(c).collect { case (cc, true) => (!cc, true) }
    case _ => None
  }
}
