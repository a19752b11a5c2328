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
class GraftDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(ctx: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "graft source needs a table dir: .load(dir) or option(\"path\", dir)"))
    // validate eagerly (a bad path should fail at CREATE, not first SELECT)
    LakeTable.load(ctx.sparkSession, path)
    GraftRelation(ctx, path, parameters.get("version").map(_.toInt))
  }
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
    val filtered = filters.flatMap(translate).foldLeft(resolve())(_ where _)
    filtered.select(requiredColumns.toSeq.map(col): _*)
  }

  override def buildScan(requiredColumns: Array[String],
      filters: Array[Filter]): RDD[Row] =
    planFor(requiredColumns, filters).queryExecution.toRdd.asInstanceOf[RDD[Row]]

  /** Best-effort filter translation. DSv1 filters are advisory — Spark
    * re-applies every filter above the scan — so dropping an untranslatable
    * one is always safe; a translated one prunes the parquet scan.
    */
  private def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) =>
      // one translatable conjunct still prunes (conjunction is monotone);
      // Or/Not need BOTH sides, or the rewrite would drop rows
      (translate(l), translate(r)) match {
        case (Some(lc), Some(rc)) => Some(lc && rc)
        case (one, other) => one.orElse(other)
      }
    case Or(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case _ => None
  }
}
