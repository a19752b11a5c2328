package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Deterministic (id-sorted, sequential-fold) element-wise mean of a
  * collected set of vectors — the native kernel behind the `deterministic`
  * Lloyd step in [[Similarity.ivfTopK]].
  *
  * Input: `array<struct<k: long, vec: array<float|double>>>` (from
  * `collect_list(struct(id, vec))`). Output: `array<double>` where
  * `out(i) = (Σ_{rows in ascending k order} vec(i).toDouble) / n` — the
  * EXACT IEEE-754 addition order of the previous formulation
  * (`aggregate(transform(array_sort(collect_list(struct(k, v)))), 0.0, +) /
  * count` per (cell, dim)), so the DuckDB oracle replay (q29) still matches
  * bit for bit. What changed is only the execution shape: one 5k-row
  * shuffle of (cell, id, vec) instead of an n×dim-row posexplode shuffle,
  * and one native pass instead of ~n×dim interpreted lambda evaluations.
  *
  * Width = the first row's vector length; rows whose vectors are shorter
  * contribute nothing to the missing tail (the posexplode form simply had
  * no row for those (cell, dim) pairs — but then count(*) differed per dim;
  * this kernel divides every dim by the SAME n, so inputs must be
  * uniform-width, as embedding corpora are — enforced with an exception
  * rather than silently diverging from the replayed oracle).
  */
case class CentroidMeanSorted(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, ArrayType(FloatType | DoubleType, _), _, _))), _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"centroid_mean_sorted needs array<struct<long, array<float|double>>>, got $other")
  }
  private lazy val isFloat = child.dataType.asInstanceOf[ArrayType].elementType
    .asInstanceOf[StructType].fields(1).dataType
    .asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    CentroidMeanSorted.eval(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = CentroidMeanSorted.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"($cls.eval($c, $isFloat))"
    })
  override protected def withNewChildInternal(newChild: Expression): CentroidMeanSorted =
    copy(child = newChild)
  override def prettyName: String = "centroid_mean_sorted"
}

object CentroidMeanSorted {
  def eval(rows: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = rows.numElements()
    require(n > 0, "centroid_mean_sorted over an empty group")
    // sort (k, vec) pairs by k — ids are unique, so this is a total order
    val pairs = new Array[(Long, ArrayData)](n)
    var i = 0
    while (i < n) {
      val r = rows.getStruct(i, 2)
      pairs(i) = (r.getLong(0), r.getArray(1))
      i += 1
    }
    java.util.Arrays.sort(pairs, Ordering.by((p: (Long, ArrayData)) => p._1))
    val dim = pairs(0)._2.numElements()
    val acc = new Array[Double](dim)
    i = 0
    while (i < n) {
      val v = pairs(i)._2
      require(v.numElements() == dim,
        s"centroid_mean_sorted: mixed vector widths (${v.numElements()} vs $dim)")
      var d = 0
      while (d < dim) {
        acc(d) += (if (isFloat) v.getFloat(d).toDouble else v.getDouble(d))
        d += 1
      }
      i += 1
    }
    i = 0
    while (i < dim) { acc(i) /= n; i += 1 }
    new GenericArrayData(acc)
  }

  def apply(c: Column): Column =
    Bridge.column(CentroidMeanSorted(Bridge.expression(c)))
}
