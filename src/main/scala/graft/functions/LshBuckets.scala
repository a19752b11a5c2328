package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** All-tables random-hyperplane LSH bucket ids in ONE native pass — the
  * codegen'd replacement for nTables × [[Similarity.lshBucket]] HOF chains
  * (each an INTERPRETED `aggregate(zip_with(planeLiteral, vec, …))`:
  * nTables × nBits × dim boxed lambda evaluations per row dominated q28).
  *
  * Bit-identical to the HOF formulation by construction:
  *  - plane components are regenerated on the fly with the SAME splitmix64
  *    stream as [[Similarity.hyperplanes]] (seeded by (table, bit, dim)),
  *    so the double values equal the `typedLit` plane literals exactly;
  *  - each dot product accumulates `plane(d) * vec(d).toDouble` in index
  *    order from 0.0 — the HOF's left fold order;
  *  - bucket folds MSB-first (`acc * 2 + bit`), bit = dot > 0;
  *  - a null element or a vector whose length differs from `dim` nulls every
  *    zip_with product in the HOF form, making every dot NULL and every
  *    `when(dot > 0, 1).otherwise(0)` bit 0 — mirrored here by returning
  *    all-zero buckets.
  */
case class LshBuckets(child: Expression, dim: Int, nBits: Int, nTables: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets needs array<float|double>, got $other")
  }
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any =
    LshBuckets.eval(input.asInstanceOf[ArrayData], isFloat, dim, nBits, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = LshBuckets.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"($cls.eval($c, $isFloat, $dim, $nBits, $nTables))"
    })
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
  override def prettyName: String = "lsh_buckets"
}

object LshBuckets {
  def eval(vec: ArrayData, isFloat: Boolean, dim: Int, nBits: Int,
      nTables: Int): GenericArrayData = {
    val out = new Array[Long](nTables)
    val n = vec.numElements()
    var ok = n == dim
    var i = 0
    while (ok && i < n) { if (vec.isNullAt(i)) ok = false; i += 1 }
    if (ok) {
      // hoist the element loads out of the (table, bit) loops
      val v = new Array[Double](n)
      i = 0
      while (i < n) {
        v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        i += 1
      }
      var t = 0
      while (t < nTables) {
        var bucket = 0L
        var b = 0
        while (b < nBits) {
          var dot = 0.0
          var d = 0
          while (d < n) {
            // splitmix64 of (t, b, d) — identical to Similarity.hyperplanes
            var h = t.toLong * 0x9e3779b97f4a7c15L + b.toLong * 0xbf58476d1ce4e5b9L +
              d.toLong * 0x94d049bb133111ebL + 0x2545f4914f6cdd1dL
            h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
            h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
            h = h ^ (h >>> 31)
            dot += ((h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0) * v(d)
            d += 1
          }
          bucket = bucket * 2 + (if (dot > 0) 1L else 0L)
          b += 1
        }
        out(t) = bucket
        t += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Column API: array of nTables bucket ids for tables 0..nTables-1. */
  def apply(vec: Column, dim: Int, nBits: Int, nTables: Int): Column =
    Bridge.column(LshBuckets(Bridge.expression(vec), dim, nBits, nTables))
}
