package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.graftbridge.Bridge

/** Winnowing-style 64-bit content fingerprint: the minimum of a rolling hash
  * over all byte n-grams of the input string, computed in ONE streaming pass
  * as a native Catalyst `Expression`.
  *
  * Replaces the round-1 `sequence(1, length-n+1)` + `transform` formulation,
  * which materialized an O(len) array of hashes per document — a 1 MB doc
  * allocated ~8 MB per row, the wrong shape for a 100 TB corpus scan. This
  * expression allocates nothing beyond the accumulator.
  */
case class RollingMin64(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes() = {
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_min64 needs string, got $other")
    }
  }
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(RollingMin64.evalBytes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes, n))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = RollingMin64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"($cls.evalBytes($c.getBytes(), $n))"
    })
  override protected def withNewChildInternal(newChild: Expression): RollingMin64 =
    copy(child = newChild)
  override def prettyName: String = "rolling_min64"
}

object RollingMin64 {
  /** min over all byte n-gram hashes (FNV + splitmix64 finalizer per gram;
    * whole-string hash when shorter than n). One pass, O(1) extra space.
    */
  def evalBytes(bytes: Array[Byte], n: Int): Long = {
    if (bytes.length < n) return SimHash64.hashBytes(bytes)
    var best = Long.MaxValue
    var i = 0
    val last = bytes.length - n
    while (i <= last) {
      // FNV over the window, then splitmix64 finalize (same mix as SimHash64)
      var h = 0xcbf29ce484222325L
      var j = i
      val end = i + n
      while (j < end) { h = (h ^ (bytes(j) & 0xffL)) * 0x100000001b3L; j += 1 }
      h += 0x9e3779b97f4a7c15L
      h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
      h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
      h = h ^ (h >>> 31)
      if (h < best) best = h
      i += 1
    }
    best
  }

  /** Column API: rolling_min64(string, n) → long. */
  def apply(c: Column, n: Int): Column = Bridge.column(RollingMin64(Bridge.expression(c), n))
}
