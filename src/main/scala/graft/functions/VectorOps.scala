package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** One-pass cosine similarity over embedding arrays as a native Catalyst
  * `Expression`. The higher-order-function formulation
  * (`aggregate(zip_with(a, b, …))`) is INTERPRETED — ~20 boxed lambda
  * evaluations per element — which dominated the similarity queries
  * (bounded O(n²) verify at sf0.1 spent ~10 s on 500k 64-dim pairs). This
  * kernel accumulates dot(a,b), dot(a,a), dot(b,b) in one loop with the
  * SAME element order and double arithmetic as the HOF form, so results are
  * bit-identical (the DuckDB oracle comparisons stay exact).
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null even for non-null inputs (length mismatch / null element) — the
  // default child-derived nullability would let codegen pin isNull to false
  override def nullable: Boolean = true
  private def ok(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes() =
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim needs array<float|double>, got ${left.dataType}, ${right.dataType}")

  private lazy val leftIsFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val v = CosineSim.eval(a, b, leftIsFloat, rightIsFloat)
    if (v == null) null else java.lang.Double.valueOf(v)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = $cls.eval($a, $b, $leftIsFloat, $rightIsFloat);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

object CosineSim {
  /** Null if lengths differ (zip_with would null-pad → null sum) or any
    * element is null — matching the HOF formulation's null propagation.
    */
  def eval(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y; aa += x * x; bb += y * y
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    java.lang.Double.valueOf(ab / math.max(denom, 1e-12))
  }

  def apply(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
