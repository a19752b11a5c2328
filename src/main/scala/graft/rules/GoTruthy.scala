package graft.rules

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Length, OctetLength, RuntimeReplaceable, Size, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Go text/template truthiness (`{{if P}}`) as a native Catalyst expression.
  *
  * Go's `if` tests "the zero value of the operand's type"
  * (text/template: IsTrue): false/0/""/empty-collection/nil are falsy —
  * notably numeric 0, which a string-form test ("non-empty") silently treats
  * as TRUE. The reference accepts templates over typed row values
  * (reference: global/rule.go:219-226), so a ported config with a numeric
  * conditional must branch the Go way.
  *
  * The type dispatch happens ONCE, at analysis/codegen time, on the child's
  * resolved `dataType` — the generated code per row is a single comparison,
  * no runtime type tests and no UDF. null (Go nil) is falsy, so the
  * expression itself is never null.
  *
  * Domain note: structs/binary/timestamps have no Go zero-value analog in
  * our value domain — any non-null value of those types is truthy.
  */
case class GoTruthy(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    java.lang.Boolean.valueOf(v != null && (child.dataType match {
      case BooleanType => v.asInstanceOf[Boolean]
      case ByteType | ShortType | IntegerType | LongType =>
        v.asInstanceOf[Number].longValue != 0L
      case FloatType => v.asInstanceOf[Float] != 0f
      case DoubleType => v.asInstanceOf[Double] != 0d
      case _: DecimalType => !v.asInstanceOf[Decimal].isZero
      case _: StringType => v.asInstanceOf[UTF8String].numBytes > 0
      case _: ArrayType => v.asInstanceOf[ArrayData].numElements > 0
      case _: MapType => v.asInstanceOf[MapData].numElements > 0
      case _ => true
    }))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val v = c.value.toString
    val test = child.dataType match {
      case BooleanType => v
      case ByteType | ShortType | IntegerType | LongType => s"($v != 0)"
      case FloatType => s"($v != 0.0f)"
      case DoubleType => s"($v != 0.0)"
      case _: DecimalType => s"(!$v.isZero())"
      case _: StringType => s"($v.numBytes() > 0)"
      case _: ArrayType => s"($v.numElements() > 0)"
      case _: MapType => s"($v.numElements() > 0)"
      case _ => "true"
    }
    ev.copy(
      code = code"""
        ${c.code}
        final boolean ${ev.value} = !${c.isNull} && $test;
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): GoTruthy =
    copy(child = newChild)
  override def prettyName: String = "go_truthy"
}

object GoTruthy {
  def apply(c: Column): Column = Bridge.column(GoTruthy(Bridge.expression(c)))
}

/** Go's `len` for templates, typed at analysis time like [[GoTruthy]]:
  * array/map → element count, string → BYTE length (Go strings are byte
  * slices — `len("héllo")` is 6, not 5). Anything else falls back to the
  * length of its RENDERED string form via Spark's own cast (so a timestamp
  * measures "2024-01-01 00:00:00", not its internal micros; Go would
  * reject `len 23` at parse time — a template must not kill a batch, so
  * degrade gracefully). Null → null (renders "" downstream).
  *
  * RuntimeReplaceable: the dispatch rewrites to existing codegen'd
  * expressions (octet_length / size / length∘cast) at optimization time —
  * no custom eval path to maintain.
  */
case class GoLen(child: Expression) extends RuntimeReplaceable
    with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: StringType => OctetLength(child)
    case _: ArrayType | _: MapType => Size(child, legacySizeOfNull = false)
    case _ => Length(Cast(child, org.apache.spark.sql.types.StringType))
  }
  override protected def withNewChildInternal(newChild: Expression): GoLen =
    copy(child = newChild)
  override def prettyName: String = "go_len"
}

object GoLen {
  def apply(c: Column): Column = Bridge.column(GoLen(Bridge.expression(c)))
}
