package graft.functions

import graft.changelog.{PgHstore, PgTextArray}
import graft.rules.{GoLen, GoTruthy}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, BooleanType, StringType}

/** SQL-name registration for the engine's custom Catalyst expressions, so
  * the RUNTIME expression surface — YAML `computed:` / `filter:` strings,
  * `ops:` key/value expressions ([[graft.rules.ExprTransform]]), and plain
  * `spark.sql` — can reach them without Scala. Two entry points:
  *
  *  - [[GraftFunctions.register]]: registers into a live session's function
  *    registry (called automatically by the config pipeline, so an app.yml
  *    can say `computed: {tags: "pg_text_array(raw_tags)"}`);
  *  - [[GraftExtensions]]: the `spark.sql.extensions` hook for external
  *    jobs (`--conf spark.sql.extensions=graft.GraftExtensions`), the
  *    standard injection point the facade's SQL users would configure.
  */
object GraftFunctions {

  private def one(name: String)(f: Expression => Expression)
      : (String, Seq[Expression] => Expression) =
    name -> { (cs: Seq[Expression]) =>
      require(cs.size == 1, s"$name expects 1 argument, got ${cs.size}")
      f(cs.head)
    }

  // pg_bool/pg_bytea are Column-level compositions in PgDecode; a function
  // builder must return a PURE catalyst tree (the Column DSL wraps nodes the
  // analyzer won't resolve inside a registry builder), so they are rebuilt
  // here expression-for-expression with the same semantics
  private def pgBoolExpr(e: Expression): Expression = {
    val s = Lower(StringTrim(Cast(e, StringType)))
    CaseWhen(Seq(
      (IsNull(e), Literal.create(null, BooleanType)),
      (In(s, Seq(Literal("t"), Literal("true"))), Literal(true)),
      (In(s, Seq(Literal("f"), Literal("false"))), Literal(false))),
      Literal.create(null, BooleanType))
  }
  private def pgByteaExpr(e: Expression): Expression = {
    val s = Cast(e, StringType)
    CaseWhen(Seq(
      (IsNull(e), Literal.create(null, BinaryType)),
      (StartsWith(s, Literal("\\x")),
        Unhex(Substring(s, Literal(3), Subtract(Length(s), Literal(2)))))),
      Cast(s, BinaryType))
  }

  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    one("pg_text_array")(PgTextArray(_)),
    one("pg_hstore")(PgHstore(_)),
    one("pg_bool")(pgBoolExpr),
    one("pg_bytea")(pgByteaExpr),
    one("go_truthy")(GoTruthy(_)),
    one("go_len")(GoLen(_)),
    one("simhash64")(SimHash64(_)),
    "rolling_min64" -> { (cs: Seq[Expression]) =>
      require(cs.size == 2, s"rolling_min64(str, n) expects 2 arguments, got ${cs.size}")
      // fold first so constant arithmetic (4+4) qualifies; then accept only
      // integral literal types — a string/decimal literal gets the intended
      // argument error, not an opaque ClassCastException
      val folded = cs(1) match {
        case l: Literal => l
        case e if e.foldable => Literal.create(e.eval(), e.dataType)
        case other => throw new IllegalArgumentException(
          s"rolling_min64 n must be a constant integer, got $other")
      }
      val n = folded match {
        case Literal(v: Int, _) => v
        case Literal(v: Long, _) => v.toInt
        case Literal(v: Short, _) => v.toInt
        case Literal(v: Byte, _) => v.toInt
        case Literal(v, t) => throw new IllegalArgumentException(
          s"rolling_min64 n must be a constant integer, got $v: ${t.sql}")
      }
      RollingMin64(cs.head, n)
    })

  /** Idempotent per-session registration (createOrReplace). */
  def register(spark: SparkSession): Unit = builders.foreach { case (name, b) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
  }
}

