package graft.changelog

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Postgres logical-decoding column-value decodes — the WAL-side sibling of
  * [[MySqlDecode]] for the north star's "MySQL binlog / Postgres WAL" pair.
  * Postgres logical decoding (test_decoding / wal2json / pgoutput text
  * values) ships every value as TEXT in output syntax; plain casts cover
  * numerics and timestamps, these cover the cases they don't:
  *
  *  - bool: `t` / `f` (decoding output) and `true` / `false`;
  *  - bytea: hex output format `\x48656c6c6f` (the server default since
  *    PG 9.0) → binary; non-`\x` input falls back to the raw bytes of the
  *    string (escape-format blobs are rare and pass through inspectable);
  *  - arrays: the `{...}` text literal with Postgres' quoting rules —
  *    quoted elements with backslash escapes, bare `NULL` elements, nested
  *    sub-arrays captured as raw `{...}` text — parsed by a native
  *    expression ([[PgTextArray]]), no UDF. Element typing stays with the
  *    caller (`cast` on the result), mirroring how [[MySqlDecode]] leaves
  *    label dictionaries to the schema;
  *  - hstore: `"k"=>"v", "k2"=>NULL` → map<string,string> ([[PgHstore]]).
  */
object PgDecode {

  /** bool output format → boolean; unrecognized text → null (a template
    * decode must not kill the batch).
    */
  def decodeBool(c: Column): Column = {
    val s = lower(trim(c.cast("string")))
    when(c.isNull, lit(null).cast("boolean"))
      .when(s.isin("t", "true"), lit(true))
      .when(s.isin("f", "false"), lit(false))
      .otherwise(lit(null).cast("boolean"))
  }

  /** bytea hex output format (`\x` + hex digits) → binary. */
  def decodeBytea(c: Column): Column = {
    val s = c.cast("string")
    when(c.isNull, lit(null).cast("binary"))
      .when(s.startsWith("\\x"), unhex(s.substr(lit(3), length(s) - lit(2))))
      .otherwise(s.cast("binary"))
  }

  /** 1-D array text literal → array<string> (null elements preserved). */
  def decodeArray(c: Column): Column = PgTextArray(c)

  /** 2-D array text literal (`{{a,b},{c,NULL}}`) → array<array<string>>:
    * the outer parse captures each balanced `{…}` sub-array as raw text
    * ([[PgTextArray]]'s nested-element rule), and a second PgTextArray pass
    * per element recurses it — a composition of the same native expression
    * inside `transform`, still codegen'd, still no UDF. A NULL sub-array
    * (bare `NULL` element) stays null; deeper nesting recurses the same way
    * one level at a time (`decodeArrayNested(decodeArrayNested(c))` is not
    * typed — for >2-D apply this once per level with `transform`).
    */
  def decodeArrayNested(c: Column): Column =
    transform(PgTextArray(c), e => PgTextArray(e))

  /** hstore output format (`"k"=>"v", "k2"=>NULL`) → map<string,string>. */
  def decodeHstore(c: Column): Column = PgHstore(c)
}

/** Parser expression for the Postgres array output syntax. One pass over
  * the literal, no regex, no UDF; dispatches per element on quote/brace/
  * bare form. Nested arrays are captured as raw `{...}` text elements so a
  * caller can recurse if needed (multidimensional arrays are rare in CDC
  * rows; flattening silently would lose structure).
  */
case class PgTextArray(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // malformed input → null (fail-soft, like decodeBool), so always nullable
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pg_text_array needs string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    PgTextArray.evalUtf8OrNull(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PgTextArray.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        ${ev.value} = $cls.evalUtf8OrNull($c);
        ${ev.isNull} = ${ev.value} == null;
      """
    })
  override protected def withNewChildInternal(newChild: Expression): PgTextArray =
    copy(child = newChild)
  override def prettyName: String = "pg_text_array"
}

/** Parser expression for the hstore output syntax: `"k"=>"v"` pairs,
  * comma-separated, values either quoted (with backslash escapes) or the
  * bare word NULL. Same one-pass no-UDF shape as [[PgTextArray]].
  */
case class PgHstore(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = true)
  // malformed input → null (fail-soft, like decodeBool), so always nullable
  override def nullable: Boolean = true
  override def checkInputDataTypes() = child.dataType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pg_hstore needs string, got $other")
  }
  override def nullSafeEval(input: Any): Any =
    PgHstore.evalUtf8OrNull(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = PgHstore.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
        ${ev.value} = $cls.evalUtf8OrNull($c);
        ${ev.isNull} = ${ev.value} == null;
      """
    })
  override protected def withNewChildInternal(newChild: Expression): PgHstore =
    copy(child = newChild)
  override def prettyName: String = "pg_hstore"
}

object PgHstore {
  def apply(c: Column): Column = Bridge.column(PgHstore(Bridge.expression(c)))

  /** Row-evaluation entry: malformed hstore text → null, never a batch
    * kill (one corrupt WAL value in a million-row micro-batch must not
    * abort the stream — [[PgDecode.decodeBool]]'s contract). [[parse]]
    * itself stays strict so tests and callers can diagnose.
    */
  def evalUtf8OrNull(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData =
    try evalUtf8(s)
    catch { case _: IllegalArgumentException => null }

  def evalUtf8(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val (ks, vs) = parse(s.toString)
    new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      new GenericArrayData(ks.map[Any](UTF8String.fromString)),
      new GenericArrayData(vs.map[Any](v =>
        if (v == null) null else UTF8String.fromString(v))))
  }

  /** `"k"=>"v", "k2"=>NULL` → (keys, values); values null for bare NULL. */
  def parse(s: String): (Array[String], Array[String]) = {
    val keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val vals = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i).isWhitespace) i += 1
    def quoted(): String = {
      require(i < n && s.charAt(i) == '"', s"expected quote at $i in hstore: $s")
      i += 1
      val sb = new StringBuilder
      var closed = false
      while (i < n && !closed) {
        val ch = s.charAt(i)
        if (ch == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
        else if (ch == '"') { closed = true; i += 1 }
        else { sb.append(ch); i += 1 }
      }
      require(closed, s"unterminated quote in hstore: $s")
      sb.result()
    }
    skipWs()
    while (i < n) {
      keys += quoted()
      skipWs()
      require(i + 1 < n && s.charAt(i) == '=' && s.charAt(i + 1) == '>',
        s"expected => at $i in hstore: $s")
      i += 2
      skipWs()
      if (i < n && s.charAt(i) == '"') vals += quoted()
      else {
        val j0 = i
        while (i < n && s.charAt(i) != ',' && !s.charAt(i).isWhitespace) i += 1
        val bare = s.substring(j0, i)
        require(bare.equalsIgnoreCase("NULL"),
          s"unquoted hstore value must be NULL, got '$bare' in: $s")
        vals += null
      }
      skipWs()
      if (i < n) {
        require(s.charAt(i) == ',', s"expected , at $i in hstore: $s")
        i += 1
        skipWs()
      }
    }
    (keys.toArray, vals.toArray)
  }
}

object PgTextArray {
  def apply(c: Column): Column = Bridge.column(PgTextArray(Bridge.expression(c)))

  /** codegen entry point. */
  /** Row-evaluation entry: malformed array text → null (see [[PgHstore
    * .evalUtf8OrNull]]); [[parse]] stays strict for tests and callers.
    */
  def evalUtf8OrNull(s: UTF8String): ArrayData =
    try evalUtf8(s)
    catch { case _: IllegalArgumentException => null }

  def evalUtf8(s: UTF8String): ArrayData = {
    val parsed = parse(s.toString)
    new GenericArrayData(parsed.map[Any](e =>
      if (e == null) null else UTF8String.fromString(e)))
  }

  /** Postgres array output syntax → elements (null for bare NULL). */
  def parse(s: String): Array[String] = {
    val t = s.trim
    require(t.length >= 2 && t.charAt(0) == '{' && t.charAt(t.length - 1) == '}',
      s"not a pg array literal: $s")
    val body = t.substring(1, t.length - 1)
    if (body.trim.isEmpty) return Array.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = body.length
    var done = false
    while (!done) {
      val sb = new StringBuilder
      var wasQuoted = false
      if (i < n && body.charAt(i) == '"') {
        wasQuoted = true
        i += 1
        var closed = false
        while (i < n && !closed) {
          val ch = body.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(body.charAt(i + 1)); i += 2 }
          else if (ch == '"') { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        require(closed, s"unterminated quoted element in $s")
      } else if (i < n && body.charAt(i) == '{') {
        // nested sub-array: keep the balanced raw text as one element.
        // Braces inside the sub-array's QUOTED elements (e.g. {"x}y"}) are
        // data, not structure — skip quoted sections while counting depth
        var depth = 0
        var first = true
        while (i < n && (depth > 0 || first)) {
          val ch = body.charAt(i)
          if (ch == '"') {
            sb.append(ch); i += 1
            var closed = false
            while (i < n && !closed) {
              val qc = body.charAt(i)
              if (qc == '\\' && i + 1 < n) { sb.append(qc).append(body.charAt(i + 1)); i += 2 }
              else { sb.append(qc); i += 1; if (qc == '"') closed = true }
            }
            require(closed, s"unterminated quote in nested array of $s")
          } else {
            if (ch == '{') depth += 1 else if (ch == '}') depth -= 1
            sb.append(ch); i += 1
          }
          first = false
        }
        require(depth == 0, s"unbalanced braces in $s")
      } else {
        while (i < n && body.charAt(i) != ',') {
          val ch = body.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(body.charAt(i + 1)); i += 2 }
          else { sb.append(ch); i += 1 }
        }
      }
      val e = sb.result()
      out += (if (!wasQuoted && e.equalsIgnoreCase("NULL")) null else e)
      if (i < n && body.charAt(i) == ',') i += 1 else done = true
    }
    out.toArray
  }
}
