package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative per-table transform rule — the engine analog of the
  * reference's rule config (reference: global/rule.go), compiled once into a
  * pure `Column` pipeline so Catalyst can prune/push/codegen it. Covers the
  * full projection/transform surface of SURVEY.md §2.2:
  *
  *  - P1 include/exclude columns (global/rule.go:345-407 buildPaddingMap)
  *  - P2 column rename map     (global/rule.go:349-370 column_mappings)
  *  - P3 case transforms       (global/rule.go:437-448 WrapName)
  *  - P4 default constant cols (global/rule.go:228-240)
  *  - P9 date/datetime reformat (global/rule.go:242-248, util/dates)
  *  - P7 value encoding json | kv-commas | v-commas
  *    (service/endpoint/endpoint.go:221-257)
  *  - P8 template formatter `{{.COL}}-{{.OTHER}}`
  *    (global/rule.go:219-226, endpoint.go:222-228)
  *  - P10/P11 key, hash-field and score derivation
  *    (service/endpoint/redis.go:271-327)
  */
final case class Rule(
    includeColumns: Seq[String] = Nil,
    excludeColumns: Seq[String] = Nil,
    columnMappings: Map[String, String] = Map.empty, // old → new name
    caseTransform: Option[String] = None,            // lower | upper | camel
    defaultColumns: Seq[(String, String)] = Nil,     // constant columns k=v
    dateFormats: Map[String, String] = Map.empty,    // col → Java date pattern
    // Runtime (no-recompile) transforms — the engine analog of the
    // reference's in-config Lua (service/luaengine/actuator.go:46-101,
    // compiled per rule at global/rule.go:621-694): Spark SQL expression
    // STRINGS parsed at pipeline build, so "edit config, restart" works
    // without compiling Scala. Catalyst-optimized like any native column.
    filterExpr: Option[String] = None,               // row predicate, e.g. "turn_idx >= 0"
    computedColumns: Seq[(String, String)] = Nil     // name → SQL expression
)

/** Sink key derivation — reference: service/endpoint/redis.go:271-299 plus
  * composite-PK concat (endpoint.go:309-322).
  */
sealed trait KeySpec
object KeySpec {
  /** fixed value for all rows (redis key_value) */
  final case class Fixed(value: String) extends KeySpec
  /** one column's value (redis key_column) */
  final case class FromColumn(name: String) extends KeySpec
  /** `{{.COL}}` template (redis key_tmpl) */
  final case class Template(tmpl: String) extends KeySpec
  /** primary key columns, composite = values joined (endpoint.go:309-322) */
  final case class PrimaryKey(cols: Seq[String], sep: String = "") extends KeySpec
}

object RulePipeline {

  /** Apply a rule to a DataFrame: filter → include/exclude → rename →
    * defaults → computed expressions → date formats → name case. All pure
    * projections/predicates; Catalyst prunes the parquet scan to exactly the
    * surviving source columns and pushes the filter down.
    *
    * `preserve` columns (e.g. the merge-input meta columns `_op`/`_pos`/
    * `_event_ts`) pass through untouched, in front — so the same rule drives
    * both standalone projections and in-pipeline per-route transforms.
    */
  def apply(df: DataFrame, rule: Rule, preserve: Seq[String] = Nil): DataFrame = {
    var out = df
    rule.filterExpr.foreach(f => out = out.where(expr(f)))
    if (rule.includeColumns.nonEmpty)
      out = out.select((preserve ++ rule.includeColumns).map(col): _*)
    if (rule.excludeColumns.nonEmpty)
      out = out.drop(rule.excludeColumns.filterNot(preserve.contains): _*)
    if (rule.columnMappings.nonEmpty)
      out = out.withColumnsRenamed(rule.columnMappings -- preserve)
    rule.defaultColumns.foreach { case (k, v) => out = out.withColumn(k, lit(v)) }
    rule.computedColumns.foreach { case (k, e) => out = out.withColumn(k, expr(e)) }
    rule.dateFormats.foreach { case (c, pattern) =>
      // zero/invalid dates are already NULL at decode (endpoint.go:148-163);
      // date_format takes Java patterns natively — no Go-layout conversion.
      out = out.withColumn(c, date_format(col(c), pattern))
    }
    rule.caseTransform.foreach { t =>
      val renames = out.columns.filterNot(preserve.contains)
        .map(c => c -> wrapName(c, t)).toMap
      out = out.withColumnsRenamed(renames)
    }
    out
  }

  /** Apply a rule's PROJECTION surface to a struct image — the analog of the
    * reference's `oldRowMap` (service/endpoint/endpoint.go:284-306), which
    * runs the same PaddingMap (include/rename/case) + default columns over
    * `req.Old`. Filter and computed columns are intentionally absent: the
    * reference's PaddingMap carries neither (Lua computeds read ___OLDROW___
    * themselves). Null structs stay null.
    */
  def applyToStruct(image: Column, fieldNames: Seq[String], rule: Rule): Column = {
    var fields: Seq[(String, Column)] =
      fieldNames.map(n => n -> image.getField(n))
    if (rule.includeColumns.nonEmpty)
      fields = rule.includeColumns.flatMap(n => fields.find(_._1 == n))
    if (rule.excludeColumns.nonEmpty)
      fields = fields.filterNot { case (n, _) => rule.excludeColumns.contains(n) }
    if (rule.columnMappings.nonEmpty)
      fields = fields.map { case (n, c) => rule.columnMappings.getOrElse(n, n) -> c }
    fields = fields ++ rule.defaultColumns.map { case (k, v) => k -> lit(v) }
    rule.dateFormats.foreach { case (cn, pattern) =>
      fields = fields.map { case (n, c) =>
        if (n == cn) n -> date_format(c, pattern) else n -> c }
    }
    rule.caseTransform.foreach { t =>
      fields = fields.map { case (n, c) => wrapName(n, t) -> c }
    }
    when(image.isNotNull, struct(fields.map { case (n, c) => c.as(n) }: _*))
  }

  /** P3 name case transform (reference: util/stringutil/string_util.go:270-275). */
  def wrapName(name: String, transform: String): String = transform match {
    case "upper" => name.toUpperCase
    case "lower" => name.toLowerCase
    case "camel" =>
      val parts = name.split("_")
      (parts.head +: parts.tail.map(_.capitalize)).mkString
    case other => throw new IllegalArgumentException(s"unknown case transform: $other")
  }

  /** P7 value encoding: the whole row as one string column.
    * json → `to_json(struct(*))`; kv-commas → `k=v,...`; v-commas → `v,...`
    * (reference: service/endpoint/endpoint.go:221-257; constants
    * global/rule.go:46-49).
    */
  def encodeValue(df: DataFrame, how: String): Column = {
    // null fidelity: the reference's ToString(nil) is "" (string_util.go:
    // 162-166), so kv-commas emits `k=` and v-commas keeps the empty slot —
    // concat_ws would DROP the null operand ("k", and one fewer slot),
    // breaking any consumer that splits on '=' / counts fields
    def s(c: String) = coalesce(col(c).cast("string"), lit(""))
    how match {
      case "json" => to_json(struct(df.columns.map(col): _*))
      case "kv-commas" =>
        concat_ws(",", df.columns.map(c => concat(lit(c), lit("="), s(c))): _*)
      case "v-commas" =>
        concat_ws(",", df.columns.map(s): _*)
      case other => throw new IllegalArgumentException(s"unknown value encoder: $other")
    }
  }

  /** P8: compile a Go-text/template subset into a Column. The reference
    * accepts ANY text/template over the row map (global/rule.go:219-226;
    * used for keys and values, service/endpoint/redis.go:276-284); this
    * covers the surface real configs use, all compiled ONCE into
    * concat/when/HOF expressions — codegen'd per row, no template engine in
    * the hot path:
    *
    *   - `{{.COL}}` and nested paths `{{.a.b}}` (null → empty string)
    *   - `{{if P}}…{{else}}…{{end}}`, nested; field truthiness follows Go's
    *     zero-value rule, typed at analysis time ([[GoTruthy]]: numeric 0,
    *     "", empty array/map, false, null are falsy); comparison/logic
    *     pipelines evaluate as real booleans
    *   - `{{range .ARR}}…{{end}}` over ARRAY columns, `{{.}}` = element,
    *     `{{.f}}` = element field, `{{$.COL}}` = outer row, optional
    *     `{{range $i, $e := .ARR}}` bindings and an `{{else}}` branch for
    *     null/empty arrays — compiled to `transform()` + `array_join()`,
    *     fully distributed, no UDF
    *   - variables `{{$x := P}}` … `{{$x}}` (block-scoped, as in Go)
    *   - functions `and or not eq ne lt le gt ge len index printf` and
    *     pipelines `{{P | printf "%s!"}}` (piped value appended as last arg);
    *     `eq` accepts 2+ args (true if first equals any); printf maps Go's
    *     `%v` to `%s`
    *   - literals: `"s"` (with escapes), `` `raw` ``, integers, floats,
    *     true/false
    *
    * Divergences from Go, documented: `and`/`or` return booleans (not the
    * first truthy/falsy operand), and `len` over a non-string non-collection
    * (which Go rejects at parse time) degrades to string-form length.
    */
  def template(tmpl: String): Column = {
    // ---------------- lex: literal text vs {{action}} ----------------
    sealed trait Tok
    final case class Text(s: String) extends Tok
    final case class Act(words: List[String]) extends Tok
    // string-aware action scan: `}}` inside a quoted or raw string literal
    // (e.g. {{printf "x}}y"}}) does NOT terminate the action — a blind
    // regex would mis-lex the rest of the template into literal text
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var last = 0
    while (last < tmpl.length) {
      val start = tmpl.indexOf("{{", last)
      if (start < 0) { toks += Text(tmpl.substring(last)); last = tmpl.length }
      else {
        if (start > last) toks += Text(tmpl.substring(last, start))
        var j = start + 2
        var end = -1
        while (j < tmpl.length && end < 0) tmpl(j) match {
          case '"' =>
            j += 1
            while (j < tmpl.length && tmpl(j) != '"')
              j += (if (tmpl(j) == '\\') 2 else 1)
            require(j < tmpl.length, s"unterminated string in action at $start")
            j += 1
          case '`' =>
            val k = tmpl.indexOf('`', j + 1)
            require(k > 0, s"unterminated raw string in action at $start")
            j = k + 1
          case '}' if j + 1 < tmpl.length && tmpl(j + 1) == '}' => end = j
          case _ => j += 1
        }
        require(end >= 0, s"unterminated {{action}} at $start")
        toks += Act(lexAction(tmpl.substring(start + 2, end).trim))
        last = end + 2
      }
    }

    // ---------------- compile ----------------
    // `dot` = the current element inside {{range}}; None at top level where
    // field paths resolve against the row's columns.
    final case class Ctx(dot: Option[Column], vars: Map[String, TVal])
    val numRe = raw"-?\d+(\.\d+)?".r
    val fns = Set("and", "or", "not", "eq", "ne", "lt", "le", "gt", "ge",
      "len", "index", "printf")

    def fieldPath(word: String, ctx: Ctx): TVal = {
      val parts = word.split('.').filter(_.nonEmpty).toList
      ctx.dot match {
        case Some(d) => TVal(parts.foldLeft(d)(_ getField _))
        case None =>
          require(parts.nonEmpty, "{{.}} is only meaningful inside {{range}}")
          TVal(parts.tail.foldLeft(col(parts.head))(_ getField _))
      }
    }
    def varRef(word: String, ctx: Ctx): TVal = {
      val body = word.drop(1) // strip '$'
      if (body.startsWith(".") || body.isEmpty) {
        // `$` / `$.COL` = the top-level row, reachable from inside range
        val parts = body.split('.').filter(_.nonEmpty).toList
        require(parts.nonEmpty, "bare {{$}} is unsupported (row has no single value)")
        TVal(parts.tail.foldLeft(col(parts.head))(_ getField _))
      } else {
        val (name, path) = body.span(_ != '.')
        val v = ctx.vars.getOrElse(name, throw new IllegalArgumentException(
          s"undefined template variable $$$name"))
        TVal(path.split('.').filter(_.nonEmpty).foldLeft(v.c)(_ getField _), v.bool)
      }
    }
    // one operand; cur positioned at it
    def parseOperand(words: List[String], ctx: Ctx): (TVal, List[String]) =
      words match {
        case "(" :: rest =>
          val (v, r2) = parsePipe(rest, ctx)
          r2 match {
            case ")" :: r3 => (v, r3)
            case _ => throw new IllegalArgumentException("unbalanced ( in template")
          }
        case w :: rest if w.startsWith("\"") => (TVal(lit(w.drop(1)), lit0 = Some(w.drop(1))), rest)
        case w :: rest if w.startsWith(".") => (fieldPath(w, ctx), rest)
        case w :: rest if w.startsWith("$") => (varRef(w, ctx), rest)
        case "true" :: rest => (TVal(lit(true), bool = true), rest)
        case "false" :: rest => (TVal(lit(false), bool = true), rest)
        case w :: rest if numRe.pattern.matcher(w).matches() =>
          (if (w.contains('.')) TVal(lit(w.toDouble)) else TVal(lit(w.toLong)), rest)
        case w => throw new IllegalArgumentException(
          s"unsupported template operand: ${w.headOption.getOrElse("<eof>")}")
      }
    def call(fn: String, args: Seq[TVal]): TVal = {
      val arity: (Int, Int) = fn match { // min, max (-1 = unbounded)
        case "not" | "len" => (1, 1)
        case "ne" | "lt" | "le" | "gt" | "ge" | "index" => (2, 2)
        case "eq" | "and" | "or" => (2, -1)
        case "printf" => (1, -1)
        case _ => (1, -1)
      }
      require(args.size >= arity._1 && (arity._2 < 0 || args.size <= arity._2),
        s"template function $fn expects ${arity._1}${if (arity._2 != arity._1) "+" else ""} " +
          s"argument(s), got ${args.size}")
      def a = args.head.c; def b = args(1).c
      fn match {
        case "eq" => TVal(args.tail.map(x => a === x.c).reduce(_ || _), bool = true)
        case "ne" => TVal(a =!= b, bool = true)
        case "lt" => TVal(a < b, bool = true)
        case "le" => TVal(a <= b, bool = true)
        case "gt" => TVal(a > b, bool = true)
        case "ge" => TVal(a >= b, bool = true)
        case "and" => TVal(args.map(truthy).reduce(_ && _), bool = true)
        case "or" => TVal(args.map(truthy).reduce(_ || _), bool = true)
        case "not" => TVal(!truthy(args.head), bool = true)
        // Go len, typed at analysis time: array/map → elements, string →
        // bytes (see [[GoLen]]); Go rejects len over other types at parse
        // time — here they degrade to string-form length
        case "len" => TVal(GoLen(a))
        // Go is 0-based; try_ variant: out-of-range → null → "" (ANSI
        // element_at would throw, and a template must not kill the batch)
        case "index" => TVal(try_element_at(a, (b + lit(1)).cast("int")))
        case "printf" =>
          val fmt = args.head.lit0.getOrElse(throw new IllegalArgumentException(
            "printf needs a literal format string"))
          TVal(format_string(fmt.replace("%v", "%s"), args.tail.map(_.c): _*))
        case other => throw new IllegalArgumentException(
          s"unsupported template function: $other")
      }
    }
    // one command: `fn arg arg…` or a single operand
    def parseCmd(words: List[String], ctx: Ctx, piped: Option[TVal]): (TVal, List[String]) =
      words match {
        case fn :: rest if fns(fn) =>
          var cur = rest
          val args = scala.collection.mutable.ArrayBuffer.empty[TVal]
          while (cur.nonEmpty && cur.head != "|" && cur.head != ")") {
            val (v, r2) = parseOperand(if (cur.head == ",") cur.tail else cur, ctx)
            args += v; cur = r2
          }
          piped.foreach(args += _)
          require(args.nonEmpty, s"template function $fn needs arguments")
          (call(fn, args.toSeq), cur)
        case _ =>
          require(piped.isEmpty, "cannot pipe into a non-function operand")
          parseOperand(words, ctx)
      }
    // pipeline: cmd | cmd | … (piped value appended as the last argument)
    def parsePipe(words: List[String], ctx: Ctx): (TVal, List[String]) = {
      var (v, cur) = parseCmd(words, ctx, None)
      while (cur.headOption.contains("|")) {
        val (v2, r2) = parseCmd(cur.tail, ctx, Some(v))
        v = v2; cur = r2
      }
      (v, cur)
    }
    def pipeAll(words: List[String], ctx: Ctx): TVal = {
      val (v, rest) = parsePipe(words, ctx)
      require(rest.isEmpty, s"dangling tokens in template action: $rest")
      v
    }

    val it = toks.iterator.buffered
    def atKeyword(k: String): Boolean = it.hasNext && (it.head match {
      case Act(List(`k`)) => true
      case _ => false
    })
    // parse tokens until {{else}}/{{end}} (left unconsumed for the caller)
    def parseSeq(ctx0: Ctx, inBlock: Boolean): Column = {
      val vars = scala.collection.mutable.Map(ctx0.vars.toSeq: _*)
      def ctx = Ctx(ctx0.dot, vars.toMap)
      val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
      var done = false
      while (it.hasNext && !done) {
        it.head match {
          case Act(List("else")) | Act(List("end")) if inBlock => done = true
          case Act(List("else")) | Act(List("end")) =>
            throw new IllegalArgumentException("unexpected {{else}}/{{end}}")
          case _ => it.next() match {
            case Text(s) => pieces += lit(s)
            case Act("if" :: cond) =>
              val c = truthy(pipeAll(cond, ctx))
              val thenC = parseSeq(ctx, inBlock = true)
              val elseC =
                if (atKeyword("else")) { it.next(); parseSeq(ctx, inBlock = true) }
                else lit("")
              require(atKeyword("end"), "unterminated {{if}}")
              it.next()
              pieces += when(c, thenC).otherwise(elseC)
            case Act("range" :: rest) =>
              val (bind, pipeWords) = rest match {
                case i :: "," :: e :: ":=" :: tail
                  if i.startsWith("$") && e.startsWith("$") => (Seq(i, e), tail)
                case e :: ":=" :: tail if e.startsWith("$") => (Seq(e), tail)
                case tail => (Seq.empty[String], tail)
              }
              val arr = pipeAll(pipeWords, ctx).c
              val joined = array_join(transform(arr, (x, i) => {
                val bound = bind match {
                  case Seq(e) => Map(e.drop(1) -> TVal(x))
                  case Seq(iv, e) => Map(iv.drop(1) -> TVal(i), e.drop(1) -> TVal(x))
                  case _ => Map.empty[String, TVal]
                }
                parseSeq(Ctx(Some(x), ctx.vars ++ bound), inBlock = true)
              }), "")
              val elseC =
                if (atKeyword("else")) { it.next(); parseSeq(ctx, inBlock = true) }
                else lit("")
              require(atKeyword("end"), "unterminated {{range}}")
              it.next()
              pieces += when(arr.isNotNull && size(arr) > 0, joined).otherwise(elseC)
            case Act(v :: ":=" :: rhs) if v.startsWith("$") && v.length > 1 =>
              vars(v.drop(1)) = pipeAll(rhs, ctx)
            case Act(words) =>
              pieces += render(pipeAll(words, ctx))
          }
        }
      }
      if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
    }
    val out = parseSeq(Ctx(None, Map.empty), inBlock = false)
    require(!it.hasNext, "dangling template tokens")
    out
  }

  /** A compiled template value: the column, whether it is a real boolean
    * (comparison/logic result), and the literal string if statically known
    * (printf format strings).
    */
  private final case class TVal(c: Column, bool: Boolean = false,
      lit0: Option[String] = None)
  private def render(v: TVal): Column = coalesce(v.c.cast("string"), lit(""))
  // Go zero-value truthiness, typed at analysis time (numeric 0 and empty
  // collections are FALSY — see [[GoTruthy]]); comparison/logic results are
  // already booleans and skip the dispatch
  private def truthy(v: TVal): Column =
    if (v.bool) coalesce(v.c, lit(false))
    else GoTruthy(v.c)

  /** Tokenize one `{{…}}` action body: strings (quoted/raw), punctuation
    * `( ) , | :=`, and bare words (fields, vars, numbers, function names).
    */
  private def lexAction(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      s(i) match {
        case c if c.isWhitespace => i += 1
        case '"' =>
          val sb = new StringBuilder("\"") // marker prefix: lexed string literal
          i += 1
          while (i < s.length && s(i) != '"') {
            if (s(i) == '\\' && i + 1 < s.length) {
              sb += (s(i + 1) match {
                case 'n' => '\n'; case 't' => '\t'; case other => other
              })
              i += 2
            } else { sb += s(i); i += 1 }
          }
          require(i < s.length, s"unterminated string in {{$s}}")
          i += 1; out += sb.result()
        case '`' =>
          val j = s.indexOf('`', i + 1)
          require(j > 0, s"unterminated raw string in {{$s}}")
          out += "\"" + s.substring(i + 1, j); i = j + 1
        case '(' => out += "("; i += 1
        case ')' => out += ")"; i += 1
        case '|' => out += "|"; i += 1
        case ',' => out += ","; i += 1
        case ':' if i + 1 < s.length && s(i + 1) == '=' => out += ":="; i += 2
        case _ =>
          val j0 = i
          while (i < s.length && !s(i).isWhitespace && !"(),|".contains(s(i)) &&
            !(s(i) == ':' && i + 1 < s.length && s(i + 1) == '=')) i += 1
          out += s.substring(j0, i)
      }
    }
    out.toList
  }

  /** P10 sink-key derivation. */
  def keyColumn(spec: KeySpec): Column = spec match {
    case KeySpec.Fixed(v)        => lit(v)
    case KeySpec.FromColumn(c)   => col(c).cast("string")
    case KeySpec.Template(t)     => template(t)
    case KeySpec.PrimaryKey(cols, sep) =>
      concat_ws(sep, cols.map(col(_).cast("string")): _*)
  }
}
