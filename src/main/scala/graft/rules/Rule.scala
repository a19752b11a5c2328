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
  def encodeValue(df: DataFrame, how: String): Column = how match {
    case "json" => to_json(struct(df.columns.map(col): _*))
    case "kv-commas" =>
      concat_ws(",", df.columns.map(c => concat_ws("=", lit(c), col(c).cast("string"))): _*)
    case "v-commas" =>
      concat_ws(",", df.columns.map(col(_).cast("string")): _*)
    case other => throw new IllegalArgumentException(s"unknown value encoder: $other")
  }

  /** P8: compile a Go-text/template subset into a Column — substitution
    * `{{.COL}}` (the form the reference's configs actually use for keys and
    * values: global/rule.go:219-226, service/endpoint/redis.go:276-284)
    * plus nested conditionals `{{if .COL}}…{{else}}…{{end}}` with Go's
    * truthiness for our value domain (non-null, non-empty string). Compiled
    * once into `concat`/`when` expressions — codegen'd per row, no template
    * engine in the hot path.
    */
  def template(tmpl: String): Column = {
    sealed trait Tok
    final case class Text(s: String) extends Tok
    final case class Field(name: String) extends Tok
    final case class If(name: String) extends Tok
    case object Else extends Tok
    case object End extends Tok

    val action = raw"\{\{\s*([^}]*?)\s*\}\}".r
    val field = raw"\.([A-Za-z0-9_]+)".r
    val ifTok = raw"if\s+\.([A-Za-z0-9_]+)".r
    val toks = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var last = 0
    action.findAllMatchIn(tmpl).foreach { m =>
      if (m.start > last) toks += Text(tmpl.substring(last, m.start))
      m.group(1) match {
        case field(n) => toks += Field(n)
        case ifTok(n) => toks += If(n)
        case "else"   => toks += Else
        case "end"    => toks += End
        case other => throw new IllegalArgumentException(
          s"unsupported template action: {{$other}}")
      }
      last = m.end
    }
    if (last < tmpl.length) toks += Text(tmpl.substring(last))

    val it = toks.iterator.buffered
    def truthy(n: String): Column = {
      val c = col(n)
      c.isNotNull && (c.cast("string") =!= "")
    }
    // parse a token sequence until one of `until` (consumed by the caller)
    def parseSeq(inBranch: Boolean): Column = {
      val pieces = scala.collection.mutable.ArrayBuffer.empty[Column]
      var done = false
      while (it.hasNext && !done) {
        it.head match {
          case Else | End if inBranch => done = true
          case _ => it.next() match {
            case Text(s)  => pieces += lit(s)
            case Field(n) => pieces += coalesce(col(n).cast("string"), lit(""))
            case If(n) =>
              val thenC = parseSeq(inBranch = true)
              val elseC =
                if (it.hasNext && it.head == Else) { it.next(); parseSeq(inBranch = true) }
                else lit("")
              require(it.hasNext && it.next() == End, s"unterminated {{if .$n}}")
              pieces += when(truthy(n), thenC).otherwise(elseC)
            case Else | End =>
              throw new IllegalArgumentException("unexpected {{else}}/{{end}}")
          }
        }
      }
      if (pieces.isEmpty) lit("") else concat(pieces.toSeq: _*)
    }
    val out = parseSeq(inBranch = false)
    require(!it.hasNext, "dangling template tokens")
    out
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
