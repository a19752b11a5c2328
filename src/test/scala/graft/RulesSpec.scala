package graft

import graft.rules._
import org.apache.spark.sql.functions._

/** P1-P12 rule-pipeline semantics (SURVEY.md §2.2) against the reference's
  * documented behaviors.
  */
class RulesSpec extends SparkSpec {

  test("P8 template conditionals: {{if .COL}}/{{else}}/{{end}}, nested, Go truthiness") {
    import spark.implicits._
    val df = Seq[(String, String, String)](
      ("a", "T1", null), ("b", "", "F1"), ("c", null, null)).toDF("k", "t", "u")
    def run(tmpl: String): Map[String, String] =
      df.select($"k", graft.rules.RulePipeline.template(tmpl).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val simple = run("{{if .t}}has:{{.t}}{{else}}none{{end}}")
    assert(simple == Map("a" -> "has:T1", "b" -> "none", "c" -> "none"))
    val nested = run("k={{.k}}|{{if .t}}{{if .u}}both{{else}}t-only{{end}}{{end}}")
    assert(nested == Map("a" -> "k=a|t-only", "b" -> "k=b|", "c" -> "k=c|"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{if .t}}oops"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{frobnicate .t}}"))
  }

  test("P8 template functions: eq/ne/and/or/not, printf, len, index, pipes") {
    import spark.implicits._
    val df = Seq(("a", "A", 3L, "x"), ("b", "B", 0L, ""), ("c", "A", 7L, null))
      .toDF("k", "grp", "n", "s")
    def run(tmpl: String): Map[String, String] =
      df.select($"k", graft.rules.RulePipeline.template(tmpl).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run("""{{if eq .grp "A"}}hit{{else}}miss{{end}}""") ==
      Map("a" -> "hit", "b" -> "miss", "c" -> "hit"))
    assert(run("""{{if and (eq .grp "A") (gt .n 5)}}big-A{{else}}no{{end}}""") ==
      Map("a" -> "no", "b" -> "no", "c" -> "big-A"))
    assert(run("""{{if or (eq .k "b") (not .s)}}y{{else}}n{{end}}""") ==
      Map("a" -> "n", "b" -> "y", "c" -> "y"))
    assert(run("""{{printf "%s/%d" .grp .n}}""") ==
      Map("a" -> "A/3", "b" -> "B/0", "c" -> "A/7"))
    assert(run("""{{.grp | printf "g=%v"}}""") ==
      Map("a" -> "g=A", "b" -> "g=B", "c" -> "g=A"))
    assert(run("""{{len .k}}{{len .s}}""") ==
      Map("a" -> "11", "b" -> "10", "c" -> "1")) // null s → len renders ""
    assert(run("""{{ne .n 0}}""") ==
      Map("a" -> "true", "b" -> "false", "c" -> "true"))
  }

  test("P8 template Go zero-value truthiness (typed); quoted }} inside actions") {
    import spark.implicits._
    val df = Seq(("a", 0L, 1.5, Seq("x"), true), ("b", 7L, 0.0, Seq.empty[String], false),
      ("c", 3L, -2.0, null.asInstanceOf[Seq[String]], true))
      .toDF("k", "n", "d", "tags", "flag")
      .withColumn("nn", when($"k" === "c", lit(null).cast("long")).otherwise($"n"))
    def run(tmpl: String): Map[String, String] =
      df.select($"k", RulePipeline.template(tmpl).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Go's IsTrue: numeric 0 is FALSY — the string-form test ("0" non-empty)
    // would silently flip this branch on a ported reference config
    assert(run("{{if .n}}y{{else}}n{{end}}") == Map("a" -> "n", "b" -> "y", "c" -> "y"))
    assert(run("{{if .d}}y{{else}}n{{end}}") == Map("a" -> "y", "b" -> "n", "c" -> "y"))
    // null numeric (Go nil) falsy, like null string
    assert(run("{{if .nn}}y{{else}}n{{end}}") == Map("a" -> "n", "b" -> "y", "c" -> "n"))
    // booleans branch on themselves; arrays on emptiness (slice zero value)
    assert(run("{{if .flag}}y{{else}}n{{end}}") == Map("a" -> "y", "b" -> "n", "c" -> "y"))
    assert(run("{{if .tags}}y{{else}}n{{end}}") == Map("a" -> "y", "b" -> "n", "c" -> "n"))
    // and/or route through the same typed truthiness
    assert(run("{{if and .n .d}}y{{else}}n{{end}}") == Map("a" -> "n", "b" -> "n", "c" -> "y"))
    // `}}` inside a quoted or raw string does NOT terminate the action
    assert(run("""{{printf "x}}y"}}!""").values.toSet == Set("x}}y!"))
    assert(run("{{`a}}b`}}").values.toSet == Set("a}}b"))
    // Go len is typed too: arrays count ELEMENTS (null renders ""), strings
    // count BYTES (Go strings are byte slices: len("héllo") = 6)
    assert(run("{{len .tags}}") == Map("a" -> "1", "b" -> "0", "c" -> ""))
    assert(df.withColumn("u", lit("héllo"))
      .select(RulePipeline.template("{{len .u}}").as("v"))
      .collect().map(_.getString(0)).toSet == Set("6"))
  }

  test("GoTruthy typed dispatch: decimal / map / binary / null-literal columns") {
    import spark.implicits._
    val df = Seq(1).toDF("one").select(
      GoTruthy(lit(BigDecimal(0)).cast("decimal(10,2)")).as("dec0"),
      GoTruthy(lit(BigDecimal(1.5)).cast("decimal(10,2)")).as("dec1"),
      GoTruthy(typedLit(Map.empty[String, String])).as("emptyMap"),
      GoTruthy(typedLit(Map("k" -> "v"))).as("fullMap"),
      GoTruthy(lit(Array[Byte](1, 2))).as("bin"),
      GoTruthy(lit(null)).as("nullLit"))
    val r = df.head()
    assert(!r.getBoolean(0) && r.getBoolean(1), "decimal zero must be falsy")
    assert(!r.getBoolean(2) && r.getBoolean(3), "empty map must be falsy")
    assert(r.getBoolean(4), "non-null binary is truthy (no Go zero analog)")
    assert(!r.getBoolean(5), "null literal is falsy, never null")
  }

  test("P8 template variables and {{range}} over array columns (HOF-compiled)") {
    import spark.implicits._
    val df = Seq(
      ("a", Seq("x", "y", "z")),
      ("b", Seq.empty[String]),
      ("c", null.asInstanceOf[Seq[String]])).toDF("k", "tags")
    def run(tmpl: String): Map[String, String] =
      df.select($"k", graft.rules.RulePipeline.template(tmpl).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(run("{{range .tags}}[{{.}}]{{end}}") ==
      Map("a" -> "[x][y][z]", "b" -> "", "c" -> ""))
    assert(run("{{range .tags}}{{.}},{{else}}none{{end}}") ==
      Map("a" -> "x,y,z,", "b" -> "none", "c" -> "none"))
    assert(run("{{range $i, $e := .tags}}{{$i}}={{$e}};{{end}}") ==
      Map("a" -> "0=x;1=y;2=z;", "b" -> "", "c" -> ""))
    // $.COL reaches the outer row from inside range; index is 0-based
    assert(run("{{range .tags}}{{$.k}}:{{.}} {{end}}") ==
      Map("a" -> "a:x a:y a:z ", "b" -> "", "c" -> ""))
    assert(run("{{index .tags 1}}") == Map("a" -> "y", "b" -> "", "c" -> ""))
    // variables: assigned once, reused; block-scoped like Go
    assert(run("""{{$x := .k}}{{$x}}-{{$x}}""") ==
      Map("a" -> "a-a", "b" -> "b-b", "c" -> "c-c"))
    assert(run("""{{$p := printf "%s!" .k}}<{{$p}}>""") ==
      Map("a" -> "<a!>", "b" -> "<b!>", "c" -> "<c!>"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{$nope}}"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{range .tags}}x"))
    // arity misuse fails with the clean template diagnostic, not an
    // IndexOutOfBounds from inside the compiler
    val e = intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{ne .k}}"))
    assert(e.getMessage.contains("template function ne"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{.k | lt}}"))
    intercept[IllegalArgumentException](
      graft.rules.RulePipeline.template("{{eq .k}}"))
  }
  import spark.implicits._

  private def df = Seq(
    (1L, "alice", "2024-03-05 06:07:08", 12.5),
    (2L, "bob", "2024-12-31 23:59:59", 0.25)
  ).toDF("user_id", "user_name", "created_at", "score")
    .withColumn("created_at", col("created_at").cast("timestamp"))

  test("P1 include + P2 rename + P4 defaults") {
    val out = RulePipeline(df, Rule(
      includeColumns = Seq("user_id", "user_name"),
      columnMappings = Map("user_name" -> "name"),
      defaultColumns = Seq("source" -> "mysql")))
    assert(out.columns.toSeq == Seq("user_id", "name", "source"))
    assert(out.where($"source" === "mysql").count() == 2)
  }

  test("P1 exclude columns") {
    val out = RulePipeline(df, Rule(excludeColumns = Seq("score", "created_at")))
    assert(out.columns.toSeq == Seq("user_id", "user_name"))
  }

  test("P3 case transforms incl. snake→camel (WrapName analog)") {
    assert(RulePipeline.wrapName("user_name", "camel") == "userName")
    assert(RulePipeline.wrapName("user_name", "upper") == "USER_NAME")
    assert(RulePipeline.wrapName("USER", "lower") == "user")
    val out = RulePipeline(df, Rule(caseTransform = Some("camel")))
    assert(out.columns.toSeq == Seq("userId", "userName", "createdAt", "score"))
    intercept[IllegalArgumentException](RulePipeline.wrapName("x", "nope"))
  }

  test("P9 date reformat with Java patterns") {
    val out = RulePipeline(df, Rule(dateFormats = Map("created_at" -> "yyyy/MM/dd HH:mm")))
    assert(out.select("created_at").as[String].collect().toSet ==
      Set("2024/03/05 06:07", "2024/12/31 23:59"))
  }

  test("P7 value encodings: json, kv-commas, v-commas") {
    val two = df.select("user_id", "user_name")
    val kv = two.select(RulePipeline.encodeValue(two, "kv-commas").as("v"))
      .as[String].collect().toSet
    assert(kv == Set("user_id=1,user_name=alice", "user_id=2,user_name=bob"))
    val v = two.select(RulePipeline.encodeValue(two, "v-commas").as("v"))
      .as[String].collect().toSet
    assert(v == Set("1,alice", "2,bob"))
    val js = two.select(RulePipeline.encodeValue(two, "json").as("v"))
      .as[String].collect().toSet
    assert(js.contains("""{"user_id":1,"user_name":"alice"}"""))
    intercept[IllegalArgumentException](RulePipeline.encodeValue(two, "xml"))
    // null fidelity matches the reference's ToString(nil) == "": kv keeps
    // `k=`, v-commas keeps the empty slot (string_util.go:162-166)
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("user_id", "user_name")
    assert(withNull.select(RulePipeline.encodeValue(withNull, "kv-commas").as("v"))
      .as[String].head() == "user_id=1,user_name=")
    assert(withNull.select(RulePipeline.encodeValue(withNull, "v-commas").as("v"))
      .as[String].head() == "1,")
  }

  test("P8 template formatter {{.COL}} incl. null → empty string") {
    val d = Seq((7L, "x"), (8L, null)).toDF("id", "tag")
    val out = d.select(RulePipeline.template("k-{{.id}}:{{.tag}}!").as("t"))
      .as[String].collect().toSet
    assert(out == Set("k-7:x!", "k-8:!"))
    // no placeholders → constant
    assert(d.select(RulePipeline.template("const").as("t"))
      .as[String].head() == "const")
  }

  test("P10 key derivation: fixed / column / template / composite PK") {
    val d = Seq((1L, 2, "a")).toDF("pk1", "pk2", "val")
    def key(s: KeySpec) = d.select(RulePipeline.keyColumn(s).as("k")).as[String].head()
    assert(key(KeySpec.Fixed("K")) == "K")
    assert(key(KeySpec.FromColumn("val")) == "a")
    assert(key(KeySpec.Template("{{.pk1}}-{{.pk2}}")) == "1-2")
    assert(key(KeySpec.PrimaryKey(Seq("pk1", "pk2"))) == "12")
    assert(key(KeySpec.PrimaryKey(Seq("pk1", "pk2"), ":")) == "1:2")
  }

  test("§2.7 EventTransform flatMap emits 0..n ops per event") {
    val ds = Seq(("del", 1L), ("keep", 2L), ("fan", 3L)).toDS()
    val t = new EventTransform[(String, Long)] {
      def apply(e: (String, Long)) = e match {
        case ("del", _)  => Iterator.empty
        case ("fan", id) => Iterator(SinkOp("s", "A", id.toString), SinkOp("s", "B", id.toString))
        case (_, id)     => Iterator(SinkOp("s", "SET", id.toString))
      }
    }
    val ops = EventTransform.run(ds, t).collect()
    assert(ops.length == 3)
    assert(ops.count(_.action == "A") == 1 && ops.count(_.action == "B") == 1)
  }

  test("K11/P12 changefeed raw = BEFORE image, updates only (kafka.go:216-218)") {
    // one update (old text "OLD", new text "NEW") and one insert
    val decoded = Seq(
      ("update", 5L, "c1", 0, "NEW", "OLD"),
      ("insert", 6L, "c2", 1, "FRESH", null))
      .toDF("_op", "_pos", "conv_id", "turn_idx", "text", "_oldtext")
      .withColumn("_event_ts", lit("2024-01-01 00:00:00").cast("timestamp"))
      .withColumn("_before", when(col("_op") === "update",
        struct(col("conv_id"), col("turn_idx"), col("_oldtext").as("text"))))
      .drop("_oldtext")
    val msgs = ChangefeedOut.toMessages(decoded, Seq("conv_id", "turn_idx"),
      reserveRawData = true).collect().sortBy(_.getAs[String]("key"))
    val upd = msgs.head
    assert(upd.getAs[String]("key") == "c1|0")
    val uv = upd.getAs[String]("value")
    // raw carries the OLD value; date carries the NEW one
    assert(uv.contains(""""action":"update""""), uv)
    assert(uv.contains(""""raw""""), uv)
    assert(uv.matches(""".*"raw":\{[^}]*"text":"OLD".*"""), uv)
    assert(uv.matches(""".*"date":\{[^}]*"text":"NEW".*"""), uv)
    // inserts carry NO raw even with reserve_raw_data on
    val iv = msgs(1).getAs[String]("value")
    assert(iv.contains(""""action":"insert"""") && !iv.contains(""""raw""""), iv)
    val noRaw = ChangefeedOut.toMessages(decoded, Seq("conv_id"), reserveRawData = false)
      .collect().head.getAs[String]("value")
    assert(!noRaw.contains(""""raw""""))
  }

  test("P12 decodeWithBefore parses the old image for updates only") {
    import graft.changelog.ChangelogCodec
    import graft.core.Types
    val wire = Seq(
      (1L, 0L, "update", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1,
        """{"conv_id":"c1","turn_idx":0,"role":"user","text":"OLD","ts":"2024-01-01 00:00:00"}""",
        """{"conv_id":"c1","turn_idx":0,"role":"user","text":"NEW","ts":"2024-01-01 00:00:00"}"""),
      (2L, 0L, "insert", java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), 1,
        null,
        """{"conv_id":"c2","turn_idx":0,"role":"user","text":"X","ts":"2024-01-01 00:00:01"}"""))
      .toDF("pos", "epoch_hint", "op", "ts", "schema_id", "before", "after")
    val d = ChangelogCodec.decodeWithBefore(wire, Types.transcriptSchemas(1))
      .orderBy("_pos").collect()
    val updBefore = d(0).getAs[org.apache.spark.sql.Row]("_before")
    assert(updBefore != null && updBefore.getAs[String]("text") == "OLD")
    assert(d(0).getAs[String]("text") == "NEW") // row cols = AFTER image
    assert(d(1).getAs[org.apache.spark.sql.Row]("_before") == null)
  }

  test("P12 applyToStruct mirrors the rule projection over the old image") {
    import graft.rules.RulePipeline
    val rule = Rule(
      includeColumns = Seq("conv_id", "txt"),
      columnMappings = Map("txt" -> "text"),
      defaultColumns = Seq("src" -> "mysql"),
      caseTransform = Some("upper"))
    val df = Seq(("c1", "old", "new")).toDF("conv_id", "_oldtxt", "txt")
      .withColumn("_before", struct(col("conv_id"), col("_oldtxt").as("txt")))
    val shaped = df.select(RulePipeline.applyToStruct(
      col("_before"), Seq("conv_id", "txt"), rule).as("raw"))
    val row = shaped.collect().head.getAs[org.apache.spark.sql.Row]("raw")
    assert(row.schema.fieldNames.toSeq == Seq("CONV_ID", "TEXT", "SRC"))
    assert(row.getAs[String]("TEXT") == "old" && row.getAs[String]("SRC") == "mysql")
    // null image stays null
    val nulled = df.select(RulePipeline.applyToStruct(
      lit(null).cast(df.schema("_before").dataType), Seq("conv_id", "txt"), rule).as("raw"))
      .collect().head
    assert(nulled.isNullAt(0))
  }
}
