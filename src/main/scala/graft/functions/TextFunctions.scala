package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All pure
  * `Column` expressions (whole-stage codegen, no UDFs) so they run at
  * 100 TB scan speed.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, 0).otherwise(size(tokens(c)))

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token — a cheap proxy for subword tokenizers.
    */
  def tokenCountBpe(c: Column): Column =
    size(regexp_extract_all(c, lit("""[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"""), lit(0)))

  /** Canonical form for exact-dup detection: lowercase, collapse whitespace. */
  def normalized(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Exact-dup fingerprint; md5 (not xxhash) so external oracles (DuckDB)
    * can reproduce it byte-for-byte.
    */
  def fingerprintMd5(c: Column): Column = md5(normalized(c))

  /** 64-bit content fingerprint over rolling byte 8-grams (winnowing-style
    * min-hash of the n-gram hash stream): robust to reordering of distant
    * parts, cheap to compare. A streaming custom Expression — one pass, no
    * per-document hash-array materialization (see [[RollingMin64]]).
    */
  def fingerprintRolling(c: Column, n: Int = 8): Column =
    RollingMin64(normalized(c), n)

  private val punct = """[!-/:-@\[-`{-~]"""

  /** Quality-scoring feature struct: char/token counts, punctuation ratio,
    * mean word length, uppercase ratio, and a composite [0,1] score. A
    * filter like `quality(text) > 0.5` is the classic pretraining-corpus
    * gate.
    */
  def qualityFeatures(c: Column): Column = {
    val nChars = length(c)
    val nTok = tokenCount(c)
    val punctRatio = size(regexp_extract_all(c, lit(punct), lit(0))).cast("double") /
      greatest(nChars.cast("double"), lit(1.0))
    val upperRatio = size(regexp_extract_all(c, lit("[A-Z]"), lit(0))).cast("double") /
      greatest(nChars.cast("double"), lit(1.0))
    val meanWordLen = nChars.cast("double") / greatest(nTok.cast("double"), lit(1.0))
    val lenScore = least(nChars.cast("double") / lit(500.0), lit(1.0))
    val score = greatest(lit(0.0), least(lit(1.0),
      lenScore * (lit(1.0) - punctRatio * 4) * (lit(1.0) - upperRatio)))
    struct(nChars.as("n_chars"), nTok.as("n_tokens"),
      round(punctRatio, 6).as("punct_ratio"),
      round(upperRatio, 6).as("upper_ratio"),
      round(meanWordLen, 6).as("mean_word_len"),
      round(score, 6).as("quality"))
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "un", "una", "en", "para"))

  /** Stopword-hit count for one language's list. */
  def stopwordHits(c: Column, lang: String): Column = {
    val toks = tokens(lower(c))
    size(filter(toks, t => t.isin(stopwords(lang): _*)))
  }

  /** Heuristic language ID: CJK char fraction ⇒ zh; otherwise the language
    * whose stopword list hits most (ties → en). N-gram-free but shaped like
    * the standard fastText-lite heuristics; returns a lang code column.
    */
  def langId(c: Column): Column = {
    val cjk = size(regexp_extract_all(c, lit("[\\x{4e00}-\\x{9fff}]"), lit(0)))
    // priority breaks ties deterministically in favor of en
    val prio = Map("en" -> 3, "de" -> 2, "fr" -> 1, "es" -> 0)
    val scores = Seq("en", "de", "fr", "es").map(l =>
      struct(stopwordHits(c, l).as("hits"), lit(prio(l)).as("prio"), lit(l).as("lang")))
    val best = array_max(array(scores: _*))
    when(cjk > 0, lit("zh"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }
}
