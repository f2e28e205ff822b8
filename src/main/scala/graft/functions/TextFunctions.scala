package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / search functions — the reference's one genuinely custom operator
  * surface plus the text-analysis operators a training-data pipeline needs.
  *
  * T1 in SURVEY §2.9: the reference builds a Postgres
  * `to_tsvector('russian', ...)` search vector per event
  * (`/root/reference/iis_etl/logic.py:394-404`). Spark has no tsvector, so the
  * engine's spec is: lowercase → split on non-letter/digit → drop empties,
  * short tokens and stopwords → dedupe → sort (deterministic). Everything here
  * is composed from `org.apache.spark.sql.functions._` so it stays inside
  * whole-stage codegen — no UDF in the hot path. The optional light Russian
  * suffix stemmer (not part of oracle parity, pinned by unit tests) is the only
  * closure, and [[graft.catalyst.TokenizeStem]] provides the
  * native codegen Catalyst Expression variant.
  */
object TextFunctions {

  /** Word splitter shared by engine and oracle: any run of non-letter,
    * non-digit characters separates tokens. `\p{L}\p{Nd}` is understood
    * identically by Java regex (Spark) and RE2 (DuckDB).
    */
  val TokenSplitRe = "[^\\p{L}\\p{Nd}]+"

  /** Minimal bilingual stopword list (spec'd by us — SURVEY §7 "tsvector
    * fidelity": our tokenizer is the spec, tested against our goldens).
    */
  val Stopwords: Seq[String] = Seq(
    "a", "an", "the", "and", "or", "of", "in", "on", "to", "is",
    "и", "в", "на", "с", "по", "не", "для", "от", "до", "у")

  /** Raw tokens, order preserved, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), TokenSplitRe), t => length(t) > 0)

  /** T1 lexeme vector: distinct, stopword-free, length>=minLen, sorted. */
  def lexemes(text: Column, minLen: Int = 2): Column = {
    val stop = array(Stopwords.map(lit): _*)
    array_sort(array_distinct(filter(tokens(text),
      t => length(t) >= minLen && !array_contains(stop, t))))
  }

  /** Query side of T1 (the reference never queries its tsvector; SURVEY §2.9
    * specifies `arrays_overlap` as our `@@ to_tsquery` equivalent).
    */
  def matchesQuery(lexemeCol: Column, query: String): Column = {
    val qTokens = query.toLowerCase.split(TokenSplitRe).filter(_.nonEmpty)
    qTokens.map(t => array_contains(lexemeCol, t)).reduce(_ && _)
  }

  /** Whitespace token count — cheapest useful length signal at 100 TB. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words + digit runs + punctuation marks each count,
    * long words count once per 4 chars (a cheap deterministic proxy for BPE
    * token counts; real BPE is a per-partition trie lookup, out of scope).
    */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + greatest(lit(1), ceil(length(t) / lit(4)).cast("int")))

  /** Document fingerprint: order-insensitive content hash (lowercase, token
    * sort, md5). Two docs with the same bag of words collide — the classic
    * "fingerprint dedup" canonicalization.
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(tokens(text)), " "))

  /** Quality score in [0,1]: weighted blend of length, word-length sanity and
    * alphabetic ratio — the standard pre-training heuristic filter family.
    * Pure arithmetic over counts → exactly reproducible in any SQL engine.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nTok = tokenCount(text)
    val avgWord = when(nTok > 0, nChars.cast("double") / nTok).otherwise(lit(0.0))
    val alpha = length(regexp_replace(text, "[^\\p{L}]", ""))
    val alphaRatio = when(nChars > 0, alpha.cast("double") / nChars)
      .otherwise(lit(0.0))
    val lenScore = least(nChars.cast("double") / lit(200.0), lit(1.0))
    val wordScore = when(avgWord >= 3 && avgWord <= 10, lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.3 + wordScore * 0.3 + alphaRatio * 0.4, 6)
  }

  /** n-gram language-ID heuristic: score = stopword hits per language profile
    * (tiny profiles; real lang-id would ship fastText-style tables — the
    * engine mechanics, a broadcast profile + argmax, are identical).
    */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "es" -> Seq("el", "la", "los", "y", "es", "una"),
    "ru" -> Seq("и", "в", "на", "не", "что", "это"))

  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangProfiles.map { case (lang, words) =>
      val profile = array(words.map(lit): _*)
      struct(
        size(filter(toks, t => array_contains(profile, t))).as("score"),
        lit(lang).as("lang"))
    }
    // argmax by (score, lang) — deterministic tie-break on language code;
    // docs hitting no profile at all → "und" (undetermined).
    val best = array_sort(array(scores: _*)).getItem(LangProfiles.size - 1)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  // --- light RU suffix stemmer (engine extension; NOT in oracle scope) ----

  private val RuSuffixes = Seq(
    "иями", "ями", "ами", "иях", "ией", "иям", "ием", "ого", "его",
    "ому", "ему", "ыми", "ими", "ует", "уют", "ить", "ыть", "оть",
    "ов", "ев", "ей", "ий", "ый", "ой", "ам", "ям", "ах", "ях",
    "ом", "ем", "ах", "ую", "юю", "ая", "яя", "ое", "ее", "ия",
    "ье", "ья", "ы", "и", "а", "я", "о", "е", "у", "ю", "ь")

  /** Suffixes in longest-first match order — the order both the Scala stemmer
    * and the generated DuckDB oracle lambda walk the table (equal-length ties
    * can't disagree: same-length suffixes matching one tail are equal).
    */
  val RuSuffixesByLength: Seq[String] = RuSuffixes.sortBy(-_.length)

  /** Pure function: strip the longest matching RU suffix once, keeping a stem
    * of at least 3 characters. Light-weight stand-in for Snowball-RU
    * (`to_tsvector('russian', ...)`, `/root/reference/iis_etl/logic.py:398`);
    * our behavior is the spec (SURVEY §7).
    */
  def ruStem(token: String): String = {
    if (token == null) return null
    RuSuffixesByLength
      .find(s => token.endsWith(s) && token.length - s.length >= 3)
      .map(s => token.substring(0, token.length - s.length))
      .getOrElse(token)
  }
}
