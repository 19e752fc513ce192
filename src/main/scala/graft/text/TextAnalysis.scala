package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.RollingHash.rolling_hash

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, language-ID heuristic, quality scoring, document
  * fingerprinting. All pure column expressions (whole-stage codegen, no
  * UDFs, no shuffle) except the fingerprint, which is a custom native
  * Catalyst expression ([[graft.functions.RollingHash]]).
  *
  * At 100 TB these run as a single map-only pass over the corpus — the
  * engine never materializes intermediate token lists beyond the row being
  * processed.
  */
object TextAnalysis {

  /** Whitespace token count (0 for blank text) — the value of
    * `when(length(trim(text))===0, 0).otherwise(size(split(trim(text),
    * "\\s+")))`, computed as one byte scan with no token-array
    * allocation ([[graft.functions.TextScan]]; split's limit-(-1)
    * leading/trailing-empty quirks replicated and property-pinned).
    */
  def tokenCount(text: Column): Column =
    graft.functions.TextScan.ws_token_count(text)

  /** BPE-ish token proxy: alpha runs, single digits, single punctuation —
    * the standard cheap stand-in for subword tokenizer counts. The value
    * of `regexp_count(text, "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")` in one
    * regex-free code-point scan ([[graft.functions.TextScan]]).
    */
  def bpeishTokenCount(text: Column): Column =
    graft.functions.TextScan.bpeish_token_count(text)

  /** Number of lowercase whitespace tokens of column `textCol` that appear
    * in `words` — the value of `regexp_count(lower(text),
    * "(?:^|\\s)(?:w1|…)(?=\\s|\\z)")`, computed as one tokenizer byte
    * scan instead of an NFA alternation pass (the 100x-probe langid /
    * quality hot spot — SCALE.md r9g). The DuckDB oracles keep the regex
    * form, so the hash sweeps re-prove the equivalence continuously.
    */
  def stopwordCount(textCol: String, words: Seq[String]): Column =
    stopwordCount(col(textCol), words)

  def stopwordCount(text: Column, words: Seq[String]): Column =
    graft.functions.TextScan.stopword_count(text, words)

  /** Small per-language stopword sets for the n-gram/stopword lang-ID
    * heuristic. CJK languages are detected by script range instead.
    */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "de", "et", "les", "un", "est"))

  /** CJK codepoint count (zh/ja signal) — the value of
    * `length(regexp_replace(text, "[^\\x{4E00}-\\x{9FFF}]", ""))` without
    * the match-rich replace (on non-CJK text that regex matches EVERY
    * char and rebuilds the string to measure it); one UTF-8 scan,
    * zero allocation ([[graft.functions.TextScan]]).
    */
  def cjkCount(text: Column): Column =
    graft.functions.TextScan.cjk_count(text)

  /** Language-ID heuristic: stopword score per language (+ CJK chars for
    * zh); argmax with a fixed priority order on ties (en > es > de > fr >
    * zh). Returns the 2-letter code.
    *
    * Each score expression appears exactly ONCE in the plan: the scores go
    * into an array of (score, -priority, lang) structs and `array_max`
    * picks the winner by struct ordering (highest score, then earliest
    * language on ties). A pairwise-comparison fold would re-inline every
    * score O(n²) times — with the interpreted higher-order `filter` inside,
    * that dominated the whole corpus pass.
    */
  def langId(textCol: String): Column = langId(col(textCol))

  def langId(text: Column): Column = {
    // ONE tokenizer pass scores all four stopword sets (the array
    // subtree is identical across the four getItem uses, so codegen
    // subexpression elimination evaluates it once) + one CJK scan —
    // vs the previous four regex alternation passes + one regexp_replace.
    val sw = graft.functions.TextScan.stopword_counts(text, StopwordSets.map(_._2))
    val scores = StopwordSets.zipWithIndex.map { case ((lang, _), i) =>
      lang -> sw.getItem(i)
    } :+ ("zh" -> cjkCount(text))
    val entries = scores.zipWithIndex.map { case ((lang, score), idx) =>
      struct(score.cast("long").as("score"),
        lit(-idx).as("neg_pri"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: length, word-shape, punctuation and stopword
    * ratios combined — the usual cheap pre-filter before expensive dedup /
    * model scoring. Weights are part of the engine contract.
    */
  def qualityScore(textCol: String): Column = qualityScore(col(textCol))

  /** Characters of `text` OUTSIDE [A-Za-z0-9] + ASCII whitespace — the
    * value of `regexp_count(text, "[^A-Za-z0-9\\s]")`, computed WITHOUT a
    * regex. Why: a never-matching negated char class is the regex
    * engine's worst case on Spark 4.1 — measured 25 s for 500 k
    * 300-char docs at local[32] (~1.6 ms/doc of CPU, ~94x a pure-JVM
    * matcher on the same pattern; match-rich patterns don't hit it).
    * `translate` deletes the allowed set in one per-char table pass, so
    * `length` of the remainder IS the punct count: same value, O(n)
    * guaranteed. The allowed set spells out Java's `\s` = [ \t\n\x0B\f\r]
    * exactly (no UNICODE_CHARACTER_CLASS flag in Spark's pattern
    * compile), keeping the translate value bit-identical to the regex's.
    */
  def punctCount(text: Column): Column =
    length(translate(text,
      "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789" +
        " \t\n\u000B\f\r", ""))

  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChars = length(text).cast("double")
    val avgWordLen = nChars / greatest(nTok, lit(1.0))
    val punct = punctCount(text).cast("double")
    val punctRatio = punct / greatest(nChars, lit(1.0))
    val sw = stopwordCount(text, StopwordSets.head._2).cast("double")
    val swRatio = sw / greatest(nTok, lit(1.0))
    val lenScore = least(nTok / 100.0, lit(1.0))
    val wordShape =
      when(avgWordLen >= 3.0 && avgWordLen <= 10.0, lit(1.0)).otherwise(lit(0.5))
    val punctScore = when(punctRatio <= 0.2, lit(1.0)).otherwise(lit(0.5))
    val swScore = least(swRatio * lit(5.0), lit(1.0))
    lenScore * 0.4 + wordShape * 0.2 + punctScore * 0.2 + swScore * 0.2
  }

  /** Polynomial rolling-hash fingerprint (custom codegen'd expression). */
  def fingerprint(text: Column): Column = rolling_hash(text)
}
