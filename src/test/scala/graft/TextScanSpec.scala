package graft

import graft.functions.TextScan
import graft.text.TextAnalysis
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins every [[graft.functions.TextScan]] byte-scan expression bit-equal
  * to the regex/split pipeline it replaces (the langid / quality-score
  * corpus hot path). The generator mixes ASCII words, stopwords from the
  * real sets, whitespace variety (all six Java `\s` ASCII chars + NBSP,
  * which is NOT a separator), digits, punctuation runs, CJK (including
  * the U+4DFF/U+4E00/U+9FFF/U+A000 range boundaries and a supplementary
  * code point outside the BMP), emoji, and the İ/Kelvin case-mapping
  * landmines — so the byte-scan-equals-codepoint-regex arguments are
  * exercised, not assumed. The DuckDB oracles keep the regex forms, so
  * the hash sweeps re-prove the same equivalences end-to-end.
  */
class TextScanSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val fragment: Gen[String] = Gen.frequency(
    5 -> Gen.alphaNumStr.map(_.take(8)),
    4 -> Gen.oneOf(TextAnalysis.StopwordSets.flatMap(_._2)),
    3 -> Gen.oneOf(" ", "  ", "\t", "\n", "", "\f", "\r", " "),
    2 -> Gen.oneOf("...", "!!", "--", "_", ",", "£10", "a£b"),
    2 -> Gen.oneOf("日本語", "䷿一鿿ꀀ", "中文 文本", "👍🏽",
      new String(Character.toChars(0x20000)), "é", "ß"),
    1 -> Gen.oneOf("İ", "K", "THE", "The", "tHe", "thethe", "a"))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString(
      "", " ", ""))

  // join half the samples WITHOUT separators too (token-boundary stress)
  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap { i =>
      val s = textGen.apply(Gen.Parameters.default, Seed(11L + i))
      if (i % 2 == 0) s else s.map(_.replace(" ", ""))
    } ++ Seq(
      "", " ", "\t", "a\t", "\ta", " \t ", "a  b", "the", " the ",
      "the the the", "the the", "of of", "aof", "la de da",
      "一一", "abc一def", "1 2 33 a1b")

  private def assertBitEqual(fast: Column, slow: Column, what: String): Unit = {
    val df = samples(400).toDF("text")
      .select(col("text"), fast.as("fast"), slow.as("slow"))
    val bad = df.where(not(col("fast") <=> col("slow"))).collect()
    assert(bad.isEmpty, s"$what mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("ws_token_count == when/size/split composed form (limit -1 quirks)") {
    assertBitEqual(
      TextScan.ws_token_count(col("text")),
      when(length(trim(col("text"))) === 0, lit(0))
        .otherwise(size(split(trim(col("text")), "\\s+"))),
      "ws_token_count")
  }

  test("bpeish_token_count == regexp_count alternation form") {
    assertBitEqual(
      TextScan.bpeish_token_count(col("text")),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")),
      "bpeish_token_count")
  }

  test("stopword_count == anchored-alternation regexp_count, every set") {
    TextAnalysis.StopwordSets.foreach { case (lang, words) =>
      assertBitEqual(
        TextScan.stopword_count(col("text"), words),
        regexp_count(lower(col("text")),
          lit("(?:^|\\s)(?:" + words.mkString("|") + ")(?=\\s|\\z)")),
        s"stopword_count($lang)")
    }
  }

  test("stopword_counts array matches the per-set scalar counts") {
    val sets = TextAnalysis.StopwordSets.map(_._2)
    val arr = TextScan.stopword_counts(col("text"), sets)
    sets.zipWithIndex.foreach { case (words, i) =>
      assertBitEqual(arr.getItem(i),
        TextScan.stopword_count(col("text"), words), s"stopword_counts[$i]")
    }
  }

  test("cjk_count == length(regexp_replace) form incl. range boundaries") {
    assertBitEqual(
      TextScan.cjk_count(col("text")),
      length(regexp_replace(col("text"), "[^\\x{4E00}-\\x{9FFF}]", "")),
      "cjk_count")
  }

  test("langId == the four-regex + regexp_replace composed form") {
    val composed = {
      val scores = TextAnalysis.StopwordSets.map { case (lang, words) =>
        lang -> regexp_count(lower(col("text")),
          lit("(?:^|\\s)(?:" + words.mkString("|") + ")(?=\\s|\\z)"))
      } :+ ("zh" -> length(regexp_replace(col("text"), "[^\\x{4E00}-\\x{9FFF}]", "")))
      val entries = scores.zipWithIndex.map { case ((lang, score), idx) =>
        struct(score.cast("long").as("score"),
          lit(-idx).as("neg_pri"), lit(lang).as("lang"))
      }
      val best = array_max(array(entries: _*))
      when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(lit("und"))
    }
    assertBitEqual(TextAnalysis.langId(col("text")), composed, "langId")
  }

  test("null in, null out for every expression") {
    val r = Seq[Option[String]](None, Some("the a"))
      .toDF("text")
      .select(
        TextScan.ws_token_count(col("text")).as("a"),
        TextScan.bpeish_token_count(col("text")).as("b"),
        TextScan.stopword_count(col("text"), Seq("the")).as("c"),
        TextScan.stopword_counts(col("text"), Seq(Seq("the"))).as("d"),
        TextScan.cjk_count(col("text")).as("e"))
      .collect()
    assert((0 until 5).forall(r(0).isNullAt), s"expected all null: ${r(0)}")
    assert((0 until 5).forall(i => !r(1).isNullAt(i)), s"expected non-null: ${r(1)}")
  }

  test("langId's four stopword-set scores run ONE tokenizer scan " +
      "(codegen subexpression elimination, as the doc comment claims)") {
    import org.apache.spark.sql.execution.debug._
    val df = spark.range(8)
      .select(concat(lit("the el der le #"), col("id").cast("string")).as("text"))
      .select(TextAnalysis.langId(col("text")).as("lang"))
    val generated = df.queryExecution.debug.codegenToSeq().map(_._2).mkString
    val calls = "TextScan\\.stopwordCounts\\(".r.findAllIn(generated).size
    assert(calls == 1,
      s"expected the array scan to be CSE'd to one call site, found $calls")
  }

  test("stays inside whole-stage codegen (no eval fallback in the hot path)") {
    val plan = spark.range(8)
      .select(concat(lit("Doc the #"), col("id").cast("string")).as("text"))
      .select(TextAnalysis.langId(col("text")).as("lang"),
        TextAnalysis.tokenCount(col("text")).as("n"),
        TextAnalysis.bpeishTokenCount(col("text")).as("nb"))
      .queryExecution.executedPlan
    assert(plan.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"expected WholeStageCodegen:\n$plan")
  }
}
