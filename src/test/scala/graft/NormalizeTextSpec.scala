package graft

import graft.functions.NormalizeText.normalize_text
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Pins the single-pass [[graft.functions.NormalizeTextExpr]] bit-equal to
  * the composed pipeline it replaces:
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))`.
  * The generator mixes ASCII, punctuation runs, digits, multi-byte UTF-8
  * (CJK, emoji, combining marks) and the classic case-mapping landmines
  * (U+0130 İ whose lowercase CONTAINS an ASCII 'i', U+212A Kelvin K → 'k')
  * so the byte-scan-equals-codepoint-regex argument and the
  * reuse-Spark's-own-lower dispatch are both exercised, not assumed.
  */
class NormalizeTextSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val composed =
    trim(regexp_replace(regexp_replace(
      lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))

  private val fragment: Gen[String] = Gen.frequency(
    6 -> Gen.alphaNumStr.map(_.take(8)),
    3 -> Gen.oneOf(" ", "  ", "\t", "\n", "...", "!!", "--", "_", ","),
    2 -> Gen.oneOf("Θθ", "日本語", "👍🏽", "e\u0301", "ß", "ﬁ"),
    2 -> Gen.oneOf("\u0130", "\u212A", "I\u0130I", "\u212AELVIN"),
    1 -> Gen.oneOf("", " ", "£10", "a£b"))

  private val textGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, fragment)).map(_.mkString)

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(7L + i)))

  test("normalize_text is bit-equal to the composed lower/regex/trim pipeline") {
    val inputs = samples(400) ++ Seq(
      "", " ", "!!!", "  Hello,   WORLD!!  ", "a!b", "a £ b", "£abc£",
      "MiXeD 123\tCaSe", "\u0130stanbul", "\u212A 212A kelvin")
    val df = inputs.toDF("text")
      .select(col("text"), normalize_text(col("text")).as("fast"),
        composed.as("slow"))
    val bad = df.where(not(col("fast") <=> col("slow"))).collect()
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString("; ")}")
  }

  test("null in, null out") {
    val r = Seq[Option[String]](None, Some("A b!"))
      .toDF("text").select(normalize_text(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(r.toSeq == Seq(null, "a b"))
  }

  test("stays inside whole-stage codegen (no eval fallback in the hot path)") {
    val plan = spark.range(8)
      .select(concat(lit("Doc #"), col("id").cast("string")).as("text"))
      .select(normalize_text(col("text")).as("n"))
      .queryExecution.executedPlan
    val inWsc = plan.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("normalize_text"))
    assert(inWsc, s"normalize_text not codegen'd:\n$plan")
  }
}
