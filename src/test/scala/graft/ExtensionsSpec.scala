package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("live-session registration: native functions callable from SQL") {
    GraftExtensions.register(spark)
    Seq((1L, "hello world")).toDF("id", "text").createOrReplaceTempView("t_ext")
    val r = spark.sql(
      """SELECT rolling_hash(text) AS h, sim_hash(text, 1) AS s,
        |  min_hash_signature(text, 1, 4) AS m FROM t_ext""".stripMargin).head()
    val viaColumn = Seq("hello world").toDF("text")
      .select(graft.functions.RollingHash.rolling_hash($"text")).as[Long].head()
    assert(r.getLong(0) == viaColumn)
    assert(r.getSeq[Long](2).length == 4)
  }

  test("builder-time injection: spark.sql.extensions path") {
    // a fresh SparkSession over the same SparkContext, with extensions
    SparkSession.clearActiveSession()
    val fresh = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      import fresh.implicits._
      Seq(("abc", "abd")).toDF("a", "b").createOrReplaceTempView("t_ext2")
      val sim = fresh.sql(
        "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
      assert(sim.getDouble(0) == 1.0)
      assert(fresh.sql("SELECT rolling_hash('a') AS h").head().getLong(0) == 97L)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }

  test("key_hash from SQL text equals the KeyHash column (one definition)") {
    GraftExtensions.register(spark)
    val ids = Seq(0L, 1L, 42L, 44000L, 123456789L)
    ids.toDF("id").createOrReplaceTempView("t_ext_kh")
    val viaSql = spark.sql("SELECT key_hash(id) AS h FROM t_ext_kh ORDER BY id")
      .as[Long].collect().toSeq
    val viaColumn = ids.toDF("id").orderBy("id")
      .select(graft.functions.KeyHash.column($"id")).as[Long].collect().toSeq
    assert(viaSql == viaColumn)
    // and the SQL fragment (the oracle face) agrees too
    val viaFragment = spark.sql(
      s"SELECT ${graft.functions.KeyHash.sql("id")} AS h FROM t_ext_kh ORDER BY id")
      .as[Long].collect().toSeq
    assert(viaFragment == viaColumn)
  }

  test("text-curation functions from SQL equal the TextAnalysis columns " +
    "(one definition, two surfaces)") {
    GraftExtensions.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox is one of the best and a joy to all of us"),
      (2L, "el la de que y los un perro grande corre"),
      (3L, ""),
      (4L, "der die und das ist ein nicht Haus Baum")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("t_ext_txt")
    val viaSql = spark.sql(
      """SELECT doc_id, token_count(text) AS tc, lang_id(text) AS lang,
        |  quality_score(text) AS q, normalize_text(text) AS nt
        |FROM t_ext_txt ORDER BY doc_id""".stripMargin)
      .as[(Long, Int, String, Double, String)].collect().toSeq
    import graft.text.TextAnalysis
    val viaColumn = docs.orderBy("doc_id")
      .select($"doc_id", TextAnalysis.tokenCount($"text"),
        TextAnalysis.langId($"text"), TextAnalysis.qualityScore($"text"),
        graft.functions.NormalizeText.normalize_text($"text"))
      .as[(Long, Int, String, Double, String)].collect().toSeq
    assert(viaSql == viaColumn)
    assert(viaSql.map(_._3) == Seq("en", "es", "und", "de"))
    // and the SQL form equals the regex pipeline it replaces
    val viaRegex = spark.sql(
      """SELECT trim(regexp_replace(regexp_replace(lower(text),
        |  '[^a-z0-9 ]', ' '), ' +', ' ')) FROM t_ext_txt ORDER BY doc_id"""
        .stripMargin).as[String].collect().toSeq
    assert(viaSql.map(_._5) == viaRegex)
  }

  test("punctCount == regexp_count('[^A-Za-z0-9\\s]') on adversarial text") {
    // qualityScore's punct term is computed via translate (one per-char
    // table pass) instead of the regex — a never-matching negated char
    // class is Spark 4.1's regex worst case (measured ~94x a pure-JVM
    // matcher; see TextAnalysis.punctCount). This pins the value
    // contract: identical counts for every char, including all 128
    // ASCII codepoints (covers \t \n  \f \r individually),
    // unicode letters/CJK (non-ASCII counts as punct in BOTH forms,
    // since Java \s and the A-Za-z0-9 ranges are ASCII-only), empties.
    import org.apache.spark.sql.functions._
    val adv = Seq(
      (0 until 128).map(_.toChar).mkString,
      "héllo wörld … 模型   ok",
      "", "   ", "a.b,c;d!e?f") .toDF("text")
    val diff = adv.where(graft.text.TextAnalysis.punctCount(col("text")) =!=
      regexp_count(col("text"), lit("[^A-Za-z0-9\\s]"))).count()
    assert(diff == 0)
  }

  test("literal-arg validation fails clearly") {
    GraftExtensions.register(spark)
    Seq("x").toDF("text").createOrReplaceTempView("t_ext3")
    val e = intercept[Exception] {
      spark.sql("SELECT sim_hash(text, length(text)) FROM t_ext3").collect()
    }
    assert(e.getMessage.contains("literal int"))
  }

  test("wrong-arity calls raise a descriptive error, not IndexOOB") {
    GraftExtensions.register(spark)
    Seq("x").toDF("text").createOrReplaceTempView("t_ext4")
    def err(sql: String): String =
      intercept[Exception] { spark.sql(sql).collect() }.getMessage
    assert(err("SELECT might_contain(text) FROM t_ext4")
      .contains("might_contain expects 2 arguments"))
    assert(err("SELECT bloom_filter_agg(rolling_hash(text)) FROM t_ext4")
      .contains("bloom_filter_agg expects 3 arguments"))
    assert(err("SELECT key_hash(1, 2) FROM t_ext4")
      .contains("key_hash expects 1 argument,"))
    assert(err("SELECT cosine_sim(text) FROM t_ext4")
      .contains("cosine_sim expects 2 arguments"))
  }
}
