package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Multiply, Pmod}
import org.apache.spark.sql.graftbridge.FunctionBridge

/** The engine's Catalyst extension point: exposes the native codegen'd
  * expressions as SQL functions, so text SQL (Grafana-style S8 surface)
  * can call them exactly like built-ins.
  *
  * Two hooks, same builders:
  *  - deployment: `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`);
  *  - live session: `GraftExtensions.register(spark)` — what
  *    `Tables.registerAll` calls so the oracle-checked SQL queries can
  *    use the functions in any harness-provided session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, b) =>
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        b))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, who: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$who expects a literal int argument, got $other")
  }

  private def arity(args: Seq[Expression], who: String, lo: Int,
      hi: Int): Unit =
    if (args.length < lo || args.length > hi) {
      val want = if (lo == hi) s"$lo" else s"$lo to $hi"
      val noun = if (lo == hi && hi == 1) "argument" else "arguments"
      throw new IllegalArgumentException(
        s"$who expects $want $noun, got ${args.length}")
    }

  /** name → expression builder, shared by both registration hooks. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> ((args: Seq[Expression]) => {
      arity(args, "rolling_hash", 1, 1)
      RollingHash(args.head)
    }),
    "cosine_sim" -> ((args: Seq[Expression]) => {
      arity(args, "cosine_sim", 2, 2)
      CosineSim(args(0), args(1))
    }),
    "lsh_signature" -> ((args: Seq[Expression]) => {
      arity(args, "lsh_signature", 2, 2)
      LshSignature(args(0), intArg(args(1), "lsh_signature"))
    }),
    "min_hash_signature" -> ((args: Seq[Expression]) => {
      arity(args, "min_hash_signature", 3, 3)
      MinHashSignature(args(0), intArg(args(1), "min_hash_signature"),
        intArg(args(2), "min_hash_signature"))
    }),
    "sim_hash" -> ((args: Seq[Expression]) => {
      arity(args, "sim_hash", 2, 2)
      SimHash(args(0), intArg(args(1), "sim_hash"))
    }),
    "winnow_fingerprints" -> ((args: Seq[Expression]) => {
      arity(args, "winnow_fingerprints", 3, 3)
      WinnowFingerprints(args(0), intArg(args(1), "winnow_fingerprints"),
        intArg(args(2), "winnow_fingerprints"))
    }),
    // the engine's deterministic sampling hash (graft.functions.KeyHash)
    // as SQL text, so data recipes are expressible from the pure-SQL
    // surface: WHERE key_hash(event_id) < threshold
    "key_hash" -> ((args: Seq[Expression]) => {
      arity(args, "key_hash", 1, 1)
      val p = Literal(KeyHash.P)
      val m = Literal(48271L)
      def lehmer(e: Expression): Expression = Pmod(Multiply(e, m), p)
      lehmer(lehmer(lehmer(Pmod(args.head, p))))
    }),
    // Spark ships BloomFilterAggregate/BloomFilterMightContain for its own
    // runtime join filters but does not expose them in the public function
    // registry; surfacing them lets a query build a membership prefilter
    // over a bounded set (e.g. a benchmark's n-grams) as ONE plan — the
    // scalar subquery holding the bloom is all that ships to executors.
    "bloom_filter_agg" -> ((args: Seq[Expression]) => {
      arity(args, "bloom_filter_agg", 3, 3)
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(args(0), args(1), args(2))
    }),
    "might_contain" -> ((args: Seq[Expression]) => {
      arity(args, "might_contain", 2, 2)
      org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(args(0), args(1))
    }),
    // the text-curation pillar from pure SQL: the same composed column
    // trees as graft.text.TextAnalysis, grafted over the call's argument
    // via the Column<->Expression bridge — a Grafana-class consumer can
    // run the quality gate without any Scala
    "token_count" -> ((args: Seq[Expression]) => {
      arity(args, "token_count", 1, 1)
      import org.apache.spark.sql.graftbridge.ColumnBridge._
      eagerExpression(graft.text.TextAnalysis.tokenCount(column(args.head)))
    }),
    "lang_id" -> ((args: Seq[Expression]) => {
      arity(args, "lang_id", 1, 1)
      import org.apache.spark.sql.graftbridge.ColumnBridge._
      eagerExpression(graft.text.TextAnalysis.langId(column(args.head)))
    }),
    "quality_score" -> ((args: Seq[Expression]) => {
      arity(args, "quality_score", 1, 1)
      import org.apache.spark.sql.graftbridge.ColumnBridge._
      eagerExpression(graft.text.TextAnalysis.qualityScore(column(args.head)))
    }),
    // normalized-dedup canonicalization from pure SQL — the same
    // single-byte-scan expression q_d_norm_dedup runs (NormalizeTextExpr;
    // equals trim(regexp_replace(regexp_replace(lower(x),
    // '[^a-z0-9 ]', ' '), ' +', ' ')), bit-equality pinned in
    // NormalizeTextSpec)
    "normalize_text" -> ((args: Seq[Expression]) => {
      arity(args, "normalize_text", 1, 1)
      graft.functions.NormalizeTextExpr(args.head)
    }))

  /** Register on a live session (idempotent — replaces same-name entries). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      FunctionBridge.register(spark, name, b)
    }
}
