package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-4 training-prep operators that an oracle hash
  * can't express directly: chunk tiling/overlap geometry, exact-k sample
  * counts + the WindowGroupLimit plan shape, Z-order audit bounds, and
  * unigram-logprob sanity.
  */
class TrainingPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("chunk_overlap tiles every document: stride 48, last chunk reaches the end") {
    val chunks = SparkEntry.queries("q_t_chunk_overlap")(spark, dir)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect()
    val nToks = Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(expr("filter(split(trim(text), '\\\\s+'), t -> t <> '')"))
          .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.nonEmpty)
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val n = nToks(doc)
      val sorted = cs.sortBy(_._2)
      // chunk_idx contiguous from 0; starts at 1 + 48*idx
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq)
      sorted.foreach { case (_, idx, start, len) =>
        assert(start == 1 + 48 * idx)
        assert(len <= 64 && len > 0)
        // consecutive chunks overlap by 64 - 48 = 16 tokens (when full)
      }
      // the final chunk reaches the document end exactly
      val (_, _, lastStart, lastLen) = sorted.last
      assert(lastStart + lastLen - 1 == n,
        s"doc $doc: last chunk ends at ${lastStart + lastLen - 1}, n=$n")
      // every non-final chunk is full-width (the stride rule guarantees it)
      sorted.init.foreach { case (_, _, _, len) => assert(len == 64) }
    }
  }

  test("fixed_k sample: exactly min(32, |stratum|) rows per source, ranks contiguous") {
    val got = SparkEntry.queries("q_s_fixed_k_sample")(spark, dir)
    val perSource = got.groupBy("source").agg(count(lit(1)).as("n"),
      max("rk").as("maxrk")).collect()
    val totals = Tables(spark, dir, "documents").groupBy("source")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      val want = math.min(32L, totals(r.getString(0)))
      assert(r.getLong(1) == want && r.getLong(2) == want)
    }
    // the rk <= k predicate must become a WindowGroupLimit (map-side
    // partial top-k before the stratum shuffle) — the 100 TB property
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in plan:\n$plan")
  }

  test("zorder audit reports both layouts with sane coverage bounds") {
    val byLayout = SparkEntry.queries("q_a_zorder_layout")(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byLayout.keySet == Set("arrival", "zorder"))
    byLayout.values.foreach { case (nFiles, cov) =>
      assert(nFiles >= 1)
      assert(cov > 0.0 && cov <= 1.0)
    }
    // Z-order buckets bound BOTH dimensions by construction (top morton
    // bits fix high bits of x and y), so coverage is well below full scan
    assert(byLayout("zorder")._2 < 0.5)
  }

  test("unigram logprob: scores are negative, one row per non-empty doc") {
    val got = SparkEntry.queries("q_t_unigram_logprob")(spark, dir)
      .select("doc_id", "n_toks", "avg_logprob")
      .as[(Long, Long, Double)].collect()
    val nDocs = Tables(spark, dir, "documents")
      .where(length(trim(col("text"))) > 0).count()
    assert(got.length == nDocs)
    got.foreach { case (_, n, lp) =>
      assert(n > 0)
      assert(lp < 0.0) // every token probability < 1
    }
  }
}
