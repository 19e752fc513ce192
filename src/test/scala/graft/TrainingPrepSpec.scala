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

  test("quality filter fit: GD actually learns — log-loss strictly " +
    "decreases per step and stays under the zero-weight baseline") {
    val rows = SparkEntry.queries("q_t_quality_filter_fit")(spark, dir)
      .orderBy("step")
      .select("step", "log_loss", "w0")
      .as[(Int, Double, Double)].collect()
    CacheScope.release(spark)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val losses = rows.map(_._2)
    // ln(2) = 0.6931 is the loss at w = 0; every step must improve on
    // the previous one
    assert(losses.head < 0.6931, s"step-1 loss ${losses.head}")
    assert(losses.sliding(2).forall(p => p(1) < p(0)),
      s"log-loss must decrease monotonically: ${losses.toSeq}")
    // the bias absorbs the class imbalance (negative: minority positives)
    assert(rows.last._3 < 0.0)
  }

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

  test("dsir: en (target-domain) docs score higher than non-en on average") {
    val scored = SparkEntry.queries("q_t_dsir_select")(spark, dir)
      .join(Tables(spark, dir, "documents").select("doc_id", "lang"), "doc_id")
    val avgBy = scored.groupBy($"lang" === "en")
      .agg(avg("dsir_score")).as[(Boolean, Double)].collect().toMap
    // the LLR is fit to favor the target slice — if this inverts, the
    // target/raw models are swapped or the smoothing is broken
    assert(avgBy(true) > avgBy(false),
      s"en avg ${avgBy(true)} should exceed non-en ${avgBy(false)}")
    // selected must be exactly score > 0 (the published decision rule)
    val bad = scored.where(($"dsir_score" > 0.0) =!= $"selected").count()
    assert(bad == 0)
  }

  test("quality calibration: q_cal spans [0,1] per source and is monotone in quality") {
    val got = SparkEntry.queries("q_t_quality_calibrated")(spark, dir)
      .select("source", "quality", "q_cal")
      .as[(String, Double, Double)].collect()
    got.groupBy(_._1).foreach { case (src, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      assert(sorted.head._3 == 0.0, s"$src: lowest doc must calibrate to 0")
      assert(sorted.last._3 == 1.0, s"$src: highest doc must calibrate to 1")
      // percent_rank is monotone in the (quality, id) order
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3)
        case _ =>
      }
    }
  }

  test("bm25: ranked descending, every hit contains a query term") {
    val got = SparkEntry.queries("q_t_bm25_topk")(spark, dir)
      .select("doc_id", "n_terms", "bm25")
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { case (_, nt, score) =>
      assert(nt >= 1 && nt <= 3) // 3 query terms
      assert(score > 0.0) // Lucene IDF (+1 inside the log) is positive
    }
    // ranking is by (rounded score desc, doc_id)
    got.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
      case _ =>
    }
    // every returned doc really contains at least one query term
    val ids = got.map(_._1).toSet
    val withTerm = Tables(spark, dir, "documents")
      .where(col("doc_id").isin(ids.toSeq: _*))
      .where(lower(col("text")).rlike("\\b(join|vector|stream)\\b"))
      .count()
    assert(withTerm == ids.size)
  }

  test("mad outlier gate: flag counts match a direct recomputation") {
    val got = SparkEntry.queries("q_p_outlier_mad")(spark, dir)
      .select("event_type", "n", "n_out", "out_frac")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, n, nOut, frac) =>
      assert(nOut >= 0 && nOut <= n)
      assert(frac == math.round(nOut.toDouble / n * 10000) / 10000.0)
    }
    // recompute one stratum's count from first principles
    val et = got.head._1
    val vals = Tables(spark, dir, "events")
      .where(col("event_type") === et)
      .select(col("value").cast("double")).as[Double].collect().sorted
    def medOf(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val med = math.round(medOf(vals) * 1e4) / 1e4
    val mad = math.round(
      medOf(vals.map(v => math.abs(v - med)).sorted) * 1e4) / 1e4
    val expect = vals.count(v => math.abs(v - med) * 0.6745 > mad * 3.5)
    assert(got.head._3 == expect,
      s"$et: engine says ${got.head._3} outliers, recompute says $expect")
  }

  test("weighted sample: deterministic and biased toward heavy docs") {
    val q = SparkEntry.queries("q_s_weighted_sample")
    val a = q(spark, dir).select("doc_id").as[Long].collect().toSeq
    val b = q(spark, dir).select("doc_id").as[Long].collect().toSeq
    assert(a == b) // reproducible: no rand() anywhere
    assert(a.length == 50 && a.distinct.length == 50) // without replacement
    // ∝-n_chars weighting must pull the sample's mean length above the
    // corpus mean (the point of A-ES keys); deterministic fixture fact
    val sampleMean = q(spark, dir).agg(avg("n_chars")).as[Double].head()
    val corpusMean = Tables(spark, dir, "documents")
      .agg(avg("n_chars")).as[Double].head()
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }
}
