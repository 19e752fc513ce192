package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bound-check verdicts for the seven declared-no-oracle sketch twins
  * (VERDICT r12 #5): each approx query is rows-only in the DuckDB harness
  * (engines' sketches differ bit-for-bit by design), so its correctness
  * gate is an ERROR BOUND against the exact sibling — until r13 enforced
  * only inside test probes (AccuracySpec, ScaleProbe r12d). This object
  * computes the same bounds at Verify time and [[Verify]] dumps them as
  * `approx_bounds.json`, so the correctness artifact itself carries a
  * green/red verdict per twin instead of a bare "no oracle".
  *
  * The contracts are the probe-pinned ones (ScaleProbe sketch-accuracy
  * sweep), verbatim:
  *  - HLL distincts (A2, DAU/WAU): |approx − exact| ≤ max(5 % · exact, 3)
  *    — approx_count_distinct at rsd 0.01, generous 5σ envelope;
  *  - approx_percentile families (A4 quantiles, A5 robust scaler):
  *    per-cell relative error ≤ 2 % (5 % for IQR-derived `scale`, which
  *    amplifies two percentile errors);
  *  - winsorize (P9): the sketch contract is on the CUT, not the rows —
  *    each approx cut's empirical rank sits within 1/Accuracy of its
  *    target percentile (ties make the rank an interval), and the
  *    differing-row fraction is bounded by the two tails' mass;
  *  - MAD outlier gate: flagged fraction within 0.005 of the exact gate;
  *  - curriculum phases: phases partition the corpus exactly and each
  *    phase population is within rank error of the exact cut.
  */
object ApproxBounds {

  final case class Verdict(ok: Boolean, detail: String)

  /** Twin verdicts (all seven on a full run; `only` restricts a filtered
    * dev run to the requested twins so it does not pay the other checks
    * — review r13). A check that throws reports ok=false rather than
    * aborting the dump.
    */
  def report(s: SparkSession, dir: String,
      only: Option[Set[String]] = None): Seq[(String, Verdict)] = {
    def q(n: String): DataFrame = SparkEntry.queries(n)(s, dir)
    val checks: Seq[(String, () => Verdict)] = Seq(
      "q_a2_distinct_approx" -> (() => {
        val approx = q("q_a2_distinct_approx")
          .select("event_type", "approx_users")
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val exact = Tables(s, dir, "events")
          .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        keyedAbs(approx, exact, (e: Long) => math.max(0.05 * e, 3.0))
      }),
      "q_a4_quantiles_approx" -> (() => relCells(s,
        q("q_a4_quantiles_approx"), q("q_a4_quantiles"),
        Map("q25" -> 0.02, "q50" -> 0.02, "q75" -> 0.02))),
      "q_a5_robust_scaler_approx" -> (() => relCells(s,
        q("q_a5_robust_scaler_approx"), q("q_a5_robust_scaler_params"),
        Map("center" -> 0.02, "scale" -> 0.05))),
      "q_a_active_users_approx" -> (() => {
        val a = q("q_a_active_users_approx").collect()
          .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
        val e = q("q_a_active_users").collect()
          .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
        if (a.keySet != e.keySet)
          Verdict(ok = false, "twin does not cover the same days")
        else {
          val bad = e.keys.filter { d =>
            val (dau, wau) = e(d); val (da, wa) = a(d)
            math.abs(da - dau) > math.max(0.05 * dau, 3) ||
              math.abs(wa - wau) > math.max(0.05 * wau, 3)
          }
          if (bad.nonEmpty) Verdict(ok = false,
            s"days past the max(5%,3) HLL bound: ${bad.toSeq.sorted.take(3)}")
          else Verdict(ok = true,
            s"${e.size} days within max(5%,3) of exact DAU/WAU")
        }
      }),
      "q_p9_winsorize_approx" -> (() => winsorize(s, dir, q)),
      "q_p_outlier_mad_approx" -> (() => {
        val a = q("q_p_outlier_mad_approx").select("event_type", "out_frac")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        val e = q("q_p_outlier_mad").select("event_type", "out_frac")
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
        if (a.keySet != e.keySet) Verdict(ok = false, "key sets differ")
        else {
          val worst = e.keys.map(k => math.abs(a(k) - e(k))).max
          Verdict(worst <= 0.005,
            f"max out_frac delta $worst%.5f (bound 0.005)")
        }
      }),
      "q_s_curriculum_phases_approx" -> (() => {
        val a = q("q_s_curriculum_phases_approx").select("phase", "n_docs")
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val e = q("q_s_curriculum_phases").select("phase", "n_docs")
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val total = e.values.sum
        val tol = math.max(
          total / graft.queries.ApproxQueries.Accuracy + 1, 16L)
        if (a.values.sum != total)
          Verdict(ok = false, "phases do not partition the corpus")
        else {
          // getOrElse on BOTH sides (ADVICE r13): a degenerate corpus can
          // leave a phase empty (missing key) on either frame — that is a
          // meaningful delta to report, not a NoSuchElementException that
          // degrades the verdict to an opaque "check threw".
          val worst = (1 to 3)
            .map(ph => math.abs(e.getOrElse(ph, 0L) - a.getOrElse(ph, 0L))).max
          Verdict(worst <= tol,
            s"max phase delta $worst (rank-error tol $tol, total $total)")
        }
      }))
    checks
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .map { case (n, f) =>
        val v = try f() catch {
          case e: Throwable => Verdict(ok = false,
            s"check threw: ${Option(e.getMessage).getOrElse(e.getClass.getName)}")
        }
        CacheScope.release(s)
        n -> v
      }
  }

  private def keyedAbs(approx: Map[String, Long], exact: Map[String, Long],
      bound: Long => Double): Verdict = {
    if (approx.keySet != exact.keySet)
      return Verdict(ok = false, "key sets differ")
    val bad = exact.keys
      .filter(k => math.abs(approx(k) - exact(k)) > bound(exact(k)))
    if (bad.nonEmpty)
      Verdict(ok = false, s"keys past bound: ${bad.toSeq.sorted.take(3)}")
    else {
      val worst = exact.keys.map(k =>
        math.abs(approx(k) - exact(k)).toDouble / math.max(exact(k), 1L)).max
      Verdict(ok = true, f"max rel err $worst%.4f within max(5%%,3)")
    }
  }

  /** Per-cell error on a string-keyed frame (first column is the key,
    * `bounds` maps value columns to their tolerance). The tolerance is
    * MIXED relative/absolute (ADVICE r13): a cell passes when
    * |approx − exact| ≤ b · max(|exact|, columnScale), where columnScale
    * is the column's largest |exact| across keys — so an exact cell of 0
    * (e.g. a median `center` of 0 on symmetric data) gets an absolute
    * envelope proportional to the column's magnitude instead of turning
    * the 2 % relative gate into exact-equality-at-zero. When EVERY exact
    * cell of a column is 0 the formula's limit (tol = 0) is the right
    * contract: approx_percentile over constant data is exact.
    */
  private def relCells(s: SparkSession, approx: DataFrame, exact: DataFrame,
      bounds: Map[String, Double]): Verdict = {
    val a = approx.collect().map(r => r.getString(0) -> r).toMap
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    if (a.keySet != e.keySet) return Verdict(ok = false, "key sets differ")
    val colScale: Map[String, Double] = bounds.keys.map { c =>
      c -> e.values.map(r => math.abs(r.getAs[Double](c))).foldLeft(0.0)(math.max)
    }.toMap
    val errs = for (k <- e.keySet.toSeq; (c, b) <- bounds) yield {
      val av = a(k).getAs[Double](c); val ev = e(k).getAs[Double](c)
      val denom = math.max(math.abs(ev), colScale(c))
      val rel = math.abs(av - ev) / math.max(denom, 1e-9)
      (c, rel, b)
    }
    errs.find { case (_, rel, b) => rel > b } match {
      case Some((c, rel, b)) =>
        Verdict(ok = false, f"$c scaled err $rel%.4f > $b")
      case None =>
        Verdict(ok = true, f"max scaled err ${errs.map(_._2).max}%.4f")
    }
  }

  /** P9: rank-interval bound on each approx cut + tail-mass bound on the
    * differing-row fraction (the ScaleProbe contract — ANY cut difference
    * re-labels the whole clipped tail, so a row-diff bound alone is the
    * wrong metric).
    */
  private def winsorize(s: SparkSession, dir: String,
      q: String => DataFrame): Verdict = {
    val acc = graft.queries.ApproxQueries.Accuracy
    val eps = 1.0 / acc
    val evs = Tables(s, dir, "events").where(col("value").isNotNull)
    val cuts = evs.groupBy("event_type")
      .agg(expr(s"approx_percentile(value, array(0.01, 0.99), $acc)")
        .as("__p"))
      .select(col("event_type"), element_at(col("__p"), 1).as("lo"),
        element_at(col("__p"), 2).as("hi"))
    val rankErrs = evs.join(broadcast(cuts), "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("value") < col("lo")).cast("long")).as("lt_lo"),
        sum((col("value") <= col("lo")).cast("long")).as("le_lo"),
        sum((col("value") < col("hi")).cast("long")).as("lt_hi"),
        sum((col("value") <= col("hi")).cast("long")).as("le_hi"))
      .collect().map { r =>
        val n = r.getAs[Long]("n").toDouble
        def rankErr(lt: Long, le: Long, p: Double): Double =
          math.max(lt / n - p, p - le / n)
        math.max(
          rankErr(r.getAs[Long]("lt_lo"), r.getAs[Long]("le_lo"), 0.01),
          rankErr(r.getAs[Long]("lt_hi"), r.getAs[Long]("le_hi"), 0.99))
      }
    val worstRank = if (rankErrs.isEmpty) 0.0 else rankErrs.max
    val j = q("q_p9_winsorize_approx")
      .select(col("event_type"), col("event_id"),
        col("value_clipped").as("va"))
      .join(q("q_p9_winsorize")
        .select(col("event_type"), col("event_id"),
          col("value_clipped").as("ve")),
        Seq("event_type", "event_id"), "full")
      .agg(count(lit(1)).as("n"),
        // null-safe inequality: a row where BOTH twins emit null (a null
        // source value) is agreement, not difference (review r13)
        sum((!(col("va") <=> col("ve"))).cast("long")).as("diff"))
      .head()
    val frac =
      if (j.getLong(0) == 0L) 0.0 else j.getLong(1).toDouble / j.getLong(0)
    val fracBound = 2 * (0.01 + eps) + 0.001
    if (worstRank > eps + 1e-9)
      Verdict(ok = false, f"cut rank err $worstRank%.6f > $eps")
    else if (frac > fracBound)
      Verdict(ok = false,
        f"differing-row frac $frac%.5f > tail-mass bound $fracBound%.5f")
    else Verdict(ok = true,
      f"cut rank err $worstRank%.6f (bound $eps), tail-diff $frac%.5f")
  }
}
