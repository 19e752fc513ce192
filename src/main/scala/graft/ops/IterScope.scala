package graft.ops

import org.apache.spark.sql.SparkSession

/** Scoped SQL-conf override for ITERATIVE sections (the CC loop, the
  * PageRank cascade, an incremental gate's one-shot materialization).
  *
  * Why it exists: AQE materializes every query stage as its OWN Spark job
  * — correct and useful for one-shot analytic plans (runtime re-planning,
  * skew splits), but for an iterative section it turns each tiny round
  * into 3-6 serial driver walls. Serial job boundaries are the unit of
  * contention amplification: on a busy driver host every wall pays the
  * scheduling tax (BENCH_NOTES r7: eager-checkpoint walls amplified
  * PageRank 3 s idle → 45 s contended; r9 verdict item 4 names the two
  * most action-serialized queries). The loops here run on fixed 32-key
  * hash shapes where runtime re-planning has nothing to decide, so the
  * honest trade is: AQE OFF inside the loop (one job per round, stages
  * pipelined by the DAG scheduler without driver re-plan pauses), AQE ON
  * for everything around it. At cluster scale a skewed near-dup graph can
  * flip the trade — the scope is per-call-site, not global, precisely so
  * that decision stays local and documented.
  *
  * NOT thread-safe across concurrently-built queries (SQL conf is
  * session-global): Bench/Verify/tests build queries sequentially by
  * contract, and the scope restores priors even on exception.
  */
object IterScope {
  def withConf[T](spark: SparkSession, kv: (String, String)*)(body: => T): T = {
    val conf = spark.conf
    val prior = kv.map { case (k, _) => k -> conf.getOption(k) }
    kv.foreach { case (k, v) => conf.set(k, v) }
    try body
    finally prior.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  /** The iterative-section default: AQE off for the scope (see above). */
  def noAqe[T](spark: SparkSession)(body: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(body)
}
