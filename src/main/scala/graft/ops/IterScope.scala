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
  * The override mutates SESSION-GLOBAL SQL conf, so the sequential-build
  * contract (Bench/Verify/tests drive queries one at a time) is ENFORCED
  * at runtime (ADVICE r10, medium): entering a scope on a session that
  * another thread currently holds throws immediately — two interleaved
  * set/restore sequences could each capture the other's transient "false"
  * as its prior and leave AQE disabled session-wide, which fail-fast beats.
  * Same-thread nesting is reentrant (the cascades nest scopes through
  * connectedComponents). A concurrent-query service should give each
  * builder its own `spark.newSession()` (shared cache, isolated SQLConf);
  * this guard is what turns that guidance from prose into an exception.
  */
object IterScope {
  /** Session → thread currently holding an open scope. Entries exist only
    * while a scope is open (outermost exit removes), so the map is empty
    * at rest and never pins a stopped session.
    */
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, Thread]()

  def withConf[T](spark: SparkSession, kv: (String, String)*)(body: => T): T = {
    val me = Thread.currentThread()
    val prev = owners.putIfAbsent(spark, me)
    if (prev != null && (prev ne me))
      throw new IllegalStateException(
        s"IterScope already held by thread '${prev.getName}' on this " +
          "session: concurrent iterative scopes would interleave " +
          "session-global SQL-conf set/restore. Run concurrent builders " +
          "on separate sessions (spark.newSession() shares the cache " +
          "with an isolated SQLConf).")
    val nested = prev ne null
    val conf = spark.conf
    // Capture-then-set happens INSIDE the try (ADVICE r11, low): if a
    // conf.set throws (e.g. a non-modifiable static key), the finally
    // still restores every key that was actually changed and releases
    // the owner entry — a leaked entry would permanently lock the
    // session out of IterScope for other threads. A key whose set threw
    // was never changed (per-key set is all-or-nothing), so only keys
    // appended AFTER a successful set need restoring.
    val applied = scala.collection.mutable.ArrayBuffer.empty[(String, Option[String])]
    try {
      kv.foreach { case (k, v) =>
        val p = conf.getOption(k)
        conf.set(k, v)
        applied += (k -> p)
      }
      body
    } finally {
      applied.reverseIterator.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
      if (!nested) owners.remove(spark, me)
    }
  }

  /** The iterative-section default: AQE off for the scope (see above). */
  def noAqe[T](spark: SparkSession)(body: => T): T =
    withConf(spark, "spark.sql.adaptive.enabled" -> "false")(body)

  /** Test hook (ConcurrencySpec): open-scope count — 0 at rest proves no
    * owner-entry leak survives a concurrent soak.
    */
  private[graft] def openScopes: Int = owners.size
}
