package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank power iterations in exact integer micro-units.
  *
  * Determinism discipline: rank mass lives in integer micro-units of
  * [[U]] and every per-step operation is integer division (`div`), so
  * sums are order-free exact — no float summation drift for an oracle or
  * a property test to chase (the DSIR micro-unit discipline applied to a
  * graph recursion). Damping d = 0.85 is the 85/100 integer pair.
  *
  * Scale shape: each iteration is one |E|-row equi-join + one node-keyed
  * partial-agg shuffle — the same bounded pattern as the connected-
  * components collapse it typically composes with. Nothing materializes
  * wider than the edge list.
  */
object PageRank {

  /** One micro-unit of total rank mass (10^12: headroom for BIGINT sums
    * at any realistic node count, precision far below rank-order ties).
    */
  val U = 1000000000000L

  /** `edges` are DIRECTED (src, dst) rows — pass both directions for an
    * undirected graph. Every node MUST have out-degree >= 1 (true by
    * construction for symmetric edge lists, which is what every caller
    * here builds): the node set, the count n, and the rank distribution
    * all derive from `src`, so a sink node (no out-edges) would be
    * absent from the output and its incoming rank mass silently dropped
    * — this is NOT a general dangling-mass PageRank. Callers should
    * retain `edges` (it is read `iters`+1 times). Returns (node, pr)
    * with pr in micro-units.
    */
  def pagerankMicro(edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nTot = deg.agg(count(lit(1)).as("n"))
    // the iterate CARRIES (node, deg, n): each round is then exactly one
    // |E|-row join + one node-keyed agg + one tiny self-join — no
    // per-round broadcast or degree re-aggregation. LAZY localCheckpoint
    // per iterate (the CC-loop discipline) truncates lineage: each round's
    // plan is compiled here against the previous round's LogicalRDD leaf,
    // so the un-truncated round chain can never re-plan adaptively under a
    // long-lived JVM's accumulated state (measured 28 s in the bench
    // harness vs 7 s fresh before checkpointing landed, SCALE.md). Lazy
    // (eager=false) keeps that planning win but drops the per-round
    // driver-side materialization WALL eager had: under a contended host
    // every eager wall paid the contention tax serially (driver r7 bench:
    // 45 s vs 3 s idle — worst amplification on the surface); now the
    // whole cascade materializes inside the consumer's one action, each
    // round persisting as it is first computed (VERDICT r7 #3).
    var pr = deg.crossJoin(broadcast(nTot))
      .select(col("src").as("node"), col("deg"), col("n"),
        expr(s"$U div n").as("pr"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val agg = edges.join(pr, edges("src") === pr("node"))
        .select(edges("dst"), expr("pr div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("sc"))
      pr = pr.join(agg, pr("node") === agg("dst"), "left")
        .select(pr("node"), pr("deg"), pr("n"),
          (expr(s"(15 * $U) div (100 * n)")
            + expr("(85 * coalesce(sc, CAST(0 AS BIGINT))) div 100"))
            .as("pr"))
        .localCheckpoint(false)
    }
    pr.select(col("node"), col("pr"))
  }
}
