package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the round-5 operators — the scale
  * contract each query's doc comment claims, pinned so a refactor that
  * silently degrades the plan (lost pushdown, surprise cartesian, window
  * without the rank-limit pushdown) fails CI instead of shipping.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val p = SparkEntry.queries(q)(spark, dir)
      .queryExecution.executedPlan.toString
    CacheScope.release(spark)
    p
  }

  test("hard negatives: per-anchor top-k prunes map-side (WindowGroupLimit)") {
    val p = plan("q_e_hard_negatives")
    assert(p.contains("WindowGroupLimit"),
      s"rank filter should push a group limit below the window:\n$p")
    // the only join is the broadcast anchor batch — non-equi by design
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bloom decontamination: bloom scalar rides a subquery, verify is a " +
      "broadcast semi join, no cartesian") {
    val p = plan("q_t_bloom_decontaminate")
    assert(p.contains("bloom_filter_agg") || p.contains("Subquery"),
      s"bloom build should be an in-plan scalar subquery:\n$p")
    assert(p.contains("LeftSemi"),
      s"exact verify should plan as a semi join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("dim stats: per-dim aggregation collapses map-side (partial agg)") {
    val p = plan("q_e_dim_stats")
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"expected partial aggregation before the dim shuffle:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rollup: grouping sets expand in one Expand+Aggregate, single scan") {
    val p = plan("q_a_rollup_levels")
    assert(p.contains("Expand"),
      s"rollup should plan as Expand over one scan:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"rollup must not re-scan per level:\n$p")
  }

  test("set ops: INTERSECT/EXCEPT plan as semi/anti joins, deduped sides") {
    val p = plan("q_r_set_ops")
    assert(p.contains("LeftSemi"), s"INTERSECT should be a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"EXCEPT should be an anti join:\n$p")
  }

  test("DSIR: every shuffle is keyed on bucket/doc_id (feature-hashing " +
      "contract), never on raw grams; log-ratio table broadcasts") {
    val p = plan("q_t_dsir_select")
    val exchanges = p.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, s"expected hash exchanges in:\n$p")
    exchanges.foreach { e =>
      assert(!e.contains("gram"),
        s"a shuffle keyed on raw grams breaks the 1024-bucket bound:\n$e")
      assert(e.contains("bucket") || e.contains("doc_id"),
        s"unexpected shuffle key (feature hashing should bound keys to " +
          s"B buckets or the doc id):\n$e")
    }
    assert(p.contains("BroadcastExchange"),
      s"the B-row log-ratio table should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("label centroids: fit+assign is one plan with a broadcast join, " +
      "no driver collect boundary") {
    val p = plan("q_e_label_centroids")
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      s"centroid frame should broadcast against the corpus:\n$p")
    assert(p.contains("max_by") || p.contains("HashAggregate"),
      s"argmax should be a partial-aggregable max_by:\n$p")
  }

  test("incremental gates: corpus probed via broadcast joins, shared " +
      "frames cached, no cartesian") {
    val pw = plan("q_d_winnow_incremental")
    assert(pw.contains("BroadcastHashJoin"),
      s"delta/stop-list probes should broadcast against the corpus:\n$pw")
    assert(!pw.contains("CartesianProduct"), pw)
    val ps = plan("q_e_semdedup_incremental")
    assert(ps.contains("BroadcastHashJoin"),
      s"cell-equi probe should broadcast the delta:\n$ps")
    assert(!ps.contains("SortMergeJoin"),
      s"the corpus side must stream, not shuffle into a sort-merge:\n$ps")
    assert(!ps.contains("CartesianProduct"), ps)
  }

  test("normalized dedup: one exchange on the hash, no extra sort shuffles") {
    val p = plan("q_d_norm_dedup")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"canonicalize+hash should shuffle exactly once, saw $exchanges:\n$p")
  }

  test("hybrid RRF: both legs end in per-partition heaps, fuse has no cartesian") {
    val p = plan("q_e_hybrid_rrf")
    assert(p.contains("TakeOrderedAndProject"),
      s"each retrieval leg should truncate via per-partition heaps:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("shard manifest: ONE corpus scan — the total is a window over the " +
      "8-row aggregate, not a second aggregate of the scan") {
    val p = plan("q_s_shard_manifest")
    assert(p.linesIterator.count(_.contains("FileScan")) == 1,
      s"manifest must come from ONE corpus scan:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("BPE train: the distinct-word collapse is retained and reused by " +
      "every round (cache hit, not corpus re-scan)") {
    val p = plan("q_t_bpe_train")
    assert(p.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"both rounds must read the cached word table:\n$p")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastNestedLoopJoin"),
      s"winning pair must broadcast back for the merge fold:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("PageRank canonical: no cartesian; the final join reads the " +
      "CHECKPOINTED last iterate, not a re-derived round chain") {
    val p = plan("q_d_pagerank_canonical")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"),
      s"the pr side must be the localCheckpointed iterate (lineage " +
        s"truncated per round — the CC-loop discipline):\n$p")
  }
}
