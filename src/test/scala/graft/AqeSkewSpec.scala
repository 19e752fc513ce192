package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the engine's AQE posture actually engages at the feature it
  * is kept on FOR (SCALE.md: "AQE stays ON although it costs ~10 s of
  * re-planning latency at this micro scale — skew-join and partition
  * coalescing are what the 100 TB deployment needs").
  *
  * Manual salting (`SkewSafe`, `q_a3_salted_summary`) covers algebraic
  * AGGREGATES; for JOINS the declared posture is AQE's runtime skew
  * split — OptimizeSkewedJoin reads the finished shuffle stage's
  * per-partition sizes and splits oversized partitions into parallel
  * sub-reads, something no static plan can do because the skew is only
  * visible in the data. This spec forces the situation at test scale
  * (one key holding ~90 % of the left side, thresholds lowered so the
  * micro shuffle qualifies) and asserts BOTH contracts:
  *  - the final adaptive plan really did mark the join skewed
  *    (`skew=true` on the SMJ node) — the feature engaged, the claim is
  *    not configuration folklore;
  *  - the join's results are identical to the unsplit join — the split
  *    changes cost, never answers.
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("AQE splits a skewed sort-merge join at runtime (skew=true) with " +
      "identical results") {
    // ~90% of left rows share key 0; the rest spread over 99 keys
    val left = spark.range(200000)
      .select((when(col("id") % 10 =!= 0, lit(0L))
        .otherwise(pmod(col("id"), lit(99L)) + 1)).as("k"),
        col("id").as("v"))
    val right = spark.range(100).select(col("id").as("k"),
      (col("id") * 2).as("w"))
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // micro-scale thresholds: a real deployment keeps the defaults
      // (256 MB partitions) — the MECHANISM under test is identical
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // materialize the BARE join: a downstream groupBy(k) would REQUIRE
      // the join's hash partitioning and so veto the skew split (the rule
      // refuses to break a downstream distribution requirement) — which
      // is itself part of the contract this spec documents
      def runJoin(): (Set[(Long, Long, Long)], String) = {
        val joined = left.join(right, "k")
        val rows = joined.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        (rows, joined.queryExecution.executedPlan.toString)
      }
      val (rows, plan) = runJoin()
      assert(plan.contains("skew=true"),
        s"AQE should have split the skewed join partition:\n$plan")
      // parity oracle: the same join with the skew split disabled
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (expect, planOff) = runJoin()
      assert(!planOff.contains("skew=true"), "control run must not split")
      assert(rows == expect, "skew split must not change results")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
