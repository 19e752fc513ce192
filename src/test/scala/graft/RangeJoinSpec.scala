package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def points = Seq(
    (1L, 10L), (1L, 100L), (1L, 250L), (1L, 260L), (1L, 1000L),
    (2L, 100L), (2L, 240L)
  ).toDF("k", "t")

  // intervals spanning multiple buckets, touching bucket edges, empty
  private def intervals = Seq(
    (1L, 0L, 90L, 260L),    // crosses several 100-wide buckets
    (1L, 1L, 999L, 1001L),  // tight around a point
    (1L, 2L, 300L, 400L),   // matches nothing
    (2L, 3L, 240L, 240L),   // zero-width, exactly on a point
    (3L, 4L, 0L, 10000L)    // key with no points
  ).toDF("k", "iid", "lo", "hi")

  test("rangeJoin equals the naive theta join on a planted case") {
    val got = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 100L)
      .select("k", "iid", "t").as[(Long, Long, Long)].collect().toSet
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.t" >= $"i.lo" && $"p.t" <= $"i.hi")
      .select($"p.k", $"i.iid", $"p.t").as[(Long, Long, Long)]
      .collect().toSet
    assert(got == naive)
    // each qualifying pair appears exactly once (no bucket double-count)
    val gotList = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 100L)
      .select("k", "iid", "t").as[(Long, Long, Long)].collect().toSeq
    assert(gotList.length == gotList.toSet.size)
  }

  test("rangeJoin result is width-invariant") {
    def run(w: Long) = RangeJoin.rangeJoin(points, intervals, Seq("k"),
        "t", "lo", "hi", w)
      .select("k", "iid", "t").as[(Long, Long, Long)].collect().toSet
    assert(run(1L) == run(100L) && run(100L) == run(100000L))
  }

  test("rangeJoin plans a hash join, not a cartesian/BNLJ") {
    // force the no-broadcast regime a big x big range join lives in
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.rangeJoin(points, intervals, Seq("k"),
          "t", "lo", "hi", bucketWidth = 100L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"range join must stay an equi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
