package graft

import graft.ops.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("as-of semantics: latest right at or before each left, per key") {
    val left = Seq(("A", ts(10), 1L), ("A", ts(20), 2L), ("A", ts(5), 3L),
      ("B", ts(10), 4L)).toDF("k", "lts", "lid")
    val right = Seq(("A", ts(8), 100.0), ("A", ts(10), 200.0),
      ("A", ts(15), 300.0), ("B", ts(30), 400.0)).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select("lid", "matched_v").as[(Long, Double)].collect().toMap
    // lts=10 matches rts=10 (inclusive), lts=20 -> rts=15; lts=5 -> none;
    // B's only right row is later -> none
    assert(out == Map(1L -> 200.0, 2L -> 300.0))
  }

  test("tolerance drops stale matches") {
    val left = Seq(("A", ts(100), 1L), ("A", ts(500), 2L)).toDF("k", "lts", "lid")
    val right = Seq(("A", ts(90), 1.0)).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("v"),
      toleranceSeconds = Some(60L))
      .select("lid").as[Long].collect().toSet
    assert(out == Set(1L)) // 500-90=410s > 60s tolerance
  }

  test("forward direction: earliest right at or after each left, per key") {
    val left = Seq(("A", ts(10), 1L), ("A", ts(20), 2L), ("A", ts(50), 3L),
      ("B", ts(10), 4L)).toDF("k", "lts", "lid")
    val right = Seq(("A", ts(10), 100.0), ("A", ts(25), 200.0),
      ("B", ts(5), 300.0)).toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("v"),
        direction = "forward")
      .select("lid", "matched_v").as[(Long, Double)].collect().toMap
    // lts=10 matches rts=10 (inclusive), lts=20 -> rts=25; lts=50 -> none;
    // B's only right row is earlier -> none
    assert(out == Map(1L -> 100.0, 2L -> 200.0))
    // forward tolerance: gap measured right-minus-left
    val tol = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("v"),
        toleranceSeconds = Some(3L), direction = "forward")
      .select("lid").as[Long].collect().toSet
    assert(tol == Set(1L)) // 25-20=5s > 3s tolerance
  }

  test("dense right side: cost is one pass, result is the max preceding") {
    val left = Seq(("A", ts(1000), 1L)).toDF("k", "lts", "lid")
    val right = (1 to 999).map(i => ("A", ts(i.toLong), i.toDouble))
      .toDF("k", "rts", "v")
    val out = AsofJoin.asofJoin(left, right, "k", "lts", "rts", Seq("v"))
      .select("matched_v").as[Double].head()
    assert(out == 999.0)
  }
}
