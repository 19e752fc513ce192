package graft

import graft.serve.Serving
import graft.ts.TimeSeriesOps._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the ANSI DIVIDE_BY_ZERO class (VERDICT r2 #1): sf0.01 has
  * no zero-value rows, sf0.1 has 6, so every division reached production
  * scale unguarded. Each op here runs over a frame with planted zero /
  * constant stretches and must (a) not throw under Spark 4's default ANSI
  * mode and (b) yield null exactly where the denominator degenerates.
  */
class AnsiSafetySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // value=0 at rows 2 and 5; rows 7-10 constant (zero stddev window)
  private lazy val df = Seq(
    (1L, 100.0), (2L, 0.0), (3L, 105.0), (4L, 110.0), (5L, 0.0),
    (6L, 108.0), (7L, 50.0), (8L, 50.0), (9L, 50.0), (10L, 50.0))
    .toDF("id", "value")
    .withColumn("k", lit("A"))
    .withColumn("ts", timestamp_seconds(col("id") * 60))
  private lazy val w = keyedOrder("k", "ts", "id")

  test("logReturns: zero tick yields null (numerator and denominator), no ANSI error") {
    val out = df.select(col("id"), logReturns(col("value"), w).as("lr"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(1L).isEmpty)              // first row of key
    assert(out(2L).isEmpty)              // price = 0
    assert(out(3L).isEmpty)              // lagged price = 0
    assert(out(4L).isDefined)            // 110/105 — defined
    assert(out(6L).isEmpty)              // lagged price = 0
    assert(out(7L).isDefined)
  }

  test("maRatio: all-zero leading window yields null, no ANSI error") {
    val z = Seq((1L, 0.0), (2L, 0.0), (3L, 4.0)).toDF("id", "value")
      .withColumn("k", lit("A"))
      .withColumn("ts", timestamp_seconds(col("id") * 60))
    val out = z.select(col("id"), maRatio(col("value"), keyedOrder("k", "ts", "id"), 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) && out(2L))           // avg = 0 → null
    assert(!out(3L))                     // avg(0,4)=2 → 2.0
  }

  test("rollingZscore: constant window (stddev 0) yields null, no ANSI error") {
    val out = df.select(col("id"), rollingZscore(col("value"), w, 3).as("z"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L))                      // single row → stddev null
    assert(out(9L) && out(10L))          // constant 50s → stddev 0
    assert(!out(4L))
  }

  test("safeDiv matches the oracle posture: null on zero or null denominator") {
    val out = Seq((1.0, 2.0), (1.0, 0.0)).toDF("n", "d")
      .select(safeDiv(col("n"), col("d")).as("q")).collect()
    assert(out(0).getDouble(0) == 0.5)
    assert(out(1).isNullAt(0))
  }

  test("SMAPE with both sides zero does not throw (A7 denominator)") {
    val out = df.select(
      avg(safeDiv(lit(2) * abs(col("value") - col("value")),
        abs(col("value")) + abs(col("value")))).as("smape")).head()
    assert(!out.isNullAt(0)) // nulls skipped by avg; zero rows contribute null
  }

  test("rolling Pearson over a flat frame yields null, no ANSI raise " +
    "(corr() aggregate would throw: its internal ck/sqrt(xMk*yMk) " +
    "division is unguarded for zero-variance n>1 frames)") {
    // rows 7-10 are constant -> prev == value == 50 on rows 8-10: both
    // stddevs are 0 where DuckDB's CORR returns NULL. The safeDiv(covar,
    // sx*sy) formulation (q_w_rolling_corr) must return null, not raise.
    val f = trailing(w, 3)
    val out = df
      .withColumn("prev", lag(col("value"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("id"), safeDiv(
        covar_samp(col("value"), col("prev")).over(f),
        stddev_samp(col("value")).over(f) *
          stddev_samp(col("prev")).over(f)).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(out(10L).isEmpty) // frame rows 8-10: flat on both sides
    assert(out(4L).isDefined) // varied frame: defined
  }

  test("validateInput on an empty frame reports size, not NullPointerException") {
    val empty = df.where(lit(false))
    val errs = Serving.validateInput(empty, Seq("value"), 1)
    assert(errs == Seq("need >= 1 rows, got 0"))
  }
}
