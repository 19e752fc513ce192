package graft

import graft.ops.OrderedRolling
import graft.ops.OrderedRolling.Roll
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OrderedRolling must be BIT-EQUAL to the sliding-frame window — the op
  * replicates SlidingWindowFunctionFrame's per-row re-accumulation with
  * the aggregates' exact update arithmetic, so any last-ulp drift is a
  * bug. Comparison is on collected Rows (== on boxed doubles compares
  * bit patterns via equals; NaN == NaN holds under Double.equals).
  */
class OrderedRollingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def compare(n: Int, nKeys: Int, nParts: Int, rolls: Seq[Roll],
      withNulls: Boolean = false): Unit = {
    val rnd = new scala.util.Random(n * 131 + nKeys + rolls.size)
    val rows = (0 until n).map { i =>
      val v = if (withNulls && rnd.nextInt(5) == 0) None
      else Some(rnd.nextDouble() * 100 - 50)
      (s"k${rnd.nextInt(nKeys)}", i.toLong, v)
    }
    val df = rows.toDF("key", "seq", "value")
    def frame(k: Int) = Window.partitionBy("key").orderBy(col("seq"))
      .rowsBetween(-(k - 1), Window.currentRow)
    val expected = rolls.foldLeft(df) { (d, roll) =>
      val agg = roll.func match {
        case "avg" => avg(col("value"))
        case "sum" => sum(col("value"))
        case "stddev_samp" => stddev_samp(col("value"))
      }
      d.withColumn(roll.name, agg.over(frame(roll.frame)))
    }.orderBy("key", "seq").collect().toSeq
    val got = OrderedRolling.withRollups(df, Seq("key"), Seq(col("seq")),
        rolls, nPartsOpt = Some(nParts))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected,
      s"n=$n nKeys=$nKeys nParts=$nParts rolls=$rolls")
  }

  test("avg+stddev over one frame — the rolling-zscore shape") {
    compare(4000, nKeys = 3, nParts = 16,
      rolls = Seq(Roll("a24", "avg", 24, "value"), Roll("s24", "stddev_samp", 24, "value")))
  }

  test("two avg frames — the momentum shape") {
    compare(3000, nKeys = 4, nParts = 16,
      rolls = Seq(Roll("a3", "avg", 3, "value"), Roll("a12", "avg", 12, "value")))
  }

  test("sum frame, many keys, few rows per key") {
    compare(1000, nKeys = 200, nParts = 8,
      rolls = Seq(Roll("s5", "sum", 5, "value")))
  }

  test("frames spanning tile boundaries (tiles smaller than frame)") {
    compare(40, nKeys = 2, nParts = 32,
      rolls = Seq(Roll("a12", "avg", 12, "value"), Roll("sd12", "stddev_samp", 12, "value")))
  }

  test("frame of 1 (memory 0): stddev_samp is null, avg is identity") {
    compare(500, nKeys = 3, nParts = 8,
      rolls = Seq(Roll("a1", "avg", 1, "value"), Roll("sd1", "stddev_samp", 1, "value")))
  }

  test("null values occupy frame slots but don't contribute") {
    compare(2000, nKeys = 3, nParts = 16,
      rolls = Seq(Roll("a7", "avg", 7, "value"), Roll("sd7", "stddev_samp", 7, "value"),
        Roll("s7", "sum", 7, "value")),
      withNulls = true)
  }

  test("covar_samp over two columns matches the window bit-for-bit, " +
    "pairs with a null on either side skipped whole") {
    val rnd = new scala.util.Random(977)
    val rows = (0 until 3000).map { i =>
      def v() = if (rnd.nextInt(6) == 0) None
        else Some(rnd.nextDouble() * 40 - 20)
      (s"k${rnd.nextInt(3)}", i.toLong, v(), v())
    }
    val df = rows.toDF("key", "seq", "x", "y")
    val f = Window.partitionBy("key").orderBy(col("seq"))
      .rowsBetween(-23, Window.currentRow)
    val expected = df
      .withColumn("c24", covar_samp(col("x"), col("y")).over(f))
      .orderBy("key", "seq").collect().toSeq
    val got = OrderedRolling.withRollups(df, Seq("key"), Seq(col("seq")),
        Seq(Roll("c24", "covar_samp", 24, "x", "y")), nPartsOpt = Some(16))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected)
  }

  test("frame_array over DESC order + reverse equals the forward " +
    "collect_list window — the sliding-training-window shape (x + " +
    "skipped y)") {
    val rnd = new scala.util.Random(4242)
    val rows = (0 until 900).map { i =>
      val v = if (rnd.nextInt(7) == 0) None else Some(rnd.nextDouble() * 9)
      (s"k${rnd.nextInt(3)}", i.toLong, i.toLong, v,
        Some(rnd.nextDouble()).filter(_ => rnd.nextInt(9) != 0))
    }
    val df = rows.toDF("key", "ts", "id", "f", "l")
    val (seqLen, predLen) = (5, 3)
    val w = Window.partitionBy("key").orderBy(col("ts"), col("id"))
    val expected = df
      .withColumn("x", collect_list(col("f")).over(w.rowsBetween(0, seqLen - 1)))
      .withColumn("y", collect_list(col("l"))
        .over(w.rowsBetween(seqLen, seqLen + predLen - 1)))
      .orderBy("key", "ts").collect().toSeq
    val got = OrderedRolling.withRollups(df, Seq("key"),
        Seq(col("ts").desc, col("id").desc),
        Seq(Roll("x", "frame_array", seqLen, "f"),
          Roll("y", "frame_array", predLen, "l", skip = seqLen)),
        nPartsOpt = Some(16))
      .withColumn("x", reverse(col("x")))
      .withColumn("y", reverse(col("y")))
      .orderBy("key", "ts").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected)
  }

  test("frame_array over ASC order equals the trailing collect_list " +
    "window DIRECTLY — scan order is collect_list order for any " +
    "ordering (ADVICE r9: no silent reversal for ASC callers)") {
    val rnd = new scala.util.Random(777)
    val rows = (0 until 700).map { i =>
      val v = if (rnd.nextInt(6) == 0) None else Some(rnd.nextDouble() * 5)
      (s"k${rnd.nextInt(3)}", i.toLong, v)
    }
    val df = rows.toDF("key", "seq", "f")
    val w = Window.partitionBy("key").orderBy(col("seq"))
    val expected = df
      .withColumn("x", collect_list(col("f")).over(w.rowsBetween(-6, 0)))
      .withColumn("z", collect_list(col("f")).over(w.rowsBetween(-8, -4)))
      .orderBy("key", "seq").collect().toSeq
    val got = OrderedRolling.withRollups(df, Seq("key"), Seq(col("seq")),
        Seq(Roll("x", "frame_array", 7, "f"),
          Roll("z", "frame_array", 5, "f", skip = 4)),
        nPartsOpt = Some(16))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected)
  }

  test("the rolling-corr composition: covar + both stddevs in ONE tiled " +
    "pass equals the three window aggregates") {
    val rnd = new scala.util.Random(1213)
    val rows = (0 until 2500).map { i =>
      (s"k${rnd.nextInt(4)}", i.toLong,
        rnd.nextDouble() * 10, rnd.nextDouble() * 10)
    }
    val df = rows.toDF("key", "seq", "x", "y")
    val f = Window.partitionBy("key").orderBy(col("seq"))
      .rowsBetween(-23, Window.currentRow)
    val expected = df
      .withColumn("cv", covar_samp(col("x"), col("y")).over(f))
      .withColumn("sx", stddev_samp(col("x")).over(f))
      .withColumn("sy", stddev_samp(col("y")).over(f))
      .orderBy("key", "seq").collect().toSeq
    val got = OrderedRolling.withRollups(df, Seq("key"), Seq(col("seq")),
        Seq(Roll("cv", "covar_samp", 24, "x", "y"),
          Roll("sx", "stddev_samp", 24, "x"),
          Roll("sy", "stddev_samp", 24, "y")), nPartsOpt = Some(16))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected)
  }
}
