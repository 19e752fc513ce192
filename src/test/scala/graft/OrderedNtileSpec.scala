package graft

import graft.ops.OrderedNtile
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OrderedNtile must assign the IDENTICAL bucket the ntile window assigns
  * — the op reimplements the standard SQL NTILE arithmetic on a
  * distributed (rank, count) instead of a one-task-per-key sort, so any
  * divergence is a bug. Order keys form a strict total order (unique seq
  * tiebreak), matching the op's and the window contract.
  */
class OrderedNtileSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def compare(n: Int, nKeys: Int, buckets: Int, nParts: Int): Unit = {
    val rnd = new scala.util.Random(n * 31 + nKeys * 7 + buckets)
    // heavy ties in value: the seq tiebreak must fully decide the order
    val rows = (0 until n).map { i =>
      (s"k${rnd.nextInt(nKeys)}", i.toLong, rnd.nextInt(10).toDouble)
    }
    val df = rows.toDF("key", "seq", "value")
    val w = Window.partitionBy("key").orderBy(col("value"), col("seq"))
    val expected = df.withColumn("bin", ntile(buckets).over(w))
      .orderBy("key", "seq").collect().toSeq
    val got = OrderedNtile.withNtile(df, Seq("key"),
        Seq(col("value"), col("seq")), buckets, "bin",
        nPartsOpt = Some(nParts))
      .orderBy("key", "seq").collect().toSeq
    CacheScope.release(spark)
    assert(got == expected, s"n=$n keys=$nKeys buckets=$buckets parts=$nParts")
  }

  test("bit-equal to the ntile window: uneven buckets (n % b != 0)") {
    compare(n = 1013, nKeys = 3, buckets = 10, nParts = 8)
  }

  test("bit-equal with more tiles than rows per key (keys span tiles)") {
    compare(n = 500, nKeys = 2, buckets = 7, nParts = 16)
  }

  test("n < buckets: row r lands in bucket r") {
    compare(n = 6, nKeys = 1, buckets = 10, nParts = 4)
    compare(n = 23, nKeys = 5, buckets = 10, nParts = 8) // some keys < b
  }

  test("single bucket and single key degenerate cases") {
    compare(n = 200, nKeys = 1, buckets = 1, nParts = 8)
    compare(n = 200, nKeys = 4, buckets = 3, nParts = 1)
  }

  test("maxKeys cap fails fast on high-cardinality keys instead of an " +
      "unbounded driver read (ADVICE r9)") {
    // 300 distinct keys against maxKeys=64: the counts-only pre-job
    // (O(nParts) longs) trips the cap before any (tile, key) entry is
    // shipped, turning the over-cap case into a visible error
    val df = (0 until 900).map(i => (s"k${i % 300}", i.toLong, i * 0.5))
      .toDF("key", "seq", "value")
    val e = intercept[IllegalArgumentException] {
      OrderedNtile.withNtile(df, Seq("key"), Seq(col("value"), col("seq")),
        buckets = 4, binCol = "bin", nPartsOpt = Some(8), maxKeys = 64)
    }
    CacheScope.release(spark)
    assert(e.getMessage.contains("maxKeys"))
    // and a cap at exactly the cardinality still passes (boundary)
    val small = (0 until 100).map(i => (s"k${i % 10}", i.toLong, i * 0.5))
      .toDF("key", "seq", "value")
    val ok = OrderedNtile.withNtile(small, Seq("key"),
      Seq(col("value"), col("seq")), buckets = 4, binCol = "bin",
      nPartsOpt = Some(8), maxKeys = 10)
    assert(ok.count() == 100)
    CacheScope.release(spark)
  }
}
