package graft

import java.nio.file.Files
import graft.serve.Serving
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ServingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def series(key: String, n: Int) =
    (1 to n).map(i => (key, i.toLong, i.toLong, i.toDouble))

  test("slidingWindows: count identity and boundary values") {
    // len = n - seq - pred + 1 windows per key (data_loader.py:163-164)
    val df = (series("A", 20) ++ series("B", 9)).toDF("k", "ts", "id", "v")
    val w = Serving.slidingWindows(df, "k", "ts", "id", "v", "v", 5, 3)
    val a = w.where($"k" === "A")
    assert(a.count() == 20 - 5 - 3 + 1)
    assert(w.where($"k" === "B").count() == 9 - 5 - 3 + 1)
    val first = a.orderBy("id").select("x", "y").head()
    assert(first.getSeq[Double](0) == Seq(1.0, 2.0, 3.0, 4.0, 5.0))
    assert(first.getSeq[Double](1) == Seq(6.0, 7.0, 8.0))
  }

  test("latestWindow: newest seqLen rows in ascending time order") {
    val df = series("A", 10).toDF("k", "ts", "id", "v")
    val lw = Serving.latestWindow(df, "k", "ts", "id", "v", 4)
    val r = lw.head()
    assert(r.getAs[Long]("last_ts") == 10L)
    assert(r.getSeq[Double](r.fieldIndex("x")) == Seq(7.0, 8.0, 9.0, 10.0))
    // key with fewer than seqLen rows is dropped
    assert(Serving.latestWindow(series("B", 3).toDF("k", "ts", "id", "v"),
      "k", "ts", "id", "v", 4).count() == 0)
  }

  test("surrogateForward: deterministic, correct weighted mean") {
    val x = Seq(2.0, 2.0, 2.0, 2.0) // weighted mean of constant = constant
    val out = Serving.surrogateForward(x, 3)
    assert(out.length == 3)
    assert(math.abs(out.head - 2.0 * 1.001) < 1e-12)
    assert(Serving.surrogateForward(x, 3) == out)
  }

  test("robustScale + inverse round-trip through a params table (U2/U3)") {
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("Z", 5.0), ("Z", 5.0))
      .toDF("k", "v")
    val params = Seq(("A", 2.0, 2.0), ("Z", 5.0, 0.0)).toDF("k", "center", "scale")
    val out = Serving.robustScale(df, params, "k", "v")
      .withColumn("back", Serving.robustInverse($"v_scaled", $"center", $"scale"))
    val a = out.where($"k" === "A").select("v", "back").as[(Double, Double)]
      .collect()
    assert(a.forall { case (v, b) => math.abs(v - b) < 1e-12 })
    // zero-IQR key: scaled pinned to 0, inverse falls back to center (U3)
    val z = out.where($"k" === "Z").select("v_scaled", "back")
      .as[(Double, Double)].collect()
    assert(z.forall { case (s, b) => s == 0.0 && b == 5.0 })
  }

  test("validateInput reports missing columns, short input, nulls (U4)") {
    val ok = Seq((1L, 2.0), (2L, 3.0)).toDF("ts", "price")
    assert(Serving.validateInput(ok, Seq("ts", "price"), 2).isEmpty)
    assert(Serving.validateInput(ok, Seq("ts", "volume"), 2)
      .exists(_.contains("volume")))
    assert(Serving.validateInput(ok, Seq("ts"), 5).exists(_.contains(">= 5")))
    val withNull = Seq((1L, Some(2.0)), (2L, None)).toDF("ts", "price")
    assert(Serving.validateInput(withNull, Seq("price"), 1)
      .exists(_.contains("nulls")))
  }

  test("dualWrite: both prediction layouts from one cached frame (K5)") {
    val preds = Seq(("A", 1, 10.0), ("A", 2, 11.0), ("B", 1, 20.0))
      .toDF("product_id", "horizon", "predicted_price")
    val d1 = Files.createTempDirectory("preds").toString + "/p"
    val d2 = Files.createTempDirectory("predsh").toString + "/ph"
    Serving.dualWrite(preds, d1, d2)
    assert(spark.read.parquet(d1).count() == 3)
    val byH = spark.read.parquet(d2)
    assert(byH.count() == 3)
    // by-horizon layout is physically partitioned on horizon (K5 / P17)
    val dirs = new java.io.File(d2).listFiles().map(_.getName).toSet
    assert(dirs.contains("horizon=1") && dirs.contains("horizon=2"))
    assert(byH.where($"horizon" === 1).count() == 2)
  }
}
