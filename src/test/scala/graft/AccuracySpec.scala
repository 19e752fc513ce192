package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the approx-percentile variants within their documented rank-error
  * bound of the exact result (the approx queries are rows-only in the
  * oracle harness — engines' sketches differ — so this is their
  * correctness gate).
  */
class AccuracySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("approx_percentile within rank-error bound of exact percentile") {
    val n = 50000
    val df = (1 to n).map(i => ("k", i.toDouble)).toDF("k", "v")
    val r = df.groupBy("k").agg(
      expr("percentile(v, 0.5)").as("exact"),
      expr(s"approx_percentile(v, 0.5, ${graft.queries.ApproxQueries.Accuracy})")
        .as("approx")).head()
    val (exact, approx) = (r.getDouble(1), r.getDouble(2))
    // rank error <= n/accuracy -> value error <= that many unit steps
    val maxRankErr = n.toDouble / graft.queries.ApproxQueries.Accuracy
    assert(math.abs(exact - approx) <= maxRankErr + 1,
      s"exact=$exact approx=$approx bound=$maxRankErr")
  }

  test("approx_count_distinct within rsd bound of the exact count") {
    val n = 20000
    val df = (1 to n).map(i => ("k", (i % 4321).toLong)).toDF("k", "u")
    val r = df.groupBy("k").agg(
      countDistinct($"u").as("exact"),
      expr("approx_count_distinct(u, 0.01)").as("approx")).head()
    val (exact, approx) = (r.getLong(1), r.getLong(2))
    assert(math.abs(exact - approx) <= exact * 0.05,
      s"exact=$exact approx=$approx")
  }

  test("MAD gate on sketches flags within rank-error of the exact gate") {
    // heavy-tailed mixture: bulk uniform + 1% far outliers, so the gate
    // has something to flag and the sketch error is exercised off-center
    val n = 50000
    val df = (1 to n).map { i =>
      val v = if (i % 100 == 0) 1000.0 + i else i.toDouble % 97
      ("k", v)
    }.toDF("k", "v")
    def gate(p50: String => String): Double = {
      val med = df.groupBy("k").agg(expr(p50("v")).as("med"))
      val wm = df.join(med, "k")
      val mad = wm.groupBy("k").agg(expr(p50("abs(v - med)")).as("mad"))
      wm.join(mad, "k")
        .agg(avg((abs($"v" - $"med") * 0.6745 > $"mad" * 3.5).cast("double")))
        .head().getDouble(0)
    }
    val exactFrac = gate(c => s"percentile($c, 0.5)")
    val approxFrac = gate(c =>
      s"approx_percentile($c, 0.5, ${graft.queries.ApproxQueries.Accuracy})")
    // rank error n/accuracy on each percentile can shift the threshold by
    // a few unit steps; the flagged 1% tail sits far from it, so the
    // fractions must agree to well under half the tail mass
    assert(math.abs(exactFrac - approxFrac) <= 0.005,
      s"exact=$exactFrac approx=$approxFrac")
  }

  test("winsorize approx bounds clip to within rank error of exact bounds") {
    val n = 10000
    val df = (1 to n).map(i => ("k", i.toDouble)).toDF("k", "v")
    val exact = df.groupBy("k").agg(
      expr("percentile(v, 0.01)").as("lo"), expr("percentile(v, 0.99)").as("hi"))
      .head()
    val approx = df.groupBy("k").agg(
      expr("approx_percentile(v, 0.01, 10000)").as("lo"),
      expr("approx_percentile(v, 0.99, 10000)").as("hi")).head()
    assert(math.abs(exact.getDouble(1) - approx.getDouble(1)) <= n / 10000.0 + 1)
    assert(math.abs(exact.getDouble(2) - approx.getDouble(2)) <= n / 10000.0 + 1)
  }

  test("curriculum approx phases agree with exact phase populations within rank error") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q_s_curriculum_phases")(spark, dir)
      .select("phase", "n_docs").as[(Int, Long)].collect().toMap
    val approx = SparkEntry.queries("q_s_curriculum_phases_approx")(spark, dir)
      .select("phase", "n_docs").as[(Int, Long)].collect().toMap
    val total = exact.values.sum
    assert(approx.values.sum == total, "phases must partition the corpus")
    // a rank-error shift of the cut moves at most n/Accuracy docs per
    // boundary (plus ties at the rounded cut value)
    (1 to 3).foreach { ph =>
      val tol = math.max(total / graft.queries.ApproxQueries.Accuracy + 1, 16)
      assert(math.abs(exact(ph) - approx.getOrElse(ph, 0L)) <= tol,
        s"phase $ph: exact=${exact(ph)} approx=${approx.getOrElse(ph, 0L)}")
    }
  }

  test("count-min heavy hitters: never undercounts, overshoot within eps * total") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_t_cms_heavy_hitters")(spark, dir)
      .select("term", "exact_n", "cms_n", "overshoot")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.length == 20)
    val total = Tables(spark, dir, "documents")
      .select(explode(split(lower(trim(col("text"))), "\\s+")).as("t"))
      .where(col("t") =!= "").count()
    rows.foreach { case (term, exact, cms, over) =>
      assert(cms >= exact, s"'$term': CMS undercounted ($cms < $exact)")
      assert(over == cms - exact)
      assert(over <= math.ceil(0.001 * total).toLong + 1,
        s"'$term': overshoot $over exceeds eps*total bound")
    }
  }

  test("approx active users within HLL rsd bound of the exact DAU/WAU per day") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q_a_active_users")(spark, dir)
      .select("day", "dau", "wau7")
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map { case (d, a, w) => d -> ((a, w)) }.toMap
    val approx = SparkEntry.queries("q_a_active_users_approx")(spark, dir)
      .select("day", "dau_approx", "wau7_approx")
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map { case (d, a, w) => d -> ((a, w)) }.toMap
    assert(approx.keySet == exact.keySet, "twin must cover the same days")
    // rsd 0.01 → allow 5 sigma plus integer slack on small counts
    exact.foreach { case (d, (dau, wau)) =>
      val (da, wa) = approx(d)
      assert(math.abs(da - dau) <= math.max(0.05 * dau, 3),
        s"$d: dau exact=$dau approx=$da")
      assert(math.abs(wa - wau) <= math.max(0.05 * wau, 3),
        s"$d: wau exact=$wau approx=$wa")
    }
  }
}
