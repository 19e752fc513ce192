package graft

import graft.functions.VectorExpressions.{cosine_sim, lsh_signature}
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VectorSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  test("cosine_sim: identity, orthogonality, antipodality, zero-norm") {
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),   // 1
      (Array(1.0f, 0.0f), Array(0.0f, 2.0f)),   // 0
      (Array(1.0f, 1.0f), Array(-1.0f, -1.0f)), // -1
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))    // zero-norm -> 0
    ).toDF("a", "b")
    val sims = df.select(round(cosine_sim(col("a"), col("b")), 9))
      .as[Double].collect()
    assert(sims.toSeq == Seq(1.0, 0.0, -1.0, 0.0))
  }

  test("cosine_sim matches hand-computed value on unequal-norm vectors") {
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
    val sim = df.select(cosine_sim(col("a"), col("b"))).as[Double].head()
    assert(math.abs(sim - 24.0 / 25.0) < 1e-12)
  }

  test("lsh_signature is deterministic and scale-invariant") {
    val v = Array(0.3f, -0.7f, 0.2f, 0.9f)
    val df = Seq(
      Tuple1(v), Tuple1(v),                       // identical
      Tuple1(v.map(_ * 2.5f))                     // scaled: same signs of dots
    ).toDF("v")
    val sigs = df.select(lsh_signature(col("v"), 16)).as[Long].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) == sigs(2)) // sign-projection ignores positive scaling
    assert(sigs(0) >= 0 && sigs(0) < (1L << 16))
  }

  test("annTopK finds a planted near-duplicate via banded LSH") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val near = base.zipWithIndex.map { case (x, i) => x + (if (i % 7 == 0) 0.01f else 0f) }
    val rows = Seq((0L, base), (1L, near)) ++
      (2L to 40L).map(k => (k, Array.tabulate(64)(i => math.cos(i * 0.31 * (k + 2)).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 0)
    val top = VectorSearch.annTopK(df.where($"vec_id" =!= 0), q,
      "vec_id", "embedding", 3, nBands = 4, bitsPerBand = 8)
      .select("vec_id").as[Long].collect()
    assert(top.headOption.contains(1L),
      s"planted near-dup should be rank 1, got ${top.toSeq}")
  }

  test("ivfTopK finds a planted near-duplicate and beats empty recall") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val near = base.map(x => x + 0.005f)
    val rows = Seq((40L, base), (41L, near)) ++
      (0L to 39L).map(k => (k, Array.tabulate(64)(i =>
        math.cos(i * 0.31 * (k + 2)).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 40)
    val top = VectorSearch.ivfTopK(df.where($"vec_id" =!= 40), q,
      "vec_id", "embedding", 3, nCells = 8, nProbe = 3)
      .select("vec_id").as[Long].collect()
    assert(top.headOption.contains(41L),
      s"planted near-dup should be rank 1, got ${top.toSeq}")
  }

  test("ivfTopK cell assignment is codegen'd — no ScalaUDF in the plan") {
    val rows = (0L to 39L).map(k => (k, Array.tabulate(64)(i =>
      math.cos(i * 0.31 * (k + 2)).toFloat)))
    // RDD-backed (not a LocalRelation) so Catalyst can't constant-fold
    // the assignment away before the plan is inspectable
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2))
      .toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 0)
    val plan = VectorSearch.ivfTopK(df, q, "vec_id", "embedding", 3,
      nCells = 8, nProbe = 3).queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"ScalaUDF found in plan:\n$plan")
    assert(plan.contains("best_cell"), s"best_cell missing from plan:\n$plan")
  }

  test("cosineTopK exact ranking on a small frame") {
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 0)
    val got = VectorSearch.cosineTopK(df.where($"vec_id" =!= 0), q,
      "vec_id", "embedding", 3).select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
