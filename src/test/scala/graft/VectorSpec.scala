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

  test("pqTopK finds a planted near-duplicate; codes stay in the codebook") {
    val base = Array.tabulate(64)(i => math.sin(i * 1.7).toFloat)
    val near = base.map(x => x + 0.005f)
    val rows = Seq((40L, base), (41L, near)) ++
      (0L to 39L).map(k => (k, Array.tabulate(64)(i =>
        math.cos(i * 0.31 * (k + 2)).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 40)
    val got = VectorSearch.pqTopK(df.where($"vec_id" =!= 40), q,
      "vec_id", "embedding", k = 3, nCodes = 8, rerank = 16)
      .select("vec_id", "code0", "code1", "approx_ip", "sim")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length == 3)
    // exact rerank puts the planted near-dup first (ADC shortlists it:
    // its codes match the query's nearest codebook entries)
    assert(got.head._1 == 41L, s"got ${got.toSeq}")
    // codes are codebook member ids (lowest-id vectors, excl. the query)
    val codebookIds = (0L to 7L).toSet
    got.foreach { case (_, c0, c1, _, sim) =>
      assert(codebookIds.contains(c0) && codebookIds.contains(c1))
      assert(sim <= 1.0 && sim >= -1.0)
    }
    // sims are non-increasing (final exact-rerank ordering)
    assert(got.map(_._5).toSeq == got.map(_._5).sortBy(-_).toSeq)
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

  test("ivfPqTopK at nCodes > 64: ADC keys stay collision-free (stride fix)") {
    // Regression for the r7 ADVICE stride bug: ADC map keys packed
    // (cell, code) as cell*64 + code with a HARD-CODED 64. Codes are vec
    // ids in [nCodes, 2*nCodes), so once nCodes > 64 a high code spills
    // into the next cell's key block and lands on a valid (cell+1, code')
    // pair — duplicate map keys (a runtime error under Spark's default
    // dedup policy, silently wrong scores otherwise). The stride is now
    // 2*nCodes; at nCodes = 80 the old packing had 16 colliding pairs per
    // adjacent probed cell pair, so this test fails loudly against it.
    val dim = 64
    val base = Array.tabulate(dim)(i => math.sin(i * 1.7).toFloat)
    val near = base.map(x => x + 0.005f)
    val rows = Seq((165L, base), (166L, near)) ++
      (0L to 164L).map(k => (k, Array.tabulate(dim)(i =>
        math.cos(i * 0.31 * (k + 2)).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val q = df.where($"vec_id" === 165)
    val got = VectorSearch.ivfPqTopK(df.where($"vec_id" =!= 165), q,
      "vec_id", "embedding", k = 3, nCells = 4, nProbe = 4,
      nCodes = 80, rerank = 32)
      .select("vec_id", "approx_ip", "sim")
      .as[(Long, Double, Double)].collect()
    assert(got.length == 3)
    assert(got.head._1 == 166L,
      s"planted near-dup should survive ADC shortlisting at nCodes=80: " +
        s"${got.toSeq}")
    got.foreach { case (_, ip, sim) =>
      assert(!ip.isNaN && !ip.isInfinite)
      assert(sim <= 1.0 && sim >= -1.0)
    }
  }

  test("trainCentroids: Lloyd refinement separates planted clusters") {
    // 3 tight clusters around near-orthogonal directions, ids interleaved
    // so the seed (lowest 3 ids) starts with one member of each cluster
    val dirs = Seq(
      Array.tabulate(32)(i => if (i < 11) 1.0f else 0.01f),
      Array.tabulate(32)(i => if (i >= 11 && i < 22) 1.0f else 0.01f),
      Array.tabulate(32)(i => if (i >= 22) 1.0f else 0.01f))
    val rows = (0L until 30L).map { id =>
      val c = (id % 3).toInt
      (id, dirs(c).zipWithIndex.map { case (x, i) =>
        x + 0.02f * math.sin(id * 3.1 + i).toFloat })
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2))
      .toDF("vec_id", "embedding")
    val trained = VectorSearch.trainCentroids(df, "vec_id", "embedding",
      nCells = 3, iters = 4)
    assert(trained.length == 3 && trained.map(_._2.length).forall(_ == 32))
    // after training, assignment must equal the planted clustering
    val assigned = df.withColumn("cell",
      graft.functions.VectorExpressions.best_cell(col("embedding"),
        trained.map(_._2), trained.map(_._1)))
      .select("vec_id", "cell").as[(Long, Long)].collect()
    val byCluster = assigned.groupBy(_._1 % 3).view.mapValues(_.map(_._2).toSet)
    assert(byCluster.values.forall(_.size == 1),
      s"each planted cluster should map to exactly one cell: $byCluster")
    assert(byCluster.values.flatten.toSet.size == 3,
      "distinct clusters must land in distinct cells")
    // determinism: same input -> bit-identical centroids
    val again = VectorSearch.trainCentroids(df, "vec_id", "embedding", 3, 4)
    assert(trained.zip(again).forall { case ((i1, c1), (i2, c2)) =>
      i1 == i2 && c1.sameElements(c2) })
  }

  test("q_e_ivf_trained_topk: recall vs exact brute force (rows-only query)") {
    val dir = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("q_e_cosine_topk")(spark, dir)
      .select("vec_id").as[Long].collect().toSeq
    val trained = SparkEntry.queries("q_e_ivf_trained_topk")(spark, dir)
      .select("vec_id").as[Long].collect().toSeq
    assert(trained.size == 10)
    // the true nearest neighbor must survive probe-and-rerank
    assert(trained.head == exact.head,
      s"trained IVF lost the top-1: got ${trained.head}, want ${exact.head}")
    assert(trained.toSet.intersect(exact.toSet).size >= 5,
      s"recall@10 too low: ${trained.toSet.intersect(exact.toSet).size}/10")
  }

  test("q_e_quantize_int8: reconstruction bound and clip behavior") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_e_quantize_int8")(spark, dir)
      .select("dim", "scale", "sum_q", "sum_abs_q", "n_clipped")
      .as[(Int, Double, Long, Long, Long)].collect()
    assert(rows.length == 64 && rows.map(_._1).toSeq == (0 until 64))
    rows.foreach { case (d, scale, sumQ, sumAbsQ, nClip) =>
      assert(scale > 0, s"dim $d: degenerate scale")
      assert(math.abs(sumQ) <= sumAbsQ)
      assert(nClip >= 1, s"dim $d: the absmax row itself must hit ±127")
    }
    // direct reconstruction check: |v - q·scale| <= scale/2 when
    // unclipped — against the EXACT per-dim scale recomputed from data
    // (the output scale is display-rounded to 6 digits)
    val vals = Tables(spark, dir, "embeddings")
      .select(posexplode($"embedding").as(Seq("dim", "v")))
      .select($"dim", $"v".cast("double").as("v"))
      .as[(Int, Double)].collect()
    val exactScale = vals.groupBy(_._1)
      .map { case (d, vs) => d -> vs.map(x => math.abs(x._2)).max / 127.0 }
    rows.foreach { case (d, outScale, _, _, _) =>
      assert(math.abs(outScale - exactScale(d)) <= 5e-7,
        s"dim $d: display scale drifted from absmax/127")
    }
    val bad = vals.count { case (d, v) =>
      val s = exactScale(d)
      val q = math.max(-127L, math.min(127L, math.floor(v / s + 0.5).toLong))
      math.abs(q) < 127L && math.abs(v - q * s) > s / 2 + 1e-12
    }
    assert(bad == 0, s"$bad unclipped values violate the half-step bound")
  }

  test("q_e_label_centroids: well-formed accuracy frame, better than chance") {
    val dir = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("q_e_label_centroids")(spark, dir)
      .select("label", "n", "n_correct", "acc")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.length == 10)
    rows.foreach { case (_, n, c, a) =>
      assert(c <= n && a >= 0.0 && a <= 1.0)
    }
    val total = rows.map(_._2).sum
    val correct = rows.map(_._3).sum
    assert(total == 500)
    // random embeddings → centroid assignment still beats the 10% chance
    // floor on its own training set (self-assignment pulls toward the mean)
    assert(correct * 10L > total,
      s"accuracy ${correct.toDouble / total} not above 1/nLabels")
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

  test("semdedup groups: members of a group are pairwise-reachable and keep=min") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_e_semdedup_groups")(spark, dir)
      .select("vec_id", "group_id", "keep")
      .as[(Long, Long, Boolean)].collect()
    assert(got.nonEmpty) // the fixture plants near-dup embeddings
    got.groupBy(_._2).foreach { case (gid, members) =>
      // the representative is the min id and is flagged keep
      assert(members.map(_._1).min == gid)
      members.foreach { case (id, _, keep) => assert(keep == (id == gid)) }
      assert(members.size >= 2) // CC emits only nodes with an edge
    }
  }

  test("semDedupPairs maxPerCell: identical to uncapped when no cell " +
      "exceeds the cap; hot cells star through the min-id rep") {
    // (a) no-op contract on the real fixture: a cap above every cell's
    // population must reproduce the exact uncapped pair set
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = VectorSearch.seedCentroids(e, "vec_id", "embedding", 16)
    def pairSet(cap: Option[Int]) =
      VectorSearch.semDedupPairs(e, "vec_id", "embedding", cents, 0.45, cap)
        .as[(Long, Long, Double)].collect().toSet
    val un = pairSet(None)
    assert(un.nonEmpty)
    assert(pairSet(Some(1000000)) == un,
      "cap above every cell population must be a no-op")
    CacheScope.release(spark)

    // (b) star contract on a planted hot cell: 5 near-identical vectors in
    // cell 0 (cap 2 → hot), 2 in cell 1 (cold, exact pairs preserved)
    val cents2 = Array((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
    val df = Seq(
      (10L, Array(1f, 0.010f, 0f)), (11L, Array(1f, 0.011f, 0f)),
      (12L, Array(1f, 0.012f, 0f)), (13L, Array(1f, 0.013f, 0f)),
      (14L, Array(1f, 0.014f, 0f)),
      (20L, Array(0f, 1f, 0.01f)), (21L, Array(0f, 1f, 0.02f)))
      .toDF("vec_id", "embedding")
    val capped = VectorSearch
      .semDedupPairs(df, "vec_id", "embedding", cents2, 0.9, Some(2))
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // hot cell 0: ONLY (rep=10, member) star pairs — the documented loss
    // is member↔member pairs like (11,12); cold cell 1 keeps its pair
    assert(capped == Set((10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L),
      (20L, 21L)))
    val uncapped2 = VectorSearch
      .semDedupPairs(df, "vec_id", "embedding", cents2, 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(uncapped2.size == 11, "5-clique (10) + cold pair (1)")
    assert(capped.subsetOf(uncapped2), "the cap never invents pairs")
    // CC connectivity is preserved through the star (the property the
    // group-collapse consumer needs): both reach the same groups
    val gC = graft.dedup.NearDup.connectedComponents(
      VectorSearch.semDedupPairs(df, "vec_id", "embedding", cents2, 0.9,
        Some(2)), "vec_a", "vec_b")
      .as[(Long, Long)].collect().toMap
    val gU = graft.dedup.NearDup.connectedComponents(
      VectorSearch.semDedupPairs(df, "vec_id", "embedding", cents2, 0.9),
      "vec_a", "vec_b").as[(Long, Long)].collect().toMap
    assert(gC == gU, "star edges must preserve the duplicate groups here")
    CacheScope.release(spark)
  }

  test("incrementalSemDedup maxPerCell: cold cells exact, hot cells " +
      "star + rep-mediated top-1 corpus attribution (residual pinned)") {
    // quantizer: cell 0 = x-axis, cell 1 = y-axis
    val cents = Array((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
    // corpus: ids 0,1 in cell 0 (0 is the rep's BEST match by design:
    // exactly the rep's direction); id 2 in cell 1
    val corpus = Seq(
      (0L, Array(1f, 0.015f, 0f)), (1L, Array(1f, 0.200f, 0f)),
      (2L, Array(0f, 1f, 0.01f))).toDF("vec_id", "embedding")
    // delta: hot cell 0 (ids 100..103 > cap 2, rep = 100), cold cell 1
    val delta = Seq(
      (100L, Array(1f, 0.010f, 0f)), (101L, Array(1f, 0.011f, 0f)),
      (102L, Array(1f, 0.012f, 0f)), (103L, Array(1f, 0.190f, 0f)),
      (200L, Array(0f, 1f, 0.02f)), (201L, Array(0f, 1f, 0.03f)))
      .toDF("vec_id", "embedding")
    val thr = 0.99
    val capped = VectorSearch.incrementalSemDedup(
        corpus, delta, "vec_id", "embedding", cents, thr, Some(2))
      .select("new_vec", "dup_of").as[(Long, Long)].collect().toSet
    CacheScope.release(spark)
    // cold cell 1 keeps the exact gate: both members probe the corpus,
    // within-batch pair intact
    assert(capped.contains((200L, 2L)) && capped.contains((201L, 2L)))
    assert(capped.contains((201L, 200L)))
    // hot cell: members flag through the rep (star), rep probes corpus
    assert(capped.contains((100L, 0L)), "rep probes the corpus")
    assert(capped.contains((101L, 100L)) && capped.contains((102L, 100L)),
      "members star through the rep")
    assert(!capped.contains((103L, 100L)),
      "103's tilt puts it under the star threshold vs the rep")
    // rep-mediated top-1 attribution: members inherit the rep's BEST
    // corpus match (id 0) and exact-verify against it
    assert(capped.contains((101L, 0L)) && capped.contains((102L, 0L)))
    // the DOCUMENTED residuals: (a) member↔member hot pairs are absent
    assert(!capped.contains((102L, 101L)))
    // (b) member 103 dups corpus 1 (both ~0.19/0.20 tilt) but corpus 1 is
    // NOT the rep's best match → that attribution is lost under the cap
    // (103 also fails the star to the rep at this threshold)...
    assert(!capped.contains((103L, 1L)))
    // ...while the UNCAPPED gate reports it — the loss is real, bounded,
    // and exactly what the scaladoc declares
    val uncapped = VectorSearch.incrementalSemDedup(
        corpus, delta, "vec_id", "embedding", cents, thr)
      .select("new_vec", "dup_of").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((103L, 1L)))
    assert(capped.subsetOf(uncapped), "the cap never invents matches")
    CacheScope.release(spark)

    // no-op contract on the real fixture split (the q_e_semdedup_
    // incremental shape): a cap above every delta cell population must
    // reproduce the exact uncapped result
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents16 = VectorSearch.seedCentroids(
      e.where($"vec_id" < 400), "vec_id", "embedding", 16)
    def gate(cap: Option[Int]) = VectorSearch.incrementalSemDedup(
        e.where($"vec_id" < 400), e.where($"vec_id" >= 400),
        "vec_id", "embedding", cents16, 0.35, cap)
      .as[(Long, Long, Double)].collect().toSet
    val base = gate(None)
    assert(base.nonEmpty)
    assert(gate(Some(1000000)) == base)
    CacheScope.release(spark)
  }

  test("capped semdedup plans: no cartesian/BNLJ, corpus probed not " +
      "self-joined (the shapes ScaleProbe runs at 1000x)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = VectorSearch.seedCentroids(
      e.where($"vec_id" < 400), "vec_id", "embedding", 16)
    val gate = VectorSearch.incrementalSemDedup(
      e.where($"vec_id" < 400), e.where($"vec_id" >= 400),
      "vec_id", "embedding", cents, 0.35, Some(64))
    val pairs = VectorSearch.semDedupPairs(
      e, "vec_id", "embedding", cents, 0.45, Some(64))
    for ((nm, df) <- Seq("incremental" -> gate, "pairs" -> pairs)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$nm plan has a cartesian")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$nm plan has a nested-loop join")
    }
    CacheScope.release(spark)
  }

  test("ann recall eval: agrees with independently computed overlap") {
    val dir = "/root/testdata/sf0.001"
    val Seq((k, hits, recall)) = SparkEntry.queries("q_e_ann_recall")(spark, dir)
      .as[(Int, Long, Double)].collect().toSeq
    assert(k == 10)
    val exact = SparkEntry.queries("q_e_cosine_topk")(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    val ann = SparkEntry.queries("q_e_ann_lsh_topk")(spark, dir)
      .select("vec_id").as[Long].collect().toSet
    assert(hits == (exact & ann).size)
    assert(recall == hits / 10.0)
    assert(recall >= 0.0 && recall <= 1.0)
    // NOTE: on this fixture's near-orthogonal random embeddings the 4×8
    // family scores LOW (0.1 at sf0.01, 0 at sf0.001) — that is the
    // operator doing its job: it's the report that says "these banding
    // parameters are too coarse for this corpus" before an index ships.
  }
}
