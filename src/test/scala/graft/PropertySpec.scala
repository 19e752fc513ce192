package graft

import graft.serve.Serving
import graft.ts.TimeSeriesOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5.4): resample invariants, scaler round-trip,
  * window-count identity — checked over ScalaCheck-generated series with
  * a fixed seed (deterministic in CI, no bridge artifact needed offline).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val seriesGen: Gen[List[Double]] =
    Gen.chooseNum(5, 60).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0.01, 1000.0)))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("stratified sample: deterministic, a subset, and rate-bounded") {
    val dir = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q_s_stratified_sample")
    val a = q(spark, dir).select("event_id").as[Long].collect().toSet
    val b = q(spark, dir).select("event_id").as[Long].collect().toSet
    assert(a == b, "same recipe must select the same rows on every run")
    val all = Tables(spark, dir, "events")
      .select("event_id").as[Long].collect().toSet
    assert(a.subsetOf(all) && a.nonEmpty && a.size < all.size)
  }

  test("sequence pack: bins are contiguous per shard and budget-consistent") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_t_sequence_pack")(spark, dir)
      .select("source", "shard", "doc_id", "n_tokens", "pack_id")
      .as[(String, Long, Long, Int, Long)].collect()
    assert(rows.map(_._2).distinct.length > 1, "sub-sharding must engage")
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, shard) =>
      val sorted = shard.sortBy(_._3)
      // pack ids never decrease along the shard order, start at 0
      val packs = sorted.map(_._5)
      assert(packs.head == 0L && packs.zip(packs.tail).forall { case (x, y) => x <= y })
      // bin boundary = running token count crossing the 256 budget
      var cum = 0L
      sorted.foreach { case (_, _, _, tok, pid) =>
        assert(pid == cum / 256, s"pack_id $pid != ${cum / 256}")
        cum += tok
      }
    }
  }

  test("connected components: labels idempotent under re-run and self-consistent") {
    val pairs = Seq((3L, 9L), (9L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val r1 = graft.dedup.NearDup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val r2 = graft.dedup.NearDup.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(r1 == r2)
    // every label is itself a node carrying that same label (canonical fixpoint)
    r1.values.toSet.foreach((g: Long) => assert(r1(g) == g))
  }

  test("connected components match union-find on random graphs") {
    // CC is the most intricate operator in the engine; the oracle-replay
    // checks only run it on fixture corpora. This pits it against a
    // driver-side union-find (roots = component minimum by construction:
    // every union points the larger root at the smaller, so the final
    // root is the component min — the same canonical labeling CC emits).
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 50)
      m <- Gen.chooseNum(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong)
      } yield (a, b))
    } yield es.filter { case (a, b) => a != b }
    val randomGraphs = samples(edgeGen, 6).filter(_.nonEmpty)
    // plus a 200-node chain: diameter 200 — converges only because of
    // pointer jumping (min-propagation alone would blow the 30-round cap)
    val chain = (0L until 200L).sliding(2).map(s => (s(0), s(1))).toList
    (randomGraphs :+ chain).foreach { edges =>
      val expected = unionFind(edges)
      val got = graft.dedup.NearDup
        .connectedComponents(edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        s"CC mismatch on ${edges.size} edges: " +
          (got.toSet diff expected.toSet).take(5).toString)
    }
  }

  test("PageRank micro-units match a driver-side integer reimplementation " +
      "on random graphs") {
    // exact-integer arithmetic means the comparison is ==, not ≈ — any
    // divergence (summation order, damping rounding, dangling handling)
    // fails loudly
    val edgeGen: Gen[List[(Long, Long)]] = for {
      m <- Gen.chooseNum(3, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, 11L)
        k <- Gen.chooseNum(1L, 10L)
      } yield (a, (a + k) % 12L))
    } yield es.distinct
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { pairs =>
      val dirEdges = pairs.flatMap(p => Seq(p, p.swap)).distinct
      val got = graft.ops.PageRank
        .pagerankMicro(dirEdges.toDF("src", "dst"), 3)
        .as[(Long, Long)].collect().toMap
      CacheScope.release(spark)
      val U = graft.ops.PageRank.U
      val adj = dirEdges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val deg = adj.view.mapValues(_.size.toLong).toMap
      val nodes = adj.keySet
      val n = nodes.size.toLong
      var pr = nodes.map(v => v -> U / n).toMap
      for (_ <- 1 to 3) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
          .withDefaultValue(0L)
        for ((s0, ds) <- adj; d <- ds) contrib(d) += pr(s0) / deg(s0)
        pr = nodes.map(v =>
          v -> ((15L * U) / (100L * n) + (85L * contrib(v)) / 100L)).toMap
      }
      assert(got == pr,
        s"PageRank mismatch on ${dirEdges.size} edges: " +
          (got.toSet diff pr.toSet).take(5).toString)
    }
  }

  test("resample invariants: low=min <= open,close <= high=max; volume conserved") {
    samples(seriesGen, 8).foreach { vs =>
      val df = vs.zipWithIndex
        .map { case (v, i) => ("k", i.toLong * 600, i.toLong, v) }
        .toDF("k", "epoch", "id", "v")
        .withColumn("ts", timestamp_seconds(col("epoch")))
      val r = TimeSeriesOps.resampleOhlcv(df, "k", "ts", "id", "v", "v", 3600)
        .collect()
      r.foreach { row =>
        val (o, h, l, c) = (row.getAs[Double]("open"), row.getAs[Double]("high"),
          row.getAs[Double]("low"), row.getAs[Double]("close"))
        assert(l <= o && o <= h && l <= c && c <= h)
      }
      val volSum = r.map(_.getAs[Double]("volume")).sum
      assert(math.abs(volSum - vs.sum) < 1e-6 * math.max(1.0, vs.sum.abs))
      assert(r.map(_.getAs[Long]("n_rows")).sum == vs.length)
    }
  }

  test("scaler round-trip: inverse(transform(x)) == x when IQR > 0") {
    samples(seriesGen, 8).filter(_.distinct.length > 3).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
        .toDF("k", "id", "v")
      val params = df.groupBy("k").agg(
        expr("percentile(v, 0.5)").as("center"),
        expr("percentile(v, 0.75) - percentile(v, 0.25)").as("scale"))
      val out = Serving.robustScale(df, params, "k", "v")
        .withColumn("back",
          Serving.robustInverse(col("v_scaled"), col("center"), col("scale")))
        .select("v", "back").as[(Double, Double)].collect()
      out.foreach { case (v, back) =>
        assert(math.abs(v - back) <= 1e-9 * math.max(1.0, v.abs))
      }
    }
  }

  test("window count identity: len = n - seq - pred + 1 per key") {
    val cases = for {
      n <- samples(Gen.chooseNum(1, 40), 4)
      seq <- samples(Gen.chooseNum(1, 6), 2)
      pred <- samples(Gen.chooseNum(1, 4), 2)
    } yield (n, seq, pred)
    cases.foreach { case (n, seq, pred) =>
      val df = (1 to n).map(i => ("k", i.toLong, i.toLong, i.toDouble))
        .toDF("k", "ts", "id", "v")
      val got = Serving.slidingWindows(df, "k", "ts", "id", "v", "v",
        seq, pred).count()
      assert(got == math.max(0, n - seq - pred + 1),
        s"n=$n seq=$seq pred=$pred got=$got")
    }
  }

  test("ffill leaves no internal nulls and carries the last non-null forward") {
    samples(seriesGen, 8).foreach { vs =>
      val df = vs.zipWithIndex.map { case (v, i) =>
        ("k", i.toLong, if (i % 3 == 1) None else Some(v))
      }.toDF("k", "id", "v")
      val w = TimeSeriesOps.keyedOrder("k", "id", "id")
      val filled = df.withColumn("f", TimeSeriesOps.ffill(col("v"), w))
        .orderBy("id").select("v", "f")
        .as[(Option[Double], Option[Double])].collect()
      var last: Option[Double] = None
      filled.foreach { case (v, f) =>
        if (v.isDefined) last = v
        assert(f == last)
      }
    }
  }

  test("merge upsert equals a driver-side LWW reimplementation") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q_r_merge_upsert")(spark, dir)
      .select("user_id", "event_type", "last_value", "last_ts", "change_type")
      .as[(Long, String, Double, java.sql.Timestamp, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    val t1 = java.sql.Timestamp.valueOf("2024-01-04 00:00:00").getTime
    val t2 = java.sql.Timestamp.valueOf("2024-01-06 00:00:00").getTime
    val raw = Tables(spark, dir, "events")
      .select("user_id", "event_type", "ts", "event_id", "value")
      .as[(Long, String, java.sql.Timestamp, Long, Double)].collect()
    val expect = raw.filter(_._3.getTime < t2)
      .groupBy(r => (r._1, r._2)).map { case (k, rs) =>
        val base = rs.filter(_._3.getTime < t1)
          .sortBy(r => (r._3.getTime, r._4)).lastOption
        val delta = rs.filter(_._3.getTime >= t1)
          .sortBy(r => (r._3.getTime, r._4)).lastOption
        val win = delta.orElse(base).get
        val tag =
          if (delta.isEmpty) "carryover"
          else if (base.isEmpty) "insert" else "update"
        k -> ((win._5, win._3, tag))
      }
    assert(got.keySet == expect.keySet)
    got.foreach { case (k, v) => assert(v == expect(k), s"key $k") }
    // all three MERGE branches must actually be exercised by the fixture
    assert(got.values.map(_._3).toSet ==
      Set("insert", "update", "carryover"))
  }

  test("streaming rollup upsert equals a driver-side fold for ANY batch " +
      "split, and replaying the last batch is a no-op") {
    import graft.streaming.StreamIngest
    // rows are exact cents so Spark's HALF_UP round and math.round agree
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
      cents <- Gen.chooseNum(-500000L, 5000000L)
    } yield (k, cents / 100.0)
    val caseGen = for {
      n <- Gen.chooseNum(3, 40)
      rows <- Gen.listOfN(n, rowGen)
      nb <- Gen.chooseNum(1, 5)
      cuts <- Gen.listOfN(n, Gen.chooseNum(0, nb - 1))
    } yield (rows, cuts)
    samples(caseGen, 5).zipWithIndex.foreach { case ((rows, cuts), i) =>
      val state = java.nio.file.Files
        .createTempDirectory(s"rollup-prop$i").toString + "/t"
      val batches = rows.zip(cuts).groupBy(_._2).toSeq.sortBy(_._1)
        .map(_._2.map(_._1))
      val up = StreamIngest.rollupUpsertPartitioned(state,
        Seq("k"), "v", nBuckets = 4) _
      batches.zipWithIndex.foreach { case (b, bid) =>
        up(b.toDF("k", "v"), bid.toLong)
      }
      // the foreachBatch recovery contract: only the LAST batch replays
      up(batches.last.toDF("k", "v"), (batches.size - 1).toLong)
      val got = StreamIngest.readRollupState(spark, state)
        .select("k", "n", "sum_cents", "mn", "mx")
        .as[(String, Long, Long, Double, Double)].collect().toSet
      val expect = rows.groupBy(_._1).map { case (k, rs) =>
        val vs = rs.map(_._2)
        (k, vs.size.toLong, vs.map(v => math.round(v * 100)).sum,
          vs.min, vs.max)
      }.toSet
      assert(got == expect,
        s"case $i (${batches.size} batches): merged state != fold")
    }
  }

  test("rollup replay after a PARTIALLY-applied batch heals to the clean state") {
    import graft.streaming.StreamIngest
    // The crash window the per-bucket fence exists for: a batch's dynamic
    // overwrite dies after committing SOME buckets (their rows carry
    // __applied_batch = batchId) while others still hold the prior state.
    // foreachBatch restarts re-run the SAME batchId; committed buckets
    // must skip (or their additive merges double-count) and uncommitted
    // ones must merge. Simulated exactly: apply only the slice of the
    // batch whose keys hash to one bucket, then replay the full batch.
    val nb = 4
    val batch0 = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0),
      ("e", 5.0), ("f", 6.0))
    val batch1 = Seq(("a", 10.0), ("b", -2.5), ("c", 7.25), ("g", 1.75))
    val bucketOf = batch1.map(_._1).distinct.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(nb)).as("b"))
      .as[(String, Int)].collect().toMap
    val someBucket = bucketOf(batch1.head._1)
    val slice = batch1.filter(kv => bucketOf(kv._1) == someBucket)
    assert(slice.nonEmpty && slice.size < batch1.size,
      s"fixture must split across buckets: $bucketOf")
    def freshState(tag: String): String = java.nio.file.Files
      .createTempDirectory(s"rollup-partial-$tag").toString + "/t"
    def up(state: String) =
      StreamIngest.rollupUpsertPartitioned(state, Seq("k"), "v", nb) _
    val clean = freshState("clean")
    up(clean)(batch0.toDF("k", "v"), 0L)
    up(clean)(batch1.toDF("k", "v"), 1L)
    val crashed = freshState("crashed")
    up(crashed)(batch0.toDF("k", "v"), 0L)
    up(crashed)(slice.toDF("k", "v"), 1L)      // partial commit, then crash
    up(crashed)(batch1.toDF("k", "v"), 1L)     // restart replays batch 1
    def read(state: String) = StreamIngest.readRollupState(spark, state)
      .select("k", "n", "sum_cents", "mn", "mx")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(read(crashed) == read(clean),
      "partial-commit + replay must equal the uninterrupted run — a " +
        "mismatch means the fence let a committed bucket double-merge")
  }

  test("scd2 intervals tile each user's history and match the change count") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q_r_scd2")(spark, dir)
      .select("user_id", "event_type", "valid_from", "valid_to", "version",
        "is_current")
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp],
        Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (u, h0) =>
      val h = h0.sortBy(_._5).toList
      assert(h.map(_._5) == (1L to h.length).toList,
        s"user $u: versions not contiguous")
      h.sliding(2).foreach {
        case List(a, b) =>
          assert(a._4.contains(b._3),
            s"user $u: interval v${a._5} does not close at v${b._5}'s start")
          assert(a._2 != b._2,
            s"user $u: consecutive intervals share event_type — not a change")
        case _ => ()
      }
      assert(h.init.forall(!_._6) && h.last._6 && h.last._4.isEmpty,
        s"user $u: exactly the last interval must be current and open")
    }
    // row count per user = driver-side change count over the raw log
    val raw = Tables(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val expectCounts = raw.groupBy(_._1).map { case (u, rs) =>
      val types = rs.sortBy(r => (r._2.getTime, r._3)).map(_._4).toList
      u -> (1 + types.zip(types.tail).count { case (a, b) => a != b })
    }
    assert(rows.groupBy(_._1).view.mapValues(_.length).toMap == expectCounts)
  }
}
