package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the retrieval / export operators added in round 6:
  * hybrid RRF fusion, MMR diversification, the shard manifest, and the
  * unrolled BPE training rounds. The DuckDB oracle proves value parity;
  * these tests pin the SEMANTIC contracts (fusion formula, greedy
  * invariants, checksum reproducibility, merge-fold edge cases) that a
  * hash compare alone would not localize on failure.
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("hybrid RRF: fused score is exactly the 1/(60+r) formula and order is stable") {
    val rows = SparkEntry.queries("q_e_hybrid_rrf")(spark, dir)
      .select("doc_id", "r_dense", "r_bm25", "rrf")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        r.getDouble(3)))
    assert(rows.length == 20)
    rows.foreach { case (id, rd, rb, rrf) =>
      assert(rd.nonEmpty || rb.nonEmpty, s"doc $id in neither leg")
      rd.foreach(r => assert(r >= 1 && r <= 50))
      rb.foreach(r => assert(r >= 1 && r <= 50))
      val expect = BigDecimal(
        rd.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
          + rb.map(r => 1.0 / (60.0 + r)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect) < 1e-12, s"doc $id rrf $rrf != $expect")
    }
    // a doc ranked in BOTH legs must outscore one ranked in a single leg
    // at similar depth — spot the fusion actually fusing
    val ordered = rows.map(_._4)
    assert(ordered.zip(ordered.tail).forall { case (x, y) => x >= y },
      "output must be rrf-descending")
  }

  test("MMR: 5 distinct picks from the shortlist; pick 1 is the dense top-1; greedy round 2 verified") {
    val out = SparkEntry.queries("q_e_mmr_topk")(spark, dir)
      .select("doc_id", "rel", "mmr", "pick_order").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))
    assert(out.map(_._4).toSeq == Seq(1, 2, 3, 4, 5))
    assert(out.map(_._1).distinct.length == 5, "picks must be distinct")

    // recompute the shortlist + pairwise sims on the driver (500 rows)
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q = emb.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val short = emb.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q), v) }
      .sortBy { case (id, rel, _) => (-rel, id) }.take(20)
    assert(out.head._1 == short.head._1, "pick 1 must be the dense top-1")
    // greedy round 2: argmax 0.7*rel - 0.3*sim(candidate, pick1)
    val p1 = short.head
    val expected2 = short.tail.map { case (id, rel, v) =>
      val mmr = BigDecimal(0.7 * rel - 0.3 * cos(v, p1._3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, mmr)
    }.sortBy { case (id, mmr) => (-mmr, id) }.head
    assert(out(1)._1 == expected2._1 && math.abs(out(1)._3 - expected2._2) < 1e-9,
      s"round-2 pick ${out(1)} != recomputed $expected2")
  }

  test("shard manifest: exhaustive, disjoint, checksum reproducible from first principles") {
    val m = SparkEntry.queries("q_s_shard_manifest")(spark, dir)
      .select("shard", "n_docs", "id_checksum", "balance").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(m.map(_._1).toSeq == (0L until 8L), "all 8 shards present")
    val total = m.map(_._2).sum
    val ids = Tables(spark, dir, "documents")
      .select("doc_id").as[Long].collect()
    assert(total == ids.length, "shards must cover every doc exactly once")
    // recompute the per-shard id checksum with driver-side Lehmer rounds
    val P = graft.functions.KeyHash.P
    def kh(k: Long): Long = {
      val r1 = (k % P) * 48271L % P
      val r2 = r1 * 48271L % P
      r2 * 48271L % P
    }
    val expect = ids.groupBy(id => kh(id) % 8)
      .view.mapValues(_.map(id => BigInt(kh(id))).sum % P).toMap
    m.foreach { case (shard, _, cksum, bal) =>
      assert(BigInt(cksum) == expect(shard), s"shard $shard checksum")
      assert(bal > 0.0 && bal < 8.0)
    }
  }

  test("shard diff: every 'changed' verdict traceable to a count or checksum delta") {
    val rows = SparkEntry.queries("q_s_shard_diff")(spark, dir)
      .select("shard", "n_prev", "n_cur", "cksum_prev", "cksum_cur",
        "changed", "n_export").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == (0L until 8L))
    rows.foreach { case (sh, np, nc, cp, cc, ch, ne) =>
      assert(ch == (np != nc || cp != cc), s"shard $sh flag inconsistent")
      assert(ne == (if (ch) nc else 0L), s"shard $sh export count")
    }
    // the simulated snapshot drops 20% of docs and patches every 17th:
    // at least one shard must differ, and with 500 docs across 8 shards
    // realistically all do — but the invariant we pin is ≥ 1
    assert(rows.exists(_._6), "the simulated snapshot must produce a diff")
  }

  test("group split: every near-dup pair lands in ONE split (the leakage " +
      "guarantee, verified pair by pair, not just the aggregate audit)") {
    import graft.dedup.NearDup
    val d = Tables(spark, dir, "documents")
    val pairs = NearDup.exactJaccardPairs(d, "doc_id", "text", 3, 0.5,
      maxDocsPerShingle = Some(64))
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assume(pairs.nonEmpty, "fixture corpus must contain near-dups")
    // recompute each doc's split exactly as the query assigns it
    val groups = NearDup.connectedComponents(
      NearDup.exactJaccardPairs(d, "doc_id", "text", 3, 0.5,
        maxDocsPerShingle = Some(64)), "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val P = graft.functions.KeyHash.P
    def kh(k: Long): Long = ((k % P) * 48271 % P) * 48271 % P * 48271 % P
    def split(doc: Long): String = {
      val key = groups.getOrElse(doc, doc)
      val h = kh(key)
      if (h < 1932735282L) "train" else if (h < 2040109464L) "val" else "test"
    }
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b),
        s"near-dup pair ($a, $b) straddles splits ${split(a)}/${split(b)}")
    }
    CacheScope.release(spark)
  }

  test("BPE merge fold: greedy leftmost-first on overlapping pairs") {
    // 'aaab' with winning pair (a,a) must become [aa, a, b] — leftmost
    // occurrence merges, the overlap does not cascade within the round
    val r = spark.sql(
      """SELECT aggregate(array('a','a','a','b'), cast(array() as array<string>),
        |  (acc, sy) -> CASE WHEN size(acc) > 0 AND element_at(acc, -1) = 'a' AND sy = 'a'
        |    THEN concat(slice(acc, 1, size(acc) - 1), array('aa'))
        |    ELSE concat(acc, array(sy)) END) AS m""".stripMargin)
      .as[Seq[String]].head()
    assert(r == Seq("aa", "a", "b"), s"fold gave $r")
  }

  test("BPE train/apply degenerate corpora: schema-stable empty and " +
    "one-merge shapes (the r12 literal-inline fallback branches)") {
    // The oracle can never reach these branches — the testdata always has
    // minable pairs. A corpus with no [a-z]+ token mines nothing in round
    // 1: train must return the 0-row merge table and apply the 0-row
    // report, both schema-stable (the pre-r12 empty-broadcast-crossJoin
    // contract). A corpus whose only word is "ab" mines (a,b) in round 1
    // and nothing in round 2: train returns exactly the round-1 row;
    // apply keeps the empty-report contract (its fit needs both rounds).
    def writeDocs(tag: String, texts: Seq[String]): String = {
      val dir = s"/tmp/graft_bpe_edge_$tag"
      texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "src0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      dir
    }
    val empty = writeDocs("empty", Seq("123 456", "789 42"))
    val tr0 = SparkEntry.queries("q_t_bpe_train")(spark, empty)
    assert(tr0.columns.toSeq == Seq("round", "a", "b", "merged", "freq"))
    assert(tr0.count() == 0, "no minable pair -> empty merge table")
    val ap0 = SparkEntry.queries("q_t_bpe_apply")(spark, empty)
    assert(ap0.columns.toSeq ==
      Seq("source", "n_words", "n_chars", "n_symbols", "compression"))
    assert(ap0.count() == 0, "no learned pairs -> empty report")
    CacheScope.release(spark)

    val one = writeDocs("one", Seq("ab ab", "ab"))
    val tr1 = SparkEntry.queries("q_t_bpe_train")(spark, one)
      .select("round", "a", "b", "merged", "freq").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(tr1.toSeq == Seq((1, "a", "b", "ab", 3L)),
      s"single-merge corpus must yield exactly the round-1 row: ${tr1.toSeq}")
    val ap1 = SparkEntry.queries("q_t_bpe_apply")(spark, one)
    assert(ap1.count() == 0,
      "round-2 winner absent -> the fit/apply report stays empty " +
        "(the pre-r12 empty-broadcast contract)")
    CacheScope.release(spark)
  }

  test("BPE train: two rounds, distinct merges, non-increasing winner frequency") {
    val rows = SparkEntry.queries("q_t_bpe_train")(spark, dir)
      .select("round", "merged", "freq").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(1, 2))
    assert(rows(0)._2 != rows(1)._2, "rounds must learn different merges")
    assert(rows(0)._3 >= rows(1)._3,
      "round-1 winner was the global max; round 2 cannot exceed it")
  }
}
