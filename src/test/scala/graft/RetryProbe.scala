package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retry/speculation invariance gate (VERDICT r12 next-round #2): the
  * hash-oracle discipline asserts run-to-run determinism, but until r13
  * nothing ever EXECUTED the surface under task re-execution — the 100 TB
  * reality where stragglers, preemption, and fetch failures make retries
  * and speculative duplicates constant background noise.
  *
  * Two passes in one JVM, each with its own SparkContext:
  *
  *  1. CLEAN — plain `local[N]` (task failures fatal, no speculation):
  *     fingerprint every SparkEntry query plus the streaming rollup fold.
  *  2. CHAOS — `local[N,4]` (4 task attempts) + [[ChaosPlugin]] failing a
  *     deterministic third of all first task attempts + aggressive
  *     speculation (quantile .2, multiplier 1, min runtime 0 — duplicate
  *     attempts race on most stages): same fingerprints.
  *
  * Every fingerprint must be bit-identical across passes; the probe also
  * fails if chaos injected nothing (a silently inert plugin would make
  * the gate vacuous). Divergence here means order-dependent aggregation,
  * nondeterministic tie-breaks, or side effects leaking across attempts —
  * exactly the bug class that corrupts a long cluster run silently.
  *
  * Run: sbt "Test/runMain graft.RetryProbe" (env: SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, GRAFT_CHAOS_FRACTION).
  */
object RetryProbe {
  private def fpAll(spark: SparkSession, dir: String)
      : Seq[(String, (BigDecimal, Long))] = {
    val names = SparkEntry.queries.keys.toSeq.sorted
    names.map { n =>
      val fp = try ResultFingerprint(SparkEntry.queries(n)(spark, dir))
      finally CacheScope.release(spark)
      n -> fp
    } :+ ("streaming_rollup_fold" -> streamingRollupFp(spark, dir)) :+
      ("streaming_stateful_dedup" -> statefulDedupFp(spark, rocks = false)) :+
      ("streaming_stateful_dedup_rocksdb" ->
        statefulDedupFp(spark, rocks = true))
  }

  /** flatMapGroupsWithState dedup through the state store (HDFS-backed
    * and RocksDB variants) — under chaos, injected failures land inside
    * stateful micro-batch tasks, exercising the store's retry path (a
    * retried task must re-read the prior version, never double-apply its
    * own writes; RocksDB is the 100 TB larger-than-memory posture).
    */
  private def statefulDedupFp(spark: SparkSession,
      rocks: Boolean): (BigDecimal, Long) = {
    // newSession scopes the provider conf (the StreamingSpec discipline)
    val s = spark.newSession()
    if (rocks) s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(sec: Long) = new java.sql.Timestamp(1704067200000L + sec * 1000)
    val ms = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val outName = "retry_probe_dedup_" + (if (rocks) "rocks_" else "") +
      math.abs(s.sparkContext.applicationId.hashCode)
    val q = graft.streaming.StatefulDedup.attach(
      ms.toDF().toDF("key", "doc_id", "ts")
        .as[graft.streaming.StatefulDedup.DocIn],
      watermarkDelay = "10 seconds", ttlMs = 3600 * 1000L)
      .writeStream.format("memory").queryName(outName)
      .outputMode("append").start()
    // deterministic 3-batch load: 64 keys, dups within and across batches
    (0 until 3).foreach { b =>
      ms.addData((0 until 200).map { i =>
        val key = (i * 7 + b) % 64L
        (key, (b * 1000 + i).toLong, ts(b * 300 + i))
      }: _*)
      q.processAllAvailable()
    }
    q.stop()
    val fp = ResultFingerprint(s.table(outName))
    s.catalog.dropTempView(outName)
    fp
  }

  /** Concurrency × chaos: two sessions run overlapping slices while the
    * plugin keeps failing first attempts — the intersection the separate
    * ConcurrencySpec (no retries) and chaos pass (one session) leave
    * open. Returns mismatch descriptions (empty = invariant).
    */
  private def concurrentChaosCheck(chaos: SparkSession, dir: String,
      base: Map[String, (BigDecimal, Long)]): Seq[String] = {
    val slice = Seq("q_d_dedup_groups", "q_e_semdedup_groups",
      "q_sql_tpch_q1", "q_a_vwap", "q_r_bucketed_latest_n", "q_t_bpe_apply")
    val bad = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val threads = (0 until 2).map { i =>
      new Thread(() => {
        try {
          val s = chaos.newSession()
          val order = slice.drop(i * 3) ++ slice.take(i * 3)
          order.foreach { n =>
            val got = ResultFingerprint(SparkEntry.queries(n)(s, dir))
            if (got != base(n))
              bad.add(s"[t$i] $n got=$got want=${base(n)}")
          }
          CacheScope.release(s)
        } catch { case t: Throwable => bad.add(s"[t$i] threw: $t") }
      }, s"retry-soak-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(10 * 60 * 1000L))
    // a hung thread must fail the soak, not vacuously pass (review r13)
    threads.filter(_.isAlive).foreach(t => bad.add(s"${t.getName} HUNG"))
    import scala.jdk.CollectionConverters._
    bad.asScala.toSeq
  }

  /** The streaming rollup driven exactly as foreachBatch would: three
    * batches carved deterministically from `events`, merged into the
    * bucket-partitioned state (staged swaps, replay fence), state read
    * back and fingerprinted. Under chaos, injected failures land INSIDE
    * the merge/swap machinery — the crash-safety contract under test.
    */
  private def streamingRollupFp(spark: SparkSession, dir: String)
      : (BigDecimal, Long) = {
    val tmp = java.nio.file.Files.createTempDirectory("retry-rollup").toString
    val state = s"$tmp/t"
    val up = graft.streaming.StreamIngest.rollupUpsertPartitioned(
      state, Seq("k"), "v", nBuckets = 8) _
    val ev = Tables(spark, dir, "events")
      .select(col("event_type").as("k"), col("value").as("v"),
        pmod(col("event_id"), lit(3)).as("b"))
    (0 until 3).foreach { b =>
      up(ev.where(col("b") === b).select("k", "v"), b.toLong)
    }
    val fp = ResultFingerprint(
      graft.streaming.StreamIngest.readRollupState(spark, state))
    // replay fence under chaos too: re-delivering the last batch (the
    // foreachBatch recovery contract) must leave the state untouched
    up(ev.where(col("b") === 2).select("k", "v"), 2L)
    val fp2 = ResultFingerprint(
      graft.streaming.StreamIngest.readRollupState(spark, state))
    require(fp == fp2, s"replay fence violated: $fp -> $fp2")
    fp
  }

  private def session(master: String, cpus: String,
      chaos: Boolean): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val b2 =
      if (!chaos) b
      else b
        .config("spark.plugins", "graft.ChaosPlugin")
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "10ms")
        .config("spark.speculation.quantile", "0.2")
        .config("spark.speculation.multiplier", "1.0")
        .config("spark.speculation.minTaskRuntime", "0ms")
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    ChaosPlugin.fraction =
      sys.env.get("GRAFT_CHAOS_FRACTION").map(_.toDouble).getOrElse(1.0 / 3)

    println(s"== pass 1: clean (local[$cpus]) ==")
    val clean = session(s"local[$cpus]", cpus, chaos = false)
    val base = fpAll(clean, dir)
    clean.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    println(s"== pass 2: chaos (local[$cpus,4], fail-frac " +
      s"${ChaosPlugin.fraction}, aggressive speculation) ==")
    val chaos = session(s"local[$cpus,4]", cpus, chaos = true)
    // canary: prove the injection path is live (onTaskStart throw ->
    // retryable task failure) before trusting the invariance result
    val canary = chaos.range(0, 1000).repartition(8).count()
    require(canary == 1000L, s"canary count wrong: $canary")
    require(ChaosPlugin.injected.get() > 0,
      "chaos plugin injected nothing — the gate would be vacuous")
    println(s"canary ok, ${ChaosPlugin.injected.get()} injections so far")

    val got = fpAll(chaos, dir)
    val baseMap = base.toMap
    // intersection axis: two concurrent sessions under the same chaos
    val soakBad = concurrentChaosCheck(chaos, dir, baseMap)
    val injected = ChaosPlugin.injected.get()
    chaos.stop()

    var bad = 0
    got.foreach { case (n, fp) =>
      if (fp != baseMap(n)) {
        bad += 1
        println(s"DIVERGED $n clean=${baseMap(n)} chaos=$fp")
      }
    }
    soakBad.foreach(m => println(s"SOAK-DIVERGED $m"))
    println(s"\n=== ${got.size} fingerprints, $bad diverged, " +
      s"${soakBad.size} concurrent-soak mismatches, " +
      s"$injected injected task failures, " +
      s"speculation aggressive ===")
    if (bad > 0 || soakBad.nonEmpty || injected == 0) sys.exit(1)
  }
}
