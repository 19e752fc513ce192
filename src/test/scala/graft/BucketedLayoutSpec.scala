package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape + parity proof for the persisted bucketed+sorted events
  * layout (SURVEY §4 "sort elimination" row): the layout must change the
  * COST (bucket pruning, no Exchange, no Sort) and not the ANSWERS
  * (row-identical to the plain-parquet path).
  */
class BucketedLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan.toString
  }

  test("user_id filter prunes the scan to one bucket") {
    val t = sources.BucketedLayout.ensureEventsByUser(spark, dir)
    val plan = executedPlan(
      spark.table(t).where(col("user_id") === 11L)
        .select("event_id", "ts", "event_type", "value"))
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"expected single-bucket pruning:\n$plan")
  }

  test("per-user window + aggregate plan has no Exchange and no Sort") {
    val plan = executedPlan(sources.BucketedLayout.userActivity(spark, dir))
    assert(!plan.contains("Exchange"),
      s"bucketed layout should satisfy the user_id partitioning:\n$plan")
    assert(!plan.contains("Sort "),
      s"one sorted file per bucket should satisfy the window order:\n$plan")
  }

  test("SQL-text window+agg over the layout is also Exchange- and Sort-free " +
      "below the presentation orderBy") {
    // The S8 claim: the layout optimizes the TEXT path identically — no
    // DataFrame-API lock-in. The final ORDER BY user_id adds its own
    // range exchange+sort (presentation, same as the twin's orderBy), so
    // assert nothing BELOW the window/aggregate shuffles or sorts by
    // counting: exactly 1 Exchange (range) and 1 Sort (its global sort).
    val full = executedPlan(
      SparkEntry.queries("q_sql_bucketed_activity")(spark, dir))
    // the AQE dump repeats the plan under "== Initial Plan ==" — assert
    // on the final section only
    val plan = full.split("== Initial Plan ==").head
    assert(plan.linesIterator.count(_.contains("Exchange")) == 1 &&
      plan.contains("rangepartitioning"),
      s"only the presentation range exchange is allowed:\n$full")
    assert(plan.linesIterator.count(_.contains("Sort ")) == 1,
      s"only the presentation sort is allowed:\n$full")
  }

  test("co-bucketed fact-dim join plans no Exchange and no Sort below the agg") {
    // The grouped rollup adds its own tier-keyed exchange; the join itself
    // must be shuffle- and sort-free, so assert on the pre-agg join frame.
    val ev = spark.table(sources.BucketedLayout.ensureEventsByUser(spark, dir))
    val tiers = spark.table(sources.BucketedLayout.ensureUserTiers(spark, dir))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = ev.where(col("event_type") === "purchase")
        .join(tiers, "user_id")
      val plan = executedPlan(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed join must not shuffle either side:\n$plan")
      assert(!plan.contains("Sort "),
        s"one sorted file per bucket should feed the SMJ directly:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("latest-N on the layout matches the plain-parquet path row-for-row") {
    val bucketed = sources.BucketedLayout.latestN(spark, dir, 11L, 40).collect()
    val plain = Tables(spark, dir, "events")
      .where(col("user_id") === 11L)
      .select("event_id", "ts", "event_type", "value")
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(40).collect()
    assert(bucketed.nonEmpty, "fixture user 11 should have events")
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("user activity on the layout matches a plain-parquet recompute") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val plain = Tables(spark, dir, "events")
      .withColumn("gap_s",
        col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
        sum((col("gap_s") > 3600).cast("long")).as("n_session_breaks"),
        (round(avg(col("gap_s")), 2) + lit(0.0)).as("avg_gap_s"))
      .orderBy("user_id").collect()
    val bucketed = sources.BucketedLayout.userActivity(spark, dir)
      .orderBy("user_id").collect()
    assert(bucketed.toSeq == plain.toSeq)
  }

  test("corpus rewrite mints a fresh stamped table and sweeps superseded " +
      "and cross-JVM orphan layouts (ADVICE r13 medium + r14 review)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bl_stamp")
    val src = java.nio.file.Paths.get(dir, "events.parquet")
    val dst = tmp.resolve("events.parquet")
    java.nio.file.Files.copy(src, dst)
    try {
      val t1 = sources.BucketedLayout.ensureEventsByUser(spark, tmp.toString)
      assert(spark.catalog.tableExists(t1))
      val n1 = spark.table(t1).count()

      // Plant a fake orphan "left by a previous JVM": a warehouse dir
      // matching this corpus' (prefix, sanitized-dir) base with a stamp
      // no live memo owns — exactly what an earlier JVM's build leaves
      // behind after an in-place rewrite + restart.
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val base = t1.reverse.dropWhile(_ != '_').reverse // name minus stamp
      val orphan = new org.apache.hadoop.fs.Path(wh, base + "deadbeef")
      fs.mkdirs(orphan)

      // In-place corpus rewrite: same path, new mtime → new stamp.
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          java.nio.file.Files.getLastModifiedTime(dst).toMillis + 73000))
      val t2 = sources.BucketedLayout.ensureEventsByUser(spark, tmp.toString)
      assert(t2 != t1,
        "a rewritten corpus must mint a NEW stamped table name")
      assert(spark.table(t2).count() == n1)
      // the superseded same-JVM layout is dropped (catalog + warehouse)…
      assert(!spark.catalog.tableExists(t1))
      assert(!fs.exists(new org.apache.hadoop.fs.Path(wh, t1)),
        "superseded layout's warehouse dir must be dropped")
      // …and the cross-JVM orphan is swept by the same build
      assert(!fs.exists(orphan),
        "orphan layout dir from a previous JVM must be swept on build")
      // the sf0.001 layout other tests use is untouched (different base)
      val tMain = sources.BucketedLayout.ensureEventsByUser(spark, dir)
      assert(spark.catalog.tableExists(tMain))
      spark.sql(s"DROP TABLE IF EXISTS $t2")
    } finally {
      java.nio.file.Files.deleteIfExists(dst)
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }
}
