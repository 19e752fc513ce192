package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only perf probe (Test scope, not shipped): time plan fragments at
  * sf0.1 to attribute bench hot spots. Run:
  * SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Probe"
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (n=$n)")
    }
    val docs = Tables(spark, dir, "documents")
    val ev = Tables(spark, dir, "events")
    docs.count(); ev.count() // warm

    time("jaccard plain") {
      graft.dedup.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("jaccard prefix") {
      graft.dedup.NearDup.exactJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("jaccard plain again") {
      graft.dedup.NearDup.exactJaccardPairs(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("jaccard prefix again") {
      graft.dedup.NearDup.exactJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5).count()
    }
    time("langid confusion") {
      SparkEntry.queries("q_t_langid_confusion")(spark, dir).count()
    }
    time("stopword regexes only") {
      val scores = graft.text.TextAnalysis.StopwordSets.map { case (l, ws) =>
        graft.text.TextAnalysis.stopwordCount("text", ws).as(l) }
      docs.select(scores: _*).agg(sum(col("en"))).collect(); 1L
    }
    time("cjk count only") {
      docs.select(graft.text.TextAnalysis.cjkCount(col("text")).as("c"))
        .agg(sum("c")).collect(); 1L
    }
    time("langid select only") {
      docs.select(graft.text.TextAnalysis.langId("text").as("l"))
        .groupBy("l").count().collect(); 1L
    }
    time("minhash signatures only") {
      docs.select(graft.functions.TextHashes.min_hash_signature(col("text"), 3, 16)
        .as("s")).select(expr("aggregate(s, 0L, (a,x) -> a + x)").as("t"))
        .agg(sum("t")).collect(); 1L
    }
    time("minhash lsh pairs full") {
      SparkEntry.queries("q_d_minhash_lsh_pairs")(spark, dir).count()
    }
    time("minhash cand pairs only") {
      import graft.functions.TextHashes.min_hash_signature
      val sig = docs.select(col("doc_id"),
        min_hash_signature(col("text"), 3, 16).as("__sig"))
      val banded = sig.select(col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("band"), col("__sig"))
        .withColumn("band_val", expr(
          "aggregate(slice(__sig, band * 4 + 1, 4), 0L, (a, x) -> (a * 8191 + x) % 2147483647)"))
        .drop("__sig")
      banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") &&
            col("a.band_val") === col("b.band_val") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    }
    time("from_json props") {
      ev.select(from_json(col("props"),
        org.apache.spark.sql.types.StructType.fromDDL("k INT"))
        .getField("k").as("k"))
        .agg(sum("k")).collect(); 1L
    }
    time("get_json_object props") {
      ev.select(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .agg(sum("k")).collect(); 1L
    }
    time("resample hourly") {
      graft.ts.TimeSeriesOps.resampleOhlcv(ev, "event_type", "ts", "event_id",
        "value", "value", 3600).count()
    }
    time("feature frame full") {
      val hourly = graft.ts.TimeSeriesOps.resampleOhlcv(ev, "event_type", "ts",
        "event_id", "value", "value", 3600)
        .withColumn("bucket_id", unix_timestamp(col("bucket_start")))
      graft.ts.FeatureFrame.enhance(hourly, "event_type", "bucket_start",
        "bucket_id").count()
    }
    time("embed neardup 8x4") {
      SparkEntry.queries("q_e_embed_neardup_pairs")(spark, dir).count()
    }
    spark.stop()
  }
}
