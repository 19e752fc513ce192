package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the other half of the SURVEY §4
  * shuffle-reduction story next to bucketing: when a selective dimension
  * filter feeds a shuffle join, Catalyst can inject a bloom filter built
  * from the dim side into the FACT SCAN, so most fact rows die before the
  * shuffle instead of after it. At 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the ~matching slice.
  *
  * The thresholds gating injection are sized for real clusters
  * (application side > 10 GB by default), so the test lowers them to
  * demonstrate/pin the mechanism at fixture scale — production inherits
  * the defaults.
  */
class BloomFilterSpec extends AnyFunSuite {

  test("selective dim filter injects a bloom filter into the fact scan") {
    // isolated session (shared context): runtime-filter planning reads
    // session-local SQL confs, so this can't leak into other specs
    val spark = SparkSpec.session.newSession()
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    (1 to 100000).map(i => (i.toLong % 997, i.toLong))
      .toDF("k", "id").write.parquet(s"$dir/fact")
    (0L to 996L).map(k => (k, if (k % 100 == 0) "hot" else "cold"))
      .toDF("k", "tag").write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").where($"tag" === "hot")
    val joined = fact.join(dim, "k")
    // 10 hot keys of 997 -> ~1% of the fact survives the scan-side filter
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a runtime bloom filter (might_contain) on the fact scan:\n$plan")
  }
}
