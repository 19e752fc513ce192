package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-generated testdata tables (see TESTDATA.md).
  * Every query receives the scale-factor directory at call time, so the same
  * code runs sf0.001 smoke, sf0.01 oracle, and sf0.1 bench unchanged — and,
  * on a real cluster, an arbitrarily large partitioned dataset (the reads are
  * plain parquet scans; Catalyst handles column pruning/predicate pushdown).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses natively.
      // Read nanos as long and floor-truncate to micros — the same value
      // DuckDB produces when it reads the file (ns → us truncation), so
      // oracle SQL can reference `ts` unmodified.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/events.parquet")
        .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` text mirrors the
    * DuckDB oracle text for SQL-surface parity (SURVEY §3.3).
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
