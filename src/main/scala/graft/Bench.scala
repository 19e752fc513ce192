package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, xxhash64, expr}

/** Per-round benchmark: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced to FULL materialization by
  * xxhash64-ing every output column and bit_xor-reducing the hashes —
  * `count()` alone would let Catalyst prune unused projections, timing a
  * bare scan instead of the operator (round-1 lesson).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JIT + codegen + parquet footer reads
    // would otherwise all land on whichever query runs first (alphabetical).
    Tables.all.foreach { t =>
      try Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    try {
      import org.apache.spark.sql.expressions.Window
      val w = spark.range(20000).selectExpr("id % 37 AS k", "id AS v")
      val dim = spark.range(37).selectExpr("id AS k", "id * 2 AS d")
      w.groupBy("k").agg(expr("sum(v) s"), expr("min_by(v, v) m"))
        .join(org.apache.spark.sql.functions.broadcast(dim), "k")
        .select(col("k"), col("s"),
          org.apache.spark.sql.functions.row_number().over(
            Window.partitionBy("k").orderBy("s")).as("rn"))
        .collect()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        // bit_xor: order-insensitive reduce, no ANSI sum-overflow risk
        df.select(xxhash64(df.columns.map(col): _*).as("__h"))
          .agg(expr("bit_xor(__h)")).collect()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
