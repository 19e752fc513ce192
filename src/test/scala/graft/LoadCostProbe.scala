package graft

/** Dev scratch: driver-side cost of Tables() frame CREATION (footer/schema
  * reads, file listing) vs reuse — decides whether a plan memo is worth it.
  * Run: sbt "Test/runMain graft.LoadCostProbe"
  */
object LoadCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm everything once
    Tables.all.foreach(t => Tables(spark, dir, t))
    for (t <- Seq("lineitem", "events", "documents", "embeddings", "orders")) {
      val t0 = System.nanoTime()
      var i = 0
      while (i < 50) { Tables(spark, dir, t); i += 1 }
      val perCall = (System.nanoTime() - t0) / 50e6
      println(f"$t%-12s create: $perCall%8.2f ms/call")
    }
    // and the cost of .count() on a pre-built frame vs fresh frame
    val pre = Tables(spark, dir, "lineitem")
    var t0 = System.nanoTime(); pre.count()
    println(f"count prebuilt: ${(System.nanoTime() - t0) / 1e6}%8.2f ms")
    t0 = System.nanoTime(); Tables(spark, dir, "lineitem").count()
    println(f"count fresh:    ${(System.nanoTime() - t0) / 1e6}%8.2f ms")
    spark.stop()
  }
}
