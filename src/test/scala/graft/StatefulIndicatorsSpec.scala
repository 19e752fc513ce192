package graft

import graft.streaming.StatefulIndicators
import graft.ts.Indicators
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming indicator path must equal the batch path bit-for-bit on
  * the same rows — both fold the same pure step function; only the
  * carrier differs (GroupState across micro-batches vs one sorted pass).
  */
class StatefulIndicatorsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  import spark.implicits._

  private def tick(k: String, i: Int): Indicators.In = {
    val base = 100.0 + 10 * math.sin(i * 0.3)
    Indicators.In(k, new java.sql.Timestamp(1700000000000L + i * 60000L),
      i.toLong, base + 0.7, base - 0.7, base + math.cos(i) * 0.3, 5.0 + i % 3)
  }

  test("stream over 3 micro-batches == batch pass over the union") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Indicators.In]
    val outDir = java.nio.file.Files.createTempDirectory("si-out").toString
    val q = StatefulIndicators.attach(ms.toDS())
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("si-ckpt").toString)
      .outputMode("append")
      .start()
    val all = (0 until 90).map(i => tick(if (i % 2 == 0) "BTC" else "ETH", i))
    // deliver in 3 batches, shuffled within each (iterator order is
    // unordered inside a micro-batch; the fold sorts)
    val rnd = new scala.util.Random(42)
    all.grouped(30).foreach { batch =>
      ms.addData(rnd.shuffle(batch): _*)
      q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.read.parquet(outDir)
      .as[Indicators.IndicatorRow].collect()
      .map(r => (r.key, r.id) -> r).toMap
    val batch = Indicators.compute(all.toDF(), "key", "ts", "id",
      "high", "low", "close", "volume")
      .as[Indicators.IndicatorRow].collect()
      .map(r => (r.key, r.id) -> r).toMap

    assert(streamed.keySet == batch.keySet && streamed.size == 90)
    streamed.foreach { case (k, s) =>
      val b = batch(k)
      assert(s == b, s"row $k differs:\n stream=$s\n batch =$b")
    }
  }

  test("state carries across batches: warmup completes only after enough rows") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[Indicators.In]
    val outDir = java.nio.file.Files.createTempDirectory("si2-out").toString
    val q = StatefulIndicators.attach(ms.toDS())
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("si2-ckpt").toString)
      .outputMode("append")
      .start()
    // 10 rows: not enough for RSI(14)
    ms.addData((0 until 10).map(i => tick("BTC", i)): _*)
    q.processAllAvailable()
    val early = spark.read.parquet(outDir).as[Indicators.IndicatorRow].collect()
    assert(early.forall(_.rsi.isEmpty))
    // 10 more rows: rows 15.. have 14+ diffs -> RSI defined
    ms.addData((10 until 20).map(i => tick("BTC", i)): _*)
    q.processAllAvailable()
    q.stop()
    val later = spark.read.parquet(outDir).as[Indicators.IndicatorRow].collect()
    assert(later.filter(_.id >= 15).forall(_.rsi.isDefined))
    assert(later.filter(_.id < 14).forall(_.rsi.isEmpty))
  }
}
