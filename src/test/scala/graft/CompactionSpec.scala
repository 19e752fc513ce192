package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction must change the FILE LAYOUT (fewer, bigger files in exactly
  * the drifted partitions) and nothing else: row-identical reads, healthy
  * partitions' bytes untouched, idempotent second pass.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  /** Simulate N micro-batch appends into a `event_type`-partitioned
    * layout: each append forces `filesPerAppend` files per partition, the
    * drift a per-trigger file sink accumulates.
    */
  private def buildDrifted(root: String, appends: Int,
      filesPerAppend: Int): DataFrame = {
    val ev = Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts", "value", "event_type")
    (0 until appends).foreach { i =>
      ev.where(pmod(col("event_id"), lit(appends)) === i)
        .repartition(filesPerAppend)
        .write.mode(SaveMode.Append)
        .partitionBy("event_type").parquet(root)
    }
    ev
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select(col("event_id"), col("user_id"), col("ts").cast("long"),
        col("value"), col("event_type"))
      .collect().map(_.toString).sorted.toSeq

  test("compaction rewrites drifted partitions to one file, row-identical") {
    val root = Files.createTempDirectory("compact-spec").toString
    val ev = buildDrifted(root, appends = 4, filesPerAppend = 3)
    val before = sortedRows(spark.read.parquet(root))
    assert(before == sortedRows(ev), "append fixture must hold all rows")

    val state0 = sources.Compaction.layoutState(spark, root)
    assert(state0.nonEmpty && state0.forall(_.nFiles > 1),
      s"fixture should have drifted: $state0")

    val report = sources.Compaction.compactPartitionedLayout(spark, root)
    assert(report.partitionsScanned == state0.size)
    assert(report.partitionsCompacted == state0.size)
    assert(report.filesBefore == state0.map(_.nFiles).sum)
    assert(report.filesAfter == state0.size,
      s"each compacted partition should hold exactly one file: $report")
    assert(report.bytesRewritten == state0.map(_.bytes).sum)

    val state1 = sources.Compaction.layoutState(spark, root)
    assert(state1.forall(_.nFiles == 1), s"still drifted: $state1")
    assert(sortedRows(spark.read.parquet(root)) == before,
      "compaction must not change the rows")

    // Idempotence: a healthy layout is a metadata-only no-op.
    val again = sources.Compaction.compactPartitionedLayout(spark, root)
    assert(again.partitionsCompacted == 0 && again.filesBefore == 0)
  }

  test("healthy partitions' bytes are not touched") {
    val root = Files.createTempDirectory("compact-spec-sel").toString
    val ev = Tables(spark, dir, "events")
      .select("event_id", "user_id", "ts", "value", "event_type")
    // 'view' lands once as a single file (healthy); everything else drifts.
    ev.where(col("event_type") === "view").repartition(1)
      .write.mode(SaveMode.Append).partitionBy("event_type").parquet(root)
    (0 until 3).foreach { i =>
      ev.where(col("event_type") =!= "view" &&
          pmod(col("event_id"), lit(3)) === i)
        .repartition(2)
        .write.mode(SaveMode.Append).partitionBy("event_type").parquet(root)
    }
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def viewFiles(): Seq[(String, Long, Long)] =
      fs.listStatus(new Path(root, "event_type=view"))
        .filter(_.isFile).filterNot(_.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
        .sortBy(_._1).toSeq
    val healthyBefore = viewFiles()
    assert(healthyBefore.size == 1)
    val before = sortedRows(spark.read.parquet(root))

    val report = sources.Compaction.compactPartitionedLayout(spark, root)
    val nTypes = sources.Compaction.layoutState(spark, root).size
    assert(report.partitionsScanned == nTypes)
    assert(report.partitionsCompacted == nTypes - 1,
      s"only the drifted partitions rewrite: $report")
    assert(viewFiles() == healthyBefore,
      "the healthy partition's file must be byte- and mtime-identical")
    assert(sortedRows(spark.read.parquet(root)) == before)
  }

  test("maxRecordsPerFile bounds compacted file size for oversized partitions") {
    val root = Files.createTempDirectory("compact-spec-split").toString
    buildDrifted(root, appends = 3, filesPerAppend = 2)
    val rows = spark.read.parquet(root).count()
    val perPartition = spark.read.parquet(root)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val cap = 1000L
    val report = sources.Compaction.compactPartitionedLayout(
      spark, root, maxRecordsPerFile = cap)
    assert(report.partitionsCompacted == perPartition.size)
    val state = sources.Compaction.layoutState(spark, root)
    state.foreach { leaf =>
      val t = leaf.path.split("event_type=").last
      val expect = math.ceil(perPartition(t).toDouble / cap).toInt
      assert(leaf.nFiles == expect,
        s"partition $t: ${leaf.nFiles} files, expected $expect for " +
          s"${perPartition(t)} rows at cap $cap")
    }
    assert(spark.read.parquet(root).count() == rows)
  }

  test("numeric-looking partition values round-trip byte-identically (no dup)") {
    // The canonical streaming layout partitions by zero-padded hour. With
    // partition-type inference left on, the rewrite read turns '01' into
    // Int 1 and dynamic overwrite writes hh=1/ NEXT TO hh=01/ — the old
    // directory survives and every row in it doubles. The compactor must
    // read partition values as strings so directory names round-trip.
    val root = Files.createTempDirectory("compact-spec-pad").toString
    val ev = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        format_string("%02d", hour(col("ts"))).as("hh"))
    (0 until 3).foreach { i =>
      ev.where(pmod(col("event_id"), lit(3)) === i)
        .repartition(2)
        .write.mode(SaveMode.Append).partitionBy("hh").parquet(root)
    }
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leafDirs(): Seq[String] = fs.listStatus(new Path(root))
      .filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted.toSeq
    val dirsBefore = leafDirs()
    assert(dirsBefore.exists(d => d.matches("hh=0\\d")),
      s"fixture needs zero-padded partition values: $dirsBefore")
    val rowsBefore = spark.read.parquet(root).count()

    val report = sources.Compaction.compactPartitionedLayout(spark, root)
    assert(report.partitionsCompacted == dirsBefore.size)
    assert(leafDirs() == dirsBefore,
      "partition directory names must round-trip byte-identically — a " +
        s"renamed directory means the old one survived with its rows: " +
        s"${leafDirs()}")
    assert(spark.read.parquet(root).count() == rowsBefore,
      "row count must not change (duplication = the old dirs survived)")
    assert(sources.Compaction.layoutState(spark, root).forall(_.nFiles == 1))
  }

  test("refuses a directory carrying a streaming-sink transaction log") {
    val root = Files.createTempDirectory("compact-spec-log").toString
    buildDrifted(root, appends = 2, filesPerAppend = 2)
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(root, "_spark_metadata"))
    val e = intercept[IllegalArgumentException] {
      sources.Compaction.compactPartitionedLayout(spark, root)
    }
    assert(e.getMessage.contains("_spark_metadata"))
  }
}
