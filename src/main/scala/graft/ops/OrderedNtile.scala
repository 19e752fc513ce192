package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Distributed NTILE over grouped, ordered data — without one-task-per-key.
  *
  * `ntile(b) OVER (PARTITION BY key ORDER BY …)` sorts every key's rows in
  * ONE task; with a low-cardinality key (5 event types at the 100× probe:
  * 22.3× ratio, 19.9 s) the whole input serializes onto #keys cores.
  * NTILE needs only (per-key rank, per-key count) — both computable on
  * range-partitioned tiles, the [[PrefixSum]] shape:
  *
  *  1. `repartitionByRange` on (keyCols ++ orderCols) — tiles tile the
  *     global (key, order) sequence; `sortWithinPartitions` orders each.
  *  2. per-(tile, key) row counts — O(nParts + #keys) rows (a key spans
  *     contiguous tiles under the range partitioner), a bounded documented
  *     driver read like PrefixSum's tile totals — fold into per-(tile,
  *     key) rank offsets and per-key totals, broadcast back.
  *  3. one streaming `mapPartitions` pass: rank = offset + running
  *     within-tile count, bucket from the standard SQL NTILE arithmetic
  *     (n = q·b + rem: first `rem` buckets take q+1 rows) — integer-exact,
  *     so the assignment is bit-identical to the window's on any engine.
  *
  * Callers must make (keyCols ++ orderCols) a strict total order (tie-break
  * on a unique id) — same contract as the window form needs for an
  * engine-stable assignment anyway.
  */
object OrderedNtile {

  /** `maxKeys` caps the driver-side (tile, key) count read: the fold in
    * step 2 holds O(#keys + nParts) rows in driver memory, which is fine
    * for the grouping keys this op exists for (single-digit event-type
    * domains) but unbounded for an arbitrary key. The TRANSFER itself is
    * bounded, not just checked after the fact: a counts-only pre-job
    * (O(nParts) longs to the driver — one run-count per tile, read off
    * the same pinned cached RDD the entry job uses) fails fast when the
    * global run total exceeds the cap, BEFORE any (tile, key) entry is
    * collected; a per-task require backstops the entry job itself.
    * Callers with genuinely high-cardinality keys don't need this op at
    * all: enough distinct keys means the plain window's one-task-per-key
    * shape is already parallel.
    */
  def withNtile(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      buckets: Int, binCol: String, nPartsOpt: Option[Int] = None,
      maxKeys: Int = 1 << 16): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(maxKeys >= 1, "maxKeys must be >= 1")
    val spark = df.sparkSession
    val nParts = nPartsOpt.getOrElse(TiledScan.defaultTiles(spark))
    val inSchema = df.schema
    val keyIdx = keyCols.map(inSchema.fieldIndex)
    val sortCols = keyCols.map(col) ++ orderCols

    val ranged = df.repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // counts read + binning pass share ONE execution of the range shuffle
    // (CacheScope discipline: the consuming action's driver releases) —
    // and, load-bearing since r14, ONE RDD instance: both jobs key tiles
    // by partition id, so they must see the same layout even if the cache
    // is evicted between them (TiledScan's layout-pinning doc — the same
    // frozen-ShuffleDependency argument applies verbatim).
    val cached = graft.CacheScope.retain(ranged)
    val rows0 = cached.rdd

    val maxRows = maxKeys.toLong + nParts
    val capMsg =
      s"OrderedNtile: key cardinality exceeds maxKeys=$maxKeys — this op " +
        "trades a bounded driver read for tile-parallel sorting and only " +
        "makes sense for low-cardinality keys; with this many distinct " +
        "keys the plain ntile window is already parallel (or raise " +
        "maxKeys if driver memory allows)"
    // Counts-only pre-job: one run-count long per tile to the driver —
    // trivially bounded at O(nParts) — so the cap fails fast BEFORE any
    // (tile, key) entry is materialized or shipped. A per-task require
    // alone cannot bound the SUM across tasks (each task sees only its
    // own runs: nParts tasks could each stay under the cap while the
    // collect receives nParts x maxRows entries — the blowup the removed
    // plan-side LIMIT used to bound). Reads the same pinned cached RDD as
    // the entry job, so the extra pass is a cache scan, and the layouts
    // agree by construction.
    val runCounts: Array[Long] = rows0.mapPartitionsWithIndex { (_, it) =>
      var runs = 0L
      var cur: List[Any] = null
      it.foreach { r =>
        val k = keyIdx.map(r.get).toList
        if (k != cur) { runs += 1L; cur = k }
      }
      Iterator.single(runs)
    }.collect()
    require(runCounts.sum <= maxRows, capMsg)

    // O(nParts + #keys) driver read: per-(tile, key) row counts, emitted
    // as one entry per contiguous same-key run (the tile is sorted, so a
    // key is exactly one run). A key spans contiguous tiles under the
    // range partitioner, so the result has at most #keys + nParts - 1
    // rows. The pre-job above already bounded the global total; the
    // per-task require is defense-in-depth only.
    val counts: Array[(Int, List[Any], Long)] =
      rows0.mapPartitionsWithIndex { (pid, it) =>
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Int, List[Any], Long)]
        var cur: List[Any] = null
        var n = 0L
        it.foreach { r =>
          val k = keyIdx.map(r.get).toList
          if (k != cur) {
            if (cur != null) buf += ((pid, cur, n))
            require(buf.size <= maxRows, capMsg)
            cur = k; n = 0L
          }
          n += 1L
        }
        if (cur != null) buf += ((pid, cur, n))
        buf.iterator
      }.collect()
    require(counts.length <= maxRows, capMsg)
    val totals: Map[List[Any], Long] =
      counts.groupBy(_._2).map { case (k, rs) => k -> rs.map(_._3).sum }
    // rank offset of (tile, key) = rows of that key in earlier tiles
    val offsets: Map[(Int, List[Any]), Long] = counts
      .groupBy(_._2).flatMap { case (k, rs) =>
        var run = 0L
        rs.sortBy(_._1).map { case (pid, _, c) =>
          val off = run; run += c; (pid, k) -> off
        }
      }
    val bc = spark.sparkContext.broadcast((offsets, totals))

    val outSchema = inSchema.add(binCol, IntegerType, nullable = false)
    // binning pass over the SAME rows0 RDD the counts came from (layout
    // pin) — the mapPartitionsWithIndex pid is the offsets map's key
    val binned = rows0.mapPartitionsWithIndex { (pid, rows) =>
      val (offs, tots) = bc.value
      var curKey: List[Any] = null
      var local = 0L; var off = 0L; var n = 0L
      rows.map { r =>
        val k = keyIdx.map(r.get).toList
        if (k != curKey) {
          curKey = k; local = 0L
          off = offs((pid, k)); n = tots(k)
        }
        local += 1
        val rank = off + local
        // SQL NTILE: q = n/b, rem = n%b; buckets 1..rem take q+1 rows
        val q = n / buckets; val rem = n - q * buckets
        val bin =
          if (rank <= (q + 1) * rem) (rank - 1) / (q + 1) + 1
          else rem + (rank - (q + 1) * rem - 1) / q + 1
        Row.fromSeq(r.toSeq :+ bin.toInt)
      }
    }
    spark.createDataset(binned)(Encoders.row(outSchema))
  }
}
