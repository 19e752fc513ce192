package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared tile/carry machinery for the ordered-scan operator family
  * ([[OrderedLag]], [[OrderedRolling]]): range-partition a frame on
  * (key ++ order) so tiles partition the global sort order, and hand each
  * tile the last `memory` (key, value) rows that precede it — the
  * finite-memory carry that lets per-tile streaming passes reproduce
  * per-key window semantics without one-task-per-key. See
  * [[OrderedLag]]'s doc for the full rationale; [[PrefixSum]] documents
  * the bounded O(nParts · memory) driver-read contract the carry shares.
  *
  * Only FINITE-memory scans fit this shape (lag k, rolling frames of N
  * rows). Unbounded recurrences (EMA chains — [[graft.ts.Indicators]])
  * keep the per-key sequential contract instead.
  *
  * LAYOUT PINNING (VERDICT r13 watch-item #1 → r14 #1): the operator runs
  * TWO jobs — the tails collect here and the consumer's main pass — whose
  * correctness requires the SAME tile layout. Until r14 the main pass was
  * a fresh DataFrame over the retained frame, re-PLANNED at action time:
  * if the cache entry was evicted in the gap (another session's
  * `CacheScope.release` — the r13i race — or `spark.catalog.clearCache()`
  * or any direct unpersist), planning re-inserted the range shuffle with
  * freshly SAMPLED bounds, shifting tiles under a carry map built for the
  * old layout — wrong boundary values, right row count. Now BOTH jobs run
  * over the ONE RDD in [[Prep.rows]]: `Dataset.rdd` is a memoized lazy
  * val wrapping one QueryExecution, so the range shuffle's sampled bounds
  * are frozen in that plan's ShuffleDependency the first time any job
  * touches it, and an eviction makes recompute re-run the SAME dependency
  * — identical bounds, identical tiles, the carry map stays valid. The
  * cache ([[graft.CacheScope.retain]]) is purely a performance choice
  * (one shuffle+sort feeding both passes); ANY eviction path now costs a
  * recompute, never a wrong answer (LayoutPinSpec pins every route).
  */
private[ops] object TiledScan {

  /** `carry(pid)` rows are (key values, value-column values) — one entry
    * per tracked value column, in `valueCols` order. `rows` is the pinned
    * RDD both jobs share — consumers MUST build their main pass from it
    * (mapPartitionsWithIndex supplies the pid the carry map is keyed by).
    */
  final case class Prep(
      rows: RDD[Row], keyIdx: Seq[Int], valIdx: Seq[Int],
      inSchema: StructType, carry: Map[Int, Array[(Seq[Any], Array[Any])]])

  def prepare(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
      valueCols: Seq[String], memory: Int, nParts: Int): Prep = {
    val inSchema = df.schema
    val valIdx = valueCols.map(inSchema.fieldIndex)
    val keyIdx = keyCols.map(inSchema.fieldIndex)

    val sortCols = keyCols.map(col) ++ orderCols
    val ranged = df.repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // read twice (tails + main pass): one shuffle+sort, not two
    val cached = graft.CacheScope.retain(ranged)
    // the ONE physical execution both jobs hang off (doc above)
    val rows = cached.rdd

    // Per-tile trailing rows — O(nParts · memory) rows to the driver,
    // bounded and independent of data size (the PrefixSum-offsets
    // contract).
    val tails: Array[(Int, Array[(Seq[Any], Array[Any])])] =
      if (memory == 0) Array.empty
      else rows.mapPartitionsWithIndex { (pid, it) =>
        val buf =
          new scala.collection.mutable.ArrayDeque[(Seq[Any], Array[Any])]()
        it.foreach { r =>
          if (buf.size == memory) buf.removeHead()
          buf.append((keyIdx.map(r.get), valIdx.map(r.get).toArray))
        }
        Iterator.single((pid, buf.toArray))
      }.collect().sortBy(_._1)

    // Carry-in for tile p = the last `memory` global rows before it,
    // walking backwards over preceding tiles (covers tiles shorter than
    // `memory`). Ordered oldest -> newest.
    val tailByPid = tails.toMap
    val maxPid = tails.lastOption.map(_._1).getOrElse(-1)
    val carry: Map[Int, Array[(Seq[Any], Array[Any])]] =
      (0 to maxPid).map { p =>
        val acc =
          scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Array[Any])]
        var q = p - 1
        while (acc.size < memory && q >= 0) {
          val t = tailByPid.getOrElse(q, Array.empty[(Seq[Any], Array[Any])])
          acc.prependAll(t.takeRight(memory - acc.size))
          q -= 1
        }
        p -> acc.toArray
      }.toMap

    Prep(rows, keyIdx, valIdx, inSchema, carry)
  }
}
