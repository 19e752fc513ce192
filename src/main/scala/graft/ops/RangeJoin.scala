package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic big×big INTERVAL join — `points (key, t)` ⋈ `intervals
  * (key, lo, hi)` on key equality AND `lo <= t <= hi` — without the
  * cartesian/BroadcastNestedLoop plan Spark falls back to for theta
  * joins when neither side fits a broadcast.
  *
  * The bucketization trick: pick a bucket width, explode every interval
  * over the fixed-width buckets it covers, tag every point with the ONE
  * bucket containing it, hash-equi-join on (key…, bucket), then apply
  * the exact range predicate as a residual filter. Shuffle cardinality
  * is |points| + Σ(interval span)/width — linear in the inputs, never
  * |points| × |intervals|. Each qualifying (point, interval) pair meets
  * exactly once (in the point's own bucket), so no dedup pass is needed.
  *
  * Width tuning is the usual time-partitioning trade: width ≈ the median
  * interval span keeps the explode factor ~2 while the residual filter
  * stays selective.
  */
object RangeJoin {

  def rangeJoin(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ivb = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val ptb = points.withColumn("__bucket",
      floor(col(tCol) / bucketWidth).cast("long"))
    ptb.join(ivb, keyCols :+ "__bucket")
      .where(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bucket")
  }
}
