package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation: two-phase salted groupBy for hot keys.
  *
  * A single `groupBy(key)` puts every row of a hot key in one reduce
  * task. Salting splits each key into `buckets` deterministic sub-groups
  * (phase 1 — map-side combine still applies within each), then combines
  * the per-salt partials (phase 2 — `buckets` rows per key, trivially
  * balanced). Correct only for algebraic aggregates (sum/count/min/max
  * and things derivable from them, e.g. avg = sum/count); NEVER for
  * order-dependent passes (the indicator recursion) — those need the key
  * intact and are documented as such in [[graft.ts.Indicators]].
  *
  * At 100 TB this is the difference between a straggler task holding the
  * job hostage and 32 even shards of the hottest product id.
  */
object SkewSafe {

  /** Deterministic salt in [0, buckets) from a unique row id. */
  def salt(idCol: Column, buckets: Int): Column =
    pmod(xxhash64(idCol), lit(buckets.toLong))

  /** Two-phase sum/count/min/max summary per key. Result is identical to
    * the direct `groupBy(key)` — only the shuffle shape changes.
    */
  def saltedSummary(df: DataFrame, key: String, idCol: String,
      valueCol: String, buckets: Int): DataFrame =
    df
      .groupBy(col(key), salt(col(idCol), buckets).as("__salt"))
      .agg(
        sum(col(valueCol)).as("__sum"),
        count(lit(1)).as("__n"),
        min(col(valueCol)).as("__min"),
        max(col(valueCol)).as("__max"))
      .groupBy(col(key))
      .agg(
        sum(col("__sum")).as("sum_value"),
        sum(col("__n")).as("n"),
        min(col("__min")).as("min_value"),
        max(col("__max")).as("max_value"))
}
