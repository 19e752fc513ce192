package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.6 J1 tolerant variant): for every left row,
  * attach the LATEST right row with `rightTs <= leftTs` on the same key
  * (direction "backward", the default), or the EARLIEST right row with
  * `rightTs >= leftTs` ("forward" — pandas merge_asof parity), optionally
  * within a tolerance.
  *
  * Built the Spark-scalable way — no range-condition join (which plans a
  * per-key cartesian and explodes on dense keys) and no custom physical
  * operator needed: tag both inputs, union, ONE shuffle+sort per key on
  * (ts, tag), then `last(payload, ignoreNulls)` over the running frame
  * carries the most recent right payload into each left row. Cost is a
  * single sort-merge pass regardless of how many right rows precede each
  * left row; at 100 TB that is the difference between an as-of join and
  * an accidental O(|L|·|R|) range join. Right rows sort before left rows
  * at equal timestamps (tag 0 < 1), giving inclusive `<=` semantics.
  *
  * Contract: `right` must be unique per (key, rightTs) — pre-dedup with
  * a keep-latest rule (the LWW posture) — so the carried match is
  * deterministic.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payloadCols: Seq[String],
      toleranceSeconds: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val payload = struct(
      (col(rightTs).as("__rts") +: payloadCols.map(col)): _*)
    // Both directions run as a LAST(ignoreNulls) over a RUNNING frame —
    // forward simply traverses time descending. Spark's running frame is
    // an O(n) accumulator; a [current, unbounded following] frame is NOT
    // (it rescans the remainder per row — measured 84s vs 0.8s at sf0.1).
    // Tag order makes the equal-timestamp right row land inside the
    // frame before the left row does (inclusive <=/>= semantics).
    val r = right.select(col(key), col(rightTs).as("__ets"),
      payload.as("__p"), lit(0).as("__tag"))
    val l = left.withColumn("__ets", col(leftTs))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
      .withColumn("__tag", lit(1))
    val ord =
      if (backward) Seq(col("__ets").asc, col("__tag").asc)
      else Seq(col("__ets").desc, col("__tag").asc)
    val w = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val gap =
      if (backward) unix_micros(col("__ets")) - unix_micros(col("__match.__rts"))
      else unix_micros(col("__match.__rts")) - unix_micros(col("__ets"))
    val withinTol = toleranceSeconds match {
      case Some(t) => carried.where(col("__match").isNotNull &&
        gap <= t * 1000000L)
      case None => carried.where(col("__match").isNotNull)
    }
    val out = payloadCols.foldLeft(
      withinTol.withColumn("matched_ts", col("__match.__rts"))) {
      case (df, c) => df.withColumn(s"matched_$c", col(s"__match.$c"))
    }
    out.drop("__ets", "__p", "__tag", "__match")
  }
}
