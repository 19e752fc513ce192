package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.types.DoubleType

/** Distributed ROLLING-FRAME aggregates (`ROWS BETWEEN n-1 PRECEDING AND
  * CURRENT ROW`) over grouped, ordered data — without one-task-per-key.
  *
  * Same tile/carry shape as [[OrderedLag]] (see its doc for the
  * low-cardinality-window rationale and [[TiledScan]] for the carry
  * contract): a rolling frame of N rows is a FINITE-memory scan, so a
  * per-tile streaming pass with an (N−1)-row ring buffer plus an
  * (N−1)-row carry from preceding tiles reproduces the window exactly.
  *
  * BIT-EXACTNESS CONTRACT: Spark's `SlidingWindowFunctionFrame`
  * re-initializes the aggregate and re-accumulates the whole frame in
  * partition order FOR EVERY OUTPUT ROW (no streaming retract for
  * declarative aggregates). This op does the identical per-row
  * re-accumulation with the identical update arithmetic — `Average`'s
  * sum/count, `CentralMomentAgg`'s Welford recurrence (delta / deltaN /
  * m2), `Sum`'s null-seeded running sum — in the identical oldest→newest
  * order, so every output double is bit-equal to the window's
  * (OrderedRollingSpec pins this, NaN/null cases included). Per-row cost
  * is O(frame) — the same as WindowExec — but the sort parallelism is
  * nParts tiles instead of #keys tasks.
  *
  * Value column must be DoubleType; keys non-null; (keyCols ++ orderCols)
  * a strict total order. Nulls in the value column occupy frame SLOTS but
  * don't contribute (aggregate semantics), exactly like the window.
  */
object OrderedRolling {

  /** One output column: `func` over the trailing `frame`-row window.
    * `func`: "avg" | "stddev_samp" | "sum".
    */
  final case class Roll(name: String, func: String, frame: Int) {
    require(frame >= 1, "frame must be >= 1")
    require(Set("avg", "stddev_samp", "sum")(func), s"unsupported: $func")
  }

  def withRollups(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], valueCol: String, rolls: Seq[Roll],
      nPartsOpt: Option[Int] = None): DataFrame = {
    require(rolls.nonEmpty)
    val spark = df.sparkSession
    val nParts = nPartsOpt.getOrElse(
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val memory = rolls.map(_.frame).max - 1

    val prep = TiledScan.prepare(df, keyCols, orderCols, valueCol,
      memory = memory, nParts = nParts)
    import prep.{carry, keyIdx, pidIdx, valIdx}
    require(prep.inSchema(valIdx).dataType == DoubleType,
      s"rolling value column must be double, got " +
        prep.inSchema(valIdx).dataType)

    val outSchema = rolls.foldLeft(prep.inSchema) { case (s, roll) =>
      s.add(roll.name, DoubleType, nullable = true)
    }
    val rollArr = rolls.toArray

    prep.withPid.mapPartitions { rows =>
      var ring: scala.collection.mutable.ArrayDeque[(Seq[Any], Any)] = null
      rows.map { r =>
        if (ring == null) {
          ring = scala.collection.mutable.ArrayDeque.from(
            carry.getOrElse[Array[(Seq[Any], Any)]](
              r.getInt(pidIdx), Array.empty))
        }
        val key = keyIdx.map(r.get)
        val cur: Any = if (r.isNullAt(valIdx)) null else r.getDouble(valIdx)
        // trailing same-key prefix of the ring (newest-last): ring may
        // hold older keys from the carry; sorted contiguity means the
        // same-key rows are exactly the trailing run
        var same = 0
        while (same < ring.size &&
            ring(ring.size - 1 - same)._1 == key) same += 1
        val out = new Array[Any](rollArr.length)
        var i = 0
        while (i < rollArr.length) {
          val roll = rollArr(i)
          val take = math.min(roll.frame - 1, same)
          // frame = [ring tail of `take` rows] ++ [current row], oldest
          // first — accumulate EXACTLY like the Spark aggregate would
          out(i) = roll.func match {
            case "avg" =>
              var sum = 0.0; var cnt = 0L
              var j = ring.size - take
              while (j < ring.size) {
                val v = ring(j)._2
                if (v != null) { sum += v.asInstanceOf[Double]; cnt += 1L }
                j += 1
              }
              if (cur != null) { sum += cur.asInstanceOf[Double]; cnt += 1L }
              if (cnt == 0L) null else sum / cnt
            case "sum" =>
              var sum = 0.0; var any = false
              var j = ring.size - take
              while (j < ring.size) {
                val v = ring(j)._2
                if (v != null) { sum += v.asInstanceOf[Double]; any = true }
                j += 1
              }
              if (cur != null) { sum += cur.asInstanceOf[Double]; any = true }
              if (!any) null else sum
            case "stddev_samp" =>
              // CentralMomentAgg's Welford recurrence, verbatim:
              // n' = n+1; delta = x - avg; deltaN = delta / n';
              // avg' = avg + deltaN; m2' = m2 + delta * (delta - deltaN)
              var n = 0.0; var avg = 0.0; var m2 = 0.0
              def upd(x: Double): Unit = {
                n += 1.0
                val delta = x - avg
                val deltaN = delta / n
                avg += deltaN
                m2 += delta * (delta - deltaN)
              }
              var j = ring.size - take
              while (j < ring.size) {
                val v = ring(j)._2
                if (v != null) upd(v.asInstanceOf[Double])
                j += 1
              }
              if (cur != null) upd(cur.asInstanceOf[Double])
              // n<=1 -> null: StddevSamp's nullOnDivideByZero default
              // (spark.sql.legacy.statisticalAggregate=false)
              if (n <= 1.0) null
              else math.sqrt(m2 / (n - 1.0))
          }
          i += 1
        }
        if (memory > 0) {
          if (ring.size == memory) ring.removeHead()
          ring.append((key, cur))
        }
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) ++ out)
      }
    }(Encoders.row(outSchema))
  }
}
