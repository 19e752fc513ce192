package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-insensitive result fingerprint shared by the concurrency and
  * retry gates: one JSON per row over the name-sorted columns (the
  * driver's sort-columns-by-name discipline), xxhash64 per row, DECIMAL
  * sum (exact, order-free, ANSI-safe) + row count. Both sides of every
  * comparison run the identical plan, so representation quirks cancel.
  */
object ResultFingerprint {
  def apply(df: DataFrame): (BigDecimal, Long) = {
    val cols = df.columns.sorted.map(col)
    val row = df
      .select(xxhash64(to_json(struct(cols: _*))).as("h"))
      .agg(sum(col("h").cast("decimal(38,0)")).as("s"),
        count(lit(1)).as("n"))
      .head()
    (Option(row.getDecimal(0)).map(BigDecimal(_)).getOrElse(BigDecimal(0)),
      row.getLong(1))
  }
}
