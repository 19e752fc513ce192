package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named engine query: the Spark implementation plus (when SQL-expressible)
  * an equivalent ANSI-SQL oracle the driver runs through DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver's comparator sorts columns by name before hashing values.
  *
  * Float discipline for oracle parity: monetary sums go through
  * DECIMAL(18,2/4) (exact in both engines, cast to DOUBLE at the end);
  * inherently-float results (stddev, cosine, ratios) are ROUND()ed to a fixed
  * number of digits on BOTH sides.
  */
final case class Query(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    doc: String = "")

/** A module's contribution to the engine's query surface. */
trait QueryPack {
  def queries: Seq[Query]
}

object QueryPack {
  def toEntryMaps(packs: Seq[QueryPack])
      : (Map[String, (SparkSession, String) => DataFrame], Map[String, String]) = {
    val qs = packs.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size,
      s"duplicate query names: ${qs.map(_.name).diff(qs.map(_.name).distinct)}")
    (qs.map(q => q.name -> q.run).toMap,
     qs.flatMap(q => q.oracle.map(q.name -> _)).toMap)
  }
}
