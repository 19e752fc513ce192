package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared operator surface, assembled from
  * per-module QueryPacks; `oracleSql` carries the DuckDB-equivalent SQL for
  * every SQL-expressible query (same column names — the driver sorts columns
  * by name before hashing).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    Relational,
    TimeSeriesQueries,
    IndicatorQueries,
    TextQueries,
    VectorQueries,
    DedupQueries,
    IngestQueries,
    ServingQueries,
    FeatureQueries,
    SqlQueries,
    ApproxQueries,
    MultimodalQueries,
    SamplingQueries,
    CurationQueries
  )

  private lazy val (queryMap, oracleMap) = QueryPack.toEntryMaps(packs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queryMap("q_join_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = queryMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = oracleMap
}
