package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructField}
import org.scalatest.funsuite.AnyFunSuite

/** Dtype-parity guard for the text-SQL surface (VERDICT r7 #2b).
  *
  * The driver's oracle compare is EXACT: a Spark column landing as
  * DECIMAL(28,4) where DuckDB produces DOUBLE hash-fails even when every
  * value is numerically identical (the r7 `q_sql_retention_cohorts`
  * defect — Spark parses `1.0`/`0.0` SQL literals as DECIMAL, so `+ 0.0`
  * does NOT coerce to double the way `lit(0.0)` does in the DataFrame
  * API). Two assertions make that drift impossible to ship again:
  *
  *  1. every `q_sql_*` query with a DataFrame twin has the SAME result
  *     schema — column names AND dataTypes (order-insensitive, matching
  *     the driver's sort-columns-by-name compare);
  *  2. no `q_sql_*` result schema contains a DecimalType column unless
  *     its twin has one too (and for twinless queries, none at all) —
  *     DECIMAL belongs INSIDE exact-sum arithmetic, always CAST back to
  *     DOUBLE at the output boundary (`q_sql_abc_pareto` idiom).
  *
  * Mostly schema-only: the plans are analyzed, not executed, so the
  * sweep is cheap against the sf0.001 fixtures — with one exception:
  * building `q_sql_bucketed_activity`'s frame runs
  * `BucketedLayout.ensureEventsByUser`, which on a fresh session WRITES
  * the bucketed table (real Spark jobs) before the `s.sql` text can
  * resolve — a few seconds once per JVM, memoized for every later query
  * against the same layout.
  */
class SchemaParitySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.session
  private val dir = "/root/testdata/sf0.001"

  /** q_sql_* → DataFrame-API twin producing the same logical result. */
  private val twins: Map[String, String] = Map(
    "q_sql_range_scan" -> "q_scan_range",
    "q_sql_latest_n" -> "q_latest_n",
    "q_sql_availability" -> "q_summary_availability",
    "q_sql_scd2" -> "q_r_scd2",
    "q_sql_active_users" -> "q_a_active_users",
    "q_sql_merge_upsert" -> "q_r_merge_upsert",
    "q_sql_fk_audit" -> "q_r_fk_audit",
    "q_sql_abc_pareto" -> "q_a_abc_pareto",
    "q_sql_retention_cohorts" -> "q_a_retention_cohorts",
    "q_sql_time_to_convert" -> "q_a_time_to_convert",
    "q_sql_attribution" -> "q_a_attribution",
    "q_sql_incremental_rollup" -> "q_r_incremental_rollup",
    "q_sql_bucketed_activity" -> "q_r_bucketed_user_activity")

  private def fields(name: String): Set[(String, DataType)] =
    SparkEntry.queries(name)(spark, dir)
      .schema.fields.map((f: StructField) => (f.name, f.dataType)).toSet

  private def sqlNames: Seq[String] =
    SparkEntry.queries.keys.filter(_.startsWith("q_sql_")).toSeq.sorted

  test("every declared twin name resolves to a real query") {
    val all = SparkEntry.queries.keySet
    val missing = (twins.keySet ++ twins.values).filterNot(all.contains)
    assert(missing.isEmpty, s"unknown query names in twin map: $missing")
  }

  test("q_sql_* schemas equal their DataFrame twins (name AND dataType)") {
    // Compared on the intersection of column names: some twins project
    // extra passthrough columns (q_scan_range carries user_id, q_r_fk_audit
    // extra audit columns) — the dtype contract applies to the shared ones.
    val drift = twins.toSeq.sortBy(_._1).flatMap { case (sqlQ, dfQ) =>
      val a = fields(sqlQ).toMap; val b = fields(dfQ).toMap
      val shared = a.keySet intersect b.keySet
      if (shared.isEmpty) Some(s"$sqlQ vs $dfQ: no shared columns " +
        s"(sql=${a.keySet.toSeq.sorted} twin=${b.keySet.toSeq.sorted})")
      else {
        val bad = shared.toSeq.sorted.filter(c => a(c) != b(c))
          .map(c => s"$c: sql=${a(c)} twin=${b(c)}")
        if (bad.isEmpty) None
        else Some(s"$sqlQ vs $dfQ dtype drift — ${bad.mkString(", ")}")
      }
    }
    assert(drift.isEmpty, "schema drift:\n" + drift.mkString("\n"))
  }

  test("no q_sql_* output column is DECIMAL unless its twin's is") {
    val offenders = sqlNames.flatMap { q =>
      val dec = fields(q).collect { case (n, _: DecimalType) => n }
      val twinDec = twins.get(q)
        .map(t => fields(t).collect { case (n, _: DecimalType) => n })
        .getOrElse(Set.empty[String])
      val bad = dec -- twinDec
      if (bad.isEmpty) None
      else Some(s"$q leaks DECIMAL columns ${bad.toSeq.sorted} " +
        "(CAST ... AS DOUBLE at the output boundary)")
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
