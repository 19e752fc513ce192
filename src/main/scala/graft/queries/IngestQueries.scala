package graft.queries

import graft.{Query, QueryPack, Tables}
import graft.streaming.StreamIngest
import graft.streaming.StreamIngest.IsoMicros
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Batch faces of the ingest path (SURVEY §2.3 P1/P3/P5/P6/P16/P17): the
  * same parse functions the streaming queries use, driven from the
  * `events` table so the DuckDB oracle can check them. The envelope
  * round-trip builds real WS-shaped JSON (numerics as strings, missing
  * time fields) inside the query and pushes it through the full
  * from_json → explode → cast → patch pipeline; the oracle is the
  * identity projection — if any stage lost information, the hash breaks.
  */
object IngestQueries extends QueryPack {

  private def ev(s: SparkSession, dir: String) = Tables(s, dir, "events")

  override def queries: Seq[Query] = Seq(

    // ---- P1/P16: JSON parse of the props metadata column ----
    Query(
      "q_p1_parse_props",
      (s, dir) =>
        ev(s, dir).select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k")),
      Some("""SELECT event_id, CAST(props->>'k' AS INT) AS k FROM events""".stripMargin),
      doc = "SURVEY P1/P16: from_json with declared schema over the metadata " +
        "column — map-only, permissive nulls on corrupt records"),

    // ---- P5+P6+P2+P16: envelope encode → parse → explode → cast → patch ----
    Query(
      "q_p5_envelope_roundtrip",
      (s, dir) => {
        val tick = struct(
          lit("update").as("type"),
          col("event_type").as("product_id"),
          col("value").cast("string").as("price"),
          col("event_id").cast("string").as("volume_24h"),
          when(col("value") >= 1.0, date_format(col("ts"), IsoMicros)).as("time"))
        val envelopes = ev(s, dir)
          .select(col("event_type"), tick.as("t"))
          .groupBy("event_type")
          .agg(to_json(struct(
            lit("ticker").as("channel"),
            lit("2024-01-01T00:00:00.000000Z").as("timestamp"),
            array(struct(lit("update").as("type"),
              sort_array(collect_list(col("t"))).as("tickers"))).as("events")
          )).as("payload"))
        StreamIngest.parseTickerEnvelopes(envelopes, "payload")
          .select(
            col("product_id").as("event_type"),
            col("volume_24h").cast("long").as("event_id"),
            col("price"),
            col("time"))
      },
      Some("""SELECT event_type, event_id, value AS price,
             |  CASE WHEN value < 1.0 THEN TIMESTAMP '2024-01-01 00:00:00' ELSE ts END AS time
             |FROM events""".stripMargin),
      doc = "SURVEY P5/P6/P2: WS envelope built with numerics-as-strings and " +
        "missing time fields, then from_json + double explode + cast + " +
        "envelope-timestamp patch; oracle = identity projection (lossless round-trip)"),

    // ---- P3: dual-format candle timestamp ----
    Query(
      "q_p3_dual_ts",
      (s, dir) => {
        val startStr = when(col("event_id") % 2 === 0,
          unix_timestamp(col("ts")).cast("string"))
          .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
        ev(s, dir)
          .withColumn("start", startStr)
          .select(col("event_id"),
            StreamIngest.parseCandleTs(col("start")).as("start_time"))
      },
      Some("""SELECT event_id, date_trunc('second', ts) AS start_time
             |FROM events""".stripMargin),
      doc = "SURVEY P3: when(try_cast(long) ok, epoch).otherwise(text parse) — " +
        "both branches land on second precision, oracle is date_trunc"),

    // ---- P17: archive object-key formatting ----
    Query(
      "q_p17_object_keys",
      (s, dir) =>
        ev(s, dir).select(col("event_id"),
          format_string("ticker/%s/%d.json", col("event_type"),
            unix_micros(col("ts"))).as("object_key")),
      Some("""SELECT event_id,
             |  'ticker/' || event_type || '/' || CAST(epoch_us(ts) AS BIGINT) || '.json' AS object_key
             |FROM events""".stripMargin),
      doc = "SURVEY P17: {channel}/{key}/{epoch}.json object-key layout as an " +
        "expression — the archive sink's partition path (K4)"),

    // ---- S6/P7/P8: the CSV batch source, oracle-checked ----
    Query(
      "q_s6_csv_scan",
      (s, _) => graft.ts.FeatureFrame.loadOhlcvCsv(s, ensureCsvFixture())
        .select(col("id"), col("ts"), col("open"), col("high"),
          col("low"), col("close"), col("volume")),
      Some(s"""SELECT CAST(epoch(CAST(timestamp AS TIMESTAMP)) AS BIGINT) AS id,
              |  CAST(timestamp AS TIMESTAMP) AS ts,
              |  Open AS open, High AS high, Low AS low,
              |  Close AS close, Volume AS volume
              |FROM read_csv('$CsvFixturePath', header=true,
              |  columns={'timestamp':'VARCHAR','Open':'DOUBLE','High':'DOUBLE',
              |           'Low':'DOUBLE','Close':'DOUBLE','Volume':'DOUBLE'})"""
        .stripMargin),
      doc = "SURVEY S6/P7/P8 upgraded from test-only to hash-checked: the " +
        "reference-header CSV loader (declared schema — no inference job, " +
        "rename map, to_timestamp parse, epoch id) against DuckDB's " +
        "read_csv of the SAME on-disk file — both engines parse the " +
        "identical decimal strings to identical doubles; the fixture is " +
        "written deterministically (Locale.ROOT) by the query itself"),

    // ---- S7: rows→frame adapter, oracle-checked ----
    Query(
      "q_s7_rows_adapter",
      (s, _) => Tables.fromRows(s, Seq(
        org.apache.spark.sql.Row(1L, "BTC-USD",
          utc("2024-01-01T00:00:00Z"), 42000.5, true),
        org.apache.spark.sql.Row(2L, "ETH-USD",
          utc("2024-01-01T00:05:00Z"), null, false),
        org.apache.spark.sql.Row(3L, "BTC-USD",
          utc("2024-01-01T00:10:00Z"), 41950.25, true)),
        "id BIGINT, product STRING, ts TIMESTAMP, price DOUBLE, live BOOLEAN"),
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'BTC-USD', TIMESTAMP '2024-01-01 00:00:00',
             |   CAST(42000.5 AS DOUBLE), true),
             |  (CAST(2 AS BIGINT), 'ETH-USD', TIMESTAMP '2024-01-01 00:05:00',
             |   CAST(NULL AS DOUBLE), false),
             |  (CAST(3 AS BIGINT), 'BTC-USD', TIMESTAMP '2024-01-01 00:10:00',
             |   CAST(41950.25 AS DOUBLE), true))
             |  AS t(id, product, ts, price, live)""".stripMargin),
      doc = "SURVEY S7 upgraded from test-only to hash-checked: the " +
        "rows->frame adapter (createDataFrame + DDL schema) over a mixed-" +
        "type fixture — bigint/string/timestamp/nullable-double/boolean — " +
        "vs a DuckDB VALUES table; pins the DDL type mapping end-to-end " +
        "through parquet, with instants (not zone-local Timestamp.valueOf) " +
        "so the fixture is JVM-timezone-independent"),

    // ---- runtime observability: ingest health from observe() counters ----
    Query(
      "q_o_ingest_health",
      (s, dir) => ingestHealth(s, dir),
      Some("""WITH m AS (SELECT MAX(ts) AS mx FROM events),
             |c AS (SELECT COUNT(*) AS n_rows,
             |        CAST(COALESCE(SUM(CASE WHEN value IS NULL OR isnan(value)
             |              OR isinf(value) THEN 1 ELSE 0 END), 0) AS BIGINT)
             |          AS corrupt_rows,
             |        CAST(COALESCE(SUM(CASE WHEN ts < mx - INTERVAL 24 HOUR
             |              THEN 1 ELSE 0 END), 0) AS BIGINT) AS late_rows
             |      FROM events, m)
             |SELECT n_rows, corrupt_rows, late_rows,
             |  ROUND(corrupt_rows * 1.0 / NULLIF(n_rows, 0), 6) + 0.0
             |    AS corrupt_ratio,
             |  ROUND(late_rows * 1.0 / NULLIF(n_rows, 0), 6) + 0.0
             |    AS late_ratio,
             |  CASE WHEN corrupt_rows = 0
             |        AND ROUND(late_rows * 1.0 / NULLIF(n_rows, 0), 6) + 0.0
             |          < 0.5
             |       THEN 'healthy' ELSE 'degraded' END AS status
             |FROM c""".stripMargin),
      doc = "runtime observability (the reference's /health endpoint as a " +
        "query): n_rows/corrupt_rows/late_rows from Dataset.observe " +
        "counters riding the ingest scan itself (CollectMetrics — zero " +
        "extra passes), folded through the same healthReport as the " +
        "streaming listener path; the oracle recomputes the counters from " +
        "first principles, so hash equality proves observe == ground truth")
  )

  /** Runtime observability (the reference's /health endpoint, VERDICT r8
    * #4): the ingest health report computed from Dataset.observe counters
    * riding the SAME scan as the ingest — zero extra passes. The query
    * drives the REAL machinery end-to-end: an [[org.apache.spark.sql
    * .Observation]] collects (n_rows, corrupt_rows, late_rows) from a
    * CollectMetrics node over the events scan, and the 1-row metrics
    * table folds through the same healthReport the streaming listener
    * path uses (batch==stream pinned in StreamingSpec). The DuckDB
    * oracle recomputes the counters from first principles — hash
    * equality proves the observed metrics match ground truth.
    * Late threshold: 24 h before max(ts) (one bounded driver read, the
    * J3/W14 scalar posture; the oracle replays it as a subquery).
    */
  private def ingestHealth(s: SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.streaming.Observability
    val ev = Tables(s, dir, "events")
    // max(ts) is null on an empty slice: nothing can be late there, so the
    // threshold becomes a null literal (lateCond never fires) instead of
    // an NPE — the degenerate-input contract (DegenerateProbe)
    val maxTs = Option(ev.agg(max(col("ts"))).collect()(0).getTimestamp(0))
    val threshold = maxTs
      .map(t => lit(java.sql.Timestamp.from(t.toInstant.minusSeconds(24 * 3600))))
      .getOrElse(lit(null).cast("timestamp"))
    val obs = new org.apache.spark.sql.Observation()
    val observed = Observability.observeIngestBatch(
      ev, obs, "value", "ts", threshold)
    observed.write.format("noop").mode("overwrite").save() // the action
    val m = obs.get
    // observe() sums are null over a zero-row action — fold to 0 counts
    def cnt(k: String): Long =
      m(k) match { case null => 0L; case l => l.asInstanceOf[Long] }
    val metricsRow = org.apache.spark.sql.Row(0L,
      cnt("n_rows"), cnt("corrupt_rows"), cnt("late_rows"))
    Observability.healthReport(s.createDataFrame(
      java.util.Arrays.asList(metricsRow), Observability.metricsSchema))
  }

  /** S7 fixture instant: absolute (`Instant.parse`, not
    * `Timestamp.valueOf`) so the rows mean the same UTC wall-clock no
    * matter the JVM default zone — the oracle's naive TIMESTAMP literals
    * compare against session-UTC values.
    */
  private def utc(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(s))

  /** Where [[ensureCsvFixture]] writes the S6 oracle fixture — an absolute
    * path shared with the DuckDB oracle text, which reads the same file.
    * USER-SCOPED (ADVICE r8): a world-shared /tmp/graft_fixtures could be
    * pre-owned (or symlinked) by another user on a shared host, failing
    * the write or redirecting it; scoping by user.name keeps the path
    * stable between the Verify run that writes it and the driver's later
    * DuckDB pass (both interpolate this same val) without world-sharing.
    * Concurrent runs by the SAME user still race benignly — every write
    * is byte-identical by construction.
    */
  private val CsvFixturePath: String = {
    val tmp = sys.props.getOrElse("java.io.tmpdir", "/tmp")
      .stripSuffix("/")
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9_-]", "_")
    s"$tmp/graft_fixtures_$user/ohlcv_s6.csv"
  }

  /** Idempotently write the deterministic 200-row 5-minute OHLCV fixture
    * (reference header names, Locale.ROOT formatting so the decimal
    * separator cannot drift with the JVM locale). Content is a pure
    * function of the row index — every (re)write is byte-identical, so
    * Verify and the driver's later DuckDB pass agree on the bytes.
    */
  private def ensureCsvFixture(): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(CsvFixturePath)
    Files.createDirectories(p.getParent)
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss", java.util.Locale.ROOT)
    val rows = (0 until 200).map { i =>
      val t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusMinutes(5L * i).format(fmt)
      val base = 100.0 + 10.0 * math.sin(i * 0.15)
      val open = base
      val close = base + math.cos(i * 0.4)
      val high = math.max(open, close) + 0.5
      val low = math.min(open, close) - 0.5
      val vol = 10.0 + (i % 7)
      String.format(java.util.Locale.ROOT,
        "%s,%.6f,%.6f,%.6f,%.6f,%.2f", t, open, high, low, close, vol)
    }
    Files.write(p,
      ("timestamp,Open,High,Low,Close,Volume" +: rows).mkString("\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    CsvFixturePath
  }
}
