package graft.queries

import graft.{Query, QueryPack}
import graft.multimodal.Multimodal
import graft.vector.VectorSearch
import org.apache.spark.sql.functions._

/** Driver-checked faces of the multimodal operators (decode, resize,
  * frame-sample, feature-extract → LSH banding).
  *
  * The media fixture ([[Multimodal.syntheticMedia]]) is deterministic
  * integer arithmetic on the row id (kind = id%3, dims/body length from
  * id mod small constants), so decode / resize / frame-sample — whose
  * outputs are header fields and byte counts — are replayable EXACTLY in
  * ANSI SQL over `range(n)`: the oracle recomputes the same integer math
  * without ever touching bytes. That turns the binary plumbing
  * (mapPartitions over payloads, header parse, body subsampling, frame
  * chunk fan-out) into hash-checked queries. The feature-extraction path
  * (byte-histogram embedding → LSH band buckets) has no closed SQL form —
  * a loop over LCG body bytes — so it follows the approx-twin convention:
  * rows-only on the driver, exact values pinned in MultimodalSpec.
  *
  * Queries ignore `dir`: media is generated, not read from the testdata
  * tables (the brief's multimodal columns are synthetic by design — the
  * container ships no codecs).
  */
object MultimodalQueries extends QueryPack {

  /** Fixture size: big enough that every (kind × modulus) residue class is
    * populated, small enough to stay a smoke-scale driver check.
    */
  val N = 500

  override def queries: Seq[Query] = Seq(

    // ---- decode: payload bytes → typed metadata, per-kind profile ----
    Query(
      "q_m_decode_profile",
      (s, _) => Multimodal.decodeMeta(Multimodal.syntheticMedia(s, N))
        .groupBy("kind")
        .agg(count(lit(1)).as("n"),
          sum("width").as("sum_w"),
          sum("height").as("sum_h"),
          sum("sample_rate").as("sum_rate"),
          sum("n_frames").as("sum_frames"),
          sum("body_bytes").as("sum_body")),
      Some(s"""WITH m AS (
             |  SELECT range AS id,
             |    CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |    CASE range % 3 WHEN 0 THEN 64 + (range % 8) * 16 WHEN 1 THEN 0 ELSE 32 END AS width,
             |    CASE range % 3 WHEN 0 THEN 48 + (range % 5) * 16 WHEN 1 THEN 0 ELSE 24 END AS height,
             |    CASE range % 3 WHEN 1 THEN 16000 ELSE 0 END AS sample_rate,
             |    CASE range % 3 WHEN 0 THEN 1 WHEN 1 THEN 0 ELSE 8 + range % 5 END AS n_frames,
             |    CASE range % 3 WHEN 0 THEN 256 + range % 128 WHEN 1 THEN 512 + range % 256
             |      ELSE 800 + range % 100 END AS body_bytes
             |  FROM range($N))
             |SELECT kind, COUNT(*) AS n,
             |  CAST(SUM(width) AS BIGINT) AS sum_w,
             |  CAST(SUM(height) AS BIGINT) AS sum_h,
             |  CAST(SUM(sample_rate) AS BIGINT) AS sum_rate,
             |  CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
             |  CAST(SUM(body_bytes) AS BIGINT) AS sum_body
             |FROM m GROUP BY kind""".stripMargin),
      doc = "Multimodal decode: binary header parse via mapPartitions; oracle " +
        "replays the fixture's integer math over range() — every header field " +
        "and body length hash-checked per kind"),

    // ---- resize: image payload rewrite, then decode the result ----
    Query(
      "q_m_resize_profile",
      (s, _) => Multimodal.decodeMeta(
          Multimodal.resize(Multimodal.syntheticMedia(s, N), 64, 48))
        .select(col("media_id"), col("kind"), col("width"), col("height"),
          col("body_bytes")),
      Some(s"""WITH m AS (
             |  SELECT range AS media_id,
             |    CASE range % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             |    64 + (range % 8) * 16 AS iw, 48 + (range % 5) * 16 AS ih,
             |    CASE range % 3 WHEN 0 THEN 256 + range % 128 WHEN 1 THEN 512 + range % 256
             |      ELSE 800 + range % 100 END AS body
             |  FROM range($N)),
             |r AS (
             |  SELECT media_id, kind,
             |    GREATEST(1, (iw * ih) // (64 * 48)) AS ratio, body
             |  FROM m)
             |SELECT media_id, kind,
             |  CASE WHEN kind = 'image' THEN 64
             |       WHEN kind = 'audio' THEN 0 ELSE 32 END AS width,
             |  CASE WHEN kind = 'image' THEN 48
             |       WHEN kind = 'audio' THEN 0 ELSE 24 END AS height,
             |  CASE WHEN kind = 'image' THEN (body + ratio - 1) // ratio
             |       ELSE body END AS body_bytes
             |FROM r""".stripMargin),
      doc = "Multimodal resize: header rewrite + area-ratio body subsample " +
        "(images only; audio/video pass through); oracle = ceil-division " +
        "integer replay, per-row hash check"),

    // ---- video frame sampling: explode fan-out ----
    Query(
      "q_m_frame_fanout",
      (s, _) => Multimodal.sampleFrames(Multimodal.syntheticMedia(s, N), 2)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_sampled"),
          sum(length(col("frame"))).as("frame_bytes")),
      Some(s"""WITH v AS (
             |  SELECT range AS media_id, 8 + range % 5 AS n_frames,
             |    800 + range % 100 AS body
             |  FROM range($N) WHERE range % 3 = 2)
             |SELECT media_id,
             |  CAST((n_frames + 1) // 2 AS BIGINT) AS n_sampled,
             |  CAST(((n_frames + 1) // 2) * (body // n_frames) AS BIGINT) AS frame_bytes
             |FROM v""".stripMargin),
      doc = "Multimodal frame sampling: body → n_frames chunks, keep every " +
        "2nd, one row per frame (the caption/embed fan-out); oracle counts " +
        "ceil(n/2) frames of floor(body/n) bytes each"),

    // ---- media near-dup pairs via feature banding (rows-only) ----
    Query(
      "q_m_embed_neardup",
      (s, _) => {
        import s.implicits._
        import graft.functions.VectorExpressions.cosine_sim
        // payloads → embeddings → the SAME banded near-dup skeleton the
        // text/vector modalities use. The base fixture has no duplicate
        // payloads (LCG bodies are id-unique), so plant 25 exact replicas
        // — re-uploaded media, the case a dedup pass exists for; their
        // byte histograms agree exactly, so they collide in every band
        // and survive the 0.999 rerank
        val base = Multimodal.syntheticMedia(s, N)
        val replicas = base.filter(_.media_id < 25)
          .map(r => Multimodal.MediaRow(r.media_id + N, r.kind, r.payload))
        val feats = Multimodal
          .extractFeatures(base.unionByName(replicas), dim = 16)
          .toDF()
        val banded = VectorSearch.withLshBands(feats, "embedding",
          nBands = 4, bitsPerBand = 8)
        banded.alias("a").join(banded.alias("b"),
            col("a.band") === col("b.band") &&
              col("a.band_val") === col("b.band_val") &&
              col("a.media_id") < col("b.media_id") &&
              col("a.kind") === col("b.kind"))
          .select(col("a.media_id").as("media_a"),
            col("b.media_id").as("media_b"), col("a.kind").as("kind"),
            (round(cosine_sim(col("a.embedding"), col("b.embedding")), 6)
              + lit(0.0)).as("sim"))
          .dropDuplicates("media_a", "media_b")
          .where(col("sim") >= 0.999)
          .groupBy("kind").agg(count(lit(1)).as("n_pairs"))
          .orderBy("kind")
      },
      oracle = None, // embedding has no SQL form; pinned in MultimodalSpec
      doc = "multimodal near-dup: stub embeddings -> LSH banding -> cosine " +
        "rerank (same skeleton as text/vector dedup); rows-only, per-kind " +
        "pair counts pinned in MultimodalSpec"),

    // ---- feature-extract → LSH band buckets (rows-only; no SQL form) ----
    Query(
      "q_m_embed_bucket_profile",
      (s, _) => {
        import s.implicits._
        val feats = Multimodal
          .extractFeatures(Multimodal.syntheticMedia(s, N), dim = 16)
          .toDF()
        VectorSearch.withLshBands(feats, "embedding", nBands = 4, bitsPerBand = 8)
          .groupBy("band")
          .agg(countDistinct(col("band_val")).as("n_buckets"),
            count(lit(1)).as("n_rows"))
          .orderBy("band")
      },
      oracle = None, // byte-histogram embedding has no closed SQL form;
                     // exact values pinned in MultimodalSpec (approx-twin convention)
      doc = "Multimodal feature extraction feeding VectorSearch: byte-histogram " +
        "embedding (stub for a vision encoder) → sign-LSH banding → bucket " +
        "profile; rows-only here, values pinned in MultimodalSpec")
  )
}
