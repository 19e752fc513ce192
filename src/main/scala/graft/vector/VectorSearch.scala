package graft.vector

import graft.functions.VectorExpressions.{cosine_sim, lsh_signature}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, mirroring what a 100 TB training-data pipeline needs:
  *  - `cosineTopK`: exact brute force — broadcast the (single) query
  *    vector, one map-only cosine pass, global top-k via orderBy+limit
  *    (Catalyst plans TakeOrderedAndProject: per-partition heaps + a k-row
  *    driver merge, never a full sort/shuffle of the corpus).
  *  - `annCandidates`/`annTopK`: LSH-banded approximate path — one
  *    sign-random-projection signature per vector, split into bands;
  *    candidates are vectors sharing ANY band with the query (the classic
  *    banding OR-amplification), then exact cosine rerank on the small
  *    candidate set. The band join shuffles on (band, band_value) — never
  *    all-pairs, which is the property that survives a 100× scale-up.
  */
object VectorSearch {

  /** Exact cosine top-k of `vecs` against the single row in `query`. */
  def cosineTopK(vecs: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(query.select(col(vecCol).as("__qv")))
    vecs.crossJoin(q)
      .select(col(idCol),
        (round(cosine_sim(col(vecCol), col("__qv")), 6) + lit(0.0)).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Adds `band` (0..nBands-1) and `band_val` columns: the signature is
    * computed ONCE per row (one codegen'd expression), then exploded into
    * nBands bit-slices. Output has nBands rows per input row.
    */
  def withLshBands(df: DataFrame, vecCol: String, nBands: Int,
      bitsPerBand: Int): DataFrame = {
    val sig = lsh_signature(col(vecCol), nBands * bitsPerBand)
    df.withColumn("__sig", sig)
      .select(col("*"), explode(sequence(lit(0), lit(nBands - 1))).as("band"))
      .withColumn("band_val",
        expr(s"shiftright(__sig, $bitsPerBand * band)")
          .bitwiseAND(lit((1L << bitsPerBand) - 1)))
      .drop("__sig")
  }

  /** Distinct ids sharing at least one LSH band with the query vector. */
  def annCandidates(vecs: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, nBands: Int, bitsPerBand: Int): DataFrame = {
    val banded = withLshBands(vecs, vecCol, nBands, bitsPerBand)
    val qBands = broadcast(
      withLshBands(query, vecCol, nBands, bitsPerBand)
        .select(col("band").as("__qband"), col("band_val").as("__qval")))
    banded
      .join(qBands, col("band") === col("__qband") &&
        col("band_val") === col("__qval"))
      .select(col(idCol), col(vecCol)).distinct()
  }

  /** LSH-bucketed ANN: candidate generation + exact cosine rerank. */
  def annTopK(vecs: DataFrame, query: DataFrame, idCol: String,
      vecCol: String, k: Int, nBands: Int, bitsPerBand: Int): DataFrame =
    cosineTopK(
      annCandidates(vecs, query, idCol, vecCol, nBands, bitsPerBand),
      query, idCol, vecCol, k)
}
