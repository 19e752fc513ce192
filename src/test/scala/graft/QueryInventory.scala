package graft

/** Dev-only: regenerates QUERIES.md from the declared query metadata.
  * Run: sbt "Test/runMain graft.QueryInventory"
  */
object QueryInventory {
  def main(args: Array[String]): Unit = {
    val packs: Seq[(String, QueryPack)] = Seq(
      "Relational & set ops" -> queries.Relational,
      "Keyed time series" -> queries.TimeSeriesQueries,
      "Recursive indicators" -> queries.IndicatorQueries,
      "Text analysis & corpus cleaning" -> queries.TextQueries,
      "Similarity search (embeddings)" -> queries.VectorQueries,
      "Near-duplicate dedup" -> queries.DedupQueries,
      "Ingest (JSON edge)" -> queries.IngestQueries,
      "Serving path" -> queries.ServingQueries,
      "Feature frame & eval" -> queries.FeatureQueries,
      "SQL text surface" -> queries.SqlQueries,
      "Scale variants" -> queries.ApproxQueries,
      "Multimodal" -> queries.MultimodalQueries,
      "Deterministic sampling" -> queries.SamplingQueries,
      "Corpus curation" -> queries.CurationQueries)
    val sb = new StringBuilder
    sb.append("# QUERIES — the declared operator surface\n\n")
    sb.append("Auto-generated from `SparkEntry` metadata ")
    sb.append("(`sbt \"Test/runMain graft.QueryInventory\"`).\n")
    sb.append("Oracle = hash-compared to DuckDB at sf0.01; rows-only = no closed SQL form ")
    sb.append("(covered by ScalaTest instead).\n")
    var total = 0; var withOracle = 0
    packs.foreach { case (title, pack) =>
      sb.append(s"\n## $title\n\n| query | oracle | what |\n|---|---|---|\n")
      pack.queries.foreach { q =>
        total += 1
        val o = if (q.oracle.isDefined) { withOracle += 1; "hash" } else "rows-only"
        sb.append(s"| `${q.name}` | $o | ${q.doc.replace("|", "\\|")} |\n")
      }
    }
    sb.insert(sb.indexOf("\n\n") , s"\n\n**$total queries, $withOracle oracle-checked.**")
    java.nio.file.Files.writeString(java.nio.file.Paths.get("QUERIES.md"), sb.toString)
    println(s"wrote QUERIES.md: $total queries, $withOracle with oracle")
  }
}
