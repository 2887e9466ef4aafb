package graft.queries

/** LLM-data-pipeline extension operators (dedup, similarity search, text
  * analysis) over the documents/embeddings tables. Populated by task #4;
  * empty placeholder keeps SparkEntry wiring stable.
  */
object ExtensionQueries {
  val all: Seq[QueryDef] = Seq.empty
}
