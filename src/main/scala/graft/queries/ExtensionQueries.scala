package graft.queries

/** Extension operators (similarity search, dedup suite, text analysis,
  * UDF/UDAF/UDTF) — populated incrementally; see Dedup/Similarity/
  * TextAnalysis operator modules.
  */
object ExtensionQueries {
  val all: Seq[GraftQuery] = Seq()
}
