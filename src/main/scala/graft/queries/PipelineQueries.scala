package graft.queries

import graft.GraftQuery

/** LLM-training-data pipeline operators (dedup, similarity search, text
  * analysis, multimodal plumbing) — filled in build step §7.2.7. */
object PipelineQueries {
  val all: Seq[GraftQuery] = Seq()
}
