package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy sequence packing — the batch-assembly step of a pretraining
  * pipeline: documents are folded, in deterministic order, into fixed
  * token-capacity bins ("rows of the training batch"); a document that
  * does not fit the remainder of the open bin starts a new one, and a
  * document longer than the capacity gets a bin of its own with a
  * truncation flag.
  *
  * Packing is inherently a sequential fold (bin state threads through the
  * document order), so it CANNOT be a window function — this is the one
  * operator family where `mapGroups` over sorted groups is the honest
  * Spark expression (SURVEY §7.3 escalation path (d)). Parallelism comes
  * from sharding: each shard packs independently, so at 100 TB the fold
  * runs once per shard (source / day / bucket), embarrassingly parallel
  * across executors, with only (doc_id, n_tokens) — two longs per doc —
  * ever entering the shuffle. The text itself never moves.
  */
object Packing {

  /** One document's packing decision. */
  final case class Packed(
      doc_id: Long,
      shard: Long,
      bin_idx: Long,
      tok_offset: Long,
      n_tokens: Long,
      truncated: Boolean)

  /** Encoder input row — public because Catalyst's generated
    * deserializer must instantiate it (a private case class fails
    * janino's access check at runtime). */
  final case class DocLen(doc_id: Long, shard: Long, n_tokens: Long)

  /** Greedy first-fit fold per shard, documents in ascending doc_id order.
    *
    * Semantics (mirrored exactly by the DuckDB recursive-CTE oracle):
    *   - a doc is placed at the current fill offset if it fits
    *     (`offset + n <= capacity`), else a new bin opens at offset 0;
    *   - after placing, fill = min(offset + n, capacity) — an oversize
    *     doc (n > capacity) therefore fills its bin exactly and the next
    *     doc always opens a fresh bin;
    *   - `truncated` marks the oversize docs (the part past `capacity`
    *     would be cut when materializing the batch).
    *
    * `docs` must have columns (doc_id, shard, n_tokens); uniqueness of
    * doc_id within a shard makes the sort — and thus the fold — total.
    */
  def packGreedy(docs: DataFrame, capacity: Long)(
      implicit s: SparkSession): Dataset[Packed] = {
    import s.implicits._
    docs.select(col("doc_id").cast("long").as("doc_id"),
        col("shard").cast("long").as("shard"),
        col("n_tokens").cast("long").as("n_tokens"))
      .as[DocLen]
      .groupByKey(_.shard)
      .flatMapSortedGroups(col("doc_id").asc) { (shard, it) =>
        var bin = 0L
        var fill = 0L
        var first = true
        it.map { d =>
          if (!first && fill + d.n_tokens > capacity) { bin += 1; fill = 0L }
          first = false
          val offset = fill
          fill = math.min(offset + d.n_tokens, capacity)
          Packed(d.doc_id, shard, bin, offset, d.n_tokens,
            truncated = d.n_tokens > capacity)
        }
      }
  }
}
