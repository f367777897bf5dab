package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis primitives for training-data pipelines (north-star ops,
  * SURVEY.md §7.2 step 7): tokenization, shingling, quality stats,
  * fingerprinting. All pure Catalyst expressions (built-ins + higher-order
  * functions) — no UDFs, no driver-side loops; every op is a per-row map
  * that scales embarrassingly.
  */
object TextOps {

  /** Whitespace tokenization. Kept as a single-space split so the DuckDB
    * oracle (`string_split(text, ' ')`) is exactly equivalent. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles, distinct, first-occurrence order. Uses the
    * native one-pass expression (graft.functions.WordShinglesExpr);
    * [[shinglesHof]] is the built-ins-only twin, pinned equal by test. */
  def shingles(words: Column, n: Int): Column =
    graft.functions.TextExpressions.wordShingles(words, n)

  /** Built-ins-only shingling (transform/slice/concat_ws/array_distinct),
    * kept as the reference semantics for differential testing. */
  def shinglesHof(words: Column, n: Int): Column = {
    val idx = sequence(lit(1), size(words) - lit(n - 1))
    val grams = transform(idx, i => concat_ws(" ", slice(words, i, lit(n))))
    when(size(words) >= n, array_distinct(grams))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Exact Jaccard similarity of two shingle arrays (already distinct):
    * |A∩B| / |A∪B| as double — int/int division, bit-identical in any
    * engine computing the same sets. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Number of tokens from `toks` that appear in a fixed marker list —
    * occurrence count, not distinct (language-ID / stopword scoring). */
  def markerHits(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** Canonical bag-of-words fingerprint: md5 over the sorted distinct
    * token list. Robust to word order — catches shuffled near-copies that
    * byte-level hashing misses. */
  def bagFingerprint(words: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words))))
}
