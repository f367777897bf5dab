package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE tokenizer TRAINING — the merge-rule learning step in front of
  * every `pipeline_token_count_bpe`-style tokenizer application.
  *
  * Classic Sennrich-style loop over the word vocabulary: count adjacent
  * symbol pairs weighted by word frequency, merge the most frequent
  * pair everywhere, repeat. Everything is engine-portable integer/string
  * logic so DuckDB replays the whole train bit for bit:
  *
  *   - the word vocab carries exact counts (one groupBy);
  *   - the best pair is a global top-1 by (count DESC, pair ASC) —
  *     total order, no RNG, heap-based TakeOrderedAndProject, and the
  *     one-row result broadcasts back (same posture as k-means
  *     centroids);
  *   - the merge applies GREEDY LEFT-TO-RIGHT NON-OVERLAPPING, the real
  *     BPE rule, via pure window arithmetic: positions whose (s[i],
  *     s[i+1]) matches the pair form runs; within each maximal run of
  *     consecutive matches only even offsets merge (a run "a a a a"
  *     under pair (a,a) becomes "aa aa", not "aa a a"). Runs are
  *     gaps-and-islands (pos − row_number), parity is an integer mod —
  *     no sequential fold, no UDF, identical in any engine.
  *
  * Scale posture: all state is vocabulary-sized (words × symbols), tiny
  * relative to the corpus at any scale — the corpus is touched ONCE for
  * the initial word count. Each round's vocab is checkpointed because it
  * feeds two branches (pair stats + merge application); without the cut
  * the whole chain re-expands 2^rounds.
  */
object Bpe {

  /** Word vocabulary with exact counts and per-character symbol arrays.
    * Char split via regexp `(.)` → `$1 ` + split + drop the trailing
    * empty — the one formulation DuckDB's regexp_replace('g') mirrors
    * exactly. */
  def initVocab(docs: DataFrame): DataFrame =
    docs.groupBy("word").agg(sum(col("wc")).as("wc"))
      .withColumn("syms",
        filter(split(regexp_replace(col("word"), "(.)", "$1 "), " "),
          x => x =!= ""))

  /** Adjacent-pair statistics: (p1, p2, cnt) weighted by word count. */
  def pairStats(vocab: DataFrame): DataFrame = {
    val w = Window.partitionBy("word").orderBy("i")
    vocab.select(col("word"), col("wc"), posexplode(col("syms")).as(Seq("i", "s")))
      .withColumn("s2", lead(col("s"), 1).over(w))
      .filter(col("s2").isNotNull)
      .groupBy(col("s").as("p1"), col("s2").as("p2"))
      .agg(sum(col("wc")).as("cnt"))
  }

  /** The merge rule this round learns: global top-1 by (cnt DESC,
    * p1, p2) — a deterministic total order. */
  def bestPair(vocab: DataFrame): DataFrame =
    pairStats(vocab).orderBy(col("cnt").desc, col("p1"), col("p2")).limit(1)

  /** One training round: learn the best pair, merge it greedily
    * left-to-right in every word, return (newVocab, mergeRow). When no
    * pair exists (every word already a single symbol) the round is a
    * NO-OP — without the guard the crossJoin against a 0-row rule
    * would silently annihilate the vocabulary. */
  def mergeRound(vocab: DataFrame): (DataFrame, DataFrame) = {
    val best = bestPair(vocab).localCheckpoint(true)
    if (best.isEmpty) return (vocab, best)
    val w = Window.partitionBy("word").orderBy("i")
    val pos = vocab.crossJoin(broadcast(best))
      .select(col("word"), col("wc"), col("p1"), col("p2"),
        posexplode(col("syms")).as(Seq("i", "s")))
      .withColumn("m",
        (col("s") === col("p1")) &&
          (lead(col("s"), 1).over(w) === col("p2")))
    // greedy L-to-R within runs of consecutive matches: island id =
    // i − row_number over match positions; offsets 0,2,4… merge
    val wm = Window.partitionBy("word", "grp").orderBy("i")
    val merges = pos.filter(col("m"))
      .withColumn("grp",
        col("i") - row_number().over(Window.partitionBy("word").orderBy("i")))
      .withColumn("take", (row_number().over(wm) - 1) % 2 === 0)
      .filter(col("take"))
      .select(col("word").as("mw"), col("i").as("mi"))
    val prev = merges.select(col("mw").as("pw"), (col("mi") + 1).as("pi"))
    val rebuilt = pos
      .join(merges, col("word") === col("mw") && col("i") === col("mi"),
        "left")
      .join(prev, col("word") === col("pw") && col("i") === col("pi"),
        "left")
      .withColumn("ns",
        when(col("mi").isNotNull, concat(col("p1"), col("p2")))
          .when(col("pi").isNotNull, lit(null).cast(StringType))
          .otherwise(col("s")))
      .filter(col("ns").isNotNull)
      .groupBy(col("word"), col("wc"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("ns")))),
        e => e.getField("ns")).as("syms"))
    (rebuilt.localCheckpoint(true), best)
  }

  /** Full train: the per-round merge rules and the final segmented
    * vocabulary — (rules: (round, p1, p2, cnt), vocab: (word, wc,
    * syms)). */
  def trainFull(wordCounts: DataFrame, rounds: Int)
      : (DataFrame, DataFrame) = {
    var vocab = initVocab(wordCounts).localCheckpoint(true)
    var out: Seq[DataFrame] = Nil
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val (v, best) = mergeRound(vocab)
      vocab = v
      // exhausted vocab: stop instead of re-running pair stats on an
      // unchanged vocab every remaining round (0-row rule = no-op)
      exhausted = best.isEmpty
      if (!exhausted)
        out = out :+ best.select(lit(r.toLong).as("round"), col("p1"),
          col("p2"), col("cnt"))
      r += 1
    }
    (out.reduceOption(_ unionAll _)
      .getOrElse(bestPair(vocab)
        .select(lit(0L).as("round"), col("p1"), col("p2"), col("cnt"))
        .limit(0)),
      vocab)
  }

  /** `rounds` merge rules learned from a (word, wc) frame:
    * (round, p1, p2, cnt). Rounds past the last learnable merge
    * contribute no rule row (see the mergeRound no-op guard). */
  def train(wordCounts: DataFrame, rounds: Int): DataFrame =
    trainFull(wordCounts, rounds)._1
}
