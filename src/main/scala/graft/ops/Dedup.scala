package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Near-duplicate detection at corpus scale (north-star ops): MinHash+LSH
  * banding, SimHash blocking, and an exact inverted-index Jaccard join.
  *
  * All three share the contract: candidate generation is a pruning
  * optimization; every candidate pair is then VERIFIED with the exact
  * shingle-set Jaccard, so false positives never escape. Recall of the
  * pruning step is a tunable (bands × rows; hamming blocks) — parameters
  * below are chosen so that at similarity ≥ 0.8 the miss probability is
  * negligible (≤1e-14 for MinHash with 32 bands × 4 rows).
  *
  * Scale posture (100 TB): nothing here is all-pairs. MinHash/SimHash
  * reduce the quadratic candidate space to hash-bucket joins (shuffle on
  * band/block key, skew-safe because bucket population at a fixed
  * signature width is bounded w.h.p.); the exact join is an inverted-index
  * self-join on shingles — the classic SIGMOD formulation — whose cost is
  * Σ bucket².
  */
object Dedup {

  /** i-th hash of the MinHash family, applied to the shingle's 64-bit
    * base hash (NOT the string): xxhash64 seeded by the permutation index
    * over an 8-byte input. Hashing the string once and permuting the long
    * is ~an order of magnitude less work per (shingle × permutation) than
    * re-hashing the string 128 times, with the same independence
    * properties; and unlike the classic multiply-shift wraparound trick
    * it is safe under Spark 4's default ANSI overflow checking. */
  private def permuted(baseHash: Column, i: Int): Column =
    xxhash64(lit(i), baseHash)

  val NumHashes = 128
  val BandRows = 4
  val NumBands: Int = NumHashes / BandRows  // 32 bands × 4 rows

  /** MinHash signatures: input (docCol, shingleCol) exploded rows →
    * one row per doc with NumBands band-hash columns. Partial aggregation
    * (map-side min) means the shuffle carries one 128-long vector per doc
    * regardless of document size. */
  def minhashBands(exploded: DataFrame, docCol: String,
      shingleCol: String): DataFrame = {
    val hashed = exploded.select(col(docCol),
      xxhash64(col(shingleCol)).as("__h"))
    val mins = (0 until NumHashes).map(i =>
      min(permuted(col("__h"), i)).as(s"m$i"))
    val sig = hashed.groupBy(col(docCol))
      .agg(mins.head, mins.tail: _*)
    val bandCols = (0 until NumBands).map { j =>
      val rows = (0 until BandRows).map(r => col(s"m${j * BandRows + r}"))
      xxhash64(lit(j) +: rows: _*)
    }
    sig.select(col(docCol), array(bandCols: _*).as("bands"))
  }

  /** LSH candidate pairs: docs sharing ≥1 band signature. Returns
    * (a, b) with a < b, distinct. The join key is (band_idx, band_hash) —
    * an equi-join Catalyst shuffles on the composite key. */
  def lshCandidates(bands: DataFrame, docCol: String): DataFrame = {
    // materialize the signature table once: it feeds BOTH sides of the
    // self-join, and without this the whole upstream shingle+minhash
    // lineage is recomputed per side (measured 2-3x the query's cost).
    // On a multi-node cluster this is persist()/checkpoint() to survive
    // executor loss; locally localCheckpoint is the same cut.
    val ex = bands.select(col(docCol).as("doc"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
      .localCheckpoint(true)
    val x = ex.as("x"); val y = ex.as("y")
    x.join(y,
        col("x.band_idx") === col("y.band_idx") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc") < col("y.doc"))
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
  }

  /** 64-bit SimHash over xxhash64(shingle): per-bit ±1 vote sums, sign →
    * fingerprint bit. Input exploded (docCol, shingleCol) rows. */
  def simhash(exploded: DataFrame, docCol: String,
      shingleCol: String): DataFrame = {
    val h = xxhash64(col(shingleCol))
    val votes = (0 until 64).map(i =>
      sum(shiftright(h, i).bitwiseAND(1) * 2 - 1).as(s"v$i"))
    val sums = exploded.groupBy(col(docCol)).agg(votes.head, votes.tail: _*)
    val fp = (0 until 64).map(i =>
      when(col(s"v$i") > 0, lit(1L << i)).otherwise(0L))
      .reduce(_ + _)
    sums.select(col(docCol), fp.as("simhash"))
  }

  /** SimHash candidate pairs with Hamming distance ≤ maxHamming, found
    * by MULTI-INDEX HASHING (the 1-error-probe refinement of plain
    * pigeonhole blocking): split 64 bits into ⌊maxHamming/2⌋+1 blocks —
    * by pigeonhole, two fingerprints within the radius must have a
    * block differing in ≤1 bit — and join each document's EXACT block
    * values against every document's exact-plus-single-bit-flip probe
    * values. Recall 1.0 for the radius, like plain blocking, but the
    * blocks are ~9 bits wide instead of 64/(maxHamming+1): at radius 12
    * the plain scheme's 4-bit blocks give only 16 bucket values (every
    * 16th of the corpus collides per block — the "weak pruning" cost
    * this replaces), while 9-bit blocks spread over 512 values, cutting
    * bucket-join output ~8× for ~71 probe rows per document.
    *
    * Probe-side asymmetry is sufficient: for a pair differing ≤1 bit in
    * block j, the index side holds one doc's exact value and the other
    * doc's probe set contains exactly that value (its own value XOR the
    * differing bit, or the identical value). */
  def simhashCandidates(fps: DataFrame, docCol: String,
      maxHamming: Int): DataFrame = {
    val nBlocks = maxHamming / 2 + 1 // ⌊r/b⌋ ≤ 1 ⟺ b ≥ ⌊r/2⌋+1
    val width = 64 / nBlocks
    def blockAt(j: Int): (Column, Int) = {
      val lo = j * width
      val w = if (j == nBlocks - 1) 64 - lo else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      (shiftrightunsigned(col("simhash"), lo).bitwiseAND(mask), w)
    }
    // the vote-sum aggregate above feeds both sides — cut it once
    val pinned = fps.select(col(docCol).as("doc"), col("simhash"))
      .localCheckpoint(true)
    val exactBlocks = (0 until nBlocks).map(j => blockAt(j)._1)
    val index = pinned.select(col("doc"), col("simhash"),
      posexplode(array(exactBlocks: _*)).as(Seq("block_idx", "block_bits")))
    val probeEntries = (0 until nBlocks).flatMap { j =>
      val (bits, w) = blockAt(j)
      (bits +: (0 until w).map(i => bits.bitwiseXOR(lit(1L << i))))
        .map(v => struct(lit(j).cast("int").as("block_idx"),
          v.as("block_bits")))
    }
    val probes = pinned.select(col("doc"), col("simhash"),
        explode(array(probeEntries: _*)).as("p"))
      .select(col("doc"), col("simhash"),
        col("p.block_idx").as("block_idx"),
        col("p.block_bits").as("block_bits"))
    val x = index.as("x"); val y = probes.as("y")
    x.join(y,
        col("x.block_idx") === col("y.block_idx") &&
        col("x.block_bits") === col("y.block_bits") &&
        col("x.doc") < col("y.doc"))
      .filter(bit_count(col("x.simhash").bitwiseXOR(col("y.simhash")))
        <= maxHamming)
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
  }

  /** Canonical-keeper assignment over a near-dup pair graph: connected
    * components by iterative min-label propagation. Each round every node
    * adopts the minimum label among itself and its neighbors; converges
    * in O(component diameter) rounds (dup clusters are near-cliques, so
    * 2-3). Pure DataFrame joins — one shuffle per round, no driver-side
    * graph — each round's labels pinned with `persist` and materialized
    * by the convergence probe itself (one job per round; lineage nests
    * across the few rounds — on a real cluster swap in durable
    * `checkpoint` for a hard cut). This is the final
    * step of corpus dedup at 100 TB: pairs → clusters → keep min-id.
    *
    * Ids in `pairs` that do not appear in `docs` are DROPPED before
    * propagation (both endpoints must be present): a foreign id would
    * otherwise participate in label propagation and could surface as a
    * canonical_id no docs row owns. The guard is two semi-joins over the
    * edge set — edges are the sparse side (the dup pairs), so the cost
    * is negligible next to the propagation rounds.
    *
    * @return (doc_id, canonical_id) for EVERY id in `docs` (singletons
    *         map to themselves). */
  def canonicalIds(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 10): DataFrame = {
    val known = docs.select(col(idCol).as("__known_id"))
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionAll(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .join(known, col("u") === col("__known_id"), "left_semi")
      .join(known, col("v") === col("__known_id"), "left_semi")
      .localCheckpoint(true)
    // propagate only over nodes that appear in the pair graph: dup pairs
    // are a sparse subset of the corpus, so the iteration state is the
    // dup set, not the corpus (at 100 TB: millions of rows per round,
    // not billions). Singletons rejoin via the final left-join coalesce.
    // Init fuses the FIRST propagation step into the same shuffle the
    // plain `distinct()` init already paid (groupBy u ≡ distinct u):
    // label₀ = min(u, min direct neighbor) instead of u — one whole
    // round's join+aggregate+action removed at every scale, identical
    // fixpoint (r20; guide §1.2 "remove passes").
    var labels = edges.groupBy(col("u"))
      .agg(min(col("v")).as("nbr0"))
      .select(col("u").as("id"), least(col("u"), col("nbr0")).as("label"))
      .localCheckpoint(true)
    // monotone non-increasing label sum → cheap convergence probe; carry
    // the previous round's sum instead of re-aggregating it. sum() over
    // an empty label set (no pairs at all) is NULL → treat as 0.
    def labelSum(df: DataFrame): Long = {
      val row = df.agg(sum(col("label"))).head()
      if (row.isNullAt(0)) 0L else row.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    // ONE action per round: the convergence probe itself fills the
    // persisted blocks the next round reads (an eager localCheckpoint
    // here would run a second job per round just to pin them). persist
    // keeps lineage, so each round's plan nests the last — fine for the
    // O(diameter) ≤ maxIter rounds this converges in; on a multi-node
    // cluster swap in durable `checkpoint` for the hard cut. The
    // previous round's blocks are freed as soon as the new round is
    // materialized — iteration state never accumulates across rounds.
    var prevPersisted: DataFrame = null
    while (!converged && iter < maxIter) {
      val nbrMin = edges
        .join(labels, edges("v") === labels("id"))
        .groupBy(col("u")).agg(min(col("label")).as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("u"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nextSum = labelSum(next) // materializes next's blocks
      if (prevPersisted != null) prevPersisted.unpersist(false)
      prevPersisted = next
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
      iter += 1
    }
    docs.select(col(idCol))
      .join(labels.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("label"), col(idCol)).as("canonical_id"))
  }

  /** Exact inverted-index Jaccard self-join: explode shingles, equi-join
    * on the shingle, count common shingles per pair, compute
    * |∩| / (|A|+|B|-|∩|). No false negatives by construction.
    *
    * Two scale optimizations, both answer-preserving:
    *  - the join key is xxhash64(shingle) — an 8-byte shuffle key instead
    *    of a ~60-byte string (collision odds 2⁻⁶⁴ per shingle pair);
    *  - length-ratio prefilter inside the join condition: jaccard ≥ θ
    *    requires min(|A|,|B|) ≥ θ·max(|A|,|B|), so wildly different-sized
    *    docs never materialize as pairs. */
  def invertedIndexJaccard(docs: DataFrame, docCol: String,
      shinglesCol: String, threshold: Double): DataFrame = {
    val ex = docs.select(col(docCol).as("doc"),
        size(col(shinglesCol)).as("nsh"),
        explode(col(shinglesCol)).as("shingle"))
      .select(col("doc"), col("nsh"), xxhash64(col("shingle")).as("shash"))
      .localCheckpoint(true) // feeds both sides of the self-join
    val x = ex.as("x"); val y = ex.as("y")
    x.join(y, col("x.shash") === col("y.shash") &&
        col("x.doc") < col("y.doc") &&
        greatest(col("x.nsh"), col("y.nsh")).cast(DoubleType) * threshold
          <= least(col("x.nsh"), col("y.nsh")).cast(DoubleType))
      .groupBy(col("x.doc").as("doc_a"), col("y.doc").as("doc_b"),
        col("x.nsh").as("na"), col("y.nsh").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Prefix-filtered exact Jaccard self-join (AllPairs/PPJoin) — the
    * skew-scale path of [[invertedIndexJaccard]]. Prefix principle:
    * under ANY shared total order of shingles, two sets with |A∩B| ≥ α
    * must collide within their first |·|−α+1 elements; with J ≥ θ
    * forcing |A∩B| ≥ ⌈θ·|A|⌉, only each document's |d| − ⌈θ·|d|⌉ + 1
    * FIRST shingles need to be indexed — at θ=0.8 the index shrinks ~5×.
    * The shared order is ascending GLOBAL DOCUMENT FREQUENCY (rarest
    * first, the classic choice): ubiquitous shingles — the Σ bucket²
    * blowup of the plain index — never enter the index at all.
    * Candidate pairs are then verified with the exact Jaccard over the
    * pre-hashed sorted shingle arrays (8-byte tokens; same 2⁻⁶⁴
    * collision assumption the plain index's hashed join key makes).
    *
    * Measured trade: at sf0.1 (5000 docs, avg shingle df ≈ 9.6, no hot
    * keys) the plain index wins — 1.2 s vs 1.9 s — because a FLAT
    * frequency distribution leaves its count-based join cheap while
    * this path pays a frequency pass plus per-candidate verify. Under
    * duplication it inverts violently: on a 10× corpus where every
    * document is a 10-clique of copies (df ×10 ⇒ join output ×100),
    * the plain index ran >9 min while this path finished in 14 s on
    * the same machine. Dedup's real workload is the second case, so
    * the composite pipelines (clusters / keep_best / corpus_clean /
    * levenshtein) run on THIS path; the plain index remains as the
    * flat-profile baseline (`pipeline_dedup_ngram`).
    *
    * Exactness is preserved either way: output equals
    * [[invertedIndexJaccard]] row for row (the shared DuckDB all-pairs
    * oracle proves it). The threshold is a rational `thrNum/thrDen`
    * because the prefix length must be EXACT integer arithmetic — a
    * float ⌈θ·n⌉ (e.g. 0.8·35 = 28.000000000000004) rounds the prefix
    * one short and silently loses recall. */
  def prefixFilteredJaccard(docs: DataFrame, docCol: String,
      shinglesCol: String, thrNum: Int, thrDen: Int): DataFrame = {
    val threshold = thrNum.toDouble / thrDen
    // hashed sorted shingle sets, shared by index build + verification
    val base = docs.select(col(docCol).as("doc"),
        sort_array(transform(col(shinglesCol), s => xxhash64(s))).as("shh"))
      .localCheckpoint(true)
    val ex = base.select(col("doc"), size(col("shh")).as("nsh"),
      explode(col("shh")).as("shash"))
    // global shingle document frequency: the canonical rarity order.
    // FUSED into the index build as a window count over the shingle
    // hash — one shuffle of the exploded table, where a groupBy +
    // join-back costs that shuffle twice (measured ~15% of the whole
    // prefix path at sf0.1).
    val byShash = org.apache.spark.sql.expressions.Window
      .partitionBy("shash")
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("dfreq"), col("shash"))
    // prefix length n − ⌈num·n/den⌉ + 1; `div` is Spark's INTEGRAL
    // division (a `/` would detour through double, and the exactness
    // claim above is only true if this stays in integers end to end)
    val prefixLen = col("nsh") -
      expr(s"(nsh * $thrNum + ${thrDen - 1}) div $thrDen") + 1
    val prefix = ex.withColumn("dfreq", count(lit(1)).over(byShash))
      .withColumn("rank_rarity", row_number().over(byRarity))
      .filter(col("rank_rarity") <= prefixLen)
      .select("doc", "nsh", "shash")
      .localCheckpoint(true) // feeds both sides of the candidate join
    val x = prefix.as("x"); val y = prefix.as("y")
    val cands = x.join(y, col("x.shash") === col("y.shash") &&
        col("x.doc") < col("y.doc") &&
        // length-ratio prune in exact integer form: θ·max ≤ min
        greatest(col("x.nsh"), col("y.nsh")) * thrNum
          <= least(col("x.nsh"), col("y.nsh")) * thrDen)
      .select(col("x.doc").as("a"), col("y.doc").as("b"))
      .distinct()
    // exact verification on the hashed sorted sets (set semantics →
    // intersect/union sizes equal the string-array computation). Merge
    // hint: the array side's stats under-estimate its object size, and
    // an accidental broadcast of it is a driver-memory cliff (measured
    // at 10×) — the verify join must stay a shuffle join.
    val sa = base.select(col("doc").as("a"), col("shh").as("sha")).hint("merge")
    val sb = base.select(col("doc").as("b"), col("shh").as("shb")).hint("merge")
    cands.join(sa, "a").join(sb, "b")
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Two-sided (ingest) variant of [[prefixFilteredJaccard]]: exact
    * Jaccard ≥ θ pairs BETWEEN a standing corpus and a new batch — the
    * near-dup gate an incremental ingest runs on every delivery. The
    * scale point of a dedicated two-sided path: candidates come ONLY
    * from corpus-prefix × batch-prefix bucket collisions, so the
    * standing corpus is never self-joined again (re-running the
    * self-join on corpus+batch redoes O(corpus²) candidate work to
    * answer a question about the batch). Prefix math, rarity order,
    * length-ratio prune, and shuffle-pinned verify joins are identical
    * to the self-join path — the prefix principle is pair-symmetric and
    * does not care that the pair spans two datasets. The shared total
    * order both prefixes must agree on is document frequency over the
    * UNION (one window count, same single shuffle as the self-join). */
  def prefixFilteredJaccardCross(corpus: DataFrame, batch: DataFrame,
      docCol: String, shinglesCol: String, thrNum: Int,
      thrDen: Int): DataFrame = {
    val threshold = thrNum.toDouble / thrDen
    def prep(df: DataFrame, side: Int) = df.select(col(docCol).as("doc"),
      sort_array(transform(col(shinglesCol), s => xxhash64(s))).as("shh"),
      lit(side).as("side"))
    val base = prep(corpus, 0).unionAll(prep(batch, 1))
      .localCheckpoint(true) // feeds the shared-df index + both verify sides
    val ex = base.select(col("side"), col("doc"), size(col("shh")).as("nsh"),
      explode(col("shh")).as("shash"))
    val byShash = org.apache.spark.sql.expressions.Window
      .partitionBy("shash")
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("side", "doc").orderBy(col("dfreq"), col("shash"))
    val prefixLen = col("nsh") -
      expr(s"(nsh * $thrNum + ${thrDen - 1}) div $thrDen") + 1
    val prefix = ex.withColumn("dfreq", count(lit(1)).over(byShash))
      .withColumn("rank_rarity", row_number().over(byRarity))
      .filter(col("rank_rarity") <= prefixLen)
      .select("side", "doc", "nsh", "shash")
      .localCheckpoint(true) // feeds both sides of the candidate join
    val x = prefix.filter(col("side") === 0).as("x")
    val y = prefix.filter(col("side") === 1).as("y")
    val cands = x.join(y, col("x.shash") === col("y.shash") &&
        greatest(col("x.nsh"), col("y.nsh")) * thrNum
          <= least(col("x.nsh"), col("y.nsh")) * thrDen)
      .select(col("x.doc").as("a"), col("y.doc").as("b")).distinct()
    val sa = base.filter(col("side") === 0)
      .select(col("doc").as("a"), col("shh").as("sha")).hint("merge")
    val sb = base.filter(col("side") === 1)
      .select(col("doc").as("b"), col("shh").as("shb")).hint("merge")
    cands.join(sa, "a").join(sb, "b")
      .select(col("a").as("doc_corpus"), col("b").as("doc_batch"),
        TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Prefix-filtered exact CONTAINMENT self-join: ordered pairs (A, B)
    * with C(A,B) = |A∩B| / |A| ≥ θ — "A is θ-contained in B". The dedup
    * mode Jaccard misses: an excerpt quoted inside a larger document has
    * C(excerpt, doc) = 1 while its Jaccard can be arbitrarily low, so
    * symmetric near-dup never flags it.
    *
    * Asymmetric prefix principle: C(A,B) ≥ θ forces |A∩B| ≥ ⌈θ·|A|⌉, so
    * A must collide with B inside A's first |A| − ⌈θ·|A|⌉ + 1 shingles
    * under any shared total order (same pigeonhole as
    * [[prefixFilteredJaccard]]) — but B gets NO prefix: containment puts
    * no lower bound on |A∩B| relative to |B|, so the probe side indexes
    * every shingle. The candidate join is therefore A-prefix × B-full;
    * rarity order keeps it bounded (prefixes hold each document's RAREST
    * shingles, so the full side's matching buckets are small — the hot
    * shingles that blow up a full×full index never appear on the prefix
    * side). No length-ratio prune: containment is exactly the case
    * where sizes legitimately differ wildly.
    *
    * Same exactness contract as the Jaccard path: integer prefix math
    * (`thrNum/thrDen`), candidates verified with the exact intersection
    * over pre-hashed sorted sets, verify joins pinned to shuffle.
    *
    * EXACT-CLASS COLLAPSE (the scale move, probe-measured): containment
    * against a full-side index is hypersensitive to duplication — on a
    * 10× corpus of exact-copy 10-cliques the naive form ran 206 s vs
    * 2.4 s at 1× (every clique multiplies BOTH join sides; candidates
    * grow ×100 while true answers grow ×100 only in OUTPUT size). But
    * containment is a function of the shingle SET alone, so documents
    * with identical sets form equivalence classes: the quadratic work
    * runs once per distinct content (class representatives), within-class
    * ordered pairs are containment 1.0 by definition, and cross-class
    * results expand back member×member — output-bound, exactly the rows
    * the answer owes. Same 206 s probe: 5.6 s after the collapse. This
    * is the standard "exact-dedup before near-dup" staging of a corpus
    * pipeline, applied inside one operator.
    *
    * Constant-factor discipline: the whole collapse hangs off ONE pinned
    * table. Class key, set size, and representative (min doc over the
    * class window) are fused into a single pass — a groupBy + join-back
    * would pay the ckey shuffle twice and need separate pins for the
    * member list and the representative sets (the first cut did exactly
    * that: four localCheckpoints, 5.5 s at sf0.1; this shape runs the
    * same answer in half the jobs). `base` and the expansion sides are
    * cheap narrow filters re-read from the one pin. */
  def prefixFilteredContainment(docs: DataFrame, docCol: String,
      shinglesCol: String, thrNum: Int, thrDen: Int): DataFrame = {
    val threshold = thrNum.toDouble / thrDen
    // exact-content classes: key = hash of the sorted hashed shingle
    // set; rep = min doc per class via window (one ckey shuffle)
    val byClass = org.apache.spark.sql.expressions.Window
      .partitionBy("ckey")
    val members = docs.select(col(docCol).as("doc"),
        sort_array(transform(col(shinglesCol), s => xxhash64(s))).as("shh"))
      .withColumn("ckey", xxhash64(col("shh")))
      .withColumn("nsh", size(col("shh")))
      .withColumn("rep", min(col("doc")).over(byClass))
      .localCheckpoint(true) // the ONLY pin: feeds the index build, both
                             // verify sides, and both output expansions
    // one row per distinct content — the set the quadratic stage sees
    val base = members.filter(col("doc") === col("rep"))
      .select(col("doc"), col("nsh"), col("shh"))
    val ex = base.select(col("doc"), col("nsh"),
      explode(col("shh")).as("shash"))
    val byShash = org.apache.spark.sql.expressions.Window
      .partitionBy("shash")
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("dfreq"), col("shash"))
    val prefixLen = col("nsh") -
      expr(s"(nsh * $thrNum + ${thrDen - 1}) div $thrDen") + 1
    val prefix = ex.withColumn("dfreq", count(lit(1)).over(byShash))
      .withColumn("rank_rarity", row_number().over(byRarity))
      .filter(col("rank_rarity") <= prefixLen)
      .select(col("doc").as("a"), col("shash"))
    val full = ex.select(col("doc").as("b"), col("shash"))
    val cands = prefix.join(full, Seq("shash"))
      .filter(col("a") =!= col("b"))
      .select("a", "b").distinct()
    val sa = base.select(col("doc").as("a"), col("shh").as("sha")).hint("merge")
    val sb = base.select(col("doc").as("b"), col("shh").as("shb")).hint("merge")
    val repPairs = cands.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast(DoubleType) /
          size(col("sha")).cast(DoubleType)).as("containment"))
      .filter(col("containment") >= threshold)
    // within-class: exact copies contain each other with score exactly
    // 1.0 (|A∩A|/|A|); empty shingle sets excluded — 0/0 is NaN in both
    // engines and a NaN never clears the threshold
    val within = members.as("m1")
      .join(members.as("m2").hint("merge"),
        col("m1.rep") === col("m2.rep") && col("m1.doc") =!= col("m2.doc"))
      .filter(col("m1.nsh") > 0)
      .select(col("m1.doc").as("doc_a"), col("m2.doc").as("doc_b"),
        lit(1.0).as("containment"))
    // cross-class: expand each representative pair to all member pairs —
    // containment depends only on the shingle sets, so the score carries
    val across = repPairs
      .join(members.select(col("rep").as("a"), col("doc").as("doc_a"))
        .hint("merge"), Seq("a"))
      .join(members.select(col("rep").as("b"), col("doc").as("doc_b"))
        .hint("merge"), Seq("b"))
      .select(col("doc_a"), col("doc_b"), col("containment"))
    within.unionAll(across)
  }
}
