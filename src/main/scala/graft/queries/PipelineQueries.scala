package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.ops.{Dedup, Sampling, TextOps, VectorOps}
import graft.sources.Readers.table

/** LLM-training-data pipeline operators (the north star beyond the
  * reference's surface): deduplication (exact, MinHash+LSH, SimHash,
  * exact n-gram Jaccard, embedding cosine), similarity search (brute-force
  * top-k baseline, label-partitioned IVF path, hyperplane-LSH buckets),
  * and text analysis (stats, quality, language-ID, fingerprinting) —
  * every oracle-checkable op differentially verified against DuckDB.
  *
  * Shared determinism trick for the near-dup family: LSH/blocking only
  * GENERATES candidates; every pair is verified with the exact shingle
  * Jaccard before output, so three different algorithms (MinHash bands,
  * SimHash pigeonhole blocks, exact inverted index) all converge on the
  * same oracle answer — a strong differential test of the pruning logic.
  */
object PipelineQueries {

  /** Near-dup Jaccard threshold as a rational (exact integer prefix
    * arithmetic needs num/den) with its double twin derived, never
    * written separately, and interpolated into every oracle string —
    * change it in ONE place and Spark + DuckDB move together. */
  private val ThresholdNum = 4
  private val ThresholdDen = 5
  private val Threshold = ThresholdNum.toDouble / ThresholdDen

  /** documents → (doc_id, sh 3-gram shingles).
    * Materialized eagerly by default: every current consumer fans it into
    * 2-4 plan branches (self-join sides, the verify step, label
    * propagation), and without the cut Spark recomputes tokenize+shingle
    * per branch — measured at 2-3x the whole query's runtime. At cluster
    * scale this is the `.persist()` on the shared pipeline prefix
    * (SURVEY §3.2). Pass `materialize = false` from any future
    * single-branch consumer — an eager cut there would only block
    * pushdown and add block-manager pressure for no reuse.
    * Projects to (doc_id, sh) BEFORE the pin (r20; guide §2.3 "project
    * before the exchange"): no consumer of the materialized frame reads
    * `text` or the token array — the queries that need text (quality
    * ranks, Levenshtein) re-read the documents scan — so carrying them
    * through the checkpoint doubled the pinned bytes for nothing. */
  private def docShingles(s: SparkSession, dir: String,
      materialize: Boolean = true): DataFrame = {
    val w = TextOps.tokens(col("text"))
    val df = table(s, dir, "documents")
      .select(col("doc_id"), TextOps.shingles(w, 3).as("sh"))
    if (materialize) df.localCheckpoint(true) else df
  }

  /** Shingle-derivation CTE bodies over a parameterized source relation —
    * ONE copy of the load-bearing 3-gram arithmetic, shared by the full
    * oracle (src = documents) and the cap-gated twin (src = samp); a fix
    * applied here reaches both ground truths. */
  private def shingleCtesFrom(src: String): String = s"""
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM $src),
      s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t)"""

  /** DuckDB twin of docShingles. */
  private val ShingleCte = "\n      WITH" + shingleCtesFrom("documents")

  /** Exact all-pairs Jaccard pair join + final projection — the shared
    * tail of the full and cap-gated oracles. */
  private val JaccardPairSelect = s""",
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_intersect(a.sh, b.sh)) * 1.0 /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
            FROM s a JOIN s b ON a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, jaccard FROM p WHERE jaccard >= $Threshold
      ORDER BY doc_a, doc_b"""

  /** The one true near-dup answer: all pairs with exact shingle Jaccard ≥
    * 0.8 (25 planted pairs at sf0.01, clean margin — next pair is at 0.1). */
  private val AllPairsJaccardOracle = ShingleCte + JaccardPairSelect

  /** Caps for the three exact ground-truth BASELINES whose plans are
    * deliberately superlinear (flat inverted index Σdf², brute O(n²)
    * cosine, per-pair Levenshtein DP). Each baseline runs on a
    * deterministic hash-capped slice (Sampling.capThreshold): the caps
    * sit ABOVE every tracked sf (sf0.1 = 5,000 docs / 2,000 vectors)
    * so at test scale the gate keeps 100% of rows and the queries
    * remain the full exact baselines their pruned twins
    * (pipeline_dedup_prefix / pipeline_knn_ivf / banded candidates)
    * are judged against — but on a 10×-and-beyond corpus the slice
    * binds, bounding the quadratic stage by cap² INDEPENDENT of corpus
    * size. The oracle replays the identical integer threshold, so the
    * differential check stays exact at every scale. */
  private val BaselineDocCap = 8000L
  private val BaselineVecCap = 4000L
  private val BaselinePairCap = 5000L

  /** Embeddings restricted to the deterministic ≤[[BaselineVecCap]]
    * hash slice — the r8 cap-gate, applied in r16 to the three
    * registry-scale recall audits (pq/opq/ivfpq) whose exact
    * baselines scan the corpus per query: above every tracked sf the
    * gate keeps 100% of vectors (full exact audit); beyond, the audit
    * sample stays cap-bounded while the production queries they grade
    * (embed_pq / embed_opq / ivfpq_search) remain full-corpus. */
  private def cappedEmb(s: SparkSession, dir: String): DataFrame = {
    val emb = table(s, dir, "embeddings")
    val thr = Sampling.capThreshold(BaselineVecCap, emb.count())
    emb.filter(Sampling.hash32(col("vec_id")) < lit(thr))
  }

  /** DuckDB twin of [[cappedEmb]] spliced into a shared oracle CTE
    * chain: rewrites the chain's base `FROM embeddings` relation to
    * the identical hash slice, so the differential check replays the
    * gate exactly at every scale. Loud if the chain's shape drifts. */
  private def vecCapGated(ctes: String): String = {
    val gated = ctes.replace("FROM embeddings)",
      s"""FROM embeddings
             WHERE ${Sampling.hash32Sql("vec_id")} <
               ${Sampling.capThresholdSql(BaselineVecCap,
                 "SELECT COUNT(*) FROM embeddings")})""")
    require(gated != ctes,
      "cap-gate rewrite found no 'FROM embeddings)' base relation")
    gated
  }

  /** docShingles over the deterministic ≤cap document slice (the
    * baseline gate). Filter runs BEFORE tokenize/shingle so the gated
    * query never materializes shingles it will drop. */
  private def cappedShingles(s: SparkSession, dir: String, cap: Long)
      : DataFrame = {
    val thr = Sampling.capThreshold(cap, table(s, dir, "documents").count())
    val w = TextOps.tokens(col("text"))
    table(s, dir, "documents")
      .filter(Sampling.hash32(col("doc_id")) < lit(thr))
      // (doc_id, sh) only — the sole consumer (the gated inverted-index
      // baseline) never reads text or the token array (r20; guide §2.3)
      .select(col("doc_id"), TextOps.shingles(w, 3).as("sh"))
      .localCheckpoint(true)
  }

  /** DuckDB twin of cappedShingles — ShingleCte over the same slice. */
  private def cappedShingleCte(cap: Long): String = s"""
      WITH samp AS (SELECT doc_id, text FROM documents
        WHERE ${Sampling.hash32Sql("doc_id")} <
          ${Sampling.capThresholdSql(cap, "SELECT COUNT(*) FROM documents")}),""" +
    shingleCtesFrom("samp")

  /** Exact Jaccard verification of candidate (a, b) pairs → oracle shape.
    * The shingle-array side carries ~kB rows: its byte size is grossly
    * under-estimated by plan stats (array object expansion), so left to
    * itself Catalyst may BROADCAST it — measured as a driver-memory
    * cliff on a 10× corpus. The merge hint pins a shuffle join: both
    * sides partition on the id, nothing fat ever broadcasts. */
  private def verifyPairs(cands: DataFrame, docs: DataFrame): DataFrame = {
    val sa = docs.select(col("doc_id").as("a"), col("sh").as("sha")).hint("merge")
    val sb = docs.select(col("doc_id").as("b"), col("sh").as("shb")).hint("merge")
    cands.join(sa, "a").join(sb, "b")
      .select(col("a").as("doc_a"), col("b").as("doc_b"),
        TextOps.jaccard(col("sha"), col("shb")).as("jaccard"))
      .filter(col("jaccard") >= Threshold)
      .orderBy("doc_a", "doc_b")
  }

  // -------------------------------------------------------------------
  // Dedup family
  // -------------------------------------------------------------------
  private val dedupExact = GraftQuery(
    name = "pipeline_dedup_exact",
    doc = "Exact dedup via content hash: group by md5(text), keep the " +
      "minimum doc_id as survivor. Hash-groupBy — one shuffle on a " +
      "32-byte key regardless of document size; the standard first pass " +
      "of every corpus dedup at 100 TB.",
    oracle = Some("""
      SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text) ORDER BY keeper_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
      .orderBy("keeper_id"))

  private val dedupMinhash = GraftQuery(
    name = "pipeline_dedup_minhash",
    doc = "MinHash+LSH near-dup: 3-gram shingles → 128 multiply-shift " +
      "permutations of one xxhash64 (map-side min, one 128-long vector " +
      "per doc through the shuffle) → 32 bands × 4 rows → bucket " +
      "self-join → exact-Jaccard verification. Candidate generation is " +
      "O(Σ bucket²) not O(n²); miss probability at sim 0.9 is " +
      "(1-0.9⁴)³² ≈ 1e-14. Oracle = exact all-pairs Jaccard ≥ 0.8.",
    oracle = Some(AllPairsJaccardOracle),
    run = (s, dir) => {
      val docs = docShingles(s, dir)
      val exploded = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val bands = Dedup.minhashBands(exploded, "doc_id", "shingle")
      val cands = Dedup.lshCandidates(bands, "doc_id")
      verifyPairs(cands, docs)
    })

  private val dedupSimhash = GraftQuery(
    name = "pipeline_dedup_simhash",
    doc = "SimHash near-dup: 64-bit sign-of-vote fingerprint over shingle " +
      "hashes; candidates via MULTI-INDEX HASHING (7 blocks of 9-10 " +
      "bits + single-bit-flip probes — Hamming ≤ 12 guarantees a block " +
      "with ≤1 differing bit, recall 1.0 at the radius, NOT " +
      "probabilistic); verified with exact Jaccard. Same oracle as " +
      "MinHash — two independent algorithms, one answer. The radius " +
      "must be 12 on this corpus (jaccard-0.9 pairs reach Hamming " +
      "12/64); plain (maxHamming+1)-block pigeonhole at that radius " +
      "means 4-bit blocks — 16 bucket values, 1/16 of the corpus " +
      "colliding per block — which MIH's wide blocks replace at the " +
      "cost of ~71 probe rows per document.",
    oracle = Some(AllPairsJaccardOracle),
    run = (s, dir) => {
      val docs = docShingles(s, dir)
      val exploded = docs.select(col("doc_id"), explode(col("sh")).as("shingle"))
      val fps = Dedup.simhash(exploded, "doc_id", "shingle")
      val cands = Dedup.simhashCandidates(fps, "doc_id", maxHamming = 12)
      verifyPairs(cands, docs)
    })

  private val dedupNgram = GraftQuery(
    name = "pipeline_dedup_ngram",
    doc = "Exact n-gram Jaccard dedup via inverted-index self-join " +
      "(explode shingles, equi-join on shingle, count common per pair): " +
      "zero false negatives by construction; cost Σ df² over shingle " +
      "document frequency. BASELINE — wins on flat frequency profiles " +
      "(1.2s vs prefix 1.9s at sf0.1) but goes quadratic under " +
      "duplication (>9min on a 10× 10-clique corpus where " +
      "pipeline_dedup_prefix took 14s), so it is GATED: the input is a " +
      "deterministic hash-capped slice (cap 8000 docs, above every " +
      "tracked sf — the full exact baseline at test scale, a bounded " +
      "cap²-cost audit sample beyond; oracle replays the identical " +
      "threshold). The composite pipelines run on the prefix path. " +
      "Third algorithm, same oracle at every tracked sf.",
    oracle = Some(cappedShingleCte(BaselineDocCap) + JaccardPairSelect),
    run = (s, dir) =>
      Dedup.invertedIndexJaccard(cappedShingles(s, dir, BaselineDocCap),
        "doc_id", "sh", Threshold).orderBy("doc_a", "doc_b"))

  private val dedupPrefix = GraftQuery(
    name = "pipeline_dedup_prefix",
    doc = "Prefix-filtered exact Jaccard (AllPairs/PPJoin): only each " +
      "document's |d|−⌈θ·|d|⌉+1 globally-rarest shingles enter the " +
      "index — any θ-pair must still collide there (prefix principle " +
      "holds under any shared total order), so recall stays 1.0 while " +
      "ubiquitous shingles (the Σ df² blowup of the plain index " +
      "under skew) never generate candidates. Candidates verified with " +
      "the exact Jaccard over pre-hashed sorted shingle sets. Fourth " +
      "algorithm, same oracle as minhash/simhash/ngram — four " +
      "independent pruning strategies, one exact answer. Measured: " +
      "1.9s vs plain 1.2s at sf0.1 (flat profile), 14s vs plain >9min " +
      "on a 10× duplication-heavy corpus — dedup exists for the " +
      "latter, so the composite pipelines run on THIS path.",
    oracle = Some(AllPairsJaccardOracle),
    run = (s, dir) =>
      Dedup.prefixFilteredJaccard(docShingles(s, dir), "doc_id", "sh",
        ThresholdNum, ThresholdDen).orderBy("doc_a", "doc_b"))

  private val dedupContainment = GraftQuery(
    name = "pipeline_dedup_containment",
    doc = "Asymmetric CONTAINMENT dedup: ordered pairs where |A∩B|/|A| " +
      ">= 0.8 - the excerpt/quotation mode symmetric Jaccard cannot " +
      "see (an excerpt inside a larger doc has containment 1.0 and " +
      "Jaccard near |A|/|B|). The corpus is documents plus one planted " +
      "half-length excerpt per doc_id%20 doc, so the one-way case is " +
      "provably live: every excerpt flags against its source, never " +
      "the reverse. Prefix filter applies on the contained side only " +
      "(B gets no size bound - that asymmetry IS the semantics); " +
      "candidates verify with the exact intersection; one double " +
      "division of two ints keeps the score bit-identical in DuckDB.",
    oracle = Some(s"""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000,
               array_to_string(list_slice(string_split(text, ' '), 1,
                 (len(string_split(text, ' ')) + 1) // 2), ' ')
        FROM documents WHERE doc_id % 20 = 0),
      t AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
      s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM t),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh)
                AS containment
            FROM s a JOIN s b ON a.doc_id <> b.doc_id)
      SELECT doc_a, doc_b, containment FROM p
      WHERE containment >= $Threshold
      ORDER BY doc_a, doc_b"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
      val toks = TextOps.tokens(col("text"))
      val excerpts = docs.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 10000L).as("doc_id"),
          array_join(slice(toks, lit(1),
            // (n+1) div 2 — double-divide then int-cast truncates like
            // floor for non-negative n, matching the oracle's // 2
            ((size(toks) + 1) / 2).cast(IntegerType)), " ").as("text"))
      val corpus = docs.select(col("doc_id"), col("text"))
        .unionAll(excerpts)
        .select(col("doc_id"),
          TextOps.shingles(TextOps.tokens(col("text")), 3).as("sh"))
      Dedup.prefixFilteredContainment(corpus, "doc_id", "sh",
        ThresholdNum, ThresholdDen).orderBy("doc_a", "doc_b")
    })

  private val dedupClusters = GraftQuery(
    name = "pipeline_dedup_clusters",
    doc = "Dedup capstone: near-dup pairs (exact inverted-index Jaccard " +
      "≥ 0.8) clustered into connected components by iterative min-label " +
      "propagation (Dedup.canonicalIds) — every document mapped to its " +
      "cluster-minimum keeper id, singletons to themselves. Oracle: a " +
      "DuckDB RECURSIVE CTE computes reachability over the same pair " +
      "graph — a completely different algorithm (transitive closure) " +
      "agreeing with the distributed label propagation.",
    oracle = Some((ShingleCte + s""",
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $Threshold),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM p
                UNION ALL SELECT doc_b, doc_a FROM p),
      reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
          WHERE e.v <> r.u)
      SELECT d.doc_id,
             LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS canonical_id
      FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
      GROUP BY d.doc_id ORDER BY d.doc_id""")
      .replaceFirst("WITH", "WITH RECURSIVE")),
    run = (s, dir) => {
      val docs = docShingles(s, dir)
      val pairs = Dedup.prefixFilteredJaccard(docs, "doc_id", "sh", ThresholdNum, ThresholdDen)
      Dedup.canonicalIds(docs, "doc_id", pairs, "doc_a", "doc_b")
        .orderBy("doc_id")
    })

  private val dedupKeepBest = GraftQuery(
    name = "pipeline_dedup_keep_best",
    doc = "End-to-end dedup policy: near-dup clusters (exact pairs → " +
      "connected components) × quality scoring — each cluster keeps its " +
      "HIGHEST-QUALITY member (longest text, doc_id tiebreak), not just " +
      "the min id. The integration a real training-data pipeline runs: " +
      "dedup decides the groups, quality decides the survivor. Oracle " +
      "recomputes components with a RECURSIVE CTE and picks keepers with " +
      "a window.",
    oracle = Some((ShingleCte + s""",
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $Threshold),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM p
                UNION ALL SELECT doc_b, doc_a FROM p),
      reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
          WHERE e.v <> r.u),
      comp AS (
        SELECT d.doc_id,
               LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS canonical_id
        FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
        GROUP BY d.doc_id),
      ranked AS (
        SELECT c.doc_id, c.canonical_id, length(d.text) AS q,
               ROW_NUMBER() OVER (PARTITION BY c.canonical_id
                 ORDER BY length(d.text) DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
      SELECT doc_id, canonical_id,
             CAST(q AS BIGINT) AS quality,
             CASE WHEN rn = 1 THEN 1 ELSE 0 END AS keep
      FROM ranked ORDER BY doc_id""").replaceFirst("WITH", "WITH RECURSIVE")),
    run = (s, dir) => {
      val docs = docShingles(s, dir)
      val pairs = Dedup.prefixFilteredJaccard(docs, "doc_id", "sh", ThresholdNum, ThresholdDen)
      val comp = Dedup.canonicalIds(docs, "doc_id", pairs, "doc_a", "doc_b")
      val quality = table(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast(LongType).as("quality"))
      val w = Window.partitionBy(col("canonical_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      comp.join(quality, "doc_id")
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("canonical_id"), col("quality"),
          when(col("rn") === 1, 1).otherwise(0).as("keep"))
        .orderBy("doc_id")
    })

  private val embedNearDup = GraftQuery(
    name = "pipeline_embed_neardup",
    doc = "Embedding near-dup, IVF posture: pairs within the same label " +
      "partition with cosine ≥ 0.4. Per-vector norm precomputed once; " +
      "pair space pruned from n²/2 to Σ label-block² (the partition-" +
      "pruning contract of IVF at 100 TB: only same-cell pairs compete). " +
      "All double arithmetic folded left-to-right → bit-identical to " +
      "DuckDB's list_dot_product.",
    oracle = Some("""
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
      ORDER BY id_a, id_b"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(
          table(s, dir, "embeddings").select(col("vec_id"), col("label"),
            col("embedding")),
          "vec_id", "embedding")
        .join(table(s, dir, "embeddings").select(col("vec_id"), col("label")),
          "vec_id")
      val a = pv.select(col("vec_id").as("id_a"), col("label"),
        col("v").as("va"), col("nrm").as("na"))
      val b = pv.select(col("vec_id").as("id_b"), col("label").as("lb"),
        col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("label") === col("lb") && col("id_a") < col("id_b"))
        .filter(VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= 0.4)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    })

  // -------------------------------------------------------------------
  // Similarity search
  // -------------------------------------------------------------------
  private val knnBrute = GraftQuery(
    name = "pipeline_knn_brute",
    doc = "Brute-force exact cosine top-5 for a query set (vec_id < 20) " +
      "against the full corpus — the ANN correctness baseline. Query side " +
      "broadcast (tiny); corpus side streams once, no shuffle until the " +
      "per-query top-k window. Rank ties broken on neighbor_id.",
    oracle = Some("""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
            FROM n q JOIN n c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
      r AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM p)
      SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 5
      ORDER BY query_id, rank"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(table(s, dir, "embeddings"),
        "vec_id", "embedding")
      val q = pv.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val c = pv.select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
        col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos",
          VectorOps.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    })

  /** Max vectors per IVF search cell: an oversized cell is split by a
    * secondary deterministic id hash into ⌈cell_n/cap⌉ sub-cells,
    * bounding per-cell pair work at ~cap² and total pair work at
    * ~cap·n — the Σ cell² quadratic blowup the 10× probe measured
    * (27×) becomes linear in n at fixed cap. */
  private val IvfCellCap = 64

  private val knnIvf = GraftQuery(
    name = "pipeline_knn_ivf",
    doc = "Partition-pruned (IVF-style) top-3 with a CELL-SIZE CAP: " +
      "every vector searches only its label cell, and any cell larger " +
      s"than $IvfCellCap is split by a secondary deterministic id hash " +
      "into ceil(cell_n/cap) sub-cells (the standard IVF refinement: " +
      "probe fewer candidates for bounded latency). Pair space drops " +
      "from sigma cell^2 (quadratic per cell) to at most cap*n " +
      "(linear). (label, sub) is the shuffle key, so the whole search " +
      "is one co-partitioned self-join; the cell-size lookup " +
      "broadcasts (one row per label). The cap changes the candidate " +
      "set, so the oracle splits cells with the IDENTICAL hash - the " +
      "approximation itself is differential-tested.",
    oracle = Some(s"""
      WITH e AS (SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, label, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      c AS (SELECT label, COUNT(*) AS cell_n FROM n GROUP BY label),
      h AS (SELECT n.*,
              ${VectorOps.subCellSql("vec_id", "cell_n", IvfCellCap)} AS sub
            FROM n JOIN c USING (label)),
      p AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
              list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
            FROM h a JOIN h b ON a.label = b.label AND a.sub = b.sub
              AND a.vec_id <> b.vec_id),
      r AS (SELECT vec_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM p)
      SELECT vec_id, rank, neighbor_id FROM r WHERE rank <= 3
      ORDER BY vec_id, rank"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(
          table(s, dir, "embeddings").select(col("vec_id"), col("label"),
            col("embedding")), "vec_id", "embedding")
        .join(table(s, dir, "embeddings").select(col("vec_id"), col("label")),
          "vec_id")
      // cell sizes: one row per label — broadcast, never a shuffle
      val sizes = pv.groupBy("label")
        .agg(count(lit(1)).as("cell_n"))
      val capped = pv.join(broadcast(sizes), "label")
        .withColumn("sub",
          VectorOps.subCell(col("vec_id"), "cell_n", IvfCellCap))
      val a = capped.select(col("vec_id"), col("label"), col("sub"),
        col("v").as("va"), col("nrm").as("na"))
      val b = capped.select(col("vec_id").as("neighbor_id"),
        col("label").as("lb"), col("sub").as("sb"), col("v").as("vb"),
        col("nrm").as("nb"))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      a.join(b, col("label") === col("lb") && col("sub") === col("sb") &&
          col("vec_id") =!= col("neighbor_id"))
        .withColumn("cos",
          VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select("vec_id", "rank", "neighbor_id")
        .orderBy("vec_id", "rank")
    })

  private val annLsh = GraftQuery(
    name = "pipeline_ann_lsh",
    doc = "Random-hyperplane LSH bucketing (16 deterministic sign bits " +
      "from integer-hash-derived planes): vectors bucketed by signature; " +
      "reports bucket occupancy. FULLY oracle-checked: the plane weights " +
      "are an exact integer recurrence (Knuth hash → power-of-two " +
      "scaling, every step IEEE-exact) and each projection a sequential " +
      "left-to-right dot product, so DuckDB recomputes bit-identical " +
      "projections and the same buckets. The signature is a narrow " +
      "per-row map (planes inlined as broadcast literals, zero shuffles " +
      "before the occupancy groupBy). At 100 TB: signature is the " +
      "shuffle key, candidate search touches one bucket (+ multiprobe " +
      "neighbors); OpsSpec pins banded-probe recall ≥ 0.9 vs the exact " +
      "brute-force top-k.",
    oracle = Some("""
      WITH e0 AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      e AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e0
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      planes AS (SELECT j, list_transform(range(0, 64), i ->
                   CAST(((j * 64 + i) * 2654435761) % 4294967296 AS DOUBLE)
                     / 4294967296.0 * 2.0 - 1.0) AS pw
                 FROM range(0, 16) t(j)),
      proj AS (SELECT e.vec_id, p.j, list_dot_product(e.v, p.pw) AS pr
               FROM e CROSS JOIN planes p),
      sig AS (SELECT vec_id,
                CAST(SUM(CASE WHEN pr >= 0
                          THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                     AS BIGINT) AS bucket
              FROM proj GROUP BY vec_id)
      SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
      FROM sig GROUP BY bucket ORDER BY bucket"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(table(s, dir, "embeddings"),
        "vec_id", "embedding")
      VectorOps.hyperplaneBuckets(pv, dim = 64, nBits = 16)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_vectors"),
          min(col("vec_id")).as("min_vec_id"))
        .orderBy("bucket")
    })

  private val annLshTopk = GraftQuery(
    name = "pipeline_ann_lsh_topk",
    doc = "Approximate nearest-neighbor SEARCH via banded LSH " +
      "multiprobe: the 16-bit hyperplane signature split into 8 bands " +
      "of 2 bits; candidates = vectors sharing any band with the " +
      "query (the OR-amplified probe pattern a production ANN index " +
      "serves), then exact cosine ranking of candidates only, top-3. " +
      "ORACLE-EXACT even though approximate: the planes are an integer " +
      "recurrence and the ranking ties break on neighbor_id, so DuckDB " +
      "replays the identical approximate pipeline bit for bit — the " +
      "approximation itself is differential-tested, and OpsSpec pins " +
      "its recall@5 ≥ 0.9 against the exact brute force. At 100 TB the " +
      "candidate join shuffles on (band, value): each query touches " +
      "Σ band-bucket sizes, never the corpus.",
    oracle = Some("""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      planes AS (SELECT j, list_transform(range(0, 64), i ->
                   CAST(((j * 64 + i) * 2654435761) % 4294967296 AS DOUBLE)
                     / 4294967296.0 * 2.0 - 1.0) AS pw
                 FROM range(0, 16) t(j)),
      proj AS (SELECT n.vec_id, p.j, list_dot_product(n.v, p.pw) AS pr
               FROM n CROSS JOIN planes p),
      sig AS (SELECT vec_id,
                CAST(SUM(CASE WHEN pr >= 0
                          THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
                     AS BIGINT) AS sig
              FROM proj GROUP BY vec_id),
      bands AS (SELECT vec_id, b, (sig >> CAST(2 * b AS INTEGER)) & 3 AS bv
                FROM sig CROSS JOIN range(0, 8) t(b)),
      cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM bands q JOIN bands c ON q.b = c.b AND q.bv = c.bv
               WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
      scored AS (SELECT cand.query_id, cand.neighbor_id,
                   list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
                 FROM cand
                 JOIN n a ON a.vec_id = cand.query_id
                 JOIN n b ON b.vec_id = cand.neighbor_id),
      r AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM scored)
      SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 3
      ORDER BY query_id, rank"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(table(s, dir, "embeddings"),
          "vec_id", "embedding")
        .localCheckpoint(true) // feeds signature build + both scoring sides
      val sig = pv.select(col("vec_id"),
        VectorOps.hyperplaneSignature(col("v"), 64, 16).as("sig"))
      val bandEntries = (0 until 8).map(b => struct(lit(b).as("b"),
        shiftright(col("sig"), 2 * b).bitwiseAND(3).as("bv")))
      val bands = sig
        .select(col("vec_id"), explode(array(bandEntries: _*)).as("e"))
        .select(col("vec_id"), col("e.b").as("b"), col("e.bv").as("bv"))
        .localCheckpoint(true) // feeds both sides of the candidate join
      val q = bands.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("b"), col("bv"))
      val c = bands.select(col("vec_id").as("neighbor_id"),
        col("b").as("cb"), col("bv").as("cbv"))
      val cand = q.join(c, col("b") === col("cb") &&
          col("bv") === col("cbv") &&
          col("neighbor_id") =!= col("query_id"))
        .select("query_id", "neighbor_id").distinct()
      val qa = pv.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("nrm").as("qn"))
      val cb = pv.select(col("vec_id").as("neighbor_id"),
        col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      cand.join(qa, "query_id").join(cb, "neighbor_id")
        .withColumn("cos",
          VectorOps.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    })

  /** Corpus-level ANN quality audit — recall@3 of the banded-LSH search
    * against the exact brute force, as a REGISTERED query (not just the
    * one-off OpsSpec pin): the approximate-search trade becomes a number
    * measured per dataset, re-checked differentially every round. Both
    * sides are deterministic (integer-recurrence planes, id-tiebroken
    * ranks), so the oracle replays the identical audit: DuckDB recomputes
    * both top-k tables from scratch and must land on the same integer hit
    * count. The recall value is ONE division of exact integers →
    * bit-identical across engines. At 100 TB the audit joins two k·|Q|-row
    * top-k tables — negligible next to the searches themselves. */
  private val annRecall = GraftQuery(
    name = "pipeline_ann_recall",
    doc = "ANN recall audit: recall@3 of pipeline_ann_lsh_topk vs the " +
      "exact pipeline_knn_brute top-3 over the same query set, one " +
      "summary row (n_queries, k, n_hits, recall). Exact-integer hit " +
      "count, single division — the approximation quality is itself a " +
      "differentially-tested, per-dataset measurement.",
    oracle = Some(s"""
      WITH brute AS (${knnBrute.oracle.get}),
      ann AS (${annLshTopk.oracle.get}),
      hits AS (SELECT a.query_id, COUNT(*) AS n_hit
               FROM ann a JOIN brute b
                 ON a.query_id = b.query_id
                 AND a.neighbor_id = b.neighbor_id AND b.rank <= 3
               GROUP BY 1)
      SELECT n_queries, k, n_hits,
             CAST(n_hits AS DOUBLE) / CAST(n_queries * k AS DOUBLE) AS recall
      FROM (SELECT (SELECT COUNT(DISTINCT query_id) FROM brute) AS n_queries,
                   CAST(3 AS BIGINT) AS k,
                   CAST((SELECT COALESCE(SUM(n_hit), 0) FROM hits)
                     AS BIGINT) AS n_hits)"""),
    run = (s, dir) => {
      // brute feeds TWO branches (the hit semi-join and the n_queries
      // aggregate): pin it once or the O(n·|Q|) cosine scan re-expands
      // per branch (docShingles convention)
      val brute = knnBrute.run(s, dir).filter(col("rank") <= 3)
        .localCheckpoint(true)
      val ann = annLshTopk.run(s, dir)
      val hits = ann.join(brute.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      brute.agg(countDistinct(col("query_id")).as("n_queries"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .select(col("n_queries"), lit(3L).as("k"), col("n_hits"),
          (col("n_hits").cast(DoubleType) /
            (col("n_queries") * lit(3L)).cast(DoubleType)).as("recall"))
    })

  private val ivfRecall = GraftQuery(
    name = "pipeline_ivf_recall",
    doc = "IVF recall audit, symmetric to pipeline_ann_recall: recall@3 " +
      "of pipeline_knn_ivf vs the exact pipeline_knn_brute top-3 over " +
      "the same query set (vec_id < 20), one summary row. IVF is exact " +
      "WITHIN a (label, sub) cell, so what this measures is the loss " +
      "from cell boundaries + the cap split - the quantity a user " +
      "tuning nprobe/cap actually needs, now a per-dataset " +
      "differential measurement instead of a test pin. Exact-integer " +
      "hit count, single division at the end.",
    oracle = Some(s"""
      WITH brute AS (${knnBrute.oracle.get}),
      ivf AS (${knnIvf.oracle.get}),
      hits AS (SELECT a.vec_id, COUNT(*) AS n_hit
               FROM ivf a JOIN brute b
                 ON a.vec_id = b.query_id
                 AND a.neighbor_id = b.neighbor_id AND b.rank <= 3
               WHERE a.vec_id < 20
               GROUP BY 1)
      SELECT n_queries, k, n_hits,
             CAST(n_hits AS DOUBLE) / CAST(n_queries * k AS DOUBLE) AS recall
      FROM (SELECT (SELECT COUNT(DISTINCT query_id) FROM brute) AS n_queries,
                   CAST(3 AS BIGINT) AS k,
                   CAST((SELECT COALESCE(SUM(n_hit), 0) FROM hits)
                     AS BIGINT) AS n_hits)"""),
    run = (s, dir) => {
      // brute feeds two branches (hit semi-join + n_queries aggregate):
      // pin once, annRecall convention
      val brute = knnBrute.run(s, dir).filter(col("rank") <= 3)
        .localCheckpoint(true)
      val ivf = knnIvf.run(s, dir).filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("neighbor_id"))
      val hits = ivf.join(brute.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      brute.agg(countDistinct(col("query_id")).as("n_queries"))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
        .select(col("n_queries"), lit(3L).as("k"), col("n_hits"),
          (col("n_hits").cast(DoubleType) /
            (col("n_queries") * lit(3L)).cast(DoubleType)).as("recall"))
    })

  private val embedNearDupGlobal = GraftQuery(
    name = "pipeline_embed_neardup_global",
    doc = "Global (unpartitioned) embedding near-dup: ALL vector pairs " +
      "with cosine ≥ 0.4 — the exact brute-force baseline the IVF " +
      "variant (pipeline_embed_neardup) approximates by partition " +
      "pruning. GATED like pipeline_dedup_ngram: the O(n²) pass runs " +
      "on a deterministic hash-capped slice (cap 4000 vectors, above " +
      "every tracked sf — full exact baseline at test scale, bounded " +
      "cap² audit sample beyond; oracle replays the identical " +
      "threshold). At 100 TB only the pruned/LSH paths survive, which " +
      "is why all three are shipped.",
    oracle = Some(s"""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings
                 WHERE ${Sampling.hash32Sql("vec_id")} <
                   ${Sampling.capThresholdSql(BaselineVecCap,
                     "SELECT COUNT(*) FROM embeddings")}),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE)
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
      ORDER BY id_a, id_b"""),
    run = (s, dir) => {
      val thr = Sampling.capThreshold(BaselineVecCap,
        table(s, dir, "embeddings").count())
      val pv = VectorOps.prepared(
        table(s, dir, "embeddings")
          .filter(Sampling.hash32(col("vec_id")) < lit(thr)),
        "vec_id", "embedding")
      val a = pv.select(col("vec_id").as("id_a"), col("v").as("va"),
        col("nrm").as("na"))
      val b = pv.select(col("vec_id").as("id_b"), col("v").as("vb"),
        col("nrm").as("nb"))
      a.join(b, col("id_a") < col("id_b"))
        .filter(VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= 0.4)
        .select("id_a", "id_b")
        .orderBy("id_a", "id_b")
    })

  private val embedNormalize = GraftQuery(
    name = "pipeline_embed_normalize",
    doc = "Embedding preprocessing: L2 normalization to unit vectors " +
      "(the step before any cosine index build — post-normalization, " +
      "cosine becomes a plain dot product). Per-row map; division by " +
      "the codegen'd norm is bit-identical across engines, checked on " +
      "the first component plus the resulting unit norm.",
    oracle = Some("""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE)
      SELECT vec_id,
             v[1] / nrm AS first_component,
             list_dot_product(list_transform(v, x -> x / nrm),
                              list_transform(v, x -> x / nrm)) AS unit_norm_sq
      FROM n ORDER BY vec_id"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(table(s, dir, "embeddings"),
        "vec_id", "embedding")
      val unit = transform(col("v"), _ / col("nrm"))
      pv.select(col("vec_id"),
          (element_at(col("v"), 1) / col("nrm")).as("first_component"),
          VectorOps.dot(unit, unit).as("unit_norm_sq"))
        .orderBy("vec_id")
    })

  // -------------------------------------------------------------------
  // Text analysis
  // -------------------------------------------------------------------
  private val textStats = GraftQuery(
    name = "pipeline_text_stats",
    doc = "Per-document token statistics: token count, distinct tokens, " +
      "char length, mean token length (exact-int division → drift-free " +
      "double). Pure per-row map — embarrassingly parallel.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, n_chars, string_split(text, ' ') AS w
                 FROM documents)
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
             n_chars,
             CAST(CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE)
                  / len(w) AS DOUBLE) AS mean_token_len
      FROM t ORDER BY doc_id"""),
    run = (s, dir) => {
      val w = col("w")
      table(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"), TextOps.tokens(col("text")).as("w"))
        .select(col("doc_id"),
          size(w).cast(LongType).as("n_tokens"),
          size(array_distinct(w)).cast(LongType).as("n_distinct"),
          col("n_chars"),
          (aggregate(transform(w, t => length(t)), lit(0), _ + _)
            .cast(DoubleType) / size(w).cast(DoubleType))
            .as("mean_token_len"))
        .orderBy("doc_id")
    })

  private val textQuality = GraftQuery(
    name = "pipeline_text_quality",
    doc = "Quality scoring: stopword ratio, type-token ratio, length " +
      "gate → keep flag. The filter stage of a training-data pipeline; " +
      "ratios are exact-int divisions so the oracle matches bitwise.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      m AS (SELECT doc_id,
              CAST(len(w) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE)
                / len(w) AS stop_ratio,
              CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
            FROM t)
      SELECT doc_id, n_tokens, stop_ratio, ttr,
             CASE WHEN n_tokens >= 20 AND n_tokens <= 2000
                   AND stop_ratio <= 0.3 AND ttr >= 0.2
                  THEN 1 ELSE 0 END AS keep
      FROM m ORDER BY doc_id"""),
    run = (s, dir) => {
      val w = col("w")
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
        .select(col("doc_id"),
          size(w).cast(LongType).as("n_tokens"),
          (TextOps.markerHits(w, Seq("the", "a")).cast(DoubleType) /
            size(w).cast(DoubleType)).as("stop_ratio"),
          (size(array_distinct(w)).cast(DoubleType) /
            size(w).cast(DoubleType)).as("ttr"))
        .withColumn("keep",
          when(col("n_tokens") >= 20 && col("n_tokens") <= 2000 &&
            col("stop_ratio") <= 0.3 && col("ttr") >= 0.2, 1).otherwise(0))
        .orderBy("doc_id")
    })

  private val langId = GraftQuery(
    name = "pipeline_lang_id",
    doc = "Marker-word language ID (n-gram-heuristic family): occurrence " +
      "counts against per-language marker lists, argmax with a fixed " +
      "preference order. The classifier logic is replicated verbatim in " +
      "the oracle — the differential check proves the scoring pipeline, " +
      "not linguistic accuracy (the synthetic corpus shares one vocab).",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      sc AS (SELECT doc_id,
               CAST(len(list_filter(w, x -> x IN ('the', 'a', 'is', 'of'))) AS BIGINT) AS s_en,
               CAST(len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und'))) AS BIGINT) AS s_de,
               CAST(len(list_filter(w, x -> x IN ('el', 'la', 'los', 'y'))) AS BIGINT) AS s_es,
               CAST(len(list_filter(w, x -> x IN ('le', 'les', 'et', 'des'))) AS BIGINT) AS s_fr,
               CAST(len(list_filter(w, x -> x IN ('的', '是', '在', '了'))) AS BIGINT) AS s_zh
             FROM t)
      SELECT doc_id, s_en, s_de, s_es, s_fr, s_zh,
             CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                  WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                  WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                  WHEN s_fr >= s_zh THEN 'fr'
                  ELSE 'zh' END AS predicted
      FROM sc ORDER BY doc_id"""),
    run = (s, dir) => {
      val markers = Seq(
        "en" -> Seq("the", "a", "is", "of"),
        "de" -> Seq("der", "die", "das", "und"),
        "es" -> Seq("el", "la", "los", "y"),
        "fr" -> Seq("le", "les", "et", "des"),
        "zh" -> Seq("的", "是", "在", "了"))
      val scored = markers.foldLeft(
        table(s, dir, "documents")
          .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))) {
        case (df, (lang, ms)) => df.withColumn(s"s_$lang",
          TextOps.markerHits(col("w"), ms).cast(LongType))
      }
      scored.withColumn("predicted",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
            col("s_en") >= col("s_fr") && col("s_en") >= col("s_zh"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
            col("s_de") >= col("s_zh"), "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") >= col("s_zh"), "es")
          .when(col("s_fr") >= col("s_zh"), "fr")
          .otherwise("zh"))
        .select("doc_id", "s_en", "s_de", "s_es", "s_fr", "s_zh", "predicted")
        .orderBy("doc_id")
    })

  private val fingerprint = GraftQuery(
    name = "pipeline_fingerprint",
    doc = "Document fingerprinting: byte-exact md5, order-invariant " +
      "bag-of-words md5 (sorted distinct tokens), and a Rabin–Karp " +
      "polynomial rolling hash (custom expression; oracle replicates the " +
      "identical mod-2³¹−1 recurrence via list_reduce) — the key set an " +
      "exact-dedup pass groups on at 100 TB.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w
                 FROM documents)
      SELECT doc_id, md5(text) AS content_md5,
             md5(array_to_string(list_sort(list_distinct(w)), ' ')) AS bag_md5,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ord(substr(text, i, 1)) AS BIGINT))),
               (a, c) -> (a * 31 + c) % 2147483647) AS roll_hash,
             CAST(length(text) AS BIGINT) AS n_chars_exact
      FROM t ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        md5(col("text")).as("content_md5"),
        TextOps.bagFingerprint(col("w")).as("bag_md5"),
        graft.functions.TextExpressions.rollingHash(col("text"))
          .as("roll_hash"),
        length(col("text")).cast(LongType).as("n_chars_exact"))
      .orderBy("doc_id"))

  private val tokenCountBpe = GraftQuery(
    name = "pipeline_token_count_bpe",
    doc = "BPE-ish token counting: whitespace tokens plus a regex " +
      "sub-token pass ([a-z0-9]+ runs — the alphanumeric-run primitive " +
      "BPE pretokenizers start from) and a chars-per-token compression " +
      "estimate. regexp_extract_all in both engines; the pattern stays " +
      "in the POSIX-common subset so Java and RE2 dialects agree. A doc " +
      "with ZERO alphanumeric runs (empty text, CJK-only — the r14 " +
      "edge-corpus sweep caught this as an ANSI DIVIDE_BY_ZERO) has an " +
      "UNDEFINED compression ratio: NULL in both engines, never a " +
      "throw or an inf.",
    oracle = Some("""
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
             CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens,
             CASE WHEN len(regexp_extract_all(text, '[a-z0-9]+')) = 0
                  THEN NULL
                  ELSE CAST(length(text) AS DOUBLE) /
                    len(regexp_extract_all(text, '[a-z0-9]+')) END
               AS chars_per_token
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast(LongType).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast(LongType).as("n_re_tokens"))
      .select(col("doc_id"), col("n_ws_tokens"), col("n_re_tokens"),
        when(col("n_re_tokens") === 0L, lit(null).cast(DoubleType))
          .otherwise(length(col("text")).cast(DoubleType) /
            col("n_re_tokens").cast(DoubleType)).as("chars_per_token"))
      .orderBy("doc_id"))

  private val textLevenshtein = GraftQuery(
    name = "pipeline_text_levenshtein",
    doc = "Edit-distance verification of near-dup pairs: Levenshtein " +
      "between the texts of every exact-Jaccard pair — a second, " +
      "character-level similarity signal on the same candidates. Both " +
      "engines implement the same DP recurrence → identical integers. " +
      "The per-pair DP is GATED at the PAIR level (the pair set grows " +
      "with duplication density, ~100× on the 10× clique probe): a " +
      "deterministic pair-hash cap (5000 pairs, above every tracked " +
      "sf) keeps the full pair set at test scale and degrades into a " +
      "bounded audit sample beyond — exactly how a production QA " +
      "stage samples its verification work; oracle replays the " +
      "identical threshold over the same pair set.",
    oracle = Some(ShingleCte + s""",
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $Threshold),
      ps AS (SELECT doc_a, doc_b FROM p
             WHERE ${Sampling.hashPair32Sql("doc_a", "doc_b")} <
               ${Sampling.capThresholdSql(BaselinePairCap,
                 "SELECT COUNT(*) FROM p")})
      SELECT ps.doc_a, ps.doc_b,
             CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
      FROM ps
      JOIN documents da ON da.doc_id = ps.doc_a
      JOIN documents db ON db.doc_id = ps.doc_b
      ORDER BY doc_a, doc_b"""),
    run = (s, dir) => {
      val docs = docShingles(s, dir)
      // the pair set feeds two branches (the cap count and the DP map):
      // pin it so the prefix join runs once (docShingles convention)
      val pairs = Dedup.prefixFilteredJaccard(docs, "doc_id", "sh",
          ThresholdNum, ThresholdDen)
        .select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      val thr = Sampling.capThreshold(BaselinePairCap, pairs.count())
      val texts = table(s, dir, "documents").select(col("doc_id"), col("text"))
      pairs
        .filter(Sampling.hashPair32(col("doc_a"), col("doc_b")) < lit(thr))
        .join(texts.select(col("doc_id").as("doc_a"), col("text").as("ta")),
          "doc_a")
        .join(texts.select(col("doc_id").as("doc_b"), col("text").as("tb")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          levenshtein(col("ta"), col("tb")).cast(LongType).as("edit_dist"))
        .orderBy("doc_a", "doc_b")
    })

  private val textNormalize = GraftQuery(
    name = "pipeline_text_normalize",
    doc = "Text normalization (the first stage of every corpus " +
      "pipeline): lowercase → non-alphanumeric to space → whitespace " +
      "collapse → trim, plus the normalized token count. Pure per-row " +
      "regex map; DuckDB twin uses the 'g' flag (its regexp_replace is " +
      "first-match by default, Spark's is global — a cross-engine trap).",
    oracle = Some("""
      WITH n AS (SELECT doc_id,
                   trim(regexp_replace(regexp_replace(lower(text),
                     '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
                 FROM documents)
      SELECT doc_id, norm,
             CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm
      FROM n ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"),
        trim(regexp_replace(regexp_replace(lower(col("text")),
          "[^a-z0-9 ]", " "), " +", " ")).as("norm"))
      .select(col("doc_id"), col("norm"),
        size(split(col("norm"), " ")).cast(LongType).as("n_tokens_norm"))
      .orderBy("doc_id"))

  private val vocabTopk = GraftQuery(
    name = "pipeline_vocab_topk",
    doc = "Vocabulary build: global token frequencies, top-100 by " +
      "(count desc, token) — the first step of tokenizer training over " +
      "a corpus. Partial (map-side) counts then TakeOrderedAndProject: " +
      "no global sort; only each partition's 100-row heap crosses the " +
      "final exchange at 100 TB.",
    oracle = Some("""
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                   FROM documents)
      SELECT token, COUNT(*) AS n FROM tok
      GROUP BY token ORDER BY n DESC, token LIMIT 100"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(100))

  private val vocabCoverage = GraftQuery(
    name = "pipeline_vocab_coverage",
    doc = "Vocabulary coverage / OOV rate: per-document fraction of " +
      "tokens (with multiplicity) not in the top-100 vocabulary that " +
      "pipeline_vocab_topk builds - the tokenizer-fit diagnostic run " +
      "before committing a vocab. The vocab is top-100 by (count desc, " +
      "token), a total order, so the set is deterministic; it " +
      "broadcasts into a left join over the exploded tokens (at 100 TB " +
      "the vocab is always the tiny side). OOV ratio is an exact IEEE " +
      "integer division.",
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      v AS (SELECT token FROM (SELECT token, COUNT(*) AS n FROM tok
              GROUP BY token ORDER BY n DESC, token LIMIT 100)),
      j AS (SELECT t.doc_id, CASE WHEN v.token IS NULL THEN 1 ELSE 0 END
              AS oov FROM tok t LEFT JOIN v USING (token))
      SELECT doc_id, COUNT(*) AS n_tokens,
             CAST(SUM(oov) AS BIGINT) AS n_oov,
             CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS oov_ratio
      FROM j GROUP BY doc_id ORDER BY doc_id"""),
    run = (s, dir) => {
      // the exploded tokens feed BOTH the vocab build and the join side
      // — cut once (the repo's shared-prefix convention; without it the
      // scan+tokenize+explode runs twice)
      val tok = table(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text")))
          .as("token"))
        .localCheckpoint(true)
      val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(100)
        .select(col("token"), lit(1).as("in_vocab"))
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast(DoubleType) / col("n_tokens").cast(DoubleType))
            .as("oov_ratio"))
        .orderBy("doc_id")
    })

  private val urlExtract = GraftQuery(
    name = "pipeline_url_extract",
    doc = "URL parsing over document metadata (the provenance/domain " +
      "bucketing step of web-corpus curation): one deterministic URL " +
      "per document (pure doc_id formulas), parsed with Spark's native " +
      "parse_url into host / path / query. The oracle predicts every " +
      "component from the same formulas - a green row proves the " +
      "parser against known ground truth rather than against another " +
      "parser's quirks. Per-row narrow map.",
    oracle = Some("""
      SELECT doc_id,
             'host' || (doc_id % 50) || '.example.com' AS host,
             '/docs/' || doc_id AS path,
             'q=' || (doc_id % 7) AS query
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("https://host"), col("doc_id") % 50,
          lit(".example.com/docs/"), col("doc_id"),
          lit("?q="), col("doc_id") % 7).as("url"))
      .select(col("doc_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY")).as("query"))
      .orderBy("doc_id"))

  private val langRebalance = GraftQuery(
    name = "pipeline_lang_rebalance",
    doc = "Inverse-frequency language REBALANCING by replication (the " +
      "upsampling half of multilingual pretraining's temperature " +
      "sampling; the downsampling half is pipeline_source_mix's " +
      "hash-threshold admission): every language is replicated toward " +
      "the majority count - base = n_max div n_lang integer copies " +
      "(capped at 4) per doc, plus ONE extra copy admitted when the " +
      "top 16 bits of hash32(doc_id) fall under the per-LANGUAGE " +
      "threshold (n_max mod n_lang)*2^16 div n_lang - the fractional " +
      "part of n_max/n_lang quantized at 2^-16 (within 0.002% of " +
      "exact), computed ONCE per language on the stats side so the " +
      "per-row test is a shift and a compare with no multiply: " +
      "integer-only, RNG-free, reproducible row-by-row, and " +
      "overflow-safe to n_lang < 2^47 (a per-row hash32*n_lang " +
      "product would overflow int64 at n_lang >= 2^31, inside the " +
      "100 TB posture). The language-stats side is languages-sized " +
      "and broadcasts; the explode is narrow - at 100 TB the only " +
      "shuffle is the partial-agg language count.",
    oracle = Some(s"""
      WITH c AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
      m AS (SELECT MAX(n_lang) AS n_max FROM c),
      f AS (SELECT lang,
              CAST(LEAST(n_max // n_lang, 4) AS BIGINT) AS base,
              (n_max % n_lang) * 65536 // n_lang AS thr
            FROM c CROSS JOIN m),
      d AS (SELECT doc_id, d.lang,
              base + CASE WHEN base < 4 AND
                  ${Sampling.hash32Sql("doc_id")} // 65536 < thr
                THEN 1 ELSE 0 END AS n_copies
            FROM documents d JOIN f USING (lang))
      SELECT doc_id, lang, CAST(unnest(range(0, n_copies)) AS BIGINT)
               AS copy_idx
      FROM d WHERE n_copies > 0
      ORDER BY doc_id, copy_idx"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      // counts feeds two branches (the stats row and its own max agg):
      // pin the languages-sized frame once or the corpus count scan
      // re-expands per branch (docShingles convention)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        .localCheckpoint(true)
      val stats = counts.crossJoin(
        broadcast(counts.agg(max(col("n_lang")).as("n_max"))))
        .withColumn("base",
          least(expr("n_max div n_lang"), lit(4L)).cast(LongType))
        // fractional-admission threshold, computed once per language:
        // (n_max mod n_lang) < 2^47 here keeps the *65536 in int64
        .withColumn("thr",
          expr("(n_max % n_lang) * 65536 div n_lang"))
      docs.join(broadcast(stats), "lang")
        // per-row test: top 16 bits of the 32-bit hash vs the
        // per-language threshold — a shift and a compare, no multiply
        .withColumn("n_copies", col("base") +
          when(col("base") < 4 &&
            shiftright(Sampling.hash32(col("doc_id")), 16) < col("thr"), 1L)
            .otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(0L), col("n_copies") - 1)).as("copy_idx"))
        .orderBy("doc_id", "copy_idx")
    })

  private val scoreWinsorize = GraftQuery(
    name = "pipeline_score_winsorize",
    doc = "Per-language WINSORIZATION of a quality signal (clip to the " +
      "[p05, p95] band before scores are compared or mixed across " +
      "languages - the robust-normalization step that stops tail docs " +
      "from dominating curriculum or mixture weights): exact " +
      "interpolated percentiles per language (Spark percentile ≡ " +
      "DuckDB quantile_cont BITWISE, the equality lake_percentiles " +
      "pins), clipped with greatest/least on the same doubles. The " +
      "languages-sized percentile row broadcasts back; one corpus " +
      "scan feeds the stats, one the clip - the same two-pass shape " +
      "as every stats-then-apply normalizer here. At 100 TB the " +
      "exact-percentile pass would swap for the GK sketch " +
      "(lake_approx_percentile) with the documented rank-error " +
      "contract; the clip stage is unchanged.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, lang,
                   len(string_split(text, ' ')) AS n_words
                 FROM documents),
      p AS (SELECT lang, quantile_cont(n_words, 0.05) AS lo,
                   quantile_cont(n_words, 0.95) AS hi
            FROM t GROUP BY 1)
      SELECT doc_id, t.lang, CAST(n_words AS BIGINT) AS n_words,
             GREATEST(LEAST(CAST(n_words AS DOUBLE), hi), lo) AS n_winsor
      FROM t JOIN p USING (lang) ORDER BY doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("n_words"))
        .localCheckpoint(true) // feeds the stats pass AND the clip pass
      val pct = docs.groupBy("lang")
        .agg(expr("percentile(n_words, array(0.05D, 0.95D))").as("p"))
        .select(col("lang"), col("p")(0).as("lo"), col("p")(1).as("hi"))
      docs.join(broadcast(pct), "lang")
        .select(col("doc_id"), col("lang"), col("n_words"),
          greatest(least(col("n_words").cast(DoubleType), col("hi")),
            col("lo")).as("n_winsor"))
        .orderBy("doc_id")
    })

  private val scoreWinsorizeGk = GraftQuery(
    name = "pipeline_score_winsorize_gk",
    doc = "pipeline_score_winsorize's posture at 100 TB: the exact " +
      "interpolated-percentile pass swapped for the Greenwald-Khanna " +
      "sketch (approx_percentile, accuracy 1000) - bounded state per " +
      "language instead of a full per-language value sort. The " +
      "differential twin pattern of pipeline_decontam_bloom, adapted " +
      "for a sketch whose OUTPUT legitimately differs: clip values " +
      "aren't byte-identical (GK returns a dataset element, the exact " +
      "pass interpolates), so what the oracle pins is the CONTRACT " +
      "that makes the swap safe - per language, the GK p05/p95 bounds " +
      "are rank-recounted against the targets with the 2*eps slack " +
      "(eps = 1/accuracy; the same recount lake_approx_percentile " +
      "documents), which bounds every clip deviation: a doc's GK-clip " +
      "differs from its exact-clip only by bound gaps that the rank " +
      "certificate caps. GK's guarantee is DETERMINISTIC for any " +
      "partition/merge order (unlike CMS's probabilistic eps bound), " +
      "so these flags cannot flip on regenerated data; no raw sketch " +
      "value reaches the output (merge order may vary it run to run - " +
      "flags only, the sketch-family rule).",
    oracle = Some("""
      SELECT lang, COUNT(*) AS n,
             CAST(1 AS BIGINT) AS p05_within_rank_bound,
             CAST(1 AS BIGINT) AS p95_within_rank_bound
      FROM documents GROUP BY lang ORDER BY lang"""),
    run = (s, dir) => {
      // feeds the sketch pass AND the recount pass - pin once
      val docs = table(s, dir, "documents")
        .select(col("lang"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("n_words"))
        .localCheckpoint(true)
      val gk = docs.groupBy("lang")
        .agg(expr("approx_percentile(n_words, array(0.05D, 0.95D), 1000)")
          .as("g"))
        .select(col("lang"), col("g")(0).cast(DoubleType).as("g05"),
          col("g")(1).cast(DoubleType).as("g95"))
      def flag(lt: Column, le: Column, p: Double): Column = {
        val n = col("n").cast(DoubleType)
        // Spark's QuantileSummaries targets rank ceil(p*n) (measured:
        // at per-language n~100 the returned element sits exactly
        // there, where a p*n target is off by the ceil gap); the
        // returned element's rank interval [lt+1, le] must intersect
        // the target +- 2*eps*n (eps = 1/accuracy)
        val t = ceil(n * p)
        val slack = n * 0.002
        (((lt + 1).cast(DoubleType) <= t + slack) &&
          (le.cast(DoubleType) >= t - slack)).cast(LongType)
      }
      val nw = col("n_words").cast(DoubleType)
      docs.join(broadcast(gk), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          sum(when(nw < col("g05"), 1L).otherwise(0L)).as("lt05"),
          sum(when(nw <= col("g05"), 1L).otherwise(0L)).as("le05"),
          sum(when(nw < col("g95"), 1L).otherwise(0L)).as("lt95"),
          sum(when(nw <= col("g95"), 1L).otherwise(0L)).as("le95"))
        .select(col("lang"), col("n"),
          flag(col("lt05"), col("le05"), 0.05).as("p05_within_rank_bound"),
          flag(col("lt95"), col("le95"), 0.95).as("p95_within_rank_bound"))
        .orderBy("lang")
    })

  private val spanCorrupt = GraftQuery(
    name = "pipeline_span_corrupt",
    doc = "T5/UL2-style SPAN CORRUPTION (the denoising-objective " +
      "transform that turns raw text into (input, target) training " +
      "pairs): deterministic 3-token spans - token position i is " +
      "masked iff ((i + doc_id) div 3) mod 7 = 0, i.e. every 7th " +
      "3-block, phase-shifted per doc - replaced in the INPUT by " +
      "per-doc sentinels <X_0>, <X_1>, ... while the TARGET lists " +
      "each sentinel followed by the tokens it hides. Pure integer " +
      "block arithmetic + array lambdas (transform/filter/concat_ws), " +
      "zero UDFs, zero shuffles before the presentation sort; the " +
      "oracle replays the identical formulas over DuckDB list " +
      "lambdas, so both engines must produce byte-identical pairs. " +
      "RNG-free masking is the price of differential testing - the " +
      "plumbing (span selection, sentinel numbering, pair assembly) " +
      "is exactly the production shape, with the random span sampler " +
      "swappable for the hash formula.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w
                 FROM documents WHERE len(string_split(text, ' ')) >= 1)
      SELECT doc_id,
        -- COALESCE: DuckDB's array_to_string of an EMPTY list is NULL
        -- where Spark's concat_ws is '' (a doc can have zero masked or
        -- zero kept tokens)
        COALESCE(
          array_to_string(list_filter(list_transform(range(0, len(w)), i ->
            CASE WHEN ((i + doc_id) // 3) % 7 = 0 THEN
              CASE WHEN i = 0 OR (i + doc_id) % 3 = 0
                THEN '<X_' || CAST(((i + doc_id) // 3) // 7
                  - ((doc_id // 3) + 6) // 7 AS VARCHAR) || '>'
                ELSE NULL END
            ELSE w[CAST(i + 1 AS INT)] END), x -> x IS NOT NULL), ' '),
          '') AS input,
        COALESCE(
          array_to_string(list_filter(list_transform(range(0, len(w)), i ->
            CASE WHEN ((i + doc_id) // 3) % 7 = 0 THEN
              CASE WHEN i = 0 OR (i + doc_id) % 3 = 0
                THEN '<X_' || CAST(((i + doc_id) // 3) // 7
                  - ((doc_id // 3) + 6) // 7 AS VARCHAR) || '>' || ' ' ||
                  w[CAST(i + 1 AS INT)]
                ELSE w[CAST(i + 1 AS INT)] END
            ELSE NULL END), x -> x IS NOT NULL), ' '),
          '') AS target
      FROM t ORDER BY doc_id"""),
    run = (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 1)
        // two flat lambda passes, MEASURED faster than the "obvious"
        // single-pass array<struct> sharing of the block arithmetic
        // (3.7 s vs 5.0 s at the 10x probe): integer div/mod redo is
        // cheaper under codegen than per-token struct materialization
        .selectExpr("doc_id",
          """concat_ws(' ', filter(transform(sequence(0, size(w) - 1), i ->
               CASE WHEN ((i + doc_id) div 3) % 7 = 0 THEN
                 CASE WHEN i = 0 OR (i + doc_id) % 3 = 0
                   THEN concat('<X_', cast(((i + doc_id) div 3) div 7
                     - ((doc_id div 3) + 6) div 7 as string), '>')
                   ELSE cast(null as string) END
               ELSE element_at(w, cast(i + 1 as int)) END),
             x -> x is not null)) AS input""",
          """concat_ws(' ', filter(transform(sequence(0, size(w) - 1), i ->
               CASE WHEN ((i + doc_id) div 3) % 7 = 0 THEN
                 CASE WHEN i = 0 OR (i + doc_id) % 3 = 0
                   THEN concat('<X_', cast(((i + doc_id) div 3) div 7
                     - ((doc_id div 3) + 6) div 7 as string), '>', ' ',
                     element_at(w, cast(i + 1 as int)))
                   ELSE element_at(w, cast(i + 1 as int)) END
               ELSE cast(null as string) END),
             x -> x is not null)) AS target""")
        .orderBy("doc_id"))

  private val urlCanonical = GraftQuery(
    name = "pipeline_url_canonical",
    doc = "URL CANONICALIZATION dedup (the crawl-side step before " +
      "content dedup: the same page arrives as scheme/host case " +
      "variants, trailing slashes, tracking params, fragments): each " +
      "doc gets a deterministically MESSY url (five doc_id-formula " +
      "variant axes - HTTPS/https, HOST case, trailing /, utm_ " +
      "params, #fragment), canonicalized with native parse_url + " +
      "lower + regexp_replace (lowercase scheme+host, strip trailing " +
      "slash, keep only the real q param, drop fragment), then " +
      "grouped. The oracle PREDICTS every canonical group from the " +
      "same formulas - a green row proves the canonicalizer collapses " +
      "all five messy axes to known ground truth rather than " +
      "comparing two parsers' quirks. Narrow per-row map into one " +
      "groupBy; at 100 TB the canonical url is the dedup/shard key.",
    oracle = Some("""
      WITH c AS (SELECT doc_id,
          'https://host' || (doc_id % 50) || '.example.com/docs/' ||
            (doc_id % 200) || '?q=' || (doc_id % 7) AS curl
        FROM documents)
      SELECT curl, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
      FROM c GROUP BY 1 ORDER BY curl"""),
    run = (s, dir) => {
      val messy = table(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, "https").otherwise("HTTPS"),
          lit("://"),
          when(col("doc_id") % 3 === 0,
            concat(lit("HOST"), col("doc_id") % 50, lit(".EXAMPLE.COM")))
            .otherwise(
              concat(lit("host"), col("doc_id") % 50, lit(".example.com"))),
          lit("/docs/"), col("doc_id") % 200,
          when(col("doc_id") % 4 === 0, "/").otherwise(""),
          lit("?"),
          when(col("doc_id") % 2 === 1,
            concat(lit("utm_source=feed&utm_campaign=x&q="),
              col("doc_id") % 7))
            .otherwise(concat(lit("q="), col("doc_id") % 7)),
          when(col("doc_id") % 5 === 0,
            concat(lit("#sec"), col("doc_id") % 3)).otherwise(""))
          .as("url"))
      messy.select(col("doc_id"),
          concat(
            lower(parse_url(col("url"), lit("PROTOCOL"))), lit("://"),
            lower(parse_url(col("url"), lit("HOST"))),
            regexp_replace(parse_url(col("url"), lit("PATH")),
              "/$", ""),
            lit("?q="), parse_url(col("url"), lit("QUERY"), lit("q")))
            .as("curl"))
        .groupBy("curl")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy("curl")
    })

  private val chunkWindows = GraftQuery(
    name = "pipeline_chunk_windows",
    doc = "Sliding context-window chunking (the sequence-prep step " +
      "before packing a pretraining batch): each document's tokens " +
      "split into windows of 64 with stride 48 (16-token overlap " +
      "between consecutive windows); a window is emitted only while " +
      "it adds at least one new token, and the last window may be " +
      "short. Pure integer arithmetic end to end - window count " +
      "1 + (n-17) div 48 for n > 64 - so the oracle replays it " +
      "exactly via a per-row unnest(range(0, k)) with no window-count " +
      "cap at all; per-row sequence+explode, no shuffle before the " +
      "presentation sort.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n
                 FROM documents),
      c AS (SELECT doc_id, n,
              CASE WHEN n <= 64 THEN 1
                   ELSE 1 + (n - 17) // 48 END AS k FROM t),
      w AS (SELECT doc_id, n, unnest(range(0, k)) AS i FROM c)
      SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             CAST(i * 48 AS BIGINT) AS tok_start,
             CAST(LEAST(i * 48 + 64, n) AS BIGINT) AS tok_end
      FROM w ORDER BY doc_id, chunk_idx"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n"))
      .withColumn("k",
        when(col("n") <= 64, 1L)
          .otherwise(lit(1L) + expr("(n - 17) div 48")))
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0L), col("k") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * 48).as("tok_start"),
        least(col("chunk_idx") * 48 + 64, col("n")).as("tok_end"))
      .orderBy("doc_id", "chunk_idx"))

  private val lengthHistogram = GraftQuery(
    name = "pipeline_length_histogram",
    doc = "Log2-bucketed document-length histogram (the corpus-shape " +
      "profile a mixing/packing plan starts from): bucket = bit length " +
      "of the character count, computed EXACTLY as length(bin(n)) - " +
      "string length of the binary representation - because a " +
      "floating-point floor(log2(n)) can disagree between engines by " +
      "one ulp exactly at the power-of-two bucket boundaries. One " +
      "narrow map + one tiny aggregation.",
    oracle = Some("""
      SELECT CAST(length(bin(length(text))) AS BIGINT) AS bit_bucket,
             COUNT(*) AS n_docs,
             CAST(MIN(length(text)) AS BIGINT) AS min_len,
             CAST(MAX(length(text)) AS BIGINT) AS max_len
      FROM documents GROUP BY 1 ORDER BY 1"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(length(col("text")).as("len"))
      .groupBy(length(bin(col("len").cast(LongType))).cast(LongType)
        .as("bit_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).cast(LongType).as("min_len"),
        max(col("len")).cast(LongType).as("max_len"))
      .orderBy("bit_bucket"))

  private val stratifiedSample = GraftQuery(
    name = "pipeline_stratified_sample",
    doc = "Stratified deterministic sampling: per-language keep rates " +
      "(en 75%, de 50%, rest 25%) applied via the multiplicative-hash " +
      "threshold — RNG-free, reproducible under any cluster or " +
      "partitioning, the primitive a training data mix is built from. " +
      "Reports per-stratum totals; the oracle replays the identical " +
      "integer arithmetic.",
    oracle = Some("""
      WITH s AS (SELECT lang,
                   CASE WHEN (((doc_id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296 <
                     CASE lang WHEN 'en' THEN 3221225472
                               WHEN 'de' THEN 2147483648
                               ELSE 1073741824 END
                   THEN 1 ELSE 0 END AS keep
                 FROM documents)
      SELECT lang, COUNT(*) AS n_total, CAST(SUM(keep) AS BIGINT) AS n_sampled
      FROM s GROUP BY lang ORDER BY lang"""),
    run = (s, dir) => {
      val h = graft.ops.Sampling.hash32(col("doc_id"))
      val thr = when(col("lang") === "en", 3221225472L)
        .when(col("lang") === "de", 2147483648L)
        .otherwise(1073741824L)
      table(s, dir, "documents")
        .select(col("lang"), when(h < thr, 1L).otherwise(0L).as("keep"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_total"), sum(col("keep")).as("n_sampled"))
        .orderBy("lang")
    })

  private val ingestNearDup = GraftQuery(
    name = "pipeline_ingest_neardup",
    doc = "Incremental-ingest NEAR-dup gate: exact Jaccard >= 0.8 pairs " +
      "between a standing corpus (doc_id % 10 != 7) and a new batch " +
      "(doc_id % 10 = 7) - the check every delivery runs before " +
      "appending, complementing pipeline_incremental_ingest's exact-" +
      "hash anti join. Dedicated two-sided prefix path: candidates " +
      "come only from corpus-prefix x batch-prefix collisions under " +
      "the shared union-df rarity order, so the standing corpus is " +
      "never self-joined again. Oracle = exact all-pairs cross " +
      "Jaccard.",
    oracle = Some(ShingleCte + s""",
      p AS (SELECT a.doc_id AS doc_corpus, b.doc_id AS doc_batch,
              len(list_intersect(a.sh, b.sh)) * 1.0 /
                (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jaccard
            FROM s a JOIN s b ON a.doc_id % 10 <> 7 AND b.doc_id % 10 = 7)
      SELECT doc_corpus, doc_batch, jaccard FROM p WHERE jaccard >= $Threshold
      ORDER BY doc_corpus, doc_batch"""),
    run = (s, dir) => {
      val sh = docShingles(s, dir)
      val corpus = sh.filter(col("doc_id") % 10 =!= 7)
        .select(col("doc_id"), col("sh"))
      val batch = sh.filter(col("doc_id") % 10 === 7)
        .select(col("doc_id"), col("sh"))
      Dedup.prefixFilteredJaccardCross(corpus, batch, "doc_id", "sh",
        ThresholdNum, ThresholdDen).orderBy("doc_corpus", "doc_batch")
    })

  private val qualityDupFrac = GraftQuery(
    name = "pipeline_quality_dupfrac",
    doc = "Duplicated-n-gram fraction (exact-substring-dedup signal, " +
      "after Lee et al.'s 'Deduplicating Training Data Makes Language " +
      "Models Better'): per document, the fraction of its distinct " +
      "3-gram shingles that also occur in at least one other document. " +
      "High-fraction docs are boilerplate/templated content that " +
      "pairwise near-dup misses when no single partner crosses the " +
      "Jaccard bar. One exploded pass: df via a window count over the " +
      "8-byte shingle hash (the groupBy+join-back would pay that " +
      "shuffle twice), then a per-doc agg; shuffles carry only longs. " +
      "dup_frac is one double division of two ints - bit-identical in " +
      "DuckDB. Docs with fewer than 3 tokens have no shingles and are " +
      "absent from the output in both engines.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      s AS (SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh FROM t),
      d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY sh) AS df FROM s)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh,
             CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*) AS dup_frac
      FROM d GROUP BY doc_id ORDER BY doc_id"""),
    run = (s, dir) => {
      val ex = docShingles(s, dir, materialize = false)
        .select(col("doc_id"), explode(col("sh")).as("shingle"))
        .select(col("doc_id"), xxhash64(col("shingle")).as("shash"))
      val byShash = Window.partitionBy("shash")
      ex.withColumn("df", count(lit(1)).over(byShash))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_sh"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_sh"), col("n_dup"),
          (col("n_dup").cast(DoubleType) / col("n_sh").cast(DoubleType))
            .as("dup_frac"))
        .orderBy("doc_id")
    })

  private val sourceMix = GraftQuery(
    name = "pipeline_source_mix",
    doc = "Temperature-based data mixing (tau = 0.5): per-language " +
      "target counts proportional to sqrt(n_lang), capped at n_lang - " +
      "the standard rebalance that downsamples dominant languages " +
      "and keeps the tail intact. Targets derive FROM the corpus (one " +
      "tiny agg, broadcast back), unlike pipeline_stratified_sample's " +
      "fixed rates; selection is the multiplicative-hash threshold at " +
      "exact integer rate ts/ns: keep iff hash32(doc_id)*ns < ts*2^32 " +
      "- no window, no per-stratum sort, so no single-task stage when " +
      "one language dominates the corpus. sqrt is IEEE-correctly-" +
      "rounded in both engines, so floor(10*sqrt(n)) is bit-identical; " +
      "everything after is int64 (exact while n_lang < 2^31 per " +
      "stratum, noted at the predicate).",
    oracle = Some("""
      WITH t AS (SELECT lang, COUNT(*) AS ns,
                   LEAST(COUNT(*), CAST(FLOOR(10 * sqrt(CAST(COUNT(*) AS DOUBLE))) AS BIGINT)) AS ts
                 FROM documents GROUP BY lang)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN t USING (lang)
      WHERE ((((d.doc_id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296) * ns
            < ts * 4294967296
      ORDER BY d.doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
      // per-language totals and sqrt-temperature targets: one row per
      // language, broadcast back to the corpus
      val targets = docs.groupBy("lang").agg(count(lit(1)).as("ns"))
        .select(col("lang"), col("ns"),
          least(col("ns"), floor(lit(10) * sqrt(col("ns").cast(DoubleType)))
            .cast(LongType)).as("ts"))
      docs.select(col("doc_id"), col("lang"))
        .join(broadcast(targets), "lang")
        // exact integer rate compare; hash32 < 2^32 and ts <= ns keep
        // both products below 2^63 while ns < 2^31 per stratum
        .filter(graft.ops.Sampling.hash32(col("doc_id")) * col("ns")
          < col("ts") * lit(4294967296L))
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    })

  private val trainingExport = GraftQuery(
    name = "pipeline_training_export",
    doc = "The export stage of a training-data pipeline: length-gated, " +
      "exact-deduped documents inner-joined to their embedding " +
      "modality (doc_id = vec_id) with token counts, embedding " +
      "norm², and the deterministic split — the assembly a trainer " +
      "consumes. Cross-modal join shuffles both sides on the id once; " +
      "at 100 TB both tables are bucketed on it and the join is " +
      "exchange-free (lake_bucketed_join proves that layout).",
    oracle = Some("""
      WITH q AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE len(string_split(text, ' ')) BETWEEN 20 AND 2000),
      keeper AS (
        SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
      j AS (
        SELECT q.doc_id, q.n_tokens,
               list_dot_product(
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                 list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                 AS norm_sq
        FROM q
        JOIN keeper k ON k.doc_id = q.doc_id
        JOIN embeddings e ON e.vec_id = q.doc_id)
      SELECT doc_id, n_tokens, norm_sq,
             CASE WHEN (((doc_id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296 < 3865470566
                  THEN 'train' ELSE 'test' END AS split
      FROM j ORDER BY doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
      val gated = docs
        .select(col("doc_id"), size(TextOps.tokens(col("text")))
          .cast(LongType).as("n_tokens"))
        .filter(col("n_tokens") >= 20 && col("n_tokens") <= 2000)
      val keepers = docs.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val emb = table(s, dir, "embeddings")
        .select(col("vec_id").as("doc_id"),
          VectorOps.asDouble(col("embedding")).as("v"))
        .select(col("doc_id"), VectorOps.dot(col("v"), col("v")).as("norm_sq"))
      gated.join(keepers, "doc_id").join(emb, "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("norm_sq"),
          when(graft.ops.Sampling.hash32(col("doc_id"))
            < lit(3865470566L), "train").otherwise("test").as("split"))
        .orderBy("doc_id")
    })

  // -------------------------------------------------------------------
  // The showcase composition: full corpus-cleaning pipeline.
  // -------------------------------------------------------------------
  private val corpusClean = GraftQuery(
    name = "pipeline_corpus_clean",
    doc = "End-to-end corpus cleaning in ONE query: quality gate " +
      "(token/stopword/TTR thresholds) → exact near-dup pairs among " +
      "survivors → connected components → highest-quality keeper per " +
      "cluster → deterministic train/test split of the keepers. Every " +
      "stage is an operator proven individually elsewhere; this is the " +
      "composition a real training-data pipeline runs nightly. Oracle " +
      "rebuilds the whole chain in SQL (recursive CTE + windows).",
    oracle = Some((s"""
      WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
      q AS (SELECT doc_id, text, w,
              CAST(len(w) AS BIGINT) AS n_tokens,
              CAST(len(list_filter(w, x -> x IN ('the', 'a'))) AS DOUBLE) / len(w) AS stop_ratio,
              CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS ttr
            FROM t),
      keepq AS (SELECT doc_id, text, w FROM q
                WHERE n_tokens >= 20 AND n_tokens <= 2000
                  AND stop_ratio <= 0.3 AND ttr >= 0.2),
      s AS (SELECT doc_id, text, list_distinct(list_transform(range(1, len(w) - 1),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh FROM keepq),
      p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh)) * 1.0 /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= $Threshold),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM p
                UNION ALL SELECT doc_b, doc_a FROM p),
      reach AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
          WHERE e.v <> r.u),
      comp AS (
        SELECT s.doc_id, LEAST(s.doc_id, COALESCE(MIN(r.v), s.doc_id)) AS canonical_id
        FROM s LEFT JOIN reach r ON r.u = s.doc_id
        GROUP BY s.doc_id),
      ranked AS (
        SELECT c.doc_id, c.canonical_id,
               ROW_NUMBER() OVER (PARTITION BY c.canonical_id
                 ORDER BY length(d.text) DESC, d.doc_id) AS rn
        FROM comp c JOIN documents d ON d.doc_id = c.doc_id)
      SELECT doc_id,
             CASE WHEN (((doc_id % 1000000007 + 1000000007) % 1000000007) * 2654435761) % 4294967296 < 3865470566
                  THEN 'train' ELSE 'test' END AS split
      FROM ranked WHERE rn = 1 ORDER BY doc_id""")
      .replaceFirst("WITH", "WITH RECURSIVE")),
    run = (s, dir) => {
      val w = col("w")
      // stage 1: quality gate (same thresholds as pipeline_text_quality)
      val survivors = table(s, dir, "documents")
        .select(col("doc_id"), col("text"), TextOps.tokens(col("text")).as("w"))
        .withColumn("n_tokens", size(w).cast(LongType))
        .withColumn("stop_ratio",
          TextOps.markerHits(w, Seq("the", "a")).cast(DoubleType) /
            size(w).cast(DoubleType))
        .withColumn("ttr", size(array_distinct(w)).cast(DoubleType) /
          size(w).cast(DoubleType))
        .filter(col("n_tokens") >= 20 && col("n_tokens") <= 2000 &&
          col("stop_ratio") <= 0.3 && col("ttr") >= 0.2)
        .withColumn("sh", TextOps.shingles(w, 3))
        // quality is length(text) — precompute the 8-byte value and
        // drop the text bytes BEFORE the pin (r20; guide §2.3): the
        // downstream stages read only (doc_id, sh, q)
        .select(col("doc_id"), length(col("text")).as("q"), col("sh"))
        // survivors feed four downstream stages (pair join x2 sides,
        // components, quality ranking) — materialize the gate once
        .localCheckpoint(true)
      // stage 2-3: exact near-dup pairs among survivors → components
      val pairs = Dedup.prefixFilteredJaccard(survivors, "doc_id", "sh",
        ThresholdNum, ThresholdDen)
      val comp = Dedup.canonicalIds(survivors, "doc_id", pairs,
        "doc_a", "doc_b")
      // stage 4: highest-quality keeper per component
      val quality = survivors.select(col("doc_id"), col("q"))
      val rankW = Window.partitionBy(col("canonical_id"))
        .orderBy(col("q").desc, col("doc_id"))
      val keepers = comp.join(quality, "doc_id")
        .withColumn("rn", row_number().over(rankW))
        .filter(col("rn") === 1)
      // stage 5: deterministic split of the clean corpus
      keepers.select(col("doc_id"),
          when(graft.ops.Sampling.hash32(col("doc_id"))
            < lit(3865470566L), "train").otherwise("test").as("split"))
        .orderBy("doc_id")
    })

  // -------------------------------------------------------------------
  // Multimodal plumbing (binary columns; decode stubbed — see
  // graft.multimodal.MultiModal for the typed pipeline + tests).
  // -------------------------------------------------------------------
  private val multimodalMeta = GraftQuery(
    name = "pipeline_multimodal_meta",
    doc = "Opaque-binary column plumbing (multimodal posture): content " +
      "as BinaryType + typed metadata — byte length, content digest, " +
      "magic-bytes prefix. Here the binary is the UTF-8 encoding of " +
      "documents.text (the container has no media libs — decode is " +
      "stubbed in graft.multimodal.MultiModal); schema, partitioning and " +
      "per-row feature extraction are the real thing.",
    oracle = Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             md5(text) AS content_md5,
             lower(hex(encode(substr(text, 1, 4)))) AS magic
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("doc_id"), col("text").cast(BinaryType).as("content"))
      .select(col("doc_id"),
        length(col("content")).cast(LongType).as("n_bytes"),
        md5(col("content")).as("content_md5"),
        lower(hex(substring(col("content"), 1, 4))).as("magic"))
      .orderBy("doc_id"))

  private val multimodalDecode = GraftQuery(
    name = "pipeline_multimodal_decode",
    doc = "REAL image decode over a binary multimodal column: one " +
      "genuine PNG per document (dimensions and solid fill color are " +
      "pure functions of doc_id), decoded back with the pure-JDK " +
      "javax.imageio codec in a per-partition batch stage " +
      "(graft.multimodal.MultiModal.decodeImages — the mapInPandas " +
      "shape). The oracle predicts the DECODED width/height/channel " +
      "means from the same doc_id formulas, so a green row proves the " +
      "encode→PNG-container→decode round trip pixel-exactly. No stub " +
      "anywhere in this path.",
    oracle = Some("""
      SELECT doc_id,
             CAST(8 + doc_id % 13 AS BIGINT) AS width,
             CAST(8 + doc_id % 7 AS BIGINT) AS height,
             CAST(doc_id % 256 AS BIGINT) AS mean_r,
             CAST((doc_id * 7) % 256 AS BIGINT) AS mean_g,
             CAST((doc_id * 13) % 256 AS BIGINT) AS mean_b
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val ids = table(s, dir, "documents").select(col("doc_id")).as[Long]
      val decoded = graft.multimodal.MultiModal.decodeImages(
        graft.multimodal.MultiModal.syntheticPngAssets(ids))
      // fixture images are solid-color → channel means are exact ints
      decoded.toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r")).cast(LongType).as("mean_r"),
          round(col("mean_g")).cast(LongType).as("mean_g"),
          round(col("mean_b")).cast(LongType).as("mean_b"))
        .orderBy("doc_id")
    })

  private val multimodalResize = GraftQuery(
    name = "pipeline_multimodal_resize",
    doc = "REAL image resize over a binary multimodal column: the " +
      "per-doc PNG (varying source dims 8-20 x 8-14) is decoded, " +
      "Graphics2D-bilinear-scaled to a fixed 16x10 thumbnail, PNG " +
      "re-encoded (graft.multimodal.MultiModal.resize), then decoded " +
      "AGAIN to verify. Solid-color fixtures survive bilinear scaling " +
      "exactly, so the oracle predicts the re-decoded dims and channel " +
      "means from the doc_id formulas — a green row proves the full " +
      "decode->scale->re-encode->decode round trip. No stub anywhere.",
    oracle = Some("""
      SELECT doc_id,
             CAST(16 AS BIGINT) AS width,
             CAST(10 AS BIGINT) AS height,
             CAST(doc_id % 256 AS BIGINT) AS mean_r,
             CAST((doc_id * 7) % 256 AS BIGINT) AS mean_g,
             CAST((doc_id * 13) % 256 AS BIGINT) AS mean_b
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val ids = table(s, dir, "documents").select(col("doc_id")).as[Long]
      val media = graft.multimodal.MultiModal.syntheticPngAssets(ids)
        .map(a => graft.multimodal.MultiModal.MediaAsset(
          a.doc_id, "image", a.content, 0, 0, 0))
      val resized = graft.multimodal.MultiModal
        .resize(media, targetW = 16, targetH = 10)
        .map(a => graft.multimodal.MultiModal.ImageAsset(a.asset_id,
          a.content))
      graft.multimodal.MultiModal.decodeImages(resized).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r")).cast(LongType).as("mean_r"),
          round(col("mean_g")).cast(LongType).as("mean_g"),
          round(col("mean_b")).cast(LongType).as("mean_b"))
        .orderBy("doc_id")
    })

  private val multimodalAudio = GraftQuery(
    name = "pipeline_multimodal_audio",
    doc = "REAL audio decode over a binary multimodal column: one " +
      "genuine RIFF/WAV container per document (sample rate, length and " +
      "constant tone amplitude are pure functions of doc_id), decoded " +
      "back with the pure-JDK javax.sound.sampled stack in a " +
      "per-partition batch stage (graft.multimodal.MultiModal" +
      ".decodeAudio). The oracle predicts the DECODED rate / frame " +
      "count / sample mean / peak from the same formulas, so a green " +
      "row proves the PCM encode->WAV-container->decode round trip " +
      "sample-exactly.",
    oracle = Some("""
      SELECT doc_id,
             CAST(8000 + (doc_id % 4) * 4000 AS BIGINT) AS sample_rate,
             CAST(64 + doc_id % 97 AS BIGINT) AS n_samples,
             CAST((doc_id % 2001) - 1000 AS BIGINT) AS mean_sample,
             CAST(abs((doc_id % 2001) - 1000) AS BIGINT) AS peak_sample
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val ids = table(s, dir, "documents").select(col("doc_id")).as[Long]
      val decoded = graft.multimodal.MultiModal.decodeAudio(
        graft.multimodal.MultiModal.syntheticWavAssets(ids))
      // constant-tone fixtures → the sample mean is an exact integer
      decoded.toDF()
        .select(col("doc_id"), col("sample_rate"), col("n_samples"),
          round(col("mean_sample")).cast(LongType).as("mean_sample"),
          col("peak_sample"))
        .orderBy("doc_id")
    })

  private val tokenEntropy = GraftQuery(
    name = "pipeline_token_entropy",
    doc = "Per-doc SHANNON token entropy H = sum (c/n) * ln(n/c) nats " +
      "- the information-density quality signal (low entropy = " +
      "repetitive/templated text; complements quality_repetition's " +
      "top-bigram fraction with a whole-distribution measure). Second " +
      "user of TOLERANCE MODE, and the harder case: beyond ln's 1-ULP " +
      "cross-engine drift, the per-doc SUM of double terms is " +
      "order-dependent (Spark folds in partition order, DuckDB in its " +
      "own) - but all terms are POSITIVE, so the condition number is " +
      "1 and reordering error is bounded by n_distinct*eps ~ 1e-14 " +
      "relative at 200-token docs: four orders inside the rtol-1e-9 " +
      "gate at ANY partitioning, every run. The integer columns " +
      "(n_tok, n_distinct) still compare exactly, and the whole " +
      "integer skeleton additionally ships under the driver's DEFAULT " +
      "exact-hash gate as the twin pipeline_token_entropy_exact (r14 " +
      "verdict #1). Scale: two partial-aggregable groupBys and one " +
      "doc_id join - the tfidf/vocab shuffle shape, nothing new at " +
      "100 TB.",
    tolerance = Some(1e-9),
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok GROUP BY doc_id, token),
      dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS n_distinct
             FROM tf GROUP BY doc_id)
      SELECT d.doc_id, d.n AS n_tok, d.n_distinct,
             SUM((CAST(f.c AS DOUBLE) / CAST(d.n AS DOUBLE))
                 * ln(CAST(d.n AS DOUBLE) / CAST(f.c AS DOUBLE)))
               AS entropy
      FROM tf f JOIN dl d USING (doc_id)
      GROUP BY d.doc_id, d.n, d.n_distinct ORDER BY d.doc_id"""),
    run = (s, dir) => {
      // tf feeds the doc-length aggregate and the scoring join — cut
      // once (the tfidf convention)
      val tf = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val dl = tf.groupBy("doc_id")
        .agg(sum("c").as("n"), count(lit(1)).as("n_distinct"))
      val cD = col("c").cast(DoubleType)
      val nD = col("n").cast(DoubleType)
      tf.join(dl, "doc_id")
        .groupBy("doc_id", "n", "n_distinct")
        .agg(sum((cD / nD) * log(nD / cD)).as("entropy"))
        .select(col("doc_id"), col("n").as("n_tok"), col("n_distinct"),
          col("entropy"))
        .orderBy("doc_id")
    })

  private val tokenEntropyExact = GraftQuery(
    name = "pipeline_token_entropy_exact",
    doc = "EXACT-HASH TWIN of pipeline_token_entropy (r14 verdict #1): " +
      "the same tf frame projected onto its bit-portable integer " +
      "skeleton, plus two exact whole-distribution signals the float " +
      "entropy cannot ship under the default gate - top_c (the modal " +
      "token count, quality_repetition's unigram analogue) and c2_sum " +
      "= sum(c^2), the Simpson/collision mass whose ratio to n^2 is " +
      "the exact-rational counterpart of entropy's concentration " +
      "measure. A defect in tokenization or the tf aggregation fails " +
      "THIS row's hash; the entropy float itself stays under the " +
      "twin's rtol-1e-9 differential.",
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
             FROM tok GROUP BY doc_id, token)
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_c,
             CAST(SUM(c * c) AS BIGINT) AS c2_sum
      FROM tf GROUP BY doc_id ORDER BY doc_id"""),
    run = (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(sum("c").as("n_tok"), count(lit(1)).as("n_distinct"),
          max("c").as("top_c"), sum(col("c") * col("c")).as("c2_sum"))
        .orderBy("doc_id"))

  private val qualityRepetition = GraftQuery(
    name = "pipeline_quality_repetition",
    doc = "Repetition-based quality signal (the Gopher-style filter " +
      "family): per-document bigram counts WITH multiplicity, top " +
      "bigram frequency and its fraction of all bigrams - high " +
      "repetition marks boilerplate/spam for the corpus gate. One " +
      "explode + two aggregations, shuffled on (doc_id, bigram) then " +
      "doc_id; the ratio is an exact IEEE division of two integers so " +
      "the oracle matches bit for bit.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      b AS (SELECT doc_id, unnest(list_transform(range(1, len(w)),
              i -> w[i] || ' ' || w[i+1])) AS bg
            FROM t WHERE len(w) >= 2),
      c AS (SELECT doc_id, bg, COUNT(*) AS n FROM b GROUP BY 1, 2)
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams,
             CAST(MAX(n) AS BIGINT) AS top_n,
             CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS rep_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id"""),
    run = (s, dir) => {
      val w = TextOps.tokens(col("text"))
      val bigrams = transform(
        sequence(lit(0), size(col("w")) - 2),
        i => concat(element_at(col("w"), i + 1), lit(" "),
          element_at(col("w"), i + 2)))
      table(s, dir, "documents")
        .select(col("doc_id"), w.as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("top_n"))
        .select(col("doc_id"), col("n_bigrams"), col("top_n"),
          (col("top_n").cast(DoubleType) /
            col("n_bigrams").cast(DoubleType)).as("rep_ratio"))
        .orderBy("doc_id")
    })

  private val decontaminate = GraftQuery(
    name = "pipeline_decontaminate",
    doc = "Benchmark decontamination (the eval-integrity pass every " +
      "training corpus needs): training documents (doc_id >= 20) are " +
      "flagged when they share ANY distinct 5-gram with the benchmark " +
      "set (doc_id < 20). The benchmark 5-gram set is tiny and " +
      "broadcasts; the training side joins on the 8-byte xxhash64 of " +
      "the shingle (same 2^-64 collision posture as the dedup joins), " +
      "so at 100 TB this is one broadcast semi-join over an exploded " +
      "narrow column. The oracle replays membership on the raw strings.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 3),
              i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                   w[i+3] || ' ' || w[i+4])) AS sh
            FROM t WHERE len(w) >= 5),
      ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
      bench AS (SELECT DISTINCT g FROM ex WHERE doc_id < 20),
      cont AS (SELECT DISTINCT e.doc_id FROM ex e JOIN bench b USING (g)
               WHERE e.doc_id >= 20)
      SELECT d.doc_id,
             CAST(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END
               AS BIGINT) AS contaminated
      FROM documents d LEFT JOIN cont c USING (doc_id)
      WHERE d.doc_id >= 20 ORDER BY d.doc_id"""),
    run = (s, dir) => {
      val ex = decontamShingles(s, dir)
      val bench = ex.filter(col("doc_id") < 20).select("gh").distinct()
      val cont = ex.filter(col("doc_id") >= 20)
        .join(broadcast(bench), "gh")
        .select("doc_id").distinct()
        .withColumn("c", lit(1L))
      decontamVerdict(s, dir, cont)
    })

  /** Hashed exploded 5-gram shingles feeding BOTH the benchmark set and
    * the training side — cut once (shared-prefix convention); shared by
    * the broadcast and bloom-gated decontamination variants. */
  private def decontamShingles(s: SparkSession, dir: String): DataFrame = {
    val w = TextOps.tokens(col("text"))
    table(s, dir, "documents")
      .select(col("doc_id"), w.as("w"))
      .filter(size(col("w")) >= 5)
      .select(col("doc_id"),
        explode(TextOps.shingles(col("w"), 5)).as("g"))
      .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      .localCheckpoint(true)
  }

  /** Left-join the contaminated-id set back onto the training docs →
    * the (doc_id, contaminated) verdict both variants emit. */
  private def decontamVerdict(s: SparkSession, dir: String,
      cont: DataFrame): DataFrame =
    table(s, dir, "documents").select(col("doc_id"))
      .filter(col("doc_id") >= 20)
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("c"), lit(0L)).as("contaminated"))
      .orderBy("doc_id")

  private val decontamBloom = GraftQuery(
    name = "pipeline_decontam_bloom",
    doc = "pipeline_decontaminate's posture when the BENCHMARK side is " +
      "itself too large to broadcast (contamination registries reach " +
      "hundreds of millions of n-grams): a bloom filter of the " +
      "benchmark shingle hashes (graft.ops.RuntimeFilters - the bitmap " +
      "stays ~1 MB regardless of set size) prefilters the training " +
      "side's exploded shingles BEFORE the exact verify join, which " +
      "runs as a shuffle join of survivors only - the join's input " +
      "shrinks to the contamination rate instead of the corpus size. " +
      "Bloom false positives are removed by the exact join, so output " +
      "and ORACLE are identical to pipeline_decontaminate - the " +
      "pruned and broadcast variants are differentially proven " +
      "equivalent every round.",
    oracle = decontaminate.oracle,
    run = (s, dir) => {
      val ex = decontamShingles(s, dir)
      // bench feeds two consumers (the eager bloom build and the verify
      // join): pin the distinct set once or the filter+distinct shuffle
      // re-runs per consumer (docShingles convention)
      val bench = ex.filter(col("doc_id") < 20).select("gh").distinct()
        .localCheckpoint(true)
      val train = ex.filter(col("doc_id") >= 20)
      val pruned = graft.ops.RuntimeFilters.bloomPruned(
        train, col("gh"), bench, col("gh"))
      // shuffle_hash, not broadcast: models the big-bench case the
      // bloom exists for (only pruned survivors shuffle)
      val cont = pruned.join(bench.hint("shuffle_hash"), "gh")
        .select("doc_id").distinct()
        .withColumn("c", lit(1L))
      decontamVerdict(s, dir, cont)
    })

  private val decontamOverlap = GraftQuery(
    name = "pipeline_decontam_overlap",
    doc = "OVERLAP-FRACTION decontamination - the published-protocol " +
      "refinement of pipeline_decontaminate's any-hit rule: long " +
      "13-gram shingles (an accidental 13-token collision is " +
      "vanishingly unlikely, so a hit means real copying) and a " +
      "PER-DOC overlap fraction n_hit/n_13 (distinct 13-grams shared " +
      "with the benchmark over the doc's distinct 13-grams), flagged " +
      "contaminated iff the fraction clears 10% - the integer compare " +
      "10*n_hit >= n_13, so the verdict never touches a double; the " +
      "reported fraction is one division of two exact BIGINTs (both " +
      "engines round identically). Runs on the bloom-gated shape " +
      "pipeline_decontam_bloom proved (registry-scale benchmark side: " +
      "bloom prefilter, then an exact shuffle join of survivors only); " +
      "per-doc aggregation is one partial-aggregable count. The " +
      "oracle replays membership on raw 13-gram strings.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      s AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 11),
              i -> array_to_string(w[i:i+12], ' '))) AS sh
            FROM t WHERE len(w) >= 13),
      n13 AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_13 FROM s),
      ex AS (SELECT doc_id, unnest(sh) AS g FROM s),
      bench AS (SELECT DISTINCT g FROM ex WHERE doc_id < 20),
      hit AS (SELECT e.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit
              FROM ex e JOIN bench b USING (g) WHERE e.doc_id >= 20
              GROUP BY e.doc_id)
      SELECT n.doc_id, n.n_13, COALESCE(h.n_hit, 0) AS n_hit,
             CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(n.n_13 AS DOUBLE)
               AS overlap_frac,
             CAST(10 * COALESCE(h.n_hit, 0) >= n.n_13 AS BIGINT)
               AS contaminated
      FROM n13 n LEFT JOIN hit h USING (doc_id)
      WHERE n.doc_id >= 20 ORDER BY n.doc_id"""),
    run = (s, dir) => {
      val w = TextOps.tokens(col("text"))
      // distinct 13-gram arrays, cut once: feeds n_13, the benchmark
      // set AND the training explode (shared-prefix convention)
      val base = table(s, dir, "documents")
        .select(col("doc_id"), w.as("w"))
        .filter(size(col("w")) >= 13)
        .select(col("doc_id"), TextOps.shingles(col("w"), 13).as("sh"))
        .localCheckpoint(true)
      val n13 = base.select(col("doc_id"),
        size(col("sh")).cast(LongType).as("n_13"))
      val ex = base
        .select(col("doc_id"), explode(col("sh")).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("gh"))
      val bench = ex.filter(col("doc_id") < 20).select("gh").distinct()
        .localCheckpoint(true) // eager bloom build + verify join
      val train = ex.filter(col("doc_id") >= 20)
      val pruned = graft.ops.RuntimeFilters.bloomPruned(
        train, col("gh"), bench, col("gh"))
      // exact verify join removes bloom false positives; shuffle_hash
      // models the registry-scale benchmark side (decontam_bloom)
      val hits = pruned.join(bench.hint("shuffle_hash"), "gh")
        .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
      n13.filter(col("doc_id") >= 20)
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_13"),
          coalesce(col("n_hit"), lit(0L)).as("n_hit"),
          (coalesce(col("n_hit"), lit(0L)).cast(DoubleType) /
            col("n_13").cast(DoubleType)).as("overlap_frac"),
          (lit(10L) * coalesce(col("n_hit"), lit(0L)) >= col("n_13"))
            .cast(LongType).as("contaminated"))
        .orderBy("doc_id")
    })

  private val piiScrub = GraftQuery(
    name = "pipeline_pii_scrub",
    doc = "PII redaction over document text (the compliance pass every " +
      "training corpus runs before export): emails, phone numbers and " +
      "IPv4 addresses replaced by typed placeholders via a chained " +
      "regexp_replace pipeline - pure per-row, codegen-resident, zero " +
      "shuffles before the presentation sort. The fixture injects one " +
      "deterministic email (doc_id formula) plus a phone and an IP " +
      "into every document so the scrub is provably exercised; the " +
      "oracle replays injection + all three scrubs with DuckDB's " +
      "'g'-flag regexp_replace on the same POSIX-common patterns and " +
      "md5-compares the scrubbed text.",
    oracle = Some("""
      WITH t AS (SELECT doc_id,
          text || ' contact user' || doc_id ||
            '@example.com or 555-123-4567 at 10.0.' ||
            (doc_id % 256) || '.1' AS raw
        FROM documents),
      s AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
          raw,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
          '\b\d+\.\d+\.\d+\.\d+\b', '<IP>', 'g') AS scrubbed,
          raw FROM t)
      SELECT doc_id, md5(scrubbed) AS scrubbed_md5,
             CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
               AS BIGINT) AS n_email,
             CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{3}-\d{4}\b'))
               AS BIGINT) AS n_phone,
             CAST(len(regexp_extract_all(raw, '\b\d+\.\d+\.\d+\.\d+\b'))
               AS BIGINT) AS n_ip
      FROM s ORDER BY doc_id"""),
    run = (s, dir) => {
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
      val ipRe = "\\b\\d+\\.\\d+\\.\\d+\\.\\d+\\b"
      table(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or 555-123-4567 at 10.0."),
            col("doc_id") % 256, lit(".1")).as("raw"))
        .select(col("doc_id"),
          md5(regexp_replace(regexp_replace(regexp_replace(
            col("raw"),
            emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
            ipRe, "<IP>")).as("scrubbed_md5"),
          regexp_count(col("raw"), lit(emailRe)).cast(LongType)
            .as("n_email"),
          regexp_count(col("raw"), lit(phoneRe)).cast(LongType)
            .as("n_phone"),
          regexp_count(col("raw"), lit(ipRe)).cast(LongType).as("n_ip"))
        .orderBy("doc_id")
    })

  private val embedQuantize = GraftQuery(
    name = "pipeline_embed_quantize",
    doc = "Int8 scalar quantization of the embedding column (the " +
      "storage/serving compression every vector corpus applies before " +
      "ANN indexing): per-vector scale = max(|v_i|), quantized value = " +
      "floor(v_i / scale * 127) - all IEEE double ops applied to " +
      "identical inputs in identical order, so DuckDB replays the " +
      "quantization bit for bit (floor, unlike round, has no half-way " +
      "tie mode to disagree on). Emitted exploded (vec_id, dim, q, " +
      "scale) so every scalar is hash-compared. Per-row narrow map at " +
      "scale; zero-vector guard mirrored in both engines.",
    oracle = Some("""
      WITH e AS (SELECT vec_id, embedding,
                   list_max(list_transform(embedding,
                     x -> abs(CAST(x AS DOUBLE)))) AS scale
                 FROM embeddings)
      SELECT e.vec_id, CAST(t.i AS BIGINT) AS dim,
             CASE WHEN e.scale = 0 THEN 0
                  ELSE CAST(FLOOR(CAST(e.embedding[t.i + 1] AS DOUBLE)
                         / e.scale * 127) AS BIGINT) END AS q,
             e.scale
      FROM e CROSS JOIN range(0, 64) t(i)
      ORDER BY e.vec_id, dim"""),
    run = (s, dir) => {
      val scale = array_max(transform(col("embedding"),
        x => abs(x.cast(DoubleType))))
      table(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"), scale.as("scale"))
        .select(col("vec_id"), col("scale"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim").cast(LongType).as("dim"),
          when(col("scale") === 0, 0L)
            .otherwise(floor(col("x").cast(DoubleType) / col("scale")
              * lit(127)).cast(LongType)).as("q"),
          col("scale"))
        .orderBy("vec_id", "dim")
    })

  private val multimodalVideo = GraftQuery(
    name = "pipeline_multimodal_video",
    doc = "REAL video-frame decode + keyframe sampling over a binary " +
      "multimodal column: one genuine multi-frame container (animated " +
      "GIF - the pure-JDK multi-frame codec) per document, frame " +
      "count / dims / per-frame solid colors all pure functions of " +
      "doc_id. The decode stage walks every frame with the actual " +
      "javax.imageio reader and emits every 2nd frame as a row (the " +
      "keyframe-sampling shape). The oracle predicts the sampled " +
      "frames' indices, dims and channel means from the same formulas " +
      "- a green row proves the full multi-frame encode->decode->" +
      "sample loop. With this, all three media kinds decode for real; " +
      "the byte-derived fallback remains only for corrupt input.",
    oracle = Some("""
      SELECT d.doc_id,
             CAST(t.i AS BIGINT) AS frame_idx,
             CAST(2 + d.doc_id % 5 AS BIGINT) AS n_frames,
             CAST(8 + d.doc_id % 11 AS BIGINT) AS width,
             CAST(8 + d.doc_id % 6 AS BIGINT) AS height,
             CAST((d.doc_id + 17 * t.i) % 256 AS BIGINT) AS mean_r,
             CAST((d.doc_id * 7 + 29 * t.i) % 256 AS BIGINT) AS mean_g,
             CAST((d.doc_id * 13 + 23 * t.i) % 256 AS BIGINT) AS mean_b
      FROM documents d CROSS JOIN range(0, 6) t(i)
      WHERE t.i < 2 + d.doc_id % 5 AND t.i % 2 = 0
      ORDER BY d.doc_id, frame_idx"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val ids = table(s, dir, "documents").select(col("doc_id")).as[Long]
      val sampled = graft.multimodal.MultiModal.sampleVideoFrames(
        graft.multimodal.MultiModal.syntheticGifAssets(ids), stride = 2)
      // solid-color frames → channel means are exact ints
      sampled.toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_frames"),
          col("width"), col("height"),
          round(col("mean_r")).cast(LongType).as("mean_r"),
          round(col("mean_g")).cast(LongType).as("mean_g"),
          round(col("mean_b")).cast(LongType).as("mean_b"))
        .orderBy("doc_id", "frame_idx")
    })

  /** Coreset size for [[diverseCoreset]]. Kept small so the oracle's
    * unrolled round CTEs stay readable; the algorithm is k-generic. */
  private val CoresetK = 4

  private val diverseCoreset = GraftQuery(
    name = "pipeline_diverse_coreset",
    doc = "Diversity-maximizing coreset selection via greedy k-center " +
      s"(Gonzalez): seed with the lowest vec_id, then $CoresetK-1 " +
      "rounds of pick-the-point-farthest-from-its-nearest-selected - " +
      "the data-curation primitive for maximally-diverse exemplar " +
      "subsets (dedup's complement: keep the SPREAD, not drop the " +
      "copies; 2-approximation of the optimal k-center cover). " +
      "Arithmetic is exact end-to-end: int8-quantized vectors " +
      "(KMeans.quantize's floor(x*127)), squared L2 via the dot " +
      "identity saa - 2ab + sbb in integers (magnitudes <= 64*254^2, " +
      "double-exact too, so DuckDB's list_dot_product replays " +
      "bit-for-bit), argmax tie-broken on lowest vec_id. Each round " +
      "is ONE narrow pass: the min-distance column updates against " +
      "the single newly-selected vector (broadcast as a literal) and " +
      "a partial-aggregable max(struct) carries the winner AND its " +
      "vector out, so a round costs one map + one tiny agg - k scans " +
      "total, the standard greedy k-center cost; at huge k you shard " +
      "via pipeline_kmeans_train cells first. Output: (round, vec_id, " +
      "sep) where sep is the selected point's squared distance to the " +
      "prior set - the coverage-radius curve quality teams monitor.",
    oracle = Some("""
      WITH d AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS DOUBLE)) AS dv
           FROM embeddings),
      e AS (SELECT vec_id, dv,
              CAST(list_dot_product(dv, dv) AS BIGINT) AS saa FROM d),
      c1 AS (SELECT vec_id, dv, saa FROM e ORDER BY vec_id LIMIT 1),
      m1 AS (SELECT p.vec_id, p.dv, p.saa,
               CAST(p.saa - 2 * list_dot_product(p.dv, c.dv) + c.saa
                 AS BIGINT) AS md
             FROM e p, c1 c),
      c2 AS (SELECT vec_id, dv, saa, md FROM m1
             WHERE vec_id NOT IN (SELECT vec_id FROM c1)
             ORDER BY md DESC, vec_id LIMIT 1),
      m2 AS (SELECT p.vec_id, p.dv, p.saa,
               LEAST(p.md, CAST(p.saa - 2 * list_dot_product(p.dv, c.dv)
                 + c.saa AS BIGINT)) AS md
             FROM m1 p, c2 c),
      c3 AS (SELECT vec_id, dv, saa, md FROM m2
             WHERE vec_id NOT IN (SELECT vec_id FROM c1
                                  UNION SELECT vec_id FROM c2)
             ORDER BY md DESC, vec_id LIMIT 1),
      m3 AS (SELECT p.vec_id, p.dv, p.saa,
               LEAST(p.md, CAST(p.saa - 2 * list_dot_product(p.dv, c.dv)
                 + c.saa AS BIGINT)) AS md
             FROM m2 p, c3 c),
      c4 AS (SELECT vec_id, md FROM m3
             WHERE vec_id NOT IN (SELECT vec_id FROM c1
                                  UNION SELECT vec_id FROM c2
                                  UNION SELECT vec_id FROM c3)
             ORDER BY md DESC, vec_id LIMIT 1)
      SELECT CAST(1 AS BIGINT) AS round, vec_id, CAST(0 AS BIGINT) AS sep
        FROM c1
      UNION ALL SELECT CAST(2 AS BIGINT), vec_id, md FROM c2
      UNION ALL SELECT CAST(3 AS BIGINT), vec_id, md FROM c3
      UNION ALL SELECT CAST(4 AS BIGINT), vec_id, md FROM c4
      ORDER BY round"""),
    run = (s, dir) => {
      // same clamped int8 quantization as KMeans.quantize (|q| <= 127
      // underwrites the 64*254^2 magnitude bound above; un-clamped, a
      // corrupt 1e18 coordinate overflows the Long floor under ANSI)
      val prep = table(s, dir, "embeddings").select(col("vec_id"),
          transform(col("embedding"),
            x => floor(least(greatest(x.cast(DoubleType), lit(-1.0)),
              lit(1.0)) * 127).cast(LongType)).as("qv"))
        .withColumn("saa", graft.functions.VectorExpressions.dotLong(
          col("qv"), col("qv")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // squared L2 to ONE selected vector via the dot identity - the
      // center rides into the plan as a literal, nothing shuffles
      def distTo(sv: Seq[Long], sSaa: Long): Column =
        col("saa") - lit(2L) * graft.functions.VectorExpressions.dotLong(
          col("qv"), typedlit(sv)) + lit(sSaa)
      val seed = prep.orderBy("vec_id").head()
      var selVec = seed.getSeq[Long](1)
      var selSaa = seed.getLong(2)
      val picked = scala.collection.mutable.ArrayBuffer(
        (1L, seed.getLong(0), 0L))
      var cur = prep.withColumn("md", distTo(selVec, selSaa))
      for (r <- 2 to CoresetK) {
        val ids = picked.map(_._2).toSeq
        // max(struct) is partial-aggregable and carries the winning
        // vector out with the argmax - one job per round, no lookup
        val top = cur.filter(!col("vec_id").isInCollection(ids))
          .agg(max(struct(col("md"), (-col("vec_id")).as("ni"),
            col("vec_id"), col("qv"), col("saa"))).as("m"))
          .select(col("m.md"), col("m.vec_id"), col("m.qv"), col("m.saa"))
          .head()
        selVec = top.getSeq[Long](2)
        selSaa = top.getLong(3)
        picked += ((r.toLong, top.getLong(1), top.getLong(0)))
        cur = cur.withColumn("md", least(col("md"), distTo(selVec, selSaa)))
      }
      import s.implicits._
      picked.toSeq.toDF("round", "vec_id", "sep").orderBy("round")
    })

  private val kmeansTrain = GraftQuery(
    name = "pipeline_kmeans_train",
    doc = "IVF centroid TRAINING via integer-exact Lloyd's k-means (k=8, " +
      "2 rounds, first-k seed) over int8-quantized embeddings - the " +
      "step that produces the cells pipeline_knn_ivf partitions by. " +
      "Centroids are exact (count, integer-sum) pairs, never rounded " +
      "means; nearest-centroid uses the scaled form sum((n*x - s)^2)/n^2 " +
      "whose numerator is order-independent integer math and whose " +
      "single double division is correctly rounded - so DuckDB replays " +
      "both assignment rounds bit for bit. Per round: one k-row " +
      "broadcast + map-side min_by argmin + one fixed-width (cid, dim) " +
      "shuffle; the whole train is one lazy plan, no driver state.",
    oracle = Some("""
      WITH pts AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings),
      c0 AS (SELECT vec_id AS cid, CAST(1 AS BIGINT) AS n, q AS sv
             FROM pts WHERE vec_id < 8),
      a1 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c0 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b1 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a1) WHERE rk = 1),
      e1 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b1 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c1 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e1 GROUP BY cid),
      a2 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c1 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b2 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a2) WHERE rk = 1),
      e2 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b2 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i)
      SELECT cid, CAST(dim AS BIGINT) AS dim, CAST(sx AS BIGINT) AS s_sum,
             CAST(cnt AS BIGINT) AS n_members
      FROM e2 ORDER BY cid, dim"""),
    run = (s, dir) => {
      import graft.ops.KMeans
      val cent = KMeans.train(
        KMeans.quantize(table(s, dir, "embeddings")), k = 8, iters = 2,
        dims = 64)
      cent.select(col("cid"), col("n"),
          posexplode(col("sv")).as(Seq("dim", "s_sum")))
        .select(col("cid"), col("dim").cast(LongType).as("dim"),
          col("s_sum").cast(LongType).as("s_sum"),
          col("n").cast(LongType).as("n_members"))
        .orderBy("cid", "dim")
    })

  /** The PQ CTE chain shared by pipeline_embed_pq and pipeline_pq_recall
    * (one definition — Spark and DuckDB move together): int8 quantize →
    * m=8 subspaces × 8 dims → per-subspace Lloyd (k=16 first-k seed,
    * 2 rounds, the kmeans_train arithmetic keyed by `sub`) → final
    * codeword assignment as `codes`. */
  /** Per-subspace Lloyd chain (c0 → codes), shared verbatim by the
    * plain-PQ and permuted-PQ (OPQ-lite) oracles — both define `sp`
    * (vec_id, sub, q) upstream and the chain is layout-blind, exactly
    * like the Spark-side `Pq.train/encode`. */
  private val PqChainCtes = """
      c0 AS (SELECT sub, vec_id AS cid, CAST(1 AS BIGINT) AS n, q AS sv
             FROM sp WHERE vec_id < 16),
      a1 AS (SELECT p.vec_id, p.sub, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM sp p JOIN c0 c ON c.sub = p.sub CROSS JOIN range(0, 8) t(i)
             GROUP BY p.vec_id, p.sub, c.cid),
      b1 AS (SELECT vec_id, sub, cid FROM (
               SELECT vec_id, sub, cid, row_number() OVER (
                 PARTITION BY vec_id, sub
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a1) WHERE rk = 1),
      e1 AS (SELECT b.sub, b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b1 b JOIN sp p ON p.vec_id = b.vec_id AND p.sub = b.sub
               CROSS JOIN range(0, 8) t(i)
             GROUP BY b.sub, b.cid, t.i),
      c1 AS (SELECT sub, cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e1 GROUP BY sub, cid),
      a2 AS (SELECT p.vec_id, p.sub, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM sp p JOIN c1 c ON c.sub = p.sub CROSS JOIN range(0, 8) t(i)
             GROUP BY p.vec_id, p.sub, c.cid),
      b2 AS (SELECT vec_id, sub, cid FROM (
               SELECT vec_id, sub, cid, row_number() OVER (
                 PARTITION BY vec_id, sub
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a2) WHERE rk = 1),
      e2 AS (SELECT b.sub, b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b2 b JOIN sp p ON p.vec_id = b.vec_id AND p.sub = b.sub
               CROSS JOIN range(0, 8) t(i)
             GROUP BY b.sub, b.cid, t.i),
      c2 AS (SELECT sub, cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e2 GROUP BY sub, cid),
      a3 AS (SELECT p.vec_id, p.sub, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM sp p JOIN c2 c ON c.sub = p.sub CROSS JOIN range(0, 8) t(i)
             GROUP BY p.vec_id, p.sub, c.cid),
      codes AS (SELECT vec_id, sub, cid AS code FROM (
               SELECT vec_id, sub, cid, row_number() OVER (
                 PARTITION BY vec_id, sub
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a3) WHERE rk = 1)"""

  /** Int8-quantized pts head over the float embeddings — the shared
    * base relation of the PQ/OPQ oracle chains. */
  private val QuantPtsCte = """
      WITH pts AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings),"""

  /** Contiguous subspace slicing + the Lloyd chain — source-blind:
    * composes with ANY `pts` head (quantized floats above, or the
    * integer anisotropic fixture below). */
  private val PqSpChainCtes = """
      sp AS (SELECT vec_id, t.sub, q[(t.sub*8+1):(t.sub*8+8)] AS q
             FROM pts CROSS JOIN range(0, 8) t(sub)),""" + PqChainCtes

  private val PqOracleCtes = QuantPtsCte + PqSpChainCtes

  /** The OPQ-lite prefix: exact variance surrogate per dim, snake
    * assignment of ranked dims to subspaces, permuted `sp` — the same
    * chain follows. */
  /** Variance-snake permutation + permuted slicing + the Lloyd chain —
    * source-blind like [[PqSpChainCtes]]. */
  private val OpqMapChainCtes = """
      dv AS (SELECT t.i AS dim,
               COUNT(*) * SUM(q[t.i+1] * q[t.i+1])
                 - SUM(q[t.i+1]) * SUM(q[t.i+1]) AS v
             FROM pts CROSS JOIN range(0, 64) t(i) GROUP BY t.i),
      rk AS (SELECT dim, row_number() OVER (ORDER BY v DESC, dim) - 1 AS r
             FROM dv),
      mp AS (SELECT dim,
               CASE WHEN (r // 8) % 2 = 0 THEN r % 8
                    ELSE 7 - r % 8 END AS sub,
               r // 8 AS pos
             FROM rk),
      sp AS (SELECT p.vec_id, m.sub, list(p.q[m.dim+1] ORDER BY m.pos) AS q
             FROM pts p CROSS JOIN mp m GROUP BY p.vec_id, m.sub),""" +
    PqChainCtes

  private val OpqOracleCtes = QuantPtsCte + OpqMapChainCtes

  /** ANISOTROPIC integer corpus (r15 verdict #5) — the fixture on
    * which the OPQ permutation has something to fix: dimension d of
    * vector i is the shared 32-bit hash of (i·64 + d) folded into
    * [-A(d), A(d)] with the amplitude ladder A(d) = 127 div (1 + d),
    * so per-dim variance falls ~(1+d)⁻² and CONTIGUOUS subspace 0
    * holds ~4000× the variance of subspace 7 — plain PQ spends all 16
    * codewords of the tail subspaces on near-constant dims while
    * subspace 0 underfits; the snake permutation deals one dim from
    * each variance octile to every subspace. Integer-exact end to end
    * (hash, ladder, fold), so the exact-hash gate replays it bit for
    * bit; cap-gated like every recall audit. The ISOTROPIC pair
    * (pipeline_pq_recall / pipeline_opq_recall, real embeddings)
    * stays registered as the control where the permutation is ~free. */
  private val AnisoPtsCte = s"""
      WITH pts AS (SELECT vec_id, list_transform(range(0, 64), d -> CAST(
             ((((vec_id * 64 + d) % 1000000007 + 1000000007) % 1000000007)
               * 2654435761) % 4294967296
               % (2 * (127 // (1 + d)) + 1) - (127 // (1 + d)) AS BIGINT)) AS q
           FROM embeddings
           WHERE ${Sampling.hash32Sql("vec_id")} <
             ${Sampling.capThresholdSql(BaselineVecCap,
               "SELECT COUNT(*) FROM embeddings")}),"""

  private val AnisoPqOracleCtes = AnisoPtsCte + PqSpChainCtes
  private val AnisoOpqOracleCtes = AnisoPtsCte + OpqMapChainCtes

  /** Spark twin of [[AnisoPtsCte]]'s value formula (`div` is Spark
    * SQL's integer division, `//` DuckDB's — same semantics on the
    * non-negative operands here). */
  private def anisoPts(s: SparkSession, dir: String): DataFrame =
    cappedEmb(s, dir).select(col("vec_id"))
      .withColumn("q", expr(
        """transform(sequence(0, 63), d -> CAST(
             ((((vec_id * 64 + d) % 1000000007 + 1000000007) % 1000000007)
               * 2654435761) % 4294967296
               % (2 * (127 div (1 + d)) + 1) - (127 div (1 + d)) AS BIGINT))"""))

  private val embedPq = GraftQuery(
    name = "pipeline_embed_pq",
    doc = "PRODUCT QUANTIZATION (r14 verdict #2, the next ANN rung past " +
      "int8 + IVF): each 64-dim embedding splits into m=8 contiguous " +
      "8-dim subspaces; a per-subspace codebook is trained with the " +
      "SAME integer-exact Lloyd as pipeline_kmeans_train (exact (n, " +
      "sum-q) codewords, scaled-integer argmin, lowest-cid ties) keyed " +
      "by subspace, and every subvector is replaced by its nearest " +
      "codeword id - the vector compresses to 8 small codes and " +
      "similarity search never touches the floats again (graft.ops.Pq). " +
      "k=16 codewords/subspace at test SFs (500-2000 vectors); " +
      "production PQ is k=256 - the identical plan with a bigger " +
      "(still metadata-sized) codebook broadcast. Training shuffles " +
      "only fixed-width (sub, cid, dim) rows, one m*k broadcast per " +
      "round; DuckDB replays quantize, both Lloyd rounds and the " +
      "final assignment bit for bit.",
    oracle = Some(PqOracleCtes + """
      SELECT vec_id, sub, code FROM codes ORDER BY vec_id, sub"""),
    run = (s, dir) => {
      import graft.ops.Pq
      val pts = Pq.subPoints(table(s, dir, "embeddings"), m = 8, sd = 8)
        .localCheckpoint(true) // feeds every Lloyd round + the encode
      Pq.encode(pts, Pq.train(pts, k = 16, iters = 2))
        .orderBy("vec_id", "sub")
    })

  /** The recall@3 measurement tail shared VERBATIM by all four ADC
    * recall audits (pq/opq × isotropic/anisotropic): per-query ADC
    * lookup tables from the chain's `c2`/`codes`, top-3 vs the exact
    * full-dim top-3 over `pts`, exact-integer hit count, single
    * division at the end. Source-blind — composes with any
    * pts-head + chain prefix. */
  private val AdcRecallTailSql = """,
      qs AS (SELECT vec_id AS query_id, sub, q FROM sp WHERE vec_id < 20),
      tba AS (SELECT q.query_id, c.sub, c.cid,
                SUM((q.q[t.i+1]*c.n - c.sv[t.i+1])
                  * (q.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
                MAX(c.n) AS n
              FROM qs q JOIN c2 c ON c.sub = q.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY q.query_id, c.sub, c.cid),
      tb AS (SELECT query_id, sub, cid,
               CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE) AS d FROM tba),
      adc AS (SELECT t.query_id, cd.vec_id AS neighbor_id,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(t.d ORDER BY t.sub)), (acc, x) -> acc + x) AS dist
              FROM codes cd JOIN tb t
                ON t.sub = cd.sub AND t.cid = cd.code
                AND cd.vec_id <> t.query_id
              GROUP BY t.query_id, cd.vec_id),
      rpq AS (SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
              FROM adc),
      top3 AS (SELECT query_id, neighbor_id FROM rpq WHERE rank <= 3),
      exb AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                SUM((q.q[t.i+1] - c.q[t.i+1])
                  * (q.q[t.i+1] - c.q[t.i+1])) AS d2
              FROM pts q JOIN pts c
                ON q.vec_id < 20 AND c.vec_id <> q.vec_id
                CROSS JOIN range(0, 64) t(i)
              GROUP BY q.vec_id, c.vec_id),
      rex AS (SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
              FROM exb),
      ex3 AS (SELECT query_id, neighbor_id FROM rex WHERE rank <= 3),
      hits AS (SELECT a.query_id, COUNT(*) AS n_hit
               FROM top3 a JOIN ex3 b
                 ON a.query_id = b.query_id
                 AND a.neighbor_id = b.neighbor_id
               GROUP BY 1)
      SELECT n_queries, k, n_hits,
             CAST(n_hits AS DOUBLE) / CAST(n_queries * k AS DOUBLE) AS recall
      FROM (SELECT (SELECT COUNT(DISTINCT query_id) FROM ex3) AS n_queries,
                   CAST(3 AS BIGINT) AS k,
                   CAST((SELECT COALESCE(SUM(n_hit), 0) FROM hits)
                     AS BIGINT) AS n_hits)"""

  /** ADC top-3 per query under codebooks trained on `pts`
    * (vec_id, sub, q) — the shared approximate side of the ADC
    * recall audits (train → encode → per-query tables → ranked ADC). */
  private def adcRecallTop3(pts: DataFrame): DataFrame = {
    import graft.ops.Pq
    // tiny (m*k rows) but derived through 2 Lloyd rounds: pin once so
    // encode + ADC tables don't re-train
    val cb = Pq.train(pts, k = 16, iters = 2).localCheckpoint(true)
    val codes = Pq.encode(pts, cb)
    val qs = pts.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("sub"), col("q"))
    val adc = Pq.adcDistances(codes, Pq.adcTables(qs, cb))
      .filter(col("neighbor_id") =!= col("query_id"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    adc.withColumn("rank", row_number().over(wA))
      .filter(col("rank") <= 3).select("query_id", "neighbor_id")
  }

  /** recall@3 summary row: approximate `top3` vs the exact full-dim
    * top-3 over integer points `full` (vec_id, q) — pure-integer
    * distances, exact hit count, one division. Shared by every
    * recall audit. */
  private def recallRow(top3: DataFrame, full: DataFrame): DataFrame = {
    val q20 = full.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    val exd = full.select(col("vec_id").as("neighbor_id"), col("q"))
      .join(broadcast(q20), col("neighbor_id") =!= col("query_id"))
      .withColumn("d2", graft.functions.VectorExpressions.scaledSqDist(
        col("qq"), col("q"), lit(1L)))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("neighbor_id"))
    // exact top-3 feeds the hit join AND the n_queries aggregate:
    // pin once (annRecall convention)
    val ex3 = exd.withColumn("rank", row_number().over(wE))
      .filter(col("rank") <= 3).select("query_id", "neighbor_id")
      .localCheckpoint(true)
    val hits = top3.join(ex3, Seq("query_id", "neighbor_id"), "left_semi")
    ex3.agg(countDistinct(col("query_id")).as("n_queries"))
      .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hits"))))
      .select(col("n_queries"), lit(3L).as("k"), col("n_hits"),
        (col("n_hits").cast(DoubleType) /
          (col("n_queries") * lit(3L)).cast(DoubleType)).as("recall"))
  }

  private val pqRecall = GraftQuery(
    name = "pipeline_pq_recall",
    doc = "PQ recall audit, symmetric to pipeline_ann_recall/" +
      "pipeline_ivf_recall: recall@3 of ADC (asymmetric-distance) " +
      "top-3 under the pipeline_embed_pq codebooks vs the EXACT " +
      "top-3 by full 64-dim squared distance over the same int8 " +
      "points and query set (vec_id < 20), one summary row - the " +
      "measurement isolates pure product-quantization loss (same " +
      "metric, same quantization, only the subspace factorization " +
      "approximates). ADC is the PQ payoff made differential: " +
      "per-query lookup tables (m*k doubles, broadcast) + a " +
      "(sub, code) join against the 8-byte codes, the float vectors " +
      "never read; the m per-subspace terms fold in FIXED subspace " +
      "order so the double sums are bit-identical cross-engine. " +
      "Exact-integer hit count, single division at the end. " +
      "Cap-gated (r16, the r8 convention): the whole audit runs on " +
      "the deterministic <=4000-vector hash slice - 100% of vectors " +
      "at every tracked sf (full exact audit), cap-bounded beyond, " +
      "while the production queries it grades stay full-corpus.",
    oracle = Some(vecCapGated(PqOracleCtes) + AdcRecallTailSql),
    run = (s, dir) => {
      import graft.ops.{KMeans, Pq}
      val emb = cappedEmb(s, dir) // audit slice (r8 cap-gate, r16)
      val pts = Pq.subPoints(emb, m = 8, sd = 8)
        .localCheckpoint(true) // feeds train, encode AND the query side
      recallRow(adcRecallTop3(pts), KMeans.quantize(emb))
    })

  /** The IVF-PQ CTE chain shared by pipeline_ivfpq_search and
    * pipeline_ivfpq_recall — the FAISS IVFPQ layout made differential:
    * coarse k=8 Lloyd (the pipeline_kmeans_train chain) → final cell
    * assignment → integer-rounded centroids (portable floor division)
    * → 64-dim residuals → m=8×8 residual slices → ONE shared k=16
    * residual codebook (2 Lloyd rounds) → codes; queries (vec_id < 20)
    * probe their 2 nearest cells and score candidates by fixed-order
    * ADC folds. */
  private val embedOpq = GraftQuery(
    name = "pipeline_embed_opq",
    doc = "OPQ-LITE product quantization (r15, SURVEY 8.3.1-4's " +
      "named integer-exact variant): plain PQ slices CONTIGUOUS dims, " +
      "so high-variance dims can pile into one subspace and starve " +
      "the rest; full OPQ fixes this with a learned ROTATION - float " +
      "matrix work no exact-hash gate can make bit-portable - while " +
      "the permutation variant rebalances with integers only: rank " +
      "dims by the exact variance surrogate n*sum(x^2) - (sum x)^2 " +
      "(same argsort as variance, no division), deal ranks to the 8 " +
      "subspaces in SNAKE order so each receives one dim per variance " +
      "octile, then run the UNCHANGED PQ machinery on the permuted " +
      "layout (Pq.snakeMapping/permutedSubPoints - the permutation is " +
      "pure input layout, invisible to train/encode, exactly as OPQ's " +
      "rotation is to FAISS). DuckDB replays the variance ranking, " +
      "the snake, and both Lloyd rounds bit for bit; ties rank by " +
      "dim so both engines permute identically.",
    oracle = Some(OpqOracleCtes + """
      SELECT vec_id, sub, code FROM codes ORDER BY vec_id, sub"""),
    run = (s, dir) => {
      import graft.ops.{KMeans, Pq}
      val emb = table(s, dir, "embeddings")
      val mapping = Pq.snakeMapping(KMeans.quantize(emb), m = 8)
        .localCheckpoint(true) // 64 rows derived through a global sort
      val pts = Pq.permutedSubPoints(emb, mapping)
        .localCheckpoint(true) // feeds every Lloyd round + the encode
      Pq.encode(pts, Pq.train(pts, k = 16, iters = 2))
        .orderBy("vec_id", "sub")
    })

  private val opqRecall = GraftQuery(
    name = "pipeline_opq_recall",
    doc = "OPQ-lite recall audit - recall@3 of ADC top-3 under the " +
      "PERMUTED codebooks (pipeline_embed_opq) vs the exact full-dim " +
      "int8 top-3 over the same query set (vec_id < 20), one summary " +
      "row directly comparable to pipeline_pq_recall's: the delta " +
      "between the two rows IS what variance rebalancing buys (or " +
      "costs) on this corpus, holding metric, quantization, k and m " +
      "fixed. The exact baseline is permutation-invariant (squared " +
      "distance is a sum over dims in any order), so only the ADC " +
      "side moves. Same fixed-subspace-order fold, exact-integer hit " +
      "count, single division at the end. Cap-gated like " +
      "pipeline_pq_recall (r16) - the audit PAIR shares the slice so " +
      "the delta stays apples-to-apples at every scale.",
    oracle = Some(vecCapGated(OpqOracleCtes) + AdcRecallTailSql),
    run = (s, dir) => {
      import graft.ops.{KMeans, Pq}
      val emb = cappedEmb(s, dir) // audit slice (r8 cap-gate, r16)
      val mapping = Pq.snakeMapping(KMeans.quantize(emb), m = 8)
        .localCheckpoint(true)
      val pts = Pq.permutedSubPoints(emb, mapping)
        .localCheckpoint(true) // feeds train, encode AND the query side
      // exact baseline is permutation-invariant, same as pq_recall's
      // (the audit pair must share it for the delta to mean anything)
      recallRow(adcRecallTop3(pts), KMeans.quantize(emb))
    })

  private val pqRecallAniso = GraftQuery(
    name = "pipeline_pq_recall_aniso",
    doc = "Plain-PQ recall on the ANISOTROPIC fixture (r16, r15 " +
      "verdict #5) - the CONTROL side of the pair that demonstrates " +
      "what the OPQ permutation buys: dimension variance falls " +
      "~(1+d)^-2 (integer hash ladder, A(d) = 127 div (1+d)), so " +
      "contiguous slicing hands subspace 0 ~4000x subspace 7's " +
      "variance - its 16 codewords underfit the dominant dims while " +
      "the tail subspaces' codewords quantize near-constants. Same " +
      "chain, same k/m, same exact full-dim baseline and query set " +
      "as pipeline_opq_recall_aniso; the recall GAP between the two " +
      "rows is the permutation's measured effect (the isotropic " +
      "pq/opq pair on real embeddings stays registered as the " +
      "no-effect control). Cap-gated audit slice; integer-exact end " +
      "to end.",
    oracle = Some(AnisoPqOracleCtes + AdcRecallTailSql),
    run = (s, dir) => {
      import graft.ops.Pq
      val base = anisoPts(s, dir).localCheckpoint(true)
      val pts = Pq.slices(base, m = 8, sd = 8).localCheckpoint(true)
      recallRow(adcRecallTop3(pts), base)
    })

  private val opqRecallAniso = GraftQuery(
    name = "pipeline_opq_recall_aniso",
    doc = "OPQ-lite recall on the ANISOTROPIC fixture - the " +
      "demonstration row (r15 verdict #5): the variance-snake " +
      "permutation deals one dim from each variance octile to every " +
      "subspace, so each codebook spends its 16 codewords mostly on " +
      "its one dominant dim instead of 8 of them at once - recall@3 " +
      "must come out ABOVE pipeline_pq_recall_aniso's (pinned by " +
      "PackingKMeansSpec with the measured pair), closing the OPQ story the " +
      "isotropic control cannot show. Identical exact baseline " +
      "(squared distance is permutation-invariant), identical query " +
      "set, cap-gated slice, integer-exact.",
    oracle = Some(AnisoOpqOracleCtes + AdcRecallTailSql),
    run = (s, dir) => {
      import graft.ops.Pq
      val base = anisoPts(s, dir).localCheckpoint(true)
      val mapping = Pq.snakeMapping(base, m = 8).localCheckpoint(true)
      val pts = Pq.permutedSlices(base, mapping).localCheckpoint(true)
      recallRow(adcRecallTop3(pts), base)
    })

  private val IvfPqOracleCtes = """
      WITH pts AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings),
      c0 AS (SELECT vec_id AS cid, CAST(1 AS BIGINT) AS n, q AS sv
             FROM pts WHERE vec_id < 8),
      a1 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c0 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b1 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a1) WHERE rk = 1),
      e1 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b1 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c1 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e1 GROUP BY cid),
      a2 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c1 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b2 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a2) WHERE rk = 1),
      e2 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b2 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      cc AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e2 GROUP BY cid),
      a3 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN cc c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b3 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a3) WHERE rk = 1),
      cen AS (SELECT cid,
                list_transform(sv,
                  s -> CAST((s - ((s % n) + n) % n) / n AS BIGINT)) AS cv
              FROM cc),
      res AS (SELECT p.vec_id, b.cid,
                list(p.q[t.i+1] - c.cv[t.i+1] ORDER BY t.i) AS r
              FROM pts p JOIN b3 b USING (vec_id)
                JOIN cen c ON c.cid = b.cid CROSS JOIN range(0, 64) t(i)
              GROUP BY p.vec_id, b.cid),
      rsp AS (SELECT vec_id, cid AS cell, t.sub,
                r[(t.sub*8+1):(t.sub*8+8)] AS q
              FROM res CROSS JOIN range(0, 8) t(sub)),
      rc0 AS (SELECT sub, vec_id AS kid, CAST(1 AS BIGINT) AS n, q AS sv
              FROM rsp WHERE vec_id < 16),
      ra1 AS (SELECT p.vec_id, p.sub, c.kid,
                SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                  * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
                MAX(c.n) AS n
              FROM rsp p JOIN rc0 c ON c.sub = p.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY p.vec_id, p.sub, c.kid),
      rb1 AS (SELECT vec_id, sub, kid FROM (
                SELECT vec_id, sub, kid, row_number() OVER (
                  PARTITION BY vec_id, sub
                  ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), kid)
                  AS rk FROM ra1) WHERE rk = 1),
      re1 AS (SELECT b.sub, b.kid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
                COUNT(*) AS cnt
              FROM rb1 b JOIN rsp p ON p.vec_id = b.vec_id AND p.sub = b.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY b.sub, b.kid, t.i),
      rc1 AS (SELECT sub, kid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
              FROM re1 GROUP BY sub, kid),
      ra2 AS (SELECT p.vec_id, p.sub, c.kid,
                SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                  * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
                MAX(c.n) AS n
              FROM rsp p JOIN rc1 c ON c.sub = p.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY p.vec_id, p.sub, c.kid),
      rb2 AS (SELECT vec_id, sub, kid FROM (
                SELECT vec_id, sub, kid, row_number() OVER (
                  PARTITION BY vec_id, sub
                  ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), kid)
                  AS rk FROM ra2) WHERE rk = 1),
      re2 AS (SELECT b.sub, b.kid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
                COUNT(*) AS cnt
              FROM rb2 b JOIN rsp p ON p.vec_id = b.vec_id AND p.sub = b.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY b.sub, b.kid, t.i),
      rc2 AS (SELECT sub, kid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
              FROM re2 GROUP BY sub, kid),
      ra3 AS (SELECT p.vec_id, p.sub, c.kid,
                SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                  * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
                MAX(c.n) AS n
              FROM rsp p JOIN rc2 c ON c.sub = p.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY p.vec_id, p.sub, c.kid),
      rcodes AS (SELECT vec_id, sub, kid AS code FROM (
                SELECT vec_id, sub, kid, row_number() OVER (
                  PARTITION BY vec_id, sub
                  ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), kid)
                  AS rk FROM ra3) WHERE rk = 1),
      qp AS (SELECT vec_id AS query_id, q FROM pts WHERE vec_id < 20),
      pa AS (SELECT q.query_id, c.cid,
               SUM((q.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (q.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM qp q CROSS JOIN cc c CROSS JOIN range(0, 64) t(i)
             GROUP BY q.query_id, c.cid),
      probe AS (SELECT query_id, cid FROM (
                SELECT query_id, cid, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                  AS rk FROM pa) WHERE rk <= 2),
      qres AS (SELECT q.query_id, p.cid AS cell,
                 list(q.q[t.i+1] - c.cv[t.i+1] ORDER BY t.i) AS r
               FROM qp q JOIN probe p USING (query_id)
                 JOIN cen c ON c.cid = p.cid CROSS JOIN range(0, 64) t(i)
               GROUP BY q.query_id, p.cid),
      qrsp AS (SELECT query_id, cell, t.sub,
                 r[(t.sub*8+1):(t.sub*8+8)] AS q
               FROM qres CROSS JOIN range(0, 8) t(sub)),
      tba AS (SELECT q.query_id, q.cell, c.sub, c.kid AS code,
                SUM((q.q[t.i+1]*c.n - c.sv[t.i+1])
                  * (q.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
                MAX(c.n) AS n
              FROM qrsp q JOIN rc2 c ON c.sub = q.sub
                CROSS JOIN range(0, 8) t(i)
              GROUP BY q.query_id, q.cell, c.sub, c.kid),
      tb AS (SELECT query_id, cell, sub, code,
               CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE) AS d FROM tba),
      cand AS (SELECT t.query_id, r.vec_id AS neighbor_id, t.sub, t.d
               FROM rcodes r JOIN rsp s ON s.vec_id = r.vec_id
                 AND s.sub = r.sub
               JOIN tb t ON t.cell = s.cell AND t.sub = r.sub
                 AND t.code = r.code AND r.vec_id <> t.query_id),
      adc AS (SELECT query_id, neighbor_id,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list(d ORDER BY sub)), (acc, x) -> acc + x) AS dist
              FROM cand GROUP BY query_id, neighbor_id),
      srk AS (SELECT query_id, neighbor_id, dist, row_number() OVER (
                PARTITION BY query_id ORDER BY dist, neighbor_id) AS rank
              FROM adc)"""

  /** Spark side of the shared IVF-PQ stages; returns (pts, cells, cb,
    * codes) with the reused frames pinned once (kmeans convention). */
  // `capped = true` builds the index over the audit slice (cappedEmb,
  // r8 cap-gate): used only by the recall audit; the search query
  // stays full-corpus
  private def ivfPqStages(s: SparkSession, dir: String,
      capped: Boolean = false) = {
    import graft.ops.{KMeans, Pq}
    val src = if (capped) cappedEmb(s, dir) else table(s, dir, "embeddings")
    val pts = KMeans.quantize(src)
      .localCheckpoint(true) // feeds coarse train, assign AND queries
    val cells = KMeans.train(pts, k = 8, iters = 2, dims = 64)
      .localCheckpoint(true) // k tiny rows derived through 2 rounds
    val assigned = KMeans.assign(pts, cells)
    val rsp = Pq.slices(Pq.residuals(assigned, cells), m = 8, sd = 8,
        keep = Seq("cid"))
      .localCheckpoint(true) // feeds PQ train, encode AND cell lookup
    val cb = Pq.train(rsp.select("vec_id", "sub", "q"), k = 16, iters = 2)
      .localCheckpoint(true)
    // codes rejoin their coarse cell on vec_id — at 100 TB both sides
    // are co-partitioned by vec_id out of the same shuffle
    val codes = Pq.encode(rsp.select("vec_id", "sub", "q"), cb)
      .join(assigned.select(col("vec_id"), col("cid").as("cell")), "vec_id")
    (pts, cells, cb, codes)
  }

  /** ADC top-3 per query over the probed cells — the shared search
    * body of both IVF-PQ queries. */
  private def ivfPqTop3(s: SparkSession, dir: String,
      capped: Boolean = false): DataFrame = {
    import graft.ops.Pq
    val (pts, cells, cb, codes) = ivfPqStages(s, dir, capped)
    val qp = pts.filter(col("vec_id") < 20)
    val probed = Pq.probeCells(qp, cells, nprobe = 2)
    // query residual AGAINST EACH probed cell: the probed frame is
    // shaped exactly like a cell assignment, so residuals() applies
    val qrsp = Pq.slices(
      Pq.residuals(probed.join(qp, "vec_id"), cells), m = 8, sd = 8,
      keep = Seq("cid"))
    // per-(query, cell) lookup tables: nq·nprobe·m·k rows — metadata
    val tables = qrsp
      .join(broadcast(cb.withColumnRenamed("cid", "code")), "sub")
      .withColumn("a",
        graft.functions.VectorExpressions.scaledSqDist(
          col("q"), col("sv"), col("n")))
      .select(col("vec_id").as("query_id"), col("cid").as("cell"),
        col("sub"), col("code"),
        (col("a").cast(DoubleType) /
          (col("n") * col("n")).cast(DoubleType)).as("d"))
    // candidates = codes living in a probed cell; exactly one table row
    // per (query, neighbor, sub), folded in FIXED subspace order so the
    // dist double is bit-identical cross-engine
    val adc = codes.withColumnRenamed("vec_id", "neighbor_id")
      .join(broadcast(tables), Seq("cell", "sub", "code"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("d")))),
          e => e.getField("d")),
        lit(0.0d), (acc, v) => acc + v).as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist"), col("neighbor_id"))
    adc.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 3)
  }

  private val ivfPqSearch = GraftQuery(
    name = "pipeline_ivfpq_search",
    doc = "IVF-PQ SEARCH (r15) - the production billion-scale ANN " +
      "layout (FAISS IVFPQ; Jegou et al. TPAMI 2011 SIV) composed " +
      "from the engine's own rungs: coarse k=8 cells trained with the " +
      "integer-exact Lloyd of pipeline_kmeans_train, per-point " +
      "RESIDUALS against integer-rounded centroids (portable pure-" +
      "integer floor division - the exact rational s/n would force " +
      "per-cell scales a SHARED codebook cannot absorb), one shared " +
      "m=8 k=16 residual codebook, and queries that probe their " +
      "nprobe=2 nearest cells and score ONLY those cells' codes via " +
      "fixed-order ADC table folds - at 100 TB the scan reads " +
      "nprobe/k of the codes (8 bytes each), never the floats, and " +
      "the tables stay nq*nprobe*m*k doubles (broadcast). Output " +
      "top-3 per query incl. the ADC dist double: bit-identical " +
      "cross-engine because every fold adds correctly-rounded " +
      "exact-integer quotients in the same subspace order. DuckDB " +
      "replays the ENTIRE chain - both Lloyds, rounding, residuals, " +
      "probe, ADC - bit for bit.",
    oracle = Some(IvfPqOracleCtes + """
      SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, dist
      FROM srk WHERE rank <= 3 ORDER BY query_id, rank"""),
    run = (s, dir) =>
      ivfPqTop3(s, dir)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          col("dist"))
        .orderBy("query_id", "rank"))

  private val ivfPqRecall = GraftQuery(
    name = "pipeline_ivfpq_recall",
    doc = "IVF-PQ recall audit - recall@3 of pipeline_ivfpq_search's " +
      "probed-ADC top-3 vs the EXACT full-dim int8 top-3 over the " +
      "same query set, one summary row closing the ANN audit ladder " +
      "(ann_recall: hyperplane LSH; ivf_recall: exact-dist IVF; " +
      "pq_recall: whole-corpus ADC; here BOTH approximations at once " +
      "- cell pruning AND subspace quantization). An IVF-PQ recall " +
      "below the pq_recall row quantifies the probe loss; below " +
      "ivf_recall, the quantization loss. Exact-integer hit count, " +
      "single division at the end. Cap-gated like pipeline_pq_recall " +
      "(r16): the whole audit - index build, probes AND exact " +
      "baseline - runs on the shared <=4000-vector slice; " +
      "pipeline_ivfpq_search stays full-corpus.",
    oracle = Some(vecCapGated(IvfPqOracleCtes) + """,
      ivf3 AS (SELECT query_id, neighbor_id FROM srk WHERE rank <= 3),
      exb AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                SUM((q.q[t.i+1] - c.q[t.i+1])
                  * (q.q[t.i+1] - c.q[t.i+1])) AS d2
              FROM qp q JOIN pts c ON c.vec_id <> q.query_id
                CROSS JOIN range(0, 64) t(i)
              GROUP BY q.query_id, c.vec_id),
      rex AS (SELECT query_id, neighbor_id, row_number() OVER (
                PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
              FROM exb),
      ex3 AS (SELECT query_id, neighbor_id FROM rex WHERE rank <= 3),
      hits AS (SELECT a.query_id, COUNT(*) AS n_hit
               FROM ivf3 a JOIN ex3 b
                 ON a.query_id = b.query_id
                 AND a.neighbor_id = b.neighbor_id
               GROUP BY 1)
      SELECT n_queries, k, n_hits,
             CAST(n_hits AS DOUBLE) / CAST(n_queries * k AS DOUBLE) AS recall
      FROM (SELECT (SELECT COUNT(DISTINCT query_id) FROM ex3) AS n_queries,
                   CAST(3 AS BIGINT) AS k,
                   CAST((SELECT COALESCE(SUM(n_hit), 0) FROM hits)
                     AS BIGINT) AS n_hits)"""),
    run = (s, dir) => {
      import graft.ops.KMeans
      val ivf3 = ivfPqTop3(s, dir, capped = true)
        .select("query_id", "neighbor_id")
      // exact full-dim int8 baseline (the pq_recall shape), over the
      // SAME audit slice as the probed side
      recallRow(ivf3, KMeans.quantize(cappedEmb(s, dir)))
    })

  private val packSequences = GraftQuery(
    name = "pipeline_pack_sequences",
    doc = "Greedy sequence packing (the batch-assembly step before " +
      "pretraining): docs fold in doc_id order into 64-token bins, 8 " +
      "independent shards; a doc that does not fit opens a new bin, an " +
      "oversize doc takes a bin alone with a truncation flag. Packing " +
      "is a sequential fold - state threads through the order - so " +
      "flatMapSortedGroups per shard is the honest Spark expression " +
      "(SURVEY escalation path (d)); only (doc_id, n_tokens) longs " +
      "enter the shuffle, never the text, and shards pack " +
      "embarrassingly parallel at 100 TB. The oracle replays the exact " +
      "fold with a DuckDB recursive CTE.",
    oracle = Some("""
      WITH RECURSIVE t AS (SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n
           FROM documents),
      r AS (SELECT doc_id, shard, n,
              row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM t),
      p AS (SELECT doc_id, shard, n, rn,
              CAST(0 AS BIGINT) AS bin_idx,
              CAST(0 AS BIGINT) AS tok_offset,
              LEAST(n, 64) AS fill
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.shard, r.n, r.rn,
              CASE WHEN p.fill + r.n > 64 THEN p.bin_idx + 1
                   ELSE p.bin_idx END,
              CASE WHEN p.fill + r.n > 64 THEN 0 ELSE p.fill END,
              CASE WHEN p.fill + r.n > 64 THEN LEAST(r.n, 64)
                   ELSE p.fill + r.n END
            FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
      SELECT doc_id, shard, bin_idx, tok_offset, n AS n_tokens,
             CAST(n > 64 AS BIGINT) AS truncated
      FROM p ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
      graft.ops.Packing.packGreedy(docs, capacity = 64).toDF()
        .select(col("doc_id"), col("shard"), col("bin_idx"),
          col("tok_offset"), col("n_tokens"),
          col("truncated").cast(LongType).as("truncated"))
        .orderBy("doc_id")
    })

  private val tfidfTopk = GraftQuery(
    name = "pipeline_tfidf_topk",
    doc = "TF-IDF term ranking: top-5 terms per document by tf*N/df " +
      "(the keyword-extraction / relevance primitive). Exactness trick: " +
      "the score is ONE double division of two exact integers (tf*N and " +
      "df), so both engines round identically and the ranking - ties " +
      "broken by token - is bit-determined. df is a token-level " +
      "aggregate joined back broadcast (the vocabulary is always the " +
      "tiny side at corpus scale); the doc-count scalar cross-joins " +
      "broadcast. Exploded tokens are cut once and feed both branches.",
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
             GROUP BY doc_id, token),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      nd AS (SELECT COUNT(*) AS n_docs FROM documents),
      sc AS (SELECT t.doc_id, t.token, t.tf, d.df,
               CAST(t.tf * n.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)
                 AS score
             FROM tf t JOIN df d USING (token) CROSS JOIN nd n),
      rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, token) AS rank FROM sc)
      SELECT doc_id, token, CAST(tf AS BIGINT) AS tf,
             CAST(df AS BIGINT) AS df, score, CAST(rank AS BIGINT) AS rank
      FROM rk WHERE rank <= 5 ORDER BY doc_id, rank"""),
    run = (s, dir) => {
      // tf feeds both the df aggregate and the scoring join — cut once
      // (shared-prefix convention, same as vocabCoverage)
      val tf = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nDocs = table(s, dir, "documents")
        .agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("token"))
      tf.join(broadcast(df), "token")
        .crossJoin(broadcast(nDocs))
        .withColumn("score",
          (col("tf") * col("n_docs")).cast(DoubleType)
            / col("df").cast(DoubleType))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          col("score"), col("rank").cast(LongType).as("rank"))
        .orderBy("doc_id", "rank")
    })

  private val zipfSpectrum = GraftQuery(
    name = "pipeline_zipf_spectrum",
    doc = "Token frequency-of-frequencies (Zipf spectrum): how many " +
      "distinct tokens occur exactly f times - the corpus-health " +
      "profile tokenizer and mixing decisions read (a heavy singleton " +
      "tail means noise; a truncated head means templating). Two " +
      "partial-aggregable groupBys, all integers; the second input is " +
      "already vocabulary-sized.",
    oracle = Some("""
      WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tc AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
      SELECT n AS freq, COUNT(*) AS n_tokens,
             MIN(token) AS first_token, MAX(token) AS last_token
      FROM tc GROUP BY n ORDER BY freq"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .groupBy(col("n").as("freq"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("token")).as("first_token"),
        max(col("token")).as("last_token"))
      .orderBy("freq"))

  private val curriculumBins = GraftQuery(
    name = "pipeline_curriculum_bins",
    doc = "Curriculum binning: ntile(4) quality quartiles per language " +
      "over (n_chars desc, doc_id) - the difficulty/quality staging " +
      "step of a curriculum or mixing schedule. The unique-id " +
      "tie-break makes the order total, so the standard ntile fill " +
      "rule (first n mod k buckets take the extra row) lands " +
      "identically in both engines. NOT a per-language ntile window " +
      "(single task for a dominant language): rank comes from " +
      "SkewWindows.rankedPrefix and the bucket is RECONSTRUCTED from " +
      "(rank, per-language count) by the fill rule itself - bin = " +
      "ceil-split arithmetic over exact integers, with the language " +
      "counts a broadcast-sized aggregate. Identical output, no " +
      "single-task stage (skew-probe ratios in SURVEY 6.2).",
    oracle = Some("""
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(ntile(4) OVER (PARTITION BY lang
               ORDER BY n_chars DESC, doc_id) AS BIGINT) AS bin
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => {
      val t = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val langN = t.groupBy("lang").agg(count(lit(1)).as("__n"))
      // cost-based dispatch (r14 verdict #3): the bucket rule already
      // needs per-language counts, so the probe reuses langN for free
      val ranked = graft.ops.SkewWindows.rankedPrefixAuto(t, "lang",
        Seq(col("n_chars").desc, col("doc_id")), None, "__rank", "__cum",
        precomputedCounts = Some((langN, "__n")))
      ranked.join(broadcast(langN), "lang")
        .withColumn("bin",
          graft.ops.SkewWindows.ntileFromRank("__rank", "__n", 4)
            .cast(LongType))
        .select(col("doc_id"), col("lang"), col("n_chars"), col("bin"))
        .orderBy("doc_id")
    })

  private val incrementalIngest = GraftQuery(
    name = "pipeline_incremental_ingest",
    doc = "Incremental ingest dedup: an arriving batch (a re-crawl of " +
      "every doc_id%3 doc - same bytes, new arrival id - plus genuinely " +
      "new variants of every doc_id%5 doc) is anti-joined on content " +
      "hash against the standing corpus; only never-seen content is " +
      "admitted. The ingest-time twin of pipeline_dedup_exact: at " +
      "100 TB the corpus side of the anti join is the 32-byte hash " +
      "column only (or a bloom-filter prefilter), never the text, and " +
      "the join shuffles on the hash. Re-crawled rows are provably all " +
      "rejected, suffixed variants provably all admitted.",
    oracle = Some("""
      WITH incoming AS (
        SELECT doc_id + 1000000 AS arrival_id, doc_id AS src_doc_id, text
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id + 2000000, doc_id, text || ' fresh ingest'
        FROM documents WHERE doc_id % 5 = 0)
      SELECT i.arrival_id, i.src_doc_id, md5(i.text) AS content_md5
      FROM incoming i
      WHERE md5(i.text) NOT IN (SELECT md5(text) FROM documents)
      ORDER BY i.arrival_id"""),
    run = (s, dir) => {
      val corpus = table(s, dir, "documents")
        .select(md5(col("text")).as("content_md5"))
      val docs = table(s, dir, "documents")
      val incoming = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("arrival_id"),
          col("doc_id").as("src_doc_id"), col("text"))
        .unionAll(docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 2000000L).as("arrival_id"),
            col("doc_id").as("src_doc_id"),
            concat(col("text"), lit(" fresh ingest")).as("text")))
      incoming
        .withColumn("content_md5", md5(col("text")))
        .join(corpus, Seq("content_md5"), "left_anti")
        .select(col("arrival_id"), col("src_doc_id"), col("content_md5"))
        .orderBy("arrival_id")
    })

  private val qualityFamiliarity = GraftQuery(
    name = "pipeline_quality_familiarity",
    doc = "Unigram-LM familiarity score: the mean corpus frequency of a " +
      "document's tokens (with multiplicity) - the cheapest 'does this " +
      "text look like the rest of the corpus' quality signal (rare-" +
      "token-heavy docs score low: boilerplate, noise, wrong-language " +
      "shards). Exactness: the numerator is a sum of exact integer " +
      "counts and the score is ONE double division of two exact " +
      "integers, so both engines round identically (tfidf trick). The " +
      "exploded token prefix is cut once and feeds both the corpus " +
      "count and the scoring join; the count side is vocabulary-sized " +
      "and broadcasts.",
    oracle = Some("""
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tc AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
      d AS (SELECT t.doc_id, SUM(c.cnt) AS fam_sum, COUNT(*) AS n_tokens
            FROM tok t JOIN tc c USING (token) GROUP BY t.doc_id)
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             CAST(fam_sum AS BIGINT) AS fam_sum,
             CAST(fam_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
               AS familiarity
      FROM d ORDER BY doc_id"""),
    run = (s, dir) => {
      // exploded tokens feed the corpus count AND the scoring join —
      // cut once (shared-prefix convention, same as tfidfTopk)
      val tok = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .localCheckpoint(true)
      val tc = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      tok.join(broadcast(tc), "token")
        .groupBy("doc_id")
        .agg(sum(col("cnt")).as("fam_sum"),
          count(lit(1)).as("n_tokens"))
        .select(col("doc_id"), col("n_tokens"), col("fam_sum"),
          (col("fam_sum").cast(DoubleType) /
            col("n_tokens").cast(DoubleType)).as("familiarity"))
        .orderBy("doc_id")
    })

  /** Per-language token budget for `pipeline_token_budget` — sized so
    * the dominant language overflows well before its last doc at
    * sf0.01 (en carries ~6.5k tokens there). */
  private val TokenBudget = 2000L

  private val tokenBudget = GraftQuery(
    name = "pipeline_token_budget",
    doc = "Token-budget selection: docs admitted per language in " +
      s"doc_id order until a $TokenBudget-token budget is exhausted - " +
      "the mixture-assembly step when a training recipe fixes a token " +
      "quota per source/language. Running sum over a total order " +
      "(unique doc_id tie-break), all integers. NOT a per-language " +
      "window: a real corpus is ~50-90% one language, so " +
      "Window.partitionBy(lang) funnels most of the corpus through " +
      "ONE task - this uses graft.ops.SkewWindows.rankedPrefix (the " +
      "two-phase per-(partition,lang) offset scheme; range layout, " +
      "partial sums, broadcast offsets, narrow assignment), which the " +
      "90%-dominant-language probe (SURVEY 6.2) shows scaling " +
      "linearly where the window form straggles.",
    oracle = Some(s"""
      WITH t AS (SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
      c AS (SELECT doc_id, lang, n_tokens,
              SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS cum_tokens
            FROM t)
      SELECT doc_id, lang, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
      FROM c WHERE cum_tokens <= $TokenBudget ORDER BY doc_id"""),
    run = (s, dir) => {
      val t = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
      // cost-based dispatch (r14 verdict #3): plain per-language window
      // below the threshold, two-phase range layout above
      graft.ops.SkewWindows
        .rankedPrefixAuto(t, "lang", Seq(col("doc_id")),
          Some("n_tokens"), "__rank", "cum_tokens")
        .filter(col("cum_tokens") <= TokenBudget)
        .select("doc_id", "lang", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    })

  private val knnFiltered = GraftQuery(
    name = "pipeline_knn_filtered",
    doc = "Metadata-filtered vector search: exact cosine top-3 for the " +
      "query set (vec_id < 20), with the CANDIDATE corpus restricted " +
      "to vectors whose paired document is lang='en' (the filtered-" +
      "search mode every production vector store exposes: filter " +
      "first, then rank - never rank-then-filter, which under-fills " +
      "k). The predicate is applied via a semi join on the id BEFORE " +
      "any dot product is computed; at 100 TB that join co-partitions " +
      "on the id and the filter prunes the expensive arithmetic, not " +
      "just the output. Query side broadcast as in pipeline_knn_brute.",
    oracle = Some("""
      WITH e AS (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                 FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      en AS (SELECT n.* FROM n JOIN documents d ON d.doc_id = n.vec_id
             WHERE d.lang = 'en'),
      p AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
              list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos
            FROM n q JOIN en c ON q.vec_id < 20 AND c.vec_id <> q.vec_id),
      r AS (SELECT query_id, neighbor_id,
              ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cos DESC, neighbor_id) AS rank
            FROM p)
      SELECT query_id, rank, neighbor_id FROM r WHERE rank <= 3
      ORDER BY query_id, rank"""),
    run = (s, dir) => {
      val pv = VectorOps.prepared(table(s, dir, "embeddings"),
        "vec_id", "embedding")
      val enIds = table(s, dir, "documents")
        .filter(col("lang") === "en").select(col("doc_id"))
      val q = pv.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qn"))
      val c = pv.join(enIds, pv("vec_id") === enIds("doc_id"), "left_semi")
        .select(col("vec_id").as("neighbor_id"), col("v").as("cv"),
          col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
        .withColumn("cos",
          VectorOps.cosine(col("qv"), col("cv"), col("qn"), col("cn")))
        .withColumn("rank", row_number().over(w).cast(LongType))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "neighbor_id")
        .orderBy("query_id", "rank")
    })

  /** Cosine threshold for semantic (embedding-space) duplicates —
    * looser than textual near-dup because paraphrases land here. */
  private val SemThreshold = 0.4

  private val semanticDedup = GraftQuery(
    name = "pipeline_semantic_dedup",
    doc = "Semantic dedup (SemDeDup shape): k-means-trained cells + " +
      "in-cell exact cosine. The trained centroids (integer-exact " +
      "Lloyd, k=8, 2 rounds - same arithmetic as " +
      "pipeline_kmeans_train) assign every vector to a cell; a vector " +
      s"is a semantic duplicate if a SMALLER-id vector in ITS CELL has " +
      s"cosine >= $SemThreshold, and dup_of records the smallest such " +
      "neighbor (the canonical keeper). Oversized cells are split by " +
      s"the deterministic id hash at $IvfCellCap (knn_ivf's cap) so " +
      "pair work is cap*n linear, never sigma cell^2; the cap changes " +
      "candidates, so the oracle replays the IDENTICAL split - " +
      "training, assignment, capping, and pair search are all " +
      "differential-tested bit for bit. At 100 TB: train on a sample, " +
      "k grows with n, and the same capped in-cell self-join is the " +
      "whole pair stage - nothing quadratic in the corpus.",
    oracle = Some(s"""
      WITH pts AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings),
      c0 AS (SELECT vec_id AS cid, CAST(1 AS BIGINT) AS n, q AS sv
             FROM pts WHERE vec_id < 8),
      a1 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c0 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b1 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a1) WHERE rk = 1),
      e1 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b1 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c1 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e1 GROUP BY cid),
      a2 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c1 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b2 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a2) WHERE rk = 1),
      e2 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b2 b JOIN pts p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c2 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e2 GROUP BY cid),
      a3 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM pts p CROSS JOIN c2 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b3 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a3) WHERE rk = 1),
      cs AS (SELECT cid, COUNT(*) AS cell_n FROM b3 GROUP BY cid),
      h AS (SELECT b3.vec_id, b3.cid,
              ${VectorOps.subCellSql("b3.vec_id", "cs.cell_n", IvfCellCap)}
                AS sub
            FROM b3 JOIN cs USING (cid)),
      e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM h a JOIN h b
              ON a.cid = b.cid AND a.sub = b.sub AND a.vec_id < b.vec_id
            JOIN nn na ON na.vec_id = a.vec_id
            JOIN nn nb ON nb.vec_id = b.vec_id
            WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)
              >= $SemThreshold),
      d AS (SELECT id_b AS vec_id, MIN(id_a) AS dup_of FROM p GROUP BY id_b)
      SELECT b3.vec_id, b3.cid, d.dup_of,
             CAST(d.dup_of IS NULL AS BIGINT) AS kept
      FROM b3 LEFT JOIN d USING (vec_id) ORDER BY b3.vec_id"""),
    run = (s, dir) => {
      import graft.ops.KMeans
      val emb = table(s, dir, "embeddings")
      val pts = KMeans.quantize(emb)
      val cent = KMeans.train(pts, k = 8, iters = 2, dims = 64)
      // the assignment feeds FIVE plan branches (sizes, both pair
      // sides via capped, the final left join) — without this cut the
      // whole Lloyd train re-expands per branch (measured: 15 centroid
      // broadcasts instead of 3). Same shared-prefix convention as
      // docShingles; the train's plan shape itself is asserted on the
      // lazy KMeans stage in PlanSpec.
      val cells = KMeans.assign(pts, cent).select("vec_id", "cid")
        .localCheckpoint(true)
      val sizes = cells.groupBy("cid").agg(count(lit(1)).as("cell_n"))
      val capped = cells.join(broadcast(sizes), "cid")
        .withColumn("sub",
          VectorOps.subCell(col("vec_id"), "cell_n", IvfCellCap))
      val pv = VectorOps.prepared(emb, "vec_id", "embedding")
        .join(capped, "vec_id")
      val a = pv.select(col("vec_id").as("id_a"), col("cid"), col("sub"),
        col("v").as("va"), col("nrm").as("na"))
      val b = pv.select(col("vec_id").as("id_b"), col("cid").as("cb"),
        col("sub").as("sb"), col("v").as("vb"), col("nrm").as("nb"))
      val dups = a.join(b, col("cid") === col("cb") &&
          col("sub") === col("sb") && col("id_a") < col("id_b"))
        .filter(VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb"))
          >= SemThreshold)
        .groupBy(col("id_b").as("vec_id")).agg(min(col("id_a")).as("dup_of"))
      cells.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"), col("dup_of"),
          isnull(col("dup_of")).cast(LongType).as("kept"))
        .orderBy("vec_id")
    })

  private val ingestSemDedup = GraftQuery(
    name = "pipeline_ingest_semdedup",
    doc = "Cross-corpus SEMANTIC ingest gate: an arriving batch " +
      "(vec_id % 10 = 7) is deduped against a STANDING corpus " +
      "(vec_id % 10 != 7) in embedding space - the embedding-side " +
      "twin of pipeline_ingest_neardup's text gate. The IVF cells are " +
      "trained on the corpus ONLY (integer-exact Lloyd, k seeded from " +
      "the first corpus ids - the index a production pipeline already " +
      "holds); the batch is ASSIGNED to those standing cells and " +
      "compared in-cell only, batch x corpus-cell - the standing " +
      "corpus is never self-joined again and the batch never joins " +
      "itself. Oversized cells split by the deterministic id hash at " +
      s"$IvfCellCap using the CORPUS cell size on both sides, so pair " +
      "work is cap*|batch|, linear in the delivery. dup_of = the " +
      "NEAREST standing neighbor with cosine >= " + SemThreshold +
      " (max cosine, ties to the smaller id), not just any - the " +
      "keeper a dedup ledger records. Training, assignment, capping, " +
      "pair search and the argmax are all replayed bit-exactly by the " +
      "DuckDB oracle.",
    oracle = Some(s"""
      WITH ptsc AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings WHERE vec_id % 10 <> 7),
      ptsb AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings WHERE vec_id % 10 = 7),
      c0 AS (SELECT vec_id AS cid, CAST(1 AS BIGINT) AS n, q AS sv
             FROM ptsc WHERE vec_id < 8),
      a1 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM ptsc p CROSS JOIN c0 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b1 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a1) WHERE rk = 1),
      e1 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b1 b JOIN ptsc p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c1 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e1 GROUP BY cid),
      a2 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM ptsc p CROSS JOIN c1 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b2 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a2) WHERE rk = 1),
      e2 AS (SELECT b.cid, t.i AS dim, SUM(p.q[t.i+1]) AS sx,
               COUNT(*) AS cnt
             FROM b2 b JOIN ptsc p USING (vec_id)
               CROSS JOIN range(0, 64) t(i)
             GROUP BY b.cid, t.i),
      c2 AS (SELECT cid, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
             FROM e2 GROUP BY cid),
      a3 AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM ptsc p CROSS JOIN c2 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      b3 AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM a3) WHERE rk = 1),
      ab AS (SELECT p.vec_id, c.cid,
               SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                 * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS a,
               MAX(c.n) AS n
             FROM ptsb p CROSS JOIN c2 c CROSS JOIN range(0, 64) t(i)
             GROUP BY p.vec_id, c.cid),
      bb AS (SELECT vec_id, cid FROM (
               SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id
                 ORDER BY CAST(a AS DOUBLE) / CAST(n*n AS DOUBLE), cid)
                 AS rk FROM ab) WHERE rk = 1),
      cs AS (SELECT cid, COUNT(*) AS cell_n FROM b3 GROUP BY cid),
      hc AS (SELECT b3.vec_id, b3.cid,
               ${VectorOps.subCellSql("b3.vec_id", "cs.cell_n", IvfCellCap)}
                 AS sub
             FROM b3 JOIN cs USING (cid)),
      hb AS (SELECT bb.vec_id, bb.cid,
               ${VectorOps.subCellSql("bb.vec_id", "cs.cell_n", IvfCellCap)}
                 AS sub
             FROM bb JOIN cs USING (cid)),
      e AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings),
      nn AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
             WHERE nrm > 0 AND nrm < 'infinity'::DOUBLE),
      p AS (SELECT b.vec_id AS id_b, a.vec_id AS id_a,
              list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm) AS cos
            FROM hb b JOIN hc a ON a.cid = b.cid AND a.sub = b.sub
            JOIN nn na ON na.vec_id = a.vec_id
            JOIN nn nb ON nb.vec_id = b.vec_id
            WHERE list_dot_product(na.v, nb.v) / (na.nrm * nb.nrm)
              >= $SemThreshold),
      r AS (SELECT id_b, id_a, cos, row_number() OVER (PARTITION BY id_b
              ORDER BY cos DESC, id_a) AS rk FROM p),
      d AS (SELECT id_b AS vec_id, id_a AS dup_of, cos AS best_cos
            FROM r WHERE rk = 1)
      SELECT bb.vec_id, bb.cid, d.dup_of, d.best_cos,
             CAST(d.dup_of IS NULL AS BIGINT) AS kept
      FROM bb LEFT JOIN d USING (vec_id) ORDER BY bb.vec_id"""),
    run = (s, dir) => {
      import graft.ops.KMeans
      val emb = table(s, dir, "embeddings")
      val pts = KMeans.quantize(emb)
      val corpusPts = pts.filter(col("vec_id") % 10 =!= 7)
      val batchPts = pts.filter(col("vec_id") % 10 === 7)
      // the standing index: centroids trained on the CORPUS only
      val cent = KMeans.train(corpusPts, k = 8, iters = 2, dims = 64)
      // both assignments fan into multiple branches (pair sides, cell
      // sizes, the final left join); cut once like semanticDedup
      val corpusCells = KMeans.assign(corpusPts, cent)
        .select("vec_id", "cid").localCheckpoint(true)
      val batchCells = KMeans.assign(batchPts, cent)
        .select("vec_id", "cid").localCheckpoint(true)
      val sizes = corpusCells.groupBy("cid").agg(count(lit(1)).as("cell_n"))
      val pv = VectorOps.prepared(emb, "vec_id", "embedding")
      val a = corpusCells.join(broadcast(sizes), "cid")
        .withColumn("sub",
          VectorOps.subCell(col("vec_id"), "cell_n", IvfCellCap))
        .join(pv, "vec_id")
        .select(col("vec_id").as("id_a"), col("cid"), col("sub"),
          col("v").as("va"), col("nrm").as("na"))
      val b = batchCells.join(broadcast(sizes), "cid")
        .withColumn("sub",
          VectorOps.subCell(col("vec_id"), "cell_n", IvfCellCap))
        .join(pv, "vec_id")
        .select(col("vec_id").as("id_b"), col("cid").as("cb"),
          col("sub").as("sb"), col("v").as("vb"), col("nrm").as("nb"))
      // batch x corpus-cell only: no corpus-corpus, no batch-batch pair
      // ever forms. Nearest keeper via partially-aggregable max_by over
      // (cos, -id): max cosine, ties to the smaller standing id - no
      // per-batch-vector window sort.
      val dups = b.join(a, col("cid") === col("cb") &&
          col("sub") === col("sb"))
        .withColumn("cos",
          VectorOps.cosine(col("va"), col("vb"), col("na"), col("nb")))
        .filter(col("cos") >= SemThreshold)
        .groupBy(col("id_b").as("vec_id"))
        .agg(max_by(struct(col("id_a"), col("cos")),
          struct(col("cos"), -col("id_a"))).as("best"))
        .select(col("vec_id"), col("best.id_a").as("dup_of"),
          col("best.cos").as("best_cos"))
      batchCells.join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cid"), col("dup_of"), col("best_cos"),
          isnull(col("dup_of")).cast(LongType).as("kept"))
        .orderBy("vec_id")
    })

  private val multimodalIngest = GraftQuery(
    name = "pipeline_multimodal_ingest",
    doc = "Binary-FILE ingestion source: the per-doc PNGs land as " +
      "individual files (written executor-side, one real file per " +
      "doc) and are ingested with Spark's binaryFile source + " +
      "pathGlobFilter — how blobs actually ENTER a lakehouse from a " +
      "media crawl, vs the in-table binary columns the other " +
      "multimodal queries use. doc_id is recovered from the file NAME " +
      "(regexp on path — the id-in-key layout every object-store " +
      "crawl uses), then the standard decode stage runs; the oracle " +
      "predicts the decoded metadata from the doc_id formulas, so a " +
      "green row proves file write -> binaryFile scan -> path parse " +
      "-> PNG decode end-to-end.",
    oracle = Some("""
      SELECT doc_id,
             CAST(8 + doc_id % 13 AS BIGINT) AS width,
             CAST(8 + doc_id % 7 AS BIGINT) AS height,
             CAST(doc_id % 256 AS BIGINT) AS mean_r,
             CAST((doc_id * 7) % 256 AS BIGINT) AS mean_g,
             CAST((doc_id * 13) % 256 AS BIGINT) AS mean_b
      FROM documents ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import s.implicits._
      val landing = graft.multimodal.MultiModal.pngLandingDir(s, dir)
      val assets = s.read.format("binaryFile")
        .option("pathGlobFilter", "*.png").load(landing)
        .select(regexp_extract(col("path"), "doc_(\\d+)\\.png$", 1)
          .cast(LongType).as("doc_id"), col("content"))
        .as[graft.multimodal.MultiModal.ImageAsset]
      graft.multimodal.MultiModal.decodeImages(assets).toDF()
        .select(col("doc_id"), col("width"), col("height"),
          round(col("mean_r")).cast(LongType).as("mean_r"),
          round(col("mean_g")).cast(LongType).as("mean_g"),
          round(col("mean_b")).cast(LongType).as("mean_b"))
        .orderBy("doc_id")
    })

  private val embedOutliers = GraftQuery(
    name = "pipeline_embed_outliers",
    doc = "Embedding outlier / mislabel detection: each vector's " +
      "distance to its LANGUAGE centroid, top-3 farthest per language " +
      "flagged - the cheap geometric screen for mislabeled or " +
      "corrupted rows before training. Same integer-exact arithmetic " +
      "as k-means (graft.ops.KMeans): int8-quantized vectors, " +
      "centroid kept as exact (n, sum q), distance compared via " +
      "sum((n*x - s)^2)/n^2 - order-independent integer numerator, " +
      "ONE double division - so DuckDB replays it bit for bit. " +
      "Magnitudes: A <= dims*(2*127*n)^2, inside 2^53 up to n ~ 3e5 " +
      "per language; beyond that the DECIMAL(38,0) twin applies. One " +
      "narrow (lang,dim) shuffle for the centroids, broadcast back; " +
      "the top-3 is SkewWindows.topKPerGroup (local top-3 per " +
      "(lang, partition) slice, exact re-rank of the k*P survivors) - " +
      "not a per-language window, so the dominant language never " +
      "funnels through one task.",
    oracle = Some("""
      WITH pts AS (SELECT d.lang, e.vec_id,
             list_transform(e.embedding,
               x -> CAST(FLOOR(LEAST(GREATEST(CAST(x AS DOUBLE), -1.0), 1.0) * 127) AS BIGINT)) AS q
           FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id),
      cg AS (SELECT lang, t.i AS dim, SUM(q[t.i+1]) AS sx, COUNT(*) AS cnt
             FROM pts CROSS JOIN range(0, 64) t(i)
             GROUP BY lang, t.i),
      c AS (SELECT lang, MAX(cnt) AS n, list(sx ORDER BY dim) AS sv
            FROM cg GROUP BY lang),
      a AS (SELECT p.vec_id, p.lang,
              SUM((p.q[t.i+1]*c.n - c.sv[t.i+1])
                * (p.q[t.i+1]*c.n - c.sv[t.i+1])) AS num,
              MAX(c.n) AS n
            FROM pts p JOIN c USING (lang) CROSS JOIN range(0, 64) t(i)
            GROUP BY p.vec_id, p.lang),
      r AS (SELECT vec_id, lang,
              CAST(num AS DOUBLE) / CAST(n*n AS DOUBLE) AS dist,
              row_number() OVER (PARTITION BY lang
                ORDER BY CAST(num AS DOUBLE) / CAST(n*n AS DOUBLE) DESC,
                  vec_id) AS rank
            FROM a)
      SELECT lang, rank, vec_id, dist FROM r WHERE rank <= 3
      ORDER BY lang, rank"""),
    run = (s, dir) => {
      import graft.ops.KMeans
      // pts feeds the centroid aggregate AND the scoring join — cut
      // once (shared-prefix convention) or the scan+quantize+join
      // chain executes twice
      val pts = KMeans.quantize(table(s, dir, "embeddings"))
        .join(table(s, dir, "documents")
          .select(col("doc_id").as("vec_id"), col("lang")), "vec_id")
        .localCheckpoint(true)
      // one partial-aggregable shuffle of 64 per-dim column sums (r20
      // optimization round, guide §2.3/§2.4 — same rewrite as
      // KMeans.update; identical results on the rectangular 64-dim q)
      val cent = pts
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          array((0 until 64).map(i =>
            sum(get(col("q"), lit(i)))): _*).as("sv"))
      val scored = pts.join(broadcast(cent), "lang")
        .withColumn("num",
          graft.functions.VectorExpressions.scaledSqDist(
            col("q"), col("sv"), col("n")))
        .withColumn("dist",
          col("num").cast(DoubleType) / (col("n") * col("n"))
            .cast(DoubleType))
      graft.ops.SkewWindows.topKPerGroup(scored, "lang",
          Seq(col("dist").desc, col("vec_id")), 3, "rank")
        .select("lang", "rank", "vec_id", "dist")
        .orderBy("lang", "rank")
    })

  private val dupSpan = GraftQuery(
    name = "pipeline_dup_span",
    doc = "Longest duplicated-shingle RUN per document (the exact-" +
      "substring dedup signal of Lee et al., localized): a shingle " +
      "position is 'duplicated' if its 3-gram occurs more than once in " +
      "the corpus (any doc, or twice in this one), and the score is " +
      "the longest CONSECUTIVE run of duplicated positions - long runs " +
      "mean a verbatim copied span, not scattered common phrases. All " +
      "integers: positional shingles via one explode, occurrence " +
      "counts via one window over the shingle, runs via the gaps-and-" +
      "islands trick (pos - row_number), one max per doc. Docs shorter " +
      "than one shingle score 0 via the left join.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      u AS (SELECT doc_id, w,
              unnest(range(0, greatest(len(w) - 2, 0))) AS i FROM t),
      p AS (SELECT doc_id, i,
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
            FROM u),
      c AS (SELECT doc_id, i, COUNT(*) OVER (PARTITION BY sh) AS occ FROM p),
      d AS (SELECT doc_id, i,
              i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
            FROM c WHERE occ > 1),
      g AS (SELECT doc_id, grp, COUNT(*) AS run FROM d GROUP BY doc_id, grp),
      m AS (SELECT doc_id, MAX(run) AS mx FROM g GROUP BY doc_id)
      SELECT t.doc_id, CAST(COALESCE(m.mx, 0) AS BIGINT) AS longest_dup_span
      FROM t LEFT JOIN m USING (doc_id) ORDER BY t.doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val pos = docs.filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("w")) - 3)).as("i"),
          col("w"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ", element_at(col("w"), col("i") + 1),
            element_at(col("w"), col("i") + 2),
            element_at(col("w"), col("i") + 3)).as("sh"))
      val occ = pos.withColumn("occ",
        count(lit(1)).over(Window.partitionBy("sh")))
      val runs = occ.filter(col("occ") > 1)
        .withColumn("grp", col("i") -
          row_number().over(Window.partitionBy("doc_id").orderBy("i")))
        .groupBy("doc_id", "grp").agg(count(lit(1)).as("run"))
        .groupBy("doc_id").agg(max(col("run")).as("mx"))
      docs.select(col("doc_id"))
        .join(runs, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("mx"), lit(0L)).cast(LongType)
            .as("longest_dup_span"))
        .orderBy("doc_id")
    })

  /** Minimum duplicated-span length (tokens) the substring-dedup
    * TRANSFORM removes — Lee et al.'s "Deduplicating Training Data
    * Makes Language Models Better" uses 50-token spans; the corpus
    * plants verbatim near-copies long enough that the threshold fires
    * at every tracked sf (21 affected docs at sf0.01, 2,733 at sf0.1). */
  private val SubstringMinSpan = 50

  private val dedupSubstring = GraftQuery(
    name = "pipeline_dedup_substring",
    doc = "EXACT-SUBSTRING dedup TRANSFORM (Lee et al. ESD): remove " +
      "from every document the verbatim spans of >= 50 tokens that " +
      "occur elsewhere in the corpus, emitting the cleaned text — the " +
      "actual rewrite, not just pipeline_dup_span's score. Duplicated " +
      "positions come from the same positional 3-shingle machinery as " +
      "dup_span, but occurrence counts use a partial-agg groupBy " +
      "joined back on the shingle instead of a count-over-window: a " +
      "ubiquitous shingle would make one window partition hold its " +
      "entire corpus-wide df (a skew hotspot at 100 TB) while the " +
      "groupBy pre-aggregates map-side and AQE splits any skewed join " +
      "key. Maximal runs via gaps-and-islands, runs covering >= 50 " +
      "tokens become [st, en] token intervals (a run of R shingle " +
      "positions covers R+2 tokens; adjacent qualifying spans may " +
      "OVERLAP by up to 2 tokens, which the per-token interval test " +
      "unions away). Reconstruction is a per-row array lambda — " +
      "filter(w, (x,i) -> no span contains i) — pure codegen, no " +
      "second shuffle; span lists are bounded by doc length. The " +
      "cleaned TEXT is hash-compared against DuckDB replaying the " +
      "identical span arithmetic via anti-join + ordered re-list.",
    oracle = Some(s"""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      u AS (SELECT doc_id, unnest(range(0, greatest(len(w) - 2, 0))) AS i,
              w FROM t),
      p AS (SELECT doc_id, i,
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh FROM u),
      f AS (SELECT sh, COUNT(*) AS occ FROM p GROUP BY sh),
      d AS (SELECT p.doc_id, p.i,
              p.i - row_number() OVER (PARTITION BY p.doc_id ORDER BY p.i)
                AS grp
            FROM p JOIN f USING (sh) WHERE f.occ > 1),
      g AS (SELECT doc_id, MIN(i) AS st, MAX(i) + 2 AS en
            FROM d GROUP BY doc_id, grp
            HAVING MAX(i) + 2 - MIN(i) + 1 >= $SubstringMinSpan),
      rm AS (SELECT DISTINCT doc_id, unnest(range(st, en + 1)) AS i FROM g),
      tok AS (SELECT doc_id, unnest(range(0, len(w))) AS i, w FROM t),
      keep AS (SELECT tok.doc_id, tok.i, tok.w[tok.i+1] AS word
               FROM tok ANTI JOIN rm USING (doc_id, i)),
      o AS (SELECT doc_id,
              array_to_string(list(word ORDER BY i), ' ') AS clean_text,
              COUNT(*) AS n_kept
            FROM keep GROUP BY doc_id)
      SELECT t.doc_id,
             COALESCE(o.clean_text, '') AS clean_text,
             CAST(COALESCE(o.n_kept, 0) AS BIGINT) AS n_tokens_kept,
             CAST(len(t.w) - COALESCE(o.n_kept, 0) AS BIGINT)
               AS n_tokens_removed
      FROM t LEFT JOIN o USING (doc_id) ORDER BY t.doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val pos = docs.filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("w")) - 3)).as("i"),
          col("w"))
        .select(col("doc_id"), col("i"),
          concat_ws(" ", element_at(col("w"), col("i") + 1),
            element_at(col("w"), col("i") + 2),
            element_at(col("w"), col("i") + 3)).as("sh"))
      val freq = pos.groupBy("sh").agg(count(lit(1)).as("occ"))
        .filter(col("occ") > 1)
      val spans = pos.join(freq, "sh")
        .withColumn("grp", col("i") -
          row_number().over(Window.partitionBy("doc_id").orderBy("i")))
        .groupBy("doc_id", "grp")
        .agg(min(col("i")).as("st"), (max(col("i")) + 2).as("en"))
        .filter(col("en") - col("st") + 1 >= SubstringMinSpan)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("st"), col("en"))).as("spans"))
      docs.join(spans, Seq("doc_id"), "left")
        .withColumn("kept",
          when(col("spans").isNull, col("w"))
            .otherwise(filter(col("w"), (_, i) =>
              !exists(col("spans"), sp =>
                i >= sp.getField("st") && i <= sp.getField("en")))))
        .select(col("doc_id"),
          array_join(col("kept"), " ").as("clean_text"),
          size(col("kept")).cast(LongType).as("n_tokens_kept"),
          (size(col("w")) - size(col("kept"))).cast(LongType)
            .as("n_tokens_removed"))
        .orderBy("doc_id")
    })

  private val classBalance = GraftQuery(
    name = "pipeline_class_balance",
    doc = "Class-balanced subsample: every language reduced to exactly " +
      "the MINORITY language's count, members picked in deterministic " +
      "hash order (the multiplicative id hash all the samplers here " +
      "share) - the no-RNG equivalent of 'sample n per class' that " +
      "re-runs identically on any cluster. The per-language count " +
      "aggregate is tiny and broadcasts; selection ranks (hash, then " +
      "id) per language via SkewWindows.rankedPrefix - the two-phase " +
      "offset scheme, NOT a per-language window, so a 90%-dominant " +
      "language spreads over the range partitions instead of one task " +
      "(probe ratios in SURVEY 6.2).",
    oracle = Some("""
      WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
      m AS (SELECT MIN(cnt) AS m FROM c),
      r AS (SELECT doc_id, lang,
              row_number() OVER (PARTITION BY lang ORDER BY
                (((doc_id % 1000000007 + 1000000007) % 1000000007)
                  * 2654435761) % 4294967296, doc_id) AS pick_rank
            FROM documents)
      SELECT doc_id, lang, pick_rank FROM r, m WHERE pick_rank <= m.m
      ORDER BY doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents").select(col("doc_id"), col("lang"))
      // per-language counts feed the balance floor AND the dispatch
      // probe (r14 verdict #3) — one aggregate, probe free
      val langCnt = docs.groupBy("lang").agg(count(lit(1)).as("cnt"))
      val minCnt = langCnt.agg(min(col("cnt")).as("m"))
      graft.ops.SkewWindows
        .rankedPrefixAuto(docs, "lang",
          Seq(graft.ops.Sampling.hash32(col("doc_id")), col("doc_id")),
          None, "pick_rank", "__cum",
          precomputedCounts = Some((langCnt, "cnt")))
        .crossJoin(broadcast(minCnt))
        .filter(col("pick_rank") <= col("m"))
        .select("doc_id", "lang", "pick_rank")
        .orderBy("doc_id")
    })

  private val lmFluency = GraftQuery(
    name = "pipeline_lm_fluency",
    doc = "Weakest-bigram LM fluency score: per document, the MINIMUM " +
      "corpus conditional probability p(w2|w1) = cnt(w1 w2)/cnt(w1 *) " +
      "over its bigrams - a doc whose every transition is common reads " +
      "fluently; one never-seen-elsewhere transition tanks the MIN " +
      "(unlike familiarity's mean, which it complements). Exactness: " +
      "each probability is ONE correctly-rounded double division of " +
      "two exact integer counts, and MIN over identical value sets is " +
      "order-independent - no floating sum anywhere. One bigram-count " +
      "groupBy, one prefix-total window over it (vocabulary-sized " +
      "input), one join back to the exploded bigrams.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      u AS (SELECT doc_id, w,
              unnest(range(0, greatest(len(w) - 1, 0))) AS i FROM t),
      b AS (SELECT doc_id, w[i+1] AS w1, w[i+2] AS w2 FROM u),
      c2 AS (SELECT w1, w2, COUNT(*) AS cnt2 FROM b GROUP BY w1, w2),
      p AS (SELECT w1, w2,
              CAST(cnt2 AS DOUBLE) /
                CAST(SUM(cnt2) OVER (PARTITION BY w1) AS DOUBLE) AS pr
            FROM c2),
      d AS (SELECT b.doc_id, COUNT(*) AS n_bigrams, MIN(p.pr) AS min_p
            FROM b JOIN p USING (w1, w2) GROUP BY b.doc_id)
      SELECT t.doc_id, CAST(COALESCE(d.n_bigrams, 0) AS BIGINT) AS n_bigrams,
             COALESCE(d.min_p, 1.0) AS min_p
      FROM t LEFT JOIN d USING (doc_id) ORDER BY t.doc_id"""),
    run = (s, dir) => {
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      val bigrams = docs.filter(size(col("w")) >= 2)
        .select(col("doc_id"),
          explode(sequence(lit(0), size(col("w")) - 2)).as("i"),
          col("w"))
        .select(col("doc_id"),
          element_at(col("w"), col("i") + 1).as("w1"),
          element_at(col("w"), col("i") + 2).as("w2"))
      val probs = bigrams.groupBy("w1", "w2")
        .agg(count(lit(1)).as("cnt2"))
        .withColumn("pr", col("cnt2").cast(DoubleType) /
          sum(col("cnt2")).over(Window.partitionBy("w1"))
            .cast(DoubleType))
        .select("w1", "w2", "pr")
      val scored = bigrams.join(probs, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), min(col("pr")).as("min_p"))
      docs.select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("min_p"), lit(1.0)).as("min_p"))
        .orderBy("doc_id")
    })

  /** One BPE training round as chained DuckDB CTEs (mirrors
    * graft.ops.Bpe.mergeRound stage for stage: pair stats → top-1 rule
    * → greedy L-to-R merge via islands + offset parity). `prev` is the
    * vocab CTE the round consumes; emits CTEs suffixed $r with the new
    * vocab in v$r and the learned rule in b$r. The LEFT JOIN of the
    * rule (not CROSS) mirrors Bpe.mergeRound's exhaustion guard: when
    * the vocabulary is fully merged before `rounds` rounds, b$r is
    * EMPTY and a cross join would annihilate x$r/v$r — the left join
    * makes m universally false instead, so the round no-ops exactly
    * like the Scala side. */
  private def bpeRoundSql(r: Int, prev: String): String = s"""
      u$r AS (SELECT word, wc, syms,
               unnest(range(0, len(syms))) AS i FROM $prev),
      e$r AS (SELECT word, wc, i, syms[i+1] AS s, syms[i+2] AS s2
              FROM u$r),
      c$r AS (SELECT s AS p1, s2 AS p2, SUM(wc) AS cnt FROM e$r
              WHERE s2 IS NOT NULL GROUP BY s, s2),
      b$r AS (SELECT p1, p2, cnt FROM c$r
              ORDER BY cnt DESC, p1, p2 LIMIT 1),
      x$r AS (SELECT e.word, e.wc, e.i, e.s, b.p1, b.p2,
                COALESCE((e.s = b.p1) AND (e.s2 = b.p2), FALSE) AS m
              FROM e$r e LEFT JOIN b$r b ON TRUE),
      y$r AS (SELECT word, i,
                i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
              FROM x$r WHERE m),
      z$r AS (SELECT word, i,
                row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
              FROM y$r),
      t$r AS (SELECT word, i FROM z$r WHERE (rn - 1) % 2 = 0),
      v$r AS (SELECT x.word, x.wc,
                list(CASE WHEN t.i IS NOT NULL THEN x.p1 || x.p2
                          ELSE x.s END ORDER BY x.i)
                  FILTER (WHERE p.i IS NULL) AS syms
              FROM x$r x
                LEFT JOIN t$r t ON t.word = x.word AND t.i = x.i
                LEFT JOIN t$r p ON p.word = x.word AND p.i = x.i - 1
              GROUP BY x.word, x.wc)"""

  private def bpeOracleSql(rounds: Int, segment: Boolean = false): String = {
    val chain = (1 to rounds)
      .map(r => bpeRoundSql(r, if (r == 1) "v0" else s"v${r - 1}"))
      .mkString(",")
    val finalSelect =
      if (segment) s""",
      dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
             FROM documents)
      SELECT dw.doc_id,
             CAST(SUM(len(v.syms)) AS BIGINT) AS n_bpe_tokens,
             CAST(SUM(length(dw.word)) AS BIGINT) AS n_chars,
             COUNT(*) AS n_words
      FROM dw JOIN v$rounds v USING (word)
      GROUP BY dw.doc_id ORDER BY dw.doc_id"""
      else {
        val union = (1 to rounds)
          .map(r => s"SELECT CAST($r AS BIGINT) AS round, p1, p2, " +
            s"CAST(cnt AS BIGINT) AS cnt FROM b$r")
          .mkString("\n      UNION ALL ")
        s"""
      SELECT * FROM ($union) ORDER BY round"""
      }
    s"""
      WITH w0 AS (SELECT word, COUNT(*) AS wc FROM (
               SELECT unnest(string_split(text, ' ')) AS word
               FROM documents) GROUP BY word),
      v0 AS (SELECT word, wc,
               list_filter(string_split(
                 regexp_replace(word, '(.)', '\\1 ', 'g'), ' '),
                 x -> x <> '') AS syms
             FROM w0),$chain$finalSelect"""
  }

  private val bpeTrain = GraftQuery(
    name = "pipeline_bpe_train",
    doc = "BPE tokenizer TRAINING (graft.ops.Bpe): 3 Sennrich merge " +
      "rounds over the word vocabulary - count adjacent symbol pairs " +
      "weighted by word frequency, learn the top pair (cnt DESC, pair " +
      "ASC - a total order), merge it GREEDY LEFT-TO-RIGHT in every " +
      "word, repeat. The greedy rule is pure window arithmetic " +
      "(islands of consecutive matches, even offsets merge: 'a a a a' " +
      "under (a,a) -> 'aa aa'), so the whole train is engine-portable " +
      "integer/string logic and DuckDB replays all 3 rounds bit for " +
      "bit. State is vocabulary-sized; the corpus is scanned once for " +
      "word counts. Each round's vocab is checkpointed (two consuming " +
      "branches per round - the chain would re-expand 2^rounds).",
    oracle = Some(bpeOracleSql(3)),
    run = (s, dir) => {
      val words = table(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .withColumn("wc", lit(1L))
      graft.ops.Bpe.train(words, rounds = 3).orderBy("round")
    })

  private val bpeSegment = GraftQuery(
    name = "pipeline_bpe_segment",
    doc = "BPE tokenizer APPLICATION: every document re-tokenized under " +
      "the 3 merge rules pipeline_bpe_train learns, emitting the " +
      "per-doc BPE token count and char count - the train->apply " +
      "composite that prices a corpus in learned-tokenizer tokens " +
      "(what a context budget actually meters). The segmentation is " +
      "computed ONCE on the vocabulary and joined back to the doc's " +
      "words (with multiplicity) - the corpus never re-segments " +
      "per-occurrence; at 100 TB the vocab side broadcasts. All " +
      "integer counts; the oracle replays the train chain and the " +
      "join.",
    oracle = Some(bpeOracleSql(3, segment = true)),
    run = (s, dir) => {
      val docWords = table(s, dir, "documents")
        .select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
      val vocab = graft.ops.Bpe.trainFull(
        docWords.withColumn("wc", lit(1L)), rounds = 3)._2
      val sizes = vocab.select(col("word"),
        size(col("syms")).cast(LongType).as("n_syms"),
        length(col("word")).cast(LongType).as("n_chars"))
      docWords.join(broadcast(sizes), "word")
        .groupBy("doc_id")
        .agg(sum(col("n_syms")).as("n_bpe_tokens"),
          sum(col("n_chars")).as("n_chars"),
          count(lit(1)).as("n_words"))
        .orderBy("doc_id")
    })

  private val ngramNovelty = GraftQuery(
    name = "pipeline_ngram_novelty",
    doc = "N-gram novelty attribution: the fraction of a document's " +
      "DISTINCT 3-gram shingles whose FIRST corpus occurrence (lowest " +
      "doc_id holding the shingle) is this document - in an id-ordered " +
      "ingest, late re-crawls of old content score near 0 while " +
      "genuinely new material scores near 1 (the per-doc view of what " +
      "incremental_ingest gates). One shingle-level min aggregate " +
      "joined back on the shingle (the join shuffles on the shingle " +
      "key at scale), exact integer counts, ONE double division.",
    oracle = Some(ShingleCte + """,
      u AS (SELECT doc_id, unnest(sh) AS g FROM s),
      f AS (SELECT g, MIN(doc_id) AS first_doc FROM u GROUP BY g),
      d AS (SELECT u.doc_id, COUNT(*) AS n_shingles,
              CAST(SUM(CASE WHEN f.first_doc = u.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel
            FROM u JOIN f USING (g) GROUP BY u.doc_id)
      SELECT s.doc_id,
             CAST(COALESCE(d.n_shingles, 0) AS BIGINT) AS n_shingles,
             COALESCE(d.n_novel, 0) AS n_novel,
             COALESCE(CAST(d.n_novel AS DOUBLE)
               / CAST(d.n_shingles AS DOUBLE), 1.0) AS novelty
      FROM s LEFT JOIN d USING (doc_id) ORDER BY s.doc_id"""),
    run = (s, dir) => {
      val sh = docShingles(s, dir)
        .select(col("doc_id"), explode(col("sh")).as("g"))
      val first = sh.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      val scored = sh.join(first, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
      table(s, dir, "documents").select(col("doc_id"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          coalesce(col("n_novel").cast(DoubleType) /
            col("n_shingles").cast(DoubleType), lit(1.0)).as("novelty"))
        .orderBy("doc_id")
    })

  private val datasetCard = GraftQuery(
    name = "pipeline_dataset_card",
    doc = "Dataset card: the one-row corpus summary a training run " +
      "records next to its data - doc/token/char totals, language and " +
      "source cardinalities, exact-duplicate rate, mean doc length. " +
      "All counts are exact integers aggregated partial+final in one " +
      "pass over the corpus (plus the distinct-content count on the " +
      "md5); the two ratios are single double divisions of exact " +
      "integers (cross-engine bit-identical). The capstone shape: at " +
      "100 TB this is ONE group-less aggregate, no shuffle wider than " +
      "32 partial rows.",
    oracle = Some("""
      WITH t AS (SELECT doc_id, text, lang, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                   CAST(length(text) AS BIGINT) AS n_ch,
                   md5(text) AS h
                 FROM documents)
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             CAST(SUM(n_ch) AS BIGINT) AS n_chars,
             COUNT(DISTINCT lang) AS n_langs,
             COUNT(DISTINCT source) AS n_sources,
             COUNT(*) - COUNT(DISTINCT h) AS n_exact_dups,
             CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS dup_rate,
             CAST(SUM(n_tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS mean_doc_tokens
      FROM t"""),
    run = (s, dir) => table(s, dir, "documents")
      .select(col("lang"), col("source"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n_tok"),
        length(col("text")).cast(LongType).as("n_ch"),
        md5(col("text")).as("h"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_ch")).as("n_chars"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"),
        (count(lit(1)) - count_distinct(col("h"))).as("n_exact_dups"))
      .select(col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_langs"), col("n_sources"), col("n_exact_dups"),
        (col("n_exact_dups").cast(DoubleType) /
          col("n_docs").cast(DoubleType)).as("dup_rate"),
        (col("n_tokens").cast(DoubleType) /
          col("n_docs").cast(DoubleType)).as("mean_doc_tokens")))

  /** Weighted-sampling resolution: per-doc keep probability is
    * min(n_chars, D)/D — longer docs kept proportionally more often,
    * capped at 1. */
  private val WeightScale = 400L

  private val weightedSample = GraftQuery(
    name = "pipeline_weighted_sample",
    doc = "Quality-weighted deterministic sampling: each doc is kept " +
      s"with probability min(n_chars, $WeightScale)/$WeightScale - " +
      "the weighted-mixture primitive (upweight long/high-quality " +
      "docs) done RNG-free: keep iff hash(doc_id) mod " +
      s"$WeightScale < min(n_chars, $WeightScale). Pure integer " +
      "arithmetic on the shared multiplicative id hash, so the draw " +
      "replays identically on any cluster, any partitioning, any " +
      "engine - same posture as train_test_split and " +
      "stratified_sample, but with a PER-ROW weight instead of a " +
      "per-stratum rate. Narrow map + filter; nothing shuffles but " +
      "the final sort.",
    oracle = Some(s"""
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             (((doc_id % 1000000007 + 1000000007) % 1000000007)
                * 2654435761) % 4294967296 % $WeightScale AS draw
      FROM documents
      WHERE (((doc_id % 1000000007 + 1000000007) % 1000000007)
                * 2654435761) % 4294967296 % $WeightScale
            < LEAST(n_chars, $WeightScale)
      ORDER BY doc_id"""),
    run = (s, dir) => table(s, dir, "documents")
      .withColumn("draw",
        graft.ops.Sampling.hash32(col("doc_id")) % WeightScale)
      .filter(col("draw") < least(col("n_chars"), lit(WeightScale)))
      .select(col("doc_id"), col("lang"), col("n_chars"), col("draw"))
      .orderBy("doc_id"))

  private val qualityClassifier = GraftQuery(
    name = "pipeline_quality_classifier",
    doc = "Hashed-feature LINEAR quality classifier, TRAINED IN-ENGINE " +
      "(the fastText-style model-based filter of CCNet/FineWeb " +
      "curation): a trusted heuristic labeler (stopword ratio >= 6% " +
      "over a 7-word lexicon) supervises a 4096-bucket hashed " +
      "bag-of-words model; the weight table is the closed-form " +
      "integer-exact class-token-rate difference (graft.ops." +
      "HashedLinear — one aggregation pass, <=4096 collected rows, " +
      "metadata-sized driver state; design notes incl. the rejected " +
      "oscillating batch-perceptron live on the object). INFERENCE " +
      "bakes the learned table into one ArrayData literal and stays " +
      "nested codegen'd higher-order functions — per-row narrow, " +
      "zero-shuffle; scores are per-token-normalized (the concept is " +
      "a ratio) and the keep set is CALIBRATED to the labeler's own " +
      "accept count via the two-phase Ids.orderedId rank — no " +
      "single-task global window. ~0.90 train agreement with the " +
      "labeler at sf0.001 (0.56 for the perceptron it replaces). " +
      "Oracle replays training, scoring AND calibration in pure SQL, " +
      "so a drift anywhere in the train-then-score-then-cut chain " +
      "breaks the hash.",
    oracle = Some("""
      WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS tok FROM documents),
      lab AS (
        SELECT doc_id,
               CAST(len(tok) AS BIGINT) AS n_tok,
               CAST(CASE WHEN 100 * len(list_filter(tok, t -> t IN
                      ('a','the','of','and','in','to','is')))
                    >= 6 * len(tok) THEN 1 ELSE -1 END AS BIGINT) AS y,
               list_transform(tok,
                 t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(t, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 1000003) % 4096) AS bk
        FROM d),
      e AS (SELECT doc_id, y, unnest(bk) AS b FROM lab),
      cnt AS (SELECT b,
                CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS pc,
                CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS nc
              FROM e GROUP BY b),
      tots AS (SELECT GREATEST(CAST(SUM(pc) AS BIGINT), 1) AS pt,
                      GREATEST(CAST(SUM(nc) AS BIGINT), 1) AS nt
               FROM cnt),
      w AS (SELECT b, (1000000 * pc) // pt - (1000000 * nc) // nt AS w
            FROM cnt, tots),
      raw AS (SELECT e.doc_id, CAST(SUM(w.w) AS BIGINT) AS r
              FROM e JOIN w USING (b) GROUP BY e.doc_id),
      sc AS (SELECT lab.doc_id, lab.y,
                    (COALESCE(raw.r, 0) * 1000) // lab.n_tok AS score
             FROM lab LEFT JOIN raw USING (doc_id)),
      np AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_pos FROM lab),
      rk AS (SELECT doc_id, y, score,
                    row_number() OVER (ORDER BY -score, doc_id) AS r
             FROM sc)
      SELECT rk.doc_id, rk.y AS label, rk.score,
             CAST(CASE WHEN rk.r <= np.n_pos THEN 1 ELSE 0 END AS BIGINT)
               AS keep
      FROM rk, np ORDER BY rk.doc_id"""),
    run = (s, dir) => {
      import graft.ops.{HashedLinear, Ids}
      // tokenize/hash ONCE: training, calibration count and inference
      // all read this persisted prep (one pass over text instead of
      // three-plus; at lake scale this is the standard
      // materialize-features-before-training trade, spill-safe)
      val prep = table(s, dir, "documents")
        .select(col("doc_id"),
          HashedLinear.labelCol("text").as("label"),
          HashedLinear.bucketsCol("text").as("__bk"),
          size(split(col("text"), " ")).cast(LongType).as("__ntok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val w = HashedLinear.trainRateDiff(prep, "label", "__bk")
      val nPos = prep.agg(sum(when(col("label") === 1L, 1L).otherwise(0L)))
        .first().getLong(0)
      val scored = prep
        .withColumn("__raw", HashedLinear.scoreColumn(col("__bk"), w))
        .select(col("doc_id"), col("label"),
          expr("(__raw * 1000) div __ntok").as("score"))
      Ids.orderedId(scored,
          Seq((-col("score")).as("__negs"), col("doc_id")), "__rk")
        .select(col("doc_id"), col("label"), col("score"),
          when(col("__rk") <= nPos, 1L).otherwise(0L).as("keep"))
        .orderBy("doc_id")
    })

  private val classifierHoldout = GraftQuery(
    name = "pipeline_classifier_holdout",
    doc = "Held-out evaluation of the in-engine-trained quality " +
      "classifier - the train/eval separation every model-based filter " +
      "needs before it gates a corpus (train-set agreement flatters; " +
      "the holdout confusion matrix is the number that decides " +
      "deployment). Deterministic 80/20 split by the shared " +
      "multiplicative id hash (hash32(doc_id) % 5 - RNG-free, " +
      "replayable on any engine/backfill); rate-difference weights " +
      "(graft.ops.HashedLinear) AND the calibrated score threshold are " +
      "fit on TRAIN only - the threshold is the n_pos-th ranked train " +
      "score via the two-phase orderedId (no single-task window) - " +
      "then frozen and applied to the unseen 20%. Output: the eval " +
      "confusion matrix (label, keep, n). Scale: the split is a " +
      "narrow filter over one shared persisted prep; training costs " +
      "are the classifier's (one 4096-key pass); eval scoring is " +
      "zero-shuffle. Oracle replays split, training, calibration and " +
      "eval scoring in pure SQL.",
    oracle = Some(s"""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS tok,
                   ${graft.ops.Sampling.hash32Sql("doc_id")} % 5 AS fold
                 FROM documents),
      lab AS (
        SELECT doc_id, fold,
               CAST(len(tok) AS BIGINT) AS n_tok,
               CAST(CASE WHEN 100 * len(list_filter(tok, t -> t IN
                      ('a','the','of','and','in','to','is')))
                    >= 6 * len(tok) THEN 1 ELSE -1 END AS BIGINT) AS y,
               list_transform(tok,
                 t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(string_split(t, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
                      (a, c) -> (a * 31 + c) % 1000003) % 4096) AS bk
        FROM d),
      tr AS (SELECT * FROM lab WHERE fold <> 0),
      ev AS (SELECT * FROM lab WHERE fold = 0),
      e AS (SELECT doc_id, y, unnest(bk) AS b FROM tr),
      cnt AS (SELECT b,
                CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS pc,
                CAST(SUM(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS nc
              FROM e GROUP BY b),
      tots AS (SELECT GREATEST(CAST(SUM(pc) AS BIGINT), 1) AS pt,
                      GREATEST(CAST(SUM(nc) AS BIGINT), 1) AS nt
               FROM cnt),
      w AS (SELECT b, (1000000 * pc) // pt - (1000000 * nc) // nt AS w
            FROM cnt, tots),
      rawt AS (SELECT e.doc_id, CAST(SUM(w.w) AS BIGINT) AS r
               FROM e JOIN w USING (b) GROUP BY e.doc_id),
      sct AS (SELECT tr.doc_id, tr.y,
                     (COALESCE(rawt.r, 0) * 1000) // tr.n_tok AS score
              FROM tr LEFT JOIN rawt USING (doc_id)),
      np AS (SELECT CAST(SUM(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_pos FROM tr),
      rkt AS (SELECT score,
                     row_number() OVER (ORDER BY -score, doc_id) AS rk
              FROM sct),
      tau AS (SELECT score AS t FROM rkt, np WHERE rk = n_pos),
      ee AS (SELECT doc_id, unnest(bk) AS b FROM ev),
      rawe AS (SELECT ee.doc_id, CAST(SUM(w.w) AS BIGINT) AS r
               FROM ee JOIN w USING (b) GROUP BY ee.doc_id),
      sce AS (SELECT ev.doc_id, ev.y,
                     (COALESCE(rawe.r, 0) * 1000) // ev.n_tok AS score
              FROM ev LEFT JOIN rawe USING (doc_id))
      SELECT sce.y AS label,
             CAST(CASE WHEN sce.score >= tau.t THEN 1 ELSE 0 END AS BIGINT)
               AS keep,
             COUNT(*) AS n
      FROM sce, tau GROUP BY 1, 2 ORDER BY label, keep"""),
    run = (s, dir) => {
      import graft.ops.{HashedLinear, Ids, Sampling}
      val prep = table(s, dir, "documents")
        .select(col("doc_id"),
          (Sampling.hash32(col("doc_id")) % 5).as("fold"),
          HashedLinear.labelCol("text").as("label"),
          HashedLinear.bucketsCol("text").as("__bk"),
          size(split(col("text"), " ")).cast(LongType).as("__ntok"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val train = prep.filter(col("fold") =!= 0)
      val w = HashedLinear.trainRateDiff(train, "label", "__bk")
      val nPos = train
        .agg(sum(when(col("label") === 1L, 1L).otherwise(0L)))
        .first().getLong(0)
      require(nPos > 0, "degenerate split: no positive train docs")
      def scores(df: DataFrame): DataFrame = df
        .withColumn("__raw", HashedLinear.scoreColumn(col("__bk"), w))
        .select(col("doc_id"), col("label"),
          expr("(__raw * 1000) div __ntok").as("score"))
      // threshold = the n_pos-th ranked TRAIN score, frozen before eval
      val tau = Ids.orderedId(scores(train),
          Seq((-col("score")).as("__negs"), col("doc_id")), "__rk")
        .filter(col("__rk") === nPos)
        .select("score").head().getLong(0)
      scores(prep.filter(col("fold") === 0))
        .select(col("label"),
          when(col("score") >= tau, 1L).otherwise(0L).as("keep"))
        .groupBy("label", "keep")
        .agg(count(lit(1)).as("n"))
        .orderBy("label", "keep")
    })

  private val unimaxEpochs = GraftQuery(
    name = "pipeline_unimax_epochs",
    doc = "UniMax-style epoch allocation (Chung et al. 2023): given a " +
      "token budget B = (capped total) div 2 and PER-SOURCE epoch caps " +
      "(1-4 by source-index formula — standing in for licensing/" +
      "quality caps; the paper's uniform cap is the special case), " +
      "find the water level L with sum_s min(cap_s*n_s, L) <= B and " +
      "allocate min(cap_s*n_s, L) tokens to each source: small " +
      "sources train full cap epochs, large sources are cut at L — " +
      "the budget-constrained generalization of temperature sampling " +
      "(pipeline_source_mix) that never repeats a small source past " +
      "its cap. The waterfill is CLOSED-FORM over sorted prefix sums: " +
      "f(k) = P_k + (m-k)*t_k is monotone in k, so k* = max{k: f(k) " +
      "<= B} and L = (B - P_k*) div (m - k*) — one window over the " +
      "SOURCES-sized stats frame (m rows, broadcast scale; fine on " +
      "one partition even at 100 TB where m is thousands), no driver " +
      "loop, no iteration. All arithmetic int64; epochs reported in " +
      "exact milli-epochs (alloc*1000 div n_tok).",
    oracle = Some("""
      WITH s AS (SELECT source,
              CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tok
            FROM documents GROUP BY 1),
      c AS (SELECT source, n_tok,
              1 + (CAST(substring(source, 4) AS BIGINT) % 4) AS cap_epochs,
              (1 + (CAST(substring(source, 4) AS BIGINT) % 4)) * n_tok AS t
            FROM s),
      tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt, COUNT(*) AS m FROM c),
      r AS (SELECT c.*, row_number() OVER (ORDER BY t, source) AS rn,
              CAST(SUM(t) OVER (ORDER BY t, source
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pk
            FROM c),
      f AS (SELECT r.*, pk + (m - rn) * t AS fv, tt // 2 AS b
            FROM r CROSS JOIN tot),
      k AS (SELECT COALESCE(MAX(rn), 0) AS kk FROM f WHERE fv <= b),
      kp AS (SELECT kk,
               COALESCE((SELECT pk FROM f WHERE rn = kk), 0) AS pk FROM k),
      lvl AS (SELECT CASE WHEN kk = m THEN -1
                     ELSE ((tt // 2) - kp.pk) // (m - kk) END AS lvl
              FROM kp CROSS JOIN tot)
      SELECT source, n_tok, cap_epochs,
             CASE WHEN lvl = -1 THEN t ELSE LEAST(t, lvl) END AS alloc_tok,
             (CASE WHEN lvl = -1 THEN t ELSE LEAST(t, lvl) END) * 1000
               // n_tok AS epochs_milli
      FROM c CROSS JOIN lvl ORDER BY source"""),
    run = (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val capExpr = "1 + (cast(substring(source, 4, 10) as bigint) % 4)"
      // sources-sized stats frame: the ONLY corpus-scale work is the
      // partial-agg token count; everything after is m rows
      val stats = table(s, dir, "documents")
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast(LongType)).as("n_tok"))
        .withColumn("cap_epochs", expr(capExpr))
        .withColumn("t", col("cap_epochs") * col("n_tok"))
        .localCheckpoint(true) // feeds 3 branches (tot, ranked, output)
      val tot = broadcast(
        stats.agg(sum("t").as("tt"), count(lit(1)).as("m")))
      // partition-less window is INTENTIONAL: it runs over the
      // per-SOURCE stats frame (m = number of corpus sources, a
      // metadata-sized constant at any data scale), so WindowExec's
      // single-partition warning is noise here, not a scale risk
      val w = Window.orderBy(col("t"), col("source"))
      val ranked = stats.crossJoin(tot)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .withColumn("pk", sum("t").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("fv", col("pk") + (col("m") - col("rn")) * col("t"))
        .withColumn("b", expr("tt div 2"))
      val kstar = ranked.filter(col("fv") <= col("b"))
        .select(col("rn").as("kk"), col("pk"), col("m"), col("b"))
        .unionByName(tot.select(lit(0L).as("kk"), lit(0L).as("pk"),
          col("m"), expr("tt div 2").as("b")))
        .orderBy(col("kk").desc).limit(1)
      val lvl = broadcast(kstar.select(
        when(col("kk") === col("m"), lit(-1L))
          .otherwise(expr("(b - pk) div (m - kk)")).as("lvl")))
      stats.crossJoin(lvl)
        .select(col("source"), col("n_tok"), col("cap_epochs"),
          when(col("lvl") === -1L, col("t"))
            .otherwise(least(col("t"), col("lvl"))).as("alloc_tok"))
        .withColumn("epochs_milli",
          expr("(alloc_tok * 1000) div n_tok"))
        .orderBy("source")
    })

  val all: Seq[GraftQuery] = Seq(
    dedupExact, dedupMinhash, dedupSimhash, dedupNgram, dedupPrefix,
    dedupContainment, ingestNearDup, dedupClusters,
    dedupKeepBest, embedNearDup, embedNearDupGlobal, embedNormalize,
    knnBrute, knnIvf, annLsh, annLshTopk, annRecall, ivfRecall, textStats,
    textQuality, langId,
    fingerprint,
    tokenCountBpe, textLevenshtein, textNormalize, vocabTopk,
    vocabCoverage, lengthHistogram, chunkWindows, urlExtract,
    urlCanonical, langRebalance, spanCorrupt, scoreWinsorize,
    scoreWinsorizeGk,
    stratifiedSample, sourceMix, qualityDupFrac, trainingExport,
    corpusClean, embedQuantize,
    piiScrub, qualityRepetition, tokenEntropy, tokenEntropyExact,
    decontaminate, decontamBloom,
    decontamOverlap,
    multimodalMeta,
    multimodalDecode, multimodalResize, multimodalAudio, multimodalVideo,
    kmeansTrain, embedPq, pqRecall, embedOpq, opqRecall,
    pqRecallAniso, opqRecallAniso,
    ivfPqSearch, ivfPqRecall,
    diverseCoreset, packSequences,
    tfidfTopk, zipfSpectrum,
    curriculumBins,
    incrementalIngest, qualityFamiliarity, tokenBudget, knnFiltered,
    semanticDedup, ingestSemDedup, multimodalIngest, embedOutliers, dupSpan,
    dedupSubstring,
    classBalance, lmFluency, bpeTrain, bpeSegment, ngramNovelty,
    datasetCard, weightedSample, qualityClassifier, classifierHoldout,
    unimaxEpochs)
}
