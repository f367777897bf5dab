package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftQuery
import graft.ops.{HashedLinear, TextOps}
import graft.sources.Readers.table

/** Corpus-curation operators beyond the pipeline set: retrieval scoring
  * (BM25), target-domain selection (DSIR-style importance ranking), and
  * the per-stage drop accounting every production curation pipeline
  * reports (the "filter funnel").
  *
  * Shared exactness discipline (the tfidf trick, PipelineQueries):
  * every double in compared output is ONE division of two exactly-
  * computed 64-bit integers, so Spark and DuckDB round identically and
  * rankings (ties broken by id) are bit-determined. BM25's k1/b and the
  * idf smoothing are kept RATIONAL (k1 = 6/5, b = 3/4, idf = (2N+2)/
  * (2df+1)) so the whole score folds into that single division; the
  * textbook ln() idf is deliberately dropped — per-term doc ranking is
  * unchanged (idf is a per-term constant) and cross-engine ln() is not
  * bit-portable.
  */
object CurationQueries {

  /** Shared BM25 scorer: per-(term, doc) rational-BM25 scores for the 5
    * mid-df query terms (df ranks 10-14). k1 = 6/5, b = 3/4 folded
    * symbolically into integer numerator/denominator (see bm25Topk doc).
    * One tokenize pass: tf feeds df, dl AND the scoring join; the term
    * list broadcasts; TakeOrdered(14) bounds the term-selection frame
    * so its rank window is driver-bounded. */
  /** Shared BM25 postings prep: (term, doc_id, tf, df, dl, n_docs,
    * l_tok) for the 5 mid-df query terms — everything both scorers
    * (rational and ln-idf) need, one tokenize pass. */
  private def bm25Joined(s: SparkSession, dir: String): DataFrame = {
    val tf = table(s, dir, "documents")
      .select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dfr = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val scalars = table(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum("dl").as("l_tok")))
    // partition-less window is INTENTIONAL: it runs over the
    // .limit(14) term-selection frame (14 rows at any corpus size), so
    // WindowExec's single-partition warning is noise here, not a
    // scale risk
    val termW = Window.orderBy(col("df").desc, col("token"))
    val terms = dfr.orderBy(col("df").desc, col("token")).limit(14)
      .withColumn("tr", row_number().over(termW))
      .filter(col("tr").between(10, 14)).drop("tr")
      .withColumnRenamed("token", "term")
    tf.withColumnRenamed("token", "term")
      .join(broadcast(terms), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
  }

  private def bm25Scored(s: SparkSession, dir: String): DataFrame = {
    val num = lit(22L) * col("tf") * col("l_tok")
      .* (lit(2L) * col("n_docs") + lit(2L))
    val den = (lit(10L) * col("l_tok") * col("tf")
      + lit(3L) * col("l_tok")
      + lit(9L) * col("dl") * col("n_docs"))
      .* (lit(2L) * col("df") + lit(1L))
    bm25Joined(s, dir)
      .withColumn("score", num.cast(DoubleType) / den.cast(DoubleType))
  }

  /** The BM25 CTE chain shared VERBATIM by bm25Topk's and bm25Query's
    * oracles (one definition — Spark and DuckDB move together, the
    * Threshold convention of PipelineQueries). */
  private val Bm25OracleCtes = """
      WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
                   FROM documents),
      tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok GROUP BY doc_id, token),
      dfr AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY token),
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
             FROM tf GROUP BY doc_id),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
      lt AS (SELECT CAST(SUM(dl) AS BIGINT) AS l_tok FROM dl),
      terms AS (SELECT token, df FROM (
          SELECT token, df,
                 row_number() OVER (ORDER BY df DESC, token) AS tr
          FROM dfr) WHERE tr BETWEEN 10 AND 14),
      scored AS (SELECT t.token AS term, f.doc_id, f.tf, d.dl, t.df,
          CAST(22 * f.tf * l.l_tok * (2 * n.n_docs + 2) AS DOUBLE) /
          CAST((10 * l.l_tok * f.tf + 3 * l.l_tok + 9 * d.dl * n.n_docs)
               * (2 * t.df + 1) AS DOUBLE) AS score
        FROM tf f JOIN terms t USING (token) JOIN dl d USING (doc_id)
        CROSS JOIN nd n CROSS JOIN lt l)"""

  private val bm25Topk = GraftQuery(
    name = "pipeline_bm25_topk",
    doc = "BM25 retrieval scoring: top-5 documents per query term for " +
      "the 5 mid-df vocabulary terms (df ranks 10-14 - past the " +
      "stopword head, still corpus-wide). The retrieval primitive a " +
      "training-data pipeline runs for targeted corpus slicing and " +
      "eval-set mining. Exactness: k1 = 6/5 and b = 3/4 stay rational, " +
      "so the full per-(term,doc) score folds to " +
      "22*tf*L*(2N+2) / ((10*L*tf + 3*L + 9*dl*N)*(2df+1)) - one " +
      "double division of two exact BIGINT products (L = corpus token " +
      "count, dl = doc length; both engines round identically). The " +
      "ln() of textbook idf is dropped: per-term ranking is invariant " +
      "to it (idf is constant within a term) and ln is not " +
      "bit-portable across engines. Scale: tf/df/dl are " +
      "partial-aggregable; the 5-term postings join is a broadcast of " +
      "the term list; per-term top-5 is TWO-PHASE (salted local " +
      "row_number, then global over <=160 rows/term) so a hot term's " +
      "postings never serialize onto one task.",
    oracle = Some(Bm25OracleCtes + """,
      rk AS (SELECT *, row_number() OVER (PARTITION BY term
               ORDER BY score DESC, doc_id) AS rank FROM scored)
      SELECT term, doc_id, tf, dl, df, score, CAST(rank AS BIGINT) AS rank
      FROM rk WHERE rank <= 5 ORDER BY term, rank"""),
    run = (s, dir) => {
      val scored = bm25Scored(s, dir)
      // two-phase per-term top-5: a term's postings are corpus-sized at
      // scale, so phase 1 ranks within (term, doc_id%32) salt slices
      // (a doc in the global top-5 is in its slice's top-5), phase 2
      // ranks the <=160 survivors per term
      val w1 = Window.partitionBy(col("term"), pmod(col("doc_id"), lit(32)))
        .orderBy(col("score").desc, col("doc_id"))
      val w2 = Window.partitionBy(col("term"))
        .orderBy(col("score").desc, col("doc_id"))
      scored.withColumn("__rn1", row_number().over(w1))
        .filter(col("__rn1") <= 5).drop("__rn1")
        .withColumn("rank", row_number().over(w2).cast(LongType))
        .filter(col("rank") <= 5)
        .select("term", "doc_id", "tf", "dl", "df", "score", "rank")
        .orderBy("term", "rank")
    })

  private val domainAffinity = GraftQuery(
    name = "pipeline_domain_affinity",
    doc = "Hashed n-gram domain-affinity selection (DSIR-shaped, " +
      "Xie et al. 2023: rank source documents by how much more their " +
      "hashed-feature profile resembles a target domain than the " +
      "background corpus): target = the MIN(source) slice, features = " +
      "the classifier's 4096-bucket char-polynomial token hash " +
      "(graft.ops.HashedLinear - the expression string is shared " +
      "verbatim with the DuckDB oracle). Score is the LINEAR-space " +
      "likelihood-ratio surrogate dot(c,t)*S_tot / (dot(c,s)*T_tot) - " +
      "exact BIGINT inner products and totals folded into one double " +
      "division (DSIR's log-space weights are not bit-portable across " +
      "engines; the linear form keeps the same ordering signal and the " +
      "oracle exact). dot_s >= 1 always (a doc's own tokens are in the " +
      "background), so the division is total. Top-200 by (score, " +
      "doc_id) via TakeOrdered - no global sort. Scale: the bucket " +
      "arrays are materialized once; the two histograms are " +
      "partial-aggregable 4096-group passes collected at driver scale " +
      "and baked into array LITERALS (the HashedLinear inference " +
      "pattern), so per-doc scoring is a zero-shuffle, zero-join " +
      "per-row array fold (interpreted HOF, but narrow and "+
      "shuffle-free) - dot(c,t) = sum over the doc's own " +
      "tokens of t[bucket], no exploded-corpus shuffle anywhere " +
      "(the first formulation shuffled a corpus-sized (doc,bucket) " +
      "frame; measured 30.4 -> 17.3 s at the 500k-doc 100x rung and " +
      "1.73 -> 0.90 s at sf0.1).",
    oracle = Some("""
      WITH d AS (SELECT doc_id, source,
          list_transform(string_split(text, ' '),
            t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(t, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 1000003) % 4096) AS bk
        FROM documents),
      tgt AS (SELECT MIN(source) AS tsrc FROM documents),
      e AS (SELECT doc_id, source, unnest(bk) AS b FROM d),
      c AS (SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM e GROUP BY doc_id, source, b),
      tb AS (SELECT b, CAST(SUM(c.c) AS BIGINT) AS t
             FROM c, tgt WHERE c.source = tgt.tsrc GROUP BY b),
      sb AS (SELECT b, CAST(SUM(c.c) AS BIGINT) AS s FROM c GROUP BY b),
      tots AS (SELECT (SELECT CAST(SUM(t) AS BIGINT) FROM tb) AS t_tot,
                      (SELECT CAST(SUM(s) AS BIGINT) FROM sb) AS s_tot),
      dots AS (SELECT c.doc_id,
                 CAST(SUM(c.c * COALESCE(tb.t, 0)) AS BIGINT) AS dot_t,
                 CAST(SUM(c.c * sb.s) AS BIGINT) AS dot_s
               FROM c LEFT JOIN tb USING (b) JOIN sb USING (b)
               GROUP BY c.doc_id)
      SELECT doc_id, dot_t, dot_s,
             CAST(dot_t * s_tot AS DOUBLE) /
             CAST(dot_s * t_tot AS DOUBLE) AS score
      FROM dots, tots
      ORDER BY score DESC, doc_id LIMIT 200"""),
    run = (s, dir) => {
      // bucket arrays materialized ONCE: the two histogram passes and
      // the scoring pass all read this slim frame instead of
      // re-tokenizing the corpus per consumer
      val prep = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          HashedLinear.bucketsCol("text").as("bk"))
        .localCheckpoint(true)
      val tgtVal = prep.agg(min("source")).first().getString(0)
      // histograms as driver arrays (<= 4096 rows each - the
      // HashedLinear literal pattern): partial-aggregable passes, then
      // scoring needs NO join and NO shuffle at all
      def histogram(df: org.apache.spark.sql.DataFrame): Array[Long] = {
        val h = Array.fill(HashedLinear.Buckets)(0L)
        df.select(explode(col("bk")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
          .collect()
          .foreach(r => h(r.getLong(0).toInt) = r.getLong(1))
        h
      }
      val tArr = histogram(prep.filter(col("source") === tgtVal))
      val sArr = histogram(prep)
      val tTot = tArr.sum
      val sTot = sArr.sum
      // dot(c, t) = sum over the doc's OWN tokens of t[bucket]: the
      // codegen'd BucketDotExpr fold against the baked table (the HOF
      // aggregate twin is interpreted; OpsSpec pins them bit-equal)
      import graft.functions.BucketDotExpr.bucketDot
      prep.withColumn("dot_t", bucketDot(col("bk"), tArr))
        .withColumn("dot_s", bucketDot(col("bk"), sArr))
        .withColumn("score",
          (col("dot_t") * lit(sTot)).cast(DoubleType) /
            (col("dot_s") * lit(tTot)).cast(DoubleType))
        .select("doc_id", "dot_t", "dot_s", "score")
        .orderBy(col("score").desc, col("doc_id")).limit(200)
    })

  private val filterFunnel = GraftQuery(
    name = "pipeline_filter_funnel",
    doc = "Filter-funnel accounting: every document attributed to " +
      "exactly ONE outcome - its FIRST failing quality rule in a fixed " +
      "order (too_short <30 tok, too_long >90, high_stopword >12%, " +
      "low_ttr <0.31, ratio thresholds as integer cross-products; " +
      "thresholds sit inside this corpus's distribution so EVERY path " +
      "carries rows and the oracle differentially checks all six), " +
      "then prefix_dup (same 8-token head as a lower-id quality " +
      "survivor - the templated-boilerplate rule), else kept - with " +
      "doc and token counts per outcome. This is the observability " +
      "primitive a production curation pipeline reports nightly; at " +
      "100 TB a drop chart that double-counts or loses documents is " +
      "worse than no chart. All integers. Scale: one narrow pass " +
      "computes the rule flags, the dup stage keys on the 16-byte md5 " +
      "of the head (never raw text), and the funnel is a 6-row " +
      "aggregate.",
    oracle = Some("""
      WITH q AS (SELECT doc_id,
          md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            AS n_dis
        FROM documents),
      r1 AS (SELECT doc_id, h, n_tok,
          CASE WHEN n_tok < 30 THEN 'too_short'
               WHEN n_tok > 90 THEN 'too_long'
               WHEN 25 * n_stop > 3 * n_tok THEN 'high_stopword'
               WHEN 100 * n_dis < 31 * n_tok THEN 'low_ttr'
               ELSE NULL END AS reason0
        FROM q),
      keep AS (SELECT h, MIN(doc_id) AS keeper FROM r1
               WHERE reason0 IS NULL GROUP BY h),
      fin AS (SELECT r1.doc_id, r1.n_tok,
          COALESCE(r1.reason0,
            CASE WHEN r1.doc_id <> k.keeper THEN 'prefix_dup'
                 ELSE 'kept' END) AS reason
        FROM r1 LEFT JOIN keep k ON k.h = r1.h)
      SELECT CAST(CASE reason WHEN 'too_short' THEN 1 WHEN 'too_long'
               THEN 2 WHEN 'high_stopword' THEN 3 WHEN 'low_ttr' THEN 4
               WHEN 'prefix_dup' THEN 5 ELSE 6 END AS BIGINT) AS stage,
             reason, COUNT(*) AS n_docs,
             CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
             MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
      FROM fin GROUP BY stage, reason ORDER BY stage"""),
    run = (s, dir) => {
      val w = TextOps.tokens(col("text"))
      // slim flag frame (no text - the head md5 stands in for it from
      // here on); feeds both the keeper aggregate and the attribution
      val r1 = table(s, dir, "documents")
        .select(col("doc_id"),
          md5(array_join(slice(w, 1, 8), " ")).as("h"),
          size(w).cast(LongType).as("n_tok"),
          TextOps.markerHits(w, Seq("the", "a")).cast(LongType)
            .as("n_stop"),
          size(array_distinct(w)).cast(LongType).as("n_dis"))
        .withColumn("reason0",
          when(col("n_tok") < 30, "too_short")
            .when(col("n_tok") > 90, "too_long")
            .when(lit(25L) * col("n_stop") > lit(3L) * col("n_tok"),
              "high_stopword")
            .when(lit(100L) * col("n_dis") < lit(31L) * col("n_tok"),
              "low_ttr"))
        .select("doc_id", "h", "n_tok", "reason0")
        .localCheckpoint(true)
      val keep = r1.filter(col("reason0").isNull)
        .groupBy("h").agg(min("doc_id").as("keeper"))
      val reason = coalesce(col("reason0"),
        when(col("doc_id") =!= col("keeper"), "prefix_dup")
          .otherwise("kept"))
      r1.join(keep, Seq("h"), "left")
        .withColumn("reason", reason)
        .withColumn("stage",
          when(col("reason") === "too_short", 1L)
            .when(col("reason") === "too_long", 2L)
            .when(col("reason") === "high_stopword", 3L)
            .when(col("reason") === "low_ttr", 4L)
            .when(col("reason") === "prefix_dup", 5L).otherwise(6L))
        .groupBy("stage", "reason")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("doc_id").as("min_doc_id"), max("doc_id").as("max_doc_id"))
        .orderBy("stage")
    })

  private val rankFusion = GraftQuery(
    name = "pipeline_rank_fusion",
    doc = "Borda rank fusion of three quality signals - the " +
      "multi-signal data-selection step run when no single score is " +
      "trusted (combine-then-cut instead of cascading filters): " +
      "length (n_tok), lexical diversity (TTR in ppm) and " +
      "stopword density (ppm - the Gopher-style natural-language " +
      "signal), each ranked corpus-wide descending with doc_id " +
      "tie-break, fused as the integer RANK SUM (Borda; RRF's " +
      "1/(k+rank) floats are not bit-portable, the rank sum carries " +
      "the same consensus signal exactly). Top-100 by (borda, " +
      "doc_id). The ppm signals are positive-operand integer " +
      "divisions (truncation == floor, both engines agree). Scale: " +
      "each corpus-wide rank is the two-phase Ids.orderedId (range " +
      "layout + O(partitions) boundary offsets, NO single-task " +
      "global window); the fusion is three slim shuffle joins on " +
      "doc_id and a TakeOrdered top-100.",
    oracle = Some("""
      WITH q AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            AS n_dis,
          CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        FROM documents),
      s AS (SELECT doc_id, n_tok,
          (n_dis * 1000000) // n_tok AS ttr_ppm,
          (n_stop * 1000000) // n_tok AS stop_ppm FROM q),
      r AS (SELECT doc_id,
          CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
            AS BIGINT) AS r_len,
          CAST(row_number() OVER (ORDER BY ttr_ppm DESC, doc_id)
            AS BIGINT) AS r_ttr,
          CAST(row_number() OVER (ORDER BY stop_ppm DESC, doc_id)
            AS BIGINT) AS r_stop
        FROM s)
      SELECT doc_id, r_len, r_ttr, r_stop,
             r_len + r_ttr + r_stop AS borda
      FROM r ORDER BY borda, doc_id LIMIT 100"""),
    run = (s, dir) => {
      import graft.ops.Ids
      val w = TextOps.tokens(col("text"))
      // one stats pass; the three rank phases and the fusion joins all
      // read this slim checkpointed frame
      val base = table(s, dir, "documents")
        .select(col("doc_id"), size(w).cast(LongType).as("n_tok"),
          size(array_distinct(w)).cast(LongType).as("n_dis"),
          TextOps.markerHits(w, Seq("the", "a")).cast(LongType)
            .as("n_stop"))
        .withColumn("ttr_ppm", expr("(n_dis * 1000000) div n_tok"))
        .withColumn("stop_ppm", expr("(n_stop * 1000000) div n_tok"))
        .select("doc_id", "n_tok", "ttr_ppm", "stop_ppm")
        .localCheckpoint(true)
      def rank(key: String, out: String) =
        Ids.orderedId(base.select(col("doc_id"), col(key)),
            Seq((-col(key)).as("__neg"), col("doc_id")), out)
          .select("doc_id", out)
      rank("n_tok", "r_len")
        .join(rank("ttr_ppm", "r_ttr"), "doc_id")
        .join(rank("stop_ppm", "r_stop"), "doc_id")
        .withColumn("borda", col("r_len") + col("r_ttr") + col("r_stop"))
        .orderBy(col("borda"), col("doc_id")).limit(100)
    })

  private val rankFusionRrf = GraftQuery(
    name = "pipeline_rank_fusion_rrf",
    doc = "RECIPROCAL-RANK fusion (RRF, k = 60) - the textbook variant " +
      "pipeline_rank_fusion's Borda sum stood in for. The r13 doc " +
      "assumed RRF's 1/(k+rank) floats were not bit-portable; they " +
      "are: 1/(60+rank) is ONE correctly-rounded IEEE division of " +
      "exact integers (no transcendental - unlike ln-idf BM25, which " +
      "genuinely needs tolerance mode), and the three-term sum is " +
      "evaluated in the same fixed order in both engines, so the RRF " +
      "score ships under the DEFAULT exact-hash gate. Same three " +
      "quality signals and the same skew-proof two-phase orderedId " +
      "ranks as rank_fusion; top-100 by (rrf DESC, doc_id) via " +
      "TakeOrdered. QueriesSpec pins the two fusions' top sets " +
      "overlapping (same consensus signal, different weighting of " +
      "rank gaps).",
    oracle = Some("""
      WITH q AS (SELECT doc_id,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            AS n_dis,
          CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop
        FROM documents),
      s AS (SELECT doc_id, n_tok,
          (n_dis * 1000000) // n_tok AS ttr_ppm,
          (n_stop * 1000000) // n_tok AS stop_ppm FROM q),
      r AS (SELECT doc_id,
          CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
            AS BIGINT) AS r_len,
          CAST(row_number() OVER (ORDER BY ttr_ppm DESC, doc_id)
            AS BIGINT) AS r_ttr,
          CAST(row_number() OVER (ORDER BY stop_ppm DESC, doc_id)
            AS BIGINT) AS r_stop
        FROM s)
      SELECT doc_id, r_len, r_ttr, r_stop,
             (1.0 / (60.0 + r_len) + 1.0 / (60.0 + r_ttr))
               + 1.0 / (60.0 + r_stop) AS rrf
      FROM r ORDER BY rrf DESC, doc_id LIMIT 100"""),
    run = (s, dir) => {
      import graft.ops.Ids
      val w = TextOps.tokens(col("text"))
      val base = table(s, dir, "documents")
        .select(col("doc_id"), size(w).cast(LongType).as("n_tok"),
          size(array_distinct(w)).cast(LongType).as("n_dis"),
          TextOps.markerHits(w, Seq("the", "a")).cast(LongType)
            .as("n_stop"))
        .withColumn("ttr_ppm", expr("(n_dis * 1000000) div n_tok"))
        .withColumn("stop_ppm", expr("(n_stop * 1000000) div n_tok"))
        .select("doc_id", "n_tok", "ttr_ppm", "stop_ppm")
        .localCheckpoint(true)
      def rank(key: String, out: String) =
        Ids.orderedId(base.select(col("doc_id"), col(key)),
            Seq((-col(key)).as("__neg"), col("doc_id")), out)
          .select("doc_id", out)
      // fixed evaluation order mirrors the oracle: (len + ttr) + stop —
      // three correctly-rounded divisions and two additions, bit-exact
      def term(c: String) = lit(1.0) / (lit(60.0) + col(c))
      rank("n_tok", "r_len")
        .join(rank("ttr_ppm", "r_ttr"), "doc_id")
        .join(rank("stop_ppm", "r_stop"), "doc_id")
        .withColumn("rrf",
          (term("r_len") + term("r_ttr")) + term("r_stop"))
        .orderBy(col("rrf").desc, col("doc_id")).limit(100)
    })

  private val bm25Query = GraftQuery(
    name = "pipeline_bm25_query",
    doc = "MULTI-TERM BM25 retrieval via exact rank fusion - the " +
      "whole-query answer bm25_topk's per-term exactness constraint " +
      "forbids (summing per-term BM25 doubles is not bit-portable " +
      "because float addition orders differ across engines; summing " +
      "per-term RANKS is integer-exact and carries the same consensus " +
      "- the rank_fusion insight applied to retrieval). The 5 mid-df " +
      "terms form one query; each term's postings are ranked with the " +
      "skew-proof SkewWindows.rankedPrefix (range layout, NO " +
      "single-task per-term window - a hot term's postings are " +
      "corpus-sized at 100 TB); a doc missing a term gets the " +
      "fill rank k_t+1, folded in WITHOUT a docs-x-terms cross join " +
      "via borda = sum_t(k_t+1) + sum_present(rank - k_t - 1), so " +
      "only posting rows are ever touched. Docs hitting zero terms " +
      "are not retrieved (standard retrieval contract). Top-20 by " +
      "(borda, doc_id) via TakeOrdered.",
    oracle = Some(Bm25OracleCtes + """,
      rk AS (SELECT term, doc_id, row_number() OVER (PARTITION BY term
               ORDER BY score DESC, doc_id) AS trank FROM scored),
      kt AS (SELECT term, CAST(MAX(trank) AS BIGINT) AS kt
             FROM rk GROUP BY term),
      fill AS (SELECT CAST(SUM(kt + 1) AS BIGINT) AS f FROM kt),
      agg AS (SELECT rk.doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               CAST(SUM(rk.trank - kt.kt - 1) AS BIGINT) AS adj
              FROM rk JOIN kt USING (term) GROUP BY rk.doc_id)
      SELECT doc_id, n_terms_hit, f + adj AS borda
      FROM agg, fill ORDER BY borda, doc_id LIMIT 20"""),
    run = (s, dir) => {
      import graft.ops.SkewWindows
      val scored = bm25Scored(s, dir)
        .select("term", "doc_id", "score", "df")
      // cost-based dispatch (r14 verdict #3): df IS the per-term group
      // size (one postings row per doc containing the term), so the
      // probe is a max over an existing column — no counting pass
      val ranked = SkewWindows.rankedPrefixAuto(scored, "term",
          Seq(col("score").desc, col("doc_id")), None, "trank", "__cum",
          precomputedCounts = Some((scored, "df")))
        .drop("__cum", "df")
      val kt = ranked.groupBy("term").agg(max("trank").as("kt"))
      val fill = kt.agg(sum(col("kt") + lit(1L)).as("f"))
      ranked.join(broadcast(kt), "term")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_terms_hit"),
          sum(col("trank") - col("kt") - lit(1L)).as("adj"))
        .crossJoin(broadcast(fill))
        .select(col("doc_id"), col("n_terms_hit"),
          (col("f") + col("adj")).as("borda"))
        .orderBy(col("borda"), col("doc_id")).limit(20)
    })

  /** Textbook-BM25 saturation + per-term rank by (sat DESC, doc_id),
    * shared by pipeline_bm25_lnidf and its exact-hash twin. Ranking by
    * sat is ranking by score — idf is a positive PER-TERM CONSTANT, so
    * within a term the real-number orderings are identical — but sat
    * uses only correctly-rounded IEEE +,-,*,/ over identical inputs in
    * identical order (no transcendental), so both engines compute
    * bit-identical sat values and therefore bit-identical ranks. This
    * closes the r14 ADVICE flaky-gate risk: a 1-ULP ln drift at a rank
    * or top-5 boundary can no longer flip ordering/membership, because
    * the ordering never consults ln. Same salted two-phase per-term
    * top-5 as bm25_topk. */
  private val Bm25SatCtes = Bm25OracleCtes + """,
      lsc AS (SELECT t.token AS term, f.doc_id, f.tf, d.dl, t.df,
          CAST(n.n_docs AS DOUBLE) AS ndd,
          ((CAST(f.tf AS DOUBLE) * 2.2)
           / (CAST(f.tf AS DOUBLE) + 1.2 *
              (0.25 + 0.75 * (CAST(d.dl AS DOUBLE)
                / (CAST(l.l_tok AS DOUBLE) / CAST(n.n_docs AS DOUBLE))))))
            AS sat
        FROM tf f JOIN terms t USING (token) JOIN dl d USING (doc_id)
        CROSS JOIN nd n CROSS JOIN lt l),
      rk2 AS (SELECT *, row_number() OVER (PARTITION BY term
               ORDER BY sat DESC, doc_id) AS rank FROM lsc)"""

  private def bm25SatRanked(s: SparkSession, dir: String): DataFrame = {
    val tfD = col("tf").cast(DoubleType)
    val dlD = col("dl").cast(DoubleType)
    val avgdl = col("l_tok").cast(DoubleType) / col("n_docs").cast(DoubleType)
    // parenthesization mirrors the oracle token for token
    val sat = (tfD * lit(2.2)) /
      (tfD + lit(1.2) * (lit(0.25) + lit(0.75) * (dlD / avgdl)))
    val w1 = Window.partitionBy(col("term"), pmod(col("doc_id"), lit(32)))
      .orderBy(col("sat").desc, col("doc_id"))
    val w2 = Window.partitionBy(col("term"))
      .orderBy(col("sat").desc, col("doc_id"))
    bm25Joined(s, dir).withColumn("sat", sat)
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= 5).drop("__rn1")
      .withColumn("rank", row_number().over(w2).cast(LongType))
      .filter(col("rank") <= 5)
  }

  private val bm25LnIdf = GraftQuery(
    name = "pipeline_bm25_lnidf",
    doc = "TEXTBOOK BM25 (Robertson/Okapi): idf = ln(1 + (N - df + " +
      "0.5)/(df + 0.5)), saturation tf*(k1+1)/(tf + k1*(1 - b + " +
      "b*dl/avgdl)) with the standard k1 = 1.2, b = 0.75 - the " +
      "ln-and-float semantics pipeline_bm25_topk's exact-hash " +
      "constraint forbids (measured: Spark's StrictMath-codegen log " +
      "and DuckDB's libm ln disagree by 1 ULP on 147/2000 idf inputs, " +
      "so no rational contortion can make this hashable). First user " +
      "of TOLERANCE MODE (r13 verdict #6): the oracle routes through " +
      "tolerance_oracle_sql.json and tools/check.py compares the " +
      "score column under rtol 1e-9 (a few ULPs of headroom above " +
      "the measured 1-ULP drift), ranks and integer inputs exactly; " +
      "the driver's exact-hash gate records its rows-only check " +
      "instead of a designed failure. Both engines evaluate the " +
      "IDENTICALLY parenthesized formula, so every difference is " +
      "transcendental rounding, never algebra. r15 (r14 ADVICE): the " +
      "per-term rank orders by the IEEE-exact saturation factor, not " +
      "the ln-scaled score - identical real-number ordering (idf is a " +
      "positive per-term constant), but rank boundaries can no longer " +
      "flip on a 1-ULP ln drift, and the whole integer+sat skeleton " +
      "ships under the driver's DEFAULT exact-hash gate as the twin " +
      "pipeline_bm25_lnidf_ranks. Same salted two-phase per-term " +
      "top-5 as bm25_topk.",
    tolerance = Some(1e-9),
    oracle = Some(Bm25SatCtes + """
      SELECT term, doc_id, tf, dl, df,
        ln(1.0 + (ndd - CAST(df AS DOUBLE) + 0.5)
                 / (CAST(df AS DOUBLE) + 0.5)) * sat AS score,
        CAST(rank AS BIGINT) AS rank
      FROM rk2 WHERE rank <= 5 ORDER BY term, rank"""),
    run = (s, dir) => {
      val ndD = col("n_docs").cast(DoubleType)
      val dfD = col("df").cast(DoubleType)
      val idf = log(lit(1.0) + (ndD - dfD + lit(0.5)) / (dfD + lit(0.5)))
      bm25SatRanked(s, dir)
        .withColumn("score", idf * col("sat"))
        .select("term", "doc_id", "tf", "dl", "df", "score", "rank")
        .orderBy("term", "rank")
    })

  private val bm25LnIdfRanks = GraftQuery(
    name = "pipeline_bm25_lnidf_ranks",
    doc = "EXACT-HASH TWIN of pipeline_bm25_lnidf (r14 verdict #1): " +
      "the same plan projecting only its bit-portable columns - the " +
      "integer inputs (tf, dl, df), the saturation factor (IEEE " +
      "+,-,*,/ over identical inputs in identical order, no " +
      "transcendental) and the per-term rank derived from it - so the " +
      "driver's default exact-hash gate certifies everything about " +
      "the textbook-BM25 operator except the final ln multiply, which " +
      "stays under the twin's rtol-1e-9 differential. A defect in " +
      "tokenization, tf/df/dl, term selection, the saturation " +
      "algebra, or the two-phase ranking fails THIS row's hash.",
    oracle = Some(Bm25SatCtes + """
      SELECT term, doc_id, tf, dl, df, sat, CAST(rank AS BIGINT) AS rank
      FROM rk2 WHERE rank <= 5 ORDER BY term, rank"""),
    run = (s, dir) =>
      bm25SatRanked(s, dir)
        .select("term", "doc_id", "tf", "dl", "df", "sat", "rank")
        .orderBy("term", "rank"))

  /** Token budget of the composed curation job — binds at every tracked
    * sf (corpora are 27k-270k tokens) so the budget stage always cuts. */
  private val CurateBudget = 2000L

  private val curateFull = GraftQuery(
    name = "pipeline_curate_full",
    doc = "END-TO-END curation composition - the r13 curation family " +
      "run as ONE job instead of piecewise: (1) the filter-funnel " +
      "quality+prefix-dup gate (same rules as pipeline_filter_funnel) " +
      "keeps only clean keeper docs; (2) DSIR-shaped domain affinity " +
      "is scored ON THE CLEANED CORPUS (target = MIN(source) slice of " +
      "the survivors, histograms re-derived downstream of the funnel, " +
      "baked into literals - zero-join scoring); (3) Borda rank " +
      "fusion of affinity, TTR and length over the survivors (each " +
      "rank is the two-phase Ids.orderedId, no single-task window); " +
      "(4) docs admitted in fused order until a " + CurateBudget +
      "-token budget exhausts (global cumsum via the skew-proof " +
      "rankedPrefix, inclusive like pipeline_token_budget); (5) the " +
      "admitted set greedily packed into 64-token bins, 8 shards " +
      "(pipeline_pack_sequences' fold). The oracle replays the WHOLE " +
      "chain - funnel CASE, histogram dots, three ranks, windowed " +
      "budget, recursive-CTE pack - so a defect in any stage or in " +
      "stage WIRING fails the hash. Scale posture inherited from the " +
      "pieces: slim flag frames, driver-bounded 4096-bucket " +
      "histograms, range-partitioned ranks, per-shard packing.",
    oracle = Some(s"""
      WITH RECURSIVE q AS (SELECT doc_id, source,
          md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS h,
          CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
          CAST(len(list_filter(string_split(text, ' '),
            t -> t IN ('the', 'a'))) AS BIGINT) AS n_stop,
          CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
            AS n_dis,
          list_transform(string_split(text, ' '),
            t -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(string_split(t, ''),
                     c -> CAST(ascii(c) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 1000003) % 4096) AS bk
        FROM documents),
      r1 AS (SELECT *, CASE WHEN n_tok < 30 THEN 'too_short'
               WHEN n_tok > 90 THEN 'too_long'
               WHEN 25 * n_stop > 3 * n_tok THEN 'high_stopword'
               WHEN 100 * n_dis < 31 * n_tok THEN 'low_ttr'
               ELSE NULL END AS reason0 FROM q),
      kp AS (SELECT h, MIN(doc_id) AS keeper FROM r1
             WHERE reason0 IS NULL GROUP BY h),
      kept AS (SELECT r1.doc_id, r1.source, r1.n_tok, r1.n_dis, r1.bk
               FROM r1 JOIN kp ON kp.h = r1.h
               WHERE r1.reason0 IS NULL AND r1.doc_id = kp.keeper),
      tgt AS (SELECT MIN(source) AS tsrc FROM kept),
      e AS (SELECT doc_id, source, unnest(bk) AS b FROM kept),
      c AS (SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM e GROUP BY doc_id, source, b),
      tb AS (SELECT b, CAST(SUM(c.c) AS BIGINT) AS t
             FROM c, tgt WHERE c.source = tgt.tsrc GROUP BY b),
      sb AS (SELECT b, CAST(SUM(c.c) AS BIGINT) AS s FROM c GROUP BY b),
      tots AS (SELECT (SELECT CAST(SUM(t) AS BIGINT) FROM tb) AS t_tot,
                      (SELECT CAST(SUM(s) AS BIGINT) FROM sb) AS s_tot),
      dots AS (SELECT c.doc_id,
                 CAST(SUM(c.c * COALESCE(tb.t, 0)) AS BIGINT) AS dot_t,
                 CAST(SUM(c.c * sb.s) AS BIGINT) AS dot_s
               FROM c LEFT JOIN tb USING (b) JOIN sb USING (b)
               GROUP BY c.doc_id),
      sig AS (SELECT k.doc_id, k.n_tok,
                (k.n_dis * 1000000) // k.n_tok AS ttr_ppm,
                CAST(d.dot_t * t2.s_tot AS DOUBLE) /
                CAST(d.dot_s * t2.t_tot AS DOUBLE) AS aff
              FROM kept k JOIN dots d USING (doc_id), tots t2),
      rk AS (SELECT doc_id, n_tok,
               CAST(row_number() OVER (ORDER BY aff DESC, doc_id)
                 AS BIGINT) AS r_aff,
               CAST(row_number() OVER (ORDER BY ttr_ppm DESC, doc_id)
                 AS BIGINT) AS r_ttr,
               CAST(row_number() OVER (ORDER BY n_tok DESC, doc_id)
                 AS BIGINT) AS r_len
             FROM sig),
      adm AS (SELECT doc_id, n_tok, r_aff + r_ttr + r_len AS borda,
                SUM(n_tok) OVER (ORDER BY r_aff + r_ttr + r_len, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM rk),
      sel AS (SELECT doc_id, n_tok, CAST(borda AS BIGINT) AS borda,
                CAST(cum AS BIGINT) AS cum_tokens
              FROM adm WHERE cum <= $CurateBudget),
      t AS (SELECT doc_id, doc_id % 8 AS shard, n_tok AS n, borda,
              cum_tokens FROM sel),
      r AS (SELECT doc_id, shard, n, borda, cum_tokens,
              row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM t),
      p AS (SELECT doc_id, shard, n, borda, cum_tokens, rn,
              CAST(0 AS BIGINT) AS bin_idx,
              CAST(0 AS BIGINT) AS tok_offset,
              LEAST(n, 64) AS fill
            FROM r WHERE rn = 1
            UNION ALL
            SELECT r.doc_id, r.shard, r.n, r.borda, r.cum_tokens, r.rn,
              CASE WHEN p.fill + r.n > 64 THEN p.bin_idx + 1
                   ELSE p.bin_idx END,
              CASE WHEN p.fill + r.n > 64 THEN 0 ELSE p.fill END,
              CASE WHEN p.fill + r.n > 64 THEN LEAST(r.n, 64)
                   ELSE p.fill + r.n END
            FROM p JOIN r ON r.shard = p.shard AND r.rn = p.rn + 1)
      SELECT doc_id, borda, cum_tokens, shard, bin_idx, tok_offset,
             n AS n_tokens, CAST(n > 64 AS BIGINT) AS truncated
      FROM p ORDER BY doc_id"""),
    run = (s, dir) => {
      implicit val sp: SparkSession = s
      import graft.functions.BucketDotExpr.bucketDot
      import graft.ops.{Ids, SkewWindows}
      val w = TextOps.tokens(col("text"))
      // Stage 1 — funnel flags (same rules/constants as filter_funnel);
      // one slim pass, text dropped immediately, bucket arrays carried
      // for the downstream affinity stage
      val r1 = table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          md5(array_join(slice(w, 1, 8), " ")).as("h"),
          size(w).cast(LongType).as("n_tok"),
          TextOps.markerHits(w, Seq("the", "a")).cast(LongType)
            .as("n_stop"),
          size(array_distinct(w)).cast(LongType).as("n_dis"),
          HashedLinear.bucketsCol("text").as("bk"))
        .withColumn("reason0",
          when(col("n_tok") < 30, "too_short")
            .when(col("n_tok") > 90, "too_long")
            .when(lit(25L) * col("n_stop") > lit(3L) * col("n_tok"),
              "high_stopword")
            .when(lit(100L) * col("n_dis") < lit(31L) * col("n_tok"),
              "low_ttr"))
        .localCheckpoint(true)
      val kp = r1.filter(col("reason0").isNull)
        .groupBy("h").agg(min("doc_id").as("keeper"))
      // survivors: quality-clean AND the keeper of their 8-token head
      val kept = r1.filter(col("reason0").isNull)
        .join(kp, "h").filter(col("doc_id") === col("keeper"))
        .select("doc_id", "source", "n_tok", "n_dis", "bk")
        .localCheckpoint(true) // feeds 2 histograms + scoring + signals
      // Stage 2 — affinity on the CLEANED corpus (histograms re-derived
      // downstream of the funnel, driver-bounded at 4096 buckets)
      val tgtVal = kept.agg(min("source")).first().getString(0)
      def histogram(df: DataFrame): Array[Long] = {
        val h = Array.fill(HashedLinear.Buckets)(0L)
        df.select(explode(col("bk")).as("b"))
          .groupBy("b").agg(count(lit(1)).as("n"))
          .collect()
          .foreach(r => h(r.getLong(0).toInt) = r.getLong(1))
        h
      }
      val tArr = histogram(kept.filter(col("source") === tgtVal))
      val sArr = histogram(kept)
      val tTot = tArr.sum
      val sTot = sArr.sum
      val sig = kept
        .withColumn("dot_t", bucketDot(col("bk"), tArr))
        .withColumn("dot_s", bucketDot(col("bk"), sArr))
        .withColumn("aff",
          (col("dot_t") * lit(sTot)).cast(DoubleType) /
            (col("dot_s") * lit(tTot)).cast(DoubleType))
        .withColumn("ttr_ppm", expr("(n_dis * 1000000) div n_tok"))
        .select("doc_id", "n_tok", "ttr_ppm", "aff")
        .localCheckpoint(true) // feeds the 3 rank branches + join-back
      // Stage 3 — Borda fusion of (affinity, TTR, length), each rank
      // the two-phase orderedId (range layout, no single-task window)
      def rank(key: String, out: String) =
        Ids.orderedId(sig.select(col("doc_id"), col(key)),
            Seq((-col(key)).as("__neg"), col("doc_id")), out)
          .select("doc_id", out)
      val fused = rank("aff", "r_aff")
        .join(rank("ttr_ppm", "r_ttr"), "doc_id")
        .join(rank("n_tok", "r_len"), "doc_id")
        .join(sig.select("doc_id", "n_tok"), "doc_id")
        .withColumn("borda", col("r_aff") + col("r_ttr") + col("r_len"))
      // Stage 4 — token budget over the fused order (global inclusive
      // cumsum; cost-based: plain window while the survivor frame fits
      // one task, the two-phase range-layout form beyond — the
      // constant group makes that the only scalable shape at 100 TB)
      val admitted = SkewWindows.rankedPrefixAuto(
          fused.withColumn("__g", lit(0L))
            .select("__g", "doc_id", "n_tok", "borda"),
          "__g", Seq(col("borda"), col("doc_id")),
          Some("n_tok"), "__rank", "cum_tokens")
        .filter(col("cum_tokens") <= CurateBudget)
        .select("doc_id", "n_tok", "borda", "cum_tokens")
      // Stage 5 — pack the admitted set (64-token bins, 8 shards)
      val packed = graft.ops.Packing.packGreedy(
        admitted.select(col("doc_id"), (col("doc_id") % 8).as("shard"),
          col("n_tok").as("n_tokens")),
        capacity = 64).toDF()
      packed.join(admitted.select("doc_id", "borda", "cum_tokens"),
          "doc_id")
        .select(col("doc_id"), col("borda"), col("cum_tokens"),
          col("shard"), col("bin_idx"), col("tok_offset"),
          col("n_tokens"), col("truncated").cast(LongType).as("truncated"))
        .orderBy("doc_id")
    })

  val all: Seq[GraftQuery] =
    Seq(bm25Topk, domainAffinity, filterFunnel, rankFusion, bm25Query,
      curateFull, bm25LnIdf, bm25LnIdfRanks, rankFusionRrf)
}
