package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The curation/text family on a PATHOLOGICAL corpus: empty text,
  * single token, all-stopword, one-token-repeated (TTR floor), unicode
  * (accented + CJK — Spark and DuckDB both return codepoints from
  * `ascii()`, so the shared char-polynomial hash is cross-engine-exact
  * beyond ASCII; verified by the driver-side differential run recorded
  * in SURVEY), and three documents sharing an 8-token head (the
  * prefix_dup path). The full DuckDB differential on this exact shape
  * ran at build time (10 queries ALL PASS); this spec keeps the
  * invariants pinned in-repo where the oracle harness can't reach.
  */
class EdgeCorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val dir: String = {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel " +
      "india juliet kilo lima"
    val rows = Seq(
      (0L, "", "en", "edge"),
      (1L, "solo", "en", "edge"),
      (2L, "the a the a the a the a", "en", "edge"),
      (3L, ("x " * 50) + "x", "en", "edge"),
      (4L, "héllo wörld naïve café résumé early über straße", "en", "edge"),
      (5L, "中文 文本 中文 测试 数据 管道 质量 过滤", "zh", "edge"),
      (6L, base + " mike november oscar papa", "en", "edge"),
      (7L, base + " quebec romeo sierra tango", "en", "edge"),
      (8L, base + " uniform victor whiskey xray", "en", "edge")) ++
      (9 until 30).map { i =>
        val words = (0 until 20).map(j => s"w${(i * 7 + j) % 23}") ++
          Seq("the", "a", s"tail$i")
        (i.toLong, words.mkString(" "),
          if (i % 3 == 0) "fr" else "en",
          if (i % 2 == 0) "other" else "edge")
      }
    val d = java.nio.file.Files.createTempDirectory("graft_edge").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$d/documents.parquet")
    d
  }

  test("filter funnel conserves the pathological corpus exactly") {
    val f = Registry.byName("pipeline_filter_funnel").run(spark, dir)
    val t = f.agg(sum("n_docs")).head().getLong(0)
    assert(t == 30L, s"funnel lost/duplicated docs: $t")
    Caches.clearAll(spark)
  }

  test("domain affinity scores every doc, empty text included") {
    val a = Registry.byName("pipeline_domain_affinity").run(spark, dir)
      .collect()
    assert(a.length == 30, "top-200 over 30 docs must return all 30")
    assert(a.forall(_.getLong(2) >= 1L), "dot_s >= 1 must hold (self-mass)")
    Caches.clearAll(spark)
  }

  test("rank fusion ranks are permutations of 1..n on edge input") {
    val r = Registry.byName("pipeline_rank_fusion").run(spark, dir)
      .collect()
    assert(r.length == 30)
    Seq(1, 2, 3).foreach { c =>
      assert(r.map(_.getLong(c)).sorted.toSeq == (1L to 30L),
        s"rank column $c is not a permutation")
    }
    Caches.clearAll(spark)
  }

  test("overlap decontamination fractions partial overlaps exactly") {
    val r = Registry.byName("pipeline_decontam_overlap").run(spark, dir)
      .collect()
    // training docs with >= 13 tokens: 20..29 (23 tokens, 11 shingles)
    assert(r.length == 10)
    r.foreach { row =>
      val n13 = row.getLong(1)
      val nHit = row.getLong(2)
      assert(n13 == 11L && nHit <= n13)
      assert(row.getDouble(3) == nHit.toDouble / n13)
      assert(row.getLong(4) == (if (10 * nHit >= n13) 1L else 0L))
    }
    // the shifted w-cycle plants PARTIAL bench overlaps (0 < hit < all):
    // the fraction rule must see them as fractions, not all-or-nothing
    assert(r.exists(row => row.getLong(2) > 0 && row.getLong(2) < 11L))
    Caches.clearAll(spark)
  }

  test("token entropy: degenerate docs land exactly at zero") {
    val r = Registry.byName("pipeline_token_entropy").run(spark, dir)
      .collect()
    assert(r.length == 30)
    val byId = r.map(x => x.getLong(0) -> x).toMap
    // single-token-distribution docs: H must be EXACTLY 0.0 (1*ln(1)),
    // not a rounding residue — the one entropy value both engines owe
    // bit-exactly even under tolerance mode
    assert(byId(0L).getDouble(3) == 0.0) // empty text -> [""] once
    assert(byId(1L).getDouble(3) == 0.0) // "solo"
    assert(byId(3L).getDouble(3) == 0.0) // 51x the same token
    // information-theory bounds hold corpus-wide: 0 <= H <= ln(k)
    r.foreach { x =>
      val h = x.getDouble(3)
      assert(h >= 0.0 &&
        h <= math.log(x.getLong(2).toDouble) + 1e-12,
        s"entropy out of [0, ln k] for doc ${x.getLong(0)}: $h")
    }
    Caches.clearAll(spark)
  }

  test("curate_full degrades to empty when the funnel rejects everything") {
    // every edge doc is under the 30-token quality floor: the composed
    // job must flow an EMPTY survivor set through affinity histograms,
    // three orderedId ranks, the budget cumsum and the packer without
    // crashing (null target source, empty offsets map, empty fold)
    val r = Registry.byName("pipeline_curate_full").run(spark, dir)
      .collect()
    assert(r.isEmpty)
    Caches.clearAll(spark)
  }

  test("bm25 emits 5 ranked docs per term with tf >= 1") {
    val b = Registry.byName("pipeline_bm25_topk").run(spark, dir).collect()
    val byTerm = b.groupBy(_.getString(0))
    assert(byTerm.size == 5, s"expected 5 query terms, got ${byTerm.keys}")
    byTerm.values.foreach { rows =>
      assert(rows.map(_.getLong(6)).sorted.toSeq == (1L to rows.length))
      assert(rows.forall(_.getLong(2) >= 1L))
    }
    Caches.clearAll(spark)
  }
}
