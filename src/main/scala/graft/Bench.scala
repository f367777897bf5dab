package graft

import org.apache.spark.sql.SparkSession

/** Bench main (driver contract): times every registered query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line. Queries run in sorted name
  * order (stable across rounds); a short untimed warmup first-touches the
  * parquet files and JIT-compiles the common operator paths so query #1
  * doesn't pay the JVM's cold start. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config(graft.sources.Readers.NanosAsLongKey, "true")
      .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
      .config("spark.ui.enabled", "false")
      // SPARK_GRAFT_STATE_STORE=rocksdb benches the drained streaming
      // family on RocksDBStateStoreProvider (the 100 TB state posture;
      // SURVEY §6 records the delta vs the default HDFS-backed provider)
      .config(graft.streaming.EventStream.StateStoreKey,
        sys.env.getOrElse("SPARK_GRAFT_STATE_STORE", "hdfs"))
    // fork-free local fs (see graft.sources.NioLocalFs): without the
    // hadoop native lib every local create/chmod/stat forks a subprocess
    // - 5-10 ms per file that a production cluster never pays
    val spark = graft.sources.NioLocalFs.SessionConfs
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Caches.quietNoisyLogs()

    // warmup: touch every table + exercise agg/join/window codegen paths
    graft.sources.Readers.tableNames.foreach { t =>
      graft.sources.Readers.table(spark, sfDir, t).count()
    }
    Seq("lake_agg_pricing", "lake_star_revenue", "lake_windows").foreach {
      q => Registry.byName(q).run(spark, sfDir).count()
    }
    // synthesize the Sparkify JSON corpus UNTIMED (r11 verdict #4): the
    // TempDirs cache builds it once per JVM, so without this the FIRST
    // timed pass of etl_sparkify_full pays corpus synthesis on top of
    // the five measured sinks (min-of-2 usually hides that, but the
    // row should never conflate one-time input prep with job cost)
    graft.etl.SparkifyBenchInput.prepare(spark, sfDir)

    // two timed passes, keep the per-query minimum: the shared machine
    // shows ±30% wall-clock noise and min-of-2 is a stabler estimator
    // of the achievable time than a single sample
    // a failed query must not masquerade as a fast one: record it as
    // -1 in the detail (clearly invalid), surface it on stderr, and
    // keep it out of the total
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those
    // queries (substring match); unset (the driver's case) = everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    // etl_sparkify_full is a regular Registry query now (EtlJobQueries):
    // its run() executes SparkifyJob end-to-end — five parquet sinks,
    // shared log prefix persisted once — then reads the sinks back into
    // the canonical (tbl, rowstr) frame, so the timed row measures the
    // whole job plus read-back and the SAME name is oracle-checked in
    // CORRECTNESS. Pass 1 pays the cached input synthesis (TempDirs);
    // min-of-2 reports the job itself.
    def selected: Seq[String] = {
      val names = Registry.all.map(_.name).sorted
      only.fold(names)(pats => names.filter(n => pats.exists(n.contains)))
    }
    // Timing executes the query's OWN physical plan via toRdd.count():
    // a df.count() would re-optimize with count-specific pruning, and
    // Spark eliminates a final left join onto an aggregated (provably
    // unique) side under count — several scoring queries (dup_span,
    // lm_fluency, semantic_dedup's pair stage) timed as bare scans
    // until this was caught. toRdd materializes every row with all
    // columns — the same work Verify's parquet dump pays.
    def pass(): Seq[(String, Double)] =
      selected.map { name =>
        val t0 = System.nanoTime()
        val ok =
          try {
            Registry.byName(name).run(spark, sfDir)
              .queryExecution.toRdd.count()
            true
          }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        // untimed: drop blocks pinned by this query (localCheckpoint /
        // persist intermediates) so they don't accumulate across the
        // passes and squeeze later queries' execution memory
        Caches.clearAll(spark)
        name -> dt
      }
    val (p1, p2) = (pass(), pass())
    // min-of-2 also propagates failure: -1 wins the min if either pass failed
    val results = p1.zip(p2).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val nFailed = results.count(_._2 < 0)
    val total = results.collect { case (_, t) if t >= 0 => t }.sum

    // Locale.ROOT: default-locale formatting would emit "0,328" under a
    // comma-decimal locale and break both JSON outputs.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jsonMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }.mkString("{", ",", "}")

    // Full per-query detail goes to a repo file (the driver keeps only a
    // bounded tail of this process's stdout, so the printed line must stay
    // short — round 1's 73-entry line overflowed that tail and failed to
    // parse). The printed line carries the total plus a fixed headline
    // subset; BENCH_DETAIL.json has everything.
    val detail =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"queries":${jsonMap(results)},"sf":"$sfDir"}"""
    // Anchor the detail file: env override first, else CWD resolved to an
    // absolute path — and LOG where it went, so a driver launched from a
    // different directory can't silently leave a stale repo copy behind.
    // A FILTERED dev run must never clobber the tracked full detail: with
    // SPARK_GRAFT_BENCH_ONLY set and no explicit detail path, write to a
    // temp-side file instead.
    val defaultDetail =
      if (only.isDefined)
        sys.props("java.io.tmpdir") + "/BENCH_DETAIL_partial.json"
      else "BENCH_DETAIL.json"
    val detailPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", defaultDetail))
      .toAbsolutePath
    java.nio.file.Files.write(detailPath, (detail + "\n").getBytes("UTF-8"))
    System.err.println(s"[bench] detail written to $detailPath")

    // per-round archive (r15 verdict #6): a full run ALSO writes
    // BENCH_DETAIL_r{N}.json next to the driver's BENCH_r{N}.json so
    // rounds stop clobbering each other's per-query history. N is
    // inferred from the committed BENCH_r*.json files in CWD (the
    // driver saves round N-1's summary before round N benches); if
    // none are visible (dev run from elsewhere) the archive is skipped
    // — the primary detail file above is always written. An explicit
    // SPARK_GRAFT_BENCH_DETAIL override marks a probe/skew run — those
    // must never overwrite the round's sf0.1 archive either.
    if (only.isEmpty && !sys.env.contains("SPARK_GRAFT_BENCH_DETAIL")) {
      try {
        val cwd = java.nio.file.Paths.get(".").toAbsolutePath
        val re = "BENCH_r(\\d+)\\.json".r
        val s = java.nio.file.Files.list(cwd)
        val last =
          try {
            import scala.jdk.CollectionConverters._
            s.iterator().asScala.flatMap(p =>
              re.findFirstMatchIn(p.getFileName.toString)
                .map(_.group(1).toInt)).maxOption
          } finally s.close()
        last.foreach { n =>
          val p = cwd.resolve(f"BENCH_DETAIL_r${n + 1}%02d.json")
          java.nio.file.Files.write(p, (detail + "\n").getBytes("UTF-8"))
          System.err.println(s"[bench] round archive written to $p")
        }
      } catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] round archive skipped: $e")
      }
    }

    val headline = Seq(
      "parity_songplays_star", "parity_join_twokey", "parity_partitioned_write",
      "lake_agg_pricing", "lake_star_revenue", "lake_join_bigbig",
      "lake_topk_orders", "lake_windows", "lake_sessionize", "lake_asof_join",
      "pipeline_dedup_exact", "pipeline_dedup_minhash", "pipeline_dedup_simhash",
      "pipeline_dedup_prefix", "pipeline_dedup_clusters", "pipeline_corpus_clean",
      "pipeline_knn_brute", "pipeline_knn_ivf", "pipeline_ann_lsh",
      "pipeline_multimodal_decode", "stream_windowed_counts")
    val byName = results.toMap
    val head = jsonMap(headline.flatMap(n => byName.get(n).map(n -> _)))
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","n_queries":${results.size},"n_failed":$nFailed,"queries":$head,"sf":"$sfDir"}""")
    spark.stop()
  }
}
