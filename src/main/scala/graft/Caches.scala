package graft

import org.apache.spark.sql.SparkSession

/** Block-manager hygiene for long sessions running many queries.
  *
  * Several operators pin intermediates for intra-query reuse
  * (`localCheckpoint`/`persist` in Dedup, Ids, PipelineQueries). Those
  * blocks are only useful within one query's execution; across a multi-query
  * bench/verify session they accumulate in the block manager and compete
  * with shuffle/execution memory. Bench and Verify call this between
  * queries — dropping every persistent RDD and SQL-cache entry is safe
  * there because no state is shared across queries.
  */
object Caches {
  def clearAll(spark: SparkSession): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Silence per-query WARN spam that buries the one JSON line the
    * driver parses from the bench/verify tail: the localCheckpoint
    * lineage-truncation warning (every unpersist of a pinned block),
    * and the streaming planner's AQE-disabled / temp-checkpoint
    * notices (every drained stream). Expected-by-design messages, not
    * signals; real errors still surface at ERROR. */
  def quietNoisyLogs(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Seq(
      "org.apache.spark.rdd.MapPartitionsRDD",
      "org.apache.spark.rdd.ParallelCollectionRDD",
      "org.apache.spark.sql.execution.streaming",
      "org.apache.spark.sql.classic.streaming"
    ).foreach(Configurator.setLevel(_, Level.ERROR))
  }
}
