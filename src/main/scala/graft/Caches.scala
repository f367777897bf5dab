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
}
