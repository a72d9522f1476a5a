package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory for the graft engine.
  *
  * Local runs use `local[N]` (one JVM, N executor threads); production
  * deploys the same code unchanged via spark-submit on a real cluster —
  * nothing here assumes a single JVM. Shuffle partitions default to the
  * core count (not 200) so small-scale runs don't drown in empty tasks;
  * AQE coalesces / splits at runtime where the static choice is wrong.
  */
object Sessions {
  def local(cpus: Int, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // bucketed-scan fallback heuristic OFF: with it on, Spark may
      // silently plan the seen-mirror anti-join as a plain scan and
      // re-gain the right-side Exchange+Sort the mirror exists to
      // remove (measured in graft.BucketProbe)
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      // compile cached plans WITHOUT AQE so InMemoryRelation keeps its
      // child's outputPartitioning/outputOrdering: a persisted
      // repartition+sort right side then sort-merge-joins with NO
      // exchange and NO sort (verified in CacheJoinProbe's formatted
      // plan — with the Spark 4 default the cached side re-shuffles
      // and re-sorts on every join). Cached subtrees here are small
      // and explicitly partitioned, so losing AQE inside them costs
      // nothing.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.UrlExpressions.register(spark)
    spark
  }
}
