package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r6 measurement aid: does a persisted, pre-partitioned + pre-sorted
  * right side actually remove the per-call Exchange/Sort from the
  * repeated exact anti-join (the crawl superstep shape), and what does
  * each variant cost per call? Prints timing + formatted plans.
  *
  * Usage: runMain graft.CacheJoinProbe [nSeen] [nCand] [reps]
  */
object CacheJoinProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1400000
    val nc = if (args.length > 1) args(1).toInt else 100000
    val reps = if (args.length > 2) args(2).toInt else 8
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "cache-join-probe")
    if (sys.env.get("GRAFT_CACHE_PART").contains("1"))
      spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "false")
    import spark.implicits._
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val url = (idCol: org.apache.spark.sql.Column) =>
      concat(lit("https://host"), pmod(idCol, lit(997)), lit(".graft.example/wiki/A"), idCol)
    val dir = java.nio.file.Files.createTempDirectory("cachejoin").toString
    spark.range(n.toLong).select(url(col("id")).as("url"))
      .repartition(8).write.parquet(s"$dir/seen")
    val seen = spark.read.parquet(s"$dir/seen")
    val cand = spark.range(n / 2L, n / 2L + nc).select(url(col("id")).as("url"))

    def time(name: String, body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cachejoin] $name%-18s min=${times.min}%6.3f med=${times.sorted.apply(reps / 2)}%6.3f")
    }

    // A: plain per-call read (the old superstep shape)
    time("plain", cand.join(seen, Seq("url"), "left_anti").count())

    // A2: plain + shuffle_hash hint (no cache at all)
    time("plain+shj",
      cand.join(seen.hint("shuffle_hash"), Seq("url"), "left_anti").count())

    // B: cached pre-partitioned + pre-sorted right
    val cachedRight = seen.repartition(nPart, col("url"))
      .sortWithinPartitions("url")
      .persist(StorageLevel.MEMORY_AND_DISK)
    cachedRight.count()
    val joinedB = cand.join(cachedRight, Seq("url"), "left_anti")
    time("cached", joinedB.count())
    println("---- cached plan FULLPLAN ----")
    joinedB.explain("formatted")

    // C: cached + shuffle_hash hint
    val joinedC = cand.join(cachedRight.hint("shuffle_hash"), Seq("url"), "left_anti")
    time("cached+shj", joinedC.count())
    println("---- cached+shj plan ----")
    joinedC.explain("formatted")

    // E: wide 4-string-tuple key (the frontier J2 shape)
    val wide = (idCol: org.apache.spark.sql.Column) => Seq(
      url(idCol).as("url"), concat(lit("Title "), idCol).as("title"),
      url(idCol + 7).as("pre_url"), lit(1).as("isleaf"))
    spark.range(n.toLong).select(wide(col("id")): _*)
      .repartition(8).write.parquet(s"$dir/wide")
    val wideSeen = spark.read.parquet(s"$dir/wide")
    val wideCand = spark.range(n / 2L, n / 2L + nc).select(wide(col("id")): _*)
    val wKeys = Seq("url", "title", "pre_url", "isleaf")
    time("wide-plain", wideCand.join(wideSeen, wKeys, "left_anti").count())
    val wideCached = wideSeen.repartition(nPart, wKeys.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    wideCached.count()
    time("wide-cached", wideCand.join(wideCached, wKeys, "left_anti").count())
    time("wide-cached+shj",
      wideCand.join(wideCached.hint("shuffle_hash"), wKeys, "left_anti").count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jNoAqe = wideCand.join(wideCached, wKeys, "left_anti")
    time("wide-cached-noAQE", jNoAqe.count())
    println("---- wide cached noAQE plan ----")
    jNoAqe.explain("formatted")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // D: write cost of a small append (superstep commit shape)
    val delta = cand.limit(26000)
    time("write26k", {
      val out = s"$dir/w${System.nanoTime()}"
      delta.repartition(4).write.parquet(out)
      1L
    })
    spark.stop()
  }
}
