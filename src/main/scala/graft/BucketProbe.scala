package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe: can a BUCKETED seen table remove the right-side shuffle+sort
  * from the per-superstep exact anti-join?
  *
  * At the 10^10 design point the anti-join's right side (the committed
  * seen table, ~600 GB) is re-shuffled and re-sorted by EVERY
  * superstep's sort-merge join — the dominant recurring cost once the
  * frontier is large. Spark's native bucketed tables (`bucketBy(B,
  * key).sortBy(key).saveAsTable`) declare the storage partitioning to
  * Catalyst, so a join on the bucket key reads the right side with NO
  * Exchange and NO Sort (the classic storage-partitioned join). This
  * main measures plain-parquet vs bucketed anti-join at the 10^7 local
  * design point and prints the evidence JSON; the executed plans are
  * printed so the missing Exchange/Sort is auditable.
  *
  * Usage: runMain graft.BucketProbe [nRows] [nBuckets]
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 10000000
    val buckets = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val wh = java.nio.file.Files.createTempDirectory("graftwh").toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("bucket-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", wh)
      // autoBucketedScan may silently fall back to a plain scan (it
      // second-guesses benefit at planning time); force bucketed scans
      // so the storage partitioning reaches EnsureRequirements
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val url = (idCol: org.apache.spark.sql.Column) =>
      concat(lit("https://host"), pmod(idCol, lit(997)), lit(".graft.example/wiki/A"), idCol)

    val dir = java.nio.file.Files.createTempDirectory("bucketprobe").toString
    spark.range(n.toLong).select(url(col("id")).as("url"))
      .repartition(8).write.parquet(s"$dir/seen_plain")
    // pre-repartition on the SAME murmur3(url) the bucketer uses, so
    // each writer task holds exactly one bucket → one file per bucket
    // (without this, T write tasks × B buckets = T·B tiny files and the
    // bucketed scan pays T file-opens per task)
    spark.range(n.toLong).select(url(col("id")).as("url"))
      .repartition(buckets, col("url"))
      .write.bucketBy(buckets, "url").sortBy("url").mode("overwrite")
      .saveAsTable("seen_bucketed")

    val seenPlain = spark.read.parquet(s"$dir/seen_plain")
    val seenBucketed = spark.table("seen_bucketed")
    val cand = spark.range(n / 2L, n / 2L + n).select(url(col("id")).as("url"))

    def timeBest2(tag: String, body: => Long): (Long, Double, Double) = {
      val runs = (1 to 2).map(_ => Bench.timedWithSteal(body))
      val best = runs.minBy(_._2)
      (best._1, best._2, best._3)
    }
    // sub-timings: isolate scan cost from join cost
    val (_, scanPlainSec, _, _, _) = Bench.timedWithSteal(seenPlain.count())
    val (_, scanBuckSec, _, _, _) = Bench.timedWithSteal(seenBucketed.count())
    System.err.println(f"[probe] scan-only plain=$scanPlainSec%.2fs bucketed=$scanBuckSec%.2fs")

    // warm-up both paths (JIT, parquet footers)
    cand.join(seenPlain, Seq("url"), "left_anti").count()
    cand.join(seenBucketed, Seq("url"), "left_anti").count()

    val (nPlain, sPlain, stealPlain) =
      timeBest2("plain", cand.join(seenPlain, Seq("url"), "left_anti").count())
    val (nBuck, sBuck, stealBuck) =
      timeBest2("bucketed", cand.join(seenBucketed, Seq("url"), "left_anti").count())
    require(nPlain == nBuck, s"bucketed path changed the result: $nPlain vs $nBuck")

    System.err.println("== plain executed plan ==")
    val dfP = cand.join(seenPlain, Seq("url"), "left_anti"); dfP.count(); dfP.explain("formatted")
    System.err.println("== bucketed executed plan ==")
    val dfB = cand.join(seenBucketed, Seq("url"), "left_anti"); dfB.count(); dfB.explain("formatted")

    println(
      s"""{"metric":"bucket_probe","rows":$n,"buckets":$buckets,"cpus":$cpus,""" +
        s""""plain_sec":${"%.3f".format(sPlain)},"bucketed_sec":${"%.3f".format(sBuck)},""" +
        s""""plain_steal_pct":${"%.2f".format(stealPlain)},"bucketed_steal_pct":${"%.2f".format(stealBuck)},""" +
        s""""unseen":$nPlain,"speedup":${"%.3f".format(sPlain / sBuck)}}""")
    spark.stop()
  }
}
