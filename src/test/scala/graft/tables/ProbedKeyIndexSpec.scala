package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Adaptive re-bucketing of the probed key index: when
  * `targetPartitionBytes` is set, each refresh re-sizes the bucket
  * count so mirror partitions stay ≈ fixed bytes as the index grows —
  * the mechanism that keeps sparse-regime probe cost O(batch) (≤
  * candidateKeys × partition size) instead of O(corpus/constant).
  * Routing is per-generation, so membership must survive a modulus
  * change: keys indexed under the OLD bucket count must still be found
  * after the index re-buckets.
  */
class ProbedKeyIndexSpec extends SparkSpec {
  import spark.implicits._

  private def keysDf(ids: Range) = ids.map(i => f"key$i%06d").toDF("k")

  test("re-bucketing at refresh grows the bucket count and preserves membership") {
    val idx = new ProbedKeyIndex(spark, tmpDir("pki"), Seq("k"),
      buckets = 4, targetPartitionBytes = 2048, fpp = 1e-5)

    idx.append(keysDf(0 until 3000), "gen1 load")
    idx.refresh()
    val g1 = idx.generation
    val b1 = idx.bucketsAt(g1)
    assert(b1 > 4, s"3000 keys over a 2 KiB partition target should out-grow 4 buckets, got $b1")

    // membership under the grown modulus
    val probe1 = keysDf(2990 until 3010) // 10 present, 10 absent
    val (hits1, stats1) = idx.hits(probe1)
    assert(hits1.as[String].collect().sorted.toSeq ==
      (2990 until 3000).map(i => f"key$i%06d"))
    assert(stats1.generationBuckets == b1)
    assert(stats1.mirrorFilesScanned < stats1.mirrorFilesTotal,
      s"no pruning under re-bucketed layout: $stats1")

    // second refresh over a 3× index must re-bucket again, and keys
    // from BOTH generations must still probe true under the new modulus
    idx.append(keysDf(3000 until 9000), "gen2 load")
    idx.refresh()
    val g2 = idx.generation
    val b2 = idx.bucketsAt(g2)
    assert(g2 > g1 && b2 > b1, s"index tripled but buckets $b1 -> $b2")

    val probe2 = keysDf(0 until 10).union(keysDf(8995 until 9005))
    val (hits2, stats2) = idx.hits(probe2)
    assert(hits2.as[String].collect().sorted.toSeq ==
      ((0 until 10) ++ (8995 until 9000)).map(i => f"key$i%06d"),
      "membership lost across the modulus change")
    assert(stats2.generationBuckets == b2)
    assert(stats2.mirrorBytesTotal > 0 &&
      stats2.mirrorBytesScanned < stats2.mirrorBytesTotal,
      s"sparse probe read the whole re-bucketed mirror: $stats2")
  }

  test("fixed-bucket mode (targetPartitionBytes=0) keeps the constructor modulus") {
    val idx = new ProbedKeyIndex(spark, tmpDir("pki_fixed"), Seq("k"), buckets = 4)
    idx.append(keysDf(0 until 3000), "load")
    idx.refresh()
    assert(idx.bucketsAt(idx.generation) == 4)
    val (hits, _) = idx.hits(keysDf(2995 until 3005))
    assert(hits.count() == 5)
  }
}
