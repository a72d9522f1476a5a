package graft.tables

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sharded persistent blooms: the superset contract (no false
  * negatives, ever), generation lifecycle, and the co-routing
  * guarantee with repartition/bucketBy hashing. */
class BloomShardStoreSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives across shards; probe agrees with hash routing") {
    val dir = tmpDir("blooms")
    val store = new BloomShardStore(dir, buckets = 8, keys = Seq("url"))
    val urls = (1 to 5000).map(i => s"https://host${i % 97}.example/wiki/A$i")
    val df = urls.toDF("url")
    val indexed = store.refresh(df, v = 3, expectedItemsPerShard = 2000)
    assert(indexed == 5000L)
    assert(store.generation == 3)

    // every inserted key must probe TRUE (a false negative would let a
    // seen URL skip the exact anti-join and re-enter the frontier)
    val misses = df.filter(!store.probeCol(Seq(col("url")))).count()
    assert(misses == 0, s"$misses false negatives")

    // unseen keys should mostly probe FALSE (fpp ~1%; 50% would mean
    // the shard routing disagrees between build and probe)
    val fresh = (1 to 5000).map(i => s"https://other$i.example/x").toDF("url")
    val falsePos = fresh.filter(store.probeCol(Seq(col("url")))).count()
    assert(falsePos < 500, s"false-positive rate implausible: $falsePos/5000 — routing mismatch?")
  }

  test("refresh supersedes the generation and prunes old shard files") {
    val dir = tmpDir("blooms2")
    val store = new BloomShardStore(dir, buckets = 4, keys = Seq("url"))
    store.refresh(Seq("a", "b").toDF("url"), v = 1, expectedItemsPerShard = 1024)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-v1")))
    store.refresh(Seq("a", "b", "c").toDF("url"), v = 5, expectedItemsPerShard = 1024)
    assert(store.generation == 5)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "gen-v1")),
      "superseded generation not pruned")
    val all = Seq("a", "b", "c").toDF("url")
    assert(all.filter(!store.probeCol(Seq(col("url")))).count() == 0)
  }

  test("zero-shuffle build from a bucketed mirror's files agrees with probe routing") {
    val dir = tmpDir("blooms4")
    val mirror = new BucketedMirror(spark, s"$dir/mirror",
      s"graft_bsbtest_${(System.nanoTime() % 1000000)}", 8, Seq("url"), "url STRING")
    val urls = (1 to 4000).map(i => s"https://h${i % 31}.example/wiki/B$i")
    val files = mirror.refresh(urls.toDF("url"), 1)
    assert(files.forall(f => BloomShardStore.bucketIdOf(f) >= 0),
      "mirror files must carry bucket ids in their names")
    val store = new BloomShardStore(s"$dir/blooms", 8, Seq("url"))
    assert(store.refreshFromBucketedFiles(spark, files, 1, 1000) == 4000L)
    // every key routed by the PROBE's hash must land in the shard the
    // MIRROR's writer put it in — no false negatives means the two
    // routings agree file-for-file
    assert(urls.toDF("url").filter(!store.probeCol(Seq(col("url")))).count() == 0)
  }

  test("multi-column keys route and probe consistently") {
    val dir = tmpDir("blooms3")
    val keys = Seq("url", "title", "pre_url", "isleaf")
    val store = new BloomShardStore(dir, buckets = 4, keys = keys)
    val rows = (1 to 1000).map(i => (s"u$i", s"t${i % 50}", s"p${i % 7}", i % 2))
      .toDF("url", "title", "pre_url", "isleaf")
    store.refresh(rows, v = 1, expectedItemsPerShard = 1024)
    assert(rows.filter(!store.probeCol(keys.map(col))).count() == 0)
  }
}
