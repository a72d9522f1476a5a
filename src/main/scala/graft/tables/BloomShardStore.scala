package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, concat_ws, hash, lit, pmod, udf}
import org.apache.spark.util.sketch.BloomFilter

/** Persistent, bucket-sharded Bloom filters for the URL-seen prefilter —
  * the 10^10-design-point replacement for a driver-merged monolith.
  *
  * Why: one merged bloom sized for 10^10 keys is ~12 GB built and
  * OR-merged ON THE DRIVER and re-broadcast every superstep. Sharding
  * by the SAME murmur3(keys) % buckets routing as the bucketed state
  * mirrors removes the driver from the path entirely:
  *   - build is distributed — `refresh` repartitions the key projection
  *     by bucket and each task writes its own shard file (atomic move),
  *     so no shard ever transits or merges on the driver;
  *   - probe is lazy per executor — tasks load only the shards their
  *     rows hash to (a JVM-wide cache, one read per shard per
  *     generation). Because the enqueue probe sits under an exchange
  *     hashed on the same keys, an executor's resident set is
  *     buckets/partitions shards, not all of them;
  *   - resume is a file load, not a table scan — the GENERATION pointer
  *     records which IceLite version the shards equal, so a restarted
  *     crawl reloads shards and rebuilds only the post-generation
  *     delta (the file diff), instead of rescanning the full seen set.
  *
  * Correctness contract (same as any seen-bloom): each shard is a
  * SUPERSET filter — "might contain" routes rows into the exact
  * anti-join; "definitely not" skips it. A false positive costs a join
  * row; a lost shard would cost correctness, so `shardFor` fails fast
  * on a missing file rather than defaulting to empty.
  *
  * The shard layout mirrors BucketedMirror: `dir/gen-v<v>/shard-<b>
  * .bloom` + an atomically-swapped GENERATION pointer; superseded
  * generations are pruned at refresh. On a real cluster the same files
  * live on the shared object store and each executor streams its
  * shards once per generation.
  */
final class BloomShardStore(
    dir: String,
    buckets: Int,
    keys: Seq[String],
    kind: String = "bloom" // "bloom" | "cuckoo" — the north rule's two URL-seen filters
) extends Serializable {

  require(kind == "bloom" || kind == "cuckoo", s"unknown filter kind: $kind")
  private val ext = if (kind == "cuckoo") "cuckoo" else "bloom"

  @transient private lazy val root: Path = {
    val p = Paths.get(dir)
    Files.createDirectories(p)
    p
  }
  private def genPointer: Path = root.resolve("GENERATION")

  /** IceLite version the current shard generation equals, 0 if never
    * refreshed. */
  def generation: Int =
    if (Files.exists(genPointer)) Files.readString(genPointer).trim.toInt else 0

  private def genDir(v: Int): Path = root.resolve(s"gen-v$v")

  /** Bucket count generation `g` was sharded with. Each refresh may
    * re-bucket (the caller passes `bucketsForGen` sized to the corpus —
    * the LSM analogue of growing the level fan-out as the store grows),
    * so the routing modulus is a per-generation fact recorded in the
    * generation dir; absent (pre-re-bucketing layouts) it equals the
    * constructor's fixed `buckets`. */
  def bucketsAt(g: Int): Int = {
    val f = genDir(g).resolve("BUCKETS")
    if (Files.exists(f)) Files.readString(f).trim.toInt else buckets
  }

  /** Distributed shard build from `df` (the key projection of an
    * IceLite table at version `v`). Each of the `buckets` tasks builds
    * one BloomFilter over its bucket's keys and writes it straight to
    * `dir/gen-v<v>/shard-<bucket>.bloom` — the driver only commits the
    * GENERATION pointer. Rows route by pmod(murmur3(keys), buckets),
    * identical to `repartition(buckets, keys)` and to Spark's
    * bucketBy, so shard residency co-locates with the bucketed mirror.
    * Returns the number of keys indexed. */
  def refresh(df: DataFrame, v: Int, expectedItemsPerShard: Long,
      fpp: Double = 0.01, bucketsForGen: Int = buckets): Long = {
    val out = genDir(v)
    Files.createDirectories(out)
    Files.writeString(out.resolve("BUCKETS"), bucketsForGen.toString)
    val (dirStr, exp, f, knd, ex) =
      (out.toString, math.max(1024L, expectedItemsPerShard), fpp, kind, ext)
    val keyed = df
      .repartition(bucketsForGen, keys.map(col): _*)
      .select(concat_ws(BloomShardStore.KeySep, keys.map(col): _*).as("k"))
    val counts = keyed.queryExecution.toRdd.mapPartitions { it =>
      val bf = BloomShardStore.newFilter(knd, exp, f)
      var n = 0L
      it.foreach { row => bf.put(row.getString(0)); n += 1 }
      val pid = TaskContext.getPartitionId()
      BloomShardStore.writeShard(dirStr, pid, bf, ex)
      Iterator.single(n)
    }.collect().sum
    val tmp = root.resolve(".GENERATION.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, genPointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    prune(v)
    BloomShardStore.evictPrefix(root.toString)
    counts
  }

  /** Shard build from a bucketed mirror's data files — the zero-shuffle
    * path. The mirror's writer already routed every row to its bucket
    * file with the same pmod(murmur3(keys), buckets) this store probes
    * by, so each shard can be built by reading ONE file: one tiny
    * single-task Spark job per bucket, submitted from a bounded pool.
    * At the 10^10 design point this halves the compaction cycle's I/O —
    * the repartition-based [[refresh]] would re-shuffle the full key
    * projection that the mirror refresh just shuffled. Buckets with no
    * file (empty after repartition) get an empty shard so the probe
    * contract (no missing files) holds. */
  def refreshFromBucketedFiles(spark: org.apache.spark.sql.SparkSession,
      files: Seq[String], v: Int, expectedItemsPerShard: Long,
      fpp: Double = 0.01): Long = {
    val out = genDir(v)
    Files.createDirectories(out)
    // routing here is fixed by the mirror files' own bucket ids
    Files.writeString(out.resolve("BUCKETS"), buckets.toString)
    val (dirStr, exp, f, knd, ex) =
      (out.toString, math.max(1024L, expectedItemsPerShard), fpp, kind, ext)
    val byBucket: Map[Int, Seq[String]] = files.groupBy(BloomShardStore.bucketIdOf)
    require(!byBucket.contains(-1),
      s"refreshFromBucketedFiles: non-bucketed file name among ${files.take(3)}")
    val keyCols = keys
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, byBucket.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val futures = byBucket.toSeq.map { case (b, fs) =>
      scala.concurrent.Future {
        val keyed = spark.read.parquet(fs: _*)
          .select(concat_ws(BloomShardStore.KeySep, keyCols.map(col): _*).as("k"))
          .coalesce(1)
        keyed.queryExecution.toRdd.mapPartitions { it =>
          val bf = BloomShardStore.newFilter(knd, exp, f)
          var n = 0L
          it.foreach { row => bf.put(row.getString(0)); n += 1 }
          BloomShardStore.writeShard(dirStr, b, bf, ex)
          Iterator.single(n)
        }.collect().sum
      }
    }
    val total = futures.map(fu =>
      scala.concurrent.Await.result(fu, scala.concurrent.duration.Duration.Inf)).sum
    pool.shutdown()
    // empty buckets: write empty shards driver-side (tiny)
    (0 until buckets).filterNot(byBucket.contains).foreach { b =>
      BloomShardStore.writeShard(dirStr, b, BloomShardStore.newFilter(knd, exp, f), ex)
    }
    val tmp = root.resolve(".GENERATION.tmp")
    Files.writeString(tmp, v.toString)
    Files.move(tmp, genPointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    prune(v)
    BloomShardStore.evictPrefix(root.toString)
    total
  }

  /** Probe column: true iff this row's shard MIGHT contain its key.
    * The shard id is computed with Catalyst's own murmur3 `hash`, so it
    * agrees with the refresh-side repartition by construction; the
    * shard itself loads lazily on the executor the row lands on. */
  def probeCol(keyCols: Seq[Column]): Column = {
    val g = generation
    require(g > 0, s"bloom shards at $dir never refreshed")
    val genDirStr = genDir(g).toString
    val ex = ext
    val probe = udf((b: Int, k: String) =>
      BloomShardStore.shardFor(genDirStr, b, ex).mightContain(k))
    probe(pmod(hash(keyCols: _*), lit(bucketsAt(g))),
      concat_ws(BloomShardStore.KeySep, keyCols: _*))
  }

  /** Delete superseded generations (current probe plans hold loaded
    * shards in the JVM cache; files of the current generation stay). */
  private def prune(current: Int): Unit = {
    val keep = genDir(current).getFileName.toString
    val old = scala.util.Using.resource(Files.list(root)) { s =>
      val b = Seq.newBuilder[Path]
      s.forEach(p =>
        if (Files.isDirectory(p) && p.getFileName.toString.startsWith("gen-v")
          && p.getFileName.toString != keep) { b += p; () })
      b.result()
    }
    old.foreach { p =>
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    }
  }
}

object BloomShardStore {
  /** Key separator for multi-column keys — matches the engine's
    * recent-delta bloom keying (concat_ws of the same columns). */
  val KeySep = ""

  private val BucketFileRe = "_(\\d{5})\\.".r

  /** Bucket id from a Spark bucketed-table file name
    * (part-00000-<uuid>_00003.c000.snappy.parquet → 3), −1 if absent. */
  def bucketIdOf(path: String): Int = {
    val name = path.substring(path.lastIndexOf('/') + 1)
    BucketFileRe.findFirstMatchIn(name).map(_.group(1).toInt).getOrElse(-1)
  }

  /** The filter behind a shard file: Bloom (Spark sketch) or Cuckoo
    * ([[graft.sketch.CuckooFilter]] — deletable, ~0.01% FPP at ~half
    * the bits of an equal-FPP bloom). Both honor the same superset
    * contract, so the probe/anti-join structure is kind-agnostic. */
  private[tables] sealed trait ShardFilter {
    def put(k: String): Unit
    def mightContain(k: String): Boolean
    def writeTo(os: java.io.OutputStream): Unit
  }
  private final class BloomShard(bf: BloomFilter) extends ShardFilter {
    def put(k: String): Unit = { bf.putString(k); () }
    def mightContain(k: String): Boolean = bf.mightContain(k)
    def writeTo(os: java.io.OutputStream): Unit = bf.writeTo(os)
  }
  private final class CuckooShard(cf: graft.sketch.CuckooFilter) extends ShardFilter {
    def put(k: String): Unit = cf.put(k)
    def mightContain(k: String): Boolean = cf.mightContain(k)
    def writeTo(os: java.io.OutputStream): Unit = cf.writeTo(os)
  }

  /** `fpp` applies to the bloom kind only — a cuckoo filter's FPP is
    * fixed by its 16-bit fingerprints (~0.012%), always at or below
    * any fpp this store is asked for. */
  private[tables] def newFilter(kind: String, expectedItems: Long, fpp: Double): ShardFilter =
    kind match {
      case "cuckoo" => new CuckooShard(new graft.sketch.CuckooFilter(expectedItems))
      case _        => new BloomShard(BloomFilter.create(expectedItems, fpp))
    }

  /** Atomic shard write (tmp + move). */
  private[tables] def writeShard(
      genDir: String, bucket: Int, bf: ShardFilter, ext: String = "bloom"): Unit = {
    val tmp = Paths.get(genDir, s".shard-$bucket-${java.util.UUID.randomUUID}.tmp")
    val os = Files.newOutputStream(tmp)
    try bf.writeTo(os) finally os.close()
    Files.move(tmp, Paths.get(genDir, s"shard-$bucket.$ext"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** JVM-wide shard cache: one disk read per (generation dir, bucket)
    * per executor JVM. Bounded by the shards an executor actually
    * probes; stale generations are evicted on refresh. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, ShardFilter]()

  private[tables] def shardFor(
      genDir: String, bucket: Int, ext: String = "bloom"): ShardFilter =
    cache.computeIfAbsent(s"$genDir/shard-$bucket.$ext", p => {
      val path = Paths.get(p)
      require(Files.exists(path),
        s"seen-filter shard missing: $p — refusing to treat as empty (would break the superset contract)")
      val is = Files.newInputStream(path)
      try {
        if (p.endsWith(".cuckoo")) new CuckooShard(graft.sketch.CuckooFilter.readFrom(is))
        else new BloomShard(BloomFilter.readFrom(is))
      } finally is.close()
    })

  private[tables] def evictPrefix(prefix: String): Unit = {
    cache.keySet.removeIf(_.startsWith(prefix))
    ()
  }

  /** Test/diagnostic hook: number of shards currently resident. */
  def residentShards(prefix: String): Int = {
    var n = 0
    cache.keySet.forEach(k => if (k.startsWith(prefix)) n += 1)
    n
  }
}
