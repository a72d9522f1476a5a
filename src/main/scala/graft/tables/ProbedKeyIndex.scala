package graft.tables

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, hash, lit, pmod}

/** A persistent, probe-optimized KEY INDEX — the streaming-curation
  * twin of the frontier's seen-set machinery (sharded blooms +
  * bucketed mirror), packaged so any continuously-growing dedup index
  * (exact text hashes, MinHash band rows) pays O(batch) corpus-side
  * work per probe instead of an O(corpus) rescan.
  *
  * Three coupled pieces under one directory:
  *  - `table`: an append-only IceLite of key rows — the source of
  *    truth, one tiny delta file per appended batch;
  *  - a MIRROR: the key projection at some version g, rewritten as
  *    parquet PARTITIONED BY bucket = pmod(murmur3(keys), buckets) —
  *    so an exact-membership check against it is a PARTITION-PRUNED
  *    scan of only the buckets that hold candidate keys;
  *  - bloom SHARDS over the same version g and the same bucket routing
  *    ([[BloomShardStore]]): the scan-side prefilter that decides
  *    which rows need the exact check at all. The store's GENERATION
  *    pointer records g; rows appended after g are the DELTA — a
  *    handful of small files read in full on every probe, bounded by
  *    the refresh policy.
  *
  * Probe cost per batch, by construction: O(batch) bloom probes
  * (shards load once per generation per executor, not per batch) +
  * the candidate buckets' mirror partitions (≈ 0 files when the batch
  * has no duplicates and no bloom false positives) + the delta files
  * (≤ `refreshDeltaBytes`). Nothing scans the corpus-sized index —
  * the spec pins scanned files/bytes on the executed plans.
  *
  * At 10^10-key scale this is exactly the frontier layout: mirror
  * partitions and shard files live on the shared store; `refresh` is
  * the amortized compaction step (one full rewrite per
  * `refreshDeltaBytes` of growth, the same O(1)-per-row amortization
  * as LSM compaction).
  */
final class ProbedKeyIndex(
    spark: SparkSession,
    dir: String,
    keys: Seq[String],
    buckets: Int = 32,
    targetPartitionBytes: Long = 0,
    fpp: Double = 0.001
) {

  val table = new IceLite(spark, s"$dir/idx")
  private val shards = new BloomShardStore(s"$dir/shards", buckets, keys)
  private val mirrorRoot: Path = Paths.get(s"$dir/mirror")
  Files.createDirectories(mirrorRoot)

  private def keyCols: Seq[Column] = keys.map(col)
  private def bucketColFor(nBuckets: Int): Column =
    pmod(hash(keyCols: _*), lit(nBuckets))

  /** IceLite version the mirror+shards cover (0 = never refreshed:
    * everything is delta). */
  def generation: Int = shards.generation

  /** Bucket count generation `g` routes by — grows across refreshes
    * when `targetPartitionBytes` > 0 (see [[refresh]]). */
  def bucketsAt(g: Int): Int = if (g > 0) shards.bucketsAt(g) else buckets

  private def mirrorDir(g: Int): String = s"$mirrorRoot/gen-v$g"

  /** Append key rows (idempotence is the caller's job — pass batch
    * props through). Returns the new version. */
  def append(rows: DataFrame, lineage: String,
      props: Map[String, String] = Map.empty): Int =
    table.append(rows.select(keyCols: _*), lineage, coalesceTo = 1, props = props)

  def currentProps: Map[String, String] = table.currentProps

  /** Files appended after the covered generation — the probe's
    * read-in-full side. */
  def deltaFiles: Seq[String] = {
    val g = generation
    val covered = if (g == 0) Set.empty[String] else table.filesAt(g).toSet
    table.filesAt(table.currentVersion).filterNot(covered)
  }

  def deltaBytes: Long = deltaFiles.map(f => Files.size(Paths.get(f))).sum

  /** Rewrite mirror + shards to cover the CURRENT version — the
    * amortized compaction step. One file per occupied bucket partition
    * (`repartition(bucket)` before `partitionBy`), then the shard
    * build commits the generation pointer last, so a crash mid-refresh
    * leaves the previous generation fully consistent.
    *
    * When `targetPartitionBytes` > 0 each refresh RE-BUCKETS: the new
    * generation's bucket count is sized so a mirror partition stays ≈
    * `targetPartitionBytes` no matter how large the index has grown —
    * the LSM analogue of growing fan-out with the store. That is what
    * makes the probe's partition-pruned scan O(batch) rather than
    * O(corpus/constant): a probe reads ≤ candidateKeys partitions of
    * ~fixed bytes each (+ the bounded delta), a ceiling independent of
    * corpus size. Routing is per-generation (recorded next to the
    * shards), so probes against an old generation and the re-bucketed
    * one never mix moduli. */
  def refresh(fpp: Double = this.fpp): Int = {
    val v = table.currentVersion
    if (v == 0 || v == generation) return generation
    val keyBytes = table.filesAt(v).map(f => Files.size(Paths.get(f))).sum
    val nb =
      if (targetPartitionBytes > 0)
        math.min(1 << 18,
          math.max(buckets, (keyBytes / targetPartitionBytes).toInt)).toInt
      else buckets
    val snap = table.readAt(v).select(keyCols: _*)
    val out = mirrorDir(v)
    snap.withColumn("bucket", bucketColFor(nb))
      .repartition(col("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(out)
    // footer-metadata count (Parquet count() never reads data pages) —
    // sizes the bloom shards without a second full pass over the keys
    val rows = spark.read.parquet(out).count()
    shards.refresh(snap, v, expectedItemsPerShard = math.max(1024L, rows / nb),
      fpp = fpp, bucketsForGen = nb)
    // superseded mirror generations are dead once the pointer moved
    scala.util.Using.resource(Files.list(mirrorRoot)) { s =>
      val b = Seq.newBuilder[Path]
      s.forEach(p => if (p.getFileName.toString != s"gen-v$v") { b += p; () })
      b.result()
    }.foreach { p =>
      scala.util.Using.resource(Files.walk(p)) { w =>
        w.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => { Files.deleteIfExists(f); () })
      }
    }
    v
  }

  /** Refresh when the un-mirrored delta outgrew `maxDeltaBytes`. */
  def maybeRefresh(maxDeltaBytes: Long): Boolean =
    if (deltaBytes > maxDeltaBytes) { refresh(); true } else false

  import ProbedKeyIndex.LookupStats

  /** Whole-mirror (file count, byte total) for generation `g`, cached —
    * the totals only change at refresh, so per-probe driver work stays
    * O(candidate buckets), never O(mirror files): at the 2^18-bucket
    * design point an uncached walk would stat ~10^5 dirs per probe. */
  @volatile private var genTotalsCache: Option[(Int, Int, Long)] = None
  private def mirrorTotals(g: Int): (Int, Long) =
    genTotalsCache match {
      case Some((cg, f, b)) if cg == g => (f, b)
      case _ =>
        val fb =
          if (g > 0)
            scala.util.Using.resource(Files.walk(Paths.get(mirrorDir(g)))) { w =>
              var n = 0; var bytes = 0L
              w.forEach { p =>
                if (p.toString.endsWith(".parquet")) { n += 1; bytes += Files.size(p) }
              }
              (n, bytes)
            }
          else (0, 0L)
        genTotalsCache = Some((g, fb._1, fb._2))
        fb
    }

  /** Rows of `rows` whose key EXISTS in the index (distinct key match;
    * extra columns of `rows` ride through the semi-join). Corpus-side
    * work: bloom-candidate buckets' mirror partitions (partition-pruned
    * scan) + the delta files. Returns the executed stats alongside.
    *
    * The pruned mirror scan is pinned from the EXECUTED plan
    * (FileSourceScan numFiles/filesSize metrics), not from intent. */
  def hits(rows: DataFrame): (DataFrame, LookupStats) = {
    val g = generation
    val genBuckets = bucketsAt(g)
    // one job yields both the candidate buckets AND the candidate count
    // (per-bucket counts of the bloom-filtered batch)
    val (candBuckets, nCand): (Seq[Int], Long) =
      if (g > 0) {
        val perBucket = rows.select(keyCols: _*).filter(shards.probeCol(keyCols))
          .groupBy(bucketColFor(genBuckets).as("b")).count()
          .collect()
        (perBucket.map(_.getInt(0)).toSeq, perBucket.map(_.getLong(1)).sum)
      } else (Seq.empty, 0L)
    val (mirrorTotal, mirrorBytesTotal) = mirrorTotals(g)
    val (mirrorSide, mirrorScanned, mirrorBytes) =
      if (g > 0 && candBuckets.nonEmpty) {
        val m = spark.read.parquet(mirrorDir(g))
          .filter(col("bucket").isin(candBuckets: _*))
          .select(keyCols: _*)
        // execute a semi-join-shaped count to materialize scan metrics?
        // no — the caller's plan executes it; stats read the file system
        // for the PRUNED partition dirs (1:1 with the executed scan,
        // partition pruning is by directory)
        val scannedDirs = candBuckets.map(b => Paths.get(mirrorDir(g), s"bucket=$b"))
          .filter(Files.isDirectory(_))
        val files = scannedDirs.flatMap(d =>
          scala.util.Using.resource(Files.list(d))(s => {
            val bb = Seq.newBuilder[Path]
            s.forEach(p => if (p.toString.endsWith(".parquet")) { bb += p; () })
            bb.result()
          }))
        (m, files.size.toLong, files.map(Files.size(_)).sum)
      } else {
        (rows.select(keyCols: _*).limit(0), 0L, 0L)
      }
    val dFiles = deltaFiles
    val deltaSide =
      if (dFiles.nonEmpty) spark.read.parquet(dFiles: _*).select(keyCols: _*)
      else rows.select(keyCols: _*).limit(0)
    val corpusSide = mirrorSide.unionAll(deltaSide)
    val out = rows.join(corpusSide, keys, "left_semi")
    (out, LookupStats(nCand, candBuckets.size, mirrorTotal, mirrorScanned,
      mirrorBytes, dFiles.size, dFiles.map(f => Files.size(Paths.get(f))).sum,
      mirrorBytesTotal, genBuckets))
  }
}

object ProbedKeyIndex {
  /** Probe stats — the O(batch) evidence, recorded per lookup.
    * `mirrorBytesTotal`/`generationBuckets` give the denominator: the
    * scanned fraction falls as re-bucketing spreads a growing mirror
    * over more partitions while the probe still reads only candidate
    * buckets. */
  final case class LookupStats(
      candidateRows: Long, candidateBuckets: Int,
      mirrorFilesTotal: Int, mirrorFilesScanned: Long, mirrorBytesScanned: Long,
      deltaFilesScanned: Int, deltaBytesScanned: Long,
      mirrorBytesTotal: Long = 0L, generationBuckets: Int = 0)
}
