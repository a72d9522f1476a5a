package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Using
import org.apache.spark.sql.{DataFrame, SparkSession}

/** IceLite: a minimal snapshot-versioned Parquet table (SURVEY.md §7.1).
  *
  * No Iceberg jar ships in this sandbox, so this layer supplies the
  * four Iceberg properties the crawl actually needs:
  *   - atomic append (write files → write manifest → atomic pointer swap),
  *   - snapshot-isolated reads (a reader sees one manifest's file list),
  *   - resume-from-snapshot (the LATEST pointer survives crashes: the
  *     pointer is renamed into place, never partially written),
  *   - lineage metadata per snapshot (superstep id + row counts).
  *
  * Layout:
  *   dir/data/delta-<n>-<uuid>/part-*.parquet   (immutable data files)
  *   dir/snapshots/v<n>.json                    (lineage + props + files)
  *   dir/LATEST                                 (current version number)
  *
  * Manifest format: line 1 is the lineage string; `#key=value` lines are
  * snapshot PROPERTIES (the Iceberg snapshot-summary / Delta
  * SetTransaction analog) — carried forward by every commit, so the
  * CURRENT manifest always holds the latest value of every key even
  * after compaction rewrites and vacuum expires the commit that set it;
  * remaining lines are data file paths.
  *
  * On a real cluster the same commit protocol runs against an object
  * store (rename→copy+swap via a metastore CAS); the interface is
  * unchanged.
  */
final class IceLite(spark: SparkSession, dir: String) {

  private val root: Path = Paths.get(dir)
  private val dataDir = root.resolve("data")
  private val snapDir = root.resolve("snapshots")
  private val latest = root.resolve("LATEST")
  Files.createDirectories(dataDir)
  Files.createDirectories(snapDir)

  def currentVersion: Int =
    if (Files.exists(latest)) Files.readString(latest).trim.toInt else 0

  private def manifest(v: Int): Path = snapDir.resolve(f"v$v%05d.json")

  /** Directory children as strings (closing the handle — Files.list
    * leaks a descriptor per call otherwise, and compaction/vacuum call
    * this every cycle of a long crawl). */
  private def listDir(d: Path): Seq[Path] =
    Using.resource(Files.list(d))(_.iterator.asScala.toSeq)

  private def parquetFilesIn(d: Path): Seq[String] =
    listDir(d).map(_.toString).filter(_.endsWith(".parquet")).sorted

  /** Data files of snapshot v (empty for v=0). */
  def filesAt(v: Int): Seq[String] =
    if (v == 0) Seq.empty
    else {
      val txt = Files.readString(manifest(v))
      // manifest format: lineage, then #props, then one file per line
      txt.linesIterator.drop(1)
        .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    }

  /** Snapshot properties at version v. Commits carry all previous props
    * forward (latest writer of a key wins), so `propsAt(currentVersion)`
    * is a durable key-value store that survives compaction AND vacuum —
    * the lookup never walks history. */
  def propsAt(v: Int): Map[String, String] =
    if (v == 0) Map.empty
    else Files.readString(manifest(v)).linesIterator.drop(1)
      .filter(_.startsWith("#"))
      .map { l =>
        val kv = l.drop(1).split("=", 2)
        kv(0) -> (if (kv.length > 1) kv(1) else "")
      }
      .toMap

  def currentProps: Map[String, String] = propsAt(currentVersion)

  /** Atomic append: new snapshot = previous files + df's files.
    * `coalesceTo` > 0 compacts small deltas (avoids tiny-file explosion
    * for per-superstep metadata writes). `props` commit atomically with
    * the data (same manifest) and persist across later commits.
    * Returns the new version. */
  def append(df: DataFrame, lineage: String, coalesceTo: Int = 0,
      props: Map[String, String] = Map.empty): Int = {
    val v = currentVersion
    val deltaDir = dataDir.resolve(s"delta-${v + 1}-${java.util.UUID.randomUUID}")
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.parquet(deltaDir.toString)
    commit(v, filesAt(v) ++ parquetFilesIn(deltaDir), lineage, props)
  }

  /** Replace the table content (used for per-superstep queue tables).
    * Prior versions' files stay on disk — versioned reads remain valid. */
  def overwrite(df: DataFrame, lineage: String, coalesceTo: Int = 0): Int = {
    val v = currentVersion
    val deltaDir = dataDir.resolve(s"delta-${v + 1}-${java.util.UUID.randomUUID}")
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.parquet(deltaDir.toString)
    commit(v, parquetFilesIn(deltaDir), lineage)
  }

  /** Compaction: rewrite the CURRENT snapshot into files of
    * ~`targetFileBytes` and commit the rewritten list as a new version.
    * Content is unchanged — only the physical file list — so readers of
    * any version and crash-resume semantics are unaffected (prior
    * versions' files stay on disk; a crash mid-compaction leaves only
    * orphan data files, never a broken manifest). Bounds the
    * supersteps × appendFiles file growth of long crawls: without it a
    * 10^5-superstep run accumulates ~4×10^5 manifest entries and state
    * re-reads go metadata-bound. No-ops (returns the current version)
    * when the table is already within 2× of the target file count.
    *
    * Uses repartition, not coalesce: the rewrite reads with full
    * parallelism and shuffles down, instead of serializing the read
    * onto `nOut` tasks — at 10^10-row state-table scale the read is
    * the cost. */
  def compact(targetFileBytes: Long, lineage: String = "compact"): Int = {
    val v = currentVersion
    val fs = filesAt(v)
    if (fs.isEmpty) return v
    val totalBytes = fs.map(f => Files.size(Paths.get(f))).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    if (fs.length <= 2 * nOut) return v
    val deltaDir = dataDir.resolve(s"delta-${v + 1}-${java.util.UUID.randomUUID}")
    spark.read.parquet(fs: _*).repartition(nOut).write.parquet(deltaDir.toString)
    commit(v, parquetFilesIn(deltaDir), lineage)
  }

  /** Commit an externally-written file list as the table's new FULL
    * content (no data write here — the caller already wrote the files,
    * e.g. a bucketed-mirror rewrite that doubles as compaction). Same
    * snapshot semantics as overwrite: prior versions stay readable. */
  def adoptFiles(files: Seq[String], lineage: String): Int = {
    require(files.nonEmpty, "adoptFiles needs at least one file")
    commit(currentVersion, files.sorted, lineage)
  }

  /** Expire old snapshots (the Iceberg `expire_snapshots` analog):
    * delete data files referenced ONLY by versions older than the last
    * `keepVersions`, and their manifests. Readers of retained versions
    * are unaffected; compaction makes this matter — every compact
    * leaves the full pre-compaction file set on disk until vacuumed.
    * Snapshot PROPS survive vacuum by construction (every commit
    * carries them forward into the retained manifests). Files OUTSIDE
    * this table's data dir (adopted bucketed-mirror files) are never
    * deleted here — the mirror owns their lifecycle.
    * Returns the number of data files deleted. */
  def vacuum(keepVersions: Int = 2): Int = {
    val v = currentVersion
    val keepFrom = math.max(1, v - keepVersions + 1)
    if (keepFrom <= 1) return 0
    val live: Set[String] = (keepFrom to v).flatMap(filesAt).toSet
    var deleted = 0
    (1 until keepFrom).foreach { old =>
      if (Files.exists(manifest(old))) { // not expired by an earlier vacuum
        filesAt(old).foreach { f =>
          val p = Paths.get(f)
          if (!live.contains(f) && p.startsWith(dataDir) && Files.deleteIfExists(p))
            deleted += 1
        }
        Files.deleteIfExists(manifest(old))
        ()
      }
    }
    // sweep now-empty delta dirs
    listDir(dataDir).foreach { d =>
      if (Files.isDirectory(d) && listDir(d).isEmpty)
        Files.deleteIfExists(d)
      ()
    }
    deleted
  }

  private def commit(prevV: Int, files: Seq[String], lineage: String,
      props: Map[String, String] = Map.empty): Int = {
    val v = prevV + 1
    val mergedProps = propsAt(prevV) ++ props
    val propLines = mergedProps.toSeq.sorted.map { case (k, p) => s"#$k=$p" }
    val body = ((lineage +: propLines) ++ files).mkString("\n")
    val tmp = snapDir.resolve(s".v$v.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifest(v), StandardCopyOption.ATOMIC_MOVE)
    val ptrTmp = root.resolve(".LATEST.tmp")
    Files.writeString(ptrTmp, v.toString)
    Files.move(ptrTmp, latest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    v
  }

  def isEmpty: Boolean = filesAt(currentVersion).isEmpty

  /** Table schema, cached after the first successful read: a snapshot
    * table's schema never changes across versions, but a bare
    * `spark.read.parquet(files)` pays driver-side schema inference
    * (footer read + datasource resolution) on EVERY call — measured
    * ~0.3 s/superstep on the crawl's growing state tables, purely
    * driver-serial. The cache skips inference; file listing stays
    * per-version (correctness: the file LIST is the snapshot). */
  @volatile private var cachedSchema: Option[org.apache.spark.sql.types.StructType] = None

  /** Snapshot read of the current version. */
  def read(): DataFrame = readAt(currentVersion)

  def readAt(v: Int): DataFrame = {
    val fs = filesAt(v)
    require(fs.nonEmpty, s"IceLite table $dir has no data at v$v")
    readFiles(fs)
  }

  /** Read an explicit file subset of this table (delta reads) with the
    * cached schema — same inference-skip as [[readAt]]. */
  def readFiles(fs: Seq[String]): DataFrame = cachedSchema match {
    case Some(s) => spark.read.schema(s).parquet(fs: _*)
    case None =>
      val df = spark.read.parquet(fs: _*)
      cachedSchema = Some(df.schema)
      df
  }

  def lineageAt(v: Int): String =
    if (v == 0) "" else Files.readString(manifest(v)).linesIterator.next()
}
