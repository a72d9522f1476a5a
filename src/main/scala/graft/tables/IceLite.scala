package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
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
  *   dir/snapshots/v<n>.json                    (file list + lineage)
  *   dir/LATEST                                 (current version number)
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

  /** Data files of snapshot v (empty for v=0). */
  def filesAt(v: Int): Seq[String] =
    if (v == 0) Seq.empty
    else {
      val txt = Files.readString(manifest(v))
      // manifest format: one file path per line after the header line
      txt.linesIterator.drop(1).filter(_.nonEmpty).toSeq
    }

  /** Atomic append: new snapshot = previous files + df's files.
    * `coalesceTo` > 0 compacts small deltas (avoids tiny-file explosion
    * for per-superstep metadata writes). Returns the new version. */
  def append(df: DataFrame, lineage: String, coalesceTo: Int = 0): Int = {
    val v = currentVersion
    val deltaDir = dataDir.resolve(s"delta-${v + 1}-${java.util.UUID.randomUUID}")
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.parquet(deltaDir.toString)
    val newFiles = Files.list(deltaDir).iterator.asScala
      .map(_.toString)
      .filter(f => f.endsWith(".parquet"))
      .toSeq
      .sorted
    commit(v, filesAt(v) ++ newFiles, lineage)
  }

  /** Replace the table content (used for per-superstep queue tables).
    * Prior versions' files stay on disk — versioned reads remain valid. */
  def overwrite(df: DataFrame, lineage: String, coalesceTo: Int = 0): Int = {
    val v = currentVersion
    val deltaDir = dataDir.resolve(s"delta-${v + 1}-${java.util.UUID.randomUUID}")
    val out = if (coalesceTo > 0) df.coalesce(coalesceTo) else df
    out.write.parquet(deltaDir.toString)
    val newFiles = Files.list(deltaDir).iterator.asScala
      .map(_.toString)
      .filter(_.endsWith(".parquet"))
      .toSeq
      .sorted
    commit(v, newFiles, lineage)
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
    val newFiles = Files.list(deltaDir).iterator.asScala
      .map(_.toString)
      .filter(_.endsWith(".parquet"))
      .toSeq
      .sorted
    commit(v, newFiles, lineage)
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
    * Files OUTSIDE this table's data dir (adopted bucketed-mirror
    * files) are never deleted here — the mirror owns their lifecycle.
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
    Files.list(dataDir).iterator.asScala.foreach { d =>
      if (Files.isDirectory(d) && !Files.list(d).iterator.hasNext)
        Files.deleteIfExists(d)
      ()
    }
    deleted
  }

  private def commit(prevV: Int, files: Seq[String], lineage: String): Int = {
    val v = prevV + 1
    val body = (lineage +: files).mkString("\n")
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

  /** Snapshot read of the current version. */
  def read(): DataFrame = readAt(currentVersion)

  def readAt(v: Int): DataFrame = {
    val fs = filesAt(v)
    require(fs.nonEmpty, s"IceLite table $dir has no data at v$v")
    spark.read.parquet(fs: _*)
  }

  def lineageAt(v: Int): String =
    if (v == 0) "" else Files.readString(manifest(v)).linesIterator.next()
}
