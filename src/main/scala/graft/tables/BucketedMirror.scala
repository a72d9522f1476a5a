package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hash-bucketed mirror of an IceLite table's join-key projection — the
  * storage-partitioned-join optimization for the per-superstep exact
  * anti-joins.
  *
  * Why: an anti-join's right side (the committed seen/frontier state,
  * hundreds of GB at the 10^10 design point) is re-SHUFFLED and
  * re-SORTED by every superstep's sort-merge join. A Spark bucketed
  * table (`bucketBy(B, keys).sortBy(keys)`) declares its storage
  * partitioning to Catalyst, so a join on exactly those keys reads it
  * with NO Exchange and NO Sort — measured 2.8-4.2× on the 10M×10M
  * anti-join (graft.BucketProbe; the production-Iceberg equivalent is
  * a bucket-transform partition spec).
  *
  * Mechanics:
  *  - `refresh(df, v)` writes `df` (the key projection of the IceLite
  *    table at version v) as a bucketed EXTERNAL table under
  *    `dir/v<v>`, pre-repartitioned on the same murmur3(keys) the
  *    bucketer uses so each bucket is ONE file (T writer tasks × B
  *    buckets = T·B tiny files otherwise — measured 6× SLOWER than no
  *    bucketing, because a bucketed scan cannot split files);
  *  - a VERSION pointer (`<v>\t<path>`, atomic move) records which
  *    IceLite version the mirror equals; rows appended after v are the
  *    DELTA the caller still anti-joins (small, broadcast-able);
  *  - the catalog entry does not survive a JVM restart (no metastore in
  *    local mode) — `table()` re-registers it over the existing files
  *    with `CREATE TABLE ... CLUSTERED BY ... LOCATION`, metadata-only,
  *    so crash-resume never rewrites data. `schemaDdl` supplies the
  *    column list for that DDL.
  *
  * Requires `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`
  * (set in Sessions.local): with it on, Spark may silently fall back to
  * a plain scan and the join re-gains both exchanges. Note Spark only
  * uses the bucketing when the join clusters on ALL bucket keys
  * (`requireAllClusterKeysForCoPartition`), so `keys` must equal the
  * anti-join's key list exactly.
  */
final class BucketedMirror(
    spark: SparkSession,
    dir: String,
    tableName: String,
    buckets: Int,
    keys: Seq[String],
    schemaDdl: String
) {
  private val root: Path = Paths.get(dir)
  Files.createDirectories(root)
  private val versionFile = root.resolve("VERSION")

  /** IceLite version this mirror equals, 0 if never refreshed. */
  def version: Int =
    if (Files.exists(versionFile)) Files.readString(versionFile).trim.split("\t")(0).toInt
    else 0

  private def dataPath: String =
    Files.readString(versionFile).trim.split("\t")(1)

  /** Rewrite the mirror from `df` (key projection of IceLite version
    * `v`). Returns the bucketed data files (for a caller whose table
    * content IS the projection — e.g. the seen set — to adopt as the
    * compacted IceLite snapshot, one rewrite serving both). */
  def refresh(df: DataFrame, v: Int): Seq[String] = {
    val path = root.resolve(s"v$v").toString
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.repartition(buckets, keys.map(col): _*)
      .write
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)
    val tmp = root.resolve(".VERSION.tmp")
    Files.writeString(tmp, s"$v\t$path")
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    listFiles(path)
  }

  /** Delete superseded mirror generations whose files appear in
    * NEITHER `referencedFiles` (the union of the owning IceLite
    * table's retained manifests, post-vacuum) nor the current
    * generation — a prior generation stays on disk as long as any
    * retained snapshot still lists its files (the table adopts mirror
    * files as snapshots, so dropping them early would corrupt reads
    * at current−1). Returns dirs removed. */
  def prune(referencedFiles: Set[String]): Int = {
    val current = if (version > 0) dataPath else ""
    var removed = 0
    scala.util.Using.resource(Files.list(root))(_.iterator.asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("v")
        && p.toString != current)
      .toSeq)
      .foreach { old =>
        val stillLive = listFiles(old.toString).exists(referencedFiles.contains)
        if (!stillLive) {
          scala.util.Using.resource(Files.walk(old))(
            _.sorted(java.util.Comparator.reverseOrder[Path]())
              .iterator.asScala.toSeq)
            .foreach(f => { Files.deleteIfExists(f); () })
          removed += 1
        }
      }
    removed
  }

  /** The mirror as a catalog DataFrame, re-registering the external
    * table if this JVM's catalog has never seen it (resume path). */
  def table(): DataFrame = {
    require(version > 0, s"bucketed mirror $tableName never refreshed")
    if (!spark.catalog.tableExists(tableName)) {
      val cluster = keys.mkString(", ")
      spark.sql(
        s"""CREATE TABLE $tableName ($schemaDdl) USING parquet
            CLUSTERED BY ($cluster) SORTED BY ($cluster) INTO $buckets BUCKETS
            LOCATION '$dataPath'""")
    }
    spark.table(tableName)
  }

  private def listFiles(path: String): Seq[String] =
    scala.util.Using.resource(Files.list(Paths.get(path)))(_.iterator.asScala
      .map(_.toString)
      .filter(_.endsWith(".parquet"))
      .toSeq)
      .sorted
}
