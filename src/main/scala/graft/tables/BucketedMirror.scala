package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Hash-bucketed mirror of a single-key IceLite table — the
  * storage-partitioned-join optimization for the per-superstep exact
  * anti-join.
  *
  * Why: the seen-set anti-join's right side (the committed seen table;
  * ~600 GB at the 10^10 design point) is re-SHUFFLED and re-SORTED by
  * every superstep's sort-merge join. A Spark bucketed table
  * (`bucketBy(B, key).sortBy(key)`) declares its storage partitioning
  * to Catalyst, so the join reads it with NO Exchange and NO Sort —
  * measured 2.8-4.2× on the 10M×10M anti-join (graft.BucketProbe; the
  * production-Iceberg equivalent is a bucket-transform partition spec).
  *
  * Mechanics:
  *  - `refresh(df, v)` writes `df` (the IceLite table's content at
  *    version v) as a bucketed EXTERNAL table under `dir/v<v>`,
  *    pre-repartitioned on the same murmur3(key) the bucketer uses so
  *    each bucket is ONE file (T writer tasks × B buckets = T·B tiny
  *    files otherwise — measured 6× SLOWER than no bucketing at all,
  *    because a bucketed scan cannot split files);
  *  - a VERSION pointer (`<v>\t<path>`, atomic move) records which
  *    IceLite version the mirror equals; rows appended to the IceLite
  *    table after v are the DELTA the caller must still anti-join
  *    (small, broadcast-able between refreshes);
  *  - the catalog entry does not survive a JVM restart (no metastore in
  *    local mode) — `table()` re-registers it over the existing files
  *    with `CREATE TABLE ... CLUSTERED BY ... LOCATION`, a
  *    metadata-only operation, so crash-resume never rewrites data.
  *
  * Requires `spark.sql.sources.bucketing.autoBucketedScan.enabled=false`
  * (set in Sessions.local): with it on, Spark may silently fall back to
  * a plain scan and the join re-gains both exchanges.
  */
final class BucketedMirror(
    spark: SparkSession,
    dir: String,
    tableName: String,
    buckets: Int,
    key: String = "url"
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

  /** Rewrite the mirror from `df` (content of IceLite version `v`).
    * Returns the bucketed data files (for the caller to adopt as the
    * IceLite table's compacted snapshot — one rewrite serves both). */
  def refresh(df: DataFrame, v: Int): Seq[String] = {
    val path = root.resolve(s"v$v").toString
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    df.repartition(buckets, col(key))
      .write
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(tableName)
    val tmp = root.resolve(".VERSION.tmp")
    Files.writeString(tmp, s"$v\t$path")
    Files.move(tmp, versionFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    listFiles(path)
  }

  /** The mirror as a catalog DataFrame, re-registering the external
    * table if this JVM's catalog has never seen it (resume path). */
  def table(): DataFrame = {
    require(version > 0, s"bucketed mirror $tableName never refreshed")
    if (!spark.catalog.tableExists(tableName)) {
      // metadata-only re-registration over the existing bucketed files;
      // schema is the single key column (the seen table's shape)
      spark.sql(
        s"""CREATE TABLE $tableName ($key STRING) USING parquet
            CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
            LOCATION '$dataPath'""")
    }
    spark.table(tableName)
  }

  private def listFiles(path: String): Seq[String] =
    Files.list(Paths.get(path)).iterator.asScala
      .map(_.toString)
      .filter(_.endsWith(".parquet"))
      .toSeq
      .sorted
}
