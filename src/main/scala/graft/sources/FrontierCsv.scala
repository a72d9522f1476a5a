package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.UrlFunctions

/** Frontier CSV/TSV sources and sinks — byte-compatible with the
  * reference's files (header `url title pre_url isleaf`, `sep='\t'`,
  * `zhwiki_all.py:32,133`).
  */
object FrontierCsv {

  val schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("title", StringType),
    StructField("pre_url", StringType),
    StructField("isleaf", IntegerType)
  ))

  /** S2: read one frontier TSV (resume source, `zhwiki_all.py:102-108`). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "true")
      .schema(schema)
      .csv(path)

  /** S3: seed-directory source (`zhwiki_all.py:395-413`): read every
    * CSV under `dir` except `skipFiles`; returns the union. The queued
    * subset is `filter(isleaf === 0)`, the seen-set init is the full
    * url column — exactly the reference's split. */
  def readSeedDir(spark: SparkSession, dir: String, skipFiles: Set[String]): DataFrame = {
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".csv") && !skipFiles(f.getName))
      .map(_.getPath)
      .sorted
    files.map(read(spark, _)).reduce(_ unionByName _)
  }

  /** S7: TSV append sink (header once — Spark writes header per file;
    * single-dir parquet-era pipelines should prefer IceLite, this sink
    * exists for reference-format parity). */
  def write(df: DataFrame, path: String): Unit =
    df.select("url", "title", "pre_url", "isleaf")
      .write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** S5: title-file source (`zhwiki_leafs.py:1751-1759`): one title per
    * line → (url, title) via percent-encoding; note the reference keeps
    * the RAW line (with trailing newline semantics) as the title — we
    * keep the stripped title, which is what downstream uses. */
  def readTitles(spark: SparkSession, path: String, base: String): DataFrame = {
    spark.read.text(path)
      .select(trim(col("value")).as("title"))
      .filter(col("title") =!= "")
      .select(concat(lit(base + "/wiki/"), pythonQuote(col("title"))).as("url"),
        col("title"))
  }

  /** Column twin of `UrlFunctions.quote` (Python `quote(safe='/')`) built
    * on the codegen'd `url_encode` (x-www-form-urlencoded, i.e. Java
    * URLEncoder) plus the same four fix-ups the scalar applies: '+'
    * only ever encodes a space (a literal '+' became %2B first), '/'
    * and '~' are python-safe, '*' is python-UNsafe. No UDF — the whole
    * expression stays inside whole-stage codegen. */
  def pythonQuote(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    replace(
      replace(
        replace(
          replace(url_encode(c), lit("+"), lit("%20")),
          lit("%2F"), lit("/")),
        lit("%7E"), lit("~")),
      lit("*"), lit("%2A"))
}
