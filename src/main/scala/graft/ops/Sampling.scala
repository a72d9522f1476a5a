package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus splitting and sampling for training-data
  * pipelines. Everything keys on a hash of the stable doc_id — never
  * on `rand()` — so the split is (a) reproducible across runs, Spark
  * versions, and partitionings, (b) stable under corpus growth (a doc
  * keeps its split when new docs arrive — the property that prevents
  * test-set leakage across pipeline re-runs), and (c) engine-portable
  * (md5 text-hex arithmetic reproduces bit-for-bit in the DuckDB
  * oracle). Pure scan-side projections: zero shuffle, whole-stage
  * codegen, filters push into the parquet scan at 100 TB.
  */
object Sampling {

  /** Uniform bucket 0..99 from the first 16 bits of md5(doc_id):
    * `conv(substr(md5(id),1,4),16,10) % 100`. */
  def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("int") % 100)

  /** Train/val/test assignment: buckets [0,trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. */
  def hashSplit(documents: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct <= 100, "trainPct + valPct must be ≤ 100")
    val b = hashBucket(col("doc_id"))
    documents.select(col("doc_id"), b.as("bucket"),
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test").as("split"))
  }

  /** Deterministic ~pct% sample: the docs whose bucket < pct. A
    * subset-monotone family — sample(5) ⊆ sample(20) — so nested
    * ablation corpora share their small rungs. */
  def hashSample(documents: DataFrame, pct: Int): DataFrame =
    documents.filter(hashBucket(col("doc_id")) < pct)
}
