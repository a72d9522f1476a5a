package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (hash groupBy), MinHash+LSH banding, SimHash, and exact n-gram
  * Jaccard via an inverted shingle index.
  *
  * All hashing is md5-based so results are engine-portable (the DuckDB
  * oracle recomputes identical values). At the 100 TB design point:
  *  - exact dedup is one shuffle on the text hash (map-side combine);
  *  - minhash signatures are computed scan-side with scalar higher-order
  *    functions (no explode of the shingle set), then candidate pairs
  *    shuffle only on (band, bandHash) — the classic LSH join;
  *  - the exact-Jaccard join shuffles on shingle; hot shingles are the
  *    skew risk, handled by AQE skew-join splitting (and the threshold
  *    keeps the verified output small).
  */
object TextDedup {

  /** Whitespace tokens, empties dropped (portable: DuckDB
    * `list_filter(string_split(text,' '), t -> t <> '')`). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Distinct 3-word shingles in document order. Guarded so docs with
    * <3 words yield an empty array (Spark's `sequence(1,0)` would count
    * DOWN, not empty). */
  def shingles3(text: Column): Column = {
    val w = tokens(text)
    when(size(w) >= 3,
      array_distinct(
        transform(sequence(lit(1), size(w) - 2),
          i => array_join(slice(w, i, lit(3)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: md5 text hash, keep = first doc_id per hash.
    * One shuffle; at scale the groupBy key is the hash (uniform). */
  def exactDedup(documents: DataFrame): DataFrame = {
    val h = md5(col("text"))
    documents
      .select(col("doc_id"), h.as("text_hash"))
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .select(col("doc_id"), col("text_hash"),
        (col("doc_id") === col("keep_id")).as("keep"))
  }

  /** MinHash signature row per (doc, k): sig_k = min over shingles of
    * md5(k || '|' || shingle), k in [0, nSig). Emitted as rows (not an
    * array) so the schema is flat for the oracle compare. */
  def minhashSignatures(documents: DataFrame, nSig: Int = 16): DataFrame =
    documents
      .select(col("doc_id"), shingles3(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(sequence(lit(0), lit(nSig - 1))).as("k"),
        col("sh"))
      .select(col("doc_id"), col("k"),
        array_min(transform(col("sh"),
          s => md5(concat(col("k").cast("string"), lit("|"), s)))).as("minhash"))

  /** LSH banding over the minhash signatures: nSig sigs / rowsPerBand →
    * band hash per (doc, band); candidate pairs = docs sharing a band.
    * Output: (doc_a, doc_b, n_bands) with doc_a < doc_b.
    * The pair join shuffles on (band, band_hash) only — no n² scan. */
  def minhashCandidatePairs(
      documents: DataFrame,
      nSig: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val sigs = minhashSignatures(documents, nSig)
      .withColumn("band", (col("k") / rowsPerBand).cast("int"))
    val bands = sigs
      .groupBy("doc_id", "band")
      // minhash values are md5 strings; concat in k order via sorted
      // collect (k asc == lexicographic on zero-padded k not needed:
      // group rows are exactly rowsPerBand, order pinned by sort_array
      // over (k, value) structs)
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("k"), col("minhash")))),
        s => s.getField("minhash")), "|")).as("band_hash"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Exact n-gram Jaccard similarity join via inverted shingle index:
    * explode distinct shingles, self-join on shingle, count
    * intersections, filter on |A∩B| / (|A|+|B|-|A∩B|) >= threshold.
    * Complete (no LSH false negatives); the shuffle key is the shingle. */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double): DataFrame = {
    val sh = documents
      .select(col("doc_id"), explode(shingles3(col("text"))).as("s"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard",
        col("c").cast("double") /
          (col("sa.n") + col("sb.n") - col("c")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash over distinct whitespace tokens, output as a 16-char
    * hex string. Bit i of token t = bit (3 - i%4) of hex digit i/4 of
    * md5(t); document bit i = 1 iff sum over tokens of (+1/-1) > 0.
    *
    * Implementation exploits columnar aggregation: explode distinct
    * tokens once, then 64 conditional-sum aggregates in a single
    * groupBy pass (one shuffle; whole-stage codegen keeps the 64
    * expressions in one operator). */
  def simhash(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("t"))
      .withColumn("h", md5(col("t")))
    val bitSums: Seq[Column] = (0 until 64).map { i =>
      val nibble = conv(substring(col("h"), 1 + i / 4, 1), 16, 10).cast("int")
      val bit = shiftright(nibble, 3 - i % 4).bitwiseAND(1)
      sum(when(bit === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val summed = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val hexDigits: Seq[Column] = (0 until 16).map { j =>
      val v = (0 until 4).map { b =>
        when(col(s"b${4 * j + b}") > 0, 1 << (3 - b)).otherwise(0)
      }.reduce(_ + _)
      lit("0123456789abcdef").substr(v + 1, lit(1))
    }
    summed.select(col("doc_id"), concat(hexDigits: _*).as("simhash"))
  }
}
