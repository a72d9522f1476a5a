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

  /** MinHash prime modulus + universal-hash coefficients: each shingle
    * is md5'd ONCE (the expensive part), reduced to a 31-bit value, and
    * the k-th permutation is the cheap universal hash
    * (a_k·v + b_k) mod P — the standard one-hash MinHash family. All
    * arithmetic stays below 2^62 so Spark and DuckDB agree exactly. */
  val MinhashP = 2147483647L
  // large P-scale multipliers: small a_k (e.g. (k+1)*1000003) barely
  // wrap mod P, so the globally smallest shingle hash wins EVERY k and
  // the signatures correlate (band false-positive storm). a_k·v stays
  // < P² ≈ 4.6e18 < Long.Max.
  def minhashA(k: Int): Long = ((k + 1L) * 2654435761L) % MinhashP
  def minhashB(k: Int): Long = (k * 1013904223L + 12345L) % MinhashP

  /** Wide per-doc signatures: explode distinct shingles → one md5 per
    * shingle → 16 min-aggregates in a single groupBy pass (map-side
    * partial agg; the shuffle key is doc_id). One column per k.
    *
    * NOT expressed with nested higher-order functions: Catalyst's
    * CollapseProject inlines the shingle-hash array into every lambda
    * (no CSE inside lambdas), re-running the md5 pass once per k —
    * 16× the work. The explode+agg shape evaluates md5 exactly once
    * per (doc, shingle). */
  private def minhashWide(documents: DataFrame, nSig: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // typed flatMap shingling: the declarative slice-lambda form is
    // quadratic per doc (see TextKernels); one md5 per (doc, shingle)
    val exploded = documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.functions.TextKernels.shingles3(t)
          .map(s => (id, graft.functions.TextKernels.shingleHash31(s)))
      }
      .toDF("doc_id", "v")
    val aggs = (0 until nSig).map { k =>
      min((col("v") * minhashA(k) + minhashB(k)) % MinhashP).as(s"sig$k")
    }
    exploded.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signature row per (doc, k). Emitted as rows (not an
    * array) so the schema is flat for the oracle compare. */
  def minhashSignatures(documents: DataFrame, nSig: Int = 16): DataFrame =
    minhashWide(documents, nSig)
      .select(col("doc_id"),
        posexplode(array((0 until nSig).map(k => col(s"sig$k")): _*)))
      .select(col("doc_id"), col("pos").cast("int").as("k"), col("col").as("minhash"))

  /** LSH band rows (doc_id, band, band_hash) — the signature INDEX.
    * Public because at scale this is what gets PERSISTED: the corpus's
    * band rows are written once (partitioned/bucketed on (band,
    * band_hash)) and every later batch joins against the stored index
    * instead of re-shingling the corpus (see incrementalMinhashPairs). */
  def minhashBandRows(
      documents: DataFrame,
      nSig: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val nBands = nSig / rowsPerBand
    val bandCols = (0 until nBands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(r => col(s"sig${b * rowsPerBand + r}").cast("string")): _*))
    }
    minhashWide(documents, nSig)
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** LSH banding over the minhash signatures: nSig sigs / rowsPerBand →
    * band hash per (doc, band); candidate pairs = docs sharing a band.
    * Output: (doc_a, doc_b, n_bands) with doc_a < doc_b.
    *
    * The signature vector is computed SCAN-SIDE as one array column
    * (no explode → groupBy → collect_list round trip: the grouped
    * re-assembly both shuffled the signature rows and was recomputed on
    * each side of the self-join), then sliced into band hashes; the
    * only shuffle left is the candidate join on (band, band_hash). */
  def minhashCandidatePairs(
      documents: DataFrame,
      nSig: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = {
    val bands = minhashBandRows(documents, nSig, rowsPerBand)
    // merge-hint both sides: a broadcast self-join would plan the whole
    // scan→shingle→md5→min-agg signature subtree TWICE (BroadcastExchange
    // never matches a shuffle Exchange, so ReuseExchange can't fire); a
    // sort-merge join puts an identical Exchange hashpartitioning(band,
    // band_hash) under each side and the second becomes a ReusedExchange —
    // the dominant cost (shingling+md5) runs exactly once, with no
    // persist() lifetime to manage at 100 TB.
    bands.as("a").hint("merge")
      .join(bands.as("b").hint("merge"),
        col("a.band") === col("b.band") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Incremental (cross-corpus) MinHash dedup — the continual-crawl
    * shape: a NEW batch is checked against the EXISTING corpus without
    * re-shingling it. `corpusBands` is the corpus's persisted band-row
    * index (`minhashBandRows` output, stored once, bucketed on
    * (band, band_hash)); only the delta pays the shingle+md5 cost, and
    * the join shuffles the delta's band rows against the index — with
    * a bucketed index table the corpus side needs no exchange at all
    * (same storage-partitioned-join trick as the frontier's seen
    * mirror, BucketedMirror). Output: (doc_new, doc_old, n_bands). */
  def incrementalMinhashPairs(
      newDocs: DataFrame,
      corpusBands: DataFrame,
      nSig: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame =
    minhashBandRows(newDocs, nSig, rowsPerBand).as("n")
      .join(corpusBands.as("o"),
        col("n.band") === col("o.band") &&
          col("n.band_hash") === col("o.band_hash"))
      .groupBy(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
      .agg(count(lit(1)).as("n_bands"))

  /** Incremental exact dedup: the new batch's append survivors —
    * first-doc_id-per-hash WITHIN the batch, minus anything whose text
    * hash already exists in the corpus. The corpus side reduces to a
    * distinct-hash set (at scale: the persisted hash index, probed
    * through the same sharded-bloom prefilter as the frontier seen
    * set); the anti-join shuffles batch-sized sides only. */
  def incrementalExactSurvivors(newDocs: DataFrame, corpus: DataFrame): DataFrame = {
    val newH = newDocs.select(col("doc_id"), md5(col("text")).as("text_hash"))
    val oldH = corpus.select(md5(col("text")).as("text_hash")).distinct()
    newH
      .withColumn("keep_id", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy("text_hash")))
      .filter(col("doc_id") === col("keep_id"))
      .join(oldH, Seq("text_hash"), "left_anti")
      .select(col("doc_id"), col("text_hash"))
  }

  /** Exact n-gram Jaccard similarity join with PREFIX FILTERING
    * (Chaudhuri et al. SSJoin / Xiao et al. PPJoin): complete — no LSH
    * false negatives — but without indexing every (doc, shingle) pair
    * on both join sides.
    *
    * Why: the plain inverted-index self-join shuffles on the shingle,
    * and a hot shingle (a stopword 3-gram shared by 10^6 docs) emits
    * 10^12 candidate rows before the intersection groupBy — AQE splits
    * the shuffle partition but not the pair blow-up. Prefix filtering
    * is the provably-lossless fix:
    *
    *  1. canonical global shingle order = ascending document frequency
    *     (tie-break on the shingle itself) — hot shingles sort LAST;
    *  2. each doc indexes only its first p = n − ⌈t·n⌉ + 1 shingles in
    *     that order. For J(a,b) ≥ t the required overlap is
    *     α = ⌈t/(1+t)·(na+nb)⌉ ≥ ⌈t·nx⌉ for both sides (given the
    *     min ≥ t·max length filter), and any pair with overlap ≥ α
    *     must collide inside both prefixes (two-sided prefix
    *     principle) — so joining prefix×prefix loses nothing;
    *  3. candidates (a tiny set once hot shingles are out of every
    *     prefix) are verified EXACTLY against the full per-doc shingle
    *     sets via array_intersect.
    *
    * The df pass is a map-side-combined count (hot keys harmless in an
    * agg); the only pair-producing join runs over prefixes, where a
    * frequency-ordered hot shingle essentially never appears. */
  def ngramJaccardPairs(documents: DataFrame, threshold: Double): DataFrame =
    verifyJaccardCandidates(documents,
      jaccardCandidatePairs(documents, threshold), threshold)

  /** The frequency-ordered prefix index: (doc_id, s, n) rows for the
    * first n − ⌈t·n⌉ + 1 shingles of each doc in (df asc, s asc) order
    * — the only rows the candidate join ever sees. */
  def jaccardPrefixIndex(documents: DataFrame, threshold: Double): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val sh = documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val ss = graft.functions.TextKernels.shingles3(t)
        val n = ss.length
        ss.map(s => (id, s, n))
      }
      .toDF("doc_id", "s", "n")
    // document frequency as a WINDOW over the shingle partition (r6):
    // the groupBy+join-back formulation planned the shingling flatMap
    // twice (the aggregate's partial pass is not exchange-reusable with
    // the join side), so the corpus was re-shingled once per arm. Same
    // value — shingles are per-doc distinct, so count(*) per s is the
    // document frequency — one shingling pass, same exchange count.
    val wS = org.apache.spark.sql.expressions.Window.partitionBy("s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df").asc, col("s").asc)
    // the 1e-9 guards float rounding UP of an exact integer t·n, which
    // would shrink the prefix below the lossless length
    sh.withColumn("df", count(lit(1)).over(wS))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <=
        col("n") - ceil(lit(threshold) * col("n") - lit(1e-9)) + 1)
      .select(col("doc_id"), col("s"), col("n"))
  }

  /** Candidate (doc_a, doc_b) pairs from the two-sided prefix join —
    * split out so the bench can count candidates before verification. */
  def jaccardCandidatePairs(documents: DataFrame, threshold: Double): DataFrame = {
    val prefix = jaccardPrefixIndex(documents, threshold)
    prefix.as("a")
      .join(prefix.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * threshold - lit(1e-9) <= col("b.n") &&
          col("b.n") * threshold - lit(1e-9) <= col("a.n"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact Jaccard over candidate pairs: join back the full distinct
    * shingle sets (one typed pass per doc) and intersect. Candidates
    * are few post-pruning, so carrying the arrays through the join is
    * cheap; values are identical to the full inverted-index formula. */
  private def verifyJaccardCandidates(
      documents: DataFrame, cands: DataFrame, threshold: Double): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val arrs = documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, graft.functions.TextKernels.shingles3(t)) }
      .toDF("doc_id", "sh")
    cands
      .join(arrs.as("fa"), col("doc_a") === col("fa.doc_id"))
      .join(arrs.as("fb"), col("doc_b") === col("fb.doc_id"))
      .withColumn("c", size(array_intersect(col("fa.sh"), col("fb.sh"))))
      .withColumn("jaccard",
        col("c").cast("double") /
          (size(col("fa.sh")) + size(col("fb.sh")) - col("c")).cast("double"))
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
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, graft.functions.TextKernels.simhashHex(
          graft.functions.TextKernels.simhashSums(t)))
      }
      .toDF("doc_id", "simhash")
  }

  /** The 64 simhash bits assembled into one BIGINT (bit i of the hex
    * rendering = bit 63-i of the long; any fixed bijection works —
    * Hamming distance is permutation-invariant).
    *
    * r6: both renderings come from a per-document TYPED KERNEL
    * (`TextKernels.simhashSums` — the sums are doc-local and commute,
    * so the signature is a pure scan-side projection). The previous
    * explode(distinct tokens) → groupBy(64 conditional sums) plan paid
    * a full shuffle of every token row plus 64 interpreted
    * substring/conv expressions per token; bit sums are integers, so
    * the kernel result is exactly the old aggregate's. */
  def simhashLong(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, graft.functions.TextKernels.simhashSig(
          graft.functions.TextKernels.simhashSums(t)))
      }
      .toDF("doc_id", "sig")
  }

  /** SimHash near-duplicate pairs: all (doc_a < doc_b) with Hamming
    * distance ≤ `maxHamming` between 64-bit signatures.
    *
    * Banded join, PROVABLY LOSSLESS for maxHamming < nBands: the 64
    * bits split into nBands contiguous bands; ≤ maxHamming differing
    * bits can touch at most maxHamming bands, so by pigeonhole every
    * qualifying pair agrees exactly on ≥ 1 band and is found by the
    * equi-join on (band, key). The exact `bit_count(xor)` post-filter
    * removes band-collision false positives, so the result equals the
    * quadratic all-pairs scan.
    *
    * Scale: signatures are one shuffle (see simhashBitSums); the pair
    * join shuffles nBands rows/doc on (band, key) — same shape and same
    * hot-bucket caveat (AQE skew split) as the MinHash band join. The
    * merge hint makes the second side a ReusedExchange, so the
    * signature subtree is computed once. */
  def simhashPairs(
      documents: DataFrame,
      maxHamming: Int = 3,
      nBands: Int = 4
  ): DataFrame = {
    require(64 % nBands == 0, s"nBands=$nBands must divide 64")
    require(maxHamming < nBands,
      s"banding is lossless only for maxHamming < nBands ($maxHamming >= $nBands)")
    val width = 64 / nBands
    val mask = (1L << width) - 1
    val bandKeys = (0 until nBands).map { b =>
      shiftrightunsigned(col("sig"), b * width).bitwiseAND(lit(mask))
    }
    val bands = simhashLong(documents)
      .select(col("doc_id"), col("sig"), posexplode(array(bandKeys: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "key")
    bands.as("a").hint("merge")
      .join(bands.as("b").hint("merge"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cross-document duplicated-span fraction (the exact-substring-dedup
    * signal of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better"): for each doc, the fraction of its positional
    * `n`-word grams that also occur in at least one OTHER document.
    * Output: (doc_id, n_grams, n_dup_grams, dup_frac).
    *
    * Shape at scale: grams are md5-hashed scan-side (16-byte keys, not
    * ~50-char strings, through every shuffle); one groupBy(doc, gram)
    * with map-side combine collapses within-doc repeats BEFORE the
    * gram-frequency shuffle; groupBy(gram) counts distinct docs; the
    * join back on gram is hash-partitioned on the same key. No step
    * holds a per-doc gram set in memory. */
  def dupSpanFraction(documents: DataFrame, n: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // positional gram md5s via the typed kernel (r6): the declarative
    // slice-lambda form re-inlined split(text) per gram position —
    // quadratic per document (the PLANS.md lambda rule)
    val occ = documents
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        graft.functions.TextKernels.gramMd5s(t, n).map(g => (id, g))
      }
      .toDF("doc_id", "g")
      .groupBy("doc_id", "g").agg(count(lit(1)).as("occ"))
    // per-gram document count as a WINDOW over the gram partition (r6):
    // the groupBy(g) + join-back formulation planned the occ subtree —
    // including the gram-md5 flatMap — twice (aggregate arm and join
    // arm are not exchange-reusable), re-hashing every gram of the
    // corpus. occ rows are distinct (doc, g), so count(*) per g is the
    // same n_docs; one gram pass, one fewer exchange.
    occ
      .withColumn("n_docs", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .groupBy("doc_id")
      .agg(
        sum("occ").as("n_grams"),
        sum(when(col("n_docs") >= 2, col("occ")).otherwise(0L)).as("n_dup_grams"))
      .withColumn("dup_frac",
        round(col("n_dup_grams").cast("double") / col("n_grams"), 4))
  }
}
