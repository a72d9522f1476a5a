package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination + the composed corpus-build pipeline —
  * the two "assemble the training set" steps that sit on top of the
  * curation primitives (TextAnalysis filters, TextDedup dedup,
  * Sampling splits).
  *
  * Decontamination is the standard eval-leakage guard: any training
  * document sharing an n-gram with a held-out benchmark document is
  * flagged and dropped. The benchmark slice here is carved
  * deterministically out of the same `documents` table (top md5
  * buckets — the same engine-portable hash family as Sampling) so
  * tests, the DuckDB oracle, and the bench all see one input table;
  * swapping in a real external benchmark table is the same code with a
  * different `bench` frame.
  *
  * Scale shape at 100 TB: a real benchmark suite is tiny (10^5-10^7
  * n-grams), so the bench shingle set is BROADCAST and the probe is a
  * scan-side broadcast-hash semi join — the corpus side never
  * shuffles. The only aggregation (`n_hits` per doc) runs over rows
  * that HIT the benchmark, i.e. the contaminated sliver, not the
  * corpus; partial map-side combine makes that exchange bytes ~0 for a
  * clean corpus. A bloom over bench shingles would save the hash-set
  * probe's memory at most a constant — the broadcast join IS the bloom
  * with zero false positives here, so no separate filter is built.
  */
object CorpusPipeline {

  /** Deterministic benchmark membership: the TOP `benchPct` md5
    * buckets of doc_id — disjoint by construction from
    * `Sampling.hashSample`'s low-bucket rungs, stable under corpus
    * growth. */
  def isBenchmark(benchPct: Int): Column =
    Sampling.hashBucket(col("doc_id")) >= lit(100 - benchPct)

  /** Distinct 3-word shingles of the benchmark slice — the broadcast
    * side of every contamination probe. */
  def benchShingles(documents: DataFrame, benchPct: Int): DataFrame =
    documents.filter(isBenchmark(benchPct))
      .select(explode(TextDedup.shingles3(col("text"))).as("s"))
      .distinct()

  /** Per-document contamination hit counts against a shingle set:
    * docs sharing ≥ `minHits` DISTINCT own-shingles with the benchmark
    * (shingles3 is per-doc distinct, so `count(*)` after the join is a
    * distinct count with no extra dedup). Returns (doc_id, n_hits)
    * for flagged docs only. */
  def contaminationHits(docs: DataFrame, benchSh: DataFrame,
      minHits: Long): DataFrame =
    docs
      .select(col("doc_id"), explode(TextDedup.shingles3(col("text"))).as("s"))
      .join(broadcast(benchSh), "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= minHits)

  /** The benchmark slice's distinct shingles as a task-shareable hash
    * set (r6). This is the BUILD SIDE of every contamination probe —
    * the same bytes the previous BroadcastExchange already collected to
    * the driver and shipped to every executor, minus the join
    * machinery: a benchmark suite is bounded metadata (10^5-10^7
    * n-grams) by design, never corpus-sized. Computed with the typed
    * shingle kernel (the declarative shingles3 lambda re-inlines
    * split(text) per position — quadratic per doc). */
  def benchShingleSet(documents: DataFrame, benchPct: Int): java.util.HashSet[String] = {
    val spark = documents.sparkSession
    import spark.implicits._
    val set = new java.util.HashSet[String]()
    documents.filter(isBenchmark(benchPct))
      .select(col("text")).as[String]
      .mapPartitions(_.flatMap(graft.functions.TextKernels.shingles3))
      .distinct()
      .collect()
      .foreach(s => { set.add(s); () })
    set
  }

  /** Benchmark decontamination over one table: flag every
    * non-benchmark document that shares ≥ `minHits` 3-word shingles
    * with any benchmark document.
    *
    * r6 plan: ONE scan-side kernel pass — each doc's distinct shingles
    * are probed against the broadcast bench set in the same
    * tokenization pass. The previous shape (explode every shingle →
    * broadcast hash join → groupBy(doc_id)) shuffled the hit rows and
    * paid the quadratic declarative shingle lambda; output is
    * identical (the hash-set probe IS the broadcast join's build-side
    * lookup, and shingles3 is per-doc distinct so the hit count is the
    * same distinct count). */
  def decontaminate(documents: DataFrame, benchPct: Int = 2,
      minHits: Long = 1): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val bench = spark.sparkContext.broadcast(benchShingleSet(documents, benchPct))
    val needed = math.max(1L, minHits) // the old inner join implied ≥ 1 hit
    documents.filter(!isBenchmark(benchPct))
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val set = bench.value
        it.flatMap { case (id, t) =>
          var hits = 0L
          graft.functions.TextKernels.shingles3(t)
            .foreach(s => if (set.contains(s)) hits += 1)
          if (hits >= needed) Iterator.single((id, hits)) else Iterator.empty
        }
      }
      .toDF("doc_id", "n_hits")
  }

  /** RATIO-based contamination for the corpus build: a doc is flagged
    * when ≥ `ratio` of its own distinct shingles appear in the
    * benchmark. Absolute hit counts (contaminationHits) saturate on
    * small-vocabulary corpora — with few distinct tokens every doc
    * eventually shares SOME shingle with a large benchmark — while the
    * near-copy question ("is most of this doc benchmark text?") is
    * what eval-leakage actually means. Same broadcast-probe plan; the
    * per-doc shingle count rides the explode as a constant column. */
  def contaminationFlags(docs: DataFrame, benchSh: DataFrame,
      ratio: Double): DataFrame =
    docs
      .select(col("doc_id"), TextDedup.shingles3(col("text")).as("shs"))
      .select(col("doc_id"), size(col("shs")).as("n_sh"),
        explode(col("shs")).as("s"))
      .join(broadcast(benchSh), "s")
      .groupBy("doc_id")
      .agg(max("n_sh").as("n_sh"), count(lit(1)).as("n_hits"))
      .filter(col("n_hits") >= col("n_sh") * lit(ratio))
      .select("doc_id")

  /** The composed corpus build — the whole curation pipeline as ONE
    * declarative plan Catalyst optimizes end-to-end:
    *
    *   1. drop the benchmark slice (it is eval data, never train);
    *   2. quality gate: ≥ `minTokens` tokens AND quality ≥ `minQuality`;
    *   3. language gate: predicted language ∈ `langs`;
    *   4. exact dedup among survivors (first doc_id per md5(text) wins);
    *   5. decontaminate survivors against the benchmark shingles
    *      (ratio rule: ≥ `contamRatio` of a doc's shingles in the
    *      benchmark — see contaminationFlags) — applied AFTER dedup
    *      keeper selection, so a contaminated keeper's duplicates stay
    *      dropped (they are still duplicates of contaminated text);
    *   6. deterministic train/val/test split.
    *
    * Steps 1-3 are scan-side predicates on ONE pass over the table
    * (filters collapse into the parquet scan); step 4 is the pipeline's
    * single corpus-sized shuffle (window on md5(text)); step 5 is a
    * broadcast semi-join probe plus a left-anti against the flagged
    * sliver; step 6 is a projection. Net cost at 100 TB: one scan + one
    * hash-partitioned exchange of (doc_id, text-hash) survivors.
    */
  def corpusBuild(documents: DataFrame, benchPct: Int = 2,
      minTokens: Int = 10, minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en", "zh"),
      trainPct: Int = 90, valPct: Int = 5,
      contamRatio: Double = 0.5,
      probeKeepersOnly: Boolean = false): DataFrame = {
    // r6 FUSED PIPELINE: steps 1-3 and 5 collapse into ONE typed
    // scan-side pass. The previous plan scanned `documents` three times
    // (gates for the dedup branch, gates AGAIN for the probe branch,
    // bench slice), ran the gate expressions through interpreted
    // higher-order functions that re-evaluate split(text) per gate, and
    // exploded every surviving doc's shingles into a broadcast join +
    // groupBy. Here each doc is tokenized ONCE; bucket/gates/text-hash/
    // contamination all come out of that pass, and the bench-shingle
    // set is probed as a broadcast hash set (identical bytes to the old
    // BroadcastExchange build side). The dedup window stays the
    // pipeline's single corpus-sized exchange. Output is identical:
    // every duplicate shares its keeper's text, so the keeper's OWN
    // contamination flag is exactly the old anti-join's decision —
    // which also makes `probeKeepersOnly` moot (kept for source
    // compatibility; the per-duplicate probe it traded against is now
    // one hash-set lookup per shingle inside the same scan).
    val _ = probeKeepersOnly
    val spark = documents.sparkSession
    import spark.implicits._
    val bench = spark.sparkContext.broadcast(benchShingleSet(documents, benchPct))
    val benchLo = 100 - benchPct
    val langSet = langs.toSet
    val gated = documents
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val set = bench.value
        it.flatMap { case (id, t) =>
          val bucket = graft.functions.TextKernels.md5Bucket100(id.toString)
          if (bucket >= benchLo) Iterator.empty
          else {
            val w = graft.functions.TextKernels.words(t)
            // NaN quality (empty doc) fails the ≥ gate, like the Column form
            if (w.length < minTokens ||
                !(TextAnalysis.qualityKernel(w) >= minQuality) ||
                !langSet.contains(TextAnalysis.bestLangKernel(w)._1))
              Iterator.empty
            else {
              val sh = graft.functions.TextKernels.shingles3Of(w)
              var hits = 0
              sh.foreach(s => if (set.contains(s)) hits += 1)
              // the old inner join implied ≥ 1 hit before the ratio test
              val contaminated = hits > 0 && hits >= sh.length * contamRatio
              Iterator.single(
                (id, graft.functions.TextKernels.md5Hex(t), bucket, contaminated))
            }
          }
        }
      }
      .toDF("doc_id", "text_hash", "bucket", "contaminated")
    gated
      .withColumn("__keep",
        min("doc_id").over(Window.partitionBy(col("text_hash"))))
      .filter(col("doc_id") === col("__keep") && !col("contaminated"))
      .select(col("doc_id"),
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test").as("split"))
  }

  /** corpusBuild plus NEAR-duplicate resolution: the exact-pipeline
    * survivors additionally run through MinHash-LSH candidate pairs →
    * connected components → one keeper per near-dup cluster. Signatures
    * are per-doc, so computing pairs over the survivor subset equals
    * computing them corpus-wide and restricting both endpoints (the
    * DuckDB oracle does the latter; this does the former — only
    * survivors pay the shingle+md5 cost). Adds the minhash band
    * self-join (one reused exchange, TextDedup) and the
    * component rounds (O(log diameter) shuffles over near-dup edges
    * only) on top of corpusBuild's single corpus-sized exchange.
    * `reliable=true` swaps every lineage truncation (the base
    * materialization here and the component rounds inside
    * DedupGraph) from `localCheckpoint` to `checkpoint()` against the
    * session's checkpoint dir — the cluster setting, where a lost
    * executor must not invalidate truncated lineage. */
  def corpusBuildNearDup(documents: DataFrame, benchPct: Int = 2,
      minTokens: Int = 10, minQuality: Double = 0.3,
      langs: Seq[String] = Seq("en", "zh"),
      trainPct: Int = 90, valPct: Int = 5,
      contamRatio: Double = 0.5,
      reliable: Boolean = false,
      probeKeepersOnly: Boolean = false): DataFrame = {
    // base feeds THREE consumers (survivor projection, component
    // resolution, final semi-join); checkpoint it once so the whole
    // gates→dedup→decontaminate subtree — the expensive pass over the
    // corpus — doesn't run three times. Output is (doc_id, split) of
    // survivors: small relative to the corpus, safe to materialize.
    val built =
      corpusBuild(documents, benchPct, minTokens, minQuality, langs,
          trainPct, valPct, contamRatio, probeKeepersOnly)
    // lazy checkpoint (r6): the first consumer's action materializes it
    // — the eager form ran the gates→dedup subtree once just to cache
    // and again nothing; one full pass saved, identical truncation
    val base = if (reliable) built.checkpoint(false) else built.localCheckpoint(false)
    val survivorDocs =
      documents.join(base.select("doc_id"), Seq("doc_id"), "left_semi")
    val pairs = TextDedup.minhashCandidatePairs(survivorDocs)
      .select("doc_a", "doc_b")
    // drop-set anti-join (r6): a base doc is kept iff it is unpaired or
    // its cluster's minimum — i.e. NOT a paired non-minimum. Anti-join
    // against exactly that (small, broadcastable) set ≡ the previous
    // survivors() outer join + keep filter + semi-join back, with two
    // fewer joins over base.
    val comp = DedupGraph.connectedComponents(pairs, reliable = reliable)
    base.join(comp.filter(col("doc_id") =!= col("component")).select("doc_id"),
      Seq("doc_id"), "left_anti")
  }
}
