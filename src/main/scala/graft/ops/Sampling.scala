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

  /** Stratified deterministic sample: per-stratum percentage quotas
    * (e.g. keep 50% of English, 20% of Chinese, 5% of the rest) — the
    * language/domain rebalancing step of a training-data mix. Same
    * hash family as `hashSample`, so each stratum's kept set is the
    * stratum's own subset-monotone rung. */
  def stratifiedHashSample(documents: DataFrame, stratum: Column,
      pctByStratum: Map[String, Int], defaultPct: Int): DataFrame = {
    val pct = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(stratum === k, lit(v)).otherwise(acc)
    }
    documents.filter(hashBucket(col("doc_id")) < pct)
  }

  /** Finer 0..999999 bucket for fractional keep-rates
    * ([[mixtureSample]] needs resolution [[hashBucket]]'s 100 can't
    * give): first 24 bits of md5, mod 10^6 — the same engine-portable
    * md5 family (`('0x' || substr(md5(id),1,6))::BIGINT % 1000000` in
    * the DuckDB oracle). */
  def hashBucketPpm(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 6), 16, 10).cast("long") % 1000000L

  /** Per-domain keep-rates for a token-budget MIXTURE — the
    * corpus-mixing step of a pretraining data recipe (Pile/DoReMi-style
    * static mixtures): hit target token FRACTIONS per domain (40% en /
    * 30% zh / …) by deterministic downsampling. The output budget is
    * the largest achievable WITHOUT upsampling (a deterministic
    * hash sampler can only drop): budget = min over target domains of
    * tokens_d / frac_d, so the binding domain keeps rate 1.0 and every
    * other domain downsamples to match its fraction. Domains outside
    * the target map are dropped. The per-domain totals agg is the only
    * job — #domains result rows of driver metadata (like the IVF pivot
    * collect), never data rows; at 100 TB it is one partial-aggregated
    * shuffle of a handful of rows. Every arithmetic step (double
    * division, multiply, min) is written to evaluate identically in
    * the DuckDB oracle's CTE — see SparkEntry's q_mixture_sample SQL. */
  def mixtureKeepRates(documents: DataFrame, domain: Column,
      targetFrac: Map[String, Double], tokenCost: Column): Map[String, Double] = {
    val totals = documents.groupBy(domain.as("d"))
      .agg(sum(tokenCost.cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val live = targetFrac.filter { case (d, f) => f > 0 && totals.getOrElse(d, 0L) > 0L }
    require(live.nonEmpty, "no target domain present in the corpus")
    val budget = live.map { case (d, f) => totals(d) / f }.min
    live.map { case (d, f) => d -> math.min(1.0, f * budget / totals(d)) }
  }

  /** Deterministic mixture sample: keep a doc iff its ppm bucket clears
    * its domain's keep-rate threshold (floor(rate × 10^6)); non-target
    * domains get threshold −1 and drop. Scan-side filter after the one
    * tiny rates agg; same md5 family as [[hashSample]], so the kept set
    * is stable under corpus growth for any domain whose rate does not
    * shrink. */
  def mixtureSample(documents: DataFrame, domain: Column,
      targetFrac: Map[String, Double], tokenCost: Column): DataFrame = {
    val ppm = mixtureKeepRates(documents, domain, targetFrac, tokenCost)
      .map { case (d, r) => d -> math.floor(r * 1000000.0).toLong }
    val thr = ppm.foldLeft(lit(-1L)) {
      case (acc, (k, v)) => when(domain === k, lit(v)).otherwise(acc)
    }
    documents.filter(hashBucketPpm(col("doc_id")) < thr)
  }

  /** Epoch-weighted mixture at a CALLER-CHOSEN token budget — the
    * upsampling half of corpus mixing ([[mixtureSample]] can only
    * drop): rate_d = frac_d × budget / tokens_d may exceed 1, meaning
    * the domain is seen more than one epoch (GPT-3/Pile-style
    * "Wikipedia × 3.4 epochs"). A doc contributes floor(rate) full
    * copies plus one more iff its ppm bucket clears the fractional
    * part — so expected tokens per domain = frac_d × budget exactly,
    * deterministically, with every copy tagged by an `epoch` column
    * (0-based) so downstream packing/shuffling can spread repeats.
    * Scan-side: the one tiny totals agg, then project + explode —
    * zero data shuffle at 100 TB. Non-target domains drop. */
  def mixtureEpochs(documents: DataFrame, domain: Column,
      targetFrac: Map[String, Double], tokenCost: Column,
      budgetTokens: Double): DataFrame = {
    val totals = documents.groupBy(domain.as("d"))
      .agg(sum(tokenCost.cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = targetFrac.collect {
      case (d, f) if f > 0 && totals.getOrElse(d, 0L) > 0L =>
        d -> f * budgetTokens / totals(d)
    }
    require(rates.nonEmpty, "no target domain present in the corpus")
    val full = rates.map { case (d, r) => d -> math.floor(r).toLong }
    val fracPpm = rates.map { case (d, r) =>
      d -> math.floor((r - math.floor(r)) * 1000000.0).toLong }
    def whenChain(m: Map[String, Long], default: Long): Column =
      m.foldLeft(lit(default)) {
        case (acc, (k, v)) => when(domain === k, lit(v)).otherwise(acc)
      }
    documents
      .withColumn("n_copies",
        whenChain(full, -1L) +
          when(hashBucketPpm(col("doc_id")) < whenChain(fracPpm, 0L), 1L)
            .otherwise(0L))
      .filter(col("n_copies") > 0)
      .select(col("*") +: Seq(
        explode(sequence(lit(0L), col("n_copies") - 1)).as("epoch")): _*)
      .drop("n_copies")
  }

  /** Deterministic training-order SHUFFLE — the step between packing
    * and writing: route each record to one of nShards writer shards by
    * a seeded md5 of its key, and give it a dense 0-based position
    * within the shard in seeded-hash order. This is the standard
    * "globally shuffled training files" layout: shard assignment is
    * itself pseudo-random, each shard is internally shuffled, and a
    * reader streaming shard files in position order sees a reproducible
    * pseudo-random epoch order. Changing `seed` reshuffles (per-epoch
    * orders); fixing it reproduces the order across runs, partitionings
    * and cluster sizes. Scale: one exchange on shard + a per-shard
    * window — no global sort, no single-partition window, same shape as
    * [[packBy]].
    *
    * CONTRACT: `key` must be unique per record (doc_id is; the epoch
    * output of [[mixtureEpochs]] is NOT by doc_id alone — fold the
    * epoch into the key, e.g. `concat(doc_id, '#', epoch)`). Duplicate
    * keys produce identical md5 shuffle keys, and row_number on tied
    * keys is partition-order-dependent — positions within a shard
    * would then differ run-to-run. */
  def shuffleShards(records: DataFrame, key: Column, nShards: Int,
      seed: String): DataFrame = {
    val h = md5(concat_ws("|", lit(seed), key.cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("shuffle_key")
    records
      .withColumn("shuffle_key", h)
      .withColumn("shard",
        conv(substring(col("shuffle_key"), 1, 4), 16, 10).cast("int") % nShards)
      .withColumn("pos", row_number().over(w).cast("long") - 1)
  }

  /** Deterministic sequence PACKING for pretraining batches: documents
    * are routed to `nShards` shards by doc_id hash, laid out in
    * doc_id order within each shard, and assigned the bin where their
    * start offset falls (`bin = (cumulative_tokens - own_tokens) /
    * maxTokens`, integer division) — the greedy offset rule, so a bin
    * holds ~maxTokens whitespace tokens. Shards make the window
    * PARALLEL: the only orderBy lives inside a shard partition, never
    * globally — at 100 TB pick nShards ≈ cluster cores and every
    * executor packs its shards independently, one exchange total.
    * Deterministic: same corpus → same bins, regardless of
    * partitioning or cluster size. */
  def packSequences(documents: DataFrame, maxTokens: Int = 256,
      nShards: Int = 8): DataFrame =
    packBy(documents, size(TextDedup.tokens(col("text"))), maxTokens, nShards)

  /** The shard/offset packing rule over an arbitrary token-cost column
    * — shared by [[packSequences]] (whitespace tokens) and
    * `Interleave.packRecords` (multimodal total_tokens), so the greedy
    * bin rule and the shard routing can never diverge between them. */
  def packBy(records: DataFrame, tokenCost: Column, maxTokens: Int,
      nShards: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    records
      .select(col("doc_id"),
        (hashBucket(col("doc_id")) % nShards).as("shard"),
        tokenCost.cast("long").as("n_toks"))
      .withColumn("bin",
        floor((sum("n_toks").over(w) - col("n_toks")) / maxTokens).cast("long"))
  }
}
