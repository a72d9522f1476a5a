package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (the exact
  * baseline) and a random-hyperplane LSH-bucketed variant (the scale
  * path), plus an exact cosine near-duplicate pair join.
  *
  * Dot products run through `zip_with` + `aggregate` — scalar,
  * codegen'd, left-to-right (deterministic association order). Floats
  * are cast to double BEFORE arithmetic and cosines rounded at the end
  * so the DuckDB oracle computes identical values.
  */
object Similarity {

  /** Σ a_i * b_i over two float-array columns, in double — the
    * codegen'd FloatDot kernel (same left-to-right double accumulation
    * as the declarative zip_with/aggregate form, ~50× fewer
    * allocations at n² pair volume). */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.float_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact cosine near-duplicate pairs above `threshold`, blocked by
    * `label` (the quantizer cell): at scale the label plays the role of
    * a coarse IVF centroid assignment — only same-cell pairs are
    * compared, so the join shuffles on label instead of exploding n². */
  def cosinePairs(embeddings: DataFrame, threshold: Double, cellCap: Int = 4096): DataFrame = {
    val e = embeddings.select(
      col("vec_id"), col("label"), col("embedding"),
      norm(col("embedding")).as("nrm"))
    // Hot-cell cap: a label with m rows forms m²/2 pairs on ONE join
    // key — at 100 TB a single hot IVF cell serializes the stage. Split
    // each label into g = ⌈m / cellCap⌉ sub-cells (pmod of vec_id —
    // deterministic) and run all-pairs as a block join: side A carries
    // its sub-cell as block-row i and explodes block-column j over
    // [0,g); side B carries its sub-cell as j and explodes i. An
    // unordered pair (x,y) meets in exactly one block (c_x, c_y), so
    // the output set is IDENTICAL to the plain within-label join while
    // the hot cell's pairs spread over g² join keys (g² tasks instead
    // of 1) and replicated input stays m·g = m²/cellCap ≪ m² pairs.
    // Cold labels (m ≤ cellCap) get g = 1 — the plan degenerates to
    // the plain label join with one broadcast count lookup added.
    val cellsOf = e.groupBy("label").agg(count(lit(1)).as("cnt"))
      .select(col("label"),
        ceil(col("cnt").cast("double") / cellCap).cast("int").as("g"))
    val cells = e.join(broadcast(cellsOf), "label")
      .withColumn("c", pmod(col("vec_id"), col("g")).cast("int"))
    val blockIdx = sequence(lit(0), col("g") - 1)
    val a = cells.withColumnRenamed("c", "i").withColumn("j", explode(blockIdx))
    val b = cells.withColumnRenamed("c", "j").withColumn("i", explode(blockIdx))
    a.as("a")
      .join(b.as("b"),
        col("a.label") === col("b.label") &&
          col("a.i") === col("b.i") && col("a.j") === col("b.j") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= threshold)
      .select(
        col("a.vec_id").as("vec_a"),
        col("b.vec_id").as("vec_b"),
        round(col("cos"), 4).as("cos"))
  }

  /** Per-query top-k over scored (query, candidate) rows: one window
    * partitioned by query id.
    *
    * The classic worry — with few queries ALL candidate pairs funnel
    * into nQueries window partitions — does NOT apply on Spark 3.5+/4.x:
    * the optimizer rewrites `row_number ≤ k` into WindowGroupLimit with
    * a PARTIAL pass before the exchange (verified in the executed plan,
    * PLANS.md: `Sort → WindowGroupLimit → Exchange hashpartitioning
    * (q.vec_id) → Sort → WindowGroupLimit → Window → Filter`), so each
    * input partition forwards at most k rows per query and the shuffle
    * carries ≤ k × nPartitions rows per query — exactly the two-phase
    * top-k, built into the engine. A hand-rolled two-phase variant
    * (extra spark_partition_id window) was measured 35% SLOWER (one
    * extra sort+shuffle) and removed. */
  private def topKPerQuery(joined: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy(col("q.vec_id"))
      .orderBy(col("cos").desc, col("c.vec_id").asc)
    joined
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(
        col("q.vec_id").as("query_id"),
        col("c.vec_id").as("vec_id"),
        col("cos"),
        col("rnk"))
  }

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), scan all candidates once and keep the k best per query
    * via the two-phase window. The scan side never shuffles the full
    * table — phase 1 ranks in place, only ≤ k rows per (query,
    * partition) reach the global shuffle.
    * Norms are computed once per side before the join (not per pair).
    * Ranking is on the ROUNDED cosine with vec_id tie-break so the
    * result is stable across engines and partitionings. */
  def bruteForceTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = embeddings.withColumn("nrm", norm(col("embedding"))).as("c")
    val q = queries.withColumn("nrm", norm(col("embedding"))).as("q")
    val joined = c
      .join(broadcast(q), col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos",
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6))
    topKPerQuery(joined, k)
  }

  /** Random-hyperplane LSH bucket signature: bit p = sign(Σ_i s_pi x_i),
    * `nPlanes` bits → one int bucket. Scan-side scalar computation via
    * the codegen'd [[graft.expressions.FloatLshBucket]] kernel: the
    * ±1 signs (first hex digit of md5("plane<p>|<dim>") ≥ 8) are
    * computed once per JVM, not per row — the old declarative form
    * evaluated 512 md5s per embedding row because Catalyst does not
    * constant-fold inside higher-order-function lambdas. */
  def lshBucket(embedding: Column, nPlanes: Int): Column =
    graft.expressions.LshExpressions.float_lsh_bucket(embedding, nPlanes)

  /** LSH-bucketed ANN: candidates restricted to the query's bucket,
    * then exact cosine top-k within it. Sub-linear candidate volume at
    * scale (bucket pruning happens before the join); recall < 1 is the
    * accepted trade — measured against bruteForceTopK in tests.
    *
    * BASELINE, NOT THE SHIPPING PATH: a single table of 8 hyperplanes
    * measures recall@5 ≈ 0.016 on the isotropic sf0.1 embeddings (the
    * hardest regime — per-plane agreement ~0.62 on cos≈0.37 neighbors,
    * 0.62^8 ≈ 2%). For production recall use [[lshTopKMultiTable]]
    * (0.406 isotropic at ~12% candidates; 1.0 on clustered corpora),
    * [[ivfTopK]] (0.675 isotropic), or [[fitIvfPivots]]+[[ivfTopKWith]]
    * (the fitted quantizer — ≥0.97 clustered at ≤3% candidates). The
    * nPlanes=8 default is pinned by the ann_lsh_topk oracle SQL. */
  def lshTopK(embeddings: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val cand = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
      .withColumn("nrm", norm(col("embedding")))
    val q = queries
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
      .withColumn("nrm", norm(col("embedding")))
    val joined = cand.as("c")
      .join(broadcast(q.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos",
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6))
    topKPerQuery(joined, k)
  }

  /** Multi-probe LSH ANN: each query also probes the nPlanes buckets at
    * Hamming distance 1 from its own (one sign-bit flip each) — the
    * classic recall/cost dial: candidate volume grows ~(nPlanes+1)×
    * while recall approaches brute force (a true neighbor differing on
    * one marginal hyperplane is recovered). The probe values are
    * pairwise-distinct, so a candidate matches at most one probe and no
    * candidate dedup is needed before the top-k window. Scale shape is
    * unchanged from lshTopK: probes explode on the (broadcast) query
    * side only.
    *
    * STILL A BASELINE: measured recall@5 ≈ 0.100 isotropic at sf0.1
    * (9 probed buckets of 256). Prefer [[lshTopKMultiTable]] /
    * [[ivfTopK]] / [[ivfTopKWith]] with [[fitIvfPivots]] for shipping
    * recall — see [[lshTopK]]'s scaladoc for the measured ladder. */
  def lshTopKMultiProbe(
      embeddings: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 8): DataFrame = {
    val cand = embeddings
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
      .withColumn("nrm", norm(col("embedding")))
    val probes = array(
      (0 to nPlanes).map { i =>
        if (i == 0) col("bucket0")
        else col("bucket0").bitwiseXOR(lit(1 << (i - 1)))
      }: _*)
    val q = queries
      .withColumn("bucket0", lshBucket(col("embedding"), nPlanes))
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("bucket", explode(probes))
    val joined = cand.as("c")
      .join(broadcast(q.as("q")),
        col("q.bucket") === col("c.bucket") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos",
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6))
    topKPerQuery(joined, k)
  }

  /** Multi-table LSH ANN (the OR-construction): L independent tables,
    * each with its own `nPlanes`-plane sign matrix (table-seeded md5
    * recipe, [[graft.expressions.LshExpressions.signs]]); a candidate
    * qualifies when it shares a bucket with the query in ANY table.
    * This is the standard recall dial LSH theory prescribes — with
    * per-table collision probability p, L tables give 1−(1−p)^L — and
    * fixes the measured 1.6% single-table recall on the isotropic
    * bench embeddings (nPlanes=6, nTables=8 → ~0.37 predicted on
    * cos≈0.37 neighbors, ≫ the 0.62^8≈2% single-table figure, at ~12%
    * of the brute-force candidate volume; on CLUSTERED real-world
    * embeddings — see the planted-neighbor spec — recall is ≫ that).
    *
    * Scale shape: candidates explode L× SCAN-SIDE (no shuffle — the
    * bucket array is computed once per row by the codegen'd kernel,
    * then unrolled), and the join is a BroadcastHashJoin on the equi
    * key (table, bucket) against the exploded query probes. The
    * OR-construction's classic duplicate problem — a pair colliding in
    * several tables — is eliminated INSIDE the join residual, not by a
    * post-join shuffle dedup: a pair is kept only in its FIRST
    * matching table (`array_position(zip_with(bucketsQ, bucketsC, eq),
    * true) = t+1`), so each (query, candidate) pair reaches the top-k
    * window exactly once and no exchange is added. */
  def lshTopKMultiTable(
      embeddings: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 6, nTables: Int = 8): DataFrame =
    topKPerQuery(lshMultiTableCandidates(embeddings, queries, nPlanes, nTables), k)

  /** The multi-table candidate join (scored, pre-top-k) — also the
    * bench's candidate-volume probe (a `count` over it prunes the cos
    * projection, so it measures join volume only). */
  def lshMultiTableCandidates(
      embeddings: DataFrame, queries: DataFrame,
      nPlanes: Int = 6, nTables: Int = 8): DataFrame = {
    def bucketsOf(e: Column): Column = array(
      (0 until nTables).map(t =>
        graft.expressions.LshExpressions.float_lsh_bucket(e, nPlanes, t)): _*)
    def side(df: DataFrame): DataFrame = df
      .withColumn("buckets", bucketsOf(col("embedding")))
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("t", explode(sequence(lit(0), lit(nTables - 1))))
      .withColumn("bucket", element_at(col("buckets"), col("t") + 1))
    val cand = side(embeddings)
    val q = side(queries)
    val firstMatchingTable = array_position(
      zip_with(col("q.buckets"), col("c.buckets"), (a, b) => a === b), lit(true))
    cand.as("c")
      .join(broadcast(q.as("q")),
        col("q.t") === col("c.t") && col("q.bucket") === col("c.bucket") &&
          col("q.vec_id") =!= col("c.vec_id") &&
          firstMatchingTable === (col("q.t") + 1).cast("long"))
      .withColumn("cos",
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nCells` pivot
    * vectors partitions the corpus into cells; a query searches only
    * its `nProbe` nearest cells. The structure real vector stores use
    * at corpus scale — candidate volume ~ nProbe/nCells of the corpus,
    * and the cell id is an equi shuffle/join key, so the candidate
    * table can be WRITTEN partitioned by cell and probed without a
    * shuffle at all.
    *
    * Pivots are deterministic — the `nCells` lowest-vec_id embeddings
    * (a fixed, SQL-expressible choice the DuckDB oracle replicates;
    * k-means would drift per-run and be unverifiable). They are
    * collected to the driver ONCE (nCells rows — this is broadcast
    * metadata, not data rows) and baked in as a literal array, so cell
    * assignment is a pure SCAN-SIDE projection: cosine against each
    * pivot in input order, `array_position(cos, array_max(cos))` =
    * first-max argmax with the lowest-pivot tie-break — zero shuffle,
    * zero join, identical arithmetic (left-to-right double sums) to
    * the oracle's windowed row_number formulation.
    *
    * Query probe lists rank pivots by the same cosine with the same
    * tie-break (struct sort on (−cos, pivot)) and explode on the
    * BROADCAST side only. A candidate lives in exactly one cell and a
    * query's probes are distinct, so pairs are unique by construction
    * — no dedup anywhere. */
  def ivfTopK(
      embeddings: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 32, nProbe: Int = 4): DataFrame =
    topKPerQuery(ivfCandidates(embeddings, queries, nCells, nProbe), k)

  /** FITTED IVF pivots: spherical k-means over a deterministic sample,
    * run driver-side (the sample and the centroids are broadcast-scale
    * metadata — `sampleN` rows ≪ corpus — exactly like the collected
    * first-N pivots; the corpus itself is never touched beyond the one
    * sample top-k scan). Fixes the first-N pivot mode's weakness on
    * skewed corpora: arbitrary-row pivots give unbalanced cells — one
    * hot cell re-creates the quadratic blow-up `cellCap` then papers
    * over, and recall is pivot-quality-bound (0.675 isotropic at
    * sf0.1). Fitted pivots track the data's actual cluster structure
    * (bench: recall ≥ 0.97 at ≤ 3% candidates on the clustered corpus,
    * with the cell-occupancy histogram in-artifact).
    *
    * Deterministic end-to-end: the sample is the `sampleN` lowest
    * xxhash64(vec_id) rows (tie-broken on vec_id — a seeded permutation,
    * stable under partitioning), k-means++ seeding and Lloyd rounds run
    * a fixed `iters` count with `new Random(seed)`, ties in assignment
    * break to the lowest centroid index. Same run twice = same pivots,
    * so a fitted index is reproducible — but NOT SQL-replicable, which
    * is why the oracle queries stay on the first-N mode.
    *
    * Use with [[ivfTopKWith]] / [[assignCellsWith]]:
    * {{{
    *   val pivots = Similarity.fitIvfPivots(corpus, nCells = 256)
    *   Similarity.assignCellsWith(corpus, pivots)
    *     .write.partitionBy("cell").parquet(indexDir)   // pruned probes
    *   Similarity.ivfTopKWith(pivots, corpus, queries, k = 5)
    * }}} */
  def fitIvfPivots(embeddings: DataFrame, nCells: Int = 32,
      sampleN: Int = 8192, iters: Int = 15, seed: Long = 42L): Seq[Seq[Float]] = {
    val sample: Array[Array[Double]] = embeddings
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(sampleN)
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      .map { v => // unit-normalize; cos becomes a plain dot product
        val n = math.sqrt(v.map(x => x * x).sum)
        if (n > 0) v.map(_ / n) else v
      }
      .filter(_.exists(_ != 0.0))
    require(sample.length >= nCells,
      s"fitIvfPivots: sample ${sample.length} < nCells $nCells")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    def dot2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { s += a(i) * b(i); i += 1 }
      s
    }
    // k-means++ seeding on the unit sphere: D(x) = 1 - max-cos
    val centroids = new Array[Array[Double]](nCells)
    centroids(0) = sample(rnd.nextInt(sample.length))
    val bestCos = sample.map(dot2(_, centroids(0)))
    var c = 1
    while (c < nCells) {
      val weights = bestCos.map(bc => math.max(0.0, 1.0 - bc))
      val total = weights.sum
      val pick =
        if (total <= 0) rnd.nextInt(sample.length)
        else {
          var r = rnd.nextDouble() * total
          var i = 0
          while (i < sample.length - 1 && r >= weights(i)) { r -= weights(i); i += 1 }
          i
        }
      centroids(c) = sample(pick)
      var i = 0
      while (i < sample.length) {
        val d = dot2(sample(i), centroids(c))
        if (d > bestCos(i)) bestCos(i) = d
        i += 1
      }
      c += 1
    }
    // Lloyd rounds (fixed count — determinism over early exit)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](dim))
      val counts = new Array[Int](nCells)
      var i = 0
      while (i < sample.length) {
        var best = 0; var bestD = dot2(sample(i), centroids(0))
        var j = 1
        while (j < nCells) {
          val d = dot2(sample(i), centroids(j))
          if (d > bestD) { bestD = d; best = j } // ties keep the lower j
          j += 1
        }
        val s = sums(best); val v = sample(i)
        var k = 0
        while (k < dim) { s(k) += v(k); k += 1 }
        counts(best) += 1
        i += 1
      }
      var j = 0
      while (j < nCells) {
        if (counts(j) > 0) {
          val s = sums(j)
          val n = math.sqrt(dot2(s, s))
          if (n > 0) centroids(j) = s.map(_ / n)
        } // empty cell keeps its seed — deterministic, next round may refill
        j += 1
      }
      it += 1
    }
    centroids.toSeq.map(_.toSeq.map(_.toFloat))
  }

  /** Scan-side cell assignment against an EXPLICIT pivot set (fitted or
    * otherwise) — same zero-shuffle argmax projection as
    * [[assignIvfCells]], same storage-partitioning use. */
  def assignCellsWith(df: DataFrame, pivots: Seq[Seq[Float]]): DataFrame =
    assignCells(df, pivots)

  /** IVF top-k against an explicit pivot set — [[ivfTopK]] with the
    * quantizer decoupled from the corpus (the fitted-pivot path, and
    * the path a PERSISTED cell-partitioned index probes through). */
  def ivfTopKWith(pivots: Seq[Seq[Float]], embeddings: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int = 4): DataFrame =
    topKPerQuery(ivfCandidatesWith(pivots, embeddings, queries, nProbe), k)

  /** The candidate join for [[ivfTopKWith]] (scored, pre-top-k). */
  def ivfCandidatesWith(pivots: Seq[Seq[Float]], embeddings: DataFrame,
      queries: DataFrame, nProbe: Int = 4): DataFrame = {
    val cand = assignCells(embeddings, pivots)
    val q = probeCells(queries, pivots, pivots.length, nProbe)
    cand.as("c")
      .join(broadcast(q.as("q")),
        col("q.cell") === col("c.cell") && col("q.vec_id") =!= col("c.vec_id"))
      .withColumn("cos",
        round(dot(col("q.embedding"), col("c.embedding")) /
          (col("q.nrm") * col("c.nrm")), 6))
  }

  /** The deterministic pivot set: the `nCells` lowest-vec_id
    * embeddings, collected once (broadcast metadata, not data rows). */
  private def ivfPivots(embeddings: DataFrame, nCells: Int): Seq[Seq[Float]] = {
    val pivotRows = embeddings
      .filter(col("vec_id") < nCells)
      .orderBy("vec_id")
      .select("embedding")
      .collect()
      .map(_.getSeq[Float](0))
      .toSeq
    require(pivotRows.length == nCells,
      s"IVF needs vec_ids 0..${nCells - 1} as pivots, found ${pivotRows.length}")
    pivotRows
  }

  /** Cosine of `e` against every pivot, in pivot order (double
    * arithmetic end-to-end: FloatDot accumulates left-to-right).
    * r6: the row norm is passed IN as a column (no CSE inside lambdas —
    * `norm(e)` in the lambda re-ran FloatDot(e,e)+sqrt once per pivot),
    * and pivot norms are precomputed driver-side with the IDENTICAL
    * left-to-right double accumulation, so every division sees the
    * same doubles as before. */
  private def pivotCos(pivots: Seq[Seq[Float]], e: Column, nrmE: Column): Column = {
    val pivotLit = typedLit(pivots)
    val normsLit = typedLit(pivots.map { p =>
      var s = 0.0
      var i = 0
      while (i < p.length) { s += p(i).toDouble * p(i).toDouble; i += 1 }
      math.sqrt(s)
    })
    zip_with(pivotLit, normsLit, (p, np) => dot(e, p) / (nrmE * np))
  }

  /** Scan-side IVF cell assignment: adds `cell` (argmax-cosine pivot,
    * first-max tie-break) and `nrm` to `df` — zero shuffle, zero join.
    * Public because the cell is also the STORAGE partition key of the
    * 100-TB layout: `assignIvfCells(e, n).write.partitionBy("cell")`
    * makes every probe a partition-pruned scan (spec-pinned). */
  def assignIvfCells(embeddings: DataFrame, nCells: Int = 32): DataFrame =
    assignCells(embeddings, ivfPivots(embeddings, nCells))

  private def assignCells(df: DataFrame, pivots: Seq[Seq[Float]]): DataFrame = df
    .withColumn("nrm", norm(col("embedding")))
    .withColumn("pcos", pivotCos(pivots, col("embedding"), col("nrm")))
    .withColumn("cell",
      (array_position(col("pcos"), array_max(col("pcos"))) - 1).cast("int"))
    .drop("pcos")

  /** Query probe cells: each query row exploded to its `nProbe`
    * highest-cosine pivots (struct sort on (−cos, pivot) ascending ==
    * cos DESC, pivot ASC — same tie-break as the cell argmax). */
  def ivfProbes(embeddings: DataFrame, queries: DataFrame,
      nCells: Int = 32, nProbe: Int = 4): DataFrame =
    probeCells(queries, ivfPivots(embeddings, nCells), nCells, nProbe)

  private def probeCells(queries: DataFrame, pivots: Seq[Seq[Float]],
      nCells: Int, nProbe: Int): DataFrame = {
    val probeStructs = sort_array(zip_with(
      col("pcos"), sequence(lit(0), lit(nCells - 1)),
      (c, i) => struct((-c).as("negcos"), i.as("pivot"))))
    queries
      .withColumn("nrm", norm(col("embedding")))
      .withColumn("pcos", pivotCos(pivots, col("embedding"), col("nrm")))
      .withColumn("cell",
        explode(transform(slice(probeStructs, 1, nProbe), s => s.getField("pivot"))))
      .drop("pcos")
  }

  /** SemDeDup-style semantic near-duplicate pairs: the IVF coarse
    * quantizer assigns every embedding to a cell (scan-side argmax —
    * zero shuffle), then exact cosine pairs are computed only WITHIN a
    * cell by reusing `cosinePairs` with the cell as the blocking
    * label — so the hot-cell block join (sub-cell splitting at
    * `cellCap`) guards the quadratic blowup here too. Cross-cell
    * near-dups are missed by construction (the recall/cost dial is
    * `nCells`): pair volume is ~1/nCells of all-pairs, and every
    * shuffle keys on the cell — at 100 TB the corpus can be STORED
    * partitioned by cell (`assignIvfCells(...).write.partitionBy`)
    * and this join runs per-partition with no exchange at all. */
  def semanticPairs(embeddings: DataFrame, threshold: Double,
      nCells: Int = 32, cellCap: Int = 4096): DataFrame =
    cosinePairs(
      assignIvfCells(embeddings, nCells)
        .select(col("vec_id"), col("cell").as("label"), col("embedding")),
      threshold, cellCap)

  /** Semantic dedup resolved to per-cluster representatives: connected
    * components over the semantic pair graph (same large-star/
    * small-star machinery as text dedup), `keep` = the cluster's min
    * vec_id and every unpaired embedding. `reliable=true` routes the
    * component rounds' lineage truncation to the session checkpoint
    * dir (durable on a cluster) instead of `localCheckpoint`. */
  def semanticSurvivors(embeddings: DataFrame, threshold: Double,
      nCells: Int = 32, cellCap: Int = 4096,
      reliable: Boolean = false): DataFrame =
    DedupGraph.survivors(
      embeddings.select(col("vec_id").as("doc_id")),
      semanticPairs(embeddings, threshold, nCells, cellCap)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")),
      reliable = reliable)
      .select(col("doc_id").as("vec_id"), col("component"), col("keep"))

  /** The IVF candidate join (scored, pre-top-k) — shared by the top-k
    * op and the bench's candidate-volume probe. A candidate lives in
    * exactly one cell and a query's probes are distinct, so pairs are
    * unique by construction — no dedup anywhere. */
  def ivfCandidates(
      embeddings: DataFrame, queries: DataFrame,
      nCells: Int = 32, nProbe: Int = 4): DataFrame =
    ivfCandidatesWith(ivfPivots(embeddings, nCells), embeddings, queries, nProbe)
}
