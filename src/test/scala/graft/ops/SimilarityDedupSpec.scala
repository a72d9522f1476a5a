package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-path identities for the similarity/dedup ops: each optimized
  * plan (hot-cell block join, prefix-filtered Jaccard, per-JVM LSH sign
  * matrix) must produce byte-identical results to its naive
  * formulation — the optimizations change partitioning and candidate
  * volume, never output.
  */
class SimilarityDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embeddings = {
    // one HOT label (0: 60 rows) + cold labels; deterministic vectors
    val rows = (0L until 100L).map { id =>
      val label = if (id < 60) 0L else id % 5 + 1
      val vec = Array.tabulate(8)(i =>
        (math.sin(id * 31 + i * 7) + (if (i == (id % 8).toInt) 2.0 else 0.0)).toFloat)
      (id, label, vec)
    }
    rows.toDF("vec_id", "label", "embedding")
  }

  test("cosinePairs: hot-label block join ≡ plain within-label join") {
    val blocked = Similarity.cosinePairs(embeddings, 0.3, cellCap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Similarity.cosinePairs(embeddings, 0.3, cellCap = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(blocked.nonEmpty)
    assert(blocked == plain)
    // hot label forces g = ceil(60/8) = 8 sub-cells; a cross-sub-cell
    // pair must exist in the output for the block scheme to be exercised
    val g = 8
    assert(blocked.exists { case (a, b, _) => a < 60 && b < 60 && a % g != b % g })
  }

  test("ngramJaccardPairs: prefix-filtered join ≡ naive all-pairs Jaccard") {
    val docs = Seq(
      // near-dup cluster sharing a hot shingle run
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      // hot stopword shingle "a b c" shared by many unrelated docs
      (4L, "a b c x1 y1 z1 w1"),
      (5L, "a b c x2 y2 z2 w2"),
      (6L, "a b c x3 y3 z3 w3"),
      (7L, "a b c x4 y4 z4 w4"),
      (8L, "completely different text with nothing shared here at all"),
      (9L, "completely different text with nothing shared here at all"),
      (10L, "short doc")
    ).toDF("doc_id", "text")
    val threshold = 0.5
    val got = TextDedup.ngramJaccardPairs(docs, threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // naive oracle: exact Jaccard over all doc pairs in plain Scala
    val sets = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> graft.functions.TextKernels.shingles3(t).toSet }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= threshold
    } yield (ia, ib, math.round(j * 10000) / 10000.0)).toSet
    assert(want.nonEmpty)
    assert(got == want)

    // the hot shingle must not inflate candidates: 4..7 pairwise share
    // only "a b c" (J = 1/11 < t), so none of those 6 pairs may appear
    assert(!got.exists { case (a, b, _) => a >= 4 && a <= 7 && b >= 4 && b <= 7 })
  }

  test("jaccardCandidatePairs: prefix filter prunes hot-shingle pairs but keeps all matches") {
    val docs = ((1L to 40L).map(i => (i, s"a b c unique$i only$i words$i here$i")) ++
      Seq((100L, "x y z p q r s t u v"), (101L, "x y z p q r s t u v extra"))
      ).toDF("doc_id", "text")
    val cands = TextDedup.jaccardCandidatePairs(docs, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the true near-dup pair survives pruning
    assert(cands.contains((100L, 101L)))
    // the 40 docs sharing only hot "a b c" generate zero candidates:
    // frequency-ascending order puts the hot shingle outside every
    // prefix (p = 8 − ⌈0.8·8⌉ + 1 = 2 of 8 shingles)
    assert(!cands.exists { case (a, b) => a <= 40 && b <= 40 })
  }

  test("multi-probe LSH: recall ≥ single-bucket LSH, both measured against brute force") {
    val emb = embeddings.withColumn("emb64",
      concat(col("embedding"), array_repeat(lit(0.0f), 56)).cast("array<float>"))
      .select(col("vec_id"), col("emb64").as("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
    def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = resultSet(Similarity.bruteForceTopK(emb, queries, 5))
    val single = resultSet(Similarity.lshTopK(emb, queries, 5))
    val multi = resultSet(Similarity.lshTopKMultiProbe(emb, queries, 5))
    val recallSingle = (single & brute).size.toDouble / brute.size
    val recallMulti = (multi & brute).size.toDouble / brute.size
    assert(recallMulti >= recallSingle,
      s"multi-probe recall $recallMulti < single-bucket $recallSingle")
    // superset candidates → per-query result count can only grow
    assert(multi.size >= single.size)
  }

  private def resultPairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("multi-table LSH: independent sign matrices, unique pairs, recall ≥ single-table") {
    import graft.expressions.LshExpressions
    // table 0 must be the legacy seed recipe; table > 0 independent
    assert(LshExpressions.signs(6, 64, 0).sameElements(LshExpressions.signs(6, 64)))
    assert(!LshExpressions.signs(6, 64, 1).sameElements(LshExpressions.signs(6, 64, 0)))
    assert(!LshExpressions.signs(6, 64, 2).sameElements(LshExpressions.signs(6, 64, 1)))

    val emb = embeddings.withColumn("emb64",
      concat(col("embedding"), array_repeat(lit(0.0f), 56)).cast("array<float>"))
      .select(col("vec_id"), col("emb64").as("embedding"))
    val queries = emb.filter(col("vec_id") < 10)
    val brute = resultPairs(Similarity.bruteForceTopK(emb, queries, 5)).toSet
    val single = resultPairs(Similarity.lshTopK(emb, queries, 5, nPlanes = 6)).toSet
    val multiSeq = resultPairs(Similarity.lshTopKMultiTable(emb, queries, 5))
    // first-matching-table join residual: a pair colliding in several
    // tables must still surface exactly once
    assert(multiSeq.size == multiSeq.toSet.size, "duplicate (query, candidate) pairs")
    val multi = multiSeq.toSet
    // table 0 of the OR-construction IS the single-table recipe at the
    // same nPlanes, so candidates are a superset → recall can only grow
    val recallSingle = (single & brute).size.toDouble / brute.size
    val recallMulti = (multi & brute).size.toDouble / brute.size
    assert(recallMulti >= recallSingle,
      s"multi-table recall $recallMulti < single-table $recallSingle")
    assert(multi.size >= single.size)
  }

  test("planted-neighbor recall: multi-table LSH and IVF recover clustered neighbors") {
    // 8 well-separated clusters of 32 points each; true top-5 neighbors
    // are in-cluster (cos ≈ 0.99 vs ≲ 0.3 across clusters). This is the
    // regime real embedding corpora live in — recall here is the
    // meaningful figure, unlike the isotropic bench embeddings.
    val nClusters = 8
    val rows = (0L until 256L).map { id =>
      val c = (id % nClusters).toInt
      val vec = Array.tabulate(64)(i =>
        (math.sin(c * 101 + i * 13) + 0.05 * math.sin(id * 31 + i * 7)).toFloat)
      (id, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = resultPairs(Similarity.bruteForceTopK(emb, queries, 5)).toSet
    val multi = resultPairs(Similarity.lshTopKMultiTable(emb, queries, 5)).toSet
    val ivfSeq = resultPairs(Similarity.ivfTopK(emb, queries, 5))
    assert(ivfSeq.size == ivfSeq.toSet.size, "IVF produced duplicate pairs")
    val ivf = ivfSeq.toSet
    val recallMulti = (multi & brute).size.toDouble / brute.size
    val recallIvf = (ivf & brute).size.toDouble / brute.size
    assert(recallMulti >= 0.8, s"multi-table recall on clustered data: $recallMulti")
    assert(recallIvf >= 0.8, s"IVF recall on clustered data: $recallIvf")
  }

  test("fitted IVF pivots: deterministic, balanced cells, high recall, decoupled quantizer") {
    // same clustered regime as the planted-neighbor test: k-means with
    // k = nClusters should place one pivot per true cluster
    val nClusters = 8
    val rows = (0L until 256L).map { id =>
      val c = (id % nClusters).toInt
      val vec = Array.tabulate(64)(i =>
        (math.sin(c * 101 + i * 13) + 0.05 * math.sin(id * 31 + i * 7)).toFloat)
      (id, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val p1 = Similarity.fitIvfPivots(emb, nCells = nClusters, sampleN = 256)
    val p2 = Similarity.fitIvfPivots(emb, nCells = nClusters, sampleN = 256)
    assert(p1 == p2, "fitIvfPivots is not deterministic across runs")
    // balance: the first-N mode's weakness is exactly the unbalanced
    // cell — fitted pivots on 8 equal clusters must split 256 rows into
    // 8 equal cells
    val occ = Similarity.assignCellsWith(emb, p1)
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(occ.size == nClusters, s"expected $nClusters occupied cells: $occ")
    assert(occ.values.max == 256L / nClusters, s"unbalanced cells: $occ")
    // recall at MINIMAL probe width: one pivot per cluster means
    // nProbe=1 already contains every true neighbor
    val queries = emb.filter(col("vec_id") < 8)
    val brute = resultPairs(Similarity.bruteForceTopK(emb, queries, 5)).toSet
    val fitted = resultPairs(
      Similarity.ivfTopKWith(p1, emb, queries, 5, nProbe = 1)).toSet
    val recall = (fitted & brute).size.toDouble / brute.size
    assert(recall >= 0.95, s"fitted-pivot recall at nProbe=1: $recall")
    // decoupled quantizer: ivfTopKWith on the explicit first-N pivot
    // set ≡ ivfTopK's internal first-N mode (the oracle-pinned path)
    val firstN = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect().map(_.getSeq[Float](0)).toSeq
    assert(resultPairs(Similarity.ivfTopKWith(firstN, emb, queries, 5)) ==
      resultPairs(Similarity.ivfTopK(emb, queries, 5, nCells = 16)))
  }

  test("IVF cells as storage partition keys: probe reads only probed partitions") {
    // the 100-TB layout claim made concrete: write the corpus
    // partitioned by its IVF cell, probe one query's cells, and the
    // scan must PRUNE to those partitions — no full-table read
    val nClusters = 8
    val rows = (0L until 256L).map { id =>
      val c = (id % nClusters).toInt
      val vec = Array.tabulate(64)(i =>
        (math.sin(c * 101 + i * 13) + 0.05 * math.sin(id * 31 + i * 7)).toFloat)
      (id, vec)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val nCells = 16
    val dir = java.nio.file.Files.createTempDirectory("graftivf").toString + "/t"
    Similarity.assignIvfCells(emb, nCells)
      .write.partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
    val queries = emb.filter(col("vec_id") === 3L)
    val probeCellIds = Similarity.ivfProbes(emb, queries, nCells, nProbe = 4)
      .select("cell").collect().map(_.getInt(0)).toSeq
    assert(probeCellIds.size == 4)
    val probed = stored.filter(col("cell").isin(probeCellIds: _*))
    // partition pruning: the EXECUTED scan must touch only the probed
    // cells' files (inputFiles ignores pruning — read the scan metric)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
      // execute THIS df's plan (df.count() would spawn a separate
      // QueryExecution and leave these metrics untouched)
      df.collect()
      def find(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case a: AdaptiveSparkPlanExec => find(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => find(q.plan)
        case s: FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(find)
      }
      find(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    }
    val allFiles = scanFiles(stored)
    val probedFiles = scanFiles(probed)
    val cellsOnDisk = new java.io.File(dir).listFiles().count(_.getName.startsWith("cell="))
    assert(cellsOnDisk > 4, s"generator produced only $cellsOnDisk cells (premise)")
    assert(probedFiles < allFiles,
      s"probe read $probedFiles of $allFiles files — no partition pruning")
    // and the pruned read yields exactly the in-memory candidate set
    val wantCand = Similarity.ivfCandidates(emb, queries, nCells, nProbe = 4)
      .select(col("c.vec_id")).collect().map(_.getLong(0)).toSet
    val gotCand = probed.filter(col("vec_id") =!= 3L)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotCand == wantCand)
  }

  test("simhashPairs: banded join ≡ quadratic all-pairs Hamming scan") {
    // near-dup cluster (tiny token edits → small Hamming) + unrelated docs
    val docs = (Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      // same distinct-token set as doc 1, reordered → identical simhash
      (2L, "today the lazy dog jumps over the quick brown fox again and again"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "completely unrelated text about distributed query processing engines"),
      (5L, "another body of prose concerning streaming watermark semantics")
    ) ++ (6L to 30L).map(i => (i, s"filler document number $i with token$i salt$i")))
      .toDF("doc_id", "text")
    val maxH = 3
    val got = TextDedup.simhashPairs(docs, maxHamming = maxH)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = TextDedup.simhashLong(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= maxH
    } yield (ia, ib, h)).toSet
    assert(want.nonEmpty, "fixture must contain at least one close pair")
    assert(got == want)
    // and the banding premise holds: a found pair differs in >0 bands' worth
    // of positions only when within budget
    assert(got.forall(_._3 <= maxH))
  }

  test("dupSpanFraction ≡ naive positional n-gram cross-doc scan") {
    val n = 4
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),            // grams at pos 1..3
      (2L, "w1 w2 w3 w4 zz yy"),            // shares gram (w1..w4) with doc 1
      (3L, "a b c a b c a b c a"),          // internal repeats, no cross-doc
      (4L, "only three toks"),              // < n tokens → no rows
      (5L, "w3 w4 w5 w6 tail1 tail2")       // shares (w3..w6) with doc 1
    ).toDF("doc_id", "text")
    val got = TextDedup.dupSpanFraction(docs, n)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // naive oracle in plain Scala over the same whitespace tokens
    val grams = docs.as[(Long, String)].collect().map { case (id, t) =>
      val w = graft.functions.TextKernels.words(t)
      id -> (0 to w.length - n).map(i => w.slice(i, i + n).mkString(" "))
    }.toMap
    val docsPerGram = grams.toSeq.flatMap { case (id, gs) => gs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.size }
    val want = grams.collect { case (id, gs) if gs.nonEmpty =>
      val dup = gs.count(g => docsPerGram(g) >= 2).toLong
      id -> ((gs.size.toLong, dup, math.round(dup.toDouble / gs.size * 10000) / 10000.0))
    }
    assert(want.nonEmpty)
    assert(got == want)
    assert(!got.contains(4L), "docs shorter than n grams produce no row")
    assert(got(3L)._2 == 0L, "within-doc repeats alone are not cross-doc dups")
    assert(got(1L)._2 == 2L, "doc 1 shares one gram with doc 2 and one with doc 5")
  }

  test("text repetition: top-token and top-bigram fractions") {
    val docs = Seq(
      (1L, "a a a b"),       // top token a×3; bigrams: (a a)×2, (a b)×1
      (2L, "x"),             // single token → no bigrams
      (3L, "p q p q p")      // top token p×3; bigrams (p q)×2, (q p)×2
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got(1L) == ((4L, 3L, 2L, 0.75, 0.6667)))
    assert(got(2L) == ((1L, 1L, 0L, 1.0, 0.0)))
    assert(got(3L) == ((5L, 3L, 2L, 0.6, 0.5)))
  }

  test("FloatLshBucket kernel ≡ declarative md5 plane-sign formulation") {
    val df = embeddings.limit(20)
      .withColumn("emb64",
        concat(col("embedding"),
          array_repeat(lit(0.0f), 56)).cast("array<float>"))
    def planeSignDecl(plane: Int, dim: org.apache.spark.sql.Column) = {
      val h = md5(concat(lit(s"plane$plane|"), dim.cast("string")))
      when(conv(substring(h, 1, 1), 16, 10).cast("int") >= 8, 1.0).otherwise(-1.0)
    }
    val declBucket = (0 until 8).map { p =>
      val proj = aggregate(
        zip_with(col("emb64"),
          transform(sequence(lit(0), lit(63)), i => planeSignDecl(p, i)),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, 1 << p).otherwise(0): org.apache.spark.sql.Column
    }.reduce(_ + _)
    val rows = df.select(
      Similarity.lshBucket(col("emb64"), 8).as("kernel"),
      declBucket.as("decl")
    ).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  // clusters of 4 near-identical docs so LSH bands collide
  private def clusterDocs(ids: Seq[Long]) = ids.map { id =>
    val cluster = (id - 1) / 4
    val words = (0 until 12).map(w => s"c${cluster}w$w").updated(
      (id % 4).toInt, s"var$id")
    (id, words.mkString(" "))
  }.toDF("doc_id", "text")

  test("incrementalMinhashPairs ≡ cross-side slice of the full self-join") {
    val docs = clusterDocs(1L to 40L)
    val isNew = (id: Long) => id % 2 == 0
    val newDocs = docs.filter(col("doc_id") % 2 === 0)
    val oldDocs = docs.filter(col("doc_id") % 2 === 1)

    val inc = TextDedup.incrementalMinhashPairs(
      newDocs, TextDedup.minhashBandRows(oldDocs))
      .as[(Long, Long, Long)].collect()
      .map { case (n, o, c) => (n, o) -> c }.toMap

    val full = TextDedup.minhashCandidatePairs(docs)
      .as[(Long, Long, Long)].collect()
    val crossWant = full.collect {
      case (a, b, c) if isNew(a) && !isNew(b) => (a, b) -> c
      case (a, b, c) if !isNew(a) && isNew(b) => (b, a) -> c
    }.toMap
    assert(inc.nonEmpty)
    assert(inc == crossWant)
  }

  test("incremental minhash vs a BUCKETED band index: index side loses its Exchange") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      def walk(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeLike => 1 + s.children.map(walk).sum
        case other => other.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    val corpus = clusterDocs(1L to 80L)
    // fresh doc_ids, texts duplicating corpus clusters 0-1 → pairs exist
    val batch = clusterDocs(1L to 8L).withColumn("doc_id", col("doc_id") + 1000L)

    val plainDir = tmpDir("bandidx_plain")
    graft.ops.TextDedup.minhashBandRows(corpus).write.mode("overwrite").parquet(plainDir)
    val mirror = new graft.tables.BucketedMirror(spark, tmpDir("bandidx"),
      "band_idx_spec", buckets = 4, keys = Seq("band", "band_hash"),
      schemaDdl = "doc_id BIGINT, band INT, band_hash STRING")
    mirror.refresh(graft.ops.TextDedup.minhashBandRows(corpus), v = 1)

    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // force the sort-merge path: this is the shape where the stored
      // index's declared bucketing matters (a broadcast batch never
      // shuffles the index side to begin with)
      val viaPlain = graft.ops.TextDedup.incrementalMinhashPairs(
        batch, spark.read.parquet(plainDir))
      val viaBucketed = graft.ops.TextDedup.incrementalMinhashPairs(
        batch, mirror.table())
      val plainPairs = viaPlain.as[(Long, Long, Long)].collect().toSet
      val bucketedPairs = viaBucketed.as[(Long, Long, Long)].collect().toSet
      assert(plainPairs.nonEmpty && bucketedPairs == plainPairs)
      // plain: batch signature agg + batch-side join exchange +
      // index-side join exchange + final agg = 4; bucketed: the index
      // side reads in place
      val nPlain = shuffles(viaPlain)
      val nBucketed = shuffles(viaBucketed)
      assert(nPlain == 4, s"plain-path plan changed shape: $nPlain shuffles")
      assert(nBucketed == nPlain - 1,
        s"bucketed index still shuffles: $nBucketed vs plain $nPlain")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  test("incrementalExactSurvivors: batch self-dedup plus corpus anti-join") {
    val corpus = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta"),   // exists in corpus → dropped
      (11L, "fresh text a"), // unique → kept
      (12L, "fresh text b"), // dup pair within batch → 12 kept
      (13L, "fresh text b")
    ).toDF("doc_id", "text")
    val got = TextDedup.incrementalExactSurvivors(batch, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(got == Set(11L, 12L))
  }

  // SemDeDup fixture: 100 base vectors + planted exact-direction copies
  // (scaled — cosine is scale-invariant, so copies share the argmax
  // cell by construction). vec_ids 0..7 are the IVF pivots.
  private lazy val semEmbeddings = {
    def base(id: Long) = Array.tabulate(16)(i =>
      math.sin(id * 17 + i * 3).toFloat)
    val planted = Seq(
      200L -> base(50).map(_ * 2.0f),   // cluster {50, 200, 201}
      201L -> base(50).map(_ * 0.5f),
      210L -> base(60).map(_ * 3.0f))   // cluster {60, 210}
    ((0L until 100L).map(id => (id, base(id))) ++ planted)
      .toDF("vec_id", "embedding")
  }

  test("semanticPairs ≡ within-cell all-pairs cosine; copies land in one cell") {
    val n = 8
    val cells = Similarity.assignIvfCells(semEmbeddings, n)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(200L) == cells(50L) && cells(201L) == cells(50L))
    assert(cells(210L) == cells(60L))

    val got = Similarity.semanticPairs(semEmbeddings, 0.999, n)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

    // scalar oracle: same-cell pairs with exact cosine ≥ threshold
    val vecs = semEmbeddings.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val idsSorted = vecs.keys.toSeq.sorted
    val want = (for {
      a <- idsSorted; b <- idsSorted
      if a < b && cells(a) == cells(b) && cos(vecs(a), vecs(b)) >= 0.999
    } yield (a, b)).toSet
    assert(got == want)
    assert(got.contains((50L, 200L)) && got.contains((50L, 201L)) &&
      got.contains((200L, 201L)) && got.contains((60L, 210L)))
  }

  test("semanticSurvivors ≡ union-find over the scalar pair oracle") {
    val rows = Similarity.semanticSurvivors(semEmbeddings, 0.999, 8)
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == semEmbeddings.count())
    val byId = rows.map(r => r._1 -> ((r._2, r._3))).toMap

    // scalar oracle: same-cell cosine pairs → union-find components
    val cells = Similarity.assignIvfCells(semEmbeddings, 8)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    val vecs = semEmbeddings.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val idsSorted = vecs.keys.toSeq.sorted
    val pairs = for {
      a <- idsSorted; b <- idsSorted
      if a < b && cells(a) == cells(b) && cos(vecs(a), vecs(b)) >= 0.999
    } yield (a, b)
    val parent = scala.collection.mutable.Map(idsSorted.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    idsSorted.foreach { id =>
      val comp = find(id)
      val keep = !paired(id) || id == comp
      assert(byId(id) == ((comp, keep)), s"vec $id")
    }
    // the planted copies collapse onto base 50's / base 60's components
    assert(byId(200L) == byId(201L) && !byId(200L)._2 && !byId(201L)._2)
    assert(byId(210L)._1 == byId(60L)._1 && !byId(210L)._2)
  }
}
