package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Decontamination + corpus-build pipeline, pinned against scalar
  * Scala oracles on planted fixtures (the DuckDB oracle covers the
  * same ops at sf scale; these pin the SEMANTICS: which docs get
  * flagged, pipeline stage order, keeper-vs-duplicate fate).
  */
class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  /** Same md5-bucket as Sampling.hashBucket, computed in scalar Scala. */
  private def bucket(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(2).map(b => f"$b%02x").mkString
    Integer.parseInt(hex, 16) % 100
  }

  private def shingles(text: String): Set[String] = {
    val w = text.split(" ").filter(_.nonEmpty)
    if (w.length < 3) Set.empty
    else w.sliding(3).map(_.mkString(" ")).toSet
  }

  // role-cast ids: benchmark = bucket >= 98, the rest train-side
  private val ids = (0L until 600L)
  private val benchIds = ids.filter(bucket(_) >= 98)
  private val trainIds = ids.filter(bucket(_) < 98)

  test("decontaminate flags exactly the docs sharing a shingle with the bench slice") {
    assert(benchIds.nonEmpty, "fixture needs at least one benchmark id")
    val bench0 = benchIds.head
    // planted: first two train docs copy a 3-gram from bench0's text
    val benchText = s"secret eval answer b$bench0 unique"
    val hit1 = trainIds(0) // shares "secret eval answer"
    val hit2 = trainIds(1) // shares two bench shingles
    val docs = ids.map { id =>
      val text =
        if (id == bench0) benchText
        else if (benchIds.contains(id)) s"bench only b$id words here"
        else if (id == hit1) s"intro secret eval answer outro t$id"
        else if (id == hit2) s"secret eval answer b$bench0 t$id"
        else s"clean doc t$id alpha beta gamma"
      (id, text)
    }.toDF("doc_id", "text")

    val got = CorpusPipeline.decontaminate(docs, benchPct = 2, minHits = 1)
      .as[(Long, Long)].collect().toMap

    // scalar oracle over the same fixture
    val all = docs.as[(Long, String)].collect().toMap
    val benchSh = benchIds.flatMap(id => shingles(all(id))).toSet
    val want = trainIds.map { id =>
      id -> shingles(all(id)).count(benchSh.contains)
    }.filter(_._2 >= 1).toMap
    assert(got == want.map { case (k, v) => k -> v.toLong })
    assert(got.contains(hit1) && got.contains(hit2))
    assert(got(hit2) >= got(hit1))
  }

  test("corpusBuild applies gates, dedup, decontamination, and split in pipeline order") {
    assert(benchIds.nonEmpty)
    val bench0 = benchIds.head
    // bench text shares the stopword head so the RATIO rule is
    // exercised: the planted pair overlaps 7/8 of its shingles (≥0.5,
    // flagged) while ordinary en(id) docs overlap 3/8 (clean)
    val benchText = s"the a of and to held out probe x$bench0 y"
    // quality-passing base: 10 tokens, 5 en stopwords → quality exactly 0.3
    def en(id: Long) = s"the a of and to w$id x$id y$id z$id q$id"
    val short = trainIds(0)              // fails minTokens
    val de = trainIds(1)                 // fails language gate
    val dupKeep = trainIds(2)            // duplicate pair: min id kept
    val dupDrop = trainIds(3)
    require(dupKeep < dupDrop)
    val contamKeep = trainIds(4)         // contaminated keeper of a dup pair
    val contamDup = trainIds(5)          // its duplicate — must stay dropped too
    require(contamKeep < contamDup)
    val docs = ids.map { id =>
      val text =
        if (benchIds.contains(id)) benchText
        else if (id == short) "w x"
        else if (id == de) s"der die das und ist w$id x$id y$id z$id q$id"
        else if (id == dupKeep || id == dupDrop) en(dupKeep)
        else if (id == contamKeep || id == contamDup)
          s"the a of and to held out probe x$bench0 c"
        else en(id)
      (id, text)
    }.toDF("doc_id", "text")

    val got = CorpusPipeline.corpusBuild(docs, benchPct = 2)
      .as[(Long, String)].collect().toMap

    // excluded: bench slice, gate failures, dup loser, contaminated pair
    assert(benchIds.forall(!got.contains(_)))
    assert(!got.contains(short) && !got.contains(de))
    assert(got.contains(dupKeep) && !got.contains(dupDrop))
    assert(!got.contains(contamKeep) && !got.contains(contamDup))
    // everyone else survives with the hash split
    val expectSurvivors = trainIds.toSet --
      Set(short, de, dupDrop, contamKeep, contamDup)
    assert(got.keySet == expectSurvivors)
    got.foreach { case (id, split) =>
      val b = bucket(id)
      val want = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(split == want, s"doc $id bucket $b")
    }
  }

  test("corpusBuild fused plan: one window, zero joins; probeKeepersOnly is a no-op ≡") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def count(df: org.apache.spark.sql.DataFrame)(pred: SparkPlan => Boolean): Int = {
      df.collect()
      def walk(p: SparkPlan): Int = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case other => (if (pred(other)) 1 else 0) + other.children.map(walk).sum
      }
      walk(df.queryExecution.executedPlan)
    }
    def en(id: Long) = s"the a of and to w$id x$id y$id z$id q$id"
    // one dup pair (keeper restriction does real work) AND one
    // contaminated doc, so every pipeline stage has live rows
    val bench0 = benchIds.head
    val benchText = s"the a of and to held out probe x$bench0 y"
    val docs = ids.map { id =>
      val text =
        if (benchIds.contains(id)) benchText
        else if (id == trainIds(1)) en(trainIds(0))
        else if (id == trainIds(2)) s"the a of and to held out probe x$bench0 c"
        else en(id)
      (id, text)
    }.toDF("doc_id", "text")
    val fast = CorpusPipeline.corpusBuild(docs)
    val keeper = CorpusPipeline.corpusBuild(docs, probeKeepersOnly = true)
    // r6 fused pipeline: gates + contamination probe run inside ONE
    // typed scan pass (broadcast bench-shingle hash set), so the plan
    // holds exactly the dedup window's corpus exchange and NO join at
    // all — the old probe branch (scan → explode → broadcast join →
    // agg → left_anti) is gone, and with it the probe-side cost choice
    // probeKeepersOnly used to toggle (kept as a no-op for source
    // compatibility; outputs are identical by the shared-text argument).
    assert(count(fast)(_.isInstanceOf[WindowExec]) == 1)
    assert(count(fast)(p => p.isInstanceOf[BaseJoinExec] ||
      p.isInstanceOf[BroadcastNestedLoopJoinExec]) == 0)
    val a = fast.as[(Long, String)].collect().sortBy(_._1).toSeq
    val b = keeper.as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("corpusBuildNearDup resolves minhash clusters among the exact survivors") {
    // reuse the corpusBuild fixture shape, plus a planted NEAR-dup pair
    // (distinct texts, shared 12-word tail → LSH bands collide)
    val bench0 = benchIds.head
    def en(id: Long) = s"the a of and to w$id x$id y$id z$id q$id"
    // 31 tokens (10 stopwords → quality 0.316 passes the 0.3 gate);
    // the pair differs only in the final token → J = 27/29, so the
    // 4×4 LSH banding collides (deterministic: md5-seeded hashes)
    def near(v: String) =
      "the a of and to the of a and to " +
        (1 to 20).map(j => s"shr$j").mkString(" ") + s" $v"
    val nearA = trainIds(6)
    val nearB = trainIds(7)
    val docs = ids.map { id =>
      val text =
        if (benchIds.contains(id)) s"held out probe x$bench0 y z"
        else if (id == nearA) near("alpha")
        else if (id == nearB) near("beta")
        else en(id)
      (id, text)
    }.toDF("doc_id", "text")

    val base = CorpusPipeline.corpusBuild(docs, benchPct = 2)
      .as[(Long, String)].collect().toMap
    val got = CorpusPipeline.corpusBuildNearDup(docs, benchPct = 2)
      .as[(Long, String)].collect().toMap

    // expected: base minus the non-keeper of every minhash component
    // among base survivors (computed from the op's own pair output —
    // pins the composition, not LSH recall)
    val keep = docs.join(
      base.keys.toSeq.toDF("doc_id"), Seq("doc_id"), "left_semi")
    val pairs = TextDedup.minhashCandidatePairs(keep)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val drop = pairs.flatMap(p => Seq(p._1, p._2)).toSet --
      DedupGraph.survivors(keep.select("doc_id"),
        TextDedup.minhashCandidatePairs(keep).select("doc_a", "doc_b"))
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(got == base.filterNot { case (id, _) => drop(id) })
    // the planted near-dups DID band-collide and exactly one survived
    assert(pairs.contains((nearA, nearB)))
    assert(got.contains(nearA) && !got.contains(nearB))
  }

  test("corpusBuildNearDup reliable=true truncates lineage via the checkpoint dir") {
    // the cluster setting: every localCheckpoint (base materialization +
    // component rounds) swaps to checkpoint() against durable storage
    val ckpt = tmpDir("cb_reliable_ckpt")
    val hadDir = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      def near(v: String) =
        "the a of and to the of a and to " +
          (1 to 20).map(j => s"shr$j").mkString(" ") + s" $v"
      val docs = ids.map { id =>
        val text =
          if (benchIds.contains(id)) s"held out probe y z b$id"
          else if (id == trainIds(6)) near("alpha")
          else if (id == trainIds(7)) near("beta")
          else s"the a of and to w$id x$id y$id z$id q$id"
        (id, text)
      }.toDF("doc_id", "text")
      val unreliable = CorpusPipeline.corpusBuildNearDup(docs, benchPct = 2)
        .as[(Long, String)].collect().toMap
      val reliable = CorpusPipeline.corpusBuildNearDup(docs, benchPct = 2,
          reliable = true)
        .as[(Long, String)].collect().toMap
      assert(reliable == unreliable)
      // the checkpoint dir actually received RDD checkpoint data
      val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      val nFiles = try wrote.filter(java.nio.file.Files.isRegularFile(_)).count()
                   finally wrote.close()
      assert(nFiles > 0, "reliable=true never wrote to the checkpoint dir")
    } finally hadDir.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("vocabulary: top-k frequencies with deterministic tie-break") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a c d d"),
      (3L, "e  e")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabulary(docs, k = 4)
      .as[(String, Long)].collect().toSeq
    // freq: a=3, b=3, d=2, e=2, c=2 → top-4 with (freq DESC, token ASC)
    assert(got == Seq("a" -> 3L, "b" -> 3L, "c" -> 2L, "d" -> 2L))
  }

  test("unigramLogLoss: bits per token vs scalar formula, OOV backs off to count 1") {
    // vocabSize 2 → vocab = {a (5), b (3)}; c and d are OOV (count 1 backoff)
    val docs = Seq(
      (1L, "a a b c"),
      (2L, "a a b b d"),
      (3L, "a")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogLoss(docs, vocabSize = 2)
      .as[(Long, Double)].collect().toMap
    val n = 10.0 // total corpus tokens
    def bits(c: Double) = -math.log(c / n) / math.log(2)
    def r4(x: Double) = // Spark's round = BigDecimal HALF_UP
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == r4((2 * bits(5) + bits(3) + bits(1)) / 4))
    assert(got(2L) == r4((2 * bits(5) + 2 * bits(3) + bits(1)) / 5))
    assert(got(3L) == r4(bits(5)))
  }

  test("scrubPii masks emails and urls and counts matches") {
    val docs = Seq(
      (1L, "write to a.b@x.org or c%d@y.co.uk and see https://h.io/p?q=1 end"),
      (2L, "no pii here")).toDF("doc_id", "text")
    val got = TextAnalysis.scrubPii(docs)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(got(0) == ((1L, 2, 1,
      "write to <EMAIL> or <EMAIL> and see <URL> end")))
    assert(got(1) == ((2L, 0, 0, "no pii here")))
  }
}
