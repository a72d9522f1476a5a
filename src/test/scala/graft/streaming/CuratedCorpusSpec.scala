package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import graft.SparkSpec
import graft.ops.TextDedup

/** Index-backed streaming curation: gates + exact + NEAR-dup dedup
  * against persisted probed indexes, exactly-once restart, crash
  * reconcile, and the O(batch) corpus-side-work pin (scanned
  * files/bytes per batch must not grow with the corpus).
  */
class CuratedCorpusSpec extends SparkSpec {
  import spark.implicits._

  private def docText(id: Long): String =
    (1 to 12).map(j => s"w${id}_$j").mkString(" ")

  /** A near-duplicate family: same 20-word body, distinct tail. */
  private def near(v: String): String =
    (1 to 20).map(j => s"shared$j").mkString(" ") + s" $v"

  test("streamed batches: gates, exact + cross-batch NEAR-dup dedup, exactly-once restart") {
    implicit val sqlCtx = spark.sqlContext
    val cc = new CuratedCorpus(spark, tmpDir("curated"), minTokens = 3)
    val ckpt = tmpDir("curated_ckpt")

    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")

    // batch 0: 10 kept; 11 fails the gate; 13 exact-dups 12; 15
    // near-dups 14 WITHIN the batch (first-wins keeps 14)
    in.addData((10L, "alpha beta gamma"), (11L, "too short"),
      (12L, "delta epsilon zeta"), (13L, "delta epsilon zeta"),
      (14L, near("alpha")), (15L, near("beta")))
    val q1 = cc.start(docs, ckpt)
    q1.processAllAvailable()
    // batch 1: 20 exact-dups a batch-0 TABLE row; 21 is new; 22 is a
    // NEAR-dup of 14 (cross-batch — the r4 gap this class closes)
    in.addData((20L, "alpha beta gamma"), (21L, "eta theta iota"),
      (22L, near("gamma")))
    q1.processAllAvailable()
    q1.stop()
    assert(cc.table.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 12L, 14L, 21L))

    // crash/restart on the same checkpoint: batch 2 arrives, nothing replays
    in.addData((30L, "kappa lambda mu"), (31L, "alpha beta gamma"),
      (32L, near("delta")))
    val q2 = cc.start(docs, ckpt)
    q2.processAllAvailable()
    q2.stop()
    val got = cc.table.read().select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 12L, 14L, 21L, 30L), s"lost/duplicated: $got")

    // replayed batch id: a no-op even though its rows would re-survive
    val replay = Seq((40L, "nu xi omicron")).toDF("doc_id", "text")
    val r = cc.curateBatch(replay, batchId = 0)
    assert(!r.appended)
    assert(cc.table.read().count() == 5)
  }

  test("O(batch) pin: corpus-side scanned files/bytes stay flat as the corpus grows") {
    // direct batch driving (no stream machinery) with a tiny refresh
    // threshold so mirrors+shards rebuild as the corpus grows
    val cc = new CuratedCorpus(spark, tmpDir("curated_obatch"),
      minTokens = 3, refreshDeltaBytes = 1L) // refresh after EVERY batch
    val batchSize = 200
    var reports = Vector.empty[cc.BatchReport]
    (0 until 8).foreach { b =>
      val docs = (0 until batchSize)
        .map(i => (b * 1000L + i, docText(b * 1000L + i)))
        .toDF("doc_id", "text")
      reports :+= cc.curateBatch(docs, b)
    }
    assert(reports.forall(_.appended))
    assert(cc.table.read().count() == 8L * batchSize)
    // all-new batches with refreshed shards: the bloom absorbs the
    // corpus — mirror partitions scanned ≈ 0 (false positives only: at
    // fpp=0.001 over 200 keys, usually zero candidate buckets)
    val late = reports.drop(2) // generation > 0 from batch 2 on
    late.foreach { r =>
      assert(r.hashStats.mirrorFilesScanned <= r.hashStats.candidateBuckets.toLong,
        s"scanned more than candidate buckets: $r")
      assert(r.hashStats.candidateRows <= 5,
        s"all-new batch produced ${r.hashStats.candidateRows} bloom candidates (fpp blowup)")
      assert(r.bandStats.candidateRows <= 10, s"band candidates: $r")
    }
    // FLATNESS: corpus grew 4x between batch 2 and batch 7, corpus-side
    // bytes must not (delta resets on every refresh; candidates ~0)
    val early = reports(2)
    val last = reports.last
    def corpusBytes(r: cc.BatchReport): Long =
      r.hashStats.mirrorBytesScanned + r.hashStats.deltaBytesScanned +
        r.bandStats.mirrorBytesScanned + r.bandStats.deltaBytesScanned
    assert(corpusBytes(last) <= math.max(corpusBytes(early), 1L) * 3,
      s"corpus-side bytes grew with the corpus: ${corpusBytes(early)} -> ${corpusBytes(last)}")

    // a batch with planted dups: the exact check scans ONLY the
    // candidates' buckets of the mirror, not the whole index
    val planted = Seq(
      (90001L, docText(0L)),        // exact dup of doc 0
      (90002L, docText(3007L)),     // exact dup of a batch-3 doc
      (90003L, docText(90003L))     // new
    ).toDF("doc_id", "text")
    val r = cc.curateBatch(planted, 100L)
    assert(r.appendedRows == 1L && r.exactDropped == 2L)
    assert(r.hashStats.candidateRows >= 2)
    assert(r.hashStats.mirrorFilesScanned < r.hashStats.mirrorFilesTotal,
      s"no partition pruning: $r")
    assert(r.hashStats.mirrorFilesScanned <= r.hashStats.candidateBuckets.toLong)
  }

  test("executed-plan pin: the mirror probe is a partition-pruned scan") {
    val dir = tmpDir("curated_plan")
    val idx = new graft.tables.ProbedKeyIndex(spark, dir, Seq("text_hash"), buckets = 16)
    val rows = (0L until 2000L).map(i => docText(i))
      .toDF("text").select(org.apache.spark.sql.functions.md5(col("text")).as("text_hash"))
    idx.append(rows, "seed")
    idx.refresh()
    // probe 3 present keys + 1 absent
    val probeKeys = (Seq(docText(1), docText(2), docText(3), "nope nope"))
      .toDF("text").select(org.apache.spark.sql.functions.md5(col("text")).as("text_hash"))
    val (hits, stats) = idx.hits(probeKeys)
    // execute and read the FileSourceScan metrics of the hits plan
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    hits.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scanned = scans(hits.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
    assert(hits.count() == 3)
    assert(stats.candidateRows >= 3)
    assert(scanned <= stats.candidateBuckets.toLong,
      s"executed plan scanned $scanned files for ${stats.candidateBuckets} candidate buckets")
    assert(scanned < stats.mirrorFilesTotal,
      s"no pruning: scanned $scanned of ${stats.mirrorFilesTotal} mirror files")
  }

  test("reconcile heals a crash between the table commit and the index commits") {
    val cc = new CuratedCorpus(spark, tmpDir("curated_crash"), minTokens = 3)
    // healthy batch 0
    assert(cc.curateBatch(
      Seq((1L, "alpha beta gamma"), (2L, near("one"))).toDF("doc_id", "text"), 0L).appended)
    // simulate the crash window: batch 1's rows land in the TABLE (with
    // its stream tag + prop) but never reach the indexes
    val orphan = Seq((3L, "delta epsilon zeta"), (4L, near("two"))).toDF("doc_id", "text")
    assert(IceLiteSink.appendBatch(cc.table, orphan, 1L))
    // batch 2 plants dups OF THE ORPHANED batch: an exact copy of 3 and
    // a near-dup of 4 (same 20-word body, different tail) — without
    // reconcile both would duplicate-survive
    val r = cc.curateBatch(Seq(
      (5L, "delta epsilon zeta"), (6L, near("two-b")), (7L, "fresh new doc")
    ).toDF("doc_id", "text"), 2L)
    assert(r.appended && r.appendedRows == 1L)
    assert(r.exactDropped == 1L && r.nearDupDropped == 1L, s"$r")
    assert(cc.table.read().select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L, 7L))
  }

  test("reconcile resumes from indexed.version instead of re-walking every table version") {
    val cc = new CuratedCorpus(spark, tmpDir("curated_verprop"), minTokens = 3)
    // healthy batch: both index appends must record the table version
    // they covered — that's where the next reconcile walk starts
    assert(cc.curateBatch(Seq((1L, "alpha beta gamma")).toDF("doc_id", "text"), 0L).appended)
    val v0 = cc.table.currentVersion
    assert(cc.hashIdx.currentProps("indexed.version").toInt == v0)
    assert(cc.bandIdx.currentProps("indexed.version").toInt == v0)
    // crash window: a table version the indexes never saw
    assert(IceLiteSink.appendBatch(cc.table,
      Seq((2L, "delta epsilon zeta")).toDF("doc_id", "text"), 1L))
    val orphanV = cc.table.currentVersion
    cc.reconcile()
    // healing advances the resume point to the orphaned version
    assert(cc.hashIdx.currentProps("indexed.version").toInt == orphanV)
    assert(cc.hashIdx.currentProps("indexed.batch").toLong == 1L)
    // next healthy batch moves it to the new table frontier, so the
    // steady-state walk range ((frontier+1) to frontier) is empty
    assert(cc.curateBatch(Seq((3L, "eta theta iota")).toDF("doc_id", "text"), 2L).appended)
    assert(cc.hashIdx.currentProps("indexed.version").toInt == cc.table.currentVersion)
    assert(cc.bandIdx.currentProps("indexed.version").toInt == cc.table.currentVersion)
  }

  test("indexed curation ≡ the rescan baseline on exact dedup (same gates)") {
    // same batch sequence through both paths; near-dup off (distinct
    // families) so the comparison isolates the exact+gate semantics
    val cc = new CuratedCorpus(spark, tmpDir("curated_equiv"), minTokens = 3)
    val baseline = new graft.tables.IceLite(spark, tmpDir("curated_equiv_base"))
    val batches = Seq(
      Seq((1L, "alpha beta gamma"), (2L, "x"), (3L, "alpha beta gamma")),
      Seq((10L, "delta epsilon zeta"), (11L, "alpha beta gamma")),
      Seq((20L, "eta theta iota"), (21L, "delta epsilon zeta"), (22L, "fresh one here"))
    )
    batches.zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("doc_id", "text")
      cc.curateBatch(df, i.toLong)
      CurationStream.curateBatch(baseline, df, i.toLong, minTokens = 3, minQuality = 0.0)
    }
    val a = cc.table.read().select("doc_id").as[Long].collect().sorted.toSeq
    val b = baseline.read().select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b, s"indexed=$a baseline=$b")
  }

  test("cross-batch near-dup matches incrementalMinhashPairs semantics") {
    // the indexed band probe must drop exactly the docs that
    // incrementalMinhashPairs(batch, corpusBands) would pair up
    val cc = new CuratedCorpus(spark, tmpDir("curated_inc"), minTokens = 3)
    val corpus = Seq((1L, near("one")), (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    assert(cc.curateBatch(corpus, 0L).appended)
    val batch = Seq((10L, near("ten")), (11L, "unrelated fresh doc here")).toDF("doc_id", "text")
    val corpusBands = TextDedup.minhashBandRows(cc.table.read())
    val wantDropped = TextDedup.incrementalMinhashPairs(batch, corpusBands)
      .select("doc_new").as[Long].collect().toSet
    val r = cc.curateBatch(batch, 1L)
    val kept = cc.table.read().select("doc_id").as[Long].collect().toSet
    assert(wantDropped == Set(10L))
    assert(r.nearDupDropped == 1L)
    assert(kept == Set(1L, 2L, 11L))
  }
}
