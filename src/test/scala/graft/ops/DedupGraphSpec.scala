package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Connected-components cluster resolution + deterministic splits.
  * The CC oracle here is an in-memory union-find over the same edges —
  * independent of both the Spark implementation and the DuckDB
  * recursive-CTE oracle the driver runs. */
class DedupGraphSpec extends SparkSpec {
  import spark.implicits._

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  private def ccOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    DedupGraph.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components ≡ union-find oracle on a mixed random graph") {
    // deterministic mixed shapes: chains, a clique, stars, random extra
    // edges from an LCG — exercises merging separately-discovered parts
    val rnd = new scala.util.Random(42)
    val chains = (0 until 5).flatMap { c =>
      val base = 100L * c
      (0 until 19).map(i => (base + i, base + i + 1))
    }
    val clique = for (i <- 600L to 607L; j <- (i + 1) to 607L) yield (i, j)
    val stars = (0 until 3).flatMap { s =>
      val hub = 700L + 50 * s
      (1 to 10).map(i => (hub, hub + i))
    }
    val extra = (0 until 30).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter(e => e._1 != e._2)
    val edges = rnd.shuffle(chains ++ clique ++ stars ++ extra)
    assert(ccOf(edges) == unionFind(0, edges))
  }

  test("long chain converges (multi-round) with min-labelled components") {
    val edges = (0L until 200L).map(i => (i + 1, i)) // reversed order on purpose
    val got = ccOf(edges)
    assert(got.size == 201)
    assert(got.values.toSet == Set(0L))
  }

  test("self-loops and duplicate/reversed pairs are harmless") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (3L, 4L), (3L, 4L))
    assert(ccOf(edges) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("empty pair set yields empty components") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(DedupGraph.connectedComponents(empty).count() == 0)
  }

  test("survivors: one keeper per cluster, unpaired docs all kept") {
    val docs = (0L until 20L).toDF("doc_id")
    val pairs = Seq((3L, 7L), (7L, 11L), (15L, 16L)).toDF("doc_a", "doc_b")
    val got = DedupGraph.survivors(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val expected = (0L until 20L).map {
      case d @ (3L | 7L | 11L) => (d, 3L, d == 3L)
      case d @ (15L | 16L)     => (d, 15L, d == 15L)
      case d                   => (d, d, true)
    }.toSet
    assert(got == expected)
    // exactly one survivor per component over the whole corpus
    val perComp = DedupGraph.survivors(docs, pairs)
      .groupBy("component").agg(sum(when(col("keep"), 1).otherwise(0)).as("n"))
      .collect().map(_.getLong(1)).toSet
    assert(perComp == Set(1L))
  }

  test("hashSplit: deterministic, corpus-growth-stable, ~90/5/5") {
    val small = (0L until 500L).toDF("doc_id")
    val grown = (0L until 2000L).toDF("doc_id")
    val a = Sampling.hashSplit(small).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val b = Sampling.hashSplit(grown).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // growth stability: every original doc keeps its assignment
    assert(a.forall { case (id, s) => b(id) == s })
    val frac = b.values.groupBy(identity).view.mapValues(_.size / 2000.0).toMap
    assert(math.abs(frac("train") - 0.90) < 0.03, frac)
    assert(math.abs(frac("val") - 0.05) < 0.02, frac)
    assert(math.abs(frac("test") - 0.05) < 0.02, frac)
  }

  test("stratifiedHashSample: per-stratum quotas, nested within each stratum") {
    val docs = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val kept = Sampling.stratifiedHashSample(docs, col("lang"),
      Map("en" -> 60, "zh" -> 10), defaultPct = 0)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val en = kept.count(_._2 == "en") / 1000.0
    val zh = kept.count(_._2 == "zh") / 2000.0
    assert(math.abs(en - 0.60) < 0.06, s"en frac $en")
    assert(math.abs(zh - 0.10) < 0.04, s"zh frac $zh")
    // the stratified keep set is exactly the per-stratum hashSample
    val enIds = Sampling.hashSample(docs.filter(col("lang") === "en"), 60)
      .collect().map(_.getLong(0)).toSet
    assert(kept.filter(_._2 == "en").map(_._1).toSet == enIds)
  }

  test("packSequences: bins bounded, deterministic, partitioning-independent") {
    val docs = (0L until 400L)
      .map(i => (i, Seq.fill((i % 37 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val maxTok = 64
    val packed = Sampling.packSequences(docs, maxTok, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(packed.length == 400)
    // in-memory oracle: per shard in doc_id order, bin = startOffset/maxTok
    packed.groupBy(_._2).foreach { case (_, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, n, bin) =>
        assert(bin == cum / maxTok, s"doc $id: bin $bin, start $cum")
        cum += n
      }
    }
    // deterministic under repartitioning
    val repacked = Sampling.packSequences(docs.repartition(13), maxTok, nShards = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(packed.sortBy(_._1).toSeq == repacked.sortBy(_._1).toSeq)
    // bins within a shard are dense from 0
    packed.groupBy(_._2).foreach { case (_, ds) =>
      val bins = ds.map(_._4).distinct.sorted.toSeq
      assert(bins == (0L until bins.length))
    }
  }

  test("mixtureSample: achieved token mix ≈ target, binding domain whole, scalar-oracle exact") {
    // skewed corpus: en-heavy so the mixture must downsample en hard
    val docs = (0L until 6000L).map { i =>
      val lang =
        if (i % 6 < 3) "en" else if (i % 6 < 4) "zh"
        else if (i % 6 < 5) "fr" else "es"
      (i, lang, i % 91 + 10) // deterministic sizes 10..100
    }.toDF("doc_id", "lang", "n_chars")
    val target = Map("en" -> 0.4, "zh" -> 0.3, "fr" -> 0.3)
    val kept = Sampling.mixtureSample(docs, col("lang"), target, col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // a domain outside the target map is dropped entirely
    assert(!kept.exists(_._2 == "es"))

    // scalar oracle: recompute rates + md5-ppm bucket per doc in plain
    // Scala (independent of both Catalyst and the DuckDB oracle)
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val budget = target.map { case (d, f) => totals(d) / f }.min
    val thr = target.map { case (d, f) =>
      d -> math.floor(math.min(1.0, f * budget / totals(d)) * 1000000.0).toLong }
    def ppm(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString, 16) % 1000000L
    }
    val expect = rows.filter(r => thr.get(r._2).exists(ppm(r._1) < _)).toSet
    assert(kept.toSet == expect)

    // the binding domain (rate 1.0, the one that sets the budget) is
    // kept in full — the no-upsampling guarantee
    val binding = target.minBy { case (d, f) => totals(d) / f }._1
    assert(kept.count(_._2 == binding) == rows.count(_._2 == binding))

    // achieved token fractions land on the target within hash-sampling
    // noise (~1000+ docs per domain)
    val keptToks = kept.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val tot = keptToks.values.sum
    target.foreach { case (d, f) =>
      assert(math.abs(keptToks(d) / tot - f) < 0.04,
        s"$d achieved ${keptToks(d) / tot}, target $f")
    }
  }

  test("mixtureEpochs: fractional epochs up- AND down-sample, scalar-oracle exact") {
    val docs = (0L until 6000L).map { i =>
      val lang =
        if (i % 6 < 3) "en" else if (i % 6 < 4) "zh"
        else if (i % 6 < 5) "fr" else "es"
      (i, lang, i % 91 + 10)
    }.toDF("doc_id", "lang", "n_chars")
    val target = Map("en" -> 0.3, "zh" -> 0.5, "fr" -> 0.2)
    val budget = 500000.0 // en rate <1 (downsample), zh ≈4.5, fr ≈1.8 (upsample)
    val out = Sampling.mixtureEpochs(docs, col("lang"), target, col("n_chars"), budget)
      .select("doc_id", "lang", "n_chars", "epoch")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    assert(!out.exists(_._2 == "es"))

    // scalar oracle: same copy rule in plain Scala
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val totals = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val rates = target.map { case (d, f) => d -> f * budget / totals(d) }
    def ppm(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(3).map(b => f"$b%02x").mkString, 16) % 1000000L
    }
    val expect = rows.flatMap { case (id, d, n) =>
      rates.get(d).toSeq.flatMap { r =>
        val nFull = math.floor(r).toLong
        val fppm = math.floor((r - math.floor(r)) * 1000000.0).toLong
        val copies = nFull + (if (ppm(id) < fppm) 1L else 0L)
        (0L until copies).map(e => (id, d, n, e))
      }
    }
    assert(out.sorted.toSeq == expect.sorted.toSeq)

    // the upsampled domain really repeats: zh has epoch ≥ 4 rows
    assert(out.exists(r => r._2 == "zh" && r._4 >= 4))
    // achieved tokens per domain land on frac × budget (fractional-copy
    // sampling is the only noise source)
    val got = out.groupBy(_._2).view.mapValues(_.map(_._3).sum.toDouble).toMap
    target.foreach { case (d, f) =>
      assert(math.abs(got(d) / (f * budget) - 1.0) < 0.05,
        s"$d achieved ${got(d)}, want ${f * budget}")
    }
  }

  test("shuffleShards: dense per-shard positions, seed-reproducible, actually shuffled") {
    val docs = (0L until 4000L).toDF("doc_id")
    def run(seed: String, parts: Int) =
      Sampling.shuffleShards(docs.repartition(parts), col("doc_id"), 8, seed)
        .select("doc_id", "shard", "pos")
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val a = run("epoch0", 4)
    // nothing lost, nothing duplicated
    assert(a.map(_._1).sorted.toSeq == (0L until 4000L))
    // positions dense from 0 within every shard
    a.groupBy(_._2).foreach { case (s, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length), s"shard $s")
    }
    // partitioning-invariant for a fixed seed
    assert(run("epoch0", 17).sortBy(_._1).toSeq == a.sortBy(_._1).toSeq)
    // a different seed produces a different permutation
    assert(run("epoch1", 4).sortBy(_._1).toSeq != a.sortBy(_._1).toSeq)
    // actually shuffled: reading a shard in position order is nowhere
    // near doc_id order (count adjacent ascending pairs ≈ 50%)
    val byPos = a.filter(_._2 == 0).sortBy(_._3).map(_._1)
    val asc = byPos.sliding(2).count(p => p(1) > p(0)).toDouble / (byPos.length - 1)
    assert(asc > 0.4 && asc < 0.6, s"ascending-pair fraction $asc")
  }

  test("pack then shuffle composes: every bin written exactly once, order seed-stable") {
    // the training-file writer's actual pipeline: pack docs into bins,
    // then shuffle the BINS into writer shards
    val docs = (0L until 600L)
      .map(i => (i, Seq.fill((i % 23 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val bins = Sampling.packSequences(docs, maxTokens = 64, nShards = 4)
      .select(col("shard").as("pack_shard"), col("bin")).distinct()
      .withColumn("bin_key", concat_ws(":", col("pack_shard"), col("bin")))
    val shuffled = Sampling.shuffleShards(bins, col("bin_key"), nShards = 4, seed = "e0")
      .select("bin_key", "shard", "pos")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // every bin lands exactly once
    assert(shuffled.map(_._1).distinct.length == shuffled.length)
    assert(shuffled.length == bins.count())
    // dense positions per writer shard, and the layout is seed-stable
    shuffled.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (0L until rs.length))
    }
    val again = Sampling.shuffleShards(bins.repartition(7), col("bin_key"), 4, "e0")
      .select("bin_key", "shard", "pos")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(again.sortBy(_._1).toSeq == shuffled.sortBy(_._1).toSeq)
  }

  test("hashSample: subset-monotone nested rungs") {
    val docs = (0L until 2000L).toDF("doc_id")
    def ids(pct: Int): Set[Long] =
      Sampling.hashSample(docs, pct).collect().map(_.getLong(0)).toSet
    val (s5, s20, s100) = (ids(5), ids(20), ids(100))
    assert(s5.subsetOf(s20))
    assert(s100.size == 2000)
    assert(math.abs(s20.size / 2000.0 - 0.20) < 0.03)
  }
}
