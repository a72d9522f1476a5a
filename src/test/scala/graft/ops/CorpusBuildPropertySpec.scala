package graft.ops

import graft.SparkSpec

/** Property test: CorpusPipeline.corpusBuild ≡ a scalar reference
  * implementation of the whole pipeline (gates → exact-dedup keeper →
  * ratio decontamination → split) over randomized corpora — random
  * lengths, random stopword density, planted exact duplicates, and a
  * token pool small enough that benchmark shingle collisions actually
  * occur. 20 seeded corpora, deterministic.
  */
class CorpusBuildPropertySpec extends SparkSpec {
  import spark.implicits._

  private def bucket(id: Long): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    Integer.parseInt(d.take(2).map(b => f"$b%02x").mkString, 16) % 100
  }

  private def shingles(tokens: Seq[String]): Seq[String] =
    if (tokens.length < 3) Seq.empty
    else tokens.sliding(3).map(_.mkString(" ")).toSeq.distinct

  // mirrors TextAnalysis.langProfiles order (pre-sorted: de en es fr zh)
  private val profiles = TextAnalysis.langProfiles
  private val stopwords = profiles.flatMap(_._2).distinct.toSet

  /** Scalar reference of the full pipeline. */
  private def oracle(docs: Map[Long, String]): Map[Long, String] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val benchSh = docs.collect { case (id, t) if bucket(id) >= 98 => t }
      .flatMap(t => shingles(toks(t))).toSet
    val filtered = docs.filter { case (id, t) =>
      val tk = toks(t)
      if (bucket(id) >= 98 || tk.length < 10) false
      else {
        val nStop = tk.count(stopwords.contains)
        val q = BigDecimal(math.min(tk.length / 100.0, 1.0) * 0.5 +
          (nStop.toDouble / tk.length) * 0.5)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        // bestLang: reduceLeft keeps current unless strictly greater
        val best = profiles.map { case (l, ws) => (l, tk.count(ws.contains)) }
          .reduceLeft((a, b) => if (b._2 > a._2) b else a)._1
        q >= 0.3 && (best == "en" || best == "zh")
      }
    }
    val keeper = filtered.groupBy(_._2).values
      .map(g => g.keys.min).toSet
    val contaminated = filtered.keySet.filter { id =>
      val sh = shingles(toks(filtered(id)))
      sh.nonEmpty && sh.count(benchSh.contains) >= sh.length * 0.5
    }
    filtered.keySet
      .filter(id => keeper(id) && !contaminated(id))
      .map { id =>
        val b = bucket(id)
        id -> (if (b < 90) "train" else if (b < 95) "val" else "test")
      }.toMap
  }

  test("corpusBuild ≡ scalar pipeline oracle over 20 random corpora") {
    val pool = Seq("the", "a", "of", "and", "to") ++ (1 to 9).map(i => s"w$i")
    (1 to 20).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 60 + rnd.nextInt(40)
      val texts = scala.collection.mutable.Map[Long, String]()
      (0L until n.toLong).foreach { id =>
        if (id > 0 && rnd.nextDouble() < 0.15)
          texts(id) = texts(rnd.nextLong(id)) // planted exact duplicate
        else {
          val len = rnd.nextInt(16)
          texts(id) = Seq.fill(len)(pool(rnd.nextInt(pool.length))).mkString(" ")
        }
      }
      val docs = texts.toSeq.toDF("doc_id", "text")
      val got = CorpusPipeline.corpusBuild(docs)
        .as[(Long, String)].collect().toMap
      val want = oracle(texts.toMap)
      assert(got == want,
        s"seed $seed: got ${got.size} rows, want ${want.size}; " +
          s"diff ${(got.keySet diff want.keySet) ++ (want.keySet diff got.keySet)}")
    }
  }
}
