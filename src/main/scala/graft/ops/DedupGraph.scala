package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-CLUSTER resolution: the step after every pair-producing
  * dedup op (`TextDedup.minhashCandidatePairs`, `ngramJaccardPairs`,
  * `Similarity.cosinePairs`). Near-dup pairs are edges of an undirected
  * graph; a training-data pipeline needs its connected components
  * (transitive closure of "is a near-dup of") and then one survivor
  * per component — pairs alone over-delete (dropping both ends) or
  * under-delete (keeping chains A~B~C as two "independent" pairs).
  *
  * Components are computed with alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC '14): each round is two self-free aggregate+join passes over
  * the edge set, converging to min-rooted stars in O(log² n) rounds
  * (≤ 5 in practice). At the 100 TB design point this is the published
  * MapReduce-scale algorithm: no vertex ever holds its whole component
  * in memory (the label-propagation alternative shuffles the full edge
  * list for O(diameter) rounds — a 10^6-long dup chain needs 10^6
  * rounds there, ~20 here), every pass is a plain hash shuffle on the
  * node id, and lineage is truncated each round so the plan stays
  * O(1)-deep. `localCheckpoint` carries the truncation on local[n];
  * on a real cluster point `spark.sparkContext.setCheckpointDir` at
  * durable storage and flip `reliable=true`.
  */
object DedupGraph {

  /** Canonical edge form: (u, v) with u > v, self-loops dropped,
    * exactly one row per undirected edge. */
  private def canonical(pairs: DataFrame): DataFrame = {
    val Seq(a, b) = pairs.columns.take(2).toSeq
    pairs.select(greatest(col(a), col(b)).as("u"), least(col(a), col(b)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Large-star: every node connects its strictly-LARGER neighbors to
    * the minimum of its neighborhood (incl. itself). The per-node min
    * is a window aggregate, NOT a groupBy+join-back — one exchange on
    * the node id instead of an agg exchange plus a sort-merge join
    * (≈2× fewer shuffled rows per round, measured). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    edges.unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      .withColumn("m", least(min("v").over(w), col("u")))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      // key the dedup shuffle on u alone: hashpartitioning(u) satisfies
      // the (u,v)-distinct's clustering AND small-star's window
      // partitioning, so the round runs one exchange lighter (audited:
      // StageProbe ccplan)
      .repartition(col("u"))
      .distinct()
  }

  /** Small-star: every node connects its smaller-or-equal neighbors
    * (and itself) to its neighborhood minimum. Input and output are
    * canonical (u > v). Single window pass: edges are distinct, so
    * within a u-partition v == min(v) exactly on the row_number-1 row
    * — that row re-emits the (u, min) self edge, every other row
    * emits (v, min). */
  private def smallStar(edges: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
    edges
      .withColumn("m", min("v").over(w))
      .withColumn("rn", row_number().over(w.orderBy("v")))
      .select(
        when(col("rn") === 1, col("u")).otherwise(col("v")).as("u"),
        col("m").as("v"))
      .distinct()
  }

  /** One large-star + small-star round over the canonicalized pairs —
    * exposed for plan auditing (StageProbe ccplan / PLANS.md). */
  private[graft] def starRound(pairs: DataFrame): DataFrame =
    smallStar(largeStar(canonical(pairs)))

  /** Connected components over `pairs` (first two columns = the two
    * node ids of each edge; nodes are the docs appearing in ≥1 pair).
    * Returns (doc_id, component) with component = the MINIMUM doc_id
    * of the node's component — deterministic, so the survivor choice
    * downstream is reproducible run-over-run.
    *
    * Convergence is checked exactly (set equality of successive edge
    * sets), not by a hash that could terminate early on collision;
    * the fixpoint of both stars is precisely the min-rooted star
    * forest, so equality ⇒ done.
    */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 50,
      reliable: Boolean = false): DataFrame =
    connectedComponentsWithRounds(pairs, maxRounds, reliable)._1

  /** As `connectedComponents`, also returning the number of
    * large-star/small-star rounds to fixpoint (bench evidence for the
    * O(log n) convergence claim). */
  def connectedComponentsWithRounds(pairs: DataFrame, maxRounds: Int = 50,
      reliable: Boolean = false): (DataFrame, Int) = {
    // LAZY truncation (r6): the eager checkpoint ran one materialization
    // job per round and the sig() scan below immediately ran a second
    // pass over the same rows. With eager=false the sig() action IS the
    // materialization — one pass per round, same lineage truncation.
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(false) else df.localCheckpoint(false)
    // (count, xor of row hashes): differing signatures PROVE the edge
    // sets differ in one cheap scan; only equal signatures pay the
    // exact exceptAll confirmation — so the per-round convergence test
    // is O(scan) on every round but the last, with no soundness loss
    // (a hash collision can only force the exact check, never skip it)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).first()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // star-forest shape violations of an edge set (leaves unique, no
    // node both leaf and root) — the invariant that makes the final
    // labeling provably unambiguous. ONE aggregation pass over the
    // (node, leaf/root) roles; the previous groupBy-count plus
    // intersect (two distincts + a join) cost three extra shuffles.
    def shapeViolations(df: DataFrame): DataFrame = df
      .select(col("u").as("n"), lit(1L).as("l"), lit(0L).as("r"))
      .unionAll(df.select(col("v").as("n"), lit(0L).as("l"), lit(1L).as("r")))
      .groupBy("n").agg(sum("l").as("l"), sum("r").as("r"))
      .filter(col("l") > 1 || (col("l") > 0 && col("r") > 0))
    var edges = truncate(canonical(pairs))
    var s = sig(edges)
    var converged = s._1 == 0L
    var round = 0
    while (!converged && round < maxRounds) {
      val next = truncate(smallStar(largeStar(edges)))
      val ns = sig(next)
      // one action settles the round when signatures match: exact set
      // equality AND the star-forest shape of the fixpoint, unioned so
      // a single isEmpty covers both (the shape can only be violated if
      // the algorithm itself is wrong — checking it inside the
      // convergence action costs nothing extra and drops the separate
      // post-loop verification job)
      converged = ns == s &&
        next.exceptAll(edges).select(lit(1L).as("x"))
          .unionAll(shapeViolations(next).select(lit(1L).as("x")))
          .isEmpty
      edges = next
      s = ns
      round += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxRounds rounds")
    (edges.select(col("u").as("doc_id"), col("v").as("component"))
      .unionAll(edges.select(col("v").as("doc_id"), col("v").as("component")))
      .distinct(), round)
  }

  /** The per-document keep/drop decision a dedup pipeline actually
    * ships: every document keeps `component` (its cluster's min
    * doc_id; itself when unpaired) and `keep` (true for the cluster
    * minimum and for every unpaired doc). The join is left-outer on
    * doc_id — at scale the component map is orders of magnitude
    * smaller than the corpus (only near-dup members appear), so AQE
    * turns it into a broadcast join. `reliable` flows to the component
    * rounds' lineage truncation: true = `checkpoint()` against the
    * session's checkpoint dir (durable storage on a cluster — survives
    * executor loss), false = `localCheckpoint` (local[n] / ephemeral). */
  def survivors(documents: DataFrame, pairs: DataFrame,
      reliable: Boolean = false): DataFrame = {
    val comp = connectedComponents(pairs, reliable = reliable)
    documents.select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("component"),
        (col("component").isNull || col("doc_id") === col("component")).as("keep"))
  }
}
