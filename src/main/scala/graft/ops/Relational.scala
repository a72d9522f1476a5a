package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator library — the SQL-expressible operator classes of
  * the reference (SURVEY.md §2.2–§2.6) as composable DataFrame functions.
  *
  * Scale notes (100 TB design point):
  *  - every filter/projection is declarative so Catalyst pushes it into
  *    the parquet scan (verified via explain: PushedFilters/ReadSchema);
  *  - dimension-sized join sides are `broadcast()` hinted, fact-fact
  *    joins shuffle on their keys and rely on AQE for skew splitting;
  *  - aggregations are partial (map-side combine) by construction when
  *    expressed through groupBy/agg — never via collect+loop.
  */
object Relational {

  /** P1/P2-style predicate + P6 projection; pushdown-friendly.
    * Reference analog: `df[df['isleaf']==1]` + column slice
    * (`zhwiki_leafs.py:1699,1703`). */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")

  /** A1+A6-style grouped aggregation with map-side partial agg.
    * Money sums are rounded to 2 dp so double association order (which
    * differs across partitionings/engines) cannot flip the result. */
  def groupedAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt")
      )

  /** A3: exact distinct counts (reference `nunique`,
    * `zhwiki_leafs.py:1708-1709`). */
  def countDistinctByKey(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps")
      )

  /** §2.10 monitoring path: approximate distinct counts (HLL++, one
    * map-side-combined shuffle of fixed-size sketches) — the frontier
    * dashboard metric where exact countDistinct would shuffle 10^10
    * keys. Deterministic for fixed input but not SQL-oracle-checkable
    * (DuckDB's HLL differs), so it ships with a rows-only driver check
    * plus a spec pinning <5% relative error vs the exact counts. */
  def approxDistinctByKey(lineitem: DataFrame, rsd: Double = 0.02): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey"), rsd).as("n_supps_approx")
      )

  /** Driver-checkable form of the approx-distinct monitoring path: the
    * HLL sketch itself differs across engines, so instead of emitting
    * the approximate counts we emit the EXACT counts plus Spark-side
    * booleans asserting the approximation landed within 5% of exact.
    * The DuckDB oracle recomputes the exact counts and literal `true`s
    * — a full hash compare that fails if the sketch ever drifts out of
    * its error bound, with no cross-engine HLL needed. */
  def approxDistinctChecked(lineitem: DataFrame, rsd: Double = 0.02): DataFrame = {
    def within5pct(approx: Column, exact: Column): Column =
      abs(approx.cast("double") - exact.cast("double")) / exact.cast("double") < 0.05
    // r6: exact and approx run as SEPARATE aggregations joined on the
    // (few-row) group key. Mixing countDistinct with other aggregates
    // in one agg forces an Expand of the whole fact table (one
    // projection per distinct column + one for the plain aggregates —
    // 3× the scan rows through the shuffle, HLL buffers riding every
    // expanded row: measured 2.2 s vs 0.38 s for the 2-distinct-only
    // sibling q_count_distinct at sf0.1). Two lean passes + a tiny
    // broadcast join compute the identical result.
    val exact = lineitem
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts_exact"),
        countDistinct(col("l_suppkey")).as("n_supps_exact"))
    val approx = lineitem
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), rsd).as("n_parts_approx"),
        approx_count_distinct(col("l_suppkey"), rsd).as("n_supps_approx"))
    exact.join(approx, Seq("l_returnflag"))
      .select(
        col("l_returnflag"),
        col("n_parts_exact"),
        col("n_supps_exact"),
        within5pct(col("n_parts_approx"), col("n_parts_exact")).as("parts_within_5pct"),
        within5pct(col("n_supps_approx"), col("n_supps_exact")).as("supps_within_5pct"))
  }

  /** A2: deterministic first-per-group. The reference's pandas
    * `groupby('url') ... values[0]` (`zhwiki_leafs.py:1649`) takes first
    * in file order; relationally we pin the order explicitly (min) so the
    * result is parallelism-invariant. */
  def groupFirst(orders: DataFrame): DataFrame =
    orders
      .groupBy("o_custkey")
      .agg(
        min("o_orderdate").as("first_order"),
        count(lit(1)).as("n_orders")
      )

  /** J1: left anti join — the frontier "not in viewed" dedup
    * (`zhwiki_all.py:151`). Customers with no finalized ('F') order; the
    * status filter is pushed below the join into the parquet scan. */
  def antiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(
        orders.filter(col("o_orderstatus") === "F"),
        customer("c_custkey") === orders("o_custkey"),
        "left_anti"
      )
      .select("c_custkey", "c_name")

  /** P7/J3: left semi join — "already crawled" membership
    * (`zhwiki_leafs.py:120-123`). Parts shipped in large quantity. */
  def semiJoin(part: DataFrame, lineitem: DataFrame): DataFrame =
    part
      .join(
        lineitem.filter(col("l_quantity") >= 49),
        part("p_partkey") === lineitem("l_partkey"),
        "left_semi"
      )
      .select("p_partkey", "p_name", "p_brand")

  /** J4: multiway star join. Dimensions (customer/nation/region here) are
    * broadcast — at 100 TB the fact side streams through unbuffered while
    * each dim fits comfortably in executor memory. */
  def starJoinAgg(
      orders: DataFrame,
      customer: DataFrame,
      nation: DataFrame,
      region: DataFrame
  ): DataFrame =
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue")
      )

  /** U1+U2: union + distinct (reference `pd.concat` + `drop_duplicates`,
    * `zhwiki_leafs.py:1700-1702`). Nations present on either side. */
  def unionDistinct(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer
      .select(col("c_nationkey").cast("int").as("nationkey"))
      .unionByName(supplier.select(col("s_nationkey").cast("int").as("nationkey")))
      .distinct()

  /** P4: multi-keyword containment filter (`zhwiki_leafs.py:1606-1617`):
    * OR-reduction of `contains` predicates, then dedup + count by group. */
  def keywordFilter(part: DataFrame, words: Seq[String]): DataFrame = {
    val pred: Column =
      words.map(w => col("p_name").contains(w)).reduce(_ || _)
    part.filter(pred).groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
  }

  /** §2.5: per-group top-k via window row_number; total tie-break keeps
    * it deterministic under any partitioning. */
  def topKPerGroup(customer: DataFrame, k: Int): DataFrame = {
    val w = Window
      .partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    customer
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("c_mktsegment", "c_custkey", "c_acctbal", "rnk")
  }

  /** Tumbling-window batch aggregation over the event stream table —
    * batch twin of the Structured Streaming path (graft.streaming). */
  def eventsTumbling(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value")
      )

  /** J4: iterative category-closure expansion (the commented
    * transitive-closure variant, `zhwiki_leafs.py:1619-1633`): starting
    * from seed category urls, repeatedly join the edge table on
    * pre_url to collect the reachable subtree. Each level is one
    * broadcast-able join (frontier side is small); the level result is
    * localCheckpoint'd so the iterative plan doesn't grow unboundedly.
    */
  def categoryClosure(frontier: DataFrame, seedUrls: Seq[String]): DataFrame = {
    val edges = frontier.select("url", "title", "pre_url", "isleaf")
    var result = edges.filter(col("url").isin(seedUrls: _*))
    var level = edges
      .filter(col("url").isin(seedUrls: _*) && col("isleaf") === 0)
      .select(col("url")).distinct()
    var visited = level
    var n = level.count()
    while (n > 0) {
      // no broadcast hint: a large category subtree level would OOM the
      // driver at the 10^10 design point — AQE picks broadcast at
      // runtime when the materialized level is actually small
      val children = edges
        .join(level.withColumnRenamed("url", "parent"),
          col("pre_url") === col("parent"))
        .drop("parent")
      result = result.unionByName(children).localCheckpoint()
      val nextLevel = children
        .filter(col("isleaf") === 0)
        .select("url").distinct()
        .join(visited, Seq("url"), "left_anti")
        .localCheckpoint()
      visited = visited.unionByName(nextLevel).localCheckpoint()
      level = nextLevel
      n = nextLevel.count()
    }
    result.dropDuplicates()
  }

  /** Sessionization: split each user's event sequence at >30 min gaps,
    * one output row per session. Windowed lag + running sum of boundary
    * flags — the standard shuffle-once formulation (one hash partition by
    * user, both window functions reuse it). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts")
    // exact microsecond arithmetic — second-truncation would disagree
    // with the DuckDB oracle on sub-second boundaries
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn(
        "new_sess",
        when(
          col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapUs,
          1L
        ).otherwise(0L)
      )
      .withColumn("session_id", sum("new_sess").over(byUser))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("ts").as("sess_start"),
        max("ts").as("sess_end")
      )
  }
}
