package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables._
import graft.ops.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one implemented operator class from
  * SURVEY.md §2 (or a training-pipeline op), expressed over the driver's
  * test tables; `oracleSql` holds the DuckDB-equivalent ANSI SQL the
  * driver runs on the same parquet files. Column names are aliased
  * identically on both sides (the compare hashes by sorted column name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.starJoinAgg(
      orders(spark, "/root/testdata/sf0.001"),
      customer(spark, "/root/testdata/sf0.001"),
      nation(spark, "/root/testdata/sf0.001"),
      region(spark, "/root/testdata/sf0.001")
    )

  private val keywords = Seq("red", "blue", "green")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_agg" -> ((s, d) => Relational.groupedAgg(lineitem(s, d))),
    "q_filter_project" -> ((s, d) => Relational.filterProject(lineitem(s, d))),
    "q_count_distinct" -> ((s, d) => Relational.countDistinctByKey(lineitem(s, d))),
    "q_group_first" -> ((s, d) => Relational.groupFirst(orders(s, d))),
    "q_anti_join" -> ((s, d) => Relational.antiJoin(customer(s, d), orders(s, d))),
    "q_semi_join" -> ((s, d) => Relational.semiJoin(part(s, d), lineitem(s, d))),
    "q_star_join" -> ((s, d) =>
      Relational.starJoinAgg(orders(s, d), customer(s, d), nation(s, d), region(s, d))),
    "q_union_distinct" -> ((s, d) => Relational.unionDistinct(customer(s, d), supplier(s, d))),
    "q_keyword_filter" -> ((s, d) => Relational.keywordFilter(part(s, d), keywords)),
    "q_topk_window" -> ((s, d) => Relational.topKPerGroup(customer(s, d), 3)),
    "q_events_tumbling" -> ((s, d) => Relational.eventsTumbling(events(s, d))),
    "q_sessionize" -> ((s, d) => Relational.sessionize(events(s, d)))
  )

  def oracleSql: Map[String, String] = Map(
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_price,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "q_count_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",
    "q_group_first" ->
      """SELECT o_custkey, min(o_orderdate) AS first_order, count(*) AS n_orders
         FROM orders GROUP BY o_custkey""",
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""",
    "q_semi_join" ->
      """SELECT p_partkey, p_name, p_brand FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity >= 49)""",
    "q_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         round(sum(o_totalprice), 2) AS revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "q_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL
           SELECT s_nationkey AS nationkey FROM supplier)""",
    "q_keyword_filter" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
         WHERE p_name LIKE '%red%' OR p_name LIKE '%blue%' OR p_name LIKE '%green%'
         GROUP BY p_brand""",
    "q_topk_window" ->
      """SELECT c_mktsegment, c_custkey, c_acctbal, rnk FROM (
           SELECT c_mktsegment, c_custkey, c_acctbal,
                  row_number() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
           FROM customer) WHERE rnk <= 3""",
    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events, round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q_sessionize" ->
      """WITH flagged AS (
           SELECT user_id, ts,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_sess
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)
         ), sess AS (
           SELECT user_id, ts,
                  sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
           FROM flagged)
         SELECT user_id, session_id, count(*) AS n_events,
                min(ts) AS sess_start, max(ts) AS sess_end
         FROM sess GROUP BY user_id, session_id"""
  )
}
