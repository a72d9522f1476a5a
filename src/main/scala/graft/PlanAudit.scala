package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan audit sweep: `runMain graft.PlanAudit <sfDir>`.
  *
  * Executes every SparkEntry query and prints one line per query with
  * the EXECUTED (post-AQE) plan's operator counts: shuffle exchanges,
  * broadcast exchanges, reused exchanges, parquet scans, and cartesian
  * products. The invariant this enforces across the whole surface:
  * cartesian products are zero everywhere, and BroadcastNestedLoopJoin
  * appears only where a 1-row broadcast total is crossed in
  * (text_lm_bits) or where the brute scan IS the op (ann_brute_topk) —
  * every other pair-producing op is blocked/bucketed/prefix-filtered.
  *
  * The same audit runs as a TEST GATE (PlanAuditSpec) at sf0.001, so an
  * accidental cartesian/BNLJ can never land silently between rounds.
  */
object PlanAudit {

  final case class Counts(shuffles: Int, broadcasts: Int, reused: Int,
      scans: Int, cartesian: Int, bnlj: Int)

  /** Post-AQE operator counts of `df`'s EXECUTED plan (runs the query). */
  def executedCounts(df: DataFrame): Counts = {
    df.collect()
    var (shuffle, bcast, reused, scans, cartesian, bnlj) = (0, 0, 0, 0, 0, 0)
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan); return
        case q: QueryStageExec => walk(q.plan); return
        case _: ShuffleExchangeLike => shuffle += 1
        case _: BroadcastExchangeLike => bcast += 1
        case _: ReusedExchangeExec => reused += 1
        case _: CartesianProductExec => cartesian += 1
        case s if s.nodeName.contains("BroadcastNestedLoopJoin") => bnlj += 1
        case s if s.nodeName.startsWith("Scan parquet") => scans += 1
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    Counts(shuffle, bcast, reused, scans, cartesian, bnlj)
  }

  /** Sanctioned BNLJs: text_lm_bits crosses a 1-row broadcast total;
    * ann_brute_topk's non-equi (c.vec_id != q.vec_id) join against the
    * tiny broadcast query set IS the brute-force scan. */
  def sanctioned(name: String, c: Counts): Boolean =
    c.cartesian == 0 &&
      (c.bnlj == 0 || name == "text_lm_bits" || name == "ann_brute_topk")

  /** Audit one query; (counts, ok). */
  def auditOne(spark: SparkSession, sfDir: String, name: String): (Counts, Boolean) = {
    val c = executedCounts(SparkEntry.queries(name)(spark, sfDir))
    (c, sanctioned(name, c))
  }

  /** Audit the whole SparkEntry surface; returns the flagged names
    * ("name: reason" for failures). `report` receives one line per
    * query as it completes. */
  def auditAll(spark: SparkSession, sfDir: String,
      report: String => Unit = _ => ()): Seq[String] = {
    val flagged = Seq.newBuilder[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, _) =>
      try {
        val (c, ok) = auditOne(spark, sfDir, name)
        if (!ok) flagged += s"$name: cartesian=${c.cartesian} bnlj=${c.bnlj}"
        report(f"[audit] $name%-28s shuffles=${c.shuffles}%-3d bcast=${c.broadcasts}%-3d " +
          f"reused=${c.reused}%-3d scans=${c.scans}%-3d cartesian=${c.cartesian} bnlj=${c.bnlj} " +
          (if (ok) "OK" else "FLAG"))
      } catch {
        case e: Throwable =>
          flagged += s"$name: ${e.getClass.getSimpleName}: ${e.getMessage}"
          report(s"[audit] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    flagged.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "plan-audit")
    val flagged = auditAll(spark, sfDir, println)
    println(s"[audit] flagged=${flagged.size}")
    spark.stop()
    if (flagged.nonEmpty) sys.exit(1)
  }
}
