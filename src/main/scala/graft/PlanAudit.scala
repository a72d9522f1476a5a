package graft

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
  * cartesian products are zero everywhere except where a 1-row
  * broadcast total is crossed in (text_lm_bits) — every pair-producing
  * op is blocked/bucketed/prefix-filtered instead.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "plan-audit")
    var bad = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
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
        // sanctioned BNLJs: text_lm_bits crosses a 1-row broadcast
        // total; ann_brute_topk's non-equi (c.vec_id != q.vec_id) join
        // against the tiny broadcast query set IS the brute-force scan
        val ok = cartesian == 0 &&
          (bnlj == 0 || name == "text_lm_bits" || name == "ann_brute_topk")
        if (!ok) bad += 1
        println(f"[audit] $name%-28s shuffles=$shuffle%-3d bcast=$bcast%-3d " +
          f"reused=$reused%-3d scans=$scans%-3d cartesian=$cartesian bnlj=$bnlj " +
          (if (ok) "OK" else "FLAG"))
      } catch {
        case e: Throwable =>
          bad += 1
          println(s"[audit] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[audit] flagged=$bad")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
