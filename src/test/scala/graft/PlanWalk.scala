package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Deep physical-plan traversal for plan-shape assertions: AQE wraps
  * executed subtrees in QueryStageExec LEAF nodes (and reuse in
  * ReusedExchangeExec), so SparkPlan.foreach/collect silently skip the
  * very nodes a shuffle-count or scan-lookup assertion cares about. */
object PlanWalk {

  def deepCollect[A](p: SparkPlan)(f: PartialFunction[SparkPlan, A]): Seq[A] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[A]
    def walk(n: SparkPlan): Unit = {
      if (f.isDefinedAt(n)) out += f(n)
      val inner: Seq[SparkPlan] = n match {
        case q: QueryStageExec => Seq(q.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case _ => Seq.empty
      }
      (inner ++ n.children).foreach(walk)
    }
    walk(p)
    out.toSeq
  }
}
