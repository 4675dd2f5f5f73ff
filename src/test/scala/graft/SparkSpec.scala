package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one local session per suite, sf0.001 fixtures. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    graft.core.Graft.localSession("graft-test", cpus = 4)
  val sfDir = "/root/testdata/sf0.001"

  /** Every physical node in the plan, DESCENDING through AQE wrappers —
    * `AdaptiveSparkPlanExec` and `QueryStageExec` are leaf-like
    * (children = Nil), so a bare `plan.collect` on an AQE plan sees
    * nothing below the wrapper and absence assertions pass vacuously.
    * Plan-shape guards must match over this instead.
    */
  def allPlanNodes(plan: SparkPlan): Seq[SparkPlan] = {
    val below = plan match {
      case a: AdaptiveSparkPlanExec => allPlanNodes(a.executedPlan)
      case s: QueryStageExec => allPlanNodes(s.plan)
      case _ => plan.children.flatMap(allPlanNodes)
    }
    plan +: below
  }

  /** All WindowExec nodes under the plan of `df`, through AQE. */
  def windowNodes(df: org.apache.spark.sql.DataFrame):
      Seq[org.apache.spark.sql.execution.window.WindowExec] =
    allPlanNodes(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
}
