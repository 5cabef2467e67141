package graft.tools

import org.apache.spark.sql.SparkSession
/** Dev tool: shuffle/broadcast/join-shape audit of selected queries — run
  * after adding an operator to confirm the plan is the one you want. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_bm25", "q_mix_plan", "q_mix_apply", "q_shuffle_order", "q_incr_dedup")
    for (name <- names) {
      val qe = graft.SparkEntry.queries(name)(spark, dir).queryExecution
      val plan = qe.executedPlan.toString
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
      val bcasts = "BroadcastExchange".r.findAllIn(plan).length
      val bnlj = plan.contains("BroadcastNestedLoopJoin")
      val cart = plan.contains("CartesianProduct")
      // logical plan, not executedPlan: AQE hides the physical tree behind
      // AdaptiveSparkPlanExec (see PlanShapeSpec's gate)
      val unpartWin = qe.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.length
      println(s"PLAN $name: shuffles=$exchanges broadcasts=$bcasts " +
        s"bnlj=$bnlj cartesian=$cart unpartitioned_windows=$unpartWin")
    }
    spark.stop()
  }
}
