package graft

import org.apache.spark.sql.SparkSession

/** Scratch plan-audit main (test scope): prints the physical-plan health
  * flags the round reviews check — cartesian products, broadcast
  * nested-loop joins, exchange counts, whole-stage codegen presence — for
  * the most recently added queries.
  *
  * Reading the output: `bnlj=true` is EXPECTED wherever a query
  * crossJoins a broadcast 1-row total/model frame (the documented
  * pattern) — the red flag is `cartesian=true`, which none of the
  * registry's plans may show. With AQE on, the pre-execution plan string
  * reports `isFinalPlan=false` and carries no WholeStageCodegen
  * annotations, so `wscg` is only meaningful when the plan is printed
  * after an action. */
object PlanAuditMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val targets = Seq(
      "q_psi_drift", "q_mix_schedule", "q_near_dup_incremental",
      "q_ann_ivf_pq", "q_edit_distance_scale")
    for (n <- targets) {
      val df = SparkEntry.queries(n)(spark, d)
      val p = df.queryExecution.executedPlan.toString
      println(f"$n%-24s cartesian=${p.contains("CartesianProduct")}%-5s " +
        s"bnlj=${p.contains("BroadcastNestedLoop")} " +
        s"exchanges=${"Exchange".r.findAllIn(p).length} " +
        s"wscg=${p.contains("WholeStageCodegen")}")
    }
    spark.stop()
  }
}
