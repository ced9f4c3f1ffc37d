package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Optimization-round evidence generator: writes the `formatted` physical
  * plan of named registered queries to files, one per query —
  * `runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...|all>`.
  * Unlike [[Plans]] (stdout, fixed headline list), this main targets the
  * per-round plan artifacts (`plans/r18/<query>_before.txt` / `_after.txt`)
  * the optimization judge diffs claims against. The session mirrors the
  * Bench conf (master/shuffle partitions from SPARK_GRAFT_CPUS, AQE on) so
  * the dumped plan is the shape the bench actually executes, not a
  * differently-sized local[4] variant. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val names: Seq[String] =
      if (args(3) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(3).split(",").toSeq
    // Pre-checkpoint plan builders (round-18 verdict #8): the iterated gates
    // return localCheckpoint'ed frames, so dumping the registered fn yields
    // an 8-line `Scan ExistingRDD` stub. For these names, dump the SAME
    // frame without the final cut (per-iteration-cut loops show their last
    // iteration's body — the repeated unit). Marked in the file header.
    val preCut: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "q_pagerank" -> (operators.Graph.pageRankPlan _),
      "q_pagerank_directed" -> (operators.Graph.pageRankDirectedPlan _),
      "q_ppr" -> (operators.Graph.pprPlan _),
      "q_cc_star" -> (operators.Graph.ccStarRoundPlan _),
      "q_modularity" -> (operators.Graph.modularityPlan _))
    names.foreach { name =>
      try {
        val (fn, header, gateScoped) = preCut.get(name)
          .map(f => (f, s"// pre-checkpoint plan for $name (iterated gates: last iteration's body = the repeated unit; q_cc_star: one contraction round)\n", true))
          .getOrElse((SparkEntry.queries(name), "", false))
        // the gates EXECUTE under withGatePartitions (shuffle.partitions =
        // GatePartitions); explain lazily re-plans under the conf active at
        // explain time, so scope it identically or the dump shows a
        // 32-partition requirement the bench never runs (spurious Exchange
        // above the 8-partition checkpointed artifacts)
        def explain(df: org.apache.spark.sql.DataFrame): String =
          df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        val plan = header + (
          if (gateScoped) operators.Graph.withGatePartitions(spark)(explain(fn(spark, sfDir)))
          else explain(fn(spark, sfDir)))
        java.nio.file.Files.write(
          outDir.resolve(s"${name}_$suffix.txt"), plan.getBytes("UTF-8"))
        System.err.println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
