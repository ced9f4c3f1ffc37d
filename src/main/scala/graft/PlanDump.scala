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
    names.foreach { name =>
      try {
        val plan = SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
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
