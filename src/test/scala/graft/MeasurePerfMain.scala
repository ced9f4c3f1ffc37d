package graft

import org.apache.spark.sql.SparkSession

/** Scratch perf harness (test scope): times bench-head queries under
  * candidate configurations on the sf0.1 corpus, warmed like Bench. */
object MeasurePerfMain {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(what: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[perf] $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the graph artifacts as Bench does
    val (norm, nodes, pairs) = operators.Graph.graphArtifacts(spark, d)
    pairs.write.format("noop").mode("overwrite").save()
    norm.write.format("noop").mode("overwrite").save()
    nodes.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to 3) {
      time(s"gate(ckpt@8) rep$rep")(
        operators.Graph.pageRankGate(spark, d).write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      time(s"raw@8 rep$rep")(
        operators.Graph.pageRank(spark, d).write.format("noop").mode("overwrite").save())
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      time(s"raw@32 rep$rep")(
        operators.Graph.pageRank(spark, d).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
