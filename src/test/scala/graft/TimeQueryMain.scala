package graft

/** One-query timing loop for perf iteration (kept out of the suite: a
  * `main`, not a spec). Times a single registry query N times under the
  * Bench session shape (local[32], 32 shuffle partitions, noop sink) and
  * prints each reading plus the formatted plan on request. Usage:
  *   Test/runMain graft.TimeQueryMain <q_name> <sfDir> [reps=3] [explain]
  */
object TimeQueryMain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val explain = args.contains("explain")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    if (explain) fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[time] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
