package graft

/** Throwaway single-plan debug runner for the stream fuzzer (kept out of the
  * suite: a `main`, not a spec). Usage:
  *   Test/runMain graft.ScratchDebugMain <seed> <idx> <sfDir>
  */
object ScratchDebugMain {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val idx = args(1).toInt
    val sfDir = args(2)
    val p = fuzz.StreamFuzzer.plan(seed, idx)
    System.err.println(s"[scratch] $p")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = fuzz.StreamFuzzer.run(spark, sfDir, p)
    System.err.println(s"[scratch] ok=${r.ok} stream=${r.streamRows} oracle=${r.oracleRows} detail=${r.detail}")
    spark.stop()
  }
}
