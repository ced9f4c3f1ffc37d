package graft

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bulk runner for the DSv2 replay-source differential fuzzer (round-17
  * verdict #6).
  *
  * Usage: runMain graft.ReplayFuzzMain <seed> <count> [parallelism]
  *
  * No corpus dir: the oracle is the source's own pure generator function —
  * the property under test is the offset/admission/restart machinery, not
  * the data. Each plan owns its checkpoint, sink, and (for HTTP plans) an
  * ephemeral-port stub server, so drains run `parallelism`-wide race-free.
  * Emits one JSON summary line; exit 2 on any bad plan.
  */
object ReplayFuzzMain {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val count = args(1).toInt
    val par = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(par)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    val t0 = System.nanoTime()
    val futs = fuzz.ReplayFuzzer.plans(seed, count).map { p =>
      Future(fuzz.ReplayFuzzer.run(spark, p))
    }
    val results = futs.map(Await.result(_, Duration.Inf))
    pool.shutdown()
    val wall = (System.nanoTime() - t0) / 1e9
    val bad = results.filterNot(_.ok)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def jnum(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val badJson = bad.map(r => s"""{"idx":${r.idx},"detail":${q(r.detail.take(400))}}""")
      .mkString("[", ",", "]")
    println(s"""{"seed":$seed,"count":$count,"ok":${results.size - bad.size},"bad":${bad.size},"restart_plans":${results.count(_.restarted)},"http_plans":${results.count(_.http)},"zero_row_plans":${results.count(_.rows == 0L)},"wall_s":${jnum(wall)},"failures":$badJson}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(2)
  }
}
