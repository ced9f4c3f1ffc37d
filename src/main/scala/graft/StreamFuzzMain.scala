package graft

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bulk runner for the streaming differential fuzzer (round-14 verdict #1).
  *
  * Usage: runMain graft.StreamFuzzMain <seed> <count> <sfDir> [parallelism]
  *
  * Generates `count` seeded stateful plans (fuzz.StreamFuzzer), drains each
  * as a real Structured Streaming query on an isolated child session, and
  * compares against its arithmetic batch recomputation — Spark-vs-Spark, no
  * external oracle. Drains run `parallelism`-wide (default 4): each plan
  * owns its session, scratch tree, and checkpoint, so concurrency is
  * race-free by construction (the Bench warmup-pool shape).
  *
  * Emits one JSON summary line: seed, count, per-kind counts, ok/bad, and
  * any failing plan's detail. Exit 2 on any bad plan — a bad row here is a
  * genuine stream-vs-batch divergence: minimize by re-running the single
  * index, then decide harness-bug vs engine-bug and pin it.
  */
object StreamFuzzMain {
  def main(args: Array[String]): Unit = {
    val seed = args(0).toLong
    val count = args(1).toInt
    val sfDir = args(2)
    val par = if (args.length > 3) args(3).toInt else 4
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
    val futs = fuzz.StreamFuzzer.plans(seed, count).map { p =>
      Future(fuzz.StreamFuzzer.run(spark, sfDir, p))
    }
    val results = futs.map(Await.result(_, Duration.Inf))
    pool.shutdown()
    val wall = (System.nanoTime() - t0) / 1e9
    val bad = results.filterNot(_.ok)
    val kinds = results.groupBy(_.kind).view.mapValues(_.size).toMap.toSeq.sortBy(_._1)
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def jnum(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val kindsJson = kinds.map { case (k, n) => s"${q(k)}:$n" }.mkString("{", ",", "}")
    val badJson = bad.map(r =>
        s"""{"idx":${r.idx},"kind":${q(r.kind)},"detail":${q(r.detail.take(400))}}""")
      .mkString("[", ",", "]")
    val lateTotal = results.map(_.lateInjected).sum
    val zero = results.count(_.streamRows == 0L)
    val restarts = fuzz.StreamFuzzer.plans(seed, count).count(_.restart)
    println(s"""{"seed":$seed,"count":$count,"sf_dir":${q(sfDir)},"ok":${results.size - bad.size},"bad":${bad.size},"kinds":$kindsJson,"restart_plans":$restarts,"late_rows_injected":$lateTotal,"zero_row_plans":$zero,"wall_s":${jnum(wall)},"failures":$badJson}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(2)
  }
}
