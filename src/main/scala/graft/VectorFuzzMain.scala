package graft

import org.apache.spark.sql.SparkSession
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Bulk runner for the vector/ANN differential fuzzer — fourth leg of the
  * randomized programme (FuzzMain: SQL vs DuckDB; StreamFuzzMain: stream vs
  * batch; GraphFuzzMain: graph kernels vs brute force; this: the embedding
  * operators vs plain-Scala linear algebra on random vectors).
  *
  * Usage: runMain graft.VectorFuzzMain <seed> <count> [parallelism]
  *
  * Kind choice cycles by index, so count = 7k covers every kind k times
  * (7 kinds — see [[fuzz.VectorFuzzer.kinds]]; round 16 added `ivf_pq`
  * under the boundary-robust compare).
  * Plans carry their own generated vectors — no testdata dir needed.
  * Emits one JSON summary line; exit 2 on any divergence.
  */
object VectorFuzzMain {
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
    val futs = fuzz.VectorFuzzer.plans(seed, count).map { p =>
      Future(fuzz.VectorFuzzer.run(spark, p))
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
    val rowsTotal = results.map(_.engineRows).sum
    println(s"""{"seed":$seed,"count":$count,"ok":${results.size - bad.size},"bad":${bad.size},"kinds":$kindsJson,"engine_rows_total":$rowsTotal,"wall_s":${jnum(wall)},"failures":$badJson}""")
    spark.stop()
    if (bad.nonEmpty) sys.exit(2)
  }
}
