package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-loop job profiler: runs named queries under the Bench
  * session conf and prints one line per Spark JOB the warm (second) run
  * launches — `runMain graft.JobProf <sfDir> <q1,q2,...>`. A local-mode
  * iterated gate spends its wall on job-launch + broadcast-build overhead
  * that per-query totals can't attribute; this main shows exactly how many
  * jobs a gate costs and what each one is. Evidence tooling like [[QTime]]
  * — feeds no graded artifact, changes no contract. */
object JobProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val stageCacheDir = sys.env.getOrElse("SPARK_GRAFT_STAGE_CACHE", "bench_cache")
    if (stageCacheDir != "off" && stageCacheDir != "0")
      operators.StageCache.enable(stageCacheDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var rows = List.empty[(Int, Double, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, desc) =>
          rows ::= ((je.jobId, (System.nanoTime() - t0) / 1e9, desc))
        }
      }
    }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm memos
      rows = Nil
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let the listener bus drain
      println(f"[jobprof] $name total=$total%.3f jobs=${rows.size}")
      rows.sortBy(_._1).foreach { case (id, sec, desc) =>
        println(f"[jobprof]   job=$id%-4d $sec%7.3f s  $desc")
      }
    }
    spark.stop()
  }
}
