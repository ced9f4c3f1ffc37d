package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Cross-JVM randomized differential (extends the multi-executor evidence
  * from 20 fixed heavy queries + 1 drain to RANDOMIZED plans): the four
  * fuzzer legs run against a `local-cluster[4,8,4096]` session — 4 real
  * executor JVMs, serialized tasks, real broadcast/shuffle transport,
  * executor-side codegen and state stores — instead of local[N].
  *
  *   - SQL: 20 seeded SqlFuzzer plans dumped in Verify's layout; run
  *     `tools/compare_oracle.py <outDir> <sfDir>` afterwards for the
  *     DuckDB half (this JVM owns the cluster SparkContext, so the
  *     second engine must live outside it).
  *   - graph: 12 plans (one per kernel) vs their brute-force oracles.
  *   - vector: 7 plans (one per kind) vs their linear-algebra oracles.
  *   - stream: 5 plans (one per state class: windowed agg, dedup,
  *     interval join, plus the chained join_agg and rollup2 topologies)
  *     drained through executor-JVM state stores vs their batch
  *     recomputations.
  *
  * A single-JVM locality dependency — a broadcast mutated in place, a
  * task closure capturing driver state, an accumulator-like shortcut, a
  * state store assuming driver-local files — diverges here and nowhere
  * else in the programme. Usage (needs SPARK_HOME for the executor launch
  * path): `Test/runMain graft.LocalClusterFuzzMain <sfDir> <sqlOutDir>`;
  * prints one JSON line for bench_runs/local_cluster_fuzz_r15.json. */
object LocalClusterFuzzMain {

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs SPARK_HOME (the executor launch path)")
    val sfDir = args(0)
    val outDir = args(1)
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    val spark = SparkSession.builder()
      .master("local-cluster[4,8,4096]")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    // ---- SQL leg: dump 20 plans for the external DuckDB compare --------
    new java.io.File(outDir).mkdirs()
    fuzz.SqlFuzzer.tables.foreach { t =>
      (if (t.name == "events") Tables.events(spark, sfDir)
       else Tables.table(spark, sfDir, t.name)).createOrReplaceTempView(t.name)
    }
    val sqlPlans = fuzz.SqlFuzzer.plans(444555666L, 20)
    var sqlFailed = 0
    sqlPlans.foreach { case (name, sql) =>
      try spark.sql(sql).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        sqlFailed += 1
        System.err.println(s"[lcfuzz] $name FAILED: ${e.getMessage.takeWhile(_ != '\n')}")
      }
    }
    val sqlJson = sqlPlans.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), sqlJson)

    // ---- graph / vector / stream legs: self-contained oracles ----------
    val graphResults = fuzz.GraphFuzzer.plans(424243L, 12).map { p =>
      val r = fuzz.GraphFuzzer.run(spark, p)
      System.err.println(s"[lcfuzz] graph ${r.kernel}: ${if (r.ok) "ok" else r.detail}")
      r
    }
    val vectorResults = fuzz.VectorFuzzer.plans(515253L, 7).map { p =>
      val r = fuzz.VectorFuzzer.run(spark, p)
      System.err.println(s"[lcfuzz] vector ${r.kind}: ${if (r.ok) "ok" else r.detail}")
      r
    }
    val streamPicks = {
      val ps = fuzz.StreamFuzzer.plans(909015L, 150)
      Seq("tumbling", "dedup", "interval", "join_agg", "rollup2").flatMap(k => ps.find(_.kind == k))
    }
    val streamResults = streamPicks.map { p =>
      val r = fuzz.StreamFuzzer.run(spark, sfDir, p)
      System.err.println(s"[lcfuzz] stream ${r.kind}: ${if (r.ok) "ok" else r.detail}")
      r
    }

    val anyBad = graphResults.exists(!_.ok) || vectorResults.exists(!_.ok) ||
      streamResults.exists(!_.ok)
    val badJson = (graphResults.filterNot(_.ok).map(r => s"graph:${r.kernel}:${r.idx}") ++
      vectorResults.filterNot(_.ok).map(r => s"vector:${r.kind}:${r.idx}") ++
      streamResults.filterNot(_.ok).map(r => s"stream:${r.kind}:${r.idx}"))
      .map(q).mkString("[", ",", "]")
    println(s"""{"metric":"local_cluster_fuzz","master":"local-cluster[4,8,4096]","sql_plans":${sqlPlans.size},"sql_exec_failed":$sqlFailed,"graph_ok":${graphResults.count(_.ok)},"graph_total":${graphResults.size},"vector_ok":${vectorResults.count(_.ok)},"vector_total":${vectorResults.size},"stream_ok":${streamResults.count(_.ok)},"stream_total":${streamResults.size},"bad":$badJson,"sf":${q(sfDir)},"sql_out":${q(outDir)}}""")
    spark.stop()
    if (anyBad || sqlFailed > 0) sys.exit(2)
  }
}
