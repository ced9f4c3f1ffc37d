package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Spark half of the randomized differential harness (round-13 verdict #1).
  *
  * Usage: runMain graft.FuzzMain <seed> <count> <sfDir> <outDir>
  *
  * Generates `count` seeded portable SQL plans (fuzz.SqlFuzzer), executes
  * each with Spark SQL over temp views of the driver's parquet tables, and
  * dumps results in EXACTLY graft.Verify's layout — parquet files under
  * outDir/name plus outDir/oracle_sql.json (name → the same SQL) — so the
  * existing tools/compare_oracle.py runs the DuckDB half and the row-level
  * compare unchanged. A divergence surfaces as a BAD row there; minimize it
  * by re-running the single index and, if it is a genuine semantic
  * difference, pin it as a named regression query in SparkEntry.
  *
  * Emits one JSON summary line: seed, count, per-plan rows, failures.
  * Failures here are generator bugs (non-portable SQL) — the differential
  * signal lives in the compare, not in this exit code.
  */
object FuzzMain {
  def main(args: Array[String]): Unit = {
    val Array(seedS, countS, sfDir, outDir) = args
    val (seed, count) = (seedS.toLong, countS.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    fuzz.SqlFuzzer.tables.foreach { t =>
      (if (t.name == "events") Tables.events(spark, sfDir)
       else Tables.table(spark, sfDir, t.name)).createOrReplaceTempView(t.name)
    }
    val plans = fuzz.SqlFuzzer.plans(seed, count)
    val rows = scala.collection.mutable.LinkedHashMap[String, Long]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    plans.foreach { case (name, sql) =>
      try {
        val df = spark.sql(sql)
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        rows(name) = spark.read.parquet(s"$outDir/$name").count()
      } catch { case e: Throwable =>
        failed(name) = e.getMessage.takeWhile(_ != '\n').take(200)
        System.err.println(s"[fuzz] $name FAILED: ${failed(name)}\n  SQL: $sql")
      }
    }
    // same JSON escaping as Verify (control chars would break json.load)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = plans.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val zeroRows = rows.count(_._2 == 0L)
    println(s"""{"seed":$seed,"count":$count,"sf_dir":${q(sfDir)},"executed":${rows.size},"failed":${failed.size},"zero_row_plans":$zeroRows,"failures":${failed.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")}}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(2)
  }
}
