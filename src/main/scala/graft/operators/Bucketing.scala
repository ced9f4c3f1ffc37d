package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for shuffle elimination and landing-zone health
  * (SURVEY.md §2.1 S4 "compacted Parquet bronze", §7 100 TB posture).
  */
object Bucketing {

  /** Persist a table bucketed+sorted on its join key. Two tables bucketed
    * the same way join with ZERO exchange — the single biggest shuffle win
    * available for repeated fact-fact joins (e.g. lineitem⋈orders on
    * orderkey at every analytics query). */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(tableName)

  /** Small-file compaction for a streaming landing dir: micro-batches leave
    * many small files (one per trigger × partition); periodic compaction
    * rewrites to `targetFiles` right-sized files so downstream scans don't
    * pay per-file open/footer costs. Atomic via staging + swap. */
  def compact(spark: SparkSession, dir: String, targetFiles: Int): Unit = {
    val staging = s"${dir}__compacting"
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode("overwrite").parquet(staging)
    val fs = new java.io.File(dir)
    val bak = new java.io.File(s"${dir}__old")
    require(fs.renameTo(bak), s"could not stage out $dir")
    require(new java.io.File(staging).renameTo(fs), s"could not swap in $staging")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(bak)
    spark.catalog.refreshByPath(dir)
  }
}
