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
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val staging = new org.apache.hadoop.fs.Path(s"${dir}__compacting")
    val bak = new org.apache.hadoop.fs.Path(s"${dir}__old")
    // Hadoop FileSystem API, not java.io.File: the landing dir lives on
    // cluster storage (HDFS/object store) in production, where local-FS
    // renames don't exist
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode("overwrite").parquet(staging.toString)
    require(fs.rename(dirPath, bak), s"could not stage out $dir")
    require(fs.rename(staging, dirPath), s"could not swap in $staging")
    fs.delete(bak, true)
    spark.catalog.refreshByPath(dir)
  }
}
