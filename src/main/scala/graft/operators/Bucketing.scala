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

  /** Morton (z-order) key over two 16-bit dimensions — the multi-dimension
    * data-layout primitive: files range-partitioned and sorted by the
    * interleaved key keep BOTH dimensions locally clustered, so parquet
    * min/max stats prune scans filtered on either (or both) columns. The
    * bit-spreading is four shift/mask steps per dimension (plain integer
    * builtins — codegen'd, engine-portable, no UDF). */
  def mortonKey(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def spread(c0: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      // Domain mask first (ADVICE r04): inputs wider than 16 bits — or
      // negative, since Spark's % can return negatives — would otherwise
      // interleave corrupt high bits into silently-colliding keys.
      val c = bitwise_and(c0, lit(0xFFFFL))
      // 16 bits → every other of 32: abcd… → a0b0c0d0…
      val s1 = bitwise_and(c.bitwiseOR(shiftleft(c, 8)), lit(0x00FF00FFL))
      val s2 = bitwise_and(s1.bitwiseOR(shiftleft(s1, 4)), lit(0x0F0F0F0FL))
      val s3 = bitwise_and(s2.bitwiseOR(shiftleft(s2, 2)), lit(0x33333333L))
      bitwise_and(s3.bitwiseOR(shiftleft(s3, 1)), lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }
  private def bitwise_and(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    a.bitwiseAND(b)

  /** Registered layout diagnostic: z-key the orders fact on (custkey mod
    * 2¹⁶, price-bucket), then report how the z-range partitions the data —
    * the histogram a layout job would use to pick file split points. The
    * write path is `repartitionByRange(zkey).sortWithinPartitions(zkey)`;
    * this query emits the per-range row counts and per-range min/max of
    * BOTH source dimensions, which is exactly the parquet-stats pruning
    * story (tight per-file bounds on two columns at once). 8-bit dims keep
    * every range populated at test scale; production layouts widen the
    * domain with the same four spread steps. */
  def zorderLayout(s: SparkSession, d: String, ranges: Int = 16): DataFrame = {
    val orders = graft.Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .withColumn("zx", col("o_custkey") % 256)
      .withColumn("zy", floor(col("o_totalprice") / lit(16.0)).cast("long") % 256)
    orders
      .withColumn("zkey", mortonKey(col("zx"), col("zy")))
      .withColumn("zrange", expr(s"CAST(zkey div ${65536L / ranges} AS INT)"))
      .groupBy(col("zrange"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("zx")).as("min_cust"), max(col("zx")).as("max_cust"),
        min(col("zy")).as("min_price_bucket"), max(col("zy")).as("max_price_bucket"))
  }
}
