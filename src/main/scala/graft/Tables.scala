package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * Every loader is a plain parquet scan — filters and projections applied by
  * callers reach the scan via Catalyst pushdown (verified in
  * RelationalSpec.explain tests), which is the property that matters at
  * 100 TB: the scan, not the executor, drops the data.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has shipped as BOTH parquet TIMESTAMP(NANOS) (early testdata
    * generations) and TIMESTAMP(MICROS). NANOS has no native Spark type, so
    * it's read as long (legacy conf) and converted with integer division —
    * exact, and identical to DuckDB's ns→µs truncation. MICROS reads
    * natively as TimestampNTZ; normalize to TimestampType so downstream
    * window/watermark ops see one type regardless of generation. The schema
    * probe keys the branch off what the footer actually declares.
    *
    * The NTZ→TZ step must NOT be a bare cast: that interprets the wall
    * clock in the SESSION timezone, and the generator wrote UTC instants —
    * correct only while every entrypoint pins UTC. Pre-shifting the NTZ
    * wall clock from UTC into the session zone first makes the subsequent
    * cast land on the UTC instant under ANY session timezone (identity
    * when the session is UTC, so gate behavior is unchanged). */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ =>
        raw.withColumn("ts", expr(
          "cast(convert_timezone('UTC', current_timezone(), ts) as timestamp)"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
