package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §7 "100 TB posture"): salting for hot
  * keys, complementing AQE's runtime skew-join splitting.
  *
  * Salts are DETERMINISTIC (hash of a distinguishing column, not `rand()`):
  * results stay reproducible and oracle-checkable, and a retried task
  * recomputes the same salt — `rand()`-based salting breaks both.
  */
object Skew {

  private def saltCol(distinguisher: Column, buckets: Int): Column =
    pmod(xxhash64(distinguisher), lit(buckets.toLong)).cast("int")

  /** Two-phase (salted) aggregation: partials per (key, salt), then final per
    * key. A key with a billion rows becomes `buckets` parallel partials of
    * ~1/buckets each; the second shuffle carries only (keys × buckets) rows.
    * Supports the decomposable aggregates (sum/count → avg at the end). */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      distinguisher: String, buckets: Int = 16): DataFrame =
    df
      .withColumn("__salt", saltCol(col(distinguisher), buckets))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))

  /** Salted join for a skewed fact against a small dimension: the fact side
    * gets a hash salt, the dimension is exploded ×buckets, and the join key
    * becomes (key, salt) — a hot key's rows spread over `buckets` reducers.
    * Dimension side grows ×buckets, so this is for genuinely small dims (the
    * broadcast-ineligible middle ground). */
  def saltedJoin(
      fact: DataFrame, dim: DataFrame, key: String,
      factDistinguisher: String, buckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltCol(col(factDistinguisher), buckets))
    val explodedDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Registered query: [[saltedJoin]] of the orders fact against the
    * customer dimension on custkey, aggregated to per-nation order
    * counts/totals. The oracle is the PLAIN join+group-by — salting is a
    * physical rewrite, and row-for-row agreement with the unsalted form is
    * exactly its correctness contract. Exact-cents total keeps the compare
    * integer (no double-sum association noise). */
  def saltedCustomerOrdersAgg(s: SparkSession, d: String): DataFrame = {
    val fact = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
    val dim = Tables.customer(s, d)
      .select(col("c_custkey").as("o_custkey"), col("c_nationkey"))
    saltedJoin(fact, dim, "o_custkey", factDistinguisher = "o_orderkey")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents_sum"))
  }

  /** Registered query: salted two-phase aggregate over lineitem — result is
    * identical to the plain groupBy (the oracle), shuffle shape is not. */
  def saltedPricingAgg(s: SparkSession, d: String): DataFrame =
    saltedSumCount(
      Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity",
      distinguisher = "l_orderkey")
      .select(
        col("l_returnflag"),
        round(col("sum_l_quantity"), 2).as("sum_qty"),
        col("n_rows"))
}
