package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join — deferred stretch in SURVEY.md §2.5, built on
  * the union+window idiom rather than a range join.
  *
  * For each left row, pick the latest right row with the same key and
  * `right.ts <= left.ts`. A range-join formulation explodes into
  * |left|×|right|-per-key comparisons; the union+window form is one shuffle
  * on the key, one sort within partitions, and a running `last(ignoreNulls)`
  * — linear in input size, which is what survives a 100 TB event store.
  */
object AsOfJoin {

  /** Generic as-of join. Right columns arrive as one struct column `matched`
    * (null when no right row precedes the left row). Ties on ts: right rows
    * sort before left rows at the same timestamp (inclusive `<=` semantics);
    * among right rows with identical (key, ts), the highest tiebreak column
    * value wins. */
  def asOf(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightTiebreak: String): DataFrame = {
    val payloadFields = right.schema.fields.filterNot(f => keys.contains(f.name))
    val payloadType = StructType(payloadFields)
    val rightPayload = struct(payloadFields.map(f => col(f.name)).toSeq: _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType))
      .withColumn("__tb", lit(null).cast("long"))
    val r = right
      // derive the synthetic columns while right's own columns are in scope,
      // then align to the left schema (left data columns become nulls)
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__payload", rightPayload)
      .withColumn("__tb", col(rightTiebreak).cast("long"))
      .select((keys.map(col) ++ left.columns.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ Seq(col("__ts"), col("__side"), col("__payload"), col("__tb"))): _*)
    val unioned = l.select(r.columns.map(col).toSeq: _*).unionByName(r.select(r.columns.map(col).toSeq: _*))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__ts", "__side", "__payload", "__tb")
  }

  /** As-of with bounded staleness: a match older than `tolerance` before
    * the left timestamp counts as NO match (nulled) — the feature-store /
    * market-data semantics of "last known value, unless stale". Same
    * linear union+window plan; staleness is a post-window projection, so
    * the tolerance costs nothing extra at any scale. */
  def asOfWithTolerance(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTs: String, rightTs: String,
      rightTiebreak: String, tolerance: String): DataFrame =
    asOf(left, right, keys, leftTs, rightTs, rightTiebreak)
      .withColumn("matched",
        when(col(s"matched.$rightTs") >= col(leftTs) - expr(s"INTERVAL $tolerance"),
          col("matched")))

  /** Registered: purchases matched to the user's most recent view, but only
    * if that view happened within the last 2 hours. */
  def purchasesWithFreshView(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    asOfWithTolerance(purchases, views, Seq("user_id"), "ts", "ts",
      rightTiebreak = "event_id", tolerance = "2 HOURS")
      .select(
        col("event_id"), col("user_id"),
        col("matched.event_id").as("view_id"))
  }

  /** Registered query: each purchase as-of joined to the user's most recent
    * view (both streams drawn from `events`). */
  def purchasesWithLastView(s: SparkSession, d: String): DataFrame = {
    val events = Tables.events(s, d)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    asOf(purchases, views, Seq("user_id"), "ts", "ts", rightTiebreak = "event_id")
      .select(
        col("event_id"), col("user_id"),
        col("matched.event_id").as("view_id"))
  }
}
