package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference pipeline's relational spine, re-expressed over the driver's
  * `documents` corpus so every step has a DuckDB oracle
  * (reference FunctionApp2/process_data/__init__.py).
  *
  * Mapping: `documents.doc_id` plays `SourceTable.id`, document text plays
  * `text_column`, and a deterministic `doc_id % 2` synthesizes the
  * `processed` watermark flag the reference maintains
  * (__init__.py:41 read side, :101-103 write side).
  */
object Pipeline {

  /** S7 silver build: projection + concat_ws text assembly + flag column —
    * the ADF-copy replacement shape (applications/applications.tf:80-88).
    * concat_ws skips nulls exactly like the reference's available-text join. */
  def silverBuild(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id").as("id"),
      concat_ws(". ", col("source"), col("text")).as("text_column"),
      (col("doc_id") % 2).cast("int").as("processed"))

  /** THE core incremental query (P1+P2):
    * `SELECT id, text_column FROM SourceTable WHERE processed = 0`
    * (__init__.py:40-42). Filter + projection both push into the scan. */
  def pendingTexts(s: SparkSession, d: String): DataFrame =
    silverBuild(s, d)
      .filter(col("processed") === 0)
      .select(col("id"), col("text_column"))

  /** J1: mark-processed as a distributed join, replacing the reference's
    * driver-side `",".join(ids)` + `UPDATE ... WHERE id IN (...)` string
    * splice (__init__.py:99-103). `processedIds` stays a DataFrame — nothing
    * is ever collected; at scale this is a broadcast (small id set) or
    * shuffle (large) left-semi flag rewrite, then a partition overwrite of
    * the silver table. */
  def markProcessed(silver: DataFrame, processedIds: DataFrame): DataFrame = {
    val ids = processedIds.select(col("id").as("done_id")).distinct()
    silver
      .join(broadcast(ids), silver("id") === col("done_id"), "left")
      .withColumn(
        "processed",
        when(col("done_id").isNotNull, lit(1)).otherwise(col("processed")).cast("int"))
      .drop("done_id")
  }

  /** The mark-processed flow as a self-contained query: pending ids that a
    * scoring run handled (every third document) get flagged; result is the
    * post-merge silver state, aggregated for a stable small answer. */
  def markProcessedState(s: SparkSession, d: String): DataFrame = {
    val silver = silverBuild(s, d)
    val done = pendingTexts(s, d).filter(col("id") % 3 === 0).select(col("id"))
    markProcessed(silver, done)
      .groupBy(col("processed"))
      .agg(count(lit(1)).as("n_rows"))
  }

  /** G2/T5-shaped status aggregate: processed-state counts per source. */
  def processedBySource(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("processed", (col("doc_id") % 2).cast("int"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("processed")).as("n_processed"))
}
