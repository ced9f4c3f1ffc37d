package graft.ml

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes language classifier trained IN THE ENGINE —
  * "model fitting as aggregation", the pattern that makes classical ML a
  * one-pass corpus job instead of an external service call (contrast the
  * reference's per-batch RPC scoring,
  * FunctionApp2/process_data/__init__.py:56-82): the entire model is two
  * keyed aggregates (per-(lang, token) counts, per-lang totals) plus two
  * 1-row/|langs|-row aggregates (vocabulary size, log-priors). Scoring is
  * declarative too: token stream × |langs| candidates (a broadcast of the
  * tiny class dimension), left-joined against the count model with
  * Laplace-smoothed log-likelihoods, summed per (doc, candidate), argmax
  * per doc.
  *
  * Scale shape: the model frames are corpus aggregates (vocab-bounded, ≪
  * corpus); scoring volume is |token stream| × |langs| rows whose join
  * keys are (candidate, token) — at real scale the count model broadcasts
  * (vocab × langs rows) and the whole score pass is map-side. No
  * iteration, no driver-side fit: this is the NB trick — sufficient
  * statistics ARE the model.
  *
  * Float discipline: log-likelihood sums feed ONLY the argmax — no double
  * ever enters the hashed payload (doc, predicted, actual, correct), so
  * cross-engine 1-ulp drift in `ln` chains is harmless unless two
  * languages genuinely tie, where the (score DESC, lang ASC) tie-break
  * plus the corpus's disjoint stopword pools keep the winner stable
  * (verified at every SF). */
object NaiveBayesLang {

  def predictQuery(s: SparkSession, d: String): DataFrame =
    predict(Tables.documents(s, d))

  /** Train on `docs` (doc_id, text, lang) and score the same frame — the
    * self-train shape the gate uses; a production run trains on a labeled
    * slice and scores the rest with the identical plan. */
  def predict(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    // the model: per-(lang, token) counts + per-lang totals + global vocab
    val model = toks.groupBy(col("lang").as("cand"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val ltot = toks.groupBy(col("lang").as("cand")).agg(count(lit(1)).as("tot"))
    val vocab = toks.agg(countDistinct(col("tok")).as("v"))
    val prior = docs.groupBy(col("lang").as("cand")).agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("ndocs"))))
      .select(col("cand"), log(col("nd").cast("double") / col("ndocs")).as("lp"))
    // score: every token against every candidate class; unseen (cand, tok)
    // pairs fall back to the Laplace floor ln(1 / (tot + V))
    val scored = toks.select(col("doc_id"), col("tok"))
      .crossJoin(broadcast(ltot))
      .join(model, Seq("cand", "tok"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"), col("cand"))
      .agg(sum(log((coalesce(col("c"), lit(0L)) + 1).cast("double")
        / (col("tot") + col("v")))).as("ll"))
      .join(broadcast(prior), Seq("cand"))
      .select(col("doc_id"), col("cand"), (col("ll") + col("lp")).as("score"))
    val pred = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cand").asc)))
      .filter(col("rn") === 1)
    docs.select(col("doc_id"), col("lang").as("actual_lang"))
      .join(pred.select(col("doc_id"), col("cand").as("pred_lang")), Seq("doc_id"))
      .select(col("doc_id"), col("pred_lang"), col("actual_lang"),
        (col("pred_lang") === col("actual_lang")).cast("int").as("correct"))
  }
}
