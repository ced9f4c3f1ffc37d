package graft.operators

import graft.Tables
import graft.functions.SketchFunctions.cmsEstimate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Count-Min-Sketch heavy hitters (SURVEY.md §2.11 D5) — completes the
  * mergeable-sketch trio the engine uses for corpus-scale cardinality
  * work: Bloom filter (incremental dedup pruning), HyperLogLog
  * (`approx_count_distinct`), and now CMS for frequency estimation.
  *
  * 100 TB shape: the sketch is ONE mergeable aggregate — every partition
  * folds its tokens into a local 4000×7 counter grid map-side and the
  * shuffle carries ~200 KB blobs, not token counts; the heavy-hitter probe
  * is a broadcast of that single blob against a k-row candidate frame. The
  * exact token count per candidate (a second keyed agg) exists here to
  * oracle the bound; at corpus scale the sketch REPLACES that exact pass.
  */
object Sketches {

  /** Bound-oracled heavy hitters (the q_ann_recall pattern): exact top-k
    * tokens with the CMS estimate checked against the one-sided CMS
    * guarantee — `exact ≤ est ≤ exact + 3εN`. With eps = 5e-4,
    * confidence = 0.999 (width 4000 × depth 7) and a fixed seed, the
    * estimate is DETERMINISTIC for a given corpus, so the flags are stable
    * oracle rows, and the 3εN slack puts the per-probe failure odds at
    * ~(1/6)⁷ per depth-row bound — negligible even before determinism. */
  def cmsHeavyHitters(s: SparkSession, d: String, k: Int = 20,
                      eps: Double = 5e-4): DataFrame = {
    val tokens = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
    val sketch = tokens.agg(
      expr(s"count_min_sketch(tok, ${eps}d, 0.999d, 42)").as("cms"),
      count(lit(1)).as("n_total"))
    val exactTop = tokens.groupBy(col("tok"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok").asc)
      .limit(k)
    exactTop.crossJoin(broadcast(sketch))
      .withColumn("est", cmsEstimate(col("cms"), col("tok")))
      .select(col("tok"), col("n_exact"),
        (col("est") >= col("n_exact")).cast("int").as("est_ge_exact"),
        (col("est") <= col("n_exact") + ceil(lit(3.0 * eps) * col("n_total"))).cast("int")
          .as("est_in_bound"))
  }
}
