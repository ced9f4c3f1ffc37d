package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Reproducible evidence generator for PLANS.md: dumps the formatted
  * physical plan of every headline query (`runMain graft.Plans [sfDir]`).
  * The plan audit's claims — pushed filters, broadcast dims, top-k without
  * global sort, id-only candidate shuffles — are re-checkable from this
  * output at any commit, not just narratively asserted. */
object Plans {
  val headline: Seq[String] = Seq(
    "q_pending", "q_pricing_summary", "q_join_dims", "q_join_fact", "q_topk",
    "q_pagination", "q_pagination_keyset", "q_asof_join", "q_near_dup_minhash",
    "q_cosine_near_dup_lsh", "q_ann_lsh", "q_ann_ivf_q8", "q_contamination",
    "q_decontaminate", "q_boilerplate_lines", "q_stratified_sample",
    "q_top_bigrams", "q_gopher_rules", "q_corpus_mix", "q_approx_distinct",
    "q_dedup_incremental", "q_lang_id", "q_corpus_shards", "q_unigram_logprob",
    "q_token_budget", "q_repeated_passages", "q_retention", "q_semantic_dedup",
    "q_window_range", "q_percent_rank", "q_unpivot", "q_higher_order",
    "q_date_features", "q_string_agg", "q_mix_weights", "q_dup_rate",
    "q_priority_sample", "q_explode_tokens", "q_conditional_agg",
    "q_source_overlap", "q_bm25", "q_pmi_bigrams", "q_token_entropy",
    "q_moments", "q_mode_value", "q_minhash_est", "q_moving_avg",
    "q_mad_outliers", "q_corr_stats", "q_lang_source_mi",
    "q_chi2_independence", "q_ks_test", "q_gini_tokens", "q_novelty",
    "q_passage_dedup", "q_zipf_slope", "q_densify_hours", "q_gap_islands",
    "q_ewma", "q_interpolate", "q_cume_distinct_users", "q_scd2",
    "q_hard_negatives", "q_upsample_balance", "q_seasonal_anomaly",
    "q_wau", "q_length_deciles", "q_transition_matrix", "q_value_histogram",
    "q_cohort_matrix", "q_bounce_rate", "q_cms_hh", "q_zorder",
    "q_stratum_topk", "q_cusum", "q_rfm", "q_reactivated",
    "q_ship_delay", "q_pareto", "q_growth_accounting", "q_ab_test",
    "q_weighted_median")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    headline.foreach { name =>
      println(s"\n==== $name ====")
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
