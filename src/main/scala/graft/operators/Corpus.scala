package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators for LLM training-data pipelines (SURVEY.md
  * §2.11 north star, beyond the reference surface): benchmark
  * decontamination and deterministic data-mix sampling. Both are keyed or
  * scan-local — no all-pairs joins, no partition-dependent RNG.
  */
object Corpus {

  /** Benchmark-contamination check (training-data hygiene): flag documents
    * sharing any word n-gram with a probe/benchmark set. Both sides reduce
    * to 8-byte shingle hashes ([[Dedup.shingles]]), so the join shuffles
    * hashes, never text; the deduped probe side is usually small enough
    * that the optimizer broadcasts it (a benchmark is KBs against a corpus
    * of TBs). Returns (doc_id, n_overlap) for contaminated docs only —
    * anti-join against this set to decontaminate. */
  def contaminationCheck(docs: DataFrame, probes: DataFrame, n: Int = 3): DataFrame = {
    val docSh = Dedup.shingles(docs, n)
    val probeSh = Dedup.shingles(probes, n).select(col("shingle")).distinct()
    docSh.join(probeSh, Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** Registered: every 97th doc plays the held-out benchmark; the rest of
    * the corpus is checked against it. (Splitting one lazy shingle frame by
    * doc_id does NOT share the tokenize+hash pass — Catalyst pushes each
    * branch's filter below the distinct into its own scan, so the plan is
    * two pipelines either way. At pipeline scale the shingle table is a
    * materialized intermediate reused by dedup AND decontamination — that
    * staging, not plan-level sharing, is where the pass is actually saved.) */
  def contaminationQuery(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    contaminationCheck(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0))
  }

  /** Decontamination — the KEEP side of [[contaminationCheck]]: the training
    * corpus minus every document sharing an n-gram with the benchmark probes
    * (and minus the probes themselves). A left anti-join keyed on doc_id
    * against the contaminated set; at scale the contaminated id set is tiny
    * (contamination is rare by construction), so AQE broadcasts it and the
    * corpus never shuffles. */
  def decontaminatedDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val contaminated = contaminationCheck(train, docs.filter(col("doc_id") % 97 === 0))
    train.join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("source"))
  }

  /** Data-mix accounting: per-source doc/token counts and each source's
    * token share — the report a mix-weight decision reads. Aggregate first
    * (rows = #sources), then a global window over the TINY aggregate for
    * the share: the unpartitioned window is free because it sees one row
    * per source, never the corpus. */
  def corpusMixReport(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      .withColumn("token_share",
        round(col("n_tokens") / sum(col("n_tokens"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy()), 4))

  /** Temperature-smoothed sampling weights from the token shares — the
    * mix-weight rule behind multi-source pretraining mixes (LLaMA-style
    * share^α with α=0.5): raising small sources, damping dominant ones.
    * α=0.5 is written as `sqrt`, not `pow(x, 0.5)`, deliberately — IEEE 754
    * requires sqrt to be correctly rounded (identical on every engine and
    * libm), while pow is not, so the sqrt form is the one that
    * oracle-checks bit-for-bit. Same aggregate-then-tiny-window shape as
    * [[corpusMixReport]]: the windows see one row per source. */
  def mixWeights(s: SparkSession, d: String): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    Tables.documents(s, d)
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
      .groupBy(col("source"))
      .agg(sum(col("nt")).as("n_tokens"))
      .withColumn("share", col("n_tokens") / sum(col("n_tokens")).over(all))
      .withColumn("weight", round(sqrt(col("share")) / sum(sqrt(col("share"))).over(all), 4))
      .select(col("source"), col("n_tokens"), round(col("share"), 4).as("share"), col("weight"))
  }

  /** Duplicate-rate diagnostics per source: docs, distinct content
    * fingerprints, and the dup rate — the health report that decides where
    * dedup effort goes. Fingerprints are 8-byte hashes, so the distinct
    * count shuffles hashes, never text. */
  def dupRateBySource(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), xxhash64(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("fp")).as("n_unique"))
      .withColumn("dup_rate", round(lit(1.0) - col("n_unique") / col("n_docs"), 4))

  /** Curriculum decile binning: assign every document a length decile and
    * report per-decile corpus statistics — the "order training data easy →
    * hard" bucketing step. The scale story is the bucket ASSIGNMENT: a
    * global ntile() is a single-task window over the corpus (anti-pattern);
    * here the nine thresholds are ONE 1-row exact-percentile aggregate,
    * broadcast, and assignment is a scan-local array fold. Thresholds
    * interpolate over integer lengths, so a document can only sit exactly
    * on a threshold when the percentile lands on a data point (g = 0) —
    * where both engines return the exact integer — making the strict
    * comparison engine-portable. At 100 TB swap the exact percentile for
    * approx_percentile exactly as [[qualityQuantileGate]] pairs its forms. */
  def lengthDeciles(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val thresholds = docs.agg(
      expr("percentile(n_chars, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("th"))
    docs.crossJoin(broadcast(thresholds))
      .withColumn("decile",
        expr("aggregate(th, 1, (acc, t) -> acc + if(n_chars > t, 1, 0))"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
  }

  /** Class-balanced oversampling: replicate each document so every language
    * class reaches (at least) the majority class's size — the minority-class
    * upsampling step of an imbalanced training build. Integer-exact copy
    * counts: copies = ceil(target / n_class) computed in long division
    * ((t + n − 1) div n), no doubles anywhere, so the replication factor is
    * engine-portable. Scale shape: the class-count frame is |classes| rows
    * (one partial-agg shuffle), the target is a 1-row agg of THAT, both
    * broadcast back; the replication itself is a scan-local
    * explode(sequence) — the corpus is never shuffled to be copied, and
    * each emitted row carries its copy_id for downstream seed derivation. */
  def upsampleBalanced(s: SparkSession, d: String): DataFrame =
    upsampleBalancedFrame(Tables.documents(s, d))

  def upsampleBalancedFrame(docs: DataFrame): DataFrame = {
    val byClass = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_class"))
    val target = byClass.agg(max(col("n_class")).as("target"))
    val copies = byClass.crossJoin(broadcast(target))
      .select(col("lang"),
        expr("(target + n_class - 1) div n_class").as("copies"))
    // Two-level explode (ADVICE r04): a singleton minority class against a
    // large majority yields copies ≈ |majority| — materializing that as ONE
    // sequence() array on one row risks Spark's array-length limit / OOM.
    // Chunked, no row carries more than ChunkSize elements (chunk index
    // array is copies/ChunkSize — bounded small for any real imbalance),
    // and the emitted copy_id stream 1..copies is unchanged.
    val ChunkSize = 4096L
    docs.join(broadcast(copies), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("copies"),
        explode(expr(s"sequence(0L, (copies - 1) div $ChunkSize)")).as("chunk"))
      .select(col("doc_id"), col("lang"),
        explode(expr(
          s"sequence(chunk * $ChunkSize + 1, least(copies, (chunk + 1) * $ChunkSize))"))
          .as("copy_id"))
  }

  /** Exact-size weighted sample: k docs chosen by deterministic LCG
    * priority, with per-source weights applied as integer divisors (weight
    * 4 → priorities 4× smaller → 4× the selection odds at any k). Unlike
    * the fraction-based [[stratifiedSample]] this guarantees EXACTLY k rows
    * — the "give me exactly 10k docs" request. The plan is the point: a
    * global top-k by priority is TakeOrderedAndProject (per-partition heads
    * + k-row driver merge, spec-asserted), so no global sort and no window
    * ever sees the corpus. */
  def prioritySample(docs: DataFrame, k: Int, weights: Map[String, Int]): DataFrame = {
    val w = weights.foldLeft(lit(1L)) { case (acc, (src, wt)) =>
      when(col("source") === src, lit(wt.toLong)).otherwise(acc)
    }
    docs
      .withColumn("priority", floor(lcgStep(col("doc_id")) / w))
      .orderBy(col("priority").asc, col("doc_id").asc)
      .limit(k)
  }

  /** Registered: exactly 200 docs, src0 weighted 4×, src1 2×. */
  def prioritySampleQuery(s: SparkSession, d: String): DataFrame =
    prioritySample(Tables.documents(s, d), 200, Map("src0" -> 4, "src1" -> 2))
      .select(col("doc_id"), col("source"), col("priority"))

  /** Exact-k per-stratum sample: deterministic LCG priorities ranked WITHIN
    * each source — the per-group complement of [[prioritySample]]'s global
    * TakeOrderedAndProject. The rank window partitions by source and the
    * rank ≤ k filter plans as WindowGroupLimit, so each task keeps only its
    * k-per-group survivors BEFORE the shuffle — per-reducer input is
    * k×groups, not the corpus. Selection is a pure function of doc_id
    * (cluster-size invariant, like every sampler here). */
  def stratumTopK(s: SparkSession, d: String, k: Int = 50): DataFrame =
    stratumTopKFrame(Tables.documents(s, d), k)

  def stratumTopKFrame(docs: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").asc, col("doc_id").asc)
    docs
      .withColumn("priority", lcgStep(col("doc_id")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** Deterministic [0,100) bucket from a long key: one LCG step with the
    * bucket taken from the HIGH bits (the low bits of a·x+c mod 2³¹ are
    * poorly equidistributed). Engine-portable — the same rows sample on
    * Spark, in DuckDB, or at any cluster size/partitioning, unlike
    * `df.sample`'s partition-seeded RNG. The key is reduced mod 2³¹ BEFORE
    * the multiply so the product stays under 2⁶² — without that, a key
    * past ~8.4e9 silently wraps on Spark but raises out-of-range in
    * engines with checked arithmetic, breaking the portability contract. */
  def hashBucket(key: Column): Column =
    floor(lcgStep(key) * lit(100L) / lit(2147483648.0)).cast("int")

  /** One engine-portable LCG step: a·(key mod 2³¹)+c mod 2³¹ — the shared
    * primitive under [[hashBucket]] and [[shardOf]]. */
  def lcgStep(key: Column): Column =
    pmod(pmod(key, lit(2147483648L)) * lit(1103515245L) + lit(12345L), lit(2147483648L))

  /** Deterministic shard id in [0, nShards) from a long key — high bits of
    * the LCG step, same equidistribution argument as [[hashBucket]]. */
  def shardOf(key: Column, nShards: Int): Column =
    floor(lcgStep(key) * lit(nShards.toLong) / lit(2147483648.0)).cast("int")

  /** Training-mix construction: per-source sampling rates (percent) applied
    * deterministically. A pure projection + filter — the sampling decision
    * rides the scan (no shuffle), and re-running over a grown corpus keeps
    * every previously-sampled row (stable mixes across pipeline runs). */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
                       defaultRate: Int): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultRate)) { case (acc, (src, pct)) =>
      when(col("source") === src, lit(pct)).otherwise(acc)
    }
    docs
      .withColumn("bucket", hashBucket(col("doc_id")))
      .filter(col("bucket") < rateCol)
  }

  /** Registered: oversample src0 (80%), midweight src1 (50%), 20% baseline. */
  def sampleQuery(s: SparkSession, d: String): DataFrame =
    stratifiedSample(Tables.documents(s, d), Map("src0" -> 80, "src1" -> 50), 20)
      .select(col("doc_id"), col("source"), col("bucket"))

  /** Train/val/test split manifest: every document deterministically
    * assigned 80/10/10 by its [[hashBucket]] (engine-portable LCG — the
    * same doc lands in the same split on any engine, cluster size, or
    * partitioning; `randomSplit` guarantees none of that), then audited per
    * (split, lang): counts, char volume, and an id checksum so two
    * independent materializations of "the" split can be diffed cheaply.
    * Scale shape: split assignment rides the scan (pure projection), the
    * manifest is one partial-agg shuffle of |splits × langs| rows. */
  def splitManifest(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_sum"),
        sum(col("doc_id")).as("id_checksum"))

  /** LEAKAGE-FREE split: the [[splitManifest]] assignment with the split
    * decision made per NEAR-DUP CLUSTER instead of per document — the hash
    * key is the component label of the exact-pair graph (own doc_id for
    * singletons), so two near-duplicates can never straddle train/test.
    * Per-doc hashing silently leaks: a planted dup pair splits train/test
    * with probability 2·0.8·0.2, and eval contamination at corpus scale is
    * exactly this failure mode (the reason dedup-then-split is the
    * standard order in training-data pipelines). The emitted `leak_free`
    * flag re-derives the guarantee end-to-end (max splits-per-group = 1) —
    * it reds if anyone re-keys the hash back to doc_id.
    *
    * Scale shape: labels come from the [[Graph.connectedComponentsStar]]
    * fixpoint over the memoized bounded pair artifact (at real scale, the
    * full LSH pair stream — same dataflow); the assignment is a left join
    * of the corpus against the |clustered docs|-row label frame (broadcast
    * at any realistic dup rate) and the hash rides the scan. The audit is
    * one partial-agg shuffle of |splits| rows plus a group-keyed
    * distinct-split check that only touches (grp, split) pairs. */
  def clusterSplit(s: SparkSession, d: String): DataFrame = {
    val labels = Graph.triClusterLabels(s, d)
    val assigned = Tables.documents(s, d).select(col("doc_id"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("grp"),
        col("cluster").isNotNull.cast("int").as("clustered"))
      .withColumn("bucket", hashBucket(col("grp")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
    val leak = assigned.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .agg(max(col("ns")).as("mx"))
    assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("clustered")).as("n_clustered"),
        countDistinct(col("grp")).as("n_groups"),
        sum(col("doc_id")).as("id_checksum"))
      .crossJoin(broadcast(leak))
      .select(col("split"), col("n_docs"), col("n_clustered"),
        col("n_groups"), col("id_checksum"),
        (col("mx") === 1).cast("int").as("leak_free"))
  }

  /** The END-TO-END pretraining data pipeline as ONE query — quality gate
    * → exact dedup → split assignment → shard layout → manifest — the
    * composition a user of this library actually runs nightly, gated as a
    * single hash compare so the STAGE INTERACTIONS are under test, not
    * just each stage alone (a dedup that ran before the quality filter, or
    * a split keyed on the pre-dedup id set, produces different counts).
    * Stages reuse the registered operators verbatim: [[TextAnalysis
    * .gopherRules]] `pass`, min-id-per-text exact dedup, [[hashBucket]]
    * 80/10/10 split, [[shardOf]] 8-way layout.
    *
    * Scale shape: quality flags ride the scan; the dedup window shuffles
    * once on the text key (at 100 TB, on xxhash64(text) — the
    * [[Dedup.exactDedup]] note); split/shard hashes ride the scan; the
    * manifest is one |splits × shards|-row partial agg. One wide shuffle
    * total for the whole pipeline. */
  def pretrainManifest(s: SparkSession, d: String): DataFrame = {
    // four of the five gopher flags: the stopword flag is an ENGLISH prior
    // (the canonical 8-word list) that zeroes this synthetic corpus — 0/500
    // docs carry 2 of them — and a pipeline gate that keeps nothing tests
    // nothing; the word-count flag alone already drops ~45% (277/500 pass
    // at sf0.01), so the composed filter is a real filter
    val passed = TextAnalysis.gopherRules(s, d)
      .filter(col("flag_word_count") === 1 && col("flag_mean_word_len") === 1 &&
        col("flag_symbol_ratio") === 1 && col("flag_alpha_words") === 1)
      .select(col("doc_id"), col("n_tokens"))
    val withText = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .join(passed, Seq("doc_id"))
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id").asc)
    withText.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .withColumn("bucket", hashBucket(col("doc_id")))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))
      .withColumn("shard", shardOf(col("doc_id"), 8))
      .groupBy(col("split"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("tokens_sum"),
        sum(col("doc_id")).as("id_checksum"))
  }

  /** Largest-remainder apportionment of a fixed token budget across
    * languages: each language gets ⌊K·w/W⌋ tokens (w = its char volume, W =
    * total), and the K − Σ⌊·⌋ leftover slots go to the largest integer
    * remainders K·w mod W (ties broken lexically). The standard exact way to
    * make proportional corpus quotas sum EXACTLY to the budget — per-class
    * rounding never drifts the total. Integer end to end: products, floors,
    * and mods are exact in both engines, so the compare has no float edge.
    * Scale shape: one partial-agg shuffle to |langs| rows; the apportionment
    * (window rank over remainders + the 1-row W broadcast) runs on the tiny
    * aggregate only. */
  def tokenBudgetAlloc(s: SparkSession, d: String, budget: Long = 1000000L): DataFrame =
    apportion(
      Tables.documents(s, d).groupBy(col("lang")).agg(sum(col("n_chars")).as("w")),
      budget)
      .withColumnRenamed("w", "chars")

  /** Temperature-flattened data mix (α = 0.5): quotas proportional to
    * √(char volume) instead of raw volume — the standard multilingual
    * flattening that upweights low-resource languages without letting any
    * one language dominate. The tempered weight is ⌊√w⌋ so the
    * apportionment stays in exact integer arithmetic: IEEE sqrt is
    * correctly rounded in BOTH engines (unlike pow(x, α) for general α,
    * whose last-ulp noise could flip a floor), so the floor is
    * engine-deterministic. Same scale shape as [[tokenBudgetAlloc]]. */
  def temperatureMix(s: SparkSession, d: String, budget: Long = 1000000L): DataFrame =
    apportion(
      Tables.documents(s, d).groupBy(col("lang"))
        .agg(floor(sqrt(sum(col("n_chars")))).cast("long").as("w")),
      budget)
      .withColumnRenamed("w", "tempered_w")

  /** Annealed mixture SCHEDULE (`q_mix_schedule`) — curriculum data
    * scheduling: the training mix is not ONE weight vector but a per-step
    * sequence, here linearly annealed from the natural
    * (volume-proportional) source mix at step 1 to the uniform mix at
    * step `steps` — the standard curriculum that starts on the head
    * distribution and flattens toward balanced coverage. Integer end to
    * end: the interpolated weight is
    * w_s = (S−s)·chars + (s−1)·(ctot DIV nsrc) — both terms non-negative,
    * so Spark `DIV` ≡ DuckDB `//` everywhere — and each step's
    * allocations are largest-remainder apportioned (the
    * [[tokenBudgetAlloc]] contract, window partitioned by step) so every
    * step sums EXACTLY to budget DIV steps; no float ever appears.
    * Scale shape: one |sources| partial-agg shuffle; all schedule
    * arithmetic runs on the steps×sources frame (tens of rows at any
    * corpus size). */
  def mixSchedule(s: SparkSession, d: String, budget: Long = 1000000L,
                  steps: Int = 10): DataFrame = {
    val stepBudget = budget / steps
    val bySrc = Tables.documents(s, d)
      .groupBy(col("source")).agg(sum(col("n_chars")).as("chars"))
    val tot = bySrc.agg(sum(col("chars")).as("ctot"), count(lit(1)).as("nsrc"))
    val stepped = bySrc.crossJoin(broadcast(tot))
      .select(col("source"), col("chars"), col("ctot"), col("nsrc"),
        explode(sequence(lit(1L), lit(steps.toLong))).as("step"))
      .withColumn("w",
        (lit(steps.toLong) - col("step")) * col("chars")
          + (col("step") - lit(1L)) * expr("ctot div nsrc"))
    val wStep = Window.partitionBy(col("step"))
    val wRem = Window.partitionBy(col("step")).orderBy(col("rem").desc, col("source").asc)
    stepped
      .withColumn("wtot", sum(col("w")).over(wStep))
      .withColumn("base", expr(s"($stepBudget * w) div wtot"))
      .withColumn("rem", expr(s"($stepBudget * w) % wtot"))
      .withColumn("rk", row_number().over(wRem))
      .withColumn("deficit", lit(stepBudget) - sum(col("base")).over(wStep))
      .select(col("step"), col("source"), col("w"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** DSIR-style importance weights (Data Selection via Importance
    * Resampling): score every training document by how much more likely its
    * hashed bigram features are under a target/benchmark distribution than
    * under the corpus distribution — Σ_f [ln p̂_target(f) − ln p̂_corpus(f)]
    * with add-one smoothing over a fixed 65536-bucket feature space. The
    * feature is the first 4 hex chars of md5(bigram): engine-portable (md5
    * is the proven cross-engine hash here) and bounded, so the ratio table
    * can never exceed 65536 rows. Target = the doc_id % 97 == 0 probe slice
    * (the same held-out set the contamination check uses); weights are
    * emitted for the remaining corpus.
    *
    * Scale shape: two partial-agg shuffles build the ≤65536-row feature
    * tables; the ratio table broadcasts back onto the exploded doc-feature
    * stream, so per-doc scoring is a map-side join + one groupBy(doc_id).
    * At 100 TB the ratio table is a persisted artifact of the target set —
    * rescoring the corpus against a new benchmark never reshuffles the
    * corpus. */
  /** Exploded doc-feature stream memoized per (session, dir) — the
    * tokenize + bigram + md5 pipeline is referenced THREE times in the
    * DSIR plan (target counts, corpus counts, scoring join); unmemoized,
    * the lazy plan re-runs the corpus pass for each reference — the same
    * pathology the graph/containment artifacts hoist. At cluster scale
    * this is the staged feature table the scoring job reads. */
  @transient private lazy val dsirCache =
    new SessionCache[String, DataFrame](_.unpersist())

  /** Whole-module corpus-replacement hook (round-12 ADVICE): drop the
    * dir-keyed DSIR feature table and source-shingle sets for `d`.
    * Chained from [[graft.streaming.EventsStream.invalidateCorpus]]. */
  def invalidateCorpus(d: String): Unit = {
    dsirCache.invalidateIfAll(_ == d)
    sourceShingleCache.invalidateIfAll(_._1 == d)
  }

  def dsirFeatureArtifact(s: SparkSession, d: String): DataFrame =
    dsirCache.getOrCompute(s, d) {
      StageCache.throughDf(s, d, "dsir-features") {
      Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), " +
            "i -> substring(md5(concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2))), 1, 4))"))
          .as("feat"))
      }.persist()
    }

  def dsirWeights(s: SparkSession, d: String): DataFrame = {
    val V = 65536L
    val feats = dsirFeatureArtifact(s, d)
    val isTarget = col("doc_id") % 97 === 0
    val tgt = feats.filter(isTarget).groupBy(col("feat")).agg(count(lit(1)).as("ct"))
    val crp = feats.filter(!isTarget).groupBy(col("feat")).agg(count(lit(1)).as("cn"))
    val totals = tgt.agg(sum(col("ct")).as("nt"))
      .crossJoin(crp.agg(sum(col("cn")).as("nc")))
    val ratio = tgt.join(crp, Seq("feat"), "full")
      .na.fill(0L, Seq("ct", "cn"))
      .crossJoin(broadcast(totals))
      .select(col("feat"),
        (log((col("ct") + 1).cast("double") / (col("nt") + V).cast("double"))
          - log((col("cn") + 1).cast("double") / (col("nc") + V).cast("double")))
          .as("llr"))
    feats.filter(!isTarget)
      .join(broadcast(ratio), Seq("feat"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"), round(sum(col("llr")), 4).as("dsir_weight"))
  }

  /** Largest-remainder apportionment of `budget` over a (lang, w) frame —
    * see [[tokenBudgetAlloc]] for the contract. Total column named wtot,
    * not W: Spark resolves case-insensitively by default, so `w` vs `W` is
    * an AMBIGUOUS_REFERENCE. */
  private def apportion(byLang: DataFrame, budget: Long): DataFrame = {
    val total = byLang.agg(sum(col("w")).as("wtot"))
    val based = byLang.crossJoin(broadcast(total))
      .select(col("lang"), col("w"),
        expr(s"($budget * w) div wtot").as("base"),
        expr(s"($budget * w) % wtot").as("rem"))
    val wRem = Window.orderBy(col("rem").desc, col("lang").asc)
    val wAll = Window.partitionBy()
    based
      .withColumn("rk", row_number().over(wRem))
      .withColumn("deficit", lit(budget) - sum(col("base")).over(wAll))
      .select(col("lang"), col("w"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** The composed corpus-construction pipeline in one query — the shape a
    * real pretraining data build runs nightly: quality gate (token-length
    * band) → exact dedup on the normalized fingerprint (order-insensitive
    * token multiset, keep lowest doc_id) → deterministic per-source
    * sampling → per-source accounting. One window shuffle (fingerprint) +
    * one final aggregation; the quality gate and sampler ride the scan.
    * Fully SQL-expressible, so the whole composition is oracle-checked
    * end to end. */
  def corpusBuild(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val quality = Tables.documents(s, d)
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
      .filter(col("nt") >= 20 && col("nt") <= 1000)
    val deduped = quality
      .withColumn("fp",
        md5(concat_ws(" ", sort_array(split(lower(col("text")), "\\s+"))).cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    stratifiedSample(deduped, Map("src0" -> 80, "src1" -> 50), 20)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
  }

  /** Quantile quality gate: keep each language's top `keep` fraction of
    * documents by token count — the relative-threshold filter a multi-lingual
    * corpus needs (an absolute token cutoff over-prunes terse languages).
    * percent_rank over (lang) with a full deterministic ordering, so the
    * kept set is stable and oracle-checkable.
    *
    * Scale note: the window sorts each language partition. At 100 TB the
    * same gate is two passes with no global sort: `approx_percentile(nt,
    * 1-keep)` per lang (one partial-agg shuffle), broadcast the thresholds,
    * filter on the scan. The window form is the exact-semantics baseline
    * the approx pass is validated against. */
  def qualityQuantileGate(s: SparkSession, d: String, keep: Double = 0.2): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("nt").desc, col("doc_id").asc)
    Tables.documents(s, d)
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
      .withColumn("pct_rank", percent_rank().over(w))
      .filter(col("pct_rank") <= keep)
      .select(col("doc_id"), col("lang"), col("nt").as("n_tokens"), col("pct_rank"))
  }

  /** The 100 TB form of [[qualityQuantileGate]]: per-language thresholds via
    * `approx_percentile` (one partial-agg shuffle, no per-language sort),
    * broadcast back onto the scan as a filter. Keeps ~the same fraction with
    * approx-sketch error instead of exactly floor(keep·(n-1))+1 rows —
    * CorpusSpec pins ≥95% agreement with the exact window form. */
  def qualityGateByThreshold(s: SparkSession, d: String, keep: Double = 0.2): DataFrame = {
    val docs = Tables.documents(s, d)
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
    val thresholds = docs.groupBy(col("lang"))
      .agg(percentile_approx(col("nt"), lit(1.0 - keep), lit(10000)).as("nt_min"))
    docs.join(broadcast(thresholds), Seq("lang"))
      .filter(col("nt") >= col("nt_min"))
      .select(col("doc_id"), col("lang"), col("nt").as("n_tokens"))
  }

  /** Context-window chunking (training example construction): split each
    * document into fixed-size token chunks with overlap (stride =
    * chunkTokens − overlap, the sliding-window convention). A pure
    * projection + explode — chunk boundaries depend only on the row, so the
    * operator is scan-local, shuffle-free, and trivially partition-invariant.
    * Long docs become ⌈(n−overlap)/stride⌉ chunks; docs at or under one
    * window stay whole. */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 256, overlap: Int = 32): DataFrame = {
    require(overlap < chunkTokens, "overlap must be smaller than the chunk")
    val stride = chunkTokens - overlap
    docs
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(expr(
          // last chunk start: largest multiple of stride still < n (and >= 0)
          s"sequence(0, greatest(CAST(ceil((n - $overlap) / $stride.0) AS INT) - 1, 0) * $stride, $stride)"))
          .as(Seq("chunk_id", "start")))
      .filter(col("start") < col("n"))
      .select(
        col("doc_id"), col("chunk_id").cast("int").as("chunk_id"),
        least(lit(chunkTokens), col("n") - col("start")).cast("int").as("chunk_tokens"),
        concat_ws(" ", slice(col("toks"), col("start") + 1, lit(chunkTokens))).as("chunk_text"))
  }

  /** Registered: chunk accounting (id, size, text hash — hashing the text
    * keeps the oracle exact without shipping chunk bodies to the dump). */
  def chunkQuery(s: SparkSession, d: String): DataFrame =
    chunkDocs(Tables.documents(s, d))
      .select(col("doc_id"), col("chunk_id"), col("chunk_tokens"),
        md5(col("chunk_text").cast("binary")).as("chunk_md5"))

  final case class PackedDoc(bin_id: Long, doc_id: Long, n_tokens: Int)

  /** Sequence packing (training-batch construction): greedy next-fit of
    * documents into fixed token-budget bins. Packing is strictly
    * per-partition — bin ids are (partitionId << 32 | local counter), so
    * there is NO cross-partition coordination or global sequential pass;
    * 1000 executors pack 1000 partitions independently (the per-partition
    * greedy loop is one of the few genuinely imperative per-row operations,
    * hence `mapPartitions` — SURVEY.md §2.12's last-resort tier, used for
    * the one operator whose semantics are inherently sequential-per-bin).
    * Partitioning is deterministic: hash-repartition on the doc key, sorted
    * within partition, so reruns produce identical bins. Docs longer than
    * the budget get a bin of their own (the downstream truncation decision
    * stays downstream). */
  def packSequences(docs: DataFrame, budget: Int, partitions: Int = 8): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"),
        TextAnalysis.tokenCount(col("text")).cast("int").as("n_tokens"))
      .repartition(partitions, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Int)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var bin = pid << 32
        var fill = 0
        it.map { case (docId, n) =>
          if (fill > 0 && fill + n > budget) { bin += 1; fill = 0 }
          fill += n
          PackedDoc(bin, docId, n)
        }
      }
  }

  /** Registered (rows-only companion kept for inspection): per-bin
    * occupancy of the 512-token packing. */
  def packQuery(s: SparkSession, d: String): DataFrame =
    packSequences(Tables.documents(s, d), budget = 512).toDF()
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))

  /** [[packSequences]] promoted to a bound oracle (round-7 VERDICT ask #4):
    * bin ids encode Spark's hash partitioning, so the layout itself is not
    * SQL-expressible — the gate payload is the layout's conservation laws
    * instead, each exactly recomputable or deterministically pinnable by
    * the oracle: doc/token totals (DuckDB recomputes
    * [[TextAnalysis.tokenCount]] verbatim), conservation (every doc packed
    * exactly once, token mass preserved through packing), no-overflow (a
    * bin exceeds the budget only as a single oversized doc — the next-fit
    * contract), and the bin-count bounds (≥ the token-volume lower bound
    * ⌈Σn/B⌉ since no bin can hold more than B except singletons — which
    * hold ≥B themselves — and ≤ one bin per doc). Per-bin layout stays
    * pinned by CorpusSpec. */
  def packGate(s: SparkSession, d: String, budget: Int = 512): DataFrame = {
    val bins = packSequences(Tables.documents(s, d), budget).toDF()
      .groupBy(col("bin_id"))
      .agg(count(lit(1)).as("bin_docs"), sum(col("n_tokens")).as("bin_tokens"))
    val packedAgg = bins.agg(
      count(lit(1)).as("n_bins"),
      sum(col("bin_docs")).as("docs_packed"),
      sum(col("bin_tokens")).as("tokens_packed"),
      sum(when(col("bin_tokens") > budget && col("bin_docs") > 1, 1L)
        .otherwise(0L)).as("overflow_bins"))
    val raw = Tables.documents(s, d).agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("total_tokens"))
    packedAgg.crossJoin(broadcast(raw)).select(
      col("n_docs"),
      col("total_tokens"),
      (col("docs_packed") === col("n_docs") &&
        col("tokens_packed") === col("total_tokens")).cast("int")
        .as("conservation_ok"),
      (col("overflow_bins") === 0).cast("int").as("no_overflow"),
      (col("n_bins") >= ceil(col("total_tokens") / lit(budget.toDouble)) &&
        col("n_bins") <= col("n_docs")).cast("int").as("bins_in_bound"))
  }

  // ------------------------------------------------------- Sharded export

  /** Deterministic corpus shuffle + shard assignment — the export step that
    * feeds a training run: every doc gets a shard in [0, nShards) and a
    * pseudo-random within-shard order, both pure functions of doc_id (the
    * portable LCG, [[lcgStep]]). Re-running over the same corpus yields
    * byte-identical shards at ANY cluster size or partition count — unlike
    * `orderBy(rand())`, whose partition-seeded RNG reshuffles on every
    * topology change. Scan-local projection: the only shuffle is the
    * writer's repartition on shard id. */
  def shardAssignments(docs: DataFrame, nShards: Int): DataFrame =
    docs
      .withColumn("ord", lcgStep(col("doc_id")))
      .withColumn("shard", shardOf(col("doc_id"), nShards))

  /** Registered: per-shard manifest of a 16-shard export — doc/char totals
    * plus an order checksum, so the oracle pins the whole assignment
    * arithmetic AND the shuffle order, not just the bucketing. */
  def shardManifest(s: SparkSession, d: String, nShards: Int = 16): DataFrame =
    shardAssignments(Tables.documents(s, d), nShards)
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_sum"),
        sum(col("doc_id")).as("id_sum"),
        min(col("ord")).as("ord_min"),
        max(col("ord")).as("ord_max"))

  /** Write the shuffled shards: one directory per shard, rows in shuffled
    * (`ord`) order inside each. `repartition(shard)` gives the writer task
    * exactly one shard's rows; `sortWithinPartitions` makes the file order
    * the shuffle order — at 100 TB this is one shuffle keyed on the shard
    * id, and shard size is corpus/nShards by the LCG's equidistribution
    * (no coordinator, no skew beyond statistical noise). */
  def writeShards(docs: DataFrame, nShards: Int, outDir: String): Unit =
    shardAssignments(docs, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  // ------------------------------------------------- Budgeted selection

  /** Token-budget corpus selection WITHOUT a global sort: keep the
    * highest-value documents (n_chars desc, doc_id asc) until a char budget
    * is exhausted — the "fill the training budget with the best data" step.
    *
    * The naive form is a corpus-wide ordered running-sum window (single
    * task, the pagination anti-pattern). This is the two-pass scale shape:
    * (1) aggregate a per-value histogram — rows = distinct n_chars values,
    * thousands at most — and run the cumulative sum over THAT (the
    * unpartitioned window is free on a tiny frame, the corpus_mix
    * argument); (2) broadcast-join the annotated histogram back and keep
    * fully-funded buckets outright, while the single boundary bucket
    * admits rows by doc_id rank while they fit — rows in a bucket share
    * one n_chars, so the in-bucket prefix sum is rank·n_chars and the
    * only window partitions on the bucket value. Row-for-row equal to the
    * naive global window, which is exactly what the oracle runs. */
  def tokenBudgetSelect(docs: DataFrame, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val hist = docs.groupBy(col("n_chars"))
      .agg(sum(col("n_chars")).as("bucket_chars"))
      .withColumn("cum_before", coalesce(sum(col("bucket_chars")).over(w), lit(0L)))
      .withColumn("bucket_full", col("cum_before") + col("bucket_chars") <= budget)
      .withColumn("remaining", lit(budget) - col("cum_before"))
      .select(col("n_chars"), col("bucket_full"), col("remaining"))
    val bucketW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_chars")).orderBy(col("doc_id").asc)
    docs.join(broadcast(hist), Seq("n_chars"))
      .withColumn("rn", row_number().over(bucketW))
      .filter(col("bucket_full") ||
        (col("rn").cast("long") * col("n_chars") <= col("remaining")))
      .select(col("doc_id"), col("n_chars"))
  }

  /** Registered: select the best ~50k chars of the corpus. */
  def budgetQuery(s: SparkSession, d: String): DataFrame =
    tokenBudgetSelect(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      budget = 50000L)

  // -------------------------------------------------- End-to-end export

  /** The whole corpus layer as ONE orchestrated build — what a nightly
    * training-data job actually runs, end to end: token-band quality gate →
    * exact dedup on the normalized fingerprint → benchmark decontamination
    * → deterministic per-source sampling → 16-shard shuffled export to
    * `outDir` (plus a written manifest for the run's accounting).
    * Deterministic throughout (LCG sampling/sharding, fingerprint windows,
    * keyed joins), so a re-run over the same corpus overwrites byte-stable
    * shards — the idempotence a scheduler retry needs. Returns the shard
    * manifest frame read back from the written export (doc/char totals per
    * shard), so callers audit what actually landed, not what was planned. */
  def buildAndExport(s: SparkSession, d: String, outDir: String,
                     nShards: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("fp")).orderBy(col("doc_id").asc)
    val docs = Tables.documents(s, d)
    val quality = docs
      .withColumn("nt", TextAnalysis.tokenCount(col("text")))
      .filter(col("nt") >= 20 && col("nt") <= 1000)
    val deduped = quality
      .withColumn("fp",
        md5(concat_ws(" ", sort_array(split(lower(col("text")), "\\s+"))).cast("binary")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("fp", "rn")
    val probes = docs.filter(col("doc_id") % 97 === 0)
    val clean = deduped
      .filter(col("doc_id") % 97 =!= 0)
      .join(contaminationCheck(deduped, probes), Seq("doc_id"), "left_anti")
    val sampled = stratifiedSample(clean, Map("src0" -> 80, "src1" -> 50), 20)
      .drop("bucket", "nt")
    writeShards(sampled, nShards, s"$outDir/shards")
    val manifest = s.read.parquet(s"$outDir/shards")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars_sum"))
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    s.read.parquet(s"$outDir/manifest")
  }

  private val sourceShingleCache =
    new SessionCache[(String, Int), DataFrame](_.unpersist())

  /** Distinct (source, shingle-hash) set — the corpus artifact under
    * [[sourceOverlap]]. Memoized per (session, dir, n) like the other
    * one-off corpus builds (Dedup shingles, IVF cells, RP signatures): the
    * overlap query references it three times (self-join + totals), and at
    * scale this is a materialized table, not a recomputed subquery. */
  /** Mutual information between the lang and source labels — the corpus
    * audit for "does one crawl source dominate a language" (a skewed
    * lang×source joint means per-source sampling silently reweights
    * languages). Per-cell pointwise MI plus each cell's contribution to the
    * total; all probabilities are ratios of integer counts from ONE
    * contingency aggregation plus broadcast-sized marginal rejoins. */
  def langSourceMi(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val joint = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_xy"))
    val mx = joint.groupBy(col("lang")).agg(sum(col("n_xy")).as("n_x"))
    val my = joint.groupBy(col("source")).agg(sum(col("n_xy")).as("n_y"))
    val tot = joint.agg(sum(col("n_xy")).cast("double").as("n_tot"))
    joint
      .join(broadcast(mx), Seq("lang"))
      .join(broadcast(my), Seq("source"))
      .crossJoin(broadcast(tot))
      .select(
        col("lang"), col("source"), col("n_xy"),
        round(log(col("n_xy") * col("n_tot") / (col("n_x") * col("n_y"))), 4).as("pmi"),
        round((col("n_xy") / col("n_tot")) *
          log(col("n_xy") * col("n_tot") / (col("n_x") * col("n_y"))), 6).as("mi_term"))
  }

  /** Chi-square test of lang ⟂ source independence — the significance
    * companion of [[langSourceMi]]: Σ (observed − expected)² / expected over
    * the contingency cells, with degrees of freedom. The 1-row output is an
    * aggregation OF an aggregation (cells, then the statistic) — nothing
    * corpus-sized past the first shuffle. */
  def langSourceChi2(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val joint = docs.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_xy"))
    val mx = joint.groupBy(col("lang")).agg(sum(col("n_xy")).as("n_x"))
    val my = joint.groupBy(col("source")).agg(sum(col("n_xy")).as("n_y"))
    val tot = joint.agg(sum(col("n_xy")).cast("double").as("n_tot"))
    joint
      .join(broadcast(mx), Seq("lang"))
      .join(broadcast(my), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("e", col("n_x") * col("n_y") / col("n_tot"))
      .agg(
        round(sum((col("n_xy") - col("e")) * (col("n_xy") - col("e")) / col("e")), 4)
          .as("chi2"),
        ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1))
          .as("dof"),
        count(lit(1)).as("n_cells"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between two sources' document
    * length distributions — the drift detector for "did this crawl batch
    * change shape" (re-crawl QA, corpus-mix monitoring). D = max |F_a − F_b|
    * over the pooled support.
    *
    * Scale shape: the corpus reduces to per-(value, side) counts FIRST (one
    * partial-agg shuffle), so the cumulative window runs over the
    * |distinct lengths|-sized aggregate — the same
    * SinglePartition-over-an-aggregate pattern as q_mix_weights, by
    * construction never over corpus rows. The max-abs-diff is
    * order-independent, so the statistic is engine-exact on integer
    * counts. */
  def ksLengthTest(s: SparkSession, d: String,
                   srcA: String = "src0", srcB: String = "src1"): DataFrame = {
    val docs = Tables.documents(s, d)
      .filter(col("source").isin(srcA, srcB))
      .select(col("n_chars"), (col("source") === srcA).cast("int").as("is_a"))
    val cells = docs.groupBy(col("n_chars"))
      .agg(sum(col("is_a")).as("ca"), sum(lit(1) - col("is_a")).as("cb"))
    val tot = cells.agg(sum(col("ca")).cast("double").as("na"),
      sum(col("cb")).cast("double").as("nb"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n_chars").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    cells
      .withColumn("cum_a", sum(col("ca")).over(w))
      .withColumn("cum_b", sum(col("cb")).over(w))
      .crossJoin(broadcast(tot))
      .agg(
        round(max(abs(col("cum_a") / col("na") - col("cum_b") / col("nb"))), 6).as("ks_d"),
        max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"))
  }

  /** Gini coefficient of the corpus token-frequency distribution — the
    * one-number vocabulary-concentration audit (a near-1 Gini means a few
    * tokens dominate: template spam or a collapsed crawl). Computed from the
    * rank formula G = 2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n over frequencies sorted
    * ascending. The explode reduces to the |vocab|-sized frequency table in
    * one partial-agg shuffle; the rank window runs over that aggregate
    * (the q_mix_weights pattern), and every sum is integer-exact. */
  def tokenGini(s: SparkSession, d: String): DataFrame = {
    val freq = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").asc, col("tok").asc)
    freq
      .withColumn("i", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_types"),
        sum(col("c")).as("n_tokens"),
        round(
          lit(2.0) * sum(col("i") * col("c")) / (count(lit(1)) * sum(col("c")))
            - (count(lit(1)) + lit(1.0)) / count(lit(1)), 6).as("gini"))
  }

  /** Zipf-law fit of the token-frequency distribution: least-squares slope
    * of ln(frequency) on ln(rank) — natural text sits near −1; a far-off
    * slope flags synthetic/templated corpora. The regression runs over the
    * |vocab|-sized frequency aggregate (rank window over the aggregate, the
    * q_mix_weights pattern), with the closed-form normal-equation arithmetic
    * written identically on both engines. */
  def zipfSlope(s: SparkSession, d: String): DataFrame = {
    val freq = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok").asc)
    freq
      .withColumn("x", log(row_number().over(w).cast("double")))
      .withColumn("y", log(col("c").cast("double")))
      .agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(
        col("n").cast("long").as("n_types"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"),
        round((col("sy") - (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")) * col("sx")) / col("n"), 4)
          .as("intercept"))
  }

  def sourceShingleArtifact(s: SparkSession, d: String, n: Int): DataFrame =
    sourceShingleCache.getOrCompute(s, (d, n)) {
      StageCache.throughDf(s, d, s"source-shingle-$n") {
      val docs = Tables.documents(s, d)
      docs.select(col("source"), split(lower(col("text")), "\\s+").as("tokens"))
        // shorter than n tokens → no n-shingles (sequence(0, negative) is
        // DESCENDING and slice would throw — same guard as Dedup.shingles)
        .filter(size(col("tokens")) >= n)
        .select(col("source"), explode(
          expr(s"transform(sequence(0, size(tokens) - $n), i -> xxhash64(concat_ws(' ', slice(tokens, i + 1, $n))))")
            .as("sh")).as("shingle"))
        .distinct()
      }.persist()
    }

  /** Cross-source overlap matrix: for every source pair, how many distinct
    * word `n`-grams they share, and the shingle-set Jaccard — the corpus
    * audit that answers "which of my crawl sources are copies of each
    * other" before mixing (cross-source leakage inflates a source's
    * apparent weight and leaks eval data between splits). Everything past
    * the tokenize projection moves 8-byte hashes: the self-join is an
    * equi-join on the shingle hash (per-reducer fan-in = sources sharing
    * that shingle, ≤ |sources|), and the totals rejoin is a broadcast of a
    * |sources|-row aggregate. Output rows = source pairs, independent of
    * corpus size. */
  def sourceOverlap(s: SparkSession, d: String, n: Int = 8): DataFrame = {
    val sh = sourceShingleArtifact(s, d, n)
    val totals = sh.groupBy(col("source")).agg(count(lit(1)).as("n_sh"))
    sh.as("a").join(sh.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(totals.select(col("source").as("src_a"), col("n_sh").as("n_a"))), Seq("src_a"))
      .join(broadcast(totals.select(col("source").as("src_b"), col("n_sh").as("n_b"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        round(col("n_shared") / (col("n_a") + col("n_b") - col("n_shared")), 4).as("jaccard"))
  }
}
