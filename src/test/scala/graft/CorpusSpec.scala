package graft

import graft.operators.Corpus
import org.apache.spark.sql.functions._

/** Corpus-construction invariants: contamination detection on planted
  * overlaps, and determinism/uniformity of the LCG sampler. */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("contamination: docs sharing an n-gram with the probe set are flagged") {
    val probe = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "something about the quick brown fox appearing here"), // contaminated
      (2L, "entirely different content with no benchmark overlap at all"),
      (3L, "short doc")) // fewer tokens than the shingle width
      .toDF("doc_id", "text")
    val hits = Corpus.contaminationCheck(docs, probe).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.contains(1L), s"planted contamination missed: $hits")
    assert(hits(1L) >= 2L) // "the quick brown", "quick brown fox"
    assert(!hits.contains(2L) && !hits.contains(3L))
  }

  test("contamination check is self-consistent: probe vs itself flags every probe doc") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 20)
    val flagged = Corpus.contaminationCheck(docs, docs).select("doc_id")
    val withGrams = operators.Dedup.shingles(docs).select("doc_id").distinct()
    assert(flagged.except(withGrams).isEmpty && withGrams.except(flagged).isEmpty)
  }

  test("stratified sample: deterministic, within-rate, and a stable subset") {
    val docs = Tables.documents(spark, sf)
    val s1 = Corpus.stratifiedSample(docs, Map("src0" -> 80), 20)
    val s2 = Corpus.stratifiedSample(docs, Map("src0" -> 80), 20)
    assert(s1.select("doc_id").except(s2.select("doc_id")).isEmpty, "sampler not deterministic")
    // sampled rows honor their source's bucket bound
    assert(s1.filter(col("source") === "src0" && col("bucket") >= 80).isEmpty)
    assert(s1.filter(col("source") =!= "src0" && col("bucket") >= 20).isEmpty)
    // lowering a rate yields a subset (stable mixes across runs)
    val smaller = Corpus.stratifiedSample(docs, Map("src0" -> 40), 10)
    assert(smaller.select("doc_id").except(s1.select("doc_id")).isEmpty)
  }

  test("sequence packing: every doc once, bins within budget, deterministic") {
    val docs = Tables.documents(spark, sf)
    val budget = 512
    val packed = Corpus.packSequences(docs, budget).collect()
    // every doc assigned exactly once
    assert(packed.map(_.doc_id).distinct.length === packed.length)
    assert(packed.length === docs.count())
    // no multi-doc bin exceeds the budget; oversize docs sit alone
    packed.groupBy(_.bin_id).foreach { case (bin, ds) =>
      val total = ds.map(_.n_tokens).sum
      assert(total <= budget || ds.length === 1, s"bin $bin overflows: $total tokens, ${ds.length} docs")
    }
    // deterministic across runs
    val again = Corpus.packSequences(docs, budget).collect()
    assert(packed.sortBy(_.doc_id).toSeq === again.sortBy(_.doc_id).toSeq)
  }

  test("sequence packing: greedy next-fit leaves no avoidable splits") {
    // within a partition, a doc opens a new bin ONLY when it doesn't fit
    val packed = Corpus.packSequences(Tables.documents(spark, sf), 512).collect()
      .groupBy(_.bin_id >> 32) // partition id
    packed.foreach { case (_, ds) =>
      val byBin = ds.groupBy(_.bin_id).toSeq.sortBy(_._1)
      byBin.sliding(2).foreach {
        case Seq((_, prev), (_, next)) =>
          val prevFill = prev.map(_.n_tokens).sum
          val firstNext = next.minBy(_.doc_id).n_tokens
          assert(prevFill + firstNext > 512,
            s"doc with $firstNext tokens should have joined a bin at $prevFill/512")
        case _ =>
      }
    }
  }

  test("contamination plan: probe side broadcasts at runtime (AQE)") {
    val df = operators.Corpus.contaminationQuery(spark, sf)
    df.collect() // let AQE finalize the adaptive plan with runtime stats
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"small probe side should broadcast against the corpus:\n$plan")
  }

  test("decontamination: anti-join broadcasts the contaminated set; kept ∩ flagged = ∅") {
    val kept = operators.Corpus.decontaminatedDocs(spark, sf)
    kept.collect() // let AQE finalize with runtime stats
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"tiny contaminated id set should broadcast for the anti-join:\n$plan")
    // complement contract vs the check query: no kept doc is flagged
    val flagged = operators.Corpus.contaminationQuery(spark, sf).select("doc_id")
    assert(kept.select("doc_id").intersect(flagged).isEmpty)
  }

  test("stratified sample plan: scan-local, no exchange") {
    val plan = operators.Corpus.sampleQuery(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("quality quantile gate keeps the per-language top fraction") {
    val gated = Corpus.qualityQuantileGate(spark, sf, keep = 0.2)
      .select("lang", "doc_id").collect()
    val perLangKept = gated.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    val perLangTotal = Tables.documents(spark, sf)
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLangKept.foreach { case (lang, kept) =>
      val total = perLangTotal(lang)
      // percent_rank <= 0.2 keeps floor(0.2*(n-1))+1 rows
      val expected = math.floor(0.2 * (total - 1)).toLong + 1
      assert(kept === expected, s"$lang kept $kept of $total (expected $expected)")
    }
    // relative gate: every language is represented, unlike an absolute cutoff
    assert(perLangKept.keySet === perLangTotal.keySet)
  }

  test("threshold gate (scale path) agrees with the exact window gate") {
    val exact = Corpus.qualityQuantileGate(spark, sf, keep = 0.2)
      .select("doc_id").as[Long].collect().toSet
    val approx = Corpus.qualityGateByThreshold(spark, sf, keep = 0.2)
      .select("doc_id").as[Long].collect().toSet
    // the sketch can flip docs sitting exactly at the cut; bulk must agree.
    // (Sizes can differ legitimately: percent_rank cuts at an exact count,
    // the threshold form keeps every doc tied with the cut value.)
    val overlap = (exact & approx).size.toDouble / exact.size
    assert(overlap >= 0.95, s"only ${(overlap * 100).round}% agreement (${exact.size} exact, ${approx.size} approx)")
    // no shuffle on the probe side beyond the threshold agg: the gate itself
    // is a broadcast join + filter riding the scan
    val plan = Corpus.qualityGateByThreshold(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"thresholds should broadcast:\n$plan")
  }

  test("chunking: stride positions, overlap agreement, and tail sizing") {
    import spark.implicits._
    val text = (1 to 600).map(i => s"t$i").mkString(" ")
    val chunks = Corpus.chunkDocs(Seq((1L, text)).toDF("doc_id", "text"),
      chunkTokens = 256, overlap = 32).orderBy("chunk_id").collect()
    // n=600, stride 224: starts 0/224/448 → sizes 256/256/152
    assert(chunks.map(_.getInt(2)).toSeq === Seq(256, 256, 152))
    val t0 = chunks(0).getString(3).split(" ")
    val t1 = chunks(1).getString(3).split(" ")
    assert(t1.head === "t225", "chunk 1 must start at stride position")
    assert(t0.takeRight(32).toSeq === t1.take(32).toSeq, "32-token overlap must agree")
    // a doc at or under one window stays whole
    val one = Corpus.chunkDocs(Seq((2L, "a b c")).toDF("doc_id", "text")).collect()
    assert(one.length === 1 && one.head.getInt(2) === 3)
  }

  test("cluster split: no near-dup pair straddles splits, totals conserved") {
    val out = Corpus.clusterSplit(spark, sf).collect()
    assert(out.nonEmpty && out.forall(_.getAs[Int]("leak_free") === 1))
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === graft.Tables.documents(spark, sf).count())
    // independent re-derivation: assign each PAIR endpoint its split via
    // the same operator's per-doc view and require equality — the guarantee
    // the flag claims, checked without trusting the flag's own plan
    val labels = graft.operators.Graph
      .connectedComponentsStar(graft.operators.Dedup.triPairArtifact(spark, sf))
    val splitOf = graft.Tables.documents(spark, sf).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        Corpus.hashBucket(coalesce(col("cluster"), col("doc_id"))).as("b"))
      .select(col("doc_id"),
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test").as("split"))
    val straddles = graft.operators.Dedup.triPairArtifact(spark, sf)
      .join(splitOf.select(col("doc_id").as("doc_a"), col("split").as("sa")), Seq("doc_a"))
      .join(splitOf.select(col("doc_id").as("doc_b"), col("split").as("sb")), Seq("doc_b"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddles === 0L, "a near-dup pair crossed the split boundary")
  }

  test("pretrain pipeline manifest conserves the deduped survivor set across cells") {
    val cells = Corpus.pretrainManifest(spark, sf).collect()
    assert(cells.nonEmpty)
    val total = cells.map(_.getAs[Long]("n_docs")).sum
    // independent recomputation: quality-passed docs, then distinct text —
    // manifest cells must partition exactly that set, no loss, no double count
    val passed = graft.operators.TextAnalysis.gopherRules(spark, sf)
      .filter(col("flag_word_count") === 1 && col("flag_mean_word_len") === 1 &&
        col("flag_symbol_ratio") === 1 && col("flag_alpha_words") === 1)
      .select(col("doc_id"))
    val survivors = graft.Tables.documents(spark, sf)
      .join(passed, Seq("doc_id")).select(col("text")).distinct().count()
    assert(total === survivors, s"manifest total $total vs survivor set $survivors")
    val keys = cells.map(r => (r.getAs[String]("split"), r.getAs[Int]("shard")))
    assert(keys.distinct.length === keys.length, "one row per (split, shard) cell")
  }

  test("hash bucket is roughly uniform over sequential keys") {
    val buckets = spark.range(0, 10000).toDF("doc_id")
      .select(Corpus.hashBucket(col("doc_id")).as("b"))
      .groupBy("b").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(buckets.keys.min >= 0 && buckets.keys.max <= 99)
    assert(buckets.size === 100, s"only ${buckets.size} buckets hit")
    // each bucket expects 100 ± generous slack
    assert(buckets.values.forall(c => c > 30 && c < 300), s"skewed buckets: $buckets")
  }

  test("shard export: balanced, deterministic, and written in shuffle order") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val assigned = Corpus.shardAssignments(docs, nShards = 16)
    // every doc lands in exactly one shard in [0, 16)
    assert(assigned.count() === n)
    val sizes = assigned.groupBy("shard").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet.forall(s => s >= 0 && s < 16))
    // LCG equidistribution: no shard more than 3x the ideal share
    assert(sizes.values.max <= 3 * n / 16 + 1, s"skewed shards: $sizes")

    // the written export round-trips: 16 shard dirs, complete, and each
    // file's row order IS the shuffle (ord) order
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Corpus.writeShards(docs, nShards = 16, dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length === sizes.size, "one directory per non-empty shard")
    val back = spark.read.parquet(dir)
    assert(back.count() === n)
    // within one shard file the ord column must arrive sorted
    val shard0 = dirs.minBy(_.getName).listFiles().filter(_.getName.endsWith(".parquet"))
    val ords = spark.read.parquet(shard0.head.getPath).select("ord").as[Long].collect()
    assert(ords.sameElements(ords.sorted), "file order must be the shuffle order")
  }

  test("end-to-end corpus export: deterministic, idempotent, accounted") {
    val out = java.nio.file.Files.createTempDirectory("graft-corpus-e2e").toString
    val m1 = Corpus.buildAndExport(spark, sf, out)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(m1.nonEmpty, "export selected no documents")
    // shards on disk agree with the manifest the call returned
    val shardCount = spark.read.parquet(s"$out/shards").count()
    assert(m1.map(_.split("\\|")(1).toLong).sum === shardCount)
    // scheduler-retry idempotence: a second run overwrites to the same state
    val m2 = Corpus.buildAndExport(spark, sf, out)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    assert(m2 === m1, "re-run must reproduce the export exactly")
    // every exported doc survived the quality gate and the probe exclusion
    val exported = spark.read.parquet(s"$out/shards")
    assert(exported.filter(col("doc_id") % 97 === 0).count() === 0,
      "benchmark probes must never reach the training export")
  }

  test("source overlap: pairs are ordered, jaccard bounded, join is bucketed not cartesian") {
    val m = Corpus.sourceOverlap(spark, sf)
    val rows = m.collect()
    assert(rows.nonEmpty, "synthetic sources share 8-gram shingles; matrix must be non-empty")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "each pair must appear once, lexicographically ordered")
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0, s"jaccard out of range: $j")
      assert(r.getLong(2) > 0L)
    }
    // the self-join must be an equi-join on the shingle hash — a plan with
    // a cartesian product here would be quadratic in corpus size
    val plan = m.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"overlap join degenerated to cartesian:\n$plan")
  }

  test("priority sample: exactly k rows, weights shift the mix, plan is top-k not global sort") {
    val docs = Tables.documents(spark, sf)
    val sampled = Corpus.prioritySample(docs, 200, Map("src0" -> 4, "src1" -> 2))
    assert(sampled.count() === 200, "exact-k contract")
    // a weight-4 source must out-represent its unweighted corpus share
    val unweighted = Corpus.prioritySample(docs, 200, Map.empty)
    def srcShare(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("source") === "src0").count().toDouble / 200
    assert(srcShare(sampled) > srcShare(unweighted),
      s"weighted src0 share ${srcShare(sampled)} must exceed unweighted ${srcShare(unweighted)}")
    // the global top-k must plan as TakeOrderedAndProject (per-partition
    // heads + k-row merge), never a global Sort over the corpus
    val plan = sampled.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
  }
}
