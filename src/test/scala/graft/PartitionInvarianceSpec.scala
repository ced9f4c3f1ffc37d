package graft

import graft.operators.{Corpus, Dedup, Skew}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partitioning invariance: the property that actually carries an operator
  * from local[32] to 1000 executors — results must be IDENTICAL however the
  * input happens to be partitioned. Each test runs the same operator over
  * the same rows partitioned 1-way, 7-way-by-key, and 13-way-round-robin,
  * and requires set-identical output. Operators whose scaladoc claims
  * determinism ("no partition-seeded RNG", "deterministic salts", "partial
  * aggregation", "full deterministic ordering") get that claim pinned here.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private def variants(df: DataFrame, keyCol: String): Seq[DataFrame] =
    Seq(df.coalesce(1), df.repartition(7, col(keyCol)), df.repartition(13))

  private def assertInvariant(frames: Seq[DataFrame], what: String): Unit = {
    val canon = frames.map(f =>
      f.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq)
    canon.tail.zipWithIndex.foreach { case (c, i) =>
      assert(c === canon.head, s"$what changed under partitioning variant ${i + 1}")
    }
  }

  test("minhash signatures are partitioning-invariant (partial agg claim)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d => Dedup.minhashSignatures(Dedup.shingles(d))),
      "minhash signatures")
  }

  test("LSH candidate pairs are partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id")
        .map(d => Dedup.bandedCandidates(Dedup.minhashSignatures(Dedup.shingles(d)))),
      "banded candidate pairs")
  }

  test("stratified sample keeps the same rows under any partitioning (no partition RNG)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id")
        .map(d => Corpus.stratifiedSample(d, Map("src0" -> 80, "src1" -> 50), 20)
          .select(col("doc_id"))),
      "sampled doc set")
  }

  test("sequence packing bins are invariant to INPUT partitioning (internal repartition)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d => Corpus.packSequences(d, budget = 512).toDF()),
      "packed bins")
  }

  test("graph kernels are partitioning-invariant (star CC, triangles, k-core)") {
    import spark.implicits._
    // one fixture exercising all three: two components, a pendant chain,
    // skew at node 1
    val pairs = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)) ++
      (10L to 14L).map(i => (i, i + 1)) ++ Seq((20L, 21L))).toDF("doc_a", "doc_b")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.connectedComponentsStar(_)),
      "star components")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.triangleStats),
      "triangle stats")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.kCore(_, 2)),
      "2-core membership")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.labelPropagation(_)),
      "LPA communities")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.bfsHops(_, seedEvery = 10)),
      "bfs hop distances")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.randomWalks(_)),
      "walk trajectories")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.centralityProfile(_)),
      "centrality profiles")
    assertInvariant(
      variants(pairs, "doc_a").map(graft.operators.Graph.degreeAssortativity),
      "assortativity moments")
    assertInvariant(
      variants(pairs, "doc_a").map(p =>
        graft.operators.Graph.modularity(p, graft.operators.Graph.labelPropagation(p))),
      "modularity of LPA labels")
    import spark.implicits._
    val weighted = Seq((1L, 2L, 0.5), (2L, 3L, 0.9), (10L, 11L, 0.3),
      (3L, 4L, 0.25), (11L, 12L, 0.7)).toDF("doc_a", "doc_b", "jaccard")
    assertInvariant(
      variants(weighted, "doc_a").map(graft.operators.Graph.ssspWeighted(_, seedEvery = 10)),
      "weighted sssp distances")
  }

  test("salted aggregation equals plain groupBy under any partitioning (deterministic salts)") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_quantity")), 2).as("s"), count(lit(1)).as("n"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    variants(li, "l_orderkey").foreach { d =>
      val salted = Skew.saltedSumCount(d, Seq("l_returnflag"), "l_quantity", "l_orderkey")
        .select(col("l_returnflag"), round(col("sum_l_quantity"), 2), col("n_rows"))
        .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      assert(salted === plain, "salted aggregate diverged from plain groupBy")
    }
  }

  test("exact dedup keeps the same canonical rows under any partitioning") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d => Dedup.exactDedup(d, Seq("lang", "source"), "doc_id")),
      "canonical rows")
  }

  test("boilerplate line stats are partitioning-invariant (hash-agg + rejoin claim)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(operators.TextAnalysis.boilerplateLineStats),
      "boilerplate line stats")
  }

  test("shard assignments and their manifest are partitioning-invariant (LCG claim)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d =>
        Corpus.shardAssignments(d, nShards = 16).select("doc_id", "shard", "ord")),
      "shard assignments")
  }

  test("token-budget selection keeps the same docs under any partitioning") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d =>
        Corpus.tokenBudgetSelect(d.select(col("doc_id"), col("n_chars")), budget = 20000L)),
      "budget-selected docs")
  }

  test("unigram log-prob scores are partitioning-invariant (agg + keyed join claim)") {
    // rounded to 4dp in the operator itself — the invariance claim is on the
    // ROUNDED score, same contract the oracle checks
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map { d =>
        val toks = d.select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
          .filter(col("tok") =!= "")
        val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        val tot = toks.agg(count(lit(1)).as("total"), count_distinct(col("tok")).as("vocab"))
        toks.join(tf, Seq("tok")).crossJoin(broadcast(tot))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_toks"),
            round(avg(log((col("tf") + 1).cast("double") / (col("total") + col("vocab")))), 4)
              .as("avg_logp"))
      },
      "unigram log-prob scores")
  }

  test("bigram LM scores are partitioning-invariant (doc-local window + integer ppm claim)") {
    // the lag window partitions per doc (never global), the model joins are
    // keyed, and the score is pure integral arithmetic — so any input
    // partitioning must reproduce every (doc, n_bigrams, sum_ppm, mean_ppm)
    // exactly, no float-accumulation caveat needed
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(graft.operators.TextAnalysis.bigramLmFrame),
      "bigram LM integer scores")
  }

  test("repeated-passage histogram is partitioning-invariant") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d =>
        Dedup.shingles(d, 20).groupBy(col("shingle")).agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") >= 2)
          .groupBy(col("n_docs")).agg(count(lit(1)).as("n_passages"))),
      "repeated-passage histogram")
  }

  test("SemDeDup drop decisions are partitioning-invariant (greedy min-id claim)") {
    // a fixed synthetic assignment (not the k-means cells: the model is a
    // per-corpus artifact, this pins the dedup pass itself)
    val assigned = Tables.embeddings(spark, sf)
      .select((col("vec_id") % 7).cast("int").as("cell"), col("vec_id"), col("embedding"))
    assertInvariant(
      variants(assigned, "vec_id").map(a =>
        graft.operators.Similarity.semanticDedupFrom(a, eps = 0.5)),
      "SemDeDup per-cell drop counts")
  }

  test("per-stratum top-k keeps the same rows under any partitioning (LCG + rank claim)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(d => Corpus.stratumTopKFrame(d, 25)),
      "stratum top-k selection")
  }

  test("balanced upsampling emits identical copies under any partitioning (integer ceil claim)") {
    val docs = Tables.documents(spark, sf)
    assertInvariant(
      variants(docs, "doc_id").map(Corpus.upsampleBalancedFrame),
      "balanced upsample rows")
  }

  test("embedding dim stats and whitened norms are partitioning-invariant (round 7)") {
    val emb = Tables.embeddings(spark, sf)
    assertInvariant(
      variants(emb, "vec_id").map(operators.Embeddings.dimStatsOf),
      "embedding dim stats")
    assertInvariant(
      variants(emb, "vec_id").map(operators.Embeddings.whitenedNormsOf),
      "whitened norms")
  }

  test("batched image decode emits the same features at any batch size and partitioning") {
    import spark.implicits._
    val assets = operators.Multimodal.imageAssets(spark, sf)
    val frames = Seq(1, 5, 16).map { bs =>
      operators.Multimodal.decodeBatched(
        assets.repartition(bs % 3 + 1), operators.Multimodal.imageBatchKernel, bs).toDF()
    }
    assertInvariant(frames, "decoded image features")
  }

  test("directed pagerank is partitioning-invariant at 1e-9 quantization (round 7)") {
    import spark.implicits._
    // a graph with dangling nodes AND a cycle; ranks quantized to absorb
    // summation-order noise (per-dst contribution sums associate
    // differently under different partitionings)
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 2.0), (3L, 1L, 1.0), (3L, 4L, 1.0),
      (5L, 4L, 1.0), (1L, 4L, 3.0)).toDF("src", "dst", "w")
    assertInvariant(
      variants(edges, "src").map(e =>
        operators.Graph.pageRankDirected(e, iters = 5)
          .select(col("node"), round(col("rank"), 9).as("rank_q"))),
      "directed pagerank ranks")
  }
}
