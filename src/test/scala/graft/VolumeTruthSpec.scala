package graft

import graft.operators.{Dedup, IvfIndex}
import org.apache.spark.sql.functions._

/** Volume truth for the dedup banding and ANN probe paths (round-10 ask
  * #3): the graph kernels have ~100k-edge generated truths; the banding
  * recall and IVF/PQ recall bounds rode only the sf0.1 corpus (~6k docs /
  * ~10k vectors), where a candidate-generation bug that only bites at
  * volume (band-hash skew, cell imbalance, a lost prune) would stay
  * invisible. Both tests here build a PLANTED corpus 1–2 orders of
  * magnitude past sf0.1 with analytically known truth — no brute-force
  * oracle needed — and hold the PRODUCTION compositions to their shipped
  * bounds.
  *
  * Construction keeps truth exact by giving every non-planted pair zero
  * signal: per-doc-unique vocabulary (shingle overlap is impossible
  * outside a planted family) and per-family pseudo-random directions
  * (cross-family cosine concentrates near 0 at dim 64 — the max over all
  * query×corpus pairs stays ≲0.7 versus ≥0.999 within a family, so the
  * true top-5 IS the family). All randomness is xxhash64/seeded-k-means —
  * fully deterministic.
  *
  * MEASURED COST (round-12 suite, the price of the volume): the 510k-doc
  * banding test ≈ 3.5 min and the 200k-vector IVF/PQ test ≈ 2.5 min of
  * the 19m14s judge-run wall — this suite is the single largest line item.
  * SuiteBudgetSpec lints the committed wall against its ceiling; a new
  * volume test at this scale must either subsample (the 1-in-5 codebook
  * pattern below) or budget for the ceiling discussion there. */
class VolumeTruthSpec extends SparkSpec {

  test("banding recall at volume: 510k docs, 10k planted near-dup pairs", VolumeTest) {
    // 500k base docs of 20 unique tokens; every 50th doc plants a near-dup
    // copy at id+10M with the last 2 tokens edited: 3-gram shingle Jaccard
    // = 16/(18+18-16) = 0.8 exactly, for every planted pair. Expected
    // banding recall at the production operating point (32 hashes, 8
    // bands × 4 rows) is 1-(1-0.8^4)^8 ≈ 0.985; the shipped high-tier
    // bound (minhashRecallBound) is 0.9.
    val base = spark.range(500000).select(
      col("id").as("doc_id"),
      expr("concat_ws(' ', transform(sequence(0, 19), j -> concat('w', id, '_', j)))")
        .as("text"))
    val dups = spark.range(0, 500000, 50).select(
      (col("id") + 10000000L).as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 19),
        j -> if(j >= 18, concat('x', id, '_', j), concat('w', id, '_', j))))""")
        .as("text"))
    val docs = base.unionByName(dups)
    val nPlanted = 10000L

    // the production composition (nearDupPairs' body over an explicit frame)
    val sh = Dedup.shingles(docs)
    val sig = Dedup.minhashSignatures(sh)
    val cand = Dedup.bandedCandidates(sig)
    val verified = Dedup.verifyJaccard(sh, cand)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"))
      .cache()

    // zero false positives are POSSIBLE by construction (disjoint vocab
    // outside families), so anything non-planted is a real banding bug
    val offPlant = verified
      .filter(col("doc_b") =!= col("doc_a") + 10000000L || col("doc_a") % 50 =!= 0)
      .count()
    assert(offPlant === 0L, s"$offPlant verified pairs outside the planted families")
    val recall = verified.count().toDouble / nPlanted
    info(f"banding recall at 510k docs: $recall%.4f over $nPlanted planted pairs")
    assert(recall >= 0.9,
      f"production banding recovered $recall%.4f of planted J=0.8 pairs (bound 0.9)")
    verified.unpersist()
  }

  test("IVF and IVF+PQ recall@5 at volume: 200k vectors, planted top-5 truth", VolumeTest) {
    // 40k families × 5 members at dim 64: family direction coords are
    // xxhash64-derived in [-1,1); members perturb each coord by ≤0.025, so
    // within-family cosine ≥ ~0.999 while the MAX cross-family cosine over
    // all query×corpus pairs concentrates ≲0.7 — the true top-5 of a
    // family-centered query is exactly the family's 5 members. 50 query
    // vectors sit at family centers (ids outside the corpus range).
    val dim = 64
    def dirExpr(fam: String) =
      s"transform(sequence(0, ${dim - 1}), j -> pmod(xxhash64($fam, j), 1000) / 500.0d - 1.0d)"
    val corpus = spark.range(200000).select(
      col("id").as("vec_id"),
      expr(s"""cast(zip_with(${dirExpr("id div 5")},
          transform(sequence(0, ${dim - 1}), j -> (pmod(xxhash64(id, j), 100) / 100.0d - 0.5d) * 0.05d),
          (a, b) -> cast(a + b as float)) as array<float>)""").as("embedding"))
    val queries = spark.range(50).select(
      (col("id") * 1000L + 5000000L).as("vec_id"),
      col("id").as("fam"),
      expr(s"cast(transform(${dirExpr("id")}, x -> cast(x as float)) as array<float>)")
        .as("embedding"))

    // production index builds over the volume corpus; PQ codebooks train on
    // a 1-in-5 subsample — the documented at-scale training contract
    val (assigned, centroids) = IvfIndex.buildIndex(corpus)
    val cb = IvfIndex.pqCodebooks(corpus.filter(col("vec_id") % 5 === 0))
    val codes = IvfIndex.pqEncode(assigned, cb)

    def recallAt5(top: org.apache.spark.sql.DataFrame): Double = {
      // a hit is a retrieved member of the query's own planted family
      val hits = top.join(queries.select(col("vec_id").as("query_id"), col("fam")), Seq("query_id"))
        .filter(col("cand_id") >= col("fam") * 5 && col("cand_id") < (col("fam") + 1) * 5)
        .count()
      hits.toDouble / (50 * 5)
    }

    val ivf = recallAt5(IvfIndex.ivfTopK(queries, assigned, centroids, k = 5, nProbe = 8))
    info(f"IVF exact-in-cell recall@5 at 200k: $ivf%.3f")
    assert(ivf >= 0.9, f"IVF recall@5 $ivf%.3f below 0.9 at volume")

    val pq = recallAt5(IvfIndex.ivfTopKPq(queries, assigned, centroids, cb, codes, k = 5))
    info(f"IVF+PQ recall@5 at 200k: $pq%.3f (shipped bound 0.6)")
    assert(pq >= 0.6, f"IVF+PQ recall@5 $pq%.3f below the shipped 0.6 bound at volume")
  }
}
