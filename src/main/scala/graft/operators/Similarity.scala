package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (SURVEY.md §2.11 D3):
  * brute-force cosine top-k as the correctness baseline, an LSH-bucketed
  * variant as the 100 TB path, and per-label centroids.
  *
  * Vector math is pure Catalyst (`zip_with` + `aggregate`) — no UDF, no
  * per-row JVM boxing beyond the array itself.
  */
object Similarity {

  /** dot(a, b) via zip_with + aggregate (higher-order functions, codegen'd). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0d), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force exact top-k: queries × candidates, cosine, windowed top-k.
    * Correct at any scale but O(|Q|·|C|) — the oracle baseline the bucketed
    * path is measured against. Queries are broadcast (small side). */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("c_emb"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", cosine(col("q_emb").cast("array<double>"), col("c_emb").cast("array<double>")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** D3 as a registered query: exact top-5 neighbors for the first 5 vectors. */
  def annBruteForce(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    bruteForceTopK(emb.filter(col("vec_id") < 5), emb, 5)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: plane t,
    * component i = a fixed hash folded to [-1, 1]. Seeded — every executor
    * and every run derives the same planes with no shipped state. */
  private def planeComponent(t: Int, i: Column): Column =
    (pmod(xxhash64(lit(t), i), lit(2000001L)) - lit(1000000L)) / lit(1000000.0)

  /** Sign-random-projection signature: `nBits` sign bits per table. */
  def rpSignature(emb: Column, table: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { bit =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), size(emb) - 1),
          (x, i) => x * planeComponent(table * 64 + bit, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed ANN (the scale path): L hash tables × b sign bits; a
    * candidate meets a query only if they share a bucket in some table.
    * Cost: L equi-joins on the bucket key instead of one all-pairs cross
    * join — at 100 TB the bucket key is the shuffle key and each reducer
    * sees one bucket, not the corpus. Recall vs exact is pinned in
    * SimilaritySpec. Defaults favor recall on near-orthogonal embeddings
    * (few bits, many tables); at real scale raise `bits` to shrink buckets
    * and keep per-reducer fan-in bounded. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              tables: Int = 12, bits: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val qSig = (0 until tables).foldLeft(
      queries.select(col("vec_id").as("query_id"), col("embedding").cast("array<double>").as("q_emb"))) {
      (df, t) => df.withColumn(s"sig$t", rpSignature(col("q_emb"), t, bits))
    }
    val cSig = (0 until tables).foldLeft(
      candidates.select(col("vec_id").as("cand_id"), col("embedding").cast("array<double>").as("c_emb"))) {
      (df, t) => df.withColumn(s"sig$t", rpSignature(col("c_emb"), t, bits))
    }
    val candPairs = (0 until tables).map { t =>
      cSig.select(col("cand_id"), col("c_emb"), col(s"sig$t").as("sig"))
        .join(broadcast(qSig.select(col("query_id"), col("q_emb"), col(s"sig$t").as("sig"))), Seq("sig"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"), col("q_emb"), col("c_emb"))
    }.reduce(_ unionByName _).distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("cand_id").asc)
    candPairs
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), round(col("cos"), 4).as("cos"), col("rank"))
  }

  /** Per-label centroids via posexplode + partial-agg mean per (label, pos) —
    * the shuffle carries (label × dim) rows, never the vectors themselves. */
  def labelCentroids(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(round(avg(col("v")), 5).as("centroid_v"))
      .filter(col("pos") < 8) // small stable slice for the oracle dump

  /** Label coherence: avg cosine of each vector to its label centroid minus
    * avg cosine to the global centroid — a quality metric for the embedding
    * space; exercises a join of rows against a broadcast aggregate. */
  def labelCoherence(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("emb"))
    val centroids = emb
      .select(col("label"), posexplode(col("emb")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("cv"))
      .groupBy(col("label")).agg(array_sort(collect_list(struct(col("pos"), col("cv")))).as("pairs"))
      .select(col("label"), expr("transform(pairs, p -> p.cv)").as("centroid"))
    emb.join(broadcast(centroids), Seq("label"))
      .withColumn("cos", cosine(col("emb"), col("centroid")))
      .groupBy(col("label"))
      .agg(round(avg(col("cos")), 4).as("avg_cos_to_centroid"), count(lit(1)).as("n_vectors"))
  }
}
