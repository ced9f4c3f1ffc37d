package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-trend evidence harness (test scope; round-9 verdict stretch #7):
  * BASELINE.md argues Spark's fixed per-job overhead "amortizes at scale" —
  * this measures it instead of arguing it. Builds deterministic ×2 and ×5
  * replicas of the sf0.1 fact tables (shifted keys per copy; document
  * words suffixed per copy so no cross-copy exact/near dups distort pair
  * volumes; small dims copied as-is) and times ten representative heavy
  * queries at ×1/×2/×5, best-of-2 after an untimed artifact stage —
  * the same protocol as Bench. Prints one JSON line for
  * bench_runs/sf_trend_r10.json.
  *
  * Query choice: shuffle-heavy aggregates and windows (events), joins
  * (TPC-H), iterative graph (pagerank), text scoring (bigram LM), exact
  * dedup, and the O(|Q|·n) brute-force ANN scan — shapes whose cost is
  * data-proportional by design. Pair-structure-sensitive queries
  * (banded near-dup, cosine LSH) are excluded: replication changes their
  * candidate distributions, so their trend would measure the corpus
  * construction, not the operator.
  */
object SfTrendMain {

  private val Scales = Seq(1, 2, 5)

  private def scaledDir(spark: SparkSession, src: String, k: Int, base: String): String = {
    val dir = s"$base/x$k"
    if (new java.io.File(s"$dir/_done").exists()) return dir
    new java.io.File(dir).mkdirs()
    def copies(df: DataFrame)(shift: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(i => if (i == 0) df else shift(df, i)).reduce(_ unionByName _)
    // events: same time range at k× density; ids/users shifted per copy
    copies(Tables.events(spark, src)) { (d, i) =>
      d.withColumn("event_id", col("event_id") + lit(i * 10000000000L))
        .withColumn("user_id", col("user_id") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // lineitem/orders/customer: join keys shifted CONSISTENTLY per copy
    copies(spark.read.parquet(s"$src/lineitem.parquet")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L))
    }.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    copies(spark.read.parquet(s"$src/orders.parquet")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
        .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$dir/orders.parquet")
    copies(spark.read.parquet(s"$src/customer.parquet")) { (d, i) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L))
    }.write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // documents: per-copy word suffix → distinct vocab per copy (no
    // cross-copy dup pairs); within-copy dup structure preserved exactly
    copies(Tables.documents(spark, src)) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
        .withColumn("text",
          concat_ws(" ", transform(split(col("text"), " "), w => concat(w, lit(s"_$i")))))
        .withColumn("n_chars", length(col("text")))
    }.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // embeddings: small deterministic per-copy offset (keeps the metric
    // space sane; brute-force cost is n-proportional regardless)
    copies(Tables.embeddings(spark, src)) { (d, i) =>
      d.withColumn("vec_id", col("vec_id") + lit(i * 10000000L))
        .withColumn("embedding",
          transform(col("embedding"), x => x + lit(i * 0.01f)))
    }.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    for (t <- Seq("nation", "region", "supplier", "part"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    new java.io.File(s"$dir/_done").createNewFile()
    dir
  }

  private val TrendQueries = Seq(
    "q_pagerank", "q_session_windows", "q_events_hourly", "q_window_range",
    "q_approx_distinct", "q_weighted_median", "q_tpch_q3", "q_bigram_lm",
    "q_dedup_exact", "q_ann_brute")

  /** Deep tier (round-10 ask #2): the ×5 ratios came out 0.97–1.56× — still
    * overhead-bound, proving amortization but not data-bound scaling. ×20
    * (2× a TPC-H SF1 fact volume) pushes the 5 heaviest kernels into the
    * regime where per-row work dominates fixed cost; a super-linear ratio
    * here is a real scale bug, not noise. The banded near-dup IS
    * trend-meaningful under this corpus construction: per-copy vocab
    * suffixes mean zero cross-copy shingle collisions, so candidate pairs
    * scale exactly ×k. Each deep query is timed at ×1 and ×20 with its
    * corpus artifacts (graph edges, shingle signatures, IVF index) staged
    * untimed at BOTH scales — the same contract as Bench's warmup. */
  private val DeepScale = sys.env.getOrElse("SPARK_GRAFT_DEEP_SCALE", "20").toInt
  private val DeepQueries = Seq("q_pagerank", "q_near_dup_minhash",
    "q_bigram_lm", "q_attribution", "q_ann_ivf")

  private def stageArtifacts(spark: SparkSession, dir: String): Unit = {
    // force the graph frames with an action (round-12 ADVICE): persist()
    // alone is lazy, so an unforced edge build would land inside the first
    // timed q_pagerank run at each scale — noop-save them like
    // LocalClusterBenchMain does
    val (norm, nodes, pairs) = operators.Graph.graphArtifacts(spark, dir)
    Seq(norm, nodes, pairs).foreach(_.write.format("noop").mode("overwrite").save())
    val (sh, sig) = operators.Dedup.shingleArtifacts(spark, dir)
    sh.write.format("noop").mode("overwrite").save()
    sig.write.format("noop").mode("overwrite").save()
    val (assigned, centroids) = operators.IvfIndex.index(spark, dir)
    assigned.write.format("noop").mode("overwrite").save()
    centroids.write.format("noop").mode("overwrite").save()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/tmp/graft-sftrend"
    val src = "/root/testdata/sf0.1"
    val results = scala.collection.mutable.LinkedHashMap[String, Map[Int, Double]]()
    for (k <- Scales) {
      val dir = scaledDir(spark, src, k, base)
      // untimed artifact stage, as in Bench warmup (graph edges feed
      // pagerank; the other nine are artifact-free by construction) —
      // FORCED with an action, persist() alone is lazy (round-12 ADVICE)
      val (gn, gno, gp) = operators.Graph.graphArtifacts(spark, dir)
      Seq(gn, gno, gp).foreach(_.write.format("noop").mode("overwrite").save())
      for (name <- TrendQueries) {
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val t = math.min(once(), once())
        results(name) = results.getOrElse(name, Map.empty) + (k -> t)
        System.err.println(f"[sftrend] x$k $name $t%.2f s")
      }
    }
    // Locale.ROOT formatting (round-12 ADVICE): the f interpolator is
    // default-locale-sensitive; comma decimals would emit invalid JSON
    def jnum(v: Double, d: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))
    val qjson = results.map { case (n, m) =>
      val xs = Scales.map(k => s""""x$k":${jnum(m(k), 3)}""").mkString(",")
      val slope51 = m(5) / math.max(m(1), 1e-9)
      s""""$n":{$xs,"ratio_x5_x1":${jnum(slope51, 2)}}"""
    }.mkString("{", ",", "}")
    // deep tier: ×1 and ×20 with artifacts staged untimed at both scales
    val deep = scala.collection.mutable.LinkedHashMap[String, Map[Int, Double]]()
    for (k <- Seq(1, DeepScale)) {
      val dir = scaledDir(spark, src, k, base)
      stageArtifacts(spark, dir)
      for (name <- DeepQueries) {
        val fn = SparkEntry.queries(name)
        def once(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val t = math.min(once(), once())
        deep(name) = deep.getOrElse(name, Map.empty) + (k -> t)
        System.err.println(f"[sftrend-deep] x$k $name $t%.2f s")
      }
    }
    val djson = deep.map { case (n, m) =>
      val r = m(DeepScale) / math.max(m(1), 1e-9)
      s""""$n":{"x1":${jnum(m(1), 3)},"x$DeepScale":${jnum(m(DeepScale), 3)},"ratio_x${DeepScale}_x1":${jnum(r, 2)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"sf_trend","src":"$src","scales":[1,2,5],"queries":$qjson,"deep_scale":$DeepScale,"deep":$djson}""")
    spark.stop()
  }
}
