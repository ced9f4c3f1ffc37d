package graft

import org.apache.spark.sql.SparkSession

/** Multi-executor smoke bench (round-10 stretch #7): everything else in the
  * project measures `local[32]` — one JVM, where every "shuffle" is an
  * in-process byte copy and a broadcast is a pointer. `local-cluster[4,8,
  * 4096]` launches 4 REAL executor JVMs (8 cores / 4 GB each) through the
  * standalone deploy path, so serialized task binaries, real broadcast
  * transport, cross-JVM shuffle fetch, and executor-side codegen all
  * actually happen. The 20 heaviest BATCH queries (per the committed
  * benchr10c best-of series) run once after the same untimed artifact
  * staging Bench uses. Since round 15 ONE stateful streaming drain runs too
  * (round-14 verdict #5): executor-side state stores are the one locality
  * surface the batch queries never touch.
  *
  * SELF-ATTRIBUTING since round 17 (round-16 verdict #2: the r16 ratio
  * drifted to 1.34× against a band derived from a DIFFERENT window's
  * local[32] run, and the artifact could only explain it as "slow window"):
  * after the local-cluster phase the SAME JVM restarts the context as
  * `local[32]` and re-times the identical query set in the SAME wall-clock
  * window, so the emitted ratio decomposes per query with no cross-window
  * drift term. Each query also carries its class — `artifact` (reads
  * per-corpus memoized frames: latency-and-scheduling-bound probes) vs
  * `direct` (plan-bound scans/aggregations) — so a regression names the
  * class mechanically: artifact-probe ratios move with scheduling/transport
  * overhead, direct ratios with shuffle/codegen locality.
  *
  * ORDERING-BIAS BOUND since round 18 (round-17 ADVICE: the local phase
  * runs second, after lc has warmed JIT, driver-side code paths and the OS
  * page cache over the same parquet — a systematic term that flatters the
  * baseline and inflates every lc/local ratio): a THIRD phase re-times the
  * local-cluster master after the local one (lc → local → lc2), so
  * lc2/local is the same comparison with the warm-JVM advantage on the
  * OTHER side. The true ratio lies between `ratio` and `ratio_rewarm`; the
  * emitted `ordering_note` says so in-artifact.
  *
  * Run with SPARK_HOME=/opt/spark (the worker/executor launch path needs
  * the distribution, not just the jars). Prints one JSON line for
  * bench_runs/local_cluster_r18.json. */
object LocalClusterBenchMain {

  private val Heavy20 = Seq(
    "q_pagerank", "q_approx_distinct", "q_ppr", "q_cosine_near_dup_lsh",
    "q_near_dup_incremental", "q_pagerank_directed", "q_ann_ivf_pq",
    "q_ann_ivf_q8", "q_weighted_median", "q_cc_star", "q_file_audit",
    "q_naive_bayes", "q_modularity", "q_near_dup_ml", "q_bigram_lm",
    "q_near_dup_minhash", "q_minhash_est", "q_containment_scale",
    "q_growth_accounting", "q_contamination")

  /** `artifact` = the timed plan reads per-corpus memoized/staged frames
    * (graph edges, shingle/signature tables, the IVF/PQ index, RP
    * signatures, containment pairs, source shingles) — short probe jobs
    * whose local-cluster cost is dominated by scheduling + transport.
    * Everything else recomputes from the base parquet (`direct`). */
  private val ArtifactBacked = Set(
    "q_pagerank", "q_ppr", "q_pagerank_directed", "q_cc_star", "q_modularity",
    "q_cosine_near_dup_lsh", "q_near_dup_incremental", "q_near_dup_minhash",
    "q_near_dup_ml", "q_minhash_est", "q_containment_scale", "q_contamination",
    "q_ann_ivf_pq", "q_ann_ivf_q8")

  /** The same untimed artifact staging contract as Bench's warmup pool,
    * restricted to what the 20 heavy queries read; re-run per phase (the
    * session memos die with the phase's session). */
  private def stage(spark: SparkSession, sfDir: String): Unit = {
    def warm(what: String)(body: => Unit): Unit =
      try { body; System.err.println(s"[lcbench] staged $what") }
      catch { case e: Throwable => System.err.println(s"[lcbench] stage '$what' failed: ${e.getMessage}") }
    warm("entry")(SparkEntry.entry(spark).write.format("noop").mode("overwrite").save())
    warm("graph-edges") { val (n, no, p) = operators.Graph.graphArtifacts(spark, sfDir)
      Seq(n, no, p).foreach(_.write.format("noop").mode("overwrite").save()) }
    warm("shingles") { val (sh, sig) = operators.Dedup.shingleArtifacts(spark, sfDir)
      Seq(sh, sig).foreach(_.write.format("noop").mode("overwrite").save()) }
    warm("ivf-pq") { val (a, c) = operators.IvfIndex.index(spark, sfDir)
      val (cb, codes) = operators.IvfIndex.pqIndex(spark, sfDir)
      Seq(a, c, cb, codes).foreach(_.write.format("noop").mode("overwrite").save()) }
    warm("rp-signatures") { val (s1, s2) = operators.Similarity.rpSigArtifacts(spark, sfDir,
      operators.Similarity.CosineLshTables, operators.Similarity.CosineLshBits)
      Seq(s1, s2).foreach(_.write.format("noop").mode("overwrite").save()) }
    warm("containment") { val (p, s) = operators.Dedup.containmentArtifacts(spark, sfDir)
      Seq(p, s).foreach(_.write.format("noop").mode("overwrite").save()) }
    warm("source-shingles")(operators.Corpus.sourceShingleArtifact(spark, sfDir, 8)
      .write.format("noop").mode("overwrite").save())
  }

  /** One timing phase: stage, best-of-2 the 20 queries, best-of-2 the
    * cross-JVM stateful drain (fresh scratch per run — a reused checkpoint
    * would make run 2 a no-op). */
  private def phase(spark: SparkSession, sfDir: String,
                    tag: String): (Seq[(String, Double)], Double) = {
    stage(spark, sfDir)
    val times = Heavy20.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val t = math.min(once(), once())
      System.err.println(f"[lcbench] $tag $name $t%.2f s")
      name -> t
    }
    val drainSec = {
      val srcDir = streaming.EventsStream.stageEvents(spark, sfDir)
      val iso = spark.newSession()
      iso.conf.set("spark.sql.shuffle.partitions", "8")
      def once(): Double = {
        val b = java.nio.file.Files.createTempDirectory("graft-lcbench-drain")
        try {
          val t0 = System.nanoTime()
          val q = streaming.EventsStream.windowedCents(
              streaming.EventsStream.readEvents(iso, srcDir))
            .writeStream
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .option("checkpointLocation", b.resolve("ckpt").toString)
            .option("path", b.resolve("out").toString)
            .outputMode("append").format("parquet").start()
          try q.awaitTermination() finally q.stop()
          (System.nanoTime() - t0) / 1e9
        } finally {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
          }
          rm(b.toFile)
        }
      }
      val t = math.min(once(), once())
      System.err.println(f"[lcbench] $tag stream_windowed_drain $t%.2f s")
      t
    }
    (times, drainSec)
  }

  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME"),
      "local-cluster mode needs SPARK_HOME (the executor launch path)")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    // executors are separate JVMs: they need the graft classes on their
    // classpath and the same JDK17 add-opens the driver gets from build.sbt
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar")
      .map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
    def session(master: String): SparkSession = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath", classes)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    val lc = session("local-cluster[4,8,4096]")
    lc.sparkContext.setLogLevel("WARN")
    val (lcTimes, lcDrain) = phase(lc, sfDir, "lc")
    lc.stop()
    // getOrCreate would otherwise hand back the stopped default session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // SAME-WINDOW local[32] baseline: a fresh context in the same JVM and
    // the same wall-clock window, so the emitted ratios carry no
    // cross-window host-drift term
    val loc = session("local[32]")
    loc.sparkContext.setLogLevel("WARN")
    val (locTimes, locDrain) = phase(loc, sfDir, "local")
    loc.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // REWARM local-cluster phase (round-17 ADVICE — see the scaladoc): the
    // same cluster master timed a second time, now with every warm-JVM
    // advantage the local phase enjoyed; lc2/local bounds the ordering bias
    val lc2 = session("local-cluster[4,8,4096]")
    lc2.sparkContext.setLogLevel("WARN")
    val (lc2Times, lc2Drain) = phase(lc2, sfDir, "lc2")

    // Locale.ROOT formatting (round-12 ADVICE): the f interpolator is
    // default-locale-sensitive; a comma-decimal locale would emit invalid
    // JSON and break the downstream parsers.
    def jnum(v: Double, d: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${d}f", Double.box(v))
    val locMap = locTimes.toMap
    val qs = lcTimes.map { case (n, t) => s""""$n":${jnum(t, 3)}""" }.mkString("{", ",", "}")
    val lqs = locTimes.map { case (n, t) => s""""$n":${jnum(t, 3)}""" }.mkString("{", ",", "}")
    val l2qs = lc2Times.map { case (n, t) => s""""$n":${jnum(t, 3)}""" }.mkString("{", ",", "}")
    val ratios = lcTimes.map { case (n, t) =>
      s""""$n":${jnum(t / math.max(locMap(n), 1e-9), 2)}""" }.mkString("{", ",", "}")
    val ratios2 = lc2Times.map { case (n, t) =>
      s""""$n":${jnum(t / math.max(locMap(n), 1e-9), 2)}""" }.mkString("{", ",", "}")
    val classes_ = Heavy20.map { n =>
      s""""$n":"${if (ArtifactBacked(n)) "artifact" else "direct"}"""" }.mkString("{", ",", "}")
    def subtotal(pred: String => Boolean, ts: Seq[(String, Double)]): Double =
      ts.collect { case (n, t) if pred(n) => t }.sum
    val lcTotal = lcTimes.map(_._2).sum
    val locTotal = locTimes.map(_._2).sum
    val lc2Total = lc2Times.map(_._2).sum
    val orderingNote = "phases run lc -> local -> lc2 in ONE JVM: `ratio` " +
      "(lc/local) carries the warm-JVM advantage on the LOCAL side, " +
      "`ratio_rewarm` (lc2/local) carries it on the CLUSTER side; the " +
      "unbiased ratio lies between them"
    println(s"""{"metric":"local_cluster","master":"local-cluster[4,8,4096]","total":${jnum(lcTotal, 1)},"local_total":${jnum(locTotal, 1)},"rewarm_total":${jnum(lc2Total, 1)},"ratio":${jnum(lcTotal / locTotal, 3)},"ratio_rewarm":${jnum(lc2Total / locTotal, 3)},"ordering_note":"$orderingNote","artifact_subtotal":${jnum(subtotal(ArtifactBacked, lcTimes), 1)},"artifact_subtotal_local":${jnum(subtotal(ArtifactBacked, locTimes), 1)},"direct_subtotal":${jnum(subtotal(n => !ArtifactBacked(n), lcTimes), 1)},"direct_subtotal_local":${jnum(subtotal(n => !ArtifactBacked(n), locTimes), 1)},"queries":$qs,"local_queries":$lqs,"rewarm_queries":$l2qs,"per_query_ratio":$ratios,"per_query_ratio_rewarm":$ratios2,"query_class":$classes_,"stream_windowed_drain":${jnum(lcDrain, 3)},"stream_windowed_drain_local":${jnum(locDrain, 3)},"stream_windowed_drain_rewarm":${jnum(lc2Drain, 3)},"sf":"$sfDir"}""")
    lc2.stop()
  }
}
