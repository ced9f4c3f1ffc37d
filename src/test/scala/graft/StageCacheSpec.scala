package graft

import java.io.File
import java.nio.file.Files
import graft.operators.StageCache
import org.apache.spark.sql.functions._

/** The bench's on-disk staging cache (round-16 verdict #1 — the
  * slow-window-proofing layer). Contract under test:
  *
  *  1. DISABLED (the default — Verify, the suite, library use): `through`
  *     is an identity passthrough, builds run end-to-end, nothing touches
  *     disk. The correctness gate can never read a cached artifact.
  *  2. Miss → build + write-through; a second read (fresh call) HITS and
  *     returns value-identical frames.
  *  3. The key is a CONTENT fingerprint of the corpus dir: changing one
  *     byte of one input file re-keys every artifact (stale-serving is
  *     structurally impossible, not a TTL policy).
  *  4. An incomplete slot (no `_GRAFT_OK` marker — a killed writer) reads
  *     as a miss, not as truncated data.
  *  5. `stagedDir` round-trips the staged replay tree INCLUDING the
  *     strictly-ordered mtimes the file source's ingest order depends on
  *     (EventsStream.orderStagedTiers), and always hands the caller a
  *     disposable temp dir — never the cache slot itself (session memos
  *     delete their dir on release).
  *
  * Each test enables the cache against a scratch root and restores the
  * disabled default in `finally` — the suite runs suites sequentially in
  * one forked JVM, so no other spec can observe the enabled window.
  */
class StageCacheSpec extends SparkSpec {

  private def withCache[A](body: File => A): A = {
    val root = Files.createTempDirectory("graft-stage-cache-spec").toFile
    StageCache.enable(root.getAbsolutePath)
    try body(root)
    finally {
      StageCache.disable()
      def rm(f: File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty[File]).foreach(rm); f.delete(); ()
      }
      rm(root)
    }
  }

  /** A scratch "corpus" dir the fingerprint can key on. */
  private def scratchCorpus(): File = {
    val d = Files.createTempDirectory("graft-stage-cache-corpus").toFile
    Files.write(new File(d, "a.parquet").toPath, "alpha".getBytes("UTF-8"))
    Files.write(new File(d, "b.parquet").toPath, "beta".getBytes("UTF-8"))
    d
  }

  test("disabled: through is an identity passthrough and builds always run") {
    assert(!StageCache.isEnabled)
    var builds = 0
    val df = StageCache.throughDf(spark, sf, "spec-disabled") {
      builds += 1
      spark.range(3).toDF("n")
    }
    assert(builds == 1 && df.count() == 3)
    // a second call builds again — no memo, no disk
    StageCache.throughDf(spark, sf, "spec-disabled") { builds += 1; spark.range(3).toDF("n") }
    assert(builds == 2)
  }

  test("miss writes through; second call hits with value-identical frames") {
    withCache { root =>
      val corpus = scratchCorpus()
      var builds = 0
      def call() = StageCache.through2(spark, corpus.getAbsolutePath, "spec-artifact") {
        builds += 1
        (spark.range(5).toDF("n"), spark.range(2).select(col("id").as("m")))
      }
      val (a1, b1) = call()
      assert(builds == 1)
      assert(StageCache.misses.contains("spec-artifact"))
      val (a2, b2) = call()
      assert(builds == 1, "second call must be served from disk, not rebuilt")
      assert(StageCache.hits.contains("spec-artifact"))
      assert(a2.collect().map(_.getLong(0)).sorted.sameElements(a1.collect().map(_.getLong(0)).sorted))
      assert(b2.collect().map(_.getLong(0)).sorted.sameElements(b1.collect().map(_.getLong(0)).sorted))
    }
  }

  test("content fingerprint: one changed input byte re-keys the artifact") {
    withCache { _ =>
      val corpus = scratchCorpus()
      val fp1 = StageCache.corpusFingerprint(corpus.getAbsolutePath)
      var builds = 0
      def call() = StageCache.throughDf(spark, corpus.getAbsolutePath, "spec-fp") {
        builds += 1; spark.range(4).toDF("n")
      }
      call(); call()
      assert(builds == 1)
      // mutate the corpus: same file name, same LENGTH, different bytes —
      // the fingerprint hashes content, so even a size-preserving swap
      // (the hardest staleness case) re-keys
      Files.write(new File(corpus, "a.parquet").toPath, "gamma".getBytes("UTF-8"))
      // fingerprints are memoized per absolute path per process (one hash
      // per bench run); a changed corpus arrives as a NEW dir in practice —
      // simulate by copying to a fresh path
      val corpus2 = Files.createTempDirectory("graft-stage-cache-corpus2").toFile
      Files.copy(new File(corpus, "a.parquet").toPath, new File(corpus2, "a.parquet").toPath)
      Files.copy(new File(corpus, "b.parquet").toPath, new File(corpus2, "b.parquet").toPath)
      val fp2 = StageCache.corpusFingerprint(corpus2.getAbsolutePath)
      assert(fp1 != fp2, "content change must change the fingerprint")
      StageCache.throughDf(spark, corpus2.getAbsolutePath, "spec-fp") {
        builds += 1; spark.range(4).toDF("n")
      }
      assert(builds == 2, "the re-keyed artifact must rebuild")
    }
  }

  test("a slot without the _GRAFT_OK marker reads as a miss") {
    withCache { root =>
      val corpus = scratchCorpus()
      var builds = 0
      def call() = StageCache.throughDf(spark, corpus.getAbsolutePath, "spec-marker") {
        builds += 1; spark.range(6).toDF("n")
      }
      call()
      assert(builds == 1)
      // simulate a killed writer: delete only the marker
      val slots = root.listFiles().flatMap(d => Option(d.listFiles()).getOrElse(Array.empty[File]))
        .filter(_.getName == "spec-marker")
      assert(slots.length == 1)
      assert(new File(slots.head, "_GRAFT_OK").delete())
      val df = call()
      assert(builds == 2, "markerless slot must rebuild")
      assert(df.count() == 6)
    }
  }

  test("Version salt: builder sources cannot change without a recorded bump") {
    // Round-16 verdict #1: correctness of every bench hit depends on bumping
    // StageCache.Version whenever a cached builder's semantics change — a
    // forgotten bump would silently time stale artifacts for a whole round,
    // and nothing linted it. This test makes the invariant suite-red: it
    // hashes every main-source file containing a StageCache call site PLUS
    // a curated list of known transitive builder dependencies
    // (ExtraBuilderDeps — round-18 ADVICE: a call-site regex alone misses a
    // helper file the builders call into, e.g. the expression classes the
    // shingle/IVF builders evaluate or the Tables readers every builder
    // scans). NOT a proof of transitive closure — a brand-new helper file
    // must be added to the list when a builder starts calling it; the scan
    // is the broad first line, the list is the named second — and compares
    // against a committed append-only ledger of (version, hash) pairs.
    // Changing a covered source changes the hash → the last ledger entry
    // mismatches → the fix is appending a new line, whose version must be
    // NEW (versions are unique) and must equal the live Version constant —
    // the bump is forced, not remembered.
    val rootDir = new File("src/main/scala")
    assert(rootDir.isDirectory,
      s"builder-source scan expects the repo root as the working dir (cwd=${new File(".").getAbsolutePath})")
    def walk(f: File): Seq[File] =
      if (f.isFile) Seq(f)
      else Option(f.listFiles()).getOrElse(Array.empty[File]).toSeq.flatMap(walk)
    // memoDrain is EventsStream's StageCache read-through wrapper for
    // drained gate sinks — gates whose builder bodies live OUTSIDE
    // EventsStream (StateV2Profile/StateV2Sessions/UpsertStream/
    // EnrichStream) reach the cache only through it, so their sources must
    // be in the hash too
    val callSite =
      "(StageCache\\.(through|stagedDir|modelSlot|modelSaved|modelLoaded)|memoDrain)".r
    // known transitive dependencies of the cached builders that carry no
    // call site of their own: the table readers every builder scans, the
    // schema constants, the session-memo machinery the cache composes with,
    // and the native expressions the shingle/minhash/IVF/centroid builders
    // evaluate inside their plans. A semantics change in any of these
    // changes cached artifacts without touching a call-site file.
    val ExtraBuilderDeps = Set(
      "Tables.scala", "Schemas.scala", "SessionCache.scala",
      "TextExpressions.scala", "VectorExpressions.scala",
      "SketchExpressions.scala", "CentroidAggregator.scala")
    val builderFiles = walk(rootDir)
      .filter(_.getName.endsWith(".scala"))
      .filter { f =>
        f.getName == "StageCache.scala" || ExtraBuilderDeps(f.getName) ||
          callSite.findFirstIn(new String(Files.readAllBytes(f.toPath), "UTF-8")).isDefined
      }
      .sortBy(_.getPath.replace('\\', '/'))
    assert(ExtraBuilderDeps.forall(n => builderFiles.exists(_.getName == n)),
      "an ExtraBuilderDeps entry matched no file — the dependency list rotted")
    assert(builderFiles.nonEmpty, "no StageCache call sites found — the scan regex rotted")
    val md = java.security.MessageDigest.getInstance("SHA-256")
    builderFiles.foreach { f =>
      md.update(f.getPath.replace('\\', '/').getBytes("UTF-8"))
      md.update(Files.readAllBytes(f.toPath))
    }
    val hash = md.digest().map("%02x".format(_)).mkString
    val res = getClass.getResourceAsStream("/stage_cache_versions.txt")
    assert(res != null, "committed ledger src/test/resources/stage_cache_versions.txt is missing")
    val entries = scala.io.Source.fromInputStream(res, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val p = l.split("\\s+"); assert(p.length == 2, s"bad ledger line: $l"); (p(0), p(1)) }
      .toVector
    assert(entries.nonEmpty, "ledger has no entries")
    assert(entries.map(_._1).distinct.size == entries.size, "ledger versions must be unique")
    assert(entries.map(_._2).distinct.size == entries.size, "ledger hashes must be unique")
    val (lastV, lastH) = entries.last
    assert(lastV == StageCache.Version,
      s"last ledger version '$lastV' != StageCache.Version '${StageCache.Version}' — " +
        "append the new version's line AND bump the constant together")
    assert(lastH == hash,
      s"builder sources changed since the last salt bump (files: ${builderFiles.map(_.getName).mkString(", ")}).\n" +
        s"Bump StageCache.Version and append to src/test/resources/stage_cache_versions.txt:\n" +
        s"  <newVersion> $hash")
  }

  test("stagedDir round-trips file bytes and strictly-ordered mtimes; never hands out the slot") {
    withCache { root =>
      val corpus = scratchCorpus()
      var stages = 0
      def call() = StageCache.stagedDir(corpus.getAbsolutePath, "spec-events", "spec-events-tmp") { dir =>
        stages += 1
        val base = 1700000000000L
        Seq("f1.parquet", "f2.parquet", "f0.parquet").zipWithIndex.foreach { case (n, i) =>
          val f = new File(dir, n)
          Files.write(f.toPath, s"payload-$n".getBytes("UTF-8"))
          assert(f.setLastModified(base + i * 2000L))
        }
      }
      val d1 = call()
      assert(stages == 1)
      val d2 = call()
      assert(stages == 1, "second staging must copy from the cache")
      assert(d1 != d2, "each caller owns a fresh temp dir")
      assert(!new File(d2).getAbsolutePath.startsWith(root.getAbsolutePath),
        "the returned dir must never be the cache slot (session memos delete on release)")
      def listing(dir: String) = new File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).map(f => (f.getName, new String(Files.readAllBytes(f.toPath), "UTF-8"), f.lastModified())).toSeq
      assert(listing(d1) == listing(d2), "bytes AND mtimes must survive the cache round-trip")
      // ingest order (mtime sort) preserved: f0 staged LAST must stay last
      val byMtime = listing(d2).sortBy(_._3).map(_._1)
      assert(byMtime == Seq("f1.parquet", "f2.parquet", "f0.parquet"))
    }
  }
}
