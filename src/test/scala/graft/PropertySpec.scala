package graft

import graft.ml.BatchedScorer
import graft.ml.BatchedScorer.Doc
import graft.operators.{Corpus, Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style invariants (SURVEY.md §5.5) using ScalaCheck generators
  * with fixed seeds (scalatest runner; no scalatestplus bridge available
  * offline): batching covers exactly n docs, dedup uniqueness under random
  * input, tokenizer agreement with an independent implementation. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("batching covers exactly n docs for any n") {
    samples(Gen.choose(0, 200), 25).foreach { n =>
      val docs = (1 to n).map(i => Doc(i.toString, s"d$i"))
      val grouped = docs.grouped(10).flatMap(BatchedScorer.stubScoreBatch).toSeq
      assert(grouped.size === n)
      assert(grouped.map(_.record_id).toSet === docs.map(_.record_id).toSet)
    }
  }

  test("exact dedup output has unique keys for random inputs") {
    val rowsGen = Gen.listOfN(60, Gen.zip(Gen.choose(0L, 500L), Gen.choose(0, 8)))
    samples(rowsGen, 5).foreach { rows =>
      val df = rows.toDF("id", "key")
      val out = Dedup.exactDedup(df, Seq("key"), "id")
      val keys = out.select("key").collect().map(_.getInt(0))
      assert(keys.length === keys.distinct.length)
    }
  }

  test("token count matches an independent Scala tokenizer on random text") {
    val wordGen = Gen.listOf(Gen.oneOf("fast", "slow", "spark", "data", "x", "yz"))
    val texts = samples(wordGen, 10).map(_.mkString(" "))
    val df = texts.toDF("text")
    val counted = df.select(col("text"), TextAnalysis.tokenCount(col("text")))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    counted.foreach { case (text, n) =>
      val expected = if (text.trim.isEmpty) 0 else text.trim.split("\\s+").length
      assert(n === expected, s"text='$text'")
    }
  }

  test("BPE merge table satisfies the freshness rule the oracle equivalence needs") {
    val merges = TextAnalysis.BpeMerges
    assert(merges.map(_._2).distinct.size === merges.size, "output symbols unique")
    merges.zipWithIndex.foreach { case ((pair, sym), i) =>
      // output symbol appears in no pair of rank <= its own: applying a
      // merge can never re-enable an earlier (or its own) pair
      merges.take(i + 1).foreach { case (p, _) =>
        assert(!p.contains(sym), s"output '$sym' of rank $i re-enables pair '$p'")
      }
      // inputs are lowercase letters or outputs of STRICTLY earlier merges
      val earlier = merges.take(i).map(_._2).toSet
      pair.foreach { c =>
        assert((c >= 'a' && c <= 'z') || earlier.contains(c),
          s"rank-$i pair '$pair' uses symbol '$c' not yet defined")
      }
    }
  }

  test("BPE min-rank encode loop equals the single-pass replace chain on random words") {
    def chainLen(word: String): Int =
      TextAnalysis.BpeMerges.foldLeft(word) {
        case (w, (p, s)) => w.replace(p, s.toString)
      }.length
    // random lowercase words, biased toward merge-pair substrings so the
    // multi-level merges ("the", "ing") and overlap cases actually fire
    val frag = Gen.oneOf("th", "he", "in", "ng", "er", "an", "on", "re",
      "at", "en", "or", "es", "a", "e", "t", "x", "thth", "ananan")
    val wordGen = Gen.listOf(frag).map(_.mkString)
    samples(wordGen, 400).foreach { w =>
      assert(TextAnalysis.bpeEncodeLen(w) === chainLen(w), s"word '$w'")
    }
    assert(TextAnalysis.bpeEncodeLen("the") === 1) // th→A, Ae→K
    assert(TextAnalysis.bpeEncodeLen("thee") === 2) // Aee → Ke
    assert(TextAnalysis.bpeEncodeLen("") === 0)
  }

  test("BPE doc accounting: word-count floor, alpha-char ceiling, real compression") {
    // recompute alpha chars independently of the operator's own plan
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), length(regexp_replace(lower(col("text")), "[^a-z]", "")).as("n_alpha"))
    val joined = TextAnalysis.bpeTokens(spark, sf).join(docs, Seq("doc_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (words, toks, alpha) = (r.getAs[Long]("n_words"), r.getAs[Long]("n_tokens"), r.getAs[Int]("n_alpha"))
      assert(toks >= words, s"each word is >=1 token (doc ${r.getAs[Long]("doc_id")})")
      assert(toks <= alpha, "merging can only shrink the symbol stream")
    }
    assert(joined.exists(r => r.getAs[Long]("n_tokens") < r.getAs[Int]("n_alpha")),
      "at least one doc must actually compress")
  }

  test("BPE tokenize plan is scan-local: no exchange anywhere") {
    // the scaladoc's 100 TB claim — a narrow map over the documents scan —
    // pinned against the physical plan, not just asserted in prose
    val plan = TextAnalysis.bpeTokens(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bpeTokens must not shuffle:\n$plan")
  }

  test("BPE training: monotone merge frequencies, distinct pairs, closed alphabet") {
    val merges = TextAnalysis.bpeTrain(spark, sf).collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(merges.length === 4)
    val freqs = merges.map(_.getAs[Long]("merged_freq"))
    // round k's winner was available (or only just created, with count
    // bounded by its parent) in round k-1, so the winning count can never
    // rise — the greedy argmax invariant
    freqs.sliding(2).foreach { case Array(a, b) => assert(a >= b, freqs.toSeq) }
    assert(freqs.forall(_ > 0))
    val pairs = merges.map(_.getAs[String]("pair"))
    assert(pairs.distinct.length === 4, "a merged pair cannot win twice")
    // inputs are corpus letters or outputs of earlier merges (digits)
    pairs.foreach(p => assert(p.length === 2 &&
      p.forall(c => (c >= 'a' && c <= 'z') || (c >= '1' && c <= '9')), p))
  }

  test("sequence packing covers every doc within budget for random corpora") {
    val docsGen = Gen.listOfN(80, Gen.zip(Gen.choose(0L, 10000L), Gen.choose(1, 700)))
    samples(docsGen, 5).foreach { rows =>
      val distinctRows = rows.distinctBy(_._1)
      val df = distinctRows
        .map { case (id, nTok) => (id, Seq.fill(nTok)("w").mkString(" ")) }
        .toDF("doc_id", "text")
      val packed = Corpus.packSequences(df, budget = 512).collect()
      assert(packed.map(_.doc_id).sorted.toSeq === distinctRows.map(_._1).sorted)
      packed.groupBy(_.bin_id).foreach { case (_, ds) =>
        assert(ds.map(_.n_tokens).sum <= 512 || ds.length === 1)
      }
    }
  }

  test("hash bucket is stable under corpus growth (sampling decision per key)") {
    val keysGen = Gen.listOfN(50, Gen.choose(0L, 1000000L))
    samples(keysGen, 5).foreach { keys =>
      val small = keys.take(25).toDF("doc_id")
        .select(col("doc_id"), Corpus.hashBucket(col("doc_id")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val large = keys.toDF("doc_id")
        .select(col("doc_id"), Corpus.hashBucket(col("doc_id")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      small.foreach { case (k, b) => assert(large(k) === b, s"key $k bucket moved") }
    }
  }

  test("ragged review JSON never drops rows (random key subsets)") {
    val allKeys = Seq("review_id", "hotel_id", "title", "pros", "cons", "languagecode")
    val keysGen = Gen.someOf(allKeys.tail) // review_id always present
    val recs = samples(keysGen, 20).zipWithIndex.map { case (keys, i) =>
      val fields = (Seq(s""""review_id": $i""") ++ keys.map(k => s""""$k": "v$i"""")).mkString(", ")
      s"{$fields}"
    }
    val envelope = s"""{"count": ${recs.size}, "result": [${recs.mkString(", ")}], "sort_options": []}"""
    val tmp = java.nio.file.Files.createTempDirectory("graft-ragged").toFile
    java.nio.file.Files.writeString(new java.io.File(tmp, "r.json").toPath, envelope)
    val out = graft.sources.ReviewIngest.ingest(spark, tmp.getAbsolutePath)
    assert(out.count() === recs.size.toLong)
  }

  test("markerCounts equals the regex formulation on random ASCII text") {
    // random ASCII words (marker words oversampled) joined by random
    // separators — on the ASCII plane Java and RE2 `\\b` agree, so the
    // native one-pass scan must match regexp_count exactly. (The Unicode
    // margin where the engines themselves diverge is pinned in EdgeCaseSpec.)
    val word = Gen.frequency(
      6 -> Gen.oneOf("the", "and", "la", "est", "und", "para", "vous", "is", "it", "zu"),
      3 -> Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString),
      2 -> Gen.oneOf("theand", "_the", "the_", "the1", "1the", "THE", "tHe", "x_y", "42"),
      1 -> Gen.listOfN(7, Gen.alphaNumChar).map(_.mkString))
    val sep = Gen.oneOf(" ", "  ", ", ", ". ", "; ", "'", "-", "\t", "\n", "!?", "...")
    val textGen = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, word)
      ss <- Gen.listOfN(n, sep)
    } yield ws.zip(ss).map { case (w, s) => w + s }.mkString
    val texts = samples(textGen, 40)
    val markers = Seq(
      "\\b(the|and|of|to|is|you|that|it|for|with)\\b",
      "\\b(der|die|das|und|ist|nicht|ich|ein|zu|mit)\\b",
      "\\b(el|la|los|las|es|una|para|por|como|pero)\\b",
      "\\b(le|la|les|est|une|pour|dans|ce|pas|vous)\\b")
    val df = texts.toDF("text")
    val cols = markers.zipWithIndex.map { case (re, i) =>
      regexp_count(lower(col("text")), lit(re)).as(s"r$i")
    } :+ graft.functions.TextFunctions.markerCounts(col("text")).as("mc")
    df.select(col("text") +: cols: _*).collect().foreach { r =>
      val mc = r.getSeq[Int](5)
      (0 until 4).foreach { i =>
        assert(mc(i) === r.getInt(i + 1),
          s"lang $i diverged on text='${r.getString(0)}'")
      }
    }
  }

  test("cms estimate never under-counts any token of a random corpus") {
    import graft.functions.SketchFunctions.cmsEstimate
    val corpusGen = Gen.listOfN(300,
      Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "rare1", "rare2", "x9"))
    samples(corpusGen, 4).foreach { toks =>
      val df = toks.toDF("tok")
      val sketch = df.agg(expr("count_min_sketch(tok, 0.01d, 0.99d, 11)").as("cms"))
      val exact = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ests = df.distinct().crossJoin(sketch)
        .select(col("tok"), cmsEstimate(col("cms"), col("tok")).as("est"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      ests.foreach { case (tok, est) =>
        assert(est >= exact(tok), s"'$tok' under-counted: $est < ${exact(tok)}")
        assert(est <= toks.length.toLong, s"'$tok' above corpus size")
      }
    }
  }
}
