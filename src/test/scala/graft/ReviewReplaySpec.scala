package graft

import org.apache.spark.sql.functions._

/** Custom DSv2 streaming source contract (S1): deterministic replay,
  * page-size admission control, and exactly-once resume from the
  * checkpointed offset — the semantics the reference's timer loop
  * approximates with a refetch-overlap window. */
class ReviewReplaySpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("S1: replay source drains to maxRows with deterministic content") {
    val out = tmp("replay-out")
    val ckpt = tmp("replay-ckpt")
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("review-replay")
      .option("rowsPerBatch", 10).option("maxRows", 57).option("numPartitions", 3)
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += df.count() }
        df.write.mode("append").parquet(out)
      }
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() === 57L)
    assert(got.select("review_id").distinct().count() === 57L, "no duplicate rows")
    // page-size contract: no micro-batch exceeds rowsPerBatch
    assert(batchSizes.forall(_ <= 10L), s"batch sizes were $batchSizes")
    // deterministic generator: spot-check a row against the pure function
    val r7 = got.filter(col("review_id") === 1000007L).head()
    val expected = graft.streaming.ReviewReplaySource.row(7L)
    assert(r7.getAs[String]("languagecode") === expected._3)
    assert(r7.getAs[String]("text") === expected._5)
  }

  test("S1→M1: replay source composes with the enrichment stream end-to-end") {
    val out = tmp("replay-enriched")
    val ckpt = tmp("replay-enriched-ckpt")
    val q = graft.streaming.EnrichStream.runFromReplay(
      spark, out, ckpt, graft.ml.LexiconScorer, rowsPerBatch = 10, maxRows = 40)
    q.processAllAvailable()
    q.stop()
    val scored = spark.read.parquet(out)
    assert(scored.count() === 40L)
    assert(scored.columns.toSet === Set("record_id", "sentiment", "confidence"))
    // deterministic feed → deterministic labels: phrase 0 ("good") scores
    // positive, phrase 3 ("poor ... bad") negative
    val byId = scored.collect().map(r => r.getString(0).toLong -> r.getString(1)).toMap
    assert(byId(1000000L) === "positive")
    assert(byId(1000003L) === "negative")
  }

  test("S1: HTTP fetch path matches the in-memory feed and survives transient 503s") {
    val stub = graft.streaming.ReviewFeedStub.start(failFirst = 2)
    try {
      val out = tmp("replay-http-out")
      val ckpt = tmp("replay-http-ckpt")
      val q = spark.readStream.format("review-replay")
        .option("rowsPerBatch", 10).option("maxRows", 35).option("numPartitions", 3)
        .option("endpoint", stub.endpoint)
        .option("httpMaxAttempts", 4).option("httpBackoffMs", 10)
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("review_id") -> r).toMap
      assert(got.size === 35, "all rows must arrive over HTTP despite the 503s")
      // the server really was hit, and more times than pages (the retries)
      assert(stub.requestCount > 2, s"only ${stub.requestCount} requests — retries never reached the server")
      // HTTP rows are byte-identical to the pure generator
      (0L until 35L).foreach { i =>
        val e = graft.streaming.ReviewReplaySource.row(i)
        val r = got(e._1)
        assert(r.getAs[Long]("hotel_id") === e._2 &&
          r.getAs[String]("languagecode") === e._3 &&
          r.getAs[Double]("average_score") === e._4 &&
          r.getAs[String]("text") === e._5, s"row $i drifted across transports")
      }
    } finally stub.stop()
  }

  test("S1: a permanently failing endpoint aborts the stream, never a short read") {
    val stub = graft.streaming.ReviewFeedStub.start(failFirst = Int.MaxValue)
    try {
      val out = tmp("replay-fail-out")
      val ckpt = tmp("replay-fail-ckpt")
      val q = spark.readStream.format("review-replay")
        .option("rowsPerBatch", 5).option("maxRows", 10)
        .option("endpoint", stub.endpoint)
        .option("httpMaxAttempts", 2).option("httpBackoffMs", 5)
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .start()
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(30000)
      }
      q.stop()
      def chain(t: Throwable): Seq[String] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .map(x => Option(x.getMessage).getOrElse("")).toSeq
      assert(chain(e).exists(_.contains("review feed fetch failed")),
        s"unexpected failure chain: ${chain(e)}")
      val emitted = Option(new java.io.File(out).listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
      assert(emitted === 0, "a failed fetch must not emit rows")
    } finally stub.stop()
  }

  test("S1: restart from checkpoint resumes exactly-once (no refetch overlap)") {
    val out = tmp("replay-out2")
    val ckpt = tmp("replay-ckpt2")
    def run(): Unit = {
      val q = spark.readStream.format("review-replay")
        .option("rowsPerBatch", 7).option("maxRows", 30)
        .load()
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.write.mode("append").parquet(out)
        }
        .option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    run() // drains all 30 rows
    run() // restart against the same checkpoint: nothing new to admit
    val got = spark.read.parquet(out)
    assert(got.count() === 30L, "restart must not re-emit checkpointed rows")
    assert(got.select("review_id").distinct().count() === 30L)
  }
}
