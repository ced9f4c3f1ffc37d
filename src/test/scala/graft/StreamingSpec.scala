package graft

import graft.streaming.EventsStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Structured Streaming slice (SURVEY.md §2.10): AvailableNow drain,
  * checkpointed exactly-once foreachBatch, stream/batch agreement. */
class StreamingSpec extends SparkSpec {

  /** Spark-written copy of events (µs timestamps), range-partitioned by time
    * so the file source replays them roughly in event-time order across
    * several micro-batches — which is what lets the watermark advance and
    * close windows between batches. */
  private lazy val srcDir: String = {
    val dir = Files.createTempDirectory("graft-stream-src").toString
    Tables.events(spark, sf).repartitionByRange(8, col("ts"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("foreachBatch sink drains the source exactly once under AvailableNow") {
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
    val expected = Tables.events(spark, sf).count()
    assert(streamed.count() === expected)
    assert(streamed.select("event_id").distinct().count() === expected)
  }

  test("checkpoint recovery: restarting the drained query appends nothing") {
    val out = Files.createTempDirectory("graft-stream-out2").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt2").toString
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val afterFirst = spark.read.parquet(out).count()
    // second run with the SAME checkpoint: offsets say everything is done
    EventsStream.run(spark, srcDir, out, ckpt).awaitTermination(120000)
    val afterSecond = spark.read.parquet(out).count()
    assert(afterFirst === afterSecond, "restart re-emitted rows — not exactly-once")
  }

  test("streaming windowed counts match the batch computation") {
    val out = Files.createTempDirectory("graft-stream-win").toString
    val ckpt = Files.createTempDirectory("graft-stream-winck").toString
    EventsStream.runWindowed(spark, srcDir, out, ckpt).awaitTermination(120000)
    val streamed = spark.read.parquet(out)
      .select("window_start", "event_type", "n_events")
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))
    // append mode only emits windows the watermark closed; every emitted
    // window must match the batch answer exactly
    val mismatched = streamed.join(batch,
      Seq("window_start", "event_type"), "left_anti")
    assert(mismatched.isEmpty, "streamed window disagrees with batch")
    val joined = streamed.alias("s").join(batch.alias("b"), Seq("window_start", "event_type"))
      .filter(col("s.n_events") =!= col("b.n_events"))
    assert(joined.isEmpty)
    assert(streamed.count() > 0, "watermark closed no windows — nothing verified")
  }
}
