package graft.streaming

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DSv2 streaming source (SURVEY §2.1 S1): the reference's
  * timer-driven REST review feed (FunctionApp1/hotel_reviews/__init__.py:
  * 9,16,35-37 — every 3 h, GET reviews, emit records) re-expressed as a
  * first-class Structured Streaming `MicroBatchStream`. The file-source
  * workaround SURVEY §7 planned remains the default ingest path; this
  * source closes the literal-parity gap with offset tracking the engine —
  * not the operator — owns, which is precisely what the reference's
  * at-least-once timer loop lacks.
  *
  * Semantics:
  *  - With an `endpoint` option the stream fetches each partition slice as
  *    a LITERAL HTTP page request (`GET endpoint?offset=N&limit=M`,
  *    envelope `{"result": [...]}` — the reference's response shape) with
  *    bounded-retry exponential backoff; a non-200 after the retry budget
  *    aborts the task (M2: no silent short reads). Without `endpoint` the
  *    deterministic in-memory generator produces the identical feed — both
  *    paths share every offset/admission/partitioning mechanism, so the
  *    specs can pin them against each other.
  *  - Offsets are row indices; each micro-batch admits `rowsPerBatch` rows
  *    (the REST page size) up to `maxRows`. Offsets live in the checkpoint,
  *    so a restarted query resumes EXACTLY where it stopped — the
  *    exactly-once upgrade over the reference's overlap-window refetch.
  *  - `planInputPartitions` splits each batch range into `numPartitions`
  *    contiguous slices — each slice is an independent page request, so
  *    page fetches fan out across executors.
  *
  * Usage: `spark.readStream.format("review-replay")
  *   .option("rowsPerBatch", 10).option("maxRows", 100)
  *   .option("endpoint", "http://host/reviews")  // omit for in-memory
  *   .load()`.
  */
class ReviewReplaySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "review-replay"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ReviewReplaySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ReviewReplayTable
}

object ReviewReplaySource {
  /** The reference's review-record core shape (sample.json fields the
    * pipeline consumes). */
  val schema: StructType = StructType(Seq(
    StructField("review_id", LongType, nullable = false),
    StructField("hotel_id", LongType, nullable = false),
    StructField("languagecode", StringType, nullable = false),
    StructField("average_score", DoubleType, nullable = false),
    StructField("text", StringType, nullable = false)))

  private val langs = Array("en-gb", "de", "fr", "es")
  private val phrases = Array(
    "fast checkin and a good room", "slow service but great view",
    "plain stay nothing special", "poor breakfast bad noise levels")

  /** Deterministic row `i` of the replay feed — pure function of the index,
    * so every executor, retry, and restart generates identical data. */
  def row(i: Long): (Long, Long, String, Double, String) = (
    1000000L + i,
    1676161L,
    langs((i % langs.length).toInt),
    (i % 11).toDouble / 2.0 + 5.0,
    s"review $i: ${phrases((i % phrases.length).toInt)}")
}

private class ReviewReplayTable extends Table with SupportsRead {
  override def name(): String = "review_replay"
  override def schema(): StructType = ReviewReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val rowsPerBatch = options.getLong("rowsPerBatch", 10L)
    val maxRows = options.getLong("maxRows", 100L)
    val numPartitions = options.getInt("numPartitions", 2)
    val endpoint = Option(options.get("endpoint")).filter(_.nonEmpty)
    val maxAttempts = options.getInt("httpMaxAttempts", 4)
    val backoffMs = options.getLong("httpBackoffMs", 50L)
    () => new Scan {
      override def readSchema(): StructType = ReviewReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ReviewReplayStream(rowsPerBatch, maxRows, numPartitions,
          endpoint, maxAttempts, backoffMs)
    }
  }
}

/** Row-index offset; serializes as the bare number. */
private[streaming] case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[streaming] class ReviewReplayStream(
    rowsPerBatch: Long, maxRows: Long, numPartitions: Int,
    endpoint: Option[String] = None, maxAttempts: Int = 4, backoffMs: Long = 50L)
  extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = ReplayOffset(0L)

  /** Admission control gives us the START offset, so the source stays
    * stateless across restarts: next end = min(start + page, maxRows),
    * derived from the checkpoint, never from instance state. (The argless
    * `latestOffset()` overload cannot know the restart position — a mutable
    * cursor there would re-emit or skip rows after recovery.) */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    ReplayOffset(math.min(start.asInstanceOf[ReplayOffset].index + rowsPerBatch, maxRows))

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "ReviewReplayStream implements SupportsAdmissionControl; the engine calls latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ReplayOffset].index
    val e = end.asInstanceOf[ReplayOffset].index
    val n = math.max(1, math.min(numPartitions.toLong, e - s)).toInt
    (0 until n).map { p =>
      val from = s + (e - s) * p / n
      val to = s + (e - s) * (p + 1) / n
      ReplayInputPartition(from, to): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = endpoint match {
    case Some(url) => new HttpReplayReaderFactory(url, maxAttempts, backoffMs)
    case None      => ReplayReaderFactory
  }

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] case class ReplayInputPartition(from: Long, to: Long) extends InputPartition

/** HTTP page-fetch reader (S1 literal parity with
  * FunctionApp1/hotel_reviews/__init__.py:35-37): each partition slice is
  * one `GET endpoint?offset=from&limit=(to-from)` against the review feed.
  * Transient failures retry with exponential backoff (`backoffMs · 2^k`);
  * exhausting `maxAttempts` throws — the task (and with it the micro-batch)
  * aborts rather than emitting a short page, the same strictness contract
  * as the batched RPC scorer (M2). The envelope is validated: a missing
  * `result` array or a page whose size differs from the request is a
  * poisoned response, not data. */
private[streaming] class HttpReplayReaderFactory(
    endpoint: String, maxAttempts: Int, backoffMs: Long)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayInputPartition]
    new PartitionReader[InternalRow] {
      private var rows: Array[InternalRow] = _
      private var i = -1
      override def next(): Boolean = {
        if (rows == null)
          rows = ReviewFeedClient.fetchPage(endpoint, p.from, p.to - p.from,
            maxAttempts, backoffMs)
        i += 1
        i < rows.length
      }
      override def get(): InternalRow = rows(i)
      override def close(): Unit = ()
    }
  }
}

/** Minimal HTTP client for the review feed: JDK `HttpURLConnection` (no
  * extra dependency), Jackson (shipped with Spark) for the envelope. */
private[streaming] object ReviewFeedClient {
  /** Retries cover TRANSPORT failures only (`IOException`: non-200, connect
    * or read timeouts). A malformed envelope or wrong-size page is a
    * poisoned RESPONSE — `parsePage`'s `IllegalArgumentException` aborts
    * the task immediately, no retry (M2 strictness: backoff cannot repair
    * bad data). Task-kill interrupts propagate untouched so `query.stop()`
    * never waits out a backoff ladder; individual sleeps are capped at
    * [[MaxBackoffSleepMs]] regardless of attempt count. */
  private val MaxBackoffSleepMs = 10000L

  def fetchPage(endpoint: String, offset: Long, limit: Long,
                maxAttempts: Int, backoffMs: Long): Array[InternalRow] = {
    var attempt = 0
    var lastErr: Throwable = null
    while (attempt < maxAttempts) {
      attempt += 1
      try {
        return parsePage(httpGet(s"$endpoint?offset=$offset&limit=$limit"), limit)
      } catch {
        case e: java.io.IOException =>
          lastErr = e
          if (attempt < maxAttempts)
            Thread.sleep(math.min(backoffMs << math.min(attempt - 1, 16),
              MaxBackoffSleepMs))
      }
    }
    throw new IllegalStateException(
      s"review feed fetch failed after $maxAttempts attempts: ${lastErr.getMessage}",
      lastErr)
  }

  private def httpGet(url: String): String = {
    val conn = java.net.URI.create(url).toURL
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(5000)
    conn.setReadTimeout(15000)
    try {
      val code = conn.getResponseCode
      if (code != 200) throw new java.io.IOException(s"HTTP $code from $url")
      new String(conn.getInputStream.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
    } finally conn.disconnect()
  }

  private def parsePage(body: String, expected: Long): Array[InternalRow] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
    val result = root.get("result")
    require(result != null && result.isArray,
      "review feed envelope missing the 'result' array")
    require(result.size().toLong == expected,
      s"review feed page size ${result.size()} != requested $expected")
    Array.tabulate(result.size()) { j =>
      val r = result.get(j)
      InternalRow(r.get("review_id").asLong(), r.get("hotel_id").asLong(),
        UTF8String.fromString(r.get("languagecode").asText()),
        r.get("average_score").asDouble(),
        UTF8String.fromString(r.get("text").asText()))
    }
  }
}

private[streaming] object ReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ReplayInputPartition]
    new PartitionReader[InternalRow] {
      private var i = p.from - 1
      override def next(): Boolean = { i += 1; i < p.to }
      override def get(): InternalRow = {
        val (id, hotel, lang, score, text) = ReviewReplaySource.row(i)
        InternalRow(id, hotel, UTF8String.fromString(lang), score,
          UTF8String.fromString(text))
      }
      override def close(): Unit = ()
    }
  }
}
