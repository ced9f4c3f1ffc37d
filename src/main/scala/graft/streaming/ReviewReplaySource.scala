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
  *  - The stream replays a deterministic synthetic review feed (the REST
  *    endpoint is unreachable in this environment; the generator stands in
  *    for the HTTP page fetch, everything around it is the real contract).
  *  - Offsets are row indices; each micro-batch admits `rowsPerBatch` rows
  *    (the REST page size) up to `maxRows`. Offsets live in the checkpoint,
  *    so a restarted query resumes EXACTLY where it stopped — the
  *    exactly-once upgrade over the reference's overlap-window refetch.
  *  - `planInputPartitions` splits each batch range into `numPartitions`
  *    contiguous slices — batch generation fans out across executors; at a
  *    real REST endpoint each slice is an independent page request.
  *
  * Usage: `spark.readStream.format("review-replay")
  *   .option("rowsPerBatch", 10).option("maxRows", 100).load()`.
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
    () => new Scan {
      override def readSchema(): StructType = ReviewReplaySource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ReviewReplayStream(rowsPerBatch, maxRows, numPartitions)
    }
  }
}

/** Row-index offset; serializes as the bare number. */
private[streaming] case class ReplayOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

private[streaming] class ReviewReplayStream(
    rowsPerBatch: Long, maxRows: Long, numPartitions: Int)
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

  override def createReaderFactory(): PartitionReaderFactory = ReplayReaderFactory

  override def deserializeOffset(json: String): Offset = ReplayOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[streaming] case class ReplayInputPartition(from: Long, to: Long) extends InputPartition

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
