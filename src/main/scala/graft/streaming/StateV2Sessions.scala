package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Event-time-TIMER sessionization on the arbitrary-state API v2 — the
  * round-16 verdict #4 gap: [[StateV2Profile]] put `transformWithState`'s
  * ValueState/ListState under fuzz and SIGKILL evidence, but nothing in the
  * engine registered a TIMER, the API's distinguishing feature over
  * `flatMapGroupsWithState` (event-/processing-time callbacks driving state
  * expiry and emission, per-key, durable across restarts).
  *
  * The operator recomputes the engine's session semantics (the
  * `q_stream_sessions` gaps-and-islands contract: a ≥gap pause splits) from
  * buffered per-key state, with emission driven ONLY by timer expiry:
  *
  *  - `buf` (ListState): the key's not-yet-finalized events as
  *    (event-time µs, cents) pairs — watermark-horizon-bounded, because
  *    finalized sessions are pruned on emission (see the gate's state
  *    bound);
  *  - one registered event-time timer per key at the EARLIEST open
  *    session's close (`last + gap`, ceil-ms): sessions of one key are
  *    disjoint time intervals, so closes are monotone and one timer
  *    suffices;
  *  - [[SessionTimerProcessor.handleExpiredTimer]] finalizes every session
  *    whose close cleared the current watermark, emits it, prunes its
  *    events from the buffer, and re-arms the timer for the earliest
  *    remaining close.
  *
  * A session emitted before its close cleared the watermark (a late event
  * could still extend it), a timer that never fired (session held forever),
  * a split on a sub-gap pause, or state lost across a restart all diverge
  * from the batch gaps-and-islands recomputation the gate/fuzzer compare
  * against.
  *
  * Why the emission rule is conservative-correct: a future on-time event
  * has ts ≥ wm, and extends a session iff ts < last + gap — so once
  * wm ≥ last + gap (µs compared against the ms watermark × 1000) no on-time
  * event can extend it. The timer expiry is ceil-ms of that close, so the
  * timer fires no earlier than closability; if it fires when a LATER
  * watermark has already passed several closes, all of them finalize in one
  * callback.
  *
  * Reference hook: same incremental-session bookkeeping family as
  * [[StatefulEnrich]] (`FunctionApp2/process_data/__init__.py:41,101`),
  * upgraded to v2 column families + timers.
  */
object StateV2Sessions {

  final case class SEv(event_id: Long, ts: java.sql.Timestamp, user_id: Long, cents: Long)
  /** `ws`/`le` are the session's first/last event time in µs; `le` rides
    * along so harnesses can reason about the close (`le + gap`) — the gate
    * projects it away, the fuzzer uses it for its boundary band. */
  final case class Session(user_id: Long, ws: Long, le: Long, n_events: Long, cents: Long)

  /** 30-minute gap — the `q_stream_sessions` constant; the fuzzer's
    * `v2_session` kind randomizes it. */
  val GapSec = 1800L

  class SessionTimerProcessor(gapSec: Long)
      extends StatefulProcessor[Long, SEv, Session] {
    @transient private var buf: ListState[(Long, Long)] = _
    private val gapUs = gapSec * 1000000L

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      // TTL NONE: expiry is the TIMER's job here — that is the semantics
      // under test. (TTL would bound state by processing time; sessions
      // close in event time.)
      buf = getHandle.getListState[(Long, Long)]("buf",
        org.apache.spark.sql.Encoders.product[(Long, Long)], TTLConfig.NONE)
    }

    /** Gaps-and-islands over the buffered (es, cents) pairs: returns the
      * key's open sessions oldest-first as (ws, le, n, cents). */
    private def sessionize(evs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
      val sorted = evs.sortBy(_._1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var ws = 0L; var le = 0L; var n = 0L; var c = 0L
      sorted.foreach { case (es, cents) =>
        if (n == 0L || es - le >= gapUs) {
          if (n > 0L) out += ((ws, le, n, c))
          ws = es; le = es; n = 1L; c = cents
        } else { le = es; n += 1L; c += cents }
      }
      if (n > 0L) out += ((ws, le, n, c))
      out.toSeq
    }

    /** One timer per key at the earliest open close (ceil-ms so the expiry
      * never precedes closability). */
    private def rearm(sessions: Seq[(Long, Long, Long, Long)]): Unit = {
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      sessions.headOption.foreach { case (_, le, _, _) =>
        getHandle.registerTimer((le + gapUs + 999L) / 1000L)
      }
    }

    /** Exact µs of a Timestamp (getTime's ms already carries the nanos'
      * integral-ms part, so seconds must come from floorDiv, micros from
      * getNanos). */
    private def micros(ts: java.sql.Timestamp): Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

    /** Buffer the rows and (re-)arm the key's single timer. Emission happens
      * ONLY in [[handleExpiredTimer]] — if the new earliest close is already
      * under the current watermark, the re-armed timer fires in this very
      * micro-batch's timer phase (inputs are processed before expiry scans). */
    override def handleInputRows(user: Long, rows: Iterator[SEv],
                                 timers: TimerValues): Iterator[Session] = {
      rows.foreach(e => buf.appendValue((micros(e.ts), e.cents)))
      rearm(sessionize(buf.get().toSeq))
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, timers: TimerValues,
                                    expired: ExpiredTimerInfo): Iterator[Session] = {
      val wmUs = timers.getCurrentWatermarkInMs() * 1000L
      val sessions = sessionize(buf.get().toSeq)
      val (closed, open) = sessions.partition { case (_, le, _, _) => le + gapUs <= wmUs }
      if (closed.nonEmpty) {
        val keepFrom = closed.map(_._2).max // prune finalized events
        val kept = buf.get().toSeq.filter(_._1 > keepFrom)
        buf.clear()
        kept.foreach(buf.appendValue)
      }
      rearm(open)
      closed.iterator.map { case (ws, le, n, c) => Session(user, ws, le, n, c) }
    }
  }

  /** Timer-driven sessionization over the events dir; AvailableNow drains
    * the source, RocksDB holds the buffer state and the timers (the v2
    * requirement). The provider conf is restored once the query starts —
    * the checkpoint owns it from then on (the [[StateV2Profile]] protocol).
    *
    * `afterSinkWrite` / `idempotentSink` are the crash-cell hooks (the
    * [[StateV2Profile.runProfiles]] convention): the idempotent variant
    * writes per-batch directories through foreachBatch and fires the hook
    * after the sink write, INSIDE the batch's uncommitted window —
    * CrashKillSpec's timer cell SIGKILLs a forked drain there while
    * registered event-time timers are still armed and un-fired, the one
    * state family (timer rows travel the checkpoint like row state) the
    * other four cells never exercised. Production callers leave both
    * defaults and get the plain file sink. */
  def runSessions(spark: SparkSession, srcDir: String, outDir: String,
                  checkpointDir: String,
                  gapSec: Long = GapSec,
                  delaySec: Long = 1800L,
                  maxFilesPerTrigger: Int = 4,
                  afterSinkWrite: Long => Unit = _ => (),
                  idempotentSink: Boolean = false): StreamingQuery = {
    import spark.implicits._
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProvider = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val sessions = EventsStream.readEvents(spark, srcDir, maxFilesPerTrigger)
        .select(col("event_id"), col("ts"), col("user_id"),
          floor(col("value") * 100).cast("long").as("cents"))
        .withWatermark("ts", s"$delaySec seconds")
        .as[SEv]
        .groupByKey(_.user_id)
        .transformWithState(new SessionTimerProcessor(gapSec),
          TimeMode.EventTime(), OutputMode.Append())
      val writer = sessions.writeStream
        .trigger(Trigger.AvailableNow())
        .outputMode("append")
        .option("checkpointLocation", checkpointDir)
      if (idempotentSink)
        writer.foreachBatch { (batch: org.apache.spark.sql.Dataset[Session], id: Long) =>
          batch.write.mode("overwrite").parquet(s"$outDir/b$id")
          afterSinkWrite(id)
        }.start()
      else
        writer.format("parquet").option("path", outDir).start()
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set(confKey, p)
        case None    => spark.conf.unset(confKey)
      }
    }
  }

  /** State bound for the drained gate: per key the store legally holds the
    * buffered events of OPEN sessions plus one timer row — and the staged
    * sentinel closes every real session (a real close is ≤ max(ts)+gap,
    * under the final watermark max+90 min), so the terminated query's state
    * is the sentinel's buffer plus per-key timer/bookkeeping slack. The
    * bound stays generous but lifetime-independent: the horizon tail's
    * events plus two rows per distinct user. */
  private[graft] def timerStateBound(spark: SparkSession, srcDir: String): Long = {
    val ev = spark.read.parquet(srcDir)
    val mx = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val wmFinal = mx.getTime - 30L * 60 * 1000
    val tail = ev.filter(col("ts") > lit(new java.sql.Timestamp(
      wmFinal - (GapSec * 1000L + 2L * 3600 * 1000)))).count()
    val users = ev.select(col("user_id")).distinct().count()
    tail + 2 * users + 16
  }

  /** Timer-driven v2 sessionization AS a correctness-gate query
    * (`q_stream_timer_sessions`): drain [[runSessions]] over the staged
    * event files; the sink must equal the batch gaps-and-islands
    * recomputation — the `q_stream_sessions` oracle with a cents payload —
    * with every emission produced by a TIMER callback. A timer that never
    * fired (session held), fired early (partial session emitted), split on
    * a sub-gap pause, or double-fired across micro-batches all change the
    * hash. */
  def timerSessionGate(spark: SparkSession, d: String): DataFrame =
    EventsStream.memoDrain(spark, d, "timer_sessions") {
      val src = EventsStream.stageEvents(spark, d)
      EventsStream.drainGate(spark, "graft-stream-v2sess-gate",
        stateBound = timerStateBound(spark, src),
        boundKind = "horizon+keyspace") { (iso, out, ckpt) =>
        runSessions(iso, src, out, ckpt)
      } { sink =>
        sink.filter(col("user_id") >= 0)
          .select(expr("ws DIV 1000000").as("session_s"), col("user_id"),
            col("n_events"), col("cents"))
      }
    }
}
