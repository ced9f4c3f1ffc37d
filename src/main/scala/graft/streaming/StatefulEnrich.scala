package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY.md §2.10):
  * the Spark-native generalization of the reference's `processed`-flag
  * incremental bookkeeping (FunctionApp2/process_data/__init__.py:41,101) —
  * instead of a dirty column rewritten after the fact, per-key state lives
  * in the checkpointed state store and survives restarts.
  *
  * The operator: per-user running profile over the event stream — total
  * events, total purchase value, and a "first seen" stamp — emitting one
  * updated profile row per user per micro-batch. State is bounded (one small
  * struct per user) and keyed by the shuffle, so it scales with distinct
  * users, not event volume.
  */
object StatefulEnrich {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserProfile(user_id: Long, n_events: Long, purchase_value: Double,
                               first_event_id: Long)

  def updateProfile(
      userId: Long, events: Iterator[Event],
      state: GroupState[UserProfile]): Iterator[UserProfile] = {
    // state TTL: a user idle past the timeout is evicted, so the store
    // scales with ACTIVE users, not every user ever seen on the stream
    if (state.hasTimedOut) { state.remove(); return Iterator.empty }
    val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, Long.MaxValue))
    var n = prev.n_events
    var pv = prev.purchase_value
    var first = prev.first_event_id
    events.foreach { e =>
      n += 1
      if (e.event_type == "purchase") pv += e.value
      if (e.event_id < first) first = e.event_id
    }
    val next = UserProfile(userId, n, pv, first)
    state.update(next)
    state.setTimeoutDuration("30 days")
    Iterator(next)
  }

  /** Streaming per-user profiles with custom state; AvailableNow drains the
    * source and the state store checkpoint makes re-runs incremental. */
  def runProfiles(spark: SparkSession, srcDir: String, outDir: String,
                  checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val events = EventsStream.readEvents(spark, srcDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.ProcessingTimeTimeout())(updateProfile)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[UserProfile], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .start()
  }
}
