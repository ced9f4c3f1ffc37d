package graft

import graft.operators.{AsOfJoin, Skew}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** As-of join semantics + skew utilities. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest right row at or before the left timestamp") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:30")),
      (2L, "A", ts("2024-01-01 10:02:00")),
      (3L, "B", ts("2024-01-01 10:00:00"))).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0),
      ("A", ts("2024-01-01 10:01:00"), 101.0),
      ("A", ts("2024-01-01 10:02:00"), 102.0), // equal ts: inclusive
      ("B", ts("2024-01-01 10:01:00"), 50.0))  // after B's trade: no match
      .toDF("sym", "t", "px")
    val out = AsOfJoin.asOf(trades, quotes, Seq("sym"), "t", "t", rightTiebreak = "px")
      .select(col("trade_id"), col("matched.px").as("px"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(out(1L) === 100.0) // 10:00:30 → quote at 10:00:00
    assert(out(2L) === 102.0) // equal-timestamp quote matches (inclusive <=)
    assert(out(3L) === null)  // no quote at or before 10:00:00
  }

  test("as-of query matches a per-group scala reference on real events") {
    val out = AsOfJoin.purchasesWithLastView(spark, sf)
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val views = events.filter(_._3 == "view").groupBy(_._2)
    val expected = events.filter(_._3 == "purchase").map { case (eid, uid, _, t) =>
      val best = views.getOrElse(uid, Array.empty).filter(v => !v._4.after(t))
        .sortBy(v => (v._4.getTime, v._1)).lastOption.map(_._1)
      eid -> best
    }.toMap
    val got = out.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum("l_quantity").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1) * 100).round, r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(
      Tables.lineitem(spark, sf), Seq("l_returnflag"), "l_quantity", "l_orderkey")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1) * 100).round, r.getLong(2))).toMap
    assert(salted === plain)
  }

  test("salted join equals the plain join") {
    val fact = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = fact.join(dim, Seq("o_custkey")).count()
    val salted = Skew.saltedJoin(fact, dim, "o_custkey", "o_orderkey").count()
    assert(salted === plain)
  }
}
