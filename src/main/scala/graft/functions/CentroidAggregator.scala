package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` for embedding centroids (SURVEY.md §2.12 — the one
  * custom UDAF the engine ships): elementwise running sum + count, merged
  * associatively, finished as the mean vector.
  *
  * Complements the posexplode+avg formulation ([[graft.operators.Similarity
  * .labelCentroids]]): the Aggregator keeps each partial as ONE buffer row
  * per group per partition (dim doubles), where posexplode shuffles
  * (group × dim) rows — at thousands of groups the Aggregator's shuffle is
  * `dim × groups` doubles either way, but its map-side combine touches no
  * row explosion at all. Trade-off documented in both places; results are
  * identical (CentroidSpec).
  */
object CentroidAggregator extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
    val (sum, n) = b
    val s = if (sum.isEmpty) new Array[Double](a.length) else sum
    var i = 0
    while (i < a.length) { s(i) += a(i); i += 1 }
    (s, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._1.isEmpty) y
    else if (y._1.isEmpty) x
    else {
      val s = x._1
      var i = 0
      while (i < s.length) { s(i) += y._1(i); i += 1 }
      (s, x._2 + y._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.empty[Double] else r._1.map(_ / r._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.tuple(ExpressionEncoder[Array[Double]](), Encoders.scalaLong)

  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}
