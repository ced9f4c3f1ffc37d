package graft

import graft.functions.CentroidAggregator
import org.apache.spark.sql.functions._

/** Custom typed Aggregator (§2.12): centroid results match the
  * posexplode+avg formulation exactly. */
class CentroidSpec extends SparkSpec with org.scalactic.Tolerance {
  import spark.implicits._

  test("Aggregator centroids equal the posexplode formulation") {
    val emb = Tables.embeddings(spark, sf)
    val viaAgg = emb
      .select(col("label"), col("embedding"))
      .as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("centroid"))
      .collect().toMap
    val viaExplode = emb
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg("v").as("c"))
      .collect().groupBy(_.getInt(0))
      .map { case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    assert(viaAgg.keySet === viaExplode.keySet)
    viaAgg.foreach { case (label, cent) =>
      val exp = viaExplode(label)
      assert(cent.length === exp.length)
      cent.zip(exp).foreach { case (a, b) => assert(a === b +- 1e-9) }
    }
  }

  test("Aggregator handles the typed-input contract") {
    val ds = Seq((0, Array(1.0f, 3.0f)), (0, Array(3.0f, 5.0f)), (1, Array(2.0f, 2.0f)))
      .toDS()
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(CentroidAggregator.toColumn.name("c"))
      .collect().toMap
    assert(out(0).toSeq === Seq(2.0, 4.0))
    assert(out(1).toSeq === Seq(2.0, 2.0))
  }

  test("entry() flagship query returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
