package graft

import graft.operators.{Bucketing, Sketches}
import org.apache.spark.sql.functions._

/** Pins for the sketch/layout batch: CMS estimates against an in-test
  * reference, and the Morton interleave against an independent Scala
  * implementation.
  */
class SketchLayoutSpec extends SparkSpec {

  test("cms heavy hitters: both bound flags hold and exact counts match a recount") {
    val rows = Sketches.cmsHeavyHitters(spark, sf).collect()
    assert(rows.length > 0 && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Int]("est_ge_exact") == 1, s"${r.getAs[String]("tok")} under-estimated")
      assert(r.getAs[Int]("est_in_bound") == 1, s"${r.getAs[String]("tok")} above 3-eps-N")
    }
    // independent recount of the top token
    val top = rows.maxBy(_.getAs[Long]("n_exact"))
    val recount = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(col("t") === top.getAs[String]("tok")).count()
    assert(recount == top.getAs[Long]("n_exact"))
  }

  test("cms estimate: null-safe, zero-floor for absent items, bounded by collision mass") {
    import spark.implicits._
    import graft.functions.SketchFunctions.cmsEstimate
    val toks = Seq.fill(1000)("common") ++ Seq("rare")
    val sketch = toks.toDF("tok")
      .agg(expr("count_min_sketch(tok, 0.001d, 0.999d, 7)").as("cms"))
    val probes = Seq(Some("common"), Some("rare"), Some("absent_zzz"), None)
      .toDF("item")
    val out = probes.crossJoin(sketch)
      .select(col("item"), cmsEstimate(col("cms"), col("item")).as("est"))
      .collect().map(r => Option(r.getAs[String]("item")) ->
        Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out(Some("common")).get >= 1000L)
    assert(out(Some("rare")).get >= 1L)
    val absent = out(Some("absent_zzz")).get
    assert(absent >= 0L && absent <= 4L, s"absent token estimated $absent")
    assert(out(None).isEmpty, "null item must yield null, not a crash")
  }

  test("morton key matches an independent bit-interleave for the full 8-bit domain sample") {
    def mortonRef(x: Long, y: Long): Long = {
      var z = 0L
      var b = 0
      while (b < 16) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
        b += 1
      }
      z
    }
    import spark.implicits._
    val pairs = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)).toDF("zx", "zy")
    val got = pairs.withColumn("zkey", Bucketing.mortonKey(col("zx"), col("zy")))
      .collect()
    got.foreach { r =>
      val (x, y, z) = (r.getAs[Long]("zx"), r.getAs[Long]("zy"), r.getAs[Long]("zkey"))
      assert(z == mortonRef(x, y), s"morton($x,$y)")
    }
  }

  test("zorder ranges tile the fact with tight per-range bounds on both dimensions") {
    val rows = Bucketing.zorderLayout(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      // the pruning property: a 1/16 z-range fixes the top TWO bits of each
      // 8-bit dimension, so per-range spans are ≤ 63 on BOTH columns — a
      // single-column sort would leave the other column spanning the full
      // domain in every file
      assert(r.getAs[Long]("max_cust") - r.getAs[Long]("min_cust") <= 63)
      assert(r.getAs[Long]("max_price_bucket") - r.getAs[Long]("min_price_bucket") <= 63)
    }
  }
}
