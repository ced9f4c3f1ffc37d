package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing (D4): binary payloads, typed metadata, deterministic
  * stub decode, frame sampling shape. */
class MultimodalSpec extends SparkSpec {

  test("assets carry binary payload + typed metadata struct") {
    val a = Multimodal.assets(spark, sf)
    val schema = a.schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val row = a.filter(col("asset_id") === 0).select(col("meta.n_bytes"), length(col("payload"))).head()
    assert(row.getLong(0) === row.getInt(1).toLong)
  }

  test("stub decode is deterministic and fixed-width") {
    val f1 = Multimodal.fakeDecodeFeatures(Multimodal.assets(spark, sf))
      .select("asset_id", "features").orderBy("asset_id").collect()
    val f2 = Multimodal.fakeDecodeFeatures(Multimodal.assets(spark, sf))
      .select("asset_id", "features").orderBy("asset_id").collect()
    assert(f1.sameElements(f2))
    assert(f1.head.getSeq[Double](1).size === 8)
    assert(f1.head.getSeq[Double](1).forall(v => v >= 0.0 && v < 1.0))
  }

  test("batched decode: kernel sees <=batchSize payloads, every asset decoded once, deterministic") {
    import spark.implicits._
    val assets = Multimodal.assets(spark, sf)
      .select(col("asset_id"), col("payload"))
      .as[(Long, Array[Byte])]
    // the kernel itself enforces the batch contract — a violation fails the task
    val checkedKernel: Seq[Array[Byte]] => Seq[Array[Float]] = { batch =>
      require(batch.nonEmpty && batch.size <= 16, s"batch of ${batch.size} breaks the <=16 contract")
      Multimodal.fakeBatchKernel(batch)
    }
    val d1 = Multimodal.decodeBatched(assets, checkedKernel).collect().sortBy(_.asset_id)
    val d2 = Multimodal.decodeBatched(assets, checkedKernel).collect().sortBy(_.asset_id)
    assert(d1.length === assets.count())
    assert(d1.map(_.asset_id).distinct.length === d1.length, "an asset decoded twice")
    assert(d1.forall(_.features.size === 8), "feature width drifted")
    assert(d1.toSeq === d2.toSeq, "batched decode not deterministic")
  }

  test("real imageio decode recovers dims, channels, and exact channel means") {
    val rows = Multimodal.imageDecodeQuery(spark, sf).collect()
      .map(r => r.getAs[Long]("asset_id") -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, r) =>
      assert(r.getAs[Int]("width") === (4 + id % 5).toInt, s"asset $id width")
      assert(r.getAs[Int]("height") === (4 + id % 3).toInt, s"asset $id height")
      assert(r.getAs[Int]("n_channels") === 3)
      // PNG is lossless and the fixture is solid-color: means are EXACT
      assert(r.getAs[Double]("mean_r") === (id % 256).toDouble, s"asset $id r")
      assert(r.getAs[Double]("mean_g") === ((id * 2) % 256).toDouble, s"asset $id g")
      assert(r.getAs[Double]("mean_b") === ((id * 3) % 256).toDouble, s"asset $id b")
    }
  }

  test("imageio decode is per-pixel faithful on a gradient image") {
    // beyond solid colors: encode a known gradient, decode it back, and
    // check individual pixels — pins that the kernel reads real pixel data,
    // not just metadata
    val w = 6; val h = 4
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 60) << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val feats = Multimodal.imageBatchKernel(Seq(bos.toByteArray)).head
    assert(feats(0) === w.toFloat && feats(1) === h.toFloat)
    // mean_r = avg(x*40) = 40 * (0+..+5)/6 = 100; mean_g = 60*(0+..+3)/4 = 90
    assert(feats(3) === 100.0f, "mean_r over the x-gradient")
    assert(feats(4) === 90.0f, "mean_g over the y-gradient")
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    assert((back.getRGB(3, 2) & 0xffffff) === ((120 << 16) | (120 << 8) | 5))
  }

  test("a corrupt payload fails the decode loudly, not silently") {
    val junk = Array.tabulate[Byte](64)(_.toByte)
    val e = intercept[IllegalArgumentException] {
      Multimodal.imageBatchKernel(Seq(junk))
    }
    assert(e.getMessage.contains("not a decodable image"))
  }

  test("real wav decode recovers format, peak, volume, and zero crossings exactly") {
    // id = 5: n = 69 samples, half-period 7, amp 1050 → peak 1050,
    // sum|x| = 69·1050, sign flips at i = 7, 14, …, 63 → 9 — all integers,
    // hand-derived from the synthesis formula (PCM/WAV is lossless)
    val feats = Multimodal.audioBatchKernel(Seq(Multimodal.syntheticWav(5L))).head
    assert(feats(0) === 69.0f, "n_samples")
    assert(feats(1) === 8000.0f, "sample_rate")
    assert(feats(2) === 1.0f, "channels")
    assert(feats(3) === 1050.0f, "peak")
    assert(feats(4) === (69 * 1050).toFloat, "sum_abs")
    assert(feats(5) === 9.0f, "sign flips")
    // query-level: every asset decodes and matches the formula
    val rows = Multimodal.audioDecodeQuery(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[Int]("n_samples") === (64 + id % 33).toInt, s"asset $id")
      assert(r.getAs[Int]("peak") === (1000 + (id % 100) * 10).toInt, s"asset $id")
      assert(r.getAs[Long]("sum_abs") ===
        (64 + id % 33) * (1000 + (id % 100) * 10), s"asset $id")
    }
  }

  test("frame sampling slices the payload into n fixed-size frames") {
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf), frameBytes = 16, nFrames = 3)
      .select("frames").head().getSeq[Array[Byte]](0)
    assert(frames.size === 3)
    assert(frames.head.length === 16)
  }
}
