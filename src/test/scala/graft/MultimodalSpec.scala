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

  test("frame sampling slices the payload into n fixed-size frames") {
    val frames = Multimodal.sampleFrames(Multimodal.assets(spark, sf), frameBytes = 16, nFrames = 3)
      .select("frames").head().getSeq[Array[Byte]](0)
    assert(frames.size === 3)
    assert(frames.head.length === 16)
  }
}
