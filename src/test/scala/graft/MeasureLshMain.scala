package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch calibration main (test scope): slice recalls of the LSH dedup
  * paths against their bounded exact baselines, for pinning the promotion
  * flag thresholds. */
object MeasureLshMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      // cosine LSH vs exact slice (vec_id < 500)
      val exactCos = operators.Similarity.cosineNearDups(spark, d)
        .select("vec_a", "vec_b")
      val lshCos = operators.Similarity.cosineNearDupsBucketed(spark, d)
        .filter(col("vec_a") < 500 && col("vec_b") < 500)
        .select("vec_a", "vec_b")
      val nT = exactCos.count(); val nH = exactCos.join(lshCos, Seq("vec_a", "vec_b")).count()
      println(f"$sf cosine slice: true=$nT hit=$nH recall=${if (nT > 0) nH.toDouble / nT else 1.0}%.3f")
      // minhash banding pairs (threshold 0.2) vs exact jaccard slice (doc_id < 300)
      val exactJac = operators.Dedup.ngramJaccardPairs(spark, d, maxDocId = 300, threshold = 0.2)
        .select(col("doc_a"), col("doc_b"))
      val mh = operators.Dedup.nearDupPairs(spark, d, 0.2)
        .filter(col("doc_a") < 300 && col("doc_b") < 300)
        .select("doc_a", "doc_b")
      val jT = exactJac.count(); val jH = exactJac.join(mh, Seq("doc_a", "doc_b")).count()
      println(f"$sf minhash slice: true=$jT hit=$jH recall=${if (jT > 0) jH.toDouble / jT else 1.0}%.3f")
      // simhash / ml-path recall vs the 3-shingle high-jaccard slice truth
      // (the minhashCandidateRecall truth set, doc_id < 500, J >= 0.5)
      val sh = operators.Dedup.shingles(Tables.documents(spark, d).filter(col("doc_id") < 500))
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val truth = sh.select(col("shingle"), col("doc_id").as("doc_a"))
        .join(sh.select(col("shingle"), col("doc_id").as("doc_b")), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), Seq("doc_a"))
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), Seq("doc_b"))
        .withColumn("j", col("n_common") / (col("sz_a") + col("sz_b") - col("n_common")))
        .filter(col("j") >= 0.5).select("doc_a", "doc_b")
      val tN = truth.count()
      for ((nm, pairs) <- Seq(
          "simhash8" -> operators.Dedup.simhashNearDups(spark, d, 8).select("doc_a", "doc_b"),
          "ml" -> operators.Dedup.mlNearDupPairs(spark, d).select("doc_a", "doc_b"),
          "prod-minhash" -> operators.Dedup.nearDupPairs(spark, d, 0.2).select("doc_a", "doc_b"))) {
        val h = truth.join(pairs.filter(col("doc_a") < 500 && col("doc_b") < 500), Seq("doc_a", "doc_b")).count()
        println(f"$sf $nm vs J>=0.5 slice: true=$tN hit=$h recall=${if (tN > 0) h.toDouble / tN else 1.0}%.3f")
      }
    }
    spark.stop()
  }
}
