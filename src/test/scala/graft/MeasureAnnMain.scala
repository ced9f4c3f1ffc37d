package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch calibration main (test scope): prints the raw probe-quality
  * aggregates the q_ann_* bound thresholds are pinned against. */
object MeasureAnnMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, d)
      val q = emb.filter(col("vec_id") < 10)
      val brute = operators.Similarity.bruteForceTopK(q, emb, 5)
      val (assigned, centroids) = operators.IvfIndex.index(spark, d)
      val ivf = operators.IvfIndex.ivfTopK(q, assigned, centroids, 5)
      val q8 = operators.IvfIndex.ivfTopKQuantized(q, assigned, centroids, 5)
      val lsh = operators.Similarity.lshTopK(q, emb, 5)
      val (cb, codes) = operators.IvfIndex.pqIndex(spark, d)
      val pq = operators.IvfIndex.ivfTopKPq(q, assigned, centroids, cb, codes, 5)
      // PQ operating-point sweep: the shipped default (8,10) prints as
      // `pq`; the rejected (6,6) point and the neighbors bracket it — the
      // q_ann_ivf_pq bound is pinned against the worst SF of the shipped
      // point (0.70 at sf0.01 → minRecall 0.6).
      val pqSweep = Seq((6, 6), (8, 8), (10, 10)).map { case (np, rr) =>
        s"pq_np${np}_rr$rr" -> operators.IvfIndex.ivfTopKPq(q, assigned, centroids, cb, codes, 5, nProbe = np, rerank = rr)
      }
      for ((name, probe) <- Seq("ivf" -> ivf, "q8" -> q8, "lsh" -> lsh, "pq" -> pq) ++ pqSweep) {
        val r = operators.Similarity.probeQualityMeasured(brute, probe).head()
        println(f"$sf $name recall=${r.getDouble(0)}%.3f returned=${r.getDouble(1)}%.3f max_regret=${r.getDouble(2)}%.5f")
      }
    }
    spark.stop()
  }
}
