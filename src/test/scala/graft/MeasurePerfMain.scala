package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch perf harness (test scope): times bench-head queries under
  * candidate configurations on the sf0.1 corpus, warmed like Bench.
  * Round-13 instance: A/B/C the bigram-LM pairing strategies at ×1 and —
  * when the SfTrendMain scratch corpus is present — ×50:
  *   A) per-doc window + lag(1) over posexplode (the pre-round-13 path:
  *      shuffles and sorts EVERY token by doc_id),
  *   B) in-row higher-order transform over the filtered token array
  *      (narrow, but ArrayFilter/ArrayTransform are interpreted lambdas),
  *   C) arrays_zip(slice, slice) pairing (narrow AND lambda-free on the
  *      pairing; the empty-token filter lambda remains). */
object MeasurePerfMain {

  private def score(big: DataFrame, toks: DataFrame): DataFrame = {
    val c12 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
    val uni = toks.groupBy(col("tok").as("w2")).agg(count(lit(1)).as("c2"))
    val tot = toks.agg(count(lit(1)).as("n_total"))
    big.join(c12, Seq("w1", "w2")).join(c1, Seq("w1")).join(uni, Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("ppm",
        expr("((7 * c12 * 1000000) DIV (10 * c1)) + ((3 * c2 * 1000000) DIV (10 * n_total))"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("ppm")).as("sum_ppm"))
      .withColumn("mean_ppm", expr("sum_ppm DIV n_bigrams"))
  }

  private def variantA(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val big = toks
      .select(col("doc_id"), lag(col("tok"), 1).over(w).as("w1"), col("tok").as("w2"))
      .filter(col("w1").isNotNull)
    score(big, toks.drop("pos"))
  }

  private def variantB(docs: DataFrame): DataFrame = {
    val withArr = docs.select(col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("a"))
    val toks = withArr.select(col("doc_id"), explode(col("a")).as("tok"))
    val big = withArr.filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(a) - 1), i -> struct(a[i-1] AS w1, a[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"))
    score(big, toks)
  }

  private def variantC(docs: DataFrame): DataFrame = {
    val withArr = docs.select(col("doc_id"),
      expr("filter(split(lower(text), '\\\\s+'), t -> t != '')").as("a"))
    val toks = withArr.select(col("doc_id"), explode(col("a")).as("tok"))
    val big = withArr.filter(size(col("a")) >= 2)
      .select(col("doc_id"), explode(expr(
        "arrays_zip(slice(a, 1, size(a) - 1), slice(a, 2, size(a) - 1))")).as("b"))
      .select(col("doc_id"), col("b.0").as("w1"), col("b.1").as("w2"))
    score(big, toks)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(what: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); body
      println(f"[perf] $what ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val dirs = Seq("x1" -> "/root/testdata/sf0.1") ++
      (if (new java.io.File("/tmp/graft-sftrend/x50/_done").exists())
         Seq("x50" -> "/tmp/graft-sftrend/x50") else Nil)
    for ((tag, d) <- dirs) {
      val docs = Tables.documents(spark, d)
      // warm the scan path once
      docs.write.format("noop").mode("overwrite").save()
      for (rep <- 1 to 2) {
        time(s"$tag A(window-lag) rep$rep")(
          variantA(docs).write.format("noop").mode("overwrite").save())
        time(s"$tag B(transform)  rep$rep")(
          variantB(docs).write.format("noop").mode("overwrite").save())
        time(s"$tag C(zip-slice)  rep$rep")(
          variantC(docs).write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
