package graft.sources

import graft.Schemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Review-JSON ingest: the Spark-native replacement for the reference's
  * timer-triggered REST fetch + blob landing + ADF copy
  * (reference FunctionApp1/hotel_reviews/__init__.py:35-38 and the ADF
  * instance at applications/applications.tf:80-88).
  *
  * Semantics implemented here (SURVEY.md §2.1/§2.3):
  *  - S1: schema-applied JSON source — `read.schema(envelope).json(path)`,
  *    PERMISSIVE with a retained corrupt-record audit column, mirroring the
  *    reference's log-and-continue posture (__init__.py:39-40).
  *  - S3: envelope decode — `explode($"result")` flattens
  *    `{count, result[], sort_options[]}` (sample.json:2-3) to one row per
  *    review.
  *  - T8: `'' -> null` normalization (the API emits `anonymous: ""`,
  *    `age_group: ""`, sample.json:17,10) plus explicit timestamp/date
  *    parsing: `date` "yyyy-MM-dd HH:mm:ss" strings, checkin/checkout
  *    "yyyy-MM-dd" dates, `hotelier_response_date` epoch seconds
  *    (sample.json:26,39-41,76). All UTC.
  *
  * Scale posture: the whole pipeline is narrow (scan → generate → project) —
  * no shuffle; at 100 TB the landing layout partitions by
  * `hotel_id`/`ingest_date` (S4) so downstream per-hotel queries prune files.
  */
object ReviewIngest {

  /** '' → null for a string column (SURVEY.md §1.2 "empty-string-as-null"). */
  def emptyToNull(c: Column): Column = when(c === lit(""), lit(null.asInstanceOf[String])).otherwise(c)

  /** Raw envelope scan with the fixed schema; corrupt rows retained in
    * `_corrupt_record` rather than dropped. */
  def readEnvelope(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(Schemas.envelopeSchema.add("_corrupt_record", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("multiLine", value = true) // sample.json is one pretty-printed doc
      .json(path)

  /** Envelope → one row per review (S3), raw fields untouched. */
  def explodeReviews(envelope: DataFrame): DataFrame =
    envelope
      .filter(col("result").isNotNull)
      .select(explode(col("result")).as("r"))
      .select("r.*")

  private val emptyableTopLevel =
    Seq("anonymous", "title_translated", "pros_translated", "cons_translated",
      "hotelier_response", "hotelier_name", "travel_purpose", "countrycode")
  private val emptyableAuthor = Seq("age_group", "city", "avatar", "name")

  /** Bronze → normalized: '' → null everywhere the API emits empty strings,
    * plus typed time columns. Keeps original raw string columns intact so the
    * bronze layer stays replayable. */
  def normalize(reviews: DataFrame): DataFrame = {
    val withTop = emptyableTopLevel.foldLeft(reviews) { (df, c) =>
      df.withColumn(c, emptyToNull(col(c)))
    }
    val authorFixed = withTop.withColumn(
      "author",
      struct(
        Schemas.authorSchema.fieldNames.toSeq.map { f =>
          val c = col(s"author.$f")
          (if (emptyableAuthor.contains(f)) emptyToNull(c) else c).as(f)
        }: _*))
    authorFixed
      .withColumn("review_ts", to_timestamp(col("date"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("checkin_date", to_date(col("stayed_room_info.checkin"), "yyyy-MM-dd"))
      .withColumn("checkout_date", to_date(col("stayed_room_info.checkout"), "yyyy-MM-dd"))
      .withColumn("hotelier_response_ts", timestamp_seconds(col("hotelier_response_date")))
  }

  /** Full ingest: path → normalized per-review rows. */
  def ingest(spark: SparkSession, path: String): DataFrame =
    normalize(explodeReviews(readEnvelope(spark, path)))

  /** §2.7: merge review pages whose records have ragged key sets —
    * `unionByName(allowMissingColumns = true)` fills absent columns with
    * null instead of failing or positionally mis-binding like `union`. */
  def mergePages(pages: Seq[DataFrame]): DataFrame =
    pages.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))

  /** S4: partitioned bronze landing — append-only parquet partitioned by
    * hotel_id so a 1000-executor scan of one hotel prunes everything else. */
  def writeBronze(reviews: DataFrame, outDir: String): Unit =
    reviews.write.mode("append").partitionBy("hotel_id").parquet(outDir)

  /** The reference's full ingest-side query semantics in one expression
    * (FunctionApp1/hotel_reviews/__init__.py:19-26): language IN-list (P3),
    * customer-type IN-list on the nested author field (P4), hotel-id
    * equality (P5), relevance sort (O1 — engine-defined as helpful votes
    * desc, recency desc, id tiebreak), page-0 limit (O2). The reference
    * ships these as REST query params evaluated by the API; here they're
    * Catalyst predicates over the landed data. */
  def pageQuery(reviews: DataFrame,
                hotelId: Long = 1676161L,
                languages: Seq[String] = Seq("en-gb", "de", "fr"),
                customerTypes: Seq[String] = Seq("solo_traveller", "review_category_group_of_friends"),
                pageSize: Int = 25): DataFrame =
    reviews
      .filter(col("hotel_id") === hotelId)
      .filter(col("languagecode").isin(languages: _*))
      .filter(col("author.type").isin(customerTypes: _*))
      .orderBy(col("helpful_vote_count").desc, col("review_ts").desc, col("review_id").asc)
      .limit(pageSize)
      .select(col("review_id"), col("languagecode"), col("author.type").as("author_type"),
        col("helpful_vote_count"), col("review_ts"))

  /** S7 (ADF-copy replacement): reviews → silver SourceTable
    * (reference schema evidence FunctionApp2/process_data/__init__.py:41).
    * `concat_ws` skips nulls, matching the "". "-join of available text. */
  def toSilver(reviews: DataFrame): DataFrame =
    reviews.select(
      col("review_id").as("id"),
      concat_ws(". ", col("title"), col("pros"), col("cons")).as("text_column"),
      lit(0).as("processed"))
}
