package graft

import org.apache.spark.sql.types._

/** Fixed, explicit schemas — never `inferSchema` (SURVEY.md §1.4).
  *
  * The review schema is the union of keys across all 25 records of the
  * reference's captured API response (/root/reference/sample.json:4-56 for
  * record 1; ragged fields like hotelier_response_date appear only in later
  * records, e.g. sample.json:76). Determinism of the fixed StructType is what
  * makes the DuckDB-oracle hash comparison stable, and at 100 TB scale it
  * avoids the extra full pass schema inference would cost.
  */
object Schemas {

  // sample.json:31-38
  val photoSchema: StructType = StructType(Seq(
    StructField("photo_id", LongType),
    StructField("ratio", DoubleType),
    StructField("url_original", StringType),
    StructField("url_max300", StringType),
    StructField("url_square60", StringType),
    StructField("url_640x200", StringType)))

  // sample.json:5-15 (optional avatar at sample.json:177)
  val authorSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("type_string", StringType),
    StructField("age_group", StringType),
    StructField("countrycode", StringType),
    StructField("city", StringType),
    StructField("name", StringType),
    StructField("avatar", StringType),
    StructField("helpful_vote_count", IntegerType),
    StructField("user_id", LongType),
    StructField("nr_reviews", IntegerType)))

  // sample.json:29-43
  val stayedRoomInfoSchema: StructType = StructType(Seq(
    StructField("room_id", LongType),
    StructField("room_name", StringType),
    StructField("checkin", StringType),
    StructField("checkout", StringType),
    StructField("num_nights", IntegerType),
    StructField("photo", photoSchema)))

  // sample.json:335-354
  val reviewerPhotoSchema: StructType = StructType(Seq(
    StructField("square90", StringType),
    StructField("max1280x900", StringType),
    StructField("max500_ao", StringType),
    StructField("square60_ao", StringType)))

  val reviewSchema: StructType = StructType(Seq(
    StructField("review_id", LongType),               // sample.json:22
    StructField("review_hash", StringType),           // sample.json:21
    StructField("hotel_id", LongType),                // sample.json:24
    StructField("hotelier_name", StringType),
    StructField("date", StringType),                  // "yyyy-MM-dd HH:mm:ss"
    StructField("title", StringType),
    StructField("title_translated", StringType),
    StructField("pros", StringType),
    StructField("pros_translated", StringType),
    StructField("cons", StringType),
    StructField("cons_translated", StringType),
    StructField("average_score", DoubleType),         // sample.json:169
    StructField("travel_purpose", StringType),
    StructField("languagecode", StringType),
    StructField("countrycode", StringType),
    StructField("helpful_vote_count", IntegerType),
    StructField("reviewng", IntegerType),
    StructField("is_trivial", IntegerType),
    StructField("is_moderated", IntegerType),
    StructField("is_incentivised", IntegerType),
    StructField("anonymous", StringType),
    StructField("hotelier_response", StringType),
    StructField("hotelier_response_date", LongType),  // epoch secs, ragged (sample.json:76)
    StructField("author", authorSchema),
    StructField("stayed_room_info", stayedRoomInfoSchema),
    StructField("tags", ArrayType(StringType)),
    StructField("user_new_badges", ArrayType(StringType)),
    StructField("reviewer_photos", ArrayType(reviewerPhotoSchema))))

  // {count, result[], sort_options[]} — sample.json:2-3,1380
  val envelopeSchema: StructType = StructType(Seq(
    StructField("count", LongType),
    StructField("result", ArrayType(reviewSchema)),
    StructField("sort_options", ArrayType(StringType))))

  // SourceTable — reference FunctionApp2/process_data/__init__.py:41,102
  val sourceTableSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text_column", StringType),
    StructField("processed", IntegerType)))

  // SentimentResults — reference FunctionApp2/process_data/__init__.py:88-95
  val sentimentResultsSchema: StructType = StructType(Seq(
    StructField("record_id", StringType),
    StructField("sentiment", StringType),
    StructField("confidence", DoubleType)))
}
