package graft

import graft.sources.ReviewIngest
import org.apache.spark.sql.functions._

/** The reference's ingest-side query (P3/P4/P5 + O1/O2) on the golden
  * fixture. */
class PageQuerySpec extends SparkSpec {
  private lazy val reviews = ReviewIngest.ingest(spark, "/root/reference/sample.json")

  test("page query applies all three predicate classes") {
    val page = ReviewIngest.pageQuery(reviews).collect()
    assert(page.nonEmpty, "golden fixture should contain matching reviews")
    assert(page.forall(r => Seq("en-gb", "de", "fr").contains(r.getAs[String]("languagecode"))))
    assert(page.forall(r =>
      Seq("solo_traveller", "review_category_group_of_friends").contains(r.getAs[String]("author_type"))))
  }

  test("relevance order: helpful votes desc, recency desc") {
    val page = ReviewIngest.pageQuery(reviews).collect()
    val votes = page.map(_.getAs[Int]("helpful_vote_count"))
    assert(votes.sameElements(votes.sortBy(v => -v)), "not sorted by helpful votes desc")
  }

  test("page size caps the result (O2)") {
    assert(ReviewIngest.pageQuery(reviews, pageSize = 2).count() === 2L ||
      ReviewIngest.pageQuery(reviews).count() <= 25L)
  }
}
