package graft

import graft.functions.{SketchFunctions, TextFunctions, VectorFunctions}
import graft.fuzz.SqlFuzzer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Codegen-vs-interpreted differential — a bug class none of the four
  * fuzzer legs can see. Every custom Catalyst expression ships TWO
  * implementations of its semantics: `nullSafeEval` (interpreted) and
  * `doGenCode` (janino-compiled), and Spark silently picks per query shape;
  * a divergence between them is invisible to any oracle that only ever
  * exercises one path (the DuckDB compares, the brute-force oracles, and
  * the curated gates all run under default codegen). This spec runs the
  * SAME frames on two child sessions — default, and interpreted
  * (`wholeStage=false` + `factoryMode=NO_CODEGEN`, which routes expression
  * evaluation through the interpreted projections) — and requires
  * multiset-identical results over:
  *
  *   1. every custom expression (SimHash64, PolyHash, MarkerCounts,
  *      VecDot, VecNorm, RpSignatures, CmsEstimate) applied to real
  *      corpus text/embedding data, and
  *   2. 30 seeded SqlFuzzer plans (Spark's own builtin expression surface
  *      under the fuzz grammar — guards the same property upstream).
  *
  * A mode-probe control pins non-vacuity: the interpreted session's plan
  * for a projection must contain NO WholeStageCodegen node while the
  * default session's does — otherwise both sides silently ran the same
  * path and agreement means nothing.
  */
class CodegenDifferentialSpec extends SparkSpec {

  private def sessionPair(): (SparkSession, SparkSession) = {
    val gen = spark.newSession()
    gen.conf.set("spark.sql.shuffle.partitions", "4")
    val interp = spark.newSession()
    interp.conf.set("spark.sql.shuffle.partitions", "4")
    interp.conf.set("spark.sql.codegen.wholeStage", "false")
    interp.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    (gen, interp)
  }

  private def multiset(df: DataFrame): Map[Seq[Any], Int] =
    df.collect().toSeq.map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap

  private def assertAgree(name: String, build: SparkSession => DataFrame): Unit = {
    val (gen, interp) = sessionPair()
    val (a, b) = (multiset(build(gen)), multiset(build(interp)))
    assert(a.values.sum > 0, s"$name: empty result — vacuous compare")
    assert(a == b, s"$name: codegen and interpreted paths disagree — " +
      s"extra=${(a.keySet -- b.keySet).take(3)} missing=${(b.keySet -- a.keySet).take(3)}")
  }

  test("MODE PROBE: the interpreted session actually runs without codegen") {
    val (gen, interp) = sessionPair()
    // WholeStageCodegenExec renders as a `*(N)` stage prefix in the plan
    // string (not its class name)
    val stage = """\*\(\d+\)""".r
    def planOf(s: SparkSession) =
      s.range(10).select(col("id") * 2).queryExecution.executedPlan.toString
    assert(stage.findFirstIn(planOf(gen)).isDefined,
      "default session plans no WholeStageCodegen stage — the control is broken")
    assert(stage.findFirstIn(planOf(interp)).isEmpty,
      "interpreted session still plans a codegen stage — both sides ran the same path")
  }

  test("custom text expressions agree across codegen and interpreted paths") {
    assertAgree("simhash64/polyhash/markercounts", { s =>
      Tables.table(s, sf, "documents")
        .limit(400)
        .select(col("doc_id"),
          TextFunctions.simhash64(split(lower(col("text")), " ")).as("sh"),
          TextFunctions.polyHash(col("text")).as("ph"),
          TextFunctions.markerCounts(col("text")).as("mc"))
    })
  }

  test("custom vector expressions agree across codegen and interpreted paths") {
    assertAgree("vecdot/vecnorm/rpsignatures", { s =>
      Tables.table(s, sf, "embeddings")
        .limit(400)
        .select(col("vec_id"),
          VectorFunctions.vecDot(col("embedding"), col("embedding")).as("dd"),
          VectorFunctions.vecNorm(col("embedding")).as("nn"),
          VectorFunctions.rpSignatures(col("embedding"), 2, 8).as("sig"))
    })
  }

  test("cms build+probe agrees across codegen and interpreted paths") {
    assertAgree("cms_estimate", { s =>
      val sketch = Tables.events(s, sf)
        .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sk"))
      Tables.events(s, sf).select(col("event_type")).distinct()
        .crossJoin(broadcast(sketch))
        .select(col("event_type"),
          SketchFunctions.cmsEstimate(col("sk"), col("event_type")).as("est"))
    })
  }

  test("30 seeded fuzz plans agree across codegen and interpreted paths") {
    val (gen, interp) = sessionPair()
    Seq(gen, interp).foreach { s =>
      SqlFuzzer.tables.foreach { t =>
        (if (t.name == "events") Tables.events(s, sf)
         else Tables.table(s, sf, t.name)).createOrReplaceTempView(t.name)
      }
    }
    SqlFuzzer.plans(77077077L, 30).foreach { case (name, sql) =>
      val a = multiset(gen.sql(sql))
      val b = multiset(interp.sql(sql))
      assert(a == b, s"$name: codegen and interpreted paths disagree: $sql")
    }
  }
}
