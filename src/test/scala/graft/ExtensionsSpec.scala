package graft

/** GraftExtensions: the native expressions are reachable from plain SQL
  * (installed into the live shared session; the `spark.sql.extensions`
  * config path runs the same registry at session construction). */
class ExtensionsSpec extends SparkSpec {

  test("vec_dot / vec_norm / simhash64 / poly_hash work from SQL") {
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT
        |vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |vec_norm(array(3.0D, 4.0D)) AS n,
        |simhash64(array('a', 'b')) AS sh,
        |poly_hash('abc') AS ph""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(row.getDouble(1) === 5.0)
    assert(row.getLong(3) === ((('a' * 257L + 'b') % 1000000007L * 257L + 'c') % 1000000007L))
  }

  test("simhash64 generates a direct compute call, not interpreted-eval fallback") {
    // the signature projection sits in the production simhash dedup scan:
    // a CodegenFallback there emits `references[i].eval(row)` — boxed
    // interpreted execution inside the span. The upgraded expression must
    // emit a typed call into SimHash64.compute instead.
    import org.apache.spark.sql.functions.{col, lower, split}
    val df = Tables.documents(spark, sf).limit(5)
      .select(graft.functions.TextFunctions.simhash64(
        split(lower(col("text")), "\\s+")).as("sh"))
    val code = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    assert(code.contains("graft.functions.SimHash64"),
      "generated code must reference the typed expression object")
    assert(code.contains(".compute("),
      "generated code must call compute directly (no eval fallback)")
  }

  test("rp_signatures from SQL returns `tables` signatures of `bits` bits") {
    GraftExtensions.install(spark)
    val sigs = spark.sql(
      "SELECT rp_signatures(array(CAST(0.5 AS FLOAT), CAST(-0.2 AS FLOAT)), 4, 8) AS s")
      .head().getSeq[Long](0)
    assert(sigs.size === 4)
    assert(sigs.forall(v => v >= 0 && v < 256))
  }

  test("SQL vec_dot agrees with the DataFrame wrapper on real embeddings") {
    GraftExtensions.install(spark)
    Tables.embeddings(spark, sf).limit(10).createOrReplaceTempView("emb_ext_test")
    val viaSql = spark.sql(
      "SELECT vec_id, vec_dot(embedding, embedding) AS d FROM emb_ext_test")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaDf = Tables.embeddings(spark, sf).limit(10)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        graft.functions.VectorFunctions.vecDot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaDf)
  }
}
