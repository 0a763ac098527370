package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Dual surface: every canonical table registers as a temp view, so the
  * whole engine is reachable from Spark SQL — the spec proves a SQL
  * re-statement of a catalog query returns the DataFrame API's result.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("registerAll exposes the tables to spark.sql with identical results") {
    Tables.registerAll(spark, SparkT.Sf0001)
    val sql = spark.sql("""
      SELECT p_brand, count(*) AS n FROM part
      GROUP BY p_brand ORDER BY n DESC, p_brand LIMIT 5""").collect()
    val api = Relational.brandValueCounts(spark, SparkT.Sf0001).collect()
    assert(sql.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      api.map(r => (r.getString(0), r.getLong(1))).toSeq)
    // the custom expressions are SQL-callable on the same session
    graft.functions.ExtractBalancedJson.register(spark)
    val j = spark.sql(
      """SELECT extract_balanced_json('cfg = {"a":{"b":2}} rest', 'cfg =') AS x""")
      .head().getString(0)
    assert(j === """{"a":{"b":2}}""")
    graft.functions.VectorDot.register(spark)
    assert(spark.sql("SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) === 11.0)
    graft.functions.JsonMatrixWalk.register(spark)
    val walked = spark.sql(
      """SELECT size(json_matrix_walk(
        |  '{"matrix": [{"characteristic": {"id": "L", "title": "size"}, "productCode": "P"}]}')) AS n"""
        .stripMargin).head().getInt(0)
    assert(walked === 1)
  }

  test("registered text/LSH combinators match the DataFrame pipeline values") {
    Tables.registerAll(spark, SparkT.Sf0001)
    graft.functions.TextSql.registerAll(spark)
    // shingles: 5 words -> 3 trigram shingles
    val sh = spark.sql(
      "SELECT graft_shingles(split('a b c d e', ' ')) AS sh").head()
      .getSeq[String](0)
    assert(sh === Seq("a b c", "b c d", "c d e"))
    // per-row simhash ≡ the aggregation-form fingerprint, whole corpus
    val agg = graft.operators.TextOps.simhash(spark, SparkT.Sf0001)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = spark.sql("""
        SELECT doc_id, graft_simhash(split(text, ' ')) AS simhash
        FROM documents WHERE size(split(text, ' ')) >= 1""").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(agg.forall { case (id, fp) => perRow.get(id).contains(fp) },
      "per-row graft_simhash must equal the aggregation-form fingerprint")
    // quality score + bow hash agree with the Scala combinators
    val sqlQ = spark.sql("""
        SELECT doc_id, graft_quality_score(text) AS q, graft_bow_hash(text) AS h
        FROM documents ORDER BY doc_id LIMIT 20""").collect()
    val apiQ = spark.sql("SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 20")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.operators.TextOps.qualityScoreOf(
          org.apache.spark.sql.functions.col("text")).as("q"),
        graft.operators.TextOps.bowHashOf(
          org.apache.spark.sql.functions.col("text")).as("h"))
      .collect()
    assert(sqlQ.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ===
      apiQ.map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq)
    // the full SQL-text near-dup pipeline is hash-equal to the DataFrame form
    val sqlPairs = graft.operators.TextOps.minhashNearDupSql(spark, SparkT.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val apiPairs = graft.operators.TextOps.minhashNearDup(spark, SparkT.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(sqlPairs.toSeq === apiPairs.toSeq)
  }
}
