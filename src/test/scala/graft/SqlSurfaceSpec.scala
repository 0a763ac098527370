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
}
