package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ExtractBalancedJson

/** The native balanced-JSON expression: depth counting, string-literal
  * awareness, null coercion, and the SQL registration path.
  */
class ExtractBalancedJsonSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  import spark.implicits._

  private def ex(html: String, marker: String): Option[String] = {
    val r = Seq(html).toDF("h")
      .select(ExtractBalancedJson(spark, col("h"), lit(marker)).as("j"))
      .head()
    if (r.isNullAt(0)) None else Some(r.getString(0))
  }

  test("extracts a deeply nested block (scrape.ts:352-397 semantics)") {
    val json = """{"a":{"b":{"c":{"d":{"e":1}}}},"z":[{"k":2}]}"""
    assert(ex(s"prefix cfg = $json suffix", "cfg =") === Some(json))
  }

  test("braces inside string literals do not affect depth") {
    val json = """{"s":"}{}{","t":"\"{"}"""
    assert(ex(s"m = $json;", "m =") === Some(json))
  }

  test("null on missing marker / missing block / unbalanced input") {
    assert(ex("no marker here", "cfg =") === None)
    assert(ex("cfg = nothing", "cfg =") === None)
    assert(ex("""cfg = {"a": {"b": 1}""", "cfg =") === None)
  }

  test("picks the block after the marker, not the first on the page") {
    val html = """one = {"first":1}; two = {"second":2};"""
    assert(ex(html, "two =") === Some("""{"second":2}"""))
  }

  test("SQL-registered and codegen-compatible") {
    ExtractBalancedJson.register(spark)
    Seq("""x = {"k":[1,2,{"n":3}]}""").toDF("h").createOrReplaceTempView("ebj_t")
    val out = spark.sql(
      "SELECT extract_balanced_json(h, 'x =') AS j FROM ebj_t").head().getString(0)
    assert(out === """{"k":[1,2,{"n":3}]}""")
  }
}
