package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorDot

/** The native dot-product expression must be bit-identical to the
  * zip_with+aggregate fold it replaced — the ANN oracles depend on it.
  */
class VectorDotSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  test("vector_dot == sequential fold, bit for bit, over real embeddings") {
    val e = Tables.load(spark, SparkT.Sf0001, "embeddings").limit(50)
    val q = e.filter(col("vec_id") < 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val fold = aggregate(
      zip_with(col("q_emb"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val rows = e.crossJoin(broadcast(q))
      .select(fold.as("via_fold"),
        VectorDot(spark, col("q_emb"), col("embedding")).as("via_expr"))
      .collect()
    assert(rows.length === 100)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double arrays and null elements") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0, 4.0))).toDF("a", "b")
    assert(df.select(VectorDot(spark, col("a"), col("b"))).head().getDouble(0) === 11.0)
    val withNull = Seq((Seq(Some(1.0f), None), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(withNull.select(VectorDot(spark, col("a"), col("b"))).head().isNullAt(0))
  }

  test("SQL-callable") {
    VectorDot.register(spark)
    val r = spark.sql("SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }
}
