package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.F

/** Unit + property tests for the scalar-function catalog. Column
  * expressions are evaluated through a real (tiny) DataFrame so the
  * tests cover the actual Catalyst path, not a Scala re-derivation.
  * Property cases are generated with a fixed seed (deterministic runs)
  * and evaluated in ONE DataFrame pass per property, not one job per
  * case.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  import spark.implicits._

  private def evalFee(price: Double, kg: Double): Long =
    Seq((price, kg)).toDF("p", "kg")
      .select(F.deliveryFee(col("p"), col("kg")).as("f"))
      .head().getLong(0)

  test("deliveryFee tier boundaries (etl_sales.py:28-33)") {
    assert(evalFee(4999, 1) === 999)
    assert(evalFee(5000, 1) === 799)
    assert(evalFee(9999, 1) === 799)
    assert(evalFee(10000, 1) === 699)
    assert(evalFee(14999, 1) === 699)
    assert(evalFee(15000, 1) === 0)
  }

  test("deliveryFee per-kg surcharge after 3 kg") {
    assert(evalFee(15000, 3.0) === 0)
    assert(evalFee(15000, 3.1) === 399) // ceil(3.1)=4 -> 1 extra kg
    assert(evalFee(4999, 5.0) === 999 + 2 * 399)
  }

  test("roundHalfUp is pure-IEEE: rounds the BINARY value, half up") {
    val r = Seq(66894.5471875, 2.5, -0.25)
      .toDF("x").select(F.roundHalfUp(col("x"), 6).as("r6"),
        F.roundHalfUp(col("x"), 0).as("r0"))
      .collect()
    // the literal 66894.5471875 stores as 66894.54718749999... so the
    // true value sits BELOW the boundary and rounds down — in every
    // IEEE engine identically (Spark's decimal-string round() says
    // ...188 here while DuckDB says ...187; that divergence is exactly
    // what this formula exists to eliminate)
    assert(r(0).getDouble(0) === 66894.547187)
    assert(r(1).getDouble(1) === 3.0)  // exact 2.5 -> 3 (half-up, like TS Math.round)
    assert(r(2).getDouble(1) === 0.0)
  }

  test("targetPrice: clamp, chase, hysteresis (PRICEBOT_SPEC_V2.md:96-98)") {
    def tp(cur: Double, comp: java.lang.Double, mn: Double, mx: Double, step: Double): Double =
      Seq((cur, Option(comp).map(_.toDouble), mn, mx, step)).toDF("c", "lc", "mn", "mx", "st")
        .select(F.targetPrice(col("c"), col("lc"), col("mn"), col("mx"), col("st")).as("t"))
        .head().getDouble(0)
    assert(tp(100, null, 80, 120, 5) === 100)   // no comp, within clamp
    assert(tp(200, null, 80, 120, 5) === 120)   // no comp, clamped down
    assert(tp(100, 90.0, 80, 120, 5) === 85)    // chase comp - step
    assert(tp(100, 10.0, 80, 120, 5) === 80)    // floor clamp
    assert(tp(100, 103.0, 80, 120, 5) === 100)  // |98-100|<=5 -> hysteresis hold
  }

  test("targetPrice stays within [min,max] whenever it moves (property)") {
    val rnd = new scala.util.Random(42)
    val cases = Seq.fill(200)((
      1 + rnd.nextDouble() * 999, 1 + rnd.nextDouble() * 999,
      1 + rnd.nextDouble() * 499, 501 + rnd.nextDouble() * 499,
      rnd.nextDouble() * 50))
    val rows = cases.toDF("c", "lc", "mn", "mx", "st")
      .select(col("c"), col("mn"), col("mx"),
        F.targetPrice(col("c"), col("lc"), col("mn"), col("mx"), col("st")).as("t"))
      .collect()
    rows.foreach { r =>
      val (c, mn, mx, t) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(t == c || (t >= mn && t <= mx), s"t=$t c=$c mn=$mn mx=$mx")
    }
  }

  test("stddevPopFromSums >= 0 and matches a direct computation (property)") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val xs = Seq.fill(1 + rnd.nextInt(50))(rnd.nextDouble() * 10000)
      val sd = xs.toDF("x").agg(
          sum(F.dec(col("x"))).as("s"),
          sum(F.dec(col("x") * col("x"))).as("s2"),
          count(lit(1)).as("n"))
        .select(F.stddevPopFromSums(col("s"), col("s2"), col("n"))).head().getDouble(0)
      val m = xs.sum / xs.size
      val direct = math.sqrt(math.max(0, xs.map(x => x * x).sum / xs.size - m * m))
      assert(sd >= 0.0)
      assert(math.abs(sd - direct) < 1e-3, s"sd=$sd direct=$direct n=${xs.size}")
    }
  }

  test("cleaners coerce dirty text (enhanced_catalog_parser.py:27-67)") {
    val r = Seq(("1,2 кг", "12 990,50 ₸", "3 шт", "31.07.2025"))
      .toDF("w", "p", "s", "d")
      .select(
        F.cleanWeight(col("w")).as("w"), F.cleanPrice(col("p")).as("p"),
        F.cleanStock(col("s")).as("s"),
        date_format(F.dayFirstDate(col("d")), "yyyy-MM-dd").as("d"))
      .head()
    assert(r.getDouble(0) === 1.2)
    assert(r.getLong(1) === 12990)
    assert(r.getInt(2) === 3)
    assert(r.getString(3) === "2025-07-31")
  }

  test("cleaners null/default on garbage") {
    val r = Seq(("N/A", "bad", null: String, "n/a"))
      .toDF("w", "p", "s", "d")
      .select(F.cleanWeight(col("w")).as("w"), F.cleanPrice(col("p")).as("p"),
        F.cleanStock(col("s")).as("s"), F.dayFirstDate(col("d")).as("d"))
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getInt(2) === 0)
    assert(r.isNullAt(3))
  }

  test("idFromHref extracts trailing numeric ids (scrape.ts:39-42)") {
    val r = Seq("/p/shoes-alpha-12345/", "/p/shoes-999", "/p/no-id/x")
      .toDF("h").select(F.idFromHref(col("h")).as("id"))
      .collect().map(_.getString(0))
    assert(r.toSeq === Seq("12345", "999", ""))
  }

  test("isPriceBot guards zero group-min (scrape.ts:723)") {
    val r = Seq((0.0, 0.0, 0.0), (100.0, 0.0, 0.0), (5000.0, 0.0, 0.0))
      .toDF("p", "mn", "md")
      .select(F.isPriceBot(col("p"), col("mn"), col("md"), 100.0, 0.0025, 3000.0).as("b"))
      .collect().map(_.getBoolean(0))
    assert(r.toSeq === Seq(true, true, true)) // pct branch reduces to delta>=0 at mn=0
  }
}
