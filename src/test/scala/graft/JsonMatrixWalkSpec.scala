package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JsonMatrixWalk

/** The unbounded-depth variant-matrix walk (SURVEY §2.7 X16,
  * scrape.ts:373-391). The fixture page exercises the oracle-checked
  * surface (q_matrix_walk); this spec proves the properties no fixed
  * from_json schema can have: arbitrary nesting depth and the
  * reference's exact emission/last-wins semantics.
  */
class JsonMatrixWalkSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def walkRows(json: String): Seq[(String, String, Int, String)] = {
    import spark.implicits._
    Seq(json).toDF("j")
      .select(explode(JsonMatrixWalk(spark, col("j"))).as("w"))
      .select("w.product_code", "w.size_label", "w.depth", "w.path")
      .as[(String, String, Int, String)].collect().toSeq
  }

  test("walks to arbitrary depth (60 levels, far past any typed schema)") {
    val depth = 60
    val inner =
      """{"characteristic": {"id": "XS", "title": "Размер"}, "productCode": "DEEP-60"}"""
    val json = (1 until depth).foldLeft(inner) { (child, _) =>
      s"""{"characteristic": {"id": "c", "title": "Цвет"}, "matrix": [$child]}"""
    } match { case nested => s"""{"matrix": [$nested]}""" }
    val rows = walkRows(json)
    assert(rows == Seq(("DEEP-60", "XS", depth, Seq.fill(depth)("0000").mkString("."))))
  }

  test("emission rules match the reference walk") {
    val json =
      """{"matrix": [
        |  {"characteristic": {"id": "38", "title": "Размер"}},
        |  {"characteristic": {"id": "", "title": "size"}, "productCode": "P-EMPTY"},
        |  {"characteristic": {"id": "39", "title": "Цвет"}, "productCode": "P-COLOR"},
        |  {"characteristic": {"id": "size-40"}, "productCode": "P-IDFALL"},
        |  {"characteristic": {"id": "41", "title": "Size",
        |    "values": [{"dimension": "RU"}], "dimension": "EU"}, "productCode": "P-DIM"},
        |  {"characteristic": {"id": "42", "title": "размер",
        |    "values": [{"dimension": ""}], "dimension": "EU"}, "productCode": "P-FALLDIM"}
        |]}""".stripMargin
    val rows = walkRows(json).map(r => (r._1, r._2)).toSet
    // no productCode and empty size id are skipped; non-size title is
    // skipped; title falls back to id; values[0].dimension wins over
    // characteristic.dimension, empty string falls through (JS ||)
    assert(rows == Set(
      ("P-IDFALL", "size-40"),
      ("P-DIM", "41 RU"),
      ("P-FALLDIM", "42 EU")))
  }

  test("path order is document order: duplicate codes resolve last-wins") {
    val json =
      """{"matrix": [
        |  {"characteristic": {"id": "A", "title": "size"}, "productCode": "P", "matrix": [
        |    {"characteristic": {"id": "B", "title": "size"}, "productCode": "P"},
        |    {"characteristic": {"id": "C", "title": "size"}, "productCode": "P"}]},
        |  {"characteristic": {"id": "D", "title": "size"}, "productCode": "P"}
        |]}""".stripMargin
    import spark.implicits._
    val last = Seq(json).toDF("j")
      .select(explode(JsonMatrixWalk(spark, col("j"))).as("w"))
      .groupBy("w.product_code")
      .agg(max_by(col("w.size_label"), col("w.path")).as("size_label"))
      .as[(String, String)].collect().toSeq
    assert(last == Seq(("P", "D"))) // DFS: A, B, C, then D — D is the last write
  }

  test("malformed and matrix-free JSON coerce to null/empty") {
    val rows = walkRows("""{"title": "no matrix here"}""")
    assert(rows.isEmpty)
    import spark.implicits._
    val nulls = Seq("{not json").toDF("j")
      .select(JsonMatrixWalk(spark, col("j")).as("w"))
      .filter(col("w").isNull).count()
    assert(nulls == 1)
  }

  // Independent re-implementation of the reference walk semantics
  // (scrape.ts:373-391) over a generated tree model, so the expression
  // is pinned against a second implementation on random shapes.
  private case class TNode(title: Option[String], id: Option[String],
      chDim: Option[String], valDim: Option[String], pc: Option[String],
      children: Seq[TNode])

  private def toJson(n: TNode): String = {
    val chFields = Seq(
      n.title.map(t => s""""title": "$t""""),
      n.id.map(i => s""""id": "$i""""),
      n.chDim.map(d => s""""dimension": "$d""""),
      n.valDim.map(v => s""""values": [{"dimension": "$v"}]""")).flatten
    val fields = Seq(
      Some(s""""characteristic": {${chFields.mkString(", ")}}"""),
      n.pc.map(p => s""""productCode": "$p""""),
      if (n.children.nonEmpty)
        Some(s""""matrix": [${n.children.map(toJson).mkString(", ")}]""")
      else None).flatten
    s"{${fields.mkString(", ")}}"
  }

  private def modelWalk(root: Seq[TNode]): Seq[(String, String, Int, String)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, String)]
    def visit(n: TNode, depth: Int, path: String): Unit = {
      val title = n.title.filter(_.nonEmpty).getOrElse(n.id.getOrElse(""))
      if (title.toLowerCase.contains("размер") || title.toLowerCase.contains("size")) {
        val sizeId = n.id.getOrElse("").trim
        val dim = n.valDim.filter(_.nonEmpty)
          .getOrElse(n.chDim.getOrElse("")).trim
        val pcTruthy = n.pc.exists(_.nonEmpty)
        if (pcTruthy && sizeId.nonEmpty) {
          val label = if (dim.nonEmpty) s"$sizeId $dim" else sizeId
          out += ((n.pc.get, label, depth, path))
        }
      }
      n.children.zipWithIndex.foreach { case (c, i) =>
        visit(c, depth + 1, f"$path%s.$i%04d")
      }
    }
    root.zipWithIndex.foreach { case (c, i) => visit(c, 1, f"$i%04d") }
    out.toSeq
  }

  test("random trees match the independent model walk (property)") {
    val rnd = new scala.util.Random(23)
    val titles = Seq(Some("Размер"), Some("размер обуви"), Some("Цвет"),
      Some("size"), Some("SIZE EU"), Some(""), None)
    val ids = Seq(Some("XL"), Some("42"), Some("s"), Some(""), None)
    val dims = Seq(Some("см"), Some("EU"), Some(""), None)
    val pcs = Seq(Some("P-1"), Some("P-2"), Some("P-3"), Some(""), None)
    def gen(depth: Int): TNode = TNode(
      titles(rnd.nextInt(titles.size)), ids(rnd.nextInt(ids.size)),
      dims(rnd.nextInt(dims.size)), dims(rnd.nextInt(dims.size)),
      pcs(rnd.nextInt(pcs.size)),
      if (depth >= 5) Nil
      else Seq.fill(rnd.nextInt(3))(gen(depth + 1)))
    (0 until 40).foreach { _ =>
      val roots = Seq.fill(1 + rnd.nextInt(3))(gen(1))
      val json = s"""{"matrix": [${roots.map(toJson).mkString(", ")}]}"""
      assert(walkRows(json) == modelWalk(roots), s"tree: $json")
    }
  }
}
