package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Cross-document duplicated-span excision (q_span_removal): pins the
  * invariants the driver's hash-compare can't express — maximal-run
  * recovery from overlapping gram windows, the both-copies-cut policy,
  * span counting across separated runs, and the cross-doc (never
  * within-doc) duplication criterion.
  */
class SpanRemovalSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def run(docs: (Long, String)*) = {
    import spark.implicits._
    CorpusOps.spanRemovalFrom(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"),
          r.getAs[Long]("n_spans"), r.getAs[String]("clean_hash"))))
      .toMap
  }

  test("a shared 7-token run is excised in FULL from both docs as one span") {
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val a = s"a1 a2 a3 $shared a4 a5"
    val b = s"b1 $shared b2 b3 b4 b5"
    val out = run(1L -> a, 2L -> b)
    // K=5 grams only cover the run's interior windows, but their union
    // is the full 7-token run — the pigeonhole property the operator
    // documents. Both copies are cut (Lee et al. policy).
    assert(out(1L) === ((12L, 7L, 1L, md5Hex("a1 a2 a3 a4 a5"))))
    assert(out(2L) === ((12L, 7L, 1L, md5Hex("b1 b2 b3 b4 b5"))))
  }

  test("two separated shared runs count as two maximal spans") {
    val r1 = (1 to 5).map(i => s"x$i").mkString(" ")
    val r2 = (1 to 5).map(i => s"y$i").mkString(" ")
    val a = s"$r1 mid1 mid2 mid3 $r2 tail1"
    val b = s"$r1 other1 other2 other3 other4 $r2"
    val out = run(1L -> a, 2L -> b)
    assert(out(1L)._2 === 10L)
    assert(out(1L)._3 === 2L)
    assert(out(1L)._4 === md5Hex("mid1 mid2 mid3 tail1"))
    assert(out(2L)._3 === 2L)
  }

  test("within-doc repetition alone is NOT excised; untouched docs are not emitted") {
    val rep = (1 to 5).map(i => s"r$i").mkString(" ")
    // doc 1 repeats a run internally but shares nothing across docs;
    // doc 2 is unique and shorter than K.
    val out = run(1L -> s"$rep once $rep", 2L -> "tiny doc")
    assert(out.isEmpty)
  }

  test("exact clones are distinct documents: a 2-clone family is fully excised (clone pre-collapse preserves the law)") {
    // token-identical docs collapse to one representative internally
    // (the r13 pre-collapse), but each member still counts as a
    // distinct document for the >= 2-docs criterion: every gram of a
    // cloned doc is cross-document duplicated, so BOTH copies lose all
    // covered tokens — and a third doc sharing nothing stays untouched
    val fam = (1 to 9).map(i => s"c$i").mkString(" ")
    val out = run(1L -> fam, 2L -> fam, 3L -> "lonely doc with no twin here")
    assert(out.keySet === Set(1L, 2L))
    assert(out(1L) === ((9L, 9L, 1L, md5Hex(""))))
    assert(out(2L) === out(1L))
  }

  test("a clone family PLUS a partial overlap: members and non-members each get the right coverage") {
    val shared = (1 to 6).map(i => s"v$i").mkString(" ")
    val fam = s"f1 f2 $shared f3 f4"   // cloned twice (docs 1, 2)
    val other = s"o1 o2 o3 o4 $shared" // distinct doc sharing only the run
    val out = run(1L -> fam, 2L -> fam, 3L -> other)
    // clones: every token is in a >=2-doc gram (the whole doc is its
    // own duplicate), so full excision
    assert(out(1L) === ((10L, 10L, 1L, md5Hex(""))))
    assert(out(2L) === out(1L))
    // the non-clone loses exactly the shared run
    assert(out(3L) === ((10L, 6L, 1L, md5Hex("o1 o2 o3 o4"))))
  }

  test("clone-mass fork: direct and collapsed paths are row-identical on the same corpus") {
    import spark.implicits._
    // a corpus straddling both regimes: a 3-clone family, a partial
    // overlap, a unique doc, a sub-K doc — whatever the gate picks for
    // it, BOTH forks must emit the identical row set
    val shared = (1 to 6).map(i => s"w$i").mkString(" ")
    val fam = s"p1 p2 $shared p3"
    val docs = Seq(
      1L -> fam, 2L -> fam, 3L -> fam,
      4L -> s"q1 q2 q3 q4 $shared",
      5L -> "a unique document with plenty of tokens to spare here",
      6L -> "tiny").toDF("doc_id", "text")
    val direct = CorpusOps.spanRemovalDirect(docs)
      .collect().map(_.toSeq).toSet
    val collapsed = CorpusOps.spanRemovalCollapsed(docs)
      .collect().map(_.toSeq).toSet
    assert(direct.nonEmpty)
    assert(direct === collapsed)
  }

  test("matches the q_span_removal oracle shape on the sf0.001 corpus") {
    val rows = CorpusOps.spanRemoval(spark, SparkT.Sf0001).collect()
    assert(rows.nonEmpty)
    // conservation: removed ≤ tokens; spans ≥ 1 wherever emitted, and
    // each span is at least K tokens wide → removed ≥ K·spans.
    rows.foreach { r =>
      val (n, rm, sp) = (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[Long]("n_spans"))
      assert(rm <= n && sp >= 1L)
      assert(rm >= CorpusOps.SpanGramK.toLong * sp)
    }
  }
}
