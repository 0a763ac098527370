package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** Round-6 corpus-curation operators: segment-level (C4-style) dedup,
  * mixture weights + deterministic resampling, PII redaction, the
  * Naive-Bayes learned quality filter and winnowing fingerprints. Each
  * is oracle-checked end-to-end (q_segment_dedup, q_mixture_weights,
  * q_mixture_resample, q_pii_redact, q_nb_quality,
  * q_winnow_fingerprint); these tests pin the invariants a hash-compare
  * can't express — conservation laws, direction-of-effect, and per-row
  * Scala recomputation.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("segment dedup: token conservation and exactly-once survival per distinct segment") {
    val rows = CorpusOps.segmentDedup(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length === docs.size)
    // Per-doc conservation: kept + removed tokens == doc tokens; kept +
    // removed segments == ceil(n/SegTokens).
    rows.foreach { r =>
      val n = docs(r.getAs[Long]("doc_id")).split(" ").length
      assert(r.getAs[Long]("kept_tokens") + r.getAs[Long]("removed_tokens") === n.toLong)
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_removed") ===
        (n + CorpusOps.SegTokens - 1) / CorpusOps.SegTokens)
    }
    // Corpus law: total kept segments == number of DISTINCT segment
    // texts (each survives exactly once, first occurrence wins).
    val distinctSegs = docs.values.flatMap { t =>
      t.split(" ").grouped(CorpusOps.SegTokens).map(_.mkString(" "))
    }.toSet
    assert(rows.map(_.getAs[Long]("n_kept")).sum === distinctSegs.size.toLong)
  }

  test("segment dedup: planted boilerplate is removed from the later doc only") {
    import spark.implicits._
    // one identical 10-token block, segment-aligned in both docs
    val block = (1 to 10).map(i => s"tpl$i").mkString(" ")
    val aOwn = (1 to 10).map(i => s"a$i").mkString(" ")
    val bOwn = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$aOwn $block"),
      (2L, s"$block $bOwn")).toDF("doc_id", "text")
    val rows = CorpusOps.segmentDedupFrom(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 1 keeps everything (first corpus-wide occurrence of the block)
    assert(rows(1L).getAs[Long]("n_removed") === 0L)
    assert(rows(1L).getAs[String]("cleaned_hash") === md5Hex(s"$aOwn $block"))
    // doc 2 loses exactly the block, keeps its own segment
    assert(rows(2L).getAs[Long]("n_removed") === 1L)
    assert(rows(2L).getAs[Long]("removed_tokens") === 10L)
    assert(rows(2L).getAs[String]("cleaned_hash") === md5Hex(bOwn))
  }

  test("mixture weights: shares normalize and temperature upweights low-resource groups") {
    val rows = CorpusOps.mixtureWeights(spark, dir).collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getAs[Double]("raw_share")).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getAs[Double]("mix_weight")).sum - 1.0) < 1e-4)
    // α = 1/2 compresses the range: the smallest group gains weight
    // (epochs > 1-per-pass share), the largest loses.
    val bySize = rows.sortBy(_.getAs[Long]("n_tokens"))
    assert(bySize.head.getAs[Double]("mix_weight") >
      bySize.head.getAs[Double]("raw_share"))
    assert(bySize.last.getAs[Double]("mix_weight") <
      bySize.last.getAs[Double]("raw_share"))
    assert(bySize.head.getAs[Double]("epochs") >
      bySize.last.getAs[Double]("epochs"))
  }

  test("mixture resample: per-group copy mass tracks epochs, bucket rule recomputed") {
    val weights = CorpusOps.mixtureWeights(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Double]("epochs"), r.getAs[Long]("n_docs"))).toMap
    val rows = CorpusOps.mixtureResample(spark, dir).collect()
    rows.foreach { r =>
      // Recompute the copy rule per doc from the md5 bucket.
      val e = r.getAs[Double]("epochs")
      val bucket = Integer.parseInt(
        md5Hex(r.getAs[Long]("doc_id").toString).take(2), 16)
      val thr = math.floor((e - math.floor(e)) * 256 + 0.5)
      val want = math.floor(e).toLong + (if (bucket < thr) 1L else 0L)
      assert(r.getAs[Long]("n_copies") === want)
    }
    // Group mass: sum of copies within ±(n_docs) of epochs * n_docs
    // (each doc rounds its fractional copy independently).
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val (e, nd) = weights(lang)
      val mass = rs.map(_.getAs[Long]("n_copies")).sum.toDouble
      assert(math.abs(mass - e * nd) <= nd.toDouble,
        s"$lang: copies $mass vs target ${e * nd}")
    }
  }

  test("PII redaction: planted pattern counts and hash-change iff redacted") {
    val rows = CorpusOps.piiRedact(spark, dir).collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // The raw corpus carries no PII, so counts are exactly the plants.
      assert(r.getAs[Long]("n_emails") === (if (id % 7 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_phones") === (if (id % 5 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_ips") === (if (id % 11 == 0) 1L else 0L))
      assert(r.getAs[Long]("n_pii") ===
        r.getAs[Long]("n_emails") + r.getAs[Long]("n_phones") + r.getAs[Long]("n_ips"))
      // No plants → redacted text is the raw text; plants → it differs.
      if (r.getAs[Long]("n_pii") == 0L)
        assert(r.getAs[String]("redacted_hash") === md5Hex(texts(id)))
      else
        assert(r.getAs[String]("redacted_hash") !== md5Hex(texts(id)))
    }
  }

  test("PII masking is idempotent and total on adversarial inputs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val nasty = Seq(
      "plain text with no pii at all",
      "a@b.co touching+1-555-0000 and 10.1.2.3 back to back",
      "double dot a..b@x.y.zz and 10.255.255.255 10.0.0.0",
      "<EMAIL> already masked plus fresh other@example.org",
      "email at end a@b.io",
      "+1-555-9999+1-555-8888 adjacent phones").toDF("s")
    val once = nasty.select(CorpusOps.redact(col("s")).as("r")).collect()
      .map(_.getString(0))
    val twice = nasty
      .select(CorpusOps.redact(CorpusOps.redact(col("s"))).as("r"))
      .collect().map(_.getString(0))
    assert(once.toSeq === twice.toSeq, "redaction must be idempotent")
    // total: no raw pattern survives one pass
    once.foreach { r =>
      assert(!r.matches(s".*${CorpusOps.EmailRe}.*"), s"email survived: $r")
      assert(!r.matches(s".*${CorpusOps.PhoneRe}.*"), s"phone survived: $r")
      assert(!r.matches(s".*${CorpusOps.IpRe}.*"), s"ip survived: $r")
    }
  }

  test("NB quality filter: two classes, full coverage, learns the label") {
    val rows = CorpusOps.nbQualityFilter(spark, dir).collect()
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    val labels = rows.map(_.getAs[Boolean]("label_keep")).toSet
    assert(labels === Set(true, false), "median label must be two-class")
    // The learned scores must separate the classes far better than
    // chance: diagonal mass ≥ 80% (trained and evaluated on the same
    // corpus, so near-perfect agreement is expected).
    val diag = rows.filter(r =>
      r.getAs[Boolean]("label_keep") == r.getAs[Boolean]("pred_keep"))
      .map(_.getAs[Long]("n_docs")).sum
    assert(diag.toDouble / nDocs >= 0.8, s"diagonal $diag of $nDocs")
    // Mean scores point the right way per label row.
    rows.filter(_.getAs[Boolean]("pred_keep"))
      .foreach(r => assert(r.getAs[Double]("mean_score") > 0))
    rows.filterNot(_.getAs[Boolean]("pred_keep"))
      .foreach(r => assert(r.getAs[Double]("mean_score") <= 0))
  }

  test("NB quality filter: degenerate single-class corpus stays total (smoothed prior)") {
    import spark.implicits._
    // identical texts → every doc ties AT the median → label_keep is
    // true everywhere (q >= median) and the negative class is empty;
    // the unsmoothed prior log2(nd1/nd0) would be log2(x/0)
    val planted = (1L to 20L)
      .map(i => (i, s"alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val rows = CorpusOps.nbQualityFilterOn(planted).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 20L)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("label_keep"), "all docs tie at the median")
      val m = r.getAs[Double]("mean_score")
      assert(!m.isNaN && !m.isInfinite, s"score must stay finite, got $m")
    }
  }

  test("token budget: two-phase prefix sum equals the global recompute, one cut at most") {
    val rows = CorpusOps.tokenBudget(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // Global recompute: sort by (rounded quality desc, doc_id), prefix.
    val docs = rows.values.toSeq
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score"),
        r.getAs[Long]("n_tokens")))
      .sortBy { case (id, q, _) => (-q, id) }
    val total = docs.map(_._3).sum
    val budget = total / 2
    var cum = 0L
    var cuts = 0
    docs.foreach { case (id, _, n) =>
      val r = rows(id)
      assert(r.getAs[Long]("cum_start") === cum,
        s"doc $id prefix (two-phase vs global)")
      assert(r.getAs[Boolean]("selected") === (cum < budget))
      val isCut = cum < budget && cum + n > budget
      assert(r.getAs[Boolean]("is_cut") === isCut)
      if (isCut) cuts += 1
      cum += n
    }
    assert(cum === total)
    assert(cuts <= 1, "at most one straddling document")
    val nSel = rows.values.count(_.getAs[Boolean]("selected"))
    assert(nSel > 0 && nSel < rows.size, "the budget must genuinely cut")
  }

  test("shared passages: pair counts and containment match a Scala recompute") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def fpSet(t: String): Set[Long] = {
      val ws = t.split(" ")
      val hs = if (ws.length < 3) Seq.empty[Long]
      else ws.sliding(3).map(g =>
        java.lang.Long.parseLong(md5Hex(g.mkString(" ")).take(8), 16)).toSeq
      val wins = if (hs.isEmpty) Seq.empty
      else if (hs.length < CorpusOps.WinnowWindow) Seq(hs.min)
      else hs.sliding(CorpusOps.WinnowWindow).map(_.min).toSeq
      wins.toSet
    }
    val all = texts.view.mapValues(fpSet).toMap
    val df = all.values.toSeq.flatMap(_.toSeq).groupBy(identity)
      .map { case (f, xs) => f -> xs.size }
    val kept = all.view.mapValues(_.filter(f => df(f) <= CorpusOps.MaxFpDf)).toMap
    val rows = CorpusOps.sharedPassages(spark, dir).collect()
    assert(rows.nonEmpty, "planted near-dups must surface as shared passages")
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(a < b)
      val shared = (kept(a) & kept(b)).size
      assert(shared >= CorpusOps.MinSharedFp)
      assert(r.getAs[Long]("n_shared") === shared.toLong)
      val want = shared.toDouble / math.min(kept(a).size, kept(b).size)
      assert(math.abs(r.getAs[Double]("containment") - want) < 1e-6)
    }
    // Completeness: every qualifying pair in the recompute is reported.
    val reported = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    for (a <- kept.keys; b <- kept.keys if a < b) {
      val shared = (kept(a) & kept(b)).size
      if (shared >= CorpusOps.MinSharedFp)
        assert(reported((a, b)), s"missing pair ($a,$b) with $shared shared")
    }
  }

  test("winnowing theorem: a shared run of WinnowWindow+2 tokens guarantees a shared fingerprint") {
    import spark.implicits._
    // t = w + k - 1 = 4 + 3 - 1 = 6: any shared run of >= 6 tokens
    // contains one full gram-hash window, whose minimum VALUE is
    // selected in both documents regardless of surrounding text.
    val run6 = "r1 r2 r3 r4 r5 r6"
    val run8 = "s1 s2 s3 s4 s5 s6 s7 s8"
    val docs = Seq(
      (1L, s"a1 a2 a3 $run6 a4 a5 a6"),
      (2L, s"b1 b2 $run6 b3 b4 b5 b6"),
      (3L, s"c1 c2 c3 c4 $run8"),
      (4L, s"$run8 d1 d2 d3 d4"),
      (5L, "e1 e2 e3 e4 e5 e6 e7 e8 e9")).toDF("doc_id", "text")
    val fp = CorpusOps.winnowBaseFrom(docs)
      .selectExpr("doc_id", "array_distinct(wins) AS f").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Seq[Long]]("f").toSet).toMap
    assert((fp(1L) & fp(2L)).nonEmpty, "6-token shared run must fingerprint")
    assert((fp(3L) & fp(4L)).nonEmpty, "8-token shared run must fingerprint")
    assert((fp(5L) & (fp(1L) | fp(2L) | fp(3L) | fp(4L))).isEmpty,
      "disjoint text must not share fingerprints")
  }

  test("winnowing: per-doc recompute and the shared-run guarantee") {
    val rows = CorpusOps.winnowFingerprints(spark, dir).collect()
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length === texts.size)
    def fingerprints(t: String): Seq[Long] = {
      val ws = t.split(" ")
      val hs = if (ws.length < 3) Seq.empty[Long]
      else ws.sliding(3).map(g =>
        java.lang.Long.parseLong(md5Hex(g.mkString(" ")).take(8), 16)).toSeq
      if (hs.isEmpty) Seq.empty
      else if (hs.length < CorpusOps.WinnowWindow) Seq(hs.min)
      else hs.sliding(CorpusOps.WinnowWindow).map(_.min).toSeq
    }
    rows.foreach { r =>
      val fp = fingerprints(texts(r.getAs[Long]("doc_id")))
      assert(r.getAs[Long]("n_fingerprints") === fp.distinct.size.toLong)
      assert(r.getAs[String]("fp_hash") ===
        md5Hex(fp.distinct.sorted.mkString(",")))
      if (fp.nonEmpty) assert(r.getAs[Long]("n_fingerprints") >= 1L)
    }
  }
}
