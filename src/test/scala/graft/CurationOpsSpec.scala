package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextOps

/** Round-5 LLM-curation operators: exact n-gram-Jaccard near-dup,
  * train/eval decontamination, Gopher-style repetition metrics, and
  * the deterministic stratified sample. Each is also oracle-checked
  * end-to-end (q_ngram_jaccard_neardup, q_decontam_overlap,
  * q_doc_repetition, q_doc_stratified); these tests pin the invariants
  * a DuckDB hash-compare can't express — per-row recomputation in
  * plain Scala, flag/count consistency, and rerun determinism.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark
  private val dir = SparkT.Sf0001

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("ngram Jaccard pairs: ordered, thresholded, and exact vs a Scala recompute") {
    val rows = TextOps.ngramJaccardNearDup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Double]("jaccard") >= TextOps.JaccardThreshold)
    }
    // Recompute the rare-shingle Jaccard for every reported pair from
    // the raw text, in plain Scala.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def shinglesOf(t: String): Set[String] = {
      val ws = t.split(" ")
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(_.mkString(" ")).toSet
    }
    val df = docs.values.toSeq.flatMap(shinglesOf(_).toSeq)
      .groupBy(identity).map { case (s, xs) => s -> xs.size }
    val kept = docs.map { case (id, t) =>
      id -> shinglesOf(t).filter(s => df(s) <= TextOps.MaxShingleDf)
    }
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      val inter = (kept(a) & kept(b)).size
      val union = (kept(a) | kept(b)).size
      assert(r.getAs[Long]("n_shared") === inter.toLong)
      assert(math.abs(r.getAs[Double]("jaccard") - inter.toDouble / union) < 1e-6)
    }
  }

  test("decontamination: split is the hash slice, counts and flag are consistent") {
    val rows = TextOps.decontamOverlap(spark, dir).collect()
    assert(rows.nonEmpty)
    def isEval(id: Long): Boolean =
      Integer.parseInt(md5Hex(id.toString).take(2), 16) < TextOps.SampleBucketMax
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(isEval(id), s"doc $id reported but not in the eval slice")
      val n = r.getAs[Long]("n_shingles")
      val o = r.getAs[Long]("n_overlap")
      assert(o >= 0 && o <= n)
      assert(r.getAs[Boolean]("contaminated") ===
        (o.toDouble / n >= TextOps.ContaminationThreshold))
    }
    // every eval doc with >= 3 words appears exactly once
    val evalIds = rows.map(_.getAs[Long]("doc_id"))
    assert(evalIds.distinct.length === evalIds.length)
  }

  test("repetition metrics match a per-doc Scala recompute") {
    val got = TextOps.repetitionStats(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
    assert(got.size === docs.length)
    docs.foreach { d =>
      val ws = d.getAs[String]("text").split(" ").toSeq
      val r = got(d.getAs[Long]("doc_id"))
      def top(k: Int): Long =
        if (ws.length < k) 0L
        else ws.sliding(k).map(_.mkString(" ")).toSeq
          .groupBy(identity).values.map(_.size).max.toLong
      def rnd6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
      assert(r.getAs[Long]("n_tokens") === ws.length.toLong)
      assert(r.getAs[Double]("top_token_frac") === rnd6(top(1).toDouble / ws.length))
      if (ws.length >= 2)
        assert(r.getAs[Double]("top_bigram_frac") ===
          rnd6(top(2).toDouble / (ws.length - 1)))
      if (ws.length >= 3) {
        val tris = ws.sliding(3).map(_.mkString(" ")).toSeq
        assert(r.getAs[Double]("dup_trigram_frac") ===
          rnd6((tris.length - tris.distinct.length).toDouble / tris.length))
      }
    }
  }

  test("stratified sample: the StratumCap smallest hashes per language, ranked") {
    val rows = TextOps.stratifiedSample(spark, dir).collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    byLang.foreach { case (lang, rs) =>
      assert(rs.length <= TextOps.StratumCap)
      // ranks are 1..k with no gaps
      assert(rs.map(_.getAs[Int]("sample_rank")).sorted.toSeq ===
        (1 to rs.length).toSeq)
      // membership = the k smallest (md5, doc_id) keys of the stratum
      val expect = docs.filter(_._2 == lang)
        .sortBy { case (id, _) => (md5Hex(id.toString), id) }
        .take(TextOps.StratumCap).map(_._1).toSet
      assert(rs.map(_.getAs[Long]("doc_id")).toSet === expect)
    }
    // rerun is byte-identical (pure function of the keys)
    val again = TextOps.stratifiedSample(spark, dir).collect()
    assert(again.map(_.toString).toSeq === rows.map(_.toString).toSeq)
  }

  test("surprisal: per-doc mean matches a plain-Scala unigram recompute") {
    val rows = TextOps.surprisalScores(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // split(_, " ", -1): Spark's split keeps trailing empty tokens
    val vocab = docs.values.toSeq.flatMap(_.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nTotal = vocab.values.sum.toDouble
    def rnd(x: Double, s: Int) = {
      val p = math.pow(10, s); math.floor(x * p + 0.5) / p
    }
    rows.foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ", -1)
      assert(r.getAs[Long]("n_tokens") == toks.length)
      val sumDec = toks.map { t =>
        BigDecimal(rnd(math.log(nTotal / vocab(t)) / math.log(2.0), 6))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      // one 4th-decimal rounding step of slack: a doc sitting exactly on
      // a .5 boundary can round differently from a 1-ulp log difference
      val mine = rnd((sumDec / toks.length).toDouble, 4)
      assert(math.abs(mine - r.getAs[Double]("mean_surprisal")) <= 2e-4,
        s"doc ${r.getAs[Long]("doc_id")}: $mine vs ${r.getAs[Double]("mean_surprisal")}")
    }
  }

  test("keywords: reported tf-idf scores and top-k dominance vs Scala recompute") {
    val rows = TextOps.docKeywords(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).filter(_.nonEmpty).toSeq
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val df = tf.values.flatMap(_.keys).toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = docs.size.toDouble
    def rnd6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    def scoreOf(id: Long, tok: String): Double =
      rnd6(tf(id)(tok) * math.log(n / df(tok)))
    val eps = 2e-6 // one 6th-decimal rounding step of ln-ulp slack
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("kw_rank"))
      assert(sorted.map(_.getAs[Int]("kw_rank")).toSeq ==
        (1 to sorted.length).toSeq)
      sorted.foreach { r =>
        assert(math.abs(r.getAs[Double]("score") -
          scoreOf(id, r.getAs[String]("token"))) <= eps)
      }
      // dominance: nothing outside the reported top-k scores higher
      val cut = sorted.last.getAs[Double]("score")
      val reported = sorted.map(_.getAs[String]("token")).toSet
      tf(id).keys.filterNot(reported).foreach { tok =>
        assert(scoreOf(id, tok) <= cut + eps,
          s"doc $id: $tok (${scoreOf(id, tok)}) beats reported cut $cut")
      }
    }
  }

  test("bpe training: merge table matches a plain-Scala greedy recompute") {
    val rows = TextOps.bpeTrain(spark, dir).collect()
    assert(rows.length == TextOps.BpeRounds)
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var syms: Map[Vector[String], Long] = words.toSeq
      .map { case (w, c) => w.map(_.toString).toVector -> c }
      .groupMapReduce(_._1)(_._2)(_ + _)
    def wrapped(a: String, b: String) = "\u0001" + a + "\u0001\u0001" + b + "\u0001"
    for (r <- 0 until TextOps.BpeRounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- syms; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + c
      // engine tie-break is bytewise on the WRAPPED pair string
      val ((la, rb), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, wrapped(a, b)) }
      val row = rows(r)
      assert(row.getAs[String]("left_sym") == la &&
        row.getAs[String]("right_sym") == rb &&
        row.getAs[String]("merged") == la + rb &&
        row.getAs[Long]("pair_count") == cnt,
        s"round $r: engine ${row} vs scala ($la,$rb,$cnt)")
      // greedy left-to-right merge, then continue
      syms = syms.toSeq.map { case (s, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < s.length) {
          if (i < s.length - 1 && s(i) == la && s(i + 1) == rb) {
            out += la + rb; i += 2
          } else { out += s(i); i += 1 }
        }
        out.result() -> c
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    // encoding: per-doc piece counts must match the post-merge vocabulary
    val pieceLen: Map[String, Long] =
      syms.keys.map(v => v.mkString -> v.length.toLong).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val enc = TextOps.bpeEncode(spark, dir).collect()
    assert(enc.nonEmpty)
    enc.foreach { e =>
      val ws = docs(e.getAs[Long]("doc_id")).split(" ", -1).filter(_.nonEmpty)
      assert(e.getAs[Long]("n_words") == ws.length)
      assert(e.getAs[Long]("n_pieces") == ws.map(pieceLen).sum)
      assert(e.getAs[Long]("n_pieces") >= e.getAs[Long]("n_words"))
    }
  }

  test("incremental dedup: admission invariants + no cross-boundary pair escapes") {
    val rows = TextOps.incrementalDedup(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val cand = r.getAs[Long]("n_candidates")
      val m = r.getAs[Long]("n_matches")
      assert(id % TextOps.BatchMod == TextOps.BatchRem, s"non-batch doc $id")
      assert(m <= cand)
      assert(r.getAs[Boolean]("admitted") == (m == 0))
      assert((r.getAs[Double]("best_jaccard") == -1.0) == (cand == 0))
    }
    // Recall vs the corpus-wide pair set: the full run's hot-band cap
    // counts batch+corpus rows per bucket, so it is STRICTER than the
    // incremental corpus-only cap — any confirmed full-run pair with
    // exactly one side in the batch slice must therefore surface as a
    // match on that batch doc (same signatures, same Jaccard confirm).
    val matched = rows.filter(_.getAs[Long]("n_matches") > 0)
      .map(_.getAs[Long]("doc_id")).toSet
    val crossPairs = TextOps.minhashNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .flatMap { case (a, b) =>
        val aB = a % TextOps.BatchMod == TextOps.BatchRem
        val bB = b % TextOps.BatchMod == TextOps.BatchRem
        if (aB && !bB) Some(a) else if (bB && !aB) Some(b) else None
      }
    assert(crossPairs.nonEmpty, "fixture has no cross-boundary near-dup pair")
    crossPairs.foreach(d => assert(matched.contains(d), s"batch doc $d escaped"))
  }

  test("ccnet buckets: ordered by score, near-thirds at bin granularity") {
    val rows = graft.operators.CorpusOps.ccnetBuckets(spark, dir).collect()
    assert(rows.nonEmpty)
    val byBucket = rows.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Double]("score"))).toMap
    assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
    // ordering law: head scores ≤ middle scores ≤ tail scores
    for {
      h <- byBucket.get("head"); m <- byBucket.get("middle")
    } assert(h.max <= m.min + 0.1 + 1e-9) // bin-granularity slack
    for {
      m <- byBucket.get("middle"); t <- byBucket.get("tail")
    } assert(m.max <= t.min + 0.1 + 1e-9)
    // shares are thirds up to the fattest bin straddling a boundary
    val n = rows.length.toDouble
    val maxBin = rows.groupBy(_.getAs[Long]("bin")).values.map(_.length).max
    byBucket.values.foreach { b =>
      assert(math.abs(b.length - n / 3) <= maxBin + 1,
        s"bucket share ${b.length} vs n/3=${n / 3} (maxBin $maxBin)")
    }
  }
}
