package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.{Out, Tables}
import graft.functions.F

/** Corpus-curation operators beyond the per-document statistics in
  * [[TextOps]]: cross-document boilerplate removal, data-mixture
  * computation and resampling, PII redaction, a learned (Naive-Bayes)
  * quality filter, and winnowing fingerprints.
  *
  * Same engineering contract as TextOps: built-in Catalyst expressions
  * only (array HOFs + md5 + regexp — zero UDFs, everything stays in
  * whole-stage codegen), hashes and transcendentals follow the
  * cross-engine determinism rules (md5-derived keys; any double that
  * feeds an aggregate is rounded to a fixed scale and summed as an
  * exact decimal, the [[TextOps.surprisalScores]] recipe).
  */
object CorpusOps {

  private def docs(spark: SparkSession, dir: String) =
    Tables.load(spark, dir, "documents")

  /** One cheap doc_id-keyed shuffle to spread CPU-heavy per-doc map
    * work across cores (the testdata parquet is a single row group —
    * see [[TextOps]]'s docsDistributed note; at 100 TB the scan already
    * has thousands of splits and this collapses into the partitioning
    * the per-doc groupBys need anyway).
    */
  private def docsDistributed(spark: SparkSession, dir: String) =
    docs(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))

  private val toks: Column = split(col("text"), " ")

  // ---------------------------------------------------------------- //
  // Segment-level dedup (C4-style boilerplate removal)
  // ---------------------------------------------------------------- //

  /** Tokens per dedup segment. C4 dedups at line granularity; this
    * corpus has no line structure, so segments are consecutive
    * [[SegTokens]]-token spans — the Spark shape (explode → corpus-wide
    * group on the span hash → first-occurrence-wins → ordered
    * reassembly) is identical.
    */
  val SegTokens = 10

  /** Cross-document segment dedup: split every document into
    * consecutive [[SegTokens]]-token segments, keep only the FIRST
    * corpus-wide occurrence of each distinct segment (ordered by
    * (doc_id, seg_idx) — deterministic), and report per document how
    * much text survives plus the md5 of the reassembled cleaned text.
    * This is the C4 "three-sentence span" / line-dedup boilerplate
    * remover: a span shared by many documents survives only where it
    * first appears.
    *
    * Scale shape: one explode (corpus tokens → corpus segments, ~n/10
    * rows), ONE shuffle on seg_hash for the first-wins window (high-
    * cardinality key — no hot buckets, since a segment repeated enough
    * to skew one reducer is exactly one group row), and one shuffle
    * back on doc_id for ordered reassembly. No self-joins, no
    * all-pairs anything; state per key is O(1).
    */
  def segmentDedup(spark: SparkSession, dir: String): DataFrame =
    segmentDedupFrom(docsDistributed(spark, dir))

  /** Same over any (doc_id, text) frame — lets specs plant literal
    * boilerplate and watch first-wins remove it. */
  private[graft] def segmentDedupFrom(d: DataFrame): DataFrame = {
    val n = size(col("ws"))
    val nSegs = floor((n + lit(SegTokens - 1)).cast("double") / lit(SegTokens))
      .cast("int")
    val segArr = transform(sequence(lit(0), nSegs - 1), i =>
      struct(
        i.as("seg_idx"),
        concat_ws(" ",
          slice(col("ws"), i * SegTokens + 1,
            least(lit(SegTokens), n - i * SegTokens))).as("seg_text"),
        least(lit(SegTokens), n - i * SegTokens).cast(LongType)
          .as("n_seg_tokens")))
    val segs = d
      .select(col("doc_id"), toks.as("ws"))
      .select(col("doc_id"), explode(segArr).as("s"))
      .select(col("doc_id"), col("s.seg_idx").as("seg_idx"),
        col("s.seg_text").as("seg_text"),
        col("s.n_seg_tokens").as("n_seg_tokens"),
        md5(col("s.seg_text")).as("seg_hash"))
    val firstWins = Window.partitionBy(col("seg_hash"))
      .orderBy(col("doc_id"), col("seg_idx"))
    val flagged = segs
      .withColumn("kept", row_number().over(firstWins) === 1)
    val keptStructs = sort_array(collect_list(
      when(col("kept"), struct(col("seg_idx"), col("seg_text")))))
    val r = flagged.groupBy("doc_id").agg(
      count(lit(1)).as("n_segments"),
      sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
      sum(when(!col("kept"), 1L).otherwise(0L)).as("n_removed"),
      sum(when(col("kept"), col("n_seg_tokens")).otherwise(0L))
        .as("kept_tokens"),
      sum(when(!col("kept"), col("n_seg_tokens")).otherwise(0L))
        .as("removed_tokens"),
      md5(concat_ws(" ",
        transform(keptStructs, s => s.getField("seg_text"))))
        .as("cleaned_hash"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // Cross-document duplicated-span excision (exact-substring dedup)
  // ---------------------------------------------------------------- //

  /** Tokens per duplicated-run detection gram. A cross-document
    * repeated run of length ≥ [[SpanGramK]] contributes at least one
    * duplicated gram, and the union of covered gram windows recovers
    * the FULL maximal run (every length-K subwindow of the run is
    * itself duplicated) — the token-level analogue of suffix-array
    * exact-substring dedup's minimum match length.
    */
  val SpanGramK = 5

  /** Cross-document duplicated-SPAN excision — the exact-substring
    * dedup of Lee et al.'s "Deduplicating Training Data Makes Language
    * Models Better", re-expressed relationally: slide a [[SpanGramK]]-
    * token gram window over every document, find grams present in ≥ 2
    * DISTINCT documents, mark every token position covered by a
    * duplicated gram, and excise those positions. Unlike whole-doc
    * (MinHash) or segment-aligned (C4) dedup, this removes *partial*
    * cross-document overlap at exact token boundaries — both copies
    * are cut, which is the published policy (removing one keeps the
    * memorization risk in the other).
    *
    * Output per affected document: token counts before/removed, the
    * number of maximal excised spans, and the md5 of the cleaned
    * reassembly. Documents with nothing to excise are untouched (not
    * emitted — the rewrite is the identity there).
    *
    * Scale shape: one explode to the gram-occurrence frame (~n_tokens
    * rows, 60-bit hashed keys), ONE map-side-combinable groupBy on the
    * gram hash for the distinct-doc count, a semi-join of occurrences
    * against the duplicated keys (key-partitioned — never all-pairs,
    * and fan-in per key is the occurrence count, so boilerplate-hot
    * grams cost their row count, not a quadratic pair set), then
    * per-doc reassembly as pure array expressions riding the doc_id
    * partitioning the scan already spread. No windows over corpus-
    * sized partitions; every per-doc structure is doc-bounded.
    */
  def spanRemoval(spark: SparkSession, dir: String): DataFrame =
    spanRemovalFrom(docsDistributed(spark, dir))

  /** Same over any (doc_id, text) frame — lets specs feed constructed
    * corpora with planted shared runs.
    *
    * Exact-clone pre-collapse (the r9 bander pattern, applied here in
    * r13): web corpora carry heavy exact-duplicate mass (the sf10
    * generator plants 4-5 clones per family), and every downstream
    * frame of this operator — the gram-occurrence explode, the
    * semi-join fan-in, the per-doc coverage aggregation — would
    * otherwise carry that multiplicity. Token-identical documents have
    * identical grams, coverage sets and cleaned text, so the pipeline
    * runs ONCE per clone class on a representative and the per-doc
    * rows re-expand through the (class → doc_id) membership at the
    * end. Cross-document duplication semantics are preserved exactly
    * by weighting each class's gram presence with its multiplicity: a
    * gram inside a 2-clone family IS present in ≥ 2 distinct docs
    * (both copies get excised — the published both-copies policy).
    *
    * Clone-mass gate (r14): the collapse is a plan FORK, not a fixed
    * prelude. A cheap digest-count aggregate measures the corpus's
    * clone-excess fraction first; below [[SpanCloneExcessGate]] the
    * pipeline runs directly per doc (the collapse's class aggregation
    * and re-expand join would be pure overhead — the r13 sf0.1 waiver),
    * above it the collapsed path keeps clone-heavy corpora (sf10)
    * paying per CLASS, not per copy. Both forks emit hash-identical
    * rows.
    */
  /** Clone-excess fraction above which the collapse pays for itself:
    * below it, the collapse's fixed stages (class aggregation + the
    * final membership re-expand join) cost more than the ≤ 2% of
    * duplicated gram mass the direct path would carry. The sf10-style
    * web corpus sits at ~74% excess (collapse), the near-unique small
    * SFs at ≤ 0.2% (direct) — the fork is decided by one cheap count
    * aggregate over 16-byte text digests, and both paths produce
    * hash-identical rows (SpanRemovalSpec pins it).
    */
  private val SpanCloneExcessGate = 0.02

  private[graft] def spanRemovalFrom(d: DataFrame): DataFrame = {
    val src = d.select(col("doc_id"), col("text"))
    // clone class key: md5 of the RAW text. split-on-" " followed by
    // concat_ws(" ") is the identity on strings (empty tokens survive
    // the round trip), so text identity ≡ token-sequence identity and
    // the key costs no tokenization pass
    val ck = md5(col("text"))
    // clone-mass probe: total docs + distinct classes from one count
    // aggregate over the digests (map-side partial agg; the shuffle
    // carries (digest, count) pairs only)
    val mass = src.select(ck.as("ck"))
      .groupBy(col("ck")).agg(count(lit(1)).as("m"))
      .agg(sum(col("m")).as("n"), count(lit(1)).as("c")).head()
    val (nDocs, nClasses) =
      if (mass.isNullAt(0)) (0L, 0L) else (mass.getLong(0), mass.getLong(1))
    val excess =
      if (nDocs == 0L) 0.0 else (nDocs - nClasses).toDouble / nDocs.toDouble
    val r = if (excess < SpanCloneExcessGate) spanRemovalDirect(src)
            else spanRemovalCollapsed(src)
    Out.sorted(r)(col("doc_id"))
  }

  /** Clone-light fork: the gram pipeline directly per doc — every doc
    * is (statistically) its own class, so the collapse's class
    * aggregation and membership re-expand would be pure fixed-stage
    * overhead.
    */
  private[graft] def spanRemovalDirect(src: DataFrame): DataFrame =
    spanClassRows(src.select(col("doc_id").as("k_"), toks.as("ws"),
        lit(1L).as("m")))
      .select(col("k_").as("doc_id"), col("n_tokens"),
        col("n_removed"), col("n_spans"), col("clean_hash"))

  /** Clone-heavy fork: coverage computed once per text-identical clone
    * class; per-doc output rows re-expand through the membership join
    * (class-sized → doc-sized).
    */
  private[graft] def spanRemovalCollapsed(src: DataFrame): DataFrame = {
    val withCk = src.withColumn("ck", md5(col("text")))
    val members = withCk.select(col("doc_id"), col("ck"))
    // one representative (text is identical across the class by
    // construction of ck) + the class multiplicity
    val classes = withCk.groupBy(col("ck"))
      .agg(first(col("text")).as("text"), count(lit(1)).as("m"))
    val classRows = spanClassRows(
      classes.select(col("ck").as("k_"), toks.as("ws"), col("m")))
    members.join(classRows, members("ck") === classRows("k_"))
      .select("doc_id", "n_tokens", "n_removed", "n_spans", "clean_hash")
  }

  /** The gram→duplication→coverage→reassembly core over any class
    * frame `(k_, ws, m)` — `k_` the class key (doc_id on the direct
    * path, the text digest on the collapsed path), `m` the class
    * multiplicity. Emits one row per class that has something to
    * excise: `(k_, n_tokens, n_removed, n_spans, clean_hash)`.
    */
  private def spanClassRows(classes: DataFrame): DataFrame = {
    val k = SpanGramK
    // 60-bit gram keys: conv(md5-prefix) on Spark ≡ CAST('0x'||substr)
    // in the oracle (the minhash shingle-hash convention).
    val gramHashes = transform(
      sequence(lit(1), size(col("ws")) - (k - 1)),
      i => conv(substring(md5(concat_ws(" ", slice(col("ws"), i, lit(k)))),
        1, 15), 16, 10).cast(LongType))
    val occ = classes
      .filter(size(col("ws")) >= k)
      .select(col("k_"), col("m"), posexplode(gramHashes))
      .select(col("k_"), col("m"), (col("pos") + 1).as("start"),
        col("col").as("gh"))
    // distinct-doc count per gram = Σ multiplicity over the classes
    // containing it (count_distinct(doc_id) in clone-expanded terms:
    // every member of a class containing the gram is a distinct doc)
    val dup = occ.select(col("k_"), col("m"), col("gh")).distinct()
      .groupBy("gh")
      .agg(sum(col("m")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select("gh")
    val cov = occ.join(dup, Seq("gh"), "left_semi")
      .select(col("k_"),
        explode(sequence(col("start"), col("start") + (k - 1))).as("p"))
      .groupBy("k_")
      .agg(array_sort(collect_set(col("p"))).as("cov"))
    // A maximal excised span starts wherever the sorted covered set
    // breaks contiguity; `when` keeps element_at off index 0 (ANSI).
    val nSpans = size(filter(sequence(lit(1), size(col("cov"))),
      i => when(i === 1, lit(true))
        .otherwise(element_at(col("cov"), i) =!=
          element_at(col("cov"), i - 1) + 1)))
    val clean = concat_ws(" ",
      filter(col("ws"), (t, i) => !array_contains(col("cov"), i + 1)))
    classes.join(cov, Seq("k_"))
      .select(col("k_"),
        size(col("ws")).cast(LongType).as("n_tokens"),
        size(col("cov")).cast(LongType).as("n_removed"),
        nSpans.cast(LongType).as("n_spans"),
        md5(clean).as("clean_hash"))
  }

  // ---------------------------------------------------------------- //
  // Source-level curation (domain/URL-level filtering)
  // ---------------------------------------------------------------- //

  /** Sources whose internal near-duplicate share exceeds this are
    * dropped wholesale — the RefinedWeb/C4 domain-blocklist move:
    * a domain that mostly republishes is cheaper to cut at the source
    * level than doc-by-doc. Tuning direction: lower = stricter. */
  val MaxSourceDupRate = 0.2

  /** Sources must clear this mean quality score to be kept. */
  val MinSourceQuality = 0.5

  /** Source-level curation verdicts (the domain-level filtering pass of
    * a web-scale pipeline): per `source`, aggregate the exact-dedup
    * duplicate share (bag-of-words hash seen ≥ 2× corpus-WIDE — cross-
    * source republishing counts against both sources) and the mean
    * heuristic quality score, and emit a keep/drop verdict from the
    * ROUNDED aggregates (so the verdict is cross-engine stable).
    * Whole-source drops are the cheapest unit of curation: one verdict
    * row prunes every future scan of that source's partition.
    *
    * Scale shape: one map-side-combinable groupBy on the 128-bit bow
    * hash (the [[TextOps.exactDedup]] shuffle), one key-partitioned
    * join of docs against their hash counts (never all-pairs), then a
    * tiny per-source aggregate (output = |sources| rows). Per-doc
    * quality is a pure map; the per-source mean sums 6-dp decimals
    * exactly, immune to shuffle order.
    */
  def sourceCuration(spark: SparkSession, dir: String): DataFrame =
    sourceCurationFrom(docsDistributed(spark, dir))

  /** Same over any (doc_id, source, text) frame — lets specs plant
    * republishing sources. */
  private[graft] def sourceCurationFrom(docsDf: DataFrame): DataFrame = {
    val d = docsDf.select(
      col("doc_id"), col("source"),
      TextOps.bowHash.as("bh"),
      TextOps.qualityScoreOf(col("text")).cast("decimal(20,6)").as("q"),
      size(toks).cast(LongType).as("nt"))
    val counts = d.groupBy("bh").agg(count(lit(1)).as("n"))
    val agg = d.join(counts, Seq("bh"))
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n") >= 2, 1L).otherwise(0L)).as("dup_docs"),
        sum(col("q")).as("qsum"),
        sum(col("nt")).as("tok_sum"))
    val r = agg.select(
        col("source"), col("n_docs"), col("dup_docs"),
        F.roundHalfUp(col("dup_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("dup_rate"),
        F.avgFromSums(col("qsum"), col("n_docs")).as("mean_quality"),
        F.roundHalfUp(col("tok_sum").cast("double") /
          col("n_docs").cast("double"), 4).as("mean_tokens"))
      .withColumn("keep",
        col("dup_rate") <= MaxSourceDupRate &&
          col("mean_quality") >= MinSourceQuality)
    Out.sorted(r)(col("source"))
  }

  // ---------------------------------------------------------------- //
  // Data-mixture weights + deterministic resampling
  // ---------------------------------------------------------------- //

  /** Mixture temperature exponent α = 1/2: group weight ∝ tokens^α.
    * Chosen as the one non-trivial temperature whose power function
    * (sqrt) is IEEE-correctly-rounded on every engine — the standard
    * low-resource-upweighting shape (multilingual LM sampling à la
    * XLM-R's α≈0.3–0.7) with a cross-engine-exact gate.
    */
  val MixtureAlpha = 0.5

  /** Per-language data-mixture weights: token share under temperature
    * [[MixtureAlpha]] — `w_g = tokens_g^α / Σ tokens^α` — plus the
    * effective epochs per group (`w_g · T / tokens_g`: how many times
    * the group's data is seen in one pass of the mixed stream).
    * Tiny-output global aggregate: one map-side-combinable groupBy,
    * then a broadcast of the 5-row totals frame.
    *
    * Determinism: sqrt is exactly rounded per IEEE-754 on both engines;
    * each group's sqrt is rounded to 6 dp and summed as an exact
    * decimal, so the denominator is bit-identical cross-engine.
    */
  def mixtureWeights(spark: SparkSession, dir: String): DataFrame =
    Out.sorted(mixtureFrame(spark, dir).select(
      col("lang"), col("n_docs"), col("n_tokens"), col("raw_share"),
      col("mix_weight"), col("epochs")))(col("lang"))

  /** Shared (lang, n_docs, n_tokens, raw_share, mix_weight, epochs)
    * frame of [[mixtureWeights]] and [[mixtureResample]].
    */
  private def mixtureFrame(spark: SparkSession, dir: String): DataFrame = {
    val perLang = docs(spark, dir)
      .select(col("lang"), size(toks).cast(LongType).as("n_toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
      .withColumn("sq",
        F.roundHalfUp(sqrt(col("n_tokens").cast("double")), 6)
          .cast("decimal(20,6)"))
    val totals = perLang.agg(
      sum(col("n_tokens")).as("total_tokens"),
      sum(col("sq")).as("total_sq"))
    perLang.crossJoin(broadcast(totals))
      .withColumn("raw_share",
        F.roundHalfUp(col("n_tokens").cast("double") /
          col("total_tokens").cast("double"), 6))
      .withColumn("mix_weight",
        F.roundHalfUp(col("sq").cast("double") /
          col("total_sq").cast("double"), 6))
      .withColumn("epochs",
        F.roundHalfUp(col("mix_weight") * col("total_tokens").cast("double") /
          col("n_tokens").cast("double"), 4))
  }

  /** Deterministic resampling to the [[mixtureWeights]] mixture: every
    * document gets `floor(epochs_g)` guaranteed copies plus one more
    * iff its md5 bucket (0..255, the [[TextOps.hashSample]] key) falls
    * below the rounded fractional acceptance threshold — i.e. epochs
    * 1.3 means every doc appears once and a deterministic ~30% slice
    * appears twice. Pure key function: reproducible across runs,
    * engines and reshards, no shuffle beyond the 5-row weight
    * broadcast; the classic upsample-low-resource / downsample-
    * high-resource mixture materializer.
    */
  def mixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val weights = mixtureFrame(spark, dir)
      .select(col("lang"), col("epochs"))
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
      .cast("int")
    val base = floor(col("epochs")).cast(LongType)
    val thr = floor((col("epochs") - floor(col("epochs"))) * 256 + 0.5)
      .cast("int")
    val r = docs(spark, dir)
      .join(broadcast(weights), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("epochs"),
        (base + when(bucket < thr, 1L).otherwise(0L)).as("n_copies"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // PII redaction
  // ---------------------------------------------------------------- //

  /** Regexes shared verbatim with the DuckDB oracle (kept to the
    * POSIX-class subset where Java regex and RE2 agree).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-555-[0-9]{4}"
  val IpRe = "10\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** The synthetic corpus contains no PII, so the operator plants it
    * deterministically (doc_id-keyed email / phone / IP suffixes —
    * the [[TextOps.langId]] derived-fixture convention: the oracle
    * replays the identical planting, so the hash-checked counts
    * measure real extraction, not vacuous zeros).
    */
  private def plantedText: Column = concat(
    col("text"),
    when(pmod(col("doc_id"), lit(7)) === 0,
      concat(lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(5)) === 0,
      concat(lit(" call +1-555-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      .otherwise(lit("")),
    when(pmod(col("doc_id"), lit(11)) === 0,
      concat(lit(" from 10."), pmod(col("doc_id"), lit(256)).cast("string"),
        lit("."), pmod(col("doc_id"), lit(200)).cast("string"),
        lit("."), pmod(col("doc_id"), lit(100)).cast("string")))
      .otherwise(lit("")))

  /** PII detection + redaction over the (planted) corpus: count and
    * mask emails, NANP test-range phone numbers and 10.x.x.x IPs,
    * emitting per-doc counts and the md5 of the redacted text. Pure
    * per-row regexp map — codegen'd `RegExpReplace`/`RegExpExtractAll`,
    * no shuffle at any scale. Replacement order (email → phone → IP)
    * is part of the contract: earlier masks can never create or
    * destroy later patterns ('<EMAIL>' matches none of them).
    */
  /** The masking expression itself: email → phone → IP, in an order
    * whose replacements can never create or destroy later patterns —
    * which is exactly what makes it IDEMPOTENT (CorpusOpsSpec pins
    * redact∘redact = redact on adversarial inputs). */
  private[graft] def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      IpRe, "<IP>")

  def piiRedact(spark: SparkSession, dir: String): DataFrame = {
    val redacted = redact(plantedText)
    val nEmails = size(regexp_extract_all(plantedText, lit(EmailRe), lit(0)))
    val nPhones = size(regexp_extract_all(plantedText, lit(PhoneRe), lit(0)))
    val nIps = size(regexp_extract_all(plantedText, lit(IpRe), lit(0)))
    val r = docsDistributed(spark, dir).select(
      col("doc_id"),
      nEmails.cast(LongType).as("n_emails"),
      nPhones.cast(LongType).as("n_phones"),
      nIps.cast(LongType).as("n_ips"),
      (nEmails + nPhones + nIps).cast(LongType).as("n_pii"),
      md5(redacted).as("redacted_hash"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // Naive-Bayes learned quality filter
  // ---------------------------------------------------------------- //

  /** Learned quality filter, fastText-classifier shape: train a
    * unigram Naive Bayes on the corpus against an above-corpus-median
    * [[TextOps.qualityScores]] heuristic score as the (pseudo-)label,
    * score
    * every document with the summed log-likelihood ratio plus the
    * class prior, and report the confusion matrix of heuristic label ×
    * learned prediction with per-cell mean scores. This is the
    * standard bootstrap for a learned filter (seed labels from a
    * heuristic, train, inspect agreement) — the whole train+apply
    * cycle as one declarative plan.
    *
    * Scale shape: training is two map-side-combinable groupBys ((doc,
    * token) counts → per-class token counts = a vocab-sized model
    * frame); scoring is one join of the (doc, token) frame against the
    * model and a per-doc sum. No driver-side state — the "model" is a
    * DataFrame.
    *
    * Determinism: each token's log-likelihood ratio is log2 of a ratio
    * of exact-integer-valued doubles (Laplace-smoothed counts), rounded
    * to 6 dp and summed as an exact decimal — the
    * [[TextOps.surprisalScores]] recipe.
    */
  def nbQualityFilter(spark: SparkSession, dir: String): DataFrame =
    nbQualityFilterOn(docsDistributed(spark, dir))

  /** Testable core of [[nbQualityFilter]] over any (doc_id, text)
    * frame — lets a spec plant a degenerate corpus (e.g. all docs tied
    * at the median → single-class labels) and assert the smoothed
    * prior keeps the plan total instead of dividing by zero.
    */
  private[graft] def nbQualityFilterOn(docsDf: DataFrame): DataFrame = {
    // Label = "above the corpus-median heuristic quality": two-class by
    // construction (the fixed 0.5 keep cut is single-class on this
    // corpus — every doc passes). Exact percentile over the 6-dp-rounded
    // scores; the interpolated midpoint is one IEEE mean of two rounded
    // doubles, identical in DuckDB's quantile_cont.
    val qdoc = docsDf
      .select(col("doc_id"), TextOps.qualityScore.as("q"), toks.as("ws"))
    val med = qdoc.agg(expr("percentile(q, 0.5D)").as("med"))
    val labeled = qdoc.crossJoin(broadcast(med))
      .select(col("doc_id"),
        (col("q") >= F.roundHalfUp(col("med"), 6)).as("label_keep"),
        col("ws"))
    val tokenRows = labeled
      .select(col("doc_id"), col("label_keep"), explode(col("ws")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "label_keep", "token")
      .agg(count(lit(1)).as("dcnt"))
    // Engineered feature tokens (fastText-style): the label is mostly a
    // function of length and type-token ratio, which unigram identity
    // over a SHARED vocabulary cannot encode — so each doc's bag also
    // carries a bucketed-length and a bucketed-TTR feature ('#' cannot
    // appear in a corpus word, so the feature space never collides).
    val n = size(col("ws")).cast("double")
    val featRows = labeled.select(col("doc_id"), col("label_keep"),
      array(
        concat(lit("#len"), floor(n / 10).cast("int").cast("string")),
        concat(lit("#ttr"), floor(
          size(array_distinct(col("ws"))).cast("double") / n * 10)
          .cast("int").cast("string"))).as("feats"))
      .select(col("doc_id"), col("label_keep"),
        explode(col("feats")).as("token"), lit(1L).as("dcnt"))
    val dt = tokenRows.unionByName(featRows)
    val classCounts = dt.groupBy("token").agg(
      sum(when(col("label_keep"), col("dcnt")).otherwise(0L)).as("c1"),
      sum(when(!col("label_keep"), col("dcnt")).otherwise(0L)).as("c0"))
    val voc = classCounts.agg(
      sum(col("c1")).as("n1"), sum(col("c0")).as("n0"),
      count(lit(1)).as("v"))
    val model = classCounts.crossJoin(broadcast(voc)).select(
      col("token"),
      F.roundHalfUp(
        log2(((col("c1") + 1) * (col("n0") + col("v"))).cast("double") /
          ((col("c0") + 1) * (col("n1") + col("v"))).cast("double")), 6)
        .cast("decimal(20,6)").as("llr"))
    // Laplace-smoothed class prior, matching the token counts: the
    // unsmoothed ratio divides by zero on a degenerate single-class
    // corpus (e.g. every doc tied at the median), where Spark yields
    // Infinity→null after the decimal cast while DuckDB errors the
    // cast — divergent failure modes. Smoothed, both engines compute
    // the same finite value on ANY corpus.
    val priors = labeled.agg(
      sum(when(col("label_keep"), 1L).otherwise(0L)).as("nd1"),
      sum(when(!col("label_keep"), 1L).otherwise(0L)).as("nd0"))
    val prior = F.roundHalfUp(
      log2((col("nd1") + 1).cast("double") / (col("nd0") + 1).cast("double")), 6)
      .cast("decimal(20,6)")
    val scored = dt.join(model, Seq("token"))
      .groupBy("doc_id", "label_keep")
      .agg(sum(col("dcnt") * col("llr")).as("sum_llr"))
      .crossJoin(broadcast(priors))
      .select(col("doc_id"), col("label_keep"),
        (col("sum_llr") + prior).as("score"))
    val cells = scored
      .withColumn("pred_keep", col("score") > 0)
      .groupBy("label_keep", "pred_keep")
      .agg(count(lit(1)).as("n_docs"),
        F.roundHalfUp(F.avgFromSums(sum(col("score")), count(lit(1))), 4)
          .as("mean_score"))
    Out.sorted(cells)(col("label_keep"), col("pred_keep"))
  }

  // ---------------------------------------------------------------- //
  // Quality-ranked selection under a token budget
  // ---------------------------------------------------------------- //

  /** Quality buckets for the distributed budget prefix sum: the shard
    * key is floor(quality · [[QualityBuckets]]) — derived from the
    * VALUE, so it is deterministic at any partitioning, and floor is
    * monotone, so (bucket desc, quality desc, doc_id) is exactly the
    * global (quality desc, doc_id) order. 100, not 10: the corpus
    * quality distribution concentrates in a ~0.4-wide band, so 10
    * buckets left 2-3 hot ones serializing the window stage (measured
    * at sf1: 8.9 s before, 1.9 s after on a targeted min-of-2 run;
    * the committed single-sample full-sweep BENCH_sf1.json shows
    * 5.3 s under sweep noise). */
  val QualityBuckets = 100

  /** "Train on the best documents up to a token budget" — the
    * selection step between scoring and packing in a curation
    * pipeline: rank the corpus by heuristic quality (scores rounded
    * BEFORE ranking, doc_id tie-break — the [[TextOps.docKeywords]]
    * determinism convention), prefix-sum token counts in that order,
    * and keep every document whose span starts inside the budget
    * (here: half the corpus tokens, computed in-query so the cut is
    * real at every scale). The straddling document is flagged
    * `is_cut` — log what was dropped, never truncate silently.
    *
    * Scale shape: the [[TextOps.docPacking]] TWO-PHASE prefix sum with
    * a value-derived shard — per-bucket running sums (shuffle on the
    * bucket key) plus a broadcast ≤[[QualityBuckets]]-row bucket-offset
    * frame. No corpus-sized single-task window; a skewed quality
    * distribution concentrates buckets, which bounds parallelism at
    * the occupied-bucket count for the window stage only — widen
    * [[QualityBuckets]] further if the distribution demands it.
    */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    // distributed read: quality score + token count are per-doc CPU
    // that a single-split scan serializes. Eager'd because THREE
    // consumers (local prefix, bucket offsets, total) sit above it —
    // the scoring pass would otherwise re-run per consumer (the frame
    // is four scalars per doc, safe to checkpoint at any corpus size
    // that fits a token-budget job)
    val base = Out.eager(docsDistributed(spark, dir).select(
      col("doc_id"), TextOps.qualityScore.as("q"),
      size(toks).cast(LongType).as("n_tokens"))
      .withColumn("bucket", floor(col("q") * QualityBuckets).cast("int")))
    val wLocal = Window.partitionBy("bucket")
      .orderBy(desc("q"), asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("local_start",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wBucket = Window.orderBy(desc("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("bucket").agg(sum(col("n_tokens")).as("bt"))
      .select(col("bucket"),
        coalesce(sum(col("bt")).over(wBucket), lit(0L)).as("bucket_offset"))
    val totals = base.agg(sum(col("n_tokens")).as("total"))
    val r = local.join(broadcast(offsets), Seq("bucket"))
      .crossJoin(broadcast(totals))
      .withColumn("cum_start", col("bucket_offset") + col("local_start"))
      .withColumn("budget", expr("total div 2"))
      .select(col("doc_id"), col("q").as("quality_score"), col("n_tokens"),
        col("cum_start"),
        (col("cum_start") < col("budget")).as("selected"),
        (col("cum_start") < col("budget") &&
          col("cum_start") + col("n_tokens") > col("budget")).as("is_cut"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // Winnowing fingerprints
  // ---------------------------------------------------------------- //

  /** Winnowing window size w: a fingerprint is selected from every
    * [[WinnowWindow]] consecutive k-gram hashes, giving the standard
    * guarantee that any shared run of w+k-1 tokens between two
    * documents shares at least one selected fingerprint.
    */
  val WinnowWindow = 4

  /** Winnowing document fingerprints (the MOSS local-fingerprinting
    * algorithm): hash every POSITIONAL word-3-gram, slide a
    * [[WinnowWindow]]-wide window over the hash sequence, select each
    * window's minimum, and emit the distinct selected set per doc
    * (size + canonical md5). Unlike [[TextOps.fingerprints]]'
    * single min-shingle, the selected-set density tracks document
    * length, so overlap between fingerprint sets localizes SHARED
    * PASSAGES — the plagiarism / near-exact-reuse detector that
    * complements whole-document MinHash. Pure per-row array HOFs, no
    * shuffle; docs shorter than one window still yield one fingerprint
    * (min of all grams), matching the algorithm's ≥1 guarantee.
    */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val fps = array_sort(array_distinct(col("wins")))
    val r = winnowBase(spark, dir)
      .select(col("doc_id"),
        size(col("hs")).cast(LongType).as("n_grams"),
        size(array_distinct(col("wins"))).cast(LongType)
          .as("n_fingerprints"),
        md5(concat_ws(",", transform(fps, x => x.cast("string"))))
          .as("fp_hash"))
    Out.sorted(r)(col("doc_id"))
  }

  /** (doc_id, hs = positional gram hashes, wins = selected window
    * minima) — the shared core of [[winnowFingerprints]] and
    * [[sharedPassages]].
    */
  private[graft] def winnowBase(spark: SparkSession, dir: String): DataFrame =
    winnowBaseFrom(docsDistributed(spark, dir))

  /** Same over any (doc_id, text) frame — lets specs feed constructed
    * corpora to pin the winnowing guarantee on the engine itself. */
  private[graft] def winnowBaseFrom(d: DataFrame): DataFrame = {
    val ws = col("ws")
    val grams = transform(sequence(lit(1), size(ws) - 2), i =>
      conv(substring(md5(concat_ws(" ",
        element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))),
        1, 8), 16, 10).cast(LongType))
    val m = size(col("hs"))
    val wins =
      when(m >= WinnowWindow,
        transform(sequence(lit(1), m - (WinnowWindow - 1)),
          j => array_min(slice(col("hs"), j, lit(WinnowWindow)))))
        .when(m >= 1, array(array_min(col("hs"))))
        .otherwise(array().cast("array<bigint>"))
    d.select(col("doc_id"), toks.as("ws"))
      .select(col("doc_id"), when(size(ws) >= 3, grams)
        .otherwise(array().cast("array<bigint>")).as("hs"))
      .select(col("doc_id"), col("hs"), wins.as("wins"))
  }

  /** Document-frequency cap on the shared-passage fingerprint index: a
    * fingerprint present in more than this many documents is template
    * boilerplate, not a shared passage, and would make the self-join
    * quadratic on one key (the [[TextOps.MaxBandFrequency]] argument).
    */
  val MaxFpDf = 50

  /** Minimum shared fingerprints for a reported passage-sharing pair —
    * one coincidental window minimum collision shouldn't report. */
  val MinSharedFp = 3

  /** Cross-document shared-passage pairs over the winnowing index (the
    * MOSS match step): build the df-capped inverted fingerprint index,
    * self-join it on the fingerprint, and report pairs sharing at
    * least [[MinSharedFp]] selected fingerprints with their containment
    * score (shared / smaller fingerprint set). Winnowing's guarantee
    * makes this a PASSAGE detector: any shared token run of length ≥
    * [[WinnowWindow]]+2 contributes at least one shared fingerprint —
    * localized reuse that whole-document MinHash dilutes away.
    *
    * Scale shape: identical to [[TextOps.ngramJaccardNearDup]] — the
    * inverted index is the materialized frame, candidates come only
    * from index buckets (never all-pairs), and the df cap bounds every
    * bucket's pair fan-out.
    */
  def sharedPassages(spark: SparkSession, dir: String): DataFrame = {
    val kept = Out.eager(winnowBase(spark, dir)
      .select(col("doc_id"), explode_outer(array_distinct(col("wins"))).as("fp"))
      .filter(col("fp").isNotNull)
      .withColumn("df", count(lit(1)).over(Window.partitionBy("fp")))
      .filter(col("df") <= MaxFpDf))
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val joinable = kept.filter(col("df") >= 2).select("doc_id", "fp")
    val inter = joinable.as("x").join(joinable.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MinSharedFp)
    val r = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        F.roundHalfUp(col("n_shared").cast("double") /
          least(col("na"), col("nb")).cast("double"), 6).as("containment"))
    Out.sorted(r)(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------------------- //
  // BM25 retrieval (sparse lexical top-k over the inverted index)
  // ---------------------------------------------------------------- //

  /** Documents whose TF-IDF keywords seed a retrieval query. */
  val Bm25Queries = 10

  /** Results returned per query. */
  val Bm25TopK = 5

  /** Okapi BM25 term-saturation / length-normalization constants (the
    * Robertson–Walker defaults every IR stack ships).
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 "more-like-this" retrieval: each of the first [[Bm25Queries]]
    * documents contributes its [[TextOps.KeywordsPerDoc]] top TF-IDF
    * keywords as a bag-of-terms query; every OTHER document is scored
    * with Okapi BM25 (Lucene's +1-inside-the-log idf, so scores stay
    * positive for df > n/2) and the [[Bm25TopK]] best per query are
    * returned with ranks. This is the sparse half of a retrieval stack
    * — decontamination lookups, hard-negative mining, eval retrieval —
    * expressed as one declarative plan over the same (doc, token, tf)
    * frame the keyword/surprisal operators share.
    *
    * Scale shape: the query-term frame is Bm25Queries×KeywordsPerDoc
    * rows — BROADCAST, so the posting-list "inverted index probe" is a
    * broadcast semi-join that prunes the corpus to matching postings
    * before anything shuffles; per-doc length rides along from the
    * explode (no separate dl join), and the only shuffles are the
    * map-side-combinable tf/df groupBys plus one (q_id, doc_id)
    * aggregation over matched postings. No all-pairs scoring anywhere.
    *
    * Determinism: idf and each per-term contribution are rounded to
    * 6 dp and summed as exact decimals (the [[TextOps.surprisalScores]]
    * recipe); avgdl is one IEEE division of two exact integers; ranks
    * break ties on doc_id bytes. The oracle mirrors the identical
    * expression shapes, never refactored constants.
    */
  def bm25MoreLikeThis(spark: SparkSession, dir: String): DataFrame =
    bm25MoreLikeThisOn(docsDistributed(spark, dir))

  /** Testable core of [[bm25MoreLikeThis]] over any (doc_id, text)
    * frame — lets a spec plant a corpus where the expected ranking is
    * computable by hand (term saturation, length normalization).
    */
  private[graft] def bm25MoreLikeThisOn(docsDf: DataFrame): DataFrame = {
    val nz = filter(toks, t => t =!= "")
    // dl carried through the explode: at 100 TB a (doc -> length) join
    // would shuffle the corpus a second time for a per-row scalar.
    val dt = Out.eager(docsDf
      .select(col("doc_id"), size(nz).cast("long").as("dl"),
        explode(nz).as("token"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl")))
    val dft = dt.groupBy("token").agg(count(lit(1)).as("df"))
    val stats = Out.eager(dt.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")))
    // Query terms: the q_doc_keywords ranking restricted to the query
    // docs, idf attached here so the probe join carries everything.
    val kwScore = F.roundHalfUp(
      col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
    val idf = F.roundHalfUp(
      log(((col("n_docs") - col("df")).cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)) + lit(1.0)), 6)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("token").asc)
    val qterms = dt.filter(col("doc_id") < Bm25Queries)
      .join(dft, Seq("token")).crossJoin(broadcast(stats))
      .select(col("doc_id").as("q_id"), col("token"),
        kwScore.as("score"), idf.as("idf"))
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= TextOps.KeywordsPerDoc)
      .select(col("q_id"), col("token"), col("idf"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val contrib = F.roundHalfUp(
      col("idf") * (col("tf").cast("double") * (lit(Bm25K1) + lit(1.0))) /
        (col("tf").cast("double") + lit(Bm25K1) * (lit(1.0) - lit(Bm25B)) +
          lit(Bm25K1) * lit(Bm25B) * (col("dl").cast("double") / avgdl)), 6)
      .cast("decimal(20,6)")
    val scored = dt.join(broadcast(qterms), Seq("token"))
      .filter(col("doc_id") =!= col("q_id"))
      .crossJoin(broadcast(stats))
      .groupBy("q_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(contrib).as("bm25"))
    val rw = Window.partitionBy(col("q_id"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
    val r = scored.withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= Bm25TopK)
      // rank on the exact decimal; emit double (6-dp sums are far below
      // 2^53, so the cast is lossless and duck-identical)
      .select(col("q_id"), col("rank"), col("doc_id"), col("n_terms"),
        col("bm25").cast("double").as("bm25"))
    Out.sorted(r)(col("q_id"), col("rank"))
  }

  /** Reciprocal-rank-fusion constant (the standard k=60 of the original
    * Cormack/Clarke/Buettcher formulation).
    */
  val RrfK = 60

  /** Results returned per query by [[hybridRrf]]. */
  val HybridTopK = 5

  /** Hybrid dense+sparse retrieval: the [[bm25MoreLikeThis]] lexical
    * ranks and the [[VectorOps.annBruteForce]] cosine ranks for the
    * shared query ids (< [[VectorOps.NQueries]], where doc_id and
    * vec_id name the same item) fused by reciprocal-rank fusion —
    * score = Σ_channels 1/(k + rank). RRF is the standard zero-tuning
    * fusion for heterogeneous retrievers (no score normalization
    * across channels, only ranks), which is exactly what makes it
    * oracle-friendly: each contribution is one 6-dp-rounded rational
    * summed as exact decimals.
    *
    * Scale shape: both inputs are already top-k frames (queries × k
    * rows — broadcast-sized regardless of corpus scale); the fusion
    * itself is a full outer join plus a per-query window on a frame
    * whose size is bounded by the channel count, not the corpus.
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val dense = VectorOps.annBruteForce(spark, dir)
      .select(col("q_id"), col("neighbor_id").as("id"),
        col("rank").as("dense_rank"))
    val sparse = bm25MoreLikeThis(spark, dir)
      .filter(col("q_id") < VectorOps.NQueries)
      .select(col("q_id"), col("doc_id").as("id"),
        col("rank").as("sparse_rank"))
    def contrib(r: Column): Column =
      when(r.isNotNull,
        F.roundHalfUp(lit(1.0) / (lit(RrfK.toDouble) + r.cast("double")), 6)
          .cast("decimal(20,6)"))
      .otherwise(lit(0).cast("decimal(20,6)"))
    val fused = dense.join(sparse, Seq("q_id", "id"), "full_outer")
      .select(col("q_id"), col("id"), col("dense_rank"), col("sparse_rank"),
        (contrib(col("dense_rank")) + contrib(col("sparse_rank"))).as("rrf"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("id").asc)
    val r = fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= HybridTopK)
      .select(col("q_id"), col("rank"), col("id"),
        col("dense_rank"), col("sparse_rank"),
        col("rrf").cast("double").as("rrf"))
    Out.sorted(r)(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- //
  // DSIR — data selection via importance resampling
  // ---------------------------------------------------------------- //

  /** Hashed-feature space size for [[dsirWeights]]. 2^9 buckets keeps
    * the bucket model broadcast-trivial; real deployments use 10^4–10^5
    * buckets — the plan is identical, only this literal changes. */
  val DsirBuckets = 512L

  /** The "target domain" standing in for DSIR's curated corpus
    * (Wikipedia+books in the paper): a fixed source whitelist. */
  val DsirTargetSources: Seq[String] = (1 to 5).map(i => s"src$i")

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): fit two bag-of-
    * hashed-bigrams unigram models — one on the target domain, one on
    * the full raw corpus — and score every document by
    * Σ_features log₂ p̂_target(f) − log₂ p̂_raw(f) (add-one smoothed).
    * Positive weight = the document looks more like the curated domain
    * than like the raw pool; DSIR then samples the raw corpus with
    * probability ∝ exp of this weight. The threshold form emitted here
    * (`more_target_like`) is the scale-correct selection: a per-row
    * predicate, not a global rank.
    *
    * Scale shape: ONE aggregation pass over the exploded bigrams
    * builds the per-(doc, bucket) counts; both models and their totals
    * derive from that frame (no second corpus scan); the bucket model
    * is [[DsirBuckets]] rows — broadcast — so scoring is a map-side
    * join + one partial-aggregated groupBy on doc_id. Per-bucket
    * log-ratios are rounded at 6 dp and fixed to DECIMAL so the
    * per-doc weighted sum is exact and shuffle-order-immune; the
    * selection predicate compares the EXACT decimal against zero.
    */
  def dsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val nz = filter(toks, t => t =!= "")
    val n1 = greatest(size(nz) - 1, lit(0))
    val bg = zip_with(
      slice(nz, lit(1), n1), slice(nz, lit(2), n1),
      (a, b) => concat(a, lit(" "), b))
    val bucket = conv(substring(md5(col("bigram")), 1, 15), 16, 10)
      .cast(LongType) % DsirBuckets
    val isTarget = col("source").isin(DsirTargetSources: _*)
    val pb = Out.eager(docsDistributed(spark, dir)
      .select(col("doc_id"), col("source"), explode(bg).as("bigram"))
      .select(col("doc_id"), col("source"), bucket.as("bucket"))
      .groupBy("doc_id", "source", "bucket")
      .agg(count(lit(1)).as("dcnt")))
    val raw = pb.groupBy("bucket").agg(sum(col("dcnt")).as("raw_cnt"))
    val tgt = pb.filter(isTarget)
      .groupBy("bucket").agg(sum(col("dcnt")).as("tgt_cnt"))
    val totals = pb.agg(
      sum(col("dcnt")).as("rawn"),
      coalesce(sum(when(isTarget, col("dcnt"))), lit(0L)).as("tgtn"))
    val lr = F.roundHalfUp(
      log2((coalesce(col("tgt_cnt"), lit(0L)) + 1L).cast("double") /
        (col("tgtn") + DsirBuckets).cast("double")) -
      log2((col("raw_cnt") + 1L).cast("double") /
        (col("rawn") + DsirBuckets).cast("double")), 6)
      .cast("decimal(20,6)")
    val model = raw
      .join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"), lr.as("lr"))
    val agg = pb
      .join(broadcast(model), Seq("bucket"))
      .groupBy("doc_id", "source").agg(
        sum(col("dcnt")).as("n_bigrams"),
        sum(col("dcnt") * col("lr")).as("wdec"))
    val r = agg.select(col("doc_id"), isTarget.as("is_target"),
      col("n_bigrams"),
      F.roundHalfUp(col("wdec").cast("double"), 4).as("dsir_weight"),
      (col("wdec") > lit(0).cast("decimal(20,6)")).as("more_target_like"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // Weighted sampling without replacement (A-ES)
  // ---------------------------------------------------------------- //

  /** Sample size for [[weightedSample]]. */
  val WeightedSampleK = 50

  /** Weighted sampling without replacement, Efraimidis–Spirakis: each
    * document draws a deterministic md5 uniform u ∈ (0, 1] and the
    * [[WeightedSampleK]] largest keys u^(1/w) win (w = n_chars, so
    * longer documents are proportionally likelier — the
    * token-weighted corpus sample a mixture builder wants). The key is
    * computed as ln(u)/w — the same ordering as u^(1/w) through the
    * monotone exp, but numerically spread instead of crowding against
    * 1.0 where 6-dp rounding would tie everything.
    *
    * Scale shape: one map pass computes keys; the global top-k runs as
    * TakeOrderedAndProject — per-partition k-heaps merged on the
    * driver, k rows moved, NO global sort of the corpus. Deterministic
    * on any cluster: u is a pure function of doc_id, ties break by
    * doc_id. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast(LongType)
    // (h+1)/2^52: 13 hex chars are 52 bits, +1 keeps u in (0, 1]
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0)
    val key = F.roundHalfUp(log(u) / col("n_chars").cast("double"), 8)
    val top = docs(spark, dir)
      .filter(col("n_chars") > 0L)
      .select(col("doc_id"), col("n_chars").as("weight"), key.as("es_key"))
      .orderBy(col("es_key").desc, col("doc_id").asc)
      .limit(WeightedSampleK)
    // rank window runs over the k-row result only (bounded frame)
    val w = Window.orderBy(col("es_key").desc, col("doc_id").asc)
    val r = top.withColumn("rank", row_number().over(w))
    Out.sorted(r)(col("rank"))
  }

  // ---------------------------------------------------------------- //
  // CCNet perplexity buckets
  // ---------------------------------------------------------------- //

  /** CCNet's head/middle/tail split: documents bucketed into thirds of
    * the corpus by LM score (here [[TextOps.bigramSurprisal]]'s mean
    * bigram surprisal — lowest third = "head", the best text). CCNet
    * computes the tertile cut-points over the corpus score
    * distribution; an exact global percentile would need a total sort,
    * so this uses the scale-correct histogram-quantile: scores land in
    * fixed-width 0.1-bit bins, the tertile boundary is resolved at bin
    * granularity from the bin counts (a ~200-row frame — the bounded-
    * window exception), and each document inherits its bin's bucket
    * via a broadcast join. All boundary arithmetic is integer
    * (3·cum ≤ total), so the split is exact and engine-independent.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = Out.eager(TextOps.bigramSurprisal(spark, dir)
      .select(col("doc_id"), col("mean_bigram_surprisal").as("score"))
      .withColumn("bin", floor(col("score") * 10).cast(LongType)))
    val bc = scored.groupBy("bin").agg(count(lit(1)).as("n"))
    val tot = scored.agg(count(lit(1)).as("tot"))
    val wcum = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lbl = bc.withColumn("c", sum(col("n")).over(wcum))
      .crossJoin(broadcast(tot))
      .select(col("bin"),
        when(col("c") * 3 <= col("tot"), "head")
          .when(col("c") * 3 <= col("tot") * 2, "middle")
          .otherwise("tail").as("bucket"))
    val r = scored.join(broadcast(lbl), Seq("bin"))
      .select(col("doc_id"), col("score"), col("bin"), col("bucket"))
    Out.sorted(r)(col("doc_id"))
  }

  // ---------------------------------------------------------------- //
  // Contrastive triplet mining
  // ---------------------------------------------------------------- //

  /** Bucket count for the deterministic negative pick in
    * [[contrastiveTriplets]]. */
  val TripletNegBuckets = 64L

  /** Training triplets (anchor, positive, negative) for embedding-model
    * training: positives are the banded-MinHash near-dup pairs (two
    * texts that SHOULD embed close), negatives a deterministic
    * pseudo-random corpus document (text that should embed far). The
    * triplet-loss data-prep stage of an E5/SBERT-style pipeline.
    *
    * Scale shape: positives come from [[TextOps.minhashNearDup]] —
    * banded LSH, never an all-pairs product. Negatives avoid the other
    * classic blowup (per-anchor corpus sampling = anchors × corpus):
    * the corpus collapses to a [[TripletNegBuckets]]-row exemplar
    * table (two lowest-md5 docs per md5 bucket — broadcast), each
    * anchor hashes to a bucket and takes the first exemplar that
    * collides with neither triplet member. Fully deterministic: same
    * corpus → same triplets on any cluster, any shuffle order.
    */
  def contrastiveTriplets(spark: SparkSession, dir: String): DataFrame = {
    val b = TripletNegBuckets
    val pos = TextOps.minhashNearDup(spark, dir)
    val d = docs(spark, dir).select(col("doc_id"))
      .withColumn("h", md5(col("doc_id").cast("string")))
      .withColumn("bucket",
        conv(substring(col("h"), 1, 15), 16, 10).cast(LongType) % b)
    val w = Window.partitionBy("bucket").orderBy(col("h"), col("doc_id"))
    val ex = d.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
      .groupBy("bucket").agg(
        min(when(col("rk") === 1, col("doc_id"))).as("ex1"),
        min(when(col("rk") === 2, col("doc_id"))).as("ex2"))
    val negBucket = conv(
      substring(md5(concat(lit("neg"), col("doc_a").cast("string"))), 1, 15),
      16, 10).cast(LongType) % b
    val r = pos.withColumn("bucket", negBucket)
      .join(broadcast(ex), Seq("bucket"))
      .select(col("doc_a").as("anchor_id"), col("doc_b").as("positive_id"),
        when(col("ex1") =!= col("doc_a") && col("ex1") =!= col("doc_b"),
          col("ex1"))
          .when(col("ex2") =!= col("doc_a") && col("ex2") =!= col("doc_b"),
            col("ex2"))
          .as("negative_id"),
        col("jaccard").as("pos_jaccard"))
      .filter(col("negative_id").isNotNull)
    Out.sorted(r)(col("anchor_id"), col("positive_id"))
  }
}
