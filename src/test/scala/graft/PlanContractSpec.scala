package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Physical-plan contracts — the properties that make these plans hold
  * at 100 TB, asserted against the actual executed plan text so a
  * refactor cannot silently regress them:
  *   - filters and column selection reach the parquet scan
  *     (PushedFilters / pruned ReadSchema);
  *   - dimension joins broadcast (no fact-table shuffle for lookups);
  *   - the hot paths stay inside whole-stage codegen.
  */
class PlanContractSpec extends AnyFunSuite {
  private lazy val spark = SparkT.spark

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE to finalize
    df.queryExecution.executedPlan.toString
  }

  test("filter + projection push into the parquet scan") {
    val df = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .filter(col("l_returnflag") === "A")
      .select("l_partkey", "l_quantity")
    val plan = planOf(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,A)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_partkey:bigint,l_quantity:double,l_returnflag:string>"),
      s"columns not pruned:\n$plan")
  }

  test("dimension joins broadcast; no shuffle of the fact side for lookups") {
    val plan = planOf(Relational.marginBySku(spark, SparkT.Sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"dimension join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected sort-merge join:\n$plan")
  }

  test("aggregation pipeline: whole-stage codegen, hash agg, map-side combine") {
    val plan = planOf(Relational.pricingSummary(spark, SparkT.Sf0001))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan text
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    assert(plan.contains("HashAggregate"), s"not hash-aggregated:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side partial aggregation:\n$plan")
  }

  test("bot-flag pipeline is window-based: no self-join, single agg chain") {
    val plan = planOf(Relational.botFlags(spark, SparkT.Sf0001))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"aggregate-rejoin shape crept back in:\n$plan")
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"),
      s"expected window aggregates:\n$plan")
  }

  test("cms sketch build combines map-side: partial_count before the exchange") {
    val keys = Tables.load(spark, SparkT.Sf0001, "lineitem")
      .select(col("l_partkey").as("key"))
    val plan = planOf(operators.Sketches.cmsCells(keys))
    assert(plan.contains("partial_count"),
      s"sketch build must combine map-side (fixed cells per mapper):\n$plan")
    assert(plan.contains("HashAggregate"), s"not hash-aggregated:\n$plan")
  }

  test("xlsx ingest: per-file parallel parse, no exchange before the flatMap") {
    val df = graft.sources.Excel.readXlsx(spark, s"${operators.Ingestion.FixturesDir}/xlsx/*rders*.xlsx")
    val plan = planOf(df)
    // the parse stage must consume the binaryFile scan directly — an
    // exchange here would funnel whole workbooks through a shuffle
    assert(!plan.contains("Exchange"), s"unexpected shuffle in the xlsx scan:\n$plan")
  }

  test("minhash consumers scan the materialized signature table, not documents") {
    // first touch builds the bucketed table; the consumers' OWN plans
    // must then read it instead of re-deriving signatures from the
    // corpus — the warehouse pattern for a shared 100 TB LSH index
    operators.TextOps.signatureTable(spark, SparkT.Sf0001)
    val consumers = Seq(
      "band stats" -> operators.TextOps.minhashBandStats(spark, SparkT.Sf0001),
      "near-dup pairs" -> operators.TextOps.minhashNearDup(spark, SparkT.Sf0001))
    for ((label, df) <- consumers) {
      val files = df.inputFiles
      assert(files.nonEmpty && files.forall(_.contains("graft_minhash_sig_")),
        s"$label must scan only the signature table, got: ${files.mkString(", ")}")
    }
  }

  test("offers fallback: priority filter and merge reuse one shuffle by product key") {
    val plan = planOf(operators.Parsing.offersWithFallback(spark, SparkT.Sf0001))
    // min-priority window partitions by product_id; the merge groupBy is
    // (product_id, seller_key) — count the data exchanges stays bounded
    // (window + final agg + terminal sort), i.e. no accidental extra
    // repartitions of the offer rows
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 2, s"more exchanges than window+agg need:\n$plan")
    assert(plan.contains("Window"), s"expected min-priority window:\n$plan")
  }

  test("shingle pipelines keep the heavy lambda off the scan-side filter") {
    // Regression guard for the InferFiltersFromGenerate pessimization:
    // a plain explode(shingles) gets an inferred size(shingles)>0
    // predicate that pushdown inlines (as array_distinct(transform(...)))
    // below the distribution exchange — 6 s of single-task CPU at sf0.1.
    // The builders filter on size(split)>=3 and use explode_outer, so no
    // Filter in the plan may contain the shingle-constructing lambda.
    for ((name, df) <- Seq(
        ("ngramJaccardNearDup",
          operators.TextOps.ngramJaccardNearDup(spark, SparkT.Sf0001)),
        ("decontamOverlap",
          operators.TextOps.decontamOverlap(spark, SparkT.Sf0001)))) {
      val plan = planOf(df)
      val heavyFilter = plan.linesIterator
        .filter(_.trim.startsWith("Filter "))
        .exists(l => l.contains("array_distinct(transform("))
      assert(!heavyFilter,
        s"$name: shingle lambda re-inlined into a pushed-down filter:\n$plan")
    }
  }

  test("typed top-k aggregator combines map-side: partial_ before the exchange") {
    val plan = planOf(operators.TopK.top3Agg(spark, SparkT.Sf0001))
    assert(plan.contains("ObjectHashAggregate"), s"not object-hash-aggregated:\n$plan")
    assert(plan.contains("partial_"), s"no map-side partial top-k:\n$plan")
  }

  test("PQ search: codebooks and query LUT broadcast; corpus codes never shuffle wide") {
    val plan = planOf(operators.VectorOps.annPq(spark, SparkT.Sf0001))
    assert(plan.contains("BroadcastHashJoin"),
      s"LUT join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"code table unexpectedly sort-merge joined:\n$plan")
  }

  test("incremental dedup: batch probes the signature table; hot-cap broadcast") {
    val df = operators.TextOps.incrementalDedup(spark, SparkT.Sf0001)
    // every in-plan file read is the materialized index — the batch
    // side enters as the checkpointed shingle frame (ExistingRDD), so
    // the raw corpus is never re-scanned by the probe itself
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("graft_minhash_sig_")),
      s"corpus side must scan only the signature table: ${files.mkString(", ")}")
    val plan = planOf(df)
    assert(plan.contains("ExistingRDD"),
      s"batch side must be the checkpointed shingle frame:\n$plan")
    assert("BroadcastHashJoin [^\n]*LeftAnti".r.findFirstIn(plan).isDefined,
      s"hot-band cap must be a broadcast anti-join:\n$plan")
  }

  test("date-partitioned layout: the month filter prunes to its directory") {
    val df = sources.SinkRoundTrips.partitionedRoundtrip(spark, SparkT.Sf0001)
    df.collect()
    // inputFiles reports the whole file index; pruning happens at the
    // scan node — assert on the executed scan's partition selection
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps materialized stages in QueryStageExec nodes that plain
    // collect() does not descend into — walk them explicitly
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      case q: QueryStageExec => scansOf(q.plan)
      case other => other.children.flatMap(scansOf)
    }
    val scans = scansOf(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, s"no file scan found:\n${df.queryExecution.executedPlan}")
    scans.foreach { s =>
      assert(s.partitionFilters.map(_.toString)
        .exists(_.contains(sources.SinkRoundTrips.PartitionMonth)),
        s"month predicate must be a partition filter: ${s.partitionFilters}")
      val parts = s.selectedPartitions
      assert(parts.partitionCount == 1 && parts.totalNumberOfFiles >= 1,
        s"scan must select exactly the one month directory, got ${parts.partitionCount}")
    }
  }

  test("quantile sketch: single-scan histogram pass, broadcast bounds") {
    val df = operators.Sketches.quantileSketch(spark, SparkT.Sf0001)
    val plan = planOf(df)
    // the 1-row min/max frame is checkpointed and BROADCAST to the
    // binning pass — the row side must never shuffle for it
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"bounds must broadcast to the binning pass:\n$plan")
    // pass-2 histogram: map-side partial count before its exchange
    assert(plan.contains("partial_count"),
      s"histogram groupBy must combine map-side:\n$plan")
    // the eager bounds frame enters the plan as a checkpointed RDD, so
    // the FINAL plan re-reads lineitem only for binning + exact truth —
    // three consumers of the bounds must NOT mean three more scans
    // (count in the final AQE section only; the toString also embeds
    // the pre-reuse initial plan)
    val finalSection = plan.split("== Initial Plan ==").head
    val scans = "Scan parquet".r.findAllIn(finalSection).length
    assert(scans <= 2, s"expected <= 2 final-plan lineitem scans, got $scans:\n$plan")
    assert(finalSection.contains("ExistingRDD"),
      s"bounds frame must be the checkpointed 1-row RDD:\n$plan")
  }

  test("pii redaction and winnowing are map-only: one explicit spread, no other exchange") {
    // verify-only terminal sort off BEFORE building: Out.sorted reads
    // the conf at plan-construction time, not at execution
    spark.conf.set("graft.sort.results", "false")
    try {
      for (df <- Seq(operators.CorpusOps.piiRedact(spark, SparkT.Sf0001),
                     operators.CorpusOps.winnowFingerprints(spark, SparkT.Sf0001))) {
        val plan = planOf(df)
        val finalSection = plan.split("== Initial Plan ==").head
        val exchanges = "Exchange".r.findAllIn(finalSection).length
        // exactly the deliberate doc_id spread (docsDistributed) — the
        // regexp / array-HOF pipeline itself must add no shuffle
        assert(exchanges == 1, s"expected only the explicit spread, got $exchanges:\n$plan")
        assert(finalSection.contains("*("), s"no codegen span:\n$plan")
      }
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("segment dedup: no joins — explode, one seg_hash window, one doc_id re-agg") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val plan = planOf(operators.CorpusOps.segmentDedup(spark, SparkT.Sf0001))
      val finalSection = plan.split("== Initial Plan ==").head
      assert(!finalSection.contains("Join"),
        s"segment dedup must not join — first-wins is a window:\n$plan")
      assert(finalSection.contains("Window"), s"expected the first-wins window:\n$plan")
      // corpus scanned once: explode → window → re-agg is one linear chain
      val scans = "Scan parquet".r.findAllIn(finalSection).length
      assert(scans == 1, s"expected a single documents scan, got $scans:\n$plan")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("token budget: corpus windows shard by bucket; only tiny frames single-partition") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val df = operators.CorpusOps.tokenBudget(spark, SparkT.Sf0001)
      val plan = planOf(df)
      val finalSection = plan.split("== Initial Plan ==").head
      // the corpus-side prefix window is sharded on the value-derived
      // quality bucket — never a single-task window over the corpus
      assert(finalSection.contains("windowspecdefinition(bucket"),
        s"data window must shard by bucket:\n$plan")
      // single-partition exchanges exist only for the <=QualityBuckets
      // offsets window and the 1-row totals aggregate
      val singles = "Exchange SinglePartition".r.findAllIn(finalSection).length
      assert(singles <= 2, s"corpus-sized single-partition stage crept in ($singles):\n$plan")
      // offsets and totals reach the corpus side as broadcasts
      assert(finalSection.contains("BroadcastHashJoin"),
        s"bucket offsets must broadcast:\n$plan")
      assert(finalSection.contains("BroadcastNestedLoopJoin"),
        s"totals must broadcast as the 1-row anchor:\n$plan")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("nb quality filter: scalar stats broadcast as 1-row anchors, no cartesian on data") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val plan = planOf(operators.CorpusOps.nbQualityFilter(spark, SparkT.Sf0001))
      val finalSection = plan.split("== Initial Plan ==").head
      // median / vocab totals / priors join the per-token frames as
      // broadcast 1-row anchors, never as a shuffle of the token side
      assert(finalSection.contains("BroadcastNestedLoopJoin"),
        s"scalar frames must broadcast:\n$plan")
      assert(!finalSection.contains("CartesianProduct"),
        s"cartesian product on data:\n$plan")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("window top-k: partial WindowGroupLimit discards below the exchange") {
    val plan = planOf(Relational.top3CheapestPerSku(spark, SparkT.Sf0001))
    // Spark 4 pushes rank()<=k map-side — the k·|keys| exchange bound
    // the TopK Aggregator hand-builds, free. If this ever stops firing
    // (plan edit, version change), TopK.scala's guidance flips; fail
    // loudly here.
    val partialIdx = plan.indexOf("WindowGroupLimit")
    assert(partialIdx >= 0 && plan.contains(", Partial"),
      s"no partial window-group-limit below the exchange:\n$plan")
  }

  test("near-dup banders run on the clone-collapsed frame") {
    spark.conf.set("graft.sort.results", "false")
    try {
      // Every near-dup bander must collapse exact clone groups to one
      // canonical BEFORE the band self-join (pair counts are quadratic
      // in clone multiplicity otherwise — the sf10 359 s lesson). The
      // collapse is the `doc_id = cdoc` canonical filter: the minhash
      // path reads cdoc as a STORED column of the signature table and
      // the simhash path from the eager'd one-pass membership map, so
      // `cdoc` appearing in the executed plan pins the pre-collapse in
      // place (the group KEY itself is amortized out of the per-query
      // plan by design — that was the 0.6 -> 2.9 s regression).
      val banders = Seq(
        "simhash" -> operators.TextOps.simhashNearDup(spark, SparkT.Sf0001),
        "simhash128" -> operators.TextOps.simhashNearDup128(spark, SparkT.Sf0001),
        "minhash" -> operators.TextOps.minhashNearDup(spark, SparkT.Sf0001))
      for ((name, df) <- banders) {
        val plan = planOf(df)
        assert(plan.contains("cdoc"),
          s"$name bander input is not the clone-collapsed frame:\n$plan")
      }
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("simhash band self-join: AQE reuses the fingerprint exchange at runtime") {
    spark.conf.set("graft.sort.results", "false")
    try {
      val plan = planOf(operators.TextOps.simhashNearDup(spark, SparkT.Sf0001))
      val finalSection = plan.split("== Initial Plan ==").head
      // the token-explode + 32-column aggregation subtree sits under both
      // join sides in the static plan; the executed plan must dedup it —
      // a missing ReusedExchange means the heaviest stage runs twice
      assert(finalSection.contains("ReusedExchange"),
        s"fingerprint exchange not reused across the self-join:\n$plan")
    } finally spark.conf.set("graft.sort.results", "true")
  }

  test("star rollup: region filter pushed to the dim scan, dims broadcast, no cross join") {
    val df = operators.Relational.starRevenue(spark, SparkT.Sf0001)
    val plan = planOf(df)
    assert(plan.contains("EqualTo(r_name,ASIA)"),
      s"region filter not pushed:\n$plan")
    // the nation and customer joints ride broadcasts at this SF — the
    // fact table is never shuffled for dimension lookups
    assert(plan.split("BroadcastHashJoin").length - 1 >= 2,
      s"dimension chain not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
  }

  test("SQL-surface near-dup: registered combinators inline (no UDF, codegen on)") {
    val df = operators.TextOps.minhashNearDupSql(spark, SparkT.Sf0001)
    val plan = planOf(df)
    // the registered functions must dissolve into built-in expressions —
    // a UDF / interpreted-eval node in the plan means the registry
    // builder stopped inlining
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF") &&
      !plan.contains("ColumnNodeExpression"), s"opaque function node:\n$plan")
    assert(plan.contains("*("), s"codegen lost:\n$plan") // codegen stage marker
    // band self-join is an equi-join on the band key, never a cross join
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
  }

  test("span removal: gram semi-join stays equi-keyed; dup-key agg combines map-side") {
    val plan = planOf(operators.CorpusOps.spanRemoval(spark, SparkT.Sf0001))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // the dup-gram doc count is partial_count on the collapsed fork and
    // partial_sum (of multiplicities) on the direct fork — either way
    // it must combine map-side before the gh exchange
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"dup-gram count not map-side combined:\n$plan")
    // the covered-position reassembly must not re-sort the corpus: the
    // only windows allowed are none — spans come from array expressions
    assert(!plan.contains("RunningWindowFunction"),
      s"unexpected window stage:\n$plan")
  }

  test("topic terms: per-cell top-k discards below the exchange (WindowGroupLimit)") {
    val plan = planOf(operators.VectorOps.topicTerms(spark, SparkT.Sf0001))
    assert(plan.contains("WindowGroupLimit"),
      s"top-k not group-limited:\n$plan")
    assert(plan.contains("Partial"),
      s"no partial (map-side) group limit:\n$plan")
  }

  test("knn graph: bucket join keeps its explicit partition count under AQE") {
    val df = operators.VectorOps.knnGraph(spark, SparkT.Sf0001)
    df.collect()
    // the candidate join ran at checkpoint time inside the builder; the
    // contract here is the RESULT plan stays equi-joined and windowed
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
    // the reciprocity check joins the k·n edge set against itself —
    // small enough that it must BROADCAST, never shuffle the edges wide
    assert(plan.contains("BroadcastHashJoin"),
      s"edge-set reciprocity join not broadcast:\n$plan")
  }

  test("embed outliers: edge aggregate combines map-side; corpus join stays equi") {
    val plan = planOf(operators.VectorOps.embedOutliers(spark, SparkT.Sf0001))
    assert(plan.contains("partial_count"),
      s"kNN-edge aggregate not map-side combined:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerate join:\n$plan")
  }

  test("ivf-pq rerank: nominee fetch broadcasts; the corpus is never shuffled") {
    val df = operators.VectorOps.annIvfPqRerank(spark, SparkT.Sf0001)
    val plan = planOf(df)
    // the R·|queries|-row nominee and query frames must broadcast into
    // the raw-vector scan — a shuffle of the corpus for the refine
    // stage would defeat the whole fetch-R-rows design
    assert(plan.contains("BroadcastHashJoin"),
      s"rerank joins not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus shuffled for the rerank:\n$plan")
    // (BroadcastNestedLoopJoin is expected upstream: the quantizer /
    // LUT cross joins broadcast fixed-size centroid frames by design)
    assert(!plan.contains("CartesianProduct"), s"degenerate join:\n$plan")
  }
}
