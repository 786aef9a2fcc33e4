package graft.queries

import graft.PlanTestUtils
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}

/** Plan-shape regression tests for the round-4 queries: the scale
  * properties value-level oracles can't see. Each assertion encodes a
  * deliberate design decision — if a refactor regresses it, correctness
  * stays green but the 100 TB story breaks, so it must fail here.
  *
  * Physical-plan assertions go through the formatted explain text
  * ([[graft.PlanTestUtils]]): under AQE, `executedPlan` is a leaf
  * wrapper and `collect` on it is vacuous. */
class PlanShapeSpec extends graft.streaming.SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def queries = graft.SparkEntry.queries

  test("a31 top supplier: max is a broadcast scalar, not a window over suppliers") {
    // The supplier cardinality is unbounded at scale; the max must never
    // plan as an unpartitioned Window over the revenue aggregate.
    val text = PlanTestUtils.formatted(
      queries("a31_top_supplier")(spark, sf).queryExecution)
    assert(!text.contains("Window"),
      s"a31 planned a Window; expected broadcast-scalar max:\n$text")
    assert(text.contains("BroadcastNestedLoopJoin") || text.contains("BroadcastExchange"),
      "a31 lost its broadcast-scalar max join")
  }

  test("a32 disjunctive revenue: quantity envelope reaches the lineitem scan") {
    val pushed = PlanTestUtils.scanPushedFilters(
      queries("a32_disjunctive_revenue")(spark, sf).queryExecution)
    assert(pushed.exists(_.contains("l_quantity")),
      s"quantity envelope not pushed to the lineitem scan: $pushed")
  }

  test("t12 length histogram: share window runs over post-aggregation rows") {
    // The window must sit ABOVE the per-bucket aggregate (bounded
    // cardinality), never over the raw documents.
    val plan = queries("t12_length_histogram")(spark, sf)
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected a window in t12")
    def containsAggregate(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate => a }.isDefined
    windows.foreach { w =>
      assert(containsAggregate(w.child),
        "t12 window is not over the aggregated histogram rows")
    }
  }

  test("a28 trade flows: both nation dims broadcast below the fact shuffle") {
    // The 2-row nation filter must reach both sides as broadcast joins;
    // a plan that shuffles nation with the facts has lost the pruning.
    val text = PlanTestUtils.formatted(
      queries("a28_nation_trade_flows")(spark, sf).queryExecution)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(text).size
    assert(broadcasts >= 2,
      s"expected >=2 broadcast joins (nation dims), saw $broadcasts")
  }

  test("t10 term doc freq: corpus total joins as broadcast, no extra shuffle join") {
    val text = PlanTestUtils.formatted(
      queries("t10_term_doc_freq")(spark, sf).queryExecution)
    assert(!text.contains("SortMergeJoin"),
      "t10 planned a SortMergeJoin for the 1-row total; expected broadcast")
  }

  test("a37 skew outliers: join is SALTED — keys include __salt, stats side exploded per salt") {
    // The whole point of a37 is the shape: a join on (event_type,
    // __salt) spreading each hot key over numSalts reducers, with the
    // stats side replicated by an explode over the salt sequence. If a
    // refactor swaps in a plain key join, the values stay identical
    // (salting is semantics-preserving) and only this test fails.
    val text = PlanTestUtils.formatted(
      queries("a37_skew_type_outliers")(spark, sf).queryExecution)
    assert(text.contains("__salt"), s"a37 lost its salt column:\n$text")
    assert(text.contains("explode"),
      "a37 stats side is no longer replicated via explode over salts")
  }

  test("d10 chunk dedup: raw text never reaches the digest shuffle") {
    // The 100 TB property: chunks reduce to 16-byte digests at the scan
    // projection, so the occurrence-count window and per-doc rollup
    // shuffle (doc_id, digest) rows only. An Exchange whose INPUT
    // attribute list carries `text` or `words` means chunk strings (the
    // corpus!) went over the network. Tree-header lines never carry
    // attributes — the detail-block Input lines are the real check
    // (PlanTestUtils.exchangeInputs).
    val inputs = PlanTestUtils.exchangeInputs(
      queries("d10_chunk_dedup")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in d10")
    // sanity that the attribute lines are non-trivial (the digest rides)
    assert(inputs.exists(_.contains("#")), s"no attributes parsed: $inputs")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#"))
    assert(leaky.isEmpty, s"d10 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("d14 substring dedup: raw text never reaches the digest shuffle (d10 property, sliding form)") {
    // Stride-1 windows make the digest projection 16x heavier than
    // d10's grid — all of it row-local. The scale contract is that
    // ONLY 16-byte digests shuffle; an Exchange input carrying text or
    // words means window strings (16x the corpus!) went over the wire.
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(
      queries("d14_substring_dedup")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in d14")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#"))
    assert(leaky.isEmpty, s"d14 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("s08 quantized ANN: query side broadcasts, no shuffle join, one embeddings-scan pair") {
    // Same contract as s01: the query slice replicates (broadcast
    // nested-loop), candidates stream through map-side. A SortMergeJoin
    // would shuffle the whole corpus by a join key that doesn't exist.
    val text = PlanTestUtils.formatted(
      queries("s08_ann_quantized")(spark, sf).queryExecution)
    assert(!text.contains("SortMergeJoin"),
      "s08 planned a shuffle join; expected broadcast nested-loop")
    assert(text.contains("BroadcastNestedLoopJoin"),
      "s08 lost its broadcast query-side join")
  }

  test("s11 PQ: every join broadcasts — codebooks, LUT, rerank; no shuffle join anywhere") {
    // The ADC promise: codebooks (m·k rows) and the per-query LUT
    // (Q·m·k rows) are bounded small by construction, and the rerank
    // candidate set is Q·QuantCand — every join side that replicates is
    // one of those. A SortMergeJoin would mean the corpus got shuffled
    // by a key the scan already co-locates, or the LUT lost its
    // broadcast (candidate scoring degrading from lookup to shuffle).
    val text = PlanTestUtils.formatted(
      queries("s11_ann_pq")(spark, sf).queryExecution)
    assert(!text.contains("SortMergeJoin"),
      s"s11 planned a shuffle join:\n$text")
    assert(text.contains("BroadcastHashJoin"), "s11 lost its broadcast joins")
  }

  test("hot-key count/min windows are gone: d02/d07/d10/d14/m05/m09 plan window-free") {
    // r14: count-over-partition (and d02's rn/min) windows on
    // data-dependent hot keys — digest, prefix fingerprint, cluster id
    // — funneled every member of a viral family into ONE task. Each is
    // now a map-side-combinable aggregate joined back on the key
    // (AQE-skew-splittable), so these plans must contain no Window at
    // all; one coming back means the single-task shape regressed.
    for (q <- Seq("d02_prefix_dedup", "d07_dedup_clusters", "d10_chunk_dedup",
        "d14_substring_dedup", "m05_frame_dedup", "m09_media_dedup_clusters")) {
      val plan = queries(q)(spark, sf).queryExecution.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.isEmpty,
        s"$q must plan window-free after the aggregate+join conversion, found ${windows.length}:\n$plan")
    }
  }

  test("t16 quality terciles: hierarchical ntile — no per-language single-task sort") {
    // r14: ntile(3) is row_number + arithmetic, so the tercile runs as
    // the hierarchical PrefixSum form — ONE corpus-grain window
    // partitioned by (lang, __rng) (the in-range rank), and the
    // offset/size windows on (lang) over the ≤ numRanges-per-lang
    // count aggregate. A lang-only window over non-aggregate rows
    // means the one-task-per-language ntile sort came back.
    val plan = queries("t16_quality_buckets")(spark, sf).queryExecution.optimizedPlan
    assertHierarchicalNtile(plan, "t16")
  }

  /** The partitionedNtile plan contract: exactly one corpus-grain
    * window, partitioned by (lang, __rng); every lang-only window sits
    * above an Aggregate (the bounded offsets/sizes rows). */
  private def assertHierarchicalNtile(plan: LogicalPlan, q: String): Unit = {
    val windows = plan.collect { case w: LWindow => w }
    val byKeys = windows.groupBy(_.partitionSpec.flatMap(_.references.map(_.name)).toSet)
    assert(byKeys.getOrElse(Set("lang", "__rng"), Nil).length == 1,
      s"$q must plan exactly one (lang, __rng) in-range window, got ${byKeys.keySet}:\n$plan")
    val langOnly = byKeys.getOrElse(Set("lang"), Nil)
    assert(langOnly.nonEmpty && windows.length == 1 + langOnly.length,
      s"$q window partition keys drifted: ${byKeys.keySet}")
    def containsAggregate(p: LogicalPlan): Boolean =
      p.collectFirst { case a: Aggregate => a }.isDefined
    langOnly.foreach(w => assert(containsAggregate(w.child),
      s"$q has a lang-only window over non-aggregate rows — the single-task sort is back:\n$w"))
  }

  test("t18 perplexity terciles: hierarchical ntile on the bucketing window too") {
    // Both of t18's former ntile windows are PrefixSum-served now; the
    // head-stratum machinery lives inside the memoized c2 build, so
    // the VISIBLE windows are exactly the perplexity-tercile set —
    // the same hierarchical contract as t16.
    val plan = queries("t18_lm_quality_filter")(spark, sf).queryExecution.optimizedPlan
    assertHierarchicalNtile(plan, "t18")
  }

  test("t17 approx terciles: window-free — GK sketch aggregate plus broadcast thresholds") {
    // t17 is the CHEAP tercile alternative (one sketch pass, no total
    // order at all — t16's exact hierarchical ntile still sorts every
    // range task). Its plan must never contain a Window (a
    // refactor that 'simplifies' back to ntile keeps values green and
    // breaks only here), and the threshold table must come back as a
    // broadcast, not a shuffle join on lang.
    val text = PlanTestUtils.formatted(
      queries("t17_quality_buckets_approx")(spark, sf).queryExecution)
    assert(!text.contains("Window"),
      s"t17 planned a Window; the approx path must not total-order:\n$text")
    assert(text.contains("approx_percentile"), "t17 lost its GK sketch aggregate")
    assert(!text.contains("SortMergeJoin"),
      "t17 shuffle-joins the K-language threshold table; expected broadcast")
  }

  test("t18 LM filter: raw text never shuffles — only gram tuples and (gram, count) rows move") {
    // The LM's scale contract: the stratum window ranks a projected
    // (doc_id, lang, score) frame and the bigram explode is scan-side,
    // so document text stays in its scan partition end-to-end. An
    // Exchange input carrying `text` or `ws` means whole documents (the
    // corpus!) rode a shuffle the design promised to avoid.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("t18_lm_quality_filter")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in t18")
    assert(inputs.exists(_.contains("#")), s"no attributes parsed: $inputs")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("ws#"))
    assert(leaky.isEmpty, s"t18 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("d15 manifest: no shuffle carries document text — every family reduced it scan-side") {
    // d15 unions six families that all read `documents`; the manifest
    // inherits their scale contracts only if each one still reduces
    // text to signatures/digests/fingerprints BEFORE its first
    // exchange. One regressed branch (e.g. a refactor moving the
    // quality projection above the stratum shuffle) would ship the
    // corpus over the network inside an otherwise-green query.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("d15_drop_manifest")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in d15")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#") || l.contains("ws#"))
    assert(leaky.isEmpty, s"d15 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("d13: CapCollectBuckets rewrote the user-shaped collect->filter(size) to cap-before-collect") {
    // d13 is written groupBy(ch).agg(collect_list).filter(size BETWEEN)
    // on purpose — the registered proof that the injected optimizer
    // rule fires on real user-shaped SQL, not just in its unit tests.
    // The rewritten plan carries the rule's count-window alias and the
    // collect aggregate sits ABOVE the capping window, so the oversized
    // group is dropped before any array exists.
    val plan = queries("d13_chunk_sharers")(spark, sf).queryExecution.optimizedPlan
    assert(plan.toString.contains("graft_bucket_n"),
      s"CapCollectBuckets did not fire on d13:\n$plan")
    val cappedAggs = plan.collect {
      case a: Aggregate if a.child.collectFirst { case w: LWindow => w }.isDefined => a
    }
    assert(cappedAggs.nonEmpty,
      s"d13 collect aggregate is not above the capping window:\n$plan")
  }

  test("t19 Gopher battery: all nine masses row-local — no shuffle carries text or gram arrays") {
    // The battery's whole design is that repetition masses reduce to
    // one long per (doc, n) BEFORE anything moves: an exchange input
    // carrying `text`, `words`, or any sg<N> gram array means the
    // run-length reduction regressed to a per-gram shuffle.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("t19_gopher_repetition")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected the rollup shuffle in t19")
    val leaky = inputs.filter(l =>
      l.contains("text#") || l.contains("words#") || l.contains("sg"))
    assert(leaky.isEmpty, s"t19 shuffles raw text/grams:\n${leaky.mkString("\n")}")
  }

  test("d16/d17 inherit the d15 contract: no shuffle carries document text") {
    for (q <- Seq("d16_dataset_card", "d17_cross_source_overlap")) {
      val inputs = PlanTestUtils.exchangeInputs(
        queries(q)(spark, sf).queryExecution)
      assert(inputs.nonEmpty, s"expected shuffles in $q")
      val leaky = inputs.filter(l =>
        l.contains("text#") || l.contains("words#") || l.contains("ws#"))
      assert(leaky.isEmpty, s"$q shuffles raw text:\n${leaky.mkString("\n")}")
    }
  }

  test("s14 radius search: window-free serve path — the only Window ranks query-side probes") {
    // Radius membership is an absolute test, not a rank: the corpus
    // side must never pay a per-query sort. Exactly ONE logical Window
    // may exist — the top-2-cell probe ranking over the query slice —
    // and it must partition by vec_id (the query), not by q_id over
    // candidates.
    val plan = queries("s14_ann_radius")(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.length == 1,
      s"s14 must plan exactly the probe-ranking window, found ${windows.length}:\n$plan")
    val partCols = windows.head.partitionSpec.flatMap(_.references.map(_.name))
    assert(partCols == Seq("vec_id"),
      s"s14's window must rank probes per query vec_id, got $partCols")
  }

  test("t20 DSIR: no shuffle carries text or gram strings — bucket ids only") {
    // The design's whole point: grams hash to ints in the scan
    // projection, the 256-row model broadcasts, so every exchange
    // moves (doc, bucket) ints or (bucket, count) aggregates. An input
    // carrying `text`, `words`, or the gram string `x` means the
    // corpus rode the shuffle the scan projection exists to prevent.
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(
      queries("t20_dsir_weights")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected the fit/score shuffles in t20")
    val leaky = inputs.filter(l =>
      l.contains("text#") || l.contains("words#") || l.contains("x#"))
    assert(leaky.isEmpty, s"t20 shuffles raw text/grams:\n${leaky.mkString("\n")}")
  }

  test("t21 DSIR select: hierarchical prefix sum — no partition ever holds a whole source") {
    // Stratified selection is half the scale story (per-source, never
    // a corpus-wide total sort); r14 finished it: the running sum is
    // the shared PrefixSum, so the plan must show the two-level shape
    // — the in-range window partitioned by (source, __rng) and the
    // ≤ numRanges-row offsets window by (source). A single
    // source-partitioned window here means the one-task-per-source
    // sort came back; an empty partition spec means the global sort
    // did.
    val plan = queries("t21_dsir_select")(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.length == 2,
      s"t21 must plan the in-range + offsets windows, found ${windows.length}:\n$plan")
    val partKeys = windows.map(_.partitionSpec.flatMap(_.references.map(_.name)).toSet)
    assert(partKeys.contains(Set("source", "__rng")) && partKeys.contains(Set("source")),
      s"t21 window partition keys drifted: $partKeys")
    // and it inherits t20's no-text-in-shuffle contract
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(
      queries("t21_dsir_select")(spark, sf).queryExecution)
    // bare `x#` only (the gram-string column): min#/max# from the
    // bounds scalar are 8-byte partial-agg longs, fine to shuffle.
    val leaky = inputs.filter(l =>
      l.contains("text#") || l.contains("words#") ||
        l.matches(""".*(?<![a-z_])x#.*"""))
    assert(leaky.isEmpty, s"t21 shuffles raw text/grams:\n${leaky.mkString("\n")}")
  }

  test("t07 token budget: hierarchical prefix sum — no partition ever holds a whole source") {
    // Same r14 upgrade as t21: the per-source running total must plan
    // as the two-level PrefixSum — (source, __rng) in-range window +
    // (source) offsets window — never one window partition per source.
    val plan = queries("t07_token_budget_mix")(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.length == 2,
      s"t07 must plan the in-range + offsets windows, found ${windows.length}")
    val partKeys = windows.map(_.partitionSpec.flatMap(_.references.map(_.name)).toSet)
    assert(partKeys.contains(Set("source", "__rng")) && partKeys.contains(Set("source")),
      s"t07 window partition keys drifted: $partKeys")
  }

  test("s15 filtered ANN: the label predicate lives in a join condition, not a post-join filter") {
    // Pre-filter semantics at plan level: label equality must prune
    // candidates AS PART OF the join (shrinking what the join
    // produces), never as a Filter above it — post-join filtering
    // would compute cosines for candidates the predicate discards.
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val plan = queries("s15_ann_filtered")(spark, sf).queryExecution.optimizedPlan
    val labelJoins = plan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "label")) => j
    }
    assert(labelJoins.nonEmpty,
      s"s15 lost the label predicate from its join condition:\n$plan")
    // Only a label=label EQUALITY above a join is the regression;
    // Catalyst's pushed isnotnull(label) null-guards are legitimate.
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    val labelFilters = plan.collect {
      case f: Filter if f.child.collectFirst { case j: Join => j }.isDefined &&
        f.condition.collectFirst {
          case e: EqualTo if Seq(e.left, e.right)
            .forall(_.references.exists(_.name == "label")) => e
        }.isDefined => f
    }
    assert(labelFilters.isEmpty,
      s"s15 label predicate regressed to a post-join Filter:\n$plan")
  }

  test("m11 scene segmentation: every window partitions by media_id, no payload in any shuffle") {
    // The run-length reduction must never cross media: an unpartitioned
    // window here is a corpus-wide total sort of the frame stream. And
    // frames must reduce to digests scan-side (the m05 rule): a shuffle
    // input carrying `text` or `bytes` means video payloads rode the
    // exchange.
    val plan = queries("m11_scene_segments")(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the lag/run-id windows in m11")
    windows.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(partCols == Seq("media_id"),
        s"m11 window must partition by media_id, got $partCols")
    }
    val inputs = PlanTestUtils.exchangeInputs(
      queries("m11_scene_segments")(spark, sf).queryExecution)
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("bytes#"))
    assert(leaky.isEmpty, s"m11 shuffles media payloads:\n${leaky.mkString("\n")}")
  }

  test("m12 energy segments: every window partitions by media_id, no payload in any shuffle") {
    // Same contract as m11 for the audio domain: the mean arrives as
    // same-partition window aggregates (no media-grain join), so all
    // windows must key on media_id and no exchange may carry payloads.
    val plan = queries("m12_energy_segments")(spark, sf).queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the mean/run windows in m12")
    windows.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(partCols == Seq("media_id"),
        s"m12 window must partition by media_id, got $partCols")
    }
    val inputs = PlanTestUtils.exchangeInputs(
      queries("m12_energy_segments")(spark, sf).queryExecution)
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("bytes#"))
    assert(leaky.isEmpty, s"m12 shuffles media payloads:\n${leaky.mkString("\n")}")
  }

  test("t22 TF-IDF: hierarchical rank windows over aggregates; no pinned vocab-sized broadcast") {
    // r14 flipped two r13 pins, both instances of the IVF lesson
    // (nothing that grows with the data may be a FORCED broadcast or
    // a single-task sort): the df join must survive with broadcasts
    // unavailable (the old shape HINTED the vocabulary-sized df frame
    // broadcast — auto-broadcast off would still have planned it),
    // and the per-source top-5 must rank in two stages so no window
    // partition holds a whole source's vocabulary. Windows still sit
    // above the (source, term) aggregate, and raw text never enters
    // an exchange.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val qe = queries("t22_tfidf_terms")(spark, sf).queryExecution
      val plan = qe.optimizedPlan
      val windows = plan.collect { case w: LWindow => w }
      assert(windows.length == 2,
        s"t22 must plan the bucket + final rank windows, found ${windows.length}")
      val partKeys = windows.map(_.partitionSpec.flatMap(_.references.map(_.name)).toSet)
      assert(partKeys.contains(Set("source", "tb")) && partKeys.contains(Set("source")),
        s"t22 window partition keys drifted: $partKeys")
      def containsAggregate(p: LogicalPlan): Boolean =
        p.collectFirst { case a: Aggregate => a }.isDefined
      windows.foreach(w => assert(containsAggregate(w.child),
        "t22 window is not over the aggregated vocabulary rows"))
      val text = PlanTestUtils.formatted(qe)
      assert(text.contains("SortMergeJoin"),
        "t22 with auto-broadcast off must shuffle-join the df side — a broadcast here means the vocab-sized hint came back")
      val inputs = PlanTestUtils.exchangeInputs(qe)
      val leaky = inputs.filter(_.contains("text#"))
      assert(leaky.isEmpty, s"t22 shuffles raw text:\n${leaky.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("s16 kNN graph: the only window ranks per vector; mutual join reuses the memoized graph") {
    // The graph build's scale contract: one per-vector rank window over
    // the in-cell pairs (spillable rows, never a global sort), and the
    // mutual self-join reads the session-memoized 3N-row kNN frame from
    // both sides (InMemoryRelation) instead of recomputing the pair
    // join twice. The window pin inspects the UNMEMOIZED edge plan
    // (knnEdges, the fitCentroids-style spec seam) optimized WITHOUT
    // cache substitution: once any suite in the JVM has populated the
    // session memo, withCachedData would swap the identical subtree for
    // InMemoryRelation and hide the window from optimizedPlan.
    val edges = spark.sessionState.optimizer.execute(
      graft.queries.SimilarityQueries.knnEdges(spark, sf).queryExecution.analyzed)
    val windows = edges.collect { case w: LWindow => w }
    assert(windows.length == 1,
      s"s16 must plan exactly the per-vector rank window, found ${windows.length}")
    val partCols = windows.head.partitionSpec.flatMap(_.references.map(_.name))
    assert(partCols == Seq("q_id"), s"s16 window must partition by q_id, got $partCols")
    val qe = queries("s16_knn_graph")(spark, sf).queryExecution
    assert(PlanTestUtils.formatted(qe).contains("InMemoryTableScan"),
      "s16 mutual join lost the memoized kNN frame — the pair join runs twice")
  }

  test("d19 calibration: no pinned pair-frame broadcast — doc-keyed shuffle joins, digests only") {
    // r14 flip of an r13 pin: candidate pairs are Θ(N) at a constant
    // dup rate, so HINTING them broadcast (the old shape: pairs onto
    // both signature streams) is the IVF O(N)-broadcast failure mode.
    // With auto-broadcast off the joins must plan as doc-keyed shuffle
    // joins — proof no hint forces the pair frame resident on every
    // executor — and the exchanges may carry only ints/digests: text
    // stays scan-local (the d10 rule), and the gram-hash arrays die in
    // the memoized pair frame, never re-entering a shuffle here.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val qe = queries("d19_minhash_calibration")(spark, sf).queryExecution
      val text = PlanTestUtils.formatted(qe)
      assert(text.contains("SortMergeJoin"),
        "d19 with auto-broadcast off must shuffle-join pairs and signatures — a broadcast here means the O(N) pair hint came back")
      val inputs = PlanTestUtils.exchangeInputs(qe)
      val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#"))
      assert(leaky.isEmpty, s"d19 shuffles raw text:\n${leaky.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("m13 curation card: the corpus-scaling drop set is never a pinned broadcast side") {
    // Same IVF lesson, media domain: the drop list is O(N·dup_rate).
    // With auto-broadcast off the is_dropped flag join must plan as a
    // shuffle join (AQE may still promote it at runtime where it
    // fits — the point is no HINT forces it), and media payloads
    // (bytes) stay out of every exchange.
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val qe = queries("m13_media_curation_card")(spark, sf).queryExecution
      val text = PlanTestUtils.formatted(qe)
      assert(text.contains("SortMergeJoin"),
        "m13 with auto-broadcast off must shuffle-join the drop set — a broadcast here means the O(N) hint came back")
      val inputs = PlanTestUtils.exchangeInputs(qe)
      // bare `bytes#` only: payload_bytes#/kept_bytes# are derived
      // LONGS (fine to shuffle); the raw binary column must die at
      // the scan's length() projection.
      val leaky = inputs.filter(_.matches(""".*(?<![a-z_])bytes#.*"""))
      assert(leaky.isEmpty, s"m13 shuffles media payloads:\n${leaky.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("s18 index health: embeddings never shuffle — centroids broadcast, aggregates only") {
    // The cosine pass is a map-side broadcast-centroid join over the
    // scan; only (cell, count) partials and 1-row aggregates may move.
    // An exchange input carrying the vector column v# means the corpus
    // embeddings rode a shuffle the health report never needs.
    val qe = queries("s18_index_health")(spark, sf).queryExecution
    val inputs = PlanTestUtils.exchangeInputs(qe)
    assert(inputs.nonEmpty, "expected the size/cosine aggregates in s18")
    val vAttr = raw"(^|[\[,\s])v#".r
    val leaky = inputs.filter(l => vAttr.findFirstIn(l).isDefined)
    assert(leaky.isEmpty, s"s18 shuffles embeddings:\n${leaky.mkString("\n")}")
    assert(PlanTestUtils.formatted(qe).contains("BroadcastExchange") ||
      PlanTestUtils.formatted(qe).contains("BroadcastNestedLoopJoin"),
      "s18 lost its broadcast joins")
  }

  test("s17 probe sweep: one materialized candidate frame serves every sweep level") {
    // The sweep's design: candidates build ONCE (disk-materialized
    // since r19 — the plan-size rule) and each probe level re-filters
    // the scan-rooted frame — the plan must read the s17_cand parquet
    // per level, never rebuild the probe/cell join.
    val qe = queries("s17_probe_sweep")(spark, sf).queryExecution
    val text = PlanTestUtils.formatted(qe)
    val scans = "s17_cand".r.findAllIn(text).size
    assert(scans >= 3,
      s"s17 must serve all sweep levels from the materialized candidates, saw $scans cand scans")
  }

  test("t23 domain distance inherits t20's contract: bucket ids only in every shuffle") {
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(
      queries("t23_domain_distance")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected the (source, bucket) shuffle in t23")
    val leaky = inputs.filter(l =>
      l.contains("text#") || l.contains("words#") || l.contains("x#"))
    assert(leaky.isEmpty, s"t23 shuffles raw text/grams:\n${leaky.mkString("\n")}")
  }

  test("d20 span removal: window strings die at the digest projection; merge windows per doc") {
    // d14's digest rule extended to the removal manifest: no exchange
    // may carry text or the words array, and the interval-merge
    // windows must partition by doc_id (a span never crosses docs).
    val qe = queries("d20_span_removal")(spark, sf).queryExecution
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(qe)
    assert(inputs.nonEmpty, "expected the digest shuffle in d20")
    // boundary-anchored: the bare substring "words#" would false-match
    // d20's own n_cut_words# output column
    val wordsAttr = raw"(^|[\[,\s])words#".r
    val leaky = inputs.filter(l => l.contains("text#") || wordsAttr.findFirstIn(l).isDefined)
    assert(leaky.isEmpty, s"d20 shuffles raw text:\n${leaky.mkString("\n")}")
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the merge windows in d20")
    windows.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(partCols == Seq("doc_id"),
        s"d20 merge window must partition by doc_id, got $partCols")
    }
  }

  test("t24 decontam spans: probe digests broadcast, no text in any shuffle, per-doc merge") {
    // The t08 probe-side rule at span grain: the eval window-digest set
    // must come back as a broadcast (a SortMergeJoin means the corpus
    // digest stream got shuffled by digest to meet the probe set), and
    // only digests + offsets may ride exchanges.
    val qe = queries("t24_decontam_spans")(spark, sf).queryExecution
    val text = PlanTestUtils.formatted(qe)
    assert(!text.contains("SortMergeJoin"),
      "t24 shuffle-joins the probe set; expected broadcast")
    val wordsAttr = raw"(^|[\[,\s])words#".r
    // dataExchangeInputs (r19): the parallelism-floor repartition
    // (Tables.parallelScan) is exempt — bounded by cores*maxPartitionBytes
    // and absent at production split counts; the assertion guards
    // DATA-DEPENDENT shuffles.
    val inputs = PlanTestUtils.dataExchangeInputs(qe)
    val leaky = inputs.filter(l => l.contains("text#") || wordsAttr.findFirstIn(l).isDefined)
    assert(leaky.isEmpty, s"t24 shuffles raw text:\n${leaky.mkString("\n")}")
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the merge windows in t24")
    windows.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name))
      assert(partCols == Seq("doc_id"),
        s"t24 merge window must partition by doc_id, got $partCols")
    }
  }

  test("d18 audit inherits the d15 contract: no shuffle carries document text") {
    val inputs = PlanTestUtils.exchangeInputs(
      queries("d18_residual_leakage")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in d18")
    val leaky = inputs.filter(l =>
      l.contains("text#") || l.contains("words#") || l.contains("ws#"))
    assert(leaky.isEmpty, s"d18 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("t25 PII redaction: raw and redacted text die at the scan — only per-source counters shuffle") {
    // Detection and redaction are row-local regex passes fused into the
    // scan projection; the only Exchange is the #sources-row rollup. An
    // Input line carrying text/red means the corpus (twice!) shuffled.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("t25_pii_redaction")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected the per-source rollup shuffle in t25")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("red#"))
    assert(leaky.isEmpty, s"t25 shuffles document text:\n${leaky.mkString("\n")}")
  }

  test("t26 source novelty: digest-only shuffles, first-seen window bounded by the gram key") {
    // (source, gram-hash) rows are all that move; the attribution window
    // partitions by the gram key (<= #sources rows per partition), so no
    // corpus-wide sort and no text on the wire.
    val df = queries("t26_source_novelty")(spark, sf)
    val inputs = PlanTestUtils.exchangeInputs(df.queryExecution)
    assert(inputs.nonEmpty, "expected digest shuffles in t26")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#"))
    assert(leaky.isEmpty, s"t26 shuffles raw text:\n${leaky.mkString("\n")}")
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w }
    assert(windows.nonEmpty && windows.forall(
      _.partitionSpec.exists(_.references.exists(_.name == "g"))),
      "t26's window must partition by the gram key")
  }

  test("s19 decontamination: held-out side broadcasts, window partitions by the eval id") {
    // The s01 discipline: the ~2% eval slice is the broadcast side of a
    // nested-loop join; training vectors stream through it. The ranking
    // window partitions by e_id (small side), never a global sort.
    val text = PlanTestUtils.formatted(
      queries("s19_eval_decontamination")(spark, sf).queryExecution)
    assert(text.contains("BroadcastNestedLoopJoin"),
      "s19 lost the broadcast-query join shape")
    assert(!text.contains("CartesianProduct"))
  }

  test("s20 label audit: no vector payload in any shuffle — graph + 2-column label joins only") {
    // The audit re-aggregates the memoized s16 edge list; embeddings
    // contribute only (vec_id, label). An Exchange carrying v# means
    // vector arithmetic re-entered a query that needs none.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("s20_knn_label_consistency")(spark, sf).queryExecution)
    val leaky = inputs.filter(l => l.contains(" v#") || l.contains("[v#"))
    assert(leaky.isEmpty, s"s20 shuffles embedding vectors:\n${leaky.mkString("\n")}")
  }

  test("s22 decon sweep: probes broadcast onto train cells — train vectors never shuffle by cell") {
    // The bounded-Q discipline: the Q·nProbe probe frame is the
    // explicit broadcast side of the cell join, so the training
    // corpus never shuffles its vectors for this query. An Exchange
    // input carrying cv# means the broadcast was lost and the train
    // side rode a shuffle join. (The eval-side window shuffle carries
    // qv# — bounded by Q, the documented serving contract.)
    val qe = queries("s22_decon_ivf_sweep")(spark, sf).queryExecution
    val inputs = PlanTestUtils.exchangeInputs(qe)
    val leaky = inputs.filter(_.contains("cv#"))
    assert(leaky.isEmpty, s"s22 shuffles train vectors by cell:\n${leaky.mkString("\n")}")
    assert(PlanTestUtils.formatted(qe).contains("s22_cand"),
      "s22 lost the materialized candidate frame")
    // The broadcast-onto-train property now lives in the candidate
    // BUILD (disk-materialized since r19); pin it on the raw seam plan
    // (a non-default maxProbe returns the unmemoized candidate chain).
    val raw = SimilarityQueries.deconIvfSweep(spark, sf, maxProbe = 2)
      .queryExecution
    val rawLeaky = PlanTestUtils.exchangeInputs(raw).filter(_.contains("cv#"))
    assert(rawLeaky.isEmpty,
      s"s22's candidate build shuffles train vectors by cell:\n${rawLeaky.mkString("\n")}")
    assert(PlanTestUtils.formatted(raw).contains("BroadcastHashJoin"),
      "s22's candidate build lost the probes broadcast join")
  }

  test("t31 extended PII: detection, checksum and redaction fuse into the scan — counters only shuffle") {
    // The t25 contract extended: regex + Luhn integer arithmetic are
    // row-local; the only Exchange is the #sources rollup. text#/red#
    // in an Input line means the corpus shuffled (twice) instead.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("t31_pii_extended")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected the per-source rollup shuffle in t31")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("red#"))
    assert(leaky.isEmpty, s"t31 shuffles document text:\n${leaky.mkString("\n")}")
  }

  test("t32 CMS serve: counters, total and summary all join as broadcasts") {
    // The serve path probes a BROADCAST counter table and thresholds
    // against a broadcast 1-row total; the summary columns attach the
    // same way. A SortMergeJoin against the counter table means the
    // 4×1024 sketch — the whole point of which is fitting anywhere —
    // got shuffled instead.
    val text = PlanTestUtils.formatted(
      queries("t32_cms_served_topk")(spark, sf).queryExecution)
    assert(text.contains("BroadcastExchange"), "t32 lost its broadcast joins")
    assert(!text.contains("CartesianProduct"))
  }

  test("d21 edit verify: DP runs row-local above bounded pair joins — no cartesian, memoized pairs") {
    // Text meets the pair relation through two equi-joins keyed by doc
    // id, bounded by the memoized Jaccard-verified pairs; the Levenshtein
    // DP is a projection, never a join condition, and nothing plans as a
    // cartesian product.
    val df = queries("d21_editdist_verify")(spark, sf)
    val text = PlanTestUtils.formatted(df.queryExecution)
    assert(!text.contains("CartesianProduct"),
      "d21 planned a cartesian product")
    assert(text.contains("levenshtein"), "expected the levenshtein projection")
    assert(text.contains("InMemoryTableScan") || text.contains("TableCacheQueryStage"),
      "d21 must reuse the memoized jacc_pairs relation")
  }

  test("t27 sequence packing: hierarchical prefix sum — corpus window per range, offsets broadcast") {
    // The one global ordering must never funnel through a single
    // partition: the corpus-side running sum partitions by __rng (the
    // shared PrefixSum range tag), and
    // the only empty-partition window runs over the numRanges-row
    // offsets aggregate (the t12 bounded-cardinality rule). The offsets
    // then join back as a broadcast, and no shuffle carries text.
    val df = queries("t27_sequence_packing")(spark, sf)
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    val (global, ranged) = windows.partition(_.partitionSpec.isEmpty)
    // the tagged frame plans twice (corpus side + inside the offsets
    // aggregate), so >=1 ranged window — what matters is that EVERY
    // corpus-grain window partitions by __rng
    assert(ranged.nonEmpty && ranged.forall(
      _.partitionSpec.flatMap(_.references.map(_.name)) == Seq("__rng")),
      "the corpus prefix sum must partition by __rng")
    assert(global.length == 1, "expected exactly the offsets window")
    def containsAggregate(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collectFirst { case a: Aggregate => a }.isDefined
    assert(containsAggregate(global.head.child),
      "the empty-partition window must run over the per-range totals aggregate")
    val text = PlanTestUtils.formatted(df.queryExecution)
    assert(text.contains("BroadcastExchange") || text.contains("BroadcastHashJoin"),
      "range offsets must broadcast back onto the corpus")
    val leaky = PlanTestUtils.exchangeInputs(df.queryExecution)
      .filter(l => l.contains("text#") || l.contains("x#"))
    assert(leaky.isEmpty, s"t27 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("t28 mixture plan: doc grain dies at the first aggregate; the total joins as broadcast") {
    // After the per-source rollup only #sources rows exist; the 1-row
    // total must come back as a broadcast, never a shuffle join, and no
    // Exchange may carry text.
    val df = queries("t28_mixture_plan")(spark, sf)
    val text = PlanTestUtils.formatted(df.queryExecution)
    assert(text.contains("BroadcastNestedLoopJoin") || text.contains("BroadcastExchange"),
      "t28 lost the broadcast-total join")
    val leaky = PlanTestUtils.exchangeInputs(df.queryExecution)
      .filter(_.contains("text#"))
    assert(leaky.isEmpty, s"t28 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("plan fingerprints: stable across rebuilds, distinct across queries, volatile-token-free") {
    // The bench artifact's `plans` map is only useful if the same
    // logical query always hashes identically: expression ids are a
    // global counter, so two BUILDS of the same query differ in every
    // `#id` — normalization must erase exactly that class of token.
    def fp(name: String): String = {
      val df = queries(name)(spark, sf)
      df.count() // AQE must finalize before the plan is fingerprinted
      graft.tools.PlanFingerprint(df)
    }
    val a1 = fp("a01_pricing_summary")
    val a2 = fp("a01_pricing_summary")
    assert(a1 == a2, "same query, two builds: fingerprints must match")
    assert(a1.nonEmpty && a1.length == 16)
    val others = Seq(fp("t04_token_count"), fp("a28_nation_trade_flows"))
    assert(!others.contains(a1), "distinct queries must not alias")

    // Normalization unit cases: the exact tokens that vary run-to-run.
    import graft.tools.PlanFingerprint.normalize
    assert(normalize("Exchange hashpartitioning(x#123L, 32), [plan_id=456]") ==
      normalize("Exchange hashpartitioning(x#9L, 32), [plan_id=8]"))
    assert(normalize("Statistics(sizeInBytes=1.5 MiB, rowCount=42)") ==
      normalize("Statistics(sizeInBytes=2.0 KiB)"))
    assert(normalize("InMemoryFileIndex[file:/root/testdata/sf0.001/x.parquet]") ==
      normalize("InMemoryFileIndex[file:/root/testdata/sf0.1/x.parquet]"))
    // JVM lambda identity: counter, hidden-class address, and object
    // hash all differ per launch while naming the same closure
    assert(normalize(
      "MediaPipeline$$$Lambda$2605/0x00007f1a94d88b58@643f8ebe, obj#43") ==
      normalize("MediaPipeline$$$Lambda$2606/0x00007ff94cd887c0@6bbd4048, obj#43"))
    // but structure still distinguishes:
    assert(normalize("BroadcastHashJoin") != normalize("SortMergeJoin"))

    // Cached-plan bodies (r14): the subtree under InMemoryRelation is
    // AQE-finalized from RUNTIME stage statistics, so two JVMs
    // legitimately render different join shapes inside the same cache
    // — the normalizer must erase the body but keep the relation, its
    // siblings, and the details section.
    // The cached body's operators are numbered in the SAME global
    // sequence and get real details blocks — both the nested tree
    // lines AND those blocks must go (ids 7/8 below), while the outer
    // plan's block (id 9) and the relation's own block (id 2) stay.
    val cachedA =
      """* Project (1)
        |+- * Filter (9)
        |   +- InMemoryTableScan
        |         +- InMemoryRelation (2)
        |               +- AdaptiveSparkPlan (7)
        |                  +- == Final Plan ==
        |                     * BroadcastHashJoin Inner BuildRight (8)
        |+- Exchange
        |
        |(8) BroadcastHashJoin
        |Arguments: BuildRight
        |
        |(9) Filter
        |Input [1]: [x#3L]
        |
        |(2) InMemoryRelation
        |Arguments: [x#3L], StorageLevel(disk, memory)
        |
        |(5) Scan parquet""".stripMargin
    val cachedB = cachedA
      .replace("BuildRight (8)", "BuildLeft (8)")
      .replace("Arguments: BuildRight", "Arguments: BuildLeft")
    assert(normalize(cachedA) == normalize(cachedB),
      "AQE decisions inside a cached body must not change the fingerprint")
    assert(normalize(cachedA).contains("InMemoryRelation"),
      "the relation line itself must survive")
    assert(!normalize(cachedA).contains("BroadcastHashJoin"),
      "the cached body's tree line and details block must both be stripped")
    assert(normalize(cachedA).contains("Filter\nInput"),
      "an outer operator's details block must survive")
    assert(normalize(cachedA).contains("StorageLevel"),
      "the relation's own details block must survive")
    assert(normalize(cachedA).contains("Exchange") &&
      normalize(cachedA).contains("Scan parquet"),
      "siblings after the cached body and the details section must survive")
    // Harvested ids are anchored to the TRAILING "(n)" tree convention
    // (r15 ADVICE): a parenthesized integer inside a skipped line's
    // argument text — decimal(10) below — must not mark the outer
    // operator (10)'s details block for deletion.
    val argInt =
      """* Filter (10)
        |+- InMemoryRelation (2)
        |      +- * Project [cast(x as decimal(10)) AS y] (8)
        |
        |(10) Filter
        |Input [1]: [x#3L]
        |
        |(8) Project""".stripMargin
    assert(normalize(argInt).contains("Filter\nInput"),
      "mid-line integers in skipped lines must not strip outer details")
    assert(!normalize(argInt).contains("Project"),
      "the cached Project's tree line and details block are still stripped")

    // Codegen ids and AQE stage ids number parallel branches in
    // completion/submission order — swapped between runs of the SAME
    // plan (the residual d15/d16/d18/t29 flap, r14).
    assert(normalize("() HashAggregate [codegen id : 22]") ==
      normalize("() HashAggregate [codegen id : 23]"))
    val stageA = "(12) ShuffleQueryStage\nOutput [1]: [x#3L]\nArguments: 24"
    val stageB = "(12) ShuffleQueryStage\nOutput [1]: [x#3L]\nArguments: 25"
    assert(normalize(stageA) == normalize(stageB),
      "QueryStage stage-id Arguments must normalize")
    // …but a GlobalLimit's integer argument is SEMANTIC and must not:
    assert(normalize("(3) GlobalLimit\nArguments: 50") !=
      normalize("(3) GlobalLimit\nArguments: 100"))
  }

  test("a39 incremental agg: refresh reads the materialized view; only delta + proof rescan the fact table") {
    // The 100 TB property: the maintained partials arrive as a
    // graft_memo parquet scan, so the refresh side never touches the
    // base fact rows. lineitem appears exactly twice — the delta-slice
    // aggregation and the full recompute that exists only as the
    // in-query proof column.
    val plan = PlanTestUtils.formatted(
      queries("a39_incremental_agg")(spark, sf).queryExecution)
    assert(plan.contains("graft_memo"),
      "a39 does not read the materialized base partials")
    val liScans = plan.linesIterator.count(l =>
      l.contains("Location") && l.contains("lineitem"))
    assert(liScans == 2, s"expected 2 lineitem scans (delta + proof), got $liScans")
  }

  test("t33 zipf: top-V is a distributed TakeOrdered; the rank window runs above the limit") {
    // No global sort of the vocabulary materializes — the cut compiles
    // to TakeOrderedAndProject — and the only window ranks the ALREADY
    // LIMITED frame, so its single partition holds <= V rows at any
    // corpus size (the collectCappedBuckets adjudication).
    val qe = queries("t33_zipf_fit")(spark, sf).queryExecution
    assert(PlanTestUtils.formatted(qe).contains("TakeOrderedAndProject"),
      "the top-V cut is not a distributed TakeOrdered")
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.length == 1, s"expected 1 window, got ${windows.length}")
    val bounded = windows.head.child.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.GlobalLimit => l
    }
    assert(bounded.nonEmpty, "the rank window's input is not limit-bounded")
  }

  test("d22 incremental LSH: no shuffle carries document text — band keys, digests, gram-hash arrays only") {
    // The gram sets are computed AFTER the bounded candidate ids join
    // back to documents (the d21 adjudication): the id side broadcasts
    // and text stays scan-side, so an Exchange input carrying text
    // means the corpus went over the wire.
    val inputs = PlanTestUtils.exchangeInputs(
      queries("d22_incremental_lsh")(spark, sf).queryExecution)
    assert(inputs.nonEmpty, "expected shuffles in d22")
    val leaky = inputs.filter(l => l.contains("text#") || l.contains("words#"))
    assert(leaky.isEmpty, s"d22 shuffles raw text:\n${leaky.mkString("\n")}")
  }

  test("m14 incremental frame dedup: no payload in any shuffle; probe join is keyed, not a pinned broadcast") {
    // Payloads die at the sampling projection (the m05 property); the
    // digest index and the ingest digests both scale with the corpus,
    // so neither side may carry a FORCED broadcast hint (the r14
    // inverted rule) — AQE may still promote at small SF.
    val qe = queries("m14_incremental_frame_dedup")(spark, sf).queryExecution
    val inputs = PlanTestUtils.exchangeInputs(qe)
    val leaky = inputs.filter(l => l.contains("payload#") || l.contains("text#"))
    assert(leaky.isEmpty, s"m14 shuffles media payload:\n${leaky.mkString("\n")}")
    val hinted = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.hint.leftHint.exists(_.strategy.isDefined) ||
             j.hint.rightHint.exists(_.strategy.isDefined) => j
    }
    assert(hinted.isEmpty, "m14 carries a forced join hint on a corpus-scaling side")
    // the O(ingest) arrival contract: the ingest side is a FRESH scan
    // (not the full-corpus session memo, which a filter cannot prune),
    // and the % 10 slice filter sits BELOW the typed sampling boundary
    // — Catalyst cannot push predicates through SerializeFromObject/
    // MapPartitions, so a filter above them means the whole corpus is
    // deserialized and hashed per call (second review pass: the first
    // "fix" had exactly that shape and the original assertions —
    // filter anywhere in the plan — green-lit it)
    val plan = PlanTestUtils.formatted(qe)
    val docScans = plan.linesIterator.count(l =>
      l.contains("Location") && l.contains("documents"))
    assert(docScans == 1, s"expected 1 documents scan (ingest slice), got $docScans")
    assert(!plan.contains("InMemoryRelation"),
      "the arrival path reads a full-corpus session memo")
    val sliceFilters = qe.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.condition.toString.contains("% 10") => f
    }
    assert(sliceFilters.nonEmpty, "the ingest slice filter is missing")
    // polarity matters: an inverted slice (=!= 0, the index build's
    // predicate) below the boundary would decode the 90% BASE corpus
    // per call while every structural assertion here still passed
    assert(sliceFilters.exists(_.condition.toString.contains("% 10) = 0")),
      "the slice filter is not the ingest polarity (= 0)")
    sliceFilters.foreach { f =>
      val typedBelow = f.child.collectFirst {
        case m: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => m
        case so: org.apache.spark.sql.catalyst.plans.logical.SerializeFromObject => so
      }
      assert(typedBelow.isEmpty,
        "the slice filter sits ABOVE the typed decode boundary — full-corpus decode")
    }
  }

  test("s24 delete: tombstones exclude via LeftAnti; every serve window partitions by q_id") {
    val qe = queries("s24_ann_delete")(spark, sf).queryExecution
    val anti = qe.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(anti.nonEmpty, "the live assignment is not a tombstone anti-join")
    val unpartitioned = qe.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "an unpartitioned window would serialize the serve path")
  }

  test("s25 refit decision: window-free — one-row reports broadcast into the decision row") {
    val qe = queries("s25_refit_decision")(spark, sf).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty, s"s25 grew ${windows.length} windows — the decision row must compose aggregates only")
  }

  test("a40 scd2: every window is user-partitioned; the interval close runs over island rows") {
    // Hot users are the ONLY tolerated skew surface: an unpartitioned
    // window (or one keyed on something else) would serialize the
    // whole history build into one task at scale.
    val qe = queries("a40_scd2_history")(spark, sf).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.length == 3, s"expected 3 windows (lag, running sum, lead), got ${windows.length}")
    windows.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("user_id")),
        s"a window is not user-partitioned: ${w.partitionSpec}")
    }
    // the lead window must consume the AGGREGATE (islands), not events:
    // its subtree contains the groupBy — bounded per user by change
    // count, not event count
    val leadAboveAgg = windows.exists(w => w.child.collectFirst {
      case a: Aggregate => a
    }.nonEmpty)
    assert(leadAboveAgg, "the interval-close window does not run over island rows")
  }

  test("a41/a42 zorder: window-free; bounds broadcast; the key math stays in one codegen stage") {
    Seq("a41_zorder_layout", "a42_zorder_pruning").foreach { q =>
      val qe = queries(q)(spark, sf).queryExecution
      val windows = qe.optimizedPlan.collect { case w: LWindow => w }
      assert(windows.isEmpty, s"$q grew a window — the layout audit is pure aggregate")
      val text = PlanTestUtils.formatted(qe)
      assert(text.contains("BroadcastNestedLoopJoin") || text.contains("BroadcastExchange"),
        s"$q: the dimension bounds are not a one-row broadcast")
      val ordScans = text.linesIterator.count(l =>
        l.contains("Location") && l.contains("orders"))
      assert(ordScans == 2, s"$q: expected 2 orders scans (bounds + keys), got $ordScans")
      // the Morton arithmetic must be codegen'd row-local work — no UDF
      // (BatchEvalPython/ScalaUDF) may appear anywhere in the key path
      assert(!text.contains("UDF") && !text.contains("BatchEval"),
        s"$q: the z-key math fell out of codegen")
    }
  }

  test("t34 bpe: the merge-candidate cut is a distributed TakeOrdered over one documents scan") {
    val qe = queries("t34_bpe_merge_stats")(spark, sf).queryExecution
    assert(PlanTestUtils.formatted(qe).contains("TakeOrderedAndProject"),
      "the top-pairs cut is not a distributed TakeOrdered")
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.isEmpty, "t34 grew a window")
    val docScans = PlanTestUtils.formatted(qe).linesIterator.count(l =>
      l.contains("Location") && l.contains("documents"))
    assert(docScans == 1,
      s"expected 1 documents scan (pair counting is vocabulary-scale), got $docScans")
  }

  test("d23 manifest: the merge layer is a single equi-join when-chain, window-free") {
    // Both document relations are total over the arrival slice, so
    // the two-priority merge must stay ONE join + when-chain (each
    // family pipeline evaluated once — the r17 review retired a
    // union+argmin that consumed every un-memoized probe frame
    // twice). The manifest composition itself adds NO window on top
    // of the family subtrees (the only windows in the whole plan are
    // the s23/s24 serving probes' per-query bounded frames).
    val qe = queries("d23_arrival_manifest")(spark, sf).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "the manifest merge grew an unpartitioned window")
    windows.foreach { w =>
      assert(w.partitionSpec.exists(_.toString.contains("vec_id")),
        s"a manifest window is not a per-vector ANN frame: ${w.partitionSpec}")
    }
    // the retired shape's signature: a struct-argmin over a signal
    // union would reappear here first
    assert(!PlanTestUtils.formatted(qe).contains("min(struct("),
      "the document merge regressed to the double-evaluating union+argmin")
  }

  test("s26 compacted serving: scan-rooted on the materialized state, no anti-join") {
    // The point of compacting: the tombstone anti-join ran ONCE at
    // materialization. The serving plan must read the compacted
    // parquet and contain no LeftAnti — if one reappears, serving
    // went back to paying for deleted vectors per query.
    val df = queries("s26_compacted_serving")(spark, sf)
    val text = PlanTestUtils.formatted(df.queryExecution)
    assert(!text.contains("LeftAnti"),
      "s26 serving re-plans the tombstone anti-join per query")
    assert(df.inputFiles.exists(_.contains("graft_memo/ivf_asg_compacted")),
      "s26 does not read the compacted materialization")
  }
}
