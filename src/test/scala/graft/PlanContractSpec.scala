package graft

import org.apache.spark.sql.functions._

/** Plan contracts over the ENTIRE query registry — the anti-patterns a
  * 100 TB deployment cannot absorb, asserted on the physical plan of
  * every registered query rather than spot-checked per suite:
  *
  *  - no CartesianProduct anywhere (a broadcast nested-loop against a
  *    1-row query vector is fine; an unbroadcast cartesian is corpus² —
  *    never acceptable);
  *  - scan-reaching predicate pushdown on the flagship filters (a
  *    filter evaluated above the scan reads 100 TB to discard most of
  *    it).
  *
  * Planning runs at sf0.001 — these are shape assertions, not timings.
  */
class PlanContractSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("no registered query plans a CartesianProduct") {
    // Constructing mm_* queries eagerly materializes the asset store
    // (a real render+parquet write, once per process) — accepted here:
    // the cost is paid by whichever suite touches the store first, and
    // the assertion itself still only reads plan shape. NonFatal only:
    // a fatal error (OOM, linkage) must crash the suite, not be
    // converted into a 'failed to plan' finding.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      } catch {
        case scala.util.control.NonFatal(e) =>
          Some(s"$name (failed to plan: ${e.getMessage})")
      }
    }
    assert(offenders.isEmpty, s"cartesian/unplannable: ${offenders.mkString(", ")}")
  }

  test("flagship filters reach the parquet scan as pushed filters") {
    // disjunctive equality (T5): the In() must land in PushedFilters,
    // not in a Filter above the scan.
    val t5 = SparkEntry.queries("t5_filter_isin")(spark, sf)
    val t5plan = t5.queryExecution.executedPlan.toString
    assert(t5plan.matches("(?s).*PushedFilters: \\[[^\\]]*In\\(event_type.*"), t5plan)
    // pricing summary's shipdate range — the filter that decides whether
    // a 100 TB lineitem scan can skip row groups by min/max stats.
    // (Asserting IsNotNull(text) on the dedup scans would be wrong twice
    // over: dedup_exact deliberately has no filter — null texts form
    // their own hash group, same as the oracle — and the blocked path's
    // guard gets constraint-rewritten to isnotnull(substring(text,1,50)),
    // which subsumes it but is not a pushable attribute predicate.)
    val ps = SparkEntry.queries("q_pricing_summary")(spark, sf)
    val psPlan = ps.queryExecution.executedPlan.toString
    assert(psPlan.matches("(?s).*PushedFilters: \\[[^\\]]*LessThanOrEqual\\(l_shipdate.*"), psPlan)
    // Q3 shape: all THREE sides' filters must reach their own scans —
    // an unpushed side reads its whole table before the join.
    val sp = SparkEntry.queries("q_shipping_priority")(spark, sf)
    val spPlan = sp.queryExecution.executedPlan.toString
    assert(spPlan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment.*"), spPlan)
    assert(spPlan.matches("(?s).*PushedFilters: \\[[^\\]]*LessThan\\(o_orderdate.*"), spPlan)
    assert(spPlan.matches("(?s).*PushedFilters: \\[[^\\]]*GreaterThan\\(l_shipdate.*"), spPlan)
  }

  test("fixed-cardinality dimensions join as broadcasts, not shuffles") {
    // nation (25 rows) and region (5 rows) carry explicit broadcast
    // hints — at 100 TB a sort-merge join against them would shuffle the
    // fact side for nothing. The static plan must show the broadcast.
    val j = SparkEntry.queries("q_join_revenue_by_nation")(spark, sf)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"dimension join is not broadcast:\n$plan")
    // semantic decontamination: the benchmark side must ride a
    // BROADCAST nested loop — a shuffled corpus-vs-bench pairing would
    // move 100 TB of embeddings for a few-thousand-row suite
    val sd = SparkEntry.queries("sim_decontaminate_semantic")(spark, sf)
    val sdPlan = sd.queryExecution.executedPlan.toString
    assert(sdPlan.contains("BroadcastNestedLoopJoin"),
      s"semantic decontamination lost its broadcast bench side:\n$sdPlan")
  }

  test("bucketed fact-fact join pays no exchange on either input") {
    // q_bucketed_join_revenue's point: both sides were bucketed by the
    // join key at write time, so the only shuffle in the whole plan is
    // the 5-row priority rollup's — neither join key may appear as an
    // exchange. A per-partition Sort DOES remain on each input and is
    // accepted: Spark 3+ ignores sortBy metadata at scan time (the
    // pre-3.0 behavior hides behind
    // spark.sql.legacy.bucketedTableScan.outputOrdering, not a flag a
    // library should set globally), and sorting writeBucketed's
    // already-sorted single-file buckets is a merge-ready O(n) pass —
    // the eliminated EXCHANGE is the 100 TB cost, not the sort.
    val bj = SparkEntry.queries("q_bucketed_join_revenue")(spark, sf)
    val plan = bj.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"bucketed join lost its SMJ pin:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join input shuffles:\n$plan")
  }

  test("ivf-pq probe prunes unprobed cells and scans codes, never raw embeddings") {
    // The production ADC probe (nprobe=4 of 16 cells) must read only
    // its probed list_id partitions — the file-level pruning that makes
    // a 100 TB probe touch nprobe/nlist of the store — and the scanned
    // store must be codes-only: reading raw embeddings anywhere in the
    // probe plan would void PQ's entire memory claim.
    val pq = SparkEntry.queries("sim_ann_ivfpq_topk")(spark, sf)
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"no partition pruning in ivf-pq probe plan:\n$plan")
    assert(plan.contains("codes") && !plan.contains("embedding"),
      s"ivf-pq probe plan touches raw embeddings:\n$plan")
  }

  test("ivfadc residual probe: per-cell scans pruned, codes-only, exchange-free union") {
    // The residual query unions one partition-pruned scan per probed
    // cell (the cell's centroid folded into that scan's LUT literals).
    // Contracts: every scan pruned on list_id, the plan never touches
    // raw embeddings (PQ's memory claim survives residual encoding),
    // and the union + top-k add NO shuffle exchange — per-query cost
    // stays probed-cells-sized at any corpus scale.
    val dir = graft.ops.Similarity.ensureIvfPqResidualDomainIndex(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val res = graft.ops.Similarity.queryIvfPq(spark, dir, q, k = 20,
      nprobe = 4, excludeVecId = 0L)
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"no partition pruning in residual probe plan:\n$plan")
    assert(plan.contains("codes") && !plan.contains("embedding"),
      s"residual probe plan touches raw embeddings:\n$plan")
    assert(!plan.contains("Exchange"),
      s"residual probe union pays a shuffle:\n$plan")
  }

  test("batched ADC join scans codes with cell pruning; raw embeddings only on the query side") {
    // The batched PQ join's memory claim: the JOINED (corpus) side is
    // the codes store, partition-pruned to the batch's probed cells.
    // The query side legitimately reads raw embeddings (they ARE the
    // queries), so the contract is scoped to the store scan: a codes
    // scan exists, it carries list_id partition filters, and the raw
    // assigned/sidecar stores never appear.
    val pq = SparkEntry.queries("sim_knn_join_pq_topk")(spark, sf)
    val plan = pq.queryExecution.executedPlan.toString
    assert(plan.contains("codes"),
      s"batched ADC join does not scan a codes store:\n$plan")
    assert(plan.contains("PartitionFilters") && plan.contains("list_id"),
      s"no cell pruning in the batched ADC join plan:\n$plan")
    assert(!plan.contains("assigned_raw") &&
        !plan.contains("/assigned]") && !plan.contains("/assigned/"),
      s"batched ADC join touches a raw vector store:\n$plan")
  }

  test("batched knn joins prune the store by DYNAMIC partition pruning, not a collected literal") {
    // The probed-cell prune must be a DPP subquery planted by the
    // broadcast probe frame on the store scan's list_id partition
    // filter: file-level pruning with no driver round-trip and no
    // In-literal whose 10⁵ entries would bloat the plan at production
    // nlist. Asserted on the raw join, the ADC join, and the two-stage
    // refine's raw-sidecar scan (three scans, three DPP filters).
    val raw = SparkEntry.queries("sim_knn_join_topk")(spark, sf)
    val rawPlan = raw.queryExecution.executedPlan.toString
    assert(rawPlan.contains("dynamicpruning"),
      s"raw knn join store scan has no DPP partition filter:\n$rawPlan")
    assert(!rawPlan.contains("list_id#") || !rawPlan.contains("list_id IN ("),
      s"raw knn join still carries a collected In-literal:\n$rawPlan")
    val adc = SparkEntry.queries("sim_knn_join_pq_topk")(spark, sf)
    val adcPlan = adc.queryExecution.executedPlan.toString
    assert(adcPlan.contains("dynamicpruning"),
      s"batched ADC join store scan has no DPP partition filter:\n$adcPlan")
    val dir = graft.ops.Similarity.ensureIvfPqIndex(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val rr = graft.ops.Similarity.knnJoinIvfPq(spark, dir,
      emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k = 10, nprobe = 4, rerank = 40)
    val rrPlan = rr.queryExecution.executedPlan.toString
    assert("dynamicpruning".r.findAllIn(rrPlan).size >= 2,
      s"two-stage refine misses DPP on the codes or sidecar scan:\n$rrPlan")
    // probe ranking is scan-side: no |Q|xnlist crossJoin against the
    // centroid table, no query-keyed window before the pair stage —
    // the centroid matrix rides the plan as the kernel's literal
    assert(!rawPlan.contains("centroids"),
      s"probe ranking still joins the centroid table:\n$rawPlan")
    // NON-BROADCAST regime (knn-graph / cold-start backlog): the pair
    // join is shuffle-sized, so no broadcast exists for DPP to reuse —
    // pruning must come from the forced-broadcast semi-join against the
    // nlist-bounded probed-cell frame instead; without it this scan
    // silently reads the whole store
    val graph = SparkEntry.queries("sim_knn_graph_topk")(spark, sf)
    val graphPlan = graph.queryExecution.executedPlan.toString
    assert(graphPlan.contains("dynamicpruning"),
      s"non-broadcast knn-graph store scan has no DPP partition filter:\n$graphPlan")
  }

  test("index health reads only the index: packed codes + centroids, corpus never scanned") {
    // The health report's 100 TB claim is that it costs the INDEX's
    // bytes (4 B/vector packed codes + the nlist-row centroid table),
    // never the data lake's: the plan must scan the packed store and
    // must not touch the corpus parquet or any raw embedding column
    // anywhere (the corpus path contains "embedding", so one substring
    // check covers both the column and the file).
    val health = SparkEntry.queries("sim_ann_index_health")(spark, sf)
    val plan = health.queryExecution.executedPlan.toString
    assert(plan.contains("codes_packed"),
      s"index health does not scan the packed codes store:\n$plan")
    assert(!plan.contains("embedding"),
      s"index health plan touches the corpus / raw embeddings:\n$plan")
  }

  test("projection pruning reaches the scan: payload-free metadata query reads no text bytes") {
    // mm_frame_sample fans out on metadata only — its scan must not
    // read the documents text column (ReadSchema pruned to doc_id).
    val fs = SparkEntry.queries("mm_frame_sample")(spark, sf)
    val scans = fs.queryExecution.executedPlan.collectLeaves().map(_.toString)
    val docScan = scans.find(_.contains("documents")).getOrElse(fail("no documents scan"))
    assert(!docScan.contains("text"), s"frame-sample scan reads text: $docScan")
  }

  test("hot scan paths stay inside whole-stage codegen") {
    // an interpreted Expression dropped into a scan-side path silently
    // turns a codegen pipeline into per-row eval — assert the flagship
    // scans carry WholeStageCodegen stages (rendered as *(n) in the
    // simple plan) so that regression is loud
    Seq("q1_kpi_quarter_hour", "t5_filter_isin", "q_pricing_summary",
      "text_quality_scores", "mix_split_assign").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      // AQE only annotates codegen stages in the FINAL plan — execute
      // first (cheap at sf0.001), then read the finalized plan string.
      // collect(), not a noop write: the writer clones the
      // QueryExecution, leaving df's own plan unfinalized.
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*("), s"$name lost whole-stage codegen:\n$plan")
    }
  }

  test("split assignment is shuffle-free: no Exchange anywhere in the plan") {
    // splitAssign is a pure per-row function of doc_id — at 100 TB it
    // must run at scan speed. Any Exchange in this plan is a regression
    // (the sort in the registered query is for the oracle compare only,
    // so the contract checks the operator, not the ordered query).
    val plan = graft.ops.Coverage.splitAssign(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"splitAssign shuffles:\n$plan")
  }

  test("sequence packing's only single-partition work is the 256-row offsets frame") {
    // the corpus-side running sum must be the 256-way prefix-grouped
    // window, never a global one: a SinglePartition exchange feeding a
    // Window over the full corpus serializes 100 TB through one task.
    // The offsets frame's own single-partition window is fine (256 rows
    // after a grp aggregate). Assert the corpus-side window partitions
    // by grp.
    // asserted on the optimized LOGICAL plan: AQE wraps the physical
    // tree, hiding WindowExec from collect() before execution
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = graft.ops.Coverage.packSequences(Tables.documents(spark, sf))
      .queryExecution.optimizedPlan
    val windows = lp.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "no window in packing plan")
    assert(windows.exists(_.partitionSpec.nonEmpty),
      s"corpus running sum lost its grp partitioning:\n$lp")
    // and every UNpartitioned window must sit above the tiny grouped
    // offsets aggregate, not above a corpus-sized child
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.child.collect { case a: Aggregate => a }.nonEmpty,
        s"global window not over the aggregated offsets frame:\n$w")
    }
  }

  test("domain assignment is scan-side: zero exchanges, zero windows, zero joins") {
    // the committed-table argmin must stay a projection (least over
    // literal-centroid structs inside WSCG) — a window or join here
    // would shuffle the full corpus to pick among 8 literals
    val plan = graft.ops.Similarity.assignDomains(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"domain argmin shuffles:\n$plan")
    assert(!plan.contains("Window"), s"domain argmin windows:\n$plan")
    assert(!plan.contains("Join"), s"domain argmin joins:\n$plan")
  }

  test("semdedup pairs never window; the gate broadcasts the batch, never shuffles history") {
    // batch operator: the keep-rule is a per-pair CASE resolved in the
    // join projection — a Window (rank within neighborhoods) would add
    // a second corpus shuffle for nothing
    val sd = graft.ops.Similarity.semDeDup(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!sd.contains("Window"), s"semdedup windows:\n$sd")
    // streaming gate: the admitted store is the unbounded side — it
    // must be scanned once behind a broadcast of the micro-batch, never
    // sort-merge shuffled (at k× history that shuffle IS the bill)
    val assigned = graft.ops.Similarity.domainWithNorm(Tables.embeddings(spark, sf))
    val gate = graft.ops.Similarity.semDeDupGateDropped(
        assigned.limit(50),
        assigned.select(col("domain"), col("embedding"), col("nrm")), 0.3)
      .queryExecution.executedPlan.toString
    assert(gate.contains("BroadcastHashJoin"), s"gate join not broadcast:\n$gate")
    assert(!gate.contains("SortMergeJoin"), s"gate shuffles history:\n$gate")
    // against the FILE-BACKED admitted store (domain=D/ingest_batch=N,
    // the r19 layout): the gate join must plant a DPP subquery on the
    // history scan — per-batch IO prunes to the batch's domains at the
    // file level with no collected domain literal
    val storeDir = tmpDir("plan-sd-store")
    assigned.limit(200)
      .select(col("vec_id"), col("domain"), col("embedding"), col("nrm"))
      .withColumn("ingest_batch", org.apache.spark.sql.functions.lit(0L))
      .write.mode("overwrite").partitionBy("domain", "ingest_batch")
      .parquet(storeDir)
    val gateFs = graft.ops.Similarity.semDeDupGateDropped(
        assigned.limit(50),
        spark.read.parquet(storeDir)
          .filter(col("ingest_batch") < 1L)
          .select(col("domain"), col("embedding"), col("nrm")), 0.3)
      .queryExecution.executedPlan.toString
    assert(gateFs.contains("dynamicpruning"),
      s"gate history scan has no DPP partition filter:\n$gateFs")
  }

  test("audit stage filters read the cached scored frame, never re-score") {
    // The rejection audit necessarily scores PER DOC (each raw doc needs
    // its own verdict), so it cannot use curate's dedup-first pushdown
    // barrier; its barrier is the persisted scored frame instead. The
    // contract: every Filter in the optimized plan is free of cleaning-
    // chain copies on the TRAIN side — stage filters (gate_stage
    // is/isn't null, doc_id = keep) must read InMemoryRelation
    // attributes, not re-run the regexes per raw row. The small bench
    // side is re-cleaned by construction (it is not cached) but carries
    // no Filter over the cleaning chain either: its shingle guards
    // (isNotNull, size >= 3) constraint-rewrite onto the raw text
    // column, not the cleaned alias.
    import org.apache.spark.sql.catalyst.expressions.{Expression, RegExpReplace}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    def copies(e: Expression): Int = e.collect { case _: RegExpReplace => 1 }.sum
    for (q <- Seq("pipeline_curate_audit", "pipeline_curate_funnel")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val perFilter = lp.collect { case f: LFilter => copies(f.condition) }
      assert(perFilter.sum == 0,
        s"$q: cleaning chain substituted into a Filter (copies per filter: " +
          s"${perFilter.mkString(",")}) — per-raw-row re-evaluation:\n$lp")
    }
    // the barrier behind the whole family is the write-once ledger
    // PARQUET store (the k8 producer/consumer contract): audit reads
    // the ledger itself, the funnel aggregates it, the examples top-N
    // join it — so none of their plans may carry the cleaning chain at
    // all, anywhere, or the store amortization silently regressed to a
    // full recompute. (The ledger COMPUTATION's own barrier — the
    // persisted scored frame — is asserted on auditLedger directly.)
    for (q <- Seq("pipeline_curate_audit", "pipeline_curate_funnel")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val total = lp.map(op => op.expressions.map(copies).sum).sum
      assert(total == 0,
        s"$q: $total cleaning-chain copies — this row should consume the " +
          s"materialized ledger store, not recompute it:\n$lp")
    }
    val ledgerLp = graft.ops.Curation.auditLedger(
      Tables.documents(spark, sf).filter(col("doc_id") % 10 =!= 0),
      Tables.documents(spark, sf).filter(col("doc_id") % 10 === 0))
      .queryExecution.optimizedPlan
    val cached = ledgerLp.collect {
      case r if r.getClass.getSimpleName.startsWith("InMemoryRelation") => 1
    }.sum
    assert(cached >= 1,
      s"auditLedger: no InMemoryRelation — the persist barrier is gone:\n$ledgerLp")
  }

  test("curation gate is not substituted into a per-raw-row filter") {
    // The round-10 lesson: PushDownPredicates substitutes a filter on
    // projected columns through the projections — the curation gate's
    // optimized Filter carried 53 copies of the cleaning regex chain,
    // re-evaluated per RAW row (operators don't share subexpressions;
    // a Filter's copies are real work). The dedup-first shape pins the
    // gate above the sha-aggregate. Contract: NO Filter node carries
    // the cleaning chain, and total plan copies stay at the first
    // aggregate's two grouping keys (sha2(cleaned) + cleaned — one
    // runtime eval: within a single operator whole-stage codegen's
    // subexpression elimination shares them).
    // counted on the logical TREE, not the plan string: an
    // InMemoryRelation prints its cached subtree's rebuild recipe as
    // innerChildren (description, not evaluation sites), and collect()
    // correctly does not descend into it
    import org.apache.spark.sql.catalyst.expressions.{Expression, RegExpReplace}
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    def copies(e: Expression): Int = e.collect { case _: RegExpReplace => 1 }.sum
    for (q <- Seq("pipeline_curate_corpus", "pipeline_curate_canonical")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val filterCopies = lp.collect { case f: LFilter => copies(f.condition) }.sum
      assert(filterCopies == 0,
        s"$q: cleaning chain substituted into a Filter ($filterCopies copies) — " +
          s"per-raw-row re-evaluation is back:\n$lp")
      val total = lp.map(op => op.expressions.map(copies).sum).sum
      assert(total <= 8,
        s"$q: cleaning chain has $total evaluation-site copies (want <= 8: " +
          s"one aggregate's grouping key + min(t), shared by codegen subexpr elim):\n$lp")
    }
  }

  test("curate's corpus-sized reduction is hash-based; sort aggregates only above the exchange") {
    // The accepted residual in curate's two-level aggregate
    // (Curation.scoredDistinct): A1 — the corpus-sized reduction,
    // grouping by (sha2(t), t) with primitive buffers — must plan as
    // HashAggregate, because a SortAggregate THERE sorts every raw
    // partition of a 100 TB scan before the shuffle (the round-10
    // hazard). A2's min(t)-style string buffers legitimately plan as
    // SortAggregate, but only over the POST-exchange, distinct-text-
    // sized side. Round 11 accepted this split on the strength of a
    // comment; this pins it: a future edit that reintroduces a
    // raw-corpus sort (e.g. collapsing the levels, or moving min(t)
    // into A1) fails here, not in a bench regression two rounds later.
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, ShuffleQueryStageExec}
    import org.apache.spark.sql.execution.aggregate.{BaseAggregateExec, HashAggregateExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.{ENSURE_REQUIREMENTS, ShuffleExchangeExec, ShuffleExchangeLike}
    // another suite/test may have left the curated frame cached, in
    // which case the cache manager substitutes an InMemoryRelation for
    // the whole aggregate subtree — plan from a clean cache so the
    // assertion sees the real tree (the deep helpers below still
    // descend wrappers for order-independence)
    spark.catalog.clearCache()
    // a GROUPING shuffle (EnsureRequirements-inserted) is a cardinality
    // boundary; scanWide's REPARTITION_BY_NUM width rebalance is not —
    // everything below the first grouping shuffle is corpus-sized
    def isGroupingShuffle(p: SparkPlan): Boolean = p match {
      case e: ShuffleExchangeExec => e.shuffleOrigin == ENSURE_REQUIREMENTS
      case _: ShuffleExchangeLike => false
      case _ => false
    }
    def expand(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: ShuffleQueryStageExec => Seq(q.plan)
      case s: InMemoryTableScanExec => Seq(s.relation.cachedPlan)
      case other => other.children
    }
    def deepCollect[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
      (if (pf.isDefinedAt(p)) Seq(pf(p)) else Nil) ++ expand(p).flatMap(deepCollect(_)(pf))
    // reaches the RAW file scan with no grouping shuffle in between
    def reachesScan(p: SparkPlan): Boolean = p match {
      case _: FileSourceScanExec => true
      case _: InMemoryTableScanExec => false
      case _ if isGroupingShuffle(p) => false
      case _: ShuffleQueryStageExec => false
      case _ => expand(p).exists(reachesScan)
    }
    def hasExchangeBelow(p: SparkPlan): Boolean = p match {
      case _ if isGroupingShuffle(p) => true
      case _: ShuffleQueryStageExec => true
      case s: InMemoryTableScanExec => hasExchangeBelow(s.relation.cachedPlan)
      case _ => expand(p).exists(hasExchangeBelow)
    }
    val plan = SparkEntry.queries("pipeline_curate_corpus")(spark, sf)
      .queryExecution.executedPlan
    val aggs = deepCollect(plan) { case a: BaseAggregateExec => a }
    val scanSide = aggs.filter(a => a.children.exists(reachesScan))
    assert(scanSide.nonEmpty, s"no aggregate over the raw scan found:\n$plan")
    scanSide.foreach { a =>
      assert(a.isInstanceOf[HashAggregateExec],
        s"corpus-sided aggregate is ${a.getClass.getSimpleName}, not hash-based " +
          s"(raw-corpus sort is back):\n$plan")
    }
    val sortSide = aggs.filterNot(_.isInstanceOf[HashAggregateExec])
    sortSide.foreach { a =>
      assert(a.children.exists(hasExchangeBelow),
        s"non-hash aggregate consumes pre-shuffle (corpus-sized) input:\n$a")
    }
  }

  test("JSON envelope work rebalances off the scan's split before evaluating") {
    // cheap scan, expensive map: a one-row-group parquet input arrives
    // as ONE split, and without an explicit rebalance the per-row
    // Jackson build/parse runs entirely on one core (t8 measured 3.5 s
    // wall vs 5.8 s cpu on 32 cores). The contract: a repartition exists
    // AND the JSON expressions evaluate above it, not below (Catalyst
    // must not have pushed the projection under the exchange).
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
    for (q <- Seq("t8_wide_nested_projection", "t6_json_parse_expand")) {
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.optimizedPlan
      val reparts = lp.collect { case r: RepartitionOperation => r }
      assert(reparts.nonEmpty, s"$q lost its pre-projection rebalance:\n$lp")
      reparts.foreach { r =>
        val below = r.child.toString
        assert(!below.contains("from_json") && !below.contains("to_json"),
          s"$q evaluates JSON below the rebalance (single-split stage):\n$lp")
      }
    }
  }

  test("per-user window operators pay exactly one event-grain exchange") {
    // funnel / retention / sessionize all claim "one shuffle on user_id,
    // windows share it" (Temporal scaladoc + PLANS.md). A second
    // user_id exchange means the window specs diverged and Catalyst
    // stopped sharing — at 100 TB that doubles the dominant cost.
    // Rollup-grain exchanges (stage / cohort / session rows) are fine
    // and not counted.
    for (q <- Seq("t_funnel_steps", "agg_retention_cohorts", "t_sessionize",
      "t_trailing_window")) {
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      val userExchanges = "hashpartitioning\\(user_id".r.findAllIn(plan).size
      assert(userExchanges == 1,
        s"$q has $userExchanges user_id exchanges (want 1):\n$plan")
    }
    // training-order sharding: the rank's shard exchange is the ONLY one
    // (the operator, not the registered query — its ORDER BY is for the
    // oracle compare, same caveat as the splitAssign contract above)
    val sh = graft.ops.Coverage.shuffleShards(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert("hashpartitioning\\(shard".r.findAllIn(sh).size == 1 &&
      "Exchange".r.findAllIn(sh).size == 1,
      s"shuffle shards should shuffle once, on shard:\n$sh")
  }

  test("families' mutual-edge aggregation pays ONE exchange over the directed graph") {
    // sim_knn_graph_families' plan story has two halves: the mutual
    // aggregation (pinned here — the graph is aggregated ONCE, never
    // self-joined, so mutuality adds exactly one pair-keyed exchange
    // to the directed knn plan) and the propagation loop (pinned by
    // DedupSpec's round-count property — the loop runs actions
    // internally, so the registered query's final plan cannot carry
    // it; its labels frame is a checkpointed leaf by design).
    val dir = graft.ops.Similarity.ensureIvfIndex(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val directed = graft.ops.Similarity.knnJoinIvf(spark, dir,
      emb.select(col("vec_id").as("query_id"), col("embedding")),
      k = 3, nprobe = 4, hintBroadcast = false)
      .filter(col("cos_sim") >= 0.3)
      .select(col("query_id").as("src_id"), col("vec_id").as("dst_id"))
    val edges = graft.ops.Similarity.mutualKnnEdges(directed)
    val pDir = directed.queryExecution.executedPlan.toString
    val pEdges = edges.queryExecution.executedPlan.toString
    def exchanges(p: String) = "Exchange".r.findAllIn(p).size
    assert(exchanges(pEdges) == exchanges(pDir) + 1,
      s"mutual aggregation should add exactly ONE exchange " +
        s"(${exchanges(pDir)} -> ${exchanges(pEdges)}); a self-joined " +
        s"spelling doubles the graph's own exchanges:\n$pEdges")
    assert("hashpartitioning\\(doc_a".r.findAllIn(pEdges).size == 1,
      s"want one pair-keyed exchange for the mutual agg:\n$pEdges")
    assert(!pEdges.contains("CartesianProduct"),
      s"mutual aggregation plans a cartesian:\n$pEdges")
  }
}
