package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Curation

/** Embedding-carrying document row for the fully-composed audit test. */
case class DocEmb(doc_id: Long, text: String, embedding: Seq[Double])

/** Streaming rejection audit — per-batch drop ledger vs the batch
  * auditLedger: exact parity under ordered arrival, plus the two
  * documented first-admitted-wins divergences.
  */
class AuditStreamSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
    "on the warm windowsill every afternoon enjoying the quiet sunshine"
  private val fresh = "entirely new material discussing the streaming watermark state " +
    "expiry and the checkpoint recovery semantics in long running jobs"
  private val benchText = "when the benchmark asks about the capital of france the answer " +
    "is paris and the model should not have memorized this exact phrasing"
  // embeds the benchmark verbatim (>= 5 shared shingles) behind a
  // distinct prefix so it can never prefix-block with anything
  private val leak = "students please note that " + benchText

  test("audit stream equals the batch ledger under ordered arrival (all stages exercised)") {
    val train = Seq(
      Doc(1, base),
      Doc(2, base.replace("warm", "cold")), // near-dup of 1
      Doc(3, base), // exact dup of 1
      Doc(4, "too short"), // token floor
      Doc(5, "zz qq ww rr tt yy uu ii oo pp aa ss"), // no stopwords -> und -> lang gate
      Doc(6, "the the the the the the the the the the ! ! ! ! ! ! ! ! ! !"), // en but junk -> quality gate
      Doc(7, "[REDACTED_BLOCK]"), // cleans to empty
      Doc(8, leak), // decontaminated
      Doc(9, fresh)) // admitted
    val bench = Seq(Doc(1000, benchText))
    val expected = Curation.auditLedger(train.toDF(), bench.toDF())
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    // guard: the fixture really exercises every stage, or parity is vacuous
    assert(expected.map(_._2) == Set("clean_empty", "token_floor", "lang_gate",
      "quality_gate", "exact_dup", "near_dup", "decontaminated"), s"fixture gap: $expected")

    val root = tmpDir("audit-stream-store")
    val benchStore = tmpDir("audit-bench-store")
    // benchText contains no URL/tag/boilerplate: raw == cleaned, so the
    // store built on raw text matches the batch audit's cleaned contract
    Jobs.buildBenchmarkShingleStore(bench.toDF(), benchStore)
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit-stream-ckpt"),
      benchStoreDir = Some(benchStore), queryTrigger = Trigger.ProcessingTime(0))
    try train.foreach { d => ms.addData(d); q.processAllAvailable() } // singleton, id-ordered
    finally q.stop()

    val got = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    assert(got == expected, s"stream=$got\nbatch=$expected")
    val admitted = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == train.map(_.doc_id).toSet -- got.map(_._1))

    // replay idempotence (foreachBatch is at-least-once): re-running the
    // last batch body changes neither the ledger nor the stores
    val benchFrame = spark.read.parquet(benchStore).select("bench_doc", "shh")
    Jobs.auditLedgerBatch(root, Jobs.AuditGate.Exact(benchFrame))(Seq(train.last).toDF(), (train.length - 1).toLong)
    val got2 = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    assert(got2 == expected, s"replay changed the ledger: $got2")
    assert(spark.read.parquet(s"$root/hashes").count() ==
      admitted.size, "replay changed the hash store")

    // the store-side funnel telescopes over the stream's whole history
    val funnel = Jobs.auditFunnelFromStores(spark, root).collect()
    assert(funnel.length == Curation.auditStages.length)
    assert(funnel.head.getAs[Long]("n_in") == train.length.toLong)
    assert(funnel.last.getAs[Long]("n_out") == admitted.size.toLong)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
    }
  }

  test("fully-composed audit: nine stages in ONE batch body, parity and replay") {
    // One foreachBatch drives gate stages 1-4, the dedup stores (5-6),
    // shingle decontamination (7), the LM-perplexity gate (8), and the
    // semantic embedding gate (9). Stages 1-7 must equal the batch
    // auditLedger doc-for-doc; 8 and 9 are pinned against the scoring
    // primitives they wrap (lmScoreAgainst / exact cosine).
    val semTarget = "the checkpoint recovery semantics keep every long " +
      "running job consistent after a restart"
    // in-vocabulary words in out-of-distribution order: unigrams the LM
    // knows, bigrams it has never seen -> low average log-prob
    val salad = "jobs the watermark a recovery the expiry material " +
      "checkpoint a streaming state new semantics"
    val ortho = Seq(0.0, 1.0, 0.0, 0.0)
    val train = Seq(
      DocEmb(1, base, ortho),
      DocEmb(2, base.replace("warm", "cold"), ortho), // near-dup of 1
      DocEmb(3, base, ortho), // exact dup of 1
      DocEmb(4, "too short", ortho), // token floor
      DocEmb(5, "zz qq ww rr tt yy uu ii oo pp aa ss", ortho), // lang gate
      DocEmb(6, "the the the the the the the the the the ! ! ! ! ! ! ! ! ! !", ortho), // quality
      DocEmb(7, "[REDACTED_BLOCK]", ortho), // cleans to empty
      DocEmb(8, leak, ortho), // decontaminated
      DocEmb(9, fresh, ortho), // admitted through all nine stages
      DocEmb(10, salad, Seq(0.0, 0.0, 1.0, 0.0)), // lm_gate
      DocEmb(11, semTarget, Seq(2.0, 0.0, 0.0, 0.0))) // semantic (cos 1 vs bench)
    val bench = Seq(Doc(1000, benchText))

    // stages 1-7 ground truth from the batch form (it admits 9, 10, 11)
    val batchExpected = Curation.auditLedger(
      train.map(d => Doc(d.doc_id, d.text)).toDF(), bench.toDF())
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    assert(batchExpected.map(_._1) == Set(2L, 3L, 4L, 5L, 6L, 7L, 8L),
      s"fixture drift: $batchExpected")
    assert(batchExpected.map(_._2) == Set("clean_empty", "token_floor", "lang_gate",
      "quality_gate", "exact_dup", "near_dup", "decontaminated"),
      s"fixture gap: $batchExpected")

    // static stores: shingle benchmark, bigram LM, benchmark embedding
    val benchStore = tmpDir("audit9-bench")
    Jobs.buildBenchmarkShingleStore(bench.toDF(), benchStore)
    val lmStore = tmpDir("audit9-lm")
    Jobs.buildLmStore(Seq(Doc(100, base), Doc(101, fresh), Doc(102, semTarget),
      Doc(103, benchText)).toDF(), lmStore)
    val embStore = tmpDir("audit9-emb")
    Jobs.buildBenchmarkEmbeddingStore(
      Seq(Emb(1000L, "bench", Seq(1.0, 0.0, 0.0, 0.0))).toDF(), embStore)

    // derive the LM threshold from the actual scores: salad must sit
    // clearly below the legitimate stage-8 entrants (9 and 11)
    val cb = spark.read.parquet(s"$lmStore/bigrams")
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    val v = spark.read.parquet(s"$lmStore/meta").head().getLong(0)
    val scores = graft.ops.TextAnalysis.lmScoreAgainst(
      Seq(9L -> fresh, 10L -> salad, 11L -> semTarget).toDF("doc_id", "text"), cb, cu, v)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(10L) < math.min(scores(9L), scores(11L)) - 0.5,
      s"salad not separable: $scores")
    val thr = (scores(10L) + math.min(scores(9L), scores(11L))) / 2

    val root = tmpDir("audit9-store")
    val ms = MemoryStream[DocEmb](spark)(org.apache.spark.sql.Encoders.product[DocEmb])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit9-ckpt"),
      benchStoreDir = Some(benchStore),
      lmStoreDir = Some(lmStore), lmMinAvgLogp = thr,
      embStoreDir = Some(embStore), semanticThreshold = 0.9,
      queryTrigger = Trigger.ProcessingTime(0))
    try train.foreach { d => ms.addData(d); q.processAllAvailable() }
    finally q.stop()

    val got = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    // stages 1-7: doc-for-doc parity with the batch ledger
    assert(got.filter(r => r._2 != "lm_gate" && r._2 != "semantic") == batchExpected,
      s"stream=$got\nbatch=$batchExpected")
    // stage 8: the salad doc, with the basis-point rendering
    val lmRows = got.filter(_._2 == "lm_gate")
    assert(lmRows.map(_._1) == Set(10L), s"lm_gate rows: $lmRows")
    assert(lmRows.head._3 == s"avg_logp_bp=${math.floor(scores(10L) * 10000 + 0.5).toLong}",
      s"lm reason: ${lmRows.head._3}")
    // stage 9: the bench-aligned doc at cosine exactly 1
    assert(got.filter(_._2 == "semantic") == Set((11L, "semantic", "bench_cos_bp=10000")),
      s"semantic rows: ${got.filter(_._2 == "semantic")}")
    val admitted = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 9L)) // the two docs that clear all nine stages

    // the full stream-stage funnel telescopes over the whole history
    // (stage 10 is registered but unconfigured here — zero drops)
    val funnel = Jobs.auditFunnelFromStores(spark, root, Jobs.streamAuditStages).collect()
    assert(funnel.length == 11)
    assert(funnel.head.getAs[Long]("n_in") == train.length.toLong)
    assert(funnel.last.getAs[Long]("n_out") == 2L)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
    }
    assert(funnel.map(r => r.getAs[String]("stage")).toSeq ==
      Jobs.streamAuditStages.map(_._2))

    // reading a 9-stage store with the 7-stage DEFAULT table must fail
    // loudly (the silently-dropped-ledger-rows hazard), naming the
    // missing stages
    val e = intercept[IllegalArgumentException] {
      Jobs.auditFunnelFromStores(spark, root).collect()
    }
    assert(e.getMessage.contains("8:lm_gate"), e.getMessage)
    assert(e.getMessage.contains("9:semantic"), e.getMessage)

    // replay idempotence with ALL gates live: re-running the last batch
    // body (at-least-once) changes neither ledger nor stores
    val benchFrame = spark.read.parquet(benchStore).select("bench_doc", "shh")
    val embFrame = spark.read.parquet(embStore).select("be", "bn")
    Jobs.auditLedgerBatch(root, Jobs.AuditGate.Exact(benchFrame),
      lmGate = Some(Jobs.AuditLmGate(cb, cu, v, thr)),
      semanticGate = Some(Jobs.AuditSemanticGate(embFrame, 4, 0.9)))(
      Seq(train.last).toDF(), (train.length - 1).toLong)
    val got2 = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect().toSet
    assert(got2 == got, s"replay changed the ledger")
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 9L), "replay changed admitted")
  }

  test("classifier gate (stage 10): margin threshold drops, reason rendering, funnel conserves") {
    import graft.functions.QualityClf
    // two clean, unique, high-quality texts that pass stages 1-9 (no
    // decon/LM/semantic stores configured) and differ in committed-model
    // margin; the threshold is set BETWEEN them so exactly the
    // lower-margin doc drops at stage 10. Margins come from the same
    // kernel the gate compiles — this test pins the COMPOSITION (stage
    // index, reason rendering, survivor exclusion, funnel row); the
    // kernel's VALUE correctness is the text_quality_classifier oracle
    // row's job.
    val docs = Seq(1L -> base, 2L -> fresh)
    val margins = docs.toDF("doc_id", "text")
      .select(col("doc_id"), call_function("graft_quality_margin",
        split(lower(col("text")), "\\s+"), lit(QualityClf.modelSpec)).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(margins(1L) != margins(2L), s"fixture margins collide: $margins")
    val (lowDoc, highDoc) = if (margins(1L) < margins(2L)) (1L, 2L) else (2L, 1L)
    val thr = (margins(lowDoc) + margins(highDoc)) / 2

    val root = tmpDir("audit10-store")
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit10-ckpt"),
      classifierGate = Some(Jobs.AuditClassifierGate(minMargin = thr)),
      queryTrigger = Trigger.ProcessingTime(0))
    try docs.foreach { case (id, t) => ms.addData(Doc(id, t)); q.processAllAvailable() }
    finally q.stop()

    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet
    assert(ledger == Set((lowDoc, 10L, "classifier",
      s"clf_margin_bp=${math.floor(margins(lowDoc) * 10000 + 0.5).toLong}")),
      s"ledger: $ledger")
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(highDoc))
    // the survivor's words/hashes extended the stores; the dropped
    // doc's did not (stage 10 sits ABOVE the store writes)
    assert(spark.read.parquet(s"$root/hashes").count() == 1L)
    val funnel = Jobs.auditFunnelFromStores(spark, root, Jobs.streamAuditStages).collect()
    assert(funnel.length == 11)
    val clfRow = funnel.find(_.getAs[String]("stage") == "classifier").get
    assert(clfRow.getAs[Long]("n_dropped") == 1L && clfRow.getAs[Long]("n_out") == 1L)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
    }
    // replay idempotence with the classifier live: re-run the LAST
    // batch body with the same ingest id — ledger and admitted unchanged
    Jobs.auditLedgerBatch(root,
      classifierGate = Some(Jobs.AuditClassifierGate(minMargin = thr)))(
      Seq(Doc(docs.last._1, docs.last._2)).toDF(), (docs.length - 1).toLong)
    assert(spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet == ledger)
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(highDoc))
  }

  test("semdedup gate (stage 11) under a fitted quantizer: fitted-cell drops, table-identity refusal") {
    import spark.implicits._
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val w = Seq(0.0, 0.0, 1.0, 0.0)
    // a small fitted table over a synthetic 4-dim corpus spanning both
    // directions — the stage then assigns under THESE cells
    val corpus = (0 until 10).map(i => Emb(100L + i, s"u$i", Seq(1.0, 0.01 * i, 0.0, 0.0))) ++
      (0 until 10).map(i => Emb(200L + i, s"w$i", Seq(0.0, 0.0, 1.0, 0.01 * i)))
    val q = graft.ops.Similarity.fitQuantizerTwoLevel(corpus.toDF(), nlist = 4)
    val t11 = "another standalone passage about broadcast joins and adaptive " +
      "query execution behavior under skewed key distributions"
    val root = tmpDir("audit11q-store")
    val gate = Some(Jobs.AuditSemDeDupGate(eps = 0.9, quantizer = Some(q)))
    Jobs.auditLedgerBatch(root, semDeDupGate = gate)(
      Seq(DocEmb(1, base, u), DocEmb(2, fresh, w)).toDF(), 0L)
    // doc 10 is lexically distinct but an EXACT embedding twin of
    // admitted doc 1 — same fitted cell by construction, cos = 1
    Jobs.auditLedgerBatch(root, semDeDupGate = gate)(
      Seq(DocEmb(10, t11, u)).toDF(), 1L)
    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet
    assert(ledger == Set((10L, 11L, "semdedup", "semdup_of=1")), s"ledger: $ledger")
    // the vecs store carries the FITTED cells (valid absolute ids)
    val doms = spark.read.parquet(s"$root/vecs")
      .select("domain").collect().map(_.getInt(0))
    assert(doms.forall(d => d >= 0 && d < q.nlist))
    // running the same store under the COMMITTED table is refused —
    // verdicts across cell systems would fail silently otherwise
    val exTab = intercept[IllegalArgumentException](
      Jobs.auditLedgerBatch(root,
        semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9)))(
        Seq(DocEmb(20, t11 + " more", w)).toDF(), 2L))
    assert(exTab.getMessage.contains("assignment"), exTab.getMessage)
    // and a wrong-dim batch against the fitted table is refused
    val exDim = intercept[IllegalArgumentException](
      Jobs.auditLedgerBatch(root, semDeDupGate = gate)(
        Seq(DocEmb(21, t11 + " again", Seq(1.0, 0.0))).toDF(), 2L))
    assert(exDim.getMessage.contains("-dim"), exDim.getMessage)
  }

  test("semdedup gate (stage 11) withinBatch: eps-twins in one batch admit exactly one, replay-safe") {
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val o2 = Seq(0.0, 1.0, 0.0, 0.0)
    val t11 = "another standalone passage about broadcast joins and adaptive " +
      "query execution behavior under skewed key distributions"
    val t12 = "yet one more independent paragraph covering watermark " +
      "propagation rules for stateful streaming aggregation operators"
    val root = tmpDir("audit11wb-store")
    val ms = MemoryStream[DocEmb](spark)(org.apache.spark.sql.Encoders.product[DocEmb])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit11wb-ckpt"),
      semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9, withinBatch = true)),
      queryTrigger = Trigger.ProcessingTime(0))
    try {
      // batch 0 (vecs store EMPTY — the intra pass must still run):
      // docs 11 and 12 are lexically distinct but EXACT vector twins in
      // ONE batch — the keep-rule tie admits the lower id and the
      // loser's ledger row names its surviving batch twin
      ms.addData(DocEmb(1, base, u), DocEmb(11, t11, o2), DocEmb(12, t12, o2))
      q.processAllAvailable()
      // batch 1: history still gates exactly as without the option
      ms.addData(DocEmb(20, fresh, o2))
      q.processAllAvailable()
    } finally q.stop()
    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet
    assert(ledger == Set(
      (12L, 11L, "semdedup", "semdup_of=11"),
      (20L, 11L, "semdedup", "semdup_of=11")), s"ledger: $ledger")
    val admitted = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 11L), s"admitted: $admitted")
    assert(spark.read.parquet(s"$root/vecs")
      .select("doc_id").as[Long].collect().toSet == admitted)
    // replay idempotence: the intra pass is a pure function of the
    // batch — re-running the last body changes nothing
    Jobs.auditLedgerBatch(root,
      semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9, withinBatch = true)))(
      Seq(DocEmb(20, fresh, o2)).toDF(), 1L)
    assert(spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet == ledger)
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == admitted)
  }

  test("semdedup gate (stage 11): eps-close to admitted history drops, within-batch passes, replay") {
    // embedding-space intra-stream dedup: doc 10's text is unique (it
    // passes every lexical stage) but its vector sits eps-close to
    // admitted doc 1's — exactly the paraphrased-duplicate leak the
    // word-set near_dup stage cannot see
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val uNear = Seq(1.0, 0.05, 0.0, 0.0)
    val w = Seq(0.0, 0.0, 1.0, 0.0)
    val o2 = Seq(0.0, 1.0, 0.0, 0.0)
    val doms = graft.ops.Similarity
      .assignDomains(Seq(Emb(1, "a", u), Emb(2, "b", uNear)).toDF())
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(doms(1L) == doms(2L), s"fixture nudge crossed a domain: $doms")
    val t10 = "a completely distinct essay describing columnar storage layouts " +
      "and predicate pushdown tradeoffs across analytical engines"
    val t11 = "another standalone passage about broadcast joins and adaptive " +
      "query execution behavior under skewed key distributions"
    val t12 = "yet one more independent paragraph covering watermark " +
      "propagation rules for stateful streaming aggregation operators"

    val root = tmpDir("audit11-store")
    val ms = MemoryStream[DocEmb](spark)(org.apache.spark.sql.Encoders.product[DocEmb])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit11-ckpt"),
      semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9)),
      queryTrigger = Trigger.ProcessingTime(0))
    try {
      // batch 0: vecs store empty, both admitted; store seeds from them
      ms.addData(DocEmb(1, base, u), DocEmb(2, fresh, w))
      q.processAllAvailable()
      // batch 1: doc 10 drops at stage 11 (vector twin of admitted 1);
      // 11 admitted; 12 is a vector twin of 11 IN THE SAME BATCH and
      // passes (within-batch dups are not the gate's contract)
      ms.addData(DocEmb(10, t10, uNear), DocEmb(11, t11, o2), DocEmb(12, t12, o2))
      q.processAllAvailable()
    } finally q.stop()

    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet
    assert(ledger == Set((10L, 11L, "semdedup", "semdup_of=1")), s"ledger: $ledger")
    val admitted = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 2L, 11L, 12L), s"admitted: $admitted")
    // the vecs store carries exactly the admissions, domain-assigned
    val vecs = spark.read.parquet(s"$root/vecs")
      .select("doc_id").as[Long].collect().toSet
    assert(vecs == admitted, s"vecs store: $vecs")
    // funnel: 11 rows, semdedup accounts for the one drop, telescopes
    val funnel = Jobs.auditFunnelFromStores(spark, root, Jobs.streamAuditStages).collect()
    assert(funnel.length == 11)
    val sdRow = funnel.find(_.getAs[String]("stage") == "semdedup").get
    // the funnel spans BOTH batches: 5 docs reach stage 11, 1 drops
    assert(sdRow.getAs[Long]("n_dropped") == 1L && sdRow.getAs[Long]("n_out") == 4L)
    funnel.foreach { r =>
      assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
    }
    // replay idempotence: the last batch body re-run with the same id
    // reads only below-1 history and overwrites its own partitions
    Jobs.auditLedgerBatch(root,
      semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9)))(
      Seq(DocEmb(10, t10, uNear), DocEmb(11, t11, o2), DocEmb(12, t12, o2)).toDF(), 1L)
    assert(spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage_idx", "stage", "reason")
      .as[(Long, Long, String, String)].collect().toSet == ledger)
    assert(spark.read.parquet(s"$root/vecs")
      .select("doc_id").as[Long].collect().toSet == admitted)
    // unscoreable embeddings fail the batch loudly, never pollute
    val exZero = intercept[IllegalArgumentException](
      Jobs.auditLedgerBatch(root,
        semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9)))(
        Seq(DocEmb(20, t10 + " again", Seq(0.0, 0.0, 0.0, 0.0))).toDF(), 2L))
    assert(exZero.getMessage.contains("zero-norm"), exZero.getMessage)
    // enabling the gate OVER history admitted without it is refused:
    // those docs carry no vectors, so their semantic duplicates would
    // silently pass forever
    val root2 = tmpDir("audit11-late")
    Jobs.auditLedgerBatch(root2)(Seq(DocEmb(1, base, u)).toDF(), 0L)
    val exLate = intercept[IllegalArgumentException](
      Jobs.auditLedgerBatch(root2,
        semDeDupGate = Some(Jobs.AuditSemDeDupGate(eps = 0.9)))(
        Seq(DocEmb(2, fresh, w)).toDF(), 1L))
    assert(exLate.getMessage.contains("does not cover"), exLate.getMessage)
  }

  test("bloom-gated audit equals the exact gate on a single-bench fixture (union == pair)") {
    // With ONE benchmark doc, the Bloom gate's union semantics coincide
    // with the pair gate's, so the two audits must produce identical
    // verdicts — only the stage-7 reason differs (evidence count vs
    // per-bench-doc attribution). A Bloom FP would need >= minShared
    // distinct false hits on one doc (~impossible at 2^23 bits), so the
    // no-false-negative containment here is equality.
    val train = Seq(Doc(1, base), Doc(2, leak), Doc(3, fresh))
    val bench = Seq(Doc(1000, benchText))
    val exactRoot = tmpDir("audit-bloom-exact")
    val bloomRoot = tmpDir("audit-bloom-bloom")
    val exactStore = tmpDir("audit-bloom-estore")
    val bloomStore = tmpDir("audit-bloom-bstore")
    Jobs.buildBenchmarkShingleStore(bench.toDF(), exactStore)
    Jobs.buildBenchmarkBloomStore(bench.toDF(), bloomStore)
    def run(root: String, benchDir: Option[String], bloomDir: Option[String]): Unit = {
      val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
      val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir(root.split('/').last + "-ckpt"),
        benchStoreDir = benchDir, bloomStoreDir = bloomDir,
        queryTrigger = Trigger.ProcessingTime(0))
      try train.foreach { d => ms.addData(d); q.processAllAvailable() }
      finally q.stop()
    }
    run(exactRoot, Some(exactStore), None)
    run(bloomRoot, None, Some(bloomStore))
    def ledgerOf(root: String) = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage").as[(Long, String)].collect().toSet
    val exact = ledgerOf(exactRoot)
    assert(exact.contains((2L, "decontaminated")), s"fixture gap: $exact")
    assert(ledgerOf(bloomRoot) == exact)
    val bloomReason = spark.read.parquet(s"$bloomRoot/ledger")
      .filter(col("stage") === "decontaminated")
      .select("reason").as[String].head()
    assert(bloomReason.startsWith("bench_union_hits="), bloomReason)
    assert(spark.read.parquet(s"$bloomRoot/admitted").select("doc_id").as[Long].collect().toSet ==
      spark.read.parquet(s"$exactRoot/admitted").select("doc_id").as[Long].collect().toSet)
  }

  test("audit stream restart resumes from the checkpoint; stores and ledger stay consistent") {
    // An actual checkpoint RESTART (not just a direct body replay): run
    // over a spool dir, stop, drop a new file, start a fresh query on
    // the same checkpoint. The second run must process only the new
    // file, dedup against the FIRST run's persisted hash store, and
    // leave exactly one verdict per doc across both lifetimes.
    import org.apache.spark.sql.types._
    val in = tmpDir("audit-restart-in")
    val root = tmpDir("audit-restart-store")
    val ckpt = tmpDir("audit-restart-ckpt")
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    def drop(name: String, docs: Seq[Doc]): Unit = {
      val stage = tmpDir("audit-restart-stage")
      docs.toDF().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(s"$in/$name").toPath)
    }
    def runOnce(): Unit = {
      val q = Jobs.startAuditStream(
        Sources.parquetSpoolDir(spark, in, docSchema, maxFilesPerTrigger = 1),
        root, ckpt, queryTrigger = Trigger.AvailableNow())
      q.awaitTermination(120000)
    }
    drop("01.parquet", Seq(Doc(1, base), Doc(2, base))) // 2 dups 1
    runOnce()
    drop("02.parquet", Seq(Doc(3, base), Doc(4, fresh))) // 3 dups STORED 1; 4 fresh
    runOnce()
    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage", "reason").as[(Long, String, String)].collect()
    assert(ledger.map(_._1).distinct.length == ledger.length, s"dup verdicts: ${ledger.toSeq}")
    assert(ledger.toSet == Set(
      (2L, "exact_dup", "duplicate_of=1"),
      (3L, "exact_dup", "duplicate_of=1")), s"${ledger.toSeq}")
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    // the hash store holds exactly the two admitted distinct texts
    assert(spark.read.parquet(s"$root/hashes")
      .select("content_hash").distinct().count() == 2)
  }

  test("startAuditStream rejects two decontamination stores loudly") {
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val e = intercept[IllegalArgumentException] {
      Jobs.startAuditStream(ms.toDF(), tmpDir("audit-2stores"), tmpDir("audit-2stores-ckpt"),
        benchStoreDir = Some("/nonexistent/a"), bloomStoreDir = Some("/nonexistent/b"))
    }
    assert(e.getMessage.contains("ONE decontamination store"))
  }

  test("randomized batching: conservation, gate parity, and first-wins dedup invariants") {
    // Universal invariants that must hold for ANY batch partitioning and
    // arrival order (unlike full ledger parity, which needs ordered
    // arrival): every doc lands in exactly one of {ledger, admitted};
    // stage 1-4 verdicts are pure per-doc functions and equal the batch
    // form's doc-for-doc; admitted texts are pairwise distinct (exact
    // first-wins); and every exact_dup reason names an admitted doc with
    // the identical text. Five seeded trials over random batchings of a
    // pool with planted exact copies and gate failures.
    val pool = Seq(
      1L -> base, 2L -> base, 3L -> base, // exact family
      4L -> fresh, 5L -> fresh, // second family
      6L -> "too short",
      7L -> "zz qq ww rr tt yy uu ii oo pp aa ss",
      8L -> "[REDACTED_BLOCK]",
      9L -> benchText, // admitted (no bench store in this test)
      10L -> (base + " entirely unrelated suffix making it a distinct text"))
    val batchExpected = Curation.auditLedger(
      pool.map { case (i, t) => Doc(i, t) }.toDF(),
      Seq.empty[Doc].toDF("doc_id", "text"))
      .select("doc_id", "stage").as[(Long, String)].collect().toMap
    val gateStages = Set("clean_empty", "token_floor", "lang_gate", "quality_gate")
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(pool).map { case (i, t) => Doc(i, t) }
      val root = tmpDir(s"audit-prop-$seed")
      var batchId = 0L
      var rest = shuffled
      while (rest.nonEmpty) {
        val take = 1 + rnd.nextInt(4)
        Jobs.auditLedgerBatch(root)(rest.take(take).toDF(), batchId)
        rest = rest.drop(take); batchId += 1
      }
      val ledger = spark.read.parquet(s"$root/ledger")
        .select("doc_id", "stage", "reason").as[(Long, String, String)].collect()
      val admitted = spark.read.parquet(s"$root/admitted")
        .select("doc_id").as[Long].collect().toSet
      // conservation: exactly one verdict per doc
      assert(ledger.map(_._1).distinct.length == ledger.length, s"seed $seed: dup ledger rows")
      assert((ledger.map(_._1).toSet ++ admitted) == pool.map(_._1).toSet &&
        ledger.map(_._1).toSet.intersect(admitted).isEmpty, s"seed $seed: conservation broken")
      // gate verdicts are order-independent and equal the batch form
      ledger.filter(r => gateStages(r._2)).foreach { case (id, stage, _) =>
        assert(batchExpected.get(id).contains(stage), s"seed $seed: doc $id gate drift")
      }
      pool.map(_._1).filter(id => batchExpected.get(id).exists(gateStages)).foreach { id =>
        assert(ledger.exists(r => r._1 == id && r._2 == batchExpected(id)),
          s"seed $seed: doc $id lost its gate verdict")
      }
      // first-wins exact dedup: admitted texts pairwise distinct, and
      // each exact_dup names an admitted keeper with the same text
      val textOf = pool.toMap
      val admittedTexts = admitted.toSeq.map(textOf)
      assert(admittedTexts.distinct.length == admittedTexts.length,
        s"seed $seed: two admitted docs share a text")
      ledger.filter(_._2 == "exact_dup").foreach { case (id, _, reason) =>
        val keeper = reason.stripPrefix("duplicate_of=").toLong
        assert(admitted.contains(keeper) || ledger.exists(r =>
          r._1 == keeper && r._2 == "near_dup"),
          s"seed $seed: doc $id's keeper $keeper neither admitted nor near-dup-collapsed")
        assert(textOf(keeper) == textOf(id), s"seed $seed: keeper text mismatch for $id")
      }
    }
  }

  test("all-dropped first batch leaves readable stores (empty-partitioned-write edge)") {
    // A fully-rejected FIRST batch writes admitted/ with a lone _SUCCESS
    // and no partition subdir; an any-file existence probe would then
    // hand the schema-less directory to spark.read.parquet and crash the
    // batch. The partition-subdir probe must skip the read-back, and the
    // next batch must admit normally against the still-empty stores.
    val root = tmpDir("audit-empty-first")
    Jobs.auditLedgerBatch(root)(
      Seq(Doc(1, "too short"), Doc(2, "[REDACTED_BLOCK]")).toDF(), 0L)
    Jobs.auditLedgerBatch(root)(Seq(Doc(3, base)).toDF(), 1L)
    val ledger = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage").as[(Long, String)].collect().toSet
    assert(ledger == Set((1L, "token_floor"), (2L, "clean_empty")), s"$ledger")
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(3L))
    val funnel = Jobs.auditFunnelFromStores(spark, root).collect()
    assert(funnel.head.getAs[Long]("n_in") == 3L && funnel.last.getAs[Long]("n_out") == 1L)
  }

  test("near-dup chain: stream admits the far end once the bridge drops (documented divergence)") {
    // A ~ B ~ C with A !~ C. The batch form's transitive closure drops
    // B and C (cluster canonical A); the stream has no closure — B is
    // rejected against admitted A, then C arrives, compares against the
    // ADMITTED set {A} only (0.45 < 0.6), and is admitted. This is the
    // first-admitted-wins contract, pinned here so the divergence stays
    // a documented trade, not a surprise.
    val p = "the of and to in a is that it for every morning brightly" // >= 50 shared chars
    val aW = "apple banana cherry dates elder figs grape honey"
    val b4 = "ocean river mountain valley"
    val bW = "apple banana cherry dates " + b4
    val cW = b4 + " silver copper bronze golden"
    val docs = Seq(Doc(1, s"$p $aW"), Doc(2, s"$p $bW"), Doc(3, s"$p $cW"))

    val batchLedger = Curation.auditLedger(docs.toDF(),
      Seq.empty[Doc].toDF("doc_id", "text"))
      .select("doc_id", "stage").as[(Long, String)].collect().toSet
    assert(batchLedger == Set((2L, "near_dup"), (3L, "near_dup")),
      s"batch closure should drop both B and C: $batchLedger")

    val root = tmpDir("audit-chain-store")
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startAuditStream(ms.toDF(), root, tmpDir("audit-chain-ckpt"),
      queryTrigger = Trigger.ProcessingTime(0))
    try docs.foreach { d => ms.addData(d); q.processAllAvailable() }
    finally q.stop()
    val got = spark.read.parquet(s"$root/ledger")
      .select("doc_id", "stage").as[(Long, String)].collect().toSet
    assert(got == Set((2L, "near_dup")), s"stream should drop only the bridge: $got")
    val admitted = spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(1L, 3L))
  }

  test("seeded audit stores: corpus history dedups the FIRST batch; funnel conserves across seed+stream") {
    val corpus = Seq(
      Doc(100, base),
      Doc(101, fresh),
      Doc(102, "too short")) // one seed drop so the seed ledger is non-empty
    val root = tmpDir("audit-seed-store")
    Jobs.seedAuditStores(corpus.toDF(), root)
    // the seed ran the full body at id -1: drops ledgered, survivors admitted
    assert(spark.read.parquet(s"$root/admitted")
      .select("doc_id").as[Long].collect().toSet == Set(100L, 101L))
    assert(spark.read.parquet(s"$root/ledger")
      .select("ingest_batch").distinct().as[Int].collect().toSet == Set(-1))
    // batch 0 (read-below-0 sees the seed): an exact dup and a near-dup
    // of seed doc 100 drop WITH the seed doc as the attributed keeper
    Jobs.auditLedgerBatch(root)(Seq(
      Doc(1, base),
      Doc(2, base.replace("warm", "cold")),
      Doc(3, "meanwhile a separate discussion covers the compaction protocol " +
        "and the seeding of the audit stores in long running jobs")).toDF(), 0L)
    val ledger0 = spark.read.parquet(s"$root/ledger")
      .filter(col("ingest_batch") === 0)
      .select("doc_id", "stage", "reason").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(ledger0 == Map(
      1L -> (("exact_dup", "duplicate_of=100")),
      2L -> (("near_dup", "near_dup_of=100"))), s"got $ledger0")
    assert(spark.read.parquet(s"$root/admitted")
      .filter(col("ingest_batch") === 0)
      .select("doc_id").as[Long].collect().toSet == Set(3L))
    // one funnel over corpus + stream: 6 in, 3 drops, 3 out
    val funnel = Jobs.auditFunnelFromStores(spark, root).collect()
    assert(funnel.head.getAs[Long]("n_in") == 6L)
    assert(funnel.last.getAs[Long]("n_out") == 3L)
    // once a batch has run, re-seeding is refused
    val ex = intercept[IllegalArgumentException](
      Jobs.seedAuditStores(corpus.toDF(), root))
    assert(ex.getMessage.contains("cannot seed"))
  }
}
