package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Curation

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
}
