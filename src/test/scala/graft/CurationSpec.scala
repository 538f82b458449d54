package graft

import org.apache.spark.sql.functions._
import graft.ops.Curation

/** Curation pipeline — gate invariants and dedup discipline on the
  * document fixture (value-level correctness is the DuckDB oracle's job:
  * pipeline_curate_corpus hash-matches the composed SQL).
  */
class CurationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("curation filters, and every surviving row respects every gate") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.curate(docs).cache()
    try {
      val total = docs.count()
      val kept = out.count()
      assert(kept > 0 && kept < total, s"kept $kept of $total — gates not exercised")
      val bad = out.filter(col("n_tokens") < 10 || col("quality") < 0.55).count()
      assert(bad == 0)
      // dedup discipline: content hashes unique, copy counts account for
      // at least one raw doc each, and the canonical id is a real doc_id.
      assert(out.select("content_hash").distinct().count() == kept)
      assert(out.filter(col("n_copies") < 1).count() == 0)
      assert(out.join(docs.select(col("doc_id").as("keep_doc_id")), "keep_doc_id").count() == kept)
    } finally out.unpersist(blocking = true)
  }

  test("curation is idempotent on its survivors: re-curating keeps every kept doc") {
    val docs = Tables.documents(spark, sf)
    val out = Curation.curate(docs)
    // feed the kept docs back through: every one passes the gates again
    // and nothing collapses further (texts are already distinct).
    val kept = out.select(col("keep_doc_id").as("doc_id")).join(docs, "doc_id")
    val again = Curation.curate(kept)
    assert(again.count() == out.count())
    assert(again.filter(col("n_copies") =!= 1L).count() == 0)
  }

  test("streaming curation over MemoryStream matches the batch gate + dedup set") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(spark, sf)
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)](spark)(
      org.apache.spark.sql.Encoders.product[(Long, String)])
    // two micro-batches — dedup state must carry across them
    val (front, back) = rows.splitAt(rows.length / 2)
    ms.addData(front.toSeq)
    val q = ops.Curation.curateStream(ms.toDF().toDF("doc_id", "text")).writeStream
      .outputMode("append")
      .queryName("curate_stream")
      .format("memory")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      q.processAllAvailable()
      ms.addData(back.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("curate_stream")
        .select("content_hash").collect().map(_.getString(0))
      val batch = ops.Curation.curate(docs)
        .select("content_hash").collect().map(_.getString(0))
      assert(streamed.length == streamed.distinct.length, "stream emitted a duplicate hash")
      assert(streamed.toSet == batch.toSet)
    } finally q.stop()
  }

  test("watermarked streaming curation dedups within the window and frees state past it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import java.sql.Timestamp
    // A text that passes every gate (same fixture as the canonical test).
    val good = "the quick brown fox jumps over the lazy dog while the cat sleeps on the " +
      "warm windowsill every afternoon because it enjoys the sunshine and the quiet house"
    val other = "this other document is about the weather today and how people in the town " +
      "walk to the market while they talk about the news of the day"
    def ts(min: Long) = Timestamp.from(java.time.Instant.parse("2026-01-01T00:00:00Z")
      .plusSeconds(min * 60))
    val ms = MemoryStream[(Long, String, Timestamp)](spark)(
      org.apache.spark.sql.Encoders.product[(Long, String, Timestamp)])
    val q = ops.Curation.curateStreamWatermarked(
      ms.toDF().toDF("doc_id", "text", "ts"), delay = "10 minutes").writeStream
      .outputMode("append")
      .queryName("curate_stream_wm")
      .format("memory")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      def emitted(): Map[Long, Long] = spark.table("curate_stream_wm")
        .groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // batch 1: first sighting emits; watermark trails max event time.
      ms.addData(Seq((1L, good, ts(0))))
      q.processAllAvailable()
      assert(emitted() == Map(1L -> 1L))
      // batch 2: duplicate INSIDE the window (ts+1min) — suppressed.
      ms.addData(Seq((2L, good, ts(1))))
      q.processAllAvailable()
      assert(emitted() == Map(1L -> 1L), "in-window duplicate leaked")
      // batch 3: unrelated doc far in the future advances the watermark
      // to ts(50), past the duplicate state's expiry at ts(0)+10min.
      ms.addData(Seq((3L, other, ts(60))))
      q.processAllAvailable()
      // batch 4: the SAME text again, after its state was expired — a
      // bounded-state store MUST re-emit it (the documented trade-off).
      ms.addData(Seq((4L, good, ts(61))))
      q.processAllAvailable()
      assert(emitted() == Map(1L -> 1L, 3L -> 1L, 4L -> 1L),
        "state survived past the watermark (unbounded) or late dup leaked")
    } finally q.stop()
  }

  test("canonical stage collapses transitive near-dup survivors that exact dedup keeps") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog while the cat sleeps on the " +
      "warm windowsill every afternoon because it enjoys the sunshine and the quiet house"
    // Three near-variants (distinct hashes — all survive exact dedup; the
    // chain a~b, b~c must collapse to ONE survivor) plus one unrelated.
    val docs = Seq(
      (1L, good, "en", "s", good.length.toLong),
      (2L, good.replace("warm", "cold"), "en", "s", good.length.toLong),
      (3L, good.replace("warm", "cold").replace("quiet", "still"), "en", "s", good.length.toLong),
      (4L, "this other document is about the weather today and how people in the town " +
        "walk to the market while they talk about the news of the day", "en", "s", 130L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val exact = Curation.curate(docs)
    assert(exact.count() == 4) // all distinct hashes survive exact dedup
    val canon = Curation.curateCanonical(docs).collect()
    val kept = canon.map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(kept == Map(1L -> 3L, 4L -> 1L), s"expected {1 (family of 3), 4}, got $kept")
  }

  test("audit ledger reconciles exactly: drops + final survivors = input; one row per doc") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val ledger = Curation.auditLedger(train, bench).cache()
    try {
      val nTrain = train.count()
      val nDropped = ledger.count()
      // one verdict per dropped doc — a doc charged to two stages would
      // double-count in the funnel
      assert(ledger.select("doc_id").distinct().count() == nDropped)
      // every ledger doc_id is a real train doc, never a benchmark doc
      assert(ledger.join(train.select("doc_id"), Seq("doc_id")).count() == nDropped)
      // survivors = docs in no ledger row
      val survivors = train.select("doc_id")
        .join(ledger.select("doc_id"), Seq("doc_id"), "left_anti")
      val nSurvive = survivors.count()
      assert(nDropped + nSurvive == nTrain,
        s"$nDropped dropped + $nSurvive survived != $nTrain input docs")
      // INDEPENDENT survivor derivation through the other code path:
      // curatedFrame's dedup-FIRST aggregate (the audit scores per-doc),
      // canonical collapse, then the pair-level decontamination gate on
      // cleaned text. A ledger that mis-attributes an admitted doc (or
      // admits a dropped one) disagrees with this set even though every
      // count above still reconciles.
      val curated = Curation.curatedFrame(train)
      curated.count()
      try {
        val asDocs = curated.select(col("keep_doc_id").as("doc_id"), col("t").as("text"))
        val canonDocs = asDocs.join(
          graft.ops.Dedup.canonicalSurvivors(asDocs,
            graft.ops.Dedup.prefixBlockedJaccard(asDocs)
              .filter(col("jaccard") >= Curation.defaultJaccardThreshold))
            .select(col("keep_doc_id").as("doc_id")),
          Seq("doc_id"))
        val indep = graft.ops.Dedup.decontaminate(
          canonDocs,
          bench.select(col("doc_id"), Curation.cleaned(col("text")).as("text")))
          .select("doc_id").collect().map(_.getLong(0)).toSet
        val got = survivors.collect().map(_.getLong(0)).toSet
        assert(got == indep,
          s"ledger survivors diverge from the dedup-first derivation: " +
            s"only-ledger=${got -- indep} only-indep=${indep -- got}")
      } finally curated.unpersist(blocking = true)
      // the funnel telescopes to the same totals, stage by stage
      val funnel = Curation.auditFunnel(train, bench).collect()
      assert(funnel.length == Curation.auditStages.length)
      assert(funnel.head.getAs[Long]("n_in") == nTrain)
      assert(funnel.last.getAs[Long]("n_out") == nSurvive)
      funnel.foreach { r =>
        assert(r.getAs[Long]("n_in") - r.getAs[Long]("n_dropped") == r.getAs[Long]("n_out"))
      }
      funnel.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("n_out") == b.getAs[Long]("n_in"))
        case _ =>
      }
      assert(funnel.map(_.getAs[Long]("n_dropped")).sum == nDropped)
      // stage attribution is honest: every exact_dup row names a keeper
      // that itself survived at least to the near-dup stage (i.e. is not
      // gate-dropped), and reasons parse
      val gateStages = Set("clean_empty", "token_floor", "lang_gate", "quality_gate")
      val keepers = ledger.filter(col("stage") === "exact_dup")
        .select(regexp_extract(col("reason"), "duplicate_of=(\\d+)", 1)
          .cast("long").as("doc_id"))
      val gateDroppedKeepers = keepers.join(
        ledger.filter(col("stage").isin(gateStages.toSeq: _*)).select("doc_id"),
        Seq("doc_id")).count()
      assert(gateDroppedKeepers == 0)
    } finally ledger.unpersist(blocking = true)
  }

  test("audit examples: at most perStage rows per stage, all drawn from the ledger") {
    val docs = Tables.documents(spark, sf)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val ledger = Curation.auditLedger(train, bench).cache()
    try {
      val cleaned = train.select(col("doc_id"), Curation.cleaned(col("text")).as("t"))
      val ex = Curation.auditExamples(ledger, cleaned, perStage = 2).collect()
      val perStage = ex.groupBy(_.getAs[String]("stage")).view.mapValues(_.length)
      perStage.foreach { case (s, n) => assert(n <= 2, s"stage $s has $n examples") }
      // every example is a real ledger row with its reason, snippet from
      // the doc's own cleaned text, and the per-stage pick is the LOWEST
      // doc_ids of that stage
      val byStage = ledger.collect()
        .groupBy(_.getAs[String]("stage"))
        .view.mapValues(_.map(_.getAs[Long]("doc_id")).sorted.take(2).toSet)
      ex.foreach { r =>
        val (stage, id) = (r.getAs[String]("stage"), r.getAs[Long]("doc_id"))
        assert(byStage(stage).contains(id), s"$stage example $id is not among its lowest ids")
        assert(r.getAs[String]("snippet").length <= 80)
      }
    } finally ledger.unpersist(blocking = true)
  }

  test("a stricter quality floor keeps a subset") {
    val docs = Tables.documents(spark, sf)
    val loose = Curation.curate(docs, minQuality = 0.55)
      .select("keep_doc_id").collect().map(_.getLong(0)).toSet
    val strict = Curation.curate(docs, minQuality = 0.62)
      .select("keep_doc_id").collect().map(_.getLong(0)).toSet
    assert(strict.nonEmpty && strict.size < loose.size)
    assert(strict.subsetOf(loose))
  }
}
