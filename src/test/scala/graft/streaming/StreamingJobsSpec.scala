package graft.streaming

import java.sql.Timestamp
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Kpi

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

case class Doc(doc_id: Long, text: String)

/** Embedding row for the semantic-gate stream test. */
case class Emb(vec_id: Long, label: String, embedding: Seq[Double])

/** Query row for the k-NN serving stream test. */
case class QVec(query_id: Long, embedding: Seq[Double])

/** Structured-Streaming lift — parity with batch, watermark append
  * semantics, per-batch faithful mode, checkpoint recovery, empty-batch
  * marker (SURVEY.md §5 item 3).
  */
class StreamingJobsSpec extends SparkSpec {

  private def fixtureEvents: DataFrame =
    graft.Tables.events(spark, "/root/testdata/sf0.001")

  test("stateful kpiStream over a file-replayed fixture matches batch aggregation exactly") {
    val dir = tmpDir("stream-in")
    // 4 parquet files → 4 micro-batches with maxFilesPerTrigger=1.
    fixtureEvents.repartition(4).write.mode("overwrite").parquet(dir)
    val batchExpected = Kpi.formatted(Kpi.aggregate(spark.read.parquet(dir)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

    val streamIn = Sources.parquetSpoolDir(spark, dir, maxFilesPerTrigger = 1)
    // Update mode + upsert-by-window: file arrival order is not time-ordered,
    // so a huge watermark keeps every window open and the LAST update per
    // window is the final value — deterministic regardless of batch order.
    val state = TrieMap.empty[String, (Long, Long, Double)]
    val q = Jobs.kpiStream(streamIn, watermarkDelay = "3650 days").writeStream
      .outputMode("update")
      .queryName("kpi_parity")
      .option("checkpointLocation", tmpDir("stream-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r =>
          state.put(r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      }
      .start()
    q.awaitTermination(120000)
    assert(state.toMap == batchExpected)
    assert(state.nonEmpty)
  }

  test("append mode emits a window only after the watermark passes it, exactly once") {
    val ms = MemoryStream[Ev](spark)(org.apache.spark.sql.Encoders.product[Ev])
    val q = Jobs.kpiStream(ms.toDF(), watermarkDelay = "10 minutes").writeStream
      .outputMode("append")
      .queryName("kpi_wm")
      .format("memory")
      .start()
    def table() = spark.table("kpi_wm").collect()

    ms.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view", 150.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 10:05:00"), 2, "view", 50.0, "{}"))
    q.processAllAvailable()
    assert(table().isEmpty) // watermark at 09:55 — window [10:00,10:15) still open

    // Advance event time past window end + delay; emission happens on the
    // batch AFTER the one that advances the watermark.
    ms.addData(Ev(3, Timestamp.valueOf("2024-01-01 10:40:00"), 3, "view", 10.0, "{}"))
    q.processAllAvailable()
    ms.addData(Ev(4, Timestamp.valueOf("2024-01-01 10:41:00"), 3, "view", 10.0, "{}"))
    q.processAllAvailable()

    val emitted = table().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted == Set(("2024-01-01 10:00:00", 2L, 1L)))

    // A late row behind the watermark is dropped; the emitted window never updates.
    ms.addData(Ev(5, Timestamp.valueOf("2024-01-01 10:02:00"), 1, "view", 999.0, "{}"))
    q.processAllAvailable()
    assert(table().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("2024-01-01 10:00:00", 2L, 1L)))
    q.stop()
  }

  test("stateful lift e2e: finalized windows land in CSV exactly once as the watermark advances") {
    val in = tmpDir("st-in"); val out = tmpDir("st-out")
    // Two time-ordered files at the watched-dir ROOT (the file source
    // does not traverse plain subdirectories) with recent, ordered mod
    // times (default maxFileAge=7d silently drops far-past dates).
    val now = System.currentTimeMillis()
    def drop(df: org.apache.spark.sql.DataFrame, name: String, modTime: Long): Unit = {
      val stage = tmpDir("st-stage")
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles.find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$in/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(modTime)
    }
    drop(fixtureEvents.filter(dayofmonth(col("ts")) <= 15), "01.parquet", now - 60000L)
    drop(fixtureEvents.filter(dayofmonth(col("ts")) > 15), "02.parquet", now - 30000L)
    val q = Jobs.startKpiStateful(
      Sources.parquetSpoolDir(spark, in, maxFilesPerTrigger = 1),
      out, tmpDir("st-ckpt"), Jobs.trigger(0), watermarkDelay = "30 minutes")
    q.awaitTermination(120000)
    // append mode emits exactly the windows whose end <= final watermark
    val maxTs =
      fixtureEvents.agg(max(col("ts").cast("timestamp"))).head().getTimestamp(0).getTime
    val watermarkMs = maxTs - 30 * 60000L
    val expected = graft.ops.Kpi.quarterHour(fixtureEvents)
      .collect()
      .count { r =>
        val start = java.sql.Timestamp.valueOf(r.getString(0)).getTime
        start + 15 * 60000L <= watermarkMs
      }
    val written = spark.read
      .schema("window_start STRING, n_events LONG, n_high LONG, pct_high DOUBLE")
      .csv(s"$out/data")
    assert(written.count() == expected)
    assert(written.select("window_start").distinct().count() == expected) // exactly once
  }

  test("per-batch faithful lift appends each micro-batch's own KPI rows to CSV") {
    val in = tmpDir("pb-in"); val out = tmpDir("pb-out")
    fixtureEvents.coalesce(1).write.mode("overwrite").parquet(in)
    val q = Jobs.startKpiPerBatch(
      Sources.parquetSpoolDir(spark, in),
      out, tmpDir("pb-ckpt"), Jobs.trigger(0))
    q.awaitTermination(120000)
    val written = spark.read.schema("window_start STRING, n_events LONG, n_high LONG, pct_high DOUBLE")
      .csv(s"$out/data")
    val expected = Kpi.quarterHour(spark.read.parquet(in))
    assert(written.count() == expected.count())
    assert(written.agg(sum("n_events")).head().getLong(0) ==
      expected.agg(sum("n_events")).head().getLong(0))
  }

  test("checkpoint recovery: restart processes only new files, no duplicates") {
    val in = tmpDir("ck-in"); val out = tmpDir("ck-out"); val ckpt = tmpDir("ck-ckpt")
    val hour1 = fixtureEvents.filter(hour(col("ts")) < 12)
    val hour2 = fixtureEvents.filter(hour(col("ts")) >= 12)
    hour1.coalesce(1).write.mode("append").parquet(in)

    val q1 = Jobs.startKpiPerBatch(Sources.parquetSpoolDir(spark, in), out, ckpt, Jobs.trigger(0))
    q1.awaitTermination(120000)
    val csv = () => spark.read
      .schema("window_start STRING, n_events LONG, n_high LONG, pct_high DOUBLE")
      .csv(s"$out/data")
    val afterFirst = csv().count()
    assert(afterFirst == Kpi.quarterHour(hour1).count())

    // Restart on the same checkpoint with no new data → nothing reprocessed.
    val q2 = Jobs.startKpiPerBatch(Sources.parquetSpoolDir(spark, in), out, ckpt, Jobs.trigger(0))
    q2.awaitTermination(120000)
    assert(csv().count() == afterFirst)

    // New file lands → only its windows are appended.
    hour2.coalesce(1).write.mode("append").parquet(in)
    val q3 = Jobs.startKpiPerBatch(Sources.parquetSpoolDir(spark, in), out, ckpt, Jobs.trigger(0))
    q3.awaitTermination(120000)
    assert(csv().count() == afterFirst + Kpi.quarterHour(hour2).count())
  }

  test("empty batch writes the marker CSV instead of data (F7 guard)") {
    val out = tmpDir("mk-out")
    Jobs.appendBatchCsv(fixtureEvents.limit(0), 7L, out)
    val marker = spark.read.option("header", "true").csv(s"$out/_empty_marker").collect()
    assert(marker.map(_.getString(0)).toSeq == Seq("no events in batch 7"))
    assert(!new java.io.File(s"$out/data").exists())
  }

  test("poisoned batch is isolated: stream body logs and continues (F9)") {
    val out = tmpDir("poison-out")
    // A frame whose evaluation throws at action time (division via UDF that throws).
    val bad = fixtureEvents.limit(5)
      .withColumn("value", udf((_: Double) => { throw new RuntimeException("boom"); 0.0 }).apply(col("value")))
    Jobs.appendBatchCsv(bad, 1L, out) // must not throw
    Jobs.appendBatchCsv(Kpi.quarterHour(fixtureEvents.limit(100)), 2L, out)
    assert(spark.read.csv(s"$out/data").count() > 0)
  }

  test("rate-source synthetic events carry the declared schema") {
    val df = Sources.syntheticEvents(spark)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
  }

  test("csv spool-dir source replays the fixture identically to parquet (S7)") {
    val dir = tmpDir("csv-spool")
    fixtureEvents
      .withColumn("ts", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .coalesce(1).write.option("header", "true").mode("overwrite").csv(dir)
    val streamIn = Sources.csvSpoolDir(spark, dir)
    assert(streamIn.isStreaming)
    val out = tmpDir("csv-spool-out")
    val q = Jobs.startKpiPerBatch(streamIn, out, tmpDir("csv-spool-ckpt"), Jobs.trigger(0))
    q.awaitTermination(120000)
    val written = spark.read
      .schema("window_start STRING, n_events LONG, n_high LONG, pct_high DOUBLE")
      .csv(s"$out/data")
    val expected = Kpi.quarterHour(fixtureEvents)
    assert(written.count() == expected.count())
    assert(written.agg(sum("n_events")).head().getLong(0) ==
      expected.agg(sum("n_events")).head().getLong(0))
  }

  test("stream-stream interval join emits the same pairs as the batch range join") {
    val dir = tmpDir("ssj-in")
    fixtureEvents.coalesce(1).write.mode("overwrite").parquet(dir)
    val batchPairs = graft.ops.Temporal.rangeJoin(spark.read.parquet(dir))
      .select("event_id", "p_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = Jobs.purchaseContextJoin(Sources.parquetSpoolDir(spark, dir))
    val seen = scala.collection.concurrent.TrieMap.empty[(Long, Long), Unit]
    val q = streamed.writeStream
      .outputMode("append")
      .queryName("ssj")
      .option("checkpointLocation", tmpDir("ssj-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("event_id", "p_id").collect()
          .foreach(r => seen.put((r.getLong(0), r.getLong(1)), ()))
      }
      .start()
    q.awaitTermination(180000)
    assert(seen.keySet == batchPairs)
    assert(batchPairs.nonEmpty)
  }

  test("kafka-shaped KPI output is (key, value-JSON) records (K8 streaming form)") {
    val shaped = Jobs.kafkaShapedKpi(Sources.syntheticEvents(spark))
    assert(shaped.isStreaming)
    assert(shaped.columns.toSeq == Seq("key", "value"))
    // batch equivalent of the same shaping parses back losslessly
    val batchShaped = graft.ops.Sinks.kafkaShaped(
      Kpi.quarterHour(fixtureEvents), col("window_start"),
      col("window_start"), col("n_events"))
    val r = batchShaped.head()
    assert(r.getString(1).startsWith("{\"window_start\":\""))
  }

  test("sliding window as a STREAMING window matches the batch form over micro-batches") {
    // The batch a6_sliding_window form (oracle-verified) re-run through
    // Structured Streaming: same groupBy(window(ts, 3m, 1m)), fixture
    // split across 3 micro-batches. Update mode + upsert-by-window (file
    // order is not time order) — the final value per window must equal
    // the batch aggregation exactly.
    def sliding(df: DataFrame) = df
      .groupBy(window(col("ts"), "3 minutes", "1 minute").getField("start").as("ws"))
      .agg(count(lit(1)).as("n"))
      .select(date_format(col("ws"), "yyyy-MM-dd HH:mm:ss").as("window_start"), col("n"))
    val expected = sliding(fixtureEvents)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val ms = MemoryStream[Ev](spark)(org.apache.spark.sql.Encoders.product[Ev])
    val state = TrieMap.empty[String, Long]
    val q = sliding(ms.toDF().withWatermark("ts", "3650 days")).writeStream
      .outputMode("update")
      .queryName("sliding_stream")
      .option("checkpointLocation", tmpDir("sliding-ckpt"))
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.collect().foreach(r => state.put(r.getString(0), r.getLong(1)))
      }
      .start()
    val rows = fixtureEvents.as[Ev](org.apache.spark.sql.Encoders.product[Ev]).collect()
    rows.grouped((rows.length + 2) / 3).foreach { chunk => // 3 micro-batches
      ms.addData(chunk.toIndexedSeq)
      q.processAllAvailable()
    }
    q.stop()
    assert(state.toMap == expected)
    assert(state.nonEmpty)
  }

  test("session_window as a STREAMING window: merges across batches, emits once watermark closes it") {
    val ms = MemoryStream[Ev](spark)(org.apache.spark.sql.Encoders.product[Ev])
    val q = graft.streaming.Stateful.userSessions(
      ms.toDF().withWatermark("ts", "10 minutes"), gap = "30 minutes").writeStream
      .outputMode("append")
      .queryName("session_stream")
      .format("memory")
      .start()
    def table() = spark.table("session_stream")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

    // Two events for user 1 in SEPARATE micro-batches, 10 minutes apart:
    // session_window must merge them into one open session.
    ms.addData(Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"))
    q.processAllAvailable()
    ms.addData(Ev(2, Timestamp.valueOf("2024-01-01 10:10:00"), 1, "view", 2.0, "{}"))
    q.processAllAvailable()
    assert(table().isEmpty) // session [10:00, 10:40) still open — nothing emitted

    // Advance event time: watermark moves to 12:00-10m = 11:50 > 10:40,
    // closing user 1's session. Emission lands on the batch AFTER the one
    // that advances the watermark.
    ms.addData(Ev(3, Timestamp.valueOf("2024-01-01 12:00:00"), 2, "view", 3.0, "{}"))
    q.processAllAvailable()
    ms.addData(Ev(4, Timestamp.valueOf("2024-01-01 12:01:00"), 2, "view", 4.0, "{}"))
    q.processAllAvailable()
    val emitted = table()
    assert(emitted == Set((1L, "2024-01-01 10:00:00", "2024-01-01 10:40:00", 2L)))

    // The emitted session must equal the BATCH session_window form on the
    // same rows (the oracle-verified stream_session_window code path).
    val batchForm = graft.streaming.Stateful.userSessions(
      eventsDf(Seq(
        (1L, "2024-01-01 10:00:00", 1L, "view", 1.0, "{}"),
        (2L, "2024-01-01 10:10:00", 1L, "view", 2.0, "{}"))), gap = "30 minutes")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(batchForm == emitted)
    q.stop()
  }

  test("streaming dedup drops replayed ids across micro-batches, keeps state within watermark") {
    val ms = MemoryStream[Ev](spark)(org.apache.spark.sql.Encoders.product[Ev])
    val q = Jobs.dedupStream(ms.toDF(), watermarkDelay = "10 minutes").writeStream
      .outputMode("append")
      .queryName("dedup_stream")
      .format("memory")
      .start()
    ms.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
      Ev(2, Timestamp.valueOf("2024-01-01 10:01:00"), 1, "view", 2.0, "{}"))
    q.processAllAvailable()
    // batch 2 replays id 1 (at-least-once source) + a new id
    ms.addData(
      Ev(1, Timestamp.valueOf("2024-01-01 10:00:00"), 1, "view", 1.0, "{}"),
      Ev(3, Timestamp.valueOf("2024-01-01 10:02:00"), 1, "view", 3.0, "{}"))
    q.processAllAvailable()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("compaction rewrites many small files into few, preserving rows") {
    val dir = tmpDir("compact") + "/data"
    fixtureEvents.repartition(20).write.mode("overwrite").parquet(dir)
    val before = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    val rows = spark.read.parquet(dir).count()
    graft.ops.Sinks.compactParquet(spark, dir, targetMB = 128)
    val after = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    assert(before == 20 && after < before)
    assert(spark.read.parquet(dir).count() == rows)
  }

  test("csv source is PERMISSIVE: malformed rows become nulls, the stream survives") {
    val dir = tmpDir("csv-bad")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/batch1.csv"),
      """event_id,ts,user_id,event_type,value,props
        |1,2024-01-01 10:00:00,7,view,42.5,{}
        |THIS IS NOT A CSV ROW AT ALL
        |2,2024-01-01 10:01:00,8,click,1.0,{}
        |""".stripMargin)
    val rows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = Sources.csvSpoolDir(spark, dir).writeStream
      .outputMode("append")
      .queryName("csv_bad")
      .option("checkpointLocation", tmpDir("csv-bad-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) => rows ++= b.collect(); () }
      .start()
    q.awaitTermination(60000)
    assert(rows.length == 3) // bad row kept as a null-record, not a crash
    val good = rows.filter(!_.isNullAt(0)).map(_.getLong(0)).sorted
    assert(good.toSeq == Seq(1L, 2L))
    assert(rows.count(r => r.isNullAt(0) && r.isNullAt(2)) == 1)
  }

  test("incremental dedup stream: persisted hash store spans batches; replay is idempotent") {
    import spark.implicits._
    val store = tmpDir("incdedup-store"); val out = tmpDir("incdedup-out")
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startIncrementalDedup(ms.toDF(), store, out,
      tmpDir("incdedup-ckpt"), Trigger.ProcessingTime(0))

    // Batch 0: two distinct texts, one within-batch duplicate.
    ms.addData(Doc(1, "alpha document text"), Doc(2, "beta document text"),
      Doc(3, "alpha document text"))
    q.processAllAvailable()
    // Batch 1: a re-ingest of batch 0's text (must drop), one new text twice.
    val replayRows = Seq(Doc(10, "beta document text"),
      Doc(11, "gamma new content"), Doc(12, "gamma new content"))
    ms.addData(replayRows: _*)
    q.processAllAvailable()
    q.stop()

    def survivors() = spark.read.parquet(out)
      .select("keep_doc_id", "n_copies", "ingest_batch")
      .as[(Long, Long, Int)].collect().toSet
    val expected = Set((1L, 2L, 0), (2L, 1L, 0), (11L, 2L, 1))
    assert(survivors() == expected, s"got ${survivors()}")
    // Store: one hash per distinct text ever seen, batch-attributed.
    val hashes = spark.read.parquet(store).as[(String, Int)].collect()
    assert(hashes.length == 3 && hashes.map(_._1).distinct.length == 3)

    // Replay batch 1 directly (foreachBatch re-runs after recovery): the
    // partitioned store read excludes the batch's own half/fully-written
    // partition, so output and store end up byte-identical, not doubled.
    Jobs.incrementalDedupBatch(store, out)(replayRows.toDF(), 1L)
    assert(survivors() == expected, s"replay changed output: ${survivors()}")
    assert(spark.read.parquet(store).count() == 3)

    // CHECKPOINT-RESET GUARD: a stream restarted with a FRESH checkpoint
    // would replay batch ids from 0 against this advanced store; the
    // own-partition overwrite would then silently replace batch 0's
    // output and seen-hashes — it must fail loudly instead, and leave
    // both stores untouched
    val reset = intercept[IllegalArgumentException](
      Jobs.incrementalDedupBatch(store, out)(
        Seq(Doc(20, "delta reset content")).toDF(), 0L))
    assert(reset.getMessage.contains("fresh-checkpoint"), s"got: $reset")
    assert(survivors() == expected)
    assert(spark.read.parquet(store).count() == 3)
  }

  test("auto-compaction: stream stays bounded; a crashed compaction is resolved before the read") {
    import spark.implicits._
    val store = tmpDir("auto-store"); val out = tmpDir("auto-out")
    val ckpt = tmpDir("auto-ckpt"); val in = tmpDir("auto-in")
    // file source (not MemoryStream): the crash scenario below resumes
    // the checkpoint from a SECOND query, which a memory stream cannot do
    val t0 = System.currentTimeMillis()
    def drop(docs: Seq[Doc], name: String, modTime: Long): Unit = {
      val stage = tmpDir("auto-stage")
      docs.toDF().coalesce(1).write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(s"$in/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(modTime)
    }
    def startQ() = Jobs.startIncrementalDedup(
      Sources.parquetSpoolDir(spark, in,
        schema = org.apache.spark.sql.Encoders.product[Doc].schema,
        maxFilesPerTrigger = 1),
      store, out, ckpt, Jobs.trigger(0), compactEvery = Some(2))
    drop(Seq(Doc(1, "one unique text")), "00.parquet", t0 - 50000)
    drop(Seq(Doc(2, "two unique text"), Doc(3, "one unique text")), "01.parquet", t0 - 40000)
    drop(Seq(Doc(4, "three unique text")), "02.parquet", t0 - 30000)
    drop(Seq(Doc(5, "four unique text")), "03.parquet", t0 - 20000)
    val q = startQ()
    q.awaitTermination(120000)
    // compaction fired after batches 1 and 3: both stores stay bounded
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
    assert(parts(store) <= 2 && parts(out) <= 2, s"store=${parts(store)} out=${parts(out)}")
    // the whole history survived the folds: 4 distinct texts, dup dropped
    assert(spark.read.parquet(store).count() == 4)
    assert(spark.read.parquet(out).select("keep_doc_id").as[Long].collect().toSet ==
      Set(1L, 2L, 4L, 5L))

    // CRASHED COMPACTION: committed tmp (data + _SUCCESS + target
    // marker), history partition already deleted, rename never happened
    // — without resolution the next batch would read a store missing
    // that history (the tmp dir is invisible to parquet readers) and
    // RE-ADMIT a duplicate
    val fs = new org.apache.hadoop.fs.Path(store)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxId = spark.read.parquet(store)
      .agg(max(col("ingest_batch")).cast("long")).head().getLong(0)
    val tmp = new org.apache.hadoop.fs.Path(store, ".compact_tmp")
    spark.read.parquet(store).filter(col("ingest_batch") < maxId)
      .drop("ingest_batch").write.parquet(tmp.toString)
    fs.create(new org.apache.hadoop.fs.Path(tmp, s"_TARGET_${maxId - 1}")).close()
    spark.read.parquet(store).select("ingest_batch").distinct()
      .as[Int].collect().filter(_ < maxId).foreach(b =>
        fs.delete(new org.apache.hadoop.fs.Path(store, s"ingest_batch=$b"), true))
    // resume on the SAME checkpoint: the auto-compacting body rolls the
    // crashed compaction forward first, so the dup still drops
    drop(Seq(Doc(10, "one unique text"), Doc(11, "five unique text")),
      "04.parquet", t0 - 10000)
    val q2 = startQ()
    q2.awaitTermination(120000)
    val lastKeeps = spark.read.parquet(out)
      .groupBy("keep_doc_id").count()
      .select("keep_doc_id").as[Long].collect().toSet
    assert(lastKeeps == Set(1L, 2L, 4L, 5L, 11L),
      s"crashed compaction lost history: $lastKeeps")
    assert(spark.read.parquet(store).count() == 5)
  }

  test("seeded stores: corpus history gates the very FIRST batch; re-seed refused once started") {
    import spark.implicits._
    // exact dedup: the seed lands at ingest_batch=-1, so batch 0's
    // read-below-0 SEES it and a corpus duplicate drops immediately
    val store = tmpDir("seed-dedup-store"); val out = tmpDir("seed-dedup-out")
    val corpus = Seq(Doc(100, "alpha corpus text"), Doc(101, "beta corpus text")).toDF()
    Jobs.seedDedupStore(corpus, store)
    // an EMPTY re-seed must REPLACE the previous seed, not silently
    // keep it (dynamic overwrite writes no partitions for an empty
    // frame — the pre-write clear is what makes "replace" true)
    Jobs.seedDedupStore(corpus.limit(0), store)
    // (an empty store has no partitions to read — assert at the FS level)
    assert(!new java.io.File(store, "ingest_batch=-1").exists(),
      "empty re-seed left the previous seed's rows behind")
    Jobs.seedDedupStore(corpus, store) // re-seed BEFORE any batch: replace, not refuse
    assert(spark.read.parquet(store).count() == 2)
    Jobs.incrementalDedupBatch(store, out)(
      Seq(Doc(1, "alpha corpus text"), Doc(2, "gamma fresh text")).toDF(), 0L)
    def keeps(batch: Long) = spark.read.parquet(out)
      .filter(col("ingest_batch") === batch)
      .select("keep_doc_id").as[Long].collect().toSet
    assert(keeps(0L) == Set(2L), s"corpus dup admitted: ${keeps(0L)}")
    // once a batch has run, changing the seed would change what a
    // replayed batch sees — refused
    val ex = intercept[IllegalArgumentException](Jobs.seedDedupStore(corpus, store))
    assert(ex.getMessage.contains("cannot seed"))
    // compaction folds the seed below the live batch without losing it
    Jobs.incrementalDedupBatch(store, out)(Seq(Doc(3, "delta text")).toDF(), 1L)
    assert(Jobs.compactIngestStore(spark, store)
      .isInstanceOf[Jobs.CompactionOutcome.Compacted])
    Jobs.incrementalDedupBatch(store, out)(
      Seq(Doc(10, "beta corpus text"), Doc(11, "epsilon text")).toDF(), 2L)
    assert(keeps(2L) == Set(11L), s"seed lost by compaction: ${keeps(2L)}")

    // near-dup gate: batch 0 rejects a doc similar to the seeded corpus
    val nstore = tmpDir("seed-ndup-store"); val nout = tmpDir("seed-ndup-out")
    Jobs.seedNearDupStore(
      Seq(Doc(200, "the quick brown fox jumps over the lazy dog every single day")).toDF(),
      nstore)
    Jobs.nearDupGateBatch(nstore, nout)(
      Seq(Doc(5, "the quick brown fox jumps over the lazy dog every single morning"),
        Doc(6, "completely unrelated content about parquet compaction and streams")).toDF(), 0L)
    val admitted = spark.read.parquet(nout).select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(6L), s"got $admitted")
  }

  test("near-dup gate stream: later batches reject texts similar to anything admitted") {
    import spark.implicits._
    // The end-of-test isEmpty assertion is about THIS gate's cache
    // discipline; suites share one session, and e.g. the cache-exercising
    // coverage query legitimately leaves an entry behind when it ran first.
    spark.catalog.clearCache()
    val store = tmpDir("ndgate-store"); val out = tmpDir("ndgate-out")
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startNearDupGate(ms.toDF(), store, out,
      tmpDir("ndgate-ckpt"), threshold = 0.4, Trigger.ProcessingTime(0))

    val base = "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "on the warm windowsill every afternoon enjoying the quiet sunshine"
    // Batch 0: store empty, everything passes.
    ms.addData(Doc(1, base),
      Doc(2, "completely different content about spark partitions and shuffle behavior at massive scale"))
    q.processAllAvailable()
    // Batch 1: near-dup of doc 1 (one word changed) must be gated out;
    // a fresh text passes; a near-dup of THIS batch's fresh text also
    // passes (within-batch pairs are not the gate's contract).
    val fresh = "entirely new material discussing streaming watermark state expiry " +
      "and checkpoint recovery semantics in long running jobs"
    ms.addData(Doc(10, base.replace("warm", "cold")),
      Doc(11, fresh), Doc(12, fresh.replace("jobs", "pipelines")))
    q.processAllAvailable()
    // Batch 2: near-dups of batch 1's admissions are now gated too.
    ms.addData(Doc(20, fresh.replace("new", "novel")), Doc(21, base))
    q.processAllAvailable()
    q.stop()

    val admitted = spark.read.parquet(out)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted == Map(1L -> 0, 2L -> 0, 11L -> 1, 12L -> 1),
      s"got $admitted")
    // Store holds shingles only for admitted docs.
    val storeDocs = spark.read.parquet(store).select("doc_id")
      .distinct().as[Long].collect().toSet
    assert(storeDocs == Set(1L, 2L, 11L, 12L))
    // No cache left behind by the per-batch sweeps.
    assert(spark.sharedState.cacheManager.isEmpty, "leaked cache entries")
  }

  test("semdedup gate refuses a pre-r19 FLAT-layout store loudly, before any write") {
    import spark.implicits._
    val store = tmpDir("sdgate-flat-store")
    // a store written under the OLD layout: root-level ingest_batch=N
    Seq((1L, 0, Seq(1.0, 0.0), 1.0))
      .toDF("vec_id", "domain", "embedding", "nrm")
      .withColumn("ingest_batch", lit(0L))
      .write.mode("overwrite").partitionBy("ingest_batch").parquet(store)
    val b = Seq((2L, "x", Seq(1.0, 0.0, 0.0, 0.0)))
      .toDF("vec_id", "label", "embedding")
    val ex = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(store, tmpDir("sdgate-flat-out"), eps = 0.9)(b, 1L))
    assert(ex.getMessage.contains("FLAT layout"), ex.getMessage)
  }

  test("semdedup gate stream: eps-close to admitted history dropped, within-batch passes, replay-safe, seedable") {
    import spark.implicits._
    spark.catalog.clearCache()
    val store = tmpDir("sdgate-store"); val out = tmpDir("sdgate-out")
    // 64-dim-agnostic vectors (graft_dot folds min length vs the
    // committed centroids, so assignment stays deterministic): u is the
    // base direction, uNear a small nudge (cos ~0.999), w orthogonal
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val uNear = Seq(1.0, 0.05, 0.0, 0.0)
    val w = Seq(0.0, 0.0, 1.0, 0.0)
    val wNear = Seq(0.0, 0.0, 1.0, 0.05)
    // precondition of the scenario: the nudges do not move the domain
    val doms = graft.ops.Similarity
      .assignDomains(Seq(Emb(1, "a", u), Emb(2, "b", uNear),
        Emb(3, "c", w), Emb(4, "d", wNear)).toDF())
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(doms(1L) == doms(2L) && doms(3L) == doms(4L),
      s"fixture nudge crossed a domain: $doms")
    val ms = MemoryStream[Emb](spark)(org.apache.spark.sql.Encoders.product[Emb])
    val q = Jobs.startSemDeDupGate(ms.toDF(), store, out,
      tmpDir("sdgate-ckpt"), eps = 0.9, queryTrigger = Trigger.ProcessingTime(0))
    // Batch 0: store empty, everything passes — including two exact
    // copies in ONE batch (within-batch dups are not the gate's contract)
    ms.addData(Emb(1, "a", u), Emb(2, "a2", u))
    q.processAllAvailable()
    // Batch 1: eps-close to admitted history dropped; orthogonal passes
    val b1 = Seq(Emb(10, "dup", uNear), Emb(11, "fresh", w))
    ms.addData(b1: _*)
    q.processAllAvailable()
    // Batch 2: eps-close to BATCH 1's admission is now history too
    ms.addData(Emb(20, "dup2", wNear))
    q.processAllAvailable()
    q.stop()
    def admitted() = spark.read.parquet(out)
      .select("vec_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted() == Map(1L -> 0, 2L -> 0, 11L -> 1), s"got ${admitted()}")
    // store rows are exactly the admissions, vectors + norms intact
    val stored = spark.read.parquet(store)
      .select("vec_id").as[Long].collect().toSet
    assert(stored == Set(1L, 2L, 11L))
    // replay idempotence: re-running the last-committed batch body sees
    // only read-below history and overwrites its own partition
    Jobs.semDeDupGateBatch(store, out, eps = 0.9)(b1.toDF(), 1L)
    assert(admitted() == Map(1L -> 0, 2L -> 0, 11L -> 1),
      s"replay changed output: ${admitted()}")
    assert(spark.sharedState.cacheManager.isEmpty, "leaked cache entries")

    // seeding: the store bootstraps with the BATCH operator's survivors
    // (corpus internal dup collapses), and batch 0 gates against it
    val sstore = tmpDir("sdseed-store"); val sout = tmpDir("sdseed-out")
    val corpus = Seq(Emb(100, "c", u), Emb(101, "cdup", u), Emb(102, "c2", w)).toDF()
    Jobs.seedSemDeDupStore(corpus, sstore, eps = 0.9)
    val seeded = spark.read.parquet(sstore).select("vec_id").as[Long].collect().toSet
    assert(seeded.size == 2 && seeded.contains(102L),
      s"seed did not collapse the corpus dup: $seeded")
    Jobs.semDeDupGateBatch(sstore, sout, eps = 0.9)(
      Seq(Emb(5, "dup", uNear), Emb(6, "fresh", Seq(0.0, 1.0, 0.0, 0.0))).toDF(), 0L)
    val sAdmitted = spark.read.parquet(sout).select("vec_id").as[Long].collect().toSet
    assert(sAdmitted == Set(6L), s"got $sAdmitted")
    // re-seeding after a batch has run is refused
    val ex = intercept[IllegalArgumentException](
      Jobs.seedSemDeDupStore(corpus, sstore, eps = 0.9))
    assert(ex.getMessage.contains("cannot seed"))
    // a zero-norm vector can never be matched later — refused loudly,
    // not silently admitted into the store
    val exZero = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(sstore, sout, eps = 0.9)(
        Seq(Emb(7, "zero", Seq(0.0, 0.0, 0.0, 0.0))).toDF(), 1L))
    assert(exZero.getMessage.contains("zero-norm"), exZero.getMessage)
    val exNull = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(sstore, sout, eps = 0.9)(
        Seq(Emb(8, "null", null)).toDF(), 1L))
    assert(exNull.getMessage.contains("NULL"), exNull.getMessage)
    // a batch in a different embedding space than the store would
    // silently deflate every cosine (graft_dot folds the shorter
    // length) — refused loudly instead
    val exDim = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(sstore, sout, eps = 0.9)(
        Seq(Emb(9, "sixdim", Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6))).toDF(), 1L))
    assert(exDim.getMessage.contains("-dim"), exDim.getMessage)
    // and mixed dims WITHIN one batch are equally refused
    val exMix = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(sstore, sout, eps = 0.9)(
        Seq(Emb(10, "a", Seq(1.0, 0.0, 0.0, 0.0)),
          Emb(11, "b", Seq(1.0, 0.0, 0.0))).toDF(), 1L))
    assert(exMix.getMessage.contains("mixed"), exMix.getMessage)
  }

  test("semdedup gate withinBatch: eps-twins in ONE batch admit exactly one; history gate unchanged") {
    import spark.implicits._
    val store = tmpDir("sdwb-store"); val out = tmpDir("sdwb-out")
    val u = Seq(1.0, 0.0, 0.0, 0.0)
    val uNear = Seq(1.0, 0.05, 0.0, 0.0)
    val w = Seq(0.0, 0.0, 1.0, 0.0)
    val ms = MemoryStream[Emb](spark)(org.apache.spark.sql.Encoders.product[Emb])
    val q = Jobs.startSemDeDupGate(ms.toDF(), store, out,
      tmpDir("sdwb-ckpt"), eps = 0.9, queryTrigger = Trigger.ProcessingTime(0),
      withinBatch = true)
    // batch 0: two EXACT twins in one batch — the keep-rule tie admits
    // the lower id (the default contract admits both; the existing gate
    // test pins that); the orthogonal vector is untouched
    ms.addData(Emb(1, "a", u), Emb(2, "a2", u), Emb(3, "w", w))
    q.processAllAvailable()
    // batch 1: history semantics unchanged — both are eps-close to
    // batch 0's admissions and drop
    val b1 = Seq(Emb(10, "dup", uNear), Emb(11, "again", u))
    ms.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    def admitted() = spark.read.parquet(out)
      .select("vec_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted() == Map(1L -> 0, 3L -> 0), s"got ${admitted()}")
    assert(spark.read.parquet(store).select("vec_id").as[Long].collect().toSet
      == Set(1L, 3L))
    // replay idempotence: the intra pass is a pure function of the batch
    Jobs.semDeDupGateBatch(store, out, eps = 0.9, withinBatch = true)(b1.toDF(), 1L)
    assert(admitted() == Map(1L -> 0, 3L -> 0), s"replay changed: ${admitted()}")
    assert(spark.sharedState.cacheManager.isEmpty, "leaked cache entries")
  }

  test("semdedup gate under a fitted quantizer table: roundtrip, verdicts, dim + table-identity refusals") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = graft.ops.Similarity.fitQuantizerTwoLevel(emb, nlist = 40)
    // persisted table roundtrips exactly (the stream loads it once)
    val qdir = tmpDir("sdq-table")
    graft.ops.Similarity.writeQuantizer(q, qdir, spark)
    val q2 = graft.ops.Similarity.readQuantizer(spark, qdir)
    assert(q2.subCents.map(_.toSeq).toSeq == q.subCents.map(_.toSeq).toSeq)
    assert(q2.topCents.map(_.toSeq).toSeq == q.topCents.map(_.toSeq).toSeq)
    assert(q2.offsets.toSeq == q.offsets.toSeq && q2.counts.toSeq == q.counts.toSeq)
    // gate batches assign under the fitted cells: an exact twin of
    // history shares its (fitted) cell and drops
    val store = tmpDir("sdq-store"); val out = tmpDir("sdq-out")
    val b0 = emb.filter(col("vec_id") < 10)
    Jobs.semDeDupGateBatch(store, out, eps = 0.9, quantizer = Some(q2))(b0, 0L)
    assert(spark.read.parquet(out).count() == 10)
    val twin = emb.filter(col("vec_id") === 0L).withColumn("vec_id", lit(9000L))
    Jobs.semDeDupGateBatch(store, out, eps = 0.9, quantizer = Some(q2))(twin, 1L)
    assert(spark.read.parquet(out).filter(col("vec_id") === 9000L).isEmpty,
      "exact twin of fitted-cell history was admitted")
    // a batch in a different space than the table is refused loudly
    // (graft_nearest_cell would fold the prefix and silently mis-assign)
    val exDim = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(store, out, eps = 0.9, quantizer = Some(q2))(
        Seq(Emb(1, "short", Seq(1.0, 0.0))).toDF(), 2L))
    assert(exDim.getMessage.contains("-dim"), exDim.getMessage)
    // the store is stamped with its assignment table: gating it under
    // the COMMITTED table is refused, not silently cross-verdicted
    val exTab = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(store, out, eps = 0.9)(b0, 2L))
    assert(exTab.getMessage.contains("assignment"), exTab.getMessage)
    // and a fitted-table SEED stamps the store the same way
    val sstore = tmpDir("sdq-seed-store")
    Jobs.seedSemDeDupStore(emb.filter(col("vec_id") < 50), sstore, eps = 0.9,
      quantizer = Some(q2))
    val exSeedTab = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(sstore, tmpDir("sdq-seed-out"), eps = 0.9)(b0, 0L))
    assert(exSeedTab.getMessage.contains("assignment"), exSeedTab.getMessage)
  }

  test("semdedup gate: externally mutated store with MIXED dims is refused (full-history dim check)") {
    import spark.implicits._
    // seedSemDeDupStore can no longer produce this (the batch operator
    // validates), so simulate an externally mutated store: two admitted
    // rows at DIFFERENT dims. A single-row probe could sample the
    // matching row and let the other's deflated cosines pass silently;
    // the min==max aggregate over the pruned history cannot.
    val store = tmpDir("sdmix-store"); val out = tmpDir("sdmix-out")
    Seq((100L, "h1", 0, Seq(1.0, 0.0, 0.0, 0.0), 1.0),
        (101L, "h2", 0, Seq(1.0, 0.0, 0.0), 1.0))
      .toDF("vec_id", "label", "domain", "embedding", "nrm")
      .withColumn("ingest_batch", lit(0L))
      .write.mode("overwrite").partitionBy("domain", "ingest_batch").parquet(store)
    val ex = intercept[IllegalArgumentException](
      Jobs.semDeDupGateBatch(store, out, eps = 0.9)(
        Seq(Emb(1, "a", Seq(1.0, 0.0, 0.0, 0.0))).toDF(), 1L))
    assert(ex.getMessage.contains("-dim"), ex.getMessage)
  }

  test("decontamination gate stream: benchmark-leaking docs dropped across batches, replay-safe") {
    import spark.implicits._
    val store = tmpDir("decon-store"); val out = tmpDir("decon-out")
    val benchText = "which planet is known as the red planet in our solar system today"
    val bench = Seq((100L, benchText, "en", "bench", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Jobs.buildBenchmarkShingleStore(bench, store)

    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startDecontaminationGate(ms.toDF(), store, out,
      tmpDir("decon-ckpt"), minShared = 5L,
      queryTrigger = Trigger.ProcessingTime(0))
    // Batch 0: doc 1 embeds the benchmark item verbatim (leak), doc 2 clean.
    ms.addData(
      Doc(1, s"trivia question list item seven $benchText answer mars obviously"),
      Doc(2, "a clean training document about distributed query execution strategies"))
    q.processAllAvailable()
    // Batch 1: another leak (the same benchmark text, different noise), another clean doc.
    val b1 = Seq(Doc(10, s"$benchText is a common quiz question"),
      Doc(11, "more clean material on shuffle partitioning and skew mitigation"))
    ms.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    def admitted() = spark.read.parquet(out)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted() == Map(2L -> 0, 11L -> 1), s"got ${admitted()}")
    // Replay batch 1 directly (foreachBatch at-least-once): the static
    // store + own-partition overwrite make the re-run byte-identical.
    Jobs.decontaminationGateBatch(store, out)(b1.toDF(), 1L)
    assert(admitted() == Map(2L -> 0, 11L -> 1), s"replay changed output: ${admitted()}")
    // A gate probing with a different shingle size than the store was
    // built with would match NOTHING — it must fail loudly, not admit.
    val ex = intercept[IllegalArgumentException](
      Jobs.decontaminationGateBatch(store, out, 5L, shingleSize = 5)(b1.toDF(), 2L))
    assert(ex.getMessage.contains("shingleSize"))
  }

  test("semantic decontamination gate stream: embedding-space leaks dropped, replay-safe, dim-validated") {
    import spark.implicits._
    // unit-ish vectors: b is the benchmark direction; the leak is b
    // scaled (cosine 1.0), nearleak is b with a small orthogonal nudge
    // (cosine ~0.995); clean vectors are (near-)orthogonal to b
    val b = Seq(1.0, 0.0, 0.0, 0.0)
    val store = tmpDir("semgate-store"); val out = tmpDir("semgate-out")
    Jobs.buildBenchmarkEmbeddingStore(
      Seq(Emb(100L, "bench", b)).toDF(), store)
    val ms = MemoryStream[Emb](spark)(org.apache.spark.sql.Encoders.product[Emb])
    val q = Jobs.startSemanticDecontaminationGate(ms.toDF(), store, out,
      tmpDir("semgate-ckpt"), threshold = 0.9,
      queryTrigger = Trigger.ProcessingTime(0))
    ms.addData(
      Emb(1, "clean", Seq(0.0, 1.0, 0.0, 0.0)),
      Emb(2, "leak", b.map(_ * 2))) // scaled copy: cosine exactly 1.0
    q.processAllAvailable()
    val b1 = Seq(
      Emb(10, "nearleak", Seq(1.0, 0.1, 0.0, 0.0)), // cos ~0.995 >= 0.9
      Emb(11, "clean", Seq(0.0, 0.3, 0.9, 0.0)))
    ms.addData(b1: _*)
    q.processAllAvailable()
    q.stop()
    def admitted() = spark.read.parquet(out)
      .select("vec_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted() == Map(1L -> 0, 11L -> 1), s"got ${admitted()}")
    // survivors carry the audit column and respect the threshold
    val maxCos = spark.read.parquet(out)
      .select("max_bench_cos").as[Option[Double]].collect().flatten
    assert(maxCos.forall(_ < 0.9))
    // replay idempotence: the static store + own-partition overwrite
    val bench = spark.read.parquet(store).select("be", "bn")
    Jobs.semanticGateBatch(bench, 4, out, 0.9)(b1.toDF(), 1L)
    assert(admitted() == Map(1L -> 0, 11L -> 1), s"replay changed output: ${admitted()}")
    // a store built on 4-dim vectors must refuse a caller expecting 8
    val ex = intercept[IllegalArgumentException](
      Jobs.loadEmbeddingStore(spark, store, expectDim = Some(8)))
    assert(ex.getMessage.contains("4-dim") && ex.getMessage.contains("8-dim"))
  }

  test("benchmark embedding store refuses heterogeneous dims and NULL embeddings at build") {
    import spark.implicits._
    // heterogeneous: one 4-dim + one 3-dim vector — a mixed store would
    // validate off one arbitrary row and silently deflate the rest
    val het = intercept[IllegalArgumentException](
      Jobs.buildBenchmarkEmbeddingStore(
        Seq(Emb(1, "a", Seq(1.0, 0.0, 0.0, 0.0)), Emb(2, "b", Seq(1.0, 0.0, 0.0))).toDF(),
        tmpDir("semstore-het")))
    assert(het.getMessage.contains("heterogeneous"))
    // NULL embedding rows can never gate anything
    val withNull = Seq(Emb(1, "a", Seq(1.0, 0.0, 0.0, 0.0))).toDF()
      .unionByName(Seq(("b", 2L)).toDF("label", "vec_id")
        .withColumn("embedding", org.apache.spark.sql.functions.lit(null)
          .cast("array<double>")))
    val nul = intercept[IllegalArgumentException](
      Jobs.buildBenchmarkEmbeddingStore(withNull, tmpDir("semstore-null")))
    assert(nul.getMessage.contains("NULL embeddings"))
    // empty benchmark frame: loud, not a store that gates nothing
    val emp = intercept[IllegalArgumentException](
      Jobs.buildBenchmarkEmbeddingStore(
        Seq.empty[Emb].toDF(), tmpDir("semstore-empty")))
    assert(emp.getMessage.contains("empty"))
  }

  test("semantic gate batch refuses NULL embeddings instead of admitting them unscored") {
    import spark.implicits._
    val store = tmpDir("semgate-null-store"); val out = tmpDir("semgate-null-out")
    Jobs.buildBenchmarkEmbeddingStore(
      Seq(Emb(100L, "bench", Seq(1.0, 0.0, 0.0, 0.0))).toDF(), store)
    val bench = spark.read.parquet(store).select("be", "bn")
    // one scoreable row + one NULL-embedding row: under ANSI size(NULL)
    // is NULL, so min/max alone would pass and the NULL row would
    // survive the gate with max_bench_cos NULL (coalesce(-1) admits it)
    val batch = Seq(Emb(1, "clean", Seq(0.0, 1.0, 0.0, 0.0))).toDF()
      .unionByName(Seq(("leaky?", 2L)).toDF("label", "vec_id")
        .withColumn("embedding", org.apache.spark.sql.functions.lit(null)
          .cast("array<double>")))
    val ex = intercept[IllegalArgumentException](
      Jobs.semanticGateBatch(bench, 4, out, 0.9)(batch, 0L))
    assert(ex.getMessage.contains("NULL embeddings"))
  }

  test("bloom decontamination gate stream: leaks dropped join-free, replay-safe, size-validated") {
    import spark.implicits._
    val store = tmpDir("decon-bloom-store"); val out = tmpDir("decon-bloom-out")
    val benchText = "which planet is known as the red planet in our solar system today"
    val bench = Seq((100L, benchText, "en", "bench", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Jobs.buildBenchmarkBloomStore(bench, store)

    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startDecontaminationGateBloom(ms.toDF(), store, out,
      tmpDir("decon-bloom-ckpt"), minShared = 5L,
      queryTrigger = Trigger.ProcessingTime(0))
    ms.addData(
      Doc(1, s"trivia question list item seven $benchText answer mars obviously"),
      Doc(2, "a clean training document about distributed query execution strategies"))
    q.processAllAvailable()
    val b1 = Seq(Doc(10, s"$benchText is a common quiz question"),
      Doc(11, "more clean material on shuffle partitioning and skew mitigation"))
    ms.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    def admitted() = spark.read.parquet(out)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toMap
    // no false negatives: both leaking docs die; the tiny clean docs
    // cannot reach minShared=5 even through false positives (they have
    // few shingles and the filter holds ~12 entries in 2^23 bits)
    assert(admitted() == Map(2L -> 0, 11L -> 1), s"got ${admitted()}")
    // replay idempotence: pure function of (batch, filter) + dynamic
    // own-partition overwrite
    Jobs.decontaminationGateBloomBatch(store, out)(b1.toDF(), 1L)
    assert(admitted() == Map(2L -> 0, 11L -> 1), s"replay changed output: ${admitted()}")
    // size mismatch fails loudly (would otherwise match nothing)
    val ex = intercept[IllegalArgumentException](
      Jobs.decontaminationGateBloomBatch(store, out, 5L, shingleSize = 5)(b1.toDF(), 2L))
    assert(ex.getMessage.contains("shingleSize"))
  }

  test("decontamination gate honors a consistent non-default shingle size") {
    import spark.implicits._
    // Store AND gate both at shingleSize=4: validation passes — and the
    // probe must actually shingle at 4, so the leak is still caught.
    // (A gate that validated at 4 but probed at the default 3 would join
    // 3-gram hashes against a 4-gram index and admit everything.)
    val store = tmpDir("decon4-store"); val out = tmpDir("decon4-out")
    val benchText = "which planet is known as the red planet in our solar system today"
    val bench = Seq((100L, benchText, "en", "bench", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Jobs.buildBenchmarkShingleStore(bench, store, shingleSize = 4)

    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startDecontaminationGate(ms.toDF(), store, out,
      tmpDir("decon4-ckpt"), minShared = 5L, shingleSize = 4,
      queryTrigger = Trigger.ProcessingTime(0))
    ms.addData(
      Doc(1, s"leaking wrapper around the item $benchText with extra words"),
      Doc(2, "a clean training document about distributed query execution strategies"))
    q.processAllAvailable()
    q.stop()
    val admitted = spark.read.parquet(out).select("doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(2L), s"size-4 gate failed to drop the leak: $admitted")
  }

  test("LM gate stream: in-distribution docs admitted, salad dropped, replay-safe") {
    import spark.implicits._
    val store = tmpDir("lm-store"); val out = tmpDir("lm-out")
    // reference corpus: repeated common constructions -> the model
    val common = "the cat sat on the mat and the dog slept by the door"
    val corpus = (1L to 20L).map(i => (i, common, "en", "ref", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    Jobs.buildLmStore(corpus, store)

    // pick the threshold from the scores themselves: midway between an
    // in-distribution doc and an out-of-distribution salad
    val cb = spark.read.parquet(s"$store/bigrams")
    val cu = cb.groupBy("w1").agg(sum("cb").as("cu"))
    val v = spark.read.parquet(s"$store/meta").head().getLong(0)
    val probe = Seq((1L, common, "en", "s", 1L),
      (2L, "zebra quantum furnace ballet ocean drift", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val scores = graft.ops.TextAnalysis.lmScoreAgainst(probe, cb, cu, v)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L), s"in-distribution must outscore salad: $scores")
    val threshold = (scores(1L) + scores(2L)) / 2

    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = Jobs.startLmGate(ms.toDF(), store, out, tmpDir("lm-ckpt"),
      minAvgLogp = threshold, queryTrigger = Trigger.ProcessingTime(0))
    ms.addData(
      Doc(1, s"$common again tonight"),
      Doc(2, "zebra quantum furnace ballet ocean drift"))
    q.processAllAvailable()
    val b1 = Seq(Doc(10, common), Doc(11, "xylophone glacier turbine mango"),
      Doc(12, "solo")) // zero bigrams -> undefined score -> dropped
    ms.addData(b1: _*)
    q.processAllAvailable()
    q.stop()

    def admitted() = spark.read.parquet(out)
      .select("doc_id", "ingest_batch").as[(Long, Int)].collect().toMap
    assert(admitted() == Map(1L -> 0, 10L -> 1), s"got ${admitted()}")
    // replay batch 1 directly (foreachBatch at-least-once): static store
    // + own-partition overwrite keep the re-run byte-identical
    Jobs.lmGateBatch(store, out, threshold)(b1.toDF(), 1L)
    assert(admitted() == Map(1L -> 0, 10L -> 1), s"replay changed output: ${admitted()}")
    // an empty model must fail loudly at load, not admit everything
    val emptyStore = tmpDir("lm-empty")
    Jobs.buildLmStore(corpus.filter(col("doc_id") < 0), emptyStore)
    val ex = intercept[Exception](
      Jobs.lmGateBatch(emptyStore, out, threshold)(b1.toDF(), 2L))
    assert(ex.getMessage.contains("vocabSize") || ex.isInstanceOf[java.util.NoSuchElementException],
      s"unexpected: $ex")
  }

  test("streaming sketch store: estimates track exact distincts across batches, replay-safe") {
    import spark.implicits._
    val ms = MemoryStream[Ev](spark)(org.apache.spark.sql.Encoders.product[Ev])
    val store = tmpDir("sketch-store")
    val q = Jobs.startSketchStore(ms.toDF(), store, tmpDir("sketch-ckpt"),
      Trigger.ProcessingTime(0))
    def ev(id: Long, day: Int, user: Long) =
      Ev(id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), user, "view", 1.0, "{}")
    try {
      // batch 1: day 1 users 1-40, day 2 users 1-10
      ms.addData((1L to 40L).map(u => ev(u, 1, u)) ++ (41L to 50L).map(u => ev(u, 2, u - 40)))
      q.processAllAvailable()
      // batch 2: day 1 users 21-60 (20 overlap), day 3 users 1-5
      ms.addData((61L to 100L).map(u => ev(u, 1, u - 40)) ++ (101L to 105L).map(u => ev(u, 3, u - 100)))
      q.processAllAvailable()
    } finally q.stop()
    val est = Jobs.sketchStoreDailyEstimates(spark, store)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val exact = Map("2024-01-01" -> 60L, "2024-01-02" -> 10L, "2024-01-03" -> 5L)
    assert(est.keySet == exact.keySet)
    exact.foreach { case (d, ex) =>
      assert(math.abs(est(d) - ex).toDouble / ex <= 0.05, s"$d: est ${est(d)} vs exact $ex")
    }
    // replay idempotence: re-running a batch body with the same id
    // dynamic-overwrites its own partition — estimates unchanged
    val replay = (61L to 100L).map(u => ev(u, 1, u - 40)) ++ (101L to 105L).map(u => ev(u, 3, u - 100))
    Jobs.sketchStoreBatch(store)(
      replay.toDF(), 1L)
    val est2 = Jobs.sketchStoreDailyEstimates(spark, store)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est2 == est, s"replay changed estimates: $est2 vs $est")
    // checkpoint-reset guard: id 0 against a store advanced to 1 would
    // overwrite batch 0's sketches — refused, estimates unchanged
    val reset = intercept[IllegalArgumentException](
      Jobs.sketchStoreBatch(store)(replay.toDF(), 0L))
    assert(reset.getMessage.contains("fresh-checkpoint"), s"got: $reset")
    assert(Jobs.sketchStoreDailyEstimates(spark, store)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap == est)
  }

  test("ingest-store compaction: one history partition, reads/replay/guard intact, crash roll-forward") {
    import spark.implicits._
    import Jobs.CompactionOutcome
    def ev(id: Long, day: Int, user: Long) =
      Ev(id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), user, "view", 1.0, "{}")
    def batchRows(b: Int) = (1L to 30L).map(u => ev(u, b + 1, u + 10 * b))
    // the invariant compaction promises is the ROW multiset, byte for
    // byte — HLL union ESTIMATES can wiggle within error bounds when
    // file merge reorders the union, so they are the wrong assert here
    def rows(store: String) = spark.read.parquet(store)
      .select("day", "sketch").collect()
      .map(r => (r.getDate(0).toString,
        java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1))))
      .sorted.toSeq
    def partitionIds(store: String) = new java.io.File(store).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ingest_batch="))
      .map(_.getName.stripPrefix("ingest_batch=").toLong).toSet
    def build(tag: String): String = {
      val store = tmpDir(tag)
      (0 to 2).foreach(b => Jobs.sketchStoreBatch(store)(batchRows(b).toDF(), b.toLong))
      store
    }

    val store = build("compact-store")
    val before = rows(store)
    assert(partitionIds(store) == Set(0L, 1L, 2L))
    val out = Jobs.compactIngestStore(spark, store)
    out match {
      case CompactionOutcome.Compacted(key, merged, fb, fa) =>
        assert(key == 1L && merged == 2, s"got $out")
        assert(fa <= fb, s"file count grew: $fb -> $fa")
      case other => fail(s"expected Compacted, got $other")
    }
    // history collapsed to ONE partition keyed below the live batch;
    // query results identical
    assert(partitionIds(store) == Set(1L, 2L))
    assert(rows(store) == before)
    // the live batch still replays idempotently (compacted key 1 < 2)
    Jobs.sketchStoreBatch(store)(batchRows(2).toDF(), 2L)
    assert(rows(store) == before)
    // the checkpoint-reset guard still sees max=2: id 1 refused
    val reset = intercept[IllegalArgumentException](
      Jobs.sketchStoreBatch(store)(batchRows(1).toDF(), 1L))
    assert(reset.getMessage.contains("fresh-checkpoint"))
    // two partitions left: nothing more to merge
    assert(Jobs.compactIngestStore(spark, store) == CompactionOutcome.NothingToDo)

    // CRASH ROLL-FORWARD: committed tmp (+_TARGET marker), partition 0
    // already deleted, partition 1 not yet, rename never happened
    val crashed = build("compact-crash")
    val crashedBefore = rows(crashed)
    val fs = new org.apache.hadoop.fs.Path(crashed)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(crashed, ".compact_tmp")
    spark.read.parquet(crashed).filter(col("ingest_batch") < 2)
      .drop("ingest_batch").write.parquet(tmp.toString)
    fs.create(new org.apache.hadoop.fs.Path(tmp, "_TARGET_1")).close()
    fs.delete(new org.apache.hadoop.fs.Path(crashed, "ingest_batch=0"), true)
    assert(Jobs.compactIngestStore(spark, crashed) == CompactionOutcome.RolledForward(1L))
    assert(partitionIds(crashed) == Set(1L, 2L))
    assert(rows(crashed) == crashedBefore)

    // UNCOMMITTED tmp (no _TARGET_ marker): originals intact, so it is
    // discarded and a fresh compaction proceeds
    val stale = build("compact-stale")
    val staleBefore = rows(stale)
    val staleTmp = new org.apache.hadoop.fs.Path(stale, ".compact_tmp")
    fs.mkdirs(staleTmp)
    fs.create(new org.apache.hadoop.fs.Path(staleTmp, "part-garbage.parquet")).close()
    assert(Jobs.compactIngestStore(spark, stale)
      .isInstanceOf[CompactionOutcome.Compacted])
    assert(partitionIds(stale) == Set(1L, 2L))
    assert(rows(stale) == staleBefore)

    // OBJECT-STORE COMMIT SIGNAL: the _TARGET_ marker alone must commit.
    // With mapreduce.fileoutputcommitter.marksuccessfuljobs=false (the
    // common object-store config) the tmp write produces NO _SUCCESS;
    // a crash between the history deletes and the rename then leaves
    // (marker present, _SUCCESS absent) where the tmp holds the ONLY
    // copy of the folded history — classifying it uncommitted would
    // destroy that history, so it must roll forward instead
    val noSuccess = build("compact-nosuccess")
    val noSuccessBefore = rows(noSuccess)
    val nsTmp = new org.apache.hadoop.fs.Path(noSuccess, ".compact_tmp")
    spark.read.parquet(noSuccess).filter(col("ingest_batch") < 2)
      .drop("ingest_batch").write.parquet(nsTmp.toString)
    fs.delete(new org.apache.hadoop.fs.Path(nsTmp, "_SUCCESS"), false)
    fs.create(new org.apache.hadoop.fs.Path(nsTmp, "_TARGET_1")).close()
    fs.delete(new org.apache.hadoop.fs.Path(noSuccess, "ingest_batch=0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(noSuccess, "ingest_batch=1"), true)
    assert(Jobs.compactIngestStore(spark, noSuccess)
      == CompactionOutcome.RolledForward(1L))
    assert(partitionIds(noSuccess) == Set(1L, 2L))
    assert(rows(noSuccess) == noSuccessBefore)

    // RESUME WITHOUT THE CADENCE: a body run with NO compaction opt-in
    // must still resolve a crashed compaction before reading — the
    // folded history lives only in the invisible tmp, and reading the
    // gapped store would re-admit what it holds. The monotone guard
    // carries the resolution, so the plain batch body suffices.
    val gapped = build("compact-gapped")
    val gappedBefore = rows(gapped)
    val gTmp = new org.apache.hadoop.fs.Path(gapped, ".compact_tmp")
    spark.read.parquet(gapped).filter(col("ingest_batch") < 2)
      .drop("ingest_batch").write.parquet(gTmp.toString)
    fs.create(new org.apache.hadoop.fs.Path(gTmp, "_TARGET_1")).close()
    fs.delete(new org.apache.hadoop.fs.Path(gapped, "ingest_batch=0"), true)
    fs.delete(new org.apache.hadoop.fs.Path(gapped, "ingest_batch=1"), true)
    Jobs.sketchStoreBatch(gapped)(batchRows(3).toDF(), 3L) // no compactEvery anywhere
    assert(partitionIds(gapped) == Set(1L, 2L, 3L),
      s"crashed compaction not resolved: ${partitionIds(gapped)}")
    assert(rows(gapped).intersect(gappedBefore) == gappedBefore,
      "folded history lost on a cadence-less resume")
  }

  test("kafka source option map mirrors the reference consumer params") {
    val opts = Sources.kafkaSourceOptions("broker:9092", Seq("t1", "t2"), "earliest", "graft")
    assert(opts("kafka.bootstrap.servers") == "broker:9092")
    assert(opts("subscribe") == "t1,t2")
    assert(opts("startingOffsets") == "earliest")
    assert(opts.contains("maxOffsetsPerTrigger")) // bounded micro-batch at scale
  }

  test("chunking is streaming-stateless: memory-stream output equals batch output") {
    import spark.implicits._
    val ms = MemoryStream[Doc](spark)(org.apache.spark.sql.Encoders.product[Doc])
    val q = graft.ops.TextAnalysis.chunkDocuments(ms.toDF(), chunkChars = 5, overlap = 2)
      .writeStream.format("memory").queryName("chunk_parity").outputMode("append").start()
    ms.addData(Doc(1L, "abcdefghij"), Doc(2L, "xyz"))
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("chunk_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    val batch = graft.ops.TextAnalysis.chunkDocuments(
      Seq((1L, "abcdefghij"), (2L, "xyz")).toDF("doc_id", "text"),
      chunkChars = 5, overlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    assert(streamed == batch && batch.size == 4) // 3 chunks for doc 1, 1 for doc 2
  }

  test("knn serve stream: batch parity, per-batch partitions, replay-safe, unscoreable/wrong-dim refused") {
    import spark.implicits._
    val idx = tmpDir("knnserve-idx"); val out = tmpDir("knnserve-out")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    graft.ops.Similarity.buildIvfIndex(emb, idx, nlist = 8)
    // fixture vectors as queries (float→double widening is exact, so
    // the stream and the batch join score identical doubles)
    val qvecs = emb.filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map(r => QVec(r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val ms = MemoryStream[QVec](spark)(org.apache.spark.sql.Encoders.product[QVec])
    val q = Jobs.startKnnServe(ms.toDF(), idx, out, tmpDir("knnserve-ckpt"),
      k = 5, nprobe = 2, queryTrigger = Trigger.ProcessingTime(0))
    ms.addData(qvecs(0), qvecs(1))
    q.processAllAvailable()
    ms.addData(qvecs(2))
    q.processAllAvailable()
    q.stop()
    def served() = spark.read.parquet(out)
      .select("query_id", "vec_id", "cos_sim", "ingest_batch")
      .as[(Long, Long, Double, Long)].collect().toSet
    val got = served()
    // k rows per query, batch attribution intact
    assert(got.count(_._4 == 0L) == 10 && got.count(_._4 == 1L) == 5, s"got $got")
    // parity: each batch's answers equal the batched k-NN join on the
    // same query frame (the serve path adds nothing but the landing)
    val b0 = Seq(qvecs(0), qvecs(1)).toDF()
    val expect0 = graft.ops.Similarity
      .knnJoinIvf(spark, idx, b0, k = 5, nprobe = 2, excludeSelf = false)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(got.filter(_._4 == 0L).map(t => (t._1, t._2, t._3)) == expect0)
    // replay idempotence: re-running batch 0's body overwrites its own
    // partition, never duplicates it
    Jobs.knnServeBatch(idx, out, 5, 2, 64)(b0, 0L)
    assert(served() == got, "replay changed the served answers")
    // empty batch is a no-op (F7 guard)
    Jobs.knnServeBatch(idx, out, 5, 2, 64)(b0.filter(lit(false)), 9L)
    assert(served() == got, "empty batch wrote rows")
    // a zero-norm query's top-k would be arbitrary rows — refused
    val exZero = intercept[IllegalArgumentException](
      Jobs.knnServeBatch(idx, out, 5, 2, 64)(
        Seq(QVec(90L, Seq.fill(64)(0.0))).toDF(), 2L))
    assert(exZero.getMessage.contains("zero-norm"), exZero.getMessage)
    // a wrong-dim query silently deflates every score — refused
    val exDim = intercept[IllegalArgumentException](
      Jobs.knnServeBatch(idx, out, 5, 2, 64)(
        Seq(QVec(91L, Seq(1.0, 0.0, 0.0, 0.0))).toDF(), 2L))
    assert(exDim.getMessage.contains("dim"), exDim.getMessage)
    // a NULL ELEMENT inside a full-size embedding dodges the NULL-array,
    // zero-norm and dim checks (size() counts null slots; graft_dot
    // skips them), so raw mode would serve silently deflated scores —
    // refused like every other unscoreable query
    val nullElem: Seq[java.lang.Double] =
      Seq.tabulate(64)(i => if (i == 7) null else java.lang.Double.valueOf(1.0))
    val exNull = intercept[IllegalArgumentException](
      Jobs.knnServeBatch(idx, out, 5, 2, 64)(
        Seq((92L, nullElem)).toDF("query_id", "embedding"), 2L))
    assert(exNull.getMessage.contains("NULL elements"), exNull.getMessage)
    // usePq against a RAW IVF index must fail at START (the missing
    // packed store would otherwise surface in batch 0)
    val exPq = intercept[IllegalArgumentException](
      Jobs.startKnnServe(ms.toDF(), idx, out, tmpDir("knnserve-ckpt3"),
        usePq = true))
    assert(exPq.getMessage.contains("assigned_pq_packed"), exPq.getMessage)
    // a serving batch REFUSES while the index is mid-rebuild (the
    // rebuildIndex marker), and resumes with identical answers once the
    // marker lifts — no batch can mix cell systems
    val markerP = new org.apache.hadoop.fs.Path(
      s"$idx/${graft.ops.Similarity.rebuildingMarkerName}")
    val mfs = markerP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    mfs.create(markerP, true).close()
    val exSwap = intercept[IllegalArgumentException](
      Jobs.knnServeBatch(idx, out, 5, 2, 64)(b0, 0L))
    assert(exSwap.getMessage.contains("mid-rebuild"), exSwap.getMessage)
    mfs.delete(markerP, false)
    Jobs.knnServeBatch(idx, out, 5, 2, 64)(b0, 0L)
    assert(served() == got, "post-swap replay changed the served answers")
    // starting against a missing index fails at START, not in batch 0
    val exIdx = intercept[Exception](
      Jobs.startKnnServe(ms.toDF(), tmpDir("knnserve-noidx"), out,
        tmpDir("knnserve-ckpt2")))
    assert(exIdx.getMessage != null)
    // PQ mode: serves from the packed codes store through the batched
    // ADC kernel, parity with the batch knnJoinIvfPq on the same frame
    val pqIdx = tmpDir("knnserve-pqidx"); val pqOut = tmpDir("knnserve-pqout")
    graft.ops.Similarity.buildIvfPqIndex(emb, pqIdx, nlist = 8)
    Jobs.knnServeBatch(pqIdx, pqOut, 5, 2, 64, usePq = true)(b0, 0L)
    val servedPq = spark.read.parquet(pqOut)
      .select("query_id", "vec_id", "cos_pq")
      .as[(Long, Long, Double)].collect().toSet
    val expectPq = graft.ops.Similarity
      .knnJoinIvfPq(spark, pqIdx, b0, k = 5, nprobe = 2,
        excludeSelf = false, packed = true)
      .select("query_id", "vec_id", "cos_pq")
      .as[(Long, Long, Double)].collect().toSet
    assert(servedPq == expectPq, "PQ serve diverged from the batched ADC join")
  }
}
