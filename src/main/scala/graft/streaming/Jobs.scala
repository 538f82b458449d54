package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener, Trigger}
import graft.ops.{Kpi, Sinks}

/** Streaming jobs — the Structured-Streaming lift of the reference's
  * flagship micro-batch pipeline (reference: IndicateursStreaming.scala:42-108:
  * Kafka DStream → foreachRDD → parse → SQL quarter-hour KPIs → CSV append →
  * commitAsync), covering SURVEY.md §2.6 rows F1-F9.
  *
  * Two lifts are provided, because the reference's semantics and the
  * *intended* semantics differ (SURVEY.md §7.4):
  *
  *  - [[startKpiStateful]] — the semantic upgrade: event-time tumbling
  *    window + watermark, exactly-once KPI rows emitted when each window
  *    finalizes. State is bounded by the watermark; offsets/commits live in
  *    the checkpoint WAL (subsumes F2/F3's HasOffsetRanges/commitAsync).
  *  - [[startKpiPerBatch]] — the faithful shape: each micro-batch computes
  *    its own quarter-hour aggregates over just that batch's rows and
  *    appends them to CSV, exactly like the reference's foreachRDD body
  *    (same duplicate-window-across-batches behavior).
  *
  * Both run any source from [[Sources]] — kafka, csv/parquet spool-dir,
  * rate — because every source lands in the same explicit event schema.
  */
object Jobs {

  /** The stateful KPI stream: watermark + the SAME aggregation stage the
    * batch flagship uses ([[Kpi.aggregate]]), so batch and streaming
    * results are provably the same code path. groupBy(window(...)) keeps
    * per-window state; the watermark bounds it (F4-analog state cleanup)
    * and late rows beyond `watermarkDelay` are dropped deterministically.
    */
  def kpiStream(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    Kpi.formatted(Kpi.aggregate(events.withWatermark("ts", watermarkDelay)))

  /** F1 — micro-batch trigger (reference batch durations: 15 s / 600 s / 2 s,
    * SparkBigData.scala:50). `AvailableNow` drains a backlog then stops —
    * the replay/testing trigger.
    */
  def trigger(seconds: Long): Trigger =
    if (seconds <= 0) Trigger.AvailableNow() else Trigger.ProcessingTime(seconds * 1000L)

  /** Stateful lift → CSV append via foreachBatch (K6). Append output mode:
    * each finalized window arrives exactly once, so the CSV accumulates
    * one row per quarter-hour — the reference's intended product
    * (IndicateursStreaming.scala:84-88) without its per-batch duplication.
    *
    * foreachBatch (not the streaming csv file sink) because the reference
    * wants ONE file per batch (`repartition(1)`, :84) and an empty-batch
    * marker (:66-75) — per-batch control the file sink doesn't offer.
    * Checkpointing makes the whole pipeline effectively-once: the batch id
    * + offsets are committed after the sink write, which is the
    * commit-after-process choreography (F3) the reference hand-rolled.
    */
  def startKpiStateful(
      events: DataFrame,
      outDir: String,
      checkpointDir: String,
      trig: Trigger = Trigger.ProcessingTime("15 seconds"),
      watermarkDelay: String = "30 minutes"): StreamingQuery =
    kpiStream(events, watermarkDelay).writeStream
      .outputMode("append")
      .queryName("kpi_stateful")
      .option("checkpointLocation", checkpointDir)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchCsv(batch, batchId, outDir)
      }
      .start()

  /** Faithful per-batch lift: aggregate ONLY the rows of this micro-batch
    * (reference foreachRDD semantics, IndicateursStreaming.scala:48-101).
    * The raw stream is passed through un-aggregated and the whole KPI
    * query — filter, window bucket, counts, pct — runs as a *batch* plan
    * inside foreachBatch, exactly as the reference ran Spark SQL per RDD.
    */
  def startKpiPerBatch(
      events: DataFrame,
      outDir: String,
      checkpointDir: String,
      trig: Trigger = Trigger.ProcessingTime("15 seconds")): StreamingQuery =
    events.writeStream
      .outputMode("append")
      .queryName("kpi_per_batch")
      .option("checkpointLocation", checkpointDir)
      .trigger(trig)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatchCsv(Kpi.quarterHour(batch), batchId, outDir)
      }
      .start()

  /** Shared foreachBatch body: empty-batch guard (F7 — reference
    * `!rdd.isEmpty()` ConsommationStreaming.scala:67 and the empty-marker
    * CSV IndicateursStreaming.scala:64-75) + per-batch error isolation
    * (F9 — reference wraps the whole batch in try/catch and keeps the
    * stream alive, IndicateursStreaming.scala:50-101).
    *
    * The marker write is OVERWRITE of a fixed path (idempotent under
    * batch replay); the data write is APPEND, whose replay safety comes
    * from the checkpoint's batch-id commit protocol.
    */
  private[streaming] def appendBatchCsv(batch: DataFrame, batchId: Long, outDir: String): Unit =
    try {
      if (batch.isEmpty) {
        val marker = Sources.localRows(batch.sparkSession,
          Seq(s"no events in batch $batchId"), "libelle")
        Sinks.csvOverwriteSingle(marker, s"$outDir/_empty_marker")
      } else {
        Sinks.csvAppendSingle(batch, s"$outDir/data")
      }
    } catch {
      // NonFatal, not Throwable: a long-running stream must NOT swallow
      // OutOfMemoryError or InterruptedException — those have to
      // propagate and kill/cancel the query.
      case scala.util.control.NonFatal(e) =>
        // F9: log and keep the stream alive — one poisoned batch must not
        // kill a long-running pipeline. The checkpoint has NOT committed
        // this batch, so a restart replays it.
        System.err.println(s"[graft.streaming] batch $batchId failed: ${e.getMessage}")
    }

  /** Kafka-shaped output stream (K1/K2/K8): shape rows into (key, value
    * JSON) records. On a cluster with the kafka connector this feeds
    * `.writeStream.format("kafka").options(Sinks.kafkaExactlyOnceOptions(...))`;
    * the shaping is the verifiable part here (see Sinks.k8JsonParse).
    */
  def kafkaShapedKpi(events: DataFrame, watermarkDelay: String = "30 minutes"): DataFrame =
    Sinks.kafkaShaped(
      kpiStream(events, watermarkDelay),
      col("window_start"),
      col("window_start"), col("n_events"), col("n_high"), col("pct_high"))

  /** Streaming exact dedup: drop events whose `event_id` was already
    * seen, keeping state only within the watermark horizon
    * (dropDuplicatesWithinWatermark — state for an id is freed once the
    * watermark passes its event time + delay, so state is bounded by the
    * id arrival rate × delay, never unbounded history). The streaming
    * arm of ops.Dedup.exact: at-least-once sources (kafka replays,
    * overlapping file drops) become effectively-once downstream.
    */
  def dedupStream(
      events: DataFrame,
      idCols: Seq[String] = Seq("event_id"),
      watermarkDelay: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** Store-existence probe that works on WHATEVER filesystem Spark writes
    * to: `storeDir` is an HDFS/S3 URI in the documented production framing
    * of these jobs, where `java.io.File(dir).list()` returns null on every
    * batch and history would silently be treated as empty. Non-empty (not
    * just exists) because an empty pre-created dir has no schema to infer.
    */
  private def storeNonEmpty(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).nonEmpty
  }

  /** Like [[storeNonEmpty]] for `partitionBy("ingest_batch")` stores,
    * where an EMPTY write still creates the directory with a lone
    * `_SUCCESS` marker (no partition subdir) — any-file probing would
    * then hand a schema-less directory to `spark.read.parquet`. Data in
    * a partitioned store always lives under `ingest_batch=N/`
    * subdirectories, so "has a subdirectory" is the readability test.
    */
  private def partitionedStoreNonEmpty(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // hidden dirs don't count: a crash mid-write can leave _temporary/
    // behind, which is a directory but holds nothing a parquet read will
    // see (readers skip _/.-prefixed paths) — counting it would send a
    // replayed batch into UNABLE_TO_INFER_SCHEMA forever
    fs.exists(path) && fs.listStatus(path).exists { s =>
      val n = s.getPath.getName
      s.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** CHECKPOINT-RESET GUARD, shared by every batch body that writes
    * `ingest_batch = batchId`-owned partitions: ingest ids come from
    * the checkpoint-local batchId, so a stream restarted with a FRESH
    * checkpoint against a store that already advanced past `target`
    * would reuse low ids and the own-partition dynamic overwrite would
    * silently REPLACE earlier partitions — data loss, not an error.
    * Legitimate progress only ever replays the LAST batch (target ==
    * max existing, foreachBatch's at-least-once case) or advances past
    * it; anything below max is the reset case and must stop loudly.
    * (A reset whose first write collides exactly with the last existing
    * batch is indistinguishable from that batch's replay given only
    * batchId — the guard hardens every deeper reset.) Cost per batch:
    * ONE directory listing — max(ingest_batch) is derived from the
    * `ingest_batch=` partition-directory names, never a DataFrame read
    * (which re-pays schema inference + partition discovery over the
    * whole store on every micro-batch of a long-running stream — the
    * very file-listing cost compaction exists to bound).
    *
    * The guard also resolves any compaction a previous process crashed
    * in the middle of, UNCONDITIONALLY — not gated on the compaction
    * cadence being re-enabled. A stream resumed WITHOUT compactEvery
    * after a mid-compaction crash would otherwise read the gapped store
    * (the folded history lives only in the invisible `.compact_tmp`)
    * and silently re-admit duplicates; since every ingest_batch-writing
    * body calls this guard first, recovery rides the guard's listing.
    * Cost when nothing is pending: two directory listings per root
    * (cell detection + partition ids) and one .compact_tmp probe —
    * constant per batch, vs the former full-store schema inference +
    * partition discovery.
    */
  /** First-level CELL partition dirs of a nested store — `list_id=L`
    * (the IVF-PQ ANN stores), `domain=D` (the SemDeDup admitted
    * stores, domain-partitioned since r19 so the per-batch history
    * read prunes cells at the FILE level via DPP), or `fam_bucket=B`
    * (the family store, id-hash-bucketed since r21 for the same
    * per-batch pruning). Empty for flat `ingest_batch=N` stores; every
    * ingest-store helper keys its nested-vs-flat behavior on this one
    * probe.
    */
  private def cellDirs(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
    fs.listStatus(root).collect {
      case s if s.isDirectory && (s.getPath.getName.startsWith("list_id=") ||
          s.getPath.getName.startsWith("domain=") ||
          s.getPath.getName.startsWith("fam_bucket=")) => s.getPath
    }.toSeq

  private[streaming] def requireMonotoneIngest(
      spark: SparkSession, dir: String, target: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      // nested stores key cells as list_id=L/ or domain=D/ above
      // ingest_batch=N; flat stores key ingest_batch=N directly — the
      // guard serves all three
      val cells = cellDirs(fs, root)
      val roots = if (cells.nonEmpty) cells else Seq(root)
      roots.foreach(r => resolvePending(fs, r))
      roots.flatMap(r => partitionIds(fs, r).keys).maxOption.foreach { maxExisting =>
        require(target >= maxExisting,
          s"batch would write ingest_batch=$target but the store at $dir already " +
            s"holds batches up to $maxExisting — this is the fresh-checkpoint-" +
            "against-an-advanced-store hazard (the own-partition overwrite would " +
            "silently replace earlier data); resume with the original checkpoint, " +
            "or point the job at a new store")
      }
    }
  }

  /** Resolve crashed compactions on flat stores a batch body READS but
    * does not guard with [[requireMonotoneIngest]] (which resolves its
    * own dir) — unconditional, not gated on the compaction cadence
    * being re-enabled on this run. One fs.exists per dir when nothing
    * is pending.
    */
  private def resolvePendingAt(spark: SparkSession, dirs: String*): Unit =
    dirs.foreach { d =>
      val root = new org.apache.hadoop.fs.Path(d)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root)) {
        // nested stores compact (and therefore crash) per cell
        val cells = cellDirs(fs, root)
        (if (cells.nonEmpty) cells else Seq(root))
          .foreach(r => resolvePending(fs, r))
      }
    }

  /** Outcome of [[compactIngestStore]] — one action per call. */
  sealed trait CompactionOutcome
  object CompactionOutcome {
    /** Fewer than three partitions: one history + one live is already
      * the compact shape; nothing to merge.
      */
    case object NothingToDo extends CompactionOutcome
    final case class Compacted(compactedKey: Long, partitionsMerged: Int,
        dataFilesBefore: Long, dataFilesAfter: Long) extends CompactionOutcome
    /** A previous compaction had committed (tmp fully written + target
      * recorded) but crashed before the final rename; this call finished
      * it and did nothing else — call again for a fresh pass.
      */
    final case class RolledForward(compactedKey: Long) extends CompactionOutcome
  }

  /** Maintenance compaction for a FLAT `ingest_batch=N`-partitioned
    * store: a long-running stream leaves one partition — and one file
    * per write task — per micro-batch, so a year of 15 s batches is
    * ~2 M partition dirs: the classic streaming small-files problem
    * (file-listing dominates every scan, NameNode/object-store metadata
    * pressure). This rewrites every partition EXCEPT the newest into
    * ONE partition keyed at the largest historical id, preserving the
    * three contracts the stores rely on:
    *
    *  - read semantics: batch b reads `ingest_batch < b`; all compacted
    *    rows keep a key < max, so any future batch (b > max) and a
    *    replay of batch `max` itself (b == max) see exactly the rows
    *    they saw before;
    *  - replay: partition `max` is untouched, because foreachBatch may
    *    still replay it (at-least-once) and its own-partition overwrite
    *    must replace exactly its own rows;
    *  - the [[requireMonotoneIngest]] guard: max(ingest_batch) is
    *    unchanged.
    *
    * What it deliberately gives up: per-batch attribution below the
    * live batch (compacted rows all carry the compacted key). Jobs that
    * need lineage must carry their own column. Rows are preserved
    * byte-for-byte, but file merge changes row ORDER, so
    * order-sensitive APPROXIMATE aggregations over the store (HLL union
    * estimates) may move within their error bounds (≤1% observed at
    * 128/512 batches — tools/StressCompact); exact queries are
    * unchanged.
    *
    * Crash safety is roll-forward: (1) write the merged history to a
    * dot-prefixed tmp dir (invisible to parquet readers), (2) record
    * the target key as an underscore marker file inside it, (3) delete
    * the old partitions, (4) rename tmp to `ingest_batch=<target>` —
    * the rename is the commit point. A crash before (2) leaves the
    * originals intact (next call discards tmp and redoes); a crash
    * after (2) is finished by the next call ([[CompactionOutcome.RolledForward]]).
    * Safe concurrently with the guarded WRITER (it only ever touches
    * partition ids >= max); concurrent READERS can observe a transient
    * gap between (3) and (4), so schedule it in the stream's
    * maintenance window if other jobs read the store live.
    *
    * The nested IVF-PQ ANN stores (`list_id=L/ingest_batch=N`) need the
    * per-cell variant [[compactPqIngestStore]] — their live boundary is
    * the GLOBAL max id, not each cell's own.
    *
    * @param targetFiles optional coalesce width for the merged history;
    *   default leaves it to the scan's file packing (already small).
    */
  def compactIngestStore(
      spark: SparkSession,
      dir: String,
      targetFiles: Option[Int] = None): CompactionOutcome = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no store at $dir")
    val cells = cellDirs(fs, root)
    if (cells.isEmpty)
      compactOneRoot(spark, fs, root, boundaryOverride = None, targetFiles)
    else {
      // a CELL-partitioned store (domain=D/ingest_batch=N — the
      // SemDeDup admitted store) compacts per cell against the GLOBAL
      // max ingest id, exactly the [[compactPqIngestStore]] protocol:
      // a replay of the live batch may dynamic-overwrite its
      // (cell, max) partition in ANY cell, so no cell may fold id
      // `max` into its history even when that cell's local max is
      // lower. Report the roll-up of the per-cell outcomes.
      val globalMax = cells.flatMap(c => partitionIds(fs, c).keys).maxOption
      val outcomes = cells.sortBy(_.getName).map(c =>
        compactOneRoot(spark, fs, c, boundaryOverride = globalMax, targetFiles))
      val merged = outcomes.collect { case c: CompactionOutcome.Compacted => c }
      if (merged.nonEmpty)
        // real merge work happened this call — report it even if some
        // OTHER cell only rolled a crashed attempt forward
        // (RolledForward's "did nothing else" contract is per ROOT;
        // prioritizing it here would hide this call's merges)
        CompactionOutcome.Compacted(
          merged.map(_.compactedKey).max,
          merged.map(_.partitionsMerged).sum,
          merged.map(_.dataFilesBefore).sum,
          merged.map(_.dataFilesAfter).sum)
      else outcomes.collectFirst { case r: CompactionOutcome.RolledForward => r }
        .getOrElse(CompactionOutcome.NothingToDo)
    }
  }

  /** [[compactIngestStore]] for the NESTED IVF-PQ ANN stores
    * (`list_id=L/ingest_batch=N`, written by
    * [[graft.ops.Similarity.assignToPqIndex]]): each coarse cell's
    * directory is compacted independently with the flat protocol, but
    * against the GLOBAL max ingest id — a replay of the live batch may
    * dynamic-overwrite its `(list_id, max)` partition in ANY cell, so
    * no cell may fold id `max` into its history even when that cell's
    * local max is lower (it simply didn't receive vectors in the live
    * batch). The codes and packed stores are compacted, plus the raw
    * re-rank sidecar when the index carries one; probe reads never
    * filter on ingest_batch, so query results are untouched by
    * construction. Returns per-store outcomes, one per cell directory
    * visited (cells already compact report `NothingToDo`).
    */
  def compactPqIngestStore(
      spark: SparkSession,
      indexDir: String,
      targetFiles: Option[Int] = None): Map[String, Seq[CompactionOutcome]] =
    pqStores(spark, indexDir).map { store =>
      val root = new org.apache.hadoop.fs.Path(s"$indexDir/$store")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(root), s"no PQ store at $indexDir/$store")
      val cells = fs.listStatus(root)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("list_id="))
        .map(_.getPath).sortBy(_.getName)
      val globalMax = cells.flatMap(c => partitionIds(fs, c).keys).maxOption
      store -> cells.map(c =>
        compactOneRoot(spark, fs, c, boundaryOverride = globalMax, targetFiles)).toSeq
    }.toMap

  private def partitionIds(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Map[Long, org.apache.hadoop.fs.Path] =
    fs.listStatus(root).collect {
      case s if s.isDirectory && s.getPath.getName.startsWith("ingest_batch=") =>
        s.getPath.getName.stripPrefix("ingest_batch=").toLong -> s.getPath
    }.toMap

  /** Resolve a crashed compaction on `root`, without starting a new one:
    * a committed tmp (fully written + target marker) is rolled forward —
    * the crash happened between the marker and the final rename, so part
    * of the history may already be DELETED from the partition dirs and
    * lives only in tmp; until the rename lands, readers see a gap. An
    * uncommitted tmp is discarded (originals intact: deletes only ever
    * happen after the marker). Returns the roll-forward outcome, or None
    * when there was nothing pending (one `exists` call in that case).
    * Store-reading batch bodies call this FIRST when auto-compaction is
    * on ([[withAutoCompaction]]), so a post-crash batch can never read
    * the gapped view.
    */
  private def resolvePending(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Option[CompactionOutcome] = {
    import org.apache.hadoop.fs.Path
    val tmp = new Path(root, ".compact_tmp")
    if (!fs.exists(tmp)) return None
    // The _TARGET_ marker is the SOLE commit signal: compactOneRoot
    // creates it strictly after the tmp parquet write returns, so its
    // presence proves the merged history is fully written. Hadoop's
    // _SUCCESS is deliberately NOT consulted — it is optional
    // (mapreduce.fileoutputcommitter.marksuccessfuljobs=false is common
    // on object stores), and classifying a committed tmp as garbage
    // because _SUCCESS is absent would DELETE the only surviving copy
    // of the folded history after a mid-delete crash.
    val marker = fs.listStatus(tmp).map(_.getPath.getName)
      .find(_.startsWith("_TARGET_"))
    marker match {
      case Some(m) =>
        // roll forward: deletes are idempotent, rename is the commit
        val t = m.stripPrefix("_TARGET_").toLong
        partitionIds(fs, root).filter(_._1 <= t).values
          .foreach(p => require(fs.delete(p, true), s"could not delete $p"))
        require(fs.rename(tmp, new Path(root, s"ingest_batch=$t")),
          s"could not commit compaction rename to ingest_batch=$t under $root")
        Some(CompactionOutcome.RolledForward(t))
      case None =>
        // no marker: originals are intact (deletes only happen after
        // the marker lands), so discard and let a fresh pass proceed
        require(fs.delete(tmp, true), s"could not clear stale $tmp")
        None
    }
  }

  /** Wrap a store-writing batch body with self-maintenance: before the
    * body runs, any compaction a previous process crashed in the middle
    * of is resolved on every listed dir (the body would otherwise read a
    * store whose history is partly in an unrenamed tmp — invisible);
    * after the body, every `every`-th batch compacts the listed dirs so
    * partition count stays bounded without a separate maintenance job.
    * Costs one FS `exists` per dir per batch when nothing is pending;
    * the periodic compaction itself is one scan + write of the history.
    * Compose it around any flat-store body:
    * {{{
    * .foreachBatch(Jobs.withAutoCompaction(Seq(store, out), every = 64)(
    *   Jobs.incrementalDedupBatch(store, out)))
    * }}}
    */
  def withAutoCompaction(dirs: Seq[String], every: Int)(
      body: (DataFrame, Long) => Unit)(batch: DataFrame, batchId: Long): Unit = {
    require(every > 0, s"compaction cadence must be positive (got $every)")
    val spark = batch.sparkSession
    resolvePendingAt(spark, dirs: _*)
    body(batch, batchId)
    if ((batchId + 1) % every == 0)
      dirs.foreach { d =>
        // a store the body never got to create (e.g. all batches empty
        // so far) has nothing to compact
        val root = new org.apache.hadoop.fs.Path(d)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(root)) compactIngestStore(spark, d)
      }
  }

  /** One compaction action on one directory whose children are
    * `ingest_batch=N` partition dirs. `boundaryOverride` is the live
    * ingest id to protect (partitions >= it are never touched); when
    * absent, the directory's own max id is the live one (the flat-store
    * case). See [[compactIngestStore]] for the protocol.
    */
  private def compactOneRoot(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      boundaryOverride: Option[Long],
      targetFiles: Option[Int]): CompactionOutcome = {
    import org.apache.hadoop.fs.Path
    def dataFileCount(): Long = {
      val it = fs.listFiles(root, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
    resolvePending(fs, root) match {
      case Some(rolled) => return rolled
      case None => ()
    }
    val parts = partitionIds(fs, root)
    if (parts.isEmpty) return CompactionOutcome.NothingToDo
    val boundary = boundaryOverride.getOrElse(parts.keys.max)
    val mergeable = parts.keySet.filter(_ < boundary)
    if (mergeable.size < 2) return CompactionOutcome.NothingToDo
    val target = mergeable.max
    val tmp = new Path(root, ".compact_tmp")
    val filesBefore = dataFileCount()
    val history = spark.read.parquet(root.toString)
      .filter(col("ingest_batch") < boundary).drop("ingest_batch")
    targetFiles.fold(history)(n => history.coalesce(n))
      .write.parquet(tmp.toString)
    fs.create(new Path(tmp, s"_TARGET_$target")).close()
    mergeable.foreach(id =>
      require(fs.delete(parts(id), true), s"could not delete ${parts(id)}"))
    require(fs.rename(tmp, new Path(root, s"ingest_batch=$target")),
      s"could not commit compaction rename to ingest_batch=$target under $root")
    CompactionOutcome.Compacted(target, mergeable.size, filesBefore, dataFileCount())
  }

  /** Unbounded-history streaming exact dedup: each micro-batch of
    * documents is checked against a PERSISTED content-hash store
    * ([[graft.ops.Dedup.incrementalExact]]), survivors land in `outDir`
    * and their hashes extend the store. Contrast [[dedupStream]]: state
    * there lives on executors and is bounded by the watermark; here it
    * lives in a parquet table of 64-hex hashes — unbounded history at
    * ~70 bytes/doc, readable by any other job, shared across restarts.
    *
    * Replay idempotence (foreachBatch is at-least-once: checkpoint
    * recovery re-runs the last uncommitted batch): both the store and
    * the output are partitioned by `ingest_batch`, batch N reads only
    * store partitions `ingest_batch < N`, and writes dynamic-overwrite
    * its OWN partition. A replayed batch therefore sees exactly the
    * pre-crash store (its own half-written partition is excluded by the
    * read filter and then atomically replaced), emitting identical
    * output — effectively-once without a transactional sink. The dual
    * hazard of that overwrite — a FRESH checkpoint reusing low batch
    * ids against an advanced store — is closed by
    * [[requireMonotoneIngest]], which every ingest_batch-writing body
    * in this file calls first.
    */
  def incrementalDedupBatch(storeDir: String, outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    val spark = batch.sparkSession
    requireMonotoneIngest(spark, outDir, batchId)
    resolvePendingAt(spark, storeDir) // the read-store, guarded by neither
    val seen =
      if (storeNonEmpty(spark, storeDir))
        spark.read.parquet(storeDir)
          .filter(col("ingest_batch") < batchId).select("content_hash")
      else spark.range(0).selectExpr("cast(null AS string) AS content_hash")
    // Output first: the store append then derives from the WRITTEN output
    // (one compute, and the store job never reads and overwrites storeDir
    // in the same plan — Spark rejects that).
    graft.ops.Dedup.incrementalExact(batch, seen)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
    spark.read.parquet(outDir)
      .filter(col("ingest_batch") === batchId)
      .select("content_hash", "ingest_batch")
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storeDir)
  }

  /** Bootstrap the incremental-dedup hash store from an EXISTING batch
    * corpus, so a new stream starts with history instead of re-admitting
    * everything the corpus already contains. The seed is keyed
    * `ingest_batch = -1`: batch 0 reads `ingest_batch < 0` and therefore
    * SEES it (a seed keyed 0 would be invisible to the very first batch
    * — the whole point of seeding), the [[requireMonotoneIngest]] guard
    * still holds (0 >= -1), and no batch ever writes -1, so the seed is
    * never overwritten by the stream. Re-seeding is allowed only while
    * the store holds nothing but a seed: once a batch has run, changing
    * the seed would retroactively change what a REPLAYED batch sees and
    * break the byte-identical-replay contract — refused loudly instead.
    */
  def seedDedupStore(corpus: DataFrame, storeDir: String): Unit = {
    val spark = corpus.sparkSession
    requireSeedable(spark, storeDir)
    clearSeedPartition(spark, storeDir)
    graft.ops.Dedup.contentHashes(corpus)
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storeDir)
  }

  /** [[seedDedupStore]] for the near-dup gate's shingle store: the
    * corpus's (doc_id, shh) shingle hashes land under `ingest_batch=-1`
    * so the gate's very first batch is LSH-matched against them.
    */
  def seedNearDupStore(corpus: DataFrame, storeDir: String): Unit = {
    val spark = corpus.sparkSession
    requireSeedable(spark, storeDir)
    clearSeedPartition(spark, storeDir)
    graft.ops.Dedup.shingleHashes(corpus)
      .withColumn("ingest_batch", lit(-1L))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storeDir)
  }

  private def requireSeedable(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      val cells = cellDirs(fs, root)
      val roots = if (cells.nonEmpty) cells else Seq(root)
      roots.flatMap(r => partitionIds(fs, r).keys).maxOption.foreach(maxExisting =>
        require(maxExisting <= -1L,
          s"cannot seed $dir: a stream already wrote batches up to $maxExisting — " +
            "re-seeding now would retroactively change the history a replayed " +
            "batch sees; seed only before the first batch, or start a new store"))
    }
  }

  /** Pre-write clear of the seed's own partition (the seedAuditStores
    * discipline): a RE-seed whose derived frame is EMPTY writes no
    * partitions at all under dynamic overwrite, which would silently
    * leave the PREVIOUS seed's rows behind — history the caller just
    * asked to replace.
    */
  private def clearSeedPartition(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // flat stores hold the seed at root/ingest_batch=-1; cell-partitioned
    // stores hold one seed partition PER cell (domain=D/ingest_batch=-1)
    val roots =
      if (fs.exists(root)) cellDirs(fs, root) :+ root else Seq(root)
    roots.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(r, "ingest_batch=-1")
      if (fs.exists(p)) require(fs.delete(p, true), s"could not clear seed $p")
    }
  }

  /** [[seedDedupStore]] for the streaming rejection audit: bootstraps
    * ALL FOUR stores by running the full [[auditLedgerBatch]] body once
    * at the seed id -1 — the corpus is curated exactly like a stream
    * batch (same normalization, same stage semantics, nothing can
    * drift), its drops land in the ledger, its survivors in admitted/,
    * and the hash/word stores carry the survivors, so the stream's
    * FIRST batch already dedups and near-dedups against corpus history.
    * [[auditFunnelFromStores]] then reports corpus + stream together
    * (n_total conservation includes the seed). Re-seeding is refused
    * once any batch has run; before a pre-stream re-seed the four seed
    * partitions are cleared first, so a re-seed whose output is empty
    * for some store (e.g. no drops → no ledger rows) cannot leave the
    * previous seed's rows behind.
    */
  def seedAuditStores(
      corpus: DataFrame,
      storeRoot: String,
      gate: AuditGate = AuditGate.Off,
      minTokens: Long = 10L,
      minQuality: Double = 0.55,
      jaccardThreshold: Double = graft.ops.Curation.defaultJaccardThreshold,
      minShared: Long = 5L,
      shingleSize: Int = 3,
      maxBlock: Int = 64,
      lmGate: Option[AuditLmGate] = None,
      semanticGate: Option[AuditSemanticGate] = None,
      classifierGate: Option[AuditClassifierGate] = None,
      semDeDupGate: Option[AuditSemDeDupGate] = None): Unit = {
    val spark = corpus.sparkSession
    val stores = Seq("ledger", "admitted", "hashes", "words", "vecs")
    stores.foreach(s => requireSeedable(spark, s"$storeRoot/$s"))
    stores.foreach(s => clearSeedPartition(spark, s"$storeRoot/$s"))
    auditLedgerBatch(storeRoot, gate, minTokens, minQuality, jaccardThreshold,
      minShared, shingleSize, maxBlock, lmGate, semanticGate, classifierGate,
      semDeDupGate)(
      corpus, -1L)
  }

  /** The [[incrementalDedupBatch]] body behind a streaming query.
    * `docs` must carry `doc_id` and `text` (any source from [[Sources]]
    * mapped to the document schema).
    */
  def startIncrementalDedup(
      docs: DataFrame,
      storeDir: String,
      outDir: String,
      checkpointDir: String,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery =
    docs.writeStream
      .queryName("incremental_dedup")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(storeDir, outDir), compactEvery)(
        incrementalDedupBatch(storeDir, outDir)))
      .start()

  /** [[withAutoCompaction]] when a cadence is given, the bare body
    * otherwise — the starters' opt-in switch.
    */
  private def maybeAutoCompact(dirs: Seq[String], every: Option[Int])(
      body: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    every.fold(body)(n => withAutoCompaction(dirs, n)(body))

  /** Streaming NEAR-dup gate — the [[incrementalDedupBatch]] pattern at
    * near-duplicate granularity: each micro-batch's docs are LSH-matched
    * against a persisted (doc_id, shh) shingle store
    * ([[graft.ops.Dedup.incrementalNearDupsFromShingles]]); docs with any
    * verified match ≥ threshold are dropped, survivors land in `outDir`
    * and their shingles extend the store. Same ingest_batch partitioning
    * + read-below / overwrite-own-partition idempotence as the exact
    * variant. Within-batch near-dups intentionally pass: the gate's
    * contract is "not similar to anything ALREADY ADMITTED"; run the
    * batch sweep ([[graft.ops.Dedup.boundedNearDups]]) upstream if
    * intra-batch similarity matters.
    *
    * Cache discipline: the two shingle frames are cached by the sweep;
    * a long-running stream cannot leave one cache per batch behind, so
    * the body holds its own handles and blocking-unpersists them after
    * the writes.
    */
  def nearDupGateBatch(storeDir: String, outDir: String, threshold: Double = 0.4)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    requireMonotoneIngest(spark, outDir, batchId)
    resolvePendingAt(spark, storeDir) // the read-store, guarded by neither
    val bsh = graft.ops.Dedup.shingleHashes(batch).cache()
    val hist =
      if (storeNonEmpty(spark, storeDir))
        Some(spark.read.parquet(storeDir)
          .filter(col("ingest_batch") < batchId).select("doc_id", "shh").cache())
      else None
    try {
      val matched = hist match {
        // cacheInputs = false: this body owns both caches (acquired
        // above, blocking-unpersisted in the finally) — the sweep
        // re-persisting them would only log cache-manager warnings
        case Some(h) => graft.ops.Dedup
          .incrementalNearDupsFromShingles(bsh, h, threshold = threshold,
            cacheInputs = false)
          .select(col("doc_new").as("doc_id")).distinct()
        case None => spark.range(0).select(col("id").as("doc_id"))
      }
      batch.join(matched, Seq("doc_id"), "left_anti")
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(outDir)
      graft.ops.Dedup.shingleHashes(
          spark.read.parquet(outDir).filter(col("ingest_batch") === batchId))
        .withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(storeDir)
    } finally {
      bsh.unpersist(blocking = true)
      hist.foreach(_.unpersist(blocking = true))
    }
  }

  /** Streaming SemDeDup gate — [[graft.ops.Similarity.semDeDup]]'s
    * ε-closeness lifted onto micro-batches under FIRST-ARRIVAL-WINS
    * semantics: each batch's vectors are committed-table
    * domain-assigned scan-side, compared against the persisted
    * admitted-vector store WITHIN their domain only, dropped if ε-close
    * to anything already admitted, and survivors extend the store.
    * (The batch operator's farthest-from-centroid keep-rule needs the
    * whole corpus at once; a stream cannot retract an admission, so the
    * gate's contract is the near-dup gates': "not similar to anything
    * ALREADY ADMITTED". Within-batch semantic dups intentionally pass —
    * run [[graft.ops.Similarity.semDeDup]] upstream of the stream, or
    * seed with it via [[seedSemDeDupStore]], if intra-batch redundancy
    * matters.)
    *
    * Store layout is FLAT `ingest_batch=N` with `domain` as a DATA
    * column sorted within partitions — deliberately NOT a partition
    * key: at production cluster counts (SemDeDup runs 50k) a
    * domain-partitioned store would mint nlist directories per
    * micro-batch (the small-files explosion compaction exists to
    * fight), while domain-sorted files give the same skipping through
    * parquet row-group min/max stats against the pushed
    * `domain IN (batch's domains)` filter. Same read-below /
    * overwrite-own-partition replay idempotence and
    * [[requireMonotoneIngest]] guard as the other gates.
    */
  /** `withinBatch = true` additionally applies the BATCH operator's
    * keep-rule INSIDE each micro-batch before the history join —
    * ε-twins arriving in one batch admit exactly one (the
    * farthest-from-centroid member, lowest vec_id tie-break, the
    * [[graft.ops.Similarity.semDeDupPairLosses]] spelling) instead of
    * all passing. Off by default: the within-batch pass is quadratic in
    * per-(batch, domain) population, the documented first-arrival-wins
    * contract predates it, and a pre-deduped upstream shouldn't pay the
    * pair join — but at production batch sizes the pass closes a real
    * redundancy leak between store syncs. Pure function of the batch →
    * adds nothing to the replay contract.
    */
  /** `quantizer = Some(q)` assigns against a FITTED table
    * ([[graft.ops.Similarity.readQuantizer]]) instead of the committed
    * 8-cell fixture — the production stream under the sizing rule's
    * grown nlist. The store is stamped with the assignment table's
    * content digest on first write and every later batch must present
    * the SAME table: verdicts produced under one cell system are
    * meaningless probed under another, and the failure would otherwise
    * be silent (cells just stop coinciding). Batch dim must equal the
    * table's dim (graft_nearest_cell folds the shared prefix, so a
    * mismatch would silently mis-assign, not error).
    */
  def semDeDupGateBatch(storeDir: String, outDir: String, eps: Double = 0.3,
      withinBatch: Boolean = false,
      quantizer: Option[graft.ops.Similarity.TwoLevelQuantizer] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    requireMonotoneIngest(spark, outDir, batchId)
    resolvePendingAt(spark, storeDir) // the read-store, guarded by neither
    requireDomainLayout(spark, storeDir)
    requireSameAssignmentTable(spark, storeDir,
      graft.ops.Similarity.assignmentDigest(quantizer))
    quantizer.foreach { q =>
      val tDim = q.topCents.head.length
      val bDim = batch.select(min(size(col("embedding")))).head()
      require(!bDim.isNullAt(0) && bDim.getInt(0) == tDim,
        s"batch embeddings are ${if (bDim.isNullAt(0)) "NULL" else bDim.getInt(0).toString}-dim " +
          s"but the quantizer table holds $tDim-dim centroids — " +
          "graft_nearest_cell would fold the shared prefix and silently " +
          "mis-assign; the stream and its table must share one space")
    }
    // scored carries d2 only when the intra-batch keep-rule needs it;
    // validation below runs on the FULL batch either way (an
    // unscoreable vector must fail loudly even if the intra pass would
    // have dropped it — NaN cosines poison the pass itself)
    val scored = (quantizer match {
      case Some(q) => graft.ops.Similarity.quantizerAssignedD2(batch, q)
      case None if withinBatch => graft.ops.Similarity.domainAssignedD2(batch)
      case None => graft.ops.Similarity.domainWithNorm(batch)
    }).cache()
    val assigned =
      if (withinBatch)
        scored.join(graft.ops.Similarity.semDeDupPairLosses(scored, eps)
            .select("vec_id"), Seq("vec_id"), "left_anti")
          .select("vec_id", "label", "embedding", "domain", "nrm")
      else scored
    try {
      // NULL or zero-norm embeddings cannot be scored: their cosine is
      // NULL, so they would be admitted now and NEVER match anything
      // later — silent permanent store pollution. Mixed dims within
      // the batch deflate cosines silently (graft_dot folds the
      // shorter length). Refuse both loudly (the audit stream's
      // batch-validation discipline); ONE agg over the batch-sized
      // cache, never the store.
      val chk = scored.agg(count(lit(1)).as("n"),
        // count(nrm) skips NULLs, so nn < n detects a NULL embedding
        // anywhere in the batch (min/max alone would skip it silently)
        count(col("nrm")).as("nn"),
        min(col("nrm")).as("mn"),
        min(size(col("embedding"))).as("lo"),
        max(size(col("embedding"))).as("hi")).head()
      require(chk.getLong(1) == chk.getLong(0) &&
          !chk.isNullAt(2) && chk.getDouble(2) > 0,
        "batch carries NULL or zero-norm embeddings — the gate cannot " +
          "score them and an admitted unscoreable vector never matches " +
          "anything later; filter or fix them upstream")
      require(chk.getInt(3) == chk.getInt(4),
        s"batch carries mixed ${chk.getInt(3)}..${chk.getInt(4)}-dim " +
          "embeddings — cross-dim cosines silently deflate; fix upstream")
      val dropped =
        // partition-aware probe: the store root also carries the
        // _graft_quantizer marker FILE, which parquet readers skip but
        // an any-file probe would count
        if (partitionedStoreNonEmpty(spark, storeDir)) {
          // the store is domain-partitioned, so the batch's domain set
          // prunes the history read at the FILE level via the dynamic
          // partition pruning the gate join itself plants (the knnJoinIvf
          // DPP discipline) — no collected domain literal whose In
          // predicate would bloat the plan at production nlist, and no
          // driver round-trip
          val hist = spark.read.parquet(storeDir)
            .filter(col("ingest_batch") < batchId)
            .select("domain", "embedding", "nrm")
          // a store written at a different dim would silently deflate
          // every cross-dim cosine instead of erroring — the
          // loadBenchStore shingle-size lesson. min==max over the FULL
          // pruned history (still one aggregate), not a single-row
          // probe: a hand-seeded or externally mutated store with MIXED
          // dims would pass a head(1) check and the non-sampled rows'
          // cosines would silently deflate.
          val histDim = spark.read.parquet(storeDir)
            .filter(col("ingest_batch") < batchId)
            .agg(min(size(col("embedding"))).as("lo"),
              max(size(col("embedding"))).as("hi")).head()
          if (!histDim.isNullAt(0))
            require(histDim.getInt(0) == chk.getInt(3) &&
                histDim.getInt(1) == chk.getInt(3),
              s"batch embeddings are ${chk.getInt(3)}-dim but the admitted " +
                s"store at $storeDir holds ${histDim.getInt(0)}.." +
                s"${histDim.getInt(1)}-dim vectors — cross-dim cosines " +
                "silently deflate; the stream and its store must share " +
                "one embedding space")
          // force-broadcast only batches within the driver budget; a
          // cold-start AvailableNow backlog arrives as ONE batch and
          // must degrade to a shuffle join, not OOM the driver
          graft.ops.Similarity.semDeDupGateDropped(assigned, hist, eps,
            hintBroadcast = graft.ops.Similarity
              .batchBroadcastable(chk.getLong(0), chk.getInt(3)))
        } else spark.range(0).select(col("id").as("vec_id"))
      assigned.join(dropped, Seq("vec_id"), "left_anti")
        .withColumn("ingest_batch", lit(batchId))
        .sortWithinPartitions("domain")
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(outDir)
      // the store extends from the WRITTEN output (one verdict, no
      // recompute drift; floats roundtrip parquet bit-exactly). The
      // store — unlike the output — is DOMAIN-partitioned (domain=D/
      // ingest_batch=N, the nested IVF-store layout): the next batch's
      // history read then prunes to ITS domains at the file level via
      // the gate join's DPP, so per-batch history IO is sized by the
      // batch's domain set, never the admitted corpus
      spark.read.parquet(outDir)
        .filter(col("ingest_batch") === batchId)
        .select("vec_id", "domain", "embedding", "nrm", "ingest_batch")
        // cluster by domain before the write (the buildIvfIndex
        // rationale): file count per batch ~ domains touched, not
        // tasks x domains — a long-running gate would otherwise
        // compound the small-files explosion every micro-batch
        .repartition(col("domain"))
        .write.mode("overwrite").partitionBy("domain", "ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(storeDir)
    } finally scored.unpersist(blocking = true)
  }

  /** [[seedDedupStore]] for the SemDeDup gate: bootstrap the admitted
    * store with the BATCH operator's survivors over an existing corpus
    * — history arrives already semantically deduped under the
    * farthest-from-centroid keep-rule, and the stream's first batch is
    * gated against it. Seed keyed `ingest_batch = -1` like every other
    * seed; re-seeding refused once a batch has run.
    */
  def seedSemDeDupStore(
      corpus: DataFrame, storeDir: String, eps: Double = 0.3,
      quantizer: Option[graft.ops.Similarity.TwoLevelQuantizer] = None): Unit = {
    val spark = corpus.sparkSession
    requireSeedable(spark, storeDir)
    clearSeedPartition(spark, storeDir)
    requireSameAssignmentTable(spark, storeDir,
      graft.ops.Similarity.assignmentDigest(quantizer))
    val assigned = quantizer match {
      case Some(q) =>
        graft.ops.Similarity.quantizerAssignedD2(corpus, q)
          .join(graft.ops.Similarity.semDeDupWithQuantizer(corpus, q, eps)
            .select("vec_id"), Seq("vec_id"))
      case None =>
        graft.ops.Similarity.domainWithNorm(corpus)
          .join(graft.ops.Similarity.semDeDup(corpus, eps).select("vec_id"),
            Seq("vec_id"))
    }
    assigned
      .select("vec_id", "domain", "embedding", "nrm")
      .withColumn("ingest_batch", lit(-1L))
      // the seed is CORPUS-sized: without domain clustering it writes
      // tasks x domains files in one shot (the buildIvfIndex rationale)
      .repartition(col("domain"))
      .write.mode("overwrite").partitionBy("domain", "ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storeDir)
  }

  /** Stamp-or-verify the assignment-table digest of a SemDeDup store
    * (`_graft_quantizer` marker): absent → written (first writer wins —
    * covers pre-marker stores too), present → must equal, because a
    * store gated under one cell system and probed under another
    * silently mis-verdicts (cells just stop coinciding). Idempotent
    * under replay (content-stable write).
    */
  /** Refuse a SemDeDup admitted store written under the pre-r19 FLAT
    * layout (root-level `ingest_batch=N` dirs). The r19 layout nests
    * domain=D above ingest_batch=N for file-level DPP pruning; writing
    * the new layout NEXT TO old flat partitions would (a) blind the
    * monotone-ingest guard to the old history (cell detection looks
    * one level down) and then (b) fail every later history read with
    * parquet's conflicting-directory-structures error — batches could
    * be admitted against missing history before the read ever crashes.
    * Loud and early instead: re-seed into a fresh store, or migrate by
    * rewriting the old rows partitioned by (domain, ingest_batch).
    */
  private def requireDomainLayout(spark: SparkSession, storeDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(storeDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      val flat = partitionIds(fs, root)
      require(flat.isEmpty,
        s"the SemDeDup store at $storeDir was written under the pre-r19 " +
          s"FLAT layout (root-level ingest batches ${flat.keys.toSeq.sorted.mkString(",")}); " +
          "this gate writes the domain-partitioned layout and mixing the " +
          "two corrupts partition discovery — re-seed a fresh store, or " +
          "migrate by rewriting the old rows partitionBy(domain, ingest_batch)")
    }
  }

  private def requireSameAssignmentTable(
      spark: SparkSession, storeDir: String, digest: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$storeDir/_graft_quantizer")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      require(stored == digest,
        s"the SemDeDup store at $storeDir was written under assignment " +
          s"table $stored but this gate assigns under $digest — verdicts " +
          "across different cell systems are meaningless; point the gate " +
          "at the store's table or start a fresh store")
    } else {
      val out = fs.create(p, true)
      try out.write(digest.getBytes("UTF-8")) finally out.close()
    }
  }

  /** The [[semDeDupGateBatch]] body behind a streaming query. `vecs`
    * must carry `vec_id`, `label`, `embedding`.
    */
  /** `quantizerDir` points at a [[graft.ops.Similarity.writeQuantizer]]
    * table: loaded + validated ONCE per query (the loadBenchStore
    * discipline — never per micro-batch), the stream then assigns under
    * the fitted cells instead of the committed fixture table.
    */
  def startSemDeDupGate(
      vecs: DataFrame,
      storeDir: String,
      outDir: String,
      checkpointDir: String,
      eps: Double = 0.3,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None,
      withinBatch: Boolean = false,
      quantizerDir: Option[String] = None): StreamingQuery = {
    val quantizer = quantizerDir.map(
      graft.ops.Similarity.readQuantizer(vecs.sparkSession, _))
    vecs.writeStream
      .queryName("semdedup_gate")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(storeDir, outDir), compactEvery)(
        semDeDupGateBatch(storeDir, outDir, eps, withinBatch, quantizer)))
      .start()
  }

  /** Build the persisted benchmark shingle index the streaming
    * decontamination gate probes: distinct (bench_doc, shh) shingle
    * hashes with stop-shingles removed at BUILD time (shingles in more
    * than `maxBenchDf` benchmark docs identify none of them — see
    * [[graft.ops.Dedup.contaminatedPairs]]), so every later batch pays
    * neither the window nor the fan-out. Built once per benchmark
    * release; the benchmark is static, unlike the dedup stores.
    */
  def buildBenchmarkShingleStore(
      benchmark: DataFrame,
      dir: String,
      shingleSize: Int = 3,
      maxBenchDf: Long = 16L): Unit =
    graft.ops.Dedup.shingleHashes(benchmark, shingleSize)
      .withColumn("bench_df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shh")))
      .filter(col("bench_df") <= maxBenchDf)
      // shingle_n rides in the store so a gate probing with a DIFFERENT
      // shingle size fails loudly instead of silently matching nothing
      // (xxhash64 of k tokens never equals xxhash64 of m tokens — a
      // mismatched gate would admit every leaking doc with no error)
      .select(col("doc_id").as("bench_doc"), col("shh"),
        lit(shingleSize).as("shingle_n"))
      .write.mode("overwrite").parquet(dir)

  /** Streaming DECONTAMINATION gate — [[graft.ops.Dedup.decontaminate]]
    * lifted onto micro-batches: each batch's docs are inverted-index
    * joined against the persisted benchmark shingle store
    * ([[buildBenchmarkShingleStore]]); docs sharing ≥ `minShared`
    * distinct shingles with ANY benchmark doc are dropped, survivors
    * land under their own `ingest_batch` partition. Unlike the dedup
    * gates the store is STATIC (a benchmark never grows with the
    * stream), so the batch body is a pure function of (batch, store)
    * and replay idempotence needs only the own-partition dynamic
    * overwrite — no read-below filter.
    */
  /** Load a benchmark shingle store and validate its shingle size
    * against what the caller will probe with — a mismatch means zero
    * hash collisions and every leaking doc silently admitted, so it is
    * a loud error, not a degraded mode.
    */
  private def loadBenchStore(
      spark: SparkSession, dir: String, shingleSize: Int): DataFrame = {
    val bench = spark.read.parquet(dir)
    val stored = bench.select("shingle_n").head().getInt(0)
    require(stored == shingleSize,
      s"benchmark store $dir was built with shingleSize=$stored but the " +
        s"gate is probing with shingleSize=$shingleSize — rebuild the store " +
        "or pass the matching size (a mismatch matches NOTHING)")
    bench.select("bench_doc", "shh")
  }

  /** Batch body against a PRE-LOADED store frame — what
    * [[startDecontaminationGate]] uses, so the static store is read and
    * validated ONCE per query, not once per micro-batch.
    */
  def decontaminationGateBatch(
      bench: DataFrame, outDir: String, minShared: Long,
      shingleSize: Int)( // no default: MUST match the store's shingle_n
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    requireMonotoneIngest(batch.sparkSession, outDir, batchId)
    val flagged = graft.ops.Dedup.shingleHashes(batch, shingleSize)
      .withColumnRenamed("doc_id", "train_doc")
      .join(bench, Seq("shh"))
      .groupBy("train_doc", "bench_doc").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("train_doc").as("doc_id")).distinct()
    batch.join(flagged, Seq("doc_id"), "left_anti")
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
  }

  /** Dir-taking form for direct replay after recovery (reads + size-
    * validates the store itself).
    */
  def decontaminationGateBatch(
      benchStoreDir: String, outDir: String, minShared: Long = 5L,
      shingleSize: Int = 3)(
      batch: DataFrame, batchId: Long): Unit =
    decontaminationGateBatch(
      loadBenchStore(batch.sparkSession, benchStoreDir, shingleSize),
      outDir, minShared, shingleSize)(batch, batchId)

  /** [[decontaminationGateBatch]] behind a streaming query; `docs` must
    * carry `doc_id` and `text`. The store is loaded, size-validated and
    * persisted serialized ONCE here (it is static for the life of the
    * query — the build-time contract); the blocks live as long as the
    * stream, which is the intent for a per-batch probe index.
    */
  def startDecontaminationGate(
      docs: DataFrame,
      benchStoreDir: String,
      outDir: String,
      checkpointDir: String,
      minShared: Long = 5L,
      shingleSize: Int = 3,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    val bench = loadBenchStore(docs.sparkSession, benchStoreDir, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    docs.writeStream
      .queryName("decontamination_gate")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(outDir), compactEvery)(
        decontaminationGateBatch(bench, outDir, minShared, shingleSize)))
      .start()
  }

  // ------------------------------------------- bloom decontamination gate

  /** Build the persisted BLOOM decontamination store: the benchmark's
    * kept-shingle set as one serialized filter
    * ([[graft.ops.Dedup.benchmarkShingleBloom]] — stop-shingle cap
    * applied exactly at build time) plus the shingle size it was built
    * with, one row. Vs [[buildBenchmarkShingleStore]] this trades
    * per-bench-doc attribution and exactness (fpp-rate over-drop,
    * union-count semantics — see [[graft.ops.Dedup.decontaminateUnion]])
    * for a micro-batch body with NO join at all: the filter loads once
    * per query as driver bytes and gates every batch inside whole-stage
    * codegen. At streaming scale that removes the per-batch probe join
    * AND the resident store cache.
    */
  def buildBenchmarkBloomStore(
      benchmark: DataFrame,
      dir: String,
      shingleSize: Int = 3,
      maxBenchDf: Long = 16L,
      expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): Unit = {
    val spark = benchmark.sparkSession
    import spark.implicits._
    val bloom = graft.ops.Dedup.benchmarkShingleBloom(
      benchmark, shingleSize, maxBenchDf, expectedItems, numBits)
    Seq((bloom, shingleSize)).toDF("bloom", "shingle_n")
      .write.mode("overwrite").parquet(dir)
  }

  /** Load a bloom store's filter bytes, validating the shingle size the
    * same loud way as [[loadBenchStore]] (a mismatched probe matches
    * nothing and would admit every leaking doc).
    */
  private def loadBloomStore(
      spark: SparkSession, dir: String, shingleSize: Int): Array[Byte] = {
    val row = spark.read.parquet(dir).select("bloom", "shingle_n").head()
    val stored = row.getInt(1)
    require(stored == shingleSize,
      s"bloom store $dir was built with shingleSize=$stored but the " +
        s"gate is probing with shingleSize=$shingleSize — rebuild the store " +
        "or pass the matching size (a mismatch matches NOTHING)")
    row.getAs[Array[Byte]](0)
  }

  /** Batch body against PRE-LOADED filter bytes — what
    * [[startDecontaminationGateBloom]] uses. Pure function of
    * (batch, filter), so replay idempotence needs only the
    * own-partition dynamic overwrite, as with the exact gate.
    */
  def decontaminationGateBloomBatch(
      bloom: Array[Byte], outDir: String, minShared: Long,
      shingleSize: Int)( // no default: MUST match the store's shingle_n
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    requireMonotoneIngest(batch.sparkSession, outDir, batchId)
    batch.join(
        graft.ops.Dedup.bloomFlaggedDocs(batch, bloom, shingleSize, minShared),
        Seq("doc_id"), "left_anti")
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
  }

  /** Dir-taking form for direct replay after recovery. */
  def decontaminationGateBloomBatch(
      bloomStoreDir: String, outDir: String, minShared: Long = 5L,
      shingleSize: Int = 3)(
      batch: DataFrame, batchId: Long): Unit =
    decontaminationGateBloomBatch(
      loadBloomStore(batch.sparkSession, bloomStoreDir, shingleSize),
      outDir, minShared, shingleSize)(batch, batchId)

  /** [[decontaminationGateBloomBatch]] behind a streaming query. The
    * filter is loaded ONCE as driver bytes (one row, ~`numBits/8`
    * bytes) and rides every batch plan as a literal — no per-query
    * persisted store blocks, no per-batch join.
    */
  def startDecontaminationGateBloom(
      docs: DataFrame,
      bloomStoreDir: String,
      outDir: String,
      checkpointDir: String,
      minShared: Long = 5L,
      shingleSize: Int = 3,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    val bloom = loadBloomStore(docs.sparkSession, bloomStoreDir, shingleSize)
    docs.writeStream
      .queryName("decontamination_gate_bloom")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(outDir), compactEvery)(
        decontaminationGateBloomBatch(bloom, outDir, minShared, shingleSize)))
      .start()
  }

  /** Build the persisted bigram language model the streaming LM gate
    * scores against ([[graft.ops.TextAnalysis.lmScoreAgainst]]): bigram
    * counts under `dir`/bigrams, a one-row vocab-size frame under
    * `dir`/meta. Context counts are NOT stored — they are exactly the
    * per-w1 sums of the bigram counts and are re-derived at load (one
    * small aggregate over the count table), so the store cannot drift
    * into inconsistency between the two tables. Built once per
    * reference-corpus release, like the benchmark shingle store.
    */
  def buildLmStore(corpus: DataFrame, dir: String): Unit = {
    graft.ops.TextAnalysis.bigramOccurrences(corpus)
      .groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
      .write.mode("overwrite").parquet(s"$dir/bigrams")
    corpus.select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  private def loadLmStore(spark: SparkSession, dir: String): (DataFrame, DataFrame, Long) = {
    val cb = spark.read.parquet(s"$dir/bigrams")
    val v = spark.read.parquet(s"$dir/meta").head().getLong(0)
    require(v > 0,
      s"LM store $dir has vocabSize=$v — an empty model gates NOTHING " +
        "meaningfully; rebuild the store from a non-empty corpus")
    (cb, cb.groupBy("w1").agg(sum("cb").as("cu")), v)
  }

  /** Batch body against PRE-LOADED model frames — what [[startLmGate]]
    * uses, so the static store is read once per query. Docs with zero
    * bigrams (fewer than two tokens) have an UNDEFINED average and are
    * dropped — a perplexity gate cannot vouch for them.
    */
  def lmGateBatch(
      bigramCounts: DataFrame, contextCounts: DataFrame, vocabSize: Long,
      outDir: String, minAvgLogp: Double, k: Double)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    requireMonotoneIngest(batch.sparkSession, outDir, batchId)
    val keep = graft.ops.TextAnalysis
      .lmScoreAgainst(batch, bigramCounts, contextCounts, vocabSize, k)
      .filter(col("n_bigrams") > 0 && col("avg_logp") >= minAvgLogp)
      .select("doc_id")
    batch.join(keep, Seq("doc_id"), "left_semi")
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
  }

  /** Dir-taking form for direct replay after recovery. `k` must match
    * the running gate's smoothing — a replay with a different k scores
    * differently and would break the byte-identical-replay contract.
    */
  def lmGateBatch(
      lmStoreDir: String, outDir: String, minAvgLogp: Double, k: Double = 0.5)(
      batch: DataFrame, batchId: Long): Unit = {
    val (cb, cu, v) = loadLmStore(batch.sparkSession, lmStoreDir)
    lmGateBatch(cb, cu, v, outDir, minAvgLogp, k)(batch, batchId)
  }

  /** Streaming LM-perplexity gate — CCNet-style quality filtering lifted
    * onto micro-batches: each batch scores against the persisted bigram
    * model and only docs with avg log-prob ≥ `minAvgLogp` land, under
    * their own `ingest_batch` partition. The store is static for the
    * life of the query (same contract as the decontamination gate), so
    * the batch body is a pure function of (batch, store) and replay
    * idempotence needs only the own-partition dynamic overwrite.
    */
  def startLmGate(
      docs: DataFrame,
      lmStoreDir: String,
      outDir: String,
      checkpointDir: String,
      minAvgLogp: Double,
      k: Double = 0.5,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    val (cbRaw, cuRaw, v) = loadLmStore(docs.sparkSession, lmStoreDir)
    val cb = cbRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val cu = cuRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    docs.writeStream
      .queryName("lm_gate")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(outDir), compactEvery)(
        lmGateBatch(cb, cu, v, outDir, minAvgLogp, k)))
      .start()
  }

  /** Streaming distinct-count sketch store — the third persisted-store
    * job, for the KPI the exact forms can't stream at scale: distinct
    * users per day over an unbounded stream needs unbounded user-id
    * state exactly, but only a few KB per (day, batch) as a mergeable
    * HLL sketch ([[graft.ops.Aggregates.dailyUserSketches]]). Each
    * micro-batch appends its per-day sketches under its own
    * `ingest_batch` partition — no read-modify-write of history at all;
    * merging happens at QUERY time ([[sketchStoreDailyEstimates]]
    * unions per-batch sketches per day), which the union-associativity
    * property makes exact w.r.t. one-shot sketching. Replay idempotence
    * as in [[incrementalDedupBatch]]: a re-run batch dynamic-overwrites
    * its own partition, leaving estimates unchanged.
    */
  def sketchStoreBatch(storeDir: String)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    requireMonotoneIngest(batch.sparkSession, storeDir, batchId)
    graft.ops.Aggregates.dailyUserSketches(batch)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(storeDir)
  }

  /** [[sketchStoreBatch]] behind a streaming query; `events` must carry
    * `ts` and `user_id`.
    */
  def startSketchStore(
      events: DataFrame,
      storeDir: String,
      checkpointDir: String,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery =
    events.writeStream
      .queryName("sketch_store")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(storeDir), compactEvery)(
        sketchStoreBatch(storeDir)))
      .start()

  /** Query-side merge over the sketch store: per-day distinct-user
    * estimates from however many batch partitions exist. Reads sketches
    * only — never the raw events.
    */
  def sketchStoreDailyEstimates(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(storeDir)
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_users"))
      .orderBy("day")

  /** [[nearDupGateBatch]] behind a streaming query; `docs` must carry
    * `doc_id` and `text`.
    */
  def startNearDupGate(
      docs: DataFrame,
      storeDir: String,
      outDir: String,
      checkpointDir: String,
      threshold: Double = 0.4,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery =
    docs.writeStream
      .queryName("neardup_gate")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(storeDir, outDir), compactEvery)(
        nearDupGateBatch(storeDir, outDir, threshold)))
      .start()

  /** Stream-stream interval join: each event enriched with the same
    * user's purchases from the preceding `windowMinutes` (streaming lift
    * of graft.ops.Temporal.rangeJoin). Watermarks on BOTH sides plus the
    * time-bound join condition let Spark expire join state: a purchase
    * row is dropped once the event-side watermark passes
    * purchase-ts + window. Without the bound, stream-stream join state
    * grows forever — the condition is what makes this viable at scale.
    */
  def purchaseContextJoin(
      events: DataFrame,
      windowMinutes: Int = 10,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val e = events.withWatermark("ts", watermarkDelay)
    val p = events
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", watermarkDelay)
    e.join(p,
      col("user_id") === col("p_user") &&
        col("p_ts") <= col("ts") &&
        col("p_ts") > col("ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("p_id") =!= col("event_id"))
      .select(col("event_id"), col("user_id"), col("p_id"), col("ts"), col("p_ts"))
  }

  // ------------------------------------- semantic decontamination gate

  /** Build the persisted benchmark EMBEDDING store the streaming
    * semantic gate probes: (be, bn) — each benchmark vector with its
    * precomputed norm — plus the embedding dimensionality, so a gate
    * probing with differently-sized vectors fails loudly up front —
    * graft_dot would NOT error on a mismatch (it folds the shared
    * prefix against full-length norms, silently deflating cosines), so
    * [[semanticGateBatch]] checks every batch. A benchmark suite is
    * broadcast-sized by nature (same contract as the shingle stores).
    */
  def buildBenchmarkEmbeddingStore(benchmark: DataFrame, dir: String): Unit = {
    // The store IS the dim contract every batch is checked against, so
    // it must be homogeneous itself: emb_dim is recorded per row, but
    // readers take one arbitrary row as truth — a mixed-dim benchmark
    // would pass that read and silently deflate the mismatched rows'
    // cosines (the exact failure this store exists to prevent). NULL
    // embeddings are rejected for the same reason: size(NULL) is NULL
    // under ANSI, so they'd dodge the min/max check and score nothing.
    val d = benchmark.agg(
      min(size(col("embedding"))).as("lo"), max(size(col("embedding"))).as("hi"),
      count(lit(1)).as("n"), count(col("embedding")).as("nonNull")).head()
    require(d.getLong(2) > 0, "benchmark embedding store must not be empty")
    require(d.getLong(3) == d.getLong(2),
      s"benchmark has ${d.getLong(2) - d.getLong(3)} NULL embeddings — drop or fix " +
        "them before building the store (NULL rows cannot gate anything)")
    require(d.getInt(0) == d.getInt(1),
      s"benchmark embeddings are heterogeneous: ${d.getInt(0)}..${d.getInt(1)} dims — " +
        "a mixed store would validate against one arbitrary row's dim and " +
        "silently deflate the rest's cosines")
    graft.ops.Similarity.withNorm(benchmark)
      .select(col("embedding").as("be"), col("nrm").as("bn"),
        size(col("embedding")).as("emb_dim"))
      .write.mode("overwrite").parquet(dir)
  }

  /** Returns (probe frame (be, bn), validated embedding dim). */
  private[streaming] def loadEmbeddingStore(
      spark: SparkSession, dir: String, expectDim: Option[Int]): (DataFrame, Int) = {
    val bench = spark.read.parquet(dir)
    // min/max, not head(): a store written before the build-side
    // homogeneity check (or by another writer) must not validate off
    // one arbitrary row
    val dims = bench.agg(min(col("emb_dim")).as("lo"), max(col("emb_dim")).as("hi")).head()
    require(!dims.isNullAt(0) && dims.getInt(0) == dims.getInt(1),
      s"benchmark embedding store $dir is heterogeneous or empty " +
        s"(emb_dim ${dims.get(0)}..${dims.get(1)}) — rebuild it with " +
        "buildBenchmarkEmbeddingStore")
    val stored = dims.getInt(0)
    expectDim.foreach(d => require(stored == d,
      s"benchmark embedding store $dir holds $stored-dim vectors but the " +
        s"caller expects $d-dim vectors — rebuild the store or fix the source " +
        "(graft_dot would NOT error on a mismatch: it folds the shared prefix " +
        "against full-length norms, silently deflating every cosine)"))
    (bench.select("be", "bn"), stored)
  }

  /** Streaming SEMANTIC decontamination — the embedding-space member of
    * the gate family ([[graft.ops.Similarity.semanticDecontaminate]])
    * lifted onto micro-batches: each batch's vectors are scored against
    * the broadcast benchmark store (the paraphrase/translation leakage
    * the shingle gates can't see), and rows with max bench cosine >=
    * `threshold` are dropped. The store is STATIC (like the shingle
    * benchmark), so the body is a pure function of (batch, store) and
    * replay needs only the own-partition dynamic overwrite. Survivors
    * carry `max_bench_cos` as the audit column.
    *
    * Every batch's embedding dimensionality is checked against the
    * store's (`benchDim`) — this CANNOT be left to the dot product:
    * graft_dot folds over the SHARED PREFIX of mismatched vectors while
    * the norms cover full length, silently deflating every cosine and
    * admitting leakage (the embedding-model-upgrade failure mode). The
    * min/max aggregate also catches a heterogeneous batch, and NULL
    * embeddings are counted in the same pass and rejected loudly:
    * size(NULL) is NULL under ANSI, so NULL rows are invisible to
    * min/max — an all-NULL batch would otherwise NPE on getInt and a
    * partly-NULL batch would pass the check while its NULL rows
    * sailed through the gate unscored (coalesce(-1) < threshold).
    */
  def semanticGateBatch(
      bench: DataFrame, benchDim: Int, outDir: String, threshold: Double)(
      batch: DataFrame, batchId: Long): Unit = {
    require(threshold > 0, s"threshold must be positive (got $threshold)")
    if (batch.isEmpty) return // F7-style empty-batch guard
    requireMonotoneIngest(batch.sparkSession, outDir, batchId)
    val dims = batch.agg(
      min(size(col("embedding"))).as("lo"), max(size(col("embedding"))).as("hi"),
      count(lit(1)).as("n"), count(col("embedding")).as("nonNull")).head()
    require(dims.getLong(3) == dims.getLong(2),
      s"batch $batchId carries ${dims.getLong(2) - dims.getLong(3)} NULL embeddings — " +
        "NULL rows cannot be scored against the benchmark and would pass the " +
        "gate unexamined; drop or fix them upstream")
    require(dims.getInt(0) == benchDim && dims.getInt(1) == benchDim,
      s"batch $batchId carries ${dims.getInt(0)}..${dims.getInt(1)}-dim embeddings " +
        s"but the benchmark store holds $benchDim-dim vectors — a mismatch would " +
        "silently deflate every cosine (prefix dot over full-length norms), not error")
    graft.ops.Similarity.semanticSurvivorsAgainst(
      graft.ops.Similarity.withNorm(batch), bench, threshold)
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
  }

  /** [[semanticGateBatch]] behind a streaming query; `docs` must carry
    * (vec_id, label, embedding). The store is loaded once; its recorded
    * dimensionality gates every batch.
    */
  def startSemanticDecontaminationGate(
      docs: DataFrame,
      embStoreDir: String,
      outDir: String,
      checkpointDir: String,
      threshold: Double = 0.9,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    require(threshold > 0, s"threshold must be positive (got $threshold)")
    val spark = docs.sparkSession
    // loadEmbeddingStore validates homogeneity (min==max over emb_dim);
    // its validated dim is then the contract every batch checks against
    val (bench0, benchDim) = loadEmbeddingStore(spark, embStoreDir, None)
    val bench = bench0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    docs.writeStream
      .queryName("semantic_decontamination_gate")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(outDir), compactEvery)(
        semanticGateBatch(bench, benchDim, outDir, threshold)))
      .start()
  }

  // ------------------------------------------------- streaming audit

  /** Decontamination gate config for [[auditLedgerBatch]]:
    *  - [[AuditGate.Off]] — no benchmark, stage 7 never fires;
    *  - [[AuditGate.Exact]] — the persisted shingle store's inverted-
    *    index join, per-bench-doc attribution
    *    (`contaminated_by=<bench_doc>`);
    *  - [[AuditGate.Bloom]] — the zero-join 100 TB shape: the
    *    benchmark's kept-shingle set as one constant filter probed
    *    inside codegen. UNION semantics, so no per-bench-doc
    *    attribution — the reason reports the evidence instead
    *    (`bench_union_hits=<n>`), and over-dropping is the conservative
    *    failure direction ([[graft.ops.Dedup.decontaminateBloom]]).
    */
  sealed trait AuditGate
  object AuditGate {
    case object Off extends AuditGate
    final case class Exact(bench: DataFrame) extends AuditGate
    final case class Bloom(filter: Array[Byte]) extends AuditGate
  }

  /** Stage-8 config for [[auditLedgerBatch]]: the LM-perplexity gate
    * ([[startLmGate]]'s scoring — same model frames, same smoothing)
    * folded into the audit as a first-class stage instead of a separate
    * stream re-scanning every batch. Scores the CLEANED text (the
    * audit's contract: everything downstream of stage 1 operates on
    * `t`). Docs with zero bigrams have an undefined average and drop
    * (reason `n_bigrams=0`); otherwise the reason carries the
    * r4-rounded average as integer basis points (`avg_logp_bp=`),
    * keeping the ledger's no-raw-doubles rendering rule.
    */
  final case class AuditLmGate(
      bigramCounts: DataFrame,
      contextCounts: DataFrame,
      vocabSize: Long,
      minAvgLogp: Double,
      k: Double = 0.5)

  /** Stage-9 config for [[auditLedgerBatch]]: the semantic
    * decontamination gate ([[startSemanticDecontaminationGate]]'s
    * scoring) as a first-class audit stage. The batch must carry an
    * `embedding` column; NULL/dim validation runs once per batch over
    * ALL rows ([[semanticGateBatch]]'s contract — a NULL or mismatched
    * embedding must fail loudly even on a doc an earlier stage would
    * drop, because silent admission is the failure mode). Reason
    * carries the max bench cosine in basis points (`bench_cos_bp=`).
    */
  final case class AuditSemanticGate(
      bench: DataFrame,
      benchDim: Int,
      threshold: Double)

  /** Stage-10 config for [[auditLedgerBatch]]: the LEARNED quality gate
    * — the committed hashed-feature linear classifier
    * ([[graft.functions.QualityClf]], oracle row
    * `text_quality_classifier`) thresholded on its margin over the
    * CLEANED text `t` (the audit's contract, like every stage past 1).
    * Margin 0 is the model's own decision boundary (P = 0.5); raise
    * `minMargin` for a stricter corpus. Scores with the same codegen'd
    * kernel as the batch row, so gate and row can never drift. Reason
    * carries the margin in basis points (`clf_margin_bp=`), keeping the
    * ledger's no-raw-doubles rendering rule.
    */
  final case class AuditClassifierGate(minMargin: Double = 0.0)

  /** Stage-11 config for [[auditLedgerBatch]]: intra-stream SemDeDup —
    * the [[semDeDupGateBatch]] first-arrival-wins ε-closeness check as
    * a first-class audit stage, against a fifth persisted store
    * (`vecs/`: admitted docs' committed-domain assignment + vector +
    * norm). A doc whose embedding sits within `eps` cosine of ANY
    * already-admitted doc's embedding drops with `semdup_of=` the
    * smallest admitted match; survivors extend the store. This is the
    * redundancy the lexical stages cannot see: near_dup (stage 6)
    * needs shared word sets, semantic (stage 9) only guards the
    * BENCHMARK — a paraphrased duplicate of yesterday's admitted doc
    * passes both. Batch must carry an `embedding` column; NULL /
    * mixed-dim / zero-norm embeddings fail the batch loudly
    * ([[semDeDupGateBatch]]'s discipline — an unscoreable admitted
    * vector would never match anything later).
    *
    * `withinBatch = true` additionally applies the batch operator's
    * keep-rule INSIDE each micro-batch (the [[semDeDupGateBatch]]
    * option): ε-twins arriving together admit exactly one, the loser's
    * ledger row carrying `semdup_of=` its surviving batch twin — the
    * same reason spelling as a history match, mirroring exact_dup's one
    * `duplicate_of=` spelling across its batch/store keepers.
    *
    * `quantizer = Some(q)` assigns against a FITTED table
    * ([[graft.ops.Similarity.readQuantizer]] — load once, pass here)
    * instead of the committed fixture, exactly like the standalone
    * gate: the `vecs/` store is stamped with the table's content digest
    * and a mismatched stage is refused (verdicts across cell systems
    * fail silently otherwise), and batch dims must equal the table's.
    */
  final case class AuditSemDeDupGate(
      eps: Double = 0.3,
      withinBatch: Boolean = false,
      quantizer: Option[graft.ops.Similarity.TwoLevelQuantizer] = None)

  /** Stage table of the FULLY-composed streaming audit: the batch
    * pipeline's seven stages plus the stream-only LM, semantic,
    * classifier, and intra-stream SemDeDup gates. Streams running
    * without those gates still report against
    * [[graft.ops.Curation.auditStages]] (pass the right table to
    * [[auditFunnelFromStores]]).
    */
  val streamAuditStages: Seq[(Long, String)] =
    graft.ops.Curation.auditStages ++
      Seq(8L -> "lm_gate", 9L -> "semantic", 10L -> "classifier",
        11L -> "semdedup")

  /** Streaming REJECTION AUDIT — [[graft.ops.Curation.auditLedger]]'s
    * drop ledger lifted onto micro-batches: every doc a batch rejects
    * gets a (doc_id, stage_idx, stage, reason) row under its
    * `ingest_batch` partition, admitted docs land in `admitted/` and
    * extend two persisted stores (content hashes for the exact gate,
    * prefix-keyed word sets for the near-dup gate). Stage names,
    * indices, and reason renderings come from the SAME helpers as the
    * batch form ([[graft.ops.Curation.gateDropRows]]/`auditScored`), so
    * the two ledgers cannot drift in spelling.
    *
    * Semantics vs the batch ledger — identical for stages 1-4 and 7
    * (pure per-doc functions / a static benchmark), FIRST-ADMITTED-WINS
    * for the dedup stages (a stream cannot wait for "the smallest
    * doc_id ever", the [[graft.ops.Curation.curateStream]] contract):
    *
    *  - exact_dup: a batch doc whose hash is already stored drops with
    *    `duplicate_of=` the STORED keeper even if its own id is
    *    smaller; within a batch the min-id copy wins, as in batch.
    *  - near_dup: a doc drops if it matches an already-ADMITTED doc
    *    (word-set Jaccard within capped prefix blocks — the batch
    *    measure); within-batch near-dups deliberately pass
    *    ([[nearDupGateBatch]]'s contract), and a chain A~B~C where
    *    only B bridges admits BOTH A and C once B is dropped — the
    *    batch form's transitive closure would collapse all three.
    *    AuditStreamSpec pins both divergences explicitly.
    *
    * Replay idempotence: the [[incrementalDedupBatch]] recipe — every
    * output partitioned by `ingest_batch`, batch N reads only store
    * partitions `< N` and dynamic-overwrites its own.
    *
    * Stages 8 ([[AuditLmGate]], `lm_gate`), 9 ([[AuditSemanticGate]],
    * `semantic`), and 10 ([[AuditClassifierGate]], `classifier`)
    * compose the LM-perplexity, semantic-decontamination, and learned-
    * quality gates into the SAME batch body: one foreachBatch drives
    * all ten stages off one cached scored frame, each stage scoring
    * only the previous stage's survivors — a production stream pays one
    * scan of each batch instead of N separate gate streams re-reading
    * it. All three are pure functions of (batch, static store /
    * committed model), so they add nothing to the replay contract.
    */
  def auditLedgerBatch(
      storeRoot: String,
      gate: AuditGate = AuditGate.Off,
      minTokens: Long = 10L,
      minQuality: Double = 0.55,
      jaccardThreshold: Double = graft.ops.Curation.defaultJaccardThreshold,
      minShared: Long = 5L,
      shingleSize: Int = 3,
      maxBlock: Int = 64,
      lmGate: Option[AuditLmGate] = None,
      semanticGate: Option[AuditSemanticGate] = None,
      classifierGate: Option[AuditClassifierGate] = None,
      semDeDupGate: Option[AuditSemDeDupGate] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return // F7-style empty-batch guard
    val spark = batch.sparkSession
    // ledger/ is the batch's FIRST write, so its max ingest_batch is
    // the most-advanced of the five audit stores — the strictest guard
    requireMonotoneIngest(spark, s"$storeRoot/ledger", batchId)
    // the sibling stores this body reads or extends, none of which the
    // ledger guard's resolution covers
    resolvePendingAt(spark, s"$storeRoot/admitted",
      s"$storeRoot/hashes", s"$storeRoot/words", s"$storeRoot/vecs")
    import org.apache.spark.sql.expressions.Window
    // embedding contracts are validated over the WHOLE batch up front,
    // not just the stage's survivors: a NULL, wrong-dim, or (for the
    // semdedup store) zero-norm embedding is a data fault that must
    // fail the batch loudly either way
    val batchRows: Long =
      if (semanticGate.isDefined || semDeDupGate.isDefined) {
        val nulls = batch.agg(count(lit(1)).as("n"),
          count(col("embedding")).as("nonNull")).head()
        require(nulls.getLong(1) == nulls.getLong(0),
          s"audit batch $batchId carries ${nulls.getLong(0) - nulls.getLong(1)} NULL " +
            "embeddings — NULL rows cannot be scored by the embedding stages and " +
            "would pass them unexamined; drop or fix them upstream")
        nulls.getLong(0)
      } else -1L
    semanticGate.foreach { cfg =>
      val dims = batch.agg(
        min(size(col("embedding"))).as("lo"),
        max(size(col("embedding"))).as("hi")).head()
      require(dims.getInt(0) == cfg.benchDim && dims.getInt(1) == cfg.benchDim,
        s"audit batch $batchId carries ${dims.getInt(0)}..${dims.getInt(1)}-dim " +
          s"embeddings but the benchmark store holds ${cfg.benchDim}-dim vectors — " +
          "a mismatch would silently deflate every cosine, not error")
    }
    val sdBatchDim: Int = semDeDupGate.map { cfg =>
      // the vecs store's verdicts only make sense under ONE assignment
      // table — stamp-or-verify its digest (the standalone gate's
      // contract), and a fitted table must share the batch's dim
      // (graft_nearest_cell folds the shared prefix silently)
      requireDomainLayout(spark, s"$storeRoot/vecs")
      requireSameAssignmentTable(spark, s"$storeRoot/vecs",
        graft.ops.Similarity.assignmentDigest(cfg.quantizer))
      // zero-norm: admitted, it would never match anything later —
      // permanent silent store pollution (semDeDupGateBatch's
      // contract). Mixed dims: graft_dot folds the SHORTER length, so
      // cross-dim cosines silently deflate instead of erroring.
      val chk = batch.agg(
        min(graft.ops.Similarity.dot("embedding", "embedding")).as("m"),
        min(size(col("embedding"))).as("lo"),
        max(size(col("embedding"))).as("hi")).head()
      require(!chk.isNullAt(0) && chk.getDouble(0) > 0,
        s"audit batch $batchId carries zero-norm embeddings — the semdedup " +
          "stage cannot score them and an admitted unscoreable vector never " +
          "matches anything later; filter or fix them upstream")
      require(chk.getInt(1) == chk.getInt(2),
        s"audit batch $batchId carries mixed ${chk.getInt(1)}..${chk.getInt(2)}-dim " +
          "embeddings — cross-dim cosines silently deflate; fix upstream")
      cfg.quantizer.foreach(q => require(q.topCents.head.length == chk.getInt(1),
        s"audit batch $batchId carries ${chk.getInt(1)}-dim embeddings but the " +
          s"quantizer table holds ${q.topCents.head.length}-dim centroids — " +
          "graft_nearest_cell would fold the shared prefix and silently " +
          "mis-assign; the stream and its table must share one space"))
      // history-coverage contract: docs admitted BEFORE the gate was
      // enabled carry no vectors in vecs/, so their semantic duplicates
      // would silently pass forever. A gate must run (or be seeded)
      // from the store's first batch. Replay of the CURRENT batch is
      // fine: only partitions strictly below batchId count as history.
      val admRoot = new org.apache.hadoop.fs.Path(s"$storeRoot/admitted")
      val admFs = admRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val priorAdmitted =
        if (admFs.exists(admRoot))
          partitionIds(admFs, admRoot).keys.filter(_ < batchId).toSet
        else Set.empty[Long]
      val vecsRoot = new org.apache.hadoop.fs.Path(s"$storeRoot/vecs")
      val vecsFs = vecsRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val vecsIds =
        if (vecsFs.exists(vecsRoot)) {
          // the vecs store is domain-partitioned: ingest ids live one
          // level down, under each domain cell
          val cells = cellDirs(vecsFs, vecsRoot)
          (if (cells.nonEmpty) cells else Seq(vecsRoot))
            .flatMap(r => partitionIds(vecsFs, r).keys).toSet
        } else Set.empty[Long]
      // a gate-from-start stream writes vecs whenever it writes
      // admitted, and compaction folds the two stores' partitions in
      // step — so any admitted history id missing from vecs means the
      // gate was OFF for that batch
      require(priorAdmitted.subsetOf(vecsIds),
        s"semdedup gate enabled over admitted history the vecs store at " +
          s"$storeRoot/vecs does not cover (admitted batches " +
          s"${(priorAdmitted -- vecsIds).toSeq.sorted.mkString(",")} carry " +
          "no vectors; their semantic duplicates would silently pass " +
          "forever) — run the gate from the stream's first batch, or " +
          "re-seed the stores with the gate configured")
      chk.getInt(1)
    }.getOrElse(0)
    val hashDir = s"$storeRoot/hashes"
    val wordsDir = s"$storeRoot/words"
    def writeOwn(df: DataFrame, dir: String): Unit =
      df.withColumn("ingest_batch", lit(batchId))
        .write.mode("overwrite").partitionBy("ingest_batch")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(dir)
    val scored = graft.ops.Curation.auditScored(batch, minTokens, minQuality)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    scored.count()
    try {
      val gateDrops = graft.ops.Curation.gateDropRows(scored)
      val hashed = scored.filter(col("gate_stage").isNull)
        .withColumn("content_hash", sha2(col("t"), 256))
        .withColumn("batch_keep",
          min(col("doc_id")).over(Window.partitionBy("content_hash")))
      val storeKeeps =
        if (partitionedStoreNonEmpty(spark, hashDir))
          spark.read.parquet(hashDir).filter(col("ingest_batch") < batchId)
            .groupBy("content_hash").agg(min(col("keep_doc_id")).as("store_keep"))
        else spark.range(0).select(
          col("id").cast("string").as("content_hash"), col("id").as("store_keep"))
      val keyedHash = hashed.join(storeKeeps, Seq("content_hash"), "left")
        .withColumn("keep_doc_id", coalesce(col("store_keep"), col("batch_keep")))
      val exactDrops = keyedHash.filter(col("doc_id") =!= col("keep_doc_id"))
        .select(col("doc_id"), lit(5L).as("stage_idx"), lit("exact_dup").as("stage"),
          concat(lit("duplicate_of="), col("keep_doc_id")).as("reason"))
      val distincts = keyedHash.filter(col("doc_id") === col("keep_doc_id"))
        .select(col("doc_id"), col("t"))
      def keyedWords(df: DataFrame): DataFrame = df.select(
        col("doc_id"),
        graft.ops.Dedup.blockKeyOf(col("t")).as("block_key"),
        graft.ops.Dedup.wordSetOf(col("t")).as("words"))
      val nearDropped: DataFrame =
        if (partitionedStoreNonEmpty(spark, wordsDir)) {
          val sw = spark.read.parquet(wordsDir)
            .filter(col("ingest_batch") < batchId)
          val blockSizes = sw.groupBy("block_key").agg(count(lit(1)).as("store_n"))
          // the batch measure, by the SAME definition (Dedup.r4Jaccard —
          // the spelling pairsWithinBlocks verifies with)
          val jac = graft.ops.Dedup.r4Jaccard(col("words"), col("adm_words"))
          keyedWords(distincts)
            .withColumn("batch_n", count(lit(1)).over(Window.partitionBy("block_key")))
            .join(blockSizes, Seq("block_key"), "left")
            // the batch cap, over the COMBINED block population
            .filter(coalesce(col("store_n"), lit(0L)) + col("batch_n") <= maxBlock)
            .join(sw.select(col("doc_id").as("adm_doc"), col("block_key"),
              col("words").as("adm_words")), Seq("block_key"))
            .filter(jac >= jaccardThreshold)
            .groupBy("doc_id").agg(min(col("adm_doc")).as("near_of"))
        } else spark.range(0).select(col("id").as("doc_id"), col("id").as("near_of"))
      val nearDrops = nearDropped
        .select(col("doc_id"), lit(6L).as("stage_idx"), lit("near_dup").as("stage"),
          concat(lit("near_dup_of="), col("near_of")).as("reason"))
      val canonical = distincts
        .join(nearDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // each gate yields (doc_id, reason); stage framing is shared below
      val deconDropped: DataFrame = gate match {
        case AuditGate.Exact(bench) =>
          graft.ops.Dedup.shingleHashes(
            canonical.select(col("doc_id"), col("t").as("text")), shingleSize)
            .withColumnRenamed("doc_id", "train_doc")
            .join(bench, Seq("shh"))
            .groupBy("train_doc", "bench_doc").agg(count(lit(1)).as("n_shared"))
            .filter(col("n_shared") >= minShared)
            .groupBy("train_doc").agg(min(col("bench_doc")).as("bench_doc"))
            .select(col("train_doc").as("doc_id"),
              concat(lit("contaminated_by="), col("bench_doc")).as("reason"))
        case AuditGate.Bloom(filter) =>
          graft.ops.Dedup.bloomFlaggedDocs(
            canonical.select(col("doc_id"), col("t").as("text")),
            filter, shingleSize, minShared)
            .select(col("doc_id"),
              concat(lit("bench_union_hits="), col("n_hits")).as("reason"))
        case AuditGate.Off =>
          spark.range(0).select(col("id").as("doc_id"), col("id").cast("string").as("reason"))
      }
      val deconDrops = deconDropped
        .select(col("doc_id"), lit(7L).as("stage_idx"),
          lit("decontaminated").as("stage"), col("reason"))
      val afterDecon = canonical
        .join(deconDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // stage 8: LM perplexity over decon survivors' cleaned text —
      // ONE batch body drives all gates, so a production stream pays
      // one scan (+ cached scored frame) instead of N separate streams
      // each re-reading the batch
      val noDrops = spark.range(0).select(
        col("id").as("doc_id"), col("id").cast("string").as("reason"))
      val lmDropped: DataFrame = lmGate match {
        case Some(cfg) =>
          graft.ops.TextAnalysis.lmScoreAgainst(
            afterDecon.select(col("doc_id"), col("t").as("text")),
            cfg.bigramCounts, cfg.contextCounts, cfg.vocabSize, cfg.k)
            .filter(col("n_bigrams") === 0 || col("avg_logp") < cfg.minAvgLogp)
            .select(col("doc_id"),
              when(col("n_bigrams") === 0, lit("n_bigrams=0"))
                .otherwise(concat(lit("avg_logp_bp="),
                  floor(col("avg_logp") * 10000 + 0.5).cast("long"))).as("reason"))
        case None => noDrops
      }
      val lmDrops = lmDropped.select(col("doc_id"), lit(8L).as("stage_idx"),
        lit("lm_gate").as("stage"), col("reason"))
      val afterLm = afterDecon.join(lmDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // stage 9: semantic decontamination over LM survivors — the
      // embedding rides the batch row, joined back by doc_id
      val semDropped: DataFrame = semanticGate match {
        case Some(cfg) =>
          // the shared scoring kernel (Similarity.semanticMaxCosAgainst
          // — same rounding/zero-norm/max arithmetic as the batch
          // operator and the standalone gate stream); only the verdict
          // side differs: the audit keeps the DROPS
          val withN = afterLm.select(col("doc_id"))
            .join(batch.select(col("doc_id"), col("embedding")), Seq("doc_id"))
            .withColumn("nrm",
              sqrt(graft.ops.Similarity.dot("embedding", "embedding")))
          graft.ops.Similarity.semanticMaxCosAgainst(
            withN.withColumnRenamed("doc_id", "vec_id"), cfg.bench)
            .filter(coalesce(col("max_bench_cos"), lit(-1.0)) >= cfg.threshold)
            .select(col("vec_id").as("doc_id"), concat(lit("bench_cos_bp="),
              floor(col("max_bench_cos") * 10000 + 0.5).cast("long")).as("reason"))
        case None => noDrops
      }
      val semDrops = semDropped.select(col("doc_id"), lit(9L).as("stage_idx"),
        lit("semantic").as("stage"), col("reason"))
      val afterSem = afterLm
        .join(semDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // stage 10: learned quality over semantic survivors — the
      // committed hashed-linear classifier's margin via the SAME
      // codegen'd kernel as the text_quality_classifier oracle row
      val clfDropped: DataFrame = classifierGate match {
        case Some(cfg) =>
          afterSem.select(col("doc_id"),
            call_function("graft_quality_margin",
              split(lower(col("t")), "\\s+"),
              lit(graft.functions.QualityClf.modelSpec)).as("m"))
            .filter(col("m") < cfg.minMargin)
            .select(col("doc_id"), concat(lit("clf_margin_bp="),
              floor(col("m") * 10000 + 0.5).cast("long")).as("reason"))
        case None => noDrops
      }
      val clfDrops = clfDropped.select(col("doc_id"), lit(10L).as("stage_idx"),
        lit("classifier").as("stage"), col("reason"))
      val afterClf = afterSem
        .join(clfDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // stage 11: intra-stream SemDeDup over classifier survivors —
      // ε-closeness against the persisted admitted-vector store, the
      // FIRST-ARRIVAL-WINS contract of the dedup stages (5/6) in
      // embedding space; within-batch semantic dups intentionally pass
      // (semDeDupGateBatch's contract — run the batch operator
      // upstream if intra-batch redundancy matters)
      val vecsDir = s"$storeRoot/vecs"
      val sdDropped: DataFrame = semDeDupGate match {
        case Some(cfg) =>
          val batchVecs = afterClf
            .select(col("doc_id").as("vec_id"), lit("").as("label"))
            .join(batch.select(col("doc_id").as("vec_id"), col("embedding")),
              Seq("vec_id"))
          val assigned = cfg.quantizer match {
            case Some(qz) => graft.ops.Similarity.quantizerAssignedD2(batchVecs, qz)
            case None => graft.ops.Similarity.domainAssignedD2(batchVecs)
          }
          val noMatches = spark.range(0).select(
            col("id").as("vec_id"), col("id").as("matched_id"))
          // optional intra-batch keep-rule FIRST: ε-twins arriving in
          // one batch admit exactly one; only survivors pay the history
          // join (a dropped twin needs no second verdict)
          val intra =
            if (cfg.withinBatch)
              graft.ops.Similarity.semDeDupPairLosses(assigned, cfg.eps)
            else noMatches
          val survivors =
            if (cfg.withinBatch)
              assigned.join(intra.select("vec_id"), Seq("vec_id"), "left_anti")
            else assigned
          val hist =
            if (partitionedStoreNonEmpty(spark, vecsDir)) {
              // batch-domain pruning of the history read, the standalone
              // gate's discipline: the vecs store is domain-partitioned
              // and the gate join plants DPP on its scan — file-level
              // pruning with no collected domain literal and no driver
              // round-trip
              graft.ops.Similarity.semDeDupGateMatches(
                survivors,
                spark.read.parquet(vecsDir)
                  .filter(col("ingest_batch") < batchId)
                  .select(col("doc_id").as("adm_id"), col("domain"),
                    col("embedding"), col("nrm")),
                cfg.eps,
                // force-broadcast only within the driver budget
                // (batchRows bounds the survivor count from above) — an
                // AvailableNow cold-start backlog must degrade to a
                // shuffle join
                hintBroadcast = graft.ops.Similarity
                  .batchBroadcastable(batchRows, sdBatchDim))
            } else noMatches
          intra.unionAll(hist)
            .select(col("vec_id").as("doc_id"),
              concat(lit("semdup_of="), col("matched_id")).as("reason"))
        case None => noDrops
      }
      val sdDrops = sdDropped.select(col("doc_id"), lit(11L).as("stage_idx"),
        lit("semdedup").as("stage"), col("reason"))
      val admitted = afterClf
        .join(sdDropped.select("doc_id"), Seq("doc_id"), "left_anti")
      // outputs first, stores derived from the WRITTEN output (the
      // incrementalDedupBatch discipline: one compute, and a store job
      // never reads and overwrites its own dir in one plan)
      writeOwn(
        gateDrops.unionAll(exactDrops).unionAll(nearDrops).unionAll(deconDrops)
          .unionAll(lmDrops).unionAll(semDrops).unionAll(clfDrops)
          .unionAll(sdDrops),
        s"$storeRoot/ledger")
      writeOwn(admitted, s"$storeRoot/admitted")
      // an all-dropped FIRST batch leaves admitted/ with no parquet files
      // at all — nothing to read back, and nothing the stores need
      if (partitionedStoreNonEmpty(spark, s"$storeRoot/admitted")) {
        val written = spark.read.parquet(s"$storeRoot/admitted")
          .filter(col("ingest_batch") === batchId)
        writeOwn(
          written.select(sha2(col("t"), 256).as("content_hash"),
            col("doc_id").as("keep_doc_id")),
          hashDir)
        writeOwn(keyedWords(written), wordsDir)
        // the semdedup history: admitted ids joined back to the batch's
        // embeddings (the stage-9 ride-the-row discipline), assigned
        // under the SAME table as the stage's verdicts (committed or
        // fitted). DOMAIN-partitioned like the standalone gate's store,
        // so the next batch's history read prunes to its domains at the
        // file level via the gate join's DPP
        semDeDupGate.foreach { cfg =>
          val admVecs = written
            .select(col("doc_id").as("vec_id"), lit("").as("label"))
            .join(batch.select(col("doc_id").as("vec_id"), col("embedding")),
              Seq("vec_id"))
          val admAssigned = cfg.quantizer match {
            case Some(qz) => graft.ops.Similarity.quantizerAssignedD2(admVecs, qz)
            case None => graft.ops.Similarity.domainWithNorm(admVecs)
          }
          admAssigned
            .select(col("vec_id").as("doc_id"), col("domain"),
              col("embedding"), col("nrm"))
            .withColumn("ingest_batch", lit(batchId))
            // cluster by domain before the write (see the gate store)
            .repartition(col("domain"))
            .write.mode("overwrite").partitionBy("domain", "ingest_batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(vecsDir)
        }
      }
    } finally scored.unpersist(blocking = true)
  }

  /** Yield funnel over a streaming audit's persisted outputs — the
    * batch [[graft.ops.Curation.auditFunnel]] shape recomputed from the
    * ledger + admitted stores (total in = ledger rows + admitted rows,
    * telescoping per stage). Run it any time against a live stream's
    * `storeRoot`; it reads only the two parquet outputs.
    *
    * Fails loudly when the ledger carries a `stage_idx` the supplied
    * `stageTable` does not list (e.g. reading a store written by a
    * stream running the LM/semantic gates with the 7-stage default):
    * silently dropping those ledger rows would desynchronize the
    * funnel's final `n_out` from the admitted count while `n_total`
    * still includes them. Pass [[streamAuditStages]] for such stores.
    */
  def auditFunnelFromStores(
      spark: SparkSession,
      storeRoot: String,
      stageTable: Seq[(Long, String)] = graft.ops.Curation.auditStages): DataFrame = {
    // BOTH stores need the partition-subdir guard: a stream that admits
    // every doc (clean corpus) writes ledger/ as _SUCCESS-only, the
    // mirror image of the all-dropped admitted/ edge
    val ledger =
      if (partitionedStoreNonEmpty(spark, s"$storeRoot/ledger"))
        spark.read.parquet(s"$storeRoot/ledger")
      else spark.range(0).select(
        col("id").as("doc_id"), col("id").as("stage_idx"),
        col("id").cast("string").as("stage"), col("id").cast("string").as("reason"))
    // Bounded driver read: distinct (stage_idx, stage) is at most the
    // stage count (9), never corpus-sized.
    val known = stageTable.toMap
    val unknown = ledger.select("stage_idx", "stage").distinct().collect()
      .filter(r => !known.contains(r.getLong(0)))
    require(unknown.isEmpty,
      s"auditFunnelFromStores: ledger at $storeRoot/ledger carries stage(s) " +
        unknown.map(r => s"${r.getLong(0)}:${r.getString(1)}").sorted.mkString(", ") +
        s" absent from the supplied stageTable ${known.keys.toSeq.sorted.mkString("[", ",", "]")}" +
        " — pass the stage table the stream actually ran (streamAuditStages for" +
        " LM/semantic-gated streams), or the funnel would silently drop those rows")
    val nAdmitted =
      if (partitionedStoreNonEmpty(spark, s"$storeRoot/admitted"))
        spark.read.parquet(s"$storeRoot/admitted").count()
      else 0L
    graft.ops.Curation.auditFunnelFromLedger(
      ledger,
      ledger.agg((count(lit(1)) + nAdmitted).cast("long").as("n_total")),
      stageTable)
  }

  /** Streaming ANN ingest — [[graft.ops.Similarity.assignToPqIndex]]
    * behind a streaming query: each micro-batch's vectors (vec_id,
    * label, embedding) are encoded against the committed PQ codebook
    * and assigned to their nearest existing coarse cell in the
    * persisted IVF-PQ store at `indexDir` (built once by
    * `buildIvfPqIndex` — the quantizer is never refit by the stream).
    * Ingest batch N writes partition ingest_batch = N + 1 (0 is the
    * initial build's), and the batch body dynamic-overwrites ONLY its
    * own partitions — so foreachBatch's at-least-once replay replaces
    * rather than double-appends (the incrementalDedupBatch discipline;
    * pinned by the replay test in SimilaritySpec). Both the codes and
    * packed stores advance in step.
    */
  def startPqIngestStream(
      vectors: DataFrame,
      indexDir: String,
      checkpointDir: String,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery =
    vectors.writeStream
      .queryName("pq_ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // nested-store self-maintenance: resolve any crashed per-cell
        // compaction BEFORE the assignment reads/writes the store —
        // unconditionally, NOT gated on the cadence being re-enabled
        // this run (a resume without compactEvery after a mid-compaction
        // crash must still see the folded history, not the gapped
        // store). assigned_pq itself is resolved by the monotone guard
        // below; only its two derived siblings need probing here.
        resolvePendingPq(spark, indexDir,
          only = Seq("assigned_pq_packed", "assigned_raw"))
        // F7-style empty-batch guard; +1 keeps batch 0 clear of the
        // initial build's partition
        if (!batch.isEmpty) {
          val target = batchId + 1
          requireMonotoneIngest(spark, s"$indexDir/assigned_pq", target)
          graft.ops.Similarity.assignToPqIndex(spark, indexDir, batch, target)
        }
        compactEvery.foreach { n =>
          // existence-gated like withAutoCompaction: an empty batch on
          // the cadence before the index was ever built must be a no-op,
          // not a crash on compactPqIngestStore's exists-require
          if ((batchId + 1) % n == 0 &&
            storeNonEmpty(spark, s"$indexDir/assigned_pq"))
            compactPqIngestStore(spark, indexDir)
        }
      }
      .start()

  /** The PQ index's nested stores: the two codes stores always, plus
    * the raw re-rank sidecar when the build wrote one (sidecar presence
    * is a build-time choice — see Similarity.buildIvfPqIndex — so the
    * maintenance paths detect it rather than demand it). Compaction's
    * exists-require on the codes stores is unchanged: those are never
    * optional, only the sidecar is.
    */
  private def pqStores(spark: SparkSession, indexDir: String): Seq[String] = {
    val raw = new org.apache.hadoop.fs.Path(s"$indexDir/assigned_raw")
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("assigned_pq", "assigned_pq_packed") ++
      (if (fs.exists(raw)) Seq("assigned_raw") else Nil)
  }

  /** [[resolvePending]] over every cell of the nested PQ stores in
    * `only` (defaults to all present). The ingest stream passes the
    * stores its [[requireMonotoneIngest]] guard does NOT already
    * resolve, so nothing is probed twice per batch.
    */
  private def resolvePendingPq(
      spark: SparkSession, indexDir: String,
      only: Seq[String] = Nil): Unit =
    (if (only.nonEmpty) only.filter(pqStores(spark, indexDir).contains)
     else pqStores(spark, indexDir)).foreach { store =>
      val root = new org.apache.hadoop.fs.Path(s"$indexDir/$store")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(root))
        fs.listStatus(root)
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("list_id="))
          .foreach(c => resolvePending(fs, c.getPath))
    }

  // ---------------------------------------------------- k-NN serving

  /** One serving micro-batch: validate, answer through ONE batched
    * k-NN join ([[graft.ops.Similarity.knnJoinIvf]] — probe ranking,
    * file-level cell pruning, one query-keyed top-k window), land the
    * answers under the batch's own `ingest_batch` partition with
    * dynamic overwrite — a replayed batch (checkpoint recovery)
    * REPLACES its own answers instead of duplicating them, the store
    * discipline every ingest path here follows.
    *
    * Validation is the gate discipline: a NULL or zero-norm query's
    * cosine is NULL/NaN, so its "answers" would be an arbitrary k rows
    * served silently — refused loudly instead; a query dim different
    * from the index's would fold the shared prefix and silently
    * deflate every score (the graft_dot contract), refused against the
    * dim captured from the centroid table at stream start. The
    * broadcast hint is budget-gated: a serving batch is small by
    * contract, but an AvailableNow cold-start backlog arrives as ONE
    * batch and must degrade to an AQE-sized shuffle join, not OOM the
    * driver.
    */
  private[graft] def knnServeBatch(
      indexDir: String, outDir: String, k: Int, nprobe: Int, idxDim: Int,
      usePq: Boolean = false)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val chk = batch.agg(count(lit(1)).as("n"),
      // count(embedding) skips NULL arrays: nn < n detects one anywhere
      count(col("embedding")).as("nn"),
      min(graft.ops.Similarity.dot("embedding", "embedding")).as("mn"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi"),
      // NULL ELEMENTS inside an array dodge every check above —
      // size() counts null slots and graft_dot/graft_cosine silently
      // SKIP them, so such a query would pass validation and be
      // served deflated scores in raw mode (the PQ kernel fails
      // loudly; raw mode would not). coalesce guards the NULL-array
      // rows already counted by nn < n.
      max(coalesce(exists(col("embedding"), _.isNull), lit(false))
        .cast("int")).as("nullElem")).head()
    require(chk.getLong(1) == chk.getLong(0) &&
        !chk.isNullAt(2) && chk.getDouble(2) > 0,
      "query batch carries NULL or zero-norm embeddings — their cosines " +
        "are unscoreable and the served top-k would be arbitrary rows; " +
        "filter or fix them upstream")
    require(chk.getInt(5) == 0,
      "query batch carries NULL elements inside embeddings — graft_dot " +
        "skips null slots, so every served score would be silently " +
        "deflated; filter or fix them upstream")
    require(chk.getInt(3) == chk.getInt(4) && chk.getInt(3) == idxDim,
      s"query batch embeddings are ${chk.getInt(3)}..${chk.getInt(4)}-dim " +
        s"but the index at $indexDir holds $idxDim-dim vectors — " +
        "graft_dot folds the shared prefix, silently deflating every " +
        "served score; the stream and its index must share one space")
    val hint = graft.ops.Similarity
      .batchBroadcastable(chk.getLong(0), idxDim)
    val answers =
      // PQ mode serves from the packed codes store through the batched
      // ADC kernel — the 64×-smaller joined side; raw mode scores exact
      // cosines off the raw store (answer column cos_pq vs cos_sim
      // names which contract produced a stored answer)
      if (usePq) graft.ops.Similarity.knnJoinIvfPq(spark, indexDir, batch,
        k, nprobe, excludeSelf = false, hintBroadcast = hint, packed = true)
      else graft.ops.Similarity.knnJoinIvf(spark, indexDir, batch, k, nprobe,
        excludeSelf = false, hintBroadcast = hint)
    answers
      .withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite").partitionBy("ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(outDir)
  }

  /** Online ANN serving — the streaming lift of the batched k-NN join:
    * a stream of query vectors (`query_id`, `embedding`) is answered
    * per micro-batch against a persisted IVF index, answers landing
    * in `outDir` as (query_id, vec_id, label, cos_sim, ingest_batch).
    * `usePq = true` serves from an IVF-PQ index's PACKED codes store
    * through the batched ADC kernel (answers carry `cos_pq`) — the
    * 64×-smaller joined side that makes 100 TB serving memory-shaped
    * like the index, at PQ's quantization accuracy; raw mode scores
    * exact cosines off the raw store.
    * The index is build-once/serve-many ([[startPqIngestStream]] is the
    * write side of the same store family); the centroid-table dim is
    * captured and validated ONCE at stream start (the loadBenchStore
    * discipline — a missing or corrupt index fails the start, not
    * batch 0). Per batch the serve cost is the knnJoinIvf contract:
    * probed-cell file pruning means a batch touching p distinct cells
    * reads p/nlist of the store — at 100 TB the serving stream's IO is
    * sized by its query batches, never by the corpus.
    */
  def startKnnServe(
      queries: DataFrame,
      indexDir: String,
      outDir: String,
      checkpointDir: String,
      k: Int = 10,
      nprobe: Int = 4,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None,
      usePq: Boolean = false): StreamingQuery = {
    require(k >= 1 && nprobe >= 1,
      s"k and nprobe must be >= 1 (got k=$k nprobe=$nprobe)")
    val idxDim = graft.ops.Similarity.indexDim(queries.sparkSession, indexDir)
    if (usePq) {
      // the packed codes store must exist AT START (the 'a missing or
      // corrupt index fails the start, not batch 0' discipline the
      // centroid-dim capture already follows): a raw IVF index passed
      // with usePq=true would otherwise start cleanly and die on the
      // first batch. Reading the residual marker here also proves the
      // marker file is reachable before any batch commits.
      val packed = new org.apache.hadoop.fs.Path(s"$indexDir/assigned_pq_packed")
      require(packed.getFileSystem(
          queries.sparkSession.sparkContext.hadoopConfiguration).exists(packed),
        s"usePq=true but the index at $indexDir has no assigned_pq_packed " +
          "store — it is a raw IVF index (or a codes build that never " +
          "packed); serve it with usePq=false or rebuild with " +
          "buildIvfPqIndex")
      graft.ops.Similarity.isResidualIndex(queries.sparkSession, indexDir): Unit
    }
    queries.writeStream
      .queryName("knn_serve")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(outDir), compactEvery)(
        knnServeBatch(indexDir, outDir, k, nprobe, idxDim, usePq)))
      .start()
  }

  /** Bootstrap the family-assignment stream: build the IVF index over
    * the seed corpus and file every seed vector's family from the
    * BATCH operator ([[graft.ops.Similarity.knnGraphFamilies]]) at
    * `ingest_batch = -1` — history arrives labeled exactly as the
    * batch semantics define, and the stream's first batch assigns
    * against it. Same seed discipline as every other gate: refused
    * once a batch has run, seed partition cleared before the write.
    */
  def seedFamilyStore(
      corpus: DataFrame,
      indexDir: String,
      familiesDir: String,
      nlist: Int = 16,
      k: Int = 3,
      nprobe: Int = 4,
      minCos: Double = 0.3,
      buckets: Int = 64): Unit = {
    val spark = corpus.sparkSession
    requireSeedable(spark, familiesDir)
    clearSeedPartition(spark, familiesDir)
    graft.ops.Similarity.buildIvfIndex(corpus, indexDir, nlist = nlist)
    graft.ops.Similarity.knnGraphFamilies(spark, indexDir, corpus,
        k = k, nprobe = nprobe, minCos = minCos)
      .select(col("vec_id"), col("label"), col("family"))
      .withColumn("ingest_batch", lit(-1L))
      // id-hash bucket partitioning (Similarity.familyBucketOf): the
      // per-batch anchor lookup reads only the buckets holding the
      // batch's mutual ids instead of the whole admitted history —
      // the history scan was the one per-batch cost that grew without
      // bound over the stream's life. Sizing rule: buckets ~ expected
      // admitted rows / target bucket rows (the nlist discipline);
      // compaction is the natural re-bucket point as the store grows.
      // Cell-clustered-write discipline: repartition by the partition
      // column so file count per write ~ buckets, not tasks x buckets.
      .withColumn("fam_bucket",
        graft.ops.Similarity.familyBucketOf(col("vec_id"), buckets))
      .repartition(col("fam_bucket"))
      // bucket FIRST, like the other cell-partitioned stores
      // (list_id=/domain=): the monotone guard, seed clear, and
      // per-cell compaction all key on the first-level cell dirs
      .write.mode("overwrite").partitionBy("fam_bucket", "ingest_batch")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(familiesDir)
    writeFamilyBucketsMarker(spark, familiesDir, buckets)
  }

  private val familyBucketsMarkerName = "_graft_fam_buckets"

  private[graft] def writeFamilyBucketsMarker(
      spark: org.apache.spark.sql.SparkSession,
      familiesDir: String, buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$familiesDir/$familyBucketsMarkerName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(buckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /** The store's bucket count, from the marker [[seedFamilyStore]]
    * stamps — 0 for a pre-bucketing store (reads degrade to the full
    * history scan, writes stay un-bucketed: one store, one layout).
    */
  private[streaming] def familyBucketsOf(
      spark: org.apache.spark.sql.SparkSession, familiesDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$familiesDir/$familyBucketsMarkerName")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val b = txt.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"family-bucket marker at $p is not an int: '$txt'"))
      require(b >= 1, s"family-bucket marker at $p holds $b (must be >= 1)")
      b
    }
  }

  /** Per-batch body of [[startFamilyAssign]] — the incremental family
    * lift ([[graft.ops.Similarity.assignFamiliesBatch]]) wired into the
    * gates' replay discipline: batch labels land under their OWN
    * `ingest_batch` partition of the family store (dynamic overwrite —
    * at-least-once replay replaces, never double-appends), the family
    * history a batch reads excludes its own id (`ingest_batch <
    * batchId`, so a crashed attempt's rows are invisible to its
    * replay), and the batch's vectors then file into the index via
    * [[graft.ops.Similarity.assignToIndex]] at `batchId + 1` (the
    * pq-ingest partition contract) so the NEXT batch sees them as
    * admitted members. The index reads inside the assignment are
    * bounded the same way (`ingest_batch < batchId + 1`). A crash
    * between the two writes replays cleanly: the monotone guard admits
    * a same-id retry and both writes are own-partition overwrites.
    */
  private[graft] def familyAssignBatch(
      indexDir: String, familiesDir: String, k: Int, nprobe: Int,
      minCos: Double, idxDim: Int)(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    requireMonotoneIngest(spark, familiesDir, batchId)
    requireMonotoneIngest(spark, s"$indexDir/assigned", batchId + 1)
    // knnServeBatch's validation discipline: an unscoreable vector
    // would be filed as a silent singleton (NULL cosines rank nowhere)
    // and poison the store permanently — refuse the batch loudly
    val chk = batch.agg(count(lit(1)).as("n"),
      count(col("embedding")).as("nn"),
      min(graft.ops.Similarity.dot("embedding", "embedding")).as("mn"),
      min(size(col("embedding"))).as("lo"),
      max(size(col("embedding"))).as("hi"),
      max(coalesce(exists(col("embedding"), _.isNull), lit(false))
        .cast("int")).as("nullElem")).head()
    require(chk.getLong(1) == chk.getLong(0) &&
        !chk.isNullAt(2) && chk.getDouble(2) > 0,
      "batch carries NULL or zero-norm embeddings — their cosines are " +
        "unscoreable and the assigned family would be an arbitrary " +
        "permanent singleton; filter or fix them upstream")
    require(chk.getInt(5) == 0,
      "batch carries NULL elements inside embeddings — graft_dot skips " +
        "null slots, silently deflating every edge cosine; fix upstream")
    require(chk.getInt(3) == chk.getInt(4) && chk.getInt(3) == idxDim,
      s"batch embeddings are ${chk.getInt(3)}..${chk.getInt(4)}-dim but " +
        s"the index at $indexDir holds $idxDim-dim vectors — cross-dim " +
        "cosines silently deflate; the stream and its index must share " +
        "one embedding space")
    // bucketed store (the seedFamilyStore marker): hand the anchor
    // join the bucket column so the scan prunes to the mutual ids'
    // buckets at the file level — per-batch history IO bounded by
    // |batch|·k touched buckets, not the admitted row count
    val famBuckets = familyBucketsOf(spark, familiesDir)
    val families0 = spark.read.parquet(familiesDir)
      .filter(col("ingest_batch") < batchId)
    val families =
      if (famBuckets > 0) families0.select("vec_id", "family", "fam_bucket")
      else families0.select("vec_id", "family")
    val out = graft.ops.Similarity.assignFamiliesBatch(spark, indexDir,
      families, batch, k = k, nprobe = nprobe, minCos = minCos,
      hintBroadcast = graft.ops.Similarity
        .batchBroadcastable(chk.getLong(0), idxDim),
      maxIngest = batchId + 1, familyBuckets = famBuckets)
    val outKeyed =
      if (famBuckets > 0)
        out.withColumn("fam_bucket",
            graft.ops.Similarity.familyBucketOf(col("vec_id"), famBuckets))
          .repartition(col("fam_bucket"))
      else out
    outKeyed.withColumn("ingest_batch", lit(batchId))
      .write.mode("overwrite")
      .partitionBy(
        (if (famBuckets > 0) Seq("fam_bucket") else Nil) ++ Seq("ingest_batch"): _*)
      .option("partitionOverwriteMode", "dynamic")
      .parquet(familiesDir)
    graft.ops.Similarity.assignToIndex(spark, indexDir, batch,
      ingestBatch = batchId + 1)
  }

  /** Streaming FAMILY ASSIGNMENT — completes the index lifecycle:
    * [[startPqIngestStream]] files new vectors, [[startKnnServe]]
    * answers queries, and this stream gives every newly ingested
    * vector its SEMANTIC FAMILY (the [[graft.ops.Similarity
    * .knnGraphFamilies]] label the leakage-free family split consumes)
    * without re-running the batch graph build. Per micro-batch:
    * mutual-kNN edges against the admitted members in the index at
    * `indexDir` (and within the batch), components through the shared
    * label-propagation loop, labels landing in `familiesDir` under
    * first-arrival-wins (an admitted label never changes; a vector
    * mutually tied to two families joins the smaller id — the stream
    * never merges existing families). Seed with [[seedFamilyStore]];
    * the stream refuses an unseeded store at START, not batch 0.
    * Batch cost is the knnJoinIvf contract (probed-cell file pruning,
    * |batch|-sized joins) plus the within-batch pair stage — backlog
    * corpora seed via the batch operator, they don't stream.
    */
  def startFamilyAssign(
      vectors: DataFrame,
      indexDir: String,
      familiesDir: String,
      checkpointDir: String,
      k: Int = 3,
      nprobe: Int = 4,
      minCos: Double = 0.3,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    require(k >= 1 && nprobe >= 1,
      s"k and nprobe must be >= 1 (got k=$k nprobe=$nprobe)")
    val spark = vectors.sparkSession
    val idxDim = graft.ops.Similarity.indexDim(spark, indexDir)
    require(storeNonEmpty(spark, familiesDir),
      s"family store at $familiesDir is empty — seed it with " +
        "seedFamilyStore (the stream assigns against admitted members " +
        "and cannot bootstrap itself)")
    vectors.writeStream
      .queryName("family_assign")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(Seq(familiesDir), compactEvery)(
        familyAssignBatch(indexDir, familiesDir, k, nprobe, minCos, idxDim)))
      .start()
  }

  /** [[auditLedgerBatch]] behind a streaming query; `docs` must carry
    * `doc_id` and `text` (plus `embedding` when `embStoreDir` is set).
    * Every configured static store — benchmark shingles
    * ([[buildBenchmarkShingleStore]] over the CLEANED benchmark, the
    * batch audit's contract), the bigram LM ([[buildLmStore]]), the
    * benchmark embeddings ([[buildBenchmarkEmbeddingStore]]) — is
    * loaded, validated, and persisted ONCE for the life of the query;
    * one foreachBatch then drives all nine stages per batch.
    */
  def startAuditStream(
      docs: DataFrame,
      storeRoot: String,
      checkpointDir: String,
      benchStoreDir: Option[String] = None,
      bloomStoreDir: Option[String] = None,
      shingleSize: Int = 3,
      lmStoreDir: Option[String] = None,
      lmMinAvgLogp: Double = -9.0,
      lmK: Double = 0.5,
      embStoreDir: Option[String] = None,
      semanticThreshold: Double = 0.9,
      classifierGate: Option[AuditClassifierGate] = None,
      semDeDupGate: Option[AuditSemDeDupGate] = None,
      queryTrigger: Trigger = Trigger.AvailableNow(),
      compactEvery: Option[Int] = None): StreamingQuery = {
    require(benchStoreDir.isEmpty || bloomStoreDir.isEmpty,
      "pass ONE decontamination store: the exact shingle store OR the bloom store")
    val spark = docs.sparkSession
    def pin(df: DataFrame): DataFrame =
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val gate: AuditGate = (benchStoreDir, bloomStoreDir) match {
      case (Some(dir), _) => AuditGate.Exact(
        pin(loadBenchStore(spark, dir, shingleSize)))
      case (_, Some(dir)) => AuditGate.Bloom(
        loadBloomStore(spark, dir, shingleSize))
      case _ => AuditGate.Off
    }
    val lmGate = lmStoreDir.map { dir =>
      val (cb, cu, v) = loadLmStore(spark, dir)
      AuditLmGate(pin(cb), pin(cu), v, lmMinAvgLogp, lmK)
    }
    val semanticGate = embStoreDir.map { dir =>
      val (bench, dim) = loadEmbeddingStore(spark, dir, None)
      AuditSemanticGate(pin(bench), dim, semanticThreshold)
    }
    docs.writeStream
      .queryName("audit_stream")
      .option("checkpointLocation", checkpointDir)
      .trigger(queryTrigger)
      .foreachBatch(maybeAutoCompact(
        Seq("ledger", "admitted", "hashes", "words", "vecs")
          .map(s => s"$storeRoot/$s"),
        compactEvery)(
        auditLedgerBatch(storeRoot, gate, shingleSize = shingleSize,
          lmGate = lmGate, semanticGate = semanticGate,
          classifierGate = classifierGate, semDeDupGate = semDeDupGate)))
      .start()
  }

  /** Streaming telemetry (replaces the reference's producer ack callback
    * logging offset/topic/partition/timestamp, KafkaStreaming.scala:245-276):
    * a StreamingQueryListener reporting per-batch rows, processing time and
    * watermark. Returns the listener so callers/tests can detach it.
    */
  def attachTelemetry(spark: SparkSession): StreamingQueryListener = {
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.err.println(s"[graft.streaming] started ${e.name} (${e.id})")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        System.err.println(
          s"[graft.streaming] ${e.progress.name} batch=${e.progress.batchId} " +
            s"rows=${e.progress.numInputRows} " +
            s"durationMs=${e.progress.durationMs.getOrDefault("triggerExecution", -1L)} " +
            s"watermark=${e.progress.eventTime.getOrDefault("watermark", "-")}")
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.err.println(s"[graft.streaming] terminated ${e.id} err=${e.exception.getOrElse("none")}")
    }
    spark.streams.addListener(listener)
    listener
  }
}
