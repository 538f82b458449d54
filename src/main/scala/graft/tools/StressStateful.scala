package graft.tools

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{Event, PackInput, Stateful}

/** transformWithState state-store footprint at k× (dev-only): the one
  * streaming family whose scale behavior was asserted rather than
  * measured. Drives the three RocksDB-backed StatefulProcessor forms —
  * per-user sessionizer, per-user funnel, 256-shard packer — over the
  * events/documents fixtures replicated k× with SHIFTED user/doc ids,
  * so state-key cardinality scales with the corpus (the dimension that
  * matters at 100 TB: state is per-KEY, not per-event). Each run is a
  * real multi-batch stream (time-ranged parquet files, one file per
  * trigger, event-time watermark advancing batch to batch so timers
  * fire), sunk to noop; metrics come from StreamingQueryProgress's
  * stateOperators (rows in state, in-memory bytes) plus a filesystem
  * walk of the checkpoint's state/ dir (the durable RocksDB footprint —
  * what an executor restore actually downloads). Prints the markdown
  * table committed in SCALING.md.
  *
  * What the shapes should show:
  *  - sessionizer/funnel state rows ~ distinct users (k×), bytes/key
  *    FLAT in k — per-key state is a fixed-size struct + timer;
  *  - packer state rows = min(shards, keys) CONSTANT in k — the shard
  *    count bounds state no matter the corpus (its scale story);
  *  - per-batch latency grows with batch SIZE, not with accumulated
  *    state (RocksDB point lookups, no full-store scans per batch).
  */
object StressStateful {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copiesList = sys.env.getOrElse("SPARK_GRAFT_STRESS_COPIES_LIST", "1,30")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-stress-state").toString
    def dirBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(p))
    }

    case class Res(form: String, k: Int, rowsIn: Long, keys: Long, batches: Int,
        stateRows: Long, memBytes: Long, ckptStateBytes: Long,
        meanBatchMs: Long, maxBatchMs: Long)
    val results = scala.collection.mutable.ArrayBuffer.empty[Res]

    def run(form: String, k: Int, src: String, rowsIn: Long, keys: Long)(
        start: (org.apache.spark.sql.DataFrame, String) =>
          org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val ckpt = s"$tmp/ckpt-$form-$k"
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
      val q = start(stream, ckpt)
      q.awaitTermination()
      val progs = q.recentProgress.filter(_.numInputRows > 0)
      val so = progs.flatMap(_.stateOperators).lastOption
      val durs = progs.map(_.durationMs.get("triggerExecution").toLong)
      results += Res(form, k, rowsIn, keys, progs.length,
        so.map(_.numRowsTotal).getOrElse(-1L),
        so.map(_.memoryUsedBytes).getOrElse(-1L),
        dirBytes(s"$ckpt/state"),
        if (durs.isEmpty) -1 else durs.sum / durs.length,
        if (durs.isEmpty) -1 else durs.max)
      println(s"[stress] done $form k=$k")
    }

    copiesList.foreach { k =>
      // k shifted copies: same per-user event shapes, k× the key space
      // cast ts to TIMESTAMP (LTZ): the fixture surfaces NTZ through the
      // nanos conversion, and event-time watermarks require TIMESTAMP;
      // casting BEFORE the parquet write makes the streaming re-read
      // carry the right type too
      val ev = graft.Tables.events(spark, sfDir)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("ts", col("ts").cast("timestamp"))
      val scaledEv = (0 until k).map(c => ev
          .withColumn("user_id", col("user_id") + lit(c * 10000000L))
          .withColumn("event_id", col("event_id") + lit(c * 1000000000L)))
        .reduce(_ unionByName _)
      val evSrc = s"$tmp/events-$k"
      // 8 time-ranged files -> 8 triggers with an advancing watermark
      scaledEv.repartitionByRange(8, col("ts")).sortWithinPartitions("ts")
        .write.mode("overwrite").parquet(evSrc)
      val nEv = spark.read.parquet(evSrc).count()
      val nUsers = spark.read.parquet(evSrc).select("user_id").distinct().count()

      run("sessionizer_tws", k, evSrc, nEv, nUsers) { (df, ckpt) =>
        Stateful.sessionizeWithStateTws(df.as[Event])
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
      }
      run("funnel_tws", k, evSrc, nEv, nUsers) { (df, ckpt) =>
        Stateful.funnelStreamTws(df.as[Event])
          .writeStream.outputMode("update").format("noop")
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
      }

      val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
      val scaledDocs = (0 until k).map(c => docs
          .withColumn("doc_id", col("doc_id") + lit(c * 10000000L)))
        .reduce(_ unionByName _)
      val docSrc = s"$tmp/docs-$k"
      scaledDocs.repartition(8).write.mode("overwrite").parquet(docSrc)
      val nDocs = spark.read.parquet(docSrc).count()
      run("packer_tws", k, docSrc, nDocs, 256L) { (df, ckpt) =>
        Stateful.packStreamTws(df.as[PackInput])
          .writeStream.outputMode("append").format("noop")
          .option("checkpointLocation", ckpt).trigger(Trigger.AvailableNow()).start()
      }
    }

    println("\n| form | k | rows_in | keys | batches | state_rows | state_mem_mb | ckpt_state_mb | b/state_row | mean_batch_ms | max_batch_ms |")
    println("|---|---|---|---|---|---|---|---|---|---|---|")
    results.foreach { r =>
      val bytesPerRow =
        if (r.stateRows > 0) f"${r.ckptStateBytes.toDouble / r.stateRows}%.0f" else "-"
      println(f"| ${r.form} | ${r.k} | ${r.rowsIn} | ${r.keys} | ${r.batches} " +
        f"| ${r.stateRows} | ${r.memBytes / 1048576.0}%.1f | ${r.ckptStateBytes / 1048576.0}%.1f " +
        f"| $bytesPerRow | ${r.meanBatchMs} | ${r.maxBatchMs} |")
    }
    spark.stop()
  }
}
