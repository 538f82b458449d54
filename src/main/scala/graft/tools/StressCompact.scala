package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.streaming.Jobs

/** Small-files compaction evidence (dev-only): build the streaming HLL
  * sketch store the way a long-running stream does — one ingest_batch
  * partition (and one file per written shuffle partition) per
  * micro-batch — then measure what the partition/file pileup costs a
  * reader and what one [[graft.streaming.Jobs.compactIngestStore]]
  * call buys back. The row MULTISET is asserted byte-identical
  * before/after (compaction moves rows, never changes them), so the
  * table is pure IO/metadata cost; the estimate-drift column shows how
  * far the order-sensitive HLL union estimate moves when file merge
  * reorders it (within the sketch's error bounds, ≤1% observed).
  * Prints the markdown table committed in SCALING.md's streaming
  * section.
  *
  * Knobs: `SPARK_GRAFT_SF_DIR` (default sf0.1),
  * `SPARK_GRAFT_COMPACT_BATCHES` (comma list, default "128,512").
  */
object StressCompact {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batchCounts = sys.env.getOrElse("SPARK_GRAFT_COMPACT_BATCHES", "128,512")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id").cache()
    val n = events.count()
    println(s"events: $n rows from $sfDir")
    println("| batches | files | parts | estimates read (s) | compact (s) | files after | parts after | read after (s) | est drift max |")
    println("|---|---|---|---|---|---|---|---|---|")
    batchCounts.foreach { b =>
      val store = s"/tmp/graft-stress-compact-$b"
      val root = new org.apache.hadoop.fs.Path(store)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(root, true)
      (0 until b).foreach { i =>
        Jobs.sketchStoreBatch(store)(
          events.filter(pmod(col("event_id"), lit(b)) === i), i.toLong)
      }
      def files(): Long = {
        val it = fs.listFiles(root, true); var k = 0L
        while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) k += 1
        k
      }
      def parts(): Int =
        fs.listStatus(root).count(_.getPath.getName.startsWith("ingest_batch="))
      def estimates(): Map[String, Long] =
        Jobs.sketchStoreDailyEstimates(spark, store)
          .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
      // the invariant compaction promises: the ROW multiset is
      // byte-identical (estimates may wiggle within the sketch's error
      // bounds because file merge changes HLL union order)
      def rowMultiset(): Seq[(String, String)] =
        spark.read.parquet(store).select("day", "sketch").collect()
          .map(r => (r.getDate(0).toString,
            java.util.Base64.getEncoder.encodeToString(r.getAs[Array[Byte]](1))))
          .sorted.toSeq
      val fB = files(); val pB = parts()
      val rowsBefore = rowMultiset()
      val (e1, tB) = timed(estimates())
      val (_, tC) = timed(Jobs.compactIngestStore(spark, store))
      val fA = files(); val pA = parts()
      val (e2, tA) = timed(estimates())
      require(rowMultiset() == rowsBefore, "compaction changed the row multiset")
      val drift = e1.map { case (d, v) =>
        math.abs(v - e2(d)).toDouble / math.max(1L, v) }.max
      println(f"| $b | $fB | $pB | $tB%.2f | $tC%.2f | $fA | $pA | $tA%.2f | $drift%.4f |")
      fs.delete(root, true)
    }

    // Second section: the steady-state cost of stream self-maintenance —
    // the same B-batch ingest, bare vs wrapped in withAutoCompaction
    // (resolve probe every batch + one in-line compaction per cadence).
    val b = batchCounts.head
    val cadence = sys.env.getOrElse("SPARK_GRAFT_COMPACT_CADENCE", "16").toInt
    println(s"\nself-maintenance overhead at $b batches, cadence $cadence:")
    println("| mode | ingest wall (s) | final parts | final files |")
    println("|---|---|---|---|")
    Seq("bare" -> None, s"compactEvery=$cadence" -> Some(cadence)).foreach {
      case (tag, every) =>
        val store = s"/tmp/graft-stress-autocompact-$tag".replace("=", "")
        val root = new org.apache.hadoop.fs.Path(store)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(root, true)
        val body: (org.apache.spark.sql.DataFrame, Long) => Unit =
          every.fold(Jobs.sketchStoreBatch(store) _)(n =>
            Jobs.withAutoCompaction(Seq(store), n)(Jobs.sketchStoreBatch(store)))
        val (_, t) = timed((0 until b).foreach { i =>
          body(events.filter(pmod(col("event_id"), lit(b)) === i), i.toLong)
        })
        def files(): Long = {
          val it = fs.listFiles(root, true); var k = 0L
          while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) k += 1
          k
        }
        val parts = fs.listStatus(root)
          .count(_.getPath.getName.startsWith("ingest_batch="))
        println(f"| $tag | $t%.1f | $parts | ${files()} |")
        fs.delete(root, true)
    }
    spark.stop()
  }
}
