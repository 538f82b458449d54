package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Sinks — SURVEY.md §2.2 (K1-K8), batch + streaming-shared.
  *
  * The reference's output surface is: CSV overwrite (empty-batch marker,
  * IndicateursStreaming.scala:66-75), CSV append (the KPI product,
  * IndicateursStreaming.scala:84-88), console echo, and three Kafka
  * producer profiles (KafkaStreaming.scala:158-187, ProducerKafa_Prod
  * .scala:58-69) fed with hand-built Jackson JSON records
  * (KafkaStreaming.scala:223-243). Here the record construction is
  * `to_json(struct(...))` (codegen'd, no driver-side object churn) and the
  * producer profiles become kafka-sink option maps.
  */
object Sinks {

  /** K5 + P1 — single-file CSV overwrite (reference:
    * `coalesce(1).write...Overwrite`, IndicateursStreaming.scala:66-75).
    * `coalesce(1)` is narrow — it folds existing partitions without a
    * shuffle, which is exactly right for the tiny marker/summary frames
    * this is meant for; NEVER use on a large result (single-task write).
    */
  def csvOverwriteSingle(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K6 + P2 — single-file CSV append (reference:
    * `repartition(1).write...Append`, IndicateursStreaming.scala:84-88).
    * `repartition(1)` shuffles so upstream stages keep their parallelism
    * and only the final write is single-task — the reference's own comment
    * (:71) prefers it over coalesce for non-trivial output. Append mode
    * lets successive micro-batches accumulate files under one directory.
    */
  def csvAppendSingle(df: DataFrame, path: String): Unit =
    df.repartition(1).write.mode("append").option("header", "false").csv(path)

  /** K7 — console sink (reference: `df.show()`,
    * ConsommationStreaming.scala:92; record printf KafkaStreaming.scala:123-127).
    */
  def console(df: DataFrame, numRows: Int = 20): Unit =
    df.show(numRows, truncate = false)

  /** K8 — Kafka-record construction: `to_json(struct(...))` replaces the
    * reference's driver-side Jackson objectNode building
    * (KafkaStreaming.scala:223-243). Runs inside whole-stage codegen on
    * executors — at 100 TB there is no per-record driver object churn.
    */
  def kafkaShaped(df: DataFrame, key: Column, valueCols: Column*): DataFrame =
    df.select(
      key.cast("string").as("key"),
      to_json(struct(valueCols: _*)).as("value"))

  /** K1 — at-least-once producer profile (reference:
    * KafkaStreaming.scala:158-167: acks=all, no idempotence). Keys are the
    * structured-streaming kafka sink's passthrough options.
    */
  def kafkaAtLeastOnceOptions(bootstrap: String, topic: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "topic" -> topic,
    "kafka.acks" -> "all")

  /** K2 — idempotent/exactly-once producer profile (reference:
    * KafkaStreaming.scala:170-187: enable.idempotence, retries=3,
    * max.in.flight=3, min.insync.replicas=2, acks=all). Combined with a
    * streaming checkpoint this is Spark's effectively-once kafka write;
    * the reference's ack-callback telemetry (:245-276) is covered by
    * [[graft.streaming.Jobs.attachTelemetry]].
    */
  def kafkaExactlyOnceOptions(bootstrap: String, topic: String): Map[String, String] =
    kafkaAtLeastOnceOptions(bootstrap, topic) ++ Map(
      "kafka.enable.idempotence" -> "true",
      "kafka.retries" -> "3",
      "kafka.max.in.flight.requests.per.connection" -> "3")

  /** K3 — prod-tuned batching profile (reference:
    * ProducerKafa_Prod.scala:63-65: batch.size=16384, linger.ms=100, gzip).
    */
  def kafkaProdTunedOptions(bootstrap: String, topic: String): Map[String, String] =
    kafkaExactlyOnceOptions(bootstrap, topic) ++ Map(
      "kafka.batch.size" -> "16384",
      "kafka.linger.ms" -> "100",
      "kafka.compression.type" -> "gzip")

  /** K4 — batch write to kafka (the foreachBatch body replacing the
    * reference's per-partition producer pattern,
    * TwitterKafkaStreaming.scala:196-211: Spark's kafka sink already opens
    * one producer per task, cached across batches — the exact resource
    * shape the reference hand-rolled). Requires the spark-sql-kafka
    * connector on the cluster classpath (not in this build env).
    */
  def writeKafka(shaped: DataFrame, options: Map[String, String]): Unit =
    shaped.write.format("kafka").options(options).save()

  /** Date-partitioned parquet sink — the 100 TB output default: one
    * directory per day, so downstream readers prune partitions at plan
    * time (`WHERE event_date = X` never lists other days) and retention
    * drops whole directories. The reference wrote flat CSV
    * (IndicateursStreaming.scala:84-88); this is its warehouse-grade
    * replacement.
    */
  def parquetPartitionedByDay(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.partitionBy("event_date").mode("append").parquet(path)

  /** Bucketed table write: pre-shuffle a table ONCE on its join key so
    * every future equi-join on that key is exchange-free (the plan shows
    * no ShuffleExchange on bucketed sides). The amortization that makes
    * repeated fact⋈fact joins viable at 100 TB: pay the shuffle at write
    * time, never at read time. Requires the session catalog
    * (saveAsTable) — bucket metadata lives in the metastore.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int = 32): Unit =
    // repartition ALIGNED with the bucket hash (repartition's
    // hashpartitioning and the bucket-id expression are the same
    // pmod(murmur3, n)), so each write task holds exactly one bucket
    // and every bucket lands in ONE file: deterministic layout, no
    // small-file fan-out from multi-partition writers, and the
    // single-file precondition for sorted-scan recognition on engines
    // that honor sortBy metadata (Spark 3+ ignores it at read time
    // unless spark.sql.legacy.bucketedTableScan.outputOrdering is set,
    // so a merge join still runs a per-partition O(n) pass over these
    // already-sorted runs — the exchange, not that sort, is the
    // 100 TB cost the bucketing removes).
    df.repartition(numBuckets, col(bucketCol))
      .write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Small-file compaction: rewrite a directory into ~`targetMB`-sized
    * files. Streaming CSV/parquet appends produce one file per
    * micro-batch; at 100 TB uncompacted output murders every downstream
    * scan (file-open dominated). Row-count-proportional repartition
    * approximates the size target without a pre-pass over byte sizes.
    */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      targetMB: Int = 128): Unit = {
    val df = spark.read.parquet(dir)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = math.max(1, (bytes / (targetMB.toLong << 20)).toInt)
    val tmp = dir + "_compacting"
    df.repartition(parts).write.mode("overwrite").parquet(tmp)
    // atomic-ish swap (same filesystem rename)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(dir)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  // ------------------------------------------------------------------
  // Verifiable query surface
  // ------------------------------------------------------------------

  /** K8 as a verifiable query: order events shaped into Kafka records —
    * the 11-field order JSON the reference producers emit
    * (KafkaStreaming.scala:228-238) projected from `orders`, then parsed
    * back and compared against the identity projection. A lossless
    * round-trip proves the record construction preserves every value.
    * (The literal JSON string is asserted in ScalaTest AND hash-pinned
    * cross-engine by [[k8EnvelopeBuild]]; this row's oracle compares the
    * round-tripped typed values.)
    *
    * Measurement contract (same as K9/K10): the shaped (key, value)
    * envelope is built ONCE into the write-once format store — the
    * producer's cost, timed as its own row ([[k8EnvelopeBuild]]) — so
    * THIS row times the consumer's side only: scan the stored records
    * and `from_json`-parse them back (hence the name `k8_json_parse`;
    * the r11 name `k8_to_json_roundtrip` claimed a roundtrip while
    * timing half of one). Before this split the window spent most of
    * its time re-generating the envelope it was about to parse, which
    * measured neither side honestly. from_json deliberately parses
    * strings that really went through to_json (no from_json(to_json(..))
    * elision) — a hash match against the plain-orders oracle proves
    * the stored envelope preserved every value.
    */
  val k8JsonParse = QueryDef(
    "k8_json_parse",
    """SELECT o_orderkey, o_custkey, o_orderstatus,
      |       CAST(o_totalprice AS DOUBLE) AS o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin)(
    (s, d) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Array(
        StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType),
        StructField("o_orderpriority", StringType)))
      val dir = roundTripDir(d, "kafka8")(out =>
        kafkaShaped(
          Tables.orders(s, d),
          col("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice").cast("double").as("o_totalprice"), col("o_orderpriority"))
          .write.mode("overwrite").parquet(out))
      s.read.parquet(dir)
        .select(col("key").cast("long").as("o_orderkey"),
          from_json(col("value"), schema).as("v"))
        .select(col("o_orderkey"), col("v.*"))
        .orderBy("o_orderkey")
    })

  /** The producer side of K8 as its own timed, hash-verified row: build
    * the (key, value) Kafka envelope — string key + to_json(struct)
    * value — over every order, with NO store write and NO parse-back,
    * so its bench window is exactly the envelope-construction cost that
    * [[k8JsonParse]]'s window deliberately excludes (the r11 verdict's
    * ask: the store build was warmup-hidden and unrecorded).
    *
    * The oracle re-derives Spark's LITERAL JSON bytes by string
    * concatenation: field order is the struct's, longs render
    * identically, and the one double (o_totalprice) formats the same in
    * Jackson (Double.toString) and DuckDB's VARCHAR cast — shortest
    * decimal repr, verified value-for-value over the full sf0.01 orders
    * table (15000/15000 identical) before this row was registered. A
    * hash match therefore pins the exact wire bytes, not just parsed
    * values. (TPC-H string domains contain no JSON-escapable chars;
    * [[kafkaShaped]] is not otherwise constrained.)
    */
  val k8EnvelopeBuild = QueryDef(
    "k8_envelope_build",
    """SELECT CAST(o_orderkey AS VARCHAR) AS key,
      |       '{"o_custkey":' || o_custkey ||
      |       ',"o_orderstatus":"' || o_orderstatus ||
      |       '","o_totalprice":' || CAST(o_totalprice AS VARCHAR) ||
      |       ',"o_orderpriority":"' || o_orderpriority || '"}' AS value
      |FROM orders ORDER BY key""".stripMargin)(
    (s, d) => kafkaShaped(
      Tables.orders(s, d),
      col("o_orderkey"),
      col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice").cast("double").as("o_totalprice"), col("o_orderpriority"))
      .orderBy("key"))

  /** Per-(session, data dir) bucketed fact-table pair for
    * [[bucketedJoinQuery]] — the write-once amortization
    * [[writeBucketed]] promises, realized as a store the registered
    * query can measure against: orders and lineitem land ONCE,
    * bucketed AND sorted by the join key into the session catalog, and
    * every later join on that key is exchange-free. Memo key includes
    * the session (tables live in a session catalog; a fresh session
    * must rebuild) — same keyed-thunk shape as [[roundTripDir]].
    */
  // weak-keyed on the SparkSession itself, NOT identityHashCode: a hash
  // key never evicts entries for stopped sessions (leak in long-lived
  // JVMs) and a GC'd session's identity hash can be REUSED by a new
  // SparkSession, serving cached table names that don't exist in the
  // new session's in-memory catalog. WeakHashMap drops the entry with
  // the session; distinct live sessions can never collide.
  private val bucketedPairs =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, () => (String, String)]]()

  def bucketedJoinTables(
      spark: org.apache.spark.sql.SparkSession, sfDir: String): (String, String) = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val perSession = bucketedPairs.synchronized {
      var m = bucketedPairs.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, () => (String, String)]()
        bucketedPairs.put(spark, m)
      }
      m
    }
    val holder = perSession.computeIfAbsent(digest, _ => {
      lazy val pair: (String, String) = {
        val o = s"orders_bkt_$digest"
        val l = s"lineitem_bkt_$digest"
        // the warehouse DIRECTORY outlives the in-memory catalog: a
        // previous process' table location would fail this process'
        // overwrite (LOCATION_ALREADY_EXISTS) because the catalog entry
        // it belongs to died with that session — drop both the entry
        // and any stale location first
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        Seq(o, l).foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS $t")
          val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
          p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
        }
        writeBucketed(
          Tables.orders(spark, sfDir).select("o_orderkey", "o_orderpriority"),
          o, "o_orderkey")
        writeBucketed(
          Tables.lineitem(spark, sfDir)
            .select("l_orderkey", "l_extendedprice", "l_discount"),
          l, "l_orderkey")
        (o, l)
      }
      () => pair
    })
    val built = holder()
    // Replace the builder thunk with a strings-only closure once built:
    // the builder closes over `spark`, and a WeakHashMap value that
    // (transitively) strongly references its own key pins the entry
    // forever — the documented WeakHashMap pitfall, which would undo the
    // stopped-session eviction this map exists for. Racers that got the
    // same builder all evaluate the same lazy val; the put is idempotent.
    perSession.put(digest, () => built)
    built
  }

  /** House revenue aggregate (the q_join_revenue_by_nation spelling:
    * cast the exactly-2-decimal INPUTS to DECIMAL before the multiply,
    * so the product is exact and no half-cent rounding-mode divergence
    * between engines can arise) — ONE definition shared by the
    * registered bucketed-join query and Bench's warm slice, so the
    * warmup can never silently warm a different codegen shape than the
    * timed window exercises.
    */
  private[graft] def revenueAgg: Column =
    sum(col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)")))

  /** The join bucketing exists FOR, as a hash-verified row: revenue per
    * order priority over the fact⋈fact join (lineitem ⋈ orders on
    * orderkey) read from the bucketed tables. Both sides are bucketed
    * and sorted by the join key, so the sort-merge join (pinned by the
    * merge hint — at fixture scale AQE would otherwise broadcast the
    * orders side and the demonstration would be vacuous) needs NO
    * exchange on either input: the only shuffle in the plan is the
    * 5-row priority rollup's (plan-contract-enforced; the residual
    * per-partition Sort over already-sorted single-file buckets is
    * accepted — the contract test's note explains why Spark 3+ leaves
    * it). That is
    * the 100 TB amortization in one artifact — pay the shuffle once at
    * write time, never per query. The oracle replays the same join +
    * DECIMAL-per-item revenue over the plain parquet, so a hash match
    * also proves the bucketed write/read pair preserved every row.
    */
  val bucketedJoinQuery = QueryDef(
    "q_bucketed_join_revenue",
    """SELECT o_orderpriority, count(*) AS n_items,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY 1""".stripMargin)(
    (s, d) => {
      val (o, l) = bucketedJoinTables(s, d)
      s.table(l).hint("merge")
        .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          revenueAgg.cast("double").as("revenue"))
        .orderBy("o_orderpriority")
    })

  // ------------------------------------------------- format round-trips

  /** Pid-scoped scratch root for format round-trip stores, removed on
    * JVM exit — same lifecycle/ownership contract as the multimodal
    * asset store (Multimodal.assetScratchDir).
    */
  private lazy val formatScratchDir: String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-fmt-${sys.props.getOrElse("user.name", "anon")}-" +
        ProcessHandle.current.pid)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }))
    dir.toString
  }

  private val formatDirs =
    new java.util.concurrent.ConcurrentHashMap[String, () => String]()

  /** Write-once store per (data dir, format): the first caller runs
    * `write` into a collision-proof keyed directory (SHA-256 of the full
    * source path — same rationale as Multimodal.storeKey), later callers
    * reuse it. The memoized-thunk shape keeps the map's bin lock from
    * being held across a Spark write job.
    */
  private def roundTripDir(sfDir: String, fmt: String)(write: String => Unit): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val base = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val holder = formatDirs.computeIfAbsent(s"$fmt-$base-$digest", key => {
      lazy val dir: String = {
        val d = s"$formatScratchDir/$key"
        write(d)
        d
      }
      () => dir
    })
    holder()
  }

  /** K9 — ORC round-trip: `orders` written to ORC (Spark's built-in
    * columnar alternative to parquet; zlib by default here), read back,
    * and aggregated. The oracle runs the same aggregate over the
    * original parquet, so a hash match proves the ORC writer/reader pair
    * preserves every long/double/string value bit-for-bit. Money sums go
    * through DECIMAL(18,2) per the house convention (double summation is
    * partition-order-dependent; decimal is exact and commutative).
    *
    * Measurement contract: the store is write-once per process, so a
    * timed run measures READ + aggregate over the stored copy — Bench
    * builds the store in its warm-up (fmt_store) so every pass,
    * including retries, measures that same workload rather than pass 1
    * paying the write and later passes not.
    */
  val k9OrcRoundtrip = QueryDef(
    "k9_orc_roundtrip",
    """SELECT o_orderstatus, count(*) AS n,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)(
    (s, d) => {
      val dir = roundTripDir(d, "orc")(out =>
        Tables.orders(s, d).write.mode("overwrite").orc(out))
      s.read.orc(dir)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy("o_orderstatus")
    })

  /** K10 — JSON-lines round-trip: `customer` projected, written as
    * newline-delimited JSON (the interchange format scraped corpora
    * actually arrive in), read back with an EXPLICIT schema (schema
    * inference on a 100 TB JSON corpus is a full extra scan — never
    * rely on it), and aggregated. Spark writes doubles in
    * shortest-round-trip form, so parse-back is value-exact and the
    * parquet-side oracle hash-matches.
    */
  val k10JsonlRoundtrip = QueryDef(
    "k10_jsonl_roundtrip",
    """SELECT c_mktsegment, count(*) AS n,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)(
    (s, d) => {
      import org.apache.spark.sql.types._
      val dir = roundTripDir(d, "jsonl")(out =>
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
          .write.mode("overwrite").json(out))
      val schema = StructType(Array(
        StructField("c_custkey", LongType),
        StructField("c_mktsegment", StringType),
        StructField("c_acctbal", DoubleType)))
      s.read.schema(schema).json(dir)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
        .orderBy("c_mktsegment")
    })

  val all: Seq[QueryDef] = Seq(k8JsonParse, k8EnvelopeBuild, bucketedJoinQuery, k9OrcRoundtrip, k10JsonlRoundtrip)
}
