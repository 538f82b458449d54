package graft

import org.apache.spark.sql.functions._
import graft.ops.Sinks

/** Sinks K1-K8 — single-file writers, JSON record construction, producer
  * option profiles (SURVEY.md §2.2).
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("csvOverwriteSingle writes exactly one part file and overwrites prior content") {
    val dir = tmpDir("csv-ow") + "/out"
    Sinks.csvOverwriteSingle(Seq((1, "a"), (2, "b")).toDF("id", "s"), dir)
    Sinks.csvOverwriteSingle(Seq((9, "z")).toDF("id", "s"), dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val rows = spark.read.option("header", "true").csv(dir).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("9"))
  }

  test("csvAppendSingle accumulates one part file per call") {
    val dir = tmpDir("csv-ap") + "/out"
    Sinks.csvAppendSingle(Seq((1, "a")).toDF("id", "s"), dir)
    Sinks.csvAppendSingle(Seq((2, "b")).toDF("id", "s"), dir)
    val parts = new java.io.File(dir).listFiles.filter(_.getName.startsWith("part-"))
    assert(parts.length == 2)
    assert(spark.read.csv(dir).count() == 2)
  }

  test("kafkaShaped builds the exact JSON record the reference producer emitted") {
    // Reference: Jackson objectNode with 11 puts (KafkaStreaming.scala:228-238).
    val df = Seq((1001L, 42L, "Paris", 2, 187.5)).toDF("orderid", "customerid", "city", "numunit", "totalprice")
    val out = Sinks.kafkaShaped(df, col("orderid"),
      col("orderid"), col("customerid"), col("city"), col("numunit"), col("totalprice"))
    val r = out.head()
    assert(out.columns.toSeq == Seq("key", "value"))
    assert(r.getString(0) == "1001")
    assert(r.getString(1) ==
      """{"orderid":1001,"customerid":42,"city":"Paris","numunit":2,"totalprice":187.5}""")
  }

  test("k8_envelope_build formatting-equivalence preconditions hold on the fixture") {
    // The k8_envelope_build oracle pins exact wire bytes by assuming
    // DuckDB's double->VARCHAR cast equals Jackson's Double.toString.
    // That was verified empirically, and holds only while (a) every
    // o_totalprice renders WITHOUT exponent notation (both engines
    // agree on plain shortest decimal in [1e-3, 1e7) but spell
    // scientific notation differently), and (b) no string field
    // contains JSON-escapable characters (Jackson would escape them,
    // the oracle's string concatenation would not). Assert both on the
    // live fixture AND re-derive the envelope with the oracle's exact
    // recipe (Double.toString concatenation) against Spark's to_json
    // output, so a future fixture change or Jackson divergence fails
    // HERE with an attributable message; a spec-green oracle
    // hash-mismatch then isolates to the DuckDB side.
    val built = Sinks.k8EnvelopeBuild.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rows = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double"), col("o_orderpriority"))
      .collect()
    assert(rows.nonEmpty && built.size == rows.length)
    rows.foreach { r =>
      val (key, ck, st, price, pr) =
        (r.getLong(0).toString, r.getLong(1), r.getString(2), r.getDouble(3), r.getString(4))
      val ps = java.lang.Double.toString(price)
      assert(!ps.contains("E") && price >= 1e-3 && price < 1e7,
        s"o_totalprice $price renders as '$ps' — outside the plain-decimal range where " +
          "Double.toString and DuckDB's VARCHAR cast provably agree; re-verify the oracle")
      Seq(st, pr).foreach { v =>
        assert(v.forall(c => c >= 0x20 && c != '"' && c != '\\'),
          s"string field '$v' contains a JSON-escapable char — oracle concatenation diverges")
      }
      val expected =
        s"""{"o_custkey":$ck,"o_orderstatus":"$st","o_totalprice":$ps,"o_orderpriority":"$pr"}"""
      assert(built(key) == expected,
        s"Jackson envelope for key $key diverges from the oracle recipe:\n ${built(key)}\n $expected")
    }
  }

  test("to_json/from_json round-trip is lossless (K8 query body)") {
    val out = Sinks.k8JsonParse.fn(spark, "/root/testdata/sf0.001")
    val orig = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"), col("o_orderpriority"))
      .orderBy("o_orderkey")
    assert(out.except(orig).isEmpty && orig.except(out).isEmpty)
  }

  test("date-partitioned parquet sink enables partition pruning") {
    val dir = tmpDir("pqpart") + "/out"
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    Sinks.parquetPartitionedByDay(ev, "ts", dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == ev.count())
    val days = new java.io.File(dir).listFiles.filter(_.getName.startsWith("event_date=")).map(_.getName)
    assert(days.length > 1)
    // a day-filtered read prunes to that partition (plan-level filter,
    // and the row count matches reading the partition directory directly)
    val oneDay = days.head.stripPrefix("event_date=")
    val pruned = back.filter(col("event_date") === oneDay)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
    assert(pruned.count() == spark.read.parquet(s"$dir/event_date=$oneDay").count())
  }

  test("bucketed tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast path
    try {
      Sinks.writeBucketed(Tables.orders(spark, d), "orders_b", "o_orderkey", 8)
      Sinks.writeBucketed(
        Tables.lineitem(spark, d).select("l_orderkey", "l_quantity"), "lineitem_b", "l_orderkey", 8)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, d).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("format round-trips equal the parquet-side aggregate; store writes once per (dir, fmt)") {
    val d = "/root/testdata/sf0.001"
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val orc = key(Sinks.k9OrcRoundtrip.fn(spark, d))
    val direct = key(Tables.orders(spark, d)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .orderBy("o_orderstatus"))
    assert(orc == direct)
    val jsonl = key(Sinks.k10JsonlRoundtrip.fn(spark, d))
    val directJ = key(Tables.customer(spark, d)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("c_mktsegment"))
    assert(jsonl == directJ)
    // memoized store: a second build must not re-write (same file listing)
    // THIS process's scratch dir only — a stale graft-fmt-* left by a
    // killed earlier JVM must not be the one we observe
    val scratch = new java.io.File(sys.props("java.io.tmpdir"))
      .listFiles().filter(f => f.getName.startsWith("graft-fmt-") &&
        f.getName.endsWith("-" + ProcessHandle.current.pid)).head
    def listing() = {
      def walk(f: java.io.File): Seq[(String, Long)] =
        if (f.isDirectory) Option(f.listFiles).toSeq.flatten.flatMap(walk)
        else Seq(f.getPath -> f.lastModified)
      walk(scratch).sortBy(_._1)
    }
    val before = listing()
    Sinks.k9OrcRoundtrip.fn(spark, d).collect()
    assert(listing() == before, "second run re-wrote the round-trip store")
  }

  test("producer profiles: idempotent adds exactly-once params; prod-tuned adds batching") {
    val alo = Sinks.kafkaAtLeastOnceOptions("b:9092", "t")
    assert(alo("kafka.acks") == "all" && !alo.contains("kafka.enable.idempotence"))
    val eo = Sinks.kafkaExactlyOnceOptions("b:9092", "t")
    assert(eo("kafka.enable.idempotence") == "true" && eo("kafka.retries") == "3")
    val pt = Sinks.kafkaProdTunedOptions("b:9092", "t")
    assert(pt("kafka.batch.size") == "16384" && pt("kafka.linger.ms") == "100" &&
      pt("kafka.compression.type") == "gzip")
  }
}
