package graft.streaming

import graft.SparkSpec
import graft.ops.Sinks
import org.apache.spark.sql.functions._

/** END-TO-END Kafka integration — the executable form of S1/S2/K1-K4.
  *
  * Skipped by default: this build environment has no broker and no
  * connector jar (zero egress). On a machine with both, run:
  *
  *   SPARK_GRAFT_KAFKA_BROKER=localhost:9092 \
  *     SPARK_GRAFT_WITH_KAFKA=1 sbt "testOnly graft.streaming.KafkaIntegrationSpec"
  *
  * (or put `spark-sql-kafka-0-10_2.13:4.1.2` on the classpath any other
  * way — the code below touches the connector only through the
  * string-based `format("kafka")` API, so it compiles without it).
  *
  * The round trip exercises the full production path: batch write through
  * [[Sinks.kafkaShaped]] + the at-least-once producer profile, then a
  * streaming read through [[Sources.kafka]] with an AvailableNow trigger,
  * decoded by [[Sources.decodeEventJson]] — i.e. the reference's
  * producer→consumer loop (KafkaStreaming.scala:158-187 →
  * ConsommationStreaming.scala:56-106) as one test.
  */
class KafkaIntegrationSpec extends SparkSpec {

  private val broker = sys.env.get("SPARK_GRAFT_KAFKA_BROKER")

  private def brokerTest(name: String)(body: String => Unit): Unit =
    broker match {
      case Some(b) => test(name)(body(b))
      case None    => ignore(name + " [set SPARK_GRAFT_KAFKA_BROKER to enable]")(())
    }

  brokerTest("streaming kafka sink: checkpointed produce, then streamed read-back") { b =>
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val topic = s"graft_sink_it_${System.currentTimeMillis()}"
    val ms = MemoryStream[(Long, String)](spark)(
      org.apache.spark.sql.Encoders.product[(Long, String)])
    ms.addData(Seq((1L, "alpha"), (2L, "beta")))
    val producer = Sinks.kafkaShaped(ms.toDF().toDF("id", "word"),
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("word"))
      .writeStream
      .format("kafka")
      .options(Sinks.kafkaExactlyOnceOptions(b, topic))
      .option("checkpointLocation", tmpDir("kafka-sink-ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    try producer.awaitTermination(60000L)
    finally producer.stop()
    val reader = Sources.kafka(spark, b, Seq(topic))
      .selectExpr("CAST(value AS STRING) AS v").writeStream
      .outputMode("append").queryName("kafka_sink_roundtrip").format("memory")
      .trigger(Trigger.AvailableNow()).start()
    try {
      reader.awaitTermination(60000L)
      val got = spark.table("kafka_sink_roundtrip").collect().map(_.getString(0)).toSet
      assert(got.exists(_.contains("alpha")) && got.exists(_.contains("beta")))
    } finally reader.stop()
  }

  brokerTest("kafka round trip: shaped batch write, streamed read, json decode") { b =>
    import org.apache.spark.sql.streaming.Trigger
    val topic = s"graft_it_${System.currentTimeMillis()}"
    val in = eventsDf(Seq(
      (1L, "2026-01-01 00:00:00", 10L, "click", 1.5, "{}"),
      (2L, "2026-01-01 00:00:01", 11L, "view", 2.5, "{}")))
    Sinks.writeKafka(
      Sinks.kafkaShaped(in, col("event_id"),
        col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("props")),
      Sinks.kafkaAtLeastOnceOptions(b, topic))
    val q = Sources.decodeEventJson(
      Sources.kafka(spark, b, Seq(topic))).writeStream
      .outputMode("append")
      .queryName("kafka_roundtrip")
      .format("memory")
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000L)
      val got = spark.table("kafka_roundtrip")
        .select("event_id", "event_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
      assert(got == Set(1L -> "click", 2L -> "view"))
    } finally q.stop()
  }
}
