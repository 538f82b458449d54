package graft

import org.apache.spark.sql.functions._

/** Aggregates — the HLL accuracy claim (Aggregates.scala `hllDistinct`)
  * and the sliding-window fan-out, asserted on the sf0.001 fixture.
  */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct is within 5% of exact per event_type (sf0.001)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = ev.groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.ops.Aggregates.hllDistinct.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"$k: approx $a vs exact $e")
    }
  }

  test("3-minute sliding window places each event in exactly 3 buckets") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val total = ev.count()
    val fanned = graft.ops.Aggregates.a6SlidingWindow.fn(spark, "/root/testdata/sf0.001")
      .agg(sum("n")).head.getLong(0)
    assert(fanned == 3 * total)
  }
}
