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

  test("approx_percentile tracks the exact percentile per event_type (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val exact = graft.ops.Aggregates.percentiles.fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val approx = graft.ops.Aggregates.approxPercentiles.fn(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=10000 on a few-thousand-row group → rank error ≤ 1 row, so
    // the RIGHT bound is rank-space, not value-space: the estimate (an
    // observed value) must sit between the exact quantiles one step either
    // side. A value-space tolerance would couple the test to tail density
    // (adjacent observed values near p95 can be several % apart).
    val brackets = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.48)").as("lo50"), expr("percentile(value, 0.52)").as("hi50"),
        expr("percentile(value, 0.93)").as("lo95"), expr("percentile(value, 0.97)").as("hi95"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    approx.foreach { case (k, (a50, a95)) =>
      val (lo50, hi50, lo95, hi95) = brackets(k)
      assert(a50 >= lo50 && a50 <= hi50, s"$k p50: approx $a50 outside [$lo50, $hi50]")
      assert(a95 >= lo95 && a95 <= hi95, s"$k p95: approx $a95 outside [$lo95, $hi95]")
    }
  }

  test("freqItems returns a superset of the true heavy hitters on planted skew") {
    import spark.implicits._
    // 1000 rows: user 7 owns 30% of them; the rest spread over 700 users —
    // only user 7 truly exceeds the 0.2 support threshold.
    val rows = (1 to 300).map(_ => 7L) ++ (1 to 700).map(i => 1000L + i)
    val df = rows.toDF("user_id").repartition(8)
    val found = df.stat.freqItems(Seq("user_id"), support = 0.2)
      .select(explode(col("user_id_freqItems")).as("u"))
      .collect().map(_.getLong(0)).toSet
    assert(found.contains(7L), s"heavy hitter missing from $found") // no false negatives
    assert(found.size <= 5) // candidate buffer is bounded by 1/support
  }

  test("3-minute sliding window places each event in exactly 3 buckets") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val total = ev.count()
    val fanned = graft.ops.Aggregates.a6SlidingWindow.fn(spark, "/root/testdata/sf0.001")
      .agg(sum("n")).head().getLong(0)
    assert(fanned == 3 * total)
  }

  test("weekly rollup from persisted daily sketches tracks exact distinct within 5%") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf)
    // NTZ-safe: week keys are date_trunc over Tables.events' normalized
    // TimestampType ts (never a raw parquet NTZ read)
    val weekly = graft.ops.Aggregates.sketchRollup.fn(spark, sf)
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // NTZ-safe: same derivation as above
    val exact = ev.groupBy(date_trunc("week", to_date(col("ts"))).as("week"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(weekly.keySet == exact.keySet && weekly.nonEmpty)
    weekly.foreach { case (w, est) =>
      val ex = exact(w).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"week $w: est $est vs exact $ex")
    }
    // merge associativity: union of the daily sketches == sketching the
    // whole stream directly (the property that lets sketches persist)
    val fromDaily = graft.ops.Aggregates.dailyUserSketches(ev)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))).head().getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id")))).head().getLong(0)
    assert(fromDaily == direct, s"union-of-daily $fromDaily != direct $direct")
  }
}
