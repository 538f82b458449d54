package graft

import org.apache.spark.sql.functions._

class RebalanceSpec extends SparkSpec {

  test("scanWide adds a rebalance exchange to a narrow frame") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
    val narrow = Tables.documents(spark, "/root/testdata/sf0.001") // one-split parquet
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assume(narrow.rdd.getNumPartitions * 2 <= target)
    val out = graft.ops.Rebalance.scanWide(narrow, col("doc_id"))
    assert(out.queryExecution.logical.collectFirst {
      case r: RepartitionOperation => r }.nonEmpty,
      "scanWide did not rebalance a narrow input")
    // The rebalance must carry an EXPLICIT partition count: a count-less
    // repartition(key) is fair game for AQE coalescing by shuffle bytes,
    // which round 11 measured collapsing a tiny-metadata exchange to ONE
    // task ahead of a CPU-heavy render. Explicit counts are exempt, so
    // the runtime width is assertable here.
    assert(out.rdd.getNumPartitions == target,
      s"expected $target runtime partitions, got ${out.rdd.getNumPartitions}")
    // values unchanged, only distribution
    assert(out.count() == narrow.count())
  }

  test("scanWide memo key is stable across separately-constructed scans of one path") {
    // The memo that keeps scanWide from re-planning the same source on
    // every invocation keys on the canonicalized analyzed plan's
    // semanticHash. Separately constructed reads of the same parquet
    // path must produce the same key (InMemoryFileIndex equals/hashes by
    // root paths), and a different path must not.
    val a = Tables.documents(spark, "/root/testdata/sf0.001")
    val b = Tables.documents(spark, "/root/testdata/sf0.001")
    assert(a ne b)
    assert(a.queryExecution.analyzed.canonicalized.semanticHash() ==
      b.queryExecution.analyzed.canonicalized.semanticHash())
    val other = Tables.events(spark, "/root/testdata/sf0.001")
    assert(a.queryExecution.analyzed.canonicalized.semanticHash() !=
      other.queryExecution.analyzed.canonicalized.semanticHash())
    // same decision for both instances (memo hit on the second)
    val outA = graft.ops.Rebalance.scanWide(a, col("doc_id"))
    val outB = graft.ops.Rebalance.scanWide(b, col("doc_id"))
    assert((outA eq a) == (outB eq b))
  }

  test("scanWide is the identity on an already-wide frame (the 100 TB case)") {
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val wide = Tables.documents(spark, "/root/testdata/sf0.001").repartition(target)
    val out = graft.ops.Rebalance.scanWide(wide, col("doc_id"))
    // identity: no extra exchange on top of the existing one — the plan
    // must be the SAME object, not a new repartition
    assert(out eq wide, "scanWide added an exchange to a wide input")
  }
}
