package graft

import org.apache.spark.sql.functions._

class RebalanceSpec extends SparkSpec {

  test("scanWide adds a rebalance exchange to a narrow frame") {
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation
    val narrow = Tables.documents(spark, "/root/testdata/sf0.001") // one-split parquet
    val target = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assume(narrow.rdd.getNumPartitions * 2 <= target)
    val out = graft.ops.Rebalance.scanWide(narrow, col("doc_id"))
    // the DECISION is the contract: a repartition lands in the plan (at
    // this fixture size AQE may coalesce its runtime partition count —
    // the 1 MB advisory floor — so asserting rdd partition counts here
    // would test AQE's sizing, not scanWide; StressJson evidences the
    // at-scale parallelism)
    assert(out.queryExecution.logical.collectFirst {
      case r: RepartitionOperation => r }.nonEmpty,
      "scanWide did not rebalance a narrow input")
    // values unchanged, only distribution
    assert(out.count() == narrow.count())
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
