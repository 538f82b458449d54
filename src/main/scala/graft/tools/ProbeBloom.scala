package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val r = spark.sql("SELECT bloom_filter_agg(xxhash64(id), 100L, 800L) AS bf FROM range(100)")
      r.createOrReplaceTempView("bf_t")
      val hits = spark.sql(
        "SELECT sum(CASE WHEN might_contain((SELECT bf FROM bf_t), xxhash64(id)) THEN 1 ELSE 0 END) FROM range(200)")
      println("[bloom] " + hits.head)
    } catch { case e: Throwable => println("[bloom] FAILED: " + e) }
    // also try direct expression construction
    try {
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      println("[bloom] class exists: " + classOf[BloomFilterAggregate].getName)
    } catch { case e: Throwable => println("[bloom] class FAILED: " + e) }
    spark.stop()
  }
}
