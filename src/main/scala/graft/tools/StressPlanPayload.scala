package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CellMatrix, OffPlanKernels}

/** Plan-payload stress (dev-only): the r21 off-plan transport claim,
  * measured. The SAME probe-ranking computation is planned through both
  * transports — the literal kernel (`graft_nearest_cells` over a
  * typedLit matrix, the pre-r21 spelling) and the broadcast kernel
  * (graft.functions.NearestCellsOffPlan) — at nlist 240 (the sf0.1
  * fitted fixture size) up to a synthetic nlist 10^5, and three costs
  * are recorded per transport:
  *
  *  - plan chars: explainString length (what every explain/UI render
  *    and plan-walk pass carries);
  *  - task-binary proxy bytes: the JavaSerializer size of the query's
  *    executed RDD — the object graph (generated classes + references
  *    array, literal included for the literal transport) that is
  *    broadcast to executors for EVERY stage of every query over this
  *    matrix;
  *  - plan ms: wall time to produce the executed plan (driver-side
  *    analyzer/optimizer work, which walks any literal).
  *
  * The committed claim (SCALING.md "plan-payload inventory"): literal
  * transport grows ~linearly in nlist·dim on all three; off-plan stays
  * ~flat, with the matrix paid once per executor per process as a
  * broadcast (nlist·dim·8 B) instead of once per stage.
  */
object StressPlanPayload {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ser = new org.apache.spark.serializer.JavaSerializer(
      spark.sparkContext.getConf).newInstance()

    // a deterministic synthetic query frame: 10k 64-dim vectors
    val qSide = spark.range(10000).select(col("id").as("query_id"),
      transform(sequence(lit(0), lit(63)),
        d => sin(col("id") * 64 + d)).as("q_emb"))

    def mat(nlist: Int): Array[Array[Double]] =
      Array.tabulate(nlist)(i => Array.tabulate(64)(d =>
        math.sin(i * 64.0 + d) * 2.0))

    case class Row(nlist: Int, transport: String, planChars: Long,
        taskBinKB: Long, planMs: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]

    def measure(nlist: Int, transport: String, df: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val qe = df.queryExecution
      val executed = qe.executedPlan // forces analysis + optimization + planning
      val planMs = (System.nanoTime() - t0) / 1000000L
      val planChars = qe.explainString(
        org.apache.spark.sql.execution.SimpleMode).length.toLong
      val taskBin =
        try ser.serialize[AnyRef](qe.toRdd).limit().toLong
        catch { case e: Throwable =>
          System.err.println(s"[payload] rdd serialize failed: $e"); -1L }
      rows += Row(nlist, transport, planChars, taskBin / 1024, planMs)
      executed.hashCode(): Unit
    }

    Seq(240, 2000, 10000, 100000).foreach { nlist =>
      val m = mat(nlist)
      val centsLit = typedLit(m.map(_.toSeq).toSeq)
      measure(nlist, "literal", qSide.withColumn("list_id",
        explode(call_function("graft_nearest_cells",
          col("q_emb"), centsLit, lit(0), lit(nlist), lit(4)))))
      val h = spark.sparkContext.broadcast(CellMatrix(m))
      measure(nlist, "broadcast", qSide.withColumn("list_id",
        explode(OffPlanKernels.nearestCells(col("q_emb"), h, 4))))
    }

    println()
    println("BEGIN-PAYLOAD-SECTION")
    println("| nlist | transport | plan chars | task-binary KB | plan ms |")
    println("|---|---|---|---|---|")
    rows.foreach { r =>
      println(f"| ${r.nlist}%,d | ${r.transport} | ${r.planChars}%,d " +
        f"| ${r.taskBinKB}%,d | ${r.planMs} |")
    }
    println("END-PAYLOAD-SECTION")
    spark.stop()
  }
}
