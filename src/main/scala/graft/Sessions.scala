package graft

import org.apache.spark.sql.SparkSession

/** Session factory — S10/P4/P5/P6 (reference: SparkBigData.scala:14-33:
  * `maSessionSpark(Env)` with a local/cluster master split, Kryo
  * serializer and crossJoin enabled in the prod profile).
  *
  * Differences from the reference, on purpose:
  *  - no `.enableHiveSupport()`: the reference enabled it but only ever
  *    used temp views (SURVEY.md §1.1); the in-memory catalog suffices
  *  - shuffle partitions sized to the configured parallelism, not the
  *    200 default — on a real cluster set this to ~2-3× total cores
  *  - UTC pinned so event-time bucketing is reproducible everywhere
  */
object Sessions {

  /** `local` true → local[cpus] dev session (reference Env=true branch);
    * false → rely on spark-submit's master/deploy config (the reference
    * hardcoded a typo'd master URL here — SURVEY.md §7.4).
    */
  def build(
      local: Boolean = true,
      cpus: Int = Runtime.getRuntime.availableProcessors(),
      kryo: Boolean = true,
      appName: String = "graft"): SparkSession = {
    var b = SparkSession.builder()
      .appName(appName)
      // native graft_dot / graft_cosine (graft.functions.VectorExpressions)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); see Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // P5 (reference SparkBigData.scala:21,28) — SQL cartesian products
      // allowed; the DataFrame API still requires explicit crossJoin()
      .config("spark.sql.crossJoin.enabled", "true")
      // Static conf, so it must ride the first builder: the compiled-
      // codegen cache defaults to 100 entries, and a session running a
      // many-query workload (this library registers 110+) evicts every
      // warm class between plans, re-paying Janino compilation per
      // query. Generated classes are small; 5000 entries is still a
      // trivial heap cost on any driver/executor.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // AQE on cached plans (upstream default false): every stage over
      // an InMemoryRelation otherwise runs at full static shuffle width,
      // even over KB-sized cached frames — see Bench.scala for the
      // measured −40-65% process-CPU on the cache-loop queries. Safe for
      // this library: caches are consumed within one query, so no
      // consumer relies on a cache's output partitioning surviving.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    if (kryo) b = b.config("spark.serializer", "org.apache.spark.serializer.KryoSerializer") // P4
    if (local) b = b.master(s"local[$cpus]")
    b.getOrCreate()
  }
}
