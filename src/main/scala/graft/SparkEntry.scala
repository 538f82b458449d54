package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Kpi.quarterHour(Tables.events(spark, "/root/testdata/sf0.001"))

  /** Full registry: one QueryDef per implemented operator from SURVEY.md §2
    * (+ north-star extensions). */
  def registry: Seq[QueryDef] =
    Seq(QueryDef("q1_kpi_quarter_hour", Kpi.quarterHourSql)(
      (s, d) => Kpi.quarterHour(Tables.events(s, d)))) ++
      Transforms.all ++ Aggregates.all ++ Relational.all ++ Sinks.all ++
      Dedup.all ++ Similarity.all ++ TextAnalysis.all ++ Multimodal.all ++
      Coverage.all ++ Temporal.all ++ Curation.all ++ graft.streaming.Stateful.all

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
