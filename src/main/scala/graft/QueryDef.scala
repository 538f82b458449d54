package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark query plus (optionally) the equivalent
  * DuckDB SQL the driver hash-compares against. `oracle = None` → the driver
  * records a weaker rows-only check (used for ops whose exact values depend
  * on Spark-internal hashing, e.g. MinHash sketches).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def unverified(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
