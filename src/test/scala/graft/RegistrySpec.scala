package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract's silent failure mode: `SparkEntry.queries` is
  * `registry.map(...).toMap`, so two QueryDefs registering the same name
  * would collapse to ONE entry with no error — the shadowed operator
  * simply vanishes from the correctness gate and the bench. With 117
  * queries across 13 family objects that collision is one copy-pasted
  * `val` away; this spec makes it loud.
  */
class RegistrySpec extends AnyFunSuite {

  test("registry names are unique, maps consistent, names artifact-safe") {
    val names = SparkEntry.registry.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty,
      s"duplicate query names silently collapse in queries.toMap: ${dups.mkString(", ")}")
    assert(SparkEntry.queries.keySet == names.toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // names become Verify output dirs, JSON keys, and bench CLI args —
    // keep them in the safe charset the harnesses assume
    val bad = names.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"names outside [a-z0-9_]: ${bad.mkString(", ")}")
  }

  test("every oracle is non-empty single-statement SQL") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle")
      // a stray semicolon would make DuckDB execute only the first
      // statement and silently compare against the wrong result
      assert(!sql.trim.stripSuffix(";").contains(";"),
        s"$name: oracle contains an inner ';' — multi-statement SQL")
    }
  }
}
