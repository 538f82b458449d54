package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** END-TO-END JDBC source (S8) against embedded Derby — the Spark
  * distribution ships the Derby jars (metastore dependency), so the JDBC
  * read path is executable in this environment after all: create a real
  * database, load rows over JDBC, read them back through
  * [[Sources.jdbcTable]] both whole-table and with partitioned bounds.
  *
  * What this pins beyond the option-map structural tests:
  *  - the format("jdbc") reader actually drives a DriverManager
  *    connection, schema inference from JDBC metadata included;
  *  - partitionColumn/bounds produce numPartitions parallel range scans
  *    (asserted via spark_partition_id) — the scale path that replaces
  *    the reference connector's tasks.max=3 (mysql-kafka-connect-source
  *    .properties:1-10); swapping Derby's URL for MySQL's changes only
  *    the URL/driver, which is the point of JDBC.
  */
class JdbcSourceSpec extends SparkSpec {

  private def withDerby(test: String => Unit): Unit = {
    val dir = tmpDir("derby")
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE events (event_id BIGINT PRIMARY KEY, " +
        "user_id BIGINT, event_type VARCHAR(16), value DOUBLE)")
      val ps = conn.prepareStatement("INSERT INTO events VALUES (?, ?, ?, ?)")
      (1L to 1000L).foreach { i =>
        ps.setLong(1, i); ps.setLong(2, i % 37)
        ps.setString(3, if (i % 3 == 0) "click" else "view"); ps.setDouble(4, i * 0.5)
        ps.addBatch()
      }
      ps.executeBatch()
      test(s"jdbc:derby:$dir/db")
    } finally {
      conn.close()
      // embedded Derby requires an explicit shutdown of the database
      try java.sql.DriverManager.getConnection(s"jdbc:derby:$dir/db;shutdown=true")
      catch { case _: java.sql.SQLException => () } // shutdown SUCCESS throws by spec
    }
  }

  test("jdbcTable reads a real database whole-table with inferred schema") {
    withDerby { url =>
      val df = Sources.jdbcTable(spark, url, "events")
      assert(df.schema.fieldNames.map(_.toLowerCase).toSet ==
        Set("event_id", "user_id", "event_type", "value"))
      assert(df.count() == 1000)
      val clicks = df.filter(col("event_type") === "click")
      assert(clicks.count() == 333)
      // predicate reaches the JDBC scan as a pushed filter, not a
      // Spark-side post-filter of a full table pull
      val scan = clicks.queryExecution.executedPlan.collectLeaves().head.toString
      assert(scan.contains("PushedFilters") &&
        scan.toLowerCase.contains("equalto(event_type,click)"), // Derby uppercases identifiers
        s"filter not pushed to JDBC: $scan")
    }
  }

  test("partitioned jdbc read splits the range across parallel scans and loses no rows") {
    withDerby { url =>
      val df = Sources.jdbcTable(spark, url, "events",
        partitionColumn = Some("event_id"), numPartitions = 4,
        lowerBound = 1L, upperBound = 1001L)
      assert(df.rdd.getNumPartitions == 4)
      // every partition does real work (range predicates partition the
      // keyspace instead of one task pulling everything)
      val perPart = df.groupBy(spark_partition_id().as("p")).count().collect()
      assert(perPart.length == 4, s"expected 4 working partitions, got ${perPart.length}")
      assert(perPart.map(_.getLong(1)).sum == 1000)
      // and the union of range scans is exactly the table
      assert(df.agg(sum("event_id")).head().getLong(0) == (1L to 1000L).sum)
    }
  }
}
