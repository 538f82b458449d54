package graft

import org.apache.spark.sql.functions._

/** Native graft_dot / graft_cosine expressions — bit-equality with the
  * interpreted higher-order-function formulation, null/edge semantics,
  * SQL registration via GraftExtensions.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: String, b: String) =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")

  test("graft_dot is bit-identical to the zip_with/aggregate fold on all fixture vectors") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .crossJoin(broadcast(
        Tables.embeddings(spark, "/root/testdata/sf0.001")
          .filter(col("vec_id") === 0).select(col("embedding").as("q"))))
    val diff = e.select(
      expr("graft_dot(embedding, q)").as("native"),
      hofDot("embedding", "q").as("hof"))
      .filter(col("native") =!= col("hof")) // exact, not approximate
    assert(diff.isEmpty)
  }

  test("graft_cosine matches dot/(|a||b|) exactly and is registered in SQL") {
    Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("emb")
    val diff = spark.sql(
      """SELECT graft_cosine(a.embedding, b.embedding) AS native,
        |       graft_dot(a.embedding, b.embedding) /
        |         (sqrt(graft_dot(a.embedding, a.embedding)) * sqrt(graft_dot(b.embedding, b.embedding))) AS composed
        |FROM emb a JOIN emb b ON a.vec_id = b.vec_id - 1""".stripMargin)
      .filter(col("native") =!= col("composed"))
    assert(diff.isEmpty)
  }

  test("edge semantics: length mismatch truncates, null elements skip, zero norm -> null cosine") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f), Seq(2.0f, 3.0f)),          // truncate to shared prefix
      (2L, Seq(1.0f, 0.0f), Seq(0.0f, 0.0f)),                 // zero-norm right
      (3L, Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))
    ).toDF("id", "a", "b")
    val out = df.select(col("id"),
      expr("graft_dot(a, b)").as("d"), expr("graft_cosine(a, b)").as("c"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(out(1L)._1 == 1.0 * 2 + 2.0 * 3)
    assert(out(2L) == ((0.0, None)))
    assert(out(3L) == ((25.0, Some(1.0))))
    // null array input -> null out
    val nullRow = df.withColumn("a", when(col("id") === 1, col("a")))
      .select(expr("graft_dot(a, b)")).collect()
    assert(nullRow.count(_.isNullAt(0)) == 2)
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    // Filters during optimization and codegen fallbacks hit nullSafeEval;
    // force it by evaluating on a literal (constant folding runs eval).
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
  }
}
