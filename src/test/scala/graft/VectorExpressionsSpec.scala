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

  test("generated code survives nested codegen scopes (no fixed loop-variable names)") {
    // Regression: doGenCode used literal `int i` / `double x` / `double y`.
    // In plans that nest the expression inside a generated scope that
    // already declares those names (observed: the LSH bucket projection of
    // sim_ann_lsh_topk), janino rejects the redefinition and Spark SILENTLY
    // falls back to interpreted eval — results stay right, the 10× perf is
    // gone. CODEGEN_ONLY turns that silent fallback into a hard failure so
    // this test pins compilability of the exact shape that broke.
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val out = ops.Similarity.annTopK(
        Tables.embeddings(spark, "/root/testdata/sf0.001"), queryVecId = 0L, k = 5)
        .collect()
      assert(out.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
      spark.catalog.clearCache() // annTopK caches its bucket table
    }
  }

  test("interpreted (non-codegen) eval path agrees with codegen") {
    // Filters during optimization and codegen fallbacks hit nullSafeEval;
    // force it by evaluating on a literal (constant folding runs eval).
    val r = spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 1.0)
  }

  // ------------------------------------------------- text hash expressions

  /** The interpreted-HOF formulation graft_polyhash/graft_mingram replaced
    * (see TextAnalysis.fingerprint) — kept here as the equality oracle.
    */
  private val P = 1000000007L
  private def hofFingerprint(df: org.apache.spark.sql.DataFrame) = {
    val pows = Iterator.iterate(1L)(x => x * 31 % P).take(8).toSeq.reverse
    val gramCodes = "(" + pows.zipWithIndex.map { case (pw, k) =>
      s"CAST(element_at(codes, i + $k) AS BIGINT) * $pw" }.mkString(" + ") + s") % $P"
    df.withColumn("codes", expr("transform(split(text, ''), c -> ascii(c))"))
      .select(col("doc_id"),
        expr(s"aggregate(codes, 0L, (acc, c) -> (acc * 31 + c) % $P)").as("doc_hash"),
        expr(s"""CASE WHEN length(text) < 8 THEN NULL
                |ELSE array_min(transform(sequence(1, size(codes) - 7), i -> $gramCodes))
                |END""".stripMargin.replace("\n", " ")).as("min_gram_hash"))
  }

  test("graft_hyperplane_buckets is bit-identical to the folded-literal dot formulation") {
    val tables = 4
    val bits = 8
    val planes = graft.functions.Hyperplanes.planes(tables * bits)
    // the previous formulation: one folded-literal graft_dot per (table, bit)
    def bucketFor(t: Int) =
      (0 until bits).map { b =>
        val dotp = call_function("graft_dot",
          col("embedding"), typedLit(planes(t * bits + b).toSeq))
        when(dotp > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    val diff = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"),
        expr(s"graft_hyperplane_buckets(embedding, $tables, $bits)").as("native"),
        array((0 until tables).map(bucketFor): _*).as("folded"))
      .filter(col("native") =!= col("folded"))
    assert(diff.isEmpty)
  }

  test("graft_hyperplane_buckets rejects out-of-range and non-foldable args") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_hyperplane_buckets(embedding, 0, 8)")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_hyperplane_buckets(embedding, 8, 63)")).collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(expr("graft_hyperplane_buckets(embedding, cast(vec_id AS INT), 8)")).collect()
    }
  }

  test("graft_polyhash/graft_mingram are bit-identical to the HOF formulation on the fixture") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val native = docs.select(col("doc_id"),
      expr("graft_polyhash(text)").as("doc_hash"),
      expr("graft_mingram(text, 8)").as("min_gram_hash"))
    val diff = native.as("n").join(hofFingerprint(docs).as("h"), "doc_id")
      .filter(col("n.doc_hash") =!= col("h.doc_hash") ||
        (col("n.min_gram_hash") <=> col("h.min_gram_hash")) === false)
    assert(diff.isEmpty)
  }

  test("graft text hashes: codepoints, short-text null, empty string, null input") {
    val df = Seq(
      (1L, "abcdefgh"),        // exactly 8 chars: one gram
      (2L, "abcdefg"),         // 7 chars -> min_gram null
      (3L, ""),                // empty -> poly 0 (matches split('')+ascii fold)
      (4L, "héllo wörld €12"), // multi-byte codepoints
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      expr("graft_polyhash(text)").as("ph"),
      expr("graft_mingram(text, 8)").as("mg"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2))))).toMap
    // one gram == its own min; value = sum of cp*31^(7-k) mod P
    val cps = "abcdefgh".map(_.toLong)
    val pows = Iterator.iterate(1L)(x => x * 31 % P).take(8).toSeq.reverse
    val g = cps.zip(pows).map { case (c, p) => c * p }.sum % P
    assert(out(1L) == ((Some(g), Some(g))))
    assert(out(2L)._2.isEmpty && out(2L)._1.nonEmpty)
    assert(out(3L) == ((Some(0L), None)))
    val hof = hofFingerprint(df.withColumnRenamed("text", "text").filter(col("doc_id") === 4))
      .head()
    assert(out(4L) == ((Some(hof.getLong(1)), Some(hof.getLong(2)))))
    assert(out(5L) == ((None, None)))
  }

  test("graft_simhash is bit-identical to the 64-column sum(when) spelling on the fixture") {
    // The spelled-out form graft_simhash replaced (see Dedup.simhash
    // scaladoc): 64 signed bit-count sums, sign vector packed to a long.
    val toks = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull)
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .dropDuplicates("doc_id", "tok")
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map(i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1L).otherwise(-1L)).as(s"b$i"))
    val spelled = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(i => when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("spelled"))
    val native = toks.groupBy("doc_id").agg(expr("graft_simhash(h)").as("native"))
    val joined = native.join(spelled, "doc_id").cache()
    try {
      assert(joined.count() > 0)
      assert(joined.filter(col("native") =!= col("spelled")).isEmpty)
    } finally joined.unpersist(blocking = true)
  }

  test("graft_regex_count is bit-identical to size(regexp_extract_all) incl. null/empty/unicode") {
    import spark.implicits._
    val pat = "[^A-Za-z0-9\\s]"
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (90001L, null.asInstanceOf[String]),
        (90002L, ""),
        (90003L, "héllo, wörld! 中文。"),
        (90004L, "no punct here at all")).toDF("doc_id", "text"))
    // pattern via lit(), not an expr() SQL literal — SQL string parsing
    // would eat the \s escape and silently compare different patterns
    val cmp = fixture.select(
      col("doc_id"),
      call_function("graft_regex_count", col("text"), lit(pat)).as("native"),
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).as("spelled"))
    // null text: native NULL must mirror size(null) under sizeOfNull=false
    assert(cmp.filter(col("doc_id") === 90001L).head().isNullAt(1))
    assert(cmp.filter(
      !(col("native") <=> col("spelled")) && col("doc_id") =!= 90001L).isEmpty)
    // analysis-time pattern validation: a bad regex fails the QUERY, not a task
    intercept[Exception](
      fixture.select(expr("graft_regex_count(text, '[unclosed')")).collect())
  }

  test("graft_hits_in is bit-identical to size(filter(arr, w -> w IN ...)) incl. edges") {
    import spark.implicits._
    // a representative stop list: the contract under test is that BOTH
    // spellings see the same set, not which set the scorer ships
    val words = Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "it")
    val inList = words.map(w => s"'$w'").mkString("(", ", ", ")")
    val fixture = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (90001L, null.asInstanceOf[String]),
        (90002L, ""),
        (90003L, "the THE the\tand\nof"), // case + tab/newline separators
        (90004L, "  leading and trailing  "), // empty split tokens never match
        (90005L, "nothing matches here")).toDF("doc_id", "text"))
      .withColumn("arr", split(lower(col("text")), "\\s+"))
    val cmp = fixture.select(
      col("doc_id"),
      call_function("graft_hits_in", col("arr"), lit(words.mkString(","))).as("native"),
      expr(s"size(filter(arr, w -> w IN $inList))").as("spelled"))
    // null text -> null array -> native NULL mirrors size(null)
    assert(cmp.filter(col("doc_id") === 90001L).head().isNullAt(1))
    assert(cmp.filter(
      !(col("native") <=> col("spelled")) && col("doc_id") =!= 90001L).isEmpty)
    // analysis-time word-set validation: empty words fail the QUERY
    intercept[Exception](
      fixture.select(expr("graft_hits_in(arr, 'a,,b')")).collect())
    intercept[Exception](
      fixture.select(call_function("graft_hits_in", col("text"), lit("a"))).collect())
  }

  test("graft_absmax / graft_int8_mse match the interpreted HOF spelling exactly") {
    Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("emb_q")
    // absmax: order-independent max of |x| — HOF spelling via transform+array_max
    val amaxDiff = spark.sql(
      """SELECT graft_absmax(embedding) AS native,
        |       array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS hof
        |FROM emb_q""".stripMargin)
      .filter(col("native") =!= col("hof"))
    assert(amaxDiff.isEmpty)
    // mse: same two-pass formula spelled with aggregate() lambdas
    val mseDiff = spark.sql(
      """SELECT graft_int8_mse(embedding) AS native,
        |  aggregate(embedding, CAST(0 AS DOUBLE), (acc, x) ->
        |    acc + (CAST(x AS DOUBLE)
        |            - floor(CAST(x AS DOUBLE) / (graft_absmax(embedding) / 127.0) + 0.5)
        |              * (graft_absmax(embedding) / 127.0))
        |        * (CAST(x AS DOUBLE)
        |            - floor(CAST(x AS DOUBLE) / (graft_absmax(embedding) / 127.0) + 0.5)
        |              * (graft_absmax(embedding) / 127.0))) / size(embedding) AS hof
        |FROM emb_q WHERE graft_absmax(embedding) != 0""".stripMargin)
      .filter(col("native") =!= col("hof"))
    assert(mseDiff.isEmpty)
  }

  test("int8 edge semantics: zero vector -> 0 mse, exact-grid vector -> 0 mse, null array -> null") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f)),          // zero vector: scale 0, mse 0 (guarded, no NaN)
      (2L, Seq(127.0f, -127.0f, 0.0f)), // values exactly on the int8 grid: perfect reconstruction
      (3L, Seq(1.0f, -1.0f))
    ).toDF("id", "a")
    val out = df.select(col("id"),
      expr("graft_absmax(a)").as("m"), expr("graft_int8_mse(a)").as("e"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((0.0, 0.0)))
    assert(out(2L) == ((127.0, 0.0)))  // scale=1, every element an exact multiple
    assert(out(3L)._1 == 1.0)
    // ±1 quantizes to ±127 at scale=1/127, but 127*(1.0/127.0) can miss 1.0
    // by an ulp — reconstruction is near-exact, not bit-exact
    assert(out(3L)._2 >= 0.0 && out(3L)._2 < 1e-30)
    val nullRow = df.withColumn("a", when(col("id") === 1, col("a")))
      .select(expr("graft_int8_mse(a)")).collect()
    assert(nullRow.count(_.isNullAt(0)) == 2)
    // Empty and all-null-element arrays: NULL (matching DuckDB list_max
    // over no non-null values), NOT 0.0 — codegen and interpreted agree.
    val edge = Seq((1L, Seq.empty[java.lang.Float]),
      (2L, Seq[java.lang.Float](null, null))).toDF("id", "a")
    for (mode <- Seq("CODEGEN_ONLY", "NO_CODEGEN")) { // doGenCode AND nullSafeEval paths
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      try {
        val rows = edge.select(
          expr("graft_absmax(a)"), expr("graft_int8_mse(a)")).collect()
        assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)),
          s"expected all-NULL absmax/mse on empty/all-null arrays ($mode), got ${rows.mkString}")
      } finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_simhash merges partials correctly across repartitionings") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i % 7, i * 2654435761L))
    val one = rows.toDF("g", "h").coalesce(1)
      .groupBy("g").agg(expr("graft_simhash(h)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = rows.toDF("g", "h").repartition(13)
      .groupBy("g").agg(expr("graft_simhash(h)").as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == many)
    assert(one.size == 7)
  }
}
