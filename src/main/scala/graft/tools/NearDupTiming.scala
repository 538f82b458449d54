object NearDupTiming {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.build(cpus = 32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = graft.Tables.embeddings(spark, d)
    emb.limit(1).write.format("noop").mode("overwrite").save()
    for (tables <- Seq(1, 2, 4, 8, 16)) {
      val b = graft.ops.Similarity.lshBuckets(emb, tables, 8).select("vec_id", "tbl", "bucket")
      b.write.format("noop").mode("overwrite").save() // compile pass
      t(s"tables=$tables warm")(b.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
