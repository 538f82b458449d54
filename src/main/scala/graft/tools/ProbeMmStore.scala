package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ops.Multimodal

/** Dev probe: partition counts and decode timings of the materialized
  * multimodal stores (round-11 verdict #4 — are the stored reads narrow?).
  */
object ProbeMmStore {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    for (kind <- Seq("image", "audio", "video")) {
      val df = kind match {
        case "image" => Multimodal.imageAssetsStored(spark, sfDir)
        case "audio" => Multimodal.audioAssetsStored(spark, sfDir)
        case _ => Multimodal.videoAssetsStored(spark, sfDir)
      }
      println(s"[probe] $kind store: ${df.rdd.getNumPartitions} partitions, " +
        s"${df.inputFiles.length} files, ${df.count()} rows")
    }
    // warm decode kernels, then time
    val img = Multimodal.imageAssetsStored(spark, sfDir)
    time("decode_image warm16")(
      Multimodal.decodeImageStats(img.limit(16)).write.format("noop").mode("overwrite").save())
    time("decode_image")(
      Multimodal.decodeImageStats(img).write.format("noop").mode("overwrite").save())
    time("resize_image")(
      Multimodal.decodeImageResized(img, factor = 2).write.format("noop").mode("overwrite").save())
    val aud = Multimodal.audioAssetsStored(spark, sfDir)
    time("decode_audio")(
      Multimodal.decodeAudioStats(aud).write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
