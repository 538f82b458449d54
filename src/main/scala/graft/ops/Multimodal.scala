package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal columns — images/audio/video as opaque `binary` payloads
  * with typed metadata (builder brief).
  *
  * The decode step is a clearly-marked DETERMINISTIC STUB (no image/audio
  * codecs exist in this environment); everything around it — the asset
  * schema, the per-partition batch iteration, the partitioning strategy,
  * the fan-out control — is real and tested. Swapping the stub for a JNI
  * codec or an ONNX runtime changes only the function body.
  *
  * Batch shape: heavyweight decode/inference runs via
  * `Dataset.mapPartitions` (the JVM analog of `mapInPandas`): one
  * iterator per partition, so per-partition resources (a decoder, a
  * model session) are acquired ONCE per task, not per row, and rows
  * stream through without materializing the partition. At 100 TB,
  * parallelism = number of partitions; payload-heavy tables should be
  * repartitioned so a partition's payload bytes fit executor memory
  * (`spark.sql.files.maxPartitionBytes` governs the scan side).
  */
object Multimodal {

  /** Typed asset row: payload is opaque; meta travels beside it. */
  case class Asset(
      asset_id: Long,
      kind: String,
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long)

  /** Decoded feature row (what a real decode+embed stage emits). */
  case class AssetFeatures(
      asset_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Float])

  /** Deterministic synthetic assets derived from `documents` (no media
    * libs in this environment): payload = utf-8 text bytes, kind cycles
    * image/audio/video, metadata derived arithmetically from doc_id.
    * The derivation is SQL-expressible so metadata queries stay
    * oracle-checkable.
    */
  def syntheticAssets(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").cast("binary").as("payload"),
      (lit(64) + (col("doc_id") % 16) * 8).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 9) * 8).cast("int").as("height"),
      (lit(8000) + (col("doc_id") % 5) * 8000).cast("int").as("sample_rate"),
      (lit(1000) + (col("doc_id") % 30) * 1000).as("duration_ms"))

  // ----------------------------------------------------------- decode stub

  /** STUB DECODER — deterministic fake standing in for a real codec.
    * Derives a fixed-length "feature vector" from payload bytes with a
    * rolling hash; a real implementation would decode pixels/samples and
    * run feature extraction here. Signature and batch shape are the real
    * contract: bytes in, floats out, pure function per asset.
    */
  private[graft] def stubDecodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val acc = new Array[Long](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = h * 31 + payload(i)
      acc(i % dim) += (h & 0xffff)
      i += 1
    }
    acc.map(v => (v % 10000L).toFloat / 10000f)
  }

  /** Per-partition batched decode+featurize (the mapInPandas analog).
    * The `decoder` val inside the lambda marks where a real pipeline
    * acquires its per-task resource (codec context, model session) once.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // Real pipeline: val decoder = Codec.acquire() — once per task.
        rows.map { case (id, kind, payload) =>
          AssetFeatures(id, kind, payload.length.toLong, stubDecodeFeatures(payload, dim))
        }
      }
  }

  /** Resize is a METADATA transform until decode time (lazy-resize
    * pattern: record the target, decode once at the sink). Pure column
    * math — no payload touched, no shuffle.
    */
  def planResize(assets: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"), lit(maxSide.toDouble) / col("height"), lit(1.0))
    assets
      .withColumn("target_width", floor(col("width") * scale).cast("int"))
      .withColumn("target_height", floor(col("height") * scale).cast("int"))
  }

  /** Frame sampling fan-out for video assets: one row per sampled frame
    * at `everyMs` intervals. The explosion factor is duration/everyMs —
    * bounded and known BEFORE the explode, which is what keeps this safe
    * at scale (vs decoding first and discarding frames).
    */
  def sampleFrames(assets: DataFrame, everyMs: Long = 1000L): DataFrame =
    assets.filter(col("kind") === "video")
      .select(col("asset_id"), col("duration_ms"),
        posexplode(expr(s"sequence(0L, duration_ms - 1, $everyMs)")).as(Seq("frame_idx", "frame_ts_ms")))

  // ------------------------------------------------------------- queries

  /** Metadata rollup per kind — the asset-catalog query every media
    * pipeline starts with. Fully oracle-checkable because the synthetic
    * derivation is plain SQL.
    */
  val metadataStats = QueryDef(
    "mm_metadata_stats",
    """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
      |       count(*) AS n_assets,
      |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |       CAST(max(64 + (doc_id % 16) * 8) AS INTEGER) AS max_width,
      |       CAST(sum(1000 + (doc_id % 30) * 1000) AS BIGINT) AS total_duration_ms
      |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin)(
    (s, d) => syntheticAssets(s, d)
      .groupBy("kind")
      .agg(
        count(lit(1)).as("n_assets"),
        sum(octet_length(col("payload"))).cast("long").as("total_bytes"),
        max(col("width")).as("max_width"),
        sum(col("duration_ms")).as("total_duration_ms"))
      .orderBy("kind"))

  /** Frame-sample fan-out as a verifiable query (video assets only). */
  val frameSampleQuery = QueryDef(
    "mm_frame_sample",
    """SELECT asset_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms FROM (
      |  SELECT doc_id AS asset_id,
      |         unnest(generate_series(0, 1000 + (doc_id % 30) * 1000 - 1, 1000)) AS frame_ts_ms
      |  FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY asset_id, frame_ts_ms""".stripMargin)(
    (s, d) => sampleFrames(syntheticAssets(s, d))
      .select(col("asset_id"), col("frame_ts_ms"))
      .orderBy("asset_id", "frame_ts_ms"))

  /** Feature extraction is stub-decoder-specific → no oracle; the batch
    * plumbing (schema, determinism, partition independence) is pinned in
    * MultimodalSpec.
    */
  val featuresQuery = QueryDef.unverified("mm_stub_features")(
    (s, d) => extractFeatures(syntheticAssets(s, d)).toDF()
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1), 4).as("f0"))
      .orderBy("asset_id"))

  val all: Seq[QueryDef] = Seq(metadataStats, frameSampleQuery, featuresQuery)
}
