package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Multimodal columns — images/audio/video as opaque `binary` payloads
  * with typed metadata (builder brief).
  *
  * IMAGE and AUDIO decode are REAL: image payloads are actual PNG files
  * (rendered with `java.awt.image.BufferedImage`, encoded with
  * `javax.imageio.ImageIO`) and [[decodeImageStats]] decodes the bytes
  * back to pixels on the executors; audio payloads are actual 16-bit PCM
  * WAV files (written and parsed with `javax.sound.sampled` — both
  * JDK-only, zero new dependencies) and [[decodeAudioStats]] decodes them
  * back to samples. VIDEO decode is real at the container level: payloads
  * are GVID containers (magic + frame-count + length index + real PNG
  * frames — see [[renderVideo]]) and [[decodeVideoStats]] parses the
  * container and ImageIO-decodes every frame on the executors. FEATURE
  * EXTRACTION is real too ([[extractFeatures]]): deterministic
  * decode-derived features per kind (histograms / polyphase means),
  * hash-verified end to end — a learned embedding model would swap only
  * the per-kind featurizer bodies for a JNI codec / ONNX session, with
  * the batch shape and per-kind dispatch unchanged.
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
      features: Array[Double])

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

  // ----------------------------------------------------- real image decode

  /** Exact per-channel pixel sums over a bulk-copied RGB array (shared
    * by every decode path — one place to change if channel handling
    * ever does).
    */
  private def sumChannels(px: Array[Int]): (Long, Long, Long) = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val rgb = px(i)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      i += 1
    }
    (sr, sg, sb)
  }

  /** Deterministic test-pattern PNG: red ramps with x (r = x mod 256),
    * green/blue are flat id-derived fills. Every channel statistic is
    * therefore plain integer arithmetic over (asset_id, width, height) —
    * which is what lets [[imageDecodeQuery]] verify a REAL ImageIO
    * decode against a DuckDB oracle that never sees a pixel.
    */
  private[graft] def renderPng(assetId: Long, width: Int, height: Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = (assetId % 256).toInt
    val b = ((assetId * 37) % 128 + 64).toInt
    // bulk setRGB: one array store per pixel instead of a synchronized
    // raster call with per-pixel colorspace conversion (the per-pixel
    // form dominated the decode queries' profiles)
    val px = new Array[Int](width * height)
    var i = 0
    while (i < px.length) { px(i) = ((i % width % 256) << 16) | (g << 8) | b; i += 1 }
    img.setRGB(0, 0, width, height, px, 0, width)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Image-kind assets carrying REAL PNG payloads (metadata dims are the
    * render dims). Rendering runs per-partition on the executors —
    * payload bytes never exist on the driver.
    */
  def imageAssets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // rebalance before the render ([[Rebalance.scanWide]] — identity on
    // many-split inputs): a single-split scan would otherwise run every
    // CPU-heavy encode on one core, AND the store write downstream would
    // emit one file, making every stored read single-split too (each
    // renderer writes its partition, so the store inherits parallelism)
    Rebalance.scanWide(
      syntheticAssets(spark, sfDir).filter(col("kind") === "image"),
      col("asset_id"))
      .select("asset_id", "width", "height").as[(Long, Int, Int)]
      .mapPartitions { rows =>
        // ImageIO's default encode path stages through a temp-file cache;
        // in-memory streams only, once per task.
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, w, h) => (id, "image", renderPng(id, w, h), w, h) }
      }
      .toDF("asset_id", "kind", "payload", "width", "height")
  }

  /** REAL decode: parse the PNG payload back to pixels and emit measured
    * dimensions plus exact per-channel means. Same batch shape as
    * [[extractFeatures]] (mapPartitions, per-task decoder setup); the
    * channel sums are exact integer math, so the means are reproducible
    * doubles, not float-accumulation noise.
    */
  def decodeImageStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-task decoder setup
        rows.map { case (id, payload) =>
          // ImageIO.read returns NULL (no exception) on undecodable
          // bytes — fail loudly here, not as an NPE three calls later
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"asset $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          // bulk getRGB (one colorspace-converted copy), then a tight
          // array loop — the per-pixel getRGB(x, y) form this replaced
          // pays a raster lookup + sRGB conversion per call
          val (sr, sg, sb) = sumChannels(img.getRGB(0, 0, w, h, null, 0, w))
          val n = (w * h).toDouble
          (id, w, h, sr / n, sg / n, sb / n)
        }
      }
      .toDF("asset_id", "width", "height", "avg_r", "avg_g", "avg_b")
  }

  // ------------------------------------------------------ real audio decode

  /** Deterministic test-tone WAV: 16-bit PCM mono, a 50 ms clip at the
    * asset's metadata sample rate, sample[i] = (i mod 400) · amp with
    * amp = asset_id % 16 + 1. All metadata rates are multiples of 8000,
    * so n = rate/20 samples is always a whole number of 400-sample ramp
    * periods — every decoded statistic is therefore plain integer
    * arithmetic over (asset_id, sample_rate): peak = 399·amp,
    * mean = 199.5·amp. That is what lets [[audioDecodeQuery]] verify a
    * REAL javax.sound decode against a DuckDB oracle that never sees a
    * sample (same trick as [[renderPng]]'s pixel ramp).
    */
  private[graft] def renderWav(assetId: Long, sampleRate: Int): Array[Byte] = {
    import javax.sound.sampled._
    val n = sampleRate / 20
    val amp = (assetId % 16 + 1).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (i % 400) * amp // 399*16 = 6384 < 32767: always in range
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Audio-kind assets carrying REAL WAV payloads (metadata rate is the
    * render rate). Like [[imageAssets]], rendering runs per-partition on
    * the executors — payload bytes never exist on the driver.
    */
  def audioAssets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Rebalance.scanWide( // see imageAssets — parallel render + multi-file store
      syntheticAssets(spark, sfDir).filter(col("kind") === "audio"),
      col("asset_id"))
      .select("asset_id", "sample_rate").as[(Long, Int)]
      .mapPartitions(_.map { case (id, rate) => (id, "audio", renderWav(id, rate), rate) })
      .toDF("asset_id", "kind", "payload", "sample_rate")
  }

  /** REAL decode: parse the WAV container back to PCM samples via
    * `javax.sound.sampled.AudioSystem` and emit the measured format rate,
    * frame count, signed-sample peak and exact mean (integer sum, one
    * division at the end — reproducible doubles, not float accumulation).
    * Same batch shape as [[decodeImageStats]].
    */
  def decodeAudioStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val rate = ais.getFormat.getSampleRate.toInt
        val bytes =
          try ais.readAllBytes()
          finally ais.close()
        val n = bytes.length / 2
        var (i, sum, peak) = (0, 0L, Int.MinValue)
        while (i < n) {
          // 16-bit signed little-endian: high byte carries the sign.
          val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          sum += s
          if (s > peak) peak = s
          i += 1
        }
        (id, rate, n.toLong, peak, sum.toDouble / n)
      })
      .toDF("asset_id", "sample_rate", "n_samples", "peak", "mean_amp")
  }

  /** Strided audio decode — every `stride`-th PCM sample. Unlike video
    * (which needs the container's length index to seek), fixed-width PCM
    * IS random access: sample k lives at byte 2k, so downsampling is
    * pure address arithmetic and touches 1/stride of the samples. The
    * standing caveat of sample-dropping (aliasing) doesn't apply to the
    * stats here — they're exact over whatever grid is kept, which is
    * what the oracle verifies.
    */
  def decodeAudioSampled(assets: DataFrame, stride: Int = 2): DataFrame = {
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val rate = ais.getFormat.getSampleRate.toInt
        val bytes =
          try ais.readAllBytes()
          finally ais.close()
        val n = bytes.length / 2
        var (i, kept, sum, peak) = (0, 0L, 0L, Int.MinValue)
        while (i < n) {
          val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          sum += s
          if (s > peak) peak = s
          kept += 1
          i += stride // address arithmetic, not a skip-scan
        }
        // empty PCM payload (n = 0): no samples kept — emit zeros, not
        // NaN/MinValue, so an all-silence shard can't poison a rollup
        if (kept == 0) (id, rate, 0L, 0, 0.0)
        else (id, rate, kept, peak, sum.toDouble / kept)
      })
      .toDF("asset_id", "sample_rate", "n_samples", "peak", "mean_amp")
  }

  // ------------------------------------------------------ real video decode

  /** GVID container layout (pure-JDK, deterministic): the JDK ships no
    * video codec, but a video FILE is just a container of encoded frames —
    * so the container format here is real (magic, frame count, a length
    * index enabling random access, then length-delimited PNG frames) and
    * each frame is a real PNG decoded by the same ImageIO path
    * [[decodeImageStats]] uses. Swapping GVID for MP4/H.264 changes only
    * [[parseVideoFrames]]'s body; the per-partition batch shape, the
    * per-frame fan-out, and the schema contract stay.
    *
    *   bytes 0-3   magic "GVID"
    *   bytes 4-7   frame count n (int32 BE)
    *   next 4·n    frame byte-lengths (int32 BE each) — the index
    *   then        n PNG streams, concatenated in index order
    */
  private val VideoMagic: Int = 0x47564944 // "GVID"

  /** Frames per clip: 2..8, derived from the id so the fan-out is
    * SQL-expressible (a decode-time sample of the nominal 1 fps clip —
    * bounded like [[sampleFrames]]'s explosion factor).
    */
  private[graft] def videoFrameCount(assetId: Long): Int = (2 + assetId % 7).toInt

  /** Deterministic 64×48 test-pattern frame f: red ramps with x (width 64
    * < 256, so avg_r = 31.5 exactly), green/blue are flat fills that vary
    * per FRAME — g = (id+f) mod 256, b = (37·id + 11·f) mod 128 + 64 — so
    * a correct decode must keep frames in index order to match the
    * oracle's per-frame arithmetic (same trick as [[renderPng]]).
    */
  private[graft] def renderVideo(assetId: Long): Array[Byte] = {
    import java.awt.image.BufferedImage
    val (w, h) = (64, 48)
    val n = videoFrameCount(assetId)
    val frames = Array.tabulate(n) { f =>
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = ((assetId + f) % 256).toInt
      val b = ((assetId * 37 + f * 11) % 128 + 64).toInt
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) { px(i) = ((i % w % 256) << 16) | (g << 8) | b; i += 1 }
      img.setRGB(0, 0, w, h, px, 0, w) // bulk store, see renderPng
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(VideoMagic)
    dos.writeInt(n)
    frames.foreach(fb => dos.writeInt(fb.length))
    frames.foreach(dos.write)
    dos.flush()
    out.toByteArray
  }

  /** REAL container parse: validate magic, read the index, slice and
    * ImageIO-decode each frame in order. Fails loudly on a corrupt
    * payload (magic mismatch / truncation) — a decoder that silently
    * emits partial frames poisons downstream training data.
    */
  private[graft] def parseVideoFrames(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val din = new java.io.DataInputStream(new java.io.ByteArrayInputStream(payload))
    require(din.readInt() == VideoMagic, "not a GVID container: bad magic")
    val n = din.readInt()
    require(n >= 0, s"negative frame count $n")
    // bounds-check the HEADER before allocating anything sized by it: a
    // corrupt count/length field must hit the documented loud require,
    // not a NegativeArraySizeException or an OOM-sized allocation
    require(8L + 4L * n <= payload.length,
      s"corrupt GVID: index of $n frames exceeds ${payload.length}-byte payload")
    val lengths = Array.fill(n)(din.readInt())
    val totalLen = lengths.foldLeft(0L) { (acc, len) =>
      require(len >= 0, s"corrupt GVID: negative frame length $len"); acc + len
    }
    require(8L + 4L * n + totalLen <= payload.length,
      s"corrupt GVID: frames ($totalLen B) overrun ${payload.length}-byte payload")
    lengths.zipWithIndex.map { case (len, f) =>
      val buf = new Array[Byte](len)
      din.readFully(buf) // EOFException on truncation, not a short frame
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(buf))
      require(img != null, s"corrupt GVID: frame $f is not decodable image bytes")
      img
    }.toSeq
  }

  /** Strided frame decode — what the length index is FOR: seek past
    * unwanted frames without decoding them. Returns one decoded frame
    * per `stride` (frame 0, stride, 2·stride, …); skipped frames cost a
    * pointer bump, not an ImageIO parse, so per-asset decode work is
    * ceil(n/stride) regardless of clip length — the contract that makes
    * sparse frame sampling viable on long videos at scale (a container
    * without an index would force sequential decode of every frame).
    */
  private[graft] def parseVideoFramesStrided(
      payload: Array[Byte], stride: Int): Seq[(Int, java.awt.image.BufferedImage)] = {
    require(stride >= 1, s"stride must be >= 1 (got $stride)")
    val bb = java.nio.ByteBuffer.wrap(payload)
    require(bb.getInt() == VideoMagic, "not a GVID container: bad magic")
    val n = bb.getInt()
    require(n >= 0, s"negative frame count $n")
    // same header bounds discipline as parseVideoFrames — validate
    // BEFORE any count-sized allocation or index-seek arithmetic
    require(8L + 4L * n <= payload.length,
      s"corrupt GVID: index of $n frames exceeds ${payload.length}-byte payload")
    val lengths = Array.fill(n)(bb.getInt())
    val totalLen = lengths.foldLeft(0L) { (acc, len) =>
      require(len >= 0, s"corrupt GVID: negative frame length $len"); acc + len
    }
    require(8L + 4L * n + totalLen <= payload.length,
      s"corrupt GVID: frames ($totalLen B) overrun ${payload.length}-byte payload")
    var offset = 8 + 4 * n
    (0 until n).flatMap { f =>
      val at = offset
      offset += lengths(f)
      if (f % stride == 0) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload, at, lengths(f)))
        require(img != null, s"corrupt GVID: frame $f is not decodable image bytes")
        Some(f -> img)
      } else None // seek: index math only, no decode
    }
  }

  /** Video-kind assets carrying REAL GVID payloads. Like [[imageAssets]],
    * rendering runs per-partition on the executors.
    */
  def videoAssets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Rebalance.scanWide( // see imageAssets — parallel render + multi-file store
      syntheticAssets(spark, sfDir).filter(col("kind") === "video"),
      col("asset_id"))
      .select("asset_id").as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map(id => (id, "video", renderVideo(id)))
      }
      .toDF("asset_id", "kind", "payload")
  }

  /** REAL decode: parse the GVID container back to frames and emit one
    * row per frame with measured dimensions and exact per-channel means
    * (integer pixel sums — reproducible doubles). The fan-out factor is
    * the header's frame count, known per-row before any pixel work, so a
    * skewed clip-length distribution shows up in the index, not as an
    * executor OOM. Same batch shape as [[decodeImageStats]].
    */
  def decodeVideoStats(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-task decoder setup
        rows.flatMap { case (id, payload) =>
          val frames = parseVideoFrames(payload)
          frames.iterator.zipWithIndex.map { case (img, f) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (sr, sg, sb) = sumChannels(img.getRGB(0, 0, w, h, null, 0, w))
            val n = (w * h).toDouble
            (id, frames.length, f, w, h, sr / n, sg / n, sb / n)
          }
        }
      }
      .toDF("asset_id", "n_frames", "frame_idx", "width", "height", "avg_r", "avg_g", "avg_b")
  }

  /** Sparse decode: only every `stride`-th frame is parsed (seek via the
    * container index — see [[parseVideoFramesStrided]]); emitted stats
    * match [[decodeVideoStats]] on the frames both produce.
    */
  def decodeVideoSampled(assets: DataFrame, stride: Int = 2): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, payload) =>
          parseVideoFramesStrided(payload, stride).iterator.map { case (f, img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            val (sr, sg, sb) = sumChannels(img.getRGB(0, 0, w, h, null, 0, w))
            val n = (w * h).toDouble
            (id, f, w, h, sr / n, sg / n, sb / n)
          }
        }
      }
      .toDF("asset_id", "frame_idx", "width", "height", "avg_r", "avg_g", "avg_b")
  }

  // ------------------------------------------- real feature extraction

  /** REAL per-kind featurizers — the learned-embedding seam made
    * concrete (these bodies replaced the round-6 rolling-hash stub,
    * `stubDecodeFeatures`, whose only remaining trace is this note).
    * Each kind runs a real decode followed by a deterministic feature
    * computation in exact integer/double arithmetic, so the whole
    * decode→featurize pipeline is SQL-replayable and hash-verified end
    * to end ([[realFeaturesQuery]]):
    *
    *  - image: normalized `dim`-bin RED-channel intensity histogram
    *    over the ImageIO-decoded pixels (bin width 256/dim);
    *  - audio: per-phase mean amplitude of the javax.sound-decoded PCM
    *    samples (phase = sample index mod `dim` — the polyphase
    *    profile), normalized by full-scale 32767;
    *  - video: distribution of per-frame mean GREEN intensity across
    *    the GVID container's frames (`dim` bins over frame count) —
    *    decode-complete: every frame is parsed and averaged.
    *
    * A production embedding model replaces these bodies with a codec +
    * model session acquired once per partition; the signature, batch
    * shape, and per-kind dispatch are the contract that stays.
    */
  private[graft] def imageFeatureVec(payload: Array[Byte], dim: Int): Array[Double] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload") // ImageIO nulls, never throws
    val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < px.length) { counts(((px(i) >> 16) & 0xff) * dim / 256) += 1; i += 1 }
    counts.map(_.toDouble / px.length)
  }

  private[graft] def audioFeatureVec(payload: Array[Byte], dim: Int): Array[Double] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val bytes =
      try ais.readAllBytes()
      finally ais.close()
    val n = bytes.length / 2
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
      sums(i % dim) += s
      counts(i % dim) += 1
      i += 1
    }
    Array.tabulate(dim)(j =>
      if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j) / 32767.0)
  }

  private[graft] def videoFeatureVec(payload: Array[Byte], dim: Int): Array[Double] = {
    val frames = parseVideoFrames(payload)
    // a zero-frame container is structurally valid but has no features:
    // dividing by frames.length would emit silent all-NaN vectors into
    // training data — the exact poisoning mode this family fails loudly on
    require(frames.nonEmpty, "zero-frame GVID container has no features")
    val counts = new Array[Long](dim)
    frames.foreach { img =>
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
      var g = 0L
      var i = 0
      while (i < px.length) { g += (px(i) >> 8) & 0xff; i += 1 }
      val meanG = g.toDouble / px.length
      counts(math.min(dim - 1, (meanG * dim / 256).toInt)) += 1
    }
    counts.map(_.toDouble / frames.length)
  }

  /** Per-partition batched decode+featurize (the mapInPandas analog),
    * dispatching to the real per-kind featurizer. ImageIO cache setup
    * marks where a real pipeline acquires its per-task resource (codec
    * context, model session) once.
    */
  def extractFeatures(assets: DataFrame, dim: Int = 8): Dataset[AssetFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-task decoder setup
        rows.map { case (id, kind, payload) =>
          val f = kind match {
            case "image" => imageFeatureVec(payload, dim)
            case "audio" => audioFeatureVec(payload, dim)
            case "video" => videoFeatureVec(payload, dim)
            case other =>
              throw new IllegalArgumentException(s"asset $id: unknown kind '$other'")
          }
          AssetFeatures(id, kind, payload.length.toLong, f)
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

  /** REAL executed resize — the decode-time half of the lazy-resize
    * pattern [[planResize]] records: decode the PNG, nearest-neighbor
    * sample to the target grid (one pass over the bulk pixel array —
    * sample, don't average, so every output pixel is an exact input
    * pixel and the channel stats stay integer-exact for the oracle),
    * emit the resized dimensions and means. `factor` must divide both
    * dims (metadata dims here are multiples of 8). Same mapPartitions
    * batch shape as [[decodeImageStats]]; at scale this is where the
    * resized payload would be re-encoded toward the sink.
    */
  def decodeImageResized(assets: DataFrame, factor: Int = 2): DataFrame = {
    require(factor >= 1, s"factor must be >= 1 (got $factor)")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"asset $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          // fail loudly (GVID-parser discipline) rather than silently
          // truncating to a floor(w/factor) grid with off-contract dims
          require(w % factor == 0 && h % factor == 0,
            s"asset $id: factor $factor does not divide ${w}x$h")
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          val (tw, th) = (w / factor, h / factor)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < th) {
            var x = 0
            while (x < tw) {
              val rgb = px(y * factor * w + x * factor) // nearest-neighbor sample
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val n = (tw * th).toDouble
          (id, tw, th, sr / n, sg / n, sb / n)
        }
      }
      .toDF("asset_id", "target_width", "target_height", "avg_r", "avg_g", "avg_b")
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

  // ------------------------------------------------- materialized assets

  /** Process-scoped materialized asset store: each payload table is
    * rendered ONCE per (process, sfDir) to parquet and read from storage
    * thereafter — the production shape, where payloads come from object
    * storage rather than being synthesized per query. The registered
    * decode queries read through this, so what they measure is
    * scan + decode (the real per-query cost at 100 TB); the render half
    * of the verified round trip still runs, once, on executors, and the
    * oracle still proves the encode→decode fidelity of every byte read.
    * Same per-user+pid scratch/shutdown-hook discipline as
    * [[Similarity.annIvfPersistedQuery]]'s index dir.
    */
  private lazy val assetScratchDir: String = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"),
      s"graft-mm-assets-${sys.props.getOrElse("user.name", "anon")}-" +
        ProcessHandle.current.pid)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }))
    dir.toString
  }

  private val materializedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, () => String]()

  /** Collision-proof store key: sanitized dir basename for readability
    * plus a SHA-256 prefix of the FULL path for identity — hashCode
    * alone could collide two data dirs and silently serve the wrong
    * materialized assets.
    */
  private def storeKey(sfDir: String, kind: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sfDir.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    val base = new java.io.File(sfDir).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    s"$kind-$base-$digest"
  }

  private def materialized(
      spark: SparkSession, sfDir: String, kind: String)(
      render: => DataFrame): DataFrame = {
    // computeIfAbsent only installs a memoized thunk — cheap, so the
    // map's bin lock is never held across a Spark job. The render +
    // parquet write runs on first call of the thunk, serialized per key
    // by the lazy val's own monitor (concurrent first callers block on
    // the key being built, not on unrelated keys in the same bin).
    val holder = materializedDirs.computeIfAbsent(storeKey(sfDir, kind), key => {
      lazy val dir: String = {
        val d = s"$assetScratchDir/$key"
        render.write.mode("overwrite").parquet(d)
        d
      }
      () => dir
    })
    spark.read.parquet(holder())
  }

  /** [[imageAssets]]/[[audioAssets]]/[[videoAssets]] through the
    * materialized store — what the registered queries consume. The read
    * goes through [[Rebalance.scanWide]]: the fixture-sized store can
    * come back as a handful of splits (file bin-packing), which would
    * cap the expensive decode stages downstream at that width; on a
    * production-sized store the gate is the identity and the scan's own
    * thousands of splits carry the parallelism.
    */
  def imageAssetsStored(spark: SparkSession, sfDir: String): DataFrame =
    Rebalance.scanWide(
      materialized(spark, sfDir, "image")(imageAssets(spark, sfDir)), col("asset_id"))
  def audioAssetsStored(spark: SparkSession, sfDir: String): DataFrame =
    Rebalance.scanWide(
      materialized(spark, sfDir, "audio")(audioAssets(spark, sfDir)), col("asset_id"))
  def videoAssetsStored(spark: SparkSession, sfDir: String): DataFrame =
    Rebalance.scanWide(
      materialized(spark, sfDir, "video")(videoAssets(spark, sfDir)), col("asset_id"))

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

  /** Engine-independent 4-decimal rounding (same floor spelling as
    * Dedup/TextAnalysis — plain round() diverges between engines on
    * half-way doubles, which ratio features hit routinely).
    */
  private def r4(c: org.apache.spark.sql.Column) = floor(c * 10000 + 0.5) / 10000
  private def r4duck(e: String) = s"floor(($e) * 10000 + 0.5) / 10000"

  /** The full decode→featurize pipeline as a VERIFIED query over all
    * three stored asset kinds: render on executors, decode for real
    * (ImageIO / javax.sound / GVID parse), featurize with
    * [[extractFeatures]], emit 8 features per asset. The DuckDB oracle
    * recomputes every feature from doc_id arithmetic alone — image bins
    * from the red ramp's per-bin overlap (count(x ∈ bin)/w, h cancels),
    * audio phases from the 400-sample ramp's modular means
    * (amp·(196+j)/32767 — 8 divides 400, so phase j sees exactly the
    * values j, j+8, …, j+392), video bins from the per-frame flat green
    * fill ((id+f) mod 256 ÷ 32). Every quantity is an exact integer
    * ratio evaluated with the same IEEE ops on both engines, so the
    * hash match proves the real decodes fed the featurizers correctly.
    * This row retires round 6's `mm_stub_features` (no-oracle stub).
    */
  val realFeaturesQuery = QueryDef(
    "mm_real_features", {
      val imgF = (0 until 8).map(k =>
        s"${r4duck(s"greatest(0, least(${32 * (k + 1)}, w) - ${32 * k}) / w")} AS f$k")
        .mkString(",\n      |       ")
      val audF = (0 until 8).map(j =>
        s"${r4duck(s"amp * ${196 + j} / 32767.0")} AS f$j")
        .mkString(",\n      |       ")
      val vidF = (0 until 8).map(k =>
        s"${r4duck(s"CAST(sum(CASE WHEN b = $k THEN 1 ELSE 0 END) AS DOUBLE) / count(*)")} AS f$k")
        .mkString(",\n      |       ")
      s"""WITH img_f AS (
      |  SELECT asset_id, kind,
      |       $imgF
      |  FROM (SELECT doc_id AS asset_id, 'image' AS kind,
      |               CAST(64 + (doc_id % 16) * 8 AS DOUBLE) AS w
      |        FROM documents WHERE doc_id % 3 = 0)),
      |aud_f AS (
      |  SELECT asset_id, kind,
      |       $audF
      |  FROM (SELECT doc_id AS asset_id, 'audio' AS kind,
      |               CAST(doc_id % 16 + 1 AS DOUBLE) AS amp
      |        FROM documents WHERE doc_id % 3 = 1)),
      |vid_b AS (
      |  SELECT doc_id, ((doc_id + f) % 256) // 32 AS b
      |  FROM (SELECT doc_id, unnest(generate_series(0, CAST(1 + doc_id % 7 AS BIGINT), 1)) AS f
      |        FROM documents WHERE doc_id % 3 = 2)),
      |vid_f AS (
      |  SELECT doc_id AS asset_id, 'video' AS kind,
      |       $vidF
      |  FROM vid_b GROUP BY doc_id)
      |SELECT * FROM img_f UNION ALL SELECT * FROM aud_f UNION ALL SELECT * FROM vid_f
      |ORDER BY asset_id""".stripMargin
    })(
    (s, d) => {
      val assets = Seq(imageAssetsStored(s, d), audioAssetsStored(s, d), videoAssetsStored(s, d))
        .map(_.select("asset_id", "kind", "payload"))
        .reduce(_ unionByName _)
      extractFeatures(assets).toDF()
        .select(col("asset_id") +: col("kind") +:
          (0 until 8).map(j => r4(element_at(col("features"), j + 1)).as(s"f$j")): _*)
        .orderBy("asset_id")
    })

  /** End-to-end REAL image pipeline as a verified query: render PNG bytes
    * on the executors, decode them back with ImageIO, emit measured dims
    * and exact channel means. The DuckDB oracle recomputes every output
    * from (doc_id)-arithmetic alone — it never touches a pixel — so a
    * hash match proves the encode→decode round trip reproduced the test
    * pattern exactly. avg_r = (width-1)/2 because red ramps with x and
    * every width here is < 256; the other channels are flat fills.
    */
  val imageDecodeQuery = QueryDef(
    "mm_image_decode",
    """SELECT doc_id AS asset_id,
      |       CAST(64 + (doc_id % 16) * 8 AS INTEGER) AS width,
      |       CAST(64 + (doc_id % 9) * 8 AS INTEGER) AS height,
      |       round((64 + (doc_id % 16) * 8 - 1) / 2.0, 4) AS avg_r,
      |       round(CAST(doc_id % 256 AS DOUBLE), 4) AS avg_g,
      |       round(CAST((doc_id * 37) % 128 + 64 AS DOUBLE), 4) AS avg_b
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY asset_id""".stripMargin)(
    (s, d) => decodeImageStats(imageAssetsStored(s, d))
      .select(col("asset_id"), col("width"), col("height"),
        round(col("avg_r"), 4).as("avg_r"),
        round(col("avg_g"), 4).as("avg_g"),
        round(col("avg_b"), 4).as("avg_b"))
      .orderBy("asset_id"))

  /** Executed-resize pipeline as a verified query: render PNGs, decode,
    * nearest-neighbor downscale 2× at decode time, emit resized dims and
    * exact channel means. The oracle recomputes them from arithmetic:
    * sampling every 2nd column of the red ramp keeps xs {0,2,…,w−2}, so
    * avg_r = (w−2)/2 exactly; the flat fills are sampling-invariant —
    * which is precisely what a correct sample-don't-average resize must
    * preserve. Closes the loop [[planResize]] opens (plan carries the
    * target; decode executes it).
    */
  val imageResizeQuery = QueryDef(
    "mm_image_resize",
    """SELECT doc_id AS asset_id,
      |       CAST((64 + (doc_id % 16) * 8) // 2 AS INTEGER) AS target_width,
      |       CAST((64 + (doc_id % 9) * 8) // 2 AS INTEGER) AS target_height,
      |       round(CAST(64 + (doc_id % 16) * 8 - 2 AS DOUBLE) / 2.0, 4) AS avg_r,
      |       round(CAST(doc_id % 256 AS DOUBLE), 4) AS avg_g,
      |       round(CAST((doc_id * 37) % 128 + 64 AS DOUBLE), 4) AS avg_b
      |FROM documents WHERE doc_id % 3 = 0
      |ORDER BY asset_id""".stripMargin)(
    (s, d) => decodeImageResized(imageAssetsStored(s, d), factor = 2)
      .select(col("asset_id"), col("target_width"), col("target_height"),
        round(col("avg_r"), 4).as("avg_r"),
        round(col("avg_g"), 4).as("avg_g"),
        round(col("avg_b"), 4).as("avg_b"))
      .orderBy("asset_id"))

  /** End-to-end REAL audio pipeline as a verified query: render WAV bytes
    * on the executors, decode them back with javax.sound, emit the
    * measured rate, frame count, peak and mean amplitude. The DuckDB
    * oracle recomputes every output from (doc_id)-arithmetic alone — a
    * hash match proves the WAV encode→decode round trip reproduced the
    * ramp exactly. n_samples = rate/20 (50 ms clip), peak = 399·amp,
    * mean = 199.5·amp with amp = doc_id % 16 + 1 (see [[renderWav]]).
    */
  val audioDecodeQuery = QueryDef(
    "mm_audio_decode",
    """SELECT doc_id AS asset_id,
      |       CAST(8000 + (doc_id % 5) * 8000 AS INTEGER) AS sample_rate,
      |       CAST((8000 + (doc_id % 5) * 8000) // 20 AS BIGINT) AS n_samples,
      |       CAST(399 * (doc_id % 16 + 1) AS INTEGER) AS peak,
      |       CAST(round(199.5 * (doc_id % 16 + 1), 4) AS DOUBLE) AS mean_amp
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY asset_id""".stripMargin)(
    (s, d) => decodeAudioStats(audioAssetsStored(s, d))
      .select(col("asset_id"), col("sample_rate"), col("n_samples"), col("peak"),
        round(col("mean_amp"), 4).as("mean_amp"))
      .orderBy("asset_id"))

  /** End-to-end REAL video pipeline as a verified query: render GVID
    * containers of PNG frames on the executors, parse the container back,
    * ImageIO-decode every frame, emit per-frame measured dims and exact
    * channel means. The DuckDB oracle recomputes every output from
    * (doc_id, frame_idx)-arithmetic alone — a hash match proves the
    * container round trip preserved frame ORDER (green/blue fills vary
    * per frame) as well as every pixel. Frames are 64×48 with red ramping
    * over x, so avg_r = 31.5 exactly; n_frames = 2 + id mod 7
    * ([[videoFrameCount]]).
    */
  val videoDecodeQuery = QueryDef(
    "mm_video_decode",
    """SELECT doc_id AS asset_id,
      |       CAST(2 + doc_id % 7 AS INTEGER) AS n_frames,
      |       CAST(f AS INTEGER) AS frame_idx,
      |       CAST(64 AS INTEGER) AS width,
      |       CAST(48 AS INTEGER) AS height,
      |       round(CAST(31.5 AS DOUBLE), 4) AS avg_r,
      |       round(CAST((doc_id + f) % 256 AS DOUBLE), 4) AS avg_g,
      |       round(CAST((doc_id * 37 + f * 11) % 128 + 64 AS DOUBLE), 4) AS avg_b
      |FROM (SELECT doc_id, unnest(generate_series(0, CAST(1 + doc_id % 7 AS BIGINT), 1)) AS f
      |      FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY asset_id, frame_idx""".stripMargin)(
    (s, d) => decodeVideoStats(videoAssetsStored(s, d))
      .select(col("asset_id"), col("n_frames"), col("frame_idx"),
        col("width"), col("height"),
        round(col("avg_r"), 4).as("avg_r"),
        round(col("avg_g"), 4).as("avg_g"),
        round(col("avg_b"), 4).as("avg_b"))
      .orderBy("asset_id", "frame_idx"))

  /** Strided-audio pipeline as a verified query: keep every 2nd sample.
    * The kept grid is i ∈ {0,2,…,n−2}; the ramp takes each even value
    * {0,2,…,398}·amp equally often (n is a whole number of 400-sample
    * periods), so mean = 199·amp and peak = 398·amp exactly — shifted
    * from the full decode's 199.5/399, which is how the oracle proves
    * the stride actually skipped the odd samples.
    */
  val audioSampleQuery = QueryDef(
    "mm_audio_sample",
    """SELECT doc_id AS asset_id,
      |       CAST(8000 + (doc_id % 5) * 8000 AS INTEGER) AS sample_rate,
      |       CAST((8000 + (doc_id % 5) * 8000) // 40 AS BIGINT) AS n_samples,
      |       CAST(398 * (doc_id % 16 + 1) AS INTEGER) AS peak,
      |       CAST(round(199.0 * (doc_id % 16 + 1), 4) AS DOUBLE) AS mean_amp
      |FROM documents WHERE doc_id % 3 = 1
      |ORDER BY asset_id""".stripMargin)(
    (s, d) => decodeAudioSampled(audioAssetsStored(s, d), stride = 2)
      .select(col("asset_id"), col("sample_rate"), col("n_samples"), col("peak"),
        round(col("mean_amp"), 4).as("mean_amp"))
      .orderBy("asset_id"))

  /** Sparse-decode pipeline as a verified query: decode every 2nd frame
    * via index seeks; the oracle generates exactly the even frame
    * indices with the same per-frame arithmetic as [[videoDecodeQuery]].
    * A hash match proves the seek math lands on frame boundaries — a
    * one-byte-off index would decode garbage or throw, not match.
    */
  val videoSampleQuery = QueryDef(
    "mm_video_sample",
    """SELECT doc_id AS asset_id,
      |       CAST(f AS INTEGER) AS frame_idx,
      |       CAST(64 AS INTEGER) AS width,
      |       CAST(48 AS INTEGER) AS height,
      |       round(CAST(31.5 AS DOUBLE), 4) AS avg_r,
      |       round(CAST((doc_id + f) % 256 AS DOUBLE), 4) AS avg_g,
      |       round(CAST((doc_id * 37 + f * 11) % 128 + 64 AS DOUBLE), 4) AS avg_b
      |FROM (SELECT doc_id, unnest(generate_series(0, CAST(1 + doc_id % 7 AS BIGINT), 2)) AS f
      |      FROM documents WHERE doc_id % 3 = 2)
      |ORDER BY asset_id, frame_idx""".stripMargin)(
    (s, d) => decodeVideoSampled(videoAssetsStored(s, d), stride = 2)
      .select(col("asset_id"), col("frame_idx"), col("width"), col("height"),
        round(col("avg_r"), 4).as("avg_r"),
        round(col("avg_g"), 4).as("avg_g"),
        round(col("avg_b"), 4).as("avg_b"))
      .orderBy("asset_id", "frame_idx"))

  /** PERCEPTUAL (average) HASH over decoded pixels — the image-side
    * near-dup detector (the multimodal member of the Dedup family).
    * Low byte: 8 band bits — partition the image into 8 vertical bands,
    * bit j = band j's gray mass above the global mean (the structural
    * half: WHERE the light is). Second byte: the global mean gray level
    * quantized to 0..255 (the luminance half: HOW bright). Two images
    * collide iff they share both coarse structure and brightness — the
    * standard aHash construction with its implicit gray normalization
    * made explicit. All comparisons are integer cross-multiplications
    * over exact channel sums (block_sum·total_px vs total_sum·block_px)
    * and one integer division for the luminance byte — no float
    * thresholds, so the hash is bit-reproducible across engines and the
    * oracle can recompute it from render arithmetic without seeing a
    * pixel.
    *
    * Scale shape: decode is the same mapPartitions batch as
    * [[decodeImageStats]]; what shuffles afterward is one 5-column stat
    * row per image (not payloads), hash-partitioned by phash for the
    * cluster window — the grouping a dup-cluster sweep needs anyway.
    * 8 vertical bands (not the full 8×8 grid) because the test
    * pattern's rows are identical — an 8×8 hash would just repeat each
    * band bit 8 times; the banding generalizes by swapping the block
    * geometry inside the decode loop.
    */
  def imagePerceptualHash(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val hashed = assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // per-task decoder setup
        rows.map { case (id, payload) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
          require(img != null, s"asset $id: undecodable image payload")
          val (w, h) = (img.getWidth, img.getHeight)
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          // gray mass (r+g+b) per vertical band, exact integers
          val colSum = new Array[Long](w)
          var i = 0
          while (i < px.length) {
            val rgb = px(i)
            colSum(i % w) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            i += 1
          }
          var total = 0L
          var x = 0
          while (x < w) { total += colSum(x); x += 1 }
          var bandBits = 0L
          var j = 0
          while (j < 8) {
            val lo = j * w / 8
            val hi = (j + 1) * w / 8
            var bs = 0L
            var k = lo
            while (k < hi) { bs += colSum(k); k += 1 }
            // block mean > global mean, integer cross-multiplication
            if (bs * w > total * (hi - lo)) bandBits |= 1L << j
            j += 1
          }
          // mean gray level 0..255 (total is a 3-channel mass), floored
          val meanGray = total / (w.toLong * h * 3)
          (id, w, h, (meanGray << 8) | bandBits)
        }
      }
      .toDF("asset_id", "width", "height", "phash")
    val byHash = Window.partitionBy("phash")
    hashed
      .withColumn("n_dups", count(lit(1)).over(byHash))
      .withColumn("canonical_id", min(col("asset_id")).over(byHash))
  }

  /** Phash pipeline as a verified query: render PNGs, decode, hash,
    * cluster by hash. The oracle recomputes each band's gray mass from
    * the ramp arithmetic (sum of x over the band plus the flat fills,
    * per [[renderPng]]) and replays the identical integer
    * cross-multiplication — so a hash match proves the decode-side
    * banding landed on exactly the advertised block boundaries AND the
    * cluster sizes (n_dups/canonical) that follow from them.
    */
  /** The phash closed-form CTE chain (shared by [[imagePhashQuery]] and
    * [[mmDedupCanonicalQuery]]): recompute every band bit and the
    * luminance byte from render arithmetic, never touching a pixel.
    */
  private val phashOracleCtes: String =
    """WITH img AS (
      |  SELECT doc_id AS asset_id,
      |         64 + (doc_id % 16) * 8 AS w,
      |         64 + (doc_id % 9) * 8 AS h,
      |         doc_id % 256 AS g,
      |         (doc_id * 37) % 128 + 64 AS b
      |  FROM documents WHERE doc_id % 3 = 0
      |), bands AS (
      |  SELECT asset_id, w, h, j,
      |         (j * w) // 8 AS lo, ((j + 1) * w) // 8 AS hi
      |  FROM img, (SELECT unnest(generate_series(0, 7, 1)) AS j)
      |), bits AS (
      |  SELECT asset_id, w, h, j,
      |         CASE WHEN ((hi * (hi - 1) - lo * (lo - 1)) // 2 + (hi - lo) * (g + b)) * w
      |                   > (w * (w - 1) // 2 + w * (g + b)) * (hi - lo)
      |              THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bit
      |  FROM bands JOIN img USING (asset_id, w, h)
      |), hashed AS (
      |  SELECT asset_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
      |         CAST(((h * (w * (w - 1) // 2 + w * (g + b))) // (w * h * 3)) * 256
      |              + sum(bit) AS BIGINT) AS phash
      |  FROM bits JOIN img USING (asset_id, w, h) GROUP BY asset_id, w, h, g, b
      |)""".stripMargin

  val imagePhashQuery = QueryDef(
    "mm_image_phash",
    s"""$phashOracleCtes
       |SELECT asset_id, width, height, phash,
       |       CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_dups,
       |       CAST(min(asset_id) OVER (PARTITION BY phash) AS BIGINT) AS canonical_id
       |FROM hashed ORDER BY asset_id""".stripMargin)(
    (s, d) => imagePerceptualHash(imageAssetsStored(s, d)).orderBy("asset_id"))

  /** The fingerprint USED as a dedup gate — the multimodal analog of
    * Dedup's canonical-survivor queries: one asset per phash cluster
    * (min asset_id) survives, joined back to its document row, so the
    * output is the visually-deduplicated training corpus slice. The
    * survivor set is cluster-count-sized; at scale the join to the doc
    * table shuffles ids, never payloads (the decode already reduced
    * each image to a 5-column stat row).
    */
  val mmDedupCanonicalQuery = QueryDef(
    "mm_dedup_canonical",
    s"""$phashOracleCtes, clustered AS (
       |  SELECT asset_id, phash,
       |         CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_dups,
       |         min(asset_id) OVER (PARTITION BY phash) AS canonical_id
       |  FROM hashed
       |)
       |SELECT c.asset_id AS doc_id, c.phash, c.n_dups, d.n_chars
       |FROM clustered c JOIN documents d ON d.doc_id = c.asset_id
       |WHERE c.asset_id = c.canonical_id
       |ORDER BY doc_id""".stripMargin)(
    (s, d) => {
      val clustered = imagePerceptualHash(imageAssetsStored(s, d))
      clustered
        .filter(col("asset_id") === col("canonical_id"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          col("asset_id") === col("doc_id"))
        .select(col("doc_id"), col("phash"), col("n_dups"), col("n_chars"))
        .orderBy("doc_id")
    })

  /** ACOUSTIC FINGERPRINT over decoded PCM — the audio member of the
    * near-dup family, same two-part construction as
    * [[imagePerceptualHash]]: low byte = 8 temporal-segment bits
    * (segment energy above the clip mean — WHERE in time the energy
    * sits), second byte = the mean amplitude quantized by 16 (HOW loud).
    * Segment comparison is an integer cross-multiplication over exact
    * sample sums (equal-length segments, so segment_sum·8 vs total_sum),
    * bit-reproducible across engines. A production system would swap the
    * time-domain segment energies for band energies off an FFT; the
    * fingerprint algebra, clustering, and batch shape stay.
    *
    * Scale shape: decode via the same mapPartitions batch as
    * [[decodeAudioStats]]; only a 4-column stat row per clip shuffles
    * afterward, hash-partitioned by fingerprint for the cluster window.
    */
  def audioFingerprint(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    import spark.implicits._
    val hashed = assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val rate = ais.getFormat.getSampleRate.toInt
        val bytes =
          try ais.readAllBytes()
          finally ais.close()
        val n = bytes.length / 2
        require(n > 0 && n % 8 == 0, s"asset $id: clip length $n not segmentable by 8")
        val segLen = n / 8
        val segSum = new Array[Long](8)
        var total = 0L
        var i = 0
        while (i < n) {
          val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
          segSum(i / segLen) += s
          total += s
          i += 1
        }
        var bits = 0L
        var j = 0
        while (j < 8) {
          // segment mean > clip mean; segments are equal-length so the
          // cross-multiplication reduces to segment_sum * 8 vs total
          if (segSum(j) * 8 > total) bits |= 1L << j
          j += 1
        }
        val meanQ = total / (n.toLong * 16) // mean amplitude, 16-wide buckets
        (id, rate, n.toLong, (meanQ << 8) | bits)
      })
      .toDF("asset_id", "sample_rate", "n_samples", "afp")
    val byFp = Window.partitionBy("afp")
    hashed
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .withColumn("canonical_id", min(col("asset_id")).over(byFp))
  }

  /** Fingerprint pipeline as a verified query. The oracle recomputes
    * each segment's sample mass from the ramp arithmetic: sample i =
    * (i mod 400)·amp, so a segment [lo, hi) sums to amp·(F(hi) − F(lo))
    * with F(x) = (x div 400)·79800 + T(x mod 400), T(m) = m(m−1)/2 —
    * exact integers even where a segment straddles a period boundary
    * (rates 24000/40000), which is precisely what proves the decode-side
    * segmentation walked the real sample grid and not a resynthesized
    * one.
    */
  val audioFingerprintQuery = QueryDef(
    "mm_audio_fingerprint",
    """WITH aud AS (
      |  SELECT doc_id AS asset_id,
      |         CAST(8000 + (doc_id % 5) * 8000 AS BIGINT) AS rate,
      |         CAST(doc_id % 16 + 1 AS BIGINT) AS amp
      |  FROM documents WHERE doc_id % 3 = 1
      |), params AS (
      |  SELECT asset_id, rate, amp, rate // 20 AS n, rate // 160 AS seg FROM aud
      |), segs AS (
      |  SELECT asset_id, rate, amp, n, j, j * seg AS lo, (j + 1) * seg AS hi
      |  FROM params, (SELECT unnest(generate_series(0, 7, 1)) AS j)
      |), sums AS (
      |  SELECT asset_id, rate, amp, n, j,
      |         amp * ((hi // 400) * 79800 + (hi % 400) * ((hi % 400) - 1) // 2
      |              - ((lo // 400) * 79800 + (lo % 400) * ((lo % 400) - 1) // 2)) AS seg_sum,
      |         amp * (n // 400) * 79800 AS total
      |  FROM segs
      |), bits AS (
      |  SELECT asset_id, rate, n, total,
      |         CASE WHEN seg_sum * 8 > total THEN CAST(1 AS BIGINT) << j ELSE 0 END AS bit
      |  FROM sums
      |), hashed AS (
      |  SELECT asset_id, CAST(rate AS INTEGER) AS sample_rate, n AS n_samples,
      |         CAST((total // (n * 16)) * 256 + sum(bit) AS BIGINT) AS afp
      |  FROM bits GROUP BY asset_id, rate, n, total
      |)
      |SELECT asset_id, sample_rate, n_samples, afp,
      |       CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS n_dups,
      |       CAST(min(asset_id) OVER (PARTITION BY afp) AS BIGINT) AS canonical_id
      |FROM hashed ORDER BY asset_id""".stripMargin)(
    (s, d) => audioFingerprint(audioAssetsStored(s, d)).orderBy("asset_id"))

  /** CLIP FINGERPRINT — the video member of the near-dup family,
    * completing the modality triple ([[imagePerceptualHash]],
    * [[audioFingerprint]]): the frame count packed above the luminance
    * bytes of the first (up to) four frames. Only those frames are
    * DECODED — the container's length index seeks past the rest, so
    * per-clip signature cost is O(sampled frames) regardless of clip
    * length, the property that makes fingerprinting hour-long videos
    * viable (the same index contract [[parseVideoFramesStrided]]
    * documents). Frame luminance is the exact integer mean gray level —
    * no float thresholds, oracle-reproducible from render arithmetic.
    */
  def videoFingerprint(assets: DataFrame, sampleFramesMax: Int = 4): DataFrame = {
    require(sampleFramesMax >= 1 && sampleFramesMax <= 4,
      s"sampleFramesMax must be in [1, 4] to fit the packed signature (got $sampleFramesMax)")
    val spark = assets.sparkSession
    import spark.implicits._
    val hashed = assets.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, payload) =>
          val bb = java.nio.ByteBuffer.wrap(payload)
          require(bb.getInt() == VideoMagic, s"asset $id: not a GVID container")
          val n = bb.getInt()
          require(n >= 1, s"asset $id: empty clip")
          require(8L + 4L * n <= payload.length,
            s"asset $id: corrupt GVID index") // header bounds before use
          val lengths = Array.fill(n)(bb.getInt())
          var offset = 8 + 4 * n
          var sig = 0L
          var f = 0
          while (f < n && f < sampleFramesMax) { // decode ONLY sampled frames
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload, offset, lengths(f)))
            require(img != null, s"asset $id: frame $f undecodable")
            val (w, h) = (img.getWidth, img.getHeight)
            val (sr, sg, sb) = sumChannels(img.getRGB(0, 0, w, h, null, 0, w))
            val lum = (sr + sg + sb) / (w.toLong * h * 3)
            sig |= lum << (8 * f)
            offset += lengths(f)
            f += 1
          }
          (id, n, (n.toLong << 32) | sig)
        }
      }
      .toDF("asset_id", "n_frames", "vfp")
    val byFp = Window.partitionBy("vfp")
    hashed
      .withColumn("n_dups", count(lit(1)).over(byFp))
      .withColumn("canonical_id", min(col("asset_id")).over(byFp))
  }

  /** Clip-fingerprint pipeline as a verified query. Frame f of clip id
    * has flat fills g = (id+f) mod 256, b = (37·id+11·f) mod 128 + 64
    * over the 64×48 red ramp ([[renderVideo]]), so its mean gray level
    * is (2016 + 64·(g+b)) // 192 exactly — the oracle packs the same
    * bytes and a mismatch would expose a decode that sampled the wrong
    * frames, decoded them out of order, or mis-seeked the index.
    */
  val videoFingerprintQuery = QueryDef(
    "mm_video_fingerprint",
    """WITH vid AS (
      |  SELECT doc_id AS asset_id, CAST(2 + doc_id % 7 AS BIGINT) AS n
      |  FROM documents WHERE doc_id % 3 = 2
      |), sampled AS (
      |  SELECT asset_id, n,
      |         unnest(generate_series(0, least(n, 4) - 1, 1)) AS f
      |  FROM vid
      |), lums AS (
      |  SELECT asset_id, n, f,
      |         (2016 + 64 * (((asset_id + f) % 256)
      |                     + ((asset_id * 37 + f * 11) % 128 + 64))) // 192 AS lum
      |  FROM sampled
      |), hashed AS (
      |  SELECT asset_id, CAST(n AS INTEGER) AS n_frames,
      |         CAST((n << 32) + sum(lum * (CAST(1 AS BIGINT) << (8 * f))) AS BIGINT) AS vfp
      |  FROM lums GROUP BY asset_id, n
      |)
      |SELECT asset_id, n_frames, vfp,
      |       CAST(count(*) OVER (PARTITION BY vfp) AS BIGINT) AS n_dups,
      |       CAST(min(asset_id) OVER (PARTITION BY vfp) AS BIGINT) AS canonical_id
      |FROM hashed ORDER BY asset_id""".stripMargin)(
    (s, d) => videoFingerprint(videoAssetsStored(s, d)).orderBy("asset_id"))

  val all: Seq[QueryDef] =
    Seq(metadataStats, frameSampleQuery, realFeaturesQuery, imageDecodeQuery, imageResizeQuery,
      audioDecodeQuery, audioSampleQuery, videoDecodeQuery, videoSampleQuery, imagePhashQuery,
      audioFingerprintQuery, videoFingerprintQuery, mmDedupCanonicalQuery)
}
