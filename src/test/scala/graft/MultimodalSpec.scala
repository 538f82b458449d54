package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing — schema, batch shape, determinism, fan-out
  * control. Image (PNG), audio (WAV) and video (GVID container of PNG
  * frames) decode are real, and so is feature extraction (deterministic
  * decode-derived histograms / polyphase means per kind).
  */
class MultimodalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("synthetic assets carry the full typed schema with binary payload") {
    val a = Multimodal.syntheticAssets(spark, sf)
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.schema.fieldNames.toSeq == Seq(
      "asset_id", "kind", "payload", "width", "height", "sample_rate", "duration_ms"))
    assert(a.select("kind").distinct().count() == 3)
  }

  test("feature extraction is deterministic and partition-independent") {
    val assets = Seq(
      Multimodal.imageAssets(spark, sf),
      Multimodal.audioAssets(spark, sf),
      Multimodal.videoAssets(spark, sf))
      .map(_.select("asset_id", "kind", "payload"))
      .reduce(_ unionByName _)
    val once = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    // Different partitioning must not change any feature vector
    // (mapPartitions semantics: per-row pure function).
    val repart = Multimodal.extractFeatures(assets.repartition(7)).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    assert(once == repart)
    assert(once.nonEmpty)
    assert(once.values.forall(_.length == 8))
    assert(once.values.forall(_.forall(v => v >= 0.0 && v <= 1.0)))
  }

  test("real featurizers match the render arithmetic per kind") {
    // image: red ramps with x → bin k holds h·overlap(k) of w·h pixels
    val (id, w, h) = (7L, 96, 72)
    val imgF = Multimodal.imageFeatureVec(Multimodal.renderPng(id, w, h), 8)
    (0 until 8).foreach { k =>
      val overlap = math.max(0, math.min(32 * (k + 1), w) - 32 * k)
      assert(imgF(k) == (overlap.toLong * h).toDouble / (w.toLong * h), s"image bin $k")
    }
    // audio: phase j of the 400-sample ramp sees values j, j+8, …, j+392
    // → mean amp·(196+j), normalized by full-scale 32767
    val rate = 16000
    val amp = (id % 16 + 1).toDouble
    val audF = Multimodal.audioFeatureVec(Multimodal.renderWav(id, rate), 8)
    (0 until 8).foreach { j =>
      assert(audF(j) == amp * (196 + j) / 32767.0, s"audio phase $j")
    }
    // video: frame f's flat green fill (id+f) mod 256 lands whole in one bin
    val n = Multimodal.videoFrameCount(id)
    val vidF = Multimodal.videoFeatureVec(Multimodal.renderVideo(id), 8)
    (0 until 8).foreach { k =>
      val expect = (0 until n).count(f => ((id + f) % 256) / 32 == k).toDouble / n
      assert(vidF(k) == expect, s"video bin $k")
    }
  }

  test("planResize preserves aspect ratio and never upscales") {
    val out = Multimodal.planResize(Multimodal.syntheticAssets(spark, sf), maxSide = 96)
      .select("width", "height", "target_width", "target_height").collect()
    out.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(tw <= 96 && th <= 96)
      assert(tw <= w && th <= h)
      if (w > 96 || h > 96) assert(tw == 96 || th == 96) // longest side hits the cap
    }
  }

  test("image assets are real PNG files and ImageIO decode recovers dims and pixels exactly") {
    val imgs = Multimodal.imageAssets(spark, sf).cache()
    try {
      val rows = imgs.collect()
      assert(rows.nonEmpty)
      // Real PNG container: every payload starts with the PNG signature.
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      rows.foreach { r =>
        assert(r.getAs[Array[Byte]]("payload").take(8).sameElements(sig),
          s"asset ${r.getLong(0)} payload is not a PNG")
      }
      // Decode on executors; measured dims must equal the render metadata
      // and channel means must match the test pattern's arithmetic.
      val decoded = Multimodal.decodeImageStats(imgs).collect()
      assert(decoded.length == rows.length)
      val meta = rows.map(r => r.getLong(0) -> ((r.getInt(3), r.getInt(4)))).toMap
      decoded.foreach { r =>
        val id = r.getLong(0)
        val (w, h) = meta(id)
        assert(r.getInt(1) == w && r.getInt(2) == h, s"asset $id dims")
        assert(r.getDouble(3) == (w - 1) / 2.0, s"asset $id avg_r") // red ramps with x
        assert(r.getDouble(4) == (id % 256).toDouble, s"asset $id avg_g")
        assert(r.getDouble(5) == ((id * 37) % 128 + 64).toDouble, s"asset $id avg_b")
      }
    } finally imgs.unpersist(blocking = true)
  }

  test("audio assets are real WAV files and javax.sound decode recovers rate and samples exactly") {
    val auds = Multimodal.audioAssets(spark, sf).cache()
    try {
      val rows = auds.collect()
      assert(rows.nonEmpty)
      // Real WAV container: RIFF chunk wrapping a WAVE form.
      rows.foreach { r =>
        val p = r.getAs[Array[Byte]]("payload")
        assert(new String(p.take(4), "US-ASCII") == "RIFF" &&
          new String(p.slice(8, 12), "US-ASCII") == "WAVE",
          s"asset ${r.getLong(0)} payload is not a WAV")
      }
      // Decode on executors; measured format and sample stats must match
      // the ramp arithmetic (see Multimodal.renderWav scaladoc).
      val decoded = Multimodal.decodeAudioStats(auds).collect()
      assert(decoded.length == rows.length)
      decoded.foreach { r =>
        val id = r.getLong(0)
        val rate = (8000 + (id % 5) * 8000).toInt
        val amp = (id % 16 + 1).toInt
        assert(r.getInt(1) == rate, s"asset $id rate")
        assert(r.getLong(2) == rate / 20, s"asset $id n_samples")
        assert(r.getInt(3) == 399 * amp, s"asset $id peak")
        assert(r.getDouble(4) == 199.5 * amp, s"asset $id mean")
      }
    } finally auds.unpersist(blocking = true)
  }

  test("executed resize samples the exact grid: dims halve, ramp mean shifts, fills invariant") {
    val imgs = Multimodal.imageAssets(spark, sf).cache()
    try {
      val full = Multimodal.decodeImageStats(imgs).collect()
        .map(r => r.getLong(0) -> r).toMap
      val half = Multimodal.decodeImageResized(imgs, factor = 2).collect()
      assert(half.length == full.size && half.nonEmpty)
      half.foreach { r =>
        val id = r.getLong(0)
        val f = full(id)
        assert(r.getInt(1) == f.getInt(1) / 2 && r.getInt(2) == f.getInt(2) / 2, s"dims $id")
        // red ramps with x: sampling x∈{0,2,…,w−2} gives mean (w−2)/2,
        // exactly 0.5 below the full image's (w−1)/2
        assert(r.getDouble(3) == f.getDouble(3) - 0.5, s"avg_r $id")
        // flat fills must be untouched by any correct sampling resize
        assert(r.getDouble(4) == f.getDouble(4) && r.getDouble(5) == f.getDouble(5), s"fills $id")
      }
    } finally imgs.unpersist(blocking = true)
  }

  test("video assets are real GVID containers of PNG frames; decode recovers order and pixels") {
    val vids = Multimodal.videoAssets(spark, sf).cache()
    try {
      val rows = vids.collect()
      assert(rows.nonEmpty)
      // Real container: GVID magic, then a parseable index of PNG frames.
      val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      rows.foreach { r =>
        val p = r.getAs[Array[Byte]]("payload")
        assert(new String(p.take(4), "US-ASCII") == "GVID",
          s"asset ${r.getLong(0)} payload is not a GVID container")
        // First frame starts right after the header+index and is a PNG.
        val n = java.nio.ByteBuffer.wrap(p, 4, 4).getInt
        assert(p.slice(8 + 4 * n, 16 + 4 * n).sameElements(sig),
          s"asset ${r.getLong(0)} frame 0 is not a PNG")
      }
      // Decode on executors; per-frame stats must match the pattern
      // arithmetic, and the frame-varying fills prove ORDER is preserved.
      val decoded = Multimodal.decodeVideoStats(vids).collect()
      val byAsset = decoded.groupBy(_.getLong(0))
      assert(byAsset.size == rows.length)
      byAsset.foreach { case (id, frames) =>
        assert(frames.length == Multimodal.videoFrameCount(id), s"asset $id frame count")
        frames.sortBy(_.getInt(2)).zipWithIndex.foreach { case (r, f) =>
          assert(r.getInt(1) == frames.length && r.getInt(2) == f, s"asset $id idx")
          assert(r.getInt(3) == 64 && r.getInt(4) == 48, s"asset $id dims")
          assert(r.getDouble(5) == 31.5, s"asset $id avg_r")
          assert(r.getDouble(6) == ((id + f) % 256).toDouble, s"asset $id frame $f avg_g")
          assert(r.getDouble(7) == ((id * 37 + f * 11) % 128 + 64).toDouble,
            s"asset $id frame $f avg_b")
        }
      }
    } finally vids.unpersist(blocking = true)
  }

  test("strided video decode seeks via the index and agrees with the full decode") {
    val vids = Multimodal.videoAssets(spark, sf).cache()
    try {
      val full = Multimodal.decodeVideoStats(vids).collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> (r.getDouble(5), r.getDouble(6), r.getDouble(7)))
        .toMap
      val strided = Multimodal.decodeVideoSampled(vids, stride = 3).collect()
      assert(strided.nonEmpty)
      // exactly the f % 3 == 0 frames, with identical stats
      strided.foreach { r =>
        val key = (r.getLong(0), r.getInt(1))
        assert(key._2 % 3 == 0, s"decoded a non-strided frame $key")
        assert(full(key) == ((r.getDouble(4), r.getDouble(5), r.getDouble(6))), s"stats $key")
      }
      val expected = full.keys.count(_._2 % 3 == 0)
      assert(strided.length == expected, s"${strided.length} != $expected")
    } finally vids.unpersist(blocking = true)
  }

  test("video decode fails loudly on corrupt containers instead of emitting partial frames") {
    val good = Multimodal.renderVideo(5L)
    // magic corruption
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.parseVideoFrames(badMagic))
    // truncation mid-frame: the header bounds check (index total vs
    // payload length) fires BEFORE any frame allocation — a require,
    // not an EOFException from readFully
    intercept[IllegalArgumentException](Multimodal.parseVideoFrames(good.dropRight(10)))
    // a negative length field in the index must hit the length require
    val badLen = good.clone()
    badLen(8) = 0x80.toByte // frame 0 length high byte → negative int32
    intercept[IllegalArgumentException](Multimodal.parseVideoFrames(badLen))
    // a huge frame count must be rejected before Array.fill(n) allocates
    val badCount = good.clone()
    badCount(4) = 0x7f.toByte // frame count → ~2^31
    intercept[IllegalArgumentException](Multimodal.parseVideoFrames(badCount))
    // frame bytes zeroed in place: structurally intact container whose
    // frame 0 is garbage — ImageIO returns null (never throws), and the
    // parser must convert that into the loud require, not a later NPE
    val n5 = Multimodal.videoFrameCount(5L)
    val badFrame = good.clone()
    java.util.Arrays.fill(badFrame, 8 + 4 * n5, 8 + 4 * n5 + 16, 0.toByte)
    intercept[IllegalArgumentException](Multimodal.parseVideoFrames(badFrame))
    intercept[IllegalArgumentException](Multimodal.parseVideoFramesStrided(badFrame, 1))
    // intact container parses to the declared frame count
    assert(Multimodal.parseVideoFrames(good).length == Multimodal.videoFrameCount(5L))
  }

  test("frame sampling fan-out matches duration/interval exactly") {
    val assets = Multimodal.syntheticAssets(spark, sf)
    val frames = Multimodal.sampleFrames(assets, everyMs = 1000L)
    val perAsset = frames.groupBy("asset_id").agg(count(lit(1)).as("n"))
      .join(assets.select(col("asset_id"), col("duration_ms")), "asset_id")
      .collect()
    assert(perAsset.nonEmpty)
    perAsset.foreach { r =>
      assert(r.getLong(1) == (r.getLong(2) + 999) / 1000, s"asset ${r.getLong(0)}")
    }
  }

  test("perceptual hash: luminance byte + band bits match the ramp arithmetic; equal hashes cluster") {
    val imgs = Multimodal.imageAssets(spark, sf).cache()
    try {
      val out = Multimodal.imagePerceptualHash(imgs).collect()
      assert(out.nonEmpty)
      val byId = out.map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      // Recompute each hash from the render arithmetic (renderPng: red
      // ramps with x, green/blue flat) — the spec-side oracle.
      byId.foreach { case (id, (w, h, phash, _, _)) =>
        val g = (id % 256).toInt
        val b = ((id * 37) % 128 + 64).toInt
        val total = h.toLong * (w.toLong * (w - 1) / 2 + w.toLong * (g + b))
        var bits = 0L
        for (j <- 0 until 8) {
          val lo = j * w / 8; val hi = (j + 1) * w / 8
          val bs = h.toLong * ((hi.toLong * (hi - 1) - lo.toLong * (lo - 1)) / 2 + (hi - lo).toLong * (g + b))
          if (bs * w > total * (hi - lo)) bits |= 1L << j
        }
        val expected = ((total / (w.toLong * h * 3)) << 8) | bits
        assert(phash == expected, s"asset $id: got $phash expected $expected")
      }
      // Cluster columns are consistent: n_dups = hash frequency,
      // canonical_id = min asset_id of the hash group.
      val freq = byId.values.groupBy(_._3).map { case (ph, g) => ph -> g.size }
      val mins = byId.toSeq.groupBy(_._2._3).map { case (ph, g) => ph -> g.map(_._1).min }
      byId.foreach { case (id, (_, _, ph, nDups, canon)) =>
        assert(nDups == freq(ph), s"asset $id n_dups")
        assert(canon == mins(ph), s"asset $id canonical")
      }
      // The fixture corpus genuinely clusters (shared luminance+structure).
      assert(freq.values.max >= 2, "expected at least one dup cluster")
    } finally imgs.unpersist(blocking = true)
  }

  test("audio fingerprint: segment bits + amplitude byte match the PCM ramp arithmetic") {
    val auds = Multimodal.audioAssets(spark, sf).cache()
    try {
      val out = Multimodal.audioFingerprint(auds).collect()
      assert(out.nonEmpty)
      // Spec-side oracle: sample i = (i mod 400)*amp (renderWav), so a
      // segment [lo, hi) sums to amp*(F(hi)-F(lo)) with
      // F(x) = (x/400)*79800 + T(x mod 400).
      def F(x: Long): Long = (x / 400) * 79800 + (x % 400) * ((x % 400) - 1) / 2
      val byId = out.map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
      byId.foreach { case (id, (rate, n, afp, _, _)) =>
        assert(n == rate / 20, s"asset $id n_samples")
        val amp = id % 16 + 1
        val seg = n / 8
        val total = amp * (n / 400) * 79800
        var bits = 0L
        for (j <- 0 until 8) {
          val segSum = amp * (F((j + 1) * seg) - F(j * seg))
          if (segSum * 8 > total) bits |= 1L << j
        }
        val expected = ((total / (n * 16)) << 8) | bits
        assert(afp == expected, s"asset $id: got $afp expected $expected")
      }
      // Cluster columns consistent with fingerprint frequencies.
      val freq = byId.values.groupBy(_._3).map { case (fp, g) => fp -> g.size }
      val mins = byId.toSeq.groupBy(_._2._3).map { case (fp, g) => fp -> g.map(_._1).min }
      byId.foreach { case (id, (_, _, fp, nDups, canon)) =>
        assert(nDups == freq(fp), s"asset $id n_dups")
        assert(canon == mins(fp), s"asset $id canonical")
      }
      // Segment bits vary with rate (period/segment alignment), so the
      // fixtures must NOT collapse to one fingerprint class.
      assert(freq.size >= 5, s"expected rate-driven variety, got ${freq.size} classes")
    } finally auds.unpersist(blocking = true)
  }

  test("video fingerprint packs frame count + sampled-frame luminances per the render arithmetic") {
    val vids = Multimodal.videoAssets(spark, sf).cache()
    try {
      val out = Multimodal.videoFingerprint(vids).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val id = r.getLong(0)
        val n = 2 + id % 7
        assert(r.getInt(1) == n, s"asset $id n_frames")
        // frame f: g=(id+f)%256, b=(37id+11f)%128+64 over the 64x48 ramp
        var sig = 0L
        for (f <- 0L until math.min(n, 4L)) {
          val lum = (2016 + 64 * (((id + f) % 256) + ((id * 37 + f * 11) % 128 + 64))) / 192
          sig |= lum << (8 * f)
        }
        assert(r.getLong(2) == (n << 32 | sig), s"asset $id vfp")
      }
      // a 3-frame clip must differ from its own 2-frame prefix signature
      // (count is packed above the bytes, so prefix clips can't collide)
      val fps = out.map(r => r.getLong(2))
      assert(fps.distinct.length > 1)
    } finally vids.unpersist(blocking = true)
  }
}
