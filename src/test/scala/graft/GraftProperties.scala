package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.functions._

/** ScalaCheck properties (SURVEY.md §5 item 2): pure invariants run at
  * full case counts; Spark-bound properties run fewer cases (each sample
  * is a distributed job).
  */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(40)

  private lazy val spark = SparkSpec.session

  // ------------------------------------------------------------- pure

  property("image featurizer matches the red-ramp bin-overlap arithmetic") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0, 15), Gen.chooseNum(0, 8)) {
      (id, ws, hs) =>
        // the asset-metadata dimension universe (multiples of 8, w < 256)
        val (w, h) = (64 + ws * 8, 64 + hs * 8)
        val f = graft.ops.Multimodal.imageFeatureVec(
          graft.ops.Multimodal.renderPng(id, w, h), 8)
        f.length == 8 && (0 until 8).forall { k =>
          val overlap = math.max(0, math.min(32 * (k + 1), w) - 32 * k)
          f(k) == (overlap.toLong * h).toDouble / (w.toLong * h)
        }
    }

  property("floor-rounding r4 is within half-ulp-of-grid of its input") =
    forAll(Gen.chooseNum(0.0, 1.0)) { x =>
      val r = math.floor(x * 10000 + 0.5) / 10000
      math.abs(r - x) <= 0.00005 + 1e-12
    }

  property("quarter-hour window start is 15-minute aligned and <= ts") =
    forAll(Gen.chooseNum(0L, 4102444800L)) { epochSec =>
      // the bucketing rule window() implements, checked arithmetically
      val bucket = epochSec - (epochSec % 900)
      bucket % 900 == 0 && bucket <= epochSec && epochSec - bucket < 900
    }

  // ------------------------------------------------------ spark-bound

  private val fewCases = 8

  private def sparkProp[A](gen: Gen[A])(f: A => Boolean): Prop = {
    var runs = 0
    forAll(gen) { (xs: A) => runs += 1; runs > fewCases || f(xs) }
  }

  private val eventsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 40)
    rows <- Gen.listOfN(n, for {
      id <- Gen.chooseNum(0L, 1000000L)
      sec <- Gen.chooseNum(1704067200L, 1704067200L + 7 * 86400L) // one week in 2024
    } yield (id, sec))
  } yield rows

  property("windowed counts partition the input: sum of n_events == row count") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      val df = rows.toDF("event_id", "sec")
        .select(col("event_id"), timestamp_seconds(col("sec")).as("ts"),
          lit(1L).as("user_id"), lit("view").as("event_type"),
          lit(50.0).as("value"), lit("{}").as("props"))
      val out = graft.ops.Kpi.quarterHour(df).collect()
      out.map(_.getLong(1)).sum == rows.length &&
        out.forall(r => java.sql.Timestamp.valueOf(r.getString(0)).getTime % 900000L == 0L)
    }

  property("wav render/decode roundtrip matches the ramp arithmetic for any (id, rate)") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(1, 5)) { (id, rateStep) =>
      // same rate universe the asset metadata derives (multiples of 8000)
      val rate = rateStep * 8000
      val wav = graft.ops.Multimodal.renderWav(id, rate)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val bytes = try ais.readAllBytes() finally ais.close()
      val n = bytes.length / 2
      var (i, sum, peak) = (0, 0L, Int.MinValue)
      while (i < n) {
        val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
        sum += s; if (s > peak) peak = s; i += 1
      }
      val amp = (id % 16 + 1).toInt
      n == rate / 20 && ais.getFormat.getSampleRate.toInt == rate &&
        peak == 399 * amp && sum.toDouble / n == 199.5 * amp
    }

  property("png render/decode banded phash matches the ramp closed form for any (id, w, h)") =
    forAll(Gen.chooseNum(0L, 1000000L), Gen.chooseNum(0, 15), Gen.chooseNum(0, 8)) {
      (id, ws, hs) =>
        // the asset metadata's dimension universe (renderPng callers)
        val (w, h) = (64 + ws * 8, 64 + hs * 8)
        val png = graft.ops.Multimodal.renderPng(id, w, h)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
        // the decode-side algorithm (Multimodal.imagePerceptualHash's loop)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val colSum = new Array[Long](w)
        for (i <- px.indices)
          colSum(i % w) += ((px(i) >> 16) & 0xff) + ((px(i) >> 8) & 0xff) + (px(i) & 0xff)
        val total = colSum.sum
        var bits = 0L
        for (j <- 0 until 8) {
          val (lo, hi) = (j * w / 8, (j + 1) * w / 8)
          if ((lo until hi).map(colSum).sum * w > total * (hi - lo)) bits |= 1L << j
        }
        val decoded = (total / (w.toLong * h * 3) << 8) | bits
        // the closed form the DuckDB oracle uses (never sees a pixel)
        val g = (id % 256).toInt
        val b = ((id * 37) % 128 + 64).toInt
        var cBits = 0L
        for (j <- 0 until 8) {
          val (lo, hi) = (j * w / 8, (j + 1) * w / 8)
          val bandMass = (hi.toLong * (hi - 1) - lo.toLong * (lo - 1)) / 2 +
            (hi - lo).toLong * (g + b)
          val totalMass = w.toLong * (w - 1) / 2 + w.toLong * (g + b)
          if (bandMass * w > totalMass * (hi - lo)) cBits |= 1L << j
        }
        val cTotal = h.toLong * (w.toLong * (w - 1) / 2 + w.toLong * (g + b))
        decoded == (cTotal / (w.toLong * h * 3) << 8 | cBits)
    }

  /** Reference model for [[graft.ops.Dedup.shingleHashes]]: the DISTINCT
    * shingle count per doc must equal the distinct count of string
    * 3-gram sliding windows (hash collisions would only ever shrink the
    * Spark side, with probability ~n²/2⁶⁴ — effectively never on these
    * sizes).
    */
  property("shingleHashes distinct count per doc equals the sliding-window model") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      val docs = rows.zipWithIndex.map { case ((id, sec), i) =>
        // small token alphabet → plenty of repeated shingles to dedup
        val toks = (0 to (id % 9).toInt).map(k => s"w${(sec + k * id) % 5}")
        (i.toLong, toks.mkString(" "))
      }
      val expected = docs.map { case (docId, text) =>
        docId -> text.toLowerCase.split("\\s+").toSeq.sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")).toSet.size.toLong
      }.filter(_._2 > 0).toMap
      val got = graft.ops.Dedup.shingleHashes(docs.toDF("doc_id", "text"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == expected
    }

  /** The pigeonhole theorem behind [[graft.ops.Dedup.simhashBandedNearDups]]
    * as an executable property: for ANY corpus and any legal radius, the
    * banded sweep equals the brute-force all-pairs Hamming scan exactly —
    * recall from the theorem (≤ r differing bits can't touch all r+1
    * bands), precision from the exact bit_count verify.
    */
  property("banded simhash equals brute-force hamming pairs at every legal radius") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      val docs = rows.zipWithIndex.map { case ((id, sec), i) =>
        val toks = (0 to 6 + (id % 7).toInt).map(k => s"t${(sec * (k + 1) + id) % 11}")
        (i.toLong, toks.mkString(" "), "en", "s", 10L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val mh = Seq(1, 3, 7, 15)((rows.head._2 % 4).toInt)
      val sh = graft.ops.Dedup.simhash(docs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expected = (for {
        a <- sh.keys; b <- sh.keys if a < b
        h = java.lang.Long.bitCount(sh(a) ^ sh(b)) if h <= mh
      } yield (a, b, h)).toSet
      val got = graft.ops.Dedup.simhashBandedNearDups(docs, maxHamming = mh)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      got == expected
    }

  /** Reference model for [[graft.ops.Dedup.contaminatedPairs]]: a train
    * doc embedding a benchmark doc verbatim shares exactly the bench
    * doc's distinct shingles (when the surrounding noise shares none),
    * so the pair is flagged iff that count clears minShared.
    */
  property("decontamination flags an embedded benchmark doc iff its shingles clear minShared") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      // benchmark doc: L distinct tokens from a disjoint alphabet
      val L = 3 + (rows.head._1 % 8).toInt // 3..10 tokens → 1..8 shingles
      val benchText = (0 until L).map(k => s"bm$k").mkString(" ")
      val noise = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10"
      val minShared = 1L + rows.head._2 % 8 // 1..8
      val bench = Seq((10L, benchText, "en", "b", 1L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val train = Seq(
        (1L, s"$noise $benchText $noise", "en", "t", 1L), // embeds it
        (2L, noise, "en", "t", 1L))                       // clean
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val flagged = graft.ops.Dedup
        .contaminatedPairs(train, bench, minShared = minShared)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
      // embedding adds 2 bridge shingles on each seam (noise|bench mix)
      // but only PURE bench shingles exist on the bench side: L-2 of them
      val benchShingles = (L - 2).max(0)
      val expectFlag = benchShingles >= minShared
      flagged.get(1L).forall(_ == benchShingles.toLong) &&
        flagged.contains(1L) == expectFlag && !flagged.contains(2L)
    }

  property("sequence packing tiles exactly for any budget: conservation + gapless sequences") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      val docs = rows.zipWithIndex.map { case ((id, sec), i) =>
        val nTok = (id % 37 + 1).toInt // 1..37 tokens
        (i.toLong, Seq.fill(nTok)("w" + (sec % 11)).mkString(" "), "en", "s", nTok.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val b = (rows.head._1 % 17 + 2) // budget 2..18, derived from the sample
      val packed = graft.ops.Coverage.packSequences(docs, seqTokens = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      val totalTokens = rows.map(r => r._1 % 37 + 1).sum
      val bySeq = packed.groupBy(_._2)
      val lastSeq = packed.map(_._2).max
      packed.map(_._4).sum == totalTokens &&
        bySeq.forall { case (seqId, slices) =>
          val sorted = slices.sortBy(_._3)
          sorted.head._3 == 0L &&
            sorted.sliding(2).forall {
              case Array(x, y) => x._3 + x._4 == y._3
              case _ => true
            } && {
              val filled = sorted.last._3 + sorted.last._4
              if (seqId == lastSeq) filled <= b else filled == b
            }
        }
    }

  property("grouped split co-assigns every edge's endpoints for arbitrary pair graphs") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      // arbitrary doc universe + arbitrary pair graph over it (modular
      // edges produce chains, cliques, self-contained components, and
      // isolated docs depending on the draw)
      val ids = rows.map(_._1 % 101).distinct
      val docs = ids.map(i => (i, s"t$i", "en", "s", 2L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val edges = rows.collect {
        case (id, sec) if ids.length > 1 =>
          val a = ids(math.floorMod(id, ids.length).toInt)
          val b = ids(math.floorMod(sec, ids.length).toInt)
          if (a < b) (a, b, 1.0) else (b, a, 1.0)
      }.filter { case (a, b, _) => a != b }.distinct
      val pairs = edges.toDF("doc_a", "doc_b", "jaccard")
      // maxIter raised: the guarantee under test assumes convergence,
      // and a drawn chain's diameter may exceed the default 20 rounds
      val out = graft.ops.Coverage.splitAssignGrouped(docs, pairs, maxIter = 128).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      // every doc assigned exactly once; every edge co-assigned; every
      // cluster internally consistent
      out.size == ids.length &&
        edges.forall { case (a, b, _) =>
          out(a)._2 == out(b)._2 && out(a)._1 == out(b)._1 } &&
        out.values.groupBy(_._1).forall(_._2.map(_._2).toSet.size == 1)
    }

  property("bpe: encode/count/decode agree for random tables and texts") = {
    import graft.functions.Bpe
    import org.apache.spark.unsafe.types.UTF8String
    // random valid merge tables over a small alphabet (unique pairs),
    // random texts over letters/digits/punct/space
    val pairGen = for {
      l <- Gen.oneOf("a", "b", "c", "ab", "ba", "cc")
      r <- Gen.oneOf("a", "b", "c", "ab", "ca")
    } yield (l, r)
    val tableGen = Gen.listOfN(8, pairGen).map(_.distinct).suchThat(_.nonEmpty)
    val textGen = Gen.listOfN(24,
      Gen.oneOf('a', 'b', 'c', '1', ' ', '.', ',', 'x')).map(_.mkString)
    forAll(tableGen, textGen) { (table, text) =>
      val spec = table.map { case (l, r) => s"$l $r" }.mkString(",")
      val coder = new Bpe.Coder(spec)
      val t = UTF8String.fromString(text)
      val ids = coder.encodeTokens(t)
      val count = coder.countTokens(t)
      val decoded = coder.decodeTokens(ids).toString
      val pretok = java.util.regex.Pattern.compile(Bpe.PretokenPattern).matcher(text)
      val sb = new StringBuilder
      while (pretok.find()) sb.append(pretok.group())
      (Prop(ids.numElements() == count) :| s"ids ${ids.numElements()} != count $count") &&
        (Prop(decoded == sb.toString) :| s"decode '$decoded' != pretokens '$sb'")
    }
  }

  property("quality classifier margin == independent md5-hex replay for random models") = {
    import graft.functions.QualityClf
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.ArrayData
    // random models (bucket count, bias, weights) and random token
    // lists incl. empty/unicode; the replay parses the md5 HEX STRING
    // with BigInteger — a genuinely different implementation than the
    // kernel's byte-shift loop — and folds in the same feature order
    val modelGen = for {
      b <- Gen.chooseNum(1, 32)
      bias <- Gen.chooseNum(-2.0, 2.0)
      w <- Gen.listOfN(b, Gen.chooseNum(-3.0, 3.0))
    } yield (b, bias, w)
    val toksGen = Gen.listOf(
      Gen.oneOf("the", "fox", "a1", ".", "", "Mixed", "zz", "ünïcøde"))
    forAll(modelGen, toksGen) { case ((b, bias, w), toks) =>
      val spec = s"$b $bias ${w.mkString(" ")}"
      val scorer = new QualityClf.Scorer(spec)
      val arr = ArrayData.toArrayData(toks.map(UTF8String.fromString).toArray)
      val got = scorer.margin(arr)
      def bucket(s: String): Int = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        val hex = d.map("%02x".format(_)).mkString.substring(0, 15)
        (new java.math.BigInteger(hex, 16).longValue % b).toInt
      }
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(p => p(0) + "_" + p(1))
      val expect =
        if (feats.isEmpty) bias
        else bias + feats.map(f => w(bucket(f))).sum / feats.length
      Prop(got == expect) :| s"kernel $got != replay $expect (b=$b, toks=$toks)"
    }
  }

  property("pq encode is argmin-optimal: recon MSE <= any fixed code assignment") = {
    import graft.functions.Pq
    val coder = new Pq.Coder(Pq.codebookSpec)
    val vecGen = Gen.listOfN(Pq.D, Gen.chooseNum(-0.3, 0.3)).map(_.toArray)
    val codeGen = Gen.listOfN(Pq.M, Gen.chooseNum(0, Pq.K - 1)).map(_.toArray)
    forAll(vecGen, codeGen) { (v, fixed) =>
      val arr = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(v)
      val mse = coder.reconMse(arr, isFloat = false)
      // model: MSE of the ARBITRARY fixed assignment, straight from the
      // committed codebook
      val fixedMse = (0 until Pq.M).map { m =>
        val cent = Pq.codebook(m)(fixed(m))
        (0 until Pq.Dsub).map { d =>
          val t = v(m * Pq.Dsub + d) - cent(d); t * t
        }.sum
      }.sum / Pq.D
      // argmin per subspace can never lose to any fixed choice; and the
      // encoder's own codes reproduce its mse exactly
      val codes = coder.encode(arr, isFloat = false)
      val ownMse = (0 until Pq.M).map { m =>
        val cent = Pq.codebook(m)(codes.getInt(m))
        (0 until Pq.Dsub).map { d =>
          val t = v(m * Pq.Dsub + d) - cent(d); t * t
        }.sum
      }.sum / Pq.D
      Prop(mse <= fixedMse + 1e-12) :| s"mse $mse > fixed $fixedMse" &&
        Prop(math.abs(mse - ownMse) <= 1e-9) :| s"mse $mse != own-codes $ownMse"
    }
  }

  private val semDedupGen: Gen[(List[(Long, List[Double])], Double)] = for {
    n <- Gen.chooseNum(4, 25)
    dim <- Gen.chooseNum(3, 8)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)))
    eps <- Gen.chooseNum(0.2, 0.95)
  } yield (vecs.zipWithIndex.map { case (v, i) =>
    // keep every vector scoreable: a (near-)zero-norm draw gets a unit
    // first coordinate (probability-0 edge, but property inputs must
    // never depend on luck)
    (i.toLong, if (v.map(math.abs).max < 1e-6) 1.0 :: v.tail else v)
  }, eps)

  property("semdedup survivors are exactly the local d2-maxima of the eps-graph") =
    sparkProp(semDedupGen) { case (rows, eps) =>
      import spark.implicits._
      // independent replay of the WHOLE pipeline over random vectors of
      // random dim: committed-centroid argmin (graft_dot folds min
      // length; c·c is the full 64-dim driver fold), round-6 cosine,
      // farthest-from-centroid keep with lowest-id tie
      val cents = graft.ops.Similarity.domainCentroids
      val vecs = rows.toMap
      def dotMin(a: Seq[Double], b: Seq[Double]): Double = {
        val n = math.min(a.length, b.length)
        var s = 0.0; var i = 0
        while (i < n) { s += a(i) * b(i); i += 1 }; s
      }
      val d2 = vecs.map { case (id, e) =>
        val ee = dotMin(e, e)
        id -> cents.indices.map { k =>
          val c = cents(k); var cc = 0.0; var i = 0
          while (i < c.length) { cc += c(i) * c(i); i += 1 }
          (ee - 2.0 * dotMin(e, c.toSeq) + cc, k)
        }.min
      }
      val nrm = vecs.map { case (id, e) => id -> math.sqrt(dotMin(e, e)) }
      def round6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val ids = vecs.keys.toSeq.sorted
      val dropped = scala.collection.mutable.Set[Long]()
      for { a <- ids; b <- ids if a < b && d2(a)._2 == d2(b)._2 } {
        val cs = round6(dotMin(vecs(a), vecs(b)) / (nrm(a) * nrm(b)))
        if (cs >= eps)
          dropped += (if (d2(a)._1 > d2(b)._1) b
            else if (d2(a)._1 < d2(b)._1) a else b)
      }
      val expect = ids.toSet -- dropped
      val got = graft.ops.Similarity
        .semDeDup(rows.toDF("vec_id", "embedding")
          .withColumn("label", lit("p")), eps)
        .collect().map(_.getLong(0)).toSet
      got == expect
    }

  private val nearestCellGen: Gen[(List[(Long, List[Double])], List[List[Double]], Int, Int)] =
    for {
      dim <- Gen.chooseNum(2, 16)
      nc <- Gen.chooseNum(2, 12)
      cells <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)))
      n <- Gen.chooseNum(1, 30)
      vecs <- Gen.listOfN(n, Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)))
      start <- Gen.chooseNum(0, nc - 1)
      len <- Gen.chooseNum(1, nc - start)
    } yield (vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }, cells, start, len)

  property("graft_nearest_cell is the argmin over the slice with lowest-index ties") =
    sparkProp(nearestCellGen) { case (rows, cells, start, len) =>
      import spark.implicits._
      val got = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), call_function("graft_nearest_cell",
          col("embedding"), typedLit(cells), lit(start), lit(len)).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      rows.forall { case (id, v) =>
        val scored = (start until start + len).map { j =>
          val c = cells(j)
          var cc = 0.0; var dp = 0.0
          var i = 0
          while (i < c.length) { cc += c(i) * c(i); dp += c(i) * v(i); i += 1 }
          (cc - 2.0 * dp, j)
        }
        got(id) == scored.min._2
      }
    }

  property("graft_nearest_cells is the ascending-distance top-p with lowest-index ties") =
    sparkProp(for {
      base <- nearestCellGen
      p <- Gen.chooseNum(1, 15)
    } yield (base, p)) { case ((rows, cells, start, len), p) =>
      import spark.implicits._
      val got = rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), call_function("graft_nearest_cells",
          col("embedding"), typedLit(cells), lit(start), lit(len), lit(p)).as("cs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
      rows.forall { case (id, v) =>
        val scored = (start until start + len).map { j =>
          val c = cells(j)
          var cc = 0.0; var dp = 0.0
          var i = 0
          while (i < c.length) { cc += c(i) * c(i); dp += c(i) * v(i); i += 1 }
          (cc - 2.0 * dp, j)
        }
        // the window rule: ORDER BY score, index — ascending, ties to
        // the lowest index — cut to min(p, len)
        got(id) == scored.sorted.take(math.min(p, len)).map(_._2).toList
      }
    }

  property("allotCells seats min(nlist, points) with 1..cap per occupied cell") =
    forAll(for {
      k <- Gen.chooseNum(1, 12)
      sizes <- Gen.listOfN(k, Gen.chooseNum(0L, 500L))
      extra <- Gen.chooseNum(0, 52)
    } yield (sizes.zipWithIndex.map { case (n, i) => (i, n) }, extra)) {
      case (sizes, extra) =>
        val occupied = sizes.filter(_._2 > 0)
        // budget always covers the occupied floor (the fit's invariant)
        val nlist = occupied.size + extra
        if (occupied.isEmpty || nlist == 0) Prop.passed
        else {
          val allot = graft.ops.Similarity.allotCells(sizes, nlist)
          val byCell = allot.toMap
          val want = math.min(nlist.toLong, occupied.map(_._2).sum).toInt
          Prop.all(
            Prop(allot.map(_._2).sum == want) :| "seats the full budget",
            Prop(allot.map(_._1).toSet == occupied.map(_._1).toSet) :| "occupied cells only",
            Prop(occupied.forall { case (t, nt) =>
              byCell(t) >= 1 && byCell(t) <= nt
            }) :| "each cell in 1..its points",
            Prop(allot == graft.ops.Similarity.allotCells(sizes, nlist)) :| "deterministic")
        }
    }

  property("exact dedup is idempotent: re-deduping representatives yields all-singletons") =
    sparkProp(eventsGen) { rows =>
      import spark.implicits._
      // duplicate every text at least twice via modular collapse
      val docs = rows.zipWithIndex.map { case ((id, sec), i) =>
        (i.toLong, s"text-${(id + sec) % 7}", "en", "s", 6L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val first = graft.ops.Dedup.exact(docs).cache()
      val reps = first.select(col("keep_doc_id").as("doc_id"))
        .join(docs, "doc_id")
      val second = graft.ops.Dedup.exact(reps)
      second.filter(col("n_copies") =!= 1L).isEmpty &&
        second.count() == first.count()
    }
}
