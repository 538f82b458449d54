package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear quality classifier — the fastText shape
  * (Joulin et al. 2016, "Bag of Tricks for Efficient Text
  * Classification") every production curation pipeline runs as its
  * learned quality filter: token and token-bigram features hashed into
  * a fixed bucket space, one committed weight per bucket, score =
  * bias + mean(bucket weights). The committed weights are DATA trained
  * by the deterministic [[graft.tools.QualityTrain]] fitter on the
  * documents fixture (the BpeTrain/PqTrain discipline) against labels
  * from the hash-verified heuristic quality score — the standard
  * bootstrap where a cheap labeling function teaches a model that then
  * generalizes past it.
  *
  * Bit-compatibility contract (the DuckDB oracle replays every step):
  *  - tokens are the caller's `split(lower(text), '\\s+')` — the exact
  *    tokenization every hash-green text row already pins across
  *    engines (the expression takes the ARRAY, so lowercasing/splitting
  *    semantics stay the engines' own, already-proven ones);
  *  - features are the tokens in array order, then adjacent bigrams
  *    `tok[i] ++ "_" ++ tok[i+1]` in order;
  *  - bucket(f) = parse the first 15 hex chars of md5(utf8(f)) as a
  *    base-16 int64 (60 bits — never negative, never overflows) mod B.
  *    md5 because BOTH engines have it and render identical lowercase
  *    hex; DuckDB: `CAST('0x' || substr(md5(f), 1, 15) AS BIGINT) % B`;
  *  - margin z = bias + (Σ w[bucket(f)] in feature order) / |F| — pure
  *    IEEE add/divide in a fixed order, NO transcendentals (the
  *    sigmoid is monotone, so thresholding the margin IS thresholding
  *    the probability; emitting the margin keeps the oracle compare
  *    bit-stable where exp() parity would be a platform gamble);
  *  - empty feature set (empty text) → z = bias (no 0/0).
  *
  * At 100 TB this is scan-side compiled compute: one pass, no shuffle,
  * the model a few KB of literals broadcast inside the plan — the same
  * shape as the heuristic quality score it upgrades. Swapping in a
  * bigger production model (more buckets, retrained weights) is a spec
  * string change, exactly like swapping a BPE vocabulary or PQ
  * codebook.
  */
object QualityClf {

  /** Bucket count of the committed model. Small enough that the spec
    * literal stays a few KB; a production retrain would raise it (2^20
    * is the fastText default) by committing a bigger table.
    */
  val B: Int = 512

  /** Bucket of one feature string: first 15 hex chars of its md5 (60
    * bits, always non-negative) mod `b`. Engine-replayable: DuckDB
    * spells it CAST('0x' || substr(md5(f),1,15) AS BIGINT) % b.
    */
  def bucket(feature: UTF8String, b: Int): Int = {
    val md = threadMd5.get()
    md.reset()
    val d = md.digest(feature.getBytes)
    // first 15 hex chars = 7.5 bytes: bytes 0..6 whole + high nibble of 7
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xf0L) >> 4)
    (v % b).toInt
  }

  private val threadMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val underscore = UTF8String.fromString("_")

  /** Parsed model + the scoring kernel the expression compiles against.
    * Spec: "B bias w0 w1 ... w(B-1)" — whitespace-separated, doubles
    * round-tripped through Double.toString/parseDouble bit-exactly.
    */
  /** Parse "B bias w..." once; returned parts are the only retained
    * state — the split String[] (b+2 strings, ~1M at a fastText-scale
    * B=2^20) must NOT live on as a field of a Scorer that rides every
    * codegen'd plan via addReferenceObj.
    */
  private def parseSpec(spec: String): (Int, Double, Array[Double]) = {
    val parts = spec.trim.split("\\s+")
    require(parts.length >= 2, s"classifier spec too short (${parts.length} fields)")
    val b = parts(0).toInt
    require(b >= 1, s"classifier bucket count must be positive, got $b")
    require(parts.length == b + 2,
      s"classifier spec claims $b buckets but carries ${parts.length - 2} weights")
    val arr = new Array[Double](b)
    var i = 0
    while (i < b) { arr(i) = parts(i + 2).toDouble; i += 1 }
    (b, parts(1).toDouble, arr)
  }

  final class Scorer(spec: String) extends Serializable {
    private val parsed = QualityClf.parseSpec(spec)
    val b: Int = parsed._1
    val bias: Double = parsed._2
    val w: Array[Double] = parsed._3

    /** Margin over a pre-split lowercase token array: unigrams in array
      * order, then adjacent bigrams; NULL elements are skipped (and not
      * counted) — unreachable from split() output, but never NPE.
      */
    def margin(tokens: ArrayData): Double = {
      val n = tokens.numElements()
      var sum = 0.0
      var count = 0
      var i = 0
      while (i < n) {
        if (!tokens.isNullAt(i)) {
          sum += w(bucket(tokens.getUTF8String(i), b))
          count += 1
        }
        i += 1
      }
      i = 0
      while (i < n - 1) {
        if (!tokens.isNullAt(i) && !tokens.isNullAt(i + 1)) {
          val bg = UTF8String.concat(
            tokens.getUTF8String(i), underscore, tokens.getUTF8String(i + 1))
          sum += w(bucket(bg, b))
          count += 1
        }
        i += 1
      }
      if (count == 0) bias else bias + sum / count
    }
  }

  // ------------------------------------------------------------------
  // Committed model — DATA, not code: emitted by the deterministic
  // `sbt "runMain graft.tools.QualityTrain"` (fixed feature order,
  // fixed epoch/learning-rate schedule, doc_id-ordered SGD, weights
  // rounded to 6 decimals so the Scala literal, the spec string, and
  // the DuckDB list literal all parse the identical doubles). Labels:
  // heuristic quality >= 0.55 on the sf0.01 documents fixture.
  // ------------------------------------------------------------------

  val bias: Double = 0.208032

  val weights: Array[Double] = Array(
    -0.370392, 0.0, 0.613642, -1.346827, -0.368135, 0.0, -0.844135, -0.645552,
    0.654196, -2.293328, -0.083312, -0.6831, -1.456888, 0.177408, 0.199709, 1.314884,
    -0.381375, 0.083873, 2.046251, 0.780503, 1.086343, 0.0, 0.993684, -2.298156,
    -1.268566, -1.314797, -0.035377, 0.517175, -0.51522, 0.056923, 0.0, 0.50157,
    0.315913, -0.541369, 0.0, 0.956236, -1.469089, 0.183727, -0.14757, 1.647203,
    0.265982, -0.898993, 0.0, -0.429905, -1.29408, -0.006366, -0.126541, -1.146225,
    -0.265545, -0.21586, -0.51277, 0.975326, -1.271302, -0.386531, 0.460119, -0.482139,
    0.0, 0.0, 0.0, 0.0, 0.587359, -0.244072, 0.0, 0.040347,
    -2.431897, -0.770275, 0.0, -0.324509, -0.853924, 0.985202, 0.492935, 0.199927,
    0.461476, 0.0, 0.424611, 0.307498, 0.302746, -0.418322, 0.226642, -0.561274,
    0.0, 0.635739, 0.80265, 0.058644, -0.528808, 0.488581, 0.234218, -0.100149,
    0.0, 0.036665, -0.605182, -0.531911, 0.0, -1.279382, 1.268934, -0.345024,
    0.495733, -0.382547, 0.0, 1.364219, 0.0, 0.0, -0.327205, 0.054718,
    -0.516111, 0.257157, 0.330972, -0.334819, 0.0, 18.25132, -1.092333, -0.918889,
    0.515171, -1.074799, 0.502806, -0.549441, 0.514025, -0.623202, 0.0, -0.414377,
    0.359266, 0.776042, 0.684477, 0.019511, 0.570824, 0.454376, 1.208124, 1.421603,
    0.0, 0.0, 1.237088, 0.333765, 0.407607, -0.08241, 0.077584, -1.351748,
    0.049878, -0.168586, -1.51E-4, 0.0, 0.0, -0.676755, -0.334762, 0.0,
    0.0, 0.0, -0.794743, 0.0, 0.0, 0.239656, 0.0, -2.662213,
    0.130027, -0.455587, 1.240007, 0.0, 0.760081, -0.615647, -0.434652, -0.576692,
    0.0, 0.26113, -1.251229, 0.0, 0.0, -0.424443, -1.10511, 0.865569,
    0.0, -0.005172, 0.0, -0.130319, -0.313113, 0.0, -0.441846, -0.627564,
    -0.139591, 0.383399, 0.738427, 0.125398, -1.47708, 0.330418, 0.0, 0.253674,
    1.740585, 0.927475, -1.189066, -0.400207, 0.0, -0.298004, 0.249302, 0.615329,
    -1.358758, -0.280849, 0.425396, -0.027287, 0.0, 0.0, 0.590415, 0.005408,
    0.0, -0.378965, -0.364725, 0.322312, 1.144769, -1.455062, 0.0, 0.279072,
    1.710772, -0.549455, -0.344798, 0.407912, 0.114328, -0.564696, 0.0, 0.682453,
    -0.445377, -1.084009, 1.217903, -0.022936, -0.039412, 0.074049, -0.942845, -0.008077,
    0.297476, 0.195128, 0.0, 0.0, 0.151777, -2.209844, 0.0, 0.345498,
    0.476072, -0.045332, -3.470208, -0.946341, -0.103845, 0.0, 0.149637, 0.66956,
    0.323709, -0.584237, 0.0, 0.02177, 0.0, 0.0, 0.322922, 0.077136,
    0.0, 0.09953, -0.00885, 0.046698, 0.0, 0.886432, -0.271902, -0.355681,
    0.086591, -0.097846, -0.238266, 1.141363, -1.259819, 0.99923, -0.049648, -0.367962,
    0.423762, -0.19791, -0.012983, 0.0, -0.110509, 0.33104, 0.0, -0.41674,
    -0.513114, 0.347302, 0.741305, -0.729144, -0.131281, 0.0, 0.294667, 0.270824,
    -1.231376, 0.488128, 0.34732, -0.469067, 0.31579, -0.35206, 0.126628, -1.039461,
    1.23035, -0.243555, -4.015866, 0.404181, 0.0, 0.296741, 0.654569, 0.0,
    0.517827, 0.672383, -0.469814, -0.573313, 0.982256, 0.160019, -2.588849, 0.052413,
    0.0, -0.613747, 0.0, 0.008042, 1.767256, 0.0, 0.391493, 0.0,
    0.180767, 0.0, -0.038234, -0.498154, -1.256355, 0.0, -0.14509, 0.0,
    0.074648, 0.0, 0.398883, 2.587145, -0.502889, 0.895596, 0.456924, -0.004516,
    0.0, -0.016808, -0.072356, 1.200049, 0.0, -0.539859, 0.057868, 0.27914,
    -0.254373, 0.139109, -2.016495, -0.230734, -0.043274, 0.323709, 0.0, -1.571622,
    0.370077, 0.381674, -0.30744, -0.716134, 0.0, 0.069371, 0.505657, -0.335996,
    0.738872, -0.338067, 0.54417, 0.0, 0.0, 0.362207, -0.828906, 0.37612,
    -1.13837, 1.832813, 18.987541, -0.30496, -0.272723, 0.024804, 0.346711, -0.214925,
    0.676941, 1.186411, 0.0, -2.263435, 0.75897, 0.565931, -0.123363, -1.021093,
    1.250775, -0.614341, 0.0, -1.006768, 0.099427, -0.312652, -0.030119, 1.366508,
    0.123663, -1.149103, 0.030024, 0.0, 0.999696, 0.62253, 0.0, 0.0,
    0.085378, -0.678074, 0.743595, -0.62325, 0.505323, -0.263951, -0.00997, -0.191201,
    -0.692232, -0.329884, -0.679422, -1.847472, 0.152729, -0.121506, -1.654372, 0.0,
    -3.3711, -0.237545, -0.603639, 0.072155, -0.189671, 0.297432, -1.866796, 0.0,
    0.679586, -0.040617, -0.473607, 0.655734, -0.44658, 0.355246, -2.18373, -0.53467,
    -0.244852, 0.013363, -1.008947, 1.505044, 0.247841, 2.236908, 1.071806, 0.239897,
    -0.277766, -0.730042, 0.0, 0.0, -0.377398, 0.056332, -0.32084, 0.026295,
    0.019109, 0.87383, -0.162522, 0.0, -0.309159, -1.117744, -1.068122, -0.312448,
    0.554505, -1.014357, 1.461723, 0.41001, 0.0, -1.087568, -0.358042, -0.839646,
    -0.925156, 0.088606, 0.167147, 0.233464, -0.3183, 0.0, 0.455909, -0.090208,
    -0.406604, -0.114693, -0.182693, -0.539848, -0.285972, 0.0, 0.015409, 0.572648,
    -0.555038, -0.395669, -1.000495, -1.192443, 0.100092, 0.0095, 0.209618, 0.144575,
    -0.287317, -0.795222, -2.238141, 0.582413, -0.046874, 0.253072, 0.543544, -0.582108,
    -0.025485, -2.44066, 0.155001, -0.209949, -3.645376, 0.883702, -0.544598, 2.208369,
    0.835058, -0.173992, 0.310898, -0.062064, 1.221592, 0.160149, -0.67435, 2.732722,
    0.662863, 0.0, 0.3545, 0.0, 1.287757, -0.522507, 0.229411, -0.945686,
  )

  /** The foldable spec literal expressions score against. */
  lazy val modelSpec: String =
    s"$B $bias ${weights.mkString(" ")}"

  /** The identical weights as a DuckDB DOUBLE[] literal (1-indexed
    * downstream: bucket + 1).
    */
  lazy val duckWeightsList: String =
    weights.mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** The committed model's margin spelled from catalyst BUILTINS only
    * (transform + md5/conv bucket + element_at lookup + left-to-right
    * aggregate fold over unigrams-then-bigrams): the interpreted twin
    * of [[QualityMargin]]. ONE definition — TextAnalysisSpec pins it
    * bit-equal to the kernel and tools/ProfileClf times it (23× at
    * 150k docs), so the equality contract and the committed
    * measurement can never drift apart.
    */
  def hofMargin(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val wLit = typedLit(weights.toSeq)
    def bucketOf(c: org.apache.spark.sql.Column) =
      (conv(substring(md5(c), 1, 15), 16, 10).cast("long") % B).cast("int")
    def wOf(c: org.apache.spark.sql.Column) = element_at(wLit, bucketOf(c) + 1)
    val uw = transform(toks, t => wOf(t))
    val bw = transform(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
      (t, i) => wOf(concat(t, lit("_"), element_at(toks, i + 2))))
    val f = concat(uw, bw)
    // Empty feature set: the kernel (and Scorer.margin) return the bare
    // bias, but aggregate(...)/size(f) would evaluate 0.0/0 -> NULL —
    // unreachable from split() output today, yet the twin contract is
    // bit-equality on EVERY input, so pin the branch.
    when(size(f) === 0, lit(bias))
      .otherwise(lit(bias) + aggregate(f, lit(0.0), (acc, x) => acc + x) / size(f))
  }
}

/** graft_quality_margin(tokens, 'B bias w...') — the classifier margin
  * of a pre-split lowercase token array under the committed hashed
  * linear model: compiled tokenize-free loop (the caller already
  * split), one md5 per feature, fixed-order mean — inside whole-stage
  * codegen via the addReferenceObj pattern every graft kernel uses.
  */
case class QualityMargin(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_quality_margin"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: model spec must not be null")
        case s: UTF8String =>
          try { new QualityClf.Scorer(s.toString); TypeCheckResult.TypeCheckSuccess }
          catch { case e: IllegalArgumentException =>
            TypeCheckResult.TypeCheckFailure(s"$prettyName: ${e.getMessage}") }
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val scorer: QualityClf.Scorer =
    new QualityClf.Scorer(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(tokens: Any, s: Any): Any =
    scorer.margin(tokens.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftQualityScorer", scorer,
      classOf[QualityClf.Scorer].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $ref.margin($t);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
