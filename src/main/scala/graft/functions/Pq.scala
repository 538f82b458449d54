package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Product quantization (PQ) — sub-vector codebooks for ANN memory
  * compression (Jégou, Douze, Schmid 2011: the public algorithm behind
  * IVF-PQ in every production vector index). The D-dim space splits
  * into M contiguous subspaces of D/M dims; each subspace carries a
  * K-centroid codebook; a vector's CODE is its per-subspace
  * nearest-centroid index. Storage per vector drops from D floats to
  * M small ints (here 64×4 B → 8 ints, and 4-bit-packable: 32×), and
  * query-time distance becomes per-subspace table lookups (ADC) — the
  * memory shape that makes 100 TB ANN affordable.
  *
  * The codebook is DATA, not code (the committed-BPE-table
  * discipline): learned from the embeddings fixture by the
  * deterministic `graft.tools.PqTrain` (no RNG, ordered accumulation,
  * tie-breaks pinned, values rounded to 6 decimals), committed below,
  * and shipped to the expressions as a foldable spec string. The
  * DuckDB oracle carries the SAME values as a VALUES list
  * ([[duckCodebookValues]]) generated from the same constant via the
  * same Double.toString rendering, so both engines parse identical
  * doubles and the whole encode → reconstruct → score pipeline is
  * hash-verifiable (`sim_ann_ivfpq_fullprobe`,
  * `sim_pq_reconstruction_mse`).
  *
  * Arithmetic-order contract (what makes the hashes match): all
  * distance math is LEFT-TO-RIGHT over dims within a subspace, then
  * left-to-right over subspaces — the expressions' compiled loops, the
  * driver-side LUT math in Similarity.queryIvfPq, and the oracle's
  * `list_sum(list_transform(...))` chains all use exactly this
  * grouping, so the doubles agree bit-for-bit before any rounding.
  *
  * K=16 per subspace (4-bit codes) is the fixture-scale table; a
  * production deployment swaps in a K=256 (8-bit) table the way it
  * would swap a BPE vocabulary — same expressions, different committed
  * data.
  */
object Pq {

  val codebook: Vector[Vector[Vector[Double]]] = Vector(
    Vector(
      Vector(0.061516, 0.109726, -0.044713, -0.172634, 0.059638, -0.061879, -0.055395, -0.051754),
      Vector(-0.105693, -0.021199, 0.001419, 0.053286, -0.056987, -0.133619, 0.003585, -0.138371),
      Vector(-0.007497, -0.019732, 0.078701, 0.040854, -0.018261, -0.096155, 0.179801, 0.040028),
      Vector(-0.125866, -0.055318, -0.103545, -0.101047, 0.101962, 0.077617, 0.091549, -0.045509),
      Vector(-0.111434, -0.082501, 0.024008, 0.049495, -0.041522, 0.117208, -0.013586, 0.090007),
      Vector(0.098171, -0.088437, 0.014336, 0.095492, 0.041916, 0.130976, -0.165439, -0.005969),
      Vector(-0.008854, 0.03416, -0.048336, -0.021173, -0.212216, 0.020242, -0.080276, -0.022103),
      Vector(0.09612, 0.025492, -0.212642, 0.100734, -0.002775, 0.071602, 0.044071, -0.030461),
      Vector(0.046136, -0.130146, 0.04768, -0.084004, 0.006299, 0.004317, -0.069308, -0.119378),
      Vector(0.074266, 0.082287, 0.153949, -0.035398, -0.055543, -0.019112, 0.007079, -0.037762),
      Vector(-0.051332, 0.155334, -0.041001, -0.081782, 0.001792, 0.071669, -0.080748, 0.131433),
      Vector(-0.089388, -0.035521, 0.123613, -0.039094, 0.153922, -0.079792, -0.108048, 0.076352),
      Vector(-0.033099, 0.086661, 0.00468, 0.151624, 0.120872, 0.017401, -0.083408, -0.052005),
      Vector(0.177978, -0.019978, 6.61E-4, -0.03747, 0.007214, 0.005405, 0.020343, 0.143559),
      Vector(0.002207, 0.116426, 0.032628, -0.10161, 0.006202, 0.193353, 0.106392, -0.0404),
      Vector(0.044658, -0.052267, -0.071114, 0.004076, 0.087298, -0.159928, -0.075376, 0.107797)),
    Vector(
      Vector(0.145351, 0.06093, 0.051505, 0.04286, -0.142725, -0.038377, 0.054742, -0.074672),
      Vector(-0.01089, -0.113356, -0.0392, 0.147698, 0.094979, 0.039504, 0.139428, -0.038852),
      Vector(0.007319, -0.054136, -0.064097, -0.025805, 0.050605, 0.034064, -0.115602, 0.197818),
      Vector(-0.017514, -0.204595, 0.036502, 0.02207, 0.02565, 0.02948, -0.075684, 0.02248),
      Vector(-0.056489, 0.158442, 0.061413, -0.026981, -0.095855, 0.107703, 0.072486, 0.0046),
      Vector(-0.025411, 0.13514, -0.051494, 0.004606, 0.081118, -0.159979, 0.124461, -0.037645),
      Vector(-0.120986, -0.023315, 0.072974, -0.056866, -0.05569, -0.065562, -0.106402, -0.10267),
      Vector(-0.041226, 0.078186, 0.062029, 0.227685, -0.08947, -0.018172, -0.100906, 0.027224),
      Vector(0.066912, 0.036369, 0.038719, -0.209516, 0.003177, -0.019119, -0.099112, 0.051918),
      Vector(0.155643, 0.038142, -0.0299, 0.051273, 0.041229, 0.114514, 0.140406, 0.103358),
      Vector(0.033361, 0.012943, -0.115392, 0.104289, -0.035728, -0.048628, -0.084831, 0.045824),
      Vector(-0.053846, -0.102931, -0.140426, -0.0604, -0.037237, 0.159146, 0.047565, 0.011247),
      Vector(0.036746, -0.117171, -0.024464, -0.067133, -0.029136, -0.075812, 0.034875, -0.152646),
      Vector(0.042904, -0.055587, 0.150394, -0.026238, 0.06486, -0.054262, 0.0726, 0.11663),
      Vector(-0.17866, -0.031174, 0.104395, 0.030196, -0.002671, 0.134779, 0.030819, 0.041256),
      Vector(-0.041023, 0.128972, -0.053288, 0.038692, 0.142661, 0.083537, -0.022427, -0.023555)),
    Vector(
      Vector(-0.052658, 0.139973, 0.024619, -0.013827, -0.006146, -0.168445, 0.106319, -0.066324),
      Vector(-0.121121, -0.112953, -0.056231, -0.013827, 0.052907, 0.047064, 0.051405, -0.136219),
      Vector(-0.058881, -0.100048, -0.130743, -0.056819, -0.042284, 0.100351, -0.101577, 0.012678),
      Vector(0.075974, 0.051004, -0.084034, 0.042226, -0.098879, -0.057021, -0.097138, -0.060542),
      Vector(-0.025511, -0.073798, 0.086601, -0.01928, 0.095877, -0.041458, -0.127968, 0.050256),
      Vector(0.152808, 0.050426, -0.055364, -0.123139, 0.051846, -0.032671, 0.041654, 0.092164),
      Vector(0.047898, 0.01336, -0.03593, 0.139004, 0.075709, 0.112906, 0.031783, 0.0926),
      Vector(0.051196, 0.102955, 0.055007, -0.114386, 0.099258, 0.042927, -0.005194, -0.167777),
      Vector(0.020214, 0.031553, 0.178698, 0.132998, -0.015546, -0.028246, -0.02159, -0.026477),
      Vector(-0.097842, 0.172485, 0.029353, -0.002253, -0.051781, 0.089955, 0.007401, -0.053026),
      Vector(0.13103, -0.081137, 0.044404, -0.060275, -0.075738, 0.018784, 0.069715, -0.12842),
      Vector(-0.062443, -0.104143, -0.026537, 0.104337, -0.003812, -0.120851, 0.026948, 0.06824),
      Vector(-0.023423, 0.006705, 0.083367, -0.098658, -0.053217, 0.116089, 0.071188, 0.179231),
      Vector(0.114457, -0.001816, 0.100323, 0.002466, -0.21304, -0.044407, -0.010301, 0.128146),
      Vector(0.023287, -0.024224, -0.187682, 0.02151, 0.099171, -0.053194, 0.031751, -0.024599),
      Vector(-0.022712, -0.032379, -0.174511, 0.07205, -0.13467, 0.046958, 0.143964, 0.036597)),
    Vector(
      Vector(-0.161307, 0.030611, 0.10398, 0.096751, -0.077756, 0.179684, -0.00822, 0.034922),
      Vector(-0.074666, 0.15881, -0.082918, 0.043046, -0.026046, -0.12948, 0.092327, -0.111048),
      Vector(-0.046092, 0.075231, -0.083424, -0.015063, 0.062663, -0.14481, 0.046028, 0.161771),
      Vector(0.002624, -0.04951, 0.118567, 0.037219, -0.047987, -0.145353, -0.072278, 0.13756),
      Vector(-0.015079, -0.023765, -0.052882, 0.184389, -0.154483, -0.060171, -5.5E-5, -0.105556),
      Vector(-0.032987, -0.104012, -0.159359, 0.058584, -0.020445, 0.089134, 0.065028, 0.00715),
      Vector(0.124036, 0.080589, -0.008767, -0.030125, 0.035454, 0.06333, 0.092943, -0.143886),
      Vector(-0.042143, -0.127205, 0.069313, 0.021963, 0.071081, -0.028743, 0.121657, 0.001323),
      Vector(-0.132346, -0.044414, -0.065416, -0.14073, 0.070118, -0.020812, -0.011551, -0.073723),
      Vector(-0.052726, 0.162649, -0.109834, -0.049752, 0.059479, 0.146783, -0.016754, 0.060775),
      Vector(0.026013, 0.044678, -0.059889, -0.003578, -0.110632, 0.0026, -0.178329, -0.003699),
      Vector(0.086089, 0.194459, 0.124598, -0.013526, -0.014308, -0.040945, 0.007889, 0.072409),
      Vector(-0.055635, 0.002402, 0.164602, -0.035812, 0.071187, 0.072018, -0.090578, -0.110182),
      Vector(-0.037195, -0.113769, -0.016815, -0.043866, -0.158258, -0.083922, 0.083793, -0.08496),
      Vector(0.048808, 0.009241, -0.032019, 0.144265, 0.108818, -0.028362, -0.043898, -0.006345),
      Vector(0.154015, -0.031149, -7.71E-4, -0.016765, -0.008181, 0.113725, 0.017693, 0.090422)),
    Vector(
      Vector(-0.193322, -0.071024, 0.10321, 0.00191, 0.042136, 0.006763, 0.063764, 0.05205),
      Vector(0.042281, 0.073573, 0.00887, 0.025225, 0.055293, -0.003741, -0.22666, -0.017098),
      Vector(0.011299, -0.054458, -0.045772, -0.066116, -0.026354, -0.059282, 0.199695, -0.0804),
      Vector(0.090339, -0.040262, 0.011713, 0.083114, 0.11562, 0.016507, 0.072404, 0.09531),
      Vector(0.012795, -0.101096, 0.033971, 0.086094, -0.148111, 0.03355, 0.001539, -0.155631),
      Vector(-0.004724, 0.1241, -0.082944, -0.014078, -0.14041, 0.020158, 0.047866, 0.012175),
      Vector(-0.036643, -0.06588, 0.041522, 0.035278, -0.186728, 0.049733, 0.015557, 0.12561),
      Vector(0.154287, 0.065312, 0.020032, 0.023498, 0.006996, -0.111386, -0.020826, -0.127208),
      Vector(0.124253, -0.032263, 0.099661, -0.124154, 0.013163, 0.112102, 0.034987, -0.041586),
      Vector(0.027705, -0.143034, -0.142231, 0.007383, 0.033265, 0.047721, -0.069642, 0.049485),
      Vector(-0.066063, -0.001772, -0.02861, 0.045751, 0.121383, 0.124976, 0.063701, -0.123252),
      Vector(0.078858, 0.243195, -0.028902, 0.005093, 0.047236, 0.009833, 0.100437, 0.070813),
      Vector(-0.14541, -4.57E-4, -0.02135, -0.10558, -0.056136, 0.054016, -0.090112, -0.089297),
      Vector(-0.045704, -0.004752, -0.01748, 0.178046, -0.010373, -0.149978, -0.019525, 0.016378),
      Vector(0.018216, -0.072177, 0.022187, -0.159312, 0.003888, -0.134825, -0.050672, 0.086506),
      Vector(0.040049, 0.100288, 0.186269, 0.0678, -0.039046, 0.094501, -0.017588, 0.026247)),
    Vector(
      Vector(0.008793, -0.001759, -0.088713, 0.050145, -0.098142, 0.107168, 0.100142, -0.068057),
      Vector(-0.105106, -0.071623, -0.095108, -0.104852, 0.122177, 0.074968, 0.008128, -0.03383),
      Vector(-0.036769, 0.210165, 0.008717, 0.024852, 0.116715, 0.06928, 0.102983, 0.046222),
      Vector(0.107824, -0.06587, 0.008954, 0.166113, -0.107237, 0.096693, -0.028738, 0.057741),
      Vector(0.039594, 0.009389, 0.126679, 0.033525, -0.070853, -0.005496, -0.162255, -0.099901),
      Vector(-0.01037, -0.173776, 0.145466, -0.062298, -0.017389, 0.065425, 0.025705, 0.028009),
      Vector(0.098303, 0.089834, 0.222384, -0.037794, -0.01643, -0.001113, 0.10028, -0.073376),
      Vector(0.015496, 0.08711, -0.155772, 0.002038, 0.078762, 0.011358, -0.118198, 0.063422),
      Vector(-0.011029, -0.020947, -0.020793, -0.113211, -0.066448, 0.028628, -0.113622, 0.175307),
      Vector(0.181967, -0.053214, -0.021384, -0.141142, 1.37E-4, 0.007386, 0.035628, 0.046769),
      Vector(-0.078019, 0.053886, -0.059821, -0.042274, -0.116963, -0.099838, -0.010861, -0.101589),
      Vector(0.034158, -0.133389, -0.036427, 0.042762, 0.0684, -0.085662, 0.095513, -0.121536),
      Vector(-0.100845, 0.005552, -0.02038, 0.065326, -0.04342, -0.110628, 0.043906, 0.129444),
      Vector(0.010624, 0.089087, -0.030809, -0.112612, 0.054267, -0.189063, -0.006531, 0.006285),
      Vector(-0.018181, -0.094366, -0.004122, 0.100522, 0.092782, 0.071382, -0.056442, 0.050801),
      Vector(-0.192719, -0.024701, 0.102352, 0.042529, -0.077993, 0.058304, -0.03097, 0.015033)),
    Vector(
      Vector(-3.29E-4, -0.027361, -0.075494, 0.200418, -0.006083, -0.064211, 0.01279, 0.049927),
      Vector(-0.162241, -0.125981, 0.075422, 0.020515, -0.067366, -0.015627, -0.014825, 0.10203),
      Vector(-0.099347, -0.023744, 0.012528, 0.074104, -0.006792, 0.16702, 0.092445, 1.48E-4),
      Vector(-0.098646, 0.009397, 0.00688, 0.052222, -0.029944, 0.08965, -0.115641, -0.189278),
      Vector(-0.006561, 0.031047, 0.026914, -0.005992, -0.21138, -0.011419, -0.031894, -0.129497),
      Vector(0.164679, -0.168346, 0.04073, -0.008208, -0.029997, 0.046641, -0.054612, 0.043852),
      Vector(0.006535, 0.100976, 0.112971, -0.022361, 0.05815, 2.13E-4, -0.011168, 0.154106),
      Vector(-0.050146, -0.12629, 0.051274, -0.055878, 0.153184, 0.015426, -0.088842, -0.012001),
      Vector(0.012055, 0.025362, -0.012058, -0.225973, -0.013084, -0.005973, 0.075102, -0.121641),
      Vector(-0.122152, 0.050217, -0.03737, 0.02687, 0.132482, -0.069091, 0.063142, -0.004274),
      Vector(0.024389, -0.058968, -0.067565, 0.001927, -0.05448, -0.196049, -0.035475, -0.058919),
      Vector(0.109361, 0.036541, -0.134346, -0.06123, 0.056867, 0.048812, 0.088522, 0.038877),
      Vector(0.07773, 0.109666, 0.086701, -0.041461, 0.053954, -0.071882, -0.091886, -0.063796),
      Vector(-0.043378, -0.097729, -0.145471, -0.09093, 0.015266, 0.022097, -0.078987, -4.46E-4),
      Vector(0.044077, 0.054539, 0.022233, -0.01393, -0.111841, 0.080094, 0.145788, 0.040342),
      Vector(0.048017, -0.071546, 0.173377, 0.059452, 0.089721, -0.028491, 0.113187, 0.01038)),
    Vector(
      Vector(0.044139, 0.008933, -0.053073, -0.166327, -0.091744, 0.022357, 0.028977, -0.112107),
      Vector(0.068212, -0.020926, 0.044766, 0.081634, -0.141693, -0.071534, -0.059481, -0.015792),
      Vector(-0.122102, 0.076697, 0.100172, -0.016562, -0.068997, -0.025396, 0.085333, 0.135191),
      Vector(-0.046961, 0.153243, -0.16393, 0.007664, -0.098649, 0.032661, -0.04448, 0.068204),
      Vector(0.010023, 0.040015, 0.028043, 0.039793, -0.05622, 0.098408, -0.129341, -0.128662),
      Vector(0.016088, 0.082283, -0.053129, 0.13755, 0.023103, -0.06176, 0.156799, -0.019892),
      Vector(0.10025, -0.015218, -0.003884, -0.099206, 0.017658, 0.065368, 0.090243, 0.138589),
      Vector(0.063437, 0.086356, 0.154429, 0.052599, 0.130421, 0.060334, -0.093694, -0.023774),
      Vector(-0.035095, -0.016623, 0.130552, -0.016839, -0.061256, -0.105714, 0.108418, -0.119658),
      Vector(-0.102107, -0.01873, 0.069227, -0.135002, 0.063393, 0.123603, -0.027008, -0.028116),
      Vector(0.06333, -0.078913, -0.033741, 0.08877, -0.010577, 0.18185, 0.052803, -0.012107),
      Vector(0.016436, -0.198406, 0.017655, -0.067462, 0.06765, -0.011738, -0.018331, -0.003196),
      Vector(0.121053, 0.032058, -0.032973, 0.079741, 0.087302, -0.092087, -0.07095, 0.146954),
      Vector(-0.124309, 0.021189, -0.044284, -0.074877, -0.025129, -0.115993, -0.12385, 0.011777),
      Vector(0.070146, -0.00475, -0.148093, -0.065143, 0.115895, -0.140058, -0.005164, -0.077757),
      Vector(-0.107715, -0.064365, -0.129992, 0.041008, 0.050001, 0.008727, 0.067421, -0.031942))
  )
  /** The committed RESIDUAL codebook — classical IVFADC (Jégou et al.
    * 2011 §IV): trained on x − c(x) offsets from the COMMITTED domain
    * centroids (tools/PqResidualTrain; per-subspace quantization MSE
    * 0.062 vs the raw codebook's 0.067 on the same fixture). Residuals
    * concentrate near the origin with the coarse structure removed, so
    * the same 4-bit budget resolves finer detail; reconstruction is
    * c(x) + decode(code), which also restores the centroid exactly.
    * Committed like [[codebook]] so residual codes stay a pure function
    * of (vector, two committed tables) — the DuckDB-replayability that
    * round 17 deliberately traded away by quantizing raw vectors is
    * recovered by committing the coarse table too.
    */
  val residualCodebook: Vector[Vector[Vector[Double]]] = Vector(
    Vector(
      Vector(0.057066, 0.125588, -0.026027, -0.11539, 0.04222, -0.0746, -0.084466, 0.055921),
      Vector(-0.064373, 0.005483, 0.00178, 0.044536, -0.002797, -0.130539, -0.029612, -0.1801),
      Vector(-0.011852, -0.06882, -0.092215, -0.030161, -0.074958, -0.073005, 0.172798, 0.073813),
      Vector(-0.149426, -0.025308, -0.039028, -0.06587, 0.093123, 0.009228, 0.07394, -0.065019),
      Vector(-0.104347, -0.100139, 0.031652, 0.002898, -3.14E-4, 0.144538, -0.010598, 0.09184),
      Vector(0.050727, -0.071197, 0.01927, 0.159055, -0.006654, -0.003095, -0.103736, 0.038669),
      Vector(-0.073782, 0.054137, 0.010108, -0.012776, -0.189446, 0.059704, -0.061702, -0.009268),
      Vector(0.091502, 0.099827, -0.15162, 0.050412, -0.08677, 0.032742, -0.021953, 0.115956),
      Vector(0.081938, -0.11356, 0.070284, -0.070625, -0.025826, 0.014078, -0.050161, -0.099709),
      Vector(0.054381, 0.064277, 0.122075, -0.041642, -0.034591, -0.064189, 0.105445, -0.065018),
      Vector(-0.056194, 0.092871, 0.025024, 0.062534, 0.071816, 0.102598, -0.173025, -0.042763),
      Vector(-0.059718, 0.002152, 0.164289, -0.025421, 0.112518, -0.105987, -0.032618, 0.014389),
      Vector(0.040824, -0.012256, -0.093737, 0.138987, 0.039504, 0.097258, 0.060602, -0.090861),
      Vector(0.181738, -0.012462, 0.020677, -0.055596, 0.033089, 0.033101, 0.053477, 0.138598),
      Vector(-0.007214, 0.152428, -0.010274, -0.069357, -0.075634, 0.045294, 0.126588, 0.013923),
      Vector(0.05353, -0.089572, -0.095589, 0.0245, 0.099883, -0.138045, -0.041622, 0.076138)),
    Vector(
      Vector(0.126451, 0.072726, 0.045431, -0.003878, -0.170772, 0.019719, -0.002157, -0.043279),
      Vector(-0.117067, -0.17925, -0.079122, 0.129719, 0.019271, 0.015276, 0.034077, -0.010589),
      Vector(-0.0159, -0.018232, -0.076618, -0.017762, 0.044708, 0.019217, -0.119847, 0.159681),
      Vector(0.07375, -0.103245, -0.066512, -0.003907, -0.048423, -0.134595, 0.084457, -0.041264),
      Vector(-0.081946, 0.001058, 0.013175, 0.026201, -0.082445, 0.079261, 0.12998, 0.11081),
      Vector(-0.042402, 0.170647, -0.026323, -0.040086, 0.04211, -0.128215, 0.039821, -0.082156),
      Vector(-0.125606, -0.0447, 0.080294, -0.03752, -0.072654, -0.041555, -0.083112, -0.096991),
      Vector(-0.016234, 0.116887, -0.074161, 0.203191, -0.080531, -0.033276, -0.107085, -0.001392),
      Vector(-0.024316, 0.065291, 0.006008, -0.222089, -0.00323, 0.046808, 0.004644, 0.044843),
      Vector(0.140857, 0.026255, -0.029509, 0.022418, 0.073623, 0.035364, 0.143676, 0.053739),
      Vector(0.029516, -9.26E-4, 0.071144, 0.105956, -0.008577, -0.128373, -0.050104, 0.063941),
      Vector(-2.25E-4, -0.119276, -0.159652, -0.091773, -0.009913, 0.208642, 0.045931, 0.02001),
      Vector(-0.010539, -0.117393, -0.001021, -0.014244, 0.045955, -0.001665, 0.031917, -0.218994),
      Vector(0.085915, -0.089334, 0.103307, -0.103618, 0.096469, -0.008583, -0.026745, 0.061316),
      Vector(-0.046331, 0.135491, 0.141353, 0.008924, 0.051329, 0.087702, -0.004397, -0.062762),
      Vector(-0.054977, 0.061283, -0.101303, 0.092017, 0.107344, 0.112713, -0.030991, -0.045938)),
    Vector(
      Vector(-0.070273, 0.101696, -0.010623, 0.090883, -0.02545, -0.141866, 0.095646, -0.084088),
      Vector(-0.122453, -0.118326, -0.061599, -0.05729, 0.051842, 0.05369, -0.042495, -0.081562),
      Vector(0.092116, 0.03245, -0.07979, 0.074917, 0.023887, 0.093018, -0.057322, 0.119936),
      Vector(0.047942, 0.025116, -0.093775, 0.036755, -0.103418, -0.062861, -0.095222, -0.036472),
      Vector(0.054111, -0.141708, 0.085281, -0.08296, 0.061378, -0.002633, -0.095797, 0.02629),
      Vector(0.105682, 0.073189, -0.010789, -0.132947, 0.073387, -0.034574, 0.05304, 0.110599),
      Vector(0.019115, 0.013591, -0.02614, 0.139348, 0.109291, 0.032804, 0.065709, -0.043809),
      Vector(7.31E-4, 0.141606, 0.057869, -0.114274, 0.061557, -0.023426, -0.01337, -0.112205),
      Vector(0.001186, -0.015086, 0.191257, 0.070295, 0.019394, -0.047871, -0.073908, 0.003467),
      Vector(-0.122657, 0.077435, 0.044974, 0.0105, -0.029497, 0.12979, -4.9E-4, -0.003009),
      Vector(0.112397, 0.011312, 6.49E-4, -0.070788, -0.05792, 0.076316, 0.098989, -0.157933),
      Vector(-0.054556, -0.10874, -0.015043, 0.075734, 0.027759, -0.123977, -0.02441, 0.106802),
      Vector(0.021793, 0.002897, 0.021095, -0.102147, -0.104211, 0.064509, 0.091078, 0.17418),
      Vector(0.097776, -0.04046, 0.088443, -0.027975, -0.223619, -0.031256, -0.035822, 0.068212),
      Vector(-0.021809, -0.054459, -0.198442, -0.037179, 0.152978, -0.004136, 0.066004, 0.023794),
      Vector(-0.065258, -0.133674, -0.139021, 0.077712, -0.130649, 0.03307, 0.126107, 0.068472)),
    Vector(
      Vector(-0.124994, 0.012957, 0.117111, 0.049418, -0.101283, 0.15761, 0.025383, -0.024859),
      Vector(-0.053333, 0.188659, -0.006126, 0.015283, -0.004313, -0.140009, 0.079888, -0.048934),
      Vector(0.03843, 0.012586, -0.11816, -0.066087, -0.028038, -0.037466, 0.07564, 0.11447),
      Vector(0.015198, -0.03227, 0.123247, 0.001961, -0.061381, -0.178777, -0.090842, 0.10833),
      Vector(-0.116981, -0.03495, -0.110008, 0.065303, -0.042131, 0.023761, -0.157645, 0.113033),
      Vector(-0.018088, -0.071076, -0.114902, 0.130941, -0.123805, 0.044097, 0.107908, -0.054039),
      Vector(0.144046, 0.07914, -0.012202, -0.056303, 0.009174, 0.069198, 0.125534, -0.105926),
      Vector(-0.056959, -0.145656, 0.044226, 0.02552, 0.067281, 0.016873, 0.104247, 0.015393),
      Vector(-0.140323, -0.057046, -0.041829, -0.169028, 0.034634, -0.049074, 0.010207, -0.060928),
      Vector(-0.082557, 0.158425, -0.065536, -0.009746, 0.07349, 0.124532, -0.043388, 0.016304),
      Vector(0.035175, 0.028428, -0.049782, 0.051949, -0.118968, -0.018099, -0.169547, -0.073591),
      Vector(0.09205, 0.140221, 0.130712, -0.017569, -6.0E-6, 0.00335, -0.027125, 0.088864),
      Vector(0.023335, -0.053726, 0.152758, -0.055957, 0.073819, 0.020889, -0.072912, -0.136803),
      Vector(0.067548, -0.145249, -0.011638, -0.003744, -0.097205, -0.10822, 0.075746, -0.045072),
      Vector(0.047734, -0.02126, -0.024137, 0.109701, 0.136282, -0.053793, -0.037935, 0.085399),
      Vector(0.117096, -0.045562, -0.043985, -0.019757, 0.052438, 0.141398, -0.040014, 0.00295)),
    Vector(
      Vector(-0.198582, -0.077984, 0.070313, 0.033808, 0.048808, 0.021836, 0.069203, 0.036708),
      Vector(-0.108, 0.079058, -0.037398, 0.056117, 0.044221, -0.076136, -0.068467, -0.082136),
      Vector(-0.04421, -0.075123, -0.088005, -0.036598, -0.051453, -0.055365, 0.134632, -0.118659),
      Vector(0.064577, -0.008718, 0.010452, 0.134552, 0.118473, -0.013181, 0.073154, 0.118251),
      Vector(-0.002928, -0.003673, 0.103783, 0.126606, -0.053759, 0.010694, 0.011715, -0.139549),
      Vector(0.010362, 0.08711, -0.062031, 0.035429, -0.112644, -0.05157, 0.159864, 0.052863),
      Vector(-0.139886, 0.022881, -0.11064, 0.026391, -0.109961, 0.104446, -0.056316, 0.05814),
      Vector(0.132423, 0.063953, -0.013863, 0.02513, 0.036895, -0.112388, -0.041923, -0.120094),
      Vector(0.028072, -0.026328, 0.033559, 0.018314, 0.122993, 0.137269, -0.102951, -0.083195),
      Vector(0.081688, -0.079943, -0.118879, 0.003831, -3.13E-4, 0.136373, -0.045857, 0.040228),
      Vector(0.105697, -0.070749, 0.066264, -0.125999, 0.029991, 0.010664, 0.128192, -0.039253),
      Vector(0.066988, 0.232826, -0.010365, 0.008327, 0.074674, 0.031891, 0.035229, 0.027765),
      Vector(-0.078658, 0.001089, 0.040755, -0.132918, -0.100981, 5.73E-4, -0.091963, -0.070594),
      Vector(0.031272, -0.100165, 0.057973, 0.044338, -0.082019, -0.076569, -0.043543, 0.111439),
      Vector(-0.004331, -0.03045, -0.029976, -0.129689, 0.082227, -0.130467, -0.086825, 0.090755),
      Vector(0.012564, 0.096969, 0.126734, 0.005436, -0.119345, 0.131329, 0.028319, 0.116988)),
    Vector(
      Vector(0.113275, -0.149562, -0.015852, -0.08955, -0.069742, -0.063993, 0.002842, -0.040234),
      Vector(-0.13315, -0.035261, -0.08013, -0.078267, 0.111991, 0.080822, 0.047888, -0.044139),
      Vector(0.109606, -0.016322, -0.01139, 0.041004, 0.096146, 0.166105, 0.020886, -0.015112),
      Vector(0.115452, -0.033431, 0.011358, 0.170787, -0.018606, 0.043388, -0.055282, 0.121457),
      Vector(0.00811, -0.018485, 0.161666, 0.064123, -0.084265, 0.051292, -0.086954, -0.09584),
      Vector(0.020699, -0.095367, 0.149172, -0.094757, 0.097735, 0.019956, 0.015848, 0.03296),
      Vector(0.02408, 0.102305, 0.09374, -0.029655, 0.035118, -0.069573, 0.138215, -0.106708),
      Vector(-0.048921, 0.187163, -0.092113, -0.016514, 0.111876, 0.009156, -0.034086, 0.105722),
      Vector(0.027616, 0.073501, -0.087115, -0.063, -0.132643, 0.03575, -0.054847, 0.061445),
      Vector(0.164403, -0.008966, -0.048448, -0.097404, 0.056814, 0.109256, 0.050959, 0.133035),
      Vector(-0.094037, 0.084333, -0.039081, -0.027812, -0.046154, -0.025972, -0.054365, -0.139485),
      Vector(0.040357, -0.026295, -0.095444, 0.129685, -0.094784, 0.037028, 0.078862, -0.093208),
      Vector(-0.089542, 0.040072, 0.026267, 0.03868, -0.045136, -0.149128, 0.032596, 0.100858),
      Vector(0.071219, 0.054485, -0.058349, -0.142388, 0.055992, -0.107985, -0.048581, 0.03562),
      Vector(-0.050782, -0.078071, -0.025269, 0.135392, 0.136022, -0.010665, 0.032788, 0.018572),
      Vector(-0.147098, -0.083586, 0.00872, 0.043434, -0.069773, 0.047665, -0.014008, 0.029857)),
    Vector(
      Vector(0.105989, 0.063021, -0.049774, 0.108922, 0.01783, -0.089044, -0.020712, 0.01129),
      Vector(-0.047803, -0.149544, 0.06081, -0.056694, -0.060104, 0.041744, -0.018758, 0.097888),
      Vector(-0.1107, -0.024867, -0.029607, 0.047327, 0.142834, 0.018418, 0.030526, -0.013786),
      Vector(-0.14759, 0.049597, -0.009142, 0.065442, -0.118089, 0.096311, -0.060032, -0.108503),
      Vector(0.06473, 0.015525, 0.045277, -0.032606, -0.138495, -0.070125, -0.080242, -0.112772),
      Vector(0.199565, -0.188757, -0.024262, 0.037458, -0.075478, 0.094508, -0.055128, 0.073461),
      Vector(-0.005265, 0.136408, 0.103847, 0.005815, 0.059235, 0.041072, -0.040244, 0.118544),
      Vector(0.014246, -0.076721, 0.125946, 0.114818, 0.005492, 0.089488, -0.120905, -0.110164),
      Vector(0.125812, 0.010637, -0.012333, -0.180466, 0.022103, 0.013153, 0.004945, -0.018906),
      Vector(-0.086731, 0.105621, -0.06205, -0.098756, 0.050529, -0.041174, 0.078532, -0.07316),
      Vector(-0.108533, -0.011859, -0.084847, 0.10275, -0.056746, -0.093668, -0.032157, 0.07487),
      Vector(0.083869, 0.030433, -0.115153, -0.029793, -0.020646, 0.099341, 0.100897, 0.066659),
      Vector(-0.010586, -0.009873, 0.102413, -0.081115, 0.144921, -0.100534, -0.08218, -0.066239),
      Vector(-0.017922, -0.117467, -0.14088, -0.08063, 0.019973, 0.00712, -0.062674, -0.017157),
      Vector(0.029857, 0.101524, 0.035979, 0.03248, -0.076315, 0.083132, 0.116946, -0.032703),
      Vector(0.031535, -0.084475, 0.141155, 0.043083, 0.006872, -0.067112, 0.133245, 0.013237)),
    Vector(
      Vector(-0.02638, -0.028791, -0.076662, -0.051076, -0.117478, 0.0157, 0.039193, -0.157848),
      Vector(0.067449, 0.053845, 0.058541, 0.022816, -0.117489, -0.057992, -0.135307, 0.038606),
      Vector(-0.138716, 0.055539, 0.060627, -0.048058, 0.010505, -0.018989, -0.01103, 0.132762),
      Vector(-0.046023, 0.130813, -0.105803, 0.045253, -0.139738, 0.064883, -0.047938, 0.066831),
      Vector(-0.006237, -0.045849, 0.068987, 0.099452, -0.040855, 0.051442, -0.101597, -0.113294),
      Vector(-0.049297, 0.106189, -0.184944, 0.054876, 0.025504, -0.100705, 0.074367, 0.031357),
      Vector(0.073174, -0.092686, -0.02158, -0.045994, 0.031103, 0.04277, 0.086083, 0.147968),
      Vector(-0.004449, 0.008679, 0.07217, 0.175272, -0.036449, -0.059908, 0.075924, -0.002733),
      Vector(0.035071, -0.092966, 0.056831, -0.030592, 0.010889, -0.155455, 0.0736, -0.129063),
      Vector(0.022755, 0.094221, 0.132479, -0.057264, 0.074521, 0.126048, -0.033157, -0.052155),
      Vector(0.102938, -0.064761, -0.028563, 0.072029, 0.054094, 0.168564, -0.014625, -0.001392),
      Vector(0.078003, 0.027661, 0.049249, -0.177443, -0.083059, 0.002075, 0.014095, 0.012377),
      Vector(0.063567, 0.067191, 0.050512, 0.062825, 0.162151, -0.090838, -0.040011, 0.081327),
      Vector(-0.139486, -0.095343, -0.021234, -0.082233, -0.002712, -0.004982, -0.057481, 0.003515),
      Vector(0.055243, 0.035377, -0.146764, -0.132217, 0.066424, -0.08524, -0.016984, 2.32E-4),
      Vector(-0.085622, -0.095988, -0.098053, 0.08397, 0.045394, 0.035617, 0.131438, -0.047694))
  )

  val M: Int = codebook.length
  val K: Int = codebook.head.length
  val Dsub: Int = codebook.head.head.length
  val D: Int = M * Dsub

  /** The codebook serialized for the expressions' foldable second
    * argument: "M K Dsub v v v ..." with values flattened in (m, c, d)
    * order, space-joined, rendered by Double.toString — the identical
    * text [[duckCodebookValues]] embeds, so both engines parse the
    * identical doubles.
    */
  val codebookSpec: String =
    s"$M $K $Dsub " +
      codebook.flatMap(_.flatMap(_.map(_.toString))).mkString(" ")

  /** [[codebookSpec]] for the residual codebook — same wire format, so
    * every PQ expression accepts either table.
    */
  val residualCodebookSpec: String =
    s"$M $K $Dsub " +
      residualCodebook.flatMap(_.flatMap(_.map(_.toString))).mkString(" ")

  /** [[duckCodebookValues]] for the residual codebook. */
  def duckResidualCodebookValues: String =
    residualCodebook.zipWithIndex.flatMap { case (cents, m) =>
      cents.zipWithIndex.map { case (cent, c) =>
        s"($m, $c, [${cent.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n    ")

  /** The codebook as a DuckDB `(m, c, cent)` VALUES list (cent a
    * DOUBLE[] literal), for the oracle's replay of encode/reconstruct.
    */
  def duckCodebookValues: String =
    codebook.zipWithIndex.flatMap { case (cents, m) =>
      cents.zipWithIndex.map { case (cent, c) =>
        s"($m, $c, [${cent.mkString(", ")}]::DOUBLE[])"
      }
    }.mkString(",\n    ")

  /** Shared analysis-time shape check of the codebook spec string
    * ("M K Dsub v..." with exactly M*K*Dsub parseable values).
    */
  def specShapeOk(spec: String): Boolean = {
    val parts = spec.split(" ", -1)
    parts.length > 3 &&
      Seq(0, 1, 2).forall(i => parts(i).toIntOption.exists(_ > 0)) &&
      parts.length == 3 + parts(0).toInt * parts(1).toInt * parts(2).toInt &&
      parts.drop(3).forall(_.toDoubleOption.isDefined)
  }

  /** The compiled PQ kernels over one parsed codebook. One instance per
    * expression (shipped via `addReferenceObj`), shared by interpreted
    * and generated code.
    */
  final class Coder(spec: String) extends Serializable {
    private val parts = spec.split(" ", -1)
    val m: Int = parts(0).toInt
    val k: Int = parts(1).toInt
    val dsub: Int = parts(2).toInt
    val d: Int = m * dsub
    // flat (m, c, d) order, matching codebookSpec
    private val cb: Array[Double] = {
      val vals = new Array[Double](m * k * dsub)
      var i = 0
      while (i < vals.length) { vals(i) = parts(3 + i).toDouble; i += 1 }
      vals
    }

    private def elem(v: ArrayData, i: Int, isFloat: Boolean): Double = {
      if (v.isNullAt(i))
        throw new IllegalArgumentException(
          s"graft_pq: NULL element at position $i — PQ requires dense vectors")
      if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
    }

    private def checkDim(v: ArrayData): Unit =
      if (v.numElements() != d)
        throw new IllegalArgumentException(
          s"graft_pq: expected $d-dim vector (M=$m × Dsub=$dsub), got ${v.numElements()}")

    /** Nearest-centroid index per subspace. Distance accumulates
      * left-to-right over the subspace dims; ties keep the LOWEST
      * centroid id (strict <) — the oracle's ORDER BY d2, c.
      */
    def encode(v: ArrayData, isFloat: Boolean): ArrayData = {
      checkDim(v)
      val out = new Array[Int](m)
      var mm = 0
      while (mm < m) {
        var best = 0
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val base = (mm * k + c) * dsub
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val t = elem(v, mm * dsub + i, isFloat) - cb(base + i)
            acc += t * t
            i += 1
          }
          if (acc < bestD) { bestD = acc; best = c }
          c += 1
        }
        out(mm) = best
        mm += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    /** Reconstruction mean-squared-error of one vector: the
      * per-subspace minimum squared distances summed left-to-right
      * over subspaces, divided by D — the quantization-quality number
      * an IVF-PQ deployment audits before trusting PQ scores.
      */
    def reconMse(v: ArrayData, isFloat: Boolean): Double = {
      checkDim(v)
      var total = 0.0
      var mm = 0
      while (mm < m) {
        var bestD = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          val base = (mm * k + c) * dsub
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val t = elem(v, mm * dsub + i, isFloat) - cb(base + i)
            acc += t * t
            i += 1
          }
          if (acc < bestD) bestD = acc
          c += 1
        }
        total += bestD
        mm += 1
      }
      total / d
    }

    /** Bits per code and packed byte width: the 4-bit-packable claim
      * made real — K=16 packs M=8 codes into 4 bytes (64 x 4 B floats
      * -> 4 B: 64x), K=256 into 8 bytes. MSB-first fixed-width bit
      * layout, zero-padded tail.
      */
    val codeBits: Int = 32 - Integer.numberOfLeadingZeros(math.max(k - 1, 1))
    val packedBytes: Int = (m * codeBits + 7) / 8

    /** Pack an M-code array into the fixed-width binary layout. Wrong
      * arity, NULL, or out-of-range codes fail loudly — a silently
      * corrupted packed store is unrecoverable.
      */
    def pack(codes: ArrayData): Array[Byte] = {
      if (codes.numElements() != m)
        throw new IllegalArgumentException(
          s"graft_pq_pack: expected $m codes, got ${codes.numElements()}")
      val out = new Array[Byte](packedBytes)
      var bit = 0
      var i = 0
      while (i < m) {
        if (codes.isNullAt(i))
          throw new IllegalArgumentException(s"graft_pq_pack: NULL code at position $i")
        val c = codes.getInt(i)
        if (c < 0 || c >= k)
          throw new IllegalArgumentException(
            s"graft_pq_pack: code $c at position $i out of range [0, $k)")
        var b = codeBits - 1
        while (b >= 0) {
          if (((c >> b) & 1) == 1)
            out(bit >> 3) = (out(bit >> 3) | (0x80 >> (bit & 7))).toByte
          bit += 1
          b -= 1
        }
        i += 1
      }
      out
    }

    /** Inverse of [[pack]]; validates the byte width. */
    def unpack(bytes: Array[Byte]): ArrayData = {
      if (bytes.length != packedBytes)
        throw new IllegalArgumentException(
          s"graft_pq_unpack: expected $packedBytes bytes, got ${bytes.length}")
      val out = new Array[Int](m)
      var bit = 0
      var i = 0
      while (i < m) {
        var c = 0
        var b = 0
        while (b < codeBits) {
          c = (c << 1) | ((bytes(bit >> 3) >> (7 - (bit & 7))) & 1)
          bit += 1
          b += 1
        }
        out(i) = c
        i += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }

    /** Asymmetric-distance (ADC) lookup tables for one raw query
      * vector: `dotLut(m*K + c)` = left-to-right dot of the query's
      * m-th subvector with centroid (m, c); `nrmLut` the centroid's
      * self-dot. Driver-side (M×K doubles), computed once per query.
      */
    def luts(q: Array[Double]): (Array[Double], Array[Double]) = {
      require(q.length == d, s"graft_pq: query dim ${q.length} != $d")
      val dotLut = new Array[Double](m * k)
      val nrmLut = new Array[Double](m * k)
      var mm = 0
      while (mm < m) {
        var c = 0
        while (c < k) {
          val base = (mm * k + c) * dsub
          var dp = 0.0
          var nn = 0.0
          var i = 0
          while (i < dsub) {
            dp += q(mm * dsub + i) * cb(base + i)
            nn += cb(base + i) * cb(base + i)
            i += 1
          }
          dotLut(mm * k + c) = dp
          nrmLut(mm * k + c) = nn
          c += 1
        }
        mm += 1
      }
      (dotLut, nrmLut)
    }

    /** [[luts]] for a RESIDUAL index (IVFADC): reconstruction is
      * cellCent + centroid, so per (m, c) the tables hold
      * `dotLut = q_sub · (cellCent_sub + cb)` and
      * `nrmLut = (cellCent_sub + cb)·(cellCent_sub + cb)` — the
      * existing graft_pq_adc kernel then computes
      * cos(q, ĉ + r̂) with NO expression change, the cell constant
      * folded into the per-cell tables (one table pair per PROBED
      * cell, nprobe × M × K driver doubles per query). Same
      * left-to-right dsub fold as [[luts]] and the oracle's list_sum
      * chains.
      */
    def lutsRecon(q: Array[Double], cellCent: Array[Double]): (Array[Double], Array[Double]) = {
      require(q.length == d, s"graft_pq: query dim ${q.length} != $d")
      require(cellCent.length == d,
        s"graft_pq: cell centroid dim ${cellCent.length} != $d")
      val dotLut = new Array[Double](m * k)
      val nrmLut = new Array[Double](m * k)
      var mm = 0
      while (mm < m) {
        var c = 0
        while (c < k) {
          val base = (mm * k + c) * dsub
          var dp = 0.0
          var nn = 0.0
          var i = 0
          while (i < dsub) {
            val recon = cellCent(mm * dsub + i) + cb(base + i)
            dp += q(mm * dsub + i) * recon
            nn += recon * recon
            i += 1
          }
          dotLut(mm * k + c) = dp
          nrmLut(mm * k + c) = nn
          c += 1
        }
        mm += 1
      }
      (dotLut, nrmLut)
    }

    /** Batched-ADC per-pair partials: for ONE (query, code) pair,
      * (dpsum, nnsum) with recon_m = (cent_sub_m +) cb[m][code_m] —
      * the identical two-level fold as [[luts]]/[[lutsRecon]] composed
      * with the ADC table walk (inner dsub loop left-to-right, outer
      * accumulation in m order), so a batched score bit-equals the
      * single-query LUT path and the DuckDB list_sum replay. An EMPTY
      * `cent` means raw reconstruction (cb only); otherwise it must be
      * D-dim (the residual/IVFADC form). Per pair this is M×Dsub
      * multiplies — the cost of one raw dot — but over 4-byte codes
      * instead of D floats: batching trades the LUT's per-(query,cell)
      * amortization for a store the size PQ promised.
      */
    def pair(q: ArrayData, qIsFloat: Boolean, codes: ArrayData,
        cent: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
      require(q.numElements() == d,
        s"graft_pq_adc_pair: query dim ${q.numElements()} != $d")
      require(codes.numElements() == m,
        s"graft_pq_adc_pair: ${codes.numElements()} codes for M=$m subspaces")
      val residual = cent.numElements() != 0
      require(!residual || cent.numElements() == d,
        s"graft_pq_adc_pair: cell centroid dim ${cent.numElements()} != $d")
      var dpsum = 0.0
      var nnsum = 0.0
      var mm = 0
      while (mm < m) {
        val c = codes.getInt(mm)
        require(c >= 0 && c < k,
          s"graft_pq_adc_pair: code $c outside [0, $k) at subspace $mm")
        val base = (mm * k + c) * dsub
        var dp = 0.0
        var nn = 0.0
        var i = 0
        while (i < dsub) {
          // branch, don't add 0.0: `0.0 + (-0.0)` flips a sign-of-zero
          // and the rounded cosine could hash-diverge from the LUT path
          val recon =
            if (residual) cent.getDouble(mm * dsub + i) + cb(base + i)
            else cb(base + i)
          dp += elem(q, mm * dsub + i, qIsFloat) * recon
          nn += recon * recon
          i += 1
        }
        dpsum += dp
        nnsum += nn
        mm += 1
      }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](dpsum, nnsum))
    }
  }
}

/** Shared (vector, foldable codebook-spec) contract of the PQ
  * expressions: analysis-time spec validation and the
  * once-per-expression [[Pq.Coder]]. NULL vector → NULL; a
  * wrong-dimension or NULL-element vector fails LOUDLY at runtime (a
  * silent skip would corrupt the index).
  */
trait PqExpressionBase extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), StringType) if right.foldable =>
      right.eval() match {
        case null => TypeCheckResult.TypeCheckFailure(s"$prettyName: codebook spec must not be null")
        case s: UTF8String =>
          if (Pq.specShapeOk(s.toString)) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName: codebook spec must be 'M K Dsub v...' with M*K*Dsub values")
        case s => TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected codebook spec $s")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient protected lazy val coder: Pq.Coder =
    new Pq.Coder(right.eval().asInstanceOf[UTF8String].toString)

  protected def isFloatInput: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def coderRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("graftPqCoder", coder, classOf[Pq.Coder].getName)
}

/** graft_pq_encode(vec, 'M K Dsub v...') — the PQ code of `vec` under
  * the committed codebook ([[Pq.codebookSpec]]): `array<int>` of M
  * per-subspace nearest-centroid indices (each in [0, K)). This is the
  * column an IVF-PQ store persists INSTEAD of the raw embedding.
  */
case class PqEncode(left: Expression, right: Expression) extends PqExpressionBase {
  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(v: Any, s: Any): Any =
    coder.encode(v.asInstanceOf[ArrayData], isFloatInput)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = coderRef(ctx)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $ref.encode($v, $isFloatInput);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_pq_recon_mse(vec, 'M K Dsub v...') — mean squared error
  * between `vec` and its PQ reconstruction (the concatenated chosen
  * centroids): the per-vector quantization-quality audit
  * (`sim_pq_reconstruction_mse`). Same compiled loops and arithmetic
  * order as [[PqEncode]], so code and error can never disagree.
  */
case class PqReconMse(left: Expression, right: Expression) extends PqExpressionBase {
  override def prettyName: String = "graft_pq_recon_mse"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(v: Any, s: Any): Any =
    coder.reconMse(v.asInstanceOf[ArrayData], isFloatInput)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = coderRef(ctx)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = $ref.reconMse($v, $isFloatInput);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_pq_pack(codes, 'M K Dsub v...') — an M-code array packed into
  * ceil(M*ceil(log2 K)/8) bytes (MSB-first fixed width): the at-rest
  * form of a PQ store once the 4-bit-packable claim is cashed in
  * (K=16: 8 codes -> 4 bytes -> 64x vs raw 64-float embeddings).
  * Value-level correctness is anchored by sim_ann_ivfpq_packed_fullprobe
  * (same DuckDB oracle as the unpacked fullprobe — the packed store
  * must produce the identical score surface).
  */
case class PqPack(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_pq_pack"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), StringType) if right.foldable =>
      right.eval() match {
        case s: UTF8String if Pq.specShapeOk(s.toString) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: codebook spec must be 'M K Dsub v...' with M*K*Dsub values")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val coder: Pq.Coder =
    new Pq.Coder(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(codes: Any, s: Any): Any =
    coder.pack(codes.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCoder", coder, classOf[Pq.Coder].getName)
    nullSafeCodeGen(ctx, ev, (c, _) => s"${ev.value} = $ref.pack($c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_pq_unpack(bin, 'M K Dsub v...') — inverse of [[PqPack]];
  * `graft_pq_unpack(graft_pq_pack(c, m), m) == c` for every valid code
  * array (SimilaritySpec property + the packed fullprobe hash).
  */
case class PqUnpack(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_pq_unpack"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, StringType) if right.foldable =>
      right.eval() match {
        case s: UTF8String if Pq.specShapeOk(s.toString) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: codebook spec must be 'M K Dsub v...' with M*K*Dsub values")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val coder: Pq.Coder =
    new Pq.Coder(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(bin: Any, s: Any): Any =
    coder.unpack(bin.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqCoder", coder, classOf[Pq.Coder].getName)
    nullSafeCodeGen(ctx, ev, (b, _) => s"${ev.value} = $ref.unpack($b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** graft_pq_adc(codes, 'K qnorm d... n...') — the ADC scoring kernel as
  * a native codegen'd expression: PQ-reconstructed cosine
  * `Σₘ dotLut[m][codeₘ] / (qnorm · sqrt(Σₘ nrmLut[m][codeₘ]))` over a
  * foldable per-query spec carrying K, |q|, and the two M×K lookup
  * tables (built on the driver by [[Pq.Coder.luts]], rendered via
  * Double.toString — shortest-uniquely-parsing, so the spec round-trip
  * is bit-exact). Spark's transform/aggregate higher-order functions
  * are INTERPRETED (CodegenFallback — the VectorExpressions lesson), so
  * the probe hot path graduates to a compiled loop here; the arithmetic
  * is the identical per-accumulator left-to-right fold over m, keeping
  * the fullprobe oracles hash-green. Out-of-range codes or a
  * zero/negative denominator fail LOUDLY (a corrupt store or LUT must
  * stop the query, not emit silently wrong scores).
  */
case class PqAdcScore(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_pq_adc"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), StringType) if right.foldable =>
      right.eval() match {
        case s: UTF8String =>
          val parts = s.toString.split(" ", -1)
          val ok = parts.length > 2 &&
            parts(0).toIntOption.exists(_ > 0) &&
            parts.drop(1).forall(_.toDoubleOption.isDefined) &&
            (parts.length - 2) % (2 * parts(0).toInt) == 0 &&
            parts.length > 2 + parts(0).toInt // at least M=1 subspace per table
          if (ok) TypeCheckResult.TypeCheckSuccess
          else TypeCheckResult.TypeCheckFailure(
            s"$prettyName: spec must be 'K qnorm <M*K dot values> <M*K nrm values>'")
        case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName: spec must not be null")
      }
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, foldable string) inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  @transient private lazy val table: PqAdcScore.Table =
    new PqAdcScore.Table(right.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(codes: Any, s: Any): Any =
    table.score(codes.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqAdc", table, classOf[PqAdcScore.Table].getName)
    nullSafeCodeGen(ctx, ev, (c, _) => s"${ev.value} = $ref.score($c);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqAdcScore {
  /** Parsed per-query lookup tables; one instance per expression,
    * shipped via addReferenceObj to generated code. */
  final class Table(spec: String) extends Serializable {
    private val parts = spec.split(" ", -1)
    val k: Int = parts(0).toInt
    val qnorm: Double = parts(1).toDouble
    private val m: Int = (parts.length - 2) / (2 * k)
    private val dotLut: Array[Double] = {
      val a = new Array[Double](m * k)
      var i = 0
      while (i < a.length) { a(i) = parts(2 + i).toDouble; i += 1 }
      a
    }
    private val nrmLut: Array[Double] = {
      val a = new Array[Double](m * k)
      var i = 0
      while (i < a.length) { a(i) = parts(2 + m * k + i).toDouble; i += 1 }
      a
    }

    def score(codes: ArrayData): Double = {
      if (codes.numElements() != m)
        throw new IllegalArgumentException(
          s"graft_pq_adc: expected $m codes for the supplied LUTs, got ${codes.numElements()}")
      var dp = 0.0
      var nn = 0.0
      var i = 0
      while (i < m) {
        if (codes.isNullAt(i))
          throw new IllegalArgumentException(s"graft_pq_adc: NULL code at position $i")
        val c = codes.getInt(i)
        if (c < 0 || c >= k)
          throw new IllegalArgumentException(
            s"graft_pq_adc: code $c at position $i out of range [0, $k)")
        dp += dotLut(i * k + c)
        nn += nrmLut(i * k + c)
        i += 1
      }
      val denom = qnorm * math.sqrt(nn)
      if (!(denom > 0))
        throw new IllegalArgumentException(
          s"graft_pq_adc: non-positive denominator (qnorm=$qnorm, nrm-sum=$nn) — " +
            "corrupt LUTs or a zero query vector")
      dp / denom
    }
  }
}

/** graft_pq_adc_pair(q, codes, cent, spec) — the BATCHED ADC scoring
  * kernel: per (query, stored-code) pair, the struct
  * `(dp, nn)` = (Σₘ q_subₘ·reconₘ, Σₘ reconₘ·reconₘ) with
  * reconₘ = (cent_subₘ +) cb[m][codeₘ], folded exactly like the
  * single-query LUT path ([[Pq.Coder.luts]]/[[Pq.Coder.lutsRecon]]
  * composed with [[PqAdcScore.Table.score]]'s m-order walk), so the
  * relational cosine `dp / (|q| · sqrt(nn))` bit-equals the LUT probe
  * and the DuckDB list_sum replay.
  *
  * Why a fourth PQ kernel: [[PqAdcScore]] amortizes one M×K table pair
  * per (query, cell) — perfect for a single query, impossible for a
  * BATCH of queries, where the tables would be |Q|×nprobe×M×K driver
  * literals. Here the codebook alone rides the plan (one foldable
  * spec, parsed once) and the query vector is a runtime column, so a
  * whole query table joins the codes store in one compiled plan. Per
  * pair the cost is M×Dsub multiplies — one raw dot's worth of CPU —
  * while the scanned side stays the 4-byte packed-code store instead
  * of D floats: the 64× at-rest/IO advantage PQ exists for, now
  * available to the batched k-NN join.
  *
  * `cent` empty ⇒ raw reconstruction; D-dim ⇒ residual (IVFADC).
  * NULL inputs → NULL row (join semantics); wrong dims, short code
  * arrays, and out-of-range codes fail LOUDLY — silently mis-scoring a
  * serving batch is the failure mode.
  */
case class PqAdcPair(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def prettyName: String = "graft_pq_adc_pair"
  override def dataType: DataType = StructType(Seq(
    StructField("dp", DoubleType, nullable = false),
    StructField("nn", DoubleType, nullable = false)))

  private def qIsFloat: Boolean =
    first.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = first.dataType match {
    case ArrayType(FloatType | DoubleType, _) =>
      (second.dataType, third.dataType, fourth.dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), StringType)
            if fourth.foldable =>
          fourth.eval() match {
            case null => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: codebook spec must not be null")
            case s: UTF8String if Pq.specShapeOk(s.toString) =>
              TypeCheckResult.TypeCheckSuccess
            case _ => TypeCheckResult.TypeCheckFailure(
              s"$prettyName: codebook spec must be 'M K Dsub v...' with M*K*Dsub values")
          }
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<float|double>, array<int>, " +
            "array<double>, foldable string) inputs")
      }
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> query vector, got ${t.catalogString}")
  }

  @transient private lazy val coder: Pq.Coder =
    new Pq.Coder(fourth.eval().asInstanceOf[UTF8String].toString)

  override def nullSafeEval(q: Any, codes: Any, cent: Any, spec: Any): Any =
    coder.pair(q.asInstanceOf[ArrayData], qIsFloat,
      codes.asInstanceOf[ArrayData], cent.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftPqPairCoder", coder, classOf[Pq.Coder].getName)
    nullSafeCodeGen(ctx, ev, (q, codes, cent, _) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.pair($q, $qIsFloat, $codes, $cent);")
  }

  override protected def withNewChildrenInternal(
      e1: Expression, e2: Expression, e3: Expression, e4: Expression): Expression =
    copy(first = e1, second = e2, third = e3, fourth = e4)
}
