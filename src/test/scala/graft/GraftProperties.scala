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

  property("stubDecodeFeatures is deterministic and bounded in [0,1)") =
    forAll { (bytes: Array[Byte]) =>
      val a = graft.ops.Multimodal.stubDecodeFeatures(bytes)
      val b = graft.ops.Multimodal.stubDecodeFeatures(bytes)
      a.sameElements(b) && a.length == 8 && a.forall(v => v >= 0f && v < 1f)
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

  private def sparkProp(gen: Gen[List[(Long, Long)]])(f: List[(Long, Long)] => Boolean): Prop = {
    var runs = 0
    forAll(gen) { xs => runs += 1; runs > fewCases || f(xs) }
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
