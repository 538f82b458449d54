package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Relational suite over the TPC-H-ish star schema — the join/agg surface
  * the reference never had but any user of this engine needs the moment the
  * warehouse tables are queried (SURVEY.md §2.4 note + north star).
  *
  * Scale notes baked into every query:
  *  - only FIXED-cardinality dimensions (nation=25, region=5) carry a
  *    `broadcast()` hint; tables that scale with data volume (customer,
  *    part, ...) are left to AQE, which broadcasts them when they fit and
  *    shuffles when they don't — a forced hint would OOM at 100 TB;
  *  - money aggregates route through DECIMAL so partial aggregation is
  *    associative bit-for-bit (double sums are partition-order dependent →
  *    would break both the oracle hash and cross-run reproducibility);
  *  - final ORDER BY keys are total orders (explicit tiebreaks) so top-k
  *    and limits are deterministic under any partitioning.
  */
object Relational {

  private val dec = "decimal(18,2)"

  /** TPC-H Q1-shaped pricing summary: scan-heavy groupBy with partial
    * (map-side) aggregation; the filter is pushed to the parquet scan.
    */
  val pricingSummary = QueryDef(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS DOUBLE) AS avg_qty,
      |       count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(dec)).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)).cast("double"))
          .cast("double").as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus"))

  /** Star-join revenue rollup by nation: lineitem ⋈ orders shuffles on the
    * order key; customer/nation/region ride in as broadcasts (verify:
    * .explain shows BroadcastHashJoin for all three). AQE handles skew.
    */
  val revenueByNation = QueryDef(
    "q_join_revenue_by_nation",
    """SELECT n_name,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n_lines
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE r_name IN ('EUROPE', 'ASIA')
      |GROUP BY n_name ORDER BY n_name""".stripMargin)(
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name").isin("EUROPE", "ASIA"))
      // customer scales with the data — no forced broadcast (a hint would
      // override AQE's size check and OOM at 100 TB); nation (25 rows) and
      // region (5 rows) are fixed-cardinality and safe to pin broadcast.
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("n_name")
    })

  /** TPC-H Q3-shaped shipping priority: the classic selective three-way
    * join — filters on ALL THREE sides (segment on customer, date range
    * split across orders and lineitem) must each reach their own scan
    * as pushed predicates before any join forms, then revenue rolls up
    * per order and TakeOrderedAndProject keeps the top 10 (no global
    * sort). At 100 TB the segment filter makes the customer side
    * broadcast-eligible for AQE; the orders⋈lineitem join shuffles on
    * the order key with both sides pre-filtered by their date bounds.
    */
  val shippingPriority = QueryDef(
    "q_shipping_priority",
    """SELECT l_orderkey,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin)(
    (s, d) => {
      val cut = lit("1997-06-01 00:00:00").cast("timestamp")
      Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
          col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_shipdate") > cut),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    })

  /** TPC-H Q18-shaped large-volume customers: a HAVING-gated aggregate
    * (orders whose total quantity clears a threshold) DRIVES the join —
    * the big lineitem rollup happens first and only its few survivors
    * join back to orders and customer. At scale this ordering is the
    * whole point: aggregate-then-join moves a corpus-sized join down to
    * an output-sized one, and AQE broadcasts the tiny survivor set.
    */
  val largeVolumeCustomers = QueryDef(
    "q_large_volume_customers",
    """SELECT c_name, o_orderkey,
      |       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
      |       CAST(sum_qty AS DOUBLE) AS sum_qty
      |FROM (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300) big
      |JOIN orders   ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(dec)).as("sum_qty"))
      .filter(col("sum_qty") > 300)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("o_orderkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10))

  /** Top-k with deterministic tiebreak: TakeOrderedAndProject — each
    * partition keeps its local top 10, driver merges; no global sort.
    */
  val topkOrders = QueryDef(
    "q_topk_orders",
    """SELECT o_orderkey, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)(
    (s, d) => Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10))

  /** EXISTS as left-semi join (no row multiplication, build side hashed once). */
  val semiJoin = QueryDef(
    "q_semi_join_customers",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin)(
    (s, d) => Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"))

  /** NOT EXISTS as left-anti join (customers with no high-value order —
    * predicate chosen to be selective-but-nonempty on the testdata).
    */
  val antiJoin = QueryDef(
    "q_anti_join_customers",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin)(
    (s, d) => Tables.customer(s, d)
      .join(
        Tables.orders(s, d).filter(col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"))

  /** DISTINCT → partial-distinct aggregate (map-side dedup before shuffle). */
  val distinctSegments = QueryDef(
    "q_distinct_segments",
    """SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment""")(
    (s, d) => Tables.customer(s, d)
      .select("c_mktsegment").distinct().orderBy("c_mktsegment"))

  /** ROLLUP grouping sets. NULLS FIRST pinned explicitly on both sides
    * (Spark defaults nulls-first ascending; DuckDB defaults nulls-last).
    */
  val rollupPricing = QueryDef(
    "q_rollup_pricing",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** Ranked window: top-3 orders per customer. One hash-partition by
    * customer + in-partition sort; rank filter applied before any further
    * shuffle, so only k rows per key survive.
    */
  val windowRank = QueryDef(
    "q_window_top3_per_customer",
    """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders)
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)(
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    })

  /** Join fact-to-dimension with pre-aggregation BEFORE the join: aggregate
    * lineitem per partkey first, then broadcast-join part — at scale this
    * cuts the join input by the dedup factor of the key.
    */
  val partRevenue = QueryDef(
    "q_part_revenue_preagg",
    """SELECT p_brand,
      |       CAST(SUM(rev) AS DOUBLE) AS brand_revenue,
      |       CAST(SUM(n) AS BIGINT) AS n_lines
      |FROM (SELECT l_partkey,
      |             SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev,
      |             count(*) AS n
      |      FROM lineitem GROUP BY l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin)(
    (s, d) => {
      val preagg = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(
          sum(col("l_extendedprice").cast(dec) * (lit(1) - col("l_discount").cast(dec))).as("rev"),
          count(lit(1)).as("n"))
      // part scales with the data — let AQE pick the join strategy rather
      // than forcing a broadcast that OOMs at the 100 TB design point.
      preagg
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(sum(col("rev")).cast("double").as("brand_revenue"),
          sum(col("n")).cast("long").as("n_lines"))
        .orderBy("p_brand")
    })

  /** CUBE grouping sets — all 4 aggregation levels in one pass (Expand
    * feeds a single hash aggregate; one scan regardless of level count).
    */
  val cubePricing = QueryDef(
    "q_cube_pricing",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** GROUPING SETS — the third grouping-shape sibling (ROLLUP/CUBE
    * above): two independent margin reports (per-flag, per-status) plus
    * the grand total from ONE scan and ONE expand+aggregate, instead of
    * three scans unioned. Same Expand-based plan Spark gives ROLLUP;
    * at 100 TB the expand factor is the set count (3 here), all
    * map-side-combined before the single exchange.
    */
  val groupingSetsPricing = QueryDef(
    "q_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)(
    (s, d) => Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(dec)).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  val all: Seq[QueryDef] = Seq(
    pricingSummary, revenueByNation, shippingPriority, largeVolumeCustomers, topkOrders,
    semiJoin, antiJoin, distinctSegments, rollupPricing, cubePricing, groupingSetsPricing,
    windowRank, partRevenue)
}
