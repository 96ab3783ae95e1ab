package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Core relational query surface (SURVEY.md §2, q1–q10).
  *
  * Conventions shared with the DuckDB oracle (SURVEY.md §5):
  *  - every floating aggregate is `round(..., 2|4)` so accumulation
  *    order can never flip the hash;
  *  - every result carries a total deterministic ORDER BY;
  *  - column aliases match the oracle SQL exactly.
  *
  * Scale notes are per-query; dims (region/nation/customer/supplier/
  * part) are broadcast explicitly — at 100 TB the fact side never
  * shuffles for a dim join.
  */
object Core {

  /** q1: pricing summary — single hash-shuffle grouped agg with
    * map-side partial aggregation (HashAggregate x2 in the plan). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        // explicit sum/count (not avg()): the sum of integral doubles
        // is exact and order-independent, so both engines divide the
        // same bits — engine-internal avg() streaming accumulation
        // order would not be guaranteed to match
        round(sum("l_quantity") / count(lit(1)), 4).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2: revenue per nation in ASIA — fact scans once; all four dims
    * broadcast (no fact shuffle before the final small agg). */
  def q2Join(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** q3: top-10 orders by revenue — agg then TakeOrderedAndProject
    * (partial top-k per partition, no full sort at scale). */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_orderkey")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** q4: top-3 orders per customer by totalprice — one shuffle on
    * o_custkey, rank inside the window, early filter. */
  def q4Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "rn")
  }

  /** q5: TPC-H q6-style selective scan — filter + 2-column projection
    * must reach the parquet reader (PushedFilters + pruned ReadSchema). */
  def q5FilterProject(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
        && col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** q6: customers with no orders — left-anti join (broadcast the
    * distinct key set when it fits; Catalyst picks BroadcastHashJoin). */
  def q6AntiSemi(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    // Restrict the right side to one order year: "customers with no
    // orders in 1997". The unrestricted variant is degenerate on
    // TPC-H-shaped data (nearly every customer has orders → empty
    // result at small SFs, making the oracle hash-match vacuous).
    // The date range is a pushed-down scan filter on the right side.
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q7: distinct aggregation — expand+two-phase agg; the lib also
    * exposes approx_count_distinct for the 100 TB path. */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** q8: rollup region→nation over customer balances. */
  def q8Rollup(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    // Temp-view round-trip: DetectAmbiguousSelfJoin misfires on the
    // Expand node rollup generates when the input carries join
    // dataset-id metadata; a view strips that metadata.
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "n_name", "c_acctbal")
      .createOrReplaceTempView("g8_base")
    spark.sql(
      """SELECT r_name, n_name,
         round(sum(c_acctbal),2) AS total_bal, count(*) AS n_cust
         FROM g8_base GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
  }

  /** q9: conditional aggregation — all branches in one scan. */
  def q9CaseWhen(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(0.0)), 2).as("f_total"),
        count(when(col("o_totalprice") > 100000.0, lit(1))).as("big_cnt"),
        count(lit(1)).as("n_rows"))
      .orderBy("o_orderpriority")
  }

  /** q10: parts priced above their brand average — decorrelated as
    * agg + broadcast join-back (the brand agg is tiny). */
  def q10Correlated(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    // exact-cents mean (see e3): the comparison below must see
    // bit-identical b_avg on every engine, or a part priced exactly
    // at its brand mean could flip in/out of the result
    val brandAvg = p.groupBy(col("p_brand").as("b_brand"))
      .agg((sum(round(col("p_retailprice") * 100).cast("long"))
        / (count(lit(1)) * 100.0)).as("b_avg"))
    p.join(broadcast(brandAvg), col("p_brand") === col("b_brand"))
      .filter(col("p_retailprice") > col("b_avg"))
      .select("p_partkey", "p_brand", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** q11: cube over (priority, status) — all grouping-set combos in
    * one Expand + single shuffle. */
  def q11Cube(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView("g11_base")
    // temp-view route for the same DetectAmbiguousSelfJoin quirk as q8
    spark.sql(
      """SELECT o_orderpriority, o_orderstatus,
         round(sum(o_totalprice),2) AS total, count(*) AS n
         FROM g11_base GROUP BY CUBE(o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""")
  }

  /** q14: explicit GROUPING SETS — the third grouping-set form next
    * to q8's ROLLUP and q11's CUBE: a hand-picked set list ((status,
    * priority), (status), ()) in one Expand + single shuffle. Money
    * sums as exact integer cents (the invariant), GROUPING() ids
    * disambiguate genuine NULLs from subtotal rows. */
  def q14GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select("o_orderpriority", "o_orderstatus", "o_totalprice")
      .createOrReplaceTempView("g14_base")
    spark.sql(
      """SELECT o_orderstatus, o_orderpriority,
         CAST(grouping(o_orderstatus) AS INT) AS g_status,
         CAST(grouping(o_orderpriority) AS INT) AS g_prio,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents,
         count(*) AS n
         FROM g14_base
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         ORDER BY g_status ASC, g_prio ASC,
           o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
  }

  /** q12: frame windows — per customer, running total and 3-order
    * moving average over order history (rowsBetween frames; one
    * shuffle on the key shared by both windows). */
  /** q15: RANGE-framed time window — trailing-30-day spend per
    * customer, the time-windowed aggregation ROWS frames cannot
    * express (a RANGE frame admits every order whose DAY falls in
    * the trailing interval, including all same-day peers of the
    * current row — frame membership is by VALUE distance, so no
    * tie-break is needed and none exists). Ordering key is the exact
    * integer day ordinal and the sum is exact integer cents: an
    * all-integer output with zero rounding surface. Per-customer
    * window — bounded per key, the e13 scale posture. */
  def q15RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day"))
      .rangeBetween(-30, 0)
    Tables.orders(spark, dir)
      .withColumn("day",
        datediff(col("o_orderdate"), to_date(lit("1970-01-01"))).cast("long"))
      .select(col("o_custkey"), col("o_orderkey"),
        sum(round(col("o_totalprice") * 100).cast("long")).over(w)
          .as("trail30_cents"),
        count(lit(1)).over(w).as("n_in_window"))
      .orderBy("o_custkey", "o_orderkey")
  }

  def q12MovingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_total"),
        // exact-cents mean over the 3-row frame (engine-stable, see §5)
        (sum(round(col("o_totalprice") * 100).cast("long"))
          .over(w.rowsBetween(-2, 0))
          / (count(lit(1)).over(w.rowsBetween(-2, 0)) * 100.0)).as("moving_avg"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q13: set operations — customers holding BUILDING-segment
    * accounts INTERSECT customers with any filed order, then the
    * EXCEPT complement. Both distinct-set ops plan as aggregates. */
  def q13SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val building = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))
    val withF = o.filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("custkey"))
    building.intersect(withF).withColumn("relation", lit("both"))
      .unionByName(building.except(withF).withColumn("relation", lit("building_only")))
      .orderBy("custkey", "relation")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_grouping_sets" -> (q14GroupingSets _),
    "q13_setops" -> (q13SetOps _),
    "q12_moving_window" -> (q12MovingWindow _),
    "q15_range_window" -> (q15RangeWindow _),
    "q11_cube" -> (q11Cube _),
    "q1_agg" -> (q1Agg _),
    "q2_join" -> (q2Join _),
    "q3_topk" -> (q3TopK _),
    "q4_window" -> (q4Window _),
    "q5_filter_project" -> (q5FilterProject _),
    "q6_antisemi" -> (q6AntiSemi _),
    "q7_distinct" -> (q7Distinct _),
    "q8_rollup" -> (q8Rollup _),
    "q9_casewhen" -> (q9CaseWhen _),
    "q10_correlated" -> (q10Correlated _),
  )

  val oracleSql: Map[String, String] = Map(
    // q14: identical set list; grouping() flags ride along so the
    // hash distinguishes genuine-NULL rows from subtotal rows
    "q14_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INT) AS g_status,
           CAST(grouping(o_orderpriority) AS INT) AS g_prio,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           count(*) AS n
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
         ORDER BY g_status ASC, g_prio ASC,
           o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q13_setops" ->
      """SELECT custkey, relation FROM (
           SELECT custkey, 'both' AS relation FROM (
             SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             INTERSECT
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
           UNION ALL
           SELECT custkey, 'building_only' FROM (
             SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
             EXCEPT
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'))
         ORDER BY custkey, relation""",
    "q12_moving_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS UNBOUNDED PRECEDING), 2) AS running_total,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
           / (count(*) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) * 100.0) AS moving_avg
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q15_range_window" ->
      """SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS trail30_cents,
           CAST(count(*) OVER (PARTITION BY o_custkey
             ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_in_window
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q11_cube" ->
      """SELECT o_orderpriority, o_orderstatus,
         round(sum(o_totalprice),2) AS total, count(*) AS n
         FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
         ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity),2) AS sum_qty,
         round(sum(l_extendedprice),2) AS sum_base,
         round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
         round(sum(l_quantity)/count(*),4) AS avg_qty,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1,2 ORDER BY 1,2""",
    "q2_join" ->
      """SELECT n_name,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY 1 ORDER BY 1""",
    "q3_topk" ->
      """SELECT l_orderkey,
         round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
         FROM lineitem GROUP BY 1
         ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""",
    "q4_window" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q5_filter_project" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q6_antisemi" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
           AND o_orderdate >= TIMESTAMP '1997-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01')
         ORDER BY c_custkey""",
    "q7_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(*) AS n_rows
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q8_rollup" ->
      """SELECT r_name, n_name,
         round(sum(c_acctbal),2) AS total_bal,
         count(*) AS n_cust
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)
         ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""",
    "q9_casewhen" ->
      """SELECT o_orderpriority,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END),2) AS f_total,
         count(CASE WHEN o_totalprice > 100000.0 THEN 1 END) AS big_cnt,
         count(*) AS n_rows
         FROM orders GROUP BY 1 ORDER BY 1""",
    "q10_correlated" ->
      """SELECT p_partkey, p_brand, p_retailprice FROM part p
         JOIN (SELECT p_brand AS b_brand,
                 sum(CAST(round(p_retailprice*100) AS BIGINT)) / (count(*)*100.0) AS b_avg
               FROM part GROUP BY 1) b
           ON p.p_brand = b.b_brand
         WHERE p_retailprice > b_avg
         ORDER BY p_partkey""",
  )
}
