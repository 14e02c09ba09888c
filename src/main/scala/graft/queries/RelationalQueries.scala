package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Sql.D

/** Relational surface over the TPC-H-ish tables: scan+filter+project
  * (pushdown-checked in PlanSpec), hash aggregation with partial
  * (map-side) combine, broadcast + shuffle joins, semi/anti joins, window
  * functions, rollup, set ops, distinct, top-k.
  *
  * Scale notes (100 TB design): dimension sides (region/nation/supplier,
  * filtered customer) are broadcast explicitly so only the fact tables
  * shuffle; top-k uses orderBy+limit (TakeOrderedAndProject — never a full
  * sort); aggregates are all algebraic so partial aggregation runs
  * map-side before the exchange.
  */
object RelationalQueries {

  /** money double (2 dp) → exact integer cents. */
  private def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")
  /** price×(1−discount) products carry 4 dp → basis points. */
  private def bps(c: Column): Column = floor(c * 10000 + 0.5).cast("long")

  private val ship2000 = Timestamp.valueOf("2000-01-01 00:00:00")

  // --- q1: pricing summary (TPC-H Q1 shape) -------------------------
  private def q1(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .where(col("l_shipdate") < lit(ship2000))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        (sum(cents(col("l_extendedprice"))) / 100.0).as("sum_base_price"),
        (sum(bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 10000.0)
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val q1Oracle = s"""WITH a AS (
  SELECT l_returnflag, l_linestatus,
    SUM(l_quantity) AS sum_qty,
    ${Sql.sumCents("l_extendedprice")} AS sum_base_price,
    ${Sql.sumBps(s"l_extendedprice * (${D("1")} - l_discount)")} AS sum_disc_price,
    COUNT(*) AS count_order
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '2000-01-01'
  GROUP BY l_returnflag, l_linestatus
)
SELECT *, sum_qty / CAST(count_order AS DOUBLE) AS avg_qty
FROM a ORDER BY l_returnflag, l_linestatus"""

  // --- q3: top revenue orders for a segment (TPC-H Q3 shape) --------
  private def q3(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = Tables(s, dir, "orders")
      .where(col("o_orderdate") < lit(Timestamp.valueOf("1999-01-01 00:00:00")))
    val l = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 10000.0)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Oracle = s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
  ${Sql.sumBps(s"l_extendedprice * (${D("1")} - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-01-01'
  AND l_shipdate >= TIMESTAMP '1996-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // --- q5: revenue by nation within a region (TPC-H Q5 shape) -------
  private def q5(s: SparkSession, dir: String): DataFrame = {
    val r = Tables(s, dir, "region").where(col("r_name") === "ASIA")
    val n = Tables(s, dir, "nation")
    val sup = Tables(s, dir, "supplier")
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    val l = Tables(s, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 10000.0)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val q5Oracle = s"""SELECT n_name,
  ${Sql.sumBps(s"l_extendedprice * (${D("1")} - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name"""

  // --- semi / anti joins --------------------------------------------
  private def qSemi(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers_with_orders"))
      .orderBy("c_nationkey")

  private val qSemiOracle = """SELECT c_nationkey, COUNT(*) AS n_customers_with_orders
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_nationkey ORDER BY c_nationkey"""

  private def qAnti(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .join(Tables(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

  private val qAntiOracle = """SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey"""

  // --- full outer join ----------------------------------------------
  /** FULL OUTER completes the join-type matrix (inner/broadcast/left in
    * the ETL path, semi/anti above): high-balance customers vs the
    * per-customer order rollup — unmatched rows survive on BOTH sides
    * (low-balance customers' orders, order-less rich customers).
    */
  private def qFullOuter(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").where(col("c_acctbal") > 5000)
      .select(col("c_custkey"))
    val o = Tables(s, dir, "orders").groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("c_custkey").isNull, 0).otherwise(1).as("has_cust"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  private val qFullOuterOracle = """WITH c AS (
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000
), o AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1
)
SELECT COALESCE(c_custkey, o_custkey) AS custkey,
  CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS has_cust,
  COALESCE(n_orders, 0) AS n_orders
FROM c FULL OUTER JOIN o ON c_custkey = o_custkey
ORDER BY custkey"""

  // --- SQL entry point (correlated subquery) -------------------------
  /** The `spark.sql` front door: the same Catalyst plans come out of
    * SQL text as out of the DataFrame API — here a correlated EXISTS,
    * which Catalyst rewrites to the semi-join the operators above build
    * explicitly.
    */
  private def qSqlExists(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("v_customer")
    Tables(s, dir, "orders").createOrReplaceTempView("v_orders")
    s.sql("""SELECT c_nationkey, COUNT(*) AS n_with_big_order
      FROM v_customer
      WHERE EXISTS (SELECT 1 FROM v_orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  private val qSqlExistsOracle = """SELECT c_nationkey, COUNT(*) AS n_with_big_order
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 200000)
GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** LATERAL correlated subquery — per-nation top-2 customers by
    * balance, the "top-N per outer row" shape LATERAL expresses
    * directly. Catalyst rewrites the lateral into a ranked window under
    * DomainJoin, so the physical plan is one shuffle on the correlation
    * key — identical cost to the hand-written `q_window_rank`, which is
    * the point: the SQL front door loses nothing.
    */
  private def qLateralTopn(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "nation").createOrReplaceTempView("vlat_nation")
    Tables(s, dir, "customer").createOrReplaceTempView("vlat_customer")
    s.sql("""SELECT n.n_name, t.c_name, t.c_acctbal
      FROM vlat_nation n,
      LATERAL (SELECT c_name, c_acctbal FROM vlat_customer c
               WHERE c.c_nationkey = n.n_nationkey
               ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""")
  }

  private val qLateralTopnOracle = """SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_name"""

  /** Recursive CTE (Spark 4's WITH RECURSIVE) — a synthetic
    * bill-of-materials walk: part p "contains" parts 2p and 2p+1 when
    * they exist, so roots 1..3 each expand a binary assembly tree to
    * depth 4; the query rolls up per-root part counts and exact-cents
    * assembly cost. Recursion in Spark executes as an iterative
    * union-loop over the step relation (the same level-synchronous
    * shape as [[graft.operators.Graphs.bfsHops]]); the per-level join
    * is on p_partkey, so each level is one bounded shuffle/broadcast.
    */
  private def qRecursiveBom(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "part").createOrReplaceTempView("vrec_part")
    s.sql("""WITH RECURSIVE bom AS (
        SELECT p_partkey AS root, p_partkey AS pk, 0 AS depth,
               p_retailprice FROM vrec_part WHERE p_partkey BETWEEN 1 AND 3
        UNION ALL
        SELECT b.root, p.p_partkey, b.depth + 1, p.p_retailprice
        FROM bom b JOIN vrec_part p
          ON p.p_partkey IN (b.pk * 2, b.pk * 2 + 1)
        WHERE b.depth < 4)
      SELECT root, COUNT(*) AS n_parts, MAX(depth) AS max_depth,
        CAST(SUM(CAST(FLOOR(p_retailprice * 100 + 0.5D) AS BIGINT)) AS BIGINT)
          / CAST(100 AS DOUBLE) AS assembly_cost
      FROM bom GROUP BY root ORDER BY root""")
  }

  private val qRecursiveBomOracle = s"""WITH RECURSIVE bom AS (
  SELECT p_partkey AS root, p_partkey AS pk, 0 AS depth, p_retailprice
  FROM part WHERE p_partkey BETWEEN 1 AND 3
  UNION ALL
  SELECT b.root, p.p_partkey, b.depth + 1, p.p_retailprice
  FROM bom b JOIN part p ON p.p_partkey IN (b.pk * 2, b.pk * 2 + 1)
  WHERE b.depth < 4)
SELECT root, COUNT(*) AS n_parts, MAX(depth) AS max_depth,
  ${Sql.sumCents("p_retailprice")} AS assembly_cost
FROM bom GROUP BY root ORDER BY root"""

  // --- window functions ---------------------------------------------
  private def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables(s, dir, "customer")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
      .orderBy("c_nationkey", "rn")
  }

  private val qWindowRankOracle = """SELECT c_nationkey, rn, c_custkey, c_acctbal
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS INT) AS rn
  FROM customer)
WHERE rn <= 3 ORDER BY c_nationkey, rn"""

  /** The same top-3-per-nation result as [[qWindowRank]] via the bounded
    * [[graft.functions.TopKPairs]] aggregate instead of a row_number
    * window — graded against the IDENTICAL oracle. The scale story: the
    * window plan funnels every customer into one task per nation (25
    * tasks at any data size — a low-cardinality partition key is the
    * window's hidden scale cliff), while the aggregate's map-side
    * partials keep ≤3 rows per nation per partition, so the shuffle
    * carries O(partitions × 3) rows and no task ever sorts a whole
    * nation. Ordering (acctbal DESC, custkey ASC) is the window's
    * exactly.
    */
  private def qGroupTopN(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(graft.functions.TopKPairs.topK(3)(
        col("c_acctbal"), col("c_custkey")).as("top"))
      .select(col("c_nationkey"), posexplode(col("top")).as(Seq("p", "x")))
      .select(col("c_nationkey"), (col("p") + 1).cast("int").as("rn"),
        col("x._2").as("c_custkey"), col("x._1").as("c_acctbal"))
      .orderBy("c_nationkey", "rn")

  // --- ratio-to-report: percent-of-total window ---------------------
  /** Each nation's share of total revenue: SUM() OVER () on the
    * POST-AGGREGATE rows (one per nation) — the empty-partition window
    * is fine there because the fact-scale work already collapsed in the
    * partial-combined groupBy; the share division runs on two exact
    * BIGINT sums.
    */
  private def qRatioToReport(s: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    Tables(s, dir, "customer")
      .join(broadcast(Tables(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("c_acctbal"))).as("bal_c"))
      .withColumn("share",
        col("bal_c").cast("double") / sum(col("bal_c")).over(wAll).cast("double"))
      .select(col("n_name"), (col("bal_c") / 100.0).as("balance"), col("share"))
      .orderBy("n_name")
  }

  private val qRatioOracle = s"""WITH a AS (
  SELECT n_name,
    CAST(SUM(CAST(FLOOR(c_acctbal * ${D("100")} + ${D("0.5")}) AS BIGINT)) AS BIGINT) AS bal_c
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1
)
SELECT n_name, CAST(bal_c AS BIGINT) / ${D("100")} AS balance,
  CAST(bal_c AS DOUBLE) / CAST(SUM(bal_c) OVER () AS DOUBLE) AS share
FROM a ORDER BY n_name"""

  // --- q7: volume shipping between two nations (TPC-H Q7 shape) -----
  /** Six-way join with two roles for the same dimension (supplier's
    * nation vs customer's nation) and a disjunctive pair filter — the
    * join-order/broadcast-mix workout: both nation role copies
    * broadcast, supplier broadcasts, and only lineitem/orders/customer
    * shuffle on their keys.
    */
  private def q7(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val l = Tables(s, dir, "lineitem").where(
      col("l_shipdate") >= lit(Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(Timestamp.valueOf("1998-01-01 00:00:00")))
    l.join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .where((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 10000.0)
        .as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val q7Oracle = s"""SELECT
  n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  ${Sql.sumBps(s"l_extendedprice * (${D("1")} - l_discount)")} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
ORDER BY supp_nation, cust_nation, l_year"""

  private def qWindowRunning(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (sum(cents(col("o_totalprice"))).over(w) / 100.0).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowRunningOracle = s"""SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(FLOOR(o_totalprice * ${D("100")} + ${D("0.5")}) AS BIGINT)) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) / ${D("100")} AS running_spend
FROM orders ORDER BY o_custkey, o_orderkey"""

  private def qWindowLag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        datediff(to_date(col("o_orderdate")),
          to_date(lag(col("o_orderdate"), 1).over(w))).as("days_since_prev"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowLagOracle = """SELECT o_custkey, o_orderkey,
  CAST(date_diff('day',
    CAST(LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
    CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Distribution window functions (ntile / percent_rank / cume_dist)
    * per customer over order value. The ordering is made total with the
    * orderkey tie-break so percent_rank and cume_dist are exact
    * fractions — (rank−1)/(n−1) and rank/n in both engines, no
    * tie-group ambiguity.
    */
  private def qWindowDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qWindowDistOracle = """SELECT o_custkey, o_orderkey,
  CAST(NTILE(4) OVER w AS INT) AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
ORDER BY o_custkey, o_orderkey"""

  // --- distinct / top-k / set ops / rollup --------------------------
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_suppliers"),
      count(lit(1)).as("n_rows"))

  private val qDistinctOracle = """SELECT COUNT(DISTINCT l_partkey) AS n_parts,
  COUNT(DISTINCT l_suppkey) AS n_suppliers, COUNT(*) AS n_rows FROM lineitem"""

  private def qTopK(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  private val qTopKOracle = """SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""

  private def qSetOps(s: SparkSession, dir: String): DataFrame = {
    val cn = Tables(s, dir, "customer")
      .select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables(s, dir, "supplier")
      .select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("op", lit("both"))
      .unionByName(cn.except(sn).withColumn("op", lit("customer_only")))
      .unionByName(sn.except(cn).withColumn("op", lit("supplier_only")))
      .select(col("op"), col("nationkey"))
      .orderBy("op", "nationkey")
  }

  private val qSetOpsOracle = """SELECT 'both' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'customer_only' AS op, nationkey FROM (
  SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'supplier_only' AS op, nationkey FROM (
  SELECT s_nationkey AS nationkey FROM supplier EXCEPT SELECT c_nationkey FROM customer)
ORDER BY op, nationkey"""

  private def qRollup(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        (sum(cents(col("c_acctbal"))) / 100.0).as("acctbal_sum"),
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("c_nationkey")).cast("int").as("g_nat"))
      .orderBy(col("g_seg"), col("g_nat"),
        col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)

  private val qRollupOracle = s"""SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
  ${Sql.sumCents("c_acctbal")} AS acctbal_sum,
  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
  CAST(GROUPING(c_nationkey) AS INT) AS g_nat
FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST"""

  // --- q17: small-quantity-order revenue (TPC-H Q17 shape) ----------
  /** Correlated SCALAR subquery — the decorrelation workout beside
    * q_sql_exists's EXISTS: Catalyst rewrites the per-part avg into one
    * aggregate-then-join (never a per-row re-execution), i.e. the
    * lineitem side is scanned twice but shuffled on l_partkey both
    * times, no nested loop. Money is exact-cents integer arithmetic;
    * the avg comparison is safe double math (quantity sums are
    * integers < 2^53, so the sum — hence the avg — is exact in any
    * accumulation order).
    */
  private def q17(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v17_lineitem")
    Tables(s, dir, "part").createOrReplaceTempView("v17_part")
    s.sql("""SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5D) AS BIGINT)) AS DOUBLE) / 100 / 7 AS avg_yearly
      FROM v17_lineitem JOIN v17_part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'
        AND l_quantity < (SELECT 0.2D * AVG(l2.l_quantity)
                          FROM v17_lineitem l2 WHERE l2.l_partkey = p_partkey)""")
  }

  private val q17Oracle =
    s"""SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + ${D("0.5")}) AS BIGINT)) AS DOUBLE) / 100 / 7 AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < (SELECT ${D("0.2")} * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""

  // --- q18: large-volume orders (TPC-H Q18 shape, HAVING) -----------
  /** Post-aggregation HAVING: the `where` ABOVE the agg survives as a
    * Filter over the final HashAggregate (it cannot push below it).
    * The HAVING shrinks lineitem to the rare qualifying orders first,
    * so the two joins after it probe with a tiny side — AQE broadcasts
    * it at runtime; the big tables are never joined to each other raw.
    */
  private def q18(s: SparkSession, dir: String): DataFrame = {
    val big = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty")) // integral doubles: exact
      .where(col("sum_qty") > 300) // HAVING
    big.join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val q18Oracle = """WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS sum_qty FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  // --- q12: shipping priority split (TPC-H Q12 shape) ----------------
  /** Conditional-count aggregation after a fact-fact join: the CASE
    * sums fold into ONE map-side-combinable aggregate pass (never two
    * filtered scans); only the two join keys + the grouped/conditional
    * columns survive pruning into the shuffles.
    */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(Timestamp.valueOf("1998-01-01 00:00:00")))
    l.join(Tables(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")
  }

  private val q12Oracle = """SELECT l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --- q14: promotion revenue ratio (TPC-H Q14 shape) ----------------
  /** Ratio of two conditional sums in one aggregate pass; the part
    * dimension broadcasts; money stays exact basis points until the
    * single final double division.
    */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit(Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(Timestamp.valueOf("1997-07-01 00:00:00")))
    val disc = bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    l.join(broadcast(Tables(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", disc).otherwise(0L)).as("_promo"),
        sum(disc).as("_all"))
      .select((lit(100.0) * (col("_promo").cast("double") / col("_all").cast("double")))
        .as("promo_revenue_pct"))
  }

  private val q14Oracle: String = {
    val disc = s"CAST(FLOOR(l_extendedprice * (${D("1")} - l_discount) * 10000 + ${D("0.5")}) AS BIGINT)"
    s"""SELECT ${D("100")} * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $disc ELSE 0 END) AS DOUBLE)
  / CAST(SUM($disc) AS DOUBLE)) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-07-01'"""
  }

  // --- q22: dormant rich customers (TPC-H Q22 shape) -----------------
  /** Uncorrelated scalar subquery (exact-cents average so the boundary
    * comparison is bit-stable in any engine) + anti-join NOT EXISTS,
    * through the `spark.sql` front door: above-average-balance
    * customers with no urgent order, rolled up per nation. Catalyst
    * plans the scalar subquery once (a broadcast 1-row value) and the
    * NOT EXISTS as a left-anti join on the filtered orders.
    */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("v22_customer")
    Tables(s, dir, "orders").createOrReplaceTempView("v22_orders")
    s.sql("""SELECT c_nationkey,
        COUNT(*) AS n_cust,
        CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5D) AS BIGINT)) AS BIGINT) AS sum_bal_cents
      FROM v22_customer c
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5D) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*)
                         FROM v22_customer WHERE c_acctbal > 0.0D)
        AND NOT EXISTS (SELECT 1 FROM v22_orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  private val q22Oracle =
    s"""SELECT c_nationkey, COUNT(*) AS n_cust,
  CAST(SUM(CAST(FLOOR(c_acctbal * 100 + ${D("0.5")}) AS BIGINT)) AS BIGINT) AS sum_bal_cents
FROM customer c
WHERE c_acctbal > (SELECT CAST(SUM(CAST(FLOOR(c_acctbal * 100 + ${D("0.5")}) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*)
                   FROM customer WHERE c_acctbal > ${D("0")})
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey ORDER BY c_nationkey"""

  // --- q11: value concentration (TPC-H Q11 shape) --------------------
  /** HAVING against an uncorrelated scalar aggregate over the same
    * fact table: parts whose revenue exceeds 0.1% of TOTAL revenue.
    * Catalyst evaluates the scalar subquery once (its own partial-
    * combined aggregate) and the HAVING stays above the per-part
    * final aggregate. The 0.1% boundary is exact integer math
    * (`sum·1000 > total`), so no engine can round a part across it.
    */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v11_lineitem")
    s.sql("""WITH r AS (
        SELECT l_partkey,
          SUM(CAST(FLOOR(l_extendedprice * (1.0D - l_discount) * 10000 + 0.5D) AS BIGINT)) AS rev_bps
        FROM v11_lineitem GROUP BY l_partkey)
      SELECT l_partkey, CAST(rev_bps AS DOUBLE) / 10000 AS revenue
      FROM r
      WHERE rev_bps * 1000 > (SELECT SUM(rev_bps) FROM r)
      ORDER BY rev_bps DESC, l_partkey""")
  }

  private val q11Oracle =
    s"""WITH r AS (
  SELECT l_partkey,
    SUM(CAST(FLOOR(l_extendedprice * (${D("1")} - l_discount) * 10000 + ${D("0.5")}) AS BIGINT)) AS rev_bps
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, CAST(rev_bps AS DOUBLE) / 10000 AS revenue
FROM r
WHERE rev_bps * 1000 > (SELECT SUM(rev_bps) FROM r)
ORDER BY rev_bps DESC, l_partkey"""

  // --- q13: customer order-count distribution (TPC-H Q13 shape) ------
  /** LEFT OUTER join with the filter in the JOIN CONDITION (the Q13
    * trap: a WHERE on the right side would silently turn the join
    * inner and drop zero-order customers), then a two-level aggregate
    * — per-customer count, then the histogram over counts. The first
    * agg shuffles on c_custkey; the histogram's key space is tiny
    * (≤ max orders per customer) so the second exchange is a few dozen
    * rows per partition after partial combine.
    */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT") // join-side filter
    Tables(s, dir, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // COUNT(col): nulls excluded
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Oracle = """SELECT c_count, COUNT(*) AS custdist FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""

  // --- q15: top supplier by quarterly revenue (TPC-H Q15 shape) ------
  /** Derived aggregate view consumed twice — once for the MAX scalar
    * subquery, once as the join probe. Catalyst plans the scalar MAX
    * as a separate 1-row subquery result (no per-row re-execution);
    * revenue is exact basis points so the `= MAX` boundary can never
    * be split by float accumulation order across engines.
    */
  private def q15(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v15_lineitem")
    Tables(s, dir, "supplier").createOrReplaceTempView("v15_supplier")
    s.sql("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          SUM(CAST(FLOOR(l_extendedprice * (1.0D - l_discount) * 10000 + 0.5D) AS BIGINT)) AS total_rev_bps
        FROM v15_lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name,
        CAST(total_rev_bps AS DOUBLE) / 10000 AS total_revenue
      FROM v15_supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_rev_bps = (SELECT MAX(total_rev_bps) FROM revenue)
      ORDER BY s_suppkey""")
  }

  private val q15Oracle =
    s"""WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(FLOOR(l_extendedprice * (${D("1")} - l_discount) * 10000 + ${D("0.5")}) AS BIGINT)) AS total_rev_bps
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(total_rev_bps AS DOUBLE) / 10000 AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev_bps = (SELECT MAX(total_rev_bps) FROM revenue)
ORDER BY s_suppkey"""

  // --- q16: supplier count by part attributes (TPC-H Q16 shape) ------
  /** NOT IN subquery (null-aware anti join — s_suppkey is non-null so
    * Catalyst plans a plain LeftAnti, the fast path) over a
    * COUNT(DISTINCT) aggregate. The distinct expands (brand,type,size,
    * suppkey) before the final count; the excluded-supplier set is a
    * handful of rows and broadcasts.
    */
  private def q16(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v16_lineitem")
    Tables(s, dir, "part").createOrReplaceTempView("v16_part")
    Tables(s, dir, "supplier").createOrReplaceTempView("v16_supplier")
    s.sql("""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM v16_lineitem JOIN v16_part ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5'
        AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM v16_supplier WHERE s_acctbal < 0.0D)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
  }

  private val q16Oracle =
    s"""SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < ${D("0")})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  // --- q19: disjunctive-predicate revenue (TPC-H Q19 shape) ----------
  /** OR-of-conjunctions mixing columns from BOTH join sides: the
    * optimizer workout is that each side's disjunction
    * (p_brand/p_size on part, l_quantity on lineitem) must be derived
    * and pushed below the join while the cross-side residual stays
    * above — Catalyst's CNF conversion does exactly that, so neither
    * scan reads rows no branch could match.
    */
  private def q19(s: SparkSession, dir: String): DataFrame = {
    val branch = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    Tables(s, dir, "lineitem")
      .join(broadcast(Tables(s, dir, "part")), col("p_partkey") === col("l_partkey"))
      .where(branch("Brand#12", 5, 1, 11) ||
        branch("Brand#23", 10, 10, 20) ||
        branch("Brand#11", 15, 20, 30))
      .agg((sum(bps(col("l_extendedprice") * (lit(1.0) - col("l_discount")))) / 10000.0)
        .as("revenue"))
  }

  private val q19Oracle =
    s"""SELECT ${Sql.sumBps(s"l_extendedprice * (${D("1")} - l_discount)")} AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""

  // --- q20: heavy suppliers of a part family (TPC-H Q20 shape) -------
  /** Nested IN subqueries with a HAVING inside the inner one: the
    * inner part-name IN collapses to a semi join on p_partkey, the
    * grouped HAVING shrinks lineitem to qualifying suppliers, and the
    * outer IN becomes a semi join probing supplier with that tiny
    * set. Nothing here ever materializes the full lineitem×part
    * product — each IN is one shuffle on its key.
    */
  private def q20(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("v20_lineitem")
    Tables(s, dir, "part").createOrReplaceTempView("v20_part")
    Tables(s, dir, "supplier").createOrReplaceTempView("v20_supplier")
    s.sql("""SELECT s_suppkey, s_name FROM v20_supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM v20_lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM v20_part WHERE p_name LIKE '%red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 400.0D)
      ORDER BY s_suppkey""")
  }

  private val q20Oracle =
    s"""SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > ${D("400")})
ORDER BY s_suppkey"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_lateral_topn", qLateralTopn, Some(qLateralTopnOracle)),
    QueryDef("q_recursive_bom", qRecursiveBom, Some(qRecursiveBomOracle)),
    QueryDef("q11_value_concentration", q11, Some(q11Oracle)),
    QueryDef("q13_order_histogram", q13, Some(q13Oracle)),
    QueryDef("q15_top_supplier", q15, Some(q15Oracle)),
    QueryDef("q16_supplier_count", q16, Some(q16Oracle)),
    QueryDef("q19_disjunctive", q19, Some(q19Oracle)),
    QueryDef("q20_nested_in", q20, Some(q20Oracle)),
    QueryDef("q1_pricing_summary", q1, Some(q1Oracle)),
    QueryDef("q12_priority_split", q12, Some(q12Oracle)),
    QueryDef("q14_promo_ratio", q14, Some(q14Oracle)),
    QueryDef("q17_small_quantity", q17, Some(q17Oracle)),
    QueryDef("q18_large_orders", q18, Some(q18Oracle)),
    QueryDef("q22_dormant_rich", q22, Some(q22Oracle)),
    QueryDef("q3_top_orders", q3, Some(q3Oracle)),
    QueryDef("q5_nation_revenue", q5, Some(q5Oracle)),
    QueryDef("q_semi_join", qSemi, Some(qSemiOracle)),
    QueryDef("q_anti_join", qAnti, Some(qAntiOracle)),
    QueryDef("q_full_outer", qFullOuter, Some(qFullOuterOracle)),
    QueryDef("q_sql_exists", qSqlExists, Some(qSqlExistsOracle)),
    QueryDef("q_window_rank", qWindowRank, Some(qWindowRankOracle)),
    QueryDef("q_group_topn", qGroupTopN, Some(qWindowRankOracle)),
    QueryDef("q7_volume_shipping", q7, Some(q7Oracle)),
    QueryDef("q_window_running", qWindowRunning, Some(qWindowRunningOracle)),
    QueryDef("q_window_lag", qWindowLag, Some(qWindowLagOracle)),
    QueryDef("q_window_dist", qWindowDist, Some(qWindowDistOracle)),
    QueryDef("q_distinct_agg", qDistinct, Some(qDistinctOracle)),
    QueryDef("q_topk", qTopK, Some(qTopKOracle)),
    QueryDef("q_setops", qSetOps, Some(qSetOpsOracle)),
    QueryDef("q_rollup", qRollup, Some(qRollupOracle)),
    QueryDef("q_ratio_to_report", qRatioToReport, Some(qRatioOracle)))
}
