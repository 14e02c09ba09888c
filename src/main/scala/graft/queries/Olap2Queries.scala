package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Transform
import Sql.D

/** Second OLAP wave: pivot, cube, exact interpolated quantiles. */
object Olap2Queries {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Pivot: per user-bucket event-type count matrix. Pivot values are
    * pinned (never inferred) — at scale an inferred pivot is an extra
    * distinct scan AND a nondeterministic column set.
    */
  private def pivot(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("user_bucket")

  private val pivotOracle: String = {
    val cases = EventTypes.map(t =>
      s"""CAST(COUNT(*) FILTER (event_type = '$t') AS BIGINT) AS "$t"""")
    s"""SELECT user_id % 10 AS user_bucket, ${cases.mkString(", ")}
FROM events GROUP BY 1 ORDER BY user_bucket"""
  }

  private def cube(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val cubeOracle = """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  SUM(l_quantity) AS sum_qty,
  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""

  /** Exact interpolated quantiles ((n−1)·p definition in both engines),
    * rounded to 2 dp to absorb any last-ulp interpolation difference.
    */
  private def quantiles(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        Transform.round2(expr("percentile(o_totalprice, 0.5)")).as("p50"),
        Transform.round2(expr("percentile(o_totalprice, 0.9)")).as("p90"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy("o_orderpriority")

  private val quantilesOracle = s"""SELECT o_orderpriority,
  ${Sql.round2("quantile_cont(o_totalprice, 0.5)")} AS p50,
  ${Sql.round2("quantile_cont(o_totalprice, 0.9)")} AS p90,
  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_pivot", pivot, Some(pivotOracle)),
    QueryDef("q_cube", cube, Some(cubeOracle)),
    QueryDef("q_quantiles", quantiles, Some(quantilesOracle)))
}
