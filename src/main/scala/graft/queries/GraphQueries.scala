package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Graphs

/** Graph analytics over graphs DERIVED from the test tables — a user
  * behavior-transition graph (events) and a market-basket co-order
  * graph (lineitem). Both graded queries are exact-integer (fixed-point
  * PageRank, triangle counts), so DuckDB parity is bit-exact with no
  * float caveats; the PageRank oracle unrolls the iteration as chained
  * CTEs running the identical floor-division update.
  */
object GraphQueries {

  private val kExpr = """"k"\s*:\s*(\d+)"""

  /** [[Graphs.pageRank]] over the per-user `k`-value transition graph:
    * nodes are the ~100 distinct `props.k` values, edges the
    * consecutive-event transitions within each user's timeline
    * (total-ordered by (ts, event_id)). 5 iterations of the
    * fixed-point micro-unit update; top 20 nodes. Every division is an
    * integer floor division, so the oracle's unrolled CTE chain
    * reproduces the exact longs.
    */
  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val k = regexp_extract(col("props"), kExpr, 1).cast("long")
    val edges = Graphs.transitionEdges(ev, k)
    val nodes = ev.select(regexp_extract(col("props"), kExpr, 1)
      .cast("long").as("node")).distinct()
    Graphs.pageRank(edges, nodes, 5)
      .orderBy(col("rank_micro").desc, col("node"))
      .limit(20)
  }

  private val pagerankOracle: String = {
    val iters = (1 to 5).map { i =>
      s"""r$i AS (
  SELECT n.node, 150000 + (85 * COALESCE(t.inflow, 0)) // 100 AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst, SUM((r.r * e.w) // e.w_out) AS inflow
    FROM e JOIN r${i - 1} r ON r.node = e.src GROUP BY e.dst) t
  ON t.dst = n.node)"""
    }.mkString(",\n")
    s"""WITH ek AS (
  SELECT user_id, ts, event_id,
    CAST(regexp_extract(props, '"k"\\s*:\\s*(\\d+)', 1) AS BIGINT) AS k
  FROM events
), seq AS (
  SELECT k AS src,
    LEAD(k) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ek
), edges AS (
  SELECT src, dst, COUNT(*) AS w FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
), outw AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS w_out FROM edges GROUP BY 1
), e AS (
  SELECT edges.src, edges.dst, edges.w, outw.w_out
  FROM edges JOIN outw ON edges.src = outw.src
), nodes AS (
  SELECT DISTINCT k AS node FROM ek
), r0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes
),
$iters
SELECT node, r AS rank_micro FROM r5
ORDER BY rank_micro DESC, node LIMIT 20"""
  }

  /** [[Graphs.triangleCensus]] over the market-basket graph: parts are
    * nodes, an (undirected) edge links two parts that appear in the
    * same order at least once. Triangle + wedge census and the global
    * clustering coefficient — the degree-ordered wedge join on the
    * Spark side must produce the exact count of the oracle's naive
    * a<b<c 3-way self-join.
    */
  private def triangles(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val a = li.select(col("ok"), col("pk").as("a"))
    val b = li.select(col("ok"), col("pk").as("b"))
    val pairs = a.join(b, "ok").where(col("a") < col("b"))
      .select("a", "b").distinct()
    Graphs.triangleCensus(pairs)
  }

  private val trianglesOracle = s"""WITH li AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
), p AS (
  SELECT DISTINCT a.pk AS a, b.pk AS b
  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
), deg AS (
  SELECT v, COUNT(*) AS deg FROM (
    SELECT a AS v FROM p UNION ALL SELECT b AS v FROM p) GROUP BY 1
), tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM p e1 JOIN p e2 ON e1.b = e2.a
    JOIN p e3 ON e3.a = e1.a AND e3.b = e2.b
), agg AS (
  SELECT COUNT(*) AS n_nodes,
    CAST(SUM(deg) AS BIGINT) // 2 AS n_edges,
    CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
  CAST(3 AS DOUBLE) * n_triangles / n_wedges AS clustering
FROM agg, tri"""

  def defs: Seq[QueryDef] = Seq(
    QueryDef("g_pagerank", pagerank, Some(pagerankOracle)),
    QueryDef("g_triangles", triangles, Some(trianglesOracle)))
}
