package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Sql.D

/** Business-analytics wave: RFM segmentation, Pareto concentration,
  * Gini coefficient, Benford's-law digit audit, chi-square independence.
  * All follow the package's oracle-parity ground rules (QueryDef scaladoc):
  * exact integer math first, one deterministic float op at the end.
  */
object BizQueries {

  private def cents(c: Column): Column =
    floor(c * 100 + 0.5).cast("long")

  // --- RFM segmentation -----------------------------------------------
  /** Classic RFM: per customer recency (days since last order), frequency
    * (order count) and monetary (exact cents), each scored 1-5 against
    * quintile cutpoints. The cutpoints come from ONE exact-percentile
    * aggregate broadcast back over the table — no global ntile sort, so
    * the plan is two shuffle-free passes over a customer-cardinality
    * aggregate at any scale (swap `percentile` for `percentile_approx`
    * when billions of customers make exact unaffordable). Recency is
    * inverted (freshest = 5) per convention. Cutpoint comparisons are
    * stable across engines: interpolated cutpoints can never collide
    * with the integer metrics they cut (a strict quintile boundary
    * falls between consecutive order statistics).
    */
  private def rfm(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(
      col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      cents(col("o_totalprice")).as("c"))
    val perCust = o.groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(col("c")).as("mon_cents"))
    val dmax = o.agg(max(col("d")).as("dmax"))
    val base = perCust.crossJoin(broadcast(dmax))
      .withColumn("rec_days", datediff(col("dmax"), col("last_d")).cast("long"))
    // all three metrics' quintile cuts in ONE distributed per-value
    // scan (melt → grouped interpolated quantiles) instead of Spark's
    // `percentile`, whose buffer holds every customer's value on one
    // task (the Quantiles scaladoc funnel); 12 cut values collect back
    val melted = base.select(explode(array(
        struct(lit("r").as("metric"), col("rec_days").as("v")),
        struct(lit("f").as("metric"), col("freq").as("v")),
        struct(lit("m").as("metric"), col("mon_cents").as("v")))).as("x"))
      .select(col("x.metric").as("metric"), col("x.v").as("v"))
    val qd = graft.operators.Quantiles.interpolated(
        melted, "v", Seq("metric"), Seq(0.2, 0.4, 0.6, 0.8))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    def above(m: Column, metric: String): Column =
      Seq(0.2, 0.4, 0.6, 0.8)
        .map(p => when(m > lit(qd((metric, p))), 1L).otherwise(0L))
        .reduce(_ + _)
    base
      .withColumn("r_score", lit(5L) - above(col("rec_days"), "r"))
      .withColumn("f_score", lit(1L) + above(col("freq"), "f"))
      .withColumn("m_score", lit(1L) + above(col("mon_cents"), "m"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("mon_cents")).cast("double") / lit(100.0)).as("segment_revenue"))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val rfmOracle = s"""WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
    CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS c
  FROM orders
), pc AS (
  SELECT o_custkey, MAX(d) AS last_d, COUNT(*) AS freq, SUM(c) AS mon_cents
  FROM o GROUP BY 1
), base AS (
  SELECT pc.*, CAST(date_diff('day', last_d, (SELECT MAX(d) FROM o)) AS BIGINT) AS rec_days
  FROM pc
), cuts AS (
  SELECT
    quantile_cont(rec_days, 0.2) AS rc1, quantile_cont(rec_days, 0.4) AS rc2,
    quantile_cont(rec_days, 0.6) AS rc3, quantile_cont(rec_days, 0.8) AS rc4,
    quantile_cont(freq, 0.2) AS fc1, quantile_cont(freq, 0.4) AS fc2,
    quantile_cont(freq, 0.6) AS fc3, quantile_cont(freq, 0.8) AS fc4,
    quantile_cont(mon_cents, 0.2) AS mc1, quantile_cont(mon_cents, 0.4) AS mc2,
    quantile_cont(mon_cents, 0.6) AS mc3, quantile_cont(mon_cents, 0.8) AS mc4
  FROM base
), scored AS (
  SELECT
    5 - ((rec_days > rc1)::BIGINT + (rec_days > rc2)::BIGINT
       + (rec_days > rc3)::BIGINT + (rec_days > rc4)::BIGINT) AS r_score,
    1 + ((freq > fc1)::BIGINT + (freq > fc2)::BIGINT
       + (freq > fc3)::BIGINT + (freq > fc4)::BIGINT) AS f_score,
    1 + ((mon_cents > mc1)::BIGINT + (mon_cents > mc2)::BIGINT
       + (mon_cents > mc3)::BIGINT + (mon_cents > mc4)::BIGINT) AS m_score,
    mon_cents
  FROM base, cuts
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
  CAST(SUM(mon_cents) AS DOUBLE) / ${D("100")} AS segment_revenue
FROM scored GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score"""

  // --- Pareto 80/20 coverage ------------------------------------------
  /** Per market segment: how few customers cover 80% of revenue. A
    * customer is in the top set while the cumulative revenue BEFORE it
    * stays under 80% of the segment total (smallest prefix reaching
    * 80%); the 80% test is the exact-integer inequality 5·cum_prev <
    * 4·total — no float in the cut. The per-segment window is bounded
    * by segment cardinality; at extreme scale the same prefix count is
    * derivable from the `q_group_topn`-style bounded aggregate.
    */
  private def pareto80(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables(s, dir, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("rev"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("rev").desc, col("o_custkey"))
    val cum = rev
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("total", sum(col("rev")).over(Window.partitionBy(col("c_mktsegment"))))
      .withColumn("in_top",
        when(lit(5L) * (col("cum") - col("rev")) < lit(4L) * col("total"), 1L).otherwise(0L))
    cum.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), sum(col("in_top")).as("n_top"),
        (sum(when(col("in_top") === 1L, col("rev")).otherwise(0L)).cast("double")
          / sum(col("rev")).cast("double")).as("top_rev_share"))
      .orderBy("c_mktsegment")
  }

  private val pareto80Oracle = s"""WITH rev AS (
  SELECT o_custkey, SUM(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), j AS (
  SELECT o_custkey, rev, c_mktsegment
  FROM rev JOIN customer ON o_custkey = c_custkey
), c AS (
  SELECT c_mktsegment, rev,
    SUM(rev) OVER (PARTITION BY c_mktsegment ORDER BY rev DESC, o_custkey
                   ROWS UNBOUNDED PRECEDING) AS cum,
    SUM(rev) OVER (PARTITION BY c_mktsegment) AS total
  FROM j
), f AS (
  SELECT c_mktsegment, rev,
    CASE WHEN 5 * (cum - rev) < 4 * total THEN 1 ELSE 0 END AS in_top
  FROM c
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(in_top) AS BIGINT) AS n_top,
  CAST(SUM(CASE WHEN in_top = 1 THEN rev ELSE 0 END) AS DOUBLE)
    / CAST(SUM(rev) AS DOUBLE) AS top_rev_share
FROM f GROUP BY 1 ORDER BY c_mktsegment"""

  // --- Gini coefficient -----------------------------------------------
  /** Revenue concentration per market segment as a Gini coefficient,
    * via the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending
    * revenue. Both Σ terms are exact BIGINT sums (rank from a
    * deterministic (rev, custkey) order), so the two final float ops
    * are identical in both engines.
    */
  private def gini(s: SparkSession, dir: String): DataFrame = {
    val rev = Tables(s, dir, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("rev"))
      .join(Tables(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("rev"), col("o_custkey"))
    rev.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("rev")).as("sx"), sum(col("i") * col("rev")).as("six"))
      .select(col("c_mktsegment"), col("n"),
        ((lit(2L) * col("six")).cast("double") / (col("n") * col("sx")).cast("double")
          - (col("n") + lit(1L)).cast("double") / col("n").cast("double")).as("gini"))
      .orderBy("c_mktsegment")
  }

  private val giniOracle = s"""WITH rev AS (
  SELECT o_custkey, SUM(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), j AS (
  SELECT o_custkey, rev, c_mktsegment
  FROM rev JOIN customer ON o_custkey = c_custkey
), r AS (
  SELECT c_mktsegment, rev,
    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY rev, o_custkey) AS BIGINT) AS i
  FROM j
), a AS (
  SELECT c_mktsegment, COUNT(*) AS n, SUM(rev) AS sx, SUM(i * rev) AS six
  FROM r GROUP BY 1
)
SELECT c_mktsegment, n,
  CAST(2 * six AS DOUBLE) / CAST(n * sx AS DOUBLE)
    - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM a ORDER BY c_mktsegment"""

  // --- Benford first-digit audit --------------------------------------
  /** Benford's-law audit of order totals: the first significant digit of
    * a positive 2-dp price equals the first digit of its integer cents
    * (leading digits are invariant under ×10ᵏ), so the digit extraction
    * is pure string-on-integer — no float log10 on the data path. The
    * expected shares log₁₀(1+1/d) are Scala-computed constants injected
    * verbatim into BOTH engines (shortest-round-trip literals), so the
    * deviation column is the same two float ops on both sides.
    */
  private val benfordExpected: Seq[(Int, Double)] =
    (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))

  private def benford(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(cents(col("o_totalprice")).cast("string"), 1, 1).cast("long")
    val expected = benfordExpected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(col("digit") === d.toLong, lit(v)).otherwise(acc)
    }
    val byDigit = Tables(s, dir, "orders")
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val tot = byDigit.agg(sum(col("n")).as("total"))
    byDigit.crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .withColumn("expected", expected)
      .withColumn("abs_dev", abs(col("share") - col("expected")))
      .select(col("digit"), col("n"), col("share"), col("expected"), col("abs_dev"))
      .orderBy("digit")
  }

  private val benfordOracle: String = {
    val cases = benfordExpected
      .map { case (d, v) => s"WHEN $d THEN ${Sql.Dlit(v)}" }.mkString(" ")
    s"""WITH b AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
    COUNT(*) AS n
  FROM orders GROUP BY 1
), t AS (SELECT SUM(n) AS total FROM b)
SELECT digit, n,
  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
  CASE digit $cases END AS expected,
  ABS(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - CASE digit $cases END) AS abs_dev
FROM b, t ORDER BY digit"""
  }

  // --- Benford MAD conformity verdict --------------------------------------
  /** Nigrini's Mean-Absolute-Deviation conformity VERDICT over the
    * first-digit table — the accept/reject layer q_benford's raw
    * deviations feed: MAD = (1/9)·Σ_d |share_d − expected_d| against
    * the published first-digit thresholds (close < 0.006, acceptable
    * < 0.012, marginal < 0.015, else nonconforming). The 9 digits are
    * a small FIXED set, so their deviations pivot into pinned columns
    * and add left-to-right on both engines (the q_tukey_hsd
    * float-order convention); a digit absent from the data contributes
    * its full expected share, exactly as Nigrini's MAD does.
    */
  private def benfordMad(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(cents(col("o_totalprice")).cast("string"), 1, 1)
      .cast("long")
    val byDigit = Tables(s, dir, "orders")
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val devs = benfordExpected.map { case (d, v) =>
      abs(coalesce(max(when(col("digit") === d.toLong,
        col("n").cast("double") / col("total").cast("double"))), lit(0.0))
        - lit(v))
    }
    val mad = (devs.reduceLeft(_ + _) / lit(9.0)).as("mad")
    val tot = byDigit.agg(sum(col("n")).as("total"))
    byDigit.crossJoin(broadcast(tot))
      .agg(max(col("total")).as("n"), mad)
      .select(col("n"), col("mad"),
        when(col("mad") < 0.006, "close")
          .when(col("mad") < 0.012, "acceptable")
          .when(col("mad") < 0.015, "marginal")
          .otherwise("nonconforming").as("verdict"))
  }

  private val benfordMadOracle: String = {
    val devTerms = benfordExpected.map { case (d, v) =>
      s"""ABS(COALESCE(MAX(CASE WHEN digit = $d THEN
      CAST(n AS DOUBLE) / CAST(total AS DOUBLE) END), CAST(0 AS DOUBLE))
      - ${Sql.Dlit(v)})"""
    }.mkString("\n    + ")
    s"""WITH b AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit,
    COUNT(*) AS n
  FROM orders GROUP BY 1
), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM b),
agg AS (
  SELECT MAX(total) AS n,
    ($devTerms) / CAST(9 AS DOUBLE) AS mad
  FROM b, t
)
SELECT n, mad,
  CASE WHEN mad < ${D("0.006")} THEN 'close'
       WHEN mad < ${D("0.012")} THEN 'acceptable'
       WHEN mad < ${D("0.015")} THEN 'marginal'
       ELSE 'nonconforming' END AS verdict
FROM agg"""
  }

  // --- Benford second-digit audit ---------------------------------------
  /** Second-significant-digit Benford audit (Nigrini's follow-up
    * screen — round-number and invented-price manipulation shows up in
    * the SECOND digit after the first-digit test passes): expected
    * share of second digit d is Σₖ₌₁..₉ log₁₀(1 + 1/(10k+d)), a
    * Scala-computed constant injected shortest-round-trip on both
    * sides; digits come off the integer-cents string, so no float
    * log touches the data path. Orders below 10 cents (no second
    * digit) are excluded by construction of the substring.
    */
  private val benford2Expected: Seq[(Int, Double)] =
    (0 to 9).map { d =>
      d -> (1 to 9).map(k => math.log10(1.0 + 1.0 / (10 * k + d))).sum
    }

  private def benford2(s: SparkSession, dir: String): DataFrame = {
    val digit = substring(cents(col("o_totalprice")).cast("string"), 2, 1).cast("long")
    val expected = benford2Expected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, v)) => when(col("digit") === d.toLong, lit(v)).otherwise(acc)
    }
    val byDigit = Tables(s, dir, "orders")
      .where(cents(col("o_totalprice")) >= 10L)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val tot = byDigit.agg(sum(col("n")).as("total"))
    byDigit.crossJoin(broadcast(tot))
      .withColumn("share", col("n").cast("double") / col("total").cast("double"))
      .withColumn("expected", expected)
      .withColumn("abs_dev", abs(col("share") - col("expected")))
      .select(col("digit"), col("n"), col("share"), col("expected"), col("abs_dev"))
      .orderBy("digit")
  }

  private val benford2Oracle: String = {
    val cases = benford2Expected
      .map { case (d, v) => s"WHEN $d THEN ${Sql.Dlit(v)}" }.mkString(" ")
    s"""WITH b AS (
  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS VARCHAR), 2, 1) AS BIGINT) AS digit,
    COUNT(*) AS n
  FROM orders
  WHERE CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) >= 10
  GROUP BY 1
), t AS (SELECT SUM(n) AS total FROM b)
SELECT digit, n,
  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
  CASE digit $cases END AS expected,
  ABS(CAST(n AS DOUBLE) / CAST(total AS DOUBLE) - CASE digit $cases END) AS abs_dev
FROM b, t ORDER BY digit"""
  }

  // --- chi-square independence test -----------------------------------
  /** Pearson chi-square independence of `lang` × `source` over the
    * documents table. Observed counts and the row/column/grand totals
    * are exact; each cell's (o−e)²/e term is floored to micro-units
    * BEFORE the sum, making the statistic an order-independent BIGINT
    * sum (float-sum ordering can never flip the hash). One row out:
    * cells, degrees of freedom, chi² in micro and float form.
    */
  private def chisq(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("lang"), col("source"))
    val obs = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rows = d.groupBy(col("lang")).agg(count(lit(1)).as("r"))
    val cols = d.groupBy(col("source")).agg(count(lit(1)).as("cc"))
    val n = d.agg(count(lit(1)).as("nn"))
    val term = obs.join(broadcast(rows), Seq("lang"))
      .join(broadcast(cols), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("e", (col("r") * col("cc")).cast("double") / col("nn").cast("double"))
      .withColumn("t_micro",
        floor((col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e") * 1e6).cast("long"))
    term.agg(
      count(lit(1)).as("n_cells"),
      ((countDistinct(col("lang")) - 1) * (countDistinct(col("source")) - 1)).as("dof"),
      sum(col("t_micro")).as("chi2_micro"))
      .withColumn("chi2", col("chi2_micro").cast("double") / lit(1e6))
      .orderBy("n_cells")
  }

  private val chisqOracle = s"""WITH d AS (
  SELECT lang, source FROM documents
), obs AS (
  SELECT lang, source, COUNT(*) AS o FROM d GROUP BY 1, 2
), rs AS (SELECT lang, COUNT(*) AS r FROM d GROUP BY 1),
cs AS (SELECT source, COUNT(*) AS cc FROM d GROUP BY 1),
nn AS (SELECT COUNT(*) AS nn FROM d),
term AS (
  SELECT obs.lang, obs.source, o,
    CAST(r * cc AS DOUBLE) / CAST(nn AS DOUBLE) AS e
  FROM obs JOIN rs ON obs.lang = rs.lang
           JOIN cs ON obs.source = cs.source, nn
), t2 AS (
  SELECT lang, source,
    CAST(FLOOR((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e * ${D("1000000")}) AS BIGINT) AS t_micro
  FROM term
)
SELECT COUNT(*) AS n_cells,
  CAST((SELECT COUNT(DISTINCT lang) FROM d) - 1 AS BIGINT)
    * CAST((SELECT COUNT(DISTINCT source) FROM d) - 1 AS BIGINT) AS dof,
  CAST(SUM(t_micro) AS BIGINT) AS chi2_micro,
  CAST(SUM(t_micro) AS DOUBLE) / ${D("1000000")} AS chi2
FROM t2 ORDER BY n_cells"""

  // --- decile lift / gains table --------------------------------------
  /** Gains table: customers are ranked into spend deciles by year-1
    * revenue, and each decile's lift = (its average year-2 revenue) /
    * (overall average year-2 revenue) — the "does past spend predict
    * future spend" readout every targeting model is benchmarked
    * against (decile 10 ≫ 1 means yes). Cutpoints come from ONE exact
    * 9-quantile aggregate over year-1 cents (the q_rfm-proven
    * percentile/quantile_cont parity) broadcast back over the
    * customers — no global sort, no ntile window. Revenue sums are
    * exact cents; lift is one double tree over four exact integers.
    */
  private val LiftY1 = 1995
  private val LiftY2 = 1996

  private def decileLift(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(col("o_custkey"),
      year(col("o_orderdate")).as("y"), cents(col("o_totalprice")).as("c"))
    val per = o.where(col("y").isin(LiftY1, LiftY2))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("y") === LiftY1, col("c")).otherwise(0L)).as("s1"),
        sum(when(col("y") === LiftY2, col("c")).otherwise(0L)).as("s2"))
      .where(col("s1") > 0)
    // customer-cardinality cutpoints via the distributed per-value scan
    // (graft.operators.Quantiles scaladoc), 9 values collected back
    val cutsArr = graft.operators.Quantiles.interpolated(
        per.select(col("s1")), "s1", Seq(), (1 to 9).map(_ / 10.0))
      .orderBy("p").collect().map(_.getDouble(1))
    val above = (0 to 8)
      .map(i => when(col("s1") > lit(cutsArr(i)), 1L).otherwise(0L))
      .reduce(_ + _)
    val tot = per.agg(sum(col("s2")).as("t2"), count(lit(1)).as("nc"))
    per
      .withColumn("decile", lit(1L) + above)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_cust"), sum(col("s2")).as("s2_cents"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n_cust"),
        (col("s2_cents").cast("double") / lit(100.0)).as("next_year_revenue"),
        ((col("s2_cents").cast("double") / col("n_cust").cast("double")) /
          (col("t2").cast("double") / col("nc").cast("double"))).as("lift"))
      .orderBy("decile")
  }

  private val decileLiftOracle: String = {
    val qcuts = (1 to 9)
      .map(i => s"quantile_cont(s1, 0.$i) AS q$i").mkString(",\n    ")
    val above = (1 to 9).map(i => s"(s1 > q$i)::BIGINT").mkString(" + ")
    s"""WITH o AS (
  SELECT o_custkey, year(CAST(o_orderdate AS DATE)) AS y,
    CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS c
  FROM orders
), per AS (
  SELECT o_custkey,
    CAST(SUM(CASE WHEN y = $LiftY1 THEN c ELSE 0 END) AS BIGINT) AS s1,
    CAST(SUM(CASE WHEN y = $LiftY2 THEN c ELSE 0 END) AS BIGINT) AS s2
  FROM o WHERE y IN ($LiftY1, $LiftY2) GROUP BY 1
  HAVING SUM(CASE WHEN y = $LiftY1 THEN c ELSE 0 END) > 0
), cuts AS (
  SELECT $qcuts
  FROM per
), tot AS (
  SELECT CAST(SUM(s2) AS BIGINT) AS t2, COUNT(*) AS nc FROM per
), scored AS (
  SELECT 1 + ($above) AS decile, s2 FROM per, cuts
)
SELECT decile, COUNT(*) AS n_cust,
  CAST(SUM(s2) AS DOUBLE) / ${D("100.0")} AS next_year_revenue,
  (CAST(SUM(s2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
    / (CAST(tot.t2 AS DOUBLE) / CAST(tot.nc AS DOUBLE)) AS lift
FROM scored, tot GROUP BY decile, tot.t2, tot.nc ORDER BY decile"""
  }

  // --- Theil index with within/between decomposition ------------------
  /** Theil T inequality index of customer spend, decomposed into
    * within-nation and between-nation components — the property Gini
    * (q_gini) famously lacks: T = Σ_g s_g·T_g + Σ_g s_g·ln(μ_g/μ)
    * splits EXACTLY, so "how much revenue inequality is geography?"
    * has a number. Per-customer terms (x/μ)·ln(x/μ) are nano-floored
    * before the integer sum (the unbounded set); the 25 nation terms
    * are likewise nano-floored (bounded set, same rule — no
    * engine-ordered float sum anywhere); the within component is the
    * exact difference of the two. One aggregate over customers, one
    * over nations, one 1-row broadcast of the global moments.
    */
  private def theilIndex(s: SparkSession, dir: String): DataFrame = {
    val spend = Tables(s, dir, "orders")
      .groupBy(col("o_custkey")).agg(sum(cents(col("o_totalprice"))).as("x"))
      .join(Tables(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"), col("x"))
    val g = spend.agg(count(lit(1)).as("n"), sum(col("x")).as("xt"))
    def d(c: Column) = c.cast("double")
    val withG = spend.crossJoin(broadcast(g))
    val mu = d(col("xt")) / d(col("n"))
    val tTot = withG
      .select(floor(d(col("x")) / mu * log(d(col("x")) / mu) * lit(1.0e9))
        .cast("long").as("t_nano"), col("n"))
      .groupBy(col("n")).agg(sum(col("t_nano")).as("sum_nano"))
      .select(col("n"),
        (col("sum_nano").cast("double") / lit(1.0e9) / d(col("n")))
          .as("theil_total"))
    val between = spend.groupBy(col("nation"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("xg"))
      .crossJoin(broadcast(g))
      .select(floor(d(col("xg")) / d(col("xt")) *
        log((d(col("xg")) / d(col("ng"))) / mu) * lit(1.0e9))
        .cast("long").as("b_nano"))
      .agg(count(lit(1)).as("n_nations"), sum(col("b_nano")).as("b_sum"))
      .select(col("n_nations"),
        (col("b_sum").cast("double") / lit(1.0e9)).as("theil_between"))
    tTot.crossJoin(between)
      .select(col("n").as("n_customers"), col("n_nations"),
        col("theil_total"), col("theil_between"),
        (col("theil_total") - col("theil_between")).as("theil_within"))
  }

  private val theilIndexOracle: String = {
    val mu = "(CAST(xt AS DOUBLE) / CAST(n AS DOUBLE))"
    s"""WITH spend AS (
  SELECT c_nationkey AS nation,
    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT))
      AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY o_custkey, c_nationkey
), g AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS xt FROM spend
), tt AS (
  SELECT n,
    CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) / $mu
      * ln(CAST(x AS DOUBLE) / $mu) * ${D("1000000000")}) AS BIGINT))
      AS BIGINT) AS sum_nano
  FROM spend, g GROUP BY n
), tb AS (
  SELECT COUNT(*) AS n_nations,
    CAST(SUM(b_nano) AS BIGINT) AS b_sum
  FROM (
    SELECT CAST(FLOOR(CAST(xg AS DOUBLE) / CAST(xt AS DOUBLE)
      * ln((CAST(xg AS DOUBLE) / CAST(ng AS DOUBLE)) / $mu)
      * ${D("1000000000")}) AS BIGINT) AS b_nano
    FROM (
      SELECT nation, COUNT(*) AS ng, CAST(SUM(x) AS BIGINT) AS xg
      FROM spend GROUP BY 1) sg, g)
)
SELECT tt.n AS n_customers, tb.n_nations,
  CAST(sum_nano AS DOUBLE) / ${D("1000000000")} / CAST(tt.n AS DOUBLE)
    AS theil_total,
  CAST(b_sum AS DOUBLE) / ${D("1000000000")} AS theil_between,
  CAST(sum_nano AS DOUBLE) / ${D("1000000000")} / CAST(tt.n AS DOUBLE)
    - CAST(b_sum AS DOUBLE) / ${D("1000000000")} AS theil_within
FROM tt, tb"""
  }

  // --- Cramér's V effect size -----------------------------------------
  /** Cramér's V over the (lang × source) contingency table — the
    * normalized effect size the chi² statistic alone doesn't give
    * (chi² grows with N; V ∈ [0,1] answers "is the association
    * actually strong?"). Same exact-integer pipeline as q_chisq_indep:
    * observed/row/column/total counts are exact longs, each cell's
    * chi² term is floored to micro-units (so the sum is
    * order-independent), and V = √(chi² / (N·min(r−1, c−1))) is one
    * deterministic double tree over those integers. The contingency
    * table is |langs|×|sources| rows — broadcast-sized at any corpus
    * scale; only the initial count scans touch the data.
    */
  private def cramersV(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents").select(col("lang"), col("source"))
    val obs = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("o"))
    val rows = d.groupBy(col("lang")).agg(count(lit(1)).as("r"))
    val cols = d.groupBy(col("source")).agg(count(lit(1)).as("cc"))
    val n = d.agg(count(lit(1)).as("nn"))
    val term = obs.join(broadcast(rows), Seq("lang"))
      .join(broadcast(cols), Seq("source"))
      .crossJoin(broadcast(n))
      .withColumn("e",
        (col("r") * col("cc")).cast("double") / col("nn").cast("double"))
      .withColumn("t_micro",
        floor((col("o").cast("double") - col("e"))
          * (col("o").cast("double") - col("e")) / col("e") * 1e6)
          .cast("long"))
    term.agg(
        max(col("nn")).as("n"),
        least(countDistinct(col("lang")) - 1,
          countDistinct(col("source")) - 1).as("dof_min"),
        sum(col("t_micro")).as("chi2_micro"))
      .select(col("n"), col("dof_min"), col("chi2_micro"),
        sqrt(col("chi2_micro").cast("double") / lit(1e6) /
          (col("n") * col("dof_min")).cast("double")).as("v"))
  }

  private val cramersVOracle = s"""WITH d AS (
  SELECT lang, source FROM documents
), obs AS (
  SELECT lang, source, COUNT(*) AS o FROM d GROUP BY 1, 2
), rs AS (SELECT lang, COUNT(*) AS r FROM d GROUP BY 1),
cs AS (SELECT source, COUNT(*) AS cc FROM d GROUP BY 1),
nn AS (SELECT COUNT(*) AS nn FROM d),
term AS (
  SELECT obs.lang, obs.source, o,
    CAST(r * cc AS DOUBLE) / CAST(nn AS DOUBLE) AS e
  FROM obs JOIN rs ON obs.lang = rs.lang
           JOIN cs ON obs.source = cs.source, nn
), t2 AS (
  SELECT lang, source,
    CAST(FLOOR((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e
      * ${D("1000000")}) AS BIGINT) AS t_micro
  FROM term
), agg AS (
  SELECT (SELECT nn FROM nn) AS n,
    LEAST((SELECT COUNT(DISTINCT lang) FROM d) - 1,
          (SELECT COUNT(DISTINCT source) FROM d) - 1) AS dof_min,
    CAST(SUM(t_micro) AS BIGINT) AS chi2_micro
  FROM t2
)
SELECT CAST(n AS BIGINT) AS n, CAST(dof_min AS BIGINT) AS dof_min,
  chi2_micro,
  sqrt(CAST(chi2_micro AS DOUBLE) / ${D("1000000")}
    / CAST(n * dof_min AS DOUBLE)) AS v
FROM agg"""

  // --- new-customer revenue share per month ---------------------------
  /** Monthly revenue split by customer tenure: the share of each month's
    * revenue coming from customers whose FIRST order falls in that
    * month. One per-customer min-month aggregate joined back on the
    * customer key (ids and cents only in the shuffle), then one monthly
    * roll-up — the acquisition-health readout every revenue dashboard
    * carries. Shares are single divisions of exact cent sums.
    */
  private def newCustShare(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders").select(
      col("o_custkey"),
      trunc(to_date(col("o_orderdate")), "month").as("m"),
      cents(col("o_totalprice")).as("c"))
    val firstM = o.groupBy(col("o_custkey")).agg(min(col("m")).as("fm"))
    o.join(firstM, Seq("o_custkey"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("c")).as("rev_cents"),
        sum(when(col("fm") === col("m"), col("c")).otherwise(0L)).as("new_cents"))
      .select(col("m"), col("n_orders"),
        (col("rev_cents").cast("double") / lit(100.0)).as("revenue"),
        (col("new_cents").cast("double") / col("rev_cents").cast("double"))
          .as("new_share"))
      .orderBy("m")
  }

  private val newCustShareOracle = s"""WITH o AS (
  SELECT o_custkey, date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
    CAST(FLOOR(o_totalprice * 100 + ${D("0.5")}) AS BIGINT) AS c
  FROM orders
), f AS (
  SELECT o_custkey, MIN(m) AS fm FROM o GROUP BY 1
), j AS (
  SELECT m, c, fm FROM o JOIN f USING (o_custkey)
), a AS (
  SELECT m, COUNT(*) AS n_orders, SUM(c) AS rev_cents,
    SUM(CASE WHEN fm = m THEN c ELSE 0 END) AS new_cents
  FROM j GROUP BY 1
)
SELECT m, n_orders,
  CAST(rev_cents AS DOUBLE) / ${D("100")} AS revenue,
  CAST(new_cents AS DOUBLE) / CAST(rev_cents AS DOUBLE) AS new_share
FROM a ORDER BY m"""

  // --- price-volume-mix bridge ----------------------------------------
  /** Revenue-bridge decomposition per brand between two ship years:
    * ΔR = volume effect (ΔQ · p₁) + price effect (R₂ − Q₂·p₁), the
    * P&L waterfall every finance review runs. Totals (R, Q) are exact
    * integer cents/units from ONE grouped pass over both years
    * (conditional sums — not two scans); the average-price terms are a
    * fixed double tree over those exact integers, and the two effects
    * reconcile to ΔR by construction (vol + price = R₂ − R₁ in real
    * arithmetic — the check column makes rounding visible instead of
    * hiding it). Only brands present in BOTH years are bridgeable.
    */
  private val PvmY1 = 1995
  private val PvmY2 = 1996

  private def priceVolumeMix(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
      .where(year(col("l_shipdate")).isin(PvmY1, PvmY2))
      .join(Tables(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val g = li.groupBy(col("p_brand").as("brand"))
      .agg(
        sum(when(year(col("l_shipdate")) === PvmY1,
          cents(col("l_extendedprice"))).otherwise(0L)).as("r1"),
        sum(when(year(col("l_shipdate")) === PvmY1,
          col("l_quantity").cast("long")).otherwise(0L)).as("q1"),
        sum(when(year(col("l_shipdate")) === PvmY2,
          cents(col("l_extendedprice"))).otherwise(0L)).as("r2"),
        sum(when(year(col("l_shipdate")) === PvmY2,
          col("l_quantity").cast("long")).otherwise(0L)).as("q2"))
      .where(col("q1") > 0 && col("q2") > 0)
    def d(c: Column) = c.cast("double")
    g.select(col("brand"), col("r1"), col("q1"), col("r2"), col("q2"),
        (d(col("q2") - col("q1")) * d(col("r1")) / d(col("q1")))
          .as("volume_effect"),
        (d(col("r2")) - d(col("q2")) * d(col("r1")) / d(col("q1")))
          .as("price_effect"),
        d(col("r2") - col("r1")).as("delta_r"))
      .orderBy("brand")
  }

  private val priceVolumeMixOracle: String = s"""WITH g AS (
  SELECT p_brand AS brand,
    CAST(SUM(CASE WHEN year(l_shipdate) = $PvmY1
      THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS r1,
    CAST(SUM(CASE WHEN year(l_shipdate) = $PvmY1
      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
    CAST(SUM(CASE WHEN year(l_shipdate) = $PvmY2
      THEN CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) ELSE 0 END)
      AS BIGINT) AS r2,
    CAST(SUM(CASE WHEN year(l_shipdate) = $PvmY2
      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) IN ($PvmY1, $PvmY2)
  GROUP BY 1
)
SELECT brand, r1, q1, r2, q2,
  CAST(q2 - q1 AS DOUBLE) * CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
    AS volume_effect,
  CAST(r2 AS DOUBLE) - CAST(q2 AS DOUBLE) * CAST(r1 AS DOUBLE)
    / CAST(q1 AS DOUBLE) AS price_effect,
  CAST(r2 - r1 AS DOUBLE) AS delta_r
FROM g WHERE q1 > 0 AND q2 > 0
ORDER BY brand"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_price_volume_mix", priceVolumeMix, Some(priceVolumeMixOracle)),
    QueryDef("q_newcust_share", newCustShare, Some(newCustShareOracle)),
    QueryDef("q_rfm", rfm, Some(rfmOracle)),
    QueryDef("q_pareto80", pareto80, Some(pareto80Oracle)),
    QueryDef("q_gini", gini, Some(giniOracle)),
    QueryDef("q_benford", benford, Some(benfordOracle)),
    QueryDef("q_benford_mad", benfordMad, Some(benfordMadOracle)),
    QueryDef("q_benford2", benford2, Some(benford2Oracle)),
    QueryDef("q_chisq_indep", chisq, Some(chisqOracle)),
    QueryDef("q_cramers_v", cramersV, Some(cramersVOracle)),
    QueryDef("q_decile_lift", decileLift, Some(decileLiftOracle)),
    QueryDef("q_theil_index", theilIndex, Some(theilIndexOracle)))
}
