package graft.queries

import graft.SparkSpec

/** `q_isotonic` computes PAV through the minimax identity
  * `iso(i) = max_{j ≤ i} min_{k ≥ i} mean(j..k)` — these are the
  * textbook pooling cases checked against hand-run PAV.
  */
class IsotonicSpec extends SparkSpec {
  import spark.implicits._

  private def fit(bins: Seq[(Long, Long, Long)]): Seq[(Long, Double)] =
    Olap2Queries.isotonicFit(bins.toDF("b", "w", "p"))
      .select("bin", "iso_rate").as[(Long, Double)].collect().toSeq.sortBy(_._1)

  test("single violator pools to the weighted mean of the pair") {
    // rates 0.2, 0.6, 0.4, 0.8 → PAV pools (0.6, 0.4) → 0.5
    val got = fit(Seq((0L, 10L, 2L), (1L, 10L, 6L), (2L, 10L, 4L), (3L, 10L, 8L)))
    assert(got == Seq(0L -> 0.2, 1L -> 0.5, 2L -> 0.5, 3L -> 0.8))
  }

  test("cascading violation pools across three bins, weighted") {
    // rates 0.9, 0.3, 0.3 with weights 10, 10, 20: one pool of all
    // three at (9+3+6)/40 = 0.45 (pooling 0.9 with 0.3 drags below
    // nothing to its left, so the whole prefix merges)
    val got = fit(Seq((0L, 10L, 9L), (1L, 10L, 3L), (2L, 20L, 6L)))
    assert(got == Seq(0L -> 0.45, 1L -> 0.45, 2L -> 0.45))
  }

  test("already-monotone input is a fixpoint; gaps in bin ids are fine") {
    val got = fit(Seq((2L, 5L, 1L), (7L, 5L, 2L), (30L, 5L, 4L)))
    assert(got == Seq(2L -> 0.2, 7L -> 0.4, 30L -> 0.8))
  }
}
