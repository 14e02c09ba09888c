package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ScalaCheck equivalence properties for the skew-safe chunked plans:
  * on arbitrary keyed timelines (duplicate times, boundary collisions,
  * sparse and empty chunks included by construction), the chunked
  * two-pass formulations must be row-for-row equal to the one-window
  * plans they replace.
  */
class ChunkedPropsSpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(Long, Long, Long)]] =
    Gen.choose(30, 120).flatMap(n => Gen.listOfN(n, for {
      k <- Gen.oneOf(1L, 1L, 1L, 2L) // skewed toward one hot key
      t <- Gen.choose(0L, 500L)      // dense → duplicate times guaranteed
      v <- Gen.choose(-50L, 50L)
    } yield (k, t, v)))

  private val genSpan: Gen[Long] = Gen.oneOf(64L, 100L, 128L, 500L, 1000L)

  test("asofJoin: chunked == plain on arbitrary skewed timelines (ScalaCheck)") {
    val prop = Prop.forAll(genRows, genRows, genSpan) { (ls, rs, span) =>
      val left = ls.toDF("k", "t", "v")
      // contract: right unique per (key, time) — pre-aggregate like callers do
      val right = rs.toDF("k", "rt", "rv")
        .groupBy("k", "rt").agg(max(col("rv")).as("rv"))
      def canon(chunk: Option[Long]): Seq[(Long, Long, Long, Option[Long], Option[Long])] =
        Joins.asofJoin(left, "t", right, "rt", Seq("k"), chunk)
          .select("k", "t", "v", "rt", "rv")
          .as[(Long, Long, Long, Option[Long], Option[Long])]
          .collect().sorted.toSeq
      val plain = canon(None)
      val chunked = canon(Some(span))
      Prop(chunked == plain) :| s"span=$span: chunked diverged from plain"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("trailingRangeAgg: chunked == plain on arbitrary skewed timelines (ScalaCheck)") {
    val aggs = Seq("n" -> count(lit(1)), "s" -> sum(col("v")), "mn" -> min(col("v")))
    val prop = Prop.forAll(genRows, Gen.oneOf(1L, 7L, 64L, 100L), genSpan) {
      (rows, range, span0) =>
        val span = math.max(span0, range) // operator requires span >= range
        val df = rows.toDF("k", "t", "v")
        def canon(chunk: Option[Long]): Seq[(Long, Long, Long, Long, Long, Long)] =
          Windows.trailingRangeAgg(df, Seq("k"), "t", range, aggs, chunk)
            .select("k", "t", "v", "n", "s", "mn")
            .as[(Long, Long, Long, Long, Long, Long)]
            .collect().sorted.toSeq
        val plain = canon(None)
        val chunked = canon(Some(span))
        Prop(chunked == plain) :| s"range=$range span=$span: chunked diverged"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
