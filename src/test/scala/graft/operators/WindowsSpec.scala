package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("gap interpolation: no nulls, gaps exist, values stay inside their brackets") {
    import org.apache.spark.sql.expressions.Window
    val df = graft.SparkEntry.queries("ev_interpolate")(spark, Sf)
    assert(df.where(col("value").isNull).count() == 0) // endpoints observed
    assert(df.where(!col("observed")).count() > 0)     // this SF has gaps
    val wP = Window.partitionBy("b").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wN = Window.partitionBy("b").orderBy("h")
      .rowsBetween(1, Window.unboundedFollowing)
    val bad = df
      .withColumn("pv",
        last(when(col("observed"), col("value")), ignoreNulls = true).over(wP))
      .withColumn("nv",
        first(when(col("observed"), col("value")), ignoreNulls = true).over(wN))
      .where(!col("observed") &&
        (col("value") < least(col("pv"), col("nv")) - 0.01 ||
          col("value") > greatest(col("pv"), col("nv")) + 0.01))
    assert(bad.count() == 0, "interpolated value escaped its bracket")
  }

  test("chunked trailing-range agg equals the plain window on hot-key data") {
    // one key holds ~all rows; times collide and straddle chunk
    // boundaries (incl. exactly-at-boundary and frame == full-range
    // look-backs into the previous chunk)
    val rows = (0 until 3000)
      .map(i => (if (i % 97 == 0) 2L else 1L, (i * 131 % 2048).toLong, i.toLong))
      .toDF("k", "t", "v")
    val aggs = Seq(
      "n" -> count(lit(1)),
      "s" -> sum(col("v")),
      "mx" -> max(col("v")))
    val plain = Windows.trailingRangeAgg(rows, Seq("k"), "t", 256L, aggs)
      .select("k", "t", "v", "n", "s", "mx")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    val chunked = Windows.trailingRangeAgg(rows, Seq("k"), "t", 256L, aggs,
        chunkSpan = Some(512L))
      .select("k", "t", "v", "n", "s", "mx")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(chunked == plain && plain.size == 3000)
    // the span == range edge (maximum context replication) also agrees
    val tight = Windows.trailingRangeAgg(rows, Seq("k"), "t", 256L, aggs,
        chunkSpan = Some(256L))
      .select("k", "t", "v", "n", "s", "mx")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(tight == plain)
    // plan proof: the event-scale window partitions by (key, chunk)
    val plan = Windows.trailingRangeAgg(rows, Seq("k"), "t", 256L, aggs,
        chunkSpan = Some(512L)).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(k") && plan.contains("_chunk"),
      s"expected a (key, chunk) exchange in:\n${plan.take(3000)}")
  }
}
