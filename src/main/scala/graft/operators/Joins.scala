package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join strategies for skewed / co-located data at cluster scale. */
object Joins {

  /** Salted equi-join for skewed build sides: the left (large, skewed)
    * side gets a uniform salt in [0, buckets), the right side is
    * replicated once per salt value, and the join key becomes
    * (key, salt) — a single hot key now spreads over `buckets`
    * reducers. Result set is identical to the unsalted join (the salt
    * only re-partitions work); cost is a buckets× replication of the
    * right side, so use it large⋈small where broadcast is too big but
    * skew kills the shuffle join.
    *
    * The salt is deterministic per row content (xxhash64 of the whole
    * row), not `rand()` — retries and speculative tasks recompute the
    * same salt.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(lit((0 until buckets).toArray)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Point-in-interval RANGE JOIN via interval bucketing — the
    * 100 TB-safe shape for `point >= lo AND point < hi` joins, which
    * Spark would otherwise execute as a broadcast nested loop (every
    * point against every interval).
    *
    * Both sides map to integer buckets of width `bucketSize`: a point
    * falls in exactly ONE bucket, an interval explodes to the few
    * buckets it covers. The bucket equi-join then pairs each point with
    * only the intervals overlapping its bucket, and the residual range
    * predicate filters within — a plain shuffled hash join keyed on
    * bucket, no replication of the point side, no dedup needed (one
    * bucket per point ⇒ each qualifying pair appears exactly once).
    * Pick `bucketSize` ≈ the typical interval length: coverage explode
    * factor stays ~2-3×.
    *
    * `point`, `lo`, `hi` must be integral (cents/µs/…) for exact bucket
    * arithmetic; `hi` is exclusive.
    */
  def pointInRangeJoin(points: DataFrame, point: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      bucketSize: Long): DataFrame = {
    require(bucketSize > 0)
    val pts = points.withColumn("_bucket", (point / bucketSize).cast("long"))
    val ivs = intervals.withColumn("_bucket",
      explode(sequence((lo / bucketSize).cast("long"),
        ((hi - 1) / bucketSize).cast("long"))))
    pts.join(ivs, Seq("_bucket"))
      .where(point >= lo && point < hi)
      .drop("_bucket")
  }

  /** Interval-overlap JOIN (both sides are intervals) via the same
    * bucketing idea as [[pointInRangeJoin]] — the scale-safe shape for
    * `aLo < bHi AND bLo < aHi`, which Spark would otherwise run as a
    * broadcast nested loop.
    *
    * Both sides explode to the integer buckets they cover, the bucket
    * equi-join pairs only locally-overlapping intervals, and the
    * residual predicate filters exactly. An overlapping pair shares
    * every bucket from `max(aLo,bLo) div bucket` up, so emitting it
    * ONLY in that first shared bucket (`_bucket == greatest(...)`)
    * makes each pair appear exactly once — no distinct, no extra
    * shuffle. Bounds must be integral (days/µs/cents); `hi` exclusive;
    * pick `bucketSize` ≈ the typical interval length.
    */
  def intervalOverlapJoin(a: DataFrame, aLo: Column, aHi: Column,
      b: DataFrame, bLo: Column, bHi: Column, bucketSize: Long): DataFrame = {
    require(bucketSize > 0)
    val left = a.withColumn("_alo", aLo).withColumn("_ahi", aHi)
      .withColumn("_bucket", explode(sequence(
        (col("_alo") / bucketSize).cast("long"),
        ((col("_ahi") - 1) / bucketSize).cast("long"))))
    val right = b.withColumn("_blo", bLo).withColumn("_bhi", bHi)
      .withColumn("_bucket", explode(sequence(
        (col("_blo") / bucketSize).cast("long"),
        ((col("_bhi") - 1) / bucketSize).cast("long"))))
    left.join(right, Seq("_bucket"))
      .where(col("_alo") < col("_bhi") && col("_blo") < col("_ahi"))
      .where(col("_bucket") === greatest(
        (col("_alo") / bucketSize).cast("long"),
        (col("_blo") / bucketSize).cast("long")))
      .drop("_bucket", "_alo", "_ahi", "_blo", "_bhi")
  }

  /** Write `df` as a bucketed+sorted catalog table: co-locates and
    * pre-sorts by the join key so subsequent equi-joins between tables
    * bucketed the same way need NO shuffle (and no sort) — the pattern
    * for repeatedly-joined 100 TB fact tables. Requires a catalog
    * (`saveAsTable`); bucket files land under `path`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
}
