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

  /** Backward AS-OF join: each left row picks the single most recent
    * right row with `rightTime <= leftTime` on the same keys (the
    * quote-to-trade / feature-at-event join), left-outer — unmatched
    * left rows keep nulls.
    *
    * Implemented as union-tag + running `last(_, ignoreNulls)` window:
    * ONE shuffle/sort on (keys, time), never a per-row range probe or
    * non-equi join (which Spark would nested-loop). Right rows sort
    * before left rows at equal time, making the match inclusive.
    *
    * Contract: time columns must be integral (epoch ms/µs — timestamps
    * cast to seconds would silently truncate); right value column names
    * must not collide with left columns; the right side must be unique
    * per (keys, rightTime) — pre-aggregate duplicates, or the pick
    * among equal-time rows is nondeterministic. Right value columns
    * should be non-null: each is carried by its own running `last`, so
    * a null value would be filled from an older right row.
    */
  def asofJoin(left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty && !keys.contains(leftTime) && !keys.contains(rightTime))
    val rVals = right.columns.filterNot(keys.contains).toSeq // incl. rightTime
    val lCols = left.columns.filterNot(keys.contains).toSeq
    require(rVals.intersect(lCols).isEmpty,
      s"right value columns collide with left: ${rVals.intersect(lCols).mkString(",")}")
    val lTagged = left.select(
      (keys.map(col) ++ Seq(col(leftTime).cast("long").as("_t"), lit(1).as("_side"))
        ++ lCols.map(col)
        ++ rVals.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rTagged = right.select(
      (keys.map(col) ++ Seq(col(rightTime).cast("long").as("_t"), lit(0).as("_side"))
        ++ lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ rVals.map(col)): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(col("_t"), col("_side"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    rVals.foldLeft(lTagged.unionByName(rTagged)) { (d, c) =>
        d.withColumn(c, last(col(c), ignoreNulls = true).over(w)) }
      .where(col("_side") === 1)
      .drop("_t", "_side")
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
