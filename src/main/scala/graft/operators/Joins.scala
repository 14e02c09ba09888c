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

  /** Broadcast hint gated on a COUNTED row threshold — for
    * data-dependent intermediates (e.g. a peel round's dropped-edge
    * set) whose size a forced `broadcast()` hint would assume and a
    * 100× input could blow past driver/executor memory. Below
    * `maxRows` the hint applies; above it the frame returns unhinted
    * and the shuffle join (or AQE's own runtime broadcast, which DOES
    * re-check sizes) takes over.
    *
    * The count needs a materialized input or it re-runs the lineage
    * twice (count + join) — previously a documented-but-unenforced
    * precondition (r8-advice); now ENFORCED: a frame that is not
    * already a checkpoint/cache leaf is checkpointed here (spill-safe
    * [[Checkpoints.round]]) and the checkpointed frame is what gets
    * counted, hinted, and returned.
    */
  def broadcastIfSmall(df: DataFrame, maxRows: Long): DataFrame = {
    val materialized = df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df // checkpoint leaf
      case plan if {
        val cs = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        cs.sharedState.cacheManager.lookupCachedData(cs, plan).isDefined
      } => df // cached — the count reads the cache, not the lineage
      case _ => Checkpoints.round(df)
    }
    if (materialized.count() <= maxRows) broadcast(materialized)
    else materialized
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
    * Implemented as union-tag + running `last(_, ignoreNulls)` window
    * over ONE struct of all right value columns: one shuffle/sort on
    * (keys, time), never a per-row range probe or non-equi join (which
    * Spark would nested-loop). Right rows sort before left rows at
    * equal time, making the match inclusive. The struct makes a match
    * ATOMIC: a null in one right value column can never back-fill from
    * an older right row while its neighbors come from a newer one.
    *
    * Skew: with `chunkSpan = None` the running window partitions by
    * `keys` only, so one hot key sorts in a single task — fine until a
    * key holds ~10⁹ rows. `chunkSpan = Some(span)` switches to the
    * skew-safe shape: the timeline splits into fixed `span`-wide time
    * chunks, the running `last` runs per (key, chunk) — a hot key now
    * spreads over (#chunks) tasks — and rows whose chunk holds no
    * earlier right row take the carry from a second, chunk-granular
    * pass: per (key, chunk) last-right summaries (one row per chunk,
    * map-side combinable `max_by`) get a per-key prefix `last` window
    * whose input is #chunks rows, not #events. Both event-scale
    * shuffles hash on (keys, chunk); nothing event-scale ever
    * serializes through a single task.
    *
    * Contract: time columns must be integral (epoch ms/µs — timestamps
    * cast to seconds would silently truncate); right value column names
    * must not collide with left columns; the right side must be unique
    * per (keys, rightTime) — pre-aggregate duplicates, or the pick
    * among equal-time rows is nondeterministic.
    */
  def asofJoin(left: DataFrame, leftTime: String,
      right: DataFrame, rightTime: String, keys: Seq[String],
      chunkSpan: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty && !keys.contains(leftTime) && !keys.contains(rightTime))
    require(chunkSpan.forall(_ > 0), "chunkSpan must be positive")
    val rVals = right.columns.filterNot(keys.contains).toSeq // incl. rightTime
    val lCols = left.columns.filterNot(keys.contains).toSeq
    require(rVals.intersect(lCols).isEmpty,
      s"right value columns collide with left: ${rVals.intersect(lCols).mkString(",")}")
    val keyCols = keys.map(col)
    val lTagged = left.select(
      (keyCols ++ Seq(col(leftTime).cast("long").as("_t"), lit(1).as("_side"))
        ++ lCols.map(col)
        ++ rVals.map(c => lit(null).cast(right.schema(c).dataType).as(c))): _*)
    val rTagged = right.select(
      (keyCols ++ Seq(col(rightTime).cast("long").as("_t"), lit(0).as("_side"))
        ++ lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))
        ++ rVals.map(col)): _*)
    // the match is one struct: null for left rows (skipped by the
    // ignoreNulls last), non-null for every right row even when some of
    // its fields are null — the atomicity guarantee
    val tagged = lTagged.unionByName(rTagged)
      .withColumn("_rv", when(col("_side") === 0, struct(rVals.map(col): _*)))
      .drop(rVals: _*)
    val W = org.apache.spark.sql.expressions.Window

    val matched = chunkSpan match {
      case None =>
        val w = W.partitionBy(keyCols: _*).orderBy(col("_t"), col("_side"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        tagged.withColumn("_m", last(col("_rv"), ignoreNulls = true).over(w))
      case Some(span) =>
        // exact floor division (negative-time safe): pmod is the
        // non-negative remainder, so (_t - pmod) is a span multiple
        val chunked = tagged.withColumn("_chunk",
          ((col("_t") - pmod(col("_t"), lit(span))) / span).cast("long"))
        val ck = keys :+ "_chunk"
        val wc = W.partitionBy(ck.map(col): _*).orderBy(col("_t"), col("_side"))
          .rowsBetween(W.unboundedPreceding, W.currentRow)
        val run = chunked.withColumn("_m0",
          last(col("_rv"), ignoreNulls = true).over(wc))
        // one row per (key, chunk): the chunk's last right struct
        // (right times are unique per key, so max_by has no ties)
        val summaries = chunked.where(col("_side") === 0)
          .groupBy(ck.map(col): _*)
          .agg(max_by(col("_rv"), col("_t")).as("_last_rv"))
        // prefix-carry across chunks, over ALL chunks present in the
        // data (a chunk with left rows but no right rows still needs
        // the carry from the nearest earlier right-bearing chunk)
        val wk = W.partitionBy(keyCols: _*).orderBy(col("_chunk"))
          .rowsBetween(W.unboundedPreceding, -1)
        val carry = chunked.select(ck.map(col): _*).distinct()
          .join(summaries, ck, "left")
          .withColumn("_carry", last(col("_last_rv"), ignoreNulls = true).over(wk))
          .select((ck.map(col) :+ col("_carry")): _*)
        run.join(carry, ck)
          .withColumn("_m", coalesce(col("_m0"), col("_carry")))
    }
    matched.where(col("_side") === 1)
      .select((keyCols ++ lCols.map(col)
        ++ rVals.map(c => col("_m").getField(c).as(c))): _*)
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
