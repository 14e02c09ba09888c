package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time window shapes for per-entity rolling features at cluster
  * scale.
  */
object Windows {

  /** Trailing-RANGE rolling aggregates: for every row, each `aggs`
    * aggregate over the same keys' rows with time in
    * `[time - rangeMs, time]` (Spark's `rangeBetween(-rangeMs, 0)`
    * frame, both ends inclusive). `aggs` are plain aggregate columns
    * (`count(lit(1))`, `sum(col("cents"))`, …) — the frame is applied
    * here. `timeCol` must be integral epoch ms.
    *
    * Skew: with `chunkSpan = None` this is the single per-key window —
    * one shuffle/sort, but a hot key sorts in ONE task. With
    * `chunkSpan = Some(span)` (`span >= rangeMs`) the timeline splits
    * into fixed `span`-wide chunks and the window runs per (key,
    * chunk); completeness comes from replicating each chunk's trailing
    * `rangeMs` of rows into the NEXT chunk as context-only rows (every
    * frame looks back at most `rangeMs`, so the context rows are
    * exactly the out-of-chunk part of any frame). Context rows are
    * dropped after the window, so results are identical to the plain
    * path while a hot key spreads over (#chunks) tasks. Replication
    * factor is 1 + rangeMs/span ≤ 2× (pick span a few × rangeMs).
    */
  def trailingRangeAgg(df: DataFrame, keys: Seq[String], timeCol: String,
      rangeMs: Long, aggs: Seq[(String, Column)],
      chunkSpan: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty && rangeMs >= 0)
    val t = col(timeCol)
    chunkSpan match {
      case None =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(t)
          .rangeBetween(-rangeMs, 0)
        aggs.foldLeft(df) { case (d, (name, a)) => d.withColumn(name, a.over(w)) }
      case Some(span) =>
        require(span > 0, "chunkSpan must be positive (pmod(t, 0) is a division by zero)")
        require(span >= rangeMs, "chunkSpan must be >= rangeMs for frame completeness")
        // exact floor division (negative-time safe), as in Joins.asofJoin
        val chunkOf = (x: Column) => ((x - pmod(x, lit(span))) / span).cast("long")
        val own = df.withColumn("_chunk", chunkOf(t))
          .withColumn("_ctx", lit(false))
        val ctx = df.where(pmod(t, lit(span)) >= span - rangeMs)
          .withColumn("_chunk", chunkOf(t) + 1)
          .withColumn("_ctx", lit(true))
        val w = Window.partitionBy((keys :+ "_chunk").map(col): _*).orderBy(t)
          .rangeBetween(-rangeMs, 0)
        aggs.foldLeft(own.unionByName(ctx)) { case (d, (name, a)) =>
            d.withColumn(name, a.over(w)) }
          .where(!col("_ctx"))
          .drop("_chunk", "_ctx")
    }
  }
}
