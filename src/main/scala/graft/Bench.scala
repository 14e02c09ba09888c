package graft

import org.apache.spark.sql.SparkSession

/** E4 — benchmark harness (protocol from
  * `/root/reference/benchmarks.py:13-89`: warm-up run, then timed runs,
  * wall-clock seconds). Prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Each query is driven to completion with a `noop`-sink write: unlike
  * `count()` (where Catalyst prunes unevaluated projections and
  * eliminates sorts above the agg), the noop sink materializes every
  * output row and column without collecting to the driver — the honest
  * full-query cost.
  *
  * Variance control (round-2 protocol): each query runs
  * `SPARK_GRAFT_BENCH_REPS` times (default 3) and reports the MEDIAN;
  * before every rep the catalog cache and all persistent RDD blocks
  * (persisted frames AND `localCheckpoint` leftovers) are swept, so no
  * query's session state can poison a later one and reps are i.i.d.
  * `value` is the sum of per-query medians.
  */
object Bench {
  private def drive(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Clear every block-manager resident between reps: cached tables /
    * persisted frames via the catalog, plus raw persistent RDDs (which
    * is where eager `localCheckpoint` blocks live — `clearCache` alone
    * does not touch those).
    */
  private def sweep(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (JIT + codegen caches) across the engine's main code
    // shapes — relational scan/agg, regex text path, array/vector path,
    // gram-explode/window path — mirroring benchmarks.py:37-43's
    // untimed first run
    Seq("q1_pricing_summary", "t_token_count", "s_lsh_buckets", "t_winnow_fast")
      .flatMap(SparkEntry.queries.get)
      .foreach(fn => drive(fn(spark, sfDir)))

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 — iterate on specific queries without
    // paying for the whole surface (dev loop only; driver runs all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        sweep(spark)
        val t0 = System.nanoTime()
        try { drive(fn(spark, sfDir)) }
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      val med = median(times)
      System.err.println(
        f"[bench] $name%-24s $med%8.2f s  (reps: ${times.map(t => f"$t%.2f").mkString(", ")})")
      name -> med
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
