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
  */
object Bench {
  private def drive(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { drive(fn(spark, sfDir)) }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
