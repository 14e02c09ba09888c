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

  /** 1/5/15-min load averages, or "" where /proc/loadavg is absent —
    * recorded into the bench JSON so a judge can tell ambient host load
    * from real regressions (r9 burned three A/Bs on an unrecorded noisy
    * host). Never used for timing; purely an artifact annotation.
    */
  private def loadavg(): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+").take(3).mkString(" ")
    catch { case _: Exception => "" }

  def main(args: Array[String]): Unit = {
    val loadBefore = loadavg()
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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up (JIT + codegen caches) across the engine's main code
    // shapes — relational scan/agg, regex text path, array/vector path,
    // gram-explode/window path — mirroring benchmarks.py:37-43's
    // untimed first run
    Seq("q1_pricing_summary", "t_token_count", "s_lsh_buckets", "t_winnow_fast")
      .flatMap(SparkEntry.queries.get)
      .foreach(fn => try drive(fn(spark, sfDir))
        catch { case e: Throwable => System.err.println(s"[bench] warm-up failed: $e") })

    // SPARK_GRAFT_BENCH_ONLY=q1,q2 — iterate on specific queries without
    // paying for the whole surface (dev loop only; driver runs all)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }

    // A failed rep is an ERROR, never a timing: a query that starts
    // erroring must surface in the JSON (`errors` object), not post the
    // elapsed-time-of-the-failure as a plausible-looking number.
    val results = selected.map { case (name, fn) =>
      val reps0 = (1 to reps).map { _ =>
        sweep(spark)
        val t0 = System.nanoTime()
        try { drive(fn(spark, sfDir)); Right((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
      val times = reps0.collect { case Right(t) => t }
      val firstErr = reps0.collectFirst { case Left(m) => m }
      firstErr match {
        case Some(err) if times.size < reps =>
          System.err.println(f"[bench] $name%-24s ERR ($err)")
          name -> Left(err)
        case _ =>
          val med = median(times)
          System.err.println(
            f"[bench] $name%-24s $med%8.2f s  (reps: ${times.map(t => f"$t%.2f").mkString(", ")})")
          name -> Right(med)
      }
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(m)) => k -> m }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errs.map { case (k, m) => jstr(k) + ":" + jstr(m) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    val loadAfter = loadavg()
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"n_err":${errs.size},"sf":"$sfDir","reps":$reps,"load_before":${jstr(loadBefore)},"load_after":${jstr(loadAfter)}}"""
    println(json)
    // also write the line to a file: the artifact must never depend on
    // scraping the JSON out of sbt-wrapped stdout (r2 lost its total
    // to log truncation)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] could not write $outPath: $e") }
    // The harness that invokes this main keeps only the final ~2000 chars
    // of sbt-wrapped stdout and parses a JSON line out of that tail; the
    // full line above (~15 KB at 375 queries) never fits, so it records
    // `parsed: null` every round. Emit a compact summary line LAST —
    // total + the slowest queries, sized to survive a 2000-char tail even
    // with sbt's trailing "[success] Total time" banner.
    // Locale.ROOT: Scala's f-interpolator uses the JVM default locale,
    // which under e.g. de_DE renders 287,92 — invalid JSON (ADVICE r7)
    def d2(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val slow = ok.sortBy(-_._2).take(30)
      .map { case (k, v) => jstr(k) + ":" + d2(v) }.mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${d2(total)},"unit":"sec","queries":$slow,"queries_note":"30 slowest of ${ok.size}; full set in $outPath","n_queries":${ok.size},"n_err":${errs.size},"sf":"$sfDir","reps":$reps,"load_before":${jstr(loadBefore)},"load_after":${jstr(loadAfter)}}"""
    println(compact)
    spark.stop()
  }
}
