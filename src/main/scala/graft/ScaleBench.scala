package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Joins, Similarity, TextDedup}

/** Volume-axis stress bench (VERDICT-r5 #2): measures the SCALE-PATH
  * operators against their quadratic baselines on synthetic corpora at
  * 10-40× the sf0.1 volumes, so the repo's 100×-scale claims are
  * curves, not prose. [[SkewBench]] covers the skew axis (one hot
  * key); this covers growth:
  *
  *   - `ppjoin` (prefix-filtered exact set-similarity join) vs
  *     `jaccard_allpairs` (full co-shingle join): with a fixed shingle
  *     vocabulary, docs-per-shingle grows ∝ corpus, so the all-pairs
  *     candidate join grows ∝ N²/V while the prefix filter touches
  *     only each doc's rarest shingles — the curve should CROSS.
  *   - `lsh_pairs` (banded hyperplane-LSH candidates) vs
  *     `ann_brute_pairs` (exact all-pairs cosine): quadratic baseline
  *     quadruples per corpus doubling, buckets don't. The brute
  *     variant is capped (`SPARK_GRAFT_SCALE_BRUTE_CAP`, default
  *     45k vectors) — beyond it the point is already made.
  *   - `asof_plain` vs `asof_chunked` on UNIFORM keys: both must stay
  *     ~linear in event volume, chunking's replication overhead
  *     bounded (the chunked form exists for skew, measured in
  *     SkewBench — here it must not cost at scale when keys are fine).
  *
  * All inputs derive from xxhash64(id) — deterministic, no rand() —
  * and are materialized to parquet first so every variant reads the
  * identical bytes. Results → BASELINE.md "scale curves" table.
  * Volumes are multiples of sf0.1 (5k documents / 2k vectors / 100k
  * events) via `SPARK_GRAFT_SCALE_MULTS` (default "10,20,40").
  */
object ScaleBench {
  private val Vocab = 500000L  // fixed shingle vocabulary → df grows with N
  private val Dim = 64
  private val NPlanes = 16
  private val Bands = 4
  private val RowsPerBand = 4
  private val MinCos = 0.25
  private val DayMs = 24L * 3600 * 1000
  private val SpanMs = 30 * DayMs

  private def drive(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Synthetic shingle table: ~30-70 shingles/doc from the fixed
    * vocabulary; every doc with id ≡ 1 (mod 10) is an exact twin of
    * id−1 (planted dups so both joins emit real pairs).
    */
  private def genShingles(spark: SparkSession, nDocs: Long, path: String): Unit = {
    spark.range(nDocs)
      .select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(10)) === 1, col("id") - 1)
          .otherwise(col("id")).as("base"))
      .withColumn("n", (pmod(xxhash64(col("base"), lit(1)), lit(41)) + 30))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n") - 1)).as("k"), col("base"))
      .select(col("doc_id"),
        concat(lit("s"),
          pmod(xxhash64(col("base"), col("k"), lit(7)), lit(Vocab)))
          .as("shingle"))
      .distinct()
      .write.mode("overwrite").parquet(path)
  }

  /** Synthetic embeddings: 200 cluster centers + 10% per-vector noise,
    * so LSH buckets carry real near-neighbor structure.
    */
  private def genEmbeddings(spark: SparkSession, nVec: Long, path: String): Unit = {
    def u(h: Column, span: Int): Column = // hash → [-1, 1] at 1e-3 grid
      (pmod(h, lit(2L * span + 1)) - span).cast("double") / span
    spark.range(nVec)
      .withColumn("c", pmod(xxhash64(col("id"), lit(1)), lit(200L)))
      .select(col("id"),
        transform(sequence(lit(0), lit(Dim - 1)), d =>
          (u(xxhash64(col("c"), d, lit(5)), 1000) +
            u(xxhash64(col("id"), d, lit(6)), 1000) * 0.1).cast("float"))
          .as("vec"))
      .write.mode("overwrite").parquet(path)
  }

  private def genEvents(spark: SparkSession, n: Long, path: String): Unit = {
    spark.range(n).select(
        pmod(xxhash64(col("id"), lit(10)), lit(n / 100 + 1)).as("user_id"),
        pmod(xxhash64(col("id"), lit(12)), lit(SpanMs)).as("t"),
        col("id").as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events")
    spark.range(n / 20).select(
        pmod(xxhash64(col("id"), lit(20)), lit(n / 100 + 1)).as("user_id"),
        pmod(xxhash64(col("id"), lit(22)), lit(SpanMs)).as("qt"),
        pmod(xxhash64(col("id"), lit(23)), lit(10000)).as("quote"))
      .groupBy("user_id", "qt").agg(max("quote").as("quote"))
      .write.mode("overwrite").parquet(s"$path/quotes")
  }

  /** Exact all-pairs cosine — the quadratic baseline LSH replaces. */
  private def brutePairs(emb: DataFrame): DataFrame = {
    val sig = emb.select(col("id"), Similarity.quantize(col("vec")).as("qv"))
      .withColumn("nn", Similarity.normSqQ(col("qv")))
    sig.select(col("id").as("a_id"), col("qv").as("a_qv"), col("nn").as("a_nn"))
      .crossJoin(sig.select(col("id").as("b_id"), col("qv").as("b_qv"),
        col("nn").as("b_nn")))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        Similarity.cosineQ(Similarity.dotQ(col("a_qv"), col("b_qv")),
          col("a_nn"), col("b_nn")).as("cosine"))
      .where(col("cosine") >= MinCos)
  }

  def main(args: Array[String]): Unit = {
    val mults = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULTS", "10,20,40")
      .split(",").map(_.trim.toInt).toSeq
    val bruteCap = sys.env.getOrElse("SPARK_GRAFT_SCALE_BRUTE_CAP", "45000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val planes = Similarity.planes(NPlanes, Dim)
    val tmp = java.nio.file.Files.createTempDirectory("graft_scale").toString

    val curves = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.LinkedHashMap[Long, Double]]
    def record(variant: String, size: Long, mk: () => DataFrame): Unit = {
      drive(mk()) // warm-up (JIT + codegen cache)
      val med = median((1 to reps).map { _ =>
        val t0 = System.nanoTime()
        drive(mk())
        (System.nanoTime() - t0) / 1e9
      })
      System.err.println(f"[scale-bench] $variant%-18s n=$size%9d $med%8.2f s")
      curves.getOrElseUpdate(variant,
        scala.collection.mutable.LinkedHashMap.empty) += size -> med
    }

    for (m <- mults) {
      val nDocs = 5000L * m
      val nVec = 2000L * m
      val nEv = 100000L * m
      genShingles(spark, nDocs, s"$tmp/sh_$m")
      genEmbeddings(spark, nVec, s"$tmp/emb_$m")
      genEvents(spark, nEv, s"$tmp/ev_$m")
      val sh = spark.read.parquet(s"$tmp/sh_$m")
      val emb = spark.read.parquet(s"$tmp/emb_$m")
      val events = spark.read.parquet(s"$tmp/ev_$m/events")
      val quotes = spark.read.parquet(s"$tmp/ev_$m/quotes")

      record("jaccard_allpairs", nDocs, () => TextDedup.jaccardPairs(sh, 0.8))
      record("ppjoin", nDocs, () => TextDedup.ppjoinPairs(sh, 4, 5))
      record("lsh_pairs", nVec, () =>
        Similarity.lshCandidates(emb, planes, Bands, RowsPerBand, MinCos))
      if (nVec <= bruteCap)
        record("ann_brute_pairs", nVec, () => brutePairs(emb))
      else System.err.println(
        s"[scale-bench] ann_brute_pairs SKIPPED at n=$nVec (cap $bruteCap)")
      record("asof_plain", nEv, () =>
        Joins.asofJoin(events, "t", quotes, "qt", Seq("user_id")))
      record("asof_chunked", nEv, () =>
        Joins.asofJoin(events, "t", quotes, "qt", Seq("user_id"),
          chunkSpan = Some(DayMs)))
    }

    val qs = curves.map { case (v, pts) =>
      s""""$v":{${pts.map { case (n, t) => s""""$n":$t""" }.mkString(",")}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_curves","mults":[${mults.mkString(",")}],"curves":$qs,"reps":$reps}""")
  }
}
