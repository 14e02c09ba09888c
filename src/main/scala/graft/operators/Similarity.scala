package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`), Spark-first:
  *
  *   - brute-force cosine top-k: the exact baseline. Query vectors are
  *     broadcast; the scan side streams — no shuffle except the final
  *     per-query top-k (a window over q_id, which AQE keeps tiny because
  *     k rows per query survive the rank filter);
  *   - random-hyperplane LSH bucketing: the 100 TB path — per-row bucket
  *     signatures (pure array math inside codegen, zero shuffle), then a
  *     band-key equi-join that only pairs vectors sharing a band.
  *
  * All arithmetic is exact-integer (vectors quantized to 1e-4 units →
  * BIGINT dot products) so results are bit-reproducible across engines
  * and partitionings — float summation order can never flip a rank.
  * For raw-float scoring (when portability doesn't matter) use
  * [[cosineF]].
  */
object Similarity {

  val Scale = 10000

  /** float vector → exact integer units (1e-4). Native codegen'd
    * expression ([[graft.plans.FloatArrayQuantize]]): the HOF
    * formulation `transform(vec, x -> floor(x·1e4 + 0.5))` runs
    * interpreted AND is re-evaluated per consuming expression (no CSE
    * outside codegen) — measured as the dominant scan cost of the
    * banded-LSH signature path.
    */
  def quantize(vec: Column): Column =
    graft.plans.VectorQuantize.quantize(vec, Scale)

  /** Exact integer dot product (order-independent). Backed by the
    * native codegen'd [[graft.plans.LongArrayDot]] — the equivalent
    * `aggregate(zip_with(...))` runs interpreted, one lambda call per
    * element, and was the measured hot loop of every ANN query.
    */
  def dotQ(a: Column, b: Column): Column =
    graft.plans.LongArrayMath.dot(a, b)

  def normSqQ(a: Column): Column =
    graft.plans.LongArrayMath.normSq(a)

  /** Deterministic cosine from quantized vectors + precomputed squared
    * norms: one division and one sqrt in double — bit-identical in any
    * engine that reads the same integers.
    */
  def cosineQ(dot: Column, normA: Column, normB: Column): Column =
    dot.cast("double") / sqrt(normA.cast("double") * normB.cast("double"))

  /** Raw float cosine (double accumulation, NOT cross-engine stable). */
  def cosineF(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))
    dot / sqrt(na * nb)
  }

  /** Per-query top-k from a (q_id, n_id, cosine) scored frame via the
    * bounded [[graft.functions.TopKPairs]] aggregate, NOT a global
    * `row_number` window: the window plan funnels every scored row into
    * one task per query (N×Q rows into Q partitions — a scale-killer
    * with few queries), while the aggregate's map-side partials keep ≤k
    * pairs per query per partition, so the shuffle carries
    * O(partitions × k) rows per query. Ordering (cosine DESC, n_id ASC)
    * is identical to the window's, so ranks are bit-for-bit the same.
    */
  private[graft] def perQueryTopK(scored: DataFrame, k: Int,
      scoreCol: String = "cosine"): DataFrame =
    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKPairs.topK(k)(
        col(scoreCol), col("n_id").cast("long")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "x")))
      .select(col("q_id"), (col("p") + 1).as("rank"),
        col("x._2").as("n_id"), col("x._1").as(scoreCol))

  /** Brute-force cosine top-k: for each query vector (small set,
    * broadcast), the k nearest non-identical vectors. `emb` must have
    * (id, vec: array<float>). No shuffle until the final top-k combine,
    * and that one moves ≤k pre-ranked rows per (query, partition).
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val base = emb.select(col("id").as("n_id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val qs = queries.select(col("id").as("q_id"), quantize(col("vec")).as("qqv"))
      .withColumn("qn", normSqQ(col("qqv")))
    val scored = base.crossJoin(broadcast(qs))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        cosineQ(dotQ(col("qv"), col("qqv")), col("nn"), col("qn")).as("cosine"))
    perQueryTopK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training data op: for each
    * query, the k MOST similar vectors whose label DIFFERS (highest
    * cosine across the class boundary = the negatives a contrastive
    * loss learns most from). Same dataflow as [[bruteForceTopK]] with
    * the label-mismatch predicate applied before the bounded top-k
    * combine, so the shuffle still moves ≤k rows per (query,
    * partition); at corpus scale the crossJoin scan is replaced by the
    * IVF/LSH candidate path exactly as for plain top-k.
    *
    * Inputs carry (id, vec, label); the null-safe inequality means an
    * unlabeled row is a negative for every LABELED query and vice
    * versa, but two unlabeled rows are treated as same-class (null <=>
    * null holds) and never returned for each other — mine within
    * unlabeled data by assigning pseudo-labels first.
    */
  def hardNegativesTopK(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val base = emb.select(col("id").as("n_id"), quantize(col("vec")).as("qv"),
        col("label").as("n_label"))
      .withColumn("nn", normSqQ(col("qv")))
    val qs = queries.select(col("id").as("q_id"), quantize(col("vec")).as("qqv"),
        col("label").as("q_label"))
      .withColumn("qn", normSqQ(col("qqv")))
    val scored = base.crossJoin(broadcast(qs))
      .where(col("n_id") =!= col("q_id") && !(col("n_label") <=> col("q_label")))
      .select(col("q_id"), col("n_id"),
        cosineQ(dotQ(col("qv"), col("qqv")), col("nn"), col("qn")).as("cosine"))
    perQueryTopK(scored, k)
  }

  /** IVF (inverted-file) top-k ANN — the other classic scale path next
    * to hyperplane LSH. A small coarse codebook partitions the corpus
    * into cells (each vector belongs to its max-cosine centroid, ties to
    * the smaller centroid id); a query probes only its `nprobe` nearest
    * cells and scores the exact quantized cosine inside them.
    *
    * Dataflow at scale: the codebook broadcasts (it's ~√N rows);
    * assignment is one crossJoin + map-side-combined max-of-struct agg
    * keyed on id (no wide shuffle — vectors never leave their
    * partitions); the probe join broadcasts the (query, cell) pairs and
    * shuffles nothing but the final per-query top-k. Centroid choice is
    * the caller's: production trains k-means, tests pass a
    * deterministic id-stride subset — the dataflow is identical.
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val base = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val cb = centroids.select(col("id").as("c_id"), quantize(col("vec")).as("cqv"))
      .withColumn("cnn", normSqQ(col("cqv")))
    val cells = base.crossJoin(broadcast(cb))
      .select(col("id"),
        struct(
          cosineQ(dotQ(col("qv"), col("cqv")), col("nn"), col("cnn")).as("ccos"),
          (-col("c_id")).as("negc")).as("sc"))
      .groupBy(col("id")).agg(max(col("sc")).as("m"))
      .select(col("id"), (-col("m.negc")).cast("long").as("cell"))
    val celled = base.join(cells, Seq("id"))

    val qs = queries.select(col("id").as("q_id"), quantize(col("vec")).as("qqv"))
      .withColumn("qn", normSqQ(col("qqv")))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("c_id"))
    val probes = qs.crossJoin(broadcast(cb))
      .select(col("q_id"), col("qqv"), col("qn"), col("c_id"),
        cosineQ(dotQ(col("qqv"), col("cqv")), col("qn"), col("cnn")).as("ccos"))
      .withColumn("pr", row_number().over(wq))
      .where(col("pr") <= nprobe)
      .select(col("q_id"), col("qqv"), col("qn"), col("c_id").as("cell"))

    val scored = celled.join(broadcast(probes), Seq("cell"))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        cosineQ(dotQ(col("qv"), col("qqv")), col("nn"), col("qn")).as("cosine"))
    perQueryTopK(scored, k)
  }

  /** Recall-vs-nprobe tuning curve for the IVF index, computed in ONE
    * pass: cell assignment, probe ranking, and candidate scoring run
    * once at max(probes), each candidate carrying the probe rank `pr`
    * of the cell it came from — the nprobe=p answer is then just the
    * candidates with pr ≤ p re-ranked, a filter + bounded top-k, not a
    * re-scan. Recall is measured against [[bruteForceTopK]] ground
    * truth (hits / exact top-k pairs, one exact integer division at
    * the end). This is THE operational readout for sizing an ANN
    * deployment: where the curve flattens is the cheapest nprobe that
    * buys no more recall.
    *
    * Scale shape: identical to [[ivfTopK]] (broadcast codebook +
    * probe table, no vector shuffle) plus the brute-force baseline —
    * which is quadratic in |queries|·|corpus| and is the measurement
    * harness, not the serving path (run it on a query SAMPLE at
    * production scale, exactly as evaluated here via the query
    * stride).
    */
  def ivfRecallSweep(emb: DataFrame, queries: DataFrame, centroids: DataFrame,
      probes: Seq[Int], k: Int): DataFrame = {
    require(probes.nonEmpty, "ivfRecallSweep needs at least one nprobe")
    val spark = emb.sparkSession
    import spark.implicits._
    val maxNp = probes.max
    val base = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val cb = centroids.select(col("id").as("c_id"), quantize(col("vec")).as("cqv"))
      .withColumn("cnn", normSqQ(col("cqv")))
    val cells = base.crossJoin(broadcast(cb))
      .select(col("id"),
        struct(
          cosineQ(dotQ(col("qv"), col("cqv")), col("nn"), col("cnn")).as("ccos"),
          (-col("c_id")).as("negc")).as("sc"))
      .groupBy(col("id")).agg(max(col("sc")).as("m"))
      .select(col("id"), (-col("m.negc")).cast("long").as("cell"))
    val celled = base.join(cells, Seq("id"))
    val qs = queries.select(col("id").as("q_id"), quantize(col("vec")).as("qqv"))
      .withColumn("qn", normSqQ(col("qqv")))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("c_id"))
    val probeTbl = qs.crossJoin(broadcast(cb))
      .select(col("q_id"), col("qqv"), col("qn"), col("c_id"),
        cosineQ(dotQ(col("qqv"), col("cqv")), col("qn"), col("cnn")).as("ccos"))
      .withColumn("pr", row_number().over(wq))
      .where(col("pr") <= maxNp)
      .select(col("q_id"), col("qqv"), col("qn"), col("c_id").as("cell"),
        col("pr"))
    val scoredCand = celled.join(broadcast(probeTbl), Seq("cell"))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"), col("pr"),
        cosineQ(dotQ(col("qv"), col("qqv")), col("nn"), col("qn")).as("cosine"))
    val npDf = probes.map(_.toLong).toDF("nprobe")
    val returned = scoredCand.crossJoin(broadcast(npDf))
      .where(col("pr") <= col("nprobe"))
      .groupBy(col("nprobe"), col("q_id"))
      .agg(graft.functions.TopKPairs.topK(k)(
        col("cosine"), col("n_id").cast("long")).as("top"))
      .select(col("nprobe"), col("q_id"), explode(col("top")).as("x"))
      .select(col("nprobe"), col("q_id"), col("x._2").as("n_id"))
    val exact = bruteForceTopK(emb, queries, k).select(col("q_id"), col("n_id"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    val perNp = returned.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_returned"))
    val hits = returned.join(exact, Seq("q_id", "n_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    npDf.join(perNp, Seq("nprobe"), "left")
      .join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(nExact))
      .select(col("nprobe"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_exact"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
      .orderBy("nprobe")
  }

  /** SemDeDup-style semantic deduplication (cluster, then drop
    * near-duplicates WITHIN each cluster): every embedding is assigned
    * to its max-cosine centroid (ties to the smaller centroid id, as in
    * [[ivfTopK]]), same-cluster pairs are scored with exact quantized
    * cosine, and a vector is DROPPED when any smaller-id vector in its
    * cluster is within `minCos` — the deterministic greedy keep-lowest-id
    * policy (a keeper can therefore shadow transitively-similar
    * higher-ids without comparing them to each other).
    *
    * Dataflow at scale: the codebook broadcasts (k ≈ √N rows, like IVF);
    * assignment is a crossJoin + map-side-combined max-of-struct — no
    * vector shuffle. The pair scan is quadratic ONLY within a cluster
    * (clusters average N/k rows — the clustering exists precisely to
    * bound the quadratic term); the self-join shuffles on `cell`, and a
    * pathological mega-cluster is a codebook-quality problem (raise k),
    * not a dataflow one. Returns every input id with its cell and a
    * `kept` flag so callers can either filter or audit drop rates.
    */
  def semDedup(emb: DataFrame, centroids: DataFrame, minCos: Double): DataFrame = {
    // an empty codebook would silently drop every id from the output
    // (crossJoin with nothing); the check is one cheap action on a
    // codebook-sized frame
    require(!centroids.isEmpty, "semDedup needs a non-empty codebook")
    val base = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val cb = centroids.select(col("id").as("c_id"), quantize(col("vec")).as("cqv"))
      .withColumn("cnn", normSqQ(col("cqv")))
    val cells = base.crossJoin(broadcast(cb))
      .select(col("id"), col("qv"), col("nn"),
        struct(
          cosineQ(dotQ(col("qv"), col("cqv")), col("nn"), col("cnn")).as("ccos"),
          (-col("c_id")).as("negc")).as("sc"))
      .groupBy(col("id")).agg(max(col("sc")).as("m"), first(col("qv")).as("qv"),
        first(col("nn")).as("nn"))
      .select(col("id"), (-col("m.negc")).cast("long").as("cell"),
        col("qv"), col("nn"))
    val a = cells.select(col("cell"), col("id").as("a_id"),
      col("qv").as("a_qv"), col("nn").as("a_nn"))
    val b = cells.select(col("cell"), col("id").as("b_id"),
      col("qv").as("b_qv"), col("nn").as("b_nn"))
    val dropped = a.join(b, Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .where(cosineQ(dotQ(col("a_qv"), col("b_qv")), col("a_nn"), col("b_nn"))
        >= minCos)
      .select(col("b_id").as("id")).distinct()
    cells.select(col("id"), col("cell"))
      .join(dropped.withColumn("is_dup", lit(true)), Seq("id"), "left")
      .select(col("id"), col("cell"),
        coalesce(!col("is_dup"), lit(true)).as("kept"))
  }

  /** Product-quantization (PQ) ADC top-k — the memory-compressed ANN
    * scale path beside IVF cells and LSH bands (and FAISS's default
    * pairing with IVF at billion-vector scale): vectors are stored as
    * `m` small codes, and a query scans the CODES through a per-query
    * lookup table without ever touching the original vectors.
    *
    * Encode: each quantized vector splits into `m` contiguous
    * subvectors; subspace `j` has its own codebook (caller-provided —
    * production trains per-subspace k-means, e.g. [[kmeansCentroids]]
    * over sliced vectors; tests pass a deterministic id-stride subset,
    * exactly like [[ivfTopK]]). A subvector's code is its minimum
    * squared-L2 codeword, ties to the smaller codeword id. Distances
    * are exact integers on quantized units (`‖a‖² + ‖c‖² − 2a·c`), so
    * encoding and ADC scoring are bit-stable across engines.
    *
    * ADC (asymmetric distance computation): per query, the
    * (subspace × codeword) table of exact subspace distances is tiny
    * and broadcasts; every encoded vector's approximate distance is
    * the sum of `m` lookups — one broadcast join keyed (subspace,
    * code) plus a map-side-combinable sum. The scan is LINEAR in the
    * code table; nothing quadratic, no shuffle of vectors, and the
    * final top-k moves ≤k pre-ranked rows per (query, partition) via
    * the bounded [[graft.functions.TopKPairs]] aggregate (ascending
    * distance ≡ descending −d², exact below 2⁵³).
    */
  def pqTopK(emb: DataFrame, queries: DataFrame, codebook: DataFrame,
      m: Int, dim: Int, k: Int): DataFrame = {
    require(m > 0 && dim % m == 0, "dim must split into m equal subspaces")
    val sub = dim / m
    // (idAs, sub_id, sv): the m exploded quantized subvectors per vector
    def subVecs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("id").as(idAs), quantize(col("vec")).as("qv"))
        .select(col(idAs), explode(expr(
          s"transform(sequence(0, ${m - 1}), " +
            s"j -> struct(j AS sub_id, slice(qv, j * $sub + 1, $sub) AS sv))")).as("x"))
        .select(col(idAs), col("x.sub_id").as("sub_id"), col("x.sv").as("sv"))

    def d2(a: Column, an: Column, c: Column, cn: Column): Column =
      an + cn - lit(2L) * dotQ(a, c)

    val cb = subVecs(codebook, "c_id")
      .withColumnRenamed("sv", "cv").withColumn("cnn", normSqQ(col("cv")))

    val enc = subVecs(emb, "id").withColumn("nn", normSqQ(col("sv")))
      .join(broadcast(cb), Seq("sub_id"))
      .select(col("id"), col("sub_id"),
        struct(d2(col("sv"), col("nn"), col("cv"), col("cnn")).as("d2"),
          col("c_id").as("cid")).as("sc"))
      .groupBy(col("id"), col("sub_id")).agg(min(col("sc")).as("mn"))
      .select(col("id"), col("sub_id"), col("mn.cid").as("code"))

    val lut = subVecs(queries, "q_id").withColumn("qn", normSqQ(col("sv")))
      .join(broadcast(cb), Seq("sub_id"))
      .select(col("q_id"), col("sub_id"), col("c_id").as("code"),
        d2(col("sv"), col("qn"), col("cv"), col("cnn")).as("d2"))

    enc.join(broadcast(lut), Seq("sub_id", "code"))
      .where(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("d2")).as("adc_d2"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKPairs.topK(k)(
        (-col("adc_d2")).cast("double"), col("id").cast("long")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "x")))
      .select(col("q_id"), (col("p") + 1).as("rank"),
        col("x._2").as("n_id"), (-col("x._1")).cast("long").as("adc_d2"))
  }

  /** IVF-PQ: the FAISS-style pairing of [[ivfTopK]]'s coarse cells with
    * [[pqTopK]]'s compressed ADC scan — codes are scanned ONLY in the
    * query's `nprobe` probed cells instead of linearly, which is how a
    * billion-vector index reaches interactive latency. (No residual
    * encoding: PQ codes quantize the raw vectors, the simplification
    * several production systems ship; the cells only RESTRICT the scan,
    * so results are exactly pqTopK's ADC ranking filtered to probed
    * cells — and that equivalence is what the spec pins.)
    *
    * Dataflow: cell assignment and PQ encoding are the two existing
    * broadcast-codebook passes; the scan joins the (id, sub_id, code,
    * cell) table first against the tiny (q_id, cell) probe list, then
    * against the per-query ADC lookup — both broadcast. All distances
    * stay exact BIGINT squared-L2 on quantized units.
    */
  def ivfPqTopK(emb: DataFrame, queries: DataFrame, coarse: DataFrame,
      codebook: DataFrame, nprobe: Int, m: Int, dim: Int, k: Int): DataFrame = {
    require(m > 0 && dim % m == 0, "dim must split into m equal subspaces")
    val sub = dim / m
    def subVecs(df: DataFrame, idAs: String): DataFrame =
      df.select(col("id").as(idAs), quantize(col("vec")).as("qv"))
        .select(col(idAs), explode(expr(
          s"transform(sequence(0, ${m - 1}), " +
            s"j -> struct(j AS sub_id, slice(qv, j * $sub + 1, $sub) AS sv))")).as("x"))
        .select(col(idAs), col("x.sub_id").as("sub_id"), col("x.sv").as("sv"))
    def d2(a: Column, an: Column, c: Column, cn: Column): Column =
      an + cn - lit(2L) * dotQ(a, c)

    // coarse cell assignment — identical to ivfTopK's
    val base = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val cb0 = coarse.select(col("id").as("cc_id"), quantize(col("vec")).as("ccv"))
      .withColumn("ccn", normSqQ(col("ccv")))
    val cells = base.crossJoin(broadcast(cb0))
      .select(col("id"),
        struct(cosineQ(dotQ(col("qv"), col("ccv")), col("nn"), col("ccn")).as("ccos"),
          (-col("cc_id")).as("negc")).as("sc"))
      .groupBy(col("id")).agg(max(col("sc")).as("mx"))
      .select(col("id"), (-col("mx.negc")).cast("long").as("cell"))

    // PQ encoding — identical to pqTopK's, plus the cell column
    val cb = subVecs(codebook, "c_id")
      .withColumnRenamed("sv", "cv").withColumn("cnn", normSqQ(col("cv")))
    val enc = subVecs(emb, "id").withColumn("svn", normSqQ(col("sv")))
      .join(broadcast(cb), Seq("sub_id"))
      .select(col("id"), col("sub_id"),
        struct(d2(col("sv"), col("svn"), col("cv"), col("cnn")).as("d2"),
          col("c_id").as("cid")).as("sc"))
      .groupBy(col("id"), col("sub_id")).agg(min(col("sc")).as("mn"))
      .select(col("id"), col("sub_id"), col("mn.cid").as("code"))
      .join(cells, Seq("id"))

    // query probes — identical to ivfTopK's
    val qs = queries.select(col("id").as("q_id"), quantize(col("vec")).as("qqv"))
      .withColumn("qn", normSqQ(col("qqv")))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("ccos").desc, col("cc_id"))
    val probes = qs.crossJoin(broadcast(cb0))
      .select(col("q_id"),
        cosineQ(dotQ(col("qqv"), col("ccv")), col("qn"), col("ccn")).as("ccos"),
        col("cc_id"))
      .withColumn("pr", row_number().over(wq))
      .where(col("pr") <= nprobe)
      .select(col("q_id"), col("cc_id").as("cell"))

    // per-query ADC lookup — identical to pqTopK's
    val lut = subVecs(queries, "q_id").withColumn("qvn", normSqQ(col("sv")))
      .join(broadcast(cb), Seq("sub_id"))
      .select(col("q_id"), col("sub_id"), col("c_id").as("code"),
        d2(col("sv"), col("qvn"), col("cv"), col("cnn")).as("d2"))

    enc.join(broadcast(probes), Seq("cell"))
      .join(broadcast(lut), Seq("q_id", "sub_id", "code"))
      .where(col("id") =!= col("q_id"))
      .groupBy(col("q_id"), col("id"))
      .agg(sum(col("d2")).as("adc_d2"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKPairs.topK(k)(
        (-col("adc_d2")).cast("double"), col("id").cast("long")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "x")))
      .select(col("q_id"), (col("p") + 1).as("rank"),
        col("x._2").as("n_id"), (-col("x._1")).cast("long").as("adc_d2"))
  }

  /** Deterministic seeded k-means (Lloyd) trainer for IVF coarse
    * codebooks, so [[ivfTopK]] doesn't depend on caller-supplied
    * centroids. Returns (id: 0..k-1, vec: array<float>) ready to pass
    * as `centroids`.
    *
    * Determinism (same inputs ⇒ same codebook on any partitioning):
    * init picks the k rows with the smallest `xxhash64(seed, id)` (a
    * content-hash order, not head()'s partition order); assignment
    * breaks cosine ties toward the smaller centroid id exactly like
    * [[ivfTopK]]'s cell assign; per-cell means sum exact quantized
    * longs (order-independent, unlike float accumulation) before one
    * double division.
    *
    * Scale shape: per iteration, one broadcast crossJoin against the k
    * centroids + a max-struct agg keyed on id (map-side combinable, no
    * wide shuffle of vectors), then a (cell, pos) sum — k×dim groups.
    * Only the k×dim codebook ever reaches the driver (it is what gets
    * broadcast anyway), so the loop is lineage-free without
    * checkpoints. Empty cells keep their previous centroid.
    */
  def kmeansCentroids(emb: DataFrame, k: Int, iters: Int,
      seed: Long = 42L): DataFrame = {
    require(k > 0 && iters >= 0)
    val spark = emb.sparkSession
    import spark.implicits._
    def centDf(cs: Seq[Seq[Float]]): DataFrame =
      cs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "vec")

    // the quantized base is re-scanned by the init orderBy and every
    // Lloyd iteration unchanged — persist once for the loop's lifetime
    val base = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
      .persist()
    var cents: Seq[Seq[Float]] = base
      .orderBy(xxhash64(lit(seed), col("id")), col("id")).limit(k)
      .select(col("qv")).collect()
      .map(_.getSeq[Long](0).map(_.toFloat / Scale).toSeq).toSeq

    try for (_ <- 0 until iters) {
      val cb = centDf(cents)
        .select(col("id").as("c_id"), quantize(col("vec")).as("cqv"))
        .withColumn("cnn", normSqQ(col("cqv")))
      val assigned = base.crossJoin(broadcast(cb))
        .groupBy(col("id"))
        .agg(max(struct(
            cosineQ(dotQ(col("qv"), col("cqv")), col("nn"), col("cnn")).as("ccos"),
            (-col("c_id")).as("negc"))).as("m"),
          first(col("qv")).as("qv")) // same qv on every row of the group
      val means = assigned
        .select((-col("m.negc")).cast("long").as("cell"),
          posexplode(col("qv")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .groupBy(col("cell"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"),
            (col("s").cast("double") / col("n").cast("double")).as("mv")))),
          x => x.getField("mv").cast("float")).as("vec"))
        .collect().map(r => r.getLong(0).toInt ->
          r.getSeq[Float](1).toSeq).toMap
      cents = cents.indices.map(i => means.getOrElse(i, cents(i)))
    } finally base.unpersist(blocking = false)
    centDf(cents)
  }

  /** ±1 hyperplane components, deterministic from md5 — portable to any
    * engine by materializing the literals (see SimilarityQueries).
    */
  def planes(nPlanes: Int, dim: Int): Seq[Seq[Int]] = {
    val md = MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { i =>
        val h = md.digest(s"$p:$i".getBytes(StandardCharsets.UTF_8))
        if ((h(0) & 0xff) < 128) -1 else 1
      }
    }
  }

  /** 1-char-per-plane bucket signature ('1' = positive side). One
    * native pass over the quantized vector for ALL planes
    * ([[graft.plans.HyperplaneSignature]]): the per-plane
    * `when(dotQ > 0, "1")` concat evaluated its (interpreted, HOF)
    * input once PER PLANE — 64 planes made the signature stage alone
    * ~0.35 ms/row.
    */
  def bucketSignature(qvec: Column, planes: Seq[Seq[Int]]): Column =
    graft.plans.VectorQuantize.hyperplaneSignature(
      qvec, planes.map(_.map(_.toLong)))

  /** LSH candidate pairs: vectors sharing any of `bands` contiguous
    * `rowsPerBand`-bit slices of the bucket signature, scored with the
    * exact quantized cosine and thresholded.
    *
    * Shape matters at scale: the band self-join carries ONLY ids (a pair
    * colliding in j bands would otherwise ship its vectors j times and
    * be scored j times), pairs are deduped BEFORE scoring, and the
    * vectors are fetched by two id-equi-joins against the slim signature
    * projection — which Catalyst broadcasts while the corpus is small
    * and shuffles on id once it isn't, with no code change.
    */
  def lshCandidates(
      emb: DataFrame, planes: Seq[Seq[Int]], bands: Int, rowsPerBand: Int,
      minCosine: Double): DataFrame = {
    require(planes.size == bands * rowsPerBand)
    // MEASURED NEGATIVE twice (r6 persist, r9 checkpoint): materializing
    // sig for its three consumers loses ~0.1-0.2 s per caller at sf0.1 —
    // the eager checkpoint job outweighs re-running cheap codegen'd
    // quantize arithmetic over a small scan (BASELINE.md r6 entry;
    // r9 A/B over 6 callers). Leave sig recomputable.
    val sig = emb.select(col("id"), quantize(col("vec")).as("qv"))
      .withColumn("nn", normSqQ(col("qv")))
    val bandRows = sig
      .withColumn("bucket", bucketSignature(col("qv"), planes))
      .select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            substring(col("bucket"), b * rowsPerBand + 1, rowsPerBand).as("bkey"))): _*))
          .as("x"))
      .select(col("id"), col("x.band").as("band"), col("x.bkey").as("bkey"))
    val cand = bandRows.select(col("band"), col("bkey"), col("id").as("a_id"))
      .join(bandRows.select(col("band"), col("bkey"), col("id").as("b_id")),
        Seq("band", "bkey"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    cand
      .join(sig.select(col("id").as("a_id"), col("qv").as("a_qv"),
        col("nn").as("a_nn")), Seq("a_id"))
      .join(sig.select(col("id").as("b_id"), col("qv").as("b_qv"),
        col("nn").as("b_nn")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        cosineQ(dotQ(col("a_qv"), col("b_qv")), col("a_nn"), col("b_nn"))
          .as("cosine"))
      .where(col("cosine") >= minCosine)
  }
}
