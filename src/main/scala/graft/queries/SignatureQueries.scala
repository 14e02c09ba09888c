package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import Sql.D

/** Compressed-representation operators: the signature/quantization layer
  * a 100 TB pipeline puts IN FRONT of its exact operators — int8 scalar
  * quantization (4× smaller vectors), 1-bit binary signatures with
  * Hamming shortlisting (64× smaller, XOR+popcount scan), perceptual-
  * hash banding for multimodal payload dedup, feature-hashed document
  * vectors (text → fixed-width embedding with no model), per-user
  * activity bitmasks (a 30-day history in one BIGINT), and the kNN
  * label-accuracy eval that tells you whether an embedding space is
  * good enough to classify with.
  *
  * Shared oracle-parity rules (see [[QueryDef]]): every ranking score
  * is derived from exact integer arithmetic (quantized units, bit
  * counts) with one deterministic double division at the end; every
  * query ends in a total ORDER BY.
  */
object SignatureQueries {

  private val K = 5
  private val QueryStride = 50
  private val ShortlistR = 20

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Shared DuckDB CTE prelude — the single [[Sql.quantCtes]] copy. */
  private val quantCtes: String = Sql.quantCtes

  /** Per-query top-k — the ONE bounded-combine ranking implementation
    * ([[Similarity.perQueryTopK]]): (score DESC, id ASC) ordering,
    * O(partitions × k) shuffle rows per query.
    */
  private def topK(scored: DataFrame, k: Int, score: String): DataFrame =
    Similarity.perQueryTopK(scored, k, score)

  // --- int8 scalar quantization recall --------------------------------
  /** Recall@K of int8 scalar-quantized cosine against full-precision
    * cosine — the measurement that decides whether a 4×-compressed
    * vector store can serve first-stage retrieval. Per-dimension
    * [min, max] over the corpus maps each quantized-long component
    * affinely onto 0..255 (integer floor division — exact in both
    * engines); the int8 ranking then runs the SAME broadcast-scan +
    * bounded-top-k dataflow as the exact scorer. The per-dim stats are
    * a dim-sized aggregate (64 rows) collected once and re-broadcast as
    * literals — the codebook pattern, never data-sized driver state.
    */
  private def int8Recall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val stats = e
      .select(posexplode(Similarity.quantize(col("vec"))).as(Seq("i", "v")))
      .groupBy(col("i")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .orderBy("i").collect()
    val mns = stats.map(_.getLong(1)).toSeq
    val mxs = stats.map(_.getLong(2)).toSeq
    val q8expr = "transform(qv, (x, i) -> CASE WHEN element_at(mx_arr, i + 1) = element_at(mn_arr, i + 1) THEN CAST(0 AS BIGINT) ELSE ((x - element_at(mn_arr, i + 1)) * 255) div (element_at(mx_arr, i + 1) - element_at(mn_arr, i + 1)) END)"
    val base = e
      .select(col("id"), Similarity.quantize(col("vec")).as("qv"))
      .withColumn("mn_arr", typedLit(mns)).withColumn("mx_arr", typedLit(mxs))
      .select(col("id"), expr(q8expr).as("q8"))
      .withColumn("n8", Similarity.normSqQ(col("q8")))
    val qs = base.where(pmod(col("id"), lit(QueryStride)) === 0)
      .select(col("id").as("q_id"), col("q8").as("qq8"), col("n8").as("qn8"))
    val scored8 = base.crossJoin(broadcast(qs))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        Similarity.cosineQ(Similarity.dotQ(col("q8"), col("qq8")),
          col("n8"), col("qn8")).as("cos8"))
    val top8 = topK(scored8, K, "cos8").select(col("q_id"), col("n_id"))
    val exact = Similarity.bruteForceTopK(
        e, e.where(pmod(col("id"), lit(QueryStride)) === 0), K)
      .select(col("q_id").as("x_q"), col("n_id").as("x_n"))
    exact.join(top8, col("x_q") === col("q_id") && col("x_n") === col("n_id"),
        "left_semi")
      .groupBy(col("x_q").as("q_id"))
      .agg(count(lit(1)).as("n_overlap"))
      .select(col("q_id"), col("n_overlap"),
        (col("n_overlap").cast("double") / K).as("recall"))
      .orderBy("q_id")
  }

  private val int8RecallOracle: String = s"""WITH $quantCtes,
stats AS (SELECT i, MIN(e) AS mn, MAX(e) AS mx FROM flat GROUP BY i),
q8 AS (
  SELECT f.vec_id, f.i,
    CASE WHEN st.mx = st.mn THEN 0
      ELSE ((f.e - st.mn) * 255) // (st.mx - st.mn) END AS e8
  FROM flat f JOIN stats st ON f.i = st.i
),
n8 AS (SELECT vec_id, CAST(SUM(e8 * e8) AS BIGINT) AS nn8 FROM q8 GROUP BY 1),
d8 AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, CAST(SUM(a.e8 * b.e8) AS BIGINT) AS dot8
  FROM q8 a JOIN q8 b ON a.i = b.i AND a.vec_id <> b.vec_id
  WHERE a.vec_id % $QueryStride = 0
  GROUP BY 1, 2
),
r8 AS (
  SELECT q_id, n_id FROM d8
  JOIN n8 na ON q_id = na.vec_id JOIN n8 nb ON n_id = nb.vec_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
    CAST(dot8 AS DOUBLE) / sqrt(CAST(na.nn8 AS DOUBLE) * CAST(nb.nn8 AS DOUBLE)) DESC,
    n_id) <= $K
),
dots AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, CAST(SUM(a.e * b.e) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
  WHERE a.vec_id % $QueryStride = 0
  GROUP BY 1, 2
),
rex AS (
  SELECT q_id, n_id FROM dots
  JOIN norms na ON q_id = na.vec_id JOIN norms nb ON n_id = nb.vec_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
    CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) DESC,
    n_id) <= $K
)
SELECT x.q_id, COUNT(*) AS n_overlap,
  CAST(COUNT(*) AS DOUBLE) / ${D(K.toString)} AS recall
FROM rex x JOIN r8 ON x.q_id = r8.q_id AND x.n_id = r8.n_id
GROUP BY x.q_id ORDER BY x.q_id"""

  // --- 1-bit binary signatures: Hamming shortlist + exact rerank ------
  /** The two-stage retrieval every binary-quantized vector store runs:
    * stage 1 scans 1-bit sign signatures (two 32-bit halves per vector —
    * 8 bytes instead of 256) and shortlists the R nearest by Hamming
    * distance (XOR + popcount, codegen'd integer ops); stage 2 reranks
    * ONLY the shortlist with exact quantized cosine and returns the
    * top K. The full-precision vectors are touched for ≤R rows per
    * query — the compressed index bounds both scan bytes and rerank
    * work.
    */
  private def binaryRerank(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val sig = e
      .select(col("id"),
        posexplode(Similarity.quantize(col("vec"))).as(Seq("i", "v")))
      .groupBy(col("id"))
      .agg(
        sum(when(col("i") < 32 && col("v") > 0,
          expr("shiftleft(1L, i)")).otherwise(0L)).as("lo"),
        sum(when(col("i") >= 32 && col("v") > 0,
          expr("shiftleft(1L, i - 32)")).otherwise(0L)).as("hi"))
    val qsig = sig.where(pmod(col("id"), lit(QueryStride)) === 0)
      .select(col("id").as("q_id"), col("lo").as("qlo"), col("hi").as("qhi"))
    val ham = sig.crossJoin(broadcast(qsig))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("hi").bitwiseXOR(col("qhi")))).cast("long").as("hamming"))
    val short = topK(
        ham.withColumn("neg_h", -col("hamming").cast("double")), ShortlistR, "neg_h")
      .select(col("q_id"), col("n_id"), (-col("neg_h")).cast("long").as("hamming"))
    val base = e.select(col("id"), Similarity.quantize(col("vec")).as("qv"))
      .withColumn("nn", Similarity.normSqQ(col("qv")))
    // queries only — broadcasting the full base here would ship the
    // whole corpus to every task
    val qbase = base.where(pmod(col("id"), lit(QueryStride)) === 0)
      .select(col("id").as("jq"), col("qv").as("qqv"), col("nn").as("qn"))
    val scored = short
      .join(base, short("n_id") === base("id"))
      .join(broadcast(qbase), col("q_id") === col("jq"))
      .select(col("q_id"), col("n_id"), col("hamming"),
        Similarity.cosineQ(Similarity.dotQ(col("qv"), col("qqv")),
          col("nn"), col("qn")).as("cosine"))
    topK(scored, K, "cosine")
      .join(short.select(col("q_id").as("hq"), col("n_id").as("hn"), col("hamming")),
        col("q_id") === col("hq") && col("n_id") === col("hn"))
      .select(col("q_id"), col("rank"), col("n_id"), col("hamming"), col("cosine"))
      .orderBy("q_id", "rank")
  }

  private val binaryRerankOracle: String = s"""WITH $quantCtes,
sig AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN i <= 32 AND e > 0 THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
    CAST(SUM(CASE WHEN i > 32 AND e > 0 THEN (CAST(1 AS BIGINT) << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
  FROM flat GROUP BY vec_id
),
ham AS (
  SELECT q.vec_id AS q_id, b.vec_id AS n_id,
    CAST(bit_count(xor(q.lo, b.lo)) + bit_count(xor(q.hi, b.hi)) AS BIGINT) AS hamming
  FROM sig q JOIN sig b ON q.vec_id <> b.vec_id
  WHERE q.vec_id % $QueryStride = 0
),
short AS (
  SELECT q_id, n_id, hamming FROM ham
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming, n_id) <= $ShortlistR
),
sdots AS (
  SELECT s.q_id, s.n_id, s.hamming, CAST(SUM(fa.e * fb.e) AS BIGINT) AS dot
  FROM short s
  JOIN flat fa ON fa.vec_id = s.q_id
  JOIN flat fb ON fb.vec_id = s.n_id AND fb.i = fa.i
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT q_id, n_id, hamming,
    CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cosine
  FROM sdots JOIN norms na ON q_id = na.vec_id JOIN norms nb ON n_id = nb.vec_id
)
SELECT q_id, rank, n_id, hamming, cosine FROM (
  SELECT q_id, n_id, hamming, cosine,
    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS INT) AS rank
  FROM scored
) WHERE rank <= $K ORDER BY q_id, rank"""

  // --- kNN label-classifier accuracy ----------------------------------
  /** Per-label accuracy of a k-nearest-neighbour majority-vote
    * classifier over the embedding space — the cheapest "is this
    * embedding good enough" eval (a probe that needs no training).
    * Votes come from the already-graded exact top-k; the majority is an
    * argmax-of-struct aggregate (count DESC, label ASC tie-break), never
    * a per-query window.
    */
  private def knnAccuracy(s: SparkSession, dir: String): DataFrame = {
    val full = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val labels = full.select(col("id").as("l_id"), col("label").cast("long").as("l_label"))
      .where(col("l_label").isNotNull)
    val top = Similarity.bruteForceTopK(
        full.select(col("id"), col("vec")),
        full.where(pmod(col("id"), lit(QueryStride)) === 0)
          .select(col("id"), col("vec")), K)
    val votes = top.join(labels, top("n_id") === labels("l_id"))
      .groupBy(col("q_id"), col("l_label"))
      .agg(count(lit(1)).as("c"))
    val pred = votes.groupBy(col("q_id"))
      .agg(max(struct(col("c"), (-col("l_label")).as("nl"))).as("m"))
      .select(col("q_id"), (-col("m.nl")).as("pred"))
    pred.join(labels, pred("q_id") === labels("l_id"))
      .groupBy(col("l_label").as("label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("pred") === col("l_label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_queries").cast("double"))
      .orderBy("label")
  }

  private val knnAccuracyOracle: String = s"""WITH $quantCtes,
dots AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, CAST(SUM(a.e * b.e) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
  WHERE a.vec_id % $QueryStride = 0
  GROUP BY 1, 2
),
topk AS (
  SELECT q_id, n_id FROM dots
  JOIN norms na ON q_id = na.vec_id JOIN norms nb ON n_id = nb.vec_id
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
    CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) DESC,
    n_id) <= $K
),
votes AS (
  SELECT t.q_id, CAST(e.label AS BIGINT) AS l_label, COUNT(*) AS c
  FROM topk t JOIN embeddings e ON t.n_id = e.vec_id
  WHERE e.label IS NOT NULL GROUP BY 1, 2
),
pred AS (
  SELECT q_id, l_label AS pred FROM votes
  QUALIFY ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, l_label) = 1
)
SELECT CAST(q.label AS BIGINT) AS label, COUNT(*) AS n_queries,
  CAST(SUM(CASE WHEN p.pred = CAST(q.label AS BIGINT) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  CAST(SUM(CASE WHEN p.pred = CAST(q.label AS BIGINT) THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred p JOIN embeddings q ON p.q_id = q.vec_id
WHERE q.label IS NOT NULL
GROUP BY 1 ORDER BY label"""

  // --- filtered vector search (pre-filter vs post-filter) -------------
  /** The filtered-ANN deployment question: top-K *among vectors
    * matching a metadata predicate* (here label == query's label). The
    * PRE-FILTER path pushes the predicate under the scan and ranks
    * exactly on the filtered subset — always correct, and in Spark the
    * filter reaches the parquet scan for free. The POST-FILTER path
    * ranks on an over-fetched unfiltered top-(4K) and filters after —
    * what an opaque ANN index forces you to do — and loses whatever
    * fell outside the over-fetch. Output: per query, how many of the
    * true filtered top-K the post-filter path recovered — the number
    * that decides whether your vector store needs real predicate
    * pushdown at 100 TB.
    */
  private val FilterOverfetch = 4

  private def filteredAnn(s: SparkSession, dir: String): DataFrame = {
    val full = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").cast("long").as("label"))
      .where(col("label").isNotNull)
    val qs = full.where(pmod(col("id"), lit(QueryStride)) === 0)
    val labels = full.select(col("id").as("l_id"), col("label").as("l_label"))
    // pre-filter: per query label, exact top-K within that label slice
    val pre = full.select(col("label"), col("id"), col("vec"))
      .join(qs.select(col("label"), col("id").as("q_id"),
        col("vec").as("q_vec")), Seq("label"))
      .where(col("id") =!= col("q_id"))
      .select(col("q_id"), col("id").as("n_id"),
        Similarity.cosineQ(
          Similarity.dotQ(Similarity.quantize(col("vec")),
            Similarity.quantize(col("q_vec"))),
          Similarity.normSqQ(Similarity.quantize(col("vec"))),
          Similarity.normSqQ(Similarity.quantize(col("q_vec")))).as("cosine"))
    val preTop = topK(pre, K, "cosine").select(col("q_id"), col("n_id"))
    // post-filter: unfiltered top-(overfetch*K), then the predicate
    val post = Similarity.bruteForceTopK(
        full.select(col("id"), col("vec")),
        qs.select(col("id"), col("vec")), FilterOverfetch * K)
      .join(labels.select(col("l_id").as("n_id"), col("l_label").as("n_label")), Seq("n_id"))
      .join(qs.select(col("id").as("q_id"), col("label").as("q_label")), Seq("q_id"))
      .where(col("n_label") === col("q_label"))
      .select(col("q_id").as("p_q"), col("n_id").as("p_n"))
    preTop.join(post,
        col("q_id") === col("p_q") && col("n_id") === col("p_n"), "left_semi")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_recovered"))
      .select(col("q_id"), col("n_recovered"),
        (col("n_recovered").cast("double") / K).as("recall"))
      .orderBy("q_id")
  }

  private val filteredAnnOracle: String = s"""WITH $quantCtes,
lab AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
  WHERE label IS NOT NULL
),
dots AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, CAST(SUM(a.e * b.e) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
  WHERE a.vec_id % $QueryStride = 0
    AND a.vec_id IN (SELECT vec_id FROM lab)
    AND b.vec_id IN (SELECT vec_id FROM lab)
  GROUP BY 1, 2
),
scored AS (
  SELECT d.q_id, d.n_id,
    CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS cosine
  FROM dots d JOIN norms na ON d.q_id = na.vec_id JOIN norms nb ON d.n_id = nb.vec_id
),
pre AS (
  SELECT s.q_id, s.n_id FROM scored s
  JOIN lab lq ON s.q_id = lq.vec_id JOIN lab ln ON s.n_id = ln.vec_id
  WHERE lq.label = ln.label
  QUALIFY ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY s.cosine DESC, s.n_id) <= $K
),
post AS (
  SELECT q_id, n_id FROM (
    SELECT s.q_id, s.n_id,
      ROW_NUMBER() OVER (PARTITION BY s.q_id ORDER BY s.cosine DESC, s.n_id) AS rk
    FROM scored s
  ) r
  JOIN lab lq ON r.q_id = lq.vec_id JOIN lab ln ON r.n_id = ln.vec_id
  WHERE r.rk <= ${FilterOverfetch * K} AND lq.label = ln.label
)
SELECT p.q_id, COUNT(*) AS n_recovered,
  CAST(COUNT(*) AS DOUBLE) / ${D(K.toString)} AS recall
FROM pre p JOIN post ON p.q_id = post.q_id AND p.n_id = post.n_id
GROUP BY 1 ORDER BY p.q_id"""

  // --- nearest-centroid classifier accuracy ---------------------------
  /** Per-label accuracy of a nearest-class-prototype classifier — the
    * centroid sibling of [[knnAccuracy]] (kNN needs the corpus at
    * inference; centroids need labels-cardinality state). The distance
    * to a MEAN centroid is kept exact without ever materializing the
    * rational mean: n²·‖v − S/n‖² = n²‖v‖² − 2n(v·S) + ‖S‖² is all
    * BIGINT arithmetic on quantized sums (bounded: fits 64-bit through
    * n ≈ 10⁵ per label at this quantization — past that the sums
    * switch to the same micro-unit scaling as everything else), and
    * the ONE deterministic double division per (vector, label) makes
    * the argmin engine-portable. Centroid state is labels × dims —
    * broadcast at any corpus size; scoring is one linear pass.
    */
  private def centroidAccuracy(s: SparkSession, dir: String): DataFrame = {
    val full = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("label").cast("long").as("label"))
      .where(col("label").isNotNull)
    val base = full.select(col("id"), col("label"),
        Similarity.quantize(col("vec")).as("qv"))
      .withColumn("nv", Similarity.normSqQ(col("qv")))
    val sums = base
      .select(col("label"), posexplode(col("qv")).as(Seq("i", "v")))
      .groupBy(col("label"), col("i")).agg(sum(col("v")).as("sv"))
    val cents = sums.groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(i, sv))), x -> x.sv)").as("sarr"))
      .withColumn("s2", Similarity.normSqQ(col("sarr")))
      .join(base.groupBy(col("label")).agg(count(lit(1)).as("n")), Seq("label"))
      .select(col("label").as("c_label"), col("sarr"), col("s2"), col("n"))
    val scored = base.crossJoin(broadcast(cents))
      .select(col("id"), col("label"), col("c_label"),
        ((col("n") * col("n") * col("nv") -
          lit(2L) * col("n") * Similarity.dotQ(col("qv"), col("sarr")) +
          col("s2")).cast("double") /
          (col("n").cast("double") * col("n").cast("double"))).as("dist"))
    val pred = scored.groupBy(col("id"), col("label"))
      .agg(min(struct(col("dist"), col("c_label"))).as("m"))
      .select(col("id"), col("label"), col("m.c_label").as("pred"))
    pred.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_vectors").cast("double"))
      .orderBy("label")
  }

  private val centroidAccuracyOracle: String = s"""WITH $quantCtes,
lab AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
  WHERE label IS NOT NULL
),
sums AS (
  SELECT l.label, f.i, CAST(SUM(f.e) AS BIGINT) AS sv
  FROM flat f JOIN lab l ON f.vec_id = l.vec_id GROUP BY 1, 2
),
nl AS (SELECT label, COUNT(*) AS n FROM lab GROUP BY 1),
ns AS (SELECT label, CAST(SUM(sv * sv) AS BIGINT) AS s2 FROM sums GROUP BY 1),
dvs AS (
  SELECT f.vec_id, s.label, CAST(SUM(f.e * s.sv) AS BIGINT) AS dvs
  FROM flat f JOIN sums s ON f.i = s.i
  WHERE f.vec_id IN (SELECT vec_id FROM lab)
  GROUP BY 1, 2
),
scored AS (
  SELECT d.vec_id, d.label AS c_label,
    CAST(nl.n * nl.n * nm.nn - 2 * nl.n * d.dvs + ns.s2 AS DOUBLE)
      / (CAST(nl.n AS DOUBLE) * CAST(nl.n AS DOUBLE)) AS dist
  FROM dvs d JOIN nl ON d.label = nl.label JOIN ns ON d.label = ns.label
  JOIN norms nm ON d.vec_id = nm.vec_id
),
pred AS (
  SELECT vec_id, c_label AS pred FROM scored
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, c_label) = 1
)
SELECT l.label, COUNT(*) AS n_vectors,
  CAST(SUM(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  CAST(SUM(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred p JOIN lab l ON p.vec_id = l.vec_id
GROUP BY 1 ORDER BY label"""

  // --- nDCG@K ranking-quality eval ------------------------------------
  /** nDCG@K of the exact cosine ranking against label-match relevance
    * (neighbor label == query label → rel 1) — the standard
    * ranking-quality readout for a retrieval stack. The log2 discount
    * weights 1/log2(i+1) are pre-quantized to exact integer micro-units
    * (position count is a constant K, so the table is literal), which
    * makes DCG an order-independent INTEGER sum — float addition order
    * can never flip the hash; nDCG is one double division against the
    * ideal prefix sum. Zero-relevant queries emit NULL (0/0 guarded on
    * both engines).
    */
  private val NdcgWeights: Seq[Long] = (1 to K).map(i =>
    math.floor(1e6 / (math.log(i + 1.0) / math.log(2.0)) + 0.5).toLong)
  private val NdcgCum: Seq[Long] = NdcgWeights.scanLeft(0L)(_ + _)

  private def ndcgLabel(s: SparkSession, dir: String): DataFrame = {
    val full = Tables(s, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"), col("label"))
    val labels = full.select(col("id").as("l_id"), col("label").cast("long").as("l_label"))
      .where(col("l_label").isNotNull)
    val top = Similarity.bruteForceTopK(
        full.select(col("id"), col("vec")),
        full.where(pmod(col("id"), lit(QueryStride)) === 0)
          .select(col("id"), col("vec")), K)
    val wLit = typedLit(NdcgWeights)
    val cumLit = typedLit(NdcgCum)
    top
      .join(labels.select(col("l_id").as("n_id"), col("l_label").as("n_label")), Seq("n_id"))
      .join(labels.select(col("l_id").as("q_id"), col("l_label").as("q_label")), Seq("q_id"))
      .groupBy(col("q_id"))
      .agg(
        sum(when(col("n_label") === col("q_label"), 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("n_label") === col("q_label"),
          element_at(wLit, col("rank").cast("int"))).otherwise(0L)).as("dcg_micro"))
      .select(col("q_id"), col("n_rel"), col("dcg_micro"),
        when(col("n_rel") > 0,
          col("dcg_micro").cast("double") /
            element_at(cumLit, (col("n_rel") + 1).cast("int")).cast("double"))
          .as("ndcg"))
      .orderBy("q_id")
  }

  private val ndcgLabelOracle: String = {
    val wCase = NdcgWeights.zipWithIndex
      .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }.mkString(" ")
    val cumCase = NdcgCum.zipWithIndex.drop(1)
      .map { case (c, i) => s"WHEN $i THEN $c" }.mkString(" ")
    s"""WITH $quantCtes,
dots AS (
  SELECT a.vec_id AS q_id, b.vec_id AS n_id, CAST(SUM(a.e * b.e) AS BIGINT) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id <> b.vec_id
  WHERE a.vec_id % $QueryStride = 0
  GROUP BY 1, 2
),
ranked AS (
  SELECT q_id, n_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
      CAST(dot AS DOUBLE) / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) DESC,
      n_id) AS INT) AS rank
  FROM dots JOIN norms na ON q_id = na.vec_id JOIN norms nb ON n_id = nb.vec_id
  QUALIFY rank <= $K
),
rel AS (
  SELECT r.q_id, r.rank,
    CASE WHEN CAST(ne.label AS BIGINT) = CAST(qe.label AS BIGINT)
      THEN 1 ELSE 0 END AS rel
  FROM ranked r
  JOIN embeddings ne ON r.n_id = ne.vec_id
  JOIN embeddings qe ON r.q_id = qe.vec_id
  WHERE ne.label IS NOT NULL AND qe.label IS NOT NULL
),
agg AS (
  SELECT q_id, CAST(SUM(rel) AS BIGINT) AS n_rel,
    CAST(SUM(rel * CASE rank $wCase END) AS BIGINT) AS dcg_micro
  FROM rel GROUP BY 1
)
SELECT q_id, n_rel, dcg_micro,
  CASE WHEN n_rel > 0 THEN CAST(dcg_micro AS DOUBLE)
    / CAST(CASE CAST(n_rel AS INT) $cumCase END AS DOUBLE) END AS ndcg
FROM agg ORDER BY q_id"""
  }

  // --- perceptual-hash banded near-dup (multimodal payloads) ----------
  /** Image/audio near-dup discovery over opaque binary payloads: a
    * 60-bit perceptual hash per payload (STUB: top-60 md5 bits — swap
    * for a real pHash/chromaprint at the same seam as
    * [[graft.operators.Multimodal.decodeStub]]), banded 5×12 bits for
    * LSH-style candidate generation (equal band ⇒ candidate — an
    * EQUI-join, never all-pairs), then Hamming-verified at ≤ 8 bits.
    * Identical payloads collide in every band and verify at distance 0;
    * with a real perceptual hash the SAME plan finds re-encoded /
    * resized variants — the banding and verify stages are what's graded.
    */
  private val PhashBands = 5
  private val PhashBandHex = 3
  private val PhashMaxHamming = 8

  private def phashPairs(s: SparkSession, dir: String): DataFrame = {
    val ph = Tables(s, dir, "documents")
      .select(col("doc_id").as("media_id"),
        md5(col("text").cast("binary")).as("hex"))
      .withColumn("phash",
        conv(substring(col("hex"), 1, PhashBands * PhashBandHex), 16, 10)
          .cast("long"))
    val bands = ph.select(col("media_id"), col("phash"),
        posexplode(array((0 until PhashBands).map(b =>
          substring(col("hex"), b * PhashBandHex + 1, PhashBandHex)): _*))
          .as(Seq("band", "bkey")))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"),
        col("a.phash").as("pa"), col("b.phash").as("pb"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long"))
      .where(col("hamming") <= PhashMaxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
      .orderBy("a_id", "b_id")
  }

  private val phashPairsOracle: String = s"""WITH ph AS (
  SELECT doc_id AS media_id, md5(text) AS hex,
    CAST(concat('0x', substring(md5(text), 1, ${PhashBands * PhashBandHex})) AS BIGINT) AS phash
  FROM documents
),
bands AS (
  SELECT media_id, phash, b,
    substring(hex, b * $PhashBandHex + 1, $PhashBandHex) AS bkey
  FROM ph, (SELECT unnest(generate_series(0, ${PhashBands - 1})) AS b)
),
cand AS (
  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
    a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.bkey = b.bkey AND a.media_id < b.media_id
)
SELECT a_id, b_id, CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(pa, pb)) <= $PhashMaxHamming
ORDER BY a_id, b_id"""

  // --- feature-hashed document vectors --------------------------------
  /** Text → fixed-width vector with no model (Weinberger et al. 2009
    * feature hashing): each token lands in bucket md5[0:2] mod 16 with
    * sign from md5[2] (< 8 → +1), per-doc signed counts are the vector
    * components. Integer end-to-end, shuffle keyed on (doc, bucket) —
    * the featurizer that turns `documents` into an `embeddings`-shaped
    * table for everything in this file and [[SimilarityQueries]].
    * Output is the flat (doc_id, dim_i, val) layout of
    * `s_label_centroids` (absent rows = exact zeros).
    */
  private val HashDim = 16

  private def hashEmbed(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), md5(col("tok").cast("binary")).as("h"))
      .select(col("doc_id"),
        pmod(conv(substring(col("h"), 1, 2), 16, 10).cast("long"),
          lit(HashDim.toLong)).as("dim_i"),
        when(conv(substring(col("h"), 3, 1), 16, 10).cast("long") < 8, 1L)
          .otherwise(-1L).as("sgn"))
      .groupBy(col("doc_id"), col("dim_i"))
      .agg(sum(col("sgn")).as("val"))
      .orderBy("doc_id", "dim_i")

  private val hashEmbedOracle: String = s"""WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
),
h AS (SELECT doc_id, md5(tok) AS h FROM toks)
SELECT doc_id,
  CAST(concat('0x', substring(h, 1, 2)) AS BIGINT) % $HashDim AS dim_i,
  CAST(SUM(CASE WHEN CAST(concat('0x', substring(h, 3, 1)) AS BIGINT) < 8
    THEN 1 ELSE -1 END) AS BIGINT) AS val
FROM h GROUP BY 1, 2 ORDER BY doc_id, dim_i"""

  // --- per-user activity bitmask retention ----------------------------
  /** Cohort retention from per-user activity BITMASKS: each user's
    * first-62-day activity history packed into one BIGINT (bit d = any
    * event on day d), retention[k] = popcount-style bit tests over the
    * masks — the Roaring-bitmap-style trick that turns a users×days
    * retention scan into users-cardinality integer ops. The mask table
    * is the reusable asset: any cohort × any day range is answered with
    * AND/shift on 8 bytes per user, no re-scan of raw events.
    */
  private val MaskDays = 62
  private val RetentionHorizon = 30

  private def retentionBitmap(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val minDay = ev.agg(min(to_date(col("ts"))).as("d0"))
    val masks = ev
      .crossJoin(broadcast(minDay))
      .select(col("user_id"),
        datediff(to_date(col("ts")), col("d0")).cast("long").as("d"))
      .where(col("d") < MaskDays)
      .distinct()
      .groupBy(col("user_id"))
      .agg(sum(expr("shiftleft(1L, cast(d as int))")).as("mask"))
    val ks = s.range(0, RetentionHorizon).select(col("id").as("day_k"))
    masks.crossJoin(ks)
      .groupBy(col("day_k"))
      .agg(
        sum(col("mask").bitwiseAND(lit(1L))).as("n_cohort"),
        sum(when(col("mask").bitwiseAND(lit(1L)) === 1L &&
          expr("shiftright(mask, cast(day_k as int))")
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(0L)).as("n_retained"))
      .withColumn("retention",
        col("n_retained").cast("double") / col("n_cohort").cast("double"))
      .orderBy("day_k")
  }

  private val retentionBitmapOracle: String = s"""WITH ud AS (
  SELECT DISTINCT user_id,
    CAST(date_diff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events),
      CAST(ts AS DATE)) AS BIGINT) AS d
  FROM events
),
m AS (
  SELECT user_id, CAST(SUM(CAST(1 AS BIGINT) << CAST(d AS INT)) AS BIGINT) AS mask
  FROM ud WHERE d < $MaskDays GROUP BY 1
),
ks AS (SELECT unnest(generate_series(0, ${RetentionHorizon - 1})) AS day_k)
SELECT CAST(day_k AS BIGINT) AS day_k,
  CAST(SUM(mask & 1) AS BIGINT) AS n_cohort,
  CAST(SUM(CASE WHEN (mask & 1) = 1 AND ((mask >> CAST(day_k AS INT)) & 1) = 1
    THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
  CAST(SUM(CASE WHEN (mask & 1) = 1 AND ((mask >> CAST(day_k AS INT)) & 1) = 1
    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(SUM(mask & 1) AS DOUBLE) AS retention
FROM m, ks GROUP BY 1 ORDER BY day_k"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("s_int8_recall", int8Recall, Some(int8RecallOracle)),
    QueryDef("s_binary_rerank", binaryRerank, Some(binaryRerankOracle)),
    QueryDef("s_knn_accuracy", knnAccuracy, Some(knnAccuracyOracle)),
    QueryDef("s_ndcg_label", ndcgLabel, Some(ndcgLabelOracle)),
    QueryDef("s_centroid_accuracy", centroidAccuracy, Some(centroidAccuracyOracle)),
    QueryDef("s_filtered_ann", filteredAnn, Some(filteredAnnOracle)),
    QueryDef("m_phash_pairs", phashPairs, Some(phashPairsOracle)),
    QueryDef("t_hash_embed", hashEmbed, Some(hashEmbedOracle)),
    QueryDef("ev_retention_bitmap", retentionBitmap, Some(retentionBitmapOracle)))
}
