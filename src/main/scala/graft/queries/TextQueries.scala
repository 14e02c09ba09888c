package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.TextDedup
import Sql.D

/** Text-analysis + deduplication surface over `documents` (the LLM-data-
  * pipeline operators): token/quality stats, BPE-ish token counting,
  * language ID, fingerprinting, exact dedup, exact n-gram Jaccard
  * near-dup pairs, and MinHash+LSH candidate generation — every one
  * hash-checked against a DuckDB re-statement of the same math.
  */
object TextQueries {

  private val Stopwords = Seq("the", "a", "of", "and", "in", "to", "is")

  // --- per-doc stats ------------------------------------------------
  private def stats(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokenCount(col("text"))
    Tables(s, dir, "documents").select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      toks.as("n_tokens"),
      TextFunctions.stopwordCount(col("text"), Stopwords).as("n_stopwords"),
      TextFunctions.punctCount(col("text")).as("n_punct"),
      when(toks === 0, 0.0).otherwise(
        graft.etl.Transform.round2(
          length(regexp_replace(col("text"), "\\s+", "")).cast("double")
            / toks.cast("double"))).as("avg_token_len"))
      .orderBy("doc_id")
  }

  private def reaCount(expr: String): String =
    s"CAST(length(regexp_extract_all($expr)) AS INT)"

  private val statsOracle = s"""SELECT doc_id,
  CAST(length(text) AS INT) AS n_chars_calc,
  ${reaCount("text, '\\S+'")} AS n_tokens,
  ${reaCount(s"text, '\\b(${Stopwords.mkString("|")})\\b'")} AS n_stopwords,
  ${reaCount("text, '[^\\w\\s]'")} AS n_punct,
  CASE WHEN ${reaCount("text, '\\S+'")} = 0 THEN ${D("0")} ELSE
    ${Sql.round2(s"CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / CAST(${reaCount("text, '\\S+'")} AS DOUBLE)")}
  END AS avg_token_len
FROM documents ORDER BY doc_id"""

  // --- corpus quality summary by source -----------------------------
  private def quality(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"),
        sum(TextFunctions.bpeishTokenCount(col("text")).cast("long")).as("sum_bpeish_tokens"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("sum_tokens"))
      .withColumn("avg_chars", col("sum_chars").cast("double") / col("n_docs").cast("double"))
      .orderBy("source")

  private val qualityOracle = s"""SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
  CAST(SUM(length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS sum_bpeish_tokens,
  CAST(SUM(length(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS sum_tokens,
  CAST(CAST(SUM(length(text)) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_chars
FROM documents GROUP BY source ORDER BY source"""

  // --- language ID --------------------------------------------------
  private def langid(s: SparkSession, dir: String): DataFrame = {
    val profiles = TextFunctions.DefaultProfiles
    val hitCols = profiles.map { case (l, ws) =>
      TextFunctions.stopwordCount(col("text"), ws).as(s"n_$l")
    }
    Tables(s, dir, "documents")
      .select(col("doc_id") +: col("lang") +: col("text") +: hitCols: _*)
      .withColumn("pred_lang",
        TextFunctions.languageGuess(col("text"), profiles))
      .withColumn("is_match",
        when(col("pred_lang") === col("lang"), 1).otherwise(0))
      .drop("text")
      .orderBy("doc_id")
  }

  /** Oracle fragments shared by langid and the confusion matrix: the
    * per-profile hit counts CTE body and the tie-break CASE chain
    * mirroring `TextFunctions.languageGuess`.
    */
  private lazy val langHitsSql: String = TextFunctions.DefaultProfiles
    .map { case (l, ws) =>
      s"${reaCount(s"text, '\\b(${ws.mkString("|")})\\b'")} AS n_$l"
    }.mkString(",\n    ")

  private lazy val predLangCaseSql: String = {
    val profiles = TextFunctions.DefaultProfiles
    val whens = profiles.zipWithIndex.init.map { case ((l, _), i) =>
      val cond = profiles.drop(i + 1)
        .map { case (m, _) => s"n_$l >= n_$m" }.mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${profiles.last._1}' END"
  }

  private val langidOracle: String = s"""WITH h AS (
  SELECT doc_id, lang, $langHitsSql, text FROM documents
)
SELECT doc_id, lang, ${TextFunctions.DefaultProfiles.map(p => "n_" + p._1).mkString(", ")},
  $predLangCaseSql AS pred_lang,
  CASE WHEN ($predLangCaseSql) = lang THEN 1 ELSE 0 END AS is_match
FROM h ORDER BY doc_id"""

  // --- language-ID confusion matrix (classifier evaluation) -----------
  /** Labeled-vs-predicted confusion counts — the evaluation readout for
    * the language classifier (the `lang` column is ground truth in this
    * corpus). One groupBy on the already-scalar (lang, pred) pair;
    * per-doc scoring stays inside the scan's codegen stage.
    */
  private def langidConfusion(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("lang"),
        TextFunctions.languageGuess(col("text"), TextFunctions.DefaultProfiles)
          .as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")

  private val langidConfusionOracle: String = s"""WITH h AS (
  SELECT doc_id, lang, $langHitsSql, text FROM documents
)
SELECT lang, $predLangCaseSql AS pred_lang, COUNT(*) AS n
FROM h GROUP BY 1, 2 ORDER BY lang, pred_lang"""

  /** `languageGuess` consumes the text column directly, so the Spark side
    * recomputes hits; the oracle reuses its CTE — identical values.
    */

  /** Cohen's kappa for the language classifier vs the labeled `lang`
    * column — chance-corrected agreement, the honest single-number
    * readout next to the raw confusion matrix (a majority-class
    * guesser scores high accuracy but κ≈0). Reduced to integer
    * sufficient statistics: κ = (N·agree − Σ rowₗ·colₗ) /
    * (N² − Σ rowₗ·colₗ), so ONE double division at the end —
    * bit-equal across engines. The confusion matrix is
    * langs²-cardinality: every join/agg after the first groupBy is
    * driver-trivial at any corpus size.
    */
  private def cohensKappa(s: SparkSession, dir: String): DataFrame = {
    val cm = Tables(s, dir, "documents")
      .select(col("lang"),
        TextFunctions.languageGuess(col("text"), TextFunctions.DefaultProfiles)
          .as("pred_lang"))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = cm.agg(sum(col("n")).as("total"),
      sum(when(col("lang") === col("pred_lang"), col("n")).otherwise(0L))
        .as("agree"))
    val peNum = cm.groupBy(col("lang")).agg(sum(col("n")).as("rn"))
      .join(cm.groupBy(col("pred_lang")).agg(sum(col("n")).as("cn")),
        col("lang") === col("pred_lang"))
      .agg(coalesce(sum(col("rn") * col("cn")), lit(0L)).as("pe_num"))
    tot.crossJoin(peNum)
      .select(col("total"), col("agree"), col("pe_num"),
        ((col("total") * col("agree") - col("pe_num")).cast("double")
          / (col("total") * col("total") - col("pe_num")).cast("double"))
          .as("kappa"))
  }

  /** Score calibration curve: the en-stopword-density score bucketed
    * into deciles vs the TRUE-label rate per bucket — the reliability
    * diagram that tells you whether a cheap heuristic score can be
    * thresholded as a classifier (monotone frac_en ⇒ yes). Bucket ids
    * are integer arithmetic ((10·hits) div tokens, capped at 9), so
    * both engines bucket identically; output is 10 rows regardless of
    * corpus size.
    */
  private def calibration(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokenCount(col("text")).cast("long")
    val hits = TextFunctions.stopwordCount(col("text"), Stopwords).cast("long")
    Tables(s, dir, "documents")
      .select(col("lang"), toks.as("n_tok"), hits.as("n_sw"))
      .where(col("n_tok") > 0)
      .select(least(lit(9L), expr("(n_sw * 10) div n_tok")).as("bucket"),
        col("lang"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
      .select(col("bucket"), col("n_docs"), col("n_en"),
        (col("n_en").cast("double") / col("n_docs").cast("double")).as("frac_en"))
      .orderBy("bucket")
  }

  private val calibrationOracle: String = s"""WITH d AS (
  SELECT lang, ${reaCount("text, '\\S+'")} AS n_tok,
    ${reaCount(s"text, '\\b(${Stopwords.mkString("|")})\\b'")} AS n_sw
  FROM documents
), b AS (
  SELECT LEAST(9, (CAST(n_sw AS BIGINT) * 10) // CAST(n_tok AS BIGINT)) AS bucket, lang
  FROM d WHERE n_tok > 0
)
SELECT bucket, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
  CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS frac_en
FROM b GROUP BY bucket ORDER BY bucket"""

  private val cohensKappaOracle: String = s"""WITH h AS (
  SELECT doc_id, lang, $langHitsSql, text FROM documents
), cm AS (
  SELECT lang, $predLangCaseSql AS pred_lang, COUNT(*) AS n
  FROM h GROUP BY 1, 2
), t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
    CAST(SUM(CASE WHEN lang = pred_lang THEN n ELSE 0 END) AS BIGINT) AS agree
  FROM cm
), rm AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS rn FROM cm GROUP BY 1),
co AS (SELECT pred_lang, CAST(SUM(n) AS BIGINT) AS cn FROM cm GROUP BY 1),
pe AS (
  SELECT CAST(COALESCE(SUM(rn * cn), 0) AS BIGINT) AS pe_num
  FROM rm JOIN co ON lang = pred_lang
)
SELECT total, agree, pe_num,
  CAST(total * agree - pe_num AS DOUBLE)
    / CAST(total * total - pe_num AS DOUBLE) AS kappa
FROM t, pe"""

  // --- fingerprint / exact dedup ------------------------------------
  private def fingerprintQ(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      substring(TextFunctions.fingerprint(col("text")), 1, 4).as("fp_bucket"))
      .orderBy("doc_id")

  private val fpExpr =
    "md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))"

  private val fingerprintOracle = s"""SELECT doc_id, $fpExpr AS fp,
  substring($fpExpr, 1, 4) AS fp_bucket
FROM documents ORDER BY doc_id"""

  private def dedupExact(s: SparkSession, dir: String): DataFrame =
    TextDedup.exactDupGroups(
      Tables(s, dir, "documents"), "doc_id", TextFunctions.fingerprint(col("text")))
      .orderBy("keeper_id")

  private val dedupExactOracle = s"""SELECT $fpExpr AS dup_key,
  MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY keeper_id"""

  // --- n-gram Jaccard near-dup pairs --------------------------------
  private def jaccard(s: SparkSession, dir: String): DataFrame = {
    // the shingle table feeds three subplans (the sizes agg + both join
    // sides). The two join sides are canonically identical, so
    // ReuseExchange shares their one shuffle-on-shingle; only the sizes
    // agg rescans — a cheap narrow re-shingle. An internal persist was
    // faster in isolation but leaked MEMORY_AND_DISK blocks for the
    // session lifetime (no safe unpersist point inside an operator that
    // returns a lazy frame) and poisoned every query after it in a
    // shared 56-query session — same measured-negative-result story as
    // the LSH signature persists in BASELINE.md.
    val sh = TextDedup.wordShingles(
      Tables(s, dir, "documents"), "doc_id", "text", 3)
    TextDedup.jaccardPairs(sh, 0.5).orderBy("a_id", "b_id")
  }

  private val shingleCtes = """docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, len(w)-2),
      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
  FROM docs WHERE len(w) >= 3
)"""

  /** Shingle document-frequency SPECTRUM — the tuning readout every
    * LSH / prefix-filter dedup deployment reads before sizing bands:
    * all-pairs cost is Σ_shingle df² (the hot head explodes it), while
    * the prefix filter's win rides the rare tail. Per-3-gram df over
    * the distinct (doc, shingle) table, log2-binned via the
    * integer-exact `length(bin(df)) − 1` (no float log near a bin
    * edge), with exact Σdf and Σdf² per bin — the Σdf² column IS the
    * all-pairs candidate count a planner would pay per bin.
    */
  private def shingleStats(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.wordShingles(
      Tables(s, dir, "documents"), "doc_id", "text", 3)
    sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .select((length(bin(col("df"))) - 1).cast("long").as("bin"), col("df"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_shingles"), sum(col("df")).as("sum_df"),
        sum(col("df") * col("df")).as("sum_df2"))
      .orderBy("bin")
  }

  private val shingleStatsOracle = s"""WITH $shingleCtes,
dfx AS (
  SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1
)
SELECT CAST(length(bin(df)) - 1 AS BIGINT) AS bin,
  COUNT(*) AS n_shingles,
  CAST(SUM(df) AS BIGINT) AS sum_df,
  CAST(SUM(df * df) AS BIGINT) AS sum_df2
FROM dfx GROUP BY 1 ORDER BY bin"""

  private val jaccardOracle = s"""WITH $shingleCtes,
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, n_inter, sa.n + sb.n - n_inter AS n_union,
  CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) AS jaccard
FROM p JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= ${D("0.5")}
ORDER BY a_id, b_id"""

  /** [[TextDedup.ppjoinPairs]] graded against the SAME oracle as
    * `d_ngram_jaccard`: prefix filtering must lose no pair (a missed
    * candidate flips the hash) while generating candidates only from
    * rarest-first prefixes — the AllPairs/SSJoin guarantee,
    * hash-enforced every run.
    */
  private def ppjoin(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.wordShingles(
      Tables(s, dir, "documents"), "doc_id", "text", 3)
    TextDedup.ppjoinPairs(sh, 1, 2).orderBy("a_id", "b_id")
  }

  // --- directed containment (asymmetric near-dup) --------------------
  private def containment(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.wordShingles(
      Tables(s, dir, "documents"), "doc_id", "text", 3)
    TextDedup.containmentPairs(sh, 0.8).orderBy("a_id", "b_id")
  }

  private val containmentOracle = s"""WITH $shingleCtes,
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
p AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, n_inter,
  CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS cont_a,
  CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS cont_b
FROM p JOIN sz sa ON a_id = sa.doc_id JOIN sz sb ON b_id = sb.doc_id
WHERE GREATEST(CAST(n_inter AS DOUBLE) / CAST(sa.n AS DOUBLE),
               CAST(n_inter AS DOUBLE) / CAST(sb.n AS DOUBLE)) >= ${D("0.8")}
ORDER BY a_id, b_id"""

  // --- MinHash + LSH candidates -------------------------------------
  private val K = 9
  private val Bands = 3
  private val Rows = 3

  /** Oracle twin of [[TextDedup.minHashSignatures]]'s 4-lanes-per-digest
    * scheme: lane i = substring(md5('<i/4>:' || shingle), (i%4)*8+1, 8).
    */
  private val minhashMins = (0 until K)
    .map(i => s"MIN(substring(md5('${i / 4}:' || shingle), ${(i % 4) * 8 + 1}, 8)) AS h$i")
    .mkString(", ")

  private def minhashLsh(s: SparkSession, dir: String): DataFrame =
    TextDedup.lshCandidates(
      TextDedup.minHashSignatures(
        TextDedup.wordShingles(Tables(s, dir, "documents"), "doc_id", "text", 3), K),
      Bands, Rows)
      .orderBy("a_id", "b_id")

  // --- golden fingerprints for the production-hash (xxhash64) twins --
  // DuckDB has no xxhash64, so the fast twins are graded the
  // etl_generator way: an order-independent fingerprint of the full
  // result (count + pmod-reduced xxhash64 sum + xor) against constants
  // recorded from the committed implementation (tools: graft.GoldenFp).
  // The oracle keys the constants on a corpus discriminator BOTH
  // engines compute identically — sum(length(text)) — so one oracle
  // string grades every test corpus; an unknown corpus yields NULLs
  // and fails loudly rather than vacuously passing.

  /** 1e12: keeps an ANSI-mode BIGINT sum exact for ≤ ~9M rows. */
  private val FpMod = 1000000000000L

  private def goldenFp(result: DataFrame, docs: DataFrame,
      cols: Seq[String]): DataFrame =
    result.agg(
        count(lit(1)).as("n_rows"),
        sum(pmod(xxhash64(cols.map(col): _*), lit(FpMod))).as("hash_sum"),
        expr(s"bit_xor(xxhash64(${cols.mkString(", ")}))").as("hash_xor"))
      .crossJoin( // 1×1
        docs.agg(sum(length(col("text"))).cast("long").as("corpus_len")))

  private def goldenOracle(golden: Map[Long, (Long, Long, Long)]): String = {
    def cse(f: ((Long, Long, Long)) => Long): String = golden.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN $k THEN CAST(${f(v)} AS BIGINT)" }
      .mkString("CASE corpus_len ", " ", " END")
    s"""WITH k AS (SELECT CAST(SUM(length(text)) AS BIGINT) AS corpus_len FROM documents)
SELECT corpus_len, ${cse(_._1)} AS n_rows, ${cse(_._2)} AS hash_sum, ${cse(_._3)} AS hash_xor
FROM k"""
  }

  /** Candidate pairs of the production-hash twin, pre-fingerprint. */
  private[queries] def minhashLshFastPairs(s: SparkSession, dir: String): DataFrame =
    TextDedup.lshCandidatesWith(
      TextDedup.minHashSignaturesWith(
        TextDedup.wordShingles(Tables(s, dir, "documents"), "doc_id", "text", 3), K,
        (i, sh) => xxhash64(lit(i), sh)),
      Bands, Rows, cols => xxhash64(cols: _*))

  /** Production-hash twin of `d_minhash_lsh` (xxhash64 end to end),
    * graded as a golden fingerprint of its full candidate-pair set.
    * Recall ≥ the md5 twin on exact-Jaccard truth is spec-pinned in
    * OperatorsSpec.
    */
  private def minhashLshFast(s: SparkSession, dir: String): DataFrame =
    goldenFp(minhashLshFastPairs(s, dir),
      Tables(s, dir, "documents"), Seq("a_id", "b_id"))

  /** corpus_len -> (n_rows, hash_sum, hash_xor), recorded by GoldenFp. */
  private val minhashFastGolden: Map[Long, (Long, Long, Long)] = Map(
    153156L -> (28L, 13824674706124L, -8357212704011859458L), // sf0.001
    149174L -> (25L, 12606694280402L, 4099790687566794914L), // sf0.01
    1485576L -> (258L, 128680520897329L, -6546949235987285721L)) // sf0.1

  /** sigs → bands → cand CTE chain shared by the candidate-listing and
    * sketch-accuracy oracles.
    */
  private lazy val minhashCandCtes: String = {
    val bandSelects = (0 until Bands).map { b =>
      val key = s"md5(${(0 until Rows).map(r => s"h${b * Rows + r}").mkString(" || ")})"
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sigs"
    }.mkString(" UNION ALL ")
    s"""sigs AS (SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id),
bands AS ($bandSelects),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)"""
  }

  private val minhashOracle: String = s"""WITH $shingleCtes,
$minhashCandCtes
SELECT a_id, b_id FROM cand ORDER BY a_id, b_id"""

  // --- MinHash sketch accuracy (estimate vs exact Jaccard) ------------
  /** Per candidate pair: the MinHash ESTIMATE (matching signature lanes
    * / K) beside the exact shingle-set Jaccard — the sketch-accuracy
    * audit that decides whether K lanes are enough for the dedup
    * threshold in use. The exact side runs only on the CANDIDATE pairs
    * (bounded by the banding), never all-pairs; the estimate side is a
    * K-term lane comparison on the already-aggregated signatures.
    */
  private def minhashAccuracy(s: SparkSession, dir: String): DataFrame = {
    // MEASURED (r10): checkpointing sh/sigs here — eager, lazy, or
    // persist — loses to plain recompute at the graded config (1.72 s
    // inline vs 1.95 s checkpointed @32; the consumers prune different
    // columns and run in parallel inside one DAG, while a shared block
    // forces a serialization point). Keep the r8 inline shape.
    val sh = TextDedup.wordShingles(Tables(s, dir, "documents"), "doc_id", "text", 3)
    val sigs = TextDedup.minHashSignatures(sh, K)
    val cand = TextDedup.lshCandidates(sigs, Bands, Rows)
    val sigA = sigs.select(col("doc_id").as("a_id") +:
      (0 until K).map(i => col(s"h$i").as(s"a_h$i")): _*)
    val sigB = sigs.select(col("doc_id").as("b_id") +:
      (0 until K).map(i => col(s"h$i").as(s"b_h$i")): _*)
    val nMatch = (0 until K).map(i =>
      when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0): Column).reduce(_ + _)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(sh.select(col("doc_id").as("a_id"), col("shingle")), Seq("a_id"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")), Seq("b_id", "shingle"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_inter"))
    // sigs is corpus-sized (one row per doc): no broadcast hint —
    // Catalyst broadcasts while small, shuffles on id once it isn't
    cand
      .join(sigA, Seq("a_id")).join(sigB, Seq("b_id"))
      .select(col("a_id"), col("b_id"), (nMatch.cast("double") / K).as("est_jaccard"))
      .join(inter, Seq("a_id", "b_id"), "left")
      .na.fill(0L, Seq("n_inter"))
      .join(sz.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
      .join(sz.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
      .withColumn("jaccard", col("n_inter").cast("double") /
        (col("na") + col("nb") - col("n_inter")).cast("double"))
      .select(col("a_id"), col("b_id"), col("est_jaccard"), col("jaccard"),
        abs(col("est_jaccard") - col("jaccard")).as("abs_err"))
      .orderBy("a_id", "b_id")
  }

  private val minhashAccuracyOracle: String = {
    val nMatch = (0 until K)
      .map(i => s"(CASE WHEN sa.h$i = sb.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH $shingleCtes,
$minhashCandCtes,
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a_id, c.b_id, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a_id
  JOIN sh sb ON sb.doc_id = c.b_id AND sa.shingle = sb.shingle
  GROUP BY 1, 2
),
est AS (
  SELECT c.a_id, c.b_id, CAST($nMatch AS DOUBLE) / $K AS est_jaccard
  FROM cand c JOIN sigs sa ON sa.doc_id = c.a_id JOIN sigs sb ON sb.doc_id = c.b_id
)
SELECT e.a_id, e.b_id, e.est_jaccard,
  CAST(COALESCE(n_inter, 0) AS DOUBLE)
    / CAST(za.n + zb.n - COALESCE(n_inter, 0) AS DOUBLE) AS jaccard,
  ABS(e.est_jaccard - CAST(COALESCE(n_inter, 0) AS DOUBLE)
    / CAST(za.n + zb.n - COALESCE(n_inter, 0) AS DOUBLE)) AS abs_err
FROM est e
LEFT JOIN inter USING (a_id, b_id)
JOIN sz za ON e.a_id = za.doc_id JOIN sz zb ON e.b_id = zb.doc_id
ORDER BY e.a_id, e.b_id"""
  }

  // --- LSH banding-configuration sweep --------------------------------
  /** Recall/candidate-volume curve across the three (bands, rows)
    * factorizations of the K=9 signature — (1,9) high-precision,
    * (3,3) the production config, (9,1) high-recall — against exact
    * Jaccard ≥ 0.5 ground truth: the dedup-side tuning readout that
    * pairs with s_ivf_recall_curve on the ANN side (the S-curve
    * P(cand) = 1−(1−j^r)^b is theory; this measures it on THIS
    * corpus). The K signatures are computed once per plan; each config
    * is one re-banding group-join; hit counts are pair-set joins —
    * bounded by the banding, never all-pairs. The truth side is the
    * same shared-shingle equi-join d_ngram_jaccard grades.
    */
  private val SweepConfigs = Seq((1, 9), (3, 3), (9, 1))

  private def lshBandSweep(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.wordShingles(
      Tables(s, dir, "documents"), "doc_id", "text", 3)
    // MEASURED (r10): the r9 localCheckpoints on sigs/truth lose to
    // plain recompute at the graded config (4.17 s inline vs 4.57 s
    // checkpointed @32) — the two eager materialization jobs cost more
    // wall than the duplicate subtree evaluation they save at this
    // scale. Keep the r8 inline shape.
    val sigs = TextDedup.minHashSignatures(sh, K)
    val truth = TextDedup.jaccardPairs(sh, 0.5).select(col("a_id"), col("b_id"))
    val tCount = truth.agg(count(lit(1)).as("n_true"))
    val per = SweepConfigs.map { case (b, r) =>
      val cand = TextDedup.lshCandidates(sigs, b, r)
        .select(col("a_id"), col("b_id"))
      cand.agg(count(lit(1)).as("n_cand"))
        .crossJoin(cand.join(truth, Seq("a_id", "b_id"))
          .agg(count(lit(1)).as("n_hits")))
        .select(lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
          col("n_cand"), col("n_hits"))
    }.reduce(_ unionAll _)
    per.crossJoin(broadcast(tCount))
      .select(col("bands"), col("rows_per_band"), col("n_cand"),
        col("n_hits"), col("n_true"),
        (col("n_hits").cast("double") / col("n_true").cast("double"))
          .as("recall"))
      .orderBy("bands")
  }

  private val lshBandSweepOracle: String = {
    def candCte(tag: String, bands: Int, rows: Int): String = {
      val sel = (0 until bands).map { b =>
        val key =
          s"md5(${(0 until rows).map(r => s"h${b * rows + r}").mkString(" || ")})"
        s"SELECT doc_id, $b AS band, $key AS bkey FROM sigs"
      }.mkString(" UNION ALL ")
      s"""bands_$tag AS ($sel),
cand_$tag AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands_$tag a JOIN bands_$tag b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)"""
    }
    val cands = SweepConfigs
      .map { case (b, r) => candCte(s"b$b", b, r) }.mkString(",\n")
    val stats = SweepConfigs.map { case (b, r) =>
      s"""SELECT $b AS bands, $r AS rows_per_band,
    (SELECT COUNT(*) FROM cand_b$b) AS n_cand,
    (SELECT COUNT(*) FROM
      (SELECT a_id, b_id FROM cand_b$b
       INTERSECT SELECT a_id, b_id FROM tr)) AS n_hits"""
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH $shingleCtes,
sigs AS MATERIALIZED (SELECT doc_id, $minhashMins FROM sh GROUP BY doc_id),
$cands,
sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
tr AS MATERIALIZED (
  SELECT a_id, b_id FROM (
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_inter
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2) p
  JOIN sz sa ON p.a_id = sa.doc_id JOIN sz sb ON p.b_id = sb.doc_id
  WHERE CAST(n_inter AS DOUBLE)
    / CAST(sa.n + sb.n - n_inter AS DOUBLE) >= ${D("0.5")}
),
tcount AS (SELECT COUNT(*) AS n_true FROM tr),
stats AS (
  $stats
)
SELECT CAST(bands AS BIGINT) AS bands,
  CAST(rows_per_band AS BIGINT) AS rows_per_band,
  CAST(n_cand AS BIGINT) AS n_cand, CAST(n_hits AS BIGINT) AS n_hits,
  CAST(n_true AS BIGINT) AS n_true,
  CAST(n_hits AS DOUBLE) / CAST(n_true AS DOUBLE) AS recall
FROM stats, tcount ORDER BY bands"""
  }

  // --- winnowing (rolling k-gram) fingerprints ----------------------
  private val WinK = 5
  private val WinW = 4

  private def winnow(s: SparkSession, dir: String): DataFrame =
    TextDedup.winnowingFingerprintsNative(
      Tables(s, dir, "documents"), "doc_id", "text", WinK, WinW, useMd5 = true)
      .orderBy("doc_id", "fp_pos", "fp_hash")

  private val winnowOracle: String = s"""WITH t AS (
  SELECT doc_id, lower(regexp_replace(text, '[^a-zA-Z0-9]+', '', 'g')) AS s
  FROM documents WHERE length(lower(regexp_replace(text, '[^a-zA-Z0-9]+', '', 'g'))) >= ${WinK + WinW - 1}
),
grams AS (
  SELECT doc_id,
    unnest(generate_series(1, length(s) - ${WinK - 1})) AS pos,
    unnest(list_transform(generate_series(1, length(s) - ${WinK - 1}),
      i -> md5(substring(s, i, $WinK)))) AS h
  FROM t
),
keyed AS (
  SELECT doc_id, pos,
    h || '#' || lpad(CAST(99999999 - pos AS VARCHAR), 8, '0') AS key
  FROM grams
),
sel AS (
  SELECT doc_id, pos,
    MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
      ROWS BETWEEN ${WinW - 1} PRECEDING AND CURRENT ROW) AS sel
  FROM keyed
)
SELECT DISTINCT doc_id,
  substring(sel, 1, 32) AS fp_hash,
  99999999 - CAST(substring(sel, 34, 8) AS INT) AS fp_pos
FROM sel WHERE pos >= $WinW
ORDER BY doc_id, fp_pos, fp_hash"""

  /** Fingerprint rows of the production-hash twin, pre-fingerprint. */
  private[queries] def winnowFastRows(s: SparkSession, dir: String): DataFrame =
    TextDedup.winnowingFingerprintsNative(
      Tables(s, dir, "documents"), "doc_id", "text", WinK, WinW, useMd5 = false)

  /** Production-hash twin of `t_winnow_fingerprint` (xxhash64 grams),
    * graded as a golden fingerprint of its full (doc_id, fp_hash,
    * fp_pos) set; WinnowPropsSpec pins the algorithm itself against
    * the declarative twin.
    */
  private def winnowFast(s: SparkSession, dir: String): DataFrame =
    goldenFp(winnowFastRows(s, dir),
      Tables(s, dir, "documents"), Seq("doc_id", "fp_hash", "fp_pos"))

  /** corpus_len -> (n_rows, hash_sum, hash_xor), recorded by GoldenFp. */
  private val winnowFastGolden: Map[Long, (Long, Long, Long)] = Map(
    153156L -> (49244L, 24547920878241765L, -6489990825061680131L), // sf0.001
    149174L -> (48037L, 24056884794075608L, 1453216320713928846L), // sf0.01
    1485576L -> (478317L, 239347424982789879L, 3001072315907605829L)) // sf0.1

  /** One materialization per data dir: the LSH candidate-pair edge
    * list shared by the cluster family (components, star contraction,
    * keeper selection) — built once, written to scratch parquet,
    * re-read thereafter (the GraphQueries co-order precedent; a
    * production near-dup pipeline materializes the candidate edges
    * once and fans every clustering/keeper pass out from them).
    */
  private val materializedCand =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private def lshCand3(s: SparkSession, dir: String): DataFrame = {
    val path = materializedCand.synchronized {
      materializedCand.getOrElseUpdate(dir, {
        val p = graft.util.Scratch.dir("graft_lsh_cand") + "/data"
        TextDedup.lshCandidates(
          TextDedup.minHashSignatures(
            TextDedup.wordShingles(Tables(s, dir, "documents"),
              "doc_id", "text", 3), K),
          Bands, Rows).write.mode("overwrite").parquet(p)
        p
      })
    }
    s.read.parquet(path)
  }

  // --- dedup clusters: LSH candidates → connected components --------
  private def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val cand = lshCand3(s, dir)
    TextDedup.connectedComponents(cand)
      .groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("comp_id")
  }

  /** As [[dedupClusters]] but resolving components with the
    * O(log n)-round large-star/small-star contraction instead of
    * min-label propagation — identical output (comp = component min),
    * so it shares the recursive-CTE oracle. The scale pick: propagation
    * wins on dense low-diameter near-dup clusters (fewer jobs/round),
    * contraction wins when the candidate graph may contain long chains.
    */
  private def dedupClustersStars(s: SparkSession, dir: String): DataFrame = {
    val cand = lshCand3(s, dir)
    TextDedup.connectedComponentsStars(cand)
      .groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy("comp_id")
  }

  /** Shared recursive-CTE prefix: recomputes the LSH candidate pairs,
    * then the transitive closure — `labels(id, comp)` with comp = min
    * reachable id == the propagation fixpoint.
    */
  private val ccLabelsCtes: String = {
    val mins = minhashMins
    val bandSelects = (0 until Bands).map { b =>
      val key = s"md5(${(0 until Rows).map(r => s"h${b * Rows + r}").mkString(" || ")})"
      s"SELECT doc_id, $b AS band, $key AS bkey FROM sigs"
    }.mkString(" UNION ALL ")
    s"""WITH RECURSIVE $shingleCtes,
sigs AS (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
bands AS ($bandSelects),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
edges AS (SELECT a_id AS src, b_id AS dst FROM cand
          UNION SELECT b_id, a_id FROM cand),
reach(id, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON r.id = e.src
),
labels AS (SELECT id, MIN(lbl) AS comp FROM reach GROUP BY id)"""
  }

  private val dedupClustersOracle: String = s"""$ccLabelsCtes
SELECT comp AS comp_id, CAST(COUNT(*) AS BIGINT) AS n_members
FROM labels GROUP BY comp ORDER BY comp_id"""

  // --- keeper selection policy: keep the LONGEST member ---------------
  /** Quality-aware keeper selection: per near-dup cluster, keep the doc
    * with the most tokens (ties → smaller id) instead of the min id —
    * the policy real pipelines want when near-dups differ in
    * completeness. The argmax is ONE struct `max` (toks, -id): exact,
    * map-side combinable, no window — so a monster cluster never sorts
    * in a single task.
    */
  private def clusterKeepers(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val cand = lshCand3(s, dir)
    val toks = docs.select(col("doc_id").as("id"),
      TextFunctions.tokenCount(col("text")).cast("long").as("toks"))
    TextDedup.connectedComponents(cand)
      .join(toks, Seq("id"))
      .groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("n_members"),
        max(struct(col("toks"), (-col("id")).as("nid"))).as("m"))
      .select(col("comp_id"), (-col("m.nid")).as("keeper_id"),
        col("m.toks").as("keeper_tokens"), col("n_members"))
      .orderBy("comp_id")
  }

  private val clusterKeepersOracle: String = s"""$ccLabelsCtes,
toks AS (
  SELECT doc_id AS id, CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS toks
  FROM documents
),
j AS (SELECT l.comp, l.id, t.toks FROM labels l JOIN toks t USING (id)),
r AS (
  SELECT comp, id, toks,
    ROW_NUMBER() OVER (PARTITION BY comp ORDER BY toks DESC, id ASC) AS rn,
    COUNT(*) OVER (PARTITION BY comp) AS n
  FROM j
)
SELECT comp AS comp_id, id AS keeper_id, toks AS keeper_tokens,
  CAST(n AS BIGINT) AS n_members
FROM r WHERE rn = 1 ORDER BY comp_id"""

  // --- capstone: the full training-data cleaning flow ---------------
  /** documents → exact-dedup keepers (keep-first) → quality gate (the
    * `t_quality_filter` criteria) → English only → per-source corpus
    * stats. The composed pipeline every individual operator exists
    * for; one left-semi join + two aggs, all map-side-combinable.
    */
  private def corpusClean(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    val keepers = docs
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val toks = TextFunctions.tokenCount(col("text"))
    val noSpace = length(regexp_replace(col("text"), "\\s+", ""))
    val avgLen = noSpace.cast("double") / toks.cast("double")
    val punctRatio = TextFunctions.punctCount(col("text")).cast("double") /
      length(col("text")).cast("double")
    val stops = TextFunctions.stopwordCount(col("text"), Stopwords)
    docs.join(keepers, Seq("doc_id"), "left_semi")
      .where(toks.between(10, 1000) && avgLen >= 2.0 && avgLen <= 12.0 &&
        punctRatio < 0.2 && stops >= 1 && col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("sum_tokens"))
      .orderBy("source")
  }

  private val corpusCleanOracle: String = {
    val toks = reaCount("text, '\\S+'")
    val noSpace = "length(regexp_replace(text, '\\s+', '', 'g'))"
    val avgLen = s"CAST($noSpace AS DOUBLE) / CAST($toks AS DOUBLE)"
    val punctRatio =
      s"CAST(${reaCount("text, '[^\\w\\s]'")} AS DOUBLE) / CAST(length(text) AS DOUBLE)"
    val stops = reaCount(s"text, '\\b(${Stopwords.mkString("|")})\\b'")
    s"""WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY $fpExpr
), f AS (
  SELECT source, $toks AS toks FROM documents
  WHERE doc_id IN (SELECT doc_id FROM keepers)
    AND $toks BETWEEN 10 AND 1000
    AND $avgLen >= ${D("2")} AND $avgLen <= ${D("12")}
    AND $punctRatio < ${D("0.2")}
    AND $stops >= 1
    AND lang = 'en'
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS sum_tokens
FROM f GROUP BY source ORDER BY source"""
  }

  // --- BPE-ish token count per doc ----------------------------------
  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(
      col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_ws_tokens"),
      TextFunctions.bpeishTokenCount(col("text")).as("n_bpeish_tokens"))
      .orderBy("doc_id")

  private val tokenCountOracle = s"""SELECT doc_id,
  ${reaCount("text, '\\S+'")} AS n_ws_tokens,
  ${reaCount("lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'")} AS n_bpeish_tokens
FROM documents ORDER BY doc_id"""

  // --- RAKE keyword extraction -----------------------------------------
  /** Rapid Automatic Keyword Extraction (Rose et al. '10): candidate
    * phrases are maximal stopword-free token runs; each word scores
    * degree/frequency (degree = Σ lengths of phrases containing it);
    * a phrase scores the sum of its word scores. Word scores are
    * single float divisions off exact counts, floored to 1e-6 units so
    * the per-phrase sum is an integer — no float aggregation order.
    * Phrase segmentation is one per-doc running-sum window over the
    * stopword marks; the word-score table is vocabulary-sized and
    * broadcasts. Top 20 phrases.
    */
  private def rakeKeywords(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dd(c: Column) = c.cast("double")
    val toks = Tables(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "tok")))
    val marked = toks
      .withColumn("st", when(col("tok").isInCollection(Stopwords), 1L).otherwise(0L))
      .withColumn("pid", sum(col("st"))
        .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val cand = marked.where(col("st") === 0)
      .select(col("doc_id"), col("pid"), col("pos"), col("tok"))
    val plen = cand.groupBy(col("doc_id"), col("pid"))
      .agg(count(lit(1)).as("plen"))
    val wfix = cand.join(plen, Seq("doc_id", "pid"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("tok"),
        floor(dd(col("deg")) / dd(col("freq")) * lit(1000000L)).as("fix"))
    val pinst = cand.join(broadcast(wfix), "tok")
      .groupBy(col("doc_id"), col("pid"))
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")), " ").as("phrase"),
        count(lit(1)).as("n_words"), sum(col("fix")).as("sfix"))
    pinst.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occurrences"),
        (dd(max(col("sfix"))) / lit(1000000L)).as("score"))
      .orderBy(col("score").desc, col("phrase")).limit(20)
  }

  private val rakeKeywordsOracle: String = {
    val stopList = Stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
), toks AS (
  SELECT doc_id, unnest(w) AS tok,
    unnest(generate_series(1, len(w))) AS pos
  FROM words
), marked AS (
  SELECT doc_id, pos, tok,
    CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END AS st,
    SUM(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS pid
  FROM toks
), cand AS (
  SELECT doc_id, pid, pos, tok FROM marked WHERE st = 0
), plen AS (
  SELECT doc_id, pid, COUNT(*) AS plen FROM cand GROUP BY 1, 2
), wfix AS (
  SELECT c.tok,
    CAST(FLOOR(CAST(SUM(p.plen) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      * 1000000) AS BIGINT) AS fix
  FROM cand c JOIN plen p ON c.doc_id = p.doc_id AND c.pid = p.pid
  GROUP BY 1
), pinst AS (
  SELECT c.doc_id, c.pid,
    string_agg(c.tok, ' ' ORDER BY c.pos) AS phrase,
    COUNT(*) AS n_words, CAST(SUM(f.fix) AS BIGINT) AS sfix
  FROM cand c JOIN wfix f ON c.tok = f.tok
  GROUP BY 1, 2
)
SELECT phrase, n_words, COUNT(*) AS n_occurrences,
  CAST(MAX(sfix) AS DOUBLE) / 1000000 AS score
FROM pinst GROUP BY phrase, n_words
ORDER BY score DESC, phrase LIMIT 20"""
  }

  // --- Simpson diversity index -------------------------------------------
  /** Simpson's diversity of the token distribution per source:
    * D = Σᵢ nᵢ(nᵢ−1) / (N(N−1)) — the probability two tokens drawn
    * without replacement coincide — plus its inverse (effective
    * vocabulary size). ENTIRELY exact integer arithmetic until two
    * final float divisions, so no entropy-style fixed-point machinery
    * is needed: the concentration twin of t_token_entropy.
    */
  private def simpsonIndex(s: SparkSession, dir: String): DataFrame = {
    def dd(c: Column) = c.cast("double")
    val g = Tables(s, dir, "documents")
      .select(col("source"), explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("ni"))
    g.groupBy(col("source"))
      .agg(sum(col("ni")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("ni") * (col("ni") - lit(1L))).as("coll"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        (dd(col("coll")) / dd(col("n_tokens") * (col("n_tokens") - lit(1L))))
          .as("simpson"),
        (dd(col("n_tokens") * (col("n_tokens") - lit(1L))) / dd(col("coll")))
          .as("effective_types"))
      .orderBy("source")
  }

  private val simpsonIndexOracle = """WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok
  FROM documents
), g AS (
  SELECT source, tok, COUNT(*) AS ni FROM toks GROUP BY 1, 2
), a AS (
  SELECT source, CAST(SUM(ni) AS BIGINT) AS n_tokens, COUNT(*) AS n_types,
    CAST(SUM(ni * (ni - 1)) AS BIGINT) AS coll
  FROM g GROUP BY 1
)
SELECT source, n_tokens, n_types,
  CAST(coll AS DOUBLE) / CAST(n_tokens * (n_tokens - 1) AS DOUBLE) AS simpson,
  CAST(n_tokens * (n_tokens - 1) AS DOUBLE) / CAST(coll AS DOUBLE) AS effective_types
FROM a ORDER BY source"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("t_rake_keywords", rakeKeywords, Some(rakeKeywordsOracle)),
    QueryDef("t_simpson_index", simpsonIndex, Some(simpsonIndexOracle)),
    QueryDef("t_text_stats", stats, Some(statsOracle)),
    QueryDef("t_quality_by_source", quality, Some(qualityOracle)),
    QueryDef("t_langid", langid, Some(langidOracle)),
    QueryDef("t_langid_confusion", langidConfusion, Some(langidConfusionOracle)),
    QueryDef("t_cohens_kappa", cohensKappa, Some(cohensKappaOracle)),
    QueryDef("t_calibration", calibration, Some(calibrationOracle)),
    QueryDef("t_token_count", tokenCount, Some(tokenCountOracle)),
    QueryDef("t_fingerprint", fingerprintQ, Some(fingerprintOracle)),
    QueryDef("d_dedup_exact", dedupExact, Some(dedupExactOracle)),
    QueryDef("d_ngram_jaccard", jaccard, Some(jaccardOracle)),
    QueryDef("d_shingle_stats", shingleStats, Some(shingleStatsOracle)),
    QueryDef("d_ppjoin_pairs", ppjoin, Some(jaccardOracle)),
    QueryDef("d_containment", containment, Some(containmentOracle)),
    QueryDef("d_minhash_lsh", minhashLsh, Some(minhashOracle)),
    QueryDef("d_minhash_accuracy", minhashAccuracy, Some(minhashAccuracyOracle)),
    QueryDef("d_lsh_band_sweep", lshBandSweep, Some(lshBandSweepOracle)),
    QueryDef("d_minhash_lsh_fast", minhashLshFast, Some(goldenOracle(minhashFastGolden))),
    QueryDef("d_dedup_clusters", dedupClusters, Some(dedupClustersOracle)),
    QueryDef("d_dedup_clusters_stars", dedupClustersStars, Some(dedupClustersOracle)),
    QueryDef("d_cluster_keepers", clusterKeepers, Some(clusterKeepersOracle)),
    QueryDef("t_winnow_fingerprint", winnow, Some(winnowOracle)),
    QueryDef("t_winnow_fast", winnowFast, Some(goldenOracle(winnowFastGolden))),
    QueryDef("d_corpus_clean", corpusClean, Some(corpusCleanOracle)))
}
