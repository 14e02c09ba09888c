package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{CorpusQuality, TextDedup}
import Sql.D

/** Corpus-hygiene surface over `documents`: Gopher-style repetition
  * metrics, train-vs-eval n-gram decontamination, and deterministic
  * hash-bucket sampling — the pre-training gates that run BEFORE
  * dedup/quality filtering at 100 TB. Every query has a DuckDB oracle
  * twin restating the same integer-exact math.
  */
object CorpusQueries {

  // --- Gopher repetition metrics ------------------------------------
  private def repetition(s: SparkSession, dir: String): DataFrame =
    CorpusQuality.repetitionMetrics(Tables(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  private def gramCte(n: Int, name: String): String = {
    val concatExpr = (0 until n)
      .map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
    s"""$name AS (
  SELECT doc_id,
    unnest(list_transform(generate_series(1, len(w)-${n - 1}), i -> $concatExpr)) AS gram
  FROM docs WHERE len(w) >= $n
)"""
  }

  private val repetitionOracle: String = s"""WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
${gramCte(2, "bi")},
${gramCte(3, "tri")},
bic AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM bi GROUP BY 1, 2),
tric AS (SELECT doc_id, gram, COUNT(*) AS cnt FROM tri GROUP BY 1, 2),
bis AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
    CAST(MAX(cnt) AS BIGINT) AS top_bigram_cnt
  FROM bic GROUP BY 1
),
tris AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_trigrams,
    CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_trigram_occ
  FROM tric GROUP BY 1
)
SELECT b.doc_id, n_bigrams, top_bigram_cnt,
  CAST(top_bigram_cnt AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS top_bigram_frac,
  COALESCE(n_trigrams, 0) AS n_trigrams,
  COALESCE(dup_trigram_occ, 0) AS dup_trigram_occ,
  CASE WHEN COALESCE(n_trigrams, 0) = 0 THEN ${D("0")}
    ELSE CAST(dup_trigram_occ AS DOUBLE) / CAST(n_trigrams AS DOUBLE)
  END AS dup_trigram_frac
FROM bis b LEFT JOIN tris USING (doc_id)
ORDER BY doc_id"""

  // --- decontamination ----------------------------------------------
  /** The "eval set" stand-in: every 97th document. Real use passes the
    * benchmark corpus as the probe side; the dataflow is identical.
    */
  private val ProbeMod = 97
  private val ContamN = 5

  private def contamination(s: SparkSession, dir: String): DataFrame = {
    val sh = TextDedup.wordShingles(Tables(s, dir, "documents"), "doc_id", "text", ContamN)
    CorpusQuality.contaminatedDocs(
      sh.where(pmod(col("doc_id"), lit(ProbeMod)) =!= 0),
      sh.where(pmod(col("doc_id"), lit(ProbeMod)) === 0))
      .orderBy("doc_id")
  }

  private val contaminationOracle: String = s"""WITH docs AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
    unnest(list_transform(generate_series(1, len(w)-${ContamN - 1}),
      i -> ${(0 until ContamN).map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")})) AS shingle
  FROM docs WHERE len(w) >= $ContamN
),
probe AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % $ProbeMod = 0)
SELECT doc_id, COUNT(*) AS n_shared_grams
FROM sh JOIN probe USING (shingle)
WHERE doc_id % $ProbeMod <> 0
GROUP BY doc_id ORDER BY doc_id"""

  // --- deterministic stratified sampling ----------------------------
  /** Keep ≈20% per source (first md5 byte < 51 of 256) — reproducible
    * under retries and re-partitioning, unlike `rand()`-based sampling.
    */
  private val SampleThreshold = 51

  private def hashSample(s: SparkSession, dir: String): DataFrame = {
    val member = CorpusQuality.hashBucketMember(
      col("source"), col("doc_id"), SampleThreshold)
    Tables(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(member, 1L).otherwise(0L)).as("n_sampled"))
      .withColumn("sample_frac",
        col("n_sampled").cast("double") / col("n_docs").cast("double"))
      .orderBy("source")
  }

  private val hashSampleOracle: String = {
    val nib = (i: Int) =>
      s"(strpos('0123456789abcdef', substring(md5(source || ':' || CAST(doc_id AS VARCHAR)), $i, 1)) - 1)"
    s"""SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(CASE WHEN ${nib(1)} * 16 + ${nib(2)} < $SampleThreshold THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
  CAST(SUM(CASE WHEN ${nib(1)} * 16 + ${nib(2)} < $SampleThreshold THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS sample_frac
FROM documents GROUP BY source ORDER BY source"""
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("t_repetition", repetition, Some(repetitionOracle)),
    QueryDef("d_contamination", contamination, Some(contaminationOracle)),
    QueryDef("t_sample_hash", hashSample, Some(hashSampleOracle)))
}
