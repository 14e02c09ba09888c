package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines —
  * all built on codegen'd `org.apache.spark.sql.functions` (no UDFs), so
  * they stay inside WholeStageCodegen and scale per-partition with zero
  * shuffle.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation
    * marks each count as one token (a cheap, deterministic proxy for
    * subword tokenizers when budgeting corpus token counts).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(regexp_extract_all(text, lit(s"\\b(${stopwords.mkString("|")})\\b"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0)))

  /** Normalized document fingerprint: lowercase, collapse every
    * non-alphanumeric run to one space, trim, md5. Stable under
    * whitespace/punctuation noise — the exact-dedup key for noisy crawls.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")))

  /** Stopword-hit language ID. `profiles` maps language code → its most
    * frequent function words; the guess is the profile with the most hits
    * (ties broken by profile order — keep the order fixed for
    * determinism).
    */
  def languageGuess(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val hits = profiles.map { case (lang, words) =>
      lang -> stopwordCount(text, words)
    }
    // lang_i wins if its hits >= all later profiles' hits (earlier
    // profiles already had their chance) — a fixed CASE chain.
    hits.zipWithIndex.init.foldRight(lit(hits.last._1)) {
      case (((lang, h), i), acc) =>
        val laterHits = hits.drop(i + 1).map(_._2)
        when(laterHits.foldLeft(lit(true))((c, other) => c && h >= other), lang)
          .otherwise(acc)
    }
  }

  /** Default language profiles (function words only, all lowercase). */
  val DefaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit"),
    "fr" -> Seq("le", "les", "des", "et", "une", "dans", "pour"))
}
