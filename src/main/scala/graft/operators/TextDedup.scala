package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, Spark-first:
  *
  *   - exact dedup: one hash-groupBy — a single shuffle on a 32-byte key
  *     regardless of document size (group on `md5(text)`, never on the
  *     raw text: at 100 TB the shuffle moves hashes, not documents);
  *   - n-gram Jaccard: exact pairwise similarity via a shingle self-join —
  *     correct but quadratic in docs-per-shingle, so it's the VERIFIER,
  *     not the discoverer, at scale;
  *   - MinHash + LSH banding: the scale path — per-doc signatures (one
  *     groupBy), band-bucket join that only pairs plausible near-dups.
  *     Hashes are md5 strings so results are engine-portable and
  *     deterministic (no JVM-specific hashCode anywhere).
  *
  * The intended 100 TB flow: LSH candidates → exact Jaccard on candidates
  * only → connected components/keeper selection.
  */
object TextDedup {

  /** (id, shingle) pairs: distinct word n-grams per document. */
  def wordShingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1)
    df.select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w)-${n - 1}), i -> concat_ws(' ', ${(0 until n).map(j => s"w[i-1+$j]").mkString(", ")}))"))
        .as("shingle"))
      .distinct()
  }

  /** Exact-duplicate groups keyed on a text hash: (key, keeper_id,
    * n_copies). Keeper = min id, the reference policy for "keep first".
    */
  def exactDupGroups(df: DataFrame, idCol: String, keyExpr: Column): DataFrame =
    df.groupBy(keyExpr.as("dup_key"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact pairwise n-gram Jaccard over a shingle table
    * ((doc_id, shingle), as from [[wordShingles]]): pairs with
    * jaccard >= threshold. Shingle-set sizes are broadcast (they're one
    * row per doc); the self-join shuffles on the shingle string.
    */
  def jaccardPairs(shingles: DataFrame, threshold: Double): DataFrame = {
    val sizes = shingles.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = shingles.select(col("doc_id").as("a_id"), col("shingle"))
    val b = shingles.select(col("doc_id").as("b_id"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .where(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("doc_id").as("a_id"), col("n").as("_na"))), Seq("a_id"))
      .join(broadcast(sizes.select(col("doc_id").as("b_id"), col("n").as("_nb"))), Seq("b_id"))
      .withColumn("n_union", col("_na") + col("_nb") - col("n_inter"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / col("n_union").cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("n_inter"), col("n_union"), col("jaccard"))
  }

  /** MinHash signatures: k independent min-hashes per doc, each the MIN of
    * `md5("<i>:" || shingle)` — one groupBy with k min-aggregates (single
    * shuffle, map-side partials).
    */
  def minHashSignatures(shingles: DataFrame, k: Int): DataFrame =
    shingles.groupBy(col("doc_id")).agg(
      min(md5(concat(lit("0:"), col("shingle")))).as("h0"),
      (1 until k).map(i =>
        min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i")): _*)

  /** LSH banding over [[minHashSignatures]] output: docs sharing any
    * band-key (md5 of that band's signature slice) become candidate
    * pairs. Probability a pair with Jaccard j collides:
    * 1 − (1 − j^rows)^bands.
    */
  def lshCandidates(sigs: DataFrame, bands: Int, rows: Int): DataFrame = {
    val bandStructs = (0 until bands).map { b =>
      val key = md5(concat((0 until rows).map(r => col(s"h${b * rows + r}")): _*))
      struct(lit(b).as("band"), key.as("bkey"))
    }
    val bandsDf = sigs.select(col("doc_id"),
      explode(array(bandStructs: _*)).as("x"))
      .select(col("doc_id"), col("x.band").as("band"), col("x.bkey").as("bkey"))
    bandsDf.select(col("band"), col("bkey"), col("doc_id").as("a_id"))
      .join(bandsDf.select(col("band"), col("bkey"), col("doc_id").as("b_id")),
        Seq("band", "bkey"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }
}
