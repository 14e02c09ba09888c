package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval — the sparse counterpart of the dense
  * ANN operators in [[Similarity]]. Okapi BM25 with Lucene's
  * always-positive idf, `ln(1 + (N - df + 0.5)/(df + 0.5))`, and the
  * `(k1+1)` numerator.
  *
  * Scale shape: the query-term list is tiny and broadcast twice (once
  * to filter the posting rows, once as the per-term df side), so the
  * only large shuffles are the posting-list build (doc_id, term) and
  * the doc-length join on doc_id; corpus-level stats ride along as a
  * broadcast 1-row crossJoin. The final per-query top-k uses the
  * bounded [[graft.functions.TopKPairs]] partial aggregate — never a
  * global row_number window over all scored rows.
  *
  * Cross-engine determinism: scores mix `ln` and float sums whose
  * addend order differs between engines, so ranking happens on the
  * score quantized to 1e-4 (exact integer compare, doc_id tie-break) —
  * the same integer-exact discipline as the cosine operators.
  */
object Retrieval {

  /** Posting list with term frequencies: (doc_id, term, tf) from
    * whitespace tokens.
    */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-`k` documents per query under BM25(k1, b). `queries` is a
    * small in-memory list of (q_id, terms) — duplicate query terms are
    * ignored, as in standard short-query BM25. Returns
    * (q_id, rank, doc_id, score) with score rounded to 4 dp.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val tf = termFrequencies(docs, idCol, textCol)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    val qterms = queries.flatMap { case (q, ts) => ts.distinct.map(q -> _) }
      .toDF("q_id", "term")
    // df only for the query terms: tiny after the broadcast semi-filter
    val dfreq = tf.join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

    def d(c: Column): Column = c.cast("double")
    val avgdl = d(col("total_dl")) / d(col("n_docs"))
    val idf = log(lit(1.0) +
      (d(col("n_docs")) - d(col("df")) + lit(0.5)) / (d(col("df")) + lit(0.5)))
    val tfNorm = d(col("tf")) * (lit(k1) + lit(1.0)) /
      (d(col("tf")) + lit(k1) * (lit(1.0) - lit(b) + lit(b) * d(col("dl")) / avgdl))

    val scored = tf
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(corpus))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(idf * tfNorm).as("s"))
      .select(col("q_id"), col("doc_id"),
        floor(col("s") * 10000 + 0.5).cast("long").as("sq"))

    scored.groupBy(col("q_id"))
      .agg(graft.functions.TopKPairs.topK(k)(
        d(col("sq")), col("doc_id").cast("long")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("p", "x")))
      .select(col("q_id"), (col("p") + 1).cast("long").as("rank"),
        col("x._2").as("doc_id"), (col("x._1") / 10000.0).as("score"))
  }
}
