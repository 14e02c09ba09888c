package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-quality operators a large-scale training-data pipeline runs
  * beyond per-doc stats: intra-document repetition metrics (the
  * Gopher/MassiveText repetition filters), train-vs-eval n-gram
  * decontamination, and deterministic hash-bucket sampling.
  *
  * Everything is codegen'd builtins over exploded token n-grams; the
  * shuffles are keyed on (doc_id, gram) then doc_id, both map-side
  * combinable — no windows, no driver-side state, no UDFs.
  */
object CorpusQuality {

  /** (doc_id, gram) word n-grams WITH multiplicity (unlike
    * [[TextDedup.wordShingles]], which dedups — repetition metrics need
    * the duplicates).
    */
  def ngramOccurrences(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    require(n >= 1)
    df.select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("w"))
      .where(size(col("w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(w)-${n - 1}), i -> concat_ws(' ', ${(0 until n).map(j => s"w[i-1+$j]").mkString(", ")}))"))
        .as("gram"))
  }

  /** Per-document repetition metrics (Gopher filters: docs dominated by
    * a few repeated n-grams are boilerplate/spam):
    * top-bigram fraction (occurrences of the most frequent bigram over
    * all bigram occurrences) and duplicate-trigram fraction
    * (occurrences of trigrams that appear more than once, over all
    * trigram occurrences). Docs with fewer than 2 tokens are skipped;
    * trigram stats are 0 for 2-token docs.
    */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    def grouped(n: Int): DataFrame =
      ngramOccurrences(df, idCol, textCol, n)
        .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("cnt"))
    val bi = grouped(2).groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_bigrams"),
      max(col("cnt")).as("top_bigram_cnt"))
    val tri = grouped(3).groupBy(col("doc_id")).agg(
      sum(col("cnt")).as("n_trigrams"),
      sum(when(col("cnt") > 1, col("cnt")).otherwise(lit(0L))).as("dup_trigram_occ"))
    bi.join(tri, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_bigrams"), col("top_bigram_cnt"),
        (col("top_bigram_cnt").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("dup_trigram_occ"), lit(0L)).as("dup_trigram_occ"),
        when(coalesce(col("n_trigrams"), lit(0L)) === 0, lit(0.0))
          .otherwise(col("dup_trigram_occ").cast("double") / col("n_trigrams").cast("double"))
          .as("dup_trigram_frac"))
  }

  /** Train-vs-eval decontamination: documents of `corpusShingles` that
    * share at least one shingle with `probeShingles` (the held-out /
    * benchmark set), with the count of distinct shared shingles — the
    * standard n-gram-overlap contamination check run before training.
    * Both inputs are (doc_id, shingle) tables as from
    * [[TextDedup.wordShingles]]. The probe side is deduped to a bare
    * shingle set before the join, so Catalyst broadcasts it while the
    * probe corpus is small and shuffles on the shingle hash once it
    * isn't — no code change either way.
    */
  def contaminatedDocs(corpusShingles: DataFrame, probeShingles: DataFrame): DataFrame =
    corpusShingles
      .join(probeShingles.select(col("shingle")).distinct(), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_grams"))

  /** C4/CCNet-style segment-level duplication: cut each document into
    * fixed-`segWords`-word segments (trailing partial segment included),
    * hash each segment, and report per document how many of its segments
    * also occur in at least one OTHER document. The classic "duplicate
    * line fraction" boilerplate signal, generalized to corpora whose
    * text carries no newlines.
    *
    * Scale shape: only 32-byte md5 segment hashes cross the shuffles
    * (never segment text). The segment explode is computed twice (once
    * under the docs-per-hash aggregate, once as the join probe) — the
    * partial-agg subtree differs from the probe subtree so ReuseExchange
    * cannot share them, and re-scanning is the right trade vs persisting
    * inside an operator (which leaks block-manager memory across a
    * shared session). All aggregations are map-side combinable.
    */
  def segmentDuplication(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    val seg = segmentHashes(df, idCol, textCol, segWords)
    val docsPerSeg = seg.groupBy(col("seg_hash"))
      .agg(countDistinct(col("doc_id")).as("n_docs_with"))
    seg.join(docsPerSeg, Seq("seg_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("n_docs_with") > 1, lit(1L)).otherwise(lit(0L)))
          .as("n_dup_segments"))
      .withColumn("dup_segment_frac",
        col("n_dup_segments").cast("double") / col("n_segments").cast("double"))
  }

  /** (doc_id, seg_hash) for fixed-width word segments — the shared
    * explode under [[segmentDuplication]] and
    * [[incrementalSegmentDedup]]. Only 32-byte hashes leave the scan.
    */
  private def segmentHashes(df: DataFrame, idCol: String, textCol: String,
      segWords: Int): DataFrame = {
    require(segWords >= 1)
    df.select(col(idCol).as("doc_id"), split(trim(col(textCol)), "\\s+").as("w"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, (size(w) + ${segWords - 1}) div $segWords - 1), " +
          s"i -> md5(concat_ws(' ', slice(w, i * $segWords + 1, $segWords))))"))
        .as("seg_hash"))
  }

  /** Incremental (continual-ingestion) near-dedup: grade each NEW-batch
    * document against the already-accepted corpus by segment overlap —
    * keep iff strictly fewer than `keepBelowPct`% of its fixed-width
    * word segments already exist in the corpus. This is the shape a
    * 100 TB pipeline actually runs when a new crawl shard lands: the
    * corpus side is a pre-deduped DISTINCT seg-hash index (32-byte
    * keys, incrementally maintainable as a bucketed table), the new
    * batch is tiny relative to it, and the only join is hash-keyed —
    * never text-keyed, never all-pairs, never a rescan of corpus text.
    *
    * The keep decision is exact integer math (`n_known · 100 <
    * n_segments · pct`) so the boundary can never drift between
    * engines.
    *
    * Output: one row per new doc — doc_id, n_segments,
    * n_known_segments, keep.
    */
  def incrementalSegmentDedup(newDf: DataFrame, corpusDf: DataFrame,
      idCol: String, textCol: String, segWords: Int,
      keepBelowPct: Int = 50): DataFrame = {
    require(keepBelowPct >= 0 && keepBelowPct <= 100)
    val newSeg = segmentHashes(newDf, idCol, textCol, segWords)
    val known = segmentHashes(corpusDf, idCol, textCol, segWords)
      .select(col("seg_hash")).distinct()
      .withColumn("_known", lit(1L))
    newSeg.join(known, Seq("seg_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(coalesce(col("_known"), lit(0L))).as("n_known_segments"))
      .withColumn("keep",
        col("n_known_segments") * 100 < col("n_segments") * keepBelowPct)
  }

  /** Sequence-packing planner (the GPT-style concat-and-chunk step that
    * turns a filtered corpus into fixed-budget training sequences):
    * assign every document a shard (content hash — shard membership is
    * retry/growth-stable), give each shard a deterministic document
    * order (a second, independent content hash — the "global shuffle"),
    * then lay documents head-to-tail and chunk at `budget` tokens.
    * Emitted per doc: `shard`, `pack_id` (the sequence its first token
    * lands in), `offset_in_pack`.
    *
    * Scale shape: ONE hash-partitioned sort per shard (the sort packing
    * inherently requires), as a window cumsum keyed on `shard` — pick
    * `shards` ≈ the output file count so each window task holds one
    * shard; no global single-task window, no driver state. The running
    * sum is exact BIGINT token counts.
    */
  def packSequences(df: DataFrame, idCol: String, tokens: Column,
      shards: Int, budget: Long): DataFrame = {
    require(shards > 0 && budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("pack_key"))
    df.withColumn("shard", pmod(hashByte(lit("shard"), col(idCol)), lit(shards)))
      .withColumn("pack_key",
        md5(concat(lit("pack:"), col(idCol).cast("string"))))
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("_start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("pack_id", expr(s"_start_tok div ${budget}L"))
      .withColumn("offset_in_pack", pmod(col("_start_tok"), lit(budget)))
      .drop("_start_tok", "pack_key")
  }

  /** PII patterns portable across Java regex (Spark) and RE2 (DuckDB,
    * and most log/scrub tooling): plain character classes and bounded
    * repetition only — no lookaround, no `\d`/`\b` shorthand drift.
    *
    * The phone pattern demands phone-shaped STRUCTURE, not just a long
    * digit run — one of: international (`+` then 7-15 digits with
    * spaces/dashes/parens), parenthesized area code, or the 3-3-4
    * separator layout. A bare `[0-9][0-9 -]{5,}` alternative would also
    * claim ISO dates (2024-08-12), order/ID numbers, and numeric table
    * rows — at corpus scale that rewrites non-PII training text.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "([+][0-9][0-9 ()-]{5,16}[0-9])" + // +1-555-000-1234 / +33 6 12 34 56 78
    "|([(][0-9]{2,4}[)][ .-]?[0-9][0-9 .-]{3,10}[0-9])" + // (555) 123-4567
    "|([0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4})" // 555-123-4567 / 555.123.4567
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII redaction for training corpora: masks emails, then phone-shaped
    * digit runs, then IPv4 literals (order matters — the email local
    * part and the IP octets both contain digits a phone pattern could
    * otherwise claim). Pure `regexp_replace` chain: codegen'd, no UDF,
    * no shuffle — runs at scan speed on 100 TB.
    */
  /** Character-bigram language-model scoring (the CCNet/Wenzek-style
    * "train a small LM on the corpus, rank docs by cross-entropy"
    * filter, reduced to its engine shape): per-doc average negative
    * log-probability under an add-one-smoothed char-bigram model
    * trained on the whole input. High `avg_nll` = improbable character
    * sequences = gibberish/boilerplate candidates.
    *
    * Scale shape: the model is bounded by vocab² DISTINCT bigrams (a
    * few k rows for alphabetic corpora — broadcast at any corpus
    * size; for CJK-scale vocabs swap in word-level or cap the table),
    * so training is ONE map-side-combined count shuffle over the
    * exploded bigrams and scoring is a broadcast join + per-doc agg —
    * nothing quadratic, nothing driver-side.
    *
    * Oracle parity: each bigram's log-prob is quantized to micro-nats
    * (`floor(ln(p)·1e6)` as BIGINT) BEFORE the per-doc sum, so the
    * aggregate is exact integer math in any accumulation order; the
    * only cross-engine trust is `ln` itself on identical doubles.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), lower(col(textCol)).as("s"))
      .where(length(col("s")) >= 2)
    val bi = docs.select(col("doc_id"),
      explode(graft.plans.CharNGrams.of(col("s"), 2)).as("bg"))
    // per-(doc, bigram) counts FIRST: the model derivation and the
    // scoring pass both consume this identical aggregate subtree, so
    // ReuseExchange runs the gram explode + its shuffle ONCE for the
    // whole query (the jaccard shared-Exchange shape; a persist here
    // would instead leak blocks across the session — BASELINE.md's
    // measured negative result)
    val dbg = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val c2 = dbg.groupBy(col("bg")).agg(sum(col("cnt")).as("n2"))
    val c1 = c2.groupBy(substring(col("bg"), 1, 1).as("a")).agg(sum(col("n2")).as("n1"))
    val v = c2.select(countDistinct(substring(col("bg"), 2, 1)).as("vs"))
    val model = c2
      .join(c1, substring(col("bg"), 1, 1) === col("a"))
      .crossJoin(broadcast(v)) // 1 row
      .select(col("bg"),
        floor(log((col("n2").cast("double") + 1) /
          (col("n1").cast("double") + col("vs").cast("double"))) * 1000000)
          .cast("long").as("lp"))
    dbg.join(broadcast(model), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        (-sum(col("lp") * col("cnt"))).as("nll_micro"))
      .withColumn("avg_nll",
        col("nll_micro").cast("double") / col("n_bigrams").cast("double") / 1000000)
  }

  /** Kneser-Ney smoothed char-bigram LM scoring (Kneser & Ney 1995,
    * absolute discounting d = 3/4) — the stronger-smoothing sibling of
    * [[bigramLmScore]], and the smoothing real LM-based quality filters
    * (CCNet's KenLM) actually use:
    *
    *   P(b|a) = max(c(ab)−d, 0)/c(a·) + (d·N1+(a·)/c(a·)) · N1+(·b)/N1+(··)
    *
    * The continuation weight scores how many CONTEXTS a character
    * follows, not how often — the novel-continuation insight. Every
    * input is an exact integer count (bigram counts, distinct-follower /
    * distinct-predecessor / distinct-type cardinalities); the
    * probability is ONE fixed double tree (d = 0.75 is exact binary),
    * per-bigram log-probs are floored to micro-nats BEFORE the per-doc
    * sum, so totals are order-independent integers. Same
    * shared-Exchange / broadcast-model dataflow as [[bigramLmScore]]:
    * the model is ≤ |charset|² rows at any corpus size.
    */
  def kneserNeyScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), lower(col(textCol)).as("s"))
      .where(length(col("s")) >= 2)
    val bi = docs.select(col("doc_id"),
      explode(graft.plans.CharNGrams.of(col("s"), 2)).as("bg"))
    val dbg = bi.groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
    val c2 = dbg.groupBy(col("bg")).agg(sum(col("cnt")).as("n2"))
    val c1 = c2.groupBy(substring(col("bg"), 1, 1).as("a"))
      .agg(sum(col("n2")).as("n1"), count(lit(1)).as("nfol"))
    val cont = c2.groupBy(substring(col("bg"), 2, 1).as("bb"))
      .agg(count(lit(1)).as("nprec"))
    val types = c2.agg(count(lit(1)).as("ntypes"))
    val p =
      greatest(col("n2").cast("double") - lit(0.75), lit(0.0)) /
        col("n1").cast("double") +
      ((lit(0.75) * col("nfol").cast("double")) / col("n1").cast("double")) *
        (col("nprec").cast("double") / col("ntypes").cast("double"))
    val model = c2
      .join(c1, substring(col("bg"), 1, 1) === col("a"))
      .join(cont, substring(col("bg"), 2, 1) === col("bb"))
      .crossJoin(broadcast(types)) // 1 row
      .select(col("bg"),
        floor(log(p) * 1000000).cast("long").as("lp"))
    dbg.join(broadcast(model), Seq("bg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_bigrams"),
        (-sum(col("lp") * col("cnt"))).as("nll_micro"))
      .withColumn("avg_nll",
        col("nll_micro").cast("double") / col("n_bigrams").cast("double") / 1000000)
  }

  /** DSIR-style importance weights (Xie et al., "Data Selection via
    * Importance Resampling", reduced to its engine shape): per-doc
    * log importance weight Σ_tokens [ln p_target(b) − ln p_raw(b)]
    * over hashed token features, where `isTarget` marks the rows that
    * define the target distribution (e.g. a trusted high-quality
    * slice) and raw = the whole input. Docs whose hashed-feature
    * profile looks like the target get positive `avg_logw`; resample
    * proportional to the weight (compose with [[hashBucketMember]]
    * for the deterministic selection step).
    *
    * Features are md5-bucketed (`buckets` ≤ 65536: the bucket is the
    * first hex nibbles of md5(token) — portable to any engine), so
    * the model is `buckets` rows — broadcast at any corpus size.
    * Same scale/parity contract as [[bigramLmScore]]: one
    * map-side-combined count shuffle to train, a broadcast join to
    * score, per-token log-ratios quantized to micro-nat BIGINTs
    * before the exact per-doc sum.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 256): DataFrame = {
    require(buckets == 16 || buckets == 256 || buckets == 4096 || buckets == 65536,
      "buckets must be a power of 16 (whole md5 hex nibbles)")
    val nibbles = (math.log(buckets) / math.log(16)).round.toInt
    val feat = df
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .withColumn("b", conv(substring(md5(col("tok")), 1, nibbles), 16, 10)
        .cast("int"))
      .drop("tok")
      // per-(doc, bucket) counts first — the model derivation and the
      // scoring pass share this aggregate subtree via ReuseExchange, so
      // the token explode runs once (same shape as bigramLmScore;
      // is_t is doc-functional so it rides the grouping key)
      .groupBy(col("doc_id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val counts = feat.groupBy(col("b")).agg(
      sum(col("cnt")).as("n_raw"),
      sum(when(col("is_t"), col("cnt")).otherwise(0L)).as("n_t"))
    val totals = counts.agg(sum(col("n_raw")).as("tot_raw"), sum(col("n_t")).as("tot_t"))
    val model = counts.crossJoin(broadcast(totals)) // 1 row
      .select(col("b"),
        floor((log((col("n_t").cast("double") + 1) /
            (col("tot_t").cast("double") + buckets)) -
          log((col("n_raw").cast("double") + 1) /
            (col("tot_raw").cast("double") + buckets))) * 1000000)
          .cast("long").as("lw"))
    feat.join(broadcast(model), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_feats"),
        sum(col("lw") * col("cnt")).as("logw_micro"))
      .withColumn("avg_logw",
        col("logw_micro").cast("double") / col("n_feats").cast("double") / 1000000)
  }

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-kind PII match counts + the redacted text in ONE pass over the
    * replace chain (audit/reporting side of [[redactPii]]): each
    * intermediate redaction stage is its own projection column consumed
    * twice (by its count and by the next stage), which stops Catalyst's
    * CollapseProject from inlining it — so each of the three
    * `regexp_replace`s runs exactly once per row, where expressing the
    * counts over nested replace chains re-ran the email/phone replaces
    * up to 3×. Adds `n_emails`, `n_phones`, `n_ips`, `redacted`.
    */
  def piiAudit(df: DataFrame, text: Column): DataFrame =
    df.withColumn("_no_email", regexp_replace(text, EmailRe, "<EMAIL>"))
      .withColumn("_no_phone", regexp_replace(col("_no_email"), PhoneRe, "<PHONE>"))
      .withColumn("n_emails", regexp_count(text, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(col("_no_email"), lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(col("_no_phone"), lit(Ipv4Re)))
      .withColumn("redacted", regexp_replace(col("_no_phone"), Ipv4Re, "<IP>"))
      .drop("_no_email", "_no_phone")

  /** First byte (0-255) of `md5(<strata>:<id>)` — the shared primitive
    * behind [[hashBucketMember]] and [[mixtureOversample]]'s fractional
    * emit.
    */
  def hashByte(strata: Column, id: Column): Column =
    conv(substring(md5(concat(strata, lit(":"), id.cast("string"))), 1, 2), 16, 10)
      .cast("int")

  /** Deterministic stratified train/val/test split: assigns each row a
    * split label from its [[hashByte]] — `[0, trainUpTo)` → train,
    * `[trainUpTo, valUpTo)` → val, the rest → test. Content-hash
    * assignment (not `rand()`): a doc keeps its split under retries,
    * re-partitioning, re-runs, AND as the corpus grows (new docs never
    * move old docs between splits — the property every training
    * pipeline needs for leak-free eval). Stratifying by `strata` keeps
    * the ratio per slice. Pure projection, no shuffle.
    */
  def assignSplit(df: DataFrame, strataCol: String, idCol: String,
      trainUpTo: Int = 204, valUpTo: Int = 230): DataFrame = {
    require(0 < trainUpTo && trainUpTo <= valUpTo && valUpTo <= 256)
    val h = hashByte(col(strataCol), col(idCol))
    df.withColumn("split",
      when(h < trainUpTo, "train").when(h < valUpTo, "val").otherwise("test"))
  }

  /** Data-mixture oversampling: replicate each row according to its
    * stratum's target weight, expressed EXACTLY as
    * `whole + thresholdByte/256` — a doc is emitted `whole` times, plus
    * once more iff its [[hashByte]] falls below `thresholdByte`. All
    * integer arithmetic on a content hash: the same doc gets the same
    * copy count under retries, re-partitioning, and in any engine —
    * `rand()`-based mixing does not. Weight 0 (= (0,0)) drops the
    * stratum entirely.
    *
    * Output = input columns + `copy` (1-based). Scale shape: a pure
    * projection + explode, no shuffle at all; the blow-up factor is the
    * mixture weight itself.
    */
  def mixtureOversample(df: DataFrame, strataCol: String, idCol: String,
      weights: Map[String, (Int, Int)], default: (Int, Int) = (1, 0)): DataFrame = {
    require((weights.values ++ Seq(default)).forall {
      case (w, t) => w >= 0 && t >= 0 && t <= 256 })
    val whole = weights.foldLeft(lit(default._1)) { case (acc, (k, (w, _))) =>
      when(col(strataCol) === k, lit(w)).otherwise(acc) }
    val thr = weights.foldLeft(lit(default._2)) { case (acc, (k, (_, t))) =>
      when(col(strataCol) === k, lit(t)).otherwise(acc) }
    val reps = whole +
      when(hashByte(col(strataCol), col(idCol)) < thr, lit(1)).otherwise(lit(0))
    df.withColumn("__graft_reps", reps)
      .withColumn("copy", explode(expr(
        "transform(array_repeat(1, __graft_reps), (x, i) -> i + 1)")))
      .drop("__graft_reps")
  }

  /** Deterministic hash-bucket membership: true iff the first byte of
    * `md5(<strata>:<id>)` falls below `threshold` (of 256). Stable
    * across runs, engines, and partitionings — the reproducible way to
    * carve a fixed-rate per-stratum sample out of 100 TB (vs `rand()`,
    * which changes under retry/re-partitioning).
    */
  def hashBucketMember(strata: Column, id: Column, threshold: Int): Column =
    conv(substring(md5(concat(strata, lit(":"), id.cast("string"))), 1, 2), 16, 10)
      .cast("int") < threshold

  /** Per-document Shannon token entropy (bits) — the information-density
    * quality signal that complements the Gopher repetition filters:
    * near-zero entropy flags boilerplate/keyword-stuffed documents even
    * when no single n-gram dominates. Output: (doc_id, n_tokens,
    * n_types, entropy_bits); empty documents produce no row.
    *
    * Scale shape: the token explode groups on (doc_id, md5(token)) so
    * only fixed 32-byte hashes cross the shuffle (never token text), and
    * both aggregations are map-side combinable. Determinism shape: each
    * −p·log2(p) term is rounded to integer micro-bits BEFORE the sum, so
    * the per-doc total is an order-independent integer sum — aggregation
    * order (Spark task order vs any oracle's) can never flip the output.
    * Residual risk is per-TERM only: two engines' log2 may differ in the
    * last ulp, which flips a micro-bit term only when the true value
    * lands within ~1e-10 of a rounding boundary — per-term probability
    * ~1e-10, absorbed for any realistic corpus but not a hard guarantee
    * the way the 2-dp round2 pattern's 1e-2 granularity is.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = df
      .select(col(idCol).as("doc_id"),
        explode(split(trim(col(textCol)), "\\s+")).as("tok"))
      .where(length(col("tok")) > 0)
      .groupBy(col("doc_id"), md5(col("tok").cast("binary")).as("tok_h"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_types"))
    val p = col("c").cast("double") / col("n").cast("double")
    counts.join(totals, Seq("doc_id"))
      .withColumn("term_micro",
        floor(-(p * log2(p)) * 1e6 + 0.5).cast("long"))
      .groupBy(col("doc_id"))
      .agg(max(col("n")).as("n_tokens"), max(col("n_types")).as("n_types"),
        (sum(col("term_micro")).cast("double") / 1e6).as("entropy_bits"))
  }
}
