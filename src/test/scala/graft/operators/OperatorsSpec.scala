package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

/** Dedup / similarity / multimodal operator behavior on controlled
  * fixtures (testdata-driven checks live in the oracle gate).
  */
class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups duplicates under whitespace/punct noise") {
    val docs = Seq(
      (1L, "Hello, world!"),
      (2L, "hello   WORLD"),
      (3L, "entirely different text")).toDF("doc_id", "text")
    val groups = TextDedup.exactDupGroups(docs, "doc_id",
      TextFunctions.fingerprint(col("text")))
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(groups == Set((1L, 2L), (3L, 1L)))
  }

  test("jaccard pairs finds planted near-dups and skips unrelated docs") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val nearDup = base.replace("lazy", "sleepy")
    val other = "completely unrelated content about spark query engines here"
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = TextDedup.jaccardPairs(
      TextDedup.wordShingles(docs, "doc_id", "text"), 0.3)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 > 0.5 && pairs.head._3 < 1.0)
  }

  test("containment catches a doc quoted inside a larger one that jaccard misses") {
    val small = "alpha beta gamma delta epsilon zeta"
    // the small doc verbatim inside ~6× more surrounding text
    val big = "one two three four five six seven eight nine ten " +
      small + " eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty twentyone twentytwo"
    val other = "completely unrelated content about spark query engines here"
    val docs = Seq((1L, small), (2L, big), (3L, other)).toDF("doc_id", "text")
    val sh = TextDedup.wordShingles(docs, "doc_id", "text", 3)
    val cont = TextDedup.containmentPairs(sh, 0.8)
      .select("a_id", "b_id", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(cont.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    val (_, _, contA, contB) = cont.head
    assert(contA == 1.0, s"every small-doc shingle is in the big doc: $contA")
    assert(contB < 0.5, s"the big doc is NOT contained in the small one: $contB")
    // same pair is invisible to symmetric jaccard at the same threshold
    val jac = TextDedup.jaccardPairs(sh, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(!jac.contains((1L, 2L)))
  }

  test("bigram LM: gibberish scores higher avg_nll than in-distribution text") {
    val normal = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog near the river bank"))
    val gibberish = (100L, "xq zvkj qxw jzx vqk wxz kjq zqx vxw qzk jxv kwq")
    val docs = (normal :+ gibberish).toDF("doc_id", "text")
    val scored = CorpusQuality.bigramLmScore(docs, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val normalMax = normal.map(n => scored(n._1)).max
    assert(scored(100L) > normalMax * 1.5,
      s"gibberish ${scored(100L)} must stand out over normal max $normalMax")
    // score is a true average: independent of doc count repeats
    assert(scored(0L) == scored(1L))
  }

  test("Kneser-Ney LM separates gibberish and sums to a proper distribution") {
    val normal = Seq.tabulate(20)(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog near the river bank"))
    val gibberish = (100L, "xq zvkj qxw jzx vqk wxz kjq zqx vxw qzk jxv kwq")
    val docs = (normal :+ gibberish).toDF("doc_id", "text")
    val scored = CorpusQuality.kneserNeyScore(docs, "doc_id", "text")
      .select("doc_id", "avg_nll").as[(Long, Double)].collect().toMap
    val normalMax = normal.map(n => scored(n._1)).max
    assert(scored(100L) > normalMax * 1.5,
      s"gibberish ${scored(100L)} must stand out over normal max $normalMax")
    // KN discounting strictly redistributes mass: every seen bigram
    // keeps positive probability (finite NLL) and the discounted direct
    // term never exceeds the MLE estimate, so avg_nll >= the plain
    // relative-frequency lower bound is impossible to violate silently
    assert(scored.values.forall(v => v > 0 && java.lang.Double.isFinite(v)))
  }

  test("DSIR weights: target-vocabulary docs score above off-target docs") {
    val target = Seq.tabulate(10)(i =>
      (i.toLong, "alpha beta gamma delta epsilon", true))
    val offTarget = Seq.tabulate(10)(i =>
      ((100 + i).toLong, "uno dos tres cuatro cinco", false))
    // two probes OUTSIDE the target slice: one speaks the target
    // vocabulary, one doesn't — the weight must separate them
    val probes = Seq((500L, "alpha beta gamma", false),
      (501L, "uno dos tres", false))
    val docs = (target ++ offTarget ++ probes).toDF("doc_id", "text", "is_en")
    val w = CorpusQuality.dsirWeights(docs, "doc_id", "text", col("is_en"))
      .select("doc_id", "avg_logw").as[(Long, Double)].collect().toMap
    assert(w(500L) > 0, s"target-like probe must weigh positive: ${w(500L)}")
    assert(w(501L) < 0, s"off-target probe must weigh negative: ${w(501L)}")
    assert(w(500L) > w(501L) + 1.0, s"separation: ${w(500L)} vs ${w(501L)}")
  }

  test("train/val/test split is content-stable: growing the corpus moves no doc") {
    def assign(n: Int) = CorpusQuality.assignSplit(
      (1 to n).map(i => (i.toLong, s"src${i % 3}")).toDF("doc_id", "source"),
      "source", "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val small = assign(200)
    val big = assign(400)
    // leak-freedom: every original doc keeps its split as the corpus grows
    assert(small.forall { case (id, sp) => big(id) == sp })
    // all three splits materialize, train dominates (204/26/26 bytes)
    val byCat = big.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byCat.keySet == Set("train", "val", "test"), byCat.toString)
    assert(byCat("train") > byCat("val") && byCat("train") > byCat("test"), byCat.toString)
  }

  test("identical docs have jaccard exactly 1.0") {
    val t = "one two three four five six seven"
    val docs = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val pairs = TextDedup.jaccardPairs(
      TextDedup.wordShingles(docs, "doc_id", "text"), 0.99)
      .select("jaccard").as[Double].collect()
    assert(pairs.toSeq == Seq(1.0))
  }

  test("minhash LSH candidates contain the exact-jaccard pairs (recall)") {
    val docs = graft.queries.Tables(spark, Sf, "documents")
    val shingles = TextDedup.wordShingles(docs, "doc_id", "text")
    val exact = TextDedup.jaccardPairs(shingles, 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val cands = TextDedup.lshCandidates(
      TextDedup.minHashSignatures(shingles, 9), 3, 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(cands.contains).toDouble / exact.size
    assert(recall >= 0.8, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("connected components: chains, cliques, and isolated pairs") {
    // a 7-node path (min label must travel 6 hops), a triangle, a pair
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), (15L, 16L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("a_id", "b_id")
    val comps = TextDedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert((10L to 16L).forall(comps(_) == 10L), s"path: $comps")
    assert((20L to 22L).forall(comps(_) == 20L), s"triangle: $comps")
    assert(comps(30L) == 30L && comps(31L) == 30L, s"pair: $comps")
    assert(comps.size == 12)
  }

  test("star-contraction CC matches label propagation; converges on a 1000-node chain") {
    // correctness parity on mixed shapes
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 15L), (15L, 16L),
      (20L, 21L), (21L, 22L), (20L, 22L),
      (30L, 31L)).toDF("a_id", "b_id")
    val stars = TextDedup.connectedComponentsStars(edges)
      .as[(Long, Long)].collect().toMap
    val prop = TextDedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(stars == prop, s"stars=$stars prop=$prop")

    // a 1000-node chain has diameter 999: label propagation needs ~999
    // rounds, star contraction must finish in O(log n) alternations —
    // maxIter = 20 would leave a plain propagation nowhere near done
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val chainComps = TextDedup.connectedComponentsStars(chain, maxIter = 20)
      .as[(Long, Long)].collect()
    assert(chainComps.length == 1000)
    assert(chainComps.forall(_._2 == 0L),
      s"chain not contracted: ${chainComps.filter(_._2 != 0L).take(5).toSeq}")
  }

  test("winnowing chunking is invisible: multi-MB doc, many chunks, same fingerprints") {
    // deterministic pseudo-random long text (~200k chars) plus a small doc
    val big = {
      val sb = new StringBuilder
      var x = 12345L
      while (sb.length < 200000) {
        x = x * 6364136223846793005L + 1442695040888963407L
        sb.append(java.lang.Long.toUnsignedString(x, 36)).append(' ')
      }
      sb.toString
    }
    val docs = Seq((1L, big), (2L, "a small document about winnowing")).toDF("doc_id", "text")
    val k = 5; val w = 4
    val hashFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => lpad(hex(xxhash64(c)), 16, "0")
    val unchunked = TextDedup
      .winnowingFingerprintsWith(docs, "doc_id", "text", k, w, hashFn, 16,
        chunkChars = Int.MaxValue / 2)
      .as[(Long, String, Int)].collect().toSet
    val chunked = TextDedup
      .winnowingFingerprintsWith(docs, "doc_id", "text", k, w, hashFn, 16,
        chunkChars = 4096)
      .as[(Long, String, Int)].collect().toSet
    assert(chunked == unchunked,
      s"chunked diff: +${(chunked -- unchunked).size} -${(unchunked -- chunked).size}")
    // the big doc really was split: > 40 chunks at 4096 chars
    assert(big.length > 40 * 4096)
  }

  test("brute-force top-k: quantized ranking agrees with float cosine") {
    val emb = graft.queries.Tables(spark, Sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val topQ = Similarity.bruteForceTopK(
      emb, emb.where(col("id") === 0), 5)
      .select("rank", "n_id", "cosine").as[(Int, Long, Double)].collect()
      .sortBy(_._1)
    // float-math reference ranking for the same query
    val q = emb.where(col("id") === 0)
      .select(col("id").as("q_id"), col("vec").as("qvec"))
    val topF = emb.crossJoin(q).where(col("id") =!= col("q_id"))
      .select(col("id"), Similarity.cosineF(col("vec"), col("qvec")).as("c"))
      .orderBy(col("c").desc, col("id")).limit(5)
      .select("id").as[Long].collect().toSeq
    assert(topQ.map(_._2).toSeq == topF)
    // quantization error bounded: cosines within 1e-3 of float values
    assert(topQ.forall { case (_, _, c) => c.abs <= 1.0 + 1e-9 })
  }

  test("winnowing: shared substring of length >= k+w-1 shares a fingerprint") {
    val shared = "thequickbrownfoxjumpsoverthelazydog"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"completely different head $shared and tail"),
      (3L, "no overlap with anything else here at all")).toDF("doc_id", "text")
    val fp = TextDedup.winnowingFingerprints(docs, "doc_id", "text", k = 5, w = 4)
    val byDoc = fp.select("doc_id", "fp_hash").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a 35-char substring must share a fingerprint")
    // density sanity: winnowing selects ~2/(w+1) of positions, far fewer
    // than one fingerprint per gram
    val grams1 = docs.where($"doc_id" === 1).select(
      length(regexp_replace(lower($"text"), "[^a-z0-9]+", ""))).head.getInt(0) - 4
    assert(byDoc(1L).size < grams1 / 2)
    // deterministic
    val fp2 = TextDedup.winnowingFingerprints(docs, "doc_id", "text", k = 5, w = 4)
      .collect().toSet
    assert(fp.collect().toSet == fp2)
  }

  test("IVF top-k: results come from probed cells only, decent recall vs exact") {
    val emb = graft.queries.Tables(spark, Sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("id") % 10 === 0)
    val centroids = emb.where(col("id") % 10 === 3)
    val ivf = Similarity.ivfTopK(emb, queries, centroids, nprobe = 3, k = 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty && exact.nonEmpty)
    // synthetic embeddings are uniform-random (no cluster structure), so
    // recall ~ probed mass; this guards the plumbing, not tuned quality —
    // exactness of the IVF semantics is the oracle gate's job
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.15, s"IVF recall $recall collapsed — probe routing is broken")
  }

  test("ivfRecallSweep: curve is monotone and each point equals a standalone ivfTopK") {
    val emb = graft.queries.Tables(spark, Sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("id") % 10 === 0)
    val centroids = emb.where(col("id") % 10 === 3)
    val probes = Seq(1, 2, 4)
    val curve = Similarity.ivfRecallSweep(emb, queries, centroids, probes, 5)
      .select("nprobe", "n_returned", "n_hits", "n_exact", "recall")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq == probes.map(_.toLong))
    // recall and returned-count never decrease with more probes
    curve.zip(curve.tail).foreach { case (lo, hi) =>
      assert(hi._5 >= lo._5 && hi._2 >= lo._2, s"curve bent: $lo -> $hi")
    }
    curve.foreach { case (_, nRet, nHits, nEx, recall) =>
      assert(nHits <= nRet && nHits <= nEx)
      assert(recall == nHits.toDouble / nEx)
    }
    // cross-check one sweep point against the standalone operator: the
    // filtered-by-probe-rank path must return the SAME pair set as an
    // ivfTopK run at that nprobe
    val sweepAt2 = Similarity.ivfRecallSweep(emb, queries, centroids, Seq(2), 5)
      .select("n_returned", "n_hits").as[(Long, Long)].head()
    val standalone = Similarity.ivfTopK(emb, queries, centroids, 2, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    assert(sweepAt2._1 == standalone.size)
    assert(sweepAt2._2 == exact.count(standalone.contains))
  }

  test("minhash fast twin: xxhash64 candidates recall >= md5 path on true near-dups") {
    // ground truth: exact n-gram Jaccard >= 0.5 over the planted
    // near-dups in the shared documents table — the same threshold the
    // graded d_ngram_jaccard uses. Both LSH paths run the identical
    // (k=9, bands=3, rows=3) banding; only the hash family differs, so
    // the fast twin must not lose discovery power vs the oracle-checked
    // md5 path (the twin itself has no portable oracle — this spec is
    // its correctness pin)
    val docs = graft.queries.Tables(spark, Sf, "documents")
    val shingles = TextDedup.wordShingles(docs, "doc_id", "text", 3)
    val truth = TextDedup.jaccardPairs(shingles, 0.5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test corpus must contain planted near-dups")
    val md5Cands = TextDedup.lshCandidates(
        TextDedup.minHashSignatures(shingles, 9), 3, 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val fastCands = TextDedup.lshCandidatesWith(
        TextDedup.minHashSignaturesWith(shingles, 9,
          (i, sh) => xxhash64(lit(i), sh)),
        3, 3, cols => xxhash64(cols: _*))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val md5Recall = truth.count(md5Cands.contains).toDouble / truth.size
    val fastRecall = truth.count(fastCands.contains).toDouble / truth.size
    assert(fastRecall >= md5Recall,
      s"fast-twin recall regressed: fast=$fastRecall md5=$md5Recall (truth=${truth.size})")
    assert(fastRecall > 0.8, s"fast-twin recall implausibly low: $fastRecall")
  }

  test("k-means IVF centroids: deterministic, and recall >= id-stride centroids") {
    val emb = graft.queries.Tables(spark, Sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = emb.where(col("id") % 10 === 0)
    val trained = Similarity.kmeansCentroids(emb, k = 50, iters = 4)
    // deterministic: retraining yields the identical codebook
    val again = Similarity.kmeansCentroids(emb, k = 50, iters = 4)
    assert(trained.collect().toSet == again.collect().toSet)
    assert(trained.count() == 50)

    val exact = Similarity.bruteForceTopK(emb, queries, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    def recall(centroids: org.apache.spark.sql.DataFrame): Double = {
      val got = Similarity.ivfTopK(emb, queries, centroids, nprobe = 4, k = 5)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      exact.count(got.contains).toDouble / exact.size
    }
    // the graded query's centroid choice, at the same cell count
    val stride = emb.where(col("id") % 10 === 3)
    val rTrained = recall(trained)
    val rStride = recall(stride)
    assert(rTrained >= rStride,
      s"trained centroids must not lose recall: trained=$rTrained stride=$rStride")
  }

  test("LSH bucket signature: same vector → same bucket; candidates scored") {
    val planes = Similarity.planes(16, 64)
    assert(planes.flatten.forall(v => v == 1 || v == -1))
    // deterministic: recomputing yields identical planes
    assert(planes == Similarity.planes(16, 64))
    val emb = graft.queries.Tables(spark, Sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val cands = Similarity.lshCandidates(emb, planes, 4, 4, 0.25)
    val bad = cands.where(col("cosine") < 0.25 || col("a_id") >= col("b_id"))
    assert(bad.isEmpty)
  }

  test("multimodal: decode parses genuine PNG/WAV header bytes") {
    val text = "the quick brown fox".getBytes("UTF-8")
    // hand-built containers with KNOWN fields — decode must read the
    // bytes, not any generation rule
    val png = Multimodal.pngPrefix(800, 600) ++ text
    val wav = Multimodal.wavHeader(44100, 2, text.length) ++ text
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png),
      Multimodal.MediaRow(2L, "audio", wav),
      Multimodal.MediaRow(3L, "video", text)).toDS()
    val meta = Multimodal.decode(media).collect().sortBy(_.media_id)
    val img = meta(0); val aud = meta(1); val vid = meta(2)
    assert(img.width == 800 && img.height == 600 && img.n_frames == 1)
    assert(img.n_bytes == 33 + text.length)
    assert(aud.width == 44100 && aud.height == 2)
    assert(aud.n_frames == text.length / 4) // 16-bit stereo sample frames
    assert(aud.n_bytes == 44 + text.length)
    // checksum is CONTENT md5 (through the container) — all three equal
    assert(img.checksum == vid.checksum && aud.checksum == vid.checksum)
    // the PNG prefix carries a REAL CRC over the IHDR chunk
    val crc = new java.util.zip.CRC32()
    crc.update(png, 12, 17)
    val stored = java.nio.ByteBuffer.wrap(png, 29, 4).getInt
    assert(stored == crc.getValue.toInt, "IHDR CRC must verify")
    // flipping a header byte CHANGES the parsed answer (bytes, not rule)
    val flipped = png.clone(); flipped(19) = (flipped(19) ^ 1).toByte
    val meta2 = Multimodal.decode(
      Seq(Multimodal.MediaRow(9L, "image", flipped)).toDS()).head()
    assert(meta2.width == 801 || meta2.width == 799)
    // truncated / foreign magic falls back to the stub path
    val stub = Multimodal.decode(
      Seq(Multimodal.MediaRow(4L, "image", "no magic here".getBytes("UTF-8"))).toDS())
      .head()
    assert(stub.width >= 256 && stub.height >= 144)
    // a WAV header LYING about its data length (declares 1 MB, carries
    // 19 bytes) must clamp n_frames to the bytes actually present
    val lying = Multimodal.wavHeader(44100, 2, 1 << 20) ++ text
    val liar = Multimodal.decode(
      Seq(Multimodal.MediaRow(5L, "audio", lying)).toDS()).head()
    assert(liar.n_frames == text.length / 4,
      s"declared-length overrun must clamp, got ${liar.n_frames}")
  }

  test("multimodal: containerize derives fields by the documented id rules") {
    val rows = Seq(
      Multimodal.MediaRow(0L, "image", "aaa".getBytes("UTF-8")),
      Multimodal.MediaRow(7L, "audio", "bbbbbbbb".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "video", "ccc".getBytes("UTF-8"))).toDS()
    val meta = Multimodal.decode(Multimodal.containerize(rows))
      .collect().sortBy(_.media_id)
    val img = meta(0); val vid = meta(1); val aud = meta(2)
    assert(img.width == 64 + (0 % 241) * 8 && img.height == 64)
    assert(aud.width == Multimodal.WavRates(7 % 5) && aud.height == 1 + 7 % 2)
    assert(aud.n_frames == 8 / (2 * 2)) // 8 data bytes, 16-bit x 2ch
    // video stays raw: stub dims, checksum of the raw bytes
    assert(vid.n_bytes == 3)
  }

  test("multimodal: stub decode is deterministic, frames evenly spaced") {
    val media = Seq(
      Multimodal.MediaRow(1L, "video", "some video bytes".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "image", "img".getBytes("UTF-8")))
      .toDS()
    val meta = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val meta2 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    assert(meta.toSeq == meta2.toSeq)
    assert(meta.forall(m => m.width >= 256 && m.height >= 144 && m.n_frames >= 1))
    assert(meta.forall(_.checksum.length == 32))

    val frames = Multimodal.sampleFrames(Multimodal.decodeStub(media), 4)
      .collect().groupBy(_.media_id)
    frames.values.foreach { fs =>
      val sorted = fs.sortBy(_.frame_idx)
      assert(sorted.head.offset_pct == 0.0)
      if (sorted.length > 1) assert(sorted.last.offset_pct == 1.0)
    }
  }

  test("resize plan: aspect-fit, never upscales, even output dims") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", "a tiny payload".getBytes("UTF-8")),
      Multimodal.MediaRow(2L, "video", ("x" * 500).getBytes("UTF-8")))
      .toDS()
    val plans = Multimodal.resizePlan(Multimodal.decodeStub(media), 640, 360)
      .collect()
    plans.foreach { p =>
      assert(p.scale <= 1.0 && p.scale > 0.0)
      assert(p.out_width <= 640 && p.out_height <= 360)
      assert(p.out_width % 2 == 0 && p.out_height % 2 == 0)
      assert(p.out_width <= p.src_width && p.out_height <= p.src_height)
      // aspect ratio preserved within the even-rounding slack
      val srcAr = p.src_width.toDouble / p.src_height
      val outAr = p.out_width.toDouble / p.out_height
      assert(math.abs(srcAr - outAr) / srcAr < 0.05, s"$p")
    }
  }

  test("feature stub: fixed dim, deterministic, values in [0,1)") {
    val df = Seq("abc", "def").toDF("text")
      .select(Multimodal.featureStub(col("text").cast("binary"), 16).as("f"))
    val rows = df.as[Seq[Double]].collect()
    assert(rows.forall(_.length == 16))
    assert(rows.forall(_.forall(v => v >= 0.0 && v < 1.0)))
  }

  test("segment duplication flags shared segments, counts partial tails") {
    // segWords=3: doc1/doc2 share their first segment "a b c"; doc3 is
    // 4 words → 2 segments (one partial tail), none shared.
    val docs = Seq(
      (1L, "a b c x y z"),
      (2L, "a b c q r s"),
      (3L, "p q r t")).toDF("doc_id", "text")
    val got = CorpusQuality.segmentDuplication(docs, "doc_id", "text", 3)
      .select("doc_id", "n_segments", "n_dup_segments")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 0L)))
  }

  test("segment duplication counts within-doc repeats but needs a second doc to flag") {
    // "a b c" appears twice in doc 1 but in no other doc → not a dup
    val docs = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    val got = CorpusQuality.segmentDuplication(docs, "doc_id", "text", 3)
      .select("doc_id", "n_segments", "n_dup_segments")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 0L)))
  }

  test("PII redaction masks emails, phones, and IPs; counts agree") {
    val df = Seq(
      "mail bob.smith+x@corp.example.org now",
      "call +1-555-123 4567 or (555) 765-4321 today",
      "host 192.168.0.1 and 10.0.255.254",
      "no pii here at all").toDF("text")
    val audited = CorpusQuality.piiAudit(df, col("text"))
      .select("n_emails", "n_phones", "n_ips", "redacted")
    val got = audited.as[(Int, Int, Int, String)].collect().toSeq
    assert(got(0) == ((1, 0, 0, "mail <EMAIL> now")))
    assert(got(1)._2 == 2 && got(1)._4 == "call <PHONE> or <PHONE> today")
    assert(got(2)._3 == 2 && got(2)._4 == "host <IP> and <IP>")
    assert(got(3) == ((0, 0, 0, "no pii here at all")))
    // audit and redactPii agree
    val viaRedact = df.select(CorpusQuality.redactPii(col("text")).as("r"))
      .as[String].collect().toSeq
    assert(got.map(_._4) == viaRedact)
    // single-pass: each of the 3 redaction regexes appears exactly once
    // in the physical plan (the counts reuse the replace stages instead
    // of re-running the chain per count column) — checked over a
    // file-backed frame so ConvertToLocalRelation can't pre-fold it
    val plan = CorpusQuality.piiAudit(
        graft.queries.Tables(spark, Sf, "documents"), col("text"))
      .select("n_emails", "n_phones", "n_ips", "redacted")
      .queryExecution.executedPlan.toString
    assert(plan.sliding("regexp_replace".length).count(_ == "regexp_replace") == 3,
      s"expected exactly 3 regexp_replace in:\n$plan")
  }

  test("phone redaction requires phone structure: dates and ids survive") {
    val df = Seq(
      "shipped 2024-08-12 at 12:30",          // ISO date + time
      "order 123456789 qty 1000000",          // long plain integers
      "rows 10 20 30 40 50 60 70",            // numeric table
      "+33 6 12 34 56 78 ok",                 // international
      "(02) 9876 5432 works",                 // parenthesized area code
      "555.123.4567 dotted").toDF("text")
    val got = df.select(CorpusQuality.redactPii(col("text")).as("r"))
      .as[String].collect().toSeq
    assert(got(0) == "shipped 2024-08-12 at 12:30", s"date mangled: ${got(0)}")
    assert(got(1) == "order 123456789 qty 1000000", s"ids mangled: ${got(1)}")
    assert(got(2) == "rows 10 20 30 40 50 60 70", s"table mangled: ${got(2)}")
    assert(got(3) == "<PHONE> ok", s"intl phone missed: ${got(3)}")
    assert(got(4) == "<PHONE> works", s"area-code phone missed: ${got(4)}")
    assert(got(5) == "<PHONE> dotted", s"dotted phone missed: ${got(5)}")
  }

  test("bm25: matching docs rank first, rare terms outweigh common ones") {
    val docs = Seq(
      (1L, "spark spark spark common common"),  // high tf on rare term
      (2L, "spark common other words here"),    // one rare hit
      (3L, "common common common words here"),  // only the common term
      (4L, "entirely unrelated content body")). // no hits
      toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq(0L -> Seq("spark", "common")), k = 10)
      .select("rank", "doc_id", "score")
      .as[(Long, Long, Double)].collect().toSeq
    // doc 4 never scores; docs with the rarer 'spark' beat common-only doc 3
    assert(got.map(_._2) == Seq(1L, 2L, 3L))
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got.forall(_._3 > 0.0), s"Lucene idf must stay positive: $got")
  }

  test("mixture oversample: exact whole copies, hash-gated extras, weight-0 drop") {
    val docs = (0L until 64L).map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    val out = CorpusQuality.mixtureOversample(docs, "source", "doc_id",
      Map("src0" -> (3, 0), "src1" -> (0, 0)))
      .select("doc_id", "source", "copy").as[(Long, String, Int)].collect()
    assert(out.forall(_._2 == "src0"), "weight-0 stratum must vanish")
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byDoc.values.forall(_ == Seq(1, 2, 3)), "exactly 3 ordered copies each")
    // fractional part: (0, 256) always emits one extra vs (0, 0) never
    val always = CorpusQuality.mixtureOversample(docs, "source", "doc_id",
      Map("src0" -> (0, 256), "src1" -> (0, 256))).count()
    assert(always == 64L, "threshold 256 covers every hash byte")
    // determinism: same inputs → same copy counts on a re-run
    val rerun = CorpusQuality.mixtureOversample(docs, "source", "doc_id",
      Map("src0" -> (3, 0), "src1" -> (0, 0)))
      .select("doc_id", "source", "copy").as[(Long, String, Int)].collect()
    assert(rerun.sorted.toSeq == out.sorted.toSeq)
  }

  test("packSequences lays docs head-to-tail: offsets chain exactly per shard") {
    val docs = (0L until 200L).map(i => (i, 1L + i % 37)).toDF("doc_id", "n_tok")
    val out = CorpusQuality.packSequences(docs, "doc_id", col("n_tok"),
      shards = 4, budget = 100L)
      .select("doc_id", "shard", "n_tokens", "pack_id", "offset_in_pack")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(out.length == 200)
    assert(out.forall { case (_, sh, _, p, off) =>
      sh >= 0 && sh < 4 && p >= 0 && off >= 0 && off < 100 })
    // within a shard, each doc starts exactly where the previous ended:
    // global start = pack_id*budget + offset must walk the cumsum of sizes
    out.groupBy(_._2).values.foreach { docs =>
      val starts = docs.map { case (_, _, n, p, off) => (p * 100 + off, n) }
        .sortBy(_._1)
      starts.zip(starts.scanLeft(0L)(_ + _._2)).foreach {
        case ((start, _), expected) => assert(start == expected)
      }
    }
    // determinism: a re-run (different partitioning) assigns identically
    val rerun = CorpusQuality.packSequences(docs.repartition(7), "doc_id",
      col("n_tok"), shards = 4, budget = 100L)
      .select("doc_id", "shard", "n_tokens", "pack_id", "offset_in_pack")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(rerun.sortBy(_._1) == out.sortBy(_._1))
  }

  test("incremental segment dedup drops a new doc the corpus already covers") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val fresh = Seq(
      // 2 of 2 segments already in corpus → known frac 1.0 → dropped
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // 0 of 2 known → kept
      (11L, "completely novel words appear here nothing matches at all"),
      // 1 of 2 segments known (the first five words of doc 2) → 50%,
      // NOT strictly below 50 → dropped (boundary is exact integer math)
      (12L, "one two three four five fresh words follow right here")).toDF("doc_id", "text")
    val got = CorpusQuality.incrementalSegmentDedup(fresh, corpus,
      "doc_id", "text", segWords = 5, keepBelowPct = 50)
      .select("doc_id", "n_segments", "n_known_segments", "keep")
      .as[(Long, Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((10L, 2L, 2L, false), (11L, 2L, 0L, true),
      (12L, 2L, 1L, false)))
  }

  test("PQ with m=1 and a full codebook reproduces exact L2 ranking") {
    // with one subspace and every vector its own codeword, encode is the
    // identity and ADC(q, v) = exact quantized squared L2 — so the PQ
    // machinery must reproduce brute-force L2 exactly
    val vecs: Seq[(Long, Seq[Float])] = (0L until 12L).map { i =>
      (i, Seq.tabulate(4)(j => ((i * 7 + j * 3) % 13).toFloat / 10f))
    }
    val df = vecs.toDF("id", "vec")
    val got = Similarity.pqTopK(df, df.where(col("id") < 2), df,
      m = 1, dim = 4, k = 3)
      .select("q_id", "rank", "n_id", "adc_d2")
      .as[(Long, Int, Long, Long)].collect().toSeq.sortBy(r => (r._1, r._2))
    def q(v: Seq[Float]): Seq[Long] = v.map(x => math.floor(x * 10000 + 0.5).toLong)
    def d2(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = vecs.take(2).flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (d2(q(qv), q(v)), id) }.sorted.take(3)
        .zipWithIndex.map { case ((d, id), r) => (qid, r + 1, id, d) }
    }
    assert(got == expected)
    // sanity: a PLANTED exact duplicate of query 0 ranks first at d2=0
    val dup = df.unionByName(Seq((99L, vecs.head._2)).toDF("id", "vec"))
    val withDup = Similarity.pqTopK(dup, dup.where(col("id") === 0), dup,
      m = 2, dim = 4, k = 1)
      .select("n_id", "adc_d2").as[(Long, Long)].collect().toSeq
    assert(withDup == Seq((99L, 0L)))
  }

  test("semDedup: near-dups drop to the lowest id, clusters never interact") {
    val df = Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      2L -> Seq(0.99f, 0.01f, 0.0f, 0.0f), // near-dup of 1 → dropped
      3L -> Seq(0.0f, 1.0f, 0.0f, 0.0f),
      4L -> Seq(0.0f, 0.98f, 0.1f, 0.0f),  // near-dup of 3 → dropped
      5L -> Seq(0.6f, 0.0f, 0.8f, 0.0f),   // cluster 1 but cos 0.6 < τ → kept
      6L -> Seq(0.98f, 0.03f, 0.0f, 0.0f)  // dup of both 1 and 2 → dropped once
    ).toDF("id", "vec")
    val cents = Seq(
      1L -> Seq(1.0f, 0.0f, 0.0f, 0.0f),
      3L -> Seq(0.0f, 1.0f, 0.0f, 0.0f)).toDF("id", "vec")
    val res = Similarity.semDedup(df, cents, 0.9)
      .orderBy("id").select("id", "cell", "kept")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(res == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 3L, false), (5L, 1L, true), (6L, 1L, false)))
  }

  test("chunk overlap: strided starts, clipped tail, full coverage per doc") {
    import graft.SparkEntry
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
    val chunks = SparkEntry.queries("t_chunk_overlap")(spark, Sf)
    val bad = chunks.join(docs, "doc_id")
      .where(
        // starts are exact multiples of the stride, inside the doc
        col("chunk_start") =!= col("chunk_idx") * 150 ||
          col("chunk_start") >= col("n") ||
          // every chunk is full-width unless clipped by doc end
          col("chunk_len") =!= least(lit(200), col("n") - col("chunk_start")))
    assert(bad.count() == 0)
    // per doc: chunk count is ceil(n / stride) → tail gap < stride
    val counts = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("c"), max(col("chunk_start")).as("last"))
      .join(docs, "doc_id")
      .where(col("c") =!= ceil(col("n") / 150.0) || col("last") < col("n") - 150)
    assert(counts.count() == 0)
  }

  test("z-order tiles are 16x16 rectangles: per-tile key spreads stay bounded") {
    // the locality a z-sorted file layout turns into tight min/max
    // footer stats — each z>>8 bucket must cover one 16×16 tile, never a
    // stripe across the key space (which is what a plain (x,y) sort gives)
    val df = graft.SparkEntry.queries("io_zorder_locality")(spark, Sf)
    val bad = df.where(
      col("max_x") - col("min_x") > 15 || col("max_y") - col("min_y") > 15)
    assert(bad.count() == 0)
  }

  test("IVF-PQ probing every cell reproduces plain PQ's ADC ranking exactly") {
    // cells only RESTRICT the compressed scan — with nprobe = all cells
    // the restriction is vacuous and the rankings must be identical
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val queries = e.where(pmod(col("id"), lit(10)) === 0)
    val coarse = e.where(pmod(col("id"), lit(25)) === 0)
    val nCells = coarse.count().toInt
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "rank", "n_id", "adc_d2")
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val ivfpq = canon(Similarity.ivfPqTopK(
      e, queries, coarse, coarse, nCells, m = 4, dim = 64, k = 5))
    val pq = canon(Similarity.pqTopK(e, queries, coarse, m = 4, dim = 64, k = 5))
    assert(ivfpq == pq)
    assert(ivfpq.nonEmpty)
  }

  test("token entropy: fixed-point Shannon bits per document") {
    val docs = Seq(
      (1L, "a b c d"),              // 4 uniform types → exactly 2 bits
      (2L, "spam spam spam spam"),  // constant doc → 0 bits
      (3L, "x  x   y y"),           // whitespace runs; 2 uniform types → 1 bit
      (4L, "   "),                  // no tokens → no row
      (5L, "a a a b")).toDF("doc_id", "text")
    val got = CorpusQuality.tokenEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_tokens", "n_types", "entropy_bits")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 5L)) // doc 4 absent
    assert(got(0) == ((1L, 4L, 4L, 2.0)))
    assert(got(1) == ((2L, 4L, 1L, 0.0)))
    assert(got(2) == ((3L, 4L, 2L, 1.0)))
    // −(3/4)·log2(3/4) → 311278 µbits, −(1/4)·log2(1/4) → 500000 µbits
    assert(got(3) == ((5L, 4L, 2L, 0.811278)))
  }

  test("approximate aggregate gates hold (HLL within 5%, median rank within 1%)") {
    val ad = graft.SparkEntry.queries("q_approx_distinct")(spark, Sf)
    assert(ad.count() == 3 && ad.where(!col("within_5pct")).count() == 0)
    val am = graft.SparkEntry.queries("q_approx_median")(spark, Sf)
    assert(am.count() == 3 && am.where(!col("rank_ok")).count() == 0)
  }

  test("bloom prefilter gates hold: recall 1, fp mass under 1% of corpus") {
    val r = graft.SparkEntry.queries("d_bloom_prefilter")(spark, Sf).head()
    assert(r.getAs[Long]("n_true") > 0)
    assert(r.getAs[Boolean]("no_false_negatives"))
    assert(r.getAs[Boolean]("fp_ok"))
  }

  test("language guess picks the profile with most hits, first wins ties") {
    val df = Seq(
      "the cat and the dog is in to the house",
      "el perro y la casa de los gatos que",
      "der hund und die katze ist von mit",
      "xyzzy plugh").toDF("text")
    val got = df.select(TextFunctions.languageGuess(col("text"),
      TextFunctions.DefaultProfiles).as("l")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "en")) // zero hits everywhere → first profile
  }

  test("assignGlobalIds == ROW_NUMBER, invariant to partition count") {
    val df = (1 to 500).map(i => (i.toLong, s"k${(i * 131) % 500}%03d"))
      .toDF("id", "key")
    def ids(n: Int): Map[Long, Long] =
      Ids.assignGlobalIds(df, Seq(col("key"), col("id")), n)
        .select(col("id"), col("gid")).as[(Long, Long)].collect().toMap
    val expected = df
      .withColumn("gid", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("key"), col("id")))
        .cast("long"))
      .select(col("id"), col("gid")).as[(Long, Long)].collect().toMap
    assert(ids(7) == expected, "7 partitions must reproduce the global rank")
    assert(ids(1) == expected && ids(32) == expected,
      "ids must not depend on the partition count")
  }

  test("prefixSumByKey == running-SUM window, keys interleaved across partitions") {
    val df = (1 to 300)
      .map(i => (s"k${i % 3}", i.toLong, (i % 7 + 1).toLong))
      .toDF("k", "ord", "v")
    def cums(n: Int): Map[(String, Long), Long] =
      Ids.prefixSumByKey(df, "k", Seq("ord"), "v", n)
        .select(col("k"), col("ord"), col("cum"))
        .as[(String, Long, Long)].collect()
        .map { case (k, o, c) => (k, o) -> c }.toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val expected = df.withColumn("cum", sum(col("v")).over(w))
      .select(col("k"), col("ord"), col("cum"))
      .as[(String, Long, Long)].collect()
      .map { case (k, o, c) => (k, o) -> c }.toMap
    assert(cums(5) == expected, "5 partitions must match the window scan")
    assert(cums(1) == expected && cums(16) == expected,
      "prefix sums must not depend on the partition count")
  }

  test("ppjoin prefix filtering loses no pair vs the full jaccard join") {
    // near-dup pairs at several overlap levels + unrelated noise docs
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      1L -> base,
      2L -> base.replace("tok20", "zzz"),               // J ≈ 17/19 of shingles
      3L -> base.replace("tok10", "yyy"),               // mid-doc edit
      4L -> (5 to 24).map(i => s"tok$i").mkString(" "), // shifted window
      5L -> "completely different words here entirely now",
      6L -> (1 to 20).map(i => s"other$i").mkString(" "))
      .toDF("doc_id", "text")
    val sh = TextDedup.wordShingles(docs, "doc_id", "text", 3)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "n_inter", "n_union")
        .as[(Long, Long, Long, Long)].collect().toSet
    val full = key(TextDedup.jaccardPairs(sh, 0.5))
    val pp = key(TextDedup.ppjoinPairs(sh, 1, 2))
    assert(full.nonEmpty, "fixture must contain qualifying pairs")
    assert(pp == full, "prefix filtering must be candidate-complete")
  }
}
