package graft.operators

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck properties for winnowing fingerprints: the MOSS guarantee
  * (a shared substring of length ≥ k+w-1 yields a shared fingerprint)
  * and positional validity (every emitted hash really is the md5 of the
  * k-gram at its claimed position) on random documents.
  */
class WinnowPropsSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5
  private val W = 4

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private val genChunk: Gen[String] =
    Gen.choose(20, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString.toLowerCase))

  test("winnowing: planted shared substring is always detected (ScalaCheck)") {
    val prop = Prop.forAll(genChunk, genChunk, genChunk, genChunk, genChunk) {
      (shared, pre1, post1, pre2, other) =>
        // `shared` ≥ 20 ≥ K+W-1 chars of normalized text in both docs
        val docs = Seq(
          (1L, s"$pre1 $shared $post1"),
          (2L, s"$pre2$shared"),
          (3L, other)).toDF("doc_id", "text")
        val fp = TextDedup.winnowingFingerprints(docs, "doc_id", "text", K, W)
          .as[(Long, String, Int)].collect()
        val byDoc = fp.groupBy(_._1).view
          .mapValues(_.map(_._2).toSet).toMap.withDefaultValue(Set.empty[String])

        val normalized = Map(
          1L -> s"$pre1$shared$post1", 2L -> s"$pre2$shared", 3L -> other)
        val positionsValid = fp.forall { case (id, h, pos) =>
          val s = normalized(id)
          pos >= 1 && pos + K - 1 <= s.length &&
            h == md5hex(s.substring(pos - 1, pos - 1 + K))
        }
        (Prop(byDoc(1L).intersect(byDoc(2L)).nonEmpty)
          :| s"shared '$shared' must fingerprint in both docs") &&
        (Prop(positionsValid) :| "every fp_hash matches its claimed gram")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("native winnow expression == declarative window formulation (ScalaCheck)") {
    import org.apache.spark.sql.functions._
    // small chunkChars forces multi-chunk docs through both paths, so
    // the equivalence also covers the chunk-overlap seams
    val prop = Prop.forAll(Gen.listOfN(3, genChunk)) { parts =>
      val docs = parts.zipWithIndex
        .map { case (t, i) => (i.toLong, t + parts.mkString) }
        .toDF("doc_id", "text")
      def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Int)] =
        df.as[(Long, String, Int)].collect().toSet
      val declMd5 = canon(TextDedup.winnowingFingerprintsWith(
        docs, "doc_id", "text", K, W, md5, 32, chunkChars = 24))
      val nativeMd5 = canon(TextDedup.winnowingFingerprintsNative(
        docs, "doc_id", "text", K, W, useMd5 = true, chunkChars = 24))
      val declFast = canon(TextDedup.winnowingFingerprintsWith(
        docs, "doc_id", "text", K, W,
        c => lpad(hex(xxhash64(c)), 16, "0"), 16, chunkChars = 24))
      val nativeFast = canon(TextDedup.winnowingFingerprintsNative(
        docs, "doc_id", "text", K, W, useMd5 = false, chunkChars = 24))
      (Prop(declMd5 == nativeMd5) :| s"md5 mode diverged: ${declMd5.diff(nativeMd5)} vs ${nativeMd5.diff(declMd5)}") &&
      (Prop(declFast == nativeFast) :| "xxhash64 mode diverged") &&
      (Prop(nativeMd5.nonEmpty) :| "degenerate empty result")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
