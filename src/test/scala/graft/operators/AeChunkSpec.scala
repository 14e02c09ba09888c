package graft.operators

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Parity + invariants for the native AE-chunk expression
  * ([[graft.plans.AeChunkBoundaries]]) against the declarative
  * window-MAX reference twin ([[TextDedup.aeChunksDeclarative]]).
  */
class AeChunkSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Long, String)] =
    df.as[(Long, Int, Long, String)].collect().toSet

  // mixed alphabet: ASCII text, repeats (low entropy → long chunks),
  // and non-ASCII code points incl. an astral-plane char (surrogate
  // pair in UTF-16 — exercises the code-point walk)
  private val genChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    3 -> Gen.oneOf(" ", " ", "a", "e"),
    1 -> Gen.oneOf("é", "ü", "日", "本", "😀"))
  private val genDoc: Gen[String] =
    Gen.choose(0, 200).flatMap(n => Gen.listOfN(n, genChar).map(_.mkString))

  test("native aeChunks == declarative window formulation (ScalaCheck)") {
    val prop = Prop.forAll(Gen.listOfN(6, genDoc)) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val native = rows(TextDedup.aeChunks(docs))
      val decl = rows(TextDedup.aeChunksDeclarative(docs))
      Prop(native == decl) :| {
        val onlyN = native -- decl
        val onlyD = decl -- native
        s"native-only=$onlyN declarative-only=$onlyD texts=$texts"
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("chunks tile the document; h is md5 of the claimed substring") {
    val texts = Seq(
      "", "x", "short doc", "a" * 100,
      ("the quick brown fox jumps over the lazy dog " * 8).trim,
      "prefix é日本😀 suffix with enough characters to force a window cut somewhere")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = rows(TextDedup.aeChunks(docs)).toSeq
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val cps = t.codePointCount(0, t.length)
      val chunks = got.getOrElse(i.toLong, Seq.empty)
      if (cps == 0) assert(chunks.isEmpty, s"doc $i: empty text → no chunks")
      else {
        // contiguous tiling of [1, cps]
        assert(chunks.head._2 == 1, s"doc $i starts at 1")
        assert(chunks.map(c => c._3).sum == cps, s"doc $i lens sum to $cps")
        chunks.sliding(2).foreach {
          case Seq(a, b) => assert(b._2 == a._2 + a._3, s"doc $i contiguous")
          case _ =>
        }
        // hash really is md5 of the code-point substring
        chunks.foreach { case (_, start, len, h) =>
          val a = t.offsetByCodePoints(0, start - 1)
          val b = t.offsetByCodePoints(a, len.toInt)
          assert(h == md5hex(t.substring(a, b)), s"doc $i chunk@$start")
        }
      }
    }
  }

  test("shift resistance: an edit only moves chunks near the edit") {
    // high-entropy deterministic text (LCG): periodic text would tile
    // to ONE chunk by design — a strict max never recurs inside a
    // repeating period shorter than ~2^32 hash range coverage
    val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9')
    var seed = 12345L
    val base = new String(Array.fill(600) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      alphabet(((seed >>> 33) % alphabet.length).toInt)
    })
    val edited = base.substring(0, 120) + "XYZQ" + base.substring(120)
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val byDoc = rows(TextDedup.aeChunks(docs)).groupBy(_._1).view
      .mapValues(_.map(_._4)).toMap
    val shared = byDoc(1L).intersect(byDoc(2L))
    assert(shared.nonEmpty,
      "CDC must re-sync after an edit: some chunk hashes survive")
  }
}
