package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** ScalaCheck property: [[Similarity.semDedup]] must agree with a plain
  * in-memory reference implementation of the same contract (quantized
  * cosine, max-cosine cell assignment with ties to the smaller centroid
  * id, greedy keep-lowest-id drop within a cell) on arbitrary vector
  * sets — including centroid duplicates, near-threshold pairs, and
  * clusters of size 1.
  */
class SemDedupPropsSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * Similarity.Scale + 0.5).toLong)

  private def dot(a: Seq[Long], b: Seq[Long]): Long =
    a.lazyZip(b).map(_ * _).sum

  private def cos(a: Seq[Long], b: Seq[Long]): Double =
    dot(a, b).toDouble / math.sqrt(dot(a, a).toDouble * dot(b, b).toDouble)

  private def reference(
      vecs: Seq[(Long, Seq[Float])],
      cents: Seq[(Long, Seq[Float])],
      minCos: Double): Seq[(Long, Long, Boolean)] = {
    val qv = vecs.map { case (id, v) => id -> quant(v) }
    val qc = cents.map { case (id, v) => id -> quant(v) }
    val cell = qv.map { case (id, v) =>
      id -> -qc.map { case (cid, cv) => (cos(v, cv), -cid) }.max._2
    }.toMap
    val dropped = (for {
      (a, av) <- qv; (b, bv) <- qv
      if a < b && cell(a) == cell(b) && cos(av, bv) >= minCos
    } yield b).toSet
    qv.map { case (id, _) => (id, cell(id), !dropped(id)) }.sortBy(_._1)
  }

  // first component nonzero → no zero vector, no NaN cosine
  private val genVec: Gen[Seq[Float]] = for {
    head <- Gen.oneOf(-1.0f, -0.5f, 0.5f, 1.0f)
    rest <- Gen.listOfN(3, Gen.oneOf(-1.0f, -0.5f, -0.2f, 0.0f, 0.2f, 0.5f, 1.0f))
  } yield head +: rest

  private val genInput: Gen[List[(Long, Seq[Float])]] =
    Gen.choose(5, 30).flatMap(n =>
      Gen.listOfN(n, genVec).map(_.zipWithIndex.map {
        case (v, i) => (i.toLong + 1, v)
      }))

  test("semDedup == in-memory reference on arbitrary vector sets (ScalaCheck)") {
    val prop = Prop.forAll(genInput, Gen.oneOf(0.3, 0.6, 0.9)) { (vecs, minCos) =>
      val cents = vecs.zipWithIndex.collect { case (v, i) if i % 3 == 0 => v }
      val df = vecs.toDF("id", "vec")
      val cdf = cents.toDF("id", "vec")
      val got = Similarity.semDedup(df, cdf, minCos)
        .select("id", "cell", "kept")
        .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
      val want = reference(vecs, cents, minCos)
      Prop(got == want) :| s"minCos=$minCos:\n got=$got\nwant=$want"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
