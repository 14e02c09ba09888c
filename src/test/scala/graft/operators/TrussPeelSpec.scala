package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** Properties for the shared iterative graph loops extracted in round 9
  * ([[Graphs.trussPeelStats]] with its fixpoint early-exit, and
  * [[Graphs.minLabelRounds]]): each is pinned against a naive
  * driver-side recomputation on random graphs, so the delta/early-exit
  * optimizations can never drift from the definition.
  */
class TrussPeelSpec extends SparkSpec {
  import spark.implicits._

  /** Naive reference: per round, re-enumerate alive triangles from the
    * CURRENT surviving edge set and recount support — no delta
    * subtraction, no early exit. Returns (round, n_edges, n_tri_alive)
    * with round 0 = the input census, exactly the operator's contract.
    */
  private def naivePeel(edges0: Set[(Long, Long)], rounds: Int,
      k: Int): Seq[(Long, Long, Long)] = {
    def tris(e: Set[(Long, Long)]): Set[(Long, Long, Long)] =
      for {
        (a, b) <- e
        (c, d) <- e if c == a && d > b
        if e.contains((b, d))
      } yield (a, b, d)
    var e = edges0
    val out = Seq.newBuilder[(Long, Long, Long)]
    out += ((0L, e.size.toLong, tris(e).size.toLong))
    for (r <- 1 to rounds) {
      val alive = tris(e)
      val sup = alive.toSeq
        .flatMap { case (a, b, c) => Seq((a, b), (a, c), (b, c)) }
        .groupBy(identity).view.mapValues(_.size).toMap
      e = e.filter(sup.getOrElse(_, 0) >= k - 2)
      out += ((r.toLong, e.size.toLong, alive.size.toLong))
    }
    out.result()
  }

  private val genEdges: Gen[Set[(Long, Long)]] = for {
    n <- Gen.choose(6, 14)
    density <- Gen.choose(2, 5)
    picks <- Gen.listOfN(n * density,
      Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield picks.collect { case (a, b) if a != b =>
    (math.min(a, b), math.max(a, b)) }.toSet

  test("trussPeelStats == naive full recount on random graphs (ScalaCheck)") {
    val prop = Prop.forAll(genEdges, Gen.oneOf(3, 4)) { (edges, k) =>
      val pairs = edges.toSeq.toDF("a", "b")
      val got = Graphs.trussPeelStats(
        Graphs.triangleTriples(pairs), pairs, rounds = 3, k = k,
        broadcastCap = 1000000L)
      val want = naivePeel(edges, rounds = 3, k = k)
      Prop(got == want) :| s"k=$k got=$got want=$want edges=$edges"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("peel fixpoint early-exit: a stable graph repeats its census rows") {
    // two disjoint K4s: every edge sits in 2 triangles, nothing ever
    // peels at k=4 — rounds 2 and 3 must replicate round 1 exactly
    // (the early-exit path), matching the naive recount
    def k4(off: Long) = for {
      a <- 0L to 3L; b <- (a + 1) to 3L
    } yield (a + off, b + off)
    val edges = (k4(0) ++ k4(10)).toSet
    val pairs = edges.toSeq.toDF("a", "b")
    val got = Graphs.trussPeelStats(Graphs.triangleTriples(pairs), pairs,
      rounds = 3, k = 4, broadcastCap = 1000000L)
    assert(got == naivePeel(edges, 3, 4))
    assert(got == Seq((0L, 12L, 8L), (1L, 12L, 8L), (2L, 12L, 8L), (3L, 12L, 8L)))
  }

  test("peel fallback path (broadcastCap = 0): shuffled subtraction + full recount") {
    // cap 0 forces every round down the non-broadcast branch, where the
    // next round recounts support in full instead of subtracting the
    // incremental delta — the cluster-scale guard must stay equivalent
    val prop = Prop.forAll(genEdges, Gen.oneOf(3, 4)) { (edges, k) =>
      val pairs = edges.toSeq.toDF("a", "b")
      val got = Graphs.trussPeelStats(
        Graphs.triangleTriples(pairs), pairs, rounds = 3, k = k,
        broadcastCap = 0L)
      val want = naivePeel(edges, rounds = 3, k = k)
      Prop(got == want) :| s"k=$k got=$got want=$want edges=$edges"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }

  test("minLabelRounds reaches the connected-components fixpoint (ScalaCheck)") {
    val prop = Prop.forAll(genEdges.suchThat(_.nonEmpty)) { edges =>
      val sym = edges.toSeq.toDF("u", "v")
        .union(edges.toSeq.map(_.swap).toDF("u", "v"))
      // enough rounds to cover any diameter at n <= 14
      val got = Graphs.minLabelRounds(sym, 14)
        .as[(Long, Long)].collect().toMap
      // driver-side union-find reference
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2))
      val want = nodes.map(n => n -> find(n)).toMap
      Prop(got == want) :| s"got=$got want=$want"
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
