package graft.queries

import graft.SparkSpec

/** `q_k_anonymity` decodes the ROLLUP lattice level from
  * `grouping_id()`, so a genuinely-NULL quasi-identifier VALUE is a
  * class of its own at every level — an `isNull` decode would misfile
  * every class whose `n` is NULL into the fully-generalized level 3.
  */
class KAnonLatticeSpec extends SparkSpec {
  import spark.implicits._

  test("a NULL quasi-identifier stays a level-0 class, never aliases level 3") {
    // one k-satisfying class with n = NULL (6 rows) beside one
    // violating class with n = 1 (2 rows, k = 5)
    val rows = Seq.fill(6)((Option.empty[Long], "A", 0L)) ++
      Seq.fill(2)((Option(1L), "A", 0L))
    val got = ExtraQueries.kAnonLattice(rows.toDF("n", "m", "b"))
      .select("level", "n_classes", "n_violating", "min_class")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    // levels 0-2: the NULL-n class and the n=1 class stay separate
    // (2 classes, 1 violating, min size 2)
    for (lvl <- 0L to 2L)
      assert(got(lvl) == ((2L, 1L, 2L)),
        s"level $lvl must keep the NULL-n class distinct: ${got(lvl)}")
    // level 3 is ONLY the grand total (1 class of 8). The old isNull
    // decode filed all three NULL-n rollup classes here too.
    assert(got(3L) == ((1L, 0L, 8L)),
      s"level 3 must be the grand total alone: ${got(3L)}")
  }
}
