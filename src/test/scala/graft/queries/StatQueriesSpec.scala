package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** Independent recomputations of the round-6 statistics queries on
  * sf0.001 — each test re-derives the answer by a DIFFERENT method
  * (flat single-pass vs the query's distributed shape, or a driver-side
  * fold over the collected series) so a bug in the scale-safe
  * formulation can't hide behind an oracle that shares its structure.
  */
class StatQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, Sf)

  test("q_weighted_median: two-phase refinement equals the flat cumulative scan") {
    val got = run("q_weighted_median")
      .select("flag", "total_weight", "median_cents")
      .as[(String, Long, Long)].collect()
      .map { case (f, w, m) => f -> ((w, m)) }.toMap
    // flat recomputation: one global cumulative pass per flag
    val rows = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_returnflag").as("flag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"),
        col("l_quantity").cast("long").as("q"))
      .as[(String, Long, Long)].collect()
    val byFlag = rows.groupBy(_._1)
    assert(got.keySet == byFlag.keySet)
    for ((flag, rs) <- byFlag) {
      val total = rs.map(_._3).sum
      val sorted = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
        .toSeq.sortBy(_._1)
      var cum = 0L
      val median = sorted.collectFirst {
        case (c, w) if { cum += w; 2 * cum >= total } => c
      }.get
      assert(got(flag) == ((total, median)), s"flag $flag")
    }
  }

  test("q_ks_test: integer D numerator equals a driver-side ECDF fold") {
    val row = run("q_ks_test")
      .select("n1", "n2", "d_num").as[(Long, Long, Long)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"),
        col("o_orderpriority"))
      .as[(Long, String)].collect()
    val g1 = li.filter(r => Set("1-URGENT", "2-HIGH")(r._2)).map(_._1)
    val g2 = li.filterNot(r => Set("1-URGENT", "2-HIGH")(r._2)).map(_._1)
    val (n1, n2) = (g1.length.toLong, g2.length.toLong)
    assert((row._1, row._2) == ((n1, n2)))
    val c1 = g1.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c2 = g2.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var cum1 = 0L; var cum2 = 0L; var dMax = 0L
    for (v <- (c1.keySet ++ c2.keySet).toSeq.sorted) {
      cum1 += c1.getOrElse(v, 0L); cum2 += c2.getOrElse(v, 0L)
      dMax = math.max(dMax, math.abs(cum1 * n2 - cum2 * n1))
    }
    assert(row._3 == dMax)
    assert(row._3 <= n1 * n2)
  }

  test("ev_acf: lag-1 r equals a driver-side Pearson over the zero-filled series") {
    val got = run("ev_acf").select("lag", "n", "r")
      .as[(Long, Long, Double)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == (1L to 6L).toSet)
    assert(got.values.forall { case (_, r) => r >= -1.0 && r <= 1.0 })
    val counts = Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy("h").count().as[(Long, Long)].collect().toMap
    val lo = counts.keys.min; val hi = counts.keys.max
    val xs = (lo to hi).map(h => counts.getOrElse(h, 0L)).toArray
    val k = 1
    val (a, b) = (xs.dropRight(k), xs.drop(k))
    val n = a.length.toLong
    assert(got(1L)._1 == n)
    val (sx, sy) = (a.sum, b.sum)
    val sxx = a.map(x => x * x).sum
    val syy = b.map(x => x * x).sum
    val sxy = a.zip(b).map { case (x, y) => x * y }.sum
    val r = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
        math.sqrt((n * syy - sy * sy).toDouble))
    assert(got(1L)._2 == r)
  }

  test("q_cramers_v: V is in [0,1] and squares back to chi2/(N*dof_min)") {
    val row = run("q_cramers_v")
      .select("n", "dof_min", "chi2_micro", "v")
      .as[(Long, Long, Long, Double)].head()
    val (n, dofMin, chi2Micro, v) = row
    assert(v >= 0.0 && v <= 1.0)
    assert(v == math.sqrt(chi2Micro / 1e6 / (n * dofMin).toDouble))
    // dof_min over the documents table: min(|langs|, |sources|) - 1
    val d = spark.read.parquet(s"$Sf/documents.parquet")
    val nl = d.select("lang").distinct().count()
    val ns = d.select("source").distinct().count()
    assert(dofMin == math.min(nl - 1, ns - 1))
    assert(n == d.count())
  }

  test("g_diameter_2sweep: second eccentricity dominates the first") {
    val row = run("g_diameter_2sweep")
      .select("ecc_from_0", "diameter_lb").as[(Long, Long)].head()
    val (ecc0, diam) = row
    // the far node's eccentricity is >= the start node's by definition
    // of the 2-sweep (ecc(u) >= dist(0, u) = ecc_from_0)
    assert(diam >= ecc0)
    assert(ecc0 >= 0L)
  }

  test("ev_rolling_median_mad: flags equal a driver-side fold over the day series") {
    val got = run("ev_rolling_median_mad")
      .select("d", "x", "roll_med", "is_anom")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    val counts = Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) div 86400000").as("d"))
      .groupBy("d").count().as[(Long, Long)].collect().toMap
    val lo = counts.keys.min; val hi = counts.keys.max
    val xs = (lo to hi).map(h => counts.getOrElse(h, 0L)).toArray
    assert(got.length == xs.length)
    def med(a: Seq[Long]): Double = {
      val s = a.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2).toDouble
      else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
    }
    def medD(a: Seq[Double]): Double = {
      val s = a.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2)
      else s(n / 2 - 1) + (s(n / 2) - s(n / 2 - 1)) * 0.5
    }
    val gm = med(xs.toIndexedSeq)
    val mad = medD(xs.map(x => math.abs(x - gm)).toIndexedSeq)
    got.zipWithIndex.foreach { case ((d, x, rm, anom), i) =>
      assert(d == lo + i && x == xs(i))
      val expRm = med(xs.slice(math.max(0, i - 6), i + 1).toIndexedSeq)
      assert(rm == expRm, s"day $d rolling median")
      assert(anom == (math.abs(x - rm) > 3.0 * 1.4826 * mad), s"day $d flag")
    }
  }

  test("t_js_divergence: symmetric-bounded in [0, ln 2] over every source pair") {
    val rows = run("t_js_divergence").select("sa", "sb", "js")
      .as[(String, String, Double)].collect()
    assert(rows.nonEmpty)
    // nano-flooring can undershoot 0 by at most |terms| * 1e-9
    rows.foreach { case (sa, sb, js) =>
      assert(sa < sb)
      assert(js >= -1e-3 && js <= math.log(2.0) + 1e-9, s"$sa/$sb js=$js")
    }
    // every unordered pair appears exactly once
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
  }

  test("q_decile_lift: deciles partition customers and lifts average to 1") {
    val rows = run("q_decile_lift")
      .select("decile", "n_cust", "lift").as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).toSet.subsetOf((1L to 10L).toSet))
    // weighted (by n_cust) mean of lift over deciles is exactly the
    // overall-average ratio = 1 in real arithmetic
    val n = rows.map(_._2).sum
    val wAvg = rows.map { case (_, nc, l) => nc * l }.sum / n
    assert(math.abs(wAvg - 1.0) < 1e-9)
  }

  test("q_sprt: decision point equals a sequential driver-side fold") {
    val got = run("q_sprt")
      .select("arm", "n_at_decision", "conversions", "llr_nano", "decision")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val kp = math.floor(math.log(0.21 / 0.19) * 1e9).toLong
    val kn = math.floor(math.log(0.79 / 0.81) * 1e9).toLong
    val a = math.floor(math.log(19.0) * 1e9).toLong
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), (col("event_type") === "purchase").as("p"))
      .as[(Long, Long, Long, Boolean)].collect()
    for (arm <- Seq(0L, 1L)) {
      val stream = ev.filter(_._1 % 2 == arm).sortBy(e => (e._2, e._3))
      var n = 0L; var cum = 0L
      val found = stream.iterator.map { e =>
        n += 1; if (e._4) cum += 1
        (n, cum, cum * kp + (n - cum) * kn)
      }.find { case (_, _, llr) => llr >= a || llr <= -a }
      found match {
        case Some((fn, fc, fl)) =>
          val dec = if (fl >= a) "accept_h1" else "accept_h0"
          assert(got(arm) == ((fn, fc, fl, dec)), s"arm $arm")
        case None =>
          // sf0.001's stream is short enough that an arm may never
          // cross a boundary — then the query must emit NO row for it
          assert(!got.contains(arm), s"arm $arm concluded without crossing")
      }
    }
  }

  test("g_rich_club: club size and internal edges shrink as k rises; phi in [0,1]") {
    val rows = run("g_rich_club").select("k", "n_k", "e_k", "phi")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    rows.foreach { case (_, nk, ek, phi) =>
      assert(phi >= 0.0 && phi <= 1.0)
      assert(ek <= nk * (nk - 1) / 2)
    }
    rows.zip(rows.tail).foreach { case ((_, n1, e1, _), (_, n2, e2, _)) =>
      assert(n2 <= n1 && e2 <= e1)
    }
  }

  test("g_entropy_rate: matches a driver-side recount of the transition chain") {
    val (nTypes, hNano, h) = run("g_entropy_rate")
      .select("n_transition_types", "h_nano", "entropy_rate")
      .as[(Long, Long, Double)].head()
    assert(h >= 0.0)
    val kRe = """"k"\s*:\s*(\d+)""".r
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("props"))
      .as[(Long, Long, Long, String)].collect()
    val edges = ev.groupBy(_._1).values.flatMap { es =>
      val ks = es.sortBy(e => (e._2, e._3))
        .map(e => kRe.findFirstMatchIn(e._4).get.group(1).toLong)
      ks.zip(ks.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(nTypes == edges.size)
    val w = edges.values.sum.toDouble
    val outW = edges.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum.toDouble).toMap
    val negH = edges.map { case ((s1, _), wij) =>
      math.floor(wij / w * math.log(wij / outW(s1)) * 1e9).toLong }.sum
    assert(hNano == -negH)
    assert(h == -negH / 1e9)
  }

  test("t_msttr: segment accounting matches a driver-side re-tokenization") {
    val got = run("t_msttr").select("source", "n_segments", "sum_types", "msttr")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.values.forall { case (_, _, m) => m > 0.0 && m <= 1.0 })
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    val exp = docs.groupBy(_._1).map { case (src, ds) =>
      val segs = ds.flatMap { case (_, text) =>
        text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
          .zipWithIndex.groupBy(_._2 / 50).values
          .filter(_.length == 50).map(_.map(_._1).distinct.length.toLong)
      }
      src -> ((segs.size.toLong, segs.sum))
    }
    // sources whose docs are all short yield zero segments → no row
    for ((src, (nSeg, sumT)) <- exp) {
      if (nSeg == 0) assert(!got.contains(src))
      else assert(got(src) == ((nSeg, sumT, sumT.toDouble / (nSeg * 50))),
        s"source $src")
    }
  }

  test("t_token_dispersion: top token's VMR matches the closed-form recount") {
    val rows = run("t_token_dispersion")
      .select("rk", "token", "cf", "df", "vmr")
      .as[(Long, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == 20)
    assert(rows.forall(_._5 > 0.0))
    // cf is non-increasing down the ranking
    rows.zip(rows.tail).foreach { case (a, b) => assert(a._3 >= b._3) }
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val n = docs.length.toLong
    val top = rows.head
    val perDoc = docs.map { case (_, t) =>
      t.trim.toLowerCase.split("\\s+").count(_ == top._2).toLong }
      .filter(_ > 0)
    val (cf, df, sxx) =
      (perDoc.sum, perDoc.length.toLong, perDoc.map(x => x * x).sum)
    assert((top._3, top._4) == ((cf, df)))
    assert(top._5 == (n * sxx - cf * cf).toDouble / (n * cf).toDouble)
  }

  test("ev_hurst_avm: slope equals a driver-side aggregated-variance fit") {
    val (nScales, slope, hurst) = run("ev_hurst_avm")
      .select("n_scales", "slope", "hurst").as[(Long, Double, Double)].head()
    assert(hurst == slope / 2.0)
    val counts = Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy("h").count().as[(Long, Long)].collect().toMap
    val lo = counts.keys.min; val hi = counts.keys.max
    val pts = Seq(1L, 2L, 4L, 8L, 16L).flatMap { m =>
      val blocks = (lo to hi).map(h => (h / m, counts.getOrElse(h, 0L)))
        .groupBy(_._1).values.filter(_.size == m).map(_.map(_._2).sum).toSeq
      val nb = blocks.size.toDouble
      val s1 = blocks.sum.toDouble
      val s2 = blocks.map(y => y * y).sum.toDouble
      val vr = (s2 - s1 * s1 / nb) / nb
      if (vr > 0)
        Some((math.floor(math.log(m.toDouble) * 1000).toLong,
          math.floor(math.log(vr) * 1000).toLong))
      else None
    }
    assert(nScales == pts.size)
    val np = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    assert(slope == (np * sxy - sx * sy) / (np * sxx - sx * sx))
  }

  test("g_assortativity: matches a driver-side Pearson over endpoint degrees") {
    val (nEdges, r) = run("g_assortativity")
      .select("n_edges", "assortativity").as[(Long, Double)].head()
    assert(r >= -1.0 && r <= 1.0)
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
      .as[(Long, Long)].collect()
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    assert(nEdges == pairs.size)
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ends = pairs.toSeq.flatMap(p =>
      Seq((deg(p._1), deg(p._2)), (deg(p._2), deg(p._1))))
    val m2 = ends.size.toDouble
    val sa = ends.map(_._1).sum.toDouble
    val sb = ends.map(_._2).sum.toDouble
    val saa = ends.map(e => e._1 * e._1).sum.toDouble
    val sbb = ends.map(e => e._2 * e._2).sum.toDouble
    val sab = ends.map(e => e._1 * e._2).sum.toDouble
    val exp = (m2 * sab - sa * sb) /
      (math.sqrt(m2 * saa - sa * sa) * math.sqrt(m2 * sbb - sb * sb))
    assert(r == exp)
  }

  test("t_heaps_law: milestone accounting matches a driver-side cumulative scan") {
    val got = run("t_heaps_law").select("source", "n_points", "beta")
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.nonEmpty)
    // natural-ish text: beta within [0, 1.2] (a saturated vocabulary on
    // the sf0.001 mini-corpus legitimately fits flat)
    got.values.foreach { case (np, b) =>
      assert(np >= 3)
      assert(b >= 0.0 && b < 1.2, s"implausible Heaps beta $b")
    }
    // recompute one source end-to-end
    val src = got.keySet.min
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .where(col("source") === src)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val toks = docs.map(_._2.trim.toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toSeq)
    val pts = Seq(4, 8, 16, 32, 64, 128, 256, 512, 1024)
      .filter(_ <= docs.length).map { m =>
        val pre = toks.take(m)
        (math.floor(math.log(pre.map(_.size).sum.toDouble) * 1000).toLong,
          math.floor(math.log(pre.flatten.distinct.size.toDouble) * 1000).toLong)
      }
    assert(got(src)._1 == pts.size)
    val np = pts.size.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    assert(got(src)._2 == (np * sxy - sx * sy) / (np * sxx - sx * sx))
  }

  test("t_neyman_alloc: allocations respect the budget and rank by N*sigma") {
    val rows = run("t_neyman_alloc")
      .select("source", "n_docs", "sigma_chars", "alloc")
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    // floor-division allocations never exceed the budget in total
    assert(rows.map(_._4).sum <= 1000L)
    assert(rows.forall(_._4 >= 0))
    // allocation order follows the N_h * sigma_h weight order
    val byWeight = rows.sortBy(r => (-r._2 * r._3, r._1))
    byWeight.zip(byWeight.tail).foreach { case (hi, lo) =>
      assert(hi._4 >= lo._4,
        s"allocation must be monotone in weight: $hi vs $lo")
    }
  }

  test("q_kruskal_wallis: H equals a driver-side midrank computation") {
    val (n, tieSum, h, hCorr) = run("q_kruskal_wallis")
      .select("n", "tie_sum", "h", "h_corrected")
      .as[(Long, Long, Double, Double)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"),
        col("o_orderpriority"))
      .as[(Long, String)].collect()
    assert(n == li.length)
    // midranks from pooled value counts
    val cnt = li.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(tieSum == cnt.values.map(t => t * t * t - t).sum)
    var cum = 0L
    val rank2 = cnt.toSeq.sortBy(_._1).map { case (v, c) =>
      val r = 2 * cum + c + 1; cum += c; v -> r }.toMap
    val groups = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val terms = groups.map { g =>
      val vs = li.filter(_._2 == g).map(_._1)
      val r2 = vs.map(rank2).sum
      (r2 / 2.0) * (r2 / 2.0) / vs.length
    }.reduce(_ + _)
    val nd = n.toDouble
    val expH = 12.0 / (nd * (nd + 1.0)) * terms - 3.0 * (nd + 1.0)
    assert(h == expH)
    assert(hCorr == h / (1.0 - tieSum.toDouble / (nd * nd * nd - nd)))
    assert(h >= 0.0 || math.abs(h) < 1e-9)
  }

  test("q_two_proportion_z: z equals the pooled-variance closed form") {
    val (n1, x1, n2, x2, diff, z) = run("q_two_proportion_z")
      .select("n1", "x1", "n2", "x2", "diff", "z")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), col("event_type")).as[(Long, String)].collect()
    val a0 = ev.filter(_._1 % 2 == 0); val a1 = ev.filter(_._1 % 2 == 1)
    assert((n1, n2) == ((a0.length.toLong, a1.length.toLong)))
    assert((x1, x2) == ((a0.count(_._2 == "purchase").toLong,
      a1.count(_._2 == "purchase").toLong)))
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val pp = (x1 + x2).toDouble / (n1 + n2)
    assert(diff == p1 - p2)
    assert(z == (p1 - p2) /
      math.sqrt(pp * (1.0 - pp) * (1.0 / n1 + 1.0 / n2)))
  }

  test("ev_hill_tail: estimate equals a driver-side order-statistics fold") {
    val (k, thr, hill, alpha) = run("ev_hill_tail")
      .select("k", "threshold_cents", "hill", "alpha")
      .as[(Long, Long, Double, Double)].head()
    assert(alpha == 1.0 / hill && hill > 0.0)
    val cents = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase" && col("value") > 0)
      .select(floor(col("value") * 100 + 0.5).cast("long"), col("event_id"))
      .as[(Long, Long)].collect()
      .sortBy(t => (-t._1, t._2)).map(_._1)
    val xk1 = cents(200)
    assert((k, thr) == ((200L, xk1)))
    val sumMicro = cents.take(200)
      .map(x => math.floor(math.log(x.toDouble / xk1) * 1e6).toLong).sum
    assert(hill == sumMicro / 1e6 / 200.0)
  }

  test("g_reciprocity: counts equal a driver-side edge-set intersection") {
    val (nE, nR, nD, r) = run("g_reciprocity")
      .select("n_edges", "n_recip", "n_dyads", "reciprocity")
      .as[(Long, Long, Long, Double)].head()
    assert(nD == nR / 2 && r == nR.toDouble / nE)
    assert(r >= 0.0 && r <= 1.0)
    val kRe = """"k"\s*:\s*(\d+)""".r
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("props"))
      .as[(Long, Long, Long, String)].collect()
    val edges = ev.groupBy(_._1).values.flatMap { es =>
      val ks = es.sortBy(e => (e._2, e._3))
        .map(e => kRe.findFirstMatchIn(e._4).get.group(1).toLong)
      ks.zip(ks.tail)
    }.filter(e => e._1 != e._2).toSet
    assert(nE == edges.size)
    assert(nR == edges.count(e => edges((e._2, e._1))))
  }

  test("q_theil_index: decomposition reconciles and matches a driver-side fold") {
    val (nC, nN, tTot, tBetween, tWithin) = run("q_theil_index")
      .select("n_customers", "n_nations", "theil_total", "theil_between",
        "theil_within")
      .as[(Long, Long, Double, Double, Double)].head()
    // exact reconciliation by construction
    assert(tWithin == tTot - tBetween)
    assert(tTot >= 0.0 && tBetween >= -1e-6)
    val spend = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy("o_custkey")
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("x"))
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("x")).as[(Long, Long)].collect()
    assert(nC == spend.length)
    assert(nN == spend.map(_._1).distinct.length)
    val n = spend.length.toDouble
    val xt = spend.map(_._2).sum.toDouble
    val mu = xt / n
    val sumNano = spend.map { case (_, x) =>
      math.floor(x / mu * math.log(x / mu) * 1e9).toLong }.sum
    assert(tTot == sumNano / 1e9 / n)
    val bSum = spend.groupBy(_._1).values.map { g =>
      val xg = g.map(_._2).sum.toDouble; val ng = g.length.toDouble
      math.floor(xg / xt * math.log(xg / ng / mu) * 1e9).toLong
    }.sum
    assert(tBetween == bSum / 1e9)
  }

  test("g_path_lengths: histogram closes at 1.0 and reconciles with g_closeness") {
    val rows = run("g_path_lengths")
      .select("hop", "n_pairs", "cum_pairs", "cum_share")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // cumulative column is an exact prefix sum and closes at share 1.0
    var cum = 0L
    rows.foreach { case (_, np, cp, _) => cum += np; assert(cp == cum) }
    rows.lastOption.foreach { last => assert(last._4 == 1.0) }
    // total reachable pairs must equal the sibling centrality query's
    // per-source reach counts (both ride the same multi-source BFS);
    // at sf0.001 the w >= 4 backbone is empty and BOTH must agree on 0
    val reach = run("g_closeness").select("n_reached").as[Long].collect().sum
    assert(cum == reach)
  }

  test("d_lsh_band_sweep: recall and candidate volume rise with band count") {
    val rows = run("d_lsh_band_sweep")
      .select("bands", "rows_per_band", "n_cand", "n_hits", "n_true", "recall")
      .as[(Long, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      Seq((1L, 9L), (3L, 3L), (9L, 1L)))
    // more bands = more permissive banding: candidates and recall are
    // monotone non-decreasing (the 1-(1-j^r)^b S-curve)
    rows.zip(rows.tail).foreach { case (lo, hi) =>
      assert(hi._3 >= lo._3 && hi._6 >= lo._6, s"$lo -> $hi")
    }
    rows.foreach { case (_, _, nc, nh, nt, rec) =>
      assert(nh <= nc && nh <= nt)
      assert(rec == nh.toDouble / nt)
    }
    // single-row bands match on ANY shared lane: recall must be high
    assert(rows.last._6 >= 0.9, s"9x1 recall ${rows.last._6}")
  }

  test("ev_weibull_fit: fit equals a driver-side median-rank regression") {
    val (nU, nP, shape, scale) = run("ev_weibull_fit")
      .select("n_users", "n_points", "shape", "scale_minutes")
      .as[(Long, Long, Double, Double)].head()
    assert(shape > 0.0 && scale > 0.0)
    val life = Tables.events(spark, Sf)
      .groupBy("user_id")
      .agg(expr("(max(unix_millis(ts)) - min(unix_millis(ts))) div 60000")
        .as("v"))
      .where(col("v") >= 1).select("v").as[Long].collect()
    assert(nU == life.length)
    val n = life.length.toDouble
    val perV = life.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
    assert(nP == perV.length)
    var cum = 0L
    val pts = perV.map { case (v, c) =>
      cum += c
      (math.floor(math.log(v.toDouble) * 1000).toLong,
        math.floor(math.log(-math.log(1.0 - (cum - 0.3) / (n + 0.4)))
          * 1000).toLong)
    }
    val np = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum.toDouble, pts.map(_._2).sum.toDouble)
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val expShape = (np * sxy - sx * sy) / (np * sxx - sx * sx)
    assert(shape == expShape)
    assert(scale ==
      math.exp(-(sy / np - expShape * sx / np) / 1000.0 / expShape))
  }

  test("ev_overdispersion: closed form equals the definitional sum of squares") {
    val (n, mean, disp, vmr) = run("ev_overdispersion")
      .select("n", "mean_per_hour", "dispersion", "vmr")
      .as[(Long, Double, Double, Double)].head()
    assert(vmr == disp / (n - 1.0))
    val counts = Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy("h").count().as[(Long, Long)].collect().toMap
    val xs = (counts.keys.min to counts.keys.max)
      .map(h => counts.getOrElse(h, 0L))
    assert(n == xs.length)
    val s1 = xs.sum.toDouble; val s2 = xs.map(x => x * x).sum.toDouble
    assert(mean == s1 / n)
    assert(disp == (n * s2 - s1 * s1) / s1)
    // definitional check in exact rational form:
    // D·s1 = n·Σx² − (Σx)² = n·Σ(x−x̄)² — identical up to the one division
    assert(disp * s1 == n * s2 - s1 * s1)
  }

  test("t_vocab_jaccard: pairs agree with driver-side vocabulary sets") {
    val rows = run("t_vocab_jaccard")
      .select("sa", "sb", "va", "vb", "n_inter", "vocab_jaccard")
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val vocab = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.flatMap(_._2.trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty)).toSet).toMap
    // every unordered pair appears once
    assert(rows.length == vocab.size * (vocab.size - 1) / 2)
    rows.foreach { case (sa, sb, va, vb, ni, j) =>
      assert(va == vocab(sa).size && vb == vocab(sb).size)
      assert(ni == (vocab(sa) intersect vocab(sb)).size)
      assert(j == ni.toDouble / (va + vb - ni))
    }
  }

  test("q_anova_f: pinned-column F equals a driver-side group fold") {
    val row = run("q_anova_f")
      .select("n", "k", "ss_between", "ss_within", "f_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity").cast("long"), col("o_orderpriority"))
      .as[(Long, String)].collect()
    val groups = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val by = li.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val n = li.length.toLong
    assert(row._1 == n && row._2 == 5L)
    // same fixed group order, same IEEE op tree as the query
    val between = groups.map { g =>
      val s = by(g).sum.toDouble; s * s / by(g).length.toDouble
    }.reduce(_ + _)
    val s = li.map(_._1).sum.toDouble
    val ss = li.map(v => v._1 * v._1).sum.toDouble
    val ssb = between - s * s / n.toDouble
    val ssw = ss - between
    assert(row._3 == ssb && row._4 == ssw)
    assert(row._5 == (ssb / 4.0) / (ssw / (n.toDouble - 5.0)))
    // and the test statistic is a sane non-negative number
    assert(row._5 >= 0.0 && !row._5.isNaN)
  }

  test("q_levene_bf: count-table medians and W equal a flat per-row fold") {
    val row = run("q_levene_bf")
      .select("n", "k", "ssb_z", "ssw_z", "w_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_quantity").cast("long"), col("o_orderpriority"))
      .as[(Long, String)].collect()
    val groups = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val by = li.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    // exact median in doubled units from the sorted values directly
    // (the query derives it from cumulative counts — different route)
    def med2(vs: Seq[Long]): Long = {
      val n = vs.length
      vs((n + 1) / 2 - 1) + vs(n / 2 + 1 - 1)
    }
    val zBy = groups.map { g =>
      val m2 = med2(by(g)); g -> by(g).map(v => math.abs(2 * v - m2))
    }.toMap
    val n = li.length.toLong
    assert(row._1 == n && row._2 == 5L)
    val between = groups.map { g =>
      val z = zBy(g).sum.toDouble; z * z / zBy(g).length.toDouble
    }.reduce(_ + _)
    val zTot = groups.map(g => zBy(g).sum).sum.toDouble
    val qTot = groups.map(g => zBy(g).map(z => z * z).sum).sum.toDouble
    val ssb = between - zTot * zTot / n.toDouble
    val ssw = qTot - between
    assert(row._3 == ssb && row._4 == ssw)
    assert(row._5 == (ssb / 4.0) / (ssw / (n.toDouble - 5.0)))
  }

  test("q_t_closeness: common-denominator EMD equals a probability-space fold") {
    val got = run("q_t_closeness")
      .select("n", "m", "n_g", "t_close")
      .as[(Long, String, Long, Double)].collect()
      .map { case (n, m, ng, t) => (n, m) -> ((ng, t)) }.toMap
    val rows = spark.read.parquet(s"$Sf/customer.parquet")
      .select(col("c_nationkey").cast("long"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"))
      .as[(Long, String, Long)].collect()
    val buckets = rows.map(_._3).distinct.sorted
    val nn = rows.length.toDouble
    val globP = buckets.map(b => rows.count(_._3 == b) / nn)
    val byClass = rows.groupBy(r => (r._1, r._2))
    assert(got.keySet == byClass.keySet)
    for (((n, m), rs) <- byClass) {
      val ng = rs.length
      assert(got((n, m))._1 == ng.toLong)
      // independent route: double probability space, not integer
      // common-denominator — agreement to float tolerance
      val p = buckets.map(b => rs.count(_._3 == b).toDouble / ng)
      var cum = 0.0; var s = 0.0
      for (i <- buckets.indices) { cum += p(i) - globP(i); s += math.abs(cum) }
      val t = s / (buckets.length - 1)
      assert(math.abs(got((n, m))._2 - t) < 1e-9, s"class ($n,$m)")
      assert(got((n, m))._2 >= 0.0 && got((n, m))._2 <= 1.0 + 1e-12)
    }
  }

  test("q_psi_drift: nano-summed PSI equals a double fold and is symmetric-ish") {
    val rows = run("q_psi_drift")
      .select("bin", "c_base", "c_cur", "term_nano", "psi_nano")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._4).sum == rows.head._5) // total is the exact sum
    val nb = rows.length
    val tBase = rows.map(_._2).sum.toDouble + nb
    val tCur = rows.map(_._3).sum.toDouble + nb
    val psi = rows.map { case (_, cb, cc, _, _) =>
      val p = (cb + 1) / tBase; val q = (cc + 1) / tCur
      (p - q) * math.log(p / q)
    }.sum
    assert(psi >= 0.0) // PSI is a sum of (p-q)ln(p/q) >= 0 terms
    assert(math.abs(rows.head._5 / 1e9 - psi) < nb * 1e-9 + 1e-9)
  }

  test("t_readability: micro-summed scores equal a per-word driver fold") {
    val got = run("t_readability")
      .select("source", "n_docs", "mean_fk_grade", "mean_reading_ease")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    def sylOf(w: String): Long = {
      val runs = "[aeiouy]+".r.findAllIn(w).length
      math.max(1L, runs - (if (w.endsWith("e") && runs > 1) 1 else 0))
    }
    val bySource = docs.groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    for ((src, ds) <- bySource) {
      val scored = ds.map { case (_, text) =>
        val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val nw = ws.length.toDouble
        val nsyl = ws.map(sylOf).sum.toDouble
        val ns = math.max(1, "[.!?]+".r.findAllIn(text).length).toDouble
        (math.floor((0.39 * (nw / ns) + 11.8 * (nsyl / nw) - 15.59) * 1e6),
          math.floor((206.835 - 1.015 * (nw / ns) - 84.6 * (nsyl / nw)) * 1e6))
      }
      val n = scored.length
      val (fk, ease) = (scored.map(_._1).sum, scored.map(_._2).sum)
      assert(got(src)._2 == n.toLong)
      assert(got(src)._3 == fk / 1e6 / n, s"source $src fk")
      assert(got(src)._4 == ease / 1e6 / n, s"source $src ease")
    }
  }

  test("q_kmv_intersect: sketch estimates reconcile with exact overlaps") {
    val rows = run("q_kmv_intersect")
      .select("ta", "tb", "n_merged", "ku", "rho", "est_union", "est_inter")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(rows.length == 10) // C(5,2) event-type pairs
    val ev = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("event_type"), col("user_id").cast("long"))
      .as[(String, Long)].collect()
    val sets = ev.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((ta, tb, nm, ku, rho, estU, estI) <- rows) {
      val exactU = (sets(ta) union sets(tb)).size
      val exactI = (sets(ta) intersect sets(tb)).size
      assert(rho <= ku && ku <= nm)
      // sf0.001 audiences are far smaller than K=256, so the sketch IS
      // the union (up to 32-bit md5-slice collisions, none here) and
      // the estimates must be exact counts
      if (nm <= 256) {
        assert(estU == exactU.toDouble, s"($ta,$tb) union")
        assert(math.abs(estI - exactI.toDouble) <= 1e-9, s"($ta,$tb) inter")
      } else {
        assert(math.abs(estU - exactU) / exactU < 0.25)
        assert(math.abs(estI - exactI) <= 0.25 * exactU)
      }
    }
  }

  test("g_ktruss: cascade equals a driver-side set-based peel") {
    val got = run("g_ktruss")
      .select("round", "n_edges", "n_tri_alive")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // rebuild the co-order graph and peel with plain Scala sets
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    var edges = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    def tris(e: Set[(Long, Long)]): Seq[(Long, Long, Long)] = {
      val adj = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      e.toSeq.flatMap { case (a, b) =>
        (adj.getOrElse(a, Set.empty) intersect adj.getOrElse(b, Set.empty))
          .map(c => (a, b, c)) // a<b, b<c and c>a by construction order
      }
    }
    val t0 = tris(edges)
    assert(got(0) == ((0L, edges.size.toLong, t0.size.toLong)))
    for (r <- 1 to 3) {
      val alive = tris(edges)
      val sup = alive.flatMap { case (a, b, c) =>
        Seq((a, b), (a, c), (b, c)) }
        .groupBy(identity).view.mapValues(_.size).toMap
      edges = edges.filter(e => sup.getOrElse(e, 0) >= 2)
      assert(got(r)._2 == edges.size.toLong, s"round $r edges")
      assert(got(r)._3 == alive.size.toLong, s"round $r tris")
    }
    // peel is monotone
    assert(got.map(_._2).zip(got.map(_._2).tail).forall { case (a, b) => b <= a })
  }

  test("s_dbscan: roles satisfy the DBSCAN axioms on the LSH neighbor graph") {
    import graft.operators.Similarity
    val got = run("s_dbscan").select("id", "role", "cluster")
      .as[(Long, String, Long)].collect()
      .map(r => r._1.toInt -> ((r._2, r._3))).toMap
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val planes = Similarity.planes(16, 64)
    val nbrs = Similarity.lshCandidates(e, planes, 4, 4, 0.3)
      .select(col("a_id").cast("int"), col("b_id").cast("int"))
      .as[(Int, Int)].collect()
    val adj = (nbrs ++ nbrs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val core = adj.filter(_._2.size >= 4).keySet
    for ((id, (role, cluster)) <- got) {
      val n = adj.getOrElse(id, Set.empty)
      role match {
        case "core"   => assert(core(id) && cluster >= 0)
        case "border" => assert(!core(id) && (n intersect core).nonEmpty)
        case "noise"  => assert(!core(id) && (n intersect core).isEmpty
          && cluster == -1L)
      }
    }
    // cluster label of a core point is the min id reachable through
    // core-core edges (driver-side BFS over the core subgraph)
    for (c <- core) {
      var seen = Set(c); var frontier = Set(c)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(x =>
          adj(x) intersect core).diff(seen)
        seen ++= frontier
      }
      assert(got(c)._2 == seen.min.toLong, s"core $c")
    }
  }

  test("ev_pacf: Durbin-Levinson output equals a driver-side recursion") {
    val rows = run("ev_pacf").select("lag", "acf_r", "pacf")
      .as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 5L))
    val r = rows.map(_._2) // the query's own ACF inputs — recursion is
    // re-derived INDEPENDENTLY with plain Scala doubles below
    val phi = Array.ofDim[Double](6, 6)
    phi(1)(1) = r(0)
    for (k <- 2 to 5) {
      var num = r(k - 1); var den = 1.0
      for (j <- 1 until k) {
        num -= phi(k - 1)(j) * r(k - j - 1)
        den -= phi(k - 1)(j) * r(j - 1)
      }
      phi(k)(k) = num / den
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    for (k <- 1 to 5)
      assert(rows(k - 1)._3 == phi(k)(k), s"lag $k")
    // lag-1 PACF must equal lag-1 ACF by definition
    assert(rows(0)._3 == rows(0)._2)
  }

  test("ev_croston: fold equals a driver-side per-user recomputation") {
    val got = run("ev_croston")
      .select("user_id", "n_demand_days", "z_hat", "p_hat",
        "croston_forecast")
      .as[(Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val demands = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_millis(ts) div 86400000").as("day"))
      .groupBy("user_id", "day").agg(count(lit(1)).as("x"))
      .as[(Long, Long, Long)].collect()
    val byUser = demands.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    for ((u, ds) <- byUser) {
      val seq0 = ds.sortBy(_._2)
      var z = seq0.head._3.toDouble; var p = 1.0; var last = seq0.head._2
      for ((_, d, x) <- seq0.tail) {
        z = (x.toDouble + z) / 2; p = ((d - last).toDouble + p) / 2
        last = d
      }
      val (_, n, zh, ph, f) = got(u)
      assert(n == seq0.length.toLong && zh == z && ph == p && f == z / p,
        s"user $u")
    }
  }

  test("t_textrank: top keyword ranks match a driver-side pagerank") {
    val got = run("t_textrank").select("word", "rank_micro")
      .as[(String, Long)].collect()
    assert(got.length == 20)
    // driver recomputation: build the co-occurrence graph and run the
    // same integer trajectory with plain Scala maps
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").as[String].collect()
    val co = scala.collection.mutable.Map.empty[(String, String), Long]
    for (text <- docs) {
      val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      for (i <- ws.indices; off <- 1 to 2 if i + off < ws.length
           if ws(i) != ws(i + off)) {
        val (lo, hi) =
          if (ws(i) < ws(i + off)) (ws(i), ws(i + off))
          else (ws(i + off), ws(i))
        val k = (lo, hi)
        co(k) = co.getOrElse(k, 0L) + 1
      }
    }
    val edges = scala.collection.mutable.Map.empty[(String, String), Long]
    for (((x, y), w) <- co) {
      edges((x, y)) = edges.getOrElse((x, y), 0L) + w
      edges((y, x)) = edges.getOrElse((y, x), 0L) + w
    }
    val nodes = docs.flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty).distinct
    val wOut = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val inflow = scala.collection.mutable.Map.empty[String, Long]
      for (((s0, d), w) <- edges) {
        inflow(d) = inflow.getOrElse(d, 0L) + rank(s0) * w / wOut(s0)
      }
      rank = nodes.map(n =>
        n -> (150000L + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    val expect = rank.toSeq.sortBy { case (w, r) => (-r, w) }.take(20)
    assert(got.toSeq == expect)
  }

  test("t_burrows_delta: self-distance is zero-ish, symmetry and triangle hold") {
    val rows = run("t_burrows_delta").select("sa", "sb", "n_words", "delta")
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val d = rows.map { case (a, b, _, v) => (a, b) -> v }.toMap
    val sources = (rows.map(_._1) ++ rows.map(_._2)).distinct.sorted
    assert(rows.length == sources.length * (sources.length - 1) / 2)
    for ((_, _, n, v) <- rows) {
      assert(n >= 1 && n <= 30 && v >= 0.0 && !v.isNaN)
    }
    // z-scores across sources sum to ~0 per word, so the delta between
    // two maximally-different sources is bounded by the z range: check
    // the triangle inequality on the metric (city-block mean of fixed
    // word set is a true metric up to the nano floor)
    for (a <- sources; b <- sources if a < b; c <- sources
         if b < c) {
      val eps = 2e-9 // two nano-floor truncations
      assert(d((a, c)) <= d((a, b)) + d((b, c)) + eps, s"($a,$b,$c)")
    }
  }

  test("q_conformal: split, model, and quantile equal a driver-side fold") {
    val row = run("q_conformal")
      .select("n_train", "n_cal", "n_test", "q_hat_cents", "coverage")
      .as[(Long, Long, Long, Long, Double)].head()
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"),
        col("o_orderkey").cast("string"))
      .as[(String, Double, String)].collect()
      .map { case (seg, p, k) =>
        val nib = Integer.parseInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest(k.getBytes("UTF-8")).take(1).map("%02x".format(_))
            .mkString.take(1), 16)
        (seg, math.floor(p * 100 + 0.5).toLong, nib)
      }
    val train = o.filter(_._3 < 8)
    val cal = o.filter(r => r._3 >= 8 && r._3 < 12)
    val test = o.filter(_._3 >= 12)
    assert((row._1, row._2, row._3) ==
      ((train.length.toLong, cal.length.toLong, test.length.toLong)))
    val model = train.groupBy(_._1).view
      .mapValues(rs => rs.map(_._2).sum / rs.length).toMap
    val res = cal.map(r => math.abs(r._2 - model(r._1))).sorted
    val k = ((cal.length + 1) * 9 + 9) / 10
    val qhat = res(k - 1)
    assert(row._4 == qhat)
    val covered = test.count(r => math.abs(r._2 - model(r._1)) <= qhat)
    assert(row._5 == covered.toDouble / test.length)
    assert(row._5 >= 0.85) // the 1-alpha guarantee, with finite slack
  }

  test("q_wilcoxon_signed: rank sums reconcile and identities hold") {
    val row = run("q_wilcoxon_signed").select("n", "wp2", "wm2", "z")
      .as[(Long, Long, Long, Double)].head()
    val (n, wp2, wm2, z) = row
    // doubled rank sums over all signed pairs total n(n+1)
    assert(wp2 + wm2 == n * (n + 1))
    // z reproduces from the sums
    val zx = (wp2 / 2.0 - n * (n + 1.0) / 4.0) /
      math.sqrt(n * (n + 1.0) * (2.0 * n + 1.0) / 24.0)
    assert(z == zx)
    // driver recount of the paired differences
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"),
        (col("o_orderdate") >= lit("1998-01-01").cast("timestamp")))
      .as[(Long, Long, Boolean)].collect()
    val d = o.groupBy(_._1).view.mapValues { rs =>
      rs.filter(_._3).map(_._2).sum - rs.filterNot(_._3).map(_._2).sum
    }.toMap.filter(_._2 != 0L)
    assert(n == d.size.toLong)
    val pos = d.values.count(_ > 0)
    // with no |d| ties (cents), wp2/2 is the plain rank sum of positives
    val ranks = d.values.map(math.abs).toSeq.sorted.zipWithIndex
      .map { case (v, i) => v -> (i + 1) }.toMap
    val wplus = d.values.filter(_ > 0).map(v => ranks(math.abs(v))).sum
    if (ranks.size == d.size) // no ties
      assert(wp2 == 2L * wplus, s"pos=$pos")
  }

  test("ev_kalman: fold equals a driver recomputation; gain settles to steady state") {
    val got = run("ev_kalman")
      .select("user_id", "n_events", "level", "p_var")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    val ev = Tables.events(spark, Sf)
      .where(col("value").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
      .sortBy(r => (r._1, r._2.toInstant.getEpochSecond, r._2.getNanos, r._3))
    val byUser = ev.groupBy(_._1)
    assert(got.keySet == byUser.keySet)
    // steady-state posterior variance for q=1, r=4:
    // P* solves P = (P+q)r/(P+q+r) => P* = (-1+sqrt(17))/2
    val pStar = (-1.0 + math.sqrt(17.0)) / 2.0
    for ((u, rs) <- byUser) {
      var x = rs.head._4; var p = 1.0; var n = 1L
      for ((_, _, _, z) <- rs.tail) {
        val pp = p + 1.0; val k = pp / (pp + 4.0)
        x = x + k * (z - x); p = (1.0 - k) * pp; n += 1
      }
      val (_, gn, gx, gp) = got(u)
      assert(gn == n && gx == x && gp == p, s"user $u")
      if (n >= 10) assert(math.abs(gp - pStar) < 1e-6, s"user $u steady state")
    }
  }

  test("d_cdc_chunks: driver AE chunker reproduces the stats; cuts are shift-resistant") {
    val got = run("d_cdc_chunks")
      .select("source", "n_chunks", "n_distinct", "mean_len")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def g(ch: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      java.lang.Long.parseLong(md.digest(ch.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    }
    def chunksOf(text: String): Seq[String] = {
      val gs = text.map(c => g(c.toString))
      val bounds = (32 to text.length).filter { i =>
        val lo = math.max(1, i - 31)
        gs(i - 1) > (lo until i).map(j => gs(j - 1)).max
      }
      val ends = (bounds :+ text.length).distinct.sorted
      ends.zip(0 +: ends.init).collect {
        case (e, s) if e > s => text.substring(s, e)
      }
    }
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    val bySource = docs.groupBy(_._1)
    assert(got.keySet == bySource.keySet)
    for ((src, ds) <- bySource) {
      val all = ds.flatMap(d => chunksOf(d._2))
      val (n, nd, ml) = (all.length.toLong, all.distinct.length.toLong,
        all.map(_.length.toLong).sum.toDouble / all.length)
      assert(got(src)._2 == n && got(src)._3 == nd, s"source $src")
      assert(math.abs(got(src)._4 - ml) < 1e-9, s"source $src mean")
    }
    // shift-resistance: inserting one char at the front of a long doc
    // leaves the chunk SET after the first window mostly intact, where
    // fixed-width blocks would shift every boundary
    val text = docs.maxBy(_._2.length)._2
    val a = chunksOf(text).toSet
    val b = chunksOf("Q" + text).toSet
    assert((a intersect b).size.toDouble / a.size > 0.5,
      s"CDC must keep most chunks across a 1-char shift: ${(a intersect b).size}/${a.size}")
  }

  test("ev_page_hinkley: window folds equal a driver-side sequential PH") {
    val row = run("ev_page_hinkley")
      .select("n_hours", "n_alarms", "max_ph_nano")
      .as[(Long, Long, Long)].head()
    val counts = Tables.events(spark, Sf)
      .select(expr("unix_millis(ts) div 3600000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("x"))
      .as[(Long, Long)].collect().toMap
    val hours = counts.keys.min to counts.keys.max
    assert(row._1 == hours.length.toLong)
    var s = 0L; var m = 0L; var mmin = 0L; var maxPh = 0L; var alarms = 0L
    var t = 0L
    val sN = hours.map(h => counts.getOrElse(h, 0L)).sum
    // pass 1 computes s_n implicitly; the alarm test is retrospective
    // with the adaptive lambda, exactly as the query defines it
    for (h <- hours) {
      t += 1; val x = counts.getOrElse(h, 0L); s += x
      m += math.floor((x.toDouble - s.toDouble / t - 0.5) * 1e9).toLong
      mmin = math.min(mmin, m)
      val ph = m - mmin
      maxPh = math.max(maxPh, ph)
      if (ph * hours.length > 20L * sN * 1000000000L) alarms += 1
    }
    assert(row._3 == maxPh && row._2 == alarms)
  }

  test("q_durbin_watson: DW reproduces from residuals and sits in [0,4]") {
    val rows = run("q_durbin_watson").select("l_returnflag", "n_months", "dw")
      .as[(String, Long, Double)].collect()
    assert(rows.length == 3)
    for ((flag, n, dw) <- rows) {
      assert(n > 12, s"flag $flag")
      assert(dw >= 0.0 && dw <= 4.0, s"flag $flag dw=$dw")
    }
    // driver recomputation for one flag, dollars-floored as the query
    val monthly = spark.read.parquet(s"$Sf/lineitem.parquet")
      .where(col("l_returnflag") === "A")
      .groupBy(((year(col("l_shipdate")) - 1992) * 12 +
        month(col("l_shipdate")) - 1).cast("long").as("x"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
        .as("y"))
      .as[(Long, Long)].collect().sortBy(_._1)
    val n = monthly.length.toLong
    val sx = monthly.map(_._1).sum; val sy = monthly.map(_._2).sum
    val sxx = monthly.map(r => r._1 * r._1).sum
    val sxy = monthly.map(r => r._1 * r._2).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    val e = monthly.map { case (x, y) =>
      (y.toDouble - (sy.toDouble - num.toDouble / den.toDouble * sx.toDouble)
        / n.toDouble - num.toDouble / den.toDouble * x.toDouble) / 100.0
    }
    val e2 = e.map(v => math.floor(v * v).toLong).sum
    val de2 = e.zip(e.tail).map { case (a, b) =>
      math.floor((b - a) * (b - a)).toLong }.sum
    val dwA = rows.find(_._1 == "A").get._3
    assert(dwA == de2.toDouble / e2.toDouble)
  }

  test("m_audio_windows: frame geometry reproduces from payload sizes") {
    val rows = run("m_audio_windows")
      .select("media_id", "dur_ms", "n_windows", "win_idx", "start_ms",
        "end_ms")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .filter(_._1 % 3 == 1).map { case (id, t) =>
        id -> t.getBytes("UTF-8").length.toLong * 8 }.toMap
    val byMedia = rows.groupBy(_._1)
    assert(byMedia.keySet == docs.keySet)
    for ((id, rs) <- byMedia) {
      val dur = docs(id)
      val nw = math.max(0L, (dur - 25) / 10 + 1)
      assert(rs.forall(r => r._2 == dur && r._3 == nw), s"media $id")
      assert(rs.length.toLong == math.min(nw, 3L), s"media $id rows")
      for (r <- rs) {
        assert(r._5 == r._4 * 10 && r._6 == r._5 + 25)
        assert(r._6 <= dur || nw == 0, s"media $id window overruns clip")
      }
    }
  }

  test("m_payload_dedup: reclaimable bytes reconcile with raw duplicates") {
    val rows = run("m_payload_dedup")
      .select("kind", "n_payloads", "n_distinct", "reclaimable_bytes",
        "dup_ratio")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq == Seq("audio", "image", "video"))
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val kinds = Seq("image", "audio", "video")
    for ((kind, np, nd, rb, ratio) <- rows) {
      val ds = docs.filter(d => kinds((d._1 % 3).toInt) == kind)
      val groups = ds.groupBy(_._2)
      assert(np == ds.length.toLong && nd == groups.size.toLong)
      val expectRb = groups.values
        .map(g => (g.length - 1).toLong * g.head._2.getBytes("UTF-8").length)
        .sum
      assert(rb == expectRb, s"kind $kind")
      assert(ratio == 1.0 - nd.toDouble / np)
    }
  }

  test("q_cochran_q and q_mcnemar: panel folds equal driver recomputations") {
    val q = run("q_cochran_q").select("n", "t_total", "r2", "q_stat")
      .as[(Long, Long, Long, Double)].head()
    val m = run("q_mcnemar").select("n", "b", "c", "chi2")
      .as[(Long, Long, Long, Double)].head()
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey").cast("long"), year(col("o_orderdate")))
      .as[(Long, Int)].collect()
    val byCust = orders.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // Cochran: per-customer binary triple over 1995/1997/1999
    val years = Seq(1995, 1997, 1999)
    val flags = byCust.values.map(ys => years.map(y => if (ys(y)) 1L else 0L))
    val cs = years.indices.map(i => flags.map(_(i)).sum)
    val t = cs.sum
    val r2 = flags.map(f => { val r = f.sum; r * r }).sum
    assert((q._1, q._2, q._3) == ((byCust.size.toLong, t, r2)))
    val dev = cs.map(c => (c.toDouble - t.toDouble / 3.0) *
      (c.toDouble - t.toDouble / 3.0)).reduce(_ + _)
    assert(q._4 == 6.0 * dev / (3.0 * t - r2.toDouble))
    // McNemar: discordant 1996/2000 pairs
    val b = byCust.values.count(ys => ys(1996) && !ys(2000)).toLong
    val c = byCust.values.count(ys => !ys(1996) && ys(2000)).toLong
    assert((m._2, m._3) == ((b, c)))
    assert(m._4 == (math.abs(b.toDouble - c) - 1.0) *
      (math.abs(b.toDouble - c) - 1.0) / (b + c).toDouble)
  }

  test("g_link_pred_aa: scores equal a driver-side two-hop recomputation") {
    val got = run("g_link_pred_aa")
      .select("source", "candidate", "n_common", "aa_nano")
      .as[(Long, Long, Long, Long)].collect()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val pairs = li.groupBy(_._1).values.flatMap { ps =>
      val sorted = ps.map(_._2).sorted
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield (sorted(i), sorted(j))
    }.toSet
    val adj = (pairs.toSeq ++ pairs.toSeq.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val deg = adj.view.mapValues(_.size).toMap
    val sources = deg.toSeq.sortBy { case (u, d) => (-d, u) }.take(20)
      .map(_._1) // LinkPredSources = 20 in GraphQueries
    val expect = sources.flatMap { s0 =>
      val cands = adj(s0).flatMap(adj(_)) - s0 -- adj(s0)
      val scored = cands.toSeq.map { c =>
        val common = adj(s0) intersect adj(c)
        val aa = common.toSeq
          .map(w => math.floor(1e9 / math.log(deg(w).toDouble)).toLong).sum
        (s0, c, common.size.toLong, aa)
      }
      scored.sortBy(r => (-r._4, r._2)).take(3)
    }
    assert(got.toSet == expect.toSet)
    for ((_, _, nc, aa) <- got) assert(nc >= 1 && aa > 0)
  }

  test("q_srm: arm counts equal distinct-user parity counts") {
    val row = run("q_srm").select("n1", "n2", "chi2", "srm_flag")
      .as[(Long, Long, Double, Boolean)].head()
    val users = Tables.events(spark, Sf)
      .select(col("user_id")).distinct().as[Long].collect()
    val n1 = users.count(_ % 2 == 0).toLong
    val n2 = users.count(_ % 2 == 1).toLong
    assert((row._1, row._2) == ((n1, n2)))
    val chi2 = (n1 - n2).toDouble * (n1 - n2) / (n1 + n2)
    assert(row._3 == chi2)
    assert(row._4 == ((n1 - n2) * (n1 - n2) * 100 > 384 * (n1 + n2)))
  }

  test("ev_ltv_discounted: discounted sums equal a driver fold; discount engages") {
    val got = run("ev_ltv_discounted")
      .select("cohort_m", "n_users", "raw_cents", "disc_cents_micro",
        "ltv_per_user_dollars")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_millis(ts) div 604800000"),
        col("event_type"), col("value"))
      .as[(Long, Long, String, Option[Double])].collect()
    val cohort = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val disc = (0 to 83).map(k => math.floor(1e6 * math.pow(0.95, k)).toLong)
    val agg = scala.collection.mutable.Map
      .empty[Long, (Long, Long)] // cohort -> (raw, discMicro)
    for ((u, w, t, v) <- ev if t == "purchase" && v.isDefined) {
      val c = math.floor(v.get * 100 + 0.5).toLong
      val k = (w - cohort(u)).toInt
      val (r0, d0) = agg.getOrElse(cohort(u), (0L, 0L))
      agg(cohort(u)) = (r0 + c, d0 + c * disc(k))
    }
    val sizes = cohort.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(got.keySet == sizes.keySet)
    for ((cm, n) <- sizes) {
      val (raw, dm) = agg.getOrElse(cm, (0L, 0L))
      val (_, gn, gr, gd, gl) = got(cm)
      assert(gn == n.toLong && gr == raw && gd == dm, s"cohort $cm")
      assert(gl == dm.toDouble / 1e8 / n)
      // the discount actually engages: later-age purchases weigh less
      if (raw > 0) assert(dm <= raw * 1000000L, s"cohort $cm")
    }
  }

  test("t_fertility: ratios reproduce from a driver-side regex count") {
    val got = run("t_fertility")
      .select("lang", "n_docs", "n_words", "n_subwords", "fertility")
      .as[(String, Long, Long, Long, Double)].collect().map(r => r._1 -> r)
      .toMap
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("lang", "text").as[(String, String)].collect()
    for ((lang, ds) <- docs.groupBy(_._1)) {
      val words = ds.map(d => "\\S+".r.findAllIn(d._2).length.toLong).sum
      val sub = ds.map(d =>
        "[a-z]+|[0-9]+|[^a-z0-9\\s]".r
          .findAllIn(d._2.toLowerCase).length.toLong).sum
      val (_, n, w, s0, f) = got(lang)
      assert(n == ds.length.toLong && w == words && s0 == sub, s"lang $lang")
      assert(f == sub.toDouble / words)
      assert(f >= 1.0, s"lang $lang: subwords can never merge words")
    }
  }

  test("g_stationary_dist: mass is conserved up to flooring and matches pagerank's graph") {
    val rows = run("g_stationary_dist").select("node", "pi_micro")
      .as[(Long, Long)].collect()
    assert(rows.length == 20 && rows.forall(_._2 >= 0))
    // emitted in (pi desc, node) order
    val pis = rows.map(_._2)
    assert(pis.zip(pis.tail).forall { case (a, b) => a >= b })
    // undamped power iteration only LOSES mass to floor divisions:
    // top-20 mass must be <= n_nodes * 1e6 and positive overall
    assert(pis.sum > 0)
  }

  test("ev_retention_halflife and q_elasticity: OLS-on-logs folds reproduce") {
    val hl = run("ev_retention_halflife")
      .select("n_ages", "slope_micro_per_day", "halflife_days")
      .as[(Long, Double, Double)].head()
    // driver recomputation of the blended-retention fit
    val ev = Tables.events(spark, Sf)
      .select(col("user_id"), expr("unix_millis(ts) div 86400000"))
      .as[(Long, Long)].collect()
    val first = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val nUsers = first.size.toDouble
    val nK = ev.map { case (u, d0) => (u, d0 - first(u)) }
      .filter(r => r._2 >= 1 && r._2 <= 25).distinct
      .groupBy(_._2).view.mapValues(_.size).toMap
    val pts = nK.toSeq.sortBy(_._1).map { case (k, n) =>
      (k, math.floor(math.log(n / nUsers) * 1e6).toLong) }
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx)
    assert(hl._1 == n && hl._2 == slope)
    assert(hl._3 == -693147.1805599453 / slope)
    // elasticity: milli-floored log-log OLS
    val el = run("q_elasticity").select("n", "elasticity")
      .as[(Long, Double)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_discount"), col("l_quantity"))
      .as[(Double, Double)].collect()
    val p2 = li.map { case (disc, q) =>
      (math.floor(math.log(1.0 - disc) * 1e3).toLong,
        math.floor(math.log(q) * 1e3).toLong) }
    val n2 = p2.length.toLong
    val (sx2, sy2) = (p2.map(_._1).sum, p2.map(_._2).sum)
    val sxx2 = p2.map(p => p._1 * p._1).sum
    val sxy2 = p2.map(p => p._1 * p._2).sum
    assert(el._1 == n2)
    assert(el._2 == (n2 * sxy2 - sx2 * sy2).toDouble / (n2 * sxx2 - sx2 * sx2))
  }

  test("q_auc: rank identity equals a pairwise-comparison count") {
    val row = run("q_auc").select("n1", "n0", "auc")
      .as[(Long, Long, Double)].head()
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .as[(Long, Boolean)].collect()
    val pos = o.filter(_._2).map(_._1)
    val neg = o.filterNot(_._2).map(_._1)
    assert((row._1, row._2) == ((pos.length.toLong, neg.length.toLong)))
    // brute-force AUC: P(score_pos > score_neg) + 0.5 P(tie), via
    // sorted-merge counting (sf0.001 is small enough)
    val negSorted = neg.sorted
    def countLE(v: Long, strict: Boolean): Long = {
      // number of negatives < v (strict) or <= v
      var lo = 0; var hi = negSorted.length
      while (lo < hi) {
        val mid = (lo + hi) / 2
        val c = if (strict) negSorted(mid) < v else negSorted(mid) <= v
        if (c) lo = mid + 1 else hi = mid
      }
      lo.toLong
    }
    val num2 = pos.map(v => 2 * countLE(v, strict = true)
      + (countLE(v, strict = false) - countLE(v, strict = true))).sum
    val expect = num2.toDouble / (2.0 * pos.length * neg.length)
    assert(math.abs(row._3 - expect) < 1e-12)
  }

  test("q_mutual_info: MI is ~0 on independent columns and >0 on a copy") {
    val row = run("q_mutual_info").select("n", "mi_nats", "nmi_joint")
      .as[(Long, Double, Double)].head()
    assert(row._2 >= -1e-6 && row._2 < 0.05,
      s"independent synthetic columns must carry ~no MI: ${row._2}")
    assert(row._3 >= -1e-6 && row._3 <= 1.0 + 1e-12)
    // identity case driver-side: MI(X, X) = H(X) for the segment column
    val segs = spark.read.parquet(s"$Sf/customer.parquet")
      .select("c_mktsegment").as[String].collect()
    val n = segs.length.toDouble
    val h = -segs.groupBy(identity).values
      .map(g => g.size / n * math.log(g.size / n)).sum
    val miSelf = segs.groupBy(identity).values.map { g =>
      val p = g.size / n; p * math.log(p / (p * p))
    }.sum
    assert(math.abs(miSelf - h) < 1e-12) // the identity the query's
    // formula implements, sanity-checked in plain scala
  }

  test("g_conductance: phi in [0,1], and cut/vol reconcile with the edge list") {
    val rows = run("g_conductance")
      .select("community", "vol", "cut_edges", "conductance")
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 10)
    for ((c, vol, cut, phi) <- rows) {
      assert(cut <= vol, s"community $c: crossing edges bounded by volume")
      assert(phi >= 0.0 && phi <= 1.0, s"community $c phi=$phi")
    }
    // volumes are emitted descending
    val vols = rows.map(_._2)
    assert(vols.zip(vols.tail).forall { case (a, b) => a >= b })
    // total volume over ALL communities = 2m — check the top-10 subset
    // stays under it
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val m = li.groupBy(_._1).values.flatMap { ps =>
      val s0 = ps.map(_._2).sorted
      for (i <- s0.indices; j <- (i + 1) until s0.length) yield (s0(i), s0(j))
    }.toSet.size
    assert(vols.sum <= 2L * m)
  }

  test("s_silhouette: scores equal a driver-side centroid recomputation") {
    val got = run("s_silhouette")
      .select("label", "n_points", "mean_silhouette")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val e = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id").cast("long"), col("label").cast("long"),
        col("embedding"))
      .as[(Long, Long, Seq[Float])].collect()
      .map { case (id, l, v) =>
        (id, l,
          v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray) }
    val byLabel = e.groupBy(_._2)
    val cents = byLabel.view.mapValues { vs =>
      val n = vs.length.toLong
      val sums = vs.map(_._3).transpose.map(_.sum)
      (n, sums)
    }.toMap
    val sMicro = scala.collection.mutable.Map.empty[Long, List[Long]]
    for ((_, own, qv) <- e) {
      def distTo(l: Long): Double = {
        val (n, sq) = cents(l)
        val num = qv.zip(sq).map { case (q, s0) =>
          val d0 = n * q - s0; d0 * d0 }.sum
        math.sqrt(num.toDouble) / n.toDouble
      }
      val a = distTo(own)
      val b = cents.keys.filter(_ != own).map(distTo).min
      val s0 = math.floor((b - a) / math.max(a, b) * 1e6).toLong
      sMicro(own) = s0 :: sMicro.getOrElse(own, Nil)
    }
    assert(got.keySet == byLabel.keySet)
    for ((l, ss) <- sMicro) {
      val (_, n, mean) = got(l)
      assert(n == ss.length.toLong)
      assert(mean == ss.sum.toDouble / 1e6 / ss.length, s"label $l")
    }
  }

  test("ev_causal_impact: counterfactual and effects equal a driver OLS fold") {
    val got = run("ev_causal_impact")
      .select("day_idx", "actual_cents", "predicted_cents", "effect_cents",
        "cum_effect_cents")
      .as[(Long, Long, Double, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 7)
    val daily = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase" && col("value").isNotNull)
      .select(expr("unix_millis(ts) div 86400000"),
        floor(col("value") * 100 + 0.5).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val dlo = daily.keys.min; val dhi = daily.keys.max
    val pre = daily.filter(_._1 <= dhi - 7).toSeq
      .map { case (d0, r) => (d0 - dlo, r) }
    val n = pre.length.toLong
    val sx = pre.map(_._1).sum; val sy = pre.map(_._2).sum
    val sxx = pre.map(p => p._1 * p._1).sum
    val sxy = pre.map(p => p._1 * p._2).sum
    val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
    var cum = 0L
    for ((dIdx, actual, pred, eff, cumGot) <- got) {
      val expPred = (sy.toDouble - num.toDouble / den * sx) / n +
        num.toDouble / den * dIdx
      assert(actual == daily(dIdx + dlo))
      assert(pred == expPred, s"day $dIdx")
      assert(eff == math.floor(actual.toDouble - expPred).toLong)
      cum += eff
      assert(cumGot == cum)
    }
  }

  test("stream_psi: daily PSI equals a batch driver fold; baseline days sit low") {
    val got = run("stream_psi").select("day_epoch", "n_day", "psi_nano")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val p = Tables.events(spark, Sf)
      .where(col("event_type") === "purchase" && col("value").isNotNull)
      .select(expr("unix_millis(ts) div 86400000"),
        least(floor(col("value") / 10), lit(9)).cast("long"))
      .as[(Long, Long)].collect()
    val dlo = p.map(_._1).min
    val baseline = p.filter(_._1 < dlo + 15).groupBy(_._2).view
      .mapValues(_.size.toLong).toMap
    val tb = baseline.values.sum
    val byDay = p.groupBy(_._1)
    assert(got.map(_._1).toSeq == byDay.keys.toSeq.sorted.map(_ * 86400))
    for ((dayEpoch, nDay, psiNano) <- got) {
      val d0 = dayEpoch / 86400
      val counts = byDay(d0).groupBy(_._2).view.mapValues(_.size.toLong)
        .toMap
      val td = counts.values.sum
      assert(nDay == td)
      val expect = (0L to 9L).map { b =>
        val pr = (counts.getOrElse(b, 0L) + 1).toDouble / (td + 10)
        val q = (baseline.getOrElse(b, 0L) + 1).toDouble / (tb + 10)
        math.floor((pr - q) * math.log(pr / q) * 1e9).toLong
      }.sum
      assert(psiNano == expect, s"day $d0")
    }
    // PSI is a sum of (p-q)ln(p/q) >= 0 terms: each day's total can dip
    // below zero only by the 10 nano-floor truncations (sf0.001's ~60
    // purchases/day make absolute thresholds meaningless — sampling
    // noise alone reads ~0.1-0.3 there)
    assert(got.forall(_._3 >= -10L))
  }

  test("q_rank_churn: verdicts agree with independently computed leaderboards") {
    val got = run("q_rank_churn")
      .select("part", "rank_now", "rank_prev", "rev_cents", "churn")
      .as[(Long, Long, Option[Long], Long, String)].collect()
    assert(got.length == 20 && got.map(_._2).toSeq == (1L to 20L))
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey").cast("long"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
        (col("o_orderdate") >= lit("1998-01-01").cast("timestamp")))
      .as[(Long, Long, Boolean)].collect()
    def board(post: Boolean): Map[Long, Int] =
      li.filter(_._3 == post).groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy { case (p, r) => (-r, p) }.zipWithIndex
        .map { case ((p, _), i) => p -> (i + 1) }.toMap
    val now = board(post = true); val prev = board(post = false)
    for ((part, rn, rp, _, churn) <- got) {
      assert(now(part) == rn.toInt, s"part $part")
      assert(rp.map(_.toInt) == prev.get(part), s"part $part prev")
      val expect = rp match {
        case None => "new"
        case Some(p0) if p0 > rn => "up"
        case Some(p0) if p0 < rn => "down"
        case _ => "flat"
      }
      assert(churn == expect, s"part $part")
    }
  }

  test("t_vocab_coverage: curve is monotone and matches a driver fold") {
    val got = run("t_vocab_coverage")
      .select("k", "vocab_size", "total", "cum_mass", "coverage")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(10L, 100L, 1000L, 10000L))
    val toks = spark.read.parquet(s"$Sf/documents.parquet")
      .select("text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+")).filter(_.nonEmpty)
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (w, c) => (-c, w) }
    val total = cnt.map(_._2).sum
    for ((k, vs, t, cm, cov) <- got) {
      assert(vs == cnt.length.toLong && t == total)
      val expect = cnt.take(k.toInt).map(_._2).sum match {
        case s0 if k >= cnt.length => total
        case s0 => s0
      }
      assert(cm == expect, s"k=$k")
      assert(cov == expect.toDouble / total)
    }
    val covs = got.map(_._5)
    assert(covs.zip(covs.tail).forall { case (a, b) => b >= a })
  }

  test("q_hte: per-segment Welch stats equal a driver fold") {
    val got = run("q_hte")
      .select("seg", "n1", "n0", "diff_mean_dollars", "z")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        floor(col("o_totalprice") + 0.5).cast("long"),
        col("o_custkey").cast("string"))
      .as[(String, Long, String)].collect()
      .map { case (seg, c, k) =>
        val nib = Integer.parseInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest(k.getBytes("UTF-8")).take(1).map("%02x".format(_))
            .mkString.take(1), 16)
        (seg, c, nib < 8)
      }
    for ((seg, rs) <- o.groupBy(_._1)) {
      val t = rs.filter(_._3).map(_._2); val c0 = rs.filterNot(_._3).map(_._2)
      val (n1, n0) = (t.length.toLong, c0.length.toLong)
      def mean(xs: Array[Long]) = xs.sum.toDouble / xs.length
      def varr(xs: Array[Long]) =
        (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / xs.length) /
          (xs.length - 1.0)
      val (_, gn1, gn0, gd, gz) = got(seg)
      assert(gn1 == n1 && gn0 == n0, s"seg $seg")
      assert(math.abs(gd - (mean(t) - mean(c0))) < 1e-9)
      val z = (mean(t) - mean(c0)) /
        math.sqrt(varr(t) / n1 + varr(c0) / n0)
      assert(math.abs(gz - z) < 1e-9, s"seg $seg")
    }
  }

  test("q_duplicate_payments and q_round_numbers: forensic screens reproduce") {
    val pairs = run("q_duplicate_payments")
      .select("cust", "amount_a_cents", "amount_b_cents", "ok_a", "ok_b",
        "gap_days")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val o = Tables(spark, Sf, "orders")
      .select(col("o_custkey").cast("long"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long"),
        col("o_orderkey").cast("long"),
        expr("unix_millis(o_orderdate) div 86400000"))
      .as[(Long, Long, Long, Long)].collect()
    val expect = o.groupBy(_._1).values.flatMap { osArr =>
      val os = osArr.toSeq
      for {
        x <- os; y <- os
        if x._3 < y._3 && math.abs(x._4 - y._4) <= 30 &&
          math.abs(x._2 - y._2) <= 50000
      } yield (x._1, x._2, y._2, x._3, y._3, math.abs(x._4 - y._4))
    }.toSet
    assert(pairs.toSet == expect)
    // round-number screen on the same amounts
    val rn = run("q_round_numbers")
      .select("n", "n_dollar", "n_hundred")
      .as[(Long, Long, Long)].head()
    val cents = o.map(_._2)
    assert(rn == ((cents.length.toLong,
      cents.count(_ % 100 == 0).toLong,
      cents.count(_ % 10000 == 0).toLong)))
  }

  test("q_abc_class: classes partition parts and match a driver fold") {
    val got = run("q_abc_class")
      .select("abc", "n_parts", "revenue_cents", "revenue_share")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val rev = spark.read.parquet(s"$Sf/lineitem.parquet")
      .groupBy(col("l_partkey").cast("long"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")))
      .as[(Long, Long)].collect()
    val total = rev.map(_._2).sum
    val sorted = rev.sortBy { case (p, r) => (-r, p) }
    var cum = 0L
    val classes = sorted.map { case (p, r) =>
      val c = if (cum * 5 < total * 4) "A"
        else if (cum * 20 < total * 19) "B" else "C"
      cum += r
      (p, r, c)
    }
    for (cls <- Seq("A", "B", "C")) {
      val members = classes.filter(_._3 == cls)
      val (_, n, rc, share) = got(cls)
      assert(n == members.length.toLong && rc == members.map(_._2).sum,
        s"class $cls")
      assert(share == rc.toDouble / total)
    }
    assert(got.values.map(_._2).sum == rev.length.toLong)
  }

  test("g_bowtie: components partition the node set") {
    val row = run("g_bowtie")
      .select("n_nodes", "n_core", "n_in", "n_out", "n_other")
      .as[(Long, Long, Long, Long, Long)].head()
    val (n, core, in, out, other) = row
    assert(core >= 1 && in >= 0 && out >= 0 && other >= 0)
    assert(core + in + out + other == n)
    // IN/OUT exclude the core by construction
    assert(in + core <= n && out + core <= n)
  }

  test("q_corr_matrix: six pairs match driver Pearson; r in [-1,1]") {
    val got = run("q_corr_matrix").select("x", "y", "r")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3)
      .toMap
    assert(got.size == 6)
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        floor(col("l_extendedprice") + 0.5).cast("long"),
        floor(col("l_discount") * 10000 + 0.5).cast("long"),
        floor(col("l_tax") * 10000 + 0.5).cast("long"))
      .as[(Long, Long, Long, Long)].collect()
    val names = Seq("quantity", "price_dollars", "discount_bps", "tax_bps")
    val colsV = Seq(li.map(_._1), li.map(_._2), li.map(_._3), li.map(_._4))
    val n = li.length.toDouble
    for (i <- 0 until 4; j <- (i + 1) until 4) {
      val (a, b) = (colsV(i), colsV(j))
      val (sa, sb) = (a.sum.toDouble, b.sum.toDouble)
      val ssa = a.map(v => v.toDouble * v).sum
      val ssb = b.map(v => v.toDouble * v).sum
      val sp = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val r = (n * sp - sa * sb) /
        (math.sqrt(n * ssa - sa * sa) * math.sqrt(n * ssb - sb * sb))
      val gr = got((names(i), names(j)))
      assert(math.abs(gr - r) < 1e-9, s"${names(i)}/${names(j)}")
      assert(gr >= -1.0 - 1e-12 && gr <= 1.0 + 1e-12)
    }
    // this generator draws price independently of quantity (unlike real
    // TPC-H), so all six correlations should be near zero — a useful
    // pin that the statistic isn't picking up phantom structure
    assert(got.values.forall(v => math.abs(v) < 0.1))
  }

  test("t_hapax_share and ev_peak_to_mean: folds reproduce driver-side") {
    val hp = run("t_hapax_share")
      .select("source", "n_types", "n_hapax", "n_tokens")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("source", "text").as[(String, String)].collect()
    for ((src, ds) <- docs.groupBy(_._1)) {
      val cnt = ds.flatMap(_._2.trim.toLowerCase.split("\\s+"))
        .filter(_.nonEmpty).groupBy(identity).view.mapValues(_.size).toMap
      val (_, nt, nh, ntok) = hp(src)
      assert(nt == cnt.size.toLong, s"$src types")
      assert(nh == cnt.values.count(_ == 1).toLong, s"$src hapax")
      assert(ntok == cnt.values.map(_.toLong).sum, s"$src tokens")
    }
    val pm = run("ev_peak_to_mean")
      .select("day", "peak_hour", "day_total", "peak_to_mean")
      .as[(Long, Long, Long, Double)].collect()
    for ((_, peak, total, par) <- pm) {
      assert(par == 24.0 * peak / total)
      assert(par >= 1.0, "peak can never undercut a 24-slot mean floor")
    }
  }

  test("ev_growth_accounting: flows partition actives and balance over time") {
    val rows = run("ev_growth_accounting")
      .select("week", "active", "new_users", "retained", "resurrected",
        "churning_out")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // the lifecycle identity: every active user is exactly one of
    // new / retained / resurrected
    for ((w, a, n, r, rs, _) <- rows)
      assert(a == n + r + rs, s"week $w")
    // conservation across consecutive weeks: next week's retained are
    // exactly this week's actives who did NOT churn out
    for (pair <- rows.sliding(2) if pair.length == 2
         && pair(1)._1 == pair(0)._1 + 1) {
      val (cur, nxt) = (pair(0), pair(1))
      assert(nxt._4 == cur._2 - cur._6,
        s"week ${cur._1}->${nxt._1}: retained must equal survivors")
    }
    // total new across all weeks = distinct users
    val users = Tables.events(spark, Sf)
      .select(countDistinct(col("user_id"))).as[Long].head()
    assert(rows.map(_._3).sum == users)
  }

  test("g_robustness: 6-round labels equal the true fixpoint; identities hold") {
    val row = run("g_robustness")
      .select("n_nodes", "giant_before", "giant_after", "retention")
      .as[(Long, Long, Long, Double)].head()
    val (n, before, after, ret) = row
    assert(before <= n && after <= before)
    assert(ret == after.toDouble / before)
    // the fixed-round label propagation must have converged: compare
    // the before-giant against a driver-side exact union-find
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().distinct
    val pairs = li.groupBy(_._1).values.flatMap { ps =>
      val s0 = ps.map(_._2).sorted
      for (i <- s0.indices; j <- (i + 1) until s0.length) yield (s0(i), s0(j))
    }.toSet
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2))
    val giant = nodes.groupBy(find).values.map(_.size).max
    assert(before == giant.toLong,
      "6 min-label rounds must reach the exact component structure")
    assert(n == nodes.size.toLong)
  }

  // --- round-7 additions: independent driver-side recomputations ---------

  test("q_runs_test: runs/counts/z equal a driver-side fold over the day series") {
    val row = run("q_runs_test")
      .select("n_days", "n_above", "n_below", "runs", "z")
      .as[(Long, Long, Long, Long, Double)].head()
    val daily = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev"))
      .orderBy("d").as[(java.sql.Date, Long)].collect().map(_._2)
    val sorted = daily.sorted
    val med = if (sorted.length % 2 == 1) sorted(sorted.length / 2).toDouble
      else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
    val signs = daily.map(r => if (r > med) 1L else 0L)
    val runs = 1L + signs.zip(signs.tail).count { case (a, b) => a != b }
    val n1 = signs.sum; val n = signs.length.toLong; val n2 = n - n1
    assert(row._1 == n && row._2 == n1 && row._3 == n2 && row._4 == runs)
    val mu = 2.0 * n1 * n2 / n + 1.0
    val z = (runs - mu) /
      math.sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n.toDouble * n * (n - 1)))
    assert(math.abs(row._5 - z) < 1e-9, s"${row._5} vs $z")
  }

  test("q_wasserstein: integer cross-product EMD equals a driver-side CDF fold") {
    val row = run("q_wasserstein")
      .select("n1", "n2", "n_bins", "w1_dollars")
      .as[(Long, Long, Long, Double)].head()
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(year(col("o_orderdate")).as("y"),
        (floor(col("o_totalprice")).cast("long")).as("dol"))
      .as[(Int, Long)].collect()
    val y1 = o.map(_._1).min; val y2 = o.map(_._1).max
    val b1 = o.filter(_._1 == y1).map(_._2 / 6000L)
    val b2 = o.filter(_._1 == y2).map(_._2 / 6000L)
    val (nn1, nn2) = (b1.length.toLong, b2.length.toLong)
    assert((row._1, row._2) == ((nn1, nn2)))
    val bins = (b1 ++ b2).distinct.sorted
    assert(row._3 == bins.length.toLong)
    var c1 = 0L; var c2 = 0L; var st = 0L
    val h1 = b1.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val h2 = b2.groupBy(identity).view.mapValues(_.length.toLong).toMap
    for (b <- bins) {
      c1 += h1.getOrElse(b, 0L); c2 += h2.getOrElse(b, 0L)
      st += math.abs(c1 * nn2 - c2 * nn1)
    }
    val w1 = st.toDouble * 6000.0 / (nn1 * nn2).toDouble
    assert(math.abs(row._4 - w1) < 1e-9, s"${row._4} vs $w1")
  }

  test("q_mediation: c_total - c_direct == a*b (the Baron-Kenny identity)") {
    val r = run("q_mediation")
      .select("a_xm", "b_my", "c_direct", "c_total", "indirect")
      .as[(Double, Double, Double, Double, Double)].head()
    val (a, b, cP, c, ind) = r
    assert(math.abs(ind - a * b) < 1e-12)
    assert(math.abs((c - cP) - a * b) < 1e-9 * math.max(1.0, math.abs(c)),
      s"identity violated: c=$c c'=$cP ab=${a * b}")
    // independent slope recomputation: a = cov(x,m)/var(x) off raw rows
    val rows = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(floor(col("l_discount") * 10000 + 0.5).cast("long"),
        col("l_quantity").cast("long"))
      .as[(Long, Long)].collect()
    val n = rows.length.toDouble
    val sx = rows.map(_._1).sum.toDouble; val sm = rows.map(_._2).sum.toDouble
    val sxx = rows.map(t => t._1 * t._1).sum.toDouble
    val sxm = rows.map(t => t._1 * t._2).sum.toDouble
    val aRef = (n * sxm - sx * sm) / (n * sxx - sx * sx)
    assert(math.abs(a - aRef) < 1e-9, s"$a vs $aRef")
  }

  test("q_qq_ladder: every reported quantile IS the sorted order statistic") {
    val got = run("q_qq_ladder")
      .select("k", "rank_urgent", "q_urgent", "rank_low", "q_low")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == 19)
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderpriority"), col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("c"))
      .as[(String, Long, Long)].collect()
    def sortedC(p: String) =
      o.filter(_._1 == p).sortBy(t => (t._3, t._2)).map(_._3)
    val u = sortedC("1-URGENT"); val l = sortedC("5-LOW")
    for ((k, ru, qu, rl, ql) <- got) {
      assert(ru == (u.length - 1).toLong * k / 20 + 1)
      assert(rl == (l.length - 1).toLong * k / 20 + 1)
      assert(qu == u((ru - 1).toInt), s"k=$k urgent")
      assert(ql == l((rl - 1).toInt), s"k=$k low")
    }
  }

  test("q_hhi: fixed-point share-squared sum tracks the plain double HHI") {
    val got = run("q_hhi").select("nation", "n_suppliers", "hhi")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/supplier.parquet"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey").cast("long"), col("l_suppkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .as[(Long, Long, Long)].collect()
    val nations = spark.read.parquet(s"$Sf/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toMap
    for ((nk, rs) <- li.groupBy(_._1)) {
      val bySupp = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
      val total = bySupp.map(_._2).sum.toDouble
      val hhi = bySupp.map { case (_, c) => val s = c / total; s * s }.sum * 10000
      val g = got(nations(nk))
      assert(g._2 == bySupp.length.toLong)
      // fixed-point floor bias is bounded by n_suppliers * 1e-12 * 1e4
      assert(math.abs(g._3 - hhi) < 1e-4, s"${nations(nk)}: ${g._3} vs $hhi")
    }
  }

  test("g_katz: walk counts equal an exact driver-side adjacency fold") {
    val got = run("g_katz")
      .select("node", "deg", "paths2", "paths3")
      .as[(Long, Long, Long, Long)].collect()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().toList.distinct
    val pairs = li.groupBy(_._1).values.toList.flatMap { g =>
      val ps = g.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val adj = (pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) })
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val s1 = adj.view.mapValues(_.length.toLong).toMap
    val s2 = adj.view.mapValues(_.map(s1).sum).toMap
    val s3 = adj.view.mapValues(_.map(s2).sum).toMap
    for ((node, d, p2, p3) <- got) {
      assert(d == s1(node), s"deg($node)")
      assert(p2 == s2(node), s"paths2($node)")
      assert(p3 == s3(node), s"paths3($node)")
    }
  }

  test("q_cramer_von_mises: statistic equals a driver-side pooled-ECDF fold") {
    val row = run("q_cramer_von_mises")
      .select("n1", "n2", "cvm_t").as[(Long, Long, Double)].head()
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long"),
        col("o_orderpriority"))
      .as[(Long, String)].collect()
    val g1 = li.filter(r => Set("1-URGENT", "2-HIGH")(r._2)).map(_._1)
    val g2 = li.filterNot(r => Set("1-URGENT", "2-HIGH")(r._2)).map(_._1)
    val (n, m) = (g1.length.toLong, g2.length.toLong)
    assert((row._1, row._2) == ((n, m)))
    val c1 = g1.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c2 = g2.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var cum1 = 0L; var cum2 = 0L; var s = 0.0
    for (v <- (c1.keySet ++ c2.keySet).toSeq.sorted) {
      cum1 += c1.getOrElse(v, 0L); cum2 += c2.getOrElse(v, 0L)
      val d = cum1.toDouble / n - cum2.toDouble / m
      s += d * d * (c1.getOrElse(v, 0L) + c2.getOrElse(v, 0L))
    }
    val t = n.toDouble * m / ((n + m).toDouble * (n + m)) * s
    assert(math.abs(row._3 - t) < 1e-6, s"${row._3} vs $t")
  }

  test("ev_qini_uplift: final decile matches the unconditional arm totals") {
    val rows = run("ev_qini_uplift")
      .select("decile", "nt", "nc", "ct", "cc", "qini")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == 10 && rows.map(_._1).toSet == (1L to 10L).toSet)
    val (tNt, tNc, tCt, tCc) =
      (rows.map(_._2).sum, rows.map(_._3).sum, rows.map(_._4).sum, rows.map(_._5).sum)
    // the curve's last point is the full-population incremental lift
    val last = rows.maxBy(_._1)
    val expect = tCt.toDouble - tCc.toDouble * tNt / tNc
    assert(math.abs(last._6 - expect) < 1e-9, s"${last._6} vs $expect")
    // deciles partition every user exactly once
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select(col("user_id")).distinct().count()
    assert(tNt + tNc == users)
  }

  test("q_abc_xyz: the 9-cell matrix partitions parts and conserves revenue") {
    val rows = run("q_abc_xyz")
      .select("abc_class", "xyz_class", "n_parts", "rev_cents")
      .as[(String, String, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    assert(rows.forall(r => Set("A", "B", "C")(r._1) && Set("X", "Y", "Z")(r._2)))
    val li = spark.read.parquet(s"$Sf/lineitem.parquet")
    val nParts = li.select(col("l_partkey")).distinct().count()
    assert(rows.map(_._3).sum == nParts, "every part lands in exactly one cell")
    val totalCents = li
      .select(floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("c"))
      .agg(sum(col("c"))).as[Long].head()
    assert(rows.map(_._4).sum == totalCents, "revenue is conserved across cells")
  }

  test("q_seasonal_index: indices average to 1 (sum 12) by construction") {
    val rows = run("q_seasonal_index")
      .select("month", "seasonal_index").as[(Long, Double)].collect()
    assert(rows.length == 12 && rows.map(_._1).toSet == (1L to 12L).toSet)
    assert(math.abs(rows.map(_._2).sum - 12.0) < 1e-9,
      s"normalization must make the 12 indices sum to 12: ${rows.map(_._2).sum}")
  }

  test("ev_dwell_time: transition count is exactly events minus users") {
    val n = run("ev_dwell_time").agg(sum(col("n"))).as[Long].head()
    val ev = spark.read.parquet(s"$Sf/events.parquet")
    val events = ev.count()
    val users = ev.select(col("user_id")).distinct().count()
    assert(n == events - users,
      "each user's timeline contributes exactly (events-1) transitions")
  }

  test("q_mantel_haenszel: OR and CMH track a driver-side per-stratum fold") {
    val row = run("q_mantel_haenszel")
      .select("n_strata", "sum_a", "or_mh", "cmh_chi2")
      .as[(Long, Long, Double, Double)].head()
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .join(spark.read.parquet(s"$Sf/customer.parquet"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"), col("o_orderpriority"))
      .as[(String, Double, String)].collect()
    val strata = o.groupBy(_._1).values.toList.map { rs =>
      val a = rs.count(r => r._2 > 150000 && Set("1-URGENT", "2-HIGH")(r._3)).toLong
      val b = rs.count(r => r._2 > 150000 && !Set("1-URGENT", "2-HIGH")(r._3)).toLong
      val c = rs.count(r => r._2 <= 150000 && Set("1-URGENT", "2-HIGH")(r._3)).toLong
      val d = rs.count(r => r._2 <= 150000 && !Set("1-URGENT", "2-HIGH")(r._3)).toLong
      (a, b, c, d)
    }
    assert(row._1 == strata.length.toLong)
    assert(row._2 == strata.map(_._1).sum)
    def n(s: (Long, Long, Long, Long)) = s._1 + s._2 + s._3 + s._4
    val orRef = strata.map(s => s._1.toDouble * s._4 / n(s)).sum /
      strata.map(s => s._2.toDouble * s._3 / n(s)).sum
    // fixed-point floors introduce <= strata * 1e-6 absolute bias per sum
    assert(math.abs(row._3 - orRef) < 1e-3, s"${row._3} vs $orRef")
    val e = strata.map(s => (s._1 + s._2).toDouble * (s._1 + s._3) / n(s)).sum
    val v = strata.map { s =>
      (s._1 + s._2).toDouble * (s._3 + s._4) * (s._1 + s._3) * (s._2 + s._4) /
        (n(s).toDouble * n(s) * (n(s) - 1))
    }.sum
    val cmhRef = math.pow(strata.map(_._1).sum - e, 2) / v
    assert(math.abs(row._4 - cmhRef) < 1e-2, s"${row._4} vs $cmhRef")
  }

  test("q_gumbel_fit: MoM parameters off the literal monthly maxima") {
    val row = run("q_gumbel_fit")
      .select("n_months", "mean_max", "beta_hat", "mu_hat")
      .as[(Long, Double, Double, Double)].head()
    val maxima = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice")).cast("long")).as("x"))
      .groupBy(trunc(col("d"), "month")).agg(max(col("x")))
      .as[(java.sql.Date, Long)].collect().map(_._2)
    assert(row._1 == maxima.length.toLong)
    val n = maxima.length.toDouble
    val mean = maxima.sum / n
    val sd = math.sqrt(maxima.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    val beta = sd * math.sqrt(6.0) / math.Pi
    assert(math.abs(row._2 - mean) < 1e-6 * mean)
    assert(math.abs(row._3 - beta) < 1e-6 * beta, s"${row._3} vs $beta")
    assert(math.abs(row._4 - (mean - 0.5772156649015329 * beta)) < 1e-6 * mean)
  }

  test("t_simpson_index: collision probability equals the hand count per source") {
    val got = run("t_simpson_index")
      .select("source", "n_tokens", "simpson")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("source"), col("text")).as[(String, String)].collect()
    for ((src, rs) <- docs.groupBy(_._1)) {
      val toks = rs.toList.flatMap(_._2.trim.split("\\s+"))
      val counts = toks.groupBy(identity).view.mapValues(_.size.toLong)
      val nTok = toks.size.toLong
      val coll = counts.values.map(c => c * (c - 1)).sum
      val simpson = coll.toDouble / (nTok * (nTok - 1)).toDouble
      assert(got(src)._1 == nTok, s"$src token count")
      assert(math.abs(got(src)._2 - simpson) < 1e-12, s"$src simpson")
    }
  }

  test("g_ppr: ranks are positive, sorted, and seeds dominate the walk mass") {
    val rows = run("g_ppr").select("node", "rank_micro")
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.forall(_._2 > 0))
    // emitted in (rank desc, node) order
    val ranks = rows.map(_._2)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // every seed node (k % 10 == 0) present in the graph must carry
    // teleport mass >= 150000 after the final iteration
    rows.filter(_._1 % 10 == 0).foreach { case (_, r) =>
      assert(r >= 150000L) }
  }
}
