package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** The frozen BH critical ladder comes from Acklam's Φ⁻¹ — pin it
  * against textbook quantiles (abs err < 1e-8 over the central and
  * tail branches).
  */
class InvNormSpec extends AnyFunSuite {
  test("invNorm matches textbook normal quantiles on both branches") {
    val known = Seq(
      0.975 -> 1.959963984540054, 0.5 -> 0.0, 0.9 -> 1.2815515655446004,
      0.99 -> 2.3263478740408408, 0.999 -> 3.090232306167813,
      0.0001 -> -3.719016485455709, 0.025 -> -1.959963984540054)
    known.foreach { case (p, z) =>
      assert(math.abs(Olap2Queries.invNorm(p) - z) < 1e-8, s"p=$p")
    }
    // ladder sanity: strictly decreasing, rank 25 = Φ⁻¹(1 − 0.025)
    val l = (1 to 25).map(i => Olap2Queries.invNorm(1 - i * 0.05 / 50.0))
    assert(l == l.sorted.reverse && l.last > 1.9599 && l.last < 1.9600)
  }
}
