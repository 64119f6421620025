package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Direct property pin of [[Clapper]] — the ONE arbitration definition all
  * four bells (ANN drift/skew/collapse, lexical hot-bucket, BM25 hot-term)
  * share. The load-bearing theorem: under the one-sided contracts the
  * sketch and witness carry by construction (`metric ≤ ub`,
  * `witness ≤ metric`), [[Clapper.sketchGated]] returns EXACTLY the
  * decision the exact path returns — the sketch can change which branch
  * PAYS, never what the policy does. Pinning it generator-driven makes
  * the next clapper addition safe by construction (the r19 queue's
  * wording). No SparkSession — pure arithmetic.
  */
class ClapperSpec extends AnyFunSuite {

  /** Sample `n` values of `g` deterministically (the PropertySpec idiom —
    * the scalatest-scalacheck bridge isn't in the offline cache). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1042L + i)))

  /** The exact-path decision at true metric `m` — what every clapper does
    * when it pays the corpus aggregate: ring, else retire, else decline.
    */
  private def exactDecision(m: Long, bar: Long, baseline: Option[Long],
      rearmFactor: Double, retireFraction: Double,
      hasPolicy: Boolean): String =
    if (Clapper.rings(m.toDouble, bar.toDouble, baseline.map(_.toDouble),
        rearmFactor, live = m > 0)) "ring"
    else if (Clapper.retires(m.toDouble, bar.toDouble, retireFraction,
        hasPolicy)) "retire"
    else "decline"

  private case class Ask(m: Long, ubSlack: Option[Long], wGap: Option[Long],
      bar: Long, baseline: Option[Long], rearmFactor: Double,
      retireFraction: Double, hasPolicy: Boolean)

  private val askGen: Gen[Ask] = for {
    m <- Gen.frequency(3 -> Gen.choose(0L, 200L), 1 -> Gen.const(0L),
      1 -> Gen.choose(0L, 5L))
    // ub = m + slack (the CMS one-sided contract); None = no sketch
    ubSlack <- Gen.option(Gen.frequency(2 -> Gen.const(0L),
      3 -> Gen.choose(0L, 80L)))
    // witness = m - gap, floored at 0 (the witness one-sided contract);
    // None = no witness
    wGap <- Gen.option(Gen.frequency(2 -> Gen.const(0L),
      3 -> Gen.choose(0L, 200L)))
    bar <- Gen.choose(1L, 150L)
    baseline <- Gen.option(Gen.choose(1L, 200L))
    rearmFactor <- Gen.frequency(1 -> Gen.const(0.0),
      3 -> Gen.choose(0.5, 3.0))
    retireFraction <- Gen.frequency(1 -> Gen.const(0.0),
      3 -> Gen.choose(0.05, 1.0))
    hasPolicy <- Gen.oneOf(true, false)
  } yield Ask(m, ubSlack, wGap, bar, baseline, rearmFactor,
    retireFraction, hasPolicy)

  test("sketchGated never returns a different DECISION than the exact path (1000 generated asks)") {
    val asks = samples(askGen, 1000)
    assert(asks.size >= 900, "generator must not discard")
    asks.foreach { a =>
      val ub = a.ubSlack.map(a.m + _)
      val wit = a.wGap.map(g => math.max(0L, a.m - g))
      val expected = exactDecision(a.m, a.bar, a.baseline, a.rearmFactor,
        a.retireFraction, a.hasPolicy)
      var paidExact = false
      val got = Clapper.sketchGated[String](ub, a.bar, a.baseline,
        a.rearmFactor, a.retireFraction, a.hasPolicy, wit)(
        _ => "retire")(_ => "decline") {
        paidExact = true; expected
      }
      assert(got == expected,
        s"decision diverged: got $got, exact $expected, ask $a ub=$ub wit=$wit")
      // every RING decision must come from the exact path — a bound can
      // prove declines and retires, never a ring
      if (expected == "ring") assert(paidExact, s"ring without exact: $a")
      // no sketch at all always pays exact
      if (ub.isEmpty) assert(paidExact, s"None ub short-circuited: $a")
    }
  }

  test("the witness can only switch WHICH branch pays, never the decision; only a fresh standing policy consults it") {
    val asks = samples(askGen, 600)
    asks.foreach { a =>
      val ub = a.ubSlack.map(a.m + _)
      val wit = a.wGap.map(g => math.max(0L, a.m - g))
      def run(w: => Option[Long]): (String, Boolean) = {
        var paid = false
        val d = Clapper.sketchGated[String](ub, a.bar, a.baseline,
          a.rearmFactor, a.retireFraction, a.hasPolicy, w)(
          _ => "retire")(_ => "decline") {
          paid = true
          exactDecision(a.m, a.bar, a.baseline, a.rearmFactor,
            a.retireFraction, a.hasPolicy)
        }
        (d, paid)
      }
      val (withW, _) = run(wit)
      val (without, _) = run(None)
      assert(withW == without,
        s"witness changed a decision: $withW vs $without, ask $a")
      // the witness is consulted only when a policy stands with
      // retireFraction > 0 — rf = 0 configs never evaluate it
      if (!(a.hasPolicy && a.retireFraction > 0)) {
        var consulted = false
        run { consulted = true; wit }
        assert(!consulted, s"witness consulted outside a standing policy: $a")
      }
    }
  }

  test("rings/retires truth table: liveness, rearm guard, hysteresis band edges") {
    // liveness: a zero metric never rings, whatever the bar
    assert(!Clapper.rings(0, 0, None, 1.25, live = false))
    assert(Clapper.rings(5, 5, None, 1.25, live = true))
    assert(!Clapper.rings(4.999, 5, None, 1.25, live = true))
    // rearm guard: baseline 10, factor 1.25 → re-ring at exactly 12.5
    assert(!Clapper.rings(12, 5, Some(10), 1.25, live = true))
    assert(Clapper.rings(12.5, 5, Some(10), 1.25, live = true))
    // rearmFactor = 0 disables the guard (absolute bar only)
    assert(Clapper.rings(5, 5, Some(1000), 0, live = true))
    // retire: opt-in (rf = 0 never), needs a policy, both conjuncts
    assert(!Clapper.retires(1, 10, 0, hasPolicy = true))
    assert(!Clapper.retires(1, 10, 0.5, hasPolicy = false))
    assert(Clapper.retires(5, 10, 0.5, hasPolicy = true))
    assert(!Clapper.retires(5.001, 10, 0.5, hasPolicy = true))
    // rf = 1: the explicit metric < bar conjunct stops an at-bar retire
    assert(!Clapper.retires(10, 10, 1.0, hasPolicy = true))
    assert(Clapper.retires(9.999, 10, 1.0, hasPolicy = true))
    // parameter validation bounds
    intercept[IllegalArgumentException](Clapper.requireRearm(-0.1))
    intercept[IllegalArgumentException](Clapper.requireRetire(1.1))
    intercept[IllegalArgumentException](Clapper.requireRetire(-0.1))
    Clapper.requireRearm(0); Clapper.requireRetire(0)
    Clapper.requireRetire(1)
  }
}
