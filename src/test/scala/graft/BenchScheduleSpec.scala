package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchScheduleSpec extends AnyFunSuite {

  test("heavy queries run solo; cheap ones pack cheapest-first under the cost cap") {
    val costs = Map(
      "q_heavy1" -> 9.6, "q_heavy2" -> 4.5, "q_heavy3" -> 4.1, "q_heavy4" -> 3.5,
      "q_heavy5" -> 3.1, "q_heavy6" -> 2.8, "q_heavy7" -> 2.6, "q_heavy8" -> 2.5,
      "q_a" -> 0.5, "q_b" -> 1.0, "q_c" -> 1.5, "q_d" -> 2.0, "q_e" -> 2.4)
    val names = costs.keys.toSeq.sorted
    val groups = Bench.schedule(names, costs)
    // top-8 by cost each alone
    val solos = groups.filter(_.size == 1).map(_.head).toSet
    assert((1 to 8).map(i => s"q_heavy$i").forall(solos), solos)
    // the cheap remainder is one or more shared groups in ascending cost order
    val shared = groups.filter(_.size > 1)
    assert(shared.flatten.toSet == Set("q_a", "q_b", "q_c", "q_d", "q_e"))
    shared.foreach { g =>
      val cs = g.map(costs)
      assert(cs == cs.sorted, s"not cheapest-first: $g")
      assert(cs.sum <= 12.0 + 1e-9, s"cost cap exceeded: $g")
    }
    // every query scheduled exactly once
    assert(groups.flatten.sorted == names)
  }

  test("queries above the solo cost threshold run alone even outside the top-8") {
    val costs = (1 to 8).map(i => s"q_big$i" -> 10.0).toMap ++
      Map("q_alsoBig" -> 5.0, "q_small" -> 0.5)
    val groups = Bench.schedule(costs.keys.toSeq.sorted, costs)
    assert(groups.count(_ == Seq("q_alsoBig")) == 1, groups)
  }

  test("unknown queries get the default cost and share a group") {
    val groups = Bench.schedule(Seq("q_x", "q_y", "q_z"), Map.empty)
    // all equal default cost: top-8 rule makes 3 solos out of 3 total —
    // with no cost data everything is 'heaviest', which is the safe side
    assert(groups.flatten.sorted == Seq("q_x", "q_y", "q_z"))
  }

  test("a single requested query is one group (the TimeQ path)") {
    assert(Bench.schedule(Seq("q_only"), Map("q_only" -> 0.1)) == Seq(Seq("q_only")))
  }

  test("solo re-verify fires only for shared-JVM rows >1.4x their prior") {
    // over the factor, ran shared → re-verify
    assert(Bench.needsSoloReverify(warm = 1.5, prior = Some(1.0), ranSolo = false))
    // at or under the factor → no re-run
    assert(!Bench.needsSoloReverify(warm = 1.4, prior = Some(1.0), ranSolo = false))
    assert(!Bench.needsSoloReverify(warm = 0.9, prior = Some(1.0), ranSolo = false))
    // already ran in its own child: the solo number IS the verdict
    // round-11: a solo row above the factor re-runs too — one solo
    // child can itself be an unlucky JVM instance
    assert(Bench.needsSoloReverify(warm = 5.0, prior = Some(1.0), ranSolo = true))
    // no prior (new query) or degenerate zero prior → nothing to compare
    assert(!Bench.needsSoloReverify(warm = 5.0, prior = None, ranSolo = false))
    assert(!Bench.needsSoloReverify(warm = 5.0, prior = Some(0.0), ranSolo = false))
  }

  test("drift gate: >1.25x the committed seed prior flags unchanged-query movement") {
    // r13 movers that the 1.4x overlay gate missed: q_cc_minlabel
    // 5.55 -> 7.21 (+30%) must fire against the SEED prior
    assert(Bench.isDrift(warm = 7.21, seedPrior = Some(5.55)))
    assert(Bench.isDrift(warm = 2.6, seedPrior = Some(2.0)))
    // at or under the factor, or improvement → no flag
    assert(!Bench.isDrift(warm = 2.5, seedPrior = Some(2.0)))
    assert(!Bench.isDrift(warm = 0.7, seedPrior = Some(1.0)))
    // absolute noise floor: 1.25x of a small query is jitter, not
    // drift — the first sf0.1 publish flagged 19 sub-1.5 s rows moved
    // 60-300 ms (q_zorder 0.26 -> 0.407 "drifted" 1.57x)
    assert(!Bench.isDrift(warm = 0.407, seedPrior = Some(0.26)))
    assert(!Bench.isDrift(warm = 1.468, seedPrior = Some(1.145)))
    // ...but a real mover clears both bars (q_fuzzy_join 3.81 -> 5.42)
    assert(Bench.isDrift(warm = 5.42, seedPrior = Some(3.81)))
    // new query (no seed) or degenerate prior → nothing to compare
    assert(!Bench.isDrift(warm = 9.0, seedPrior = None))
    assert(!Bench.isDrift(warm = 9.0, seedPrior = Some(0.0)))
  }
}
