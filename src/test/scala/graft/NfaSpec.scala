package graft

import graft.cep.Nfa
import graft.cep.Nfa._
import org.scalatest.funsuite.AnyFunSuite

class NfaSpec extends AnyFunSuite {
  case class E(t: Long, typ: String)
  private def pat(steps: Step[E]*) = Pattern[E](steps.toVector)
  private def run(p: Pattern[E], evs: E*): Vector[Match[E]] =
    Nfa.run(evs.toIndexedSeq, (_: E).t, p)

  test("PatternDsl builds the same pattern as the case-class form") {
    import scala.concurrent.duration._
    import graft.cep.PatternDsl
    val dsl = PatternDsl.begin[E]("a", _.typ == "a").oneOrMore
      .followedBy("b", _.typ == "b")
      .within(10.micros)
      .build
    val explicit = Pattern[E](Vector(
      Step("a", (_: E).typ == "a", Quantifier.OneOrMore),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      withinMicros = Some(10L))
    val evs = IndexedSeq(E(0, "a"), E(1, "a"), E(2, "b"), E(50, "a"), E(55, "b"))
    val got = Nfa.run(evs, (_: E).t, dsl).map(_.bindings.map {
      case (n, es) => n -> es.map(_.t) })
    val want = Nfa.run(evs, (_: E).t, explicit).map(_.bindings.map {
      case (n, es) => n -> es.map(_.t) })
    assert(got == want && got.nonEmpty)
  }

  test("SkipToNext resumes one past the start: overlapping pair matches") {
    // C{2} over a run of 4 clicks: SkipToNext re-enters at start+1 so
    // every adjacent pair matches (3); SkipPastLast consumes pairs (2).
    val clickPair = Pattern[E](Vector(
      Step("c", (_: E).typ == "c", Quantifier.Times(2, 2))),
      afterMatch = AfterMatch.SkipToNext)
    val evs = Seq(E(0, "c"), E(1, "c"), E(2, "c"), E(3, "c"), E(4, "x"))
    val next = run(clickPair, evs: _*)
    assert(next.map(_.bindings.head._2.map(_.t)) ==
      Vector(Vector(0L, 1L), Vector(1L, 2L), Vector(2L, 3L)))
    val past = run(clickPair.copy(afterMatch = AfterMatch.SkipPastLast), evs: _*)
    assert(past.map(_.bindings.head._2.map(_.t)) ==
      Vector(Vector(0L, 1L), Vector(2L, 3L)))
    // Multi-step shape: a b, SkipToNext can restart inside a consumed
    // span (a@2 after the a@0..b@3 match binds b@3's... no b left: only
    // the a@0 match emits, then a@2 finds no second b -> 1 match; with
    // interleaved "a a b b" SkipToNext yields both nested matches.
    val ab = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      afterMatch = AfterMatch.SkipToNext)
    val nested = run(ab, E(0, "a"), E(1, "a"), E(2, "b"), E(3, "b"))
    assert(nested.map(m => (m.first("a").t, m.first("b").t)) ==
      Vector((0L, 2L), (1L, 2L)))
    val pastAb = run(ab.copy(afterMatch = AfterMatch.SkipPastLast),
      E(0, "a"), E(1, "a"), E(2, "b"), E(3, "b"))
    assert(pastAb.map(m => (m.first("a").t, m.first("b").t)) == Vector((0L, 2L)))
  }

  test("runWithTimeouts reports expired partial matches with their prefix") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      withinMicros = Some(10L))
    // a@0 never finds its b; window [0,10) expires once time reaches 100
    val (ms, touts) = Nfa.runWithTimeouts(
      IndexedSeq(E(0, "a"), E(1, "x"), E(100, "c"), E(102, "a"), E(103, "b")),
      (_: E).t, p)
    assert(ms.size == 1 && ms.head.first("a").t == 102)
    assert(touts.size == 1)
    assert(touts.head.bindings == Vector("a" -> Vector(E(0, "a"))))
    // not yet expired (last event inside the window) -> no timeout report
    val (_, open) = Nfa.runWithTimeouts(
      IndexedSeq(E(0, "a"), E(5, "x")), (_: E).t, p)
    assert(open.isEmpty)
    // no within bound -> never times out
    val (_, never) = Nfa.runWithTimeouts(
      IndexedSeq(E(0, "a"), E(999, "x")), (_: E).t, p.copy(withinMicros = None))
    assert(never.isEmpty)
  }

  test("property: match invariants hold on random streams") {
    import org.scalacheck.{Gen, Prop}
    def allSpan(m: Match[E]): Long = {
      val ts = m.bindings.flatMap(_._2).map(_.t)
      ts.max - ts.min
    }
    def isSorted(xs: Seq[Long]): Boolean = xs == xs.sorted
    val types = Gen.oneOf("a", "b", "x")
    val streams = Gen.listOf(types).map(_.zipWithIndex.map {
      case (ty, i) => E(i.toLong * 2, ty) // strictly increasing times
    })
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a", Quantifier.OneOrMore),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      withinMicros = Some(10L), afterMatch = AfterMatch.SkipPastLast)
    val prop = Prop.forAll(streams) { evs =>
      val ms = Nfa.run(evs.toIndexedSeq, (_: E).t, p)
      val allBound = ms.flatMap(_.bindings.flatMap(_._2))
      // 1. bindings satisfy their step predicates
      ms.forall(m => m.bindings.forall { case (name, bound) =>
        bound.forall(e => if (name == "a") e.typ == "a" else e.typ == "b") }) &&
      // 2. within bound: last - first < 10 micros (strictly less)
      ms.forall(m => allSpan(m) < 10L) &&
      // 3. SkipPastLast: no event consumed twice
      allBound.size == allBound.distinct.size &&
      // 4. matches are time-ordered and internally ordered
      ms.forall(m => isSorted(m.bindings.flatMap(_._2).map(_.t)))
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: incremental overlap scan equals batch under any chunking schedule") {
    import org.scalacheck.{Gen, Prop}
    // Mirrors the streaming operator's loop: chunked arrival, watermark
    // = max time seen, (event, done) state with done-prefix eviction,
    // then a final far-future flush — the multiset of emitted matches
    // must equal one batch run, for every overlapping skip strategy.
    def simulate(all: IndexedSeq[E], p: Pattern[E], chunk: Int): Vector[Match[E]] = {
      val lastStep = p.steps.last
      def couldExtendLast(m: Match[E]): Boolean = lastStep.quantifier match {
        case Quantifier.OneOrMore => true
        case Quantifier.Times(_, mx) =>
          m.bindings.find(_._1 == lastStep.name).map(_._2.size).getOrElse(0) < mx
        case Quantifier.Optional => !m.bindings.exists(_._1 == lastStep.name)
        case _ => false
      }
      val out = Vector.newBuilder[Match[E]]
      var state = IndexedSeq.empty[(E, Boolean)]
      var wm = Long.MinValue
      def step(batch: Seq[E], now: Long): Unit = {
        val pairs = (state ++ batch.map((_, false))).sortBy(_._1.t).toIndexedSeq
        val evs = pairs.map(_._1)
        val provisional = (m: Match[E], lastIdx: Int) =>
          lastIdx == evs.length - 1 && couldExtendLast(m) &&
            p.withinMicros.forall(w => now - m.bindings.head._2.head.t < w)
        val res = Nfa.runIncrementalOverlap[E](evs, pairs.map(_._2),
          (_: E).t, p, now, provisional)
        out ++= res.matches
        val firstOpen = res.done.indexOf(false) match {
          case -1 => evs.length
          case k  => k
        }
        state = (firstOpen until evs.length).map(ix => (evs(ix), res.done(ix)))
      }
      all.grouped(math.max(chunk, 1)).foreach { b =>
        wm = math.max(wm, b.map(_.t).max); step(b, wm)
      }
      step(Seq.empty, Long.MaxValue / 4) // flush: nothing stays provisional
      out.result()
    }
    val types = Gen.oneOf("a", "b", "x")
    val streams = Gen.listOf(types).map(_.zipWithIndex.map {
      case (ty, i) => E(i.toLong * 2, ty)
    })
    val strategies = Gen.oneOf[AfterMatch](AfterMatch.NoSkip, AfterMatch.SkipToNext,
      AfterMatch.SkipToFirst("a"), AfterMatch.SkipToLast("a"),
      AfterMatch.SkipToFirst("b"), AfterMatch.SkipToLast("b"))
    // two shapes: closed last step, and a trailing greedy loop (the
    // provisional/withhold path)
    val shapes = Gen.oneOf(
      Vector(Step("a", (_: E).typ == "a", Quantifier.OneOrMore),
        Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      Vector(Step("a", (_: E).typ == "a", Quantifier.OneOrMore)))
    val prop = Prop.forAll(streams, strategies, shapes, Gen.choose(1, 5)) {
      (evs, strat, steps, chunk) =>
        val p = Pattern[E](steps, withinMicros = Some(10L), afterMatch = strat)
        def key(m: Match[E]) = m.bindings.map { case (n, es) => n -> es.map(_.t) }
        val batch = Nfa.run(evs.toIndexedSeq, (_: E).t, p).map(key)
          .sortBy(_.toString)
        val inc = simulate(evs.toIndexedSeq, p, chunk).map(key).sortBy(_.toString)
        inc == batch
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(result.passed, result.status.toString)
  }

  test("property: times(min,max) bindings respect bounds and contiguity") {
    import org.scalacheck.{Gen, Prop}
    val types = Gen.oneOf("a", "b", "x")
    val streams = Gen.listOf(types).map(_.zipWithIndex.map {
      case (ty, i) => E(i.toLong, ty)
    })
    val bounds = for {
      min <- Gen.choose(1, 3); extra <- Gen.choose(0, 2)
    } yield (min, min + extra)
    val prop = Prop.forAll(streams, bounds) { case (evs, (mn, mx)) =>
      val p = Pattern[E](Vector(
        Step("a", (_: E).typ == "a", Quantifier.Times(mn, mx)),
        Step("b", (_: E).typ == "b")),
        afterMatch = AfterMatch.SkipPastLast)
      val ms = Nfa.run(evs.toIndexedSeq, (_: E).t, p)
      ms.forall { m =>
        val as = m.bindings.find(_._1 == "a").get._2.map(_.t)
        val b = m.bindings.find(_._1 == "b").get._2.head.t
        // count within [min,max]; a-run consecutive; b directly follows
        as.size >= mn && as.size <= mx &&
          as.zip(as.tail).forall { case (x, y) => y == x + 1 } &&
          b == as.last + 1
      } && {
        // no event consumed twice under SkipPastLast
        val bound = ms.flatMap(_.bindings.flatMap(_._2))
        bound.size == bound.distinct.size
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("strict 3-step sequence matches consecutive events only") {
    val p = pat(
      Step("a", _.typ == "a"), Step("b", _.typ == "b"), Step("c", _.typ == "c"))
    val ms = run(p, E(1, "a"), E(2, "b"), E(3, "c"), E(4, "a"), E(5, "x"), E(6, "b"))
    assert(ms.size == 1)
    assert(ms.head.first("a").t == 1 && ms.head.first("c").t == 3)
  }

  test("relaxed contiguity skips non-matching events") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)))
    val ms = run(p, E(1, "a"), E(2, "x"), E(3, "x"), E(4, "b"))
    assert(ms.size == 1)
    assert(ms.head.first("b").t == 4)
  }

  test("within bound prunes slow matches (strictly-less semantics)") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      withinMicros = Some(10L))
    assert(run(p, E(0, "a"), E(9, "b")).size == 1)
    assert(run(p, E(0, "a"), E(10, "b")).isEmpty)
  }

  test("oneOrMore binds greedily then backtracks") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a", quantifier = Quantifier.OneOrMore),
      Step("b", (_: E).typ == "b")))
    val ms = run(p, E(1, "a"), E(2, "a"), E(3, "a"), E(4, "b"))
    assert(ms.size == 1)
    assert(ms.head.bindings.head._2.map(_.t) == Vector(1L, 2L, 3L))
  }

  test("optional step can be absent") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("o", (_: E).typ == "o", quantifier = Quantifier.Optional),
      Step("b", (_: E).typ == "b")))
    assert(run(p, E(1, "a"), E(2, "b")).size == 1)
    val withO = run(p, E(1, "a"), E(2, "o"), E(3, "b"))
    assert(withO.size == 1 && withO.head.first("o").t == 2)
  }

  test("skipPastLast yields non-overlapping matches") {
    val p = pat(Step("a", _.typ == "a"), Step("b", _.typ == "b"))
    val ms = run(p, E(1, "a"), E(2, "b"), E(3, "a"), E(4, "b"))
    assert(ms.map(m => (m.first("a").t, m.first("b").t)) == Vector((1L, 2L), (3L, 4L)))
  }

  test("noSkip allows overlapping starts") {
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a"),
      Step("b", (_: E).typ == "b", contiguity = Contiguity.Relaxed)),
      afterMatch = AfterMatch.NoSkip)
    val ms = run(p, E(1, "a"), E(2, "a"), E(3, "b"))
    assert(ms.map(m => (m.first("a").t, m.first("b").t)) == Vector((1L, 3L), (2L, 3L)))
  }

  test("times(n) binds exactly n consecutive events") {
    val p = pat(
      Step("a", _.typ == "a", Quantifier.Times(2, 2)),
      Step("b", _.typ == "b"))
    // 3 a's then b: from a1 the pair (a1,a2) leaves a3 before b — no
    // match from that start; the scan then starts at a2 and (a2,a3)+b4
    // matches. Exactly-n never binds more than n.
    val shifted = run(p, E(1, "a"), E(2, "a"), E(3, "a"), E(4, "b"))
    assert(shifted.size == 1 &&
      shifted.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(2L, 3L))
    val ms = run(p, E(1, "a"), E(2, "a"), E(3, "b"))
    assert(ms.size == 1 &&
      ms.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L, 2L))
    assert(run(p, E(1, "a"), E(2, "b")).isEmpty) // only one a: below min
  }

  test("times(min,max) is greedy with backtracking") {
    val p = pat(
      Step("a", _.typ == "a", Quantifier.Times(1, 3)),
      Step("b", _.typ == "b"))
    // 4 a's then b: from a1 the cap (3) leaves a4 before b and shorter
    // takes leave other a's — no match from a1; the scan finds the
    // greedy cap-width match starting at a2.
    val shifted = run(p, E(1, "a"), E(2, "a"), E(3, "a"), E(4, "a"), E(5, "b"))
    assert(shifted.size == 1 &&
      shifted.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(2L, 3L, 4L))
    val ms = run(p, E(1, "a"), E(2, "a"), E(3, "a"), E(4, "b"))
    assert(ms.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L, 2L, 3L))
  }

  test("skipToLast re-scans from the last bound event (overlapping matches)") {
    // a+ b with SkipToLast(a) on [a1 a2 b3]: match1 = [a1,a2]+b3, then
    // resume AT a2 (not past b3) -> match2 = [a2]+b3. SkipPastLast by
    // contrast would emit match1 only.
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a", Quantifier.OneOrMore),
      Step("b", (_: E).typ == "b")),
      afterMatch = AfterMatch.SkipToLast("a"))
    val ms = run(p, E(1, "a"), E(2, "a"), E(3, "b"))
    assert(ms.map(m => m.bindings.find(_._1 == "a").get._2.map(_.t)) ==
      Vector(Vector(1L, 2L), Vector(2L)))
    val past = run(p.copy(afterMatch = AfterMatch.SkipPastLast),
      E(1, "a"), E(2, "a"), E(3, "b"))
    assert(past.size == 1)
  }

  test("relaxed inner consumption skips non-matching events inside a loop") {
    import graft.cep.PatternDsl
    // Flink's DEFAULT oneOrMore (SKIP_TILL_NEXT inner): x@2 sits between
    // loop iterations; the greedy run binds both a's.
    val relaxed = PatternDsl.begin[E]("a", _.typ == "a").oneOrMore
      .followedBy("b", _.typ == "b").build
    val evs = Seq(E(1, "a"), E(2, "x"), E(3, "a"), E(4, "b"))
    val ms = run(relaxed, evs: _*)
    assert(ms.size == 1)
    assert(ms.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L, 3L))
    // .consecutive (STRICT inner) stops the loop at x@2 — the run binds
    // only a@1; the followedBy (relaxed OUTER contiguity) then skips
    // x@2 and a@3 to reach b@4, exactly like the reference where
    // consecutive() narrows only the loop interior.
    val strict = PatternDsl.begin[E]("a", _.typ == "a").oneOrMore.consecutive
      .followedBy("b", _.typ == "b").build
    val sm = run(strict, evs: _*)
    assert(sm.size == 1)
    assert(sm.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L))
    assert(sm.head.first("b").t == 4)
  }

  test("relaxed inner loop backtracks to leave events for later steps") {
    import graft.cep.PatternDsl
    // Greedy a+ would swallow a@3; backtracking must release it so the
    // `end` step (also typ a) can bind.
    val p = PatternDsl.begin[E]("a", _.typ == "a").oneOrMore
      .followedBy("end", _.typ == "a").build
    val ms = run(p, E(1, "a"), E(2, "x"), E(3, "a"))
    assert(ms.size == 1)
    assert(ms.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L))
    assert(ms.head.first("end").t == 3)
  }

  test("times with relaxed inner consumption respects max across gaps") {
    import graft.cep.PatternDsl
    val p = PatternDsl.begin[E]("a", _.typ == "a").times(1, 2)
      .followedBy("b", _.typ == "b").build
    // a@1, x@2, a@3, a@4, b@5: greedy cap 2 binds [1,3] then b must
    // follow from index after a@3 — b@5 comes after a@4 (relaxed outer
    // contiguity skips it).
    val ms = run(p, E(1, "a"), E(2, "x"), E(3, "a"), E(4, "a"), E(5, "b"))
    assert(ms.size == 1)
    assert(ms.head.bindings.find(_._1 == "a").get._2.map(_.t) == Vector(1L, 3L))
    // within bound cuts the relaxed run's forward scan: from a@1 the
    // b@4 lands exactly at the bound (span 3 >= 3), so no match starts
    // there; the scan re-anchors at a@3.
    val bounded = p.copy(withinMicros = Some(3L))
    val bms = run(bounded, E(1, "a"), E(2, "x"), E(3, "a"), E(4, "b"))
    assert(bms.map(_.bindings.find(_._1 == "a").get._2.map(_.t)) ==
      Vector(Vector(3L)))
  }

  test("consecutive on a non-looping step throws like the reference") {
    import graft.cep.PatternDsl
    intercept[IllegalArgumentException] {
      PatternDsl.begin[E]("a", _.typ == "a").consecutive
    }
  }

  test("skipToFirst of the leading variable still makes progress") {
    // a+ with SkipToFirst(a): target == match start; the scan resumes
    // one past it (the set-based reference emits one match per start).
    val p = Pattern[E](Vector(
      Step("a", (_: E).typ == "a", Quantifier.OneOrMore)),
      afterMatch = AfterMatch.SkipToFirst("a"))
    val ms = run(p, E(1, "a"), E(2, "a"))
    assert(ms.map(_.bindings.head._2.map(_.t)) == Vector(Vector(1L, 2L), Vector(2L)))
  }
}
