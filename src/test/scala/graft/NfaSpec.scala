package graft

import graft.cep.Nfa
import graft.cep.Nfa._
import org.scalatest.funsuite.AnyFunSuite

class NfaSpec extends AnyFunSuite {
  case class E(t: Long, typ: String)
  private def pat(steps: Step[E]*) = Pattern[E](steps.toVector)
  private def run(p: Pattern[E], evs: E*): Vector[Match[E]] =
    Nfa.run(evs.toIndexedSeq, (_: E).t, p)

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
}
