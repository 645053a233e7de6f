package graft.cep

import graft.cep.Nfa._

/** Fluent pattern-construction API mirroring the reference's CEP
  * surface (flink-cep .../pattern/Pattern.java: begin/next/followedBy/
  * oneOrMore/optional/consecutive/within/afterMatch...) over the
  * [[Nfa]] core. Quantifier/contiguity calls modify the most recent
  * step, exactly like the reference's builder.
  *
  * {{{
  * val p = PatternDsl.begin[Ev]("start", _.kind == "a").oneOrMore
  *   .followedBy("end", _.kind == "b")
  *   .within(60.seconds)
  *   .build
  * }}}
  */
object PatternDsl {

  def begin[T](name: String, pred: T => Boolean): Builder[T] =
    new Builder(Vector(Step(name, pred)), None, AfterMatch.SkipPastLast)

  final class Builder[T] private[PatternDsl] (
      steps: Vector[Step[T]],
      withinMicros: Option[Long],
      afterMatch: AfterMatch) {

    /** Strict contiguity — the next event must match (Pattern.next). */
    def next(name: String, pred: T => Boolean): Builder[T] =
      add(Step(name, pred, contiguity = Contiguity.Strict))

    /** Relaxed contiguity — skip till next match (Pattern.followedBy). */
    def followedBy(name: String, pred: T => Boolean): Builder[T] =
      add(Step(name, pred, contiguity = Contiguity.Relaxed))

    /** Loop the last step, greedy, with the reference's DEFAULT relaxed
      * inner consumption (SKIP_TILL_NEXT: non-matching events may sit
      * between loop iterations — flink-cep Pattern.oneOrMore). Chain
      * [[consecutive]] for strict inner consumption.
      */
    def oneOrMore: Builder[T] = amend(_.copy(
      quantifier = Quantifier.OneOrMore, innerContiguity = Contiguity.Relaxed))

    /** Make the last step optional. */
    def optional: Builder[T] = amend(_.copy(quantifier = Quantifier.Optional))

    /** Repeat the last step exactly `n` times (Pattern.times(n)). */
    def times(n: Int): Builder[T] = times(n, n)

    /** Repeat the last step `min` to `max` times, greedy
      * (Pattern.times(from, to)); relaxed inner consumption like
      * oneOrMore — chain [[consecutive]] to require adjacent events.
      */
    def times(min: Int, max: Int): Builder[T] = amend(_.copy(
      quantifier = Quantifier.Times(min, max), innerContiguity = Contiguity.Relaxed))

    /** Require the last step's loop iterations to be adjacent events
      * (Pattern.consecutive — STRICT inner consuming). Only meaningful
      * after [[oneOrMore]]/[[times]], like the reference, which throws
      * on non-looping states (flink-cep Pattern.java consecutive()).
      */
    def consecutive: Builder[T] = amend { s =>
      require(s.quantifier == Quantifier.OneOrMore ||
        s.quantifier.isInstanceOf[Quantifier.Times],
        s"consecutive() only applies to a looping quantifier, not ${s.quantifier}")
      s.copy(innerContiguity = Contiguity.Strict)
    }

    /** Time bound: match span strictly less than `d`. */
    def within(d: scala.concurrent.duration.FiniteDuration): Builder[T] =
      new Builder(steps, Some(d.toMicros), afterMatch)

    def afterMatchSkipPastLast: Builder[T] =
      new Builder(steps, withinMicros, AfterMatch.SkipPastLast)

    def afterMatchNoSkip: Builder[T] =
      new Builder(steps, withinMicros, AfterMatch.NoSkip)

    /** Resume the scan one past the match's start (SQL `AFTER MATCH
      * SKIP TO NEXT ROW`; AfterMatchSkipStrategy.skipToNext).
      */
    def afterMatchSkipToNext: Builder[T] =
      new Builder(steps, withinMicros, AfterMatch.SkipToNext)

    /** Resume the scan at the first event bound to `variable`
      * (AfterMatchSkipStrategy.skipToFirst).
      */
    def afterMatchSkipToFirst(variable: String): Builder[T] =
      new Builder(steps, withinMicros, AfterMatch.SkipToFirst(variable))

    /** Resume the scan at the last event bound to `variable`
      * (AfterMatchSkipStrategy.skipToLast).
      */
    def afterMatchSkipToLast(variable: String): Builder[T] =
      new Builder(steps, withinMicros, AfterMatch.SkipToLast(variable))

    def build: Pattern[T] = Pattern(steps, withinMicros, afterMatch)

    private def add(s: Step[T]): Builder[T] =
      new Builder(steps :+ s, withinMicros, afterMatch)
    private def amend(f: Step[T] => Step[T]): Builder[T] =
      new Builder(steps.init :+ f(steps.last), withinMicros, afterMatch)
  }
}
