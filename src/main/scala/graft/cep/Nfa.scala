package graft.cep

/** Pattern-matching (CEP / MATCH_RECOGNIZE) engine over per-key,
  * time-ordered event sequences — a from-scratch build of the semantics
  * of the reference's CEP library (flink-libraries/flink-cep/.../nfa/NFA.java:86,
  * pattern API .../pattern/Pattern.java, SQL StreamExecMatch.java:89).
  *
  * Supported surface:
  *   - steps with Once / Optional / OneOrMore(greedy) / Times(min,max)
  *     quantifiers
  *   - Strict (`next`) and Relaxed (`followedBy`, skip-till-next)
  *     contiguity per step, and per-loop inner consumption (Strict =
  *     `.consecutive()`, Relaxed = Flink's default skip-till-next
  *     between loop iterations) via [[Step.innerContiguity]]
  *   - `within` time bound (match discarded when
  *     time(last) - time(first) >= within, matching Flink's pruning)
  *   - after-match skip: NoSkip (every start index may begin a match),
  *     SkipPastLast (MATCH_RECOGNIZE default: resume after the last
  *     consumed event), SkipToFirst/SkipToLast(variable)
  *
  * The matcher is a deterministic leftmost-greedy backtracking scan —
  * equivalent to the NFA on these quantifiers, and easy to reason about
  * for oracle queries. It is pure per-sequence logic: callers partition
  * by key and feed time-sorted events, so it parallelizes per key both
  * in batch (flatMapGroups) and streaming (flatMapGroupsWithState).
  */
object Nfa {

  sealed trait Quantifier
  object Quantifier {
    case object Once extends Quantifier
    case object Optional extends Quantifier
    case object OneOrMore extends Quantifier
    /** Bounded repetition — Flink Pattern.times(from[, to]) / SQL
      * `A{n}` / `A{n,m}`. Consumes consecutively, greedy from `max`
      * down to `min` with backtracking, like OneOrMore.
      */
    final case class Times(min: Int, max: Int) extends Quantifier {
      require(min >= 1 && max >= min, s"invalid times($min,$max)")
    }
  }

  sealed trait Contiguity
  object Contiguity {
    /** `next` — the step must match the immediately following event. */
    case object Strict extends Contiguity
    /** `followedBy` — skip non-matching events until the step matches. */
    case object Relaxed extends Contiguity
  }

  sealed trait AfterMatch
  object AfterMatch {
    case object NoSkip extends AfterMatch
    case object SkipPastLast extends AfterMatch
    /** Resume at the event after the match's START (SQL `AFTER MATCH
      * SKIP TO NEXT ROW`; flink-cep .../nfa/aftermatch/
      * SkipToNextStrategy.java): discard every other match that starts
      * at the same event as the emitted one. This scan emits at most
      * one (leftmost-greedy) match per start index, so its enumeration
      * coincides with NoSkip — kept as a distinct strategy because the
      * reference API and the SQL spelling are distinct (they differ
      * there only under non-greedy/ALL ROWS modes, which are outside
      * this engine's deterministic-greedy contract).
      */
    case object SkipToNext extends AfterMatch
    /** Resume at the FIRST event bound to `variable` (SQL AFTER MATCH
      * SKIP TO FIRST v; flink-cep .../nfa/aftermatch/SkipToFirstStrategy).
      * A target equal to the match's own start resumes one past the
      * start instead (the set-based reference emits at most one match
      * per start index, so this is the scan equivalent, not a loop).
      * An unbound variable falls back to skip-past-last (the
      * reference's non-throwing miss behavior).
      */
    final case class SkipToFirst(variable: String) extends AfterMatch
    /** Resume at the LAST event bound to `variable`. */
    final case class SkipToLast(variable: String) extends AfterMatch
  }

  /** One pattern step. `contiguity` governs how this step's FIRST event
    * relates to the previous step; `innerContiguity` governs consumption
    * BETWEEN iterations of a looping quantifier (OneOrMore / Times):
    * Strict = consecutive events only (Flink's `.consecutive()`),
    * Relaxed = non-matching events may sit between iterations (Flink's
    * DEFAULT inner consuming strategy, SKIP_TILL_NEXT —
    * flink-cep .../pattern/Quantifier.java). Ignored for non-looping
    * quantifiers.
    */
  final case class Step[T](
      name: String,
      pred: T => Boolean,
      quantifier: Quantifier = Quantifier.Once,
      contiguity: Contiguity = Contiguity.Strict,
      innerContiguity: Contiguity = Contiguity.Strict)

  final case class Pattern[T](
      steps: Vector[Step[T]],
      withinMicros: Option[Long] = None,
      afterMatch: AfterMatch = AfterMatch.SkipPastLast)

  /** One match: step name -> events bound to it (OneOrMore binds many). */
  final case class Match[T](bindings: Vector[(String, Vector[T])]) {
    def first(step: String): T = bindings.find(_._1 == step).get._2.head
    def last(step: String): T = bindings.find(_._1 == step).get._2.last
  }

  /** Run the pattern over one key's time-sorted events. */
  def run[T](events: IndexedSeq[T], time: T => Long, pattern: Pattern[T]): Vector[Match[T]] =
    runIndexed(events, time, pattern).map(_._1)

  /** Like [[run]], but pairs each match with the index of its last
    * consumed event — streaming callers use this to decide whether a
    * trailing match could still extend past the watermark.
    */
  def runIndexed[T](events: IndexedSeq[T], time: T => Long,
                    pattern: Pattern[T]): Vector[(Match[T], Int)] = {
    val out = Vector.newBuilder[(Match[T], Int)]
    var i = 0
    while (i < events.length) {
      matchFrom(events, time, pattern, i) match {
        case Some((m, lastIdx)) =>
          out += ((m, lastIdx))
          i = nextStart(events, pattern, m, i, lastIdx)
        case None => i += 1
      }
    }
    out.result()
  }

  /** Resume index after a match at `start..lastIdx` per the pattern's
    * after-match strategy.
    */
  private def nextStart[T](events: IndexedSeq[T], pattern: Pattern[T],
                           m: Match[T], start: Int, lastIdx: Int): Int =
    pattern.afterMatch match {
      case AfterMatch.SkipPastLast   => lastIdx + 1
      case AfterMatch.NoSkip         => start + 1
      case AfterMatch.SkipToNext     => start + 1
      case AfterMatch.SkipToFirst(v) => skipTo(events, m, v, start, lastIdx, first = true)
      case AfterMatch.SkipToLast(v)  => skipTo(events, m, v, start, lastIdx, first = false)
    }

  private def skipTo[T](events: IndexedSeq[T], m: Match[T], v: String,
                        start: Int, lastIdx: Int, first: Boolean): Int =
    m.bindings.find(_._1.equalsIgnoreCase(v)).map(_._2) match {
      case None => lastIdx + 1 // variable left unbound (optional) — miss
      case Some(es) =>
        val target = (if (first) es.head else es.last).asInstanceOf[AnyRef]
        var i = start
        while (i <= lastIdx && (events(i).asInstanceOf[AnyRef] ne target)) i += 1
        if (i > lastIdx) lastIdx + 1
        // The reference's skip strategies operate on the SET of computed
        // matches (one per start index at most), so a skip target equal
        // to the current start can't re-emit — the scan equivalent is
        // "resume at the target, but always make progress".
        else math.max(i, start + 1)
    }

  /** Like [[run]], but also reports TIMED-OUT PARTIAL matches — the
    * flink-cep timeout surface (PatternStream.select with a timeout
    * tag; .../nfa/NFA.java advanceTime pruning + a
    * TimedOutPartialMatchHandler). A partial is reported for a start
    * event whose first step matched, no complete match exists from it,
    * and the `within` window has conclusively expired inside the data
    * (time(last event) - time(start) >= within). Its bindings are the
    * greedy non-backtracking step prefix. Patterns without `within`
    * never time out.
    */
  def runWithTimeouts[T](events: IndexedSeq[T], time: T => Long,
                         pattern: Pattern[T]): (Vector[Match[T]], Vector[Match[T]]) = {
    val (ms, ts) = runIndexedWithTimeouts(events, time, pattern, None)
    (ms.map(_._1), ts)
  }

  /** Single-pass scan returning (match, lastIdx) pairs plus timeouts.
    * `nowMicros` overrides the expiry clock (streaming callers pass the
    * watermark; batch defaults to the last event's time).
    */
  def runIndexedWithTimeouts[T](events: IndexedSeq[T], time: T => Long,
                                pattern: Pattern[T], nowMicros: Option[Long])
      : (Vector[(Match[T], Int)], Vector[Match[T]]) = {
    val out = Vector.newBuilder[(Match[T], Int)]
    val timeouts = Vector.newBuilder[Match[T]]
    val endTime = nowMicros.getOrElse(
      if (events.nonEmpty) time(events.last) else Long.MinValue)
    var i = 0
    while (i < events.length) {
      matchFrom(events, time, pattern, i) match {
        case Some((m, lastIdx)) =>
          out += ((m, lastIdx))
          i = nextStart(events, pattern, m, i, lastIdx)
        case None =>
          if (pattern.withinMicros.exists(w =>
              pattern.steps.head.pred(events(i)) && endTime - time(events(i)) >= w)) {
            val partial = greedyPrefix(events, time, pattern, i)
            if (partial.nonEmpty) timeouts += Match(partial)
          }
          i += 1
      }
    }
    (out.result(), timeouts.result())
  }

  /** Result of one incremental scan step for the overlapping
    * after-match strategies: matches/timeouts to emit now, plus the
    * updated per-event `done` flags (true = this event can never again
    * START a match — emitted, suppressed by a skip range, timed out, or
    * first-step predicate false). Events stay CONSUMABLE by later
    * matches while any earlier event is still open; the caller evicts
    * only the fully-done prefix.
    */
  final case class Incremental[T](matches: Vector[Match[T]],
                                  timeouts: Vector[Match[T]],
                                  done: Vector[Boolean])

  /** Incremental (resumable) scan for the OVERLAPPING after-match
    * strategies — NoSkip / SkipToNext / SkipToFirst / SkipToLast —
    * where a consumed event may still start or join a later match, so
    * streaming state can't drop consumed events the way SkipPastLast
    * does (reference flink-cep .../nfa/aftermatch/AfterMatchSkipStrategy
    * .java keeps overlapping partial matches alive the same way).
    *
    * `done0` carries the flags from the previous call over the SAME
    * (prefix-evicted) event sequence; `provisional(m, lastIdx)` is the
    * caller's "this match could still extend past the data horizon"
    * predicate — a provisional match is withheld: not emitted, its
    * start left un-done, so a later call retries it. For the
    * extent-independent strategies (NoSkip/SkipToNext resume at
    * start+1) the scan continues past a withheld match; for
    * SkipToFirst/SkipToLast the resume point depends on the match's
    * final bindings, so the scan stops there until the match resolves.
    */
  def runIncrementalOverlap[T](events: IndexedSeq[T], done0: IndexedSeq[Boolean],
                               time: T => Long, pattern: Pattern[T],
                               nowMicros: Long,
                               provisional: (Match[T], Int) => Boolean): Incremental[T] = {
    require(pattern.afterMatch != AfterMatch.SkipPastLast,
      "SkipPastLast uses the consuming scan, not the overlap scan")
    val done = Array.tabulate(events.length)(i => i < done0.length && done0(i))
    val out = Vector.newBuilder[Match[T]]
    val touts = Vector.newBuilder[Match[T]]
    val extentIndependent = pattern.afterMatch match {
      case AfterMatch.NoSkip | AfterMatch.SkipToNext => true
      case _                                         => false
    }
    var i = 0
    var stop = false
    while (i < events.length && !stop) {
      if (done(i)) i += 1
      else if (!pattern.steps.head.pred(events(i))) {
        // can never start a match — resolve immediately so the done
        // prefix (and state eviction) keeps advancing
        done(i) = true
        i += 1
      } else matchFrom(events, time, pattern, i) match {
        case Some((m, lastIdx)) =>
          if (provisional(m, lastIdx)) {
            if (extentIndependent) i += 1 else stop = true
          } else {
            out += m
            val next = nextStart(events, pattern, m, i, lastIdx)
            var j = i
            while (j < next && j < events.length) { done(j) = true; j += 1 }
            i = next
          }
        case None =>
          if (pattern.withinMicros.exists(w => nowMicros - time(events(i)) >= w)) {
            // conclusively expired start: report the timed-out partial
            // once and resolve the start
            val partial = greedyPrefix(events, time, pattern, i)
            if (partial.nonEmpty) touts += Match(partial)
            done(i) = true
          }
          i += 1
      }
    }
    Incremental(out.result(), touts.result(), done.toVector)
  }

  /** Greedy, non-backtracking prefix binding for timeout reporting:
    * bind steps left to right until one fails; empty when no step (or
    * every step) binds — a full binding is a match, not a timeout.
    */
  private def greedyPrefix[T](events: IndexedSeq[T], time: T => Long,
                              pattern: Pattern[T], start: Int): Vector[(String, Vector[T])] = {
    val startTime = time(events(start))
    def withinOk(idx: Int): Boolean = pattern.withinMicros match {
      case Some(w) => time(events(idx)) - startTime < w
      case None    => true
    }
    var acc = Vector.empty[(String, Vector[T])]
    var pos = start
    var stepIdx = 0
    var stuck = false
    while (stepIdx < pattern.steps.length && !stuck) {
      val step = pattern.steps(stepIdx)
      val strict = step.contiguity == Contiguity.Strict || stepIdx == 0
      var p = pos
      if (!strict) {
        while (p < events.length && withinOk(p) && !step.pred(events(p))) p += 1
      }
      if (p < events.length && withinOk(p) && step.pred(events(p))) {
        val run = collectRun(events, step, p, time, withinOk)
        val (bound, minLen) = step.quantifier match {
          case Quantifier.Times(n, mx) => (run.take(mx), n)
          case _                       => (run, 1)
        }
        if (bound.length >= minLen) {
          acc :+= step.name -> bound.map(events(_)).toVector
          pos = bound.last + 1
          stepIdx += 1
        } else stuck = true
      } else if (step.quantifier == Quantifier.Optional) {
        stepIdx += 1
      } else {
        stuck = true
      }
    }
    if (stepIdx == pattern.steps.length) Vector.empty else acc
  }

  /** Try to match with the first step's first event at exactly `start`.
    * Returns the match and the index of the last consumed event.
    */
  private def matchFrom[T](events: IndexedSeq[T], time: T => Long,
                           pattern: Pattern[T], start: Int): Option[(Match[T], Int)] = {
    val startTime = time(events(start))
    def withinOk(idx: Int): Boolean = pattern.withinMicros match {
      case Some(w) => time(events(idx)) - startTime < w
      case None    => true
    }

    // Recursive greedy matcher with backtracking. `stepIdx` = current step,
    // `pos` = next candidate event index, `prev` = index of last bound event.
    def go(stepIdx: Int, pos: Int, prev: Int,
           acc: Vector[(String, Vector[T])]): Option[(Match[T], Int)] = {
      if (stepIdx == pattern.steps.length) return Some((Match(acc), prev))
      val step = pattern.steps(stepIdx)
      val strict = step.contiguity == Contiguity.Strict || (stepIdx == 0)

      // Candidate start positions for this step's first event.
      var p = pos
      while (p < events.length && withinOk(p)) {
        val hit = step.pred(events(p))
        if (hit) {
          // Greedily extend looping quantifiers: bind the longest
          // contiguous run (capped at Times.max), then backtrack
          // shorter, down to the quantifier's minimum.
          val runIdx = collectRun(events, step, p, time, withinOk)
          val (maxTake, minTake) = step.quantifier match {
            case Quantifier.OneOrMore    => (runIdx.length, 1)
            case Quantifier.Times(n, mx) => (math.min(runIdx.length, mx), n)
            case _                       => (runIdx.length, 1)
          }
          var take = maxTake
          while (take >= minTake) {
            val bound = runIdx.take(take)
            val res = go(stepIdx + 1, bound.last + 1, bound.last,
              acc :+ (step.name -> bound.map(events(_)).toVector))
            if (res.isDefined) return res
            step.quantifier match {
              case Quantifier.OneOrMore | _: Quantifier.Times => take -= 1
              case _                                          => take = 0
            }
          }
          if (strict) {
            // Strict step failed at the required position: try Optional skip,
            // else the whole prefix fails.
            return if (step.quantifier == Quantifier.Optional)
              go(stepIdx + 1, pos, prev, acc)
            else None
          }
        } else if (strict) {
          return if (step.quantifier == Quantifier.Optional)
            go(stepIdx + 1, pos, prev, acc)
          else None
        }
        p += 1
      }
      // Ran out of events (or within expired) without matching this step.
      if (step.quantifier == Quantifier.Optional) go(stepIdx + 1, pos, prev, acc)
      else None
    }

    def firstStepStarts: Boolean = pattern.steps.head.pred(events(start))
    if (!firstStepStarts) None
    else go(0, start, start - 1, Vector.empty)
  }

  /** Longest greedy run of events satisfying `step` starting at `from`,
    * honoring the step's `innerContiguity`: Strict stops at the first
    * non-matching event (Flink's `oneOrMore().consecutive().greedy()`);
    * Relaxed skips non-matching events between iterations while the
    * `within` bound holds (Flink's default SKIP_TILL_NEXT inner
    * consuming, greedy). Collection stays linear either way — the
    * backtracking in [[matchFrom]] only shortens the collected prefix,
    * so no exponential blowup. Returns bound indices (length 1 for
    * non-looping quantifiers).
    */
  private def collectRun[T](events: IndexedSeq[T], step: Step[T], from: Int,
                            time: T => Long, withinOk: Int => Boolean): IndexedSeq[Int] = {
    step.quantifier match {
      case Quantifier.OneOrMore | _: Quantifier.Times =>
        val relaxed = step.innerContiguity == Contiguity.Relaxed
        var idx = from
        var open = true
        val buf = IndexedSeq.newBuilder[Int]
        while (open && idx < events.length && withinOk(idx)) {
          if (step.pred(events(idx))) { buf += idx; idx += 1 }
          else if (relaxed) idx += 1
          else open = false
        }
        buf.result()
      case _ => IndexedSeq(from)
    }
  }
}
