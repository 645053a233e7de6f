package graft.streaming

import graft.cep.Nfa
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.reflect.runtime.universe.TypeTag

/** A changelog row in the reference's RowKind vocabulary (+I/-U/+U/-D) —
  * SURVEY.md §1.1: changelogs are modeled as an ordinary column.
  */
case class Change[T](kind: String, rank: Int, value: T)
case class DedupChange[T](kind: String, value: T)
case class WindowResult[K](key: K, winId: Long, count: Long, sum: Double)
case class AsOfMatch[L, R](left: L, right: Option[R])

/** Stateful streaming operators on flatMapGroupsWithState — the
  * genuinely custom layer (SURVEY.md §7.2-6) mirroring the reference's
  * streaming specialties:
  *
  *  - streamingTopN: per-key bounded Top-N state with per-rank upsert
  *    emission (semantics of flink-table-runtime
  *    .../rank/UpdatableTopNFunction.java / AppendOnlyTopNFunction.java)
  *  - keepLastDedup: keep-last-row upserts
  *    (.../deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java:32)
  *  - eventTimeSorted: watermark-driven ordered emission
  *    (.../sort/RowTimeSortOperator.java)
  *  - countTumbleAgg: count-tumbling windows
  *    (flink-streaming-java .../assigners/CountTumblingWindowAssigner)
  *  - temporalJoin: event-time as-of join with versioned right-side state
  *    (.../join/temporal/TemporalRowTimeJoinOperator.java:78)
  *  - cepStream: watermark-driven NFA pattern matching
  *    (flink-libraries/flink-cep .../nfa/NFA.java:86)
  *
  * State per key is bounded (Top-N keeps n rows; watermark-driven
  * operators evict below the watermark), so executors scale horizontally
  * with the key space — no driver-side state anywhere.
  */
object StatefulOps {

  /** Streaming Top-N per key. Emits rank changes as +I (new rank) / +U
    * (rank content replaced). `lessThan` orders "better first".
    * Use with OutputMode.Update sinks.
    *
    * `stateTtlMs` mirrors the reference's `table.exec.state.ttl`
    * (flink-table-api-java .../config/ExecutionConfigOptions.java:48):
    * when set, a key whose state goes untouched for the TTL is evicted
    * (processing-time timer), so an unbounded key space can't grow
    * state forever; a later arrival for the key starts fresh (+I).
    * Default off — identical to the reference's default (0 = never).
    *
    * State is a typed Seq[T] (product encoder via TypeTag), not Kryo
    * blobs: store-inspectable and schema-evolvable.
    */
  def streamingTopN[K, T: TypeTag](ds: Dataset[T], n: Int, keyFn: T => K,
                                   lessThan: (T, T) => Boolean,
                                   stateTtlMs: Option[Long] = None)
                         (implicit ek: Encoder[K], ec: Encoder[Change[T]]): Dataset[Change[T]] = {
    implicit val se: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtlMs)) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[T]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val old = state.getOption.getOrElse(Seq.empty)
            val merged = (old ++ rows).sortWith(lessThan).take(n)
            state.update(merged)
            stateTtlMs.foreach(state.setTimeoutDuration)
            val changes = merged.zipWithIndex.flatMap { case (v, i) =>
              old.lift(i) match {
                case Some(prev) if prev == v => None
                case Some(_)                 => Some(Change("+U", i + 1, v))
                case None                    => Some(Change("+I", i + 1, v))
              }
            }
            changes.iterator
          }
      }
  }

  private def ttlTimeout(stateTtlMs: Option[Long]): GroupStateTimeout =
    if (stateTtlMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Keep-last deduplication per key: emits -U for the displaced row and
    * +I/+U for the new winner. `newer(a, b)` = a supersedes b.
    * `stateTtlMs` as in [[streamingTopN]] — idle keys evict, a
    * post-eviction arrival re-inserts as +I (the reference's
    * state-TTL-expired behavior).
    */
  def keepLastDedup[K, T: TypeTag](ds: Dataset[T], keyFn: T => K,
                                   newer: (T, T) => Boolean,
                                   stateTtlMs: Option[Long] = None)
                         (implicit ek: Encoder[K], ec: Encoder[DedupChange[T]]): Dataset[DedupChange[T]] = {
    implicit val se: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Update, ttlTimeout(stateTtlMs)) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[T]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val old = state.getOption.getOrElse(Seq.empty).headOption
            val best = (old.toSeq ++ rows).reduceLeft((a, b) => if (newer(b, a)) b else a)
            state.update(Seq(best))
            stateTtlMs.foreach(state.setTimeoutDuration)
            old match {
              case None                      => Iterator(DedupChange("+I", best))
              case Some(p) if p == best      => Iterator.empty
              case Some(p)                   =>
                Iterator(DedupChange("-U", p), DedupChange("+U", best))
            }
          }
      }
  }

  /** Event-time ordered emission: buffers rows per key and releases them
    * sorted once the watermark passes their timestamp. Requires
    * `withWatermark` upstream; emits in Append mode.
    *
    * `stateTtlMs` mirrors `table.exec.state.ttl` for this operator's
    * one unbounded-state hazard: a row whose timestamp sits MORE than
    * the TTL ahead of the watermark (a runaway-future producer clock)
    * would otherwise pend forever. Such rows are dropped — the same
    * silent-expiry contract as the reference's state TTL. Default off.
    */
  def eventTimeSorted[K, T: TypeTag](ds: Dataset[T], keyFn: T => K, tsMs: T => Long,
                                     stateTtlMs: Option[Long] = None)
                           (implicit ek: Encoder[K], et: Encoder[T]): Dataset[T] = {
    implicit val se: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[T]]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(Seq.empty) ++ rows
          val (ready, pending0) = buf.partition(t => tsMs(t) <= wm)
          // wm == 0 means no watermark has been computed yet — never
          // expire against the initial zero
          val pending = stateTtlMs match {
            case Some(ttl) if wm > 0 => pending0.filter(t => tsMs(t) - wm <= ttl)
            case _                   => pending0
          }
          if (pending.nonEmpty) {
            state.update(pending)
            state.setTimeoutTimestamp(wm + 1)
          } else if (state.exists) state.remove()
          ready.sortBy(tsMs).iterator
      }
  }

  /** Flink `sideOutputLateData` parity (flink-streaming-java
    * WindowedStream.java:124): Spark's stateful operators silently drop
    * watermark-late rows; this pass-through TAGS them instead — route
    * `_1 == false` into the main pipeline and `_1 == true` to a
    * late-data sink. Stateless (no buffering): lateness is judged
    * against the watermark at arrival, like Flink's
    * WindowOperator.isElementLate. Place it BEFORE the dropping
    * operator, on the already-watermarked stream.
    */
  def sideOutputLate[K, T](ds: Dataset[T], keyFn: T => K, tsMs: T => Long)
                          (implicit ek: Encoder[K],
                           eo: Encoder[(Boolean, T)]): Dataset[(Boolean, T)] = {
    implicit val sb: Encoder[Boolean] = Encoders.scalaBoolean
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Boolean]) =>
          val wm = state.getCurrentWatermarkMs()
          rows.map(t => (wm > 0 && tsMs(t) <= wm, t))
      }
  }

  /** Count-tumbling window aggregate: every `size` rows per key (arrival
    * order) emit (key, winId, count, sum). Partial windows stay in state.
    */
  def countTumbleAgg[K, T](ds: Dataset[T], size: Int, keyFn: T => K,
                           valueFn: T => Double)
                          (implicit ek: Encoder[K], ew: Encoder[WindowResult[K]]): Dataset[WindowResult[K]] = {
    implicit val se: Encoder[(Long, Long, Double)] = Encoders.tuple(
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaDouble)
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[(Long, Long, Double)]) =>
          var (winId, cnt, acc) = state.getOption.getOrElse((0L, 0L, 0.0))
          val out = Seq.newBuilder[WindowResult[K]]
          rows.foreach { t =>
            cnt += 1; acc += valueFn(t)
            if (cnt == size) {
              out += WindowResult(key, winId, cnt, acc)
              winId += 1; cnt = 0; acc = 0.0
            }
          }
          state.update((winId, cnt, acc))
          out.result().iterator
      }
  }

  /** Count-sliding window aggregate — Flink `countWindow(size, slide)`
    * (flink-streaming-java .../assigners/CountSlidingWindowAssigner:
    * GlobalWindows + CountEvictor(size) + CountTrigger(slide)): every
    * `slide` rows per key emit (key, winId, count, sum) over the last
    * `size` rows (fewer while the buffer warms up). State per key is
    * bounded at `size` values.
    */
  def countSlideAgg[K, T](ds: Dataset[T], size: Int, slide: Int, keyFn: T => K,
                          valueFn: T => Double)
                         (implicit ek: Encoder[K], ew: Encoder[WindowResult[K]]): Dataset[WindowResult[K]] = {
    implicit val se: Encoder[(Long, Long, Seq[Double])] =
      ExpressionEncoder[(Long, Long, Seq[Double])]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[(Long, Long, Seq[Double])]) =>
          var (winId, sinceFire, buf) = state.getOption.getOrElse((0L, 0L, Seq.empty[Double]))
          val out = Seq.newBuilder[WindowResult[K]]
          rows.foreach { t =>
            buf = (buf :+ valueFn(t)).takeRight(size)
            sinceFire += 1
            if (sinceFire == slide) {
              out += WindowResult(key, winId, buf.size.toLong, buf.sum)
              winId += 1; sinceFire = 0
            }
          }
          state.update((winId, sinceFire, buf))
          out.result().iterator
      }
  }

  /** Tagged input for the two-stream temporal join (Spark stateful ops
    * are single-input; union both sides — the standard pattern). Carries
    * its own event-time column: typed maps drop watermark metadata, so
    * the watermark is re-declared on the tagged union.
    */
  case class TaggedInput[L, R](ts: java.sql.Timestamp, left: Option[L], right: Option[R])

  /** Event-time temporal (as-of) join: for each left row, the latest
    * right version with ts(right) <= ts(left), emitted once the
    * watermark passes the left row's time (so the right side is
    * complete up to it). Right versions below the minimum pending left
    * time are evicted — bounded state.
    *
    * `stateTtlMs` mirrors `table.exec.state.ttl` (reference
    * TemporalRowTimeJoinOperator keeps the latest right version
    * forever by default): when set, a key with no pending left rows
    * whose watermark then advances TTL ms without any new activity
    * drops its retained right versions entirely — a later left arrival
    * for the key joins to None, exactly the reference's
    * TTL-expired-state behavior. Default off (= the reference default).
    */
  def temporalJoin[K, L: TypeTag, R: TypeTag](left: Dataset[L], right: Dataset[R],
                            keyL: L => K, keyR: R => K,
                            tsLMs: L => Long, tsRMs: R => Long,
                            watermarkDelay: String = "0 seconds",
                            stateTtlMs: Option[Long] = None)
                           (implicit ek: Encoder[K], eti: Encoder[TaggedInput[L, R]],
                            em: Encoder[AsOfMatch[L, R]]): Dataset[AsOfMatch[L, R]] = {
    implicit val se: Encoder[(Seq[L], Seq[R])] = ExpressionEncoder[(Seq[L], Seq[R])]()
    val tagged = left
      .map(l => TaggedInput[L, R](new java.sql.Timestamp(tsLMs(l)), Some(l), None))
      .union(right.map(r => TaggedInput[L, R](new java.sql.Timestamp(tsRMs(r)), None, Some(r))))
      .withWatermark("ts", watermarkDelay)
    tagged.groupByKey(t => t.left.map(keyL).getOrElse(keyR(t.right.get)))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[TaggedInput[L, R]], state: GroupState[(Seq[L], Seq[R])]) =>
          val wm = state.getCurrentWatermarkMs()
          var (pendL, versR) = state.getOption.getOrElse((Seq.empty[L], Seq.empty[R]))
          // An idle-TTL fire: the timer was armed at wm+ttl when the key
          // had no pending left work, and nothing arrived since (a data
          // arrival is a separate non-timed-out invocation that re-arms).
          if (state.hasTimedOut && stateTtlMs.isDefined && pendL.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            rows.foreach { t =>
              t.left.foreach(l => pendL :+= l)
              t.right.foreach(r => versR :+= r)
            }
            val (ready, stillPend) = pendL.partition(l => tsLMs(l) <= wm)
            val sortedR = versR.sortBy(tsRMs)
            val out = ready.sortBy(tsLMs).map { l =>
              val t = tsLMs(l)
              AsOfMatch(l, sortedR.takeWhile(r => tsRMs(r) <= t).lastOption)
            }
            // Evict right versions no longer reachable: keep the latest
            // version at or below the horizon and everything after it.
            val horizon = (stillPend.map(tsLMs) :+ wm).min
            val (below, above) = sortedR.partition(r => tsRMs(r) <= horizon)
            val kept = below.takeRight(1) ++ above
            if (stillPend.nonEmpty || kept.nonEmpty) {
              state.update((stillPend, kept))
              if (stillPend.nonEmpty) state.setTimeoutTimestamp(wm + 1)
              else stateTtlMs match {
                case Some(ttl) => state.setTimeoutTimestamp(math.max(wm, 0L) + ttl)
                case None      => state.setTimeoutTimestamp(wm + 1)
              }
            } else if (state.exists) state.remove()
            out.iterator
          }
      }
  }

  /** Streaming OVER aggregate: per-key event-time-ordered running fold
    * (ROWS UNBOUNDED PRECEDING) — semantics of the reference's
    * RowTimeRowsUnboundedPrecedingFunction (flink-table-runtime
    * .../over/AbstractRowTimeUnboundedPrecedingOver.java:286): buffer
    * rows until the watermark passes them, then emit in time order with
    * the running accumulator carried in state. The accumulator is any
    * product type `A` — a multi-aggregate OVER (avg+count+max in one
    * pass) is one fold with a composite accumulator, matching the
    * reference's N-aggsHandler single-function design.
    */
  def eventTimeRunningAgg[K, T: TypeTag, A: TypeTag](ds: Dataset[T], keyFn: T => K,
                                tsMs: T => Long,
                                zero: A, add: (A, T) => A)
                               (implicit ek: Encoder[K],
                                eo: Encoder[(K, T, A)]): Dataset[(K, T, A)] = {
    implicit val se: Encoder[(Seq[T], A)] = ExpressionEncoder[(Seq[T], A)]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[(Seq[T], A)]) =>
          val wm = state.getCurrentWatermarkMs()
          var (buf, acc) = state.getOption.getOrElse((Seq.empty[T], zero))
          buf ++= rows
          val (ready, pending) = buf.partition(t => tsMs(t) <= wm)
          val out = ready.sortBy(tsMs).map { t =>
            acc = add(acc, t)
            (key, t, acc)
          }
          if (pending.nonEmpty) {
            state.update((pending, acc))
            state.setTimeoutTimestamp(wm + 1)
          } else state.update((Seq.empty, acc)) // keep the accumulator
          out.iterator
      }
  }

  /** Pure bounded-ROWS-frame fold, shared by the batch parity query
    * (o02) and [[eventTimeRowsBoundedAgg]]: time-ordered rows enter one
    * at a time; each output aggregates the current row plus at most
    * `precedingRows` before it, the oldest row retracting as the frame
    * slides — the accumulate/retract pair of the reference's
    * RowTimeRowsBoundedPrecedingFunction (flink-table-runtime
    * .../over/RowTimeRowsBoundedPrecedingFunction.java:318). Returns
    * per-row outputs plus the carry (retained frame rows, accumulator)
    * for the streaming caller's state.
    */
  def rowsBoundedFold[T, A](rows: Seq[T], carry0: Seq[T], acc0: A,
                            precedingRows: Int, add: (A, T) => A,
                            retract: (A, T) => A): (Vector[(T, A)], Seq[T], A) = {
    var carry = carry0
    var acc = acc0
    val out = Vector.newBuilder[(T, A)]
    rows.foreach { t =>
      acc = add(acc, t)
      carry :+= t
      if (carry.size > precedingRows + 1) {
        acc = retract(acc, carry.head)
        carry = carry.tail
      }
      out += ((t, acc))
    }
    (out.result(), carry, acc)
  }

  /** Pure bounded-RANGE-frame fold (reference
    * RowTimeRangeBoundedPrecedingFunction.java:296): the frame holds
    * every row with ts in [ts(current) - precedingMs, ts(current)].
    * Same-timestamp peers enter together and share one aggregate value
    * — SQL RANGE-frame peer semantics, exactly the reference's
    * per-timestamp batching.
    */
  def rangeBoundedFold[T, A](rows: Seq[T], tsMs: T => Long, carry0: Seq[T],
                             acc0: A, precedingMs: Long, add: (A, T) => A,
                             retract: (A, T) => A): (Vector[(T, A)], Seq[T], A) = {
    var carry = carry0
    var acc = acc0
    val out = Vector.newBuilder[(T, A)]
    val seq = rows.toIndexedSeq
    var i = 0
    while (i < seq.length) {
      val t0 = tsMs(seq(i))
      var j = i
      while (j < seq.length && tsMs(seq(j)) == t0) {
        acc = add(acc, seq(j)); carry :+= seq(j); j += 1
      }
      while (carry.nonEmpty && tsMs(carry.head) < t0 - precedingMs) {
        acc = retract(acc, carry.head); carry = carry.tail
      }
      var k = i
      while (k < j) { out += ((seq(k), acc)); k += 1 }
      i = j
    }
    (out.result(), carry, acc)
  }

  /** Streaming OVER with a bounded ROWS frame (`ROWS BETWEEN n
    * PRECEDING AND CURRENT ROW`): per key, rows emit in event-time
    * order (ties broken by `tie`) once the watermark passes them,
    * aggregated over the last `precedingRows`+1 rows with the evicted
    * row retracted — RowTimeRowsBoundedPrecedingFunction semantics.
    * State = pending immature rows + the ≤precedingRows+1 frame rows +
    * the accumulator: bounded per key.
    */
  def eventTimeRowsBoundedAgg[K, T: TypeTag, A: TypeTag](ds: Dataset[T], keyFn: T => K,
      tsMs: T => Long, tie: T => Long, precedingRows: Int,
      zero: A, add: (A, T) => A, retract: (A, T) => A)
     (implicit ek: Encoder[K], eo: Encoder[(K, T, A)]): Dataset[(K, T, A)] = {
    implicit val se: Encoder[(Seq[T], Seq[T], A)] = ExpressionEncoder[(Seq[T], Seq[T], A)]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[(Seq[T], Seq[T], A)]) =>
          val wm = state.getCurrentWatermarkMs()
          var (pending, carry, acc) =
            state.getOption.getOrElse((Seq.empty[T], Seq.empty[T], zero))
          pending ++= rows
          val (ready, still) = pending.partition(t => tsMs(t) <= wm)
          val (outs, carry2, acc2) = rowsBoundedFold(
            ready.sortBy(t => (tsMs(t), tie(t))), carry, acc,
            precedingRows, add, retract)
          state.update((still, carry2, acc2))
          if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          outs.iterator.map { case (t, a) => (key, t, a) }
      }
  }

  /** Streaming OVER with a bounded RANGE frame (`RANGE BETWEEN
    * <interval> PRECEDING AND CURRENT ROW`): like
    * [[eventTimeRowsBoundedAgg]] but the frame is time-bounded —
    * every row within `precedingMs` of the current row's event time,
    * same-timestamp peers sharing one aggregate
    * (RowTimeRangeBoundedPrecedingFunction semantics). State is
    * bounded by the frame's time span.
    */
  def eventTimeRangeBoundedAgg[K, T: TypeTag, A: TypeTag](ds: Dataset[T], keyFn: T => K,
      tsMs: T => Long, tie: T => Long, precedingMs: Long,
      zero: A, add: (A, T) => A, retract: (A, T) => A)
     (implicit ek: Encoder[K], eo: Encoder[(K, T, A)]): Dataset[(K, T, A)] = {
    implicit val se: Encoder[(Seq[T], Seq[T], A)] = ExpressionEncoder[(Seq[T], Seq[T], A)]()
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, rows: Iterator[T], state: GroupState[(Seq[T], Seq[T], A)]) =>
          val wm = state.getCurrentWatermarkMs()
          var (pending, carry, acc) =
            state.getOption.getOrElse((Seq.empty[T], Seq.empty[T], zero))
          pending ++= rows
          val (ready, still) = pending.partition(t => tsMs(t) <= wm)
          val (outs, carry2, acc2) = rangeBoundedFold(
            ready.sortBy(t => (tsMs(t), tie(t))), tsMs, carry, acc,
            precedingMs, add, retract)
          state.update((still, carry2, acc2))
          if (still.nonEmpty) state.setTimeoutTimestamp(wm + 1)
          outs.iterator.map { case (t, a) => (key, t, a) }
      }
  }

  /** Streaming CEP: buffers events per key, and on each watermark
    * advance runs the NFA over the mature (ts <= watermark) prefix in
    * event-time order. All five after-match skip strategies are
    * supported, matching batch [[Nfa.run]] and the reference
    * (flink-cep .../nfa/aftermatch/AfterMatchSkipStrategy.java):
    * under SkipPastLast consumed events are dropped from state; under
    * the overlapping strategies (NoSkip/SkipToNext/SkipToFirst/
    * SkipToLast) a consumed event may still start or join a later
    * match, so events carry a per-event done flag instead and only the
    * fully-resolved prefix is evicted ([[Nfa.runIncrementalOverlap]]).
    * Unmatched mature events older than the pattern's `within` horizon
    * are evicted either way (they can no longer start a match that
    * involves unseen data).
    *
    * A trailing match whose final step could still extend — a greedy
    * loop whose run ends exactly at the last mature event (or, for
    * relaxed inner consumption, ends anywhere: non-matching events
    * don't close it), or an Optional left unbound there — is WITHHELD
    * (its events stay in state) until a later mature event terminates
    * the run or the `within` horizon makes extension impossible (a
    * trailing relaxed-inner loop therefore REQUIRES a `within` bound).
    * This mirrors Flink's NFA, which keeps looping/optional final
    * states open
    * (flink-cep .../nfa/NFA.java:86 advanceTime/computeNextStates)
    * rather than finalizing them at the watermark.
    */
  def cepStream[K, T](ds: Dataset[T], keyFn: T => K, tsMs: T => Long,
                      pattern: Nfa.Pattern[T])
                     (implicit ek: Encoder[K]): Dataset[Nfa.Match[T]] = {
    // Kryo stays here deliberately: the SQL surface drives CEP with
    // T = Row (MatchRecognize.runStream), and Row has no product
    // encoder — a schema-typed state encoding is impossible for it.
    implicit val e1: Encoder[Nfa.Match[T]] = Encoders.kryo[Nfa.Match[T]]
    cepStreamWithTimeouts(ds, keyFn, tsMs, pattern)
      .flatMap(r => if (r._1) None else Some(r._2))
  }

  /** [[cepStream]] plus the timeout side output (flink-cep
    * TimedOutPartialMatchHandler / PatternStream timeout tag): emits
    * (isTimeout, match). A timed-out partial — greedy step-prefix
    * bindings of a start event whose `within` window the watermark has
    * passed without a complete match — is reported exactly once, in the
    * micro-batch where its start event crosses the eviction horizon.
    */
  def cepStreamWithTimeouts[K, T](ds: Dataset[T], keyFn: T => K, tsMs: T => Long,
                                  pattern: Nfa.Pattern[T])
                                 (implicit ek: Encoder[K]): Dataset[(Boolean, Nfa.Match[T])] = {
    // State carries (event, done) pairs: `done` = the event can never
    // again START a match. SkipPastLast ignores the flag (consumed
    // events are simply dropped); the overlapping strategies need it to
    // make the incremental scan resumable without re-emitting.
    implicit val se: Encoder[Seq[(T, Boolean)]] = Encoders.kryo[Seq[(T, Boolean)]]
    implicit val e1: Encoder[(Boolean, Nfa.Match[T])] = Encoders.kryo[(Boolean, Nfa.Match[T])]
    val lastStep = pattern.steps.last
    val overlap = pattern.afterMatch != Nfa.AfterMatch.SkipPastLast
    def relaxedLoop(s: Nfa.Step[T]): Boolean = (s.quantifier match {
      case Nfa.Quantifier.OneOrMore | _: Nfa.Quantifier.Times => true
      case _ => false
    }) && s.innerContiguity == Nfa.Contiguity.Relaxed
    // A loop with RELAXED inner consumption is never closed by a
    // non-matching event — only the `within` horizon can finalize it.
    // SkipPastLast needs that only for the trailing step (earlier
    // matches are consumed away); the overlapping strategies withhold
    // EVERY match containing one, so any relaxed loop needs the bound.
    val trailingRelaxedLoop = relaxedLoop(lastStep)
    val relaxedLoopAnywhere = pattern.steps.exists(relaxedLoop)
    require(!(if (overlap) relaxedLoopAnywhere else trailingRelaxedLoop) ||
        pattern.withinMicros.isDefined,
      "a relaxed-inner loop (oneOrMore/times without .consecutive) " +
        "can only be finalized by a `within` bound; add one")
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[Seq[(T, Boolean)]]) =>
          val wm = state.getCurrentWatermarkMs()
          val buf = state.getOption.getOrElse(Seq.empty) ++ rows.map((_, false))
          val (maturePairs, immature) = buf.partition(p => tsMs(p._1) <= wm)
          val sortedPairs = maturePairs.sortBy(p => tsMs(p._1)).toIndexedSeq
          val sorted = sortedPairs.map(_._1)
          // The final step of a match could bind more events iff it is a
          // greedy loop below its cap or an optional left unbound.
          def couldExtendLast(m: Nfa.Match[T]): Boolean = lastStep.quantifier match {
            case Nfa.Quantifier.OneOrMore => true
            case Nfa.Quantifier.Times(_, mx) => // bound fewer than max: still open
              m.bindings.find(_._1 == lastStep.name).map(_._2.size).getOrElse(0) < mx
            case Nfa.Quantifier.Optional => !m.bindings.exists(_._1 == lastStep.name)
            case _ => false
          }
          // Could an event at ts > wm still fall inside `within` of the
          // match's first event?
          def withinOpen(m: Nfa.Match[T]): Boolean =
            pattern.withinMicros.forall { w =>
              val firstMicros = tsMs(m.bindings.head._2.head) * 1000L
              wm * 1000L - firstMicros < w
            }
          if (overlap) {
            // NoSkip / SkipToNext / SkipToFirst / SkipToLast: matches may
            // overlap, so consumed events stay in state; the done flags +
            // prefix eviction bound it. A match is provisional (withheld)
            // while it reaches the data horizon with an open final step,
            // or contains a relaxed-inner loop (extendable anywhere)
            // inside an open `within` window.
            val provisional = (m: Nfa.Match[T], lastIdx: Int) =>
              ((lastIdx == sorted.length - 1 && couldExtendLast(m)) ||
                relaxedLoopAnywhere) && withinOpen(m)
            val res = Nfa.runIncrementalOverlap[T](sorted, sortedPairs.map(_._2),
              t => tsMs(t) * 1000L, pattern, wm * 1000L, provisional)
            // Future matches start at open (un-done) events only, and
            // consume events at-or-after their start: the fully-done
            // prefix can never be touched again — evict exactly it.
            val firstOpen = res.done.indexOf(false) match {
              case -1 => sorted.length
              case k  => k
            }
            val keep = (firstOpen until sorted.length)
              .map(ix => (sorted(ix), res.done(ix))) ++ immature
            if (keep.nonEmpty) {
              state.update(keep)
              state.setTimeoutTimestamp(wm + 1)
            } else if (state.exists) state.remove()
            (res.matches.map((false, _)) ++ res.timeouts.map((true, _))).iterator
          } else {
            val (indexed, touts) = Nfa.runIndexedWithTimeouts[T](
              sorted, t => tsMs(t) * 1000L, pattern, Some(wm * 1000L))
            // The last match is provisional iff it consumed up to the last
            // mature event, its final step could bind more (greedy loop, or
            // optional still unbound), and a future event (ts > wm) could
            // still fall inside `within` of the match's first event.
            // Strict inner loops close at the first non-matching mature
            // event, so only a match reaching the last mature event is
            // provisional; relaxed inner loops ignore non-matching events,
            // so the final match stays provisional wherever it ends.
            val emitted = indexed.lastOption match {
              case Some((m, lastIdx))
                  if (lastIdx == sorted.length - 1 || trailingRelaxedLoop) &&
                    couldExtendLast(m) && withinOpen(m) =>
                indexed.init
              case _ => indexed
            }
            val matches = emitted.map(_._1)
            // Drop consumed events; keep unmatched ones (and any withheld
            // match's events) still inside the `within` horizon.
            val consumed = matches.flatMap(_.bindings.flatMap(_._2)).toSet
            val horizon = pattern.withinMicros.map(wm - _ / 1000L).getOrElse(Long.MinValue)
            val keep = sorted.filterNot(consumed.contains)
              .filter(t => tsMs(t) > horizon).map((_, false)) ++ immature
            if (keep.nonEmpty) {
              state.update(keep)
              state.setTimeoutTimestamp(wm + 1)
            } else if (state.exists) state.remove()
            (matches.map((false, _)) ++ touts.map((true, _))).iterator
          }
      }
  }

  /** Streaming MinHash-LSH near-duplicate detection — the online form
    * of the td03 batch pipeline, for dedup-at-ingestion: each arriving
    * document (id, distinct shingle hashes) lands in its LSH band
    * buckets; bucket state holds the documents seen there, and every
    * newcomer is exact-Jaccard-verified against exactly its bucket
    * peers — never the whole corpus. Pairs above `threshold` emit as
    * (id_a, id_b, jaccard) with id_a < id_b; a pair colliding in
    * several bands emits once (streaming dropDuplicates downstream).
    *
    * The banding math is bit-identical to the batch path
    * (TextOps.minhashSignatureIdx/lshBands): permutation i =
    * xxhash64(sh, i), band hash = xxhash64 over the band's signature
    * slice — both reproduced here via catalyst's XXH64 — so stream and
    * batch generate the SAME candidate set, and the exact-Jaccard
    * verify makes the results identical (miss probability at 64 perms
    * × 2 rows/band is < 1e-14 above threshold 0.8).
    *
    * State per (band, bucket) key = the bucket's (id, shingles) list;
    * `stateTtlMs` mirrors `table.exec.state.ttl` — an idle bucket
    * evicts wholesale, so an unbounded stream can't grow state forever
    * (a later duplicate of an evicted doc is then unseen, the standard
    * TTL trade-off).
    */
  def streamingNearDupPairs(docs: Dataset[(Long, Seq[Long])],
                            threshold: Double,
                            numPerms: Int = 64, rowsPerBand: Int = 2,
                            stateTtlMs: Option[Long] = None): Dataset[(Long, Long, Double)] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    require(numPerms % rowsPerBand == 0, "numPerms must divide into bands")
    val numBands = numPerms / rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    implicit val st: Encoder[Seq[(Long, Seq[Long])]] =
      ExpressionEncoder[Seq[(Long, Seq[Long])]]()

    def signature(shingles: Seq[Long]): Array[Long] = {
      val sig = Array.fill(numPerms)(Long.MaxValue)
      shingles.foreach { sh =>
        val base = XXH64.hashLong(sh, 42L)
        var i = 0
        while (i < numPerms) {
          val h = XXH64.hashInt(i, base) // = batch xxhash64(sh, lit(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      sig
    }

    docs.filter(_._2.nonEmpty)
      .flatMap { case (id, shingles) =>
        val sig = signature(shingles)
        (0 until numBands).map { b =>
          var bh = 42L // batch lshBands: xxhash64 over the band's slice
          (b * rowsPerBand until (b + 1) * rowsPerBand)
            .foreach(i => bh = XXH64.hashLong(sig(i), bh))
          ((b, bh), id, shingles)
        }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, ttlTimeout(stateTtlMs)) {
        (_: (Int, Long), rows: Iterator[((Int, Long), Long, Seq[Long])],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var bucket = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[(Long, Long, Double)]
            rows.foreach { case (_, id, shingles) =>
              if (!bucket.exists(_._1 == id)) {
                val s = shingles.toSet
                bucket.foreach { case (oid, osh) =>
                  val os = osh.toSet
                  val inter = s.count(os)
                  val j = inter.toDouble / (s.size + os.size - inter)
                  if (j >= threshold) {
                    val r = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                      .toDouble
                    out += ((math.min(id, oid), math.max(id, oid), r))
                  }
                }
                bucket :+= ((id, shingles))
              }
            }
            state.update(bucket)
            stateTtlMs.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
      .dropDuplicates("_1", "_2")
  }
}
