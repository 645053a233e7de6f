package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-less range joins at scale.
  *
  * Spark plans `points.join(intervals, pt BETWEEN lo AND hi)` — no
  * equality conjunct — as BroadcastNestedLoopJoin (or a cartesian
  * product when neither side fits), which is O(|L|·|R|) work however
  * many executors it spreads over. The reference's interval join keys
  * state by the join key (TimeIntervalJoin), but its SQL surface also
  * accepts key-less time predicates, which degenerate the same way.
  *
  * `pointInInterval` restores a shuffle-hash shape with BIN BUCKETING:
  * pick a bin width, replicate each interval to every bin it overlaps,
  * assign each point its single bin, and hash-join on the bin id with
  * the exact predicate as a residual filter. A (point, interval) pair
  * can meet in only the point's bin, so no dedup pass is needed. Cost
  * moves from |L|·|R| to |R|·(span/bin + 1) replication plus a standard
  * equi-join — the bin id is the shuffle key, so work distributes like
  * any hash join. Pick the bin width near the TYPICAL interval span:
  * much smaller multiplies replication, much larger multiplies
  * residual-filter work per bin.
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on lo <= pt <= hi (all three
    * numeric, e.g. epoch micros). Columns of both inputs pass through.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pt: Column, lo: Column, hi: Column,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = points.withColumn("__bin", floor(pt / binWidth).cast("long"))
    val rb = intervals.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast("long"),
        floor(hi / binWidth).cast("long"))))
    lb.join(rb, "__bin")
      .where(pt >= lo && pt <= hi)
      .drop("__bin")
  }
}
