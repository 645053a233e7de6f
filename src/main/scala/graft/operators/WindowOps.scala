package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time window assigners with the semantics of the reference's window
  * operators (tumble/hop: flink-table-runtime .../window/slicing/SliceAssigners.java:133/191;
  * cumulate: SliceAssigners.java:280; session:
  * flink-streaming-java .../api/windowing/assigners/EventTimeSessionWindows.java;
  * count windows: CountTumblingWindowAssigner.java).
  *
  * Tumble/hop/session delegate to Spark's `window()` / `session_window()`
  * built-ins (identical epoch-aligned assignment); CUMULATE and count
  * windows have no Spark built-in and are implemented as declarative
  * plans (explode over the cumulate steps / ranked partitions) so they
  * stay inside whole-stage codegen and scale without driver state.
  * All functions work on both batch and streaming DataFrames.
  */
object WindowOps {

  /** Tumbling window column, epoch-aligned: struct(start, end). */
  def tumble(ts: Column, size: String): Column = window(ts, size)

  /** Tumbling window with an alignment offset (Flink
    * TumblingEventTimeWindows.of(size, offset) — window boundaries are
    * shifted by `offset` from the epoch alignment).
    */
  def tumble(ts: Column, size: String, offset: String): Column =
    window(ts, size, size, offset)

  /** Hopping (sliding) window column: struct(start, end). */
  def hop(ts: Column, size: String, slide: String): Column = window(ts, size, slide)

  /** Session window column with a fixed inactivity gap. */
  def session(ts: Column, gap: String): Column = session_window(ts, gap)

  /** Session window with a per-row DYNAMIC gap (Flink
    * SessionWindowTimeGapExtractor / EventTimeSessionWindows
    * .withDynamicGap): `gap` is an interval-string expression evaluated
    * per element; overlapping per-row sessions merge.
    */
  def sessionDynamic(ts: Column, gap: Column): Column = session_window(ts, gap)

  /** CUMULATE windows (Flink window TVF): windows share an epoch-aligned
    * `maxSize` base; each row lands in every step-expanded window
    * [base, base + k*step) that contains it, k = 1..maxSize/step.
    * Emits the input with `win_start`/`win_end` (epoch seconds, BIGINT).
    */
  def cumulate(df: DataFrame, ts: Column, stepSec: Long, maxSizeSec: Long): DataFrame = {
    require(maxSizeSec % stepSec == 0, "maxSize must be a multiple of step")
    val steps = (maxSizeSec / stepSec).toInt
    val base = (floor(unix_micros(ts) / lit(maxSizeSec * 1000000L)) * maxSizeSec).as("win_start")
    df.withColumn("win_start", base)
      .withColumn("__k", explode(sequence(lit(1), lit(steps))))
      .withColumn("win_end", col("win_start") + col("__k") * stepSec)
      .filter(unix_micros(ts) < col("win_end") * 1000000L)
      .drop("__k")
  }

  /** Count-tumbling windows per key: consecutive chunks of `size` rows in
    * (orderBy) order get window ids 0,1,2,... Adds `win_id`.
    */
  def countTumble(df: DataFrame, partitionBy: Seq[Column], orderBy: Seq[Column], size: Int): DataFrame = {
    val w = Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    df.withColumn("win_id", ((row_number().over(w) - 1) / size).cast("long"))
  }
}
