package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-time as-of (temporal) join: for each left row, the latest right
  * row of the same key with right.time <= left.time — the batch analogue
  * of the reference's versioned-table join
  * (flink-table-runtime .../join/temporal/TemporalRowTimeJoinOperator.java:78,
  * planner StreamExecTemporalJoin.java:67).
  *
  * Implementation is the scalable union-and-carry pattern: tag both
  * inputs, union, and carry the last non-null right payload forward with
  * one `last(ignoreNulls)` running window — a single shuffle + sort per
  * key, no point lookups, no driver state. This keeps the whole plan in
  * Catalyst (WindowExec) and scales linearly with input size; hot keys
  * are the only skew concern (same as any keyed join).
  */
object AsOfJoin {

  /** Left as-of join. `right` must be unique per (key, time) — pre-dedup
    * with Dedup.keepLast otherwise. The matched right payload columns are
    * appended under struct column `asof` (null when no right row at or
    * before the left row's time).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: Seq[String]): DataFrame = {
    val r = right.select(
      col(key).as("__k"),
      col(rightTime).as("__t"),
      struct(payload.map(col): _*).as("__p"))
      .withColumn("__side", lit(0))
    val l = left
      .withColumn("__k", col(key))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
    // Right rows (__side=0) sort before left rows at equal time, so a
    // right row with time == left time matches (inclusive as-of).
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__k", "__t", "__p", "__side")
  }
}
