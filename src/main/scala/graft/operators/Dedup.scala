package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deduplication keep-first / keep-last by key in event-time order —
  * semantics of the reference's deduplicate operators
  * (flink-table-runtime .../deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java:32,
  * RowTimeDeduplicateFunction.java; planner StreamExecDeduplicate).
  *
  * Batch: a single `row_number` window — one shuffle on the dedup key,
  * no driver state, AQE handles skewed keys. The streaming keep-last
  * variant lives in graft.streaming (flatMapGroupsWithState upserts).
  */
object Dedup {

  /** Keep the first row per key ordered by `order` (ascending). */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order)

  /** Keep the last row per key ordered by `order` (ascending). */
  def keepLast(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame =
    pick(df, keys, order.map(_.desc))

  private def pick(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact duplicate removal by content hash of the given columns —
    * the hash-groupBy exact-dedup path for large corpora: shuffles on a
    * 128-bit content hash, keeps the min-key representative per group.
    * Returns (representative key, group size).
    */
  def exactByContent(df: DataFrame, idCol: Column, contentCols: Seq[Column]): DataFrame =
    df.groupBy(md5(concat_ws("", contentCols: _*)).as("content_hash"))
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_dups"))
}
