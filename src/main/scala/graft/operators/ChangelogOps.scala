package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Changelog (RowKind) handling — SURVEY.md §1.1/§2.2: the reference's
  * +I/-U/+U/-D row kinds are modeled as an ordinary `__rowkind` column.
  *
  *  - normalize: collapse an upsert/changelog stream to current table
  *    state by primary key (StreamExecChangelogNormalize semantics —
  *    keep the latest version per key, drop keys whose latest is -D).
  *  - dropUpdateBefore: remove -U rows when downstream doesn't need
  *    retractions (StreamExecDropUpdateBefore).
  *
  * Batch forms here (window/filter, one shuffle on the key); the
  * streaming keep-last variant is graft.streaming.StatefulOps
  * .keepLastDedup which emits the same vocabulary.
  */
object ChangelogOps {

  def normalize(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                kindCol: Column): DataFrame =
    Dedup.keepLast(df, keys, order).filter(kindCol =!= "-D")

  def dropUpdateBefore(df: DataFrame, kindCol: Column): DataFrame =
    df.filter(kindCol =!= "-U")
}
