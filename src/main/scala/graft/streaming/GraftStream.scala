package graft.streaming

import graft.cep.Nfa
import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Thin typed veneer matching the reference's DataStream/KeyedStream
  * surface (SURVEY §2.12: DataStream.map/flatMap/filter/process/union/
  * keyBy; KeyedStream.reduce/process) over Dataset[T]. Works identically
  * on batch and streaming Datasets — the reference's batch/stream
  * unification falls out of Spark's shared Dataset API.
  */
class GraftStream[T](val ds: Dataset[T]) {
  def map[U: Encoder](f: T => U): GraftStream[U] = new GraftStream(ds.map(f))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GraftStream[U] =
    new GraftStream(ds.flatMap(f))
  def filter(p: T => Boolean): GraftStream[T] = new GraftStream(ds.filter(p))
  /** DataStream.process (per-partition imperative escape hatch). */
  def process[U: Encoder](f: Iterator[T] => Iterator[U]): GraftStream[U] =
    new GraftStream(ds.mapPartitions(f))
  def union(other: GraftStream[T]): GraftStream[T] =
    new GraftStream(ds.union(other.ds))
  def keyBy[K: Encoder](f: T => K): KeyedGraftStream[K, T] =
    new KeyedGraftStream(ds.groupByKey(f))
  def rebalance(n: Int): GraftStream[T] = new GraftStream(ds.repartition(n))
}

/** KeyedStream surface: reduce / aggregates / keyed process functions. */
class KeyedGraftStream[K, T](val kv: KeyValueGroupedDataset[K, T]) {
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups(f)

  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Dataset[U] =
    kv.mapGroups(f)

  def flatMapGroups[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    kv.flatMapGroups(f)

  /** KeyedProcessFunction analogue: keyed state + (optional) event-time
    * timers via GroupState.
    */
  def processWithState[S: Encoder, U: Encoder](
      outputMode: OutputMode, timeout: GroupStateTimeout)(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Dataset[U] =
    kv.flatMapGroupsWithState(outputMode, timeout)(f)
}

object GraftStream {
  def apply[T](ds: Dataset[T]): GraftStream[T] = new GraftStream(ds)
}
