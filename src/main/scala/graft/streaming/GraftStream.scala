package graft.streaming

import graft.cep.Nfa
import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Thin typed veneer matching the reference's DataStream/KeyedStream
  * surface (SURVEY §2.12: DataStream.map/flatMap/filter/process/union/
  * connect/keyBy/rebalance/global/partitionCustom/coGroup;
  * KeyedStream.reduce/sum/minBy/maxBy/process) over Dataset[T]. Interval
  * joins live in StatefulOps/the range-predicate join (§2.3). Works
  * identically on batch and streaming Datasets — the reference's
  * batch/stream unification falls out of Spark's shared Dataset API.
  * Each method is a direct delegation: the veneer adds API familiarity,
  * never a second execution path.
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
  /** DataStream.shuffle — random redistribution; Spark's round-robin
    * repartition is the deterministic-per-task equivalent.
    */
  def shuffle(n: Int): GraftStream[T] = new GraftStream(ds.repartition(n))
  /** DataStream.rescale — local redistribution without a full shuffle
    * (Spark's coalesce merges partitions within their executors).
    * REDUCE-ONLY deviation: the reference's rescale also fans OUT, but
    * Spark's shuffle-free coalesce can only merge — a target above the
    * current partition count is a no-op. Use rebalance(n) to grow.
    */
  def rescale(n: Int): GraftStream[T] = new GraftStream(ds.coalesce(n))
  /** DataStream.project — positional projection generalized to a typed map. */
  def project[U: Encoder](f: T => U): GraftStream[U] = map(f)
  /** DataStream.broadcast — replicate this (small) stream to every
    * downstream consumer: marks the frame with Spark's broadcast hint,
    * which any subsequent join against it honors.
    */
  def broadcast(): GraftStream[T] = new GraftStream(ds.hint("broadcast"))
  /** DataStream.assignTimestampsAndWatermarks (bounded out-of-orderness
    * strategy) — Spark's per-query watermark on the event-time column.
    */
  def assignTimestampsAndWatermarks(tsCol: String, delay: String): GraftStream[T] =
    new GraftStream(ds.withWatermark(tsCol, delay))
  /** DataStream.global — everything to one partition (use sparingly). */
  def global(): GraftStream[T] = new GraftStream(ds.coalesce(1))
  /** DataSet.cross — typed cartesian product (CrossOperator). */
  def cross[U](other: GraftStream[U])(
      implicit e: Encoder[(T, U)]): GraftStream[(T, U)] =
    new GraftStream(ds.joinWith(other.ds,
      org.apache.spark.sql.functions.lit(true), "cross"))
  /** DataSet.distinct (DistinctOperator). */
  def distinct(): GraftStream[T] = new GraftStream(ds.distinct())
  /** DataSet.sortPartition (SortPartitionOperator) — order within each
    * partition, no shuffle.
    */
  def sortPartition(column: String, columns: String*): GraftStream[T] =
    new GraftStream(ds.sortWithinPartitions(column, columns: _*))
  /** DataSet.first(n) — any n elements (here: the first n in dataset order). */
  def first(n: Int): GraftStream[T] = new GraftStream(ds.limit(n))
  /** DataStream.partitionCustom — co-locate rows by a key function. */
  def partitionCustom[K: Encoder](n: Int, f: T => K)(
      implicit e: Encoder[T]): GraftStream[T] = {
    import org.apache.spark.sql.functions.col
    val tagged = ds.map(t => (f(t), t))(
      org.apache.spark.sql.Encoders.tuple(implicitly[Encoder[K]], implicitly[Encoder[T]]))
    new GraftStream(tagged.repartition(n, col("_1")).map(_._2))
  }
  /** DataStream.connect: two differently-typed streams processed by one
    * downstream function — the reference's CoProcess modeled as a tagged
    * union (SURVEY §2.10 connected-streams mapping). Encoded as an
    * Option pair rather than Either: Spark's encoder framework can
    * reconstruct concrete products only, not the abstract Either.
    */
  def connect[U](other: GraftStream[U])(
      implicit e: Encoder[(Option[T], Option[U])]): GraftStream[(Option[T], Option[U])] =
    new GraftStream(
      ds.map(t => (Option(t), Option.empty[U]))
        .union(other.ds.map(u => (Option.empty[T], Option(u)))))
  /** DataStream.coGroup: per-key grouped pairing of two streams. */
  def coGroup[U, K: Encoder, R: Encoder](other: GraftStream[U])(
      thisKey: T => K, otherKey: U => K)(
      f: (K, Iterator[T], Iterator[U]) => IterableOnce[R]): Dataset[R] =
    ds.groupByKey(thisKey).cogroup(other.ds.groupByKey(otherKey))(f)
}

/** KeyedStream surface: reduce / aggregates / keyed process functions. */
class KeyedGraftStream[K, T](val kv: KeyValueGroupedDataset[K, T]) {
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups(f)

  /** KeyedStream.minBy/maxBy/sum-style field aggregates as typed
    * reductions (lt = "less than" comparator; num = numeric projection).
    * Reductions get map-side partial aggregation; on ties minBy/maxBy
    * keep an arbitrary element (Flink keeps the first-arrived — arrival
    * order is not defined for a distributed batch group).
    */
  def minBy(lt: (T, T) => Boolean)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups((a: T, b: T) => if (lt(a, b)) a else b)
  def maxBy(lt: (T, T) => Boolean)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups((a: T, b: T) => if (lt(a, b)) b else a)
  def sum(num: T => Double)(implicit e: Encoder[(K, Double)]): Dataset[(K, Double)] = {
    implicit val d: Encoder[Double] =
      org.apache.spark.sql.Encoders.scalaDouble
    kv.mapValues(num).reduceGroups(_ + _)
  }

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
