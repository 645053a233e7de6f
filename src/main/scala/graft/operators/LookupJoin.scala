package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.collection.mutable

/** Lookup join: probe an external keyed service per row — semantics of
  * the reference's lookup join (CommonExecLookupJoin.java:138,
  * LookupJoinRunner.java:104) with its LRU cache
  * (lookup cache in flink-table-runtime .../join/lookup/).
  *
  * The connector function runs inside mapPartitions: one "connection"
  * and one cache per partition, no driver involvement — the pattern
  * scales to any number of executors, and hot keys amortize through the
  * per-partition LRU exactly like the reference's cache. For small
  * dimension tables prefer an ordinary broadcast join (Relational q02);
  * this operator exists for genuinely external/unbounded lookup sources.
  */
object LookupJoin {

  /** Left lookup join. `connect` is invoked once per partition (think:
    * open a connection/client); the returned function is the per-key
    * probe. Results are cached per partition with LRU eviction.
    */
  def lookup[T, K, V](ds: Dataset[T], keyFn: T => K,
                      connect: () => K => Option[V],
                      cacheSize: Int = 10000)
                     (implicit e: Encoder[(T, Option[V])]): Dataset[(T, Option[V])] =
    ds.mapPartitions { it =>
      val probe = connect()
      val cache = new mutable.LinkedHashMap[K, Option[V]]
      it.map { t =>
        val k = keyFn(t)
        val v = cache.get(k) match {
          case Some(hit) =>
            // refresh LRU position
            cache.remove(k); cache.put(k, hit); hit
          case None =>
            val miss = probe(k)
            if (cache.size >= cacheSize) cache.remove(cache.head._1)
            cache.put(k, miss)
            miss
        }
        (t, v)
      }
    }
}
