package graft

import org.apache.spark.sql.DataFrame

/** The engine's materialization barrier, behind a session knob.
  *
  * Driver-loop operators (connected components, Pregel, k-means, BPE)
  * and fan-out DAGs (curation pipeline, LSH index reuse) need a point
  * where a frame is computed ONCE and lineage is truncated. Locally
  * that is `localCheckpoint()` — fast, no configuration — but local
  * checkpoints pin blocks to the executors that computed them and are
  * NOT fault-tolerant: on a real cluster, losing one executor mid-job
  * kills the whole run because the truncated lineage cannot recompute
  * the lost blocks. (Upstream Spark documents exactly this trade-off
  * on `RDD.localCheckpoint`.)
  *
  * [[barrier]] keeps the local default and adds the cluster-safe path:
  * set `spark.graft.checkpoint.reliable=true` (plus a checkpoint
  * directory — either `spark.sparkContext.setCheckpointDir` or the
  * `spark.graft.checkpoint.dir` conf) and every engine barrier routes
  * through reliable `checkpoint()`, which writes the materialized
  * blocks to the (HDFS/object-store) checkpoint dir so any executor
  * can re-read them after a loss. Both paths are eager, so probe jobs
  * and loop pacing behave identically; results are bit-identical
  * either way (same plan, different storage). Reliable checkpoint
  * files outlive the job unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` — at the
  * 100 TB design point point the checkpoint dir to a TTL'd scratch
  * prefix (see SCALE.md).
  *
  * Reference behavior: the reference's runtime persists operator
  * state/intermediates through its fault-tolerant checkpoint storage
  * (flink-runtime checkpointing — e.g.
  * flink-runtime/src/main/java/org/apache/flink/runtime/state/filesystem/FsCheckpointStorageAccess.java),
  * never through executor-pinned local blocks; this knob is the batch
  * engine's equivalent of that durability contract.
  */
object Checkpoints {

  /** Session conf: route engine barriers through reliable checkpoint. */
  val ReliableKey = "spark.graft.checkpoint.reliable"

  /** Session conf: checkpoint directory, applied lazily to the
    * SparkContext on first reliable barrier if none is set yet.
    */
  val DirKey = "spark.graft.checkpoint.dir"

  /** Materialize `df` eagerly and truncate its lineage — local blocks
    * by default, reliable checkpoint-dir files when
    * [[ReliableKey]]=true.
    */
  def barrier(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableKey, "false").toBoolean) {
      if (spark.sparkContext.getCheckpointDir.isEmpty) {
        val dir = spark.conf.getOption(DirKey).getOrElse(throw
          new IllegalStateException(
            s"$ReliableKey=true needs a checkpoint directory: call " +
              s"sparkContext.setCheckpointDir or set $DirKey"))
        spark.sparkContext.setCheckpointDir(dir)
      }
      df.checkpoint()
    } else df.localCheckpoint()
  }

  /** Barrier for driver loops that re-materialize one evolving frame
    * per round (BPE re-segmentation, and any future loop of that
    * shape): materialize `df`, then release the PREVIOUS round's
    * barrier blocks so the loop holds one copy of the frame instead
    * of accumulating k copies over k rounds (executor storage is the
    * bound that matters — the frame itself is small by design, but
    * "small × 30k rounds" is not). `prevIds` is the persistent-RDD id
    * set returned by the prior call; pass Set.empty on the first.
    * On the reliable-checkpoint path nothing is pinned in block
    * storage, so the release is a no-op and checkpoint files are left
    * to the TTL'd dir (see SCALE.md). Driver-loop use only: the id
    * diff assumes the loop is the session's only concurrent
    * persister — a stray concurrent id landing in the diff costs that
    * frame a recompute after release, never correctness.
    */
  def rollingBarrier(df: DataFrame, prevIds: Set[Int]): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = barrier(df)
    val mine = sc.getPersistentRDDs.keySet.toSet -- before
    prevIds.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    (out, mine)
  }

  /** `.barrier()` postfix syntax for the operator code. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def barrier(): DataFrame = Checkpoints.barrier(df)
  }
}
