package graft

import java.nio.file.Files

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The engine's materialization barrier knob: local blocks by default,
  * reliable checkpoint-dir files under
  * `spark.graft.checkpoint.reliable=true` (the executor-loss-safe path
  * for real clusters — see Checkpoints' scaladoc and SCALE.md).
  */
class CheckpointsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private def edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")

  private def components(): Map[Long, Long] =
    Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap

  test("reliable barrier writes checkpoint files and preserves results") {
    val local = components() // default (localCheckpoint) path
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    spark.conf.set(Checkpoints.ReliableKey, "true")
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val reliable = components()
      assert(reliable == local)
      assert(reliable == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
      // the loop's barriers must have landed in the reliable dir
      // (getCheckpointDir reports a file: URI — walk the raw path)
      val files = Files.walk(java.nio.file.Paths.get(dir))
        .filter(Files.isRegularFile(_)).count()
      assert(files > 0, "reliable barrier wrote no checkpoint files")
    } finally {
      spark.conf.set(Checkpoints.ReliableKey, "false")
      spark.conf.unset(Checkpoints.DirKey)
    }
  }

  test("reliable barrier without a directory fails loudly") {
    val fresh = spark // same session; simulate unset dir via a clear error
    // Only meaningful when no checkpoint dir has been set yet on the
    // context; once another test set it, the barrier legitimately
    // reuses it — so assert the message only on a virgin context.
    if (fresh.sparkContext.getCheckpointDir.isEmpty) {
      fresh.conf.set(Checkpoints.ReliableKey, "true")
      try {
        val e = intercept[IllegalStateException] {
          Checkpoints.barrier(Seq(1).toDF("x"))
        }
        assert(e.getMessage.contains(Checkpoints.DirKey))
      } finally fresh.conf.set(Checkpoints.ReliableKey, "false")
    }
  }
}
