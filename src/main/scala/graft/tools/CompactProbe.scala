package graft.tools

import java.nio.file.{Files, Paths}

import graft.GraftSession
import graft.streaming.CdcStream
import org.apache.spark.sql.functions._

/** Measures the read amplification CdcStream.compact exists to bound:
  * the same keyed update history (nKeys live keys, 8 versions each,
  * 10% tombstoned) is landed as 8 / 64 / 256 epoch deltas, the
  * merge-on-read `readState` aggregate is timed against each layout,
  * then the table is compacted and re-timed. The pre/post ratio is the
  * number SCALE.md publishes — many tiny deltas tax the reader with
  * file listing, scan tasks, and a wider shuffle even though the
  * logical row count is identical.
  *
  * Usage: runMain graft.tools.CompactProbe <nKeys> [deltaCounts]
  *   e.g. runMain graft.tools.CompactProbe 200000 8,64,256
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = if (args.nonEmpty) args(0).toLong else 200000L
    val tiers = (if (args.length > 1) args(1) else "8,64,256")
      .split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val versionsPerKey = 8

    // (key, version, kind, payload): version v of key k lands in delta
    // (k*8+v) % nDeltas — every delta holds a slice of every key range,
    // the steady-state shape of a keyed upsert stream. Last version of
    // every 10th key is a tombstone.
    val history = spark.range(nKeys * versionsPerKey)
      .select((col("id") / versionsPerKey).cast("long").as("k"),
        pmod(col("id"), lit(versionsPerKey)).cast("long").as("__version"))
      .withColumn("__rowkind",
        when(col("k") % 10 === 0 && col("__version") === versionsPerKey - 1,
          "-D").when(col("__version") === 0, "+I").otherwise("+U"))
      .withColumn("v", concat(lit("p"), col("k") * 100 + col("__version")))
      .localCheckpoint()

    def timeRead(path: String): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = CdcStream.readState(spark, path, Seq("k"), "__version").count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    println("| deltas | rows live | read s (merge-on-read) | read s (compacted) |")
    println("|---|---|---|---|")
    for (nd <- tiers) {
      val base = Files.createTempDirectory(s"graft-compact-$nd").toString
      history.withColumn("__d",
          pmod(col("k") * versionsPerKey + col("__version"), lit(nd)))
        .repartition(col("__d"))
        .write.partitionBy("__d").parquet(s"$base/staged")
      // rename staged __d partitions into upsertSink-shaped delta dirs
      val staged = Paths.get(base, "staged")
      Files.list(staged).forEach { p =>
        val name = p.getFileName.toString
        if (name.startsWith("__d=")) {
          val epoch = name.substring(4).toLong
          Files.move(p, Paths.get(base, f"delta=$epoch%020d"))
        }
      }
      val (tPre, live) = timeRead(base)
      CdcStream.compact(spark, base, Seq("k"), "__version")
      val (tPost, live2) = timeRead(base)
      require(live == live2, s"compaction changed state: $live vs $live2")
      println(f"| $nd | $live%d | $tPre%.2f | $tPost%.2f |")
    }
    spark.stop()
  }
}
