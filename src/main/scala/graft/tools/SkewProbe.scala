package graft.tools

import graft.GraftSession
import graft.operators.SkewJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew evidence for the dedup/ANN hot-key joins (SCALE.md): builds a
  * shingle/bucket index where ONE key holds 10% of the corpus — the
  * adversarial shape for td03's (band,bucket) candidate join and
  * te03's SRP bucket probe join — and measures the join under three
  * regimes: plain with AQE skew-join ON (the engine default), plain
  * with AQE skew handling OFF (what a streaming micro-batch join
  * gets), and [[SkewJoin.saltedInner]]. Asserts all three produce the
  * same pair count, prints wall seconds plus the max single-partition
  * row share of the join output (the straggler signal).
  *
  * Usage: runMain graft.tools.SkewProbe [nDocs] [saltFactor]
  */
object SkewProbe {

  /** (sh, id) index: ~20 distinct hash shingles per doc, plus shingle
    * 0 in EVERY 10th doc — key 0 holds 10% of the docs.
    */
  def skewedIndex(s: SparkSession, n: Long): DataFrame =
    s.read.format("graft-datagen").schema("id bigint")
      .option("numRows", n.toString)
      .option("partitions", s.sparkContext.defaultParallelism.toString)
      .load()
      .select(col("id"), explode(concat(
        transform(sequence(lit(1), lit(20)),
          j => abs(hash(col("id") * 1009 + j)).cast("long") + 1),
        when(col("id") % 10 === 0, array(lit(0L)))
          .otherwise(array().cast("array<long>")))).as("sh"))

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 50000L
    val saltFactor = if (args.length > 1) args(1).toInt else 32
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt)
      // Partition-share numbers must reflect the join's shuffle
      // distribution, not AQE's post-hoc coalescing of small outputs.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val idx = skewedIndex(spark, n).localCheckpoint()
    val a = idx.select(col("sh"), col("id").as("id_a"))
    val b = idx.select(col("sh"), col("id").as("id_b"))
    // A fixed 100-query probe batch against the corpus index — the
    // te03 serving shape (batch held constant as the corpus grows).
    val q = idx.where(col("id") % (n / 100) === 0)
      .select(col("sh"), col("id").as("query_id"))

    def measure(label: String, df: => DataFrame): Long = {
      val t0 = System.nanoTime()
      val frame = df
      val out = frame.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // Straggler signal: the largest share of join-output rows that
      // lands in one shuffle partition (1.0 = the hot key's whole
      // output on a single task).
      val parts = frame.groupBy(spark_partition_id().as("p")).count()
        .agg(max(col("count")).as("mx")).collect()(0).getLong(0)
      println(f"| $label | $out%d | ${parts.toDouble / out}%.3f | $dt%.1f |")
      out
    }

    println(s"n=$n hot-key share=10% saltFactor=$saltFactor")
    println("| arm | pairs | max partition share | sec |")
    println("|---|---|---|---|")
    val base = measure("td03 self-join, AQE skew ON",
      a.join(b, Seq("sh")).where(col("id_a") < col("id_b")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    val noaqe = measure("td03 self-join, AQE skew OFF",
      a.join(b, Seq("sh")).where(col("id_a") < col("id_b")))
    val salted = measure("td03 self-join, full-salted",
      SkewJoin.saltedInner(a, b, "sh", col("id_a"), saltFactor)
        .where(col("id_a") < col("id_b")))
    val hotSalted = measure("td03 self-join, hot-salted",
      SkewJoin.saltedInnerHot(a, b, "sh", col("id_a"), saltFactor,
          hotThreshold = 100L)
        .where(col("id_a") < col("id_b")))
    val qbase = measure("te03 probe-join, AQE skew OFF",
      q.join(b, Seq("sh")).where(col("query_id") =!= col("id_b")))
    val qsalted = measure("te03 probe-join, hot-salted",
      SkewJoin.saltedInnerHot(q, b, "sh", col("query_id"), saltFactor,
          hotThreshold = 100L)
        .where(col("query_id") =!= col("id_b")))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    require(base == noaqe && base == salted && base == hotSalted,
      s"salting changed the result: $base / $noaqe / $salted / $hotSalted")
    require(qbase == qsalted,
      s"salting changed the probe result: $qbase vs $qsalted")
    spark.stop()
  }
}
