package graft.tools

import graft.GraftSession
import graft.operators.{CurationOps, DriftOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The multi-epoch monitoring gates at PRODUCTION epoch counts (r15
  * verdict #3): the td61 drift gate's driver loop unioned one
  * sub-plan per epoch — bounded in the query (3 epochs) but the
  * regime it models accumulates an epoch per day, so this probe
  * measures the replacement (DriftOps.driftVsBaselineByEpoch, all
  * epochs in ONE grouped plan) at 3 and 100 epochs against the
  * legacy union-of-N-plans shape, plus td63's merged-histogram
  * threshold recalibration at 100 epochs. Inputs are the stores the
  * production gates actually read — the persisted KB-sized per-epoch
  * count/histogram frames — synthesized directly at their on-disk
  * shape (how they were produced doesn't change report cost). Usage:
  *   runMain graft.tools.EpochGateProbe [epochs]
  */
object EpochGateProbe {
  def main(args: Array[String]): Unit = {
    val maxEpochs = if (args.length > 0) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-epoch-probe-").toString

    // the td61 store shape: one (feature, bucket, n) frame per epoch,
    // partitioned by epoch — 30 rows each, counts varying per epoch
    val buckets = spark.range(10).select(col("id").cast("string").as("bucket"))
      .crossJoin(spark.range(3).select(
        element_at(array(lit("len"), lit("stop_ratio"), lit("lang")),
          (col("id") + 1).cast("int")).as("feature")))
    spark.range(maxEpochs).select(col("id").as("epoch"))
      .crossJoin(buckets)
      .withColumn("n", (pmod(hash(col("epoch") * 31
        + length(col("feature")) * 7
        + col("bucket").cast("long")), lit(1000)) + lit(1000)).cast("long"))
      .write.mode("overwrite").partitionBy("epoch").parquet(s"$tmp/fc")

    def fc = spark.read.parquet(s"$tmp/fc")
    def baseline = fc.where(col("epoch") === 0).drop("epoch")
    def live(e: Int) = fc.where(col("epoch") > 0 && col("epoch") <= e)
      .select(col("epoch").cast("int").as("epoch"), col("feature"),
        col("bucket"), col("n"))

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"| $name | $out%d | ${(System.nanoTime() - t0) / 1e9}%.2f |")
    }
    println("| probe | rows out | sec |")
    println("|---|---|---|")
    for (_ <- 1 to 2) {
      t("td61 grouped ONE-plan, 3 epochs") {
        DriftOps.driftVsBaselineByEpoch(live(3), baseline).count()
      }
      t(s"td61 grouped ONE-plan, $maxEpochs epochs") {
        DriftOps.driftVsBaselineByEpoch(live(maxEpochs), baseline).count()
      }
      t(s"td61 LEGACY union-of-N-plans, $maxEpochs epochs") {
        (1 until maxEpochs).map(e => DriftOps.driftVsBaseline(
            fc.where(col("epoch") === e).drop("epoch"), baseline)
            .withColumn("epoch", lit(e)))
          .reduce(_ unionByName _).count()
      }
    }

    // td63's calibration store: one domain-bounded score histogram
    // per epoch; the per-epoch recalibration merges ALL of them
    spark.range(maxEpochs).select(col("id").as("epoch"))
      .crossJoin(spark.range(800).select(
        (col("id") * 1237 % 1000001).as("s")))
      .withColumn("cnt", (pmod(hash(col("epoch") * 13 + col("s")),
        lit(50)) + lit(1)).cast("long"))
      .write.mode("overwrite").partitionBy("epoch").parquet(s"$tmp/qh")
    def qh = spark.read.parquet(s"$tmp/qh")
    for (_ <- 1 to 2)
      t(s"td63 merged-histogram threshold, $maxEpochs epochs") {
        CurationOps.histThreshold(
          qh.select(col("s"), col("cnt")), 300000L).count()
      }

    def legacyPlanChars(n: Int): Int =
      (1 until n).map(e => DriftOps.driftVsBaseline(
          fc.where(col("epoch") === e).drop("epoch"), baseline)
          .withColumn("epoch", lit(e)))
        .reduce(_ unionByName _).queryExecution.optimizedPlan.toString.length
    def groupedPlanChars(n: Int): Int =
      DriftOps.driftVsBaselineByEpoch(live(n), baseline)
        .queryExecution.optimizedPlan.toString.length
    println(s"[epoch-probe] optimized-plan size (chars): grouped " +
      s"${groupedPlanChars(maxEpochs)} vs legacy " +
      s"${legacyPlanChars(maxEpochs)} at $maxEpochs epochs")
  }
}
