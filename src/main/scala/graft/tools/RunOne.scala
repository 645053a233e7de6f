package graft.tools

import graft.{GraftSession, SparkEntry}

/** Debug helper: run a single SparkEntry query with formatted explain.
  * Usage: runMain graft.tools.RunOne <queryName> [sfDir] [explainOnly]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val explainOnly = args.length > 2 && args(2) == "explain"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dt = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        if (dt > 1.0)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} time=$dt%.1f s  ${si.name.take(70)}")
      }
    })
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    if (!explainOnly) {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[runone] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
