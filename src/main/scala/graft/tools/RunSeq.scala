package graft.tools

import graft.{GraftSession, SparkEntry}
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Debug helper: run a comma-separated list of SparkEntry queries (or
  * "all") sequentially in ONE JVM, printing per-query time plus JIT
  * code-cache and heap occupancy — for diagnosing cross-query
  * degradation inside a long-lived Bench-like session.
  * Usage: runMain graft.tools.RunSeq <q1,q2,...|all> [sfDir] [repeat]
  */
object RunSeq {
  private def poolLine(): String = {
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    val code = pools.filter(_.getName.startsWith("CodeHeap"))
      .map(p => f"${p.getName.stripPrefix("CodeHeap '").stripSuffix("'")}=${p.getUsage.getUsed / 1024 / 1024}%dM")
      .mkString(" ")
    val meta = pools.find(_.getName == "Metaspace")
      .map(p => s"meta=${p.getUsage.getUsed / 1024 / 1024}M").getOrElse("")
    val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
    s"$code $meta heap=${heap.getUsed / 1024 / 1024}M"
  }

  def main(args: Array[String]): Unit = {
    val names =
      if (args(0) == "all") SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    for (r <- 1 to repeat; name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val tPlan = System.nanoTime()
      df.queryExecution.executedPlan // force analysis + optimization + physical planning
      val tExec = System.nanoTime()
      val n = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[runseq] r$r $name%-28s $dt%8.2f s (plan=${(tExec - tPlan) / 1e9}%.2f) rows=$n%-8d ${poolLine()}")
    }
    spark.stop()
  }
}
