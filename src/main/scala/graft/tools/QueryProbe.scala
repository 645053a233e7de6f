package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Optimization-round instrumentation (guide §1): run named queries
  * once each on a warm session, timing the same `.count()` action the
  * bench times, while a listener counts the Spark jobs, stages, tasks,
  * and shuffled bytes the query actually scheduled — the "where is the
  * fixed overhead" decomposition that explain() can't show for the
  * multi-action pipeline queries (td56's epochs, it0x's driver loops).
  * Optionally dumps `.explain("formatted")` per query into an out dir
  * (the plans/r16 before/after artifacts).
  *
  * Usage: runMain graft.tools.QueryProbe <sfDir> <q1,q2,...> [plansDir] [suffix]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val plansDir = if (args.length > 2) Some(args(2)) else None
    val suffix = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var shuffleRead = 0L
    @volatile var shuffleWrite = 0L
    val sites = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        val site = Option(j.properties.getProperty("spark.job.description"))
          .orElse(Option(j.properties.getProperty("callSite.short")))
          .getOrElse("?")
        sites.merge(site, 1, (a, b) => a + b)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
        shuffleRead += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        shuffleWrite += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    // warmup identical to Bench's
    try {
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
      graft.Tables.names.foreach(n => graft.Tables.load(spark, sfDir, n).count())
    } catch { case _: Throwable => }

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      jobs = 0; stages = 0; tasks = 0; shuffleRead = 0L; shuffleWrite = 0L
      sites.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      val cnt = df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      // listener events are async; give the bus a moment to drain
      Thread.sleep(300)
      println(f"[probe] $name%-32s $dt%7.2f s (build $tBuild%6.2f) " +
        f"jobs=$jobs%4d stages=$stages%4d tasks=$tasks%6d " +
        f"shufR=${shuffleRead / 1024}%8d KiB shufW=${shuffleWrite / 1024}%8d KiB rows=$cnt")
      if (sys.env.contains("SPARK_GRAFT_PROBE_SITES")) {
        import scala.jdk.CollectionConverters._
        sites.asScala.toSeq.sortBy(-_._2.intValue).take(25).foreach {
          case (site, n) => println(f"[probe]   $n%5d jobs from $site")
        }
      }
      plansDir.foreach { pd =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(pd))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(pd, s"${name}_$suffix.txt"), plan)
      }
    }
    spark.stop()
  }
}
