package graft.tools

import graft.GraftSession
import graft.operators.CurationOps
import org.apache.spark.sql.functions._

/** The BPE merge-count regime probe at SHIPPING scale (r14 verdict
  * #3): the committed 50×8 probe reached ~120-130 accepted merges
  * because the testdata vocabulary exhausts there (30 learnable
  * distinct words, ≤107 possible merges) — acceptance density at
  * real merge-table depths was an extrapolation, not a measurement.
  * This probe measures it: a synthetic VOCABULARY-RICH corpus (50k
  * distinct hex words over a 16-char alphabet, the adversarial case
  * for the symbol-disjoint batched accept — early rounds can accept
  * at most |alphabet|/2 merges no matter the batch) is pushed to
  * >= `target` ACCEPTED merges at the given batch, recording
  * per-round acceptance density and wall time, then one
  * [[CurationOps.applyMerges]] pass is timed at the FULL learned
  * merge-table depth (the chunked-codegen path a tokenizer-apply job
  * exercises). `rampEvery` > 0 doubles the candidate window every
  * that many accepted merges (capped at `maxBatch`) — the
  * measured-regime mitigation for fixed-window under-fill at depth
  * (r15 verdict #5); semantics stay the batched disjoint acceptance
  * at whatever window each round ranks. Usage:
  *   runMain graft.tools.BpeScaleProbe [target] [batch] [vocab]
  *     [rampEvery] [maxBatch]
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.length > 0) args(0).toInt else 1000
    val batch = if (args.length > 1) args(1).toInt else 256
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val rampEvery = if (args.length > 3) args(3).toInt else 0
    val maxBatch = if (args.length > 4) args(4).toInt else Int.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 50k distinct 5-14 char hex words with a zipf-ish frequency mix
    // (low ids recur across docs), 20 words per synthetic doc
    val docs = spark.range(vocab.toLong * 4)
      .select((col("id") % 2500).as("doc"),
        substring(md5(pmod(col("id") * 131, lit(vocab.toLong))
          .cast("string")), 1, 5)
          .as("w5"),
        substring(md5((col("id") % vocab).cast("string")), 1,
          14).as("w14"))
      .select(col("doc"), concat_ws(" ", col("w5"), col("w14")).as("piece"))
      .groupBy(col("doc"))
      .agg(concat_ws(" ", collect_list(col("piece"))).as("text"))

    println(s"[bpe-scale] target=$target batch=$batch vocab~$vocab" +
      (if (rampEvery > 0) s" rampEvery=$rampEvery maxBatch=$maxBatch"
       else " (no ramp)"))
    val t0 = System.nanoTime()
    var lastLog = 0
    val hist = Seq.newBuilder[(Int, Int, Long)]
    var cum = 0
    val (merges, wf) = CurationOps.bpeLoop(docs, "text",
      rounds = 100000, batch = batch, maxMerges = target,
      rampEvery = rampEvery, maxBatch = maxBatch,
      onRound = (round, accepted, ms) => {
        cum += accepted
        hist += ((round, accepted, ms))
        if (cum / 100 > lastLog) {
          lastLog = cum / 100
          println(f"[bpe-scale] round $round%4d: +$accepted%3d accepted " +
            f"(cum $cum%5d), ${ms / 1000.0}%5.2f s/round")
        }
      })
    val learnSec = (System.nanoTime() - t0) / 1e9
    val rows = hist.result()
    val nRounds = rows.size
    println(f"[bpe-scale] LEARN: ${merges.size}%d merges in $nRounds%d " +
      f"rounds, $learnSec%.1f s total " +
      f"(${learnSec / math.max(1, nRounds)}%.2f s/round, " +
      f"${merges.size.toDouble / math.max(1, nRounds)}%.1f merges/round)")
    // density by phase: first/middle/last third of the rounds
    rows.grouped(math.max(1, nRounds / 3)).zipWithIndex.foreach {
      case (g, i) =>
        println(f"[bpe-scale]   phase $i: rounds ${g.head._1}-${g.last._1}, " +
          f"${g.map(_._2).sum.toDouble / g.size}%.1f merges/round, " +
          f"${g.map(_._3).sum / 1000.0 / g.size}%.2f s/round")
    }
    wf.unpersist()

    // the apply side at full merge-table depth: fresh segmentation,
    // chunked replace fold, one accounting rollup
    val t1 = System.nanoTime()
    val wf0 = docs
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 2 && col("w").rlike("^[a-z0-9]+\\z"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("seg", regexp_replace(col("w"), "(.)", "($1)"))
    val applied = CurationOps.applyMerges(wf0, "seg",
      merges.map(m => (m._2, m._3)))
    val acct = applied.agg(
      sum(col("freq")).as("n_words"),
      sum(col("freq") * length(col("w"))).as("n_chars"),
      sum(col("freq") * size(regexp_extract_all(col("seg"),
        lit("\\(([^)]*)\\)"), lit(1)))).as("n_bpe_tokens")).collect()(0)
    val applySec = (System.nanoTime() - t1) / 1e9
    println(f"[bpe-scale] APPLY: ${merges.size}%d merges over the " +
      f"distinct-word frame in $applySec%.1f s — " +
      s"words=${acct.getLong(0)} chars=${acct.getLong(1)} " +
      s"bpe_tokens=${acct.getLong(2)}")
  }
}
