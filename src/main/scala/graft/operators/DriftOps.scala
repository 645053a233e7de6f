package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two data snapshots — the
  * report layer a 100 TB pipeline runs BEFORE mixing a new dump or a
  * re-embedded corpus into training: "did the distribution move, and
  * where". Classic monitoring stats (PSI/KL) need logs; these ops use
  * the L1 / total-variation form instead — per-bucket shares in exact
  * integer micros and absolute differences — so every number is
  * engine-reproducible to the bit (the repo's no-transcendentals
  * oracle contract) while ranking drifted dimensions identically in
  * practice. Reference behavior: the reference ships no drift ops —
  * this extends the beyond-reference pipeline family (SURVEY §6) the
  * same way the dedup/ANN/curation rows do.
  *
  * Scale anatomy (both ops): each snapshot is scanned ONCE, map-side
  * bucketed, and partial-aggregated to a FIXED-size frame
  * (dims × buckets, or features × buckets) before anything joins —
  * shares and L1 rollups run on that tiny frame. Counts never
  * multiply by 1e6 directly: shares go through
  * [[CurationOps.microRatio]], so per-side totals beyond 9.2e12 rows
  * (a real 100 TB snapshot) shift instead of throwing under ANSI
  * mode, and the L1 sum is bounded by 2e6·buckets regardless of
  * corpus size.
  *
  * Contract: BOTH snapshots must be non-empty — an empty side makes
  * its share denominator 0 and the op fails loudly (ANSI division by
  * zero, identically in the DuckDB twin) rather than reporting a
  * meaningless drift against nothing. For [[embeddingDrift]],
  * vectors must also be non-empty arrays: the per-side totals are
  * derived from dimension 0's bucket sums (the one-scan shape), so a
  * zero-length embedding would be invisible to the denominator. That
  * contract is ENFORCED, not just documented — [[embBucketRows]]
  * raise_errors on a NULL or zero-length embedding (the microRatio
  * guard's pattern), so a degenerate snapshot fails instead of
  * silently skewing every share.
  */
object DriftOps {

  /** Per-dimension drift between embedding snapshot A (`isB` false)
    * and B (`isB` true): fixed [-1, 1] bucketing (`buckets` equal
    * cells, clamped), per-side bucket shares in micros, and per dim
    *  - `l1_micro`: Σ_buckets |share_A − share_B| (0 = identical,
    *    2e6 = disjoint),
    *  - `top_bucket` / `top_shift_micro`: the bucket with the largest
    *    absolute share shift (ties to the lower bucket).
    * One row per dimension, ordered by `l1_micro` descending — the
    * "which dims did the new encoder move" report.
    */
  def embeddingDrift(vecs: DataFrame, idCol: String, vecCol: String,
                     isB: Column, buckets: Int = 10): DataFrame = {
    val e = embBucketRows(vecs, idCol, vecCol, isB, buckets)
    // dims × buckets frame after one partial-aggregated pass
    val cnt = e.groupBy(col("d"), col("bkt"))
      .agg(sum(when(col("b"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_b"))
    embDriftRollup(cnt)
  }

  /** The per-(vector, dim) bucket rows behind [[embeddingDrift]] and
    * [[embeddingBucketCounts]]: fixed [-1, 1] bucketing, `buckets`
    * equal cells, clamped. A NULL or zero-length embedding fails
    * LOUDLY here: posexplode of an empty array emits no rows, so such
    * a vector would otherwise silently vanish from the per-side
    * totals (which [[embDriftRollup]] derives from dimension 0's
    * bucket sums) and skew every share with no error.
    */
  private def embBucketRows(vecs: DataFrame, idCol: String, vecCol: String,
                            isB: Column, buckets: Int): DataFrame = {
    val v = VectorOps.toDouble(col(vecCol))
    val guarded = when(size(v) > 0, v).otherwise(raise_error(concat(
      lit("drift: NULL or empty embedding for id "),
      col(idCol).cast("string"))))
    vecs.select(col(idCol).as("id"), isB.as("b"),
        posexplode(guarded).as(Seq("d", "x")))
      .withColumn("bkt", least(lit(buckets - 1), greatest(lit(0),
        floor((col("x") + lit(1.0)) / lit(2.0) * lit(buckets)).cast("int"))))
  }

  /** The shares/L1/top-bucket rollup shared by [[embeddingDrift]] and
    * [[embeddingDriftVsBaseline]]: input is the tiny dims×buckets
    * (d, bkt, n_a, n_b) frame. Per-side totals are per-DIM constants
    * (every vector carries every dim), DERIVED from the count frame —
    * sum over dim 0's buckets = that side's vector count. A separate
    * vecs.agg was a SECOND full snapshot scan per report (the
    * corpusDrift DriftFloorProbe finding, same shape), and an agg +
    * broadcast crossJoin would re-evaluate the cnt subtree for the
    * broadcast side — the global window keeps it ONE scan.
    */
  private def embDriftRollup(cnt: DataFrame): DataFrame = {
    val totW = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val withTot = cnt
      .withColumn("tot_a", sum(when(col("d") === 0, col("n_a"))).over(totW))
      .withColumn("tot_b", sum(when(col("d") === 0, col("n_b"))).over(totW))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d")).orderBy(desc("shift"), asc("bkt"))
    withTot
      .withColumn("s_a", CurationOps.microRatio("n_a", "tot_a"))
      .withColumn("s_b", CurationOps.microRatio("n_b", "tot_b"))
      .withColumn("shift", abs(col("s_a") - col("s_b")))
      .withColumn("rk", row_number().over(w)) // tiny frame: dims×buckets
      .groupBy(col("d"))
      .agg(sum(col("shift")).as("l1_micro"),
        max(when(col("rk") === 1, col("bkt"))).as("top_bucket"),
        max(when(col("rk") === 1, col("shift"))).as("top_shift_micro"))
      .orderBy(desc("l1_micro"), asc("d"))
  }

  /** One embedding snapshot's (d, bkt, n) count frame — the
    * fixed-size (dims × buckets) artifact an EMBEDDING drift baseline
    * persists, the [[corpusFeatureCounts]] sibling for re-embedding
    * gates: write it once when an encoder's output is blessed, and
    * every later gate run compares today's vectors against the stored
    * frame at zero reference-side scans.
    */
  def embeddingBucketCounts(vecs: DataFrame, idCol: String, vecCol: String,
                            buckets: Int = 10): DataFrame =
    embBucketRows(vecs, idCol, vecCol, lit(false), buckets)
      .groupBy(col("d"), col("bkt"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Per-dimension drift of a LIVE embedding count frame against a
    * PERSISTED baseline frame (both [[embeddingBucketCounts]]-shaped;
    * baseline = side A, live = side B). Same output schema and
    * arithmetic as [[embeddingDrift]], so the same oracle checks both
    * paths; buckets present on one side only count 0 on the other.
    */
  def embeddingDriftVsBaseline(live: DataFrame, baseline: DataFrame)
      : DataFrame =
    embDriftRollup(
      baseline.select(col("d"), col("bkt"), col("n").as("n_a"))
        .join(live.select(col("d"), col("bkt"), col("n").as("n_b")),
          Seq("d", "bkt"), "full_outer")
        .na.fill(0L, Seq("n_a", "n_b")))

  /** Corpus-feature drift between document snapshot A and B (`isB`):
    * three per-doc features — token-length bucket (`nt DIV 20`,
    * clamped to 10), stopword-share bucket (share-in-micros DIV 1e5,
    * i.e. 10% cells), and language — each bucketed, per-side shares
    * in micros, one row per feature with the L1 drift and the most
    * shifted bucket. The "did the new dump change the corpus" gate.
    */
  def corpusDrift(docs: DataFrame, idCol: String, textCol: String,
                  langCol: String, isB: Column,
                  stopWords: Seq[String] = Seq("the", "a", "of", "and", "to"))
      : DataFrame = {
    val base = featureRows(docs, textCol, langCol, isB, stopWords)
    val cnt = base.groupBy(col("feature"), col("bucket"))
      .agg(sum(when(col("b"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_b"))
    // per-side totals DERIVE from the tiny count frame (sum over one
    // feature's buckets = that side's doc count) instead of
    // re-aggregating the corpus — the DriftFloorProbe attribution
    // found the old base.agg was a SECOND full corpus scan, ~2× the
    // whole query at 100×. A global window over the features×buckets
    // frame (not a separate agg + crossJoin: Spark would re-evaluate
    // the cnt subtree for the broadcast side) keeps it ONE scan.
    val totW = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
    val withTot = cnt
      .withColumn("tot_a",
        sum(when(col("feature") === "len", col("n_a"))).over(totW))
      .withColumn("tot_b",
        sum(when(col("feature") === "len", col("n_b"))).over(totW))
    driftRollup(withTot)
  }

  /** The per-doc (b, feature, bucket) rows behind [[corpusDrift]] and
    * [[corpusFeatureCounts]] — one corpus scan, exploded 3× (len /
    * stop_ratio / lang features).
    */
  private def featureRows(docs: DataFrame, textCol: String,
                          langCol: String, isB: Column,
                          stopWords: Seq[String]): DataFrame = {
    val ws = TextOps.words(col(textCol))
    val nt = size(ws).cast("long")
    val nStop = size(filter(ws,
      w => stopWords.map(s => w === lit(s)).reduce(_ || _))).cast("long")
    // NULL langs coalesce to a sentinel BUCKET (both engines): a NULL
    // bucket would otherwise sort NULLS FIRST in Spark's tie-break
    // window but NULLS LAST in the DuckDB twin's ORDER BY, so
    // top_bucket could diverge on shift ties involving the NULL-lang
    // bucket.
    docs.select(isB.as("b"),
        nt.as("nt"), nStop.as("n_stop"),
        coalesce(col(langCol), lit("__null")).as("lang"))
      .where(col("nt") > 0)
      .withColumn("stop_micro", CurationOps.microRatio("n_stop", "nt"))
      .select(col("b"), explode(map(
        lit("len"), least(lit(9L), expr("nt DIV 20")).cast("string"),
        lit("stop_ratio"), least(lit(9L), expr("stop_micro DIV 100000")).cast("string"),
        lit("lang"), col("lang"))).as(Seq("feature", "bucket")))
  }

  /** The share/L1/top-bucket rollup shared by [[corpusDrift]],
    * [[driftVsBaseline]] and [[driftVsBaselineByEpoch]]: input carries
    * (keys..., bucket, n_a, n_b, tot_a, tot_b) on a tiny
    * keys×buckets frame; one report row per key tuple.
    */
  private def driftRollup(withTot: DataFrame,
                          keys: Seq[String] = Seq("feature")): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*).orderBy(desc("shift"), asc("bucket"))
    withTot
      .withColumn("s_a", CurationOps.microRatio("n_a", "tot_a"))
      .withColumn("s_b", CurationOps.microRatio("n_b", "tot_b"))
      .withColumn("shift", abs(col("s_a") - col("s_b")))
      .withColumn("rk", row_number().over(w)) // tiny frame
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"), sum(col("shift")).as("l1_micro"),
        max(when(col("rk") === 1, col("bucket"))).as("top_bucket"),
        max(when(col("rk") === 1, col("shift"))).as("top_shift_micro"))
      .orderBy(keys.map(col): _*)
  }

  /** One snapshot's (feature, bucket, n) count frame — the FIXED-size
    * (features × buckets) artifact a drift BASELINE persists. Write
    * it once when a corpus snapshot is blessed; every later gate run
    * then compares TODAY's scan against the stored frame via
    * [[driftVsBaseline]] and the reference side costs ZERO corpus
    * scans — the production monitoring shape (td57/te33 compare two
    * live snapshots, which re-scans the reference every run).
    */
  def corpusFeatureCounts(docs: DataFrame, idCol: String, textCol: String,
                          langCol: String,
                          stopWords: Seq[String] = Seq("the", "a", "of", "and", "to"))
      : DataFrame =
    featureRows(docs, textCol, langCol, lit(false), stopWords)
      .groupBy(col("feature"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Corpus-feature drift of a LIVE count frame against a PERSISTED
    * baseline count frame (both [[corpusFeatureCounts]]-shaped;
    * baseline = side A, live = side B). Buckets present on one side
    * only count as 0 on the other (full outer join). Same output
    * schema and arithmetic as [[corpusDrift]], so the same oracle
    * checks both paths. All joins/rollups run on features×buckets
    * rows — nothing here scales with the corpus.
    */
  def driftVsBaseline(live: DataFrame, baseline: DataFrame): DataFrame = {
    val cnt = baseline.select(col("feature"), col("bucket"),
        col("n").as("n_a"))
      .join(live.select(col("feature"), col("bucket"), col("n").as("n_b")),
        Seq("feature", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    // per-feature totals from the frames themselves (= snapshot doc
    // counts; a per-feature aggregate keeps this exact even if a
    // future feature doesn't cover every doc)
    val tot = cnt.groupBy(col("feature"))
      .agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    driftRollup(cnt.join(tot, "feature"))
  }

  /** EVERY epoch's [[driftVsBaseline]] report in ONE plan: `live` is
    * a stack of per-epoch count frames ((epoch, feature, bucket, n) —
    * the shape an ingest loop persists one of per admitted dump, the
    * td61 store), `baseline` the single blessed
    * [[corpusFeatureCounts]] frame. The production monitoring regime
    * accumulates one epoch per day — a driver loop unioning one
    * sub-plan per epoch (the shape this replaces) is ~365 unioned
    * plans and 365 tiny reads per report after a year, a driver-side
    * plan-size bottleneck; here the KB-sized baseline is broadcast
    * against the distinct-epoch frame once and every epoch's rollup
    * runs in the same grouped pass, so per-epoch cost is one tiny
    * frame's worth of rows, flat in the epoch count (measured flat to
    * 100 epochs — artifacts/td61_multi_epoch_probe_r16.txt). Same
    * arithmetic as [[driftVsBaseline]] per epoch, one report row per
    * (epoch, feature).
    */
  def driftVsBaselineByEpoch(live: DataFrame, baseline: DataFrame)
      : DataFrame = {
    val epochs = live.select(col("epoch")).distinct()
    // every epoch must compare against EVERY baseline bucket (a bucket
    // absent from an epoch's frame counts 0 live) — the crossJoin is
    // |epochs| × the KB-sized baseline frame, nowhere near data scale
    val cnt = epochs
      .crossJoin(broadcast(baseline.select(col("feature"), col("bucket"),
        col("n").as("n_a"))))
      .join(live.select(col("epoch"), col("feature"), col("bucket"),
          col("n").as("n_b")),
        Seq("epoch", "feature", "bucket"), "full_outer")
      .na.fill(0L, Seq("n_a", "n_b"))
    val tot = cnt.groupBy(col("epoch"), col("feature"))
      .agg(sum(col("n_a")).as("tot_a"), sum(col("n_b")).as("tot_b"))
    driftRollup(cnt.join(tot, Seq("epoch", "feature")),
      Seq("epoch", "feature"))
  }
}
