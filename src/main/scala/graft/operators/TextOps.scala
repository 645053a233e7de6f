package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Checkpoints.BarrierOps

/** Text-pipeline primitives for large-corpus deduplication: shingling,
  * MinHash+LSH, SimHash — the operator set a 100 TB training-data
  * pipeline needs (beyond the reference's own surface; BASELINE.json
  * north star). Everything is declarative (explode/groupBy/join) with no
  * driver-side state: candidate generation shuffles on band/bucket keys,
  * so work scales linearly with corpus size instead of quadratically.
  */
object TextOps {

  /** Lower-cased whitespace tokens. */
  def words(text: Column): Column = split(lower(text), " ")

  /** Distinct word n-grams (shingles); empty array when fewer than n words. */
  def wordNgrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      array_distinct(transform(sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct (id, shingle) pairs — the preferred at-scale form: built
    * from posexplode + window `lead`, so every operator is codegen'd
    * (the array/lambda form above evaluates interpreted, which is both
    * slower and single-threaded when the source is one file). The
    * window shuffle also spreads per-doc work across the cluster.
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleCols(docs, idCol, textCol, n) { parts =>
      concat_ws(" ", parts: _*).as("sh")
    }

  /** Distinct (id, sh: bigint) pairs, sh = xxhash64 of the string
    * shingle — the at-scale form: hashing BEFORE the distinct keeps the
    * wide shingle strings out of the distinct shuffle and every
    * downstream join/aggregate, which then move fixed-width longs only.
    * Collision risk ~p²/2^65 — the same tolerance jaccardVerifyIdx
    * already accepts.
    */
  def shingleHashIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    shingleCols(docs, idCol, textCol, n) { parts =>
      xxhash64(concat_ws(" ", parts: _*)).as("sh")
    }

  /** (id, sh) word n-grams WITH duplicates — the counting form behind
    * repetition-quality filters (vs the distinct membership form above).
    */
  def ngramCountIndex(docs: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame =
    shingleCols(docs, idCol, textCol, n, distinct = false) { parts =>
      concat_ws(" ", parts: _*).as("sh")
    }

  private def shingleCols(docs: DataFrame, idCol: String, textCol: String, n: Int,
                          distinct: Boolean = true)(
      shingle: Seq[Column] => Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // HASH-repartition on the doc id before the explode (not
    // round-robin): the source is often a handful of parquet files, so
    // a repartition is needed for scan parallelism either way — but
    // hashpartitioning(id) ALSO satisfies the lead-window's clustering
    // requirement, so the exchange moves each document's text once and
    // the window (plus any downstream per-id aggregate, e.g. the
    // minhash signature fold) runs shuffle-free. Round-robin left the
    // window's requirement unmet and Spark re-shuffled the EXPLODED
    // token stream — ~5-10x corpus bytes at 100 TB, on the path every
    // shingle-based dedup op funnels through.
    val withLeads = docs
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"), posexplode(words(col("__text"))).as(Seq("pos", "w")))
      .select(col("id") +: col("w") +:
        (1 until n).map(i => lead(col("w"), i).over(w).as(s"w$i")): _*)
    val parts = col("w") +: (1 until n).map(i => col(s"w$i"))
    val idx = withLeads
      .where(parts.map(_.isNotNull).reduce(_ && _))
      .select(col("id"), shingle(parts))
    if (distinct) idx.distinct() else idx
  }

  /** (id, sh) index from a shingle-array column (array form adapter). */
  def explodeShingles(docs: DataFrame, idCol: String, shinglesCol: String): DataFrame =
    docs.select(col(idCol).as("id"), explode(col(shinglesCol)).as("sh"))

  /** MinHash signature columns mh0..mh{k-1} per id from an (id, sh)
    * index. Permutation i is xxhash64(shingle, i) — k independent
    * 64-bit hashes, computed in one codegen'd aggregate pass.
    */
  def minhashSignatureIdx(idx: DataFrame, numPerms: Int): DataFrame = {
    val aggs = (0 until numPerms).map(i => min(xxhash64(col("sh"), lit(i))).as(s"mh$i"))
    idx.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  def minhashSignature(docs: DataFrame, idCol: String, shinglesCol: String,
                       numPerms: Int): DataFrame =
    minhashSignatureIdx(explodeShingles(docs, idCol, shinglesCol), numPerms)
      .withColumnRenamed("id", idCol)

  /** LSH banding: one row per (id, band, bandHash). With r rows per band
    * and b = numPerms/r bands, a pair with Jaccard J collides with
    * probability 1-(1-J^r)^b — at r=2, b=32, J≥0.8 the miss probability
    * is < 1e-14, so candidates are effectively lossless above threshold.
    */
  def lshBands(sig: DataFrame, idCol: String, numPerms: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numPerms / rowsPerBand
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i"))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("__b"))
      .select(col(idCol), col("__b.band").as("band"), col("__b.bh").as("bh"))
  }

  /** b-bit MinHash signatures (Li & König, WWW'10 / CACM'11): keep
    * only the low `bBits` bits of each of `numPerms` MinHash values —
    * a 64/b-fold signature compression whose Jaccard estimator stays
    * unbiased after collision correction (P[bits match] = C + (1-C)·J
    * with C = 2^-b; solve for J).
    *
    * Permutation family: ONE md5 per shingle (the 60-bit prefix — the
    * DuckDB-replayable base hash), then per perm i a three-round
    * multiply-xor-shift mix of `x XOR (i·K)` — the SrpBucketLong
    * recipe, every intermediate under 2^63 with 27-bit masks before
    * each multiply so DuckDB BIGINT (which ERRORS on overflow) replays
    * it. Rounds 2 and 3 fold in bits 27..53 and 54..59 of the base, so
    * all 60 bits inform every perm value. This replaced 16 md5 calls
    * per shingle row (measured 9.5 s → ~1 s for the signature pass at
    * sf0.1). Independence caveat that bit this operator once: a shared
    * base pushed through k LINEAR perms correlates minima across
    * unrelated sets (8/16 spurious b-bit matches on disjoint sets);
    * the non-linear mix rounds are what decorrelate — the
    * disjoint-sets spec gates it, same as the SRP two-round fix.
    * ONE codegen'd aggregate pass over the exploded shingle index.
    * Input: (id, gr) distinct string shingles. Output: (id, b0..b{k-1}).
    */
  def bbitMinhashSig(idx: DataFrame, numPerms: Int, bBits: Int): DataFrame = {
    val full = minhashSigReplayable(idx, numPerms)
    full.select(col("id") +:
      (0 until numPerms).map(i =>
        (col(s"mh$i") % lit(1L << bBits)).as(s"b$i")): _*)
  }

  /** Full-width MinHash signatures from [[bbitMinhashSig]]'s
    * DuckDB-replayable permutation family (the md5 60-bit prefix +
    * three-round multiply-xor-shift mix documented above): one row per
    * id with columns mh0..mh{k-1}, each the minimum mixed value over
    * the id's shingles. [[bbitMinhashSig]] is exactly this with the
    * low `bBits` kept (min first, mask after — the order the estimator
    * and its oracle both use); [[lshBandTuning]] bands the full
    * values. ONE codegen'd aggregate pass over the exploded index.
    * Input: (id, gr) distinct string shingles.
    */
  def minhashSigReplayable(idx: DataFrame, numPerms: Int): DataFrame = {
    val mask27 = (1L << 27) - 1
    val mask32 = (1L << 32) - 1
    def round(v: Column, mult: Long): Column = {
      val m = (v.bitwiseAND(lit(mask27)) * lit(mult)).bitwiseAND(lit(mask32))
      m.bitwiseXOR(shiftright(m, 16))
    }
    val withX = idx.withColumn("__x",
      conv(substring(md5(col("gr")), 1, 15), 16, 10).cast("long"))
    val aggs = (0 until numPerms).map { i =>
      val y = col("__x").bitwiseXOR(lit(i.toLong * 173961102589770L)) // i·0x9E3779B97F4A
      val h1 = round(y, 2654435761L)
      val h2 = round(h1.bitwiseXOR(shiftright(y, 27)), 1597334677L)
      val h3 = round(h2.bitwiseXOR(shiftright(y, 54)), 2654435761L)
      min(h3).as(s"mh$i")
    }
    withX.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding tuner (the S-curve analysis of Leskovec/Rajaraman/
    * Ullman, "Mining of Massive Datasets" ch. 3.4): BEFORE committing
    * a (bands b × rows r) configuration for a corpus-scale MinHash
    * dedup run, measure — on the live corpus — what each divisor
    * configuration of a `numPerms`-perm signature would actually
    * harvest. One row per candidate config with the OBSERVED columns
    * (candidate-pair load, true/false split at `threshold`, share of
    * the observed true-pair universe caught) next to the THEORETICAL
    * S-curve `1-(1-s^r)^b` evaluated exactly at s=0.8 and s=0.5.
    *
    * Observed universe: the union of every grid config's candidates.
    * With min(rowsGrid) = 2 this union IS the r=2 config's candidate
    * set — any aligned r-block of matching perms (r ≥ 2 in the grid)
    * contains an aligned 2-block (first 2-aligned boundary inside the
    * block starts at most minR-1 past the block start, and
    * r ≥ 2·minR-1 for all grid entries), so caught_micro at r=2 is
    * 1e6 by construction and every other config is measured against
    * the same denominator. caught_micro is NULL when the corpus has
    * no true pairs at all (nothing to tune against — not an error).
    *
    * Exactness: the permutation family is [[minhashSigReplayable]]'s
    * (an oracle replays every signature bit); the S-curve columns are
    * exact integer rationals — s=0.8=4/5 gives
    * p = 1 - (5^r - 4^r)^b / 5^numPerms with every intermediate under
    * 2^63 for numPerms ≤ 16 (5^16·1e6 ≈ 1.5e17), s=0.5 likewise over
    * 2^numPerms — so no float pow crosses an engine boundary.
    *
    * Scale anatomy: one corpus scan builds the signature aggregate;
    * each doc emits sum(numPerms/r) band rows (16 at the default
    * grid); ONE hot-salted self-join mines all configs' candidates
    * together (band keys are disjoint across configs by the "r:band:"
    * prefix); the exact-Jaccard verify is bounded by the distinct
    * candidate count — the loosest config bounds the tuner's cost
    * exactly as it would bound the production run it is sizing, and
    * the output is #configs rows. Input: (id, sh) distinct string
    * shingles (the [[shingleIndex]] shape).
    */
  def lshBandTuning(strIdx: DataFrame, numPerms: Int = 12,
                    rowsGrid: Seq[Int] = Seq(2, 3, 4, 6, 12),
                    threshold: Double = 0.8): DataFrame = {
    require(numPerms >= 2 && numPerms <= 16,
      s"numPerms must be in [2, 16] (S-curve stays in exact BIGINT range), got $numPerms")
    require(rowsGrid.nonEmpty && rowsGrid.forall(r => r >= 2 && numPerms % r == 0),
      s"rowsGrid entries must divide numPerms=$numPerms and be >= 2, got $rowsGrid")
    val minR = rowsGrid.min
    require(rowsGrid.forall(r => r >= 2 * minR - 1 || r == minR),
      s"every grid entry must be >= 2*min-1 = ${2 * minR - 1} for the " +
        s"union = loosest-config containment to hold, got $rowsGrid")
    val sig = minhashSigReplayable(
      strIdx.select(col("id"), col("sh").as("gr")), numPerms).barrier()
    val bandStructs = rowsGrid.flatMap { r =>
      (0 until numPerms / r).map { b =>
        val vals = (b * r until (b + 1) * r).map(i => col(s"mh$i").cast("string"))
        struct(lit(r.toLong).as("r"),
          concat_ws(",", lit(s"$r:$b") +: vals: _*).as("bk"))
      }
    }
    val bands = sig.select(col("id"), explode(array(bandStructs: _*)).as("__b"))
      .select(col("id"), col("__b.r").as("r"), col("__b.bk").as("bk"))
    // hot-salted but result-identical to the plain self-join; r rides
    // along on the left so per-config membership survives the join
    val cand = SkewJoin.saltedInnerHot(
        bands.select(col("bk"), col("r"), col("id").as("id_a")),
        bands.select(col("bk"), col("id").as("id_b")),
        "bk", col("id_a"), 16, 4096L)
      .where(col("id_a") < col("id_b"))
      .select(col("r"), col("id_a"), col("id_b")).distinct()
      .barrier() // feeds the union verify AND the per-config rollup
    val uniq = cand.select(col("id_a"), col("id_b")).distinct()
    val ver = jaccardVerifyIdx(uniq, strIdx).barrier()
    // r = 0 marks the union pseudo-config — the caught_micro
    // denominator — carried through the same rollup then peeled off
    val tagged = cand.unionByName(uniq.withColumn("r", lit(0L)))
      .join(ver, Seq("id_a", "id_b"))
    val agg = tagged.groupBy(col("r"))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("jaccard") >= lit(threshold), 1L).otherwise(0L)).as("n_true"))
      .withColumn("n_false", col("n_candidates") - col("n_true"))
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    val p80 = rowsGrid.map(r => r.toLong -> sCurveMicro(5, 4, r, numPerms)).toMap
    val p50 = rowsGrid.map(r => r.toLong -> sCurveMicro(2, 1, r, numPerms)).toMap
    def lut(m: Map[Long, Long]): Column =
      m.foldLeft(lit(null).cast("long")) { case (c, (r, v)) =>
        when(col("r") === lit(r), lit(v)).otherwise(c)
      }
    agg
      .withColumn("__total_true", max(when(col("r") === 0L, col("n_true"))).over(w))
      .where(col("r") =!= 0L)
      .withColumn("caught_micro",
        when(col("__total_true") > 0L,
          expr("(n_true * 1000000) DIV __total_true")))
      .select(
        (lit(numPerms.toLong) / col("r")).cast("long").as("bands"),
        col("r").as("rows_per_band"),
        col("n_candidates"), col("n_true"), col("n_false"),
        col("caught_micro"),
        lut(p80).as("p80_micro"), lut(p50).as("p50_micro"))
  }

  /** Exact integer S-curve point: floor(1e6 · (1 - (d^r - n^r)^b / d^P))
    * for similarity s = n/d, b = P/r bands — BigInt inside, required to
    * stay in Long so the DuckDB twin's BIGINT arithmetic replays it.
    */
  private def sCurveMicro(d: Long, n: Long, r: Int, numPerms: Int): Long = {
    val dP = BigInt(d).pow(numPerms)
    val miss = (BigInt(d).pow(r) - BigInt(n).pow(r)).pow(numPerms / r)
    val micro = (dP - miss) * 1000000 / dP
    require(dP * 1000000 <= BigInt(Long.MaxValue),
      s"S-curve denominator d^P*1e6 exceeds BIGINT for d=$d, P=$numPerms")
    micro.toLong
  }

  /** MOSS-style robust winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * per document the fingerprint set is the MINIMUM word k-gram of each
    * w-long sliding window over the gram sequence. Guarantee: any match
    * of >= w+k-1 consecutive words between two documents shares at least
    * one fingerprint, at ~2/(w+1) the density of the full shingle set —
    * the storage/recall dial plagiarism and boilerplate detectors run
    * on. Production winnowing minimizes a uniform HASH of the gram;
    * this minimizes the gram itself (lexicographic) so the oracle
    * reproduces the selection byte for byte — the plan shape (one keyed
    * sort feeding a bounded running-window min) is identical either
    * way, and selection density still averages the 2/(w+1) bound.
    * Returns distinct (id, fp). Scale anatomy: ONE doc-sized exchange
    * (hash-by-id before the explode) feeds both window passes
    * (lead-gram completeness filter + windowed min share the sort)
    * and the distinct — corpus-linear, no pair surface, and the
    * exploded token stream itself never shuffles.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int): DataFrame = {
    val wOrd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // hash-by-id BEFORE the explode (shingleCols rationale): the doc
    // exchange satisfies both window passes' clustering — the token
    // stream never re-shuffles
    val exploded = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"), posexplode(words(col("__text"))).as(Seq("pos", "w0")))
    val wordCols = col("w0") +: (1 until k).map(i =>
      lead(col("w0"), i).over(wOrd).as(s"w$i"))
    val grams = exploded
      .select(col("id") +: col("pos") +: wordCols: _*)
      .where((0 until k).map(i => col(s"w$i").isNotNull).reduce(_ && _))
      .select(col("id"), col("pos"),
        concat_ws(" ", (0 until k).map(i => col(s"w$i")): _*).as("gram"))
    grams
      .withColumn("fp", min(col("gram")).over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)))
      .withColumn("__full", lead(col("gram"), w - 1).over(wOrd).isNotNull)
      .where(col("__full"))
      .select(col("id"), col("fp")).distinct()
  }

  /** Winnowing overlap mining: pairs sharing >= minShared fingerprints.
    * Fingerprints held by more than bucketCap documents are dropped
    * before the pair join (universal boilerplate — a MOSS "too common,
    * ignore" list derived from the corpus itself), which bounds the
    * per-fingerprint pair expansion at bucketCap²; the cap is part of
    * the operator contract and lives in the oracle too. The join
    * routes through [[SkewJoin.saltedInnerHot]] like the LSH mining
    * path, so a sub-cap-but-hot fingerprint still can't serialize onto
    * one task.
    */
  def winnowPairs(fps: DataFrame, minShared: Long, bucketCap: Int,
                  saltFactor: Int = 16): DataFrame = {
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val capped = fps
      .withColumn("__n", count(lit(1)).over(wFp))
      .where(col("__n") <= bucketCap).drop("__n")
      .barrier() // hot probe below is a separate action
    val a = capped.select(col("fp"), col("id").as("doc_a"))
    val b = capped.select(col("fp"), col("id").as("doc_b"))
    SkewJoin.saltedInnerHot(a, b, "fp", col("doc_a"), saltFactor,
        hotThreshold = bucketCap.toLong.max(1024L))
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Distinct candidate pairs (id_a < id_b) sharing any LSH bucket.
    *
    * Skew-hardened: the pair expansion of a bucket with n members is
    * n², and a plain equi-join lands ALL of it on one task — an
    * adversarial corpus (one boilerplate page duplicated 100k times
    * collides in every band) turns the mining join into a single
    * straggler (measured in SkewProbe: straggler share 1.000 for a
    * full-side hot key). The join therefore routes through
    * [[SkewJoin.saltedInnerHot]]: ONE aggregate over the band index
    * finds buckets above `hotBucketThreshold` members (broadcast-sized
    * list by construction), only those buckets' rows join salted
    * (spread over `saltFactor` tasks), the cold majority joins plain —
    * identical result set, bounded per-task pair expansion
    * (hotBucketThreshold²·saltFactor worst case per task).
    */
  def candidatePairs(bands: DataFrame, idCol: String,
                     hotBucketThreshold: Long = 4096L,
                     saltFactor: Int = 16): DataFrame = {
    // Materialize the band index once: the hot probe is a SEPARATE
    // action (its result must exist before the join plan is built), so
    // without this the upstream signature aggregate would run twice.
    val k = bands.select(struct(col("band"), col("bh")).as("__bk"),
      col(idCol).as("__id")).barrier()
    val a = k.select(col("__bk"), col("__id").as("id_a"))
    val b = k.select(col("__bk"), col("__id").as("id_b"))
    SkewJoin.saltedInnerHot(a, b, "__bk", col("id_a"), saltFactor,
        hotBucketThreshold)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard for given pairs, via the exploded inverted index.
    * Sizes and intersections come from aggregations (materialized through
    * the shuffle), so the shingle-building expression is evaluated once
    * per document — never inlined into per-pair predicates, which would
    * turn candidate filtering quadratic in interpreted expression evals.
    */
  def jaccardVerifyIdx(pairs: DataFrame, idx: DataFrame): DataFrame = {
    // Join on the 64-bit shingle hash, not the string: long join keys
    // are far cheaper to shuffle/compare and collisions are ~p²/2^65.
    val e = idx.select(col("id"), xxhash64(col("sh")).as("sh"))
    val sizes = e.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(e.select(col("id").as("id_a"), col("sh").as("__sha")).hint("shuffle_hash"), "id_a")
      .join(e.select(col("id").as("__idb"), col("sh").as("__shb")).hint("shuffle_hash"),
        col("id_b") === col("__idb") && col("__sha") === col("__shb"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", coalesce(col("inter"), lit(0L)) /
        (col("na") + col("nb") - coalesce(col("inter"), lit(0L))))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Document cap for the exact all-pairs Jaccard baseline: above it a
    * call must opt in with forceExact=true, mirroring
    * [[VectorOps.ExactBaselineMaxRows]] — the candidate pair set of the
    * exact path grows with O(pairs-per-shingle) and explodes silently at
    * corpus scale. The intended at-scale operator answering the same
    * query is minhashLshPairsIdx (banded LSH candidates, exact verify).
    */
  val ExactBaselineMaxDocs: Int = 100000

  /** Exact all-pairs Jaccard ≥ threshold via inverted shingle index
    * (one shuffle on shingle, one on the pair key). The exact baseline;
    * at very large scale prefer minhashLshPairs which prunes candidates
    * (inputs above [[ExactBaselineMaxDocs]] documents must opt in via
    * forceExact).
    */
  def allPairsJaccardIdx(idx: DataFrame, threshold: Double,
                         forceExact: Boolean = false): DataFrame = {
    // Three consumers (sizes + both self-join sides): materialize once
    // instead of re-running the shingle pipeline per consumer. No
    // explicit repartition before the checkpoint: a full extra shuffle
    // of the index costs more than it saves (measured ~1.5x on the
    // whole query), and AQE only coalesces the materialization when the
    // data is small enough that downstream reshuffles are cheap anyway.
    val exploded = idx.select(col("id"), xxhash64(col("sh")).as("sh"))
      .barrier()
    if (!forceExact) {
      // Guard probe runs over the already-materialized checkpoint (ids
      // only, partial distinct per partition) — it never re-runs the
      // shingle pipeline and never counts the full pair set.
      val nDocs = exploded.select(col("id")).distinct()
        .limit(ExactBaselineMaxDocs + 1).count()
      require(nDocs <= ExactBaselineMaxDocs,
        s"allPairsJaccardIdx is the exact O(pairs) baseline and the input " +
          s"has more than $ExactBaselineMaxDocs documents; use " +
          "minhashLshPairsIdx at this scale, or pass forceExact=true to insist")
    }
    val sizes = exploded.groupBy(col("id")).agg(count(lit(1)).as("n"))
    // Never broadcast the inverted index: both sides are corpus-sized.
    val inter = exploded.select(col("sh"), col("id").as("id_a")).hint("shuffle_hash")
      .join(exploded.select(col("sh"), col("id").as("id_b")).hint("shuffle_hash"), "sh")
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** MinHash-LSH near-dup pairs: LSH candidates, exact-verified at the
    * threshold. Same result set as allPairsJaccard at far lower cost.
    */
  def minhashLshPairsIdx(idx: DataFrame, threshold: Double,
                         numPerms: Int = 64, rowsPerBand: Int = 2): DataFrame = {
    // The index feeds four distinct subtrees (signature aggregate, both
    // sides of the intersection join, sizes); materialize it once so the
    // shingle construction isn't recomputed per consumer — at corpus
    // scale that is 4x the scan+explode+window cost. No explicit
    // repartition before the checkpoint: the extra full shuffle of the
    // index measured ~1.5x slower end-to-end, and the per-id aggregates
    // reshuffle to their own key regardless.
    val mat = idx.barrier()
    val sig = minhashSignatureIdx(mat, numPerms)
    val cands = candidatePairs(lshBands(sig, "id", numPerms, rowsPerBand), "id")
    jaccardVerifyIdx(cands, mat).where(col("jaccard") >= threshold)
  }

  /** Incremental near-dup against a PERSISTED LSH index — the
    * nightly-crawl production shape (the batch forms above re-mine the
    * whole corpus; a running dedup service must not): the existing
    * corpus is indexed ONCE into two append-only parquet-able frames —
    * the band index (`id`, `band`, `bh`) and the hashed shingle index
    * (`id`, `sh`) — and each new batch computes only ITS OWN bands,
    * joins them against stored ∪ new, and exact-verifies the
    * candidates. Work is O(|batch| + colliding postings), never
    * O(corpus): the stored corpus enters only through the band join
    * (pruned to shared buckets, hot buckets auto-salted like
    * [[candidatePairs]]) and the verify join (pruned to candidate
    * ids). Index maintenance = the caller appending the batch's
    * bands/shingles to the store.
    *
    * @param newIdx         the new batch's hashed shingle index
    *                       (shingleHashIndex output)
    * @param storedBands    the persisted band index of the corpus
    * @param storedShingles the persisted shingle index of the corpus
    * @return canonical (id_a < id_b, jaccard) pairs with ≥ one side in
    *         the new batch — identical to what a full re-mine would
    *         report for those pairs
    */
  def incrementalNearDupIdx(newIdx: DataFrame, storedBands: DataFrame,
                            storedShingles: DataFrame, threshold: Double,
                            numPerms: Int = 64, rowsPerBand: Int = 2,
                            hotBucketThreshold: Long = 4096L,
                            saltFactor: Int = 16): DataFrame = {
    val newMat = newIdx.select(col("id"), col("sh")).barrier()
    val newBands = lshBands(minhashSignatureIdx(newMat, numPerms), "id",
        numPerms, rowsPerBand)
      .barrier() // probe side + union side + the hot probe
    incrementalNearDupPre(newMat, newBands, storedBands, storedShingles,
      threshold, hotBucketThreshold, saltFactor)
  }

  /** [[incrementalNearDupIdx]] for callers that ALREADY hold the new
    * batch's materialized shingle index and band index (the td56/td58
    * ingest pipeline checkpoints both to append them to its stores):
    * skips the redundant re-checkpoint of the index AND the second
    * minhash-signature aggregate over the batch — per epoch that was
    * two extra materialization jobs plus a full numPerms-column
    * signature recompute (the single most expensive per-batch
    * expression), for frames the caller provably has on hand.
    * `newMat` must be (id, sh) and `newBands` must be lshBands over
    * minhashSignatureIdx(newMat) with matching numPerms/rowsPerBand —
    * both eagerly materialized.
    */
  private[graft] def incrementalNearDupPre(newMat: DataFrame,
                            newBands: DataFrame, storedBands: DataFrame,
                            storedShingles: DataFrame, threshold: Double,
                            hotBucketThreshold: Long = 4096L,
                            saltFactor: Int = 16): DataFrame = {
    val a = newBands.select(struct(col("band"), col("bh")).as("__bk"),
      col("id").as("id_new"))
    val b = newBands.unionByName(
        storedBands.select(col("id"), col("band"), col("bh")))
      .select(struct(col("band"), col("bh")).as("__bk"),
        col("id").as("id_other"))
    val cands = SkewJoin.saltedInnerHot(a, b, "__bk", col("id_new"),
        saltFactor, hotBucketThreshold)
      .where(col("id_new") =!= col("id_other"))
      .select(least(col("id_new"), col("id_other")).as("id_a"),
        greatest(col("id_new"), col("id_other")).as("id_b"))
      .distinct()
    jaccardVerifyIdx(cands,
        newMat.unionByName(storedShingles.select(col("id"), col("sh"))))
      .where(col("jaccard") >= threshold)
  }

  // Array-column adapters (tests / small inputs).
  def allPairsJaccard(docs: DataFrame, idCol: String, shinglesCol: String,
                      threshold: Double, forceExact: Boolean = false): DataFrame =
    allPairsJaccardIdx(explodeShingles(docs, idCol, shinglesCol), threshold,
      forceExact)

  def minhashLshPairs(docs: DataFrame, idCol: String, shinglesCol: String,
                      threshold: Double, numPerms: Int = 64,
                      rowsPerBand: Int = 2): DataFrame =
    minhashLshPairsIdx(explodeShingles(docs, idCol, shinglesCol), threshold,
      numPerms, rowsPerBand)

  /** Benchmark decontamination over (id, sh) shingle indexes: for every
    * corpus doc, the count of its distinct grams, how many appear
    * anywhere in the benchmark set, the overlap ratio, and a flag at
    * `threshold`. One hash-key join — work scales with corpus size,
    * never with corpus × benchmark pairs.
    */
  def decontaminate(corpusIdx: DataFrame, benchIdx: DataFrame,
                    threshold: Double): DataFrame = {
    val bench = benchIdx.select(col("sh")).distinct()
    val sizes = corpusIdx.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val hits = corpusIdx.hint("shuffle_hash").join(bench.hint("shuffle_hash"), "sh")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    sizes.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("overlap", round(col("n_hits") / col("n_grams"), 6))
      .withColumn("contaminated", col("n_hits") / col("n_grams") > threshold)
  }

  /** Bloom-prefiltered decontamination: same EXACT result as
    * [[decontaminate]], but the corpus side is filtered map-side through
    * a Bloom filter built over the benchmark grams before anything
    * shuffles. A Bloom filter has no false negatives, so no hit is lost;
    * its false positives are discarded by the exact verify join that
    * follows — only the (tiny) surviving gram fraction pays shuffle
    * cost. This is Spark's own InjectRuntimeFilter pattern made
    * explicit and deterministic: at 100 TB the corpus gram index is the
    * dominant shuffle input of td10, and the broadcast-literal bloom
    * (1 MiB default) removes ~all of it at the scan.
    */
  def decontaminateBloom(corpusIdx: DataFrame, benchIdx: DataFrame,
                         threshold: Double,
                         expectedBenchGrams: Long = 1L << 20,
                         numBits: Long = 1L << 23): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    import org.apache.spark.sql.types.BinaryType
    val bench = benchIdx.select(col("sh")).distinct()
    val sizes = corpusIdx.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val bloomAgg = column(new BloomFilterAggregate(
        new XxHash64(Seq(expression(col("sh")))),
        Literal(expectedBenchGrams), Literal(numBits))
      .toAggregateExpression()).as("bloom")
    val bloomBytes = bench.agg(bloomAgg).head().getAs[Array[Byte]](0)
    val noHits = sizes
      .select(col("id"), col("n_grams"), lit(0L).as("n_hits"),
        lit(0d).as("overlap"), lit(false).as("contaminated"))
    if (bloomBytes == null) return noHits // empty benchmark: nothing overlaps
    val mightContain = column(BloomFilterMightContain(
      Literal.create(bloomBytes, BinaryType),
      new XxHash64(Seq(expression(col("sh"))))))
    val hits = corpusIdx.where(mightContain).hint("shuffle_hash")
      .join(bench.hint("shuffle_hash"), "sh")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    sizes.join(hits, Seq("id"), "left")
      .select(col("id"), col("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("overlap", round(col("n_hits") / col("n_grams"), 6))
      .withColumn("contaminated", col("n_hits") / col("n_grams") > threshold)
  }

  /** Corpus-relative-frequency score from an (id, w) token index (with
    * duplicates): per-doc token count and the average relative corpus
    * frequency of its tokens — rare-word-heavy docs score low. Exact
    * decimal accumulation keeps the average order-independent.
    */
  def corpusRelFreq(wordsIdx: DataFrame, idCol: String): DataFrame = {
    val freq = wordsIdx.groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    val tot = wordsIdx.agg(count(lit(1)).as("n"))
    wordsIdx.join(freq.hint("shuffle_hash"), "w")
      .crossJoin(broadcast(tot))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum((col("cnt") / col("n"))
            .cast(org.apache.spark.sql.types.DecimalType(25, 18)))
          .cast("double") / count(lit(1)), 9).as("avg_rel_freq"))
  }

  /** Greedy sequence packing — the batch-assembly step before training:
    * docs are packed in deterministic (group, id) order into bins of at
    * most `budget` tokens (an oversized doc becomes its own oversize
    * bin, the standard convention). Bins never cross groups and each
    * group lands wholly in one partition (repartition on the group
    * column), so packing is one ordered pass per partition with O(1)
    * state — the distributed packing layout, parallelism = number of
    * groups/shards. Returns (g, id, t, bin_id) with bin ids sequential
    * per group.
    */
  def packSequences(docs: DataFrame, groupCol: String, idCol: String,
                    tokensCol: String, budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("t"))
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        var curG: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (g, id, t) =>
          if (g != curG) { curG = g; bin = 0L; fill = t }
          else if (fill + t <= budget) fill += t
          else { bin += 1; fill = t }
          (g, id, t, bin)
        }
      }
      .toDF("g", "id", "t", "bin_id")
  }

  /** Gopher/C4-style repetition-quality stats from a WITH-duplicates
    * (id, sh) n-gram index: total gram count, the most frequent gram
    * (count ties broken on the gram itself), and its fraction of the
    * doc. One (id, gram) count aggregate + one per-id window — both
    * shuffle on bounded keys, no corpus-wide state.
    */
  def repetitionStats(ngramIdx: DataFrame, fracDigits: Int = 6): DataFrame = {
    val byId = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
    val w = byId.orderBy(col("cnt").desc, col("sh"))
    ngramIdx.groupBy(col("id"), col("sh")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_grams", sum(col("cnt")).over(byId))
      .where(col("rn") === 1)
      .select(col("id"), col("n_grams"),
        col("sh").as("top_gram"), col("cnt").as("top_n"),
        round(col("cnt") / col("n_grams"), fracDigits).as("top_frac"))
  }

  /** Deny-list / PII scrubbing — the C4/Gopher-style cleanup step that
    * redacts sensitive patterns (emails, phone numbers, banned terms)
    * before training. The deny-list compiles into ONE regex literal, so
    * at 100 TB this is a stateless map-side pass: no shuffle, no state,
    * whole-stage-codegen regexp over each partition. Per doc it reports
    * the redaction count plus the hash and length of the cleaned text
    * (the cleaned text itself stays in the pipeline; the projection is
    * what the oracle compares). Patterns must stay in the RE2 ∩ Java
    * regex dialect so external engines (the DuckDB oracle, but also any
    * RE2-based scrubber) reproduce the result exactly.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            denyRe: String, replacement: String = "[REDACTED]"): DataFrame =
    docs.select(col(idCol),
      size(regexp_extract_all(col(textCol), lit(denyRe), lit(0))).as("n_redactions"),
      md5(regexp_replace(col(textCol), denyRe, replacement)).as("clean_hash"),
      length(regexp_replace(col(textCol), denyRe, replacement)).as("clean_len"))

  /** 60-bit SimHash per doc over distinct words (word hash = first 15 hex
    * chars of md5, so the oracle can recompute it).
    */
  def simhash60(docs: DataFrame, idCol: String, wordsCol: String): DataFrame =
    simhash60Idx(
      docs.select(col(idCol), explode(array_distinct(col(wordsCol))).as("w")), idCol)

  /** SimHash from a distinct (id, w) words index (preferred form).
    * One aggregation pass: 60 conditional ±1 sums (one per bit) with
    * map-side partial aggregation, instead of exploding every word 60×
    * through two shuffles — same integer sums, so bit-identical.
    */
  def simhash60Idx(wordsIdx: DataFrame, idCol: String): DataFrame = {
    val sums = (0 until 60).map { j =>
      sum(when(shiftright(col("wh"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$j")
    }
    val bits = (0 until 60).map(j =>
      when(col(s"s$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
    wordsIdx
      .withColumn("wh", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
      .groupBy(col(idCol))
      .agg(sums.head, sums.tail: _*)
      .select(col(idCol), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, via the
    * pigeonhole banded join: split the 60-bit hash into 4 15-bit chunks;
    * any pair within distance ≤ 3 must agree on at least one chunk, so
    * joining on (chunk_idx, chunk_value) has guaranteed 100% recall
    * while avoiding the quadratic cross join.
    */
  def simhashPairs(sim: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4 chunks guarantee recall only up to distance 3")
    val chunks = sim.select(col(idCol).as("id"), col("simhash"),
      explode(array((0 until 4).map(c =>
        struct(lit(c).as("c"), expr(s"(simhash >> ${15 * c}) & 32767").as("cv"))): _*)).as("__c"))
      .select(col("id"), col("simhash"), col("__c.c").as("c"), col("__c.cv").as("cv"))
    val a = chunks.select(col("c"), col("cv"), col("id").as("id_a"), col("simhash").as("sim_a"))
    val b = chunks.select(col("c"), col("cv"), col("id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("c", "cv")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sim_a ^ sim_b")).as("hamming"))
      // filter BEFORE the dedup shuffle: far-apart band collisions
      // (the overwhelming majority) die map-side instead of riding
      // through the distinct's exchange
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** C4-style corpus-wide line dedup, with fixed word-chunks standing in
    * for lines (the testdata has no newlines; a newline-delimited corpus
    * passes `split(text, "\n")` positions through the identical plan).
    * Every non-overlapping `chunkWords`-word chunk is deduplicated
    * across the WHOLE corpus: a chunk whose text occurs in more than
    * one document survives only in the lowest-id document (C4 keeps one
    * occurrence of each duplicated line), and each document's text is
    * reassembled from its surviving chunks in order, plus the partial
    * tail. Scale anatomy: chunks shuffle once on the chunk text for the
    * corpus-wide first-owner aggregate, then once on id for reassembly —
    * both equi-keyed, no corpus-sized state anywhere. The chunk strings
    * are bounded (chunkWords words), so the shuffle rows stay narrow.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                chunkWords: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // hash-by-id BEFORE the explode (same rationale as shingleCols):
    // the doc exchange satisfies the chunk window's clustering, so the
    // exploded token stream never re-shuffles
    val base = docs.select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"), size(words(col("__text"))).as("n_words"),
        posexplode(words(col("__text"))).as(Seq("pos", "w")))
    val leadCols = (1 until chunkWords).map(i => lead(col("w"), i).over(w).as(s"w$i"))
    val chunks = base
      .select(col("id") +: col("n_words") +: col("pos") +: col("w") +: leadCols: _*)
      .where(col("pos") % chunkWords === 0 &&
        col("pos") + chunkWords <= col("n_words"))
      .select(col("id"),
        (col("pos") / chunkWords).cast("int").as("chunk_idx"),
        concat_ws(" ", col("w") +: (1 until chunkWords).map(i => col(s"w$i")): _*).as("chunk"))
    // Corpus-wide first owner per chunk text (min id). df > 1 chunks
    // survive only there; unique chunks survive in place.
    val owners = chunks.groupBy(col("chunk")).agg(min(col("id")).as("keep_id"))
    val kept = chunks.join(owners.hint("shuffle_hash"), Seq("chunk"))
      .where(col("id") === col("keep_id"))
    val rebuilt = kept.groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
          x => x("chunk")), " ").as("__body"))
    docs.select(col(idCol).as("id"), words(col(textCol)).as("__wds"))
      .select(col("id"), col("__wds"), size(col("__wds")).as("n_words"))
      .withColumn("n_chunks", (col("n_words") / chunkWords).cast("int"))
      .withColumn("__tail", concat_ws(" ",
        slice(col("__wds"), col("n_chunks") * chunkWords + 1,
          col("n_words") - col("n_chunks") * chunkWords)))
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_chunks"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).cast("int").as("n_removed"),
        trim(concat_ws(" ", coalesce(col("__body"), lit("")), col("__tail"))).as("text"))
  }

  /** Duplicated-span detection (the signal behind substring-level
    * training-data dedup, Lee et al. 2022 "Deduplicating Training Data
    * Makes Language Models Better"): the fraction of a document's
    * OVERLAPPING word `n`-gram windows that also occur in at least
    * `minDf - 1` other documents. Documents above `flagFrac` are the
    * boilerplate/near-copy candidates a span-level deduper would
    * rewrite. One inverted-index aggregate on the gram hash + one
    * join back — the same two-shuffle anatomy as decontaminate, run
    * corpus-against-itself. Docs with fewer than n words have no
    * windows and drop out, as in the reference pipelines.
    */
  def dupSpanStats(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 15, minDf: Int = 2,
                   flagFrac: Double = 0.5): DataFrame = {
    // Materialized once, consumed three times. Almost every gram is
    // unique at corpus scale, so the df >= minDf survivor set is tiny:
    // one hash aggregate over the index (no sort), and the dup-count
    // join runs against a frame AQE broadcasts — the decontaminate
    // anatomy, corpus-against-itself.
    val idx = shingleHashIndex(docs, idCol, textCol, n).barrier()
    val shared = idx.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf).select(col("sh"))
    val perDoc = idx.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
    val dups = idx.join(shared, "sh")
      .groupBy(col("id")).agg(count(lit(1)).as("n_dup"))
    perDoc.join(dups, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_grams"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup") / col("n_grams"), 6))
      .withColumn("flagged", col("dup_frac") >= flagFrac)
  }

  /** DSIR-style importance selection (Xie et al. 2023 "Data Selection
    * for Language Models via Importance Resampling", reduced to exact
    * integer arithmetic so the result is oracle-reproducible): score
    * every corpus document by how target-like its unigram distribution
    * is — the ratio of summed add-one-smoothed target counts to summed
    * corpus counts over the document's tokens (the log-free analogue of
    * the n-gram likelihood ratio; monotone in the same signal) — and
    * keep the `quota` highest scorers (ties broken on id). Both count
    * tables shuffle on the token; the quota cut is a distributed
    * top-k (per-partition top-k + driver merge of quota rows), never a
    * global sort. DSIR hashes n-grams into a fixed bucket space to
    * bound the vocabulary at web scale — that bucketing drops in as
    * `xxhash64(w) % nBuckets` on both count tables without changing
    * the plan (omitted here so the oracle can reproduce scores
    * exactly).
    *
    * Inputs are WITH-duplicates (id, w) token indexes: `corpusIdx` the
    * documents to score, `targetIdx` the target-domain sample.
    */
  def importanceSelect(corpusIdx: DataFrame, targetIdx: DataFrame,
                       quota: Int): DataFrame = {
    val tc = targetIdx.groupBy(col("w")).agg(count(lit(1)).as("tc"))
    val rc = corpusIdx.groupBy(col("w")).agg(count(lit(1)).as("rc"))
    val scored = corpusIdx
      .join(tc.hint("shuffle_hash"), Seq("w"), "left")
      .join(rc.hint("shuffle_hash"), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(coalesce(col("tc"), lit(0L)) + lit(1L)).as("__num"),
        sum(col("rc") + lit(1L)).as("__den"))
      .select(col("id"), col("n_words"),
        round(col("__num") / col("__den"), 6).as("importance"))
    val top = scored.orderBy(col("importance").desc, col("id")).limit(quota)
      .select(col("id"), lit(true).as("__sel"))
    scored.join(broadcast(top), Seq("id"), "left")
      .select(col("id"), col("n_words"), col("importance"),
        coalesce(col("__sel"), lit(false)).as("selected"))
  }

  /** Typed PII redaction — the structured sibling of [[scrub]]: each
    * PII class (email, phone, IPv4, long account-number digit run) is
    * detected and counted separately and replaced with its own typed
    * token, the per-class counts feeding compliance reporting while the
    * typed tokens preserve "there was a phone here" signal for
    * training. Like scrub this is a pure stateless map-side pass (four
    * compiled regexes per partition, no shuffle, no state) — at 100 TB
    * it costs one scan. Patterns stay inside the RE2 ∩ Java dialect so
    * any external scrubber reproduces the result; replacement order is
    * email → phone → IPv4 → digit-run so no later pattern can match
    * inside an earlier token (counts are taken on the ORIGINAL text,
    * independent per class).
    */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiPhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val PiiIpv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PiiDigitRunRe = "\\b\\d{9,}\\b"

  def piiRedact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def n(re: String) = size(regexp_extract_all(t, lit(re), lit(0)))
    val cleaned =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(t, PiiEmailRe, "[EMAIL]"),
            PiiPhoneRe, "[PHONE]"),
          PiiIpv4Re, "[IP]"),
        PiiDigitRunRe, "[ID]")
    docs.select(col(idCol),
      n(PiiEmailRe).as("n_emails"),
      n(PiiPhoneRe).as("n_phones"),
      n(PiiIpv4Re).as("n_ips"),
      n(PiiDigitRunRe).as("n_ids"),
      md5(cleaned).as("clean_hash"),
      length(cleaned).as("clean_len"))
  }

  /** Bigram language-model quality scoring (the CCNet/KenLM filter
    * shape, reduced to exact integer arithmetic so the oracle
    * reproduces it bit for bit): train a maximum-likelihood bigram
    * model ON THE CORPUS ITSELF — c2(w1,w2) bigram counts and c1(w1)
    * bigram-start counts, so p(w2|w1) = c2/c1 is a proper conditional —
    * then score each document by the average conditional probability of
    * its bigrams (each term floor-scaled to a long via integer
    * division, the log-free analogue of mean log-likelihood: fluent
    * in-distribution text scores high, gibberish scores low) plus the
    * fraction of bigram occurrences whose corpus count is ≤ `rareMax`
    * (the rare-n-gram ratio; a high ratio flags out-of-distribution or
    * noisy text). Plan shape at 100 TB: two count aggregates shuffling
    * fixed-width tokens, two shuffle-hash joins back onto the bigram
    * index, one per-doc aggregate — no all-pairs work, no driver state.
    * Docs with fewer than 2 words have no bigrams and drop out (same
    * as the reference's min-length prefilters).
    */
  /** Distributed linear quality-probe training — the "train a quality
    * filter ON the cluster" step (the fastText-classifier shape of
    * CCNet/RedPajama curation, reduced to a linear model so every
    * arithmetic step is engine-reproducible): batch gradient descent on
    * least squares over simple rational features (bias, scaled word
    * count, distinct-word ratio, scaled mean word length), label =
    * `labelCol`. Each round is ONE aggregate over the feature frame
    * (gradient terms floor-scaled to longs — order-independent exact
    * sums, the it02 PageRank trick); the 4-float weight vector lives on
    * the driver, the standard distributed-GD split: model tiny, data
    * never moves, rounds = O(iters) jobs regardless of corpus size.
    * Features use only integer division and power-of-two scaling, so a
    * recursive-CTE oracle reproduces training round for round.
    * Returns (id, y, score, selected): score = x·w after `iters`
    * rounds floor-quantized to 1e-6, selected = score ≥ the corpus
    * floor-mean score (an above-average filter — scale-independent and
    * non-vacuous by construction, unlike an absolute cutoff a
    * half-trained probe may never reach; the comparison is integer:
    * scaled score vs the integer-divided scaled total).
    */
  def linearProbe(docs: DataFrame, idCol: String, textCol: String,
                  label: Column, iters: Int = 5, eta: Double = 0.25): DataFrame = {
    val scored = linearProbeS6(docs, idCol, textCol, label, iters, eta)
    val tot = scored.agg(sum(col("__s6")).as("__tot"),
      count(lit(1)).as("__n"))
    // floor of the DOUBLE quotient on both sides (as te12 does): Spark's
    // integer `div` truncates toward zero while DuckDB's `//` floors, so
    // a negative summed score would put the threshold off by one.
    scored.crossJoin(broadcast(tot))
      .select(col("id"), col("y"), (col("__s6") / lit(1e6)).as("score"),
        (col("__s6") >= floor(col("__tot") / col("__n")).cast("long")).as("selected"))
  }

  /** [[linearProbe]]'s trained scores BEFORE the mean-threshold cut —
    * (id, y, __s6: long micros) — factored so [[probeCalibration]]
    * sweeps thresholds over the SAME integer scores the selection
    * rule floors (one definition of the training loop; a re-derived
    * float score would drift from the oracle at bucket boundaries).
    */
  private[graft] def linearProbeS6(docs: DataFrame, idCol: String,
                                   textCol: String, label: Column,
                                   iters: Int = 5,
                                   eta: Double = 0.25): DataFrame = {
    val ws = words(col(textCol))
    val feats = docs.select(col(idCol).as("id"), label.cast("double").as("y"),
        size(ws).as("n_words"), size(array_distinct(ws)).as("n_uniq"),
        length(col(textCol)).as("n_chars"))
      .where(col("n_words") > 0)
      .select(col("id"), col("y"), lit(1.0).as("x0"),
        (col("n_words") / lit(128.0)).as("x1"),
        (expr("(n_uniq * 1048576L) div n_words") / lit(1048576.0)).as("x2"),
        (expr("(n_chars * 1048576L) div n_words") / lit(1048576.0) / lit(16.0)).as("x3"))
      .barrier()
    val n = feats.count()
    var w = Array(0.0, 0.0, 0.0, 0.0)
    def xdotw = col("x0") * lit(w(0)) + col("x1") * lit(w(1)) +
      col("x2") * lit(w(2)) + col("x3") * lit(w(3))
    for (_ <- 0 until iters) {
      val resid = xdotw - col("y")
      val g = feats.agg(
        sum(floor(col("x0") * resid * lit(1e9)).cast("long")).as("g0"),
        sum(floor(col("x1") * resid * lit(1e9)).cast("long")).as("g1"),
        sum(floor(col("x2") * resid * lit(1e9)).cast("long")).as("g2"),
        sum(floor(col("x3") * resid * lit(1e9)).cast("long")).as("g3"))
        .collect()(0)
      w = Array.tabulate(4)(j => w(j) - eta * (g.getLong(j).toDouble / 1e9) / n)
    }
    feats.select(col("id"), col("y"),
      floor(xdotw * lit(1e6)).cast("long").as("__s6"))
  }

  /** Classifier calibration sweep (td66): BEFORE committing a quality
    * classifier's threshold for a corpus-scale filter run, the
    * precision/recall trade at EVERY candidate threshold — the same
    * measure-first discipline as the LSH banding tuner
    * ([[lshBandTuning]]), applied to [[linearProbe]]'s quality score.
    * Scores are bucketed at `bucketMicros` granularity (floor of the
    * exact double quotient — both engines floor the identical IEEE
    * division, and truncating integer DIV would disagree on negative
    * scores); each occupied bucket is one candidate threshold row:
    * keeping every doc scoring at or above that bucket yields
    * n_pred_keep predictions of which tp carry the training label —
    * precision/recall in floor'd integer micros against the label
    * counts.
    *
    * Scale anatomy: one corpus scan trains and scores (the
    * [[linearProbe]] loop — `iters` bounded driver-round aggregates);
    * ONE hash aggregate reduces the corpus to the score-domain-
    * bounded histogram (≤ score-range/bucketMicros rows, hundreds at
    * the default); the cumulative sweep is a single-partition window
    * over THAT frame — bounded by the domain, never the corpus, the
    * [[CurationOps.quantileGate]] rationale. recall_micro is NULL
    * when the corpus carries no positive labels (nothing to
    * calibrate against — not an error).
    */
  def probeCalibration(docs: DataFrame, idCol: String, textCol: String,
                       label: Column,
                       bucketMicros: Long = 15625L): DataFrame = {
    require(bucketMicros >= 1, s"bucketMicros must be >= 1, got $bucketMicros")
    val scored = linearProbeS6(docs, idCol, textCol, label)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("thr_bucket").desc)
      .rowsBetween(Long.MinValue, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    scored
      .groupBy(floor(col("__s6") / lit(bucketMicros.toDouble)).cast("long")
        .as("thr_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("y").cast("long")).as("pos"))
      .withColumn("n_pred_keep", sum(col("n")).over(w))
      .withColumn("tp", sum(col("pos")).over(w))
      .withColumn("__total_pos", sum(col("pos")).over(wAll))
      .withColumn("fp", col("n_pred_keep") - col("tp"))
      .withColumn("fn", col("__total_pos") - col("tp"))
      .withColumn("precision_micro",
        expr("(tp * 1000000) DIV n_pred_keep"))
      .withColumn("recall_micro",
        when(col("__total_pos") > 0L, expr("(tp * 1000000) DIV __total_pos")))
      .select(col("thr_bucket"), col("n"), col("pos"), col("n_pred_keep"),
        col("tp"), col("fp"), col("fn"), col("precision_micro"),
        col("recall_micro"))
  }

  /** ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better" —
    * the suffix-array ExactSubstr dedup re-expressed relationally):
    * every n-token window that occurs more than once in the corpus is
    * kept ONLY at its first occurrence (minimum (doc, pos)); every
    * token covered by a non-canonical duplicate window is dropped, and
    * the surviving tokens are reassembled. Returns
    * (id, n_tokens, n_removed, clean_text) for every document.
    *
    * Scale anatomy: windows are an (id, pos, gram) index (the td19
    * substrate with positions); duplicate grams and their canonical
    * occurrence come from ONE hash aggregate (canonical = min of the
    * composite id*1e6+pos — engine-exact integer ordering, no struct
    * comparison semantics to match across engines); removal positions
    * explode each non-canonical window into its n positions (n is a
    * constant); the kept set is one anti-join; reassembly is one keyed
    * sort-aggregate. Everything shuffles by gram or by (id, pos) —
    * corpus-linear, no pair join anywhere, unlike the O(n²)-adjacent
    * suffix-array construction the paper uses single-node.
    */
  def exactSubstrRemove(docs: DataFrame, idCol: String, textCol: String,
                        n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    // hash-by-id BEFORE the explode (shingleCols rationale): the
    // checkpointed token blocks come out hash(id)-partitioned, so the
    // gram window AND the reassembly windows below all run without
    // re-shuffling the token stream
    val toks = docs
      .select(col(idCol).as("id"), col(textCol).as("__text"))
      .repartition(col("id"))
      .select(col("id"), posexplode(words(col("__text"))).as(Seq("pos", "w")))
      .barrier() // feeds windows, totals, and the kept anti-join
    val withLeads = toks.select(col("id") +: col("pos") +: col("w") +:
      (1 until n).map(i => lead(col("w"), i).over(w).as(s"w$i")): _*)
    val allParts = col("w") +: (1 until n).map(i => col(s"w$i"))
    val wins = withLeads
      .where(allParts.map(_.isNotNull).reduce(_ && _))
      .select(col("id"), col("pos").as("q"), concat_ws(" ", allParts: _*).as("g"))
    // min over the lexicographic (id, pos) STRUCT, not id*1e6+pos:
    // the packed form collides for ≥ 1e6-token documents (wrong
    // keeper) and, under Spark 4's default ANSI mode, THROWS on
    // overflow once ids pass ~9.2e12 (the shardOf bug class, round
    // 14). The struct min picks the identical keeper in every
    // non-pathological case and is total for all of them.
    val dups = wins.groupBy(col("g"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id"), col("q"))).as("__keep"))
      .where(col("__c") >= 2)
      .select(col("g"), col("__keep"))
    val rm = wins.join(dups, "g")
      .where(struct(col("id"), col("q")) =!= col("__keep"))
      .select(col("id"), explode(sequence(col("q"), col("q") + n - 1)).as("pos"))
      .distinct()
    val keptText = toks.join(rm, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
          x => x.getField("w")), " ").as("clean_text"))
    val totals = toks.groupBy(col("id")).agg(count(lit(1)).as("n_tokens"))
    totals.join(keptText, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
                    rareMax: Long = 2L, flagRatio: Double = 0.5): DataFrame = {
    val bi = ngramCountIndex(docs, idCol, textCol, 2)
      .withColumn("w1", substring_index(col("sh"), " ", 1))
    val c2 = bi.groupBy(col("sh")).agg(count(lit(1)).as("c2"))
    val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    bi.join(c2.hint("shuffle_hash"), Seq("sh"))
      .join(c1.hint("shuffle_hash"), Seq("w1"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(expr("(c2 * 1000000L) div c1")).as("__sp"),
        sum(when(col("c2") <= rareMax, 1L).otherwise(0L)).as("__nr"))
      // Integer division all the way down (no round()): round-half
      // ties between engines are impossible when the only double op is
      // dividing one exact long by a power of ten.
      .select(col("id"), col("n_bigrams"),
        (expr("__sp div n_bigrams") / lit(1e6)).as("avg_cond_p"),
        (expr("(__nr * 1000000L) div n_bigrams") / lit(1e6)).as("rare_ratio"),
        (col("__nr") / col("n_bigrams") >= flagRatio).as("flagged"))
  }

  /** Gopher-style quality GATE (Rae et al. rule family, adapted to the
    * whitespace-token corpus): per-document boolean verdicts — word
    * count band, mean-word-length band, short-word (length ≤ 4)
    * fraction, stopword presence, max-word-length cap — and the
    * conjunction as
    * `keep`. Every ratio threshold is an integer cross-multiplication
    * (`10*n_alpha >= 7*nw`, never a float division), so the gate is
    * bit-exact across engines and partial-aggregation-safe. One token
    * explode + one keyed aggregate; corpus-linear, no driver state.
    * Unlike td06's continuous quality SCORES, this is the pass/fail
    * filter stage a pipeline applies before dedup.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 30, maxWords: Int = 80): DataFrame = {
    // "function words" of this corpus's vocabulary (stands in for the
    // natural-language stopword list; rule shape is what matters)
    val stopwords = Seq("the", "a", "data", "row", "value", "query", "table")
    val st = docs
      .select(col(idCol).as("doc_id"), explode(words(col(textCol))).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"),
        sum(length(col("w")).cast("long")).as("sumlen"),
        sum(when(length(col("w")) <= 4, 1L).otherwise(0L)).as("n_short"),
        max(length(col("w")).cast("long")).as("maxlen"),
        countDistinct(when(col("w").isin(stopwords: _*), col("w"))).as("n_stop"))
    st.select(col("doc_id"),
        col("nw").between(minWords, maxWords).as("r_wordcount"),
        // mean word length in [4.2, 5.0], via x10 integer cross-mult
        (col("sumlen") * 10 >= col("nw") * 42 &&
          col("sumlen") * 10 <= col("nw") * 50).as("r_meanlen"),
        (col("n_short") * 2 >= col("nw")).as("r_shortfrac"),
        (col("n_stop") >= 6).as("r_stop"),
        (col("maxlen") <= 7).as("r_maxlen"))
      .withColumn("keep",
        col("r_wordcount") && col("r_meanlen") && col("r_shortfrac") &&
          col("r_stop") && col("r_maxlen"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2) adapted to
    * the chunk convention this corpus uses for "lines" (fixed
    * `chunkWords`-word windows, the td18/td27 convention — the corpus
    * has no newlines). Three line rules, then a page rule:
    *   - drop a chunk containing a blocklisted token (C4's
    *     "lorem ipsum"/bad-word list; `badWords`),
    *   - drop a stopword-heavy chunk (> `stopMax` hits from
    *     `stopWords` — the boilerplate-navigation analog),
    *   - drop a chunk shorter than `minChunkWords` words (C4's
    *     ≥-words-per-line rule; only tail chunks can hit it),
    * and keep the page only if ≥ `minKeptChunks` chunks survive
    * (C4's ≥-sentences-per-page rule). The cleaned text is the
    * surviving chunks re-joined in order.
    *
    * Scale shape: one corpus scan, chunking via `slice` on the
    * word array (no window function — each chunk is cut
    * independently), per-chunk rules are map-side, and the only
    * shuffle is the per-doc re-aggregation — corpus-linear with
    * no corpus-wide state at all (unlike dedup, cleaning is
    * embarrassingly parallel, and the rules run identically on a
    * 1000-executor cluster).
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              chunkWords: Int = 10,
              badWords: Seq[String] = Seq("dup"),
              stopWords: Seq[String] = Seq("a", "the"),
              stopMax: Int = 2, minChunkWords: Int = 5,
              minKeptChunks: Int = 3): DataFrame = {
    val chunks = docs
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("wds"))
      .withColumn("nw", size(col("wds")))
      .select(col("doc_id"), col("wds"),
        explode(sequence(lit(0),
          ceil(col("nw") / lit(chunkWords.toDouble)).cast("int") - 1)).as("ci"))
      .select(col("doc_id"), col("ci"),
        slice(col("wds"), col("ci") * chunkWords + 1, lit(chunkWords)).as("cw"))
      .withColumn("r_bad",
        arrays_overlap(col("cw"), array(badWords.map(lit): _*)))
      .withColumn("r_stopheavy",
        size(filter(col("cw"),
          w => stopWords.map(s => w === s).reduce(_ || _))) > stopMax)
      .withColumn("r_short", size(col("cw")) < minChunkWords)
      .withColumn("kept",
        !col("r_bad") && !col("r_stopheavy") && !col("r_short"))
    chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sum(when(col("r_bad"), 1L).otherwise(0L)).as("n_bad"),
        sum(when(col("r_stopheavy"), 1L).otherwise(0L)).as("n_stopheavy"),
        sum(when(col("r_short"), 1L).otherwise(0L)).as("n_short"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("kept"),
              struct(col("ci"), array_join(col("cw"), " ").as("ch"))))),
          x => x("ch")), " ").as("clean_text"))
      .withColumn("keep_doc", col("n_kept") >= minKeptChunks)
  }

  /** DoReMi-lite domain reweighting (Xie et al. 2023, linearized):
    * iterative exponentiated-gradient reweighting of per-domain
    * sampling weights toward domains with EXCESS proxy loss, with the
    * exp linearized to `1 + η·excess` so every step is exact integer
    * arithmetic both engines replay digit-for-digit (the repo's
    * no-transcendentals oracle contract; exp is monotone in the
    * excess, and for |η·excess| ≤ 0.2 the linearization changes the
    * weights' 6th decimal only). The proxy loss is the domain's mean
    * unique-token deficit in micros (1e6 − nu·1e6 DIV nw, averaged) —
    * the stand-in for the reference model's per-domain log-loss.
    *
    * Each iteration, on the |domains|-row frame: weighted mean loss
    * (integer DIV), per-domain excess, multiplicative update
    * `w ← w·max(1e6 + excess DIV etaDiv, 1) / 1e6`, re-normalized to
    * Σw = 1e6. The final weights are smoothed 80/20 with uniform
    * (DoReMi's regularization). Scale shape: the corpus is scanned
    * once for the per-domain aggregate; every iteration runs on the
    * |domains|-row frame (≤ a few hundred for any real corpus) with
    * two-scalar broadcast totals — nothing corpus-sized is ever
    * revisited, so the loop costs the same at 100 TB as at 100 MB.
    *
    * @return (domain, n_docs, loss_micro, w_micro) — w_micro sums to
    *         ~1e6 across domains (integer-division remainders excepted)
    */
  def doremiWeights(docs: DataFrame, idCol: String, textCol: String,
                    domainCol: String, iters: Int = 3,
                    etaDiv: Int = 5): DataFrame = {
    // All divisions are integer DIV on non-negative numerators
    // (trunc == floor, so Spark's DIV and DuckDB's // agree); the
    // possibly-negative excess is offset by 5e6 before its DIV so the
    // numerator stays positive (the offset is divisible by etaDiv for
    // every sensible etaDiv of 1e6's factors — asserted).
    require(5000000L % etaDiv == 0, s"etaDiv $etaDiv must divide 5e6")
    val perDoc = docs
      .select(col(idCol).as("doc_id"), col(domainCol).as("domain"),
        explode(words(col(textCol))).as("w"))
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("nw"), countDistinct(col("w")).as("nu"))
      .select(col("doc_id"), col("domain"),
        expr("1000000 - (nu * 1000000) DIV nw").as("d_micro"))
    val nDomains = docs.select(col(domainCol)).distinct().count().toInt
    var w = perDoc.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("d_micro")).as("sl"))
      .withColumn("loss_micro", expr("sl DIV n_docs"))
      .withColumn("w", lit(1000000L / nDomains))
      .select(col("domain"), col("n_docs"), col("loss_micro"), col("w"))
    for (_ <- 1 to iters) {
      val tot = w.agg(sum(col("w") * col("loss_micro")).as("wl"),
        sum(col("w")).as("ws"))
      val upd = w.crossJoin(broadcast(tot))
        .withColumn("excess", expr("loss_micro - wl DIV ws"))
        .withColumn("mult", greatest(
          expr(s"1000000 + (excess + 5000000) DIV $etaDiv - ${5000000L / etaDiv}"),
          lit(1L)))
        .withColumn("w1", col("w") * col("mult"))
        .select(col("domain"), col("n_docs"), col("loss_micro"), col("w1"))
      val norm = upd.agg(sum(col("w1")).as("sw"))
      w = upd.crossJoin(broadcast(norm))
        .select(col("domain"), col("n_docs"), col("loss_micro"),
          expr("(w1 * 1000000) DIV sw").as("w"))
    }
    w.select(col("domain"), col("n_docs"), col("loss_micro"),
      expr(s"(w * 4 + ${1000000L / nDomains}) DIV 5").as("w_micro"))
  }

  /** Epoch sampling plan — the step that turns [[doremiWeights]]'
    * mixture weights into a CONCRETE doc selection for one training
    * epoch: the token budget (`Σtokens DIV budgetDiv`, scale-free) is
    * split across domains by weight, and within each domain docs are
    * taken in deterministic md5-of-id order (reproducible
    * pseudo-random, the td13 gate idiom) until the domain's token
    * target is crossed (the boundary doc is included — greedy fill,
    * so a non-empty target always selects ≥1 doc).
    *
    * Scale shape: the corpus is scanned once for (domain, doc, token)
    * rows; the weight loop is [[doremiWeights]]' |domains|-row
    * iteration; the selection is ONE running-sum window per domain
    * partition. At 100 TB the per-domain sort inside that window is
    * the dominant cost — the sort-free refinement is td28's
    * stratifiedQuota histogram boundary-pick applied to token mass
    * instead of doc count (same contract, no whole-domain sort);
    * kept as the window form here because the oracle replays it
    * row-for-row.
    *
    * @return (domain, w_micro, target_tok, n_sel, tok_sel) per domain
    */
  def epochPlan(docs: DataFrame, idCol: String, textCol: String,
                domainCol: String, budgetDiv: Int = 4,
                iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val weights = doremiWeights(docs, idCol, textCol, domainCol, iters)
      .select(col("domain"), col("w_micro"))
    val docTok = docs.select(col(idCol).as("doc_id"),
        col(domainCol).as("domain"),
        size(words(col(textCol))).cast("long").as("nt"))
    val budget = docTok.agg((sum(col("nt")) / lit(budgetDiv)).cast("long")
      .as("budget"))
    val targets = weights.crossJoin(broadcast(budget))
      .select(col("domain"), col("w_micro"),
        expr("(budget * w_micro) DIV 1000000").as("target_tok"))
    val ordered = docTok.withColumn("cum_before",
      sum(col("nt")).over(Window.partitionBy(col("domain"))
        .orderBy(md5(col("doc_id").cast("string").cast("binary")),
          col("doc_id"))) - col("nt"))
    val sel = ordered.join(broadcast(targets), Seq("domain"))
      .where(col("cum_before") < col("target_tok"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_sel"), sum(col("nt")).as("tok_sel"))
    targets.join(sel, Seq("domain"), "left")
      .select(col("domain"), col("w_micro"), col("target_tok"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("tok_sel"), lit(0L)).as("tok_sel"))
  }

  /** Per-SOURCE marginal novelty (td45): for every source/dump, the
    * fraction of its distinct word n-grams that appear in NO other
    * source — the acquisition-level data-valuation report ("which dump
    * adds the most new content") that decides what a 100 TB merge
    * ingests next. Gram-level dual of td40's doc-level overlap matrix:
    * one (source, gram) distinct index, then a per-gram ownership
    * COUNT WINDOW over the gram partition (each row of the distinct
    * frame is one owning source, so the window count IS the owner
    * count — bounded by |sources|, so hot boilerplate grams cost
    * nothing extra, and no join back is needed), and a |sources|-row
    * rollup in exact integer micros. Nothing doc-pairwise, nothing
    * driver-resident; the gram frame shuffles on the gram hash ONCE.
    */
  def sourceNovelty(docs: DataFrame, idCol: String, textCol: String,
                    srcCol: String, n: Int): DataFrame = {
    // ONE corpus-sized shuffle: the gram index lands hash-partitioned
    // on the gram once; the (source, gram) distinct, the per-gram
    // ownership count (a count window over the gram partition — each
    // row of a DISTINCT frame is one owning source), and the final
    // per-source rollup's partial aggregation all run on that same
    // partitioning with no further exchange. (The naive shape —
    // distinct, groupBy(sh), join back — shuffles the 10⁷-gram frame
    // three times for the same answer.)
    val grams = shingleHashIndex(docs, idCol, textCol, n)
      .join(docs.select(col(idCol).as("id"), col(srcCol).as("source")), "id")
      .select(col("source"), col("sh"))
      .repartition(col("sh"))
      .distinct()
    grams
      .withColumn("n_src", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("sh"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n_src") === 1, 1L).otherwise(0L)).as("n_unique"))
      .withColumn("unique_micro", expr("n_unique * 1000000 DIV n_grams"))
  }

  /** Composite quality VERDICT (td43): the nightly gate a curation
    * pipeline ships — every doc gets a keep/drop decision plus a
    * machine-readable `reasons` list naming each failed rule, so drops
    * are AUDITABLE (the attribute-tagging pattern: rules are recorded,
    * not silently applied). Composes four independently-probed
    * corpus-linear stages — Gopher thresholds, the C4 page rule,
    * langid-vs-metadata agreement, exact-duplicate canonicalization —
    * and joins the four verdict frames back on the id (co-partitioned
    * hash joins; nothing wider than the id ever shuffles). The langid
    * stage repartitions the DOCS frame then explodes, so its exchange
    * moves each document's text once, not once per token.
    */
  def qualityVerdict(docs: DataFrame, idCol: String, textCol: String,
                     langCol: String): DataFrame = {
    val gopher = gopherRules(docs, idCol, textCol)
      .select(col(idCol), col("keep").as("r_gopher"))
    val c4 = c4Clean(docs, idCol, textCol)
      .select(col(idCol), col("keep_doc").as("r_c4"))
    val lang = langidAgreement(docs, idCol, textCol, langCol)
    val dup = exactDupCanonical(docs, idCol, textCol)
    gopher.join(c4, idCol).join(lang, idCol).join(dup, idCol)
      .withColumn("keep",
        col("r_gopher") && col("r_c4") && col("r_lang") && col("r_dup"))
      // concat_ws skips NULLs in BOTH engines, so the reasons list
      // is the failed rules in fixed declaration order ('' = keep)
      .withColumn("reasons", concat_ws(",",
        when(!col("r_gopher"), lit("gopher")),
        when(!col("r_c4"), lit("c4")),
        when(!col("r_lang"), lit("lang")),
        when(!col("r_dup"), lit("dup"))))
  }

  /** The langid-vs-metadata agreement rule of [[qualityVerdict]],
    * factored so lenient verdict profiles (td46) reuse it without
    * computing the rules they don't enforce: stopword-vote language
    * prediction (en/de/fr/es) compared against the metadata language.
    * Repartitions the docs frame by id BEFORE the explode so the
    * exchange moves each document's text once, not once per token.
    * Returns (idCol, r_lang).
    */
  def langidAgreement(docs: DataFrame, idCol: String, textCol: String,
                      langCol: String): DataFrame = {
    val en = Seq("the", "a", "of", "and", "to")
    val de = Seq("der", "die", "das", "und", "ist")
    val fr = Seq("le", "la", "et", "les", "des")
    val es = Seq("el", "los", "las", "y", "es")
    def score(ws: Seq[String]) =
      sum(when(col("w").isin(ws.map(x => x: Any): _*), 1).otherwise(0))
        .cast("int")
    val pred = docs
      .repartition(col(idCol))
      .select(col(idCol), explode(words(col(textCol))).as("w"))
      .groupBy(col(idCol))
      .agg(score(en).as("s_en"), score(de).as("s_de"),
        score(fr).as("s_fr"), score(es).as("s_es"))
      .withColumn("predicted",
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr")
          && col("s_en") >= col("s_es"), "en")
          .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
    docs.select(col(idCol), col(langCol))
      .join(pred.select(col(idCol), col("predicted")), idCol)
      .select(col(idCol), (col("predicted") === col(langCol)).as("r_lang"))
  }

  /** The exact-duplicate canonicalization rule of [[qualityVerdict]],
    * factored for reuse: r_dup is true only for the minimum id within
    * each identical-text group (one window over the text hash — the
    * hash, not the text, is the shuffle key width). Returns
    * (idCol, r_dup).
    */
  def exactDupCanonical(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val wDup = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(lower(col(textCol))))
    docs.select(col(idCol),
      (col(idCol) === min(col(idCol)).over(wDup)).as("r_dup"))
  }

  /** Edit-distance verification of near-duplicate pairs — the final
    * refinement stage after LSH mining: character-level Levenshtein
    * similarity over the VERIFIED near-dup pair set (shingle Jaccard
    * catches reordered boilerplate that char edit distance scores
    * low, so production fuzzy dedup re-verifies with the stricter
    * metric before destructive removal). Runs Spark's codegen'd
    * `levenshtein` only on pairs the Jaccard gate already passed —
    * O(|pairs| · len²), never corpus-quadratic; the pair set is the
    * hot-salted banded LSH join's output.
    *
    * sim_micro = ((len_max − dist) · 1e6) DIV len_max — exact integer
    * normalized similarity; `edit_dup` gates at `simThresholdMicro`.
    *
    * @param pairs (id_a, id_b, jaccard) verified pairs (e.g.
    *              [[minhashLshPairsIdx]] output)
    * @return (id_a, id_b, jaccard, dist, len_max, sim_micro, edit_dup)
    */
  def editVerifiedPairs(pairs: DataFrame, docs: DataFrame, idCol: String,
                        textCol: String,
                        simThresholdMicro: Long = 800000L): DataFrame = {
    val txt = docs.select(col(idCol).as("__id"),
      lower(col(textCol)).as("__t"))
    pairs
      .join(txt.select(col("__id").as("id_a"), col("__t").as("t_a")), Seq("id_a"))
      .join(txt.select(col("__id").as("id_b"), col("__t").as("t_b")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("t_a"), col("t_b")).cast("long"))
      .withColumn("len_max",
        greatest(length(col("t_a")), length(col("t_b"))).cast("long"))
      .withColumn("sim_micro",
        expr("((len_max - dist) * 1000000) DIV len_max"))
      .withColumn("edit_dup", col("sim_micro") >= simThresholdMicro)
      .select(col("id_a"), col("id_b"), col("jaccard"), col("dist"),
        col("len_max"), col("sim_micro"), col("edit_dup"))
  }
}
