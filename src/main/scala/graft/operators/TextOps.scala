package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** MinHash signature columns mh0..mh{k-1} per id, from exploded shingles.
    * Permutation i is xxhash64(shingle, i) — k independent 64-bit hashes.
    */
  def minhashSignature(docs: DataFrame, idCol: String, shinglesCol: String,
                       numPerms: Int): DataFrame = {
    val exploded = docs.select(col(idCol), explode(col(shinglesCol)).as("__sh"))
    val aggs = (0 until numPerms).map(i => min(xxhash64(col("__sh"), lit(i))).as(s"mh$i"))
    exploded.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

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

  /** Distinct candidate pairs (id_a < id_b) sharing any LSH bucket. */
  def candidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col("band"), col("bh"), col(idCol).as("id_a"))
    val b = bands.select(col("band"), col("bh"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bh")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  /** Exact Jaccard for given pairs, from per-doc shingle arrays. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, idCol: String,
                    shinglesCol: String): DataFrame = {
    val sa = docs.select(col(idCol).as("id_a"), col(shinglesCol).as("__sa"))
    val sb = docs.select(col(idCol).as("id_b"), col(shinglesCol).as("__sb"))
    pairs.join(sa, "id_a").join(sb, "id_b")
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard", col("__inter") /
        (size(col("__sa")) + size(col("__sb")) - col("__inter")))
      .drop("__sa", "__sb", "__inter")
  }

  /** Exact all-pairs Jaccard ≥ threshold via inverted shingle index
    * (one shuffle on shingle, one on the pair key). The exact baseline;
    * at very large scale prefer minhashLshPairs which prunes candidates.
    */
  def allPairsJaccard(docs: DataFrame, idCol: String, shinglesCol: String,
                      threshold: Double): DataFrame = {
    val exploded = docs.select(col(idCol).as("id"), explode(col(shinglesCol)).as("sh"))
    val sizes = docs.select(col(idCol).as("id"), size(col(shinglesCol)).as("n"))
    val inter = exploded.select(col("sh"), col("id").as("id_a"))
      .join(exploded.select(col("sh"), col("id").as("id_b")), "sh")
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
  def minhashLshPairs(docs: DataFrame, idCol: String, shinglesCol: String,
                      threshold: Double, numPerms: Int = 64,
                      rowsPerBand: Int = 2): DataFrame = {
    val sig = minhashSignature(docs, idCol, shinglesCol, numPerms)
    val cands = candidatePairs(lshBands(sig, idCol, numPerms, rowsPerBand), idCol)
    jaccardVerify(cands, docs, idCol, shinglesCol)
      .where(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash per doc over distinct words (word hash = first 15 hex
    * chars of md5, so the oracle can recompute it).
    */
  def simhash60(docs: DataFrame, idCol: String, wordsCol: String): DataFrame =
    docs.select(col(idCol), explode(array_distinct(col(wordsCol))).as("w"))
      .withColumn("wh", conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
      .withColumn("j", explode(sequence(lit(0), lit(59))))
      .withColumn("bitval",
        when(expr("(wh >> j) & 1") === 1, lit(1)).otherwise(lit(-1)))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("bitval")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") >= 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(lit(0L))).as("simhash"))

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
        bit_count(expr("sim_a ^ sim_b")).as("hamming")).distinct()
      .where(col("hamming") <= maxDist)
  }
}
