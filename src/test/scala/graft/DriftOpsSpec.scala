package graft

import graft.operators.DriftOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-monitoring contracts: identical snapshots read zero drift,
  * a constructed shift reads exactly its share arithmetic, and the
  * top-bucket attribution points at the moved mass.
  */
class DriftOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("embeddingDrift: identical snapshots have zero drift") {
    // ids 2k and 2k+1 carry the same vector → sides A and B identical
    val vecs = (0L until 40L).map(i =>
      (i, Array((i / 2 % 5).toFloat / 5f - 0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val out = DriftOps.embeddingDrift(vecs, "vec_id", "embedding",
      col("vec_id") % 2 === 1, buckets = 10)
      .select("d", "l1_micro").as[(Int, Long)].collect().toMap
    assert(out == Map(0 -> 0L, 1 -> 0L))
  }

  test("embeddingDrift: a moved dimension reads its exact share shift") {
    // dim 0: side A all at -0.85 (bucket 0), side B all at +0.85
    // (bucket 9) → both buckets shift by 1e6 → l1 = 2e6, top bucket 0
    // (tie broken to the lower bucket). dim 1 identical on both sides
    // (its only occupied bucket, 5, is the top with zero shift).
    val vecs = (0L until 20L).map(i =>
      (i, Array(if (i % 2 == 1) 0.85f else -0.85f, 0.1f)))
      .toDF("vec_id", "embedding")
    val out = DriftOps.embeddingDrift(vecs, "vec_id", "embedding",
      col("vec_id") % 2 === 1, buckets = 10)
      .as[(Int, Long, Int, Long)].collect().toList
    assert(out == List((0, 2000000L, 0, 1000000L), (1, 0L, 5, 0L)))
  }

  test("corpusDrift: language mix shift is attributed to the moved lang") {
    // A: 4 en docs; B: 2 en + 2 de docs. lang drift: en 1e6 vs 5e5
    // (5e5) + de 0 vs 5e5 (5e5) → l1 = 1e6; top bucket 'de' (ties by
    // shift first — de and en tie at 5e5, lower bucket string 'de'
    // wins). len/stop_ratio identical (same texts on both sides).
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, text, "en"), (2L, text, "en"), (4L, text, "en"), (6L, text, "en"),
      (1L, text, "en"), (3L, text, "en"), (5L, text, "de"), (7L, text, "de"))
      .toDF("doc_id", "text", "lang")
    val out = DriftOps.corpusDrift(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 1)
      .as[(String, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("lang") == (("lang", 2L, 1000000L, "de", 500000L)))
    assert(out("len")._3 == 0L)
    assert(out("stop_ratio")._3 == 0L)
  }

  test("corpusDrift: NULL langs bucket to the sentinel, not a NULL bucket") {
    // A: 4 en; B: 2 en + 2 NULL-lang. The NULL side must bucket as
    // '__null' (a real, non-NULL bucket string), so the tie-break
    // window and the oracle's ORDER BY agree (NULL would sort FIRST in
    // Spark's asc but LAST in DuckDB's default).
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, text, Some("en")), (2L, text, Some("en")),
      (4L, text, Some("en")), (6L, text, Some("en")),
      (1L, text, Some("en")), (3L, text, Some("en")),
      (5L, text, None), (7L, text, None))
      .toDF("doc_id", "text", "lang")
    val out = DriftOps.corpusDrift(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 1)
      .as[(String, Long, Long, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    // en 1e6 vs 5e5, __null 0 vs 5e5 → l1 = 1e6; tie at 5e5 breaks to
    // the lexically lower bucket '__null'
    assert(out("lang") == (("lang", 2L, 1000000L, "__null", 500000L)))
  }

  test("driftVsBaseline over a persisted count frame equals corpusDrift") {
    // the live side carries a lang ('fr') absent from the baseline —
    // the full outer join must count it 0 on the baseline side, same
    // as corpusDrift's single-scan counts do
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = (1 to 45).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, short, "en"), (2L, short, "en"), (4L, long, "de"),
      (1L, long, "en"), (3L, short, "fr"), (5L, long, "fr"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-drift-base-").toString
    DriftOps.corpusFeatureCounts(docs.where(col("doc_id") % 2 === 0),
        "doc_id", "text", "lang")
      .write.parquet(s"$dir/baseline")
    val live = DriftOps.corpusFeatureCounts(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", "lang")
    val viaBaseline = DriftOps.driftVsBaseline(live,
      spark.read.parquet(s"$dir/baseline")).collect().map(_.toSeq).toSeq
    val direct = DriftOps.corpusDrift(docs, "doc_id", "text", "lang",
      col("doc_id") % 2 === 1).collect().map(_.toSeq).toSeq
    assert(viaBaseline == direct)
    assert(viaBaseline.nonEmpty)
  }

  test("embeddingDriftVsBaseline over a persisted frame equals embeddingDrift") {
    val vecs = (0L until 20L).map(i =>
      (i, Array(if (i % 2 == 1) 0.85f else -0.85f, (i % 4).toFloat / 8f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft-embdrift-base-").toString
    DriftOps.embeddingBucketCounts(vecs.where(col("vec_id") % 2 === 0),
        "vec_id", "embedding")
      .write.parquet(s"$dir/baseline")
    val live = DriftOps.embeddingBucketCounts(
      vecs.where(col("vec_id") % 2 === 1), "vec_id", "embedding")
    val viaBaseline = DriftOps.embeddingDriftVsBaseline(live,
      spark.read.parquet(s"$dir/baseline")).collect().map(_.toSeq).toSeq
    val direct = DriftOps.embeddingDrift(vecs, "vec_id", "embedding",
      col("vec_id") % 2 === 1).collect().map(_.toSeq).toSeq
    assert(viaBaseline == direct)
    // dim 0 is fully disjoint between the sides (bucket 0 vs 9)
    assert(direct.head(1) == 2000000L)
  }

  test("a NULL or empty embedding fails LOUDLY, never silently skews shares") {
    // posexplode of an empty array emits no rows, so without the guard
    // the vector would vanish from the dim-0-derived totals and every
    // share would silently overcount — the contract is raise_error
    val empt = Seq((0L, Array(0.1f, 0.2f)), (1L, Array.empty[Float]))
      .toDF("vec_id", "embedding")
    val e1 = intercept[Exception] {
      DriftOps.embeddingBucketCounts(empt, "vec_id", "embedding").collect()
    }
    assert(e1.getMessage.contains("empty embedding for id 1"))
    val nul = Seq((0L, Some(Array(0.1f, 0.2f))), (3L, None))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      DriftOps.embeddingDrift(nul, "vec_id", "embedding",
        col("vec_id") % 2 === 1).collect()
    }
    assert(e2.getMessage.contains("empty embedding for id 3"))
    // valid snapshots are untouched by the guard
    assert(DriftOps.embeddingBucketCounts(
      empt.where(col("vec_id") === 0), "vec_id", "embedding")
      .count() == 2L)
  }

  test("driftVsBaselineByEpoch: ONE plan equals per-epoch driftVsBaseline") {
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val long = (1 to 45).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, short, "en"), (2L, short, "en"), (4L, long, "de"),
      (1L, long, "en"), (3L, short, "fr"), (5L, long, "fr"),
      (7L, long, "de"), (9L, short, "de"))
      .toDF("doc_id", "text", "lang")
    val baseline = DriftOps.corpusFeatureCounts(
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text", "lang")
    def epochCounts(e: Int) = DriftOps.corpusFeatureCounts(
        docs.where(col("doc_id") % 3 === e), "doc_id", "text", "lang")
      .withColumn("epoch", lit(e))
    val live = epochCounts(1).unionByName(epochCounts(2))
    val grouped = DriftOps.driftVsBaselineByEpoch(live, baseline)
      .collect().map(_.toSeq).toSeq
    val perEpoch = Seq(1, 2).flatMap(e =>
      DriftOps.driftVsBaseline(epochCounts(e).drop("epoch"), baseline)
        .collect().map(r => e +: r.toSeq))
    assert(grouped == perEpoch)
    assert(grouped.size == 6) // 2 epochs × 3 features
  }
}
