package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 streaming-calibration compositions: the quantile quality
  * gate run WHERE IT RUNS IN PRODUCTION — inside the ingest stream,
  * recalibrating its threshold per admitted dump from persisted
  * per-epoch score histograms (td63 = td60 × td61).
  */
object PipelineExt5 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming quantile calibration (td63): the production regime of
    // td60's histogram-exact gate — every admitted dump persists its
    // KB-sized score-value histogram (the td59 persisted-artifact
    // pattern applied to calibration), and each epoch is gated
    // IN-STREAM against the threshold recalibrated over ALL
    // histograms seen so far (epochs <= e, merged on read), so the
    // "keep the top 30% by quality" rule tracks the evolving corpus
    // without ever re-scanning it: per epoch the cost is one scan of
    // the batch plus the domain-bounded histogram frames. The oracle
    // recomputes every epoch's threshold from the raw per-epoch doc
    // slices (reconstructed via row_number, td61's convention) — the
    // merged-histogram path must match that batch recompute exactly.
    "td63_streaming_quantile_gate" -> { (s, dir) =>
      val base = scratch("td63", dir)
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val n = docs.count()
      graft.sources.LogSource.write(
        docs.withColumn("partition", lit(0))
          .repartition(1).sortWithinPartitions(asc("doc_id"))
          .select(col("partition"),
            to_json(struct(col("doc_id"), col("text"), col("lang")))
              .as("value")),
        s"$base/log")
      val docSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("lang",
          org.apache.spark.sql.types.StringType)))
      val q = s.readStream.format("graft-log").option("path", s"$base/log")
        .option("maxRecordsPerTrigger", math.max(1L, (n + 2) / 3).toString)
        .load()
        .select(from_json(col("value"), docSchema).as("d"))
        .select(col("d.*"))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          gateEpoch(batch, epoch, base, keepMicro = 300000L)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      s.read.parquet(s"$base/out")
        .select(col("epoch").cast("int").as("epoch"), col("n_kept"),
          col("n_tokens"), col("first_kept"), col("last_kept"),
          col("threshold_micro"))
        .orderBy("epoch")
    },

    // Per-dump admission funnel (td64): for each ingest epoch, how
    // much of the dump was content we already had — read from the
    // incremental pipeline's OWN stores (id ledger + min-merged hash
    // keepers, IncrementalCuration.dedupFunnel) at zero corpus
    // re-scans. The dumps arrive id-INTERLEAVED (doc_id % 3 → epoch),
    // so cross-epoch keeper re-elections fire and the report must
    // still equal the batch recompute (the global min-id keeper per
    // content hash, attributed to its arrival epoch) — td62's
    // per-source audit, turned per-dump and incremental.
    "td64_dedup_funnel" -> { (s, dir) =>
      val base = scratch("td64", dir)
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      (0 to 2).foreach { e =>
        graft.streaming.IncrementalCuration.processDedupEpoch(e.toLong,
          docs.where(pmod(col("doc_id"), lit(3)) === e),
          s"$base/st", "doc_id", "text")
      }
      graft.streaming.IncrementalCuration.dedupFunnel(s, s"$base/st")
        .orderBy("epoch")
    },

    // CODEC-REAL JPEG frame header (mm16): the family's first
    // DYNAMIC-offset container — JPEG's SOF0 frame header lands
    // wherever the variable-length APP0/COM/DQT segments before it
    // end, so the parse must WALK the segment list reading each
    // length from the container's actual bytes (JpegSof.sofOffset's
    // bounded aggregate fold; fixed-offset reads cannot parse JPEG).
    // Odd doc_ids carry an extra COM segment whose length varies with
    // the text, so SOF0's offset differs row to row and a
    // fixed-offset cheat would hash-mismatch immediately. The oracle
    // recomputes every field from the deterministic parameters;
    // JpegSofSpec additionally cross-checks the walker against
    // javax.imageio's REAL JPEG encoder output.
    "mm16_jpeg_sof_walk" -> { (s, dir) =>
      val params = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(8) + pmod(col("doc_id"), lit(120))).as("w"),
          (lit(6) + pmod(col("doc_id"), lit(90))).as("h"),
          (lit(1) + lit(2) * pmod(col("doc_id"), lit(2))).as("ncomp"),
          when(col("doc_id") % 2 === 1,
            lit(4) + pmod(length(col("text")), lit(60)))
            .otherwise(lit(0)).cast("long").as("comlen"))
      val blobs = params.withColumn("payload",
          JpegSof.jpegBytes(col("w"), col("h"), col("ncomp"),
            col("comlen")))
        .select(col("doc_id"), col("payload"))
      JpegSof.parseJpeg(blobs, col("payload"))
        .select(col("doc_id"), col("jpeg_ok"), col("width"),
          col("height"), col("precision").as("precision_bits"),
          col("n_components"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("doc_id")
    }
  )

  /** One epoch of the in-stream gate: score the batch (td60's
    * unique-word-ratio score in exact micros), persist its histogram
    * under `qh/epoch=e` (write-own-FIRST, then read strictly below e
    * — the replay-safe order: an epoch replay overwrites its own
    * histogram and never reads it back), recalibrate the threshold on
    * the merged histograms (epochs <= e, through the SAME
    * histThreshold arithmetic the batch gate uses), gate the batch,
    * and append the epoch's 1-row manifest to `out/epoch=e`
    * (idempotent overwrite). Nothing here scales past the batch: the
    * corpus is never re-read, and every calibration frame is bounded
    * by the score domain.
    */
  private def gateEpoch(batch: DataFrame, epoch: Long, base: String,
                        keepMicro: Long): Unit = {
    val s = batch.sparkSession
    val words = TextOps.words(col("text"))
    val scored = graft.Checkpoints.barrier(batch
      .select(col("doc_id"),
        size(words).cast("long").as("nw"),
        size(array_distinct(words)).cast("long").as("nu"))
      .where(col("nw") > 0)
      .withColumn("score_micro", expr("(nu * 1000000) DIV nw")))
    CurationOps.scoreHistogram(scored, "score_micro")
      .write.mode("overwrite").parquet(s"$base/qh/epoch=$epoch")
    val all = s.read.parquet(s"$base/qh")
      .where(col("epoch") <= epoch) // own epoch just landed; replays
      .select(col("s"), col("cnt")) // of later crashed epochs pruned
    val thr = CurationOps.histThreshold(all, keepMicro)
    scored.crossJoin(broadcast(thr)) // 1-row scalar frame
      .where(col("score_micro") >= col("threshold_micro"))
      .agg(count(lit(1)).as("n_kept"), sum(col("nw")).as("n_tokens"),
        min(col("doc_id")).as("first_kept"),
        max(col("doc_id")).as("last_kept"),
        max(col("threshold_micro")).as("threshold_micro"))
      .write.mode("overwrite").parquet(s"$base/out/epoch=$epoch")
  }

  override def oracleSql: Map[String, String] = Map(

    // Epoch slices reconstructed by row_number over the id-sorted
    // stream (td61's convention); each epoch's threshold is the td60
    // histogram rule over ALL docs with epoch' <= epoch (the
    // cumulative calibration), and the gate keeps that epoch's docs
    // at or above it — the batch recompute the merged-histogram
    // stream path must equal.
    "td63_streaming_quantile_gate" -> """
      WITH ord AS (SELECT doc_id, text,
              row_number() OVER (ORDER BY doc_id) AS rn,
              count(1) OVER () AS n
            FROM documents),
      ep AS (SELECT doc_id, text,
              CAST(least(2, (rn - 1) // ((n + 2) // 3)) AS INT) AS epoch
            FROM ord),
      sc AS (SELECT epoch, doc_id,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nw,
               CAST(len(list_distinct(string_split(lower(text), ' ')))
                 AS BIGINT) AS nu
             FROM ep),
      s2 AS (SELECT epoch, doc_id, nw, (nu * 1000000) // nw AS score_micro
             FROM sc WHERE nw > 0),
      h AS (SELECT epoch, score_micro AS sv, CAST(count(1) AS BIGINT) AS cnt
            FROM s2 GROUP BY 1, 2),
      eps AS (SELECT DISTINCT epoch FROM s2),
      ch AS (SELECT e.epoch, h.sv, CAST(sum(h.cnt) AS BIGINT) AS cnt
             FROM eps e JOIN h ON h.epoch <= e.epoch
             GROUP BY 1, 2),
      c AS (SELECT epoch, sv,
              CAST(sum(cnt) OVER (PARTITION BY epoch ORDER BY sv DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              CAST(sum(cnt) OVER (PARTITION BY epoch) AS BIGINT) AS total
            FROM ch),
      t AS (SELECT epoch, max(sv) AS threshold_micro FROM c
            WHERE cum >= greatest(1, (total // 1000000) * 300000
              + ((total % 1000000) * 300000) // 1000000)
            GROUP BY epoch)
      SELECT s2.epoch, CAST(count(1) AS BIGINT) AS n_kept,
             CAST(sum(nw) AS BIGINT) AS n_tokens,
             min(doc_id) AS first_kept, max(doc_id) AS last_kept,
             CAST(max(t.threshold_micro) AS BIGINT) AS threshold_micro
      FROM s2 JOIN t ON s2.epoch = t.epoch
      WHERE score_micro >= t.threshold_micro
      GROUP BY s2.epoch
      ORDER BY s2.epoch""",

    // The batch recompute of the funnel: global min-id keeper per
    // content hash (the exact-dup canonical election), attributed to
    // its arrival epoch (doc_id % 3 — the interleaved dump layout the
    // query feeds), per-epoch counts and exact-integer dup rate.
    "td64_dedup_funnel" -> """
      WITH dp AS (SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS epoch,
              doc_id = min(doc_id) OVER (PARTITION BY md5(lower(text)))
                AS canon
            FROM documents)
      SELECT epoch, CAST(count(1) AS BIGINT) AS n_ingested,
             CAST(sum(CASE WHEN canon THEN 1 ELSE 0 END) AS BIGINT)
               AS n_canonical,
             CAST(sum(CASE WHEN canon THEN 0 ELSE 1 END) AS BIGINT)
               AS n_exact_dup,
             CAST((sum(CASE WHEN canon THEN 0 ELSE 1 END) * 1000000)
               // count(1) AS BIGINT) AS exact_dup_micro
      FROM dp
      GROUP BY epoch
      ORDER BY epoch""",

    // Every field recomputed from the deterministic parameters; the
    // Spark side must walk the segment list through the container's
    // actual bytes to find SOF0 (its offset moves with the odd-id COM
    // segment). Container bytes: SOI 2 + APP0 18 + [COM comlen+4 on
    // odd ids] + DQT 69 + SOF0 (10 + 3*ncomp) + EOI 2.
    "mm16_jpeg_sof_walk" -> """
      WITH p AS (SELECT doc_id,
                   8 + doc_id % 120 AS w,
                   6 + doc_id % 90 AS h,
                   1 + 2 * (doc_id % 2) AS ncomp,
                   CASE WHEN doc_id % 2 = 1
                     THEN 4 + length(text) % 60 ELSE 0 END AS comlen
                 FROM documents)
      SELECT doc_id, TRUE AS jpeg_ok,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(8 AS BIGINT) AS precision_bits,
             CAST(ncomp AS BIGINT) AS n_components,
             CAST(101 + 3 * ncomp
               + CASE WHEN doc_id % 2 = 1 THEN comlen + 4 ELSE 0 END
               AS BIGINT) AS n_bytes
      FROM p ORDER BY doc_id"""
  )

  /** Deterministic scratch dir per (query, sf dir); wiped per seed —
    * LogParity's idiom.
    */
  private def scratch(name: String, dir: String): String = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft-cur-${name}_" + dir.replaceAll("[^A-Za-z0-9]", "_"))
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p)
        .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.delete(f))
    }
    p.toString
  }
}
