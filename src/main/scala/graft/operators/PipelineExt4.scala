package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 curation compositions: the end-to-end nightly curation
  * job as ONE DAG (td46) and the greedy novelty-ordered source
  * acquisition loop (td47) — built from the independently-oracled
  * stage operators in [[CurationOps]].
  */
object PipelineExt4 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // End-to-end curation pipeline (td46): lenient quality verdict
    // (C4 + langid agreement + exact-dup canonical as drop rules) →
    // soft-dedup sampling weights over survivors → deterministic
    // md5-gate weighted sample → 16-shard training manifest. The
    // query a real 100 TB curation job runs nightly; see
    // CurationOps.curationManifest for the fused-DAG scale anatomy.
    "td46_curation_pipeline" -> { (s, dir) =>
      CurationOps.curationManifest(Tables.load(s, dir, "documents"),
          "doc_id", "text", "lang")
        .orderBy("shard")
    },

    // Greedy novelty-ordered acquisition (td47): the sequential
    // version of td45's static novelty report — pick the source with
    // the most not-yet-covered grams, mark covered, re-rank, repeat
    // (5 picks). Greedy set cover over the gram-ownership-pattern
    // frame; see CurationOps.greedyAcquisition.
    "td47_greedy_acquisition" -> { (s, dir) =>
      CurationOps.greedyAcquisition(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source", 3, steps = 5)
        .orderBy("step")
    },

    // Context-window packing manifest (td48): concat-then-chunk into
    // 512-token training windows per shard, docs crossing boundaries
    // (the GPT/Megatron regime; td14 is the greedy-bin alternative).
    "td48_context_windows" -> { (s, dir) =>
      CurationOps.contextWindows(Tables.load(s, dir, "documents"),
          "doc_id", "text", window = 512L, nShards = 16)
        .orderBy("shard", "chunk_id")
    },

    // Corpus novelty-decay curve (td49): per ingest-stream decile, the
    // fraction of distinct (doc, gram) rows that are the gram's
    // globally first occurrence — diminishing-returns report.
    "td49_novelty_curve" -> { (s, dir) =>
      CurationOps.noveltyCurve(Tables.load(s, dir, "documents"),
          "doc_id", "text", 3, buckets = 10)
        .orderBy("decile")
    },

    // First-round BPE merge-pair statistics (td50): adjacent char
    // pairs weighted by word frequency, top-20 — the tokenizer-
    // induction step; see CurationOps.bpePairStats for why the pair
    // explode runs on the distinct-word frame, not the token stream.
    "td50_bpe_pairs" -> { (s, dir) =>
      CurationOps.bpePairStats(Tables.load(s, dir, "documents"), "text", 20)
    },

    // Padding-efficiency report (td51): per shard, padded-token cost
    // of ingest-order vs length-sorted batching at batch size 32 —
    // the "should the loader length-bucket" decision, quantified.
    "td51_padding_efficiency" -> { (s, dir) =>
      CurationOps.paddingEfficiency(Tables.load(s, dir, "documents"),
          "doc_id", "text", batch = 32, nShards = 16)
        .orderBy("shard")
    },

    // k-round batched BPE learning (td52): the merge table a tokenizer
    // ships — 8 rounds × up to 4 non-overlapping merges per round
    // (20+ merges in 8 Spark jobs; one job per merge is the regime
    // boundary the batching removes). See CurationOps.bpeLearn for
    // the wrapped-symbol replace trick and the conservative
    // non-overlap rule that keeps batched semantics oracle-exact.
    "td52_bpe_learn" -> { (s, dir) =>
      CurationOps.bpeLearn(Tables.load(s, dir, "documents"), "text",
          BpeRounds, BpeBatch)
        .orderBy("step")
    },

    // Seeded epoch-shuffle manifest (td53): sort-free per-epoch
    // corpus permutation, validated shard-by-shard.
    "td53_epoch_shuffle" -> { (s, dir) =>
      CurationOps.epochShuffle(Tables.load(s, dir, "documents"),
          "doc_id", "text", "ep1", nShards = 16)
        .orderBy("shard")
    },

    // BPE tokenization accounting (td54): apply td52's learned merges
    // back to the corpus and report the compression — the learn →
    // apply → account loop that picks a vocabulary size.
    "td54_bpe_apply" -> { (s, dir) =>
      CurationOps.bpeApplyStats(Tables.load(s, dir, "documents"), "text",
        BpeRounds, BpeBatch)
    },

    // Tokenizer-equity report (td55): the global BPE merge table's
    // compression per source — the fairness check before shipping a
    // tokenizer learned on a pooled corpus.
    "td55_tokenizer_equity" -> { (s, dir) =>
      CurationOps.tokenizerEquity(Tables.load(s, dir, "documents"),
          "text", "source", BpeRounds, BpeBatch)
        .orderBy("source")
    },

    // Streaming/incremental curation (td56): td46's continuous twin —
    // the corpus arrives as ~3 admission-controlled micro-batches
    // through a doc_id-ordered graft-log (the in-order ingest-stream
    // regime), each epoch updates the persisted curation state
    // (min-id keeper hash store, td31's band+shingle LSH indexes,
    // append-only pair store, retraction list, kfk06-shaped upsert
    // manifest state) via IncrementalCuration.processEpoch, and the
    // merge-on-read manifest must equal the batch pipeline's — the
    // oracle IS td46's, verbatim.
    "td56_incremental_curation" -> { (s, dir) =>
      incrementalCuration(s, dir, "td56", asc("doc_id"))
    },

    // OUT-OF-ORDER incremental curation (td58): the same pipeline fed
    // the corpus in doc_id-DESCENDING order — every exact-dup group
    // spanning an epoch boundary now sees its larger id FIRST, so the
    // stored keeper must be retracted (-D through the upsert state,
    // masked out of the LSH indexes) and the smaller id re-elected
    // when it lands, the reference's retract pattern
    // (RowTimeDeduplicateFunction UPDATE_BEFORE emission) applied to
    // the whole curation DAG. Late dumps and multi-source interleave
    // are the NORMAL shape of real ingestion; the manifest must still
    // converge to the batch pipeline's — the oracle IS td46's,
    // verbatim, same as td56.
    "td58_ooo_incremental_curation" -> { (s, dir) =>
      incrementalCuration(s, dir, "td58", desc("doc_id"))
    },

    // Embedding-distribution drift (te33): per-dimension L1 drift
    // between two embedding snapshots (fixed [-1,1] bucket shares in
    // exact micros) — the "did the new encoder move the space" gate a
    // re-embedding run must pass before its vectors mix into a
    // serving index. See DriftOps.embeddingDrift.
    "te33_embedding_drift" -> { (s, dir) =>
      DriftOps.embeddingDrift(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", col("vec_id") % 2 === 1)
    },

    // Per-source dedup audit (td62): the data-vendor procurement
    // report — per source, how much of what it ships is exact-dup
    // (non-canonical copies of content seen anywhere in the pool) and
    // how much of its canonical content is near-dup entangled with
    // the rest of the corpus. Composes the already-oracled exact-dup
    // canonicalization and banded-LSH pair mining, adding only the
    // source rollup; rates in exact micros through the shared
    // microRatio (ANSI-safe at vendor-scale counts). Scale anatomy:
    // the corpus is scanned once for hashing, once for shingling the
    // canonical slice; the pair graph stays duplicated-slice-sized.
    "td62_source_dedup_audit" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val dup = TextOps.exactDupCanonical(docs, "doc_id", "text")
      val flagged = docs.join(dup, "doc_id")
      val canon = flagged.where(col("r_dup"))
      val pairs = TextOps.minhashLshPairsIdx(
          TextOps.shingleHashIndex(canon, "doc_id", "text", 3), 0.8)
        .select(col("id_a"), col("id_b"))
      val members = pairs.select(col("id_a").as("doc_id"))
        .union(pairs.select(col("id_b").as("doc_id"))).distinct()
      flagged
        .join(members.withColumn("near", lit(true)), Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(!col("r_dup"), 1L).otherwise(0L)).as("n_exact_dup"),
          sum(when(col("r_dup") && col("near"), 1L).otherwise(0L))
            .as("n_neardup"))
        .withColumn("exact_dup_micro",
          CurationOps.microRatio("n_exact_dup", "n_docs"))
        .withColumn("neardup_micro",
          CurationOps.microRatio("n_neardup", "n_docs"))
        .orderBy("source")
    },

    // Streaming epoch drift monitor (td61): the "did this dump move
    // the corpus" gate RUN WHERE IT RUNS IN PRODUCTION — inside the
    // ingest stream. Each micro-batch epoch's fixed-size feature
    // count frame is persisted as it is admitted (one scan of the
    // batch, the td59 write helper); the report then gates every
    // later epoch against epoch 0's stored baseline at zero
    // reference-side scans — ALL epochs in one grouped plan
    // (DriftOps.driftVsBaselineByEpoch), not a driver loop unioning
    // one sub-plan per epoch, so a year of daily dumps reports at
    // flat per-epoch cost. Epoch membership is deterministic (the
    // id-sorted log + the admission cap), so the DuckDB oracle can
    // reconstruct the exact per-epoch slices with a row_number.
    "td61_epoch_drift_monitor" -> { (s, dir) =>
      val base = scratch("td61", dir)
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
          DriftOps.corpusFeatureCounts(batch, "doc_id", "text", "lang")
            .write.mode("overwrite").parquet(s"$base/fc/epoch=$epoch")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      val fc = s.read.parquet(s"$base/fc")
      DriftOps.driftVsBaselineByEpoch(
          fc.where(col("epoch") > 0)
            .select(col("epoch").cast("int").as("epoch"), col("feature"),
              col("bucket"), col("n")),
          fc.where(col("epoch") === 0).drop("epoch"))
        .select(col("epoch"), col("feature"), col("n_buckets"),
          col("l1_micro"), col("top_bucket"), col("top_shift_micro"))
        .orderBy("epoch", "feature")
    },

    // Histogram-exact quantile quality gate (td60): keep the global
    // top-30% of the corpus by an integer-micros quality score (the
    // unique-word ratio — the exact stand-in for a classifier score)
    // WITHOUT sorting the corpus: the threshold comes from a
    // score-value histogram bounded by the score DOMAIN, ties at the
    // threshold included by rule on both engines. The calibration
    // step behind every "keep the top q% by quality" filter.
    "td60_quantile_gate" -> { (s, dir) =>
      val words = TextOps.words(col("text"))
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(words).cast("long").as("nw"),
          size(array_distinct(words)).cast("long").as("nu"))
        .where(col("nw") > 0)
        .withColumn("score_micro", expr("(nu * 1000000) DIV nw"))
      CurationOps.quantileGate(scored, "score_micro", keepMicro = 300000L)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("nw")).as("n_tokens"),
          min(col("doc_id")).as("first_kept"),
          max(col("threshold_micro")).as("threshold_micro"))
        .orderBy("lang")
    },

    // Persisted-baseline EMBEDDING drift gate (te34): td59's sibling
    // for re-embedding runs — the blessed encoder's dims×buckets
    // count frame is written once, and the gate compares today's
    // vectors against the stored frame at zero reference-side scans.
    // The oracle IS te33's, verbatim: baseline = even vec_ids, live =
    // odd.
    "te34_embedding_drift_baseline" -> { (s, dir) =>
      val base = scratch("te34", dir)
      val vecs = Tables.load(s, dir, "embeddings")
      DriftOps.embeddingBucketCounts(vecs.where(col("vec_id") % 2 === 0),
          "vec_id", "embedding")
        .write.parquet(s"$base/baseline") // the once-per-blessing write
      val live = DriftOps.embeddingBucketCounts(
        vecs.where(col("vec_id") % 2 === 1), "vec_id", "embedding")
      DriftOps.embeddingDriftVsBaseline(live,
        s.read.parquet(s"$base/baseline"))
    },

    // Corpus-feature drift (td57): token-length / stopword-share /
    // language bucket shares compared across two document snapshots —
    // the "did the new dump change the corpus" gate upstream of td46.
    "td57_corpus_drift" -> { (s, dir) =>
      DriftOps.corpusDrift(Tables.load(s, dir, "documents"),
        "doc_id", "text", "lang", col("doc_id") % 2 === 1)
    },

    // CODEC-REAL multimodal (mm13): a real PCM WAV container is
    // synthesized per doc (params derived deterministically from
    // doc_id/text so the oracle can recompute them — stands in for
    // the upstream system that produced the media bytes, mm01's
    // convention), and every reported field is then PARSED BACK from
    // the container's actual bytes at their fixed offsets with
    // codegen'd expressions (hex/substring/conv — no UDF). The oracle
    // computes the fields from the parameters directly, so any parse
    // (or synthesis) bug hash-mismatches. RiffWavSpec additionally
    // cross-checks the parse against javax.sound's real WAV codec.
    // Persisted-baseline drift gate (td59): the PRODUCTION monitoring
    // shape — td57 compares two live snapshots (re-scanning the
    // reference every run); here the blessed snapshot's fixed-size
    // (features × buckets) count frame is WRITTEN ONCE, and the gate
    // compares today's scan against the stored frame, so the
    // reference side costs zero corpus scans per run. Same output
    // arithmetic as td57 (the oracle IS td57's, verbatim): baseline =
    // even doc_ids, live = odd.
    "td59_drift_vs_baseline" -> { (s, dir) =>
      val base = scratch("td59", dir)
      val docs = Tables.load(s, dir, "documents")
      DriftOps.corpusFeatureCounts(docs.where(col("doc_id") % 2 === 0),
          "doc_id", "text", "lang")
        .write.parquet(s"$base/baseline") // the once-per-blessing write
      val live = DriftOps.corpusFeatureCounts(
        docs.where(col("doc_id") % 2 === 1), "doc_id", "text", "lang")
      DriftOps.driftVsBaseline(live, s.read.parquet(s"$base/baseline"))
    },

    // CODEC-REAL image gate (mm14): a real PNG container (signature,
    // spec-valid IHDR with its true CRC-32, filler IDAT, IEND) is
    // synthesized per doc from deterministic parameters (mm13's
    // convention — stands in for the upstream system that produced
    // the media bytes), then the LAION-style quality gate (Schuhmann
    // et al. 2022: min resolution, aspect bounds, min bytes) runs on
    // dimensions PARSED BACK from the container's actual big-endian
    // header bytes, with the CRC recomputed from those bytes. The
    // oracle computes the fields from the parameters directly, so any
    // parse (or synthesis) bug hash-mismatches; PngIhdrSpec
    // additionally cross-checks the parse against javax.imageio's
    // real PNG encoder. Pure map-side projection, zero shuffle —
    // the header-sniff manifest pass over millions of blobs.
    "mm14_png_ihdr_gate" -> { (s, dir) =>
      val params = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(8) + pmod(col("doc_id"), lit(24))).as("w"),
          (lit(6) + pmod(col("doc_id"), lit(18))).as("h"),
          (lit(2) + lit(4) * pmod(col("doc_id"), lit(2))).as("ctype"),
          (lit(100) + pmod(length(col("text")), lit(300)))
            .cast("long").as("ilen"))
      val blobs = params
        .withColumn("payload", PngIhdr.pngBytes(col("w"), col("h"),
          lit(8L), col("ctype"), col("ilen")))
        .select(col("doc_id"), col("payload"))
      PngIhdr.parsePng(blobs, col("payload"))
        .select(col("doc_id"), col("png_ok"), col("crc_ok"),
          col("width"), col("height"), col("bit_depth"),
          col("color_type"),
          length(col("payload")).cast("long").as("n_bytes"))
        .withColumn("r_minres", col("width") * col("height") >= 200)
        .withColumn("r_aspect", col("width") <= col("height") * 2 &&
          col("height") <= col("width") * 2)
        .withColumn("r_minbytes", col("n_bytes") >= 200)
        .withColumn("keep", col("png_ok") && col("crc_ok") &&
          col("r_minres") && col("r_aspect") && col("r_minbytes"))
        .orderBy("doc_id")
    },

    // Heterogeneous container dispatch (mm15): a REAL media lake's
    // blob column is mixed — this one carries WAV containers on even
    // doc_ids and PNG on odd — and the manifest pass must sniff the
    // magic bytes and dispatch to the right header parser, emitting
    // one unified metadata row per blob (audio fields NULL for
    // images and vice versa). Every branch reads the container's
    // actual bytes (mm13/mm14's codegen'd readers); the CASE gates
    // evaluate lazily per row, so a PNG blob never runs the WAV
    // arithmetic (whose DIV would be garbage-fed). Pure map-side
    // projection, zero shuffle.
    "mm15_container_dispatch" -> { (s, dir) =>
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(1) + pmod(col("doc_id"), lit(2))).as("ch"),
          (lit(8000) + pmod(col("doc_id"), lit(5)) * 4000).as("rate"),
          (lit(50) + pmod(length(col("text")), lit(200))).as("frames"),
          (lit(8) + pmod(col("doc_id"), lit(24))).as("w"),
          (lit(6) + pmod(col("doc_id"), lit(18))).as("h"),
          (lit(100) + pmod(length(col("text")), lit(300)))
            .cast("long").as("ilen"))
      val blobs = base.select(col("doc_id"),
        when(col("doc_id") % 2 === 0,
          RiffWav.wavBytes(col("ch"), col("rate"), lit(16), col("frames")))
        .otherwise(
          PngIhdr.pngBytes(col("w"), col("h"), lit(8L), lit(2L),
            col("ilen"))).as("payload"))
      val bin = col("payload")
      val isWav = RiffWav.tag(bin, 1, 4) === "RIFF" &&
        RiffWav.tag(bin, 9, 4) === "WAVE"
      val isPng = lower(hex(substring(bin, 1, 8))) === "89504e470d0a1a0a"
      blobs
        .withColumn("kind",
          when(isWav, "wav").when(isPng, "png").otherwise("unknown"))
        .withColumn("media_ok",
          when(isWav,
            RiffWav.tag(bin, 13, 4) === "fmt " &&
              RiffWav.tag(bin, 37, 4) === "data" &&
              RiffWav.leLong(bin, 21, 2) === 1L)
          .when(isPng,
            PngIhdr.beLong(bin, 9, 4) === 13L &&
              PngIhdr.beLong(bin, 30, 4) === crc32(substring(bin, 13, 17)))
          .otherwise(lit(false)))
        .withColumn("channels", when(isWav, RiffWav.leLong(bin, 23, 2)))
        .withColumn("sample_rate", when(isWav, RiffWav.leLong(bin, 25, 4)))
        // frames = data_size DIV block_align; duration = frames·1e6
        // DIV rate — floor-of-double is exact at header magnitudes
        .withColumn("duration_micros", when(isWav,
          floor(floor(RiffWav.leLong(bin, 41, 4) /
              RiffWav.leLong(bin, 33, 2)) * 1000000L /
            RiffWav.leLong(bin, 25, 4)).cast("long")))
        .withColumn("width", when(isPng, PngIhdr.beLong(bin, 17, 4)))
        .withColumn("height", when(isPng, PngIhdr.beLong(bin, 21, 4)))
        .withColumn("bit_depth", when(isPng, PngIhdr.beLong(bin, 25, 1)))
        .select(col("doc_id"), col("kind"), col("media_ok"),
          length(col("payload")).cast("long").as("n_bytes"),
          col("channels"), col("sample_rate"), col("duration_micros"),
          col("width"), col("height"), col("bit_depth"))
        .orderBy("doc_id")
    },

    "mm13_wav_riff_parse" -> { (s, dir) =>
      val params = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (lit(1) + pmod(col("doc_id"), lit(2))).as("ch"),
          (lit(8000) + pmod(col("doc_id"), lit(5)) * 4000).as("rate"),
          (lit(8) * (lit(1) + pmod(length(col("text")), lit(2)))).as("pbits"),
          (lit(50) + pmod(length(col("text")), lit(200))).as("frames"))
      val blobs = params
        .withColumn("payload",
          RiffWav.wavBytes(col("ch"), col("rate"), col("pbits"),
            col("frames")))
        .select(col("doc_id"), col("payload"))
      RiffWav.parseWav(blobs, col("payload"))
        .select(col("doc_id"), col("riff_ok"),
          col("channels"), col("sample_rate"), col("bits"),
          col("block_align"), col("byte_rate"), col("data_size"),
          col("n_frames"), col("duration_micros"),
          length(col("payload")).cast("long").as("n_bytes"))
        .orderBy("doc_id")
    }
  )

  /** The shared td56/td58 runner: write the documents table to a
    * single-partition graft-log in `order`, stream it back through
    * ~3 admission-controlled micro-batch epochs into
    * IncrementalCuration.processEpoch, and read the merge-on-read
    * manifest.
    */
  private def incrementalCuration(s: SparkSession, dir: String,
      name: String, order: org.apache.spark.sql.Column): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val base = scratch(name, dir)
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val n = docs.count()
    graft.sources.LogSource.write(
      docs.withColumn("partition", lit(0))
        .repartition(1).sortWithinPartitions(order)
        .select(col("partition"),
          to_json(struct(col("doc_id"), col("text"), col("lang")))
            .as("value")),
      s"$base/log")
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val src = s.readStream.format("graft-log")
      .option("path", s"$base/log")
      // ~3 epochs at any SF: per-epoch fixed costs (component
      // relabel, store reads) are paid a constant number of times
      // while the multi-epoch incremental path stays exercised
      // (mid-stream restart is IncrementalCurationSpec's job)
      .option("maxRecordsPerTrigger", math.max(1L, (n + 2) / 3).toString)
      .load()
    // Per-epoch frames are batch-sized (1/3 corpus) and most of the
    // pipeline's exchanges collapse to dup-slice/id frames — size
    // the shuffle to the epoch, not the suite default (kfk04's
    // stateful-shuffle rationale; conf binds per batch action, so
    // the foreachBatch bodies inherit it).
    val prevP = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      val q = src
        .select(from_json(col("value"), docSchema).as("d"))
        .select(col("d.*"))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          graft.streaming.IncrementalCuration.processEpoch(
            epoch, batch, s"$base/st", "doc_id", "text", "lang")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", prevP)
    graft.streaming.IncrementalCuration.manifest(s, s"$base/st")
      .orderBy("shard")
  }

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

  /** The 3-gram shingle CTE shared by both oracles (same construction
    * as TextPipelineSuite's).
    */
  private val shingleCte = """
    w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    g AS (SELECT doc_id,
            CASE WHEN len(words) >= 3
              THEN list_distinct(list_transform(range(1, len(words) - 1),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
              ELSE [] END AS shingles
          FROM w)"""

  /** One greedy layer of the td47 oracle: candidates = unselected
    * sources with their uncovered-gram counts (0 when fully covered),
    * pick = argmax (marginal DESC, source ASC), then extend the
    * selected set and the covered-gram set. NOT EXISTS (never NOT IN:
    * NOT IN's NULL semantics force DuckDB into a mark join — measured
    * unboundedly slow on the sf0.1 gram counts; NOT EXISTS compiles to
    * a hash anti join).
    */
  private def greedyLayer(i: Int): String = {
    val p = i - 1
    s"""
      cand$i AS MATERIALIZED (SELECT s.source, coalesce(m.cnt, 0) AS marginal
                 FROM (SELECT source FROM srcs ss
                       WHERE NOT EXISTS (SELECT 1 FROM sel$p x
                                         WHERE x.source = ss.source)) s
                 LEFT JOIN (SELECT source, CAST(count(1) AS BIGINT) AS cnt
                            FROM sg
                            WHERE NOT EXISTS (SELECT 1 FROM cov$p c
                                              WHERE c.sh = sg.sh)
                              AND NOT EXISTS (SELECT 1 FROM sel$p x
                                              WHERE x.source = sg.source)
                            GROUP BY 1) m USING (source)),
      pick$i AS MATERIALIZED (SELECT $i AS step, source, marginal FROM cand$i
                 ORDER BY marginal DESC, source LIMIT 1),
      sel$i AS MATERIALIZED (SELECT source FROM sel$p
                UNION ALL SELECT source FROM pick$i),
      cov$i AS MATERIALIZED (SELECT DISTINCT sh FROM sg
                WHERE EXISTS (SELECT 1 FROM sel$i x
                              WHERE x.source = sg.source))"""
  }

  /** Verdict (3 enforced rules) → kept docs → exact-Jaccard pairs →
    * transitive closure → cluster sizes → inverse-size weights →
    * md5 micro-gate → shard manifest. Every stage is the already-
    * oracled td41/td43/td16/td44/td13/td39 logic, chained. Shared by
    * td46 (batch), td56 (in-order incremental) and td58 (out-of-order
    * incremental) — all three paths must converge on the same
    * manifest.
    */
  private val curationOracle = """
      WITH RECURSIVE
      w0 AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
             FROM documents),
      wa AS (SELECT doc_id, string_split(lower(text), ' ') AS wds
             FROM documents),
      c AS (SELECT doc_id, wds[i*10+1 : i*10+10] AS cw
            FROM wa, LATERAL (SELECT unnest(range(0,
              CAST(ceil(len(wds) / 10.0) AS INT))) AS i)),
      k AS (SELECT doc_id,
              (NOT list_contains(cw, 'dup')
                AND len(list_filter(cw, x -> x = 'a' OR x = 'the')) <= 2
                AND len(cw) >= 5) AS kept
            FROM c),
      c4 AS (SELECT doc_id,
               sum(CASE WHEN kept THEN 1 ELSE 0 END) >= 3 AS r_c4
             FROM k GROUP BY 1),
      ls AS (SELECT doc_id,
               sum(CASE WHEN w IN ('the','a','of','and','to')
                 THEN 1 ELSE 0 END) AS s_en,
               sum(CASE WHEN w IN ('der','die','das','und','ist')
                 THEN 1 ELSE 0 END) AS s_de,
               sum(CASE WHEN w IN ('le','la','et','les','des')
                 THEN 1 ELSE 0 END) AS s_fr,
               sum(CASE WHEN w IN ('el','los','las','y','es')
                 THEN 1 ELSE 0 END) AS s_es
             FROM w0 GROUP BY 1),
      lg AS (SELECT d.doc_id,
               (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                       THEN 'en'
                     WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                     WHEN s_fr >= s_es THEN 'fr'
                     ELSE 'es' END) = d.lang AS r_lang
             FROM documents d JOIN ls ON d.doc_id = ls.doc_id),
      dp AS (SELECT doc_id, doc_id = min(doc_id) OVER (
               PARTITION BY md5(lower(text))) AS r_dup
             FROM documents),
      kept_docs AS (SELECT d.* FROM documents d
                    JOIN c4 USING (doc_id) JOIN lg USING (doc_id)
                    JOIN dp USING (doc_id)
                    WHERE r_c4 AND r_lang AND r_dup),
      w2 AS (SELECT doc_id, string_split(lower(text), ' ') AS words
             FROM kept_docs),
      g2 AS (SELECT doc_id,
               CASE WHEN len(words) >= 3
                 THEN list_distinct(list_transform(range(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                 ELSE [] END AS shingles
             FROM w2),
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g2),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g2),
      inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                GROUP BY 1, 2),
      pairs AS (SELECT id_a, id_b FROM inter
                JOIN sizes sa ON id_a = sa.id
                JOIN sizes sb ON id_b = sb.id
                WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
      reach(a, b) AS (SELECT a, b FROM edges
                      UNION
                      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
      rep AS (SELECT d.doc_id AS id,
                     least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS rep_id
              FROM kept_docs d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id),
      cs AS (SELECT rep_id, count(1) AS cluster_size FROM rep GROUP BY 1),
      wts AS (SELECT id, CAST(1000000 // cluster_size AS BIGINT) AS w_micro
              FROM rep JOIN cs ON rep.rep_id = cs.rep_id),
      sampled AS (SELECT id FROM wts
                  WHERE list_reduce(list_transform(range(1, 16),
                          i -> CAST(strpos('0123456789abcdef',
                                 substr(md5(CAST(id AS VARCHAR)), i, 1)) - 1
                               AS BIGINT)),
                        (a, b) -> a * 16 + b) % 1000000 < w_micro)
      SELECT CAST((doc_id * 2654435761) % 1000000007 % 16 AS INT) AS shard,
             count(1) AS n_docs,
             CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
             CAST(sum(length(text)) AS BIGINT) AS n_chars,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM kept_docs JOIN sampled ON doc_id = id
      GROUP BY 1
      ORDER BY shard"""

  /** te33's per-dimension share/L1/top-bucket drift report over the
    * even/odd vec_id split — exact integers all the way (the
    * parallel-unnest zip is te19's oracle idiom). Shared by te33 (two
    * live snapshots) and te34 (live vs persisted baseline): the two
    * paths must produce the numerically identical report.
    */
  private val embeddingDriftOracle = """
      WITH e AS (SELECT vec_id, vec_id % 2 = 1 AS b,
                   CAST(unnest(range(0, 64)) AS INT) AS d,
                   unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
                 FROM embeddings),
      bk AS (SELECT d, b,
               least(9, greatest(0, CAST(floor((x + 1.0) / 2.0 * 10) AS INT)))
                 AS bkt
             FROM e),
      cnt AS (SELECT d, bkt,
                sum(CASE WHEN b THEN 0 ELSE 1 END) AS n_a,
                sum(CASE WHEN b THEN 1 ELSE 0 END) AS n_b
              FROM bk GROUP BY 1, 2),
      tot AS (SELECT sum(CASE WHEN vec_id % 2 = 1 THEN 0 ELSE 1 END) AS tot_a,
                     sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS tot_b
              FROM embeddings),
      sh AS (SELECT d, bkt,
               abs((n_a * 1000000) // tot_a - (n_b * 1000000) // tot_b)
                 AS shift
             FROM cnt CROSS JOIN tot),
      top AS (SELECT d, bkt, shift,
                row_number() OVER (PARTITION BY d ORDER BY shift DESC, bkt)
                  AS rk
              FROM sh)
      SELECT d, CAST(sum(shift) AS BIGINT) AS l1_micro,
             CAST(max(CASE WHEN rk = 1 THEN bkt END) AS INT) AS top_bucket,
             CAST(max(CASE WHEN rk = 1 THEN shift END) AS BIGINT)
               AS top_shift_micro
      FROM top
      GROUP BY d
      ORDER BY l1_micro DESC, d"""

  /** td57's share/L1/top-bucket drift report over the even/odd doc_id
    * split — exact integers all the way. Shared by td57 (two live
    * snapshots) and td59 (live vs persisted baseline): the two paths
    * must produce the numerically identical report.
    */
  private val corpusDriftOracle = """
      WITH base AS (SELECT doc_id % 2 = 1 AS b,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
               coalesce(lang, '__null') AS lang
             FROM documents),
      b2 AS (SELECT *, (n_stop * 1000000) // nt AS stop_micro
             FROM base WHERE nt > 0),
      f AS (SELECT b, 'len' AS feature,
              CAST(least(9, nt // 20) AS VARCHAR) AS bucket FROM b2
            UNION ALL SELECT b, 'stop_ratio',
              CAST(least(9, stop_micro // 100000) AS VARCHAR) FROM b2
            UNION ALL SELECT b, 'lang', lang FROM b2),
      cnt AS (SELECT feature, bucket,
                sum(CASE WHEN b THEN 0 ELSE 1 END) AS n_a,
                sum(CASE WHEN b THEN 1 ELSE 0 END) AS n_b
              FROM f GROUP BY 1, 2),
      tot AS (SELECT sum(CASE WHEN b THEN 0 ELSE 1 END) AS tot_a,
                     sum(CASE WHEN b THEN 1 ELSE 0 END) AS tot_b
              FROM b2),
      sh AS (SELECT feature, bucket,
               abs((n_a * 1000000) // tot_a - (n_b * 1000000) // tot_b)
                 AS shift
             FROM cnt CROSS JOIN tot),
      top AS (SELECT feature, bucket, shift,
                row_number() OVER (PARTITION BY feature
                  ORDER BY shift DESC, bucket) AS rk
              FROM sh)
      SELECT feature, CAST(count(1) AS BIGINT) AS n_buckets,
             CAST(sum(shift) AS BIGINT) AS l1_micro,
             max(CASE WHEN rk = 1 THEN bucket END) AS top_bucket,
             CAST(max(CASE WHEN rk = 1 THEN shift END) AS BIGINT)
               AS top_shift_micro
      FROM top
      GROUP BY feature
      ORDER BY feature"""

  override def oracleSql: Map[String, String] = Map(

    // Verdict (3 enforced rules) → kept docs → exact-Jaccard pairs →
    // transitive closure → cluster sizes → inverse-size weights →
    // md5 micro-gate → shard manifest. Every stage is the already-
    // oracled td41/td43/td16/td44/td13/td39 logic, chained.
    "td46_curation_pipeline" -> curationOracle,

    // td56 (in-order) and td58 (id-descending) produce the identical
    // manifest through the incremental path, so their oracle IS the
    // batch pipeline's, verbatim.
    "td56_incremental_curation" -> curationOracle,
    "td58_ooo_incremental_curation" -> curationOracle,

    // 5 unrolled greedy layers over the distinct (source, gram)
    // index; cum_grams via a running sum over the picks.
    "td47_greedy_acquisition" -> s"""
      WITH $shingleCte,
      sg AS MATERIALIZED (SELECT DISTINCT d.source AS source, e.sh
             FROM (SELECT doc_id, unnest(shingles) AS sh FROM g) e
             JOIN documents d ON e.doc_id = d.doc_id),
      srcs AS MATERIALIZED (SELECT DISTINCT source FROM sg),
      sel0 AS (SELECT CAST(NULL AS VARCHAR) AS source WHERE 1 = 0),
      cov0 AS (SELECT CAST(NULL AS VARCHAR) AS sh WHERE 1 = 0),
      ${greedyLayer(1)}, ${greedyLayer(2)}, ${greedyLayer(3)},
      ${greedyLayer(4)}, ${greedyLayer(5)},
      all_picks AS (SELECT * FROM pick1 UNION ALL SELECT * FROM pick2
                    UNION ALL SELECT * FROM pick3
                    UNION ALL SELECT * FROM pick4
                    UNION ALL SELECT * FROM pick5)
      SELECT CAST(step AS INT) AS step, source,
             CAST(marginal AS BIGINT) AS marginal_grams,
             CAST(sum(marginal) OVER (ORDER BY step) AS BIGINT) AS cum_grams
      FROM all_picks
      ORDER BY step""",

    // Cumulative token sums per shard, chunk range per doc via
    // range() (upper-exclusive), overlap length in exact integers.
    "td48_context_windows" -> """
      WITH t AS (SELECT doc_id AS id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
                   CAST((doc_id * 2654435761) % 1000000007 % 16 AS INT) AS shard
                 FROM documents),
      c AS (SELECT *, sum(nt) OVER (PARTITION BY shard ORDER BY id) - nt
                      AS cum_before
            FROM t WHERE nt > 0),
      x AS (SELECT shard, id, nt, cum_before,
              unnest(range(CAST(cum_before // 512 AS BIGINT),
                           CAST((cum_before + nt - 1) // 512 + 1 AS BIGINT)))
                AS chunk_id
            FROM c)
      SELECT shard, CAST(chunk_id AS BIGINT) AS chunk_id,
             count(1) AS n_docs,
             CAST(sum(CASE WHEN cum_before >= chunk_id * 512
               THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
             min(id) AS first_doc, max(id) AS last_doc,
             CAST(sum(least((chunk_id + 1) * 512, cum_before + nt)
                      - greatest(chunk_id * 512, cum_before)) AS BIGINT)
               AS n_tokens
      FROM x
      GROUP BY 1, 2
      ORDER BY shard, chunk_id""",

    // First occurrence = min doc_id per gram; decile from id value
    // against max(doc_id) (stream position = id convention).
    "td49_novelty_curve" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      f AS (SELECT sh, min(doc_id) AS first_id FROM e GROUP BY 1),
      mx AS (SELECT max(doc_id) AS max_id FROM documents),
      d AS (SELECT e.doc_id, f.first_id,
              CAST(least(9, e.doc_id * 10 // (max_id + 1)) AS INT) AS decile
            FROM e JOIN f USING (sh) CROSS JOIN mx)
      SELECT decile, CAST(count(1) AS BIGINT) AS n_pairs,
             CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_novel,
             CAST(sum(CASE WHEN first_id = doc_id THEN 1 ELSE 0 END)
               * 1000000 // count(1) AS BIGINT) AS novel_micro
      FROM d
      GROUP BY 1
      ORDER BY decile""",

    // Pair counts from the distinct-word frequency frame, exactly the
    // Spark shape: freq-weighted adjacent char pairs, top-20.
    "td50_bpe_pairs" -> """
      WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                   FROM documents),
      wf AS (SELECT w, count(1) AS freq FROM tok WHERE len(w) >= 2
             GROUP BY w),
      p AS (SELECT w, freq, CAST(unnest(range(1, len(w))) AS INT) AS i
            FROM wf),
      pr AS (SELECT w, freq,
               substring(w, i, 1) || substring(w, i + 1, 1) AS pair
             FROM p)
      SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt,
             CAST(count(DISTINCT w) AS BIGINT) AS n_words
      FROM pr
      GROUP BY pair
      ORDER BY cnt DESC, pair
      LIMIT 20""",

    "td51_padding_efficiency" -> """
      WITH t AS (SELECT doc_id AS id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
                   CAST((doc_id * 2654435761) % 1000000007 % 16 AS INT) AS shard
                 FROM documents),
      s AS (SELECT * FROM t WHERE nt > 0),
      n AS (SELECT shard, nt,
              (row_number() OVER (PARTITION BY shard ORDER BY id) - 1) // 32 AS b
            FROM s),
      nb AS (SELECT shard, b, max(nt) AS mx, count(1) AS c, sum(nt) AS st
             FROM n GROUP BY 1, 2),
      na AS (SELECT shard, CAST(sum(mx * c) AS BIGINT) AS naive_padded,
               CAST(sum(st) AS BIGINT) AS n_tokens,
               CAST(sum(c) AS BIGINT) AS n_docs
             FROM nb GROUP BY 1),
      o AS (SELECT shard, nt,
              (row_number() OVER (PARTITION BY shard ORDER BY nt, id) - 1) // 32 AS b
            FROM s),
      ob AS (SELECT shard, b, max(nt) AS mx, count(1) AS c
             FROM o GROUP BY 1, 2),
      oa AS (SELECT shard, CAST(sum(mx * c) AS BIGINT) AS sorted_padded
             FROM ob GROUP BY 1)
      SELECT na.shard, n_docs, n_tokens, naive_padded, sorted_padded,
             (naive_padded - sorted_padded) * 1000000 // naive_padded
               AS saved_micro
      FROM na JOIN oa ON na.shard = oa.shard
      ORDER BY na.shard""",

    // Unrolled batched BPE rounds, MATERIALIZED like td47's greedy
    // layers; step = global (round, rank) order over the accepted
    // merges.
    "td52_bpe_learn" -> s"""
      WITH $bpeCte,
      all_m AS (${(1 to BpeRounds)
        .map(i => s"SELECT $i AS rnd, ark, pa, pb, cnt FROM s$i")
        .mkString("\n            UNION ALL ")})
      SELECT CAST(row_number() OVER (ORDER BY rnd, ark) AS INT) AS step,
             pa AS sym_a, pb AS sym_b, cnt
      FROM all_m
      ORDER BY step""",

    // Same unrolled learn, then the accounting rollup of the final
    // round's segmentation (td54's Spark shape exactly).
    "td54_bpe_apply" -> s"""
      WITH $bpeCte
      SELECT CAST(sum(freq) AS BIGINT) AS n_words,
             CAST(sum(freq * len(w)) AS BIGINT) AS n_chars,
             CAST(sum(freq * len(regexp_extract_all(seg, '\\(([^)]*)\\)', 1)))
               AS BIGINT) AS n_bpe_tokens
      FROM wf$BpeRounds""",

    // bpeCte's learned merges applied per (source, word) as the same
    // chained literal replaces in (round, rank) order, rolled up per
    // source. Each m$i is a guaranteed 1-row scalar frame, so the
    // cross-join chain never changes sw's row count.
    "td55_tokenizer_equity" -> s"""
      WITH $bpeCte,
      sw AS (SELECT source, w, count(1) AS freq FROM
               (SELECT source, unnest(string_split(lower(text), ' ')) AS w
                FROM documents)
             WHERE len(w) >= 2 AND regexp_matches(w, '^[a-z0-9]+$$')
             GROUP BY 1, 2),
      ap AS (SELECT source, w, freq,
               ${(1 to BpeRounds).foldLeft(
                 "regexp_replace(w, '(.)', '(\\1)', 'g')")(
                 (e, i) => applyChainSql(e, i))} AS seg
             FROM sw ${(1 to BpeRounds)
               .map(i => s"CROSS JOIN m$i").mkString(" ")}),
      agg AS (SELECT source, CAST(sum(freq) AS BIGINT) AS n_words,
                CAST(sum(freq * len(w)) AS BIGINT) AS n_chars,
                CAST(sum(freq * len(regexp_extract_all(seg, '\\(([^)]*)\\)', 1)))
                  AS BIGINT) AS n_bpe_tokens
              FROM ap GROUP BY source)
      SELECT source, n_words, n_chars, n_bpe_tokens,
             n_bpe_tokens * 1000000 // n_chars AS tokens_per_million_chars
      FROM agg ORDER BY source""",

    // Same bucket/share/L1 arithmetic in DuckDB, exact integers all
    // the way (the parallel-unnest zip is te19's oracle idiom).
    "te33_embedding_drift" -> embeddingDriftOracle,

    // te34 gates the odd-id live snapshot against the even-id
    // PERSISTED baseline frame — numerically the identical report,
    // so the oracle is te33's verbatim.
    "te34_embedding_drift_baseline" -> embeddingDriftOracle,

    "td57_corpus_drift" -> corpusDriftOracle,

    // td59 gates the odd-id live snapshot against the even-id
    // PERSISTED baseline frame — numerically the identical report, so
    // the oracle is td57's verbatim.
    "td59_drift_vs_baseline" -> corpusDriftOracle,

    // Exact-dup canonical via the md5 window, near-dup membership via
    // exact shingle Jaccard over the canonical slice (the LSH side is
    // candidate-lossless above threshold and exact-verified, so both
    // engines derive the identical member set — td03/td46's parity).
    "td62_source_dedup_audit" -> """
      WITH dp AS (SELECT doc_id, source, text,
              doc_id = min(doc_id) OVER (PARTITION BY md5(lower(text)))
                AS r_dup
            FROM documents),
      w2 AS (SELECT doc_id, string_split(lower(text), ' ') AS words
             FROM dp WHERE r_dup),
      g2 AS (SELECT doc_id,
               CASE WHEN len(words) >= 3
                 THEN list_distinct(list_transform(range(1, len(words) - 1),
                        i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                 ELSE [] END AS shingles
             FROM w2),
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g2),
      sz AS (SELECT doc_id AS id, len(shingles) AS n FROM g2),
      inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                GROUP BY 1, 2),
      prs AS (SELECT id_a, id_b FROM inter
              JOIN sz sa ON id_a = sa.id
              JOIN sz sb ON id_b = sb.id
              WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      mem AS (SELECT DISTINCT id FROM
              (SELECT id_a AS id FROM prs UNION ALL SELECT id_b FROM prs)),
      agg AS (SELECT source, CAST(count(1) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN NOT r_dup THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_exact_dup,
                CAST(sum(CASE WHEN r_dup AND EXISTS
                    (SELECT 1 FROM mem WHERE mem.id = dp.doc_id)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup
              FROM dp GROUP BY source)
      SELECT source, n_docs, n_exact_dup,
             (n_exact_dup * 1000000) // n_docs AS exact_dup_micro,
             n_neardup,
             (n_neardup * 1000000) // n_docs AS neardup_micro
      FROM agg ORDER BY source""",

    // Epoch slices reconstructed by row_number over the id-sorted
    // stream (epoch = least(2, (rn-1) DIV ceil(n/3)), the admission
    // cap's arithmetic); per-epoch counts full-outer against epoch
    // 0's, per-(epoch, feature) totals from the joined frame — the
    // exact driftVsBaseline semantics per epoch.
    "td61_epoch_drift_monitor" -> """
      WITH ord AS (SELECT doc_id, text, lang,
              row_number() OVER (ORDER BY doc_id) AS rn,
              count(1) OVER () AS n
            FROM documents),
      ep AS (SELECT text, coalesce(lang, '__null') AS lang,
              CAST(least(2, (rn - 1) // ((n + 2) // 3)) AS INT) AS epoch
            FROM ord),
      base AS (SELECT epoch,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
               CAST(len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','a','of','and','to'))) AS BIGINT) AS n_stop,
               lang
             FROM ep),
      b2 AS (SELECT *, (n_stop * 1000000) // nt AS stop_micro
             FROM base WHERE nt > 0),
      f AS (SELECT epoch, 'len' AS feature,
              CAST(least(9, nt // 20) AS VARCHAR) AS bucket FROM b2
            UNION ALL SELECT epoch, 'stop_ratio',
              CAST(least(9, stop_micro // 100000) AS VARCHAR) FROM b2
            UNION ALL SELECT epoch, 'lang', lang FROM b2),
      cnt AS (SELECT epoch, feature, bucket, CAST(count(1) AS BIGINT) AS cn
              FROM f GROUP BY 1, 2, 3),
      eps AS (SELECT DISTINCT epoch FROM cnt WHERE epoch > 0),
      keys AS (SELECT DISTINCT e.epoch, c.feature, c.bucket
               FROM eps e JOIN cnt c ON c.epoch = 0 OR c.epoch = e.epoch),
      j AS (SELECT k.epoch, k.feature, k.bucket,
              coalesce(c0.cn, 0) AS n_a, coalesce(ce.cn, 0) AS n_b
            FROM keys k
            LEFT JOIN cnt c0 ON c0.epoch = 0 AND c0.feature = k.feature
              AND c0.bucket = k.bucket
            LEFT JOIN cnt ce ON ce.epoch = k.epoch AND ce.feature = k.feature
              AND ce.bucket = k.bucket),
      tot AS (SELECT epoch, feature, sum(n_a) AS tot_a, sum(n_b) AS tot_b
              FROM j GROUP BY 1, 2),
      sh AS (SELECT j.epoch, j.feature, j.bucket,
              abs((n_a * 1000000) // tot_a - (n_b * 1000000) // tot_b)
                AS shift
             FROM j JOIN tot ON j.epoch = tot.epoch
               AND j.feature = tot.feature),
      top AS (SELECT epoch, feature, bucket, shift,
                row_number() OVER (PARTITION BY epoch, feature
                  ORDER BY shift DESC, bucket) AS rk
              FROM sh)
      SELECT epoch, feature, CAST(count(1) AS BIGINT) AS n_buckets,
             CAST(sum(shift) AS BIGINT) AS l1_micro,
             max(CASE WHEN rk = 1 THEN bucket END) AS top_bucket,
             CAST(max(CASE WHEN rk = 1 THEN shift END) AS BIGINT)
               AS top_shift_micro
      FROM top
      GROUP BY 1, 2
      ORDER BY epoch, feature""",

    // Same histogram/cumulative/threshold arithmetic in DuckDB —
    // exact integers, ties at the threshold kept, K decomposed to
    // stay inside BIGINT exactly like the Spark side.
    "td60_quantile_gate" -> """
      WITH s AS (SELECT doc_id, lang,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nw,
                   CAST(len(list_distinct(string_split(lower(text), ' ')))
                     AS BIGINT) AS nu
                 FROM documents),
      sc AS (SELECT doc_id, lang, nw, (nu * 1000000) // nw AS score_micro
             FROM s WHERE nw > 0),
      h AS (SELECT score_micro AS sv, CAST(count(1) AS BIGINT) AS cnt
            FROM sc GROUP BY 1),
      c AS (SELECT sv,
              CAST(sum(cnt) OVER (ORDER BY sv DESC
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              CAST(sum(cnt) OVER () AS BIGINT) AS total
            FROM h),
      t AS (SELECT max(sv) AS threshold_micro FROM c
            WHERE cum >= greatest(1, (total // 1000000) * 300000
              + ((total % 1000000) * 300000) // 1000000))
      SELECT lang, CAST(count(1) AS BIGINT) AS n_kept,
             CAST(sum(nw) AS BIGINT) AS n_tokens,
             min(doc_id) AS first_kept,
             CAST(max(t.threshold_micro) AS BIGINT) AS threshold_micro
      FROM sc CROSS JOIN t
      WHERE score_micro >= t.threshold_micro
      GROUP BY lang
      ORDER BY lang""",

    // The oracle recomputes every header field and gate from the
    // deterministic parameters — the Spark side must round-trip them
    // through the container's actual bytes (including the CRC-32
    // check, TRUE here) to match. Container overhead is fixed:
    // 8 (sig) + 25 (IHDR) + 12 (IDAT framing) + 12 (IEND) = 57 bytes.
    "mm14_png_ihdr_gate" -> """
      WITH p AS (SELECT doc_id,
                   8 + doc_id % 24 AS w,
                   6 + doc_id % 18 AS h,
                   2 + 4 * (doc_id % 2) AS ctype,
                   100 + length(text) % 300 AS ilen
                 FROM documents)
      SELECT doc_id, TRUE AS png_ok, TRUE AS crc_ok,
             CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
             CAST(8 AS BIGINT) AS bit_depth,
             CAST(ctype AS BIGINT) AS color_type,
             CAST(57 + ilen AS BIGINT) AS n_bytes,
             (w * h >= 200) AS r_minres,
             (w <= h * 2 AND h <= w * 2) AS r_aspect,
             (57 + ilen >= 200) AS r_minbytes,
             (w * h >= 200 AND w <= h * 2 AND h <= w * 2
               AND 57 + ilen >= 200) AS keep
      FROM p ORDER BY doc_id""",

    // Per-kind fields recomputed from the parameters; the Spark side
    // must sniff the right container type from the magic bytes and
    // round-trip every field through the actual header bytes (wav on
    // even ids: ch=1, bits=16, block_align=2; png on odd ids:
    // overhead 57 B).
    "mm15_container_dispatch" -> """
      WITH p AS (SELECT doc_id, length(text) AS lt FROM documents)
      SELECT doc_id,
        CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'png' END AS kind,
        TRUE AS media_ok,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 44 + (50 + lt % 200) * 2
             ELSE 57 + (100 + lt % 300) END AS BIGINT) AS n_bytes,
        CAST(CASE WHEN doc_id % 2 = 0 THEN 1 END AS BIGINT) AS channels,
        CAST(CASE WHEN doc_id % 2 = 0
             THEN 8000 + (doc_id % 5) * 4000 END AS BIGINT) AS sample_rate,
        CAST(CASE WHEN doc_id % 2 = 0
             THEN (50 + lt % 200) * 1000000 // (8000 + (doc_id % 5) * 4000)
             END AS BIGINT) AS duration_micros,
        CAST(CASE WHEN doc_id % 2 = 1 THEN 8 + doc_id % 24 END AS BIGINT)
          AS width,
        CAST(CASE WHEN doc_id % 2 = 1 THEN 6 + doc_id % 18 END AS BIGINT)
          AS height,
        CAST(CASE WHEN doc_id % 2 = 1 THEN 8 END AS BIGINT) AS bit_depth
      FROM p ORDER BY doc_id""",

    // The oracle recomputes every header field from the deterministic
    // parameters — the Spark side must round-trip them through the
    // container's actual bytes to match.
    "mm13_wav_riff_parse" -> """
      WITH p AS (SELECT doc_id,
                   1 + doc_id % 2 AS ch,
                   8000 + (doc_id % 5) * 4000 AS rate,
                   8 * (1 + length(text) % 2) AS pbits,
                   50 + length(text) % 200 AS frames
                 FROM documents),
      d AS (SELECT doc_id, ch, rate, pbits, frames,
              ch * pbits // 8 AS block_align
            FROM p)
      SELECT doc_id, TRUE AS riff_ok,
             CAST(ch AS BIGINT) AS channels,
             CAST(rate AS BIGINT) AS sample_rate,
             CAST(pbits AS BIGINT) AS bits,
             CAST(block_align AS BIGINT) AS block_align,
             CAST(rate * block_align AS BIGINT) AS byte_rate,
             CAST(frames * block_align AS BIGINT) AS data_size,
             CAST(frames AS BIGINT) AS n_frames,
             CAST(frames * 1000000 // rate AS BIGINT) AS duration_micros,
             CAST(44 + frames * block_align AS BIGINT) AS n_bytes
      FROM d
      ORDER BY doc_id""",

    "td53_epoch_shuffle" -> """
      WITH t AS (SELECT doc_id AS id,
                   CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS nt,
                   CAST('0x' || substring(md5('ep1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS pos
                 FROM documents)
      SELECT CAST(pos % 16 AS INT) AS shard,
             CAST(count(1) AS BIGINT) AS n_docs,
             CAST(sum(nt) AS BIGINT) AS n_tokens,
             min(pos) AS min_pos, max(pos) AS max_pos
      FROM t GROUP BY 1 ORDER BY shard"""
  )

  /** BPE learner shape shared by the td52/td54/td55 queries and their
    * oracles: 8 rounds × up to 4 non-overlapping merges per round.
    */
  private val BpeRounds = 8
  private val BpeBatch = 4

  /** The shared td52/td54/td55 oracle body: word frequencies with
    * initial char segmentation, then [[BpeRounds]] unrolled BATCHED
    * BPE rounds (c_i ranked candidate window, s_i the accepted
    * non-overlapping subset, m_i its 1-row scalar pivot, wf_i the
    * re-segmentation).
    */
  private def bpeCte: String = s"""tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
      wf0 AS MATERIALIZED (
        SELECT w, count(1) AS freq,
               regexp_replace(w, '(.)', '(\\1)', 'g') AS seg
        FROM tok
        WHERE len(w) >= 2 AND regexp_matches(w, '^[a-z0-9]+$$')
        GROUP BY w),
      ${(1 to BpeRounds).map(bpeLayer).mkString(",\n      ")}"""

  /** The chained literal replace applying round `i`'s accepted merges
    * (ranks 1..[[BpeBatch]]) to the segmentation expression `e`, in
    * rank order. coalesce to a chr(1) no-op pattern: a rank with no
    * accepted merge yields NULL a/b scalars, and the apply must leave
    * seg untouched — matching Spark's fold over only the merges that
    * exist. seg never contains chr(1) (alnum symbols + parens).
    */
  private def applyChainSql(e: String, i: Int): String =
    (1 to BpeBatch).foldLeft(e) { (acc, k) =>
      s"""replace($acc,
                 coalesce('(' || a${i}_$k || ')(' || b${i}_$k || ')', chr(1)),
                 coalesce('(' || a${i}_$k || b${i}_$k || ')', ''))"""
    }

  /** One BATCHED BPE round of the td52 oracle: rank adjacent symbol
    * pairs over the previous segmentation (cnt DESC, pair ASC), window
    * to the top [[BpeBatch]], accept a candidate iff no higher-ranked
    * candidate in the window shares a symbol (the sequential-recursion-
    * free rule CurationOps.bpeLoop implements — both engines provably
    * pick the same set), and re-segment with the accepted merges'
    * literal replaces in rank order (symbol-disjoint, so order is
    * immaterial — but keep it identical anyway). MATERIALIZED like
    * td47's layers — plain CTEs re-inline the whole upstream chain
    * per reference.
    */
  private def bpeLayer(i: Int): String = {
    val p = i - 1
    val scalars = (1 to BpeBatch).map(k =>
      s"""(SELECT pa FROM s$i WHERE ark = $k) AS a${i}_$k,
          (SELECT pb FROM s$i WHERE ark = $k) AS b${i}_$k""").mkString(",\n        ")
    s"""
      c$i AS MATERIALIZED (
        SELECT pa, pb, cnt,
               row_number() OVER (ORDER BY cnt DESC, pa, pb) AS rk
        FROM (SELECT pa, pb, CAST(sum(freq) AS BIGINT) AS cnt
              FROM (SELECT freq, syms[i] AS pa, syms[i + 1] AS pb
                    FROM (SELECT freq, syms,
                            CAST(unnest(range(1, len(syms))) AS INT) AS i
                          FROM (SELECT freq,
                                  regexp_extract_all(seg, '\\(([^)]*)\\)', 1) AS syms
                                FROM wf$p)))
              GROUP BY 1, 2 ORDER BY cnt DESC, pa, pb LIMIT $BpeBatch)),
      s$i AS MATERIALIZED (
        SELECT pa, pb, cnt, CAST(row_number() OVER (ORDER BY rk) AS INT) AS ark
        FROM c$i a
        WHERE NOT EXISTS (SELECT 1 FROM c$i b WHERE b.rk < a.rk
          AND (b.pa = a.pa OR b.pa = a.pb OR b.pb = a.pa OR b.pb = a.pb))),
      m$i AS (SELECT
        $scalars),
      wf$i AS MATERIALIZED (
        SELECT w, freq, ${applyChainSql("seg", i)} AS seg
        FROM wf$p CROSS JOIN m$i)"""
  }
  // ^ CROSS JOIN is safe here (unlike the old t_i LEFT JOIN): m_i is a
  // pure scalar-subquery SELECT, so it is exactly one row even when
  // s_i is empty — the scalars are then NULL and the chr(1) no-ops in
  // applyChainSql leave seg unchanged, matching Spark's exhausted loop.
}
