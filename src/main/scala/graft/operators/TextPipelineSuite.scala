package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Checkpoints.BarrierOps

/** Training-data text pipeline over `documents` (BASELINE.json north
  * star): exact + near-duplicate detection (n-gram Jaccard, MinHash-LSH,
  * SimHash), language id, quality scoring, token counting, document
  * fingerprinting. The MinHash-LSH query must produce exactly the same
  * pair set as the exact all-pairs query (LSH params give ~100% recall
  * at the threshold; both verify candidates with true Jaccard), so both
  * share one exact-Jaccard oracle.
  */
object TextPipelineSuite extends QueryModule {

  /** (doc_id, shingle) index — window-lead construction keeps every
    * operator codegen'd and spreads per-doc work across cores (the
    * source parquet is a single file → 1 partition).
    */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    TextOps.shingleHashIndex(Tables.load(s, dir, "documents"), "doc_id", "text", 3)

  /** (doc_id, w) exploded words (with duplicates), parallelized.
    * Repartition BEFORE the explode: the exchange then moves each
    * document's text once instead of once per token (at 100 TB that is
    * the difference between shuffling ~1x and ~5-10x corpus bytes), and
    * downstream groupBy(doc_id) aggregations run shuffle-free because
    * the explode preserves the hash partitioning.
    */
  private def wordsIdx(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))

  /** DuckDB equivalent of words/shingles used by several oracles. */
  private val shingleCte = """
    w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    g AS (SELECT doc_id,
            CASE WHEN len(words) >= 3
              THEN list_distinct(list_transform(range(1, len(words) - 1),
                     i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
              ELSE [] END AS shingles
          FROM w)"""

  private val exactJaccardSql = s"""
    WITH $shingleCte,
    e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
    sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
    inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
              FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON id_a = sa.id
    JOIN sizes sb ON id_b = sb.id
    WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
    ORDER BY id_a, id_b"""

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup by content hash (hash-groupBy; scales by shuffling on
    // the 128-bit digest).
    "td01_dedup_exact" -> { (s, dir) =>
      Dedup.exactByContent(Tables.load(s, dir, "documents"),
          col("doc_id"), Seq(lower(col("text"))))
        .select(col("content_hash"), col("keep_id"), col("n_dups"))
        .orderBy("content_hash")
    },

    // Exact all-pairs word-3-gram Jaccard ≥ 0.8 (inverted-index join).
    "td02_ngram_jaccard" -> { (s, dir) =>
      TextOps.allPairsJaccardIdx(shingles(s, dir), 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy("id_a", "id_b")
    },

    // Cross-source near-dup overlap matrix (td40): which dumps/crawl
    // snapshots duplicate each other — td03's LSH-mined pair set
    // rolled up to UNORDERED (source_a, source_b) cells. The
    // governance report that decides dump precedence and dedup order
    // before a 100 TB merge; two tiny hash joins + one aggregate on
    // top of the already-probed mining path.
    "td40_source_overlap" -> { (s, dir) =>
      val src = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"))
      val pairs = TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
        .select(col("id_a"), col("id_b"))
      pairs
        .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
        .select(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("source_a", "source_b")
    },

    // MinHash(64) + LSH(32 bands × 2 rows) candidates, exact-verified —
    // must equal td02's result (same oracle).
    "td03_minhash_lsh" -> { (s, dir) =>
      TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Incremental near-dup against a PERSISTED index — the nightly
    // batch shape: 80% of the corpus (doc_id % 5 != 0) is indexed once
    // (band + shingle indexes written to parquet, read back), the new
    // 20% batch mines ONLY its own bands against stored ∪ new. Result
    // = exactly the full re-mine's pairs that involve a new doc (the
    // oracle is td02's exact Jaccard restricted to those pairs).
    "td31_incremental_neardup" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-td31_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val all = shingles(s, dir)
      val existing = all.where(col("id") % 5 =!= 0)
      val newBatch = all.where(col("id") % 5 === 0)
      TextOps.lshBands(TextOps.minhashSignatureIdx(existing, 64), "id", 64, 2)
        .write.mode("overwrite").parquet(s"$store/bands")
      existing.write.mode("overwrite").parquet(s"$store/shingles")
      TextOps.incrementalNearDupIdx(newBatch,
          s.read.parquet(s"$store/bands"),
          s.read.parquet(s"$store/shingles"), 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Cluster-aware train/eval split (td35): the leakage-safe split a
    // training pipeline must do — near-dup CLUSTERS move between
    // splits atomically (component rep % 5 == 0 → eval), so train can
    // never see a near-duplicate of an eval document. Exact pair graph
    // here for the oracle; the at-scale twin swaps in td16's LSH-mined
    // pairs with the identical downstream plan.
    "td35_cluster_split" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val idx = TextOps.shingleHashIndex(docs, "doc_id", "text", 3)
      val pairs = TextOps.allPairsJaccardIdx(idx, 0.8)
        .select(col("id_a"), col("id_b"))
      val cc = Dedup.connectedComponents(pairs)
      docs.select(col("doc_id"))
        .join(cc.select(col("id").as("doc_id"), col("label")),
          Seq("doc_id"), "left")
        .withColumn("rep", coalesce(col("label"), col("doc_id")))
        .withColumn("split",
          when(pmod(col("rep"), lit(5)) === 0, "eval").otherwise("train"))
        .select(col("doc_id"), col("rep"), col("split"))
        .orderBy("doc_id")
    },

    // LSH banding tuner (td65): the pre-100TB sizing decision — which
    // (bands × rows) split of a 12-perm MinHash signature to commit
    // the corpus-scale dedup run to. One salted self-join mines every
    // divisor config's candidates together; each config's row reports
    // observed candidate load, the true/false split at J >= 0.8, the
    // share of the observed true-pair universe caught, and the exact
    // integer S-curve 1-(1-s^r)^b at s = 0.8 and 0.5. Perm family is
    // td34's md5-derived mix, so the oracle replays every band key.
    "td65_lsh_tuning" -> { (s, dir) =>
      TextOps.lshBandTuning(TextOps.shingleIndex(
          Tables.load(s, dir, "documents"), "doc_id", "text", 3))
        .orderBy("rows_per_band")
    },

    // b-bit MinHash (td34): the signature-compression estimator next
    // to td03's full-width LSH — only the low 8 bits of 16 MinHash
    // perms are kept (8× smaller signatures), and the collision-
    // corrected match fraction estimates Jaccard on td03's lossless,
    // exactly-oracled ≥0.8 pair set. n_match and the floor-scaled
    // estimate are integer end to end; the perm family is md5-derived
    // so the oracle replays every signature bit.
    "td34_bbit_minhash" -> { (s, dir) =>
      // codegen'd shingle form (posexplode + window lead) — the
      // array/lambda wordNgrams explode ran interpreted and was the
      // query's dominant cost (4.2 s of ~6 at sf0.1), not the hashing
      val idx = TextOps.shingleIndex(
          Tables.load(s, dir, "documents"), "doc_id", "text", 3)
        .select(col("id"), col("sh").as("gr"))
      // sig feeds BOTH sides of the pair join — materialize once or
      // the signature aggregate executes once per branch
      val sig = TextOps.bbitMinhashSig(idx, 16, 8).barrier()
      val pairs = TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
      val a = sig.select(col("id").as("id_a") +:
        (0 until 16).map(i => col(s"b$i").as(s"xa$i")): _*)
      val b2 = sig.select(col("id").as("id_b") +:
        (0 until 16).map(i => col(s"b$i").as(s"xb$i")): _*)
      val m = (0 until 16).map(i =>
        when(col(s"xa$i") === col(s"xb$i"), 1L).otherwise(0L)).reduce(_ + _)
      pairs.join(a, "id_a").join(b2, "id_b")
        .withColumn("n_match", m)
        .withColumn("est_micro", floor(
          greatest(col("n_match") * 256 - 16, lit(0L)) * 1000000L / 4080L)
          .cast("long"))
        .select(col("id_a"), col("id_b"),
          round(col("jaccard"), 6).as("jaccard"),
          col("n_match"), col("est_micro"))
        .orderBy("id_a", "id_b")
    },

    // MOSS-style robust winnowing (td33): the guaranteed-recall
    // fingerprint family next to td03's probabilistic MinHash — any
    // shared run of >= w+k-1 = 7 words between two docs is guaranteed
    // to share a fingerprint, at ~2/(w+1) the density of the full
    // 4-gram set. Fingerprints held by > 50 docs are dropped as
    // corpus-derived boilerplate before the pair join (MOSS's
    // "too-common, ignore" list); pairs sharing >= 2 surviving
    // fingerprints come back with their shared count.
    "td33_winnow_pairs" -> { (s, dir) =>
      val fps = TextOps.winnowFingerprints(
        Tables.load(s, dir, "documents"), "doc_id", "text", 4, 4)
      TextOps.winnowPairs(fps, minShared = 2, bucketCap = 50)
        .orderBy("doc_a", "doc_b")
    },

    // Character-trigram profile language ID — the real n-gram
    // classifier (fastText/CLD shape) next to td05's marker-word
    // heuristic: per-language top-200 trigram profiles trained on a
    // 75% split (one count aggregate + one bounded window over the
    // trigram vocabulary), held-out docs scored by how many of their
    // trigram OCCURRENCES hit each profile (one broadcast join on the
    // trigram key), argmax with deterministic ties. Output is the
    // confusion matrix — integer end to end, trivially oracle-exact,
    // and every stage map-side or bounded except the one corpus-linear
    // trigram explode.
    "td32_trigram_langid" -> { (s, dir) =>
      val tri = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), lower(col("text")).as("t"))
        .where(length(col("t")) >= 3)
        .select(col("doc_id"), col("lang"), explode(expr(
          "transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))"))
          .as("tri"))
      val wProf = Window.partitionBy(col("lang"))
        .orderBy(col("c").desc, col("tri"))
      val prof = tri.where(col("doc_id") % 4 =!= 0)
        .groupBy(col("lang"), col("tri")).agg(count(lit(1)).as("c"))
        .withColumn("rk", row_number().over(wProf)).where(col("rk") <= 200)
        .select(col("lang").as("p_lang"), col("tri"))
      val scores = tri.where(col("doc_id") % 4 === 0)
        .join(broadcast(prof), Seq("tri"))
        .groupBy(col("doc_id"), col("lang"), col("p_lang"))
        .agg(count(lit(1)).as("score"))
      val wPred = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("p_lang"))
      scores.withColumn("rk", row_number().over(wPred)).where(col("rk") === 1)
        .groupBy(col("lang"), col("p_lang").as("predicted"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("score")).cast("long").as("sum_score"))
        .orderBy("lang", "predicted")
    },

    // SimHash (60-bit) near-dups, hamming ≤ 3, pigeonhole-banded join.
    "td04_simhash" -> { (s, dir) =>
      val sim = TextOps.simhash60Idx(wordsIdx(s, dir).distinct(), "doc_id")
      TextOps.simhashPairs(sim, "doc_id", 3)
        .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
        .orderBy("id_a", "id_b")
    },

    // Language id: marker-word scores (codegen'd conditional sums over
    // the exploded words index), deterministic argmax.
    "td05_langid" -> { (s, dir) =>
      val en = Seq("the", "a", "of", "and", "to")
      val de = Seq("der", "die", "das", "und", "ist")
      val fr = Seq("le", "la", "et", "les", "des")
      val es = Seq("el", "los", "las", "y", "es")
      def score(ws: Seq[String]) =
        sum(when(col("w").isin(ws.map(x => x: Any): _*), 1).otherwise(0)).cast("int")
      val scores = wordsIdx(s, dir).groupBy(col("doc_id"))
        .agg(score(en).as("s_en"), score(de).as("s_de"),
          score(fr).as("s_fr"), score(es).as("s_es"))
      Tables.load(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(scores, "doc_id")
        .withColumn("predicted",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr")
            && col("s_en") >= col("s_es"), "en")
            .when(col("s_de") >= col("s_fr") && col("s_de") >= col("s_es"), "de")
            .when(col("s_fr") >= col("s_es"), "fr")
            .otherwise("es"))
        .withColumn("match_label", col("predicted") === col("lang"))
        .orderBy("doc_id")
    },

    // Quality scoring: length/punct/duplication ratios + composite
    // (distinct-word stats from the exploded index — no array lambdas).
    "td06_quality" -> { (s, dir) =>
      val wstats = wordsIdx(s, dir).groupBy(col("doc_id"))
        .agg(count(lit(1)).as("nw"), countDistinct(col("w")).as("nu"))
      Tables.load(s, dir, "documents")
        .repartition(col("doc_id"))
        .join(wstats, "doc_id")
        .select(col("doc_id"),
          length(col("text")).as("n_chars_calc"),
          col("nw").cast("int").as("n_words"),
          round(length(regexp_replace(col("text"), "[a-z0-9 ]", ""))
            / length(col("text")), 6).as("punct_ratio"),
          round((length(col("text")) - length(regexp_replace(col("text"), "[0-9]", "")))
            / length(col("text")), 6).as("digit_ratio"),
          round(col("nu") / col("nw"), 6).as("uniq_ratio"))
        .withColumn("quality_score",
          round(lit(0.4) * col("uniq_ratio")
            + lit(0.3) * least(lit(1.0), col("n_words") / 100.0)
            + lit(0.3) * (lit(1.0) - col("punct_ratio")), 6))
        .orderBy("doc_id")
    },

    // Token counting: whitespace, alpha-regex, numeric, BPE-ish estimate.
    "td07_tokens" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          size(TextOps.words(col("text"))).as("ws_tokens"),
          size(regexp_extract_all(col("text"), lit("[a-z]+"), lit(0))).as("alpha_tokens"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("num_tokens"),
          ceil(length(col("text")) / 4.0).cast("long").as("est_bpe_tokens"))
        .orderBy("doc_id")
    },

    // Document fingerprint (sorted distinct tokens → md5), grouped —
    // built by aggregation (collect_set + sort once per doc).
    "td08_fingerprint" -> { (s, dir) =>
      wordsIdx(s, dir).groupBy(col("doc_id"))
        .agg(md5(array_join(array_sort(collect_set(col("w"))), " ")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))
        .orderBy("fp")
    },

    // Benchmark decontamination — the eval-leakage check of a training-
    // data pipeline: fraction of each corpus doc's distinct word-5-grams
    // that appear anywhere in the "benchmark" set (source src0); docs
    // above 20% overlap are flagged. Grams are joined as 64-bit hashes
    // (fixed-width shuffle keys, same collision tolerance as td03);
    // scales as two shingle scans + one hash-key join — no pair blowup.
    "td10_decontaminate" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextOps.decontaminate(
          TextOps.shingleHashIndex(
            docs.filter(col("source") =!= "src0"), "doc_id", "text", 5),
          TextOps.shingleHashIndex(
            docs.filter(col("source") === "src0"), "doc_id", "text", 5),
          0.2)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Corpus-frequency quality score: average relative corpus frequency
    // of a doc's tokens (rare-word-heavy docs score low). Exact decimal
    // accumulation so the per-doc average is order-independent.
    "td11_corpus_freq" -> { (s, dir) =>
      TextOps.corpusRelFreq(wordsIdx(s, dir), "doc_id").orderBy("doc_id")
    },

    // Repetition-quality filters (the Gopher/C4 rules): most-frequent
    // bigram and word fractions per doc, with a keep flag at the usual
    // cutoffs. Repetitive docs (boilerplate, templated spam) score high
    // and get dropped from the training set.
    "td12_repetition" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bi = TextOps.repetitionStats(
          TextOps.ngramCountIndex(docs, "doc_id", "text", 2))
        .select(col("id").as("doc_id"), col("n_grams").as("n_bigrams"),
          col("top_gram").as("top_bigram"), col("top_n").as("top_bigram_n"),
          col("top_frac").as("top_bigram_frac"))
      val wd = TextOps.repetitionStats(
          wordsIdx(s, dir).select(col("doc_id").as("id"), col("w").as("sh")))
        .select(col("id").as("doc_id"),
          col("top_gram").as("top_word"), col("top_frac").as("top_word_frac"))
      bi.join(wd, "doc_id")
        .withColumn("keep",
          col("top_bigram_frac") <= 0.2 && col("top_word_frac") <= 0.3)
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling — the data-mixing step of a
    // training pipeline: per-language keep rates applied via a content-
    // independent hash gate (md5 of the doc id), so the sample is
    // reproducible across engines, runs, and partitionings, and scales
    // as a stateless map-side filter (no shuffle at all until the
    // summary aggregate).
    "td13_sample_mix" -> { (s, dir) =>
      val gate = CurationOps.sampleGate(col("doc_id"), 100)
      val rate = when(col("lang") === "en", 50)
        .when(col("lang") === "zh", 30).otherwise(80)
      Tables.load(s, dir, "documents")
        .where(gate < rate)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"), min(col("doc_id")).as("first_kept"),
          sum(col("n_chars")).as("kept_chars"))
        .orderBy("lang")
    },

    // Sequence packing — assemble docs into ≤512-token training bins
    // per language, greedy in deterministic doc order (an oversized doc
    // becomes its own bin). One ordered pass per language shard.
    "td14_pack_sequences" -> { (s, dir) =>
      TextOps.packSequences(
          Tables.load(s, dir, "documents")
            .withColumn("tokens", ceil(length(col("text")) / 4.0).cast("long")),
          "lang", "doc_id", "tokens", 512L)
        .select(col("g").as("lang"), col("id").as("doc_id"),
          col("t").as("tokens"), col("bin_id"))
        .orderBy("lang", "doc_id")
    },

    // Deny-list / PII scrubbing — redact banned terms + email-shaped
    // strings before training (the testdata carries no real PII, so the
    // deny-list terms are corpus words; the email alternative exercises
    // the PII pattern path). Stateless map-side regexp, no shuffle.
    "td15_scrub" -> { (s, dir) =>
      TextOps.scrub(Tables.load(s, dir, "documents"), "doc_id", "text",
          "\\b(customer|value|a)\\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}")
        .orderBy("doc_id")
    },

    // Near-dup cluster dedup — the step after candidate generation:
    // LSH pairs → connected components → keep the min doc id per
    // cluster as canonical, every other doc in the cluster dropped,
    // singletons keep themselves. The full CCNet/SlimPajama-style
    // corpus dedup pipeline in one operator chain, every stage bucketed
    // or keyed (no all-pairs work at any point).
    "td16_dedup_clusters" -> { (s, dir) =>
      val pairs = TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.clusterKeepers(Tables.load(s, dir, "documents"), col("doc_id"), pairs)
        .orderBy("id")
    },

    // Per-source marginal novelty (td45): which dump adds the most
    // content no other source has — gram-level acquisition report
    // (td40's doc-level overlap matrix, at the gram grain).
    "td45_source_novelty" -> { (s, dir) =>
      TextOps.sourceNovelty(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source", 3)
        .orderBy("source")
    },

    // SOFT dedup (td44): td16's clusters, but every doc KEPT with an
    // inverse-cluster-size sampling weight (exact integer micros) —
    // each near-dup cluster's total weight ≈ 1e6, so a weighted
    // sampler sees each piece of content once while retaining every
    // surface form.
    "td44_soft_dedup_weights" -> { (s, dir) =>
      val pairs = TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
        .select(col("id_a"), col("id_b"))
      Dedup.softDedupWeights(Tables.load(s, dir, "documents"),
          col("doc_id"), pairs)
        .orderBy("id")
    },

    // Bloom-prefiltered decontamination — same contract as td10, but
    // the corpus gram index passes a broadcast Bloom filter built over
    // the benchmark grams BEFORE the verify join, so only grams that
    // might overlap ever shuffle (no false negatives; false positives
    // die in the exact join). Distinct knobs from td10: 4-grams, 10%
    // flag threshold.
    "td17_decontaminate_bloom" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      TextOps.decontaminateBloom(
          TextOps.shingleHashIndex(
            docs.filter(col("source") =!= "src0"), "doc_id", "text", 4),
          TextOps.shingleHashIndex(
            docs.filter(col("source") === "src0"), "doc_id", "text", 4),
          0.1)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Per-language quality quota — the curation step of a training-data
    // pipeline: rank docs within each language by a quality proxy and
    // keep the top 20. One shuffle on lang, window rank, filter.
    "td09_language_quota" -> { (s, dir) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), length(col("text")).as("n_chars"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 20)
        .orderBy("lang", "rn")
    },

    // C4-style corpus-wide line dedup (10-word chunks as lines): a
    // duplicated chunk survives only in its lowest-id doc; texts are
    // reassembled from the surviving chunks plus the partial tail.
    "td18_line_dedup" -> { (s, dir) =>
      TextOps.lineDedup(Tables.load(s, dir, "documents"), "doc_id", "text", 10)
        .orderBy("doc_id")
    },

    // Duplicated-span fraction (Lee et al. substring-dedup signal):
    // share of each doc's overlapping 15-gram windows that appear in
    // ≥2 docs; ≥50% flags the doc as boilerplate/near-copy.
    "td19_dup_spans" -> { (s, dir) =>
      TextOps.dupSpanStats(Tables.load(s, dir, "documents"), "doc_id", "text",
          n = 15, minDf = 2, flagFrac = 0.5)
        .orderBy("doc_id")
    },

    // DSIR-style importance selection: score every non-src0 doc by
    // target-likeness of its unigram counts against the src0 sample,
    // keep the top 100 (distributed top-k, ties on id).
    "td20_importance_select" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      def idx(f: DataFrame): DataFrame =
        f.select(col("doc_id").as("id"), explode(TextOps.words(col("text"))).as("w"))
          .repartition(col("id"))
      TextOps.importanceSelect(
          idx(docs.filter(col("source") =!= "src0")),
          idx(docs.filter(col("source") === "src0")), quota = 100)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Typed PII redaction — the testdata carries no real PII, so each
    // doc gets a deterministic PII suffix woven from its id (emails on
    // ids ≡0 mod 2, phones mod 3, IPv4 mod 5, 9-digit account runs
    // mod 7 — so the per-class counts vary 0..4 per doc) before the
    // detector runs. The detector itself never sees the construction:
    // it redacts whatever matches, class by class.
    "td21_pii_redact" -> { (s, dir) =>
      val id = col("doc_id")
      def sfx(m: Int, piece: Column) =
        when(id % m === 0, piece).otherwise(lit(""))
      val withPii = Tables.load(s, dir, "documents")
        .withColumn("text2", concat(col("text"),
          sfx(2, concat(lit(" user"), id.cast("string"), lit("@ex"),
            (id % 7).cast("string"), lit(".com"))),
          sfx(3, concat(lit(" 555-"), lpad((id % 1000).cast("string"), 3, "0"),
            lit("-"), lpad((id % 10000).cast("string"), 4, "0"))),
          sfx(5, concat(lit(" 10."), (id % 256).cast("string"), lit("."),
            ((id * 7) % 256).cast("string"), lit("."), (id % 250).cast("string"))),
          sfx(7, concat(lit(" 90"), lpad((id % 10000000).cast("string"), 7, "0")))))
      TextOps.piiRedact(withPii, "doc_id", "text2")
        .orderBy("doc_id")
    },

    // Bigram-LM quality scoring: MLE conditional-probability model
    // trained on the corpus itself, per-doc average conditional prob
    // (floor-scaled integer terms) + rare-bigram ratio, ≥50% rare
    // flags the doc.
    "td22_bigram_lm" -> { (s, dir) =>
      TextOps.bigramLmScore(Tables.load(s, dir, "documents"),
          "doc_id", "text", rareMax = 2L, flagRatio = 0.5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Contamination ATTRIBUTION (td37): for every contaminated doc
    // (td10's > 0.2 5-gram overlap against the src0 benchmark), trace
    // WHICH benchmark document contributed the most shared grams —
    // the "where did the leak come from" report a decontamination
    // audit needs. One inverted-index join doc-gram ⋈ bench-gram, a
    // per-(doc, bench) count, rank-1 with min-bench-id ties.
    "td37_contamination_source" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val corpus = TextOps.shingleHashIndex(
        docs.filter(col("source") =!= "src0"), "doc_id", "text", 5)
      val bench = TextOps.shingleHashIndex(
        docs.filter(col("source") === "src0"), "doc_id", "text", 5)
      val joined = corpus.join(
          bench.select(col("sh"), col("id").as("bench_id")), "sh")
        .barrier() // feeds both aggregates below
      // td10's contamination test: DISTINCT grams with any bench match
      val nhits = joined.select(col("id"), col("sh")).distinct()
        .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
      val hits = joined.groupBy(col("id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
      val sizes = corpus.groupBy(col("id")).agg(count(lit(1)).as("n_grams"))
      val wTop = Window.partitionBy(col("id"))
        .orderBy(col("n_shared").desc, col("bench_id"))
      hits.join(sizes, "id").join(nhits, "id")
        .where(col("n_hits") * 5 > col("n_grams")) // > 0.2 in x-mult
        .withColumn("rk", row_number().over(wTop)).where(col("rk") === 1)
        .select(col("id").as("doc_id"), col("bench_id"),
          col("n_shared"), col("n_hits"), col("n_grams"))
        .orderBy("doc_id")
    },

    // CCNet-style perplexity bucketing (td36): the corpus split into
    // head/middle/tail TERTILES of the td22 bigram-LM score (head =
    // most in-distribution — CCNet trains on head+middle and drops
    // tail). ntile over (score desc, id) is deterministic in both
    // engines; the score stays the exact integer micros underneath
    // td22's output. The global ntile sort is the oracle-exact form —
    // at corpus scale the tertile THRESHOLDS come from
    // stratifiedQuota's distributed histogram instead, same contract.
    "td36_ccnet_buckets" -> { (s, dir) =>
      val lm = TextOps.bigramLmScore(Tables.load(s, dir, "documents"),
          "doc_id", "text", rareMax = 2L, flagRatio = 0.5)
        .select(col("id").as("doc_id"),
          round(col("avg_cond_p") * 1e6).cast("long").as("score_micro"))
      val w = Window.orderBy(col("score_micro").desc, col("doc_id"))
      lm.withColumn("bucket", ntile(3).over(w))
        .withColumn("tier", element_at(
          array(lit("head"), lit("middle"), lit("tail")), col("bucket")))
        .groupBy(col("bucket"), col("tier"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("score_micro")).as("min_score_micro"),
          max(col("score_micro")).as("max_score_micro"))
        .orderBy("bucket")
    },

    // Priority-based canonical selection: same LSH clusters as td16,
    // but the keeper is the best (source priority, id) doc — "prefer
    // the curated source" — instead of the minimum id.
    "td24_priority_dedup" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val pairs = TextOps.minhashLshPairsIdx(shingles(s, dir), 0.8)
        .select(col("id_a"), col("id_b"))
      // Explicit NULL policy: an unparseable source priority coalesces
      // to Int.MaxValue (sorts LAST) on both engines — Spark's silent
      // cast-to-NULL would otherwise sort first in min(struct), while
      // DuckDB's CAST errors; try_cast + sentinel makes them agree.
      Dedup.priorityKeepers(docs, col("doc_id"),
          coalesce(substring(col("source"), 4, 10).cast("int"),
            lit(Int.MaxValue)), pairs)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ExactSubstr-style duplicated-span REMOVAL: every 8-token window
    // occurring more than once in the corpus survives only at its
    // first (doc, pos); covered tokens elsewhere are dropped and the
    // text reassembled — the step beyond td18/td19's span DETECTION.
    "td25_exact_substr_rm" -> { (s, dir) =>
      TextOps.exactSubstrRemove(Tables.load(s, dir, "documents"),
          "doc_id", "text", n = 8)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Train a linear quality probe on the cluster (distributed batch
    // GD, 5 rounds, driver-held 4-float model) against the is-English
    // label, then score + threshold every doc — the
    // quality-classifier-training step of a curation pipeline.
    "td23_quality_probe" -> { (s, dir) =>
      TextOps.linearProbe(Tables.load(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // Classifier calibration sweep (td66): td23's trained quality
    // probe calibrated BEFORE its threshold is committed — one row
    // per occupied score bucket with the confusion counts and
    // precision/recall (integer micros) of "keep everything scoring
    // at or above this bucket". The corpus reduces to a domain-
    // bounded histogram in one aggregate; the sweep is a window over
    // that frame, never the corpus.
    "td66_classifier_calibration" -> { (s, dir) =>
      TextOps.probeCalibration(Tables.load(s, dir, "documents"),
          "doc_id", "text", col("lang") === "en")
        .orderBy("thr_bucket")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "td01_dedup_exact" -> """
      SELECT md5(lower(text)) AS content_hash,
             min(doc_id) AS keep_id, count(1) AS n_dups
      FROM documents
      GROUP BY 1
      ORDER BY content_hash""",

    "td02_ngram_jaccard" -> exactJaccardSql,
    "td03_minhash_lsh" -> exactJaccardSql,

    // The exact-pair CTE rolled up to source cells (LSH mining is
    // verify-exact at the threshold, so the pair sets coincide).
    "td40_source_overlap" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
      inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                GROUP BY 1, 2),
      p AS (SELECT id_a, id_b FROM inter
            JOIN sizes sa ON id_a = sa.id
            JOIN sizes sb ON id_b = sb.id
            WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8)
      SELECT least(da.source, db.source) AS source_a,
             greatest(da.source, db.source) AS source_b,
             count(1) AS n_pairs
      FROM p JOIN documents da ON da.doc_id = p.id_a
             JOIN documents db ON db.doc_id = p.id_b
      GROUP BY 1, 2
      ORDER BY source_a, source_b""",

    // Same split/profile/score/argmax, replayed in SQL; DuckDB's
    // range(1, n) is exclusive, matching sequence(1, n-2) inclusive.
    // it01's component labels left-joined onto ALL documents; isolated
    // docs are their own rep.
    "td35_cluster_split" -> """
      WITH RECURSIVE
      base AS (
        WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
        g AS (SELECT doc_id,
                CASE WHEN len(words) >= 3
                  THEN list_distinct(list_transform(range(1, len(words) - 1),
                         i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
                  ELSE [] END AS shingles
              FROM w),
        e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
        sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
        inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                  FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                  GROUP BY 1, 2)
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON id_a = sa.id JOIN sizes sb ON id_b = sb.id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM base
        UNION SELECT id_b, id_a FROM base),
      reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
      ccl AS (
        SELECT n.id, least(n.id, min(r.b)) AS label
        FROM (SELECT DISTINCT a AS id FROM edges) n
        LEFT JOIN reach r ON r.a = n.id
        GROUP BY n.id)
      SELECT d.doc_id,
             coalesce(ccl.label, d.doc_id) AS rep,
             CASE WHEN coalesce(ccl.label, d.doc_id) % 5 = 0
               THEN 'eval' ELSE 'train' END AS split
      FROM documents d LEFT JOIN ccl ON ccl.id = d.doc_id
      ORDER BY d.doc_id""",

    // Every 12-perm signature replayed bit for bit (td34's mix), each
    // divisor config's band keys grouped by (r, band, value tuple),
    // candidates self-joined per config, exact Jaccard on the distinct
    // union, and the S-curve columns in exact BIGINT rationals.
    "td65_lsh_tuning" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
      perms AS (SELECT CAST(unnest(range(0, 12)) AS BIGINT) AS i),
      xbase AS (SELECT id, CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS x
                FROM e),
      sig AS (
        SELECT id, i, min(xor(m3, m3 >> 16)) AS mh FROM (
          SELECT id, i, ((xor(h2, y >> 54) & 134217727) * 2654435761) & 4294967295 AS m3 FROM (
            SELECT id, i, y, xor(m2, m2 >> 16) AS h2 FROM (
              SELECT id, i, y, ((xor(h1, y >> 27) & 134217727) * 1597334677) & 4294967295 AS m2 FROM (
                SELECT id, i, y, xor(m1, m1 >> 16) AS h1 FROM (
                  SELECT id, i, y, ((y & 134217727) * 2654435761) & 4294967295 AS m1 FROM (
                    SELECT b.id, p.i, xor(b.x, p.i * 173961102589770) AS y
                    FROM xbase b, perms p)))))) GROUP BY 1, 2),
      cfg AS (SELECT CAST(unnest([2, 3, 4, 6, 12]) AS BIGINT) AS r),
      bands AS (SELECT c.r, s.id, s.i // c.r AS band,
                       string_agg(s.mh, ',' ORDER BY s.i) AS vals
                FROM sig s CROSS JOIN cfg c GROUP BY 1, 2, 3),
      cand0 AS (SELECT DISTINCT a.r, a.id AS id_a, b.id AS id_b
                FROM bands a JOIN bands b ON a.r = b.r AND a.band = b.band
                  AND a.vals = b.vals AND a.id < b.id),
      uniq AS (SELECT DISTINCT id_a, id_b FROM cand0),
      inter AS (SELECT u.id_a, u.id_b, count(1) AS inter
                FROM uniq u
                JOIN e a ON a.id = u.id_a
                JOIN e b ON b.id = u.id_b AND b.sh = a.sh
                GROUP BY 1, 2),
      ver AS (SELECT u.id_a, u.id_b,
                     coalesce(i.inter, 0) * 1.0
                       / (sa.n + sb.n - coalesce(i.inter, 0)) AS jaccard
              FROM uniq u
              LEFT JOIN inter i ON i.id_a = u.id_a AND i.id_b = u.id_b
              JOIN sizes sa ON sa.id = u.id_a
              JOIN sizes sb ON sb.id = u.id_b),
      cand AS (SELECT r, id_a, id_b FROM cand0
               UNION ALL SELECT CAST(0 AS BIGINT) AS r, id_a, id_b FROM uniq),
      agg AS (SELECT c.r, CAST(count(1) AS BIGINT) AS n_candidates,
                     CAST(sum(CASE WHEN v.jaccard >= 0.8 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_true
              FROM cand c JOIN ver v ON v.id_a = c.id_a AND v.id_b = c.id_b
              GROUP BY 1),
      tot AS (SELECT n_true AS total_true FROM agg WHERE r = 0)
      SELECT CAST(12 // a.r AS BIGINT) AS bands,
             a.r AS rows_per_band,
             a.n_candidates, a.n_true,
             a.n_candidates - a.n_true AS n_false,
             CASE WHEN t.total_true > 0
               THEN (a.n_true * 1000000) // t.total_true END AS caught_micro,
             CAST((CAST(power(5, 12) AS BIGINT)
                    - CAST(power(CAST(power(5, a.r) AS BIGINT)
                        - CAST(power(4, a.r) AS BIGINT), 12 // a.r) AS BIGINT))
                  * 1000000 // CAST(power(5, 12) AS BIGINT) AS BIGINT) AS p80_micro,
             CAST((4096 - CAST(power(CAST(power(2, a.r) AS BIGINT) - 1,
                                 12 // a.r) AS BIGINT))
                  * 1000000 // 4096 AS BIGINT) AS p50_micro
      FROM agg a CROSS JOIN tot t
      WHERE a.r > 0
      ORDER BY rows_per_band""",

    // td03's exact >= 0.8 pair set, plus every b-bit signature replayed
    // bit for bit (per-perm md5("<sh>#<i>") 60-bit prefix, low-8-bit
    // mask) and the collision-corrected estimate in floor'd integer
    // micros.
    "td34_bbit_minhash" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
      inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b,
               round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON id_a = sa.id
        JOIN sizes sb ON id_b = sb.id
        WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8),
      perms AS (SELECT CAST(unnest(range(0, 16)) AS BIGINT) AS i),
      xbase AS (SELECT id, CAST('0x' || substring(md5(sh), 1, 15) AS BIGINT) AS x
                FROM e),
      sig AS (
        SELECT id, i, min(xor(m3, m3 >> 16)) % 256 AS mh FROM (
          SELECT id, i, ((xor(h2, y >> 54) & 134217727) * 2654435761) & 4294967295 AS m3 FROM (
            SELECT id, i, y, xor(m2, m2 >> 16) AS h2 FROM (
              SELECT id, i, y, ((xor(h1, y >> 27) & 134217727) * 1597334677) & 4294967295 AS m2 FROM (
                SELECT id, i, y, xor(m1, m1 >> 16) AS h1 FROM (
                  SELECT id, i, y, ((y & 134217727) * 2654435761) & 4294967295 AS m1 FROM (
                    SELECT b.id, p.i, xor(b.x, p.i * 173961102589770) AS y
                    FROM xbase b, perms p)))))) GROUP BY 1, 2),
      mm AS (SELECT p.id_a, p.id_b,
                    CAST(sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_match
             FROM pairs p
             JOIN sig sa ON sa.id = p.id_a
             JOIN sig sb ON sb.id = p.id_b AND sb.i = sa.i
             GROUP BY 1, 2)
      SELECT p.id_a, p.id_b, p.jaccard, mm.n_match,
             CAST(greatest(mm.n_match * 256 - 16, 0) * 1000000 // 4080 AS BIGINT) AS est_micro
      FROM pairs p JOIN mm ON p.id_a = mm.id_a AND p.id_b = mm.id_b
      ORDER BY p.id_a, p.id_b""",

    // Winnowing selection replicated literally: 1-based gram positions,
    // windowed min over the next w-1 grams, full windows only, the
    // >50-doc boilerplate cap, then the shared-count pair join.
    "td33_winnow_pairs" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
                 FROM documents),
      g AS (SELECT doc_id, CAST(i AS INT) AS pos,
              words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                || ' ' || words[i+3] AS gram
            FROM w, LATERAL (SELECT unnest(range(1, len(words) - 2)) AS i)
            WHERE len(words) >= 4),
      fp0 AS (
        SELECT doc_id,
               min(gram) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
               lead(gram, 3) OVER (PARTITION BY doc_id ORDER BY pos) AS lastg
        FROM g),
      fps AS (SELECT DISTINCT doc_id, fp FROM fp0 WHERE lastg IS NOT NULL),
      capped AS (
        SELECT doc_id, fp FROM (
          SELECT doc_id, fp, count(1) OVER (PARTITION BY fp) AS n FROM fps)
        WHERE n <= 50)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             count(1) AS n_shared
      FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(1) >= 2
      ORDER BY 1, 2""",

    "td32_trigram_langid" -> """
      WITH t AS (SELECT doc_id, lang, lower(text) AS t FROM documents
                 WHERE len(lower(text)) >= 3),
      tri AS (SELECT doc_id, lang,
                unnest(list_transform(range(1, len(t) - 1),
                  i -> substr(t, i, 3))) AS tri
              FROM t),
      prof AS (SELECT lang AS p_lang, tri FROM (
                 SELECT lang, tri,
                        row_number() OVER (PARTITION BY lang
                          ORDER BY count(1) DESC, tri) AS rk
                 FROM tri WHERE doc_id % 4 <> 0 GROUP BY lang, tri)
               WHERE rk <= 200),
      sc AS (SELECT d.doc_id, d.lang, p.p_lang, count(1) AS score
             FROM tri d JOIN prof p ON d.tri = p.tri
             WHERE d.doc_id % 4 = 0
             GROUP BY 1, 2, 3),
      pred AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, p_lang) AS rk FROM sc)
      SELECT lang, p_lang AS predicted, count(1) AS n_docs,
             CAST(sum(score) AS BIGINT) AS sum_score
      FROM pred WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""",

    // td02's exact Jaccard restricted to pairs involving a new-batch
    // (doc_id % 5 = 0) document.
    "td31_incremental_neardup" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
      inter AS (SELECT a.id AS id_a, b.id AS id_b, count(1) AS inter
                FROM e a JOIN e b ON a.sh = b.sh AND a.id < b.id
                GROUP BY 1, 2)
      SELECT id_a, id_b,
             round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
      FROM inter
      JOIN sizes sa ON id_a = sa.id
      JOIN sizes sb ON id_b = sb.id
      WHERE inter * 1.0 / (sa.n + sb.n - inter) >= 0.8
        AND (id_a % 5 = 0 OR id_b % 5 = 0)
      ORDER BY id_a, id_b""",

    "td04_simhash" -> """
      WITH wd AS (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS w
                  FROM documents),
      wh AS (SELECT doc_id,
               list_reduce(list_transform(range(1, 16),
                 i -> CAST(strpos('0123456789abcdef', substr(md5(w), i, 1)) - 1 AS BIGINT)),
                 (a, b) -> a * 16 + b) AS wh
             FROM wd),
      bits AS (SELECT doc_id, j,
                 sum(CASE WHEN (wh >> j) & 1 = 1 THEN 1 ELSE -1 END) AS s
               FROM wh, unnest(range(0, 60)) AS t(j)
               GROUP BY doc_id, j),
      sh AS (SELECT doc_id,
               CAST(sum(CASE WHEN s >= 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
                             ELSE 0 END) AS BIGINT) AS simhash
             FROM bits GROUP BY doc_id)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      ORDER BY id_a, id_b""",

    "td05_langid" -> """
      WITH w AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS words
                 FROM documents),
      sc AS (SELECT doc_id, lang,
               len(list_filter(words, x -> x IN ('the','a','of','and','to'))) AS s_en,
               len(list_filter(words, x -> x IN ('der','die','das','und','ist'))) AS s_de,
               len(list_filter(words, x -> x IN ('le','la','et','les','des'))) AS s_fr,
               len(list_filter(words, x -> x IN ('el','los','las','y','es'))) AS s_es
             FROM w)
      SELECT doc_id, lang, s_en, s_de, s_fr, s_es,
        CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END AS predicted,
        (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
              WHEN s_fr >= s_es THEN 'fr'
              ELSE 'es' END) = lang AS match_label
      FROM sc
      ORDER BY doc_id""",

    "td06_quality" -> """
      WITH w AS (SELECT doc_id, text, string_split(lower(text), ' ') AS words
                 FROM documents),
      m AS (SELECT doc_id,
              length(text) AS n_chars_calc,
              len(words) AS n_words,
              round(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                * 1.0 / length(text), 6) AS punct_ratio,
              round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                * 1.0 / length(text), 6) AS digit_ratio,
              round(len(list_distinct(words)) * 1.0 / len(words), 6) AS uniq_ratio
            FROM w)
      SELECT *,
        round(0.4 * uniq_ratio + 0.3 * least(1.0, n_words / 100.0)
          + 0.3 * (1.0 - punct_ratio), 6) AS quality_score
      FROM m
      ORDER BY doc_id""",

    "td07_tokens" -> """
      SELECT doc_id,
        len(string_split(lower(text), ' ')) AS ws_tokens,
        len(regexp_extract_all(text, '[a-z]+')) AS alpha_tokens,
        len(regexp_extract_all(text, '[0-9]+')) AS num_tokens,
        CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
      FROM documents
      ORDER BY doc_id""",

    "td08_fingerprint" -> """
      SELECT md5(array_to_string(list_sort(list_distinct(
               string_split(lower(text), ' '))), ' ')) AS fp,
             min(doc_id) AS keep_id, count(1) AS n_docs
      FROM documents
      GROUP BY 1
      ORDER BY fp""",

    "td10_decontaminate" -> """
      WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS words
                 FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(words) >= 5
                THEN list_distinct(list_transform(range(1, len(words) - 3),
                       i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            || ' ' || words[i+3] || ' ' || words[i+4]))
                ELSE [] END AS grams
            FROM w),
      bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE source = 'src0'),
      e AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE source <> 'src0'),
      hits AS (SELECT doc_id, count(1) AS n_hits
               FROM e JOIN bench USING (gr) GROUP BY doc_id),
      allg AS (SELECT doc_id, len(grams) AS n_grams FROM g
               WHERE source <> 'src0' AND len(grams) > 0)
      SELECT a.doc_id, CAST(a.n_grams AS BIGINT) AS n_grams,
             CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             round(coalesce(h.n_hits, 0) * 1.0 / a.n_grams, 6) AS overlap,
             (coalesce(h.n_hits, 0) * 1.0 / a.n_grams) > 0.2 AS contaminated
      FROM allg a LEFT JOIN hits h ON a.doc_id = h.doc_id
      ORDER BY a.doc_id""",

    "td11_corpus_freq" -> """
      WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS wd
                 FROM documents),
      freq AS (SELECT wd, count(1) AS cnt FROM w GROUP BY wd),
      tot AS (SELECT count(1) AS n FROM w)
      SELECT doc_id,
             CAST(count(1) AS BIGINT) AS n_tokens,
             round((CAST(sum(CAST((cnt * 1.0 / n) AS DECIMAL(25,18))) AS DOUBLE)
               / count(1)), 9) AS avg_rel_freq
      FROM w JOIN freq USING (wd) CROSS JOIN tot
      GROUP BY doc_id
      ORDER BY doc_id""",

    "td12_repetition" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bg AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
               i -> ws[i] || ' ' || ws[i+1])) AS sh
             FROM w WHERE len(ws) >= 2),
      bc AS (SELECT doc_id, sh, count(1) AS cnt FROM bg GROUP BY 1, 2),
      bstat AS (SELECT doc_id, n_grams, sh AS top_bigram, cnt AS top_bigram_n,
                       round(cnt * 1.0 / n_grams, 6) AS top_bigram_frac
                FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, sh) AS rn,
                             sum(cnt) OVER (PARTITION BY doc_id) AS n_grams
                      FROM bc) WHERE rn = 1),
      wg AS (SELECT doc_id, unnest(ws) AS sh FROM w),
      wc AS (SELECT doc_id, sh, count(1) AS cnt FROM wg GROUP BY 1, 2),
      wstat AS (SELECT doc_id, sh AS top_word,
                       round(cnt * 1.0 / n, 6) AS top_word_frac
                FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY cnt DESC, sh) AS rn,
                             sum(cnt) OVER (PARTITION BY doc_id) AS n
                      FROM wc) WHERE rn = 1)
      SELECT b.doc_id, CAST(n_grams AS BIGINT) AS n_bigrams, top_bigram,
             CAST(top_bigram_n AS BIGINT) AS top_bigram_n, top_bigram_frac,
             top_word, top_word_frac,
             (top_bigram_frac <= 0.2 AND top_word_frac <= 0.3) AS keep
      FROM bstat b JOIN wstat USING (doc_id)
      ORDER BY doc_id""",

    "td13_sample_mix" -> """
      WITH g AS (
        SELECT *, list_reduce(list_transform(range(1, 16),
                 i -> CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)),
                 (a, b) -> a * 16 + b) % 100 AS gate,
               CASE WHEN lang = 'en' THEN 50
                    WHEN lang = 'zh' THEN 30 ELSE 80 END AS rate
        FROM documents)
      SELECT lang, count(1) AS n_kept, min(doc_id) AS first_kept,
             CAST(sum(n_chars) AS BIGINT) AS kept_chars
      FROM g WHERE gate < rate
      GROUP BY lang
      ORDER BY lang""",

    "td14_pack_sequences" -> """
      WITH RECURSIVE d AS (
        SELECT lang, doc_id, CAST(ceil(length(text) / 4.0) AS BIGINT) AS tokens,
               row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        FROM documents),
      p(lang, rn, doc_id, tokens, bin_id, fill) AS (
        SELECT lang, rn, doc_id, tokens, CAST(0 AS BIGINT), tokens
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.lang, d.rn, d.doc_id, d.tokens,
               CASE WHEN p.fill + d.tokens <= 512 THEN p.bin_id
                    ELSE p.bin_id + 1 END,
               CASE WHEN p.fill + d.tokens <= 512 THEN p.fill + d.tokens
                    ELSE d.tokens END
        FROM p JOIN d ON d.lang = p.lang AND d.rn = p.rn + 1)
      SELECT lang, doc_id, tokens, bin_id FROM p
      ORDER BY lang, doc_id""",

    "td09_language_quota" -> """
      SELECT doc_id, lang, n_chars, CAST(rn AS INT) AS rn FROM (
        SELECT doc_id, lang, CAST(length(text) AS INT) AS n_chars,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY length(text) DESC, doc_id) AS rn
        FROM documents)
      WHERE rn <= 20
      ORDER BY lang, rn""",

    "td15_scrub" -> """
      SELECT doc_id,
        CAST(len(regexp_extract_all(text,
          '\b(customer|value|a)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
          AS INT) AS n_redactions,
        md5(regexp_replace(text,
          '\b(customer|value|a)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          '[REDACTED]', 'g')) AS clean_hash,
        CAST(length(regexp_replace(text,
          '\b(customer|value|a)\b|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
          '[REDACTED]', 'g')) AS INT) AS clean_len
      FROM documents
      ORDER BY doc_id""",

    // Transitive closure over the exact near-dup pair graph; rep_id =
    // min reachable node (incl. self). Clusters are tiny so the
    // closure stays small even though it's quadratic per component.
    "td16_dedup_clusters" -> s"""
      WITH RECURSIVE $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
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
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id)
      SELECT id, rep_id, (id = rep_id) AS keep FROM rep ORDER BY id""",

    // td45: distinct (source, gram) index -> gram ownership count ->
    // per-source unique fraction in integer micros. DuckDB sum() over
    // BIGINT returns HUGEINT — cast back before the hash compare.
    "td45_source_novelty" -> s"""
      WITH $shingleCte,
      e AS (SELECT doc_id, unnest(shingles) AS sh FROM g),
      sg AS (SELECT DISTINCT d.source AS source, e.sh
             FROM e JOIN documents d ON e.doc_id = d.doc_id),
      own AS (SELECT sh, count(DISTINCT source) AS n_src FROM sg GROUP BY 1)
      SELECT source, count(1) AS n_grams,
             CAST(sum(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
             CAST(sum(CASE WHEN n_src = 1 THEN 1 ELSE 0 END) * 1000000
                  // count(1) AS BIGINT) AS unique_micro
      FROM sg JOIN own ON sg.sh = own.sh
      GROUP BY 1 ORDER BY 1""",

    // td44 = td16's component CTE + a per-cluster count + integer
    // division (DuckDB's // floors like Spark's DIV on positives).
    "td44_soft_dedup_weights" -> s"""
      WITH RECURSIVE $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
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
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id),
      cs AS (SELECT rep_id, count(1) AS cluster_size FROM rep GROUP BY 1)
      SELECT id, rep.rep_id, cluster_size,
             CAST(1000000 // cluster_size AS BIGINT) AS w_micro
      FROM rep JOIN cs ON rep.rep_id = cs.rep_id ORDER BY id""",

    // The bloom prefilter is invisible to the result: the oracle is the
    // same exact-overlap computation as td10, at 4 grams / 10%.
    "td17_decontaminate_bloom" -> """
      WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS words
                 FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(words) >= 4
                THEN list_distinct(list_transform(range(1, len(words) - 2),
                       i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            || ' ' || words[i+3]))
                ELSE [] END AS grams
            FROM w),
      bench AS (SELECT DISTINCT unnest(grams) AS gr FROM g WHERE source = 'src0'),
      e AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE source <> 'src0'),
      hits AS (SELECT doc_id, count(1) AS n_hits
               FROM e JOIN bench USING (gr) GROUP BY doc_id),
      allg AS (SELECT doc_id, len(grams) AS n_grams FROM g
               WHERE source <> 'src0' AND len(grams) > 0)
      SELECT a.doc_id, CAST(a.n_grams AS BIGINT) AS n_grams,
             CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             round(coalesce(h.n_hits, 0) * 1.0 / a.n_grams, 6) AS overlap,
             (coalesce(h.n_hits, 0) * 1.0 / a.n_grams) > 0.1 AS contaminated
      FROM allg a LEFT JOIN hits h ON a.doc_id = h.doc_id
      ORDER BY a.doc_id""",

    "td18_line_dedup" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
                 FROM documents),
      c AS (SELECT doc_id, CAST(i AS INT) AS chunk_idx,
              array_to_string(words[(i*10+1):(i*10+10)], ' ') AS chunk
            FROM w, LATERAL (SELECT unnest(range(0, len(words) // 10)) AS i)),
      owners AS (SELECT chunk, min(doc_id) AS keep_id FROM c GROUP BY 1),
      kept AS (SELECT c.doc_id, c.chunk_idx, c.chunk
               FROM c JOIN owners USING (chunk) WHERE c.doc_id = keep_id),
      r AS (SELECT doc_id, count(1) AS n_kept,
              string_agg(chunk, ' ' ORDER BY chunk_idx) AS body
            FROM kept GROUP BY doc_id),
      t AS (SELECT doc_id, CAST(len(words) // 10 AS INT) AS n_chunks,
              array_to_string(words[(len(words) // 10) * 10 + 1 : len(words)], ' ') AS tail
            FROM w)
      SELECT t.doc_id, n_chunks,
             CAST(n_chunks - coalesce(n_kept, 0) AS INT) AS n_removed,
             trim(concat_ws(' ', coalesce(body, ''), coalesce(tail, ''))) AS text
      FROM t LEFT JOIN r USING (doc_id)
      ORDER BY t.doc_id""",

    "td19_dup_spans" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words
                 FROM documents),
      g AS (SELECT doc_id,
              CASE WHEN len(words) >= 15
                THEN list_distinct(list_transform(range(1, len(words) - 13),
                       i -> array_to_string(words[i:i+14], ' ')))
                ELSE [] END AS grams
            FROM w),
      e AS (SELECT doc_id, unnest(grams) AS gr FROM g),
      dfreq AS (SELECT gr, count(1) AS df FROM e GROUP BY gr)
      SELECT doc_id, count(1) AS n_grams,
             CAST(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
             round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(1), 6) AS dup_frac,
             (round(sum(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / count(1), 6) >= 0.5) AS flagged
      FROM e JOIN dfreq USING (gr)
      GROUP BY doc_id
      ORDER BY doc_id""",

    "td20_importance_select" -> """
      WITH w AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
      tc AS (SELECT w, count(1) AS tc FROM w WHERE source = 'src0' GROUP BY 1),
      rc AS (SELECT w, count(1) AS rc FROM w WHERE source <> 'src0' GROUP BY 1),
      sc AS (SELECT doc_id, count(1) AS n_words,
               round(sum(coalesce(tc, 0) + 1) * 1.0 / sum(rc + 1), 6) AS importance
             FROM w LEFT JOIN tc USING (w) JOIN rc USING (w)
             WHERE source <> 'src0'
             GROUP BY doc_id),
      top AS (SELECT doc_id FROM sc ORDER BY importance DESC, doc_id LIMIT 100)
      SELECT doc_id, n_words, importance,
             (doc_id IN (SELECT doc_id FROM top)) AS selected
      FROM sc ORDER BY doc_id""",

    "td21_pii_redact" -> """
      WITH p AS (
        SELECT doc_id, text ||
          CASE WHEN doc_id % 2 = 0 THEN ' user' || CAST(doc_id AS VARCHAR)
            || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END ||
          CASE WHEN doc_id % 3 = 0 THEN ' 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
            || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
          CASE WHEN doc_id % 5 = 0 THEN ' 10.' || CAST(doc_id % 256 AS VARCHAR)
            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
            || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END ||
          CASE WHEN doc_id % 7 = 0 THEN ' 90' || lpad(CAST(doc_id % 10000000 AS VARCHAR), 7, '0')
            ELSE '' END AS text2
        FROM documents)
      SELECT doc_id,
        len(regexp_extract_all(text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        len(regexp_extract_all(text2, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phones,
        len(regexp_extract_all(text2, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
        len(regexp_extract_all(text2, '\b\d{9,}\b')) AS n_ids,
        md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text2,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
          '\b\d{9,}\b', '[ID]', 'g')) AS clean_hash,
        length(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text2,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
          '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
          '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
          '\b\d{9,}\b', '[ID]', 'g')) AS clean_len
      FROM p ORDER BY doc_id""",

    // td10's gram CTEs + a per-(doc, bench-doc) shared-count and the
    // same cross-multiplied > 0.2 contamination gate.
    "td37_contamination_source" -> """
      WITH w AS (SELECT doc_id, source, string_split(lower(text), ' ') AS words
                 FROM documents),
      g AS (SELECT doc_id, source,
              CASE WHEN len(words) >= 5
                THEN list_distinct(list_transform(range(1, len(words) - 3),
                       i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]
                            || ' ' || words[i+3] || ' ' || words[i+4]))
                ELSE [] END AS grams
            FROM w),
      b AS (SELECT doc_id AS bench_id, unnest(grams) AS gr FROM g
            WHERE source = 'src0'),
      e AS (SELECT doc_id, unnest(grams) AS gr FROM g WHERE source <> 'src0'),
      joined AS (SELECT e.doc_id, e.gr, b.bench_id FROM e JOIN b USING (gr)),
      nhits AS (SELECT doc_id, count(DISTINCT gr) AS n_hits
                FROM joined GROUP BY 1),
      hits AS (SELECT doc_id, bench_id, count(1) AS n_shared
               FROM joined GROUP BY 1, 2),
      sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g
                WHERE source <> 'src0' AND len(grams) > 0),
      ranked AS (
        SELECT h.doc_id, h.bench_id, h.n_shared, nh.n_hits, s.n_grams,
               row_number() OVER (PARTITION BY h.doc_id
                 ORDER BY h.n_shared DESC, h.bench_id) AS rk
        FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
             JOIN nhits nh ON h.doc_id = nh.doc_id
        WHERE nh.n_hits * 5 > s.n_grams)
      SELECT doc_id, bench_id,
             CAST(n_shared AS BIGINT) AS n_shared,
             CAST(n_hits AS BIGINT) AS n_hits,
             CAST(n_grams AS BIGINT) AS n_grams
      FROM ranked WHERE rk = 1
      ORDER BY doc_id""",

    // td22's integer score, ntile(3) tertiles, per-tier stats.
    "td36_ccnet_buckets" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bi AS (SELECT doc_id AS id, ws[i] || ' ' || ws[i+1] AS sh, ws[i] AS w1
             FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i)),
      c2 AS (SELECT sh, count(1) AS c2 FROM bi GROUP BY 1),
      c1 AS (SELECT w1, count(1) AS c1 FROM bi GROUP BY 1),
      lm AS (SELECT id AS doc_id,
               CAST(sum((c2 * 1000000) // c1) // count(1) AS BIGINT) AS score_micro
             FROM bi JOIN c2 USING (sh) JOIN c1 USING (w1) GROUP BY id),
      b AS (SELECT doc_id, score_micro,
              CAST(ntile(3) OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS bucket
            FROM lm)
      SELECT bucket,
             CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier,
             CAST(count(1) AS BIGINT) AS n_docs,
             CAST(min(score_micro) AS BIGINT) AS min_score_micro,
             CAST(max(score_micro) AS BIGINT) AS max_score_micro
      FROM b GROUP BY bucket ORDER BY bucket""",

    "td22_bigram_lm" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      bi AS (SELECT doc_id AS id, ws[i] || ' ' || ws[i+1] AS sh, ws[i] AS w1
             FROM w, LATERAL (SELECT unnest(range(1, len(ws))) AS i)),
      c2 AS (SELECT sh, count(1) AS c2 FROM bi GROUP BY 1),
      c1 AS (SELECT w1, count(1) AS c1 FROM bi GROUP BY 1)
      SELECT id AS doc_id, count(1) AS n_bigrams,
        CAST(sum((c2 * 1000000) // c1) // count(1) AS BIGINT) / 1e6 AS avg_cond_p,
        CAST((sum(CASE WHEN c2 <= 2 THEN 1 ELSE 0 END) * 1000000) // count(1) AS BIGINT) / 1e6 AS rare_ratio,
        (sum(CASE WHEN c2 <= 2 THEN 1 ELSE 0 END) * 1.0 / count(1) >= 0.5) AS flagged
      FROM bi JOIN c2 USING (sh) JOIN c1 USING (w1)
      GROUP BY id ORDER BY doc_id""",

    "td24_priority_dedup" -> s"""
      WITH RECURSIVE $shingleCte,
      e AS (SELECT doc_id AS id, unnest(shingles) AS sh FROM g),
      sizes AS (SELECT doc_id AS id, len(shingles) AS n FROM g),
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
      lab AS (SELECT d.doc_id AS id,
                     least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster,
                     coalesce(TRY_CAST(substring(d.source, 4, 10) AS INT),
                              2147483647) AS prio
              FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
              GROUP BY d.doc_id, d.source),
      keepers AS (SELECT cluster, id AS keep_id FROM (
        SELECT cluster, id,
               row_number() OVER (PARTITION BY cluster ORDER BY prio, id) AS rn
        FROM lab) WHERE rn = 1)
      SELECT l.id AS doc_id, l.cluster, k.keep_id, (l.id = k.keep_id) AS keep
      FROM lab l JOIN keepers k USING (cluster)
      ORDER BY doc_id""",

    // Canonical occurrence = min of the composite doc_id*1e6+pos —
    // plain integer ordering both engines agree on; removal positions
    // are the union of each non-canonical window's 8 covered slots.
    "td25_exact_substr_rm" -> """
      WITH ws AS (
        SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
      t AS (
        SELECT doc_id, CAST(unnest(range(0, len(ws))) AS BIGINT) AS pos,
               unnest(ws) AS w
        FROM ws),
      wins AS (
        SELECT doc_id, CAST(unnest(range(0, len(ws) - 7)) AS BIGINT) AS q,
               unnest(list_transform(range(0, len(ws) - 7),
                 i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' ||
                      ws[i+4] || ' ' || ws[i+5] || ' ' || ws[i+6] || ' ' ||
                      ws[i+7] || ' ' || ws[i+8])) AS g
        FROM ws WHERE len(ws) >= 8),
      dups AS (
        SELECT g, min(doc_id * 1000000 + q) AS keep_key
        FROM wins GROUP BY g HAVING count(1) >= 2),
      rm AS (
        SELECT DISTINCT w.doc_id, CAST(unnest(range(w.q, w.q + 8)) AS BIGINT) AS pos
        FROM wins w JOIN dups d ON w.g = d.g
        WHERE w.doc_id * 1000000 + w.q <> d.keep_key),
      kept AS (
        SELECT t.doc_id, count(1) AS n_kept,
               string_agg(t.w, ' ' ORDER BY t.pos) AS clean_text
        FROM t LEFT JOIN rm ON t.doc_id = rm.doc_id AND t.pos = rm.pos
        WHERE rm.doc_id IS NULL
        GROUP BY t.doc_id),
      totals AS (SELECT doc_id, count(1) AS n_tokens FROM t GROUP BY doc_id)
      SELECT totals.doc_id, totals.n_tokens,
             CAST(totals.n_tokens - coalesce(kept.n_kept, 0) AS BIGINT) AS n_removed,
             coalesce(kept.clean_text, '') AS clean_text
      FROM totals LEFT JOIN kept ON totals.doc_id = kept.doc_id
      ORDER BY totals.doc_id""",

    // Training arithmetic mirrored exactly: rational features (integer
    // div + power-of-two scales), per-round floor-scaled gradient sums,
    // left-associated dot products — every double op sees identical
    // operands in both engines.
    "td23_quality_probe" -> s"""
      WITH RECURSIVE $probeScoredCte,
      tot AS (SELECT CAST(sum(s6) AS BIGINT) AS t, count(1) AS n2 FROM scored)
      SELECT doc_id, y, s6 / 1e6 AS score,
             (s6 >= (SELECT CAST(floor(t / n2) AS BIGINT) FROM tot)) AS selected
      FROM scored
      ORDER BY doc_id""",

    // td23's trained scores bucketed at 15625-micro granularity
    // (floor of the identical IEEE double quotient), descending
    // cumulative confusion counts over the occupied buckets.
    "td66_classifier_calibration" -> s"""
      WITH RECURSIVE $probeScoredCte,
      hist AS (
        SELECT CAST(floor(s6 / 15625.0) AS BIGINT) AS thr_bucket,
               CAST(count(1) AS BIGINT) AS n,
               CAST(sum(CAST(y AS BIGINT)) AS BIGINT) AS pos
        FROM scored GROUP BY 1),
      cum AS (
        SELECT *,
               CAST(sum(n) OVER (ORDER BY thr_bucket DESC) AS BIGINT) AS n_pred_keep,
               CAST(sum(pos) OVER (ORDER BY thr_bucket DESC) AS BIGINT) AS tp,
               CAST(sum(pos) OVER () AS BIGINT) AS total_pos
        FROM hist)
      SELECT thr_bucket, n, pos, n_pred_keep, tp,
             n_pred_keep - tp AS fp,
             total_pos - tp AS fn,
             (tp * 1000000) // n_pred_keep AS precision_micro,
             CASE WHEN total_pos > 0
               THEN (tp * 1000000) // total_pos END AS recall_micro
      FROM cum
      ORDER BY thr_bucket"""
  )

  /** The td23 gradient-descent training replay shared by the td23 and
    * td66 oracles — feats, 5 recursive weight iterations, and the
    * floor'd integer micro scores. Callers prepend WITH RECURSIVE.
    */
  private val probeScoredCte = """
      feats AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0,
               len(string_split(lower(text), ' ')) / 128.0 AS x1,
               ((len(list_distinct(string_split(lower(text), ' '))) * 1048576)
                 // len(string_split(lower(text), ' '))) / 1048576.0 AS x2,
               ((length(text) * 1048576)
                 // len(string_split(lower(text), ' '))) / 1048576.0 / 16.0 AS x3
        FROM documents
        WHERE len(string_split(lower(text), ' ')) > 0),
      nn AS (SELECT count(1) AS n FROM feats),
      w(iter, w0, w1, w2, w3) AS (
        -- anchors CAST to DOUBLE: an untyped 0.0 anchor makes DuckDB
        -- type the whole recursion DECIMAL(2,1), quantizing training
        SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
               CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
        UNION ALL
        SELECT iter + 1,
          w0 - 0.25 * (CAST((SELECT sum(CAST(floor(x0 * (x0*w0 + x1*w1 + x2*w2 + x3*w3 - y) * 1e9) AS BIGINT)) FROM feats) AS DOUBLE) / 1e9) / (SELECT n FROM nn),
          w1 - 0.25 * (CAST((SELECT sum(CAST(floor(x1 * (x0*w0 + x1*w1 + x2*w2 + x3*w3 - y) * 1e9) AS BIGINT)) FROM feats) AS DOUBLE) / 1e9) / (SELECT n FROM nn),
          w2 - 0.25 * (CAST((SELECT sum(CAST(floor(x2 * (x0*w0 + x1*w1 + x2*w2 + x3*w3 - y) * 1e9) AS BIGINT)) FROM feats) AS DOUBLE) / 1e9) / (SELECT n FROM nn),
          w3 - 0.25 * (CAST((SELECT sum(CAST(floor(x3 * (x0*w0 + x1*w1 + x2*w2 + x3*w3 - y) * 1e9) AS BIGINT)) FROM feats) AS DOUBLE) / 1e9) / (SELECT n FROM nn)
        FROM w WHERE iter < 5),
      scored AS (
        SELECT doc_id, y,
               CAST(floor((x0*w0 + x1*w1 + x2*w2 + x3*w3) * 1e6) AS BIGINT) AS s6
        FROM feats CROSS JOIN (SELECT w0, w1, w2, w3 FROM w WHERE iter = 5))"""
}
