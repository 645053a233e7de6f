package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Checkpoints.BarrierOps

/** Media payload metadata produced by the decoder, plus the
  * resize-to-fit dims and a fixed-width feature vector (the
  * decode → resize → feature-extract stages of a multimodal pipeline).
  * The decode, resize, and feature stages are REAL (javax.imageio PNG
  * decode, Graphics2D resample, raster channel means); only the
  * payload itself is synthesized — the testdata carries text, not
  * media, so each row's PNG is generated from a deterministic pixel
  * function of the text length, which is what lets a SQL oracle
  * recompute the decoded metadata bit-for-bit.
  */
case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                     channels: Int, format: String,
                     rs_w: Int, rs_h: Int, feat: Array[Double])

/** Similarity search over `embeddings` (array<float>, dim 64) and
  * multimodal-column plumbing over binary payloads. Brute-force cosine is
  * the exact baseline (oracle-checked); sign-random-projection buckets
  * are the at-scale candidate-pruning path (rows-only check — the
  * hyperplanes are engine-internal). The "image decode" is a clearly
  * marked deterministic stub (no codec libs in this container): the
  * Spark-side plumbing — binary column, typed mapPartitions batch shape,
  * metadata struct schema — is real and oracle-checked.
  */
object SimilaritySuite extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact cosine near-dup pairs (threshold 0.4), norms computed once.
    "te01_cosine_pairs" -> { (s, dir) =>
      VectorOps.cosinePairs(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b")
    },

    // Exact ANN baseline: brute-force top-5 for every 25th vector.
    "te02_ann_topk" -> { (s, dir) =>
      val all = Tables.load(s, dir, "embeddings")
      val queries = all.filter(col("vec_id") % 25 === 0)
      VectorOps.bruteForceTopK(queries, all, "vec_id", "embedding", 5)
        .orderBy("query_id", "rk")
    },

    // At-scale ANN path: SRP-LSH bucketing (8 bits) with hamming-1
    // multi-probe, top-3 within the probed buckets per query. Fully
    // oracle-checked: the sign matrix is a multiplicative hash and the
    // projections are scaled-long sums, so DuckDB reproduces the exact
    // bucket ids (see SrpBucketLong).
    "te03_ann_srp_lsh" -> { (s, dir) =>
      import graft.functions.VectorExpressions.dot_scaled
      // v/nrm/bucket materialized through a repartition exchange so the
      // interpreted transform lambda isn't re-inlined per candidate pair
      // and the bucket join parallelizes (same pattern as cosinePairs).
      val nbits = 8
      // localCheckpoint (not just a repartition): the frame now feeds
      // THREE consumers — the query side, the corpus side, and the
      // hot-bucket probe, which is a separate action and would
      // re-execute the transform lambdas without a materialization.
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
        .withColumn("bucket", VectorOps.srpBucket(col("v"), nbits))
        .withColumn("nrm",
          sqrt(dot_scaled(col("v"), col("v")).cast("double") / lit(1e12)))
        .repartition(s.sparkContext.defaultParallelism)
        .barrier()
      val q = e.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"),
          explode(VectorOps.srpProbes(col("bucket"), nbits)).as("bucket"),
          col("v").as("qv"), col("nrm").as("qn"))
      val c = e.select(col("vec_id"), col("bucket"),
        col("v").as("cv"), col("nrm").as("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      // Hot-bucket-salted probe join (SkewJoin.saltedInnerHot): a
      // degenerate corpus that hashes into one SRP bucket would
      // otherwise put the whole candidate expansion on one task; the
      // probe is one 2^nbits-row aggregate, identical results.
      SkewJoin.saltedInnerHot(q, c, "bucket", col("query_id"),
          saltFactor = 16, hotThreshold = 4096L)
        .where(col("query_id") =!= col("vec_id"))
        .withColumn("cos", round(
          (dot_scaled(col("qv"), col("cv")).cast("double") / lit(1e12))
            / (col("qn") * col("cn")), 6))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
        .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
        .orderBy("query_id", "rk")
    },

    // IVF ANN: 16 cells (deterministic centroids = first 16 vectors),
    // nprobe=2, exact re-rank in probed cells — fully oracle-checked,
    // unlike the engine-internal SRP buckets of te03.
    "te05_ann_ivf" -> { (s, dir) =>
      VectorOps.ivfTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", _ % 25 === 0, nlist = 16, nprobe = 2, k = 5)
        .orderBy("query_id", "rk")
    },

    // Serving from a PERSISTED IVF index — td31's incremental story on
    // the vector side: the cell assignment is built once and written
    // CELL-PARTITIONED to parquet (the natural layout the ivfTopK
    // scaladoc names); queries then probe the STORE. The broadcast
    // probe join on the partition column engages dynamic partition
    // pruning, so unprobed cells' files are never read — asserted in
    // SimilaritySpec alongside result equality with te05 (same oracle).
    "te17_ivf_persisted" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te17_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val ranked = VectorOps.ivfRanked(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 16)
      ranked.where(col("crk") === 1)
        .select(col("id").as("vec_id"), col("cid").as("cell"),
          col("v"), col("nrm"))
        .write.mode("overwrite").partitionBy("cell").parquet(store)
      // partition-column values come back as the inferred (int) type —
      // restore the index's declared long cell id
      val stored = s.read.parquet(store)
        .select(col("cell").cast("long").as("cell"), col("vec_id"),
          col("v").as("cv2"), col("nrm").as("cn2"))
      val probes = ranked.where(col("id") % 25 === 0 && col("crk") <= 2)
        .select(col("id").as("query_id"), col("cid").as("cell"),
          col("v").as("qv"), col("nrm").as("qn"))
      VectorOps.ivfServe(stored, probes, 5).orderBy("query_id", "rk")
    },

    // TOMBSTONE-aware serving from the persisted IVF store (te30):
    // deletions land between index rebuilds in any real vector store.
    // The store is NOT rewritten — the (small, metadata-sized)
    // deletion list masks candidates via a broadcast anti-join, which
    // Catalyst pushes onto the store scan WITHOUT disturbing the
    // dynamic partition pruning on `cell` (unprobed cells' files are
    // still never read); remaining candidates re-rank, so the top-k
    // backfills past deleted neighbors. Oracle = te17's exact IVF
    // replay minus the deleted ids.
    "te30_ivf_tombstones" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te30_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val ranked = VectorOps.ivfRanked(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding", 16)
      ranked.where(col("crk") === 1)
        .select(col("id").as("vec_id"), col("cid").as("cell"),
          col("v"), col("nrm"))
        .write.mode("overwrite").partitionBy("cell").parquet(store)
      val stored = s.read.parquet(store)
        .select(col("cell").cast("long").as("cell"), col("vec_id"),
          col("v").as("cv2"), col("nrm").as("cn2"))
      // the deletion list arrives as its OWN small frame (the pattern:
      // a tombstone table, not a store rewrite)
      val dels = Tables.load(s, dir, "embeddings")
        .select(col("vec_id")).where(col("vec_id") % 7 === 3)
      val live = stored.join(broadcast(dels), Seq("vec_id"), "left_anti")
      // deleted ids don't issue queries either (they left the corpus)
      val probes = ranked.where(col("id") % 25 === 0 &&
          col("id") % 7 =!= 3 && col("crk") <= 2)
        .select(col("id").as("query_id"), col("cid").as("cell"),
          col("v").as("qv"), col("nrm").as("qn"))
      VectorOps.ivfServe(live, probes, 5).orderBy("query_id", "rk")
    },

    // INCREMENTAL IVF maintenance (te19): td31's nightly-batch story on
    // the vector side. The 80% existing corpus builds the store (frozen
    // quantizer = its 16 lowest-id vectors, cell-partitioned parquet);
    // the 20% new batch is assigned against the SAME frozen centroids
    // and APPENDED into its cells — the store is never rebuilt, the
    // batch never reshuffled. Queries (all inside the new batch) then
    // serve from the grown store; the oracle is the frozen-quantizer
    // IVF over the full corpus, so append ≡ rebuild bit for bit.
    "te19_ivf_incremental" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te19_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val emb = Tables.load(s, dir, "embeddings")
      val existing = emb.where(col("vec_id") % 5 =!= 0)
      val newBatch = emb.where(col("vec_id") % 5 === 0)
      val cent = VectorOps.ivfCentroids(existing, "vec_id", "embedding", 16)
        .barrier()
      def cells(batch: org.apache.spark.sql.DataFrame) =
        VectorOps.ivfAssign(batch, "vec_id", "embedding", cent)
          .where(col("crk") === 1)
          .select(col("id").as("vec_id"), col("cid").as("cell"),
            col("v"), col("nrm"))
      cells(existing).write.mode("overwrite").partitionBy("cell").parquet(store)
      cells(newBatch).write.mode("append").partitionBy("cell").parquet(store)
      val stored = s.read.parquet(store)
        .select(col("cell").cast("long").as("cell"), col("vec_id"),
          col("v").as("cv2"), col("nrm").as("cn2"))
      val probes = VectorOps.ivfAssign(
          newBatch.where(col("vec_id") % 25 === 0), "vec_id", "embedding", cent)
        .where(col("crk") <= 2)
        .select(col("id").as("query_id"), col("cid").as("cell"),
          col("v").as("qv"), col("nrm").as("qn"))
      VectorOps.ivfServe(stored, probes, 5).orderBy("query_id", "rk")
    },

    // Attribute-FILTERED ANN (te18): tenant/label-scoped vector search
    // — top-5 neighbours sharing the query's label. The label equality
    // sits in the probe⋈cell join condition, so mismatched candidates
    // never reach a dot product; nprobe is doubled to 4 because the
    // 10-value label filter keeps ~1/10 of each probed cell.
    "te18_filtered_ann" -> { (s, dir) =>
      VectorOps.ivfFilteredTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", "label", _ % 25 === 0,
          nlist = 16, nprobe = 4, k = 5)
        .orderBy("query_id", "rk")
    },

    // IVF with a k-means-FITTED quantizer (1 deterministic Lloyd
    // iteration: exact-decimal means, id tie-breaks) — the fit itself is
    // oracle-checked, not just the search.
    "te06_ann_ivf_kmeans" -> { (s, dir) =>
      VectorOps.ivfKmeansTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", _ % 25 === 0,
          nlist = 16, nprobe = 2, k = 5, lloydIters = 1)
        .orderBy("query_id", "rk")
    },

    // IVF nlist sizing audit (te38): the tuner family's index-
    // geometry leg — each candidate cell count fitted and reported
    // with the serving cost model's real inputs: surviving cells,
    // the mean/max balance factor (the per-cell skew exposure), and
    // the worst-case probed fraction at nprobe=2 (two largest cells'
    // share). One corpus × broadcast-centroid fit per candidate;
    // every rollup is cell-frame-sized.
    "te38_ivf_nlist_tuning" -> { (s, dir) =>
      VectorOps.ivfNlistTuning(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", Seq(8, 16, 32), lloydIters = 1)
        .orderBy("nlist")
    },

    // Stale-index gate (te36): the reindex decision from the index's
    // own persisted artifacts — the fitted (id, cell) assignment is
    // written once, and after corpus churn (vec_id % 3 == 0 rows
    // retired) each cell's fit-time vs live occupancy share is
    // compared on that STORED frame alone; the top-4 shifted cells
    // are the refit budget's worklist. A rank cut, not a share
    // threshold: a budget stays non-vacuous at any corpus size.
    "te36_stale_index_gate" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te36_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      VectorOps.staleIndexGate(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", store, _ % 3 =!= 0,
          nlist = 16, lloydIters = 1, topK = 4)
        .withColumnRenamed("id", "vec_id")
        .orderBy("cell")
    },

    // Budgeted partial reindex (te37): te36's worklist executed — the
    // 4 most-shifted cells' LIVE members split under the cell's two
    // smallest live ids as sub-seeds, each member to its nearer seed
    // by exact rounded cosine. Healthy cells are never read or
    // rescored; refit cost follows the drifted slice, not the corpus.
    "te37_partial_reindex" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te37_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      VectorOps.partialReindex(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", store, _ % 3 =!= 0,
          nlist = 16, lloydIters = 1, topK = 4)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    },

    // Cluster-quota diversity pruning (te35): te06's k-means fit put
    // to the data-pruning use — every vector ranked by cosine to its
    // OWN centroid (most prototypical first), at most 20 kept per
    // cluster, so a dominant embedding mode contributes the same
    // quota as a rare one. The whole prune is fit + one per-cell
    // window; the corpus is never compared pairwise.
    "te35_prototype_prune" -> { (s, dir) =>
      VectorOps.prototypePrune(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", nlist = 16, lloydIters = 1, cap = 20)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    },

    // PQ (product quantization) ANN: 8 subspaces × 8 dims, 16 centroids
    // per subspace (first 16 vectors' subvectors — deterministic), codes
    // by max scaled dot with cid tie-break, queries scored by ADC
    // (asymmetric distance: sum of the query's precomputed
    // query×centroid dots over the candidate's codes). The 100 TB
    // memory-compression path: the corpus is ranked from 8-byte codes
    // plus a broadcast query×centroid lookup table — the full vectors
    // are never touched at scoring time. Exact scaled-long sums keep it
    // bit-reproducible in the oracle.
    "te07_ann_pq" -> { (s, dir) =>
      VectorOps.pqTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", _ % 25 === 0, subDim = 8, nCent = 16, k = 5)
        .orderBy("query_id", "rk")
    },

    // Persisted PQ index serving (te22): the trilogy's third leg
    // (te17 stores IVF cells, te19 appends into them, this stores the
    // PQ CODES + codebook). Build lands 8 one-byte codes per vector
    // plus the 16×64-float codebook; at query time the query batch's
    // ADC tables come from the stored CODEBOOK alone and score the
    // stored CODES — the corpus floats are never read. Same oracle as
    // te07: store-then-serve ≡ in-memory, bit for bit.
    "te22_pq_persisted" -> { (s, dir) =>
      val store = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        "graft-te22_" + dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      val emb = Tables.load(s, dir, "embeddings")
      val sx = VectorOps.pqSubExplode(emb, "vec_id", "embedding", 8)
      val cent = sx.filter(col("vec_id") < 16)
        .select(col("vec_id").as("cid"), col("sub").as("csub"),
          col("dd").as("cdd"), col("x").as("cx"))
      // offline build: codes + codebook persisted
      VectorOps.pqArgmaxCodes(VectorOps.pqAdot(sx, cent))
        .write.mode("overwrite").parquet(s"$store/codes")
      cent.write.mode("overwrite").parquet(s"$store/codebook")
      // serving: query ADC from the STORED codebook + query vectors
      val qdot = VectorOps.pqAdot(
          VectorOps.pqSubExplode(emb.where(col("vec_id") % 25 === 0),
            "vec_id", "embedding", 8),
          s.read.parquet(s"$store/codebook"))
        .select(col("vec_id").as("query_id"), col("sub").as("qsub"),
          col("cid"), col("dt"))
      VectorOps.pqServe(s.read.parquet(s"$store/codes"), qdot, 5)
        .orderBy("query_id", "rk")
    },

    // Full FAISS IndexIVFPQ composition: IVF cells prune to nprobe=2
    // of 16 cells, PQ-ADC scores only those cells' codes into a
    // top-20 shortlist, exact cosine re-ranks the shortlist — the
    // 100 TB serving path where even the ADC scan is cell-pruned.
    "te09_ann_ivfpq" -> { (s, dir) =>
      VectorOps.ivfPqTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", _ % 25 === 0, nlist = 16, nprobe = 2,
          subDim = 8, nCent = 16, shortlist = 20, k = 5)
        .orderBy("query_id", "rk")
    },

    // Two-stage ANN: PQ-ADC shortlist (top 20 from codes alone) then
    // EXACT cosine re-rank of only those pairs — FAISS-style
    // refine-after-prefilter; the exact math never touches the corpus
    // pair space.
    "te08_ann_pq_rerank" -> { (s, dir) =>
      VectorOps.pqRerankTopK(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", _ % 25 === 0, subDim = 8, nCent = 16,
          shortlist = 20, k = 5)
        .orderBy("query_id", "rk")
    },

    // Embedding-cosine near-dup dedup: connected pairs above 0.45 keep
    // the lower id as representative (one-hop union: keep_id = min peer).
    "te04_embedding_neardup" -> { (s, dir) =>
      val pairs = VectorOps.cosinePairs(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", 0.45)
      pairs.select(col("id_b").as("vec_id"), col("id_a").as("peer"))
        .groupBy(col("vec_id")).agg(min(col("peer")).as("keep_id"))
        .orderBy("vec_id")
    },

    // SemDeDup: cluster on 16 coarse centroids, pair only within a
    // cluster, connect pairs with cosine ≥ 0.4 into duplicate groups,
    // keep the min id per group — cluster-bounded pairwise, never O(n²).
    // Cells above the (default 4096-row) cap split hierarchically at
    // scale; the cap never fires at these SFs (max cell 148 at sf0.1),
    // so the single-level oracle below stays exact.
    "te10_semantic_dedup" -> { (s, dir) =>
      VectorOps.semanticDedup(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", nlist = 16, threshold = 0.4)
        .orderBy("vec_id")
    },

    // Approximate k-NN graph over the WHOLE corpus (every node's top-3
    // neighbors from its SRP bucket, mutual edges flagged) — the
    // neighbor-graph substrate for graph clustering / diversity
    // filtering. Bucketed candidate generation, per-node window top-k,
    // keyed mutuality self-join; no n² stage.
    "te11_knn_graph" -> { (s, dir) =>
      VectorOps.knnGraph(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", nbits = 6, k = 3)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "rk")
    },

    // Embedding-outlier detection: exact corpus centroid (one
    // aggregate), map-side cosine against the broadcast centroid,
    // below-floor-mean flag — the embedding-noise filter of a curation
    // pipeline. Corpus never reshuffles.
    "te12_centroid_outliers" -> { (s, dir) =>
      VectorOps.centroidOutliers(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding")
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id")
    },

    // Multimodal: binary payload → REAL javax.imageio decode →
    // Graphics2D resize → raster-mean features, batched per partition.
    // The PNG bytes are synthesized from a deterministic pixel function
    // of the text payload (no media in the testdata), which is what
    // lets the DuckDB oracle recompute the decoded metadata exactly —
    // everything downstream of the byte array runs the real codec path.
    "mm01_decode_meta" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val n = bytes.length
          // Payload synthesis: a small real PNG whose pixels are a
          // deterministic function of n (stands in for the upstream
          // system that produced the media bytes).
          val w0 = 8 + n % 24
          val h0 = 6 + n % 18
          val src = new java.awt.image.BufferedImage(
            w0, h0, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h0) {
            var x = 0
            while (x < w0) {
              val r = (x * 31 + y * 17 + n) % 256
              val g = (x * 13 + y * 29 + n * 3) % 256
              val b = (x * 7 + y * 11 + n * 5) % 256
              src.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(src, "png", buf)
          val png = buf.toByteArray
          // REAL decode: the codec parses the PNG container + IDAT.
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
          val (w, h) = (img.getWidth, img.getHeight)
          val channels = img.getRaster.getNumBands
          // REAL resize to fit 16 px on the long edge, aspect kept.
          val m = math.max(w, h)
          val (rsW, rsH) = (math.max(1, w * 16 / m), math.max(1, h * 16 / m))
          val resized = new java.awt.image.BufferedImage(
            rsW, rsH, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = resized.createGraphics()
          g2.drawImage(img, 0, 0, rsW, rsH, null)
          g2.dispose()
          // REAL feature extraction: per-channel means of the DECODED
          // raster (integer sums, so the oracle divides the same exact
          // longs). PNG is lossless — decoded pixels == written pixels.
          var sr = 0L; var sg = 0L; var sb = 0L
          y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          val px = (w * h).toDouble
          MediaMeta(id, n, w, h,
            channels = channels,
            format = "png",
            rs_w = rsW,
            rs_h = rsH,
            feat = Array(sr / px, sg / px, sb / px, (sr + sg + sb) / (3.0 * px)))
        })
        .toDF()
        // the feature vector stays an array<double> column inside the
        // pipeline; the oracle-facing projection flattens it (array
        // string forms differ between pandas and DuckDB)
        .select(col("doc_id"), col("n_bytes"), col("width"), col("height"),
          col("channels"), col("format"), col("rs_w"), col("rs_h"),
          element_at(col("feat"), 1).as("f0"),
          element_at(col("feat"), 2).as("f1"),
          element_at(col("feat"), 3).as("f2"),
          element_at(col("feat"), 4).as("f3"))
        .orderBy("doc_id")
    },

    // Multimodal: audio-style DSP over a binary payload — the payload
    // bytes are treated as 8-bit PCM samples, windowed into 100-sample
    // frames (full frames only) with per-frame RMS and peak, the
    // loudness-analysis shape of an audio curation pipeline. Real byte
    // arithmetic in a typed mapPartitions batch; integer sum-of-squares
    // so the oracle's sqrt sees identical operands.
    "mm03_audio_rms" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          val frames = bytes.length / 100
          Iterator.tabulate(frames) { f =>
            var i = f * 100
            val end = i + 100
            var sumsq = 0L
            var peak = 0
            while (i < end) {
              val v = bytes(i) & 0xff
              sumsq += v.toLong * v
              if (v > peak) peak = v
              i += 1
            }
            (id, f, math.sqrt(sumsq / 100.0), peak)
          }
        }
        .toDF("doc_id", "frame_idx", "rms", "peak")
        .orderBy("doc_id", "frame_idx")
    },

    // Multimodal: frame sampling for "video" payloads (every 30th frame
    // of n_bytes%240 frames) with frame timestamps.
    "mm02_frame_sample" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          (length(col("text").cast("binary")) % 240).as("n_frames"))
        .where(col("n_frames") > 0)
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(30))).as("frame_idx"))
        .withColumn("frame_ts", round(col("frame_idx") / 24.0, 6))
        .orderBy("doc_id", "frame_idx")
    },

    // Multimodal: VAD-style silence trimming over "audio" payloads —
    // the speech-segment extraction step of an audio curation
    // pipeline. Frames are mm03's 100-byte blocks; a frame is "speech"
    // when its integer energy (sum of squared samples) clears the
    // threshold, and consecutive speech frames collapse into segments
    // via gaps-and-islands (island id = frame_idx - dense row number)
    // — one typed partition-parallel pass for energies, one window +
    // one keyed aggregate for the islands. Per-key state is a row
    // number; a 100 TB audio corpus distributes by clip.
    "mm05_speech_segments" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          val frames = bytes.length / 100
          Iterator.tabulate(frames) { f =>
            var i = f * 100
            val end = i + 100
            var sumsq = 0L
            while (i < end) { val v = bytes(i) & 0xff; sumsq += v.toLong * v; i += 1 }
            (id, f, sumsq)
          }
        }
        .toDF("doc_id", "frame_idx", "energy")
        .where(col("energy") > 981000L)
        .withColumn("island", col("frame_idx") - row_number().over(w))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("frame_idx")).as("start_frame"),
          max(col("frame_idx")).as("end_frame"),
          count(lit(1)).as("n_frames"))
        .select(col("doc_id"), col("start_frame"), col("end_frame"), col("n_frames"))
        .orderBy("doc_id", "start_frame")
    },

    // Multimodal: shot-boundary detection over "video" payloads — the
    // scene-segmentation step of a video curation pipeline. Each
    // payload is framed into consecutive 64-byte blocks (full frames
    // only), per-frame intensity = integer byte sum, a boundary fires
    // where the intensity jumps by more than 200 against the previous
    // frame, and a running boundary count assigns each frame its shot
    // id (so downstream sampling can take k frames per shot). Frame
    // sums are a typed partition-parallel pass; the lag/shot-id pass is
    // one window shuffle keyed on the doc — no driver state, no
    // all-pairs work, the shape that holds at 100 TB of video.
    "mm04_shot_boundaries" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .flatMap { case (id, bytes) =>
          val frames = bytes.length / 64
          Iterator.tabulate(frames) { f =>
            var i = f * 64
            val end = i + 64
            var acc = 0L
            while (i < end) { acc += bytes(i) & 0xff; i += 1 }
            (id, f, acc)
          }
        }
        .toDF("doc_id", "frame_idx", "fsum")
        .withColumn("delta", col("fsum") - lag(col("fsum"), 1).over(w))
        .withColumn("is_boundary",
          coalesce(abs(col("delta")) > 200, lit(false)))
        .withColumn("shot_id",
          sum(when(col("is_boundary"), 1L).otherwise(0L)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .orderBy("doc_id", "frame_idx")
    },

    // Per-shot frame sampling (mm11): the downstream step mm04's shot
    // ids exist for — keep the first 2 frames of every shot (a
    // keyframe budget per scene), one rank window over the mm04
    // output. Output carries the shot's frame count so the sampling
    // ratio is visible.
    "mm11_shot_sample" -> { (s, dir) =>
      val shots = queries("mm04_shot_boundaries")(s, dir)
      val w = Window.partitionBy(col("doc_id"), col("shot_id"))
        .orderBy(col("frame_idx"))
      shots
        .withColumn("rk", row_number().over(w))
        .withColumn("shot_frames", count(lit(1)).over(
          Window.partitionBy(col("doc_id"), col("shot_id"))))
        .where(col("rk") <= 2)
        .select(col("doc_id"), col("shot_id"), col("frame_idx"),
          col("fsum"), col("shot_frames"))
        .orderBy("doc_id", "shot_id", "frame_idx")
    },

    // ASR-batch chunking (mm10): td27's sliding-window chunking on the
    // AUDIO axis — every mm05 speech segment is cut into fixed 3-frame
    // windows at stride 2 (1-frame overlap, the context ASR batching
    // wants), short tails clamped to the segment end, at least one
    // chunk per segment. Pure integer arithmetic over the segment
    // frame, map-side after the mm05 derivation.
    "mm10_speech_chunks" -> { (s, dir) =>
      val segs = queries("mm05_speech_segments")(s, dir)
      val w = lit(3); val st = lit(2)
      val n = lit(1) + greatest(lit(0),
        ceil((col("n_frames") - w).cast("double") / st).cast("int"))
      segs.withColumn("chunk_idx", explode(sequence(lit(0), n - 1)))
        .withColumn("chunk_start", col("start_frame") + col("chunk_idx") * st)
        .withColumn("chunk_end",
          least(col("chunk_start") + w - 1, col("end_frame")))
        .select(col("doc_id"), col("start_frame"), col("chunk_idx"),
          col("chunk_start"), col("chunk_end"),
          (col("chunk_end") - col("chunk_start") + 1).as("chunk_frames"))
        .orderBy("doc_id", "start_frame", "chunk_idx")
    },

    // Cross-modal ALIGNMENT (mm09): snap each speech segment (mm05's
    // audio modality, 100-byte frames) onto the video shot (mm04's
    // modality, 64-byte frames) in progress when the segment starts —
    // the transcript↔scene alignment step of a video curation
    // pipeline. The two modalities tick in different frame units, so
    // both are projected onto the shared BYTE timeline and matched
    // with the event-time as-of join (latest shot start at or before
    // the segment start) — one union + one running window per doc,
    // the AsOfJoin scale shape, no per-segment lookups.
    "mm09_transcript_align" -> { (s, dir) =>
      val segs = queries("mm05_speech_segments")(s, dir)
        .withColumn("seg_byte", col("start_frame").cast("long") * 100L)
      val shots = queries("mm04_shot_boundaries")(s, dir)
        .groupBy(col("doc_id"), col("shot_id"))
        .agg(min(col("frame_idx")).as("shot_start_frame"))
        .withColumn("shot_byte", col("shot_start_frame").cast("long") * 64L)
      AsOfJoin.asOf(segs, shots, "doc_id", "seg_byte", "shot_byte",
          Seq("shot_id", "shot_start_frame"))
        .select(col("doc_id"), col("start_frame"), col("end_frame"),
          col("n_frames"), col("asof.shot_id").as("shot_id"),
          col("asof.shot_start_frame").as("shot_start_frame"))
        .orderBy("doc_id", "start_frame")
    },

    // Cross-modal retrieval: the image modality drives a query into the
    // embedding space. Each doc's payload goes through the REAL PNG
    // decode (mm01 path) to a brightness scalar, brightness quantizes
    // docs into 16 buckets, each bucket's member embeddings (doc_id =
    // vec_id) form a centroid, and the top-3 members per bucket by
    // dot(member, centroid) come back — the image→cluster→ANN-probe
    // shape of a multimodal curation pipeline. All vector arithmetic is
    // floor-scaled longs (dims explode once; the centroid side is 16×64
    // rows, which AQE broadcasts back onto the member scan), so at
    // scale the corpus is read once and never reshuffled by dim.
    "mm06_crossmodal_topk" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      // Decode ONLY documents that have an embedding (semi-join gate
      // before the codec pass — media decode is the expensive stage,
      // never spend it on rows the pipeline drops), and decode them
      // ONCE: the exploded feature frame below is consumed by both the
      // centroid and the scoring aggregate, so it is checkpointed
      // instead of recomputed per consumer.
      val bright = Tables.load(s, dir, "documents")
        .join(emb.select(col("vec_id")), col("doc_id") === col("vec_id"),
          "left_semi")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val n = bytes.length
          val w0 = 8 + n % 24
          val h0 = 6 + n % 18
          val src = new java.awt.image.BufferedImage(
            w0, h0, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h0) {
            var x = 0
            while (x < w0) {
              val r = (x * 31 + y * 17 + n) % 256
              val g = (x * 13 + y * 29 + n * 3) % 256
              val b = (x * 7 + y * 11 + n * 5) % 256
              src.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val buf = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(src, "png", buf)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(buf.toByteArray))
          var s0 = 0L
          y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              s0 += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          (id, s0.toDouble / (3.0 * img.getWidth * img.getHeight))
        })
        .toDF("doc_id", "f3")
        .select(col("doc_id"), floor(col("f3") / 16).cast("int").as("bucket"))
      val ex = bright
        .join(emb, col("doc_id") === col("vec_id"))
        .select(col("bucket"), col("vec_id"),
          posexplode(col("embedding")).as(Seq("d", "x")))
        .select(col("bucket"), col("vec_id"), col("d"),
          floor(col("x").cast("double") * 1e7).cast("long").as("xs"))
        .barrier()
      val cent = ex.groupBy(col("bucket"), col("d"))
        .agg(floor(sum(col("xs")).cast("double") / count(lit(1))).cast("long").as("c"))
      val dots = ex.join(cent, Seq("bucket", "d"))
        .groupBy(col("bucket"), col("vec_id"))
        .agg(sum(col("xs") * col("c")).cast("long").as("dot_s"))
      val rw = Window.partitionBy(col("bucket"))
        .orderBy(col("dot_s").desc, col("vec_id"))
      dots.withColumn("rnk", row_number().over(rw))
        .filter(col("rnk") <= 3)
        .select(col("bucket"), col("rnk"), col("vec_id"), col("dot_s"))
        .orderBy("bucket", "rnk")
    },

    // Embedding-space decontamination vs a held-out eval split (te31):
    // every 20th vector stands in for "the benchmark"; train vectors
    // within cosine 0.4 of any eval vector are flagged with hit count
    // and best score. Eval side broadcasts (bounded like a real
    // benchmark set); the train side is one corpus-linear pass.
    "te31_eval_contamination" -> { (s, dir) =>
      VectorOps.evalContamination(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", 20, 0.4)
        .orderBy("train_id")
    },

    // te31's IVF-pruned twin (te32): the scale path when the eval set
    // outgrows the broadcast guard — train corpus as the IVF index,
    // eval vectors probe nprobe cells; diff vs te31 = recall report.
    "te32_ivf_contamination" -> { (s, dir) =>
      VectorOps.ivfEvalContamination(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding", 20, 0.4, nlist = 16, nprobe = 2)
        .orderBy("train_id")
    }
  )

  /** One-Lloyd-iteration k-means replay shared by the te06/te35/te36/
    * te37/te38 oracles: seed cells = first `nlist` vectors, one
    * exact-decimal mean update, final assignment r1 exposing BOTH the
    * rank (crk) and the rounded centroid cosine (cosc). `sfx`
    * suffixes every CTE name so te38 composes several fits in one
    * statement.
    */
  private def kmeansCte(nlist: Int, sfx: String = ""): String =
    kmeans1CteTemplate
      .replace("<N>", nlist.toString)
      .replace("<S>", sfx)

  private def kmeans1Cte: String = kmeansCte(16)

  private val kmeans1CteTemplate = """ex<S> AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms<S> AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS vn
        FROM ex<S> GROUP BY vec_id),
      cm0<S> AS (SELECT vec_id AS cell, d, x AS mx FROM ex<S> WHERE vec_id < <N>),
      cn0<S> AS (
        SELECT cell, sqrt(CAST(sum(CAST(floor((mx * mx) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS cn
        FROM cm0<S> GROUP BY cell),
      a0<S> AS (
        SELECT e.vec_id, cm0<S>.cell,
               CAST(sum(CAST(floor((e.x * cm0<S>.mx) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex<S> e JOIN cm0<S> ON e.d = cm0<S>.d
        GROUP BY 1, 2),
      r0<S> AS (
        SELECT a0<S>.vec_id AS vec_id, a0<S>.cell AS cell,
               row_number() OVER (PARTITION BY a0<S>.vec_id
                 ORDER BY round(dot / (nv.vn * cn0<S>.cn), 6) DESC, a0<S>.cell) AS crk
        FROM a0<S> JOIN norms<S> nv ON a0<S>.vec_id = nv.vec_id
                JOIN cn0<S> ON a0<S>.cell = cn0<S>.cell),
      cells0<S> AS (SELECT vec_id, cell FROM r0<S> WHERE crk = 1),
      cm1<S> AS (
        SELECT cell, d,
               CAST(sum(CAST(e.x AS DECIMAL(25,6))) AS DOUBLE) / count(1) AS mx
        FROM ex<S> e JOIN cells0<S> c0 ON e.vec_id = c0.vec_id
        GROUP BY cell, d),
      cn1<S> AS (
        SELECT cell, sqrt(CAST(sum(CAST(floor((mx * mx) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS cn
        FROM cm1<S> GROUP BY cell),
      a1<S> AS (
        SELECT e.vec_id, cm1<S>.cell,
               CAST(sum(CAST(floor((e.x * cm1<S>.mx) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex<S> e JOIN cm1<S> ON e.d = cm1<S>.d
        GROUP BY 1, 2),
      r1<S> AS (
        SELECT a1<S>.vec_id AS vec_id, a1<S>.cell AS cell,
               round(dot / (nv.vn * cn1<S>.cn), 6) AS cosc,
               row_number() OVER (PARTITION BY a1<S>.vec_id
                 ORDER BY round(dot / (nv.vn * cn1<S>.cn), 6) DESC, a1<S>.cell) AS crk
        FROM a1<S> JOIN norms<S> nv ON a1<S>.vec_id = nv.vec_id
                JOIN cn1<S> ON a1<S>.cell = cn1<S>.cell),
      cells1<S> AS (SELECT vec_id, cell FROM r1<S> WHERE crk = 1)"""

  /** te36's occupancy-shift gate over the shared fit's assignment,
    * factored so te37 flags from the same definition. Appends to
    * [[kmeans1Cte]] (uses cells1).
    */
  private val staleGateCte = """assign AS (SELECT vec_id, cell FROM cells1),
      fitc AS (SELECT cell, CAST(count(1) AS BIGINT) AS n_fit
               FROM assign GROUP BY 1),
      livec AS (SELECT cell, CAST(count(1) AS BIGINT) AS n_live
                FROM assign WHERE vec_id % 3 <> 0 GROUP BY 1),
      jc AS (SELECT f.cell, f.n_fit, coalesce(l.n_live, 0) AS n_live
             FROM fitc f LEFT JOIN livec l ON l.cell = f.cell),
      sh AS (SELECT cell, n_fit, n_live,
               (n_fit * 1000000) // (SELECT sum(n_fit) FROM jc) AS fit_share_micro,
               CASE WHEN (SELECT sum(n_live) FROM jc) > 0
                 THEN (n_live * 1000000) // (SELECT sum(n_live) FROM jc)
                 ELSE 0 END AS live_share_micro
             FROM jc),
      gate AS (
        SELECT cell, n_fit, n_live,
               CAST(fit_share_micro AS BIGINT) AS fit_share_micro,
               CAST(live_share_micro AS BIGINT) AS live_share_micro,
               CAST(abs(fit_share_micro - live_share_micro) AS BIGINT) AS shift_micro,
               CAST(row_number() OVER (
                 ORDER BY abs(fit_share_micro - live_share_micro) DESC, cell)
                 AS BIGINT) AS reindex_rank
        FROM sh)"""

  private val pqOracleSql = """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      sx AS (SELECT vec_id, d // 8 AS sub, d % 8 AS dd, x FROM ex),
      cent AS (SELECT vec_id AS cid, sub, dd, x AS cx FROM sx WHERE vec_id < 16),
      adot AS (
        SELECT v.vec_id, v.sub, c.cid,
               sum(CAST(floor((v.x * c.cx) * 1e12) AS BIGINT)) AS dt
        FROM sx v JOIN cent c ON v.sub = c.sub AND v.dd = c.dd
        GROUP BY 1, 2, 3),
      codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                      ORDER BY dt DESC, cid) AS rk FROM adot)
        WHERE rk = 1),
      qdot AS (SELECT vec_id AS query_id, sub, cid, dt FROM adot
               WHERE vec_id % 25 = 0),
      scored AS (
        SELECT q.query_id, c.vec_id,
               CAST(sum(q.dt) AS DOUBLE) / 1e12 AS score
        FROM codes c
        JOIN qdot q ON c.sub = q.sub AND c.code = q.cid
        WHERE q.query_id <> c.vec_id
        GROUP BY 1, 2)
      SELECT query_id, vec_id, round(score, 6) AS score, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY score DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk"""

  private val ivfOracleSql = """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d AND c.vec_id < 16
        GROUP BY 1, 2),
      cranked AS (
        SELECT cdots.vec_id AS vec_id, cid,
               row_number() OVER (PARTITION BY cdots.vec_id
                 ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
        FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                   JOIN norms nc ON cdots.cid = nc.vec_id),
      cells AS (SELECT vec_id, cid AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
                 WHERE crk <= 2 AND vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id, cl.cell
        FROM probes p JOIN cells cl USING (cell)
        WHERE p.query_id <> cl.vec_id),
      dots AS (
        SELECT cand.query_id, cand.vec_id, cand.cell,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand JOIN ex q ON q.vec_id = cand.query_id
                  JOIN ex c ON c.vec_id = cand.vec_id AND q.d = c.d
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT query_id, dots.vec_id AS vec_id, cell,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, cell, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk"""

  /** te30 = te17's exact IVF replay with the tombstone predicate: the
    * deleted ids (vec_id % 7 = 3) issue no queries and never appear as
    * candidates; everything else (cell assignment, probing, re-rank)
    * is byte-identical, derived from [[ivfOracleSql]] by anchored
    * rewrites so the two oracles cannot drift apart.
    */
  private val te30OracleSql = {
    val probesAnchor = "WHERE crk <= 2 AND vec_id % 25 = 0"
    val candAnchor = "WHERE p.query_id <> cl.vec_id"
    require(ivfOracleSql.contains(probesAnchor) &&
      ivfOracleSql.contains(candAnchor), "ivfOracleSql anchors moved")
    ivfOracleSql
      .replace(probesAnchor, probesAnchor + " AND vec_id % 7 <> 3")
      .replace(candAnchor, candAnchor + " AND cl.vec_id % 7 <> 3")
  }

  override def oracleSql: Map[String, String] = Map(
    "te01_cosine_pairs" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex a JOIN ex b ON a.d = b.d AND a.vec_id < b.vec_id
        GROUP BY 1, 2)
      SELECT id_a, id_b, cos FROM (
        SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos
        FROM dots JOIN norms na ON id_a = na.vec_id
                  JOIN norms nb ON id_b = nb.vec_id)
      WHERE cos >= 0.4
      ORDER BY id_a, id_b""",

    // SRP-LSH with multi-probe, fully recomputed: the sign matrix is a
    // multiplicative hash and projections are exact scaled-long sums,
    // so bucket ids match Spark's SrpBucketLong bit for bit.
    "te03_ann_srp_lsh" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      bits AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS b),
      signs AS (
        SELECT b, d, CASE WHEN xor(h3, h3 >> 16) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sgn
        FROM (SELECT b, d, ((xor(h1, h1 >> 16) % 134217728) * 1597334677) % 4294967296 AS h3
              FROM (SELECT b, d, ((b * 64 + d + 1) * 2654435761) % 4294967296 AS h1
                    FROM bits CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INT) AS d)))),
      proj AS (
        SELECT vec_id, b,
               sum(CAST(floor((sgn * x) * 1e12) AS BIGINT)) AS p
        FROM ex JOIN signs USING (d)
        GROUP BY 1, 2),
      buckets AS (
        SELECT vec_id, sum(CASE WHEN p >= 0 THEN 1 << b ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id),
      probes AS (
        SELECT vec_id AS query_id,
               CASE WHEN pb = 0 THEN bucket ELSE xor(bucket, 1 << (pb - 1)) END AS bucket
        FROM buckets CROSS JOIN (SELECT CAST(unnest(range(0, 9)) AS INT) AS pb)
        WHERE vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, bu.vec_id
        FROM probes p JOIN buckets bu USING (bucket)
        WHERE p.query_id <> bu.vec_id),
      dots AS (
        SELECT c.query_id, c.vec_id,
               CAST(sum(CAST(floor((q.x * e.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand c JOIN ex q ON q.vec_id = c.query_id
                    JOIN ex e ON e.vec_id = c.vec_id AND e.d = q.d
        GROUP BY 1, 2),
      scored AS (
        SELECT query_id, dots.vec_id AS vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 3
      ORDER BY query_id, rk""",

    "te02_ann_topk" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex q JOIN ex c ON q.d = c.d
        WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      scored AS (
        SELECT dots.query_id AS query_id, dots.vec_id AS vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    "te05_ann_ivf" -> ivfOracleSql,

    // Identical oracle: serving from the persisted cell-partitioned
    // index must reproduce the in-memory IVF result bit for bit.
    "te17_ivf_persisted" -> ivfOracleSql,
    "te30_ivf_tombstones" -> te30OracleSql,

    // te05's oracle with the quantizer frozen to the 16 lowest
    // EXISTING ids (vec_id % 5 <> 0): append ≡ rebuild, so the oracle
    // is simply the frozen-quantizer IVF over the full corpus.
    "te19_ivf_incremental" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      cents AS (SELECT vec_id AS ccid FROM embeddings
                WHERE vec_id % 5 <> 0 ORDER BY vec_id LIMIT 16),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d
             JOIN cents ct ON ct.ccid = c.vec_id
        GROUP BY 1, 2),
      cranked AS (
        SELECT cdots.vec_id AS vec_id, cid,
               row_number() OVER (PARTITION BY cdots.vec_id
                 ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
        FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                   JOIN norms nc ON cdots.cid = nc.vec_id),
      cells AS (SELECT vec_id, cid AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
                 WHERE crk <= 2 AND vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id, cl.cell
        FROM probes p JOIN cells cl USING (cell)
        WHERE p.query_id <> cl.vec_id),
      dots AS (
        SELECT cand.query_id, cand.vec_id, cand.cell,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand JOIN ex q ON q.vec_id = cand.query_id
                  JOIN ex c ON c.vec_id = cand.vec_id AND q.d = c.d
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT query_id, dots.vec_id AS vec_id, cell,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, cell, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    // te05's oracle with the label filter applied at the candidate
    // stage (pre-filter) and nprobe=4.
    "te18_filtered_ann" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      lab AS (SELECT vec_id, label FROM embeddings),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d AND c.vec_id < 16
        GROUP BY 1, 2),
      cranked AS (
        SELECT cdots.vec_id AS vec_id, cid,
               row_number() OVER (PARTITION BY cdots.vec_id
                 ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
        FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                   JOIN norms nc ON cdots.cid = nc.vec_id),
      cells AS (SELECT vec_id, cid AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
                 WHERE crk <= 4 AND vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id, lq.label AS attr
        FROM probes p JOIN cells cl USING (cell)
             JOIN lab lq ON lq.vec_id = p.query_id
             JOIN lab lc ON lc.vec_id = cl.vec_id AND lc.label = lq.label
        WHERE p.query_id <> cl.vec_id),
      dots AS (
        SELECT cand.query_id, cand.vec_id, cand.attr,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand JOIN ex q ON q.vec_id = cand.query_id
                  JOIN ex c ON c.vec_id = cand.vec_id AND q.d = c.d
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT query_id, dots.vec_id AS vec_id, attr,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, attr, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    // Three suffixed copies of the shared fit replay (nlist 8/16/32),
    // each reduced to its cell-size frame and one audit row; top2 by
    // ORDER BY n DESC LIMIT 2 (tie choice cannot change the sum).
    "te38_ivf_nlist_tuning" -> s"""
      WITH ${kmeansCte(8, "_8")},
      ${kmeansCte(16, "_16")},
      ${kmeansCte(32, "_32")},
      ${Seq(8, 16, 32).map { nl =>
        s"""pc_$nl AS (SELECT cell, CAST(count(1) AS BIGINT) AS n
               FROM cells1_$nl GROUP BY 1),
      ag_$nl AS (SELECT CAST($nl AS BIGINT) AS nlist,
                CAST(count(1) AS BIGINT) AS n_cells,
                CAST(sum(n) AS BIGINT) AS n_total,
                CAST(max(n) AS BIGINT) AS max_cell,
                CAST((SELECT sum(n) FROM
                  (SELECT n FROM pc_$nl ORDER BY n DESC LIMIT 2))
                  AS BIGINT) AS top2
         FROM pc_$nl)"""
      }.mkString(",\n      ")},
      u AS (SELECT * FROM ag_8 UNION ALL SELECT * FROM ag_16
            UNION ALL SELECT * FROM ag_32)
      SELECT nlist, n_cells, n_total, max_cell,
             (n_total * 1000000) // (n_cells * max_cell) AS balance_micro,
             (top2 * 1000000) // n_total AS top2_share_micro
      FROM u ORDER BY nlist""",

    // The shared fit's assignment counted twice on the same frame
    // (all rows = fit time, vec_id % 3 <> 0 = live), floor'd shares
    // over the window totals, abs shift, rank cut at 4.
    "te36_stale_index_gate" -> s"""
      WITH $kmeans1Cte,
      $staleGateCte
      SELECT cell, n_fit, n_live, fit_share_micro, live_share_micro,
             shift_micro, reindex_rank, reindex_rank <= 4 AS needs_reindex
      FROM gate
      ORDER BY cell""",

    // te36's top-4 cells' live members scored against the cell's two
    // smallest live ids with the engine's exact floor-scaled dot /
    // rounded cosine; each member keeps its best (cos DESC, seed ASC).
    "te37_partial_reindex" -> s"""
      WITH $kmeans1Cte,
      $staleGateCte,
      flagged AS (SELECT cell FROM gate WHERE reindex_rank <= 4),
      members AS (
        SELECT a.vec_id, a.cell FROM assign a
        JOIN flagged f ON f.cell = a.cell
        WHERE a.vec_id % 3 <> 0),
      seeds AS (
        SELECT cell, vec_id AS seed_id FROM (
          SELECT m.*, row_number() OVER (PARTITION BY cell
            ORDER BY vec_id) AS srk FROM members m)
        WHERE srk <= 2),
      sdots AS (
        SELECT m.vec_id, m.cell, s.seed_id,
               CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM members m
        JOIN seeds s ON s.cell = m.cell
        JOIN ex a ON a.vec_id = m.vec_id
        JOIN ex b ON b.vec_id = s.seed_id AND b.d = a.d
        GROUP BY 1, 2, 3),
      sc AS (
        SELECT d.vec_id, d.cell, d.seed_id,
               round(d.dot / (na.vn * nb.vn), 6) AS subcos
        FROM sdots d
        JOIN norms na ON na.vec_id = d.vec_id
        JOIN norms nb ON nb.vec_id = d.seed_id)
      SELECT vec_id, cell, seed_id AS sub_seed, subcos FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
          ORDER BY subcos DESC, seed_id) AS rk FROM sc)
      WHERE rk = 1
      ORDER BY vec_id""",

    // The shared fit's final assignment (crk=1 row of r1) re-ranked
    // within each cell by the exposed centroid cosine; kept = the
    // same crk <= 20 clamp the Spark window applies.
    "te35_prototype_prune" -> s"""
      WITH $kmeans1Cte,
      best AS (SELECT vec_id, cell, cosc AS cos_centroid
               FROM r1 WHERE crk = 1)
      SELECT vec_id, cell, cos_centroid, crk, crk <= 20 AS kept
      FROM (SELECT *, CAST(row_number() OVER (PARTITION BY cell
              ORDER BY cos_centroid DESC, vec_id) AS BIGINT) AS crk
            FROM best)
      ORDER BY vec_id""",

    "te06_ann_ivf_kmeans" -> s"""
      WITH $kmeans1Cte,
      probes AS (SELECT vec_id AS query_id, cell FROM r1
                 WHERE crk <= 2 AND vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id, cl.cell
        FROM probes p JOIN cells1 cl USING (cell)
        WHERE p.query_id <> cl.vec_id),
      dots AS (
        SELECT cand.query_id, cand.vec_id, cand.cell,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand JOIN ex q ON q.vec_id = cand.query_id
                  JOIN ex c ON c.vec_id = cand.vec_id AND q.d = c.d
        GROUP BY 1, 2, 3),
      scored AS (
        SELECT query_id, dots.vec_id AS vec_id, cell,
               round(dot / (nq.vn * nc.vn), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT query_id, vec_id, cell, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM scored)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    "te07_ann_pq" -> pqOracleSql,

    // Identical oracle: serving from the persisted code/codebook store
    // must reproduce the in-memory PQ-ADC result bit for bit.
    "te22_pq_persisted" -> pqOracleSql,

    // te05's IVF CTEs (cells/probes) feed te07's ADC machinery
    // restricted to the probed-cell candidate pairs, then te08's exact
    // re-rank — every constant (16 cells, nprobe 2, 8×8 PQ, top-20
    // shortlist, k=5) mirrors the Spark call.
    "te09_ann_ivfpq" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d AND c.vec_id < 16
        GROUP BY 1, 2),
      cranked AS (
        SELECT cdots.vec_id AS vec_id, cid,
               row_number() OVER (PARTITION BY cdots.vec_id
                 ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
        FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                   JOIN norms nc ON cdots.cid = nc.vec_id),
      cells AS (SELECT vec_id, cid AS cell FROM cranked WHERE crk = 1),
      probes AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
                 WHERE crk <= 2 AND vec_id % 25 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id
        FROM probes p JOIN cells cl USING (cell)
        WHERE p.query_id <> cl.vec_id),
      sx AS (SELECT vec_id, d // 8 AS sub, d % 8 AS dd, x FROM ex),
      cent AS (SELECT vec_id AS cid, sub, dd, x AS cx FROM sx WHERE vec_id < 16),
      adot AS (
        SELECT v.vec_id, v.sub, c.cid,
               sum(CAST(floor((v.x * c.cx) * 1e12) AS BIGINT)) AS dt
        FROM sx v JOIN cent c ON v.sub = c.sub AND v.dd = c.dd
        GROUP BY 1, 2, 3),
      codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                      ORDER BY dt DESC, cid) AS rk FROM adot)
        WHERE rk = 1),
      qdot AS (SELECT vec_id AS query_id, sub, cid, dt FROM adot
               WHERE vec_id % 25 = 0),
      pscore AS (
        SELECT p.query_id, c.vec_id,
               CAST(sum(q.dt) AS DOUBLE) / 1e12 AS score
        FROM cand p
        JOIN codes c ON c.vec_id = p.vec_id
        JOIN qdot q ON q.query_id = p.query_id AND q.sub = c.sub AND q.cid = c.code
        GROUP BY 1, 2),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, vec_id) AS srk FROM pscore)
        WHERE srk <= 20),
      exact AS (
        SELECT s.query_id, s.vec_id,
               round((CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 / (any_value(na.nrm) * any_value(nb.nrm)), 6) AS cos
        FROM shortlist s
        JOIN ex a ON a.vec_id = s.query_id
        JOIN ex b ON b.vec_id = s.vec_id AND b.d = a.d
        JOIN norms na ON na.vec_id = s.query_id
        JOIN norms nb ON nb.vec_id = s.vec_id
        GROUP BY s.query_id, s.vec_id)
      SELECT query_id, vec_id, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM exact)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    "te08_ann_pq_rerank" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      sx AS (SELECT vec_id, d // 8 AS sub, d % 8 AS dd, x FROM ex),
      cent AS (SELECT vec_id AS cid, sub, dd, x AS cx FROM sx WHERE vec_id < 16),
      adot AS (
        SELECT v.vec_id, v.sub, c.cid,
               sum(CAST(floor((v.x * c.cx) * 1e12) AS BIGINT)) AS dt
        FROM sx v JOIN cent c ON v.sub = c.sub AND v.dd = c.dd
        GROUP BY 1, 2, 3),
      codes AS (
        SELECT vec_id, sub, cid AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                      ORDER BY dt DESC, cid) AS rk FROM adot)
        WHERE rk = 1),
      qdot AS (SELECT vec_id AS query_id, sub, cid, dt FROM adot
               WHERE vec_id % 25 = 0),
      shortlist AS (
        SELECT query_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, vec_id) AS rk
          FROM (
            SELECT q.query_id, c.vec_id,
                   CAST(sum(q.dt) AS DOUBLE) / 1e12 AS score
            FROM codes c
            JOIN qdot q ON c.sub = q.sub AND c.code = q.cid
            WHERE q.query_id <> c.vec_id
            GROUP BY 1, 2))
        WHERE rk <= 20),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      exact AS (
        SELECT s.query_id, s.vec_id,
               round((CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 / (any_value(na.nrm) * any_value(nb.nrm)), 6) AS cos
        FROM shortlist s
        JOIN ex a ON a.vec_id = s.query_id
        JOIN ex b ON b.vec_id = s.vec_id AND b.d = a.d
        JOIN norms na ON na.vec_id = s.query_id
        JOIN norms nb ON nb.vec_id = s.vec_id
        GROUP BY s.query_id, s.vec_id)
      SELECT query_id, vec_id, cos, rk FROM (
        SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, vec_id) AS INT) AS rk
        FROM exact)
      WHERE rk <= 5
      ORDER BY query_id, rk""",

    "te11_knn_graph" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      bits AS (SELECT CAST(unnest(range(0, 6)) AS INT) AS b),
      signs AS (
        SELECT b, d, CASE WHEN xor(h3, h3 >> 16) & 1 = 1 THEN 1.0 ELSE -1.0 END AS sgn
        FROM (SELECT b, d, ((xor(h1, h1 >> 16) % 134217728) * 1597334677) % 4294967296 AS h3
              FROM (SELECT b, d, ((b * 64 + d + 1) * 2654435761) % 4294967296 AS h1
                    FROM bits CROSS JOIN (SELECT CAST(unnest(range(0, 64)) AS INT) AS d)))),
      proj AS (
        SELECT vec_id, b,
               sum(CAST(floor((sgn * x) * 1e12) AS BIGINT)) AS p
        FROM ex JOIN signs USING (d)
        GROUP BY 1, 2),
      buckets AS (
        SELECT vec_id, sum(CASE WHEN p >= 0 THEN 1 << b ELSE 0 END) AS bucket
        FROM proj GROUP BY vec_id),
      cand AS (
        SELECT a.vec_id AS id, b2.vec_id AS nb_id
        FROM buckets a JOIN buckets b2 USING (bucket)
        WHERE a.vec_id <> b2.vec_id),
      dots AS (
        SELECT c.id, c.nb_id,
               CAST(sum(CAST(floor((q.x * e.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand c JOIN ex q ON q.vec_id = c.id
                    JOIN ex e ON e.vec_id = c.nb_id AND e.d = q.d
        GROUP BY 1, 2),
      scored AS (
        SELECT id, nb_id, round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.id = nq.vec_id
                  JOIN norms nc ON dots.nb_id = nc.vec_id),
      knn AS (
        SELECT * FROM (
          SELECT id, nb_id, cos,
                 CAST(row_number() OVER (PARTITION BY id
                   ORDER BY cos DESC, nb_id) AS INT) AS rk
          FROM scored)
        WHERE rk <= 3)
      SELECT k.id AS vec_id, k.nb_id, k.cos, k.rk,
             (m.id IS NOT NULL) AS mutual
      FROM knn k LEFT JOIN knn m ON m.id = k.nb_id AND m.nb_id = k.id
      ORDER BY vec_id, k.rk""",

    "te12_centroid_outliers" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      nn AS (SELECT count(DISTINCT vec_id) AS n FROM ex),
      cent AS (
        SELECT d, (CAST(sum(CAST(floor(x * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                    / (SELECT n FROM nn) AS m
        FROM ex GROUP BY d),
      cn AS (
        SELECT sqrt(CAST(sum(CAST(floor(m * m * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS cnorm
        FROM cent),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      scored AS (
        SELECT vec_id,
               CAST(floor((CAST(sum(CAST(floor(x * m * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 / (norms.nrm * (SELECT cnorm FROM cn)) * 1e6) AS BIGINT) AS s6
        FROM ex JOIN cent USING (d) JOIN norms USING (vec_id)
        GROUP BY vec_id, norms.nrm),
      tot AS (SELECT CAST(sum(s6) AS BIGINT) AS t, count(1) AS n2 FROM scored)
      SELECT vec_id, s6 / 1e6 AS cos_centroid,
             (s6 < (SELECT CAST(floor(t / n2) AS BIGINT) FROM tot)) AS outlier
      FROM scored
      ORDER BY vec_id""",

    "te04_embedding_neardup" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex a JOIN ex b ON a.d = b.d AND a.vec_id < b.vec_id
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM (
          SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos
          FROM dots JOIN norms na ON id_a = na.vec_id
                    JOIN norms nb ON id_b = nb.vec_id)
        WHERE cos >= 0.45)
      SELECT id_b AS vec_id, min(id_a) AS keep_id
      FROM pairs
      GROUP BY id_b
      ORDER BY vec_id""",

    // Same assignment arithmetic as te05 (floor-scaled long dots,
    // round 6, cid tie-break), pairs restricted to one cell, then the
    // td16-style recursive reachability for duplicate groups.
    "te10_semantic_dedup" -> """
      WITH RECURSIVE ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d AND c.vec_id < 16
        GROUP BY 1, 2),
      cells AS (
        SELECT vec_id, cid AS cell FROM (
          SELECT cdots.vec_id AS vec_id, cid,
                 row_number() OVER (PARTITION BY cdots.vec_id
                   ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
          FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                     JOIN norms nc ON cdots.cid = nc.vec_id)
        WHERE crk = 1),
      dots AS (
        SELECT ca.vec_id AS id_a, cb.vec_id AS id_b,
               CAST(sum(CAST(floor((a.x * b.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
        JOIN ex a ON a.vec_id = ca.vec_id
        JOIN ex b ON b.vec_id = cb.vec_id AND a.d = b.d
        GROUP BY 1, 2),
      pairs AS (
        SELECT id_a, id_b FROM (
          SELECT id_a, id_b, round(dot / (na.nrm * nb.nrm), 6) AS cos
          FROM dots JOIN norms na ON id_a = na.vec_id
                    JOIN norms nb ON id_b = nb.vec_id)
        WHERE cos >= 0.4),
      edges AS (SELECT id_a AS a, id_b AS b FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs),
      reach(a, b) AS (SELECT a, b FROM edges
                      UNION
                      SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a)
      SELECT c.vec_id, c.cell,
             least(c.vec_id, coalesce(min(r.b), c.vec_id)) AS rep_id,
             (c.vec_id = least(c.vec_id, coalesce(min(r.b), c.vec_id))) AS keep
      FROM cells c LEFT JOIN reach r ON r.a = c.vec_id
      GROUP BY c.vec_id, c.cell
      ORDER BY c.vec_id""",

    "mm01_decode_meta" -> """
      WITH base AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               8 + octet_length(encode(text)) % 24 AS w,
               6 + octet_length(encode(text)) % 18 AS h
        FROM documents),
      px AS (
        SELECT doc_id, n, w, h, x, y,
               (x * 31 + y * 17 + n) % 256 AS r,
               (x * 13 + y * 29 + n * 3) % 256 AS g,
               (x * 7 + y * 11 + n * 5) % 256 AS b
        FROM base,
             LATERAL (SELECT unnest(range(0, w)) AS x),
             LATERAL (SELECT unnest(range(0, h)) AS y)),
      sums AS (
        SELECT doc_id, any_value(n) AS n, any_value(w) AS w, any_value(h) AS h,
               sum(r) AS sum_r, sum(g) AS sum_g, sum(b) AS sum_b
        FROM px GROUP BY doc_id)
      SELECT doc_id,
        CAST(n AS INT) AS n_bytes,
        CAST(w AS INT) AS width,
        CAST(h AS INT) AS height,
        3 AS channels,
        'png' AS format,
        CAST(greatest(1, w * 16 // greatest(w, h)) AS INT) AS rs_w,
        CAST(greatest(1, h * 16 // greatest(w, h)) AS INT) AS rs_h,
        CAST(sum_r AS BIGINT) / (w * h) AS f0,
        CAST(sum_g AS BIGINT) / (w * h) AS f1,
        CAST(sum_b AS BIGINT) / (w * h) AS f2,
        CAST(sum_r + sum_g + sum_b AS BIGINT) / (3.0 * (w * h)) AS f3
      FROM sums
      ORDER BY doc_id""",

    // UTF-8 BYTE semantics to match the engine's binary framing (hex
    // pair i of encode(text) is byte i), not character code points —
    // ord(substring(...)) would diverge on any multi-byte character.
    "mm03_audio_rms" -> """
      WITH bytes AS (
        SELECT doc_id, CAST((i - 1) // 100 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 100) * 100 + 1)) AS i))
      SELECT doc_id, frame_idx,
             sqrt(CAST(sum(c * c) AS BIGINT) / 100.0) AS rms,
             CAST(max(c) AS INT) AS peak
      FROM bytes
      GROUP BY doc_id, frame_idx
      ORDER BY doc_id, frame_idx""",

    "mm02_frame_sample" -> """
      SELECT doc_id, CAST(n_frames AS INT) AS n_frames,
             CAST(frame_idx AS INT) AS frame_idx,
             round(frame_idx / 24.0, 6) AS frame_ts
      FROM (
        SELECT doc_id, octet_length(encode(text)) % 240 AS n_frames,
               unnest(range(0, octet_length(encode(text)) % 240, 30)) AS frame_idx
        FROM documents
        WHERE octet_length(encode(text)) % 240 > 0)
      ORDER BY doc_id, frame_idx""",

    // UTF-8 byte semantics as in mm03 (100-byte frames), islands via
    // frame_idx - row_number.
    "mm05_speech_segments" -> """
      WITH bytes AS (
        SELECT doc_id, CAST((i - 1) // 100 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 100) * 100 + 1)) AS i)),
      f AS (
        SELECT doc_id, frame_idx, CAST(sum(c * c) AS BIGINT) AS energy
        FROM bytes GROUP BY doc_id, frame_idx),
      sp AS (
        SELECT doc_id, frame_idx,
               frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS island
        FROM f WHERE energy > 981000)
      SELECT doc_id, min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
             count(1) AS n_frames
      FROM sp GROUP BY doc_id, island
      ORDER BY doc_id, start_frame""",

    // UTF-8 byte semantics as in mm03: hex pair i of encode(text) is
    // byte i, framed into 64-byte blocks.
    // mm04's frame/shot derivation + one rank window + a per-shot count.
    "mm11_shot_sample" -> """
      WITH bytes AS (
        SELECT doc_id, CAST((i - 1) // 64 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 64) * 64 + 1)) AS i)),
      f AS (
        SELECT doc_id, frame_idx, CAST(sum(c) AS BIGINT) AS fsum
        FROM bytes GROUP BY doc_id, frame_idx),
      d AS (
        SELECT doc_id, frame_idx, fsum,
               fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS delta
        FROM f),
      sh AS (
        SELECT doc_id, frame_idx, fsum,
               CAST(sum(CASE WHEN coalesce(abs(delta) > 200, false) THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
        FROM d),
      rk AS (
        SELECT doc_id, shot_id, frame_idx, fsum,
               row_number() OVER (PARTITION BY doc_id, shot_id ORDER BY frame_idx) AS rk,
               count(1) OVER (PARTITION BY doc_id, shot_id) AS shot_frames
        FROM sh)
      SELECT doc_id, shot_id, frame_idx, fsum,
             CAST(shot_frames AS BIGINT) AS shot_frames
      FROM rk WHERE rk <= 2
      ORDER BY doc_id, shot_id, frame_idx""",

    // mm05's segments chunked by integer window arithmetic in SQL.
    "mm10_speech_chunks" -> """
      WITH bytes AS (
        SELECT doc_id, CAST((i - 1) // 100 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 100) * 100 + 1)) AS i)),
      f AS (
        SELECT doc_id, frame_idx, CAST(sum(c * c) AS BIGINT) AS energy
        FROM bytes GROUP BY doc_id, frame_idx),
      sp AS (
        SELECT doc_id, frame_idx,
               frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS island
        FROM f WHERE energy > 981000),
      segs AS (
        SELECT doc_id, min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
               count(1) AS n_frames
        FROM sp GROUP BY doc_id, island),
      ch AS (
        SELECT doc_id, start_frame, end_frame, CAST(i AS INT) AS chunk_idx,
               CAST(start_frame + i * 2 AS INT) AS chunk_start
        FROM segs,
             LATERAL (SELECT unnest(range(0,
               1 + greatest(0, CAST(ceil((n_frames - 3) * 1.0 / 2) AS BIGINT)))) AS i))
      SELECT doc_id, start_frame, chunk_idx, chunk_start,
             CAST(least(chunk_start + 2, end_frame) AS INT) AS chunk_end,
             CAST(least(chunk_start + 2, end_frame) - chunk_start + 1 AS INT) AS chunk_frames
      FROM ch
      ORDER BY doc_id, start_frame, chunk_idx""",

    // mm05's segments and mm04's shot starts projected onto the byte
    // timeline; the as-of match is the greatest shot_start*64 at or
    // below seg_start*100 (rank-1 of the inequality join — small
    // per-doc shot lists keep the oracle quadratic surface tiny).
    "mm09_transcript_align" -> """
      WITH abytes AS (
        SELECT doc_id, CAST((i - 1) // 100 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 100) * 100 + 1)) AS i)),
      af AS (
        SELECT doc_id, frame_idx, CAST(sum(c * c) AS BIGINT) AS energy
        FROM abytes GROUP BY doc_id, frame_idx),
      sp AS (
        SELECT doc_id, frame_idx,
               frame_idx - row_number() OVER (PARTITION BY doc_id ORDER BY frame_idx) AS island
        FROM af WHERE energy > 981000),
      segs AS (
        SELECT doc_id, min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
               count(1) AS n_frames
        FROM sp GROUP BY doc_id, island),
      vbytes AS (
        SELECT doc_id, CAST((i - 1) // 64 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 64) * 64 + 1)) AS i)),
      vf AS (
        SELECT doc_id, frame_idx, CAST(sum(c) AS BIGINT) AS fsum
        FROM vbytes GROUP BY doc_id, frame_idx),
      vd AS (
        SELECT doc_id, frame_idx,
               fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS delta
        FROM vf),
      vs AS (
        SELECT doc_id, frame_idx,
               CAST(sum(CASE WHEN coalesce(abs(delta) > 200, false) THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY frame_idx
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
        FROM vd),
      sh AS (
        SELECT doc_id, shot_id, min(frame_idx) AS shot_start_frame
        FROM vs GROUP BY doc_id, shot_id),
      j AS (
        SELECT s.doc_id, s.start_frame, s.end_frame, s.n_frames,
               a.shot_id, a.shot_start_frame,
               row_number() OVER (PARTITION BY s.doc_id, s.start_frame
                 ORDER BY a.shot_start_frame DESC) AS rn
        FROM segs s JOIN sh a ON s.doc_id = a.doc_id
             AND a.shot_start_frame * 64 <= s.start_frame * 100)
      SELECT doc_id, start_frame, end_frame, n_frames, shot_id, shot_start_frame
      FROM j WHERE rn = 1
      ORDER BY doc_id, start_frame""",

    "mm04_shot_boundaries" -> """
      WITH bytes AS (
        SELECT doc_id, CAST((i - 1) // 64 AS INT) AS frame_idx,
               CAST('0x' || substring(hex(encode(text)), CAST(2 * i - 1 AS INT), 2) AS INT) AS c
        FROM documents,
             LATERAL (SELECT unnest(range(1, (octet_length(encode(text)) // 64) * 64 + 1)) AS i)),
      f AS (
        SELECT doc_id, frame_idx, CAST(sum(c) AS BIGINT) AS fsum
        FROM bytes GROUP BY doc_id, frame_idx),
      d AS (
        SELECT doc_id, frame_idx, fsum,
               fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS delta
        FROM f)
      SELECT doc_id, frame_idx, fsum, delta,
             coalesce(abs(delta) > 200, false) AS is_boundary,
             CAST(sum(CASE WHEN coalesce(abs(delta) > 200, false) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS shot_id
      FROM d
      ORDER BY doc_id, frame_idx""",

    // Brightness via the mm01 pixel formula (PNG is lossless, so the
    // decoded raster equals the synthesized one); all vector math in
    // floor-scaled longs exactly as the Spark side computes it.
    "mm06_crossmodal_topk" -> """
      WITH base AS (
        SELECT doc_id, octet_length(encode(text)) AS n,
               8 + octet_length(encode(text)) % 24 AS w,
               6 + octet_length(encode(text)) % 18 AS h
        FROM documents),
      px AS (
        SELECT doc_id, w, h, x, y,
               (x * 31 + y * 17 + n) % 256 AS r,
               (x * 13 + y * 29 + n * 3) % 256 AS g,
               (x * 7 + y * 11 + n * 5) % 256 AS b
        FROM base,
             LATERAL (SELECT unnest(range(0, w)) AS x),
             LATERAL (SELECT unnest(range(0, h)) AS y)),
      bright AS (
        SELECT doc_id,
               CAST(floor((CAST(sum(r + g + b) AS BIGINT)
                 / (3.0 * any_value(w) * any_value(h))) / 16) AS INT) AS bucket
        FROM px GROUP BY doc_id),
      ex AS (
        SELECT b.bucket, e.vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(e.embedding,
                 v -> CAST(floor(CAST(v AS DOUBLE) * 1e7) AS BIGINT))) AS xs
        FROM bright b JOIN embeddings e ON b.doc_id = e.vec_id),
      cent AS (
        SELECT bucket, d,
               CAST(floor(CAST(sum(xs) AS DOUBLE) / count(1)) AS BIGINT) AS c
        FROM ex GROUP BY 1, 2),
      dots AS (
        SELECT ex.bucket, ex.vec_id, CAST(sum(ex.xs * cent.c) AS BIGINT) AS dot_s
        FROM ex JOIN cent ON ex.bucket = cent.bucket AND ex.d = cent.d
        GROUP BY 1, 2),
      rk AS (
        SELECT bucket, vec_id, dot_s,
               row_number() OVER (PARTITION BY bucket
                 ORDER BY dot_s DESC, vec_id) AS rnk
        FROM dots)
      SELECT bucket, CAST(rnk AS INT) AS rnk, vec_id, dot_s
      FROM rk WHERE rnk <= 3 ORDER BY bucket, rnk""",

    // te01's scaled-long arithmetic with a train/eval split: per-pair
    // rounded cosine, thresholded, rolled up per train vector.
    "te31_eval_contamination" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT t.vec_id AS train_id, e.vec_id AS eval_id,
               CAST(sum(CAST(floor((t.x * e.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex t JOIN ex e ON t.d = e.d
        WHERE t.vec_id % 20 <> 0 AND e.vec_id % 20 = 0
        GROUP BY 1, 2),
      cs AS (
        SELECT train_id, round(dot / (nt.nrm * ne.nrm), 6) AS cos
        FROM dots JOIN norms nt ON train_id = nt.vec_id
                  JOIN norms ne ON eval_id = ne.vec_id)
      SELECT train_id, CAST(count(1) AS BIGINT) AS n_eval_hits,
             max(cos) AS best_cos
      FROM cs
      WHERE cos >= 0.4
      GROUP BY 1
      ORDER BY train_id""",

    // Exact IVF replay (te05's pattern) with the train/eval role
    // split: train rows are the crk=1 index, eval rows probe 2 cells.
    "te32_ivf_contamination" -> """
      WITH ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      cdots AS (
        SELECT e.vec_id, c.vec_id AS cid,
               CAST(sum(CAST(floor((e.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex e JOIN ex c ON e.d = c.d AND c.vec_id < 16
        GROUP BY 1, 2),
      cranked AS (
        SELECT cdots.vec_id AS vec_id, cid,
               row_number() OVER (PARTITION BY cdots.vec_id
                 ORDER BY round(dot / (nv.nrm * nc.nrm), 6) DESC, cid) AS crk
        FROM cdots JOIN norms nv ON cdots.vec_id = nv.vec_id
                   JOIN norms nc ON cdots.cid = nc.vec_id),
      cells AS (SELECT vec_id, cid AS cell FROM cranked
                WHERE crk = 1 AND vec_id % 20 <> 0),
      probes AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
                 WHERE crk <= 2 AND vec_id % 20 = 0),
      cand AS (
        SELECT p.query_id, cl.vec_id
        FROM probes p JOIN cells cl USING (cell)),
      dots AS (
        SELECT cand.query_id, cand.vec_id,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM cand JOIN ex q ON q.vec_id = cand.query_id
                  JOIN ex c ON c.vec_id = cand.vec_id AND q.d = c.d
        GROUP BY 1, 2),
      scored AS (
        SELECT dots.vec_id AS train_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.vec_id = nc.vec_id)
      SELECT train_id, CAST(count(1) AS BIGINT) AS n_eval_hits,
             max(cos) AS best_cos
      FROM scored
      WHERE cos >= 0.4
      GROUP BY 1
      ORDER BY train_id"""
  )
}
