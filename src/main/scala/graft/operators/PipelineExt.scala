package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-image perceptual-hash row (typed output of the decode loop). */
case class PHashRow(doc_id: Long, phash: Long)

/** Pipeline extensions: lexical retrieval (BM25), embedding int8
  * quantization, token chunking, exact-quota stratified sampling and
  * image perceptual-hash dedup — the curation steps around the dedup /
  * ANN core (RetrievalOps has the scale notes per operator).
  */
object PipelineExt extends QueryModule {

  /** 32-bit blockwise average hash of a media payload: synthesize the
    * deterministic PNG for the payload (pixels a function of its byte
    * length — stands in for upstream media bytes), run the REAL codec
    * round trip, then hash the decoded raster over an 8x4 block grid
    * with integer cross-multiplied mean comparisons (no float). One
    * bounded loop per payload; linear in corpus size.
    */
  def phashOfPayload(bytes: Array[Byte]): Long = {
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
    // REAL decode; PNG is lossless so the raster round-trips.
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(buf.toByteArray))
    val (w, h) = (img.getWidth, img.getHeight)
    val bsum = Array.ofDim[Long](4, 8)
    val bcnt = Array.ofDim[Long](4, 8)
    y = 0
    while (y < h) {
      val by = y * 4 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) * 299L +
          ((rgb >> 8) & 0xff) * 587L + (rgb & 0xff) * 114L
        val bx = x * 8 / w
        bsum(by)(bx) += lum
        bcnt(by)(bx) += 1L
        x += 1
      }
      y += 1
    }
    var tsum = 0L; var tcnt = 0L
    var by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 8) { tsum += bsum(by)(bx); tcnt += bcnt(by)(bx); bx += 1 }
      by += 1
    }
    var hash = 0L
    by = 0
    while (by < 4) {
      var bx = 0
      while (bx < 8) {
        // block mean > global mean, compared exactly in integers
        if (bsum(by)(bx) * tcnt > tsum * bcnt(by)(bx))
          hash |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    hash
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BM25 top-5 lexical retrieval; every 400th doc is a query, its
    // first 6 words the query terms. Rational idf (log-free) per the
    // bit-exact oracle contract — see RetrievalOps.bm25TopK.
    "td26_bm25_topk" -> { (s, dir) =>
      RetrievalOps.bm25TopK(Tables.load(s, dir, "documents"),
          "doc_id", "text", _ % 400 === 0, nTerms = 6, k = 5)
        .orderBy("query_id", "rk")
    },

    // Sliding-window chunking: 64-token chunks, stride 48 (16-token
    // overlap); md5 per chunk for downstream exact dedup.
    "td27_chunk_overlap" -> { (s, dir) =>
      RetrievalOps.chunkDocs(Tables.load(s, dir, "documents"),
          "doc_id", "text", size = 64, stride = 48)
        .orderBy("doc_id", "chunk_id")
    },

    // RAG context assembly (te26): the serving step downstream of
    // td26+td27 — each query's BM25 top-5 docs are chunked and the
    // context window is packed GREEDILY in (doc rank, chunk order)
    // until a 256-token budget: whole chunks only, running total via
    // one bounded window (≤ k docs × chunks/doc rows per query). The
    // corpus-side chunk frame streams against the BROADCAST top-k
    // list, so assembly cost tracks queries, not the corpus.
    "te26_rag_context" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val top = RetrievalOps.bm25TopK(docs, "doc_id", "text",
          _ % 400 === 0, nTerms = 6, k = 5)
        .select(col("query_id"), col("doc_id"), col("rk"))
      val chunks = RetrievalOps.chunkDocs(docs, "doc_id", "text",
          size = 64, stride = 48)
        .select(col("doc_id"), col("chunk_id"), col("n_tok"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("rk"), col("chunk_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      chunks.join(broadcast(top), Seq("doc_id"))
        .withColumn("cum_tok", sum(col("n_tok")).over(w))
        .where(col("cum_tok") <= 256)
        .select(col("query_id"), col("rk"), col("doc_id"),
          col("chunk_id"), col("n_tok"), col("cum_tok"))
        .orderBy("query_id", "rk", "chunk_id")
    },

    // Exact-quota stratified sample (200 docs per lang) selected by
    // deterministic hash order via the distributed histogram — no
    // whole-stratum sort (see RetrievalOps.stratifiedQuota).
    "td28_stratified_sample" -> { (s, dir) =>
      RetrievalOps.stratifiedQuota(Tables.load(s, dir, "documents"),
          "doc_id", "lang", quota = 200)
        .orderBy("stratum", "h", "doc_id")
    },

    // URL canonicalization dedup — the CommonCrawl/C4 pre-dedup step:
    // raw URLs differing in host case, query-parameter order, and
    // utm_* tracking params collapse to one canonical form (lowercase
    // host + path + sorted non-tracking params), then exact dedup by
    // canonical URL. The URL is synthesized deterministically per doc
    // (two raw spellings per canonical identity, alternating by
    // parity — so the canonicalization provably merges distinct raw
    // strings); everything downstream is the real pipeline: pure
    // map-side string work plus one hash aggregate. The spelling
    // alternates by doc_id div 200 — the canonical identity's period —
    // so every canonical class spanning both generations merges two
    // distinct raw forms (asserted by n_raw_forms).
    "td29_url_dedup" -> { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
        .withColumn("h", pmod(col("doc_id"), lit(50)))
        .withColumn("p", pmod(col("doc_id"), lit(200)))
        .withColumn("q", pmod(col("doc_id"), lit(100)))
        .withColumn("url",
          when(pmod((col("doc_id") / 200).cast("long"), lit(2)) === 0,
            concat(lit("https://Host"), col("h"), lit(".Example.COM/path/"),
              col("p"), lit("?id="), col("q"), lit("&utm_source=feed&ref="),
              col("h")))
            .otherwise(concat(lit("https://host"), col("h"),
              lit(".example.com/path/"), col("p"), lit("?ref="), col("h"),
              lit("&id="), col("q"), lit("&utm_campaign=x"))))
      val host = lower(regexp_extract(col("url"), "^https://([^/]+)", 1))
      val path = regexp_extract(col("url"), "^https://[^/]+([^?]*)", 1)
      val kept = array_join(array_sort(filter(
        split(substring_index(col("url"), "?", -1), "&"),
        kv => not(kv.startsWith("utm_")))), "&")
      d.withColumn("canon", concat(host, path, lit("?"), kept))
        .groupBy(col("canon"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("canonical_id"),
          count_distinct(col("url")).as("n_raw_forms"))
        .orderBy("canon")
    },

    // Gopher-rules quality gate: per-doc boolean verdicts + keep —
    // the pass/fail filter stage (exact integer thresholds; see
    // TextOps.gopherRules).
    "td30_gopher_rules" -> { (s, dir) =>
      TextOps.gopherRules(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Hybrid retrieval: BM25 top-20 (lexical) fused with cosine
    // top-20 (vector, brute-force baseline — srpBucket/ivfTopK are
    // the at-scale drop-ins with the same columns) by reciprocal-rank
    // fusion in exact integer arithmetic, top-10 per query.
    "te14_rrf_hybrid" -> { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val emb = Tables.load(s, dir, "embeddings")
      val lex = RetrievalOps.bm25TopK(docs, "doc_id", "text",
        _ % 400 === 0, nTerms = 6, k = 20)
      val vec = VectorOps.bruteForceTopK(
          emb.filter(col("vec_id") % 400 === 0), emb, "vec_id", "embedding", 20)
        .select(col("query_id"), col("vec_id").as("doc_id"), col("rk"))
      RetrievalOps.rrfFuse(lex, vec, k = 10)
        .orderBy("query_id", "rk")
    },

    // Matryoshka-truncation recall: rank neighbors by the FIRST-16-dim
    // prefix of each embedding and measure top-5 agreement against the
    // full 64-dim ranking — the eval that decides how far an MRL-style
    // embedding can be truncated for cheap first-stage retrieval.
    // Both rankings are the exact brute-force baseline (guarded); at
    // corpus scale the truncated leg is the one that gets an
    // IVF/SRP index, the overlap join shape is unchanged.
    "te15_matryoshka_recall" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 25 === 0)
      val full = VectorOps.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val tEmb = emb.select(col("vec_id"),
        slice(col("embedding"), 1, 16).as("embedding"))
      val tQ = tEmb.filter(col("vec_id") % 25 === 0)
      val trunc = VectorOps.bruteForceTopK(tQ, tEmb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      full.join(trunc.withColumn("m", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("m"), lit(0L))).cast("long").as("n_overlap"),
          count(lit(1)).as("k"))
        .orderBy("query_id")
    },

    // Int8 SERVING recall (te21): te13 quantizes; this op retrieves
    // with the quantized codes — integer dot products (the int8-SIMD
    // production shape), de-scaled per candidate by maxabs/norm so
    // ranking approximates cosine, top-5 agreement vs the exact float
    // ranking. Everything rank-relevant is either exact integers or
    // single-expression IEEE arithmetic written identically in the
    // oracle, so the recall output is hash-exact. Brute-force candidate
    // scope — the eval convention (the at-scale path puts these codes
    // inside IVF cells).
    "te21_int8_serve_recall" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 25 === 0)
      val full = VectorOps.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val ex = emb.select(col("vec_id"),
        posexplode(VectorOps.toDouble(col("embedding"))).as(Seq("d", "x")))
      val mx = ex.groupBy(col("vec_id")).agg(max(abs(col("x"))).as("maxabs"))
      val nrm = VectorOps.norms(emb, "vec_id", "embedding", "vec_id")
      val codes = ex.join(mx, Seq("vec_id"))
        .select(col("vec_id"), col("d"),
          floor(col("x") * when(col("maxabs") === 0, lit(0.0))
            .otherwise(lit(127.0) / col("maxabs")) + lit(0.5))
            .cast("long").as("code"))
      val qc = codes.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"), col("d"), col("code").as("qcode"))
      val intdot = qc.join(codes, Seq("d"))
        .where(col("query_id") =!= col("vec_id"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("qcode") * col("code")).as("intdot"))
      val scored = intdot
        .join(mx.select(col("vec_id").as("query_id"), col("maxabs").as("qm")), "query_id")
        .join(mx.select(col("vec_id"), col("maxabs").as("cm")), "vec_id")
        .join(nrm.select(col("vec_id").as("query_id"), col("nrm").as("qn")), "query_id")
        .join(nrm.select(col("vec_id"), col("nrm").as("cn")), "vec_id")
        .withColumn("score",
          col("intdot").cast("double") * col("qm") * col("cm") / col("qn") / col("cn"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id"))
      val approx = scored.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 5).select(col("query_id"), col("vec_id"))
      full.join(approx.withColumn("m", lit(1L)),
          Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("m"), lit(0L))).cast("long").as("n_overlap"),
          count(lit(1)).as("k"))
        .orderBy("query_id")
    },

    // ANN recall-vs-nprobe curve (te20): the accuracy/latency dial an
    // IVF deployment tunes — recall@5 of the nprobe ∈ {1,2,4} serves
    // measured against the exact top-5, aggregated per nprobe (3 rows,
    // recall monotone in nprobe by construction). Integer recall
    // micros; the exact leg is the guarded brute-force baseline, the
    // eval-harness convention of te15/te16.
    "te20_recall_curve" -> { (s, dir) =>
      import s.implicits._
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 25 === 0)
      val full = VectorOps.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val perN = Seq(1, 2, 4).map { np =>
        VectorOps.ivfTopK(emb, "vec_id", "embedding", _ % 25 === 0,
            nlist = 16, nprobe = np, k = 5)
          .select(lit(np).as("nprobe"), col("query_id"), col("vec_id"))
      }.reduce(_ unionAll _)
      val fullN = full.crossJoin(Seq(1, 2, 4).toDF("nprobe"))
      fullN.join(perN.withColumn("m", lit(1L)),
          Seq("nprobe", "query_id", "vec_id"), "left")
        .groupBy(col("nprobe"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("m"), lit(0L))).cast("long").as("n_overlap"))
        .withColumn("recall_micro",
          floor(col("n_overlap") * 1000000L / col("n_exact")).cast("long"))
        .orderBy("nprobe")
    },

    // Binary sign-code retrieval recall: binarize each embedding to a
    // 63-bit sign code (bit d set iff x_d > 0; the top bit stays
    // clear so BIGINT shift/sum arithmetic is overflow-free in BOTH
    // engines — 32x smaller than float32), rank neighbors by hamming
    // distance, and measure top-5
    // agreement against the full cosine ranking — te15's truncation
    // eval for the binarization axis. The hamming leg is pure integer
    // (popcount of xor); at corpus scale the codes ARE the index
    // (te03's buckets generalized to full-width codes).
    "te16_binary_recall" -> { (s, dir) =>
      val emb = Tables.load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") % 25 === 0)
      val full = VectorOps.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
        .select(col("query_id"), col("vec_id"))
      val codes = emb
        .select(col("vec_id"),
          posexplode(VectorOps.toDouble(col("embedding"))).as(Seq("d", "x")))
        .groupBy(col("vec_id"))
        .agg(sum(expr(
            "CASE WHEN x > 0 AND d < 63 THEN shiftleft(1L, d) ELSE 0L END"))
          .cast("long").as("code"))
      val qc = codes.filter(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("query_id"), col("code").as("qcode"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("hamming"), col("vec_id"))
      val ham = qc.join(broadcast(codes), col("query_id") =!= col("vec_id"))
        .withColumn("hamming", bit_count(expr("qcode ^ code")))
        .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
        .select(col("query_id"), col("vec_id"))
      full.join(ham.withColumn("m", lit(1L)), Seq("query_id", "vec_id"), "left")
        .groupBy(col("query_id"))
        .agg(sum(coalesce(col("m"), lit(0L))).cast("long").as("n_overlap"),
          count(lit(1)).as("k"))
        .orderBy("query_id")
    },

    // Symmetric int8 quantization of the embedding corpus with
    // saturation count and reconstruction error per vector.
    "te13_int8_quant" -> { (s, dir) =>
      RetrievalOps.int8Quantize(Tables.load(s, dir, "embeddings"),
          "vec_id", "embedding")
        .orderBy("vec_id")
    },

    // Image perceptual-hash (blockwise average hash) dedup clusters:
    // REAL PNG encode+decode per payload (mm01's codec path), 32-bit
    // block-mean hash over the decoded raster (8x4 grid, integer
    // cross-multiplied mean comparisons — no float), clusters grouped
    // by hash. The pixel function is deterministic in the payload
    // length, which is what lets the oracle replay the raster in SQL.
    "mm07_phash_dedup" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          PHashRow(id, phashOfPayload(bytes))
        })
        .toDF()
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_images"), min(col("doc_id")).as("canonical_id"))
        .orderBy("phash")
    },

    // Image NEAR-dup: hamming-close pairs between distinct phash
    // classes via the pigeonhole banded join (4 bands of 8 bits —
    // hamming <= 3 guarantees an equal band), verified with
    // bit_count(xor). The pair join runs over hash CLASSES, not
    // images: class count is bounded by the 32-bit hash space and in
    // practice tiny relative to the corpus, so the quadratic surface
    // never touches image rows (the simhash td04 design, in pixel
    // space).
    "mm08_phash_neardup" -> { (s, dir) =>
      import s.implicits._
      val classes = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          PHashRow(id, phashOfPayload(bytes))
        })
        .toDF()
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_images"))
      val bands = classes.select(col("phash"), col("n_images"),
          explode(sequence(lit(0), lit(3))).as("band"))
        .withColumn("bv", expr("shiftright(phash, band * 8) & 255"))
      val a = bands.select(col("band"), col("bv"), col("phash").as("pa"),
        col("n_images").as("n_a"))
      val b = bands.select(col("band"), col("bv"), col("phash").as("pb"),
        col("n_images").as("n_b"))
      a.join(b, Seq("band", "bv")).where(col("pa") < col("pb"))
        .select(col("pa"), col("pb"), col("n_a"), col("n_b")).distinct()
        .withColumn("dist", expr("bit_count(pa ^ pb)"))
        .where(col("dist") <= 3)
        .select(col("pa").as("phash_a"), col("pb").as("phash_b"),
          col("dist").cast("int").as("dist"), col("n_a"), col("n_b"))
        .orderBy("phash_a", "phash_b")
    }
  )

  override def oracleSql: Map[String, String] = Map(
    "td26_bm25_topk" -> """
      WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        FROM documents),
      toks AS (SELECT doc_id, dl, unnest(w) AS term FROM base),
      qterms AS (
        SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(w[1:6]) AS term
          FROM base WHERE doc_id % 400 = 0)),
      termlist AS (SELECT DISTINCT term FROM qterms),
      tf AS (
        SELECT t.doc_id, t.term, t.dl, CAST(count(1) AS BIGINT) AS tf
        FROM toks t JOIN termlist q USING (term)
        GROUP BY 1, 2, 3),
      dft AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf GROUP BY 1),
      stats AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ((n_docs - df + 0.5) / (df + 0.5)) *
               ((tf * 2.2) / (tf + 1.2 * (0.25 +
                 0.75 * (CAST(dl * n_docs AS DOUBLE) / sum_dl)))) AS s
        FROM tf JOIN dft USING (term) CROSS JOIN stats),
      perdoc AS (
        SELECT q.query_id, s.doc_id,
               CAST(sum(CAST(floor(s.s * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
        FROM qterms q JOIN scored s USING (term)
        GROUP BY 1, 2),
      ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rk
        FROM perdoc)
      SELECT query_id, doc_id, score, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""",

    "te26_rag_context" -> """
      WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        FROM documents),
      toks AS (SELECT doc_id, dl, unnest(w) AS term FROM base),
      qterms AS (
        SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(w[1:6]) AS term
          FROM base WHERE doc_id % 400 = 0)),
      termlist AS (SELECT DISTINCT term FROM qterms),
      tf AS (
        SELECT t.doc_id, t.term, t.dl, CAST(count(1) AS BIGINT) AS tf
        FROM toks t JOIN termlist q USING (term)
        GROUP BY 1, 2, 3),
      dft AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf GROUP BY 1),
      stats AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ((n_docs - df + 0.5) / (df + 0.5)) *
               ((tf * 2.2) / (tf + 1.2 * (0.25 +
                 0.75 * (CAST(dl * n_docs AS DOUBLE) / sum_dl)))) AS s
        FROM tf JOIN dft USING (term) CROSS JOIN stats),
      perdoc AS (
        SELECT q.query_id, s.doc_id,
               CAST(sum(CAST(floor(s.s * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
        FROM qterms q JOIN scored s USING (term)
        GROUP BY 1, 2),
      cand AS (
        SELECT query_id, doc_id, rk FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rk
          FROM perdoc)
        WHERE rk <= 5),
      st AS (
        SELECT doc_id, w, dl,
               CAST(unnest(range(0, dl, 48)) AS BIGINT) AS start
        FROM base),
      chunks AS (
        SELECT doc_id, start // 48 AS chunk_id,
               CAST(len(w[CAST(start + 1 AS INT):CAST(start + 64 AS INT)]) AS BIGINT) AS n_tok
        FROM st),
      ctx AS (
        SELECT c.query_id, c.rk, ch.doc_id, ch.chunk_id, ch.n_tok,
               sum(ch.n_tok) OVER (PARTITION BY c.query_id
                 ORDER BY c.rk, ch.chunk_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
        FROM cand c JOIN chunks ch USING (doc_id))
      SELECT query_id, CAST(rk AS INT) AS rk, doc_id, chunk_id, n_tok,
             CAST(cum_tok AS BIGINT) AS cum_tok
      FROM ctx WHERE cum_tok <= 256
      ORDER BY query_id, rk, chunk_id""",

    "td27_chunk_overlap" -> """
      WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w,
               len(string_split(lower(text), ' ')) AS dl
        FROM documents),
      st AS (
        SELECT doc_id, w,
               CAST(unnest(range(0, dl, 48)) AS BIGINT) AS start
        FROM base)
      SELECT doc_id,
             start // 48 AS chunk_id,
             start,
             CAST(len(w[CAST(start + 1 AS INT):CAST(start + 64 AS INT)]) AS BIGINT) AS n_tok,
             md5(array_to_string(w[CAST(start + 1 AS INT):CAST(start + 64 AS INT)], ' ')) AS chunk_md5
      FROM st ORDER BY doc_id, chunk_id""",

    "td28_stratified_sample" -> """
      WITH h AS (
        SELECT lang AS stratum, CAST(doc_id AS BIGINT) AS doc_id,
               (doc_id * 2654435761) % 1000000007 AS h
        FROM documents),
      ranked AS (
        SELECT stratum, doc_id, h,
               row_number() OVER (PARTITION BY stratum
                 ORDER BY h, doc_id) AS rk
        FROM h)
      SELECT stratum, doc_id, h
      FROM ranked WHERE rk <= 200 ORDER BY stratum, h, doc_id""",

    "td29_url_dedup" -> """
      WITH d AS (
        SELECT doc_id,
               doc_id % 50 AS h, doc_id % 200 AS p, doc_id % 100 AS q
        FROM documents),
      u AS (
        SELECT doc_id,
               CASE WHEN (doc_id // 200) % 2 = 0
                 THEN 'https://Host' || h || '.Example.COM/path/' || p ||
                      '?id=' || q || '&utm_source=feed&ref=' || h
                 ELSE 'https://host' || h || '.example.com/path/' || p ||
                      '?ref=' || h || '&id=' || q || '&utm_campaign=x'
               END AS url
        FROM d),
      c AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^https://([^/]+)', 1)) ||
               regexp_extract(url, '^https://[^/]+([^?]*)', 1) || '?' ||
               array_to_string(list_sort(list_filter(
                 string_split(string_split(url, '?')[2], '&'),
                 kv -> NOT starts_with(kv, 'utm_'))), '&') AS canon
        FROM u)
      SELECT canon, CAST(count(1) AS BIGINT) AS n_docs,
             min(doc_id) AS canonical_id,
             CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms
      FROM c GROUP BY 1 ORDER BY canon""",

    "te14_rrf_hybrid" -> """
      WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        FROM documents),
      toks AS (SELECT doc_id, dl, unnest(w) AS term FROM base),
      qterms AS (
        SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(w[1:6]) AS term
          FROM base WHERE doc_id % 400 = 0)),
      termlist AS (SELECT DISTINCT term FROM qterms),
      tf AS (
        SELECT t.doc_id, t.term, t.dl, CAST(count(1) AS BIGINT) AS tf
        FROM toks t JOIN termlist q USING (term)
        GROUP BY 1, 2, 3),
      dft AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf GROUP BY 1),
      stats AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
      scored AS (
        SELECT tf.doc_id, tf.term,
               ((n_docs - df + 0.5) / (df + 0.5)) *
               ((tf * 2.2) / (tf + 1.2 * (0.25 +
                 0.75 * (CAST(dl * n_docs AS DOUBLE) / sum_dl)))) AS s
        FROM tf JOIN dft USING (term) CROSS JOIN stats),
      perdoc AS (
        SELECT q.query_id, s.doc_id,
               CAST(sum(CAST(floor(s.s * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
        FROM qterms q JOIN scored s USING (term)
        GROUP BY 1, 2),
      lex AS (
        SELECT query_id, doc_id, rk FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rk
          FROM perdoc) WHERE rk <= 20),
      ex AS (
        SELECT vec_id, CAST(unnest(range(0, 64)) AS INT) AS d,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      norms AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex GROUP BY vec_id),
      dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex q JOIN ex c ON q.d = c.d
        WHERE q.vec_id % 400 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      vscored AS (
        SELECT dots.query_id, dots.doc_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                  JOIN norms nc ON dots.doc_id = nc.vec_id),
      vec AS (
        SELECT query_id, doc_id, rk FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, doc_id) AS rk
          FROM vscored) WHERE rk <= 20),
      fused AS (
        SELECT coalesce(l.query_id, v.query_id) AS query_id,
               coalesce(l.doc_id, v.doc_id) AS doc_id,
               coalesce(1000000000 // (60 + l.rk), 0) +
               coalesce(1000000000 // (60 + v.rk), 0) AS rrf
        FROM lex l FULL OUTER JOIN vec v
          ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
      SELECT query_id, doc_id, CAST(rrf AS BIGINT) AS rrf, CAST(rk AS INT) AS rk
      FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, doc_id) AS rk
        FROM fused)
      WHERE rk <= 10 ORDER BY query_id, rk""",

    "td30_gopher_rules" -> """
      WITH w AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents),
      st AS (
        SELECT doc_id,
               CAST(count(1) AS BIGINT) AS nw,
               CAST(sum(len(w)) AS BIGINT) AS sumlen,
               CAST(sum(CASE WHEN len(w) <= 4
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
               CAST(max(len(w)) AS BIGINT) AS maxlen,
               CAST(count(DISTINCT CASE WHEN w IN
                 ('the','a','data','row','value','query','table')
                 THEN w END) AS BIGINT) AS n_stop
        FROM w GROUP BY 1)
      SELECT doc_id,
             nw BETWEEN 30 AND 80 AS r_wordcount,
             (sumlen * 10 >= nw * 42 AND sumlen * 10 <= nw * 50) AS r_meanlen,
             (n_short * 2 >= nw) AS r_shortfrac,
             (n_stop >= 6) AS r_stop,
             (maxlen <= 7) AS r_maxlen,
             (nw BETWEEN 30 AND 80
              AND sumlen * 10 >= nw * 42 AND sumlen * 10 <= nw * 50
              AND n_short * 2 >= nw AND n_stop >= 6
              AND maxlen <= 7) AS keep
      FROM st ORDER BY doc_id""",

    // Quantization + integer dots exact; the de-scaling expression is
    // written with the same left-to-right parenthesization as the
    // Spark side so the IEEE doubles agree bit for bit.
    "te21_int8_serve_recall" -> """
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
      full_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT dots.query_id, dots.vec_id,
                 row_number() OVER (PARTITION BY dots.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                            dots.vec_id) AS rk
          FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                    JOIN norms nc ON dots.vec_id = nc.vec_id)
        WHERE rk <= 5),
      mx AS (SELECT vec_id, max(abs(x)) AS maxabs FROM ex GROUP BY 1),
      codes AS (
        SELECT ex.vec_id, d,
               CAST(floor(x * (CASE WHEN maxabs = 0 THEN 0.0
                 ELSE 127.0 / maxabs END) + 0.5) AS BIGINT) AS code
        FROM ex JOIN mx ON ex.vec_id = mx.vec_id),
      intdot AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(sum(q.code * c.code) AS BIGINT) AS intdot
        FROM codes q JOIN codes c ON q.d = c.d
        WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      approx AS (
        SELECT query_id, vec_id FROM (
          SELECT i.query_id, i.vec_id,
                 row_number() OVER (PARTITION BY i.query_id
                   ORDER BY CAST(i.intdot AS DOUBLE) * qm.maxabs * cm.maxabs
                            / nq.nrm / nc.nrm DESC, i.vec_id) AS rk
          FROM intdot i
          JOIN mx qm ON qm.vec_id = i.query_id
          JOIN mx cm ON cm.vec_id = i.vec_id
          JOIN norms nq ON nq.vec_id = i.query_id
          JOIN norms nc ON nc.vec_id = i.vec_id)
        WHERE rk <= 5)
      SELECT f.query_id AS query_id,
             CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             CAST(count(1) AS BIGINT) AS k
      FROM full_rk f LEFT JOIN approx t
        ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      GROUP BY f.query_id ORDER BY f.query_id""",

    // The exact top-5 (te16's full_rk) against the IVF candidate sets
    // of every nprobe tier, scored from the shared dot CTE.
    "te20_recall_curve" -> """
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
      full_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT dots.query_id, dots.vec_id,
                 row_number() OVER (PARTITION BY dots.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                            dots.vec_id) AS rk
          FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                    JOIN norms nc ON dots.vec_id = nc.vec_id)
        WHERE rk <= 5),
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
      probes AS (SELECT vec_id AS query_id, cid AS cell, crk FROM cranked
                 WHERE vec_id % 25 = 0),
      nps AS (SELECT CAST(unnest([1, 2, 4]) AS INT) AS nprobe),
      cand AS (
        SELECT np.nprobe, p.query_id, cl.vec_id
        FROM nps np JOIN probes p ON p.crk <= np.nprobe
             JOIN cells cl ON cl.cell = p.cell
        WHERE p.query_id <> cl.vec_id),
      scored AS (
        SELECT cand.nprobe, cand.query_id, cand.vec_id,
               round(dot / (nq.nrm * nc.nrm), 6) AS cos
        FROM cand
        JOIN dots ON dots.query_id = cand.query_id AND dots.vec_id = cand.vec_id
        JOIN norms nq ON cand.query_id = nq.vec_id
        JOIN norms nc ON cand.vec_id = nc.vec_id),
      approx AS (
        SELECT nprobe, query_id, vec_id FROM (
          SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
                     ORDER BY cos DESC, vec_id) AS rk FROM scored)
        WHERE rk <= 5),
      fulln AS (SELECT np.nprobe, f.query_id, f.vec_id FROM nps np, full_rk f)
      SELECT f.nprobe,
             CAST(count(1) AS BIGINT) AS n_exact,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000
               // count(1) AS BIGINT) AS recall_micro
      FROM fulln f LEFT JOIN approx a
        ON f.nprobe = a.nprobe AND f.query_id = a.query_id AND f.vec_id = a.vec_id
      GROUP BY f.nprobe ORDER BY f.nprobe""",

    "te16_binary_recall" -> """
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
      full_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT dots.query_id, dots.vec_id,
                 row_number() OVER (PARTITION BY dots.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                            dots.vec_id) AS rk
          FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                    JOIN norms nc ON dots.vec_id = nc.vec_id)
        WHERE rk <= 5),
      codes AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN x > 0 AND d < 63
                 THEN (CAST(1 AS BIGINT) << d) ELSE 0 END) AS BIGINT) AS code
        FROM ex GROUP BY 1),
      ham_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY bit_count(xor(q.code, c.code)), c.vec_id) AS rk
          FROM codes q JOIN codes c
            ON q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id)
        WHERE rk <= 5)
      SELECT f.query_id AS query_id,
             CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             CAST(count(1) AS BIGINT) AS k
      FROM full_rk f LEFT JOIN ham_rk t
        ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      GROUP BY f.query_id ORDER BY f.query_id""",

    "te15_matryoshka_recall" -> """
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
      full_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT dots.query_id, dots.vec_id,
                 row_number() OVER (PARTITION BY dots.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                            dots.vec_id) AS rk
          FROM dots JOIN norms nq ON dots.query_id = nq.vec_id
                    JOIN norms nc ON dots.vec_id = nc.vec_id)
        WHERE rk <= 5),
      ex16 AS (SELECT * FROM ex WHERE d < 16),
      norms16 AS (
        SELECT vec_id, sqrt(CAST(sum(CAST(floor((x * x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
        FROM ex16 GROUP BY vec_id),
      dots16 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
               CAST(sum(CAST(floor((q.x * c.x) * 1e12) AS BIGINT)) AS DOUBLE) / 1e12 AS dot
        FROM ex16 q JOIN ex16 c ON q.d = c.d
        WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
        GROUP BY 1, 2),
      trunc_rk AS (
        SELECT query_id, vec_id FROM (
          SELECT dots16.query_id, dots16.vec_id,
                 row_number() OVER (PARTITION BY dots16.query_id
                   ORDER BY round(dot / (nq.nrm * nc.nrm), 6) DESC,
                            dots16.vec_id) AS rk
          FROM dots16 JOIN norms16 nq ON dots16.query_id = nq.vec_id
                      JOIN norms16 nc ON dots16.vec_id = nc.vec_id)
        WHERE rk <= 5)
      SELECT f.query_id AS query_id,
             CAST(sum(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
             CAST(count(1) AS BIGINT) AS k
      FROM full_rk f LEFT JOIN trunc_rk t
        ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      GROUP BY f.query_id ORDER BY f.query_id""",

    "te13_int8_quant" -> """
      WITH ex AS (
        SELECT vec_id,
               unnest(list_transform(embedding, v -> CAST(v AS DOUBLE))) AS x
        FROM embeddings),
      mx AS (SELECT vec_id, max(abs(x)) AS maxabs FROM ex GROUP BY 1),
      q AS (
        SELECT ex.vec_id, x, maxabs,
               CASE WHEN maxabs = 0 THEN 0.0 ELSE 127.0 / maxabs END AS scale
        FROM ex JOIN mx USING (vec_id)),
      c AS (
        SELECT vec_id, maxabs, scale, x,
               CAST(floor(x * scale + 0.5) AS BIGINT) AS code
        FROM q),
      e AS (
        SELECT vec_id, maxabs, code,
               CASE WHEN scale = 0 THEN 0.0
                    ELSE abs(x - code / scale) END AS err
        FROM c)
      SELECT vec_id, max(maxabs) AS maxabs,
             CAST(sum(CASE WHEN abs(code) = 127 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat,
             CAST(count(1) AS BIGINT) AS n_dims,
             CAST(sum(CAST(floor(err * 1e9) AS BIGINT)) AS DOUBLE) / 1e9 AS sae
      FROM e GROUP BY vec_id ORDER BY vec_id""",

    "mm07_phash_dedup" -> """
      WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      ns AS (SELECT DISTINCT n, 8 + n % 24 AS w, 6 + n % 18 AS h FROM d),
      px AS (
        SELECT n,
               ((x * 31 + y * 17 + n) % 256) * 299 +
               ((x * 13 + y * 29 + n * 3) % 256) * 587 +
               ((x * 7 + y * 11 + n * 5) % 256) * 114 AS lum,
               (x * 8) // w AS bx, (y * 4) // h AS by
        FROM ns,
             LATERAL (SELECT unnest(range(0, w)) AS x),
             LATERAL (SELECT unnest(range(0, h)) AS y)),
      blocks AS (
        SELECT n, bx, by, CAST(sum(lum) AS BIGINT) AS bsum,
               CAST(count(1) AS BIGINT) AS bcnt
        FROM px GROUP BY 1, 2, 3),
      tot AS (
        SELECT n, CAST(sum(bsum) AS BIGINT) AS tsum,
               CAST(sum(bcnt) AS BIGINT) AS tcnt
        FROM blocks GROUP BY 1),
      hashes AS (
        SELECT b.n,
               CAST(sum(CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
                 THEN (CAST(1 AS BIGINT) << (b.by * 8 + b.bx))
                 ELSE 0 END) AS BIGINT) AS phash
        FROM blocks b JOIN tot t USING (n) GROUP BY 1),
      ph AS (SELECT d.doc_id, hs.phash FROM d JOIN hashes hs USING (n))
      SELECT phash, CAST(count(1) AS BIGINT) AS n_images,
             min(doc_id) AS canonical_id
      FROM ph GROUP BY 1 ORDER BY phash""",

    "mm08_phash_neardup" -> """
      WITH d AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
      ns AS (SELECT DISTINCT n, 8 + n % 24 AS w, 6 + n % 18 AS h FROM d),
      px AS (
        SELECT n,
               ((x * 31 + y * 17 + n) % 256) * 299 +
               ((x * 13 + y * 29 + n * 3) % 256) * 587 +
               ((x * 7 + y * 11 + n * 5) % 256) * 114 AS lum,
               (x * 8) // w AS bx, (y * 4) // h AS by
        FROM ns,
             LATERAL (SELECT unnest(range(0, w)) AS x),
             LATERAL (SELECT unnest(range(0, h)) AS y)),
      blocks AS (
        SELECT n, bx, by, CAST(sum(lum) AS BIGINT) AS bsum,
               CAST(count(1) AS BIGINT) AS bcnt
        FROM px GROUP BY 1, 2, 3),
      tot AS (
        SELECT n, CAST(sum(bsum) AS BIGINT) AS tsum,
               CAST(sum(bcnt) AS BIGINT) AS tcnt
        FROM blocks GROUP BY 1),
      hashes AS (
        SELECT b.n,
               CAST(sum(CASE WHEN b.bsum * t.tcnt > t.tsum * b.bcnt
                 THEN (CAST(1 AS BIGINT) << (b.by * 8 + b.bx))
                 ELSE 0 END) AS BIGINT) AS phash
        FROM blocks b JOIN tot t USING (n) GROUP BY 1),
      ph AS (SELECT d.doc_id, hs.phash FROM d JOIN hashes hs USING (n)),
      classes AS (
        SELECT phash, CAST(count(1) AS BIGINT) AS n_images
        FROM ph GROUP BY 1),
      bands AS (
        SELECT phash, n_images, CAST(b AS BIGINT) AS band,
               (phash >> (CAST(b AS INT) * 8)) & 255 AS bv
        FROM classes, LATERAL (SELECT unnest(range(0, 4)) AS b)),
      cand AS (
        SELECT DISTINCT a.phash AS pa, b.phash AS pb,
               a.n_images AS n_a, b.n_images AS n_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bv = b.bv AND a.phash < b.phash)
      SELECT pa AS phash_a, pb AS phash_b,
             CAST(bit_count(xor(pa, pb)) AS INT) AS dist, n_a, n_b
      FROM cand WHERE bit_count(xor(pa, pb)) <= 3
      ORDER BY phash_a, phash_b"""
  )
}
