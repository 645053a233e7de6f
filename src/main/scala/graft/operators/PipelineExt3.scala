package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-9 training-data/retrieval additions: C4-style line-level
  * cleaning, DoReMi-lite domain reweighting, BM25 hard-negative
  * mining, and the LAION-style media quality gate — the curation
  * stages that sit between raw crawl and the dedup/mixing core.
  */
object PipelineExt3 extends QueryModule {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // C4-style cleaning (Raffel et al. 2020 §2.2) on the corpus's
    // 10-word chunk convention for "lines": blocklist rule ('dup' is
    // this corpus's lorem-ipsum analog), stopword-heavy rule (>2 of
    // {a, the} — boilerplate navigation), short-line rule (<5 words),
    // then the page rule (keep only docs with ≥3 surviving chunks).
    // Embarrassingly parallel: one scan, map-side rules, one per-doc
    // re-aggregation — the 100 TB shape is corpus-linear with zero
    // corpus-wide state.
    "td41_c4_clean" -> { (s, dir) =>
      TextOps.c4Clean(Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Composite quality VERDICT (td43) — the Dolma/FineWeb-style
    // nightly gate a curation pipeline actually ships: every doc gets
    // a keep/drop decision plus a machine-readable `reasons` list
    // naming each failed rule, so drops are AUDITABLE (the attribute
    // tagging pattern: rules are recorded, not silently applied).
    // Composes the already-oracle-checked stages — Gopher thresholds
    // (td30), the C4 page rule (td41), langid-vs-metadata agreement
    // (td05's detector), exact-duplicate canonicalization (td01's
    // hash) — each a corpus-linear scan; the four verdict frames join
    // back on doc_id (co-partitioned hash joins, nothing wider than
    // the id ever shuffles).
    "td43_quality_verdict" -> { (s, dir) =>
      TextOps.qualityVerdict(Tables.load(s, dir, "documents"),
          "doc_id", "text", "lang")
        .orderBy("doc_id")
    },

    // DoReMi-lite domain reweighting (Xie et al. 2023, linearized to
    // the repo's exact-integer contract): 3 exponentiated-gradient
    // iterations pushing sampling weight toward domains with excess
    // proxy loss (mean unique-token deficit), 80/20-smoothed with
    // uniform. The corpus is scanned ONCE; every iteration runs on
    // the |domains|-row frame with broadcast scalar totals.
    "td42_doremi_mix" -> { (s, dir) =>
      TextOps.doremiWeights(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source")
        .orderBy("domain")
    },

    // BM25 hard-negative mining (Karpukhin et al. 2020 §4.2): for
    // each query doc, the top-5 BM25 docs from a DIFFERENT source —
    // lexically similar yet wrong-group, the negatives a dense
    // retriever trains against. The label gate sits between the
    // scored partials and the top-k window (te27's gate placement,
    // lexical edition).
    "te28_bm25_negatives" -> { (s, dir) =>
      RetrievalOps.bm25Negatives(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source", _ % 200 === 0, nTerms = 6, k = 5)
        .orderBy("query_id", "rk")
    },

    // RM3 pseudo-relevance-feedback expansion (Lavrenko & Croft 2001,
    // the Anserini/Galago default): BM25 pass with the original terms,
    // mine the 3 most frequent NEW terms from each query's top-5
    // feedback docs, re-score with the expanded set, final top-5.
    // Scale shape: two corpus-linear BM25 passes behind broadcast
    // term-list gates + one broadcast semi-join for expansion mining
    // (see RetrievalOps.rm3TopK's scale anatomy).
    "te29_rm3_expansion" -> { (s, dir) =>
      RetrievalOps.rm3TopK(Tables.load(s, dir, "documents"),
          "doc_id", "text", _ % 200 === 0, nTerms = 6, fbDocs = 5,
          fbTerms = 3, k = 5)
        .orderBy("query_id", "rk")
    },

    // LAION-style media quality gate (Schuhmann et al. 2022): filter
    // media by decoded dimensions and payload size — min resolution,
    // aspect-ratio bounds (integer cross-multiplication, the Gopher
    // rule idiom), min bytes. Dimensions derive from mm01's
    // documented deterministic payload synthesis (w = 8 + n % 24,
    // h = 6 + n % 18 — the stand-in for real decoded metadata; the
    // real-codec path is mm01's). Pure map-side column math: the op
    // is a projection, scanning 100 TB of media metadata without a
    // single shuffle.
    "mm12_media_filter" -> { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), octet_length(col("text")).as("n"))
        .withColumn("width", (lit(8) + col("n") % 24).cast("int"))
        .withColumn("height", (lit(6) + col("n") % 18).cast("int"))
        .select(col("doc_id"), col("n").cast("int").as("n_bytes"),
          col("width"), col("height"),
          (col("width") * col("height") >= 200).as("r_minres"),
          (col("width") <= col("height") * 2 &&
            col("height") <= col("width") * 2).as("r_aspect"),
          (col("n") >= 200).as("r_minbytes"))
        .withColumn("keep",
          col("r_minres") && col("r_aspect") && col("r_minbytes"))
        .orderBy("doc_id")
    }
  )

  /** One DoReMi iteration as a DuckDB CTE layer (unrolled; the
    * possibly-negative excess division is offset to stay positive so
    * DuckDB's floor `//` and Spark's trunc `DIV` agree — see
    * TextOps.doremiWeights).
    */
  private def doremiIter(i: Int): String = {
    val p = s"b${i - 1}"
    s"""
      t$i AS (SELECT CAST(sum(w * loss_micro) AS BIGINT) AS wl,
                     CAST(sum(w) AS BIGINT) AS ws FROM $p),
      u$i AS (SELECT domain, n_docs, loss_micro,
                w * greatest(1000000 + (loss_micro - (SELECT wl // ws FROM t$i)
                      + 5000000) // 5 - 1000000, 1) AS w1
              FROM $p),
      n$i AS (SELECT CAST(sum(w1) AS BIGINT) AS sw FROM u$i),
      b$i AS (SELECT domain, n_docs, loss_micro,
                (w1 * 1000000) // (SELECT sw FROM n$i) AS w FROM u$i)"""
  }

  /** One BM25 scoring pass as DuckDB CTE layers over the shared
    * `base`/`toks`/`stats` frames, parameterized by the query-terms
    * CTE — the exact arithmetic of RetrievalOps.bm25PerDoc (floored
    * micro-integer sums so both engines agree to the digit).
    */
  private def bm25Pass(i: Int, qt: String): String = s"""
      tf$i AS (
        SELECT t.doc_id, t.term, t.dl, CAST(count(1) AS BIGINT) AS tf
        FROM toks t JOIN (SELECT DISTINCT term FROM $qt) q USING (term)
        GROUP BY 1, 2, 3),
      dft$i AS (SELECT term, CAST(count(1) AS BIGINT) AS df FROM tf$i GROUP BY 1),
      scored$i AS (
        SELECT tf.doc_id, tf.term,
               ((n_docs - df + 0.5) / (df + 0.5)) *
               ((tf * 2.2) / (tf + 1.2 * (0.25 +
                 0.75 * (CAST(dl * n_docs AS DOUBLE) / sum_dl)))) AS s
        FROM tf$i tf JOIN dft$i USING (term) CROSS JOIN stats),
      perdoc$i AS (
        SELECT q.query_id, s.doc_id,
               CAST(sum(CAST(floor(s.s * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
        FROM $qt q JOIN scored$i s USING (term)
        GROUP BY 1, 2)"""

  override def oracleSql: Map[String, String] = Map(

    "te29_rm3_expansion" -> s"""
      WITH base AS (
        SELECT doc_id, string_split(lower(text), ' ') AS w,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        FROM documents),
      toks AS (SELECT doc_id, dl, unnest(w) AS term FROM base),
      stats AS (SELECT CAST(count(1) AS BIGINT) AS n_docs,
                       CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
      q0 AS (SELECT DISTINCT query_id, term FROM (
          SELECT doc_id AS query_id, unnest(w[1:6]) AS term
          FROM base WHERE doc_id % 200 = 0)),
      ${bm25Pass(0, "q0")},
      fb AS (SELECT query_id, doc_id FROM (
          SELECT query_id, doc_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY score DESC, doc_id) AS rk
          FROM perdoc0) WHERE rk <= 5),
      fbtok AS (
        SELECT f.query_id, t.term, CAST(count(1) AS BIGINT) AS tfsum
        FROM toks t JOIN fb f USING (doc_id) GROUP BY 1, 2),
      expt AS (SELECT query_id, term FROM (
          SELECT f.query_id, f.term,
                 row_number() OVER (PARTITION BY f.query_id
                   ORDER BY f.tfsum DESC, f.term) AS erk
          FROM fbtok f
          WHERE NOT EXISTS (SELECT 1 FROM q0
            WHERE q0.query_id = f.query_id AND q0.term = f.term))
        WHERE erk <= 3),
      q1 AS (SELECT DISTINCT query_id, term FROM (
          SELECT query_id, term FROM q0
          UNION ALL SELECT query_id, term FROM expt)),
      ${bm25Pass(1, "q1")}
      SELECT query_id, doc_id, score, CAST(rk AS INT) AS rk FROM (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rk
        FROM perdoc1) WHERE rk <= 5
      ORDER BY query_id, rk""",

    "td41_c4_clean" -> """
      WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS wds
                 FROM documents),
      c AS (SELECT doc_id, CAST(i AS INT) AS ci,
              wds[i*10+1 : i*10+10] AS cw
            FROM w, LATERAL (SELECT unnest(range(0,
              CAST(ceil(len(wds) / 10.0) AS INT))) AS i)),
      k AS (SELECT doc_id, ci, cw,
              list_contains(cw, 'dup') AS r_bad,
              len(list_filter(cw, x -> x = 'a' OR x = 'the')) > 2 AS r_stopheavy,
              len(cw) < 5 AS r_short,
              (NOT list_contains(cw, 'dup')
                AND len(list_filter(cw, x -> x = 'a' OR x = 'the')) <= 2
                AND len(cw) >= 5) AS kept
            FROM c)
      SELECT doc_id,
        CAST(count(1) AS INT) AS n_chunks,
        CAST(sum(CASE WHEN r_bad THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        CAST(sum(CASE WHEN r_stopheavy THEN 1 ELSE 0 END) AS BIGINT) AS n_stopheavy,
        CAST(sum(CASE WHEN r_short THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        coalesce(string_agg(CASE WHEN kept THEN array_to_string(cw, ' ') END,
          ' ' ORDER BY ci), '') AS clean_text,
        (sum(CASE WHEN kept THEN 1 ELSE 0 END) >= 3) AS keep_doc
      FROM k GROUP BY doc_id ORDER BY doc_id""",

    "td43_quality_verdict" -> """
      WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
      gst AS (SELECT doc_id,
               CAST(count(1) AS BIGINT) AS nw,
               CAST(sum(len(w)) AS BIGINT) AS sumlen,
               CAST(sum(CASE WHEN len(w) <= 4
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
               CAST(max(len(w)) AS BIGINT) AS maxlen,
               CAST(count(DISTINCT CASE WHEN w IN
                 ('the','a','data','row','value','query','table')
                 THEN w END) AS BIGINT) AS n_stop
             FROM w GROUP BY 1),
      g AS (SELECT doc_id,
              (nw BETWEEN 30 AND 80
               AND sumlen * 10 >= nw * 42 AND sumlen * 10 <= nw * 50
               AND n_short * 2 >= nw AND n_stop >= 6
               AND maxlen <= 7) AS r_gopher
            FROM gst),
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
             FROM w GROUP BY 1),
      lg AS (SELECT d.doc_id,
               (CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es
                       THEN 'en'
                     WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                     WHEN s_fr >= s_es THEN 'fr'
                     ELSE 'es' END) = d.lang AS r_lang
             FROM documents d JOIN ls ON d.doc_id = ls.doc_id),
      dp AS (SELECT doc_id, doc_id = min(doc_id) OVER (
               PARTITION BY md5(lower(text))) AS r_dup
             FROM documents)
      SELECT g.doc_id, r_gopher, r_c4, r_lang, r_dup,
             (r_gopher AND r_c4 AND r_lang AND r_dup) AS keep,
             concat_ws(',',
               CASE WHEN NOT r_gopher THEN 'gopher' END,
               CASE WHEN NOT r_c4 THEN 'c4' END,
               CASE WHEN NOT r_lang THEN 'lang' END,
               CASE WHEN NOT r_dup THEN 'dup' END) AS reasons
      FROM g JOIN c4 USING (doc_id) JOIN lg USING (doc_id)
             JOIN dp USING (doc_id)
      ORDER BY g.doc_id""",

    "td42_doremi_mix" -> s"""
      WITH t AS (SELECT doc_id, source, unnest(string_split(lower(text), ' ')) AS w
                 FROM documents),
      pd AS (SELECT doc_id, any_value(source) AS domain,
               CAST(count(1) AS BIGINT) AS nw,
               CAST(count(DISTINCT w) AS BIGINT) AS nu
             FROM t GROUP BY doc_id),
      d0 AS (SELECT domain, CAST(count(1) AS BIGINT) AS n_docs,
               CAST(sum(1000000 - (nu * 1000000) // nw) AS BIGINT) AS sl
             FROM pd GROUP BY domain),
      nd AS (SELECT 1000000 // count(DISTINCT source) AS u FROM documents),
      b0 AS (SELECT domain, n_docs, sl // n_docs AS loss_micro,
               (SELECT u FROM nd) AS w FROM d0),
      ${doremiIter(1)}, ${doremiIter(2)}, ${doremiIter(3)}
      SELECT domain, n_docs, CAST(loss_micro AS BIGINT) AS loss_micro,
        CAST((w * 4 + (SELECT u FROM nd)) // 5 AS BIGINT) AS w_micro
      FROM b3 ORDER BY domain""",

    "te28_bm25_negatives" -> """
      WITH base AS (
        SELECT doc_id, source, string_split(lower(text), ' ') AS w,
               CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS dl
        FROM documents),
      toks AS (SELECT doc_id, dl, unnest(w) AS term FROM base),
      qterms AS (
        SELECT DISTINCT query_id, qsrc, term FROM (
          SELECT doc_id AS query_id, source AS qsrc, unnest(w[1:6]) AS term
          FROM base WHERE doc_id % 200 = 0)),
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
        SELECT q.query_id, q.qsrc, s.doc_id,
               CAST(sum(CAST(floor(s.s * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS score
        FROM qterms q JOIN scored s USING (term)
        GROUP BY 1, 2, 3),
      gated AS (
        SELECT p.query_id, p.doc_id, p.score
        FROM perdoc p JOIN base b ON b.doc_id = p.doc_id
        WHERE b.source <> p.qsrc),
      ranked AS (
        SELECT query_id, doc_id, score,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY score DESC, doc_id) AS rk
        FROM gated)
      SELECT query_id, doc_id, score, CAST(rk AS INT) AS rk
      FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""",

    "mm12_media_filter" -> """
      WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
                        8 + octet_length(encode(text)) % 24 AS w,
                        6 + octet_length(encode(text)) % 18 AS h
                 FROM documents)
      SELECT doc_id, CAST(n AS INT) AS n_bytes,
        CAST(w AS INT) AS width, CAST(h AS INT) AS height,
        (w * h >= 200) AS r_minres,
        (w <= h * 2 AND h <= w * 2) AS r_aspect,
        (n >= 200) AS r_minbytes,
        (w * h >= 200 AND w <= h * 2 AND h <= w * 2 AND n >= 200) AS keep
      FROM b ORDER BY doc_id"""
  )
}
