package graft

import graft.operators.SkewJoin
import graft.streaming.GraftStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale techniques: skew salting, bucketed co-located joins, and the
  * typed DataStream veneer (SURVEY §2.12, §4.2).
  */
class ScaleTechniquesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = spark.range(1000)
      .select(col("id"), when(col("id") % 10 === 0, col("id") % 7)
        .otherwise(lit(42L)).as("k"))
    val right = Seq.tabulate(50)(i => (i.toLong, s"dim$i")).toDF("k", "v")
    val plain = left.join(right, "k").select("id", "v")
      .as[(Long, String)].collect().toSet
    val salted = SkewJoin.saltedInner(left, right, "k", col("id"), 8)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("hot-salted join spreads the hot key across partitions, exactly") {
    // One key holds 10% of a self-joined index (the td03/te03 skew
    // shape). Plain shuffle join lands every hot pair on ONE task;
    // saltedInnerHot must (a) return the identical pair set and
    // (b) spread the hot key's output over >= saltFactor/2 partitions.
    // Broadcast/AQE are disabled so partition ids reflect the shuffle.
    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val idx = spark.range(500)
        .select(col("id"), when(col("id") % 10 === 0, lit(0L))
          .otherwise(col("id") + 1000).as("sh"))
      val a = idx.select(col("sh"), col("id").as("id_a"))
      val b = idx.select(col("sh"), col("id").as("id_b"))
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.where(col("id_a") < col("id_b"))
      val plain = pairs(a.join(b, Seq("sh")))
      val salted = pairs(SkewJoin.saltedInnerHot(
        a, b, "sh", col("id_a"), saltFactor = 8, hotThreshold = 10L))
      val plainSet = plain.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val saltedSet = salted.select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(saltedSet == plainSet && plainSet.size == 50 * 49 / 2)
      def hotParts(df: org.apache.spark.sql.DataFrame): Long =
        df.where(col("sh") === 0)
          .select(spark_partition_id().as("p")).distinct().count()
      assert(hotParts(plain) == 1L) // the straggler
      // 8 salts hash into the session's 4 shuffle partitions; full
      // spread = most of them (vs exactly 1 unsalted).
      assert(hotParts(salted) >= 3L, "hot key not spread")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("candidatePairs auto-salts hot LSH buckets; result identical to the plain mining join") {
    import graft.operators.TextOps
    // Adversarial corpus shape: 120 boilerplate documents collide in
    // EVERY band (one n² hot bucket per band), 100 normal documents
    // land in singleton buckets. The wired-in hot probe must engage
    // (bucket size 120 > threshold 50) and the candidate set must be
    // exactly the plain join's.
    val hot = spark.range(120).select(col("id"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", col("band") * 7919L)
    val cold = spark.range(500, 600).select(col("id"),
        explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("bh", col("id") * 1000L + col("band"))
    val bands = hot.unionByName(cold)
    val maxBucket = bands.groupBy(col("band"), col("bh"))
      .count().agg(max("count")).head().getLong(0)
    assert(maxBucket == 120L, "fixture must exceed the hot threshold")
    val got = TextOps.candidatePairs(bands, "id",
        hotBucketThreshold = 50L, saltFactor = 8)
      .as[(Long, Long)].collect().toSet
    val plain = bands.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(bands.select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(got == plain)
    assert(plain.size == 120 * 119 / 2) // all boilerplate pairs, once each
  }

  test("persisted IVF serving prunes unprobed cell partitions dynamically") {
    import graft.operators.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("ivf-store").toString
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val ranked = VectorOps.ivfRanked(emb, "vec_id", "embedding", 16)
    ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("cell"),
        col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
        col("v").as("cv2"), col("nrm").as("cn2"))
    val probes = ranked.where(col("id") % 25 === 0 && col("crk") <= 2)
      .select(col("id").as("query_id"), col("cid").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"))
    val served = VectorOps.ivfServe(stored, probes, 5)
    assert(served.count() > 0)
    // The broadcast probe join keys on the store's PARTITION column, so
    // dynamic partition pruning must gate the scan: unprobed cells'
    // files are skipped, the corpus is not read.
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the IVF store scan:\n$plan")
    // ... and the result equals the un-persisted serve.
    val direct = VectorOps.ivfServe(
      ranked.where(col("crk") === 1)
        .select(col("id").as("vec_id"), col("cid").as("cell"),
          col("v").as("cv2"), col("nrm").as("cn2")),
      probes, 5)
    assert(served.collect().toSet == direct.collect().toSet)
  }

  test("tombstoned IVF serving masks deletions, backfills k, keeps pruning") {
    import graft.operators.VectorOps
    val dir = java.nio.file.Files.createTempDirectory("ivf-tomb").toString
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val ranked = VectorOps.ivfRanked(emb, "vec_id", "embedding", 16)
    ranked.where(col("crk") === 1)
      .select(col("id").as("vec_id"), col("cid").as("cell"),
        col("v"), col("nrm"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    val stored = spark.read.parquet(dir)
      .select(col("cell").cast("long").as("cell"), col("vec_id"),
        col("v").as("cv2"), col("nrm").as("cn2"))
    val dels = emb.select(col("vec_id")).where(col("vec_id") % 7 === 3)
    val live = stored.join(broadcast(dels), Seq("vec_id"), "left_anti")
    val probes2 = ranked.where(col("id") % 25 === 0 &&
        col("id") % 7 =!= 3 && col("crk") <= 2)
      .select(col("id").as("query_id"), col("cid").as("cell"),
        col("v").as("qv"), col("nrm").as("qn"))
    val served = VectorOps.ivfServe(live, probes2, 5)
    val rows = served.collect()
    assert(rows.nonEmpty)
    // no deleted id survives as a neighbor
    assert(rows.forall(_.getAs[Long]("vec_id") % 7 != 3))
    // top-k backfills: every query still returns k results (corpus is
    // dense enough at sf0.001 that probed cells hold >k live vectors)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id")).values
    assert(perQuery.forall(_.length == 5))
    // masking must not break dynamic partition pruning on the store
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"tombstone anti-join broke partition pruning:\n$plan")
    // vs the un-deleted serve: ranks only improve or backfill — the
    // surviving neighbors of any query are exactly the un-deleted
    // serve's candidates minus tombstones, re-ranked
    val full = VectorOps.ivfServe(stored, probes2, 20).collect()
    val fullLive = full.filter(_.getAs[Long]("vec_id") % 7 != 3)
      .groupBy(_.getAs[Long]("query_id"))
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val expect = fullLive(q).sortBy(_.getAs[Int]("rk")).take(5)
        .map(_.getAs[Long]("vec_id")).toSeq
      assert(rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("vec_id"))
        .toSeq == expect, s"query $q backfill mismatch")
    }
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    // in-memory catalog forgets tables between runs but their warehouse
    // directories persist — clear both
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val p = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), t)
      if (p.exists()) org.apache.commons.io.FileUtils.deleteDirectory(p)
    }
    o.write.mode("overwrite").bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    li.write.mode("overwrite").bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    val j = spark.table("lineitem_b")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).count()
    val plan = j.queryExecution.executedPlan.toString
    // co-located buckets: the join itself needs no shuffle of either side
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"))
    assert(j.count() > 0)
  }

  test("dimension join picks broadcast hash join (plan shape)") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val c = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val j = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).count()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .where(col("l_quantity") > 30)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .find(_.contains("Scan parquet")).getOrElse("")
    // predicate pushed into the reader, not evaluated post-scan only
    assert(scan.contains("PushedFilters:") && scan.contains("GreaterThan(l_quantity"))
    // column pruning: the 16-column table is read as exactly 2 columns
    val readSchema = scan.split("ReadSchema:").last
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_partkey"))
  }

  test("hot pipelines stay inside whole-stage codegen, custom exprs included") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val agg = li.where(col("l_quantity") > 10)
      .select(col("l_returnflag"), (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
      .groupBy("l_returnflag").agg(sum(col("rev")))
    agg.collect() // AQE only renders codegen stages in the FINAL plan
    val aggPlan = agg.queryExecution.executedPlan.toString
    // scan→filter→project→partial-agg compiled, not interpreted
    assert(aggPlan.contains("*("), s"no codegen stage in:\n$aggPlan")
    // the custom DotScaledLong expression rides INSIDE a codegen'd
    // operator (a '*(n)' line), not in an interpreted fallback
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cos = graft.operators.VectorOps.cosinePairs(emb, "vec_id", "embedding", 0.4)
    cos.collect()
    val cosPlan = cos.queryExecution.executedPlan.toString
    assert(cosPlan.linesIterator.exists(l =>
      l.contains("dot_scaled_long") && l.contains("*(")),
      s"dot_scaled_long not in a codegen stage:\n$cosPlan")
  }

  test("token pipeline shuffles document text once, never the exploded tokens") {
    // The wordsIdx shape shared by td05/td06/td07/td43: repartition the
    // DOCS frame, then explode. The only exchange must sit BELOW the
    // Generate (it carries one row per document, not one per token) and
    // the per-doc aggregation runs on the preserved partitioning with
    // no second shuffle. At 100 TB the wrong order exchanges ~5-10x
    // corpus bytes on the hottest pipeline.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val agg = docs.repartition(col("doc_id"))
      .select(col("doc_id"),
        explode(graft.operators.TextOps.words(col("text"))).as("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), countDistinct(col("w")).as("nu"))
    agg.collect() // AQE renders the final plan only after execution
    // keep only the adaptive FINAL plan (toString repeats the initial)
    val lines = agg.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    val exIdx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    val genIdx = lines.indexWhere(_.contains("Generate explode"))
    assert(exIdx >= 0 && genIdx >= 0, s"plan shape missing:\n${lines.mkString("\n")}")
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1,
      s"token aggregation added a second shuffle:\n${lines.mkString("\n")}")
    // deeper in the tree = later line: the exchange feeds the explode
    assert(exIdx > genIdx,
      s"exchange sits ABOVE the explode (shuffles raw tokens):\n${lines.mkString("\n")}")
    // partial aggregation runs map-side, above the exchange
    val aggIdx = lines.indexWhere(_.contains("HashAggregate"))
    assert(aggIdx >= 0 && aggIdx < exIdx,
      s"no map-side partial aggregate above the exchange:\n${lines.mkString("\n")}")
  }

  test("sourceNovelty: one doc exchange, one gram exchange, nothing token-sized") {
    // td45's full pipeline allows exactly three hash exchanges:
    //  (1) docs by id (one row per DOC — must sit BELOW the shingle
    //      posexplode, so it never carries the token stream),
    //  (2) the gram index by sh (the one corpus-sized gram shuffle —
    //      the distinct, the ownership window, and the rollup's
    //      partial aggregation all ride it with no further exchange),
    //  (3) the |sources|-row partial-rollup exchange.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = graft.operators.TextOps.sourceNovelty(
      docs, "doc_id", "text", "source", 3)
    r.collect()
    val lines = r.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    val hashEx = lines.filter(_.contains("Exchange hashpartitioning"))
    assert(hashEx.length == 3,
      s"expected id + sh + rollup exchanges only:\n${lines.mkString("\n")}")
    assert(hashEx.exists(_.contains("sh#")) && hashEx.exists(_.contains("source#")),
      s"unexpected exchange keys:\n${hashEx.mkString("\n")}")
    // the doc exchange feeds the explode (deeper line), not vice versa:
    // the exchange input is one row per doc, never the token stream
    val genIdx = lines.indexWhere(_.contains("Generate posexplode"))
    val idExIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning(id#"))
    assert(genIdx >= 0 && idExIdx > genIdx,
      s"doc exchange not below the explode (token stream shuffled):\n${lines.mkString("\n")}")
    // the gram exchange sits BELOW the ownership window (no extra
    // exchange between distinct, window, and partial rollup)
    val winIdx = lines.indexWhere(l =>
      l.contains("Window") && l.contains("sh#") && !l.contains("pos#"))
    val shExIdx = lines.indexWhere(l =>
      l.contains("Exchange hashpartitioning(sh#"))
    assert(winIdx >= 0 && shExIdx > winIdx,
      s"gram exchange not below the ownership window:\n${lines.mkString("\n")}")
  }

  test("bpePairStats explodes pairs on the distinct-word frame, not the token stream") {
    // td50/td52's load-bearing shape: the corpus-sized exchange is the
    // word-frequency aggregate (partial map-side, keyed by w); the
    // char-pair Generate must sit ABOVE it, so the explode runs on the
    // vocabulary-bounded distinct-word frame. Exactly two hash
    // exchanges (w, pair) and a TakeOrdered — no global sort.
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = graft.operators.CurationOps.bpePairStats(docs, "text", 20)
    r.collect()
    val lines = r.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 2,
      s"expected only the w and pair exchanges:\n${lines.mkString("\n")}")
    val pairGenIdx = lines.indexWhere(_.contains("Generate explode(transform"))
    val wExIdx = lines.indexWhere(_.contains("Exchange hashpartitioning(w#"))
    assert(pairGenIdx >= 0 && wExIdx > pairGenIdx,
      s"pair explode not above the word aggregate (explodes the token stream):\n${lines.mkString("\n")}")
    assert(lines.exists(_.contains("TakeOrderedAndProject")),
      s"top-k fell back to a global sort:\n${lines.mkString("\n")}")
  }

  test("evalContamination: eval broadcasts; no hash shuffle except the rollup") {
    // te31's 100 TB shape: eval side broadcast (BNL join is the
    // DESIGNED shape — a fixed benchmark set vs the streaming train
    // corpus), the only hash exchange is the per-train-id rollup of
    // already-thresholded hits. The round-robin exchange below the
    // join is prepped()'s deliberate materialization barrier (without
    // it the transform/norm re-inline into the pair loop — measured
    // 7× at the 100× probe tier); it must carry v+nrm, i.e. sit ABOVE
    // the norm projection, so the pair loop reuses both.
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val r = graft.operators.VectorOps.evalContamination(
      emb, "vec_id", "embedding", 20, 0.4)
    r.collect()
    val lines = r.queryExecution.executedPlan.toString.linesIterator
      .takeWhile(!_.contains("== Initial Plan ==")).toSeq
    assert(lines.exists(_.contains("BroadcastNestedLoopJoin")),
      s"designed broadcast shape missing:\n${lines.mkString("\n")}")
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1,
      s"expected only the rollup exchange:\n${lines.mkString("\n")}")
  }

  test("decontaminate never broadcasts a corpus-sized side (plan shape)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = graft.operators.TextOps.decontaminate(
      graft.operators.TextOps.shingleHashIndex(
        docs.filter(col("source") =!= "src0"), "doc_id", "text", 5),
      graft.operators.TextOps.shingleHashIndex(
        docs.filter(col("source") === "src0"), "doc_id", "text", 5), 0.2)
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // the gram-overlap join must be a shuffled hash join on the gram
    // key — at 100 TB neither the corpus nor a large benchmark set is
    // broadcastable
    assert(plan.contains("ShuffledHashJoin"), s"no SHJ in:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi")),
      s"gram join was broadcast:\n$plan")
  }

  test("BM25 prunes postings through a BROADCAST term list (plan shape)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = graft.operators.RetrievalOps.bm25TopK(docs, "doc_id", "text",
      _ % 400 === 0, nTerms = 6, k = 5)
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // the corpus token stream must hit a broadcast join on the (tiny)
    // query-term list BEFORE any aggregation, and the only
    // nested-loop shape allowed is the 1-row stats broadcast-cross
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast prune in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in:\n$plan")
    val bnlj = plan.linesIterator
      .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(_.contains("Cross")),
      s"nested loop that is not the stats cross:\n${bnlj.mkString("\n")}")
  }

  test("PQ scoring joins codes against a BROADCAST ADC table (plan shape)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val r = graft.operators.VectorOps.pqTopK(emb, "vec_id", "embedding",
      _ % 25 === 0, subDim = 8, nCent = 16, k = 5)
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // corpus-sized code table streams; the small query ADC lookup
    // broadcasts — the corpus is never reshuffled at scoring time
    assert(plan.contains("BroadcastHashJoin"), s"no BHJ in:\n$plan")
  }

  test("scrub is one map-side pass: no Exchange in the plan") {
    val r = graft.operators.TextOps.scrub(
      Tables.load(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", "\\b(customer|value)\\b")
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // deny-list scrubbing must stay a stateless projection over the
    // scan — any Exchange would mean a 100 TB corpus gets reshuffled
    // just to run a regex
    assert(!plan.contains("Exchange"), s"scrub plan shuffles:\n$plan")
  }

  test("WAV synth+parse is one map-side pass: no Exchange in the plan") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val p = docs.select(col("doc_id"),
      (lit(1) + pmod(col("doc_id"), lit(2))).as("ch"),
      (lit(8000) + pmod(col("doc_id"), lit(5)) * 4000).as("rate"),
      (lit(8) * (lit(1) + pmod(length(col("text")), lit(2)))).as("pbits"),
      (lit(50) + pmod(length(col("text")), lit(200))).as("frames"))
    val r = graft.operators.RiffWav.parseWav(
      p.withColumn("payload", graft.operators.RiffWav.wavBytes(
        col("ch"), col("rate"), col("pbits"), col("frames"))),
      col("payload"))
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // header sniffing must stay a stateless projection over the scan —
    // any Exchange would mean a 100 TB media lake gets reshuffled just
    // to read 44-byte headers
    assert(!plan.contains("Exchange"), s"mm13 plan shuffles:\n$plan")
  }

  test("PQ re-rank scores only the shortlist (plan shape: no corpus pair join)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val r = graft.operators.VectorOps.pqRerankTopK(emb, "vec_id", "embedding",
      _ % 25 === 0, subDim = 8, nCent = 16, shortlist = 10, k = 5)
    val rows = r.collect()
    assert(rows.nonEmpty)
    val plan = r.queryExecution.executedPlan.toString
    // the exact-dot stage must join shortlist -> vectors by key; a
    // cartesian/BNLJ would mean it fell back to the pair space
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"re-rank fell back to pair space:\n$plan")
  }

  test("DS channel pivots scan the fact once and self-join the aggregate (ds16 shape)") {
    val r = SparkEntry.queries("ds16_qoq_channel_growth")(spark, "/root/testdata/sf0.001")
    r.collect()
    val plan = r.queryExecution.executedPlan.toString
    // the four quarter/channel slices join the AGGREGATED CTE —
    // nation-cardinality rows — so every join of slices must be a
    // broadcast join, never a shuffled fact-fact join
    assert(plan.contains("BroadcastHashJoin"), s"no BHJ in:\n$plan")
  }

  test("exact O(n^2) vector baselines refuse oversized corpora unless forced") {
    import graft.operators.VectorOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    assert(n <= VectorOps.ExactBaselineMaxRows) // default path stays exact below the cap
    assert(VectorOps.cosinePairs(emb, "vec_id", "embedding", 0.4).count() > 0)
    // Above the cap the call must opt in — the guard is what keeps the
    // all-pairs baseline from being reached accidentally at 100 TB.
    val blown = emb.crossJoin(spark.range(
      VectorOps.ExactBaselineMaxRows / n + 1).select(col("id").as("rep")))
      .select((col("vec_id") * 1000 + col("rep")).as("vec_id"), col("embedding"))
    val e1 = intercept[IllegalArgumentException] {
      VectorOps.cosinePairs(blown, "vec_id", "embedding", 0.4)
    }
    assert(e1.getMessage.contains("srpBucket"))
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.bruteForceTopK(blown.limit(5), blown, "vec_id", "embedding", 3)
    }
    assert(e2.getMessage.contains("ivfTopK"))
    // forceExact bypasses the guard (plan construction succeeds).
    assert(VectorOps.bruteForceTopK(blown.limit(2), blown, "vec_id", "embedding",
      k = 1, forceExact = true).columns.contains("cos"))
  }

  test("hard-negative mining: exact baseline guarded; IVF twin pre-filters the label in the join") {
    import graft.operators.VectorOps
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    // exact baseline below the cap: only different-label results, k per anchor
    val exact = VectorOps.hardNegativesTopK(
      emb, "vec_id", "embedding", "label", _ % 25 === 0, k = 3)
    val rows = exact.collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getAs[Any]("qlabel") != r.getAs[Any]("label")))
    // above the cap the guard refuses and names the scale twin
    val blown = emb.crossJoin(spark.range(
      VectorOps.ExactBaselineMaxRows / n + 1).select(col("id").as("rep")))
      .select((col("vec_id") * 1000 + col("rep")).as("vec_id"),
        col("label"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      VectorOps.hardNegativesTopK(blown, "vec_id", "embedding", "label",
        _ % 25 === 0, k = 3)
    }
    assert(e.getMessage.contains("ivfHardNegatives"))
    // forceExact bypasses the guard (plan construction succeeds)
    assert(VectorOps.hardNegativesTopK(blown, "vec_id", "embedding", "label",
      _ % 25 === 0, k = 1, forceExact = true).columns.contains("cos"))
    // the IVF twin: same output shape, label inequality enforced by the
    // probe-join condition, and its results agree with the exact scan
    // wherever the probed cells contain the true negatives
    val ivf = VectorOps.ivfHardNegatives(emb, "vec_id", "embedding", "label",
      _ % 25 === 0, nlist = 8, nprobe = 8, k = 3)
    val irows = ivf.collect()
    assert(irows.nonEmpty && irows.forall(r =>
      r.getAs[Any]("qlabel") != r.getAs[Any]("label")))
    // nprobe = nlist probes every cell → exact recall (same results)
    val ex = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
      r.getAs[Long]("vec_id"))).toSet
    val iv = irows.map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rk"),
      r.getAs[Long]("vec_id"))).toSet
    assert(iv == ex, s"full-probe IVF must equal the exact scan")
  }

  test("exact all-pairs Jaccard refuses oversized corpora unless forced") {
    import graft.operators.TextOps
    import org.apache.spark.sql.functions.{array, concat, lit}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), array(col("lang"), col("text")).as("shingles"))
    // Below the cap the default path stays exact and runs.
    assert(TextOps.allPairsJaccard(docs, "doc_id", "shingles", 0.0).count() >= 0)
    // Above the cap (replicate doc ids past ExactBaselineMaxDocs) the
    // call must refuse and point at the LSH scale path.
    val n = docs.count()
    val blown = docs.crossJoin(spark.range(
      TextOps.ExactBaselineMaxDocs / n + 1).select(col("id").as("rep")))
      .select(concat(col("doc_id"), lit("#"), col("rep")).as("doc_id"),
        col("shingles"))
    val e = intercept[IllegalArgumentException] {
      TextOps.allPairsJaccard(blown, "doc_id", "shingles", 0.5)
    }
    assert(e.getMessage.contains("minhashLshPairsIdx"))
    // forceExact bypasses the guard (plan construction succeeds).
    assert(TextOps.allPairsJaccard(blown.limit(3), "doc_id", "shingles", 0.0,
      forceExact = true).columns.contains("jaccard"))
  }

  test("DataStream veneer: map/filter/keyBy/reduce/process pipeline") {
    val out = GraftStream(spark.range(100).as[Long])
      .map(i => (i % 5, i))
      .filter(_._2 % 2 == 0)
      .keyBy(_._1)
      .reduce((a, b) => (a._1, a._2 + b._2))
      .collect().toMap.map { case (k, v) => k -> v._2 }
    // sum of even numbers 0..98 grouped by i%5
    val expect = (0L until 100L).filter(_ % 2 == 0).groupBy(_ % 5)
      .map { case (k, vs) => k -> vs.sum }
    assert(out == expect)
  }

  test("DataStream veneer: connect/coGroup/minBy/maxBy/sum/partitionCustom") {
    import spark.implicits._
    val a = GraftStream(Seq(1L, 2L, 3L, 4L).toDS())
    val b = GraftStream(Seq("x2", "y3").toDS())
    // connect = tagged union feeding one downstream function
    val connected = a.connect(b)
      .map { case (l, r) => l.map(n => s"n$n").getOrElse(s"s${r.get}") }
      .ds.collect().toSet
    assert(connected == Set("n1", "n2", "n3", "n4", "sx2", "sy3"))
    // coGroup pairs per-key groups of differently-typed streams
    val cg = a.coGroup(b)(_ % 2, s => s.drop(1).toLong % 2) {
      (k, xs, ys) => Iterator.single((k, xs.size, ys.size))
    }.collect().toSet
    assert(cg == Set((0L, 2, 1), (1L, 2, 1)))
    val keyed = GraftStream(Seq((1L, 10.0), (1L, 30.0), (2L, 5.0)).toDS())
      .keyBy(_._1)
    assert(keyed.minBy((x, y) => x._2 < y._2).collect().toMap
      .view.mapValues(_._2).toMap == Map(1L -> 10.0, 2L -> 5.0))
    assert(keyed.maxBy((x, y) => x._2 < y._2).collect().toMap
      .view.mapValues(_._2).toMap == Map(1L -> 30.0, 2L -> 5.0))
    assert(keyed.sum(_._2).collect().toMap == Map(1L -> 40.0, 2L -> 5.0))
    val parts = a.partitionCustom(2, _ % 2).ds.rdd.getNumPartitions
    assert(parts == 2)
  }

  test("DataStream veneer: shuffle/rescale/project/broadcast/watermarks") {
    import spark.implicits._
    val a = GraftStream(Seq(1L, 2L, 3L, 4L).toDS())
    assert(a.shuffle(3).ds.rdd.getNumPartitions == 3)
    assert(a.rescale(1).ds.rdd.getNumPartitions == 1)
    assert(a.project(n => n * 10).ds.collect().toSet == Set(10L, 20L, 30L, 40L))
    // broadcast() marks the small side; a join against it plans as BHJ
    val dim = GraftStream(Seq((1L, "a"), (2L, "b")).toDS()).broadcast()
    val j = a.ds.toDF("k").join(dim.ds.toDF("k", "v"), "k")
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(j.collect().length == 2)
    // watermark assignment survives the veneer (visible in the plan)
    val ts = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L))
      .toDF("ts", "v").as[(java.sql.Timestamp, Long)]
    val wm = GraftStream(ts).assignTimestampsAndWatermarks("ts", "10 minutes")
    // on a batch frame the analyzer erases the (streaming-only)
    // watermark node — assert on the pre-analysis plan
    assert(wm.ds.queryExecution.logical.toString.contains("EventTimeWatermark"))
    // DataSet operator names: cross/distinct/sortPartition/first
    val c = GraftStream(Seq(1L, 2L).toDS()).cross(GraftStream(Seq("x", "y").toDS()))
    assert(c.ds.collect().toSet ==
      Set((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y")))
    assert(GraftStream(Seq(1L, 1L, 2L).toDS()).distinct().ds.collect().toSet == Set(1L, 2L))
    val sp = GraftStream(Seq(3L, 1L, 2L).toDS()).global().sortPartition("value")
    assert(sp.ds.collect().toSeq == Seq(1L, 2L, 3L))
    assert(GraftStream(Seq(5L, 6L, 7L).toDS()).first(2).ds.count() == 2)
  }
}
