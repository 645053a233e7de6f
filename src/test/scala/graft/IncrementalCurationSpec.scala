package graft

import java.nio.file.Files

import graft.operators.CurationOps
import graft.sources.LogSource
import graft.streaming.IncrementalCuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** td56 — the incremental curation pipeline's contracts: epoch-by-
  * epoch processing converges to the batch manifest exactly (cross-
  * epoch exact dups, cross-epoch near-dup clusters that tombstone
  * earlier sampling decisions), committed epochs replay as no-ops,
  * a crash between side-store appends and the state commit is
  * recoverable, and the streaming form resumes from its checkpoint
  * across a kill with new data landing in between.
  */
class IncrementalCurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  /** ≥30-word alnum English texts pass the lenient verdict (see
    * CurationOpsSpec). Corpus staged so every cross-epoch interaction
    * fires:
    *  - epoch 0: 1/2 near-dups (trailing word dropped), 3 clean
    *    singleton, 4 fails C4 (too short);
    *  - epoch 1: 5 = EXACT dup of 3's text (cross-epoch drop),
    *    6 = near-dup of 3 (cross-epoch pair → cluster {3,6}: 3's
    *    earlier always-sampled +I must be superseded), 7 fails langid
    *    (metadata de, stopword vote en);
    *  - epoch 2: 8 = near-dup of 3/6 (cluster grows to {3,6,8} →
    *    w=333333, everyone re-gated), 9/10 exact dups of each other
    *    WITHIN the epoch (min id 9 kept).
    */
  private val baseA = (1 to 31).map(i => s"w$i").mkString(" ")
  private val baseB = (1 to 30).map(i => s"v$i").mkString(" ")
  private val baseC = (1 to 30).map(i => s"y$i").mkString(" ")
  private val all = Seq(
    (1L, baseA + " tail", "en"),
    (2L, baseA, "en"),
    (3L, baseB, "en"),
    (4L, "too short", "en"),
    (5L, baseB, "en"),
    (6L, baseB + " tail", "en"),
    (7L, (1 to 30).map(i => s"x$i").mkString(" "), "de"),
    (8L, baseB + " tail more", "en"),
    (9L, baseC, "en"),
    (10L, baseC, "en"))
  private val epochs = Seq(all.take(4), all.slice(4, 7), all.drop(7))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "lang")

  private def batchManifest: Set[Seq[Any]] =
    CurationOps.curationManifest(df(all), "doc_id", "text", "lang")
      .collect().map(_.toSeq).toSet

  private def incManifest(base: String): Set[Seq[Any]] =
    IncrementalCuration.manifest(spark, base).collect().map(_.toSeq).toSet

  private def tmp(): String =
    Files.createTempDirectory("graft-inccur-").toString

  test("epoch-by-epoch processing equals the batch curation manifest") {
    val base = tmp()
    epochs.zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
    }
    val inc = incManifest(base)
    assert(inc == batchManifest)
    // the cross-epoch cluster really formed: 3 docs share the {3,6,8}
    // component, so at most ceil-gate survivors of w=333333 remain —
    // state must contain a -D-superseded doc only if its gate failed
    val state = graft.streaming.CdcStream.readState(
        spark, s"$base/state", Seq("id"), "__version")
      .select("id").as[Long].collect().toSet
    def gate(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16) % 1000000L
    }
    val expected =
      Seq(1L, 2L).filter(gate(_) < 500000L).toSet ++
        Seq(3L, 6L, 8L).filter(gate(_) < 333333L).toSet + 9L
    assert(state == expected)
  }

  test("a committed epoch replays as a no-op; a crashed epoch recovers") {
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    val after1 = incManifest(base)
    // committed replay: exact no-op
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == after1)
    // crash simulation: epoch 2's side stores commit, the state delta
    // doesn't — wipe it post-hoc and replay; the replay must not read
    // epoch 2's own side deltas (the readStore epoch bound) and must
    // land the identical state
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    val done = incManifest(base)
    org.apache.commons.io.FileUtils.deleteDirectory(
      java.nio.file.Paths.get(s"$base/state", f"delta=${2L}%020d").toFile)
    assert(!IncrementalCuration.epochCommitted(spark, base, 2L))
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == done)
    assert(incManifest(base) == batchManifest)
  }

  test("store compaction preserves state and later epochs still converge") {
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    val before = incManifest(base)
    // fold epochs 0-1 of every store into one delta each
    IncrementalCuration.compactStores(spark, base, 2L)
    assert(incManifest(base) == before)
    // each compacted store must be down to a single delta dir
    Seq("hashes", "shingles", "bands", "pairs", "kept", "state").foreach { st =>
      val deltas = new java.io.File(s"$base/$st").listFiles()
        .filter(_.getName.startsWith("delta="))
      assert(deltas.length == 1, s"$st has ${deltas.length} deltas")
    }
    // epoch 2 reads the compacted stores (cross-epoch pairs against
    // compacted bands/shingles, dup rule against the compacted hash
    // store) and the final manifest still equals the batch pipeline
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == batchManifest)
  }

  test("epochs arriving in REVERSE id order still converge (keeper re-election)") {
    // Every cross-epoch exact-dup group now sees its larger id FIRST:
    // doc 5 (epoch 1 of the reversed stream) is elected keeper of
    // baseB's hash group, is kept, and enters the LSH index with pairs
    // to 6 and 8; when doc 3 lands later, 5 must be retracted (-D,
    // masked out of the indexes) and 3 re-elected, its pairs to 6/8
    // re-discovered through the stored bands.
    val base = tmp()
    epochs.reverse.zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
    }
    assert(incManifest(base) == batchManifest)
    // the superseded keeper really was retracted, not just outscored
    val dropped = spark.read.parquet(s"$base/dropped/delta=*")
      .as[Long].collect().toSet
    assert(dropped == Set(5L))
    val state = graft.streaming.CdcStream.readState(
        spark, s"$base/state", Seq("id"), "__version")
      .select("id").as[Long].collect().toSet
    assert(!state.contains(5L))
  }

  test("interleaved (id % 3) epochs converge — no prefix structure at all") {
    val base = tmp()
    val slices = Seq(0, 1, 2).map(r => all.filter(_._1 % 3 == r))
    slices.zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
    }
    assert(incManifest(base) == batchManifest)
  }

  test("late dump: a failing-rules smaller dup dissolves a cluster (revert to singleton)") {
    // Epoch 0: B(10) and A(12) are near-dups → cluster {10, 12},
    // both gated at w=500000. Epoch 1: B'(5) lands LATE with B's
    // exact text but metadata lang 'de' (stopword vote says en) →
    // keeper re-election retracts 10, but 5 itself FAILS langid —
    // the content vanishes and A must revert to an always-sampled
    // singleton. Batch semantics: min id 5 of the hash group fails
    // a rule, non-min 10 is r_dup-dropped, 12 is a kept singleton.
    val textB = (1 to 30).map(i => s"z$i").mkString(" ")
    val late = Seq(
      Seq((10L, textB, "en"), (12L, textB + " tail", "en")),
      Seq((5L, textB, "de")))
    val base = tmp()
    late.zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
    }
    val inc = incManifest(base)
    val batch = CurationOps.curationManifest(df(late.flatten), "doc_id",
      "text", "lang").collect().map(_.toSeq).toSet
    assert(inc == batch)
    val state = graft.streaming.CdcStream.readState(
        spark, s"$base/state", Seq("id"), "__version")
      .select("id").as[Long].collect().toSet
    assert(state == Set(12L)) // 10 tombstoned, 5 never kept, 12 reverted
  }

  test("compaction after a retraction physically drops the ghost rows") {
    // reversed epochs 0-1 retract keeper 5 (doc 3 supersedes it);
    // folding those epochs must remove 5's kept/shingle/band/pair
    // rows from the folded dirs (they were read-masked anyway), so a
    // year of re-elections can't accrete ghost index rows
    val base = tmp()
    epochs.reverse.take(3).zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
    }
    val before = incManifest(base)
    IncrementalCuration.compactStores(spark, base, 3L)
    assert(incManifest(base) == before)
    assert(incManifest(base) == batchManifest)
    // the superseded keeper's rows are GONE from the folded stores
    val keptIds = spark.read.parquet(s"$base/kept/delta=*")
      .select("id").as[Long].collect().toSet
    assert(!keptIds.contains(5L), "ghost kept row survived the fold")
    val bandIds = spark.read.parquet(s"$base/bands/delta=*")
      .select("id").as[Long].collect().toSet
    assert(!bandIds.contains(5L), "ghost band rows survived the fold")
    val pairSides = spark.read.parquet(s"$base/pairs/delta=*")
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1, p._2)).toSet
    assert(!pairSides.contains(5L), "ghost pair rows survived the fold")
  }

  test("a crashed compaction (compacted + originals both on disk) never double-reads") {
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    def shingleRows: Long = IncrementalCuration.readStore(
      spark, s"$base/shingles", Long.MaxValue, spark.emptyDataFrame).count()
    val before = shingleRows
    // snapshot the shingles store, compact, then resurrect the
    // pre-compaction originals NEXT TO the compacted dir — exactly the
    // on-disk state a crash between the compacted write and the
    // original deletes leaves behind
    val shDir = new java.io.File(s"$base/shingles")
    val backup = Files.createTempDirectory("graft-bk-").toFile
    org.apache.commons.io.FileUtils.copyDirectory(shDir, backup)
    IncrementalCuration.compactStores(spark, base, 2L)
    assert(shingleRows == before)
    backup.listFiles().filter(_.getName.startsWith("delta=")).foreach { d =>
      org.apache.commons.io.FileUtils.copyDirectory(d,
        new java.io.File(shDir, d.getName))
    }
    // covered originals are masked: the row count must NOT double
    assert(shingleRows == before)
    // the pipeline still converges over the residue...
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == batchManifest)
    // ...and the next compaction sweep deletes it
    IncrementalCuration.compactStores(spark, base, 2L)
    val left = shDir.listFiles().map(_.getName)
      .filter(_.startsWith("delta=")).toSeq
    assert(left.count(_.stripPrefix("delta=").takeWhile(_.isDigit).toLong < 2L)
      == 1, s"residue not swept: $left")
  }

  test("a crash DURING the compacted write itself never loses the originals") {
    // deltaDirs must treat a compacted dir WITHOUT _SUCCESS as stale:
    // if it covered its epoch by name alone, every read would mask the
    // intact originals behind the partial frame and the next
    // compaction would delete them as 'stale' — permanent data loss
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    val before = incManifest(base)
    def shingleRows: Long = IncrementalCuration.readStore(
      spark, s"$base/shingles", Long.MaxValue, spark.emptyDataFrame).count()
    val rowsBefore = shingleRows
    // simulate the crash: a PARTIAL compacted dir (subset of the rows,
    // no _SUCCESS) lands next to the intact originals
    val shDir = s"$base/shingles"
    spark.read.parquet(s"$shDir/delta=" + "0" * 19 + "0")
      .limit(1).write.parquet(s"$shDir/delta=" + "0" * 19 + "1c")
    new java.io.File(s"$shDir/delta=" + "0" * 19 + "1c/_SUCCESS").delete()
    // reads still see the originals, not the partial frame
    assert(shingleRows == rowsBefore)
    assert(incManifest(base) == before)
    // the next compaction sweeps the partial dir and folds the intact
    // originals — nothing is lost
    IncrementalCuration.compactStores(spark, base, 2L)
    assert(shingleRows == rowsBefore)
    assert(incManifest(base) == before)
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == batchManifest)
  }

  test("re-ingesting STATELESS ids (failed rules / lost elections) fails loudly too") {
    // doc 4 failed C4 in epoch 0 and doc 5 lost the exact-dup election
    // in epoch 1 — neither has kept/dropped/hashes state, but both are
    // in the id ledger, and re-shipping either (possibly with NEW
    // text, which would corrupt the hash→keeper mapping) must refuse
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    Seq(
      (4L, "too short", "en"),                    // rules-failed, same text
      (5L, baseB + " now different", "en")        // dup-loser, NEW text
    ).foreach { row =>
      val e = intercept[IllegalArgumentException] {
        IncrementalCuration.processEpoch(2L, df(Seq(row)), base,
          "doc_id", "text", "lang")
      }
      assert(e.getMessage.contains(s"re-ingests doc id ${row._1}"))
      assert(!IncrementalCuration.epochCommitted(spark, base, 2L))
    }
    // fresh ids still flow
    IncrementalCuration.processEpoch(2L, df(epochs(2)), base,
      "doc_id", "text", "lang")
    assert(incManifest(base) == batchManifest)
  }

  test("the single-writer lease is loud on conflict and re-entrant after a crash") {
    val base = tmp()
    IncrementalCuration.acquireWriterLease(spark, base, "pipeline-a")
    // a second concurrent writer fails loudly, naming the holder
    val e = intercept[IllegalStateException] {
      IncrementalCuration.acquireWriterLease(spark, base, "pipeline-b")
    }
    assert(e.getMessage.contains("pipeline-a"))
    assert(e.getMessage.contains("pipeline-b"))
    // crash-restart: the SAME owner re-acquires (the normal replay path)
    IncrementalCuration.acquireWriterLease(spark, base, "pipeline-a")
    // a foreign release is a coordination bug worth surfacing
    intercept[IllegalArgumentException] {
      IncrementalCuration.releaseWriterLease(spark, base, "pipeline-b")
    }
    IncrementalCuration.releaseWriterLease(spark, base, "pipeline-a")
    // released: the other pipeline can now take over
    IncrementalCuration.withWriterLease(spark, base, "pipeline-b") {
      IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
        "doc_id", "text", "lang")
    }
  }

  test("two sources through ONE coordinator (alternating epochs under the lease) converge") {
    // the multi-stream regime processEpoch's contract prescribes: the
    // coordinator serializes the sources' dumps as alternating epochs
    // — cross-SOURCE exact dups (9/10 land via different sources) and
    // near-dups must still resolve exactly like the pooled batch
    val base = tmp()
    val bySource = Seq(all.filter(_._1 % 2 == 0), all.filter(_._1 % 2 == 1))
    IncrementalCuration.withWriterLease(spark, base, "coordinator") {
      // a stray second pipeline starting mid-run is refused
      intercept[IllegalStateException] {
        IncrementalCuration.acquireWriterLease(spark, base, "stray")
      }
      bySource(0).grouped(2).zip(bySource(1).grouped(2))
        .flatMap { case (a, b) => Seq(a, b) }
        .zipWithIndex.foreach { case (rows, e) =>
          IncrementalCuration.processEpoch(e.toLong, df(rows), base,
            "doc_id", "text", "lang")
        }
    }
    assert(incManifest(base) == batchManifest)
  }

  test("maybeCompact keeps a long run's delta counts bounded without breaking replay") {
    val base = tmp()
    all.grouped(2).zipWithIndex.foreach { case (rows, e) =>
      IncrementalCuration.processEpoch(e.toLong, df(rows), base,
        "doc_id", "text", "lang")
      // the ingest-loop hook: epoch e just committed, fold below it
      IncrementalCuration.maybeCompact(spark, base, e.toLong, maxDeltas = 2)
    }
    // bounded: every store stays at <= maxDeltas + 1 live dirs (the
    // fold runs when the strictly-below count EXCEEDS the threshold)
    val stats = IncrementalCuration.storeStats(spark, base)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    stats.foreach { case (st, n) =>
      assert(n <= 4, s"$st grew to $n deltas despite auto-compaction")
    }
    assert(incManifest(base) == batchManifest)
  }

  test("re-ingesting an id that contributed state fails loudly, not silently") {
    // doc 3 was kept in epoch 0; a later epoch delivering doc_id 3
    // again (a re-crawl under the same id) would silently corrupt the
    // manifest — the old version's index rows can't be re-derived for
    // retraction — so processEpoch must refuse it
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0).take(3)), base,
      "doc_id", "text", "lang")
    val e = intercept[IllegalArgumentException] {
      IncrementalCuration.processEpoch(1L,
        df(Seq((3L, baseB + " recrawled", "en"))), base,
        "doc_id", "text", "lang")
    }
    assert(e.getMessage.contains("re-ingests doc id"))
    // the refused epoch left no state commit: it can be replayed with
    // corrected data
    assert(!IncrementalCuration.epochCommitted(spark, base, 1L))
  }

  test("dedupFunnel: per-dump novelty attribution equals the global election, any order") {
    // slices arrive as epochs in a scrambled order, so keepers get
    // re-elected across epochs; each epoch's n_canonical must still
    // count exactly the docs that are GLOBAL minima of their content
    // hash (the batch election), attributed to their arrival epoch
    val slices = Seq(0, 1, 2).map(r => all.filter(_._1 % 3 == r))
    val order = Seq(2, 0, 1)
    val base = tmp()
    order.zipWithIndex.foreach { case (si, e) =>
      IncrementalCuration.processDedupEpoch(e.toLong, df(slices(si)),
        s"$base/st", "doc_id", "text")
    }
    val out = IncrementalCuration.dedupFunnel(spark, s"$base/st")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val canon = all.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val expected = order.zipWithIndex.map { case (si, e) =>
      val sl = slices(si)
      e.toLong -> ((sl.size.toLong, sl.count(t => canon(t._1)).toLong,
        sl.count(t => !canon(t._1)).toLong))
    }.toMap
    assert(out == expected)
    // a committed epoch replays as a no-op; a seen id is refused
    IncrementalCuration.processDedupEpoch(0L, df(slices(2)), s"$base/st",
      "doc_id", "text")
    intercept[IllegalArgumentException] {
      IncrementalCuration.processDedupEpoch(3L, df(slices(0).take(1)),
        s"$base/st", "doc_id", "text")
    }
    assert(IncrementalCuration.dedupFunnel(spark, s"$base/st")
      .count() == 3L)
  }

  test("storeStats reads the operational state without touching the corpus") {
    val base = tmp()
    IncrementalCuration.processEpoch(0L, df(epochs(0)), base,
      "doc_id", "text", "lang")
    IncrementalCuration.processEpoch(1L, df(epochs(1)), base,
      "doc_id", "text", "lang")
    def stats = IncrementalCuration.storeStats(spark, base)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = stats
    Seq("hashes", "kept", "state").foreach { st =>
      assert(s1(st).getInt(1) == 2, s"$st deltas")
      assert(s1(st).getInt(2) == 2, s"$st committed")
      assert(!s1(st).getBoolean(3), s"$st uncommitted")
      assert(s1(st).getLong(5) == 1L, s"$st max epoch")
    }
    assert(s1("kept").getLong(6) > 0L)
    // a crashed write (delta dir without _SUCCESS) is flagged
    val crashDir = new java.io.File(s"$base/kept/delta=" + "0" * 18 + "05")
    crashDir.mkdirs()
    assert(stats("kept").getBoolean(3), "uncommitted delta not flagged")
    org.apache.commons.io.FileUtils.deleteDirectory(crashDir)
    // compaction folds to one committed delta per store
    IncrementalCuration.compactStores(spark, base, 2L)
    val s2 = stats
    Seq("hashes", "kept", "state").foreach { st =>
      assert(s2(st).getInt(1) == 1, s"$st post-compaction deltas")
      assert(s2(st).getLong(5) == 1L, s"$st post-compaction epoch bound")
    }
  }

  test("streaming form resumes from its checkpoint across a kill") {
    val base = tmp()
    val logDir = s"$base/log"
    val docSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    def writeLog(rows: Seq[(Long, String, String)]): Unit =
      LogSource.write(
        df(rows).withColumn("partition", lit(0))
          .repartition(1).sortWithinPartitions(col("doc_id"))
          .select(col("partition"),
            to_json(struct(col("doc_id"), col("text"), col("lang")))
              .as("value")),
        logDir)
    def run(): Unit = {
      val q = spark.readStream.format("graft-log").option("path", logDir)
        .option("maxRecordsPerTrigger", 4).load()
        .select(from_json(col("value"), docSchema).as("d"))
        .select(col("d.*"))
        .writeStream
        .option("checkpointLocation", s"$base/ckpt")
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          IncrementalCuration.processEpoch(epoch, batch, s"$base/st",
            "doc_id", "text", "lang")
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    writeLog(epochs(0)) // first dump lands
    run()               // ... is processed, query killed
    writeLog(epochs(1)) // more dumps land while the pipeline is down
    writeLog(epochs(2))
    run()               // restart from the checkpoint: only new offsets
    assert(incManifest(s"$base/st") == batchManifest)
  }
}
