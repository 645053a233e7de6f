package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

import graft.Checkpoints.BarrierOps
import graft.operators.{CurationOps, Dedup, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** td56/td58: the STREAMING/INCREMENTAL twin of td46's nightly batch
  * curation pipeline — the shape a real 100 TB corpus owner actually
  * operates: a new dump arrives as an epoch micro-batch, and the
  * verdict / near-dup weights / sampled-manifest state UPDATE rather
  * than recompute, through the engine's already-oracled incremental
  * machinery (td31's persisted band+shingle LSH indexes, kfk06's
  * epoch-delta upsert compaction). Reference behavior: this is the
  * reference's continuous-pipeline identity — its runtime exists to
  * keep exactly this kind of job incremental (stateful operators over
  * a changelog, e.g. flink-table-runtime
  * .../operators/deduplicate/ProcTimeDeduplicateKeepLastRowFunction.java
  * and the StreamExecGroupAggregate retraction machinery); here each
  * stage is an idempotent epoch-keyed delta over persisted parquet
  * state, Spark's lakehouse equivalent of that contract.
  *
  * Per-epoch state stores under `base` (all epoch-keyed delta dirs,
  * written with a _SUCCESS-guarded idempotent commit so replays are
  * no-ops and half-written dirs are rewritten; all filesystem access
  * goes through Hadoop's FileSystem API, so `base` can live on any
  * Hadoop-visible store — local, HDFS, or an object store):
  *  - `hashes/`   (h, id): per text-hash, the smallest doc id seen in
  *                each epoch that IMPROVED on the stored keeper; the
  *                canonical keeper is min(id) per h on read — a
  *                min-merge is order-independent, which is what makes
  *                exact-dup election correct under out-of-order
  *                ingestion
  *  - `shingles/` kept docs' hashed shingle index (td31's store)
  *  - `bands/`    kept docs' LSH band index (td31's store)
  *  - `pairs/`    verified near-dup pairs (append-only RAW: pairs
  *                whose side is later retracted are masked on read
  *                via `dropped/`, never rewritten)
  *  - `kept/`     per-kept-doc manifest stats (id, nt, nchars, lang)
  *  - `dropped/`  ids of previously-KEPT docs later superseded by a
  *                smaller-id exact duplicate (the retraction list;
  *                every side-store read is anti-joined against it)
  *  - `ledger/`   EVERY ingested doc id with its ingest epoch — the
  *                complete seen-id set behind the loud re-ingestion
  *                guard (ids that failed rules or lost a dup election
  *                leave no other state, but they are still here, so
  *                re-shipping ANY previously-seen id is refused, not
  *                just state-bearing ones), and the arrival-epoch
  *                attribution the per-dump funnel reports join on
  *  - `state/`    the upsert table of SAMPLED docs (kfk06's
  *                merge-on-read delta shape, pk=id, version=epoch)
  *
  * Exactness vs the batch pipeline (the td56/td58 oracle is td46's,
  * verbatim) holds for ANY arrival order — epochs do NOT need to be
  * id-ordered prefixes (td58 feeds the corpus id-DESCENDING to pin
  * this):
  *  - per-doc rules (C4, langid) are embarrassingly incremental;
  *  - exact-dup canonicalization is RE-ELECTED: the keeper of a hash
  *    group is the min id seen SO FAR (min-merge over the `hashes`
  *    store). When an epoch brings a smaller id than the stored
  *    keeper, the superseded keeper is retracted — appended to
  *    `dropped/`, masked out of every index read, and tombstoned in
  *    the state with a `-D` row — and the new keeper flows through
  *    the normal kept path. This is the reference's retract pattern
  *    (flink-table-runtime .../deduplicate/
  *    RowTimeDeduplicateFunction.java emitting UPDATE_BEFORE for a
  *    superseded row, StreamExecChangelogNormalize downstream)
  *    applied to the curation pipeline;
  *  - near-dup pairs: minhash signatures/bands are per-doc
  *    deterministic, so incremental candidates + exact verify equal
  *    the batch LSH pair set over LIVE (non-retracted) docs,
  *    discovered at the later member's epoch; a retracted doc's
  *    pairs are masked on read, and its exact-dup replacement (same
  *    lowered text ⇒ identical shingles) re-discovers the same
  *    partners when it is kept;
  *  - weights: every component whose membership, edges, or size
  *    changed this epoch has ALL its live members re-emitted
  *    (version=epoch) at the new size. The touched set is complete
  *    by construction: size/edge changes happen only via a new kept
  *    member (signalled by its id), a new pair (signalled by its
  *    endpoints), or a retraction (signalled by the retracted id,
  *    traced to its old partners through the PRE-retraction pair
  *    graph). Keep-latest-version merge-on-read therefore converges
  *    to the batch gate decision at final cluster sizes; untouched
  *    components' past rows stay valid. New docs in no component are
  *    re-emitted as singletons, as are docs whose cluster dissolved
  *    under retraction (w=1e6: the gate always passes).
  *
  * Scale anatomy per epoch: O(|batch|) rule evaluation + O(|batch| +
  * colliding postings) incremental LSH (never O(corpus) — the stored
  * corpus enters only through band-bucket, hash-keyed, and
  * candidate-id joins); the component relabel runs on the PAIR store
  * (duplicated-slice-sized, the td16 invariant) and emission is
  * bounded by the touched slice. The retraction path costs one extra
  * pair-store component pass ONLY on epochs that actually supersede
  * a keeper (driver-gated on a bounded ≤|batch|-row frame). Nothing
  * is driver-resident; the state stores are parquet deltas a
  * 1000-executor job reads/writes like any table, and
  * [[compactStores]] folds deltas when read amplification grows.
  */
object IncrementalCuration {

  private def hadoopFs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Label the jobs `body` schedules (guide §1.5) — setJobDescription
    * is thread-local, so concurrent phases stay correctly labeled.
    */
  private def labeled[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val old = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(old)
  }

  /** Overlap INDEPENDENT epoch jobs from a driver thread pool (guide
    * §2.6): Spark's scheduler runs concurrent jobs fine — actions are
    * only sequential because the driver calls them sequentially, and a
    * micro-batch epoch is a chain of many small materializations whose
    * tails leave most executors idle. Each thunk must be independent
    * of its siblings (enforced here by construction: every input frame
    * is either already checkpointed or a store read strictly below the
    * epoch). Failures propagate: the first thrown cause is rethrown
    * after all thunks settle, so a failed guard still aborts the epoch
    * before any dependent phase runs. FIFO scheduling keeps the
    * back-fill behavior; job descriptions are thread-local, so labels
    * stay correct per thunk.
    */
  private def concurrently(work: (() => Unit)*): Unit = {
    if (work.size == 1) { work.head(); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
    try {
      val futs = work.map(w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = w()
        }))
      var firstErr: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstErr == null) firstErr = e.getCause
        }
      }
      if (firstErr != null) throw firstErr
    } finally pool.shutdown()
  }

  private def deltaDir(store: String, epoch: Long): Path =
    new Path(store, f"delta=$epoch%020d")

  /** Idempotent epoch-keyed append: a committed delta (has _SUCCESS)
    * is never rewritten; a half-written one (crash mid-write) is
    * wiped and rewritten. Same contract as CdcStream.upsertSink,
    * hardened with the _SUCCESS check.
    */
  private def appendEpoch(df: DataFrame, store: String, epoch: Long): Unit = {
    val fs = hadoopFs(df.sparkSession, store)
    val dir = deltaDir(store, epoch)
    if (fs.exists(dir) && !fs.exists(new Path(dir, "_SUCCESS")))
      fs.delete(dir, true)
    if (!fs.exists(dir))
      labeled(df.sparkSession, s"ic: append ${new Path(store).getName}") {
        df.write.mode("errorifexists").parquet(dir.toString)
      }
  }

  /** The delta dirs of `store` that are CURRENT — i.e. not covered by
    * a compacted dir. [[compactStores]] writes the compacted dir
    * FIRST (crash-safe: `delta=<maxFolded>c`) and deletes the
    * originals after; a crash in between leaves both, and a reader
    * that unioned them would double every side-store row (benign for
    * the keep-latest state, but duplicated shingle rows would inflate
    * the LSH verify's count-based intersections). So: any
    * non-compacted dir at/below the newest COMMITTED compacted dir's
    * epoch, and any OLDER compacted dir (residue of a crashed
    * re-compaction), is stale. A compacted dir WITHOUT `_SUCCESS` — a
    * crash DURING the compacted write itself — is always stale and
    * never covers anything: treating it as covering would mask the
    * intact originals behind a partial frame and let the next
    * compaction delete them, i.e. silent data loss. Returns
    * (live, stale).
    */
  private def deltaDirs(fs: FileSystem, store: String)
      : (Array[FileStatus], Array[FileStatus]) = {
    val all =
      try fs.listStatus(new Path(store))
      catch { case _: java.io.FileNotFoundException => Array.empty[FileStatus] }
    val deltas = all.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("delta="))
    def committed(d: FileStatus): Boolean =
      fs.exists(new Path(d.getPath, "_SUCCESS"))
    val covered = deltas
      .filter(d => isCompacted(d) && committed(d)).map(deltaEpoch)
      .foldLeft(-1L)(math.max)
    val (stale, live) = deltas.partition(d =>
      (isCompacted(d) && !committed(d)) ||
        (!isCompacted(d) && deltaEpoch(d) <= covered) ||
        (isCompacted(d) && deltaEpoch(d) < covered))
    (live, stale)
  }

  /** Read a store's deltas STRICTLY BELOW `epoch`, or `empty` (a
    * limit-0 frame carrying the store's schema) when none exist. The
    * explicit epoch bound (not just listing order) is what makes a
    * CRASHED epoch replayable: a first attempt that died after some
    * side-store appends but before the state commit leaves its own
    * `delta=<epoch>` dirs behind, and the replay must not read them —
    * e.g. the epoch's docs would anti-join against their own freshly-
    * appended text hashes and every doc would drop as a "duplicate".
    */
  private[graft] def readStore(spark: SparkSession, store: String, epoch: Long,
                               empty: => DataFrame): DataFrame = {
    val dirs = deltaDirs(hadoopFs(spark, store), store)._1
      .filter(deltaEpoch(_) < epoch)
      .map(_.getPath.toString)
    if (dirs.nonEmpty) spark.read.parquet(dirs.toIndexedSeq: _*) else empty
  }

  /** The epoch a delta dir covers UP TO: the leading digits of its
    * name — `delta=00…07` reads 7, and a compacted dir `delta=00…07c`
    * also reads 7, so the strictly-below-epoch read bound holds
    * across compactions.
    */
  private def deltaEpoch(f: FileStatus): Long =
    f.getPath.getName.stripPrefix("delta=").takeWhile(_.isDigit).toLong

  private def isCompacted(f: FileStatus): Boolean =
    f.getPath.getName.endsWith("c")

  /** Whether `epoch` is already fully processed (its state delta
    * committed) — the replay guard processEpoch keys on.
    */
  def epochCommitted(spark: SparkSession, base: String, epoch: Long): Boolean = {
    val fs = hadoopFs(spark, base)
    fs.exists(new Path(deltaDir(s"$base/state", epoch), "_SUCCESS"))
  }

  /** Process one epoch of new documents — arriving in ANY id order
    * relative to previous epochs — against the persisted curation
    * state under `base`. Idempotent: a replayed committed epoch is a
    * no-op (foreachBatch's at-least-once contract becomes
    * exactly-once, like upsertSink's).
    *
    * EPOCHS MUST BE SERIALIZED per `base`: the strictly-below-epoch
    * store reads and the `_SUCCESS` commit protocol assume one writer
    * advancing one epoch at a time (which a single Structured
    * Streaming query's foreachBatch guarantees by construction). Two
    * CONCURRENT writers — e.g. two source streams ingesting into the
    * same base — would race the commit protocol; route them through
    * one coordinator query (union the sources upstream, or alternate
    * their dumps as epochs) and have each ingest process hold the
    * [[withWriterLease]] lease so a misconfigured second pipeline
    * fails loudly instead of corrupting the stores. Per-source store
    * namespaces merged on read were considered and rejected: exact-dup
    * keeper election min-merges correctly across namespaces, but
    * near-dup pair DISCOVERY is cross-source (each namespace's LSH
    * index only holds its own docs), so split indexes silently miss
    * cross-source pairs — the manifest would diverge from batch.
    */
  def processEpoch(epoch: Long, newDocs: DataFrame, base: String,
                   idCol: String, textCol: String, langCol: String,
                   lshThreshold: Double = 0.8, numPerms: Int = 64,
                   rowsPerBand: Int = 2): Unit = {
    val spark = newDocs.sparkSession
    if (epochCommitted(spark, base, epoch)) return
    // one narrow projection feeds every rule + the stats/shingle paths
    val docs = labeled(spark, "ic: docs") { newDocs
      .select(col(idCol).as("id"), col(textCol).as("text"),
        col(langCol).as("lang"))
      .barrier() }
    // NOTE (measured, guide §1): wrapping the epoch body in Pregel's
    // iteration conf (small static shuffle sizing + AQE off) was tried
    // and REVERTED — scheduled jobs dropped 245→115, but the epoch's
    // joins probe checkpointed frames (LogicalRDD, no size stats), so
    // without AQE's runtime re-planning every broadcast join degraded
    // to sort-merge: tasks 675→1958, shuffle bytes +29%, wall time
    // worse. AQE's per-exchange job latency is the cheaper tax here.
    epochBody(spark, epoch, docs, base, lshThreshold, numPerms,
      rowsPerBand)
  }

  private def epochBody(spark: SparkSession, epoch: Long, docs: DataFrame,
                        base: String, lshThreshold: Double, numPerms: Int,
                        rowsPerBand: Int): Unit = {
    // ---- exact-dup canonical RE-election (order-independent) -------
    // Barriered as a NARROW id/hash frame: three consumers (verdict
    // join, hashes append, retraction detection) would otherwise each
    // re-run the hash-store aggregate + join.
    val dup = labeled(spark, "ic: dup-election") {
      dupElection(docs, base, epoch).barrier() }
    // keepers superseded by a strictly smaller id in this epoch; of
    // those, only previously-KEPT docs have any store/state presence
    val supersededKeepers = dup
      .where(col("r_dup") && col("keeper").isNotNull)
      .select(col("keeper").as("id"))
    val droppedBefore = readStore(spark, s"$base/dropped", epoch,
      docs.select(col("id")).limit(0))
    val storedKeptRaw = readStore(spark, s"$base/kept", epoch,
      docs.select(col("id"), lit(0L).as("nt"), lit(0L).as("nchars"),
        col("lang")).limit(0))
    // ---- verdict on the new batch (td46's three enforced rules) ----
    val c4 = TextOps.c4Clean(docs, "id", "text") // output key is "doc_id"
      .select(col("doc_id").as("id"), col("keep_doc").as("r_c4"))
    val lang = TextOps.langidAgreement(docs, "id", "text", "lang")
    // Retraction detection, the re-ingest guard, and the verdict are
    // mutually independent (each reads only `docs`/`dup` — both
    // checkpointed — plus stores strictly below this epoch, and
    // nothing is appended until all three finish), so they run
    // OVERLAPPED (guide §2.6): the epoch is a chain of small
    // materializations whose job tails would otherwise leave the
    // cluster idle between driver-sequential actions. A failed guard
    // still aborts the epoch before any append.
    var retracted: DataFrame = null
    var hasRetractions = false // the bounded driver gate: the extra
    // PRE-retraction component pass below is paid only on epochs that
    // actually supersede a keeper — in-order ingestion never does
    var keptIds: DataFrame = null
    concurrently(
      () => {
        retracted = labeled(spark, "ic: retraction-detect") {
          supersededKeepers
            .join(storedKeptRaw.select(col("id")), Seq("id"), "left_semi")
            .barrier() } // feeds the dropped append, -D rows, index
                         // masking, the touch graph, and the gate
        hasRetractions =
          labeled(spark, "ic: retraction-gate") { !retracted.isEmpty }
      },
      () => requireFreshIds(docs, base, epoch),
      () => {
        // materialized BEFORE any store append (an epoch must never
        // see its own writes); the id-only frame feeds three consumers
        keptIds = labeled(spark, "ic: verdict") {
          c4.join(lang, "id")
            .join(dup.select(col("id"), col("r_dup")), "id")
            .where(col("r_c4") && col("r_lang") && col("r_dup"))
            .select(col("id"))
            .barrier() }
      })
    val kept = docs.join(keptIds, "id")

    // every stored index is read MINUS the full retraction list —
    // including this epoch's, so a re-elected keeper's replacement
    // (identical shingles!) can't pair with the ghost it replaced
    val droppedAll = droppedBefore.union(retracted)
    def minusDropped(df: DataFrame): DataFrame =
      df.join(droppedAll, Seq("id"), "left_anti")

    // ---- incremental near-dup against the persisted LSH index ----
    // The stats projection and the shingle→bands→pairs chain share no
    // edge, so they overlap too (§2.6) — the signature aggregate is
    // the epoch's most expensive expression and the stats pass rides
    // its tail.
    var newKeptStats: DataFrame = null
    var newIdx: DataFrame = null
    var newBands: DataFrame = null
    var newPairs: DataFrame = null
    concurrently(
      () => {
        newKeptStats = labeled(spark, "ic: kept-stats") {
          kept.select(col("id"),
              size(TextOps.words(col("text"))).cast("long").as("nt"),
              length(col("text")).cast("long").as("nchars"), col("lang"))
            .barrier() } // feeds the kept-store append + stats joins
      },
      () => {
        newIdx = labeled(spark, "ic: shingle-idx") {
          TextOps.shingleHashIndex(kept, "id", "text", 3)
            .select(col("id"), col("sh")).barrier() }
        newBands = labeled(spark, "ic: bands") {
          TextOps.lshBands(
              TextOps.minhashSignatureIdx(newIdx, numPerms), "id",
              numPerms, rowsPerBand)
            .barrier() }
        val storedBands = minusDropped(
          readStore(spark, s"$base/bands", epoch, newBands.limit(0)))
        val storedShingles = minusDropped(
          readStore(spark, s"$base/shingles", epoch, newIdx.limit(0)))
        // the PRE-materialized entry: newIdx and newBands are already
        // checkpointed above (they feed the store appends), so the
        // miner must not re-checkpoint the index or re-run the minhash
        // signature aggregate — that was a full second signature pass
        // per epoch
        newPairs = labeled(spark, "ic: new-pairs") {
          TextOps.incrementalNearDupPre(newIdx, newBands, storedBands,
              storedShingles, lshThreshold)
            .select(col("id_a"), col("id_b"))
            .barrier() } // feeds the pair-store append + both graphs
      })
    val storedPairsRaw = readStore(spark, s"$base/pairs", epoch,
      newPairs.limit(0))
    def pairsMinus(dropped: DataFrame): DataFrame = storedPairsRaw
      .join(dropped.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(dropped.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
      .select(col("id_a"), col("id_b"))

    // ---- append-only index maintenance (all epoch-keyed, idempotent)
    // All seven appends read frames checkpointed above (or stores
    // strictly below this epoch), and the component pass reads the
    // checkpointed newPairs + the pair store — mutually independent,
    // so the writes overlap each other AND the component pass (§2.6):
    // store-write commit latency is per-directory fixed cost that
    // serializing would sum. readStore's strictly-below-epoch bound
    // keeps this epoch's concurrent appends invisible to its reads.
    // hashes: only IMPROVEMENTS (new hash, or a smaller id than the
    // stored keeper) — min-on-read stays correct and the store grows
    // by at most the epoch's distinct hashes
    val livePairs = pairsMinus(droppedAll).union(newPairs)
    var compLive: DataFrame = null
    concurrently(
      () => appendEpoch(dup
        .where(col("r_dup"))
        .select(col("h"), col("id")), s"$base/hashes", epoch),
      () => appendEpoch(newIdx, s"$base/shingles", epoch),
      () => appendEpoch(newBands, s"$base/bands", epoch),
      () => appendEpoch(newPairs, s"$base/pairs", epoch),
      () => appendEpoch(newKeptStats, s"$base/kept", epoch),
      () => appendEpoch(retracted, s"$base/dropped", epoch),
      () => appendEpoch(docs.select(col("id"))
        .withColumn("epoch", lit(epoch)), s"$base/ledger", epoch),
      // ---- re-weight TOUCHED components (the epoch's upsert delta)
      // LIVE graph: pairs among currently-live docs — cluster sizes
      // and membership come from here. Pair-store-sized, never corpus.
      // No extra barrier: connectedComponents already returns a
      // materialized frame on both paths (a size-known LOCAL relation
      // below the edge cap — which lets every join against it
      // broadcast — or the loop's own checkpointed labels above it).
      () => compLive = labeled(spark, "ic: components") {
        Dedup.connectedComponents(livePairs) })
    val sizes = compLive.groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("cluster_size"))
    // docs affected by a retraction: the retracted keeper's old
    // partners, traced through the PRE-retraction graph (the live
    // graph no longer holds those edges — this is the only signal
    // that a component shrank or split). Gated: in-order ingestion
    // never pays this pass.
    val retractionAffected =
      if (!hasRetractions) compLive.select(col("id")).limit(0)
      else labeled(spark, "ic: retraction-touch") {
        val touchGraph = pairsMinus(droppedBefore).union(newPairs)
        val compTouch = Dedup.connectedComponents(touchGraph)
        val retractedLabels = compTouch
          .join(retracted, "id").select(col("label")).distinct()
        compTouch.join(retractedLabels, "label").select(col("id"))
          .join(droppedAll, Seq("id"), "left_anti")
      }
    val touchedIds = keptIds
      .union(newPairs.select(col("id_a").as("id")))
      .union(newPairs.select(col("id_b").as("id")))
      .union(retractionAffected)
      .distinct()
    val touchedLabels = compLive.join(touchedIds, "id")
      .select(col("label")).distinct()
    val allKept = minusDropped(storedKeptRaw).unionByName(newKeptStats)
    // gate and weight are the SHARED batch-path definitions — the two
    // manifests only converge if both sites evaluate the identical pair
    val clusteredRows = compLive.join(touchedLabels, "label")
      .join(sizes, "label")
      .join(allKept, "id") // id-keyed; clustered side is the small one
      .withColumn("__rowkind",
        when(CurationOps.sampleGate(col("id")) <
          Dedup.wMicroOf(col("cluster_size")), "+U").otherwise("-D"))
      .select(col("id"), col("nt"), col("nchars"), col("lang"),
        col("__rowkind"))
    // singletons: new kept docs in no component, plus previously-
    // clustered docs whose cluster dissolved under retraction — either
    // way w=1e6, the gate always passes, and keep-latest treats the
    // +I exactly like a +U re-emission
    val singletonIds = keptIds.union(retractionAffected).distinct()
      .join(compLive, Seq("id"), "left_anti")
    val singletonRows = allKept.join(singletonIds, Seq("id"), "left_semi")
      .select(col("id"), col("nt"), col("nchars"), col("lang"),
        lit("+I").as("__rowkind"))
    // tombstones for the keepers this epoch superseded
    val retractedRows = storedKeptRaw
      .join(retracted, Seq("id"), "left_semi")
      .select(col("id"), col("nt"), col("nchars"), col("lang"),
        lit("-D").as("__rowkind"))
    appendEpoch(
      clusteredRows.unionByName(singletonRows).unionByName(retractedRows)
        .withColumn("__version", lit(epoch)),
      s"$base/state", epoch)
  }

  /** td64: [[processEpoch]]'s LIGHTWEIGHT sibling for the per-dump
    * admission monitoring regime — maintains ONLY the exact-dup
    * election state (`hashes/` min-merge improvements) and the id
    * `ledger/` (with arrival epochs), so an ops pipeline that just
    * needs the novelty/dup-rate funnel per dump pays one hash pass +
    * one store-side semi-join per epoch, never the full curation
    * DAG's rules/LSH/component machinery. Stores are the SAME layout
    * as processEpoch's, so [[dedupFunnel]] reads either pipeline's
    * base. Same commit protocol: the ledger delta (written LAST) is
    * the epoch's commit marker, every append is `_SUCCESS`-guarded
    * and replay-safe, and the same loud re-ingestion guard applies.
    * Same order-independence: the min-merge election is correct under
    * ANY epoch arrival order.
    */
  def processDedupEpoch(epoch: Long, newDocs: DataFrame, base: String,
                        idCol: String, textCol: String): Unit = {
    val spark = newDocs.sparkSession
    val fs = hadoopFs(spark, base)
    if (fs.exists(new Path(deltaDir(s"$base/ledger", epoch), "_SUCCESS")))
      return // committed replay: no-op
    val docs = newDocs
      .select(col(idCol).as("id"), col(textCol).as("text"))
    requireFreshIds(docs, base, epoch)
    val dup = dupElection(docs, base, epoch)
    appendEpoch(dup.where(col("r_dup"))
      .select(col("h"), col("id")), s"$base/hashes", epoch)
    appendEpoch(docs.select(col("id"))
      .withColumn("epoch", lit(epoch)), s"$base/ledger", epoch)
  }

  /** THE exact-dup canonical election shared by [[processEpoch]] and
    * [[processDedupEpoch]] (one definition, like sampleGate/wMicroOf —
    * drift between the two sites would silently diverge their
    * stores): per epoch doc, its content hash `h`, the stored
    * `keeper` of that hash (NULL for a new hash), and `r_dup` — the
    * doc is the min id of its hash group ACROSS everything seen so
    * far (min within the epoch AND strictly below the stored keeper;
    * ids are unique, so equality with a stored keeper is impossible).
    * Keepers are read ONLY for hashes colliding with this epoch:
    * semi-join the store by the epoch's hash set BEFORE aggregating,
    * so in the daily-dump regime (epoch ≪ corpus) the store side is
    * one scan + a broadcast semi-join and the keeper frame is
    * epoch-collision-sized — not two store-wide exchanges per epoch;
    * a huge epoch degrades to the shuffle join via AQE, never worse
    * than the unfiltered aggregate.
    */
  private def dupElection(docs: DataFrame, base: String,
                          epoch: Long): DataFrame = {
    val spark = docs.sparkSession
    val hashed = docs.withColumn("__h", md5(lower(col("text"))))
    val epochHashes = hashed.select(col("__h").as("h")).distinct()
    val storedKeepers = readStore(spark, s"$base/hashes", epoch,
        hashed.select(col("__h").as("h"), col("id")).limit(0))
      .join(epochHashes, Seq("h"), "left_semi")
      .groupBy(col("h")).agg(min(col("id")).as("keeper"))
    val epochMin = min(col("id")).over(Window.partitionBy(col("__h")))
    hashed
      .join(storedKeepers.withColumnRenamed("h", "__h"), Seq("__h"), "left")
      .withColumn("r_dup",
        col("id") === epochMin &&
          (col("keeper").isNull || col("id") < col("keeper")))
      .select(col("id"), col("__h").as("h"), col("keeper"), col("r_dup"))
  }

  /** THE loud id-uniqueness guard shared by [[processEpoch]] and
    * [[processDedupEpoch]]: the pipeline's stores model each doc id
    * as ingested ONCE (the log/offset contract — a re-crawled doc
    * must arrive under a new id or through a keep-latest compaction
    * upstream). A re-ingested id would silently corrupt the state —
    * a state-bearing id's old index rows can't be re-derived for
    * retraction, and even a STATELESS id (failed rules, lost a dup
    * election) re-arriving with different text would corrupt the
    * hash→keeper mapping — so the guard checks the COMPLETE seen-id
    * set, the `ledger/` store appended from every ingested batch.
    * One semi-join of the ledger scan against the (broadcastable)
    * epoch id set; the ledger is the narrowest possible corpus-linear
    * frame and compacts like every other store.
    */
  private def requireFreshIds(docs: DataFrame, base: String,
                              epoch: Long): Unit = {
    val spark = docs.sparkSession
    val ledgerBefore = readStore(spark, s"$base/ledger", epoch,
      docs.select(col("id")).limit(0))
    val reIngested = labeled(spark, "ic: fresh-guard") {
      docs.select(col("id"))
        .join(ledgerBefore.select(col("id")), Seq("id"), "left_semi")
        .limit(1).collect() }
    require(reIngested.isEmpty,
      s"epoch $epoch re-ingests doc id ${reIngested.head.get(0)}" +
        " which was already ingested — ids must be unique across" +
        " the ingest stream (re-crawls need new ids or upstream" +
        " keep-latest compaction)")
  }

  /** td64: the per-dump admission funnel, read from the pipeline's
    * OWN stores at zero corpus re-scans — per ingest epoch, how many
    * docs arrived (`n_ingested`, the ledger), how many are the FINAL
    * canonical keeper of their content hash (`n_canonical`: min-merge
    * the hashes store to the current keeper set, attribute each
    * keeper to its arrival epoch through the ledger), and the
    * exact-dup rate in micros — the "what fraction of each dump was
    * content we already had" report a corpus owner reads per vendor
    * delivery (td62 is the per-SOURCE batch twin). Order-independent:
    * keeper re-elections move a hash's keeper (and so its epoch
    * attribution) exactly as the final global election dictates, so
    * the report equals the batch recompute under ANY arrival order.
    * Scale anatomy: one scan of the two narrowest stores (id ledger,
    * hash→keeper), one id-keyed join, |epochs| output rows. A read
    * racing a crashed epoch (hashes delta committed, ledger delta
    * not — the one possible gap, since the ledger is the commit
    * marker) simply shows the post-replay attribution early: keepers
    * without a ledger row don't join, and the replay's hashes append
    * is a no-op, so the report converges to the same rows.
    */
  def dedupFunnel(spark: SparkSession, base: String): DataFrame = {
    val ledger = readStore(spark, s"$base/ledger", Long.MaxValue,
      spark.range(0).select(col("id"), col("id").as("epoch")))
    val keepers = readStore(spark, s"$base/hashes", Long.MaxValue,
        spark.range(0).select(col("id").cast("string").as("h"), col("id")))
      .groupBy(col("h")).agg(min(col("id")).as("id"))
      .select(col("id"), lit(true).as("canon"))
    ledger
      .join(keepers, Seq("id"), "left")
      .groupBy(col("epoch"))
      .agg(count(lit(1)).as("n_ingested"),
        sum(when(col("canon"), 1L).otherwise(0L)).as("n_canonical"))
      .withColumn("n_exact_dup", col("n_ingested") - col("n_canonical"))
      .withColumn("exact_dup_micro",
        graft.operators.CurationOps.microRatio("n_exact_dup", "n_ingested"))
  }

  /** Compact the pipeline's state under `base`: fold every store's
    * committed epoch deltas STRICTLY BELOW `belowEpoch` into one
    * delta (named `delta=<maxFolded>c`, CdcStream.compact's
    * write-first crash-safe convention: the compacted dir lands
    * first, then the originals are deleted). A crash in between
    * leaves originals + compacted on disk — [[deltaDirs]] masks the
    * covered originals on EVERY read, so no store ever reads a row
    * twice, and the next fold deletes the residue. Row counts are
    * unchanged for the append-only side stores (the `hashes` store
    * min-merges, shrinking to one keeper row per hash) and the state
    * keeps its latest image per key (tombstoned keys are GC'd like
    * CdcStream.compact).
    *
    * Run it only for epochs at/below the ingest checkpoint's last
    * committed batch: a crash replays only the last UNcommitted
    * epoch, so the replay guard's exact state-delta dir and the
    * replay's strictly-below reads are never compacted away.
    */
  def compactStores(spark: SparkSession, base: String,
                    belowEpoch: Long): Unit = {
    def fold(store: String, rewrite: DataFrame => DataFrame): Unit = {
      val fs = hadoopFs(spark, store)
      val (live, stale) = deltaDirs(fs, store)
      stale.foreach(d => fs.delete(d.getPath, true)) // crash residue
      val olds = live.filter(deltaEpoch(_) < belowEpoch)
      if (olds.length <= 1) return
      val merged = rewrite(
        spark.read.parquet(olds.map(_.getPath.toString).toIndexedSeq: _*))
      val target = new Path(store,
        olds.map(_.getPath.getName).max + "c")
      merged.write.mode("overwrite").parquet(target.toString)
      olds.foreach(d => fs.delete(d.getPath, true))
    }
    // retraction-aware fold: rows of superseded keepers are PHYSICALLY
    // removed from the folded side stores (they are masked on every
    // read anyway, so reads are unchanged) — without this, a year of
    // keeper re-elections leaves ghost index rows and an ever-growing
    // anti-join list on the hot read path. The dropped store itself is
    // RETAINED (identity fold): deltas above the fold bound can still
    // hold pair rows that reference an id dropped below it, and those
    // reads keep masking until they are folded too. Safe because ids
    // are unique — a dropped id never re-enters, so removing its rows
    // commutes with every later epoch's read.
    val droppedIds = readStore(spark, s"$base/dropped", belowEpoch,
      spark.range(0).select(col("id")))
    def minusDroppedOn(cols: String*)(df: DataFrame): DataFrame =
      cols.foldLeft(df)((d, c) =>
        d.join(droppedIds.select(col("id").as(c)), Seq(c), "left_anti"))
    Seq("shingles", "bands", "kept")
      .foreach(st => fold(s"$base/$st", minusDroppedOn("id")))
    fold(s"$base/pairs", minusDroppedOn("id_a", "id_b"))
    fold(s"$base/dropped", identity)
    fold(s"$base/ledger", identity) // ids unique: identity IS distinct
    fold(s"$base/hashes",
      df => df.groupBy(col("h")).agg(min(col("id")).as("id")))
    fold(s"$base/state", df => graft.operators.ChangelogOps.normalize(
      df, Seq(col("id")), Seq(col("__version")), col("__rowkind")))
  }

  /** The single-writer lease file guarding a pipeline base — see
    * [[processEpoch]]'s serialized-epochs contract.
    */
  private def leasePath(base: String): Path = new Path(base, "_writer.lock")

  /** Acquire the single-writer lease on `base` for `owner`, failing
    * LOUDLY (naming the current holder) if another writer holds it —
    * the guard against two ingest pipelines racing the same stores.
    * Atomicity rides on the filesystem's create-if-absent (atomic on
    * HDFS and POSIX; object stores need their conditional-put flavor
    * — on plain S3 keep the lease on a consistent store, e.g. the
    * checkpoint volume). A crashed writer leaves its lease behind by
    * design: an operator confirms the holder is dead and removes the
    * file (or re-acquires under the same owner id, which is allowed —
    * re-entry after a crash is the normal restart path).
    */
  def acquireWriterLease(spark: SparkSession, base: String,
                         owner: String): Unit = {
    val fs = hadoopFs(spark, base)
    val p = leasePath(base)
    if (fs.exists(p) && readLeaseOwner(fs, p) == owner) return // re-entry
    val out =
      try fs.create(p, false)
      catch {
        case _: java.io.IOException =>
          throw new IllegalStateException(
            s"writer lease on $base is held by '${readLeaseOwner(fs, p)}'" +
              s" — refusing a second concurrent writer '$owner'" +
              " (epochs must be serialized; see processEpoch)")
      }
    try out.write(owner.getBytes("UTF-8")) finally out.close()
  }

  /** Release `owner`'s lease on `base`; loud if someone else holds it
    * (a release race is a coordination bug worth surfacing).
    */
  def releaseWriterLease(spark: SparkSession, base: String,
                         owner: String): Unit = {
    val fs = hadoopFs(spark, base)
    val p = leasePath(base)
    if (!fs.exists(p)) return
    val holder = readLeaseOwner(fs, p)
    require(holder == owner,
      s"writer lease on $base is held by '$holder', not '$owner'")
    fs.delete(p, false)
  }

  private def readLeaseOwner(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](4096)
      val n = math.max(0, in.read(buf))
      new String(buf, 0, n, "UTF-8")
    } finally in.close()
  }

  /** Run `body` holding the single-writer lease on `base` — the
    * coordinator wrapper an ingest loop puts around its stream (NOT
    * around each epoch: the lease marks the writing PROCESS, not a
    * batch).
    */
  def withWriterLease[T](spark: SparkSession, base: String,
                         owner: String)(body: => T): T = {
    acquireWriterLease(spark, base, owner)
    try body finally releaseWriterLease(spark, base, owner)
  }

  /** Compaction SCHEDULING policy — the automation hook around
    * [[compactStores]]: fold when any store's live delta-dir count
    * exceeds `maxDeltas`, so a long-running ingest loop calling this
    * after each committed epoch keeps read amplification bounded
    * without an operator in the loop. `belowEpoch` must still respect
    * compactStores' checkpoint-bound rule (pass the epoch that just
    * COMMITTED: the fold is strictly below it, so the replay guard's
    * exact state delta and a replayed epoch's strictly-below reads
    * both survive). Pure dir-listing probe when under threshold —
    * no data is read. Returns whether a compaction ran.
    */
  def maybeCompact(spark: SparkSession, base: String, belowEpoch: Long,
                   maxDeltas: Int = 8): Boolean = {
    require(maxDeltas >= 2, s"maxDeltas must be >= 2, got $maxDeltas")
    val stores = Seq("hashes", "shingles", "bands", "pairs", "kept",
      "dropped", "ledger", "state")
    val over = stores.exists { st =>
      deltaDirs(hadoopFs(spark, s"$base/$st"), s"$base/$st")
        ._1.count(deltaEpoch(_) < belowEpoch) > maxDeltas
    }
    if (over) compactStores(spark, base, belowEpoch)
    over
  }

  /** Day-2 operations view of the pipeline state under `base`: one
    * row per store with live/committed/stale delta-dir counts, the
    * highest committed epoch, whether a half-written (crashed,
    * will-be-rewritten) delta is present, and the committed row
    * count — the monitoring/alerting query an operator runs against
    * the state WITHOUT touching the corpus (listing via Hadoop FS;
    * parquet count() resolves from row-group metadata, no data
    * scan). `n_stale` > 0 means a compaction crashed mid-swap (reads
    * are already masked; the next compaction sweeps it) and
    * `has_uncommitted` means the last epoch died mid-write (the
    * replay rewrites it).
    */
  def storeStats(spark: SparkSession, base: String): DataFrame = {
    val stores = Seq("hashes", "shingles", "bands", "pairs", "kept",
      "dropped", "ledger", "state")
    val rows = stores.map { st =>
      val store = s"$base/$st"
      val fs = hadoopFs(spark, store)
      val (live, stale) = deltaDirs(fs, store)
      val (committed, uncommitted) = live.partition(d =>
        fs.exists(new Path(d.getPath, "_SUCCESS")))
      val maxEpoch =
        if (committed.isEmpty) -1L
        else committed.map(deltaEpoch).max
      val nRows =
        if (committed.isEmpty) 0L
        else spark.read
          .parquet(committed.map(_.getPath.toString).toIndexedSeq: _*)
          .count()
      (st, live.length, committed.length, uncommitted.nonEmpty,
        stale.length, maxEpoch, nRows)
    }
    import spark.implicits._
    rows.toDF("store", "n_deltas", "n_committed", "has_uncommitted",
      "n_stale", "max_epoch", "n_rows")
  }

  /** The merge-on-read training manifest from the upsert state —
    * equals batch `CurationOps.curationManifest` over the union of
    * all processed epochs, in whatever order they arrived (td46's own
    * oracle checks both td56 and td58). One keep-latest pass over the
    * state deltas + a 16-row rollup.
    */
  def manifest(spark: SparkSession, base: String,
               nShards: Int = 16): DataFrame =
    CdcStream.readState(spark, s"$base/state", Seq("id"), "__version")
      .withColumn("shard", CurationOps.shardOf(col("id"), nShards))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        sum(col("nchars")).as("n_chars"),
        countDistinct(col("lang")).as("n_langs"),
        min(col("id")).as("min_doc"), max(col("id")).as("max_doc"))
}
