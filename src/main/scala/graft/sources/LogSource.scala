package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Partitioned-log source — Kafka semantics over append-only local
  * segment files, for environments with no broker (the reference's
  * Kafka table connector, flink-connectors/flink-connector-kafka
  * .../table/KafkaDynamicSource.java:74, is permanently env-blocked
  * here; this source proves the same seams end-to-end: per-partition
  * monotone offsets, offset-map checkpointing, partitioned parallel
  * reads, bounded-admission triggers, and exactly-once resume).
  *
  * Layout: `<path>/partition=<p>/<start>.log`, where `<start>` is the
  * 20-digit zero-padded offset of the segment's first record and each
  * record is one UTF-8 line (records must not contain newlines) — the
  * Kafka segment-roll discipline: segments are immutable once written,
  * appends create a new segment named by the next offset, so a
  * record's offset is segment start + line index, and the log end
  * needs only the LAST segment's line count (older counts are implied
  * by the next segment's name). Readers are handed the segment list
  * at planning time, one split per log partition, exactly as Kafka
  * maps one split per topic-partition.
  *
  * Batch reads scan every partition 0→end. Streaming reads are a
  * [[MicroBatchStream]] whose offset is the per-partition next-record
  * map (serialized sorted, e.g. `{"0":12,"3":40}`); `latestOffset`
  * re-discovers partitions (new ones start at 0, like Kafka partition
  * discovery) and admits at most `maxRecordsPerTrigger` records per
  * trigger, pro-rated across lagging partitions. planInputPartitions
  * is a pure function of (start, end), so a replayed batch after a
  * crash re-reads the identical slice and an idempotent sink
  * (parquet `_spark_metadata`, memory sink batch dedup) yields
  * end-to-end exactly-once.
  *
  * Local paths make this test/emulation-grade; on a cluster the same
  * layout on a DFS mount works unchanged (planning lists files on the
  * driver, readers stream bytes from shared storage).
  */
class LogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-log"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LogSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new LogTable()
}

object LogSource {
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  private val SegName = """(\d{20})\.log""".r
  private val PartDir = """partition=(\d+)""".r

  private def partDir(path: String, p: Int): Path =
    Paths.get(path, s"partition=$p")

  /** Append records as ONE new immutable segment starting at the
    * partition's current end offset (the Kafka segment roll).
    */
  def append(path: String, partition: Int, records: Seq[String]): Unit = {
    require(records.forall(!_.contains('\n')),
      "log records must not contain newlines")
    val dir = partDir(path, partition)
    Files.createDirectories(dir)
    val start = endOffset(dir)
    val f = dir.resolve(f"$start%020d.log")
    Files.write(f, records.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8), StandardOpenOption.CREATE_NEW)
  }

  /** Segment (start offset, file path) list for a partition, sorted. */
  private[sources] def segments(dir: Path): Seq[(Long, String)] =
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .flatMap { f =>
        f.getFileName.toString match {
          case SegName(s) => Some((s.toLong, f.toString))
          case _ => None
        }
      }.toSeq.sortBy(_._1)

  private[sources] def countLines(file: String): Long = {
    val s = Files.lines(Paths.get(file))
    try s.count() finally s.close()
  }

  /** End offset (= next record's offset) of one partition dir: last
    * segment's name + its line count; earlier counts are implied.
    */
  private[sources] def endOffset(dir: Path): Long =
    segments(dir).lastOption
      .map { case (s, f) => s + countLines(f) }
      .getOrElse(0L)

  /** Discover partitions and their end offsets. */
  private[sources] def endOffsets(path: String): Map[Int, Long] = {
    val root = Paths.get(path)
    if (!Files.isDirectory(root)) Map.empty
    else Files.list(root).iterator().asScala
      .flatMap { d =>
        d.getFileName.toString match {
          case PartDir(p) if Files.isDirectory(d) =>
            Some(p.toInt -> endOffset(d))
          case _ => None
        }
      }.toMap
  }

  private[graft] def offsetsToJson(m: Map[Int, Long]): String =
    m.toSeq.sorted.map { case (p, o) => s""""$p":$o""" }
      .mkString("{", ",", "}")

  private[graft] def offsetsFromJson(s: String): Map[Int, Long] =
    s.trim.stripPrefix("{").stripSuffix("}").split(",")
      .iterator.map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":")
        k.trim.stripPrefix("\"").stripSuffix("\"").toInt -> v.trim.toLong
      }.toMap

  /** Parse Flink's `scan.startup.specific-offsets` syntax
    * (KafkaConnectorOptionsUtil.parseSpecificOffsets:334):
    * `partition:0,offset:42;partition:1,offset:300`.
    */
  private[graft] def parseSpecificOffsets(s: String): Map[Int, Long] =
    s.split(";").iterator.map(_.trim).filter(_.nonEmpty).map { part =>
      val kv = part.split(",").map(_.trim.split(":").map(_.trim))
      val m = kv.map(a => a(0) -> a(1)).toMap
      require(m.contains("partition") && m.contains("offset"),
        s"malformed specific-offsets entry '$part' — expected " +
          "'partition:<p>,offset:<o>[;...]'")
      m("partition").toInt -> m("offset").toLong
    }.toMap

  // ------------------------------------------------------------ write path

  /** Distributed batch APPEND into the log — the sink half of the
    * Kafka parity story (KafkaDynamicSink's semantics: records are
    * routed by a partition column, offsets are assigned by the LOG at
    * commit time, not by the writer). Tasks stage one file per log
    * partition they hold (task-attempt-unique name, renamed on task
    * success — the AvroFormat task-commit protocol); the driver's job
    * commit then walks each log partition's staged files IN TASK
    * ORDER, names each as a segment at the partition's current end
    * offset, and moves it into place. A failed job leaves only an
    * unreferenced `_staging-*` dir; readers never see a half commit.
    *
    * `df` must have columns (`partition` int, `value` string). Rows
    * keep their within-task order, so a caller wanting deterministic
    * offsets repartitions by `partition` and sorts within partitions.
    */
  def write(df: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val stagingName = s"_staging-${java.util.UUID.randomUUID()}"
    val staging = Paths.get(path, stagingName)
    val stagingStr = staging.toString // Path is not serializable
    Files.createDirectories(staging)
    try {
      val staged: Array[(Int, Int, String, Long)] = // (taskId, p, file, n)
        df.select(org.apache.spark.sql.functions.col("partition").cast("int"),
            org.apache.spark.sql.functions.col("value"))
          .queryExecution.toRdd.mapPartitionsWithIndex { (tid, it) =>
            val ctx = org.apache.spark.TaskContext.get()
            val stagingDir = Paths.get(stagingStr)
            val writers = scala.collection.mutable.Map.empty[Int,
              (java.io.BufferedWriter, java.nio.file.Path, Array[Long])]
            it.foreach { row =>
              val p = row.getInt(0)
              val v = row.getUTF8String(1).toString
              val (w, _, n) = writers.getOrElseUpdate(p, {
                val attempt = stagingDir.resolve(
                  f"attempt-$tid%05d-p$p%05d-${ctx.taskAttemptId()}.seg")
                (Files.newBufferedWriter(attempt), attempt, Array(0L))
              })
              w.write(v); w.write('\n'); n(0) += 1
            }
            writers.iterator.map { case (p, (w, attempt, n)) =>
              w.close()
              // task commit: rename to the attempt-free name (first
              // attempt to commit wins; CREATE_NEW-like via ATOMIC_MOVE)
              val committed = stagingDir.resolve(f"task-$tid%05d-p$p%05d.seg")
              try Files.move(attempt, committed,
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
              catch { case _: java.nio.file.FileAlreadyExistsException =>
                Files.delete(attempt) }
              (tid, p, committed.toString, n(0))
            }.toArray.iterator
          }.collect()
      // Job commit on the driver: per log partition, task order.
      staged.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (p, files) =>
        val dir = partDir(path, p)
        Files.createDirectories(dir)
        var start = endOffset(dir)
        files.sortBy(_._1).foreach { case (_, _, f, n) =>
          Files.move(Paths.get(f), dir.resolve(f"$start%020d.log"))
          start += n
        }
      }
    } finally {
      // staging holds only uncommitted leftovers now
      if (Files.isDirectory(staging)) {
        Files.list(staging).iterator().asScala.foreach(Files.delete)
        Files.delete(staging)
      }
    }
  }

  /** Exactly-once streaming APPEND: foreachBatch + a per-batch marker
    * file, the idempotent-sink discipline Structured Streaming's
    * docs prescribe for non-transactional stores — a replayed epoch
    * (crash between sink write and checkpoint commit) sees its marker
    * and skips, so the log gains each batch exactly once.
    */
  def streamSink(df: org.apache.spark.sql.DataFrame, path: String,
                 checkpointLocation: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val marker = Paths.get(path, f"_batch-$batchId%020d")
        if (!Files.exists(marker)) {
          write(batch, path)
          Files.createDirectories(Paths.get(path))
          Files.createFile(marker)
        }
        ()
      }

  /** One split per log partition over [start, end), carrying the
    * planning-time segment list so readers do no directory listing.
    */
  private[sources] def plan(path: String, start: Map[Int, Long],
                            end: Map[Int, Long]): Array[InputPartition] =
    end.toSeq.sorted.flatMap { case (p, e) =>
      val s = start.getOrElse(p, 0L)
      if (e <= s) None
      else Some(LogInputPartition(p, s, e,
        segments(partDir(path, p)).toArray))
    }.toArray
}

private[sources] class LogTable extends Table with SupportsRead {
  override def name(): String = "graft-log"
  override def schema(): StructType = LogSource.schema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.MICRO_BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-log requires a 'path' option"))
    val maxPerTrigger = options.getLong("maxRecordsPerTrigger", Long.MaxValue)
    // Startup position (KafkaConnectorOptions.SCAN_STARTUP_MODE parity):
    // earliest (default), latest (only records appended after the query
    // starts), or specific offsets per partition. group-offsets is
    // inapplicable (the checkpoint IS the group position here) and
    // timestamp needs per-record timestamps the log does not carry —
    // both rejected upstream in the DDL binding.
    val startupMode = Option(options.get("startupMode")).getOrElse("earliest")
    val specific = Option(options.get("specificOffsets"))
      .map(LogSource.parseSpecificOffsets).getOrElse(Map.empty)
    require(Set("earliest", "latest", "specific")(startupMode),
      s"unsupported startupMode '$startupMode' (earliest | latest | specific)")
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = LogSource.schema
        override def toBatch: Batch = new LogBatch(path)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new LogMicroBatchStream(path, maxPerTrigger, startupMode, specific)
      }
    }
  }
}

private[sources] case class LogInputPartition(partition: Int, start: Long,
    end: Long, segs: Array[(Long, String)]) extends InputPartition

private[sources] class LogBatch(path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    LogSource.plan(path, Map.empty, LogSource.endOffsets(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory()
}

private[sources] case class LogOffset(offsets: Map[Int, Long]) extends Offset {
  override def json(): String = LogSource.offsetsToJson(offsets)
}

private[sources] class LogMicroBatchStream(path: String, maxPerTrigger: Long,
    startupMode: String = "earliest", specific: Map[Int, Long] = Map.empty)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{ReadAllAvailable, ReadLimit, ReadMaxRows}

  /** Only consulted on a FRESH query — a checkpointed restart resumes
    * from the committed offsets, exactly like Kafka's startup modes.
    * `specific` partitions absent from the map start at earliest.
    */
  override def initialOffset(): Offset = startupMode match {
    case "latest" => LogOffset(LogSource.endOffsets(path))
    case "specific" => LogOffset(LogSource.endOffsets(path)
      .map { case (p, _) => p -> specific.getOrElse(p, 0L) })
    case _ => LogOffset(LogSource.endOffsets(path).map { case (p, _) => p -> 0L })
  }

  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  /** Trigger.AvailableNow (KafkaMicroBatchStream's contract): snapshot
    * the log end at query start; the drain runs rate-limited batches
    * up to the snapshot and stops — records appended after the
    * snapshot wait for the next run.
    */
  private var availableNowCap: Option[Map[Int, Long]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(LogSource.endOffsets(path))

  /** Admission control through the engine-supplied START offset (the
    * last committed end) — the SupportsAdmissionControl contract the
    * Kafka source implements (KafkaMicroBatchStream.latestOffset):
    * lag is measured from where the query actually is, so a RESTARTED
    * query budgets from its checkpoint, not from offset 0. The budget
    * is pro-rated across lagging partitions (maxOffsetsPerTrigger
    * discipline), minimum 1 per lagging partition so none starves.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[LogOffset].offsets
    val avail = availableNowCap.getOrElse(LogSource.endOffsets(path))
    val admitted = limit match {
      case _: ReadAllAvailable => avail
      case mr: ReadMaxRows =>
        val budget = mr.maxRows()
        val lags = avail.map { case (p, e) =>
          p -> math.max(e - from.getOrElse(p, 0L), 0L)
        }
        val totalLag = lags.values.sum
        if (totalLag <= budget) avail
        else avail.map { case (p, e) =>
          val lag = lags(p)
          val grant =
            if (lag == 0L) 0L
            else math.max(budget * lag / totalLag, 1L)
          p -> math.min(from.getOrElse(p, 0L) + grant, e)
        }
      case other => throw new UnsupportedOperationException(
        s"graft-log does not support read limit $other")
    }
    LogOffset(admitted)
  }

  /** Unlimited latest — lag/progress reporting, never batch planning. */
  override def reportLatestOffset(): Offset =
    LogOffset(LogSource.endOffsets(path))

  // Dead when SupportsAdmissionControl is present; the engine always
  // calls the two-argument form.
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "latestOffset() unused: graft-log implements SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset =
    LogOffset(LogSource.offsetsFromJson(json))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    LogSource.plan(path, start.asInstanceOf[LogOffset].offsets,
      end.asInstanceOf[LogOffset].offsets)

  override def createReaderFactory(): PartitionReaderFactory =
    new LogReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class LogReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[LogInputPartition]
    new PartitionReader[InternalRow] {
      // Segments overlapping [start, end) — a segment is skipped when
      // it starts at/after `end`, or when the NEXT segment's start
      // shows it ends at/before `start`.
      private val wanted = p.segs.indices.filter { i =>
        val segStart = p.segs(i)._1
        val nextStart =
          if (i + 1 < p.segs.length) Some(p.segs(i + 1)._1) else None
        segStart < p.end && nextStart.forall(_ > p.start)
      }.map(p.segs)
      private var segIdx = 0
      private var reader: java.io.BufferedReader = _
      private var offset = 0L
      private var curOffset = 0L
      private var curLine: String = _

      override def next(): Boolean = {
        var found = false
        var exhausted = false
        while (!found && !exhausted) {
          if (reader == null) {
            if (segIdx >= wanted.length) exhausted = true
            else {
              val (segStart, file) = wanted(segIdx)
              reader = Files.newBufferedReader(
                Paths.get(file), StandardCharsets.UTF_8)
              offset = segStart
            }
          } else {
            val line = reader.readLine()
            if (line == null) { close(); segIdx += 1 }
            else {
              val o = offset; offset += 1
              if (o >= p.end) { close(); exhausted = true }
              else if (o >= p.start) {
                curOffset = o; curLine = line; found = true
              }
            }
          }
        }
        found
      }
      override def get(): InternalRow = new GenericInternalRow(
        Array[Any](p.partition, curOffset, UTF8String.fromString(curLine)))
      override def close(): Unit = {
        if (reader != null) { reader.close(); reader = null }
      }
    }
  }
}
