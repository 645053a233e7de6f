package graft.sources

import java.util

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

/** Bounded/unbounded deterministic data generator as a full DataSource
  * V2 implementation — the Spark-native counterpart of the reference's
  * `datagen` table connector (flink-table-api-java-bridge
  * .../connector/datagen/table/DataGenTableSourceFactory.java,
  * DataGenTableSource.java) built on the FLIP-27 unified Source API
  * (flink-core .../api/connector/source/Source.java): the DSv2
  * Batch/InputPartition/PartitionReader trio plays the
  * SplitEnumerator/SourceSplit/SourceReader roles, and the same Scan
  * serves batch and micro-batch streaming exactly as the unified API
  * serves DataStream batch and streaming modes.
  *
  * Values are a pure function of (row id, column), never of partition
  * count or read mode: a bounded read, a re-read, and a streaming read
  * of the same row range produce identical rows (the reference's
  * sequence generator gives the same property, unlike its random one).
  *
  * Options: `numRows` (bound, default 1000), `partitions` (parallelism,
  * default 4), `rowsPerBatch` (streaming batch size, default 100),
  * `maxRows` (streaming bound, default = numRows).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-datagen").schema(sch)
  *     .option("numRows", 10000).load()
  *   spark.readStream.format("graft-datagen").schema(sch)
  *     .option("rowsPerBatch", 1000).load()
  * }}}
  */
class DatagenSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-datagen"

  override def supportsExternalMetadata(): Boolean = true

  /** Default schema when the user declares none (the reference requires
    * a DDL schema; DSv2 lets us offer a canonical one).
    */
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("v", DoubleType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("ts", TimestampType, nullable = false)))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DatagenTable(schema)
}

private[sources] class DatagenTable(tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = "graft-datagen"
  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s.add(TableCapability.MICRO_BATCH_READ)
    s
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val numRows = options.getLong("numRows", 1000L)
    val parts = options.getInt("partitions", 4)
    val rowsPerBatch = options.getLong("rowsPerBatch", 100L)
    val maxRows = options.getLong("maxRows", numRows)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = new DatagenBatch(tableSchema, numRows, parts)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new DatagenMicroBatchStream(tableSchema, rowsPerBatch, maxRows, parts)
      }
    }
  }
}

/** A half-open row-id range [start, end) — the "split". */
private[sources] case class DatagenPartition(start: Long, end: Long)
    extends InputPartition

private[sources] object DatagenPartition {
  /** Even split of [from, until) into at most `parts` ranges. */
  def slice(from: Long, until: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(until - from, 0L)
    if (n == 0) Array.empty
    else {
      val k = math.min(parts.toLong, n).toInt
      Array.tabulate[InputPartition](k) { i =>
        DatagenPartition(from + i * n / k, from + (i + 1) * n / k)
      }
    }
  }
}

private[sources] class DatagenBatch(schema: StructType, numRows: Long, parts: Int)
    extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    DatagenPartition.slice(0L, numRows, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenReaderFactory(schema)
}

/** Streaming offset = count of rows emitted so far. */
private[sources] case class DatagenOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

private[sources] class DatagenMicroBatchStream(schema: StructType,
    rowsPerBatch: Long, maxRows: Long, parts: Int) extends MicroBatchStream {
  private var planned = 0L

  override def initialOffset(): Offset = DatagenOffset(0L)
  override def latestOffset(): Offset = {
    planned = math.min(planned + rowsPerBatch, maxRows)
    DatagenOffset(planned)
  }
  override def deserializeOffset(json: String): Offset =
    DatagenOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    DatagenPartition.slice(start.asInstanceOf[DatagenOffset].rows,
      end.asInstanceOf[DatagenOffset].rows, parts)
  override def createReaderFactory(): PartitionReaderFactory =
    new DatagenReaderFactory(schema)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class DatagenReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DatagenPartition]
    new PartitionReader[InternalRow] {
      private var id = p.start - 1
      override def next(): Boolean = { id += 1; id < p.end }
      override def get(): InternalRow = DatagenReaderFactory.row(schema, id)
      override def close(): Unit = ()
    }
  }
}

private[sources] object DatagenReaderFactory {
  /** Deterministic per-(id, column) value — a multiplicative hash, so
    * results are independent of partitioning and read mode.
    */
  private def h(id: Long, col: Int): Long = {
    val x = (id * 31 + col + 1) * 2654435761L
    java.lang.Long.rotateLeft(x, 21) ^ x
  }

  def row(schema: StructType, id: Long): InternalRow = {
    val vals = schema.fields.zipWithIndex.map { case (f, i) =>
      val hv = math.floorMod(h(id, i), 1000000L)
      f.dataType match {
        case LongType      => id
        case IntegerType   => (hv % 100000L).toInt
        case DoubleType    => (hv % 100000L) / 100.0
        case StringType    => UTF8String.fromString(s"str_${hv % 10000L}")
        case BooleanType   => hv % 2 == 0
        // epoch 2000-01-01 + id seconds, in micros
        case TimestampType => 946684800000000L + id * 1000000L
        case DateType      => (10957L + id % 3650).toInt // days since epoch
        case other => throw new IllegalArgumentException(
          s"datagen: unsupported field type $other for ${f.name}")
      }
    }
    new GenericInternalRow(vals.asInstanceOf[Array[Any]])
  }
}
