package graft.sources

import java.util

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Avro container-file format on the PUBLIC Apache Avro core API (the
  * env ships avro-1.12 but not the spark-avro wrapper) — closes the
  * reference's Avro format parity (flink-formats/flink-avro
  * AvroRowDataDeserializationSchema / AvroFileFormatFactory):
  *
  *   - read: a DSv2 TableProvider (`graft-avro`) — schema inferred
  *     from the container header, one InputPartition per file, records
  *     decoded straight to InternalRow;
  *   - write: [[AvroFormat.write]] — executor-side DataFileWriter per
  *     partition through the Hadoop FileSystem API (works on any FS a
  *     cluster mounts, not just local disk).
  *
  * Types: string/int/long/double/float/boolean/bytes plus
  * timestamp-micros and date logical types; nullable columns map to
  * `union(null, T)` both ways. Nested records are out of scope (the
  * reference's flat-row Avro table format is the parity target).
  */
object AvroFormat {
  /** Spark schema → Avro record schema (nullable = union with null). */
  def toAvroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case StringType    => Schema.create(Schema.Type.STRING)
        case IntegerType   => Schema.create(Schema.Type.INT)
        case LongType      => Schema.create(Schema.Type.LONG)
        case DoubleType    => Schema.create(Schema.Type.DOUBLE)
        case FloatType     => Schema.create(Schema.Type.FLOAT)
        case BooleanType   => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType    => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case DateType      =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case other => throw new IllegalArgumentException(
          s"graft-avro: unsupported Spark type $other for field ${f.name}")
      }
      val s = if (f.nullable)
        Schema.createUnion(util.Arrays.asList(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, s, null, null)
    }
    Schema.createRecord(name, null, "graft", false, util.Arrays.asList(fields: _*))
  }

  /** Avro record schema → Spark schema. */
  def toSparkSchema(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"graft-avro: top-level Avro schema must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (s, nullable) = unwrapNullable(f.schema())
      StructField(f.name(), sparkType(s), nullable)
    }.toSeq)
  }

  private def unwrapNullable(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"graft-avro: only union(null, T) unions are supported, got $s")
      (nonNull.head, branches.size != nonNull.size)
    } else (s, false)

  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING  => StringType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMicros => TimestampType
      case _: LogicalTypes.TimestampMillis => TimestampType
      case _                               => LongType
    }
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES   => BinaryType
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Avro type $other")
  }

  /** Distributed write: one container file per partition under `path`
    * via the Hadoop FileSystem API (so it lands wherever the cluster's
    * FS points, exactly like the built-in file sinks).
    *
    * Output commit mirrors the two guarantees of Spark's
    * FileCommitProtocol the built-in sinks rely on: (a) tasks write to
    * a per-attempt staging location and commit by rename, so a retried
    * or speculative attempt never leaves a half-written container
    * beside committed data; (b) with `overwrite`, the destination's
    * pre-existing `.avro` files are removed only after the job
    * succeeds, just before the staged files move in — so re-writing a
    * directory with fewer partitions cannot leave stale part files a
    * reader would silently include. Without `overwrite` (append — the
    * reference FileSystemTableSink's INSERT INTO), the committed names
    * carry a job-unique id, so successive appends never collide with
    * earlier jobs' containers.
    */
  def write(df: DataFrame, path: String, overwrite: Boolean = true): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    val hadoopConf = new SerializableHadoopConf(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val fs0 = FileSystem.get(new java.net.URI(path), hadoopConf.value)
    val dest = new Path(path)
    fs0.mkdirs(dest)
    val jobId = java.util.UUID.randomUUID().toString
    val stagingName = s"_staging-$jobId"
    val staging = new Path(dest, stagingName)
    fs0.mkdirs(staging)
    try {
      df.foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val schema = new Schema.Parser().parse(avroJson)
          val tc = TaskContext.get()
          val pid = tc.partitionId()
          val fs = FileSystem.get(new java.net.URI(path), hadoopConf.value)
          val stagingDir = new Path(new Path(path), stagingName)
          // task-attempt-unique temp file, renamed into place on task
          // success — the rename is the task commit
          val attempt = new Path(stagingDir,
            f"_attempt-$pid%05d-${tc.taskAttemptId()}.avro")
          val committed = new Path(stagingDir, f"part-$jobId-$pid%05d.avro")
          val out = fs.create(attempt, true)
          val writer = new DataFileWriter[GenericRecord](
            new GenericDatumWriter[GenericRecord](schema))
          writer.create(schema, out)
          try it.foreach { row =>
            val rec = new GenericData.Record(schema)
            sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
              rec.put(f.name, if (row.isNullAt(i)) null else f.dataType match {
                case StringType    => row.getString(i)
                case IntegerType   => Int.box(row.getInt(i))
                case LongType      => Long.box(row.getLong(i))
                case DoubleType    => Double.box(row.getDouble(i))
                case FloatType     => Float.box(row.getFloat(i))
                case BooleanType   => Boolean.box(row.getBoolean(i))
                case BinaryType    =>
                  java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
                case TimestampType =>
                  val t = row.getTimestamp(i)
                  Long.box(t.getTime * 1000L + (t.getNanos / 1000L) % 1000L)
                case DateType      => Int.box(row.getDate(i).toLocalDate.toEpochDay.toInt)
                case other => throw new IllegalArgumentException(
                  s"graft-avro: unsupported type $other")
              })
            }
            writer.append(rec)
          } finally writer.close()
          // commit: last successful attempt for this partition wins,
          // and both candidates are complete container files
          if (fs.exists(committed)) fs.delete(committed, false)
          if (!fs.rename(attempt, committed))
            throw new java.io.IOException(s"graft-avro: could not commit $attempt")
        }
      }
      // job commit: on overwrite clear stale destination files, then
      // move the staged parts in (append leaves prior jobs' containers
      // in place — their names can't collide with this job's)
      if (overwrite)
        fs0.listStatus(dest)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .foreach(s => fs0.delete(s.getPath, false))
      fs0.listStatus(staging)
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .foreach(s => fs0.rename(s.getPath, new Path(dest, s.getPath.getName)))
    } finally fs0.delete(staging, true)
  }
}

/** Java-serializable Hadoop Configuration carrier (the Spark-internal
  * SerializableConfiguration pattern): ships the DRIVER's conf —
  * filesystem impls, credentials — to executor-side writers/readers
  * instead of rebuilding a default `new Configuration()` there.
  */
private[sources] class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/** DSv2 batch reader for Avro container files (`spark.read
  * .format("graft-avro").load(dir)`).
  */
class AvroSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = pathOf(options)
    val files = AvroSource.listFiles(path)
    require(files.nonEmpty, s"graft-avro: no .avro files under $path")
    val fs = FileSystem.get(new java.net.URI(files.head),
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    val in = fs.open(new Path(files.head))
    val stream = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
    try AvroFormat.toSparkSchema(stream.getSchema)
    finally stream.close()
  }

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro: 'path' option required"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AvroTable(schema, properties.get("path"))
}

private[sources] object AvroSource {
  def listFiles(path: String): Seq[String] = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(path), conf)
    val p = new Path(path)
    if (!fs.exists(p)) Seq.empty
    else if (fs.getFileStatus(p).isFile) Seq(p.toString)
    else fs.listStatus(p).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted.toSeq
  }
}

private[sources] class AvroTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-avro $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] = {
    val s = new util.HashSet[TableCapability]()
    s.add(TableCapability.BATCH_READ)
    s
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = new AvroBatch(tableSchema, path)
      }
    }
}

private[sources] case class AvroFilePartition(file: String) extends InputPartition

private[sources] class AvroBatch(schema: StructType, path: String) extends Batch {
  override def planInputPartitions(): Array[InputPartition] =
    AvroSource.listFiles(path).map(AvroFilePartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // factory is built on the driver: capture the session's Hadoop conf
    // so executor-side readers see the cluster's FS settings/credentials
    new AvroReaderFactory(schema, new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration))
}

private[sources] class AvroReaderFactory(schema: StructType,
                                         hadoopConf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[AvroFilePartition].file
    new PartitionReader[InternalRow] {
      private val fs = FileSystem.get(new java.net.URI(file), hadoopConf.value)
      private val stream = new DataFileStream[GenericRecord](
        fs.open(new Path(file)), new GenericDatumReader[GenericRecord]())
      private var rec: GenericRecord = _

      override def next(): Boolean = {
        val has = stream.hasNext
        if (has) rec = stream.next()
        has
      }

      override def get(): InternalRow = {
        val vals = schema.fields.map { f =>
          val v = rec.get(f.name)
          if (v == null) null
          else f.dataType match {
            case StringType    => UTF8String.fromString(v.toString)
            case IntegerType   => v
            case LongType      => v
            case DoubleType    => v
            case FloatType     => v
            case BooleanType   => v
            case BinaryType    =>
              val bb = v.asInstanceOf[java.nio.ByteBuffer]
              val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
            case TimestampType =>
              // micros in the container (timestamp-millis scaled on read)
              val fieldSchema = rec.getSchema.getField(f.name).schema()
              val (s, _) = AvroReaderFactory.unwrap(fieldSchema)
              if (s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMillis])
                v.asInstanceOf[java.lang.Long] * 1000L
              else v
            case DateType      => v
            case other => throw new IllegalArgumentException(
              s"graft-avro: unsupported type $other")
          }
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = stream.close()
    }
  }
}

private[sources] object AvroReaderFactory {
  def unwrap(s: Schema): (Schema, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      (nonNull.head, true)
    } else (s, false)
}
