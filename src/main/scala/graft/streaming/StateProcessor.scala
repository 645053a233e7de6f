package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline state inspection — the reference's State Processor API
  * (flink-libraries/flink-state-processing-api, e.g.
  * .../state/api/SavepointReader.java: read the keyed state of an
  * operator out of a savepoint as a batch DataSet). Spark-native
  * equivalent: Structured Streaming checkpoints are readable through
  * the built-in `statestore` / `state-metadata` DSv2 sources, so
  * "savepoint as a table" needs no custom machinery — these wrappers
  * only name the options the way the reference names its concepts.
  *
  * Deviations (documented, MIGRATION.md): the Spark sources are
  * READ-ONLY — the reference's bootstrap/writer side
  * (SavepointWriter.java) has no Spark 4.1 equivalent; state rows
  * expose the operator's internal accumulator schema (exactly like
  * the reference exposes the operator's state descriptor types).
  */
object StateProcessor {

  /** Operators and state stores present in a checkpoint, with their
    * batch-id range — SavepointReader's operator enumeration.
    */
  def stateMetadata(spark: SparkSession, checkpointPath: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointPath)

  /** Keyed state of one operator/store as a batch frame
    * (key struct, value struct, partition_id) — SavepointReader
    * .readKeyedState. Defaults address the single stateful operator
    * of a typical query; pass operatorId/storeName from
    * [[stateMetadata]] for multi-operator topologies, and batchId to
    * time-travel to an older retained checkpoint.
    */
  def readKeyedState(spark: SparkSession, checkpointPath: String,
                     operatorId: Long = 0L,
                     storeName: String = "default",
                     batchId: Option[Long] = None): DataFrame = {
    val r = spark.read.format("statestore")
      .option("operatorId", operatorId)
      .option("storeName", storeName)
    batchId.foreach(b => r.option("batchId", b))
    r.load(checkpointPath)
  }
}
