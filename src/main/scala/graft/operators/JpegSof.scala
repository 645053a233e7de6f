package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** JPEG/JFIF container codec over a BINARY column — the multimodal
  * family's third CODEC-REAL row ([[RiffWav]], [[PngIhdr]]), and the
  * first whose header fields sit at DATA-DEPENDENT offsets: JPEG is a
  * sequence of variable-length segments (FF-marker, 2-byte big-endian
  * length INCLUDING the length field, payload), and the frame header
  * (SOF0, marker FFC0) lands wherever the APPn/COM/DQT segments before
  * it end. A real manifest pass therefore has to WALK the segment
  * list reading each segment's length from the container's actual
  * bytes — fixed-offset reads (the WAV/PNG shape) cannot parse JPEG.
  *
  * The walk is a [[org.apache.spark.sql.functions.aggregate]] fold
  * over a bounded step sequence threading a (pos, sof, ok) struct —
  * a Catalyst higher-order expression, so the per-step expression
  * size is LINEAR in the walk depth (a naive nested-CASE recursion
  * re-inlines the position subtree ~4x per level and grows 4^depth).
  * Higher-order functions sit outside whole-stage codegen, but the
  * op remains a pure map-side projection — zero shuffle, no UDF —
  * and the fixed-offset field reads around it stay codegen'd.
  *
  * Layout parsed (ITU T.81 / JFIF): bytes 1-2 SOI FF D8; then
  * segments at dynamic offsets; SOF0 payload = length(2) precision(1)
  * height(2 BE) width(2 BE) n_components(1) + 3 bytes per component.
  */
object JpegSof {

  /** Big-endian unsigned read at a DYNAMIC 1-based offset column.
    * Exact for nBytes <= 7 (conv returns signed long).
    */
  def beLongAt(bin: Column, off: Column, nBytes: Int): Column =
    conv(hex(substr(bin, off.cast("int"), lit(nBytes))), 16, 10)
      .cast("long")

  /** 1-based offset of the SOF0 marker's FF byte, or NULL when the
    * container is not a JPEG, a non-FF byte appears where a marker
    * must be (structural corruption), or SOF0 is not found within
    * `maxSegments` segments. The fold starts at offset 3 (first
    * marker after SOI) and each step either records the found SOF0,
    * aborts on corruption, or hops `2 + length` to the next segment.
    */
  def sofOffset(bin: Column, maxSegments: Int = 8): Column = {
    val nullPos = lit(null).cast("long")
    val init = struct(lit(3L).as("pos"), nullPos.as("sof"),
      lit(true).as("ok"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegments)),
      init,
      (acc, _) => {
        val pos = acc.getField("pos")
        val sof = acc.getField("sof")
        val ok = acc.getField("ok")
        val isFf = beLongAt(bin, pos, 1) === 0xFFL
        val marker = beLongAt(bin, pos + 1, 1)
        val segLen = beLongAt(bin, pos + 2, 2)
        when(sof.isNotNull || !ok, acc)
          .when(!isFf,
            struct(pos.as("pos"), nullPos.as("sof"), lit(false).as("ok")))
          .when(marker === 0xC0L,
            struct(pos.as("pos"), pos.as("sof"), ok.as("ok")))
          .otherwise(struct((pos + lit(2L) + segLen).as("pos"),
            nullPos.as("sof"), ok.as("ok")))
      })
    when(lower(hex(substring(bin, 1, 2))) === "ffd8",
      walked.getField("sof"))
  }

  /** One JPEG segment as hex: FF marker, BE16 length covering the
    * length field + payload, the payload (already hex).
    */
  private def segHex(marker: String, payloadHex: Column,
                     payloadBytes: Column): Column =
    concat(lit("ff" + marker), PngIhdr.beHex(payloadBytes + 2L, 2),
      payloadHex)

  /** Synthesize a real JFIF container from parameter columns: SOI, a
    * spec-shaped APP0/JFIF segment, an optional COM segment of
    * `comLen` payload bytes (pass 0 to omit — this is what moves
    * SOF0's offset between rows, forcing the parse side to really
    * walk), a DQT, the SOF0 frame header (precision 8, `nComp` 1 or
    * 3 with standard sampling/qtable bytes), and EOI. Everything is
    * concat/hex arithmetic → one unhex; parameters out of range fail
    * loudly through [[PngIhdr.beHex]]'s range check.
    */
  def jpegBytes(width: Column, height: Column, nComp: Column,
                comLen: Column): Column = {
    val app0 = segHex("e0",
      lit("4a46494600" + "0102" + "00" + "0001" + "0001" + "0000"),
      lit(14L))
    val com = when(comLen > 0,
      segHex("fe", repeat(lit("61"), comLen.cast("int")), comLen))
      .otherwise(lit(""))
    val dqt = segHex("db", concat(lit("00"), repeat(lit("10"), 64)),
      lit(65L))
    val comps = when(nComp === 1, lit("011100"))
      .otherwise(lit("012200" + "021101" + "031101"))
    val sof0 = segHex("c0",
      concat(lit("08"), PngIhdr.beHex(height, 2), PngIhdr.beHex(width, 2),
        PngIhdr.beHex(nComp, 1), comps),
      lit(6L) + nComp * 3L)
    unhex(concat(lit("ffd8"), app0, com, dqt, sof0, lit("ffd9")))
  }

  /** Parse the SOI + walked SOF0 frame header of binary column
    * `binCol`: (jpeg_ok, width, height, precision, n_components)
    * appended to `df`. jpeg_ok = SOI present AND a structurally sound
    * walk reached SOF0; the field columns are NULL when it is false.
    */
  def parseJpeg(df: DataFrame, binCol: Column,
                maxSegments: Int = 8): DataFrame = {
    val sof = sofOffset(binCol, maxSegments)
    df
      .withColumn("__sof", sof)
      .withColumn("jpeg_ok", col("__sof").isNotNull)
      .withColumn("precision", beLongAt(binCol, col("__sof") + 4L, 1))
      .withColumn("height", beLongAt(binCol, col("__sof") + 5L, 2))
      .withColumn("width", beLongAt(binCol, col("__sof") + 7L, 2))
      .withColumn("n_components", beLongAt(binCol, col("__sof") + 9L, 1))
      .drop("__sof")
  }
}
