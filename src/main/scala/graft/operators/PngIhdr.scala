package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PNG container codec over a BINARY column, entirely in codegen'd
  * expressions (no UDF, no mapPartitions) — the image sibling of
  * [[RiffWav]] and the multimodal family's second CODEC-REAL row:
  * every reported field is read from the container's actual bytes at
  * its fixed offset, the way a 100 TB media pipeline's manifest pass
  * header-sniffs millions of blobs without decoding payloads (pure
  * map-side projection, zero shuffle; parquet binary column in, typed
  * metadata out).
  *
  * Layout parsed (PNG spec, RFC 2083): bytes 1-8 signature
  * 89 50 4E 47 0D 0A 1A 0A; bytes 9-12 IHDR chunk length (big-endian,
  * always 13); 13-16 chunk type "IHDR"; 17-20 width (BE); 21-24
  * height (BE); 25 bit depth; 26 color type; 27 compression; 28
  * filter; 29 interlace; 30-33 CRC-32 over bytes 13-29 (chunk type +
  * data). PNG multi-byte fields are BIG-endian, so [[beLong]] is just
  * hex(substring)+conv — no byte-pair reversal needed (contrast
  * [[RiffWav.leLong]]). The CRC check uses Spark's built-in codegen'd
  * `crc32` over the exact spec-defined byte range, so a single
  * corrupted header byte fails `crc_ok` even when the tags survive.
  */
object PngIhdr {

  /** Big-endian unsigned integer read: `nBytes` at 1-based byte
    * offset `off`. Exact for nBytes <= 7 (conv returns signed long).
    */
  def beLong(bin: Column, off: Int, nBytes: Int): Column =
    conv(hex(substring(bin, off, nBytes)), 16, 10).cast("long")

  /** Big-endian hex ENCODING of an integer column, for container
    * synthesis (the write-side twin of [[beLong]]). Range-checked per
    * row like [[RiffWav.leHex]]: an over-wide value fails loudly
    * instead of silently truncating to plausible-looking bytes.
    */
  def beHex(v: Column, nBytes: Int): Column = {
    require(nBytes >= 1 && nBytes <= 7,
      s"beHex supports 1..7-byte fields, got $nBytes")
    val bound = 1L << (8 * nBytes)
    val lv = v.cast("long")
    val checked = when(lv >= 0L && lv < bound, lv).otherwise(
      raise_error(concat(
        lit(s"beHex: value out of range for a $nBytes-byte field: "),
        lv.cast("string"))).cast("long"))
    lpad(hex(checked), nBytes * 2, "0")
  }

  private def asciiHex(s: String): Column =
    lit(s.getBytes("US-ASCII").map("%02x".format(_)).mkString)

  /** One PNG chunk as hex: 4-byte BE length, 4-char ASCII type, the
    * data (already hex), and the REAL CRC-32 over type+data — Spark's
    * built-in crc32 over the exact bytes, so the synthesized chunk is
    * spec-valid and the parse side's crc check round-trips it.
    */
  private def chunkHex(chunkType: String, dataHex: Column,
                       dataLen: Column): Column = {
    val typeAndData = concat(asciiHex(chunkType), dataHex)
    concat(beHex(dataLen, 4), typeAndData,
      beHex(crc32(unhex(typeAndData)), 4))
  }

  private val SigHex = "89504e470d0a1a0a"

  /** Synthesize a real PNG container as a binary column from
    * parameter columns: signature, spec-valid IHDR (with its real
    * CRC), an IDAT chunk carrying `idatLen` filler bytes (length and
    * CRC real; the zlib payload is the documented stand-in — header
    * sniffing never inflates it), and the constant IEND. Everything
    * is concat/lpad/hex/repeat → one unhex, codegen'd end to end.
    */
  def pngBytes(width: Column, height: Column, bitDepth: Column,
               colorType: Column, idatLen: Column): Column = {
    val ihdrData = concat(beHex(width, 4), beHex(height, 4),
      beHex(bitDepth, 1), beHex(colorType, 1),
      lit("00"), lit("00"), lit("00")) // compression, filter, interlace
    unhex(concat(
      lit(SigHex),
      chunkHex("IHDR", ihdrData, lit(13L)),
      chunkHex("IDAT", repeat(lit("a5"), idatLen.cast("int")), idatLen),
      chunkHex("IEND", lit(""), lit(0L))))
  }

  /** Parse the PNG signature + IHDR of binary column `binCol`:
    * (png_ok, width, height, bit_depth, color_type, interlace,
    * crc_ok), appended to `df`. png_ok verifies the 8-byte signature
    * and the IHDR length/type; crc_ok recomputes the IHDR CRC-32 over
    * the container's actual type+data bytes and compares it to the
    * stored field — a flipped header byte fails it even when the
    * tags survive.
    */
  def parsePng(df: DataFrame, binCol: Column): DataFrame =
    df
      .withColumn("png_ok",
        lower(hex(substring(binCol, 1, 8))) === SigHex &&
          beLong(binCol, 9, 4) === 13L &&
          substring(binCol, 13, 4).cast("string") === "IHDR")
      .withColumn("width", beLong(binCol, 17, 4))
      .withColumn("height", beLong(binCol, 21, 4))
      .withColumn("bit_depth", beLong(binCol, 25, 1))
      .withColumn("color_type", beLong(binCol, 26, 1))
      .withColumn("interlace", beLong(binCol, 29, 1))
      .withColumn("crc_ok",
        beLong(binCol, 30, 4) === crc32(substring(binCol, 13, 17)))
}
