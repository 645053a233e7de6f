package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RIFF/WAVE container codec over a BINARY column, entirely in
  * codegen'd expressions (no UDF, no mapPartitions): the multimodal
  * family's first CODEC-REAL row — mm01/mm12 decode metadata through
  * JVM codecs or documented stand-ins, while this op reads the actual
  * container bytes at their fixed offsets, the way a 100 TB media
  * pipeline's manifest pass does (header-sniff millions of blobs
  * without decoding payloads: pure map-side projection, zero shuffle,
  * parquet binary column in, typed metadata out).
  *
  * Layout parsed (canonical 44-byte PCM WAV header):
  * bytes 1-4 "RIFF", 5-8 riff size (LE), 9-12 "WAVE", 13-16 "fmt ",
  * 17-20 fmt size (LE, 16 for PCM), 21-22 audio format (LE, 1=PCM),
  * 23-24 channels, 25-28 sample rate, 29-32 byte rate, 33-34 block
  * align, 35-36 bits/sample, 37-40 "data", 41-44 data size, 45+ PCM
  * frames. Multi-byte fields are little-endian: [[leLong]] reassembles
  * them via hex(substring(bin)) + byte-pair reversal + conv — all
  * codegen'd string/binary intrinsics.
  */
object RiffWav {

  /** Little-endian unsigned integer read: `nBytes` at 1-based byte
    * offset `off` of binary column `bin`. hex() of a binary slice is
    * big-endian per byte; reversing byte PAIRS (not chars) converts
    * LE→BE, then conv(_, 16, 10) materializes the value. Exact for
    * nBytes ≤ 7 (under 2^56 — conv returns signed long).
    */
  def leLong(bin: Column, off: Int, nBytes: Int): Column = {
    val h = hex(substring(bin, off, nBytes))
    conv(concat((0 until nBytes).reverse.map(i =>
      substring(h, 2 * i + 1, 2)): _*), 16, 10).cast("long")
  }

  /** ASCII tag read at 1-based byte offset `off`. */
  def tag(bin: Column, off: Int, n: Int): Column =
    substring(bin, off, n).cast("string")

  /** Little-endian hex ENCODING of an integer column, for container
    * synthesis (the write-side twin of [[leLong]]). Values are
    * range-checked per row: lpad TRUNCATES over-long strings, so an
    * out-of-range value (e.g. data_size >= 2^32 in a 4-byte field)
    * would otherwise silently keep its HIGH-order digits and emit a
    * plausible-looking corrupt container that still parses with
    * riff_ok=true — instead it fails loudly.
    */
  def leHex(v: Column, nBytes: Int): Column = {
    require(nBytes >= 1 && nBytes <= 7,
      s"leHex supports 1..7-byte fields, got $nBytes")
    val bound = 1L << (8 * nBytes)
    val lv = v.cast("long")
    val checked = when(lv >= 0L && lv < bound, lv).otherwise(
      raise_error(concat(
        lit(s"leHex: value out of range for a $nBytes-byte field: "),
        lv.cast("string"))).cast("long"))
    val h = lpad(hex(checked), nBytes * 2, "0")
    concat((0 until nBytes).map(i =>
      substring(h, nBytes * 2 - 2 * i - 1, 2)): _*)
  }

  private def asciiHex(s: String): Column =
    lit(s.getBytes("US-ASCII").map("%02x".format(_)).mkString)

  /** Synthesize a real PCM WAV container as a binary column from
    * parameter columns (all integers): the full 44-byte header with
    * correct derived sizes plus `dataSize` bytes of 0xA5 payload.
    * Everything is concat/lpad/hex/repeat → one unhex — codegen'd
    * end to end.
    */
  def wavBytes(channels: Column, sampleRate: Column, bits: Column,
               nFrames: Column): Column = {
    val blockAlign = channels * bits / lit(8)
    val byteRate = sampleRate * blockAlign
    val dataSize = nFrames * blockAlign
    unhex(concat(
      asciiHex("RIFF"), leHex(dataSize + lit(36), 4), asciiHex("WAVE"),
      asciiHex("fmt "), leHex(lit(16), 4), leHex(lit(1), 2),
      leHex(channels, 2), leHex(sampleRate, 4), leHex(byteRate, 4),
      leHex(blockAlign, 2), leHex(bits, 2),
      asciiHex("data"), leHex(dataSize, 4),
      repeat(lit("a5"), dataSize.cast("int"))))
  }

  /** Parse the canonical PCM WAV header of binary column `binCol`:
    * (riff_ok, channels, sample_rate, bits, block_align, byte_rate,
    * data_size, n_frames, duration_micros), appended to `df`.
    * riff_ok verifies all three container tags, the PCM format code
    * and the fmt-chunk size — a malformed blob reads false instead of
    * garbage fields. duration = frames·1e6 DIV rate, exact integers.
    */
  def parseWav(df: DataFrame, binCol: Column): DataFrame =
    df
      .withColumn("riff_ok",
        tag(binCol, 1, 4) === "RIFF" && tag(binCol, 9, 4) === "WAVE" &&
          tag(binCol, 13, 4) === "fmt " && tag(binCol, 37, 4) === "data" &&
          leLong(binCol, 17, 4) === 16L && leLong(binCol, 21, 2) === 1L)
      .withColumn("channels", leLong(binCol, 23, 2))
      .withColumn("sample_rate", leLong(binCol, 25, 4))
      .withColumn("byte_rate", leLong(binCol, 29, 4))
      .withColumn("block_align", leLong(binCol, 33, 2))
      .withColumn("bits", leLong(binCol, 35, 2))
      .withColumn("data_size", leLong(binCol, 41, 4))
      .withColumn("n_frames", expr("data_size DIV block_align"))
      .withColumn("duration_micros",
        expr("n_frames * 1000000 DIV sample_rate"))
}
