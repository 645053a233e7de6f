package graft

import java.io.ByteArrayInputStream

import graft.operators.RiffWav
import javax.sound.sampled.AudioSystem
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codec-real contract of mm13: containers synthesized by the
  * expression path must be REAL WAVs (javax.sound's codec parses
  * them to the same fields), and the expression parser must read the
  * actual bytes (a corrupted tag flips riff_ok rather than producing
  * garbage fields).
  */
class RiffWavSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  private val params = Seq(
    (1, 8000, 8, 50), (2, 44100, 16, 381),
    (1, 22050, 16, 249), (2, 16000, 8, 107))

  private def blobs =
    params.toDF("ch", "rate", "pbits", "frames")
      .withColumn("payload", RiffWav.wavBytes(
        col("ch"), col("rate"), col("pbits"), col("frames")))

  test("expression-parsed WAV headers match javax.sound's real codec") {
    val rows = RiffWav.parseWav(blobs, col("payload"))
      .select("ch", "rate", "pbits", "frames", "payload", "riff_ok",
        "channels", "sample_rate", "bits", "block_align", "byte_rate",
        "data_size", "n_frames", "duration_micros")
      .collect()
    assert(rows.length == params.length)
    rows.foreach { r =>
      val (ch, rate, bits, frames) =
        (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      val bytes = r.getAs[Array[Byte]]("payload")
      // the REAL codec must accept the container and agree on every field
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      assert(aff.getFormat.getChannels == ch)
      assert(aff.getFormat.getSampleRate == rate.toFloat)
      assert(aff.getFormat.getSampleSizeInBits == bits)
      assert(aff.getFrameLength == frames)
      // and the expression parser must read the same bytes back
      assert(r.getAs[Boolean]("riff_ok"))
      assert(r.getAs[Long]("channels") == ch.toLong)
      assert(r.getAs[Long]("sample_rate") == rate.toLong)
      assert(r.getAs[Long]("bits") == bits.toLong)
      assert(r.getAs[Long]("block_align") == ch.toLong * bits / 8)
      assert(r.getAs[Long]("byte_rate") == rate.toLong * ch * bits / 8)
      assert(r.getAs[Long]("data_size") == frames.toLong * ch * bits / 8)
      assert(r.getAs[Long]("n_frames") == frames.toLong)
      assert(r.getAs[Long]("duration_micros") == frames.toLong * 1000000L / rate)
      assert(bytes.length == 44 + frames * ch * bits / 8)
    }
  }

  test("a corrupted container tag reads riff_ok=false, not garbage") {
    val corrupted = blobs.withColumn("payload",
      // flip the first byte of "WAVE" (offset 9) to 'X'
      concat(substring(col("payload"), 1, 8), lit("X".getBytes),
        substring(col("payload"), 10, 1000000)))
    val out = RiffWav.parseWav(corrupted, col("payload"))
      .select("riff_ok").as[Boolean].collect()
    assert(out.forall(_ == false))
  }

  test("leHex fails loudly on a value that does not fit the field") {
    // 2^32 in a 4-byte field: lpad would silently keep the high-order
    // hex digits and synthesize a plausible-looking corrupt container
    val bad = Seq(4294967296L, 7L).toDF("v")
      .select(RiffWav.leHex(col("v"), 4).as("h"))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage.contains("leHex: value out of range"))
    // in-range values still round-trip
    val ok = Seq(258L).toDF("v")
      .select(RiffWav.leLong(unhex(RiffWav.leHex(col("v"), 4)), 1, 4).as("r"))
      .as[Long].collect()
    assert(ok.toSeq == Seq(258L))
  }
}
