package graft

import java.awt.image.BufferedImage

import graft.operators.JpegSof
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mm16 — the JPEG segment walker's contracts: synthesized JFIF
  * containers round-trip (including SOF0 offsets that MOVE with a
  * variable-length COM segment), a REAL encoder's output (javax
  * .imageio, not our synthesis twin) parses to its true dimensions,
  * and structurally broken containers read jpeg_ok=false instead of
  * garbage fields.
  */
class JpegSofSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("synthesized JFIF round-trips; SOF0 offset moves with the COM segment") {
    val params = Seq(
      (1L, 640L, 480L, 3L, 0L),   // no COM: SOF0 right after DQT
      (2L, 17L, 9L, 1L, 25L),     // 25-byte COM shifts SOF0 by 29
      (3L, 65535L, 65535L, 3L, 63L)) // max 2-byte dims
      .toDF("id", "w", "h", "ncomp", "comlen")
    val blobs = params.withColumn("payload",
      JpegSof.jpegBytes(col("w"), col("h"), col("ncomp"), col("comlen")))
    val out = JpegSof.parseJpeg(blobs, col("payload"))
      .select("id", "jpeg_ok", "width", "height", "precision",
        "n_components")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toList
    assert(out == List(
      (1L, true, 640L, 480L, 8L, 3L),
      (2L, true, 17L, 9L, 8L, 1L),
      (3L, true, 65535L, 65535L, 8L, 3L)))
    // the two layouts really place SOF0 at different offsets
    val offs = blobs.select(JpegSof.sofOffset(col("payload")).as("o"),
      col("comlen")).as[(Long, Long)].collect().toMap
    assert(offs.keySet.size > 1)
  }

  test("a REAL encoder's JPEG parses to its true dimensions (color and gray)") {
    def encode(w: Int, h: Int, imgType: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", baos))
      baos.toByteArray
    }
    val blobs = Seq(
      (1L, encode(37, 23, BufferedImage.TYPE_INT_RGB)),
      (2L, encode(64, 48, BufferedImage.TYPE_BYTE_GRAY)))
      .toDF("id", "payload")
    val out = JpegSof.parseJpeg(blobs, col("payload"), maxSegments = 16)
      .select("id", "jpeg_ok", "width", "height", "precision",
        "n_components")
      .as[(Long, Boolean, Long, Long, Long, Long)].collect()
      .sortBy(_._1).toList
    assert(out == List(
      (1L, true, 37L, 23L, 8L, 3L),
      (2L, true, 64L, 48L, 8L, 1L)))
  }

  test("non-JPEG, corrupt, and SOF-less containers read NOT ok, never garbage") {
    val good = JpegSof.jpegBytes(lit(10L), lit(10L), lit(3L), lit(0L))
    val rows = Seq(1L, 2L, 3L).toDF("id")
    val cases = rows.select(col("id"),
      when(col("id") === 1,
        unhex(lit("89504e470d0a1a0a" + "00" * 40)))     // PNG signature
      .when(col("id") === 2,
        unhex(lit("ffd8" + "00" * 40)))                 // non-FF where a marker must be
      .otherwise(
        // SOI + 10 COM segments, no SOF within the walk bound
        unhex(lit("ffd8" + ("fffe0004" + "6161") * 10 + "ffd9")))
        .as("payload"))
    val out = JpegSof.parseJpeg(cases, col("payload"))
      .select("id", "jpeg_ok", "width")
      .collect().sortBy(_.getLong(0)).toList
    out.foreach { r =>
      assert(!r.getBoolean(1), s"case ${r.getLong(0)} parsed as ok")
      assert(r.isNullAt(2), s"case ${r.getLong(0)} produced a width")
    }
    // sanity: the good container through the same path is ok
    assert(JpegSof.parseJpeg(rows.select(col("id"), good.as("payload")),
      col("payload")).select("jpeg_ok").as[Boolean].collect()
      .forall(identity))
  }
}
