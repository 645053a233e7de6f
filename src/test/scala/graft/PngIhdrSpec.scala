package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import graft.operators.PngIhdr
import javax.imageio.ImageIO
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** mm14 — the PNG header codec's contracts: expression-parsed IHDR
  * fields match what javax.imageio's REAL PNG encoder wrote, the
  * synthesized containers round-trip through the parser (including
  * the recomputed CRC-32), and corruption fails the CRC even when
  * every tag survives.
  */
class PngIhdrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4)
  import spark.implicits._

  test("expression-parsed IHDR matches javax.imageio's real PNG encoder") {
    val cases = Seq(
      (1L, 17, 9, BufferedImage.TYPE_INT_RGB),
      (2L, 640, 480, BufferedImage.TYPE_INT_ARGB),
      (3L, 1, 1, BufferedImage.TYPE_BYTE_GRAY),
      (4L, 300, 2, BufferedImage.TYPE_INT_RGB))
    val blobs = cases.map { case (id, w, h, t) =>
      val img = new BufferedImage(w, h, t)
      (0 until w).foreach(x => (0 until h).foreach(y =>
        img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      (id, bos.toByteArray)
    }.toDF("id", "payload")
    val out = PngIhdr.parsePng(blobs, col("payload"))
      .select("id", "png_ok", "crc_ok", "width", "height", "bit_depth")
      .as[(Long, Boolean, Boolean, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    cases.foreach { case (id, w, h, _) =>
      val r = out(id)
      assert(r._2, s"png_ok($id)")
      assert(r._3, s"crc_ok($id) — CRC recomputed from the real bytes")
      assert(r._4 == w.toLong && r._5 == h.toLong, s"dims($id)")
      assert(r._6 == 8L, s"bit_depth($id)")
    }
  }

  test("synthesized containers round-trip, and ImageIO reads their dims") {
    val params = Seq((1L, 20L, 10L, 2L, 50L), (2L, 8L, 23L, 6L, 300L))
      .toDF("id", "w", "h", "ctype", "ilen")
    val blobs = params.withColumn("payload",
      PngIhdr.pngBytes(col("w"), col("h"), lit(8L), col("ctype"),
        col("ilen")))
    val parsed = PngIhdr.parsePng(blobs, col("payload"))
      .select("id", "png_ok", "crc_ok", "width", "height", "color_type")
      .as[(Long, Boolean, Boolean, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(parsed(1L) == ((1L, true, true, 20L, 10L, 2L)))
    assert(parsed(2L) == ((2L, true, true, 8L, 23L, 6L)))
    // a real decoder agrees on the header (the filler IDAT is not a
    // valid zlib stream, so only the header is readable — exactly the
    // manifest-pass contract)
    val bytes = blobs.select("payload").as[Array[Byte]].collect()
    bytes.foreach { b =>
      val rdr = ImageIO.getImageReaders(
        ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(b)))
      assert(rdr.hasNext, "ImageIO recognizes the synthesized container")
    }
  }

  test("a flipped header byte fails crc_ok even when every tag survives") {
    val blobs = Seq(1L).toDF("id")
      .withColumn("payload",
        PngIhdr.pngBytes(lit(100L), lit(50L), lit(8L), lit(2L), lit(10L)))
      // flip one bit of the width field (byte 17): tags stay intact
      .withColumn("payload", concat(substring(col("payload"), 1, 16),
        lit(Array(1.toByte)), substring(col("payload"), 18, 1000000)))
    val r = PngIhdr.parsePng(blobs, col("payload"))
      .select("png_ok", "crc_ok").as[(Boolean, Boolean)].head()
    assert(r._1, "tags still parse")
    assert(!r._2, "CRC catches the corruption")
  }
}
