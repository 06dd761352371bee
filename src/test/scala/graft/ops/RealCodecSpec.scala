package graft.ops

import graft.SparkTestBase

/** RealCodec (VERDICT r11 item 4): genuine PNG/BMP fixture images —
  * written by the JRE's own encoder, decoded back through the full
  * typed-Dataset mapPartitions path — yield REAL pixel dims, mean
  * luminance, histograms, and nearest-neighbor resizes; non-image and
  * corrupt payloads still take the deterministic stub.
  */
class RealCodecSpec extends SparkTestBase {
  import spark.implicits._

  // 8x4 fixture: left half pure black, right half pure white — luma 0
  // and 255, histogram buckets 0 and 3, mean exactly 127.5.
  private def fixture(format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"JRE cannot encode $format")
    bos.toByteArray
  }

  test("m02 path: a real PNG and a real BMP decode to true dims, mean " +
      "luminance, and histogram; text payloads keep the stub") {
    for (fmt <- Seq("png", "bmp")) {
      val rows = Seq(
        MediaRow(1L, "image", fixture(fmt)),
        MediaRow(2L, "image", "plain text payload".getBytes("UTF-8")))
      val out = MediaOps.decodeFeatures(rows.toDS()).collect()
        .map(f => f.doc_id -> f).toMap
      val real = out(1L)
      assert(real.width == 8 && real.height == 4, s"$fmt dims")
      assert(real.mean_byte == 127.5, s"$fmt mean luma: ${real.mean_byte}")
      assert(real.histo4.toSeq == Seq(16L, 0L, 0L, 16L), s"$fmt histo")
      assert(real.n_frames == 1)
      assert(real.n_bytes == fixture(fmt).length.toLong)
      // the text payload is byte-identical to the pure stub result
      val stub = MediaOps.StubCodec.decode(rows(1))
      val got = out(2L)
      assert(got.width == stub.width && got.height == stub.height &&
        got.mean_byte == stub.mean_byte &&
        got.histo4.toSeq == stub.histo4.toSeq, s"$fmt stub fallback")
    }
  }

  test("m04 path: a real image resizes by pixel sampling — out dims " +
      "w/f x h/f, checksum = sum of sampled lumas") {
    val rows = Seq(MediaRow(1L, "image", fixture("png")))
    val out = MediaOps.resizeMedia(rows.toDS(), 2).collect().head
    assert(out.width == 8 && out.height == 4)
    assert(out.out_width == 4 && out.out_height == 2)
    assert(out.out_bytes == 8L)
    // sampled pixels (x in {0,2,4,6}, y in {0,2}): lumas 0,0,255,255
    // per row -> 2 rows * 510
    assert(out.checksum == 1020L, s"checksum ${out.checksum}")
  }

  test("gate: corrupt-but-magic payloads fall back to the stub; a BMP " +
      "whose declared size mismatches its length never reaches ImageIO") {
    val png = fixture("png")
    val truncated = png.take(20) // valid 8-byte signature, broken body
    assert(MediaOps.RealCodec.decodeImage(truncated).isEmpty)
    val bmp = fixture("bmp")
    val padded = bmp ++ Array[Byte](0, 0, 0) // declared size != length
    assert(MediaOps.RealCodec.decodeImage(padded).isEmpty)
    // and the dispatch still produces the stub row for both
    val rows = Seq(MediaRow(1L, "image", truncated),
      MediaRow(2L, "image", padded))
    val out = MediaOps.decodeFeatures(rows.toDS()).collect()
      .map(f => f.doc_id -> f).toMap
    assert(out(1L).width == MediaOps.StubCodec.decode(rows(0)).width)
    assert(out(2L).width == MediaOps.StubCodec.decode(rows(1)).width)
  }
}
