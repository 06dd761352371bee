package graft.functions

import graft.SparkTestBase
import org.apache.spark.unsafe.types.UTF8String

/** The hand-rolled one-block MD5 (GraftHash.md5Head60) must be
  * bit-identical to java.security MessageDigest's md5 + the
  * 15-hex-char-prefix parse, for every length on both sides of the
  * one-block (55-byte) specialization boundary and at arbitrary
  * offsets into a larger buffer.
  */
class Md5KernelSpec extends SparkTestBase {

  private def reference(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(bytes, off, len)
    val hex = md.digest().map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("md5Head60 == MessageDigest prefix for lengths 0..70") {
    val rnd = new scala.util.Random(41)
    (0 to 70).foreach { len =>
      (1 to 8).foreach { _ =>
        val b = new Array[Byte](len)
        rnd.nextBytes(b)
        assert(GraftHash.md5Head60(b, 0, len) == reference(b, 0, len),
          s"len=$len bytes=${b.mkString(",")}")
      }
    }
  }

  test("md5Head60 honors non-zero offsets into a shared buffer") {
    val rnd = new scala.util.Random(42)
    val buf = new Array[Byte](256)
    rnd.nextBytes(buf)
    for (off <- Seq(0, 1, 7, 100, 200); len <- Seq(0, 1, 8, 32, 55, 56))
      if (off + len <= buf.length)
        assert(GraftHash.md5Head60(buf, off, len) == reference(buf, off, len),
          s"off=$off len=$len")
  }

  test("md5Head60 matches on multi-byte UTF-8 shingle slices") {
    // the kernels hash raw UTF-8 slices of 8-code-point shingles —
    // supplementary-plane text gives 4-byte sequences (32-byte inputs)
    val texts = Seq("abcdefgh", "café ole", "日本語で" +
      "書く文字", new String(Character.toChars(0x1F600)) * 8)
    texts.foreach { t =>
      val b = UTF8String.fromString(t).getBytes
      assert(GraftHash.md5Head60(b, 0, b.length) == reference(b, 0, b.length),
        s"text=$t")
    }
  }
}
