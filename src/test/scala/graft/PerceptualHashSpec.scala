package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{GraftFunctions, PerceptualHash, PerceptualHashFunctions}

/** dHash over real 24-bpp BMP pixel walks (functions.PerceptualHash). */
class PerceptualHashSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Build an uncompressed 24-bpp BMP; gray(x, y) gives one byte used
    * for all three channels. topDown stores a negative height. */
  private def bmp(w: Int, h: Int, gray: (Int, Int) => Int,
                  topDown: Boolean = false): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff)
    }
    out.write('B'); out.write('M')
    le32(54 + stride * h); le32(0); le32(54)   // file size, reserved, pixel offset
    le32(40); le32(w); le32(if (topDown) -h else h)
    le16(1); le16(24); le32(0); le32(stride * h)
    le32(0); le32(0); le32(0); le32(0)
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    rows.foreach { y =>
      (0 until w).foreach { x =>
        val g = gray(x, y) & 0xff
        out.write(g); out.write(g); out.write(g)
      }
      (w * 3 until stride).foreach(_ => out.write(0))
    }
    out.toByteArray
  }

  test("monotone gradients give all-ones / all-zero hashes") {
    assert(PerceptualHash.dHash(bmp(18, 16, (x, _) => x * 14)) == -1L)
    assert(PerceptualHash.dHash(bmp(18, 16, (x, _) => 255 - x * 14)) == 0L)
    assert(PerceptualHash.dHash(bmp(18, 16, (_, _) => 77)) == 0L) // flat: strict >
  }

  test("bottom-up and top-down storage of the same image hash identically") {
    val f = (x: Int, y: Int) => (x * 37 + y * 11) % 250
    assert(PerceptualHash.dHash(bmp(20, 17, f)) ==
      PerceptualHash.dHash(bmp(20, 17, f, topDown = true)))
  }

  test("unequal cell sizes stay exact (cross-multiplied comparison)") {
    // w=10: cells of 1-2 pixels; a brighter narrow cell must win on
    // AVERAGE, not raw sum: col x=0 (cell 0, 1px, g=200) vs x=1..2
    // (cell 1, 2px, g=120 each): sum 200 < 240 but avg 200 > 120
    val img = bmp(10, 8, (x, _) => if (x == 0) 200 else 120)
    val h = PerceptualHash.dHash(img)
    assert(h != null && (h.longValue() & 1L) == 0L, s"bit0 must be 0 (right dimmer): $h")
  }

  test("a small local edit lands within a few Hamming bits") {
    val f = (x: Int, y: Int) => (x * 37 + y * 11) % 250
    val a = PerceptualHash.dHash(bmp(18, 16, f))
    val b = PerceptualHash.dHash(
      bmp(18, 16, (x, y) => if (x == 4 && y == 4) 255 else f(x, y)))
    val d = java.lang.Long.bitCount(a ^ b)
    assert(d <= 4, s"hamming=$d")
    // a different image is far away
    val c = PerceptualHash.dHash(bmp(18, 16, (x, y) => (x * 201 + y * y * 7) % 250))
    assert(java.lang.Long.bitCount(a ^ c) > 8)
  }

  test("malformed payloads are data, not failures: NULL") {
    val good = bmp(18, 16, (x, y) => x + y)
    assert(PerceptualHash.dHash(good) != null)
    assert(PerceptualHash.dHash(good.take(53)) == null)             // truncated header
    assert(PerceptualHash.dHash(good.take(200)) == null)            // truncated pixels
    assert(PerceptualHash.dHash("notabmp".getBytes) == null)
    assert(PerceptualHash.dHash(Array.empty[Byte]) == null)
    val comp = good.clone; comp(30) = 1                             // BI_RLE8
    assert(PerceptualHash.dHash(comp) == null)
    val bpp32 = good.clone; bpp32(28) = 32
    assert(PerceptualHash.dHash(bpp32) == null)
    assert(PerceptualHash.dHash(bmp(8, 16, (x, y) => x + y)) == null) // W < 9
    assert(PerceptualHash.dHash(bmp(18, 7, (x, y) => x + y)) == null) // H < 8
  }

  test("column + SQL surface") {
    GraftFunctions.register(spark)
    val img = bmp(18, 16, (x, _) => x * 14)
    val df = Seq((1, img), (2, null.asInstanceOf[Array[Byte]])).toDF("id", "b")
    val got = df.select(col("id"), PerceptualHashFunctions.dHash(col("b")).as("h"))
      .orderBy("id").collect()
    assert(got(0).getLong(1) == -1L && got(1).isNullAt(1))
    df.createOrReplaceTempView("phash_t")
    val sqlGot = spark.sql(
      "SELECT graft_dhash(b) AS h FROM phash_t WHERE id = 1").collect()
    assert(sqlGot(0).getLong(0) == -1L)
  }
}
