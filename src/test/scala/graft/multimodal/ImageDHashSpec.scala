package graft.multimodal

import graft.SparkSpec
import graft.dedup.SimHash
import org.apache.spark.sql.functions._

class ImageDHashSpec extends SparkSpec {

  private def mk(g: Long, brightness: Int = 0, flip: Boolean = false,
      format: String = "png"): Array[Byte] =
    ImageDHasher.syntheticCellImage(g, brightness, flip, format)

  test("dhash64 is deterministic and groups differ") {
    val a1 = DHash.dhashBytes(mk(1L)).get
    val a2 = DHash.dhashBytes(mk(1L)).get
    val b = DHash.dhashBytes(mk(2L)).get
    assert(a1 == a2)
    // independent cell patterns: expect ~32 differing bits, certainly many
    assert(SimHash.hammingDistance(a1, b) > 8,
      s"groups 1/2 unexpectedly close: ${SimHash.hammingDistance(a1, b)}")
  }

  test("brightness shift and lossless re-encode are Hamming 0; cell flip is exactly 1") {
    val base = DHash.dhashBytes(mk(7L)).get
    assert(DHash.dhashBytes(mk(7L, brightness = 40)).get == base)
    assert(DHash.dhashBytes(mk(7L, format = "bmp")).get == base)
    assert(DHash.dhashBytes(mk(7L, brightness = 40, format = "bmp")).get == base)
    val flipped = DHash.dhashBytes(mk(7L, flip = true)).get
    assert(SimHash.hammingDistance(base, flipped) == 1)
    // the flipped comparison is bit 0 (cells (0,0) vs (1,0) at row 0)
    assert((base ^ flipped) == 1L)
  }

  test("flipMask moves exactly popcount(mask) bits, at bits cy*8") {
    val base = DHash.dhashBytes(mk(11L)).get
    // flip == flipMask bit 0
    assert(DHash.dhashBytes(mk(11L, flip = true)).get ==
      DHash.dhashBytes(ImageDHasher.syntheticCellImage(11L, flipMask = 1)).get)
    for (mask <- Seq(0x01, 0x07, 0x3f, 0xff)) {
      val m = DHash.dhashBytes(ImageDHasher.syntheticCellImage(11L, flipMask = mask)).get
      val diff = base ^ m
      assert(java.lang.Long.bitCount(diff) == Integer.bitCount(mask))
      // mask bit cy flips fp bit cy*8 (cell (0,cy)'s single comparison)
      val expected = (0 until 8).filter(cy => ((mask >> cy) & 1) != 0)
        .map(cy => 1L << (cy * 8)).foldLeft(0L)(_ | _)
      assert(diff == expected, s"mask $mask moved bits ${diff.toBinaryString}")
    }
    // the chain fixture: consecutive links at 3, endpoints at 6
    val v1 = DHash.dhashBytes(ImageDHasher.syntheticCellImage(11L, flipMask = 0x07)).get
    val v2 = DHash.dhashBytes(ImageDHasher.syntheticCellImage(11L, flipMask = 0x3f)).get
    assert(SimHash.hammingDistance(base, v1) == 3)
    assert(SimHash.hammingDistance(v1, v2) == 3)
    assert(SimHash.hammingDistance(base, v2) == 6)
    // recolor of a masked variant stays Hamming 0 from it
    assert(DHash.dhashBytes(ImageDHasher.syntheticCellImage(11L, flipMask = 0x3f,
      brightness = 40)).get == v2)
    intercept[IllegalArgumentException] {
      ImageDHasher.syntheticCellImage(11L, flipMask = 256)
    }
  }

  test("JPEG re-encode stays within a small Hamming distance") {
    // a smooth 90x80 gradient survives lossy round-trip with most
    // gradient signs intact; pins dHash's raison d'etre (byte hashes
    // see a completely different file)
    val img = new java.awt.image.BufferedImage(
      90, 80, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 90) {
      val v = 20 + (x * 2 + (if (((x / 10) + (y / 10)) % 2 == 0) 60 else 0)) % 200
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val png = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", b); b.toByteArray }
    val jpg = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", b); b.toByteArray }
    assert(!java.util.Arrays.equals(png, jpg))
    val d = SimHash.hammingDistance(
      DHash.dhashBytes(png).get, DHash.dhashBytes(jpg).get)
    assert(d <= 3, s"JPEG round-trip moved $d bits")
  }

  test("undecodable and null payloads hash to null; tiny images still hash") {
    import spark.implicits._
    val df = Seq(
      (1L, mk(1L)),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, null)).toDF("id", "img")
    val out = new ImageDHasher().setInputCol("img").setOutputCol("dhash")
      .transform(df).head.orderBy("id").select("dhash").collect()
    assert(out(0).get(0) != null)
    assert(out(1).get(0) == null && out(2).get(0) == null)
    // 1x1 and 3x2 images: blocks clamp to >= 1 pixel, no crash
    val one = new java.awt.image.BufferedImage(1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(DHash.dhash64(one) == 0L) // all cells equal -> no strict '<'
    val tiny = new java.awt.image.BufferedImage(3, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    tiny.setRGB(2, 1, 0xffffff)
    DHash.dhash64(tiny) // just must not throw
  }

  test("similarityJoin finds planted variants, skips nulls, guards banding") {
    import spark.implicits._
    // 10 groups x 4 variants: base, recolor(+40), bmp re-encode, flip
    val rows = (0L until 10L).flatMap { g =>
      Seq((g * 4, mk(g)), (g * 4 + 1, mk(g, brightness = 40)),
        (g * 4 + 2, mk(g, format = "bmp")), (g * 4 + 3, mk(g, flip = true)))
    } :+ ((40L, "garbage".getBytes("UTF-8"))) // undecodable row
    val df = rows.toDF("id", "img")
    val hasher = new ImageDHasher().setInputCol("img").setOutputCol("dhash")
    val hashed = hasher.transform(df).head
    val pairs = hasher.similarityJoin(hashed, "id", maxHamming = 3, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // full recall: all 6 intra-group pairs per group, nothing else
    assert(pairs.length == 60, s"expected 60 pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, _) => a / 4 == b / 4 })
    // flip variants sit at Hamming 1 from their group, others at 0
    pairs.foreach { case (a, b, d) =>
      val expected = if (a % 4 == 3 || b % 4 == 3) 1 else 0
      assert(d == expected, s"pair ($a,$b) hamming $d != $expected")
    }
    intercept[IllegalArgumentException] {
      hasher.similarityJoin(hashed, "id", maxHamming = 4, numBands = 4)
    }
    intercept[IllegalArgumentException] {
      hasher.similarityJoin(hashed, "id", maxHamming = 3, numBands = 5)
    }
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new ImageDHasher().setInputCol("img").setOutputCol("h").save(dir)
    val back = ImageDHasher.load(spark, dir)
    assert(back.getInputCol == "img" && back.getOutputCol == "h")
  }
}
