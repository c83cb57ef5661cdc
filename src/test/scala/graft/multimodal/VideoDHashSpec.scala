package graft.multimodal

import graft.SparkSpec
import graft.dedup.SimHash
import org.apache.spark.sql.functions._

class VideoDHashSpec extends SparkSpec {

  private def mk(g: Long, numFrames: Int = 5, brightness: Int = 0,
      stretch: Int = 1, flipMask: Int = 0, format: String = "png"): Array[Byte] =
    VideoDHasher.syntheticCellVideo(g, numFrames, brightness, stretch, flipMask, format)

  test("signature samples first/mid/last frames; slots differ within a video") {
    val sig = VideoDHash.signature(mk(1L)).get
    val again = VideoDHash.signature(mk(1L)).get
    assert(sig == again)
    // frames use distinct cell groups -> the three slots are far apart
    assert(SimHash.hammingDistance(sig.fp_first, sig.fp_mid) > 8)
    assert(SimHash.hammingDistance(sig.fp_mid, sig.fp_last) > 8)
    // slots are the FRAMES at positions 0, n/2, n-1 (5 frames: 0, 2, 4)
    def frameHash(g: Long, j: Int): Long =
      DHash.dhashBytes(ImageDHasher.syntheticCellImage(g * 1000003L + j)).get
    assert(sig.fp_first == frameHash(1L, 0))
    assert(sig.fp_mid == frameHash(1L, 2))
    assert(sig.fp_last == frameHash(1L, 4))
  }

  test("re-grade, lossless re-encode and stretch are Hamming 0 per slot; flip moves 1") {
    val base = VideoDHash.signature(mk(7L)).get
    assert(VideoDHash.signature(mk(7L, brightness = 40)).get == base)
    assert(VideoDHash.signature(mk(7L, format = "bmp")).get == base)
    for (k <- Seq(2, 3, 4)) {
      assert(VideoDHash.signature(mk(7L, stretch = k)).get == base,
        s"stretch x$k must land on the same source frames")
    }
    // odd frame count too (mid-index arithmetic)
    val odd = VideoDHash.signature(mk(7L, numFrames = 7)).get
    assert(VideoDHash.signature(mk(7L, numFrames = 7, stretch = 2)).get == odd)
    val flipped = VideoDHash.signature(mk(7L, flipMask = 1)).get
    assert(SimHash.hammingDistance(base.fp_first, flipped.fp_first) == 1)
    assert(SimHash.hammingDistance(base.fp_mid, flipped.fp_mid) == 1)
    assert(SimHash.hammingDistance(base.fp_last, flipped.fp_last) == 1)
  }

  test("hostile and degenerate payloads: garbage, truncation, bad frames, 1-frame video") {
    assert(VideoDHash.signature(null).isEmpty)
    assert(VideoDHash.signature("not a video".getBytes("UTF-8")).isEmpty)
    assert(VideoDHash.signature(Array.fill[Byte](11)(0x41)).isEmpty)
    // a WAV is RIFF but not AVI
    assert(VideoDHash.signature(
      AudioDHasher.syntheticWindowWav(1L)).isEmpty)
    val good = mk(3L)
    // truncation anywhere must not throw
    for (cut <- Seq(12, 40, 100, good.length / 2, good.length - 3))
      VideoDHash.signature(java.util.Arrays.copyOf(good, cut))
    // a frame chunk with undecodable bytes -> whole signature is None
    val badFrame = VideoDHasher.aviBytes(
      Seq(ImageDHasher.syntheticCellImage(1L), "garbage-frame".getBytes("UTF-8")),
      18, 16)
    assert(VideoDHash.signature(badFrame).isEmpty,
      "partially decodable videos must not match on surviving slots")
    // a crafted chunk size that would overflow Int must end the walk
    val evil = good.clone()
    // first frame chunk size field: find "00dc" and poison its size
    val idx = (0 until evil.length - 4).find(i =>
      evil(i) == '0' && evil(i + 1) == '0' && evil(i + 2) == 'd' && evil(i + 3) == 'c').get
    evil(idx + 4) = 0xf8.toByte; evil(idx + 5) = 0xff.toByte
    evil(idx + 6) = 0xff.toByte; evil(idx + 7) = 0xff.toByte
    VideoDHash.signature(evil) // must terminate, not hang or throw
    val one = VideoDHash.signature(mk(9L, numFrames = 1)).get
    assert(one.fp_first == one.fp_mid && one.fp_mid == one.fp_last)
  }

  test("similarityJoin finds planted variants on all slots, rejects single-slot matches") {
    import spark.implicits._
    // 8 groups x 4 variants: base, re-grade, stretch x2, 1-bit flip
    val rows = (0L until 8L).flatMap { g =>
      Seq((g * 4, mk(g)), (g * 4 + 1, mk(g, brightness = 40)),
        (g * 4 + 2, mk(g, stretch = 2)), (g * 4 + 3, mk(g, flipMask = 1)))
    } :+ ((32L, "garbage".getBytes("UTF-8")))
    val df = rows.toDF("id", "video")
    val hasher = new VideoDHasher().setInputCol("video").setOutputCol("sig")
    val hashed = hasher.transform(df).head.select("id", "sig").localCheckpoint(true)
    val pairs = hasher.similarityJoin(hashed, "id", maxHamming = 3, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == 8 * 6, s"expected 48 pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, _) => a / 4 == b / 4 })
    pairs.foreach { case (a, b, d) =>
      val expected = if (a % 4 == 3 || b % 4 == 3) 1 else 0
      assert(d == expected, s"pair ($a,$b) max-slot hamming $d != $expected")
    }
    // a pair matching on ONE slot only must NOT join: same first frame,
    // different mid/last frames (hand-built frame lists)
    def frame(g: Long, j: Long): Array[Byte] =
      ImageDHasher.syntheticCellImage(g * 1000003L + j)
    val sharedFirst = Seq(
      (100L, VideoDHasher.aviBytes(Seq(frame(50L, 0), frame(51L, 1), frame(51L, 2)), 18, 16)),
      (101L, VideoDHasher.aviBytes(Seq(frame(50L, 0), frame(52L, 1), frame(52L, 2)), 18, 16)))
      .toDF("id", "video")
    val h2 = hasher.transform(sharedFirst).head
    assert(hasher.similarityJoin(h2, "id", 3, 4).count() == 0,
      "identical first frames with divergent content must not match")
  }

  test("clusterWithRep report shape: canonical min id, rep distances, null handling") {
    import spark.implicits._
    val rows = (0L until 4L).flatMap { g =>
      Seq((g * 4, mk(g)), (g * 4 + 1, mk(g, brightness = 40)),
        (g * 4 + 2, mk(g, stretch = 2)), (g * 4 + 3, mk(g, flipMask = 1)))
    } :+ ((16L, "garbage".getBytes("UTF-8")))
    val df = rows.toDF("id", "video")
    val hasher = new VideoDHasher().setInputCol("video").setOutputCol("sig")
    val hashed = hasher.transform(df).head.select("id", "sig").localCheckpoint(true)
    val out = hasher.clusterWithRep(hashed, "id", maxHamming = 3, numBands = 4)
      .orderBy("id").collect()
    assert(out.length == 17)
    out.foreach { r =>
      val id = r.getLong(0)
      if (id == 16L) {
        assert(r.getLong(1) == 16L && !r.getBoolean(2) && r.isNullAt(3))
      } else {
        assert(r.getLong(1) == (id / 4) * 4)
        assert(r.getBoolean(2) == (id % 4 != 0))
        assert(r.getInt(3) == (if (id % 4 == 3) 1 else 0))
      }
    }
  }

  test("clusterComponents closes video Hamming chains; clusterWithRep splits them") {
    import spark.implicits._
    // chain: flipMask 0 -> 0x07 -> 0x3f moves every slot 3 bits per
    // hop (endpoints 6 apart), plus a re-grade clique member on the
    // end; a null payload clusters alone
    val df = Seq(
      (0L, mk(1L)),
      (1L, mk(1L, flipMask = 0x07)),
      (2L, mk(1L, flipMask = 0x3f)),
      (3L, mk(1L, flipMask = 0x3f, brightness = 40)),
      (9L, mk(2L)),
      (10L, Array.empty[Byte])).toDF("id", "v")
    val h = new VideoDHasher().setInputCol("v").setOutputCol("s")
    val hashed = h.transform(df).head
    val closed = h.clusterComponents(hashed, "id", maxHamming = 3, numBands = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(closed(0L) == ((0L, false)))
    assert(closed(1L) == ((0L, true)))
    assert(closed(2L) == ((0L, true)), "chain end must close to the root")
    assert(closed(3L) == ((0L, true)))
    assert(closed(9L) == ((9L, false)) && closed(10L) == ((10L, false)))
    // single-hop comparison: the chain end points at its neighbor
    val direct = h.clusterWithRep(hashed, "id", maxHamming = 3, numBands = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(direct(2L) == 1L, "documented single-hop semantics")
  }

  test("param save/load round-trip; banding guards") {
    val dir = tmpDir()
    new VideoDHasher().setInputCol("v").setOutputCol("s").save(dir)
    val back = VideoDHasher.load(spark, dir)
    assert(back.getInputCol == "v" && back.getOutputCol == "s")
    import spark.implicits._
    val df = Seq((1L, mk(1L))).toDF("id", "v")
    val h = new VideoDHasher().setInputCol("v").setOutputCol("s")
    val hashed = h.transform(df).head
    intercept[IllegalArgumentException] { h.similarityJoin(hashed, "id", 4, 4) }
    intercept[IllegalArgumentException] { h.similarityJoin(hashed, "id", 3, 5) }
  }
}
