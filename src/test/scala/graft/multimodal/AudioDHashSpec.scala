package graft.multimodal

import graft.SparkSpec
import graft.dedup.SimHash

class AudioDHashSpec extends SparkSpec {

  private def mk(g: Long, gain: Int = 1, stretch: Int = 1,
      flip: Boolean = false): Array[Byte] =
    AudioDHasher.syntheticWindowWav(g, gain, stretch, flip)

  test("energyHash64 is deterministic and groups differ") {
    val a1 = AudioDHash.energyHash64(mk(1L)).get
    val a2 = AudioDHash.energyHash64(mk(1L)).get
    val b = AudioDHash.energyHash64(mk(2L)).get
    assert(a1 == a2)
    assert(SimHash.hammingDistance(a1, b) > 8,
      s"groups 1/2 unexpectedly close: ${SimHash.hammingDistance(a1, b)}")
  }

  test("gain and time-stretch are Hamming 0; window flip is exactly 1") {
    val base = AudioDHash.energyHash64(mk(7L)).get
    assert(AudioDHash.energyHash64(mk(7L, gain = 2)).get == base)
    assert(AudioDHash.energyHash64(mk(7L, gain = 150)).get == base)
    assert(AudioDHash.energyHash64(mk(7L, stretch = 2)).get == base)
    assert(AudioDHash.energyHash64(mk(7L, gain = 3, stretch = 4)).get == base)
    val flipped = AudioDHash.energyHash64(mk(7L, flip = true)).get
    assert((base ^ flipped) == 1L) // exactly bit 0 (windows 0 vs 1)
  }

  test("stereo mono-mix, hostile/undecodable payloads, real synthetic WAV") {
    // stereo with duplicated channels hashes EXACTLY like mono
    // (mix = 2a, /channels = a): exercises the channel-interleave walk
    val mono = mk(3L)
    val monoHash = AudioDHash.energyHash64(mono).get
    val monoChunks = AudioDecoder.walkWav(mono).get
    val monoSamples = {
      val n = (monoChunks.dataSize / 2).toInt
      val bb = java.nio.ByteBuffer.wrap(mono, monoChunks.dataOff.toInt, n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      Array.fill(n)(bb.getShort())
    }
    val stereo = AudioDecoder.wavBytes(8000, 2,
      monoSamples.flatMap(s => Array(s, s)))
    assert(AudioDHash.energyHash64(stereo).get == monoHash)
    // AudioDecoder's generic synthetic WAV decodes to SOME hash
    val generic = AudioDecoder.syntheticWav(8000, 4000, 2, seed = 9L)
    assert(AudioDHash.energyHash64(generic).isDefined)
    assert(AudioDHash.energyHash64(null) == None)
    assert(AudioDHash.energyHash64("RIFFxxxxWAVE".getBytes("US-ASCII")) == None)
    assert(AudioDHash.energyHash64(Array.fill[Byte](100)(0x41)) == None)
    // truncated mid-data: walk must not throw; whatever frames exist hash
    val cut = mono.take(44 + 321)
    AudioDHash.energyHash64(cut) // must not throw
    // 8-bit / non-PCM-16 payloads refuse (bits != 16)
    val bad16 = mono.clone()
    bad16(34) = 8; bad16(35) = 0 // bits_per_sample field
    assert(AudioDHash.energyHash64(bad16) == None)
  }

  test("similarityJoin finds planted variants across gain/stretch/flip") {
    import spark.implicits._
    val rows = (0L until 8L).flatMap { g =>
      Seq((g * 4, mk(g)), (g * 4 + 1, mk(g, gain = 2)),
        (g * 4 + 2, mk(g, stretch = 2)), (g * 4 + 3, mk(g, flip = true)))
    } :+ ((32L, "garbage".getBytes("UTF-8")))
    val df = rows.toDF("id", "wav")
    val hasher = new AudioDHasher().setInputCol("wav").setOutputCol("ahash")
    val hashed = hasher.transform(df).head
    val pairs = hasher.similarityJoin(hashed, "id", maxHamming = 3, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.length == 48, s"expected 8 groups x 6 pairs, got ${pairs.length}")
    assert(pairs.forall { case (a, b, _) => a / 4 == b / 4 })
    pairs.foreach { case (a, b, d) =>
      val expected = if (a % 4 == 3 || b % 4 == 3) 1 else 0
      assert(d == expected, s"pair ($a,$b) hamming $d != $expected")
    }
  }

  test("param save/load round-trip") {
    val dir = tmpDir()
    new AudioDHasher().setInputCol("wav").setOutputCol("h").save(dir)
    val back = AudioDHasher.load(spark, dir)
    assert(back.getInputCol == "wav" && back.getOutputCol == "h")
  }
}
