package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.dedup.HammingJoin
import graft.param._
import graft.util.ReadWrite

/**
 * 64-bit perceptual audio hash for near-duplicate detection — the
 * audio counterpart of [[ImageDHasher]], completing the multimodal
 * dedup tier (a training-data pipeline dedups re-gained / re-mastered
 * / time-stretched copies of the same recording that byte hashing
 * cannot see; cf. Haitsma & Kalker's energy-band fingerprint, ISMIR
 * 2002 — this is the 1-band/64-frame variant of that construction).
 *
 * Algorithm: decode the RIFF/WAVE payload (16-bit PCM, the format the
 * rest of the tier's decoders emit), mono-mix, split the sample stream
 * into 65 equal time windows, take each window's mean |amplitude|
 * (the energy envelope), then emit one bit per adjacent window pair —
 * bit i set iff env(i) < env(i+1). The hash captures the SIGN of the
 * envelope gradient, so it is exactly invariant to any positive gain
 * change (all envelopes scale together) and to integer time-stretch
 * (windows are fractions of the total duration, not fixed ms), and
 * robust to mild lossy re-encoding.
 *
 * Scale shape: hashing is one executor-local pass over the payload
 * column (PCM bytes never leave their partition; the envelope walk is
 * O(samples) integer adds). Candidate pairs come from the SAME banded
 * Hamming equi-join as SimHash/ImageDHasher ([[HammingJoin]]): full
 * recall below numBands by pigeonhole, no all-pairs comparison.
 */
object AudioDHash {

  /** 64-bit envelope hash of 16-bit PCM WAV bytes. None for null,
    * non-WAV, non-16-bit, or sample-less payloads. The container parse
    * is [[AudioDecoder.walkWav]] — the ONE shared hostile-bytes RIFF
    * walk (Long offsets, always advancing), so its untrusted-input
    * hardening cannot drift between the decoder and this hash. */
  def energyHash64(payload: Array[Byte]): Option[Long] = try {
    val chunks = AudioDecoder.walkWav(payload) match {
      case Some(c) if c.bits == 16 && c.dataOff >= 0 => c
      case _ => return None
    }
    val b = payload
    val channels = chunks.channels
    val dataOff = chunks.dataOff
    val avail = math.min(chunks.dataSize, b.length - dataOff)
    val frames = avail / (2L * channels)
    if (frames <= 0) return None
    // mean |mono-mixed amplitude| per window; 65 windows -> 64
    // adjacent comparisons. All-integer accumulation (Long sums cannot
    // overflow below ~2^47 frames), double only at the final mean.
    val env = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val f0 = w * frames / 65
      val f1 = math.max(f0 + 1, (w + 1) * frames / 65)
      var sum = 0L
      var cnt = 0L
      var f = f0
      while (f < f1 && f < frames) {
        var mix = 0L
        var c = 0
        while (c < channels) {
          val o = dataOff + (f * channels + c) * 2
          mix += ((b(o.toInt) & 0xff) | (b(o.toInt + 1) << 8)).toShort.toLong
          c += 1
        }
        sum += math.abs(mix)
        cnt += 1
        f += 1
      }
      env(w) = if (cnt == 0) 0.0 else sum.toDouble / cnt / channels
      w += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (env(i) < env(i + 1)) fp |= (1L << i)
      i += 1
    }
    Some(fp)
  } catch { case _: RuntimeException => None }
}

/**
 * Appends the 64-bit envelope hash of a binary WAV column; undecodable
 * rows hash to null. `similarityJoin` reuses [[HammingJoin]] — full
 * recall while maxHamming < numBands, no all-pairs comparison.
 */
class AudioDHasher extends Transformer[AudioDHasher]
    with HasInputCol[AudioDHasher] with HasOutputCol[AudioDHasher] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val ah = udf { payload: Array[Byte] =>
      AudioDHash.energyHash64(payload).map(java.lang.Long.valueOf).orNull
    }
    Array(inputs.head.withColumn(getOutputCol, ah(col(getInputCol))))
  }

  /** All id pairs (a < b) within `maxHamming` bits; null hashes
    * (undecodable payloads) never pair. */
  def similarityJoin(df: DataFrame, idCol: String, maxHamming: Int,
      numBands: Int = 4): DataFrame =
    HammingJoin.pairs(df.where(col(getOutputCol).isNotNull),
      idCol, getOutputCol, maxHamming, numBands)
}

object AudioDHasher extends StageLoader[AudioDHasher] {
  def load(spark: SparkSession, path: String): AudioDHasher =
    ReadWrite.applyParams(new AudioDHasher, path)

  /**
   * Deterministic dedup-test WAV: 65 equal windows of an alternating
   * ±A square wave (mean |amplitude| = A exactly), window amplitudes
   * derived from (group, w) — distinct groups get independent envelope
   * gradients (expected Hamming ≈ 32 apart) while the planted variants
   * move provably few bits:
   *
   *   - gain ×2 (or any positive integer gain ≤ 150): every window
   *     scales together, all gradient signs preserved → Hamming 0;
   *   - stretch ×k (longer recording, same content): windows are
   *     duration fractions, each still wholly inside one amplitude
   *     region → Hamming 0;
   *   - flip = true: window 0 jumps 10 → 190 against window 1's fixed
   *     100, inverting exactly that one comparison → Hamming 1.
   *
   * Amplitudes live in [10, 190] so gain ≤ 150 never clips int16.
   */
  def syntheticWindowWav(group: Long, gain: Int = 1, stretch: Int = 1,
      flip: Boolean = false): Array[Byte] = {
    require(gain >= 1 && gain <= 150, s"gain must be in [1, 150], got $gain")
    require(stretch >= 1 && stretch <= 16, s"stretch must be in [1, 16], got $stretch")
    val perWindow = 16 * stretch
    val n = 65 * perWindow
    val samples = new Array[Short](n)
    var w = 0
    while (w < 65) {
      val base =
        if (w == 0) { if (flip) 190 else 10 }
        else if (w == 1) 100
        else {
          var z = group * 0x9E3779B97F4A7C15L + w * 0xC2B2AE3D27D4EB4FL
          z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
          10 + ((z >>> 16) % 180L).toInt
        }
      val a = (base * gain).toShort
      var i = 0
      while (i < perWindow) {
        samples(w * perWindow + i) = if (i % 2 == 0) a else (-a).toShort
        i += 1
      }
      w += 1
    }
    AudioDecoder.wavBytes(8000, 1, samples)
  }
}
