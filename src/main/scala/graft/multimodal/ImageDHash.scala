package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{StageLoader, Transformer}
import graft.dedup.HammingJoin
import graft.param._
import graft.util.ReadWrite

/**
 * 64-bit perceptual difference hash (dHash) for image near-duplicate
 * detection — the multimodal counterpart of [[graft.dedup.SimHash]]:
 * a training-data pipeline dedups re-encoded / recolored / resized
 * copies of the same image that byte-level hashing cannot see.
 *
 * Algorithm (Krawetz's classic dHash): decode the payload, box-average
 * the grayscale raster onto a 9×8 grid, then emit one bit per
 * horizontally adjacent cell pair — bit set iff gray(cx) < gray(cx+1).
 * The hash captures the SIGN of the local luminance gradient, so it is
 * invariant to any monotone per-pixel brightness shift (recoloring
 * that preserves gradient order), to lossless re-encoding, and robust
 * to resizing and mild lossy compression (a JPEG round-trip moves a
 * handful of bits at most — see ImageDHashSpec).
 *
 * Scale shape: hashing is one executor-local pass over the payload
 * column (bytes never leave their partition; the 9×8 accumulation is
 * O(pixels) integer math). Candidate pairs come from the SAME banded
 * Hamming equi-join SimHash uses ([[graft.dedup.HammingJoin]]):
 * pigeonhole guarantees full recall for Hamming distance < numBands,
 * and no all-pairs comparison exists anywhere — at 100 TB the join
 * cost is driven by true near-dup density, not corpus size².
 */
object DHash {

  /** 64-bit dHash of a decoded image. Deterministic pure-integer math:
    * cell (cx, cy) of the 9×8 grid box-averages gray·1000 (the
    * 299/587/114 ITU weights) over pixel block
    * [cx·w/9, (cx+1)·w/9) × [cy·h/8, (cy+1)·h/8); bit cy·8+cx is set
    * iff cell(cx,cy) < cell(cx+1,cy). Works for any w,h ≥ 1 (blocks
    * are clamped to at least one pixel). */
  def dhash64(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = new Array[Long](72) // 9 cols x 8 rows
    var cy = 0
    while (cy < 8) {
      val y0 = cy * h / 8
      val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9
        val x1 = math.max(x0 + 1, (cx + 1) * w / 9)
        var sum = 0L
        var cnt = 0L
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += 299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)
            cnt += 1
            x += 1
          }
          y += 1
        }
        cells(cy * 9 + cx) = if (cnt == 0) 0L else sum / cnt
        cx += 1
      }
      cy += 1
    }
    var fp = 0L
    cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (cells(cy * 9 + cx) < cells(cy * 9 + cx + 1)) fp |= (1L << (cy * 8 + cx))
        cx += 1
      }
      cy += 1
    }
    fp
  }

  /** Full raster decode (unlike [[ImageDecoder]]'s header-only parse —
    * dHash needs pixels) + dhash64. Undecodable/null payloads → None. */
  def dhashBytes(payload: Array[Byte]): Option[Long] = {
    if (payload == null) return None
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
    // the factory defaults to a FileCache stream (temp FILE per row on
    // executor disk) — the ImageDecoder lesson
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    // ImageIO.read(ImageInputStream) closes the stream itself once a
    // reader is selected (success OR failure) — only the no-reader
    // null path leaves it open, so close exactly there; a blanket
    // `finally close()` double-closes and throws IOException: closed
    try {
      val img = javax.imageio.ImageIO.read(iis)
      if (img == null) { iis.close(); None } else Some(dhash64(img))
    } catch {
      case _: Exception =>
        try iis.close() catch { case _: Exception => () }
        None
    }
  }
}

/**
 * Appends the 64-bit dHash of a binary image column; undecodable rows
 * hash to null (filter or route them downstream). `similarityJoin`
 * reuses [[graft.dedup.HammingJoin]] — full recall while
 * maxHamming < numBands, no all-pairs comparison.
 */
class ImageDHasher extends Transformer[ImageDHasher]
    with HasInputCol[ImageDHasher] with HasOutputCol[ImageDHasher] {

  override def transform(inputs: DataFrame*): Array[DataFrame] = {
    require(inputs.size == 1)
    val dh = udf { payload: Array[Byte] =>
      DHash.dhashBytes(payload).map(java.lang.Long.valueOf).orNull
    }
    Array(inputs.head.withColumn(getOutputCol, dh(col(getInputCol))))
  }

  /** All id pairs (a < b) within `maxHamming` bits; `df` must already
    * carry the fingerprint column (outputCol). Null fingerprints
    * (undecodable images) never pair. */
  def similarityJoin(df: DataFrame, idCol: String, maxHamming: Int,
      numBands: Int = 4): DataFrame =
    HammingJoin.pairs(df.where(col(getOutputCol).isNotNull),
      idCol, getOutputCol, maxHamming, numBands)
}

object ImageDHasher extends StageLoader[ImageDHasher] {
  def load(spark: SparkSession, path: String): ImageDHasher =
    ReadWrite.applyParams(new ImageDHasher, path)

  /**
   * Deterministic dedup-test image: an 18×16 raster of 2×2 blocks
   * aligned with dHash's 9×8 grid. Columns 0 and 1 are FIXED per row
   * (cell(0,cy) = 10, cell(1,cy) = 100), every other block a flat gray
   * whose value derives from (group, cx, cy) — so distinct groups get
   * independent gradient-sign patterns over the 7×8 free comparisons
   * (expected Hamming ≈ 28 apart) while the planted variants move
   * provably few bits:
   *
   *   - brightness += c (c ≤ 60): all cells shift equally, every
   *     gradient sign is preserved → Hamming 0 (recolor variant);
   *   - format "bmp"/"png": both lossless → identical pixels →
   *     Hamming 0 (re-encode variant);
   *   - flipMask bit cy (or the legacy flip = true, an alias for
   *     bit 0): cell(0,cy) jumps 10 → 190 against cell(1,cy)'s fixed
   *     100. Cell(0,cy) participates in exactly ONE comparison — fp
   *     bit cy·8 — so Hamming(base, masked) = popcount(flipMask),
   *     each mask bit independent. Eight independent single-bit knobs
   *     make Hamming CHAINS constructible in closed form (variants at
   *     pairwise mask-distance ≤ maxHamming whose endpoints are
   *     farther apart — the transitive-closure dedup fixture).
   *
   * Cell values live in [10, 190] so brightness ≤ 60 never clamps.
   */
  def syntheticCellImage(group: Long, brightness: Int = 0,
      flip: Boolean = false, format: String = "png",
      flipMask: Int = 0): Array[Byte] = {
    require(brightness >= 0 && brightness <= 60,
      s"brightness must be in [0, 60] (no channel clamping), got $brightness")
    require(flipMask >= 0 && flipMask <= 0xff,
      s"flipMask must fit the 8 flippable rows (bits 0-7), got $flipMask")
    val mask = flipMask | (if (flip) 1 else 0)
    val img = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val base =
          if (cx == 0) { if (((mask >> cy) & 1) != 0) 190 else 10 }
          else if (cx == 1) 100
          else {
            // splitmix-style mix of (group, cx, cy) -> [10, 189]
            var z = group * 0x9E3779B97F4A7C15L + cx * 0xC2B2AE3D27D4EB4FL +
              cy * 0x165667B19E3779F9L
            z ^= z >>> 33; z *= 0xFF51AFD7ED558CCDL; z ^= z >>> 33
            10 + (((z >>> 16) % 180L).toInt + 180) % 180
          }
        val v = base + brightness
        val rgb = (v << 16) | (v << 8) | v
        img.setRGB(cx * 2, cy * 2, rgb); img.setRGB(cx * 2 + 1, cy * 2, rgb)
        img.setRGB(cx * 2, cy * 2 + 1, rgb); img.setRGB(cx * 2 + 1, cy * 2 + 1, rgb)
        cx += 1
      }
      cy += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    // explicit MemoryCacheImageOutputStream: ImageIO.write(…,
    // OutputStream) defaults to a FileCache stream — one temp file
    // created+deleted on executor disk PER IMAGE in the 500k-row
    // bench paths (the same lesson dhashBytes documents on the read
    // side). The boolean return is load-bearing: an unsupported
    // format yields `false` + empty bytes, not an exception.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(baos)
    try require(javax.imageio.ImageIO.write(img, format, ios),
      s"no ImageIO writer for format '$format'")
    finally ios.close()
    baos.toByteArray
  }
}
