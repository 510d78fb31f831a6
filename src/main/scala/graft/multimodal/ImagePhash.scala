package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual image hashing + hamming-banded near-dup pairing — the
  * image-side twin of the text near-dup family: re-encoded, resized,
  * or lightly edited copies of an image survive exact byte-level dedup
  * (different container, different bytes) but collapse under a
  * block-mean perceptual hash.
  *
  * The hash is a 48-bit average-hash (aHash) over an 8×6 grid of the
  * DECODED pixels: bit b = 1 iff the grid cell's mean luminance
  * exceeds the image's global mean. Computed with integer arithmetic
  * only — cell sums compared by cross-multiplication
  * (`cellSum · 48 > totalSum`, equal-size cells), so the hash is
  * deterministic across JVMs and mirrors exactly into the oracle's
  * integer SQL. 48 bits (not the classic 64) so the hash packs into a
  * non-negative BIGINT on every engine and reuses the 4×12-bit
  * blocking geometry proven by [[graft.dedup.Dedup.simhashNearDupPairs]].
  *
  * Scale shape: hashing is map-only (one decode per image inside
  * `mapPartitions` — the codec boundary, same as the rest of
  * [[Multimodal]]); pairing is the banded equi-join, work ∝ band
  * collisions, never all-pairs. With `bands > maxHamming` the
  * pigeonhole guarantee makes the banded result EXACTLY the
  * brute-force hamming-≤-k pair set (recall 1), which is what lets a
  * brute-force SQL oracle gate the banded plan.
  *
  * Reference analog: none — the reference's media surface is the
  * text-only scraper (`python_code/scraper/scraper.js:7-37`); this is
  * part of the beyond-parity multimodal curation family.
  */
object ImagePhash {

  val GridW = 8
  val GridH = 6
  val Bits: Int = GridW * GridH // 48

  case class ImageRow(media_id: Long, payload: Array[Byte])
  case class PhashRow(media_id: Long, width: Int, height: Int, phash: Long)

  // ---- deterministic BMP fixture ---------------------------------------

  /** Block luminance of the fixture pattern: constant inside each of
    * the 48 grid cells, so any aligned decode/resize reproduces the
    * cell means exactly. Mirrored verbatim by the DuckDB oracle. */
  def patternValue(srcId: Long, b: Int): Int =
    (((srcId + 1L) * (b + 17L)) % 251L).toInt

  /** 24-bit uncompressed BMP of the pattern at (w, h); w must be a
    * multiple of 8 and h of 6 so grid cells are pixel-aligned. Gray
    * pixels (v,v,v) make the 299/587/114 luminance exactly v. */
  def patternBmp(srcId: Long, w: Int, h: Int,
                 swapCells: Option[(Int, Int)] = None): Array[Byte] = {
    require(w % GridW == 0 && h % GridH == 0, s"unaligned fixture dims ${w}x$h")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    def cell(bx: Int, by: Int): Int = {
      val b0 = by * GridW + bx
      val b = swapCells match {
        case Some((i, j)) if b0 == i => j
        case Some((i, j)) if b0 == j => i
        case _                       => b0
      }
      patternValue(srcId, b)
    }
    var y = h - 1 // BMP rows are bottom-up; pattern indexes top-down
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = cell(x * GridW / w, y * GridH / h).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Fixture corpus from the documents table: every `doc_id % 3 == 0`
    * doc (the `mediaFromDocuments` image slice) becomes a 64×48
    * pattern image; `% 30 == 0` docs add a 2× RESIZED twin
    * (id + 900000 — identical hash: the hash is size-invariant by
    * construction) and `% 21 == 0` docs a lightly EDITED twin
    * (id + 800000, cells 0 and 47 swapped — hamming ≤ 2), so the
    * near-dup join has guaranteed planted positives of both kinds.
    */
  def imageCorpus(spark: SparkSession, dir: String): Dataset[ImageRow] = {
    import spark.implicits._
    val ids = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") % 3 === 0)
      .as[Long]
    ids.flatMap { id =>
      val base = ImageRow(id, patternBmp(id, 64, 48)) :: Nil
      val scaled =
        if (id % 30 == 0) ImageRow(id + 900000L, patternBmp(id, 128, 96)) :: Nil else Nil
      val edited =
        if (id % 21 == 0)
          ImageRow(id + 800000L, patternBmp(id, 64, 48, swapCells = Some((0, Bits - 1)))) :: Nil
        else Nil
      base ++ scaled ++ edited
    }
  }

  // ---- hashing ---------------------------------------------------------

  /** Exact a·b > c·d for non-negative Longs via 128-bit products —
    * shared by the image and audio hash thresholds: the cross-
    * multiplication overflows int64 for gigapixel images / long
    * clips, and a silently wrapped compare would flip hash bits. */
  private[multimodal] def gt128(a: Long, b: Long, c: Long, d: Long): Boolean = {
    val hi1 = Math.multiplyHigh(a, b); val hi2 = Math.multiplyHigh(c, d)
    if (hi1 != hi2) hi1 > hi2
    else java.lang.Long.compareUnsigned(a * b, c * d) > 0
  }

  /** 48-bit block-mean aHash of a decoded image. Integer-exact: cell
    * sums of the integer luminance (r·299+g·587+b·114)/1000 — exact
    * for gray pixels — compared by cross-multiplication against the
    * global sum. Cells are the standard `w·i/8 .. w·(i+1)/8` spans, so
    * non-aligned sizes still hash (cells just carry ±1-pixel rows). */
  def aHash48(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val cellSum = new Array[Long](Bits)
    val cellN = new Array[Long](Bits)
    val rgb = img.getRGB(0, 0, w, h, null, 0, w)
    var y = 0
    while (y < h) {
      val by = y * GridH / h
      var x = 0
      while (x < w) {
        val p = rgb(y * w + x)
        val lum = (((p >> 16) & 0xff) * 299 + ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
        val b = by * GridW + x * GridW / w
        cellSum(b) += lum
        cellN(b) += 1
        x += 1
      }
      y += 1
    }
    val total = cellSum.sum
    val totalN = cellN.sum
    var hash = 0L
    var b = 0
    while (b < Bits) {
      // mean_cell > mean_total without division: sum_b·totalN > total·n_b
      // (128-bit compare — luminance sums reach int64 overflow past
      // ~1.3 gigapixels, and a wrapped compare would flip bits)
      if (cellN(b) > 0 && gt128(cellSum(b), totalN, total, cellN(b))) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Decode + hash every image row, partition-parallel. Rows the JDK
    * cannot decode are dropped (surface them via [[Multimodal.extractMeta]]'s
    * format column, not as fake hashes that would near-dup-match). */
  def phashes(images: Dataset[ImageRow]): Dataset[PhashRow] = {
    import images.sparkSession.implicits._
    images.mapPartitions(rows => rows.flatMap { r =>
      val img =
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload)))
        catch { case _: Exception => None }
      img.map(i => PhashRow(r.media_id, i.getWidth, i.getHeight, aHash48(i)))
    })
  }

  /** Hamming-banded near-dup pairs over a 48-bit hash column —
    * [[graft.dedup.Dedup.simhashNearDupPairs]]'s recall-1 blocking
    * generalized to any precomputed hash frame. */
  def nearDupPairs(hashed: DataFrame, idCol: String, hashCol: String,
                   maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > maxHamming, "recall-1 blocking needs bands > maxHamming")
    require(48 % bands == 0, "bands must divide 48")
    val bits = 48 / bands
    val mask = (1L << bits) - 1
    val banded = hashed
      .select(col(idCol).as("id"), col(hashCol).as("hv48"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band_id"),
            shiftright(col(hashCol), b * bits).bitwiseAND(lit(mask)).as("band_val"))): _*)).as("bd"))
      .select(col("id"), col("hv48"), col("bd.band_id"), col("bd.band_val"))
    banded.as("a").join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
        col("a.band_val") === col("b.band_val") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.hv48").bitwiseXOR(col("b.hv48"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
