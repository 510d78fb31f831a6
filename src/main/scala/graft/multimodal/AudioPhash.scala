package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** Perceptual audio hashing — the audio member of the multimodal
  * near-dup family ([[ImagePhash]] is the image member): re-encoded,
  * volume-scaled, or duration-stretched copies of a clip survive
  * byte-level dedup but collapse under an energy-profile hash.
  *
  * The hash is a 48-bit profile over 48 equal time segments of the
  * DECODED PCM samples: bit b = 1 iff segment b's mean energy (sum of
  * squared samples, integer Longs) exceeds the clip's global mean —
  * the same cross-multiplication contract as [[ImagePhash.aHash48]]
  * (`segSum · 48 > totalSum`, equal-length segments). Because every
  * bit compares RELATIVE energies, the hash is invariant to uniform
  * volume scaling (both sides scale by c²) and to duration changes
  * that preserve the energy profile — exactly the two transforms an
  * audio dedup must see through.
  *
  * Decode is the REAL JDK path (`javax.sound.sampled`, signed PCM
  * 8/16-bit — the same stack [[Multimodal.MediaCodec.audioStats]]
  * uses), inside `mapPartitions` at the codec boundary; pairing
  * reuses [[ImagePhash.nearDupPairs]]'s recall-1 hamming banding.
  *
  * Reference analog: none — beyond-parity multimodal curation.
  */
object AudioPhash {

  val Segments = 48

  case class AudioRow(media_id: Long, payload: Array[Byte])
  case class AudioHashRow(media_id: Long, n_samples: Long, ahash: Long)

  /** Segment amplitude of the fixture pattern (int16-safe even after
    * the 2× volume plant). Mirrored verbatim by the DuckDB oracle —
    * hash bits depend only on these values, not on volume/duration. */
  def patternValue(srcId: Long, b: Int): Int =
    ((((srcId + 1L) * (b + 23L)) % 251L) * 60L).toInt

  /** 16-bit mono PCM WAV of the pattern: 48 constant-amplitude
    * segments of `samplesPerSeg` samples each. `volume` scales every
    * sample uniformly; `swapSegs` exchanges two segments' amplitudes
    * (the "light edit" plant). */
  def patternWav(srcId: Long, samplesPerSeg: Int = 64, volume: Int = 1,
                 swapSegs: Option[(Int, Int)] = None): Array[Byte] = {
    val n = Segments * samplesPerSeg
    val dataBytes = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(8000).putInt(8000 * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    def amp(b0: Int): Int = {
      val b = swapSegs match {
        case Some((i, j)) if b0 == i => j
        case Some((i, j)) if b0 == j => i
        case _                       => b0
      }
      patternValue(srcId, b) * volume
    }
    var i = 0
    while (i < n) {
      buf.putShort(amp(i / samplesPerSeg).toShort)
      i += 1
    }
    buf.array()
  }

  /** Fixture corpus from the documents table: every `doc_id % 3 == 1`
    * doc (the `mediaFromDocuments` audio slice) becomes a WAV clip;
    * `% 30 == 1` docs add a 2×-VOLUME twin (id + 950000 — identical
    * hash by scale invariance) and `% 21 == 1` docs an EDITED twin
    * (id + 850000, segments 0 and 47 swapped — hamming ≤ 2). */
  def audioCorpus(spark: SparkSession, dir: String): Dataset[AudioRow] = {
    import spark.implicits._
    val ids = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id")).filter(col("doc_id") % 3 === 1)
      .as[Long]
    ids.flatMap { id =>
      val base = AudioRow(id, patternWav(id)) :: Nil
      val loud =
        if (id % 30 == 1) AudioRow(id + 950000L, patternWav(id, volume = 2)) :: Nil else Nil
      val edited =
        if (id % 21 == 1)
          AudioRow(id + 850000L, patternWav(id, swapSegs = Some((0, Segments - 1)))) :: Nil
        else Nil
      base ++ loud ++ edited
    }
  }

  /** Signed-PCM samples as raw ints (8 → [-128,127], 16 → int16) for
    * any payload the JDK sound stack opens — the integer twin of
    * `MediaCodec.pcmSamples` (which normalizes to double; the hash
    * needs exact integer squares). */
  private def pcmInts(payload: Array[Byte]): Option[Array[Int]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val bits = f.getSampleSizeInBits
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            (bits != 8 && bits != 16)) None
        else {
          val raw = in.readAllBytes()
          if (bits == 8) Some(raw.map(_.toInt))
          else {
            val n = raw.length / 2
            Some(Array.tabulate(n) { i =>
              if (f.isBigEndian) (raw(2 * i) << 8) | (raw(2 * i + 1) & 0xff)
              else (raw(2 * i + 1) << 8) | (raw(2 * i) & 0xff)
            })
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  // the 128-bit threshold compare is shared with the image member:
  // [[ImagePhash.gt128]] (energy cross-multiplication overflows int64
  // past ~13k samples/segment)
  import ImagePhash.gt128

  /** 48-bit energy-profile hash of decoded PCM. Integer-exact at any
    * clip length: per-segment sums of squared samples (Long — a
    * segment would need > 2³³ samples to overflow), compared by
    * 128-bit cross-multiplication against the global sum scaled by
    * segment counts (ragged tails carry ±1 samples, handled like
    * [[ImagePhash.aHash48]]'s uneven cells). */
  def aHash48(samples: Array[Int]): Long = {
    val n = samples.length
    val segSum = new Array[Long](Segments)
    val segN = new Array[Long](Segments)
    var i = 0
    while (i < n) {
      val b = (i.toLong * Segments / n).toInt
      val v = samples(i).toLong
      segSum(b) += v * v
      segN(b) += 1
      i += 1
    }
    val total = segSum.sum
    val totalN = segN.sum
    var hash = 0L
    var b = 0
    while (b < Segments) {
      if (segN(b) > 0 && gt128(segSum(b), totalN, total, segN(b))) hash |= 1L << b
      b += 1
    }
    hash
  }

  /** Decode + hash every audio row, partition-parallel. Undecodable
    * rows are dropped (surface them via [[Multimodal.extractMeta]]). */
  def ahashes(audio: Dataset[AudioRow]): Dataset[AudioHashRow] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions(rows => rows.flatMap { r =>
      pcmInts(r.payload).filter(_.nonEmpty)
        .map(s => AudioHashRow(r.media_id, s.length.toLong, aHash48(s)))
    })
  }
}
