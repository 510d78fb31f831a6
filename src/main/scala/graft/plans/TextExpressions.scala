package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram shingle hashing: token array → array of 48-bit
  * md5-derived shingle hashes (`hash48(concat_ws(" ", t_i..t_{i+n-1}))`
  * for every position), in one pass per row.
  *
  * Replaces a `transform(sequence(...), i -> concat_ws(element_at...))`
  * + per-shingle `conv(substring(md5(...)))` chain: the HOF formulation
  * re-evaluates children per element and churns UTF8Strings, which made
  * the dedup pipelines the most CPU-steal-sensitive stage in the
  * engine. Values are IDENTICAL to the composed form (same md5, same
  * hex-prefix-to-long), so DuckDB oracles don't change.
  */
case class ShingleHash48(child: Expression, n: Expression, hexBytes: Int = 6)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = child
  override def right: Expression = n
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash48"

  override def nullSafeEval(arr: Any, nAny: Any): Any = {
    val tokens = arr.asInstanceOf[ArrayData]
    val ng = nAny.asInstanceOf[Int]
    val count = tokens.numElements()
    if (count < ng) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = Array.tabulate(count)(i => tokens.getUTF8String(i))
    val out = new Array[Long](count - ng + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= count - ng) {
      sb.setLength(0)
      var j = 0
      while (j < ng) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j).toString)
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 2*hexBytes hex digits, big-endian (12 hex = 48-bit default)
      var hv = 0L
      var b = 0
      while (b < hexBytes) {
        hv = (hv << 8) | (digest(b) & 0xffL)
        b += 1
      }
      out(i) = hv
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(child = newLeft, n = newRight)
}

/** One-pass MinHash signature: array of 32-bit shingle hashes → the k
  * per-permutation minima of (hv·a_i + b_i) mod p, computed with k
  * running accumulators in a single traversal. Replaces the
  * explode + groupBy(doc).agg(16 × min) formulation: signature
  * computation is per-document, so shuffling every (doc, shingle) pair
  * across the cluster — the largest intermediate in the dedup family —
  * buys nothing. Values are IDENTICAL (min over the same multiset under
  * the same permutations), so the DuckDB oracles don't change.
  *
  * NULL for an empty hash array (a doc too short to shingle has no
  * signature — mirrors the groupBy form, where such docs vanish).
  */
case class MinhashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(arr: Any): Any = {
    val hvs = arr.asInstanceOf[ArrayData]
    val n = hvs.numElements()
    if (n == 0) return null
    val out = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hv = hvs.getLong(i)
      var j = 0
      while (j < k) {
        val v = (hv * MinhashSig.permA(j) + MinhashSig.permB(j)) % MinhashSig.P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  /** Permutation family (a·h + b) mod p: p prime > 2^32; a, b small so
    * a·h stays far under 2^63 (identical arithmetic in any engine).
    * Single source of truth — `Dedup.perm` re-exports these.
    */
  val P = 4294967311L
  def permA(i: Int): Long = 41L * i + 7L
  def permB(i: Int): Long = 17L * i + 3L
}

/** Per-position forward sliding-window minimum over a long array:
  * out(i) = min(in(i .. min(i+w-1, n-1))) — the winnowing fingerprint
  * primitive. Map-only replacement for posexplode + a
  * `min over (partition by doc rows between current and w-1 following)`
  * window, which shuffled every (doc, position, hash) triple; the
  * minima only ever look inside one document's own array. Computed
  * right-to-left with a w-bounded scan (w is a small constant).
  */
case class SlidingMin(child: Expression, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(arr: Any): Any = {
    val hvs = arr.asInstanceOf[ArrayData]
    val n = hvs.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      var m = hvs.getLong(i)
      var j = i + 1
      val end = math.min(i + w, n)
      while (j < end) {
        val v = hvs.getLong(j)
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass 48-bit SimHash over a token array: md5-derived 48-bit hash
  * per token, ±1 vote per bit, positive-score bits set in the result.
  * Replaces the explode + groupBy(doc).agg(48 × conditional sum) form
  * for the same reason as [[MinhashSig]]: the votes are per-document,
  * so no shuffle is warranted. Integer vote sums are order-independent,
  * so values match the aggregated form (and the DuckDB oracle) exactly.
  */
case class SimHash48(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash48"

  override def nullSafeEval(arr: Any): Any = {
    val tokens = arr.asInstanceOf[ArrayData]
    val n = tokens.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val scores = new Array[Int](48)
    var i = 0
    while (i < n) {
      md.reset()
      val digest = md.digest(tokens.getUTF8String(i).getBytes)
      var hv = 0L
      var b = 0
      while (b < 6) { hv = (hv << 8) | (digest(b) & 0xffL); b += 1 }
      b = 0
      while (b < 48) {
        if (((hv >>> b) & 1L) == 1L) scores(b) += 1 else scores(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 48) { if (scores(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** zlib compression ratio of the UTF-8 text (compressed/raw bytes) —
  * the classic cheap repetitiveness signal for corpus curation:
  * boilerplate and template spam deflate far below natural prose.
  * Fixed deflate level → deterministic per JVM; there is no portable
  * cross-engine definition, so queries built on this are rows-only
  * checked and value-pinned in ScalaTest instead.
  */
case class DeflateRatio(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) return 1.0
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / bytes.length
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization (java.text.Normalizer, the canonical
  * composition form) — the corpus-cleaning primitive that folds
  * decomposed sequences (`e` + combining acute) into their precomposed
  * characters, so dedup/fingerprint keys don't split on encoding
  * provenance. Deterministic and engine-portable: DuckDB's
  * `nfc_normalize` is the oracle twin (both implement Unicode
  * normalization, a fully specified mapping).
  */
case class NfcNormalize(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: Normalizer.isNormalized is a cheap scan, and most real
    // corpus text is already NFC — skip the allocation for it
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
