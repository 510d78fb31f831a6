package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus processing
  * (language ID, quality scoring, token counting, fingerprinting,
  * shingling, content hashing).
  *
  * Everything here is a pure `Column` expression built from codegen'd
  * builtins — no UDFs — so whole-stage codegen stays intact and the
  * ops scale linearly with the corpus on any number of executors.
  */
object TextFns {

  /** Whitespace tokenization (the BPE-ish regex split). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Lowercased tokens for normalization-sensitive ops. */
  def normTokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** n-gram shingles over an already-materialized token array column,
    * distinct. Empty array for docs shorter than n tokens (kept
    * deterministic — `sequence(1,0)` would descend).
    *
    * Callers MUST pass an attribute (a projected column), not the
    * `tokens(...)` expression inline: `element_at` inside the lambda
    * re-evaluates its array child per element, so an inline split
    * re-runs the regex ~3× per shingle position (measured 20× slowdown
    * on the dedup pipeline).
    */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*))))
      .otherwise(array().cast("array<string>"))

  /** Non-distinct positional shingles — for consumers where duplicate
    * shingles are harmless (MinHash: min over a multiset equals min
    * over the set) or deduped later by a shuffle (`groupBy` beats the
    * O(positions²) per-row `array_distinct` compare loop).
    */
  def shinglePositions(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(t, i + lit(j))): _*)))
      .otherwise(array().cast("array<string>"))

  /** Convenience one-shot form for single-use contexts (tests, per-doc
    * stats). Hot paths should project `tokens` first — see
    * [[shinglesOfTokens]].
    */
  def shingles(text: Column, n: Int): Column = shinglesOfTokens(tokens(text), n)

  /** Canonical dedup key: casefold, strip non-alphanumerics to
    * spaces, collapse whitespace, trim — the "fuzzy-exact"
    * normalization web-corpus pipelines dedupe on (case/punctuation/
    * spacing variants of the same text are one document). Pure
    * codegen'd builtins; mirror in SQL with regexp_replace(…,'g').
    */
  def normKey(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** First 8 md5 hex digits as an unsigned 32-bit value in a long —
    * a portable deterministic string hash (same value is derivable in
    * any engine with md5, unlike xxhash/murmur variants).
    */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 48-bit variant for simhash bit budgets. */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Native one-pass shingle hashing (tokens array → array of md5-
    * derived shingle hashes). Values identical to
    * `hashNN(concat_ws(" ", shingle))` but computed in a tight loop —
    * see [[graft.plans.ShingleHash48]].
    */
  def shingleHashes48(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ShingleHash48(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens),
        org.apache.spark.sql.catalyst.expressions.Literal(n), hexBytes = 6))

  def shingleHashes32(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.ShingleHash48(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens),
        org.apache.spark.sql.catalyst.expressions.Literal(n), hexBytes = 4))

  /** One-pass k-permutation MinHash signature of the n-gram shingle
    * hashes (array<long> of k minima; NULL when too short to shingle).
    */
  def minhashSig(tokens: Column, n: Int, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.MinhashSig(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(shingleHashes32(tokens, n)), k))

  /** Forward sliding-window minima of a long array (winnowing). */
  def slidingMin(hashes: Column, w: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.SlidingMin(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashes), w))

  /** One-pass 48-bit simhash of the token array (NULL for empty). */
  def simhash48(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.SimHash48(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(tokens)))

  /** zlib compression ratio (compressed/raw) — repetitiveness signal;
    * see [[graft.plans.DeflateRatio]] for determinism caveats.
    */
  def deflateRatio(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.DeflateRatio(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  /** Unicode NFC normalization — folds decomposed sequences into their
    * precomposed characters so dedup/fingerprint keys don't split on
    * encoding provenance ([[graft.plans.NfcNormalize]]).
    */
  def nfcNormalize(text: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.NfcNormalize(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(text)))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in")

  /** Count of stopword tokens (quality signal). */
  def stopwordCount(text: Column): Column =
    size(filter(normTokens(text), tk => tk.isin(stopwords: _*)))

  /** Count of sentence punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Heuristic language scores: matches of per-language stopword
    * regexes. [[langPredict]] picks the argmax (ties → English).
    */
  def englishHits(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("\\b(the|a|and|of|to|in|is)\\b"), lit(0)))

  def spanishHits(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("\\b(el|la|de|los|y|en|que)\\b"), lit(0)))

  def langPredict(text: Column): Column =
    when(englishHits(text) >= spanishHits(text), "en").otherwise("es")

  /** Order-insensitive document fingerprint: md5 over the sorted
    * distinct lowercased token set. Near-identical bags of words
    * collide — a cheap dedup key one level fuzzier than exact-text.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(normTokens(text)))))
}
