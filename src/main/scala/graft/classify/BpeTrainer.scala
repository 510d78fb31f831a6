package graft.classify

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Distributed byte-pair-encoding merge training (Sennrich et al.) —
  * the tokenizer-induction step of a training-data pipeline: learn
  * the `steps` highest-frequency adjacent-symbol merges over the
  * corpus, exactly as serial BPE would.
  *
  * Semantics (pinned by the oracle and spec):
  *  - symbols start as single characters of whitespace words; pair
  *    counts weight by corpus word frequency and count EVERY adjacent
  *    position (overlaps included — "aaa" holds two (a,a) pairs);
  *  - the best pair per step is (count desc, c1 asc, c2 asc) — fully
  *    deterministic ties;
  *  - a merge applies greedily LEFT-TO-RIGHT within each word
  *    ("aaa" + (a,a) → [aa, a]), the reference-implementation rule;
  *  - merged symbols are identified by their string (so two
  *    derivations of the same string unify) — the standard
  *    string-keyed table form.
  *
  * Scale shape: the corpus collapses to the DISTINCT-WORD frame
  * (vocabulary-sized) after one token aggregation — every subsequent
  * step is one pair-count aggregation + a 1-row top-1 broadcast + a
  * map-side higher-order fold over the symbol arrays. The corpus is
  * read once no matter how many merges; each step's shuffle is
  * vocabulary-sized. The greedy merge itself is the codegen'd
  * `aggregate` lambda — O(word length) per word, no explode back to
  * position grain.
  */
object BpeTrainer {

  import org.apache.spark.sql.Column

  /** Greedy left-to-right application of one merge (c1, c2) to a
    * symbol-array column: fold the array; a position merges with its
    * predecessor iff the predecessor is exactly c1 and it is exactly
    * c2 — a freshly merged symbol is longer than c1, so it can never
    * re-match as the left half in the same pass, which is exactly the
    * serial non-overlapping rule. Shared by training (c1/c2 are the
    * broadcast argmax row's columns) and encoding (literals).
    */
  private[classify] def applyMerge(syms: Column, c1: Column, c2: Column): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 &&
          element_at(acc, -1) === c1 && x === c2,
        concat(slice(acc, lit(1), size(acc) - 1),
          array(concat(c1, c2))))
        .otherwise(concat(acc, array(x))))

  /** The distinct-word frame with corpus frequencies: (w, freq). */
  private def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(trim(col(textCol)) =!= "")
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** ENCODE under a learned tokenizer: apply an ordered merge list to
    * the corpus and return the encoded distinct-word frame
    * (w, freq, syms) — the input to token counting, vocabulary audits
    * and per-source token budgets.
    *
    * The merge list is driver-side (control-grain: tokenizer merge
    * tables are tiny next to the corpus — collect the
    * [[fitMerges]] output, or supply a pre-trained table). Scale
    * shape: ONE corpus pass collapses to the vocabulary-sized
    * distinct-word frame, then every merge is a map-side array fold —
    * no shuffle per merge, no explode back to position grain; the
    * corpus is read once no matter how many merges.
    */
  def encodeWords(docs: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text"): DataFrame =
    encodeFreqs(wordFreqs(docs, textCol), merges)

  /** [[encodeWords]] over a precomputed (w, freq) frame — callers that
    * already hold a word-frequency aggregation (e.g. a per-source one
    * re-aggregated to the corpus grain) skip the second corpus pass.
    */
  def encodeFreqs(words: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(col("w"), col("freq"),
        filter(split(col("w"), ""), c => c =!= "").as("syms"))) {
      case (seqs, (c1, c2)) =>
        seqs.select(col("w"), col("freq"),
          applyMerge(col("syms"), lit(c1), lit(c2)).as("syms"))
    }

  /** Learn `steps` merges; returns (step, c1, c2, pair_count). */
  def fitMerges(docs: DataFrame, steps: Int,
                textCol: String = "text"): DataFrame =
    fitMergesOnFreqs(wordFreqs(docs, textCol), steps)

  /** [[fitMerges]] over a precomputed (w, freq) frame. */
  def fitMergesOnFreqs(words: DataFrame, steps: Int): DataFrame = {
    require(steps >= 1, s"fitMergesOnFreqs needs steps >= 1, got $steps")
    var seqs = words.select(col("freq"),
      filter(split(col("w"), ""), c => c =!= "").as("syms"))
    val rules = Seq.newBuilder[DataFrame]
    for (step <- 1 to steps) {
      val pairs = graft.util.CacheScope.pin(
        seqs.filter(size(col("syms")) >= 2)
          .select(col("freq"),
            explode(transform(sequence(lit(1), size(col("syms")) - 1), i =>
              struct(element_at(col("syms"), i).as("c1"),
                element_at(col("syms"), i + 1).as("c2")))).as("p"))
          .groupBy(col("p.c1").as("c1"), col("p.c2").as("c2"))
          .agg(sum(col("freq")).as("pair_count")))
      val best = pairs
        .orderBy(col("pair_count").desc, col("c1"), col("c2")).limit(1)
      rules += best.select(lit(step.toLong).as("step"),
        col("c1"), col("c2"), col("pair_count"))
      seqs = seqs.crossJoin(broadcast(best.select(col("c1"), col("c2"))))
        .select(col("freq"),
          applyMerge(col("syms"), col("c1"), col("c2")).as("syms"))
    }
    rules.result().reduce(_ unionByName _)
  }
}
