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

  /** Learn `steps` merges; returns (step, c1, c2, pair_count). */
  def fitMerges(docs: DataFrame, steps: Int,
                textCol: String = "text"): DataFrame = {
    require(steps >= 1, s"fitMerges needs steps >= 1, got $steps")
    val words = docs.filter(trim(col(textCol)) =!= "")
      .select(explode(TextFns.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
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
      // greedy left-to-right application: fold each word's symbols;
      // a freshly merged symbol is longer than c1, so it can never
      // re-match as the left half in the same pass — exactly the
      // serial non-overlapping rule
      seqs = seqs.crossJoin(broadcast(best.select(col("c1"), col("c2"))))
        .select(col("freq"),
          aggregate(col("syms"), array().cast("array<string>"), (acc, x) =>
            when(size(acc) > 0 &&
                element_at(acc, -1) === col("c1") && x === col("c2"),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(concat(col("c1"), col("c2")))))
              .otherwise(concat(acc, array(x)))).as("syms"))
    }
    rules.result().reduce(_ unionByName _)
  }
}
