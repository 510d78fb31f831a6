package graft.classify

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextFns

/** Corpus-level text classification and vocabulary statistics — the
  * "model-free modeling" layer of a training-data pipeline: a
  * multinomial Naive-Bayes scorer (the closed-form stand-in for a
  * fasttext-style quality/language classifier), frequency-ranked
  * vocabulary induction with a coverage cutoff, per-document
  * out-of-vocabulary rates, and per-source token-distribution drift.
  *
  * Every result is exact and engine-reproducible: integer counts stay
  * integers, ratios are compared cross-multiplied in the integer
  * domain, and the one genuinely transcendental quantity (the NB
  * log-likelihood) is built from per-(token,class) log terms rounded
  * to 9 decimals and summed as DECIMAL — an order-independent sum, so
  * the score is identical under any shuffle and matches a SQL oracle
  * computing the same rounded terms (cf. the rational-idf BM25 in
  * [[graft.retrieval.Retrieval]]).
  *
  * Scale shape (100 TB): the NB model is a (classes × vocab) grid —
  * vocabulary-sized, broadcast; scoring is a map-side broadcast join
  * over token occurrences plus ONE aggregation shuffle on
  * (doc, class). Vocabulary induction and drift aggregate to
  * vocabulary-sized frames (one (token[,class/source]) shuffle over
  * corpus tokens with map-side partial aggregation); the OOV pass
  * re-joins that tiny vocab broadcast, map-only. Nothing here carries
  * per-document state across documents.
  */
object TextClassify {

  /** One row per token occurrence: (idCol, labelCol, tok). */
  private def occurrences(docs: DataFrame, labelCol: String, textCol: String,
                          idCol: String): DataFrame =
    docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), col(labelCol),
        explode(TextFns.tokens(col(textCol))).as("tok"))

  /** A per-(token,class) NB log term rounded to 9 decimals as
    * DECIMAL(18,9): IEEE division of exact integers is reproducible,
    * `ln` may differ in the last ulp between libms, so the round to 9
    * decimals (half-up in both Spark and DuckDB) pins the value far
    * above ulp noise and the DECIMAL sum is order-independent.
    */
  private def logTerm(num: Column, den: Column): Column =
    round(log(num.cast("double") / den.cast("double")), 9)
      .cast(DecimalType(18, 9))

  /** A fitted NB model: `grid` = (c, tok, term DECIMAL(18,9)) — the
    * (class × vocab) table of smoothed per-token log terms — and
    * `priors` = (c, prior DECIMAL(18,9)). Both frames are
    * vocabulary-/class-sized: broadcastable regardless of corpus size.
    * Fit once on a labeled seed, apply to any frame (batch or a
    * micro-batch inside `foreachBatch` — the stream-static shape).
    */
  case class NBModel(grid: DataFrame, priors: DataFrame)

  /** Fit the multinomial-NB statistics (Laplace +1) on a labeled
    * corpus. Zero-count grid cells smooth to `ln(1/(T_c+V))`; tokens
    * outside the TRAINING vocabulary are absent from the grid and
    * contribute nothing at apply time (the standard vocabulary-model
    * contract; pair with [[oovRate]] to monitor how much evidence
    * out-of-vocab tokens discard).
    */
  def naiveBayesFit(docs: DataFrame, labelCol: String = "lang",
                    textCol: String = "text"): NBModel =
    fitOnOcc(docs,
      docs.filter(trim(col(textCol)) =!= "")
        .select(col(labelCol), explode(TextFns.tokens(col(textCol))).as("tok")),
      labelCol)

  /** [[naiveBayesFit]] from an ALREADY-tokenized occurrence frame
    * (must carry `labelCol` and `tok`; extra columns are ignored) —
    * the resubstitution paths build one occurrence expression and feed
    * the same (lazy) frame to fit AND scoring. `docs` is read only for
    * the document-count priors.
    */
  private def fitOnOcc(docs: DataFrame, occIn: DataFrame,
                       labelCol: String): NBModel = {
    val occ = occIn.select(col(labelCol), col("tok"))
    val vocab = occ.select(col("tok")).distinct()
    val vsz = vocab.agg(count(lit(1)).as("vsz"))
    val classTok = occ.groupBy(col(labelCol).as("c"), col("tok"))
      .agg(count(lit(1)).as("n_tc"))
    val classTot = occ.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("t_c"))
    val priors = docs.groupBy(col(labelCol).as("c"))
      .agg(count(lit(1)).as("d_c"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("d_all"))))
      .select(col("c"), logTerm(col("d_c"), col("d_all")).as("prior"))
    val grid = classTot.crossJoin(vocab).crossJoin(broadcast(vsz))
      .join(classTok, Seq("c", "tok"), "left")
      .select(col("c"), col("tok"),
        logTerm(coalesce(col("n_tc"), lit(0L)) + lit(1L),
          col("t_c") + col("vsz")).as("term"))
    NBModel(grid, priors)
  }

  /** Score `docs` against a fitted model: (idCol, `pred_label`,
    * `score`) — argmax class by `prior + Σ term`, ties on ascending
    * label, score rendered as DOUBLE from the exact DECIMAL sum.
    * Map-side broadcast joins + ONE (doc, class) aggregation shuffle.
    */
  def naiveBayesApply(docs: DataFrame, model: NBModel,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame =
    scoreOcc(docs.filter(trim(col(textCol)) =!= "")
        .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("tok")),
      Seq(idCol), model, idCol)

  /** Multinomial Naive Bayes with Laplace (+1) smoothing, trained and
    * scored on the same corpus (the resubstitution form — use
    * [[naiveBayesFit]] + [[naiveBayesApply]] to train on a curated
    * seed and score a different frame; the plan shape is identical).
    *
    * Output: (idCol, labelCol, `pred_label`, `score`) — the argmax
    * class by log-likelihood `ln P(c) + Σ_t ln P(t|c)` with
    * `P(t|c) = (n_tc + 1) / (T_c + V)`; ties break on ascending class
    * label. `score` is the winning log-likelihood as DOUBLE (an exact
    * DECIMAL(18,9)-termwise sum rendered as double at the end).
    *
    * Tokens unseen in the whole training corpus contribute the same
    * `ln(1/(T_c+V))` a vocabulary-grid model assigns any zero-count
    * token; here train==score so the case only arises for foreign
    * frames, and the grid covers it because the grid is built from the
    * scored corpus vocabulary.
    */
  def naiveBayesScore(docs: DataFrame, labelCol: String = "lang",
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    // train == score: the occurrence frame feeds the model statistics
    // and the scoring join LAZILY (each consumer re-runs the codegen'd
    // split+explode over the column-pruned scan). The r21 pin of this
    // frame was adjudicated at 10× in r22 (VERDICT item 4): the lazy
    // form wins at BOTH scales (sf0.1 −24%, 10× −35% same-window) —
    // caching the token-grain explosion costs more than re-running it.
    val occ = occurrences(docs, labelCol, textCol, idCol)
    scoreOcc(occ, Seq(idCol, labelCol), fitOnOcc(docs, occ, labelCol), idCol)
  }

  /** Shared scoring tail: occurrences × broadcast grid fan each token
    * occurrence out to its k class terms; ONE shuffle on
    * (carried keys, class); per-doc argmax window (k rows per doc).
    */
  private def scoreOcc(occ: DataFrame, keyCols: Seq[String], model: NBModel,
                       idCol: String): DataFrame = {
    val keys = keyCols.map(col)
    val scored = occ
      .join(broadcast(model.grid), Seq("tok"))
      .groupBy(keys :+ col("c"): _*)
      .agg(sum(col("term")).as("tsum"))
      .join(broadcast(model.priors), Seq("c"))
      .select(keys :+ col("c") :+ (col("prior") + col("tsum")).as("ll"): _*)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("ll").desc, col("c").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(keys :+ col("c").as("pred_label") :+
        col("ll").cast("double").as("score"): _*)
  }

  /** Selective-prediction risk–coverage table — the accept/abstain
    * tuning curve for a classifier gate: rank documents by prediction
    * CONFIDENCE (the log-likelihood margin between the best and
    * runner-up class), split the ranking into `buckets` equal coverage
    * bands, and report per-band and cumulative correctness. Reading
    * row k: "if the gate auto-accepts the top k/buckets most-confident
    * predictions, cum_correct/cum_docs is the accuracy it ships" —
    * the coverage-vs-risk trade a routing/abstention threshold is
    * actually chosen on (selective classification, El-Yaniv & Wiener's
    * risk–coverage formulation).
    *
    * Exactness contract: the margin `ll₁ − ll₂` is a difference of
    * two DECIMAL-exact log-likelihoods ([[naiveBayesScore]]'s pinned
    * 9-decimal terms — order-independent sums), so ranking and band
    * boundaries are bit-identical on any engine; band assignment is
    * integer math (`(rank−1)·buckets div n + 1` — sizes differ by at
    * most one, no NTILE implementation dependence). Ties in margin
    * break on ascending `idCol`. Docs with blank text carry no
    * evidence and are excluded (the [[naiveBayesScore]] contract);
    * every scored doc has all k class rows (the grid covers the full
    * class × vocab grid), so the runner-up always exists when k ≥ 2.
    *
    * Output, one row per band: (band, n_docs, n_correct, cum_docs,
    * cum_correct) — all BIGINT; readers form accuracy = n_correct /
    * n_docs and selective risk = 1 − cum_correct / cum_docs.
    *
    * Scale shape: broadcast-grid scoring + ONE (doc, class) shuffle
    * (the [[naiveBayesScore]] shape), a per-doc top-2 window (k rows
    * per doc), then the margin ranking routes through
    * [[graft.operators.Ranking.globalRowNumber]]'s range-partition
    * machinery — no single-task global window; the final cumulative
    * window runs on the `buckets`-row aggregate.
    */
  /** Per-doc NB decision frame shared by the two confidence audits
    * ([[selectiveRiskCoverage]], [[labelNoise]] — one construction,
    * they cannot drift): (idCol, labelCol, pred, ll1, ll2) — the
    * argmax class and the top-2 DECIMAL-exact log-likelihoods.
    */
  private def nbPerDoc(docs: DataFrame, labelCol: String,
                       textCol: String, idCol: String): DataFrame = {
    // train == score: the occurrence frame is consumed lazily by the
    // model statistics and the scoring join — the r21 pin was reverted
    // after the r22 10× adjudication (see naiveBayesScore)
    val occ = occurrences(docs, labelCol, textCol, idCol)
    val model = fitOnOcc(docs, occ, labelCol)
    val scored = occ
      .join(broadcast(model.grid), Seq("tok"))
      .groupBy(col(idCol), col(labelCol), col("c"))
      .agg(sum(col("term")).as("tsum"))
      .join(broadcast(model.priors), Seq("c"))
      .select(col(idCol), col(labelCol), col("c"),
        (col("prior") + col("tsum")).as("ll"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("ll").desc, col("c").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= 2)
      .groupBy(col(idCol), col(labelCol))
      .agg(max(when(col("_rn") === 1, col("c"))).as("pred"),
        max(when(col("_rn") === 1, col("ll"))).as("ll1"),
        max(when(col("_rn") === 2, col("ll"))).as("ll2"))
  }

  def selectiveRiskCoverage(docs: DataFrame, labelCol: String = "lang",
                            textCol: String = "text", idCol: String = "doc_id",
                            buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val perDoc = nbPerDoc(docs, labelCol, textCol, idCol)
      .select(col(idCol),
        (col("pred") === col(labelCol)).cast("long").as("correct"),
        (col("ll1") - col("ll2")).as("margin"))
    val n = broadcast(perDoc.agg(count(lit(1)).as("_n")))
    val banded = graft.operators.Ranking
      .globalRowNumber(perDoc, Seq(col("margin").desc, col(idCol)), out = "_rk")
      .crossJoin(n)
      .withColumn("band",
        expr(s"CAST(((_rk - 1) * $buckets) div _n + 1 AS BIGINT)"))
    val perBand = banded.groupBy(col("band"))
      .agg(count(lit(1)).as("n_docs"), sum(col("correct")).as("n_correct"))
    val cw = Window.orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // `buckets`-row frame: the unpartitioned window is bounded by design
    perBand
      .withColumn("cum_docs", sum(col("n_docs")).over(cw))
      .withColumn("cum_correct", sum(col("n_correct")).over(cw))
  }

  /** Label-noise candidates (confident-learning-lite): documents
    * whose GIVEN label disagrees with the NB prediction, ranked by
    * the exact top-2 log-likelihood margin — the most confidently
    * mislabeled rows first, the relabel/review queue every labeled
    * training set needs before the labels feed a model. Shares
    * [[nbPerDoc]] with [[selectiveRiskCoverage]] (the two audits
    * cannot drift). The margin ships as integer NANOS
    * ((ll1−ll2)·1e9 — the DECIMAL(·,9) scale made exact BIGINT, no
    * decimal output column, no float); ranking routes through the
    * distributed [[graft.operators.Ranking]] machinery, never a
    * single-task window; `topK` bounds the queue.
    */
  def labelNoise(docs: DataFrame, labelCol: String = "lang",
                 textCol: String = "text", idCol: String = "doc_id",
                 topK: Int = 100): DataFrame = {
    require(topK >= 1, s"labelNoise needs topK >= 1, got $topK")
    val disagree = nbPerDoc(docs, labelCol, textCol, idCol)
      .filter(col("pred") =!= col(labelCol))
      .select(col(idCol), col(labelCol).as("given_label"), col("pred"),
        ((col("ll1") - col("ll2")) * lit(1000000000L)).cast("long")
          .as("margin_nanos"))
    graft.operators.Ranking.globalRowNumber(disagree,
        Seq(col("margin_nanos").desc, col(idCol)), out = "rank")
      .filter(col("rank") <= topK)
      .select(col("rank"), col(idCol), col("given_label"), col("pred"),
        col("margin_nanos"))
  }

  /** Frequency-ranked vocabulary with a token-mass coverage cutoff.
    *
    * Output, one row per distinct token: (`tok`, `cnt`, `rank`,
    * `cum_cnt`, `in_vocab`) — rank by (count desc, token asc);
    * `in_vocab` marks the smallest rank prefix whose cumulative count
    * reaches `coveragePct` percent of total token mass (the token that
    * crosses the threshold is included). The test is cross-multiplied
    * in the integer domain — `(cum - cnt) * 100 < pct * total` — so no
    * ratio is ever materialized and the cut is exact.
    *
    * The ranking runs on the distinct-token frame (vocabulary-sized,
    * not the corpus) and is FULLY PARALLEL even when the raw-token
    * vocabulary itself is huge (web corpora: every typo and number is
    * a token): rank and cumulative count route through the
    * [[graft.operators.Ranking]] range-partition + broadcast-offset
    * machinery, never a single-partition global window.
    */
  def vocabInduce(docs: DataFrame, coveragePct: Int = 95,
                  textCol: String = "text"): DataFrame = {
    require(coveragePct >= 1 && coveragePct <= 100,
      s"coveragePct must be in [1,100], got $coveragePct")
    val cnts = docs.filter(trim(col(textCol)) =!= "")
      .select(explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val sort = Seq(col("cnt").desc, col("tok").asc)
    val ranked = graft.operators.Ranking.globalRunningSum(
      graft.operators.Ranking.globalRowNumber(cnts, sort, "rank"),
      col("cnt"), sort, "cum_cnt")
    ranked
      .crossJoin(broadcast(cnts.agg(sum(col("cnt")).as("total"))))
      .select(col("tok"), col("cnt"), col("rank"), col("cum_cnt"),
        ((col("cum_cnt") - col("cnt")) * 100 <
          lit(coveragePct.toLong) * col("total")).as("in_vocab"))
  }

  /** Per-document out-of-vocabulary counts against the
    * [[vocabInduce]]-induced vocabulary: (idCol, `n_tokens`, `n_oov`).
    * The vocabulary broadcasts; the scan is one map-side pass plus the
    * per-doc aggregation shuffle. Integers only.
    */
  def oovRate(docs: DataFrame, coveragePct: Int = 95,
              textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val vocab = vocabInduce(docs, coveragePct, textCol)
      .filter(col("in_vocab")).select(col("tok"))
    docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab.withColumn("_iv", lit(1L))), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_iv").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Bigram language-model scoring — the perplexity-proxy quality
    * filter of CCNet-descended pipelines: train add-one-smoothed
    * bigram statistics on a curated reference corpus (`train`), score
    * every document of `docs` by its total bigram log-likelihood
    *
    *   ll(d) = Σ_{(w1,w2) ∈ d} ln( (c(w1,w2) + 1) / (c1(w1) + V) )
    *
    * where `c` counts train bigrams, `c1` counts train bigram
    * PREFIXES (occurrences of w1 in positions 1..n-1), and V is the
    * train vocabulary size. Output: (idCol, `n_bigrams`,
    * `ll` DOUBLE, rendered from the order-independent DECIMAL(18,9)
    * term sum — engine-exact like [[naiveBayesScore]]). Rank by
    * ll/n_bigrams (per-token normalization) to filter gibberish /
    * boilerplate; docs with fewer than 2 tokens carry no evidence and
    * are excluded.
    *
    * Scale shape: the model is the train corpus's bigram table — a
    * curated reference set (the CCNet assumption), so it broadcasts;
    * unseen bigrams and unseen prefixes need no grid, just two
    * broadcast left joins with coalesce-to-zero. One aggregation
    * shuffle on the doc id.
    */
  def bigramScore(docs: DataFrame, train: DataFrame,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    bigramApply(docs, bigramFit(train, textCol), textCol, idCol)

  /** A fitted bigram LM: `c12` = (w1, w2, c12) bigram counts, `c1` =
    * (w1, c1) prefix counts, `vsz` = 1-row vocabulary size — all
    * train-corpus-sized (the curated-reference assumption), broadcast
    * at apply time. Fit once offline, apply to any frame including
    * micro-batches inside `foreachBatch`.
    */
  case class BigramModel(c12: DataFrame, c1: DataFrame, vsz: DataFrame)

  private def bigrams(d: DataFrame, textCol: String, cols: Column*): DataFrame = {
    val tk = TextFns.tokens(col(textCol))
    d.filter(trim(col(textCol)) =!= "")
      .select(cols :+ tk.as("_tk"): _*)
      .filter(size(col("_tk")) >= 2)
      .select(cols :+ explode(arrays_zip(
        slice(col("_tk"), lit(1), size(col("_tk")) - 1).as("w1"),
        slice(col("_tk"), lit(2), size(col("_tk")) - 1).as("w2"))).as("bg"): _*)
      .select(cols :+ col("bg.w1").as("w1") :+ col("bg.w2").as("w2"): _*)
  }

  /** Fit add-one-smoothed bigram statistics on a reference corpus. */
  def bigramFit(train: DataFrame, textCol: String = "text"): BigramModel = {
    val trainBg = bigrams(train, textCol)
    BigramModel(
      trainBg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12")),
      trainBg.groupBy(col("w1")).agg(count(lit(1)).as("c1")),
      train.filter(trim(col(textCol)) =!= "")
        .select(explode(TextFns.tokens(col(textCol))).as("tok"))
        .agg(countDistinct(col("tok")).as("vsz")))
  }

  /** Score `docs` against a fitted bigram model — see [[bigramScore]]
    * for the contract; unseen bigrams and prefixes coalesce to zero
    * counts, so no grid is needed.
    */
  def bigramApply(docs: DataFrame, model: BigramModel,
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame =
    bigrams(docs, textCol, col(idCol))
      .join(broadcast(model.c12), Seq("w1", "w2"), "left")
      .join(broadcast(model.c1), Seq("w1"), "left")
      .crossJoin(broadcast(model.vsz))
      .select(col(idCol),
        logTerm(coalesce(col("c12"), lit(0L)) + lit(1L),
          coalesce(col("c1"), lit(0L)) + col("vsz")).as("term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("term")).cast("double").as("ll"))

  /** Per-document character-distribution Shannon entropy (nats) — the
    * gibberish/boilerplate detector that complements length, stopword,
    * repetition, and compression-ratio signals: natural text sits in a
    * band, while `aaaa...` (low) and random bytes (high) fall outside.
    *
    * Output: (idCol, `len`, `entropy` DOUBLE) over all characters
    * (whitespace included). Computed by the engine-exact decomposition
    * `H = ln L − (Σ_c n_c·ln n_c)/L`: each `ln` of a small integer is
    * rounded to 9 decimals and carried as DECIMAL (order-independent
    * sum, same contract as the NB/bigram scorers), and the final two
    * float operations (decimal→double render, one division) are
    * IEEE-correctly-rounded — identical on any engine.
    *
    * Scale shape: one (doc, char) aggregation (alphabet-bounded per
    * doc) and one per-doc aggregation; no broadcast, no window.
    */
  def charEntropy(docs: DataFrame, textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val perChar = docs
      .select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .filter(col("ch") =!= "") // Spark's limit=-1 split keeps a trailing ""
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("n_c"))
    def d10(c: Column) = c.cast(DecimalType(10, 0))
    val lnDec = (c: Column) => round(log(c.cast("double")), 9)
      .cast(DecimalType(18, 9))
    perChar.groupBy(col(idCol))
      .agg(sum(col("n_c")).as("len"),
        // ≤ L·ln L per doc — DECIMAL(28,9) holds that exactly to
        // L = 10^10 characters (a 10 GB single document)
        sum(d10(col("n_c")) * lnDec(col("n_c")))
          .cast(DecimalType(28, 9)).as("_ent_num"))
      .select(col(idCol), col("len"),
        ((lnDec(col("len")) * d10(col("len")) - col("_ent_num"))
          .cast("double") / col("len").cast("double")).as("entropy"))
  }

  /** Per-group token-distribution drift from the whole corpus as an
    * EXACT scaled total-variation distance. For group g with token
    * counts n_tg (total T_g) against corpus counts n_t (total T):
    *
    *   TVD(g, corpus) = ½ Σ_t | n_tg/T_g − n_t/T |
    *                  = tvd_num / (2 · T_g · T)
    *
    * and the output carries the integer numerator
    * `tvd_num = Σ_t | n_tg·T − n_t·T_g |` plus `n_tokens` (T_g) and
    * `corpus_tokens` (T), so the distance is exact rational — no
    * float division anywhere, reproducible on any engine. Rank groups
    * by tvd_num/(T_g·T) to find sources whose token mix diverges most
    * (domain skew, scraper drift, template contamination).
    *
    * One (group, token) aggregation over corpus tokens (map-side
    * partial), then a broadcast join against the vocabulary-sized
    * corpus counts — OBSERVED (group, token) pairs only. A token
    * absent from a group contributes exactly `n_t·T_g`, so those
    * cells need never materialize:
    *
    *   tvd_num = Σ_{t∈g} |n_tg·T − n_t·T_g|  +  T_g · (T − Σ_{t∈g} n_t)
    *
    * (the closed form of the zero-cell tail). That keeps the frame at
    * the observed-pair count instead of a |groups|×|vocab| grid — at
    * corpus scale the grid is the dominant cost for sparse groups.
    *
    * The cross products run in DECIMAL — n_tg·T is a count times the
    * CORPUS total, which overflows Long (silently, in non-ANSI Spark)
    * once counts pass ~10^9·10^9; DECIMAL(18,0)×DECIMAL(19,0) keeps
    * every product exact during the sum. The final `tvd_num` is then
    * re-pinned on BIGINT: tvd_num ≤ 2·T_g·T ≤ 2·T², which fits int64
    * up to T ≈ 2·10^9 corpus tokens — four orders of magnitude above
    * the test scales, and the narrowest type both engines and the
    * driver's arrow hasher canonicalize identically (decimal128
    * outputs are the one surface the cross-engine hash gate has
    * rejected; see ContractSpec "no wide-decimal outputs"). For true
    * 100-TB corpora past 2·10^9 tokens, drop the final cast and emit
    * DECIMAL(38,0) — the internal arithmetic is already exact there.
    */
  def tokenDrift(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame = {
    val occ = docs.filter(trim(col(textCol)) =!= "")
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("tok"))
    val byGroupTok = occ.groupBy(col(groupCol), col("tok"))
      .agg(count(lit(1)).as("n_tg"))
    val byTok = occ.groupBy(col("tok")).agg(count(lit(1)).as("n_t"))
    val byGroup = occ.groupBy(col(groupCol)).agg(count(lit(1)).as("t_g"))
    val corpusTot = occ.agg(count(lit(1)).as("t_all"))
    def d18(c: Column) = c.cast(DecimalType(18, 0))
    def d19(c: Column) = c.cast(DecimalType(19, 0))
    // observed cells: Σ|n_tg·T − n_t·T_g| and Σ n_t over the group's vocab
    byGroupTok
      .join(broadcast(byTok), "tok")
      .join(broadcast(byGroup), groupCol)
      .crossJoin(broadcast(corpusTot))
      .groupBy(col(groupCol), col("t_g"), col("t_all"))
      .agg(
        sum(abs(d18(col("n_tg")) * d19(col("t_all")) -
          d18(col("n_t")) * d19(col("t_g")))).as("s_obs"),
        sum(col("n_t")).as("s_nt"))
      // + the zero-cell tail T_g·(T − Σ_{t∈g} n_t) in one exact product
      .select(col(groupCol), col("t_g").as("n_tokens"),
        col("t_all").as("corpus_tokens"),
        (col("s_obs") + d18(col("t_g")) * d19(col("t_all") - col("s_nt")))
          .cast("long").as("tvd_num"))
      // Loud enforcement of the documented int64 bound (mirrors the
      // logOddsTerms 2^53 guard): tvd_num ≤ 2·T², so the BIGINT
      // re-pin is exact iff T ≤ ~2.1·10^9 — past that the non-ANSI
      // cast would silently emit NULL tvd_num. assert_true returns
      // NULL on success, so the filter keeps every row.
      .filter(assert_true(col("corpus_tokens") <= lit(2147483647L),
        lit("tokenDrift: corpus_tokens exceeds ~2.1e9 — tvd_num no " +
          "longer fits BIGINT; drop the final cast and emit " +
          "DECIMAL(38,0) for corpora this large (internal math is " +
          "already exact)")).isNull)
  }

  /** Multi-signal quality gate with per-signal attribution — the
    * "why was this document dropped" report a curation team ships
    * next to the keep decision. Four signals, each individually
    * oracle-pinned elsewhere, combine into one weighted verdict:
    *
    *   - character entropy below `minEntropy` (gibberish / repeated
    *     glyphs)           → reasons bit 0, weight `weights._1`
    *   - duplicate-token share above `maxRepPct`% (template spam)
    *                        → reasons bit 1, weight `weights._2`
    *   - predicted language ≠ `allowedLang`
    *                        → reasons bit 2, weight `weights._3`
    *   - reference-LM mean bigram log-likelihood below `minAvgLl`
    *     (unnatural n-gram structure) → reasons bit 3, weight `weights._4`
    *
    * `keep` = total failed weight < `dropAt`, so one hard signal (or
    * several soft ones) drops a doc while any single soft signal only
    * flags it. `reasons` is the attribution bitmap; downstream
    * funnel reports aggregate it per bit.
    *
    * Cross-engine exactness: the entropy and ll doubles are the
    * engine-exact values of [[charEntropy]] / [[bigramScore]]
    * (decimal-pinned log terms, bit-identical on both engines), the
    * repetition test cross-multiplies integers, and the language test
    * is a string compare — every threshold comparison is deterministic
    * on both engines. Docs with no bigram evidence (< 2 tokens) pass
    * the LM signal (left join, null-safe — no evidence is not guilt).
    *
    * Scale shape: two map-only per-doc projections, the per-(doc,char)
    * entropy aggregate, and the broadcast-model bigram scorer, joined
    * on the doc key — all frames are corpus-sized but the joins are
    * equi-joins on the same key (AQE co-locates); nothing exceeds the
    * token grain the individual signals already pay.
    */
  def qualityGateMulti(docs: DataFrame, ref: DataFrame,
                       minEntropy: Double = 2.0,
                       maxRepPct: Long = 30,
                       allowedLang: String = "en",
                       minAvgLl: Double = -7.0,
                       weights: (Long, Long, Long, Long) = (4L, 2L, 1L, 3L),
                       dropAt: Long = 4L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    val ent = charEntropy(docs, textCol, idCol).select(col(idCol), col("entropy"))
    val repLang = docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("tk"),
        TextFns.langPredict(col(textCol)).as("lang_pred"))
      .select(col(idCol), size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"),
        col("lang_pred"))
    val ppl = bigramScore(docs, ref, textCol, idCol)
      .select(col(idCol), col("n_bigrams"), col("ll"))
    // repLang is the doc-complete spine (one row per input doc); the
    // entropy frame drops docs whose text yields no characters
    // (empty/whitespace-only), and those are exactly the docs the gate
    // must NOT lose — a missing entropy row FAILS the entropy signal
    // (null-safe default, mirroring the bigram signal's left join).
    val joined = repLang.join(ent, Seq(idCol), "left")
      .join(ppl, Seq(idCol), "left")
    val fEnt = coalesce(col("entropy") < lit(minEntropy), lit(true))
    val fRep = (col("n_tokens") - col("n_distinct")) * 100 >
      lit(maxRepPct) * col("n_tokens")
    val fLang = col("lang_pred") =!= lit(allowedLang)
    val fPpl = coalesce(col("ll") < lit(minAvgLl) * col("n_bigrams"), lit(false))
    def tagged(c: Column, v: Long) = when(c, lit(v)).otherwise(lit(0L))
    joined
      .withColumn("reasons", tagged(fEnt, 1L) + tagged(fRep, 2L) +
        tagged(fLang, 4L) + tagged(fPpl, 8L))
      .withColumn("fail_score", tagged(fEnt, weights._1) + tagged(fRep, weights._2) +
        tagged(fLang, weights._3) + tagged(fPpl, weights._4))
      .withColumn("keep", col("fail_score") < lit(dropAt))
  }

  /** Per-group distinctive terms by weighted log-odds with an
    * uninformative Dirichlet prior (Monroe/Colaresi/Quinn "Fightin'
    * Words", α_t = 1, α₀ = V) — the "what vocabulary characterizes
    * this source" report that TF-IDF gets wrong for grouped corpora
    * (document frequency says nothing about BETWEEN-group contrast):
    *
    *   δ_tg = ln( (y_tg + 1) / (n_g + V − y_tg − 1) )
    *        − ln( (y_t − y_tg + 1) / (n − n_g + V − (y_t − y_tg) − 1) )
    *
    * ln is monotone, so the δ ranking is EXACTLY the ranking of the
    * posterior odds ratio
    *
    *   R_tg = [(y_tg + 1) · (n − n_g + V − (y_t − y_tg) − 1)]
    *        / [(n_g + V − y_tg − 1) · (y_t − y_tg + 1)]
    *
    * whose numerator and denominator are EXACT integer products. We
    * pin those two BIGINTs (`odds_num`, `odds_den`) and their IEEE
    * quotient `odds_ratio` instead of the log: the division of two
    * exactly-representable integers (< 2^53) is correctly rounded,
    * hence bit-identical on every IEEE-754 engine — no libm call
    * whose last bit could differ between builds (the ln-based pin
    * this replaces was vulnerable to exactly that at the round(·,9)
    * boundary). Rank = row_number by `odds_ratio` DESC, term
    * tie-break; equal-rational ties collapse to equal doubles and
    * break on the term in both engines. Contract bound: products
    * must stay < 2^53 (corpora to ~9·10⁷ tokens) — ENFORCED by an
    * in-plan assert on n_all + v ≤ 94 906 265 (⇒ each factor, hence
    * sqrt of each product, is under 2^26.5), so violation fails the
    * job loudly instead of mis-ranking; above that, rank client-side
    * on the exact (num, den) pair by cross-multiplying in
    * DECIMAL(38) — δ itself needs no transcendental to order.
    *
    * Scale shape: two token aggregations (corpus-wide and per-group —
    * map-side partial combine) + vocabulary-sized joins + one
    * partitioned top-k window over the (groups × their vocab) frame;
    * no corpus-sized shuffle after the token counts.
    */
  def logOddsTerms(docs: DataFrame, groupCol: String = "source",
                   textCol: String = "text", topK: Int = 3): DataFrame = {
    require(topK >= 1, s"logOddsTerms needs topK >= 1, got $topK")
    val occ = docs.filter(trim(col(textCol)) =!= "")
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("tok"))
    val yTg = occ.groupBy(col(groupCol), col("tok")).agg(count(lit(1)).as("y_tg"))
    val yT = yTg.groupBy(col("tok")).agg(sum(col("y_tg")).as("y_t"))
    val nG = yTg.groupBy(col(groupCol)).agg(sum(col("y_tg")).as("n_g"))
    val nv = yT.agg(sum(col("y_t")).as("n_all"),
        count(lit(1)).cast("long").as("v"))
      // Loud enforcement of the 2^53 contract bound documented above:
      // every odds factor is ≤ n_all + v, so products stay exact in
      // a double iff (n_all+v)² < 2^53, i.e. n_all+v ≤ 94 906 265.
      // Past that, the IEEE-quotient ranking silently loses exactness
      // (and past 2^63 non-ANSI Long math wraps) — fail the job
      // instead, pointing at the DECIMAL cross-multiply escape hatch.
      // assert_true returns NULL on success, so the filter keeps the
      // row and cannot be optimized away.
      .filter(assert_true(col("n_all") + col("v") <= lit(94906265L),
        lit("logOddsTerms: corpus_tokens + vocab exceeds 94906265 — " +
          "integer odds products would pass 2^53 and the double " +
          "quotient ranking loses exactness; rank on the exact " +
          "(odds_num, odds_den) pair by DECIMAL(38) cross-" +
          "multiplication for corpora this large")).isNull)
    val scored = yTg
      .join(broadcast(yT), "tok")
      .join(broadcast(nG), groupCol)
      .crossJoin(broadcast(nv))
      .withColumn("odds_num",
        (col("y_tg") + 1) *
          (col("n_all") - col("n_g") + col("v") - (col("y_t") - col("y_tg")) - 1))
      .withColumn("odds_den",
        (col("n_g") + col("v") - col("y_tg") - 1) * (col("y_t") - col("y_tg") + 1))
      .withColumn("odds_ratio",
        col("odds_num").cast("double") / col("odds_den").cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("odds_ratio").desc, col("tok"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(groupCol), col("rank"), col("tok"),
        col("y_tg").as("n_in_group"), col("y_t").as("n_corpus"),
        col("odds_num"), col("odds_den"), col("odds_ratio"))
  }
}
