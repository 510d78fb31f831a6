package graft.export

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Per-source dataset card — the one-frame summary a dataset release
  * ships next to the data: corpus size, token budget, language mix,
  * duplication rate, and PII exposure, per source. Every number here
  * is a component signal the suite already computes (and oracle-pins)
  * as its own query — `q_corpus_stats`, `q_lang_id`, `q_dedup_exact`,
  * `q_pii_report` — assembled into the single per-source row a card
  * template consumes, and exported as a hash-manifested JSONL artifact
  * through the same machinery as the corpus itself
  * ([[CorpusExport]] — byte-identical re-export, atomic publish).
  *
  * Every counter is an exact BIGINT (counts and integer sums only —
  * no float aggregate, no decimal column), so the card is
  * engine-reproducible bit-for-bit.
  *
  * Scale shape: ONE aggregation pass over the corpus, shuffled on the
  * source key (map-side partial aggregation for every counter;
  * `n_exact_dups`' distinct runs over the 48-bit text hash — the
  * two-phase distinct shuffles 8-byte keys instead of full document
  * bytes, which at 100 TB is the difference between a counter and a
  * second corpus shuffle; the count is an ESTIMATE that undercounts
  * one dup per 48-bit collision, negligible below ~2^24 distinct
  * texts per source and bounded above it). The output is |sources|
  * rows.
  *
  * Reference analog: none — beyond-parity curation-reporting family.
  */
object DatasetCard {

  /** Assemble the per-source card frame. Output columns (all BIGINT
    * beside the source key): n_docs, n_tokens, n_bytes, n_empty,
    * n_exact_dups (docs minus distinct text hashes — the
    * within-source verbatim-duplicate count), n_lang_en (language-ID heuristic),
    * n_urls / n_emails / n_phones / n_docs_with_pii (the
    * `q_pii_report` detector family, emails counted on URL-scrubbed
    * text exactly like the scrubber applies them).
    */
  def build(docs: DataFrame, sourceCol: String = "source",
            textCol: String = "text"): DataFrame = {
    val text = col(textCol)
    val nUrl = size(regexp_extract_all(text, lit("https?://\\S+"), lit(0))).cast("long")
    val noUrl = regexp_replace(text, "https?://\\S+", "<URL>")
    val nEmail = size(regexp_extract_all(noUrl,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))).cast("long")
    val nPhone = size(regexp_extract_all(text,
      lit("\\d{3}-\\d{3}-\\d{4}"), lit(0))).cast("long")
    docs.groupBy(col(sourceCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextFns.tokenCount(text).cast("long")).as("n_tokens"),
        sum(octet_length(text).cast("long")).as("n_bytes"),
        sum((trim(text) === "").cast("long")).as("n_empty"),
        (count(lit(1)) - countDistinct(TextFns.hash48(text))).as("n_exact_dups"),
        sum((TextFns.langPredict(text) === "en").cast("long")).as("n_lang_en"),
        sum(nUrl).as("n_urls"),
        sum(nEmail).as("n_emails"),
        sum(nPhone).as("n_phones"),
        sum((nUrl + nEmail + nPhone > 0).cast("long")).as("n_docs_with_pii"))
  }

  /** Publish the card as a single hash-manifested JSONL shard (the
    * form card tooling and dashboards consume directly), through
    * [[CorpusExport]]: pinned source order, byte-identical re-export,
    * atomic manifest-last publish.
    */
  def export(card: DataFrame, dir: String, overwrite: Boolean = false): ExportManifest =
    CorpusExport.write(card, dir, shards = 1,
      sortCols = Seq(col("source")), overwrite = overwrite, format = "jsonl")
}
