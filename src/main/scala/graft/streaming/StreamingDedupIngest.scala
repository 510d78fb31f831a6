package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.Dedup

/** Continuous corpus ingestion with an optional quality gate and
  * near-dup filtering against ALL previously admitted documents — the
  * streaming twin of [[graft.curation.Curation]]'s batch funnel.
  *
  * The dedup state is deliberately NOT stream state: it is the
  * persistent LSH band index (parquet, one leaf dir per micro-batch).
  * At corpus scale that index is orders of magnitude too big for any
  * state store, but as a plain table it equi-joins each batch in
  * O(batch + collisions). Per batch:
  *
  *   1. map-only minhash signatures for the batch;
  *   2. within-batch near-dup drop (LSH banding, min-id-wins);
  *   3. batch-vs-index band match → drop docs already represented;
  *   4. append the survivors + their band keys, each to a
  *      batch-scoped leaf (`batch_id=<n>`), so a replayed micro-batch
  *      overwrites its own leaves — idempotent under restart.
  *
  * Docs too short to shingle have no signature and are admitted
  * unconditionally (the same contract as the batch dedup family).
  *
  * Every `compactEvery` batches the batch-scoped leaves older than the
  * replay horizon are folded into one consolidated segment (a fresh
  * negative `batch_id`), so a long-running stream holds a bounded
  * number of leaf directories instead of one per micro-batch — the same
  * file-count cure the catalog applies to its NDJSON appends. Only
  * committed batches (id < the batch being processed) are folded, so a
  * replayed micro-batch still overwrites its own, un-folded leaves.
  *
  * @param classGate admit only documents whose
  *   [[graft.classify.TextClassify.naiveBayesApply]] prediction under
  *   the (offline-fitted, broadcastable) model is in the allowed label
  *   set — the in-stream form of the fasttext-style language/quality
  *   gate. A document with no in-vocabulary token carries no evidence
  *   and is rejected. Applied after the quality gate, before dedup
  *   (cheap map-side drops first, signature work last).
  * @param decontGate eval/blocklist documents (doc_id, text): a
  *   micro-batch document sharing any `decontNgram`-gram with this set
  *   is rejected — in-stream eval-set decontamination. The eval set is
  *   static for the stream's lifetime, so its distinct gram hashes are
  *   checkpointed once and its bloom sketch is built once at
  *   construction (one Spark job); per batch the corpus side probes
  *   the sketch literal map-side and only sketch-positives reach the
  *   exact confirm join — the [[graft.curation.Curation.decontaminateBloom]]
  *   shape without per-batch sketch rebuilds.
  * @param noveltyGate when Some(maxSeenPct), drop documents whose
  *   `noveltyNgram`-grams are more than maxSeenPct% already present in
  *   the admitted corpus's persistent gram index
  *   ([[graft.dedup.Dedup.incrementalNovelty]]) — exact-substring-level
  *   redundancy control the LSH near-dup step cannot see (a doc
  *   stitched from previously-admitted spans is not a near-dup of any
  *   single admitted doc). The gram index is a third parquet store
  *   (`gram_index/batch_id=<n>` leaves, folded by the same compaction),
  *   NOT stream state; docs too short to gram pass. Applied between
  *   decontamination and dedup. Coverage is total once a gate-ON
  *   construction has run: enabling the gate over a corpus ingested
  *   without it backfills the whole index from the admitted store at
  *   construction; once the store exists, every admitted batch writes
  *   its grams even while the gate is OFF (so an on→off→on flip
  *   leaves no unindexed gap); any positive admitted leaf still
  *   missing its gram twin (a pre-gap-fix ingest) is re-indexed at
  *   construction by leaf-id compare; and a store with no coverage
  *   marker (predating the always-write rule — its gaps may already
  *   be folded into consolidated segments, invisible to leaf
  *   compares) is fully rebuilt from the admitted corpus once.
  * @param ledger when true, every batch writes a per-doc disposition
  *   frame — (doc_id, stage-that-dropped-it | 'admitted') — to
  *   `ledger/batch_id=<n>`, the streaming twin of the batch funnel's
  *   per-doc audit (`q_funnel_ledger`). Read via [[ledgerFrame]] or
  *   the API server's `/streams/ledger` pane. Costs one checkpoint
  *   per gate stage plus one batch-sized write; off by default.
  */
class StreamingDedupIngest(spark: SparkSession, workDir: String,
                           simThreshold: Double = 0.9,
                           quality: Option[graft.curation.Curation.Config] = None,
                           compactEvery: Int = 16,
                           segmentFiles: Int = 8,
                           classGate: Option[(graft.classify.TextClassify.NBModel, Set[String])] = None,
                           decontGate: Option[DataFrame] = None,
                           decontNgram: Int = 8,
                           decontNumBits: Long = 1L << 23,
                           decontBroadcastConfirm: Boolean = true,
                           noveltyGate: Option[Int] = None,
                           noveltyNgram: Int = 8,
                           ledger: Boolean = false) {

  private val indexDir = s"$workDir/band_index"
  private val admittedDir = s"$workDir/admitted"
  private val gramDir = s"$workDir/gram_index"
  private val ledgerDir = s"$workDir/ledger"

  private def gramHashes(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(array_distinct(
      graft.functions.TextFns.shingleHashes48(
        graft.functions.TextFns.tokens(col("text")), decontNgram))).as("hv"))

  // eval-set decontamination state, built ONCE for the stream: the
  // checkpointed distinct gram-hash set and its bloom sketch
  private val decontState: Option[(Array[Byte], DataFrame)] = decontGate.map { ev =>
    val evalH = gramHashes(ev.select(col("doc_id"), col("text")))
      .select(col("hv")).distinct().localCheckpoint()
    val items = math.max(1L, evalH.count())
    (graft.sketch.Bloom.sketch(evalH, col("hv"), items, decontNumBits), evalH)
  }

  // First-enable backfill: turning the novelty gate on over a corpus
  // ingested WITHOUT it (admitted docs exist, gram index doesn't) used
  // to leave every previously admitted doc's grams out of the index —
  // span-stitched redundancy against the older corpus silently passed
  // the gate. Build the missing index from the admitted store once, at
  // construction, into a consolidated-segment leaf (negative id, so a
  // replayed batch 0 can't overwrite it).
  // Coverage marker: records that the gram store was built (or
  // rebuilt) under the always-write rule, so every admitted doc's
  // grams are in the index. A store WITHOUT it predates the rule (or
  // the marker), and its unindexed off-period batches may already be
  // folded into a negative consolidated segment — invisible to any
  // leaf-id compare — so the only sound repair is a full rebuild.
  // Underscore-prefixed, so parquet readers of gramDir ignore it.
  private val gramCoverageMarker = Paths.get(gramDir, "_coverage_v1")
  private def touchCoverageMarker(): Unit =
    if (!Files.exists(gramCoverageMarker)) {
      try Files.createFile(gramCoverageMarker)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
  if (noveltyGate.isDefined && !Files.isDirectory(Paths.get(gramDir))
      && Files.isDirectory(Paths.get(admittedDir))) {
    val corpus = spark.read.parquet(admittedDir).dropDuplicates("doc_id")
    Dedup.gramIndex(corpus, noveltyNgram)
      .write.mode("overwrite").parquet(s"$gramDir/batch_id=-1")
    touchCoverageMarker()
  }
  // Legacy rebuild: a gram store with no coverage marker may hide a
  // pre-always-write gap that compaction already folded away (the
  // off-period batches are no longer distinguishable leaves, so the
  // leaf-id backfill below cannot see them). Rebuild the whole index
  // from the admitted corpus ONCE, then mark. Crash windows self-heal:
  // a crash after the delete leaves gramDir absent, and the absent-dir
  // full backfill above rebuilds at the next construction.
  if (noveltyGate.isDefined && Files.isDirectory(Paths.get(gramDir))
      && !Files.exists(gramCoverageMarker)
      && Files.isDirectory(Paths.get(admittedDir))) {
    val tmp = Paths.get(workDir, ".gram_rebuild_tmp")
    deleteTree(tmp)
    Dedup.gramIndex(spark.read.parquet(admittedDir).dropDuplicates("doc_id"), noveltyNgram)
      .write.mode("overwrite").parquet(tmp.toString)
    deleteTree(Paths.get(gramDir))
    Files.createDirectories(Paths.get(gramDir))
    Files.move(tmp, Paths.get(gramDir, "batch_id=-1"),
      StandardCopyOption.ATOMIC_MOVE)
    touchCoverageMarker()
  }
  // Gap backfill: a gate on→off→on sequence under the pre-r16 writer
  // (grams written only while the gate was ON) left the off-period's
  // admitted batches unindexed — their leaves exist in the admitted
  // store but have no gram_index twin. Re-index exactly those leaves
  // at construction (leaf-id compare, positive ids only — negative
  // consolidated segments fold BOTH stores at the same horizon once
  // the always-write rule holds, and a not-yet-folded legacy gap is
  // exactly a positive leaf; the already-folded legacy case is the
  // marker rebuild above).
  if (noveltyGate.isDefined && Files.isDirectory(Paths.get(gramDir))
      && Files.isDirectory(Paths.get(admittedDir))) {
    val gramIds = leaves(gramDir).map(_._1).toSet
    leaves(admittedDir)
      .filter { case (id, _) => id >= 0 && !gramIds.contains(id) }
      .foreach { case (id, p) =>
        Dedup.gramIndex(spark.read.parquet(p.toString), noveltyNgram)
          .write.mode("overwrite").parquet(s"$gramDir/batch_id=$id")
      }
  }

  // `exclude` skips ONE leaf id: [[processBatch]] passes its own batch
  // id so a foreachBatch REPLAY of an already-committed batch (sink
  // committed, checkpoint not) never probes its own earlier leaf —
  // with the self-leaf visible, every previously-admitted doc would
  // drop against its own index rows (novelty: own grams all "seen";
  // LSH: own bands at sim 1.0), corrupting the rewritten ledger, and a
  // TORN first leaf write would make the replay overwrite the leaf
  // with only the not-yet-written docs — silent loss. Excluding it
  // makes the replay's decisions, ledger, and leaf overwrites
  // identical to the original run. A to-be-replayed leaf is never
  // inside a consolidated segment: the in-stream compact folds only
  // ids below the CURRENT batch, and a later batch existing implies
  // this batch's checkpoint committed. (The batch_id partition column
  // is not selected — it would collide with bandMatches' batch-side
  // alias.)
  private def readIndex(exclude: Long = Long.MinValue): Option[DataFrame] = {
    val ls = leaves(indexDir).filter(_._1 != exclude)
    if (ls.isEmpty) None
    else Some(spark.read.parquet(ls.map(_._2.toString): _*)
      .select(col("corpus_id"), col("band_id"), col("band_hash")))
  }

  private def readGramIndex(exclude: Long = Long.MinValue): Option[DataFrame] = {
    val ls = leaves(gramDir).filter(_._1 != exclude)
    if (ls.isEmpty) None
    else Some(spark.read.parquet(ls.map(_._2.toString): _*).select(col("hv")))
  }

  /** The admitted corpus so far (empty before the first batch). Deduped
    * by doc_id: in the window between a crash mid-compaction and the
    * next fold, a doc can exist in both the consolidated segment and a
    * not-yet-deleted original leaf.
    */
  def admitted(): Option[DataFrame] =
    if (Files.isDirectory(Paths.get(admittedDir)))
      Some(spark.read.parquet(admittedDir).dropDuplicates("doc_id"))
    else None

  private def leaves(dir: String): List[(Long, Path)] =
    if (!Files.isDirectory(Paths.get(dir))) Nil
    else {
      val s = Files.list(Paths.get(dir))
      try s.iterator().asScala.toList.flatMap { p =>
        val name = p.getFileName.toString
        if (name.startsWith("batch_id="))
          scala.util.Try(name.stripPrefix("batch_id=").toLong).toOption.map(_ -> p)
        else None
      } finally s.close()
    }

  private def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally s.close()
    }

  /** Fold every leaf with id < `horizon` (batch leaves AND any previous
    * consolidated segment, whose ids are negative) into a fresh segment.
    *
    * Crash-atomic by construction: the fold is written to a temp dir
    * OUTSIDE the store (readers never see it), then moved — one atomic
    * rename — into a segment name that does not exist yet (`-horizon`,
    * or the next free negative id when a replayed boundary batch
    * re-folds the same horizon). Only after the move do the folded
    * source leaves get deleted, so EVERY crash point leaves the store
    * holding a complete superset of the admitted corpus / band index:
    * crash before the move leaves the old layout (plus an orphan temp
    * dir, swept at the start of the next fold); crash mid-cleanup
    * leaves the new segment plus stale leaves whose rows it already
    * contains. Superset duplicates are removed by the `dropDuplicates`
    * of the NEXT fold and never affect dedup decisions in between
    * (band matches feed `left_anti` joins; `admitted()` dedups).
    */
  private def foldLeaves(dir: String, horizon: Long, keyCols: Seq[String]): Unit = {
    val tmp = Paths.get(workDir, s".compact_tmp_${Paths.get(dir).getFileName}")
    deleteTree(tmp) // sweep an orphan from any earlier crash, even if nothing folds
    val fold = leaves(dir).filter { case (id, _) => id < horizon }
    if (fold.size < 2) return
    spark.read.parquet(fold.map(_._2.toString): _*)
      .dropDuplicates(keyCols)
      .coalesce(segmentFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    // every candidate id is < horizon, so colliding names can only be in
    // `fold` — checking those ids suffices to find a fresh one
    val taken = fold.map(_._1).toSet
    val segId = Iterator.iterate(-horizon)(_ - 1L).dropWhile(taken.contains).next()
    Files.move(tmp, Paths.get(dir, s"batch_id=$segId"), StandardCopyOption.ATOMIC_MOVE)
    fold.foreach { case (_, p) => deleteTree(p) }
  }

  /** Compact both stores up to `horizon` (exclusive). `horizon` must be
    * positive (batch ids start at 0; consolidated segments are negative)
    * and at or below the oldest batch that could still be replayed —
    * `processBatch` auto-calls it with the current batch id, which
    * Structured Streaming guarantees has all predecessors committed.
    * Non-positive horizons are a no-op: the fresh-segment-id search
    * starts at `-horizon`, so a `horizon <= 0` could collide a fold
    * with a real batch leaf.
    */
  def compact(horizon: Long): Unit = if (horizon > 0) {
    foldLeaves(indexDir, horizon, Seq("corpus_id", "band_id", "band_hash"))
    foldLeaves(admittedDir, horizon, Seq("doc_id"))
    // fold the gram store whenever it EXISTS (not only when the gate is
    // currently on): a stream restarted with the gate off would
    // otherwise leave the old index's leaves unfolded forever
    if (Files.isDirectory(Paths.get(gramDir)))
      foldLeaves(gramDir, horizon, Seq("hv"))
    if (Files.isDirectory(Paths.get(ledgerDir)))
      foldLeaves(ledgerDir, horizon, Seq("ledger_batch_id", "doc_id"))
  }

  /** The per-batch disposition ledger (None until the first ledgered
    * batch): (batch_id, doc_id, stage, admitted) — one row per input
    * doc per batch, `stage` naming the gate that dropped it or
    * 'admitted'. Deduped like [[admitted]] for the crash-superset
    * window.
    */
  def ledgerFrame(): Option[DataFrame] =
    StreamingDedupIngest.readLedger(spark, workDir)

  /** Roll the per-doc disposition ledger up into the run catalog — the
    * closing of the observability loop: batch pipelines record their
    * step rows-affected in the catalog, and a ledgered streaming
    * ingest records its funnel the SAME way, as one catalog run whose
    * steps are the funnel stages in pipeline order with
    * `rows_affected` = docs disposed at that stage (drops per gate,
    * survivors at 'admitted'). `GET /runs/:id` then serves the ingest
    * funnel next to batch step rows with no new contract. None when
    * no ledger exists (ingest ran with `ledger = false`).
    *
    * The rollup aggregates the (compaction-folded, replay-idempotent)
    * ledger once per call — call it at a reporting cadence, not per
    * batch; each call records one run snapshot of cumulative counts.
    * The collect is |stages| rows (≤ 7), never doc-grain.
    */
  def recordToCatalog(catalog: graft.catalog.RunCatalog,
                      pipelineName: String = "streaming-ingest"): Option[String] =
    ledgerFrame().map { led =>
      val counts = led.groupBy(col("stage")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val runId = catalog.startRunWithSteps(pipelineName, StreamingDedupIngest.FunnelStages)
      StreamingDedupIngest.FunnelStages.zipWithIndex.foreach { case (st, i) =>
        catalog.updateStepNamed(runId, i + 1, st, "Success", counts.getOrElse(st, 0L))
      }
      catalog.finishRun(runId, "Success")
      runId
    }

  private[graft] def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) compact(batchId)
    if (batch.isEmpty) return
    // Dedup's internal cache()s must be released on EVERY exit path —
    // an all-duplicate batch that returned early used to leak one
    // cached signature frame per micro-batch on a long-running stream.
    // The loan releases exactly this batch's pins, so a user's own
    // cached frames in the same session survive (clearCache() didn't).
    graft.util.CacheScope.loan {
      // with the ledger on, each stage frame is checkpointed so the
      // per-doc disposition diffs below read materialized results
      // instead of re-running the gates; ledger off = zero overhead
      // `prev` guard: a disabled gate's fold returns its input frame
      // unchanged — re-checkpointing the identical frame would
      // materialize the micro-batch once more per disabled gate
      def ck(df: DataFrame, prev: DataFrame = null): DataFrame =
        if (ledger && (df ne prev)) df.localCheckpoint() else df
      val input = ck(batch.select(col("doc_id"), col("text")))
      // quality gate first (map-only — cheapest drop wins), then pin
      // the bounded batch so the multi-branch plan below reads the
      // micro-batch source exactly once
      val gated = ck(quality.fold(input)(cfg =>
        graft.curation.Curation.qualityGate(input, cfg).drop("n_tokens")), input)
      // classifier gate: micro-batch scored against the static
      // offline-fitted model (broadcast joins — the stream-static
      // shape); only allowed predicted labels proceed to dedup
      val classed = ck(classGate.fold(gated) { case (model, allowed) =>
        val keep = graft.classify.TextClassify.naiveBayesApply(gated, model)
          .filter(col("pred_label").isInCollection(allowed))
          .select(col("doc_id"))
        gated.join(keep, Seq("doc_id"), "left_semi")
      }, gated)
      // decontamination gate: sketch-prefiltered probe of the static
      // eval gram set; only sketch-positives reach the confirm join
      val decontD = ck(decontState.fold(classed) { case (bf, evalH) =>
        // confirm side broadcasts by default; flip the flag off when
        // the eval hash relation itself is too big to broadcast (the
        // candidate stream is sketch-bounded, so a shuffle join stays
        // cheap)
        val confirm = if (decontBroadcastConfirm) broadcast(evalH) else evalH
        val contaminated = gramHashes(classed)
          .filter(graft.sketch.Bloom.mightContain(bf, col("hv")))
          .join(confirm, "hv")
          .select(col("doc_id")).distinct()
        classed.join(broadcast(contaminated), Seq("doc_id"), "left_anti")
      }, classed)
      // novelty gate: drop documents whose n-grams are mostly already
      // in the admitted corpus's gram index — exact-substring-level
      // redundancy control the LSH near-dup below can't see (a doc
      // stitched from previously-admitted spans is NOT a near-dup of
      // any single admitted doc). Cost ∝ batch grams ⋈ index; the
      // 100 TB corpus is never re-read. Docs too short to gram pass.
      val novelD = noveltyGate.fold(decontD) { maxSeenPct =>
        readGramIndex(exclude = batchId).fold(decontD) { idx =>
          val stale = Dedup.incrementalNovelty(idx, decontD, noveltyNgram)
            .filter(col("n_seen") * 100 > col("n_grams") * maxSeenPct)
            .select(col("doc_id"))
          decontD.join(stale, Seq("doc_id"), "left_anti")
        }
      }
      val docs = novelD.localCheckpoint()
      val sig = Dedup.minhashSignatures(docs, "doc_id", "text").localCheckpoint()

      val intraDrops = Dedup.lshCandidatePairs(sig, "doc_id")
        .filter(col("est_sim") >= simThreshold)
        .select(col("id_b").as("doc_id")).distinct()
      val vsIndex = readIndex(exclude = batchId) match {
        case Some(index) => Dedup.bandMatches(index, sig, "doc_id")
          .select(col("batch_id").as("doc_id"))
        case None => spark.emptyDataFrame.withColumn("doc_id", lit(0L)).limit(0)
      }
      val admittedDocs = docs
        .join(intraDrops, Seq("doc_id"), "left_anti")
        .join(vsIndex, Seq("doc_id"), "left_anti")
        .localCheckpoint()

      // per-batch disposition ledger: one row per INPUT doc naming the
      // stage that dropped it (or 'admitted') — the streaming twin of
      // the batch funnel's q_funnel_report/q_funnel_ledger, written
      // BEFORE the all-dropped early return so an empty batch result
      // still leaves its audit trail. Batch-scoped leaf → idempotent
      // under replay, folded by the same compaction as the stores.
      if (ledger) {
        def ids(df: DataFrame) = df.select(col("doc_id"))
        def at(df: DataFrame, s: String) = ids(df).withColumn("stage", lit(s))
        val intra = docs.join(intraDrops, Seq("doc_id"), "left_semi")
        at(ids(input).except(ids(gated)), "quality")
          .unionByName(at(ids(gated).except(ids(classed)), "classifier"))
          .unionByName(at(ids(classed).except(ids(decontD)), "decontamination"))
          .unionByName(at(ids(decontD).except(ids(docs)), "novelty"))
          .unionByName(at(intra, "near_dup_intra"))
          // a doc in BOTH drop sets counts once, at the intra stage
          .unionByName(at(docs.join(intraDrops, Seq("doc_id"), "left_anti")
            .join(vsIndex, Seq("doc_id"), "left_semi"), "near_dup_index"))
          .unionByName(at(admittedDocs, "admitted"))
          .withColumn("admitted", col("stage") === "admitted")
          // the batch id rides as a DATA column too: compaction folds
          // leaves into consolidated segments whose PARTITION id is a
          // fresh negative — the data column keeps per-batch history
          .withColumn("ledger_batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$ledgerDir/batch_id=$batchId")
      }

      if (admittedDocs.isEmpty) return
      admittedDocs.write.mode("overwrite").parquet(s"$admittedDir/batch_id=$batchId")
      Dedup.bandKeys(sig.join(admittedDocs.select(col("doc_id")), Seq("doc_id"), "left_semi"), "doc_id")
        .withColumnRenamed("doc_id", "corpus_id")
        .write.mode("overwrite").parquet(s"$indexDir/batch_id=$batchId")
      // write grams while the gate is on — AND whenever the store
      // exists: a gate on→off→on sequence must not leave the off
      // period's admitted docs unindexed (their span-stitched
      // redundancy would silently pass the gate forever)
      if (noveltyGate.isDefined || Files.isDirectory(Paths.get(gramDir))) {
        Dedup.gramIndex(admittedDocs, noveltyNgram)
          .write.mode("overwrite").parquet(s"$gramDir/batch_id=$batchId")
        // gate-on coverage is guaranteed: construction rebuilt or
        // backfilled any gap, and this write maintains it. (A gate-OFF
        // write must NOT mark — it cannot vouch for a legacy store's
        // history, only the gate-on construction pass can.)
        if (noveltyGate.isDefined) touchCoverageMarker()
      }
    }
  }

  /** Watch `watchDir` for JSONL document files (doc_id BIGINT, text). */
  def start(watchDir: String, availableNow: Boolean = false): StreamingQuery = {
    val stream = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .json(watchDir)
    val writer = stream.writeStream
      .queryName("graft-streaming-dedup-ingest")
      .option("checkpointLocation", s"$workDir/_dedup_checkpoint")
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}

object StreamingDedupIngest {

  /** The funnel stages in pipeline order — the `stage` values the
    * ledger writes and the step order [[recordToCatalog]] records. */
  val FunnelStages: Seq[String] = Seq("quality", "classifier",
    "decontamination", "novelty", "near_dup_intra", "near_dup_index",
    "admitted")

  /** The ONE reader of the on-disk ledger contract (partition ids go
    * stale after compaction folds; `ledger_batch_id` is the durable
    * per-batch key; crash-superset duplicates dedup on (batch, doc)) —
    * shared by [[StreamingDedupIngest.ledgerFrame]] and the API
    * server's `/streams/ledger` endpoint so the two can't diverge.
    * None when `workDir` holds no ledger, or when the directory's
    * schema is not a disposition ledger (fail closed — the path may be
    * caller-supplied).
    */
  def readLedger(spark: SparkSession, workDir: String): Option[DataFrame] = {
    val dir = s"$workDir/ledger"
    if (!Files.isDirectory(Paths.get(dir))) None
    // a caller-supplied directory holding corrupt or non-parquet
    // content makes schema inference throw AnalysisException /
    // SparkException — that is "not a ledger", answered None like a
    // schema mismatch. ONLY those two are swallowed: a genuine IO /
    // permission / cluster failure propagates instead of masquerading
    // as an empty ledger.
    else (try Some(spark.read.parquet(dir)) catch {
      case _: org.apache.spark.sql.AnalysisException => None
      case _: org.apache.spark.SparkException => None
    }).flatMap { df =>
      val needed = Set("ledger_batch_id", "doc_id", "stage", "admitted")
      if (!needed.subsetOf(df.columns.toSet)) None
      else Some(df
        .drop("batch_id") // partition dir id — stale after folds
        .withColumnRenamed("ledger_batch_id", "batch_id")
        .dropDuplicates("batch_id", "doc_id"))
    }
  }
}
