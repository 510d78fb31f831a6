package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sim.{Similarity, VectorIndexStore}

/** The persistent IVF/SQ8 vector index store and its streaming gate:
  * probe-over-store == ivfSq8TopK-over-corpus, incremental add +
  * replay idempotence, crash-safe compaction, and the O(nprobe)
  * cell-directory probe plan.
  */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

  test("probe over an incrementally built store equals ivfSq8TopK over the corpus") {
    val dir = tmp("graft_vis_eq")
    val store = new VectorIndexStore(spark, dir)
    // build in two batches — create(even half) + add(odd half): the
    // probe must see the UNION exactly as if the index were built once
    store.create(emb.filter($"vec_id" % 2 === 0), emb.filter($"vec_id" < 8),
      "vec_id", "embedding")
    store.add(1L, emb.filter($"vec_id" % 2 === 1), "vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 5)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select($"q_id", $"rn", $"id", $"sim").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val fromStore = key(store.probe(queries, "vec_id", "embedding", 3, nprobe = 2))
    val fromCorpus = key(Similarity.ivfSq8TopK(queries, emb,
      emb.filter($"vec_id" < 8), "vec_id", "embedding", 3, nprobe = 2))
    assert(fromStore == fromCorpus, "store probe diverged from ivfSq8TopK")
    assert(fromStore.nonEmpty)
  }

  test("replay idempotence: re-adding a batch overwrites its own leaf only") {
    val dir = tmp("graft_vis_replay")
    val store = new VectorIndexStore(spark, dir)
    store.create(emb.filter($"vec_id" < 20), emb.filter($"vec_id" < 8),
      "vec_id", "embedding")
    store.add(1L, emb.filter($"vec_id" >= 20 && $"vec_id" < 30), "vec_id", "embedding")
    val before = store.codes().count()
    val leaves = store.leafCount()
    // a restarted stream replays batch 1 — same leaf, same contents
    store.add(1L, emb.filter($"vec_id" >= 20 && $"vec_id" < 30), "vec_id", "embedding")
    assert(store.codes().count() == before, "replay duplicated rows")
    assert(store.leafCount() == leaves, "replay grew the leaf set")
    // a NEW add becomes findable: its own vector probes to itself at
    // code-cosine 1.0 when self-exclusion is off
    store.add(2L, emb.filter($"vec_id" >= 30 && $"vec_id" < 31), "vec_id", "embedding")
    val self = store.probe(emb.filter($"vec_id" === 30), "vec_id", "embedding",
        1, nprobe = 1, excludeSelf = false)
      .collect()
    assert(self.length == 1 && self(0).getLong(1) == 30L, self.mkString(","))
    // the centroid structure is immutable — re-init refuses
    intercept[IllegalArgumentException] {
      store.init(emb.filter($"vec_id" < 4), "vec_id", "embedding")
    }
  }

  test("compaction folds leaves, bounds the directory count, and preserves probes") {
    val dir = tmp("graft_vis_compact")
    val store = new VectorIndexStore(spark, dir)
    store.create(emb.filter($"vec_id" % 3 === 0), emb.filter($"vec_id" < 8),
      "vec_id", "embedding")
    store.add(1L, emb.filter($"vec_id" % 3 === 1), "vec_id", "embedding")
    store.add(2L, emb.filter($"vec_id" % 3 === 2), "vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 5)
    def probeKey() = store.probe(queries, "vec_id", "embedding", 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    val before = probeKey()
    store.compact(3L)
    assert(store.leafCount() == 1, s"expected one folded segment, got ${store.leafCount()}")
    assert(probeKey() == before, "compaction changed probe results")
    assert(store.codes().count() == emb.filter(
      expr("size(filter(embedding, x -> isnan(cast(x as double)))) = 0")).count())
  }

  test("delete tombstones immediately, compact reclaims, vacuum purges and re-enables the id") {
    val dir = tmp("graft_vis_delete")
    val store = new VectorIndexStore(spark, dir)
    store.create(emb.filter($"vec_id" < 20), emb.filter($"vec_id" < 8),
      "vec_id", "embedding")
    store.add(1L, emb.filter($"vec_id" >= 20 && $"vec_id" < 30), "vec_id", "embedding")
    val liveBefore = store.codes().count()
    store.delete(2L, emb.filter($"vec_id" === 25), "vec_id")
    // reader-visible immediately, and never a probe ANSWER — even a
    // self-probe with exclusion off must not surface the deleted id
    assert(store.codes().count() == liveBefore - 1)
    assert(store.probe(emb.filter($"vec_id" === 25), "vec_id", "embedding",
        5, nprobe = 8, excludeSelf = false)
      .collect().forall(_.getLong(1) != 25L))
    // re-add does NOT resurrect while the tombstone exists
    store.add(3L, emb.filter($"vec_id" === 25), "vec_id", "embedding")
    assert(store.codes().filter($"id" === 25).count() == 0)
    val queries = emb.filter($"vec_id" < 5)
    def probeKey() = store.probe(queries, "vec_id", "embedding", 3, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1)))
      .sortBy(t => (t._1, t._2)).toSeq
    val before = probeKey()
    // compact folds the leaves and physically drops the tombstoned
    // rows, but keeps the tombstone (delete stays final)
    store.compact(4L)
    assert(store.leafCount() == 1)
    assert(store.tombstoneCount() == 1L)
    assert(probeKey() == before, "compaction under a tombstone changed probes")
    // vacuum purges rows AND tombstones; probes still agree
    store.vacuum()
    assert(probeKey() == before, "vacuum changed probe results")
    assert(store.tombstoneCount() == 0L)
    assert(store.codes().filter($"id" === 25).count() == 0)
    // with the tombstone gone, the id can come back
    store.add(4L, emb.filter($"vec_id" === 25), "vec_id", "embedding")
    assert(store.codes().filter($"id" === 25).count() == 1)
  }

  test("re-adding a live id is deterministic (newest batch wins); empty store refuses loudly") {
    val dir = tmp("graft_vis_readd")
    val store = new VectorIndexStore(spark, dir)
    // init'ed-but-never-add'ed is a legal state: readers must refuse
    // with a message naming the store, not a raw path-not-found error
    store.init(emb.filter($"vec_id" < 8), "vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] { store.codes() }
    assert(e1.getMessage.contains(dir), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      store.probe(emb.filter($"vec_id" < 2), "vec_id", "embedding", 1)
    }
    assert(e2.getMessage.contains(dir), e2.getMessage)
    // re-add a LIVE id with a different vector in a later batch: every
    // reader deterministically sees the newest batch's codes (an
    // arbitrary drop-duplicates would make reads nondeterministic)
    store.add(0L, emb.filter($"vec_id" < 20), "vec_id", "embedding")
    val replacement = emb.filter($"vec_id" === 40)
      .select(lit(7L).as("vec_id"), $"embedding")
    store.add(1L, replacement, "vec_id", "embedding")
    val want = Similarity.sq8Encode(replacement, "vec_id", "embedding")
      .select($"sq8_codes").collect()(0).getSeq[Byte](0).toList
    def codes7() = store.codes().filter($"id" === 7)
      .select($"codes").collect().map(_.getSeq[Byte](0).toList).toList
    assert(codes7() == List(want), "reader did not take the newest batch's vector")
    assert(codes7() == List(want), "second read disagreed with the first")
    // the fold keeps the same winner
    store.compact(2L)
    assert(codes7() == List(want), "compaction lost the newest version")
  }

  test("probe plan prunes to the probed cells at the DIRECTORY level") {
    val dir = tmp("graft_vis_prune")
    val store = new VectorIndexStore(spark, dir)
    store.create(emb, emb.filter($"vec_id" < 8), "vec_id", "embedding")
    // layout: one partition dir per cell under the single leaf
    val leaf = Files.list(Paths.get(s"$dir/codes")).iterator().next()
    val cellDirs = Files.list(leaf).iterator()
    var nCells = 0
    while (cellDirs.hasNext) {
      if (cellDirs.next().getFileName.toString.startsWith("cell=")) nCells += 1
    }
    assert(nCells >= 4, s"fixture should spread over several cells, got $nCells")
    // one query at nprobe=2 probes ≤ 2 of those dirs: the scan must
    // carry the cell IN (...) predicate as a PARTITION filter (pruned
    // before reading a single row — the O(nprobe) read contract)
    val probe = store.probe(emb.filter($"vec_id" === 0), "vec_id", "embedding",
      3, nprobe = 2)
    val plan = probe.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("cell"))
    assert(scanLine.isDefined, s"codes scan lost its cell partition filter:\n$plan")
    assert(!scanLine.get.contains("PartitionFilters: []"),
      s"cell filter not pushed to partition pruning: ${scanLine.get}")
  }

  test("retrain under drift: planted boundary cluster regains recall; generation swaps; deletes carry") {
    val dir = tmp("graft_vis_retrain")
    val store = new VectorIndexStore(spark, dir)
    // fixed creation-time cells along x and y; ids chosen so the
    // k-means init (3 lowest-id vectors) seeds one per TRUE cluster
    val cents = Seq((0L, Array(1f, 0f, 0f)), (1L, Array(0f, 1f, 0f)))
      .toDF("id", "vec")
    val all = Seq(
      1L -> Array(0.90f, 0.10f, 0f), // x-cluster
      2L -> Array(0.10f, 0.90f, 0f), // y-cluster
      3L -> Array(0.72f, 0.69f, 0f), // drifted diagonal — assigns x
      4L -> Array(0.69f, 0.72f, 0f), // its twin — assigns y
      5L -> Array(0.95f, 0.05f, 0f),
      6L -> Array(0.88f, 0.12f, 0f),
      7L -> Array(0.05f, 0.95f, 0f),
      8L -> Array(0.12f, 0.88f, 0f),
      9L -> Array(0.74f, 0.67f, 0f),  // more drift mass
      10L -> Array(0.67f, 0.74f, 0f)
    ).toDF("id", "vec")
    store.init(cents, "id", "vec")
    store.add(0L, all.filter($"id" <= 8), "id", "vec")
    store.add(1L, all.filter($"id" > 8), "id", "vec") // drift keeps arriving
    store.delete(2L, Seq(5L).toDF("id"), "id")
    // the drifted twins straddle the x/y boundary: id 3 probes cell x,
    // id 4 lives in cell y — invisible at nprobe=1, the silent recall
    // decay retrain exists to cure
    def probe3(): Set[Long] = store.probe(all.filter($"id" === 3), "id", "vec",
      k = 3, nprobe = 1).collect().map(_.getLong(1)).toSet
    assert(!probe3().contains(4L), s"twin visible pre-retrain: ${probe3()}")
    // occupancy alarm surface exists and sees the 2 creation cells
    assert(store.cellSkewProfile().collect().map(_.getLong(4)).headOption.contains(2L))
    // retrain on the live corpus (k-means path): a centroid lands on
    // the drifted cluster and the twins share a cell again
    val gen = store.retrain(all, "id", "vec", k = 3, iters = 3)
    assert(gen == 1L && store.currentGen == 1L)
    assert(probe3().contains(4L), s"twin still invisible after retrain: ${probe3()}")
    assert(store.centroidsFrame().count() == 3L)
    // the delete carried forward: id 5 stays gone, tombstone intact
    assert(store.codes().filter($"id" === 5).count() == 0)
    assert(store.tombstoneCount() == 1L)
    store.add(3L, all.filter($"id" === 5), "id", "vec")
    assert(store.codes().filter($"id" === 5).count() == 0,
      "re-add resurrected a deleted id across the generation swap")
    // the retrained corpus lives in a NEGATIVE consolidated segment: a
    // checkpoint-reset replay of add batch 0 (foreachBatch restarts at
    // id 0) overwrites only its own leaf — it must not erase the
    // re-encoded index, and a replayed delete batch must not overwrite
    // the carried-forward tombstones
    val liveAfterSwap = store.codes().count()
    store.add(0L, all.filter($"id" === 1), "id", "vec")
    assert(store.codes().count() == liveAfterSwap,
      "replayed add(0) clobbered the retrained consolidated segment")
    store.delete(2L, Seq(6L).toDF("id"), "id")
    assert(store.codes().filter($"id" === 5).count() == 0,
      "replayed delete batch resurrected the carried tombstone for id 5")
    assert(store.tombstoneCount() == 2L)
    // compaction and vacuum keep working inside the new generation
    store.compact(4L)
    store.vacuum()
    assert(store.tombstoneCount() == 0L)
    assert(probe3().contains(4L), "post-vacuum probe lost the twin")
    // the replaced generation's flat-layout bytes were reclaimed
    assert(!Files.isDirectory(Paths.get(s"$dir/codes")), "gen-0 codes not reclaimed")
    // a retrain demands full coverage of the live ids — a partial
    // corpus must refuse loudly, not silently shrink the index
    intercept[IllegalArgumentException] {
      store.retrain(all.filter($"id" <= 4), "id", "vec", k = 2)
    }
    // and coverage is judged on DISTINCT ids: a corpus with one id
    // duplicated and one missing matches on raw row count but still
    // drops the missing id — both defects refuse loudly instead
    val eDup = intercept[IllegalArgumentException] {
      store.retrain(all.union(all.filter($"id" === 1)), "id", "vec", k = 2)
    }
    assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
    // 8 rows == 8 live ids, but id 1 twice and id 2 absent — the exact
    // raw-count-masking corpus the distinct-id compare exists to catch
    val missingOneDupOne = all.filter(!$"id".isin(2L, 5L, 6L))
      .union(all.filter($"id" === 1))
    val eMask = intercept[IllegalArgumentException] {
      store.retrain(missingOneDupOne, "id", "vec", k = 2)
    }
    assert(eMask.getMessage.contains("duplicate"), eMask.getMessage)
  }

  test("streaming embed gate: intra-batch, cross-batch, and re-sent dups all drop") {
    val work = tmp("graft_vis_stream")
    // axis-aligned centroids; vectors constructed so near-dup pairs
    // share a cell (cosine of identical vectors = 1.0 ≥ 0.995)
    val cents = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "vec")
    val gate = new graft.streaming.StreamingEmbedIngest(spark, work, cents,
      simThreshold = 0.999, nprobe = 1, compactEvery = 4)
    // batch 0: ids 10 and 11 are identical vectors in the same cell —
    // min-id wins; 12 is distinct
    gate.processBatch(Seq(
      (10L, Array(0.9f, 0.1f, 0.0f)),
      (11L, Array(0.9f, 0.1f, 0.0f)),
      (12L, Array(0.0f, 0.8f, 0.2f))).toDF("id", "vec"), 0L)
    assert(gate.admitted().select("id").as[Long].collect().toSet == Set(10L, 12L))
    // batch 1: 20 duplicates the admitted 10 (cross-batch, via the
    // store probe); 21 is novel; a RE-SENT id 10 must also drop (the
    // self-exclusion-off contract), not overwrite
    gate.processBatch(Seq(
      (20L, Array(0.9f, 0.1f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f)),
      (21L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "vec"), 1L)
    assert(gate.admitted().select("id").as[Long].collect().toSet ==
      Set(10L, 12L, 21L))
    // replaying batch 1 changes nothing (leaf overwrite, same drops)
    gate.processBatch(Seq(
      (20L, Array(0.9f, 0.1f, 0.0f)),
      (10L, Array(0.9f, 0.1f, 0.0f)),
      (21L, Array(0.0f, 0.0f, 1.0f))).toDF("id", "vec"), 1L)
    assert(gate.admitted().select("id").as[Long].collect().toSet ==
      Set(10L, 12L, 21L))
    // batch 4 triggers compaction of the committed leaves; admitted
    // state and novelty decisions survive the fold
    gate.processBatch(Seq(
      (40L, Array(0.9f, 0.1f, 0.0f)),
      (41L, Array(0.5f, 0.5f, 0.70710678f))).toDF("id", "vec"), 4L)
    assert(gate.admitted().select("id").as[Long].collect().toSet ==
      Set(10L, 12L, 21L, 41L))
    assert(gate.store.leafCount() <= 2, s"compaction did not bound leaves")
  }
}
