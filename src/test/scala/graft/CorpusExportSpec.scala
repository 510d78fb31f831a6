package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.export.CorpusExport

/** Deterministic corpus-export writer: byte-identical shards across
  * reruns and input partitionings, balanced round-robin assignment,
  * atomic manifest-gated publication.
  */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  private def docs() = spark.read.parquet(sf() + "/documents.parquet")
    .select($"doc_id", $"source", length($"text").cast("long").as("n_chars"))

  test("same input, any partitioning -> byte-identical shards and manifest") {
    val d1 = Files.createTempDirectory("ce_a").toString
    val d2 = Files.createTempDirectory("ce_b").toString
    val sort = Seq($"n_chars".desc, $"doc_id")
    val m1 = CorpusExport.write(docs(), d1, 4, sort)
    // adversarial second run: same rows, scrambled partitioning + order
    val shuffled = docs().repartition(7, $"source").sortWithinPartitions($"source")
    val m2 = CorpusExport.write(shuffled, d2, 4, sort)
    assert(m1 == m2, "manifests (incl. sha256 per shard) must be identical")
    assert(m1.entries.size == 4 && m1.totalRows == docs().count())
    m1.entries.foreach { e =>
      val b1 = Files.readAllBytes(Paths.get(d1, e.file))
      val b2 = Files.readAllBytes(Paths.get(d2, e.file))
      assert(java.util.Arrays.equals(b1, b2), s"shard ${e.shard} bytes differ")
    }
    // round-robin balance: sizes differ by at most 1
    val sizes = m1.entries.map(_.rows)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    // verify() passes on pristine bytes, fails after corruption
    assert(CorpusExport.verify(spark, d1))
    val victim = Paths.get(d1, m1.entries.head.file)
    Files.write(victim, Files.readAllBytes(victim) ++ Array[Byte](0))
    assert(!CorpusExport.verify(spark, d1), "corrupted shard must fail verify")
  }

  test("read() reproduces the written order; assignment matches the closed form") {
    val dir = Files.createTempDirectory("ce_read").toString
    CorpusExport.write(docs(), dir, 3, Seq($"n_chars".desc, $"doc_id"))
    val back = CorpusExport.read(spark, dir)
    // (shard, pos) is the written order: reassembling global rank
    // rank = (pos-1)*shards + shard + 1 and sorting by it must yield
    // exactly the (n_chars desc, doc_id) order the export pinned
    val seq = back
      .withColumn("rank", ($"pos" - 1L) * 3L + $"shard" + 1L)
      .orderBy($"rank")
      .select($"n_chars", $"doc_id").as[(Long, Long)].collect().toSeq
    assert(seq == seq.sortBy { case (n, id) => (-n, id) }, "global order broken")
    // reassembled ranks are exactly 1..N with no gap or duplicate —
    // i.e. (shard, pos) really is the round-robin image of a global
    // row numbering, not just some consistent-looking labeling
    val n = docs().count()
    val ranks = back.select((($"pos" - 1L) * 3L + $"shard" + 1L).as("rank"))
      .as[Long].collect().sorted.toSeq
    assert(ranks == (1L to n).toSeq, "ranks are not a 1..N bijection")
  }

  test("published exports are immutable; overwrite republishes; no staging debris") {
    val dir = Files.createTempDirectory("ce_imm").toString
    val small = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("doc_id", "n_chars")
    CorpusExport.write(small, dir, 8, Seq($"doc_id"))
    // fewer rows than shards: only populated shards get files/entries
    val m = CorpusExport.readManifest(dir).get
    assert(m.shards == 8 && m.totalRows == 3 && m.entries.size == 3)
    assert(m.entries.forall(_.rows == 1L))
    intercept[java.nio.file.FileAlreadyExistsException] {
      CorpusExport.write(small, dir, 8, Seq($"doc_id"))
    }
    val m2 = CorpusExport.write(small.filter($"doc_id" =!= 2L), dir, 2,
      Seq($"doc_id"), overwrite = true)
    assert(m2.totalRows == 2 && CorpusExport.verify(spark, dir))
    // publication left no staging residue or temp manifest
    assert(!Files.exists(Paths.get(dir, ".staging")))
    assert(!Files.exists(Paths.get(dir, s".${CorpusExport.ManifestName}.tmp")))
  }

  test("jsonl export: byte-identical reruns, valid JSON lines, read() round-trips") {
    val d1 = Files.createTempDirectory("ce_j1").toString
    val d2 = Files.createTempDirectory("ce_j2").toString
    val sort = Seq($"n_chars".desc, $"doc_id")
    val m1 = CorpusExport.write(docs(), d1, 3, sort, format = "jsonl")
    val m2 = CorpusExport.write(docs().repartition(5, $"source"), d2, 3, sort,
      format = "jsonl")
    assert(m1 == m2, "jsonl manifests (incl. sha256) must be identical")
    assert(m1.entries.forall(_.file.endsWith(".jsonl")))
    // every line is a standalone JSON object carrying shard+pos; line
    // count matches the manifest row count
    val lines = Files.readAllLines(Paths.get(d1, m1.entries.head.file))
    assert(lines.size.toLong == m1.entries.head.rows)
    assert(lines.get(0).startsWith("{") && lines.get(0).contains("\"shard\":0"))
    // read() round-trips rows and the exact written order
    val back = CorpusExport.read(spark, d1)
    assert(back.count() == docs().count())
    // round-robin: global rank r lands at shard (r-1)%S, pos (r-1)/S+1
    // — so rank order is (pos, shard)
    val firstByRank = back.orderBy($"pos", $"shard").select($"doc_id")
      .limit(3).as[Long].collect().toSeq
    val expected = docs().orderBy($"n_chars".desc, $"doc_id")
      .select($"doc_id").limit(3).as[Long].collect().toSeq
    assert(firstByRank == expected)
    assert(CorpusExport.verify(spark, d1))
    // null fields must still serialize (an all-null column would
    // otherwise vanish from the export and from read-back schemas)
    val dn = Files.createTempDirectory("ce_j3").toString
    val withNull = Seq((1L, Option.empty[String]), (2L, Some("x")))
      .toDF("id", "maybe")
    CorpusExport.write(withNull, dn, 1, Seq($"id"), format = "jsonl")
    val nlines = Files.readAllLines(
      Paths.get(dn, CorpusExport.readManifest(dn).get.entries.head.file))
    assert(nlines.get(0).contains("\"maybe\":null"), nlines.get(0))
    assert(CorpusExport.read(spark, dn).columns.contains("maybe"))
  }

  test("jsonl read() restores the WRITTEN column order from the manifest") {
    // columns deliberately anti-alphabetical: spark.read.json would
    // return (alpha, pos, shard, zeta) — positional access after a
    // round-trip would mis-bind without the manifest's column record
    val dir = Files.createTempDirectory("ce_order").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("zeta", "alpha")
    val m = CorpusExport.write(df, dir, 1, Seq($"zeta"), format = "jsonl")
    assert(m.columns == Seq("zeta", "alpha", "shard", "pos"))
    val back = CorpusExport.read(spark, dir)
    assert(back.columns.toSeq == Seq("zeta", "alpha", "shard", "pos"))
    // positional binding holds: column 0 is zeta's values
    assert(back.orderBy($"pos").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    // readManifest round-trips the record
    assert(CorpusExport.readManifest(dir).get.columns ==
      Seq("zeta", "alpha", "shard", "pos"))
  }

  test("dataset card: exact per-source counters; byte-identical JSONL re-export") {
    import graft.export.DatasetCard
    // hand-computed fixture: 2 sources, a verbatim dup, an empty doc,
    // a Spanish doc, and every PII kind once
    val rows = Seq(
      ("sA", "the cat and the hat is in the house"),
      ("sA", "the cat and the hat is in the house"), // exact dup
      ("sA", "write to bob@example.com or see https://x.io/a call 555-123-4567"),
      ("sB", "el la de los y en que"), // es
      ("sB", "   ")).toDF("source", "text")
    val card = DatasetCard.build(rows).collect()
      .map(r => r.getString(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    //                 docs tokens bytes empty dups en urls emails phones pii
    assert(card("sA") == Seq(3L, 26L, 134L, 0L, 1L, 3L, 1L, 1L, 1L, 1L), card("sA").toString)
    assert(card("sB") == Seq(2L, 8L, 24L, 1L, 0L, 1L, 0L, 0L, 0L, 0L), card("sB").toString)
    // export is byte-identical across reruns and partitionings
    val d1 = Files.createTempDirectory("card_a").toString
    val d2 = Files.createTempDirectory("card_b").toString
    val m1 = DatasetCard.export(DatasetCard.build(rows), d1)
    val m2 = DatasetCard.export(DatasetCard.build(rows.repartition(5)), d2)
    assert(m1 == m2, "card manifests (incl. shard sha256) must be identical")
    assert(m1.entries.size == 1 && m1.totalRows == 2)
    assert(CorpusExport.verify(spark, d1) && CorpusExport.verify(spark, d2))
    // the published artifact is one JSON object per source line
    val lines = Files.readAllLines(Paths.get(d1, m1.entries.head.file))
    assert(lines.size == 2 && lines.get(0).contains("\"source\":\"sA\""))
  }
}
