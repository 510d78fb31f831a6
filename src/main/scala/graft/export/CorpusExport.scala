package graft.export

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One published shard: `file` is relative to the export directory;
  * `sha256` is the hex digest of the shard file's bytes — the
  * byte-reproducibility receipt a re-run (or a copy at the far end of
  * a transfer) is checked against.
  */
case class ShardEntry(shard: Int, file: String, rows: Long, sha256: String)

case class ExportManifest(shards: Int, totalRows: Long, entries: Seq[ShardEntry],
                          columns: Seq[String] = Seq.empty)

/** Deterministic corpus materialization — the last mile of a curation
  * pipeline (select → dedup → mix → **export**): write a DataFrame as
  * `shards` shard files (parquet, or one-object-per-line `jsonl` —
  * the form training loaders stream directly) with a pinned global
  * order and an atomic, hash-bearing manifest.
  *
  * Contract:
  *  - rows are globally ordered by `sortCols`, which MUST be a total
  *    order (append a unique id tie-break) — ties split across range
  *    partitions would make shard membership run-dependent;
  *  - shard assignment is round-robin on the global rank
  *    (`(rank-1) % shards`), so shard sizes are balanced to ±1 row and
  *    every shard sees the same rank-order mix (no shard is "all the
  *    longest documents" the way contiguous-block splitting would be);
  *  - each shard is ONE parquet file, rows in rank order, carrying two
  *    provenance columns: `shard` and `pos` (1-based position within
  *    the shard) — a shard file is self-describing and a resumed
  *    training run can seek by (shard, pos);
  *  - the SAME input rows produce byte-identical shard files no matter
  *    how the input was partitioned — re-running an export is a no-op
  *    check, not a new dataset;
  *  - publication is atomic: data files move into place first, the
  *    manifest lands last via an atomic rename, and readers trust only
  *    manifest-listed files. A crash mid-export leaves staging debris
  *    (swept by the next attempt), never a half-readable corpus.
  *
  * Scale shape: one range shuffle (the global rank), one small
  * per-partition count aggregation, one hash-partitioned write, and a
  * distributed hash pass over the shard bytes ([[SparkSession]]'s
  * `binaryFiles` — the driver never touches data bytes). At 100 TB
  * with shards sized in the GB range every stage is fully parallel.
  */
object CorpusExport {

  val ManifestName = "_MANIFEST.tsv"

  /** Export `df` into `dir` as `shards` round-robin shard files ordered
    * by `sortCols`; returns the published manifest. `dir` must not
    * already hold a published export unless `overwrite` (exports are
    * immutable-once-published, like landed blobs).
    */
  def write(df: DataFrame, dir: String, shards: Int, sortCols: Seq[Column],
            overwrite: Boolean = false,
            format: String = "parquet"): ExportManifest = graft.util.CacheScope.loan {
    require(shards >= 1, s"corpus export needs shards >= 1, got $shards")
    require(sortCols.nonEmpty, "corpus export needs a total-order sort key")
    require(format == "parquet" || format == "jsonl",
      s"corpus export format must be parquet or jsonl, got $format")
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val manifestPath = root.resolve(ManifestName)
    if (Files.exists(manifestPath)) {
      if (!overwrite)
        throw new java.nio.file.FileAlreadyExistsException(
          s"$manifestPath (published exports are immutable; pass overwrite=true)")
      readManifest(dir).foreach(_.entries.foreach(e =>
        Files.deleteIfExists(root.resolve(e.file))))
      Files.delete(manifestPath)
    }
    val staging = root.resolve(".staging")
    graft.util.Fs.deleteRecursively(staging) // debris from a crashed attempt
    // a crash BETWEEN shard moves and the manifest write leaves
    // manifest-less shard files in the root — readers never see them
    // (manifest-gated), but a retry must sweep them or its own moves
    // would collide with the debris
    locally {
      val listing = Files.list(root)
      try listing.iterator().asScala
        .filter { p => val n = p.getFileName.toString
          n.startsWith("shard-") &&
            (n.endsWith(".parquet") || n.endsWith(".jsonl")) }
        .foreach(p => Files.deleteIfExists(p): Unit)
      finally listing.close()
    }

    // global rank → round-robin shard → hash-cluster by shard so each
    // shard's rows land in exactly one task, pre-sorted (shard, pos) so
    // the partitioned writer needs no second sort and emits rank-order
    // rows; `pshard` duplicates `shard` because partitionBy consumes its
    // column while the shard file must still carry it
    val ranked = graft.operators.Ranking
      .globalRowNumber(df, sortCols, out = "_ce_rank")
      .withColumn("shard", ((col("_ce_rank") - 1L) % shards).cast("long"))
      .withColumn("pos", ((col("_ce_rank") - 1L).divide(shards)).cast("long") + 1L)
      .drop("_ce_rank")
    val clustered = ranked
      .withColumn("pshard", col("shard"))
      .repartition(shards, col("pshard"))
      .sortWithinPartitions(col("pshard"), col("pos"))
    if (format == "jsonl")
      // one JSON object per line, field order = the frame's column
      // order (deterministic), uncompressed text — the byte-stable
      // form training loaders consume directly; shard/pos serialize
      // INTO each line so a .jsonl shard stays self-describing.
      // ignoreNullFields=false: a null field must still appear, or an
      // all-null column silently vanishes from the export (and from a
      // read-back's inferred schema). timeZone pinned to UTC: to_json
      // renders timestamps in the SESSION zone by default, which
      // would break the byte-identical-rerun sha256 contract across
      // differently-configured sessions.
      clustered
        .select(col("pshard"), to_json(struct(
          ranked.columns.map(col).toIndexedSeq: _*),
          Map("ignoreNullFields" -> "false", "timeZone" -> "UTC")).as("value"))
        .write.mode("overwrite").partitionBy("pshard").text(staging.toString)
    else
      clustered
        .write.mode("overwrite").partitionBy("pshard").parquet(staging.toString)
    val dataExt = if (format == "jsonl") ".txt" else ".parquet"

    // deterministic final names; hashes computed executor-side over the
    // staged bytes (renames below don't change content)
    val spark = df.sparkSession
    val moves = (0 until shards).flatMap { sh =>
      val shardDir = staging.resolve(s"pshard=$sh")
      if (!Files.exists(shardDir)) None // empty shard: no file at all
      else {
        val listing = Files.list(shardDir)
        val parts =
          try listing.iterator().asScala
            .filter(_.getFileName.toString.endsWith(dataExt)).toSeq
          finally listing.close()
        require(parts.size == 1,
          s"shard $sh staged as ${parts.size} files (expected 1)")
        Some(sh -> parts.head)
      }
    }
    val hashes = hashFiles(spark, moves.map(_._2.toString))

    val counts: Map[Int, Long] = {
      if (moves.isEmpty) Map.empty
      else {
        val staged =
          if (format == "jsonl") spark.read.text(staging.toString)
          else spark.read.parquet(staging.toString)
        staged
          .groupBy(col("pshard").cast("long").as("pshard")).agg(count(lit(1)).as("n"))
          .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
      }
    }

    val outExt = if (format == "jsonl") ".jsonl" else ".parquet"
    val entries = moves.map { case (sh, staged) =>
      val name = f"shard-$sh%05d$outExt"
      Files.move(staged, root.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      ShardEntry(sh, name, counts.getOrElse(sh, 0L),
        hashes.getOrElse(normalizeUri(staged.toUri.toString),
          sys.error(s"no hash for staged shard $sh")))
    }
    graft.util.Fs.deleteRecursively(staging)

    // manifest LAST, atomically: header line, the written column order
    // (a #columns line — tab-separated, so names with commas survive;
    // spark.read.json returns columns ALPHABETIZED, and read() restores
    // this recorded order so positional access round-trips), then one
    // TSV row per shard
    val outCols = ranked.columns.toSeq // data cols + shard + pos, written order
    require(outCols.forall(c => !c.contains('\t') && !c.contains('\n')),
      s"corpus export column names must not contain tab/newline: $outCols")
    val manifest = ExportManifest(shards, entries.map(_.rows).sum, entries, outCols)
    val body = (s"#graft-corpus-export\tv1\tshards=${manifest.shards}" +
      s"\ttotal_rows=${manifest.totalRows}\n") +
      s"#columns\t${outCols.mkString("\t")}\n" +
      entries.map(e => s"${e.shard}\t${e.file}\t${e.rows}\t${e.sha256}\n").mkString
    val tmp = root.resolve(s".$ManifestName.tmp")
    Files.writeString(tmp, body)
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE)
    manifest
  }

  def readManifest(dir: String): Option[ExportManifest] = {
    val p = Paths.get(dir, ManifestName)
    if (!Files.exists(p)) return None
    val lines = Files.readAllLines(p).asScala.toSeq
    val header = lines.headOption.getOrElse("")
    require(header.startsWith("#graft-corpus-export\tv1"),
      s"not a corpus-export manifest: $p")
    val hdr = header.split("\t").drop(2)
      .map(_.split("=", 2)).collect { case Array(k, v) => k -> v.toLong }.toMap
    // optional (pre-v1.1 manifests lack it): the written column order
    val columns = lines.tail.find(_.startsWith("#columns\t"))
      .map(_.split("\t", -1).toSeq.tail).getOrElse(Seq.empty)
    val entries = lines.tail.filter(l => l.nonEmpty && !l.startsWith("#")).map { l =>
      val Array(sh, f, n, h) = l.split("\t", 4)
      ShardEntry(sh.toInt, f, n.toLong, h)
    }
    Some(ExportManifest(hdr("shards").toInt, hdr("total_rows"), entries, columns))
  }

  /** Read a published export — manifest-listed shard files ONLY (a
    * concurrent writer's staging debris is invisible). Shard and pos
    * columns ride along; round-robin places global rank r at shard
    * (r−1) mod S, pos (r−1) div S + 1, so `orderBy(pos, shard)`
    * reproduces the exact global order.
    *
    * jsonl caveat: the schema is RE-INFERRED from the JSON text
    * (ints widen to BIGINT, decimals come back as DOUBLE, timestamps
    * as STRING) — jsonl is the interchange format for external
    * loaders; parquet is the lossless round-trip format. COLUMN ORDER
    * is restored from the manifest's recorded list (spark.read.json
    * alphabetizes inferred columns, which would silently mis-bind
    * positional access); pre-v1.1 manifests without the record keep
    * the inferred (alphabetical) order.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val m = readManifest(dir).getOrElse(
      throw new IllegalArgumentException(s"no corpus export at $dir"))
    if (m.entries.isEmpty)
      throw new IllegalArgumentException(s"corpus export at $dir has no shards")
    val paths = m.entries.map(e => s"$dir/${e.file}")
    val raw =
      if (m.entries.head.file.endsWith(".jsonl")) spark.read.json(paths: _*)
      else spark.read.parquet(paths: _*)
    if (m.columns.nonEmpty && m.columns.toSet == raw.columns.toSet)
      raw.select(m.columns.map(col): _*)
    else raw
  }

  /** Re-hash the published shard bytes (executor-side) and compare to
    * the manifest — the transfer/bit-rot check. True iff every listed
    * shard is present with matching bytes.
    */
  def verify(spark: SparkSession, dir: String): Boolean =
    readManifest(dir).exists { m =>
      m.entries.forall(e => Files.exists(Paths.get(dir, e.file))) && {
        if (m.entries.isEmpty) true
        else {
          val hashes = hashFiles(spark, m.entries.map(e => s"$dir/${e.file}"))
          m.entries.forall { e =>
            hashes.get(normalizeUri(Paths.get(dir, e.file).toUri.toString))
              .contains(e.sha256)
          }
        }
      }
    }

  /** Executor-side SHA-256 of each file's bytes, keyed by normalized
    * URI path — the ONE hashing implementation write() and verify()
    * share, so their hash agreement can't drift.
    */
  private def hashFiles(spark: SparkSession, paths: Seq[String]): Map[String, String] =
    spark.sparkContext
      .binaryFiles(paths.mkString(","))
      .mapValues { pds =>
        val md = MessageDigest.getInstance("SHA-256")
        val in = pds.open()
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        md.digest().map("%02x".format(_)).mkString
      }
      .collect().toMap.map { case (k, v) => normalizeUri(k) -> v }

  /** `binaryFiles` keys are URIs whose scheme/slash form varies by
    * Hadoop version — compare on the path component only.
    */
  private def normalizeUri(s: String): String =
    java.net.URI.create(s).getPath
}
