package graft.merge

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Step 4 (Migrate): keyed upsert into the target without a lakehouse
  * format (SURVEY.md §2.2 K2, §7.3).
  *
  * Semantics (reference `005_sp_migrate.sql:14-24` T-SQL MERGE /
  * `migrate.js:7-19` ON CONFLICT DO UPDATE):
  *  - match on the key column: matched → update all non-key columns +
  *    `migrated_at = now`; not matched → insert;
  *  - duplicate keys inside one batch: last-wins (SQLite behavior;
  *    T-SQL MERGE would error — dedup first is the superset behavior).
  *
  * Implementation: versioned snapshots. The current target is
  * `<dir>/v<N>`; a merge reads v<N>, full-outer-joins the (deduped)
  * updates on the key, coalesces per column (updates win), writes
  * `v<N+1>`, then atomically swaps a pointer file. Readers resolve the
  * pointer, so a crash mid-write leaves the old version intact
  * (last-good pointer, §7.4).
  *
  * Scale: the join shuffles both sides by the key once; Catalyst
  * broadcasts the update side automatically when it is small. One
  * writer at a time (the runner serializes migrates — §7.4).
  */
object MergeWriter {

  private def pointerFile(targetDir: String) = Paths.get(targetDir, "_CURRENT")

  /** Current snapshot version, or -1 if the target is empty. */
  def currentVersion(targetDir: String): Int = {
    val p = pointerFile(targetDir)
    if (Files.exists(p)) Files.readString(p).trim.toInt else -1
  }

  /** Read the current target snapshot; None when no version exists. */
  def readTarget(spark: SparkSession, targetDir: String): Option[DataFrame] = {
    val v = currentVersion(targetDir)
    if (v < 0) None else Some(spark.read.parquet(s"$targetDir/v$v"))
  }

  /** Upsert `updates` into the target by `keyCol`. `orderCol` breaks
    * intra-batch duplicate keys (highest wins = "last" in source
    * order). Returns rows affected (size of the update batch after
    * dedup, mirroring the reference's MERGE @@ROWCOUNT).
    */
  def merge(spark: SparkSession, targetDir: String, updates: DataFrame,
            keyCol: String, orderCol: String): Long = {
    Files.createDirectories(Paths.get(targetDir))
    val dataCols = updates.columns.filter(c => c != keyCol && c != orderCol)

    // last-wins dedup inside the batch (reference `migrate.js:10-15`)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol).desc)
    val deduped = updates
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .drop("_rn", orderCol)
      .withColumn("migrated_at", current_timestamp())

    // affected count (size of the deduped update batch, the reference's
    // MERGE @@ROWCOUNT) rides on the snapshot-write job via an
    // Observation — no separate counting pass
    val obs = new org.apache.spark.sql.Observation()
    val dedupedObs = deduped.observe(obs, count(lit(1)).as("n_updates"))

    val merged = readTarget(spark, targetDir) match {
      case None => dedupedObs
      case Some(target) =>
        val t = target.as("t")
        val u = dedupedObs.as("u")
        val outCols =
          coalesce(col(s"u.$keyCol"), col(s"t.$keyCol")).as(keyCol) +:
          dataCols.map(c => coalesce(col(s"u.$c"), col(s"t.$c")).as(c)).toSeq :+
          coalesce(col("u.migrated_at"), col("t.migrated_at")).as("migrated_at")
        t.join(u, col(s"t.$keyCol") === col(s"u.$keyCol"), "full_outer")
          .select(outCols: _*)
    }

    val next = currentVersion(targetDir) + 1
    merged.write.mode("overwrite").parquet(s"$targetDir/v$next")

    // atomic pointer swap: write-tmp + ATOMIC_MOVE rename (before any
    // metric resolution — the snapshot is live once written)
    val tmp = Paths.get(targetDir, s"_CURRENT.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointerFile(targetDir),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)

    // non-blocking metric fetch with a count fallback (see Metrics)
    graft.util.Metrics.long(obs, "n_updates", deduped.count())
  }

  /** Retention: drop snapshots older than the newest `keep` versions.
    * Never touches the current version; safe to run any time after a
    * merge (readers resolve the pointer before listing files, and the
    * pointer only ever moves forward).
    */
  def vacuum(targetDir: String, keep: Int = 2): Seq[Int] = {
    val cur = currentVersion(targetDir)
    if (cur < 0) return Seq.empty
    val dir = Paths.get(targetDir)
    val removable = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toInt)
      .filter(v => v <= cur - keep)
      .toSeq.sorted
    removable.foreach { v =>
      val root = dir.resolve(s"v$v")
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }
    removable
  }

  private implicit class IterAdapter[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
