package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** JDBC source with watermark-incremental copy (SURVEY.md §2.1 S7 —
  * reference `python_code/projectplan.md:81,139-141` plans a SQL
  * Server connector doing full or incremental copies via a watermark
  * column: `WHERE watermark_col > last_value`).
  *
  * Full copy is plain `spark.read.jdbc`, optionally range-partitioned
  * so the copy itself is distributed. Incremental copy reads only rows
  * past the stored watermark — the predicate ships to the database in
  * the pushed-down subquery, so an indexed watermark column costs the
  * database an index range scan, not a table scan — and hands back a
  * commit handle: persist the new high-water mark ONLY after the rows
  * landed durably. A crash between read and commit replays the same
  * window (at-least-once, the reference's Lookup + SP watermark
  * pattern); downstream dedup/merge by key absorbs replays.
  *
  * The watermark state is one small file, written temp + atomic move.
  */
object JdbcSource {

  /** Full-table copy; `partitionOn` distributes the read over
    * `numPartitions` range slices of a numeric column (each executor
    * opens its own connection for its slice).
    */
  def read(spark: SparkSession, url: String, table: String,
           props: java.util.Properties = new java.util.Properties,
           partitionOn: Option[(String, Long, Long)] = None,
           numPartitions: Int = 8): DataFrame =
    partitionOn match {
      case Some((c, lo, hi)) => spark.read.jdbc(url, table, c, lo, hi, numPartitions, props)
      case None              => spark.read.jdbc(url, table, props)
    }

  /** Pending incremental window: the frame plus the commit that
    * advances the stored watermark to `newMark`.
    */
  final case class Incremental(df: DataFrame, newMark: Option[String], stateFile: String) {
    /** Persist the new high-water mark — call after landing durably. */
    def commit(): Unit = newMark.foreach { m =>
      val p = Paths.get(stateFile)
      Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      Files.writeString(tmp, m)
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Rows with `watermarkCol` strictly above the stored mark (every
    * row on first call). The watermark must be monotonically
    * non-decreasing in the source (an id or ingest timestamp);
    * `quoteLiteral` controls whether the stored value is embedded as a
    * SQL string literal (timestamps/strings) or bare (numerics).
    */
  def readIncremental(spark: SparkSession, url: String, table: String,
                      watermarkCol: String, stateDir: String,
                      props: java.util.Properties = new java.util.Properties,
                      quoteLiteral: Boolean = false): Incremental = {
    val stateFile = s"$stateDir/${table.replaceAll("[^A-Za-z0-9_]", "_")}.$watermarkCol.watermark"
    val last = if (Files.exists(Paths.get(stateFile)))
      Some(Files.readString(Paths.get(stateFile)).trim) else None
    val where = last.map { v =>
      val lit = if (quoteLiteral) "'" + v.replace("'", "''") + "'" else v
      s" WHERE $watermarkCol > $lit"
    }.getOrElse("")
    // pushed-down subquery: the database evaluates the watermark range
    val df = spark.read.jdbc(url, s"(SELECT * FROM $table$where) graft_inc", props)
    // the new mark as a pushed-down one-row MAX (the reference's ADF
    // Lookup) — a Spark-side df.agg(max) would transfer the whole
    // window over JDBC a second time just to find its maximum
    val mark = spark.read
      .jdbc(url, s"(SELECT MAX($watermarkCol) AS graft_wm FROM $table$where) graft_mx", props)
      .select(col("graft_wm").cast("string")).collect()
      .headOption.flatMap(r => Option(r.getString(0)))
    Incremental(df, mark.orElse(last), stateFile)
  }
}
