package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.monotonically_increasing_id
import org.apache.spark.sql.types.{DataType, LongType, StructType}

import graft.merge.MergeWriter

/** SQL surface for the path-based upsert (SURVEY.md §7.3 — reference
  * MERGE in `python_code/migrate.sql` runs `MERGE INTO target USING
  * source ON t.k = s.k WHEN MATCHED UPDATE / WHEN NOT MATCHED
  * INSERT`):
  *
  * {{{
  *   MERGE INTO '/path/to/target' USING source_view ON key_col [AND key_col2 ...]
  *     [ORDER BY version_col] [BUCKETS n]
  *     [WHEN MATCHED [AND cond] THEN DELETE]
  *     [WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *]
  * }}}
  *
  * The target is a [[graft.merge.MergeWriter]] bucketed snapshot
  * directory (quoted path — these targets are filesystem-versioned,
  * not catalog tables); the source is any registered table or temp
  * view, or an inline subquery `USING (SELECT ...) [AS alias]` (the
  * T-SQL MERGE source form — the alias is accepted and ignored, the
  * engine joins by the ON columns). `ON t.k = s.k [AND t.k2 = s.k2]`
  * is accepted when each
  * equality's sides name the same column; composite keys match on the
  * conjunction (bucketed by the key tuple's hash).
  * Without `ORDER BY`, last-in-source-order wins intra-batch
  * duplicate keys (the reference's semantics, `migrate.js:10-15`);
  * with it, the highest `version_col` wins.
  *
  * WHEN actions: the upsert pair `UPDATE SET * / INSERT *` (the
  * default when no WHEN clause is given — exactly what the engine's
  * merge does), optionally preceded by a delete branch (the T-SQL
  * MERGE delete form, reference `005_sp_migrate.sql:14-24`'s
  * statement family). `cond` is any boolean expression over the
  * SOURCE columns; omitted = every source row is a delete. A source
  * row satisfying `cond` removes its key from the target (a no-op
  * when absent — CDC semantics: a tombstone never inserts); with the
  * upsert pair present, the remaining rows upsert as usual; without
  * it, they do nothing. Anything else raises. Returns one row:
  * `rows_affected` (the reference's `@@ROWCOUNT`).
  */
case class MergeIntoPathCommand(targetDir: String, source: String, keyCols: Seq[String],
                                orderCol: Option[String], buckets: Option[Int],
                                deleteCond: Option[String] = None,
                                upsert: Boolean = true,
                                sourceIsQuery: Boolean = false)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("rows_affected", LongType, nullable = false)())

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    val src0 = if (sourceIsQuery) session.sql(source) else session.table(source)
    // the tombstone flag is computed on the source BEFORE the merge:
    // delete-only form keeps just the rows the condition selects (the
    // others take no action at all), combined form flags them inline
    val src = deleteCond match {
      case Some(c) if !upsert =>
        src0.filter(expr(c)).withColumn("_graft_delete", lit(true))
      case Some(c) =>
        src0.withColumn("_graft_delete", expr(c).cast("boolean"))
      case None => src0
    }
    val (updates, ord) = orderCol match {
      case Some(c) => (src, c)
      case None =>
        // synthesized source order: monotonically_increasing_id is
        // ascending in row order within and across partitions, so the
        // merge's highest-wins dedup picks the LAST source row per key
        val c = "_graft_src_order"
        (src.withColumn(c, monotonically_increasing_id()), c)
    }
    val n = MergeWriter.mergeByKeys(session, targetDir, updates, keyCols, ord,
      buckets.getOrElse(MergeWriter.DefaultBuckets),
      deleteCol = deleteCond.map(_ => "_graft_delete"))
    Seq(Row(n))
  }
}

/** `graft_target('<path>'[, version])` table-valued function — the
  * read side of the path-target MERGE surface: query the current
  * snapshot of a [[graft.merge.MergeWriter]] target (or a time-travel
  * `version`, subject to vacuum retention) straight from SQL:
  *
  * {{{
  *   SELECT * FROM graft_target('/path/to/target') WHERE key > 10
  *   SELECT * FROM graft_target('/path/to/target', 0)  -- as of v0
  * }}}
  *
  * Injected via [[GraftExtensions]]. Arguments must be literals (the
  * path resolves at analysis time); filters and pruning compose with
  * the returned parquet scan like any other relation.
  */
object GraftTargetTvf {
  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.nonEmpty && exprs.size <= 2,
      "usage: graft_target('<path>'[, version])")
    require(exprs.forall(_.foldable), "graft_target arguments must be literals")
    val path = String.valueOf(exprs.head.eval())
    val spark = SparkSession.active
    // resolve _CURRENT exactly ONCE: the version pinned in the node and
    // the relation wrapped by it must be the same snapshot, or a
    // concurrent merge between two reads would let the pruned and full
    // lowerings of one call observe different versions
    val resolved =
      if (exprs.size == 2) String.valueOf(exprs(1).eval()).toInt
      else MergeWriter.currentVersion(path)
    val df = MergeWriter.readTargetAt(spark, path, resolved)
      .getOrElse(throw new IllegalArgumentException(
        s"graft_target: no merge target (or no such version) at $path"))
    // reads of a bucketed target stay DEFERRED ([[GraftTargetNode]]) so
    // the optimizer can lower a point lookup to the pruned scan —
    // current-snapshot AND time-travel alike (the node pins `resolved`,
    // so the pruned lowering reads that version's manifest; a pinned
    // version predating the bucket layout simply fails the pruned read
    // and finalizes to the full scan). Legacy targets read plainly.
    // The node wraps the ANALYZED relation — a leaf must expose
    // resolved output attributes, the analyzer won't descend into it.
    MergeWriter.bucketLayout(path) match {
      case Some((_, keyCols)) =>
        GraftTargetNode(path, keyCols, resolved, df.queryExecution.analyzed)
      case None => df.queryExecution.logical
    }
  }
}

/** `graft_target_lookup('<path>', key[, key...])` table-valued
  * function — bucket-pruned point lookup on a merge target: the scan
  * underneath reads ONLY the bucket directories the given keys hash
  * into ([[graft.merge.MergeWriter.readTargetTuples]]), so a point
  * read against a huge target costs O(|keys| buckets), not a snapshot
  * scan. Keys are literals, compared after a cast to the stored key
  * type. Against a COMPOSITE-keyed target the literals group into
  * consecutive full key tuples in the recorded key-column order:
  * `graft_target_lookup(p, t1, id1, t2, id2)` looks up (t1,id1) and
  * (t2,id2) on a (tenant, id) target.
  */
object GraftTargetLookupTvf {
  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size >= 2, "usage: graft_target_lookup('<path>', key[, key...])")
    require(exprs.forall(_.foldable), "graft_target_lookup arguments must be literals")
    val path = String.valueOf(exprs.head.eval())
    val nKeys = MergeWriter.bucketLayout(path).map(_._2.size).getOrElse(1)
    require((exprs.size - 1) % nKeys == 0,
      s"graft_target_lookup: the target at $path has a $nKeys-column key — " +
        s"literals must group into full key tuples (got ${exprs.size - 1})")
    // a NULL component makes its tuple match nothing (SQL semantics) —
    // kept as null here, dropped inside the lookup, so it can never
    // collide with a legitimate 'null' string key. eval() yields
    // catalyst-INTERNAL values (a DATE literal is a days-int whose
    // String.valueOf would be a nonsense key): convert each to its
    // external form first.
    val tuples = exprs.tail.map { e =>
      Option(e.eval()).map(v => String.valueOf(
        org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(e.dataType)(v))).orNull
    }.grouped(nKeys).toSeq
    MergeWriter.readTargetTuples(SparkSession.active, path, tuples)
      .getOrElse(throw new IllegalArgumentException(
        "graft_target_lookup: no bucketed merge target at " + path +
          " (or its key type does not support string-keyed lookup — " +
          "use graft_target + a typed filter)"))
      .queryExecution.logical
  }
}

/** `COMPACT '<path>'` — fold a merge target's cross-version bucket
  * references into one self-contained version (the SQL face of
  * [[MergeWriter.compact]]). Returns the new current version.
  */
case class CompactPathCommand(targetDir: String) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("compacted_version", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    // a mistyped path must error like graft_target does, not return a
    // success row claiming version -1 was compacted
    require(MergeWriter.currentVersion(targetDir) >= 0,
      s"COMPACT: no merge target at $targetDir")
    MergeWriter.compact(session, targetDir)
    Seq(Row(MergeWriter.currentVersion(targetDir).toLong))
  }
}

/** `VACUUM '<path>' [KEEP n]` — reclaim versions older than the newest
  * `n` (default 2) that no kept manifest references (the SQL face of
  * [[MergeWriter.vacuum]]). Returns how many versions were reclaimed.
  */
case class VacuumPathCommand(targetDir: String, keep: Int) extends LeafRunnableCommand {
  override val output: Seq[Attribute] =
    Seq(AttributeReference("reclaimed_versions", LongType, nullable = false)())
  override def run(session: SparkSession): Seq[Row] = {
    require(MergeWriter.currentVersion(targetDir) >= 0,
      s"VACUUM: no merge target at $targetDir")
    Seq(Row(MergeWriter.vacuum(targetDir, keep).size.toLong))
  }
}

/** `graft_target_versions('<path>')` table-valued function — version
  * discoverability for the time-travel read side: which snapshot
  * versions are still on disk (and thus valid second arguments to
  * `graft_target(path, version)`), which is current, how many buckets
  * each maps and how many it physically holds (own_buckets < buckets
  * means the version points some buckets at older versions' files —
  * what COMPACT folds).
  */
object GraftTargetVersionsTvf {
  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "usage: graft_target_versions('<path>')")
    require(exprs.forall(_.foldable), "graft_target_versions argument must be a literal")
    val path = String.valueOf(exprs.head.eval())
    val spark = SparkSession.active
    val info = MergeWriter.versionInfo(path) // already ascending by version
    require(info.nonEmpty, s"graft_target_versions: no merge target at $path")
    spark.createDataFrame(info).toDF("version", "is_current", "buckets", "own_buckets")
      .queryExecution.logical
  }
}

/** `graft_target_layout('<path>')` table-valued function — storage
  * discoverability for the write side: the bucket count and key
  * columns fixed at the target's first merge (what a caller must know
  * to compose `MERGE INTO ... ON` / `graft_target_lookup` key tuples),
  * plus the current version.
  */
object GraftTargetLayoutTvf {
  def build(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.size == 1, "usage: graft_target_layout('<path>')")
    require(exprs.forall(_.foldable), "graft_target_layout argument must be a literal")
    val path = String.valueOf(exprs.head.eval())
    val (buckets, keyCols) = MergeWriter.bucketLayout(path)
      .getOrElse(throw new IllegalArgumentException(
        s"graft_target_layout: no bucketed merge target at $path"))
    val spark = SparkSession.active
    spark.createDataFrame(Seq(
        (buckets, keyCols.mkString(","), MergeWriter.currentVersion(path))))
      .toDF("buckets", "key_columns", "current_version")
      .queryExecution.logical
  }
}

/** Delegating parser that recognizes the path-target MERGE grammar
  * above (plus the COMPACT/VACUUM maintenance statements) and hands
  * everything else to Spark's parser. Injected via [[GraftExtensions]].
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private val MergeRe =
    ("""(?is)^\s*MERGE\s+INTO\s+'([^']+)'\s+USING\s+([\w.]+)""" +
      """\s+ON\s+(.+?)""" +
      """(?:\s+ORDER\s+BY\s+(\w+))?(?:\s+BUCKETS\s+(\d+))?(\s+WHEN\s.*?)?\s*;?\s*$""").r

  // one key spec of the ON conjunction: `k` or `t.k = s.k`
  private val KeySpecRe = """(?is)^(?:[\w]+\.)?(\w+)(?:\s*=\s*(?:[\w]+\.)?(\w+))?$""".r

  private val UpsertWhenRe =
    """(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*""".r

  // optional leading delete branch of the WHEN blob: condition (over
  // source columns) lazily up to THEN DELETE, then whatever follows
  private val DeleteWhenRe =
    """(?is)^\s*WHEN\s+MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE\s*(WHEN\s.*)?$""".r

  private val CompactRe = """(?is)^\s*COMPACT\s+'([^']+)'\s*;?\s*$""".r
  private val VacuumRe = """(?is)^\s*VACUUM\s+'([^']+)'(?:\s+KEEP\s+(\d+))?\s*;?\s*$""".r

  private val UsingParenRe = """(?is)^(\s*MERGE\s+INTO\s+'[^']+'\s+USING\s+)\(""".r

  /** `USING (SELECT ...) [AS alias]` support: extract the
    * balanced-paren subquery (paren counting — a regex cannot balance;
    * parens inside the subquery's string literals are not tracked,
    * which is the documented limitation) and splice a placeholder name
    * in, so the main grammar regex stays simple. Returns
    * (rewritten statement, subquery SQL) or None when the source is a
    * plain table name.
    */
  private def extractUsingSubquery(sql: String): Option[(String, String)] =
    UsingParenRe.findFirstMatchIn(sql).flatMap { m =>
      val open = m.end - 1
      var depth = 0
      var i = open
      var close = -1
      while (i < sql.length && close < 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) None // unbalanced: let the delegate produce its error
      else {
        val sub = sql.substring(open + 1, close)
        // an optional alias after the subquery (T-SQL requires one) is
        // consumed and dropped — but never the ON keyword itself
        val AliasRe = """(?is)^\s+(?:AS\s+)?([A-Za-z_]\w*)""".r
        val afterParen = sql.substring(close + 1)
        val rest = AliasRe.findFirstMatchIn(afterParen) match {
          case Some(a) if !a.group(1).equalsIgnoreCase("on") =>
            afterParen.substring(a.end)
          case _ => afterParen
        }
        Some((sql.substring(0, m.end - 1) + "graft_using_subquery" + rest, sub))
      }
    }

  override def parsePlan(sqlText: String): LogicalPlan = {
    extractUsingSubquery(sqlText) match {
      case Some((rewritten, sub)) =>
        rewritten match {
          case MergeRe(_, _, _, _, _, _) =>
            return parseMerge(rewritten, Some(sub))
          case _ => // not our grammar after all: fall through on the ORIGINAL
        }
      case None =>
    }
    sqlText match {
      case MergeRe(_, _, _, _, _, _) => parseMerge(sqlText, None)
      case CompactRe(dir) => CompactPathCommand(dir)
      case VacuumRe(dir, keep) =>
        VacuumPathCommand(dir, Option(keep).map(_.toInt).getOrElse(2))
      case _ => delegate.parsePlan(sqlText)
    }
  }

  /** The MERGE grammar body; `subquery` is Some(sql) when the USING
    * side was an inline subquery (already spliced out of `text`).
    */
  private def parseMerge(text: String, subquery: Option[String]): LogicalPlan = text match {
    case MergeRe(dir, source, onClause, order, buckets, when) =>
      // AND-separated key specs: each `k` or `t.k = s.k` with both
      // sides naming the same column
      val keyCols = onClause.trim.split("(?i)\\s+AND\\s+").toSeq.map {
        case KeySpecRe(lhs, rhs) =>
          if (rhs != null && rhs.toLowerCase != lhs.toLowerCase)
            throw new UnsupportedOperationException(
              s"MERGE INTO '<path>' requires same-named equi-keys; got $lhs = $rhs")
          lhs
        case other =>
          throw new UnsupportedOperationException(
            s"MERGE INTO '<path>' ON clause must be AND-joined equi-keys; got '$other'")
      }
      // peel an optional delete branch off the front of the WHEN blob;
      // what remains must be the upsert pair (or nothing)
      val (deleteCond, rest) = when match {
        case null                 => (None, null)
        case DeleteWhenRe(c, r)   => (Some(Option(c).getOrElse("true")), r)
        case w                    => (None, w)
      }
      if (rest != null && UpsertWhenRe.findFirstIn(rest).isEmpty)
        throw new UnsupportedOperationException(
          "MERGE INTO '<path>' supports only an optional " +
            "'WHEN MATCHED [AND cond] THEN DELETE' branch followed by the upsert pair " +
            "'WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *'")
      // no WHEN clause at all defaults to the upsert pair; a lone
      // delete branch means delete-only (unselected rows take no action)
      val upsert = rest != null || when == null
      MergeIntoPathCommand(dir, subquery.getOrElse(source), keyCols,
        Option(order), Option(buckets).map(_.toInt), deleteCond, upsert,
        sourceIsQuery = subquery.isDefined)
    case _ => throw new IllegalStateException("parseMerge on a non-MERGE statement")
  }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression = delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType = delegate.parseTableSchema(sqlText)
  override def parseRoutineParam(sqlText: String): StructType = delegate.parseRoutineParam(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
}
