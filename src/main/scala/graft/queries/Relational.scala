package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.{decRevenue, decRevenueSql, decSum, decSumSql, t}

/** Relational operator surface (SURVEY.md §2.3–§2.8) re-expressed as
  * Catalyst-native DataFrame plans over the driver testdata, each with a
  * DuckDB oracle.
  *
  * Design rules (scale + determinism):
  *  - sums of doubles go through DECIMAL(18,2) so the value is
  *    order-independent (100-TB shuffles reorder addends; decimal sums
  *    are exact) — see [[graft.Tables.decSum]];
  *  - every query ends in an ORDER BY on a unique key set, both here and
  *    in the oracle, so row order is deterministic;
  *  - dims are broadcast explicitly (nation/region/centroids), facts are
  *    shuffled on their join keys only once.
  */
object Relational {

  private def q(name: String)(fn: (SparkSession, String) => DataFrame,
                              sql: String): (String, ((SparkSession, String) => DataFrame, String)) =
    name -> ((fn, sql))

  /** One cached sibling session with the MERGE INTO parser injected
    * (extensions apply only at session construction). Building a new
    * session per q_merge_sql invocation would leak a session per
    * Verify/Bench pass on the shared context. Constructed via
    * [[graft.plans.SiblingSession.withExtensions]], which never touches
    * the JVM-global default/active session registry — the previous
    * clear-then-getOrCreate dance left a window where concurrent threads
    * resolving SparkSession.active saw no session or the wrong one.
    */
  @volatile private var sqlSession: SparkSession = _
  private def mergeSqlSession(s: SparkSession): SparkSession = synchronized {
    if (sqlSession == null || sqlSession.sparkContext != s.sparkContext)
      sqlSession = graft.plans.SiblingSession.withExtensions(s, new graft.plans.GraftExtensions())
    sqlSession
  }

  // SURVEY §2.6 A1/A3 + the flagship pricing-summary aggregate (q1_agg).
  private val defs: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(
    q("q1_agg")(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_shipdate" < lit("1998-01-01").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            decSum($"l_quantity").as("sum_qty"),
            decSum($"l_extendedprice").as("sum_base_price"),
            decRevenue($"l_extendedprice", $"l_discount").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .withColumn("avg_qty", $"sum_qty" / $"count_order")
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      s"""SELECT l_returnflag, l_linestatus,
         |${decSumSql("l_quantity")} AS sum_qty,
         |${decSumSql("l_extendedprice")} AS sum_base_price,
         |${decRevenueSql("l_extendedprice", "l_discount")} AS sum_disc_price,
         |COUNT(*) AS count_order,
         |${decSumSql("l_quantity")} / COUNT(*) AS avg_qty
         |FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    // §2.1 S4 + §2.3 E7: scan with pushed filter + pruned projection.
    q("q_filter_project")(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .filter($"l_quantity" < 5 && $"l_shipdate" >= lit("1999-01-01").cast("timestamp"))
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
          .orderBy($"l_orderkey", $"l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_quantity < 5 AND l_shipdate >= TIMESTAMP '1999-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // §2.7 O1/O2: top-N with deterministic tiebreak.
    q("q_topn")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .limit(100)
      },
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin),

    // §2.5 J1/J2 generalized: fact-to-fact shuffle join + broadcast dims.
    q("q_join_agg")(
      (s, d) => {
        import s.implicits._
        val li = t(s, d, "lineitem")
        val o  = t(s, d, "orders")
        val c  = t(s, d, "customer")
        val n  = t(s, d, "nation")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"n_name")
          .agg(
            decRevenue($"l_extendedprice", $"l_discount").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy($"n_name")
      },
      s"""SELECT n_name, ${decRevenueSql("l_extendedprice", "l_discount")} AS revenue,
         |COUNT(*) AS n_items
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name ORDER BY n_name""".stripMargin),

    // §2.5: left-semi (EXISTS).
    q("q_semi_join")(
      (s, d) => {
        import s.implicits._
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter($"o_orderstatus" === "F")
        c.join(o, $"c_custkey" === $"o_custkey", "left_semi")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),

    // §2.5: left-anti (NOT EXISTS).
    q("q_anti_join")(
      (s, d) => {
        import s.implicits._
        val c = t(s, d, "customer")
        val o = t(s, d, "orders").filter($"o_orderstatus" === "F")
        c.join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .select($"c_custkey", $"c_name", $"c_mktsegment")
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin),

    // §2.2 K2 / §2.5 J1: the upsert MERGE expressed as its relational
    // core — full-outer join on the key, updates win per column.
    q("q_merge_full_outer")(
      (s, d) => {
        import s.implicits._
        val o = t(s, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
        val target  = o.filter($"o_orderkey" % 3 === 0).as("tg")
        val updates = o.filter($"o_orderkey" % 2 === 0)
          .withColumn("o_totalprice", $"o_totalprice" + 1.0).as("up")
        target.join(updates, col("tg.o_orderkey") === col("up.o_orderkey"), "full_outer")
          .select(
            coalesce(col("up.o_orderkey"), col("tg.o_orderkey")).as("o_orderkey"),
            coalesce(col("up.o_totalprice"), col("tg.o_totalprice")).as("o_totalprice"),
            coalesce(col("up.o_orderstatus"), col("tg.o_orderstatus")).as("o_orderstatus"),
            when(col("up.o_orderkey").isNotNull && col("tg.o_orderkey").isNotNull, "updated")
              .when(col("up.o_orderkey").isNotNull, "inserted")
              .otherwise("kept").as("merge_action"))
          .orderBy($"o_orderkey")
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus,
        |CASE WHEN up.o_orderkey IS NOT NULL AND tg.o_orderkey IS NOT NULL THEN 'updated'
        |     WHEN up.o_orderkey IS NOT NULL THEN 'inserted' ELSE 'kept' END AS merge_action
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // §2.2 K2 through §7.3's SQL surface: the same upsert driven as
    // `MERGE INTO` parsed by GraftExtensions — two batches land in a
    // real bucketed target on disk (second batch exercises the
    // no-ORDER-BY last-source-row-wins default), then the target reads
    // back for the oracle compare. The oracle is the relational
    // closed form: updates-win full outer over the two batches.
    q("q_merge_sql")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_sql")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_m1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_m2")
          s2.sql(s"MERGE INTO '$dir' USING graft_m1 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_m2 ON o_orderkey").collect()
          // pin the result so the on-disk target can be deleted eagerly
          // (repeated Verify/Bench runs must not accumulate temp trees)
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // K2 + the T-SQL MERGE delete branch: batch 1 seeds the target,
    // batch 2 carries mixed actions — keys divisible by 10 hit the
    // WHEN MATCHED ... DELETE branch (matched → key removed;
    // unmatched → falls through to the insert branch, exactly as in
    // T-SQL), the rest upsert. Oracle is the relational closed form:
    // updates-win full outer minus the keys present on BOTH sides that
    // the delete condition selects.
    q("q_merge_delete")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_del")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_d1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_d2")
          s2.sql(s"MERGE INTO '$dir' USING graft_d1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_d2 ON o_orderkey " +
            "WHEN MATCHED AND o_orderkey % 10 = 0 THEN DELETE " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus FROM orders
        |       WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |WHERE NOT (tg.o_orderkey IS NOT NULL AND up.o_orderkey IS NOT NULL
        |           AND up.o_orderkey % 10 = 0)
        |ORDER BY o_orderkey""".stripMargin),

    // CDC EXTRACT between two merge-target VERSIONS
    // ([[graft.merge.SnapshotDiff.diff]] over readTargetAt(v1) vs
    // readTargetAt(v2)): "what happened between version 1 and 2"
    // without replaying the merge log — inserts, deletes (the %10
    // tombstones), and updates with the count of columns that
    // actually changed; untouched keys are absent. One full-outer
    // shuffle on the key; null-safe column compares. The fixture is
    // q_merge_delete's two-merge lifecycle, so the oracle is its
    // closed form classified per key.
    q("q_snapshot_diff")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_diff")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_sd1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_sd2")
          s2.sql(s"MERGE INTO '$dir' USING graft_sd1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_sd2 ON o_orderkey " +
            "WHEN MATCHED AND o_orderkey % 10 = 0 THEN DELETE " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *").collect()
          val vs = graft.merge.MergeWriter.listVersions(dir.toString)
          def at(v: Int) = graft.merge.MergeWriter.readTargetAt(s2, dir.toString, v)
            .get.select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          graft.merge.SnapshotDiff.diff(at(vs(vs.length - 2)), at(vs.last),
              Seq("o_orderkey"))
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |  COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |  COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |  FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |  WHERE NOT (tg.o_orderkey IS NOT NULL AND up.o_orderkey IS NOT NULL
        |             AND up.o_orderkey % 10 = 0)),
        |d AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
        |  CASE WHEN a.o_orderkey IS NULL THEN 'insert'
        |       WHEN b.o_orderkey IS NULL THEN 'delete'
        |       ELSE 'update' END AS op,
        |  CASE WHEN a.o_orderkey IS NULL OR b.o_orderkey IS NULL THEN CAST(2 AS BIGINT)
        |       ELSE CAST((CASE WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
        |                  THEN 1 ELSE 0 END)
        |          + (CASE WHEN a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
        |             THEN 1 ELSE 0 END) AS BIGINT) END AS n_changed
        |  FROM tg a FULL OUTER JOIN v2 b ON b.o_orderkey = a.o_orderkey)
        |SELECT o_orderkey, op, n_changed FROM d
        |WHERE op <> 'update' OR n_changed > 0
        |ORDER BY o_orderkey""".stripMargin),

    // K2 with a COMPOSITE merge key: the MERGE matches on the
    // (l_orderkey, l_linenumber) conjunction and buckets by the key
    // tuple's hash. The testdata's lineitem repeats tuples, so both
    // sides reduce to one row per tuple first (deterministic MAX) —
    // otherwise the oracle's full outer would multiply where the
    // merge's by-key semantics dedup. Oracle is the closed form:
    // updates-win full outer on both key columns.
    q("q_merge_composite")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_comp")
        val s2 = mergeSqlSession(s)
        try {
          val li = t(s2, d, "lineitem")
            .groupBy($"l_orderkey", $"l_linenumber")
            .agg(max($"l_quantity").as("l_quantity"),
              max($"l_returnflag").as("l_returnflag"))
          li.filter($"l_orderkey" % 6 === 0).createOrReplaceTempView("graft_k1")
          li.filter($"l_orderkey" % 4 === 0)
            .withColumn("l_quantity", $"l_quantity" + 1.0)
            .createOrReplaceTempView("graft_k2")
          s2.sql(s"MERGE INTO '$dir' USING graft_k1 ON l_orderkey AND l_linenumber").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_k2 " +
            "ON t.l_orderkey = s.l_orderkey AND t.l_linenumber = s.l_linenumber").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag")
            .orderBy($"l_orderkey", $"l_linenumber")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH li AS (SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity,
        |            MAX(l_returnflag) AS l_returnflag FROM lineitem GROUP BY 1, 2),
        |tg AS (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM li WHERE l_orderkey % 6 = 0),
        |up AS (SELECT l_orderkey, l_linenumber, l_quantity + 1.0 AS l_quantity, l_returnflag FROM li WHERE l_orderkey % 4 = 0)
        |SELECT COALESCE(up.l_orderkey, tg.l_orderkey) AS l_orderkey,
        |COALESCE(up.l_linenumber, tg.l_linenumber) AS l_linenumber,
        |COALESCE(up.l_quantity, tg.l_quantity) AS l_quantity,
        |COALESCE(up.l_returnflag, tg.l_returnflag) AS l_returnflag
        |FROM tg FULL OUTER JOIN up
        |ON tg.l_orderkey = up.l_orderkey AND tg.l_linenumber = up.l_linenumber
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // K2 + the T-SQL partial-column UPDATE SET (sparse CDC — the
    // change stream carries only the changed columns): matched rows
    // get ONLY o_totalprice replaced (through the SET expression),
    // o_orderstatus keeps its TARGET value; inserts take the raw
    // source row, including the status and WITHOUT the SET
    // expression's +0.5. Oracle is the closed form: a full outer
    // where the assigned column routes matched → expr / insert → raw,
    // and the unassigned column routes matched → target.
    q("q_merge_partial")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_part")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_p1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("X"))
            .createOrReplaceTempView("graft_p2")
          s2.sql(s"MERGE INTO '$dir' USING graft_p1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_p2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice + 0.5 " +
            "WHEN NOT MATCHED THEN INSERT *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'X' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |CASE WHEN up.o_orderkey IS NOT NULL AND tg.o_orderkey IS NOT NULL THEN up.o_totalprice + 0.5
        |     WHEN up.o_orderkey IS NOT NULL THEN up.o_totalprice
        |     ELSE tg.o_totalprice END AS o_totalprice,
        |CASE WHEN tg.o_orderkey IS NOT NULL THEN tg.o_orderstatus
        |     ELSE up.o_orderstatus END AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // K2 + the conditional update branch (T-SQL WHEN MATCHED AND cond
    // THEN UPDATE — out-of-order / selective-apply CDC): matched rows
    // update only where the source-side condition fires (keys % 4 = 0);
    // non-firing matched rows keep their target values entirely, while
    // inserts land regardless of the condition. Oracle is the closed
    // form: a full outer where the update side wins only on
    // (matched AND cond) or insert.
    q("q_merge_conditional")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_cond")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_c1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("U"))
            .createOrReplaceTempView("graft_c2")
          s2.sql(s"MERGE INTO '$dir' USING graft_c1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_c2 ON o_orderkey " +
            "WHEN MATCHED AND s.o_orderkey % 4 = 0 THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'U' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |CASE WHEN up.o_orderkey IS NOT NULL AND (tg.o_orderkey IS NULL OR up.o_orderkey % 4 = 0)
        |     THEN up.o_totalprice ELSE tg.o_totalprice END AS o_totalprice,
        |CASE WHEN up.o_orderkey IS NOT NULL AND (tg.o_orderkey IS NULL OR up.o_orderkey % 4 = 0)
        |     THEN up.o_orderstatus ELSE tg.o_orderstatus END AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // K2 + WHEN NOT MATCHED BY SOURCE THEN DELETE (full-snapshot
    // synchronization): after the sync merge the target IS the source
    // snapshot — matched rows updated, new rows inserted, rows absent
    // from the source removed. Oracle is the closed form: the source
    // view itself (which only equals the target if the stale %3 rows
    // actually dropped).
    q("q_merge_sync")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_sync")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_s1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_s2")
          s2.sql(s"MERGE INTO '$dir' USING graft_s1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_s2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
            "WHEN NOT MATCHED BY SOURCE THEN DELETE").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderkey % 2 = 0
        |ORDER BY o_orderkey""".stripMargin),

    // K2 + the conditional insert branch (T-SQL WHEN NOT MATCHED AND
    // cond THEN INSERT — gated admission of new keys, the first thing
    // a filtering CDC consumer reaches for): matched rows update as
    // usual, but an unmatched source row inserts only when the
    // source-side condition fires (% 4 = 0); the rest take no action.
    // Oracle: full outer where source-only rows survive only under the
    // condition.
    q("q_merge_insert_cond")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_inscond")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_ic1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("I"))
            .createOrReplaceTempView("graft_ic2")
          s2.sql(s"MERGE INTO '$dir' USING graft_ic1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_ic2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED AND s.o_orderkey % 4 = 0 THEN INSERT *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'I' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |WHERE tg.o_orderkey IS NOT NULL OR up.o_orderkey % 4 = 0
        |ORDER BY o_orderkey""".stripMargin),

    // K2 + the explicit INSERT column list (the reference's production
    // form, 005_sp_migrate.sql:20-24 INSERT (OrderId, ...) VALUES
    // (...)): inserted rows take the VALUES expressions — here a
    // +10.0 admission adjustment — and NULL for the unlisted
    // o_orderstatus, while matched rows update every column from the
    // source as usual.
    q("q_merge_insert_cols")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_inscols")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_il1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("C"))
            .createOrReplaceTempView("graft_il2")
          s2.sql(s"MERGE INTO '$dir' USING graft_il1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_il2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET * " +
            "WHEN NOT MATCHED THEN INSERT (o_orderkey, o_totalprice) " +
            "VALUES (s.o_orderkey, s.o_totalprice + 10.0)").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'C' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |CASE WHEN up.o_orderkey IS NOT NULL AND tg.o_orderkey IS NOT NULL THEN up.o_totalprice
        |     WHEN up.o_orderkey IS NOT NULL THEN up.o_totalprice + 10.0
        |     ELSE tg.o_totalprice END AS o_totalprice,
        |CASE WHEN up.o_orderkey IS NOT NULL AND tg.o_orderkey IS NOT NULL THEN up.o_orderstatus
        |     WHEN up.o_orderkey IS NOT NULL THEN NULL
        |     ELSE tg.o_orderstatus END AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // The mirror-deletes-only sync form (WHEN NOT MATCHED BY SOURCE
    // THEN DELETE with no other branch): the source acts purely as the
    // presence set — matched target rows keep their ORIGINAL bytes
    // (the +1.0 in the source view must NOT apply), absent keys drop,
    // source-only keys do not insert. Result: exactly the %6 keys with
    // untouched values.
    q("q_merge_sync_only")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_synconly")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_so1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_so2")
          s2.sql(s"MERGE INTO '$dir' USING graft_so1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_so2 ON o_orderkey " +
            "WHEN NOT MATCHED BY SOURCE THEN DELETE").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderkey % 6 = 0
        |ORDER BY o_orderkey""".stripMargin),

    // Insert-only MERGE (WHEN NOT MATCHED THEN INSERT with no matched
    // branch — T-SQL ignore-if-exists): existing target rows keep
    // their bytes even where the source carries changed values; only
    // genuinely new keys land. Oracle: target wins on match.
    q("q_merge_insert_only")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_insonly")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_io1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("N"))
            .createOrReplaceTempView("graft_io2")
          s2.sql(s"MERGE INTO '$dir' USING graft_io1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_io2 ON o_orderkey " +
            "WHEN NOT MATCHED THEN INSERT *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'N' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(tg.o_orderkey, up.o_orderkey) AS o_orderkey,
        |COALESCE(tg.o_totalprice, up.o_totalprice) AS o_totalprice,
        |COALESCE(tg.o_orderstatus, up.o_orderstatus) AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // Update-only MERGE (WHEN MATCHED THEN UPDATE with no insert
    // branch — T-SQL update-if-exists CDC): matched rows take the
    // source values, unmatched source rows are inert. Oracle: a left
    // join from the target.
    q("q_merge_update_only")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_updonly")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_uo1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("U"))
            .createOrReplaceTempView("graft_uo2")
          s2.sql(s"MERGE INTO '$dir' USING graft_uo1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_uo2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET *").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'U' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT tg.o_orderkey AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |FROM tg LEFT JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY tg.o_orderkey""".stripMargin),

    // The last T-SQL branch family member: WHEN NOT MATCHED BY SOURCE
    // THEN UPDATE — flag stale rows instead of deleting them. Matched
    // rows take the source values, new keys insert, and target rows
    // the source no longer carries get o_orderstatus = 'S' with their
    // price untouched.
    q("q_merge_sync_update")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_merge_syncupd")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_su1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .withColumn("o_orderstatus", lit("U"))
            .createOrReplaceTempView("graft_su2")
          s2.sql(s"MERGE INTO '$dir' USING graft_su1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_su2 ON o_orderkey " +
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT * " +
            "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET o_orderstatus = 'S'").collect()
          graft.merge.MergeWriter.readTarget(s2, dir.toString).get
            .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
            .orderBy($"o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, 'U' AS o_orderstatus
        |       FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |CASE WHEN up.o_orderkey IS NOT NULL THEN up.o_orderstatus ELSE 'S' END AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |ORDER BY o_orderkey""".stripMargin),

    // Composite-key point lookups through the SQL surface: the same
    // composite target, read back via graft_target_lookup with grouped
    // (l_orderkey, l_linenumber) tuples — only the buckets those
    // tuples hash into are read (ExtensionsSpec pins the file count).
    // (7,1) is in neither batch: absent tuples return nothing.
    q("q_target_lookup_composite")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_lookup_comp")
        val s2 = mergeSqlSession(s)
        try {
          val li = t(s2, d, "lineitem")
            .groupBy($"l_orderkey", $"l_linenumber")
            .agg(max($"l_quantity").as("l_quantity"),
              max($"l_returnflag").as("l_returnflag"))
          li.filter($"l_orderkey" % 6 === 0).createOrReplaceTempView("graft_lk1")
          li.filter($"l_orderkey" % 4 === 0)
            .withColumn("l_quantity", $"l_quantity" + 1.0)
            .createOrReplaceTempView("graft_lk2")
          s2.sql(s"MERGE INTO '$dir' USING graft_lk1 ON l_orderkey AND l_linenumber").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_lk2 ON l_orderkey AND l_linenumber").collect()
          s2.sql("SELECT l_orderkey, l_linenumber, l_quantity FROM " +
            s"graft_target_lookup('$dir', 12, 5, 24, 1, 36, 1, 7, 1) " +
            "ORDER BY l_orderkey, l_linenumber")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH li AS (SELECT l_orderkey, l_linenumber, MAX(l_quantity) AS l_quantity,
        |            MAX(l_returnflag) AS l_returnflag FROM lineitem GROUP BY 1, 2),
        |tg AS (SELECT l_orderkey, l_linenumber, l_quantity FROM li WHERE l_orderkey % 6 = 0),
        |up AS (SELECT l_orderkey, l_linenumber, l_quantity + 1.0 AS l_quantity FROM li WHERE l_orderkey % 4 = 0)
        |SELECT COALESCE(up.l_orderkey, tg.l_orderkey) AS l_orderkey,
        |COALESCE(up.l_linenumber, tg.l_linenumber) AS l_linenumber,
        |COALESCE(up.l_quantity, tg.l_quantity) AS l_quantity
        |FROM tg FULL OUTER JOIN up
        |ON tg.l_orderkey = up.l_orderkey AND tg.l_linenumber = up.l_linenumber
        |WHERE (COALESCE(up.l_orderkey, tg.l_orderkey), COALESCE(up.l_linenumber, tg.l_linenumber))
        |      IN ((12, 5), (24, 1), (36, 1), (7, 1))
        |ORDER BY l_orderkey, l_linenumber""".stripMargin),

    // K2 read side at point-lookup granularity: the same two-batch
    // target, read back through graft_target_lookup — the bucket-pruned
    // scan (only the buckets the keys hash into; ExtensionsSpec pins
    // the file-count pruning). Key 7 is in neither batch, so the
    // lookup also proves absent keys return nothing.
    q("q_target_lookup")(
      (s, d) => {
        import s.implicits._
        val dir = java.nio.file.Files.createTempDirectory("graft_target_lookup")
        val s2 = mergeSqlSession(s)
        try {
          val o = t(s2, d, "orders").select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
          o.filter($"o_orderkey" % 3 === 0).createOrReplaceTempView("graft_l1")
          o.filter($"o_orderkey" % 2 === 0)
            .withColumn("o_totalprice", $"o_totalprice" + 1.0)
            .createOrReplaceTempView("graft_l2")
          s2.sql(s"MERGE INTO '$dir' USING graft_l1 ON o_orderkey").collect()
          s2.sql(s"MERGE INTO '$dir' USING graft_l2 ON o_orderkey").collect()
          s2.sql("SELECT o_orderkey, o_totalprice, o_orderstatus " +
            s"FROM graft_target_lookup('$dir', 4, 6, 7, 9, 32) ORDER BY o_orderkey")
            .localCheckpoint()
        } finally graft.util.Fs.deleteRecursively(dir)
      },
      """WITH tg AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 0),
        |up AS (SELECT o_orderkey, o_totalprice + 1.0 AS o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(up.o_orderkey, tg.o_orderkey) AS o_orderkey,
        |COALESCE(up.o_totalprice, tg.o_totalprice) AS o_totalprice,
        |COALESCE(up.o_orderstatus, tg.o_orderstatus) AS o_orderstatus
        |FROM tg FULL OUTER JOIN up ON tg.o_orderkey = up.o_orderkey
        |WHERE COALESCE(up.o_orderkey, tg.o_orderkey) IN (4, 6, 7, 9, 32)
        |ORDER BY o_orderkey""".stripMargin),

    // §2.7 W1: row_number — latest order per customer.
    q("q_window_rownum")(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".desc, $"o_orderkey".desc)
        t(s, d, "orders")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"o_custkey", $"o_orderkey", $"o_orderdate")
          .orderBy($"o_custkey")
      },
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |SELECT o_custkey, o_orderkey, o_orderdate,
        |row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin),

    // §2.7: running (prefix) aggregate per partition — decimal-exact.
    q("q_window_running")(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"l_suppkey")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "lineitem")
          .filter($"l_suppkey" < 100)
          .withColumn("running_qty",
            sum($"l_quantity".cast(DecimalType(18, 2))).over(w).cast("double"))
          .select($"l_suppkey", $"l_orderkey", $"l_linenumber", $"running_qty")
          .orderBy($"l_suppkey", $"l_orderkey", $"l_linenumber")
      },
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |  PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey < 100
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin),

    // §2.7: rank + lag analytics.
    q("q_window_lag_rank")(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
        t(s, d, "orders")
          .withColumn("rk", rank().over(w))
          .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
          .select($"o_custkey", $"o_orderkey", $"rk", $"prev_price")
          .orderBy($"o_custkey", $"rk", $"o_orderkey")
      },
      """SELECT o_custkey, o_orderkey,
        |rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk,
        |lag(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, rk, o_orderkey""".stripMargin),

    // Set operations (engine surface beyond the reference — Spark/DuckDB parity).
    q("q_set_union")(
      (s, d) => {
        import s.implicits._
        t(s, d, "customer").filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
          .union(t(s, d, "orders").filter($"o_orderstatus" === "F").select($"o_custkey".as("c_custkey")))
          .distinct()
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY c_custkey""".stripMargin),

    q("q_set_intersect")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders").filter($"o_orderstatus" === "O").select($"o_custkey")
          .intersect(t(s, d, "orders").filter($"o_orderstatus" === "F").select($"o_custkey"))
          .orderBy($"o_custkey")
      },
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin),

    q("q_set_except")(
      (s, d) => {
        import s.implicits._
        t(s, d, "customer").select($"c_custkey")
          .except(t(s, d, "orders").filter($"o_orderstatus" === "P").select($"o_custkey"))
          .orderBy($"c_custkey")
      },
      """SELECT c_custkey FROM customer
        |EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY c_custkey""".stripMargin),

    // Multi-dim aggregates (free Spark surface; §2.6 note).
    q("q_rollup")(
      (s, d) => {
        import s.implicits._
        t(s, d, "lineitem")
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("n"), decSum($"l_quantity").as("qty"))
          .select(
            coalesce($"l_returnflag", lit("(all)")).as("flag"),
            coalesce($"l_linestatus", lit("(all)")).as("status"),
            $"n", $"qty")
          .orderBy($"flag", $"status")
      },
      s"""SELECT COALESCE(l_returnflag, '(all)') AS flag, COALESCE(l_linestatus, '(all)') AS status,
         |COUNT(*) AS n, ${decSumSql("l_quantity")} AS qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY flag, status""".stripMargin),

    q("q_cube")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("n"), decSum($"o_totalprice").as("total"))
          .select(
            coalesce($"o_orderstatus", lit("(all)")).as("status"),
            coalesce($"o_orderpriority", lit("(all)")).as("priority"),
            $"n", $"total")
          .orderBy($"status", $"priority")
      },
      s"""SELECT COALESCE(o_orderstatus, '(all)') AS status, COALESCE(o_orderpriority, '(all)') AS priority,
         |COUNT(*) AS n, ${decSumSql("o_totalprice")} AS total
         |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin),

    // GROUPING SETS — the asymmetric aggregation lattice neither
    // ROLLUP nor CUBE expresses (here: (flag,status), (status), ()).
    // SQL-only surface in Spark (no DataFrame verb) — served through
    // the session parser; identical text runs on both engines, with
    // the (all) coalescing dodging NULLS FIRST/LAST divergence.
    q("q_grouping_sets")(
      (s, d) => {
        t(s, d, "lineitem").createOrReplaceTempView("li_gsets")
        s.sql(s"""SELECT COALESCE(l_returnflag, '(all)') AS flag,
          |COALESCE(l_linestatus, '(all)') AS status,
          |COUNT(*) AS n, ${decSumSql("l_quantity")} AS qty
          |FROM li_gsets
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
          |ORDER BY flag, status""".stripMargin)
      },
      s"""SELECT COALESCE(l_returnflag, '(all)') AS flag,
         |COALESCE(l_linestatus, '(all)') AS status,
         |COUNT(*) AS n, ${decSumSql("l_quantity")} AS qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
         |ORDER BY flag, status""".stripMargin),

    // §2.4 T1: CASE bucketing (amount_category).
    q("q_case_bucket")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .withColumn("price_category",
            when($"o_totalprice" < 100000, "Low")
              .when($"o_totalprice" < 300000, "Medium")
              .otherwise("High"))
          .groupBy($"price_category")
          .agg(count(lit(1)).as("n"), decSum($"o_totalprice").as("total"))
          .orderBy($"price_category")
      },
      s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'Low'
         |WHEN o_totalprice < 300000 THEN 'Medium' ELSE 'High' END AS price_category,
         |COUNT(*) AS n, ${decSumSql("o_totalprice")} AS total
         |FROM orders GROUP BY 1 ORDER BY price_category""".stripMargin),

    // §2.3 E3/E4: fallible casts (TRY_CAST semantics).
    q("q_try_cast")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .select(
            $"o_orderkey",
            // Render DECIMAL/DATE as DOUBLE/ISO-string: the driver hash is
            // sensitive to raw decimal/date carriage even when values match.
            expr("cast(try_cast(cast(cast(o_totalprice as decimal(18,2)) as string) as decimal(18,2)) as double)").as("amt"),
            expr("cast(try_cast(o_orderpriority as decimal(18,2)) as double)").as("bad_amt"),
            expr("date_format(try_cast(cast(cast(o_orderdate as date) as string) as date), 'yyyy-MM-dd')").as("od"),
            expr("date_format(try_cast(o_orderstatus as date), 'yyyy-MM-dd')").as("bad_date"))
          .orderBy($"o_orderkey")
      },
      """SELECT o_orderkey,
        |CAST(TRY_CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS DECIMAL(18,2)) AS DOUBLE) AS amt,
        |CAST(TRY_CAST(o_orderpriority AS DECIMAL(18,2)) AS DOUBLE) AS bad_amt,
        |CAST(TRY_CAST(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS DATE) AS VARCHAR) AS od,
        |CAST(TRY_CAST(o_orderstatus AS DATE) AS VARCHAR) AS bad_date
        |FROM orders ORDER BY o_orderkey""".stripMargin),

    // §2.3 E1/E2/E5/E6: trim / empty→NULL / reject blank key / default.
    q("q_extract_clean")(
      (s, d) => {
        import s.implicits._
        val raw = t(s, d, "customer")
          .select(
            $"c_custkey",
            concat(lit("  "), $"c_name", lit("  ")).as("name_raw"),
            when($"c_custkey" % 7 === 0, "   ").otherwise($"c_mktsegment").as("seg_raw"))
        raw.select(
            $"c_custkey",
            when(trim($"name_raw") === "", null).otherwise(trim($"name_raw")).as("name"),
            coalesce(when(trim($"seg_raw") === "", null).otherwise(trim($"seg_raw")), lit("UNKNOWN")).as("segment"))
          .filter($"name".isNotNull)
          .orderBy($"c_custkey")
      },
      """WITH raw AS (SELECT c_custkey, '  ' || c_name || '  ' AS name_raw,
        |CASE WHEN c_custkey % 7 = 0 THEN '   ' ELSE c_mktsegment END AS seg_raw FROM customer)
        |SELECT c_custkey, NULLIF(TRIM(name_raw), '') AS name,
        |COALESCE(NULLIF(TRIM(seg_raw), ''), 'UNKNOWN') AS segment
        |FROM raw WHERE NULLIF(TRIM(name_raw), '') IS NOT NULL
        |ORDER BY c_custkey""".stripMargin),

    // §2.6: distinct aggregate.
    q("q_count_distinct")(
      (s, d) => {
        import s.implicits._
        t(s, d, "customer")
          .groupBy($"c_mktsegment")
          .agg(countDistinct($"c_nationkey").as("n_nations"), count(lit(1)).as("n"))
          .orderBy($"c_mktsegment")
      },
      """SELECT c_mktsegment, COUNT(DISTINCT c_nationkey) AS n_nations, COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin),

    // §2.6 A2: COALESCE(MAX)+1 sequence pattern.
    q("q_next_seq")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders").agg((coalesce(max($"o_orderkey"), lit(0L)) + 1L).as("next_run_number"))
      },
      "SELECT COALESCE(MAX(o_orderkey), 0) + 1 AS next_run_number FROM orders"),

    // §2.6 A4: status-lattice rollup (run status from step statuses).
    q("q_status_rollup")(
      (s, d) => {
        import s.implicits._
        t(s, d, "orders")
          .groupBy($"o_custkey")
          .agg(
            sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_final"),
            count(lit(1)).as("n_orders"),
            min($"o_orderdate").as("first_order"),
            max($"o_orderdate").as("last_order"))
          .select(
            $"o_custkey",
            when($"n_final" === $"n_orders", "AllFinal")
              .when($"n_final" > 0, "Mixed")
              .otherwise("NoneFinal").as("status_rollup"),
            $"n_orders", $"first_order", $"last_order")
          .orderBy($"o_custkey")
      },
      """SELECT o_custkey,
        |CASE WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = COUNT(*) THEN 'AllFinal'
        |     WHEN SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) > 0 THEN 'Mixed'
        |     ELSE 'NoneFinal' END AS status_rollup,
        |COUNT(*) AS n_orders, MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin),

    // §2.10 C7 batch equivalent of the tumbling event-time window.
    q("q_events_hourly")(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
          .agg(count(lit(1)).as("n"), decSum($"value").as("total_value"))
          .orderBy($"hour", $"event_type")
      },
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |COUNT(*) AS n, ${decSumSql("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),

    // Hourly event-rate anomaly flags — the monitoring op over the
    // C7 ingest stream: flag hours whose event count exceeds the
    // corpus mean by more than 2 population standard deviations,
    // decided ENTIRELY in the integer/DECIMAL domain via the
    // cross-multiplied z-test
    //   (n·x − S)² > 4·(n·Sq − S²)   [and n·x > S: positive side only]
    // where S=Σx, Sq=Σx² over the n hourly buckets — no float mean,
    // no sqrt, reproducible on any engine. DECIMAL widths hold
    // exactness to ~1e6 buckets of ~1e10 events each (1e16 events —
    // beyond any 100 TB telemetry); the 1-row stats frame broadcasts.
    q("q_event_spikes")(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        def d6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(6, 0))
        def d10(c: org.apache.spark.sql.Column) = c.cast(DecimalType(10, 0))
        def d15(c: org.apache.spark.sql.Column) = c.cast(DecimalType(15, 0))
        def d26(c: org.apache.spark.sql.Column) = c.cast(DecimalType(26, 0))
        val hourly = t(s, d, "events")
          .groupBy(date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val stats = hourly.agg(
          count(lit(1)).as("n"), sum($"cnt").as("s"),
          sum(d10($"cnt") * d10($"cnt")).as("sq"))
        hourly.crossJoin(broadcast(stats))
          .select($"hour", $"cnt",
            (d6($"n") * d10($"cnt") > d15($"s") &&
              (d6($"n") * d10($"cnt") - d15($"s")) *
                (d6($"n") * d10($"cnt") - d15($"s")) >
              lit(4).cast(DecimalType(1, 0)) *
                (d6($"n") * d26($"sq") - d15($"s") * d15($"s"))).as("is_spike"))
          .orderBy($"hour")
      },
      """WITH hourly AS (SELECT date_trunc('hour', ts) AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
        |st AS (SELECT CAST(COUNT(*) AS DECIMAL(6,0)) AS n,
        |  CAST(SUM(cnt) AS DECIMAL(15,0)) AS s,
        |  CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * CAST(cnt AS DECIMAL(10,0)))
        |    AS DECIMAL(26,0)) AS sq FROM hourly)
        |SELECT hour, cnt,
        |  (n * CAST(cnt AS DECIMAL(10,0)) > s AND
        |   (n * CAST(cnt AS DECIMAL(10,0)) - s) * (n * CAST(cnt AS DECIMAL(10,0)) - s)
        |     > CAST(4 AS DECIMAL(1,0)) * (n * sq - s * s)) AS is_spike
        |FROM hourly CROSS JOIN st ORDER BY hour""".stripMargin),

    // SEASONAL anomaly flags — q_event_spikes with an hour-of-day
    // baseline: a 3 a.m. cell is judged against other 3 a.m. cells
    // across days, not the global mean, so a quiet hour's burst that
    // hides under the daily peak is caught and the nightly lull stops
    // reading as 24 anomalies. Same integer/DECIMAL cross-multiplied
    // 2σ z-test (no float mean, no sqrt); the per-hour-of-day stats
    // frame is 24 rows, joined back broadcast. Baseline over OBSERVED
    // (hod, day) cells — the q_event_spikes convention.
    q("q_seasonal_spikes")(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.types.DecimalType
        def d6(c: org.apache.spark.sql.Column) = c.cast(DecimalType(6, 0))
        def d10(c: org.apache.spark.sql.Column) = c.cast(DecimalType(10, 0))
        def d15(c: org.apache.spark.sql.Column) = c.cast(DecimalType(15, 0))
        def d26(c: org.apache.spark.sql.Column) = c.cast(DecimalType(26, 0))
        val cells = t(s, d, "events")
          .groupBy(hour($"ts").cast("long").as("hod"), to_date($"ts").as("day"))
          .agg(count(lit(1)).as("cnt"))
        val stats = cells.groupBy($"hod")
          .agg(count(lit(1)).as("n"), sum($"cnt").as("s"),
            sum(d10($"cnt") * d10($"cnt")).as("sq"))
        cells.join(broadcast(stats), Seq("hod"))
          .select($"hod", $"day", $"cnt",
            (d6($"n") * d10($"cnt") > d15($"s") &&
              (d6($"n") * d10($"cnt") - d15($"s")) *
                (d6($"n") * d10($"cnt") - d15($"s")) >
              lit(4).cast(DecimalType(1, 0)) *
                (d6($"n") * d26($"sq") - d15($"s") * d15($"s"))).as("is_spike"))
          .orderBy($"hod", $"day")
      },
      """WITH cells AS (SELECT CAST(date_part('hour', ts) AS BIGINT) AS hod,
        |  CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT hod, CAST(COUNT(*) AS DECIMAL(6,0)) AS n,
        |  CAST(SUM(cnt) AS DECIMAL(15,0)) AS s,
        |  CAST(SUM(CAST(cnt AS DECIMAL(10,0)) * CAST(cnt AS DECIMAL(10,0)))
        |    AS DECIMAL(26,0)) AS sq FROM cells GROUP BY 1)
        |SELECT cells.hod, day, cnt,
        |  (n * CAST(cnt AS DECIMAL(10,0)) > s AND
        |   (n * CAST(cnt AS DECIMAL(10,0)) - s) * (n * CAST(cnt AS DECIMAL(10,0)) - s)
        |     > CAST(4 AS DECIMAL(1,0)) * (n * sq - s * s)) AS is_spike
        |FROM cells JOIN st ON st.hod = cells.hod
        |ORDER BY cells.hod, day""".stripMargin),
    // CUSUM change-point statistic over the hourly series per event
    // type — the sequential drift detector (Page 1954) in its
    // PARALLEL prefix form: S_t = P_t − min(0, min_{j≤t} P_j) with
    // P_t = Σ_{i≤t}(x_i − K), so the apparently-sequential recurrence
    // becomes one running sum + one running min, both inside the
    // event_type partition. K (the allowance) is the per-type integer
    // mean (sum div n — division conventions agree on nonnegative
    // counts); all integer end-to-end, flag at S > 3K. Catches a
    // SUSTAINED level shift the per-cell z-tests (q_event_spikes /
    // q_seasonal_spikes) can't see: ten consecutive hours each 1σ
    // high never trips a cell test but accumulates in S.
    q("q_cusum_shift")(
      (s, d) => {
        import s.implicits._
        val hourly = t(s, d, "events")
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val k = hourly.groupBy($"event_type")
          .agg(expr("sum(cnt) div count(1)").as("kk"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"event_type").orderBy($"hour")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        hourly.join(broadcast(k), Seq("event_type"))
          .withColumn("p", sum($"cnt" - $"kk").over(w))
          .withColumn("s_stat", $"p" - least($"p".cast("long"), lit(0L),
            min($"p").over(w)))
          .select($"event_type", $"hour", $"cnt", $"s_stat",
            ($"s_stat" > lit(3L) * $"kk").as("is_shift"))
          .orderBy($"event_type", $"hour")
      },
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |k AS (SELECT event_type, SUM(cnt) // COUNT(*) AS kk
        |  FROM hourly GROUP BY 1),
        |pp AS (SELECT h.event_type, hour, cnt, kk,
        |  SUM(cnt - kk) OVER (PARTITION BY h.event_type ORDER BY hour
        |    ROWS UNBOUNDED PRECEDING) AS p
        |  FROM hourly h JOIN k ON k.event_type = h.event_type),
        |ss AS (SELECT *, p - LEAST(p, 0, MIN(p) OVER (
        |    PARTITION BY event_type ORDER BY hour ROWS UNBOUNDED PRECEDING))
        |  AS s_stat FROM pp)
        |SELECT event_type, hour, cnt, CAST(s_stat AS BIGINT) AS s_stat,
        |  (s_stat > 3 * kk) AS is_shift
        |FROM ss ORDER BY event_type, hour""".stripMargin),
    // Burstiness (index of dispersion / Fano factor) of the hourly
    // series per event type: variance-to-mean as exact integer ppm —
    // 1e6·(n·Σx² − (Σx)²) div (n·Σx) with DECIMAL(38,0) products
    // (n·Σx² ≈ 1e25 at 100 TB cell counts) — the
    // overdispersion signal that separates Poisson-like organic
    // traffic (ppm ≈ 1e6) from bursty/bot-like arrivals (≫ 1e6).
    // Integer sufficient statistics ship alongside so readers can
    // re-derive any dispersion convention.
    q("q_burstiness")(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n_hours"), sum($"cnt").as("s"),
            sum($"cnt" * $"cnt").as("sq"))
          .select($"event_type", $"n_hours", $"s", $"sq",
            expr("""CAST(CAST(1000000 AS DECIMAL(38,0)) *
                   | (CAST(n_hours AS DECIMAL(38,0)) * sq - CAST(s AS DECIMAL(38,0)) * s)
                   | div (CAST(n_hours AS DECIMAL(38,0)) * s) AS BIGINT)"""
              .stripMargin).as("fano_ppm"))
          .orderBy($"event_type")
      },
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS cnt FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
        |  CAST(SUM(cnt) AS BIGINT) AS s, CAST(SUM(cnt * cnt) AS BIGINT) AS sq
        |  FROM hourly GROUP BY 1)
        |SELECT event_type, n_hours, s, sq,
        |  CAST(CAST(1000000 AS HUGEINT) *
        |    (CAST(n_hours AS HUGEINT) * sq - CAST(s AS HUGEINT) * s)
        |    // (CAST(n_hours AS HUGEINT) * s) AS BIGINT) AS fano_ppm
        |FROM st ORDER BY event_type""".stripMargin),
    // Sessionization (gap > 30 min) — lag + prefix-sum windows; the batch
    // twin of the streaming state op in graft.streaming.
    q("q_events_sessionize")(
      (s, d) => {
        import s.implicits._
        val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        val run    = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "events")
          .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
          .withColumn("is_new",
            when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1).otherwise(0))
          .withColumn("session_id", sum($"is_new").over(run))
          .groupBy($"user_id", $"session_id")
          .agg(count(lit(1)).as("n_events"), min($"ts").as("session_start"), max($"ts").as("session_end"))
          .orderBy($"user_id", $"session_id")
      },
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000 THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, ts, CAST(SUM(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |MIN(ts) AS session_start, MAX(ts) AS session_end
        |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin),

    // JSON payload extraction (§1.3 RawPayload pattern).
    q("q_json_extract")(
      (s, d) => {
        import s.implicits._
        t(s, d, "events")
          .select($"event_id", get_json_object($"props", "$.k").cast("int").as("k"))
          .orderBy($"event_id")
      },
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin)
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, (fn, _)) => n -> fn }.toMap

  val oracles: Map[String, String] =
    defs.map { case (n, (_, sql)) => n -> sql }.toMap
}
