package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Expression, LessThan, Literal}

/** SQL-surface registration for the engine's named functions
  * (SURVEY.md §2.11: expose the UDF-shaped units as registered
  * functions rather than hard-coded expressions).
  *
  *  - `dot_f32(a, b)`      — native codegen'd float-vector dot product
  *  - `norm_sq_f32(a)`     — native codegen'd squared L2 norm
  *  - `cosine_f32(a, b)`   — cosine similarity composed from the above
  *  - `amount_category(x)` — the reference's CASE bucketing (T1)
  *
  * Usable either via `GraftFunctions.register(spark)` on an existing
  * session or as `.withExtensions(new GraftExtensions)` /
  * `spark.sql.extensions=graft.plans.GraftExtensions` at build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction(
        (org.apache.spark.sql.catalyst.FunctionIdentifier(name),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, name, null, "", "", "", "", "", "", "scala_udf"),
          builder))
    }
    // MERGE INTO '<path>' USING src ON key — SQL surface for the
    // bucketed path upsert (SURVEY §7.3); see [[GraftSqlParser]]
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
    // graft_target('<path>'[, version]) — the matching SQL read side
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_target"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_target", null, "", "", "", "", "", "", "scala_udf"),
        GraftTargetTvf.build _))
    // graft_target_lookup('<path>', key...) — bucket-pruned point reads
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_target_lookup"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_target_lookup", null, "", "", "", "", "", "", "scala_udf"),
        GraftTargetLookupTvf.build _))
    // graft_target_lookup_at('<path>', version, key...) — the same
    // pruned point read pinned to a time-travel version
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_target_lookup_at"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_target_lookup_at", null, "", "", "", "", "", "", "scala_udf"),
        GraftTargetLookupAtTvf.build _))
    // graft_target_versions('<path>') — time-travel discoverability
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_target_versions"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_target_versions", null, "", "", "", "", "", "", "scala_udf"),
        GraftTargetVersionsTvf.build _))
    // graft_target_layout('<path>') — bucket/key-column discoverability
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_target_layout"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_target_layout", null, "", "", "", "", "", "", "scala_udf"),
        GraftTargetLayoutTvf.build _))
    // graft_profile('<path>'[, 'cols']) — column-level table profiling
    e.injectTableFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_profile"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", null, "graft_profile", null, "", "", "", "", "", "", "scala_udf"),
        GraftProfileTvf.build _))
    // graft_target point lookups auto-prune: `WHERE key = lit` over the
    // deferred target node lowers to the bucket-pruned scan once filter
    // pushdown parks the predicate on it; anything left lowers to the
    // full snapshot before CBO. See [[TargetPruning]].
    e.injectOptimizerRule(s => TargetPointLookupRule(s))
    e.injectPreCBORule(s => TargetFinalizeRule(s))
  }
}

object GraftFunctions {

  private def cosine(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    Divide(DotProductF32(a, b), Multiply(Sqrt(NormSqF32(a)), Sqrt(NormSqF32(b))))
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "dot_f32" -> (es => DotProductF32(es(0), es(1))),
    "norm_sq_f32" -> (es => NormSqF32(es(0))),
    "cosine_f32" -> (es => cosine(es(0), es(1))),
    // T1 CASE bucketing in raw Catalyst (the analyzer inserts the
    // numeric casts) — same semantics as graft.ops.Transform.amountCategory
    "amount_category" -> (es => CaseWhen(Seq(
      (LessThan(es(0), Literal(50)), Literal("Low")),
      (LessThan(es(0), Literal(200)), Literal("Medium"))),
      Some(Literal("High")))))

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
