package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record fusion — the RESOLVE step that completes the
  * entity-resolution chain (block → pair → cluster → resolve): one
  * consolidated row per duplicate cluster, each attribute taken from
  * the highest-priority member that actually HAS it (survivorship
  * "most recent non-null wins", the standard MDM rule). Keeper
  * selection ([[Dedup.exactGroups]]' min-id, `resolveDropTargets`)
  * answers "which ROW survives"; this answers the finer question —
  * which VALUE survives, per column, when the newest record is
  * partially null and an older one holds the missing field.
  *
  * Determinism contract: `priority` must totally order the members of
  * a cluster (callers fold a unique id into it — e.g.
  * `struct(col("version"), col("id"))`); fusion is then
  * `max_by(attr, struct(attr IS NOT NULL, priority))` per attribute:
  * non-null beats null, then highest priority. One groupBy — ALL
  * attributes fuse in a single map-side-combinable aggregation pass,
  * no per-attribute joins, no windows.
  *
  * Output: (cluster, <attrs fused>, n_members).
  */
object GoldenRecord {

  def fuse(records: DataFrame, clusterCol: String, attrs: Seq[String],
           priority: Column): DataFrame = {
    require(attrs.nonEmpty, "goldenRecord needs at least one attribute")
    val aggs = attrs.map { a =>
      max_by(col(a), struct(col(a).isNotNull.as("_p"), priority.as("_o"))).as(a)
    } :+ count(lit(1)).as("n_members")
    records.groupBy(col(clusterCol)).agg(aggs.head, aggs.tail: _*)
  }
}
