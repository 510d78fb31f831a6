package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge frames — the companion to
  * the dedup family's [[graft.dedup.Dedup.connectedComponents]]:
  * exact triangle counting by the degree-ordered node-iterator
  * (Schank/Wagner; the MapReduce classic from Suri/Vassilvitskii's
  * "Counting Triangles and the Curse of the Last Reducer").
  */
object Graphs {

  /** Exact global triangle count. `edges` is an undirected edge list
    * (`srcCol`, `dstCol`) — canonicalized, self-loops dropped, and
    * deduped here, so multigraph input is fine.
    *
    * Scale shape — why this survives skew: wedges are generated from
    * each node's OUT-neighbors under the (degree, id) orientation
    * (every edge points low→high), so a celebrity node with degree d
    * contributes wedges bounded by its out-degree ≤ O(√|E|), not d²
    * — the "last reducer" on a power-law graph does O(|E|) work
    * instead of O(d_max²). Three shuffles total: canonicalize+dedup,
    * degree aggregation, and the wedge/closing equi-joins. Each
    * triangle is counted exactly once, at its lowest-(degree, id)
    * apex.
    */
  def triangleCount(edges: DataFrame, srcCol: String = "src",
                    dstCol: String = "dst"): DataFrame = {
    val canon = graft.util.CacheScope.pin(
      edges.select(least(col(srcCol), col(dstCol)).as("a"),
          greatest(col(srcCol), col(dstCol)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val deg = canon.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    // orient each edge from the lower (degree, id) endpoint
    val withDeg = canon
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = graft.util.CacheScope.pin(withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("u"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("w")))
    // wedges: unordered pairs of out-neighbors of the same apex
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.w") < col("y.w"))
      .select(least(col("x.w"), col("y.w")).as("a"),
        greatest(col("x.w"), col("y.w")).as("b"))
    val tri = wedges.join(canon, Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val stats = canon.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
    stats.crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
