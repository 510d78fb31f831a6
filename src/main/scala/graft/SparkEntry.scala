package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * beyond-parity training-data operator) expressed as a Catalyst-native
  * DataFrame plan over the driver testdata; [[oracleSql]] holds the
  * DuckDB-equivalent SQL the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private lazy val all: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracles),
      (_root_.graft.queries.TextOps.queries, _root_.graft.queries.TextOps.oracles),
      (_root_.graft.queries.VectorOps.queries, _root_.graft.queries.VectorOps.oracles),
      (_root_.graft.queries.MediaOps.queries, _root_.graft.queries.MediaOps.oracles),
      (_root_.graft.queries.Extra.queries, _root_.graft.queries.Extra.oracles),
      (_root_.graft.queries.Temporal.queries, _root_.graft.queries.Temporal.oracles),
      (_root_.graft.queries.TextOps2.queries, _root_.graft.queries.TextOps2.oracles),
      (_root_.graft.queries.TextOps3.queries, _root_.graft.queries.TextOps3.oracles),
      (_root_.graft.queries.TextOps4.queries, _root_.graft.queries.TextOps4.oracles),
      (_root_.graft.queries.TextOps5.queries, _root_.graft.queries.TextOps5.oracles),
      (_root_.graft.queries.TextOps6.queries, _root_.graft.queries.TextOps6.oracles),
      (_root_.graft.queries.TextOps7.queries, _root_.graft.queries.TextOps7.oracles),
      (_root_.graft.queries.TextOps8.queries, _root_.graft.queries.TextOps8.oracles),
      (_root_.graft.queries.GraphOps.queries, _root_.graft.queries.GraphOps.oracles)
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    all.map(_._2).reduce(_ ++ _)
}
