package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Bucketed-layout co-located join: same key, same bucket count →
  * join with no shuffle exchange.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle; results match the plain join") {
    val li = graft.Tables.t(spark, sf(), "lineitem")
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
    val o = graft.Tables.t(spark, sf(), "orders")
      .select($"o_orderkey", $"o_totalprice")

    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 8)
    Layout.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bucketed", "l_orderkey", 8)

    val joined = Layout.readTable(spark, "li_bucketed")
      .join(Layout.readTable(spark, "o_bucketed"), "l_orderkey")
    // disable auto-broadcast so the strategy decision is layout-driven
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val agg = joined.agg(count(lit(1)), sum($"l_quantity"))
      assert(Layout.isShuffleFree(joined),
        s"expected no exchange:\n${joined.queryExecution.executedPlan}")
      val (n, q) = agg.as[(Long, Double)].head()
      val (pn, pq) = li.join(o, $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)), sum($"l_quantity")).as[(Long, Double)].head()
      assert(n == pn && math.abs(q - pq) < 1e-6)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
