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

  test("zorder2 interleaves bits exactly (hand cases + bijectivity on a grid)") {
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val z = grid.withColumn("z", Layout.zorder2($"x", $"y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // z(x,y) interleaves: x bits at even positions, y at odd
    assert(z((0L, 0L)) == 0L && z((1L, 0L)) == 1L && z((0L, 1L)) == 2L)
    assert(z((3L, 5L)) == 39L) // 011 ⋈ 101 = 100111b
    assert(z((15L, 15L)) == 255L)
    assert(z.values.toSet.size == 256) // bijective on the grid
  }

  test("aligned quadrants occupy contiguous z-ranges (the pruning property)") {
    // Morton property: the box [0,2^k)² maps exactly onto z ∈ [0,4^k)
    // — so after a range partition on z, a quadrant scan touches a
    // CONTIGUOUS partition span, the row-group-pruning argument
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y").withColumn("z", Layout.zorder2($"x", $"y"))
    val inBox = grid.filter($"x" < 16 && $"y" < 16)
      .agg(min($"z"), max($"z"), count(lit(1))).as[(Long, Long, Long)].head()
    assert(inBox == ((0L, 255L, 256L))) // exactly [0, 4^4): contiguous, dense
    // a row-major sort key (x*64+y) scatters that same box across
    // [0, 975] — a 3.8x wider span than z-order's tight [0, 255]
    val rm = grid.filter($"x" < 16 && $"y" < 16)
      .agg(min($"x" * 64 + $"y"), max($"x" * 64 + $"y")).as[(Long, Long)].head()
    assert(rm._2 - rm._1 + 1 > 3L * (inBox._2 - inBox._1 + 1))
  }

  test("zorderBy clusters a quadrant into few contiguous range partitions") {
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val laid = Layout.zorderBy(grid, $"x", $"y", numPartitions = 16)
      .withColumn("pid", spark_partition_id())
    val pids = laid.filter($"x" < 16 && $"y" < 16)
      .select($"pid").distinct().collect().map(_.getInt(0)).sorted
    // 1/16 of the data in an aligned quadrant → a contiguous run of
    // ~1/16 of the partitions (range bounds are sampled, allow 2)
    assert(pids.length <= 2, s"quadrant scattered across ${pids.mkString(",")}")
    assert(pids.last - pids.head == pids.length - 1, "partition span not contiguous")
  }
}
