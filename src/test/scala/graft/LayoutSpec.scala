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

  test("hilbert2: hand cases, bijectivity, and the every-step-is-a-neighbor property") {
    // hand cases cross-checked against the classic xy2d reference at bits=10
    val pts = Seq((0L, 0L), (1L, 0L), (1L, 1L), (0L, 1L), (1023L, 0L), (512L, 700L))
      .toDF("x", "y")
    val h = pts.withColumn("h", Layout.hilbert2($"x", $"y", bits = 10))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(h == Map((0L, 0L) -> 0L, (1L, 0L) -> 1L, (1L, 1L) -> 2L, (0L, 1L) -> 3L,
      (1023L, 0L) -> 1048575L, (512L, 700L) -> 585722L), h.toString)

    // bits=4: bijective on the 16×16 grid AND every consecutive pair of
    // codes is a grid NEIGHBOR (|Δx|+|Δy| = 1) — the locality property
    // Morton lacks (z-order jumps at every power-of-two boundary)
    val grid = (0 until 16).flatMap(x => (0 until 16).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val cells = grid.withColumn("h", Layout.hilbert2($"x", $"y", bits = 4))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    assert(cells.map(_._1).toSeq == (0L until 256L))
    cells.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x2 - x1) + math.abs(y2 - y1) == 1L,
        s"hilbert step ($x1,$y1)→($x2,$y2) is not a grid neighbor")
    }
    // Morton on the same grid breaks the neighbor property many times
    val zcells = grid.withColumn("z", Layout.zorder2($"x", $"y"))
      .collect().map(r => r.getLong(2) -> ((r.getLong(0), r.getLong(1))))
      .sortBy(_._1)
    val zjumps = zcells.sliding(2).count { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      math.abs(x2 - x1) + math.abs(y2 - y1) > 1L
    }
    assert(zjumps > 0, "expected Morton to jump where Hilbert does not")
  }

  test("keySkewProfile: exact Gini hand cases, heavy-hitter shares, topK cap") {
    import graft.ops.Profile
    // counts {a:1, b:1, c:2, d:4}: n=4, S=8, ranks asc 1..4,
    // S1 = 1+2+6+16 = 25 → gini = (50-40)·1e6 // 32 = 312500
    val rows = (Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(2)("c") ++
      Seq.fill(4)("d")).toDF("k")
    val p = Profile.keySkewProfile(rows, "k", topK = 2).collect()
    assert(p.length == 2)
    val first = p.head
    assert(first.getLong(0) == 1L && first.getString(1) == "d" &&
      first.getLong(2) == 4L && first.getLong(3) == 500000L &&
      first.getLong(4) == 4L && first.getLong(5) == 312500L, first.toString)
    assert(p(1).getString(1) == "c" && p(1).getLong(3) == 250000L)
    // uniform distribution → gini exactly 0
    val uni = Seq.fill(3)("x").zipWithIndex.map { case (_, i) => s"k$i" }
      .flatMap(k => Seq.fill(3)(k)).toDF("k")
    val g0 = Profile.keySkewProfile(uni, "k", topK = 1).collect().head.getLong(5)
    assert(g0 == 0L)
    // partition invariance
    val p2 = Profile.keySkewProfile(rows.repartition(5), "k", topK = 2).collect()
    assert(p2.map(_.toString).toSeq == p.map(_.toString).toSeq)
  }

  test("joinCardinality: exact totals, worst key first, loud int64 guard") {
    import graft.ops.Profile
    // a: {x:3, y:2, z:1}; b: {x:2, y:5, w:9} → join keys {x: 6, y: 10};
    // total 16; worst key y (10 rows on one reducer)
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y") ++ Seq.fill(1)("z")).toDF("ka")
    val b = (Seq.fill(2)("x") ++ Seq.fill(5)("y") ++ Seq.fill(9)("w")).toDF("kb")
    val out = Profile.joinCardinality(a, b, "ka", "kb", topK = 10).collect()
    assert(out.length == 2)
    assert(out.head.getLong(0) == 1L && out.head.getString(1) == "y" &&
      out.head.getLong(2) == 2L && out.head.getLong(3) == 5L &&
      out.head.getLong(4) == 10L && out.head.getLong(5) == 0L &&
      out.head.getLong(6) == 16L && out.head.getLong(7) == 2L, out.head.toString)
    assert(out(1).getString(1) == "x" && out(1).getLong(4) == 6L)
    // exact join-output equality: the prediction IS the join's count
    val joined = a.join(b, a("ka") === b("kb")).count()
    assert(joined == 16L)
    // partition invariance
    val out2 = Profile.joinCardinality(a.repartition(5), b.repartition(3),
      "ka", "kb", topK = 10).collect()
    assert(out2.map(_.toString).toSeq == out.map(_.toString).toSeq)
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

  test("hilbertBy clusters a quadrant contiguously and preserves the frame") {
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val laid = Layout.hilbertBy(grid, $"x", $"y", bits = 6, numPartitions = 16)
      .withColumn("pid", spark_partition_id())
    // an aligned quadrant is one contiguous Hilbert range by
    // construction (the curve fills each quadrant completely before
    // leaving it), so a quadrant scan touches a contiguous run
    val pids = laid.filter($"x" < 16 && $"y" < 16)
      .select($"pid").distinct().collect().map(_.getInt(0)).sorted
    assert(pids.length <= 2, s"quadrant scattered across ${pids.mkString(",")}")
    assert(pids.last - pids.head == pids.length - 1, "partition span not contiguous")
    // the layout is a permutation: no rows gained/lost, helper dropped
    assert(laid.columns.toSet == Set("x", "y", "pid"))
    assert(laid.count() == 4096L)
  }
}
