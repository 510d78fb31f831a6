package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Ranking

/** Distributed global ranking vs Spark's single-partition window forms:
  * same exact results, parallel plan.
  */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRowNumber/globalNtile match the window forms on random data") {
    // random sizes, heavy duplicate keys (ties split across range
    // boundaries), unique id tie-break
    for (seed <- 1 to 4) {
      val n = 37 * seed * seed + 11
      val vals = Gen.listOfN(n, Gen.choose(0, 9))
        .apply(Gen.Parameters.default, Seed(1000L + seed)).get
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
        .repartition(7) // scrambled input partitioning
      val sortCols = Seq($"v", $"id")

      val viaOp = Ranking.globalRowNumber(df, sortCols, "rk")
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      val viaWindow = df.withColumn("rk",
          row_number().over(Window.orderBy($"v", $"id")).cast("long"))
        .select($"id", $"rk").as[(Long, Long)].collect().toMap
      assert(viaOp == viaWindow, s"row_number mismatch at n=$n")

      for (k <- Seq(1, 3, 10, n + 5)) { // k > n: every row its own tile
        val opTiles = Ranking.globalNtile(df, k, sortCols, "t")
          .select($"id", $"t").as[(Long, Long)].collect().toMap
        val winTiles = df.withColumn("t",
            ntile(k).over(Window.orderBy($"v", $"id")).cast("long"))
          .select($"id", $"t").as[(Long, Long)].collect().toMap
        assert(opTiles == winTiles, s"ntile($k) mismatch at n=$n")
      }
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("ranking edges: empty frame, single row, k=1, one partition") {
    val empty = Seq.empty[(Long, Int)].toDF("id", "v")
    assert(Ranking.globalRowNumber(empty, Seq($"v", $"id"), "rk").count() == 0)
    assert(Ranking.globalNtile(empty, 10, Seq($"v", $"id"), "t").count() == 0)

    val one = Seq((7L, 3)).toDF("id", "v")
    assert(Ranking.globalRowNumber(one, Seq($"v", $"id"), "rk")
      .select($"rk").as[Long].head() == 1L)
    assert(Ranking.globalNtile(one, 10, Seq($"v", $"id"), "t")
      .select($"t").as[Long].head() == 1L)

    val df = (1L to 100L).toDF("id").withColumn("v", lit(0)) // all ties
    assert(Ranking.globalNtile(df, 1, Seq($"v", $"id"), "t")
      .select($"t").as[Long].collect().forall(_ == 1L))
    val ranksOnePart = Ranking.globalRowNumber(df, Seq($"v", $"id"), "rk",
      numPartitions = 1).select($"id", $"rk").as[(Long, Long)].collect().toMap
    assert((1L to 100L).forall(i => ranksOnePart(i) == i))
    spark.sharedState.cacheManager.clearCache()
  }

  test("globalRunningSum matches the window cumsum on random data, nulls as 0") {
    for (seed <- 1 to 4) {
      val n = 29 * seed * seed + 13
      val vals = Gen.listOfN(n, Gen.choose(0, 500))
        .apply(Gen.Parameters.default, Seed(2000L + seed)).get
      val df = vals.zipWithIndex.map { case (v, i) =>
          (i.toLong, v % 11, if (v % 7 == 0) None else Some(v.toLong)) }
        .toDF("id", "k", "w")
        .repartition(7)
      val sortCols = Seq($"k", $"id")
      val viaOp = Ranking.globalRunningSum(df, $"w", sortCols, "cum")
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      val viaWindow = df.withColumn("cum",
          coalesce(sum($"w").over(Window.orderBy($"k", $"id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), lit(0L)))
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      assert(viaOp == viaWindow, s"running sum mismatch at n=$n")
    }
    spark.sharedState.cacheManager.clearCache()
  }

  test("globalPercentRank matches the window percent_rank/cume_dist forms") {
    for (seed <- 1 to 3) {
      val n = 41 * seed + 7
      val vals = Gen.listOfN(n, Gen.choose(0, 9))
        .apply(Gen.Parameters.default, Seed(3000L + seed)).get
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
        .repartition(5)
      val sortCols = Seq($"v", $"id")
      val viaOp = Ranking.globalPercentRank(df, sortCols)
        .select($"id", $"pct_rank", $"cume_dist")
        .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val w = Window.orderBy($"v", $"id")
      val viaWindow = df
        .withColumn("p", percent_rank().over(w)).withColumn("c", cume_dist().over(w))
        .select($"id", $"p", $"c")
        .as[(Long, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(viaOp == viaWindow, s"percent_rank/cume_dist mismatch at n=$n")
    }
    // 1-row frame: percent_rank 0.0, cume_dist 1.0 (SQL definitions)
    val one = Ranking.globalPercentRank(Seq((1L, 5)).toDF("id", "v"), Seq($"v", $"id"))
      .select($"pct_rank", $"cume_dist").as[(Double, Double)].head()
    assert(one == ((0.0, 1.0)))
    spark.sharedState.cacheManager.clearCache()
  }

  test("tokenBudgetSelect keeps the maximal in-budget prefix") {
    val df = Seq(
      (1L, 40L, 9L), (2L, 30L, 9L), (3L, 25L, 5L), (4L, 10L, 5L), (5L, 100L, 1L)
    ).toDF("id", "tokens", "quality")
    // order: quality desc, id → 1(40) 2(70) 3(95) 4(105: overflows) 5 —
    // prefix semantics: 4 overflows at budget 100 and nothing after it
    // is taken, even though doc 4 alone would have fit
    val kept = Ranking.tokenBudgetSelect(df, 100L, $"tokens",
      Seq($"quality".desc, $"id")).select($"id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))
    // budget 0 or smaller than the first doc: nothing selected
    assert(Ranking.tokenBudgetSelect(df, 0L, $"tokens",
      Seq($"quality".desc, $"id")).count() == 0)
    // budget covering everything: all rows, cum column exposed
    val all = Ranking.tokenBudgetSelect(df, 1000L, $"tokens",
      Seq($"quality".desc, $"id"))
    assert(all.count() == 5 &&
      all.agg(max($"cum_tokens")).as[Long].head() == 205L)
    spark.sharedState.cacheManager.clearCache()
  }

  test("ranking operators stay parallel and release their pin in a loan") {
    val df = (1L to 1000L).toDF("id").withColumn("v", $"id" % 13)
    val (ranked, released) = graft.util.CacheScope.loanCapturing {
      val r = Ranking.globalRowNumber(df, Seq($"v", $"id"), "rk")
      // no single-partition exchange in the executed plan
      assert(!r.queryExecution.executedPlan.toString.contains("SinglePartition"))
      val rs = Ranking.globalRunningSum(df, $"v", Seq($"v", $"id"), "cum")
      assert(!rs.queryExecution.executedPlan.toString.contains("SinglePartition"))
      r.count()
    }
    assert(ranked == 1000L)
    assert(released.nonEmpty &&
      released.forall(_.storageLevel == org.apache.spark.storage.StorageLevel.NONE))
  }
}
